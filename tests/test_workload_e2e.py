"""End-to-end regression on a synthetic multi-event mixed-SV workload.

tests/tools/make_workload.py plants known genotypes across all five event
kinds — DEL, INS, symbolic <DUP> and <INV>, and nested deletion+SNP
superloci (BASELINE.json's "mixed DEL/INS/DUP/INV batch" config) — and
the full multigrmpy pipeline must recover every one. This covers the
pipelined multi-process batch path (pipeline/parallel_grmpy.py), the
superloci split, extraction with mate pairs, and the genotyper at
realistic depth — beyond the 2-event reference round-trip fixture.
Deterministic (seeded).
"""
import gzip
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tools"))


@pytest.fixture(scope="module")
def workload(tmp_path_factory):
    from make_workload import generate

    out = str(tmp_path_factory.mktemp("wl"))
    events = generate(out, n_events=15, depth=30, seed=3)
    return out, events


def test_synthetic_workload_genotypes(workload):
    from paragraph_tpu.pipeline.multigrmpy import MultigrmpyOptions, run

    out_dir, events = workload
    result = run(MultigrmpyOptions(
        input=os.path.join(out_dir, "candidates.vcf"),
        manifest=os.path.join(out_dir, "samples.txt"),
        reference=os.path.join(out_dir, "ref.fa"),
        output=os.path.join(out_dir, "out"),
        split_type="superloci",
    ))
    calls = {}
    fts = {}
    with gzip.open(result["genotypes_vcf"], "rt") as f:
        for line in f:
            if line.startswith("#"):
                continue
            parts = line.rstrip("\n").split("\t")
            fmt = parts[8].split(":")
            vals = parts[9].split(":")
            calls[int(parts[1])] = vals[fmt.index("GT")]
            fts[int(parts[1])] = vals[fmt.index("FT")] if "FT" in fmt else ""
    n_records = len(events) + sum(
        1 for ev in events if ev["kind"] == "DELSNP")
    assert len(calls) == n_records

    # per-breakpoint truth for nested superloci: the whole-variant
    # consensus legitimately CONFLICTs (SNP and DEL breakpoints carry
    # different alt alleles; the reference's vcfupdate then reports
    # GT=. with UNMATCHED — set_record_for_sample, vcfupdate.py:256-262)
    bp_gts = {}  # allele name -> set of breakpoint GT strings
    with gzip.open(result["genotypes_json"], "rt") as f:
        for rec in json.load(f):
            for bp in rec["samples"]["sample"].get(
                    "breakpoints", {}).values():
                alleles = set(bp["counts"]["alleles"]) - {"REF"}
                for a in alleles:
                    bp_gts.setdefault(a, set()).add(bp["gt"].get("GT", "."))

    misses = []
    for i, ev in enumerate(events):
        got = calls.get(ev["pos"], "missing")
        want = ev["gt"]
        ok = (got == want or (got == "1/0" and want == "0/1")
              or (want == "0/0" and got in ("0/0", "./.")))
        if not ok and ev["kind"] == "DELSNP":
            # conflict at the whole-variant level is reference-faithful;
            # the DEL allele's own breakpoints must still be right
            allele = f"ev{i}:1"
            want_bp = {"0/1": f"REF/{allele}", "1/1": f"{allele}/{allele}",
                       "0/0": "REF/REF"}[want]
            ok = (got == "." and "UNMATCHED" in fts.get(ev["pos"], "")
                  and bp_gts.get(allele) == {want_bp})
        if not ok:
            misses.append((ev, got, fts.get(ev["pos"])))
    assert not misses, misses


def test_idxdepth_recovers_simulated_depth(workload):
    """idxdepth's sampled-pileup median (BamReader::estimateDepth
    semantics) must recover the simulator's known coverage."""
    from paragraph_tpu.pipeline.idxdepth import estimate_depths

    out_dir, _events = workload
    result = estimate_depths(
        os.path.join(out_dir, "sample.bam"),
        os.path.join(out_dir, "ref.fa"))
    contigs = {c["name"]: c for c in result["contigs"]}
    assert "chrS" in contigs
    depth = contigs["chrS"]["depth"]
    # simulated at ~30x (anchor placement drops a few % of pairs)
    assert 20 <= depth <= 35, depth
    assert contigs["chrS"]["reads"] > 0
    assert result["read_length"] == 150
