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

pytestmark = pytest.mark.slow

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
    with gzip.open(result["genotypes_vcf"], "rt") as f:
        n_records = sum(1 for line in f if not line.startswith("#"))
    assert n_records == len(events) + sum(
        1 for ev in events if ev["kind"] == "DELSNP")

    # shared truth-checker with the e2e bench: classifies every miss
    # (DELSNP whole-variant CONFLICT with correct per-breakpoint GTs is
    # credited; FT-filtered / GQ<10 misses are "explained" — e.g. DUPs
    # whose copy is shorter than the read length are intrinsically
    # uncallable at the breakpoint, same as the reference genotyper)
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench_e2e import check_truth

    n_ok, misses = check_truth(result["genotypes_vcf"],
                               result["genotypes_json"], events)
    unexpected = [m for m in misses if m["reason"] == "unexpected"]
    assert not unexpected, unexpected
    assert n_ok == len(events), misses


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
