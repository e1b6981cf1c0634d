"""End-to-end regression on a synthetic multi-event workload.

tests/tools/make_workload.py plants known DEL/INS genotypes, simulates 30x
paired reads, and the full multigrmpy pipeline must recover them. This
covers the cross-event batch path (multiple graphs per dispatch chunk),
extraction with mate pairs, and the genotyper at realistic depth — beyond
the 2-event reference round-trip fixture. Deterministic (seeded).
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
    events = generate(out, n_events=12, depth=30, seed=3)
    return out, events


def test_synthetic_workload_genotypes(workload):
    from paragraph_tpu.pipeline.multigrmpy import MultigrmpyOptions, run

    out_dir, events = workload
    result = run(MultigrmpyOptions(
        input=os.path.join(out_dir, "candidates.vcf"),
        manifest=os.path.join(out_dir, "samples.txt"),
        reference=os.path.join(out_dir, "ref.fa"),
        output=os.path.join(out_dir, "out"),
    ))
    calls = {}
    with gzip.open(result["genotypes_vcf"], "rt") as f:
        for line in f:
            if line.startswith("#"):
                continue
            parts = line.split("\t")
            calls[int(parts[1])] = parts[9].split(":")[0]
    assert len(calls) == len(events)
    n_ok = 0
    misses = []
    for ev in events:
        got = calls.get(ev["pos"], "missing")
        want = ev["gt"]
        ok = (got == want or (got == "1/0" and want == "0/1")
              or (want == "0/0" and got in ("0/0", "./.")))
        n_ok += ok
        if not ok:
            misses.append((ev, got))
    # long-insertion support is underrepresented by the simulator's
    # reference-anchor placement; everything else must be exact
    assert n_ok >= len(events) - 1, misses


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
