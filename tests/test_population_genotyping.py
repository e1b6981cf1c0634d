"""Mesh-sharded population genotyping vs the float64 parity engine.

sharded_population_genotyping runs the float32 device model over an
(event × sample × breakpoint) batch sharded across the 8-device CPU test
mesh; its decisions (best GT, filters) must match the bit-parity
vectorized engine away from decision boundaries, and the GL values must
agree to float32 tolerance. combined_consensus_batch must agree with the
scalar CombinedGenotype fast path.
"""
import math
import random

import numpy as np
import pytest

import jax

from paragraph_tpu.genotyping.batched import (combined_consensus_batch,
                                              make_model_inputs)
from paragraph_tpu.genotyping.breakpoint_genotyper import (
    BreakpointGenotyperParameter)
from paragraph_tpu.genotyping.parameters import GenotypingParameters
from paragraph_tpu.genotyping.vectorized import VectorizedBreakpointGenotyper
from paragraph_tpu.parallel.mesh import (make_mesh,
                                         sharded_population_genotyping)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8
    return make_mesh(8)


def test_population_step_matches_vectorized(mesh):
    rng = random.Random(42)
    names = ["REF", "ALT"]
    param = GenotypingParameters(names, 2)
    oracle = VectorizedBreakpointGenotyper(param)
    model = make_model_inputs(names, 2)

    N = 256  # multiple of the mesh size
    b_params = []
    counts = []
    for _ in range(N):
        depth = rng.choice([10.0, 30.0, 60.0])
        lam = depth * (150 - 16) / 150
        gv = rng.choice(param.possible_genotypes)
        row = []
        for al in range(2):
            copies = sum(1 for g in gv if g == al)
            m = lam * (0.5 * copies if copies else 0.05)
            row.append(int(m * rng.uniform(0.6, 1.4)))
        counts.append(row)
        b_params.append(BreakpointGenotyperParameter(
            depth, 150, math.sqrt(5 * depth), False))

    out = sharded_population_genotyping(
        mesh, counts, [p.read_depth for p in b_params],
        [p.read_length for p in b_params],
        [p.depth_sd for p in b_params],
        [p.use_poisson_depth for p in b_params], model)

    want = oracle.genotype_batch(b_params, np.asarray(counts))
    gts = model["gts"]
    n_gt_match = 0
    for i, w in enumerate(want):
        if "NO_READS" in w.filters:
            assert bool(out["no_reads"][i])
            continue
        got_gt = list(gts[int(out["best_gt"][i])])
        n_gt_match += got_gt == w.gt
        # float32 GL agreement
        np.testing.assert_allclose(out["gl"][i], w.gl, rtol=2e-4,
                                   atol=5e-3)
        assert bool(out["bp_depth"][i]) == ("BP_DEPTH" in w.filters)
    # GT decisions can differ only at exact float32 decision boundaries
    assert n_gt_match >= N - 1


def test_combined_consensus_batch_fast_path():
    # samples x breakpoints vote matrix
    best = np.array([[2, 2, 2],    # unanimous pass -> consensus 2
                     [1, 2, 2],    # conflicting pass votes -> conflict
                     [0, 0, 0],    # no pass -> unresolved, not conflict
                     [1, 1, 3]])   # non-pass dissent ignored
    pass_mask = np.array([[1, 1, 1],
                          [1, 1, 1],
                          [0, 0, 0],
                          [1, 1, 0]], bool)
    has_gt = np.ones_like(pass_mask)
    consensus, conflict = combined_consensus_batch(
        best.astype(np.int32), pass_mask, has_gt)
    assert consensus.tolist() == [2, -1, -1, 1]
    assert conflict.tolist() == [False, True, False, False]


@pytest.mark.slow
def test_device_engine_end_to_end(tmp_path):
    """grmpy --genotyping-engine device: the whole-run sharded float32
    pass must reproduce the float64 host engine's confident genotypes
    end-to-end on the multi-sample round-trip fixture (documented
    tolerance: identical GT/filters for every call; GLs to float32)."""
    import json as _json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tools"))
    from make_workload import generate

    from paragraph_tpu.pipeline.multigrmpy import MultigrmpyOptions, run

    wl = str(tmp_path / "wl")
    generate(wl, n_events=8, depth=30, seed=9)

    outs = {}
    for engine in ("host", "device"):
        result = run(MultigrmpyOptions(
            input=os.path.join(wl, "candidates.vcf"),
            manifest=os.path.join(wl, "samples.txt"),
            reference=os.path.join(wl, "ref.fa"),
            output=os.path.join(wl, f"out_{engine}"),
            split_type="superloci",
            gt_engine=engine,
        ))
        import gzip
        outs[engine] = _json.load(
            gzip.open(result["genotypes_json"], "rt"))

    assert len(outs["host"]) == len(outs["device"])
    n_checked = 0
    for rh, rd in zip(outs["host"], outs["device"]):
        for sname, sh in rh["samples"].items():
            sd = rd["samples"][sname]
            gt_h, gt_d = sh["gt"], sd["gt"]
            # confident host calls must match exactly on device
            if gt_h.get("GQ", 0) >= 10 and "PASS" in gt_h.get(
                    "filters", []):
                assert gt_d["GT"] == gt_h["GT"], (rh.get("graphinfo"),
                                                  gt_h, gt_d)
                n_checked += 1
            for bp_name, bp_h in sh.get("breakpoints", {}).items():
                bp_d = sd["breakpoints"][bp_name]
                assert bp_d["counts"] == bp_h["counts"]
                gh, gd = bp_h["gt"], bp_d["gt"]
                if gh.get("GQ", 0) >= 10:
                    assert gd["GT"] == gh["GT"], (bp_name, gh, gd)
                for k, v in gh.get("GL", {}).items():
                    assert abs(gd["GL"][k] - v) <= max(
                        5e-3, 2e-4 * abs(v)), (bp_name, k, gh, gd)
    assert n_checked > 0
