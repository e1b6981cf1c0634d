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
