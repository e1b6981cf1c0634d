"""Genotyping model tests with the reference's own unit-test expectations
(src/c++/test/test_breakpoint_genotyper.cpp, test_combined_genotype.cpp,
test_popstats.cpp values)."""
import math

import pytest

from paragraph_tpu.genotyping import (BreakpointGenotyper,
                                      BreakpointGenotyperParameter,
                                      GenotypingParameters, Genotype,
                                      combined_genotype)
from paragraph_tpu.genotyping.genotype import GenotypeSet
from paragraph_tpu.genotyping.population import PopulationStatistics


def _genotyper(alleles, ploidy):
    return BreakpointGenotyper(GenotypingParameters(alleles, ploidy))


def test_throws_on_wrong_counts():
    g = _genotyper(["REF", "ALT"], 2)
    p = BreakpointGenotyperParameter(40.0, 100, math.sqrt(200), False)
    with pytest.raises(ValueError):
        g.genotype(p, [])
    with pytest.raises(ValueError):
        g.genotype(p, [10])


def test_genotypes_well_covered_breakpoints():
    """test_breakpoint_genotyper.cpp:45-73."""
    g = _genotyper(["REF", "ALT"], 2)
    p = BreakpointGenotyperParameter(40.0, 100, 20.0, False)
    assert g.genotype(p, [20, 0]).to_string() == "0/0"
    assert g.genotype(p, [20, 20]).to_string() == "0/1"
    assert g.genotype(p, [0, 20]).to_string() == "1/1"

    hap = _genotyper(["REF", "ALT"], 1)
    assert hap.genotype(p, [0, 20]).to_string() == "1"

    assert g.genotype(p, [0, 20]).coverage_test_pvalue == pytest.approx(
        0.24825223, rel=1e-6)
    p_poisson = BreakpointGenotyperParameter(40.0, 100, 20.0, True)
    assert g.genotype(p_poisson, [0, 20]).coverage_test_pvalue == \
        pytest.approx(0.0080560343, rel=1e-5)

    g5 = _genotyper(["REF", "ALT1", "ALT2", "ALT3", "ALT4"], 2)
    assert g5.genotype(p, [1, 20, 2, 20, 2]).to_string() == "1/3"


def test_combined_simple_pass():
    """test_combined_genotype.cpp:34-52."""
    alleles = ["REF", "ALT"]
    gt1 = Genotype()
    gt1.gt = [1, 1]
    gt1.gl_name = [(0, 0), (0, 1), (1, 1)]
    gt1.gl = [-10, -10, -0.1]
    gs = GenotypeSet()
    for _ in range(2):
        gs.add(alleles, gt1)
    combined = combined_genotype(gs)
    assert combined.to_string() == "1/1"
    assert combined.to_string(alleles) == "ALT/ALT"


def test_combined_unphased_match():
    """test_combined_genotype.cpp:54-80."""
    alleles = ["REF", "ALT"]
    gt1 = Genotype()
    gt1.gt = [0, 1]
    gt1.gl_name = [(0, 0), (0, 1), (1, 1)]
    gt1.gl = [-10, -0.1, -10]
    gt1.gq = 20
    gt2 = Genotype()
    gt2.gt = [1, 0]
    gt2.gl_name = [(1, 0), (1, 1), (0, 0)]
    gt2.gl = [-0.1, -10, -10]
    gt2.gq = 30
    gs = GenotypeSet()
    gs.add(alleles, gt1)
    gs.add(alleles, gt2)
    combined = combined_genotype(gs)
    assert combined.to_string() == "0/1"
    assert combined.filter_string() == "PASS"
    assert combined.gq == 20


def test_combined_conflict_no_consensus():
    """test_combined_genotype.cpp:82-130."""
    alleles = ["REF", "ALT"]
    gt1 = Genotype()
    gt1.gt = [0, 1]
    gt1.num_reads = 10
    gt1.allele_fractions = [0.5, 0.5]
    gt2 = Genotype()
    gt2.gt = [1, 1]
    gt2.num_reads = 10
    gt2.allele_fractions = [0, 1]
    gs = GenotypeSet()
    gs.add(alleles, gt1)
    gs.add(alleles, gt2)
    genotyper = _genotyper(alleles, 2)
    b_param = BreakpointGenotyperParameter(10.0, 100, 50.0, False)
    combined = combined_genotype(gs, b_param, genotyper)
    assert combined.to_string() == "0/1"
    assert combined.filter_string() == "CONFLICT"
    assert combined.gq == 8

    hap = _genotyper(alleles, 1)
    gtx1 = Genotype()
    gtx1.gt = [0]
    gtx1.num_reads = 10
    gtx1.allele_fractions = [1, 0]
    gtx2 = Genotype()
    gtx2.gt = [1]
    gtx2.num_reads = 2
    gtx2.allele_fractions = [0, 1]
    gsx = GenotypeSet()
    gsx.add(alleles, gtx1)
    gsx.add(alleles, gtx2)
    combined_h = combined_genotype(gsx, b_param, hap)
    assert combined_h.to_string() == "0"


def test_population_statistics_basic():
    gs = GenotypeSet()
    alleles = ["REF", "ALT"]
    # 60 samples: 30 hom-ref, 20 het, 10 hom-alt (close to HWE)
    for gt_pair, count in (((0, 0), 30), ((0, 1), 20), ((1, 1), 10)):
        for _ in range(count):
            g = Genotype()
            g.gt = list(gt_pair)
            gs.add(alleles, g)
    ps = PopulationStatistics(gs)
    out = ps.to_json()
    assert out["call_rate"] == 1.0
    assert out["allele_frequencies"] == [
        pytest.approx(80 / 120), pytest.approx(40 / 120)]
    assert 0.0 <= out["hwe"] <= 1.0


def test_batched_genotyping_matches_scalar():
    """Batched JAX likelihoods agree with the scalar parity engine."""
    import numpy as np

    from paragraph_tpu.genotyping.batched import (
        batched_genotype_likelihoods, make_model_inputs)

    alleles = ["REF", "ALT"]
    model = make_model_inputs(alleles)
    scalar = _genotyper(alleles, 2)
    p = BreakpointGenotyperParameter(40.0, 100, 20.0, False)
    counts = np.array([[20, 0], [20, 20], [0, 20], [5, 9]], np.int32)
    depth = np.full((4,), 40.0, np.float32)
    rl = np.full((4,), 100.0, np.float32)
    gl, best, gq = batched_genotype_likelihoods(
        counts, depth, rl, model["gt_ploidy"], model["error_rates"],
        model["het_fractions"], model["log_priors"])
    for i in range(4):
        ref_gt = scalar.genotype(p, list(counts[i]))
        assert model["gts"][int(best[i])] == tuple(ref_gt.gt)
        for gi, gt in enumerate(model["gts"]):
            ref_gl = dict(zip(ref_gt.gl_name, ref_gt.gl))[gt]
            assert float(gl[i, gi]) == pytest.approx(ref_gl, rel=1e-4)


def test_population_statistics_reference_values():
    """test_popstats.cpp:28-87 exact expectations."""
    alleles = ["REF", "ALT"]

    def gt(pair):
        g = Genotype()
        g.gt = list(pair)
        return g

    gs = GenotypeSet()
    for _ in range(83):
        gs.add(alleles, gt((0, 0)))
    ps0 = PopulationStatistics(gs)
    assert ps0.chisq_pvalue() == 1.0

    for _ in range(13):
        gs.add(alleles, gt((0, 1)))
    for _ in range(4):
        gs.add(alleles, gt((1, 1)))
    ps1 = PopulationStatistics(gs)
    assert ps1.chisq_pvalue() == pytest.approx(
        0.0020474148859159769, rel=1e-9)
    assert ps1.fisher_exact_pvalue() == pytest.approx(
        0.010293433548874801, rel=1e-12)

    multi = ["REF", "ALT1", "ALT2"]
    gs2 = GenotypeSet()
    for count, pair in ((24, (0, 0)), (31, (0, 1)), (10, (1, 1)),
                        (19, (0, 2)), (11, (1, 2)), (5, (2, 2))):
        for _ in range(count):
            gs2.add(multi, gt(pair))
    ps2 = PopulationStatistics(gs2)
    assert ps2.chisq_pvalue() == pytest.approx(
        0.50000945615245529, rel=1e-9)


def test_genotype_relabel():
    """test_genotype.cpp:27-46 (Genotype.Relabel)."""
    variant = Genotype()
    variant.gt = [0, 1]
    variant.gl_name = [(0, 0), (0, 1), (1, 1)]
    variant.relabel([1, 3])
    assert variant.to_string() == "1/3"
    assert variant.gl_name[0] == (1, 1)
    assert variant.gl_name[1] == (1, 3)
    assert variant.gl_name[2] == (3, 3)


def test_genotyping_parameters_set_from_json():
    """test_genotyping_parameter.cpp:25-50: allele_names reorder remaps
    per-allele error rates; genotype count unchanged."""
    param = GenotypingParameters(["REF", "ALT1", "ALT2"], 2)
    param.set_from_json({
        "allele_names": ["ALT1", "REF", "ALT2"],
        "allele_error_rates": [0.1, 0.04, 0.1],
        "het_haplotype_fractions": [0.33, 0.33, 0.33],
    })
    assert len(param.possible_genotypes) == 6
    assert param.allele_error_rates == [0.04, 0.1, 0.1]
