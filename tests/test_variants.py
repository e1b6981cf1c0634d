"""Variant discovery parity tests with the reference's own expectations
(src/c++/test/test_refvar.cpp, test_variantcandidatelist.cpp)."""
import pytest

from paragraph_tpu.pipeline.variants import (RefVar, VariantCandidateList,
                                             cigar_to_refvar, left_shift,
                                             right_shift)


def test_left_right_shift_string_simple():
    """test_refvar.cpp:47-88 (LeftRightShiftStringSimple)."""
    ref = "AAACCCAAACCCAAACCCGGGTTTGGGTTTGGGTTT"

    r = RefVar(30, 29, "GGGTTT")
    left_shift(ref, r, -1)
    assert (r.start, r.end, r.alt) == (17, 17, "CGGGTTT")

    r = RefVar(30, 29, "GGGTTT")
    left_shift(ref, r, 19)
    assert (r.start, r.end, r.alt) == (19, 19, "GGTTTGG")

    r = RefVar(5, 6, "C")
    right_shift(ref, r)
    assert (r.start, r.end, r.alt) == (8, 9, "C")

    r = RefVar(30, 29, "GGGTTT")
    right_shift(ref, r)
    assert (r.start, r.end, r.alt) == (35, 35, "TGGGTTT")


def test_cigar_to_refvar():
    """test_refvar.cpp:762-830 (Cigar2RefVar)."""
    def reprs(rvl):
        return [rv.repr_key() for rv in rvl]

    rvl, ref_left, alt_left = cigar_to_refvar(
        "XXCYY", "YYTZZ", "2S1X2S", ref_matches=False)
    assert (ref_left, alt_left) == (4, 0)
    assert reprs(rvl) == ["0-0:T"]

    rvl, ref_left, alt_left = cigar_to_refvar(
        "GGCTT", "XXGGTTTXX", "2S5M2S", ref_matches=True)
    assert (ref_left, alt_left) == (0, 0)
    assert reprs(rvl) == ["0-1:.", "2-2:T", "3-4:."]

    rvl, ref_left, alt_left = cigar_to_refvar(
        "CTC", "XXXXCTCCCYYYYY", "4S3M2I5S", ref_matches=False)
    assert (ref_left, alt_left) == (0, 0)
    assert reprs(rvl) == ["3-2:CC"]

    rvl, ref_left, alt_left = cigar_to_refvar(
        "CCCTC", "CTCCC", "2D3M2I", ref_matches=True)
    assert (ref_left, alt_left) == (0, 0)
    assert reprs(rvl) == ["0-1:", "2-4:.", "5-4:CC"]


W60 = 1 - 1e-6  # default-quality observation weight (phred 60)
W10 = 0.9       # phred-10 observation weight


def test_candidate_list_basic():
    """test_variantcandidatelist.cpp:43-116 (BasicCandidateListTest)."""
    vl = VariantCandidateList("CCACATATATATATATATATA")

    rv = RefVar(3, 3, "T")
    vl.add_refvar_observation(rv, False, -1, 60)
    vl.add_refvar_observation(RefVar(3, 3, "T"), True, -1, 60)
    vl.add_refvar_observation(RefVar(3, 3, "T"), True, 0, 10)

    for _ in range(3):
        vl.add_refvar_observation(RefVar(3, 5, "."), False, -1, 60)
    vl.add_refvar_observation(RefVar(3, 5, "."), False, 0, 10)
    for _ in range(4):
        vl.add_refvar_observation(RefVar(3, 5, "."), True, -1, 60)
    vl.add_refvar_observation(RefVar(3, 5, "."), True, 0, 10)

    assert vl.reference_pileups[2].stranded_DP == [0, 0]
    assert vl.reference_pileups[3].stranded_DP == [4, 5]
    assert vl.reference_pileups[4].stranded_DP == [4, 5]
    assert vl.reference_pileups[5].stranded_DP == [4, 5]
    assert vl.reference_pileups[6].stranded_DP == [0, 0]
    assert vl.nonreference_pileups[2].stranded_DP == [0, 0]
    assert vl.nonreference_pileups[3].stranded_DP == [1, 2]
    assert vl.nonreference_pileups[4].stranded_DP == [0, 0]
    assert vl.nonreference_pileups[5].stranded_DP == [0, 0]

    assert vl.nonreference_pileups[3].qual_weighted_DP[0] == \
        pytest.approx(W60)
    assert vl.nonreference_pileups[3].qual_weighted_DP[1] == \
        pytest.approx(W60 + W10)
    assert vl.reference_pileups[3].qual_weighted_DP[0] == \
        pytest.approx(3 * W60 + W10)
    assert vl.reference_pileups[3].qual_weighted_DP[1] == \
        pytest.approx(4 * W60 + W10)

    variants = vl.get_variants()
    assert len(variants) == 1
    v0 = variants[0]
    assert (v0.start, v0.end, v0.alt) == (3, 3, "T")
    assert v0.adr_forward == 4
    assert v0.wadr_forward == pytest.approx(3 * W60 + W10)
    assert v0.adr_backward == 5
    assert v0.wadr_backward == pytest.approx(4 * W60 + W10)
    assert v0.ada_forward == 1
    assert v0.wada_forward == pytest.approx(W60)
    assert v0.ada_backward == 2
    assert v0.wada_backward == pytest.approx(W60 + W10)
    assert v0.ado_forward == 0
    assert v0.wado_forward == pytest.approx(0.0)
    assert v0.ado_backward == 0
    assert v0.wado_backward == pytest.approx(0.0)


def test_candidate_list_indel():
    """test_variantcandidatelist.cpp:117-170 (CandidateListTestIndel): two
    differently-placed deletions in an AT repeat normalize to one
    variant."""
    vl = VariantCandidateList("CCACATATATATATATATATA")
    vl.add_refvar_observation(RefVar(3, 5, "C"), False, -1, 60)
    vl.add_refvar_observation(RefVar(14, 17, "AT"), True, -1, 60)

    for i in range(4):
        assert vl.reference_pileups[i].stranded_DP == [0, 0]
        assert vl.nonreference_pileups[i].stranded_DP == [0, 0]
    for i in range(4, len(vl.reference)):
        assert vl.reference_pileups[i].stranded_DP == [0, 0]
        assert vl.nonreference_pileups[i].stranded_DP == [1, 1]

    variants = vl.get_variants()
    assert len(variants) == 1
    v0 = variants[0]
    assert (v0.start, v0.end, v0.alt) == (4, 5, "")
    assert v0.ada_forward == 1
    assert v0.ada_backward == 1
    assert v0.wada_backward == pytest.approx(W60)
    assert v0.adr_forward == 0
    assert v0.adr_backward == 0
    assert v0.ado_forward == 0
    assert v0.ado_backward == 0


def test_candidate_list_insertion():
    """test_variantcandidatelist.cpp:172-210 (CandidateListTestInsertion)."""
    vl = VariantCandidateList("CCACATATATATATATATATA")
    vl.add_refvar_observation(RefVar(4, 3, "AT"), False, -1, 60)
    vl.add_refvar_observation(RefVar(14, 13, "AT"), True, -1, 60)

    for i in range(4):
        assert vl.nonreference_pileups[i].stranded_DP == [0, 0]
    for i in range(4, len(vl.reference)):
        assert vl.reference_pileups[i].stranded_DP == [0, 0]
        assert vl.nonreference_pileups[i].stranded_DP == [1, 1]

    variants = vl.get_variants()
    assert len(variants) == 1
    v0 = variants[0]
    assert (v0.start, v0.end, v0.alt) == (4, 3, "AT")
