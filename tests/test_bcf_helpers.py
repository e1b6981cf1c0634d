"""BCFHelpers accessor surface tests (semantics from
/root/reference/src/c++/lib/common/BCFHelpers.cpp: GQX→GQ and DP→DPI
fallbacks, Number=A/R/G multiallelic splitting after bcftools vcfnorm,
GT remapping, reference padding)."""
import math

import pytest

from paragraph_tpu.io.bcf_helpers import (
    HeaderMeta, ImportError_, add_ref_pad, alleles_to_gt,
    extract_ref_from_mnp, get_ad, get_dp, get_format_float,
    get_format_int, get_format_string, get_gq, get_gt, get_info_flag,
    get_info_float, get_info_ints, get_info_string, get_location,
    is_ref_padded, set_format, split_multi_allelics)
from paragraph_tpu.io.vcf import VcfRecord


def make_rec(**kw):
    base = dict(chrom="chr1", pos=100, vid=None, ref="ACGT",
                alts=("A",), qual=50.0, filters=["PASS"], info={},
                fmt_keys=[], sample_values={})
    base.update(kw)
    return VcfRecord(**base)


def test_location_and_end_override():
    assert get_location(make_rec()) == (99, 102)
    assert get_location(make_rec(info={"END": "150"})) == (99, 149)
    with pytest.raises(ImportError_):
        get_location(make_rec(ref="A." ))


def test_info_accessors():
    r = make_rec(info={"SVLEN": "-100", "AF": "0.25,0.5", "IMPRECISE": True,
                       "CIPOS": "-10,10"})
    assert get_info_string(r, "SVLEN") == "-100"
    assert get_info_string(r, "MISSING", "x") == "x"
    assert get_info_ints(r, "CIPOS") == [-10, 10]
    assert get_info_float(r, "AF") == 0.25
    assert math.isnan(get_info_float(r, "NOPE"))
    assert get_info_flag(r, "IMPRECISE")
    assert not get_info_flag(r, "SVLEN")


def test_format_accessors_and_fallbacks():
    r = make_rec(
        fmt_keys=["GT", "GQ", "AD", "DPI", "XX"],
        sample_values={"S1": {"GT": "0|1", "GQ": "37.5", "AD": "10,5",
                              "DPI": "15", "XX": "1,2"}})
    gt, phased = get_gt(r, "S1")
    assert gt == [0, 1] and phased
    assert get_gq(r, "S1") == 37.5         # falls back GQX -> GQ
    assert get_ad(r, "S1", 3) == [10, 5, 0]
    assert get_dp(r, "S1") == 15           # falls back DP -> DPI
    assert get_format_string(r, "AD", "S1") == "10,5"
    with pytest.raises(ImportError_):
        get_format_int(r, "XX", "S1")
    with pytest.raises(ImportError_):
        get_format_float(r, "XX", "S1")
    # absent sample / field
    assert get_gt(r, "S2") == ([], False)
    assert get_gq(r, "S2") == -1.0
    assert get_dp(r, "S2") == 0


def test_gqx_preferred_over_gq():
    r = make_rec(fmt_keys=["GQX", "GQ"],
                 sample_values={"S1": {"GQX": "11", "GQ": "99"}})
    assert get_gq(r, "S1") == 11.0


def test_set_format():
    r = make_rec(fmt_keys=["GT"], sample_values={"S1": {"GT": "0/1"}})
    set_format(r, "AD", {"S1": [3, 4]})
    assert r.fmt_keys == ["GT", "AD"]
    assert r.sample_values["S1"]["AD"] == "3,4"


def test_ref_padding():
    class FakeFasta:
        def query(self, region):
            # chr1:98-99 -> two bases before pos 100 (1-based)
            assert region == "chr1:98-99"
            return "GG"

    r = make_rec(ref="A", alts=("T", "<DEL>"), pos=100)
    assert add_ref_pad(r, FakeFasta(), 2) == 2
    assert r.pos == 98
    assert r.ref == "GGA"
    assert r.alts == ("GGT", "<DEL>")

    assert is_ref_padded(make_rec(ref="GGA", alts=("GGT",))) == 2
    assert is_ref_padded(make_rec(ref="GGA", alts=("GGT", "<DEL>"))) == 0
    assert is_ref_padded(make_rec(ref="GGA", alts=("TGT",))) == 0


def test_alleles_to_gt_ordering():
    # htslib bcf_alleles2gt: genotype (a,b) -> b(b+1)/2+a
    assert alleles_to_gt(0, 0) == 0
    assert alleles_to_gt(0, 1) == 1
    assert alleles_to_gt(1, 1) == 2
    assert alleles_to_gt(0, 2) == 3
    assert alleles_to_gt(2, 1) == 4
    assert alleles_to_gt(2, 2) == 5


def test_split_multi_allelics():
    meta = HeaderMeta([
        '##INFO=<ID=AC,Number=A,Type=Integer,Description="x">',
        '##INFO=<ID=AF,Number=R,Type=Float,Description="x">',
        '##INFO=<ID=DP,Number=1,Type=Integer,Description="x">',
        '##INFO=<ID=IMPRECISE,Number=0,Type=Flag,Description="x">',
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="x">',
        '##FORMAT=<ID=AD,Number=R,Type=Integer,Description="x">',
        '##FORMAT=<ID=PL,Number=G,Type=Integer,Description="x">',
        '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="x">',
    ])
    r = make_rec(
        ref="A", alts=("T", "C"),
        info={"AC": "5,7", "AF": "0.5,0.2,0.3", "DP": "30",
              "IMPRECISE": True},
        fmt_keys=["GT", "AD", "PL", "DP"],
        sample_values={"S1": {"GT": "1/2", "AD": "10,5,8",
                              "PL": "50,0,40,30,20,10", "DP": "23"}})
    parts = split_multi_allelics(meta, r, ["S1"])
    assert len(parts) == 2

    p0, p1 = parts
    assert p0.alts == ("T",) and p1.alts == ("C",)
    assert p0.info["AC"] == "5" and p1.info["AC"] == "7"
    assert p0.info["AF"] == "0.5,0.2" and p1.info["AF"] == "0.5,0.3"
    assert p0.info["DP"] == "30" and p0.info["IMPRECISE"] is True

    s0 = p0.sample_values["S1"]
    s1 = p1.sample_values["S1"]
    # GT 1/2: allele 1 -> ALT for part 0 / other-alt -> REF for part 1
    assert s0["GT"] == "1/0"
    assert s1["GT"] == "0/1"
    assert s0["AD"] == "10,5" and s1["AD"] == "10,8"
    # PL Number=G diploid: [0/0, 0/alt, alt/alt]
    assert s0["PL"] == "50,0,40"       # indexes 0, a2g(0,1)=1, a2g(1,1)=2
    assert s1["PL"] == "50,30,10"      # indexes 0, a2g(0,2)=3, a2g(2,2)=5
    assert s0["DP"] == "23"


def test_extract_ref_from_mnp():
    r = make_rec(ref="ACG", alts=("TCA",), pos=100,
                 fmt_keys=["GT", "GQ", "DP", "DPF"],
                 sample_values={"S1": {"GT": "1/1", "GQ": "88.4",
                                       "DP": "31", "DPF": "2"}})
    out = extract_ref_from_mnp(r, 1)
    assert out is not None
    assert out.pos == 101 and out.ref == "C"
    row = out.sample_values["S1"]
    assert row["GT"] == "0/0"
    assert row["GQX"] == "88"
    assert row["DP"] == "31" and row["DPF"] == "2"

    r2 = make_rec(ref="ACG", alts=("TCA",),
                  fmt_keys=["GT", "DP"],
                  sample_values={"S1": {"GT": "1/1", "DP": "31"}})
    assert extract_ref_from_mnp(r2, 0) is None
