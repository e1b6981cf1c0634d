"""BCF 2.2 reader/writer (io/bcf.py) — the htslib-free counterpart of
the reference's BCFHelpers.cpp: typed-value codec round trip, GT
packing, and the full multigrmpy round-trip pipeline re-run from ``.bcf``
input (BASELINE round-trip oracle, expected-vcf-record.txt).
"""
import gzip
import os

import pytest

from paragraph_tpu.io.vcf import VcfReader, VcfRecord, VcfWriter

RT = "/root/reference/share/test-data/round-trip-genotyping"

HEADER = [
    "##fileformat=VCFv4.2",
    '##FILTER=<ID=PASS,Description="All filters passed">',
    '##FILTER=<ID=LOWQ,Description="Low quality">',
    '##INFO=<ID=END,Number=1,Type=Integer,Description="End">',
    '##INFO=<ID=AF,Number=A,Type=Float,Description="Allele freq">',
    '##INFO=<ID=SVTYPE,Number=1,Type=String,Description="Type">',
    '##INFO=<ID=IMPRECISE,Number=0,Type=Flag,Description="Imprecise">',
    '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
    '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="Depth">',
    '##FORMAT=<ID=AD,Number=.,Type=Integer,Description="Allele depths">',
    '##FORMAT=<ID=FT,Number=1,Type=String,Description="Filter">',
    '##FORMAT=<ID=GL,Number=G,Type=Float,Description="Likelihoods">',
    "##contig=<ID=chr1,length=1000000>",
    "##contig=<ID=chr2,length=500000>",
]


def _mkrec(**kw):
    base = dict(chrom="chr1", pos=100, vid="v1", ref="A", alts=["T"],
                qual=None, filters=[], info={}, fmt_keys=[],
                sample_values={})
    base.update(kw)
    return VcfRecord(**base)


def _roundtrip(tmp_path, records, samples):
    path = str(tmp_path / "t.bcf")
    w = VcfWriter(path, HEADER, samples)
    for r in records:
        w.write(r)
    w.close()
    rd = VcfReader(path)
    assert rd.header_lines == HEADER
    assert rd.samples == samples
    out = list(rd)
    rd.close()
    return out


def test_sites_only_roundtrip(tmp_path):
    recs = [
        _mkrec(pos=100, vid="del1", ref="ACGT", alts=["A"],
               filters=["PASS"], qual="29.5",
               info={"END": "103", "SVTYPE": "DEL", "IMPRECISE": True}),
        _mkrec(chrom="chr2", pos=7, vid=None, ref="C",
               alts=["<DEL>", "G"], filters=["LOWQ", "PASS"],
               info={"AF": "0.25,0.5"}),
    ]
    out = _roundtrip(tmp_path, recs, [])
    assert out[0].chrom == "chr1" and out[0].pos == 100
    assert out[0].id == "del1"
    assert out[0].ref == "ACGT" and out[0].alts == ("A",)
    assert out[0].filters == ["PASS"]
    assert float(out[0].qual) == 29.5
    assert out[0].info["END"] == "103"
    assert out[0].info["SVTYPE"] == "DEL"
    assert out[0].info["IMPRECISE"] is True
    assert out[0].stop == 103
    assert out[1].chrom == "chr2" and out[1].alts == ("<DEL>", "G")
    assert out[1].id is None and out[1].qual is None
    assert out[1].filters == ["LOWQ", "PASS"]
    assert out[1].info["AF"] == "0.25,0.5"


def test_format_and_gt_roundtrip(tmp_path):
    samples = ["s1", "s2", "s3"]
    rec = _mkrec(
        fmt_keys=["GT", "DP", "AD", "FT", "GL"],
        sample_values={
            "s1": {"GT": "0/1", "DP": "30", "AD": "12,18",
                   "FT": "PASS", "GL": "-1.5,0,-20"},
            "s2": {"GT": "1|1", "DP": ".", "AD": "0,44",
                   "FT": "UNMATCHED,NO_VALID_GT", "GL": "."},
            "s3": {"GT": ".", "DP": "0", "AD": ".", "FT": ".",
                   "GL": "-0.25,.,-3"},
        })
    (out,) = _roundtrip(tmp_path, [rec], samples)
    assert out.fmt_keys == ["GT", "DP", "AD", "FT", "GL"]
    v = out.sample_values
    assert v["s1"]["GT"] == "0/1" and v["s2"]["GT"] == "1|1"
    assert v["s3"]["GT"] == "."
    assert v["s1"]["DP"] == "30" and v["s2"]["DP"] == "."
    assert v["s2"]["AD"] == "0,44" and v["s3"]["AD"] == "."
    assert v["s2"]["FT"] == "UNMATCHED,NO_VALID_GT"
    assert v["s1"]["GL"] == "-1.5,0,-20"
    assert v["s3"]["GL"] == "-0.25,.,-3"


def test_large_ints_choose_wider_types(tmp_path):
    rec = _mkrec(info={"END": "2000000"}, pos=1999000, ref="N",
                 alts=["<DEL>"],
                 fmt_keys=["DP"],
                 sample_values={"s1": {"DP": "70000"}})
    # chr1 length only 1e6 in header, but BCF doesn't validate bounds
    (out,) = _roundtrip(tmp_path, [rec], ["s1"])
    assert out.info["END"] == "2000000"
    assert out.sample_values["s1"]["DP"] == "70000"


def test_roundtrip_pipeline_from_bcf_input(tmp_path):
    """The BASELINE round-trip oracle re-run with BCF input: convert
    candidates.vcf to .bcf with our writer, run the full pipeline, and
    require the same final VCF records as expected-vcf-record.txt."""
    from paragraph_tpu.pipeline.multigrmpy import MultigrmpyOptions, run

    src = VcfReader(os.path.join(RT, "candidates.vcf"))
    bcf_path = str(tmp_path / "candidates.bcf")
    w = VcfWriter(bcf_path, src.header_lines, src.samples)
    for rec in src:
        w.write(rec)
    w.close()

    out_dir = str(tmp_path / "out")
    result = run(MultigrmpyOptions(
        input=bcf_path,
        manifest=os.path.join(RT, "samples.txt"),
        reference=os.path.join(RT, "dummy.fa"),
        output=out_dir,
        max_ref_node_length=1000,
    ))
    import re

    # GRMPY_ID embeds the input path+hash, which legitimately differs
    # between the .vcf and .bcf encodings of the same records
    def norm(line):
        return re.sub(r"GRMPY_ID=[^;\t]*@[0-9a-f]+", "GRMPY_ID=X", line)

    with gzip.open(result["genotypes_vcf"], "rt") as f:
        lines = [norm(l.rstrip("\n")) for l in f if not l.startswith("##")]
    with open(os.path.join(RT, "expected-vcf-record.txt")) as f:
        expected = [norm(l.rstrip("\n")) for l in f if l.strip()]
    assert lines == expected
