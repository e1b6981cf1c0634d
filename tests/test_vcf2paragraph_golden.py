"""Port of the reference's test_VCF2Paragraph.py golden-JSON diffs
(src/python/test/test_VCF2Paragraph.py:54-92): each insertion VCF under
share/test-data/paragraph/insertions/ is converted with
`--alt-splitting --read-len 5 --max-ref-node-length 10 --alt-paths
--retrieve-reference-sequence -g alleles` (and once without alt
splitting) and must match the committed golden JSON exactly, ignoring
only `model_name`.

The reference test requires a local hg38; the golden JSONs embed every
reference base the conversion touches (`reference_sequence` fields), so
we synthesize a minimal chr20 FASTA from the goldens instead.
"""
import glob
import json
import os

import pytest

INS_DIR = "/root/reference/share/test-data/paragraph/insertions"
VCFS = sorted(glob.glob(os.path.join(INS_DIR, "*.vcf")))


@pytest.fixture(scope="module")
def mini_hg38(tmp_path_factory):
    """chr20 stub: N-filled, with the golden JSONs' reference spans."""
    from paragraph_tpu.io.regions import parse_region

    spans = []
    max_end = 0
    for g in glob.glob(os.path.join(INS_DIR, "*.json")):
        doc = json.load(open(g))
        for n in doc["nodes"]:
            if "reference" in n and "reference_sequence" in n:
                chrom, start, end = parse_region(n["reference"])
                assert chrom == "chr20"
                spans.append((start - 1, n["reference_sequence"]))
                max_end = max(max_end, end)
    seq = bytearray(b"N" * (max_end + 100))
    for start0, bases in spans:
        seq[start0:start0 + len(bases)] = bases.encode()
    path = tmp_path_factory.mktemp("minihg38") / "hg38_chr20_stub.fa"
    with open(path, "w") as f:
        f.write(">chr20\n")
        s = seq.decode()
        for i in range(0, len(s), 60):
            f.write(s[i:i + 60] + "\n")
    return str(path)


def _convert(vcf, ref, out, alt_splitting):
    from paragraph_tpu.cli.main import cmd_vcf2paragraph

    argv = [vcf, out, "-r", ref, "-g", "alleles", "-p", "5",
            "-l", "10", "--alt-paths", "--retrieve-reference-sequence"]
    if alt_splitting:
        argv.append("--alt-splitting")
    assert cmd_vcf2paragraph(argv) == 0
    return json.load(open(out))


def _strip(doc):
    doc = dict(doc)
    doc.pop("model_name", None)
    return doc


@pytest.mark.parametrize("vcf", VCFS, ids=[os.path.basename(v) for v in VCFS])
@pytest.mark.parametrize("alt_splitting", [True, False],
                         ids=["alt-split", "no-alt-split"])
def test_insertion_goldens(vcf, alt_splitting, mini_hg38, tmp_path):
    golden = vcf.replace(".vcf", ".json" if alt_splitting else ".noas.json")
    expected = _strip(json.load(open(golden)))
    got = _strip(_convert(vcf, mini_hg38, str(tmp_path / "out.json"),
                          alt_splitting))
    assert got == expected
