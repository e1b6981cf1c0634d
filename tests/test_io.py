"""IO layer tests against the reference's bundled test data."""
import os

from paragraph_tpu.io import FastaFile, BamReader, VcfReader, Region
from paragraph_tpu.io.bgzf import BgzfWriter, BgzfReader

RT = "/root/reference/share/test-data/round-trip-genotyping"
LD = "/root/reference/share/test-data/paragraph/long-del"


def test_fasta_query():
    fa = FastaFile(os.path.join(RT, "dummy.fa"))
    assert fa.contigs == ["chr1"]
    # dummy.fa is poly-A with "TC" at positions 161-162 (1-based)
    assert fa.query("chr1:161-162") == "TC"
    assert fa.query("chr1:1-5") == "AAAAA"
    assert fa.query("chr1:160-163") == "ATCA"


def test_fasta_multiline_index():
    fa = FastaFile(os.path.join(LD, "chrX_graph_typing.fa"))
    seq = fa.query(fa.contigs[0] + ":1-50")
    assert len(seq) == 50
    assert set(seq) <= set("ACGTN")


def test_bam_header_and_fetch():
    bam = BamReader(os.path.join(RT, "sample1.bam"))
    assert bam.contigs[0][0] == "chr1"
    reads = list(bam.fetch_region("chr1:1-400"))
    assert len(reads) > 0
    for r in reads:
        assert len(r.bases) == len(r.quals)
        assert set(r.bases) <= set("ACGTN=")
    # all reads should overlap the region
    names = {r.fragment_id for r in reads}
    assert len(names) >= 1


def test_bam_region_filtering():
    bam = BamReader(os.path.join(RT, "sample1.bam"))
    all_reads = list(bam.fetch_region("chr1:1-500"))
    window = list(bam.fetch_region("chr1:161-162"))
    assert len(window) <= len(all_reads)
    for r in window:
        assert r.pos < 162 and r.end_pos() > 160


def test_bam_mate_lookup():
    bam = BamReader(os.path.join(RT, "sample1.bam"))
    reads = list(bam.fetch_region("chr1:1-500"))
    paired = [r for r in reads if r.flag & 0x1]
    if paired:
        r = paired[0]
        mate = bam.get_aligned_mate(r)
        if mate is not None:
            assert mate.fragment_id == r.fragment_id
            assert mate.is_first_mate != r.is_first_mate


def test_vcf_reader():
    vcf = VcfReader(os.path.join(RT, "candidates.vcf"))
    records = list(vcf)
    assert len(records) == 2
    ins, dele = records
    assert ins.id == "test-ins"
    assert ins.pos == 161 and ins.stop == 161
    assert ins.alleles == ("T", "TGGGGGG")
    assert dele.id == "test-del"
    assert dele.pos == 161 and dele.stop == 162
    assert dele.alleles == ("TC", "T")


def test_bgzf_roundtrip(tmp_path):
    p = str(tmp_path / "t.gz")
    w = BgzfWriter(p)
    payload = b"hello world\n" * 10000
    w.write(payload)
    w.close()
    import gzip

    with gzip.open(p, "rb") as f:
        assert f.read() == payload
    r = BgzfReader(p)
    assert r.read(5) == b"hello"


def test_region():
    r = Region.from_string("chr1:100-200")
    assert r.extended(150) == Region("chr1", 1, 350)
    assert str(r) == "chr1:100-200"


def test_fasta_reference_expectations():
    """test_fasta.cpp:39-71 on the reference's chrQ.fa fixture."""
    from paragraph_tpu.io.fasta import FastaFile

    f = FastaFile("/root/reference/share/test-data/misc/chrQ.fa")
    assert f.query("chrQ:5-9") == "CCAAA"
    assert f.query("chrS:151") == ""  # past contig end
    assert f.query("chrT:50-120") == (
        "TTCAGTGTTCTTTTTACTTAAGCCTTCTTTCTGGTACGTATGAGGTGTGCTGTCATACGT"
        "ATGTCGTTATT")
    assert f.query("chrT:50-200") == (
        "TTCAGTGTTCTTTTTACTTAAGCCTTCTTTCTGGTACGTATGAGGTGTGCTGTCATACGT"
        "ATGTCGTTATTTCTCTTTTCAGATTAGTCATGTCCCTAATT")


def test_fetch_columns_parity():
    """Columnar C decode must match the record-by-record fetch exactly
    (fields, names, bases, quals, order) on every query window."""
    bam = BamReader(os.path.join(RT, "sample1.bam"))
    for beg, end in ((0, 400), (0, 500), (160, 162), (490, 500)):
        recs = list(bam.fetch(0, beg, end))
        cols = bam.fetch_columns(0, beg, end)
        if cols is None:  # native lib unavailable: nothing to compare
            return
        ints, text, offs = cols["ints"], cols["text"], cols["offs"]
        assert len(ints) == len(recs)
        for i, r in enumerate(recs):
            refid, pos, mapq, flag, mrefid, mpos, tlen, l_seq = (
                int(x) for x in ints[i])
            assert (refid, pos, mapq, flag, mrefid, mpos, tlen) == (
                r.chrom_id, r.pos, r.mapq, r.flag, r.mate_chrom_id,
                r.mate_pos, r.tlen)
            name_start = int(offs[i - 1, 2]) if i else 0
            ne, be, qe = (int(x) for x in offs[i])
            assert text[name_start:ne].decode() == r.fragment_id
            assert text[ne:be].decode() == r.bases
            assert text[be:qe].decode() == r.quals
