"""Differential tests: pure-Python CRAM reader vs our BAM reader.

Fixtures under tests/data/cram/ were written by htslib 1.9 (compiled from
the read-only reference tarball) via tests/tools/bam2cram.c from the
reference test-data BAMs; decoding them must reproduce the same records the
BAM reader yields — the same equivalence htslib guarantees for the
reference's CRAM support (common/BamReader.cpp works on either container).
"""
import os

import pytest

from paragraph_tpu.io.bam import BamReader
from paragraph_tpu.io.cram import CramReader

HERE = os.path.dirname(__file__)
DATA = os.path.join(HERE, "data", "cram")
REF = "/root/reference/share/test-data"

CASES = [
    ("sample1.cram", f"{REF}/round-trip-genotyping/sample1.bam",
     f"{REF}/round-trip-genotyping/dummy.fa"),
    ("sample2.cram", f"{REF}/round-trip-genotyping/sample2.bam",
     f"{REF}/round-trip-genotyping/dummy.fa"),
    ("chrX.cram", f"{REF}/paragraph/long-del/chrX_graph_typing.bam",
     f"{REF}/paragraph/long-del/chrX_graph_typing.fa"),
    ("chrX_noref.cram", f"{REF}/paragraph/long-del/chrX_graph_typing.bam",
     f"{REF}/paragraph/long-del/chrX_graph_typing.fa"),
    ("chrX_embed.cram", f"{REF}/paragraph/long-del/chrX_graph_typing.bam",
     f"{REF}/paragraph/long-del/chrX_graph_typing.fa"),
    ("deletion.cram", f"{REF}/misc/deletion.bam", f"{REF}/misc/deletion.fa"),
    # CRAM 2.1 (no block/container CRCs, ITF8 record counters)
    ("chrX_v21.cram", f"{REF}/paragraph/long-del/chrX_graph_typing.bam",
     f"{REF}/paragraph/long-del/chrX_graph_typing.fa"),
]


def _bam_records(bam_path, ref_path):
    reader = BamReader(bam_path)
    recs = []
    for tid in range(len(reader.contigs)):
        recs.extend(reader.fetch(tid, 0, reader.contigs[tid][1],
                                 primary_only=False))
    reader.close()
    return recs


def _key(r):
    return (r.chrom_id, r.pos, r.fragment_id, r.flag & 0xFC0)


@pytest.mark.parametrize("cram_name,bam_path,ref_path",
                         CASES, ids=[c[0] for c in CASES])
def test_cram_matches_bam(cram_name, bam_path, ref_path):
    cram_path = os.path.join(DATA, cram_name)
    no_ref = "noref" in cram_name or "embed" in cram_name
    cram = CramReader(cram_path, reference_path="" if no_ref else ref_path)
    cram_recs = sorted(cram.records(), key=_key)
    bam_recs = sorted(_bam_records(bam_path, ref_path), key=_key)
    assert len(cram_recs) == len(bam_recs)
    for c, b in zip(cram_recs, bam_recs):
        assert c.fragment_id == b.fragment_id
        assert c.flag == b.flag, (c.fragment_id, bin(c.flag), bin(b.flag))
        assert c.chrom_id == b.chrom_id
        assert c.pos == b.pos
        assert c.mapq == b.mapq
        assert c.bases == b.bases, c.fragment_id
        assert c.quals == b.quals, c.fragment_id
        assert c.cigar == b.cigar, (c.fragment_id, c.cigar, b.cigar)
        if b.flag & 0x1:
            assert c.mate_chrom_id == b.mate_chrom_id, c.fragment_id
        else:
            # htslib's own CRAM read drops RNEXT for unpaired records
            # (cram_decode.c xref: !BAM_FPAIRED -> mate_ref_id = -1);
            # verified against a cram_dump of these fixtures.
            assert c.mate_chrom_id == -1
        assert c.mate_pos == b.mate_pos, c.fragment_id
        assert c.tlen == b.tlen, c.fragment_id


def test_cram_header_and_contigs():
    cram = CramReader(os.path.join(DATA, "sample1.cram"))
    bam = BamReader(f"{REF}/round-trip-genotyping/sample1.bam")
    assert cram.contigs == bam.contigs
    assert cram.contig_map == bam.contig_map


def test_cram_region_fetch_uses_index():
    ref = f"{REF}/paragraph/long-del/chrX_graph_typing.fa"
    bam_path = f"{REF}/paragraph/long-del/chrX_graph_typing.bam"
    cram = CramReader(os.path.join(DATA, "chrX.cram"), reference_path=ref)
    bam = BamReader(bam_path)
    assert cram._index is not None and len(cram._index.entries) > 1
    for beg, end in [(0, 10_000), (3_000, 3_500), (7_000, 8_000)]:
        got = sorted(cram.fetch(0, beg, end), key=_key)
        want = sorted(bam.fetch(0, beg, end), key=_key)
        assert [(r.fragment_id, r.pos) for r in got] == \
            [(r.fragment_id, r.pos) for r in want]


def test_cram_mate_lookup():
    ref = f"{REF}/paragraph/long-del/chrX_graph_typing.fa"
    cram = CramReader(os.path.join(DATA, "chrX.cram"), reference_path=ref)
    recs = list(cram.records())
    paired = [r for r in recs
              if (r.flag & 0x1) and r.is_mate_mapped and r.fragment_id]
    assert paired
    found = 0
    for r in paired[:10]:
        mate = cram.get_aligned_mate(r)
        if mate is not None:
            assert mate.fragment_id == r.fragment_id
            assert mate.is_first_mate != r.is_first_mate
            found += 1
    assert found > 0


def test_cram_end_to_end_roundtrip(tmp_path):
    """Full multigrmpy round trip driven from CRAM inputs: must produce the
    reference's committed expected VCF records, identical to the BAM path
    (the reference's pipeline is container-agnostic via htslib)."""
    import gzip

    from paragraph_tpu.pipeline.multigrmpy import MultigrmpyOptions, run

    rt = f"{REF}/round-trip-genotyping"
    manifest = tmp_path / "samples_cram.txt"
    manifest.write_text(
        "id\tpath\tdepth\tread length\n"
        f"sample1\t{DATA}/sample1.cram\t1\t50\n"
        f"sample2\t{DATA}/sample2.cram\t1\t50\n")
    out_dir = tmp_path / "out"
    options = MultigrmpyOptions(
        input=os.path.join(rt, "candidates.vcf"),
        manifest=str(manifest),
        reference=os.path.join(rt, "dummy.fa"),
        output=str(out_dir),
        max_ref_node_length=1000,
    )
    result = run(options)
    with gzip.open(result["genotypes_vcf"], "rt") as f:
        lines = [l.rstrip("\n") for l in f if not l.startswith("##")]
    with open(os.path.join(rt, "expected-vcf-record.txt")) as f:
        expected = [l.rstrip("\n") for l in f if l.strip()]
    assert lines == expected
