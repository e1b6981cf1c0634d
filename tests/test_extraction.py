"""Port of the reference's test_readextraction.cpp expectations (mock
reader instead of mocked htslib)."""
from paragraph_tpu.io.bam import BamRecord
from paragraph_tpu.io.regions import Region
from paragraph_tpu.reads.extraction import (ReadPairs,
                                            extract_reads_from_region,
                                            is_read_or_mate_in_region,
                                            recover_missing_mates)
from paragraph_tpu.reads.read import Read


def _record(fragment_id, chrom_id, pos, bases="AAAA", flag=0x40,
            mate_chrom_id=-1, mate_pos=-1):
    return BamRecord(fragment_id=fragment_id, flag=flag, chrom_id=chrom_id,
                     pos=pos, mapq=60, cigar=[(0, len(bases))],
                     mate_chrom_id=mate_chrom_id, mate_pos=mate_pos,
                     tlen=0, bases=bases, quals="#" * len(bases))


class FakeReader:
    """Stands in for BamReader (the reference mocks common::ReadReader)."""

    def __init__(self, records=(), mates=None):
        self.contig_map = {"1": 0}
        self.records = list(records)
        self.mates = mates or {}

    def fetch(self, tid, start, end):
        return iter(self.records)

    def get_aligned_mate(self, probe):
        return self.mates.get(probe.fragment_id)


def test_extracts_all_reads_from_reader():
    """ExtractReads.ExtractsAllReadsFromReader
    (test_readextraction.cpp:106-122)."""
    reader = FakeReader([_record("Fragment_1", 1, 100),
                         _record("Fragment_2", 1, 100)])
    out = []
    extract_reads_from_region(out, 10, reader, Region("1", 0, 1800), 10000)
    assert [r.fragment_id for r in out] == ["Fragment_1", "Fragment_2"]
    assert all(r.bases == "AAAA" for r in out)


def test_extracts_max_allowed_reads():
    """ExtractReads.ExtractsMaxAllowedReadsFromReader
    (test_readextraction.cpp:124-137)."""
    reader = FakeReader([_record("Fragment_1", 1, 100),
                         _record("Fragment_2", 1, 100)])
    out = []
    extract_reads_from_region(out, 1, reader, Region("1", 0, 1800), 10000)
    assert [r.fragment_id for r in out] == ["Fragment_1"]


def test_recovers_anomalous_mates():
    """RecoverMissingMates.RecoversAnomalousMates
    (test_readextraction.cpp:139-159): mates further than 1kb (or on
    another chromosome) are re-fetched; normal pairs are not."""
    read_a = Read(fragment_id="Fragment_1", bases="AAAA", quals="####",
                  is_first_mate=True, chrom_id=1, pos=100,
                  mate_chrom_id=1, mate_pos=1600)
    read_b = Read(fragment_id="Fragment_2", bases="CCCC", quals="####",
                  is_first_mate=True, chrom_id=3, pos=500,
                  mate_chrom_id=3, mate_pos=800)
    read_c = Read(fragment_id="Fragment_3", bases="AAAA", quals="####",
                  is_first_mate=False, chrom_id=5, pos=500,
                  mate_chrom_id=3, mate_pos=500)

    pairs = ReadPairs()
    pairs.add(read_a)
    pairs.add(read_b)
    pairs.add(read_c)

    reader = FakeReader(mates={
        "Fragment_1": _record("Fragment_1", 1, 1600, bases="TTTT",
                              flag=0x80),
        "Fragment_3": _record("Fragment_3", 3, 500, bases="GGGG",
                              flag=0x40),
    })
    recover_missing_mates(reader, pairs)
    out = pairs.get_reads()
    assert [(r.fragment_id, r.bases) for r in out] == [
        ("Fragment_1", "AAAA"), ("Fragment_1", "TTTT"),
        ("Fragment_2", "CCCC"),
        ("Fragment_3", "GGGG"), ("Fragment_3", "AAAA")]


def test_is_read_or_its_mate_in_region():
    """ExtractReads.isReadOrItsMateInRegion
    (test_readextraction.cpp:161-174)."""
    read1 = Read(fragment_id="Fragment_1", bases="AAAA", quals="####",
                 chrom_id=1, pos=100, mate_chrom_id=-1, mate_pos=-1)
    assert not is_read_or_mate_in_region(read1, Region("1", 0, 50))
    assert is_read_or_mate_in_region(read1, Region("1", 101, 103))
    assert not is_read_or_mate_in_region(read1, Region("1", 110, 200))

    read1.mate_chrom_id = 1
    read1.mate_pos = 1600
    assert is_read_or_mate_in_region(read1, Region("1", 1550, 1650))


def test_read_pairs_container():
    """test_readpairs.cpp:51-101 (counting, slotting, ordering)."""
    r1f1 = Read(fragment_id="frag_1", bases="ATCG", quals="####",
                is_first_mate=True)
    r2f1 = Read(fragment_id="frag_1", bases="ATCG", quals="####",
                is_first_mate=False)
    r2f2 = Read(fragment_id="frag_2", bases="ATCG", quals="####",
                is_first_mate=False)

    pairs = ReadPairs()
    assert pairs.num_reads == 0

    pairs.add(r1f1)
    pairs.add(r2f2)
    assert pairs.num_reads == 2

    # re-adding to an occupied slot keeps the count (last write wins)
    pairs.add(r1f1)
    assert pairs.num_reads == 2

    pairs.add(r2f1)
    assert pairs.num_reads == 3
    assert [r.fragment_id for r in pairs.get_reads()] == [
        "frag_1", "frag_1", "frag_2"]
