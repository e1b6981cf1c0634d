"""Port of the reference's test_readfilter.cpp expectations (NonUniq,
BadAlign, KmerFilter incl. SNP-mismatch kmer coverage)."""
from paragraph_tpu.graph.model import SequenceGraph
from paragraph_tpu.reads.filters import create_read_filter
from paragraph_tpu.reads.read import Read, MAPPED


def _deletion_graph(lf, mid, rf):
    g = SequenceGraph(["LF", "MID", "RF"], [lf, mid, rf])
    for f, t in [(0, 1), (1, 2), (0, 2)]:
        g.add_edge(f, t)
    return g


def _read(name, bases, cigar, score, unique=True):
    r = Read(fragment_id=name, bases=bases, quals="#" * len(bases))
    r.graph_cigar = cigar
    r.graph_alignment_score = score
    r.graph_mapping_status = MAPPED
    r.is_graph_alignment_unique = unique
    return r


def test_filter_nonuniq():
    """ReadFilter.FilterNonUniq (test_readfilter.cpp:32-59)."""
    g = _deletion_graph("AAAA", "TTGG", "TTTT")
    filt = create_read_filter(g, True, 0.0, 0)
    assert filt.filter_read(
        _read("read1", "AAAATTCCC", "0[4M]1[2M3S]", 6, unique=False)) == \
        (True, "nonuniq")
    assert filt.filter_read(
        _read("read2", "AAAATTGG", "0[4M]1[4M]", 8)) == (False, "")


def test_filter_bad_align():
    """ReadFilter.FilterBadAlign (test_readfilter.cpp:61-88)."""
    g = _deletion_graph("AAAA", "GGGG", "TTTT")
    filt = create_read_filter(g, True, 0.4, 0)
    assert filt.filter_read(
        _read("read1", "AAAACCCCCCCC", "0[4M8S]", 4)) == \
        (True, "bad_align")
    assert filt.filter_read(
        _read("read2", "AAAAGCCCCCCC", "0[4M]1[1M7S]", 5)) == (False, "")


def test_filter_kmers():
    """ReadFilter.FilterKmers (test_readfilter.cpp:90-116)."""
    g = _deletion_graph("AGAG", "TTGG", "TTT")
    filt = create_read_filter(g, False, 0.0, 3)
    assert filt.filter_read(
        _read("read", "AGAGTT", "0[4M]1[2M]", 6)) == \
        (True, "kmer_uncov_1")
    assert filt.filter_read(
        _read("read", "AGAGTTT", "0[4M]2[3M]", 7)) == (False, "")


def test_filter_kmers_snp_mismatch():
    """ReadFilter.FilterKmersSnpMismatch (test_readfilter.cpp:118-165)."""
    g = SequenceGraph(["LF", "A", "B", "RF"], ["AGAG", "T", "C", "ACAC"])
    for f, t in [(0, 1), (0, 2), (1, 3), (2, 3)]:
        g.add_edge(f, t)
    filt = create_read_filter(g, False, 0.0, 4)
    assert filt.filter_read(
        _read("read", "AGAGGACAC", "0[4M]1[1X]3[4M]", 8)) == \
        (True, "kmer_uncov_1")
    assert filt.filter_read(
        _read("read", "AGAGTACAC", "0[4M]1[1M]3[4M]", 8)) == (False, "")
    assert filt.filter_read(
        _read("read", "AGAGTACAC", "0[4M]2[1X]3[4M]", 8)) == \
        (True, "kmer_uncov_2")
    assert filt.filter_read(
        _read("read", "AGAGCACAC", "0[4M]2[1M]3[4M]", 8)) == (False, "")
