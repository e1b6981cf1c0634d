"""Port of graph-tools KmerIndexTest expectations (kmer presence, path
counts, unique-kmer edge/node coverage)."""
from paragraph_tpu.align.kmer_index import KmerIndex
from paragraph_tpu.graph.model import SequenceGraph


def _deletion_graph(lf, mid, rf):
    g = SequenceGraph(["LF", "MID", "RF"], [lf, mid, rf])
    for f, t in [(0, 1), (1, 2), (0, 2)]:
        g.add_edge(f, t)
    return g


def _double_swap_graph():
    g = SequenceGraph(["LF", "A1", "B1", "M", "A2", "B2", "RF"][:7],
                      ["AAA", "TTT", "CCC", "AAA", "TTT", "AAA", "TTT"])
    for f, t in [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (3, 5), (4, 6),
                 (5, 6)]:
        g.add_edge(f, t)
    return g


def test_kmers_present():
    """CheckingIfKmersArePresent (KmerIndexTest.cpp:104-112)."""
    index = KmerIndex(_double_swap_graph(), 6)
    assert index.num_paths("AAATTT") > 0
    assert index.num_paths("AAATTG") == 0
    assert index.num_paths("AAA") == 0


def test_path_counts():
    """CountingNumberOfPathsAssociatedWithKmer
    (KmerIndexTest.cpp:114-132)."""
    g = _double_swap_graph()
    index6 = KmerIndex(g, 6)
    assert index6.num_paths("AAATTT") == 3
    assert index6.num_paths("AAATTG") == 0
    assert index6.num_paths("TTTTTT") == 1

    index1 = KmerIndex(g, 1)
    assert index1.num_paths("A") == 9
    assert index1.num_paths("C") == 3
    assert index1.num_paths("T") == 9
    assert index1.num_paths("G") == 0


def test_paths_extracted():
    """PathExtraction (KmerIndexTest.cpp:93-102): AATT occurs across all
    three swap boundaries."""
    index = KmerIndex(_double_swap_graph(), 4)
    paths = index.get_paths("AATT")
    assert paths is not None and len(paths) == 3


def test_unique_kmer_counting():
    """UniqueKmerCounting (KmerIndexTest.cpp:134-146)."""
    g = _deletion_graph("AC", "GG", "ACG")
    index = KmerIndex(g, 3)
    assert index.num_unique_kmers_overlapping_edge(0, 1) == 1
    assert index.num_unique_kmers_overlapping_edge(1, 2) == 2
    assert index.num_unique_kmers_overlapping_node(0) == 3
    assert index.num_unique_kmers_overlapping_node(2) == 4
