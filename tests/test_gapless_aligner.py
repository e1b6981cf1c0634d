"""Ported graph-tools GaplessAlignerTest.cpp expectations."""
import pytest

from paragraph_tpu.align.alignment import decode_graph_alignment
from paragraph_tpu.align.gapless import (GaplessAligner, align_without_gaps,
                                         align_path_without_gaps,
                                         check_if_forward_oriented,
                                         count_kmer_matches,
                                         extract_kmers_from_all_positions,
                                         get_best_alignment_to_short_path)
from paragraph_tpu.align.kmer_index import KmerIndex
from paragraph_tpu.graph.model import SequenceGraph


def make_deletion_graph(lf, mid, rf):
    g = SequenceGraph(["LF", "MID", "RF"], [lf, mid, rf])
    g.add_edge(0, 1)
    g.add_edge(0, 2)
    g.add_edge(1, 2)
    return g


def test_str_graphs_are_out_of_scope():
    """graph-tools' STR graphs carry self-loop edges; this engine's
    SequenceGraph is deliberately DAG-only (the gssw fill and the
    Pallas kernel both require a topological node order), so loop
    construction raises instead of silently mis-scoring. The
    GaplessAlignerTest STR cases are therefore not portable."""
    g = SequenceGraph(["LF", "R", "RF"], ["AAAACG", "CCG", "ATTT"])
    g.add_edge(0, 1)
    with pytest.raises(ValueError):
        g.add_edge(1, 1)


def ga_key(ga):
    return (ga.path_start, ga.generate_cigar())


def test_unequal_length_raises():
    with pytest.raises(ValueError):
        align_without_gaps(0, "AAA", "AAAA")
    with pytest.raises(ValueError):
        align_without_gaps(0, "", "")


def test_typical_sequences_aligned():
    na = align_without_gaps(4, "NNNNATCGTTTG", "AGGTTTTG")
    assert na.reference_start == 4
    assert na.generate_cigar() == "1M3X4M"


def test_degenerate_bases_aligned():
    na = align_without_gaps(0, "VVVVV", "AATTC")
    assert na.generate_cigar() == "2M2X1M"


def test_single_node_path_aligned():
    g = make_deletion_graph("AAAACC", "TTTGG", "ATTT")
    ga = align_path_without_gaps(g, ((1,), 1, 4), "ATGC")
    want = decode_graph_alignment(1, "1[1X2M1X]")
    assert ga.node_ids == want.node_ids
    assert ga.generate_cigar() == want.generate_cigar()


def test_multi_node_path_aligned():
    g = make_deletion_graph("AAAACC", "TTTGG", "ATTT")
    ga = align_path_without_gaps(g, ((0, 1, 2), 2, 1), "TTCCTTAGGAT")
    assert ga.path_start == 2
    assert ga.generate_cigar() == "0[2X2M]1[2M1X2M]2[2M]"


def test_kmer_extraction():
    assert extract_kmers_from_all_positions("AAATTT", 4) == [
        "AAAT", "AATT", "ATTT"]
    assert extract_kmers_from_all_positions("AAATTT", 7) == []


def test_best_alignment_to_short_path():
    g = make_deletion_graph("AAACC", "TTGGG", "TTAAA")
    alignments = get_best_alignment_to_short_path(
        g, ((0,), 4, 4), 1, "CCTTA")
    assert [ga_key(a) for a in alignments] == [(3, "0[2M]2[3M]")]


def test_aligner_deletion_graph():
    g = make_deletion_graph("AAAACC", "TTTGG", "ATTT")
    aligner = GaplessAligner(g, 3)
    alignments = aligner.align("TTCCTTAGGAT")
    assert [ga_key(a) for a in alignments] == [(2, "0[2X2M]1[2M1X2M]2[2M]")]


def test_forward_orientation_check():
    g = make_deletion_graph("AAAACC", "TTTGG", "ATTT")
    index = KmerIndex(g, 4)
    assert count_kmer_matches(index, "AAAA") == 1
    assert check_if_forward_oriented(index, "AAAACC")
    assert not check_if_forward_oriented(index, "GGTTTT")
