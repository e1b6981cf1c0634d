"""BreakpointFinder / BreakpointStatistics behaviour on the swap-or-delete
fixture (the reference's test_breakpointstatistics.cpp is an empty TODO;
these assertions pin the semantics the genotyper relies on:
BreakpointFinder.cpp breakpoint discovery + BreakpointStatistics.cpp
canonical alleles and count accumulation)."""
from paragraph_tpu.genotyping.breakpoint_stats import (BreakpointStatistics,
                                                       create_breakpoint_map)
from paragraph_tpu.graph.model import SequenceGraph


def _graph():
    g = SequenceGraph(["LF", "P1", "Q1", "RF"],
                      ["AAAAAAAAAAA", "TTTTTTTT", "GGGGGGGG",
                       "AAAAAAAAAAA"])
    for f, t in [(0, 1), (0, 2), (0, 3), (1, 3), (2, 3)]:
        g.add_edge(f, t)
    g.add_label_to_edge(0, 1, "P")
    g.add_label_to_edge(1, 3, "P")
    g.add_label_to_edge(0, 2, "Q")
    g.add_label_to_edge(2, 3, "Q")
    g.add_label_to_edge(0, 3, "REF")
    return g


def test_breakpoint_map():
    bps = create_breakpoint_map(_graph())
    # LF has 3 successors -> breakpoint "LF_"; RF has 3 predecessors ->
    # breakpoint "_RF"
    assert set(bps) == {"LF_", "_RF"}


def test_canonical_alleles_and_counts():
    g = _graph()
    bp = BreakpointStatistics(g, 0, True)  # LF_
    assert set(bp.edge_names) == {"LF_P1", "LF_Q1", "LF_RF"}
    # three distinct edge sets -> three canonical alleles, REF pinned
    assert sorted(bp.canonical_allele_names) == ["P", "Q", "REF"]
    assert bp.get_canonical_allele_name("REF") == "REF"

    bp.add_counts({"read_counts_by_edge": {
        "LF_P1": 7, "LF_Q1": 2, "LF_RF": 11}})
    assert bp.get_count("LF_P1") == 7
    assert bp.get_count("P") == 7
    assert bp.get_count("Q") == 2
    assert bp.get_count("REF") == 11

    # accumulation across samples adds
    bp.add_counts({"read_counts_by_edge": {"LF_P1": 3}})
    assert bp.get_count("P") == 10


def test_alleles_sharing_edges_collapse():
    """Two labels riding identical edge sets form one canonical allele."""
    g = SequenceGraph(["LF", "MID", "RF"], ["AAAA", "TTTT", "GGGG"])
    g.add_edge(0, 1)
    g.add_edge(1, 2)
    g.add_edge(0, 2)
    for lbl in ("ALT1", "ALT2"):
        g.add_label_to_edge(0, 1, lbl)
        g.add_label_to_edge(1, 2, lbl)
    g.add_label_to_edge(0, 2, "REF")
    bp = BreakpointStatistics(g, 0, True)
    assert len(bp.canonical_allele_names) == 2
    assert bp.get_canonical_allele_name("ALT2") == \
        bp.get_canonical_allele_name("ALT1")
    bp.add_counts({"read_counts_by_edge": {"LF_MID": 5, "LF_RF": 9}})
    assert bp.get_count("ALT1") == 5
    assert bp.get_count("ALT2") == 5
    assert bp.get_count("REF") == 9
