"""Port of graph-tools PathOperationsTest (graph-tools tarball
tests/PathOperationsTest.cpp): prefix-suffix overlap detection with
offsets, adjacency, and merge results on swap / double-swap graphs."""
from paragraph_tpu.graph.model import SequenceGraph
from paragraph_tpu.pipeline.haplotypes import (LitePath,
                                               check_paths_adjacent,
                                               check_prefix_suffix_overlap,
                                               merge_paths)


def _swap_graph():
    # makeSwapGraph("AAAA","TTTT","CCCC","GGGG"): LF, A, B, RF
    g = SequenceGraph(["LF", "A", "B", "RF"],
                      ["AAAA", "TTTT", "CCCC", "GGGG"])
    for f, t in [(0, 1), (0, 2), (1, 3), (2, 3)]:
        g.add_edge(f, t)
    return g


def _double_swap_graph():
    g = SequenceGraph(["LF", "A1", "B1", "M", "A2", "B2", "RF"],
                      ["AAAA", "TTTT", "CCCC", "GGGG", "TTTT", "CCCC",
                       "AAAA"])
    for f, t in [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (3, 5), (4, 6),
                 (5, 6)]:
        g.add_edge(f, t)
    return g


def _eq(p, nodes, start, end):
    return p.nodes == nodes and p.start == start and p.end == end


def test_paths_overlap_detected():
    """GraphPathOperations.GraphPathsOverlapDetected
    (PathOperationsTest.cpp:282-319)."""
    p1 = LitePath([0, 1], 0, 3)
    p2 = LitePath([1, 3], 0, 3)
    assert check_prefix_suffix_overlap(p1, p2)
    assert check_prefix_suffix_overlap(p2, p1)
    assert _eq(merge_paths(p1, p2), [0, 1, 3], 0, 3)
    assert _eq(merge_paths(p2, p1), [0, 1, 3], 0, 3)

    p1 = LitePath([0, 1, 3], 2, 2)
    p2 = LitePath([1, 3], 0, 3)
    assert check_prefix_suffix_overlap(p1, p2)
    assert check_prefix_suffix_overlap(p2, p1)
    assert _eq(merge_paths(p1, p2), [0, 1, 3], 2, 3)
    assert _eq(merge_paths(p2, p1), [0, 1, 3], 2, 3)

    p1 = LitePath([0, 2], 2, 1)
    p2 = LitePath([2], 1, 3)
    assert check_prefix_suffix_overlap(p1, p2)
    assert check_prefix_suffix_overlap(p2, p1)
    assert _eq(merge_paths(p1, p2), [0, 2], 2, 3)
    assert _eq(merge_paths(p2, p1), [0, 2], 2, 3)


def test_paths_no_overlap_detected():
    """GraphPathOperations.GraphPathsNoOverlapDetected
    (PathOperationsTest.cpp:377-414)."""
    # p1 ends before p2 begins on the shared node
    p1 = LitePath([0, 1], 0, 1)
    p2 = LitePath([1, 3], 2, 3)
    assert not check_prefix_suffix_overlap(p1, p2)
    assert not check_prefix_suffix_overlap(p2, p1)

    # no shared nodes
    p1 = LitePath([0], 0, 3)
    p2 = LitePath([1, 3], 2, 3)
    assert not check_prefix_suffix_overlap(p1, p2)
    assert not check_prefix_suffix_overlap(p2, p1)

    # incompatible branches
    p1 = LitePath([0, 1, 3], 0, 3)
    p2 = LitePath([0, 2, 3], 2, 3)
    assert not check_prefix_suffix_overlap(p1, p2)
    assert not check_prefix_suffix_overlap(p2, p1)

    p1 = LitePath([0, 1], 0, 3)
    p2 = LitePath([2, 3], 2, 3)
    assert not check_prefix_suffix_overlap(p1, p2)
    assert not check_prefix_suffix_overlap(p2, p1)


def test_paths_adjacency_detected():
    """GraphPathOperations.GraphPathsAdjacencyDetected
    (PathOperationsTest.cpp:321-375)."""
    g = _double_swap_graph()

    # p1 ends just before p2 begins (same node)
    p1 = LitePath([0, 1], 0, 1)
    p2 = LitePath([1, 3], 2, 3)
    assert check_paths_adjacent(g, p1, p2)
    assert check_paths_adjacent(g, p2, p1)
    assert _eq(merge_paths(p1, p2), [0, 1, 3], 0, 3)
    assert _eq(merge_paths(p2, p1), [0, 1, 3], 0, 3)

    # gap on the shared node
    p1 = LitePath([0, 1], 0, 0)
    p2 = LitePath([1, 3], 2, 3)
    assert not check_paths_adjacent(g, p1, p2)
    assert not check_paths_adjacent(g, p2, p1)

    # p1 ends at the end of node 1, p2 starts at the start of node 3
    p1 = LitePath([0, 1], 0, 3)
    p2 = LitePath([3], 0, 3)
    assert check_paths_adjacent(g, p1, p2)
    assert check_paths_adjacent(g, p2, p1)
    assert _eq(merge_paths(p1, p2), [0, 1, 3], 0, 3)
    assert _eq(merge_paths(p2, p1), [0, 1, 3], 0, 3)

    # p1 stops short of the node boundary
    p1 = LitePath([0, 1], 0, 2)
    p2 = LitePath([3], 0, 3)
    assert not check_paths_adjacent(g, p1, p2)
    assert not check_paths_adjacent(g, p2, p1)

    # nodes not connected by an edge
    p1 = LitePath([0, 1], 0, 2)
    p2 = LitePath([4], 0, 3)
    assert not check_paths_adjacent(g, p1, p2)
    assert not check_paths_adjacent(g, p2, p1)
