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


def _double_swap(*seqs):
    """makeDoubleSwapGraph (graph-tools GraphBuilders.cpp:68-90):
    flank - (del1|ins1) - middle - (del2|ins2) - flank."""
    from paragraph_tpu.graph.model import SequenceGraph

    g = SequenceGraph([f"n{i}" for i in range(7)], list(seqs))
    for f, t in [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (3, 5),
                 (4, 6), (5, 6)]:
        g.add_edge(f, t)
    return g


def test_exhaustive_merge_reference_case():
    """PathsMergedExhaustively (graph-tools PathOperationsTest.cpp:
    416-443): all four left/right extension combinations materialise."""
    from paragraph_tpu.pipeline.haplotypes import (LitePath,
                                                   exhaustive_merge)

    g = _double_swap("AAAA", "TTTT", "CCCC", "GGGG", "TTTT", "CCCC",
                     "AAAA")
    paths = [LitePath([1, 3], 0, 3), LitePath([2, 3], 0, 3),
             LitePath([3, 4], 0, 3), LitePath([3, 5], 0, 3)]
    exhaustive_merge(g, paths)
    got = sorted((p.nodes, p.start, p.end) for p in paths)
    assert got == sorted([([1, 3, 4], 0, 3), ([2, 3, 5], 0, 3),
                          ([2, 3, 4], 0, 3), ([1, 3, 5], 0, 3)])


def test_intersect_paths_reference_cases():
    """IntersectPaths_* (PathOperationsTest.cpp:445-540)."""
    from paragraph_tpu.pipeline.haplotypes import LitePath, intersect_paths

    g = _double_swap("AAAA", "TTTT", "CCCC", "GGGG", "TTTT", "CCCC",
                     "AAAA")

    def lp(nodes, s, e):
        return LitePath(nodes, s, e)

    def key(paths):
        return [(p.nodes, p.start, p.end) for p in paths]

    # no shared nodes
    assert intersect_paths(g, lp([1], 0, 3), lp([2], 0, 3)) == []
    # one shared node, but no shared sequence
    assert intersect_paths(g, lp([1, 3], 0, 1), lp([3, 4], 2, 3)) == []
    assert intersect_paths(g, lp([3, 4], 2, 3), lp([1, 3], 0, 1)) == []
    # full node shared
    assert key(intersect_paths(g, lp([1, 3, 5], 0, 3),
                               lp([2, 3, 4], 0, 3))) == [([3], 0, 3)]
    # partial node shared
    assert key(intersect_paths(g, lp([1, 3], 0, 2),
                               lp([3, 4], 1, 3))) == [([3], 1, 2)]
    assert key(intersect_paths(g, lp([3, 4], 1, 3),
                               lp([1, 3], 0, 2))) == [([3], 1, 2)]
    # multiple shared stretches -> two pieces
    assert key(intersect_paths(g, lp([1, 3, 5, 6], 0, 3),
                               lp([2, 3, 4, 6], 0, 3))) == [
        ([3], 0, 3), ([6], 0, 3)]
