"""Ported graph-tools PathFamilyOperationsTest.cpp expectations
(the DAG cases; loop-graph cases are out of scope — SequenceGraph is
DAG-only, see tests/test_gapless_aligner.py)."""
from paragraph_tpu.graph.model import SequenceGraph
from paragraph_tpu.graph.path_families import (
    family_contains_path, get_maximal_paths_for_family,
    get_path_families_from_graph, path_to_path_family)
from paragraph_tpu.pipeline.haplotypes import LitePath


def make_double_swap_graph(*seqs):
    g = SequenceGraph([f"n{i}" for i in range(7)], list(seqs))
    for f, t in [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (3, 5), (4, 6),
                 (5, 6)]:
        g.add_edge(f, t)
    return g


def paths_key(graph, paths):
    return [(p.start, tuple(p.nodes), p.end) for p in paths]


def test_disjoint_paths():
    g = make_double_swap_graph("AAA", "CCCC", "GGG", "AAAA", "TTTT", "GG",
                               "AA")
    edges = {(0, 1), (1, 3), (5, 6)}
    paths, complete = get_maximal_paths_for_family(g, edges)
    assert complete
    assert paths_key(g, paths) == [
        (0, (0, 1, 3), 3),
        (0, (5, 6), 1),
    ]
    for p in paths:
        assert family_contains_path(edges, p)


def test_long_path():
    g = make_double_swap_graph("AAA", "CCCC", "GGG", "AAAA", "TTTT", "GG",
                               "AA")
    edges = {(0, 1), (1, 3), (3, 4), (4, 6)}
    paths, complete = get_maximal_paths_for_family(g, edges)
    assert complete
    assert paths_key(g, paths) == [(0, (0, 1, 3, 4, 6), 1)]
    for p in paths:
        assert family_contains_path(edges, p)


def test_multiple_extensions():
    g = make_double_swap_graph("AAA", "CCCC", "GGG", "AAAA", "TTTT", "GG",
                               "AA")
    edges = {(1, 3), (2, 3), (3, 4), (3, 5), (4, 6), (5, 6)}
    paths, complete = get_maximal_paths_for_family(g, edges)
    assert complete
    assert paths_key(g, paths) == [
        (0, (1, 3, 4, 6), 1),
        (0, (1, 3, 5, 6), 1),
        (0, (2, 3, 4, 6), 1),
        (0, (2, 3, 5, 6), 1),
    ]
    for p in paths:
        assert family_contains_path(edges, p)


def test_multiple_extensions_single_edge():
    # the hourglass graph from PathFamilyOperationsTest.cpp:113-165
    g = SequenceGraph(
        ["source", "A", "B", "C", "D", "E", "F", "sink"],
        ["N", "A", "A", "A", "A", "A", "A", "N"])
    for f, t in [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (4, 5), (4, 6),
                 (5, 7), (6, 7)]:
        g.add_edge(f, t)
    edges = {(3, 4)}
    paths, complete = get_maximal_paths_for_family(g, edges)
    assert complete
    assert paths_key(g, paths) == [(0, (3, 4), 0)]


def test_families_from_graph_and_path():
    g = make_double_swap_graph("A", "C", "T", "A", "G", "C", "T")
    g.add_label_to_edge(0, 1, "DEL")
    g.add_label_to_edge(1, 3, "DEL")
    g.add_label_to_edge(0, 2, "INS")
    fams = get_path_families_from_graph(g)
    assert fams == {"DEL": {(0, 1), (1, 3)}, "INS": {(0, 2)}}

    fam = path_to_path_family(LitePath([1, 3, 4], 0, 0))
    assert fam == {(1, 3), (3, 4)}
