"""Port of graph-tools GraphCoordinatesTest (graph-tools tarball
tests/GraphCoordinatesTest.cpp) + PathFamilyTest expectations."""
from paragraph_tpu.graph.coordinates import GraphCoordinates
from paragraph_tpu.graph.model import SequenceGraph
from paragraph_tpu.reads.disambig import PathFamily


def _graph():
    g = SequenceGraph(["LF", "P1", "Q1", "RF"],
                      ["AAAAAAAAAAA", "TTTTTT", "GGGGGGGG", "AAAAAAAAAAA"])
    for f, t in [(0, 1), (0, 2), (1, 3), (2, 3)]:
        g.add_edge(f, t)
    return g


def test_canonical_position_lookup():
    coords = GraphCoordinates(_graph())
    assert coords.canonical_pos("LF", 6) == 6
    assert coords.canonical_pos("P1", 4) == 11 + 4
    assert coords.canonical_pos("Q1", 3) == 11 + 6 + 3
    assert coords.canonical_pos("RF", 2) == 11 + 6 + 8 + 2


def test_reverse_lookup():
    g = _graph()
    coords = GraphCoordinates(g)
    starts = [0, 11, 11 + 6, 11 + 6 + 8]
    for node_id, name in enumerate(["LF", "P1", "Q1", "RF"]):
        for j in range(len(g.node_seq(node_id))):
            n, offset = coords.node_and_offset(starts[node_id] + j)
            assert n == name
            assert offset == j


def test_distance_computation():
    coords = GraphCoordinates(_graph())
    # both on LF
    assert coords.distance(10, 5) == 5
    assert coords.distance(5, 10) == 5
    # one on LF, one on a neighbour (P1 / Q1)
    assert coords.distance(14, 6) == 8
    assert coords.distance(20, 6) == 8
    # LF -> RF goes via P1 (shorter branch)
    assert coords.distance(2, 11 + 6 + 8 + 4) == 9 + 6 + 4


def test_path_family_contains_path():
    """PathFamily semantics (doc/graph-counting.md §PathFamilies): a path
    is in the family iff it uses >=1 family edge and always enters/leaves
    family nodes through family edges."""
    g = _graph()
    g.add_label_to_edge(0, 1, "P")
    g.add_label_to_edge(1, 3, "P")
    fam = PathFamily(g, "P")
    assert fam.contains_path([0, 1, 3])
    assert fam.contains_path([0, 1])
    assert fam.contains_path([1, 3])
    assert not fam.contains_path([0, 2, 3])
    assert not fam.contains_path([2, 3])
    assert not fam.contains_path([0])
