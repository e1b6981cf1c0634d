"""Ported graph-tools test expectations for GraphReferenceMapping
(tests/GraphReferenceMappingTest.cpp), IntervalBuffer
(tests/IntervalBufferTest.cpp), and GraphJson (tests/GraphJsonTest.cpp
round-trip behaviour)."""
import random

from paragraph_tpu.graph.graph_json import (graph_to_json, load_graph,
                                            parse_graph)
from paragraph_tpu.graph.intervals import IntervalBuffer
from paragraph_tpu.graph.model import SequenceGraph
from paragraph_tpu.graph.refmapping import (GraphReferenceMapping,
                                            ReferenceInterval,
                                            ReferencePosition)
from paragraph_tpu.pipeline.haplotypes import LitePath


def make_swap_graph(left, del_seq, ins_seq, right):
    """graph-tools GraphBuilders makeSwapGraph: LF -> {DEL|INS} -> RF."""
    g = SequenceGraph(["LF", "DEL", "INS", "RF"],
                      [left, del_seq, ins_seq, right])
    g.add_edge(0, 1)
    g.add_edge(0, 2)
    g.add_edge(1, 3)
    g.add_edge(2, 3)
    return g


def test_mapping_maps_node_coordinates():
    # GraphReferenceMappingTest.cpp::Mapping_MapsNodeCoordinates
    swap = make_swap_graph("AAAA", "C", "T", "GGGG")
    mapping = GraphReferenceMapping(swap)
    mapping.add_mapping(LitePath([0, 1, 3], 0, 3), "chr1", 10)
    mapping.add_mapping(LitePath([0, 2, 3], 0, 3), "chr2", 20)

    assert mapping.map_position(0, 1) == {
        ReferencePosition("chr1", 11), ReferencePosition("chr2", 21)}
    assert mapping.map_position(3, 2) == {
        ReferencePosition("chr1", 17), ReferencePosition("chr2", 27)}
    assert mapping.map_position(1, 0) == {ReferencePosition("chr1", 14)}
    assert mapping.map_position(2, 0) == {ReferencePosition("chr2", 24)}


def test_mapping_maps_paths():
    # GraphReferenceMappingTest.cpp::Mapping_MapsPaths
    swap = make_swap_graph("AAAA", "CA", "TC", "GGGG")
    mapping = GraphReferenceMapping(swap)
    mapping.add_mapping(LitePath([0, 1, 3], 0, 3), "chr1", 10)
    mapping.add_mapping(LitePath([0, 2, 3], 0, 3), "chr2", 20)

    query = LitePath([0, 1, 3], 2, 1)
    got = mapping.map_path(query)
    expect = {
        (LitePath([0, 1, 3], 2, 1).encode(swap),
         ReferenceInterval("chr1", 12, 17)),
        (LitePath([0], 2, 3).encode(swap),
         ReferenceInterval("chr2", 22, 23)),
        (LitePath([3], 0, 1).encode(swap),
         ReferenceInterval("chr2", 26, 27)),
    }
    assert got == expect


def test_interval_buffer():
    # IntervalBufferTest.cpp::TestIntervalBuffer
    ib = IntervalBuffer()
    ib.add_interval(10, 20, 0)
    ib.add_interval(12, 30, 0)
    ib.add_interval(10, 30, 1)
    ib.add_interval(32, 35, 1)
    ib.add_interval(36, 37, 1)
    ib.add_interval(38, 40, 1)
    ib.add_interval(42, 45, 1)

    assert ib.is_covered(15, 16, 0)
    assert ib.is_covered(15, 21, 0)
    assert ib.is_covered(11, 21, 0)
    assert not ib.is_covered(11, 31, 0)
    assert not ib.is_covered(8, 15, 0)
    assert not ib.is_covered(8, 9, 0)

    assert ib.is_covered(15, 16, 1)
    assert ib.is_covered(32, 39, 1)
    assert not ib.is_covered(32, 43, 1)

    ib.advance(30)
    assert not ib.is_covered(10, 11, 0)
    assert not ib.is_covered(15, 16, 0)
    assert not ib.is_covered(15, 21, 0)
    assert not ib.is_covered(11, 21, 0)
    assert ib.is_covered(30, 30, 0)
    assert not ib.is_covered(8, 15, 0)
    assert not ib.is_covered(8, 9, 0)

    assert not ib.is_covered(15, 16, 1)
    assert ib.is_covered(32, 39, 1)
    assert not ib.is_covered(32, 43, 1)


def test_interval_buffer_random():
    # IntervalBufferTest.cpp::TestIntervalBufferRandom (scaled down):
    # coverage/overlap queries agree with a dense boolean oracle
    rng = random.Random(1234)
    count, icount = 512, 20
    for _ in range(25):
        dense = [False] * count
        ivlist = []
        for _ in range(icount):
            start = rng.randrange(count)
            end = min(start + rng.randrange(100), count - 1)
            ivlist.append((start, end))
            for j in range(start, end + 1):
                dense[j] = True
        ivlist.sort()
        ib = IntervalBuffer()
        for s, e in ivlist:
            ib.add_interval(s, e, 2)
        for _ in range(count):
            start = rng.randrange(count)
            end = min(start + rng.randrange(50), count - 1)
            want_cov = all(dense[j] for j in range(start, end + 1))
            want_ovl = any(dense[j] for j in range(start, end + 1))
            assert ib.is_covered(start, end, 2) == want_cov, (start, end)
            assert ib.has_overlap(start, end, 2) == want_ovl, (start, end)


def test_graph_json_roundtrip(tmp_path):
    swap = make_swap_graph("AAAA", "C", "T", "GGGG")
    swap.add_label_to_edge(0, 1, "REF")
    swap.add_label_to_edge(0, 2, "ALT")
    desc = graph_to_json(swap)
    assert [n["name"] for n in desc["nodes"]] == ["LF", "DEL", "INS", "RF"]
    assert {"from": "LF", "to": "DEL", "labels": ["REF"]} in desc["edges"]

    back = parse_graph(desc)
    assert back.num_nodes == swap.num_nodes
    assert sorted(back.edges()) == sorted(swap.edges())
    assert back.edge_labels(0, 2) == {"ALT"}

    path = tmp_path / "g.json"
    path.write_text(__import__("json").dumps({"graph": desc}))
    loaded = load_graph(str(path))
    assert loaded.node_seq(3) == "GGGG"
    assert sorted(loaded.edges()) == sorted(swap.edges())
