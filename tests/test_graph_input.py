"""Port of the reference's test_graph_input.cpp on the bundled
share/test-data/basic fixtures (graphFromJson loading + error cases)."""
import json

import pytest

from paragraph_tpu.graph.model import SequenceGraph

BASE = "/root/reference/share/test-data/basic/"
REF = BASE + "dummy.fa"


def _load(name):
    return SequenceGraph.from_json(
        json.load(open(BASE + name + ".json")), REF)


def test_loads_graph_with_edges_and_nodes():
    g = _load("del-with-edges-nodes")
    assert g.num_nodes == 5
    assert len(g.edges()) == 5
    for n in range(g.num_nodes):
        assert len(g.node_seq(n)) > 0


def test_loads_graph_with_nodes_only():
    g = _load("del-with-nodes-only")
    assert g.num_nodes == 3
    assert len(g.edges()) == 0


def test_loads_graph_with_multi_node():
    """reference-node arrays expand into retrieved sequence."""
    g = _load("del-with-ref-node-array")
    assert g.num_nodes == 4
    assert len(g.edges()) == 0
    for n in range(g.num_nodes):
        assert len(g.node_seq(n)) > 0


@pytest.mark.parametrize("name", [
    "del-with-no-ref-or-seq-node-key",
    "del-with-edges-only",
    "del-with-bad-edges-value",
    "del-with-bad-node-seq-ids",
    "del-with-duplicate-node-names",
])
def test_malformed_graphs_raise(name):
    with pytest.raises(Exception):
        _load(name)
