"""Port of the reference's AddVariantsUnitTests
(src/python/test/test_variants.py:68-224): node splitting and alt-branch
insertion for SNVs / insertions / deletions on ref and alt nodes."""
import pytest

from paragraph_tpu.cli.tools import add_variants
from paragraph_tpu.graph.build import remove_empty_nodes
from paragraph_tpu.graph.model import GraphContainer


def _names(graph):
    return sorted(n["name"] for n in graph.nodes.values())


def test_ref_snv():
    g = GraphContainer()
    n = g.add_ref_node("chr", 10, 20)
    add_variants(g, {n["name"]: [{"start": 2, "end": 2, "alt": "C"}]})
    assert _names(g) == sorted(["ref-chr:10-11", "ref-chr:12-12",
                                "ref-chr:13-20", "chr:12-12:C"])
    assert g.nodes["chr:12-12:C"]["sequence"] == "C"
    left = g.nodes["ref-chr:10-11"]
    right = g.nodes["ref-chr:13-20"]
    alt = g.nodes["chr:12-12:C"]
    ref = g.nodes["ref-chr:12-12"]
    assert g.has_edge(left, ref)
    assert g.has_edge(left, alt)
    assert g.has_edge(ref, right)
    assert g.has_edge(alt, right)
    assert not g.has_edge(left, right)
    assert not g.has_edge(ref, alt)


def test_alt_snv():
    g = GraphContainer()
    n = g.add_alt_node("chr", 10, 20, "ATCGATCG")
    add_variants(g, {n["name"]: [{"start": 2, "end": 2, "alt": "T"}]})
    assert _names(g) == sorted(["chr:10-11:AT", "chr:12-12:C",
                                "chr:13-20:GATCG", "chr:12-12:T"])
    assert g.nodes["chr:10-11:AT"]["sequence"] == "AT"
    assert g.nodes["chr:13-20:GATCG"]["sequence"] == "GATCG"
    assert g.nodes["chr:12-12:C"]["sequence"] == "C"
    assert g.nodes["chr:12-12:T"]["sequence"] == "T"


def test_insertion():
    g = GraphContainer()
    n = g.add_alt_node("chr", 10, 17, "ATCGATCG")
    add_variants(g, {n["name"]: [{"start": 3, "end": 2, "alt": "TTT"}]})
    assert _names(g) == sorted(["chr:10-12:ATC", "chr:13-17:GATCG",
                                "chr:13-12:TTT"])
    left = g.nodes["chr:10-12:ATC"]
    right = g.nodes["chr:13-17:GATCG"]
    ins = g.nodes["chr:13-12:TTT"]
    assert g.has_edge(left, right)
    assert g.has_edge(left, ins)
    assert g.has_edge(ins, right)
    assert not g.has_edge(ins, left)
    assert not g.has_edge(right, ins)


def test_deletion():
    g = GraphContainer()
    n = g.add_alt_node("chr", 10, 17, "ATCGATCG")
    add_variants(g, {n["name"]: [{"start": 2, "end": 4, "alt": ""}]})
    remove_empty_nodes(g)
    assert _names(g) == sorted(["chr:10-11:AT", "chr:12-14:CGA",
                                "chr:15-17:TCG"])
    left = g.nodes["chr:10-11:AT"]
    right = g.nodes["chr:15-17:TCG"]
    mid = g.nodes["chr:12-14:CGA"]
    assert g.has_edge(left, right)
    assert g.has_edge(left, mid)
    assert g.has_edge(mid, right)
    assert not g.has_edge(mid, left)
    assert not g.has_edge(right, mid)


def test_var_begin():
    g = GraphContainer()
    r = g.add_ref_node("chr", 1, 9)
    n = g.add_alt_node("chr", 10, 17, "ATCGATCG")
    g.add_edge(r, n, ["foo"])
    add_variants(g, {n["name"]: [{"start": 0, "end": 0, "alt": "G"}]})
    remove_empty_nodes(g)
    left = g.nodes["ref-chr:1-9"]
    right = g.nodes["chr:11-17:TCGATCG"]
    ref = g.nodes["chr:10-10:A"]
    alt = g.nodes["chr:10-10:G"]
    assert len(g.nodes) == 4
    assert g.has_edge(left, ref)
    assert g.has_edge(left, alt)
    assert g.has_edge(ref, right)
    assert g.has_edge(alt, right)
    assert not g.has_edge(left, right)
    assert not g.has_edge(ref, alt)
    assert sorted(g.get_edge(left["name"], ref["name"])["sequences"]) == \
        ["foo"]
    assert sorted(g.get_edge(left["name"], alt["name"])["sequences"]) == \
        ["foo"]


def test_var_end():
    g = GraphContainer()
    r = g.add_ref_node("chr", 18, 20)
    n = g.add_alt_node("chr", 10, 17, "ATCGATCG")
    g.add_edge(n, r, ["foo"])
    add_variants(g, {n["name"]: [{"start": 7, "end": 7, "alt": "C"}]})
    remove_empty_nodes(g)
    left = g.nodes["chr:10-16:ATCGATC"]
    right = g.nodes["ref-chr:18-20"]
    ref = g.nodes["chr:17-17:G"]
    alt = g.nodes["chr:17-17:C"]
    assert len(g.nodes) == 4
    assert g.has_edge(left, ref)
    assert g.has_edge(left, alt)
    assert g.has_edge(ref, right)
    assert g.has_edge(alt, right)
    assert not g.has_edge(left, right)
    assert not g.has_edge(ref, alt)
    assert sorted(g.get_edge(ref["name"], right["name"])["sequences"]) == \
        ["foo"]
    assert sorted(g.get_edge(alt["name"], right["name"])["sequences"]) == \
        ["foo"]


def test_ins_end():
    g = GraphContainer()
    r = g.add_ref_node("chr", 18, 20)
    n = g.add_alt_node("chr", 10, 17, "ATCGATCG")
    g.add_edge(n, r, ["foo"])
    add_variants(g, {n["name"]: [{"start": 8, "end": 7, "alt": "CCC"}]})
    remove_empty_nodes(g)
    left = g.nodes["chr:10-17:ATCGATCG"]
    right = g.nodes["ref-chr:18-20"]
    alt = g.nodes["chr:18-17:CCC"]
    assert len(g.nodes) == 3
    assert g.has_edge(left, right)
    assert g.has_edge(left, alt)
    assert g.has_edge(alt, right)
    assert not g.has_edge(alt, left)
    assert not g.has_edge(right, alt)
    assert sorted(g.get_edge(left["name"], right["name"])["sequences"]) \
        == ["foo"]
    assert sorted(g.get_edge(alt["name"], right["name"])["sequences"]) == \
        ["foo"]


def test_overlapping_deletion():
    g = GraphContainer()
    n = g.add_alt_node("chr", 10, 17, "ATCGATCG")
    add_variants(g, {n["name"]: [
        {"start": 2, "end": 4, "alt": ""},
        {"start": 4, "end": 4, "alt": "C"},
    ]})
    remove_empty_nodes(g)
    assert _names(g) == sorted(["chr:10-11:AT", "chr:12-13:CG",
                                "chr:14-14:A", "chr:14-14:C",
                                "chr:15-17:TCG"])
    left = g.nodes["chr:10-11:AT"]
    right = g.nodes["chr:15-17:TCG"]
    alt = g.nodes["chr:14-14:C"]
    ref = g.nodes["chr:14-14:A"]
    mid = g.nodes["chr:12-13:CG"]
    assert g.has_edge(left, right)
    assert g.has_edge(left, mid)
    assert g.has_edge(mid, ref)
    assert g.has_edge(ref, right)
    assert g.has_edge(mid, alt)
    assert g.has_edge(alt, right)
    assert not g.has_edge(left, ref)
    assert not g.has_edge(left, alt)
    assert not g.has_edge(ref, mid)
