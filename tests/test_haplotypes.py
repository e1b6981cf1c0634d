"""Phasing-evidence pipeline tests (HaplotypePaths.cpp behaviour): mate
paths merge into fragment paths, identical edge sets collapse into phase
families with fragment counts, and add_haplotype_paths emits the
phased-path-group output."""
from paragraph_tpu.graph.model import SequenceGraph
from paragraph_tpu.pipeline.haplotypes import (add_haplotype_paths,
                                               get_fragment_paths,
                                               get_phasing_families)
from paragraph_tpu.reads.read import Read, MAPPED


def _double_swap_graph():
    # LF -> (A1|B1) -> M -> (A2|B2) -> RF ; phased haplotypes A1+A2, B1+B2
    g = SequenceGraph(["LF", "A1", "B1", "M", "A2", "B2", "RF"],
                      ["AAAACCCC", "TTTT", "GGGG", "CCCCAAAA", "TTTT",
                       "GGGG", "AAAACCCC"])
    for f, t in [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (3, 5), (4, 6),
                 (5, 6)]:
        g.add_edge(f, t)
    return g


def _read(fragment_id, pos, cigar):
    r = Read(fragment_id=fragment_id, bases="A" * 10, quals="#" * 10)
    r.graph_pos = pos
    r.graph_cigar = cigar
    r.graph_mapping_status = MAPPED
    return r


def test_fragment_paths_merge_mates():
    g = _double_swap_graph()
    # mate 1 covers LF->A1->M[0..1], mate 2 covers M[0..]->A2->RF: the
    # mates overlap base-wise on M -> one merged fragment path
    reads = [
        _read("frag", 4, "0[4M]1[4M]3[2M]"),
        _read("frag", 0, "3[8M]4[4M]6[4M]"),
    ]
    paths = get_fragment_paths(g, reads)
    assert list(paths) == ["frag"]
    assert len(paths["frag"]) == 1
    assert paths["frag"][0].nodes == [0, 1, 3, 4, 6]

    # non-overlapping mates stay as two paths (greedyMerge only merges on
    # prefix-suffix base overlap)
    reads = [
        _read("frag", 4, "0[4M]1[4M]3[2M]"),
        _read("frag", 6, "3[2M]4[4M]6[4M]"),
    ]
    paths = get_fragment_paths(g, reads)
    assert len(paths["frag"]) == 2


def test_phasing_families_count_fragments():
    g = _double_swap_graph()
    reads = []
    # 3 fragments supporting the A haplotype, 2 supporting B
    for i in range(3):
        reads.append(_read(f"a{i}", 4, "0[4M]1[4M]3[2M]"))
        reads.append(_read(f"a{i}", 6, "3[2M]4[4M]6[4M]"))
    for i in range(2):
        reads.append(_read(f"b{i}", 4, "0[4M]2[4M]3[2M]"))
        reads.append(_read(f"b{i}", 6, "3[2M]5[4M]6[4M]"))
    fams = dict(get_phasing_families(g, reads))
    a_edges = ((0, 1), (1, 3), (3, 4), (4, 6))
    b_edges = ((0, 2), (2, 3), (3, 5), (5, 6))
    assert fams[a_edges] == 3
    assert fams[b_edges] == 2


def test_add_haplotype_paths_output():
    g = _double_swap_graph()
    reads = []
    for i in range(3):
        reads.append(_read(f"a{i}", 4, "0[4M]1[4M]3[2M]"))
        reads.append(_read(f"a{i}", 6, "3[2M]4[4M]6[4M]"))
    output = {}
    add_haplotype_paths(reads, g, [], output)
    assert "phasing" in output
    assert output["phasing"], "phase families must be reported"
    total = sum(p["count"] for p in output["phasing"] if "count" in p)
    assert total >= 3
