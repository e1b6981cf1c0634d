"""Port of the reference's test_paragraph_parts.cpp: the 4-node
swap-or-delete fixture, exact alignment fields (ParagraphTest.Aligns) and
exact per-node pileup tables (ParagraphTest.FindsVariants)."""
from paragraph_tpu.align.composite import align_reads
from paragraph_tpu.graph.model import SequenceGraph
from paragraph_tpu.pipeline.variants import _update_candidate_lists
from paragraph_tpu.reads.disambig import disambiguate_reads
from paragraph_tpu.reads.read import Read, MAPPED


def _fixture():
    reads = [
        Read(fragment_id="f1", bases="AAAAAAAATTTTCTTTAAAAAAAA",
             quals="#" * 24),
        Read(fragment_id="f2", bases="TTTTTTAAAGAAAATTTTTTT",
             quals="#" * 21),
        Read(fragment_id="f3", bases="AAAAAGCGGGGGGAAAAAA", quals="#" * 19),
        Read(fragment_id="f4", bases="AAAAGCGGGGGGAAAAAA", quals="#" * 18),
        Read(fragment_id="f5", bases="TTTTTTCCCCCCGCTTTTT", quals="#" * 19),
        Read(fragment_id="f6", bases="AAAAAAAAAAAAAAAAAAA", quals="#" * 19),
    ]
    g = SequenceGraph(["LF", "P1", "Q1", "RF"],
                      ["AAAAAAAAAAA", "TTTTTTTT", "GGGGGGGG",
                       "AAAAAAAAAAA"])
    for f, t in [(0, 1), (0, 2), (0, 3), (1, 3), (2, 3)]:
        g.add_edge(f, t)
    g.add_label_to_edge(0, 1, "P")
    g.add_label_to_edge(1, 3, "P")
    g.add_label_to_edge(0, 2, "Q")
    g.add_label_to_edge(2, 3, "Q")
    g.add_label_to_edge(0, 3, "D")
    align_reads(g, [], reads, None, False, True, False, False)
    disambiguate_reads(g, reads, use_node_filter=False,
                       use_edge_filter=False)
    return g, reads


EXPECTED = [
    # fragment, bases (after strand selection), graph_pos, cigar, score,
    # reverse, nodes, edges, sequences
    ("f1", "AAAAAAAATTTTCTTTAAAAAAAA", 3, "0[8M]1[4M1X3M]3[8M]", 19, False,
     ["LF", "P1", "RF"], ["LF_P1", "P1_RF"], ["P"]),
    ("f2", "AAAAAAATTTTCTTTAAAAAA", 4, "0[7M]1[4M1X3M]3[6M]", 16, True,
     ["LF", "P1", "RF"], ["LF_P1", "P1_RF"], ["P"]),
    ("f3", "AAAAAGCGGGGGGAAAAAA", 6, "0[5M]2[1M1X6M]3[6M]", 14, False,
     ["LF", "Q1", "RF"], ["LF_Q1", "Q1_RF"], ["Q"]),
    ("f4", "AAAAGCGGGGGGAAAAAA", 7, "0[4M]2[1M1X6M]3[6M]", 13, False,
     ["LF", "Q1", "RF"], ["LF_Q1", "Q1_RF"], ["Q"]),
    ("f5", "AAAAAGCGGGGGGAAAAAA", 6, "0[5M]2[1M1X6M]3[6M]", 14, True,
     ["LF", "Q1", "RF"], ["LF_Q1", "Q1_RF"], ["Q"]),
    ("f6", "AAAAAAAAAAAAAAAAAAA", 0, "0[11M]3[8M]", 19, False,
     ["LF", "RF"], ["LF_RF"], ["D"]),
]


def test_aligns():
    """ParagraphTest.Aligns (test_paragraph_parts.cpp:111-159)."""
    _, reads = _fixture()
    assert len(reads) == 6
    for read, (fid, bases, pos, cigar, score, rev, nodes, edges,
               seqs) in zip(reads, EXPECTED):
        assert read.fragment_id == fid
        assert read.bases == bases
        assert read.graph_mapping_status == MAPPED
        assert read.graph_pos == pos
        assert read.graph_cigar == cigar
        assert read.graph_mapq == 60
        assert read.graph_alignment_score == score
        assert read.is_graph_alignment_unique
        assert read.is_graph_reverse_strand == rev
        assert read.graph_nodes_supported == nodes
        assert read.graph_edges_supported == edges
        assert read.graph_sequences_supported == seqs


REF_FWD = [
    [1, 1, 1, 2, 2, 2, 3, 4, 4, 4, 4],
    [1, 1, 1, 1, 0, 1, 1, 1],
    [2, 0, 2, 2, 2, 2, 2, 2],
    [4, 4, 4, 4, 4, 4, 2, 2, 0, 0, 0],
]
REF_REV = [
    [0, 0, 0, 0, 1, 1, 2, 2, 2, 2, 2],
    [1, 1, 1, 1, 0, 1, 1, 1],
    [1, 0, 1, 1, 1, 1, 1, 1],
    [2, 2, 2, 2, 2, 2, 0, 0, 0, 0, 0],
]
NONREF_FWD = [
    [0] * 11,
    [0, 0, 0, 0, 1, 0, 0, 0],
    [0, 2, 0, 0, 0, 0, 0, 0],
    [0] * 11,
]
NONREF_REV = [
    [0] * 11,
    [0, 0, 0, 0, 1, 0, 0, 0],
    [0, 1, 0, 0, 0, 0, 0, 0],
    [0] * 11,
]
N_VARIANTS = [0, 1, 1, 0]


def test_finds_variants():
    """ParagraphTest.FindsVariants (test_paragraph_parts.cpp:161-418)."""
    g, reads = _fixture()
    candidates = {}
    for read in reads:
        _update_candidate_lists(g, read, candidates)
    assert len(candidates) == 4
    for node_id in range(4):
        vcl = candidates[node_id]
        assert len(vcl.get_variants()) == N_VARIANTS[node_id]
        for pos in range(len(vcl.reference)):
            assert vcl.reference_pileups[pos].stranded_DP[0] == \
                REF_FWD[node_id][pos], (node_id, pos)
            assert vcl.reference_pileups[pos].stranded_DP[1] == \
                REF_REV[node_id][pos], (node_id, pos)
            assert vcl.nonreference_pileups[pos].stranded_DP[0] == \
                NONREF_FWD[node_id][pos], (node_id, pos)
            assert vcl.nonreference_pileups[pos].stranded_DP[1] == \
                NONREF_REV[node_id][pos], (node_id, pos)
