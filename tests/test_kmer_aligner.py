"""Port of the reference's test_kmeraligner.cpp expectations (gapless
positional-kmer alignment over the P/Q/D swap-or-delete fixture,
KmerAligner<10>)."""
from paragraph_tpu.align.kmer_aligner import KmerAligner
from paragraph_tpu.graph.model import SequenceGraph
from paragraph_tpu.reads.disambig import disambiguate_reads
from paragraph_tpu.reads.read import Read, MAPPED, UNMAPPED, BAD_ALIGN


def _fixture():
    reads = [
        Read(fragment_id="f1", bases="AAAAAAAATTTTTTTTAAAAAAAA",
             quals="#" * 24),
        Read(fragment_id="f2", bases="TTTTTTAAAAAAAATTTTTTT",
             quals="#" * 21),
        Read(fragment_id="f3", bases="AAAAAGGGGGGGGAAAAAA", quals="#" * 19),
        Read(fragment_id="f4", bases="AAAAGGGGGGGGAAAAAA", quals="#" * 18),
        Read(fragment_id="f5", bases="TTTTTTCCCCCCCCTTTTT", quals="#" * 19),
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

    aligner = KmerAligner(10)
    aligner.set_graph(g, [[0, 1, 3], [0, 2, 3], [0, 3]])
    for read in reads:
        read.graph_mapping_status = UNMAPPED
        aligner.align_read(read)
    disambiguate_reads(g, reads, use_node_filter=False,
                       use_edge_filter=False)
    return reads


EXPECTED = [
    ("f1", "AAAAAAAATTTTTTTTAAAAAAAA", 3, "0[8M]1[8M]3[8M]", 24, False,
     ["LF", "P1", "RF"], ["LF_P1", "P1_RF"], ["P"]),
    ("f2", "AAAAAAATTTTTTTTAAAAAA", 4, "0[7M]1[8M]3[6M]", 21, True,
     ["LF", "P1", "RF"], ["LF_P1", "P1_RF"], ["P"]),
    ("f3", "AAAAAGGGGGGGGAAAAAA", 6, "0[5M]2[8M]3[6M]", 19, False,
     ["LF", "Q1", "RF"], ["LF_Q1", "Q1_RF"], ["Q"]),
    ("f4", "AAAAGGGGGGGGAAAAAA", 7, "0[4M]2[8M]3[6M]", 18, False,
     ["LF", "Q1", "RF"], ["LF_Q1", "Q1_RF"], ["Q"]),
    ("f5", "AAAAAGGGGGGGGAAAAAA", 6, "0[5M]2[8M]3[6M]", 19, True,
     ["LF", "Q1", "RF"], ["LF_Q1", "Q1_RF"], ["Q"]),
]


def test_kmer_aligner_aligns():
    """KmerAlignerTest.Aligns (test_kmeraligner.cpp:149-194)."""
    reads = _fixture()
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

    # the homopolymer read can slide between placements: BAD_ALIGN,
    # non-unique, mapq 0 (test_kmeraligner.cpp:180)
    f6 = reads[5]
    assert f6.graph_mapping_status == BAD_ALIGN
    assert f6.graph_cigar == "0[11M]3[8M]"
    assert f6.graph_alignment_score == 19
    assert not f6.is_graph_alignment_unique
    assert f6.graph_mapq == 0
