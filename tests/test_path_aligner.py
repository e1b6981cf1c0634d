"""Port of the reference's test_pathaligner.cpp expectations (exact kmer
path matching, both strands, MEM extension, ambiguous placements)."""
from paragraph_tpu.align.path_aligner import PathAligner
from paragraph_tpu.graph.model import SequenceGraph
from paragraph_tpu.reads.read import Read, MAPPED, UNMAPPED


def _deletion_graph(lf, mid, rf):
    g = SequenceGraph(["LF", "MID", "RF"], [lf, mid, rf])
    g.add_edge(0, 1)
    g.add_edge(1, 2)
    g.add_edge(0, 2)
    return g


def _align(aligner, bases):
    read = Read(fragment_id="f1", bases=bases, quals="#" * len(bases))
    read.graph_mapping_status = UNMAPPED
    aligner.align_read(read)
    return read


def test_aligns_exact_match():
    """PathAligner.Aligns_ExactMatch (test_pathaligner.cpp:37-90)."""
    g = _deletion_graph("AAAAAAAAA", "CCCC", "GGGGGGGGG")
    aligner = PathAligner(16)
    aligner.set_graph(g)

    r = _align(aligner, "AAAAAAAAGGGGGGGG")
    assert r.graph_mapping_status == MAPPED
    assert (r.graph_pos, r.graph_cigar, r.graph_alignment_score,
            r.is_graph_reverse_strand) == (1, "0[8M]2[8M]", 16, False)

    r = _align(aligner, "CCCCCCCCTTTTTTTT")
    assert r.graph_mapping_status == MAPPED
    assert (r.graph_pos, r.graph_cigar, r.graph_alignment_score,
            r.is_graph_reverse_strand) == (1, "0[8M]2[8M]", 16, True)

    r = _align(aligner, "AAAAAAAACCCCGGGG")
    assert r.graph_mapping_status == MAPPED
    assert (r.graph_pos, r.graph_cigar, r.graph_alignment_score,
            r.is_graph_reverse_strand) == (1, "0[8M]1[4M]2[4M]", 16, False)

    r = _align(aligner, "CCCCGGGGTTTTTTTT")
    assert r.graph_mapping_status == MAPPED
    assert (r.graph_pos, r.graph_cigar, r.graph_alignment_score,
            r.is_graph_reverse_strand) == (1, "0[8M]1[4M]2[4M]", 16, True)


def test_aligns_exact_match_long_mem():
    """PathAligner.Aligns_ExactMatchLongMEM
    (test_pathaligner.cpp:92-121)."""
    g = _deletion_graph("AAAAAAAAA", "CCCC", "GGGGGGGGG")
    aligner = PathAligner(16)
    aligner.set_graph(g)

    r = _align(aligner, "AAAAAAAAGGGGGGGGG")
    assert r.graph_mapping_status == MAPPED
    assert (r.graph_pos, r.graph_cigar, r.graph_alignment_score,
            r.is_graph_reverse_strand) == (1, "0[8M]2[9M]", 17, False)

    r = _align(aligner, "CCCCCCCCCTTTTTTTTT")
    assert r.graph_mapping_status == MAPPED
    assert (r.graph_pos, r.graph_cigar, r.graph_alignment_score,
            r.is_graph_reverse_strand) == (0, "0[9M]2[9M]", 18, True)


def test_aligns_multiple_matches():
    """PathAligner.Aligns_MultipleMatches
    (test_pathaligner.cpp:123-145): ambiguous placement → non-unique,
    MAPQ 0."""
    g = _deletion_graph("GGGGGGGGGGGG", "CCCCCCCCCCCCCCCC",
                        "GGGGGGGGGGGGGTGGG")
    aligner = PathAligner(16)
    aligner.set_graph(g)

    r = _align(aligner, "CCCCCCCCCCCCGGGGGGGGGGGG")
    assert r.graph_mapping_status == MAPPED
    assert (r.graph_pos, r.graph_cigar, r.graph_alignment_score,
            r.is_graph_reverse_strand) == (4, "1[12M]2[12M]", 24, False)
    assert not r.is_graph_alignment_unique
    assert r.graph_mapq == 0
