"""Gapped/pinned graph aligner (align/gapped.py) vs graph-tools
expectations (graph-tools tests/PinnedAlignerTest.cpp and
GappedAlignerTest.cpp; STR-loop cases adapted to DAG form — this
framework's graphs are DAGs like paragraph's)."""
from paragraph_tpu.align.gapped import (GappedGraphAligner, PinnedAligner,
                                        extend_path_end,
                                        extend_path_start, path_seq)
from paragraph_tpu.graph.model import SequenceGraph


def _ops_str(ops):
    return "".join(f"{l}{t}" for l, t in ops)


def test_pinned_prefix_align_reference_case():
    """PerformingPrefixAlignment (PinnedAlignerTest.cpp:53-66)."""
    aligner = PinnedAligner(1, -1, -2)
    ref_start, ops = aligner.prefix_align("TGCTTTTAA", "TAACTTTTGGG")
    assert ref_start == 0
    assert _ops_str(ops) == "1M1I1X5M3S"


def test_pinned_suffix_align_reference_case():
    """SuffixAlignment (PinnedAlignerTest.cpp:68-83)."""
    aligner = PinnedAligner(5, -4, -8)
    ref_start, ops = aligner.suffix_align("TACGAGAG", "TCACGGAGA")
    assert ref_start == 1
    assert _ops_str(ops) == "2S3M1D3M1I"


def _branch_graph():
    """LF - (DEL | INS) - RF deletion-style DAG."""
    g = SequenceGraph(["LF", "DEL", "INS", "RF"],
                      ["ATATTA", "CGCG", "TTTT", "TATTTGGAACC"])
    for f, t in [(0, 1), (0, 2), (1, 3), (2, 3), (0, 3)]:
        g.add_edge(f, t)
    return g


def test_path_extension_enumerates_branches():
    g = _branch_graph()
    # from RF back by 5: through DEL (4) + LF(1), INS (4) + LF(1), or
    # LF alone (direct edge); RF is long enough that suffix extensions
    # in the gap test below stay alive
    exts = extend_path_start(g, ((3,), 0, 2), 5)
    seqs = sorted(path_seq(g, p) for p in exts)
    assert seqs == sorted(["ACGCGTAT", "ATTTTTAT", "TATTATAT"])
    exts = extend_path_end(g, ((0,), 0, 5), 2)
    assert sorted(path_seq(g, p)[-2:] for p in exts) == ["CG", "TA", "TT"]


def test_gapped_exact_match_across_nodes():
    g = _branch_graph()
    aligner = GappedGraphAligner(g, kmer_len=4, padding_len=2)
    # read along LF + DEL + RF exactly
    out = aligner.align("ATTACGCGTAT")
    assert len(out) == 1
    ga = out[0]
    assert ga.node_ids == [0, 1, 3]
    assert ga.generate_cigar() == "0[4M]1[4M]3[3M]"


def test_gapped_alignment_with_deletion_gap():
    g = _branch_graph()
    # affordable gaps (with the 5/-4/-8 defaults a 2-base deletion
    # scores below a soft-clip, and the reference would soft-clip too)
    aligner = GappedGraphAligner(g, kmer_len=4, padding_len=4,
                                 match=1, mismatch=-1, gap=-2)
    # LF + DEL + RF with two bases of DEL missing in the read;
    # the matched RF tail after the gap outweighs the gap cost
    out = aligner.align("ATTACGTATTT")
    assert len(out) >= 1
    best = out[0]
    cigar = best.generate_cigar()
    assert "D" in cigar, cigar
    assert best.node_ids[0] == 0 and best.node_ids[-1] == 3


def test_gapped_unalignable_ends_softclip():
    """KmerExtensionIsUnalignable (GappedAlignerTest.cpp:179-201):
    query tails with no extension support soft-clip."""
    g = SequenceGraph(["A", "B", "C"], ["AAG", "CGGT", "CTT"])
    g.add_edge(0, 1)
    g.add_edge(1, 2)
    aligner = GappedGraphAligner(g, kmer_len=4, padding_len=0)
    # CGGT seed; prefix TT matches nothing in AAG suffix-pinned region
    out = aligner.align("TTCGGT")
    assert len(out) == 1
    cigar = out[0].generate_cigar()
    assert cigar.startswith("1[2S") or "2S" in cigar, cigar

    out = aligner.align("CGGTAA")
    assert len(out) == 1
    assert out[0].generate_cigar().endswith("2S]"), out[0].generate_cigar()


def test_gapped_multimapping_returns_all_top_alignments():
    """MultimappingQuery (GappedAlignerTest.cpp:138-153) in DAG form:
    a seed that extends equally well down two branches keeps both."""
    g = SequenceGraph(["LF", "B1", "B2", "RF"],
                      ["ATCGA", "TT", "TT", "GGCAT"])
    for f, t in [(0, 1), (0, 2), (1, 3), (2, 3)]:
        g.add_edge(f, t)
    aligner = GappedGraphAligner(g, kmer_len=4, padding_len=0)
    out = aligner.align("TCGATTGGC")
    cigars = sorted((tuple(a.node_ids), a.generate_cigar()) for a in out)
    assert cigars == [((0, 1, 3), "0[4M]1[2M]3[3M]"),
                      ((0, 2, 3), "0[4M]2[2M]3[3M]")]
