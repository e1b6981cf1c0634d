"""Native C++ engine vs the exact Python oracle (and hence vs gssw)."""
import random

import pytest

from paragraph_tpu.align.gssw import GraphSW
from paragraph_tpu.align.native import NativeGraphSW, native_available
from paragraph_tpu.graph.model import SequenceGraph

from test_gssw_vs_reference import _random_graph, _read_from_graph


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native_available():
        pytest.skip("native library could not be built")


def _make_graph(seqs, edges):
    g = SequenceGraph([f"n{i}" for i in range(len(seqs))], seqs)
    for f, t in edges:
        g.add_edge(f, t)
    return g


def _check(g, reads):
    py = GraphSW(g)
    nat = NativeGraphSW(g)
    for read in reads:
        fills, max_node, max_score = py.fill(read)
        gm = py.trace_back(fills, max_node, read)
        multi = py.ends_at_multiple_nodes(fills, max_score)
        n_score, n_pos, n_multi, n_cigar = nat.align(read)
        assert n_score == max_score, read
        assert n_pos == gm.position, read
        assert n_multi == multi, read
        assert n_cigar == gm.cigar_string(), (read, n_cigar,
                                              gm.cigar_string())


def test_native_simple():
    g = _make_graph(["AAAATTTT", "CCCC", "GGGGAAAA"],
                    [(0, 1), (0, 2), (1, 2)])
    _check(g, ["TTTTCCCCGGGG", "AAAATTTTGGGG", "CCCCGGGG", "TTTT",
               "GGGGGGGG", "ACGT"])


def test_native_random():
    rng = random.Random(2024)
    for case in range(60):
        seqs, edges = _random_graph(rng, max_nodes=6, max_len=40)
        g = _make_graph(seqs, edges)
        reads = []
        for _ in range(5):
            r = _read_from_graph(rng, seqs, edges,
                                 read_len=rng.randint(10, 60),
                                 mutate=0.08, indel=0.04)
            if r:
                reads.append(r)
        if reads:
            _check(g, reads)


def _check_banded(g, reads):
    """align_at from the oracle's end cell must reproduce the full-width
    align() byte for byte (score, position, CIGAR)."""
    py = GraphSW(g)
    nat = NativeGraphSW(g)
    n_banded = 0
    for read in reads:
        fills, max_node, max_score = py.fill(read)
        if max_score <= 0:
            continue
        f = fills[max_node]
        want = nat.align(read)
        got = nat.align_at(read, max_node, f.ref_end1, f.read_end1,
                           max_score)
        assert got == (want[0], want[1], want[3]), (read, got, want)
        n_banded += 1
    return n_banded


def test_banded_simple():
    g = _make_graph(["AAAATTTT", "CCCC", "GGGGAAAA"],
                    [(0, 1), (0, 2), (1, 2)])
    _check_banded(g, ["TTTTCCCCGGGG", "AAAATTTTGGGG", "CCCCGGGG", "TTTT",
                      "GGGGGGGG", "ACGT"])


def test_banded_long_flanks():
    # node far longer than the band: the suffix fill must still match
    rng = random.Random(7)
    flank = "".join(rng.choice("ACGT") for _ in range(3000))
    mid = "".join(rng.choice("ACGT") for _ in range(40))
    g = _make_graph([flank, mid, flank[::-1]], [(0, 1), (0, 2), (1, 2)])
    reads = [flank[2950:] + mid[:20], flank[-30:] + flank[::-1][:40],
             mid + flank[::-1][:60], flank[100:180]]
    assert _check_banded(g, reads) >= 3


def test_banded_random():
    rng = random.Random(77)
    n_checked = 0
    for case in range(40):
        seqs, edges = _random_graph(rng, max_nodes=6, max_len=40)
        g = _make_graph(seqs, edges)
        reads = []
        for _ in range(6):
            r = _read_from_graph(rng, seqs, edges,
                                 read_len=rng.randint(10, 60),
                                 mutate=0.08, indel=0.04)
            if r:
                reads.append(r)
        if reads:
            n_checked += _check_banded(g, reads)
    assert n_checked > 100


def test_banded_rejects_wrong_score():
    # a wrong expected_score must not produce a bogus banded CIGAR: the
    # binding falls back to the exact full-width alignment
    g = _make_graph(["AAAATTTT", "CCCC", "GGGGAAAA"],
                    [(0, 1), (0, 2), (1, 2)])
    nat = NativeGraphSW(g)
    want = nat.align("TTTTCCCCGGGG")
    got = nat.align_at("TTTTCCCCGGGG", 2, 3, 11, 9999)
    assert got == (want[0], want[1], want[3])


def test_pinned_traceback_matches_full_when_max_at_pin():
    """align_pinned (gssw_graph_trace_back_pinned, gssw.h:487-494): when
    the global optimum ends on the pinned node's last base, the pinned
    traceback reproduces the ordinary one."""
    from paragraph_tpu.align.gssw import GraphSW
    from paragraph_tpu.graph.model import SequenceGraph

    g = SequenceGraph(["a", "b", "c"], ["ACGTAC", "GGAT", "TTCA"])
    g.add_edge(0, 1)
    g.add_edge(0, 2)
    g.add_edge(1, 2)
    sw = GraphSW(g)
    read = "TACGGATTTCA"  # ends exactly at node c's last base
    gm_full, _ = sw.align(read)
    gm_pin = sw.align_pinned(read, 2)
    assert gm_pin.score == gm_full.score
    assert gm_pin.node_ids == gm_full.node_ids
    assert gm_pin.node_cigars == gm_full.node_cigars

    # pinning on node b forces a different endpoint
    gm_b = sw.align_pinned("ACGTACGGAT", 1)
    assert gm_b.node_ids[-1] == 1
    assert gm_b.score == 10  # full-length match ending on b's last base

    # a pin with no positive-scoring alignment yields the empty mapping
    gm_zero = sw.align_pinned("GGGGGGGG", 1)
    assert gm_zero.score == 0


def test_pinned_multi_traceback_ordering_and_distinctness():
    """align_pinned_multi (gssw_graph_trace_back_pinned_multi,
    gssw.h:506-516): descending scores, all distinct, all ending with
    the read's last base on the pinned node's last base, and the top
    one agreeing with the single pinned traceback's score."""
    from paragraph_tpu.align.gssw import GraphSW
    from paragraph_tpu.graph.model import SequenceGraph

    g = SequenceGraph(["a", "b"], ["ACGTACGT", "GATTAC"])
    g.add_edge(0, 1)
    sw = GraphSW(g)
    read = "CGTGATTAC"
    outs = sw.align_pinned_multi(read, 1, 5)
    assert outs, "no pinned tracebacks found"
    scores = [o.score for o in outs]
    assert scores == sorted(scores, reverse=True)
    keys = {(tuple(o.node_ids),
             tuple(tuple(c) for c in o.node_cigars)) for o in outs}
    assert len(keys) == len(outs)
    for o in outs:
        assert o.node_ids[-1] == 1
        # last op consumes the node's final base and the read's final
        # base: by construction a match/mismatch, never a clip
        assert o.node_cigars[-1][-1][1] in "MX"
    best = sw.align_pinned(read, 1)
    assert outs[0].score == best.score


def test_align_at_batch_decoded_matches_cigar_parse():
    """The integer ops rows from the native batch traceback must decode
    to exactly what re-parsing the CIGAR text produces."""
    import numpy as np

    from paragraph_tpu.align.alignment import decode_graph_alignment
    from paragraph_tpu.ops.batched_sw import BatchedGraphSW

    rng = random.Random(77)
    seqs, edges = _random_graph(rng, max_nodes=5, max_len=16)
    g = _make_graph(seqs, edges)
    sw = NativeGraphSW(g)
    reads = []
    for _ in range(12):
        r = _read_from_graph(rng, seqs, edges, read_len=rng.randint(8, 24))
        if r:
            reads.append(r)
    bs = BatchedGraphSW(g)
    score, en, er, erd, multi = bs.score(reads)
    sc, pos, cig, dec = sw.align_at_batch(
        reads, np.asarray(en), np.asarray(er), np.asarray(erd),
        np.asarray(score))
    for i, r in enumerate(reads):
        if dec[i] is None:
            continue
        want = decode_graph_alignment(pos[i], cig[i])
        got = dec[i]
        assert got.node_ids == want.node_ids
        assert got.path_start == want.path_start
        assert got.path_end == want.path_end
        for a, b in zip(got.alignments, want.alignments):
            assert a == b


def test_exact_trace_matches_full_traceback():
    """Perfect-score reads take the fill-free pure-diagonal traceback in
    gsw_align_at_batch; its CIGAR/position must equal the full
    fill+trace_back output (including predecessor tie-breaks)."""
    import numpy as np

    from paragraph_tpu.ops.batched_sw import BatchedGraphSW

    rng = random.Random(2025)
    for trial in range(20):
        seqs, edges = _random_graph(rng, max_nodes=6, max_len=14)
        g = _make_graph(seqs, edges)
        nat = NativeGraphSW(g)
        reads = []
        for _ in range(6):
            # mutate=0 keeps reads perfect so the exact-trace fast
            # path is actually exercised
            r = _read_from_graph(rng, seqs, edges,
                                 read_len=rng.randint(6, 30),
                                 mutate=0, indel=0)
            if r:
                reads.append(r.upper())
        if not reads:
            continue
        bs = BatchedGraphSW(g)
        score, en, er, erd, multi = bs.score(reads)
        sc, pos, cig, dec = nat.align_at_batch(
            reads, np.asarray(en), np.asarray(er), np.asarray(erd),
            np.asarray(score))
        for i, r in enumerate(reads):
            w_sc, w_pos, _m, w_cig = nat.align(r)
            assert sc[i] == w_sc, (trial, r)
            assert pos[i] == w_pos, (trial, r, cig[i], w_cig)
            assert cig[i] == w_cig, (trial, r, cig[i], w_cig)
