"""Differential test: our GraphSW vs the original gssw C library.

Random DAGs + random reads (with mutations/indels) are aligned by both
engines; score, start position, per-node end cells and the full node-CIGAR
must agree exactly.
"""
import random

import pytest

from paragraph_tpu.graph.model import SequenceGraph
from paragraph_tpu.align.gssw import GraphSW

from gssw_oracle import GsswRef


@pytest.fixture(scope="module")
def ref_lib():
    try:
        return GsswRef()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"could not build reference gssw: {e}")


def _random_graph(rng, max_nodes=6, max_len=40):
    n = rng.randint(2, max_nodes)
    seqs = ["".join(rng.choice("ACGT") for _ in range(rng.randint(1, max_len)))
            for _ in range(n)]
    edges = []
    for t in range(1, n):
        preds = rng.sample(range(t), rng.randint(1, min(t, 3)))
        for f in sorted(preds):
            edges.append((f, t))
    return seqs, edges


def _read_from_graph(rng, seqs, edges, read_len=30, mutate=0.05, indel=0.02):
    # walk a random path, concatenate, take a window, add noise
    succ = {}
    for f, t in edges:
        succ.setdefault(f, []).append(t)
    node = 0
    out = seqs[0]
    while node in succ and len(out) < read_len * 3:
        node = rng.choice(succ[node])
        out += seqs[node]
    if len(out) <= read_len:
        start = 0
    else:
        start = rng.randint(0, len(out) - read_len)
    read = list(out[start:start + read_len])
    i = 0
    while i < len(read):
        r = rng.random()
        if r < mutate:
            read[i] = rng.choice("ACGT")
        elif r < mutate + indel:
            if rng.random() < 0.5:
                read.insert(i, rng.choice("ACGT"))
                i += 1
            else:
                del read[i]
                continue
        i += 1
    return "".join(read)


def _run_case(ref_lib, seqs, edges, read):
    g = SequenceGraph([f"n{i}" for i in range(len(seqs))], seqs)
    for f, t in edges:
        g.add_edge(f, t)
    mine = GraphSW(g)
    fills, max_node, max_score = mine.fill(read)
    gm = mine.trace_back(fills, max_node, read)

    score, position, node_cigars, ref_max_node, per_node = ref_lib.align(
        seqs, edges, read)

    assert max_score == score, (seqs, edges, read)
    assert max_node == ref_max_node, (seqs, edges, read)
    for nid, (s1, re1, rd1) in enumerate(per_node):
        f = fills[nid]
        assert f.score1 == s1, (nid, seqs, edges, read)
        assert f.ref_end1 == re1, (nid, f.ref_end1, re1, seqs, edges, read)
        assert f.read_end1 == rd1, (nid, f.read_end1, rd1, seqs, edges, read)
    assert gm.score == score
    assert gm.position == position, (gm.position, position, seqs, edges, read)
    ours = [(nid, "".join(f"{l}{t}" for l, t in cig))
            for nid, cig in zip(gm.node_ids, gm.node_cigars)]
    assert ours == node_cigars, (ours, node_cigars, seqs, edges, read)


def test_simple_exact_match(ref_lib):
    _run_case(ref_lib, ["AAAATTTT", "CCCC", "GGGGAAAA"],
              [(0, 1), (0, 2), (1, 2)], "TTTTCCCCGGGG")


def test_single_node(ref_lib):
    _run_case(ref_lib, ["ACGTACGTACGT", "TTTT"], [(0, 1)], "GTACGT")


def test_mismatch_and_gap(ref_lib):
    _run_case(ref_lib, ["ACGTAACCGGTT", "GATTACA"], [(0, 1)],
              "AACCGGTTGATCA")


def test_random_cases(ref_lib):
    rng = random.Random(1234)
    for case in range(300):
        seqs, edges = _random_graph(rng)
        read = _read_from_graph(rng, seqs, edges,
                                read_len=rng.randint(10, 60))
        if not read:
            continue
        _run_case(ref_lib, seqs, edges, read)


def test_random_with_n_bases(ref_lib):
    rng = random.Random(777)
    for case in range(100):
        seqs, edges = _random_graph(rng, max_nodes=5, max_len=20)
        # sprinkle N into graph and read
        seqs = [
            "".join(c if rng.random() > 0.05 else "N" for c in s)
            for s in seqs
        ]
        read = _read_from_graph(rng, seqs, edges, read_len=rng.randint(8, 40))
        read = "".join(c if rng.random() > 0.05 else "N" for c in read)
        if not read:
            continue
        _run_case(ref_lib, seqs, edges, read)


def test_random_long_reads(ref_lib):
    # realistic scale: 150bp reads over flank-sized nodes
    rng = random.Random(4242)
    for case in range(30):
        seqs, edges = _random_graph(rng, max_nodes=5, max_len=160)
        read = _read_from_graph(rng, seqs, edges, read_len=150)
        if not read:
            continue
        _run_case(ref_lib, seqs, edges, read)


def test_random_short_nodes(ref_lib):
    # single-base nodes stress cross-node traceback
    rng = random.Random(99)
    for case in range(200):
        seqs, edges = _random_graph(rng, max_nodes=8, max_len=4)
        read = _read_from_graph(rng, seqs, edges,
                                read_len=rng.randint(5, 25),
                                mutate=0.1, indel=0.05)
        if not read:
            continue
        _run_case(ref_lib, seqs, edges, read)


def test_degenerate_base_expansion(ref_lib):
    """IUPAC nodes: our expand-and-score engine must be cell-exact with
    the reference gssw run over the same expanded node set that
    grm::GraphAligner would build (GraphAligner.cpp:125-133 +
    SequenceOperations.cpp:155-190 enumeration order)."""
    from paragraph_tpu.graph.expand import expand_graph, expand_sequence

    # enumeration-order contract (reference per-symbol copy scheme)
    assert expand_sequence("R") == ["A", "G"]
    assert expand_sequence("RY") == ["AC", "GC", "AT", "GT"]
    assert expand_sequence("B") == ["C", "G", "T"]
    assert expand_sequence("ACGT") == ["ACGT"]

    rng = random.Random(4242)
    degenerate = "RYKMSWN"
    for case in range(60):
        seqs, edges = _random_graph(rng, max_nodes=5, max_len=12)
        # sprinkle degenerate symbols into INTERIOR nodes only (the
        # aligner takes source/sink verbatim); keep the blow-up small
        seqs = [
            s if i in (0, len(seqs) - 1) else
            "".join(c if rng.random() > 0.15 else rng.choice(degenerate)
                    for c in s)
            for i, s in enumerate(seqs)
        ]
        read = _read_from_graph(rng, [
            "".join(rng.choice("ACGT") if c in degenerate else c
                    for c in s) for s in seqs], edges,
            read_len=rng.randint(8, 30))
        if not read:
            continue

        g = SequenceGraph([f"n{i}" for i in range(len(seqs))], seqs)
        for f, t in edges:
            g.add_edge(f, t)
        eg, node_map = expand_graph(g)

        mine = GraphSW(g, expand_degenerate=True)
        fills, max_node, max_score = mine.fill(read)
        gm = mine.trace_back(fills, max_node, read)

        exp_edges = eg.edges()
        score, position, node_cigars, ref_max_node, per_node = \
            ref_lib.align(eg.node_seqs, exp_edges, read)

        assert max_score == score, (seqs, edges, read)
        assert max_node == ref_max_node, (seqs, edges, read)
        for nid, (s1, re1, rd1) in enumerate(per_node):
            f = fills[nid]
            assert (f.score1, f.ref_end1, f.read_end1) == (s1, re1, rd1), (
                nid, seqs, edges, read)
        assert gm.score == score
        assert gm.position == position
        # our node-CIGAR reports ORIGINAL node ids: the reference's
        # expanded ids must map back to exactly that path
        ref_path = [(node_map[nid], cig) for nid, cig in node_cigars]
        ours = [(nid, "".join(f"{l}{t}" for l, t in cig))
                for nid, cig in zip(gm.node_ids, gm.node_cigars)]
        assert ours == ref_path, (ours, ref_path, seqs, edges, read)
