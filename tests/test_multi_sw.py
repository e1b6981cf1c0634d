"""Multi-event kernel (interpret mode) vs the scalar oracle."""
import random

import pytest

from paragraph_tpu.align.gssw import GraphSW
from paragraph_tpu.graph.model import SequenceGraph
from paragraph_tpu.ops.multi_sw import MultiGraphSW

from test_gssw_vs_reference import _random_graph, _read_from_graph


def _make_graph(seqs, edges):
    g = SequenceGraph([f"n{i}" for i in range(len(seqs))], seqs)
    for f, t in edges:
        g.add_edge(f, t)
    return g


def test_multi_event_batch():
    rng = random.Random(808)
    graphs = []
    reads_per_event = []
    cases = []
    for _ in range(3):
        seqs, edges = _random_graph(rng, max_nodes=5, max_len=20)
        g = _make_graph(seqs, edges)
        reads = []
        for _ in range(3):
            r = _read_from_graph(rng, seqs, edges,
                                 read_len=rng.randint(8, 25))
            if r:
                reads.append(r)
        graphs.append(g)
        reads_per_event.append(reads)
        cases.append((g, reads))

    multi = MultiGraphSW(graphs, interpret=True)
    results = multi.score(reads_per_event)
    assert len(results) == 3
    for (g, reads), (score, end_node, end_ref, end_read, m_multi) in zip(
            cases, results):
        scalar = GraphSW(g)
        for i, read in enumerate(reads):
            fills, max_node, max_score = scalar.fill(read)
            s_multi = scalar.ends_at_multiple_nodes(fills, max_score)
            f = fills[max_node]
            assert score[i] == max_score, (read,)
            assert end_node[i] == max_node
            assert end_ref[i] == f.ref_end1
            assert end_read[i] == f.read_end1
            assert bool(m_multi[i]) == s_multi


def test_engine_report_accounting():
    """Per-dispatch observability: issued cells, device wait, and the
    derived throughput/utilization numbers must be populated and
    consistent (regression gate for the TPU number lives in bench.py)."""
    import numpy as np

    from paragraph_tpu.graph.model import SequenceGraph
    from paragraph_tpu.ops.multi_sw import PairedGraphSW

    rng = np.random.RandomState(3)
    seq = lambda n: "".join("ACGT"[i] for i in rng.randint(0, 4, n))
    g = SequenceGraph(["a", "b", "c"], [seq(60), seq(30), seq(60)])
    g.add_edge(0, 1)
    g.add_edge(0, 2)
    g.add_edge(1, 2)
    reads = [seq(40) for _ in range(5)]

    sw = PairedGraphSW([g], interpret=True)
    sw.score_pairs([reads])
    rep = sw.engine_report()
    assert rep["dispatches"] >= 1
    # at least the real work: 4 orientations x reads x cols x stripe len
    a = sw.chunk_arrays[0]
    real = 2 * len(reads) * (a.col_len[0] + a.col_len[1]) * 48
    assert rep["cells"] >= real
    assert rep["device_wait_s"] > 0
    assert rep["cells_per_wait_s"] > 0
    assert 0 <= rep["vpu_util_est"]
