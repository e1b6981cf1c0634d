"""Batched JAX graph-SW scorer vs the exact scalar oracle."""
import random

import numpy as np
import pytest

from paragraph_tpu.align.gssw import GraphSW
from paragraph_tpu.graph.model import SequenceGraph
from paragraph_tpu.ops.batched_sw import BatchedGraphSW

from test_gssw_vs_reference import _random_graph, _read_from_graph


def _make_graph(seqs, edges):
    g = SequenceGraph([f"n{i}" for i in range(len(seqs))], seqs)
    for f, t in edges:
        g.add_edge(f, t)
    return g


def _check_batch(g, reads):
    scalar = GraphSW(g)
    batched = BatchedGraphSW(g)
    score, end_node, end_ref, end_read, multi = batched.score(reads)
    for i, read in enumerate(reads):
        fills, max_node, max_score = scalar.fill(read)
        s_multi = scalar.ends_at_multiple_nodes(fills, max_score)
        f = fills[max_node]
        assert score[i] == max_score, (i, read)
        assert end_node[i] == max_node, (i, read, end_node[i], max_node)
        assert end_ref[i] == f.ref_end1, (i, read)
        assert end_read[i] == f.read_end1, (i, read)
        assert bool(multi[i]) == s_multi, (i, read)


def test_batched_simple():
    g = _make_graph(["AAAATTTT", "CCCC", "GGGGAAAA"],
                    [(0, 1), (0, 2), (1, 2)])
    reads = ["TTTTCCCCGGGG", "AAAATTTTGGGG", "CCCCGGGG", "TTTT",
             "GGGGGGGG", "ACGT"]
    _check_batch(g, reads)


def test_batched_random():
    rng = random.Random(555)
    for case in range(25):
        seqs, edges = _random_graph(rng, max_nodes=6, max_len=30)
        g = _make_graph(seqs, edges)
        reads = []
        for _ in range(8):
            r = _read_from_graph(rng, seqs, edges,
                                 read_len=rng.randint(8, 40))
            if r:
                reads.append(r)
        if reads:
            _check_batch(g, reads)


def test_batched_mixed_lengths():
    g = _make_graph(["ACGTACGTACGTACGTACGT", "TTTTCCCC", "GATTACAGATTACA"],
                    [(0, 1), (0, 2), (1, 2)])
    reads = ["ACGTACGT", "A" * 3, "ACGTACGTACGTACGTACGTTTTTCCCCGATTACA",
             "T" * 17, "GATTACA"]
    _check_batch(g, reads)
