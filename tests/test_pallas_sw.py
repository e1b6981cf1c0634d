"""Pallas kernel (interpret mode on CPU) vs the exact scalar oracle.

Covers both the uint8 byte-mode kernel and the int32 kernel on small
graphs; the TPU-compiled path is exercised by bench.py on hardware.
"""
import random

import numpy as np
import pytest

from paragraph_tpu.align.gssw import GraphSW
from paragraph_tpu.graph.model import SequenceGraph
from paragraph_tpu.ops.pallas_sw import PallasGraphSW

from test_gssw_vs_reference import _random_graph, _read_from_graph


def _make_graph(seqs, edges):
    g = SequenceGraph([f"n{i}" for i in range(len(seqs))], seqs)
    for f, t in edges:
        g.add_edge(f, t)
    return g


def _check(g, reads, tile_batch=128):
    scalar = GraphSW(g)
    pall = PallasGraphSW(g, tile_batch=tile_batch, interpret=True)
    score, end_node, end_ref, end_read, multi = pall.score(reads)
    for i, read in enumerate(reads):
        fills, max_node, max_score = scalar.fill(read)
        s_multi = scalar.ends_at_multiple_nodes(fills, max_score)
        f = fills[max_node]
        assert score[i] == max_score, (i, read)
        assert end_node[i] == max_node, (i, read)
        assert end_ref[i] == f.ref_end1, (i, read)
        assert end_read[i] == f.read_end1, (i, read)
        assert bool(multi[i]) == s_multi, (i, read)


def test_pallas_u8_simple():
    g = _make_graph(["AAAATTTT", "CCCC", "GGGGAAAA"],
                    [(0, 1), (0, 2), (1, 2)])
    reads = ["TTTTCCCCGGGG", "AAAATTTTGGGG", "CCCCGGGG", "TTTT",
             "GGGGGGGG", "ACGT"]
    _check(g, reads)


def test_pallas_u8_random():
    rng = random.Random(31337)
    for case in range(4):
        seqs, edges = _random_graph(rng, max_nodes=5, max_len=24)
        g = _make_graph(seqs, edges)
        reads = []
        for _ in range(4):
            r = _read_from_graph(rng, seqs, edges,
                                 read_len=rng.randint(8, 30))
            if r:
                reads.append(r)
        if reads:
            _check(g, reads)
