"""PairedGraphSW (single-upload 4-orientation protocol) vs the legacy
two-batch MultiGraphSW path: outputs must be bit-identical, since the
on-device orientation derivation must reproduce host-side string
reversal/complement + encode exactly (ops/multi_sw.py paired_pallas_fill)."""
import random

from paragraph_tpu.align.graph_aligner import reverse_complement
from paragraph_tpu.graph.model import SequenceGraph
from paragraph_tpu.ops.multi_sw import MultiGraphSW, PairedGraphSW

from test_gssw_vs_reference import _random_graph, _read_from_graph


def _make_graph(seqs, edges):
    g = SequenceGraph([f"n{i}" for i in range(len(seqs))], seqs)
    for f, t in edges:
        g.add_edge(f, t)
    return g


def test_paired_matches_legacy_batches():
    rng = random.Random(909)
    graphs = []
    reads_per_pair = []
    for _ in range(3):
        seqs, edges = _random_graph(rng, max_nodes=5, max_len=20)
        graphs.append(_make_graph(seqs, edges))
        reads = []
        for _ in range(4):
            r = _read_from_graph(rng, seqs, edges,
                                 read_len=rng.randint(6, 25))
            if r:
                reads.append(r)
        reads_per_pair.append(reads)

    paired = PairedGraphSW(graphs, interpret=True)
    got = paired.score_pairs(reads_per_pair)

    legacy_graphs = []
    legacy_batches = []
    for g, reads in zip(graphs, reads_per_pair):
        fwd = [r.upper() for r in reads]
        rc = [reverse_complement(r) for r in fwd]
        legacy_graphs.extend([g, g.reversed()])
        legacy_batches.append(fwd + rc)
        legacy_batches.append([b[::-1] for b in fwd] + [b[::-1] for b in rc])
    legacy = MultiGraphSW(legacy_graphs, interpret=True)
    want = legacy.score(legacy_batches)

    for k in range(len(graphs)):
        f_out, r_out = got[k]
        for name, a, b in zip(
                ("score", "end_node", "end_ref", "end_read", "multi"),
                f_out, want[2 * k]):
            assert (a == b).all(), (k, "fwd", name, a, b)
        for name, a, b in zip(
                ("score", "end_node", "end_ref", "end_read", "multi"),
                r_out, want[2 * k + 1]):
            assert (a == b).all(), (k, "rev", name, a, b)


def test_paired_chunking_keeps_pairs_together():
    rng = random.Random(910)
    graphs = []
    reads_per_pair = []
    for _ in range(4):
        seqs, edges = _random_graph(rng, max_nodes=4, max_len=16)
        graphs.append(_make_graph(seqs, edges))
        r = _read_from_graph(rng, seqs, edges, read_len=10)
        reads_per_pair.append([r] if r else ["ACGTACGT"])
    # force one pair per chunk
    paired = PairedGraphSW(graphs, interpret=True, col_budget=1)
    assert len(paired.chunk_pairs) == 4
    got = paired.score_pairs(reads_per_pair)
    one = PairedGraphSW(graphs, interpret=True)
    want = one.score_pairs(reads_per_pair)
    for k in range(4):
        for side in range(2):
            for a, b in zip(got[k][side], want[k][side]):
                assert (a == b).all()


def test_blob_form_matches_string_form():
    """(blob, lens) pair inputs (the pipelined orchestrator's wire form)
    must score identically to list-of-strings inputs."""
    import numpy as np

    rng = random.Random(4242)
    graphs = []
    reads_per_pair = []
    for _ in range(3):
        seqs, edges = _random_graph(rng, max_nodes=4, max_len=18)
        graphs.append(_make_graph(seqs, edges))
        reads = []
        for _ in range(rng.randint(0, 5)):
            r = _read_from_graph(rng, seqs, edges,
                                 read_len=rng.randint(6, 20))
            if r:
                reads.append(r)
        reads_per_pair.append(reads)

    sw = PairedGraphSW(graphs, interpret=True)
    want = sw.score_pairs(reads_per_pair)

    blobs = []
    for reads in reads_per_pair:
        up = [r.upper() for r in reads]
        lens = np.fromiter((len(r) for r in up), np.int32, count=len(up))
        blobs.append(("".join(up).encode(), lens))
    got = PairedGraphSW(graphs, interpret=True).score_pairs(blobs)

    for (gf, gr), (wf, wr) in zip(got, want):
        for a, b in zip(gf + gr, wf + wr):
            assert np.array_equal(a, b)
