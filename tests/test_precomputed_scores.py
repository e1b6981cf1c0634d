"""Injected cross-event scores must give identical alignments to the
self-scoring path (exercises the batch-events plumbing on CPU using the
scan scorer as the external source)."""
import copy

from paragraph_tpu.align.batched_aligner import make_orientation_batches
from paragraph_tpu.align.composite import align_reads
from paragraph_tpu.graph.model import SequenceGraph
from paragraph_tpu.ops.batched_sw import BatchedGraphSW
from paragraph_tpu.reads.read import Read, UNMAPPED


def test_precomputed_scores_identical():
    g = SequenceGraph(
        ["LF", "MID", "INS", "RF"],
        ["ACGTACGTACGTACGTACGT", "TTTTCCCCGGGG", "GATTACAGAT",
         "TGCATGCATGCATGCATGCA"])
    for f, t in [(0, 1), (0, 2), (1, 3), (2, 3)]:
        g.add_edge(f, t)
    reads = [
        Read(fragment_id=f"r{i}", bases=b)
        for i, b in enumerate([
            "ACGTACGTACGTACGTACGTTTTTCCCCGGGG",
            "GGGGTGCATGCATGCA",
            "ACGTACGTGATTACAGAT"[::-1].translate(
                str.maketrans("ACGT", "TGCA")),  # revcomp read
            "TTTTTTTTTTTTTT",
        ])
    ]
    reads_a = [copy.deepcopy(r) for r in reads]
    reads_b = [copy.deepcopy(r) for r in reads]

    kept_a = align_reads(g, [], reads_a, None, False, True, False, False)

    live = [r for r in reads_b if r.bases]
    for r in live:
        r.graph_mapping_status = UNMAPPED
    _, _, fwd_batch, rev_batch = make_orientation_batches(live)
    f_out = BatchedGraphSW(g).score(fwd_batch)
    r_out = BatchedGraphSW(g.reversed()).score(rev_batch)
    precomputed = (f_out[0], f_out[4], r_out[4])
    kept_b = align_reads(g, [], reads_b, None, False, True, False, False,
                         precomputed_scores=precomputed)

    assert len(kept_a) == len(kept_b)
    for a, b in zip(kept_a, kept_b):
        assert a.graph_cigar == b.graph_cigar
        assert a.graph_pos == b.graph_pos
        assert a.graph_mapq == b.graph_mapq
        assert a.is_graph_reverse_strand == b.is_graph_reverse_strand
