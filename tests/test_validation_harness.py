"""Simulation-based validation (replaces the reference's EAGLE harness,
doc/validation-with-simulated-reads.md): simulate path reads, re-align,
and require a clean empirical MAPQ table."""
import numpy as np

from paragraph_tpu.align.composite import CompositeAligner
from paragraph_tpu.align.validation import ValidationAligner
from paragraph_tpu.cli.tools import simulate_reads_from_graph
from paragraph_tpu.graph.model import SequenceGraph
from paragraph_tpu.reads.read import Read, UNMAPPED


def _swap_graph(seed=5):
    rng = np.random.RandomState(seed)
    bases = "ACGT"

    def seq(n):
        return "".join(bases[i] for i in rng.randint(0, 4, n))

    g = SequenceGraph(["LF", "MID", "INS", "RF"],
                      [seq(120), seq(60), seq(45), seq(120)])
    g.add_edge(0, 1)
    g.add_edge(0, 2)
    g.add_edge(1, 3)
    g.add_edge(2, 3)
    return g, [[0, 1, 3], [0, 2, 3]]


def test_simulated_reads_validation():
    g, paths = _swap_graph()
    aligner = ValidationAligner(
        CompositeAligner(False, True, False, False), g, paths)
    aligner.set_graph(g, paths)

    n = 0
    for name, bases in simulate_reads_from_graph(
            g, paths, read_length=80, depth=4, error_rate=0.002):
        read = Read(fragment_id=name, bases=bases)
        read.graph_mapping_status = UNMAPPED
        aligner.align_read(read, None)
        n += 1
    assert n > 10
    assert aligner.aligned > 0.9 * n
    # nearly everything must land on its simulated path
    assert aligner.mismapped <= 0.02 * aligner.aligned
    report = aligner.report()
    assert report[0].startswith("[VALIDATION]")


def test_align_reads_validate_path(caplog):
    import logging

    from paragraph_tpu.align.composite import align_reads

    g, paths = _swap_graph()
    reads = []
    for name, bases in simulate_reads_from_graph(
            g, paths, read_length=80, depth=2, error_rate=0.0):
        r = Read(fragment_id=name, bases=bases)
        r.graph_mapping_status = UNMAPPED
        reads.append(r)
    with caplog.at_level(logging.INFO, logger="paragraph"):
        kept = align_reads(g, paths, reads, None, False, True, False,
                           False, validate_alignments=True)
    assert len(kept) > 0.9 * len(reads)
    assert any("[VALIDATION]" in rec.message for rec in caplog.records)
