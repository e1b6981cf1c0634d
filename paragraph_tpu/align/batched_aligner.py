"""Batched graph aligner: device scoring + host traceback.

TPU-native realisation of grm::GraphAligner's per-read protocol
(GraphAligner.cpp:308-404): all reads are scored in one batched device
fill per orientation (forward/reverse-complement × forward/reversed
graph), strand and uniqueness are selected vectorised, and only the chosen
orientation of each kept read goes through the exact scalar traceback to
produce its node-CIGAR.
"""
from __future__ import annotations

import logging
import os
from typing import List, Optional

from ..graph.model import SequenceGraph
from ..ops.batched_sw import BatchedGraphSW
from ..reads.read import Read
from .graph_aligner import reverse_complement
from .gssw import GraphSW

logger = logging.getLogger("paragraph")


def resolve_threads(threads: int) -> int:
    """threads<=0 means auto (hardware concurrency), mirroring the
    reference CLIs' std::thread::hardware_concurrency() default
    (/root/reference/src/c++/main/paragraph.cpp:73)."""
    if threads and threads > 0:
        return threads
    return os.cpu_count() or 1


def _make_scorer(graph: SequenceGraph):
    """Pallas kernel on TPU, XLA scan elsewhere (same exact outputs)."""
    import jax

    if jax.devices()[0].platform != "cpu":
        try:
            from ..ops.pallas_sw import PallasGraphSW

            return PallasGraphSW(graph)
        except Exception as exc:
            # deliberate broad catch: any device/toolchain failure must
            # degrade to the (slower, exact) scan engine — but loudly
            logger.warning(
                "Pallas graph-SW unavailable (%s: %s); using the XLA scan "
                "engine (expect ~30x slower scoring)",
                type(exc).__name__, exc)
    return BatchedGraphSW(graph)


def make_orientation_batches(reads: List[Read]):
    """The four-orientation read batches of GraphAligner's protocol:
    forward graph scores fwd + revcomp reads; reversed graph scores their
    reversals. Returns (fwd_bases, rev_bases, fwd_batch, rev_batch)."""
    fwd_bases = [r.bases.upper() for r in reads]
    rev_bases = [reverse_complement(b) for b in fwd_bases]
    fwd_batch = fwd_bases + rev_bases
    rev_batch = [b[::-1] for b in fwd_bases] + [b[::-1] for b in rev_bases]
    return fwd_bases, rev_bases, fwd_batch, rev_batch


class BatchedGraphAligner:
    def __init__(self, graph: Optional[SequenceGraph] = None,
                 scoring: bool = True, threads: int = 1):
        self._fwd_scorer: Optional[BatchedGraphSW] = None
        self._rev_scorer: Optional[BatchedGraphSW] = None
        self._fwd_scalar: Optional[GraphSW] = None
        self._fwd_native = None
        self._scoring = scoring
        self.threads = threads
        #: which scoring engine actually ran ("pallas" | "scan" |
        #: "precomputed"); surfaced in alignment_statistics so a silent
        #: device fallback is visible in the output JSON
        self.engine = "none"
        if graph is not None:
            self.set_graph(graph)

    def set_graph(self, graph: SequenceGraph):
        if self._scoring:
            self._fwd_scorer = _make_scorer(graph)
            self._rev_scorer = _make_scorer(graph.reversed())
        self._fwd_scalar = GraphSW(graph)
        # C-speed traceback for kept reads when the native lib builds
        try:
            from .native import NativeGraphSW, native_available

            if native_available():
                self._fwd_native = NativeGraphSW(graph)
        except Exception:
            self._fwd_native = None

    def _trace(self, chosen: str):
        """Exact fill+traceback of the chosen orientation: native C++ when
        available, Python oracle otherwise. Returns (score, pos, cigar)."""
        if self._fwd_native is not None:
            score, pos, _multi, cigar = self._fwd_native.align(chosen)
            return score, pos, cigar
        fills, max_node, _score = self._fwd_scalar.fill(chosen)
        gm = self._fwd_scalar.trace_back(fills, max_node, chosen)
        return gm.score, gm.position, gm.cigar_string()

    def align_reads_batch(self, reads: List[Read],
                          precomputed=None,
                          trace_uniq_only: bool = False) -> None:
        """Batch equivalent of calling GraphAligner::alignRead per read
        with AF_ALL flags.

        `precomputed` optionally carries (f_score, f_multi, r_multi[,
        f_end_node, f_end_ref, f_end_read]) from an external (e.g.
        cross-event) scoring pass; the end-cell triple (when present)
        seeds the banded native traceback.

        `trace_uniq_only=True` skips the exact traceback for non-unique
        reads — valid only when the caller's filter chain drops them on
        the uniqueness flag alone and their CIGARs are never output
        (grmpy's NonUniq-first chain with alignment output disabled).
        """
        if not reads:
            return
        fwd_bases, rev_bases, fwd_batch, rev_batch = \
            make_orientation_batches(reads)
        n = len(reads)

        f_ends = None  # (end_node, end_ref, end_read) vs the fwd graph
        if precomputed is not None:
            if len(precomputed) >= 6:
                (f_score, f_multi, r_multi,
                 f_en, f_er, f_erd) = precomputed[:6]
                f_ends = (f_en, f_er, f_erd)
            else:
                f_score, f_multi, r_multi = precomputed[:3]
            self.engine = "precomputed"
        else:
            try:
                if (hasattr(self._fwd_scorer, "score_device")
                        and hasattr(self._rev_scorer, "score_device")):
                    # pipeline both orientation dispatches before the
                    # first host fetch (hides one device round trip)
                    hf = self._fwd_scorer.score_device(fwd_batch)
                    hr = self._rev_scorer.score_device(rev_batch)
                    if hf is not None and hr is not None:
                        f_score, f_en, f_er, f_erd, f_multi = \
                            self._fwd_scorer.finalize(hf)
                        _, _, _, _, r_multi = self._rev_scorer.finalize(hr)
                    else:
                        f_score, f_en, f_er, f_erd, f_multi = \
                            self._fwd_scorer.score(fwd_batch)
                        _, _, _, _, r_multi = \
                            self._rev_scorer.score(rev_batch)
                    self.engine = "pallas"
                else:
                    f_score, f_en, f_er, f_erd, f_multi = \
                        self._fwd_scorer.score(fwd_batch)
                    _, _, _, _, r_multi = self._rev_scorer.score(rev_batch)
                    self.engine = "scan"
                f_ends = (f_en, f_er, f_erd)
            except Exception as exc:
                # device kernel failed (e.g. Mosaic/compile issue on this
                # toolchain) — fall back to the XLA scan scorer permanently,
                # and say so: a mis-compiled kernel on new hardware must
                # show up as a warning, not just mysterious slowness
                if isinstance(self._fwd_scorer, BatchedGraphSW):
                    raise
                logger.warning(
                    "device graph-SW scoring failed (%s: %s); falling back "
                    "to the XLA scan engine for this graph",
                    type(exc).__name__, exc)
                self._fwd_scorer = BatchedGraphSW(self._fwd_scorer.graph)
                self._rev_scorer = BatchedGraphSW(self._rev_scorer.graph)
                f_score, f_en, f_er, f_erd, f_multi = \
                    self._fwd_scorer.score(fwd_batch)
                _, _, _, _, r_multi = self._rev_scorer.score(rev_batch)
                self.engine = "scan"
                f_ends = (f_en, f_er, f_erd)

        chosen_list = []
        unique_list = []
        ends_list = []
        for i, read in enumerate(reads):
            fwd_multi = bool(f_multi[i])
            rev_multi = bool(f_multi[n + i])
            rfwd_multi = bool(r_multi[i])
            rrev_multi = bool(r_multi[n + i])
            fwd_unique = (not fwd_multi) and (not rfwd_multi)
            rev_unique = (not rev_multi) and (not rrev_multi)

            return_reverse = False
            if not fwd_unique and rev_unique:
                return_reverse = True
            elif fwd_unique and not rev_unique:
                return_reverse = False
            else:
                return_reverse = int(f_score[i]) < int(f_score[n + i])

            read.is_graph_reverse_strand = (
                read.is_reverse_strand != return_reverse)
            if return_reverse:
                chosen = rev_bases[i]
                read.bases = chosen
                read.quals = read.quals[::-1]
                unique = rev_unique
            else:
                chosen = fwd_bases[i]
                unique = fwd_unique
            chosen_list.append(chosen)
            unique_list.append(unique)
            # device end cell (fwd-graph coordinates) of the chosen
            # orientation: row i is the fwd read, row n+i its revcomp
            if f_ends is not None:
                idx = n + i if return_reverse else i
                ends_list.append((int(f_ends[0][idx]), int(f_ends[1][idx]),
                                  int(f_ends[2][idx]),
                                  int(f_score[idx])))
            else:
                ends_list.append(None)

        # exact traceback on the chosen orientation only — banded around
        # the device-reported end cell when available (score-verified,
        # falls back to full width on any mismatch). Non-unique reads
        # skip traceback entirely when the caller guarantees the filter
        # chain drops them unseen (trace_uniq_only).
        skip = [trace_uniq_only and not u for u in unique_list]

        def trace_one(eng, k):
            if skip[k]:
                e = ends_list[k]
                return (e[3] if e else 0, 0, "")
            e = ends_list[k]
            if eng is not None:
                if e is not None:
                    return eng.align_at(chosen_list[k], e[0], e[1], e[2],
                                        e[3])
                score, pos, _multi, cigar = eng.align(chosen_list[k])
                return score, pos, cigar
            return self._trace(chosen_list[k])

        # the native C++ engine releases the GIL, so fan out over threads
        if self._fwd_native is not None and len(reads) > 64:
            import concurrent.futures

            from .native import NativeGraphSW

            workers = min(resolve_threads(self.threads), 32)
            engines = [self._fwd_native] + [
                NativeGraphSW(self._fwd_native.graph)
                for _ in range(workers - 1)
            ]

            def trace_chunk(args):
                widx, idxs = args
                eng = engines[widx]
                return [trace_one(eng, k) for k in idxs]

            chunks = [(w, list(range(w, len(reads), workers)))
                      for w in range(workers)]
            with concurrent.futures.ThreadPoolExecutor(workers) as ex:
                chunk_results = list(ex.map(trace_chunk, chunks))
            traces = [None] * len(reads)
            for (w, idxs), res in zip(chunks, chunk_results):
                for k, r in zip(idxs, res):
                    traces[k] = r
        else:
            traces = [trace_one(self._fwd_native, k)
                      for k in range(len(reads))]

        for read, unique, (score, pos, cigar) in zip(
                reads, unique_list, traces):
            read.graph_pos = pos
            read.graph_alignment_score = score
            read.is_graph_alignment_unique = unique
            read.graph_mapq = 60 if unique else 0
            read.graph_cigar = cigar
