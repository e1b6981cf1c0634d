"""Pallas TPU kernel for the batched graph Smith-Waterman fill.

The hot loop of the whole engine (SURVEY.md §3.3: the gssw DP fill
dominates paragraph's runtime). Design:

- Grid over batch tiles of TB reads; each program walks all graph columns
  sequentially in a fori_loop while its H/E state lives in VMEM — zero
  HBM traffic inside the column loop (the lax.scan fallback in
  batched_sw.py re-streams its carry through HBM every column and is
  ~30× slower).
- Layout [M, TB]: the read axis M sits on sublanes so the diagonal shift
  and the F prefix-scan become sublane rolls (register-level
  `pltpu.roll`, no scratch round-trips); the batch axis fills all 128
  lanes.
- Cross-node seeding keeps per-node boundary states in a VMEM scratch
  [N+1, M, TB] (slot N is the all-zero seed); predecessor ids come from a
  scalar-prefetched table.
- The F column recurrence is solved with the closed form
  F_j = max(0, max_{k<j}(H'_k − gapO + (k+1)·gapE) − j·gapE)
  (valid because gapO ≥ gapE; see align/gssw.py), evaluated as a log2(M)
  shifted-max prefix scan.
- End-cell tracking is a *running per-cell packed max*: each DP cell
  keeps max over columns of (H << (col_bits+j_bits)) | inverted column |
  inverted read-row, so the whole gssw tie-break order (max score, then
  first strict-attainment column, then min read position) reduces to one
  vector max per column and a single cross-row reduction after the loop.
  Per-node maxima (for alignsEndAtMultNodes) accumulate in a running
  [M, TB] register and reduce once per *node* at its last column.

Outputs per read match gssw exactly: best score, end cell with
first-strict-attainment / min-read-position tie-breaks, and the
multi-node-top-score flag (alignsEndAtMultNodes), including striped
padding-lane echo semantics. The kernel returns the winning *global
column index*; the host wrapper maps it to (node id, offset) with two
numpy gathers.

Why int32 state (and not int16, despite scores fitting comfortably):
the diagonal shift and F prefix scan are sublane rolls, and Mosaic
only implements vector rotates for 32-bit element types ("Rotate with
non-32-bit data" NotImplementedError, measured on v5e / jax 0.9) — an
int16 variant of this kernel is exact in interpret mode but does not
compile for TPU.
"""
from __future__ import annotations

from functools import partial
from typing import List

import numpy as np

from ..utils.jaxcfg import configure as _jax_configure
_jax_configure()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .batched_sw import GraphArrays, encode_reads

_BIG = np.int32(2 ** 30)
DEFAULT_TB = 128


def _bit_length(n: int) -> int:
    return max(1, int(n - 1).bit_length())


def pack_bits(L: int, M: int, match: int):
    """Bit split for the packed end-cell tracking word:
    [ score | inverted column (col_bits) | inverted read row (j_bits) ].
    Returns (col_bits, j_bits) or None if scores could overflow the
    available score bits (then the caller must fall back to the scan
    engine — never the case for paragraph's match=1 scoring on short
    reads)."""
    col_bits = _bit_length(L)
    j_bits = _bit_length(M)
    score_bits = 31 - col_bits - j_bits
    if score_bits < 1 or match * M >= (1 << score_bits):
        return None
    return col_bits, j_bits


def _shift_down(x, amt, fill, jj):
    """Shift along axis 0 (read axis) towards higher indices by `amt`,
    filling vacated rows with `fill`; jj is the row iota."""
    rolled = pltpu.roll(x, amt, axis=0)
    return jnp.where(jj >= amt, rolled, fill)


def _make_kernel(L: int, N: int, P: int, M: int, TB: int,
                 gap_open: int, gap_extend: int,
                 match: int, mismatch: int):
    dt = jnp.int32
    big = _BIG
    bits = pack_bits(L, M, match)
    assert bits is not None, "scores overflow packed tracking"
    col_bits, j_bits = bits
    s1 = col_bits + j_bits
    lmask = (1 << col_bits) - 1
    jmask = (1 << j_bits) - 1

    log_steps = []
    s = 1
    while s < M:
        log_steps.append(s)
        s *= 2

    def kernel(  # scalar-prefetch refs first
            ref_codes_ref, col_node_ref, col_in_node_ref, start_ref,
            last_ref, pred_ref,
            # tensor inputs
            read_codes_ref, read_lens_ref, read_vlens_ref,
            # outputs
            score_ref, end_col_ref, end_read_ref, multi_ref,
            # scratch
            prof_ref, h_ref, e_ref, saved_h_ref, saved_e_ref,
            node_run_ref, node_max_ref, best_ref):

        gapO = dt(gap_open)
        gapE = dt(gap_extend)

        codes = read_codes_ref[:]  # [M, TB] int32 (padded class = 5)
        lens = read_lens_ref[:]  # [1, TB]
        vlens = read_vlens_ref[:]

        # profile for the 5 reference classes: [5, M, TB]
        for c in range(4):
            prof_ref[c] = jnp.where(
                codes == c, jnp.int32(match),
                jnp.where(codes < 4, jnp.int32(-mismatch), jnp.int32(0)))
        prof_ref[4] = jnp.zeros((M, TB), dt)

        jj = jax.lax.broadcasted_iota(jnp.int32, (M, TB), 0)
        stripe_mask = jj < vlens
        real_mask = jj < lens
        gterm = jj * gapE
        jterm = jmask - jj  # inverted row code for the packed word

        h_ref[:] = jnp.zeros((M, TB), dt)
        e_ref[:] = jnp.zeros((M, TB), dt)
        saved_h_ref[:] = jnp.zeros((N + 1, M, TB), dt)
        saved_e_ref[:] = jnp.zeros((N + 1, M, TB), dt)
        node_max_ref[:] = jnp.zeros((N, 1, TB), jnp.int32)
        best_ref[:] = jnp.zeros((M, TB), jnp.int32)

        def col_body(i, _):
            ref_c = ref_codes_ref[i]
            nid = col_node_ref[i]
            is_start = start_ref[i] != 0
            is_last = last_ref[i] != 0

            @pl.when(is_start)
            def _():
                sh = saved_h_ref[pred_ref[nid, 0]]
                se = saved_e_ref[pred_ref[nid, 0]]
                for p in range(1, P):
                    sh = jnp.maximum(sh, saved_h_ref[pred_ref[nid, p]])
                    se = jnp.maximum(se, saved_e_ref[pred_ref[nid, p]])
                h_ref[:] = sh
                e_ref[:] = se
                node_run_ref[:] = jnp.zeros((M, TB), dt)

            prof = prof_ref[ref_c]
            h_prev = h_ref[:]
            e_col = e_ref[:]
            diag = _shift_down(h_prev, 1, dt(0), jj)
            hp = jnp.maximum(diag + prof, dt(0))
            hp = jnp.maximum(hp, e_col)
            # F prefix scan
            g = hp - gapO + gterm + gapE
            for s_amt in log_steps:
                g = jnp.maximum(g, _shift_down(g, s_amt, -big, jj))
            f = jnp.maximum(_shift_down(g, 1, -big, jj) - gterm, dt(0))
            h = jnp.maximum(hp, f)
            e_next = jnp.maximum(jnp.maximum(e_col - gapE, h - gapO), dt(0))
            h_ref[:] = h
            e_ref[:] = e_next
            node_run_ref[:] = jnp.maximum(node_run_ref[:], h)

            # packed end-cell candidate: score, then min column (first
            # strict attainment), then min read row — one max, no reduce
            packed = (h << s1) + (((lmask - i) << j_bits) + jterm)
            best_ref[:] = jnp.maximum(
                best_ref[:], jnp.where(stripe_mask, packed, 0))

            @pl.when(is_last)
            def _():
                saved_h_ref[nid] = h
                saved_e_ref[nid] = e_next
                node_max_ref[nid] = jnp.max(
                    jnp.where(real_mask, node_run_ref[:], 0),
                    axis=0, keepdims=True)

            return 0

        jax.lax.fori_loop(0, L, col_body, 0)

        final = jnp.max(best_ref[:], axis=0, keepdims=True)  # [1, TB]
        cur_max = final >> s1
        end_col = lmask - ((final >> j_bits) & lmask)
        first_j = jmask - (final & jmask)

        top = jnp.broadcast_to(cur_max, (N, 1, TB))
        n_top = jnp.sum((node_max_ref[:] == top).astype(jnp.int32), axis=0)
        zero_fill = cur_max == 0
        score_ref[:] = cur_max
        end_col_ref[:] = jnp.where(zero_fill, -1, end_col)
        end_read_ref[:] = jnp.where(
            zero_fill, 0, jnp.minimum(first_j, lens - 1))
        multi_ref[:] = (n_top > 1).astype(jnp.int32)

    return kernel


@partial(jax.jit,
         static_argnames=("L", "N", "P", "M", "TB", "gap_open",
                          "gap_extend", "match", "mismatch", "interpret"))
def pallas_fill(ref_codes, col_node, col_in_node, is_start, is_last,
                pred_table, read_codes_t, read_lens, read_vlens,
                L: int, N: int, P: int, M: int, TB: int,
                gap_open: int = 6, gap_extend: int = 1, match: int = 1,
                mismatch: int = 4, interpret: bool = False):
    """read_codes_t: [M, B] integer (transposed) — int8 preferred: it
    quarters the host→device transfer and is widened to int32 by XLA on
    device before the kernel. lens/vlens: [1, B].
    Returns (score, end_col, end_read, multi) as [B] vectors; end_col is
    the global column index (-1 when score is 0)."""
    B = read_codes_t.shape[1]
    assert B % TB == 0
    read_codes_t = read_codes_t.astype(jnp.int32)
    state_dt = jnp.int32
    kernel = _make_kernel(L, N, P, M, TB, gap_open, gap_extend, match,
                          mismatch)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((M, TB), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TB), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
        scratch_shapes=[
            pltpu.VMEM((5, M, TB), state_dt),  # profile
            pltpu.VMEM((M, TB), state_dt),  # H
            pltpu.VMEM((M, TB), state_dt),  # E
            pltpu.VMEM((N + 1, M, TB), state_dt),  # saved H
            pltpu.VMEM((N + 1, M, TB), state_dt),  # saved E
            pltpu.VMEM((M, TB), state_dt),  # per-node running max
            pltpu.VMEM((N, 1, TB), jnp.int32),  # node max (real lanes)
            pltpu.VMEM((M, TB), jnp.int32),  # running packed best
        ],
    )
    out_shape = [jax.ShapeDtypeStruct((1, B), jnp.int32) for _ in range(4)]
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(ref_codes, col_node, col_in_node,
      is_start.astype(jnp.int32), is_last.astype(jnp.int32), pred_table,
      read_codes_t, read_lens, read_vlens)
    # one [4, B] device buffer so callers pay a single host fetch
    # (each tunnel round trip costs ~tens of ms)
    return jnp.concatenate(outs, axis=0)


class PallasGraphSW:
    """Pallas-backed batched scorer (drop-in for BatchedGraphSW.score)."""

    def __init__(self, graph, match=1, mismatch=4, gap_open=6,
                 gap_extend=1, tile_batch: int = DEFAULT_TB,
                 interpret: bool = False):
        self.graph = graph
        self.arrays = GraphArrays.build(graph)
        self.match = match
        self.mismatch = mismatch
        self.gap_open = gap_open
        self.gap_extend = gap_extend
        self.tile_batch = tile_batch
        from .multi_sw import _auto_interpret

        self.interpret = _auto_interpret(interpret)

    def score_device(self, reads: List[str], pad_to: int = 0):
        """Dispatch the fill and return device arrays without forcing a
        host transfer — callers can pipeline several dispatches and
        finalize() them together. Returns None if the packed end-tracking
        word can't hold the scores (finalize falls back to the scan
        engine)."""
        n_real = len(reads)
        tb = self.tile_batch
        b_bucket = tb
        while b_bucket < n_real:
            b_bucket *= 2
        reads = list(reads) + ["A"] * (b_bucket - n_real)
        max_len = max(len(r) for r in reads)
        pad_to = max(pad_to, -(max_len // -32) * 32)
        codes, lens, vlens = encode_reads(reads, pad_to)
        a = self.arrays
        if pack_bits(len(a.ref_codes), codes.shape[1], self.match) is None:
            # scores overflow the packed tracking word (only reachable
            # with non-default scoring on very long reads)
            return None
        outs = pallas_fill(
            jnp.asarray(a.ref_codes), jnp.asarray(a.col_node),
            jnp.asarray(a.col_in_node),
            jnp.asarray(a.is_start.astype(np.int32)),
            jnp.asarray(a.is_last.astype(np.int32)),
            jnp.asarray(a.pred_table),
            jnp.asarray(codes.T.astype(np.int8)),
            jnp.asarray(lens[None, :]), jnp.asarray(vlens[None, :]),
            L=len(a.ref_codes), N=a.num_nodes,
            P=a.pred_table.shape[1], M=codes.shape[1], TB=tb,
            gap_open=self.gap_open, gap_extend=self.gap_extend,
            match=self.match, mismatch=self.mismatch,
            interpret=self.interpret)
        return outs, n_real

    def finalize(self, handle):
        """Fetch a score_device() result and map the winning column back
        to (node id, in-node offset) with two host gathers."""
        outs, n_real = handle
        a = self.arrays
        vals = np.asarray(outs)  # single [4, B] fetch
        score = vals[0, :n_real]
        end_col = vals[1, :n_real]
        end_read = vals[2, :n_real]
        multi = vals[3, :n_real]
        valid = end_col >= 0
        safe_col = np.where(valid, end_col, 0)
        end_node = np.where(valid, a.col_node[safe_col], 0).astype(np.int32)
        end_ref = np.where(
            valid, a.col_in_node[safe_col], -1).astype(np.int32)
        return score, end_node, end_ref, end_read, multi

    def score(self, reads: List[str], pad_to: int = 0):
        handle = self.score_device(reads, pad_to)
        if handle is None:
            from .batched_sw import BatchedGraphSW

            return BatchedGraphSW(
                self.graph, match=self.match, mismatch=self.mismatch,
                gap_open=self.gap_open,
                gap_extend=self.gap_extend).score(reads, pad_to)
        return self.finalize(handle)
