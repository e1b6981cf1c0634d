"""Pallas TPU kernel for the batched graph Smith-Waterman fill.

The hot loop of the whole engine (SURVEY.md §3.3: the gssw DP fill
dominates paragraph's runtime). Design:

- Grid over batch tiles of TB reads; each program walks all graph columns
  sequentially in a fori_loop while its H/E state lives in VMEM — zero
  HBM traffic inside the column loop (the lax.scan fallback in
  batched_sw.py re-streams its carry through HBM every column and is
  ~30× slower).
- Layout [M, TB]: the read axis M sits on sublanes so the diagonal shift
  and the F prefix-scan become sublane rolls; the batch axis fills all
  128 lanes.
- Cross-node seeding keeps per-node boundary states in a VMEM scratch
  [N+1, M, TB] (slot N is the all-zero seed); predecessor ids come from a
  scalar-prefetched table.
- The F column recurrence is solved with the closed form
  F_j = max(0, max_{k<j}(H'_k − gapO + (k+1)·gapE) − j·gapE)
  (valid because gapO ≥ gapE; see align/gssw.py), evaluated as a log2(M)
  shifted-max prefix scan.

Outputs per read match gssw exactly: best score, end cell with
first-strict-attainment / min-read-position tie-breaks, and the
multi-node-top-score flag (alignsEndAtMultNodes), including striped
padding-lane echo semantics.
"""
from __future__ import annotations

from functools import partial
from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .batched_sw import GraphArrays, encode_reads

_BIG = np.int32(2 ** 30)
DEFAULT_TB = 128


def _shift_down(x, amt, fill):
    """Shift along axis 0 (read axis) towards higher indices by `amt`,
    filling vacated rows with `fill`. (Used by interpret-mode paths;
    compiled kernels use scratch-based shifts because Mosaic only rotates
    32-bit data.)"""
    rolled = pltpu.roll(x, amt, axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(row >= amt, rolled, fill)


def _make_kernel(L: int, N: int, P: int, M: int, TB: int,
                 gap_open: int, gap_extend: int,
                 match: int, mismatch: int, dt=jnp.int32):
    """DP state in dtype `dt` (int32, or int16 for 2x VPU lanes — exact
    while scores + M*gap_extend stay below 2^14, i.e. any read the byte
    mode of gssw could handle)."""
    big = np.int32(2 ** 30) if dt == jnp.int32 else np.int16(2 ** 13)
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
            score_ref, end_node_ref, end_ref_ref, end_read_ref, multi_ref,
            # scratch
            prof_ref, h_ref, e_ref, saved_h_ref, saved_e_ref,
            node_max_ref, cur_max_ref, e_node_ref, e_ref2_ref,
            e_read_ref, shift_ref):

        def shift_down(x, amt, fill_val):
            # sublane shift via scratch stores (dtype-agnostic)
            shift_ref[0:amt] = jnp.full((amt, TB), fill_val, dt)
            shift_ref[amt:M] = x[0:M - amt]
            return shift_ref[:]
        gapO = dt(gap_open)
        gapE = dt(gap_extend)

        codes = read_codes_ref[:]  # [M, TB] int32 (padded class = 5)
        lens = read_lens_ref[:]  # [1, TB]
        vlens = read_vlens_ref[:]

        # build profile for the 5 reference classes: [5, M, TB]
        # (computed in int32 then cast — mixing i1 masks from int32
        # compares with 16-bit selects trips a Mosaic relayout bug)
        for c in range(4):
            prof_ref[c] = jnp.where(
                codes == c, jnp.int32(match),
                jnp.where(codes < 4, jnp.int32(-mismatch),
                          jnp.int32(0))).astype(dt)
        prof_ref[4] = jnp.zeros((M, TB), dt)

        jj = jax.lax.broadcasted_iota(jnp.int32, (M, TB), 0)
        jj_dt = jj.astype(dt)
        stripe_mask = jj < vlens
        real_mask = jj < lens

        h_ref[:] = jnp.zeros((M, TB), dt)
        e_ref[:] = jnp.zeros((M, TB), dt)
        saved_h_ref[:] = jnp.zeros((N + 1, M, TB), dt)
        saved_e_ref[:] = jnp.zeros((N + 1, M, TB), dt)
        node_max_ref[:] = jnp.zeros((N, 1, TB), jnp.int32)
        cur_max_ref[:] = jnp.zeros((1, TB), jnp.int32)
        e_node_ref[:] = jnp.zeros((1, TB), jnp.int32)
        e_ref2_ref[:] = jnp.full((1, TB), -1, jnp.int32)
        e_read_ref[:] = lens - 1

        def col_body(i, _):
            ref_c = ref_codes_ref[i]
            nid = col_node_ref[i]
            col_off = col_in_node_ref[i]
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

            prof = prof_ref[ref_c]
            h_prev = h_ref[:]
            e_col = e_ref[:]
            diag = shift_down(h_prev, 1, dt(0))
            hp = jnp.maximum(diag + prof, dt(0))
            hp = jnp.maximum(hp, e_col)
            # F prefix scan
            g = hp - gapO + (jj_dt + dt(1)) * gapE
            for s_amt in log_steps:
                g = jnp.maximum(g, shift_down(g, s_amt, -big))
            f = jnp.maximum(shift_down(g, 1, -big) - jj_dt * gapE, dt(0))
            h = jnp.maximum(hp, f)
            e_next = jnp.maximum(jnp.maximum(e_col - gapE, h - gapO), dt(0))
            h_ref[:] = h
            e_ref[:] = e_next

            @pl.when(is_last)
            def _():
                saved_h_ref[nid] = h
                saved_e_ref[nid] = e_next

            h32 = h.astype(jnp.int32)
            h_stripe = jnp.where(stripe_mask, h32, 0)
            h_real = jnp.where(real_mask, h32, 0)
            col_max = jnp.max(h_stripe, axis=0, keepdims=True)  # [1, TB]
            col_max_real = jnp.max(h_real, axis=0, keepdims=True)
            node_max_ref[nid] = jnp.maximum(node_max_ref[nid], col_max_real)

            upd = col_max > cur_max_ref[:]
            first_j = jnp.min(
                jnp.where(
                    jnp.logical_and(h_stripe == col_max, stripe_mask),
                    jj, _BIG), axis=0, keepdims=True)
            cand_read = jnp.minimum(first_j, lens - 1)
            cur_max_ref[:] = jnp.where(upd, col_max, cur_max_ref[:])
            e_node_ref[:] = jnp.where(upd, nid, e_node_ref[:])
            e_ref2_ref[:] = jnp.where(upd, col_off, e_ref2_ref[:])
            e_read_ref[:] = jnp.where(upd, cand_read, e_read_ref[:])
            return 0

        jax.lax.fori_loop(0, L, col_body, 0)

        cur_max = cur_max_ref[:]
        top = jnp.broadcast_to(cur_max, (N, 1, TB))
        n_top = jnp.sum((node_max_ref[:] == top).astype(jnp.int32), axis=0)
        zero_fill = cur_max == 0
        score_ref[:] = cur_max
        end_node_ref[:] = jnp.where(zero_fill, 0, e_node_ref[:])
        end_ref_ref[:] = jnp.where(zero_fill, -1, e_ref2_ref[:])
        end_read_ref[:] = jnp.where(
            jnp.logical_and(zero_fill, lens > 1), 0, e_read_ref[:])
        multi_ref[:] = (n_top > 1).astype(jnp.int32)

    return kernel


@partial(jax.jit,
         static_argnames=("L", "N", "P", "M", "TB", "gap_open",
                          "gap_extend", "match", "mismatch", "use_i16",
                          "interpret"))
def pallas_fill(ref_codes, col_node, col_in_node, is_start, is_last,
                pred_table, read_codes_t, read_lens, read_vlens,
                L: int, N: int, P: int, M: int, TB: int,
                gap_open: int = 6, gap_extend: int = 1, match: int = 1,
                mismatch: int = 4, use_i16: bool = False,
                interpret: bool = False):
    """read_codes_t: [M, B] int32 (transposed); lens/vlens: [1, B]."""
    B = read_codes_t.shape[1]
    assert B % TB == 0
    state_dt = jnp.int16 if use_i16 else jnp.int32
    kernel = _make_kernel(L, N, P, M, TB, gap_open, gap_extend, match,
                          mismatch, dt=state_dt)
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
            for _ in range(5)
        ],
        scratch_shapes=[
            pltpu.VMEM((5, M, TB), state_dt),  # profile
            pltpu.VMEM((M, TB), state_dt),  # H
            pltpu.VMEM((M, TB), state_dt),  # E
            pltpu.VMEM((N + 1, M, TB), state_dt),  # saved H
            pltpu.VMEM((N + 1, M, TB), state_dt),  # saved E
            pltpu.VMEM((N, 1, TB), jnp.int32),  # node max (real lanes)
            pltpu.VMEM((1, TB), jnp.int32),  # cur max
            pltpu.VMEM((1, TB), jnp.int32),  # end node
            pltpu.VMEM((1, TB), jnp.int32),  # end ref
            pltpu.VMEM((1, TB), jnp.int32),  # end read
            pltpu.VMEM((M, TB), state_dt),  # shift scratch
        ],
    )
    out_shape = [jax.ShapeDtypeStruct((1, B), jnp.int32) for _ in range(5)]
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(ref_codes, col_node, col_in_node,
      is_start.astype(jnp.int32), is_last.astype(jnp.int32), pred_table,
      read_codes_t, read_lens, read_vlens)
    score, end_node, end_ref, end_read, multi = [o[0] for o in outs]
    return score, end_node, end_ref, end_read, multi


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
        self.interpret = interpret

    def score(self, reads: List[str], pad_to: int = 0):
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
        # i16 state would be exact below 2^13 and halve VPU work, but the
        # current Mosaic toolchain only legalizes 32-bit vector compute
        # (i8 vectors, 16-bit rotates and arith.maxsi on i16 all fail),
        # so the compiled path stays int32 for now.
        use_i16 = False
        out = pallas_fill(
            jnp.asarray(a.ref_codes), jnp.asarray(a.col_node),
            jnp.asarray(a.col_in_node),
            jnp.asarray(a.is_start.astype(np.int32)),
            jnp.asarray(a.is_last.astype(np.int32)),
            jnp.asarray(a.pred_table),
            jnp.asarray(codes.T.copy()),
            jnp.asarray(lens[None, :]), jnp.asarray(vlens[None, :]),
            L=len(a.ref_codes), N=a.num_nodes,
            P=a.pred_table.shape[1], M=codes.shape[1], TB=tb,
            gap_open=self.gap_open, gap_extend=self.gap_extend,
            match=self.match, mismatch=self.mismatch, use_i16=use_i16,
            interpret=self.interpret)
        return tuple(np.asarray(x)[:n_real] for x in out)
