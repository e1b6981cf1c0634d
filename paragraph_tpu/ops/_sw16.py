"""EXPERIMENT: int16 DP state + register end tracking (candidate kernel).

Same contract as ops/pallas_sw.py::pallas_fill. Differences:
- All DP state (profile, H, E, saved boundary states, node maxima) is
  int16: paragraph's scoring (match=1) bounds every score by the padded
  read length M << 2^15, so int16 is exact, and the VPU processes two
  int16 elements per 32-bit lane.
- End-cell tracking keeps per-cell (best score, first strictly-attaining
  event-local column) int16 registers updated with one compare + two
  selects per column, instead of building the packed int32 word per
  column; the packed word (score | inv col | inv row) is materialized
  once after the column loop, preserving the exact gssw tie-break order.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_sw import pack_bits

_BIG16 = np.int16(2 ** 14)


def _shift_down16(x, amt, fill, jj):
    rolled = pltpu.roll(x, amt, axis=0)
    return jnp.where(jj >= amt, rolled, fill)


def _make_kernel16(L: int, N: int, P: int, M: int, TB: int,
                   gap_open: int, gap_extend: int,
                   match: int, mismatch: int):
    dt = jnp.int16
    bits = pack_bits(L, M, match)
    assert bits is not None
    col_bits, j_bits = bits
    s1 = col_bits + j_bits
    lmask = (1 << col_bits) - 1
    jmask = (1 << j_bits) - 1

    log_steps = []
    s = 1
    while s < M:
        log_steps.append(s)
        s *= 2

    def kernel(ref_codes_ref, col_node_ref, col_in_node_ref, start_ref,
               last_ref, pred_ref,
               read_codes_ref, read_lens_ref, read_vlens_ref,
               score_ref, end_col_ref, end_read_ref, multi_ref,
               prof_ref, h_ref, e_ref, saved_h_ref, saved_e_ref,
               node_run_ref, node_max_ref, best_h_ref, best_col_ref):

        gapO = dt(gap_open)
        gapE = dt(gap_extend)

        codes = read_codes_ref[:]  # [M, TB] int32
        lens = read_lens_ref[:]  # [1, TB] int32
        vlens = read_vlens_ref[:]

        for c in range(4):
            prof_ref[c] = jnp.where(
                codes == c, dt(match),
                jnp.where(codes < 4, dt(-mismatch), dt(0)))
        prof_ref[4] = jnp.zeros((M, TB), dt)

        jj32 = jax.lax.broadcasted_iota(jnp.int32, (M, TB), 0)
        jj = jj32.astype(dt)
        stripe_mask = jj32 < vlens
        real_mask = jj32 < lens
        gterm = jj * gapE
        jterm32 = jnp.int32(jmask) - jj32

        h_ref[:] = jnp.zeros((M, TB), dt)
        e_ref[:] = jnp.zeros((M, TB), dt)
        saved_h_ref[:] = jnp.zeros((N + 1, M, TB), dt)
        saved_e_ref[:] = jnp.zeros((N + 1, M, TB), dt)
        node_max_ref[:] = jnp.zeros((N, 1, TB), jnp.int32)
        best_h_ref[:] = jnp.zeros((M, TB), dt)
        best_col_ref[:] = jnp.zeros((M, TB), dt)

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
            diag = _shift_down16(h_prev, 1, dt(0), jj)
            hp = jnp.maximum(diag + prof, dt(0))
            hp = jnp.maximum(hp, e_col)
            g = hp - gapO + gterm + gapE
            for s_amt in log_steps:
                g = jnp.maximum(g, _shift_down16(g, s_amt, -_BIG16, jj))
            f = jnp.maximum(_shift_down16(g, 1, -_BIG16, jj) - gterm, dt(0))
            h = jnp.maximum(hp, f)
            e_next = jnp.maximum(jnp.maximum(e_col - gapE, h - gapO), dt(0))
            h_ref[:] = h
            e_ref[:] = e_next
            node_run_ref[:] = jnp.maximum(node_run_ref[:], h)

            improved = h > best_h_ref[:]
            best_h_ref[:] = jnp.maximum(best_h_ref[:], h)
            best_col_ref[:] = jnp.where(
                improved, jnp.broadcast_to(i.astype(dt), (M, TB)),
                best_col_ref[:])

            @pl.when(is_last)
            def _():
                saved_h_ref[nid] = h
                saved_e_ref[nid] = e_next
                # int16 reductions are not implemented by Mosaic; widen
                # (once per node, not per column)
                node_max_ref[nid] = jnp.max(
                    jnp.where(real_mask, node_run_ref[:], dt(0))
                    .astype(jnp.int32), axis=0, keepdims=True)

            return 0

        jax.lax.fori_loop(0, L, col_body, 0)

        # materialize the packed tie-break word once, post-loop
        bh = best_h_ref[:].astype(jnp.int32)
        bc = best_col_ref[:].astype(jnp.int32)
        packed = (bh << s1) + ((jnp.int32(lmask) - bc) << j_bits) + jterm32
        packed = jnp.where(stripe_mask, packed, 0)
        final = jnp.max(packed, axis=0, keepdims=True)  # [1, TB]
        cur_max = final >> s1
        end_col = jnp.int32(lmask) - ((final >> j_bits) & lmask)
        first_j = jnp.int32(jmask) - (final & jmask)

        top = jnp.broadcast_to(cur_max, (N, 1, TB))
        n_top = jnp.sum((node_max_ref[:] == top).astype(jnp.int32),
                        axis=0)
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
def pallas_fill16(ref_codes, col_node, col_in_node, is_start, is_last,
                  pred_table, read_codes_t, read_lens, read_vlens,
                  L: int, N: int, P: int, M: int, TB: int,
                  gap_open: int = 6, gap_extend: int = 1, match: int = 1,
                  mismatch: int = 4, interpret: bool = False):
    B = read_codes_t.shape[1]
    assert B % TB == 0
    read_codes_t = read_codes_t.astype(jnp.int32)
    kernel = _make_kernel16(L, N, P, M, TB, gap_open, gap_extend, match,
                            mismatch)
    dt = jnp.int16
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
            pltpu.VMEM((5, M, TB), dt),  # profile
            pltpu.VMEM((M, TB), dt),  # H
            pltpu.VMEM((M, TB), dt),  # E
            pltpu.VMEM((N + 1, M, TB), dt),  # saved H
            pltpu.VMEM((N + 1, M, TB), dt),  # saved E
            pltpu.VMEM((M, TB), dt),  # per-node running max
            pltpu.VMEM((N, 1, TB), jnp.int32),  # node max
            pltpu.VMEM((M, TB), dt),  # best H
            pltpu.VMEM((M, TB), dt),  # best col
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
    return jnp.concatenate(outs, axis=0)
