"""Multi-event batched graph-SW: many graphs, one kernel dispatch.

The production workload is thousands of small SV graphs, each with its own
read set (SURVEY.md §2.3: the reference farms them over a thread pool).
Dispatching one Pallas call per event would pay the host→device round trip
per event; this kernel concatenates all events' graph columns into one
stream and assigns each grid program a (read-tile, event) pair: the
program walks only its event's column range (scalar-prefetched offsets)
with its DP state in VMEM. One launch scores an entire event batch.

Node ids are event-local, so the boundary-state scratch stays
[N_max+1, M, TB]; predecessor tables stack per event.

The column-loop body follows ops/pallas_sw.py's DP formulation
(register-level sublane rolls for the diagonal shift and F prefix scan,
packed (score | column | read-row) end tracking) but collapses the
tracking state to (1, TB) per-column row reductions — see
_make_kernel's docstring and docs/ROOFLINE.md for why that is the
op-minimal shape at the VPU issue ceiling.
"""
from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import numpy as np

from ..utils.jaxcfg import configure as _jax_configure
_jax_configure()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..graph.model import SequenceGraph
from .batched_sw import GraphArrays, encode_blob, encode_reads
from .pallas_sw import _shift_down, pack_bits

_BIG = np.int32(2 ** 30)
DEFAULT_TB = 128

# Shape-stability budgets: every production dispatch is padded to these,
# so one compiled kernel serves the whole run (and, with the persistent
# compile cache, every future run). Padding is cheap: pad tiles carry
# clen=0 (their column loop never executes), pad events get all-zero-state
# predecessor tables, and pad columns/bases are plain memory. Through the
# axon tunnel a fresh Mosaic compile costs ~100s, so per-chunk shape drift
# (the round-2 behaviour) multiplied that into minutes of apparent
# "device time" on multi-event runs.
TILE_BUDGET = 256          # grid size per launch (bench-validated)
PAIR_BUDGET = 48           # pairs per chunk -> pred_tables E = 96 fixed
L_EV_FLOOR = 2048          # packed end-tracking column-bit budget
M_FLOOR = 160              # read-length stripe floor (150bp + bucket)


def _bucket(x: int, m: int) -> int:
    return -(x // -m) * m


def _pow2_at_least(x: int, floor: int) -> int:
    v = max(1, floor)
    while v < x:
        v *= 2
    return v


def _auto_interpret(interpret: bool) -> bool:
    """Pallas on the CPU backend only runs in interpret mode; auto-detect
    so the CPU test mesh exercises the same code path instead of tripping
    the device-failure fallback."""
    if interpret:
        return True
    import jax

    return jax.devices()[0].platform == "cpu"


class MultiGraphArrays:
    """Concatenated device arrays for a batch of graphs."""

    def __init__(self, graphs: Sequence[SequenceGraph],
                 prebuilt: Sequence[GraphArrays] = None,
                 n_max: int = 0, p_max: int = 0,
                 l_to: int = 0, e_to: int = 0):
        arrays = list(prebuilt) if prebuilt is not None else \
            [GraphArrays.build(g) for g in graphs]
        self.per_event = arrays
        self.n_max = max(n_max, max(a.num_nodes for a in arrays))
        self.p_max = max(p_max, max(a.pred_table.shape[1] for a in arrays))
        self.col_len = [len(a.ref_codes) for a in arrays]
        ends = np.cumsum([0] + self.col_len)
        self.col_start = ends[:-1].tolist()
        l_real = int(ends[-1])
        # pad column stream to a bucketed length for compile reuse; pad
        # the event axis with all-zero-state predecessor tables so
        # pred_tables keeps one shape regardless of chunk occupancy
        l_bucket = max(_bucket(max(1, l_real), 1024), l_to)
        e_total = max(len(arrays), e_to)

        def cat(parts, dtype, pad_val):
            out = np.full(l_bucket, pad_val, dtype)
            out[:l_real] = np.concatenate(parts)
            return out

        self.ref_codes = cat([a.ref_codes for a in arrays], np.int32, 4)
        self.col_node = cat([a.col_node for a in arrays], np.int32, 0)
        self.col_in_node = cat(
            [a.col_in_node for a in arrays], np.int32, 0)
        self.is_start = cat(
            [a.is_start.astype(np.int32) for a in arrays], np.int32, 0)
        self.is_last = cat(
            [a.is_last.astype(np.int32) for a in arrays], np.int32, 0)
        # one int32 per column for the kernel's scalar-prefetch stream:
        # [ last(16) | start(15) | node id(14:3) | ref code(2:0) ] —
        # SMEM capacity bounds columns/launch, so packing 4 streams into
        # one quadruples the usable column budget (col_in_node stays
        # host-only: the kernel never reads it)
        assert self.n_max < (1 << 12)
        self.packed_cols = (self.ref_codes
                            | (self.col_node << 3)
                            | (self.is_start << 15)
                            | (self.is_last << 16)).astype(np.int32)
        pred_tables = np.full((e_total, self.n_max, self.p_max),
                              self.n_max, np.int32)
        for e, a in enumerate(arrays):
            pt = a.pred_table
            block = pred_tables[e, :pt.shape[0], :pt.shape[1]]
            np.copyto(block, pt)
            # remap each event's zero-state slot to the shared N_max slot
            block[pt == a.num_nodes] = self.n_max
        self.pred_tables = pred_tables  # [E, N_max, P_max]


def _make_kernel(L: int, L_ev: int, N: int, P: int, M: int, TB: int,
                 gap_open: int, gap_extend: int, match: int,
                 mismatch: int):
    """L is the concatenated column-stream length; L_ev bounds any single
    event's column count — the packed end-tracking word stores the
    *event-local* column index so its bit budget is independent of how
    many events share the launch.

    Column-loop structure (round-5 trim; see docs/ROOFLINE.md for the
    measurement story): H/E stay in VMEM refs with pl.when seeding, but
    node/best tracking collapses to (1, TB) refs via per-column row
    reductions instead of running (M, TB) tiles; E drops its zero clamp
    — output-equivalent, because E<=0 never beats the zero-clamped H
    path (hp = max(diag+prof, 0) >= 0 absorbs any negative E) and
    max(e, 0) commutes through both the E recurrence and the
    elementwise-max predecessor seeding; g/f constants fold into
    precomputed row tiles. Verified bit-exact against the round-4
    kernel and the gssw differential suite."""
    dt = jnp.int32
    bits = pack_bits(L_ev, M, match)
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

    def kernel(packed_cols_ref, pred_ref, tile_col_start_ref,
               tile_col_len_ref, tile_event_ref,
               read_codes_ref, read_lens_ref, read_vlens_ref,
               score_ref, end_col_ref, end_read_ref, multi_ref,
               prof_ref, h_ref, e_ref, saved_h_ref, saved_e_ref,
               nodecol_ref, node_max_ref, best_ref):
        t = pl.program_id(0)
        ev = tile_event_ref[t]
        c0 = tile_col_start_ref[t]
        clen = tile_col_len_ref[t]
        gapO = dt(gap_open)
        gapE = dt(gap_extend)
        gOE = dt(gap_open - gap_extend)

        codes = read_codes_ref[:]
        lens = read_lens_ref[:]
        vlens = read_vlens_ref[:]

        for c in range(4):
            prof_ref[c] = jnp.where(
                codes == c, jnp.int32(match),
                jnp.where(codes < 4, jnp.int32(-mismatch), jnp.int32(0)))
        prof_ref[4] = jnp.zeros((M, TB), dt)

        jj = jax.lax.broadcasted_iota(jnp.int32, (M, TB), 0)
        stripe_mask = jj < vlens
        real_mask = jj < lens
        gterm = jj * gapE
        gterm2 = gterm + (gapE - gapO)          # g = hp + gterm2
        # f = max(roll(g,1) - gterm_m, 0): +BIG at row 0 kills the wrap
        gterm_m = jnp.where(jj >= 1, gterm, _BIG)
        jterm = jmask - jj
        # pad-row kill: packed candidates on non-stripe rows go very
        # negative, so no per-column where() is needed
        jterm_m = jnp.where(stripe_mask, jterm, -_BIG)

        h_ref[:] = jnp.zeros((M, TB), dt)
        e_ref[:] = jnp.zeros((M, TB), dt)
        saved_h_ref[:] = jnp.zeros((N + 1, M, TB), dt)
        saved_e_ref[:] = jnp.zeros((N + 1, M, TB), dt)
        nodecol_ref[:] = jnp.zeros((1, TB), dt)
        node_max_ref[:] = jnp.zeros((N, 1, TB), jnp.int32)
        best_ref[:] = jnp.zeros((1, TB), jnp.int32)

        def col_body(i, _):
            packed_col = packed_cols_ref[i]
            ref_c = packed_col & 7
            nid = (packed_col >> 3) & 0xFFF
            is_start = (packed_col & (1 << 15)) != 0
            is_last = (packed_col & (1 << 16)) != 0

            @pl.when(is_start)
            def _():
                sh = saved_h_ref[pred_ref[ev, nid, 0]]
                se = saved_e_ref[pred_ref[ev, nid, 0]]
                for p in range(1, P):
                    sh = jnp.maximum(sh, saved_h_ref[pred_ref[ev, nid, p]])
                    se = jnp.maximum(se, saved_e_ref[pred_ref[ev, nid, p]])
                h_ref[:] = sh
                e_ref[:] = se
                nodecol_ref[:] = jnp.zeros((1, TB), dt)

            prof = prof_ref[ref_c]
            h_prev = h_ref[:]
            e_col = e_ref[:]
            diag = _shift_down(h_prev, 1, dt(0), jj)
            hp = jnp.maximum(diag + prof, dt(0))
            hp = jnp.maximum(hp, e_col)
            g = hp + gterm2
            for s_amt in log_steps:
                g = jnp.maximum(g, _shift_down(g, s_amt, -_BIG, jj))
            f = jnp.maximum(pltpu.roll(g, 1, axis=0) - gterm_m, dt(0))
            h = jnp.maximum(hp, f)
            e_next = jnp.maximum(e_col, h - gOE) - gapE
            h_ref[:] = h
            e_ref[:] = e_next

            packed = (h << s1) + (((lmask - (i - c0)) << j_bits) + jterm_m)
            best_ref[:] = jnp.maximum(
                best_ref[:], jnp.max(packed, axis=0, keepdims=True))
            nodecol_ref[:] = jnp.maximum(nodecol_ref[:], jnp.max(
                jnp.where(real_mask, h, 0), axis=0, keepdims=True))

            @pl.when(is_last)
            def _():
                saved_h_ref[nid] = h
                saved_e_ref[nid] = e_next
                node_max_ref[nid] = nodecol_ref[:]

            return 0

        jax.lax.fori_loop(c0, c0 + clen, col_body, 0)

        final = best_ref[:]                      # [1, TB]
        cur_max = final >> s1
        end_col = c0 + (lmask - ((final >> j_bits) & lmask))
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
         static_argnames=("L", "L_ev", "N", "P", "M", "TB", "gap_open",
                          "gap_extend", "match", "mismatch", "interpret"))
def multi_pallas_fill(packed_cols,
                      pred_tables, tile_col_start, tile_col_len,
                      tile_event, read_codes_t, read_lens, read_vlens,
                      L: int, L_ev: int, N: int, P: int, M: int, TB: int,
                      gap_open: int = 6, gap_extend: int = 1,
                      match: int = 1, mismatch: int = 4,
                      interpret: bool = False):
    B = read_codes_t.shape[1]
    assert B % TB == 0
    read_codes_t = read_codes_t.astype(jnp.int32)  # int8 on the wire
    kernel = _make_kernel(L, L_ev, N, P, M, TB, gap_open, gap_extend,
                          match, mismatch)
    state_dt = jnp.int32
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
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
            pltpu.VMEM((5, M, TB), state_dt),
            pltpu.VMEM((M, TB), state_dt),
            pltpu.VMEM((M, TB), state_dt),
            pltpu.VMEM((N + 1, M, TB), state_dt),
            pltpu.VMEM((N + 1, M, TB), state_dt),
            pltpu.VMEM((1, TB), state_dt),  # per-node column max
            pltpu.VMEM((N, 1, TB), jnp.int32),  # node max (real lanes)
            pltpu.VMEM((1, TB), jnp.int32),  # running packed best
        ],
    )
    out_shape = [jax.ShapeDtypeStruct((1, B), jnp.int32) for _ in range(4)]
    outs = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        interpret=interpret,
    )(packed_cols, pred_tables,
      tile_col_start, tile_col_len, tile_event,
      read_codes_t, read_lens, read_vlens)
    # one [4, B] device buffer so the caller pays a single host fetch
    return jnp.concatenate(outs, axis=0)


@partial(jax.jit,
         static_argnames=("L", "L_ev", "N", "P", "M", "TB", "gap_open",
                          "gap_extend", "match", "mismatch", "interpret"))
def paired_pallas_fill(packed_cols,
                       pred_tables, tile_col_start, tile_col_len,
                       tile_event, base_codes_t, base_lens, base_vlens,
                       col_idx, flip, comp,
                       L: int, L_ev: int, N: int, P: int, M: int, TB: int,
                       gap_open: int = 6, gap_extend: int = 1,
                       match: int = 1, mismatch: int = 4,
                       interpret: bool = False):
    """Multi-event fill with on-device orientation expansion.

    GraphAligner's 4-orientation protocol (fwd + revcomp vs the forward
    graph, their reversals vs the reversed graph) re-scores each read four
    times, but every variant is a deterministic transform of the forward
    read: revcomp = complement(per-read flip), reversal = per-read flip,
    revcomp-reversal = complement. Uploading only the forward codes and
    deriving the variants with one gather + two selects on device cuts the
    host→device transfer and the host encode 4× — both sit on the
    dispatch critical path, while the derivation is negligible next to the
    column loop. The derived arrays are bit-identical to host-encoded
    variants (same row layout, stripe-pad rows included), so kernel
    semantics and gssw parity are untouched.

    base_codes_t: [M, Bb] int8 forward-read codes; col_idx [B] maps each
    output batch column to its base column; flip/comp [1, B] select the
    per-read row reversal / base complement.
    """
    c = base_codes_t.astype(jnp.int32)
    cols = jnp.take(c, col_idx, axis=1)  # [M, B]
    lens = jnp.take(base_lens, col_idx, axis=1)  # [1, B]
    vlens = jnp.take(base_vlens, col_idx, axis=1)
    jj = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
    flip_idx = jnp.where(jj < lens, lens - 1 - jj, jj)  # [M, B]
    flipped = jnp.take_along_axis(cols, flip_idx, axis=0)
    x = jnp.where(flip != 0, flipped, cols)
    x = jnp.where((comp != 0) & (x < 4), 3 - x, x)

    B = x.shape[1]
    assert B % TB == 0
    kernel = _make_kernel(L, L_ev, N, P, M, TB, gap_open, gap_extend,
                          match, mismatch)
    state_dt = jnp.int32
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
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
            pltpu.VMEM((5, M, TB), state_dt),
            pltpu.VMEM((M, TB), state_dt),
            pltpu.VMEM((M, TB), state_dt),
            pltpu.VMEM((N + 1, M, TB), state_dt),
            pltpu.VMEM((N + 1, M, TB), state_dt),
            pltpu.VMEM((1, TB), state_dt),  # per-node column max
            pltpu.VMEM((N, 1, TB), jnp.int32),  # node max (real lanes)
            pltpu.VMEM((1, TB), jnp.int32),  # running packed best
        ],
    )
    out_shape = [jax.ShapeDtypeStruct((1, B), jnp.int32) for _ in range(4)]
    outs = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        interpret=interpret,
    )(packed_cols, pred_tables,
      tile_col_start, tile_col_len, tile_event, x, lens, vlens)
    return jnp.concatenate(outs, axis=0)


def pair_tiles(n: int, tb: int) -> int:
    """Tiles a pair with n reads contributes under the packed layout: two
    blocks (fwd graph, rev graph) of bucket(2n, tb) lanes each."""
    return 2 * (_bucket(2 * n, tb) // tb) if n else 0


def pair_norm(reads) -> Tuple[bytes, np.ndarray]:
    """Normalize one pair's read set to (blob, lens) encoded form.

    Accepts either a list of (mixed-case) read strings or a pre-built
    (upper-case bytes blob, int32 lengths) tuple — the form the
    pipelined orchestrator's extraction workers ship so the parent never
    materialises per-read Python strings on the dispatch critical path."""
    if isinstance(reads, tuple):
        blob, lens = reads
        return blob, np.asarray(lens, np.int32)
    lens = np.fromiter((len(r) for r in reads), np.int32, count=len(reads))
    return "".join(reads).upper().encode(), lens


def pair_count(reads) -> int:
    return len(reads[1]) if isinstance(reads, tuple) else len(reads)


def pair_max_len(reads) -> int:
    if isinstance(reads, tuple):
        lens = reads[1]
        return int(np.max(lens)) if len(lens) else 0
    return max((len(r) for r in reads), default=0)


def build_pair_tables(a: MultiGraphArrays, reads_per_pair, tb: int,
                      pad_to: int = 0, tiles_to: int = 0, bases_to: int = 0,
                      l_ev_floor: int = 0):
    """Host-side table construction for one paired dispatch: read encode,
    orientation expansion tables (col_idx/flip/comp), and per-tile
    (event, column-range) assignments. Shared by the single-device
    PairedGraphSW and the mesh-sharded scorer (parallel/distributed.py),
    which pads tiles_to/bases_to so every shard has identical shapes.

    Lane layout packs the two orientations that walk the same graph into
    shared tiles — [fwd | revcomp] vs the forward graph, [rev | comp] vs
    the reversed graph — since flip/comp selection is per-lane and only
    the event id is per-tile. Padding each pair to tile granularity
    twice (instead of four times, one per orientation) halves the lane
    padding for small read sets.

    Pairs with no reads contribute zero tiles/bases, and pad tiles carry
    clen=0 so their column loop never executes — tile padding costs only
    the per-tile scratch init, not a graph re-scan.
    """
    base_blobs: List[bytes] = []
    base_lens: List[np.ndarray] = []
    n_bases = 0
    col_chunks: List[np.ndarray] = []
    flip_chunks: List[np.ndarray] = []
    comp_chunks: List[np.ndarray] = []
    tile_event: List[int] = []
    tile_col_start: List[int] = []
    tile_col_len: List[int] = []
    layout = []  # (block_offsets[4], n) per pair
    lane_count = 0
    max_len = 1
    for j, reads in enumerate(reads_per_pair):
        n = pair_count(reads)
        if n == 0:
            layout.append(([0, 0, 0, 0], 0))
            continue
        base_off = n_bases
        blob, lens_j = pair_norm(reads)
        base_blobs.append(blob)
        base_lens.append(lens_j)
        n_bases += n
        max_len = max(max_len, int(lens_j.max()))
        lanes = _bucket(2 * n, tb)
        idx = np.arange(base_off, base_off + n, dtype=np.int32)
        lane_cols = np.concatenate(
            [idx, idx, np.full(lanes - 2 * n, base_off, np.int32)])
        offsets = []
        # per-pair blocks: [fwd | revcomp] vs fwd graph, then
        # [rev | comp] vs rev graph; offsets = [o_f, o_rc, o_rev, o_cp]
        for ev_local, (f0, c0), (f1, c1) in (
                (2 * j, (0, 0), (1, 1)), (2 * j + 1, (1, 0), (0, 1))):
            offsets.append(lane_count)
            offsets.append(lane_count + n)
            col_chunks.append(lane_cols)
            fl = np.zeros(lanes, np.int8)
            cp = np.zeros(lanes, np.int8)
            fl[:n] = f0
            fl[n:2 * n] = f1
            cp[:n] = c0
            cp[n:2 * n] = c1
            flip_chunks.append(fl)
            comp_chunks.append(cp)
            tile_event.extend([ev_local] * (lanes // tb))
            tile_col_start.extend([a.col_start[ev_local]] * (lanes // tb))
            tile_col_len.extend([a.col_len[ev_local]] * (lanes // tb))
            lane_count += lanes
        layout.append((offsets, n))
    # bucket tiles (pad tiles are free: clen=0 skips the column loop)
    n_tiles = len(tile_event)
    t_bucket = max(1, tiles_to)
    while t_bucket < n_tiles:
        t_bucket *= 2
    pad_tiles = t_bucket - n_tiles
    if pad_tiles:
        tile_event.extend([0] * pad_tiles)
        tile_col_start.extend([0] * pad_tiles)
        tile_col_len.extend([0] * pad_tiles)
        col_chunks.append(np.zeros(pad_tiles * tb, np.int32))
        flip_chunks.append(np.zeros(pad_tiles * tb, np.int8))
        comp_chunks.append(np.zeros(pad_tiles * tb, np.int8))
    if not n_bases:
        base_blobs.append(b"A")
        base_lens.append(np.ones(1, np.int32))
        n_bases = 1
    if bases_to:
        assert bases_to >= n_bases
        pad_n = bases_to - n_bases
        if pad_n:
            base_blobs.append(b"A" * pad_n)
            base_lens.append(np.ones(pad_n, np.int32))

    pad_to = max(pad_to, _bucket(max_len, 32))
    codes, lens, vlens = encode_blob(
        b"".join(base_blobs), np.concatenate(base_lens), pad_to)
    # lane->base index rides the tunnel every dispatch: int16 halves it
    # (base column counts are int16-safe below 32768)
    col_idx = np.concatenate(col_chunks)
    if codes.shape[0] <= 32767:
        col_idx = col_idx.astype(np.int16)
    l_ev = max(_bucket(max(a.col_len), 256), l_ev_floor)
    assert pack_bits(l_ev, codes.shape[1], 1) is not None
    return {
        "tile_col_start": np.asarray(tile_col_start, np.int32),
        "tile_col_len": np.asarray(tile_col_len, np.int32),
        "tile_event": np.asarray(tile_event, np.int32),
        "codes_t": codes.T.astype(np.int8),
        "lens": lens[None, :].astype(np.int32),
        "vlens": vlens[None, :].astype(np.int32),
        "col_idx": col_idx,
        "flip": np.concatenate(flip_chunks)[None, :],
        "comp": np.concatenate(comp_chunks)[None, :],
        "l_ev": l_ev,
        "m": codes.shape[1],
        "layout": layout,
    }


def slice_pair_outputs(a: MultiGraphArrays, vals: np.ndarray, layout,
                       idxs, results) -> None:
    """Map one fetched [4, B] output block back to per-pair (f_out, r_out)
    5-tuples, resolving global columns to (node, in-node offset)."""
    score, end_col, end_read, multi = vals
    valid = end_col >= 0
    safe_col = np.where(valid, end_col, 0)
    end_node = np.where(valid, a.col_node[safe_col], 0).astype(np.int32)
    end_ref = np.where(valid, a.col_in_node[safe_col], -1).astype(np.int32)
    full = (score, end_node, end_ref, end_read, multi)
    for (offsets, n), p in zip(layout, idxs):
        o_f, o_rc, o_rev, o_cp = offsets
        f_out = tuple(
            np.concatenate([x[o_f:o_f + n], x[o_rc:o_rc + n]])
            for x in full)
        r_out = tuple(
            np.concatenate([x[o_rev:o_rev + n], x[o_cp:o_cp + n]])
            for x in full)
        results[p] = (f_out, r_out)


class PairedGraphSW:
    """Device scorer for the full 4-orientation protocol over an event
    batch: one pair = (graph, its reads); the reversed graph and all read
    orientation variants are derived internally (the variants on device —
    see paired_pallas_fill). Graph column streams and predecessor tables
    are uploaded once at construction and reused by every dispatch.

    score_pairs() returns, per pair, the same two 5-tuples the legacy
    two-batch path produced: f_out for [fwd + revcomp] reads vs the
    forward graph and r_out for their reversals vs the reversed graph.
    """

    # SMEM bounds the per-launch prefetch operands, and the Mosaic
    # allocator's cost is NOT uniform per operand (measured empirically
    # on v5e, 1MB SMEM): the column stream costs ~1x its bytes but the
    # [E, N, P] predecessor table costs ~32x its bytes. __init__ sizes
    # the effective pair and column budgets from that model so every
    # graph-shape combination compiles; with the packed single-int32
    # column stream a 32-event single-sample round fits ONE dispatch —
    # each launch's upload+compute+fetch costs a tunnel round trip.
    COL_BUDGET = 49152
    SMEM_BYTES = 1048576
    PRED_SMEM_FACTOR = 32
    SMEM_SLACK = 65536

    #: VPU-utilization model for engine_report(), calibrated by the
    #: round-5 ablation study (docs/ROOFLINE.md): the int32 column loop
    #: issues ~29 vector-lane ops per DP cell (diagonal roll, profile
    #: add/max, log2(M)-step F prefix scan, E update, packed end
    #: tracking + two (1,TB) row reductions), and the v5e VPU issues ONE
    #: (8,128) vreg op per cycle — peak ≈ 8*128*0.94e9 ≈ 0.96e12
    #: lane-ops/s/core, NOT the 4e12 the round-4 model assumed (no
    #: evidence of multi-ALU issue on v5e: measured cycles/column match
    #: op count × 20 vregs at 1 vreg-op/cycle within 5%). Override via
    #: PARAGRAPH_TPU_VPU_PEAK_OPS.
    OPS_PER_CELL = 29

    def __init__(self, graphs: Sequence[SequenceGraph],
                 tile_batch: int = DEFAULT_TB, interpret: bool = False,
                 col_budget: int = COL_BUDGET):
        #: per-run observability: every dispatch's issued work and the
        #: host-blocking device wait, so production runs surface device
        #: time and cells/s instead of hiding regressions (VERDICT r03)
        self.stats = {"dispatches": 0, "cells": 0, "lanes": 0,
                      "device_wait_s": 0.0, "dispatch_host_s": 0.0}
        built = {}

        def build(g):
            key = id(g)
            if key not in built:
                built[key] = (GraphArrays.build(g),
                              GraphArrays.build(g.reversed()))
            return built[key]

        pair_gas = [build(g) for g in graphs]
        # bucket the static kernel parameters so every chunk of every run
        # with similarly-shaped graphs reuses ONE compiled program
        self.n_max = _bucket(
            max(max(f.num_nodes, r.num_nodes) for f, r in pair_gas), 8)
        self.p_max = _pow2_at_least(
            max(max(f.pred_table.shape[1], r.pred_table.shape[1])
                for f, r in pair_gas), 2)
        self.tile_batch = tile_batch
        self.interpret = _auto_interpret(interpret)
        # pair budget: the predecessor table [E=2*pairs, N, P] is the
        # expensive SMEM operand (PRED_SMEM_FACTOR x its bytes)
        pred_cost = self.PRED_SMEM_FACTOR * 4 * self.n_max * self.p_max
        pair_budget = max(1, min(
            PAIR_BUDGET,
            (self.SMEM_BYTES // 2) // (2 * pred_cost)))
        self.e_uni = 2 * pair_budget
        # column budget: whatever SMEM remains after the pred table
        pred_bytes = (self.PRED_SMEM_FACTOR * 4
                      * self.e_uni * self.n_max * self.p_max)
        col_cap = (self.SMEM_BYTES - pred_bytes - self.SMEM_SLACK) // 4
        col_budget = min(col_budget, max(4096, (col_cap // 1024) * 1024))
        self.chunk_pairs: List[List[int]] = []
        self.chunk_arrays: List[MultiGraphArrays] = []
        cur: List[int] = []
        cur_cols = 0
        for i, (fa, ra) in enumerate(pair_gas):
            cols = len(fa.ref_codes) + len(ra.ref_codes)
            if cur and (cur_cols + cols > col_budget
                        or len(cur) >= pair_budget):
                self.chunk_pairs.append(cur)
                cur, cur_cols = [], 0
            cur.append(i)
            cur_cols += cols
        if cur:
            self.chunk_pairs.append(cur)
        max_chunk_cols = max(
            sum(len(pair_gas[i][0].ref_codes) + len(pair_gas[i][1].ref_codes)
                for i in idxs) for idxs in self.chunk_pairs)
        self.l_uni = _bucket(max(col_budget, max_chunk_cols), 1024)
        self.l_ev = max(L_EV_FLOOR, _bucket(
            max(max(len(f.ref_codes), len(r.ref_codes))
                for f, r in pair_gas), 256))
        self._chunk_dev = []
        for idxs in self.chunk_pairs:
            prebuilt = []
            for i in idxs:
                prebuilt.extend(pair_gas[i])
            a = MultiGraphArrays(None, prebuilt=prebuilt,
                                 n_max=self.n_max, p_max=self.p_max,
                                 l_to=self.l_uni, e_to=self.e_uni)
            self.chunk_arrays.append(a)
            # resident device copies, shipped as ONE batched transfer —
            # through the shared device tunnel every individual upload
            # pays a round trip, so per-array puts cost 6x the RTTs
            self._chunk_dev.append(jax.device_put((
                a.packed_cols, a.pred_tables)))

    def _dispatch(self, chunk_i: int, reads_per_pair, pad_to: int):
        import time as _time

        t_host = _time.perf_counter()
        t0 = t_host
        tb = self.tile_batch
        a = self.chunk_arrays[chunk_i]
        # tile/base budgets: fixed floor, pow2 growth for oversize read
        # sets — at most a handful of distinct compiled shapes ever.
        # Interpret mode has no compile cost, so no floor there.
        tiles_raw = sum(pair_tiles(pair_count(r), tb)
                        for r in reads_per_pair)
        t_floor = 1 if self.interpret else TILE_BUDGET
        tiles_to = _pow2_at_least(tiles_raw, t_floor)
        # the base-codes matrix is the bulk of the per-dispatch transfer
        # ([M, B_b] int8); bucket its row count to the real read total,
        # not to the (much larger) padded lane budget — pad tiles gather
        # base column 0, so any B_b >= n_reads is valid
        n_reads_real = sum(pair_count(r) for r in reads_per_pair)
        b_floor = 1 if self.interpret else 1024
        bases_to = min(_pow2_at_least(n_reads_real, b_floor),
                       tiles_to * tb // 4)
        t = build_pair_tables(a, reads_per_pair, tb, pad_to,
                              tiles_to=tiles_to, bases_to=bases_to,
                              l_ev_floor=self.l_ev)
        self.stats["tables_s"] = self.stats.get("tables_s", 0.0) + (
            _time.perf_counter() - t0)
        t0 = _time.perf_counter()
        dev = self._chunk_dev[chunk_i]
        # one batched transfer for all per-dispatch tables (see __init__)
        tables = jax.device_put((
            t["tile_col_start"], t["tile_col_len"], t["tile_event"],
            t["codes_t"], t["lens"], t["vlens"], t["col_idx"], t["flip"],
            t["comp"]))
        self.stats["put_s"] = self.stats.get("put_s", 0.0) + (
            _time.perf_counter() - t0)
        t0 = _time.perf_counter()
        out = paired_pallas_fill(
            *dev, *tables,
            L=len(a.ref_codes), L_ev=t["l_ev"], N=a.n_max, P=a.p_max,
            M=t["m"], TB=tb, interpret=self.interpret)
        self.stats["call_s"] = self.stats.get("call_s", 0.0) + (
            _time.perf_counter() - t0)
        self.stats["dispatches"] += 1
        self.stats["cells"] += int(
            t["tile_col_len"].astype(np.int64).sum()) * tb * t["m"]
        self.stats["lanes"] += len(t["col_idx"])
        self.stats["dispatch_host_s"] += _time.perf_counter() - t_host
        return out, t["layout"]

    def score_pairs_device(self, reads_per_pair: Sequence[List[str]],
                           pad_to: int = 0):
        """Dispatch all chunks without fetching; callers can keep several
        batches in flight and finalize_pairs() them later."""
        max_len = max((pair_max_len(r) for r in reads_per_pair),
                      default=1)
        m_floor = 32 if self.interpret else M_FLOOR
        pad_to = max(pad_to, m_floor, _bucket(max_len, 32))
        pending = []
        for chunk_i, idxs in enumerate(self.chunk_pairs):
            out, layout = self._dispatch(
                chunk_i, [reads_per_pair[p] for p in idxs], pad_to)
            pending.append((chunk_i, idxs, out, layout))
        return pending, len(reads_per_pair)

    def score_pairs(self, reads_per_pair: Sequence[List[str]],
                    pad_to: int = 0):
        """Returns per pair (f_out, r_out); each is a (score, end_node,
        end_ref, end_read, multi) tuple of np arrays over 2n reads in the
        legacy [fwd + revcomp] / [their reversals] batch order."""
        return self.finalize_pairs(
            self.score_pairs_device(reads_per_pair, pad_to))

    def finalize_pairs(self, handle):
        import time as _time

        pending, n_pairs = handle
        results = [None] * n_pairs
        # one tunnel fetch for ALL chunks when shapes agree (they do
        # whenever every chunk padded to the same tile budget): each
        # per-chunk np.asarray costs a full round trip
        t0 = _time.perf_counter()
        if len(pending) > 1 and len(
                {p[2].shape for p in pending}) == 1:
            stacked = np.asarray(jnp.stack([p[2] for p in pending]))
            vals_list = list(stacked)
        else:
            vals_list = [np.asarray(p[2]) for p in pending]
        self.stats["device_wait_s"] += _time.perf_counter() - t0
        for (chunk_i, idxs, out, layout), vals in zip(pending, vals_list):
            a = self.chunk_arrays[chunk_i]
            slice_pair_outputs(a, vals, layout, idxs, results)
        return results

    def engine_report(self) -> dict:
        """Per-run kernel observability: issued DP cells, host-blocking
        device wait, effective cells/s over that wait, and a VPU
        utilization estimate (OPS_PER_CELL model above). The wait is a
        LOWER bound on device time when finalize overlaps host work, so
        cells_per_wait_s is an upper bound on true kernel throughput."""
        import os as _os

        wait = self.stats["device_wait_s"]
        cells_per_s = self.stats["cells"] / wait if wait > 0 else 0.0
        peak = float(_os.environ.get(
            "PARAGRAPH_TPU_VPU_PEAK_OPS", 0.96e12))
        return {
            **self.stats,
            "cells_per_wait_s": cells_per_s,
            "vpu_util_est": cells_per_s * self.OPS_PER_CELL / peak,
        }


class MultiGraphSW:
    """Score (graph, reads) pairs for a whole event batch in a few
    pipelined launches.

    The concatenated column stream travels via scalar prefetch (SMEM),
    whose capacity bounds how many events one launch can carry — so the
    event batch is partitioned into chunks of ≤ `col_budget` total columns.
    All chunk dispatches are issued before the first host fetch (the
    shared-tunnel round trip costs ~tens of ms), and each chunk's four
    outputs come back as one [4, B] buffer."""

    COL_BUDGET = 12288

    def __init__(self, graphs: Sequence[SequenceGraph],
                 tile_batch: int = DEFAULT_TB, interpret: bool = False,
                 col_budget: int = COL_BUDGET):
        gas = [GraphArrays.build(g) for g in graphs]
        n_max = max(a.num_nodes for a in gas)
        p_max = max(a.pred_table.shape[1] for a in gas)
        self.tile_batch = tile_batch
        self.interpret = _auto_interpret(interpret)
        self.chunk_events: List[List[int]] = []
        self.chunk_arrays: List[MultiGraphArrays] = []
        cur: List[int] = []
        cur_cols = 0
        for i, ga in enumerate(gas):
            cols = len(ga.ref_codes)
            if cur and cur_cols + cols > col_budget:
                self.chunk_events.append(cur)
                cur, cur_cols = [], 0
            cur.append(i)
            cur_cols += cols
        if cur:
            self.chunk_events.append(cur)
        for idxs in self.chunk_events:
            self.chunk_arrays.append(MultiGraphArrays(
                None, prebuilt=[gas[i] for i in idxs],
                n_max=n_max, p_max=p_max))

    def _dispatch(self, a: MultiGraphArrays,
                  reads_per_event: Sequence[List[str]], pad_to: int):
        tb = self.tile_batch
        all_reads: List[str] = []
        tile_event = []
        tile_col_start = []
        tile_col_len = []
        event_slices = []
        max_len = 1
        for ev, reads in enumerate(reads_per_event):
            n = len(reads)
            n_pad = _bucket(max(1, n), tb)
            event_slices.append((len(all_reads), n))
            all_reads.extend(reads)
            all_reads.extend(["A"] * (n_pad - n))
            for _ in range(n_pad // tb):
                tile_event.append(ev)
                tile_col_start.append(a.col_start[ev])
                tile_col_len.append(a.col_len[ev])
            if n:
                max_len = max(max_len, max(len(r) for r in reads))
        # bucket total tiles to powers of two (pad tiles score event 0
        # with dummy reads)
        n_tiles = len(tile_event)
        t_bucket = 1
        while t_bucket < n_tiles:
            t_bucket *= 2
        for _ in range(t_bucket - n_tiles):
            tile_event.append(0)
            tile_col_start.append(a.col_start[0])
            tile_col_len.append(a.col_len[0])
            all_reads.extend(["A"] * tb)

        pad_to = max(pad_to, _bucket(max_len, 32))
        codes, lens, vlens = encode_reads(all_reads, pad_to)
        # event-local column bit budget, bucketed for compile reuse
        l_ev = _bucket(max(a.col_len), 256)
        assert pack_bits(l_ev, codes.shape[1], 1) is not None
        out = multi_pallas_fill(
            jnp.asarray(a.packed_cols), jnp.asarray(a.pred_tables),
            jnp.asarray(np.asarray(tile_col_start, np.int32)),
            jnp.asarray(np.asarray(tile_col_len, np.int32)),
            jnp.asarray(np.asarray(tile_event, np.int32)),
            jnp.asarray(codes.T.astype(np.int8)), jnp.asarray(lens[None, :]),
            jnp.asarray(vlens[None, :]),
            L=len(a.ref_codes), L_ev=l_ev, N=a.n_max, P=a.p_max,
            M=codes.shape[1], TB=tb, interpret=self.interpret)
        return out, event_slices

    def score(self, reads_per_event: Sequence[List[str]], pad_to: int = 0):
        """Returns per-event tuples (score, end_node, end_ref, end_read,
        multi) as numpy arrays."""
        results = [None] * len(reads_per_event)
        pending = []
        for idxs, a in zip(self.chunk_events, self.chunk_arrays):
            out, event_slices = self._dispatch(
                a, [reads_per_event[e] for e in idxs], pad_to)
            pending.append((idxs, a, out, event_slices))
        for idxs, a, out, event_slices in pending:
            vals = np.asarray(out)  # single [4, B] fetch per chunk
            score, end_col, end_read, multi = vals
            valid = end_col >= 0
            safe_col = np.where(valid, end_col, 0)
            end_node = np.where(
                valid, a.col_node[safe_col], 0).astype(np.int32)
            end_ref = np.where(
                valid, a.col_in_node[safe_col], -1).astype(np.int32)
            chunk_out = [score, end_node, end_ref, end_read, multi]
            for (start, n), e in zip(event_slices, idxs):
                results[e] = tuple(x[start:start + n] for x in chunk_out)
        return results
