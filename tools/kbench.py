#!/usr/bin/env python3
"""Kernel-only microbenchmark + ablation harness for the multi-event
graph-SW Pallas kernel (ops/multi_sw.py).

Separates TRUE kernel device time from dispatch/tunnel overhead:
the tables for one production-shaped dispatch are built once and placed
on device, then paired_pallas_fill is invoked `iters` times back-to-back
with one final block — per-call time approaches pure kernel time because
XLA queues the launches.

Usage:
  python tools/kbench.py                # baseline timing
  python tools/kbench.py --profile DIR  # also dump a jax.profiler trace
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(n_reads=8192, read_len=150, seed=7):
    import bench as bench_mod

    g, reads = bench_mod.build_case(read_len=read_len, n_reads=n_reads,
                                    seed=seed)
    from paragraph_tpu.ops.multi_sw import PairedGraphSW

    sw = PairedGraphSW([g])
    return sw, reads


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--reads", type=int, default=8192)
    ap.add_argument("--profile", default=None)
    args = ap.parse_args()

    import jax

    from paragraph_tpu.ops.multi_sw import (
        build_pair_tables, paired_pallas_fill, pair_tiles, TILE_BUDGET,
        M_FLOOR, _pow2_at_least, _bucket)

    sw, reads = build(n_reads=args.reads)
    a = sw.chunk_arrays[0]
    tb = sw.tile_batch
    max_len = max(len(r) for r in reads)
    pad_to = max(M_FLOOR, _bucket(max_len, 32))
    tiles_raw = pair_tiles(len(reads), tb)
    tiles_to = _pow2_at_least(tiles_raw, TILE_BUDGET)
    t = build_pair_tables(a, [reads], tb, pad_to, tiles_to=tiles_to,
                          bases_to=tiles_to * tb // 4, l_ev_floor=sw.l_ev)
    dev = sw._chunk_dev[0]
    tables = jax.device_put((
        t["tile_col_start"], t["tile_col_len"], t["tile_event"],
        t["codes_t"], t["lens"], t["vlens"], t["col_idx"], t["flip"],
        t["comp"]))
    kw = dict(L=len(a.ref_codes), L_ev=t["l_ev"], N=a.n_max, P=a.p_max,
              M=t["m"], TB=tb, interpret=sw.interpret)

    def once():
        return paired_pallas_fill(*dev, *tables, **kw)

    # warmup / compile
    out = once()
    out.block_until_ready()

    # issued cells for this dispatch (pad columns have clen=0)
    cells = int(t["tile_col_len"].astype(np.int64).sum()) * tb * t["m"]
    n_tiles = len(t["tile_event"])
    print(f"tiles={n_tiles} M={t['m']} TB={tb} L={kw['L']} "
          f"L_ev={kw['L_ev']} N={kw['N']} P={kw['P']} "
          f"cells/dispatch={cells:.3e}", file=sys.stderr)

    # single-dispatch latency (includes per-dispatch host+tunnel cost)
    lat = []
    for _ in range(5):
        t0 = time.perf_counter()
        once().block_until_ready()
        lat.append(time.perf_counter() - t0)

    # queued back-to-back: amortizes dispatch latency -> ~kernel time
    t0 = time.perf_counter()
    outs = [once() for _ in range(args.iters)]
    for o in outs:
        o.block_until_ready()
    queued = (time.perf_counter() - t0) / args.iters

    if args.profile:
        with jax.profiler.trace(args.profile):
            outs = [once() for _ in range(3)]
            for o in outs:
                o.block_until_ready()

    res = {
        "single_dispatch_s": min(lat),
        "queued_per_dispatch_s": queued,
        "cells": cells,
        "gcells_single": cells / min(lat) / 1e9,
        "gcells_queued": cells / queued / 1e9,
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
