"""Device-mesh sharding for pod-scale genotyping.

The reference is single-node (thread pools over graphs and samples,
SURVEY.md §2.3); the TPU-native distribution axes are:

- reads   → data-parallel across devices (ICI): the batched graph-SW fill
  shards its batch dimension; per-edge read counts merge with psum.
- events  → sharded across hosts/devices: the vectorized genotyping model
  shards its event dimension.

This module wires both into one jitted "full step" over a
``jax.sharding.Mesh`` so the pipeline scales to a pod slice without code
changes (XLA inserts the collectives).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..utils.jaxcfg import configure as _jax_configure
_jax_configure()

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..genotyping.batched import batched_genotype_likelihoods
from ..ops.batched_sw import _batched_fill


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def sharded_full_step(mesh: Mesh, graph_arrays, read_codes, read_lens,
                      read_vlens, counts, depth, read_length, model,
                      axis_name: str = "data"):
    """One fully-sharded device step: batched graph-SW scoring of a read
    batch (sharded over reads) + genotype likelihoods (sharded over
    events), with per-edge count merging across shards via psum.

    Returns (score, end_node, end_ref, end_read, multi, gl, best_gt, gq).
    """
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(axis_name))

    def place(x, sharding):
        return jax.device_put(jnp.asarray(x), sharding)

    a = graph_arrays
    graph_in = tuple(
        place(x, repl) for x in (a.ref_codes, a.col_node, a.col_in_node,
                                 a.is_start, a.is_last, a.pred_table))
    reads_in = (
        place(read_codes, NamedSharding(mesh, P(axis_name, None))),
        place(read_lens, batch_sh),
        place(read_vlens, batch_sh),
    )

    @jax.jit
    def step(graph_in, reads_in, counts, depth, read_length):
        score, end_node, end_ref, end_read, multi, _node_max = _batched_fill(
            *graph_in, *reads_in, num_nodes=a.num_nodes)
        gl, best, gq = batched_genotype_likelihoods(
            counts, depth, read_length, model["gt_ploidy"],
            model["error_rates"], model["het_fractions"],
            model["log_priors"])
        return score, end_node, end_ref, end_read, multi, gl, best, gq

    counts_in = place(counts, NamedSharding(mesh, P(axis_name, None)))
    depth_in = place(depth, batch_sh)
    rl_in = place(read_length, batch_sh)
    return step(graph_in, reads_in, counts_in, depth_in, rl_in)


def merged_edge_counts(mesh: Mesh, local_support, axis_name: str = "data"):
    """Merge per-shard edge-support counts with an explicit psum
    (the reference's population-scale merge is `bcftools merge` of
    independent jobs, README.md:111-117; on a pod slice it is a single
    collective over ICI).

    local_support: [B, E] 0/1 fragment-supports-edge indicators sharded
    over reads; returns the global per-edge counts [E] replicated.
    """
    from jax.experimental.shard_map import shard_map

    @jax.jit
    def merge(sup):
        def local(sup_block):
            return jax.lax.psum(
                jnp.sum(sup_block, axis=0, dtype=jnp.int32), axis_name)

        return shard_map(
            local, mesh=mesh,
            in_specs=P(axis_name, None), out_specs=P())(sup)

    return merge(jax.device_put(
        jnp.asarray(local_support),
        NamedSharding(mesh, P(axis_name, None))))
