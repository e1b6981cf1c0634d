"""Multi-host skeleton: 2-process jax.distributed run == serial run.

Two OS processes form a jax.distributed group over localhost (4 virtual
CPU devices each → 8 global), shard a mixed-SV workload's events between
them (parallel/multihost.py), genotype each shard on their local meshes,
and exchange result shards with process_allgather over the coordinator.
Process 0's merged, event-ordered output must equal the single-process
pipeline's byte for byte (modulo the engine marker).
"""
import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tools"))

HERE = os.path.dirname(__file__)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _strip_engine(obj):
    if isinstance(obj, dict):
        return {k: _strip_engine(v) for k, v in obj.items()
                if k != "engine"}
    if isinstance(obj, list):
        return [_strip_engine(v) for v in obj]
    return obj


def test_two_process_distributed_matches_serial(tmp_path):
    from make_workload import generate

    wl = str(tmp_path / "wl")
    generate(wl, n_events=6, depth=20, seed=9)

    port = _free_port()
    out = str(tmp_path / "merged.json")
    worker = os.path.join(HERE, "tools", "multihost_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device count
    procs = [
        subprocess.Popen(
            [sys.executable, worker, f"127.0.0.1:{port}", str(pid), "2",
             wl, out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=800)
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]
    merged = json.load(open(out))

    # serial oracle in-process (the same single-host pipeline)
    from paragraph_tpu.genotyping.sample_info import load_manifest
    from paragraph_tpu.pipeline.grmpy import run_grmpy
    from paragraph_tpu.pipeline.multigrmpy import (MultigrmpyOptions,
                                                   load_graph_description)

    opts = MultigrmpyOptions(
        input=os.path.join(wl, "candidates.vcf"),
        reference=os.path.join(wl, "ref.fa"),
        output=os.path.join(wl, "serial_out"),
        split_type="superloci",
    )
    graphs = load_graph_description(opts)
    manifest = load_manifest(os.path.join(wl, "samples.txt"))
    serial = run_grmpy(graphs, opts.reference, manifest, None)

    assert json.dumps(_strip_engine(merged), sort_keys=True) == \
        json.dumps(_strip_engine(json.loads(json.dumps(serial))),
                   sort_keys=True)
