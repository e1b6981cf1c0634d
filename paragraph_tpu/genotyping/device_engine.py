"""Population-scale device genotyping: all events, one mesh dispatch.

The float64 engines (breakpoint_genotyper.py scalar, vectorized.py
batch) genotype one event at a time on the host for bit parity with the
reference (BreakpointGenotyper.cpp). This engine instead gathers every
(event × sample × breakpoint) job of a whole grmpy run, groups jobs by
model signature (allele count / ploidy / rate tables), and evaluates
each group in ONE sharded float32 device step
(parallel/mesh.py::sharded_population_genotyping) — the pod-scale path
SURVEY.md §2.3 calls for. GL values agree with the float64 engine to
float32 tolerance (tests/test_population_genotyping.py measures the
bound); GT/GQ/filters agree except within that tolerance of decision
boundaries.

Selected with ``grmpy --genotyping-engine device`` (pipeline/grmpy.py).
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from .batched import model_from_parameters
from .genotype import Genotype

_PAD = object()


def _genotype_from_row(out, i, gts) -> Genotype:
    g = Genotype()
    if bool(out["no_reads"][i]):
        g.filters.add("NO_READS")
        return g
    g.gt = list(gts[int(out["best_gt"][i])])
    g.gl_name = [tuple(gv) for gv in gts]
    g.gl = [float(x) for x in out["gl"][i]]
    g.gq = int(out["gq"][i])
    g.num_reads = int(out["num_reads"][i])
    g.allele_fractions = [float(x) for x in out["allele_fractions"][i]]
    g.coverage_test_pvalue = float(out["coverage_test_pvalue"][i])
    if bool(out["gq_filter"][i]):
        g.filters.add("GQ")
    if bool(out["bp_depth"][i]):
        g.filters.add("BP_DEPTH")
    return g


def _model_signature(param) -> tuple:
    return (param.num_alleles, param.ploidy,
            tuple(param.allele_error_rates),
            param.other_allele_error_rate,
            tuple(param.het_haplotype_fractions),
            param.other_het_haplotype_fraction,
            tuple(sorted((tuple(k), v)
                         for k, v in param.genotype_fractions.items())),
            param.min_pass_gq)


def genotype_events_on_device(genotypers: List, mesh=None) -> None:
    """Genotype every event in `genotypers` (GraphBreakpointGenotyper
    instances with alignments added and parameters set) through the
    sharded device model, installing results back into each genotyper.
    """
    from ..parallel.mesh import make_mesh, sharded_population_genotyping

    if mesh is None:
        mesh = make_mesh()
    n_shards = mesh.devices.size

    # (model signature) -> [(event_idx, job)], plus the group's param
    groups: Dict[tuple, dict] = {}
    for ei, gtr in enumerate(genotypers):
        for job in gtr.collect_jobs():
            is_male = job[4]
            param = (gtr.p_male_genotype_parameter if is_male
                     else gtr.p_genotype_parameter)
            key = _model_signature(param)
            grp = groups.setdefault(key, {"param": param, "jobs": []})
            grp["jobs"].append((ei, job))

    per_event: List[Dict[tuple, Genotype]] = [dict() for _ in genotypers]
    for grp in groups.values():
        param = grp["param"]
        jobs = grp["jobs"]
        model = model_from_parameters(param)
        n = len(jobs)
        n_pad = -(-n // n_shards) * n_shards
        pad = n_pad - n

        counts = np.zeros((n_pad, param.num_alleles), np.int32)
        depth = np.ones(n_pad, np.float32)
        rlen = np.full(n_pad, 100.0, np.float32)
        dsd = np.ones(n_pad, np.float32)
        poisson = np.zeros(n_pad, bool)
        for k, (_, (_, _, bp, cnt, _)) in enumerate(jobs):
            counts[k] = cnt
            depth[k] = bp.read_depth
            rlen[k] = bp.read_length
            dsd[k] = bp.depth_sd
            poisson[k] = bp.use_poisson_depth
        out = sharded_population_genotyping(
            mesh, counts, depth, rlen, dsd, poisson, model,
            min_pass_gq=param.min_pass_gq)
        for k, (ei, (samplename, bp_name, _, _, _)) in enumerate(jobs):
            per_event[ei][(samplename, bp_name)] = _genotype_from_row(
                out, k, model["gts"])
        del pad  # padding rows are simply never read back

    for gtr, results in zip(genotypers, per_event):
        gtr.install_genotypes(results)
