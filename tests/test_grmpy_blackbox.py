"""Blackbox grmpy test on the reference's chrX 2-sample data.

Port of test-blackbox/test_grm.cpp: male (haploid) + female (diploid)
genotyping on the chrX swap graph must call REF / REF,REF.
"""
import json
import os

import pytest

from paragraph_tpu.genotyping.sample_info import load_manifest
from paragraph_tpu.io.bam import BamReader
from paragraph_tpu.pipeline.grmpy import (GrmpyParameters,
                                          align_single_sample,
                                          count_and_genotype)

LD = "/root/reference/share/test-data/paragraph/long-del"


def test_genotypes_single_swap_chrx(monkeypatch):
    # the manifest's BAM paths are relative to the reference checkout root
    monkeypatch.chdir("/root/reference")
    graph = json.load(open(os.path.join(LD, "chrX_graph_typing.2sample.json")))
    reference = os.path.join(LD, "chrX_graph_typing.fa")
    manifest = load_manifest(os.path.join(LD, "chrX_graph_typing.manifest"))
    gt_params = json.load(open(os.path.join(LD, "param.json")))

    parameters = GrmpyParameters()
    for sample in manifest:
        reader = BamReader(sample.filename, sample.index_filename, reference)
        align_single_sample(parameters, graph, reference, reader, sample)

    result = count_and_genotype(graph, reference, gt_params, manifest)
    assert result["samples"]["SAMPLE1"]["gt"]["GT"] == "REF"
    assert result["samples"]["SAMPLE2"]["gt"]["GT"] == "REF/REF"


def test_threaded_alignment_deterministic(monkeypatch):
    """Port of test-blackbox/test_multithreading.cpp's intent: the aligned
    output (counts, statistics, per-read fields) must be identical however
    many workers the aligner fans out over."""
    monkeypatch.chdir("/root/reference")
    graph = json.load(open(os.path.join(LD, "chrX_graph_typing.2sample.json")))
    reference = os.path.join(LD, "chrX_graph_typing.fa")
    manifest = load_manifest(os.path.join(LD, "chrX_graph_typing.manifest"))

    results = []
    for threads in (1, 4):
        parameters = GrmpyParameters(threads=threads)
        out = {}
        for sample in manifest:
            reader = BamReader(sample.filename, sample.index_filename,
                               reference)
            align_single_sample(parameters, graph, reference, reader, sample)
            out[sample.sample_name] = sample.alignment_data
        results.append(json.dumps(out, sort_keys=True))
    assert results[0] == results[1]
