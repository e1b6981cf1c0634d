"""End-to-end round-trip test: candidates.vcf + 2 BAMs → genotypes VCF.

The output records must match the reference's committed oracle
(share/test-data/round-trip-genotyping/expected-vcf-record.txt) exactly.
"""
import gzip
import os

import pytest

from paragraph_tpu.pipeline.multigrmpy import MultigrmpyOptions, run

RT = "/root/reference/share/test-data/round-trip-genotyping"


@pytest.fixture(scope="module")
def pipeline_output(tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("roundtrip"))
    options = MultigrmpyOptions(
        input=os.path.join(RT, "candidates.vcf"),
        manifest=os.path.join(RT, "samples.txt"),
        reference=os.path.join(RT, "dummy.fa"),
        output=out_dir,
        max_ref_node_length=1000,
    )
    return run(options), out_dir


def _read_vcf_body(path):
    with gzip.open(path, "rt") as f:
        return [l.rstrip("\n") for l in f if not l.startswith("##")]


def test_expected_vcf_records(pipeline_output):
    result, out_dir = pipeline_output
    lines = _read_vcf_body(result["genotypes_vcf"])
    with open(os.path.join(RT, "expected-vcf-record.txt")) as f:
        expected = [l.rstrip("\n") for l in f if l.strip()]
    assert lines == expected


def test_genotypes_json_gts(pipeline_output):
    """GT assertions from the reference's test_multigrmpy.py:100-110."""
    import json

    result, out_dir = pipeline_output
    with gzip.open(result["genotypes_json"], "rt") as f:
        observed = json.load(f)
    assert len(observed) == 2
    by_idx = {i: item for i, item in enumerate(observed)}
    # event 1 = test-ins: sample1 hom-alt, sample2 no-call
    # event 2 = test-del: sample2 hom-alt, sample1 no-call
    ins, dele = by_idx[0], by_idx[1]
    assert ins["samples"]["sample1"]["gt"]["GT"].count("/") == 1
    assert ins["samples"]["sample2"]["gt"]["GT"] == "."
    assert dele["samples"]["sample1"]["gt"]["GT"] == "."
    assert dele["samples"]["sample2"]["gt"]["GT"].count("/") == 1
