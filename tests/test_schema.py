"""JSON-Schema enforcement (paragraph_tpu/schema/*.json, the framework's
counterpart of the reference's share/schema/ + schema_check.py):
round-trip pipeline artifacts must validate, and violations must raise
SchemaError carrying the JSON path of the offending value.
"""
import copy
import gzip
import json
import os

import pytest

from paragraph_tpu.utils.schema import (SchemaError, validate,
                                        validate_graph_input)

RT = "/root/reference/share/test-data/round-trip-genotyping"


@pytest.fixture(scope="module")
def validated_run(tmp_path_factory):
    """Full round-trip run WITH schema enforcement on."""
    from paragraph_tpu.pipeline.multigrmpy import MultigrmpyOptions, run

    out_dir = str(tmp_path_factory.mktemp("schema_rt"))
    result = run(MultigrmpyOptions(
        input=os.path.join(RT, "candidates.vcf"),
        manifest=os.path.join(RT, "samples.txt"),
        reference=os.path.join(RT, "dummy.fa"),
        output=out_dir,
        max_ref_node_length=1000,
        validate_schemas=True,
    ))
    return result


def test_roundtrip_validates_end_to_end(validated_run):
    with gzip.open(validated_run["genotypes_json"], "rt") as f:
        records = json.load(f)
    assert len(records) == 2
    for rec in records:
        validate(rec, "genotypes")


def test_graph_input_violation_has_path(validated_run):
    from paragraph_tpu.pipeline.multigrmpy import (MultigrmpyOptions,
                                                   load_graph_description)

    opts = MultigrmpyOptions(
        input=os.path.join(RT, "candidates.vcf"),
        reference=os.path.join(RT, "dummy.fa"),
        output="/tmp/schema_viol_probe",
        max_ref_node_length=1000,
    )
    (graph, *_rest) = load_graph_description(opts)
    root = dict(graph)
    root.update(root.pop("graph", {}))
    validate_graph_input(root)  # sanity: valid as produced

    bad = copy.deepcopy(root)
    bad["nodes"][1]["sequence"] = "ACGT!!"
    with pytest.raises(SchemaError) as ei:
        validate_graph_input(bad)
    assert "$.nodes[1].sequence" in str(ei.value)

    bad = copy.deepcopy(root)
    del bad["edges"][0]["to"]
    with pytest.raises(SchemaError) as ei:
        validate_graph_input(bad)
    assert "$.edges[0]" in str(ei.value)

    bad = copy.deepcopy(root)
    bad["target_regions"] = ["chr1"]
    with pytest.raises(SchemaError) as ei:
        validate_graph_input(bad)
    assert "$.target_regions[0]" in str(ei.value)


def test_genotypes_violation_has_path(validated_run):
    with gzip.open(validated_run["genotypes_json"], "rt") as f:
        rec = json.load(f)[0]
    bad = copy.deepcopy(rec)
    bad["samples"]["sample1"]["gt"]["GQ"] = 101
    with pytest.raises(SchemaError) as ei:
        validate(bad, "genotypes")
    assert "$.samples.sample1.gt.GQ" in str(ei.value)

    bad = copy.deepcopy(rec)
    bad["samples"]["sample1"]["gt"]["filters"] = ["NOT_A_FILTER"]
    with pytest.raises(SchemaError):
        validate(bad, "genotypes")


def test_output_schema_on_paragraph_output():
    """cmd_paragraph-shaped output validates; count corruption raises."""
    out = {
        "model_name": "test",
        "nodes": [{"name": "n1", "sequence": "ACGT"}],
        "edges": [],
        "read_counts_by_node": {"n1": 7, "n1:READS": 7},
        "alignment_statistics": {"bad_alignment_pct": 0.0,
                                 "engine": "pallas"},
    }
    validate(out, "output")
    bad = copy.deepcopy(out)
    bad["read_counts_by_node"]["n1"] = -1
    with pytest.raises(SchemaError) as ei:
        validate(bad, "output")
    assert "$.read_counts_by_node.n1" in str(ei.value)
    bad = copy.deepcopy(out)
    bad["alignment_statistics"]["engine"] = "cuda"
    with pytest.raises(SchemaError):
        validate(bad, "output")
