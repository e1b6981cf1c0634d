"""Structural validation of graph and paragraph-output JSON.

Functional counterpart of the reference's JSON-Schema checks
(share/schema/input_schema.json, output_schema.json + schema_check.py):
validates the invariants the pipeline depends on and raises with a
readable path on violation.
"""
from __future__ import annotations

from typing import List


class SchemaError(ValueError):
    pass


def _require(cond: bool, path: str, msg: str):
    if not cond:
        raise SchemaError(f"{path}: {msg}")


def validate_graph_json(desc: dict, path: str = "graph") -> None:
    """Validate a paragraph graph description (input schema)."""
    if "graph" in desc:
        desc = {**desc, **desc["graph"]}
    _require(isinstance(desc.get("nodes"), list), path + ".nodes",
             "must be a list")
    names = set()
    n_nodes = len(desc["nodes"])
    for i, node in enumerate(desc["nodes"]):
        p = f"{path}.nodes[{i}]"
        _require(isinstance(node, dict), p, "must be an object")
        name = node.get("name", f"node-{i + 1}")
        _require(name not in names, p, f"duplicate node name {name}")
        names.add(name)
        is_source_or_sink = (
            i in (0, n_nodes - 1)
            and str(name).upper() in ("SOURCE", "SINK"))
        _require(
            "sequence" in node or "reference" in node or is_source_or_sink,
            p, "needs sequence or reference")
        if "sequence" in node:
            _require(isinstance(node["sequence"], str), p + ".sequence",
                     "must be a string")
    edges = desc.get("edges") or []
    order = {n.get("name", f"node-{i + 1}"): i
             for i, n in enumerate(desc["nodes"])}
    for i, edge in enumerate(edges):
        p = f"{path}.edges[{i}]"
        _require("from" in edge and "to" in edge, p, "needs from/to")
        _require(edge["from"] in names, p, f"unknown node {edge['from']}")
        _require(edge["to"] in names, p, f"unknown node {edge['to']}")
        _require(order[edge["from"]] < order[edge["to"]], p,
                 "edges must be topological (from-index < to-index)")
        if "sequences" in edge:
            _require(isinstance(edge["sequences"], list), p + ".sequences",
                     "must be a list")
    for i, pth in enumerate(desc.get("paths") or []):
        p = f"{path}.paths[{i}]"
        _require(isinstance(pth.get("nodes"), list), p + ".nodes",
                 "must be a list")
        for n in pth["nodes"]:
            _require(n in names, p, f"unknown node {n}")
    if "target_regions" in desc:
        _require(isinstance(desc["target_regions"], list),
                 path + ".target_regions", "must be a list")


def validate_paragraph_output(output: dict, path: str = "output") -> None:
    """Validate the per-sample paragraph output (output schema subset)."""
    for key in ("nodes", "edges"):
        _require(key in output, path, f"missing {key}")
    for key in ("read_counts_by_node", "read_counts_by_edge",
                "read_counts_by_sequence"):
        if key in output:
            _require(isinstance(output[key], dict), f"{path}.{key}",
                     "must be an object")
            for k, v in output[key].items():
                if key != "read_counts_by_sequence":
                    _require(isinstance(v, int), f"{path}.{key}.{k}",
                             "counts must be integers")
    if "alignment_statistics" in output:
        _require(isinstance(output["alignment_statistics"], dict),
                 path + ".alignment_statistics", "must be an object")
