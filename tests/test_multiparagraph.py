"""Golden blackbox test for the multiparagraph tool.

Port of /root/reference/src/python/test/test_multiparagraph.py: run
multiparagraph on share/test-data/multiparagraph/ (5 template events over
reads.bam + dummy.fa) and compare JSON output to expected.json, ignoring
the same fields the reference test ignores (reference path, commandline,
bam, alignment_statistics).
"""
import json
import os

DATA = "/root/reference/share/test-data/multiparagraph"


def test_multiparagraph_golden(tmp_path):
    from paragraph_tpu.cli.tools import cmd_multiparagraph

    out = str(tmp_path / "out.json")
    rc = cmd_multiparagraph([
        os.path.join(DATA, "candidates.json"),
        "-b", os.path.join(DATA, "reads.bam"),
        "-r", os.path.join(DATA, "dummy.fa"),
        "-o", out,
    ])
    assert rc == 0

    with open(os.path.join(DATA, "expected.json")) as f:
        expected = json.load(f)
    with open(out) as f:
        observed = json.load(f)

    # same normalization as the reference test (test_multiparagraph.py:84-97)
    for x in expected:
        x["graph"].pop("reference", None)
        x.pop("commandline", None)
    for x in observed:
        x["graph"].pop("bam", None)
        x["graph"].pop("reference", None)
        x.pop("commandline", None)
        x["graph"].pop("alignment_statistics", None)

    expected_s = json.dumps(expected, sort_keys=True, indent=4).splitlines()
    observed_s = json.dumps(observed, sort_keys=True, indent=4).splitlines()
    if expected_s != observed_s:
        import difflib
        print("\n".join(difflib.unified_diff(expected_s, observed_s,
                                             "expected", "observed", n=2)))
    assert expected_s == observed_s
