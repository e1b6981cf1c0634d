"""Second end-to-end oracle: genotyping_test_2 (600× swaps, OLD_GT path).

The dataset's expected files were generated with an older pipeline
vintage (graph node naming "REF-1-...", labels "S1"), so the
alignment-statistics-derived AD/ADF/ADR columns are not comparable; the
genotyping outcome columns (GT, OLD_GT, DP, FT, PL) and record identity
must match exactly.
"""
import gzip
import os

import pytest

pytestmark = pytest.mark.slow

from paragraph_tpu.pipeline.multigrmpy import MultigrmpyOptions, run

GT2 = "/root/reference/share/test-data/genotyping_test_2"


@pytest.fixture(scope="module")
def outputs(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("gt2"))
    return run(MultigrmpyOptions(
        input=os.path.join(GT2, "swaps.vcf"),
        manifest=os.path.join(GT2, "samples.txt"),
        reference=os.path.join(GT2, "swaps.fa"),
        output=out,
    ))


def _records(lines):
    out = {}
    for line in lines:
        if line.startswith("#") or not line.strip():
            continue
        f = line.split("\t")
        fmt = f[8].split(":")
        sample = dict(zip(fmt, f[9].split(":")))
        out[(f[0], f[1], f[2])] = {
            "ref": f[3], "alt": f[4], "filter": f[6], "info": f[7],
            "sample": sample,
        }
    return out


def test_swaps_genotypes(outputs):
    mine = _records(
        gzip.open(outputs["genotypes_vcf"], "rt").read().splitlines())
    expected = _records(
        open(os.path.join(GT2, "expected-genotypes.vcf")).read().splitlines())
    assert set(mine) == set(expected)
    for key in expected:
        m = mine[key]
        e = expected[key]
        assert m["ref"] == e["ref"] and m["alt"] == e["alt"], key
        assert m["filter"] == e["filter"], key
        assert m["info"] == e["info"], key  # incl. sha-based GRMPY_ID
        for field in ("GT", "OLD_GT", "DP", "FT", "PL"):
            assert m["sample"][field] == e["sample"][field], (key, field)
