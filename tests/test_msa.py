"""Differential test: our MSA pairwise variant caller vs the reference's
pure-python grm.msa.pairwise_variants (loaded from the read-only
reference as an oracle, like the compiled gssw oracle)."""
import importlib.util
import io
import random
from contextlib import redirect_stdout

import pytest

from paragraph_tpu.cli.tools import msa_to_records, pairwise_msa_variants


def _load_reference_msa():
    spec = importlib.util.spec_from_file_location(
        "ref_msa", "/root/reference/src/python/lib/grm/msa.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


REF_MSA = _load_reference_msa()


def _oracle(ref, alt, offset=0):
    with redirect_stdout(io.StringIO()):  # the oracle pprint()s
        return REF_MSA.pairwise_variants(ref, alt, offset)


CASES = [
    # SNP
    ("ACGTACGT", "ACGAACGT"),
    # deletion
    ("ACGTACGT", "ACG--CGT"),
    # insertion
    ("ACG--CGT", "ACGTACGT"),
    # adjacent mismatch+gap runs merge
    ("ACGTTTACGT", "ACGA--ACGT"),
    # multiple separated variants
    ("ACGTACGTACGTACGT", "AAGTAC--ACGTACCT"),
    # trailing indel
    ("ACGTACGT", "ACGTAC--"),
]


@pytest.mark.parametrize("ref,alt", CASES)
def test_pairwise_matches_reference(ref, alt):
    assert pairwise_msa_variants(ref, alt) == _oracle(ref, alt)
    assert pairwise_msa_variants(ref, alt, 100) == _oracle(ref, alt, 100)


def test_pairwise_matches_reference_randomized():
    rng = random.Random(11)
    bases = "ACGT"
    for _ in range(200):
        n = rng.randint(10, 40)
        ref_core = [rng.choice(bases) for _ in range(n)]
        ref = list(ref_core)
        alt = list(ref_core)
        # lead with a guaranteed substitution: the oracle never flushes
        # an insertion-only run before the first ref-consuming event
        # (ref_start stays -1) and can merge it into a later deletion,
        # tripping its own ref!=alt assert on equal strings
        alt[2] = bases[(bases.index(alt[2]) + 1) % 4]
        # isolated events separated by matches (the oracle asserts on
        # gap-vs-gap runs whose ref and alt collapse to equal strings)
        i = 4
        while i < n - 2:
            roll = rng.random()
            if roll < 0.08:
                alt[i] = rng.choice(bases)
                i += 2
            elif roll < 0.14:
                alt[i] = "-"
                i += 2
            elif roll < 0.18:
                ref[i] = "-"
                alt[i] = rng.choice(bases)
                i += 2
            else:
                i += 1
        r, a = "".join(ref), "".join(alt)
        assert pairwise_msa_variants(r, a) == _oracle(r, a), (r, a)


def test_msa_to_records_merged_indels():
    seqs = {"ref": "ACGTACGT", "s1": "ACG--CGT", "s2": "ACGAACGT"}
    records = msa_to_records("ref", seqs, chrom="msa")
    # deletion is VCF-padded and anchored at the preceding base
    assert ("msa", 3, "GTA", "G", "s1") in records
    assert ("msa", 4, "T", "A", "s2") in records
