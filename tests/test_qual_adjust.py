"""Quality-adjusted scoring matrix: byte parity vs the compiled
reference gssw (gssw_dna_scaled_adjusted_qual_matrix, gssw.c:4526-4556)
plus sanity properties of the underlying math."""
import ctypes

import numpy as np
import pytest

from paragraph_tpu.align.qual_adjust import (
    adjusted_qual_matrix, dna_scaled_adjusted_qual_matrix,
    recover_log_base, score_gcf)

from gssw_oracle import build_lib


@pytest.fixture(scope="module")
def ref_lib():
    try:
        lib = ctypes.CDLL(build_lib())
    except Exception as e:  # pragma: no cover
        pytest.skip(f"could not build reference gssw: {e}")
    fn = lib.gssw_dna_scaled_adjusted_qual_matrix
    fn.restype = ctypes.POINTER(ctypes.c_int8)
    fn.argtypes = [ctypes.c_int8, ctypes.c_uint8,
                   ctypes.POINTER(ctypes.c_int8),
                   ctypes.POINTER(ctypes.c_int8),
                   ctypes.c_int8, ctypes.c_int8,
                   ctypes.c_double, ctypes.c_double]
    return lib


def _reference_dna_matrix(lib, max_score, max_qual, gap_open, gap_extend,
                          match, mismatch, gc):
    go = ctypes.c_int8(gap_open)
    ge = ctypes.c_int8(gap_extend)
    ptr = lib.gssw_dna_scaled_adjusted_qual_matrix(
        max_score, max_qual, ctypes.byref(go), ctypes.byref(ge),
        match, mismatch, gc, 1e-12)
    n = (max_qual + 1) * 25
    mat = np.ctypeslib.as_array(ptr, shape=(n,)).astype(np.int64).copy()
    return mat.reshape(max_qual + 1, 5, 5), go.value, ge.value


@pytest.mark.parametrize("params", [
    # (max_score, max_qual, gap_open, gap_extend, match, mismatch, gc)
    (32, 40, 6, 1, 1, 4, 0.5),
    (64, 40, 6, 1, 1, 4, 0.4),
    (32, 33, 5, 2, 2, 6, 0.6),
])
def test_dna_scaled_matrix_matches_reference(ref_lib, params):
    ours, go, ge = dna_scaled_adjusted_qual_matrix(*params)
    want, rgo, rge = _reference_dna_matrix(ref_lib, *params)
    assert (go, ge) == (rgo, rge)
    np.testing.assert_array_equal(ours, want)


def test_log_base_partition_property():
    mat = np.array([[1, -4, -4, -4], [-4, 1, -4, -4],
                    [-4, -4, 1, -4], [-4, -4, -4, 1]])
    freqs = np.full(4, 0.25)
    lam = recover_log_base(mat, freqs)
    part = float(np.sum(np.outer(freqs, freqs) * np.exp(lam * mat)))
    assert abs(part - 1.0) < 1e-9
    assert score_gcf(mat) == 1


def test_high_quality_recovers_base_scores():
    """At high Phred quality the adjustment converges to the input
    log-odds scores; at the guessing floor the scores carry ~no
    information."""
    mat = np.array([[1, -4, -4, -4], [-4, 1, -4, -4],
                    [-4, -4, 1, -4], [-4, -4, -4, 1]])
    freqs = np.full(4, 0.25)
    adj = adjusted_qual_matrix(60, mat, freqs)
    np.testing.assert_array_equal(adj[60], mat)
    assert abs(int(adj[2][0, 0])) <= 1
