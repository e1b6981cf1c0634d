"""ThreadSanitizer harness for the native traceback engine.

The production fan-out gives each worker thread a private gsw context
(align/batched_aligner.py:199-216) because gsw_align reuses per-context
scratch. native/race_test.cpp replays that pattern under
-fsanitize=thread and checks determinism against a serial run; the
--shared-ctx negative control shares one context across threads and must
trip TSan — proving the harness detects real races, not just absence of
reports. Counterpart of the reference's valgrind docker + threaded
determinism blackbox (src/docker-testing/valgrind-testing.sh,
test-blackbox/test_multithreading.cpp).
"""
import os
import subprocess

import pytest

NATIVE = os.path.join(os.path.dirname(__file__), "..", "native")


@pytest.fixture(scope="module")
def race_test_bin():
    try:
        subprocess.run(["make", "-C", NATIVE, "race_test"], check=True,
                       capture_output=True, timeout=300)
    except (subprocess.CalledProcessError, FileNotFoundError) as exc:
        pytest.skip(f"cannot build TSan harness: {exc}")
    return os.path.join(NATIVE, "race_test")


def test_per_thread_context_pattern_is_race_free(race_test_bin):
    proc = subprocess.run(
        [race_test_bin], capture_output=True, text=True, timeout=600,
        env={**os.environ, "TSAN_OPTIONS": "halt_on_error=1 exitcode=66"})
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "race-free and deterministic" in proc.stdout


def test_tsan_detects_the_shared_context_race(race_test_bin):
    """Negative control: a shared context across threads is a real race
    on the fill scratch and TSan must flag it."""
    proc = subprocess.run(
        [race_test_bin, "--shared-ctx"], capture_output=True, text=True,
        timeout=600,
        env={**os.environ, "TSAN_OPTIONS": "halt_on_error=1 exitcode=66"})
    assert proc.returncode == 66, proc.stdout + proc.stderr
    assert "ThreadSanitizer" in proc.stderr + proc.stdout
