"""Port of the reference's statistics unit tests
(test_statistics_naive_gaussian.cpp, test_statistics_min_cov_det_gaussian
.cpp exact expectations)."""
import math

import pytest

from paragraph_tpu.utils.statistics import MinCovDetGaussian, NaiveGaussian

TOL = 1e-7


def test_naive_gaussian():
    """GaussianFitStatistics.NaiveGaussian
    (test_statistics_naive_gaussian.cpp:38-56)."""
    res = NaiveGaussian()
    res.fit([1.0, 1.2, 1.4, 1.6, 1.8, 2.0])
    assert res.mean == pytest.approx(1.5, abs=TOL)
    assert res.variance == pytest.approx(0.14, abs=TOL)
    assert res.standard_deviation() == pytest.approx(
        math.sqrt(0.14), abs=TOL)

    res.fit([0, 1, 2, 3, 4, 5, 6, 7, 8])
    assert res.mean == pytest.approx(4.0, abs=TOL)
    assert res.variance == pytest.approx(7.5, abs=TOL)


def test_min_cov_det_gaussian():
    """GaussianFitStatistics.MinCovDetGaussian
    (test_statistics_min_cov_det_gaussian.cpp:38-65)."""
    numbers = [1.0, 1.1, 1.2, 1.3, 1.4, 1.5, 1.6, 1.7, 1.8, 1.9, 2.0,
               10.0]
    res = MinCovDetGaussian()
    assert res.raw_support_fraction() == 0.5

    res.fit(numbers)
    assert res.raw_mean == pytest.approx(1.5, abs=TOL)
    assert res.mean == pytest.approx(1.5, abs=TOL)
    assert res.raw_variance == pytest.approx(0.04, abs=TOL)
    assert res.variance == pytest.approx(0.1, abs=TOL)
    assert res.support == numbers[:-1]

    numbers2 = [9.8, 7.5, 6.4, 8.5, 5.5, 1.1, 7.4, 8.9]
    res.fit(numbers2)
    assert res.raw_mean == pytest.approx(7.65, abs=TOL)
    assert res.mean == pytest.approx(7.71428571, abs=TOL)
    assert res.raw_variance == pytest.approx(0.7784, abs=TOL)
    assert res.variance == pytest.approx(1.87836735, abs=TOL)
    assert res.support == [9.8, 7.5, 6.4, 8.5, 5.5, 7.4, 8.9]


def test_read_pileup():
    """test_readpileup.cpp:39-101 (CountsReads + FlushesReads)."""
    from paragraph_tpu.pipeline.idxdepth import _Pileup

    pileup = _Pileup()
    for pos, ln in [(10, 20), (20, 20), (30, 20), (40, 21), (50, 20),
                    (60, 20)]:
        pileup.add_read(pos, ln)
    with pytest.raises(RuntimeError):
        pileup.add_read(59, 150)

    assert sorted(pileup.pileup(20)) == [10, 20]
    assert sorted(pileup.pileup(45)) == [30, 40]
    assert sorted(pileup.pileup(60)) == [40, 50, 60]

    pileup.flush(41)
    assert pileup.pileup(20) == []
    assert sorted(pileup.pileup(45)) == [30, 40]


def test_sample_depths_matches_pileup_rescans():
    """The O(n log n) rank-lookup depth sampler must agree exactly with
    the per-position _Pileup rescans it replaced."""
    import random

    from paragraph_tpu.pipeline.idxdepth import _Pileup, _sample_depths

    rng = random.Random(11)
    starts = sorted(rng.randrange(0, 5000) for _ in range(800))
    lengths = [rng.randrange(50, 250) for _ in starts]
    pileup = _Pileup()
    for s, ln in zip(starts, lengths):
        pileup.add_read(s, ln)
    step = 75
    first, last = 0, 5400
    fast = _sample_depths(starts, lengths, first, last, step)
    slow = [float(pileup.depth_at(p)) for p in range(first, last + 1, step)]
    assert fast == slow


def test_idxdepth_robust_mode():
    """robust=True adds a MinCovDet fit over the sampled depths without
    changing the parity outputs."""
    from paragraph_tpu.pipeline import idxdepth as mod

    class FakeRec:
        def __init__(self, pos, n):
            self.pos = pos
            self.bases = "A" * n
            self.quals = "#" * n

    class FakeReader:
        def fetch(self, tid, start, end, primary_only=True):
            # ~30x coverage with mild jitter plus one extreme spike
            import random
            rng = random.Random(5)
            p = 0
            while p < 3000:
                yield FakeRec(p, 150)
                p += rng.choice((4, 5, 6))
            for _ in range(500):
                yield FakeRec(3000, 150)

    base = mod.estimate_contig_depth(FakeReader(), 0, 4000)
    rob = mod.estimate_contig_depth(FakeReader(), 0, 4000, robust=True)
    assert base["depth_median"] == rob["depth_median"]
    assert base["depth_variance"] == rob["depth_variance"]
    assert "depth_robust_mean" in rob
    # the robust variance must shrug off the spike
    assert rob["depth_robust_variance"] < rob["depth_variance"]
