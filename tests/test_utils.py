"""Utility-level reference test ports.

Covers test_phred.cpp (Phred.ScaleConversion) and the region-string
semantics of test_stringutil.cpp (String.StringFormatPos/StringParsePos),
adapted to this framework's 1-based region API (io/regions.py).
"""
import math

import pytest

from paragraph_tpu.io.regions import Region, parse_region
from paragraph_tpu.pipeline.variants import (error_prob_to_phred,
                                             phred_to_error_prob)


def test_phred_scale_conversion():
    """test_phred.cpp:36-42 (Phred.ScaleConversion)."""
    assert error_prob_to_phred(1e-6) == pytest.approx(60.0)
    assert phred_to_error_prob(60) == pytest.approx(1e-6, abs=1e-10)
    assert math.log10(phred_to_error_prob(20)) == pytest.approx(-2.0)
    assert error_prob_to_phred(10 ** -1.0) == pytest.approx(10.0)


def test_parse_region():
    """test_stringutil.cpp String.StringParsePos, shifted to the 1-based
    coordinates io/regions.py exposes (the reference's parsePos returns
    0-based: chr1:1,000 -> start 999)."""
    assert parse_region("chr1") == ("chr1", None, None)
    assert parse_region("chr1:1,000") == ("chr1", 1000, None)
    assert parse_region("chr1:1,000-2000") == ("chr1", 1000, 2000)
    with pytest.raises(ValueError):
        parse_region("chr1:x-y")


def test_format_region():
    """test_stringutil.cpp String.StringFormatPos equivalent: round trip
    through Region formatting."""
    assert str(Region("chr1", 1000, 2000)) == "chr1:1000-2000"
    assert str(Region.from_string("chr1:1000")) == "chr1:1000-1000"


def test_region_extension_clamps():
    assert Region("chr1", 5, 10).extended(20) == Region("chr1", 1, 30)
    assert Region("chr1", 100, 200).length == 101
