"""Property tests for the deterministic-sampling threshold math — pure
Python, no Spark session."""

from __future__ import annotations

import pytest
from hypothesis import given, strategies as st

from facematch_spark.operators.sampling import rate_to_hex_threshold


@given(st.floats(min_value=0.0, max_value=1.0, allow_nan=False))
def test_threshold_is_8char_lowercase_hex(rate):
    h = rate_to_hex_threshold(rate)
    assert len(h) == 8
    assert h == h.lower()
    int(h, 16)  # parses


@given(
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
)
def test_threshold_monotone_in_rate(r1, r2):
    """rate ordering must imply threshold ordering (lexicographic on
    fixed-width hex == numeric), else nested samples would not nest."""
    lo, hi = sorted((r1, r2))
    assert rate_to_hex_threshold(lo) <= rate_to_hex_threshold(hi)


def test_threshold_endpoints():
    assert rate_to_hex_threshold(0.0) == "00000000"
    # rate 1.0 must admit EVERY md5 prefix, including 'ffffffff'
    assert rate_to_hex_threshold(1.0) == "ffffffff"
    # ...but note md5 prefixes are compared with strict '<': 'ffffffff' is
    # the one prefix excluded at rate 1.0 — probability 2**-32, and the
    # clamp is what keeps the threshold a valid 8-char string
    assert int(rate_to_hex_threshold(1.0), 16) == 2**32 - 1


@given(st.floats().filter(lambda x: not (0.0 <= x <= 1.0)))
def test_threshold_rejects_out_of_range(rate):
    with pytest.raises(ValueError):
        rate_to_hex_threshold(rate)
