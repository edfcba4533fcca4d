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


# ------------------------------------------------------- temperature sampling


def _corpus(spark, sizes: dict[str, int]):
    from pyspark.sql import Row

    rows, i = [], 0
    for lang, n in sizes.items():
        for _ in range(n):
            rows.append(Row(doc_id=i, lang=lang))
            i += 1
    return spark.createDataFrame(rows)


def test_temperature_sample_rarest_kept_fully_and_balanced(spark):
    from facematch_spark.operators.sampling import temperature_sample

    sizes = {"py": 1600, "go": 400, "rs": 100}
    out = temperature_sample(_corpus(spark, sizes), alpha=0.5).groupBy("lang").count()
    kept = {r["lang"]: r["count"] for r in out.collect()}
    # rarest stratum: rate 1.0 -> every row kept
    assert kept["rs"] == 100
    # expected kept_l = sqrt(n_min * n_l): py 400, go 200 (±sampling noise,
    # md5 prefixes are uniform; 5 sigma ~ 5*sqrt(400*0.75) < 100)
    assert abs(kept["py"] - 400) < 100
    assert abs(kept["go"] - 200) < 70
    # post-sample distribution is flatter than input: max/min ratio 16 -> ~4
    assert max(kept.values()) / min(kept.values()) < 6


def test_temperature_sample_nested_across_alpha(spark):
    from facematch_spark.operators.sampling import temperature_sample

    df = _corpus(spark, {"py": 900, "rs": 100})
    hot = {r["doc_id"] for r in temperature_sample(df, alpha=0.75).collect()}
    cold = {r["doc_id"] for r in temperature_sample(df, alpha=0.5).collect()}
    # lower alpha = flatter = lower per-stratum rates = strict subset
    assert cold <= hot
    assert len(cold) < len(hot)


def test_temperature_sample_alpha_validation(spark):
    from facematch_spark.operators.sampling import temperature_sample

    df = _corpus(spark, {"py": 5})
    with pytest.raises(ValueError):
        temperature_sample(df, alpha=0.0)
    with pytest.raises(ValueError):
        temperature_sample(df, alpha=1.5)


def test_temperature_sample_partition_invariant(spark):
    from facematch_spark.operators.sampling import temperature_sample

    df = _corpus(spark, {"py": 300, "rs": 60})
    a = {r["doc_id"] for r in temperature_sample(df.repartition(2)).collect()}
    b = {r["doc_id"] for r in temperature_sample(df.repartition(17)).collect()}
    assert a == b and a
