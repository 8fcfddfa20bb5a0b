"""HyperLogLog: register determinism, merge = one-shot, duplicate
insensitivity, estimate accuracy."""

from __future__ import annotations

from kgraph_spark.operators.sketches import hll_estimate, hll_sketch, merge_hll


def _regs(df):
    return {(r["register"], r["max_rho"]) for r in df.collect()}


def test_hll_duplicates_do_not_change_sketch(spark):
    a = spark.range(200).selectExpr("CAST(id AS STRING) AS k")
    dup = a.unionAll(a).unionAll(a)
    assert _regs(hll_sketch(a, "k")) == _regs(hll_sketch(dup, "k"))


def test_hll_partitioning_invariant(spark):
    a = spark.range(1000).selectExpr("CAST(id AS STRING) AS k")
    assert _regs(hll_sketch(a.repartition(13), "k")) == _regs(
        hll_sketch(a.coalesce(1), "k")
    )


def test_hll_merge_equals_one_shot(spark):
    a = spark.range(0, 3000).selectExpr("CAST(id AS STRING) AS k")
    b = spark.range(2000, 5000).selectExpr("CAST(id AS STRING) AS k")  # overlap
    merged = merge_hll(hll_sketch(a, "k"), hll_sketch(b, "k"))
    one_shot = hll_sketch(a.unionAll(b), "k")
    assert _regs(merged) == _regs(one_shot)


def test_hll_estimate_within_relative_error(spark):
    # m=256 -> expected standard error 1.04/sqrt(256) = 6.5%; assert 3 sigma
    n = 5000
    df = spark.range(n).selectExpr("CAST(id AS STRING) AS k")
    row = hll_estimate(hll_sketch(df, "k")).collect()[0]
    assert row["m"] == 256
    assert abs(row["estimate"] - n) / n < 0.20
    assert 0 < row["n_registers"] <= 256


def test_hll_small_range_correction_branch(spark):
    # 5 distinct keys over 256 registers -> linear-counting branch
    df = spark.range(5).selectExpr("CAST(id AS STRING) AS k")
    row = hll_estimate(hll_sketch(df, "k")).collect()[0]
    assert row["n_registers"] <= 5
    assert 1 <= row["estimate"] <= 20


def test_hll_p_validation(spark):
    import pytest

    df = spark.range(3).selectExpr("CAST(id AS STRING) AS k")
    with pytest.raises(ValueError):
        hll_sketch(df, "k", p=2)
