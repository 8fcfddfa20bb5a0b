"""As-of join and range join — semantics on hand-built timelines."""

from __future__ import annotations

from datetime import datetime

import pytest

from kgraph_spark.operators.temporal import asof_join, range_join


def _t(m, s=0):
    return datetime(2024, 1, 1, 0, m, s)


def _left(spark, rows):
    return spark.createDataFrame(rows, "k string, lid long, ts timestamp")


def _right(spark, rows):
    return spark.createDataFrame(rows, "k string, ts timestamp, v double")


def test_asof_picks_latest_at_or_before(spark):
    left = _left(spark, [("a", 1, _t(10)), ("a", 2, _t(20)), ("a", 3, _t(5))])
    right = _right(spark, [("a", _t(8), 1.0), ("a", _t(15), 2.0), ("a", _t(30), 3.0)])
    out = {r["lid"]: r for r in asof_join(left, right, on=["k"]).collect()}
    assert out[1]["v_right"] == 1.0          # 8 <= 10
    assert out[2]["v_right"] == 2.0          # 15 <= 20 (30 is future)
    assert out[3]["v_right"] is None         # nothing at or before 5
    assert out[3]["ts_right"] is None


def test_asof_equal_timestamp_matches(spark):
    left = _left(spark, [("a", 1, _t(10))])
    right = _right(spark, [("a", _t(10), 7.0)])
    out = asof_join(left, right, on=["k"]).collect()[0]
    assert out["v_right"] == 7.0 and out["ts_right"] == _t(10)


def test_asof_keys_do_not_leak(spark):
    left = _left(spark, [("a", 1, _t(10)), ("b", 2, _t(10))])
    right = _right(spark, [("a", _t(5), 1.0)])
    out = {r["lid"]: r for r in asof_join(left, right, on=["k"]).collect()}
    assert out[1]["v_right"] == 1.0
    assert out[2]["v_right"] is None  # b never saw a's rows


def test_asof_duplicate_instant_tie_is_greatest_payload(spark):
    left = _left(spark, [("a", 1, _t(10))])
    right = _right(spark, [("a", _t(9), 1.0), ("a", _t(9), 5.0)])
    out = asof_join(left, right, on=["k"]).collect()[0]
    assert out["v_right"] == 5.0  # greatest struct wins — deterministic


def _points(spark, rows):
    return spark.createDataFrame(rows, "pid long, ts timestamp")


def _intervals(spark, rows):
    return spark.createDataFrame(rows, "iid long, start timestamp, end timestamp")


def test_range_join_inclusive_start_exclusive_end(spark):
    pts = _points(spark, [(1, _t(10)), (2, _t(20)), (3, _t(30))])
    iv = _intervals(spark, [(100, _t(10), _t(20))])
    got = {(r["pid"], r["iid"]) for r in range_join(pts, iv).collect()}
    assert got == {(1, 100)}  # 10 in, 20 out (exclusive), 30 out


def test_range_join_overlapping_intervals_multi_match(spark):
    pts = _points(spark, [(1, _t(15))])
    iv = _intervals(spark, [(1, _t(0), _t(16)), (2, _t(10), _t(40)), (3, _t(16), _t(20))])
    got = {r["iid"] for r in range_join(pts, iv).collect()}
    assert got == {1, 2}


@pytest.mark.parametrize("bucket", [1, 60, 86400])
def test_range_join_result_independent_of_bucket_size(spark, bucket):
    pts = _points(spark, [(i, _t(i)) for i in range(0, 50, 7)])
    iv = _intervals(spark, [(j, _t(j), _t(j + 11)) for j in range(0, 40, 13)])
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(pts, iv, bucket_seconds=bucket).collect()
    )
    expect = sorted(
        (p, j)
        for p in range(0, 50, 7)
        for j in range(0, 40, 13)
        if j <= p < j + 11
    )
    assert got == expect


def test_range_join_rejects_bad_bucket(spark):
    pts = _points(spark, [(1, _t(1))])
    iv = _intervals(spark, [(1, _t(0), _t(2))])
    with pytest.raises(ValueError):
        range_join(pts, iv, bucket_seconds=0)
