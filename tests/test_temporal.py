"""As-of join and range join — semantics on hand-built timelines."""

from __future__ import annotations

from datetime import datetime

import pytest

from pyspark.sql import functions as F

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


# ---- funnel ---------------------------------------------------------------


def _ev(spark, rows):
    from pyspark.sql import functions as F

    return spark.createDataFrame(
        rows, "user_id bigint, event_type string, ts string"
    ).select("user_id", "event_type", F.col("ts").cast("timestamp").alias("ts"))


def test_funnel_orders_and_window(spark):
    from kgraph_spark.operators.temporal import funnel

    ev = _ev(spark, [
        # user 1 completes view→click→purchase in order
        (1, "view", "2024-01-01 00:00:00"),
        (1, "click", "2024-01-01 01:00:00"),
        (1, "purchase", "2024-01-01 02:00:00"),
        # user 2: click BEFORE the first view never counts; the later one does
        (2, "click", "2024-01-01 00:00:00"),
        (2, "view", "2024-01-01 01:00:00"),
        (2, "click", "2024-01-01 03:00:00"),
        # user 3: purchase outside the 7-day window of the first view
        (3, "view", "2024-01-01 00:00:00"),
        (3, "click", "2024-01-02 00:00:00"),
        (3, "purchase", "2024-01-09 00:00:01"),
        # user 4: never views → absent
        (4, "purchase", "2024-01-01 00:00:00"),
    ])
    got = {r["user_id"]: r for r in
           funnel(ev, ["view", "click", "purchase"], within="7 days").collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["n_completed"] == 3 and got[1]["t3_us"] is not None
    assert got[2]["n_completed"] == 2
    # user 2's click step must be the 03:00 one (after the first view)
    assert got[2]["t2_us"] == got[2]["t1_us"] + 2 * 3600 * 1_000_000
    assert got[3]["n_completed"] == 2 and got[3]["t3_us"] is None


def test_funnel_earliest_completion_is_greedy(spark):
    from kgraph_spark.operators.temporal import funnel

    # greedy takes the 01:00 click; the only purchase precedes it → chain
    # breaks even though (02:00 click, none) wouldn't help either; also
    # asserts strict ordering (purchase at exactly t2 doesn't count)
    ev = _ev(spark, [
        (1, "view", "2024-01-01 00:00:00"),
        (1, "click", "2024-01-01 01:00:00"),
        (1, "purchase", "2024-01-01 01:00:00"),
        (1, "click", "2024-01-01 02:00:00"),
    ])
    got = funnel(ev, ["view", "click", "purchase"]).collect()[0]
    assert got["n_completed"] == 2 and got["t3_us"] is None


def test_funnel_validation(spark):
    import pytest
    from kgraph_spark.operators.temporal import funnel

    with pytest.raises(ValueError, match="2 steps"):
        funnel(_ev(spark, [(1, "view", "2024-01-01 00:00:00")]), ["view"])


# ---- retention_cohorts ------------------------------------------------------


def test_retention_cohorts(spark):
    from kgraph_spark.operators.temporal import retention_cohorts

    # 2024-01-01 is a Monday: users 1,2 cohort that week; user 3 next week.
    ev = _ev(spark, [
        (1, "view", "2024-01-01 10:00:00"),
        (1, "view", "2024-01-09 10:00:00"),   # week offset 1
        (1, "view", "2024-01-16 10:00:00"),   # week offset 2
        (2, "view", "2024-01-03 10:00:00"),
        (2, "view", "2024-01-10 10:00:00"),   # week offset 1
        (3, "view", "2024-01-08 10:00:00"),   # cohort week 2
    ])
    rows = {(r["cohort_week_us"], r["week_offset"]): (r["n_active"], r["cohort_size"], r["retention_rate"])
            for r in retention_cohorts(ev).collect()}
    w1 = 1704067200 * 1_000_000  # 2024-01-01 (Monday) epoch us
    wk = 7 * 24 * 3600 * 1_000_000
    assert rows[(w1, 0)] == (2, 2, 1.0)
    assert rows[(w1, 1)] == (2, 2, 1.0)
    assert rows[(w1, 2)] == (1, 2, 0.5)
    assert rows[(w1 + wk, 0)] == (1, 1, 1.0)
    assert len(rows) == 4


def test_retention_cohorts_max_weeks(spark):
    from kgraph_spark.operators.temporal import retention_cohorts

    ev = _ev(spark, [
        (1, "view", "2024-01-01 10:00:00"),
        (1, "view", "2024-03-01 10:00:00"),
    ])
    rows = retention_cohorts(ev, max_weeks=2).collect()
    assert {r["week_offset"] for r in rows} == {0}


def test_rolling_stats_trailing_window(spark):
    from pyspark.sql import functions as F

    from kgraph_spark.operators.temporal import rolling_stats

    ev = spark.createDataFrame(
        [
            (1, "a", "2024-01-01 00:00:00", 10.0),
            (2, "a", "2024-01-01 12:00:00", 20.0),
            (3, "a", "2024-01-02 06:00:00", 30.0),  # event 1 aged out (30h)
            (4, "b", "2024-01-01 01:00:00", 5.0),
        ],
        "event_id long, event_type string, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r["event_id"]: r.asDict() for r in rolling_stats(ev, window_hours=24).collect()}
    assert got[1]["rolling_n"] == 1 and got[1]["rolling_sum"] == 10.0
    assert got[2]["rolling_n"] == 2 and got[2]["rolling_sum"] == 30.0
    assert got[3]["rolling_n"] == 2 and got[3]["rolling_sum"] == 50.0
    assert got[3]["rolling_avg"] == 25.0
    assert got[4]["rolling_n"] == 1  # groups are independent


def test_rolling_stats_boundary_inclusive(spark):
    from pyspark.sql import functions as F

    from kgraph_spark.operators.temporal import rolling_stats

    ev = spark.createDataFrame(
        [
            (1, "a", "2024-01-01 00:00:00", 1.0),
            (2, "a", "2024-01-02 00:00:00", 2.0),  # exactly 24h later: included
        ],
        "event_id long, event_type string, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r["event_id"]: r for r in rolling_stats(ev, window_hours=24).collect()}
    assert got[2]["rolling_n"] == 2


def test_user_lifecycle_gaps_and_days(spark):
    from pyspark.sql import functions as F

    from kgraph_spark.operators.temporal import user_lifecycle

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00"),
            (1, "2024-01-01 12:00:00"),  # same day: one active day
            (1, "2024-01-05 09:00:00"),  # 4-day gap
            (1, "2024-01-06 09:00:00"),
            (2, "2024-02-01 00:00:00"),  # single event: gap 0
        ],
        "user_id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r["user_id"]: r.asDict() for r in user_lifecycle(ev).collect()}
    assert got[1]["n_events"] == 4
    assert got[1]["n_active_days"] == 3
    assert got[1]["max_gap_days"] == 4
    assert got[2]["n_active_days"] == 1 and got[2]["max_gap_days"] == 0


def test_scd2_versions_open_only_on_change(spark):
    from kgraph_spark.operators.temporal import scd2_build

    ev = spark.createDataFrame(
        [
            ("u1", _t(1), "view"),
            ("u1", _t(2), "view"),      # duplicate attrs: absorbed
            ("u1", _t(3), "click"),     # change: version 2
            ("u1", _t(4), "click"),
            ("u1", _t(5), "view"),      # change back: version 3
            ("u2", _t(7), "buy"),       # single version, current
        ],
        "user_id string, ts timestamp, event_type string",
    )
    out = {
        (r["user_id"], r["version"]): r
        for r in scd2_build(ev, key_col="user_id").collect()
    }
    assert len(out) == 4
    v1, v2, v3 = out[("u1", 1)], out[("u1", 2)], out[("u1", 3)]
    assert (v1["event_type"], v2["event_type"], v3["event_type"]) == (
        "view", "click", "view",
    )
    # intervals chain half-open: valid_to of version n = valid_from of n+1
    assert v1["valid_to_us"] == v2["valid_from_us"]
    assert v2["valid_to_us"] == v3["valid_from_us"]
    assert v3["valid_to_us"] is None and v3["is_current"]
    assert not v1["is_current"] and not v2["is_current"]
    u2 = out[("u2", 1)]
    assert u2["is_current"] and u2["valid_to_us"] is None


def test_scd2_same_instant_tie_takes_greatest_struct(spark):
    from kgraph_spark.operators.temporal import scd2_build

    ev = spark.createDataFrame(
        [("u1", _t(1), "aaa"), ("u1", _t(1), "zzz"), ("u1", _t(2), "zzz")],
        "user_id string, ts timestamp, event_type string",
    )
    rows = scd2_build(ev, key_col="user_id").collect()
    # instant dedup keeps 'zzz'; the t2 'zzz' row is then a non-change
    assert len(rows) == 1
    assert rows[0]["event_type"] == "zzz" and rows[0]["version"] == 1


def test_scd2_lookup_event_time_versions(spark):
    import datetime as dt

    from kgraph_spark.operators.temporal import scd2_build, scd2_lookup

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    changes = spark.createDataFrame(
        [(1, t(0), "bronze"), (1, t(10), "gold"), (2, t(5), "silver")],
        "user_id long, ts timestamp, event_type string",
    )
    dim = scd2_build(changes)
    events = spark.createDataFrame(
        [(100, t(1), 1), (101, t(10), 1), (102, t(20), 1),
         (103, t(0), 2),   # before user 2's first version
         (104, t(9), 9)],  # unknown key
        "event_id long, ts timestamp, user_id long",
    )
    rows = {r["event_id"]: r for r in scd2_lookup(events, dim).collect()}
    assert rows[100]["dim_event_type"] == "bronze" and rows[100]["dim_version"] == 1
    assert rows[101]["dim_event_type"] == "gold"   # boundary: from is inclusive
    assert rows[102]["dim_event_type"] == "gold"   # open current version
    assert rows[103]["dim_version"] is None        # pre-first-version
    assert rows[104]["dim_version"] is None        # unknown key
    assert len(rows) == 5                          # left join never drops events


def test_interarrival_stats_hand_values(spark):
    import datetime as dt

    from kgraph_spark.operators.temporal import interarrival_stats

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    ev = spark.createDataFrame(
        [(1, t(0), 1), (2, t(10), 1), (3, t(40), 1), (4, t(41), 1),  # gaps 10,30,1
         (5, t(5), 2)],                                              # single event
        "event_id long, ts timestamp, user_id long",
    )
    rows = {r["group"]: r for r in interarrival_stats(ev).collect()}
    u1 = rows[1]
    assert u1["n_gaps"] == 3
    assert abs(u1["mean_gap_s"] - (41 / 3)) < 2e-6
    assert u1["median_gap_s"] == 10.0  # lower median of {1,10,30}
    assert u1["max_gap_s"] == 30.0
    u2 = rows[2]
    assert u2["n_events"] == 1 and u2["n_gaps"] == 0 and u2["mean_gap_s"] is None


def test_coalesce_intervals_islands_and_gap(spark):
    import datetime as dt

    from kgraph_spark.operators.temporal import coalesce_intervals

    T = lambda m: dt.datetime(2026, 1, 1, 0, m)
    rows = [
        ("a", T(0), T(10)),   # island 1
        ("a", T(5), T(8)),    # contained — same island
        ("a", T(10), T(15)),  # touches running max end — same island
        ("a", T(20), T(25)),  # gap of 5 min — new island
        ("b", T(0), T(1)),    # other key unaffected
    ]
    df = spark.createDataFrame(rows, "k string, valid_from timestamp, valid_to timestamp")
    out = {(r["k"], r["valid_from"], r["valid_to"]): r["n_source_intervals"]
           for r in coalesce_intervals(df, ["k"]).collect()}
    assert out == {
        ("a", T(0), T(15)): 3,
        ("a", T(20), T(25)): 1,
        ("b", T(0), T(1)): 1,
    }
    # gap tolerance of 5 min fuses the last island
    out2 = {(r["k"], r["valid_from"], r["valid_to"]): r["n_source_intervals"]
            for r in coalesce_intervals(df, ["k"], max_gap_micros=5 * 60 * 1_000_000).collect()}
    assert out2 == {("a", T(0), T(25)): 4, ("b", T(0), T(1)): 1}


def test_coalesce_intervals_validation(spark):
    import pytest as _pytest

    from kgraph_spark.operators.temporal import coalesce_intervals

    df = spark.createDataFrame([], "k string, valid_from timestamp, valid_to timestamp")
    with _pytest.raises(ValueError):
        coalesce_intervals(df, [])


def test_interval_conflicts_hand_case(spark):
    from kgraph_spark.operators.temporal import interval_conflicts

    rows = [
        # u1: A [0,10) vs B [5,15) overlap [5,10) — conflict
        ("u1", "A", "2024-01-01 00:00:00", "2024-01-01 00:00:10"),
        ("u1", "B", "2024-01-01 00:00:05", "2024-01-01 00:00:15"),
        # u1: C [10,20) touches A's end — NOT a conflict (half-open)
        ("u1", "C", "2024-01-01 00:00:10", "2024-01-01 00:00:20"),
        # u2 same window as u1's A but different key — no cross-key pairs
        ("u2", "B", "2024-01-01 00:00:00", "2024-01-01 00:00:10"),
        # u1: same value overlapping — never conflicts with itself
        ("u1", "A", "2024-01-01 00:00:02", "2024-01-01 00:00:12"),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, v string, valid_from string, valid_to string"
    ).select(
        "user_id",
        "v",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    )
    out = interval_conflicts(df, ["user_id"], "v").collect()
    got = {(r["user_id"], r["value_a"], r["value_b"],
            str(r["overlap_from"]), str(r["overlap_to"])) for r in out}
    assert ("u1", "A", "B", "2024-01-01 00:00:05", "2024-01-01 00:00:10") in got
    # second A copy [2,12) also overlaps B [5,15) → [5,12)
    assert ("u1", "A", "B", "2024-01-01 00:00:05", "2024-01-01 00:00:12") in got
    # A[2,12) overlaps C[10,20) → [10,12)
    assert ("u1", "A", "C", "2024-01-01 00:00:10", "2024-01-01 00:00:12") in got
    # B[5,15) overlaps C[10,20) → [10,15)
    assert ("u1", "B", "C", "2024-01-01 00:00:10", "2024-01-01 00:00:15") in got
    assert len(got) == 4


def test_interval_conflicts_validation(spark):
    import pytest as _pytest

    from kgraph_spark.operators.temporal import interval_conflicts

    df = spark.createDataFrame(
        [("u", "A", "2024-01-01 00:00:00", "2024-01-01 00:00:10")],
        "user_id string, v string, valid_from string, valid_to string",
    )
    with _pytest.raises(ValueError):
        interval_conflicts(df, [], "v")


def test_temporal_reachability_respects_time_order(spark):
    from kgraph_spark.operators.temporal import temporal_reachability

    # B->C fired BEFORE influence arrives at B -> C stays unreachable
    e = spark.createDataFrame(
        [("A", "B", 5), ("B", "C", 3), ("B", "D", 7)],
        "src string, dst string, t long",
    )
    seeds = spark.createDataFrame([("A", 0)], "node string, t0 long")
    out = {r["node"]: r["earliest_arrival"]
           for r in temporal_reachability(e, seeds, max_hops=3).collect()}
    assert out == {"A": 0, "B": 5, "D": 7}


def test_temporal_reachability_earliest_arrival_wins(spark):
    from kgraph_spark.operators.temporal import temporal_reachability

    # two routes to C: direct at t=9, via B at t=2 -> min arrival 2
    e = spark.createDataFrame(
        [("A", "C", 9), ("A", "B", 1), ("B", "C", 2)],
        "src string, dst string, t long",
    )
    seeds = spark.createDataFrame([("A", 0)], "node string, t0 long")
    out = {r["node"]: r["earliest_arrival"]
           for r in temporal_reachability(e, seeds, max_hops=2).collect()}
    assert out["C"] == 2
