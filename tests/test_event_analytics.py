"""Event analytics: time-grid forward fill and Markov transition matrix
— hand-computed small cases (funnel/retention live in test_temporal)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from kgraph_spark.operators.event_analytics import (
    time_grid_fill,
    transition_matrix,
)


def _t(m, s=0):
    return datetime(2024, 1, 1, 0, m, s)


def _d(day, h=0):
    return datetime(2024, 1, day, h)


EV_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def test_time_grid_fill_forward_fills_gaps(spark):
    # u1 observed in hours 0 and 3 (two events sum in hour 0); hours 1-2
    # carry hour 0's sum forward
    ev = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 0, 10), 1, "view", 1.5),
            (2, datetime(2024, 1, 1, 0, 50), 1, "view", 2.0),
            (3, datetime(2024, 1, 1, 3, 0), 1, "view", 7.0),
        ],
        EV_SCHEMA,
    )
    rows = sorted(time_grid_fill(ev).collect(), key=lambda r: r["bucket_start_us"])
    assert len(rows) == 4
    assert [r["is_observed"] for r in rows] == [True, False, False, True]
    assert rows[0]["value_filled"] == 3.5
    assert rows[1]["value_filled"] == 3.5 and rows[2]["value_filled"] == 3.5
    assert rows[3]["value_filled"] == 7.0
    assert rows[1]["bucket_start_us"] - rows[0]["bucket_start_us"] == 3_600_000_000


def test_time_grid_fill_span_is_per_user(spark):
    # u2's single event must yield a single-bucket grid, not u1's span
    ev = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 0, 0), 1, "view", 1.0),
            (2, datetime(2024, 1, 1, 9, 0), 1, "view", 1.0),
            (3, datetime(2024, 1, 1, 5, 0), 2, "view", 4.0),
        ],
        EV_SCHEMA,
    )
    out = time_grid_fill(ev)
    assert out.filter("user_id = 2").count() == 1
    assert out.filter("user_id = 1").count() == 10


def test_transition_matrix_probs_and_ties(spark):
    # u1: view->click->view ; u2: view->click. Ties: u1's first two rows
    # share a timestamp; event_id orders them (1 then 2).
    ev = spark.createDataFrame(
        [
            (1, _t(1), 1, "view", 0.0),
            (2, _t(1), 1, "click", 0.0),
            (3, _t(2), 1, "view", 0.0),
            (4, _t(1), 2, "view", 0.0),
            (5, _t(2), 2, "click", 0.0),
        ],
        EV_SCHEMA,
    )
    got = {
        (r["from_type"], r["to_type"]): (r["n_transitions"], r["prob"])
        for r in transition_matrix(ev).collect()
    }
    assert got[("view", "click")] == (2, 1.0)
    assert got[("click", "view")] == (1, 1.0)
    assert len(got) == 2


# ---- CUSUM ---------------------------------------------------------------


def test_cusum_detects_level_shift(spark):
    from kgraph_spark.operators.event_analytics import cusum_changepoints

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # user A: flat 1.0 for 10 events then jumps to 3.0 for 10 -> alarms
    for i in range(20):
        rows.append((i, t0 + dt.timedelta(minutes=i), 1, "e", 1.0 if i < 10 else 3.0))
    # user B: flat forever -> no alarm
    for i in range(20):
        rows.append((100 + i, t0 + dt.timedelta(minutes=i), 2, "e", 5.0))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    got = {r["group"]: r for r in cusum_changepoints(ev, kappa=0.25, h=3.0).collect()}
    assert got[1]["n_alarms"] > 0
    assert got[1]["max_cusum_high"] > 3.0
    assert got[1]["first_alarm_ts"] is not None
    assert got[2]["n_alarms"] == 0
    assert got[2]["max_cusum_high"] == 0.0 and got[2]["max_cusum_low"] == 0.0


def test_cusum_hand_values(spark):
    from kgraph_spark.operators.event_analytics import cusum_changepoints

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    vals = [0.0, 0.0, 4.0, 4.0]  # mu = 2; kappa=1 -> dev_hi = v-3: -3,-3,1,1
    ev = spark.createDataFrame(
        [(i, t0 + dt.timedelta(minutes=i), 1, "e", v) for i, v in enumerate(vals)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    row = cusum_changepoints(ev, kappa=1.0, h=1.5).collect()[0]
    # s_hi walks: 0,0,1,2 ; s_lo (mu-k-v = 1-v): 1,2,0,0 -> max 2 both
    assert row["max_cusum_high"] == 2.0
    assert row["max_cusum_low"] == 2.0
    assert row["n_alarms"] == 2  # s_hi=2 at t3, s_lo=2 at t1


# ---- attribution -----------------------------------------------------------


def test_attribution_last_and_first_touch(spark):
    import datetime as dt

    from kgraph_spark.operators.event_analytics import conversion_attribution

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    ev = spark.createDataFrame(
        [
            (1, t(0), 1, "click", 0.0), (2, t(5), 1, "click", 0.0),
            (3, t(6), 1, "purchase", 1.0),
            (4, t(9), 1, "purchase", 1.0),           # same last touch (id 2)
            (5, t(1), 2, "purchase", 1.0),            # no prior touch
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    last = {r["conversion_id"]: r for r in conversion_attribution(ev).collect()}
    assert last[3]["touch_id"] == 2 and last[4]["touch_id"] == 2
    assert last[5]["touch_id"] is None
    first = {
        r["conversion_id"]: r["touch_id"]
        for r in conversion_attribution(ev, model="first").collect()
    }
    assert first[3] == 1 and first[4] == 1
    import pytest

    with pytest.raises(ValueError):
        conversion_attribution(ev, model="linear")


def test_ema_smooth_hand_case(spark):
    from kgraph_spark.operators.event_analytics import ema_smooth

    import datetime as dt

    rows = [
        (1, dt.datetime(2026, 1, 1, 0, 0, s), 100 + s, float(v))
        for s, v in enumerate([10.0, 20.0, 40.0])
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    out = {r["event_id"]: r["ema"] for r in ema_smooth(ev, k=2).collect()}
    # k=2: weights current=2, prev=1.
    assert out[100] == 10.0                      # warm-up: only own value
    assert out[101] == round((2 * 20 + 1 * 10) / 3, 6)
    assert out[102] == round((2 * 40 + 1 * 20) / 3, 6)


def test_ema_smooth_keys_independent_and_validation(spark):
    import datetime as dt

    import pytest as _pytest

    from kgraph_spark.operators.event_analytics import ema_smooth

    ev = spark.createDataFrame(
        [
            (1, dt.datetime(2026, 1, 1), 1, 100.0),
            (2, dt.datetime(2026, 1, 2), 2, 0.0),
        ],
        "user_id long, ts timestamp, event_id long, value double",
    )
    out = {r["user_id"]: r["ema"] for r in ema_smooth(ev, k=4).collect()}
    assert out[1] == 100.0 and out[2] == 0.0     # no cross-user leakage
    with _pytest.raises(ValueError):
        ema_smooth(ev, k=0)


def test_seasonality_dow_epoch_convention(spark):
    from kgraph_spark.operators.event_analytics import seasonality_profile

    # 2024-01-01 was a Monday → dow 0; 14:30 UTC → hour 14
    ev = spark.createDataFrame(
        [("a", "2024-01-01 14:30:00"), ("a", "2024-01-07 03:00:00")],
        "event_type string, ts_s string",
    ).select("event_type", F.col("ts_s").cast("timestamp").alias("ts"))
    out = {(r["dow"], r["hour"]): r for r in seasonality_profile(ev).collect()}
    assert (0, 14) in out and (6, 3) in out  # Monday=0 … Sunday=6
    assert out[(0, 14)]["lift"] == 84.0  # 168 * 1/2


def test_rfm_bands_deterministic(spark):
    from kgraph_spark.operators.event_analytics import rfm_scores

    rows = []
    for u in range(10):
        for k in range(u + 1):  # user u has u+1 events, value 1.0 each
            rows.append((u, f"2024-01-0{(u % 9) + 1} 00:00:00", 1.0))
    ev = spark.createDataFrame(rows, "user_id long, ts_s string, value double") \
        .select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value")
    out = {r["user_id"]: r for r in rfm_scores(ev).collect()}
    # frequency strictly increasing with user id → f bands step 1..5 by pairs
    assert out[0]["f"] == 1 and out[9]["f"] == 5
    assert out[9]["frequency"] == 10 and out[9]["monetary_fp"] == 100000
    # most recent user (u=8, Jan 9) gets the top recency band
    assert out[8]["r"] == 5 and out[8]["recency_s"] == 0
    assert all(r["segment"] == f"R{r['r']}F{r['f']}M{r['m']}"
               for r in out.values())


def _seq_events(spark, seq):
    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 1, 1, 0, 0, i), 1, t, 1.0)
        for i, t in enumerate(seq)
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_stationary_period2_chain_stays_uniform(spark):
    from kgraph_spark.operators.event_analytics import stationary_distribution

    # A<->B deterministic swap: uniform is stationary, no floor dust
    out = {r["state"]: r["pi_micro"]
           for r in stationary_distribution(_seq_events(spark, "ABABAB")).collect()}
    assert out == {"A": 500_000, "B": 500_000}


def test_stationary_3cycle_preserves_uniform_and_mass(spark):
    from kgraph_spark.operators.event_analytics import stationary_distribution

    # A->B->C->A rotation: mass rotates wholly, floor(1e6/3) each
    out = {r["state"]: r["pi_micro"]
           for r in stationary_distribution(_seq_events(spark, "ABCABCABC")).collect()}
    assert out == {"A": 333_333, "B": 333_333, "C": 333_333}


def test_stationary_biased_chain_concentrates(spark):
    from kgraph_spark.operators.event_analytics import stationary_distribution

    # p(A->A)=2/3, p(A->B)=1/3, p(B->A)=1: stationary pi(A)=0.75
    out = {r["state"]: r["pi_micro"]
           for r in stationary_distribution(_seq_events(spark, "AAABAAAB")).collect()}
    assert 740_000 < out["A"] < 760_000 and out["B"] < 260_000
    # mass conservation up to documented floor dust (<= iters * states)
    assert 1_000_000 - 10 <= out["A"] + out["B"] <= 1_000_000


def test_watermark_lateness_audit_hand_case(spark):
    from kgraph_spark.operators.event_analytics import watermark_lateness_audit

    rows = [("a", 100, 100), ("a", 100, 150), ("a", 100, 400), ("b", 0, 30)]
    df = spark.createDataFrame(rows, "g string, et long, at long")
    out = {(r["g"], r["w_sec"]): r for r in watermark_lateness_audit(
        df, "et", "at", thresholds=(0, 60), group_col="g").collect()}
    # W=0: anything with skew > 0 drops; W=60: only the 300s straggler
    assert out[("a", 0)]["n_late"] == 2 and out[("a", 60)]["n_late"] == 1
    assert out[("a", 60)]["late_micro"] == 333333
    assert out[("b", 60)]["n_late"] == 0 and out[("b", 60)]["late_micro"] == 0


def test_cuped_removes_covariate_imbalance(spark):
    from kgraph_spark.operators.event_analytics import cuped_adjust

    # y = 10x exactly; sides differ ONLY through covariate imbalance,
    # so adjusted means must coincide at 25 with theta 10, r2 = 1
    rows = [(True, 10.0, 1.0), (True, 20.0, 2.0), (True, 30.0, 3.0),
            (False, 20.0, 2.0), (False, 30.0, 3.0), (False, 40.0, 4.0)]
    df = spark.createDataFrame(rows, "side boolean, y double, x double")
    out = {r["side"]: r for r in cuped_adjust(df, "y", "x", "side").collect()}
    assert out[True]["theta"] == 10.0 and out[False]["theta"] == 10.0
    assert out[True]["mean_y"] == 20.0 and out[False]["mean_y"] == 30.0
    assert out[True]["mean_y_adj"] == 25.0 and out[False]["mean_y_adj"] == 25.0
    assert out[True]["r2_micro"] == 1_000_000


def test_cuped_zero_variance_covariate_falls_back(spark):
    from kgraph_spark.operators.event_analytics import cuped_adjust

    rows = [(True, 10.0, 5.0), (True, 20.0, 5.0), (False, 30.0, 5.0)]
    df = spark.createDataFrame(rows, "side boolean, y double, x double")
    out = {r["side"]: r for r in cuped_adjust(df, "y", "x", "side").collect()}
    assert out[True]["theta"] is None and out[True]["mean_y_adj"] == 15.0


def test_sprt_monitor_hand_case(spark):
    import math
    from datetime import datetime

    import pytest

    from kgraph_spark.operators.event_analytics import sprt_monitor

    # day 0: 2/4 successes; day 1: 3/4 — H0 p=0.25 vs H1 p=0.5
    def ts(day, i):
        return datetime(2024, 1, 1 + day, 0, 0, i)

    rows = [(ts(0, i), i < 2) for i in range(4)] + [(ts(1, i), i < 3) for i in range(4)]
    df = spark.createDataFrame(rows, "ts timestamp, success boolean")
    out = {r["day"]: r for r in sprt_monitor(df, p0=0.25, p1=0.5).collect()}
    days = sorted(out)
    l1, l0 = math.log(0.5 / 0.25), math.log(0.5 / 0.75)
    d0 = round((2 * l1 + 2 * l0) * 1e9)
    d1 = round((3 * l1 + 1 * l0) * 1e9)
    assert out[days[0]]["llr"] == pytest.approx(round(d0 / 1e9, 6), abs=1e-9)
    assert out[days[1]]["llr"] == pytest.approx(round((d0 + d1) / 1e9, 6), abs=1e-9)
    assert (out[days[1]]["n_cum"], out[days[1]]["x_cum"]) == (8, 5)
    # day-2 llr 1.55 < ln(19): still 'continue'
    assert out[days[1]]["decision"] == "continue"
    # a long success run crosses the upper boundary
    many = spark.createDataFrame(
        [(ts(0, i % 60), True) for i in range(12)], "ts timestamp, success boolean"
    )
    assert sprt_monitor(many, p0=0.25, p1=0.5).first()["decision"] == "accept_h1"
    with pytest.raises(ValueError):
        sprt_monitor(df, p0=0.5, p1=0.5)


def test_pettitt_hand_case(spark):
    import math

    import pytest

    from kgraph_spark.operators.event_analytics import pettitt_test

    # clean level shift after t=3: [1,2,3 | 10,11,12]
    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 3.0), (4, 10.0), (5, 11.0), (6, 12.0)],
        "t long, v double",
    )
    r = pettitt_test(df).first()
    # U_3 = 2*(1+2+3) - 3*7 = -9 is the extreme -> split after t=3
    assert (r["n"], r["t_star"], r["u_star"], r["k_u"]) == (6, 3, -9, 9)
    p = min(1.0, 2.0 * math.exp(-6.0 * 81 / (216.0 + 36.0)))
    assert r["p_approx"] == pytest.approx(round(p, 6), abs=1e-9)
    # constant series: every U_t = 0, earliest t wins, p capped at 1
    flat = spark.createDataFrame([(i, 5.0) for i in range(1, 5)], "t long, v double")
    rf = pettitt_test(flat).first()
    assert (rf["t_star"], rf["k_u"], rf["p_approx"]) == (1, 0, 1.0)


def test_ewma_chart_hand_case(spark):
    import pytest

    from kgraph_spark.operators.event_analytics import ewma_chart

    # long stable run with one big final spike: only the spike day flags
    # (the in-sample sigma includes the spike, so the run must be long
    # enough that one point can't inflate the limits past its own EMA)
    rows = [(i, 10.0) for i in range(1, 30)] + [(30, 60.0)]
    df = spark.createDataFrame(rows, "t long, v double")
    out = {r["t"]: r for r in ewma_chart(df).collect()}
    # warm-up row: ema = v exactly
    assert out[1]["ema"] == pytest.approx(10.0, abs=1e-6)
    # spike day: ema = (60*128 + 10*(64+...+1)) / 255
    expected = (60 * 128 + 10 * 127) / 255.0
    assert out[30]["ema"] == pytest.approx(round(expected, 6), abs=1e-6)
    assert out[30]["out_of_control"] is True
    assert all(not out[t]["out_of_control"] for t in range(1, 30))
    # limits are symmetric around the mean
    r = out[5]
    assert r["ucl"] - r["center"] == pytest.approx(r["center"] - r["lcl"], abs=1e-5)
    with pytest.raises(ValueError):
        ewma_chart(df, k=0)


def test_hurst_rs_trend_and_oscillation(spark):
    from kgraph_spark.operators.event_analytics import hurst_rs

    # pure linear ramp: R/S grows ~ m -> slope (Hurst) ~ 1
    ramp = spark.createDataFrame(
        [(i, i) for i in range(640)], "t long, qv long"
    )
    rows = hurst_rs(ramp, "t", "qv", sizes=(8, 16, 32, 64)).collect()
    assert {r["m"]: r["n_blocks"] for r in rows} == {8: 80, 16: 40, 32: 20, 64: 10}
    assert all(r["hurst"] == rows[0]["hurst"] for r in rows)
    assert rows[0]["hurst"] == pytest.approx(1.0, abs=0.05)
    # deterministic 0/1 oscillation: ln(R/S) = 0 at every size -> H = 0
    osc = spark.createDataFrame(
        [(i, i % 2) for i in range(640)], "t long, qv long"
    )
    rows2 = hurst_rs(osc, "t", "qv", sizes=(8, 16, 32, 64)).collect()
    assert rows2[0]["hurst"] == pytest.approx(0.0, abs=1e-9)
    for r in rows2:
        assert r["mean_log_rs"] == pytest.approx(0.0, abs=1e-9)
    # constant series: every block degenerate -> no rows
    const = spark.createDataFrame([(i, 5) for i in range(64)], "t long, qv long")
    assert hurst_rs(const, "t", "qv", sizes=(8, 16)).count() == 0


def test_entropy_rate_hand_case(spark):
    from kgraph_spark.operators.event_analytics import entropy_rate

    # aa x2, ab x2, ba x4: H = (2*1 + 2*1 + 0)/8 = 0.5 bits, k=2
    rows = [("a", "a")] * 2 + [("a", "b")] * 2 + [("b", "a")] * 4
    df = spark.createDataFrame(rows, "prev string, cur string")
    r = entropy_rate(df, "prev", "cur").first()
    assert (r["n_transitions"], r["k_states"]) == (8, 2)
    assert r["h_rate_bits"] == pytest.approx(0.5, abs=1e-6)
    assert r["h_max_bits"] == pytest.approx(1.0, abs=1e-9)
    assert r["normalized"] == pytest.approx(0.5, abs=1e-6)
    # fully deterministic process: H = 0; single state -> NULL normalized
    det = spark.createDataFrame([("a", "b")] * 3, "prev string, cur string")
    r2 = entropy_rate(det, "prev", "cur").first()
    assert r2["h_rate_bits"] == pytest.approx(0.0, abs=1e-9)
    assert r2["normalized"] is None


def test_bollinger_bands_hand_case(spark):
    from kgraph_spark.operators.event_analytics import bollinger_bands

    # warm-up rows (<3 in window) carry NULL bands and breach=False;
    # a 100 after seven 1s breaches the exact integer band test
    series = spark.createDataFrame(
        [(i, 1.0) for i in range(7)] + [(7, 100.0)], "t long, v double"
    )
    rows = {r["t"]: r for r in bollinger_bands(series, "t", "v", window=7).collect()}
    assert rows[0]["roll_mean"] is None and rows[0]["breach"] is False
    assert rows[1]["roll_std"] is None
    assert rows[6]["roll_mean"] == pytest.approx(1.0, abs=1e-9)
    assert rows[6]["roll_std"] == pytest.approx(0.0, abs=1e-9)
    assert rows[6]["pct_b"] is None and rows[6]["breach"] is False
    r7 = rows[7]
    assert r7["roll_mean"] == pytest.approx(106.0 / 7.0, abs=1e-6)
    assert r7["breach"] is True and r7["pct_b"] > 1.0
    # constant series never breaches
    const = spark.createDataFrame([(i, 2.5) for i in range(10)], "t long, v double")
    assert all(
        not r["breach"] for r in bollinger_bands(const, "t", "v").collect()
    )


def test_series_peaks_hand_case(spark):
    from kgraph_spark.operators.event_analytics import series_peaks

    series = spark.createDataFrame(
        list(enumerate([1.0, 3.0, 2.0, 2.0, 5.0, 4.0])), "t long, v double"
    )
    rows = {r["t"]: r for r in series_peaks(series, "t", "v").collect()}
    assert rows[1]["is_peak"] and rows[4]["is_peak"]
    assert not any(rows[t]["is_peak"] for t in (0, 2, 3, 5))
    # the 3->2 drop is not a trough (next neighbor ties at 2)
    assert not rows[2]["is_trough"]
    assert rows[1]["rise"] == pytest.approx(2.0, abs=1e-9)
    assert rows[1]["fall"] == pytest.approx(-1.0, abs=1e-9)
    # endpoints carry NULL missing-side deltas and are never peaks
    assert rows[0]["rise"] is None and rows[5]["fall"] is None


def test_record_audit_hand_case(spark):
    from kgraph_spark.operators.event_analytics import record_audit

    # strictly increasing: every bucket is a record; H_4 = 25/12
    inc = spark.createDataFrame(
        [(i, float(i)) for i in range(4)], "t long, v double"
    )
    r = record_audit(inc, "t", "v").first()
    assert (r["n"], r["n_records"]) == (4, 4)
    assert r["expected_records"] == pytest.approx(25.0 / 12.0, abs=1e-6)
    assert r["record_ratio"] == pytest.approx(4.0 / (25.0 / 12.0), abs=1e-5)
    # strictly decreasing: only the first bucket is a record
    dec = spark.createDataFrame(
        [(i, float(10 - i)) for i in range(4)], "t long, v double"
    )
    assert record_audit(dec, "t", "v").first()["n_records"] == 1
    # a tie with the running max is NOT a new record
    tie = spark.createDataFrame(
        [(0, 5.0), (1, 5.0), (2, 6.0)], "t long, v double"
    )
    assert record_audit(tie, "t", "v").first()["n_records"] == 2


def test_turning_points_hand_case(spark):
    import math

    from kgraph_spark.operators.event_analytics import turning_points_test

    # [1,3,2,4,3]: three interior turning points of three interior buckets
    s = spark.createDataFrame(
        list(enumerate([1.0, 3.0, 2.0, 4.0, 3.0])), "t long, v double"
    )
    r = turning_points_test(s, "t", "v").first()
    assert (r["n"], r["n_turning"]) == (5, 3)
    assert r["expected"] == pytest.approx(2.0, abs=1e-9)
    assert r["z"] == pytest.approx(1.0 / math.sqrt(51.0 / 90.0), abs=1e-6)
    # monotone series has zero turning points
    mono = spark.createDataFrame(
        [(i, float(i)) for i in range(5)], "t long, v double"
    )
    assert turning_points_test(mono, "t", "v").first()["n_turning"] == 0


def test_ljung_box_hand_case(spark):
    from kgraph_spark.operators.event_analytics import ljung_box

    # alternating 1,2,1,2,1,2: r1 = -45/54, r2 = 36/54,
    # Q1 = 48*r1^2/5, Q2 = 48*(r1^2/5 + r2^2/4) = 12 exactly
    rows = [(t, float(1 + t % 2)) for t in range(6)]
    df = spark.createDataFrame(rows, "t long, v double")
    out = {r["lag"]: r for r in ljung_box(df, "t", "v", n_lags=2).collect()}
    assert out[1]["r"] == pytest.approx(-45.0 / 54.0, abs=1e-6)
    assert out[2]["r"] == pytest.approx(36.0 / 54.0, abs=1e-6)
    r1, r2 = -45.0 / 54.0, 36.0 / 54.0
    assert out[1]["q_lb"] == pytest.approx(48 * r1 * r1 / 5, abs=1e-5)
    assert out[2]["q_lb"] == pytest.approx(
        48 * (r1 * r1 / 5 + r2 * r2 / 4), abs=1e-5
    )
    # constant series -> den = 0 -> NULL r and q
    const = spark.createDataFrame([(t, 5.0) for t in range(5)], "t long, v double")
    assert ljung_box(const, "t", "v", n_lags=1).first()["r"] is None


def test_forecast_eval_hand_case(spark):
    from kgraph_spark.operators.event_analytics import forecast_eval

    # ramp 1..8: naive err = 1 (7 evals), seasonal lag-2 err = 2 (6)
    rows = [(t, float(t + 1)) for t in range(8)]
    df = spark.createDataFrame(rows, "t long, v double")
    out = {r["method"]: r for r in forecast_eval(df, "t", "v", season=2).collect()}
    nv, sn = out["naive"], out["seasonal_naive"]
    assert (nv["n_eval"], sn["n_eval"]) == (7, 6)
    assert nv["mae"] == pytest.approx(1.0, abs=1e-9)
    assert nv["rmse"] == pytest.approx(1.0, abs=1e-9)
    assert nv["mase"] == pytest.approx(1.0, abs=1e-9)
    assert sn["mae"] == pytest.approx(2.0, abs=1e-9)
    assert sn["mase"] == pytest.approx(2.0, abs=1e-9)
    # sMAPE of naive on the ramp: mean of 2*1/(y+p) over the 7 pairs
    exp = sum(2.0 / (2 * t + 3) for t in range(7)) / 7
    assert nv["smape"] == pytest.approx(exp, abs=1e-5)


def test_sax_symbolize_hand_case(spark):
    from kgraph_spark.operators.event_analytics import sax_symbolize

    # 0,0,0,10,10,10 with 3-wide windows: z = -1 then +1 -> 'a','d'
    rows = [(t, 0.0 if t < 3 else 10.0) for t in range(6)]
    df = spark.createDataFrame(rows, "t long, v double")
    out = {r["win"]: r for r in sax_symbolize(df, "t", "v", window=3).collect()}
    assert out[0]["n_buckets"] == 3 and out[1]["n_buckets"] == 3
    assert out[0]["paa"] == pytest.approx(0.0, abs=1e-9)
    assert out[1]["paa"] == pytest.approx(10.0, abs=1e-9)
    assert out[0]["z"] == pytest.approx(-1.0, abs=1e-6)
    assert out[1]["z"] == pytest.approx(1.0, abs=1e-6)
    assert (out[0]["symbol"], out[1]["symbol"]) == ("d" if False else "a", "d")
    # constant series: var = 0 -> NULL z and symbol
    const = sax_symbolize(
        spark.createDataFrame([(t, 5.0) for t in range(6)], "t long, v double"),
        "t", "v", window=3,
    ).collect()
    assert all(r["z"] is None and r["symbol"] is None for r in const)
    # mild z inside (-0.6745, 0) and (0, 0.6745) map to 'b' and 'c'
    rows2 = [(0, 4.0), (1, 5.0), (2, 3.0), (3, 8.0)]
    out2 = {
        r["win"]: r
        for r in sax_symbolize(
            spark.createDataFrame(rows2, "t long, v double"), "t", "v", window=2
        ).collect()
    }
    # mean 5, sigma ~1.871: paa 4.5 -> z -0.267 'b'; paa 5.5 -> 'c'
    assert (out2[0]["symbol"], out2[1]["symbol"]) == ("b", "c")


def test_dickey_fuller_hand_case(spark):
    import math

    from kgraph_spark.operators.event_analytics import dickey_fuller

    # y = 0,2,1,3,2: rho = -1.2, SSR = 1.8, t = -1.2*sqrt(5/0.9)
    rows = list(enumerate([0.0, 2.0, 1.0, 3.0, 2.0]))
    df = spark.createDataFrame(rows, "t long, v double")
    r = dickey_fuller(df, "t", "v").first()
    assert r["n"] == 4
    assert r["rho"] == pytest.approx(-1.2, abs=1e-6)
    assert r["t_stat"] == pytest.approx(-1.2 * math.sqrt(5.0 / 0.9), abs=1e-5)
    # perfect alternation: regression fits exactly -> SSR 0 -> NULL t
    alt = list(enumerate([0.0, 1.0, 0.0, 1.0, 0.0, 1.0]))
    r2 = dickey_fuller(
        spark.createDataFrame(alt, "t long, v double"), "t", "v"
    ).first()
    assert r2["rho"] == pytest.approx(-2.0, abs=1e-9)
    assert r2["t_stat"] is None


def test_fano_burstiness_hand_case(spark):
    import datetime as dt

    from kgraph_spark.operators.event_analytics import fano_burstiness

    base = dt.datetime(2024, 1, 1)
    rows = [
        (base,),
        (base + dt.timedelta(microseconds=1),),
        (base + dt.timedelta(microseconds=2),),
        (base + dt.timedelta(hours=1),),
    ]
    df = spark.createDataFrame(rows, "ts timestamp")
    r = fano_burstiness(df, "ts", 3600).first()
    # buckets [3, 1]: mean 2, pop var 1 -> fano 0.5
    assert r["n_buckets"] == 2
    assert r["fano"] == pytest.approx(0.5, abs=1e-9)
    # gaps [1, 1, 3599999998] us
    g = [1.0, 1.0, 3599999998.0]
    m = sum(g) / 3
    var = sum((x - m) ** 2 for x in g) / 3
    assert r["n_intervals"] == 3
    assert r["cv2"] == pytest.approx(var / (m * m), rel=1e-5)


def test_skyline_2d_hand_case(spark):
    from kgraph_spark.operators.event_analytics import skyline_2d

    rows = [
        (1, 5, 1), (2, 3, 3), (3, 1, 5),
        (4, 2, 2),          # dominated by (3,3)
        (5, 3, 3),          # duplicate skyline point - survives
        (6, 3, 2),          # same x as skyline, smaller y - dominated
    ]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {r["id"] for r in skyline_2d(df, "id", "x", "y").collect()}
    assert got == {1, 2, 3, 5}
    # single point is trivially skyline
    one = spark.createDataFrame([(9, 0, 0)], "id long, x long, y long")
    assert {r["id"] for r in skyline_2d(one, "id", "x", "y").collect()} == {9}


def test_seasonal_decompose_hand_case(spark):
    from kgraph_spark.operators.event_analytics import (
        seasonal_decompose_additive,
    )

    # v_t = t + s[t%3] with s = [0, 3, -3]: trend recovers t exactly,
    # seasonal recovers s, resid 0 (interior rows)
    s_pat = {0: 0.0, 1: 3.0, 2: -3.0}
    rows = [(t, float(t) + s_pat[t % 3]) for t in range(9)]
    df = spark.createDataFrame(rows, "t long, v double")
    out = {r["t"]: r for r in
           seasonal_decompose_additive(df, "t", "v", period=3).collect()}
    assert len(out) == 9
    assert out[0]["trend"] is None and out[8]["trend"] is None  # warm-up
    for t in range(1, 8):
        assert out[t]["trend"] == pytest.approx(float(t), abs=1e-6)
        assert out[t]["seasonal"] == pytest.approx(s_pat[t % 3], abs=1e-6)
        assert out[t]["resid"] == pytest.approx(0.0, abs=1e-5)
    # a gap in the grid disables the trend across it (contiguity gate)
    gappy = [(t, 1.0) for t in [0, 1, 2, 3, 10, 11, 12, 13]]
    g = {r["t"]: r for r in seasonal_decompose_additive(
        spark.createDataFrame(gappy, "t long, v double"), "t", "v", period=3
    ).collect()}
    assert g[3]["trend"] is None and g[10]["trend"] is None
    assert g[1]["trend"] == pytest.approx(1.0, abs=1e-9)


def test_hour_uniformity_ks_hand_case(spark):
    import datetime as dt

    from kgraph_spark.operators.event_analytics import hour_uniformity_ks

    base = dt.datetime(2024, 1, 1)
    # everything in hour 0: D = |24*4 - 4|/96 = 92/96
    rows = [(base + dt.timedelta(minutes=i),) for i in range(4)]
    r = hour_uniformity_ks(
        spark.createDataFrame(rows, "ts timestamp")
    ).first()
    assert r["n"] == 4 and r["at_hour"] == 0
    assert r["d"] == pytest.approx(92.0 / 96.0, abs=1e-6)
    # perfectly uniform: one event per hour -> D = 0
    uni = [(base + dt.timedelta(hours=h),) for h in range(24)]
    r2 = hour_uniformity_ks(
        spark.createDataFrame(uni, "ts timestamp")
    ).first()
    assert r2["d"] == pytest.approx(0.0, abs=1e-9)


def test_pot_tail_fit_hand_case(spark):
    from kgraph_spark.operators.event_analytics import pot_tail_fit

    # excesses over 10: [1,2,3] -> m=2, s2=2/3, ratio=6:
    # xi = -2.5, sigma = 1*(1+6) = 7
    rows = [(11.0,), (12.0,), (13.0,), (5.0,), (5.0,)]
    df = spark.createDataFrame(rows, "v double")
    r = pot_tail_fit(df, "v", 10.0).first()
    assert (r["n"], r["n_exceed"]) == (5, 3)
    assert r["exceed_rate"] == pytest.approx(0.6, abs=1e-9)
    assert r["mean_excess"] == pytest.approx(2.0, abs=1e-9)
    assert r["xi"] == pytest.approx(-2.5, abs=1e-6)
    assert r["sigma"] == pytest.approx(7.0, abs=1e-6)
    # one exceedance -> no variance -> NULL xi, mean still reported
    one = spark.createDataFrame([(11.0,), (5.0,)], "v double")
    r2 = pot_tail_fit(one, "v", 10.0).first()
    assert r2["mean_excess"] == pytest.approx(1.0, abs=1e-9)
    assert r2["xi"] is None


def test_max_drawdown_hand_case(spark):
    from kgraph_spark.operators.event_analytics import max_drawdown

    # flows 5,-2,-3,4 -> cum [5,3,0,4]: mdd 5 at t=2, peak-at 5
    rows = [(0, 5.0), (1, -2.0), (2, -3.0), (3, 4.0)]
    df = spark.createDataFrame(rows, "t long, v double")
    r = max_drawdown(df, "t", "v", v_scale=1).first()
    assert r["n"] == 4
    assert r["final_cum"] == pytest.approx(4.0, abs=1e-9)
    assert r["peak"] == pytest.approx(5.0, abs=1e-9)
    assert r["max_drawdown"] == pytest.approx(5.0, abs=1e-9)
    assert r["max_drawdown_pct"] == pytest.approx(1.0, abs=1e-9)
    assert r["trough_t"] == 2
    # monotone rise -> zero drawdown
    up = [(t, 1.0) for t in range(4)]
    r2 = max_drawdown(
        spark.createDataFrame(up, "t long, v double"), "t", "v", v_scale=1
    ).first()
    assert r2["max_drawdown"] == 0.0 and r2["trough_t"] == 0


def test_active_users_hand_case(spark):
    import datetime as dt

    from kgraph_spark.operators.event_analytics import active_users

    base = dt.datetime(2024, 1, 1)
    rows = [(1, base + dt.timedelta(days=d)) for d in range(8)] + [
        (2, base)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {r["day"] - 19723: r for r in active_users(df).collect()}
    assert len(out) == 8
    # day 0: both users -> dau 2, wau 2; day 6: u1 only daily, u2 in
    # the trailing window -> 1/2; day 7: u2 aged out -> 1/1
    assert (out[0]["dau"], out[0]["wau"]) == (2, 2)
    assert (out[6]["dau"], out[6]["wau"]) == (1, 2)
    assert out[6]["stickiness"] == pytest.approx(0.5, abs=1e-9)
    assert (out[7]["dau"], out[7]["wau"]) == (1, 1)
    # duplicate events same day count once
    dup = df.union(spark.createDataFrame([(2, base)], "user_id long, ts timestamp"))
    assert {r["day"] - 19723: r["dau"] for r in active_users(dup).collect()}[0] == 2


def test_slo_burn_hand_case(spark):
    import datetime as dt

    from kgraph_spark.operators.event_analytics import slo_burn

    base = dt.datetime(2024, 1, 1)
    rows = (
        [(base, "error")] + [(base, "click")] * 9
        + [(base + dt.timedelta(days=1), "click")] * 10
    )
    df = spark.createDataFrame(rows, "ts timestamp, event_type string")
    out = {r["day"] - 19723: r for r in slo_burn(df).collect()}
    assert out[0]["rate"] == pytest.approx(0.1, abs=1e-9)
    assert out[0]["burn"] == pytest.approx(2.0, abs=1e-6)   # 0.1 / 0.05
    # day 1 window pools both days: 1/20 = exactly the SLO -> burn 1
    assert out[1]["window_rate"] == pytest.approx(0.05, abs=1e-9)
    assert out[1]["burn"] == pytest.approx(1.0, abs=1e-6)


def test_ses_forecast_hand_case(spark):
    from kgraph_spark.operators.event_analytics import ses_forecast

    rows = [(0, 10.0), (1, 20.0), (2, 10.0)]
    df = spark.createDataFrame(rows, "t long, v double")
    out = {r["t"]: r for r in ses_forecast(df, "t", "v", alpha=0.3).collect()}
    assert out[0]["smoothed"] == pytest.approx(10.0, abs=1e-6)
    assert out[1]["smoothed"] == pytest.approx(13.0, abs=1e-6)   # .3*20+.7*10
    assert out[2]["smoothed"] == pytest.approx(12.1, abs=1e-6)
    assert out[0]["forecast_err"] is None
    assert out[1]["forecast_err"] == pytest.approx(10.0, abs=1e-5)
    assert out[2]["forecast_err"] == pytest.approx(-3.0, abs=1e-5)


def test_week_over_week_hand_case(spark):
    import datetime as dt
    import math

    from kgraph_spark.operators.event_analytics import week_over_week

    base = dt.datetime(2024, 1, 1)
    rows = [(base,)] * 10 + [(base + dt.timedelta(days=7),)] * 20
    df = spark.createDataFrame(rows, "ts timestamp")
    out = week_over_week(df).collect()
    assert len(out) == 1  # only day 7 has a lag twin
    r = out[0]
    assert (r["n"], r["n_prev"]) == (20, 10)
    assert r["ratio"] == pytest.approx(2.0, abs=1e-9)
    assert r["z"] == pytest.approx(10.0 / math.sqrt(30.0), abs=1e-6)


def test_seasonal_strength_hand_case(spark):
    from kgraph_spark.operators.event_analytics import seasonal_strength

    # exact trend+seasonal, zero residual -> both strengths 1
    s_pat = {0: 0.0, 1: 3.0, 2: -3.0}
    rows = [(t, float(t) + s_pat[t % 3]) for t in range(9)]
    df = spark.createDataFrame(rows, "t long, v double")
    r = seasonal_strength(df, "t", "v", period=3).first()
    assert r["n_used"] == 7
    assert r["var_resid"] == pytest.approx(0.0, abs=1e-6)
    assert r["strength_seasonal"] == pytest.approx(1.0, abs=1e-5)
    assert r["strength_trend"] == pytest.approx(1.0, abs=1e-5)
    # flat series: every component variance 0 -> NULL strengths
    flat = spark.createDataFrame([(t, 5.0) for t in range(9)], "t long, v double")
    rf = seasonal_strength(flat, "t", "v", period=3).first()
    assert rf["strength_seasonal"] is None and rf["var_resid"] == 0.0


def test_type_mix_entropy_daily_hand_case(spark):
    import datetime as dt

    from kgraph_spark.operators.event_analytics import type_mix_entropy_daily

    base = dt.datetime(2024, 1, 1)
    rows = (
        [(base, "a")] * 2 + [(base, "b")] * 2
        + [(base + dt.timedelta(days=1), "a")] * 4
    )
    df = spark.createDataFrame(rows, "ts timestamp, event_type string")
    out = {r["day"] - 19723: r for r in type_mix_entropy_daily(df).collect()}
    assert out[0]["h_bits"] == pytest.approx(1.0, abs=1e-6)
    assert out[0]["k_types"] == 2 and out[0]["h_delta"] is None
    assert out[1]["h_bits"] == pytest.approx(0.0, abs=1e-9)
    assert out[1]["h_delta"] == pytest.approx(-1.0, abs=1e-6)


def test_day_envelope_hand_case(spark):
    import datetime as dt

    from kgraph_spark.operators.event_analytics import day_envelope

    base = dt.datetime(2024, 1, 1)
    rows = []
    # hour 0 of day d carries d+1 events (counts 1..10 across 10 days)
    for d in range(10):
        for i in range(d + 1):
            rows.append((base + dt.timedelta(days=d, seconds=i),))
    df = spark.createDataFrame(rows, "ts timestamp")
    out = {r["hod"]: r for r in day_envelope(df).collect()}
    r = out[0]
    assert r["n_days"] == 10
    assert (r["p10"], r["p50"], r["p90"]) == (1, 5, 9)


def test_peak_concentration_hand_case(spark):
    import datetime as dt

    from kgraph_spark.operators.event_analytics import peak_concentration

    base = dt.datetime(2024, 1, 1)
    counts = {0: 10, 1: 5, 2: 3, 3: 1, 4: 1}
    rows = [
        (base + dt.timedelta(hours=h, seconds=i),)
        for h, n in counts.items()
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "ts timestamp")
    r = peak_concentration(df, top_k=3).first()
    assert r["n"] == 20
    assert r["top_share"] == pytest.approx(18.0 / 20.0, abs=1e-9)


def test_peak_load_hand_case(spark):
    import datetime as dt

    from kgraph_spark.operators.event_analytics import peak_load

    base = dt.datetime(2024, 1, 1)
    rows = (
        [(base + dt.timedelta(seconds=i),) for i in range(5)]
        + [(base + dt.timedelta(minutes=3, seconds=i),) for i in range(10)]
        + [(base + dt.timedelta(minutes=10, seconds=i),) for i in range(2)]
    )
    df = spark.createDataFrame(rows, "ts timestamp")
    r = peak_load(df, window_minutes=5).first()
    assert r["n_minutes"] == 3
    assert r["peak_count"] == 15          # minutes 0+3 inside one window
    assert r["peak_per_min"] == pytest.approx(3.0, abs=1e-9)
