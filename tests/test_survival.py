"""Hand-verified cases for the survival operators (Kaplan-Meier,
log-rank, lifetime constructions) — the numbers below are worked by hand
with the textbook product-limit / Mantel-Cox formulas."""

from __future__ import annotations

import math
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from kgraph_spark.operators.survival import (
    kaplan_meier,
    logrank_test,
    session_lifetimes,
    user_lifetimes,
)


def test_kaplan_meier_hand_case(spark):
    # durations: 1 (event), 2 (event), 2 (censored), 3 (event)
    df = spark.createDataFrame(
        [(1, 1), (2, 1), (2, 0), (3, 1)], "dur_sec long, event int"
    )
    rows = {r["t"]: r for r in kaplan_meier(df).collect()}
    assert sorted(rows) == [1, 2, 3]
    # t=1: 4 at risk, 1 death -> S = 3/4
    assert (rows[1]["n_risk"], rows[1]["d"], rows[1]["censored"]) == (4, 1, 0)
    assert rows[1]["survival"] == pytest.approx(0.75, abs=1e-6)
    # t=2: 3 at risk, 1 death + 1 censor -> S = 3/4 * 2/3 = 1/2
    assert (rows[2]["n_risk"], rows[2]["d"], rows[2]["censored"]) == (3, 1, 1)
    assert rows[2]["survival"] == pytest.approx(0.5, abs=1e-6)
    # t=3: last subject dies -> exact 0, not a rounded tiny float
    assert (rows[3]["n_risk"], rows[3]["d"]) == (1, 1)
    assert rows[3]["survival"] == 0.0


def test_kaplan_meier_censor_only_times_shrink_risk_set(spark):
    # censor at t=1 leaves the risk set before the t=2 death
    df = spark.createDataFrame([(1, 0), (2, 1), (3, 1)], "dur_sec long, event int")
    rows = {r["t"]: r for r in kaplan_meier(df).collect()}
    assert sorted(rows) == [2, 3]  # event times only
    assert rows[2]["n_risk"] == 2
    assert rows[2]["survival"] == pytest.approx(0.5, abs=1e-6)


def test_logrank_hand_case(spark):
    # group1 dies at 1, 2; group0 dies at 3, 4 (no censoring)
    df = spark.createDataFrame(
        [(1, 1, True), (2, 1, True), (3, 1, False), (4, 1, False)],
        "dur_sec long, event int, grp boolean",
    )
    r = logrank_test(df).first()
    assert (r["n"], r["n1"], r["o1"]) == (4, 2, 2)
    # micro-rounded expectation/variance terms, exactly as the operator sums
    e1 = (500000 + 333333) / 1e6
    v = (250000 + 222222) / 1e6
    z = (2 - e1) / math.sqrt(v)
    assert r["e1"] == pytest.approx(e1, abs=1e-9)
    assert r["v"] == pytest.approx(v, abs=1e-9)
    assert r["z"] == pytest.approx(round(z, 6), abs=1e-9)
    assert r["chi2"] == pytest.approx(round(z * z, 6), abs=1e-9)
    # identical curves (alternating assignment) -> small |z|; flipped
    # groups negate z
    flipped = df.select("dur_sec", "event", (~F.col("grp")).alias("grp"))
    assert logrank_test(flipped).first()["z"] == pytest.approx(
        -r["z"], abs=1e-6
    )


def test_logrank_degenerate_null(spark):
    # one group empty -> zero variance -> NULL z/chi2
    df = spark.createDataFrame(
        [(1, 1, True), (2, 1, True)], "dur_sec long, event int, grp boolean"
    )
    r = logrank_test(df).first()
    assert r["z"] is None and r["chi2"] is None


def test_session_lifetimes_construction(spark):
    base = datetime(2024, 1, 1)
    rows = [
        (1, base),  # session 1 starts
        (1, datetime(2024, 1, 1, 0, 0, 10)),  # same session, dur 10
        (1, datetime(2024, 1, 1, 1, 6, 40)),  # gap 3990s > 1800 -> session 2
        (1, datetime(2024, 1, 1, 1, 6, 45)),  # dur 5; ends at global max
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {r["session_idx"]: r for r in session_lifetimes(df).collect()}
    assert sorted(out) == [1, 2]
    # session 1 ended a full gap before the corpus close -> observed
    assert (out[1]["dur_sec"], out[1]["event"]) == (10, 1)
    # session 2 runs into the corpus close -> censored
    assert (out[2]["dur_sec"], out[2]["event"]) == (5, 0)
    assert out[1]["start_sec"] == int(base.timestamp())


def test_user_lifetimes_censoring(spark):
    rows = [
        (1, datetime(2024, 1, 1)),
        (1, datetime(2024, 1, 2)),  # last seen day 2 of 10 -> churned
        (2, datetime(2024, 1, 1)),
        (2, datetime(2024, 1, 10)),  # active at window close -> censored
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {r["user_id"]: r for r in user_lifetimes(df).collect()}
    assert (out[1]["dur_sec"], out[1]["event"]) == (86400, 1)
    assert (out[2]["dur_sec"], out[2]["event"]) == (9 * 86400, 0)


def test_nelson_aalen_hand_case(spark):
    from kgraph_spark.operators.survival import nelson_aalen

    # durations: 1 (event), 2 (event), 2 (censored), 3 (event)
    df = spark.createDataFrame(
        [(1, 1), (2, 1), (2, 0), (3, 1)], "dur_sec long, event int"
    )
    rows = {r["t"]: r for r in nelson_aalen(df).collect()}
    # H(1) = 1/4; H(2) = 1/4 + 1/3; H(3) = ... + 1/1
    assert rows[1]["cumhaz"] == pytest.approx(0.25, abs=1e-6)
    assert rows[2]["cumhaz"] == pytest.approx(0.25 + 1 / 3, abs=1e-6)
    assert rows[3]["cumhaz"] == pytest.approx(0.25 + 1 / 3 + 1.0, abs=1e-6)
    assert rows[2]["survival_fh"] == pytest.approx(
        math.exp(-(0.25 + 1 / 3)), abs=1e-6
    )
    # Fleming-Harrington survival dominates Kaplan-Meier everywhere
    from kgraph_spark.operators.survival import kaplan_meier

    km = {r["t"]: r["survival"] for r in kaplan_meier(df).collect()}
    for t, r in rows.items():
        assert r["survival_fh"] >= km[t] - 1e-9


def test_rmst_hand_case(spark):
    from kgraph_spark.operators.survival import restricted_mean_survival

    # KM steps: S=0.75 at 1, 0.5 at 2, 0 at 3
    df = spark.createDataFrame(
        [(1, 1), (2, 1), (2, 0), (3, 1)], "dur_sec long, event int"
    )
    r = restricted_mean_survival(df, tau=4).first()
    # 1*1 + 0.75*1 + 0.5*1 + 0*(4-3) = 2.25
    assert (r["tau"], r["n"], r["d_events"]) == (4, 4, 3)
    assert r["rmst_sec"] == pytest.approx(2.25, abs=1e-6)
    # tau before the first event: curve flat at 1 -> rmst = tau
    early = restricted_mean_survival(df, tau=1).first()
    # t=1 event is included (t <= tau): 1*1 + 0.75*(1-1) = 1.0
    assert early["rmst_sec"] == pytest.approx(1.0, abs=1e-6)
    # all censored -> no steps -> rmst = tau exactly
    cens = spark.createDataFrame([(5, 0), (7, 0)], "dur_sec long, event int")
    rc = restricted_mean_survival(cens, tau=3).first()
    assert rc["d_events"] == 0 and rc["rmst_sec"] == pytest.approx(3.0, abs=1e-9)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        restricted_mean_survival(df, tau=0)


def test_gehan_wilcoxon_hand_case(spark):
    import math

    from kgraph_spark.operators.survival import gehan_wilcoxon

    # t=1 g1 event; t=2 g0 event; t=3 g1 event; t=4 g0 censored
    rows = [(1, 1, True), (2, 1, False), (3, 1, True), (4, 0, False)]
    df = spark.createDataFrame(rows, "dur_sec long, event int, grp boolean")
    r = gehan_wilcoxon(df).first()
    assert (r["n"], r["n1"]) == (4, 2)
    # W = (4*1-1*2) + (3*0-1*1) + (2*1-1*1) = 2
    # V = 1*2*2*3/3 + 1*1*2*2/2 + 1*1*1*1/1 = 4 + 2 + 1 = 7
    assert r["w_sum"] == pytest.approx(2.0, abs=1e-9)
    assert r["v"] == pytest.approx(7.0, abs=1e-6)
    assert r["z"] == pytest.approx(2.0 / math.sqrt(7.0), abs=1e-6)
    # identical groups -> W = 0
    same = [(1, 1, True), (1, 1, False), (2, 1, True), (2, 1, False)]
    r2 = gehan_wilcoxon(
        spark.createDataFrame(same, "dur_sec long, event int, grp boolean")
    ).first()
    assert r2["w_sum"] == pytest.approx(0.0, abs=1e-9)
