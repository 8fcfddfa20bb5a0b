"""Event analytics: time-grid forward fill and Markov transition matrix
— hand-computed small cases (funnel/retention live in test_temporal)."""

from __future__ import annotations

from datetime import datetime

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
