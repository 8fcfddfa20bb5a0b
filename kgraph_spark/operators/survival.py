"""Survival analysis: Kaplan-Meier product-limit curves and the two-group
log-rank test over right-censored durations — "how long do users/documents
/sessions live, and does cohort A outlive cohort B" for retention and
pipeline-SLA questions the point-estimate operators (evt_retention,
evt_user_lifecycle) can't answer once observation windows truncate the
data: censoring is the whole point here, and naive mean-lifetime deflates
exactly the cohorts that are still alive.

Reference parity: the reference's eval notebooks reach for lifelines-style
retention curves on entity-usage decay (kgraph/eval glue); these operators
restate that intent as engine-exact, oracle-checkable DataFrame transforms.

Cross-engine float discipline (the repo-wide recipe, stats.py header):
counts (deaths, censors, at-risk) accumulate as exact longs over the
DISTINCT duration grid; each per-time floating term — ln(1 − d/n) for the
product limit, the hypergeometric mean/variance terms for log-rank — is
rounded ONCE to a fixed integer grid (nano for log-survival, micro for
the log-rank sums), summed exactly, and the final exp/sqrt runs on
identical doubles in both engines.

Scale notes (the 100-TB reading): both operators aggregate to the distinct
duration grid first (one hash aggregate with map-side partials over the
raw rows), then run ordered windows over |grid| rows — bounded by the
duration resolution (whole seconds here), never by |data|. No collect, no
cartesian; the cumulative at-risk counts are single-pass prefix sums on
the grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "user_lifetimes",
    "session_lifetimes",
    "kaplan_meier",
    "nelson_aalen",
    "restricted_mean_survival",
    "logrank_test",
]

_DEC = "decimal(38,0)"


def user_lifetimes(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    censor_tail_sec: int = 259_200,
) -> DataFrame:
    """Per-user right-censored lifetime from an event stream: (user_id,
    first_ts_sec, dur_sec, event). Duration is last-minus-first event
    time in whole seconds; a user whose last event falls within
    `censor_tail_sec` of the corpus' global maximum is CENSORED
    (event=0 — still alive when the window closed), otherwise their
    silence is an observed churn (event=1). The standard study-window
    construction; the tail width is a contract parameter, not a guess.

    Scale: one hash aggregate per user + one broadcast single-row join
    for the global horizon.
    """
    t = F.floor(F.unix_micros(F.col(ts_col).cast("timestamp")) / 1_000_000).cast(
        "long"
    )
    per_u = (
        events.filter(F.col(ts_col).isNotNull() & F.col(user_col).isNotNull())
        .groupBy(user_col)
        .agg(
            F.min(t).alias("first_ts_sec"),
            F.max(t).alias("last_ts_sec"),
        )
    )
    horizon = per_u.agg(F.max("last_ts_sec").alias("_gmax"))
    return per_u.crossJoin(F.broadcast(horizon)).select(
        F.col(user_col).alias("user_id"),
        "first_ts_sec",
        (F.col("last_ts_sec") - F.col("first_ts_sec")).alias("dur_sec"),
        (F.col("last_ts_sec") < F.col("_gmax") - F.lit(censor_tail_sec))
        .cast("int")
        .alias("event"),
    )


def session_lifetimes(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_sec: int = 1800,
) -> DataFrame:
    """Per-session right-censored duration from an event stream:
    (user_id, session_idx, start_sec, dur_sec, event). Sessions are the
    standard inactivity-gap construction (gap > gap_sec starts a new
    one, the evt_sessionize semantics); duration is last-minus-first
    event time in whole seconds (µs-exact integer arithmetic, floored
    once). A session whose last event falls within gap_sec of the
    corpus' global maximum is CENSORED (event=0 — the gap that would
    prove it ended never had room to elapse); every other session is an
    observed completion (event=1). This is the boundary-censoring KM
    inputs need: dropping those tail sessions instead would bias short.

    Session assignment depends only on the sorted timestamps (equal
    timestamps gap 0 ≤ gap_sec regardless of tie order), so the output
    is deterministic under any tie-break.

    Scale: one per-user ordered window (shuffles on user_id once —
    bounded by the hottest user's event count, the sessionize cost
    everywhere in this repo) + one hash aggregate per session.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col).orderBy(us)
    gap = us - F.lag(us).over(w)
    marked = (
        events.filter(F.col(ts_col).isNotNull() & F.col(user_col).isNotNull())
        .withColumn("_us", us)
        .withColumn(
            "_new",
            F.when(gap.isNull() | (gap > gap_sec * 1_000_000), 1).otherwise(0),
        )
    )
    sess = marked.withColumn(
        "session_idx",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    per_s = sess.groupBy(F.col(user_col).alias("user_id"), "session_idx").agg(
        F.min("_us").alias("_smin"),
        F.max("_us").alias("_smax"),
    )
    horizon = per_s.agg(F.max("_smax").alias("_gmax"))
    return per_s.crossJoin(F.broadcast(horizon)).select(
        "user_id",
        "session_idx",
        F.floor(F.col("_smin") / 1_000_000).cast("long").alias("start_sec"),
        F.floor((F.col("_smax") - F.col("_smin")) / 1_000_000)
        .cast("long")
        .alias("dur_sec"),
        (F.col("_smax") <= F.col("_gmax") - F.lit(gap_sec) * 1_000_000)
        .cast("int")
        .alias("event"),
    )


def _grid(df: DataFrame, duration_col: str, event_col: str) -> DataFrame:
    """Exact (t, d, c) counts on the distinct duration grid."""
    q = df.filter(
        F.col(duration_col).isNotNull() & F.col(event_col).isNotNull()
    ).select(
        F.col(duration_col).cast("long").alias("t"),
        F.col(event_col).cast("int").alias("e"),
    )
    return q.groupBy("t").agg(
        F.sum("e").cast("long").alias("d"),
        F.sum(1 - F.col("e")).cast("long").alias("c"),
    )


def kaplan_meier(
    df: DataFrame, duration_col: str = "dur_sec", event_col: str = "event"
) -> DataFrame:
    """Kaplan-Meier product-limit estimator: one row per distinct EVENT
    time t with (t, n_risk, d, censored, survival). n_risk counts
    subjects with duration ≥ t (censored subjects leave the risk set
    after their censor time — the estimator's entire reason to exist);
    S(t) = Π_{t_i ≤ t} (1 − d_i/n_i) over event times.

    The product accumulates as an exact prefix sum of NANO-rounded
    ln(1 − d/n) terms (one transcendental per grid row, rounded once,
    summed as longs), exp'd and round-6'd at the end — partition order
    can never wobble the curve. A time where the whole remaining risk
    set dies (d = n) has survival exactly 0 (ln undefined; emitted as
    the literal, not a rounded tiny float).

    Scale: one hash aggregate to the duration grid + one ordered window
    over |grid| rows.
    """
    g = _grid(df, duration_col, event_col)
    w = Window.orderBy("t")
    # at-risk at t = N − (all deaths+censors strictly before t)
    risked = g.select(
        "t",
        "d",
        F.col("c").alias("censored"),
        (
            F.sum(F.col("d") + F.col("c")).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            )
            - (F.col("d") + F.col("c"))
        ).alias("_before"),
    )
    total = g.agg(F.sum(F.col("d") + F.col("c")).cast("long").alias("_n"))
    risked = risked.crossJoin(F.broadcast(total)).withColumn(
        "n_risk", (F.col("_n") - F.col("_before")).cast("long")
    )
    ev = risked.filter(F.col("d") > 0)
    ln_nano = F.when(
        F.col("d") < F.col("n_risk"),
        F.round(
            F.log(F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk").cast("double"))
            * F.lit(1_000_000_000.0),
            0,
        ).cast("long"),
    )
    w2 = Window.orderBy("t")
    stepped = ev.select(
        "t",
        "n_risk",
        "d",
        "censored",
        F.sum(ln_nano).over(w2.rowsBetween(Window.unboundedPreceding, 0)).alias("_lns"),
        F.max((F.col("d") == F.col("n_risk")).cast("int"))
        .over(w2.rowsBetween(Window.unboundedPreceding, 0))
        .alias("_dead"),
    )
    return stepped.select(
        "t",
        "n_risk",
        "d",
        "censored",
        F.when(F.col("_dead") == 1, F.lit(0.0))
        .otherwise(
            F.round(F.exp(F.col("_lns").cast("double") / F.lit(1_000_000_000.0)), 6)
        )
        .alias("survival"),
    )


def logrank_test(
    df: DataFrame,
    duration_col: str = "dur_sec",
    event_col: str = "event",
    group_col: str = "grp",
) -> DataFrame:
    """Two-group log-rank (Mantel-Cox) test: one row (n, n1, o1, e1, v,
    z, chi2). grp is boolean-castable; group 1 is the TRUE side. At each
    distinct event time: observed group-1 deaths d1 vs the hypergeometric
    expectation d·n1/n and variance d·(n1/n)(1−n1/n)(n−d)/(n−1); the
    test statistic is z = (O1 − E1)/√V (chi2 = z², 1 dof). The standard
    censoring-aware "do these two retention curves differ" gate.

    Counts are exact longs on the distinct duration grid; each per-time
    expectation/variance term is MICRO-rounded once and summed exactly
    (the chi2_independence recipe), so both engines replay the identical
    final (O1−E1)/√V double sequence. Times with n < 2 contribute zero
    variance by definition. Degenerate stratification (V = 0: one group
    empty, or no deaths) → NULL z/chi2.

    Scale: one hash aggregate to the (t, grp) grid, two prefix sums over
    |grid| rows, one single-row fold.
    """
    q = df.filter(
        F.col(duration_col).isNotNull()
        & F.col(event_col).isNotNull()
        & F.col(group_col).isNotNull()
    ).select(
        F.col(duration_col).cast("long").alias("t"),
        F.col(event_col).cast("int").alias("e"),
        F.col(group_col).cast("boolean").cast("int").alias("g"),
    )
    per_t = q.groupBy("t").agg(
        F.sum("e").cast("long").alias("d"),
        F.sum(F.col("e") * F.col("g")).cast("long").alias("d1"),
        F.count(F.lit(1)).cast("long").alias("leave"),
        F.sum("g").cast("long").alias("leave1"),
    )
    w = Window.orderBy("t")
    tot = per_t.agg(
        F.sum("leave").cast("long").alias("_n"),
        F.sum("leave1").cast("long").alias("_n1"),
    )
    risked = (
        per_t.select(
            "t",
            "d",
            "d1",
            (
                F.sum("leave").over(w.rowsBetween(Window.unboundedPreceding, 0))
                - F.col("leave")
            ).alias("_b"),
            (
                F.sum("leave1").over(w.rowsBetween(Window.unboundedPreceding, 0))
                - F.col("leave1")
            ).alias("_b1"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "t",
            "d",
            "d1",
            (F.col("_n") - F.col("_b")).alias("nr"),
            (F.col("_n1") - F.col("_b1")).alias("nr1"),
        )
        .filter(F.col("d") > 0)
    )
    nd = F.col("nr").cast("double")
    n1d = F.col("nr1").cast("double")
    dd = F.col("d").cast("double")
    e_term = F.round(dd * n1d / nd * F.lit(1_000_000.0), 0).cast("long")
    v_term = F.when(
        F.col("nr") >= 2,
        F.round(
            dd
            * (n1d / nd)
            * (F.lit(1.0) - n1d / nd)
            * (nd - dd)
            / (nd - F.lit(1.0))
            * F.lit(1_000_000.0),
            0,
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    folded = risked.groupBy().agg(
        F.sum("d1").cast("long").alias("o1"),
        F.sum(e_term).cast("long").alias("_e1u"),
        F.sum(v_term).cast("long").alias("_vu"),
    )
    out = folded.crossJoin(F.broadcast(tot))
    e1 = F.col("_e1u").cast("double") / F.lit(1_000_000.0)
    v = F.col("_vu").cast("double") / F.lit(1_000_000.0)
    z = (F.col("o1").cast("double") - e1) / F.sqrt(v)
    return out.select(
        F.col("_n").alias("n"),
        F.col("_n1").alias("n1"),
        "o1",
        F.round(e1, 6).alias("e1"),
        F.round(v, 6).alias("v"),
        F.when(v > 0, F.round(z, 6)).alias("z"),
        F.when(v > 0, F.round(z * z, 6)).alias("chi2"),
    )


def nelson_aalen(
    df: DataFrame, duration_col: str = "dur_sec", event_col: str = "event"
) -> DataFrame:
    """Nelson-Aalen cumulative hazard: one row per distinct event time t
    with (t, n_risk, d, censored, cumhaz, survival_fh). H(t) =
    Σ_{t_i ≤ t} d_i/n_i — the estimator of choice when the hazard
    INCREMENTS matter (failure-intensity monitoring) rather than the
    survival fraction; survival_fh = exp(−H) is the Fleming-Harrington
    curve, the KM alternative with better small-risk-set behavior.

    Same discipline as kaplan_meier: exact at-risk prefix sums on the
    distinct duration grid; each d/n hazard increment is NANO-rounded
    once and summed exactly, so the curve is partition-order-proof;
    ONE exp at the end. cumhaz is exact nano-arithmetic all the way —
    no transcendental at all on that column.

    Scale: one hash aggregate to the duration grid + one ordered window
    over |grid| rows.
    """
    g = _grid(df, duration_col, event_col)
    w = Window.orderBy("t")
    risked = g.select(
        "t",
        "d",
        F.col("c").alias("censored"),
        (
            F.sum(F.col("d") + F.col("c")).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            )
            - (F.col("d") + F.col("c"))
        ).alias("_before"),
    )
    total = g.agg(F.sum(F.col("d") + F.col("c")).cast("long").alias("_n"))
    risked = risked.crossJoin(F.broadcast(total)).withColumn(
        "n_risk", (F.col("_n") - F.col("_before")).cast("long")
    )
    ev = risked.filter(F.col("d") > 0)
    inc_nano = F.round(
        F.col("d").cast("double") / F.col("n_risk").cast("double")
        * F.lit(1_000_000_000.0),
        0,
    ).cast("long")
    w2 = Window.orderBy("t")
    stepped = ev.select(
        "t",
        "n_risk",
        "d",
        "censored",
        F.sum(inc_nano).over(w2.rowsBetween(Window.unboundedPreceding, 0)).alias("_hn"),
    )
    h = F.col("_hn").cast("double") / F.lit(1_000_000_000.0)
    return stepped.select(
        "t",
        "n_risk",
        "d",
        "censored",
        F.round(h, 6).alias("cumhaz"),
        F.round(F.exp(-h), 6).alias("survival_fh"),
    )


def restricted_mean_survival(
    df: DataFrame,
    tau: int,
    duration_col: str = "dur_sec",
    event_col: str = "event",
) -> DataFrame:
    """Restricted mean survival time — ∫₀^τ S(t)dt over the Kaplan-Meier
    step curve: one row (tau, n, d_events, rmst_sec). THE single-number
    summary of a censored duration distribution ("expected seconds
    survived in the first τ"), well-defined even when the naive mean is
    not (censoring) and the median is not (S never crosses 0.5).

    The integral is the exact step sum Σ S(t_{i−1})·(t_i − t_{i−1}) +
    S(t_last)·(τ − t_last) over event times ≤ τ (S(t₀⁻) = 1): each
    segment area — a round-6 survival times an exact integer gap — is
    MICRO-rounded once and summed exactly, so the fold is
    partition-order-proof. No event times ≤ τ → rmst = τ (the curve is
    flat at 1).

    Scale: the KM grid machinery plus one |grid|-row window and one
    single-row fold.
    """
    if tau <= 0:
        raise ValueError("tau must be positive")
    km = kaplan_meier(df, duration_col=duration_col, event_col=event_col).filter(
        F.col("t") <= tau
    )
    w = Window.orderBy("t")
    seg = km.select(
        "t",
        "d",
        "survival",
        F.lag("t", 1, 0).over(w).alias("_pt"),
        F.lag("survival", 1, 1.0).over(w).alias("_ps"),
    )
    area_micro = F.round(
        F.col("_ps") * (F.col("t") - F.col("_pt")).cast("double")
        * F.lit(1_000_000.0),
        0,
    ).cast("long")
    folded = seg.agg(
        F.sum(area_micro).cast("long").alias("_amid"),
        F.sum("d").cast("long").alias("d_events"),
        F.max(F.struct("t", "survival")).alias("_last"),
    )
    n_row = _grid(df, duration_col, event_col).agg(
        F.sum(F.col("d") + F.col("c")).cast("long").alias("n")
    )
    out = folded.crossJoin(F.broadcast(n_row))
    tail_micro = F.round(
        F.coalesce(F.col("_last.survival"), F.lit(1.0))
        * (F.lit(tau) - F.coalesce(F.col("_last.t"), F.lit(0))).cast("double")
        * F.lit(1_000_000.0),
        0,
    ).cast("long")
    rmst = (F.coalesce(F.col("_amid"), F.lit(0)) + tail_micro).cast(
        "double"
    ) / F.lit(1_000_000.0)
    return out.select(
        F.lit(tau).cast("long").alias("tau"),
        "n",
        F.coalesce(F.col("d_events"), F.lit(0)).alias("d_events"),
        F.round(rmst, 6).alias("rmst_sec"),
    )


def gehan_wilcoxon(
    df: DataFrame,
    duration_col: str = "dur_sec",
    event_col: str = "event",
    group_col: str = "grp",
) -> DataFrame:
    """Gehan–Breslow–Wilcoxon test — the EARLY-difference-weighted
    log-rank (weight = n at risk, so deaths while most subjects
    remain count most): one row (n, n1, w_sum, v, z, chi2). Use it
    when the curves separate early then converge (early churn burst);
    logrank_test weighs all times equally and can miss that. Same
    censoring-aware grid, different alternative.

    EXACTER than the unweighted test: with w_t = n_t the weighted
    observed-minus-expected Σ n_t·d1_t − d_t·n1_t is PURE integer
    arithmetic (no rounding at all); only the variance terms
    d·n1·(n−n1)·(n−d)/(n−1) are micro-rounded and exact-summed.
    One grid aggregate, two prefix sums, one fold — the logrank plan.
    """
    q = df.filter(
        F.col(duration_col).isNotNull()
        & F.col(event_col).isNotNull()
        & F.col(group_col).isNotNull()
    ).select(
        F.col(duration_col).cast("long").alias("t"),
        F.col(event_col).cast("int").alias("e"),
        F.col(group_col).cast("boolean").cast("int").alias("g"),
    )
    per_t = q.groupBy("t").agg(
        F.sum("e").cast("long").alias("d"),
        F.sum(F.col("e") * F.col("g")).cast("long").alias("d1"),
        F.count(F.lit(1)).cast("long").alias("leave"),
        F.sum("g").cast("long").alias("leave1"),
    )
    w = Window.orderBy("t")
    tot = per_t.agg(
        F.sum("leave").cast("long").alias("_n"),
        F.sum("leave1").cast("long").alias("_n1"),
    )
    risked = (
        per_t.select(
            "t",
            "d",
            "d1",
            (
                F.sum("leave").over(w.rowsBetween(Window.unboundedPreceding, 0))
                - F.col("leave")
            ).alias("_b"),
            (
                F.sum("leave1").over(w.rowsBetween(Window.unboundedPreceding, 0))
                - F.col("leave1")
            ).alias("_b1"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "t",
            "d",
            "d1",
            (F.col("_n") - F.col("_b")).alias("nr"),
            (F.col("_n1") - F.col("_b1")).alias("nr1"),
        )
        .filter(F.col("d") > 0)
    )
    w_term = (
        F.col("nr").cast(_DEC) * F.col("d1").cast(_DEC)
        - F.col("d").cast(_DEC) * F.col("nr1").cast(_DEC)
    )
    nd = F.col("nr").cast("double")
    v_term = F.when(
        F.col("nr") >= 2,
        F.round(
            F.col("d").cast("double")
            * F.col("nr1").cast("double")
            * (F.col("nr") - F.col("nr1")).cast("double")
            * (nd - F.col("d").cast("double"))
            / (nd - F.lit(1.0))
            * F.lit(1_000_000.0),
            0,
        ).cast(_DEC),
    ).otherwise(F.lit(0).cast(_DEC))
    folded = risked.groupBy().agg(
        F.sum(w_term).alias("w_sum"),
        F.sum(v_term).alias("_vu"),
    )
    out = folded.crossJoin(F.broadcast(tot))
    v = F.col("_vu").cast("double") / F.lit(1_000_000.0)
    z = F.col("w_sum").cast("double") / F.sqrt(v)
    return out.select(
        F.col("_n").alias("n"),
        F.col("_n1").alias("n1"),
        F.col("w_sum").cast("double").alias("w_sum"),
        F.round(v, 6).alias("v"),
        F.when(v > 0, F.round(z, 6)).alias("z"),
        F.when(v > 0, F.round(z * z, 6)).alias("chi2"),
    )
