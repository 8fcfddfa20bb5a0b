"""Event-series analytics over a raw event stream — the query family a
training-data platform runs on its OWN telemetry and on any interaction
log that becomes training data. Two operators (funnel/retention live in
temporal.py), each formulated for the minimum shuffle count:

* time-grid forward fill — per-(user, hour) gap-free series: hour grid
  generated with sequence() per user (explode bounded by span, not by
  corpus), observed sums in round-6 FIXED-POINT longs (float sliding sums
  are association-order-dependent across engines — temporal.rolling_stats
  lesson), fill via last(ignorenulls) running window.
* transition matrix — first-order Markov transitions from per-user lead()
  pairs; row-normalized probabilities divide two exact integers, so the
  only float op is one division (identical IEEE in any engine).

At 100 TB every operator moves each event row through at most one user-
keyed exchange plus one bounded aggregate; a hot user costs its own row
count, never a pair count. No reference twin (wware/kgraph has no event
analytics) — this is the beyond-reference family J addendum (COVERAGE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def time_grid_fill(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Gap-free per-(user, bucket) value series with forward fill — the
    resample/ffill step a feature pipeline runs before any as-of join or
    rolling window. Each user's grid spans their own [first, last] bucket
    (sequence + explode — grid size bounded by the user's span, never by
    the corpus or the global time range); missing buckets carry the last
    observed sum forward. Returns (user_id, bucket_start_us, value_filled,
    is_observed); value_filled is NULL only before a user's first
    observation (can't happen here — grids start at an observed bucket).

    Observed sums accumulate as round-6 fixed-point longs (order-free
    integer addition; a float sum's association order differs per engine —
    the rolling_stats lesson), divided back out once. The fill itself is a
    last(ignorenulls) running window — no arithmetic, so forwarded values
    are bit-identical to their source."""
    us_per_bucket = bucket_seconds * 1_000_000
    b = (F.unix_micros(F.col(ts_col).cast("timestamp")) / us_per_bucket).cast("long")
    units = F.round(F.col(value_col) * 1000000, 0).cast("long")
    hourly = (
        events.select(F.col(user_col).alias("_u"), b.alias("_b"), units.alias("_v"))
        .groupBy("_u", "_b")
        .agg(F.round(F.sum("_v") / 1000000.0, 6).alias("_obs"))
    )
    span = hourly.groupBy("_u").agg(F.min("_b").alias("_lo"), F.max("_b").alias("_hi"))
    grid = span.select("_u", F.explode(F.sequence("_lo", "_hi")).alias("_b"))
    joined = grid.join(hourly, ["_u", "_b"], "left")
    w = (
        Window.partitionBy("_u")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.col("_u").alias(user_col),
        (F.col("_b") * us_per_bucket).alias("bucket_start_us"),
        F.last("_obs", ignorenulls=True).over(w).alias("value_filled"),
        F.col("_obs").isNotNull().alias("is_observed"),
    )


def transition_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    (from_type, to_type, n_transitions, prob) where prob row-normalizes
    each from_type (round 6; the division is the only float op — both
    engines divide the same two exact integers). Ordering ties on equal
    timestamps break by order_col, so the pairing replays identically
    under any arrival order.

    One user exchange builds the lead() pairs; the count aggregate and the
    tiny per-from_type normalization window run over |type|² rows, not
    event rows."""
    w = Window.partitionBy("_u").orderBy(F.col("_ts").asc(), F.col("_o").asc())
    pairs = (
        events.select(
            F.col(user_col).alias("_u"),
            F.col(ts_col).alias("_ts"),
            F.col(order_col).alias("_o"),
            F.col(type_col).alias("from_type"),
        )
        .withColumn("to_type", F.lead("from_type").over(w))
        .filter(F.col("to_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_transitions")
    )
    wt = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(wt), 6
        ).alias("prob"),
    )


def cusum_changepoints(
    events: DataFrame,
    kappa: float = 0.25,
    h: float = 3.0,
    value_col: str = "value",
    group_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-group CUSUM changepoint summary (group, n_events,
    max_cusum_high, max_cusum_low, n_alarms, first_alarm_ts): the
    classic Page (1954) drift detector — s⁺ₜ = max(0, s⁺ₜ₋₁ + (xₜ−μ−κ))
    catches upward level shifts, s⁻ₜ the mirror image, alarm when either
    exceeds h. The per-metric drift gate a recurring corpus/telemetry
    pipeline runs between builds; unlike per-window outlier flags
    (mad_outliers) CUSUM accumulates SMALL persistent shifts.

    The recursion is not computed as a recursion: s⁺ₜ = prefixₜ −
    min(0, min_{j≤t} prefixⱼ) where prefixₜ = Σ(xᵢ−μ−κ) — two standard
    running windows per group (cumulative sum + running min), both on the
    ONE (group, ts, id)-sorted exchange, no HOF arrays, no per-row Python.
    μ is the group's own mean. Everything is round-6 FIXED-POINT longs
    (values quantized once; μ = sum div n exact integer division; κ, h
    quantized params), so every s value — and the alarm decision — is
    exact integer arithmetic, bit-identical in any engine. Event-id
    tie-break makes equal-timestamp ordering deterministic."""
    v = F.round(F.col(value_col) * scale).cast("long")
    k_fp = int(round(kappa * scale))
    h_fp = int(round(h * scale))
    base = events.select(
        F.col(group_col).alias("group"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
        v.alias("_v"),
    ).filter(F.col("_v").isNotNull())
    mu = base.groupBy("group").agg(
        F.expr("sum(_v) div count(*)").cast("long").alias("_mu"),
    )
    seq = Window.partitionBy("group").orderBy("_ts", "_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rows = (
        base.join(mu, "group")
        .withColumn("_dh", F.col("_v") - F.col("_mu") - F.lit(k_fp))
        .withColumn("_dl", F.col("_mu") - F.lit(k_fp) - F.col("_v"))
        .withColumn("_ph", F.sum("_dh").over(seq))
        .withColumn("_pl", F.sum("_dl").over(seq))
        .withColumn("_sh", F.col("_ph") - F.least(F.min("_ph").over(seq), F.lit(0)))
        .withColumn("_sl", F.col("_pl") - F.least(F.min("_pl").over(seq), F.lit(0)))
        .withColumn("_alarm", (F.col("_sh") > h_fp) | (F.col("_sl") > h_fp))
    )
    return rows.groupBy("group").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.max("_sh") / F.lit(float(scale)), 6).alias("max_cusum_high"),
        F.round(F.max("_sl") / F.lit(float(scale)), 6).alias("max_cusum_low"),
        F.sum(F.col("_alarm").cast("long")).cast("long").alias("n_alarms"),
        F.min(F.when(F.col("_alarm"), F.col("_ts"))).alias("first_alarm_ts"),
    )


def conversion_attribution(
    events: DataFrame,
    touch_types: tuple[str, ...] = ("click",),
    conversion_type: str = "purchase",
    model: str = "last",
    group_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Touch attribution: for every conversion event, the touch event that
    gets the credit — `model='last'` (the touch most recently before or at
    the conversion) or `'first'` (the user's earliest touch up to that
    point). The events-log question behind ads/referral accounting and,
    in a data-pipeline setting, "which ingest source fed this accepted
    document". Returns (group, conversion_id, conversion_ts, touch_id,
    touch_ts, touch_type); conversions with no prior touch keep NULLs
    (unattributed — counted, not dropped).

    ONE (group, ts, id)-sorted exchange: touches and conversions ride the
    same window; last-touch is last_value(ignorenulls) over the running
    frame, first-touch is first_value(ignorenulls) — no self-join, no
    per-conversion scan. Event-id tie-break; a same-instant touch sorts
    BEFORE the conversion (id order) and may claim credit, the documented
    tie rule."""
    if model not in ("last", "first"):
        raise ValueError("model must be 'last' or 'first'")
    base = events.select(
        F.col(group_col).alias("group"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
        F.col(type_col).alias("_ty"),
    )
    touch = F.when(
        F.col("_ty").isin(*touch_types),
        F.struct(F.col("_ts").alias("ts"), F.col("_id").alias("id"), F.col("_ty").alias("ty")),
    )
    seq = Window.partitionBy("group").orderBy("_ts", "_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    picker = F.last(touch, ignorenulls=True) if model == "last" else F.first(
        touch, ignorenulls=True
    )
    rows = base.withColumn("_touch", picker.over(seq)).filter(
        F.col("_ty") == conversion_type
    )
    return rows.select(
        "group",
        F.col("_id").alias("conversion_id"),
        F.col("_ts").alias("conversion_ts"),
        F.col("_touch.id").alias("touch_id"),
        F.col("_touch.ts").alias("touch_ts"),
        F.col("_touch.ty").alias("touch_type"),
    )


def ema_smooth(
    events: DataFrame,
    key_col: str = "user_id",
    order_cols: tuple[str, str] = ("ts", "event_id"),
    value_col: str = "value",
    k: int = 8,
) -> DataFrame:
    """Per-key exponential moving average with the recursion ELIMINATED:
    a k-lag truncated EMA (half-life decay, weight 2^(k-1-j) for lag j)
    instead of the textbook ema_t = α·x + (1-α)·ema_{t-1} — the recursive
    form forces strictly sequential evaluation; the truncated form is k
    window lags on ONE sorted per-key exchange, and the dropped tail's
    weight is 2^-k (< 0.4% at k=8) — the same recursion-removal move as
    cusum_changepoints' prefix-min identity.

    Exactness contract: values quantized to integer micro-units, the
    weighted numerator and the present-lag weight denominator are EXACT
    longs (weights are powers of two, so the fold is just shifts), one
    double division + round-6 at the end — replayable bit-for-bit in any
    SQL engine. Warm-up rows (< k history) normalize by the weights
    actually present, not the full window.

    Returns events' key/order columns + `ema` (round-6 double)."""
    if not 1 <= k <= 62:
        raise ValueError("k must be in [1, 62]")
    w = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_cols])
    q = F.round(F.col(value_col) * 1_000_000).cast("long")
    num = F.lit(0).cast("long")
    den = F.lit(0).cast("long")
    for j in range(k):
        weight = 1 << (k - 1 - j)
        lagged = F.lag(q, j).over(w)
        num = num + F.coalesce(lagged * weight, F.lit(0))
        den = den + F.when(lagged.isNotNull(), F.lit(weight)).otherwise(F.lit(0))
    return events.select(
        key_col,
        *order_cols,
        F.round(num.cast("double") / (den * F.lit(1_000_000)).cast("double"), 6).alias(
            "ema"
        ),
    )


def seasonality_profile(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
) -> DataFrame:
    """Hour-of-week seasonality per group: (group, dow, hour, n, lift) —
    lift = observed / uniform expectation (168·n_cell / n_group), the
    load-shape fingerprint batch schedulers and anomaly baselines read.
    dow is computed FROM EPOCH ARITHMETIC (0 = Monday), never from an
    engine dayofweek() — DuckDB says Sunday=0, Spark says Sunday=1, and
    session timezones bend both; integer µs division is convention-free.
    ONE hash aggregate + one group-total broadcast join; a single
    round-6 division."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    days = F.floor(us / 86_400_000_000).cast("long")
    cells = (
        events.select(
            F.col(group_col).alias("grp"),
            ((days + 3) % 7).cast("int").alias("dow"),  # 1970-01-01 = Thursday
            ((F.floor(us / 3_600_000_000)) % 24).cast("int").alias("hour"),
        )
        .groupBy("grp", "dow", "hour")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    totals = cells.groupBy("grp").agg(F.sum("n").cast("long").alias("_tot"))
    return (
        cells.join(F.broadcast(totals), "grp")
        .select(
            F.col("grp").alias(group_col),
            "dow",
            "hour",
            "n",
            F.round(F.lit(168) * F.col("n") / F.col("_tot"), 6).alias("lift"),
        )
    )


def rfm_scores(
    events: DataFrame,
    n_bands: int = 5,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """RFM (recency / frequency / monetary) banding per user: (user_id,
    recency_s, frequency, monetary_fp, r, f, m, segment). Recency is
    seconds from the user's last event to the CORPUS max timestamp (a
    data-derived anchor, so reruns are deterministic — never wall-clock
    now()); monetary rides as round-4 fixed-point longs. Bands are
    rank-derived quantile bins with total tie order (metric, user_id):
    band = 1 + n_bands·(rank−1) div n_users — exact integer arithmetic,
    identical in any engine, unlike ntile() whose tie placement is
    engine-luck. r is REVERSED (most recent = highest band) so every
    axis reads "bigger = better".

    One per-user aggregate, then three rank windows over the per-user
    frame (|users| rows — orders below raw events; the 100-TB variant
    swaps exact ranks for approx_percentile boundaries, documented)."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    per_user = events.groupBy(F.col(user_col).alias("user_id")).agg(
        F.max(us).alias("_last_us"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.sum(F.round(F.col(value_col) * 10000, 0).cast("long"))
        .cast("long")
        .alias("monetary_fp"),
    )
    anchor = per_user.agg(F.max("_last_us").alias("_anchor")).select("_anchor")
    pu = per_user.crossJoin(F.broadcast(anchor)).withColumn(
        "recency_s",
        F.floor((F.col("_anchor") - F.col("_last_us")) / 1_000_000).cast("long"),
    )
    n_users = F.count(F.lit(1)).over(Window.partitionBy())

    def band(metric, reverse=False):
        order = [F.col(metric).desc() if reverse else F.col(metric), "user_id"]
        rank = F.row_number().over(Window.orderBy(*order))
        return (1 + F.floor(F.lit(n_bands) * (rank - 1) / n_users)).cast("int")

    return pu.select(
        "user_id",
        "recency_s",
        "frequency",
        "monetary_fp",
        band("recency_s", reverse=True).alias("r"),
        band("frequency").alias("f"),
        band("monetary_fp").alias("m"),
    ).withColumn(
        "segment",
        F.concat(F.lit("R"), F.col("r"), F.lit("F"), F.col("f"), F.lit("M"), F.col("m")),
    )


def stationary_distribution(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
    iterations: int = 5,
) -> DataFrame:
    """Near-stationary distribution of the per-user event-type Markov
    chain: (state, pi_micro) after `iterations` deterministic power
    steps from the uniform start — "where does user behaviour settle",
    the equilibrium companion to transition_matrix (which reports the
    one-step dynamics).

    Exact fixed-point discipline (no engine ever sums floats): the
    transition row p_micro = round(n·10⁶/row_total) is ONE double
    division per matrix cell; masses start at ⌊10⁶/k⌋ and every step is
    π'[j] = ⌊Σᵢ πᵢ·p_micro[i,j] / 10⁶⌋ — the inner products are exact
    longs (Σπ·p ≤ 10¹² < 2⁵³, so Spark's floor-of-double IS DuckDB's
    integer division), so k iterations replay bit-identically anywhere.
    Floor rounding leaks ≤ k·|states| micro of mass by design — the
    masses are a distribution up to that documented dust.

    Contract: every state must have outgoing transitions (true of any
    chain built by transition_matrix's pairing over types that occur
    mid-sequence); purely-absorbing states would silently shed mass.

    Scale: the chain matrix is |types|² rows (tiny); each step is one
    join + one hash aggregate on it. The only event-scale work is the
    same single lead() exchange transition_matrix pays."""
    w = Window.partitionBy("_u").orderBy(F.col("_ts").asc(), F.col("_o").asc())
    pairs = (
        events.select(
            F.col(user_col).alias("_u"),
            F.col(ts_col).alias("_ts"),
            F.col(order_col).alias("_o"),
            F.col(type_col).alias("from_type"),
        )
        .withColumn("to_type", F.lead("from_type").over(w))
        .filter(F.col("to_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    wt = Window.partitionBy("from_type")
    trans = counts.select(
        "from_type",
        "to_type",
        F.round(
            F.col("n").cast("double") * F.lit(1_000_000.0)
            / F.sum("n").over(wt).cast("double"),
            0,
        ).cast("long").alias("p_micro"),
    ).localCheckpoint(eager=False)
    states = trans.select(F.col("from_type").alias("state")).distinct()
    k = states.agg(F.count(F.lit(1)).alias("_k"))
    pi = states.crossJoin(F.broadcast(k)).select(
        "state",
        F.floor(F.lit(1_000_000) / F.col("_k")).cast("long").alias("mass"),
    )
    for _ in range(iterations):
        pi = (
            pi.join(trans, pi["state"] == trans["from_type"])
            .groupBy("to_type")
            .agg(
                F.floor(
                    F.sum(F.col("mass") * F.col("p_micro"))
                    / F.lit(1_000_000.0)
                ).cast("long").alias("mass")
            )
            .select(F.col("to_type").alias("state"), "mass")
        )
    return pi.select("state", F.col("mass").alias("pi_micro"))


def watermark_lateness_audit(
    events: DataFrame,
    event_time_col: str,
    arrival_time_col: str,
    thresholds: tuple[int, ...] = (0, 60, 300),
    group_col: str | None = None,
) -> DataFrame:
    """Watermark design advisor: for each candidate watermark delay W
    (seconds), how many events would a streaming job DROP because they
    arrived more than W after their event time — (group?, w_sec,
    n_events, n_late, late_micro). The number that picks
    `withWatermark`'s delay FROM THE DATA instead of folklore: the
    smallest W whose late_micro clears the loss budget bounds the
    streaming state, and streaming/windowed.py's watermarked operators
    consume exactly that bound. Exact integer counts, one division per
    row.

    Scale: ONE pass — the thresholds explode is a |W|-way literal
    fan-out, then a single (group, w) hash aggregate with map-side
    partials."""
    keys = [group_col] if group_col else []
    lateness = (
        F.col(arrival_time_col).cast("long") - F.col(event_time_col).cast("long")
    )
    ws = F.array(*[F.lit(int(w)) for w in thresholds])
    q = events.filter(
        F.col(event_time_col).isNotNull() & F.col(arrival_time_col).isNotNull()
    ).select(*keys, lateness.alias("_late"), F.explode(ws).alias("w_sec"))
    return q.groupBy(*keys, "w_sec").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum((F.col("_late") > F.col("w_sec")).cast("long"))
        .cast("long").alias("n_late"),
    ).select(
        *keys,
        "w_sec",
        "n_events",
        "n_late",
        F.round(
            F.col("n_late").cast("double") * F.lit(1_000_000.0)
            / F.col("n_events").cast("double"),
            0,
        ).cast("long").alias("late_micro"),
    )


def cuped_adjust(
    events: DataFrame,
    metric_col: str,
    covariate_col: str,
    side_col: str,
    scale: int = 100,
) -> DataFrame:
    """CUPED variance reduction for an A/B readout: adjust each side's
    metric mean by θ·(covariate shift) where θ = pooled cov(x,y)/var(x)
    — the pre-experiment-covariate trick that shrinks experiment
    variance by the covariate's R², turning weeks of data into days.
    One row per side: (side, n, mean_y, mean_x, theta, mean_y_adj,
    r2_micro) with r2_micro = how much variance the covariate explains
    (the reduction you bought).

    Exact discipline: metric and covariate quantize to the integer
    grid; θ = (nΣxy − ΣxΣy)/(nΣxx − (Σx)²) is ONE division of exact
    wide integers; each side's adjusted mean is the fixed sequence
    ȳ_s − θ·(x̄_s − x̄) with every mean ONE exact division; r² =
    cov²·10⁶/(var_x·var_y) cross-multiplies exact integers before its
    single division. Zero covariate variance → θ NULL, adjusted mean =
    raw mean.

    Scale: ONE (side) hash aggregate + a 1-row pooled-moment broadcast
    — no second pass, no window."""
    q = events.filter(
        F.col(metric_col).isNotNull()
        & F.col(covariate_col).isNotNull()
        & F.col(side_col).isNotNull()
    ).select(
        F.col(side_col).alias("side"),
        F.round(F.col(metric_col) * scale, 0).cast("long").alias("qy"),
        F.round(F.col(covariate_col) * scale, 0).cast("long").alias("qx"),
    )
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    dec = "decimal(38,0)"
    per = q.groupBy("side").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("qy").cast(dec)).alias("sy"),
        F.sum(F.col("qx").cast(dec)).alias("sx"),
    )
    pooled = q.agg(
        F.count(F.lit(1)).cast("long").alias("pn"),
        F.sum(F.col("qy").cast(dec)).alias("py"),
        F.sum(F.col("qx").cast(dec)).alias("px"),
        F.sum(d19("qx") * d19("qx")).alias("pxx"),
        F.sum(d19("qy") * d19("qy")).alias("pyy"),
        F.sum(d19("qx") * d19("qy")).alias("pxy"),
    )
    j = per.crossJoin(F.broadcast(pooled))
    pnd = F.col("pn").cast(dec)
    cov = (pnd * F.col("pxy") - F.col("px") * F.col("py")).cast("double")
    varx = (pnd * F.col("pxx") - F.col("px") * F.col("px")).cast("double")
    vary = (pnd * F.col("pyy") - F.col("py") * F.col("py")).cast("double")
    theta = cov / varx
    sc = F.lit(float(scale))
    mean_y = F.col("sy").cast("double") / sc / F.col("n").cast("double")
    mean_x = F.col("sx").cast("double") / sc / F.col("n").cast("double")
    pool_mx = F.col("px").cast("double") / sc / F.col("pn").cast("double")
    ok = varx > 0
    return j.select(
        "side",
        "n",
        F.round(mean_y, 6).alias("mean_y"),
        F.round(mean_x, 6).alias("mean_x"),
        F.when(ok, F.round(theta, 6)).alias("theta"),
        F.round(
            F.when(ok, mean_y - theta * (mean_x - pool_mx)).otherwise(mean_y), 6
        ).alias("mean_y_adj"),
        F.when(
            ok & (vary > 0),
            F.round(cov * cov * F.lit(1_000_000.0) / (varx * vary), 0).cast("long"),
        ).alias("r2_micro"),
    )


def sprt_monitor(
    events: DataFrame,
    ts_col: str = "ts",
    success_col: str = "success",
    p0: float = 0.1875,
    p1: float = 0.25,
    alpha: float = 0.05,
    beta: float = 0.05,
) -> DataFrame:
    """Wald SPRT sequential monitor over a daily Bernoulli stream — one
    row per UTC day (day, n, x, n_cum, x_cum, llr, decision): the
    cumulative log-likelihood ratio of H1: rate = p1 vs H0: rate = p0,
    with the standard decision boundaries ln((1−β)/α) / ln(β/(1−α)).
    The "stop the experiment the day the evidence suffices" view that a
    fixed-horizon prop_ztest can't give — and the classic guard against
    peeking-inflated false positives, because the boundaries are BUILT
    for continuous monitoring.

    Exactness: daily (x, n) are exact longs; the per-day LLR increment
    x·ln(p1/p0) + (n−x)·ln((1−p1)/(1−p0)) is NANO-rounded once and
    prefix-summed exactly over the day grid; boundary constants are the
    same literal-double expressions in both engines, and the llr grid
    value never lands exactly on the irrational boundary.

    Scale: one hash aggregate onto the day key (map-side partials),
    one window over |days| rows.
    """
    if not (0.0 < p0 < 1.0 and 0.0 < p1 < 1.0) or p0 == p1:
        raise ValueError("need 0 < p0, p1 < 1 and p0 != p1")
    day = F.floor(
        F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(86_400_000_000)
    ).cast("long")
    per_d = (
        events.filter(F.col(ts_col).isNotNull() & F.col(success_col).isNotNull())
        .groupBy(day.alias("day"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col(success_col).cast("boolean").cast("int"))
            .cast("long")
            .alias("x"),
        )
    )
    l1 = F.log(F.lit(p1) / F.lit(p0))
    l0 = F.log((F.lit(1.0) - F.lit(p1)) / (F.lit(1.0) - F.lit(p0)))
    term_nano = F.round(
        (F.col("x").cast("double") * l1 + (F.col("n") - F.col("x")).cast("double") * l0)
        * F.lit(1_000_000_000.0),
        0,
    ).cast("long")
    w = Window.orderBy("day")
    cum = per_d.select(
        "day",
        "n",
        "x",
        F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long").alias("n_cum"),
        F.sum("x").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long").alias("x_cum"),
        F.sum(term_nano)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("_lln"),
    )
    llr = F.col("_lln").cast("double") / F.lit(1_000_000_000.0)
    upper = F.log((F.lit(1.0) - F.lit(beta)) / F.lit(alpha))
    lower = F.log(F.lit(beta) / (F.lit(1.0) - F.lit(alpha)))
    return cum.select(
        "day",
        "n",
        "x",
        "n_cum",
        "x_cum",
        F.round(llr, 6).alias("llr"),
        F.when(llr >= upper, F.lit("accept_h1"))
        .when(llr <= lower, F.lit("accept_h0"))
        .otherwise(F.lit("continue"))
        .alias("decision"),
    )


def pettitt_test(
    series: DataFrame, order_col: str = "t", value_col: str = "v"
) -> DataFrame:
    """Pettitt rank changepoint test — one row (n, t_star, u_star, k_u,
    p_approx): the nonparametric "WHERE did the level shift" that cusum
    (which needs a known target mean) and mann_kendall (which detects a
    monotone trend, not a break) don't answer. U_t = 2R_t − t(n+1) via
    midranks; the change point t_star maximizes |U_t| over t < max(t)
    (earliest wins ties), K = |U_{t*}|, and the standard approximation
    p ≈ min(1, 2·exp(−6K²/(n³+n²))).

    U_t is EXACT integer arithmetic end to end (doubled midranks from
    the distinct value grid, prefix-summed; t(n+1) exact), so the argmax
    is engine-exact; only the final p is one double exp. Ordering ties
    in `value_col` get midranks, so identical series halves give U ≡ 0.

    Scale: one value-grid aggregate + two grid-sized ordered windows;
    intended for pre-aggregated series (daily/hourly rollups), where the
    grid IS the series.
    """
    s = series.filter(
        F.col(order_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(F.col(order_col).alias("t"), F.col(value_col).alias("v"))
    per_v = s.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("tc"))
    wv = Window.orderBy("v")
    ranked = per_v.select(
        "v",
        (
            2 * (F.sum("tc").over(wv.rowsBetween(Window.unboundedPreceding, 0)) - F.col("tc"))
            + F.col("tc")
            + 1
        ).cast("long").alias("r2"),
    )
    tot = s.agg(F.count(F.lit(1)).cast("long").alias("n"))
    wt = Window.orderBy("t")
    cum = (
        s.join(ranked, "v")
        .select(
            "t",
            F.sum("r2").over(wt.rowsBetween(Window.unboundedPreceding, 0)).alias("_s2"),
            F.row_number().over(wt).alias("_i"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "t",
            "n",
            (F.col("_s2") - F.col("_i") * (F.col("n") + 1)).cast("long").alias("u"),
            "_i",
        )
        .filter(F.col("_i") < F.col("n"))
    )
    top = (
        cum.select("n", "t", "u", F.abs("u").alias("_au"))
        .orderBy(F.col("_au").desc(), F.col("t").asc())
        .limit(1)
    )
    nd = F.col("n").cast("double")
    k2 = F.col("_au").cast("double") * F.col("_au").cast("double")
    return top.select(
        "n",
        F.col("t").alias("t_star"),
        F.col("u").alias("u_star"),
        F.col("_au").alias("k_u"),
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(2.0) * F.exp(-F.lit(6.0) * k2 / (nd * nd * nd + nd * nd)),
            ),
            6,
        ).alias("p_approx"),
    )


def ewma_chart(
    series: DataFrame,
    order_col: str = "t",
    value_col: str = "v",
    k: int = 8,
) -> DataFrame:
    """EWMA control chart over an ordered series — per point (t, v, ema,
    center, ucl, lcl, out_of_control): the ema_smooth machinery (λ = ½,
    k-lag truncated, exact power-of-two weights) plus the textbook
    steady-state 3σ_z limits σ_z = σ·√(λ/(2−λ)) = σ/√3 around the series
    mean. The drift alarm that point-wise outlier flags miss: EWMA
    accumulates many small same-direction deviations into one crossing.

    Exactness: the EMA numerator/denominator are exact shifted longs
    (ema_smooth contract); μ and σ come from exact micro moments with
    the cross-multiplied variance identity, so center/ucl/lcl are ONE
    fixed double sequence; the flag compares two round-6 doubles.

    Scale: one ordered window over the series (pre-aggregated rollups —
    the grid IS the series) + a broadcast single-row moment join.
    """
    if not 1 <= k <= 62:
        raise ValueError("k must be in [1, 62]")
    s = series.filter(
        F.col(order_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        F.col(order_col).alias("t"),
        F.col(value_col).alias("v"),
        F.round(F.col(value_col) * 1_000_000).cast("long").alias("_q"),
    )
    w = Window.orderBy("t")
    num = F.lit(0).cast("long")
    den = F.lit(0).cast("long")
    for j in range(k):
        weight = 1 << (k - 1 - j)
        lagged = F.lag("_q", j).over(w)
        num = num + F.coalesce(lagged * weight, F.lit(0))
        den = den + F.when(lagged.isNotNull(), F.lit(weight)).otherwise(F.lit(0))
    qd = F.col("_q").cast(_DEC)
    mom = s.agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum(qd).alias("_s1"),
        F.sum(qd * qd).alias("_s2"),
    )
    ema = F.round(num.cast("double") / (den * F.lit(1_000_000)).cast("double"), 6)
    staged = s.select("t", "v", ema.alias("ema")).crossJoin(F.broadcast(mom))
    nd = F.col("_n").cast("double")
    mu = F.col("_s1").cast("double") / (nd * F.lit(1_000_000.0))
    var = (
        (F.col("_n").cast(_DEC) * F.col("_s2") - F.col("_s1") * F.col("_s1")).cast(
            "double"
        )
        / (nd * nd)
        / F.lit(1e12)
    )
    sigma_z = F.sqrt(var / F.lit(3.0))
    ucl = F.round(mu + F.lit(3.0) * sigma_z, 6)
    lcl = F.round(mu - F.lit(3.0) * sigma_z, 6)
    return staged.select(
        "t",
        "v",
        "ema",
        F.round(mu, 6).alias("center"),
        ucl.alias("ucl"),
        lcl.alias("lcl"),
        ((F.col("ema") > ucl) | (F.col("ema") < lcl)).alias("out_of_control"),
    )


def hurst_rs(
    series: DataFrame,
    t_col: str = "t",
    q_col: str = "qv",
    sizes: tuple[int, ...] = (8, 16, 32, 64),
) -> DataFrame:
    """Rescaled-range (R/S) Hurst exponent over an integer-valued
    regular series — the long-memory probe (H≈0.5 random walk, >0.5
    persistent/trending, <0.5 mean-reverting) a monitoring pipeline
    runs on its own traffic counts: one row per block size
    (m, n_blocks, mean_log_rs, hurst), hurst identical across rows
    (the OLS slope of mean ln(R/S) on ln m).

    Exactness: within each m-block the cumulative deviation rides
    scaled by m (z_r = m·cum_r − r·Σx — exact wide integers), so
    R/S = (max z − min z)/√(m·Σx² − (Σx)²) has exact-integer numerator
    and radicand; each block contributes ONE nano-rounded
    ln(R) − ½ln(D) term summed exactly; the final ≤|sizes|-point slope
    is a fixed double sequence (sub-ulp order noise absorbed by the
    round-6 finish — the anova_f note). Incomplete trailing blocks and
    degenerate blocks (constant, or zero range) drop.

    Scale: the series is a bounded time grid (one row per bucket), so
    the global order window is grid-sized, not event-sized; the ×|sizes|
    fan-out is a literal-table broadcast; everything after is one
    (m, block) window + two hash aggregates.
    """
    sizes_df = series.sparkSession.createDataFrame(
        [(int(m),) for m in sizes], "m long"
    )
    w = Window.orderBy(t_col)
    s = series.select(
        F.col(q_col).cast("long").alias("x"),
        (F.row_number().over(w) - 1).cast("long").alias("i"),
    )
    e = s.crossJoin(F.broadcast(sizes_df)).select(
        "m",
        "x",
        F.expr("i div m").alias("blk"),
        (F.col("i") % F.col("m") + 1).alias("r"),
    )
    wb = Window.partitionBy("m", "blk")
    wcum = wb.orderBy("r").rowsBetween(Window.unboundedPreceding, 0)
    z = e.select(
        "m",
        "blk",
        "x",
        "r",
        (
            F.col("m").cast(_DEC) * F.sum("x").over(wcum).cast(_DEC)
            - F.col("r").cast(_DEC) * F.sum("x").over(wb).cast(_DEC)
        ).alias("z"),
    )
    blocks = z.groupBy("m", "blk").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        (F.max("z") - F.min("z")).alias("r_scaled"),
        (
            F.first(F.col("m")).cast(_DEC)
            * F.sum(F.col("x").cast(_DEC) * F.col("x").cast(_DEC))
            - F.sum(F.col("x").cast(_DEC)) * F.sum(F.col("x").cast(_DEC))
        ).alias("d"),
    )
    ok = blocks.filter(
        (F.col("cnt") == F.col("m"))
        & (F.col("d").cast("double") > 0)
        & (F.col("r_scaled").cast("double") > 0)
    )
    term_nano = F.round(
        (
            F.log(F.col("r_scaled").cast("double"))
            - F.log(F.col("d").cast("double")) / F.lit(2.0)
        )
        * F.lit(1_000_000_000.0),
        0,
    ).cast("long")
    per_m = ok.groupBy("m").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum(term_nano).cast("long").alias("sum_nano"),
    )
    y = F.col("sum_nano").cast("double") / (
        F.col("n_blocks").cast("double") * F.lit(1_000_000_000.0)
    )
    pm = per_m.select("m", "n_blocks", y.alias("y"), F.log(F.col("m").cast("double")).alias("lx"))
    slope_src = pm.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("lx").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
        F.sum(F.col("lx") * F.col("y")).alias("sxy"),
    )
    kd = F.col("k").cast("double")
    den = kd * F.col("sxx") - F.col("sx") * F.col("sx")
    hurst = F.when(
        (F.col("k") >= 2) & (den > 0),
        F.round((kd * F.col("sxy") - F.col("sx") * F.col("sy")) / den, 6),
    ).alias("hurst")
    return pm.crossJoin(F.broadcast(slope_src.select(hurst))).select(
        "m",
        "n_blocks",
        F.round(F.col("y"), 6).alias("mean_log_rs"),
        "hurst",
    )


def entropy_rate(df: DataFrame, prev_col: str, cur_col: str) -> DataFrame:
    """Markov entropy rate — the predictability of a transition process
    (H(next|current) in bits under the empirical joint): one row
    (n_transitions, k_states, h_rate_bits, h_max_bits, normalized).
    h_rate = −Σ_ij (n_ij/N)·log2(n_ij/n_i); h_max = log2(k) over
    observed source states; normalized = h_rate/h_max (NULL when k=1).
    A perfectly predictable log scores 0; uniform chaos scores 1.

    Each cell contributes ONE nano-rounded n_ij·(ln n_i − ln n_ij)/ln2
    term summed exactly; the shared 1/N division happens once at the
    end — so the distributed sum order can't wobble the rate. One
    (prev,cur) cell aggregate + a prev marginal joined broadcast.
    """
    base = df.filter(
        F.col(prev_col).isNotNull() & F.col(cur_col).isNotNull()
    ).select(F.col(prev_col).alias("p"), F.col(cur_col).alias("c"))
    cells = base.groupBy("p", "c").agg(F.count(F.lit(1)).cast("long").alias("nij"))
    marg = base.groupBy("p").agg(F.count(F.lit(1)).cast("long").alias("ni"))
    j = cells.join(F.broadcast(marg), "p")
    ln2 = 0.6931471805599453
    term_nano = F.round(
        F.col("nij").cast("double")
        * (F.log(F.col("ni").cast("double")) - F.log(F.col("nij").cast("double")))
        / F.lit(ln2)
        * F.lit(1_000_000_000.0),
        0,
    ).cast("long")
    agg = j.agg(
        F.sum("nij").cast("long").alias("n_transitions"),
        F.countDistinct("p").cast("long").alias("k_states"),
        F.sum(term_nano).cast("long").alias("t_nano"),
    )
    h = F.col("t_nano").cast("double") / (
        F.col("n_transitions").cast("double") * F.lit(1_000_000_000.0)
    )
    hmax = F.log(F.col("k_states").cast("double")) / F.lit(ln2)
    return agg.select(
        "n_transitions",
        "k_states",
        F.round(h, 6).alias("h_rate_bits"),
        F.round(hmax, 6).alias("h_max_bits"),
        F.when(F.col("k_states") >= 2, F.round(h / hmax, 6)).alias("normalized"),
    )


def bollinger_bands(
    series: DataFrame,
    t_col: str = "t",
    v_col: str = "v",
    window: int = 7,
    scale: int = 1_000_000,
) -> DataFrame:
    """Bollinger bands over a regular series — the rolling ±2σ control
    chart (trailing `window` buckets, population σ): one row per bucket
    (t, v, roll_mean, roll_std, pct_b, breach). breach is decided by the
    EXACT integer inequality (n·x − Σx)² > 4·(n·Σx² − (Σx)²) — no float
    ever enters the boolean, so two engines can't disagree at the band
    edge; pct_b = (x − lower)/(upper − lower) is one sqrt + one division,
    NULL for σ=0 or a warm-up window (< 3 points).

    Scale: the series is a bounded time grid; one ordered window with
    integer running sums, no self-join.
    """
    q = series.select(
        F.col(t_col).alias("t"),
        F.round(F.col(v_col) * F.lit(scale), 0).cast("long").alias("qv"),
    )
    w = Window.orderBy("t").rowsBetween(-(window - 1), 0)
    s = q.select(
        "t",
        "qv",
        F.count(F.lit(1)).over(w).cast("long").alias("nw"),
        F.sum("qv").over(w).cast(_DEC).alias("sx"),
        F.sum(F.col("qv").cast(_DEC) * F.col("qv").cast(_DEC)).over(w).alias("sxx"),
    )
    nwd = F.col("nw").cast(_DEC)
    dev = nwd * F.col("qv").cast(_DEC) - F.col("sx")  # n·x − Σx, exact
    d = nwd * F.col("sxx") - F.col("sx") * F.col("sx")  # n²·var, exact
    warm = F.col("nw") >= 3
    sc = F.lit(float(scale))
    mean = F.col("sx").cast("double") / (F.col("nw").cast("double") * sc)
    std = F.sqrt(d.cast("double")) / (F.col("nw").cast("double") * sc)
    pct_b = (dev.cast("double") + F.lit(2.0) * F.sqrt(d.cast("double"))) / (
        F.lit(4.0) * F.sqrt(d.cast("double"))
    )
    return s.select(
        "t",
        F.round(F.col("qv").cast("double") / sc, 6).alias("v"),
        F.when(warm, F.round(mean, 6)).alias("roll_mean"),
        F.when(warm, F.round(std, 6)).alias("roll_std"),
        F.when(warm & (d.cast("double") > 0), F.round(pct_b, 6)).alias("pct_b"),
        F.when(
            warm, dev * dev > F.lit(4).cast(_DEC) * d
        ).otherwise(F.lit(False)).alias("breach"),
    )


def series_peaks(
    series: DataFrame,
    t_col: str = "t",
    v_col: str = "v",
    scale: int = 1_000_000,
) -> DataFrame:
    """Local peak/trough detection on a regular series — the alerting
    primitive under seasonality/anomaly review: one row per bucket
    (t, v, rise, fall, is_peak, is_trough). A peak is a STRICT local
    max against both neighbors (ties are neither), decided entirely on
    quantized integer comparisons — no float enters any boolean; series
    endpoints (missing neighbor) are neither. rise/fall are the signed
    deltas to the previous/next bucket.

    One ordered grid-sized window (lag+lead); no join, no aggregation.
    """
    q = series.select(
        F.col(t_col).alias("t"),
        F.round(F.col(v_col) * F.lit(scale), 0).cast("long").alias("qv"),
    )
    w = Window.orderBy("t")
    s = q.select(
        "t",
        "qv",
        F.lag("qv").over(w).alias("pq"),
        F.lead("qv").over(w).alias("nq"),
    )
    sc = F.lit(float(scale))
    both = F.col("pq").isNotNull() & F.col("nq").isNotNull()
    return s.select(
        "t",
        F.round(F.col("qv").cast("double") / sc, 6).alias("v"),
        F.when(
            F.col("pq").isNotNull(),
            F.round((F.col("qv") - F.col("pq")).cast("double") / sc, 6),
        ).alias("rise"),
        F.when(
            F.col("nq").isNotNull(),
            F.round((F.col("nq") - F.col("qv")).cast("double") / sc, 6),
        ).alias("fall"),
        F.coalesce(
            both & (F.col("qv") > F.col("pq")) & (F.col("qv") > F.col("nq")),
            F.lit(False),
        ).alias("is_peak"),
        F.coalesce(
            both & (F.col("qv") < F.col("pq")) & (F.col("qv") < F.col("nq")),
            F.lit(False),
        ).alias("is_trough"),
    )


def record_audit(
    series: DataFrame,
    t_col: str = "t",
    v_col: str = "v",
    scale: int = 1_000_000,
) -> DataFrame:
    """Running-record audit — how many buckets set a new all-time high,
    against the exchangeability expectation H_n = Σ 1/i (under a
    stationary series the i-th bucket is a record with probability 1/i):
    one row (n, n_records, expected_records, record_ratio). ratio ≫ 1
    is a trend/drift alarm that needs NO distributional assumptions —
    the classic records-process probe.

    Record decisions are exact integer comparisons against the running
    max (the first bucket is a record); H_n accumulates nano-rounded
    1/i terms summed exactly. One ordered grid-sized window.
    """
    q = series.select(
        F.col(t_col).alias("t"),
        F.round(F.col(v_col) * F.lit(scale), 0).cast("long").alias("qv"),
    )
    w = Window.orderBy("t")
    s = q.select(
        "qv",
        F.max("qv").over(w.rowsBetween(Window.unboundedPreceding, -1)).alias("pm"),
        F.row_number().over(w).cast("long").alias("i"),
    )
    agg = s.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            (F.col("pm").isNull() | (F.col("qv") > F.col("pm"))).cast("int")
        ).cast("long").alias("n_records"),
        F.sum(
            F.round(F.lit(1_000_000_000.0) / F.col("i").cast("double"), 0).cast("long")
        ).cast("long").alias("h_nano"),
    )
    exp_ = F.col("h_nano").cast("double") / F.lit(1_000_000_000.0)
    return agg.select(
        "n",
        "n_records",
        F.round(exp_, 6).alias("expected_records"),
        F.when(
            F.col("n") > 0, F.round(F.col("n_records").cast("double") / exp_, 6)
        ).alias("record_ratio"),
    )


def turning_points_test(
    series: DataFrame,
    t_col: str = "t",
    v_col: str = "v",
    scale: int = 1_000_000,
) -> DataFrame:
    """Turning-point randomness test — "is this series i.i.d. noise or
    does it have structure": one row (n, n_turning, expected, z). An
    interior bucket is a turning point when it is a STRICT local max or
    min (integer comparisons on the quantized grid; ties are neither —
    the classical null moments E = 2(n−2)/3, Var = (16n−29)/90 assume
    continuous data, so heavy ties deflate |z|, documented). Too few
    turning points = trend/momentum; too many = negative autocorrelation
    (over-dithered telemetry).

    One ordered grid window (lag+lead) + one fold; no join.
    """
    q = series.select(
        F.col(t_col).alias("t"),
        F.round(F.col(v_col) * F.lit(scale), 0).cast("long").alias("qv"),
    )
    w = Window.orderBy("t")
    s = q.select(
        "qv",
        F.lag("qv").over(w).alias("pq"),
        F.lead("qv").over(w).alias("nq"),
    )
    is_turn = (
        F.col("pq").isNotNull()
        & F.col("nq").isNotNull()
        & (
            ((F.col("qv") > F.col("pq")) & (F.col("qv") > F.col("nq")))
            | ((F.col("qv") < F.col("pq")) & (F.col("qv") < F.col("nq")))
        )
    )
    agg = s.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(is_turn.cast("int")).cast("long").alias("n_turning"),
    )
    nd = F.col("n").cast("double")
    e = F.lit(2.0) * (nd - 2) / F.lit(3.0)
    var = (F.lit(16.0) * nd - 29) / F.lit(90.0)
    return agg.select(
        "n",
        "n_turning",
        F.when(F.col("n") >= 3, F.round(e, 6)).alias("expected"),
        F.when(
            (F.col("n") >= 3) & (var > 0),
            F.round((F.col("n_turning").cast("double") - e) / F.sqrt(var), 6),
        ).alias("z"),
    )


def ljung_box(
    df: DataFrame,
    t_col: str,
    v_col: str,
    n_lags: int = 7,
    v_scale: int = 1,
) -> DataFrame:
    """Ljung–Box portmanteau test over lags 1..K — "is the daily series
    white noise" (evt_autocorr checks one lag per user; this checks the
    whole correlogram of ONE series and gives the χ²ₖ statistic):
    one row per lag (lag, r, q_lb). q_lb at lag k = n(n+2)·Σ_{j≤k}
    r_j²/(n−j) — compare to χ² with k dof; the pre-flight check before
    trusting i.i.d.-assuming tests on a time series.

    Engine-exact: values quantize to the integer grid and center as
    D_t = n·q_t − Σq (exact integers — no rational mean ever
    materializes); per-lag numerators and the shared denominator are
    exact wide-integer sums over a grid SELF-JOIN on (t − k), so r_k is
    ONE double division; the cumulative Q sums ≤ K doubles in fixed
    ascending-lag window order. The series is a bounded time grid
    (days/hours), never raw rows — the repo-wide series contract.
    """
    q = df.filter(F.col(t_col).isNotNull() & F.col(v_col).isNotNull()).select(
        F.col(t_col).cast("long").alias("t"),
        F.round(F.col(v_col) * F.lit(v_scale)).cast("long").alias("qv"),
    )
    tot = q.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("qv").cast(_DEC)).alias("s"),
    )
    d = q.crossJoin(F.broadcast(tot)).select(
        "t",
        "n",
        (F.col("n").cast(_DEC) * F.col("qv").cast(_DEC) - F.col("s")).alias("dv"),
    )
    den = d.agg(F.sum(F.col("dv") * F.col("dv")).alias("den"))
    spark = df.sparkSession
    lags = spark.range(1, n_lags + 1).select(F.col("id").cast("long").alias("k"))
    pairs = (
        d.alias("a")
        .crossJoin(F.broadcast(lags))
        .join(
            F.broadcast(d.select(F.col("t").alias("tb"), F.col("dv").alias("dvb"))),
            F.col("a.t") - F.col("k") == F.col("tb"),
        )
    )
    num = pairs.groupBy("k").agg(
        F.max("n").cast("long").alias("n"),
        F.sum(F.col("dv") * F.col("dvb")).alias("num"),
    )
    j = num.crossJoin(F.broadcast(den))
    r = F.col("num").cast("double") / F.col("den").cast("double")
    nd = F.col("n").cast("double")
    term = r * r / (nd - F.col("k").cast("double"))
    w = Window.orderBy("lag").rowsBetween(Window.unboundedPreceding, 0)
    staged = j.select(
        F.col("k").alias("lag"),
        "n",
        F.when(F.col("den") > 0, F.round(r, 6)).alias("r"),
        F.when(F.col("den") > 0, term).alias("term"),
    )
    return staged.select(
        "lag",
        "r",
        F.round(
            F.col("n").cast("double")
            * (F.col("n").cast("double") + 2)
            * F.sum("term").over(w),
            6,
        ).alias("q_lb"),
    )


def forecast_eval(
    df: DataFrame,
    t_col: str,
    v_col: str,
    season: int = 7,
    v_scale: int = 1,
) -> DataFrame:
    """Naive-forecast backtest — the accuracy floor every real
    forecaster must beat: one row per method ('naive' = carry last
    value, 'seasonal_naive' = carry value from `season` steps back)
    with (method, n_eval, mae, rmse, smape, mase). MASE scales each
    method's MAE by the one-step-naive MAE (so 'naive' scores 1.0 by
    construction and seasonal_naive < 1 means the weekly pattern is
    real signal).

    Engine-exact: forecast errors are INTEGER differences on the
    quantized grid (|e| and e² sums are exact); each sMAPE term
    2|e|/(|y|+|ŷ|) is micro-rounded (×1e6) and exact-summed; every
    metric is one final division (+ one sqrt for RMSE). One ordered
    grid window + one fold, no join.
    """
    q = df.filter(F.col(t_col).isNotNull() & F.col(v_col).isNotNull()).select(
        F.col(t_col).cast("long").alias("t"),
        F.round(F.col(v_col) * F.lit(v_scale)).cast("long").alias("qv"),
    )
    w = Window.orderBy("t")
    lagd = q.select(
        "qv",
        F.lag("qv", 1).over(w).alias("p1"),
        F.lag("qv", season).over(w).alias("ps"),
    )

    def err_aggs(pred, tag):
        e = F.col("qv") - pred
        sm = F.when(
            pred.isNotNull() & (F.abs(F.col("qv")) + F.abs(pred) > 0),
            F.round(
                2 * F.abs(e).cast("double")
                / (F.abs(F.col("qv")) + F.abs(pred)).cast("double")
                * F.lit(1_000_000.0)
            ),
        ).cast("long")
        return [
            F.count(pred).cast("long").alias(f"n_{tag}"),
            F.sum(F.abs(e)).cast("long").alias(f"sae_{tag}"),
            F.sum(F.when(pred.isNotNull(), e.cast(_DEC) * e.cast(_DEC))).alias(
                f"sse_{tag}"
            ),
            F.sum(sm).cast("long").alias(f"ssm_{tag}"),
        ]

    agg = lagd.agg(*err_aggs(F.col("p1"), "1"), *err_aggs(F.col("ps"), "s"))
    sc = F.lit(float(v_scale))

    def metrics(tag, name):
        n = F.col(f"n_{tag}").cast("double")
        mae_q = F.col(f"sae_{tag}").cast("double") / n
        mae1_q = F.col("sae_1").cast("double") / F.col("n_1").cast("double")
        return [
            F.lit(name).alias("method"),
            F.col(f"n_{tag}").alias("n_eval"),
            F.when(n > 0, F.round(mae_q / sc, 6)).alias("mae"),
            F.when(
                n > 0,
                F.round(F.sqrt(F.col(f"sse_{tag}").cast("double") / n) / sc, 6),
            ).alias("rmse"),
            F.when(
                n > 0,
                F.round(
                    F.col(f"ssm_{tag}").cast("double") / (n * F.lit(1_000_000.0)),
                    6,
                ),
            ).alias("smape"),
            F.when(
                (n > 0) & (mae1_q > 0), F.round(mae_q / mae1_q, 6)
            ).alias("mase"),
        ]

    return agg.select(*metrics("1", "naive")).unionAll(
        agg.select(*metrics("s", "seasonal_naive"))
    )


def sax_symbolize(
    df: DataFrame,
    t_col: str,
    v_col: str,
    window: int = 3,
    v_scale: int = 1,
) -> DataFrame:
    """SAX symbolization (4-letter alphabet) of a regular series —
    compress each `window`-bucket stretch into one of {a,b,c,d} by
    z-scored piecewise-aggregate mean against the N(0,1) quartile
    breakpoints (−0.6745, 0, 0.6745 — fixed literals, the Lin/Keogh
    table): one row per window (win, n_buckets, paa, z, symbol).
    The alphabet string is what motif mining / symbolic anomaly rules
    consume; 'aaaa…dddd' jumps are regime shifts.

    Engine-exact: grid values are integers, the series mean/σ come
    from exact integer moments (one sqrt), each window's PAA is one
    exact-integer division, and the symbol comparisons run on doubles
    both engines computed through identical expression trees against
    literal breakpoints. One grid aggregate + one broadcast of the
    two-value moment row; no raw-row sort.
    """
    q = df.filter(F.col(t_col).isNotNull() & F.col(v_col).isNotNull()).select(
        F.col(t_col).cast("long").alias("t"),
        F.round(F.col(v_col) * F.lit(v_scale)).cast("long").alias("qv"),
    )
    mom = q.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("qv").cast(_DEC)).alias("s"),
        F.sum(F.col("qv").cast(_DEC) * F.col("qv").cast(_DEC)).alias("ss"),
        F.min("t").alias("t0"),
    )
    wins = q.crossJoin(F.broadcast(mom)).groupBy(
        F.floor((F.col("t") - F.col("t0")) / F.lit(window)).cast("long").alias("win")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum(F.col("qv").cast(_DEC)).alias("ws"),
        F.max("n").cast("long").alias("n"),
        F.max(F.col("s").cast("double")).alias("sd"),
        F.max(F.col("ss").cast("double")).alias("ssd"),
    )
    nd = F.col("n").cast("double")
    mu = F.col("sd") / nd
    var = (nd * F.col("ssd") - F.col("sd") * F.col("sd")) / (nd * nd)
    paa = F.col("ws").cast("double") / F.col("n_buckets").cast("double")
    z = (paa - mu) / F.sqrt(var)
    sym = (
        F.when(z < F.lit(-0.6745), "a")
        .when(z < F.lit(0.0), "b")
        .when(z < F.lit(0.6745), "c")
        .otherwise("d")
    )
    sc = F.lit(float(v_scale))
    return wins.select(
        "win",
        "n_buckets",
        F.round(paa / sc, 6).alias("paa"),
        F.when(var > 0, F.round(z, 6)).alias("z"),
        F.when(var > 0, sym).alias("symbol"),
    )


def dickey_fuller(
    df: DataFrame,
    t_col: str,
    v_col: str,
    v_scale: int = 1,
) -> DataFrame:
    """Dickey–Fuller unit-root test (no augmentation lags) — "is this
    series mean-reverting or a random walk": one row (n, rho, t_stat)
    from the regression Δy_t = α + ρ·y_{t−1} + ε. t_stat ≲ −2.86
    (the 5% DF critical value) ⇒ stationary; ρ ≈ 0 with a small |t| ⇒
    treat level shifts and trends as persistent (the evt_hurst
    cross-check, from regression instead of rescaled ranges).

    Engine-exact: the series is integer on the quantized grid, Δy and
    the lag are integer window results, every moment is an exact
    wide-integer sum, and ρ̂ = Cxy/Cxx,
    t = ρ̂·√((Cxx/n)/(SSR/(n−2))) with SSR = (Cyy − Cxy²/Cxx)/n are
    fixed double sequences on final scalars (the chow_test closed
    form — no residual pass).
    """
    q = df.filter(F.col(t_col).isNotNull() & F.col(v_col).isNotNull()).select(
        F.col(t_col).cast("long").alias("t"),
        F.round(F.col(v_col) * F.lit(v_scale)).cast("long").alias("qv"),
    )
    w = Window.orderBy("t")
    pairs = q.select(
        (F.col("qv") - F.lag("qv", 1).over(w)).alias("dy"),
        F.lag("qv", 1).over(w).alias("yl"),
    ).filter(F.col("yl").isNotNull())
    m = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("yl").cast(_DEC)).alias("sx"),
        F.sum(F.col("dy").cast(_DEC)).alias("sy"),
        F.sum(F.col("yl").cast(_DEC) * F.col("yl").cast(_DEC)).alias("sxx"),
        F.sum(F.col("dy").cast(_DEC) * F.col("dy").cast(_DEC)).alias("syy"),
        F.sum(F.col("yl").cast(_DEC) * F.col("dy").cast(_DEC)).alias("sxy"),
    )
    nD = F.col("n").cast(_DEC)
    cxx = (nD * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    cyy = (nD * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    cxy = (nD * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    nd = F.col("n").cast("double")
    rho = cxy / cxx
    ssr = (cyy - cxy * cxy / cxx) / nd
    ok = (F.col("n") >= 3) & (cxx > 0)
    t_stat = rho * F.sqrt((cxx / nd) / (ssr / (nd - 2)))
    return m.select(
        "n",
        F.when(ok, F.round(rho, 6)).alias("rho"),
        F.when(ok & (ssr > 0), F.round(t_stat, 6)).alias("t_stat"),
    )


def fano_burstiness(
    df: DataFrame,
    ts_col: str = "ts",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Event-stream burstiness — two classic dispersion diagnostics in
    one row (n_buckets, fano, n_intervals, cv2): the Fano factor
    (bucket-count variance over mean; 1 = Poisson, >1 = bursty,
    <1 = regular) and the squared coefficient of variation of
    interarrival times (CV² — same reading, arrival-process view).
    The text_burstiness sibling for the EVENT stream itself — the
    "can I capacity-plan from the mean rate" gate.

    Engine-exact: bucket counts and µs interarrivals are integers,
    all moments are exact wide-integer sums, each statistic is a
    fixed double sequence on final scalars (population variance; one
    division each). Buckets come from the observed-bucket grid ONLY
    (empty buckets excluded — documented: this is the conditional
    Fano factor; include-empty needs the span, not the data).
    """
    us = df.filter(F.col(ts_col).isNotNull()).select(
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us")
    )
    per_b = us.groupBy(
        F.floor(F.col("us") / F.lit(bucket_seconds * 1_000_000)).alias("b")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    bm = per_b.agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum(F.col("c").cast(_DEC)).alias("s"),
        F.sum(F.col("c").cast(_DEC) * F.col("c").cast(_DEC)).alias("ss"),
    )
    w = Window.orderBy("us")
    gaps = us.select((F.col("us") - F.lag("us").over(w)).alias("g")).filter(
        F.col("g").isNotNull()
    )
    gm = gaps.agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.sum(F.col("g").cast(_DEC)).alias("gs"),
        F.sum(F.col("g").cast(_DEC) * F.col("g").cast(_DEC)).alias("gss"),
    )
    j = bm.crossJoin(F.broadcast(gm))
    nb = F.col("n_buckets").cast("double")
    fano = (
        (nb * F.col("ss").cast("double")
         - F.col("s").cast("double") * F.col("s").cast("double"))
        / (nb * nb)
    ) / (F.col("s").cast("double") / nb)
    ni = F.col("n_intervals").cast("double")
    gsd = F.col("gs").cast("double")
    cv2 = (
        (ni * F.col("gss").cast("double") - gsd * gsd) / (ni * ni)
    ) / ((gsd / ni) * (gsd / ni))
    return j.select(
        "n_buckets",
        F.when((F.col("n_buckets") >= 2) & (F.col("s") > 0),
               F.round(fano, 6)).alias("fano"),
        "n_intervals",
        F.when((F.col("n_intervals") >= 2) & (F.col("gs") > 0),
               F.round(cv2, 6)).alias("cv2"),
    )


def skyline_2d(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """2-D skyline (Pareto front) — the rows no other row dominates
    (x' ≥ x AND y' ≥ y with one strict): the classic "best tradeoff
    set" operator (top spenders vs most-active users; no scalar
    weighting needed). Returns the skyline rows (id, x, y) only.

    The naive formulation is an O(n²) dominance anti-join; in 2-D it
    collapses to TWO windows — m1 = max(y) over STRICTLY greater x
    (integer RANGE frame, so tied x never leaks into its own test)
    and the max y within the same-x group: keep ⇔ (m1 < y OR no
    greater x) AND y = groupmax. Exact integer comparisons only —
    no floats anywhere, identical in any engine; duplicates of a
    skyline point all survive (neither dominates the other).
    """
    q = df.filter(
        F.col(id_col).isNotNull()
        & F.col(x_col).isNotNull()
        & F.col(y_col).isNotNull()
    ).select(
        F.col(id_col).alias("id"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    )
    wx = Window.orderBy("x").rangeBetween(1, Window.unboundedFollowing)
    wg = Window.partitionBy("x")
    staged = q.select(
        "id",
        "x",
        "y",
        F.max("y").over(wx).alias("m1"),
        F.max("y").over(wg).alias("gmax"),
    )
    return staged.filter(
        (F.col("m1").isNull() | (F.col("m1") < F.col("y")))
        & (F.col("y") == F.col("gmax"))
    ).select("id", "x", "y")


def seasonal_decompose_additive(
    df: DataFrame,
    t_col: str,
    v_col: str,
    period: int = 7,
    v_scale: int = 1,
) -> DataFrame:
    """Additive seasonal decomposition (STL-lite) of a regular series:
    value = trend + seasonal + resid, one row per bucket (t, value,
    trend, seasonal, resid). Trend is the centered `period`-wide
    moving average (NULL in the half-window warm-up, like the classic
    decompose); seasonal is the phase-mean of the detrended series,
    centered to sum to zero; resid is what's left — the input anomaly
    detectors should consume INSTEAD of the raw series once
    seasonality is this strong (cf. evt_seasonality / evt_hour_anova).

    Engine-exact: grid values are integers, the moving average is an
    integer window sum over a count (one division), each detrended
    phase term and the seasonal centering term are micro-rounded
    (×1e6) and exact-summed, and resid subtracts the same doubles
    both engines computed. Windows run over the bounded grid.
    """
    half = period // 2
    q = df.filter(F.col(t_col).isNotNull() & F.col(v_col).isNotNull()).select(
        F.col(t_col).cast("long").alias("t"),
        F.round(F.col(v_col) * F.lit(v_scale)).cast("long").alias("qv"),
    )
    wt = Window.orderBy("t").rowsBetween(-half, half)
    trended = q.select(
        "t",
        "qv",
        F.when(
            (F.count(F.lit(1)).over(wt) == period)
            & (F.max("t").over(wt) - F.min("t").over(wt) == F.lit(2 * half)),
            F.sum("qv").over(wt).cast("double") / F.lit(float(period)),
        ).alias("trend_q"),
    )
    detr = trended.select(
        "t",
        "qv",
        "trend_q",
        (F.col("t") % F.lit(period)).alias("phase"),
        (F.col("qv").cast("double") - F.col("trend_q")).alias("dt_q"),
    )
    phase_means = (
        detr.filter(F.col("dt_q").isNotNull())
        .groupBy("phase")
        .agg(
            (
                F.sum(F.round(F.col("dt_q") * F.lit(1_000_000.0)).cast(_DEC))
                .cast("double")
                / (F.count(F.lit(1)).cast("double") * F.lit(1_000_000.0))
            ).alias("raw_seasonal")
        )
    )
    center = phase_means.agg(
        (
            F.sum(
                F.round(F.col("raw_seasonal") * F.lit(1_000_000.0)).cast(_DEC)
            ).cast("double")
            / (F.count(F.lit(1)).cast("double") * F.lit(1_000_000.0))
        ).alias("mean_seasonal")
    )
    seas = phase_means.crossJoin(F.broadcast(center)).select(
        "phase",
        (F.col("raw_seasonal") - F.col("mean_seasonal")).alias("seasonal_q"),
    )
    out = detr.join(F.broadcast(seas), "phase")
    sc = F.lit(float(v_scale))
    return out.select(
        "t",
        F.round(F.col("qv").cast("double") / sc, 6).alias("value"),
        F.round(F.col("trend_q") / sc, 6).alias("trend"),
        F.round(F.col("seasonal_q") / sc, 6).alias("seasonal"),
        F.round(
            (F.col("qv").cast("double") - F.col("trend_q") - F.col("seasonal_q"))
            / sc,
            6,
        ).alias("resid"),
    )


def hour_uniformity_ks(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """One-sample KS test of hour-of-day uniformity — "is traffic flat
    around the clock" as a single exact distance (the trig-free
    answer to a circular-uniformity question; evt_hour_anova asks it
    per-hour, this gives the one-number gate): one row (n, d, at_hour,
    d_scaled) where D = max_h |F̂(h) − (h+1)/24| and
    d_scaled = D·√n (compare to the Kolmogorov quantiles).

    Fully exact until the last step: the empirical and uniform CDFs
    compare as the integer cross-product |24·cum_h − (h+1)·n| over ALL
    24 cells — the observed counts left-join a 24-row hour frame so
    hours with ZERO events still participate in the max (all events in
    hour 23 yields D ≈ 0.958, not 0); ONE division and one sqrt finish
    it. at_hour is the smallest hour achieving the max (deterministic
    tie-break).
    """
    hrs = df.filter(F.col(ts_col).isNotNull()).select(
        F.floor(
            F.pmod(
                F.floor(
                    F.unix_micros(F.col(ts_col).cast("timestamp"))
                    / F.lit(3_600_000_000)
                ),
                F.lit(24),
            )
        ).cast("long").alias("h")
    )
    grid = df.sparkSession.range(0, 24).select(F.col("id").alias("h"))
    per_h = grid.join(
        hrs.groupBy("h").agg(F.count(F.lit(1)).cast("long").alias("c")), "h", "left"
    ).select("h", F.coalesce("c", F.lit(0)).cast("long").alias("c"))
    w = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, 0)
    tot = per_h.agg(F.sum("c").cast("long").alias("n"))
    cum = per_h.select(
        "h", F.sum("c").over(w).cast("long").alias("cum")
    ).crossJoin(F.broadcast(tot))
    num = F.abs(
        F.lit(24).cast(_DEC) * F.col("cum").cast(_DEC)
        - (F.col("h") + 1).cast(_DEC) * F.col("n").cast(_DEC)
    )
    staged = cum.select("h", "n", num.alias("num"))
    wmax = Window.partitionBy("n")
    best = (
        staged.withColumn("dnum", F.max("num").over(wmax))
        .filter(F.col("num") == F.col("dnum"))
        .groupBy("n", "dnum")
        .agg(F.min("h").cast("long").alias("at_hour"))
    )
    nd = F.col("n").cast("double")
    d = F.col("dnum").cast("double") / (F.lit(24.0) * nd)
    return best.select(
        "n",
        F.round(d, 6).alias("d"),
        "at_hour",
        F.round(d * F.sqrt(nd), 6).alias("d_scaled"),
    )


def pot_tail_fit(
    df: DataFrame,
    value_col: str,
    threshold: float,
    scale: int = 100,
) -> DataFrame:
    """Peaks-over-threshold tail fit — method-of-moments GPD on the
    exceedances over a FIXED threshold u: one row (u, n, n_exceed,
    exceed_rate, mean_excess, xi, sigma). ξ > 0 ⇒ heavy (Pareto-ish)
    tail, ξ ≈ 0 exponential, ξ < 0 bounded; the extreme-value
    companion to evt_hill_tail (Hill assumes ξ > 0; GPD-MOM also
    detects light/bounded tails). ξ = ½(1 − m²/s²),
    σ = ½m(1 + m²/s²) from the excess mean/variance.

    Engine-exact: the threshold is a literal on the quantized grid
    (never an estimated quantile — that would make the gate
    data-order-dependent), excesses are exact integers, moments are
    exact wide-integer sums, and ξ/σ are fixed double sequences on
    final scalars. ONE filtered hash fold.
    """
    qu = int(round(threshold * scale))
    q = df.filter(F.col(value_col).isNotNull()).select(
        F.round(F.col(value_col) * F.lit(scale)).cast("long").alias("qv")
    )
    agg = q.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("qv") > qu).cast("int")).cast("long").alias("n_exceed"),
        F.sum(
            F.when(F.col("qv") > qu, (F.col("qv") - qu).cast(_DEC))
        ).alias("s"),
        F.sum(
            F.when(
                F.col("qv") > qu,
                (F.col("qv") - qu).cast(_DEC) * (F.col("qv") - qu).cast(_DEC),
            )
        ).alias("ss"),
    )
    ne = F.col("n_exceed").cast("double")
    sc = F.lit(float(scale))
    m = F.col("s").cast("double") / (ne * sc)
    s2 = (
        (
            F.col("n_exceed").cast(_DEC) * F.col("ss")
            - F.col("s") * F.col("s")
        ).cast("double")
        / (ne * ne * sc * sc)
    )
    ratio = m * m / s2
    ok = (F.col("n_exceed") >= 2) & (s2 > 0)
    return agg.select(
        F.lit(float(threshold)).alias("u"),
        "n",
        "n_exceed",
        F.when(
            F.col("n") > 0,
            F.round(ne / F.col("n").cast("double"), 6),
        ).alias("exceed_rate"),
        F.when(F.col("n_exceed") > 0, F.round(m, 6)).alias("mean_excess"),
        F.when(ok, F.round((1 - ratio) / 2, 6)).alias("xi"),
        F.when(ok, F.round(m / 2 * (1 + ratio), 6)).alias("sigma"),
    )


def max_drawdown(
    df: DataFrame,
    t_col: str,
    v_col: str,
    v_scale: int = 100,
) -> DataFrame:
    """Maximum drawdown of the cumulative series — the worst
    peak-to-trough slide of Σv over time (the risk number a burn-rate
    / revenue / token-budget series is actually judged by; variance
    ignores ORDER, drawdown is nothing but order): one row
    (n, final_cum, peak, max_drawdown, max_drawdown_pct, trough_t).
    trough_t is the earliest bucket achieving the max (deterministic).

    Engine-exact and window-pure: quantized values accumulate as an
    exact integer prefix sum, the running peak is an integer running
    max, every drawdown is an integer difference — ONE division for
    the pct at the end. Runs on the bounded time grid.
    """
    q = df.filter(F.col(t_col).isNotNull() & F.col(v_col).isNotNull()).select(
        F.col(t_col).cast("long").alias("t"),
        F.round(F.col(v_col) * F.lit(v_scale)).cast("long").alias("qv"),
    )
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    staged = q.select(
        "t",
        F.sum("qv").over(w).cast("long").alias("cum"),
    ).select(
        "t",
        "cum",
        F.max("cum").over(w).cast("long").alias("peak"),
    ).select(
        "t", "cum", "peak", (F.col("peak") - F.col("cum")).alias("dd")
    )
    wall = Window.partitionBy(F.lit(1))
    best = (
        staged.withColumn("mdd", F.max("dd").over(wall))
        .filter(F.col("dd") == F.col("mdd"))
        .groupBy("mdd")
        .agg(
            F.min("t").cast("long").alias("trough_t"),
            # the peak standing at the earliest max-drawdown trough
            F.min_by("peak", "t").cast("long").alias("_pk_at"),
        )
    )
    tails = staged.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.max("cum").cast("long").alias("gpeak"),
    )
    sc = F.lit(float(v_scale))
    fin = staged.orderBy(F.col("t").desc()).limit(1).select(
        F.col("cum").alias("final_cum_q")
    )
    out = best.crossJoin(F.broadcast(tails)).crossJoin(F.broadcast(fin))
    return out.select(
        "n",
        F.round(F.col("final_cum_q").cast("double") / sc, 6).alias("final_cum"),
        F.round(F.col("gpeak").cast("double") / sc, 6).alias("peak"),
        F.round(F.col("mdd").cast("double") / sc, 6).alias("max_drawdown"),
        F.when(
            F.col("_pk_at") > 0,
            F.round(
                F.col("mdd").cast("double") / F.col("_pk_at").cast("double"), 6
            ),
        ).alias("max_drawdown_pct"),
        "trough_t",
    )


def active_users(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    window_days: int = 7,
) -> DataFrame:
    """DAU / trailing-WAU / stickiness per day — the product-health
    trio (evt_retention gives cohort curves; this is the daily
    operating dashboard): one row per observed day (day, dau, wau,
    stickiness) with wau = distinct users over the trailing
    `window_days` (inclusive) and stickiness = dau/wau (the classic
    "what fraction of the weekly base shows up daily").

    Exact and blow-up-bounded: the (user, day) pairs dedup FIRST (a
    hot user costs one row per active day), the trailing window is a
    range join against the ≤|days| day grid (broadcast — never a
    data-sized pairing), and both counts are exact distincts. One
    division per day.
    """
    du = df.filter(
        F.col(ts_col).isNotNull() & F.col(user_col).isNotNull()
    ).select(
        F.col(user_col).alias("u"),
        F.floor(
            F.unix_micros(F.col(ts_col).cast("timestamp"))
            / F.lit(86_400_000_000)
        ).cast("long").alias("day"),
    ).distinct()
    days = du.select("day").distinct().select(F.col("day").alias("d"))
    wau = (
        du.join(
            F.broadcast(days),
            (F.col("day") <= F.col("d"))
            & (F.col("day") >= F.col("d") - F.lit(window_days - 1)),
        )
        .groupBy("d")
        .agg(F.countDistinct("u").cast("long").alias("wau"))
    )
    dau = du.groupBy(F.col("day").alias("d")).agg(
        F.countDistinct("u").cast("long").alias("dau")
    )
    return (
        dau.join(wau, "d")
        .select(
            F.col("d").alias("day"),
            "dau",
            "wau",
            F.when(
                F.col("wau") > 0,
                F.round(
                    F.col("dau").cast("double") / F.col("wau").cast("double"),
                    6,
                ),
            ).alias("stickiness"),
        )
    )


def slo_burn(
    df: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    error_type: str = "error",
    slo_error_rate: float = 0.05,
    window_days: int = 7,
) -> DataFrame:
    """SLO error-budget burn table — the SRE view of the event stream:
    one row per day (day, n, n_err, rate, window_rate, burn) where
    burn = trailing-`window_days` error rate over the SLO target
    (burn > 1 ⇒ the budget is being spent faster than provisioned;
    the multi-window burn-rate alert rule's batch twin). evt_cusum
    finds level shifts in a metric; this prices them against an
    explicit objective.

    Exact: per-day counts are integers, the trailing window is an
    integer RANGE frame over the bounded day grid, and rate/burn are
    one division each against the literal SLO.
    """
    d = df.filter(F.col(ts_col).isNotNull() & F.col(type_col).isNotNull()).select(
        F.floor(
            F.unix_micros(F.col(ts_col).cast("timestamp"))
            / F.lit(86_400_000_000)
        ).cast("long").alias("day"),
        (F.col(type_col) == error_type).cast("int").alias("e"),
    )
    per_d = d.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("e").cast("long").alias("n_err"),
    )
    w = Window.orderBy("day").rangeBetween(-(window_days - 1), 0)
    roll = per_d.select(
        "day",
        "n",
        "n_err",
        F.sum("n").over(w).cast("long").alias("wn"),
        F.sum("n_err").over(w).cast("long").alias("we"),
    )
    rate = F.col("n_err").cast("double") / F.col("n").cast("double")
    wrate = F.col("we").cast("double") / F.col("wn").cast("double")
    return roll.select(
        "day",
        "n",
        "n_err",
        F.round(rate, 6).alias("rate"),
        F.round(wrate, 6).alias("window_rate"),
        F.round(wrate / F.lit(float(slo_error_rate)), 6).alias("burn"),
    )


def ses_forecast(
    df: DataFrame,
    t_col: str,
    v_col: str,
    alpha: float = 0.3,
    v_scale: int = 1,
) -> DataFrame:
    """Simple exponential smoothing, recursion-free — the real
    smoother behind the naive baselines forecast_eval grades: one row
    per bucket (t, value, smoothed, forecast_err) plus the one-step-
    ahead property (smoothed at t is the forecast FOR t+1).
    s_t = Σ_{k=0..t−1} α(1−α)^k·y_{t−k} + (1−α)^t·y_0 — the recursion
    unrolled into literal geometric weights, so a distributed engine
    computes it without any sequential state.

    Engine-exact: the grid is re-indexed densely (contiguity not
    required), each weight·value term is nano-rounded (×1e9) and
    exact-summed per target row, and the O(grid²) unroll is the
    bounded-series contract (30–3650 buckets — never raw rows; at a
    larger grid, truncate the tail: (1−α)^k < 1e−12 after ~90 steps
    at α=0.3, documented).
    """
    q = df.filter(F.col(t_col).isNotNull() & F.col(v_col).isNotNull()).select(
        F.col(t_col).cast("long").alias("t"),
        F.round(F.col(v_col) * F.lit(v_scale)).cast("long").alias("qv"),
    )
    w = Window.orderBy("t")
    idx = q.select(
        "t", "qv", (F.row_number().over(w) - 1).cast("long").alias("i")
    )
    a = float(alpha)
    pairs = (
        idx.alias("tgt")
        .join(
            F.broadcast(idx.select(F.col("i").alias("j"), F.col("qv").alias("qy"))),
            F.col("j") <= F.col("i"),
        )
    )
    # weight for source j at target i: α(1−α)^(i−j), except j=0 gets
    # the full remainder (1−α)^i (the s_0 = y_0 seed)
    wexp = F.when(
        F.col("j") == 0,
        F.pow(F.lit(1.0 - a), F.col("i").cast("double")),
    ).otherwise(
        F.lit(a) * F.pow(F.lit(1.0 - a), (F.col("i") - F.col("j")).cast("double"))
    )
    term = F.round(
        wexp * F.col("qy").cast("double") * F.lit(1_000_000_000.0)
    ).cast(_DEC)
    sm = pairs.groupBy("t", "i", "qv").agg(F.sum(term).alias("s_nano"))
    sc = F.lit(float(v_scale))
    smoothed = F.col("s_nano").cast("double") / (F.lit(1_000_000_000.0) * sc)
    wlag = Window.orderBy("t")
    staged = sm.select(
        "t",
        F.round(F.col("qv").cast("double") / sc, 6).alias("value"),
        F.round(smoothed, 6).alias("smoothed"),
        smoothed.alias("_sm_raw"),
    )
    return staged.select(
        "t",
        "value",
        "smoothed",
        F.round(
            F.col("value") - F.lag("_sm_raw").over(wlag), 6
        ).alias("forecast_err"),
    )


def week_over_week(
    df: DataFrame,
    ts_col: str = "ts",
    lag_days: int = 7,
) -> DataFrame:
    """Week-over-week traffic comparison with a per-day significance
    gate: one row per day with a lag-`lag_days` twin (day, n, n_prev,
    ratio, z). z is the conditional Poisson two-rate statistic
    (c₁−c₂)/√(c₁+c₂) — the same exact-integer form stat_poisson_rate
    uses, applied per day so "Tuesday is down 8%, z=−3.1" is one row.
    The seasonality-honest daily delta (same weekday compares to same
    weekday).

    Exact: integer day counts, a grid self-join on (day − lag), one
    division + one sqrt per row.
    """
    d = df.filter(F.col(ts_col).isNotNull()).groupBy(
        F.floor(
            F.unix_micros(F.col(ts_col).cast("timestamp"))
            / F.lit(86_400_000_000)
        ).cast("long").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    prev = d.select(
        (F.col("day") + F.lit(lag_days)).alias("day"),
        F.col("n").alias("n_prev"),
    )
    j = d.join(F.broadcast(prev), "day")
    tot = (F.col("n") + F.col("n_prev")).cast("double")
    return j.select(
        "day",
        "n",
        "n_prev",
        F.when(
            F.col("n_prev") > 0,
            F.round(F.col("n").cast("double") / F.col("n_prev").cast("double"), 6),
        ).alias("ratio"),
        F.when(
            tot > 0,
            F.round(
                (F.col("n") - F.col("n_prev")).cast("double") / F.sqrt(tot), 6
            ),
        ).alias("z"),
    )


def seasonal_strength(
    df: DataFrame,
    t_col: str,
    v_col: str,
    period: int = 7,
    v_scale: int = 1,
) -> DataFrame:
    """Hyndman-style seasonal/trend strength of a regular series —
    the one-row "is this series worth decomposing" gate on top of
    seasonal_decompose_additive: (n_used, var_resid, var_detrended,
    var_deseasoned, strength_seasonal, strength_trend).
    strength_seasonal = max(0, 1 − Var(R)/Var(S+R)),
    strength_trend = max(0, 1 − Var(R)/Var(T+R)) — both in [0,1];
    ≥ 0.6 is the usual "strong" reading. Rows in the trend warm-up
    (NULL trend) are excluded from every variance, so the three
    variances are computed over the SAME support.

    Engine-exact: the decomposition's doubles are micro-rounded
    (×1e6) to integers per row, variances then come from exact
    integer moments — one division each, fixed final combination.
    """
    dec = seasonal_decompose_additive(df, t_col, v_col, period, v_scale)
    used = dec.filter(F.col("resid").isNotNull()).select(
        F.round(F.col("resid") * F.lit(1_000_000.0)).cast("long").alias("qr"),
        F.round(
            (F.col("seasonal") + F.col("resid")) * F.lit(1_000_000.0)
        ).cast("long").alias("qsr"),
        F.round(
            (F.col("trend") + F.col("resid")) * F.lit(1_000_000.0)
        ).cast("long").alias("qtr"),
    )

    def mom(c):
        return [
            F.sum(F.col(c).cast(_DEC)).alias(f"s_{c}"),
            F.sum(F.col(c).cast(_DEC) * F.col(c).cast(_DEC)).alias(f"ss_{c}"),
        ]

    agg = used.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        *mom("qr"), *mom("qsr"), *mom("qtr"),
    )
    nd = F.col("n").cast("double")
    M2 = F.lit(1e12)

    def var(c):
        return (
            (
                F.col("n").cast(_DEC) * F.col(f"ss_{c}")
                - F.col(f"s_{c}") * F.col(f"s_{c}")
            ).cast("double")
            / (nd * nd * M2)
        )

    vr, vsr, vtr = var("qr"), var("qsr"), var("qtr")
    ok = F.col("n") >= 3
    return agg.select(
        F.col("n").alias("n_used"),
        F.when(ok, F.round(vr, 6)).alias("var_resid"),
        F.when(ok, F.round(vsr, 6)).alias("var_detrended"),
        F.when(ok, F.round(vtr, 6)).alias("var_deseasoned"),
        F.when(
            ok & (vsr > 0),
            F.round(F.greatest(F.lit(0.0), 1 - vr / vsr), 6),
        ).alias("strength_seasonal"),
        F.when(
            ok & (vtr > 0),
            F.round(F.greatest(F.lit(0.0), 1 - vr / vtr), 6),
        ).alias("strength_trend"),
    )


def type_mix_entropy_daily(
    df: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Daily event-type mix entropy + day-over-day delta — "did the
    SHAPE of traffic change, not just its volume" (week_over_week
    watches counts; this watches composition): one row per day (day,
    n, k_types, h_bits, h_delta). A collapsing h (one type taking
    over) flags incidents volume alone hides.

    Engine-exact (the entropy_rate recipe): per-(day, type) counts
    are integers, each n·(ln d − ln n)/ln2 term nano-rounds and
    exact-sums per day, the lag runs over the bounded day grid.
    """
    cells = df.filter(
        F.col(ts_col).isNotNull() & F.col(type_col).isNotNull()
    ).groupBy(
        F.floor(
            F.unix_micros(F.col(ts_col).cast("timestamp"))
            / F.lit(86_400_000_000)
        ).cast("long").alias("day"),
        F.col(type_col).alias("ty"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    deg = cells.groupBy("day").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k_types"),
    )
    ln2 = 0.6931471805599453
    NANO = F.lit(1_000_000_000.0)
    j = cells.join(deg, "day")
    term = F.round(
        F.col("c").cast("double")
        * (F.log(F.col("n").cast("double")) - F.log(F.col("c").cast("double")))
        / F.lit(ln2)
        * NANO
    ).cast("long")
    agg = j.groupBy("day", "n", "k_types").agg(
        F.sum(term).cast("long").alias("h_nano")
    )
    h = F.col("h_nano").cast("double") / (F.col("n").cast("double") * NANO)
    w = Window.orderBy("day")
    staged = agg.select("day", "n", "k_types", h.alias("_h"))
    return staged.select(
        "day",
        "n",
        "k_types",
        F.round(F.col("_h"), 6).alias("h_bits"),
        F.round(F.col("_h") - F.lag("_h").over(w), 6).alias("h_delta"),
    )


def day_envelope(
    df: DataFrame,
    ts_col: str = "ts",
) -> DataFrame:
    """Typical-day traffic envelope — exact p10/p50/p90 of the hourly
    count for each hour-of-day: one row per hour (hod, n_days, p10,
    p50, p90). The ops-dashboard band "today at 14:00 should sit
    between 1.1k and 1.9k"; evt_hour_anova says the hours differ,
    this says by how much and with what spread.

    Exact order statistics: per-(hod, count-value) cells, cumulative
    counts over each hour's ≤|days| distinct values, percentile =
    smallest value whose cumulative count reaches ⌈q·n⌉ (the
    repo-wide exact-percentile rule). No sort of raw rows.
    """
    hours = df.filter(F.col(ts_col).isNotNull()).groupBy(
        F.floor(
            F.unix_micros(F.col(ts_col).cast("timestamp"))
            / F.lit(3_600_000_000)
        ).cast("long").alias("h")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    per = hours.select((F.col("h") % 24).alias("hod"), "c")
    cells = per.groupBy("hod", "c").agg(F.count(F.lit(1)).cast("long").alias("t"))
    w = Window.partitionBy("hod").orderBy("c").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = cells.select(
        "hod", "c", F.sum("t").over(w).cast("long").alias("cum")
    )
    tot = cells.groupBy("hod").agg(F.sum("t").cast("long").alias("n_days"))
    j = cum.join(F.broadcast(tot), "hod")

    def pick(q100: int, name: str):
        thr = F.ceil(F.col("n_days") * F.lit(q100) / F.lit(100)).cast("long")
        return F.min(F.when(F.col("cum") >= thr, F.col("c"))).cast("long").alias(
            name
        )

    return j.groupBy("hod", "n_days").agg(
        pick(10, "p10"), pick(50, "p50"), pick(90, "p90")
    ).select("hod", "n_days", "p10", "p50", "p90")


def peak_concentration(
    df: DataFrame,
    ts_col: str = "ts",
    top_k: int = 3,
) -> DataFrame:
    """Daily peak-hour concentration — what share of each day's
    traffic its `top_k` busiest hours carry: one row per day (day, n,
    top_share). High share ⇒ capacity must be provisioned for bursts,
    not averages (the per-day, actionable cut of evt_key_skew's
    global story). Deterministic under tied hours (rank ties break by
    hour index).

    Exact: per-(day, hour) counts are integers, the per-day rank is a
    bounded 24-row window, and the share is ONE division of exact
    longs.
    """
    cells = df.filter(F.col(ts_col).isNotNull()).groupBy(
        F.floor(
            F.unix_micros(F.col(ts_col).cast("timestamp"))
            / F.lit(3_600_000_000)
        ).cast("long").alias("h")
    ).agg(F.count(F.lit(1)).cast("long").alias("c")).select(
        (F.col("h") / F.lit(24)).cast("long").alias("day"),
        (F.col("h") % 24).alias("hod"),
        "c",
    )
    w = Window.partitionBy("day").orderBy(
        F.col("c").desc(), F.col("hod").asc()
    )
    ranked = cells.select(
        "day", "c", F.row_number().over(w).alias("rk")
    )
    return ranked.groupBy("day").agg(
        F.sum("c").cast("long").alias("n"),
        F.round(
            F.sum(F.when(F.col("rk") <= top_k, F.col("c"))).cast("double")
            / F.sum("c").cast("double"),
            6,
        ).alias("top_share"),
    )


def peak_load(
    df: DataFrame,
    ts_col: str = "ts",
    window_minutes: int = 5,
) -> DataFrame:
    """Peak sustained load — the busiest trailing `window_minutes`
    stretch of the whole stream: one row (n_minutes, peak_window_end,
    peak_count, peak_per_min). The number a rate limiter or
    autoscaler must actually survive; means and even p99s of
    per-minute counts understate it because bursts correlate across
    adjacent minutes.

    Exact: minute-grid counts are integers, the trailing window is an
    integer RANGE frame (gap-robust — empty minutes simply contribute
    nothing), the peak picks deterministically (earliest window end
    on ties). One grid window + one fold.
    """
    per_min = df.filter(F.col(ts_col).isNotNull()).groupBy(
        F.floor(
            F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(60_000_000)
        ).cast("long").alias("m")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    w = Window.orderBy("m").rangeBetween(-(window_minutes - 1), 0)
    roll = per_min.select(
        "m", F.sum("c").over(w).cast("long").alias("wc")
    )
    wall = Window.partitionBy(F.lit(1))
    best = (
        roll.withColumn("peak", F.max("wc").over(wall))
        .filter(F.col("wc") == F.col("peak"))
        .groupBy("peak")
        .agg(F.min("m").cast("long").alias("peak_window_end"))
    )
    tot = per_min.agg(F.count(F.lit(1)).cast("long").alias("n_minutes"))
    return best.crossJoin(F.broadcast(tot)).select(
        "n_minutes",
        "peak_window_end",
        F.col("peak").alias("peak_count"),
        F.round(
            F.col("peak").cast("double") / F.lit(float(window_minutes)), 6
        ).alias("peak_per_min"),
    )
