"""Temporal joins Spark has no built-in operator for: as-of join and
range (interval) join — both expressed as compositions of existing
DataFrame ops (the brief's preferred strategy for custom operators), no
UDFs, no cartesian products.

* as-of join — "for each left event, the latest right event at or before
  it, per key". The classic distributed formulation: union both sides
  tagged, ONE shuffle on the key, a running last-non-null window carries
  the most recent right payload forward in time order. No join blowup:
  each row is touched once; wall-clock is bounded by the hottest key's
  row count (at 100 TB you'd sub-bucket hot keys by coarse time range and
  stitch the boundary — noted, not needed at driver scale).
* range join — "which intervals contain this point". Equality-keyed
  bucketization: intervals explode to the O(length/bucket) buckets they
  cover, points key on their single bucket, and an exact timestamp filter
  runs after the equi-join. Bucket assignment uses integer microsecond
  arithmetic (unix_micros // bucket), so candidate generation is exact
  and monotone — every true match shares a bucket by construction; the
  bucket size trades shuffle fan-out (long intervals explode wider)
  against join selectivity (big buckets pair more false candidates).
  Catalyst alone would fall back to BroadcastNestedLoopJoin (small
  intervals) or a cartesian (large) on the raw inequality predicate.

DuckDB oracles: the as-of join restates as DuckDB's native ASOF JOIN; the
range join as a plain inequality join (IEJoin) — both independent of the
Spark formulation."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts: str = "ts",
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: every left row gains the payload of the latest
    right row with right.ts <= left.ts and equal key columns `on` (nulls
    when no such row). Right payload columns (everything but `on`) come
    back suffixed, its timestamp included.

    Tie semantics: a right row exactly at left.ts matches (<=); among
    several right rows sharing (key, ts) the one with the greatest payload
    struct wins — deterministic, but callers wanting one-row-per-instant
    semantics should pre-aggregate the right side (the oracle does).

    One shuffle total (the window partition on `on`); neither side is
    ever joined row-by-row, so skew cost is the hottest key's row count,
    not a pair count."""
    r_payload = [c for c in right.columns if c not in on]
    if ts not in right.columns:
        raise ValueError(f"right side must carry the timestamp column {ts!r}")
    r_struct = F.struct(*[F.col(c) for c in r_payload])
    l_struct = F.struct(*[F.col(c) for c in left.columns if c not in on])

    r_tagged = right.select(
        *on,
        F.col(ts).alias("_ts"),
        r_struct.alias("_r"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(left.select(l_struct).schema[0].dataType).alias("_l"),
    )
    l_tagged = left.select(
        *on,
        F.col(ts).alias("_ts"),
        F.lit(None).cast(right.select(r_struct).schema[0].dataType).alias("_r"),
        F.lit(1).alias("_side"),
        l_struct.alias("_l"),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts"), F.col("_side"), F.col("_r"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = (
        r_tagged.unionByName(l_tagged)
        .withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    out_cols = [F.col(c) for c in on]
    out_cols += [F.col(f"_l.{c}").alias(c) for c in left.columns if c not in on]
    out_cols += [F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in r_payload]
    return carried.select(*out_cols)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts: str = "ts",
    start: str = "start",
    end: str = "end",
    bucket_seconds: int = 1800,
) -> DataFrame:
    """Inner join of every point row to every interval row with
    start <= point.ts < end (end-exclusive). Returns all point columns +
    all interval columns.

    Bucketized equi-join (module docstring): exact integer-microsecond
    bucket keys, post-join timestamp filter — the result is identical for
    ANY bucket_seconds; the knob only tunes candidate fan-out."""
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")
    b_us = F.lit(int(bucket_seconds) * 1_000_000)

    def bucket(c):
        # unix_micros only accepts TIMESTAMP — cast first so TIMESTAMP_NTZ
        # (what parquet scans produce) works too. The NTZ→instant mapping
        # is monotone non-decreasing, which is all bucketing needs: every
        # true match still shares a bucket, and the exact filter below
        # compares the ORIGINAL columns
        return F.floor(F.unix_micros(F.col(c).cast("timestamp")) / b_us).cast("long")

    p = points.withColumn("_b", bucket(ts))
    iv = (
        intervals.withColumn("_bs", bucket(start))
        .withColumn("_be", bucket(end))
        .withColumn("_b", F.explode(F.sequence(F.col("_bs"), F.col("_be"))))
        .drop("_bs", "_be")
    )
    return (
        p.join(iv, "_b")
        .filter((F.col(start) <= F.col(ts)) & (F.col(ts) < F.col(end)))
        .drop("_b")
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    within: str = "7 days",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel completion per user — the earliest-completion
    semantics every product-analytics engine ships: step 1's time is the
    user's FIRST step-1 event; step k's time is the first step-k event
    STRICTLY after step k-1 and within `within` of step 1. Returns one row
    per user who performed step 1: (user_id, n_completed, t1_us..tk_us,
    later steps NULL once the chain breaks). Users without a step-1 event
    are absent (inner semantics on the anchor step).

    Greedy earliest matching is the contract (not completion-maximal
    matching — the standard funnel definition). All timestamps epoch-us
    for engine portability.

    Scale: one filtered aggregate per step over the (user-key) events —
    k-1 joins keyed on user_id, each against the ALREADY-AGGREGATED
    one-row-per-user frame (never event×event), so the heavy side streams
    once per step and the per-user frame stays node-cardinality. A funnel
    over 10^12 events is k passes of partial-aggregating groupBy — the
    declarative restatement of the per-user state machine
    (applyInPandasWithState territory only when steps must interleave with
    resets)."""
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    iv = F.expr(f"INTERVAL {within}")
    base = events.select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("event_type"),
        F.col(ts_col).cast("timestamp").alias("ts"),
    )
    cur = (
        base.filter(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        prev = f"t{i - 1}"
        anchor = cur.filter(F.col(prev).isNotNull()).select("user_id", "t1", prev)
        cand = (
            base.filter(F.col("event_type") == step)
            .join(anchor, "user_id")
            .filter((F.col("ts") > F.col(prev)) & (F.col("ts") <= F.col("t1") + iv))
            .groupBy("user_id")
            .agg(F.min("ts").alias(f"t{i}"))
        )
        cur = cur.join(cand, "user_id", "left")
    n_completed = sum(
        (F.col(f"t{i}").isNotNull().cast("int") for i in range(2, len(steps) + 1)),
        start=F.lit(1),
    )
    return cur.select(
        "user_id",
        n_completed.cast("long").alias("n_completed"),
        *[
            F.unix_micros(F.col(f"t{i}")).alias(f"t{i}_us")
            for i in range(1, len(steps) + 1)
        ],
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_weeks: int | None = None,
) -> DataFrame:
    """Weekly cohort retention: cohort = ISO week of the user's first
    event; for each (cohort, week offset) the count of cohort users active
    that week and the retention rate vs the cohort size. Offset 0 is the
    cohort week itself (rate 1.0 by construction). Returns
    (cohort_week_us, week_offset, n_active, cohort_size, retention_rate).

    Integer arithmetic end-to-end (epoch-us week starts, datediff in
    whole weeks); the single float — n_active / cohort_size — is one
    fixed-shape round-6 division, so the SQL restatement replays it
    exactly. Scale: one groupBy(user) for first-seen, one distinct on
    (user, week), one join back on user (node-cardinality dimension — a
    candidate for broadcast when users ≪ events), one final groupBy."""
    base = events.select(
        F.col(user_col).alias("user_id"),
        F.date_trunc("week", F.col(ts_col).cast("timestamp")).alias("week"),
    )
    first = base.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    sizes = first.groupBy("cohort_week").agg(
        F.countDistinct("user_id").alias("cohort_size")
    )
    active = (
        base.distinct()
        .join(first, "user_id")
        .select(
            "cohort_week",
            "user_id",
            (
                F.floor(
                    (F.unix_micros("week") - F.unix_micros("cohort_week"))
                    / (7 * 24 * 3600 * 1_000_000)
                )
            ).alias("week_offset"),
        )
    )
    if max_weeks is not None:
        active = active.filter(F.col("week_offset") <= max_weeks)
    agg = active.groupBy("cohort_week", "week_offset").agg(
        F.countDistinct("user_id").alias("n_active")
    )
    return (
        agg.join(sizes, "cohort_week")
        .select(
            F.unix_micros("cohort_week").alias("cohort_week_us"),
            F.col("week_offset").cast("long").alias("week_offset"),
            F.col("n_active").cast("long").alias("n_active"),
            F.col("cohort_size").cast("long").alias("cohort_size"),
            F.round(F.col("n_active") / F.col("cohort_size"), 6).alias("retention_rate"),
        )
    )


def rolling_stats(
    events: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    ts_col: str = "ts",
    window_hours: int = 24,
) -> DataFrame:
    """Trailing event-time window per row: for every event, the count /
    sum / mean of `value_col` over the preceding `window_hours` (inclusive
    both ends) within its group — the moving-average / rate-limiter shape
    every monitoring pipeline needs. RANGE framing on integer microseconds
    (unix_micros after a timestamp cast — parquet event time arrives as
    TIMESTAMP_NTZ), so timestamp ties are peers in both engines.

    One shuffle on the group key, then a partition-local ordered sweep.
    The frame is O(events-in-window) per row but Spark's RANGE window
    keeps a sliding buffer, not a re-scan. Low-cardinality groups
    serialize per group (5 event types → 5 reducers): at corpus scale
    pre-split each group into coarse time buckets that OVERLAP by one
    window length, compute per bucket, and keep rows from the bucket's
    core — embarrassingly parallel, boundary-exact (same trick as the
    as-of hot-key note above).

    Float contract: values accumulate as round-4 FIXED-POINT micro-units
    (long), because a float sliding-sum's association order is engine-
    private (Spark's running buffer vs DuckDB's segment tree disagree in
    the last ulps once windows hold hundreds of rows — observed at
    sf0.01). Integer sums are order-free and exact; the 1e-4 quantization
    is the operator's stated precision, not a hidden rounding."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    units = F.round(F.col(value_col) * 10000, 0).cast("long")
    w = (
        Window.partitionBy(group_col)
        .orderBy(us)
        .rangeBetween(-window_hours * 3600 * 1_000_000, 0)
    )
    ev = events.withColumn("_u", units)
    sum_u = F.sum("_u").over(w)
    n = F.count("_u").over(w)
    return ev.select(
        "event_id",
        F.col(group_col),
        us.alias("ts_us"),
        n.cast("long").alias("rolling_n"),
        F.round(sum_u / F.lit(10000.0), 4).alias("rolling_sum"),
        F.round(sum_u / F.lit(10000.0) / n, 6).alias("rolling_avg"),
    )


def scd2_build(
    changes: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    attr_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Type-2 slowly-changing-dimension build: a change stream collapses
    to one row per (key, version) with [valid_from_us, valid_to_us)
    validity intervals — the warehouse dimension-table shape an Iceberg
    MERGE pipeline maintains incrementally (merge_upsert is the type-1
    twin; this keeps history).

    Semantics: per key in event-time order, a new version opens only when
    the tracked attributes actually CHANGE (consecutive duplicates are
    absorbed into the open version); the final version per key has
    valid_to_us NULL and is_current true. Same-instant duplicates first
    collapse to the greatest attribute struct per (key, ts) — the asof_join
    tie rule, deterministic under any arrival order.

    ONE shuffle, verified in the plan: the instant-dedup is itself a
    window (first row per ts in (_ts ASC, _a DESC) order == max struct per
    instant — NOT a groupBy, which would hash-partition on (key, ts) and
    force a second exchange for the key-partitioned windows), so dedup,
    change detection and interval chaining all ride one
    hashpartitioning(key) exchange, and the later windows' (_ts) sort is a
    prefix of the first window's (_ts, _a DESC) sort — no re-sort either.
    Integer-microsecond validity bounds — no float playbook needed. At
    100-TB dimension scale the key shuffle is the only data movement, and
    a hot key costs its own row count, never a pair count."""
    attrs = list(attr_cols)
    a_struct = F.struct(*[F.col(c) for c in attrs])
    base = changes.select(
        F.col(key_col).alias("_k"), F.col(ts_col).alias("_ts"), a_struct.alias("_a")
    )
    wk = Window.partitionBy("_k").orderBy(F.col("_ts").asc(), F.col("_a").desc())
    snap = base.withColumn("_pts", F.lag("_ts").over(wk)).filter(
        F.col("_pts").isNull() | (F.col("_pts") != F.col("_ts"))
    )
    w = Window.partitionBy("_k").orderBy("_ts")
    changed = snap.withColumn("_prev", F.lag("_a").over(w)).filter(
        F.col("_prev").isNull() | (F.col("_prev") != F.col("_a"))
    )
    wv = Window.partitionBy("_k").orderBy("_ts")
    return changed.select(
        F.col("_k").alias(key_col),
        F.row_number().over(wv).cast("long").alias("version"),
        *[F.col("_a")[c].alias(c) for c in attrs],
        F.unix_micros(F.col("_ts").cast("timestamp")).alias("valid_from_us"),
        F.unix_micros(F.lead("_ts").over(wv).cast("timestamp")).alias("valid_to_us"),
        F.lead("_ts").over(wv).isNull().alias("is_current"),
    )


def user_lifecycle(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user activity interval: first/last seen (µs), span days, count
    of DISTINCT active days, and the longest silence between consecutive
    active days — the churn/retention features a user table carries.
    Integer microsecond/day arithmetic end-to-end (no float playbook
    needed).

    Two aggregates: events collapse to (user, active_day) first — the
    shuffle dedups to day granularity before any window — then a per-user
    lag window over the (small) day rows finds the max gap."""
    day = F.to_date(F.col(ts_col).cast("timestamp"))
    days = events.select(
        F.col(user_col).alias("user_id"), day.alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    gaps = days.withColumn(
        "gap", F.datediff(F.col("d"), F.lag("d").over(w))
    )
    per_day = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_active_days"),
        F.max("gap").cast("long").alias("max_gap_days"),
    )
    span = events.groupBy(F.col(user_col).alias("user_id")).agg(
        F.unix_micros(F.min(F.col(ts_col).cast("timestamp"))).alias("first_seen_us"),
        F.unix_micros(F.max(F.col(ts_col).cast("timestamp"))).alias("last_seen_us"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    return span.join(per_day, "user_id").select(
        "user_id", "first_seen_us", "last_seen_us", "n_events",
        "n_active_days",
        F.coalesce(F.col("max_gap_days"), F.lit(0)).cast("long").alias("max_gap_days"),
    )


def scd2_lookup(
    events: DataFrame,
    dim: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Enrich an event stream with the dimension attributes that were
    VALID AT EVENT TIME from an scd2_build table — the fact-to-dimension
    join every warehouse pipeline runs against a type-2 dimension
    (event at 10:05 gets the version whose [valid_from_us, valid_to_us)
    interval contains 10:05, not today's row). Events before the key's
    first version (or for unknown keys) keep NULL attributes — the
    late-dimension contract, explicit rather than dropped.

    Plan: an equi-join ON THE KEY plus interval predicates — Spark executes
    it as a hash join keyed on `key_col` with the interval as a residual
    filter (never a range-only join, never a cartesian); each event meets
    only its own key's versions, so a hot key costs its version count, not
    a pair count. Versions per key are bounded by change count — the SCD2
    dedup already collapsed consecutive duplicates."""
    ev_us = F.unix_micros(F.col(f"e.{ts_col}").cast("timestamp"))
    attrs = [
        c
        for c in dim.columns
        if c not in (key_col, "version", "valid_from_us", "valid_to_us", "is_current")
    ]
    joined = events.alias("e").join(
        dim.alias("d"),
        (F.col(f"e.{key_col}") == F.col(f"d.{key_col}"))
        & (ev_us >= F.col("d.valid_from_us"))
        & (F.col("d.valid_to_us").isNull() | (ev_us < F.col("d.valid_to_us"))),
        "left",
    )
    return joined.select(
        *[F.col(f"e.{c}") for c in events.columns],
        F.col("d.version").alias("dim_version"),
        *[F.col(f"d.{c}").alias(f"dim_{c}") for c in attrs],
    )


def interarrival_stats(
    events: DataFrame,
    group_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-group inter-arrival profile (group, n_events, n_gaps,
    mean_gap_s, median_gap_s, max_gap_s): the cadence fingerprint behind
    bot detection (sub-second uniform gaps), churn risk (growing gaps —
    user_lifecycle's longest_silence generalized to the distribution) and
    ingest-source health (a feed whose median gap doubles is stalling).

    ONE (group, ts, id)-sorted exchange: gaps are integer-µs lag diffs on
    the same window sessionize uses; mean is an exact-integer division;
    the median is the exact lower-median (element at ceil(n/2) of the
    sorted gap list — deterministic, no interpolation) via one more
    group-keyed window rank. All integer µs until the three final /1e6
    conversions (round-6)."""
    from pyspark.sql import Window

    base = events.select(
        F.col(group_col).alias("group"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
        F.col(id_col).alias("_id"),
    )
    seq = Window.partitionBy("group").orderBy("_us", "_id")
    gaps = base.withColumn("_gap", F.col("_us") - F.lag("_us").over(seq)).filter(
        F.col("_gap").isNotNull()
    )
    ranked = gaps.withColumn(
        "_r", F.row_number().over(Window.partitionBy("group").orderBy("_gap", "_id"))
    ).withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy("group")))
    med = ranked.filter(F.col("_r") == F.expr("CAST((_n + 1) div 2 AS INT)")).select(
        "group", F.col("_gap").alias("_med")
    )
    agg = gaps.groupBy("group").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("_gap").cast("long").alias("_sum"),
        F.max("_gap").cast("long").alias("_max"),
    )
    sizes = base.groupBy("group").agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    return (
        sizes.join(agg, "group", "left")
        .join(med, "group", "left")
        .select(
            "group",
            "n_events",
            F.coalesce("n_gaps", F.lit(0)).cast("long").alias("n_gaps"),
            F.round(F.col("_sum") / F.col("n_gaps") / F.lit(1_000_000.0), 6).alias("mean_gap_s"),
            F.round(F.col("_med") / F.lit(1_000_000.0), 6).alias("median_gap_s"),
            F.round(F.col("_max") / F.lit(1_000_000.0), 6).alias("max_gap_s"),
        )
    )


def coalesce_intervals(
    df: DataFrame,
    key_cols: list[str],
    start_col: str = "valid_from",
    end_col: str = "valid_to",
    max_gap_micros: int = 0,
) -> DataFrame:
    """Gaps-and-islands interval coalescing: merge overlapping/adjacent
    validity intervals per key into maximal episodes — the temporal-KG
    normalization step after accumulating per-document triple assertions
    with validity windows (N sources asserting [t1,t2], [t2,t3] collapse
    to one [t1,t3] fact row), and the generic sessionizer for
    interval-shaped (not point-shaped) events.

    The classic recursion-free plan: per key in (start, end) order, an
    island opens where start exceeds the running max end of all EARLIER
    intervals by more than `max_gap_micros`; island id = running sum of
    open flags; one aggregate per (key, island). ONE key exchange carries
    both windows and the final aggregate. Decisions compare exact integer
    microseconds (unix_micros), never floats.

    Returns key_cols + (valid_from, valid_to, n_source_intervals)."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    # unix_micros only accepts TIMESTAMP — cast first so TIMESTAMP_NTZ
    # parquet columns work too (session tz pinned to UTC in session.py)
    s_us = F.unix_micros(F.col(start_col).cast("timestamp"))
    e_us = F.unix_micros(F.col(end_col).cast("timestamp"))
    w = Window.partitionBy(*key_cols).orderBy(s_us.asc(), e_us.asc())
    prev_max_end = F.max(e_us).over(w.rowsBetween(Window.unboundedPreceding, -1))
    opens = F.when(
        prev_max_end.isNull() | (s_us > prev_max_end + F.lit(max_gap_micros)),
        F.lit(1),
    ).otherwise(F.lit(0))
    island = F.sum(opens).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        df.select(*key_cols, F.col(start_col), F.col(end_col))
        .withColumn("_island", island)
        .groupBy(*key_cols, "_island")
        .agg(
            F.min(start_col).alias("valid_from"),
            F.max(end_col).alias("valid_to"),
            F.count(F.lit(1)).cast("long").alias("n_source_intervals"),
        )
        .drop("_island")
    )


def interval_conflicts(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    start_col: str = "valid_from",
    end_col: str = "valid_to",
) -> DataFrame:
    """Functional-predicate temporal contradiction detection: pairs of
    assertions with the same key (e.g. (subject, predicate) of a
    single-valued fact), DIFFERENT values, and OVERLAPPING validity
    intervals — the temporal-KG analogue of conflicting_triples: a
    point-in-time query inside the overlap would return two answers for
    a fact that must have one. Run it after accumulating per-document
    validity windows and before promoting the temporal KG; the fix is
    either interval truncation (latest assertion wins inside the
    overlap) or routing to reconciliation.

    ONE key exchange: the self-join is keyed on `key_cols`, pairs are
    ordered value_a < value_b (each conflict reported once), overlap
    test is half-open exact integer microseconds (s_a < e_b AND s_b <
    e_a — touching intervals do NOT conflict). A hot key costs its
    own assertion count squared — cap upstream (coalesce_intervals
    first collapses same-value runs, usually the bulk) — and nothing
    global. Returns key_cols + (value_a, value_b, overlap_from,
    overlap_to)."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    s_us = F.unix_micros(F.col(start_col).cast("timestamp"))
    e_us = F.unix_micros(F.col(end_col).cast("timestamp"))
    base = df.select(
        *key_cols,
        F.col(value_col).alias("_v"),
        s_us.alias("_s"),
        e_us.alias("_e"),
    )
    a = base.select(
        *key_cols,
        F.col("_v").alias("value_a"),
        F.col("_s").alias("_sa"),
        F.col("_e").alias("_ea"),
    )
    b = base.select(
        *key_cols,
        F.col("_v").alias("value_b"),
        F.col("_s").alias("_sb"),
        F.col("_e").alias("_eb"),
    )
    return (
        a.join(b, key_cols)
        .filter(
            (F.col("value_a") < F.col("value_b"))
            & (F.col("_sa") < F.col("_eb"))
            & (F.col("_sb") < F.col("_ea"))
        )
        .select(
            *key_cols,
            "value_a",
            "value_b",
            F.timestamp_micros(F.greatest("_sa", "_sb")).alias("overlap_from"),
            F.timestamp_micros(F.least("_ea", "_eb")).alias("overlap_to"),
        )
        .distinct()
    )


def temporal_reachability(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 4,
    src: str = "src",
    dst: str = "dst",
    t_col: str = "t",
) -> DataFrame:
    """Earliest-arrival TIME-RESPECTING reachability: which nodes can a
    seed's influence reach when every hop must depart no earlier than
    it arrived (an edge (u, v, t) is usable only if t ≥ arrival(u)) —
    the propagation/contagion query a static closure silently gets
    wrong (it happily routes through edges that fired BEFORE the
    information existed). seeds = (node, t0); returns (node,
    earliest_arrival) for everything reachable in ≤ max_hops
    time-respecting hops, seeds included at their t0.

    Correctness rests on the earliest-arrival dominance property: if
    arrival a₁ < a₂ at a node, every edge usable from a₂ is usable
    from a₁ — so keeping only min(arrival) per node between rounds is
    lossless, and round i holds the exact earliest arrival over all
    ≤ i-hop time-respecting paths (Bellman-Ford over the time order).
    Pure integer min-aggregation — no float playbook at all.

    Scale: max_hops rounds of one frontier⋈edges join (on the src key)
    + one min hash aggregate, each round pinned with a lazy
    localCheckpoint (ONE action at the end — the D8/H1 fold
    discipline); state is one (node, long) row per reached node."""
    state = seeds.select(
        F.col(seeds.columns[0]).alias("node"),
        F.col(seeds.columns[1]).cast("long").alias("arr"),
    ).groupBy("node").agg(F.min("arr").alias("arr"))
    e = edges.select(
        F.col(src).alias("_src"),
        F.col(dst).alias("_dst"),
        F.col(t_col).cast("long").alias("_t"),
    )
    for _ in range(max_hops):
        hop = (
            state.join(e, state["node"] == e["_src"])
            .filter(F.col("_t") >= F.col("arr"))
            .select(F.col("_dst").alias("node"), F.col("_t").alias("arr"))
        )
        state = (
            state.unionByName(hop)
            .groupBy("node")
            .agg(F.min("arr").alias("arr"))
            .localCheckpoint(eager=False)
        )
    return state.select("node", F.col("arr").alias("earliest_arrival"))
