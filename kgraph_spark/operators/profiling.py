"""Data-quality profiling for pipeline inputs: per-column summary stats
and per-group IQR outlier detection.

The reference accumulates per-stage statistics while ingesting
(kgraph/ingest.py stage counters, export.py manifest counts); a 100-TB
pipeline additionally profiles its INPUT before spending cluster-hours on
it — null rates, cardinalities, range sanity, outlier contamination.
Both operators are single-pass aggregations:

* profile_table — ONE wide aggregate computes every column's stats in a
  single scan (Catalyst expands the count-distincts; no per-column scan
  loop), then a literal-array inline pivots the one result row into one
  row per column. Exact count(DISTINCT) is the small-SF contract here;
  at 100 TB you'd flip `approx=True` (HLL++ approx_count_distinct, one
  pass, no expand) and accept the documented ±~2% — the shape of the
  output is identical.
* iqr_outliers — the Tukey fence: per-group Q1/Q3 by exact interpolated
  percentile (verified bit-identical to DuckDB's quantile_cont — same
  (1-g)·lower + g·upper interpolation), flag values outside
  [Q1 - k·IQR, Q3 + k·IQR]. Bounds and values are round-6 and the flag
  compares the ROUNDED numbers, so any SQL engine replays the decision.
  Exact percentile buffers each GROUP's values on its reducer — right
  for bounded-cardinality group columns (event types, languages,
  sources); for unbounded groups swap in approx_percentile (same fence
  shape, documented, not silently).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def profile_table(
    df: DataFrame, columns: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_value, max_value) — one
    row per profiled column, computed in ONE aggregate pass over the
    table. min/max are rendered as strings so every column type shares a
    schema (binary string ordering on both Spark and DuckDB). n_distinct
    excludes NULLs (both engines' count-distinct semantics); `approx`
    switches the cardinality to HLL++ approx_count_distinct for the
    100-TB path."""
    cols = columns if columns is not None else df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    ndv = F.approx_count_distinct if approx else F.count_distinct
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"_nn_{c}"),
            ndv(F.col(c)).alias(f"_nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_mx_{c}"),
        ]
    one = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                (F.col("_n") - F.col(f"_nn_{c}")).alias("n_nulls"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                F.col(f"_mn_{c}").alias("min_value"),
                F.col(f"_mx_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(per_col).alias("p")).select(
        "p.column",
        F.col("p.n_rows").cast("long").alias("n_rows"),
        F.col("p.n_nulls").cast("long").alias("n_nulls"),
        F.col("p.n_distinct").cast("long").alias("n_distinct"),
        "p.min_value",
        "p.max_value",
    )


def group_percentiles(
    df: DataFrame,
    value_col: str,
    group_col: str,
    percentiles: tuple[float, ...] = (0.5, 0.9, 0.95, 0.99),
) -> DataFrame:
    """Exact interpolated percentiles per group (p50/p90/… latency-style
    summary) plus count and round-6 mean — one hash aggregate, one row per
    group. Spark's `percentile` is the same linear-interpolation estimator
    as DuckDB's quantile_cont, so values are bit-comparable round-6.

    Exact percentiles sort each group's values inside the aggregate
    buffer; at 100-TB row counts swap `percentile` for
    `approx_percentile(col, p, accuracy)` (t-digest-style sketch, bounded
    memory, mergeable across partitions) — same call shape, same output
    schema, documented error bound instead of exactness."""
    aggs = [F.count(F.col(value_col)).cast("long").alias("n")] + [
        F.round(F.expr(f"percentile({value_col}, {p})"), 6).alias(
            "p" + str(p).replace("0.", "").ljust(2, "0")
        )
        for p in percentiles
    ] + [F.round(F.avg(value_col), 6).alias("mean")]
    return df.groupBy(group_col).agg(*aggs)


def iqr_outliers(
    df: DataFrame,
    value_col: str,
    group_col: str,
    k: float = 1.5,
    id_col: str | None = None,
) -> DataFrame:
    """Tukey-fence outlier flags per group: rows whose `value_col` falls
    outside [Q1 - k·IQR, Q3 + k·IQR] of their group. Returns one row per
    input row: (id?, group, value, lo, hi, is_outlier) with value/bounds
    round-6 and the flag decided on the rounded numbers (engine-portable).
    NULL values are never outliers (flag false, bounds attached).

    One exact-percentile aggregate per group + one broadcast-friendly join
    back on the group key — the fences frame is group-cardinality."""
    fences = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.round(F.expr(f"percentile({value_col}, 0.25)"), 6).alias("_q1"),
        F.round(F.expr(f"percentile({value_col}, 0.75)"), 6).alias("_q3"),
    )
    lo = F.round(F.col("_q1") - k * (F.col("_q3") - F.col("_q1")), 6)
    hi = F.round(F.col("_q3") + k * (F.col("_q3") - F.col("_q1")), 6)
    v = F.round(F.col(value_col), 6)
    out_cols = ([F.col(id_col)] if id_col else []) + [
        F.col(group_col),
        v.alias(value_col),
        lo.alias("lo"),
        hi.alias("hi"),
        F.when(F.col(value_col).isNull(), F.lit(False))
        .otherwise((v < lo) | (v > hi))
        .alias("is_outlier"),
    ]
    return df.join(fences, df[group_col] == fences["_g"]).select(*out_cols)


def fk_orphans(
    child: DataFrame, parent: DataFrame, fk: str, pk: str
) -> DataFrame:
    """Child rows whose foreign key has no parent — ONE LeftAnti join
    against the distinct parent-key projection (broadcast when the parent
    is a dimension; Spark never materializes the full parent row set)."""
    keys = parent.select(F.col(pk).alias(fk)).distinct()
    return child.join(keys, fk, "left_anti")


def dq_summary(rules: dict[str, DataFrame]) -> DataFrame:
    """Data-quality gate: each rule maps to a DataFrame of VIOLATING rows
    (fk_orphans output, a null/range filter, …); returns one (rule,
    n_violations) row per rule, computed as one unioned plan — Spark
    runs every count in a single job, sharing scans where plans overlap.
    The pipeline contract a 100-TB ingest runs before promoting a batch:
    violations > 0 on a blocking rule fails the batch, the violating-row
    frames themselves are the debug artifact."""
    if not rules:
        raise ValueError("no rules given")
    parts = [
        df.agg(F.count(F.lit(1)).cast("long").alias("n_violations")).select(
            F.lit(name).alias("rule"), "n_violations"
        )
        for name, df in sorted(rules.items())
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def value_histogram(
    df: DataFrame,
    value_col: str,
    n_bins: int = 10,
    group_col: str | None = None,
) -> DataFrame:
    """Equi-width histogram of a numeric column (optionally per group,
    with GLOBAL bin edges so groups are comparable): bin = clamp(floor(
    (x - min) / width), 0, n_bins-1), width = (max - min)/n_bins. The
    1-row global min/max aggregate broadcasts back (literal cross join of
    a single row); binning itself is map-side arithmetic, then one hash
    aggregate on (group, bin). NULLs are excluded; a constant column
    (max == min) lands everything in bin 0. Bin edges round-6 for the
    cross-engine record; bin MEMBERSHIP uses the raw IEEE arithmetic,
    which both engines evaluate identically (same double ops)."""
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    x = F.col(value_col)
    bounds = df.filter(x.isNotNull()).agg(
        F.min(x).cast("double").alias("_lo"), F.max(x).cast("double").alias("_hi")
    )
    width = (F.col("_hi") - F.col("_lo")) / F.lit(n_bins)
    binned = (
        df.filter(x.isNotNull())
        .crossJoin(F.broadcast(bounds))
        .withColumn(
            "bin",
            F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(
                F.least(
                    F.floor((x - F.col("_lo")) / width), F.lit(n_bins - 1)
                )
            ).cast("long"),
        )
    )
    keys = ([group_col] if group_col else []) + ["bin"]
    return binned.groupBy(*keys).agg(
        F.round(F.min(F.col("_lo") + F.col("bin") * width), 6).alias("bin_lo"),
        F.round(F.min(F.col("_lo") + (F.col("bin") + 1) * width), 6).alias("bin_hi"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_col: str,
    k: float = 3.0,
    id_col: str | None = None,
) -> DataFrame:
    """Median-absolute-deviation outlier flags per group — the robust
    sibling of iqr_outliers (MAD tolerates up to 50% contamination where
    the IQR fence breaks down at 25%): flag |x - median| > k·MAD, with
    median and MAD from exact interpolated percentiles (≡ DuckDB
    quantile_cont), every compared quantity round-6 so the decision
    replays on any engine. NULLs are never outliers. A constant group has
    MAD 0 — every deviating value flags, which is the correct reading.

    Two group-cardinality aggregates (median, then median of deviations)
    and two broadcast-friendly joins back on the group key."""
    med = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.round(F.expr(f"percentile({value_col}, 0.5)"), 6).alias("_med")
    )
    dev = F.round(F.abs(F.round(F.col(value_col), 6) - F.col("_med")), 6)
    with_dev = df.join(med, df[group_col] == med["_g"]).withColumn("_dev", dev)
    mad = with_dev.groupBy(F.col("_g").alias("_g2")).agg(
        F.round(F.expr("percentile(_dev, 0.5)"), 6).alias("_mad")
    )
    out = with_dev.join(mad, with_dev["_g"] == mad["_g2"])
    thr = F.round(F.lit(k) * F.col("_mad"), 6)
    cols = ([F.col(id_col)] if id_col else []) + [
        F.col(group_col),
        F.round(F.col(value_col), 6).alias(value_col),
        F.col("_med").alias("median"),
        F.col("_mad").alias("mad"),
        F.when(F.col(value_col).isNull(), F.lit(False))
        .otherwise(F.col("_dev") > thr)
        .alias("is_outlier"),
    ]
    return out.select(*cols)


def equi_depth_histogram(
    df: DataFrame,
    value_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Equi-DEPTH histogram: bin boundaries are exact interpolated
    percentiles (the quantile sketch every optimizer keeps for
    selectivity estimation — this is the exact small-SF contract;
    approx_percentile is the documented 100-TB swap-in, same shape).
    Returns (bin, lo, hi, n): bin b covers (q_b, q_{b+1}] with values
    assigned by comparison against the round-6 boundaries — NOT by a
    global-sort ntile, so there is no single-reducer total order; counts
    can deviate from n/bins exactly where ties straddle a boundary,
    which is the honest equi-depth answer. NULLs excluded.

    One group-cardinality percentile aggregate (n_bins-1 scalars)
    broadcast back; binning is a map-side comparison fold."""
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    x = F.round(F.col(value_col), 6)
    qs = [
        F.round(F.expr(f"percentile({value_col}, {i / n_bins})"), 6).alias(f"_q{i}")
        for i in range(n_bins + 1)
    ]
    bounds = df.filter(F.col(value_col).isNotNull()).agg(*qs)
    inner = F.array(*[F.col(f"_q{i}") for i in range(1, n_bins)])
    binned = (
        df.filter(F.col(value_col).isNotNull())
        .crossJoin(F.broadcast(bounds))
        .withColumn("bin", F.size(F.filter(inner, lambda b: x > b)).cast("long"))
    )
    return binned.groupBy("bin").agg(
        F.min(x).alias("lo"),
        F.max(x).alias("hi"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


def key_skew(
    df: DataFrame,
    key_col: str,
    top_n: int = 10,
) -> DataFrame:
    """ONE-row join-key skew diagnostic: (n_rows, n_keys, max_key_rows,
    top_key, topn_fraction, p_max, gini) — the numbers that decide the
    salting question BEFORE a 100-TB shuffle burns a day (config.py's
    accumulate_n_salts auto-switch thresholds are corpus-size proxies;
    this measures the actual key distribution). p_max = heaviest key's
    share of all rows (the straggler reducer's load factor); topn_fraction
    = share held by the top `top_n` keys; gini ∈ [0, 1) is the standard
    Lorenz-curve concentration of rows over keys (0 = uniform — safe to
    shuffle raw; → 1 = one hot key owns the table — salt or broadcast).

    Exact integers until three final divisions: per-key counts (ONE hash
    aggregate, the only data-scale shuffle), then the Lorenz sum
    Σ rank·count runs over the KEY table (cardinality-scale) with a
    rank window ordered (count, key) — deterministic ties. gini =
    (2·Σ rank·c − (n+1)·Σc) / (n·Σc), computed from exact longs.
    top_key is the (max rows, min key) election, replayable."""
    from pyspark.sql import Window

    counts = df.groupBy(F.col(key_col).alias("_k")).agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    ranked = counts.withColumn(
        "_r", F.row_number().over(Window.orderBy(F.col("_c").asc(), F.col("_k").asc()))
    ).withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy()))
    agg = ranked.agg(
        F.sum("_c").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("_c").cast("long").alias("max_key_rows"),
        F.min(
            F.struct((-F.col("_c")).alias("nc"), F.col("_k").cast("string").alias("k"))
        ).alias("_top"),
        F.sum(F.col("_r") * F.col("_c")).cast("long").alias("_lorenz"),
        F.sum(
            F.when(F.col("_r") > F.col("_n") - top_n, F.col("_c")).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("_topn"),
    ).withColumn("top_key", F.col("_top.k"))
    return agg.select(
        "n_rows",
        "n_keys",
        "max_key_rows",
        "top_key",
        F.round(F.col("_topn") / F.col("n_rows"), 6).alias("topn_fraction"),
        F.round(F.col("max_key_rows") / F.col("n_rows"), 6).alias("p_max"),
        F.round(
            (
                F.lit(2.0) * F.col("_lorenz").cast("double")
                - (F.col("n_keys") + 1).cast("double") * F.col("n_rows").cast("double")
            )
            / (F.col("n_keys").cast("double") * F.col("n_rows").cast("double")),
            6,
        ).alias("gini"),
    )


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    n_bins: int = 10,
    lo: float | None = None,
    hi: float | None = None,
    scale: int = 1_000_000,
) -> DataFrame:
    """Population Stability Index between a reference and a current
    distribution of `value_col` — the standard drift gate a recurring
    corpus/feature pipeline runs between builds (PSI < 0.1 stable, 0.1-0.25
    watch, > 0.25 investigate): psi = Σ (pᵢ − qᵢ)·ln(pᵢ/qᵢ) over shared
    equi-width bins. Complements CUSUM (level shifts over TIME) and the
    histogram family (shape of ONE build) by scoring the SHAPE DELTA
    between two builds in one number.

    Bin edges come from the REFERENCE side's min/max (1-row broadcast, the
    value_histogram trick) unless (lo, hi) pin them explicitly —
    pin them in production so the gate is stable under current-side
    outliers. Laplace-smoothed counts ((c+1)/(n+bins)) keep empty bins
    finite, exactly as credit-scoring PSI does. Float discipline: bin
    fractions are exact integer ratios; each bin's term quantizes to a
    fixed-point long at 1e-6 (the adamic_adar log precedent), the sum is
    exact, ONE division back at the end. Returns one row: (n_ref, n_cur,
    n_bins, psi)."""
    if n_bins < 2:
        raise ValueError("need n_bins >= 2")
    v = F.col(value_col).cast("double")
    if lo is None or hi is None:
        b = ref.agg(F.min(v).alias("_lo"), F.max(v).alias("_hi")).first()
        if b is None or b["_lo"] is None:
            raise ValueError("empty reference frame")
        lo = float(b["_lo"]) if lo is None else lo
        hi = float(b["_hi"]) if hi is None else hi
    if not hi > lo:
        raise ValueError("need hi > lo")
    width = (hi - lo) / n_bins

    def binned(df):
        # clamp into [0, n_bins-1]: everything past the reference range
        # piles into the edge bins (the standard PSI convention)
        raw = F.floor((v - F.lit(lo)) / F.lit(width)).cast("long")
        return df.filter(v.isNotNull()).select(
            F.greatest(F.lit(0), F.least(F.lit(n_bins - 1), raw)).alias("_bin")
        )

    rc = binned(ref).groupBy("_bin").agg(F.count(F.lit(1)).cast("long").alias("_rc"))
    cc = binned(cur).groupBy("_bin").agg(F.count(F.lit(1)).cast("long").alias("_cc"))
    bins = rc.sparkSession.range(0, n_bins).select(F.col("id").alias("_bin"))
    joined = (
        bins.join(rc, "_bin", "left")
        .join(cc, "_bin", "left")
        .select(
            "_bin",
            F.coalesce("_rc", F.lit(0)).alias("_rc"),
            F.coalesce("_cc", F.lit(0)).alias("_cc"),
        )
    )
    tot = joined.agg(
        F.sum("_rc").cast("long").alias("n_ref"), F.sum("_cc").cast("long").alias("n_cur")
    )
    terms = joined.crossJoin(F.broadcast(tot)).select(
        "n_ref",
        "n_cur",
        F.round(
            (
                (F.col("_rc") + 1) / (F.col("n_ref") + n_bins)
                - (F.col("_cc") + 1) / (F.col("n_cur") + n_bins)
            )
            * F.log(
                ((F.col("_rc") + 1) / (F.col("n_ref") + n_bins))
                / ((F.col("_cc") + 1) / (F.col("n_cur") + n_bins))
            )
            * F.lit(float(scale))
        )
        .cast("long")
        .alias("_t"),
    )
    return terms.groupBy("n_ref", "n_cur").agg(
        F.lit(n_bins).cast("long").alias("n_bins"),
        F.round(F.sum("_t") / F.lit(float(scale)), 6).alias("psi"),
    )


def fd_violations(
    df: DataFrame,
    lhs: str,
    rhs: str,
) -> DataFrame:
    """Functional-dependency check lhs → rhs: ONE row (n_lhs_values,
    n_violating, violation_rate, holds) — does the left column DETERMINE
    the right one (violating value = an lhs value mapping to ≥2 distinct
    rhs values)? The relational cousin of predicate_profile's
    is_functional: run it before declaring a join key, a dedup key, or a
    dimension natural key; a nonzero rate on a column pair the schema
    claims is 1:1 is an upstream-corruption alarm. NULL rhs counts as a
    value (a key mapping to both NULL and 'x' IS a violation). One
    two-column aggregate + one bounded aggregate; exact integers, one
    division."""
    per = df.groupBy(F.col(lhs).alias("_l")).agg(
        F.size(F.collect_set(F.struct(F.col(rhs).alias("v")))).alias("_n")
    )
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_lhs_values"),
        F.sum((F.col("_n") > 1).cast("long")).cast("long").alias("n_violating"),
    ).select(
        "n_lhs_values",
        "n_violating",
        F.round(F.col("n_violating") / F.col("n_lhs_values"), 6).alias("violation_rate"),
        (F.col("n_violating") == 0).alias("holds"),
    )


def join_plan_stats(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    broadcast_threshold_rows: int = 10_000_000,
    target_partition_rows: int = 5_000_000,
) -> DataFrame:
    """ONE-row shuffle-join PLANNER: exact join output cardinality + skew
    profile computed from the two sides' per-key histograms — the join is
    never materialized. |A ⋈ B| = Σ_k n_A(k)·n_B(k), so the planner costs
    two count aggregates (each side shuffles ONCE on the very key the real
    join would shuffle on, but carrying 8-byte counts instead of payload
    rows) plus a key-cardinality-scale histogram join. At 100 TB this is
    the cheap dry-run that decides: broadcast the small side? salt the hot
    key? abort the accidental many-to-many explosion before it runs?

    Output (exact longs until the two final round-6 divisions):
      out_rows        exact |A ⋈ B|
      left_rows/right_rows/matching_keys
      max_key_out     heaviest key's output (the straggler reducer's load)
      top_key         that key — (max product, min key) election, replayable
      p_max_out       max_key_out / out_rows
      amplification   out_rows / (left_rows + right_rows) — >1 flags fan-out
      broadcast_ok    right_rows ≤ broadcast_threshold_rows
      recommended_salts  ⌈max_key_out / target_partition_rows⌉ (≥1), the
                         salt factor accumulate_triples_salted would need
    Pairs `key_skew` (single-table concentration) the way EXPLAIN pairs a
    query: measure, then pick the physical strategy."""
    lc = left.groupBy(F.col(left_key).alias("_k")).agg(
        F.count(F.lit(1)).cast("long").alias("_nl")
    )
    rc = right.groupBy(F.col(right_key).alias("_k")).agg(
        F.count(F.lit(1)).cast("long").alias("_nr")
    )
    per = lc.join(rc, "_k").select(
        F.col("_k").cast("string").alias("_k"),
        (F.col("_nl") * F.col("_nr")).cast("long").alias("_out"),
    )
    lt = lc.agg(F.sum("_nl").cast("long").alias("left_rows"))
    rt = rc.agg(F.sum("_nr").cast("long").alias("right_rows"))
    pa = per.agg(
        F.coalesce(F.sum("_out"), F.lit(0)).cast("long").alias("out_rows"),
        F.count(F.lit(1)).cast("long").alias("matching_keys"),
        F.coalesce(F.max("_out"), F.lit(0)).cast("long").alias("max_key_out"),
        F.min(F.struct((-F.col("_out")).alias("no"), F.col("_k").alias("k"))).alias(
            "_top"
        ),
    )
    row = pa.crossJoin(F.broadcast(lt)).crossJoin(F.broadcast(rt))
    return row.select(
        "out_rows",
        "left_rows",
        "right_rows",
        "matching_keys",
        "max_key_out",
        F.col("_top.k").alias("top_key"),
        F.when(
            F.col("out_rows") > 0,
            F.round(F.col("max_key_out").cast("double") / F.col("out_rows"), 6),
        ).alias("p_max_out"),
        F.round(
            F.col("out_rows").cast("double")
            / (F.col("left_rows") + F.col("right_rows")),
            6,
        ).alias("amplification"),
        (F.col("right_rows") <= F.lit(broadcast_threshold_rows)).alias("broadcast_ok"),
        F.greatest(
            F.lit(1).cast("long"),
            F.expr(
                f"(max_key_out + {target_partition_rows - 1}) div {target_partition_rows}"
            ).cast("long"),
        ).alias("recommended_salts"),
    )


def benford_first_digit_micro() -> list[int]:
    """Expected Benford first-digit shares log10(1 + 1/d), d = 1..9, as
    exact micro-int literals. Computed DRIVER-side with Python's log10 and
    interpolated into plans/oracles as literals — no engine evaluates a
    log (the ndcg_discount_micro recipe)."""
    import math

    return [int(round(math.log10(1.0 + 1.0 / d) * 1_000_000)) for d in range(1, 10)]


def benford_audit(df: DataFrame, amount_col: str) -> DataFrame:
    """Benford's-law first-digit audit over a positive monetary column —
    the classic fabricated-data / broken-ETL detector: synthetic or
    truncated amounts drift from the log-uniform first-digit law long
    before summary stats move.

    First digit is taken from the INTEGER cent representation
    (floor(x·100 + 0.5) → string), never from float formatting, so the
    digit is engine-portable. observed share = 1e6·n ÷ N (one integer
    division); expected = benford_first_digit_micro literals; dev_micro =
    |observed − expected|.

    Scale: one partial+final count aggregate on a 9-value key; the window
    total runs over 9 rows."""
    from pyspark.sql import Window

    w = Window.partitionBy(F.lit(1))
    exp_map = F.create_map(
        *[
            x
            for d, m in zip(range(1, 10), benford_first_digit_micro())
            for x in (F.lit(str(d)), F.lit(m))
        ]
    )
    digits = df.select(
        F.substring(
            F.floor(F.col(amount_col) * 100 + F.lit(0.5)).cast("long").cast("string"),
            1,
            1,
        ).alias("digit")
    ).filter(F.col("digit").between("1", "9"))
    return (
        digits.groupBy("digit")
        .agg(F.count("*").cast("long").alias("n"))
        .withColumn("_total", F.sum("n").over(w))
        .select(
            "digit",
            "n",
            F.expr("1000000 * n div _total").alias("share_micro"),
            exp_map[F.col("digit")].cast("long").alias("benford_micro"),
            F.abs(
                F.expr("1000000 * n div _total") - exp_map[F.col("digit")]
            ).cast("long").alias("dev_micro"),
        )
    )


def two_pass_median(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
    scale: int = 100,
    n_buckets: int = 1024,
) -> DataFrame:
    """Exact LOWER median per group WITHOUT a global sort — the 100-TB
    median path: pass 1 buckets the quantized values into n_buckets
    equal-width cells ((qv−min)·B // (max−min+1), exact integer
    arithmetic) and walks the tiny per-group cumulative histogram to
    the cell holding ordered position ⌈n/2⌉; pass 2 ranks ONLY inside
    that cell (≈ n/B rows) and picks the exact element. Returns
    (group?, n, median) with median = the grid element / scale (one
    division, round 6) — bit-identical to a full-sort lower median.

    group_percentiles is the one-aggregate exact form for data that
    fits a percentile buffer; this is the two-scan form whose largest
    sort is a 1/B-sized partition — the classic trade on corpora where
    neither a global window nor percentile_approx's error is
    acceptable.

    Scale: two scans, two hash aggregates, one window over the ≤B-row
    per-group histogram, one window over the single surviving cell's
    rows."""
    from pyspark.sql import Window

    keys = [group_col] if group_col else []
    q = df.filter(F.col(value_col).isNotNull()).select(
        *keys, F.round(F.col(value_col) * scale, 0).cast("long").alias("qv")
    )
    ext = q.groupBy(*keys).agg(
        F.min("qv").alias("_lo"),
        F.max("qv").alias("_hi"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    qb = (q.join(F.broadcast(ext), keys) if keys else q.crossJoin(F.broadcast(ext))).select(
        *keys,
        "qv",
        ((F.col("qv") - F.col("_lo")) * n_buckets
         / (F.col("_hi") - F.col("_lo") + 1)).cast("long").alias("b"),
    )
    hist = qb.groupBy(*keys, "b").agg(F.count(F.lit(1)).cast("long").alias("c"))
    wcum = Window.partitionBy(*keys).orderBy("b").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = hist.select(
        *keys, "b", (F.sum("c").over(wcum) - F.col("c")).alias("before"),
        (F.sum("c").over(wcum)).alias("through"),
    )
    tgt = (cum.join(ext, keys) if keys else cum.crossJoin(ext)).filter(
        (F.floor((F.col("n") + 1) / 2) > F.col("before"))
        & (F.floor((F.col("n") + 1) / 2) <= F.col("through"))
    ).select(*keys, "b", "before", "n")
    inb = qb.join(F.broadcast(tgt), [*keys, "b"])
    wr = Window.partitionBy(*keys).orderBy("qv")
    return (
        inb.withColumn("_r", F.row_number().over(wr))
        .filter(
            F.col("_r")
            == F.floor((F.col("n") + 1) / 2).cast("long") - F.col("before")
        )
        .select(
            *keys, "n",
            F.round(F.col("qv").cast("double") / F.lit(float(scale)), 6)
            .alias("median"),
        )
    )


def inclusion_dependencies(
    columns: list[tuple[str, DataFrame]],
) -> DataFrame:
    """Inclusion-dependency (FK-candidate) profile over named columns:
    for every ordered pair (a, b), how much of a's DISTINCT value set
    lies inside b's — (col_a, col_b, n_a, n_inter, containment,
    is_ind). containment = n_inter/n_a is ONE exact-integer division;
    is_ind (containment = 1) is the classic Binder/Spider "a references
    b" signal that discovers join keys in an unlabeled lake — the
    discovery complement to fk_orphans (which CHECKS a declared FK).

    Each input is (name, single-column DataFrame); values compare as
    strings so heterogeneous lakes profile uniformly (cast upstream
    when 1 vs '1' must differ).

    Scale: one distinct per column (shuffles only the distinct value
    sets), then ONE self-join keyed on the value — a value shared by k
    columns contributes k² rows where k ≤ |columns|, so skew is bounded
    by the column count, never by row counts."""
    tagged = None
    for name, cdf in columns:
        col = cdf.columns[0]
        part = cdf.filter(F.col(col).isNotNull()).select(
            F.lit(name).alias("cname"), F.col(col).cast("string").alias("v")
        ).distinct()
        tagged = part if tagged is None else tagged.unionByName(part)
    totals = tagged.groupBy("cname").agg(F.count(F.lit(1)).cast("long").alias("n_a"))
    a = tagged.select(F.col("cname").alias("col_a"), "v")
    b = tagged.select(F.col("cname").alias("col_b"), "v")
    inter = (
        a.join(b, "v")
        .filter(F.col("col_a") != F.col("col_b"))
        .groupBy("col_a", "col_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
    )
    return inter.join(
        F.broadcast(totals.select(F.col("cname").alias("col_a"), "n_a")), "col_a"
    ).select(
        "col_a",
        "col_b",
        "n_a",
        "n_inter",
        F.round(F.col("n_inter").cast("double") / F.col("n_a").cast("double"), 6)
        .alias("containment"),
        (F.col("n_inter") == F.col("n_a")).alias("is_ind"),
    )


def herfindahl_index(df: DataFrame, key_col: str) -> DataFrame:
    """Herfindahl-Hirschman concentration of a categorical mix — the
    antitrust-style "how monopolized is this corpus's source mix" gate
    (the squared-share companion to the Gini): one row (n_keys, n_rows,
    hhi, hhi_normalized, effective_n). HHI = Σ(n_k/N)² = Σn_k²/N²
    (exact wide integers, ONE division); effective_n = 1/HHI is the
    equivalent count of equal-weight sources; hhi_normalized rescales
    to [0,1] over k keys (NULL for k = 1).

    One key aggregate with partials, then |keys| rows fold to one.
    """
    base = df.filter(F.col(key_col).isNotNull()).select(F.col(key_col).alias("k"))
    per_k = base.groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("n_k"))
    dec = "decimal(38,0)"
    agg = per_k.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("n_k").cast("long").alias("n_rows"),
        F.sum(F.col("n_k").cast(dec) * F.col("n_k").cast(dec)).alias("s2"),
    )
    nd = F.col("n_rows").cast("double")
    kd = F.col("n_keys").cast("double")
    hhi = F.col("s2").cast("double") / (nd * nd)
    return agg.select(
        "n_keys",
        "n_rows",
        F.when(F.col("n_rows") > 0, F.round(hhi, 6)).alias("hhi"),
        F.when(
            (F.col("n_rows") > 0) & (F.col("n_keys") > 1),
            F.round((hhi - 1 / kd) / (1 - 1 / kd), 6),
        ).alias("hhi_normalized"),
        F.when(F.col("n_rows") > 0, F.round(F.lit(1.0) / hhi, 6)).alias(
            "effective_n"
        ),
    )


def otsu_threshold(
    df: DataFrame,
    value_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Otsu adaptive threshold over a score distribution — the
    assumption-free "where should the similarity / quality cutoff
    go" chooser: one row (n, k_values, threshold, between_var,
    w0, mean0, mean1). Picks the grid value t maximizing the
    between-class variance w₀w₁(μ₀−μ₁)² of the ≤t / >t split —
    exactly the 2-class k-means objective, solved in ONE pass over
    the distinct value grid instead of Lloyd iterations. Feed it a
    cosine-similarity or classifier-score column before hard-coding
    a 0.5.

    Engine-exact: per-value counts and the prefix (count, sum) pairs
    are exact integers; each candidate's objective numerator
    (cum_s·N − cum_n·S)² / (cum_n·(N−cum_n)) is ONE fixed double
    expression; the argmax compares identical doubles in both
    engines with a smallest-threshold tie-break. Grid-sized window,
    single fold.
    """
    q = df.filter(F.col(value_col).isNotNull()).select(
        F.round(F.col(value_col) * F.lit(scale)).cast("long").alias("qv")
    )
    cells = q.groupBy("qv").agg(F.count(F.lit(1)).cast("long").alias("c"))
    w = Window.orderBy("qv").rowsBetween(Window.unboundedPreceding, 0)
    tot = cells.agg(
        F.sum("c").cast("long").alias("nn"),
        F.sum(F.col("qv").cast(_DEC) * F.col("c").cast(_DEC)).alias("ss"),
        F.count(F.lit(1)).cast("long").alias("k_values"),
    )
    cum = cells.select(
        "qv",
        F.sum("c").over(w).cast("long").alias("cn"),
        F.sum(F.col("qv").cast(_DEC) * F.col("c").cast(_DEC)).over(w).alias("cs"),
    ).crossJoin(F.broadcast(tot))
    valid = cum.filter((F.col("cn") > 0) & (F.col("cn") < F.col("nn")))
    num = (
        F.col("cs").cast("double") * F.col("nn").cast("double")
        - F.col("cn").cast("double") * F.col("ss").cast("double")
    )
    obj = num * num / (
        F.col("cn").cast("double")
        * (F.col("nn") - F.col("cn")).cast("double")
    )
    staged = valid.select(
        "qv", "cn", "cs", "nn", "ss", "k_values", obj.alias("obj")
    )
    wall = Window.partitionBy(F.lit(1))
    best = (
        staged.withColumn("omax", F.max("obj").over(wall))
        .filter(F.col("obj") == F.col("omax"))
        .groupBy("omax")
        .agg(
            F.min("qv").cast("long").alias("t_q"),
            F.min_by("cn", "qv").cast("long").alias("cn"),
            F.min_by("cs", "qv").alias("cs"),
            F.max("nn").cast("long").alias("nn"),
            F.max("ss").alias("ss"),
            F.max("k_values").cast("long").alias("k_values"),
        )
    )
    sc = F.lit(float(scale))
    nnd = F.col("nn").cast("double")
    cnd = F.col("cn").cast("double")
    m0 = F.col("cs").cast("double") / (cnd * sc)
    m1 = (F.col("ss") - F.col("cs")).cast("double") / ((nnd - cnd) * sc)
    return best.select(
        F.col("nn").alias("n"),
        "k_values",
        F.round(F.col("t_q").cast("double") / sc, 6).alias("threshold"),
        F.round(
            F.col("omax")
            / (nnd * nnd * sc * sc),
            6,
        ).alias("between_var"),
        F.round(cnd / nnd, 6).alias("w0"),
        F.round(m0, 6).alias("mean0"),
        F.round(m1, 6).alias("mean1"),
    )
