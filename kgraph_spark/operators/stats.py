"""Statistical QA gates: correlation, two-sample drift tests, grouped
trend fits, and contingency independence — the numeric acceptance layer
a curation pipeline puts between "computed a feature" and "trusted it".

Reference parity: the reference validates distributions informally in
its eval notebooks (kgraph/eval/stats.py is the closest analogue); these
operators restate that intent as engine-exact, oracle-checkable gates.

Cross-engine float discipline (the repo-wide recipe):
- inputs quantize to an integer grid (caller-chosen scale) — the grid is
  part of the operator contract, not a fudge;
- every moment (Σx, Σx², Σxy) accumulates as EXACT wide-integer sums
  (Spark decimal(38,0) ≡ DuckDB HUGEINT), so partition order can never
  wobble a result;
- the floating combination happens once, on final scalars, with sqrt
  (correctly rounded per IEEE-754 in both engines) and a round-6 finish.

Scale notes (the 100-TB reading): moment aggregates are single hash
aggregations with map-side partials — no sort, no window, no collect.
The two-sample tests (KS, Mann-Whitney) rank over the DISTINCT value
grid, not raw rows: values are quantized to a bounded grid first, so the
global ordered window runs over |grid| rows (≤ scale·range), not |data|
rows. For genuinely unbounded grids, pre-bucket with
profiling.equi_depth_histogram or reuse the two-phase distributed prefix
sum (dedup_text.sorted_neighborhood_pairs) — documented, not silently
assumed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "pearson_corr",
    "spearman_corr",
    "ks_2sample",
    "mann_whitney_u",
    "ols_trend",
    "chi2_independence",
    "anova_f",
    "prop_ztest",
    "cohens_d",
    "gini_coefficient",
    "kendall_tau",
    "theil_sen_slope",
    "runs_test",
    "welch_t",
    "brown_forsythe",
    "mann_kendall",
    "kruskal_wallis",
    "cochran_armitage",
    "poisson_rate_test",
    "mcnemar",
    "jensen_shannon",
    "friedman",
    "jonckheere_terpstra",
    "capture_recapture",
    "cochran_q",
    "bowker_symmetry",
    "mood_median",
    "fleiss_kappa",
    "hellinger_distance",
    "cliffs_delta",
    "cohen_kappa",
    "ordinal_concordance",
    "anderson_darling_2s",
    "dunn_posthoc",
    "page_trend",
    "two_by_two",
    "grubbs_test",
    "kendall_w",
    "mood_scale_test",
    "hill_tail_index",
    "krippendorff_alpha",
    "trimmed_mean",
    "sign_test",
    "wilcoxon_signed_rank",
    "jarque_bera",
    "cmh_test",
    "durbin_watson",
    "breusch_pagan",
    "chow_test",
    "theil_u",
    "cronbach_alpha",
    "icc_oneway",
    "quade",
    "kuiper_2sample",
    "bartlett",
    "tost_equivalence",
    "yuen_t",
    "weighted_kappa",
    "diff_in_diff",
    "fisher_corr_ci",
    "cochran_c",
    "min_detectable_effect",
    "lorenz_curve",
]

_DEC = "decimal(38,0)"


def _quant(col: Column, scale: int) -> Column:
    """Quantize to the integer grid: round(x·scale) as long."""
    return F.round(col * F.lit(scale), 0).cast("long")


def _moment_aggs() -> list[Column]:
    """Exact wide-integer moment sums over pre-quantized (qx, qy)."""
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    return [
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("qx").cast(_DEC)).alias("sx"),
        F.sum(F.col("qy").cast(_DEC)).alias("sy"),
        F.sum(d19("qx") * d19("qx")).alias("sxx"),
        F.sum(d19("qy") * d19("qy")).alias("syy"),
        F.sum(d19("qx") * d19("qy")).alias("sxy"),
    ]


def _corr_from_moments() -> Column:
    """r = (n·Σxy − ΣxΣy) / (√(n·Σx²−(Σx)²)·√(n·Σy²−(Σy)²)), round 6.

    Numerator/denominators combine IN DECIMAL (exact), cast to double
    once; sqrt is correctly rounded in every IEEE engine, so the final
    expression is a fixed op sequence both engines replay identically.
    """
    nd = F.col("n").cast(_DEC)
    num = (nd * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = (nd * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    dy = (nd * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return F.when(
        (dx > 0) & (dy > 0), F.round(num / (F.sqrt(dx) * F.sqrt(dy)), 6)
    ).alias("corr")


def pearson_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_col: str | None = None,
    x_scale: int = 1,
    y_scale: int = 1,
) -> DataFrame:
    """Pearson correlation of two numeric columns, optionally per group:
    (group?, n, corr). NULL in either column drops the row (pairwise
    complete); a constant column yields NULL corr (undefined, not 0).

    ONE hash aggregation (map-side partials) — rows never sort or pair.
    At 100 TB this is the cheapest shape a correlation can take: 6 sums
    and a count on the group key (or a single global reduce).
    """
    for c in (x_col, y_col):
        if c not in df.columns:
            raise ValueError(f"unknown column {c!r}")
    q = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull()).select(
        *([F.col(group_col)] if group_col else []),
        _quant(F.col(x_col), x_scale).alias("qx"),
        _quant(F.col(y_col), y_scale).alias("qy"),
    )
    keys = [group_col] if group_col else []
    m = q.groupBy(*keys).agg(*_moment_aggs())
    return m.select(*keys, F.col("n"), _corr_from_moments())


def spearman_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    x_scale: int = 1,
    y_scale: int = 1,
) -> DataFrame:
    """Spearman rank correlation: Pearson over average ranks, with ties
    given the conventional midrank. Midranks are half-integers, so they
    ride as DOUBLED integer ranks (2·rank_min + tiecount − 1) and stay
    exact — the corr is scale-invariant, so the doubling cancels.

    Two rank windows over the global value order (bounded by the
    quantized grid — see module docstring) + the same single moment
    aggregation as pearson_corr.
    """
    q = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull()).select(
        _quant(F.col(x_col), x_scale).alias("vx"),
        _quant(F.col(y_col), y_scale).alias("vy"),
    )

    def midranks(col: str) -> DataFrame:
        """Distinct-value grid → doubled midrank (2·below + t + 1)."""
        per_v = q.groupBy(col).agg(F.count(F.lit(1)).cast("long").alias("t"))
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
        return per_v.select(
            col,
            (2 * (F.sum("t").over(w) - F.col("t")) + F.col("t") + 1)
            .cast("long")
            .alias(f"r2{col}"),
        )

    ranked = (
        q.join(midranks("vx"), "vx")
        .join(midranks("vy"), "vy")
        .select(F.col("r2vx").alias("qx"), F.col("r2vy").alias("qy"))
    )
    m = ranked.agg(*_moment_aggs())
    return m.select(F.col("n"), _corr_from_moments().alias("spearman"))


def ks_2sample(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance — the distribution-drift
    gate that needs no binning choice (complement to profiling.psi_drift,
    which needs reference bins): one row
    (n_a, n_b, ks_d, at_value) where ks_d = max |F̂_a(v) − F̂_b(v)| and
    at_value is the grid value achieving it (smallest on ties).

    Exact until the last step: D's numerator is the integer
    max |cum_a·n_b − cum_b·n_a|; ONE division by n_a·n_b finishes it.
    Plan: two per-value hash aggregates, a full-outer merge on the grid,
    one ordered window over the DISTINCT grid (not the rows), one max.
    """
    qa = df_a.filter(F.col(value_col).isNotNull()).select(
        _quant(F.col(value_col), scale).alias("qv")
    )
    qb = df_b.filter(F.col(value_col).isNotNull()).select(
        _quant(F.col(value_col), scale).alias("qv")
    )
    ca = qa.groupBy("qv").agg(F.count(F.lit(1)).cast("long").alias("ca"))
    cb = qb.groupBy("qv").agg(F.count(F.lit(1)).cast("long").alias("cb"))
    merged = (
        ca.join(cb, "qv", "full_outer")
        .select(
            "qv",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    w = Window.orderBy("qv").rowsBetween(Window.unboundedPreceding, 0)
    cum = merged.select(
        "qv",
        F.sum("ca").over(w).cast("long").alias("cum_a"),
        F.sum("cb").over(w).cast("long").alias("cum_b"),
    )
    totals = merged.agg(
        F.sum("ca").cast("long").alias("n_a"), F.sum("cb").cast("long").alias("n_b")
    )
    diff = cum.crossJoin(F.broadcast(totals)).select(
        "n_a",
        "n_b",
        F.abs(F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")).alias(
            "d_num"
        ),
        F.col("qv"),
    )
    # argmax with smallest-value tie-break: max of (d_num, -qv) struct
    best = diff.groupBy("n_a", "n_b").agg(
        F.max(F.struct(F.col("d_num"), (-F.col("qv")).alias("nv"))).alias("m")
    )
    return best.select(
        "n_a",
        "n_b",
        F.round(
            F.col("m.d_num").cast("double")
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
            6,
        ).alias("ks_d"),
        F.round((-F.col("m.nv")).cast("double") / F.lit(scale).cast("double"), 6).alias(
            "at_value"
        ),
    )


def mann_whitney_u(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) — the nonparametric "did this
    filter shift the distribution" gate: one row
    (n_a, n_b, u_a, u_b, auc, z). u_a counts (a>b) pairs with half credit
    for ties; auc = u_a/(n_a·n_b) is the common-language effect size
    (P(a > b) + ½P(a = b)); z is the tie-corrected normal approximation.

    Midranks ride doubled (integers, exact — same trick as
    spearman_corr); rank sums accumulate as wide integers; the z
    combination is a fixed double-op sequence with one sqrt.
    Ranks are assigned on the DISTINCT value grid and joined back, so
    the ordered window is grid-sized, not data-sized.
    """
    qa = df_a.filter(F.col(value_col).isNotNull()).select(
        _quant(F.col(value_col), scale).alias("qv"), F.lit(1).alias("is_a")
    )
    qb = df_b.filter(F.col(value_col).isNotNull()).select(
        _quant(F.col(value_col), scale).alias("qv"), F.lit(0).alias("is_a")
    )
    pooled = qa.unionByName(qb)
    per_v = pooled.groupBy("qv").agg(
        F.count(F.lit(1)).cast("long").alias("t"),
        F.sum("is_a").cast("long").alias("t_a"),
    )
    w = Window.orderBy("qv")
    # doubled midrank of a value = 2·(rows before it) + t + 1
    ranked = per_v.select(
        "qv",
        "t",
        "t_a",
        (
            2 * (F.sum("t").over(w.rowsBetween(Window.unboundedPreceding, 0)) - F.col("t"))
            + F.col("t")
            + 1
        ).cast("long").alias("r2"),
    )
    agg = ranked.agg(
        F.sum("t_a").cast("long").alias("n_a"),
        (F.sum("t") - F.sum("t_a")).cast("long").alias("n_b"),
        F.sum(F.col("t_a").cast(_DEC) * F.col("r2").cast(_DEC)).alias("r2_a"),
        F.sum(
            F.col("t").cast(_DEC) * F.col("t").cast(_DEC) * F.col("t").cast(_DEC)
            - F.col("t").cast(_DEC)
        ).alias("ties_t"),
    )
    na, nb = F.col("n_a"), F.col("n_b")
    nn = (na + nb).cast("double")
    # doubled U_a = doubled R_a − n_a(n_a+1)
    u_a2 = (F.col("r2_a") - (na * (na + 1)).cast(_DEC)).cast("double")
    u_a = u_a2 / F.lit(2.0)
    prod = na.cast("double") * nb.cast("double")
    var = (
        prod
        / F.lit(12.0)
        * (
            (nn + 1)
            - F.col("ties_t").cast("double") / (nn * (nn - 1))
        )
    )
    return agg.select(
        na,
        nb,
        u_a.alias("u_a"),
        (prod - u_a).alias("u_b"),
        F.round(u_a / prod, 6).alias("auc"),
        F.when(var > 0, F.round((u_a - prod / 2) / F.sqrt(var), 6)).alias("z"),
    )


def ols_trend(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_col: str,
    y_scale: int = 1_000_000,
) -> DataFrame:
    """Per-group least-squares line y ≈ slope·(x − min(x)) + intercept —
    the "is this metric drifting over time" fit (x is typically epoch
    seconds): (group, n, x_min, slope, intercept). Groups with n < 2 or
    constant x report NULL slope.

    x centers on the group minimum FIRST (exact integer shift; slope is
    shift-invariant) so x² moments stay small enough for exact
    wide-integer sums even with epoch-second x — the standard
    catastrophic-cancellation dodge, done in integers instead of floats.
    One window min + one hash aggregation on the same group key.
    """
    q = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull()).select(
        F.col(group_col).alias("g"),
        F.col(x_col).cast("long").alias("x"),
        _quant(F.col(y_col), y_scale).alias("qy"),
    )
    wg = Window.partitionBy("g")
    centered = q.select(
        "g",
        F.min("x").over(wg).alias("x_min"),
        (F.col("x") - F.min("x").over(wg)).alias("qx"),
        "qy",
    )
    m = centered.groupBy("g", "x_min").agg(*_moment_aggs())
    nd = F.col("n").cast(_DEC)
    num = (nd * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = (nd * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    bnum = (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")).cast("double")
    ys = F.lit(float(y_scale))
    return m.select(
        F.col("g").alias(group_col),
        "n",
        "x_min",
        # + 0.0 normalizes IEEE signed zero (round() of a tiny negative
        # slope yields -0.0, which hashes differently from 0.0 downstream)
        F.when(dx > 0, F.round(num / (dx * ys), 6) + F.lit(0.0)).alias("slope"),
        F.when(dx > 0, F.round(bnum / (dx * ys), 6) + F.lit(0.0)).alias("intercept"),
    )


def chi2_independence(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Chi-squared independence of two categoricals + Cramér's V — the
    "is lang independent of source" style contingency gate: one row
    (n, k_a, k_b, dof, chi2, cramers_v). NULL categories drop.

    Per-cell terms (n·O − R·C)²/(n·R·C) are a fixed double-op sequence
    (identical in any IEEE engine), rounded ONCE to integer micros, then
    summed exactly — so the distributed sum order can't wobble the
    statistic (the incremental-aggregate fixed-point recipe).
    One (a,b) cell aggregate + two marginal aggregates, all hash;
    marginals broadcast back onto the cells.
    """
    base = df.filter(F.col(a_col).isNotNull() & F.col(b_col).isNotNull()).select(
        F.col(a_col).alias("a"), F.col(b_col).alias("b")
    )
    cells = base.groupBy("a", "b").agg(F.count(F.lit(1)).cast("long").alias("o"))
    ra = base.groupBy("a").agg(F.count(F.lit(1)).cast("long").alias("ra"))
    cb = base.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("cb"))
    tot = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.countDistinct("a").cast("long").alias("k_a"),
        F.countDistinct("b").cast("long").alias("k_b"),
    )
    j = (
        cells.join(F.broadcast(ra), "a")
        .join(F.broadcast(cb), "b")
        .crossJoin(F.broadcast(tot))
    )
    nd = F.col("n").cast("double")
    od = F.col("o").cast("double")
    rad = F.col("ra").cast("double")
    cbd = F.col("cb").cast("double")
    dev = nd * od - rad * cbd
    term_micro = F.round(dev * dev / (nd * rad * cbd) * F.lit(1_000_000.0), 0).cast(
        "long"
    )
    summed = j.groupBy("n", "k_a", "k_b").agg(
        F.sum(term_micro).cast("long").alias("chi2_micro")
    )
    chi2 = F.col("chi2_micro").cast("double") / F.lit(1_000_000.0)
    mink = F.least(F.col("k_a") - 1, F.col("k_b") - 1)
    return summed.select(
        "n",
        "k_a",
        "k_b",
        ((F.col("k_a") - 1) * (F.col("k_b") - 1)).alias("dof"),
        F.round(chi2, 6).alias("chi2"),
        F.when(
            mink > 0,
            F.round(F.sqrt(chi2 / (F.col("n").cast("double") * mink.cast("double"))), 6),
        ).alias("cramers_v"),
    )


def anova_f(
    df: DataFrame,
    value_col: str,
    group_col: str,
    scale: int = 1_000,
) -> DataFrame:
    """One-way ANOVA F over k groups — the "do these strata share a
    mean" gate (e.g. value by event_type): one row
    (n, k, ss_between, ss_within, f_stat, eta_sq). Groups of any size;
    k < 2 or zero within-variance reports NULL f_stat.

    Per-group moments are exact wide integers; each group's
    (Σx/scale)²/n term is ONE fixed IEEE op sequence in value² units, and
    with k small the cross-group double sum is order-sensitive only at
    sub-ulp scale — absorbed by the round-6 finish (the entry-module
    empirical-rounding note). Two hash aggregates (per-group, then
    global) — no sort, no window.
    """
    q = df.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(F.col(group_col).alias("g"), _quant(F.col(value_col), scale).alias("qv"))
    return _anova_core(q, scale)


def _anova_core(q: DataFrame, scale: int) -> DataFrame:
    """Shared one-way-ANOVA moment machinery over pre-quantized (g, qv)
    — the exact op sequence anova_f documents; brown_forsythe reuses it
    on absolute deviations from the group median."""
    per_g = q.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum(F.col("qv").cast(_DEC)).alias("sg"),
        F.sum(F.col("qv").cast("decimal(19,0)") * F.col("qv").cast("decimal(19,0)")).alias("ssg"),
    )
    sc = F.lit(float(scale))
    mg = F.col("sg").cast("double") / sc
    term = mg * mg / F.col("ng").cast("double")
    tot = per_g.select(
        "ng", "sg", "ssg", term.alias("tg")
    ).agg(
        F.sum("ng").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.col("sg")).alias("s"),
        F.sum(F.col("ssg")).alias("ss"),
        F.sum("tg").alias("a"),
    )
    ms = F.col("s").cast("double") / sc
    ssb = F.col("a") - ms * ms / F.col("n").cast("double")
    ssw = F.col("ss").cast("double") / (sc * sc) - F.col("a")
    k, n = F.col("k"), F.col("n")
    f_stat = (ssb / (k - 1).cast("double")) / (ssw / (n - k).cast("double"))
    return tot.select(
        "n",
        "k",
        F.round(ssb, 6).alias("ss_between"),
        F.round(ssw, 6).alias("ss_within"),
        F.when((k > 1) & (n > k) & (ssw > 0), F.round(f_stat, 6)).alias("f_stat"),
        F.when(ssb + ssw > 0, F.round(ssb / (ssb + ssw), 6)).alias("eta_sq"),
    )


def prop_ztest(df_a: DataFrame, df_b: DataFrame, flag_col: str) -> DataFrame:
    """Two-proportion z-test — the conversion/error-rate A/B gate: one
    row (n_a, n_b, x_a, x_b, p_a, p_b, z) where z uses the pooled
    proportion. Exact integer counts throughout; z's numerator is the
    integer x_a·n_b − x_b·n_a and its denominator takes ONE sqrt of a
    fixed double expression — z = num / √(x(n−x)·n_a·n_b/n).
    Degenerate pools (all true / all false) report NULL z.
    """
    cnt = lambda d: d.filter(F.col(flag_col).isNotNull()).agg(  # noqa: E731
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(flag_col).cast("long")).cast("long").alias("x"),
    )
    a = cnt(df_a).select(F.col("n").alias("n_a"), F.col("x").alias("x_a"))
    b = cnt(df_b).select(F.col("n").alias("n_b"), F.col("x").alias("x_b"))
    j = a.crossJoin(F.broadcast(b))
    na, nb, xa, xb = F.col("n_a"), F.col("n_b"), F.col("x_a"), F.col("x_b")
    x, n = xa + xb, na + nb
    num = (xa * nb - xb * na).cast("double")
    den_sq = (
        (x * (n - x)).cast("double")
        * na.cast("double")
        * nb.cast("double")
        / n.cast("double")
    )
    return j.select(
        na,
        nb,
        xa,
        xb,
        F.round(xa.cast("double") / na.cast("double"), 6).alias("p_a"),
        F.round(xb.cast("double") / nb.cast("double"), 6).alias("p_b"),
        F.when(den_sq > 0, F.round(num / F.sqrt(den_sq), 6)).alias("z"),
    )


def cohens_d(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Cohen's d standardized mean difference — the effect-size companion
    to mann_whitney_u/prop_ztest (a significant z on 100 TB of rows can
    be a trivial effect): one row (n_a, n_b, mean_a, mean_b, d) with the
    pooled-variance denominator. n_a+n_b < 3 or zero pooled variance
    reports NULL d.

    One moment aggregate per side on exact wide integers; the d
    combination is a fixed double sequence with one sqrt.
    """
    mom = lambda d: d.filter(F.col(value_col).isNotNull()).select(  # noqa: E731
        _quant(F.col(value_col), scale).alias("qv")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("qv").cast(_DEC)).alias("s"),
        F.sum(F.col("qv").cast("decimal(19,0)") * F.col("qv").cast("decimal(19,0)")).alias("ss"),
    )
    a = mom(df_a).select(
        F.col("n").alias("n_a"), F.col("s").alias("s_a"), F.col("ss").alias("ss_a")
    )
    b = mom(df_b).select(
        F.col("n").alias("n_b"), F.col("s").alias("s_b"), F.col("ss").alias("ss_b")
    )
    j = a.crossJoin(F.broadcast(b))
    na, nb = F.col("n_a"), F.col("n_b")
    sc = F.lit(float(scale))
    mean_a = F.col("s_a").cast("double") / na.cast("double") / sc
    mean_b = F.col("s_b").cast("double") / nb.cast("double") / sc
    # (n−1)·s² in micro² units = ss − s²/n, computed per side in doubles
    dev_a = F.col("ss_a").cast("double") - (F.col("s_a") * F.col("s_a")).cast(
        "double"
    ) / na.cast("double")
    dev_b = F.col("ss_b").cast("double") - (F.col("s_b") * F.col("s_b")).cast(
        "double"
    ) / nb.cast("double")
    pooled = (dev_a + dev_b) / (na + nb - 2).cast("double")
    d_val = (mean_a - mean_b) / (F.sqrt(pooled) / sc)
    return j.select(
        na,
        nb,
        F.round(mean_a, 6).alias("mean_a"),
        F.round(mean_b, 6).alias("mean_b"),
        F.when((na + nb > 2) & (pooled > 0), F.round(d_val, 6)).alias("d"),
    )


def gini_coefficient(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Gini concentration coefficient of a non-negative integer quantity
    (per group): (group?, n, total, gini). The canonical inequality gate
    for a corpus — "how concentrated are events per user / mentions per
    entity / bytes per domain" — 0 = uniform, →1 = one key owns it all.

    Sorted-rank identity G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx) with the
    rank window ordered on (value, tie) — ties swap equal values so the
    Σ i·x_(i) term is order-invariant; numerator and denominator are
    EXACT wide-integer sums, one round-6 division at the end (module
    float discipline). NULL / negative values are rejected rows (a
    negative quantity has no Gini).

    Scale: one rank window per group over the (key, value) rows — these
    are PRE-AGGREGATED rows (one per user/entity/domain), orders of
    magnitude below raw events, so the per-group sort is the cheap part;
    a single group with billions of distinct keys wants the two-phase
    distributed prefix-sum variant (dedup_text.sorted_neighborhood_pairs
    pattern), documented not assumed."""
    if value_col not in df.columns:
        raise ValueError(f"unknown column {value_col!r}")
    keys = [group_col] if group_col else []
    q = df.filter(F.col(value_col).isNotNull() & (F.col(value_col) >= 0)).select(
        *keys, F.col(value_col).cast("long").alias("x")
    )
    w = Window.partitionBy(*keys).orderBy("x") if keys else Window.orderBy("x")
    ranked = q.select(*keys, "x", F.row_number().over(w).alias("i"))
    agg = ranked.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast(_DEC).alias("sx"),
        F.sum(F.col("i").cast(_DEC) * F.col("x")).cast(_DEC).alias("six"),
    )
    num = F.lit(2).cast(_DEC) * F.col("six") - (F.col("n") + 1).cast(_DEC) * F.col("sx")
    den = F.col("n").cast(_DEC) * F.col("sx")
    return agg.select(
        *keys,
        "n",
        F.col("sx").cast("long").alias("total"),
        F.when(den > 0, F.round(num.cast("double") / den.cast("double"), 6)).alias(
            "gini"
        ),
    )


def kendall_tau(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Kendall rank correlation tau-a per group: (group?, n, concordant,
    discordant, tau). Pairs tied on x OR y count as neither (tau-a keeps
    the denominator at n(n-1)/2) — integer pair counts, ONE round-6
    division. Complements spearman_corr: tau is the probability-of-
    agreement statistic, robust to the midrank subtleties.

    Cost is the honest O(n²) pair join PER GROUP (self-join on the group
    key with id inequality) — the contract is bounded groups: feed it a
    deterministic subsample (id % k == 0) or pre-aggregated rows, exactly
    as a 100-TB run would. Knight's O(n log n) merge-sort count is the
    single-machine trick, not a shuffle-friendly one; the bounded-group
    join IS the distributed shape (each group's pairs shard across
    executors).

    Inputs must already be integers (quantize upstream: epoch seconds,
    round-4 fixed-point) so comparisons are exact cross-engine."""
    keys = [group_col] if group_col else []
    q = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull()).select(
        *keys,
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    )
    w = Window.partitionBy(*keys).orderBy("x", "y") if keys else Window.orderBy("x", "y")
    ranked = q.select(*keys, "x", "y", F.row_number().over(w).alias("i"))
    a = ranked.select(*keys, F.col("x").alias("xa"), F.col("y").alias("ya"),
                      F.col("i").alias("ia"))
    b = ranked.select(*keys, F.col("x").alias("xb"), F.col("y").alias("yb"),
                      F.col("i").alias("ib"))
    pairs = a.join(b, keys) if keys else a.crossJoin(b)
    pairs = pairs.filter(F.col("ia") < F.col("ib"))
    sgn = (F.col("xb") - F.col("xa")) * (F.col("yb") - F.col("ya"))
    agg = pairs.groupBy(*keys).agg(
        F.sum(F.when(sgn > 0, 1).otherwise(0)).cast("long").alias("concordant"),
        F.sum(F.when(sgn < 0, 1).otherwise(0)).cast("long").alias("discordant"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    )
    n_from_pairs = ranked.groupBy(*keys).agg(F.count(F.lit(1)).cast("long").alias("n"))
    joined = agg.join(n_from_pairs, keys) if keys else agg.crossJoin(n_from_pairs)
    return joined.select(
        *keys,
        "n",
        "concordant",
        "discordant",
        F.when(
            F.col("n_pairs") > 0,
            F.round(
                (F.col("concordant") - F.col("discordant")) / F.col("n_pairs"), 6
            ),
        ).alias("tau"),
    )


def theil_sen_slope(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Theil–Sen robust trend per group: the MEDIAN of all pairwise
    slopes (y_j−y_i)/(x_j−x_i), x_i ≠ x_j — (group?, n, n_slopes,
    slope). The breakdown-point-29% twin of ols_trend: one outlying
    reading moves OLS, not the slope median.

    Exactness without rounding: x and y must arrive as integers (epoch
    seconds, fixed-point values), so every slope is ONE IEEE division of
    exact integers — bit-identical in any engine — and the median is an
    ELEMENT of that set (odd count) or one exact mean of two (even).
    Same bounded-group O(n²) contract and subsample guidance as
    kendall_tau."""
    keys = [group_col] if group_col else []
    q = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull()).select(
        *keys,
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    )
    w = Window.partitionBy(*keys).orderBy("x", "y") if keys else Window.orderBy("x", "y")
    ranked = q.select(*keys, "x", "y", F.row_number().over(w).alias("i"))
    a = ranked.select(*keys, F.col("x").alias("xa"), F.col("y").alias("ya"),
                      F.col("i").alias("ia"))
    b = ranked.select(*keys, F.col("x").alias("xb"), F.col("y").alias("yb"),
                      F.col("i").alias("ib"))
    pairs = (a.join(b, keys) if keys else a.crossJoin(b)).filter(
        (F.col("ia") < F.col("ib")) & (F.col("xa") != F.col("xb"))
    )
    slopes = pairs.select(
        *keys,
        ((F.col("yb") - F.col("ya")) / (F.col("xb") - F.col("xa"))).alias("s"),
    )
    ws = Window.partitionBy(*keys).orderBy("s") if keys else Window.orderBy("s")
    med = slopes.select(
        *keys,
        "s",
        F.row_number().over(ws).alias("r"),
        F.count(F.lit(1)).over(
            (Window.partitionBy(*keys) if keys else Window.partitionBy())
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("m"),
    ).filter(
        (F.col("r") == (F.col("m") + 1) / 2)
        | (F.col("r") == F.col("m") / 2 + 1)
        | (F.col("r") == F.col("m") / 2)
    )
    # odd m: keeps exactly rank (m+1)/2; even m: keeps ranks m/2 and m/2+1
    slope = med.groupBy(*keys).agg(
        F.avg("s").alias("slope"), F.count(F.lit(1)).alias("_k")
    )
    n_rows = ranked.groupBy(*keys).agg(F.count(F.lit(1)).cast("long").alias("n"))
    n_slopes = slopes.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_slopes")
    )
    out = slope.join(n_rows, keys) if keys else slope.crossJoin(n_rows)
    out = out.join(n_slopes, keys) if keys else out.crossJoin(n_slopes)
    return out.select(*keys, "n", "n_slopes", "slope")


def runs_test(
    df: DataFrame,
    value_col: str,
    order_col: str,
    group_col: str | None = None,
    scale: int = 100,
) -> DataFrame:
    """Wald–Wolfowitz runs test for serial randomness per group:
    (group?, n_pos, n_neg, runs, expected_runs, z). Values quantize to
    the integer grid, split above/below the group's exact LOWER median
    (the grid element at ordered position ⌈n/2⌉ — never an interpolated
    midpoint), ties-at-median drop (the standard treatment), and a run
    is a maximal same-sign stretch in `order_col` order. Too few runs
    (z ≪ 0) = trending/sticky sequence; too many = oscillation — the
    is-this-metric-actually-random gate behind evt_cusum.

    Exactness: n₁, n₂, R are exact integers; E[R] = 1 + 2m/n (m = n₁n₂)
    is ONE double division; z = ((R−1)·n − 2m) · √(n−1) / √(2m(2m−n)) —
    numerator and radicands combine as exact longs, then a fixed
    double·sqrt/sqrt op sequence both engines replay identically
    (the _corr_from_moments discipline). Degenerate groups (one sign,
    or 2m = n) return NULL z.

    Scale: one rank window + one lag window, both partitioned by group —
    per-group sequential semantics, so groups must be bounded (the
    ks_2sample contract); the median lookup is a broadcast join back.
    """
    keys = [group_col] if group_col else []
    q = df.filter(
        F.col(value_col).isNotNull() & F.col(order_col).isNotNull()
    ).select(*keys, F.col(order_col).alias("ord"), _quant(F.col(value_col), scale).alias("qv"))
    w_rank = Window.partitionBy(*keys).orderBy("qv", "ord")
    counts = q.groupBy(*keys).agg(F.count(F.lit(1)).cast("long").alias("n_all"))
    ranked = q.withColumn("rn", F.row_number().over(w_rank))
    med = (
        (ranked.join(counts, keys) if keys else ranked.crossJoin(counts))
        .filter(F.col("rn") == F.floor((F.col("n_all") + 1) / 2).cast("long"))
        .select(*keys, F.col("qv").alias("med"))
    )
    signed = (
        (q.join(F.broadcast(med), keys) if keys else q.crossJoin(F.broadcast(med)))
        .filter(F.col("qv") != F.col("med"))
        .select(*keys, "ord", (F.col("qv") > F.col("med")).cast("int").alias("sign"))
    )
    w_seq = Window.partitionBy(*keys).orderBy("ord")
    flips = signed.withColumn(
        "flip",
        F.when(F.lag("sign").over(w_seq).isNull(), F.lit(1))
        .when(F.lag("sign").over(w_seq) != F.col("sign"), F.lit(1))
        .otherwise(F.lit(0)),
    )
    agg = flips.groupBy(*keys).agg(
        F.sum("sign").cast("long").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("sign")).cast("long").alias("n_neg"),
        F.sum("flip").cast("long").alias("runs"),
    )
    n = (F.col("n_pos") + F.col("n_neg")).cast("long")
    m = (F.col("n_pos") * F.col("n_neg")).cast("long")
    diff = ((F.col("runs") - 1) * n - 2 * m).cast("double")
    den = (2 * m * (2 * m - n)).cast("double")
    return agg.select(
        *keys,
        "n_pos",
        "n_neg",
        "runs",
        F.when(n > 0, F.round((n + 2 * m).cast("double") / n.cast("double"), 6)).alias(
            "expected_runs"
        ),
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0) & (2 * m != n),
            F.round(diff * F.sqrt((n - 1).cast("double")) / F.sqrt(den), 6),
        ).alias("z"),
    )


def welch_t(
    df: DataFrame,
    value_col: str,
    side_col: str,
    group_col: str | None = None,
    scale: int = 100,
) -> DataFrame:
    """Welch's unequal-variance t-test per group: side_col (boolean) splits
    each group into samples A (true) and B (false); returns (group?, n_a,
    n_b, mean_a, mean_b, t_stat, df_welch). The A/B acceptance gate that
    does NOT assume equal variances — the correct default when comparing a
    metric across cohorts whose sizes and spreads differ (weekend vs
    weekday values, treatment vs holdout), where Student's pooled test
    silently miscalibrates.

    Exactness: values quantize to the integer grid; per-side moments
    (n, Σx, Σx²) are exact wide integers. Each side's variance-over-n
    u = (n·Σx² − (Σx)²) / (n²(n−1)·scale²) is ONE double division of two
    exactly-representable integers, then t = (mean_a − mean_b)/√(u_a+u_b)
    and Welch–Satterthwaite df = (u_a+u_b)²/(u_a²/(n_a−1) + u_b²/(n_b−1))
    are fixed IEEE op sequences both engines replay identically (the
    runs_test / _corr_from_moments discipline). Sides with n < 2 or zero
    combined variance report NULL t.

    Scale: ONE hash aggregate keyed on (group, side) with map-side
    partials, then a pivot of exactly two rows per group — no sort, no
    window, no collect."""
    keys = [group_col] if group_col else []
    q = df.filter(
        F.col(value_col).isNotNull() & F.col(side_col).isNotNull()
    ).select(
        *keys,
        F.col(side_col).cast("boolean").alias("side"),
        _quant(F.col(value_col), scale).alias("qv"),
    )
    d19 = F.col("qv").cast("decimal(19,0)")
    per = q.groupBy(*keys, "side").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("qv").cast(_DEC)).alias("s"),
        F.sum(d19 * d19).alias("ss"),
    )
    side = lambda c, flag: F.max(F.when(F.col("side") == flag, F.col(c)))  # noqa: E731
    wide = per.groupBy(*keys).agg(
        side("n", True).alias("n_a"),
        side("s", True).alias("s_a"),
        side("ss", True).alias("ss_a"),
        side("n", False).alias("n_b"),
        side("s", False).alias("s_b"),
        side("ss", False).alias("ss_b"),
    )
    sc = float(scale)
    sc2 = sc * sc

    def u(n, s, ss):
        num = (F.col(n).cast(_DEC) * F.col(ss) - F.col(s) * F.col(s)).cast("double")
        den = (
            F.col(n).cast(_DEC) * F.col(n).cast(_DEC) * (F.col(n) - 1).cast(_DEC)
        ).cast("double") * F.lit(sc2)
        return num / den

    mean = lambda n, s: F.col(s).cast("double") / F.lit(sc) / F.col(n).cast("double")  # noqa: E731
    ua, ub = u("n_a", "s_a", "ss_a"), u("n_b", "s_b", "ss_b")
    se2 = ua + ub
    t = (mean("n_a", "s_a") - mean("n_b", "s_b")) / F.sqrt(se2)
    dfw = (se2 * se2) / (
        ua * ua / (F.col("n_a") - 1).cast("double")
        + ub * ub / (F.col("n_b") - 1).cast("double")
    )
    ok = (F.col("n_a") >= 2) & (F.col("n_b") >= 2)
    return wide.filter(F.col("n_a").isNotNull() & F.col("n_b").isNotNull()).select(
        *keys,
        "n_a",
        "n_b",
        F.round(mean("n_a", "s_a"), 6).alias("mean_a"),
        F.round(mean("n_b", "s_b"), 6).alias("mean_b"),
        F.when(ok & (se2 > 0), F.round(t, 6)).alias("t_stat"),
        F.when(ok & (se2 > 0), F.round(dfw, 6)).alias("df_welch"),
    )


def brown_forsythe(
    df: DataFrame,
    value_col: str,
    group_col: str,
    scale: int = 100,
) -> DataFrame:
    """Brown–Forsythe (median-based Levene) variance-homogeneity test:
    one-way ANOVA F over |x − group median| — the "may I pool these
    strata / trust that pooled test" gate that belongs BEFORE anova_f
    and cohens_d, robust to non-normal tails where classic Levene
    (mean-based) miscalibrates. One row (n, k, ss_between, ss_within,
    f_stat, eta_sq) — large F = spreads differ across groups.

    Exactness: values quantize to the integer grid; the group median is
    the exact LOWER median on that grid (the runs_test recipe — never an
    interpolated midpoint), so every |x − med| is an exact integer and
    the downstream moments reuse _anova_core's documented op sequence
    verbatim.

    Scale: one rank window partitioned by the bounded group key, a
    broadcast median join back, then the same two hash aggregates as
    anova_f — no extra shuffle beyond ANOVA itself."""
    q = df.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(F.col(group_col).alias("g"), _quant(F.col(value_col), scale).alias("qv"))
    w_rank = Window.partitionBy("g").orderBy("qv")
    counts = q.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("n_all"))
    med = (
        q.withColumn("rn", F.row_number().over(w_rank))
        .join(counts, "g")
        .filter(F.col("rn") == F.floor((F.col("n_all") + 1) / 2).cast("long"))
        .select("g", F.col("qv").alias("med"))
    )
    z = q.join(F.broadcast(med), "g").select(
        "g", F.abs(F.col("qv") - F.col("med")).alias("qv")
    )
    return _anova_core(z, scale)


def mann_kendall(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Mann–Kendall monotone-trend test per group: (group?, n, s, var_s,
    z) where S = concordant − discordant over time-ordered pairs and
    Var(S) carries BOTH tie corrections (tied values AND tied
    timestamps — the Kendall 1975 form), which kendall_tau's tau-a
    deliberately skips. The distribution-free is-this-metric-drifting
    gate: |z| > 1.96 rejects "no trend" at 5%.

    Exactness: inputs must already be integers (epoch seconds, fixed-
    point values — the kendall_tau contract). S, n and every tie term
    t(t−1)(2t+5) / t(t−1)(t−2) / t(t−1) are exact longs; Var(S) is the
    fixed three-division sequence v18/18 + c2/(9n(n−1)(n−2)) +
    c3/(2n(n−1)) on exact integers, then z = (S∓1)/√Var — the same IEEE
    replay both engines share. Time-tied pairs contribute 0 to S by
    construction ((x_b−x_a)=0 ⇒ product 0). n < 3 or Var ≤ 0 → NULL z;
    S = 0 → z = 0.

    Scale: the honest O(n²) pair join per bounded group (the kendall_tau
    contract — feed a deterministic subsample), plus two tiny tie
    aggregations on (group, value) / (group, time)."""
    keys = [group_col] if group_col else []
    q = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull()).select(
        *keys,
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    )
    w = Window.partitionBy(*keys).orderBy("x", "y") if keys else Window.orderBy("x", "y")
    ranked = q.select(*keys, "x", "y", F.row_number().over(w).alias("i"))
    a = ranked.select(*keys, F.col("x").alias("xa"), F.col("y").alias("ya"),
                      F.col("i").alias("ia"))
    b = ranked.select(*keys, F.col("x").alias("xb"), F.col("y").alias("yb"),
                      F.col("i").alias("ib"))
    pairs = (a.join(b, keys) if keys else a.crossJoin(b)).filter(
        F.col("ia") < F.col("ib")
    )
    sgn = (F.col("xb") - F.col("xa")) * (F.col("yb") - F.col("ya"))
    s_agg = pairs.groupBy(*keys).agg(
        (
            F.sum(F.when(sgn > 0, 1).otherwise(0))
            - F.sum(F.when(sgn < 0, 1).otherwise(0))
        ).cast("long").alias("s"),
    )

    def _ties(col: str, pfx: str) -> DataFrame:
        t = F.col("t")
        return (
            q.groupBy(*keys, col).agg(F.count(F.lit(1)).cast("long").alias("t"))
            .groupBy(*keys).agg(
                F.count(F.lit(1)).cast("long").alias(f"{pfx}_n"),  # distinct levels
                F.sum(t * (t - 1) * (2 * t + 5)).cast("long").alias(f"{pfx}_a"),
                F.sum(t * (t - 1) * (t - 2)).cast("long").alias(f"{pfx}_b"),
                F.sum(t * (t - 1)).cast("long").alias(f"{pfx}_c"),
                F.sum(t).cast("long").alias(f"{pfx}_tot"),
            )
        )

    tx, ty = _ties("x", "tx"), _ties("y", "ty")
    j = s_agg.join(tx, keys).join(ty, keys) if keys else (
        s_agg.crossJoin(tx).crossJoin(ty)
    )
    n = F.col("tx_tot")
    v18 = (
        n * (n - 1) * (2 * n + 5) - F.col("tx_a") - F.col("ty_a")
    ).cast("double")
    c2 = (F.col("tx_b") * F.col("ty_b")).cast("double")
    den2 = (9 * n * (n - 1) * (n - 2)).cast("double")
    c3 = (F.col("tx_c") * F.col("ty_c")).cast("double")
    den3 = (2 * n * (n - 1)).cast("double")
    var_s = v18 / F.lit(18.0) + c2 / den2 + c3 / den3
    s = F.col("s")
    z = F.when(s > 0, (s - 1).cast("double") / F.sqrt(var_s)).when(
        s < 0, (s + 1).cast("double") / F.sqrt(var_s)
    ).otherwise(F.lit(0.0))
    return j.select(
        *keys,
        n.alias("n"),
        "s",
        F.when(n >= 3, F.round(var_s, 6)).alias("var_s"),
        F.when((n >= 3) & (var_s > 0), F.round(z, 6)).alias("z"),
    )


def cvm_2sample(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Two-sample Cramér–von Mises statistic — the whole-CDF drift gate
    that integrates the squared gap between the two empirical CDFs
    where KS takes only its maximum, so a distribution that drifts a
    little EVERYWHERE (tails, shoulders) trips this before it trips
    ks_2sample. One row (n_a, n_b, t_stat, t_expected): t_expected =
    (1 + 1/(n+m))/6 is E[T] under H₀ (Anderson–Darling 1962), so
    t_stat ≫ t_expected reads as drift without a table lookup.

    Exact until the last step: at each pooled grid value the CDF gap
    cross-multiplies to the integer D = cum_a·n_b − cum_b·n_a, and
    T's numerator Σ (c_a+c_b)·D² accumulates in decimal(38,0) ≡
    HUGEINT; T = num / (n_a·n_b·(n_a+n_b)²) is ONE division (the
    pooled-count weighting is the standard computational form of
    nm/(n+m)² ∫(F_a−F_b)² dH). Same plan as ks_2sample: two per-value
    aggregates, a grid merge, one window over the DISTINCT grid."""
    qa = df_a.filter(F.col(value_col).isNotNull()).select(
        _quant(F.col(value_col), scale).alias("qv")
    )
    qb = df_b.filter(F.col(value_col).isNotNull()).select(
        _quant(F.col(value_col), scale).alias("qv")
    )
    ca = qa.groupBy("qv").agg(F.count(F.lit(1)).cast("long").alias("ca"))
    cb = qb.groupBy("qv").agg(F.count(F.lit(1)).cast("long").alias("cb"))
    merged = ca.join(cb, "qv", "full_outer").select(
        "qv",
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )
    w = Window.orderBy("qv").rowsBetween(Window.unboundedPreceding, 0)
    cum = merged.select(
        "ca", "cb",
        F.sum("ca").over(w).cast("long").alias("cum_a"),
        F.sum("cb").over(w).cast("long").alias("cum_b"),
    )
    tot = merged.agg(
        F.sum("ca").cast("long").alias("n_a"), F.sum("cb").cast("long").alias("n_b")
    )
    d19 = "decimal(19,0)"
    j = cum.crossJoin(F.broadcast(tot))
    dgap = (
        F.col("cum_a").cast(d19) * F.col("n_b") - F.col("cum_b").cast(d19) * F.col("n_a")
    )
    num = j.agg(
        F.sum(((F.col("ca") + F.col("cb")).cast(d19) * dgap * dgap).cast(_DEC))
        .alias("num"),
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
    )
    na, nb = F.col("n_a"), F.col("n_b")
    n = na + nb
    den = (na.cast(_DEC) * nb.cast(_DEC) * (n * n).cast(_DEC)).cast("double")
    return num.select(
        "n_a",
        "n_b",
        F.when(
            (na > 0) & (nb > 0),
            F.round(F.col("num").cast("double") / den, 6),
        ).alias("t_stat"),
        F.when(
            (na > 0) & (nb > 0),
            F.round((F.lit(1.0) + F.lit(1.0) / n.cast("double")) / F.lit(6.0), 6),
        ).alias("t_expected"),
    )


def prop_wilson(
    df: DataFrame,
    flag_col: str,
    group_col: str | None = None,
    z: float = 1.959963984540054,
) -> DataFrame:
    """Wilson score interval for a proportion per group: (group?, n, x,
    p, lo, hi) — the rate CI that stays honest at the edges where the
    Wald interval collapses (p near 0/1, small strata): a conversion or
    error rate whose Wilson band still includes the SLA bound is not
    yet evidence of regression. z defaults to the exact two-sided 95%
    normal quantile literal (shared with any restatement — never an
    engine's quantile function).

    Determinism: x and n are exact longs; lo/hi are ONE fixed IEEE op
    sequence on (x, n, z) — written in the same order everywhere:
    denom = 1+z²/n, center = p+z²/2n, rad = √((p(1−p)+z²/4n)/n),
    bounds = (center ∓ z·rad)/denom, round 6. n = 0 groups are absent
    by construction; x ∈ {0, n} still yields a proper interval (the
    Wilson point).

    Scale: ONE hash aggregate with map-side partials."""
    keys = [group_col] if group_col else []
    agg = df.filter(F.col(flag_col).isNotNull()).groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(flag_col).cast("long")).cast("long").alias("x"),
    )
    nd = F.col("n").cast("double")
    p = F.col("x").cast("double") / nd
    z2 = F.lit(z * z)
    denom = F.lit(1.0) + z2 / nd
    center = p + z2 / (F.lit(2.0) * nd)
    rad = F.sqrt((p * (F.lit(1.0) - p) + z2 / (F.lit(4.0) * nd)) / nd)
    return agg.select(
        *keys,
        "n",
        "x",
        F.round(p, 6).alias("p"),
        F.round((center - F.lit(z) * rad) / denom, 6).alias("lo"),
        F.round((center + F.lit(z) * rad) / denom, 6).alias("hi"),
    )


def paired_t(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_col: str | None = None,
    scale: int = 100,
) -> DataFrame:
    """Paired t-test per group on matched observations (before/after,
    metric vs its own lag): (group?, n, mean_diff, t_stat, df). The
    within-subject gate welch_t can't give you — pairing cancels the
    between-subject variance, so a small consistent shift that drowns
    in welch_t's pooled spread is significant here.

    Exactness: differences d = qx − qy are exact longs on the shared
    grid and the scale CANCELS in t: t = Σd·√(n−1)/√(nΣd²−(Σd)²) —
    integer numerator and radicands, one fixed double·sqrt/sqrt
    sequence (the runs_test discipline). mean_diff = (Σd/scale)/n, two
    divisions. n < 2 or zero difference-variance → NULL t.

    Scale: ONE hash aggregate with map-side partials."""
    keys = [group_col] if group_col else []
    q = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull()).select(
        *keys,
        (_quant(F.col(x_col), scale) - _quant(F.col(y_col), scale)).alias("d"),
    )
    agg = q.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("d").cast(_DEC)).alias("s"),
        F.sum(F.col("d").cast("decimal(19,0)") * F.col("d").cast("decimal(19,0)"))
        .alias("ss"),
    )
    nd = F.col("n").cast(_DEC)
    rad = (nd * F.col("ss") - F.col("s") * F.col("s")).cast("double")
    t = (
        F.col("s").cast("double")
        * F.sqrt((F.col("n") - 1).cast("double"))
        / F.sqrt(rad)
    )
    return agg.select(
        *keys,
        "n",
        F.round(
            (F.col("s").cast("double") / F.lit(float(scale)))
            / F.col("n").cast("double"),
            6,
        ).alias("mean_diff"),
        F.when((F.col("n") >= 2) & (rad > 0), F.round(t, 6)).alias("t_stat"),
        (F.col("n") - 1).cast("long").alias("df"),
    )


def kruskal_wallis(
    df: DataFrame,
    value_col: str,
    group_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Kruskal-Wallis H — the k-group extension of mann_whitney_u (the
    nonparametric anova_f): one row (n, k, dof, h, h_tie_corrected).
    The "did ANY of these k curation variants shift the distribution"
    omnibus gate where anova_f's normality assumption is indefensible
    (long-tailed quality scores, token counts).

    Machinery: the doubled-midrank grid of mann_whitney_u, grouped —
    ranks are assigned on the DISTINCT value grid (grid-sized window,
    not data-sized) and joined back to per-(value, group) counts, so
    per-group rank sums accumulate as exact wide integers. The
    per-group term R_g²/n_g is normalized by N(N+1) INSIDE the fixed
    per-group double sequence so it is ≤ 1, NANO-rounded once, summed
    exactly (the chi2_independence recipe at 1000× the precision —
    the 12× multiplier would push micro dust into round-6 territory),
    then H = 12·S − 3(N+1). Tie
    correction C = 1 − Σ(t³−t)/(N³−N) on exact integers; all-tied
    input → C = 0 → NULL h_tie_corrected.

    Reference parity: the reference's eval notebooks reach for scipy
    kruskal on curation A/B/n comparisons; this is the distributed,
    oracle-checkable restatement.
    """
    q = df.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        F.col(group_col).alias("g"), _quant(F.col(value_col), scale).alias("qv")
    )
    per_vg = q.groupBy("qv", "g").agg(F.count(F.lit(1)).cast("long").alias("t_g"))
    per_v = per_vg.groupBy("qv").agg(F.sum("t_g").cast("long").alias("t"))
    w = Window.orderBy("qv")
    ranked = per_v.select(
        "qv",
        "t",
        (
            2 * (F.sum("t").over(w.rowsBetween(Window.unboundedPreceding, 0)) - F.col("t"))
            + F.col("t")
            + 1
        ).cast("long").alias("r2"),
    )
    per_g = (
        per_vg.join(ranked.select("qv", "r2"), "qv")
        .groupBy("g")
        .agg(
            F.sum("t_g").cast("long").alias("n_g"),
            F.sum(F.col("t_g").cast(_DEC) * F.col("r2").cast(_DEC)).alias("r2_g"),
        )
    )
    tot = ranked.agg(
        F.sum("t").cast("long").alias("n"),
        F.sum(
            F.col("t").cast(_DEC) * F.col("t").cast(_DEC) * F.col("t").cast(_DEC)
            - F.col("t").cast(_DEC)
        ).alias("ties_t"),
    )
    j = per_g.crossJoin(F.broadcast(tot))
    nd = F.col("n").cast("double")
    r2d = F.col("r2_g").cast("double")
    ngd = F.col("n_g").cast("double")
    # R_g²/n_g normalized by N(N+1): term = R2_g²/(4·n_g·N·(N+1)) ≤ 1
    term_nano = F.round(
        r2d * r2d / (F.lit(4.0) * ngd * nd * (nd + F.lit(1.0)))
        * F.lit(1_000_000_000.0),
        0,
    ).cast("long")
    s = j.groupBy("n", "ties_t").agg(
        F.sum(term_nano).cast("long").alias("s_nano"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    nd = F.col("n").cast("double")
    h = F.lit(12.0) * F.col("s_nano").cast("double") / F.lit(
        1_000_000_000.0
    ) - F.lit(3.0) * (nd + F.lit(1.0))
    c = F.lit(1.0) - F.col("ties_t").cast("double") / (nd * nd * nd - nd)
    return s.select(
        "n",
        "k",
        (F.col("k") - 1).cast("long").alias("dof"),
        F.round(h, 6).alias("h"),
        F.when((nd * nd * nd - nd > 0) & (c > 0), F.round(h / c, 6)).alias(
            "h_tie_corrected"
        ),
    )


def cochran_armitage(df: DataFrame, score_col: str, flag_col: str) -> DataFrame:
    """Cochran-Armitage trend test — "does the success rate trend
    monotonically across ORDERED groups" (dose-response for proportions):
    one row (k, n, x, z). The gate chi2_independence can't give you —
    chi2 sees any association, this one spends its single degree of
    freedom on the ordering, so a monotone drift of (say) completion
    rate across priority bands 1..5 is significant here long before the
    omnibus test fires.

    z = Σw(x_g·N − n_g·X) / √(X(N−X)·(N·Σw²n − (Σwn)²)/N): the
    numerator and every radicand factor accumulate as exact wide
    integers (cross-multiplied before any division — the prop_ztest
    discipline); ONE fixed double sequence with one sqrt at the end.
    Degenerate (all-success, all-failure, or single group) → NULL z.

    Scale: one hash aggregate per group key + one single-row fold.
    """
    q = df.filter(
        F.col(score_col).isNotNull() & F.col(flag_col).isNotNull()
    ).select(
        F.col(score_col).cast("long").alias("w"),
        F.col(flag_col).cast("boolean").cast("int").alias("s"),
    )
    per_g = q.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("s").cast("long").alias("x_g"),
    )
    tot = per_g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n"),
        F.sum("x_g").cast("long").alias("x"),
        F.sum(F.col("w").cast(_DEC) * F.col("n_g").cast(_DEC)).alias("swn"),
        F.sum(
            F.col("w").cast(_DEC) * F.col("w").cast(_DEC) * F.col("n_g").cast(_DEC)
        ).alias("swwn"),
        F.sum(F.col("w").cast(_DEC) * F.col("x_g").cast(_DEC)).alias("swx"),
    )
    nD = F.col("n").cast(_DEC)
    xD = F.col("x").cast(_DEC)
    a = (nD * F.col("swx") - xD * F.col("swn")).cast("double")
    c = (nD * F.col("swwn") - F.col("swn") * F.col("swn")).cast("double")
    xd = F.col("x").cast("double")
    ndd = F.col("n").cast("double")
    rad = xd * (ndd - xd) * c / ndd
    return tot.select(
        "k",
        "n",
        "x",
        F.when(rad > 0, F.round(a / F.sqrt(rad), 6)).alias("z"),
    )


def poisson_rate_test(
    df_a: DataFrame, df_b: DataFrame, ts_col: str
) -> DataFrame:
    """Two-sample Poisson rate comparison — "is stream A arriving
    faster than stream B" for event/error/ingest rates: one row
    (n_a, n_b, span_a_sec, span_b_sec, rate_a, rate_b, z). The
    COUNT-process companion to prop_ztest (which compares shares of a
    fixed denominator; this compares arrivals per unit time).

    Exposure is each side's observed span (max − min event time, whole
    seconds — exact longs); rates and the pooled-rate z
    (λ̂ = (x_a+x_b)/(T_a+T_b), z = (r_a−r_b)/√(λ̂(1/T_a+1/T_b))) are
    ONE fixed double sequence with one sqrt. Either span 0 → NULL z
    (and NULL rate for that side). Spans are observed, not designed —
    for a designed-exposure test, pre-compute T and pass a literal
    timestamp pair; documented, not silently assumed.

    Scale: two single-row aggregates, broadcast together.
    """
    def side(d: DataFrame, tag: str) -> DataFrame:
        t = F.col(ts_col).cast("long")
        return d.filter(F.col(ts_col).isNotNull()).agg(
            F.count(F.lit(1)).cast("long").alias(f"n_{tag}"),
            (F.max(t) - F.min(t)).cast("long").alias(f"span_{tag}_sec"),
        )

    j = side(df_a, "a").crossJoin(F.broadcast(side(df_b, "b")))
    xa, xb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ta = F.col("span_a_sec").cast("double")
    tb = F.col("span_b_sec").cast("double")
    lam = (xa + xb) / (ta + tb)
    var = lam * (F.lit(1.0) / ta + F.lit(1.0) / tb)
    ok = (F.col("span_a_sec") > 0) & (F.col("span_b_sec") > 0)
    return j.select(
        "n_a",
        "n_b",
        "span_a_sec",
        "span_b_sec",
        F.when(F.col("span_a_sec") > 0, F.round(xa / ta, 6)).alias("rate_a"),
        F.when(F.col("span_b_sec") > 0, F.round(xb / tb, 6)).alias("rate_b"),
        F.when(ok & (var > 0), F.round((xa / ta - xb / tb) / F.sqrt(var), 6)).alias(
            "z"
        ),
    )


def mcnemar(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """McNemar's paired-binary test — "do two gates disagree
    ASYMMETRICALLY on the same rows": one row (n, b, c, chi2,
    chi2_corrected). The paired companion to prop_ztest (which compares
    two independent proportions; this one conditions on the concordant
    pairs and tests only the discordant cells): b = rows where A fires
    and B doesn't, c = the reverse; chi2 = (b−c)²/(b+c) and the
    Edwards continuity-corrected (|b−c|−1)²/(b+c), both 1 dof. The
    "did swapping quality gates actually change decisions, or just
    shuffle ties" check a curation pipeline runs before replacing a
    filter. No discordant pairs (b+c = 0) → NULL statistics.

    All cells are exact longs from ONE hash aggregate; each statistic is
    a single integer-ratio division, round-6'd.
    """
    q = df.filter(F.col(a_col).isNotNull() & F.col(b_col).isNotNull()).select(
        F.col(a_col).cast("boolean").alias("a"),
        F.col(b_col).cast("boolean").alias("b"),
    )
    t = q.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("a") & ~F.col("b")).cast("int")).cast("long").alias("b"),
        F.sum((~F.col("a") & F.col("b")).cast("int")).cast("long").alias("c"),
    )
    bd = F.col("b").cast("double")
    cd = F.col("c").cast("double")
    disc = F.col("b") + F.col("c")
    corr = F.abs(bd - cd) - F.lit(1.0)
    return t.select(
        "n",
        "b",
        "c",
        F.when(disc > 0, F.round((bd - cd) * (bd - cd) / (bd + cd), 6)).alias("chi2"),
        F.when(disc > 0, F.round(corr * corr / (bd + cd), 6)).alias(
            "chi2_corrected"
        ),
    )


def jensen_shannon(df: DataFrame, key_col: str, side_col: str) -> DataFrame:
    """Jensen-Shannon divergence between the two sides' categorical
    distributions — one row (k, n_a, n_b, jsd_nats, jsd_bits). The
    symmetric, bounded (≤ ln 2) drift metric for "did the event-type /
    source / predicate mix shift between cohorts": unlike KL it never
    blows up on a category one side lacks, unlike TVD it weights
    log-ratio surprise, and √JSD is a metric. side TRUE rows form
    distribution q, FALSE rows p.

    Per-key term 0.5·p·ln(p/m) + 0.5·q·ln(q/m) (m = (p+q)/2; a zero
    side contributes zero by the x·ln x limit) is computed as ONE fixed
    double sequence from exact count ratios, NANO-rounded once, summed
    exactly; jsd_bits divides the same exact nano sum by ln 2.

    Scale: one hash aggregate on the category key + a broadcast
    single-row totals join; terms live on |categories| rows.
    """
    q = df.filter(F.col(key_col).isNotNull() & F.col(side_col).isNotNull()).select(
        F.col(key_col).alias("key"),
        F.col(side_col).cast("boolean").cast("int").alias("s"),
    )
    per_k = q.groupBy("key").agg(
        F.sum(1 - F.col("s")).cast("long").alias("a"),
        F.sum("s").cast("long").alias("b"),
    )
    tot = per_k.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("a").cast("long").alias("n_a"),
        F.sum("b").cast("long").alias("n_b"),
    )
    j = per_k.crossJoin(F.broadcast(tot))
    # empty-side guard: 0/0 would poison m with NaN (ANSI long-cast abort)
    # even though the output is NULLed; the result is gated on ok anyway
    p = F.when(
        F.col("n_a") > 0, F.col("a").cast("double") / F.col("n_a").cast("double")
    ).otherwise(F.lit(0.0))
    qq = F.when(
        F.col("n_b") > 0, F.col("b").cast("double") / F.col("n_b").cast("double")
    ).otherwise(F.lit(0.0))
    m = (p + qq) / F.lit(2.0)
    term = F.when(F.col("a") > 0, F.lit(0.5) * p * F.log(p / m)).otherwise(
        F.lit(0.0)
    ) + F.when(F.col("b") > 0, F.lit(0.5) * qq * F.log(qq / m)).otherwise(F.lit(0.0))
    term_nano = F.round(term * F.lit(1_000_000_000.0), 0).cast("long")
    s = j.groupBy("k", "n_a", "n_b").agg(F.sum(term_nano).cast("long").alias("_tn"))
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    nats = F.col("_tn").cast("double") / F.lit(1_000_000_000.0)
    return s.select(
        "k",
        "n_a",
        "n_b",
        F.when(ok, F.round(nats, 6)).alias("jsd_nats"),
        F.when(ok, F.round(nats / F.log(F.lit(2.0)), 6)).alias("jsd_bits"),
    )


def friedman(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    value_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Friedman test — the within-block k-treatment rank test (the
    repeated-measures kruskal_wallis): one row (n_blocks, k, dof, q,
    q_tie_corrected). "Do the k variants rank consistently differently
    across users/documents" where between-block level differences would
    drown a pooled test: each block is ranked internally, so a user who
    clicks 10× more than another contributes exactly the same rank
    information.

    Construction: the cell observation is the block×treatment mean on
    the micro grid (exact Σ/count, ONE division — identical doubles in
    both engines); only COMPLETE blocks (all k treatments present)
    enter, per the test's definition. Within-block midranks come from
    the doubled-rank grid per block (k rows each); rank sums per
    treatment accumulate as exact wide integers, and
    Q = 3·ΣR2_j²/(n·k·(k+1)) − 3·n·(k+1) is one fixed double sequence.
    Tie correction C = 1 − Σ(t³−t)/(n·k·(k²−1)) on exact integers;
    C ≤ 0 (all cells tied) → NULL q_tie_corrected.

    Scale: one cell aggregate (hash, partial), per-block windows over k
    rows, one treatment aggregate — blocks never pair, raw rows never
    sort.
    """
    cells = (
        df.filter(
            F.col(block_col).isNotNull()
            & F.col(treatment_col).isNotNull()
            & F.col(value_col).isNotNull()
        )
        .groupBy(
            F.col(block_col).alias("blk"), F.col(treatment_col).alias("trt")
        )
        .agg(
            F.sum(_quant(F.col(value_col), scale)).cast(_DEC).alias("_sm"),
            F.count(F.lit(1)).cast("long").alias("_cn"),
        )
        .select(
            "blk",
            "trt",
            (F.col("_sm").cast("double") / F.col("_cn").cast("double")).alias("v"),
        )
    )
    k_row = cells.agg(F.countDistinct("trt").cast("long").alias("k"))
    complete = (
        cells.groupBy("blk")
        .agg(F.count(F.lit(1)).cast("long").alias("_kb"))
        .crossJoin(F.broadcast(k_row))
        .filter(F.col("_kb") == F.col("k"))
        .select("blk")
    )
    cc = cells.join(complete, "blk")
    per_bv = cc.groupBy("blk", "v").agg(F.count(F.lit(1)).cast("long").alias("t"))
    wb = Window.partitionBy("blk").orderBy("v")
    ranked = per_bv.select(
        "blk",
        "v",
        "t",
        (
            2 * (F.sum("t").over(wb.rowsBetween(Window.unboundedPreceding, 0)) - F.col("t"))
            + F.col("t")
            + 1
        ).cast("long").alias("r2"),
    )
    per_trt = (
        cc.join(ranked.select("blk", "v", "r2"), ["blk", "v"])
        .groupBy("trt")
        .agg(F.sum(F.col("r2").cast(_DEC)).alias("r2_j"))
    )
    ties = per_bv.agg(
        F.sum(
            F.col("t").cast(_DEC) * F.col("t").cast(_DEC) * F.col("t").cast(_DEC)
            - F.col("t").cast(_DEC)
        ).alias("ties_t")
    )
    n_row = complete.agg(F.count(F.lit(1)).cast("long").alias("n_blocks"))
    folded = per_trt.agg(
        F.sum(F.col("r2_j") * F.col("r2_j")).alias("_sr2")
    ).crossJoin(F.broadcast(k_row)).crossJoin(F.broadcast(n_row)).crossJoin(
        F.broadcast(ties)
    )
    nd = F.col("n_blocks").cast("double")
    kd = F.col("k").cast("double")
    q_stat = F.lit(3.0) * F.col("_sr2").cast("double") / (
        nd * kd * (kd + F.lit(1.0))
    ) - F.lit(3.0) * nd * (kd + F.lit(1.0))
    c = F.lit(1.0) - F.col("ties_t").cast("double") / (
        nd * kd * (kd * kd - F.lit(1.0))
    )
    ok = (F.col("n_blocks") > 0) & (F.col("k") >= 2)
    return folded.select(
        "n_blocks",
        "k",
        (F.col("k") - 1).cast("long").alias("dof"),
        F.when(ok, F.round(q_stat, 6)).alias("q"),
        F.when(ok & (c > 0), F.round(q_stat / c, 6)).alias("q_tie_corrected"),
    )


def jonckheere_terpstra(
    df: DataFrame,
    value_col: str,
    group_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Jonckheere-Terpstra ordered-alternative test — "does the value
    distribution shift MONOTONICALLY across ordered groups" for
    continuous outcomes (the dose-response companion to
    cochran_armitage, which handles proportions; kruskal_wallis spends
    k−1 dof on ANY difference, this spends one on the ordering): one
    row (n, k, j, e_j, z). J = Σ_{g<h} U_gh with midrank ½-credit for
    cross-group ties; z uses the Hollander-Wolfe tie-corrected null
    mean/variance.

    Exactness: everything before the final z is integer arithmetic —
    2J accumulates per (grid value, higher group) as
    Σ t_hv·(2·cum_g(<v) + t_gv) in exact wide integers over the dense
    (distinct value × group) grid; E(J) = (N² − Σn_g²)/4 and the three
    tie-corrected variance terms are exact integer folds; ONE double
    sequence with one sqrt at the end. Degenerate (< 2 groups, zero
    variance) → NULL z.

    Scale: the dense grid is |distinct values| × k rows (k = #groups —
    single digits); the pair expansion is grid × k², still grid-bounded.
    Raw rows never sort and never pair.
    """
    q = df.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        F.col(group_col).cast("long").alias("g"),
        _quant(F.col(value_col), scale).alias("qv"),
    )
    per_vg = q.groupBy("qv", "g").agg(F.count(F.lit(1)).cast("long").alias("t"))
    grid = per_vg.select("qv").distinct()
    groups = per_vg.select("g").distinct()
    dense = (
        grid.crossJoin(F.broadcast(groups))
        .join(per_vg, ["qv", "g"], "left")
        .select("qv", "g", F.coalesce(F.col("t"), F.lit(0)).alias("t"))
    )
    wg = Window.partitionBy("g").orderBy("qv")
    cum = dense.select(
        "qv",
        "g",
        "t",
        (
            F.sum("t").over(wg.rowsBetween(Window.unboundedPreceding, 0)) - F.col("t")
        ).cast("long").alias("cum_lt"),
    )
    h_side = per_vg.select(
        F.col("qv").alias("qv_h"), F.col("g").alias("h"), F.col("t").alias("t_h")
    )
    pairs = h_side.join(
        cum.select(
            F.col("qv").alias("qv_g"), F.col("g"), "cum_lt",
            F.col("t").alias("t_g"),
        ),
        (F.col("qv_h") == F.col("qv_g")) & (F.col("g") < F.col("h")),
    )
    s2j = pairs.agg(
        F.sum(
            F.col("t_h").cast(_DEC)
            * (F.lit(2).cast(_DEC) * F.col("cum_lt").cast(_DEC) + F.col("t_g").cast(_DEC))
        ).alias("_s2j")
    )
    per_g = per_vg.groupBy("g").agg(F.sum("t").cast("long").alias("n_g"))
    gd = F.col("n_g").cast(_DEC)
    g_tot = per_g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n"),
        F.sum(gd * gd).alias("_sn2"),
        F.sum(gd * (gd - 1) * (F.lit(2).cast(_DEC) * gd + 5)).alias("_g1"),
        F.sum(gd * (gd - 1) * (gd - 2)).alias("_g2"),
        F.sum(gd * (gd - 1)).alias("_g3"),
    )
    per_v = per_vg.groupBy("qv").agg(F.sum("t").cast("long").alias("tv"))
    td = F.col("tv").cast(_DEC)
    t_tot = per_v.agg(
        F.sum(td * (td - 1) * (F.lit(2).cast(_DEC) * td + 5)).alias("_t1"),
        F.sum(td * (td - 1) * (td - 2)).alias("_t2"),
        F.sum(td * (td - 1)).alias("_t3"),
    )
    out = (
        s2j.crossJoin(F.broadcast(g_tot)).crossJoin(F.broadcast(t_tot))
    )
    nd = F.col("n").cast("double")
    nD = F.col("n").cast(_DEC)
    j_stat = F.col("_s2j").cast("double") / F.lit(2.0)
    e_j = (nD * nD - F.col("_sn2")).cast("double") / F.lit(4.0)
    v1 = (
        nD * (nD - 1) * (F.lit(2).cast(_DEC) * nD + 5) - F.col("_g1") - F.col("_t1")
    ).cast("double") / F.lit(72.0)
    v2 = (F.col("_g2") * F.col("_t2")).cast("double") / (
        F.lit(36.0) * nd * (nd - F.lit(1.0)) * (nd - F.lit(2.0))
    )
    v3 = (F.col("_g3") * F.col("_t3")).cast("double") / (
        F.lit(8.0) * nd * (nd - F.lit(1.0))
    )
    var = v1 + v2 + v3
    ok = (F.col("k") >= 2) & (F.col("n") >= 3)
    return out.select(
        "n",
        "k",
        F.round(j_stat, 6).alias("j"),
        F.round(e_j, 6).alias("e_j"),
        F.when(ok & (var > 0), F.round((j_stat - e_j) / F.sqrt(var), 6)).alias("z"),
    )


def capture_recapture(df: DataFrame, key_col: str, side_col: str) -> DataFrame:
    """Chapman capture-recapture population estimate — "how many
    distinct keys exist that NEITHER sample saw": one row (n1, n2, m,
    n_seen, chapman, se). Treat the two sides as independent captures
    of the same population; the overlap m calibrates completeness.
    The KG/corpus-coverage question (how many entities/users/domains
    are we missing) that raw distinct counts can't answer.

    chapman = (n1+1)(n2+1)/(m+1) − 1 (bias-corrected Lincoln-Petersen,
    finite even at m=0) and its standard error from the exact-integer
    variance (n1+1)(n2+1)(n1−m)(n2−m)/((m+1)²(m+2)) — every factor an
    exact long, ONE division + one sqrt.

    Scale: one hash aggregate on the key (map-side partials), one
    single-row fold.
    """
    q = df.filter(F.col(key_col).isNotNull() & F.col(side_col).isNotNull()).select(
        F.col(key_col).alias("key"),
        F.col(side_col).cast("boolean").cast("int").alias("s"),
    )
    per_k = q.groupBy("key").agg(
        F.max(1 - F.col("s")).cast("int").alias("in1"),
        F.max("s").cast("int").alias("in2"),
    )
    t = per_k.agg(
        F.sum("in1").cast("long").alias("n1"),
        F.sum("in2").cast("long").alias("n2"),
        F.sum(F.col("in1") * F.col("in2")).cast("long").alias("m"),
        F.count(F.lit(1)).cast("long").alias("n_seen"),
    )
    n1 = F.col("n1").cast(_DEC)
    n2 = F.col("n2").cast(_DEC)
    m = F.col("m").cast(_DEC)
    est = ((n1 + 1) * (n2 + 1)).cast("double") / (
        F.col("m").cast("double") + F.lit(1.0)
    ) - F.lit(1.0)
    var = ((n1 + 1) * (n2 + 1) * (n1 - m) * (n2 - m)).cast("double") / (
        (F.col("m").cast("double") + F.lit(1.0))
        * (F.col("m").cast("double") + F.lit(1.0))
        * (F.col("m").cast("double") + F.lit(2.0))
    )
    return t.select(
        "n1",
        "n2",
        "m",
        "n_seen",
        F.round(est, 6).alias("chapman"),
        F.when(var > 0, F.round(F.sqrt(var), 6)).alias("se"),
    )


def cochran_q(
    df: DataFrame, block_col: str, treatment_col: str, success_col: str
) -> DataFrame:
    """Cochran's Q — the BINARY within-block k-treatment test (the
    k-sample McNemar / binary Friedman): one row (n_blocks, k, dof, q).
    "Do the k gates/variants fire at different rates on the SAME items"
    — pairing within block removes the item-difficulty confound that a
    pooled prop_ztest per pair would drown in.

    Q = (k−1)·(k·ΣC_j² − N²) / (k·N − ΣR_i²) with C_j = per-treatment
    successes, R_i = per-block successes, N = ΣR — EXACT integer
    arithmetic end to end, ONE division. Only COMPLETE blocks (all k
    treatments observed) enter; blocks with all-0 or all-1 rows carry
    no information and the denominator drops them naturally —
    denominator 0 (every block degenerate) → NULL q.

    Scale: one cell aggregate (hash, partials), two tiny folds; blocks
    never pair.
    """
    cells = (
        df.filter(
            F.col(block_col).isNotNull()
            & F.col(treatment_col).isNotNull()
            & F.col(success_col).isNotNull()
        )
        .groupBy(F.col(block_col).alias("blk"), F.col(treatment_col).alias("trt"))
        .agg(
            F.max(F.col(success_col).cast("boolean").cast("int")).alias("x")
        )
    )
    k_row = cells.agg(F.countDistinct("trt").cast("long").alias("k"))
    per_blk = cells.groupBy("blk").agg(
        F.count(F.lit(1)).cast("long").alias("_kb"),
        F.sum("x").cast("long").alias("r"),
    )
    complete = (
        per_blk.crossJoin(F.broadcast(k_row))
        .filter(F.col("_kb") == F.col("k"))
        .select("blk", "r")
    )
    rd = F.col("r").cast(_DEC)
    blk_tot = complete.agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum("r").cast("long").alias("_nn"),
        F.sum(rd * rd).alias("_sr2"),
    )
    per_trt = (
        cells.join(complete.select("blk"), "blk")
        .groupBy("trt")
        .agg(F.sum("x").cast("long").alias("c"))
    )
    cd = F.col("c").cast(_DEC)
    trt_tot = per_trt.agg(F.sum(cd * cd).alias("_sc2"))
    out = blk_tot.crossJoin(F.broadcast(trt_tot)).crossJoin(F.broadcast(k_row))
    kD = F.col("k").cast(_DEC)
    nD = F.col("_nn").cast(_DEC)
    num = (kD - 1) * (kD * F.col("_sc2") - nD * nD)
    den = kD * nD - F.col("_sr2")
    return out.select(
        "n_blocks",
        "k",
        (F.col("k") - 1).cast("long").alias("dof"),
        F.when(
            den.cast("double") > 0,
            F.round(num.cast("double") / den.cast("double"), 6),
        ).alias("q"),
    )


def bowker_symmetry(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Bowker symmetry test — McNemar generalized to a k×k contingency
    table: one row (n, k_pairs, dof, q). "Are the off-diagonal flows
    balanced" — for transition matrices (is A→B as common as B→A),
    label-revision audits (old label vs new label), or dual-annotator
    matrices. chi2_independence can't see this: a perfectly symmetric
    matrix can still be strongly associated.

    Q = Σ_{i<j} (n_ij − n_ji)² / (n_ij + n_ji) over unordered cell pairs
    with traffic; dof = #such pairs. Each per-pair term is an exact-
    integer ratio MICRO-rounded once and summed exactly (the
    chi2_independence recipe), so partition order can never wobble Q.
    Diagonal cells (a = b) are ignored by definition. No off-diagonal
    traffic at all → NULL q, dof 0.

    Scale: one (a,b) cell aggregate with partials, one canonical-pair
    aggregate on |cells| rows, one fold.
    """
    q = df.filter(F.col(a_col).isNotNull() & F.col(b_col).isNotNull()).select(
        F.col(a_col).cast("string").alias("a"),
        F.col(b_col).cast("string").alias("b"),
    )
    cells = q.groupBy("a", "b").agg(F.count(F.lit(1)).cast("long").alias("c"))
    off = cells.filter(F.col("a") != F.col("b"))
    canon = off.select(
        F.least("a", "b").alias("lo"),
        F.greatest("a", "b").alias("hi"),
        F.when(F.col("a") < F.col("b"), F.col("c")).otherwise(F.lit(0)).alias("fwd"),
        F.when(F.col("a") > F.col("b"), F.col("c")).otherwise(F.lit(0)).alias("rev"),
    ).groupBy("lo", "hi").agg(
        F.sum("fwd").cast("long").alias("fwd"),
        F.sum("rev").cast("long").alias("rev"),
    )
    fd = F.col("fwd").cast("double")
    rd = F.col("rev").cast("double")
    term_micro = F.round(
        (fd - rd) * (fd - rd) / (fd + rd) * F.lit(1_000_000.0), 0
    ).cast("long")
    tot = q.agg(F.count(F.lit(1)).cast("long").alias("n"))
    folded = canon.agg(
        F.count(F.lit(1)).cast("long").alias("k_pairs"),
        F.sum(term_micro).cast("long").alias("_qm"),
    )
    out = folded.crossJoin(F.broadcast(tot))
    return out.select(
        "n",
        F.coalesce(F.col("k_pairs"), F.lit(0)).alias("k_pairs"),
        F.coalesce(F.col("k_pairs"), F.lit(0)).alias("dof"),
        F.when(
            F.col("k_pairs") > 0,
            F.round(F.col("_qm").cast("double") / F.lit(1_000_000.0), 6),
        ).alias("q"),
    )


def mood_median(
    df: DataFrame, value_col: str, group_col: str, scale: int = 1_000_000
) -> DataFrame:
    """Mood's median test — the ROBUST k-sample location gate: one row
    (n, k, grand_median, n_above, chi2, dof). Dichotomizes every value
    at the pooled grand median and chi2-tests the k×2 (group × side)
    table — outlier-immune where anova_f is not, and cheaper than
    kruskal_wallis when only a location shift matters.

    The grand median is the EXACT lower median on the quantized grid
    (smallest value whose cumulative count reaches ceil(n/2)); per-group
    above/≤ splits are exact longs; each group's two chi2 terms
    (n·O − R·C)²/(n·R·C) are a fixed IEEE double sequence micro-rounded
    ONCE and summed exactly (the chi2_independence recipe). A degenerate
    split (every value on one side of the median) reports NULL chi2.

    Scale: one (group, value) cell aggregate with partials; the ordered
    cumulative runs on the |grid| rows, not |data| rows; the median is a
    broadcast single-row join.
    """
    q = df.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(F.col(group_col).alias("g"), _quant(F.col(value_col), scale).alias("qv"))
    cells = q.groupBy("g", "qv").agg(F.count(F.lit(1)).cast("long").alias("t"))
    per_v = cells.groupBy("qv").agg(F.sum("t").cast("long").alias("tv"))
    w = Window.orderBy("qv")
    cum = per_v.select(
        "qv",
        F.sum("tv").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("tv").over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("n"),
    )
    med = (
        cum.filter(F.col("cum") * 2 >= F.col("n"))
        .groupBy("n")
        .agg(F.min("qv").alias("med"))
    )
    per_g = (
        cells.crossJoin(F.broadcast(med))
        .groupBy("g", "n", "med")
        .agg(
            F.sum(F.when(F.col("qv") > F.col("med"), F.col("t")).otherwise(F.lit(0)))
            .cast("long")
            .alias("a"),
            F.sum(F.when(F.col("qv") <= F.col("med"), F.col("t")).otherwise(F.lit(0)))
            .cast("long")
            .alias("l"),
        )
    )
    col_tot = per_g.groupBy("n", "med").agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("a").cast("long").alias("ca"),
        F.sum("l").cast("long").alias("cl"),
    )
    j = per_g.join(F.broadcast(col_tot), ["n", "med"])
    nd = F.col("n").cast("double")
    rg = (F.col("a") + F.col("l")).cast("double")
    cad = F.col("ca").cast("double")
    cld = F.col("cl").cast("double")
    dev_a = nd * F.col("a").cast("double") - rg * cad
    dev_l = nd * F.col("l").cast("double") - rg * cld
    term_micro = (
        F.round(dev_a * dev_a / (nd * rg * cad) * F.lit(1_000_000.0), 0)
        + F.round(dev_l * dev_l / (nd * rg * cld) * F.lit(1_000_000.0), 0)
    ).cast("long")
    ok = (F.col("ca") > 0) & (F.col("cl") > 0)
    summed = j.groupBy("n", "med", "k", "ca", "cl").agg(
        F.sum(F.when(ok, term_micro)).cast("long").alias("_cm")
    )
    return summed.select(
        "n",
        "k",
        F.round(F.col("med").cast("double") / F.lit(float(scale)), 6).alias(
            "grand_median"
        ),
        F.col("ca").alias("n_above"),
        (F.col("k") - 1).cast("long").alias("dof"),
        F.when(
            (F.col("ca") > 0) & (F.col("cl") > 0) & (F.col("k") >= 2),
            F.round(F.col("_cm").cast("double") / F.lit(1_000_000.0), 6),
        ).alias("chi2"),
    )


def fleiss_kappa(
    df: DataFrame, item_col: str, rater_col: str, category_col: str
) -> DataFrame:
    """Fleiss' kappa — chance-corrected agreement among r ≥ 2 raters
    assigning categories to shared items (the k-rater generalization of
    eval_metrics.cohens_kappa): one row (n_items, r, k, p_bar, p_e,
    kappa). The training-data gate for "do my quality heuristics /
    annotators actually agree beyond what their marginals force".

    Contract: one rating per (item, rater). r = the GLOBAL number of
    distinct raters; only items rated by all r raters enter (the
    complete-blocks rule, as cochran_q). With S = ΣᵢΣⱼ n_ij²,
    C = Σⱼ(Σᵢ n_ij)², P̄ = (S − Nr)/(Nr(r−1)) and P̄ₑ = C/(Nr)²:

        kappa = ((S − Nr)·(Nr)² − Nr(r−1)·C) / (Nr(r−1)·((Nr)² − C))

    — numerator and denominator EXACT decimal(38,0) integers (safe to
    ~10¹² ratings), ONE double division at the end. P̄ₑ = 1 (a single
    category ever used) → NULL kappa.

    Scale: one (item, category) cell aggregate, one per-item fold, two
    tiny broadcast joins; items never pair with items.
    """
    q = df.filter(
        F.col(item_col).isNotNull()
        & F.col(rater_col).isNotNull()
        & F.col(category_col).isNotNull()
    ).select(
        F.col(item_col).alias("item"),
        F.col(rater_col).alias("rater"),
        F.col(category_col).cast("string").alias("cat"),
    )
    r_row = q.agg(F.countDistinct("rater").cast("long").alias("r"))
    ij = q.groupBy("item", "cat").agg(F.count(F.lit(1)).cast("long").alias("c"))
    cd = F.col("c").cast(_DEC)
    per_item = ij.groupBy("item").agg(
        F.sum("c").cast("long").alias("m"),
        F.sum(cd * cd).alias("s2"),
    )
    complete = (
        per_item.crossJoin(F.broadcast(r_row))
        .filter(F.col("m") == F.col("r"))
        .select("item", "s2")
    )
    items_tot = complete.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("s2").alias("_s"),
    )
    per_cat = (
        ij.join(complete.select("item"), "item")
        .groupBy("cat")
        .agg(F.sum("c").cast("long").alias("cj"))
    )
    cjd = F.col("cj").cast(_DEC)
    cat_tot = per_cat.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(cjd * cjd).alias("_c"),
    )
    out = items_tot.crossJoin(F.broadcast(cat_tot)).crossJoin(F.broadcast(r_row))
    nr = F.col("n_items").cast(_DEC) * F.col("r").cast(_DEC)
    rm1 = (F.col("r") - 1).cast(_DEC)
    s_ = F.col("_s")
    c_ = F.col("_c")
    p_bar = F.when(
        (F.col("n_items") > 0) & (F.col("r") >= 2),
        (s_ - nr).cast("double") / (nr * rm1).cast("double"),
    )
    p_e = F.when(
        F.col("n_items") > 0, c_.cast("double") / (nr * nr).cast("double")
    )
    num = (s_ - nr) * nr * nr - nr * rm1 * c_
    den = nr * rm1 * (nr * nr - c_)
    return out.select(
        "n_items",
        "r",
        "k",
        F.round(p_bar, 6).alias("p_bar"),
        F.round(p_e, 6).alias("p_e"),
        F.when(
            den.cast("double") > 0,
            F.round(num.cast("double") / den.cast("double"), 6),
        ).alias("kappa"),
    )


def hellinger_distance(df: DataFrame, key_col: str, side_col: str) -> DataFrame:
    """Hellinger distance between the two sides' categorical
    distributions — one row (k, n_a, n_b, bc, hellinger). The bounded
    [0,1] TRUE-METRIC drift companion to jensen_shannon (which weights
    log-surprise) and TVD (which ignores mass geometry): H² = 1 − BC
    with BC = Σⱼ √(pⱼ·qⱼ) the Bhattacharyya coefficient. side TRUE rows
    form q, FALSE rows p.

    Float discipline: per-key √(aⱼ·bⱼ)/√(n_a·n_b) is a fixed IEEE
    sequence (multiply, two sqrts, divide — sqrt is correctly rounded in
    every IEEE engine), NANO-rounded once and summed exactly; the final
    H = √max(0, 1 − BC) clamps the sub-nano negative that exact-nano BC
    can leave. Either side empty → NULL bc/hellinger.

    Scale: one hash aggregate on the category key + a broadcast
    single-row totals join; terms live on |categories| rows.
    """
    q = df.filter(F.col(key_col).isNotNull() & F.col(side_col).isNotNull()).select(
        F.col(key_col).alias("key"),
        F.col(side_col).cast("boolean").cast("int").alias("s"),
    )
    per_k = q.groupBy("key").agg(
        F.sum(1 - F.col("s")).cast("long").alias("a"),
        F.sum("s").cast("long").alias("b"),
    )
    tot = per_k.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("a").cast("long").alias("n_a"),
        F.sum("b").cast("long").alias("n_b"),
    )
    j = per_k.crossJoin(F.broadcast(tot))
    ok_tot = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    term = F.when(
        ok_tot,
        F.sqrt(F.col("a").cast("double") * F.col("b").cast("double"))
        / F.sqrt(F.col("n_a").cast("double") * F.col("n_b").cast("double")),
    ).otherwise(F.lit(0.0))
    term_nano = F.round(term * F.lit(1_000_000_000.0), 0).cast("long")
    s = j.groupBy("k", "n_a", "n_b").agg(F.sum(term_nano).cast("long").alias("_bn"))
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    bc = F.col("_bn").cast("double") / F.lit(1_000_000_000.0)
    return s.select(
        "k",
        "n_a",
        "n_b",
        F.when(ok, F.round(bc, 6)).alias("bc"),
        F.when(ok, F.round(F.sqrt(F.greatest(F.lit(0.0), F.lit(1.0) - bc)), 6)).alias(
            "hellinger"
        ),
    )


def cliffs_delta(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Cliff's delta + Vargha-Delaney A — the rank-based effect sizes
    that answer "HOW MUCH did the filter shift the distribution" where
    mann_whitney_u only answers "did it": one row
    (n_a, n_b, u_a, delta, vda_a, magnitude). delta = (#(a>b) − #(a<b))
    / (n_a·n_b) with half-credit ties; vda_a = P(a>b) + ½P(a=b);
    magnitude is the Romano banding (|δ| < .147 negligible, < .33 small,
    < .474 medium, else large), applied to the ROUNDED delta so any two
    engines band identically.

    Same no-pairwise-join trick as mann_whitney_u: midranks on the
    DISTINCT quantized-value grid (doubled, exact integers), U from the
    rank sum, so cost is one grid aggregate — never the O(n_a·n_b)
    textbook pair count.
    """
    qa = df_a.filter(F.col(value_col).isNotNull()).select(
        _quant(F.col(value_col), scale).alias("qv"), F.lit(1).alias("is_a")
    )
    qb = df_b.filter(F.col(value_col).isNotNull()).select(
        _quant(F.col(value_col), scale).alias("qv"), F.lit(0).alias("is_a")
    )
    pooled = qa.unionByName(qb)
    per_v = pooled.groupBy("qv").agg(
        F.count(F.lit(1)).cast("long").alias("t"),
        F.sum("is_a").cast("long").alias("t_a"),
    )
    w = Window.orderBy("qv")
    ranked = per_v.select(
        "t",
        "t_a",
        (
            2 * (F.sum("t").over(w.rowsBetween(Window.unboundedPreceding, 0)) - F.col("t"))
            + F.col("t")
            + 1
        ).cast("long").alias("r2"),
    )
    agg = ranked.agg(
        F.sum("t_a").cast("long").alias("n_a"),
        (F.sum("t") - F.sum("t_a")).cast("long").alias("n_b"),
        F.sum(F.col("t_a").cast(_DEC) * F.col("r2").cast(_DEC)).alias("r2_a"),
    )
    na, nb = F.col("n_a"), F.col("n_b")
    # doubled U_a = doubled rank sum − n_a(n_a+1); exact integers
    u_a2 = F.col("r2_a") - (na * (na + 1)).cast(_DEC)
    prod = (na.cast(_DEC) * nb.cast(_DEC))
    # delta = (2·U_a − n_a·n_b)/(n_a·n_b): exact integer num/den, ONE division
    delta = F.round((u_a2 - prod).cast("double") / prod.cast("double"), 6)
    vda = F.round(u_a2.cast("double") / (F.lit(2.0) * prod.cast("double")), 6)
    adelta = F.abs(delta)
    return agg.select(
        na,
        nb,
        (u_a2.cast("double") / F.lit(2.0)).alias("u_a"),
        delta.alias("delta"),
        vda.alias("vda_a"),
        F.when(adelta < 0.147, F.lit("negligible"))
        .when(adelta < 0.33, F.lit("small"))
        .when(adelta < 0.474, F.lit("medium"))
        .otherwise(F.lit("large"))
        .alias("magnitude"),
    )


def cohen_kappa(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Cohen's kappa — chance-corrected agreement between TWO raters
    (fleiss_kappa generalizes to k, but the 2-rater crosstab identity is
    exact and cheaper): one row (n, k_cats, agree, po, pe, kappa) from
    rows carrying both ratings. kappa = (n·agree − Σ_k r_k·c_k) /
    (n² − Σ_k r_k·c_k) — exact wide integers, ONE division, so the
    distributed sum order can't wobble it. Rows with either rating NULL
    drop; pe = 1 exactly (a constant-category degenerate pair) reports
    NULL kappa.

    One (a,b) cell aggregate + two marginal aggregates joined on the
    category key — all hash, marginals broadcast.
    """
    base = df.filter(F.col(a_col).isNotNull() & F.col(b_col).isNotNull()).select(
        F.col(a_col).alias("a"), F.col(b_col).alias("b")
    )
    ra = base.groupBy("a").agg(F.count(F.lit(1)).cast("long").alias("rk"))
    cb = base.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("ck"))
    rc = (
        ra.join(cb, ra["a"] == cb["b"], "inner")
        .agg(F.sum(F.col("rk").cast(_DEC) * F.col("ck").cast(_DEC)).alias("src"))
    )
    tot = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("a") == F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("agree"),
        F.countDistinct("a").cast("long").alias("k_a"),
        F.countDistinct("b").cast("long").alias("k_b"),
    )
    j = tot.crossJoin(F.broadcast(rc)).select(
        "n",
        "agree",
        F.greatest(F.col("k_a"), F.col("k_b")).alias("k_cats"),
        F.coalesce(F.col("src"), F.lit(0).cast(_DEC)).alias("src"),
    )
    n_dec = F.col("n").cast(_DEC)
    num = n_dec * F.col("agree").cast(_DEC) - F.col("src")
    den = n_dec * n_dec - F.col("src")
    return j.select(
        "n",
        "k_cats",
        "agree",
        F.round(F.col("agree").cast("double") / F.col("n").cast("double"), 6).alias(
            "po"
        ),
        F.round(
            F.col("src").cast("double")
            / (F.col("n").cast("double") * F.col("n").cast("double")),
            6,
        ).alias("pe"),
        F.when(
            den.cast("double") > 0,
            F.round(num.cast("double") / den.cast("double"), 6),
        ).alias("kappa"),
    )


def ordinal_concordance(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Goodman-Kruskal gamma + Somers' D over two ORDINAL integer
    columns — "does a higher text-length band imply a higher word-count
    band": one row (n, concordant, discordant, gamma, somers_ba,
    somers_ab). gamma = (C−D)/(C+D) ignores ties; somers_ba =
    (C−D)/(pairs untied on a) is the asymmetric predictive form
    (b given a); somers_ab the reverse. All counts are exact wide
    integers (pair counts ride doubled so /2 never truncates); each
    statistic is ONE division.

    The pair count runs on the k_a×k_b CROSSTAB, not the data: cells
    self-join on (a₂ > a₁), so cost is O(cells²) with cells broadcast —
    never the O(n²) textbook sweep. NULLs drop.
    """
    base = df.filter(F.col(a_col).isNotNull() & F.col(b_col).isNotNull()).select(
        F.col(a_col).cast("long").alias("a"), F.col(b_col).cast("long").alias("b")
    )
    cells = base.groupBy("a", "b").agg(F.count(F.lit(1)).cast("long").alias("o"))
    c2 = cells.select(
        F.col("a").alias("a2"), F.col("b").alias("b2"), F.col("o").alias("o2")
    )
    pairs = cells.join(F.broadcast(c2), F.col("a2") > F.col("a"))
    cd = pairs.agg(
        F.sum(
            F.when(
                F.col("b2") > F.col("b"),
                F.col("o").cast(_DEC) * F.col("o2").cast(_DEC),
            ).otherwise(F.lit(0).cast(_DEC))
        ).alias("c_pairs"),
        F.sum(
            F.when(
                F.col("b2") < F.col("b"),
                F.col("o").cast(_DEC) * F.col("o2").cast(_DEC),
            ).otherwise(F.lit(0).cast(_DEC))
        ).alias("d_pairs"),
    )
    ra = base.groupBy("a").agg(F.count(F.lit(1)).cast("long").alias("rk"))
    cb = base.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("ck"))
    # doubled tie-pair counts: Σ r(r−1) and n(n−1) stay integers
    ta = ra.agg(
        F.sum(F.col("rk").cast(_DEC) * (F.col("rk") - 1).cast(_DEC)).alias("ta2")
    )
    tb = cb.agg(
        F.sum(F.col("ck").cast(_DEC) * (F.col("ck") - 1).cast(_DEC)).alias("tb2")
    )
    tot = base.agg(F.count(F.lit(1)).cast("long").alias("n"))
    j = (
        cd.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ta))
        .crossJoin(F.broadcast(tb))
    )
    c_, d_ = F.col("c_pairs"), F.col("d_pairs")
    n_dec = F.col("n").cast(_DEC)
    t0_2 = n_dec * (n_dec - 1)  # doubled total pairs
    num = (c_ - d_).cast("double")
    den_g = (c_ + d_).cast("double")
    den_ba = (t0_2 - F.col("ta2")).cast("double")  # doubled pairs untied on a
    den_ab = (t0_2 - F.col("tb2")).cast("double")
    return j.select(
        "n",
        c_.cast("long").alias("concordant"),
        d_.cast("long").alias("discordant"),
        F.when(den_g > 0, F.round(num / den_g, 6)).alias("gamma"),
        F.when(den_ba > 0, F.round(F.lit(2.0) * num / den_ba, 6)).alias("somers_ba"),
        F.when(den_ab > 0, F.round(F.lit(2.0) * num / den_ab, 6)).alias("somers_ab"),
    )


def anderson_darling_2s(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Two-sample Anderson-Darling A² (tie-weighted discrete form) —
    the tail-sensitive alternative to ks_2sample (KS sees only the
    biggest CDF gap; A² integrates ALL gaps with 1/(F(1−F)) weighting,
    so distribution drift hiding in the tails trips it first): one row
    (n_a, n_b, a2). A² = (1/(mn))·Σ_v t_v·(N·M_v − B_v·m)²/(B_v(N−B_v))
    over pooled distinct values with B_v < N — the Pettitt (1976)
    midrank form; with no ties it is exactly the classical statistic.

    Numerator and radicand-free denominator are exact wide integers per
    distinct value; each term is micro-rounded ONCE and summed exactly;
    the shared 1/(mn) division happens at the end. Grid-sized ordered
    window (distinct values), never a data-sized sort.
    """
    qa = df_a.filter(F.col(value_col).isNotNull()).select(
        _quant(F.col(value_col), scale).alias("qv"), F.lit(1).alias("is_a")
    )
    qb = df_b.filter(F.col(value_col).isNotNull()).select(
        _quant(F.col(value_col), scale).alias("qv"), F.lit(0).alias("is_a")
    )
    pooled = qa.unionByName(qb)
    per_v = pooled.groupBy("qv").agg(
        F.count(F.lit(1)).cast("long").alias("t"),
        F.sum("is_a").cast("long").alias("t_a"),
    )
    w = Window.orderBy("qv").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_v.select(
        "t",
        F.sum("t").over(w).cast("long").alias("b"),
        F.sum("t_a").over(w).cast("long").alias("mcum"),
    )
    tot = per_v.agg(
        F.sum("t_a").cast("long").alias("n_a"),
        (F.sum("t") - F.sum("t_a")).cast("long").alias("n_b"),
        F.sum("t").cast("long").alias("nn"),
    )
    j = cum.crossJoin(F.broadcast(tot)).filter(F.col("b") < F.col("nn"))
    dev = (
        F.col("nn").cast(_DEC) * F.col("mcum").cast(_DEC)
        - F.col("b").cast(_DEC) * F.col("n_a").cast(_DEC)
    )
    num = F.col("t").cast(_DEC) * dev * dev
    den = F.col("b").cast(_DEC) * (F.col("nn").cast(_DEC) - F.col("b").cast(_DEC))
    term_micro = F.round(
        num.cast("double") / den.cast("double") * F.lit(1_000_000.0), 0
    ).cast("long")
    s = j.groupBy("n_a", "n_b").agg(F.sum(term_micro).cast("long").alias("s_micro"))
    return s.select(
        "n_a",
        "n_b",
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0),
            F.round(
                F.col("s_micro").cast("double")
                / (
                    F.col("n_a").cast("double")
                    * F.col("n_b").cast("double")
                    * F.lit(1_000_000.0)
                ),
                6,
            ),
        ).alias("a2"),
    )


def dunn_posthoc(
    df: DataFrame,
    value_col: str,
    group_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Dunn's post-hoc test — WHICH groups differ once kruskal_wallis
    says "some do": one row per unordered group pair (g1, g2, n1, n2,
    mean_rank_1, mean_rank_2, z), g1 < g2, ordered. z = (R̄₁ − R̄₂) /
    √(V·(1/n₁ + 1/n₂)) with the tie-corrected pooled variance
    V = (N(N+1) − Σ(t³−t)/(N−1))/12.

    Same doubled-midrank grid as kruskal_wallis (exact rank sums as
    wide integers; mean ranks are ONE division each); the pair fan-out
    is a broadcast self-join of the k-row group-stats table — never a
    data-sized pairing. N < 2 or V ≤ 0 reports NULL z.
    """
    q = df.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        F.col(group_col).alias("g"), _quant(F.col(value_col), scale).alias("qv")
    )
    per_vg = q.groupBy("qv", "g").agg(F.count(F.lit(1)).cast("long").alias("t_g"))
    per_v = per_vg.groupBy("qv").agg(F.sum("t_g").cast("long").alias("t"))
    w = Window.orderBy("qv")
    ranked = per_v.select(
        "qv",
        "t",
        (
            2 * (F.sum("t").over(w.rowsBetween(Window.unboundedPreceding, 0)) - F.col("t"))
            + F.col("t")
            + 1
        ).cast("long").alias("r2"),
    )
    per_g = (
        per_vg.join(ranked.select("qv", "r2"), "qv")
        .groupBy("g")
        .agg(
            F.sum("t_g").cast("long").alias("n_g"),
            F.sum(F.col("t_g").cast(_DEC) * F.col("r2").cast(_DEC)).alias("r2_g"),
        )
    )
    tot = ranked.agg(
        F.sum("t").cast("long").alias("n"),
        F.sum(
            F.col("t").cast(_DEC) * F.col("t").cast(_DEC) * F.col("t").cast(_DEC)
            - F.col("t").cast(_DEC)
        ).alias("ties_t"),
    )
    g2 = per_g.select(
        F.col("g").alias("g2"),
        F.col("n_g").alias("n2"),
        F.col("r2_g").alias("r2_2"),
    )
    pairs = (
        per_g.select(
            F.col("g").alias("g1"), F.col("n_g").alias("n1"), F.col("r2_g").alias("r2_1")
        )
        .join(F.broadcast(g2), F.col("g1") < F.col("g2"))
        .crossJoin(F.broadcast(tot))
    )
    nd = F.col("n").cast("double")
    mr1 = F.col("r2_1").cast("double") / (F.lit(2.0) * F.col("n1").cast("double"))
    mr2 = F.col("r2_2").cast("double") / (F.lit(2.0) * F.col("n2").cast("double"))
    v = (
        nd * (nd + 1) - F.col("ties_t").cast("double") / (nd - 1)
    ) / F.lit(12.0)
    se = F.sqrt(
        v
        * (
            F.lit(1.0) / F.col("n1").cast("double")
            + F.lit(1.0) / F.col("n2").cast("double")
        )
    )
    return pairs.select(
        "g1",
        "g2",
        "n1",
        "n2",
        F.round(mr1, 6).alias("mean_rank_1"),
        F.round(mr2, 6).alias("mean_rank_2"),
        F.when((F.col("n") >= 2) & (v > 0), F.round((mr1 - mr2) / se, 6)).alias(
            "z"
        ),
    ).orderBy("g1", "g2")


def page_trend(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    value_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Page's L trend test — "do the k treatments shift MONOTONICALLY
    in their hypothesized order" within blocks (the ordered-alternative
    sharpening of friedman, within-block twin of jonckheere_terpstra):
    one row (n_blocks, k, l_stat, z). Treatments are ordered by their
    natural sort (c_j = 1..k); only blocks containing ALL k treatments
    count. L = Σ_j c_j·R_j over within-block midranks;
    z = (L − n·k(k+1)²/4)/√(n·k²(k+1)(k²−1)/144), the standard normal
    approximation (no tie correction — ties only dilute L).

    Midranks ride doubled (exact longs — rank() and an equal-count
    window inside each block); L accumulates as exact wide integers;
    z is a fixed double sequence with one sqrt. Block windows are
    block-sized; the treatment-order index joins broadcast.
    """
    q = df.filter(
        F.col(block_col).isNotNull()
        & F.col(treatment_col).isNotNull()
        & F.col(value_col).isNotNull()
    ).select(
        F.col(block_col).alias("b"),
        F.col(treatment_col).alias("tr"),
        _quant(F.col(value_col), scale).alias("qv"),
    )
    k_tot = q.select("tr").distinct().agg(F.count(F.lit(1)).cast("long").alias("k"))
    complete = (
        q.groupBy("b")
        .agg(F.countDistinct("tr").cast("long").alias("ntr"), F.count(F.lit(1)).alias("nrow"))
        .crossJoin(F.broadcast(k_tot))
        .filter((F.col("ntr") == F.col("k")) & (F.col("nrow") == F.col("k")))
        .select("b")
    )
    qc = q.join(F.broadcast(complete), "b")
    wb = Window.partitionBy("b").orderBy("qv")
    wtie = Window.partitionBy("b", "qv")
    ranked = qc.select(
        "b",
        "tr",
        (
            2 * (F.rank().over(wb) - 1) + F.count(F.lit(1)).over(wtie) + 1
        ).cast("long").alias("r2"),
    )
    order_idx = (
        q.select("tr")
        .distinct()
        .select(
            "tr",
            F.row_number().over(Window.orderBy("tr")).cast("long").alias("c"),
        )
    )
    l2 = (
        ranked.join(F.broadcast(order_idx), "tr")
        .agg(
            F.sum(F.col("c").cast(_DEC) * F.col("r2").cast(_DEC)).alias("l2"),
            (F.countDistinct("b")).cast("long").alias("n_blocks"),
        )
        .crossJoin(F.broadcast(k_tot))
    )
    nd = F.col("n_blocks").cast("double")
    kd = F.col("k").cast("double")
    mean2 = nd * kd * (kd + 1) * (kd + 1) / F.lit(2.0)
    var = nd * kd * kd * (kd + 1) * (kd * kd - 1) / F.lit(144.0)
    return l2.select(
        "n_blocks",
        "k",
        (F.col("l2").cast("double") / F.lit(2.0)).alias("l_stat"),
        F.when(
            (F.col("n_blocks") > 0) & (var > 0),
            F.round(
                (F.col("l2").cast("double") - mean2) / (F.lit(2.0) * F.sqrt(var)),
                6,
            ),
        ).alias("z"),
    )


def two_by_two(df: DataFrame, exposure_col: str, outcome_col: str) -> DataFrame:
    """2×2 exposure/outcome association — odds ratio + risk ratio with
    Wald 95% CIs, the epidemiology-style gate for "does cohort X hit
    errors more": one row (n, a, b, c, d, odds_ratio, risk_ratio,
    or_ci_lo, or_ci_hi). a = exposed∧outcome, b = exposed∧¬outcome,
    c = unexposed∧outcome, d = unexposed∧¬outcome. OR = ad/bc (exact
    integer numerator/denominator, ONE division); RR = a(c+d)/(c(a+b));
    CI = exp(ln OR ± 1.96·√(1/a+1/b+1/c+1/d)). Any empty cell → NULL
    ratios (no continuity fudge — callers can pre-smooth).

    One hash aggregate; the four cells are exact longs.
    """
    base = df.filter(
        F.col(exposure_col).isNotNull() & F.col(outcome_col).isNotNull()
    ).select(
        F.col(exposure_col).cast("boolean").alias("e"),
        F.col(outcome_col).cast("boolean").alias("o"),
    )
    cell = lambda e, o: F.sum(  # noqa: E731
        ((F.col("e") == e) & (F.col("o") == o)).cast("int")
    ).cast("long")
    agg = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        cell(True, True).alias("a"),
        cell(True, False).alias("b"),
        cell(False, True).alias("c"),
        cell(False, False).alias("d"),
    )
    a, b, c, d = (F.col(x).cast("double") for x in ("a", "b", "c", "d"))
    ok = (F.col("a") > 0) & (F.col("b") > 0) & (F.col("c") > 0) & (F.col("d") > 0)
    or_ = (
        (F.col("a").cast(_DEC) * F.col("d").cast(_DEC)).cast("double")
        / (F.col("b").cast(_DEC) * F.col("c").cast(_DEC)).cast("double")
    )
    rr = (
        (F.col("a").cast(_DEC) * (F.col("c") + F.col("d")).cast(_DEC)).cast("double")
        / (F.col("c").cast(_DEC) * (F.col("a") + F.col("b")).cast(_DEC)).cast("double")
    )
    se = F.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
    return agg.select(
        "n",
        "a",
        "b",
        "c",
        "d",
        F.when(ok, F.round(or_, 6)).alias("odds_ratio"),
        F.when(ok, F.round(rr, 6)).alias("risk_ratio"),
        F.when(ok, F.round(F.exp(F.log(or_) - F.lit(1.959963985) * se), 6)).alias(
            "or_ci_lo"
        ),
        F.when(ok, F.round(F.exp(F.log(or_) + F.lit(1.959963985) * se), 6)).alias(
            "or_ci_hi"
        ),
    )


def grubbs_test(
    df: DataFrame, value_col: str, scale: int = 1_000_000
) -> DataFrame:
    """Grubbs' max-studentized-deviation outlier test — "is the most
    extreme point too extreme for one population": one row
    (n, outlier, g_stat). G = max|x − x̄|/s (sample s, n−1); the argmax
    is decided on the EXACT integer |n·q − Σq| (ties break to the
    smallest value), so two engines always elect the same outlier;
    G itself is one fixed double sequence with one sqrt. n < 3 or zero
    variance reports NULL g_stat (outlier still reported when defined).

    Scale: one moment aggregate, the deviation scan runs on the
    DISTINCT value grid with the moments broadcast — never a second
    data pass.
    """
    q = df.filter(F.col(value_col).isNotNull()).select(
        _quant(F.col(value_col), scale).alias("qv")
    )
    cells = q.groupBy("qv").agg(F.count(F.lit(1)).cast("long").alias("t"))
    mom = cells.agg(
        F.sum("t").cast("long").alias("n"),
        F.sum(F.col("qv").cast(_DEC) * F.col("t").cast(_DEC)).alias("sx"),
        F.sum(
            F.col("qv").cast(_DEC) * F.col("qv").cast(_DEC) * F.col("t").cast(_DEC)
        ).alias("sxx"),
    )
    devs = cells.crossJoin(F.broadcast(mom)).select(
        "qv",
        "n",
        "sx",
        "sxx",
        F.abs(F.col("n").cast(_DEC) * F.col("qv").cast(_DEC) - F.col("sx")).alias(
            "adev"
        ),
    )
    amax = devs.groupBy("n", "sx", "sxx").agg(F.max("adev").alias("amax"))
    winner = (
        devs.join(F.broadcast(amax.select("amax")), devs["adev"] == F.col("amax"))
        .groupBy("n", "sx", "sxx", "amax")
        .agg(F.min("qv").alias("q_out"))
    )
    nd = F.col("n").cast("double")
    d = (
        F.col("n").cast(_DEC) * F.col("sxx") - F.col("sx") * F.col("sx")
    ).cast("double")
    g = F.col("amax").cast("double") / F.sqrt(nd * d / (nd - 1))
    return winner.select(
        "n",
        F.round(
            F.col("q_out").cast("double") / F.lit(float(scale)), 6
        ).alias("outlier"),
        F.when((F.col("n") >= 3) & (d > 0), F.round(g, 6)).alias("g_stat"),
    )


def kendall_w(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    value_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Kendall's coefficient of concordance W — "HOW strongly do the
    blocks agree on the treatment ranking" (the effect size behind
    friedman's yes/no): one row (n_blocks, k, w, w_tie_corrected),
    both in [0, 1]. W is the exact Friedman transform Q = n(k−1)·W,
    computed from friedman's round-6 Q so the two gates can never
    disagree; the oracle reuses the friedman SQL verbatim for the same
    reason. Same cost as friedman (it IS friedman + one division).
    """
    f = friedman(df, block_col, treatment_col, value_col, scale)
    nd = F.col("n_blocks").cast("double")
    kd = F.col("k").cast("double")
    ok = (F.col("n_blocks") > 0) & (F.col("k") >= 2)
    return f.select(
        "n_blocks",
        "k",
        F.when(ok, F.round(F.col("q") / (nd * (kd - 1)), 6)).alias("w"),
        F.when(
            ok & F.col("q_tie_corrected").isNotNull(),
            F.round(F.col("q_tie_corrected") / (nd * (kd - 1)), 6),
        ).alias("w_tie_corrected"),
    )


def mood_scale_test(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Mood's scale (dispersion) test — "did the SPREAD change even if
    the median didn't" (the scale companion to mann_whitney_u's
    location gate and mood_median's k-sample location gate): one row
    (n_a, n_b, m_stat, z). Scores are squared central midranks
    (r − (N+1)/2)²; M = Σ over sample A; z against the no-tie null
    E[M] = m(N²−1)/12, Var[M] = mn(N+1)(N²−4)/180 (documented: variance
    not tie-corrected — heavy ties only DEFLATE |z|).

    Scores ride ×4 (doubled midranks make (r2 − N − 1)² an exact wide
    integer), so M accumulates exactly; z is a fixed double sequence
    with one sqrt. Same distinct-grid machinery as mann_whitney_u —
    never a data-sized sort.
    """
    qa = df_a.filter(F.col(value_col).isNotNull()).select(
        _quant(F.col(value_col), scale).alias("qv"), F.lit(1).alias("is_a")
    )
    qb = df_b.filter(F.col(value_col).isNotNull()).select(
        _quant(F.col(value_col), scale).alias("qv"), F.lit(0).alias("is_a")
    )
    pooled = qa.unionByName(qb)
    per_v = pooled.groupBy("qv").agg(
        F.count(F.lit(1)).cast("long").alias("t"),
        F.sum("is_a").cast("long").alias("t_a"),
    )
    w = Window.orderBy("qv")
    ranked = per_v.select(
        "t",
        "t_a",
        (
            2 * (F.sum("t").over(w.rowsBetween(Window.unboundedPreceding, 0)) - F.col("t"))
            + F.col("t")
            + 1
        ).cast("long").alias("r2"),
    )
    tot = ranked.agg(
        F.sum("t_a").cast("long").alias("n_a"),
        (F.sum("t") - F.sum("t_a")).cast("long").alias("n_b"),
        F.sum("t").cast("long").alias("nn"),
    )
    j = ranked.crossJoin(F.broadcast(tot))
    dev = F.col("r2").cast(_DEC) - (F.col("nn") + 1).cast(_DEC)
    m4 = j.groupBy("n_a", "n_b", "nn").agg(
        F.sum(F.col("t_a").cast(_DEC) * dev * dev).alias("m4")
    )
    md, nd = (F.col(c).cast("double") for c in ("n_a", "n_b"))
    nn = F.col("nn").cast("double")
    e_m = md * (nn * nn - 1) / F.lit(12.0)
    var = md * nd * (nn + 1) * (nn * nn - 4) / F.lit(180.0)
    m_stat = F.col("m4").cast("double") / F.lit(4.0)
    return m4.select(
        "n_a",
        "n_b",
        m_stat.alias("m_stat"),
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0) & (var > 0),
            F.round((m_stat - e_m) / F.sqrt(var), 6),
        ).alias("z"),
    )


def hill_tail_index(
    df: DataFrame,
    value_col: str,
    k: int = 100,
    scale: int = 1_000_000,
) -> DataFrame:
    """Hill estimator of the heavy-tail index α over the top-k order
    statistics — "how Pareto is this distribution's tail" (α ≤ 1 means
    even the mean is infinite; doc lengths, user activity and entity
    fan-outs in web corpora routinely sit near α ≈ 1–2): one row
    (k, x_ref, hill_alpha, se). α = k / Σᵢ ln(x₍ᵢ₎/x₍ₖ₊₁₎) over the k
    largest values; se = α/√k. Requires x₍ₖ₊₁₎ > 0. ALWAYS one row:
    fewer than k+1 positive rows reports (k=0, NULL x_ref, NULL α);
    a zero log-sum (top values all tied) reports NULL α — callers
    keying on one-row output never see an empty frame.

    Each of the k terms is ONE nano-rounded ln difference summed
    exactly; the tail fetch is a bounded top-(k+1), never a full sort.
    Tied boundary values carry identical payloads, so the arbitrary
    tie-cut cannot change the multiset.
    """
    q = df.filter(F.col(value_col).isNotNull()).select(
        _quant(F.col(value_col), scale).alias("qv")
    ).filter(F.col("qv") > 0)
    top = q.orderBy(F.col("qv").desc()).limit(k + 1)
    w = Window.orderBy(F.col("qv").desc())
    idx = top.select("qv", F.row_number().over(w).cast("long").alias("i"))
    ref = idx.filter(F.col("i") == k + 1).select(F.col("qv").alias("q_ref"))
    terms = idx.filter(F.col("i") <= k).crossJoin(F.broadcast(ref))
    t_nano = F.round(
        (F.log(F.col("qv").cast("double")) - F.log(F.col("q_ref").cast("double")))
        * F.lit(1_000_000_000.0),
        0,
    ).cast("long")
    # global aggregate (no GROUP BY): one row even when ref is empty —
    # q_ref is constant over terms, so max() just carries it through
    agg = terms.agg(
        F.max("q_ref").alias("q_ref"),
        F.count(F.lit(1)).cast("long").alias("kk"),
        F.sum(t_nano).cast("long").alias("s_nano"),
    )
    alpha = (
        F.col("kk").cast("double")
        * F.lit(1_000_000_000.0)
        / F.col("s_nano").cast("double")
    )
    return agg.select(
        F.col("kk").alias("k"),
        F.round(F.col("q_ref").cast("double") / F.lit(float(scale)), 6).alias(
            "x_ref"
        ),
        F.when((F.col("kk") > 0) & (F.col("s_nano") > 0), F.round(alpha, 6)).alias(
            "hill_alpha"
        ),
        F.when(
            (F.col("kk") > 0) & (F.col("s_nano") > 0),
            F.round(alpha / F.sqrt(F.col("kk").cast("double")), 6),
        ).alias("se"),
    )


def krippendorff_alpha(
    df: DataFrame, item_col: str, rater_col: str, category_col: str
) -> DataFrame:
    """Krippendorff's alpha (nominal) — the agreement coefficient that
    TOLERATES MISSING RATINGS (fleiss_kappa silently drops incomplete
    items; real annotation tables are ragged): one row (n_items,
    n_pairable, k_cats, d_o, d_e, alpha). Units with ≥ 2 ratings are
    pairable; D_o = (1/n)·Σ_u Σ_c n_uc(m_u − n_uc)/(m_u − 1),
    D_e = Σ_c n_c(n − n_c)/(n(n−1)), alpha = 1 − D_o/D_e. A single
    observed category (D_e = 0) reports NULL alpha.

    Each (unit, category) cell contributes ONE nano-rounded rational
    term summed exactly (the m_u − 1 denominators are per-unit, so no
    shared factor can be hoisted); D_e is exact integers with one
    division. Two hash aggregates on (item, cat) and (cat) + a tiny
    broadcast fold — duplicate (item, rater) ratings are counted as
    given (callers dedupe upstream if raters can't repeat).
    """
    base = df.filter(
        F.col(item_col).isNotNull()
        & F.col(rater_col).isNotNull()
        & F.col(category_col).isNotNull()
    ).select(F.col(item_col).alias("u"), F.col(category_col).alias("c"))
    uc = base.groupBy("u", "c").agg(F.count(F.lit(1)).cast("long").alias("n_uc"))
    mu = uc.groupBy("u").agg(F.sum("n_uc").cast("long").alias("m_u"))
    n_items = uc.agg(F.countDistinct("u").cast("long").alias("n_items"))
    pair = uc.join(F.broadcast(mu.filter(F.col("m_u") >= 2)), "u")
    term_nano = F.round(
        F.col("n_uc").cast("double")
        * (F.col("m_u") - F.col("n_uc")).cast("double")
        / (F.col("m_u") - 1).cast("double")
        * F.lit(1_000_000_000.0),
        0,
    ).cast("long")
    do_s = pair.agg(
        F.sum(term_nano).cast("long").alias("s_nano"),
        F.sum("n_uc").cast("long").alias("n_pairable"),
    )
    nc = pair.groupBy("c").agg(F.sum("n_uc").cast("long").alias("n_c"))
    de_s = nc.crossJoin(F.broadcast(do_s.select("n_pairable"))).agg(
        F.sum(
            F.col("n_c").cast(_DEC)
            * (F.col("n_pairable") - F.col("n_c")).cast(_DEC)
        ).alias("de_num"),
        F.countDistinct("c").cast("long").alias("k_cats"),
    )
    j = do_s.crossJoin(F.broadcast(de_s)).crossJoin(F.broadcast(n_items))
    nd = F.col("n_pairable").cast("double")
    do_ = F.col("s_nano").cast("double") / (nd * F.lit(1_000_000_000.0))
    de = F.col("de_num").cast("double") / (nd * (nd - 1))
    return j.select(
        "n_items",
        "n_pairable",
        "k_cats",
        F.when(F.col("n_pairable") >= 2, F.round(do_, 6)).alias("d_o"),
        F.when(F.col("n_pairable") >= 2, F.round(de, 6)).alias("d_e"),
        F.when(
            (F.col("n_pairable") >= 2) & (de > 0),
            F.round(F.lit(1.0) - do_ / de, 6),
        ).alias("alpha"),
    )


def trimmed_mean(
    df: DataFrame,
    value_col: str,
    trim: float = 0.1,
    scale: int = 1_000_000,
) -> DataFrame:
    """Trimmed + winsorized mean — the robust location pair (drop the
    extreme k = ⌊trim·n⌋ per side, or clamp them to the cut values):
    one row (n, k_trim, lo_cut, hi_cut, trimmed_mean, winsorized_mean).
    The outlier-immune "what is the typical value" gate a mean ruins
    and a median over-coarsens.

    Everything is EXACT integer arithmetic on the distinct-value grid:
    the cut order statistics come from cumulative counts (the smallest
    value whose cumulative count reaches k+1 / n−k), and each value's
    in-window copy count is max(0, min(cum, n−k) − max(cum−t, k)) — so
    the trimmed sum is exact and each mean is ONE division. Grid-sized
    ordered window, never a data-sized sort.
    """
    q = df.filter(F.col(value_col).isNotNull()).select(
        _quant(F.col(value_col), scale).alias("qv")
    )
    cells = q.groupBy("qv").agg(F.count(F.lit(1)).cast("long").alias("t"))
    w = Window.orderBy("qv").rowsBetween(Window.unboundedPreceding, 0)
    cum = cells.select("qv", "t", F.sum("t").over(w).cast("long").alias("cum"))
    tot = cells.agg(F.sum("t").cast("long").alias("n")).select(
        "n", F.floor(F.col("n") * F.lit(trim)).cast("long").alias("k")
    )
    j = cum.crossJoin(F.broadcast(tot))
    lo = j.filter(F.col("cum") >= F.col("k") + 1).groupBy("n", "k").agg(
        F.min("qv").alias("lo_cut_q")
    )
    hi = j.filter(F.col("cum") >= F.col("n") - F.col("k")).groupBy("n", "k").agg(
        F.min("qv").alias("hi_cut_q")
    )
    inwin = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("cum"), F.col("n") - F.col("k"))
        - F.greatest(F.col("cum") - F.col("t"), F.col("k")),
    )
    tsum = j.groupBy("n", "k").agg(
        F.sum(F.col("qv").cast(_DEC) * inwin.cast(_DEC)).alias("tsum")
    )
    out = (
        tsum.join(F.broadcast(lo), ["n", "k"])
        .join(F.broadcast(hi), ["n", "k"])
    )
    sc = F.lit(float(scale))
    nd = F.col("n").cast("double")
    kd = F.col("k").cast("double")
    wsum = (
        F.col("tsum")
        + F.col("k").cast(_DEC) * F.col("lo_cut_q").cast(_DEC)
        + F.col("k").cast(_DEC) * F.col("hi_cut_q").cast(_DEC)
    )
    return out.select(
        "n",
        F.col("k").alias("k_trim"),
        F.round(F.col("lo_cut_q").cast("double") / sc, 6).alias("lo_cut"),
        F.round(F.col("hi_cut_q").cast("double") / sc, 6).alias("hi_cut"),
        F.when(
            F.col("n") - 2 * F.col("k") > 0,
            F.round(
                F.col("tsum").cast("double") / ((nd - 2 * kd) * sc), 6
            ),
        ).alias("trimmed_mean"),
        F.when(
            F.col("n") > 0,
            F.round(wsum.cast("double") / (nd * sc), 6),
        ).alias("winsorized_mean"),
    )


def sign_test(df: DataFrame, a_col: str, b_col: str, scale: int = 1_000_000) -> DataFrame:
    """Paired sign test — the assumption-free "did B move vs A" gate
    (paired_t needs symmetric diffs; this needs NOTHING but a sign):
    one row (n_pairs, n_pos, n_neg, z). Ties (quantized equal) drop per
    the classical definition; z = (n_pos − n_neg)/√(n_pos + n_neg).

    Sign decisions are exact integer comparisons on the quantized grid;
    one hash aggregate, one sqrt.
    """
    q = df.filter(F.col(a_col).isNotNull() & F.col(b_col).isNotNull()).select(
        _quant(F.col(a_col), scale).alias("qa"),
        _quant(F.col(b_col), scale).alias("qb"),
    )
    agg = q.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum((F.col("qb") > F.col("qa")).cast("int")).cast("long").alias("n_pos"),
        F.sum((F.col("qb") < F.col("qa")).cast("int")).cast("long").alias("n_neg"),
    )
    m = (F.col("n_pos") + F.col("n_neg")).cast("double")
    return agg.select(
        "n_pairs",
        "n_pos",
        "n_neg",
        F.when(
            m > 0,
            F.round(
                (F.col("n_pos") - F.col("n_neg")).cast("double") / F.sqrt(m), 6
            ),
        ).alias("z"),
    )


def wilcoxon_signed_rank(
    df: DataFrame, a_col: str, b_col: str, scale: int = 1_000_000
) -> DataFrame:
    """Wilcoxon signed-rank test — the paired movement gate between
    sign_test (signs only, wastes magnitude) and paired_t (needs
    near-normal diffs): one row (n, w_plus, z). Zero diffs (quantized
    equal) drop per the classical definition; |diff| ranks are tie-
    midranks; z uses the tie-corrected normal approximation
    var = [2n(n+1)(2n+1) − Σ(t³−t)] / 48.

    Engine-exact: diffs and |diff| cells are integers on the quantized
    grid, midranks are DOUBLED midranks (2·cum − t + 1, integer), W⁺
    and the variance numerator accumulate as exact wide-integer sums;
    the ordered window runs over the DISTINCT |diff| grid, not raw
    pairs. One division + one sqrt at the end.
    """
    d = df.filter(F.col(a_col).isNotNull() & F.col(b_col).isNotNull()).select(
        (_quant(F.col(b_col), scale) - _quant(F.col(a_col), scale)).alias("d")
    ).filter(F.col("d") != 0)
    cells = d.groupBy(F.abs(F.col("d")).alias("ad")).agg(
        F.count(F.lit(1)).cast("long").alias("t"),
        F.sum((F.col("d") > 0).cast("int")).cast("long").alias("p"),
    )
    w = Window.orderBy("ad").rowsBetween(Window.unboundedPreceding, 0)
    ranked = cells.select(
        "t",
        "p",
        (2 * F.sum("t").over(w) - F.col("t") + 1).cast("long").alias("r2"),
    )
    agg = ranked.agg(
        F.sum("t").cast("long").alias("n"),
        F.sum(F.col("p").cast(_DEC) * F.col("r2").cast(_DEC)).alias("w2"),
        F.sum(
            F.col("t").cast(_DEC) * F.col("t").cast(_DEC) * F.col("t").cast(_DEC)
            - F.col("t").cast(_DEC)
        ).alias("tie3"),
    )
    nD = F.col("n").cast(_DEC)
    var_num = (
        F.lit(2).cast(_DEC) * nD * (nD + 1) * (2 * nD + 1) - F.col("tie3")
    )
    nd = F.col("n").cast("double")
    return agg.select(
        "n",
        (F.col("w2").cast("double") / F.lit(2.0)).alias("w_plus"),
        F.when(
            var_num.cast("double") > 0,
            F.round(
                (
                    F.col("w2").cast("double") / F.lit(2.0)
                    - nd * (nd + 1) / F.lit(4.0)
                )
                / F.sqrt(var_num.cast("double") / F.lit(48.0)),
                6,
            ),
        ).alias("z"),
    )


def jarque_bera(df: DataFrame, value_col: str, scale: int = 100) -> DataFrame:
    """Jarque–Bera normality gate — skewness + excess kurtosis from
    exact moments: one row (n, skewness, ex_kurtosis, jb). JB =
    n/6·(g1² + g2²/4); large JB ⇒ reject normality. The "is this
    feature distribution sane" check a quality pipeline runs before
    trusting z-score-based outlier rules.

    Engine-exact: values quantize to the integer grid (default
    scale=100 — exact for 2-decimal inputs; the 4th power is why the
    default grid is coarser than the repo's usual 1e6: deviations^4
    must fit decimal(38,0)), pass 1 derives an integer pivot
    c = ⌊Σq/n⌋, pass 2 accumulates Σdev..Σdev⁴ about the pivot as
    exact wide-integer sums, and the central moments come from the
    pivot-shift identities evaluated once on final scalars (identical
    expression tree in the DuckDB oracle). Two hash aggregates, no
    window, no sort.
    """
    q = df.filter(F.col(value_col).isNotNull()).select(
        _quant(F.col(value_col), scale).alias("qv")
    )
    s1n = q.agg(
        F.sum(F.col("qv").cast(_DEC)).alias("s1"),
        F.count(F.lit(1)).cast(_DEC).alias("nn"),
    )
    # exact ⌊s1/n⌋: subtract the remainder first so the decimal division
    # is exact at any result scale (no float/decimal rounding at the edge)
    piv = s1n.select(
        (
            (F.col("s1") - F.pmod(F.col("s1"), F.col("nn"))) / F.col("nn")
        ).cast("long").alias("c")
    )
    dev = q.crossJoin(F.broadcast(piv)).select(
        (F.col("qv") - F.col("c")).cast(_DEC).alias("dv")
    )
    s = dev.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dv").alias("d1"),
        F.sum(F.col("dv") * F.col("dv")).alias("d2"),
        F.sum(F.col("dv") * F.col("dv") * F.col("dv")).alias("d3"),
        F.sum(F.col("dv") * F.col("dv") * F.col("dv") * F.col("dv")).alias("d4"),
    )
    nd = F.col("n").cast("double")
    dl = F.col("d1").cast("double") / nd
    d2d = F.col("d2").cast("double")
    d3d = F.col("d3").cast("double")
    d4d = F.col("d4").cast("double")
    m2 = (d2d - dl * F.col("d1").cast("double")) / nd
    m3 = (d3d - 3 * dl * d2d + 2 * dl * dl * F.col("d1").cast("double")) / nd
    m4 = (
        d4d - 4 * dl * d3d + 6 * dl * dl * d2d
        - 3 * dl * dl * dl * F.col("d1").cast("double")
    ) / nd
    g1 = m3 / F.sqrt(m2 * m2 * m2)
    g2 = m4 / (m2 * m2) - 3
    return s.select(
        "n",
        F.when(m2 > 0, F.round(g1, 6)).alias("skewness"),
        F.when(m2 > 0, F.round(g2, 6)).alias("ex_kurtosis"),
        F.when(
            m2 > 0,
            F.round(nd / 6 * (g1 * g1 + g2 * g2 / 4), 6),
        ).alias("jb"),
    )


def cmh_test(
    df: DataFrame, stratum_col: str, exposed_col: str, outcome_col: str
) -> DataFrame:
    """Cochran–Mantel–Haenszel stratified 2×2 test + Mantel–Haenszel
    common odds ratio — "is exposure associated with outcome after
    controlling for the stratum" (the Simpson's-paradox-proof version
    of stat_odds_ratio): one row (k_strata, sum_a, e_sum, v_sum, cmh,
    or_mh). cmh uses the classical 0.5 continuity correction; strata
    with n < 2 contribute counts but zero variance, per the standard
    definition (their V term is undefined).

    Engine-exact: per-stratum cell counts are one hash aggregate of
    exact longs; each stratum's E, V, and odds-ratio terms are doubles
    nano-rounded (×1e12) to integers and EXACT-summed across strata
    (per-term round-then-exact-sum — the repo-wide recipe), so stratum
    order can never wobble the result. One division per output.
    """
    cells = df.filter(
        F.col(stratum_col).isNotNull()
        & F.col(exposed_col).isNotNull()
        & F.col(outcome_col).isNotNull()
    ).groupBy(F.col(stratum_col).alias("s")).agg(
        F.sum(
            (F.col(exposed_col) & F.col(outcome_col)).cast("int")
        ).cast("long").alias("a"),
        F.sum(
            (F.col(exposed_col) & ~F.col(outcome_col)).cast("int")
        ).cast("long").alias("b"),
        F.sum(
            (~F.col(exposed_col) & F.col(outcome_col)).cast("int")
        ).cast("long").alias("c"),
        F.sum(
            (~F.col(exposed_col) & ~F.col(outcome_col)).cast("int")
        ).cast("long").alias("d"),
    )
    NANO = F.lit(1_000_000_000_000.0)
    n = (F.col("a") + F.col("b") + F.col("c") + F.col("d")).cast("double")
    n1 = (F.col("a") + F.col("b")).cast("double")
    n0 = (F.col("c") + F.col("d")).cast("double")
    m1 = (F.col("a") + F.col("c")).cast("double")
    m0 = (F.col("b") + F.col("d")).cast("double")
    terms = cells.select(
        "a",
        F.round(n1 * m1 / n * NANO).cast(_DEC).alias("e12"),
        F.when(
            n > 1,
            F.round(n1 * n0 * m1 * m0 / (n * n * (n - 1)) * NANO),
        ).otherwise(F.lit(0)).cast(_DEC).alias("v12"),
        F.round(F.col("a").cast("double") * F.col("d").cast("double") / n * NANO)
        .cast(_DEC).alias("ad12"),
        F.round(F.col("b").cast("double") * F.col("c").cast("double") / n * NANO)
        .cast(_DEC).alias("bc12"),
    )
    agg = terms.agg(
        F.count(F.lit(1)).cast("long").alias("k_strata"),
        F.sum("a").cast("long").alias("sum_a"),
        F.sum("e12").alias("e12"),
        F.sum("v12").alias("v12"),
        F.sum("ad12").alias("ad12"),
        F.sum("bc12").alias("bc12"),
    )
    NANOd = F.lit(1_000_000_000_000.0)
    e = F.col("e12").cast("double") / NANOd
    v = F.col("v12").cast("double") / NANOd
    adn = F.col("ad12").cast("double")
    bcn = F.col("bc12").cast("double")
    dev = F.abs(F.col("sum_a").cast("double") - e) - F.lit(0.5)
    return agg.select(
        "k_strata",
        "sum_a",
        F.round(e, 6).alias("e_sum"),
        F.round(v, 6).alias("v_sum"),
        F.when(v > 0, F.round(dev * dev / v, 6)).alias("cmh"),
        F.when(bcn > 0, F.round(adn / bcn, 6)).alias("or_mh"),
    )


def _ols_fit_onerow(q: DataFrame) -> DataFrame:
    """One-row OLS fit over pre-quantized (qx, qy): exact integer
    moments + double (alpha, beta) in qy units. qx must already be
    centered/small (caller shifts to min); alpha/beta are the identical
    expression tree the DuckDB oracles replay."""
    m = q.agg(*_moment_aggs())
    nd = F.col("n").cast(_DEC)
    dx = (nd * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    num = (nd * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    anum = (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")).cast("double")
    return m.select(
        "n",
        dx.alias("dx"),
        F.when(dx > 0, num / dx).alias("beta"),
        F.when(dx > 0, anum / dx).alias("alpha"),
    )


def durbin_watson(
    df: DataFrame,
    x_col: str,
    y_col: str,
    y_scale: int = 1_000_000,
) -> DataFrame:
    """Durbin–Watson first-order autocorrelation gate on OLS residuals
    — "is the trend fit hiding serial correlation" (DW ≈ 2 ⇒ none,
    → 0 positive, → 4 negative): one row (n, dw, rho). rho = 1 − dw/2
    is the implied lag-1 residual correlation. The companion check
    ols_trend needs before its standard errors can be believed.

    Engine-exact: integer moments fit the line (x shifted to its min
    first), per-row residuals are a fixed double expression on exact
    integers, each e² / (e−e_prev)² term is micro-rounded (×1e6) to an
    integer and EXACT-summed, and DW is ONE division (scale cancels —
    both sums are in the same qy² units). The lag runs over the
    DISTINCT x grid (e.g. ≤ a few thousand days), not raw rows — the
    bounded-grid contract all the repo's series ops share.

    Input contract (like every series op here): ONE observation per x —
    feed per-period aggregates, not raw events. Duplicate x values are
    still processed deterministically (the lag window breaks ties on
    (x, qy)), but DW over within-tie "lags" is not the classical
    statistic; pre-aggregate instead.
    """
    base = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull()).select(
        F.col(x_col).cast("long").alias("x"),
        _quant(F.col(y_col), y_scale).alias("qy"),
    )
    xmin = base.agg(F.min("x").alias("x0"))
    q = base.crossJoin(F.broadcast(xmin)).select(
        (F.col("x") - F.col("x0")).alias("qx"), "qy"
    )
    fit = _ols_fit_onerow(q)
    e = q.crossJoin(F.broadcast(fit)).select(
        "qx",
        (
            F.col("qy").cast("double")
            - F.col("alpha")
            - F.col("beta") * F.col("qx").cast("double")
        ).alias("e"),
        "qy",
        "n",
    )
    # qy tie-break: contract-violating duplicate-x input stays deterministic
    w = Window.orderBy("qx", "qy")
    terms = e.select(
        "n",
        F.round(F.col("e") * F.col("e") * F.lit(1_000_000.0)).cast(_DEC).alias("e2"),
        F.when(
            F.lag("e").over(w).isNotNull(),
            F.round(
                (F.col("e") - F.lag("e").over(w))
                * (F.col("e") - F.lag("e").over(w))
                * F.lit(1_000_000.0)
            ),
        ).cast(_DEC).alias("d2"),
    )
    agg = terms.groupBy("n").agg(
        F.sum("e2").alias("se2"), F.sum("d2").alias("sd2")
    )
    dw = F.col("sd2").cast("double") / F.col("se2").cast("double")
    return agg.select(
        "n",
        F.when((F.col("n") >= 3) & (F.col("se2") > 0), F.round(dw, 6)).alias("dw"),
        F.when(
            (F.col("n") >= 3) & (F.col("se2") > 0),
            F.round(1 - dw / 2, 6),
        ).alias("rho"),
    )


def breusch_pagan(
    df: DataFrame,
    x_col: str,
    y_col: str,
    y_scale: int = 1_000_000,
) -> DataFrame:
    """Breusch–Pagan (Koenker–Bassett studentized form) heteroskedas-
    ticity gate — "does residual variance grow with x": one row
    (n, r2_aux, lm). LM = n·R² of the auxiliary regression e² ~ x;
    large LM ⇒ the homoskedasticity assumption behind ols_trend's
    error bars is wrong. Koenker's n·R² form is the robust default
    (no normality-of-e assumption, unlike the original BP scaling).

    Engine-exact: fit from exact integer moments, per-row e² micro-
    rounded (×1e6) to an integer grid, and the auxiliary R² from a
    second exact-integer moment pass — double combination happens once
    on final scalars. Two hash aggregates + a broadcast fit; no sort.
    """
    base = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull()).select(
        F.col(x_col).cast("long").alias("x"),
        _quant(F.col(y_col), y_scale).alias("qy"),
    )
    xmin = base.agg(F.min("x").alias("x0"))
    q = base.crossJoin(F.broadcast(xmin)).select(
        (F.col("x") - F.col("x0")).alias("qx"), "qy"
    )
    fit = _ols_fit_onerow(q)
    aux = q.crossJoin(F.broadcast(fit)).select(
        "qx",
        F.round(
            (
                F.col("qy").cast("double")
                - F.col("alpha")
                - F.col("beta") * F.col("qx").cast("double")
            )
            * (
                F.col("qy").cast("double")
                - F.col("alpha")
                - F.col("beta") * F.col("qx").cast("double")
            )
            * F.lit(1_000_000.0)
        ).cast("long").alias("qy2"),
    ).select("qx", F.col("qy2").alias("qy"))
    m = aux.agg(*_moment_aggs())
    nd = F.col("n").cast(_DEC)
    cxx = (nd * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    cuu = (nd * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    cxu = (nd * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    r2 = cxu * cxu / (cxx * cuu)
    return m.select(
        "n",
        F.when((cxx > 0) & (cuu > 0), F.round(r2, 6)).alias("r2_aux"),
        F.when(
            (cxx > 0) & (cuu > 0),
            F.round(F.col("n").cast("double") * r2, 6),
        ).alias("lm"),
    )


def chow_test(
    df: DataFrame,
    x_col: str,
    y_col: str,
    split: int,
    y_scale: int = 1_000_000,
) -> DataFrame:
    """Chow structural-break F-test at a KNOWN split point — "did the
    trend line change at the deploy/policy date" (the parametric
    companion to the rank-based evt_pettitt, which hunts for an unknown
    break): one row (n1, n2, ssr_pooled, ssr1, ssr2, f_stat), k = 2
    parameters per segment, F = ((SSRp − SSR1 − SSR2)/k) /
    ((SSR1 + SSR2)/(n1 + n2 − 2k)).

    Engine-exact, and unlike DW/BP it needs NO per-row residuals: each
    segment's SSR comes from the closed form (CYY − CXY²/CXX)/n on
    exact integer central-moment combinations (x shifted to the global
    min so the pool and the segments share one frame); pooled moments
    are the exact integer SUM of the segment moments. One two-group
    hash aggregate, doubles only on the final six scalars.
    """
    base = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull()).select(
        F.col(x_col).cast("long").alias("x"),
        _quant(F.col(y_col), y_scale).alias("qy"),
    )
    xmin = base.agg(F.min("x").alias("x0"))
    q = base.crossJoin(F.broadcast(xmin)).select(
        (F.col("x") - F.col("x0")).alias("qx"),
        "qy",
        (F.col("x") < F.lit(split)).alias("seg1"),
    )
    m = q.groupBy("seg1").agg(*_moment_aggs())

    def ssr(n, sx, sy, sxx, syy, sxy):
        ndc = n.cast(_DEC)
        cxx = (ndc * sxx - sx * sx).cast("double")
        cyy = (ndc * syy - sy * sy).cast("double")
        cxy = (ndc * sxy - sx * sy).cast("double")
        return F.when(
            cxx > 0, (cyy - cxy * cxy / cxx) / n.cast("double")
        ).otherwise(F.when(n > 0, F.lit(0.0)))

    seg = m.select(
        "seg1", "n", "sx", "sy", "sxx", "syy", "sxy",
        ssr(F.col("n"), F.col("sx"), F.col("sy"), F.col("sxx"),
            F.col("syy"), F.col("sxy")).alias("ssr_seg"),
    )
    pooled = seg.agg(
        F.sum(F.when(F.col("seg1"), F.col("n"))).cast("long").alias("n1"),
        F.sum(F.when(~F.col("seg1"), F.col("n"))).cast("long").alias("n2"),
        F.sum("n").cast("long").alias("n"),
        F.sum("sx").alias("sx"),
        F.sum("sy").alias("sy"),
        F.sum("sxx").alias("sxx"),
        F.sum("syy").alias("syy"),
        F.sum("sxy").alias("sxy"),
        F.sum(F.when(F.col("seg1"), F.col("ssr_seg"))).alias("ssr1"),
        F.sum(F.when(~F.col("seg1"), F.col("ssr_seg"))).alias("ssr2"),
    )
    ssr_p = ssr(F.col("n"), F.col("sx"), F.col("sy"), F.col("sxx"),
                F.col("syy"), F.col("sxy"))
    dof = (F.col("n1") + F.col("n2") - 4).cast("double")
    resid = F.col("ssr1") + F.col("ssr2")
    ys2 = F.lit(float(y_scale) * float(y_scale))  # report SSRs in y units
    return pooled.select(
        "n1",
        "n2",
        F.round(ssr_p / ys2, 6).alias("ssr_pooled"),
        F.round(F.col("ssr1") / ys2, 6).alias("ssr1"),
        F.round(F.col("ssr2") / ys2, 6).alias("ssr2"),
        F.when(
            (F.col("n1") >= 2) & (F.col("n2") >= 2) & (dof > 0) & (resid > 0),
            F.round(((ssr_p - resid) / F.lit(2.0)) / (resid / dof), 6),
        ).alias("f_stat"),
    )


def theil_u(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Theil's uncertainty coefficient — the DIRECTIONAL categorical
    association chi2_independence can't give: one row (n, k_a, k_b,
    mi_bits, h_a_bits, h_b_bits, u_a_given_b, u_b_given_a).
    U(a|b) = I(a;b)/H(a) ∈ [0,1] — "what fraction of a's entropy does
    knowing b remove" (asymmetric, unlike Cramér's V: source may
    determine lang without lang determining source).

    Engine-exact (the entropy_rate recipe): every log argument is an
    INTEGER count, each cell contributes one nano-rounded
    n_ij·(ln N + ln n_ij − ln n_i − ln n_j)/ln2 term summed exactly
    (marginal H terms likewise), and the shared 1/N division happens
    once. One (a,b) cell aggregate + two broadcast marginals.
    """
    base = df.filter(F.col(a_col).isNotNull() & F.col(b_col).isNotNull()).select(
        F.col(a_col).alias("a"), F.col(b_col).alias("b")
    )
    cells = base.groupBy("a", "b").agg(F.count(F.lit(1)).cast("long").alias("nij"))
    ma = base.groupBy("a").agg(F.count(F.lit(1)).cast("long").alias("na"))
    mb = base.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("nb"))
    tot = base.agg(F.count(F.lit(1)).cast("long").alias("nn"))
    ln2 = 0.6931471805599453
    NANO = F.lit(1_000_000_000.0)
    j = (
        cells.join(F.broadcast(ma), "a")
        .join(F.broadcast(mb), "b")
        .crossJoin(F.broadcast(tot))
    )
    mi_term = F.round(
        F.col("nij").cast("double")
        * (
            F.log(F.col("nn").cast("double"))
            + F.log(F.col("nij").cast("double"))
            - F.log(F.col("na").cast("double"))
            - F.log(F.col("nb").cast("double"))
        )
        / F.lit(ln2)
        * NANO
    ).cast("long")
    mi_agg = j.agg(
        F.max("nn").cast("long").alias("n"),
        F.sum(mi_term).cast("long").alias("mi_nano"),
    )

    def h_agg(m, cnt, k_name):
        t = F.round(
            F.col(cnt).cast("double")
            * (F.log(F.col("nn").cast("double")) - F.log(F.col(cnt).cast("double")))
            / F.lit(ln2)
            * NANO
        ).cast("long")
        return m.crossJoin(F.broadcast(tot)).agg(
            F.count(F.lit(1)).cast("long").alias(k_name),
            F.sum(t).cast("long").alias(f"h_{k_name}_nano"),
        )

    ha = h_agg(ma, "na", "k_a")
    hb = h_agg(mb, "nb", "k_b")
    out = mi_agg.crossJoin(F.broadcast(ha)).crossJoin(F.broadcast(hb))
    nd = F.col("n").cast("double") * NANO
    mi = F.col("mi_nano").cast("double") / nd
    h_a = F.col("h_k_a_nano").cast("double") / nd
    h_b = F.col("h_k_b_nano").cast("double") / nd
    return out.select(
        "n",
        "k_a",
        "k_b",
        F.round(mi, 6).alias("mi_bits"),
        F.round(h_a, 6).alias("h_a_bits"),
        F.round(h_b, 6).alias("h_b_bits"),
        F.when(F.col("h_k_a_nano") > 0, F.round(mi / h_a, 6)).alias("u_a_given_b"),
        F.when(F.col("h_k_b_nano") > 0, F.round(mi / h_b, 6)).alias("u_b_given_a"),
    )


def cronbach_alpha(
    df: DataFrame,
    subject_col: str,
    item_col: str,
    value_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Cronbach's alpha — internal consistency of k numeric "items"
    measured per subject (do the per-item scores move together enough
    to be one scale): one row (n_subjects, k_items, alpha).
    α = k/(k−1)·(1 − Σᵢσ²ᵢ/σ²_T) with population variances; α → 1 when
    items co-vary, ≤ 0 when they don't. The numeric-scale sibling of
    fleiss_kappa/krippendorff (categorical raters).

    Engine-exact end to end: the subject×item cell is the micro-grid
    mean re-quantized to an integer (identical double → identical
    round in both engines), only COMPLETE subjects enter (balanced
    design, so every item shares one n), each item's variance
    numerator n·Σq² − (Σq)² and the total-score numerator are exact
    wide integers, and α is ONE division of exact sums — the σ² scale
    factors cancel.
    """
    cells = (
        df.filter(
            F.col(subject_col).isNotNull()
            & F.col(item_col).isNotNull()
            & F.col(value_col).isNotNull()
        )
        .groupBy(F.col(subject_col).alias("subj"), F.col(item_col).alias("item"))
        .agg(
            F.sum(_quant(F.col(value_col), scale)).cast(_DEC).alias("_sm"),
            F.count(F.lit(1)).cast("long").alias("_cn"),
        )
        .select(
            "subj",
            "item",
            F.round(
                F.col("_sm").cast("double") / F.col("_cn").cast("double")
            ).cast("long").alias("qv"),
        )
    )
    k_row = cells.agg(F.countDistinct("item").cast("long").alias("k"))
    complete = (
        cells.groupBy("subj")
        .agg(F.count(F.lit(1)).cast("long").alias("_kb"))
        .crossJoin(F.broadcast(k_row))
        .filter(F.col("_kb") == F.col("k"))
        .select("subj", "k")
    )
    cc = cells.join(F.broadcast(complete), "subj")
    per_item = cc.groupBy("item").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("qv").cast(_DEC)).alias("sy"),
        F.sum(F.col("qv").cast(_DEC) * F.col("qv").cast(_DEC)).alias("syy"),
    )
    item_var = per_item.agg(
        F.max("n").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(
            F.col("n").cast(_DEC) * F.col("syy") - F.col("sy") * F.col("sy")
        ).alias("cyy_items"),
    )
    totals = cc.groupBy("subj").agg(F.sum(F.col("qv").cast(_DEC)).alias("tq"))
    tot_var = totals.agg(
        F.count(F.lit(1)).cast("long").alias("n_t"),
        F.sum("tq").alias("st"),
        F.sum(F.col("tq") * F.col("tq")).alias("stt"),
    )
    j = item_var.crossJoin(F.broadcast(tot_var))
    ctt = (
        F.col("n_t").cast(_DEC) * F.col("stt") - F.col("st") * F.col("st")
    ).cast("double")
    kd = F.col("k").cast("double")
    return j.select(
        F.col("n").alias("n_subjects"),
        F.col("k").alias("k_items"),
        F.when(
            (F.col("k") >= 2) & (ctt > 0),
            F.round(
                kd / (kd - 1)
                * (1 - F.col("cyy_items").cast("double") / ctt),
                6,
            ),
        ).alias("alpha"),
    )


def icc_oneway(df: DataFrame, subject_col: str, value_col: str,
               scale: int = 100) -> DataFrame:
    """ICC(1) — one-way random-effects intraclass correlation: "how
    much of a rating's variance is the subject" (is value a stable
    per-user trait, or noise): one row (n_ratings, n_subjects, k0,
    msb, msw, icc1). ICC = (MSB − MSW)/(MSB + (k₀−1)·MSW) with
    Searle's k₀ = (N − Σnᵢ²/N)/(I−1) for unbalanced groups.

    Engine-exact: values quantize to the integer grid, Σx/Σx²/Σnᵢ²
    are exact wide-integer sums, each group's Sᵢ²/nᵢ term is one fixed
    double division micro-rounded (×1e6) and exact-summed, and the
    final MS/ICC arithmetic runs once on scalars (reported MS are in
    grid units²/scale² — i.e. original units).
    """
    q = df.filter(
        F.col(subject_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        F.col(subject_col).alias("g"), _quant(F.col(value_col), scale).alias("qv")
    )
    per_g = q.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("ni"),
        F.sum(F.col("qv").cast(_DEC)).alias("si"),
        F.sum(F.col("qv").cast(_DEC) * F.col("qv").cast(_DEC)).alias("ssi"),
    )
    term = F.round(
        (F.col("si").cast("double") * F.col("si").cast("double"))
        / F.col("ni").cast("double")
        * F.lit(1_000_000.0)
    ).cast(_DEC)
    agg = per_g.agg(
        F.sum("ni").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("i"),
        F.sum("si").alias("s"),
        F.sum("ssi").alias("ss"),
        F.sum(term).alias("a_micro"),
        F.sum(F.col("ni").cast(_DEC) * F.col("ni").cast(_DEC)).alias("sn2"),
    )
    nd = F.col("n").cast("double")
    idn = F.col("i").cast("double")
    sc2 = F.lit(float(scale) * float(scale))
    a = F.col("a_micro").cast("double") / F.lit(1_000_000.0)
    ssb = a - (F.col("s").cast("double") * F.col("s").cast("double")) / nd
    ssw = F.col("ss").cast("double") - a
    msb = ssb / (idn - 1) / sc2
    msw = ssw / (nd - idn) / sc2
    k0 = (nd - F.col("sn2").cast("double") / nd) / (idn - 1)
    ok = (F.col("i") >= 2) & (F.col("n") > F.col("i"))
    icc = (msb - msw) / (msb + (k0 - 1) * msw)
    return agg.select(
        F.col("n").alias("n_ratings"),
        F.col("i").alias("n_subjects"),
        F.when(ok, F.round(k0, 6)).alias("k0"),
        F.when(ok, F.round(msb, 6)).alias("msb"),
        F.when(ok, F.round(msw, 6)).alias("msw"),
        F.when(ok & (msb + (k0 - 1) * msw > 0), F.round(icc, 6)).alias("icc1"),
    )


def quade(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    value_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Quade test — the range-weighted within-block rank test (the
    friedman upgrade that lets blocks with LARGER spreads count for
    more, which is where Friedman wastes power for small k): one row
    (n_blocks, k, dof1, dof2, f_stat). Blocks are ranked by their
    value RANGE, treatments within block by value; F =
    (n−1)·B/(A−B) over S_ij = Q_i·(r_ij − (k+1)/2).

    Engine-exact: the friedman cell/complete-block machinery feeds
    DOUBLED midranks for both rankings, so 4·S_ij = q2ᵢ·(r2ᵢⱼ−(k+1))
    is an exact integer; A and B numerators are exact wide-integer
    sums and the 16s cancel — F is ONE division,
    (n−1)·ΣSⱼ² / (n·ΣSᵢⱼ² − ΣSⱼ²). All-tied blocks contribute zero
    (their within-block midranks all equal k+1), exactly as the
    classical definition wants; A=B (perfect agreement) → NULL.
    """
    cells = (
        df.filter(
            F.col(block_col).isNotNull()
            & F.col(treatment_col).isNotNull()
            & F.col(value_col).isNotNull()
        )
        .groupBy(F.col(block_col).alias("blk"), F.col(treatment_col).alias("trt"))
        .agg(
            F.sum(_quant(F.col(value_col), scale)).cast(_DEC).alias("_sm"),
            F.count(F.lit(1)).cast("long").alias("_cn"),
        )
        .select(
            "blk",
            "trt",
            F.round(
                F.col("_sm").cast("double") / F.col("_cn").cast("double")
            ).cast("long").alias("qv"),
        )
    )
    k_row = cells.agg(F.countDistinct("trt").cast("long").alias("k"))
    complete = (
        cells.groupBy("blk")
        .agg(F.count(F.lit(1)).cast("long").alias("_kb"))
        .crossJoin(F.broadcast(k_row))
        .filter(F.col("_kb") == F.col("k"))
        .select("blk")
    )
    cc = cells.join(F.broadcast(complete), "blk")
    # within-block doubled midranks over the per-block distinct grid
    per_bv = cc.groupBy("blk", "qv").agg(F.count(F.lit(1)).cast("long").alias("t"))
    wb = Window.partitionBy("blk").orderBy("qv")
    ranked = per_bv.select(
        "blk",
        "qv",
        (
            2 * (F.sum("t").over(wb.rowsBetween(Window.unboundedPreceding, 0)) - F.col("t"))
            + F.col("t")
            + 1
        ).cast("long").alias("r2"),
    )
    # block weights: doubled midranks of the block RANGE across blocks
    ranges = cc.groupBy("blk").agg(
        (F.max("qv") - F.min("qv")).cast("long").alias("rng")
    )
    per_rng = ranges.groupBy("rng").agg(F.count(F.lit(1)).cast("long").alias("tr"))
    wr = Window.orderBy("rng")
    rng_ranked = per_rng.select(
        "rng",
        (
            2 * (F.sum("tr").over(wr.rowsBetween(Window.unboundedPreceding, 0)) - F.col("tr"))
            + F.col("tr")
            + 1
        ).cast("long").alias("q2"),
    )
    s4 = (
        cc.join(ranked, ["blk", "qv"])
        .join(ranges, "blk")
        .join(F.broadcast(rng_ranked), "rng")
        .crossJoin(F.broadcast(k_row))
        .select(
            "trt",
            (
                F.col("q2").cast(_DEC)
                * (F.col("r2") - (F.col("k") + 1)).cast(_DEC)
            ).alias("s4"),
            "k",
        )
    )
    per_trt = s4.groupBy("trt", "k").agg(
        F.sum("s4").alias("s4_j"),
        F.sum(F.col("s4") * F.col("s4")).alias("a16_j"),
        F.count(F.lit(1)).cast("long").alias("n_j"),
    )
    agg = per_trt.agg(
        F.max("n_j").cast("long").alias("n"),
        F.max("k").cast("long").alias("k"),
        F.sum("a16_j").alias("a16"),
        F.sum(F.col("s4_j") * F.col("s4_j")).alias("b16n"),
    )
    nd = F.col("n").cast("double")
    kd = F.col("k").cast("double")
    num = (nd - 1) * F.col("b16n").cast("double")
    den = nd * F.col("a16").cast("double") - F.col("b16n").cast("double")
    return agg.select(
        F.col("n").alias("n_blocks"),
        "k",
        (F.col("k") - 1).alias("dof1"),
        ((F.col("n") - 1) * (F.col("k") - 1)).alias("dof2"),
        F.when((F.col("n") >= 2) & (F.col("k") >= 2) & (den > 0),
               F.round(num / den, 6)).alias("f_stat"),
    )


def kuiper_2sample(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Two-sample Kuiper test — KS's tail-fair sibling: V = D⁺ + D⁻
    (max CDF excess in EACH direction) weighs both distribution tails
    equally where KS's single max can hide a compensating shift; it is
    also invariant to cyclic shifts, making it the right drift gate for
    wrapped quantities (hour-of-day, day-of-week). One row
    (n_a, n_b, d_plus, d_minus, v, v_scaled) with
    v_scaled = V·√(n_a·n_b/(n_a+n_b)).

    Exact until the last step (the ks_2sample recipe): both directed
    maxima are integer maxima of cum_a·n_b − cum_b·n_a over the
    DISTINCT merged value grid; ONE division by n_a·n_b, one sqrt.
    """
    qa = df_a.filter(F.col(value_col).isNotNull()).select(
        _quant(F.col(value_col), scale).alias("qv")
    )
    qb = df_b.filter(F.col(value_col).isNotNull()).select(
        _quant(F.col(value_col), scale).alias("qv")
    )
    ca = qa.groupBy("qv").agg(F.count(F.lit(1)).cast("long").alias("ca"))
    cb = qb.groupBy("qv").agg(F.count(F.lit(1)).cast("long").alias("cb"))
    merged = ca.join(cb, "qv", "full_outer").select(
        "qv",
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )
    w = Window.orderBy("qv").rowsBetween(Window.unboundedPreceding, 0)
    cum = merged.select(
        F.sum("ca").over(w).cast("long").alias("cum_a"),
        F.sum("cb").over(w).cast("long").alias("cum_b"),
    )
    totals = merged.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
    )
    signed = (
        F.col("cum_a").cast(_DEC) * F.col("n_b").cast(_DEC)
        - F.col("cum_b").cast(_DEC) * F.col("n_a").cast(_DEC)
    )
    agg = cum.crossJoin(F.broadcast(totals)).groupBy("n_a", "n_b").agg(
        F.max(signed).alias("dp_num"),
        F.max(-signed).alias("dm_num"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    den = na * nb
    dp = F.col("dp_num").cast("double") / den
    dm = F.col("dm_num").cast("double") / den
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    return agg.select(
        "n_a",
        "n_b",
        F.when(ok, F.round(dp, 6)).alias("d_plus"),
        F.when(ok, F.round(dm, 6)).alias("d_minus"),
        F.when(ok, F.round(dp + dm, 6)).alias("v"),
        F.when(
            ok,
            F.round((dp + dm) * F.sqrt(na * nb / (na + nb)), 6),
        ).alias("v_scaled"),
    )


def bartlett(df: DataFrame, value_col: str, group_col: str,
             scale: int = 1_000_000) -> DataFrame:
    """Bartlett's test — the classical k-group variance-homogeneity
    gate (the parametric, higher-power sibling of the robust
    brown_forsythe: use THIS when the groups are near-normal — cf.
    jarque_bera — and brown_forsythe when they aren't): one row
    (k, n, chi2, c_factor). χ² = [(N−k)·ln S²_p − Σ(nᵢ−1)·ln S²ᵢ]/C,
    C = 1 + (Σ1/(nᵢ−1) − 1/(N−k)) / (3(k−1)).

    Engine-exact: per-group variance numerators CYYᵢ = nᵢΣq²−(Σq)²
    are exact wide integers; each ln/reciprocal term is one fixed
    double expression nano-rounded (×1e9) and exact-summed (the
    entropy recipe), and the final χ² assembly runs once on scalars.
    Groups with nᵢ < 2 or zero variance drop (their ln is undefined),
    per the classical definition.
    """
    q = df.filter(
        F.col(group_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        F.col(group_col).alias("g"), _quant(F.col(value_col), scale).alias("qv")
    )
    per_g = q.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("ni"),
        F.sum(F.col("qv").cast(_DEC)).alias("si"),
        F.sum(F.col("qv").cast(_DEC) * F.col("qv").cast(_DEC)).alias("ssi"),
    )
    cyy = (
        F.col("ni").cast(_DEC) * F.col("ssi") - F.col("si") * F.col("si")
    ).cast("double")
    nid = F.col("ni").cast("double")
    s2 = cyy / (nid * (nid - 1))  # sample variance, grid units²
    NANO = F.lit(1_000_000_000.0)
    kept = per_g.filter((F.col("ni") >= 2) & (cyy > 0))
    agg = kept.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("ni").cast("long").alias("n"),
        F.sum(F.round((nid - 1) * F.log(s2) * NANO).cast(_DEC)).alias("lns_nano"),
        F.sum(F.round(cyy / nid * F.lit(1_000_000.0)).cast(_DEC)).alias(
            "cyy_n_micro"
        ),
        F.sum(F.round(F.lit(1.0) / (nid - 1) * NANO).cast(_DEC)).alias(
            "inv_nano"
        ),
    )
    nd = F.col("n").cast("double")
    kd = F.col("k").cast("double")
    # pooled variance S²_p = Σ(nᵢ−1)S²ᵢ/(N−k) = Σ(CYYᵢ/nᵢ)/(N−k)
    sp2 = (
        F.col("cyy_n_micro").cast("double") / F.lit(1_000_000.0)
    ) / (nd - kd)
    lns = F.col("lns_nano").cast("double") / NANO
    inv = F.col("inv_nano").cast("double") / NANO
    c = 1 + (inv - 1 / (nd - kd)) / (3 * (kd - 1))
    chi2 = ((nd - kd) * F.log(sp2) - lns) / c
    ok = (F.col("k") >= 2) & (F.col("n") > F.col("k"))
    return agg.select(
        "k",
        "n",
        F.when(ok, F.round(chi2, 6)).alias("chi2"),
        F.when(ok, F.round(c, 6)).alias("c_factor"),
    )


def tost_equivalence(
    df: DataFrame,
    value_col: str,
    side_col: str,
    margin: float,
    scale: int = 100,
) -> DataFrame:
    """TOST equivalence gate (two one-sided tests, Welch variances) —
    the test that can POSITIVELY conclude "the metric did NOT move by
    more than ±margin" (welch_t's non-significance never licenses that
    claim): one row (n_a, n_b, mean_a, mean_b, diff, t_lower, t_upper,
    equivalent). t_lower = (Δ+margin)/se, t_upper = (Δ−margin)/se;
    equivalent ⇔ t_lower ≥ 1.645 AND t_upper ≤ −1.645 (the 5% TOST /
    90% CI-inside-margin rule, normal approximation — documented
    stand-in for the t quantile at large n).

    Exactness: the welch_t moment recipe verbatim — exact integer
    per-side moments, u = (nΣx²−(Σx)²)/(n²(n−1)·scale²) one division
    per side, fixed double sequences for both t's; the margin enters
    as an exact literal. One hash aggregate + two-row pivot.
    """
    q = df.filter(
        F.col(value_col).isNotNull() & F.col(side_col).isNotNull()
    ).select(
        F.col(side_col).cast("boolean").alias("side"),
        _quant(F.col(value_col), scale).alias("qv"),
    )
    d19 = F.col("qv").cast("decimal(19,0)")
    per = q.groupBy("side").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("qv").cast(_DEC)).alias("s"),
        F.sum(d19 * d19).alias("ss"),
    )
    side = lambda c, flag: F.max(F.when(F.col("side") == flag, F.col(c)))  # noqa: E731
    wide = per.agg(
        side("n", True).alias("n_a"),
        side("s", True).alias("s_a"),
        side("ss", True).alias("ss_a"),
        side("n", False).alias("n_b"),
        side("s", False).alias("s_b"),
        side("ss", False).alias("ss_b"),
    )
    sc = F.lit(float(scale))
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    mean_a = F.col("s_a").cast("double") / (na * sc)
    mean_b = F.col("s_b").cast("double") / (nb * sc)

    def u(nc, s_, ss_):
        n_ = F.col(nc).cast("double")
        num = (
            F.col(nc).cast(_DEC) * F.col(ss_) - F.col(s_) * F.col(s_)
        ).cast("double")
        return num / (n_ * n_ * (n_ - 1) * sc * sc)

    se = F.sqrt(u("n_a", "s_a", "ss_a") + u("n_b", "s_b", "ss_b"))
    diff = mean_a - mean_b
    tl = (diff + F.lit(float(margin))) / se
    tu = (diff - F.lit(float(margin))) / se
    ok = (F.col("n_a") >= 2) & (F.col("n_b") >= 2) & (se > 0)
    return wide.select(
        "n_a",
        "n_b",
        F.round(mean_a, 6).alias("mean_a"),
        F.round(mean_b, 6).alias("mean_b"),
        F.round(diff, 6).alias("diff"),
        F.when(ok, F.round(tl, 6)).alias("t_lower"),
        F.when(ok, F.round(tu, 6)).alias("t_upper"),
        F.when(ok, (tl >= F.lit(1.645)) & (tu <= F.lit(-1.645))).alias(
            "equivalent"
        ),
    )


def yuen_t(
    df: DataFrame,
    value_col: str,
    side_col: str,
    trim: float = 0.1,
    scale: int = 1_000_000,
) -> DataFrame:
    """Yuen's trimmed two-sample t — the outlier-immune A/B gate
    (welch_t's robust sibling: one whale in either arm moves welch_t,
    not this): one row (n_a, n_b, h_a, h_b, tmean_a, tmean_b, t_stat,
    df). Each side drops its extreme k = ⌊trim·n⌋ per tail for the
    location estimate and Winsorizes them for the variance;
    t = (x̄t_A − x̄t_B)/√(d_A + d_B) with
    d = (n·WSS − WΣ²)/(n·h·(h−1)), df Welch–Satterthwaite on the d's.

    Engine-exact (the trimmed_mean machinery per side): cut order
    statistics and in-window copy counts from integer grid cumulative
    counts, winsorized Σ/Σ² as exact wide integers (clamped tails
    enter as k·cut and k·cut²), every d numerator an exact integer —
    doubles only on the final six scalars. Grid-sized per-side
    windows, never a data-sized sort.
    """
    q = df.filter(
        F.col(value_col).isNotNull() & F.col(side_col).isNotNull()
    ).select(
        F.col(side_col).cast("boolean").alias("g"),
        _quant(F.col(value_col), scale).alias("qv"),
    )
    cells = q.groupBy("g", "qv").agg(F.count(F.lit(1)).cast("long").alias("t"))
    w = Window.partitionBy("g").orderBy("qv").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = cells.select(
        "g", "qv", "t", F.sum("t").over(w).cast("long").alias("cum")
    )
    tot = cells.groupBy("g").agg(F.sum("t").cast("long").alias("n")).select(
        "g", "n", F.floor(F.col("n") * F.lit(trim)).cast("long").alias("k")
    )
    j = cum.join(F.broadcast(tot), "g")
    lo = j.filter(F.col("cum") >= F.col("k") + 1).groupBy("g").agg(
        F.min("qv").alias("lo_q")
    )
    hi = j.filter(F.col("cum") >= F.col("n") - F.col("k")).groupBy("g").agg(
        F.min("qv").alias("hi_q")
    )
    inwin = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("cum"), F.col("n") - F.col("k"))
        - F.greatest(F.col("cum") - F.col("t"), F.col("k")),
    )
    sums = j.groupBy("g", "n", "k").agg(
        F.sum(F.col("qv").cast(_DEC) * inwin.cast(_DEC)).alias("tsum"),
        F.sum(
            F.col("qv").cast(_DEC) * F.col("qv").cast(_DEC) * inwin.cast(_DEC)
        ).alias("tss"),
    )
    side = (
        sums.join(F.broadcast(lo), "g")
        .join(F.broadcast(hi), "g")
        .select(
            "g",
            "n",
            "k",
            (F.col("n") - 2 * F.col("k")).alias("h"),
            (
                F.col("tsum")
                + F.col("k").cast(_DEC) * F.col("lo_q").cast(_DEC)
                + F.col("k").cast(_DEC) * F.col("hi_q").cast(_DEC)
            ).alias("wsum"),
            (
                F.col("tss")
                + F.col("k").cast(_DEC)
                * F.col("lo_q").cast(_DEC) * F.col("lo_q").cast(_DEC)
                + F.col("k").cast(_DEC)
                * F.col("hi_q").cast(_DEC) * F.col("hi_q").cast(_DEC)
            ).alias("wss"),
            "tsum",
        )
    )
    pick = lambda c, flag: F.max(F.when(F.col("g") == flag, F.col(c)))  # noqa: E731
    wide = side.agg(
        pick("n", True).alias("n_a"),
        pick("k", True).alias("k_a"),
        pick("h", True).alias("h_a"),
        pick("tsum", True).alias("tsum_a"),
        pick("wsum", True).alias("wsum_a"),
        pick("wss", True).alias("wss_a"),
        pick("n", False).alias("n_b"),
        pick("k", False).alias("k_b"),
        pick("h", False).alias("h_b"),
        pick("tsum", False).alias("tsum_b"),
        pick("wsum", False).alias("wsum_b"),
        pick("wss", False).alias("wss_b"),
    )
    sc = F.lit(float(scale))

    def tmean(t_, h_):
        return F.col(t_).cast("double") / (F.col(h_).cast("double") * sc)

    def dvar(n_, h_, wss_, wsum_):
        num = (
            F.col(n_).cast(_DEC) * F.col(wss_) - F.col(wsum_) * F.col(wsum_)
        ).cast("double")
        nd = F.col(n_).cast("double")
        hd = F.col(h_).cast("double")
        return num / (nd * hd * (hd - 1) * sc * sc)

    da = dvar("n_a", "h_a", "wss_a", "wsum_a")
    db = dvar("n_b", "h_b", "wss_b", "wsum_b")
    t_stat = (tmean("tsum_a", "h_a") - tmean("tsum_b", "h_b")) / F.sqrt(da + db)
    dof = (da + db) * (da + db) / (
        da * da / (F.col("h_a").cast("double") - 1)
        + db * db / (F.col("h_b").cast("double") - 1)
    )
    ok = (F.col("h_a") >= 2) & (F.col("h_b") >= 2)
    return wide.select(
        "n_a",
        "n_b",
        "h_a",
        "h_b",
        F.round(tmean("tsum_a", "h_a"), 6).alias("tmean_a"),
        F.round(tmean("tsum_b", "h_b"), 6).alias("tmean_b"),
        F.when(ok & (da + db > 0), F.round(t_stat, 6)).alias("t_stat"),
        F.when(ok & (da > 0) & (db > 0), F.round(dof, 6)).alias("df"),
    )


def weighted_kappa(
    df: DataFrame,
    a_col: str,
    b_col: str,
    weight: str = "quadratic",
) -> DataFrame:
    """Weighted Cohen's kappa for ORDINAL raters — near-misses count
    (plain cohen_kappa scores a low/mid disagreement exactly like
    low/high; with quadratic weights the penalty grows as (i−j)²):
    one row (n, k_cats, kappa_weighted). Categories must be integer
    levels (0,1,2,…). κ_w = 1 − Σwᵢⱼ·Oᵢⱼ / Σwᵢⱼ·Eᵢⱼ with
    wᵢⱼ = (i−j)² ('quadratic', default) or |i−j| ('linear').

    Engine-exact and division-free until the end: with Eᵢⱼ = rᵢ·cⱼ/n,
    the ratio rescales to exact wide integers —
    κ_w = 1 − n·Σw·Oᵢⱼ / Σw·rᵢ·cⱼ — one division total. One crosstab
    aggregate + two broadcast marginals (the k×k cell frame is tiny).
    """
    q = df.filter(F.col(a_col).isNotNull() & F.col(b_col).isNotNull()).select(
        F.col(a_col).cast("long").alias("a"), F.col(b_col).cast("long").alias("b")
    )
    cells = q.groupBy("a", "b").agg(F.count(F.lit(1)).cast("long").alias("o"))
    ra = q.groupBy("a").agg(F.count(F.lit(1)).cast("long").alias("r"))
    cb = q.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = q.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.countDistinct("a").cast("long").alias("ka"),
        F.countDistinct("b").cast("long").alias("kb"),
    )
    diff = F.abs(F.col("a") - F.col("b")).cast(_DEC)
    wexpr = diff * diff if weight == "quadratic" else diff
    num = cells.agg(
        F.sum(wexpr * F.col("o").cast(_DEC)).alias("wo")
    )
    # expected side: every (a,b) marginal pair, not only observed cells
    den = (
        ra.crossJoin(cb)
        .agg(
            F.sum(
                wexpr * F.col("r").cast(_DEC) * F.col("c").cast(_DEC)
            ).alias("wrc")
        )
    )
    out = tot.crossJoin(F.broadcast(num)).crossJoin(F.broadcast(den))
    return out.select(
        "n",
        F.greatest("ka", "kb").alias("k_cats"),
        F.when(
            F.col("wrc") > 0,
            F.round(
                1
                - (F.col("n").cast(_DEC) * F.col("wo")).cast("double")
                / F.col("wrc").cast("double"),
                6,
            ),
        ).alias("kappa_weighted"),
    )


def diff_in_diff(
    df: DataFrame,
    value_col: str,
    group_col: str,
    period_col: str,
    scale: int = 100,
) -> DataFrame:
    """Difference-in-differences — the parallel-trends causal gate:
    one row (n, did, se, z, plus the four cell means). Treatment
    group = TRUE side of group_col, post period = TRUE side of
    period_col; DiD = (ȳ_treat,post − ȳ_treat,pre) −
    (ȳ_ctrl,post − ȳ_ctrl,pre); SE = √Σᵢuᵢ over the four cells with
    u = (nΣx²−(Σx)²)/(n²(n−1)·scale²) — the welch_t variance recipe
    cell-wise. The A/B answer when assignment wasn't random but both
    cohorts share a pre-period.

    Exact: one (group, period) hash aggregate of integer moments, a
    four-cell pivot, fixed double sequences (one sqrt) on final
    scalars. Cells with n < 2 → NULL se/z.
    """
    q = df.filter(
        F.col(value_col).isNotNull()
        & F.col(group_col).isNotNull()
        & F.col(period_col).isNotNull()
    ).select(
        F.col(group_col).cast("boolean").alias("g"),
        F.col(period_col).cast("boolean").alias("p"),
        _quant(F.col(value_col), scale).alias("qv"),
    )
    d19 = F.col("qv").cast("decimal(19,0)")
    per = q.groupBy("g", "p").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("qv").cast(_DEC)).alias("s"),
        F.sum(d19 * d19).alias("ss"),
    )
    cell = lambda c, gf, pf: F.max(  # noqa: E731
        F.when((F.col("g") == gf) & (F.col("p") == pf), F.col(c))
    )
    wide = per.agg(
        *[
            cell(c, gf, pf).alias(f"{c}_{tag}")
            for (gf, pf, tag) in [
                (True, False, "t0"), (True, True, "t1"),
                (False, False, "c0"), (False, True, "c1"),
            ]
            for c in ("n", "s", "ss")
        ]
    )
    sc = F.lit(float(scale))

    def mean(tag):
        return F.col(f"s_{tag}").cast("double") / (
            F.col(f"n_{tag}").cast("double") * sc
        )

    def u(tag):
        n_ = F.col(f"n_{tag}").cast("double")
        num = (
            F.col(f"n_{tag}").cast(_DEC) * F.col(f"ss_{tag}")
            - F.col(f"s_{tag}") * F.col(f"s_{tag}")
        ).cast("double")
        return num / (n_ * n_ * (n_ - 1) * sc * sc)

    did = (mean("t1") - mean("t0")) - (mean("c1") - mean("c0"))
    se = F.sqrt(u("t0") + u("t1") + u("c0") + u("c1"))
    ok = (
        (F.col("n_t0") >= 2) & (F.col("n_t1") >= 2)
        & (F.col("n_c0") >= 2) & (F.col("n_c1") >= 2)
    )
    ntot = (
        F.col("n_t0") + F.col("n_t1") + F.col("n_c0") + F.col("n_c1")
    ).cast("long")
    return wide.select(
        ntot.alias("n"),
        F.round(mean("t0"), 6).alias("mean_treat_pre"),
        F.round(mean("t1"), 6).alias("mean_treat_post"),
        F.round(mean("c0"), 6).alias("mean_ctrl_pre"),
        F.round(mean("c1"), 6).alias("mean_ctrl_post"),
        F.round(did, 6).alias("did"),
        F.when(ok, F.round(se, 6)).alias("se"),
        F.when(ok & (se > 0), F.round(did / se, 6)).alias("z"),
    )


def fisher_corr_ci(
    df: DataFrame,
    x_col: str,
    y_col: str,
    x_scale: int = 1_000_000,
    y_scale: int = 1_000_000,
) -> DataFrame:
    """Pearson correlation with the Fisher-z 95% interval — the "how
    sure are we about r" companion stat_pearson leaves out: one row
    (n, r, z_fisher, ci_lo, ci_hi). z = atanh(r) = ½ln((1+r)/(1−r)),
    half-width 1.96/√(n−3), endpoints mapped back through tanh
    (written as exp-based identities — both engines replay the same
    fixed sequence on the exact-moment r).

    Exact: the r numerator/denominators combine IN DECIMAL from exact
    integer moments and cast to double once (_corr_from_moments
    discipline); |r| = 1 or n < 4 → NULL interval.
    """
    q = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull()).select(
        _quant(F.col(x_col), x_scale).alias("qx"),
        _quant(F.col(y_col), y_scale).alias("qy"),
    )
    m = q.agg(*_moment_aggs())
    nd = F.col("n").cast(_DEC)
    num = (nd * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = (nd * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    dy = (nd * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    r = num / (F.sqrt(dx) * F.sqrt(dy))
    z = F.lit(0.5) * F.log((1 + r) / (1 - r))
    hw = F.lit(1.96) / F.sqrt(F.col("n").cast("double") - 3)
    lo = z - hw
    hi = z + hw
    # tanh via exp: (e^{2z} - 1)/(e^{2z} + 1)
    back = lambda t: (F.exp(2 * t) - 1) / (F.exp(2 * t) + 1)  # noqa: E731
    ok = (F.col("n") >= 4) & (dx > 0) & (dy > 0)
    inbounds = ok & (r < 1) & (r > -1)
    return m.select(
        "n",
        F.when(ok, F.round(r, 6)).alias("r"),
        F.when(inbounds, F.round(z, 6)).alias("z_fisher"),
        F.when(inbounds, F.round(back(lo), 6)).alias("ci_lo"),
        F.when(inbounds, F.round(back(hi), 6)).alias("ci_hi"),
    )


def cochran_c(df: DataFrame, value_col: str, group_col: str,
              scale: int = 100) -> DataFrame:
    """Cochran's C variance-outlier gate — "is ONE group's variance
    dominating the pool" (bartlett says the variances differ; C says
    WHICH one and by how much): one row (k, n, c_stat, worst_group,
    worst_var, c_uniform). C = max sᵢ² / Σ sᵢ²; under homogeneity
    C ≈ 1/k (reported as c_uniform for the read-off). The
    heteroscedasticity triage step before deciding between welch_t
    and a pooled test.

    Exact: per-group sample variances from exact integer CYY
    numerators; the Σ side micro-rounds each sᵢ² (×1e6, grid units²)
    and exact-sums; the max side picks deterministically (smallest
    group label on ties). Groups with n < 2 drop. One aggregate +
    one k-row fold.
    """
    q = df.filter(
        F.col(group_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        F.col(group_col).alias("g"), _quant(F.col(value_col), scale).alias("qv")
    )
    per_g = q.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("ni"),
        F.sum(F.col("qv").cast(_DEC)).alias("si"),
        F.sum(F.col("qv").cast(_DEC) * F.col("qv").cast(_DEC)).alias("ssi"),
    ).filter(F.col("ni") >= 2)
    cyy = (
        F.col("ni").cast(_DEC) * F.col("ssi") - F.col("si") * F.col("si")
    ).cast("double")
    nid = F.col("ni").cast("double")
    s2 = cyy / (nid * (nid - 1))
    staged = per_g.select("g", "ni", s2.alias("s2"))
    wall = Window.partitionBy(F.lit(1))
    sc2 = F.lit(float(scale) * float(scale))
    agg = (
        staged.withColumn("smax", F.max("s2").over(wall))
        .agg(
            F.count(F.lit(1)).cast("long").alias("k"),
            F.sum("ni").cast("long").alias("n"),
            F.sum(
                F.round(F.col("s2") * F.lit(1_000_000.0)).cast(_DEC)
            ).alias("ssum_micro"),
            F.max("smax").alias("smax"),
            F.min(F.when(F.col("s2") == F.col("smax"), F.col("g"))).alias(
                "worst_group"
            ),
        )
    )
    ssum = F.col("ssum_micro").cast("double") / F.lit(1_000_000.0)
    return agg.select(
        "k",
        "n",
        F.when(ssum > 0, F.round(F.col("smax") / ssum, 6)).alias("c_stat"),
        "worst_group",
        F.round(F.col("smax") / sc2, 6).alias("worst_var"),
        F.when(
            F.col("k") > 0,
            F.round(F.lit(1.0) / F.col("k").cast("double"), 6),
        ).alias("c_uniform"),
    )


def min_detectable_effect(
    df: DataFrame,
    arm_col: str,
    success_col: str,
    alpha_z: float = 1.96,
    power_z: float = 0.8416,
) -> DataFrame:
    """A/B minimum detectable effect — "with the traffic we actually
    have, how small a lift could the prop z-test even see" (the
    planning twin of stat_prop_ztest; run BEFORE the experiment):
    one row (n_a, n_b, p_base, mde_abs, mde_rel).
    MDE = (z_{α/2}+z_{power})·√(p̄(1−p̄)(1/n_a+1/n_b)) with the
    classic 1.96/0.8416 literals (5% two-sided, 80% power).

    Exact: arm sizes and the pooled base rate are exact integers from
    ONE fold; the MDE is a fixed double sequence (one sqrt).
    """
    q = df.filter(
        F.col(arm_col).isNotNull() & F.col(success_col).isNotNull()
    ).select(
        F.col(arm_col).cast("boolean").alias("a"),
        F.col(success_col).cast("boolean").cast("int").alias("y"),
    )
    agg = q.agg(
        F.sum(F.col("a").cast("int")).cast("long").alias("n_a"),
        F.sum((~F.col("a")).cast("int")).cast("long").alias("n_b"),
        F.sum("y").cast("long").alias("pos"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    p = F.col("pos").cast("double") / F.col("n").cast("double")
    mde = F.lit(float(alpha_z) + float(power_z)) * F.sqrt(
        p * (1 - p) * (1 / na + 1 / nb)
    )
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0) & (F.col("pos") > 0)
    return agg.select(
        "n_a",
        "n_b",
        F.round(p, 6).alias("p_base"),
        F.when(ok, F.round(mde, 6)).alias("mde_abs"),
        F.when(ok, F.round(mde / p, 6)).alias("mde_rel"),
    )


def lorenz_curve(
    df: DataFrame,
    value_col: str,
    n_points: int = 10,
    scale: int = 100,
) -> DataFrame:
    """Lorenz curve decile table — the SHAPE behind gini_coefficient's
    one number: rows (pct_population, pct_mass) for p = 1/k … k/k,
    "the bottom 30% of users carry 4.1% of the spend". Points are
    exact grid order statistics: at each population decile boundary
    ⌈p·n⌉ the cumulative mass splits a tied value block
    proportionally by count (the trimmed_mean in-window idiom), so
    two engines cannot disagree at a boundary inside a tie.

    Exact: one value-grid aggregate, cumulative (count, mass) prefix
    sums over the DISTINCT grid, a broadcast k-row boundary frame,
    one division per point.
    """
    q = df.filter(F.col(value_col).isNotNull()).select(
        _quant(F.col(value_col), scale).alias("qv")
    )
    cells = q.groupBy("qv").agg(F.count(F.lit(1)).cast("long").alias("t"))
    w = Window.orderBy("qv").rowsBetween(Window.unboundedPreceding, 0)
    cum = cells.select(
        "qv",
        "t",
        F.sum("t").over(w).cast("long").alias("cum"),
        F.sum(F.col("qv").cast(_DEC) * F.col("t").cast(_DEC)).over(w).alias(
            "mass"
        ),
    )
    tot = cells.agg(
        F.sum("t").cast("long").alias("n"),
        F.sum(F.col("qv").cast(_DEC) * F.col("t").cast(_DEC)).alias("total"),
    )
    spark = df.sparkSession
    pts = spark.range(1, n_points + 1).select(
        F.col("id").cast("long").alias("k")
    )
    j = (
        cum.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(pts))
        .select(
            "k",
            "n",
            "total",
            F.ceil(F.col("n") * F.col("k") / F.lit(n_points)).cast("long").alias(
                "thr"
            ),
            "qv",
            "t",
            "cum",
            "mass",
        )
        .filter(
            (F.col("cum") >= F.col("thr"))
            & (F.col("cum") - F.col("t") < F.col("thr"))
        )
    )
    # mass below the boundary + the tied block's proportional slice
    part = (
        F.col("mass")
        - F.col("qv").cast(_DEC)
        * (F.col("cum") - F.col("thr")).cast(_DEC)
    )
    return j.select(
        F.round(
            F.col("k").cast("double") / F.lit(float(n_points)), 6
        ).alias("pct_population"),
        F.when(
            F.col("total") > 0,
            F.round(part.cast("double") / F.col("total").cast("double"), 6),
        ).alias("pct_mass"),
    )
