"""Statistical QA gates (stats.py) + phonetic blocking (phonetic.py):
hand-checked values, tie handling, NULL discipline, degenerate groups."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kgraph_spark.operators.phonetic import phonetic_blocks, soundex_key
from kgraph_spark.operators.stats import (
    chi2_independence,
    ks_2sample,
    mann_whitney_u,
    ols_trend,
    pearson_corr,
    spearman_corr,
)


def _pearson(xs, ys):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    num = n * sxy - sx * sy
    dx, dy = n * sxx - sx * sx, n * syy - sy * sy
    return num / (math.sqrt(dx) * math.sqrt(dy))


def test_pearson_hand_case(spark):
    xs = [1, 2, 3, 4, 10]
    ys = [2, 1, 4, 3, 9]
    df = spark.createDataFrame(list(zip(xs, ys)), "x long, y long")
    row = pearson_corr(df, "x", "y").first()
    assert row["n"] == 5
    assert row["corr"] == pytest.approx(round(_pearson(xs, ys), 6), abs=1e-9)


def test_pearson_null_rows_and_constant(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, None), (None, 3.0), (3, 2.0)], "x long, y double"
    )
    row = pearson_corr(df, "x", "y", y_scale=10).first()
    assert row["n"] == 2  # pairwise-complete only
    const = spark.createDataFrame([(1, 5), (2, 5), (3, 5)], "x long, y long")
    assert pearson_corr(const, "x", "y").first()["corr"] is None


def test_pearson_grouped(spark):
    df = spark.createDataFrame(
        [("a", 1, 1), ("a", 2, 2), ("a", 3, 3), ("b", 1, 3), ("b", 2, 2), ("b", 3, 1)],
        "g string, x long, y long",
    )
    got = {r["g"]: r["corr"] for r in pearson_corr(df, "x", "y", "g").collect()}
    assert got["a"] == pytest.approx(1.0)
    assert got["b"] == pytest.approx(-1.0)


def test_spearman_monotone_and_ties(spark):
    # monotone but nonlinear → spearman 1, pearson < 1
    df = spark.createDataFrame([(1, 1), (2, 4), (3, 9), (4, 100)], "x long, y long")
    assert spearman_corr(df, "x", "y").first()["spearman"] == pytest.approx(1.0)
    # tie case checked against midrank formula by hand:
    # x = [1,1,2], midranks [1.5,1.5,3]; y = [2,3,3], midranks [1,2.5,2.5]
    tied = spark.createDataFrame([(1, 2), (1, 3), (2, 3)], "x long, y long")
    expect = _pearson([3, 3, 6], [2, 5, 5])  # doubled midranks
    assert tied.count() == 3
    got = spearman_corr(tied, "x", "y").first()["spearman"]
    assert got == pytest.approx(round(expect, 6), abs=1e-9)


def test_ks_hand_case(spark):
    a = spark.createDataFrame([(v,) for v in [1.0, 2.0, 3.0, 4.0]], "v double")
    b = spark.createDataFrame([(v,) for v in [3.0, 4.0, 5.0, 6.0]], "v double")
    row = ks_2sample(a, b, "v").first()
    # F_a - F_b maxes at v=2: |2/4 - 0/4| = 0.5
    assert (row["n_a"], row["n_b"]) == (4, 4)
    assert row["ks_d"] == pytest.approx(0.5)
    assert row["at_value"] == pytest.approx(2.0)


def test_ks_identical_and_tiebreak(spark):
    a = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    same = ks_2sample(a, a, "v").first()
    assert same["ks_d"] == pytest.approx(0.0)
    # two values reach the max diff → smallest reported
    b = spark.createDataFrame([(3.0,), (4.0,)], "v double")
    row = ks_2sample(a, b, "v").first()
    assert row["ks_d"] == pytest.approx(1.0)
    assert row["at_value"] == pytest.approx(2.0)


def _mwu_brute(a, b):
    u = 0.0
    for x in a:
        for y in b:
            u += 1.0 if x > y else (0.5 if x == y else 0.0)
    return u


def test_mwu_hand_case_with_ties(spark):
    a_vals = [1.0, 2.0, 2.0, 5.0]
    b_vals = [2.0, 3.0, 4.0]
    a = spark.createDataFrame([(v,) for v in a_vals], "v double")
    b = spark.createDataFrame([(v,) for v in b_vals], "v double")
    row = mann_whitney_u(a, b, "v").first()
    u_a = _mwu_brute(a_vals, b_vals)
    assert (row["n_a"], row["n_b"]) == (4, 3)
    assert row["u_a"] == pytest.approx(u_a)
    assert row["u_b"] == pytest.approx(4 * 3 - u_a)
    assert row["auc"] == pytest.approx(round(u_a / 12, 6))
    # tie-corrected z against the textbook formula
    n, na, nb = 7, 4, 3
    ties_t = (3**3 - 3)  # value 2.0 appears 3 times
    var = na * nb / 12 * ((n + 1) - ties_t / (n * (n - 1)))
    z = (u_a - na * nb / 2) / math.sqrt(var)
    assert row["z"] == pytest.approx(round(z, 6), abs=1e-9)


def test_mwu_all_tied_z_null(spark):
    a = spark.createDataFrame([(1.0,), (1.0,)], "v double")
    row = mann_whitney_u(a, a, "v").first()
    assert row["auc"] == pytest.approx(0.5)
    assert row["z"] is None


def test_ols_trend_exact_line_and_degenerate(spark):
    rows = [("u", 100, 1.0), ("u", 200, 3.0), ("u", 300, 5.0), ("v", 50, 7.0)]
    df = spark.createDataFrame(rows, "g string, x long, y double")
    got = {r["g"]: r for r in ols_trend(df, "x", "y", "g").collect()}
    # exact line y = 0.02·(x−100) + 1
    assert got["u"]["slope"] == pytest.approx(0.02)
    assert got["u"]["intercept"] == pytest.approx(1.0)
    assert got["u"]["x_min"] == 100
    # single point → NULL fit, but the row still reports
    assert got["v"]["slope"] is None and got["v"]["intercept"] is None


def test_chi2_hand_case(spark):
    # classic 2x2: [[10, 20], [20, 10]]
    rows = (
        [("a", "x")] * 10 + [("a", "y")] * 20 + [("b", "x")] * 20 + [("b", "y")] * 10
    )
    df = spark.createDataFrame(rows, "a string, b string")
    row = chi2_independence(df, "a", "b").first()
    # chi2 = n(ad-bc)^2 / (r1 r2 c1 c2) = 60*(100-400)^2/30^4 = 6.666...
    assert row["n"] == 60 and row["dof"] == 1
    assert row["chi2"] == pytest.approx(6.666667, abs=2e-6)
    assert row["cramers_v"] == pytest.approx(round(math.sqrt(6.666667 / 60), 6), abs=2e-6)


def test_chi2_independent_is_zero(spark):
    rows = [(a, b) for a in ("a", "b") for b in ("x", "y") for _ in range(5)]
    df = spark.createDataFrame(rows, "a string, b string")
    row = chi2_independence(df, "a", "b").first()
    assert row["chi2"] == pytest.approx(0.0)


def _soundex_ref(word: str) -> str:
    codes = dict(zip("ABCDEFGHIJKLMNOPQRSTUVWXYZ", "01230120022455012623010202"))
    u = "".join(ch for ch in word.upper() if ch.isalpha())
    if not u:
        return None
    s = "".join(codes[c] for c in u)
    # drop runs: keep chars differing from predecessor
    out = [s[0]]
    for c in s[1:]:
        if c != out[-1]:
            out.append(c)
    tail = "".join(out)[1:].replace("0", "")
    return u[0] + (tail + "000")[:3]


def test_soundex_known_keys(spark):
    words = ["Robert", "Rupert", "Pfister", "Tymczak", "red", "rod", "dad", "a", "x9"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {r["w"]: r["k"] for r in df.select("w", soundex_key(F.col("w")).alias("k")).collect()}
    for w in words:
        assert got[w] == _soundex_ref(w), w
    assert got["Robert"] == got["Rupert"] == "R163"
    assert got["Pfister"] == "P236"  # lead-letter code collapses with F
    assert got["red"] == got["rod"] == "R300"
    assert got["a"] == "A000"


def test_phonetic_blocks(spark):
    df = spark.createDataFrame(
        [("the red rod, a red gear",), ("blue gear!",)], "text string"
    )
    got = phonetic_blocks(df, "text", min_block=2).collect()
    block = {(r["word"], r["soundex_key"], r["n_in_block"]) for r in got}
    assert block == {("red", "R300", 2), ("rod", "R300", 2)}
    allrows = phonetic_blocks(df, "text").collect()
    assert {r["word"] for r in allrows} == {"the", "red", "rod", "a", "gear", "blue"}


def test_anova_two_groups_matches_hand_formula(spark):
    a_vals = [1.0, 2.0, 3.0]
    b_vals = [4.0, 6.0]
    rows = [("a", v) for v in a_vals] + [("b", v) for v in b_vals]
    df = spark.createDataFrame(rows, "g string, v double")
    row = __import__("kgraph_spark.operators.stats", fromlist=["anova_f"]).anova_f(
        df, "v", "g"
    ).first()
    all_vals = a_vals + b_vals
    grand = sum(all_vals) / len(all_vals)
    ssb = sum(
        len(g) * (sum(g) / len(g) - grand) ** 2 for g in (a_vals, b_vals)
    )
    ssw = sum(
        (v - sum(g) / len(g)) ** 2 for g in (a_vals, b_vals) for v in g
    )
    f = (ssb / 1) / (ssw / 3)
    assert row["n"] == 5 and row["k"] == 2
    assert row["ss_between"] == pytest.approx(ssb, abs=1e-5)
    assert row["ss_within"] == pytest.approx(ssw, abs=1e-5)
    assert row["f_stat"] == pytest.approx(f, abs=1e-4)
    assert row["eta_sq"] == pytest.approx(ssb / (ssb + ssw), abs=1e-5)


def test_anova_single_group_null_f(spark):
    df = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "g string, v double")
    from kgraph_spark.operators.stats import anova_f

    row = anova_f(df, "v", "g").first()
    assert row["k"] == 1 and row["f_stat"] is None


def test_prop_ztest_hand_case(spark):
    from kgraph_spark.operators.stats import prop_ztest

    a = spark.createDataFrame([(True,)] * 30 + [(False,)] * 70, "f boolean")
    b = spark.createDataFrame([(True,)] * 20 + [(False,)] * 80, "f boolean")
    row = prop_ztest(a, b, "f").first()
    assert (row["n_a"], row["x_a"], row["n_b"], row["x_b"]) == (100, 30, 100, 20)
    p = 50 / 200
    z = (0.3 - 0.2) / math.sqrt(p * (1 - p) * (1 / 100 + 1 / 100))
    assert row["z"] == pytest.approx(z, abs=1e-5)
    assert row["p_a"] == pytest.approx(0.3) and row["p_b"] == pytest.approx(0.2)


def test_prop_ztest_degenerate_null_z(spark):
    from kgraph_spark.operators.stats import prop_ztest

    a = spark.createDataFrame([(True,), (True,)], "f boolean")
    assert prop_ztest(a, a, "f").first()["z"] is None


def test_cohens_d_hand_case(spark):
    from kgraph_spark.operators.stats import cohens_d

    a_vals = [2.0, 4.0, 6.0]
    b_vals = [1.0, 2.0, 3.0]
    a = spark.createDataFrame([(v,) for v in a_vals], "v double")
    b = spark.createDataFrame([(v,) for v in b_vals], "v double")
    row = cohens_d(a, b, "v").first()
    ma, mb = 4.0, 2.0
    pooled = ((2 * 4.0) + (2 * 1.0)) / 4  # (n-1)s² sums / (n_a+n_b-2)
    d = (ma - mb) / math.sqrt(pooled)
    assert row["mean_a"] == pytest.approx(ma) and row["mean_b"] == pytest.approx(mb)
    assert row["d"] == pytest.approx(d, abs=1e-5)


def test_cohens_d_zero_variance_null(spark):
    from kgraph_spark.operators.stats import cohens_d

    a = spark.createDataFrame([(1.0,), (1.0,)], "v double")
    assert cohens_d(a, a, "v").first()["d"] is None


def test_gini_uniform_is_zero(spark):
    from kgraph_spark.operators.stats import gini_coefficient

    df = spark.createDataFrame([(5,)] * 4, "x long")
    row = gini_coefficient(df, "x").first()
    assert row["n"] == 4 and row["total"] == 20 and row["gini"] == 0.0


def test_gini_total_concentration(spark):
    from kgraph_spark.operators.stats import gini_coefficient

    # one key owns everything: G = (n-1)/n
    df = spark.createDataFrame([(0,), (0,), (0,), (12,)], "x long")
    row = gini_coefficient(df, "x").first()
    assert row["gini"] == pytest.approx(0.75)


def test_gini_hand_case_grouped(spark):
    from kgraph_spark.operators.stats import gini_coefficient

    # g1: x = [1,2,3] → G = (2*(1+4+9) - 4*6) / (3*6) = 4/18
    df = spark.createDataFrame(
        [("g1", 1), ("g1", 2), ("g1", 3), ("g2", 7)], "g string, x long"
    )
    out = {r["g"]: r for r in gini_coefficient(df, "x", "g").collect()}
    assert out["g1"]["gini"] == pytest.approx(4 / 18, abs=1e-6)
    assert out["g2"]["gini"] == 0.0  # single key: no inequality measurable


def test_kendall_tau_perfect_and_reversed(spark):
    from kgraph_spark.operators.stats import kendall_tau

    up = spark.createDataFrame([(i, i * 2) for i in range(5)], "x long, y long")
    row = kendall_tau(up, "x", "y").first()
    assert row["tau"] == 1.0 and row["concordant"] == 10 and row["discordant"] == 0
    down = spark.createDataFrame([(i, -i) for i in range(5)], "x long, y long")
    assert kendall_tau(down, "x", "y").first()["tau"] == -1.0


def test_kendall_tau_ties_counted_in_denominator(spark):
    from kgraph_spark.operators.stats import kendall_tau

    # (1,1),(2,1),(3,2): pair(1,2) tied on y → tau-a = 2/3
    df = spark.createDataFrame([(1, 1), (2, 1), (3, 2)], "x long, y long")
    row = kendall_tau(df, "x", "y").first()
    assert row["concordant"] == 2 and row["discordant"] == 0
    assert row["tau"] == pytest.approx(2 / 3, abs=1e-6)


def test_theil_sen_exact_line_with_outlier(spark):
    from kgraph_spark.operators.stats import theil_sen_slope

    # y = 3x except one wild outlier; median slope stays 3
    rows = [(x, 3 * x) for x in range(1, 8)] + [(9, 1000)]
    df = spark.createDataFrame(rows, "x long, y long")
    row = theil_sen_slope(df, "x", "y").first()
    assert row["n"] == 8 and row["slope"] == pytest.approx(3.0)


def test_theil_sen_even_count_mean_of_middles(spark):
    from kgraph_spark.operators.stats import theil_sen_slope

    # points (0,0),(1,1),(2,4): slopes 1, 2, 3 → odd → median 2
    df = spark.createDataFrame([(0, 0), (1, 1), (2, 4)], "x long, y long")
    assert theil_sen_slope(df, "x", "y").first()["slope"] == pytest.approx(2.0)
    # (0,0),(1,1),(2,4),(3,9): 6 slopes [1,2,3,3,4,5]... median = (3+3)/2
    df4 = spark.createDataFrame([(0, 0), (1, 1), (2, 4), (3, 9)], "x long, y long")
    row = theil_sen_slope(df4, "x", "y").first()
    assert row["n_slopes"] == 6 and row["slope"] == pytest.approx(3.0)


def test_welch_t_hand_case(spark):
    from kgraph_spark.operators.stats import welch_t

    # A=[1,2,3]: mean 2, u = 1/3; B=[2,4,6,8]: mean 5, u = (20/3)/4 = 5/3
    # t = -3/sqrt(2); df = 4/(1/18 + 25/27) = 216/53
    rows = [(1.0, True), (2.0, True), (3.0, True)] + [
        (float(v), False) for v in (2, 4, 6, 8)
    ]
    df = spark.createDataFrame(rows, "v double, side boolean")
    r = welch_t(df, "v", "side").first()
    assert r["n_a"] == 3 and r["n_b"] == 4
    assert r["mean_a"] == pytest.approx(2.0) and r["mean_b"] == pytest.approx(5.0)
    assert r["t_stat"] == pytest.approx(-3 / math.sqrt(2), abs=1e-6)
    assert r["df_welch"] == pytest.approx(216 / 53, abs=1e-6)


def test_welch_t_degenerate_sides(spark):
    from kgraph_spark.operators.stats import welch_t

    # zero combined variance -> NULL t; single-element side -> NULL t;
    # a group missing one side entirely is dropped
    rows = [
        ("flat", 5.0, True), ("flat", 5.0, True),
        ("flat", 5.0, False), ("flat", 5.0, False),
        ("tiny", 1.0, True),
        ("tiny", 2.0, False), ("tiny", 9.0, False),
        ("onesided", 3.0, True), ("onesided", 4.0, True),
    ]
    df = spark.createDataFrame(rows, "g string, v double, side boolean")
    out = {r["g"]: r for r in welch_t(df, "v", "side", "g").collect()}
    assert set(out) == {"flat", "tiny"}
    assert out["flat"]["t_stat"] is None and out["flat"]["df_welch"] is None
    assert out["tiny"]["t_stat"] is None


def test_brown_forsythe_hand_case(spark):
    from kgraph_spark.operators.stats import brown_forsythe

    # g1=[1,2,3,4,10]: med 3, |z|=[2,1,0,1,7]; g2=[5]*5: all-zero z
    # SSB = 121/5 - 121/10 = 12.1; SSW = 55 - 24.2 = 30.8
    # F = 12.1 / (30.8/8) = 3.142857
    rows = [("g1", float(v)) for v in (1, 2, 3, 4, 10)] + [("g2", 5.0)] * 5
    df = spark.createDataFrame(rows, "g string, v double")
    r = brown_forsythe(df, "v", "g", scale=1).first()
    assert r["n"] == 10 and r["k"] == 2
    assert r["ss_between"] == pytest.approx(12.1, abs=1e-6)
    assert r["ss_within"] == pytest.approx(30.8, abs=1e-6)
    assert r["f_stat"] == pytest.approx(12.1 / (30.8 / 8), abs=1e-6)


def test_mann_kendall_no_ties(spark):
    from kgraph_spark.operators.stats import mann_kendall

    # strictly increasing n=5: S=10, Var=5*4*15/18, z=9/sqrt(Var)
    df = spark.createDataFrame([(i, i) for i in range(1, 6)], "x long, y long")
    r = mann_kendall(df, "x", "y").first()
    assert r["n"] == 5 and r["s"] == 10
    assert r["var_s"] == pytest.approx(300 / 18, abs=1e-6)
    assert r["z"] == pytest.approx(9 / math.sqrt(300 / 18), abs=1e-6)


def test_mann_kendall_value_ties(spark):
    from kgraph_spark.operators.stats import mann_kendall

    # y=[1,1,2,2,3]: S=8, value-tie term 2*(2*1*9)=36 -> Var=(300-36)/18
    df = spark.createDataFrame(
        list(zip(range(1, 6), (1, 1, 2, 2, 3))), "x long, y long"
    )
    r = mann_kendall(df, "x", "y").first()
    assert r["s"] == 8
    assert r["var_s"] == pytest.approx(264 / 18, abs=1e-6)
    assert r["z"] == pytest.approx(7 / math.sqrt(264 / 18), abs=1e-6)


def test_mann_kendall_time_ties_and_flat(spark):
    from kgraph_spark.operators.stats import mann_kendall

    # tied timestamps contribute 0 to S; constant y -> Var 0 -> NULL z
    df = spark.createDataFrame(
        [(1, 1), (1, 5), (2, 2), (2, 9)], "x long, y long"
    )
    r = mann_kendall(df, "x", "y").first()
    # only the 4 cross-time pairs count: 3 up, 1 down ((1,5)->(2,2))
    assert r["s"] == 2
    flat = spark.createDataFrame([(i, 7) for i in range(5)], "x long, y long")
    assert mann_kendall(flat, "x", "y").first()["z"] is None


def test_cvm_identical_and_disjoint(spark):
    from kgraph_spark.operators.stats import cvm_2sample

    a = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    same = cvm_2sample(a, a, "v", scale=1).first()
    assert same["t_stat"] == 0.0
    # a=[1,2] vs b=[3,4]: num = 4+16+4+0 = 24, T = 24/(2*2*16)
    b = spark.createDataFrame([(3.0,), (4.0,)], "v double")
    r = cvm_2sample(a, b, "v", scale=1).first()
    assert r["t_stat"] == pytest.approx(0.375)
    assert r["t_expected"] == pytest.approx((1 + 1 / 4) / 6, abs=1e-6)


def test_prop_wilson_hand_case(spark):
    from kgraph_spark.operators.stats import prop_wilson

    df = spark.createDataFrame([(True,)] * 5 + [(False,)] * 5, "f boolean")
    r = prop_wilson(df, "f").first()
    assert (r["n"], r["x"], r["p"]) == (10, 5, 0.5)
    # textbook Wilson 95% for 5/10, same op order
    z = 1.959963984540054
    n, p = 10.0, 0.5
    denom = 1.0 + z * z / n
    center = p + z * z / (2.0 * n)
    rad = math.sqrt((p * (1.0 - p) + z * z / (4.0 * n)) / n)
    assert r["lo"] == round((center - z * rad) / denom, 6)
    assert r["hi"] == round((center + z * rad) / denom, 6)
    assert 0.23 < r["lo"] < 0.24 and 0.76 < r["hi"] < 0.77
    # boundary: all failures still yields a proper interval
    z0 = prop_wilson(
        spark.createDataFrame([(False,)] * 4, "f boolean"), "f"
    ).first()
    assert z0["p"] == 0.0 and z0["lo"] == 0.0 and z0["hi"] > 0.4


def test_paired_t_hand_case(spark):
    from kgraph_spark.operators.stats import paired_t

    # d = [1,1,2] (scale 1): S=4, SS=6, n=3 -> t = 4*sqrt(2)/sqrt(2)
    rows = [(2.0, 1.0), (3.0, 2.0), (5.0, 3.0)]
    df = spark.createDataFrame(rows, "x double, y double")
    r = paired_t(df, "x", "y", scale=1).first()
    assert r["n"] == 3 and r["df"] == 2
    assert r["mean_diff"] == pytest.approx(4 / 3, abs=1e-6)
    assert r["t_stat"] == pytest.approx(4.0, abs=1e-6)
    # constant differences: zero variance -> NULL t, exact mean
    same = spark.createDataFrame([(5.0, 3.0)] * 4, "x double, y double")
    r2 = paired_t(same, "x", "y").first()
    assert r2["t_stat"] is None and r2["mean_diff"] == 2.0


def test_kruskal_wallis_no_ties_hand_case(spark):
    from kgraph_spark.operators.stats import kruskal_wallis

    # perfectly separated thirds: rank sums 6/15/24, H = 7.2 (scipy kruskal)
    rows = [("a", v) for v in (1, 2, 3)] + [("b", v) for v in (4, 5, 6)] + [
        ("c", v) for v in (7, 8, 9)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    r = kruskal_wallis(df, "v", "g", scale=1).first()
    assert (r["n"], r["k"], r["dof"]) == (9, 3, 2)
    assert r["h"] == pytest.approx(7.2, abs=1e-5)
    # no ties: correction is the identity
    assert r["h_tie_corrected"] == pytest.approx(r["h"], abs=1e-5)


def test_kruskal_wallis_tie_correction(spark):
    from kgraph_spark.operators.stats import kruskal_wallis

    # a=[1,1], b=[1,2]: H = 0.6, C = 0.6 -> corrected 1.0 (scipy kruskal)
    rows = [("a", 1), ("a", 1), ("b", 1), ("b", 2)]
    df = spark.createDataFrame(rows, "g string, v long")
    r = kruskal_wallis(df, "v", "g", scale=1).first()
    assert r["h"] == pytest.approx(0.6, abs=1e-5)
    assert r["h_tie_corrected"] == pytest.approx(1.0, abs=1e-5)
    # all observations tied: H ~ 0 and the correction divides by zero -> NULL
    flat = spark.createDataFrame([("a", 7), ("b", 7), ("c", 7)], "g string, v long")
    r2 = kruskal_wallis(flat, "v", "g", scale=1).first()
    assert abs(r2["h"]) < 1e-5 and r2["h_tie_corrected"] is None


def test_cochran_armitage_hand_case(spark):
    from kgraph_spark.operators.stats import cochran_armitage

    # w=0: 2/10, w=1: 5/10, w=2: 8/10 -> T=21, E=15, Var=5, z = 6/sqrt(5)
    rows = (
        [(0, True)] * 2 + [(0, False)] * 8
        + [(1, True)] * 5 + [(1, False)] * 5
        + [(2, True)] * 8 + [(2, False)] * 2
    )
    df = spark.createDataFrame(rows, "w long, f boolean")
    r = cochran_armitage(df, "w", "f").first()
    assert (r["k"], r["n"], r["x"]) == (3, 30, 15)
    assert r["z"] == pytest.approx(6.0 / math.sqrt(5.0), abs=1e-6)
    # reversed trend flips the sign
    rev = df.select((2 - F.col("w")).alias("w"), "f")
    assert cochran_armitage(rev, "w", "f").first()["z"] == pytest.approx(
        -6.0 / math.sqrt(5.0), abs=1e-6
    )
    # all-success: zero variance -> NULL z
    allw = spark.createDataFrame([(0, True), (1, True)], "w long, f boolean")
    assert cochran_armitage(allw, "w", "f").first()["z"] is None


def test_poisson_rate_test_hand_case(spark):
    from kgraph_spark.operators.stats import poisson_rate_test
    from datetime import datetime

    def ts(sec):
        return datetime(2024, 1, 1, 0, 0, sec)

    # a: 10 events over 5 s (rate 2), b: 4 events over 4 s (rate 1)
    a = spark.createDataFrame(
        [(ts(s % 6),) for s in range(10)] + [(ts(5),)] * 0, "t timestamp"
    )
    b = spark.createDataFrame([(ts(s),) for s in (0, 1, 3, 4)], "t timestamp")
    r = poisson_rate_test(a, b, "t").first()
    assert (r["n_a"], r["n_b"]) == (10, 4)
    assert (r["span_a_sec"], r["span_b_sec"]) == (5, 4)
    assert r["rate_a"] == 2.0 and r["rate_b"] == 1.0
    lam = 14.0 / 9.0
    var = lam * (1.0 / 5.0 + 1.0 / 4.0)
    assert r["z"] == pytest.approx(round((2.0 - 1.0) / math.sqrt(var), 6), abs=1e-9)
    # single-event side: zero span -> NULL rate and z
    one = spark.createDataFrame([(ts(2),)], "t timestamp")
    r2 = poisson_rate_test(a, one, "t").first()
    assert r2["rate_b"] is None and r2["z"] is None


def test_mcnemar_hand_case(spark):
    from kgraph_spark.operators.stats import mcnemar

    rows = (
        [(True, False)] * 5 + [(False, True)] * 2
        + [(True, True)] * 2 + [(False, False)] * 1
    )
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    r = mcnemar(df, "a", "b").first()
    assert (r["n"], r["b"], r["c"]) == (10, 5, 2)
    assert r["chi2"] == pytest.approx(9.0 / 7.0, abs=1e-6)
    assert r["chi2_corrected"] == pytest.approx(4.0 / 7.0, abs=1e-6)
    # perfectly concordant gates: no discordant pairs -> NULL statistics
    conc = spark.createDataFrame([(True, True), (False, False)], "a boolean, b boolean")
    r2 = mcnemar(conc, "a", "b").first()
    assert r2["chi2"] is None and r2["chi2_corrected"] is None


def test_jensen_shannon_hand_case(spark):
    from kgraph_spark.operators.stats import jensen_shannon

    # identical mixes -> 0
    rows = [("x", False)] * 2 + [("y", False)] * 2 + [("x", True)] * 3 + [
        ("y", True)
    ] * 3
    df = spark.createDataFrame(rows, "key string, side boolean")
    r = jensen_shannon(df, "key", "side").first()
    assert (r["k"], r["n_a"], r["n_b"]) == (2, 4, 6)
    assert r["jsd_nats"] == pytest.approx(0.0, abs=1e-6)
    # disjoint supports -> the ln 2 maximum (1 bit)
    dis = spark.createDataFrame(
        [("x", False), ("y", True)], "key string, side boolean"
    )
    r2 = jensen_shannon(dis, "key", "side").first()
    assert r2["jsd_nats"] == pytest.approx(math.log(2.0), abs=1e-6)
    assert r2["jsd_bits"] == pytest.approx(1.0, abs=1e-6)
    # hand case p=(1/2,1/2), q=(1,0): m=(3/4,1/4)
    mix = spark.createDataFrame(
        [("x", False), ("y", False), ("x", True), ("x", True)],
        "key string, side boolean",
    )
    expected = 0.5 * (0.5 * math.log(0.5 / 0.75) + 0.5 * math.log(0.5 / 0.25)) + \
        0.5 * (1.0 * math.log(1.0 / 0.75))
    r3 = jensen_shannon(mix, "key", "side").first()
    assert r3["jsd_nats"] == pytest.approx(expected, abs=1e-6)
    # one side empty -> NULL
    onesided = spark.createDataFrame([("x", True)], "key string, side boolean")
    assert jensen_shannon(onesided, "key", "side").first()["jsd_nats"] is None


def test_friedman_hand_case(spark):
    from kgraph_spark.operators.stats import friedman

    # 2 complete blocks, 3 treatments, consistent ordering a<b<c:
    # rank sums 2/4/6 -> Q = 12/(2*3*4)*(4+16+36) - 3*2*4 = 4 (scipy)
    rows = [
        (1, "a", 1.0), (1, "b", 2.0), (1, "c", 3.0),
        (2, "a", 4.0), (2, "b", 5.0), (2, "c", 6.0),
    ]
    df = spark.createDataFrame(rows, "blk long, trt string, val double")
    r = friedman(df, "blk", "trt", "val").first()
    assert (r["n_blocks"], r["k"], r["dof"]) == (2, 3, 2)
    assert r["q"] == pytest.approx(4.0, abs=1e-5)
    assert r["q_tie_corrected"] == pytest.approx(4.0, abs=1e-5)  # no ties
    # incomplete block is excluded from n_blocks
    df2 = df.union(spark.createDataFrame([(3, "a", 9.0)], "blk long, trt string, val double"))
    r2 = friedman(df2, "blk", "trt", "val").first()
    assert r2["n_blocks"] == 2 and r2["q"] == pytest.approx(4.0, abs=1e-5)
    # all-tied cells: Q = 0 and the correction divides by zero -> NULL
    flat = spark.createDataFrame(
        [(1, "a", 7.0), (1, "b", 7.0), (2, "a", 7.0), (2, "b", 7.0)],
        "blk long, trt string, val double",
    )
    r3 = friedman(flat, "blk", "trt", "val").first()
    assert abs(r3["q"]) < 1e-9 and r3["q_tie_corrected"] is None


def test_jonckheere_terpstra_hand_cases(spark):
    from kgraph_spark.operators.stats import jonckheere_terpstra

    # no ties: g1=[1,2], g2=[3,4] -> J=4, E=2, Var=120/72
    df = spark.createDataFrame(
        [(1, 1.0), (1, 2.0), (2, 3.0), (2, 4.0)], "g long, v double"
    )
    r = jonckheere_terpstra(df, "v", "g", scale=1).first()
    assert (r["n"], r["k"]) == (4, 2)
    assert r["j"] == 4.0 and r["e_j"] == 2.0
    assert r["z"] == pytest.approx(2.0 / math.sqrt(120.0 / 72.0), abs=1e-6)
    # cross-group ties get half credit: g1=[1,1], g2=[1,2] -> J=3,
    # E=2, Var = 54/72 + 0 + 24/96 = 1 -> z = 1
    tied = spark.createDataFrame(
        [(1, 1.0), (1, 1.0), (2, 1.0), (2, 2.0)], "g long, v double"
    )
    r2 = jonckheere_terpstra(tied, "v", "g", scale=1).first()
    assert r2["j"] == 3.0 and r2["e_j"] == 2.0
    assert r2["z"] == pytest.approx(1.0, abs=1e-6)
    # reversed ordering flips the direction
    rev = df.select((3 - F.col("g")).alias("g"), "v")
    assert jonckheere_terpstra(rev, "v", "g", scale=1).first()["z"] == pytest.approx(
        -r["z"], abs=1e-6
    )
    # single group -> NULL z
    one = spark.createDataFrame([(1, 1.0), (1, 2.0), (1, 3.0)], "g long, v double")
    assert jonckheere_terpstra(one, "v", "g", scale=1).first()["z"] is None


def test_capture_recapture_hand_case(spark):
    from kgraph_spark.operators.stats import capture_recapture

    # capture 1 sees {a,b,c}, capture 2 sees {b,c,d}: n1=3, n2=3, m=2
    rows = [("a", False), ("b", False), ("c", False),
            ("b", True), ("c", True), ("d", True)]
    df = spark.createDataFrame(rows, "key string, side boolean")
    r = capture_recapture(df, "key", "side").first()
    assert (r["n1"], r["n2"], r["m"], r["n_seen"]) == (3, 3, 2, 4)
    # chapman = 4*4/3 - 1 = 13/3; var = 4*4*1*1/(9*4) = 4/9 -> se = 2/3
    assert r["chapman"] == pytest.approx(16.0 / 3.0 - 1.0, abs=1e-6)
    assert r["se"] == pytest.approx(2.0 / 3.0, abs=1e-6)
    # full overlap: estimator collapses to the census, zero-variance NULL se
    full = spark.createDataFrame(
        [("a", False), ("a", True), ("b", False), ("b", True)],
        "key string, side boolean",
    )
    r2 = capture_recapture(full, "key", "side").first()
    assert r2["chapman"] == pytest.approx(2.0, abs=1e-6) and r2["se"] is None


def test_cochran_q_hand_case(spark):
    from kgraph_spark.operators.stats import cochran_q

    # 4 complete blocks x 3 treatments: C=(3,2,1), R=(2,1,3,0), N=6
    # Q = 2*(3*14 - 36)/(3*6 - 14) = 12/4 = 3
    rows = [
        (1, "a", True), (1, "b", True), (1, "c", False),
        (2, "a", True), (2, "b", False), (2, "c", False),
        (3, "a", True), (3, "b", True), (3, "c", True),
        (4, "a", False), (4, "b", False), (4, "c", False),
    ]
    df = spark.createDataFrame(rows, "blk long, trt string, s boolean")
    r = cochran_q(df, "blk", "trt", "s").first()
    assert (r["n_blocks"], r["k"], r["dof"]) == (4, 3, 2)
    assert r["q"] == pytest.approx(3.0, abs=1e-6)
    # an incomplete block (only one treatment observed) is dropped
    df2 = df.union(
        spark.createDataFrame([(5, "a", True)], "blk long, trt string, s boolean")
    )
    r2 = cochran_q(df2, "blk", "trt", "s").first()
    assert r2["n_blocks"] == 4 and r2["q"] == pytest.approx(3.0, abs=1e-6)
    # every block degenerate (all-1): denominator 0 -> NULL q
    flat = spark.createDataFrame(
        [(1, "a", True), (1, "b", True), (2, "a", True), (2, "b", True)],
        "blk long, trt string, s boolean",
    )
    r3 = cochran_q(flat, "blk", "trt", "s").first()
    assert r3["n_blocks"] == 2 and r3["q"] is None


def test_bowker_symmetry_hand_case(spark):
    from kgraph_spark.operators.stats import bowker_symmetry

    # (a,b): fwd 3 rev 1 -> 4/4=1; (a,c): 2 vs 2 -> 0; (b,c): 5 vs 0 -> 5
    # diagonal a->a ignored; Q = 6, dof = 3 pairs, n = 17
    rows = (
        [("a", "b")] * 3 + [("b", "a")] + [("a", "c")] * 2
        + [("c", "a")] * 2 + [("b", "c")] * 5 + [("a", "a")] * 4
    )
    df = spark.createDataFrame(rows, "x string, y string")
    r = bowker_symmetry(df, "x", "y").first()
    assert (r["n"], r["k_pairs"], r["dof"]) == (17, 3, 3)
    assert r["q"] == pytest.approx(6.0, abs=1e-6)
    # symmetric flow only: Q = 0 but the pair still counts toward dof
    sym = spark.createDataFrame([("a", "b"), ("b", "a")], "x string, y string")
    r2 = bowker_symmetry(sym, "x", "y").first()
    assert (r2["k_pairs"], r2["q"]) == (1, 0.0)
    # diagonal-only traffic: no pairs, NULL q
    diag = spark.createDataFrame([("a", "a"), ("b", "b")], "x string, y string")
    r3 = bowker_symmetry(diag, "x", "y").first()
    assert (r3["n"], r3["k_pairs"], r3["dof"]) == (2, 0, 0)
    assert r3["q"] is None


def test_mood_median_hand_case(spark):
    from kgraph_spark.operators.stats import mood_median

    # A=[1,2,3], B=[4,5,6]: pooled lower median 3; 2x2 table [[0,3],[3,0]]
    # chi2 = 6*(0*0-3*3)^2/(3*3*3*3) = 6
    rows = [("A", 1.0), ("A", 2.0), ("A", 3.0), ("B", 4.0), ("B", 5.0), ("B", 6.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = mood_median(df, "v", "g").first()
    assert (r["n"], r["k"], r["dof"], r["n_above"]) == (6, 2, 1, 3)
    assert r["grand_median"] == pytest.approx(3.0, abs=1e-9)
    assert r["chi2"] == pytest.approx(6.0, abs=1e-5)
    # all values equal: everything <= median, degenerate split -> NULL
    flat = spark.createDataFrame(
        [("A", 7.0), ("A", 7.0), ("B", 7.0)], "g string, v double"
    )
    r2 = mood_median(flat, "v", "g").first()
    assert r2["n_above"] == 0 and r2["chi2"] is None


def test_fleiss_kappa_hand_case(spark):
    from kgraph_spark.operators.stats import fleiss_kappa

    # 3 raters, 3 items: S=17, C=41, Nr=9 -> kappa = -90/720 = -0.125
    rows = [
        (1, "r1", "x"), (1, "r2", "x"), (1, "r3", "x"),
        (2, "r1", "x"), (2, "r2", "x"), (2, "r3", "y"),
        (3, "r1", "x"), (3, "r2", "y"), (3, "r3", "z"),
    ]
    df = spark.createDataFrame(rows, "item long, rater string, cat string")
    r = fleiss_kappa(df, "item", "rater", "cat").first()
    assert (r["n_items"], r["r"], r["k"]) == (3, 3, 3)
    assert r["p_bar"] == pytest.approx(8.0 / 18.0, abs=1e-6)
    assert r["p_e"] == pytest.approx(41.0 / 81.0, abs=1e-6)
    assert r["kappa"] == pytest.approx(-0.125, abs=1e-6)
    # an item rated by only 2 of 3 raters is excluded
    df2 = df.union(
        spark.createDataFrame([(4, "r1", "x"), (4, "r2", "x")],
                              "item long, rater string, cat string")
    )
    r2 = fleiss_kappa(df2, "item", "rater", "cat").first()
    assert r2["n_items"] == 3 and r2["kappa"] == pytest.approx(-0.125, abs=1e-6)
    # single category ever used: P_e = 1 -> NULL kappa
    uni = spark.createDataFrame(
        [(1, "r1", "x"), (1, "r2", "x"), (2, "r1", "x"), (2, "r2", "x")],
        "item long, rater string, cat string",
    )
    r3 = fleiss_kappa(uni, "item", "rater", "cat").first()
    assert r3["p_bar"] == pytest.approx(1.0) and r3["kappa"] is None


def test_hellinger_hand_case(spark):
    import math as m

    from kgraph_spark.operators.stats import hellinger_distance

    # p = (0.5, 0.5), q = (1, 0): BC = sqrt(0.5), H = sqrt(1 - BC)
    rows = [("a", False), ("a", False), ("b", False), ("b", False)] + [
        ("a", True)
    ] * 4
    df = spark.createDataFrame(rows, "key string, s boolean")
    r = hellinger_distance(df, "key", "s").first()
    assert (r["k"], r["n_a"], r["n_b"]) == (2, 4, 4)
    assert r["bc"] == pytest.approx(m.sqrt(0.5), abs=1e-6)
    assert r["hellinger"] == pytest.approx(m.sqrt(1.0 - m.sqrt(0.5)), abs=1e-6)
    # identical distributions: BC = 1, H = 0
    same = spark.createDataFrame(
        [("a", False), ("a", True), ("b", False), ("b", True)],
        "key string, s boolean",
    )
    r2 = hellinger_distance(same, "key", "s").first()
    assert r2["bc"] == pytest.approx(1.0, abs=1e-6)
    assert r2["hellinger"] == pytest.approx(0.0, abs=1e-6)
    # one side empty -> NULLs
    onesided = spark.createDataFrame([("a", False)], "key string, s boolean")
    r3 = hellinger_distance(onesided, "key", "s").first()
    assert r3["bc"] is None and r3["hellinger"] is None


def test_cliffs_delta_hand_case(spark):
    from kgraph_spark.operators.stats import cliffs_delta

    # A=[3,4,5] vs B=[1,2,3]: #(a>b)=8, #(a<b)=0, one tie
    # delta = 8/9, U_a = 8.5, vda = 8.5/9, |delta| >= .474 -> large
    da = spark.createDataFrame([(3.0,), (4.0,), (5.0,)], "v double")
    db = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "v double")
    r = cliffs_delta(da, db, "v").first()
    assert (r["n_a"], r["n_b"]) == (3, 3)
    assert r["u_a"] == pytest.approx(8.5, abs=1e-9)
    assert r["delta"] == pytest.approx(8.0 / 9.0, abs=1e-6)
    assert r["vda_a"] == pytest.approx(8.5 / 9.0, abs=1e-6)
    assert r["magnitude"] == "large"
    # identical samples: delta 0, vda 0.5, negligible
    r2 = cliffs_delta(db, db, "v").first()
    assert r2["delta"] == pytest.approx(0.0, abs=1e-9)
    assert r2["vda_a"] == pytest.approx(0.5, abs=1e-9)
    assert r2["magnitude"] == "negligible"


def test_cohen_kappa_hand_case(spark):
    from kgraph_spark.operators.stats import cohen_kappa

    # 20(x,x) + 5(x,y) + 10(y,x) + 15(y,y): po=.7, pe=.5, kappa=.4
    rows = (
        [("x", "x")] * 20 + [("x", "y")] * 5
        + [("y", "x")] * 10 + [("y", "y")] * 15
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohen_kappa(df, "a", "b").first()
    assert (r["n"], r["k_cats"], r["agree"]) == (50, 2, 35)
    assert r["po"] == pytest.approx(0.7, abs=1e-9)
    assert r["pe"] == pytest.approx(0.5, abs=1e-9)
    assert r["kappa"] == pytest.approx(0.4, abs=1e-6)
    # constant category both sides: pe = 1 -> NULL kappa
    const = spark.createDataFrame([("x", "x")] * 4, "a string, b string")
    assert cohen_kappa(const, "a", "b").first()["kappa"] is None
    # NULL ratings drop
    withnull = df.union(
        spark.createDataFrame([("x", None)], "a string, b string")
    )
    assert cohen_kappa(withnull, "a", "b").first()["n"] == 50


def test_ordinal_concordance_hand_case(spark):
    from kgraph_spark.operators.stats import ordinal_concordance

    # (0,0),(0,1),(1,1),(1,2),(2,2): C=6, D=0, Ta=Tb=2 of 10 pairs
    rows = [(0, 0), (0, 1), (1, 1), (1, 2), (2, 2)]
    df = spark.createDataFrame(rows, "a long, b long")
    r = ordinal_concordance(df, "a", "b").first()
    assert (r["n"], r["concordant"], r["discordant"]) == (5, 6, 0)
    assert r["gamma"] == pytest.approx(1.0, abs=1e-9)
    assert r["somers_ba"] == pytest.approx(0.75, abs=1e-9)
    assert r["somers_ab"] == pytest.approx(0.75, abs=1e-9)
    # reversed b ordering flips the sign
    rev = spark.createDataFrame(
        [(a, 2 - b) for a, b in rows], "a long, b long"
    )
    r2 = ordinal_concordance(rev, "a", "b").first()
    assert r2["gamma"] == pytest.approx(-1.0, abs=1e-9)
    assert r2["somers_ba"] == pytest.approx(-0.75, abs=1e-9)


def test_anderson_darling_2s_hand_case(spark):
    from kgraph_spark.operators.stats import anderson_darling_2s

    # A=[1,2], B=[3,4]: A2 = (4/3 + 4 + 4/3)/4 = 5/3
    da = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    db = spark.createDataFrame([(3.0,), (4.0,)], "v double")
    r = anderson_darling_2s(da, db, "v").first()
    assert (r["n_a"], r["n_b"]) == (2, 2)
    assert r["a2"] == pytest.approx(5.0 / 3.0, abs=1e-5)
    # identical samples: every deviation is zero
    same = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "v double")
    assert anderson_darling_2s(same, same, "v").first()["a2"] == pytest.approx(
        0.0, abs=1e-9
    )


def test_dunn_posthoc_hand_case(spark):
    import math

    from kgraph_spark.operators.stats import dunn_posthoc

    # A=[1,2,3], B=[4,5,6]: mean ranks 2 vs 5, V=3.5, z=-3/sqrt(7/3)
    rows = [("A", 1.0), ("A", 2.0), ("A", 3.0), ("B", 4.0), ("B", 5.0), ("B", 6.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = dunn_posthoc(df, "v", "g").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["g1"], r["g2"], r["n1"], r["n2"]) == ("A", "B", 3, 3)
    assert r["mean_rank_1"] == pytest.approx(2.0, abs=1e-9)
    assert r["mean_rank_2"] == pytest.approx(5.0, abs=1e-9)
    assert r["z"] == pytest.approx(-3.0 / math.sqrt(7.0 / 3.0), abs=1e-6)
    # three groups -> three ordered pairs
    df3 = df.union(
        spark.createDataFrame([("C", 7.0), ("C", 8.0)], "g string, v double")
    )
    pairs = [(r["g1"], r["g2"]) for r in dunn_posthoc(df3, "v", "g").collect()]
    assert pairs == [("A", "B"), ("A", "C"), ("B", "C")]


def test_page_trend_hand_case(spark):
    import math

    from kgraph_spark.operators.stats import page_trend

    # 3 complete blocks, values rise with treatment order:
    # L = 3*(1+4+9) = 42, E = 36, Var = 6, z = 6/sqrt(6)
    rows = [
        (b, t, float(v))
        for b in (1, 2, 3)
        for t, v in (("t1", 1.0), ("t2", 2.0), ("t3", 3.0))
    ]
    df = spark.createDataFrame(rows, "b long, tr string, v double")
    r = page_trend(df, "b", "tr", "v").first()
    assert (r["n_blocks"], r["k"]) == (3, 3)
    assert r["l_stat"] == pytest.approx(42.0, abs=1e-9)
    assert r["z"] == pytest.approx(6.0 / math.sqrt(6.0), abs=1e-6)
    # a block missing one treatment is excluded entirely
    df2 = df.union(
        spark.createDataFrame(
            [(4, "t1", 9.0), (4, "t2", 9.5)], "b long, tr string, v double"
        )
    )
    r2 = page_trend(df2, "b", "tr", "v").first()
    assert r2["n_blocks"] == 3 and r2["l_stat"] == pytest.approx(42.0, abs=1e-9)


def test_two_by_two_hand_case(spark):
    import math

    from kgraph_spark.operators.stats import two_by_two

    rows = (
        [(True, True)] * 10 + [(True, False)] * 40
        + [(False, True)] * 5 + [(False, False)] * 45
    )
    df = spark.createDataFrame(rows, "e boolean, o boolean")
    r = two_by_two(df, "e", "o").first()
    assert (r["n"], r["a"], r["b"], r["c"], r["d"]) == (100, 10, 40, 5, 45)
    assert r["odds_ratio"] == pytest.approx(2.25, abs=1e-9)
    assert r["risk_ratio"] == pytest.approx(2.0, abs=1e-9)
    se = math.sqrt(1 / 10 + 1 / 40 + 1 / 5 + 1 / 45)
    assert r["or_ci_lo"] == pytest.approx(2.25 * math.exp(-1.959963985 * se), abs=1e-5)
    assert r["or_ci_hi"] == pytest.approx(2.25 * math.exp(1.959963985 * se), abs=1e-5)
    # empty cell -> NULL ratios
    nz = spark.createDataFrame(
        [(True, True), (False, False)], "e boolean, o boolean"
    )
    assert two_by_two(nz, "e", "o").first()["odds_ratio"] is None


def test_grubbs_hand_case(spark):
    import math

    from kgraph_spark.operators.stats import grubbs_test

    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,), (10.0,)], "v double")
    r = grubbs_test(df, "v").first()
    assert r["n"] == 4
    assert r["outlier"] == pytest.approx(10.0, abs=1e-9)
    assert r["g_stat"] == pytest.approx(6.0 / math.sqrt(50.0 / 3.0), abs=1e-6)
    # tied extremes break to the smaller value; zero variance -> NULL G
    tie = spark.createDataFrame([(0.0,), (4.0,), (8.0,)], "v double")
    rt = grubbs_test(tie, "v").first()
    assert rt["outlier"] == pytest.approx(0.0, abs=1e-9)
    flat = spark.createDataFrame([(5.0,)] * 4, "v double")
    assert grubbs_test(flat, "v").first()["g_stat"] is None


def test_kendall_w_matches_friedman_transform(spark):
    from kgraph_spark.operators.stats import friedman, kendall_w

    # perfect concordance across 3 blocks of 3 treatments -> W = 1
    rows = [
        (b, t, float(v))
        for b in (1, 2, 3)
        for t, v in (("t1", 1.0), ("t2", 2.0), ("t3", 3.0))
    ]
    df = spark.createDataFrame(rows, "b long, tr string, v double")
    w = kendall_w(df, "b", "tr", "v").first()
    assert (w["n_blocks"], w["k"]) == (3, 3)
    assert w["w"] == pytest.approx(1.0, abs=1e-6)
    f = friedman(df, "b", "tr", "v").first()
    assert w["w"] == pytest.approx(f["q"] / (3 * 2), abs=1e-9)


def test_mood_scale_hand_case(spark):
    import math

    from kgraph_spark.operators.stats import mood_scale_test

    # A=[1,4] (extremes), B=[2,3] (center): M=4.5, E=2.5, Var=4/3
    da = spark.createDataFrame([(1.0,), (4.0,)], "v double")
    db = spark.createDataFrame([(2.0,), (3.0,)], "v double")
    r = mood_scale_test(da, db, "v").first()
    assert (r["n_a"], r["n_b"]) == (2, 2)
    assert r["m_stat"] == pytest.approx(4.5, abs=1e-9)
    assert r["z"] == pytest.approx(2.0 / math.sqrt(4.0 / 3.0), abs=1e-6)
    # identical dispersion -> M at its expectation, z = 0
    r2 = mood_scale_test(db, db, "v").first()
    # pooled [2,2,3,3]: midranks 1.5,1.5,3.5,3.5; scores sum A = 2
    assert r2["m_stat"] == pytest.approx(2.0, abs=1e-9)


def test_hill_tail_index_hand_case(spark):
    import math

    from kgraph_spark.operators.stats import hill_tail_index

    # exact Pareto ladder x = r^{-1/2} has alpha = 2 asymptotically;
    # check the estimator formula itself on a tiny k
    vals = [8.0, 4.0, 2.0, 1.0]  # k=3, ref=1: sum ln = ln8+ln4+ln2 = 6 ln2
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    r = hill_tail_index(df, "v", k=3).first()
    assert r["k"] == 3
    assert r["x_ref"] == pytest.approx(1.0, abs=1e-9)
    assert r["hill_alpha"] == pytest.approx(3.0 / (6.0 * math.log(2.0)), abs=1e-6)
    assert r["se"] == pytest.approx(r["hill_alpha"] / math.sqrt(3.0), abs=1e-5)
    # fewer than k+1 positive rows -> ONE row with k=0 and NULL alpha
    small = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    rs = hill_tail_index(small, "v", k=3).collect()
    assert len(rs) == 1
    assert rs[0]["k"] == 0 and rs[0]["hill_alpha"] is None and rs[0]["x_ref"] is None
    # all top values tied -> zero log-sum -> NULL alpha
    flat = spark.createDataFrame([(5.0,)] * 6, "v double")
    assert hill_tail_index(flat, "v", k=3).first()["hill_alpha"] is None


def test_krippendorff_alpha_hand_case(spark):
    from kgraph_spark.operators.stats import krippendorff_alpha

    # u1: x,x ; u2: y,y ; u3: x,y -> Do=1/3, De=0.6, alpha=4/9
    rows = [
        (1, "r1", "x"), (1, "r2", "x"),
        (2, "r1", "y"), (2, "r2", "y"),
        (3, "r1", "x"), (3, "r2", "y"),
    ]
    df = spark.createDataFrame(rows, "item long, rater string, cat string")
    r = krippendorff_alpha(df, "item", "rater", "cat").first()
    assert (r["n_items"], r["n_pairable"], r["k_cats"]) == (3, 6, 2)
    assert r["d_o"] == pytest.approx(1.0 / 3.0, abs=1e-6)
    assert r["d_e"] == pytest.approx(0.6, abs=1e-9)
    assert r["alpha"] == pytest.approx(4.0 / 9.0, abs=1e-6)
    # an unpairable singleton unit is excluded from D_o and D_e
    ragged = df.union(
        spark.createDataFrame([(4, "r1", "x")], "item long, rater string, cat string")
    )
    r2 = krippendorff_alpha(ragged, "item", "rater", "cat").first()
    assert r2["n_items"] == 4 and r2["n_pairable"] == 6
    assert r2["alpha"] == pytest.approx(4.0 / 9.0, abs=1e-6)
    # perfect agreement -> alpha = 1
    perfect = spark.createDataFrame(
        [(1, "r1", "x"), (1, "r2", "x"), (2, "r1", "y"), (2, "r2", "y")],
        "item long, rater string, cat string",
    )
    assert krippendorff_alpha(perfect, "item", "rater", "cat").first()[
        "alpha"
    ] == pytest.approx(1.0, abs=1e-9)


def test_trimmed_mean_hand_case(spark):
    from kgraph_spark.operators.stats import trimmed_mean

    # [0, 1..8, 100], trim 10% (k=1): drop 0 and 100 -> mean(1..8) = 4.5
    vals = [0.0] + [float(i) for i in range(1, 9)] + [100.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    r = trimmed_mean(df, "v", trim=0.1).first()
    assert (r["n"], r["k_trim"]) == (10, 1)
    assert r["lo_cut"] == pytest.approx(1.0, abs=1e-9)
    assert r["hi_cut"] == pytest.approx(8.0, abs=1e-9)
    assert r["trimmed_mean"] == pytest.approx(4.5, abs=1e-9)
    # winsorized: clamp 0->1 and 100->8 -> (36+1+8)/10 = 4.5
    assert r["winsorized_mean"] == pytest.approx(4.5, abs=1e-9)
    # duplicates across the cut are partially counted
    dup = spark.createDataFrame([(1.0,)] * 5 + [(9.0,)] * 5, "v double")
    r2 = trimmed_mean(dup, "v", trim=0.1).first()  # k=1: drop one 1, one 9
    assert r2["trimmed_mean"] == pytest.approx((4 * 1 + 4 * 9) / 8, abs=1e-9)


def test_sign_test_hand_case(spark):
    import math

    from kgraph_spark.operators.stats import sign_test

    # 6 up, 2 down, 2 ties -> z = 4/sqrt(8)
    rows = (
        [(1.0, 2.0)] * 6 + [(2.0, 1.0)] * 2 + [(3.0, 3.0)] * 2
    )
    df = spark.createDataFrame(rows, "a double, b double")
    r = sign_test(df, "a", "b").first()
    assert (r["n_pairs"], r["n_pos"], r["n_neg"]) == (10, 6, 2)
    assert r["z"] == pytest.approx(4.0 / math.sqrt(8.0), abs=1e-6)
    # all ties -> NULL z
    ties = spark.createDataFrame([(1.0, 1.0)] * 3, "a double, b double")
    assert sign_test(ties, "a", "b").first()["z"] is None


def test_wilcoxon_signed_rank_hand_case(spark):
    import math

    from kgraph_spark.operators.stats import wilcoxon_signed_rank

    # diffs +1 +2 -3 +4 +5 (distinct |d|): W+ = 1+2+4+5 = 12,
    # mean = 7.5, var = 5*6*11/24 = 13.75; a zero pair drops
    rows = [(0.0, 1.0), (0.0, 2.0), (3.0, 0.0), (0.0, 4.0), (0.0, 5.0),
            (7.0, 7.0)]
    r = wilcoxon_signed_rank(
        spark.createDataFrame(rows, "a double, b double"), "a", "b"
    ).first()
    assert (r["n"], r["w_plus"]) == (5, 12.0)
    assert r["z"] == pytest.approx(4.5 / math.sqrt(13.75), abs=1e-6)
    # all-tied |d|: diffs +1 +1 -1 -> midrank 2 each, W+ = 4,
    # var = (2*3*4*7 - (27-3)) / 48 = 3
    ties = [(0.0, 1.0), (0.0, 1.0), (1.0, 0.0)]
    r2 = wilcoxon_signed_rank(
        spark.createDataFrame(ties, "a double, b double"), "a", "b"
    ).first()
    assert (r2["n"], r2["w_plus"]) == (3, 4.0)
    assert r2["z"] == pytest.approx(1.0 / math.sqrt(3.0), abs=1e-6)


def test_jarque_bera_hand_case(spark):
    from kgraph_spark.operators.stats import jarque_bera

    # symmetric 1..5: skew 0, m2 = 2, m4 = 6.8 -> ex kurt = -1.3,
    # JB = 5/6 * (0 + 1.69/4)
    df = spark.createDataFrame([(float(i),) for i in range(1, 6)], "v double")
    r = jarque_bera(df, "v").first()
    assert r["n"] == 5
    assert r["skewness"] == pytest.approx(0.0, abs=1e-9)
    assert r["ex_kurtosis"] == pytest.approx(-1.3, abs=1e-9)
    assert r["jb"] == pytest.approx(5.0 / 6.0 * (1.69 / 4.0), abs=1e-6)
    # constant input -> m2 = 0 -> NULL stats, n still counted
    c = jarque_bera(
        spark.createDataFrame([(2.0,)] * 4, "v double"), "v"
    ).first()
    assert c["n"] == 4 and c["jb"] is None


def test_cmh_test_hand_case(spark):
    from kgraph_spark.operators.stats import cmh_test

    # one stratum reduces to the plain 2x2: a=10 b=5 c=5 d=10 ->
    # E = 7.5, V = 15^4/(900*29), dev = |10-7.5|-0.5 = 2, OR = 4
    rows = (
        [("s1", True, True)] * 10 + [("s1", True, False)] * 5
        + [("s1", False, True)] * 5 + [("s1", False, False)] * 10
    )
    df = spark.createDataFrame(rows, "s string, e boolean, o boolean")
    r = cmh_test(df, "s", "e", "o").first()
    assert (r["k_strata"], r["sum_a"]) == (1, 10)
    assert r["e_sum"] == pytest.approx(7.5, abs=1e-9)
    v = 15.0 ** 4 / (900.0 * 29.0)
    assert r["v_sum"] == pytest.approx(v, abs=1e-6)
    assert r["cmh"] == pytest.approx(4.0 / v, abs=1e-6)
    assert r["or_mh"] == pytest.approx(4.0, abs=1e-6)
    # two balanced strata with opposite margins still sum exactly
    rows2 = rows + (
        [("s2", True, True)] * 2 + [("s2", True, False)] * 8
        + [("s2", False, True)] * 8 + [("s2", False, False)] * 2
    )
    df2 = spark.createDataFrame(rows2, "s string, e boolean, o boolean")
    r2 = cmh_test(df2, "s", "e", "o").first()
    assert (r2["k_strata"], r2["sum_a"]) == (2, 12)
    assert r2["e_sum"] == pytest.approx(7.5 + 5.0, abs=1e-6)
    # MH OR pools numerators: (10*10/30 + 2*2/20) / (5*5/30 + 8*8/20)
    assert r2["or_mh"] == pytest.approx(
        (100.0 / 30 + 4.0 / 20) / (25.0 / 30 + 64.0 / 20), abs=1e-6
    )


def test_durbin_watson_hand_case(spark):
    from kgraph_spark.operators.stats import durbin_watson

    # x 0..3, y alternating 1,-1: fit y = 0.6 - 0.4x,
    # e = [.4, -1.2, 1.2, -.4] -> DW = 10.88/3.2 = 3.4 (negative AC)
    rows = [(0, 1.0), (1, -1.0), (2, 1.0), (3, -1.0)]
    r = durbin_watson(
        spark.createDataFrame(rows, "x long, y double"), "x", "y"
    ).first()
    assert r["n"] == 4
    assert r["dw"] == pytest.approx(3.4, abs=1e-6)
    assert r["rho"] == pytest.approx(-0.7, abs=1e-6)
    # perfect line -> zero residuals -> NULL dw
    line = [(i, 2.0 * i + 1) for i in range(5)]
    r2 = durbin_watson(
        spark.createDataFrame(line, "x long, y double"), "x", "y"
    ).first()
    assert r2["dw"] is None


def test_breusch_pagan_hand_case(spark):
    from kgraph_spark.operators.stats import breusch_pagan

    # flat fit (beta=0, alpha=0), e^2 = [1,1,4,4] perfectly tracks x
    # -> aux R^2 = 1, LM = n = 4
    rows = [(0, 1.0), (0, -1.0), (1, 2.0), (1, -2.0)]
    r = breusch_pagan(
        spark.createDataFrame(rows, "x long, y double"), "x", "y", y_scale=1
    ).first()
    assert r["n"] == 4
    assert r["r2_aux"] == pytest.approx(1.0, abs=1e-6)
    assert r["lm"] == pytest.approx(4.0, abs=1e-6)
    # e^2 = [1,4,1] symmetric about the x midpoint -> uncorrelated, R^2 = 0
    rows2 = [(0, 1.0), (1, -2.0), (2, 1.0)]
    r2 = breusch_pagan(
        spark.createDataFrame(rows2, "x long, y double"), "x", "y", y_scale=1
    ).first()
    assert r2["r2_aux"] == pytest.approx(0.0, abs=1e-9)
    # constant e^2 -> cuu = 0 -> NULL by guard (0/0 is not "no signal")
    rows3 = [(0, 1.0), (0, -1.0), (1, 1.0), (1, -1.0)]
    r3 = breusch_pagan(
        spark.createDataFrame(rows3, "x long, y double"), "x", "y", y_scale=1
    ).first()
    assert r3["r2_aux"] is None


def test_chow_test_hand_case(spark):
    from kgraph_spark.operators.stats import chow_test

    # seg1 y=x exactly (SSR1=0); seg2 slope break with one bent point
    # (SSR2 = 1/6); pooled SSR from exact moments = 172.914.../6
    rows = [(0, 0.0), (1, 1.0), (2, 2.0), (3, 10.0), (4, 8.0), (5, 7.0)]
    r = chow_test(
        spark.createDataFrame(rows, "x long, y double"), "x", "y",
        split=3, y_scale=1,
    ).first()
    assert (r["n1"], r["n2"]) == (3, 3)
    assert r["ssr1"] == pytest.approx(0.0, abs=1e-6)
    assert r["ssr2"] == pytest.approx(1.0 / 6.0, abs=1e-6)
    ssr_p = (524.0 - 192.0 ** 2 / 105.0) / 6.0
    assert r["ssr_pooled"] == pytest.approx(ssr_p, abs=1e-6)
    f = ((ssr_p - 1.0 / 6.0) / 2.0) / ((1.0 / 6.0) / 2.0)
    assert r["f_stat"] == pytest.approx(f, rel=1e-6)
    # both segments fit exactly -> resid 0 -> NULL F (guarded)
    clean = [(0, 0.0), (1, 1.0), (2, 2.0), (3, 9.0), (4, 8.0), (5, 7.0)]
    r2 = chow_test(
        spark.createDataFrame(clean, "x long, y double"), "x", "y",
        split=3, y_scale=1,
    ).first()
    assert r2["f_stat"] is None and r2["ssr_pooled"] > 0


def test_theil_u_hand_case(spark):
    import math

    from kgraph_spark.operators.stats import theil_u

    # perfect determination both ways: U = 1, MI = H = 1 bit
    det = spark.createDataFrame(
        [("x", "1"), ("x", "1"), ("y", "2"), ("y", "2")], "a string, b string"
    )
    r = theil_u(det, "a", "b").first()
    assert (r["n"], r["k_a"], r["k_b"]) == (4, 2, 2)
    assert r["mi_bits"] == pytest.approx(1.0, abs=1e-6)
    assert r["u_a_given_b"] == pytest.approx(1.0, abs=1e-6)
    assert r["u_b_given_a"] == pytest.approx(1.0, abs=1e-6)
    # independence: MI = 0, U = 0
    ind = spark.createDataFrame(
        [("x", "1"), ("x", "2"), ("y", "1"), ("y", "2")], "a string, b string"
    )
    r2 = theil_u(ind, "a", "b").first()
    assert r2["mi_bits"] == pytest.approx(0.0, abs=1e-6)
    assert r2["u_a_given_b"] == pytest.approx(0.0, abs=1e-6)
    # asymmetric: b determines a, but a only partially determines b
    asym = spark.createDataFrame(
        [("x", "1"), ("x", "2"), ("y", "3"), ("y", "3")], "a string, b string"
    )
    r3 = theil_u(asym, "a", "b").first()
    assert r3["u_a_given_b"] == pytest.approx(1.0, abs=1e-6)
    # U(b|a) = MI/H(b) = 1 bit / 1.5 bits
    assert r3["h_b_bits"] == pytest.approx(1.5, abs=1e-6)
    assert r3["u_b_given_a"] == pytest.approx(1.0 / 1.5, abs=1e-6)


def test_cronbach_alpha_hand_case(spark):
    from kgraph_spark.operators.stats import cronbach_alpha

    # item B = 2*A exactly: alpha = 2*(1 - (2/3 + 8/3)/6) = 8/9
    rows = [
        (1, "A", 1.0), (2, "A", 2.0), (3, "A", 3.0),
        (1, "B", 2.0), (2, "B", 4.0), (3, "B", 6.0),
    ]
    df = spark.createDataFrame(rows, "s long, item string, v double")
    r = cronbach_alpha(df, "s", "item", "v").first()
    assert (r["n_subjects"], r["k_items"]) == (3, 2)
    assert r["alpha"] == pytest.approx(8.0 / 9.0, abs=1e-6)
    # parallel items (B = A): alpha = 1
    par = [
        (1, "A", 1.0), (2, "A", 2.0), (3, "A", 3.0),
        (1, "B", 1.0), (2, "B", 2.0), (3, "B", 3.0),
    ]
    rp = cronbach_alpha(
        spark.createDataFrame(par, "s long, item string, v double"), "s", "item", "v"
    ).first()
    assert rp["alpha"] == pytest.approx(1.0, abs=1e-6)
    # incomplete subject drops: subject 4 has only item A
    inc = rows + [(4, "A", 9.0)]
    ri = cronbach_alpha(
        spark.createDataFrame(inc, "s long, item string, v double"), "s", "item", "v"
    ).first()
    assert ri["n_subjects"] == 3
    assert ri["alpha"] == pytest.approx(8.0 / 9.0, abs=1e-6)


def test_icc_oneway_hand_case(spark):
    from kgraph_spark.operators.stats import icc_oneway

    # perfect subject effect: within-variance 0 -> ICC = 1
    rows = [("a", 1.0), ("a", 1.0), ("b", 3.0), ("b", 3.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = icc_oneway(df, "g", "v").first()
    assert (r["n_ratings"], r["n_subjects"]) == (4, 2)
    assert r["k0"] == pytest.approx(2.0, abs=1e-9)
    assert r["icc1"] == pytest.approx(1.0, abs=1e-6)
    # no subject effect, pure within-noise -> ICC = -1 (k0=2 case)
    rows2 = [("a", 1.0), ("a", 3.0), ("b", 1.0), ("b", 3.0)]
    r2 = icc_oneway(
        spark.createDataFrame(rows2, "g string, v double"), "g", "v"
    ).first()
    assert r2["msb"] == pytest.approx(0.0, abs=1e-9)
    assert r2["msw"] == pytest.approx(2.0, abs=1e-6)
    assert r2["icc1"] == pytest.approx(-1.0, abs=1e-6)


def test_quade_hand_case(spark):
    from kgraph_spark.operators.stats import quade

    # 2 blocks x 2 treatments, block1 has 4x the range of block2:
    # S_A = -1.5, S_B = 1.5, A = 2.5, B = 2.25 -> F = 9
    rows = [
        (1, "A", 1.0), (1, "B", 3.0),
        (2, "A", 2.0), (2, "B", 2.5),
    ]
    df = spark.createDataFrame(rows, "blk long, trt string, v double")
    r = quade(df, "blk", "trt", "v").first()
    assert (r["n_blocks"], r["k"], r["dof1"], r["dof2"]) == (2, 2, 1, 1)
    assert r["f_stat"] == pytest.approx(9.0, abs=1e-6)
    # identical treatment effects in every block -> within-block ties
    # -> every S = 0 -> den = 0 -> NULL F
    tied = [
        (1, "A", 2.0), (1, "B", 2.0),
        (2, "A", 5.0), (2, "B", 5.0),
    ]
    rt = quade(
        spark.createDataFrame(tied, "blk long, trt string, v double"),
        "blk", "trt", "v",
    ).first()
    assert rt["f_stat"] is None


def test_kuiper_2sample_hand_case(spark):
    import math

    from kgraph_spark.operators.stats import kuiper_2sample

    # a=[1,4], b=[2,3]: D+ = D- = 0.5 -> V = 1 (KS alone would say 0.5)
    a = spark.createDataFrame([(1.0,), (4.0,)], "v double")
    b = spark.createDataFrame([(2.0,), (3.0,)], "v double")
    r = kuiper_2sample(a, b, "v").first()
    assert (r["n_a"], r["n_b"]) == (2, 2)
    assert r["d_plus"] == pytest.approx(0.5, abs=1e-9)
    assert r["d_minus"] == pytest.approx(0.5, abs=1e-9)
    assert r["v"] == pytest.approx(1.0, abs=1e-9)
    assert r["v_scaled"] == pytest.approx(math.sqrt(1.0), abs=1e-6)
    # pure one-sided shift: D- = 0
    lo = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    hi = spark.createDataFrame([(3.0,), (4.0,)], "v double")
    r2 = kuiper_2sample(lo, hi, "v").first()
    assert r2["d_plus"] == pytest.approx(1.0, abs=1e-9)
    assert r2["d_minus"] == pytest.approx(0.0, abs=1e-9)


def test_bartlett_hand_case(spark):
    import math

    from kgraph_spark.operators.stats import bartlett

    # equal variances -> chi2 = 0; C = 1 + (1 - 1/4)/3 = 1.25
    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0),
            ("b", 4.0), ("b", 5.0), ("b", 6.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = bartlett(df, "v", "g").first()
    assert (r["k"], r["n"]) == (2, 6)
    assert r["chi2"] == pytest.approx(0.0, abs=1e-5)
    assert r["c_factor"] == pytest.approx(1.25, abs=1e-6)
    # 16x variance ratio: T = (4*ln(8.5) - 2*ln(16)) / 1.25
    rows2 = [("a", 1.0), ("a", 2.0), ("a", 3.0),
             ("b", 2.0), ("b", 6.0), ("b", 10.0)]
    r2 = bartlett(
        spark.createDataFrame(rows2, "g string, v double"), "v", "g"
    ).first()
    exp = (4 * math.log(8.5) - 2 * math.log(16.0)) / 1.25
    assert r2["chi2"] == pytest.approx(exp, abs=1e-4)
    # a zero-variance group drops (ln undefined)
    rows3 = rows + [("c", 7.0), ("c", 7.0)]
    r3 = bartlett(
        spark.createDataFrame(rows3, "g string, v double"), "v", "g"
    ).first()
    assert (r3["k"], r3["n"]) == (2, 6)


def test_tost_equivalence_hand_case(spark):
    import math

    from kgraph_spark.operators.stats import tost_equivalence

    # equal means, se = sqrt(1 + 0.25): margin 3 -> equivalent
    rows = [(True, 10.0), (True, 12.0), (False, 10.5), (False, 11.5)]
    df = spark.createDataFrame(rows, "side boolean, v double")
    r = tost_equivalence(df, "v", "side", margin=3.0).first()
    assert (r["n_a"], r["n_b"]) == (2, 2)
    assert r["diff"] == pytest.approx(0.0, abs=1e-9)
    se = math.sqrt(1.0 + 0.25)
    assert r["t_lower"] == pytest.approx(3.0 / se, abs=1e-5)
    assert r["t_upper"] == pytest.approx(-3.0 / se, abs=1e-5)
    assert bool(r["equivalent"]) is True
    # margin too tight -> cannot claim equivalence
    r2 = tost_equivalence(df, "v", "side", margin=1.0).first()
    assert bool(r2["equivalent"]) is False


def test_yuen_t_hand_case(spark):
    from kgraph_spark.operators.stats import yuen_t

    # A = [0,1,2,3,100] (whale), B = [0,2,2,2,4]; trim .2 -> k=1:
    # trimmed means both 2 -> t = 0 despite the 100
    rows = [(True, v) for v in [0.0, 1.0, 2.0, 3.0, 100.0]] + [
        (False, v) for v in [0.0, 2.0, 2.0, 2.0, 4.0]
    ]
    df = spark.createDataFrame(rows, "side boolean, v double")
    r = yuen_t(df, "v", "side", trim=0.2).first()
    assert (r["n_a"], r["n_b"], r["h_a"], r["h_b"]) == (5, 5, 3, 3)
    assert r["tmean_a"] == pytest.approx(2.0, abs=1e-9)
    assert r["tmean_b"] == pytest.approx(2.0, abs=1e-9)
    # B winsorizes to constant -> d_b = 0; t defined, df guarded NULL
    assert r["t_stat"] == pytest.approx(0.0, abs=1e-9)
    assert r["df"] is None
    # a real separation: shift B up by 10 -> large negative t
    rows2 = [(True, v) for v in [0.0, 1.0, 2.0, 3.0, 100.0]] + [
        (False, v + 10.0) for v in [0.0, 1.0, 2.0, 3.0, 100.0]
    ]
    r2 = yuen_t(
        spark.createDataFrame(rows2, "side boolean, v double"),
        "v", "side", trim=0.2,
    ).first()
    assert r2["tmean_b"] == pytest.approx(12.0, abs=1e-9)
    assert r2["t_stat"] < -5


def test_weighted_kappa_hand_case(spark):
    from kgraph_spark.operators.stats import weighted_kappa

    # (0,0),(1,1),(2,2),(0,1): wo = 1, wrc = 20 -> kappa = 1 - 4/20
    rows = [(0, 0), (1, 1), (2, 2), (0, 1)]
    df = spark.createDataFrame(rows, "a long, b long")
    r = weighted_kappa(df, "a", "b").first()
    assert (r["n"], r["k_cats"]) == (4, 3)
    assert r["kappa_weighted"] == pytest.approx(0.8, abs=1e-6)
    # maximal ordinal disagreement -> kappa = -1
    anti = [(0, 2)] * 2 + [(2, 0)] * 2
    r2 = weighted_kappa(
        spark.createDataFrame(anti, "a long, b long"), "a", "b"
    ).first()
    assert r2["kappa_weighted"] == pytest.approx(-1.0, abs=1e-6)
    # perfect agreement -> 1
    per = [(i % 3, i % 3) for i in range(6)]
    assert weighted_kappa(
        spark.createDataFrame(per, "a long, b long"), "a", "b"
    ).first()["kappa_weighted"] == pytest.approx(1.0, abs=1e-9)


def test_diff_in_diff_hand_case(spark):
    from kgraph_spark.operators.stats import diff_in_diff

    rows = [
        (True, False, 1.0), (True, False, 3.0),
        (True, True, 5.0), (True, True, 7.0),
        (False, False, 2.0), (False, False, 4.0),
        (False, True, 3.0), (False, True, 5.0),
    ]
    df = spark.createDataFrame(rows, "g boolean, p boolean, v double")
    r = diff_in_diff(df, "v", "g", "p").first()
    assert r["n"] == 8
    assert r["mean_treat_pre"] == pytest.approx(2.0, abs=1e-9)
    assert r["mean_treat_post"] == pytest.approx(6.0, abs=1e-9)
    assert r["did"] == pytest.approx(3.0, abs=1e-9)
    # each cell u = 1 -> se = 2, z = 1.5
    assert r["se"] == pytest.approx(2.0, abs=1e-6)
    assert r["z"] == pytest.approx(1.5, abs=1e-6)
    # a 1-row cell kills the interval but not the point estimate
    rows2 = rows[:1] + rows[2:]
    r2 = diff_in_diff(
        spark.createDataFrame(rows2, "g boolean, p boolean, v double"),
        "v", "g", "p",
    ).first()
    assert r2["se"] is None and r2["did"] is not None


def test_fisher_corr_ci_hand_case(spark):
    import math

    from kgraph_spark.operators.stats import fisher_corr_ci

    xs = [1.0, 2.0, 3.0, 4.0, 5.0]
    ys = [2.0, 4.0, 5.0, 4.0, 9.0]
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(v * v for v in xs)
    syy = sum(v * v for v in ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    r_exp = (n * sxy - sx * sy) / (
        math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
    )
    z_exp = 0.5 * math.log((1 + r_exp) / (1 - r_exp))
    hw = 1.96 / math.sqrt(n - 3)
    r = fisher_corr_ci(df, "x", "y", 1, 1).first()
    assert r["r"] == pytest.approx(r_exp, abs=1e-6)
    assert r["z_fisher"] == pytest.approx(z_exp, abs=1e-6)
    assert r["ci_lo"] == pytest.approx(math.tanh(z_exp - hw), abs=1e-6)
    assert r["ci_hi"] == pytest.approx(math.tanh(z_exp + hw), abs=1e-6)
    # perfect correlation: r = 1 reported, interval NULL-guarded
    p = spark.createDataFrame(
        [(float(i), 2.0 * i) for i in range(1, 6)], "x double, y double"
    )
    rp = fisher_corr_ci(p, "x", "y", 1, 1).first()
    assert rp["r"] == pytest.approx(1.0, abs=1e-9)
    # float sqrt puts raw r a hair under 1: z blows up but stays
    # finite and deterministic (atanh of 1-ulp)
    assert rp["z_fisher"] is None or rp["z_fisher"] > 6


def test_cochran_c_hand_case(spark):
    from kgraph_spark.operators.stats import cochran_c

    rows = (
        [("a", 1.0), ("a", 2.0), ("a", 3.0)]
        + [("b", 2.0), ("b", 6.0), ("b", 10.0)]
        + [("c", 5.0), ("c", 5.0)]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    r = cochran_c(df, "v", "g").first()
    assert (r["k"], r["n"]) == (3, 8)
    assert r["worst_group"] == "b"
    assert r["worst_var"] == pytest.approx(16.0, abs=1e-6)
    assert r["c_stat"] == pytest.approx(16.0 / 17.0, abs=1e-6)
    assert r["c_uniform"] == pytest.approx(1.0 / 3.0, abs=1e-6)
    # singleton group drops from k
    r2 = cochran_c(
        spark.createDataFrame(rows + [("d", 9.0)], "g string, v double"),
        "v", "g",
    ).first()
    assert r2["k"] == 3


def test_min_detectable_effect_hand_case(spark):
    import math

    from kgraph_spark.operators.stats import min_detectable_effect

    rows = [(True, True), (True, False), (False, False), (False, False)]
    df = spark.createDataFrame(rows, "arm boolean, succ boolean")
    r = min_detectable_effect(df, "arm", "succ").first()
    assert (r["n_a"], r["n_b"]) == (2, 2)
    assert r["p_base"] == pytest.approx(0.25, abs=1e-9)
    exp = (1.96 + 0.8416) * math.sqrt(0.25 * 0.75 * (0.5 + 0.5))
    assert r["mde_abs"] == pytest.approx(exp, abs=1e-5)
    assert r["mde_rel"] == pytest.approx(exp / 0.25, abs=1e-4)
    # no successes -> NULL (rate 0 has no detectable lift scale)
    none = spark.createDataFrame(
        [(True, False), (False, False)], "arm boolean, succ boolean"
    )
    assert min_detectable_effect(none, "arm", "succ").first()["mde_abs"] is None


def test_lorenz_curve_hand_case(spark):
    from kgraph_spark.operators.stats import lorenz_curve

    # [1,1,1,1,6]: bottom 80% carry 40%; tie blocks split exactly
    df = spark.createDataFrame([(1.0,)] * 4 + [(6.0,)], "v double")
    out = {
        round(r["pct_population"] * 5): r["pct_mass"]
        for r in lorenz_curve(df, "v", n_points=5, scale=1).collect()
    }
    assert out[1] == pytest.approx(0.1, abs=1e-9)
    assert out[2] == pytest.approx(0.2, abs=1e-9)
    assert out[4] == pytest.approx(0.4, abs=1e-9)
    assert out[5] == pytest.approx(1.0, abs=1e-9)
    # perfectly equal values -> the diagonal
    eq = spark.createDataFrame([(2.0,)] * 10, "v double")
    d = {
        round(r["pct_population"] * 5): r["pct_mass"]
        for r in lorenz_curve(eq, "v", n_points=5, scale=1).collect()
    }
    for k in range(1, 6):
        assert d[k] == pytest.approx(k / 5.0, abs=1e-9)
