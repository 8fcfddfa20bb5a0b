"""Profiling operators: per-column table profile, IQR outlier fences,
deterministic k-per-group sampling, component condensation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgraph_spark.operators.profiling import iqr_outliers, profile_table


def test_profile_table_basic(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 1.5), (3, "a", 2.5), (4, None, None)],
        "id bigint, s string, v double",
    )
    got = {r["column"]: r for r in profile_table(df).collect()}
    assert set(got) == {"id", "s", "v"}
    assert got["id"]["n_rows"] == 4 and got["id"]["n_nulls"] == 0
    assert got["id"]["n_distinct"] == 4
    assert got["id"]["min_value"] == "1" and got["id"]["max_value"] == "4"
    assert got["s"]["n_nulls"] == 1 and got["s"]["n_distinct"] == 2
    assert got["s"]["min_value"] == "a" and got["s"]["max_value"] == "b"
    assert got["v"]["n_nulls"] == 2 and got["v"]["n_distinct"] == 2


def test_profile_table_column_subset_and_validation(spark):
    df = spark.createDataFrame([(1, "x")], "id bigint, s string")
    assert profile_table(df, ["s"]).count() == 1
    with pytest.raises(ValueError, match="unknown"):
        profile_table(df, ["nope"])


def test_profile_table_single_pass(spark):
    from conftest import plan_text

    df = spark.createDataFrame([(1, "x")], "id bigint, s string")
    plan = plan_text(profile_table(df))
    # one aggregation tree, not one scan per column ("Name (n)" tree lines)
    assert plan.count("Scan ExistingRDD (") == 1


def test_iqr_outliers_flags(spark):
    # group g: 10 values (1..9 + a 100 spike) → interpolated Q1 = 3.25,
    # Q3 = 7.75, IQR = 4.5 → fences [-3.5, 14.5] → only the spike flags
    rows = [("g", float(v)) for v in range(1, 10)] + [("g", 100.0), ("h", 5.0)]
    df = spark.createDataFrame(rows, "grp string, value double")
    got = iqr_outliers(df, "value", "grp")
    flagged = {(r["grp"], r["value"]) for r in got.collect() if r["is_outlier"]}
    assert flagged == {("g", 100.0)}
    g = {r["value"]: r for r in got.filter(F.col("grp") == "g").collect()}
    assert g[1.0]["lo"] == -3.5 and g[1.0]["hi"] == 14.5
    # single-value group: IQR 0 → its own value is inside [v, v]
    h = got.filter(F.col("grp") == "h").collect()[0]
    assert not h["is_outlier"] and h["lo"] == 5.0 == h["hi"]


def test_iqr_outliers_null_values_never_flag(spark):
    df = spark.createDataFrame(
        [("g", 1.0), ("g", 2.0), ("g", None)], "grp string, value double"
    )
    rows = {r["value"]: r["is_outlier"] for r in iqr_outliers(df, "value", "grp").collect()}
    assert rows[None] is False and len(rows) == 3


def test_sample_k_per_group(spark):
    from kgraph_spark.operators.corpus_curation import sample_k_per_group

    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "de") for i in range(40)], "doc_id bigint, lang string"
    )
    got = sample_k_per_group(df, 3, group_col="lang")
    rows = got.collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    assert all(len(v) == 3 for v in by_lang.values())
    # deterministic: same rows on rerun
    again = {tuple(sorted(v)) for v in by_lang.values()}
    rows2 = sample_k_per_group(df, 3, group_col="lang").collect()
    by2 = {}
    for r in rows2:
        by2.setdefault(r["lang"], []).append(r["doc_id"])
    assert {tuple(sorted(v)) for v in by2.values()} == again
    # different salt redraws (40 docs, overwhelmingly unlikely identical)
    rows3 = sample_k_per_group(df, 3, group_col="lang", salt="v2").collect()
    assert {r["doc_id"] for r in rows3} != {r["doc_id"] for r in rows}
    # k larger than the group keeps everything
    assert sample_k_per_group(df, 100, group_col="lang").count() == 40
    with pytest.raises(ValueError, match="k must"):
        sample_k_per_group(df, 0)


def test_condense_components(spark):
    from kgraph_spark.operators.graph_analytics import condense_components

    labels = spark.createDataFrame(
        [("a", "c1"), ("b", "c1"), ("x", "c2"), ("y", "c2")], "id string, component string"
    )
    edges = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("b", "y"), ("a", "b")],
        "subject_id string, object_id string",
    )
    got = {(r["comp_src"], r["comp_dst"]): (r["n_edges"], r["n_pairs"])
           for r in condense_components(labels, edges).collect()}
    assert got[("c1", "c2")] == (3, 2)   # a→x twice counts 2 edges, 1 pair
    assert got[("c1", "c1")] == (1, 1)   # intra edge kept
    assert ("c2", "c1") not in got


def test_group_percentiles(spark):
    from kgraph_spark.operators.profiling import group_percentiles

    df = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 101)] + [("b", 5.0), ("b", None)],
        "g string, value double",
    )
    got = {r["g"]: r.asDict() for r in group_percentiles(df, "value", "g").collect()}
    assert got["a"]["n"] == 100
    assert got["a"]["p50"] == 50.5  # interpolated median of 1..100
    assert got["a"]["p99"] == 99.01
    assert got["a"]["mean"] == 50.5
    assert got["b"]["n"] == 1 and got["b"]["p90"] == 5.0


def test_value_histogram_bins_and_clamp(spark):
    from kgraph_spark.operators.profiling import value_histogram

    df = spark.createDataFrame(
        [(float(v),) for v in range(0, 101)] + [(None,)], "value double"
    )
    rows = {r["bin"]: r.asDict() for r in value_histogram(df, "value", 10).collect()}
    # width 10: bins 0..9; value 100 (the max) clamps into bin 9
    assert set(rows) == set(range(10))
    assert rows[0]["n"] == 10 and rows[9]["n"] == 11
    assert rows[0]["bin_lo"] == 0.0 and rows[0]["bin_hi"] == 10.0
    assert rows[9]["bin_hi"] == 100.0
    assert sum(r["n"] for r in rows.values()) == 101  # null excluded


def test_value_histogram_constant_and_grouped(spark):
    import pytest

    from kgraph_spark.operators.profiling import value_histogram

    const = spark.createDataFrame([(5.0,), (5.0,)], "value double")
    rows = value_histogram(const, "value", 4).collect()
    assert len(rows) == 1 and rows[0]["bin"] == 0 and rows[0]["n"] == 2
    g = spark.createDataFrame(
        [("a", 0.0), ("a", 9.0), ("b", 1.0)], "g string, value double"
    )
    by = {(r["g"], r["bin"]): r["n"] for r in value_histogram(g, "value", 3, "g").collect()}
    assert by == {("a", 0): 1, ("a", 2): 1, ("b", 0): 1}
    with pytest.raises(ValueError):
        value_histogram(const, "value", 0)


def test_mad_outliers_robust_to_heavy_contamination(spark):
    from kgraph_spark.operators.profiling import mad_outliers

    # 7 inliers near 10, 3 far contaminants: median 10, MAD small;
    # contaminants flag, inliers don't
    rows = [("g", float(v)) for v in (9, 9, 10, 10, 10, 11, 11, 500, 600, 700)]
    df = spark.createDataFrame(
        [(i, g, v) for i, (g, v) in enumerate(rows)], "event_id long, g string, value double"
    )
    got = {r["event_id"]: r.asDict() for r in mad_outliers(df, "value", "g", id_col="event_id").collect()}
    assert got[0]["median"] == 10.5  # interpolated median of 10 values
    flagged = {i for i, r in got.items() if r["is_outlier"]}
    assert flagged == {7, 8, 9}


def test_mad_outliers_null_never_flags(spark):
    from kgraph_spark.operators.profiling import mad_outliers

    df = spark.createDataFrame(
        [(1, "g", 1.0), (2, "g", 2.0), (3, "g", None)], "event_id long, g string, value double"
    )
    got = {r["event_id"]: r["is_outlier"] for r in mad_outliers(df, "value", "g", id_col="event_id").collect()}
    assert got[3] is False


def test_equi_depth_histogram_balanced(spark):
    import pytest

    from kgraph_spark.operators.profiling import equi_depth_histogram

    df = spark.createDataFrame([(float(v),) for v in range(1, 81)], "value double")
    rows = {r["bin"]: r.asDict() for r in equi_depth_histogram(df, "value", 4).collect()}
    # 80 distinct values, 4 bins -> 20 each
    assert set(rows) == {0, 1, 2, 3}
    assert all(rows[b]["n"] == 20 for b in rows)
    assert rows[0]["lo"] == 1.0 and rows[3]["hi"] == 80.0
    with pytest.raises(ValueError):
        equi_depth_histogram(df, "value", 0)


def test_key_skew_uniform_vs_hot(spark):
    from pyspark.sql import functions as F
    from kgraph_spark.operators.profiling import key_skew

    uniform = spark.range(0, 100).select((F.col("id") % 10).alias("k"))
    u = key_skew(uniform, "k").collect()[0]
    assert u["n_rows"] == 100 and u["n_keys"] == 10
    assert u["p_max"] == 0.1 and u["gini"] == 0.0  # perfectly even

    hot = spark.range(0, 100).select(
        F.when(F.col("id") < 91, F.lit("HOT")).otherwise(F.col("id").cast("string")).alias("k")
    )
    h = key_skew(hot, "k").collect()[0]
    assert h["top_key"] == "HOT" and h["max_key_rows"] == 91
    assert h["p_max"] == 0.91
    assert h["gini"] > 0.7  # one key owns the table
    assert h["topn_fraction"] == 1.0  # top-10 keys cover everything


def test_key_skew_topn_fraction(spark):
    from pyspark.sql import functions as F
    from kgraph_spark.operators.profiling import key_skew

    # 20 keys, each 5 rows; top-10 hold exactly half
    df = spark.range(0, 100).select((F.col("id") % 20).alias("k"))
    r = key_skew(df, "k", top_n=10).collect()[0]
    assert r["topn_fraction"] == 0.5 and r["gini"] == 0.0


def test_psi_identical_zero_and_shift_flags(spark):
    import pytest
    from pyspark.sql import functions as F
    from kgraph_spark.operators.profiling import psi_drift

    ref = spark.range(0, 1000).select((F.col("id") % 100).cast("double").alias("x"))
    same = psi_drift(ref, ref, "x").collect()[0]
    assert same["psi"] == 0.0 and same["n_ref"] == 1000 and same["n_cur"] == 1000
    # current shifted far right: mass piles into the top edge bin
    cur = spark.range(0, 1000).select((F.col("id") % 100 + 80).cast("double").alias("x"))
    drift = psi_drift(ref, cur, "x").collect()[0]
    assert drift["psi"] > 0.25
    with pytest.raises(ValueError):
        psi_drift(ref, cur, "x", n_bins=1)
    with pytest.raises(ValueError):
        psi_drift(ref.filter(F.col("x") < 0), cur, "x")  # empty reference


def test_psi_pinned_edges_and_null_exclusion(spark):
    from pyspark.sql import functions as F
    from kgraph_spark.operators.profiling import psi_drift

    ref = spark.range(0, 100).select((F.col("id") % 10).cast("double").alias("x"))
    cur = ref.unionByName(
        spark.createDataFrame([(None,)], "x double")
    )
    r = psi_drift(ref, cur, "x", lo=0.0, hi=10.0).collect()[0]
    assert r["n_cur"] == 100  # NULL excluded, not an edge-bin pile-up
    assert r["psi"] == 0.0


def test_fd_violations_detects_and_holds(spark):
    from kgraph_spark.operators.profiling import fd_violations

    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("b", 2), ("b", 3), ("c", None), ("c", 4)],
        "k string, v int",
    )
    r = fd_violations(df, "k", "v").collect()[0]
    # b -> {2,3} violates; c -> {NULL,4} violates (NULL is a value)
    assert r["n_lhs_values"] == 3 and r["n_violating"] == 2
    assert not r["holds"]
    clean = spark.createDataFrame([("a", 1), ("a", 1), ("b", 2)], "k string, v int")
    r2 = fd_violations(clean, "k", "v").collect()[0]
    assert r2["holds"] and r2["violation_rate"] == 0.0


def test_join_plan_stats_hand_case(spark):
    from kgraph_spark.operators.profiling import join_plan_stats

    left = spark.createDataFrame(
        [("a",), ("a",), ("b",)], "k string"
    )
    right = spark.createDataFrame(
        [("a",), ("a",), ("a",), ("c",), ("c",), ("c",), ("c",)], "j string"
    )
    r = join_plan_stats(
        left, right, "k", "j",
        broadcast_threshold_rows=5, target_partition_rows=4,
    ).collect()[0]
    assert r["out_rows"] == 6            # 2*3 for 'a'; 'b','c' never match
    assert r["left_rows"] == 3 and r["right_rows"] == 7
    assert r["matching_keys"] == 1
    assert r["max_key_out"] == 6 and r["top_key"] == "a"
    assert r["p_max_out"] == 1.0
    assert r["amplification"] == 0.6     # 6 / (3 + 7)
    assert r["broadcast_ok"] is False    # 7 > 5
    assert r["recommended_salts"] == 2   # ceil(6 / 4)
    # exactness: the stats row equals the materialized join's truth
    assert left.join(right, left["k"] == right["j"]).count() == r["out_rows"]


def test_join_plan_stats_disjoint_keys(spark):
    from kgraph_spark.operators.profiling import join_plan_stats

    left = spark.createDataFrame([("a",)], "k string")
    right = spark.createDataFrame([("b",)], "j string")
    r = join_plan_stats(left, right, "k", "j").collect()[0]
    assert r["out_rows"] == 0 and r["matching_keys"] == 0
    assert r["p_max_out"] is None and r["recommended_salts"] == 1
    assert r["broadcast_ok"] is True


def test_two_pass_median_matches_full_sort(spark):
    from kgraph_spark.operators.profiling import two_pass_median

    # odd group: lower median = 3rd of 5; even group: lower of middles
    rows = [("a", v) for v in (7.0, 1.0, 5.0, 3.0, 9.0)] + [
        ("b", v) for v in (10.0, 20.0, 30.0, 40.0)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r for r in two_pass_median(df, "v", "g", scale=100, n_buckets=4).collect()}
    assert out["a"]["median"] == 5.0 and out["a"]["n"] == 5
    assert out["b"]["median"] == 20.0 and out["b"]["n"] == 4
    # single-value group: degenerate bucket width path
    one = spark.createDataFrame([("c", 2.5)] * 3, "g string, v double")
    assert two_pass_median(one, "v", "g").first()["median"] == 2.5


def test_inclusion_dependencies_hand_case(spark):
    from kgraph_spark.operators.profiling import inclusion_dependencies

    child = spark.createDataFrame([(1,), (2,), (2,)], "k long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    out = {(r["col_a"], r["col_b"]): r for r in inclusion_dependencies(
        [("child", child), ("parent", parent)]).collect()}
    fk = out[("child", "parent")]
    assert fk["is_ind"] and fk["n_a"] == 2 and fk["containment"] == 1.0
    rev = out[("parent", "child")]
    assert not rev["is_ind"] and rev["containment"] == pytest.approx(2 / 3, abs=1e-6)


def test_herfindahl_hand_case(spark):
    from kgraph_spark.operators.profiling import herfindahl_index

    rows = [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 20
    df = spark.createDataFrame(rows, "src string")
    r = herfindahl_index(df, "src").first()
    assert (r["n_keys"], r["n_rows"]) == (3, 100)
    assert r["hhi"] == pytest.approx(0.38, abs=1e-9)
    assert r["hhi_normalized"] == pytest.approx((0.38 - 1 / 3) / (2 / 3), abs=1e-6)
    assert r["effective_n"] == pytest.approx(1 / 0.38, abs=1e-6)
    # monopoly: hhi = 1, normalized undefined for k = 1
    mono = spark.createDataFrame([("a",)] * 5, "src string")
    rm = herfindahl_index(mono, "src").first()
    assert rm["hhi"] == pytest.approx(1.0, abs=1e-9)
    assert rm["hhi_normalized"] is None


def test_otsu_threshold_hand_case(spark):
    from kgraph_spark.operators.profiling import otsu_threshold

    # [0,0,1,1,10,10]: best split <=1 | >1; between-var =
    # (4/6)(2/6)(9.5^2) = 20.0555...
    rows = [(0.0,), (0.0,), (1.0,), (1.0,), (10.0,), (10.0,)]
    df = spark.createDataFrame(rows, "v double")
    r = otsu_threshold(df, "v").first()
    assert (r["n"], r["k_values"]) == (6, 3)
    assert r["threshold"] == pytest.approx(1.0, abs=1e-9)
    assert r["w0"] == pytest.approx(4.0 / 6.0, abs=1e-6)
    assert r["mean0"] == pytest.approx(0.5, abs=1e-6)
    assert r["mean1"] == pytest.approx(10.0, abs=1e-6)
    assert r["between_var"] == pytest.approx(
        (4 / 6) * (2 / 6) * 9.5 ** 2, abs=1e-4
    )
    # constant input: no valid split -> empty result
    const = spark.createDataFrame([(3.0,)] * 4, "v double")
    assert otsu_threshold(const, "v").count() == 0
