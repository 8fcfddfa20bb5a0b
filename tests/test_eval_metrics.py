"""Pairwise clustering P/R/F1 — hand-computed contingency cases, plus a
composition with the real connected_components output."""

from __future__ import annotations

import pytest

from kgraph_spark.operators.eval_metrics import cluster_pair_metrics


def _pred(spark, rows):
    return spark.createDataFrame(rows, "item_id string, pred_cluster string")


def _gold(spark, rows):
    return spark.createDataFrame(rows, "item_id string, gold_cluster string")


def test_refinement_gives_perfect_precision(spark):
    # gold {1,2,3},{4,5,6}; pred splits the first: {1,2},{3},{4,5,6}
    pred = _pred(spark, [("1", "a"), ("2", "a"), ("3", "b"), ("4", "c"), ("5", "c"), ("6", "c")])
    gold = _gold(spark, [("1", "x"), ("2", "x"), ("3", "x"), ("4", "y"), ("5", "y"), ("6", "y")])
    r = cluster_pair_metrics(pred, gold).collect()[0]
    assert r["n_items"] == 6
    assert (r["pairs_pred"], r["pairs_gold"], r["pairs_both"]) == (4, 6, 4)
    assert r["pair_precision"] == 1.0
    assert abs(r["pair_recall"] - 0.666667) < 1e-9
    assert r["pair_f1"] == 0.8


def test_overmerge_hurts_precision(spark):
    # pred merges everything; gold has two clusters of 2
    pred = _pred(spark, [(str(i), "a") for i in range(4)])
    gold = _gold(spark, [("0", "x"), ("1", "x"), ("2", "y"), ("3", "y")])
    r = cluster_pair_metrics(pred, gold).collect()[0]
    assert (r["pairs_pred"], r["pairs_gold"], r["pairs_both"]) == (6, 2, 2)
    assert abs(r["pair_precision"] - 0.333333) < 1e-9
    assert r["pair_recall"] == 1.0
    assert r["pair_f1"] == 0.5


def test_all_singletons_null_precision(spark):
    pred = _pred(spark, [("1", "a"), ("2", "b")])
    gold = _gold(spark, [("1", "x"), ("2", "x")])
    r = cluster_pair_metrics(pred, gold).collect()[0]
    assert r["pairs_pred"] == 0 and r["pair_precision"] is None
    assert r["pair_recall"] == 0.0 and r["pair_f1"] == 0.0


def test_inner_join_universe(spark):
    # item 3 only in pred: dropped from every count
    pred = _pred(spark, [("1", "a"), ("2", "a"), ("3", "a")])
    gold = _gold(spark, [("1", "x"), ("2", "x")])
    r = cluster_pair_metrics(pred, gold).collect()[0]
    assert r["n_items"] == 2 and r["pairs_pred"] == 1 and r["pairs_both"] == 1


def test_composes_with_connected_components(spark):
    from kgraph_spark.operators.canonicalize import connected_components

    # two chains 0-1-2 and 3-4; gold says {0,1,2} and {3,4}: perfect
    edges = spark.createDataFrame(
        [("n0", "n1"), ("n1", "n2"), ("n3", "n4")], "src string, dst string"
    )
    comp = connected_components(edges).select(
        "id", "component"
    )
    gold = spark.createDataFrame(
        [("n0", "g0"), ("n1", "g0"), ("n2", "g0"), ("n3", "g1"), ("n4", "g1")],
        "id string, gold_cluster string",
    )
    r = cluster_pair_metrics(
        comp, gold, item_col="id", pred_col="component", gold_col="gold_cluster"
    ).collect()[0]
    assert r["pair_precision"] == 1.0 and r["pair_recall"] == 1.0 and r["pair_f1"] == 1.0


# ---- B-cubed ------------------------------------------------------------


def _clusters(spark, rows, col):
    return spark.createDataFrame(rows, f"item_id string, {col} string")


def test_bcubed_hand_example(spark):
    from kgraph_spark.operators.eval_metrics import bcubed_metrics

    pred = _clusters(
        spark,
        [("1", "p1"), ("2", "p1"), ("3", "p2"), ("4", "p3"), ("5", "p3")],
        "pred_cluster",
    )
    gold = _clusters(
        spark,
        [("1", "g1"), ("2", "g1"), ("3", "g1"), ("4", "g2"), ("5", "g2")],
        "gold_cluster",
    )
    row = bcubed_metrics(pred, gold).collect()[0]
    # precision: every pred cluster is pure -> 1.0
    # recall: (2/3 + 2/3 + 1/3 + 1 + 1) / 5 = 11/15; F1 = 22/26
    assert row["n_items"] == 5
    assert row["bcubed_precision"] == 1.0
    assert abs(row["bcubed_recall"] - 11 / 15) < 2e-6
    assert abs(row["bcubed_f1"] - 22 / 26) < 2e-6


def test_bcubed_perfect_and_degenerate(spark):
    from kgraph_spark.operators.eval_metrics import bcubed_metrics

    pred = _clusters(spark, [("1", "a"), ("2", "a"), ("3", "b")], "pred_cluster")
    row = bcubed_metrics(
        pred, pred.withColumnRenamed("pred_cluster", "gold_cluster")
    ).collect()[0]
    assert (row["bcubed_precision"], row["bcubed_recall"], row["bcubed_f1"]) == (1.0, 1.0, 1.0)
    # all-singleton pred vs one gold cluster of n=3: P=1, R=1/3
    singles = _clusters(spark, [("1", "s1"), ("2", "s2"), ("3", "s3")], "pred_cluster")
    gold = _clusters(spark, [("1", "g"), ("2", "g"), ("3", "g")], "gold_cluster")
    row = bcubed_metrics(singles, gold).collect()[0]
    assert row["bcubed_precision"] == 1.0
    assert abs(row["bcubed_recall"] - 1 / 3) < 2e-6


def test_bcubed_vs_pairwise_sensitivity(spark):
    """The motivating disagreement: one mega-merge hurts pairwise precision
    far more than B³ (pairs grow quadratically, items linearly)."""
    from kgraph_spark.operators.eval_metrics import bcubed_metrics, cluster_pair_metrics

    pred_rows = [(str(i), "mega") for i in range(20)]
    gold_rows = [(str(i), f"g{i % 10}") for i in range(20)]
    pred = _clusters(spark, pred_rows, "pred_cluster")
    gold = _clusters(spark, gold_rows, "gold_cluster")
    b3 = bcubed_metrics(pred, gold).collect()[0]
    pw = cluster_pair_metrics(pred, gold).collect()[0]
    assert pw["pair_precision"] < b3["bcubed_precision"] < 0.5


def test_blocking_quality_hand_case(spark):
    from kgraph_spark.operators.eval_metrics import blocking_quality

    gold = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "x"), (4, "y"), (5, "y")],
        "item_id long, gold_cluster string",
    )
    # gold pairs: C(3,2)+C(2,2)... = 3 + 1 = 4; total = C(5,2) = 10
    cands = spark.createDataFrame(
        [
            (1, 2),     # true pair
            (2, 1),     # flipped duplicate — must not double count
            (3, 3),     # self pair — dropped
            (4, 5),     # true pair
            (1, 4),     # false pair
            (1, 99),    # endpoint outside gold universe — dropped
        ],
        "id_a long, id_b long",
    )
    r = blocking_quality(cands, gold).collect()[0]
    assert r["n_items"] == 5 and r["total_pairs"] == 10
    assert r["n_candidate_pairs"] == 3
    assert r["gold_pairs"] == 4 and r["covered_gold_pairs"] == 2
    assert r["reduction_ratio"] == 0.7
    assert r["pairs_completeness"] == 0.5
    assert r["pairs_quality"] == round(2 / 3, 6)


def test_blocking_quality_perfect_blocker(spark):
    from kgraph_spark.operators.eval_metrics import blocking_quality

    gold = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y")], "item_id long, gold_cluster string"
    )
    cands = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    r = blocking_quality(cands, gold).collect()[0]
    assert r["pairs_completeness"] == 1.0 and r["pairs_quality"] == 1.0
    assert r["reduction_ratio"] == round(1 - 1 / 3, 6)


def test_ranking_metrics_hand_case(spark):
    from kgraph_spark.operators.eval_metrics import ranking_metrics

    # q1: gold c3 outranked by nothing → rank 1
    # q2: gold c1 beaten by c2 (higher) and tied-with-lower-id c0 → rank 3
    # q3: gold c9 absent from scored → contributes 0, excluded from mean
    scored = spark.createDataFrame(
        [
            (1, 3, 90), (1, 4, 50),
            (2, 1, 70), (2, 2, 80), (2, 0, 70), (2, 5, 10),
            (3, 7, 99),
        ],
        "query_id long, candidate_id long, score long",
    )
    gold = spark.createDataFrame(
        [(1, 3), (2, 1), (3, 9)], "query_id long, gold_id long"
    )
    r = ranking_metrics(scored, gold, ks=(1, 3)).collect()[0]
    assert r["n_queries"] == 3 and r["n_found"] == 2
    assert r["mrr"] == round((1_000_000 + 1_000_000 // 3) / 3_000_000, 6)
    assert r["mean_rank"] == 2.0          # (1 + 3) / 2 found
    assert r["hits_at_1"] == round(1 / 3, 6)
    assert r["hits_at_3"] == round(2 / 3, 6)


def test_ranking_metrics_no_gold_found(spark):
    from kgraph_spark.operators.eval_metrics import ranking_metrics

    scored = spark.createDataFrame(
        [(1, 2, 10)], "query_id long, candidate_id long, score long"
    )
    gold = spark.createDataFrame([(1, 99)], "query_id long, gold_id long")
    r = ranking_metrics(scored, gold, ks=(1,)).collect()[0]
    assert r["n_queries"] == 1 and r["n_found"] == 0
    assert r["mrr"] == 0.0 and r["hits_at_1"] == 0.0
    assert r["mean_rank"] is None


def test_fs_agreement_weights_hand_case(spark):
    from kgraph_spark.operators.eval_metrics import fs_agreement_weights

    # 2 matches, 2 non-matches after normalization: (1,2) duplicated
    # flipped (must count once), (3,3) self-pair dropped, NULL label dropped
    pairs = spark.createDataFrame(
        [
            (1, 2, True, True, False),
            (2, 1, True, True, False),   # flipped dup of (1,2)
            (3, 4, True, False, None),   # NULL agreement = disagree
            (5, 6, False, True, True),
            (7, 8, False, False, False),
            (3, 3, True, True, True),    # self pair dropped
            (9, 10, None, True, True),   # NULL label dropped
        ],
        "id_a long, id_b long, is_match boolean, f1 boolean, f2 boolean",
    )
    rows = {r["field"]: r for r in fs_agreement_weights(pairs, ["f1", "f2"]).collect()}
    assert set(rows) == {"f1", "f2"}
    f1 = rows["f1"]
    assert f1["n_match"] == 2 and f1["n_nonmatch"] == 2
    # matches: (1,2) agrees, (3,4) disagrees; non-matches: (5,6) agrees
    assert f1["agree_match"] == 1 and f1["agree_nonmatch"] == 1
    assert f1["m_prob"] == 0.5             # (1+1)/(2+2)
    assert f1["u_prob"] == 0.5             # (1+1)/(2+2)
    assert f1["mu_ratio"] == 1.0           # (2·4)/(2·4)
    f2 = rows["f2"]
    assert f2["agree_match"] == 0 and f2["agree_nonmatch"] == 1
    assert f2["m_prob"] == 0.25 and f2["mu_ratio"] == 0.5


def test_fs_agreement_weights_validation(spark):
    import pytest as _pytest

    from kgraph_spark.operators.eval_metrics import fs_agreement_weights

    pairs = spark.createDataFrame(
        [(1, 2, True, True)], "id_a long, id_b long, is_match boolean, f boolean"
    )
    with _pytest.raises(ValueError):
        fs_agreement_weights(pairs, [])


def test_pr_threshold_sweep_hand_case(spark):
    from kgraph_spark.operators.eval_metrics import pr_threshold_sweep

    scored = spark.createDataFrame(
        [
            (5, True), (3, True), (1, False), (4, False),
            (None, True),          # NULL score never predicts positive
            (9, None),             # NULL label dropped
        ],
        "score long, label boolean",
    )
    rows = {r["threshold"]: r for r in
            pr_threshold_sweep(scored, [2, 4]).collect()}
    t2 = rows[2]   # pos: 5T,3T,4F → tp=2 fp=1 fn=1(null-score T) tn=1
    assert (t2["tp"], t2["fp"], t2["fn"], t2["tn"]) == (2, 1, 1, 1)
    assert t2["precision"] == round(2 / 3, 6)
    assert t2["recall"] == round(2 / 3, 6)
    assert t2["f1"] == round(4 / 6, 6)
    t4 = rows[4]   # pos: 5T,4F → tp=1 fp=1 fn=2 tn=1
    assert (t4["tp"], t4["fp"], t4["fn"], t4["tn"]) == (1, 1, 2, 1)
    assert t4["recall"] == round(1 / 3, 6)


def test_pr_threshold_sweep_validation(spark):
    import pytest as _pytest

    from kgraph_spark.operators.eval_metrics import pr_threshold_sweep

    df = spark.createDataFrame([(1, True)], "score long, label boolean")
    with _pytest.raises(ValueError):
        pr_threshold_sweep(df, [])


def test_cohens_kappa_chance_and_perfect(spark):
    from kgraph_spark.operators.eval_metrics import cohens_kappa

    # balanced marginals, half agreement → kappa exactly 0 (pure chance)
    chance = spark.createDataFrame(
        [("x", "x"), ("x", "y"), ("y", "x"), ("y", "y")],
        "label_a string, label_b string",
    )
    r = cohens_kappa(chance).collect()[0]
    assert r["n"] == 4 and r["n_agree"] == 2
    assert r["po"] == 0.5 and r["pe"] == 0.5 and r["kappa"] == 0.0

    perfect = spark.createDataFrame(
        [("x", "x"), ("y", "y"), ("z", "z"), (None, "x")],
        "label_a string, label_b string",
    )
    p = cohens_kappa(perfect).collect()[0]
    assert p["n"] == 3 and p["kappa"] == 1.0

    # degenerate: single shared category → pe = 1, kappa undefined (NULL)
    deg = spark.createDataFrame(
        [("x", "x"), ("x", "x")], "label_a string, label_b string"
    )
    d = cohens_kappa(deg).collect()[0]
    assert d["pe"] == 1.0 and d["kappa"] is None


def test_ndcg_hand_case(spark):
    from kgraph_spark.operators.eval_metrics import ndcg_at_k, ndcg_discount_micro

    w = ndcg_discount_micro(3)
    scored = spark.createDataFrame(
        [
            # q1: score order c1(rel2) c2(rel0) c3(rel1); ideal 2,1,0
            (1, 1, 90, 2), (1, 2, 50, 0), (1, 3, 10, 1),
            # q2: nothing relevant → idcg 0, excluded from the mean
            (2, 4, 99, 0), (2, 5, 1, 0),
        ],
        "query_id long, candidate_id long, score long, relevance long",
    )
    r = ndcg_at_k(scored, k=3).collect()[0]
    dcg = 2 * w[0] + 0 * w[1] + 1 * w[2]
    idcg = 2 * w[0] + 1 * w[1] + 0 * w[2]
    expected = ((dcg * 1_000_000) // idcg) / 1_000_000
    assert r["n_scored_queries"] == 2 and r["n_queries"] == 1
    assert r["ndcg_at_3"] == round(expected, 6)


def test_ndcg_perfect_ranking(spark):
    from kgraph_spark.operators.eval_metrics import ndcg_at_k

    scored = spark.createDataFrame(
        [(1, 1, 9, 2), (1, 2, 5, 1), (1, 3, 1, 0)],
        "query_id long, candidate_id long, score long, relevance long",
    )
    r = ndcg_at_k(scored, k=3).collect()[0]
    assert r["ndcg_at_3"] == 1.0


def test_ndcg_discount_validation():
    import pytest as _pytest

    from kgraph_spark.operators.eval_metrics import ndcg_discount_micro

    assert ndcg_discount_micro(3) == [1000000, 630930, 500000]
    with _pytest.raises(ValueError):
        ndcg_discount_micro(0)


def test_retrieval_recall_hand_case(spark):
    import pytest

    from kgraph_spark.operators.eval_metrics import retrieval_recall

    truth = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 20), (2, 21)],
        "probe_id long, vec_id long",
    )
    approx = spark.createDataFrame(
        [(1, 11), (1, 99), (1, 12)], "probe_id long, vec_id long"
    )
    out = {r["probe_id"]: r for r in retrieval_recall(truth, approx).collect()}
    assert out[1]["n_hits"] == 2 and out[1]["recall"] == pytest.approx(2 / 3, abs=1e-6)
    # probe 2 absent from approx -> honest zero, not a missing row
    assert out[2]["n_hits"] == 0 and out[2]["recall"] == 0.0


def test_classification_report_hand_case(spark):
    import pytest

    from kgraph_spark.operators.eval_metrics import classification_report

    # truths: a,a,b,c ; preds: a,b,b,b — 'c' never predicted, 'b' over-predicted
    rows = [("a", "a"), ("a", "b"), ("b", "b"), ("c", "b")]
    df = spark.createDataFrame(rows, "truth string, pred string")
    out = {r["label"]: r for r in classification_report(df).collect()}
    assert out["a"]["tp"] == 1 and out["a"]["precision"] == 1.0
    assert out["a"]["recall"] == 0.5
    assert out["a"]["f1"] == pytest.approx(2 / 3, abs=1e-6)
    assert out["b"]["precision"] == pytest.approx(1 / 3, abs=1e-6)
    # never-predicted class: NULL precision (not 0), zero recall
    assert out["c"]["precision"] is None and out["c"]["recall"] == 0.0


def test_classification_report_pred_only_label(spark):
    from kgraph_spark.operators.eval_metrics import classification_report

    df = spark.createDataFrame([("a", "z")], "truth string, pred string")
    out = {r["label"]: r for r in classification_report(df).collect()}
    assert out["z"]["n_true"] == 0 and out["z"]["recall"] is None
    assert out["z"]["precision"] == 0.0


def test_cannot_link_violations_hand_case(spark):
    from kgraph_spark.operators.canonicalize import cannot_link_violations

    asg = spark.createDataFrame(
        [("a", "c1"), ("b", "c1"), ("c", "c2"), ("d", "c2")],
        "entity_id string, cluster_id string",
    )
    cons = spark.createDataFrame(
        # (b,a) duplicates (a,b); (a,c) crosses clusters; self pair dropped
        [("a", "b"), ("b", "a"), ("a", "c"), ("d", "d"), ("d", "c")],
        "id_a string, id_b string",
    )
    rows = cannot_link_violations(asg, cons).collect()
    got = {(r["id_a"], r["id_b"], r["cluster_id"]) for r in rows}
    assert got == {("a", "b", "c1"), ("c", "d", "c2")}
    assert len(rows) == 2  # flipped duplicate reported once


def test_auc_roc_hand_case(spark):
    import pytest
    from pyspark.sql import functions as F

    from kgraph_spark.operators.eval_metrics import auc_roc

    # pos [0.8, 0.6], neg [0.4, 0.6, 0.2]: midranks give R+ = 3.5 + 5,
    # U = 5.5, AUC = 5.5/6
    rows = [(0.8, 1), (0.6, 1), (0.4, 0), (0.6, 0), (0.2, 0)]
    df = spark.createDataFrame(rows, "score double, label int")
    r = auc_roc(df).first()
    assert (r["n_pos"], r["n_neg"]) == (2, 3)
    assert r["auc"] == pytest.approx(round(5.5 / 6.0, 6), abs=1e-9)
    assert r["gini"] == pytest.approx(round(2 * 5.5 / 6.0 - 1.0, 6), abs=1e-9)
    # perfect separation -> 1.0; label inversion -> 0.0
    sep = spark.createDataFrame([(0.9, 1), (0.8, 1), (0.1, 0)], "score double, label int")
    assert auc_roc(sep).first()["auc"] == 1.0
    inv = sep.select("score", (1 - F.col("label")).alias("label"))
    assert auc_roc(inv).first()["auc"] == 0.0
    # single-class input -> NULL
    onec = spark.createDataFrame([(0.5, 1)], "score double, label int")
    assert auc_roc(onec).first()["auc"] is None


def test_calibration_bins_hand_case(spark):
    import pytest

    from kgraph_spark.operators.eval_metrics import calibration_bins

    rows = [(0.05, 0), (0.15, 1), (0.95, 1), (1.0, 1)]
    df = spark.createDataFrame(rows, "prob double, label int")
    out = {r["bin"]: r for r in calibration_bins(df, n_bins=10).collect()}
    assert sorted(out) == [0, 1, 9]  # prob=1.0 clamps into the top bin
    assert (out[0]["n"], out[0]["accuracy"]) == (1, 0.0)
    assert out[0]["confidence"] == pytest.approx(0.05, abs=1e-9)
    assert out[0]["gap"] == pytest.approx(0.05, abs=1e-9)
    assert out[0]["weighted_gap_micro"] == 50000
    assert out[1]["gap"] == pytest.approx(-0.85, abs=1e-9)
    assert out[1]["weighted_gap_micro"] == 850000
    assert (out[9]["n"], out[9]["accuracy"]) == (2, 1.0)
    assert out[9]["confidence"] == pytest.approx(0.975, abs=1e-9)
    # exact-integer ECE fold: sum |pms - pos*1e6| / (N * 1e6)
    ece = sum(r["weighted_gap_micro"] for r in out.values()) / (4 * 1_000_000)
    assert ece == pytest.approx((50000 + 850000 + 50000) / 4e6, abs=1e-12)


def test_average_precision_hand_case(spark):
    from kgraph_spark.operators.eval_metrics import average_precision

    # scores 3,2,1 labels 1,0,1: AP = (1 + 2/3)/2 = 5/6
    df = spark.createDataFrame(
        [(3.0, True), (2.0, False), (1.0, True)], "s double, y boolean"
    )
    r = average_precision(df, "s", "y").first()
    assert (r["n_pos"], r["n_neg"]) == (2, 1)
    assert r["ap"] == pytest.approx(5.0 / 6.0, abs=1e-6)
    assert r["prevalence"] == pytest.approx(2.0 / 3.0, abs=1e-6)
    # tied block: one threshold, precision 1/2 -> AP = 1/2
    tied = spark.createDataFrame(
        [(1.0, True), (1.0, False)], "s double, y boolean"
    )
    assert average_precision(tied, "s", "y").first()["ap"] == pytest.approx(
        0.5, abs=1e-9
    )
    # no positives -> NULL ap
    neg = spark.createDataFrame([(1.0, False)], "s double, y boolean")
    assert average_precision(neg, "s", "y").first()["ap"] is None


def test_brier_decomposition_hand_case(spark):
    from kgraph_spark.operators.eval_metrics import brier_decomposition

    # probs .8(y1) .8(y0) .2(y0): brier 0.24; binned by distinct prob
    # the Murphy identity holds exactly: rel - res + unc = brier
    df = spark.createDataFrame(
        [(0.8, True), (0.8, False), (0.2, False)], "prob double, y boolean"
    )
    r = brier_decomposition(df, "prob", "y").first()
    assert (r["n"], r["k_probs"]) == (3, 2)
    assert r["brier"] == pytest.approx(0.24, abs=1e-9)
    assert r["reliability"] == pytest.approx(0.22 / 3, abs=1e-6)
    assert r["resolution"] == pytest.approx(1.0 / 18, abs=1e-6)
    assert r["uncertainty"] == pytest.approx(2.0 / 9, abs=1e-6)
    assert r["reliability"] - r["resolution"] + r["uncertainty"] == pytest.approx(
        r["brier"], abs=1e-5
    )
    # perfect confident forecaster: brier 0, rel 0, res = unc
    p = spark.createDataFrame(
        [(1.0, True), (0.0, False), (0.0, False)], "prob double, y boolean"
    )
    rp = brier_decomposition(p, "prob", "y").first()
    assert rp["brier"] == 0.0 and rp["reliability"] == 0.0
    assert rp["resolution"] == pytest.approx(rp["uncertainty"], abs=1e-9)


def test_lift_gains_hand_case(spark):
    from kgraph_spark.operators.eval_metrics import lift_gains

    # scores 10..1, positives at 10 and 9: top deciles lift 5
    rows = [(float(10 - i), i < 2) for i in range(10)]
    df = spark.createDataFrame(rows, "s double, y boolean")
    out = {r["bucket"]: r for r in lift_gains(df, "s", "y", 10).collect()}
    assert len(out) == 10
    assert out[0]["lift"] == pytest.approx(5.0, abs=1e-9)
    assert out[0]["cum_gain"] == pytest.approx(0.5, abs=1e-9)
    assert out[1]["cum_gain"] == pytest.approx(1.0, abs=1e-9)
    assert out[2]["lift"] == pytest.approx(0.0, abs=1e-9)
    assert out[9]["cum_pct_rows"] == pytest.approx(1.0, abs=1e-9)
    # one giant tie -> a single bucket holding everything (never split)
    tied = spark.createDataFrame(
        [(1.0, i % 2 == 0) for i in range(6)], "s double, y boolean"
    )
    t = lift_gains(tied, "s", "y", 10).collect()
    assert len(t) == 1 and t[0]["bucket"] == 0
    assert t[0]["lift"] == pytest.approx(1.0, abs=1e-9)


def test_binary_confusion_stats_hand_case(spark):
    import math

    from kgraph_spark.operators.eval_metrics import binary_confusion_stats

    rows = (
        [(True, True)] * 2 + [(True, False)] * 1
        + [(False, True)] * 1 + [(False, False)] * 6
    )
    df = spark.createDataFrame(rows, "pred boolean, y boolean")
    r = binary_confusion_stats(df, "pred", "y").first()
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (2, 1, 1, 6)
    assert r["precision"] == pytest.approx(2 / 3, abs=1e-6)
    assert r["recall"] == pytest.approx(2 / 3, abs=1e-6)
    assert r["f1"] == pytest.approx(2 / 3, abs=1e-6)
    assert r["balanced_acc"] == pytest.approx((2 / 3 + 6 / 7) / 2, abs=1e-6)
    assert r["mcc"] == pytest.approx(11.0 / math.sqrt(3 * 3 * 7 * 7), abs=1e-6)
    # all-one-class prediction: mcc denominator 0 -> NULL (not 0.0)
    bad = spark.createDataFrame(
        [(True, True), (True, False)], "pred boolean, y boolean"
    )
    assert binary_confusion_stats(bad, "pred", "y").first()["mcc"] is None


def test_regression_metrics_hand_case(spark):
    import math

    from kgraph_spark.operators.eval_metrics import regression_metrics

    # preds [2,3] vs actuals [1,5]: MAE 1.5, RMSE sqrt(2.5),
    # R2 = 1 - 5/4 (SST about the mean = 8, /n), MAPE = (1 + 0.4)/2
    df = spark.createDataFrame(
        [(2.0, 1.0), (3.0, 5.0)], "pred double, actual double"
    )
    r = regression_metrics(df, "pred", "actual").first()
    assert r["n"] == 2
    assert r["mae"] == pytest.approx(1.5, abs=1e-9)
    assert r["rmse"] == pytest.approx(math.sqrt(2.5), abs=1e-6)
    assert r["r2"] == pytest.approx(1 - 5.0 / 8.0, abs=1e-6)
    assert r["mape"] == pytest.approx(0.7, abs=1e-6)
    # zero actuals are skipped by MAPE but counted everywhere else
    z = spark.createDataFrame(
        [(1.0, 0.0), (2.0, 2.0)], "pred double, actual double"
    )
    rz = regression_metrics(z, "pred", "actual").first()
    assert rz["n"] == 2 and rz["mape"] == pytest.approx(0.0, abs=1e-9)
    # constant actuals -> SST 0 -> NULL r2
    c = spark.createDataFrame(
        [(1.0, 2.0), (3.0, 2.0)], "pred double, actual double"
    )
    assert regression_metrics(c, "pred", "actual").first()["r2"] is None


def test_rank_biased_overlap_hand_case(spark):
    from kgraph_spark.operators.eval_metrics import rank_biased_overlap

    ra = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], "id string, rank long"
    )
    # identical rankings at k=3, p=0.9: rbo = 1 - 0.9^3
    r = rank_biased_overlap(ra, ra, k=3, p=0.9).first()
    assert (r["n_both"], r["overlap_at_k"]) == (3, 3)
    assert r["rbo"] == pytest.approx(1 - 0.9 ** 3, abs=1e-6)
    # disjoint top-k: rbo = 0
    rb = spark.createDataFrame(
        [("x", 1), ("y", 2), ("z", 3)], "id string, rank long"
    )
    r2 = rank_biased_overlap(ra, rb, k=3, p=0.9).first()
    assert (r2["n_both"], r2["rbo"]) == (0, 0.0)
    # same set, reversed order: X = [0, 0, 3] (only depth 3 overlaps
    # all three: max(ra,rb) = 3 for a/c, 2 for b -> X2=1, X3=3)
    rc = spark.createDataFrame(
        [("c", 1), ("b", 2), ("a", 3)], "id string, rank long"
    )
    r3 = rank_biased_overlap(ra, rc, k=3, p=0.9).first()
    exp = 0.1 * (0.9 * 1 / 2 + 0.81 * 3 / 3)
    assert r3["rbo"] == pytest.approx(exp, abs=1e-6)
