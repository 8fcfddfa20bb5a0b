"""Pairwise clustering P/R/F1 — hand-computed contingency cases, plus a
composition with the real connected_components output."""

from __future__ import annotations

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
