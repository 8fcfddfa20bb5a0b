"""Unit tests for rule_completion_candidates, cluster_cohesion and
ngram_novelty — hand-computed toy expectations."""

from __future__ import annotations

from kgraph_spark.operators.dedup_text import cluster_cohesion
from kgraph_spark.operators.relationships import rule_completion_candidates
from kgraph_spark.operators.text_analysis import ngram_novelty


def _triples(spark, rows):
    return spark.createDataFrame(
        rows, "subject_id string, predicate string, object_id string"
    )


def test_completion_emits_only_missing_heads(spark):
    t = _triples(
        spark,
        [
            ("a", "p1", "m"),
            ("m", "p2", "z1"),
            ("m", "p2", "z2"),
            ("a", "p3", "z1"),  # already asserted → not a candidate
        ],
    )
    got = {(r["subject_id"], r["object_id"])
           for r in rule_completion_candidates(t, "p1", "p2", "p3").collect()}
    assert got == {("a", "z2")}


def test_completion_dedups_multi_path_implications(spark):
    # two mids both imply (a, z) — one candidate row, not two
    t = _triples(
        spark,
        [("a", "p1", "m1"), ("a", "p1", "m2"), ("m1", "p2", "z"), ("m2", "p2", "z")],
    )
    out = rule_completion_candidates(t, "p1", "p2", "p3").collect()
    assert len(out) == 1 and out[0]["predicate"] == "p3"


def test_cluster_cohesion_transitive_chain(spark):
    # cluster {1,2,3} glued by 2 edges of 3 possible → cohesion 2/3
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (9, 9)], "doc_id long, cluster_id long"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    rows = cluster_cohesion(labels, pairs).collect()
    assert len(rows) == 1  # singleton cluster 9 excluded
    r = rows[0]
    assert (r["n_members"], r["n_possible_pairs"], r["n_direct_pairs"]) == (3, 3, 2)
    assert r["cohesion_micro"] == 1_000_000 * 2 // 3


def test_cluster_cohesion_cross_cluster_pairs_ignored(spark):
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3), (4, 3)], "doc_id long, cluster_id long"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "doc_a long, doc_b long"
    )
    got = {r["cluster_id"]: r["n_direct_pairs"]
           for r in cluster_cohesion(labels, pairs).collect()}
    assert got == {1: 1, 3: 1}  # the (2,3) bridge counts nowhere


def test_ngram_novelty_first_occurrence_attribution(spark):
    # doc 1: "a b c" → gram {a b c}; doc 2 repeats it + adds one novel gram
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c d")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in ngram_novelty(docs, k=3).collect()}
    assert got[1]["n_grams"] == 1 and got[1]["novelty_micro"] == 1_000_000
    # doc 2 grams: "a b c" (seen), "b c d" (novel) → 1/2
    assert got[2]["n_grams"] == 2 and got[2]["n_novel"] == 1
    assert got[2]["novelty_micro"] == 500_000


def test_pra_path_features_hand_counts(spark):
    from kgraph_spark.operators.relationships import pra_path_features

    t = spark.createDataFrame(
        [
            ("a", "p", "m"), ("b", "p", "m"),      # two in-edges to mid m
            ("m", "q", "x"), ("m", "q2", "x"),     # two out-edges m→x
            ("a", "p", "a2"),                       # mid a2 has no out
        ],
        "subject_id string, predicate string, object_id string",
    )
    out = {(r["src"], r["dst"], r["p1"], r["p2"]): r["n_paths"]
           for r in pra_path_features(t).collect()}
    assert out[("a", "x", "p", "q")] == 1 and out[("b", "x", "p", "q2")] == 1
    assert len(out) == 4  # {a,b} × {q,q2}, nothing through a2


def test_pra_hub_cap_and_self_pairs(spark):
    from kgraph_spark.operators.relationships import pra_path_features

    hub = [(f"s{i}", "p", "hub") for i in range(4)] + [
        ("hub", "q", f"t{i}") for i in range(4)
    ]
    loop = [("u", "p", "m2"), ("m2", "q", "u")]  # path u→m2→u: self, dropped
    t = spark.createDataFrame(
        hub + loop, "subject_id string, predicate string, object_id string"
    )
    assert pra_path_features(t, max_mid_degree=3).count() == 0
    assert pra_path_features(t, max_mid_degree=4).count() == 16
