"""Unit tests for the dedup decision stage (near_dup_clusters), schema
induction (type_constraints), lexical diversity, and the Benford audit —
hand-computed expectations on toy frames (reference dedup keep-best
semantics: /root/reference/kgraph/dedup.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kgraph_spark.operators.dedup_text import near_dup_clusters
from kgraph_spark.operators.profiling import benford_audit, benford_first_digit_micro
from kgraph_spark.operators.relationships import type_constraints
from kgraph_spark.operators.text_analysis import lexical_diversity


def test_near_dup_clusters_keep_best_and_singletons(spark):
    # chain 1-2, 2-3 → one cluster {1,2,3}; 4 singleton
    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 20), (4, 5)], "doc_id long, _rank long"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    got = {r["doc_id"]: r for r in near_dup_clusters(docs, pairs).collect()}
    assert len(got) == 4
    # cluster id = min reachable doc id
    assert got[1]["cluster_id"] == got[2]["cluster_id"] == got[3]["cluster_id"] == 1
    assert got[4]["cluster_id"] == 4
    # canonical = max rank (doc 2), everyone else dropped
    for d in (1, 2, 3):
        assert got[d]["canonical_id"] == 2
    assert [got[d]["keep"] for d in (1, 2, 3, 4)] == [False, True, False, True]


def test_near_dup_clusters_rank_tie_breaks_to_smaller_id(spark):
    docs = spark.createDataFrame([(7, 10), (9, 10)], "doc_id long, _rank long")
    pairs = spark.createDataFrame([(7, 9)], "doc_a long, doc_b long")
    got = {r["doc_id"]: r for r in near_dup_clusters(docs, pairs).collect()}
    assert got[7]["keep"] and not got[9]["keep"]
    assert got[9]["canonical_id"] == 7


def test_type_constraints_elects_dominant_and_counts_violations(spark):
    rows = (
        [("treats", "drug", "disease")] * 5
        + [("treats", "disease", "drug")] * 2
        + [("causes", "gene", "disease")] * 3
    )
    t = spark.createDataFrame(
        rows, "predicate string, subject_type string, object_type string"
    )
    got = {r["predicate"]: r for r in type_constraints(t).collect()}
    tr = got["treats"]
    assert (tr["dom_subject_type"], tr["dom_object_type"]) == ("drug", "disease")
    assert (tr["n_total"], tr["n_conforming"], tr["n_violations"]) == (7, 5, 2)
    assert tr["conform_micro"] == 1_000_000 * 5 // 7
    ca = got["causes"]
    assert ca["n_violations"] == 0 and ca["conform_micro"] == 1_000_000


def test_type_constraints_count_tie_breaks_lexicographically(spark):
    rows = [("p", "b", "x")] * 2 + [("p", "a", "y")] * 2
    t = spark.createDataFrame(
        rows, "predicate string, subject_type string, object_type string"
    )
    r = type_constraints(t).collect()[0]
    assert (r["dom_subject_type"], r["dom_object_type"]) == ("a", "y")


def test_lexical_diversity_hand_computed(spark):
    # tokens: the the cat sat → N=4, types=3, hapax=2 (cat, sat),
    # rep = 2·1 = 2, simpson = 1e6·2 // 12
    docs = spark.createDataFrame([(1, "the THE cat sat")], "doc_id long, text string")
    r = lexical_diversity(docs).collect()[0]
    assert (r["n_tokens"], r["n_types"]) == (4, 3)
    assert r["ttr_micro"] == 1_000_000 * 3 // 4
    assert r["hapax_micro"] == 1_000_000 * 2 // 3
    assert r["simpson_micro"] == 1_000_000 * 2 // 12


def test_lexical_diversity_single_token_doc(spark):
    docs = spark.createDataFrame([(1, "word")], "doc_id long, text string")
    r = lexical_diversity(docs).collect()[0]
    assert (r["n_tokens"], r["simpson_micro"]) == (1, 0)


def test_benford_literals_are_log10_micro():
    for d, m in zip(range(1, 10), benford_first_digit_micro()):
        assert abs(m - math.log10(1 + 1 / d) * 1e6) <= 0.5
    assert sum(benford_first_digit_micro()) in (999999, 1000000, 1000001)


def test_benford_audit_digit_extraction_and_shares(spark):
    # 123.00 → digit 1; 19.99 → 1; 0.42 → 4 (42 cents); 987.65 → 9
    df = spark.createDataFrame(
        [(123.00,), (19.99,), (0.42,), (987.65,)], "amt double"
    )
    got = {r["digit"]: r for r in benford_audit(df, "amt").collect()}
    assert got["1"]["n"] == 2 and got["4"]["n"] == 1 and got["9"]["n"] == 1
    assert got["1"]["share_micro"] == 500_000
    assert got["1"]["benford_micro"] == benford_first_digit_micro()[0]
    assert got["1"]["dev_micro"] == abs(500_000 - benford_first_digit_micro()[0])
