"""negative_samples + dq_summary/fk_orphans + inverted_index/pmi units."""

import math

import pytest
from pyspark.sql import functions as F

from kgraph_spark.operators.negatives import negative_samples
from kgraph_spark.operators.profiling import dq_summary, fk_orphans
from kgraph_spark.operators.relevance import inverted_index, pmi_collocations


def _tri(spark, rows):
    return spark.createDataFrame(
        rows, "subject_id string, predicate string, object_id string"
    )


def test_negative_samples_shape_and_determinism(spark):
    tri = _tri(spark, [("s1", "r", "e1"), ("s2", "r", "e2")])
    ents = spark.createDataFrame([(f"e{i}",) for i in range(10)], "id string")
    a = sorted(map(tuple, negative_samples(tri, ents, k=4).collect()))
    b = sorted(map(tuple, negative_samples(tri, ents, k=4).collect()))
    assert a == b  # pure function of (s,p,o,j,salt)
    # each triple yields <= k rows; none equals a true object of its (s,p)
    assert all(r[4] != "e1" for r in a if r[0] == "s1")
    assert 0 < len(a) <= 8
    # different salt redraws
    c = sorted(map(tuple, negative_samples(tri, ents, k=4, salt="v2").collect()))
    assert c != a


def test_negative_samples_filters_true_triples(spark):
    # every entity is a true object of s1 -> all draws filtered
    tri = _tri(spark, [("s1", "r", "e0"), ("s1", "r", "e1")])
    ents = spark.createDataFrame([("e0",), ("e1",)], "id string")
    assert negative_samples(tri, ents, k=5).count() == 0


def test_negative_samples_validation(spark):
    tri = _tri(spark, [("s", "r", "o")])
    ents = spark.createDataFrame([("e",)], "id string")
    with pytest.raises(ValueError):
        negative_samples(tri, ents, k=0)
    with pytest.raises(ValueError):
        negative_samples(tri, ents.filter("id != 'e'"), k=1)


def test_fk_orphans_and_dq_summary(spark):
    child = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "fk long, v string")
    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    orphans = fk_orphans(child, parent, "fk", "pk")
    assert [r["fk"] for r in orphans.collect()] == [3]
    out = {
        r["rule"]: r["n_violations"]
        for r in dq_summary(
            {"orphans": orphans, "none": child.filter("fk < 0")}
        ).collect()
    }
    assert out == {"orphans": 1, "none": 0}
    with pytest.raises(ValueError):
        dq_summary({})


def test_inverted_index_cap_and_stats(spark):
    docs = spark.createDataFrame(
        [(1, "x x x y"), (2, "x y"), (3, "x")], "doc_id long, text string"
    )
    rows = inverted_index(docs, max_postings=2, min_df=2).collect()
    x = sorted((r["doc_id"], r["tf"], r["rank"]) for r in rows if r["term"] == "x")
    # cap keeps top-2 by (tf desc, doc asc): doc1 tf3, doc2 tf1
    assert x == [(1, 3, 1), (2, 1, 2)]
    assert {r["term"] for r in rows} == {"x", "y"}  # min_df=2 keeps both
    df_cf = {(r["term"], r["df"], r["cf"]) for r in rows}
    assert ("x", 3, 5) in df_cf and ("y", 2, 2) in df_cf


def test_pmi_collocations_hand_computed(spark):
    # 4 docs: a&b together twice, a alone once, b alone once
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a"), (4, "b")], "doc_id long, text string"
    )
    rows = pmi_collocations(docs, ["a", "b"]).collect()
    assert len(rows) == 1
    r = rows[0].asDict()
    assert (r["n_ab"], r["n_a"], r["n_b"]) == (2, 3, 3)
    assert r["pmi"] == round(math.log(2 * 4 / 9), 6)
    assert r["npmi"] == round(math.log(8 / 9) / -math.log(2 / 4), 6)


def test_pmi_npmi_null_when_pair_everywhere(spark):
    docs = spark.createDataFrame([(1, "a b"), (2, "b a")], "doc_id long, text string")
    r = pmi_collocations(docs, ["a", "b"]).collect()[0]
    assert r["npmi"] is None
