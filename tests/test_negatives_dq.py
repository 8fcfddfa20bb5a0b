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


def test_containment_subset_doc(spark):
    from kgraph_spark.operators.dedup_text import containment_pairs, shingles

    # doc 2's tokens are a strict subset of doc 1's; doc 3 unrelated
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"), (2, "beta gamma"), (3, "zeta eta")],
        "doc_id long, text string",
    )
    rows = containment_pairs(shingles(docs, k=1), min_containment=0.9).collect()
    assert len(rows) == 1
    r = rows[0].asDict()
    assert (r["doc_a"], r["doc_b"], r["n_shared"]) == (1, 2, 2)
    # containment is asymmetric: B fully inside A, A only 2/5 inside B
    assert r["containment_b_in_a"] == 1.0
    assert r["containment_a_in_b"] == 0.4


def test_cms_estimate_never_undercounts(spark):
    from pyspark.sql import functions as F

    from kgraph_spark.operators.sketches import cms_heavy_hitters, cms_sketch

    df = spark.createDataFrame(
        [("hot",)] * 50 + [(f"k{i}",) for i in range(200)], "key string"
    )
    rows = cms_heavy_hitters(df, "key", min_count=1, d=3, w=64).collect()
    assert all(r["estimate"] >= r["exact"] for r in rows)
    hot = [r for r in rows if r["key"] == "hot"][0]
    assert hot["exact"] == 50 and hot["estimate"] >= 50
    # shortlist property: raising the threshold keeps the hot key
    short = cms_heavy_hitters(df, "key", min_count=40, d=3, w=64).collect()
    assert "hot" in {r["key"] for r in short}
    # sketch is bounded: <= d*w cells regardless of input size
    assert cms_sketch(df, "key", d=3, w=64).count() <= 3 * 64
    import pytest

    with pytest.raises(ValueError):
        cms_sketch(df, "key", d=0)


def test_domain_quality_gate(spark):
    from kgraph_spark.operators.text_analysis import domain_quality

    docs = spark.createDataFrame(
        [
            (1, "clean readable English prose with many common words in it", "good.com"),
            (2, "more clean readable text that scores well on the ratios", "good.com"),
            (3, "@@@@ ;;;; !!!! ####", "junk.com"),
        ],
        "doc_id long, text string, source string",
    )
    got = {r["domain"]: r.asDict() for r in domain_quality(docs, 0.5).collect()}
    assert got["good.com"]["keep"] is True and got["good.com"]["n_docs"] == 2
    assert got["junk.com"]["keep"] is False
    assert got["good.com"]["mean_quality"] > got["junk.com"]["mean_quality"]


def test_infer_entity_types_majority_and_tiebreak(spark):
    from kgraph_spark.operators.validation_extra import infer_entity_types

    triples = spark.createDataFrame(
        [
            # typed signature rows: p1 subjects are Gene (2 votes vs 1 Drug)
            ("g1", "p1", "x1"), ("g2", "p1", "x2"), ("d1", "p1", "x3"),
            # untyped u1 appears twice as p1-subject → inferred Gene
            ("u1", "p1", "x4"), ("u1", "p1", "x5"),
        ],
        "subject_id string, predicate string, object_id string",
    )
    types = spark.createDataFrame(
        [("g1", "Gene"), ("g2", "Gene"), ("d1", "Drug")],
        "entity_id string, type string",
    )
    out = {r["entity_id"]: r for r in infer_entity_types(triples, types).collect()}
    assert out["u1"]["inferred_type"] == "Gene" and out["u1"]["n_votes"] == 2
    # x* objects have no typed-object signature for p1 → no votes, absent
    assert all(k == "u1" for k in out)


def test_shacl_report_all_kinds(spark):
    from kgraph_spark.operators.validation_extra import shacl_report

    triples = spark.createDataFrame(
        [
            ("s1", "has_code", "c1"), ("s1", "has_code", "c2"),  # max 1 violated
            ("s2", "has_code", "c1"),
            ("s1", "treats", "zz"),   # range violation (zz untyped)
        ],
        "subject_id string, predicate string, object_id string",
    )
    types = spark.createDataFrame(
        [("s1", "Drug"), ("s2", "Drug"), ("s3", "Drug"), ("c1", "Code"),
         ("c2", "Code")],
        "entity_id string, type string",
    )
    shapes = [
        {"kind": "max_count", "predicate": "has_code", "max": 1},
        {"kind": "min_count", "predicate": "has_code",
         "subject_type": "Drug", "min": 1},
        {"kind": "domain", "predicate": "treats", "subject_type": "Disease"},
        {"kind": "range", "predicate": "treats", "object_type": "Disease"},
        {"kind": "closed_object", "predicate": "treats"},
    ]
    rows = {(r["entity_id"], r["violation"]): r["n"]
            for r in shacl_report(triples, types, shapes).collect()}
    assert rows[("s1", "max_count>1")] == 2
    assert rows[("s3", "min_count<1")] == 0  # typed Drug with no code
    assert rows[("s1", "domain!=Disease")] == 1
    assert rows[("zz", "range!=Disease")] == 1
    assert rows[("zz", "closed_object")] == 1
    assert ("s2", "max_count>1") not in rows


def test_rdfs_entailment_hand_case(spark):
    from kgraph_spark.operators.validation_extra import rdfs_entailment

    triples = spark.createDataFrame(
        [("e1", "treats", "d1"), ("e2", "prescribes", "d1")],
        "subject_id string, predicate string, object_id string",
    )
    types = spark.createDataFrame(
        [("e1", "Drug")], "entity_id string, type string"
    )
    subclass = spark.createDataFrame(
        [("Drug", "Substance"), ("Substance", "Thing")],
        "child string, parent string",
    )
    subprop = spark.createDataFrame(
        [("prescribes", "treats")], "child string, parent string"
    )
    domains = spark.createDataFrame(
        [("treats", "Therapy")], "predicate string, cls string"
    )
    ranges = spark.createDataFrame(
        [("treats", "Disease")], "predicate string, cls string"
    )
    out = {
        (r["entity_id"], r["type"]): r["via"]
        for r in rdfs_entailment(
            triples, types, subclass, subprop, domains, ranges
        ).collect()
    }
    # asserted survives; subclass closure lifts Drug two levels
    assert out[("e1", "Drug")] == "asserted"
    assert out[("e1", "Substance")] == "rdfs9"
    assert out[("e1", "Thing")] == "rdfs9"
    # e1 also typed by domain(treats); d1 by range(treats)
    assert out[("e1", "Therapy")] == "rdfs2"
    assert out[("d1", "Disease")] == "rdfs3"
    # e2 reaches Therapy ONLY through the subproperty lift
    assert out[("e2", "Therapy")] == "rdfs2"
    assert len(out) == 6


def test_fact_fusion_reliable_source_overturns_tie(spark):
    from kgraph_spark.operators.validation_extra import fact_fusion

    # key k1: three-way tie that round-1 min-string resolves to 'x1';
    # src_a (wrong only there, per round-1 credit) outweighs b and c
    # (each wrong twice incl. the tie credit) so round 2 flips to 'z9'
    rows = [
        ("k1", "p", "z9", "src_a"), ("k1", "p", "x1", "src_b"),
        ("k1", "p", "y5", "src_c"),
        ("k2", "p", "v", "src_a"), ("k2", "p", "w", "src_b"),
        ("k2", "p", "v", "src_c"),
        ("k3", "p", "u", "src_a"), ("k3", "p", "u", "src_b"),
        ("k3", "p", "t", "src_c"),
        ("k4", "p", "q", "src_a"), ("k4", "p", "q", "src_b"),
        ("k4", "p", "q", "src_c"),
        ("k5", "p", "m", "src_a"), ("k5", "p", "n", "src_b"),
        ("k5", "p", "m", "src_c"),
    ]
    df = spark.createDataFrame(
        rows, "subject_id string, predicate string, object_id string, source string"
    )
    out = {r["subject_id"]: r for r in fact_fusion(df).collect()}
    # accuracies vs round-1 majorities: a=4/5, b=3/5, c=3/5
    assert out["k1"]["object_id"] == "z9" and out["k1"]["flipped"]
    assert out["k1"]["weight_micro"] == 800_000
    assert out["k2"]["object_id"] == "v" and not out["k2"]["flipped"]
    assert out["k4"]["object_id"] == "q" and out["k4"]["n_sources"] == 3


def test_literal_type_profile_classes_and_dominant(spark):
    from kgraph_spark.operators.validation_extra import literal_type_profile

    rows = [
        ("s", "amount", "123"), ("s", "amount", "99"), ("s", "amount", "oops"),
        ("s", "born", "2024-01-31"), ("s", "ref", "C42"),
    ]
    t = spark.createDataFrame(
        rows, "subject_id string, predicate string, object_id string"
    )
    out = {r["predicate"]: r for r in literal_type_profile(t).collect()}
    assert out["amount"]["dominant"] == "numeric"
    assert out["amount"]["n_numeric"] == 2 and out["amount"]["n_other"] == 1
    assert out["amount"]["dominant_micro"] == 666667
    assert out["born"]["dominant"] == "date"
    assert out["ref"]["dominant"] == "id" and out["ref"]["dominant_micro"] == 1_000_000
