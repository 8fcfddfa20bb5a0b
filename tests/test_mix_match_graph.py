"""Unit tests for katz_centrality, media_captions, weighted_token_overlap
and power_mix_weights — hand-computed expectations on toy frames."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgraph_spark.operators.corpus_curation import power_mix_weights
from kgraph_spark.operators.graph_analytics import katz_centrality
from kgraph_spark.operators.interleave import media_captions
from kgraph_spark.operators.similarity import weighted_token_overlap


def test_katz_centrality_hand_computed(spark):
    # a→b→c: walks ending at b: len1 = 1; at c: len1 = 1 (b→c), len2 = 1
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "subject_id string, object_id string"
    )
    got = {r["node"]: r["katz_micro"] for r in katz_centrality(e, iterations=3).collect()}
    assert got == {"a": 0, "b": 500_000, "c": 500_000 + 250_000}


def test_katz_centrality_cycle_accumulates(spark):
    # a⇄b: at a: len1 = 1 (b→a), len2 = 1 (a→b→a), len3 = 1
    e = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "subject_id string, object_id string"
    )
    got = {r["node"]: r["katz_micro"] for r in katz_centrality(e, iterations=3).collect()}
    assert got["a"] == 500_000 + 250_000 + 125_000


def _span(kind, text, ref):
    return {"kind": kind, "text": text, "media_ref": ref, "offset": 0}


def test_media_captions_nearest_preceding_text(spark):
    spans = [
        _span("text", "intro", None),
        _span("media", None, "m1"),
        _span("text", "second", None),
        _span("media", None, "m2"),
        _span("media", None, "m3"),
    ]
    df = spark.createDataFrame(
        [(1, spans)],
        "doc_id long, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    got = {r["media_ref"]: r for r in media_captions(df).collect()}
    assert got["m1"]["caption"] == "intro" and got["m1"]["caption_distance"] == 1
    assert got["m2"]["caption"] == "second" and got["m2"]["caption_distance"] == 1
    assert got["m3"]["caption"] == "second" and got["m3"]["caption_distance"] == 2


def test_media_captions_media_before_any_text_is_null(spark):
    df = spark.createDataFrame(
        [(1, [_span("media", None, "m0"), _span("text", "late", None)])],
        "doc_id long, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    r = media_captions(df).collect()[0]
    assert r["caption"] is None and r["caption_pos"] is None


def test_weighted_token_overlap_exact_integer_weights(spark):
    # N=3; 'acme' df=3 → w=1; 'widget' df=2 → w=1; 'blue' df=1 → w=3
    names = spark.createDataFrame(
        [
            (1, "B", "acme blue widget"),
            (2, "B", "acme widget"),
            (3, "B", "acme"),
        ],
        "id long, block string, name string",
    )
    got = {(r["id_a"], r["id_b"]): r for r in weighted_token_overlap(names).collect()}
    # pair (1,2): shared acme+widget = 2; totals: t1 = 1+3+1 = 5, t2 = 2
    r = got[(1, 2)]
    assert r["shared_w"] == 2 and r["union_w"] == 5
    assert r["overlap_micro"] == 1_000_000 * 2 // 5
    # pair (1,3): shared acme = 1; union = 5 + 1 - 1
    assert got[(1, 3)]["overlap_micro"] == 1_000_000 * 1 // 5


def test_weighted_token_overlap_respects_blocks(spark):
    names = spark.createDataFrame(
        [(1, "A", "same name"), (2, "B", "same name")],
        "id long, block string, name string",
    )
    assert weighted_token_overlap(names).count() == 0


def test_power_mix_weights_hand_computed(spark):
    docs = spark.createDataFrame(
        [("en",)] * 3 + [("de",)] * 1, "lang string"
    )
    got = {r["domain"]: r for r in power_mix_weights(docs, "lang", alpha=2).collect()}
    # n = [3, 1], tot = 4, Σn² = 10
    en, de = got["en"], got["de"]
    assert en["share_micro"] == 750_000 and de["share_micro"] == 250_000
    assert en["weight_micro"] == 900_000 and de["weight_micro"] == 100_000
    # upsample = 1e6·tot·n // Σn²
    assert en["upsample_micro"] == 1_000_000 * 4 * 3 // 10
    assert de["upsample_micro"] == 1_000_000 * 4 * 1 // 10


def test_power_mix_alpha_one_is_natural_share(spark):
    docs = spark.createDataFrame([("en",)] * 3 + [("de",)] * 2, "lang string")
    for r in power_mix_weights(docs, "lang", alpha=1).collect():
        assert r["weight_micro"] == r["share_micro"]
        assert abs(r["upsample_micro"] - 1_000_000) <= 1


def test_transe_plausibility_deterministic_and_ordered(spark):
    from kgraph_spark.operators.relationships import transe_plausibility

    t = spark.createDataFrame(
        [("a", "r", "b"), ("c", "r", "d"), ("a", "r", "a")],
        "subject_id string, predicate string, object_id string",
    )
    rows = transe_plausibility(t, dim=8, top_k=3).collect()
    assert len(rows) == 3
    scores = [r["implausibility"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # deterministic across runs
    again = transe_plausibility(t, dim=8, top_k=3).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]
    # identical s/p/o hashes per row: score for (a, r, a) uses h + r - t
    # with h = t, so it equals the pure relation norm — nonnegative
    assert all(s >= 0 for s in scores)
