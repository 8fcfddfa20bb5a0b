"""interleave_stats / media_coref unit coverage: hand-computed sequences,
no-media and all-media edges, shared-asset aggregation."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from kgraph_spark.operators.interleave import interleave_stats, media_coref

SPAN = T.ArrayType(
    T.StructType(
        [
            T.StructField("kind", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("media_ref", T.StringType()),
            T.StructField("offset", T.IntegerType()),
        ]
    )
)


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, T.StructType([T.StructField("doc_id", T.StringType()), T.StructField("spans", SPAN)])
    )


def _t(i):
    return ("text", f"p{i}", None, i)


def _m(i, ref):
    return ("media", None, ref, i)


def test_interleave_stats_hand_computed(spark):
    # t m m t m t  -> 6 spans, 3 media, run max 2, transitions t|mm|t|m|t = 4
    rows = [("d1", [_t(0), _m(1, "a"), _m(2, "b"), _t(3), _m(4, "a"), _t(5)])]
    out = interleave_stats(_mk(spark, rows)).collect()[0].asDict()
    assert out == {
        "doc_id": "d1",
        "n_spans": 6,
        "n_text": 3,
        "n_media": 3,
        "media_fraction": 0.5,
        "n_transitions": 4,
        "max_media_run": 2,
        "first_media_pos": 2,  # 1-based
    }


def test_interleave_stats_edges(spark):
    rows = [
        ("no_media", [_t(0), _t(1)]),
        ("all_media", [_m(0, "x"), _m(1, "y"), _m(2, "z")]),
        ("single", [_t(0)]),
    ]
    got = {r["doc_id"]: r.asDict() for r in interleave_stats(_mk(spark, rows)).collect()}
    assert got["no_media"]["n_media"] == 0
    assert got["no_media"]["max_media_run"] == 0
    assert got["no_media"]["n_transitions"] == 0
    assert got["no_media"]["first_media_pos"] is None
    assert got["all_media"]["max_media_run"] == 3
    assert got["all_media"]["media_fraction"] == 1.0
    assert got["all_media"]["first_media_pos"] == 1
    assert got["single"]["n_spans"] == 1


def test_media_coref_shared_assets(spark):
    rows = [
        ("d1", [_t(0), _m(1, "logo"), _m(2, "fig1")]),
        ("d2", [_m(0, "logo"), _t(1), _m(2, "logo")]),
    ]
    got = {r["media_ref"]: r.asDict() for r in media_coref(_mk(spark, rows)).collect()}
    assert got["logo"] == {
        "media_ref": "logo", "n_uses": 3, "n_docs": 2, "first_doc": "d1", "last_doc": "d2",
    }
    assert got["fig1"]["n_uses"] == 1 and got["fig1"]["n_docs"] == 1


def test_interleave_stats_is_shuffle_free(spark):
    rows = [("d1", [_t(0), _m(1, "a")])]
    plan = interleave_stats(_mk(spark, rows))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_entity_media_grounding_window(spark):
    from kgraph_spark.operators.interleave import entity_media_grounding

    # 4 paragraphs (48 tokens); media after para 2 only. Put the vocab
    # word in paras 1 and 3 (adjacent to media para 2) and para 0 (not).
    words = []
    for p in range(4):
        ws = ["filler"] * 12
        if p in (0, 1, 3):
            ws[0] = "spark"
        words.extend(ws)
    docs = spark.createDataFrame([(0, " ".join(words))], "doc_id long, text string")
    rows = entity_media_grounding(docs, ["spark"], window=1).collect()
    assert len(rows) == 1
    r = rows[0].asDict()
    # doc 0, para 2: asset (0*31+2)%41 = 2
    assert r["media_ref"] == "media://asset/2"
    # paras 1 and 3 associate; para 0 is outside the +-1 window
    assert r["n_cooccur"] == 2 and r["n_docs"] == 1


# ---- span-sequence hash / dedup / token cost ------------------------------


def _spans_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id long, spans array<struct<kind string, text string,"
        " media_ref string, offset int>>",
    )


def test_span_hash_equality_contract(spark):
    from kgraph_spark.operators.interleave import span_sequence_hash

    a = [("text", "hello", None, 0), ("media", None, "m://1", 1)]
    b = [("text", "hello", None, 0), ("media", None, "m://1", 1)]
    c = [("media", None, "m://1", 0), ("text", "hello", None, 1)]   # order differs
    d = [("text", "hello", None, 0), ("media", None, "m://2", 1)]   # ref differs
    df = _spans_df(spark, [(1, a), (2, b), (3, c), (4, d)])
    h = {r["doc_id"]: r["seq_hash"] for r in span_sequence_hash(df).collect()}
    assert h[1] == h[2]
    assert h[1] != h[3] and h[1] != h[4] and h[3] != h[4]


def test_interleaved_dedup_groups(spark):
    from kgraph_spark.operators.interleave import interleaved_exact_dedup

    a = [("text", "x", None, 0)]
    df = _spans_df(spark, [(5, a), (2, a), (9, list(a) + [("media", None, "m", 1)])])
    rows = {r["keep_doc_id"]: r["n_dups"] for r in interleaved_exact_dedup(df).collect()}
    assert rows == {2: 2, 9: 1}  # min id kept, media-extended doc distinct


def test_multimodal_token_cost(spark):
    import pytest
    from kgraph_spark.operators.interleave import multimodal_token_cost

    df = _spans_df(
        spark,
        [
            (1, [("text", "abcdefgh", None, 0), ("media", None, "m", 1)]),  # 1+2 text, 256 media
            (2, [("text", "", None, 0)]),                                    # empty text: 1 token
            (3, []),                                                         # no spans
        ],
    )
    rows = {r["doc_id"]: r for r in multimodal_token_cost(df).collect()}
    assert rows[1]["n_text_tokens"] == 3 and rows[1]["n_media_spans"] == 1
    assert rows[1]["doc_tokens"] == 3 + 256
    assert rows[2]["doc_tokens"] == 1
    assert rows[3]["doc_tokens"] == 0 and rows[3]["n_media_spans"] == 0
    with pytest.raises(ValueError):
        multimodal_token_cost(df, chars_per_token=0)
