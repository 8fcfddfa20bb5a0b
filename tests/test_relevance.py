"""BM25 relevance search, TF-IDF keywords, DSIR importance weights, and
the linear quality classifier."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kgraph_spark.operators.relevance import bm25_topk, dsir_weights, tfidf_keywords
from kgraph_spark.operators.text_analysis import quality_classifier


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_bm25_hand_computed(spark):
    docs = _docs(
        spark,
        [
            ("d1", "spark spark join"),
            ("d2", "join filter"),
            ("d3", "window scan sort"),
        ],
    )
    out = {r["doc_id"]: r for r in bm25_topk(docs, ["spark"], topk=10).collect()}
    assert list(out) == ["d1"]  # only d1 contains the term
    # N=3, df=1 → idf = ln(1 + 2.5/1.5); tf=2, dl=3, avgdl=(3+2+3)/3
    idf = round(math.log(1 + 2.5 / 1.5), 6)
    avgdl = round(8 / 3, 6)
    expect = round(round(idf * (2 * 2.2) / (2 + 1.2 * (0.25 + 0.75 * 3 / avgdl)), 6), 4)
    assert out["d1"]["score"] == pytest.approx(expect, abs=1e-9)
    assert out["d1"]["n_matched"] == 1


def test_bm25_rare_term_outranks_common(spark):
    docs = _docs(
        spark,
        [("d1", "alpha beta"), ("d2", "alpha gamma"), ("d3", "alpha delta"), ("d4", "beta zeta")],
    )
    out = bm25_topk(docs, ["alpha", "zeta"], topk=4).collect()
    # zeta appears once in the corpus → d4 scores above the alpha-only docs
    assert out[0]["doc_id"] == "d4"


def test_bm25_topk_ties_break_on_id(spark):
    docs = _docs(spark, [("b", "x y"), ("a", "x y"), ("c", "z")])
    out = bm25_topk(docs, ["x"], topk=1).collect()
    assert out[0]["doc_id"] == "a"


def test_dsir_prefers_target_like_docs(spark):
    target = _docs(spark, [("t1", "gene protein binds receptor"), ("t2", "protein binds gene")])
    raw = _docs(
        spark,
        [
            ("r1", "gene protein binds receptor pathway"),  # target-like
            ("r2", "stock market index falls sharply today"),  # not
        ],
    )
    rows = {r["doc_id"]: r for r in dsir_weights(raw, target, n_buckets=512).collect()}
    assert rows["r1"]["log_weight"] > rows["r2"]["log_weight"]
    assert rows["r1"]["n_bigrams"] == 4 and rows["r2"]["n_bigrams"] == 5


def test_dsir_short_docs_get_zero(spark):
    target = _docs(spark, [("t", "a b")])
    raw = _docs(spark, [("one", "single"), ("empty", "  "), ("ok", "a b")])
    rows = {r["doc_id"]: r for r in dsir_weights(raw, target, n_buckets=64).collect()}
    assert rows["one"]["log_weight"] == 0.0 and rows["one"]["n_bigrams"] == 0
    assert rows["empty"]["log_weight"] == 0.0
    assert rows["ok"]["n_bigrams"] == 1


def test_dsir_every_raw_doc_scored(spark):
    target = _docs(spark, [("t", "x y z")])
    raw = _docs(spark, [(f"d{i}", f"w{i} w{i+1} w{i+2}") for i in range(20)])
    out = dsir_weights(raw, target, n_buckets=128)
    assert out.count() == 20


def test_tfidf_rare_term_is_top_keyword(spark):
    docs = _docs(
        spark,
        [
            ("d1", "common common zebra"),
            ("d2", "common words here"),
            ("d3", "common words there"),
        ],
    )
    out = tfidf_keywords(docs, topn=2).collect()
    d1 = sorted((r for r in out if r["doc_id"] == "d1"), key=lambda r: r["rank"])
    # zebra: df=1 → idf ln(4/2)+1; common in d1: tf=2 but df=3 → idf ln(4/4)+1=1
    assert d1[0]["token"] == "common" and d1[0]["tfidf"] == pytest.approx(2.0)
    assert d1[1]["token"] == "zebra"
    assert d1[1]["tfidf"] == pytest.approx(round(math.log(4 / 2) + 1, 6), abs=1e-9)


def test_tfidf_rank_is_dense_per_doc_and_capped(spark):
    docs = _docs(spark, [("a", "q w e r t y u i"), ("b", "q w")])
    out = tfidf_keywords(docs, topn=3)
    per_doc = {r["doc_id"]: r["cnt"] for r in out.groupBy("doc_id").agg(F.count("*").alias("cnt")).collect()}
    assert per_doc == {"a": 3, "b": 2}
    ranks = [r["rank"] for r in out.filter("doc_id = 'a'").orderBy("rank").collect()]
    assert ranks == [1, 2, 3]


def test_quality_classifier_orders_clean_above_junk(spark):
    clean = "the quick brown fox jumps over the lazy dog and it was good to see"
    junk = "!!! ??? ;;; ... ,,, !!! ??? ;;;"
    docs = _docs(spark, [("clean", clean), ("junk", junk)])
    rows = {r["doc_id"]: r for r in quality_classifier(docs).collect()}
    assert rows["clean"]["prob"] > rows["junk"]["prob"]
    assert rows["clean"]["keep"] and not rows["junk"]["keep"]
    assert 0.0 <= rows["junk"]["prob"] <= rows["clean"]["prob"] <= 1.0


def test_quality_classifier_custom_weights(spark):
    docs = _docs(spark, [("d", "hello world this is fine")])
    flipped = quality_classifier(docs, weights={"bias": -100.0}).collect()[0]
    assert flipped["prob"] < 0.001 and not flipped["keep"]


def test_hot_ngrams_counts_and_cut(spark):
    from kgraph_spark.operators.text_analysis import hot_ngrams

    docs = spark.createDataFrame(
        [
            (1, "a b c a b c"),      # "a b c" twice... (k=3 grams: abc bca cab abc)
            (2, "a b c d"),           # abc bcd
            (3, "z z"),               # short doc (<3 toks) → whole run "z z"
        ],
        "doc_id bigint, text string",
    )
    rows = hot_ngrams(docs, k=3, top=3).collect()
    as_map = {r["shingle"]: (r["n_occurrences"], r["n_docs"]) for r in rows}
    assert as_map["a b c"] == (3, 2)  # 2 occurrences in doc1 + 1 in doc2
    # deterministic cut: top-1 is the max-count gram
    assert rows[0]["shingle"] == "a b c"
    assert len(rows) == 3


def test_hot_ngrams_tie_breaks_on_gram_text(spark):
    from kgraph_spark.operators.text_analysis import hot_ngrams

    docs = spark.createDataFrame(
        [(1, "b b"), (2, "a a")], "doc_id bigint, text string"
    )
    rows = hot_ngrams(docs, k=2, top=1).collect()
    assert rows[0]["shingle"] == "a a"  # count tie → lexicographic gram


def test_gopher_rules_signals_and_keep(spark):
    from kgraph_spark.operators.text_analysis import gopher_rules

    # 60 words, all alphabetic, stopwords present → passes every rule
    good = "the cat and the dog have gone to the house of friends with joy " * 4
    # symbol-heavy: hash marks push symbol ratio over 0.1
    hashy = "the code ### uses #tags and ### more #hash with that noise " * 6
    # stopword-free → n_stop_hits 0 → dropped
    nostop = "quick brown foxes jump over lazy dogs near rivers daily " * 6
    docs = spark.createDataFrame(
        [(1, good.strip()), (2, hashy.strip()), (3, nostop.strip()), (4, "tiny doc.")],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in gopher_rules(docs).collect()}
    assert out[1]["keep"] and out[1]["n_stop_hits"] >= 4
    assert not out[2]["keep"] and out[2]["symbol_ratio"] >= 0.1
    assert not out[3]["keep"] and out[3]["n_stop_hits"] == 0
    assert not out[4]["keep"] and out[4]["n_words"] == 2  # < 50 words


def test_gopher_rules_alpha_fraction_and_mean_length(spark):
    from kgraph_spark.operators.text_analysis import gopher_rules

    # half the words are pure digits → alpha fraction 0.5 → dropped
    digits = ("word 123 " * 30).strip()
    out = gopher_rules(
        spark.createDataFrame([(1, digits)], "doc_id bigint, text string")
    ).collect()[0]
    assert out["alpha_word_frac"] == 0.5 and not out["keep"]
    assert out["mean_word_len"] == 3.5  # (4+3)/2


def test_gopher_rules_map_only(spark):
    from conftest import plan_text
    from kgraph_spark.operators.text_analysis import gopher_rules

    docs = spark.createDataFrame([(1, "a b")], "doc_id bigint, text string")
    assert "Exchange" not in plan_text(gopher_rules(docs))


def test_normalize_scores_semantics(spark):
    from kgraph_spark.operators.relevance import normalize_scores

    df = spark.createDataFrame(
        [(1, "a", 0.0), (2, "a", 5.0), (3, "a", 10.0), (4, "b", 7.0), (5, "b", 7.0)],
        "event_id long, g string, value double",
    )
    got = {r["event_id"]: r.asDict() for r in normalize_scores(df, "value", "g", "event_id").collect()}
    assert got[1]["minmax_norm"] == 0.0
    assert got[2]["minmax_norm"] == 0.5
    assert got[3]["minmax_norm"] == 1.0
    # median 5, IQR = 7.5 - 2.5 = 5 -> robust(0.0) = -1.0
    assert got[1]["robust_norm"] == -1.0
    # constant group: minmax defined as 0.5, robust undefined
    assert got[4]["minmax_norm"] == 0.5 and got[4]["robust_norm"] is None


def test_oov_rate_cross_document_signal(spark):
    from kgraph_spark.operators.text_analysis import oov_rate

    docs = spark.createDataFrame(
        [
            (1, "common common xqzt"),   # xqzt appears only here
            (2, "common words words"),
            (3, "common words here"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in oov_rate(docs, min_df=2).collect()}
    # doc1: 'xqzt' df=1 -> 1/3 OOV; 'common' df=3 fine
    assert got[1]["n_oov"] == 1 and got[1]["oov_rate"] == round(1 / 3, 6)
    # doc3: 'here' df=1 -> 1/3
    assert got[3]["n_oov"] == 1
    assert got[2]["n_oov"] == 0 and got[2]["oov_rate"] == 0.0


# ---- token entropy / zipf slope -----------------------------------------


def test_token_entropy_hand_values(spark):
    from kgraph_spark.operators.text_analysis import token_entropy

    docs = spark.createDataFrame(
        [
            (1, "a a a a"),            # one type -> 0 bits
            (2, "a b a b"),            # uniform over 2 -> 1 bit
            (3, "a b c d"),            # uniform over 4 -> 2 bits
            (4, "a a a b"),            # 3/4,1/4 -> 0.811278
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in token_entropy(docs).collect()}
    assert rows[1]["entropy_bits"] == 0.0 and rows[1]["n_types"] == 1
    assert rows[2]["entropy_bits"] == 1.0
    assert rows[3]["entropy_bits"] == 2.0
    assert abs(rows[4]["entropy_bits"] - 0.811278) < 2e-6
    assert rows[4]["n_tokens"] == 4 and rows[4]["n_types"] == 2


def test_zipf_slope_exact_power_law(spark):
    from kgraph_spark.operators.text_analysis import zipf_slope

    # freq(rank) = 1200 / rank for ranks 1..6 (all integer) -> slope -1
    text = " ".join(" ".join([f"t{r}"] * (1200 // r)) for r in range(1, 7))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = zipf_slope(docs, top_n=6).collect()[0]
    assert row["n_terms"] == 6
    assert abs(row["slope"] + 1.0) < 1e-4
    assert abs(row["intercept"] - 3.079181) < 1e-4  # log10(1200)


def test_zipf_slope_degenerate_single_term(spark):
    from kgraph_spark.operators.text_analysis import zipf_slope

    docs = spark.createDataFrame([(1, "x x x")], "doc_id long, text string")
    row = zipf_slope(docs).collect()[0]
    assert row["n_terms"] == 1 and row["slope"] is None and row["intercept"] is None


def test_reading_ease_hand_counts(spark):
    from kgraph_spark.operators.text_analysis import reading_ease

    docs = spark.createDataFrame(
        [
            (1, "The cat sat. The dog ran!"),       # 6 words, 2 sentences
            (2, "a"),                                # degenerate: 1 word, min 1 sentence
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in reading_ease(docs).collect()}
    r1 = rows[1]
    assert r1["n_words"] == 6 and r1["n_sentences"] == 2
    # vowel groups: the(1) cat(1) sat(1) the(1) dog(1) ran(1) = 6
    assert r1["n_syllables"] == 6
    expect = 206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6)
    assert abs(r1["flesch"] - round(expect, 6)) < 1e-9
    r2 = rows[2]
    assert r2["n_sentences"] == 1 and r2["n_syllables"] == 1


def test_reading_ease_harder_text_scores_lower(spark):
    from kgraph_spark.operators.text_analysis import reading_ease

    docs = spark.createDataFrame(
        [
            (1, "I like tea. We sip it."),
            (2, "Multisyllabic terminology overcomplicates comprehension extraordinarily."),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["flesch"] for r in reading_ease(docs).collect()}
    assert rows[2] < rows[1]
