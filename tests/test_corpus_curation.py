"""Corpus curation: keep-best election, deterministic stratified
sampling, benchmark decontamination, sequence packing, line-level dedup,
PII scrubbing, domain mixing, deterministic shuffle
(operators/corpus_curation.py).

The DuckDB-parity checks for the driver queries live in
test_entry_oracles.py (auto-discovered); these tests pin the unit
semantics on tiny synthetic frames."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgraph_spark.operators.corpus_curation import (
    _hex_threshold,
    decontaminate,
    near_dup_keep_best,
    stratified_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string, n_chars bigint")


# ---------------------------------------------------------------- keep-best
def test_keep_best_elects_quality_then_id(spark):
    docs = _docs(
        spark,
        [
            (1, "a", "en", 100),
            (2, "b", "en", 300),  # cluster {1,2,3}: keeper = 2 (max n_chars)
            (3, "c", "en", 200),
            (4, "d", "en", 50),
            (5, "e", "en", 50),  # cluster {4,5}: tie on n_chars → keeper = 4 (min id)
            (9, "z", "en", 10),  # singleton: its own keeper
        ],
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (4, 5)], "doc_a bigint, doc_b bigint")
    out = {r["doc_id"]: r for r in near_dup_keep_best(docs, pairs).collect()}
    assert len(out) == 6
    assert [out[i]["keeper_doc_id"] for i in (1, 2, 3)] == [2, 2, 2]
    assert [out[i]["cluster_id"] for i in (1, 2, 3)] == [1, 1, 1]
    assert [out[i]["keeper_doc_id"] for i in (4, 5)] == [4, 4]
    assert out[9]["cluster_id"] == 9 and out[9]["keeper_doc_id"] == 9 and out[9]["keep"]
    assert {i for i, r in out.items() if r["keep"]} == {2, 4, 9}


def test_keep_best_no_pairs_all_singletons(spark):
    docs = _docs(spark, [(1, "a", "en", 10), (2, "b", "en", 20)])
    pairs = spark.createDataFrame([], "doc_a bigint, doc_b bigint")
    out = near_dup_keep_best(docs, pairs).collect()
    assert all(r["keep"] and r["cluster_id"] == r["doc_id"] for r in out)


# ------------------------------------------------------------------ sampling
def test_hex_threshold_edges():
    assert _hex_threshold(0.0) == "000000"
    assert _hex_threshold(0.5) == "800000"
    assert _hex_threshold(1.0) > "ffffff"  # sentinel keeps every row


def test_sample_deterministic_and_stratified(spark):
    docs = _docs(spark, [(i, "t", "en" if i % 2 else "de", i) for i in range(400)])
    a = sorted(r["doc_id"] for r in stratified_sample(docs, {"en": 0.5, "de": 0.0}).collect())
    b = sorted(r["doc_id"] for r in stratified_sample(docs, {"en": 0.5, "de": 0.0}).collect())
    assert a == b  # reproducible, not rand()
    assert all(i % 2 == 1 for i in a)  # de rate 0 → only en rows
    assert 0.3 < len(a) / 200 < 0.7  # en rate ~0.5


def test_sample_kept_rows_stable_under_corpus_growth(spark):
    """Bernoulli-by-hash: sampling a SUBSET yields exactly the kept rows
    that fall in that subset — new arrivals never flip old decisions."""
    full = _docs(spark, [(i, "t", "en", i) for i in range(300)])
    sub = full.filter(F.col("doc_id") < 150)
    kept_full = {r["doc_id"] for r in stratified_sample(full, {"en": 0.3}).collect()}
    kept_sub = {r["doc_id"] for r in stratified_sample(sub, {"en": 0.3}).collect()}
    assert kept_sub == {i for i in kept_full if i < 150}


def test_sample_rate_one_and_salt(spark):
    docs = _docs(spark, [(i, "t", "en", i) for i in range(50)])
    assert stratified_sample(docs, {"en": 1.0}).count() == 50
    a = {r["doc_id"] for r in stratified_sample(docs, {"en": 0.5}, salt="a").collect()}
    b = {r["doc_id"] for r in stratified_sample(docs, {"en": 0.5}, salt="b").collect()}
    assert a != b  # salt re-draws the sample


# ------------------------------------------------------------------- packing
def test_pack_matches_single_window_reference(spark):
    """Two-phase distributed prefix sum == the one-reducer window cumsum
    it replaces (exactness of the distributed scan), on a skewed corpus."""
    from pyspark.sql import Window

    from kgraph_spark.operators.corpus_curation import pack_sequences

    rows = [(i, "t", "en" if i % 10 else "de", (i * 37) % 400 + 1) for i in range(500)]
    docs = _docs(spark, rows)
    got = {
        (r["doc_id"], r["seq_id"], r["offset_in_seq"])
        for r in pack_sequences(docs, budget=1000, num_chunks=7).collect()
    }
    w = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    ref = docs.select(
        "doc_id", (F.sum("n_chars").over(w) - F.col("n_chars")).alias("start")
    )
    want = {
        (r["doc_id"], r["start"] // 1000, r["start"] % 1000) for r in ref.collect()
    }
    assert got == want


def test_pack_boundary_and_zero_weight(spark):
    """A doc starting exactly on a budget boundary opens the next seq;
    zero-weight docs take the seq of their start position."""
    from kgraph_spark.operators.corpus_curation import pack_sequences

    docs = _docs(
        spark,
        [(1, "t", "en", 100), (2, "t", "en", 0), (3, "t", "en", 100), (4, "t", "en", 100)],
    )
    out = {r["doc_id"]: (r["seq_id"], r["offset_in_seq"]) for r in pack_sequences(docs, budget=100).collect()}
    assert out == {1: (0, 0), 2: (1, 0), 3: (1, 0), 4: (2, 0)}


# ----------------------------------------------------------- decontamination
def test_decontaminate_flags_and_removes(spark):
    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon zeta", "en", 1)])
    docs = _docs(
        spark,
        [
            # shares the 5-gram "alpha beta gamma delta epsilon" (and one more)
            (1, "x alpha beta gamma delta epsilon zeta y", "en", 1),
            (2, "completely different words with no overlap here", "en", 1),
            (3, "alpha beta gamma but too short", "en", 1),  # only 3-token prefix shared
        ],
    )
    hits = {r["doc_id"]: r["n_contaminated_shingles"] for r in decontaminate(docs, bench, k=5).collect()}
    assert set(hits) == {1}
    assert hits[1] == 2  # "alpha..epsilon" and "beta..zeta"
    clean = sorted(r["doc_id"] for r in decontaminate(docs, bench, k=5, remove=True).collect())
    assert clean == [2, 3]


def test_dedup_lines_keeps_first_occurrence_and_blanks(spark):
    from kgraph_spark.operators.corpus_curation import dedup_lines

    docs = _docs(
        spark,
        [
            (1, "unique one\nSHARED FOOTER\n\ntail one", "en", 1),
            (2, "unique two\nSHARED FOOTER\n\ntail two", "en", 1),
            (3, "SHARED FOOTER", "en", 1),  # every line a dup → empty text
        ],
    )
    out = {r["doc_id"]: r for r in dedup_lines(docs).collect()}
    assert len(out) == 3
    # footer survives only at its first (doc, pos) occurrence — doc 1
    assert out[1]["text"] == "unique one\nSHARED FOOTER\n\ntail one"
    # blank line (below min_line_chars) is always kept
    assert out[2]["text"] == "unique two\n\ntail two"
    assert out[3]["text"] == ""
    assert (out[1]["n_lines"], out[1]["n_lines_kept"]) == (4, 4)
    assert (out[2]["n_lines"], out[2]["n_lines_kept"]) == (4, 3)
    assert (out[3]["n_lines"], out[3]["n_lines_kept"]) == (1, 0)


def test_dedup_lines_intra_document_dups_collapse(spark):
    from kgraph_spark.operators.corpus_curation import dedup_lines

    docs = _docs(spark, [(1, "same\nsame\nsame", "en", 1)])
    out = dedup_lines(docs).collect()[0]
    assert out["text"] == "same" and out["n_lines_kept"] == 1


def test_scrub_pii_counts_and_redacts(spark):
    from kgraph_spark.operators.corpus_curation import scrub_pii

    docs = _docs(
        spark,
        [
            (1, "mail a.b+c@ex-ample.org and 10.0.0.255 then +44 20-7946-0958 end", "en", 1),
            (2, "no pii here", "en", 1),
        ],
    )
    out = {r["doc_id"]: r for r in scrub_pii(docs).collect()}
    assert out[1]["text"] == "mail <EMAIL> and <IP> then <PHONE> end"
    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_phone"]) == (1, 1, 1)
    assert out[2]["text"] == "no pii here"
    assert (out[2]["n_email"], out[2]["n_ipv4"], out[2]["n_phone"]) == (0, 0, 0)


def test_domain_mix_over_budget_subsamples_under_budget_keeps_all(spark):
    from kgraph_spark.operators.corpus_curation import domain_mix_sample

    rows = [(i, "t", "big" if i < 400 else "small", 100) for i in range(420)]
    docs = _docs(spark, rows)
    # big: 400*100 = 40k chars vs budget 10k → rate .25; small: 2k < 10k → all
    kept = domain_mix_sample(docs, budget=10_000).collect()
    small = [r for r in kept if r["lang"] == "small"]
    big = [r for r in kept if r["lang"] == "big"]
    assert len(small) == 20
    assert 0.15 < len(big) / 400 < 0.35
    again = domain_mix_sample(docs, budget=10_000).collect()
    assert sorted(r["doc_id"] for r in again) == sorted(r["doc_id"] for r in kept)


def test_deterministic_shuffle_is_exact_permutation(spark):
    from kgraph_spark.operators.corpus_curation import deterministic_shuffle

    docs = _docs(spark, [(i, "t", "en", 1) for i in range(300)])
    out = deterministic_shuffle(docs, salt="s1", num_chunks=5).collect()
    ranks = sorted(r["shuffle_rank"] for r in out)
    assert ranks == list(range(300))  # exact global permutation, 0-based
    # rank order == (md5, id) order, independent of chunking
    import hashlib

    want = sorted(range(300), key=lambda i: (hashlib.md5(f"{i}s1".encode()).hexdigest(), i))
    got = {r["doc_id"]: r["shuffle_rank"] for r in out}
    assert [got[i] for i in want] == list(range(300))
    other = deterministic_shuffle(docs, salt="s1", num_chunks=11).collect()
    assert {r["doc_id"]: r["shuffle_rank"] for r in other} == got
    resalted = deterministic_shuffle(docs, salt="s2", num_chunks=5).collect()
    assert {r["doc_id"]: r["shuffle_rank"] for r in resalted} != got


def test_decontaminate_benchmark_broadcast_plan(spark):
    from conftest import plan_text

    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon zeta", "en", 1)])
    docs = _docs(spark, [(1, "x alpha beta gamma delta epsilon", "en", 1)])
    plan = plan_text(decontaminate(docs, bench, k=5))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_lm_model_and_score_semantics(spark):
    from kgraph_spark.operators.text_analysis import (
        lm_quality_score,
        unigram_logprob_model,
    )

    docs = _docs(
        spark,
        [
            (1, "the cat sat on the mat", "en", 1),
            (2, "the dog sat on the log", "en", 1),
            (3, "zq xv qj zz yy ww", "en", 1),  # all rare/OOV-ish tokens
        ],
    )
    model, oov = unigram_logprob_model(docs, vocab_size=4)
    rows = {r["token"]: r["logp"] for r in model.collect()}
    assert len(rows) == 4
    assert "the" in rows  # most frequent token always in vocab
    assert all(lp < 0 for lp in rows.values()) and oov < min(rows.values())
    scored = {r["doc_id"]: r for r in lm_quality_score(docs, model, oov).collect()}
    assert scored[1]["n_tokens"] == 6
    # the OOV-heavy doc scores strictly worse (higher neg-logp)
    assert scored[3]["avg_neg_logp"] > scored[1]["avg_neg_logp"]
    # vocab cut is deterministic: rebuild gives identical logps
    model2, oov2 = unigram_logprob_model(docs, vocab_size=4)
    assert {r["token"]: r["logp"] for r in model2.collect()} == rows and oov2 == oov


def test_normalize_text_nfc_and_control_strip(spark):
    from kgraph_spark.operators.corpus_curation import normalize_text

    docs = _docs(
        spark,
        [
            (1, "café and\x07 bell", "en", 1),  # decomposed accent + BEL
            (2, "already clean", "en", 1),
            (3, "tab\tand\nnewline stay", "en", 1),  # \t \n survive the strip
        ],
    )
    out = {r["doc_id"]: r for r in normalize_text(docs).collect()}
    assert out[1]["text"] == "café and bell" and out[1]["changed"]
    assert out[2]["text"] == "already clean" and not out[2]["changed"]
    assert out[3]["text"] == "tab\tand\nnewline stay" and not out[3]["changed"]


def test_corpus_diff_statuses(spark):
    from kgraph_spark.operators.corpus_curation import corpus_diff

    old = _docs(spark, [(1, "a", "en", 1), (2, "b", "en", 1), (3, "c", "en", 1)])
    new = _docs(spark, [(2, "b", "en", 1), (3, "c2", "en", 1), (4, "d", "en", 1)])
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_dedup_lines_idempotent(spark):
    """A second dedup pass is a no-op: every surviving line is already the
    global first occurrence of its text."""
    from kgraph_spark.operators.corpus_curation import dedup_lines

    docs = _docs(
        spark,
        [
            (1, "x\nSHARED\ny", "en", 1),
            (2, "SHARED\nz\nz", "en", 1),
            (3, "x\nq", "en", 1),
        ],
    )
    once = dedup_lines(docs)
    twice = dedup_lines(once.selectExpr("doc_id", "text", "'en' AS lang", "0 AS n_chars"))
    a = {(r["doc_id"], r["text"]) for r in once.collect()}
    b = {(r["doc_id"], r["text"]) for r in twice.collect()}
    assert a == b


def test_scrub_pii_composes_with_streaming(spark, tmp_path):
    """scrub_pii is pure map-side expressions, so the SAME operator runs
    unchanged on a structured stream (the batch function IS the streaming
    function — no separate code path)."""
    import uuid

    from pyspark.sql import functions as F  # noqa: F811

    from kgraph_spark.operators.corpus_curation import scrub_pii

    indir = tmp_path / "in"
    indir.mkdir()
    _docs(spark, [(1, "mail a@b.io now", "en", 1), (2, "clean", "en", 1)]).coalesce(
        1
    ).write.mode("overwrite").parquet(str(indir))
    stream = spark.readStream.schema(
        "doc_id bigint, text string, lang string, n_chars bigint"
    ).parquet(str(indir))
    table = f"pii_{uuid.uuid4().hex[:8]}"
    q = (
        scrub_pii(stream)
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"]: r for r in spark.sql(f"SELECT * FROM {table}").collect()}
    assert got[1]["text"] == "mail <EMAIL> now" and got[1]["n_email"] == 1
    assert got[2]["text"] == "clean" and got[2]["n_email"] == 0


# ------------------------------------------------- review-fix regressions
def test_quality_score_empty_text_does_not_crash_ansi(spark):
    """Spark 4 ANSI mode: unguarded x/0 aborts the job on an empty doc."""
    from kgraph_spark.operators.text_analysis import quality_score

    out = quality_score(_docs(spark, [(1, "", "en", 0), (2, "real words", "en", 10)]))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["alpha_ratio"] == 0.0 and rows[1]["punct_ratio"] == 0.0
    assert rows[1]["stopword_ratio"] == 0.0
    assert rows[2]["alpha_ratio"] > 0


def test_pack_and_shuffle_accept_string_ids(spark):
    from kgraph_spark.operators.corpus_curation import (
        deterministic_shuffle,
        pack_sequences,
    )

    docs = spark.createDataFrame(
        [(f"DOC{i:03d}", "t", "en", 10) for i in range(40)],
        "doc_id string, text string, lang string, n_chars bigint",
    )
    packed = {r["doc_id"]: r["seq_id"] for r in pack_sequences(docs, budget=100).collect()}
    assert len(packed) == 40 and packed["DOC000"] == 0
    ranks = sorted(r["shuffle_rank"] for r in deterministic_shuffle(docs).collect())
    assert ranks == list(range(40))


def test_keep_best_null_quality_loses(spark):
    from kgraph_spark.operators.corpus_curation import near_dup_keep_best

    docs = spark.createDataFrame(
        [(1, None), (2, 100)], "doc_id bigint, n_chars bigint"
    )
    pairs = spark.createDataFrame([(1, 2)], "doc_a bigint, doc_b bigint")
    out = {r["doc_id"]: r["keeper_doc_id"] for r in near_dup_keep_best(docs, pairs).collect()}
    assert out == {1: 2, 2: 2}  # the real-quality doc wins


def test_hex_threshold_near_one_keeps_everything():
    assert _hex_threshold(1 - 1e-9) == "gggggg"  # not the 7-char '1000000'


def test_corpus_diff_null_text_is_not_churn(spark):
    from kgraph_spark.operators.corpus_curation import corpus_diff

    old = spark.createDataFrame([(1, None), (2, None)], "doc_id bigint, text string")
    new = spark.createDataFrame([(1, "x"), (2, None)], "doc_id bigint, text string")
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {1: "changed", 2: "unchanged"}


def test_normalize_text_null_text_unchanged(spark):
    from kgraph_spark.operators.corpus_curation import normalize_text

    out = normalize_text(
        spark.createDataFrame([(1, None)], "doc_id bigint, text string")
    ).collect()[0]
    assert out["text"] is None and out["changed"] is False


def test_semantic_sample_stratified_cap_and_stability(spark):
    """Per-cell cap holds, assignment is nearest-centroid, and the keep is
    RESUMABLE: items kept from a small corpus stay kept (same rank-prefix
    property as stratified_sample cannot hold exactly under growth — new
    items can displace old ranks — so the contract here is determinism +
    cap, and displacement only ever happens inside one cell)."""
    from kgraph_spark.operators.corpus_curation import semantic_cluster_sample

    # two well-separated 2-D clusters around the axes
    rows = [(i, [1.0, 0.01 * i]) for i in range(20)] + [
        (100 + i, [0.01 * i, 1.0]) for i in range(20)
    ]
    items = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    out = semantic_cluster_sample(items, cents, per_cell=5, salt="s").collect()
    by_cell = {}
    for r in out:
        by_cell.setdefault(r["cell"], []).append(r)
    assert set(by_cell) == {0, 1}
    for cell, rs in by_cell.items():
        assert len(rs) == 5
        assert all(r["cell_size"] == 20 for r in rs)
        assert sorted(r["rank"] for r in rs) == [1, 2, 3, 4, 5]
    # cluster membership is by nearest centroid
    assert all(r["vec_id"] < 100 for r in by_cell[0])
    assert all(r["vec_id"] >= 100 for r in by_cell[1])
    # deterministic across runs
    again = semantic_cluster_sample(items, cents, per_cell=5, salt="s").collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # the salt really feeds the ranking: a different salt re-draws the
    # per-cell selection (deterministic, so this inequality is stable),
    # while the cap and stratification invariants hold unchanged
    other = semantic_cluster_sample(items, cents, per_cell=5, salt="t").collect()
    assert len(other) == 10 and {r["cell"] for r in other} == {0, 1}
    assert {(r["cell"], r["rank"], r["vec_id"]) for r in other} != {
        (r["cell"], r["rank"], r["vec_id"]) for r in out
    }


def test_incremental_dedup_exact_under_heavy_fp(spark):
    """A deliberately tiny Bloom (64 bits) makes nearly every new row a
    false positive — the exact-confirm stage must remove every one, and
    the Bloom split must drop no genuinely-new row (no false negatives)."""
    from kgraph_spark.operators.corpus_curation import incremental_dedup

    old = spark.createDataFrame(
        [(i, f"doc body {i}") for i in range(40)], "doc_id bigint, text string"
    )
    new = spark.createDataFrame(
        [(i, f"doc body {i}") for i in range(20, 50)]  # 20-39 old, 40-49 new
        + [(99, None)],                                 # null text → md5('')
        "doc_id bigint, text string",
    )
    got = {(r["doc_id"]) for r in incremental_dedup(new, old, n_bits=64, n_hashes=3).collect()}
    assert got == set(range(40, 50)) | {99}
    # identical corpora → empty delta (would fail on any false negative)
    assert incremental_dedup(old, old, n_bits=64, n_hashes=3).count() == 0


def test_incremental_dedup_fallback_path_equal(spark):
    """broadcast_max_survivors=0 forces the shuffle anti-join fallback;
    result must be identical to the broadcast path."""
    from kgraph_spark.operators.corpus_curation import incremental_dedup

    old = spark.createDataFrame(
        [(i, f"t {i}") for i in range(30)], "doc_id bigint, text string"
    )
    new = spark.createDataFrame(
        [(i, f"t {i}") for i in range(25, 40)], "doc_id bigint, text string"
    )
    a = sorted(map(tuple, incremental_dedup(new, old).collect()))
    b = sorted(
        map(tuple, incremental_dedup(new, old, broadcast_max_survivors=0).collect())
    )
    assert a == b and len(a) == 10


def test_build_bloom_partition_invariant(spark):
    """OR-merge is commutative: the sketch must be byte-identical no matter
    how the hash column is partitioned."""
    from kgraph_spark.operators.corpus_curation import build_bloom

    h = spark.createDataFrame(
        [(f"{i:032x}",) for i in range(200)], "content_hash string"
    )
    b1 = build_bloom(h.coalesce(1), "content_hash", n_bits=1 << 12)
    b8 = build_bloom(h.repartition(8), "content_hash", n_bits=1 << 12)
    assert b1 == b8
    assert any(b1)  # non-empty sketch actually set bits


def test_incremental_dedup_old_corpus_never_shuffles(spark):
    """Broadcast path: the confirm joins must be BroadcastHashJoin (the
    historical corpus is never sorted/shuffled as a join side)."""
    from conftest import plan_text
    from kgraph_spark.operators.corpus_curation import incremental_dedup

    old = spark.createDataFrame(
        [(i, f"t {i}") for i in range(30)], "doc_id bigint, text string"
    )
    new = spark.createDataFrame(
        [(i, f"t {i}") for i in range(25, 40)], "doc_id bigint, text string"
    )
    plan = plan_text(incremental_dedup(new, old))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan


def test_build_bloom_non_multiple_of_8_bits(spark):
    """n_bits that is not a byte multiple must still cover its top bits
    (ceil allocation) — positions in [96, 100) were out of bounds before."""
    from kgraph_spark.operators.corpus_curation import build_bloom, incremental_dedup

    h = spark.createDataFrame([(f"{i:032x}",) for i in range(50)], "content_hash string")
    b = build_bloom(h, "content_hash", n_bits=100, n_hashes=3)
    assert len(b) == 13  # ceil(100/8)
    old = spark.createDataFrame([(i, f"t {i}") for i in range(20)], "doc_id bigint, text string")
    got = incremental_dedup(old, old, n_bits=100, n_hashes=3).count()
    assert got == 0


# ---- strip_boilerplate --------------------------------------------------


def _bp_docs(spark):
    footer = "(c) example corp - all rights reserved"
    rows = [
        (1, "A", f"alpha body one\n{footer}"),
        (2, "A", f"alpha body two\n{footer}\nextra"),
        (3, "A", f"alpha body three\n{footer}"),
        (4, "B", f"beta body one\n{footer}"),
        (5, "B", f"beta body two\n{footer}"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, source string, text string"), footer


def test_strip_boilerplate_per_group_threshold(spark):
    from kgraph_spark.operators.corpus_curation import strip_boilerplate

    docs, footer = _bp_docs(spark)
    out = {r["doc_id"]: r for r in strip_boilerplate(docs, min_docs=3).collect()}
    # source A: footer in 3 distinct docs → stripped everywhere
    assert out[1]["text"] == "alpha body one" and out[1]["n_removed"] == 1
    assert out[2]["text"] == "alpha body two\nextra" and out[2]["n_removed"] == 1
    # source B: only 2 docs carry it → below threshold, kept
    assert footer in out[4]["text"] and out[4]["n_removed"] == 0
    assert all(r["n_lines"] >= 1 for r in out.values())


def test_strip_boilerplate_removes_every_occurrence(spark):
    # contrast dedup_lines: no "first occurrence survives" — the line is
    # chrome, every instance goes, including repeats inside one doc
    from kgraph_spark.operators.corpus_curation import strip_boilerplate

    docs = spark.createDataFrame(
        [(1, "A", "nav\nbody1\nnav"), (2, "A", "nav\nbody2"), (3, "A", "nav\nbody3")],
        "doc_id bigint, source string, text string",
    )
    out = {r["doc_id"]: r for r in strip_boilerplate(docs, min_docs=3).collect()}
    assert out[1]["text"] == "body1" and out[1]["n_removed"] == 2
    assert out[2]["text"] == "body2" and out[2]["n_removed"] == 1


def test_strip_boilerplate_short_lines_always_kept(spark):
    from kgraph_spark.operators.corpus_curation import strip_boilerplate

    docs = spark.createDataFrame(
        [(i, "A", f"body {i}\n\n-") for i in range(1, 5)],
        "doc_id bigint, source string, text string",
    )
    out = {r["doc_id"]: r for r in strip_boilerplate(docs, min_docs=2, min_line_chars=2).collect()}
    # "" and "-" are sub-threshold → never counted, never stripped
    assert out[1]["text"] == "body 1\n\n-" and out[1]["n_removed"] == 0


def test_strip_boilerplate_fully_stripped_doc_is_empty(spark):
    from kgraph_spark.operators.corpus_curation import strip_boilerplate

    docs = spark.createDataFrame(
        [(1, "A", "same"), (2, "A", "same"), (3, "A", "same\nkeep me")],
        "doc_id bigint, source string, text string",
    )
    out = {r["doc_id"]: r for r in strip_boilerplate(docs, min_docs=3).collect()}
    assert out[1]["text"] == "" and out[1]["n_removed"] == 1
    assert out[3]["text"] == "keep me"


# ---- quantile_buckets ---------------------------------------------------


def test_quantile_buckets_matches_sql_ntile(spark):
    """The distributed two-phase form must equal ntile() exactly —
    including the fat-bucket remainder rule — for several (cnt, n)."""
    from pyspark.sql import Window
    from kgraph_spark.operators.corpus_curation import quantile_buckets

    rows = [(i, ["x", "y"][i % 2], float((i * 37) % 11)) for i in range(23)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, score double")
    for n in (1, 3, 4, 7):
        got = {
            (r["doc_id"]): r["bucket"]
            for r in quantile_buckets(df, n, "score", group_col="source").collect()
        }
        w = Window.partitionBy("source").orderBy("score", "doc_id")
        want = {
            r["doc_id"]: r["b"]
            for r in df.select("doc_id", F.ntile(n).over(w).alias("b")).collect()
        }
        assert got == want, f"n={n}"


def test_quantile_buckets_global_and_tiny_group(spark):
    from kgraph_spark.operators.corpus_curation import quantile_buckets

    df = spark.createDataFrame(
        [(1, 5.0), (2, 1.0)], "doc_id bigint, score double"
    )
    # cnt=2 < n=5: ntile gives each row its own bucket in rank order
    got = {r["doc_id"]: r["bucket"] for r in quantile_buckets(df, 5, "score").collect()}
    assert got == {2: 1, 1: 2}


def test_quantile_buckets_negative_score_raises(spark):
    from kgraph_spark.operators.corpus_curation import quantile_buckets

    df = spark.createDataFrame([(1, -0.5)], "doc_id bigint, score double")
    with pytest.raises(Exception, match="negative"):
        quantile_buckets(df, 3, "score").collect()


# ---- c4_clean -------------------------------------------------------------


def test_c4_clean_line_and_page_rules(spark):
    from kgraph_spark.operators.corpus_curation import c4_clean

    good = "\n".join(
        [
            "this is a perfectly fine sentence.",
            "another quite reasonable line of text!",
            'a third line that ends with a quote."',
            "too short.",                      # < 5 words → dropped
            "no terminal punctuation on this line",  # dropped
        ]
    )
    docs = spark.createDataFrame(
        [
            (1, good),
            (2, good + "\nlorem IPSUM dolor sit amet."),   # page poison
            (3, "one good sentence is not enough here."),  # < 3 kept lines
            (4, good.replace("fine", "fine {")),           # curly brace
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in c4_clean(docs).collect()}
    assert out[1]["keep"] and out[1]["n_kept"] == 3 and out[1]["n_lines"] == 5
    assert out[1]["text"].count("\n") == 2
    assert "too short." not in out[1]["text"]
    assert not out[2]["keep"]   # lorem ipsum, any case
    assert not out[3]["keep"] and out[3]["n_kept"] == 1
    assert not out[4]["keep"]   # curly brace


def test_c4_clean_is_map_only(spark):
    from conftest import plan_text
    from kgraph_spark.operators.corpus_curation import c4_clean

    docs = spark.createDataFrame([(1, "a.")], "doc_id bigint, text string")
    plan = plan_text(c4_clean(docs))
    assert "Exchange" not in plan, plan


def test_train_val_test_split_partition_and_stability(spark):
    import pytest

    from kgraph_spark.operators.corpus_curation import train_val_test_split

    docs = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    rows = train_val_test_split(docs, 0.1, 0.1).collect()
    assert len(rows) == 500  # every row assigned exactly once
    by = {}
    for r in rows:
        by.setdefault(r["split"], set()).add(r["doc_id"])
    assert set(by) == {"train", "val", "test"}
    assert 0.7 < len(by["train"]) / 500 < 0.9
    # growth stability: assignments on a prefix corpus are unchanged
    small = train_val_test_split(
        spark.createDataFrame([(i,) for i in range(100)], "doc_id long"), 0.1, 0.1
    ).collect()
    assignment = {r["doc_id"]: r["split"] for r in rows}
    assert all(assignment[r["doc_id"]] == r["split"] for r in small)
    with pytest.raises(ValueError):
        train_val_test_split(docs, 0.6, 0.5)


# ---- PPS systematic sampling ---------------------------------------------


def test_pps_sample_size_and_heavy_guarantee(spark):
    from pyspark.sql import functions as F
    from kgraph_spark.operators.corpus_curation import pps_systematic_sample

    docs = spark.range(0, 200).select(
        F.col("id").alias("doc_id"), F.lit(10).alias("w")
    )
    # one heavy row: weight 600 >= total/n stride -> always selected
    heavy = spark.createDataFrame([(999, 600)], "doc_id long, w int")
    df = docs.unionByName(heavy)
    rows = pps_systematic_sample(df, "w", n=20).collect()
    ids = {r["doc_id"] for r in rows}
    hits = {r["doc_id"]: r["n_hits"] for r in rows}
    assert 999 in ids
    assert sum(hits.values()) == 20      # Σ multiplicity = n exactly
    assert hits[999] >= 4                # heavy row absorbs ~600/130 strides
    assert all(h == 1 for d, h in hits.items() if d != 999)
    # deterministic: rerun identical
    again = {r["doc_id"] for r in pps_systematic_sample(df, "w", n=20).collect()}
    assert ids == again


def test_pps_uniform_weights_even_stride(spark):
    from pyspark.sql import functions as F
    from kgraph_spark.operators.corpus_curation import pps_systematic_sample

    df = spark.range(0, 100).select(F.col("id").alias("doc_id"), F.lit(1).alias("w"))
    got = pps_systematic_sample(df, "w", n=10).count()
    assert got == 10
    # non-positive weights are excluded, never crash the stride math
    import pytest
    mixed = spark.createDataFrame(
        [(1, 5), (2, 0), (3, -2), (4, 5)], "doc_id long, w int"
    )
    ids = {r["doc_id"] for r in pps_systematic_sample(mixed, "w", n=2).collect()}
    assert ids <= {1, 4} and len(ids) == 2
    with pytest.raises(ValueError):
        pps_systematic_sample(df, "w", n=0)


def test_term_burstiness_hand_case(spark):
    from kgraph_spark.operators.text_analysis import term_burstiness

    # corpus of 4 docs; "aa" clumps (3+1 in two docs), "bb" scatters
    docs = spark.createDataFrame(
        [(1, "aa aa aa bb"), (2, "aa bb"), (3, "bb cc"), (4, "cc")],
        "doc_id long, text string",
    )
    out = {r["token"]: r for r in term_burstiness(docs, min_df=2).collect()}
    aa = out["aa"]
    assert aa["df"] == 2 and aa["cf"] == 4
    assert aa["per_doc_rate"] == 2.0
    # vmr = (N·Σc² − cf²)/(N·cf) = (4·10 − 16)/(4·4) = 1.5
    assert aa["vmr"] == 1.5
    # bb: counts 1,1,1 → Σc²=3, cf=3 → (12−9)/12 = 0.25
    assert out["bb"]["vmr"] == 0.25
    assert "dd" not in out  # below min_df


def test_burrows_delta_hand_case(spark):
    from kgraph_spark.operators.text_analysis import burrows_delta

    # A and B share a style profile exactly; C inverts it
    docs = spark.createDataFrame(
        [(1, "x x y", "A"), (2, "x x y", "B"), (3, "x y y", "C")],
        "doc_id long, text string, source string",
    )
    out = {(r["source_a"], r["source_b"]): r
           for r in burrows_delta(docs, top_k=2).collect()}
    assert out[("A", "B")]["delta"] == 0.0
    assert out[("A", "C")]["delta"] == out[("B", "C")]["delta"] > 0.5
    assert out[("A", "C")]["n_tokens"] == 2


def test_burrows_delta_drops_zero_variance_tokens(spark):
    from kgraph_spark.operators.text_analysis import burrows_delta

    # 'same' has identical relative freq everywhere -> no signal;
    # only the discriminating token survives into n_tokens
    docs = spark.createDataFrame(
        [(1, "same hot", "A"), (2, "same cold", "B")],
        "doc_id long, text string, source string",
    )
    rows = burrows_delta(docs, top_k=3).collect()
    assert len(rows) == 1 and rows[0]["n_tokens"] == 2  # hot + cold, not 'same'


def test_neyman_allocation_favors_spread_strata(spark):
    from kgraph_spark.operators.corpus_curation import neyman_allocation

    # equal sizes: wide stratum (sd 10x) must get ~10x the budget
    rows = [("wide", float(v)) for v in (0, 20, 40, 60)] + [
        ("narrow", float(v)) for v in (10, 12, 14, 16)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["stratum"]: r for r in
           neyman_allocation(df, "v", "g", budget=110).collect()}
    # sd(wide)/sd(narrow) = 25.82/2.582 = 10 -> alloc 100 vs 10
    assert out["wide"]["alloc"] == 100 and out["narrow"]["alloc"] == 10
    # raw alloc exceeds the 4-row stratum; capped column clips
    assert out["wide"]["alloc_capped"] == 4
    # zero-variance stratum weighs nothing
    df2 = spark.createDataFrame(
        rows + [("flat", 5.0)] * 4, "g string, v double"
    )
    out2 = {r["stratum"]: r for r in
            neyman_allocation(df2, "v", "g", budget=110).collect()}
    assert out2["flat"]["alloc"] == 0


def test_chao1_richness_hand_case(spark):
    import pytest

    from kgraph_spark.operators.text_analysis import chao1_richness

    # tokens: a a a b b c d -> S=4, f1=2 (c,d), f2=1 (b), N=7
    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "b c d")], "doc_id long, text string"
    )
    r = chao1_richness(docs).first()
    assert (r["n_tokens"], r["n_types"], r["f1"], r["f2"]) == (7, 4, 2, 1)
    # chao1 = 4 + 2*1/(2*2) = 4.5; unseen mass = 2/7
    assert r["chao1"] == pytest.approx(4.5, abs=1e-6)
    assert r["unseen_mass"] == pytest.approx(round(2 / 7, 6), abs=1e-9)
    # saturated corpus: no singletons -> chao1 = S, zero unseen mass
    sat = spark.createDataFrame([(1, "x x y y")], "doc_id long, text string")
    r2 = chao1_richness(sat).first()
    assert r2["chao1"] == 2.0 and r2["unseen_mass"] == 0.0


def test_corpus_richness_hand_case(spark):
    import math

    from kgraph_spark.operators.text_analysis import corpus_richness

    # tokens: a a b c -> N=4 V=3 hapax=2 S2=6
    docs = spark.createDataFrame([(1, "a a b c")], "doc_id long, text string")
    r = corpus_richness(docs).first()
    assert (r["n_tokens"], r["n_types"], r["hapax"]) == (4, 3, 2)
    assert r["yule_k"] == pytest.approx(10000.0 * 2 / 16, abs=1e-6)
    assert r["honore_r"] == pytest.approx(100 * math.log(4) * 3 / 1, abs=1e-5)
    assert r["herdan_c"] == pytest.approx(math.log(3) / math.log(4), abs=1e-6)
    # every token a hapax -> Honore undefined (V1 = V)
    allh = spark.createDataFrame([(1, "p q r")], "doc_id long, text string")
    assert corpus_richness(allh).first()["honore_r"] is None


def test_collocations_g2_hand_case(spark):
    import math

    from kgraph_spark.operators.text_analysis import collocations_g2

    # "x y" x5 and "y x" x4 bigrams; min_count 5 keeps only (x, y)
    docs = spark.createDataFrame(
        [(1, "x y x y x y x y x y")], "doc_id long, text string"
    )
    rows = collocations_g2(docs, min_count=5, top_k=20).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["w1"], r["w2"], r["n12"], r["n1"], r["n2"]) == ("x", "y", 5, 5, 5)
    expected = 2.0 * (5 * math.log(5 * 9 / 25) + 4 * math.log(4 * 9 / 16))
    assert r["g2"] == pytest.approx(expected, abs=1e-5)
    # bigrams never cross doc boundaries
    two = spark.createDataFrame(
        [(1, "x y"), (2, "y x")], "doc_id long, text string"
    )
    got = {(r["w1"], r["w2"]): r["n12"]
           for r in collocations_g2(two, min_count=1, top_k=20).collect()}
    assert got == {("x", "y"): 1, ("y", "x"): 1}


def test_source_kl_divergence_hand_case(spark):
    import math

    from kgraph_spark.operators.text_analysis import source_kl_divergence

    docs = spark.createDataFrame(
        [(1, "a a b", "s1"), (2, "b b b", "s2")],
        "doc_id long, text string, source string",
    )
    rows = {r["source"]: r for r in source_kl_divergence(docs).collect()}
    assert rows["s1"]["n_tokens"] == 3 and rows["s2"]["n_tokens"] == 3
    assert rows["s1"]["kl_bits"] == pytest.approx(1.0 / 3.0, abs=1e-6)
    assert rows["s2"]["kl_bits"] == pytest.approx(math.log2(1.5), abs=1e-6)
    # a source identical to the corpus diverges by 0
    same = spark.createDataFrame(
        [(1, "a b", "s1"), (2, "a b", "s2")],
        "doc_id long, text string, source string",
    )
    for r in source_kl_divergence(same).collect():
        assert r["kl_bits"] == pytest.approx(0.0, abs=1e-9)


def test_source_overlap_matrix_hand_case(spark):
    from kgraph_spark.operators.corpus_curation import source_overlap_matrix

    rows = [
        ("d1", "s1", "x" * 50),
        ("d2", "s2", "x" * 45 + "zzz"),   # same 40-char opening as d1
        ("d3", "s2", "completely different text here"),
        ("d4", "s3", "another unrelated body"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, source string, text string")
    out = source_overlap_matrix(df, prefix_chars=40).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["src_a"], r["src_b"]) == ("s1", "s2")
    assert (r["n_a"], r["n_b"], r["n_shared"]) == (1, 2, 1)
    assert r["jaccard"] == pytest.approx(0.5, abs=1e-9)
    # exact mode: the 45-char twin no longer matches
    assert source_overlap_matrix(df).count() == 0
    # duplicate-heavy source counts each key once
    dup = df.union(
        spark.createDataFrame(
            [("d5", "s1", "x" * 50)], "doc_id string, source string, text string"
        )
    )
    r2 = source_overlap_matrix(dup, prefix_chars=40).first()
    assert (r2["n_a"], r2["n_shared"]) == (1, 1)


def test_dedup_savings_hand_case(spark):
    from kgraph_spark.operators.corpus_curation import dedup_savings

    rows = [
        ("d1", "s", "aaa bbb"),
        ("d2", "s", "aaa bbb"),            # exact dup of d1
        ("d3", "s", "x" * 45),             # prefix twin of d4
        ("d4", "s", "x" * 45 + " tail"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, source string, text string")
    out = {r["method"]: r for r in dedup_savings(df).collect()}
    ex, pf = out["exact"], out["prefix"]
    assert (ex["n_docs"], ex["n_groups"], ex["docs_removed"]) == (4, 3, 1)
    assert ex["tokens_total"] == 7 and ex["tokens_removed"] == 2
    assert (pf["n_groups"], pf["docs_removed"]) == (2, 2)
    # prefix canonical keeps d1 (2 tok) and d3 (1 tok) -> 4 removed
    assert pf["tokens_removed"] == 4
    assert pf["pct_tokens_removed"] == pytest.approx(4.0 / 7.0, abs=1e-6)


def test_mix_gap_to_target_hand_case(spark):
    import math

    from kgraph_spark.operators.corpus_curation import mix_gap_to_target

    rows = (
        [("d%d" % i, "a", "x") for i in range(3)]
        + [("e0", "b", "x")]
        + [("f0", "c", "x")]
    )
    df = spark.createDataFrame(rows, "doc_id string, source string, text string")
    out = {r["group"]: r for r in
           mix_gap_to_target(df, {"a": 0.5, "b": 0.5}).collect()}
    assert out["a"]["share"] == pytest.approx(0.6, abs=1e-9)
    assert out["a"]["target_share"] == pytest.approx(0.5, abs=1e-9)
    assert out["a"]["gap"] == pytest.approx(0.1, abs=1e-9)
    # uncovered source: share reported, target/gap NULL
    assert out["c"]["target_share"] is None and out["c"]["gap"] is None
    # KL over covered (a:3, b:1 renormalized vs .5/.5):
    kl = (3 * math.log2(3 / 2) + 1 * math.log2(1 / 2)) / 4
    assert out["a"]["kl_bits"] == pytest.approx(kl, abs=1e-5)
    assert out["b"]["kl_bits"] == pytest.approx(kl, abs=1e-5)
    # matched mix -> KL 0
    even = spark.createDataFrame(
        [("d0", "a", "x"), ("d1", "b", "x")],
        "doc_id string, source string, text string",
    )
    r = mix_gap_to_target(even, {"a": 0.5, "b": 0.5}).first()
    assert r["kl_bits"] == pytest.approx(0.0, abs=1e-9)


def test_unimax_allocation_hand_case(spark):
    """A 10/100/1000-token corpus, E=2, budget 400: the tail stratum caps
    at 20, the other two split the remaining 380 equally (UniMax greedy
    closed form); all-capped and all-uncapped regimes too."""
    from kgraph_spark.operators.corpus_curation import unimax_allocation

    rows = [(1, "a", 10), (2, "b", 100), (3, "c", 1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    out = {r["stratum"]: r for r in unimax_allocation(df, budget=400, max_epochs=2).collect()}
    assert out["a"]["allocation"] == 20.0 and out["a"]["epochs"] == 2.0
    assert out["b"]["allocation"] == 190.0 and out["b"]["epochs"] == 1.9
    assert out["c"]["allocation"] == 190.0 and out["c"]["epochs"] == 0.19
    assert abs(sum(r["sampling_weight"] for r in out.values()) - 1.0) < 1e-9

    # budget above total caps: every stratum capped, weights sum < 1
    big = {r["stratum"]: r for r in unimax_allocation(df, budget=10_000, max_epochs=2).collect()}
    assert all(big[s]["allocation"] == big[s]["cap"] for s in big)
    assert all(big[s]["epochs"] == 2.0 for s in big)

    # budget far below every cap: nobody capped, equal shares
    small = {r["stratum"]: r for r in unimax_allocation(df, budget=15, max_epochs=2).collect()}
    assert all(small[s]["allocation"] == 5.0 for s in small)
