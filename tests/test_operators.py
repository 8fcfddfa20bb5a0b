"""Per-operator unit tests (SURVEY.md §5 mirror of the reference's
framework tests: chunking/windowing behavior, merge semantics, swap logic,
promotion, dedup)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgraph_spark.config import ChunkingConfig, PipelineConfig
from kgraph_spark.functions.extraction import chunk_text
from kgraph_spark.operators import canonicalize, relationships
from kgraph_spark.operators.canonicalize import connected_components, merge_mapping


# ---- B1 chunking (reference tests/test_streaming.py:115-484 semantics) ----

def test_chunk_single_when_fits():
    cfg = ChunkingConfig()
    assert chunk_text("short text", cfg) == [("short text", 0, 10, 0)]


def test_chunk_overlap_and_boundaries():
    cfg = ChunkingConfig(chunk_size=100, overlap=20, min_chunk_size=10)
    content = ("word " * 30 + ". ") * 5  # sentences every ~152 chars
    chunks = chunk_text(content, cfg)
    assert chunks[0][1] == 0
    for (c, s, e, i), (c2, s2, e2, i2) in zip(chunks, chunks[1:]):
        assert s2 == s + (cfg.chunk_size - cfg.overlap)  # fixed step
        assert i2 == i + 1
        assert content[s2:e2] == c2
    # boundary snap: non-final chunks end within the window
    for c, s, e, i in chunks[:-1]:
        assert e - s <= cfg.chunk_size


def test_chunk_min_size_skips_tiny_non_final():
    cfg = ChunkingConfig(chunk_size=100, overlap=0, min_chunk_size=50, respect_boundaries=False)
    content = "x" * 230
    chunks = chunk_text(content, cfg)
    # last piece (30 chars) kept because it is final
    assert chunks[-1][0] == "x" * 30
    assert [c[3] for c in chunks] == list(range(len(chunks)))


# ---- D8 connected components: distributed path ----------------------------

def test_connected_components_distributed(spark):
    # chain a-b-c-d plus separate pair x-y; force the distributed loop
    edges = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("d", "c"), ("x", "y")], "src string, dst string"
    )
    labels = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert labels["a"] == labels["b"] == labels["c"] == labels["d"] == "a"
    assert labels["x"] == labels["y"] == "x"


def test_merge_mapping_winner_prefers_authoritative(spark):
    # chain: prov ids + one authoritative — authoritative wins even if not min
    edges = spark.createDataFrame(
        [("prov-aaa", "prov-bbb"), ("prov-bbb", "RxNorm:9")], "src string, dst string"
    )
    m = {r["entity_id"]: r["final_id"] for r in merge_mapping(edges).collect()}
    assert m == {"prov-aaa": "RxNorm:9", "prov-bbb": "RxNorm:9"}
    # distributed path must elect the same winner
    m2 = {r["entity_id"]: r["final_id"] for r in merge_mapping(edges, local_threshold=0).collect()}
    assert m2 == m


def test_apply_merge_rewrites_columns(spark):
    mapping = spark.createDataFrame([("loser", "winner")], "entity_id string, final_id string")
    df = spark.createDataFrame(
        [("loser", "keep"), ("keep", "loser")], "subject_id string, object_id string"
    )
    out = {
        (r["subject_id"], r["object_id"])
        for r in canonicalize.apply_merge(df, mapping, "subject_id", "object_id").collect()
    }
    assert out == {("winner", "keep"), ("keep", "winner")}


# ---- F6/F7/F8 validation chain (reference tests/test_relationship_swap.py) --

@pytest.fixture(scope="module")
def spec(spark):
    return relationships.predicate_spec_df(spark)


def _resolved(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id string, subject_text string, predicate string, object_text string, "
        "confidence double, para_idx int, evidence string, subject_id string, "
        "subject_type string, object_id string, object_type string",
    )


def test_swap_correction_fixes_backwards_treats(spark, spec):
    rows = [("d1", "x", "treats", "y", 0.9, 0, "e", "DIS", "disease", "DRUG", "drug")]
    out = relationships.validate_relations(_resolved(spark, rows), spec).collect()
    assert len(out) == 1
    assert (out[0]["subject_id"], out[0]["object_id"]) == ("DRUG", "DIS")


def test_invalid_pair_rejected(spark, spec):
    rows = [("d1", "x", "treats", "y", 0.9, 0, "e", "LOC", "location", "DIS", "disease")]
    assert relationships.validate_relations(_resolved(spark, rows), spec).count() == 0


def test_unknown_predicate_rejected(spark, spec):
    rows = [("d1", "x", "zaps", "y", 0.9, 0, "e", "A", "drug", "B", "disease")]
    assert relationships.validate_relations(_resolved(spark, rows), spec).count() == 0


def test_specificity_dedup_keeps_most_specific(spark, spec):
    rows = [
        ("d1", "x", "associated_with", "y", 0.75, 0, "e", "BM", "biomarker", "DIS", "disease"),
        ("d1", "x", "indicates", "y", 0.85, 1, "e", "BM", "biomarker", "DIS", "disease"),
    ]
    out = relationships.validate_relations(_resolved(spark, rows), spec).collect()
    assert len(out) == 1 and out[0]["predicate"] == "indicates"


def test_symmetric_order(spark, spec):
    t = spark.createDataFrame(
        [("d1", "B", "interacts_with", "A", 0.8), ("d1", "B", "treats", "A", 0.9)],
        "doc_id string, subject_id string, predicate string, object_id string, confidence double",
    )
    out = {(r["subject_id"], r["predicate"], r["object_id"])
           for r in relationships.symmetric_order(t, spec).collect()}
    assert out == {("A", "interacts_with", "B"), ("B", "treats", "A")}


def test_accumulate_max_conf_union_sources(spark):
    t = spark.createDataFrame(
        [("d1", "A", "treats", "B", 0.7), ("d2", "A", "treats", "B", 0.9),
         ("d1", "A", "treats", "A", 1.0)],
        "doc_id string, subject_id string, predicate string, object_id string, confidence double",
    )
    out = relationships.accumulate_triples(t).collect()
    assert len(out) == 1  # self-loop dropped
    r = out[0]
    assert r["confidence"] == 0.9
    assert r["source_documents"] == ["d1", "d2"]
    assert r["evidence_count"] == 2


# ---- dedup / similarity sanity ---------------------------------------------

def test_exact_dedup_groups_identical_texts(spark):
    from kgraph_spark.operators.dedup_text import exact_duplicates

    docs = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")], "doc_id long, text string"
    )
    out = {r["canonical_doc_id"]: r["n_docs"] for r in exact_duplicates(docs).collect()}
    assert out == {1: 2, 3: 1}


def test_minhash_lsh_finds_near_duplicates(spark):
    from kgraph_spark.operators.dedup_text import lsh_candidate_pairs, minhash_signatures, shingles

    base = " ".join(f"tok{i}" for i in range(60))
    near = base.replace("tok5 ", "tok5x ")  # one token changed
    far = " ".join(f"zz{i}" for i in range(60))
    docs = spark.createDataFrame([(1, base), (2, near), (3, far)], "doc_id long, text string")
    pairs = lsh_candidate_pairs(minhash_signatures(shingles(docs, k=3))).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got
    est = next(r["est_jaccard"] for r in pairs if (r["doc_a"], r["doc_b"]) == (1, 2))
    assert est > 0.6


def test_lsh_candidate_pair_dedup_is_ids_only(spark):
    """The candidate-pair distinct() must key AND carry doc ids only — a
    pair colliding in several bands must not shuttle its two 64-long
    signatures (~1 KB/row) through the dedup exchange once per collision
    (r3 verdict item 3). Signatures join back after the 16-byte dedup."""
    import re

    from conftest import plan_text
    from kgraph_spark.operators.dedup_text import lsh_candidate_pairs, minhash_signatures, shingles

    docs = spark.createDataFrame(
        [(i, " ".join(f"tok{j}" for j in range(50))) for i in range(4)],
        "doc_id long, text string",
    )
    pairs = lsh_candidate_pairs(minhash_signatures(shingles(docs, k=3)))
    plan = plan_text(pairs)
    dedup_aggs = [
        cols
        for _, cols in re.findall(r"Keys \[(\d+)\]: \[([^\]]*)\]", plan)
        if "doc_a" in cols and "doc_b" in cols
    ]
    assert dedup_aggs, "candidate distinct() aggregate not found in plan"
    assert all("sig" not in cols for cols in dedup_aggs), dedup_aggs


def test_incremental_near_dup_verdicts(spark):
    """New-vs-history fuzzy dedup: a near-identical new doc is flagged with
    its best historical match; a fresh doc gets (False, NULL, NULL); the
    best-match election is deterministic (max est, then smallest old id)."""
    from kgraph_spark.operators.dedup_text import incremental_near_dup

    base = " ".join(f"tok{i}" for i in range(60))
    near = base.replace("tok5 ", "tok5x ")
    old = spark.createDataFrame(
        [(10, base), (11, base), (12, " ".join(f"old{i}" for i in range(60)))],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, near), (2, " ".join(f"fresh{i}" for i in range(60)))],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in incremental_near_dup(new, old, threshold=0.5).collect()}
    assert set(got) == {1, 2}
    assert got[1]["near_dup"] and got[1]["matched_old"] == 10  # tie → smallest old id
    assert got[1]["est_jaccard"] > 0.6
    assert not got[2]["near_dup"] and got[2]["matched_old"] is None


def test_incremental_near_dup_history_never_shuffled_as_join_side(spark):
    """Every join in the asymmetric LSH streams the history against
    broadcast new-side data — no SortMergeJoin anywhere (the history's only
    exchanges are its own signature aggregation, which at scale is a
    precomputed table)."""
    from conftest import plan_text
    from kgraph_spark.operators.dedup_text import incremental_near_dup

    docs = spark.createDataFrame(
        [(i, " ".join(f"t{i}_{j}" for j in range(20))) for i in range(10)],
        "doc_id long, text string",
    )
    out = incremental_near_dup(docs.filter("doc_id % 2 = 0"), docs.filter("doc_id % 2 = 1"))
    plan = plan_text(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan


def test_winnow_shared_passage_guarantee(spark):
    """Winnowing guarantee: two documents sharing a token run of length
    ≥ window+k-1 (= 8 here) share at least one selected fingerprint, even
    when the rest of the documents is disjoint — the passage-level case
    whole-document MinHash dilutes away."""
    from kgraph_spark.operators.dedup_text import winnow_fingerprints, winnow_passage_pairs

    passage = " ".join(f"shared{i}" for i in range(8))
    doc_a = " ".join(f"aa{i}" for i in range(40)) + " " + passage
    doc_b = passage + " " + " ".join(f"bb{i}" for i in range(40))
    doc_c = " ".join(f"cc{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, doc_a), (2, doc_b), (3, doc_c)], "doc_id long, text string"
    )
    fps = winnow_fingerprints(docs, k=5, window=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared 8-token run must share a fingerprint"
    assert not (by_doc[1] & by_doc[3]) and not (by_doc[2] & by_doc[3])
    pairs = {(r["doc_a"], r["doc_b"]) for r in winnow_passage_pairs(fps, min_shared=1).collect()}
    assert pairs == {(1, 2)}
    # density sanity: ~2/(w+1) of grams selected, never more than gram count
    n_grams = 41 + 8 - 5 + 1
    assert 1 <= len(by_doc[1]) <= n_grams


def test_winnow_tie_break_and_short_docs(spark):
    """Ties (identical grams in one window) select the RIGHTMOST position;
    docs shorter than k emit nothing; docs with fewer than `window` grams
    emit their single global min."""
    from kgraph_spark.operators.dedup_text import winnow_fingerprints

    docs = spark.createDataFrame(
        [
            (1, " ".join(["a"] * 8)),   # 4 identical grams, one window
            (2, "too short"),            # < k tokens: no grams
            (3, " ".join(f"t{i}" for i in range(6))),  # 2 grams < window
        ],
        "doc_id long, text string",
    )
    rows = winnow_fingerprints(docs, k=5, window=4).collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append((r["fp"], r["pos"]))
    assert [p for _, p in got[1]] == [3], "all-equal window must keep rightmost pos"
    assert 2 not in got
    assert len(got[3]) == 1 and got[3][0][1] in (0, 1)


def test_winnow_fingerprints_map_only_plan(spark):
    """The fingerprint pass is ZERO-shuffle: per-row array expressions in
    the scan stage — no Exchange anywhere in the plan (the posexplode +
    Window(partitionBy doc) alternative would shuffle every gram)."""
    from conftest import plan_text
    from kgraph_spark.operators.dedup_text import winnow_fingerprints

    docs = spark.createDataFrame([(1, " ".join(["x"] * 30))], "doc_id long, text string")
    plan = plan_text(winnow_fingerprints(docs))
    assert "Exchange" not in plan, plan


def test_winnow_passage_pairs_distinct_per_doc_fp(spark):
    """A passage repeated N times inside one document must not multiply
    pair rows: fingerprint sets are deduped per (doc, fp) before the join,
    so shared_fps counts DISTINCT shared fingerprints."""
    from kgraph_spark.operators.dedup_text import winnow_fingerprints, winnow_passage_pairs

    passage = " ".join(f"p{i}" for i in range(8))
    filler = " ".join(f"f{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(1, passage + " " + filler + " " + passage), (2, passage)],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs, k=5, window=4)
    out = winnow_passage_pairs(fps, min_shared=1).collect()
    assert len(out) == 1
    doc2_fps = fps.filter("doc_id = 2").select("fp").distinct().count()
    assert out[0]["shared_fps"] <= doc2_fps


def test_simhash_hamming_near_dups(spark):
    from kgraph_spark.operators.dedup_text import simhash, simhash_near_dups

    # heavy token repetition → large per-bit vote margins → a one-token edit
    # flips ≤3 bits, inside the 4-chunk pigeonhole guarantee (hamming ≤ 3)
    base = " ".join(f"tok{i % 40}" for i in range(400))
    near = base.replace("tok7", "tok7x", 1)
    exact = base
    far = " ".join(f"qq{i}" for i in range(400))
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, far), (4, exact)], "doc_id long, text string"
    )
    out = {(r["doc_a"], r["doc_b"]): r["hamming"]
           for r in simhash_near_dups(simhash(docs), max_hamming=3).collect()}
    assert out.get((1, 4)) == 0          # identical text → hamming 0
    assert (1, 2) in out                 # one-token edit → ≤ 3 bits
    assert (1, 3) not in out and (2, 3) not in out


def test_lsh_topk_recall_vs_brute_force(spark):
    from kgraph_spark.operators.similarity import brute_force_topk, lsh_topk

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    )
    probes = emb.filter(F.col("vec_id") < 3).select(F.col("vec_id").alias("probe_id"), "embedding")
    bf = brute_force_topk(emb, probes, k=5)
    # self-match must rank first with cosine ~1
    firsts = {r["probe_id"]: (r["vec_id"], r["cosine"]) for r in bf.filter("rank = 1").collect()}
    for pid, (vid, cos) in firsts.items():
        assert vid == pid and cos > 0.999999
    approx = lsh_topk(emb, probes, dim=64, k=5, n_planes=6)
    # LSH must at least recover the self-match (same bucket trivially)
    a_firsts = {r["probe_id"]: r["vec_id"] for r in approx.filter("rank = 1").collect()}
    for pid, vid in a_firsts.items():
        assert vid == pid


def test_multimodal_feature_contract(spark):
    from kgraph_spark import synth
    from kgraph_spark.operators.multimodal import extract_features, synth_assets

    docs = synth.documents_df(spark, 50)
    feats = extract_features(synth_assets(docs))
    rows = feats.collect()
    assert rows, "expected media assets in synthetic corpus"
    for r in rows:
        assert r["decode_ok"] and len(r["feature"]) == 8
        assert all(0.0 <= x <= 1.0 for x in r["feature"])


def test_bfs_first_reach_hop(spark):
    from kgraph_spark.operators.graph import bfs_subgraph

    edges = spark.createDataFrame(
        [("a", "r", "b"), ("b", "r", "c"), ("a", "r", "c"), ("c", "r", "d")],
        "subject_id string, predicate string, object_id string",
    )
    seeds = spark.createDataFrame([("a",)], "entity_id string")
    out = {r["entity_id"]: r["hop"] for r in bfs_subgraph(edges, seeds, max_hops=3, directed=True).collect()}
    assert out == {"a": 0, "b": 1, "c": 1, "d": 2}


def test_ngram_jaccard_hot_shingle_cap_bounds_candidates(spark):
    """A planted stopword shared by every doc must not generate pairs by
    itself once its document frequency exceeds the cap; pairs that also
    share rare shingles keep their EXACT full-set jaccard (the stopword
    still counts in |A∩B| and the set sizes)."""
    from kgraph_spark.operators.dedup_text import ngram_jaccard_pairs, shingles

    # docs 1 and 2: near-dups sharing rare tokens + the stopword.
    # docs 3..8: unrelated, share ONLY the stopword "the".
    rows = [
        (1, "the alpha beta gamma delta"),
        (2, "the alpha beta gamma epsilon"),
    ] + [(i, f"the uniq{i}a uniq{i}b uniq{i}c uniq{i}d") for i in range(3, 9)]
    sh = shingles(spark.createDataFrame(rows, "doc_id long, text string"), k=1)

    capped = ngram_jaccard_pairs(sh, min_jaccard=0.2, max_shingle_df=3)
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in capped.collect()}
    # only the rare-shingle pair survives; all stopword-only pairs are gone
    assert set(got) == {(1, 2)}
    # exact jaccard over the FULL sets: |A∩B|=4 (the alpha beta gamma), |A∪B|=6
    assert abs(got[(1, 2)] - 4 / 6) < 1e-9

    # with an inert cap the output equals the uncapped form exactly
    uncapped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(sh, min_jaccard=0.0, max_shingle_df=None).collect()
    }
    inert = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(sh, min_jaccard=0.0, max_shingle_df=10_000).collect()
    }
    assert uncapped == inert and len(uncapped) > 1


def test_authority_candidate_rerank_picks_closest_label(spark):
    """D4 ambiguity: two KB candidates for one surface — the one whose label
    is string-closest to the searched term wins (the reference's
    _rerank_by_similarity pick); candidates below the similarity threshold
    resolve to nothing (caller falls through to the provisional hash)."""
    from kgraph_spark.operators.resolve import rerank_authority_candidates

    terms = spark.createDataFrame(
        [("acetylsalicylic acid", "acetylsalicylic acid"),
         ("zzz totally unrelated", "zzz totally unrelated")],
        "norm_key string, text string",
    )
    cands = spark.createDataFrame(
        [("acetylsalicylic acid", "UMLS:C0004057", "aspirin"),
         ("acetylsalicylic acid", "UMLS:C9999999", "acetylsalicylic acid"),
         ("zzz totally unrelated", "UMLS:C0000001", "completely different label")],
        "norm_key string, candidate_id string, label string",
    )
    out = {r["norm_key"]: (r["candidate_id"], r["similarity"])
           for r in rerank_authority_candidates(terms, cands).collect()}
    assert out["acetylsalicylic acid"][0] == "UMLS:C9999999"   # exact label wins
    assert abs(out["acetylsalicylic acid"][1] - 1.0) < 1e-9
    assert "zzz totally unrelated" not in out                  # below threshold → dropped

    # deterministic tie-break: identical labels → smallest candidate id
    tie = spark.createDataFrame(
        [("k", "UMLS:C2", "same label"), ("k", "UMLS:C1", "same label")],
        "norm_key string, candidate_id string, label string",
    )
    t = spark.createDataFrame([("k", "same label")], "norm_key string, text string")
    got = rerank_authority_candidates(t, tie).collect()
    assert len(got) == 1 and got[0]["candidate_id"] == "UMLS:C1"


def test_multimodal_resize_contract(spark):
    """Resize plumbing: binary→binary with rewritten metadata, deterministic
    across runs, target-sized payloads, and an error path for non-images
    and empty payloads."""
    from kgraph_spark.operators.multimodal import resize_images

    assets = spark.createDataFrame(
        [("m1", "image", b"rawbytes-1", 64, 64, None),
         ("m2", "image", b"", 64, 64, None),            # empty → resize_ok False
         ("m3", "audio", b"pcm", None, None, 2000)],    # wrong type → False
        "media_ref string, media_type string, content binary, "
        "width int, height int, duration_ms int",
    )
    out = {r["media_ref"]: r for r in resize_images(assets, 8, 4).collect()}
    assert out["m1"]["resize_ok"] and len(out["m1"]["content"]) == 32
    assert (out["m1"]["width"], out["m1"]["height"]) == (8, 4)
    assert not out["m2"]["resize_ok"] and out["m2"]["content"] is None
    assert not out["m3"]["resize_ok"] and out["m3"]["width"] is None
    # deterministic: identical input bytes → identical resized bytes
    again = {r["media_ref"]: r for r in resize_images(assets, 8, 4).collect()}
    assert again["m1"]["content"] == out["m1"]["content"]


def test_repetition_stats_edges(spark):
    """Repeated-token docs score high; unique docs score 0; docs shorter
    than the gram width neither crash (slice start must stay >= 1) nor
    emit a gram fraction."""
    from kgraph_spark.operators.text_analysis import repetition_stats

    docs = spark.createDataFrame(
        [(1, "spam spam spam spam spam spam"),
         (2, "all tokens here are unique words"),
         (3, "tiny doc"),          # < 3 tokens → dup_3gram_frac 0.0
         (4, "a b a b a b a b")],  # alternating: grams 'a b a'/'b a b' repeat
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert out[1]["dup_word_frac"] == round(1 - 1 / 6, 6)
    assert out[1]["dup_3gram_frac"] == round(1 - 1 / 4, 6)
    assert out[2]["dup_word_frac"] == 0.0 and out[2]["dup_3gram_frac"] == 0.0
    assert out[3]["dup_3gram_frac"] == 0.0 and out[3]["n_tokens"] == 2
    assert out[4]["dup_word_frac"] == round(1 - 2 / 8, 6)
    assert out[4]["dup_3gram_frac"] == round(1 - 2 / 6, 6)


def test_incremental_near_dup_rejects_band_overrun(spark):
    """bands*rows_per_band > num_hashes would slice every band key to []
    and bucket the whole corpus together — rejected loudly."""
    import pytest

    from kgraph_spark.operators.dedup_text import incremental_near_dup

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="num_hashes"):
        incremental_near_dup(docs, docs, num_hashes=32)


def test_lsh_against_fallback_path_equal(spark):
    """broadcast_max_pairs=0 forces the shuffle-join fallback; candidate
    scores must be identical to the broadcast path."""
    from kgraph_spark.operators.dedup_text import (
        lsh_candidate_pairs_against,
        minhash_signatures,
        shingles,
    )

    base = " ".join(f"tok{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, base), (2, base.replace("tok5 ", "tok5x ")), (10, base), (11, "x y z " * 20)],
        "doc_id long, text string",
    )
    new_sigs = minhash_signatures(shingles(docs.filter("doc_id < 10"), k=3))
    old_sigs = minhash_signatures(shingles(docs.filter("doc_id >= 10"), k=3))
    a = sorted(map(tuple, lsh_candidate_pairs_against(new_sigs, old_sigs).collect()))
    b = sorted(
        map(
            tuple,
            lsh_candidate_pairs_against(
                new_sigs, old_sigs, broadcast_max_pairs=0
            ).collect(),
        )
    )
    assert a == b and len(a) >= 1


# ---- fuzzy_name_join (deletion-neighborhood edit-distance-1 blocking) -----


def _fuzzy(spark, queries, names):
    from kgraph_spark.operators.resolve import fuzzy_name_join

    q = spark.createDataFrame(
        [(i, s) for i, s in enumerate(queries)], "query_id bigint, query string"
    )
    n = spark.createDataFrame([(s,) for s in names], "name string")
    return {
        r["query_id"]: (r["match_name"], r["distance"])
        for r in fuzzy_name_join(q, n).collect()
    }


def test_fuzzy_join_all_edit_kinds(spark):
    names = ["aspirin", "warfarin", "ibuprofen"]
    got = _fuzzy(
        spark,
        ["aspirin",    # exact → dist 0
         "asplrin",    # substitution
         "asprin",     # deletion (query shorter)
         "awspirin",   # insertion (query longer)
         "ibuprofenix"],  # distance 3 → no match
        names,
    )
    assert got[0] == ("aspirin", 0)
    assert got[1] == ("aspirin", 1)
    assert got[2] == ("aspirin", 1)
    assert got[3] == ("aspirin", 1)
    assert 4 not in got


def test_fuzzy_join_prefers_exact_then_lexicographic(spark):
    # "cat" is distance 1 from both "cap" and "car" → smallest name wins;
    # a dist-0 name beats any dist-1 name
    got = _fuzzy(spark, ["cat", "cap"], ["cap", "car"])
    assert got[0] == ("cap", 1)
    assert got[1] == ("cap", 0)


def test_fuzzy_join_empty_and_single_char(spark):
    got = _fuzzy(spark, ["", "x"], ["a", "ab"])
    assert got[0] == ("a", 1)   # "" → one insert
    assert got[1] == ("a", 1)   # substitution x→a; "ab" is dist 2
    # duplicate dictionary names collapse before the join
    got2 = _fuzzy(spark, ["cat"], ["cat", "cat"])
    assert got2[0] == ("cat", 0)


def test_fuzzy_join_no_cartesian(spark):
    from conftest import plan_text
    from kgraph_spark.operators.resolve import fuzzy_name_join

    q = spark.createDataFrame([(1, "abc")], "query_id bigint, query string")
    n = spark.createDataFrame([("abd",)], "name string")
    plan = plan_text(fuzzy_name_join(q, n))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_kg_diff_statuses(spark):
    from kgraph_spark.operators.relationships import kg_diff

    old = spark.createDataFrame(
        [("a", "r", "b", 0.7), ("a", "r", "c", 0.8), ("a", "r", "d", 0.9)],
        "subject_id string, predicate string, object_id string, confidence double",
    )
    new = spark.createDataFrame(
        [("a", "r", "b", 0.7), ("a", "r", "c", 0.85), ("a", "r", "e", 0.5)],
        "subject_id string, predicate string, object_id string, confidence double",
    )
    got = {r["object_id"]: r["status"] for r in kg_diff(old, new).collect()}
    assert got == {"b": "unchanged", "c": "changed", "d": "removed", "e": "added"}


def test_acronym_join_ambiguity_and_min_words(spark):
    from kgraph_spark.operators.resolve import acronym_join

    names = spark.createDataFrame(
        [("chronic myeloid leukemia",), ("cml media lab",), ("aspirin",)],
        "name string",
    )
    mentions = spark.createDataFrame([("CML",), ("ASA",)], "mention string")
    rows = acronym_join(mentions, names).collect()
    got = {(r["mention"], r["expansion"]) for r in rows}
    # both 3-word names spell CML; single-word 'aspirin' never indexes
    assert got == {("CML", "chronic myeloid leukemia"), ("CML", "cml media lab")}
    assert all(r["n_candidates"] == 2 for r in rows)


def test_triple_snapshot_asof(spark):
    from kgraph_spark.operators.relationships import triple_snapshot_asof

    import datetime as dt

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    log = spark.createDataFrame(
        [
            ("a", "p", "b", t(1), "upsert", 0.5),
            ("a", "p", "b", t(3), "upsert", 0.9),   # later update
            ("a", "p", "c", t(2), "upsert", 0.7),
            ("a", "p", "c", t(4), "delete", 0.0),   # deleted before the cut
            ("x", "p", "y", t(9), "upsert", 1.0),   # after the cut
        ],
        "subject_id string, predicate string, object_id string, ts timestamp,"
        " op string, confidence double",
    )
    snap = {
        (r["subject_id"], r["object_id"]): r
        for r in triple_snapshot_asof(log, t(5)).collect()
    }
    assert set(snap) == {("a", "b")}
    assert snap[("a", "b")]["confidence"] == 0.9
    # earlier cut sees both triples, first confidence
    snap2 = {
        (r["subject_id"], r["object_id"]): r["confidence"]
        for r in triple_snapshot_asof(log, t(2)).collect()
    }
    assert snap2 == {("a", "b"): 0.5, ("a", "c"): 0.7}
    # op column never leaks into the snapshot
    cols = triple_snapshot_asof(log, t(5)).columns
    assert "op" not in cols and "confidence" in cols


def test_predicate_profile(spark):
    from kgraph_spark.operators.relationships import predicate_profile

    t = spark.createDataFrame(
        [
            ("a", "born", "1990"), ("b", "born", "1990"),  # functional, not inverse
            ("a", "knows", "b"), ("a", "knows", "c"), ("b", "knows", "c"),
            ("a", "knows", "b"),  # duplicate triple must not inflate counts
        ],
        "subject_id string, predicate string, object_id string",
    )
    rows = {r["predicate"]: r for r in predicate_profile(t).collect()}
    born = rows["born"]
    assert born["n_triples"] == 2 and born["n_subjects"] == 2 and born["n_objects"] == 1
    assert born["is_functional"] and not born["is_inverse_functional"]
    assert born["functionality"] == 1.0 and born["inverse_functionality"] == 2.0
    knows = rows["knows"]
    assert knows["n_triples"] == 3
    assert not knows["is_functional"]  # a has two objects
    assert knows["functionality"] == 1.5


def test_prefix_filter_exact_recall_vs_uncapped(spark):
    """The lossless claim: prefix-filtered pairs == the uncapped inverted-
    index join at the same threshold, on a corpus with hot shingles."""
    from pyspark.sql import functions as F
    from kgraph_spark.operators.dedup_text import (
        ngram_jaccard_pairs,
        prefix_filter_pairs,
        shingles,
    )

    texts = []
    for i in range(30):
        base = f"alpha beta gamma delta epsilon zeta token{i % 7} token{i % 5}"
        texts.append((i, base if i % 3 else base + f" extra{i}"))
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    sh = shingles(docs, k=3)
    got = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in prefix_filter_pairs(sh, 1, 2).collect()
    }
    want = {
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 6))
        for r in ngram_jaccard_pairs(sh, min_jaccard=0.5, max_shingle_df=None).collect()
    }
    assert got == want and len(got) > 0


def test_prefix_filter_identical_docs_and_validation(spark):
    import pytest
    from kgraph_spark.operators.dedup_text import prefix_filter_pairs, shingles

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f"), (3, "x y z w v u")],
        "doc_id long, text string",
    )
    sh = shingles(docs, k=3)
    rows = prefix_filter_pairs(sh, 9, 10).collect()
    assert [(r["doc_a"], r["doc_b"], r["jaccard"]) for r in rows] == [(1, 2, 1.0)]
    with pytest.raises(ValueError):
        prefix_filter_pairs(sh, 0, 10)
    with pytest.raises(ValueError):
        prefix_filter_pairs(sh, 11, 10)


def test_predicate_composition_paths_and_cap(spark):
    from kgraph_spark.operators.relationships import predicate_composition

    t = spark.createDataFrame(
        [
            ("g1", "codes", "p1"), ("g2", "codes", "p1"),
            ("p1", "targets", "d1"), ("p1", "targets", "d2"),
            ("d1", "treats", "x1"),
        ],
        "subject_id string, predicate string, object_id string",
    )
    rows = {(r["p1"], r["p2"]): r for r in predicate_composition(t).collect()}
    # codes->targets through p1: 2 in-edges x 2 out-edges = 4 paths, 1 mid
    assert rows[("codes", "targets")]["n_paths"] == 4
    assert rows[("codes", "targets")]["n_mid_nodes"] == 1
    assert rows[("targets", "treats")]["n_paths"] == 1
    # degree cap drops the p1 hub entirely (in-degree 2 > 1)
    capped = {
        (r["p1"], r["p2"]): r["n_paths"]
        for r in predicate_composition(t, max_node_degree=1).collect()
    }
    assert ("codes", "targets") not in capped
    assert capped[("targets", "treats")] == 1


def test_incremental_components_equals_scratch(spark):
    from kgraph_spark.operators.canonicalize import incremental_components

    old = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("x", "y"), ("p", "q")], "src string, dst string"
    )
    # delta: bridge two old components, attach a brand-new node, and one
    # edge entirely between unseen nodes
    delta = spark.createDataFrame(
        [("d", "c"), ("x", "p"), ("m", "n")], "src string, dst string"
    )
    inc = {
        r["id"]: r["component"]
        for r in incremental_components(connected_components(old), delta).collect()
    }
    scratch = {
        r["id"]: r["component"]
        for r in connected_components(old.union(delta)).collect()
    }
    assert inc == scratch
    assert inc["d"] == "a" and inc["x"] == "p" and inc["m"] == "m"


def test_incremental_components_noop_delta_keeps_mapping(spark):
    from kgraph_spark.operators.canonicalize import incremental_components

    old = spark.createDataFrame([("b", "a"), ("y", "x")], "src string, dst string")
    base = connected_components(old)
    # delta edges inside existing components: nothing merges
    delta = spark.createDataFrame([("a", "b")], "src string, dst string")
    inc = {r["id"]: r["component"] for r in incremental_components(base, delta).collect()}
    assert inc == {"a": "a", "b": "a", "x": "x", "y": "x"}


def test_sorted_neighborhood_pairs_hand_case(spark):
    from kgraph_spark.operators.dedup_text import sorted_neighborhood_pairs

    recs = spark.createDataFrame(
        [(1, "smith"), (2, "smyth"), (3, "adams"), (4, "adamz"), (5, "smith")],
        "doc_id long, name string",
    )
    # sort order by (name, id): adams(3), adamz(4), smith(1), smith(5), smyth(2)
    out = sorted_neighborhood_pairs(recs, "name", window=2)
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert pairs == {(3, 4), (4, 1), (1, 5), (5, 2)}
    # window=3 adds the distance-2 neighbors
    out3 = sorted_neighborhood_pairs(recs, "name", window=3)
    rows = {(r["id_a"], r["id_b"]): r["rank_distance"] for r in out3.collect()}
    assert rows[(3, 1)] == 2 and rows[(1, 2)] == 2 and rows[(3, 4)] == 1
    # candidate count is skew-independent: (n-1) + (n-2)
    assert len(rows) == 4 + 3


def test_sorted_neighborhood_window_validation(spark):
    import pytest as _pytest

    from kgraph_spark.operators.dedup_text import sorted_neighborhood_pairs

    recs = spark.createDataFrame([(1, "a")], "doc_id long, name string")
    with _pytest.raises(ValueError):
        sorted_neighborhood_pairs(recs, "name", window=1)


def test_conflicting_triples_detects_polarity_clash(spark):
    from kgraph_spark.operators.relationships import conflicting_triples

    triples = spark.createDataFrame(
        [
            ("d1", "TREATS", "x"), ("d1", "TREATS", "x"), ("d1", "CAUSES", "x"),
            ("d2", "TREATS", "y"),                       # no clash
            ("d3", "CAUSES", "z"),                       # no clash
            ("d4", "ASSOCIATED_WITH", "x"),              # not in dictionary
        ],
        "subject_id string, predicate string, object_id string",
    )
    out = conflicting_triples(triples, [("TREATS", "CAUSES")]).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["subject_id"], r["object_id"]) == ("d1", "x")
    assert r["pred_a"] == "TREATS" and r["pred_b"] == "CAUSES"
    assert r["n_a"] == 2 and r["n_b"] == 1


def test_conflicting_triples_empty_dictionary_rejected(spark):
    import pytest as _pytest

    from kgraph_spark.operators.relationships import conflicting_triples

    t = spark.createDataFrame([("a", "P", "b")], "subject_id string, predicate string, object_id string")
    with _pytest.raises(ValueError):
        conflicting_triples(t, [])


def test_component_attribute_audit_hand_case(spark):
    from kgraph_spark.operators.canonicalize import component_attribute_audit

    mapping = spark.createDataFrame(
        [("a", "c1"), ("b", "c1"), ("c", "c1"), ("d", "c2"), ("e", "c2")],
        "id string, component string",
    )
    # c1: two members agree on X, one has no attribute → not conflicted;
    # c2: members disagree (X vs Y) → conflicted; NULL attr never conflicts
    attrs = spark.createDataFrame(
        [("a", "X"), ("b", "X"), ("c", None), ("d", "X"), ("e", "Y")],
        "id string, cls string",
    )
    rows = {r["component"]: r for r in
            component_attribute_audit(mapping, attrs, "cls").collect()}
    c1, c2 = rows["c1"], rows["c2"]
    assert c1["n_members"] == 3 and c1["n_with_attr"] == 2
    assert c1["n_distinct_attr"] == 1 and not c1["is_conflicted"]
    assert c1["attr_min"] == "X" and c1["attr_max"] == "X"
    assert c2["n_distinct_attr"] == 2 and c2["is_conflicted"]
    assert c2["attr_min"] == "X" and c2["attr_max"] == "Y"


def test_rule_confidence_hand_case(spark):
    from kgraph_spark.operators.relationships import rule_confidence

    # body p∘q pairs: (a,c),(a,d) via b plus (e,c),(e,d) via b — head r
    # closes only (a,c); duplicate path (a,b) asserted twice must not
    # inflate body_support; e never asserts r, so the PCA denominator
    # keeps only a's two bodies
    triples = spark.createDataFrame(
        [
            ("a", "p", "b"), ("a", "p", "b"), ("e", "p", "b"),
            ("b", "q", "c"), ("b", "q", "d"),
            ("a", "r", "c"),
        ],
        "subject_id string, predicate string, object_id string",
    )
    rows = {(r["p1"], r["p2"], r["p3"]): r
            for r in rule_confidence(triples).collect()}
    # p∘q ⇒ r: bodies {(a,c),(a,d),(e,c),(e,d)}, closed {(a,c)} → 1/4;
    # PCA: only x=a asserts r → denominator 2 → 1/2
    r1 = rows[("p", "q", "r")]
    assert r1["body_support"] == 4 and r1["support"] == 1
    assert r1["pca_body_support"] == 2
    assert r1["confidence"] == 0.25
    assert r1["pca_confidence"] == 0.5
    assert set(rows) == {("p", "q", "r")}


def test_rule_confidence_degree_cap(spark):
    from kgraph_spark.operators.relationships import rule_confidence

    # hub mid node b exceeds the cap → no bodies survive
    triples = spark.createDataFrame(
        [("a", "p", "b"), ("b", "q", "c"), ("b", "q", "d"), ("a", "r", "c")],
        "subject_id string, predicate string, object_id string",
    )
    assert rule_confidence(triples, max_node_degree=1).count() == 0
    assert rule_confidence(triples, max_node_degree=None).count() == 1


def test_phash_near_dups_hand_case(spark):
    from kgraph_spark.operators.multimodal import phash_near_dups

    # A: flat grid -> all bits 0. B: one hot cell -> exactly 1 bit set
    # (shares 3 of 4 bands with A -> pigeonhole finds it, hamming 1).
    # C: alternating 0/255 -> bands 0xAAAA, no band shared with A or B.
    flat = [100] * 64
    hot = [228] + [100] * 63
    alt = [0, 255] * 32
    df = spark.createDataFrame(
        [("A", flat), ("B", hot), ("C", alt)],
        "media_ref string, grid array<int>",
    )
    rows = phash_near_dups(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["ref_a"], r["ref_b"], r["hamming"]) == ("A", "B", 1)
    # exact duplicate detected at hamming 0
    df2 = spark.createDataFrame(
        [("X", flat), ("Y", list(flat))], "media_ref string, grid array<int>"
    )
    r2 = phash_near_dups(df2).collect()
    assert len(r2) == 1 and r2[0]["hamming"] == 0


def test_simhash_hot_chunk_cap_degenerate_cluster(spark):
    """A degenerate all-identical-hash cluster must stay LINEAR under the
    hot-chunk cap: no candidate pairs from buckets hotter than max_chunk_df,
    while rare-bucket near-dups are still found (recall contract)."""
    from conftest import plan_text
    from kgraph_spark.operators.dedup_text import simhash, simhash_near_dups

    base = " ".join(f"tok{i % 40}" for i in range(400))
    near = base.replace("tok7", "tok7x", 1)
    rows = [(1, base), (2, near)] + [(i, "aaa bbb") for i in range(10, 30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = simhash(docs)

    capped = simhash_near_dups(sigs, max_hamming=3, max_chunk_df=5)
    got = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    assert (1, 2) in got                       # rare-bucket pair survives
    assert not any(a >= 10 for a, _ in got)    # hot cluster emits ZERO pairs

    # plan: the cap is a LeftSemi prune before the self-join, not a post-filter
    assert "LeftSemi" in plan_text(capped)

    # uncapped twin: the same cluster is quadratic (20 docs -> 190 pairs)
    unc = {(r["doc_a"], r["doc_b"])
           for r in simhash_near_dups(sigs, max_hamming=3, max_chunk_df=None).collect()}
    assert sum(1 for a, b in unc if a >= 10 and b >= 10) == 190


def test_phash_hot_band_cap_degenerate_cluster(spark):
    """Flat/uniform images (all-zero aHash) pile into one band bucket; the
    hot-band cap keeps that population linear while rare-band near-dup
    pairs are unaffected."""
    from conftest import plan_text
    from kgraph_spark.operators.multimodal import phash_near_dups

    flat = [100] * 64
    hot = [228] + [100] * 63
    alt = [0, 255] * 32
    rows = [("A", flat), ("B", hot)] + [(f"Z{i:02d}", list(alt)) for i in range(20)]
    df = spark.createDataFrame(rows, "media_ref string, grid array<int>")

    capped = phash_near_dups(df, max_band_df=5)
    got = {(r["ref_a"], r["ref_b"]) for r in capped.collect()}
    assert got == {("A", "B")}                 # cluster emits ZERO pairs
    assert "LeftSemi" in plan_text(capped)

    unc = phash_near_dups(df, max_band_df=None).collect()
    assert sum(1 for r in unc if r["ref_a"].startswith("Z") and r["ref_b"].startswith("Z")) == 190


def test_aspect_bucket_plan_hand_case(spark):
    """Exact-integer assignment: a square image lands in the 1024x1024
    bucket; a 2:1 panorama in 1344x768 (ln 1.75 is nearer ln 2 than
    ln 2.4 — and the integer cross-product metric agrees); the mirrored
    portrait in 768x1344; batch math splits 65 -> 1 full + 1 remainder."""
    from kgraph_spark.operators.multimodal import aspect_bucket_plan

    rows = [(512, 512)] * 65 + [(1200, 600)] * 3 + [(600, 1200)] * 2
    df = spark.createDataFrame(rows, "width int, height int")
    out = {(r["bucket_w"], r["bucket_h"]): r for r in aspect_bucket_plan(df, batch_size=64).collect()}
    assert set(out) == {(1024, 1024), (1344, 768), (768, 1344)}
    sq = out[(1024, 1024)]
    assert sq["n_images"] == 65 and sq["n_full_batches"] == 1 and sq["remainder"] == 1
    assert out[(1344, 768)]["n_images"] == 3
    assert out[(768, 1344)]["n_images"] == 2
