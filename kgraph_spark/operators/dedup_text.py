"""Document deduplication family for training-data pipelines.

Exact (hash groupBy), MinHash+LSH banding, SimHash, and n-gram Jaccard —
the standard near-duplicate stack for web-scale corpus cleaning. All are
expressed so the heavy lifting stays in JVM expressions or one bounded
self-join on LSH bucket keys (never an O(n²) cross join).

At 100 TB: exact dedup is one shuffle on a 16-byte digest; MinHash banding
turns near-dup detection into groupBy(band_hash) with bounded bucket sizes;
pair verification only runs inside buckets."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Content-hash groups: (content_hash, canonical_doc_id=min id, n_dups).
    One shuffle on the digest; map-side partial agg."""
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("canonical_doc_id"), F.count("*").alias("n_docs"))
    )


def shingles(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    dedupe: bool = True,
) -> DataFrame:
    """(doc_id, shingle) word k-gram shingle set (documents shorter than k
    tokens contribute their whole token run as one shingle, matching the
    SQL oracles).

    Text is trimmed before splitting: an untrimmed leading/trailing
    whitespace would otherwise inject an empty token and shift every
    k-gram (and diverge from the SQL oracles, which tokenize with
    string_split_regex(trim(text))).

    Built as posexplode + a lag chain instead of `transform(idx, i ->
    slice(toks, i+1, k))`: Spark re-evaluates a higher-order function's
    argument subtree per element, so the toks subtree (a regex split)
    re-ran ~n times per document — measured 3.8 s → 1.2 s at sf0.1 for
    the window form, identical output relation. The k-gram assembly costs
    one window shuffle + one distinct; the set contract (one row per
    (doc, shingle)) is what downstream Jaccard intersection counts rely
    on. `dedupe=False` skips that distinct's shuffle for consumers that
    are duplicate-insensitive (MIN-aggregating MinHash signatures,
    count_distinct decontamination) — same downstream results, one fewer
    exchange.

    The window partitions on a per-ROW id, not doc_id: duplicate doc_id
    rows (a re-ingested snapshot — plausible input for a dedup module)
    must shingle independently like the old per-row transform did, never
    interleave their tokens. Short documents are handled inside the same
    pass: concat_ws skips the null lags, so the row at the LAST position
    of a <k-token document carries the whole token run — no second scan
    of the corpus."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # the row id MUST be assigned before the explode (own projection —
    # nondeterministic exprs don't collapse): inside the generator select
    # it would evaluate per exploded row, one window partition per token
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.monotonically_increasing_id().alias("_rid"),
        toks.alias("_toks"),
    )
    ex = base.select(
        "doc_id",
        "_rid",
        F.size("_toks").alias("_n"),
        F.posexplode("_toks").alias("_p", "_t"),
    )
    w = Window.partitionBy("_rid").orderBy("_p")
    lags = [F.lag("_t", j).over(w) for j in range(k - 1, 0, -1)]
    if lags:
        keep = lags[0].isNotNull() | (
            (F.col("_n") < k) & (F.col("_p") == F.col("_n") - 1)
        )
    else:  # k == 1: every token is a shingle
        keep = F.lit(True)
    out = (
        ex.select(
            "doc_id",
            F.concat_ws(" ", *lags, F.col("_t")).alias("shingle"),
            keep.alias("_keep"),
        )
        .filter(F.col("_keep"))
        .select("doc_id", "shingle")
        .filter(F.length("shingle") > 0)
    )
    return out.distinct() if dedupe else out


def minhash_signatures(sh: DataFrame, num_hashes: int = 64, hash_fn: str = "xxhash64") -> DataFrame:
    """(doc_id, sig) — ONE groupBy(doc_id) carrying num_hashes min-aggregate
    expressions: no row blowup, a single map-side-combining shuffle.

    (The round-1 form posexploded 64 hashes per shingle through two shuffles
    — 64× row amplification, 12.2s at sf0.1 and the top non-pipeline cost;
    this form computes the same signature with zero amplification.)

    hash_fn:
      * 'xxhash64' (default): sig[i] = min(xxhash64(shingle, seed=i)),
        array<bigint> — the fast JVM path for production runs.
      * 'md5': sig[i] = min(md5(shingle || '#i')) as a 32-char hex string —
        lexicographic min == numeric min for fixed-width hex, and md5 is
        bit-identical across Spark and DuckDB, so the driver's oracle can
        recompute the full signature in SQL (cross-engine verifiability).
    """
    if hash_fn == "md5":
        aggs = [
            F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#{i}")))).alias(f"_h{i}")
            for i in range(num_hashes)
        ]
    else:
        aggs = [
            F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"_h{i}")
            for i in range(num_hashes)
        ]
    per = sh.groupBy("doc_id").agg(*aggs)
    return per.select(
        "doc_id", F.array(*[F.col(f"_h{i}") for i in range(num_hashes)]).alias("sig")
    )


def lsh_candidate_pairs(sigs: DataFrame, bands: int = 16, rows_per_band: int = 4) -> DataFrame:
    """Band the signature, bucket-join within bands → candidate pairs with
    estimated Jaccard (fraction of matching minhash components).

    The self-join key is (band_idx, band_hash): bucket sizes are bounded by
    similarity structure, never the corpus size — this is the scale path
    (an O(n²) cosine/jaccard cross join is the anti-pattern the reference
    itself warns about, kgraph/ingest.py:877-880).

    Shuffle discipline: the band self-join and the candidate dedup move doc
    IDS ONLY — a pair colliding in several bands would otherwise push its
    2×num_hashes-long signatures (~1 KB/row) through the distinct() once
    per collision. The two signatures are joined back AFTER the 16-byte
    (doc_a, doc_b) dedup; each re-join key is unique on the sigs side, so
    there is no row blowup and each signature crosses the wire once per
    surviving pair."""
    banded = _banded(sigs, bands, rows_per_band)
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    pairs = (
        pairs.join(sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a")), "doc_a")
        .join(sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b")), "doc_b")
    )
    matches = F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
    return pairs.select(
        "doc_a", "doc_b", (matches / F.size("sig_a")).alias("est_jaccard")
    )


def _banded(sigs: DataFrame, bands: int, rows_per_band: int) -> DataFrame:
    """(doc_id, band_idx, band_hash) — the LSH banding projection shared by
    the symmetric self-join and the asymmetric new-vs-history probe."""
    return sigs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(",", F.transform(F.slice("sig", b * rows_per_band + 1, rows_per_band), lambda v: v.cast("string"))),
                    b,
                ),
            )
        ).alias("band_idx", "band_hash"),
    )


def lsh_candidate_pairs_against(
    new_sigs: DataFrame,
    old_sigs: DataFrame,
    bands: int = 16,
    rows_per_band: int = 4,
    broadcast_max_pairs: int = 5_000_000,
) -> DataFrame:
    """Asymmetric LSH: near-dup candidates of NEW documents against a
    HISTORICAL signature table — the fuzzy twin of incremental_dedup
    (corpus_curation.py). Returns (doc_id, old_doc_id, est_jaccard), one
    row per (new, old) candidate pair.

    Shuffle discipline: the snapshot is orders of magnitude below the
    history, so the joins stream the OLD side against BROADCAST new-side
    data: banded new rows, then the deduped ID-ONLY candidate pairs (16
    bytes/row — the old signature attaches on the streamed side, and the
    pair+sig_old rows then probe a broadcast of the new signatures, so
    pair-sized data is never broadcast WITH a signature attached). The
    historical table is scanned, never shuffled, never a build side; at
    100 TB you persist `minhash_signatures(old)` once (bucketed by doc_id)
    and pay only the banding projection per snapshot.

    A candidate-pair set too big to broadcast even ids-only — boilerplate
    snapshots colliding with much of the history — falls back to plain
    shuffle joins past `broadcast_max_pairs` (costs one extra count
    action; the honest cost when the pair set really is corpus-sized)."""
    from pyspark.sql.functions import broadcast

    new_banded = _banded(new_sigs, bands, rows_per_band)
    old_banded = _banded(old_sigs, bands, rows_per_band).select(
        F.col("doc_id").alias("old_doc_id"), "band_idx", "band_hash"
    )
    pairs = (
        old_banded.join(broadcast(new_banded), ["band_idx", "band_hash"])
        .select("doc_id", "old_doc_id")
        .distinct()
    )
    small = pairs.limit(broadcast_max_pairs + 1).count() <= broadcast_max_pairs
    hint = broadcast if small else (lambda df: df)
    olds = old_sigs.select(F.col("doc_id").alias("old_doc_id"), F.col("sig").alias("sig_old"))
    with_old = olds.join(hint(pairs), "old_doc_id")
    both = with_old.join(
        hint(new_sigs.select("doc_id", F.col("sig").alias("sig_new"))), "doc_id"
    )
    matches = F.size(F.filter(F.zip_with("sig_new", "sig_old", lambda x, y: x == y), lambda v: v))
    return both.select(
        "doc_id", "old_doc_id", (matches / F.size("sig_new")).alias("est_jaccard")
    )


def incremental_near_dup(
    new_docs: DataFrame,
    old_docs: DataFrame,
    threshold: float = 0.5,
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    rows_per_band: int = 4,
    hash_fn: str = "xxhash64",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-NEW-document verdict against the historical corpus: one row per
    new document — (doc_id, near_dup, matched_old, est_jaccard) where
    near_dup says some historical document estimates ≥ threshold and
    (matched_old, est_jaccard) is the deterministic best match (max est,
    then smallest old id; NULLs for clean documents). The incremental form
    of near_dup_keep_best's detection stage: yesterday's corpus is already
    deduped, so only new×old pairs need scoring — new×new is a separate
    intra-snapshot pass (lsh_candidate_pairs)."""
    if bands * rows_per_band > num_hashes:
        raise ValueError(
            f"bands*rows_per_band ({bands}*{rows_per_band}) exceeds num_hashes "
            f"({num_hashes}): out-of-range bands would slice to [] and hash "
            f"every document into one universal bucket (all-pairs blowup)"
        )
    if id_col != "doc_id":
        new_docs = new_docs.withColumnRenamed(id_col, "doc_id")
        old_docs = old_docs.withColumnRenamed(id_col, "doc_id")
    new_sigs = minhash_signatures(
        shingles(new_docs, text_col=text_col, k=k, dedupe=False), num_hashes=num_hashes, hash_fn=hash_fn
    )
    old_sigs = minhash_signatures(
        shingles(old_docs, text_col=text_col, k=k, dedupe=False), num_hashes=num_hashes, hash_fn=hash_fn
    )
    cand = lsh_candidate_pairs_against(new_sigs, old_sigs, bands, rows_per_band).filter(
        F.col("est_jaccard") >= threshold
    )
    best = cand.groupBy("doc_id").agg(
        F.min(F.struct((-F.col("est_jaccard")).alias("ne"), F.col("old_doc_id").alias("oid"))).alias("_b")
    )
    from pyspark.sql.functions import broadcast

    return new_docs.select("doc_id").distinct().join(broadcast(best), "doc_id", "left").select(
        "doc_id",
        F.col("_b").isNotNull().alias("near_dup"),
        F.col("_b.oid").alias("matched_old"),
        (-F.col("_b.ne")).alias("est_jaccard"),
    )


def _pair_intersections(sh: DataFrame, max_shingle_df: int | None) -> DataFrame:
    """(doc_a, doc_b, inter) shared-shingle counts via the inverted index;
    with the df cap, candidate GENERATION uses rare shingles only and the
    exact count runs over the full sets of surviving pairs (each join key
    unique — no blowup). Shared by the symmetric Jaccard and the
    asymmetric containment operators."""
    a = sh.alias("a")
    b = sh.alias("b")
    if max_shingle_df is None:
        return (
            a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
            .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .agg(F.count("*").alias("inter"))
        )
    rare = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") <= max_shingle_df)
        .select("shingle")
    )
    rare_sh = sh.join(rare, "shingle", "left_semi")
    ra = rare_sh.alias("a")
    rb = rare_sh.alias("b")
    candidates = (
        ra.join(rb, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    return (
        candidates.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )


def containment_pairs(
    sh: DataFrame, min_containment: float = 0.8, max_shingle_df: int | None = 10_000
) -> DataFrame:
    """ASYMMETRIC shingle containment: c(A⊆B) = |A∩B| / |A| — the dedup
    measure Jaccard is blind to. A paragraph quoted verbatim inside a
    100×-longer page has Jaccard ≈ 0.01 but containment 1.0; C4/RefinedWeb
    -style curation drops (or attributes) such subset duplicates, and
    symmetric near-dup passes (minhash/jaccard) never surface them.

    Same inverted-index machinery and hot-shingle recall contract as
    ngram_jaccard_pairs (shared _pair_intersections); one extra sizes join
    and two divisions. Emits one row per unordered pair where EITHER
    direction clears min_containment, with both round-6 containments —
    the consumer picks direction (usually: drop the smaller doc)."""
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    inter = _pair_intersections(sh, max_shingle_df)
    c_ab = F.col("inter") / F.col("sz_a")
    c_ba = F.col("inter") / F.col("sz_b")
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .filter(F.greatest(c_ab, c_ba) >= min_containment)
        .select(
            "doc_a",
            "doc_b",
            F.col("inter").cast("long").alias("n_shared"),
            F.round(c_ab, 6).alias("containment_a_in_b"),
            F.round(c_ba, 6).alias("containment_b_in_a"),
        )
    )


def ngram_jaccard_pairs(
    sh: DataFrame, min_jaccard: float = 0.5, max_shingle_df: int | None = 10_000
) -> DataFrame:
    """Exact n-gram Jaccard via shingle inverted index (not cross join):
    join docs sharing a shingle → pair intersection counts → |A∩B| /
    (|A|+|B|-|A∩B|).

    Hot-shingle cap (max_shingle_df): one stopword-like shingle shared by k
    documents emits k²/2 candidate pairs, so candidate GENERATION only uses
    shingles with document frequency ≤ max_shingle_df; the Jaccard of every
    surviving pair is then computed EXACTLY over the full shingle sets
    (candidates ⨝ inverted index on (doc, shingle) — each join key is
    unique, so no blowup). Recall contract: a pair is missed only if every
    shingle it shares is hotter than the cap — for near-duplicates at
    jaccard ≥ 0.5 that requires the whole document to consist of corpus-
    hot shingles. Pass max_shingle_df=None for the uncapped single-join
    form (exact recall, AQE skew-join as the only hot-key defense)."""
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    inter = _pair_intersections(sh, max_shingle_df)
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
    )
    return out.filter(F.col("jaccard") >= min_jaccard).select("doc_a", "doc_b", "jaccard")


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """MOSS-style winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03) —
    passage-level document fingerprints: (doc_id, fp, pos).

    Positional word k-grams → 60-bit md5 hash per gram → in every window of
    `window` consecutive gram hashes select the minimum (ties → RIGHTMOST
    position, the classic rule that keeps selections stable under extension).
    Guarantee: any shared token run of length ≥ window+k-1 between two
    documents contributes at least one identical selected fingerprint;
    expected density of selections is 2/(window+1). This catches *copied
    passages* inside otherwise-different documents — the case whole-document
    MinHash/SimHash dilutes away.

    Tie-break without a struct: each gram is keyed by the sortable string
    `hex15(md5(gram)) ++ zero-padded (99999999 - pos)` — lexicographic min
    on fixed-width text == (min hash, max pos). md5 is bit-identical across
    engines, so the driver's DuckDB oracle recomputes selections exactly.
    (The 8-digit inverted position bounds a document at 10^8 k-grams —
    ~0.5 GB of text in one row, far past any sane per-document cap; split
    monster documents upstream before fingerprinting.)

    Scale: everything is per-row array expressions inside the scan stage —
    ZERO shuffle, no window function, no per-doc sort; a 100-TB corpus
    fingerprints in one map-only pass (the alternative posexplode +
    Window(partitionBy doc ORDER BY pos) form shuffles every gram of every
    document). Docs shorter than k tokens emit no rows; docs with fewer
    than `window` grams emit the single global-min fingerprint."""
    # STAGED projections, one array per select: higher-order lambdas
    # re-evaluate their argument subtree on every element, so an inlined
    # `hs` inside the window transform would recompute the whole O(n)
    # gram-hash array per window — O(n²) per row (measured 30s+ for 500
    # docs at sf0.1). Non-cheap aliases referenced across selects are NOT
    # collapsed by Catalyst (CollapseProject inlines only cheap exprs), so
    # each stage materializes once per row and the total stays O(n·w).
    toks = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != "")
    d = docs.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))

    n = F.size("_toks")
    gidx = F.when(n >= k, F.sequence(F.lit(0), n - k)).otherwise(
        F.array().cast("array<int>")
    )
    hs = F.transform(
        gidx,
        lambda i: F.concat(
            F.substring(F.md5(F.concat_ws(" ", F.slice("_toks", i + 1, k))), 1, 15),
            F.lpad((F.lit(99_999_999) - i).cast("string"), 8, "0"),
        ),
    )
    d = d.select("doc_id", hs.alias("_hs"))

    ng = F.size("_hs")
    widx = F.when(ng > 0, F.sequence(F.lit(0), F.greatest(ng - window, F.lit(0)))).otherwise(
        F.array().cast("array<int>")
    )
    sel = F.array_distinct(
        F.transform(widx, lambda j: F.array_min(F.slice("_hs", j + 1, window)))
    )
    return d.select("doc_id", F.explode(sel).alias("_s")).select(
        "doc_id",
        F.conv(F.substring("_s", 1, 15), 16, 10).cast("long").alias("fp"),
        (F.lit(99_999_999) - F.substring("_s", 16, 8).cast("long")).alias("pos"),
    )


def winnow_passage_pairs(
    fps: DataFrame, min_shared: int = 2, max_fp_df: int | None = 10_000
) -> DataFrame:
    """Cross-document shared-passage pairs over winnowed fingerprints:
    (doc_a, doc_b, shared_fps) for pairs sharing ≥ min_shared distinct
    selected fingerprints.

    Inverted-index self-join on the 8-byte fp — the same bounded-join shape
    as ngram_jaccard_pairs, never all-pairs. max_fp_df caps the document
    frequency of fingerprints used for pairing (a boilerplate passage shared
    by k docs would emit k²/2 pair rows; at the default cap that is bounded
    per fp and the survivors still pair on their rarer passages). Fingerprint
    sets are deduped per (doc, fp) BEFORE the join, so a passage repeated
    inside one document cannot multiply pair rows."""
    fpset = fps.select("doc_id", "fp").distinct()
    if max_fp_df is not None:
        rare = (
            fpset.groupBy("fp")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_fp_df)
            .select("fp")
        )
        fpset = fpset.join(rare, "fp", "left_semi")
    a = fpset.alias("a")
    b = fpset.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", hash_fn: str = "xxhash64") -> DataFrame:
    """SimHash over whitespace tokens: per-bit vote of token hashes.

    ONE groupBy(doc_id) carrying per-bit sum-aggregate expressions — no
    row blowup, a single map-side-combining shuffle (the round-1 form
    posexploded 64 votes per token through two shuffles).

    hash_fn:
      * 'xxhash64' (default): 64-bit token hash, fast JVM path.
      * 'md5': 60-bit hash from the first 15 hex digits of md5(token) —
        md5 is bit-identical across Spark and DuckDB, so the driver's
        oracle recomputes the full simhash in SQL (cross-engine check).
    """
    bits = 60 if hash_fn == "md5" else 64
    if hash_fn == "md5":
        # conv(15 hex chars) < 2^60 always fits in a signed long
        h = F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
    else:
        h = F.xxhash64(F.col("tok"))
    toks = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(F.split(F.col(text_col), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
        .withColumn("h", h)
    )
    vote_aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"_v{b}")
        for b in range(bits)
    ]
    per = toks.groupBy("doc_id").agg(*vote_aggs)
    packed = None
    for b in range(bits):
        # two's-complement literal for bit 63 (1<<63 overflows a signed long)
        w = (1 << b) if b < 63 else -(1 << 63)
        term = F.when(F.col(f"_v{b}") > 0, F.lit(w).cast("long")).otherwise(F.lit(0).cast("long"))
        packed = term if packed is None else packed + term
    return per.select("doc_id", packed.alias("simhash"))


def simhash_near_dups(
    sim: DataFrame,
    max_hamming: int = 3,
    prefix_bits: int = 16,
    bits: int = 64,
    max_chunk_df: int | None = 10_000,
) -> DataFrame:
    """Near-dup pairs by Hamming distance ≤ k, blocked on bits/prefix_bits
    disjoint chunks (pigeonhole: distance ≤ chunks-1 ⇒ at least one chunk
    equal), so the self-join is on chunk equality, never all-pairs.

    Hot-chunk cap (max_chunk_df): chunk cardinality is fixed at
    2^prefix_bits, so one degenerate value — near-empty docs hashing to
    the same simhash, a whole corpus slice sharing a 16-bit chunk — emits
    k²/2 candidates from a SINGLE bucket. Candidate generation therefore
    uses only (chunk_idx, chunk) keys with document frequency ≤
    max_chunk_df (the same recall contract as ngram_jaccard_pairs' hot-
    shingle cap): a true near-dup pair is missed only if EVERY one of its
    equal chunks is corpus-hot, which for hamming ≤ chunks−1 means the
    pair sits inside a ≥max_chunk_df-wide near-identical cluster — exactly
    the population exact dedup already collapses upstream. Pass
    max_chunk_df=None for the uncapped join (AQE skew handling only)."""
    chunks = sim.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), i * prefix_bits).bitwiseAND(F.lit((1 << prefix_bits) - 1))
                    for i in range(bits // prefix_bits)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    if max_chunk_df is not None:
        rare = (
            chunks.groupBy("chunk_idx", "chunk")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_chunk_df)
            .select("chunk_idx", "chunk")
        )
        chunks = chunks.join(rare, ["chunk_idx", "chunk"], "left_semi")
    a = chunks.alias("a")
    b = chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("h_a"),
            F.col("b.simhash").alias("h_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return cand.withColumn("hamming", ham).filter(F.col("hamming") <= max_hamming).select(
        "doc_a", "doc_b", "hamming"
    )


def prefix_filter_pairs(
    sh: DataFrame,
    t_num: int = 1,
    t_den: int = 2,
) -> DataFrame:
    """Exact-recall set-similarity join via PREFIX FILTERING (PPJoin,
    Xiao et al. 2008): pairs with shingle Jaccard ≥ t_num/t_den, found
    without a full inverted-index self-join. Under a common total order
    (df asc, shingle asc — rarest first, deterministic tie-break) any two
    sets with Jaccard ≥ t MUST share an element within their first
    |x| − ⌈t·|x|⌉ + 1 elements, so candidates come from self-joining the
    tiny PREFIX index only; exact Jaccard is then computed over the full
    sets of the survivors. Unlike ngram_jaccard_pairs' hot-shingle df cap
    (a recall CONTRACT), the prefix filter is RECALL-LOSSLESS — same
    answer as the uncapped join — while skipping the quadratic hot-token
    blowup by construction: a stopword shingle is almost never in anyone's
    prefix because rare tokens sort first.

    Integer discipline: prefix length uses ⌈t·sz⌉ = (t_num·sz + t_den − 1)
    div t_den — no float thresholds; the final Jaccard is one exact
    integer-ratio comparison (inter·t_den ≥ t_num·union) plus a round-6
    report column. Shuffles: one df aggregate, one doc-keyed window, the
    prefix self-join (rare keys by construction), one exact-count join."""
    if not 0 < t_num <= t_den:
        raise ValueError("need 0 < t_num <= t_den")
    from pyspark.sql import Window

    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    ordered = sh.join(dfreq, "shingle").withColumn(
        "_pos",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy(F.col("_df").asc(), F.col("shingle").asc())
        ),
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    pref = (
        ordered.join(sizes, "doc_id")
        .filter(
            F.col("_pos")
            <= F.col("sz") - F.expr(f"({t_num} * sz + {t_den} - 1) div {t_den}") + 1
        )
        .select("doc_id", "shingle")
    )
    pa = pref.alias("a")
    pb = pref.alias("b")
    candidates = (
        pa.join(
            pb,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        candidates.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn("_union", F.col("sz_a") + F.col("sz_b") - F.col("inter"))
        .filter(F.col("inter") * t_den >= F.lit(t_num) * F.col("_union"))
    )
    return out.select(
        "doc_a",
        "doc_b",
        F.col("inter").cast("long").alias("n_shared"),
        F.round(F.col("inter") / F.col("_union"), 6).alias("jaccard"),
    )


def sorted_neighborhood_pairs(
    records: DataFrame,
    key_col: str,
    id_col: str = "doc_id",
    window: int = 3,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández-Stolfo SNM): order records
    by a sort key, emit every pair within `window` positions — the classic
    record-linkage blocking strategy that is COMPLEMENTARY to LSH banding:
    typo'd keys that hash apart still sort adjacently, and a hot token
    can't explode a bucket because the candidate count is exactly
    (n − w + 1)·(w − 1) + C(w−1, 2) regardless of value skew.

    Execution has NO corpus-wide single-reducer window: the global rank in
    (key, id) order comes from `pack_sequences`' two-phase distributed
    prefix sum (budget=1 ⇒ seq_id == exact global row index). Pair
    generation is a (window−1)-way explode on the rank column joined back
    on rank equality — an equi-join on a dense unique integer key, so the
    exchange carries (id, key, rank) only and every join key matches at
    most one row. Total shuffle ≈ (w−1)·|records| rank probes.

    Returns (id_a, id_b, key_a, key_b, rank_distance) with id_a the
    lower-RANK record of the pair (replayable: rank order is (key, id)).

    At 100 TB: multi-pass SNM (different sort keys per pass — name,
    reversed name, phonetic key) is this operator called once per key with
    the pair sets unioned; the rank join stays ids-only either way."""
    if window < 2:
        raise ValueError("window must be >= 2")
    from kgraph_spark.operators.corpus_curation import pack_sequences

    keyed = records.select(
        F.col(id_col).alias("_id"), F.col(key_col).cast("string").alias("_key")
    ).withColumns({"_all": F.lit("all"), "_one": F.lit(1)})
    ranked = (
        pack_sequences(
            keyed,
            budget=1,
            weight_col="_one",
            stratum_col="_all",
            id_col="_id",
            order_col="_key",
        )
        .select(F.col("doc_id").alias("_id"), F.col("seq_id").alias("_rank"))
        .join(keyed.select("_id", "_key"), "_id")
        .localCheckpoint(eager=False)  # both pair sides read it; pin once
    )
    probes = ranked.select(
        F.col("_id").alias("id_a"),
        F.col("_key").alias("key_a"),
        F.col("_rank").alias("_rank_a"),
        F.explode(
            F.array(*[F.lit(d) for d in range(1, window)])
        ).alias("rank_distance"),
    ).withColumn("_rank_b", F.col("_rank_a") + F.col("rank_distance"))
    right = ranked.select(
        F.col("_id").alias("id_b"),
        F.col("_key").alias("key_b"),
        F.col("_rank").alias("_rank_b"),
    )
    return probes.join(right, "_rank_b").select(
        "id_a", "id_b", "key_a", "key_b", F.col("rank_distance").cast("int").alias("rank_distance")
    )


def near_dup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    rank_col: str = "_rank",
) -> DataFrame:
    """The dedup DECISION stage: verified near-dup pairs → connected
    components → one canonical survivor per cluster. This is what turns
    pair detection (MinHash / Jaccard / embedding) into "which rows to
    drop" for a training corpus (reference dedup semantics: one surviving
    record per duplicate group, best-attested wins —
    /root/reference/kgraph/dedup.py keep-best election).

    `docs` carries every document in scope plus a rank column (higher =
    better survivor; e.g. text length or a quality score); `pairs` is any
    verified (doc_a, doc_b) edge set. Canonical per cluster = max rank,
    ties to the smaller id. Docs in no pair are their own singleton
    cluster (keep = true), so the output is the COMPLETE per-doc verdict.

    Scale: clusters come from the vetted hash-to-min CC (iterations ~
    cluster diameter — near-dup clusters are shallow); the election is
    one min-of-struct aggregate on cluster_id; both joins are id-only."""
    from kgraph_spark.operators.canonicalize import connected_components

    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    labels = connected_components(edges)
    lab = (
        docs.select(F.col(id_col), F.col(rank_col).alias("_r"))
        .join(labels, docs[id_col] == labels["id"], "left")
        .select(
            F.col(id_col),
            F.col("_r"),
            F.coalesce(F.col("component"), F.col(id_col)).alias("cluster_id"),
        )
    )
    canon = (
        lab.groupBy("cluster_id")
        .agg(
            F.min(F.struct((-F.col("_r")).alias("_nr"), F.col(id_col).alias("_id"))).alias("_w")
        )
        .select("cluster_id", F.col("_w._id").alias("canonical_id"))
    )
    return lab.join(canon, "cluster_id").select(
        F.col(id_col),
        "cluster_id",
        "canonical_id",
        (F.col(id_col) == F.col("canonical_id")).alias("keep"),
    )


def cluster_cohesion(labels: DataFrame, pairs: DataFrame) -> DataFrame:
    """Transitive-merge QA: connected components chain A–B–C into one
    cluster even when (A, C) was never directly verified — this measures
    how much of each cluster is held together by transitivity alone.
    cohesion_micro = 10⁶ · n_direct_pairs ÷ C(m, 2); a large low-cohesion
    cluster is the classic hub-induced over-merge (one boilerplate doc
    gluing unrelated near-dup groups) a curation pass must re-split.

    labels: (doc_id, cluster_id); pairs: verified (doc_a, doc_b) edges.
    Multi-member clusters only (singletons have no pairs to audit).

    Scale: two id-only broadcast-or-hash joins to attach cluster ids to
    the pair list + two count aggregates on cluster_id. Nothing touches
    document content."""
    sizes = (
        labels.groupBy("cluster_id")
        .agg(F.count("*").cast("long").alias("n_members"))
        .filter(F.col("n_members") >= 2)
    )
    la = labels.select(F.col("doc_id").alias("doc_a"), F.col("cluster_id").alias("_ca"))
    lb = labels.select(F.col("doc_id").alias("doc_b"), F.col("cluster_id").alias("_cb"))
    direct = (
        pairs.join(la, "doc_a")
        .join(lb, "doc_b")
        .filter(F.col("_ca") == F.col("_cb"))
        .groupBy(F.col("_ca").alias("cluster_id"))
        .agg(F.count("*").cast("long").alias("n_direct_pairs"))
    )
    return (
        sizes.join(direct, "cluster_id", "left")
        .select(
            "cluster_id",
            "n_members",
            F.expr("n_members * (n_members - 1) div 2")
            .cast("long")
            .alias("n_possible_pairs"),
            F.coalesce(F.col("n_direct_pairs"), F.lit(0)).cast("long").alias("n_direct_pairs"),
        )
        .withColumn(
            "cohesion_micro",
            F.expr("1000000 * n_direct_pairs div n_possible_pairs"),
        )
    )
