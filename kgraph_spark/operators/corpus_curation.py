"""Corpus curation for training-data pipelines: near-dup cluster
keep-best election, deterministic stratified sampling, and benchmark
decontamination.

These extend the dedup family (operators/dedup_text.py) from *detecting*
duplicates to *acting* on them the way a 100-TB pretraining pipeline does:

* keep-best — near-dup candidate pairs → connected components → elect ONE
  keeper per cluster by a quality key. The cluster step reuses the D8
  hash-to-min CC operator (operators/canonicalize.py); pair generation
  reuses MinHash+LSH banding, so nothing here is O(n²) (the cross-join
  anti-pattern the reference itself warns about, kgraph/ingest.py:877-880).
* stratified sampling — per-stratum keep rates decided by a *content
  hash threshold*, not rand(): md5 is bit-identical across engines and
  runs, so the sample is reproducible, engine-portable (the DuckDB oracle
  recomputes it exactly), and resumable — re-running over a grown corpus
  keeps every previously-kept row. Map-only, zero shuffle.
* decontamination — flag training documents sharing any word k-gram with
  a benchmark/eval set. The benchmark shingle set is tiny relative to the
  corpus → broadcast inner/semi join; the corpus-side shingle explode is
  map-local and never collected.
* line-level dedup — C4-style: every exact duplicate line across the
  corpus survives only in its first (doc, position) occurrence; documents
  are reassembled from the surviving lines. Two narrow shuffles (16-byte
  line digest, then doc id) — the line TEXT itself is never the join key.
* PII scrubbing — email/IPv4/phone redaction with per-kind counts. Pure
  JVM regexp expressions, zero shuffle, survives in the scan stage.
* domain mixing — per-stratum keep rate derived from a token budget
  (rate = budget / stratum total), then the same md5-threshold Bernoulli
  keep rule as stratified sampling. Tiny per-stratum agg broadcast back;
  the corpus side stays map-only.
* deterministic shuffle — global training order by md5(id) with an exact
  global rank, via the same two-phase distributed prefix sum as packing
  (no single-reducer window over the corpus).

At 100 TB: keep-best shuffles candidate PAIRS (ids only) and the final
(doc → cluster) labels — both orders of magnitude below the corpus;
sampling is a pushed-down filter; decontamination is one broadcast join
over an exploded scan.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgraph_spark.operators.canonicalize import connected_components
from kgraph_spark.operators.dedup_text import shingles


def near_dup_keep_best(
    docs: DataFrame,
    pairs: DataFrame,
    quality_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cluster near-dup pairs and elect one keeper per cluster.

    docs: one row per document, must carry `id_col` and `quality_col`.
    pairs: (doc_a, doc_b) near-duplicate candidate pairs (already
    thresholded — e.g. lsh_candidate_pairs(...).filter(est_jaccard >= t)).

    Returns one row PER INPUT DOCUMENT:
      (doc_id, cluster_id, keeper_doc_id, keep)
    Singletons (documents in no pair) are their own cluster and keeper.
    Election is deterministic: max quality, then smallest id on ties —
    expressed as min(struct(-quality, id)) so it is one hash aggregation,
    no window shuffle over the full corpus.
    """
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    labels = connected_components(edges)  # (id, component) — clustered docs only
    base = docs.select(F.col(id_col).alias("doc_id"), F.col(quality_col).alias("_q"))
    clustered = base.join(labels, base["doc_id"] == labels["id"], "left").select(
        "doc_id",
        "_q",
        F.coalesce("component", F.col("doc_id")).alias("cluster_id"),
    )
    # null quality must LOSE the election (struct comparison would sort a
    # null field first and crown the null-quality doc): map it to +inf
    nq = F.coalesce((-F.col("_q")).cast("double"), F.lit(float("inf")))
    keepers = clustered.groupBy("cluster_id").agg(
        F.min(F.struct(nq.alias("nq"), F.col("doc_id").alias("id")))
        .getField("id")
        .alias("keeper_doc_id")
    )
    return clustered.join(keepers, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "keeper_doc_id",
        (F.col("doc_id") == F.col("keeper_doc_id")).alias("keep"),
    )


def _hex_threshold(rate: float, digits: int = 6) -> str:
    """Keep-fraction → fixed-width lowercase hex string such that
    `first-`digits`-of-md5 < threshold` keeps ~rate of uniformly-hashed
    keys. rate >= 1 returns a sentinel above every hex string."""
    if rate >= 1.0:
        return "g" * digits  # 'g' > 'f': compares above every hex digest
    n = round(rate * 16**digits)
    if n >= 16**digits:  # rate within rounding of 1.0: formatting it would
        return "g" * digits  # produce a 7-char string that sorts BELOW most
    return format(max(0, n), f"0{digits}x")  # 6-char digests (~6% kept)


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.0,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic per-stratum sampling by content-hash threshold.

    A row is kept iff the first 6 hex digits of md5(id || salt) compare
    below the stratum's threshold — lexicographic compare on fixed-width
    hex == numeric compare, and md5 is bit-identical everywhere, so the
    sample is reproducible across engines, runs, and corpus growth
    (Bernoulli per row: a kept row stays kept when new rows arrive —
    unlike rand()-based sampleBy). Map-only: no shuffle, survives in the
    scan stage's codegen span.
    """
    digest = F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 6)
    thr = F.lit(_hex_threshold(default_rate))
    for stratum, rate in sorted(rates.items()):
        thr = F.when(F.col(stratum_col) == stratum, F.lit(_hex_threshold(rate))).otherwise(thr)
    return docs.filter(digest < thr)


def pack_sequences(
    docs: DataFrame,
    budget: int,
    weight_col: str = "n_chars",
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    num_chunks: int | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Pack documents into fixed-budget training sequences (shards).

    Semantics: within each stratum, documents ordered by id form one
    contiguous token stream; a document is assigned to the sequence where
    it STARTS — seq_id = floor(start / budget), offset_in_seq = start %
    budget, where start = exclusive prefix sum of the weight column. This
    is the deterministic rule a pretraining shard-writer uses, and it is
    exactly one SQL window cumsum — which is how the oracle restates it.

    Execution is the two-phase distributed prefix sum, NOT a window
    partitioned by stratum: a per-stratum window puts an entire stratum in
    one reducer (a 60%-English 100-TB corpus would hit one task). Instead:
    range-partition by (stratum, id) → per-partition running sums in one
    Arrow pass (mapInPandas, stateful across batches) → per-(partition,
    stratum) totals (tiny) → exclusive prefix offsets over that tiny table
    → broadcast join back. No task ever holds more than one range chunk.

    Returns (doc_id, <stratum_col>, <weight_col>, seq_id, offset_in_seq);
    sequences are per-stratum (seq key = (stratum, seq_id)).

    order_col: optional extra sort key — the stream order becomes
    (stratum, order_col, id) instead of (stratum, id). Used by
    deterministic_shuffle to rank by hash order.
    """
    spark = docs.sparkSession
    n = num_chunks or spark.sparkContext.defaultParallelism * 2
    id_type = dict(docs.dtypes)[id_col]  # schema follows the real id type
    cols = [
        F.col(stratum_col).cast("string").alias("stratum"),
        F.col(id_col).alias("doc_id"),
        F.coalesce(F.col(weight_col).cast("long"), F.lit(0)).alias("w"),
    ]
    okeys = ["stratum", "doc_id"]
    schema = f"stratum string, doc_id {id_type}, w long, _pid int, _local_cum long"
    if order_col is not None:
        cols.append(F.col(order_col).cast("string").alias("_ord"))
        okeys = ["stratum", "_ord", "doc_id"]
        schema = (
            f"stratum string, doc_id {id_type}, w long, _ord string, "
            "_pid int, _local_cum long"
        )
    base = docs.select(*cols)
    part = (
        base.repartitionByRange(n, *okeys)
        .sortWithinPartitions(*okeys)
        .withColumn("_pid", F.spark_partition_id())
    )

    def local_cumsum(batches):
        state: dict[str, int] = {}
        for pdf in batches:
            cums = []
            for s, w in zip(pdf["stratum"], pdf["w"]):
                state[s] = state.get(s, 0) + int(w)
                cums.append(state[s])
            yield pdf.assign(_local_cum=cums)

    # pinned once (localCheckpoint, lazy): `local` feeds both the row side
    # and the totals side — without pinning, a non-reused range exchange
    # could resample boundaries and desynchronize _pid between the two
    local = part.mapInPandas(local_cumsum, schema).localCheckpoint(eager=False)

    from pyspark.sql import Window

    totals = local.groupBy("_pid", "stratum").agg(F.max("_local_cum").alias("_tot"))
    w_off = (
        Window.partitionBy("stratum")
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn("_off", F.coalesce(F.sum("_tot").over(w_off), F.lit(0)))
    start = F.col("_off") + F.col("_local_cum") - F.col("w")
    return (
        local.join(F.broadcast(offsets.select("_pid", "stratum", "_off")), ["_pid", "stratum"])
        .select(
            "doc_id",
            F.col("stratum").alias(stratum_col),
            F.col("w").alias(weight_col),
            F.floor(start / budget).cast("long").alias("seq_id"),
            (start % budget).cast("long").alias("offset_in_seq"),
        )
    )


def dedup_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_chars: int = 1,
) -> DataFrame:
    """C4-style corpus-wide line-level exact dedup.

    Split each document on newlines; a line whose trimmed length is
    >= min_line_chars participates in dedup and survives ONLY at its first
    occurrence across the whole corpus (min (doc, position)); shorter
    lines (e.g. blanks) are always kept. Documents are reassembled from
    surviving lines in original order.

    Returns one row per input document:
      (doc_id, text [reassembled], n_lines, n_lines_kept)

    Scale: the winner election groups by the 16-byte md5 line digest —
    line text never becomes a shuffle key — and reassembly shuffles the
    surviving (doc, pos, line) rows once on doc id. Both shuffles are
    bounded by the corpus line count; nothing is collected.
    """
    lines = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    elig = F.length(F.trim(F.col("line"))) >= min_line_chars
    keyed = lines.withColumn("_h", F.when(elig, F.md5(F.col("line"))))
    winners = (
        keyed.filter(F.col("_h").isNotNull())
        .groupBy("_h")
        .agg(
            F.min(F.struct(F.col("doc_id").alias("d"), F.col("pos").alias("p"))).alias("w")
        )
        .select("_h", F.col("w.d").alias("_wd"), F.col("w.p").alias("_wp"))
    )
    kept = (
        keyed.join(winners, "_h", "left")
        .filter(
            F.col("_h").isNull()
            | ((F.col("doc_id") == F.col("_wd")) & (F.col("pos") == F.col("_wp")))
        )
        .select("doc_id", "pos", "line")
    )
    totals = lines.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_lines"))
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))), lambda s: s["line"]
            ),
            "\n",
        ).alias("text"),
        F.count(F.lit(1)).alias("n_lines_kept"),
    )
    return totals.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        F.coalesce("text", F.lit("")).alias("text"),
        "n_lines",
        F.coalesce("n_lines_kept", F.lit(0)).alias("n_lines_kept"),
    )


# Redaction patterns chosen to mean the same thing under Java regex (Spark)
# and RE2 (DuckDB oracle): greedy character-class quantifiers only — no
# variable-length alternation where NFA leftmost-first and RE2
# leftmost-longest could disagree.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d\- ]{7,}\d", "<PHONE>"),
)


def scrub_pii(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Redact emails, IPv4 addresses, and international-format phone
    numbers; count each kind (counts are over the ORIGINAL text, replace
    is sequential email → ip → phone).

    Returns (doc_id, text [scrubbed], n_email, n_ipv4, n_phone). Map-only
    JVM regexp expressions — no shuffle, no Python; stays inside the scan
    stage's codegen span at any corpus size.
    """
    out = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    scrubbed = F.col("text")
    counts = []
    for name, pat, token in PII_PATTERNS:
        counts.append(
            F.regexp_count(F.col("text"), F.lit(pat)).cast("long").alias(f"n_{name}")
        )
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    return out.select("doc_id", scrubbed.alias("text"), *counts)


def domain_mix_sample(
    docs: DataFrame,
    budget: int,
    stratum_col: str = "lang",
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Token-budget domain mixing: keep each stratum at rate
    min(1, budget / stratum_weight_total) using the md5-threshold Bernoulli
    rule (deterministic, engine-portable — same family as
    stratified_sample, but the rates come FROM the data).

    The keep test compares the first 6 md5 hex digits of the id as a
    fraction of 16^6 against the stratum's rate — pure float compare, no
    rounding, so the DuckDB oracle reproduces it bit-for-bit.

    Scale: per-stratum totals are a partial-aggregated groupBy producing
    one row per stratum (broadcast back); the corpus side is one map-only
    filter. No driver collect.
    """
    totals = docs.groupBy(F.col(stratum_col).alias("_s")).agg(
        F.sum(F.col(weight_col).cast("long")).alias("_tot")
    )
    rates = totals.select(
        "_s", F.least(F.lit(1.0), F.lit(budget) / F.col("_tot")).alias("_rate")
    )
    frac = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 6
            ),
            16,
            10,
        ).cast("long")
        / F.lit(float(16**6))
    )
    return (
        docs.join(F.broadcast(rates), docs[stratum_col] == F.col("_s"))
        .filter(frac < F.col("_rate"))
        .drop("_s", "_rate")
    )


def deterministic_shuffle(
    docs: DataFrame,
    id_col: str = "doc_id",
    salt: str = "",
    num_chunks: int | None = None,
) -> DataFrame:
    """Global deterministic training-order shuffle: order the corpus by
    md5(id || salt) (id tie-break) and return each document's exact global
    rank. Changing the salt is a fresh epoch permutation; the same salt
    always reproduces the same order.

    Returns (doc_id, shuffle_rank). Rank is the exclusive prefix sum of 1
    over hash order — computed by pack_sequences' two-phase distributed
    prefix sum (budget=1 ⇒ seq_id == global row index), so no task ever
    holds more than one range chunk and there is no corpus-wide
    single-reducer window.
    """
    keyed = docs.select(F.col(id_col).alias("doc_id")).withColumns(
        {
            "_sk": F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(salt))),
            "_all": F.lit("all"),
            "_one": F.lit(1),
        }
    )
    packed = pack_sequences(
        keyed,
        budget=1,
        weight_col="_one",
        stratum_col="_all",
        id_col="doc_id",
        num_chunks=num_chunks,
        order_col="_sk",
    )
    return packed.select("doc_id", F.col("seq_id").alias("shuffle_rank"))


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    remove: bool = False,
) -> DataFrame:
    """Benchmark decontamination by word k-gram overlap.

    remove=False (audit mode): one row per CONTAMINATED training document —
      (doc_id, n_contaminated_shingles = distinct benchmark k-grams shared).
    remove=True: the cleaned corpus (docs minus contaminated ones), via a
      broadcast anti join.

    The benchmark side collapses to its distinct shingle set before the
    join — at real scale that set is millions of rows against a 100-TB
    corpus, so Spark broadcasts it and the corpus never shuffles; the
    per-doc count is a partial-aggregated groupBy on the (tiny) hit set.
    """
    bench_sh = shingles(benchmark, id_col=id_col, text_col=text_col, k=k, dedupe=False).select("shingle").distinct()
    # dedupe=False: both consumers below are duplicate-insensitive
    # (count_distinct / distinct doc ids) — skip the set shuffle
    doc_sh = shingles(docs, id_col=id_col, text_col=text_col, k=k, dedupe=False)
    if remove:
        dirty = doc_sh.join(F.broadcast(bench_sh), "shingle").select("doc_id").distinct()
        return docs.join(dirty, docs[id_col] == dirty["doc_id"], "left_anti")
    return (
        doc_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count_distinct("shingle").alias("n_contaminated_shingles"))
    )


# C0 control characters except \t \n \r — the crawl-cleaning strip set.
CONTROL_CHAR_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F]"


def normalize_text(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Crawl-style text normalization: strip C0 control characters (JVM
    regexp, keeps \\t \\n \\r), then Unicode NFC composition (ftfy-lite —
    decomposed accents, compatibility artifacts from PDF/OCR extraction).

    Returns (doc_id, text [normalized], changed). NFC runs in an
    Arrow-batched pandas UDF (Python's unicodedata is the reference NFC
    implementation; DuckDB's nfc_normalize agrees byte-for-byte, which is
    what the oracle checks). The strip stays JVM-side so the scan stage
    filters cheap cases before Arrow transfer; both steps are map-only —
    zero shuffle at any corpus size.
    """
    import pandas as pd  # noqa: F401 (type context for the UDF)

    @F.pandas_udf("string")
    def _nfc(s):
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    stripped = F.regexp_replace(F.col(text_col), CONTROL_CHAR_RE, "")
    out = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_orig"),
        _nfc(stripped).alias("text"),
    )
    return out.select(
        "doc_id",
        "text",
        # null-safe: a NULL-text row is "unchanged", not changed=NULL (which
        # a downstream filter(~changed) would silently drop)
        (~F.col("text").eqNullSafe(F.col("_orig"))).alias("changed"),
    )


def semantic_cluster_sample(
    items: DataFrame,
    centroids: list[tuple[int, list[float]]],
    per_cell: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "",
) -> DataFrame:
    """Cluster-stratified diversity sampling over an embedding column
    (the SemDeDup / cluster-balanced selection shape): assign every item to
    its nearest centroid cell, then keep at most `per_cell` items per cell,
    chosen by content-hash rank — deterministic and engine-portable (unlike
    rand()). NOT growth-stable: a rank cap means a new item hashing above an
    existing rank-`per_cell` item displaces it on the next run (displacement
    is confined to that item's cell); when kept-stays-kept matters more than
    an exact per-cell count, use stratified_sample's md5-THRESHOLD rule with
    `cell` as the stratum instead.

    Returns (id, cell, cell_size, rank) for the kept rows. cell_size is the
    pre-sampling cluster population — the caller's signal for rebalancing
    budgets across semantic regions.

    Scale: assignment is the IVF coarse-quantizer pass (operators/
    similarity.py assign_cells — per-row JVM expressions, map-only; swap in
    assign_cells_np for large nlist). The only shuffle keys on `cell`;
    cell count grows with the corpus under the usual nlist ≈ √n sizing, so
    cells are not a fixed-k skew hazard, and the per-cell sort behind
    row_number is bounded by quantizer granularity. Centroids come from
    deterministic_centroids / kmeans_refine (Lloyd) — k×dim driver-side,
    broadcast into the expression."""
    from pyspark.sql import Window

    from kgraph_spark.operators.similarity import assign_cells

    cells = assign_cells(items.select(F.col(id_col), F.col(vec_col)), centroids, vec_col)
    digest = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy("cell").orderBy(digest.asc(), F.col(id_col).asc())
    ranked = cells.select(
        F.col(id_col),
        "cell",
        F.count("*").over(Window.partitionBy("cell")).cast("long").alias("cell_size"),
        F.row_number().over(w).cast("long").alias("rank"),
    )
    return ranked.filter(F.col("rank") <= per_cell)


def _bloom_positions(digest_col, n_bits: int, n_hashes: int):
    """array<long> of Bloom bit positions for a digest column — k seeded
    xxhash64 values mod n_bits, computed JVM-side so the Python side only
    ever touches bit lookups."""
    return F.array(
        *[F.pmod(F.xxhash64(digest_col, F.lit(seed)), F.lit(n_bits)) for seed in range(n_hashes)]
    )


def build_bloom(
    hashes: DataFrame, col: str, n_bits: int = 1 << 23, n_hashes: int = 5
) -> bytes:
    """Distributed Bloom sketch of a hash column: each partition folds its
    rows into a local n_bits/8-byte numpy bitmap (Arrow-batched
    mapInPandas), the driver OR-merges one bitmap per partition — the
    treeAggregate shape, never the rows themselves. Invariant under
    repartitioning (OR is commutative).

    Sizing: n_bits ≈ 10 bits/item keeps FPR ≈ 1%; at 10B historical docs
    that is a ~1.5 GB sketch — still one broadcast, but shard by digest
    prefix (one sketch per shard, probed by the matching prefix) before
    reaching for that scale. False positives only cost stage-2 work in
    incremental_dedup; false negatives are impossible."""
    import numpy as np
    from pyspark.sql import types as T

    # ceil, not floor: positions range over [0, n_bits), so a non-multiple-
    # of-8 n_bits must still allocate the byte holding its top bits
    nbytes = (n_bits + 7) // 8
    pos_df = hashes.select(_bloom_positions(F.col(col), n_bits, n_hashes).alias("pos"))

    def fold(batches):
        bm = np.zeros(nbytes, dtype=np.uint8)
        seen = False
        for b in batches:
            for arr in b["pos"]:
                idx = np.asarray(arr, dtype=np.int64)
                np.bitwise_or.at(bm, idx >> 3, np.uint8(1) << (idx & 7).astype(np.uint8))
                seen = True
        if seen:
            yield pd.DataFrame({"bm": [bm.tobytes()]})

    parts = pos_df.mapInPandas(fold, T.StructType([T.StructField("bm", T.BinaryType())]))
    out = np.zeros(nbytes, dtype=np.uint8)
    for row in parts.collect():
        out |= np.frombuffer(row["bm"], dtype=np.uint8)
    return out.tobytes()


def bloom_might_contain(spark, bloom: bytes, digest_col, n_bits: int, n_hashes: int):
    """Boolean Column: digest is POSSIBLY in the sketch (false positives at
    the sized FPR; false negatives never). Positions are computed JVM-side;
    the Arrow-batched probe only does vectorized bit lookups against the
    broadcast bitmap. Stateless — safe in Structured Streaming plans."""
    import numpy as np
    from pyspark.sql import types as T
    from pyspark.sql.pandas.functions import pandas_udf

    bc = spark.sparkContext.broadcast(bloom)

    @pandas_udf(T.BooleanType())
    def probe(pos: pd.Series) -> pd.Series:
        if len(pos) == 0:
            return pd.Series([], dtype=bool)
        bm = np.frombuffer(bc.value, dtype=np.uint8)
        idx = np.stack(pos.to_numpy())  # (rows, n_hashes) int64
        bits = (bm[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1
        return pd.Series(bits.all(axis=1))

    return probe(_bloom_positions(digest_col, n_bits, n_hashes))


def incremental_dedup(
    new_docs: DataFrame,
    old_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bits: int = 1 << 23,
    n_hashes: int = 5,
    broadcast_max_survivors: int = 5_000_000,
) -> DataFrame:
    """Rows of `new_docs` whose content does NOT appear in the historical
    corpus `old_docs` — the daily-crawl-vs-everything-so-far dedup. Returns
    (id, content_hash) for the genuinely-new rows; result is EXACT.

    Two stages:
    1. Bloom split — a sketch of the old corpus' 16-byte content digests
       (build_bloom) is broadcast and probed map-only. Bloom has no false
       negatives, so rows FAILING the probe are *certainly* new and skip
       stage 2 entirely; rows passing it ("maybe-old" — the bulk of a
       steady-state re-crawl, plus an FPR-sized sliver of genuinely-new
       rows) go on to the exact confirm.
    2. Exact confirm on the maybe-old rows — a daily snapshot is orders of
       magnitude below the history, so the maybe-old digest set is
       broadcast TWICE instead of shuffling the old corpus: old is scanned
       once with a broadcast semi-join probe (hits = old digests matching
       a maybe-old row, |hits| ≤ |new|), then maybe-old anti-joins the
       broadcast hit set — the false positives fall out here. The 100-TB
       historical corpus never shuffles and is never a build side. A
       maybe-old set too big to broadcast (a corpus-sized snapshot) falls
       back to the plain shuffle anti-join — the honest cost when the
       delta really is corpus-sized.

    Intra-snapshot duplicates inside new_docs are out of scope (that is
    exact_duplicates); a content present twice in new_docs and absent from
    old_docs survives twice, matching the SQL `WHERE hash NOT IN old`."""
    from pyspark.sql.functions import broadcast

    # NULL text hashes as the empty string (both stages need a non-null
    # digest: the Bloom position array cannot carry nulls, and anti-join /
    # NOT EXISTS null semantics would diverge between engines otherwise)
    new_h = new_docs.select(
        F.col(id_col), F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("content_hash")
    )
    old_h = old_docs.select(
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("content_hash")
    )

    # deliberately NOT persisted: the probe is a map-only Arrow pass, so
    # recomputing it per consuming action (the maybe-count below + the
    # caller's one action) is cheaper than pinning a cached dataset the
    # operator can never safely unpersist; persist new_docs caller-side if
    # the snapshot SCAN itself is the expensive part
    bloom = build_bloom(old_h, "content_hash", n_bits=n_bits, n_hashes=n_hashes)
    probed = new_h.withColumn(
        "_maybe_old",
        bloom_might_contain(
            new_docs.sparkSession, bloom, F.col("content_hash"), n_bits, n_hashes
        ),
    )
    definite_new = probed.filter(~F.col("_maybe_old")).select(id_col, "content_hash")
    maybe = probed.filter(F.col("_maybe_old")).select(id_col, "content_hash")

    if maybe.limit(broadcast_max_survivors + 1).count() > broadcast_max_survivors:
        confirmed = maybe.join(old_h, "content_hash", "left_anti")
    else:
        mset = maybe.select("content_hash").distinct()
        hits = old_h.join(broadcast(mset), "content_hash", "left_semi").distinct()
        confirmed = maybe.join(broadcast(hits), "content_hash", "left_anti")
    return definite_new.unionByName(confirmed.select(id_col, "content_hash"))


def corpus_diff(
    old: DataFrame, new: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Snapshot delta between two corpus versions (daily-crawl refresh):
    one row per doc id in either version with status
    added | removed | changed | unchanged (content compared by md5).

    One co-partitioned full-outer join on the id — both sides shuffle
    16-byte digests, never text. (On an Iceberg/lakehouse deployment the
    added/removed split falls out of snapshot metadata for free; the
    content-hash compare is what catches in-place rewrites either way.)
    """
    # presence flags, NOT hash nullness, decide added/removed — a NULL-text
    # row present in both snapshots must not read as churn; the hash
    # compare is null-safe for the same reason
    o = old.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(text_col)).alias("_oh"),
        F.lit(1).alias("_ohas"),
    )
    n = new.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(text_col)).alias("_nh"),
        F.lit(1).alias("_nhas"),
    )
    status = (
        F.when(F.col("_ohas").isNull(), F.lit("added"))
        .when(F.col("_nhas").isNull(), F.lit("removed"))
        .when(~F.col("_oh").eqNullSafe(F.col("_nh")), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return o.join(n, "doc_id", "full_outer").select("doc_id", status.alias("status"))


def strip_boilerplate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    min_docs: int = 3,
    min_line_chars: int = 1,
) -> DataFrame:
    """RefinedWeb/CCNet-style boilerplate removal: a line whose exact text
    appears in >= `min_docs` DISTINCT documents of the same `group_col`
    (site/domain/source) is boilerplate — navigation chrome, cookie
    banners, footers — and EVERY occurrence is stripped (contrast
    dedup_lines, which keeps the first occurrence corpus-wide: that is
    dedup; this is removal of per-domain chrome). Lines shorter than
    `min_line_chars` after trim never participate and are always kept.

    Returns one row per input document:
      (doc_id, <group_col>, text [reassembled], n_lines, n_removed)

    Scale: the frequency election groups on (group, 16-byte md5 digest) —
    line text is never a shuffle key — and the flagged set (lines frequent
    within one domain) is tiny relative to the corpus, so the removal
    anti-join broadcasts under AQE; reassembly shuffles surviving (doc,
    pos, line) rows once on doc id, the same two-narrow-shuffle shape as
    dedup_lines."""
    lines = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).alias("_grp"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    elig = F.length(F.trim(F.col("line"))) >= min_line_chars
    keyed = lines.withColumn("_h", F.when(elig, F.md5(F.col("line"))))
    flagged = (
        keyed.filter(F.col("_h").isNotNull())
        .groupBy("_grp", "_h")
        .agg(F.countDistinct("doc_id").alias("_df"))
        .filter(F.col("_df") >= min_docs)
        .select("_grp", "_h")
    )
    # NULL _h (ineligible short lines) never equi-matches → always kept
    kept = keyed.join(flagged, ["_grp", "_h"], "left_anti").select(
        "doc_id", "pos", "line"
    )
    totals = lines.groupBy("doc_id", "_grp").agg(F.count(F.lit(1)).alias("n_lines"))
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))), lambda s: s["line"]
            ),
            "\n",
        ).alias("text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return totals.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        F.col("_grp").alias(group_col),
        F.coalesce("text", F.lit("")).alias("text"),
        "n_lines",
        (F.col("n_lines") - F.coalesce("n_kept", F.lit(0))).cast("long").alias("n_removed"),
    )


def quantile_buckets(
    df: DataFrame,
    n_buckets: int,
    score_col: str,
    group_col: str | None = None,
    id_col: str = "doc_id",
    num_chunks: int | None = None,
) -> DataFrame:
    """Exact per-group NTILE over a score column WITHOUT a per-group
    single-reducer window — the CCNet head/middle/tail split (bucket
    documents by LM perplexity within each domain) and any other
    quantile-bucketing a curation pipeline needs.

    Semantics are exactly SQL ntile(n) OVER (PARTITION BY group ORDER BY
    score, id): with cnt rows, base = cnt // n and rem = cnt % n, the
    first rem buckets hold base+1 rows. Execution reuses pack_sequences'
    two-phase distributed prefix sum for the per-group rank (budget=1 ⇒
    seq_id == 0-based rank), so no task ever materializes a whole group —
    a per-domain window on a 60%-one-domain corpus would put 60% of the
    corpus in one reducer; this never does.

    The rank key is (score, id). Scores ride through the ranking as a
    fixed-width decimal string ('%015.6f'), which orders identically to
    the number for values in [0, 1e8) — scores must be NON-NEGATIVE
    (enforced per-row with raise_error: perplexities, probabilities,
    quality scores all qualify) and are compared at 6 decimals, so feed
    round-6 (or coarser) scores for engine-exact bucketing.

    Returns df's (id, group, score) plus `bucket` (1-based)."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    grp = F.col(group_col).cast("string") if group_col else F.lit("all")
    checked = F.when(
        F.col(score_col) < 0,
        F.raise_error(F.concat(F.lit(f"quantile_buckets: negative {score_col}: "),
                               F.col(score_col).cast("string"))),
    ).otherwise(F.col(score_col))
    keyed = df.select(
        F.col(id_col).alias("doc_id"),
        grp.alias("_grp"),
        F.col(score_col).alias("_score"),
        F.format_string("%015.6f", checked).alias("_sk"),
        F.lit(1).alias("_one"),
    )
    ranked = pack_sequences(
        keyed,
        budget=1,
        weight_col="_one",
        stratum_col="_grp",
        id_col="doc_id",
        num_chunks=num_chunks,
        order_col="_sk",
    ).select("doc_id", "_grp", F.col("seq_id").alias("_rank"))
    counts = ranked.groupBy("_grp").agg(F.count(F.lit(1)).alias("_cnt"))
    # integer DIV end to end — double-division floors can cross an integer
    # boundary near 2^53; CASE short-circuits the base=0 branch (tiny
    # groups land entirely in the `rank < fat` arm), so no div-by-zero
    bucket = F.expr(
        f"CASE WHEN _rank < ((_cnt DIV {n_buckets}) + 1) * (_cnt % {n_buckets}) "
        f"THEN _rank DIV ((_cnt DIV {n_buckets}) + 1) + 1 "
        f"ELSE _cnt % {n_buckets} "
        f"     + (_rank - ((_cnt DIV {n_buckets}) + 1) * (_cnt % {n_buckets})) "
        f"       DIV (_cnt DIV {n_buckets}) + 1 END"
    )
    out = (
        ranked.join(F.broadcast(counts), "_grp")
        .select("doc_id", "_grp", bucket.cast("long").alias("bucket"))
        .join(keyed.select("doc_id", "_grp", "_score"), ["doc_id", "_grp"])
    )
    cols = [F.col("doc_id").alias(id_col)]
    if group_col:
        cols.append(F.col("_grp").alias(group_col))
    cols += [F.col("_score").alias(score_col), "bucket"]
    return out.select(*cols)


def c4_clean(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The published C4 cleaning rules (Raffel et al. 2020, §2.2) as a
    single map-only transform:

      * keep only lines that end in a terminal punctuation mark
        (. ! ? ") AND contain >= 5 words;
      * drop the whole page if fewer than 3 lines survive, or if the page
        contains "lorem ipsum" (any case) or a curly brace.

    Returns (doc_id, text [kept lines rejoined], n_lines, n_kept, keep).

    Zero shuffle: the line filter is a HOF `filter` over the split array
    (elements bound directly — no positional indexing of a derived
    array), the page predicates are plain string expressions; the whole
    operator lives in the scan stage under whole-stage codegen. Contrast
    dedup_lines/strip_boilerplate, which need corpus-wide frequency and
    therefore shuffle — C4's rules are per-page, so the plan should be
    (and is) a single Project."""
    lines = F.split(F.col(text_col), "\n")
    line_ok = lambda l: F.trim(l).rlike('[.!?"]$') & (  # noqa: E731
        F.size(F.split(F.trim(l), r"\s+")) >= 5
    )
    kept = F.filter(lines, line_ok)
    lower = F.lower(F.col(text_col))
    keep = (
        (F.size(kept) >= 3)
        & ~lower.contains("lorem ipsum")
        & ~lower.contains("{")
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_join(kept, "\n").alias("text"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        keep.alias("keep"),
    )


def sample_k_per_group(
    docs: DataFrame,
    k: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "v1",
) -> DataFrame:
    """Exactly min(k, |group|) rows per group, chosen by deterministic
    hash ranking — the fixed-size twin of stratified_sample's rate-based
    draw: rank rows inside each group by (md5(id || salt), id) and keep
    the first k. Engine-portable and stable under reruns; bumping `salt`
    redraws the sample without touching the data.

    One row_number window per group (partition-local sort after a single
    shuffle on the group key). The window partitions on the GROUP, so a
    pathological group (half the corpus in one language) serializes
    through one reducer — for group-skewed corpora pre-thin with
    stratified_sample (rate ≈ k/|group|) and rank the survivors; the
    composed draw is still deterministic."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError("k must be >= 1")
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), F.col(id_col))
    )
    return (
        docs.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
        .withColumn("sample_rank", F.col("sample_rank").cast("long"))
    )


def train_val_test_split(
    docs: DataFrame,
    val_rate: float = 0.1,
    test_rate: float = 0.1,
    id_col: str = "doc_id",
    salt: str = "split-v1",
) -> DataFrame:
    """Deterministic train/val/test assignment: the first 6 hex digits of
    md5(id || salt) partition [0, 16^6) into train / val / test bands —
    every row gets exactly one split, membership is a pure function of
    the id (reproducible across engines and runs, stable as the corpus
    grows: a doc never migrates between splits unless `salt` changes).
    The holdout contract a training pipeline actually needs — rand()-based
    randomSplit resplits on every retry and leaks val into train.

    Map-only (no shuffle, stays in the scan's codegen span); compose with
    stratified_sample for per-language holdout rates."""
    if val_rate < 0 or test_rate < 0 or val_rate + test_rate >= 1:
        raise ValueError("need val_rate, test_rate >= 0 and val+test < 1")
    digest = F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 6)
    t_train = _hex_threshold(1.0 - val_rate - test_rate)
    t_val = _hex_threshold(1.0 - test_rate)
    return docs.withColumn(
        "split",
        F.when(digest < F.lit(t_train), F.lit("train"))
        .when(digest < F.lit(t_val), F.lit("val"))
        .otherwise(F.lit("test")),
    )


def pps_systematic_sample(
    df: DataFrame,
    weight_col: str,
    n: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic probability-proportional-to-size sample of ~n rows:
    systematic (Madow) sampling — lay every row's integer weight end to
    end along a line in md5(id) order, then take one row at every stride
    of total/n. A row with weight w is selected with probability exactly
    min(1, n·w/total), rows with w ≥ total/n are ALWAYS selected, and the
    draw is a pure function of (ids, weights, n): rerun/engine/resume
    identical, no rand() — the weighted companion of sample_k_per_group's
    md5-rank trick (which is uniform) and temperature-less cousin of
    domain_mix_sample (which resamples per group). Rows heavier than one
    stride absorb several stride multiples; `n_hits` carries that
    multiplicity (Σ n_hits = n exactly — replicate by n_hits for an
    unbiased weighted resample, or treat n_hits ≥ 1 as selection).

    All arithmetic is integer: row interval [a, a+w) contains a stride
    multiple k·(total/n) iff ceil(a·n/total) < ceil((a+w)·n/total) —
    no floats anywhere, so the oracle matches row-for-row. Contract:
    weights must be positive integers with total·n < 2^63 (at larger
    scale pre-aggregate or sample per shard and merge). The cumulative
    positions use a two-phase distributed prefix sum: 16 md5 buckets,
    per-bucket window cumsum + broadcast bucket offsets — no global
    single-partition sort."""
    from pyspark.sql import Window

    if n < 1:
        raise ValueError("need n >= 1")
    w = F.col(weight_col).cast("long")
    base = df.withColumn("_k", F.md5(F.col(id_col).cast("string"))).withColumn(
        "_w", w
    )
    bad = base.filter((F.col("_w").isNull()) | (F.col("_w") <= 0))
    base = base.filter(F.col("_w") > 0).withColumn(
        "_b", F.conv(F.substring("_k", 1, 1), 16, 10).cast("int")
    )
    in_bucket = Window.partitionBy("_b").orderBy("_k", F.col(id_col)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = base.withColumn("_c", F.sum("_w").over(in_bucket))
    offsets = (
        base.groupBy("_b")
        .agg(F.sum("_w").alias("_bt"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_bt").over(
                    Window.orderBy("_b").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).cast("long"),
        )
    )
    total = offsets.agg(F.sum("_bt").cast("long").alias("_total"))
    placed = (
        cum.join(F.broadcast(offsets.select("_b", "_off")), "_b")
        .crossJoin(F.broadcast(total))
        .withColumn("_a", F.col("_off") + F.col("_c") - F.col("_w"))
    )
    # ceil(x·n/total) as (x·n + total − 1) div total — exact longs
    lo = F.expr(f"(_a * {n} + _total - 1) div _total")
    hi = F.expr(f"((_a + _w) * {n} + _total - 1) div _total")
    picked = (
        placed.withColumn("n_hits", (hi - lo).cast("long"))
        .filter(F.col("n_hits") > 0)
        .drop("_k", "_b", "_c", "_off", "_a", "_w", "_total")
    )
    _ = bad  # rows with non-positive weight are excluded by contract
    return picked


def power_mix_weights(
    docs: DataFrame, domain_col: str = "lang", alpha: int = 2
) -> DataFrame:
    """α-power domain mixing weights (GPT-3/Pile-style mix reweighting)
    with INTEGER α so every number is exact: w_d = n_d^α / Σ n^α and the
    upsample factor vs the natural share, upsample_d = w_d / (n_d/N) =
    N·n_d^(α−1) / Σ n^α — both quantized to micro by ONE integer division
    each. Integer α ≥ 1 sharpens toward large domains; the α < 1
    flattening used for low-resource boosting is the same formula with
    rational powers (float fast path — not oracle-bound, by design).

    Scale: one count aggregate on the domain key + a window over
    |domains| rows. Nothing touches the corpus twice."""
    if alpha < 1:
        raise ValueError("alpha must be an integer >= 1 (exact-integer path)")
    from pyspark.sql import Window

    w = Window.partitionBy(F.lit(1))
    counts = docs.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count("*").cast("long").alias("n_docs")
    )
    # integer powers by repeated multiplication — float pow() silently
    # loses exactness past 2^53
    pow_a = "1" + " * n_docs" * alpha
    pow_a1 = "1" + " * n_docs" * (alpha - 1)
    powed = counts.withColumn("_pow", F.expr(pow_a).cast("long"))
    return (
        powed.withColumn("_tot", F.sum("n_docs").over(w))
        .withColumn("_ptot", F.sum("_pow").over(w))
        .select(
            "domain",
            "n_docs",
            F.expr("1000000 * n_docs div _tot").alias("share_micro"),
            F.expr("1000000 * _pow div _ptot").alias("weight_micro"),
            F.expr(f"(1000000 * _tot * ({pow_a1})) div _ptot")
            .cast("long")
            .alias("upsample_micro"),
        )
    )


def neyman_allocation(
    df: DataFrame,
    value_col: str,
    stratum_col: str,
    budget: int = 1_000,
    scale: int = 100,
) -> DataFrame:
    """Neyman (minimum-variance) stratified sample allocation: given a
    stratified corpus and a labelling/eval budget, how many draws go to
    each stratum — n_h ∝ N_h·σ_h, the allocation that minimizes the
    estimator variance for a fixed budget (vs proportional allocation,
    which over-samples big homogeneous strata). Returns (stratum,
    n_rows, sd, weight_milli, alloc, alloc_capped): `alloc` is the raw
    Neyman share of `budget`, `alloc_capped` clips at the stratum size
    (re-spread the clipped surplus manually if it triggers).

    Exactness: values quantize to the integer grid; per-stratum sample
    sd comes from exact moments with ONE division + sqrt; the Neyman
    weight rounds to integer milli (N_h·σ_h·1000) so the cross-stratum
    total is an EXACT long sum (never an order-sensitive float sum),
    and each allocation is one further division. Zero-variance or
    single-row strata weigh 0 — they need one draw at most, which the
    capped column makes explicit (alloc 0 → sample nothing there).

    Scale: ONE hash aggregate over the corpus + a |strata|-row finish
    with a 1-row total broadcast."""
    q = df.filter(
        F.col(value_col).isNotNull() & F.col(stratum_col).isNotNull()
    ).select(
        F.col(stratum_col).alias("stratum"),
        F.round(F.col(value_col) * scale, 0).cast("long").alias("qv"),
    )
    d19 = F.col("qv").cast("decimal(19,0)")
    per = q.groupBy("stratum").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.col("qv").cast("decimal(38,0)")).alias("s"),
        F.sum(d19 * d19).alias("ss"),
    )
    nd = F.col("n_rows").cast("decimal(38,0)")
    var = (nd * F.col("ss") - F.col("s") * F.col("s")).cast("double") / (
        (nd * (F.col("n_rows") - 1).cast("decimal(38,0)")).cast("double")
        * F.lit(float(scale * scale))
    )
    sd = F.when(F.col("n_rows") > 1, F.sqrt(var)).otherwise(F.lit(0.0))
    w = per.select(
        "stratum",
        "n_rows",
        F.round(sd, 6).alias("sd"),
        F.round(F.col("n_rows").cast("double") * sd * F.lit(1_000.0), 0)
        .cast("long").alias("weight_milli"),
    )
    tot = w.agg(F.sum("weight_milli").cast("long").alias("_tw"))
    alloc = F.round(
        F.lit(float(budget)) * F.col("weight_milli").cast("double")
        / F.col("_tw").cast("double"),
        0,
    ).cast("long")
    return w.crossJoin(F.broadcast(tot)).select(
        "stratum",
        "n_rows",
        "sd",
        "weight_milli",
        F.when(F.col("_tw") > 0, alloc).otherwise(F.lit(0)).alias("alloc"),
        F.when(F.col("_tw") > 0, F.least(alloc, F.col("n_rows")))
        .otherwise(F.lit(0)).alias("alloc_capped"),
    )


def source_overlap_matrix(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_chars: int | None = None,
) -> DataFrame:
    """Pairwise source content-overlap matrix — which ingestion feeds
    ship each other's documents: one row per source pair (src_a,
    src_b, n_a, n_b, n_shared, jaccard) with src_a < src_b. n_shared
    counts DISTINCT content hashes present in both feeds; high
    jaccard between two "independent" sources means paying twice for
    the same corpus (the cross-SOURCE view that dedup_exact's global
    collapse doesn't break out, and kmv_vocab_overlap only
    approximates at the vocabulary level).

    Exact and blow-up-safe: per-(hash, source) dedup FIRST, so a
    duplicate-heavy source contributes each hash once; the pair join
    runs on the per-hash source set (≤ |sources| per hash, never a
    per-row pairing); per-source totals broadcast back onto ≤
    |sources|² result rows.
    """
    key = F.md5(F.col(text_col))
    if prefix_chars is not None:
        # near-dup-tolerant key: shared openings (mirrored boilerplate,
        # syndicated ledes) count as overlap even when bodies diverge
        key = F.md5(F.lower(F.substring(F.col(text_col), 1, prefix_chars)))
    hs = (
        docs.filter(F.col(text_col).isNotNull() & F.col(source_col).isNotNull())
        .select(key.alias("h"), F.col(source_col).alias("s"))
        .distinct()
    )
    per_src = hs.groupBy("s").agg(F.count(F.lit(1)).cast("long").alias("n"))
    pairs = (
        hs.alias("a")
        .join(hs.alias("b"), "h")
        .filter(F.col("a.s") < F.col("b.s"))
        .groupBy(F.col("a.s").alias("src_a"), F.col("b.s").alias("src_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    out = (
        pairs.join(
            F.broadcast(per_src.select(F.col("s").alias("src_a"), F.col("n").alias("n_a"))),
            "src_a",
        )
        .join(
            F.broadcast(per_src.select(F.col("s").alias("src_b"), F.col("n").alias("n_b"))),
            "src_b",
        )
    )
    return out.select(
        "src_a",
        "src_b",
        "n_a",
        "n_b",
        "n_shared",
        F.round(
            F.col("n_shared").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_shared")).cast("double"),
            6,
        ).alias("jaccard"),
    )


def dedup_savings(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_chars: int = 40,
) -> DataFrame:
    """Dedup savings report — what each dedup rung would actually buy
    BEFORE running it: one row per method ('exact', 'prefix') with
    (method, n_docs, n_groups, docs_removed, pct_docs_removed,
    tokens_total, tokens_removed, pct_tokens_removed). 'exact' keys
    on md5(text); 'prefix' on the lowercased `prefix_chars` opening
    (the near-dup proxy source_overlap_matrix uses). Canonical doc =
    smallest doc_id per key; tokens are whitespace tokens. The
    budget-meeting table that decides whether MinHash is worth its
    shuffle.

    Exact: one scan computes both keys + the token count, each method
    is a (key → count, min id, token sums) aggregate folded to one
    row; canonical token mass via min_by. No pair joins at all.
    """
    base = docs.filter(
        F.col(text_col).isNotNull() & F.col(id_col).isNotNull()
    ).select(
        F.col(id_col).alias("id"),
        F.md5(F.col(text_col)).alias("k_exact"),
        F.md5(F.lower(F.substring(F.col(text_col), 1, prefix_chars))).alias(
            "k_prefix"
        ),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long").alias(
            "tok"
        ),
    )

    def one(key_col: str, name: str) -> DataFrame:
        per_key = base.groupBy(key_col).agg(
            F.count(F.lit(1)).cast("long").alias("c"),
            F.sum("tok").cast("long").alias("tk"),
            F.min_by("tok", "id").cast("long").alias("tk_keep"),
        )
        return per_key.agg(
            F.lit(name).alias("method"),
            F.sum("c").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            (F.sum("c") - F.count(F.lit(1))).cast("long").alias("docs_removed"),
            F.round(
                (F.sum("c") - F.count(F.lit(1))).cast("double")
                / F.sum("c").cast("double"),
                6,
            ).alias("pct_docs_removed"),
            F.sum("tk").cast("long").alias("tokens_total"),
            (F.sum("tk") - F.sum("tk_keep")).cast("long").alias("tokens_removed"),
            F.round(
                (F.sum("tk") - F.sum("tk_keep")).cast("double")
                / F.sum("tk").cast("double"),
                6,
            ).alias("pct_tokens_removed"),
        )

    return one("k_exact", "exact").unionAll(one("k_prefix", "prefix"))


def mix_gap_to_target(
    docs: DataFrame,
    target: dict[str, float],
    group_col: str = "source",
) -> DataFrame:
    """Corpus-mix gap against a PRESCRIBED recipe — "how far is the
    source mix from the data-mixture spec" as one row per group plus
    exact KL: (group, n, share, target_share, gap, kl_term_nano are
    folded — output is per-group (group, n, share, target_share,
    gap) and the caller reads Σ later) … returned per group with the
    overall KL(current‖target) repeated on every row (kl_bits) so the
    table is self-contained. Groups missing from the recipe get
    target 0 and a NULL KL contribution (documented: KL is computed
    over recipe-covered groups only, renormalized share).

    Exact: counts are integers; each covered group's
    n_g·(ln(n_g·W) − ln(n_cov·w_g))/ln2 term (w_g the literal recipe
    weight, W = Σ covered weights) nano-rounds and exact-sums; one
    shared division.
    """
    items = sorted(target.items())
    tw = F.create_map(
        *[F.lit(x) for kv in items for x in kv]
    )
    per_g = docs.filter(F.col(group_col).isNotNull()).groupBy(
        F.col(group_col).alias("g")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = per_g.agg(F.sum("n").cast("long").alias("nn"))
    wsum = float(sum(target.values()))
    covered = per_g.select(
        "g", "n", tw[F.col("g")].alias("w")
    )
    cov_tot = covered.filter(F.col("w").isNotNull()).agg(
        F.sum("n").cast("long").alias("n_cov")
    )
    ln2 = 0.6931471805599453
    NANO = F.lit(1_000_000_000.0)
    j = covered.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(cov_tot))
    kl_term = F.when(
        F.col("w").isNotNull() & (F.col("w") > 0),
        F.round(
            F.col("n").cast("double")
            * (
                F.log(F.col("n").cast("double") * F.lit(wsum))
                - F.log(F.col("n_cov").cast("double") * F.col("w"))
            )
            / F.lit(ln2)
            * NANO
        ).cast("long"),
    )
    staged = j.select(
        "g", "n", "w", "nn", "n_cov", kl_term.alias("_t")
    )
    kl = staged.agg(
        F.sum("_t").cast("long").alias("kl_nano"),
        F.max("n_cov").cast("long").alias("n_cov2"),
    )
    out = staged.crossJoin(F.broadcast(kl))
    share = F.col("n").cast("double") / F.col("nn").cast("double")
    tshare = F.col("w") / F.lit(wsum)
    return out.select(
        F.col("g").alias("group"),
        "n",
        F.round(share, 6).alias("share"),
        F.round(tshare, 6).alias("target_share"),
        F.round(share - tshare, 6).alias("gap"),
        F.round(
            F.col("kl_nano").cast("double")
            / (F.col("n_cov2").cast("double") * F.lit(1_000_000_000.0)),
            6,
        ).alias("kl_bits"),
    )


def unimax_allocation(
    docs: DataFrame,
    budget: int,
    max_epochs: int = 2,
    stratum_col: str = "lang",
    weight_col: str = "n_chars",
) -> DataFrame:
    """UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer and
    More Effective Language Sampling for Large-Scale Multilingual
    Pretraining"): split a total training budget across strata with a hard
    per-stratum epoch cap, giving head languages no more than `max_epochs`
    passes over their data and sharing the leftover uniformly.

    The paper's greedy (visit strata by ascending corpus mass; give each
    min(mass·E, remaining/strata_remaining)) has a closed form under the
    ascending order: the CAPPED strata are exactly a prefix — stratum i is
    capped iff cap_i·(n−i+1) + Σ_{j<i} cap_j ≤ budget — and every stratum
    past the threshold takes an equal share of what is left. That makes
    the whole allocation two window functions over the per-stratum frame
    (one row per language — dimension-sized, so the unpartitioned windows
    are a non-issue; the corpus-sized work is ONE partial-aggregated
    groupBy).

    One row per stratum: (stratum, mass, cap, allocation, epochs,
    sampling_weight), allocation/epochs/weight rounded to 6.
    """
    from pyspark.sql import Window

    per = docs.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.sum(F.col(weight_col).cast("long")).alias("mass")
    ).withColumn("cap", F.col("mass") * F.lit(int(max_epochs)))
    w = Window.orderBy("cap", "stratum")
    ranked = per.select(
        "stratum",
        "mass",
        "cap",
        F.row_number().over(w).cast("long").alias("i"),
        F.count("*").over(Window.partitionBy()).cast("long").alias("n"),
        (F.sum("cap").over(w) - F.col("cap")).cast("long").alias("pfx"),
    )
    b = F.lit(float(budget))
    capped = (
        F.col("cap").cast("double") * (F.col("n") - F.col("i") + 1).cast("double")
        + F.col("pfx").cast("double")
    ) <= b
    staged = ranked.withColumn("_c", capped)
    wk = Window.partitionBy()
    staged = staged.withColumn(
        "kstar", F.max(F.when(F.col("_c"), F.col("i")).otherwise(F.lit(0))).over(wk)
    ).withColumn(
        "pk", F.max(F.when(F.col("_c"), F.col("pfx") + F.col("cap"))).over(wk)
    )
    leftover_share = (b - F.coalesce(F.col("pk"), F.lit(0)).cast("double")) / (
        F.col("n") - F.col("kstar")
    ).cast("double")
    alloc = F.when(F.col("i") <= F.col("kstar"), F.col("cap").cast("double")).otherwise(
        leftover_share
    )
    return staged.select(
        "stratum",
        "mass",
        "cap",
        F.round(alloc, 6).alias("allocation"),
        F.round(alloc / F.col("mass").cast("double"), 6).alias("epochs"),
        F.round(alloc / b, 6).alias("sampling_weight"),
    )
