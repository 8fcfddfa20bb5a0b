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

At 100 TB: keep-best shuffles candidate PAIRS (ids only) and the final
(doc → cluster) labels — both orders of magnitude below the corpus;
sampling is a pushed-down filter; decontamination is one broadcast join
over an exploded scan.
"""

from __future__ import annotations

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
    keepers = clustered.groupBy("cluster_id").agg(
        F.min(F.struct((-F.col("_q")).alias("nq"), F.col("doc_id").alias("id")))
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
    n = max(0, min(16**digits, round(rate * 16**digits)))
    return format(n, f"0{digits}x")


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
    """
    spark = docs.sparkSession
    n = num_chunks or spark.sparkContext.defaultParallelism * 2
    base = docs.select(
        F.col(stratum_col).cast("string").alias("stratum"),
        F.col(id_col).alias("doc_id"),
        F.coalesce(F.col(weight_col).cast("long"), F.lit(0)).alias("w"),
    )
    part = (
        base.repartitionByRange(n, "stratum", "doc_id")
        .sortWithinPartitions("stratum", "doc_id")
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
    local = part.mapInPandas(
        local_cumsum,
        "stratum string, doc_id bigint, w long, _pid int, _local_cum long",
    ).localCheckpoint(eager=False)

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
    bench_sh = shingles(benchmark, id_col=id_col, text_col=text_col, k=k).select("shingle").distinct()
    doc_sh = shingles(docs, id_col=id_col, text_col=text_col, k=k)
    if remove:
        dirty = doc_sh.join(F.broadcast(bench_sh), "shingle").select("doc_id").distinct()
        return docs.join(dirty, docs[id_col] == dirty["doc_id"], "left_anti")
    return (
        doc_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count_distinct("shingle").alias("n_contaminated_shingles"))
    )
