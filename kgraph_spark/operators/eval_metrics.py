"""Clustering-quality metrics for the canonicalization stage — the QA
gate a KG-construction pipeline runs when it changes ANY dedup knob
(thresholds, blocking, authority links) and needs to know what happened
to entity-merge quality before promoting (reference kgraph's merge logic:
dedup.py — here the evaluation of its output, which the reference leaves
to eyeballing).

Pairwise precision/recall over clusterings (the standard entity-resolution
metric): a pair of items is a predicted match when both sit in the same
predicted cluster, a true match when both share a gold cluster.

    precision = |pairs in both| / |predicted pairs|
    recall    = |pairs in both| / |gold pairs|
    F1        = 2·|both| / (|pred| + |gold|)   (harmonic identity — ONE
                integer division, no compounding of rounded P and R)

Everything accumulates as exact integers (C(n,2) per contingency cell via
n·(n−1) div 2 — always even, so integer division is exact); the only
float ops are three final divisions of exact longs. The heavy lifting is
ONE groupBy over the item table (the contingency cells); every later
aggregate runs on |pred-clusters × gold-clusters| cells, not items. At
100 TB the item join shuffles once on item id and a hot cluster costs its
row count — pair counts are ARITHMETIC on cell sizes, pairs are never
materialized."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cluster_pair_metrics(
    pred: DataFrame,
    gold: DataFrame,
    item_col: str = "item_id",
    pred_col: str = "pred_cluster",
    gold_col: str = "gold_cluster",
) -> DataFrame:
    """One row: (n_items, pairs_pred, pairs_gold, pairs_both,
    pair_precision, pair_recall, pair_f1). Items present in only one of
    the two frames are dropped (inner join) — evaluate on the common
    universe. Degenerate denominators yield NULL, not a crash."""
    j = pred.select(
        F.col(item_col).alias("_i"), F.col(pred_col).alias("_p")
    ).join(
        gold.select(F.col(item_col).alias("_i"), F.col(gold_col).alias("_g")),
        "_i",
    )
    cells = j.groupBy("_p", "_g").agg(F.count(F.lit(1)).alias("_n"))
    both = cells.agg(
        F.sum(F.expr("_n * (_n - 1) div 2")).cast("long").alias("pairs_both"),
        F.sum("_n").cast("long").alias("n_items"),
    )
    predp = (
        cells.groupBy("_p")
        .agg(F.sum("_n").alias("_a"))
        .agg(F.sum(F.expr("_a * (_a - 1) div 2")).cast("long").alias("pairs_pred"))
    )
    goldp = (
        cells.groupBy("_g")
        .agg(F.sum("_n").alias("_b"))
        .agg(F.sum(F.expr("_b * (_b - 1) div 2")).cast("long").alias("pairs_gold"))
    )
    out = both.crossJoin(predp).crossJoin(goldp)
    prec = F.when(
        F.col("pairs_pred") > 0, F.round(F.col("pairs_both") / F.col("pairs_pred"), 6)
    )
    rec = F.when(
        F.col("pairs_gold") > 0, F.round(F.col("pairs_both") / F.col("pairs_gold"), 6)
    )
    f1 = F.when(
        (F.col("pairs_pred") + F.col("pairs_gold")) > 0,
        F.round(
            (F.lit(2) * F.col("pairs_both"))
            / (F.col("pairs_pred") + F.col("pairs_gold")),
            6,
        ),
    )
    return out.select(
        "n_items",
        "pairs_pred",
        "pairs_gold",
        "pairs_both",
        prec.alias("pair_precision"),
        rec.alias("pair_recall"),
        f1.alias("pair_f1"),
    )


def bcubed_metrics(
    pred: DataFrame,
    gold: DataFrame,
    item_col: str = "item_id",
    pred_col: str = "pred_cluster",
    gold_col: str = "gold_cluster",
    scale: int = 1_000_000,
) -> DataFrame:
    """One row: (n_items, bcubed_precision, bcubed_recall, bcubed_f1) —
    the per-ITEM entity-resolution metric (Bagga & Baldwin 1998): each
    item's precision is |its pred cluster ∩ its gold cluster| / |its pred
    cluster|, recall divides by the gold cluster instead, and the corpus
    score is the mean over items. Unlike pairwise P/R (cluster_pair_metrics)
    B³ weights every ITEM equally, so one botched mega-cluster can't drown
    the long tail of small entities — run BOTH gates; they disagree exactly
    when merge damage is concentrated.

    Same contingency-cell plan as cluster_pair_metrics (ONE groupBy over
    the joined item table; everything after runs on cells, items never
    pair): a cell (p, g, n) contributes n items each scoring n/|p| and
    n/|g|, i.e. Σ n²/|p| and Σ n²/|g|. Per-cell terms are FIXED-POINT
    longs — n·n·scale div size, exact integer division — so the sums are
    order-free exact integers and the three final divisions of exact longs
    are engine-identical (the float playbook). Truncation error is ≤
    |cells|/scale of an item — at the default scale, nanoscale vs the
    round-6 output. Items in only one frame are dropped (inner join)."""
    j = pred.select(
        F.col(item_col).alias("_i"), F.col(pred_col).alias("_p")
    ).join(
        gold.select(F.col(item_col).alias("_i"), F.col(gold_col).alias("_g")),
        "_i",
    )
    cells = j.groupBy("_p", "_g").agg(F.count(F.lit(1)).alias("_n"))
    psize = cells.groupBy("_p").agg(F.sum("_n").alias("_np"))
    gsize = cells.groupBy("_g").agg(F.sum("_n").alias("_ng"))
    terms = (
        cells.join(psize, "_p")
        .join(gsize, "_g")
        .agg(
            F.sum(F.expr(f"_n * _n * CAST({scale} AS BIGINT) div _np"))
            .cast("long")
            .alias("_sp"),
            F.sum(F.expr(f"_n * _n * CAST({scale} AS BIGINT) div _ng"))
            .cast("long")
            .alias("_sr"),
            F.sum("_n").cast("long").alias("n_items"),
        )
    )
    prec = F.when(
        F.col("n_items") > 0,
        F.round(F.col("_sp") / (F.col("n_items") * F.lit(scale)), 6),
    )
    rec = F.when(
        F.col("n_items") > 0,
        F.round(F.col("_sr") / (F.col("n_items") * F.lit(scale)), 6),
    )
    # products go through double BEFORE multiplying: the longs are exact
    # (each < 2^53, so the double conversion is lossless) but their long
    # product would overflow at corpus scale; the double product rounds
    # once, identically in any IEEE engine
    f1 = F.when(
        (F.col("_sp") + F.col("_sr")) > 0,
        F.round(
            (F.lit(2.0) * F.col("_sp").cast("double") * F.col("_sr").cast("double"))
            / (
                (F.col("_sp") + F.col("_sr")).cast("double")
                * F.col("n_items").cast("double")
                * F.lit(float(scale))
            ),
            6,
        ),
    )
    return terms.select(
        "n_items",
        prec.alias("bcubed_precision"),
        rec.alias("bcubed_recall"),
        f1.alias("bcubed_f1"),
    )


def blocking_quality(
    candidates: DataFrame,
    gold: DataFrame,
    left_col: str = "id_a",
    right_col: str = "id_b",
    item_col: str = "item_id",
    gold_col: str = "gold_cluster",
) -> DataFrame:
    """ONE-row blocking-quality gate: reduction ratio + pairs completeness
    + pairs quality for ANY candidate generator (SNM, MinHash/SimHash
    bands, prefix filter, embedding buckets) against gold cluster labels
    — the standard record-linkage triple (Christen 2012): how much of the
    C(n,2) pair space the blocker pruned (RR), how many true-match pairs
    survived the pruning (PC — the recall ceiling for everything
    downstream), and what fraction of kept pairs are true matches (PQ).

    Universe = gold-labeled items (candidates touching unlabeled items
    are dropped from ALL counts, matching cluster_pair_metrics). Pairs
    are normalized to unordered-distinct with self-pairs removed, so
    double-emitted or flipped candidates can't inflate RR or PQ. Exact
    C(n,2) integer arithmetic throughout — gold pairs are counted from
    cluster SIZES, never materialized; three final round-6 divisions."""
    g = gold.select(F.col(item_col).alias("_i"), F.col(gold_col).alias("_g"))
    pairs = (
        candidates.select(
            F.least(F.col(left_col), F.col(right_col)).alias("_a"),
            F.greatest(F.col(left_col), F.col(right_col)).alias("_b"),
        )
        .filter(F.col("_a") != F.col("_b"))
        .distinct()
    )
    labeled = (
        pairs.join(g.select(F.col("_i").alias("_a"), F.col("_g").alias("_ga")), "_a")
        .join(g.select(F.col("_i").alias("_b"), F.col("_g").alias("_gb")), "_b")
    )
    cand = labeled.agg(
        F.count(F.lit(1)).cast("long").alias("n_candidate_pairs"),
        F.sum(F.when(F.col("_ga") == F.col("_gb"), 1).otherwise(0))
        .cast("long")
        .alias("covered_gold_pairs"),
    )
    totals = g.groupBy("_g").agg(F.count(F.lit(1)).alias("_n")).agg(
        F.sum("_n").cast("long").alias("n_items"),
        F.sum(F.expr("_n * (_n - 1) div 2")).cast("long").alias("gold_pairs"),
    )
    out = cand.crossJoin(F.broadcast(totals)).withColumn(
        "total_pairs", F.expr("n_items * (n_items - 1) div 2").cast("long")
    )
    return out.select(
        "n_items",
        "total_pairs",
        "n_candidate_pairs",
        "gold_pairs",
        "covered_gold_pairs",
        F.when(
            F.col("total_pairs") > 0,
            F.round(1.0 - F.col("n_candidate_pairs") / F.col("total_pairs"), 6),
        ).alias("reduction_ratio"),
        F.when(
            F.col("gold_pairs") > 0,
            F.round(F.col("covered_gold_pairs") / F.col("gold_pairs"), 6),
        ).alias("pairs_completeness"),
        F.when(
            F.col("n_candidate_pairs") > 0,
            F.round(F.col("covered_gold_pairs") / F.col("n_candidate_pairs"), 6),
        ).alias("pairs_quality"),
    )
