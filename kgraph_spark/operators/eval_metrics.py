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

_DEC = "decimal(38,0)"


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


def ranking_metrics(
    scored: DataFrame,
    gold: DataFrame,
    query_col: str = "query_id",
    cand_col: str = "candidate_id",
    score_col: str = "score",
    gold_col: str = "gold_id",
    ks: tuple[int, ...] = (1, 3, 10),
    scale: int = 1_000_000,
) -> DataFrame:
    """ONE-row ranking evaluation — MRR, Hits@k, mean rank — for any
    scored candidate table against one gold answer per query: the standard
    entity-linking / KG-link-prediction gate (how high does the TRUE KB
    entity sit in the candidate ranking the D3/D4 scorers produced?). Run
    it when a linking knob changes (embedding model, rerank formula,
    candidate budget) before the new ranking feeds canonicalization.

    Rank is computed WITHOUT sorting the candidate lists: rank(gold) =
    1 + |{c : score_c > score_gold, or tied with lower candidate id}| —
    one join to pin each query's gold score, one conditional count per
    query, so a hot query costs its candidate count and nothing global.
    Queries whose gold candidate is absent from `scored` (fell outside
    the ANN budget) contribute 0 to MRR and Hits@k and are excluded from
    mean_rank — the standard filtered convention, surfaced via n_found.

    Float discipline: ties must be broken identically cross-engine, so
    feed scores that are engine-identical doubles (cosine_fixed) or exact
    integers. Per-query reciprocal ranks are micro-unit LONGS
    (scale div rank — exact integer division), summed exactly; the only
    float ops are four final divisions of exact longs."""
    sc = scored.select(
        F.col(query_col).alias("_q"),
        F.col(cand_col).alias("_c"),
        F.col(score_col).alias("_s"),
    )
    gq = gold.select(F.col(query_col).alias("_q"), F.col(gold_col).alias("_gold"))
    gold_scored = sc.join(gq, "_q").filter(F.col("_c") == F.col("_gold")).select(
        "_q", F.col("_s").alias("_gs"), F.col("_c").alias("_gc")
    )
    ranks = (
        sc.join(gold_scored, "_q")
        .groupBy("_q")
        .agg(
            (
                F.lit(1)
                + F.sum(
                    F.when(
                        (F.col("_s") > F.col("_gs"))
                        | ((F.col("_s") == F.col("_gs")) & (F.col("_c") < F.col("_gc"))),
                        1,
                    ).otherwise(0)
                )
            )
            .cast("long")
            .alias("_rank")
        )
    )
    nq = gq.agg(F.countDistinct("_q").cast("long").alias("n_queries"))
    agg_cols = [
        F.count(F.lit(1)).cast("long").alias("n_found"),
        # coalesce: zero found queries must yield MRR/Hits 0.0, not NULL
        F.coalesce(
            F.sum(F.expr(f"CAST({scale} AS BIGINT) div _rank")), F.lit(0)
        )
        .cast("long")
        .alias("_rr"),
        F.coalesce(F.sum("_rank"), F.lit(0)).cast("long").alias("_rsum"),
    ]
    agg_cols += [
        F.coalesce(F.sum(F.when(F.col("_rank") <= k, 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias(f"_h{k}")
        for k in ks
    ]
    # 1-row aggregates cross-joined — the whole metric is one job, no
    # separate driver-side count() action recomputing the gold table
    out = ranks.agg(*agg_cols).crossJoin(F.broadcast(nq))
    sel = [
        "n_queries",
        "n_found",
        F.when(
            F.col("n_queries") > 0,
            F.round(F.col("_rr") / (F.col("n_queries") * F.lit(scale)), 6),
        ).alias("mrr"),
        F.when(
            F.col("n_found") > 0, F.round(F.col("_rsum") / F.col("n_found"), 6)
        ).alias("mean_rank"),
    ]
    sel += [
        F.when(
            F.col("n_queries") > 0, F.round(F.col(f"_h{k}") / F.col("n_queries"), 6)
        ).alias(f"hits_at_{k}")
        for k in ks
    ]
    return out.select(*sel)


def fs_agreement_weights(
    pairs: DataFrame,
    agreement_cols: list[str],
    label_col: str = "is_match",
    left_col: str = "id_a",
    right_col: str = "id_b",
) -> DataFrame:
    """Fellegi-Sunter agreement statistics — one row per comparison field:
    m = P(fields agree | pair is a match), u = P(agree | non-match), and
    the likelihood ratio m/u whose log is the classic record-linkage match
    weight (Fellegi & Sunter 1969). Fields with m/u ≫ 1 are the ones worth
    scoring on; m/u ≈ 1 fields are noise regardless of how often they
    agree. This turns a labeled pair sample into the scoring weights the
    D4 reranker / merge-candidate scorer would use — measured from data
    instead of hand-tuned.

    Input: candidate pairs carrying boolean agreement columns and a
    boolean match label (from gold clusters or adjudication). Pairs are
    normalized to unordered-distinct (flipped duplicates can't double
    count); NULL agreement values count as disagreement, NULL labels drop
    the pair. Add-one (Laplace) smoothing keeps every ratio finite:
    m = (agree_m + 1)/(n_match + 2), u likewise. All counts are exact
    longs from ONE aggregate over the pair table (the per-field unpivot
    multiplies rows by |fields| before the aggregate, map-side combined);
    the three outputs are single divisions / one double ratio of exact
    smoothed longs."""
    if not agreement_cols:
        raise ValueError("agreement_cols must be non-empty")
    norm = (
        pairs.filter(F.col(label_col).isNotNull())
        .select(
            F.least(F.col(left_col), F.col(right_col)).alias("_a"),
            F.greatest(F.col(left_col), F.col(right_col)).alias("_b"),
            F.col(label_col).cast("boolean").alias("_m"),
            *[
                F.coalesce(F.col(c).cast("boolean"), F.lit(False)).alias(f"_f_{c}")
                for c in agreement_cols
            ],
        )
        .filter(F.col("_a") != F.col("_b"))
        .dropDuplicates(["_a", "_b"])
    )
    unpivoted = norm.select(
        "_m",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("field"), F.col(f"_f_{c}").alias("agree")
                    )
                    for c in agreement_cols
                ]
            )
        ).alias("_e"),
    ).select("_m", F.col("_e.field").alias("field"), F.col("_e.agree").alias("_agree"))
    counts = unpivoted.groupBy("field").agg(
        F.sum(F.when(F.col("_m"), 1).otherwise(0)).cast("long").alias("n_match"),
        F.sum(F.when(~F.col("_m"), 1).otherwise(0)).cast("long").alias("n_nonmatch"),
        F.sum(F.when(F.col("_m") & F.col("_agree"), 1).otherwise(0))
        .cast("long")
        .alias("agree_match"),
        F.sum(F.when(~F.col("_m") & F.col("_agree"), 1).otherwise(0))
        .cast("long")
        .alias("agree_nonmatch"),
    )
    m = (F.col("agree_match") + 1) / (F.col("n_match") + 2)
    u = (F.col("agree_nonmatch") + 1) / (F.col("n_nonmatch") + 2)
    # ratio of the exact smoothed rationals, cross-multiplied in longs so
    # the ONE double division is of exactly-representable integers
    ratio = ((F.col("agree_match") + 1) * (F.col("n_nonmatch") + 2)).cast(
        "double"
    ) / ((F.col("agree_nonmatch") + 1) * (F.col("n_match") + 2)).cast("double")
    return counts.select(
        "field",
        "n_match",
        "n_nonmatch",
        "agree_match",
        "agree_nonmatch",
        F.round(m, 6).alias("m_prob"),
        F.round(u, 6).alias("u_prob"),
        F.round(ratio, 6).alias("mu_ratio"),
    )


def pr_threshold_sweep(
    scored: DataFrame,
    thresholds: list,
    score_col: str = "score",
    label_col: str = "label",
) -> DataFrame:
    """Precision/recall/F1 at each candidate decision threshold — the
    curve a curation pipeline reads before freezing a classifier gate
    (quality filter, language gate, dedup verdict): one row per
    threshold with the full confusion matrix. Predict positive when
    score >= threshold; rows with NULL labels are dropped, NULL scores
    never predict positive.

    ONE pass over the scored table: each row is exploded into
    |thresholds| (threshold, outcome) cells (thresholds are literals —
    tens, not thousands), aggregated with map-side partial combine on
    the tiny threshold key. Counts are exact longs; F1 uses the
    harmonic identity 2·tp / (2·tp + fp + fn) — ONE division, no
    compounding of rounded P and R. Feed binary-exact thresholds
    (k/2^m) or integer scores so the >= comparison is engine-exact."""
    if not thresholds:
        raise ValueError("thresholds must be non-empty")
    base = scored.filter(F.col(label_col).isNotNull()).select(
        F.col(score_col).alias("_sc"), F.col(label_col).cast("boolean").alias("_y")
    )
    cells = base.select(
        "_sc",
        "_y",
        F.explode(F.array(*[F.lit(t) for t in thresholds])).alias("threshold"),
    ).withColumn("_pos", F.col("_sc").isNotNull() & (F.col("_sc") >= F.col("threshold")))
    agg = cells.groupBy("threshold").agg(
        F.sum(F.when(F.col("_pos") & F.col("_y"), 1).otherwise(0))
        .cast("long")
        .alias("tp"),
        F.sum(F.when(F.col("_pos") & ~F.col("_y"), 1).otherwise(0))
        .cast("long")
        .alias("fp"),
        F.sum(F.when(~F.col("_pos") & F.col("_y"), 1).otherwise(0))
        .cast("long")
        .alias("fn"),
        F.sum(F.when(~F.col("_pos") & ~F.col("_y"), 1).otherwise(0))
        .cast("long")
        .alias("tn"),
    )
    return agg.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        "tn",
        F.when(
            (F.col("tp") + F.col("fp")) > 0,
            F.round(F.col("tp") / (F.col("tp") + F.col("fp")), 6),
        ).alias("precision"),
        F.when(
            (F.col("tp") + F.col("fn")) > 0,
            F.round(F.col("tp") / (F.col("tp") + F.col("fn")), 6),
        ).alias("recall"),
        F.when(
            (2 * F.col("tp") + F.col("fp") + F.col("fn")) > 0,
            F.round(
                (2 * F.col("tp")) / (2 * F.col("tp") + F.col("fp") + F.col("fn")), 6
            ),
        ).alias("f1"),
    )


def cohens_kappa(
    labels: DataFrame,
    a_col: str = "label_a",
    b_col: str = "label_b",
) -> DataFrame:
    """ONE-row Cohen's kappa — inter-annotator (or
    annotator-vs-heuristic) agreement corrected for chance: po =
    observed agreement rate, pe = Σ_k P_a(k)·P_b(k) the agreement two
    independent annotators with these marginals would produce, kappa =
    (po − pe)/(1 − pe). The labeling-QA gate for weak-supervision
    pipelines: raw agreement flatters labelers on skewed data; kappa
    doesn't.

    Exact arithmetic throughout: with S = Σ_k n_a(k)·n_b(k),
    kappa = (agree·n − S)/(n² − S) — numerator and denominator are
    EXACT longs (contract: n < ~3·10⁹ keeps n² inside int64; past that,
    sample — kappa is a statistic, not an aggregate that must see every
    row), so the single division is engine-identical. Marginal counts
    come from two tiny per-category aggregates joined on category
    (categories absent from one side contribute 0 to S via the inner
    join). Rows with a NULL on either side are dropped."""
    base = labels.select(
        F.col(a_col).alias("_a"), F.col(b_col).alias("_b")
    ).filter(F.col("_a").isNotNull() & F.col("_b").isNotNull())
    tot = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("_a") == F.col("_b"), 1).otherwise(0))
        .cast("long")
        .alias("n_agree"),
    )
    na = base.groupBy(F.col("_a").alias("_k")).agg(
        F.count(F.lit(1)).cast("long").alias("_na")
    )
    nb = base.groupBy(F.col("_b").alias("_k")).agg(
        F.count(F.lit(1)).cast("long").alias("_nb")
    )
    s = na.join(nb, "_k").agg(
        F.coalesce(F.sum(F.col("_na") * F.col("_nb")), F.lit(0))
        .cast("long")
        .alias("_s")
    )
    out = tot.crossJoin(F.broadcast(s))
    return out.select(
        "n",
        "n_agree",
        F.when(F.col("n") > 0, F.round(F.col("n_agree") / F.col("n"), 6)).alias("po"),
        F.when(
            F.col("n") > 0,
            F.round(F.col("_s") / (F.col("n") * F.col("n")), 6),
        ).alias("pe"),
        F.when(
            (F.col("n") * F.col("n") - F.col("_s")) > 0,
            F.round(
                (F.col("n_agree") * F.col("n") - F.col("_s"))
                / (F.col("n") * F.col("n") - F.col("_s")),
                6,
            ),
        ).alias("kappa"),
    )


def ndcg_discount_micro(k: int) -> list[int]:
    """Position-discount table for ndcg_at_k in exact micro-units:
    round(10⁶ / log2(i + 1)) for ranks i = 1..k. Computed ONCE driver-side
    and fed to both the Spark plan and any SQL restatement as the same
    integer literals — no engine ever evaluates a log, so the downstream
    arithmetic stays exact-integer."""
    import math

    if k < 1:
        raise ValueError("k must be >= 1")
    return [round(1_000_000 / math.log2(i + 1)) for i in range(1, k + 1)]


def ndcg_at_k(
    scored: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    cand_col: str = "candidate_id",
    score_col: str = "score",
    rel_col: str = "relevance",
) -> DataFrame:
    """ONE-row graded ranking quality — mean nDCG@k over queries: DCG of
    the score-ordered top-k (ties to the smaller candidate id) divided by
    the ideal DCG of the same candidates relevance-ordered. The graded
    complement of ranking_metrics' MRR/Hits: a linker that puts a
    partially-right KB entity at rank 1 and the exact one at rank 3
    scores between the binary extremes.

    Float discipline: discounts are the ndcg_discount_micro integer
    literals, per-rank contributions rel·w are exact longs, per-query
    nDCG is ONE integer micro-division (dcg·10⁶ div idcg), and the mean
    is a sum of exact longs with one final division — order-free, so the
    distributed sum can't wobble the result. Queries with idcg = 0 (no
    relevant candidate at all) are excluded and surfaced via n_queries
    vs n_scored_queries. Relevance must be a small non-negative integer
    (graded 0/1/2... — the standard convention)."""
    w_micro = ndcg_discount_micro(k)
    from pyspark.sql import Window

    sc = scored.select(
        F.col(query_col).alias("_q"),
        F.col(cand_col).alias("_c"),
        F.col(score_col).alias("_s"),
        F.col(rel_col).cast("long").alias("_r"),
    )
    weights = F.array(*[F.lit(w).cast("long") for w in w_micro])
    by_score = Window.partitionBy("_q").orderBy(
        F.col("_s").desc(), F.col("_c").asc()
    )
    by_rel = Window.partitionBy("_q").orderBy(F.col("_r").desc(), F.col("_c").asc())
    ranked = sc.withColumn("_rn", F.row_number().over(by_score)).withColumn(
        "_ri", F.row_number().over(by_rel)
    )
    dcg = (
        ranked.filter(F.col("_rn") <= k)
        .groupBy("_q")
        .agg(
            F.sum(F.col("_r") * F.element_at(weights, F.col("_rn").cast("int")))
            .cast("long")
            .alias("_dcg")
        )
    )
    idcg = (
        ranked.filter(F.col("_ri") <= k)
        .groupBy("_q")
        .agg(
            F.sum(F.col("_r") * F.element_at(weights, F.col("_ri").cast("int")))
            .cast("long")
            .alias("_idcg")
        )
    )
    per_q = dcg.join(idcg, "_q")
    # ONE aggregate pass — no driver-side count() that would force the
    # per-query table to compute twice; idcg = 0 queries are excluded
    # from the mean by the conditional sums
    return per_q.agg(
        F.count(F.lit(1)).cast("long").alias("n_scored_queries"),
        F.coalesce(F.sum(F.when(F.col("_idcg") > 0, 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("n_queries"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("_idcg") > 0,
                    F.expr("_dcg * CAST(1000000 AS BIGINT) div _idcg"),
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("_sum"),
    ).select(
        "n_scored_queries",
        "n_queries",
        F.when(
            F.col("n_queries") > 0,
            F.round(F.col("_sum") / (F.col("n_queries") * F.lit(1_000_000)), 6),
        ).alias(f"ndcg_at_{k}"),
    )


def retrieval_recall(
    truth: DataFrame,
    approx: DataFrame,
    probe_col: str = "probe_id",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-probe recall of an approximate retrieval against exact truth:
    (probe, k, n_hits, recall) where k = |truth set| and n_hits =
    |truth ∩ approx| — the measure-don't-guess gate behind every ANN
    shortcut (lsh_topk / ivf_topk vs brute_force_topk): an index whose
    recall@k sags below target needs more bands/probes BEFORE it ships,
    and this is the number that says so. Probes with no approx rows
    score an honest 0, not a missing row.

    Exact integer counts; recall = ONE round-6 division.

    Scale: one (probe, id) equi-join of two k-row-per-probe frames +
    two probe-keyed aggregates — nothing touches the corpus."""
    t = truth.select(F.col(probe_col).alias("_p"), F.col(id_col).alias("_i"))
    a = approx.select(F.col(probe_col).alias("_p"), F.col(id_col).alias("_i"))
    base = t.groupBy("_p").agg(F.count(F.lit(1)).cast("long").alias("k"))
    hits = t.join(a, ["_p", "_i"]).groupBy("_p").agg(
        F.count(F.lit(1)).cast("long").alias("n_hits")
    )
    return (
        base.join(hits, "_p", "left")
        .select(
            F.col("_p").alias(probe_col),
            "k",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0)).cast("double")
                / F.col("k").cast("double"),
                6,
            ).alias("recall"),
        )
    )


def classification_report(
    df: DataFrame,
    truth_col: str = "truth",
    pred_col: str = "pred",
) -> DataFrame:
    """Per-class precision/recall/F1 from (truth, pred) pairs: (label,
    n_true, n_pred, tp, precision, recall, f1) — the full confusion
    summary behind every classifier gate (lang-ID, quality classifier,
    type inference): cohens_kappa says WHETHER agreement beats chance,
    this says WHERE it fails (which class over-predicts, which never
    gets recalled). Labels that appear only in truth or only in pred
    still get a row (the silent-class failure mode).

    Exact counts; precision = tp/n_pred, recall = tp/n_true, and f1
    uses the integer identity 2·tp/(n_true+n_pred) — ONE division
    each, never the p·r/(p+r) float chain. Undefined ratios (zero
    denominator) are NULL, not 0 — a class with no predictions has no
    precision, which is different from bad precision.

    Scale: three label-keyed hash aggregates with map-side partials,
    two |labels|-row outer joins."""
    q = df.filter(
        F.col(truth_col).isNotNull() & F.col(pred_col).isNotNull()
    ).select(F.col(truth_col).alias("_t"), F.col(pred_col).alias("_p"))
    nt = q.groupBy(F.col("_t").alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n_true")
    )
    np_ = q.groupBy(F.col("_p").alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n_pred")
    )
    tp = q.filter(F.col("_t") == F.col("_p")).groupBy(
        F.col("_t").alias("label")
    ).agg(F.count(F.lit(1)).cast("long").alias("tp"))
    j = (
        nt.join(np_, "label", "full_outer")
        .join(tp, "label", "left")
        .select(
            "label",
            F.coalesce("n_true", F.lit(0)).cast("long").alias("n_true"),
            F.coalesce("n_pred", F.lit(0)).cast("long").alias("n_pred"),
            F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
        )
    )
    return j.select(
        "label",
        "n_true",
        "n_pred",
        "tp",
        F.when(
            F.col("n_pred") > 0,
            F.round(F.col("tp").cast("double") / F.col("n_pred").cast("double"), 6),
        ).alias("precision"),
        F.when(
            F.col("n_true") > 0,
            F.round(F.col("tp").cast("double") / F.col("n_true").cast("double"), 6),
        ).alias("recall"),
        F.when(
            F.col("n_true") + F.col("n_pred") > 0,
            F.round(
                F.lit(2.0) * F.col("tp").cast("double")
                / (F.col("n_true") + F.col("n_pred")).cast("double"),
                6,
            ),
        ).alias("f1"),
    )


def auc_roc(
    scored: DataFrame, score_col: str = "score", label_col: str = "label"
) -> DataFrame:
    """Exact ROC-AUC via the rank (Mann-Whitney) identity — one row
    (n_pos, n_neg, auc, gini): AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻) where
    R⁺ is the positive class' midrank sum. Ties get midranks (each tied
    pair contributes exactly ½), so this is the trapezoid-rule AUC a
    threshold sweep converges to — without materializing a sweep. The
    "is this quality/relevance score actually discriminative" gate that
    pr_threshold_sweep can't answer threshold-free.

    Exactness: ranks come from the DISTINCT score grid with the
    mann_whitney_u doubled-midrank trick (r2 = 2·rank is always an
    integer), so the numerator 2R⁺ − n⁺(n⁺+1)·... accumulates as exact
    wide integers; AUC is ONE division of exact longs, round-6'd.
    gini = 2·AUC − 1 from the same division.

    Scale: one hash aggregate to the (score, label) grid, one ordered
    window over |grid| rows, one single-row fold. Scores must already be
    engine-exact (integers, stored doubles, or round-6 outputs of an
    upstream operator) — the grid is the contract.
    """
    from pyspark.sql import Window

    q = scored.filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(score_col).alias("s"),
        F.col(label_col).cast("boolean").cast("int").alias("y"),
    )
    per_s = q.groupBy("s").agg(
        F.count(F.lit(1)).cast("long").alias("t"),
        F.sum("y").cast("long").alias("p"),
    )
    w = Window.orderBy("s")
    ranked = per_s.select(
        "p",
        "t",
        (
            2 * (F.sum("t").over(w.rowsBetween(Window.unboundedPreceding, 0)) - F.col("t"))
            + F.col("t")
            + 1
        ).cast("long").alias("r2"),
    )
    _dec = "decimal(38,0)"
    tot = ranked.agg(
        F.sum("p").cast("long").alias("n_pos"),
        F.sum(F.col("t") - F.col("p")).cast("long").alias("n_neg"),
        F.sum(F.col("p").cast(_dec) * F.col("r2").cast(_dec)).alias("r2_pos"),
    )
    npos = F.col("n_pos").cast(_dec)
    # 2·U = Σp·r2 − n⁺(n⁺+1); AUC = 2U / (2·n⁺·n⁻) — exact ints, one division
    num = (F.col("r2_pos") - npos * (npos + 1)).cast("double")
    den = (
        F.lit(2).cast(_dec) * npos * F.col("n_neg").cast(_dec)
    ).cast("double")
    auc = num / den
    ok = (F.col("n_pos") > 0) & (F.col("n_neg") > 0)
    return tot.select(
        "n_pos",
        "n_neg",
        F.when(ok, F.round(auc, 6)).alias("auc"),
        F.when(ok, F.round(F.lit(2.0) * auc - F.lit(1.0), 6)).alias("gini"),
    )


def calibration_bins(
    scored: DataFrame,
    n_bins: int = 10,
    score_col: str = "prob",
    label_col: str = "label",
) -> DataFrame:
    """Reliability diagram for a probabilistic classifier: one row per
    occupied confidence bin (bin, n, confidence, accuracy, gap,
    weighted_gap_micro). bin = min(⌊prob·n_bins⌋, n_bins−1) (the
    conventional right-closed top bin); confidence is the bin's mean
    predicted probability, accuracy its observed positive rate, gap
    their signed difference. ECE = Σ weighted_gap_micro / (N·10⁶) —
    emitted as the exact per-bin integer so the caller's fold stays
    engine-exact instead of summing rounded doubles.

    Exactness: probs are MICRO-quantized per row (exact long sum per
    bin — the repo grid recipe), positives are exact counts; confidence
    and accuracy are each ONE division, round-6'd. weighted_gap_micro =
    |Σprob_micro − pos·10⁶| is an exact long — no float in the ECE path
    at all.

    Scale: ONE hash aggregate on the tiny bin key, map-side partials.
    """
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    q = scored.filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.round(F.col(score_col) * F.lit(1_000_000.0), 0).cast("long").alias("pm"),
        F.col(label_col).cast("boolean").cast("int").alias("y"),
    )
    bin_ = F.least(
        F.floor(F.col("pm") * F.lit(n_bins) / F.lit(1_000_000)).cast("long"),
        F.lit(n_bins - 1).cast("long"),
    )
    agg = q.groupBy(bin_.alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("pm").cast("long").alias("_pms"),
        F.sum("y").cast("long").alias("_pos"),
    )
    nd = F.col("n").cast("double")
    conf = F.round(F.col("_pms").cast("double") / (nd * F.lit(1_000_000.0)), 6)
    acc = F.round(F.col("_pos").cast("double") / nd, 6)
    return agg.select(
        "bin",
        "n",
        conf.alias("confidence"),
        acc.alias("accuracy"),
        # difference of the two ROUNDED columns (a near-exact multiple of
        # 1e-6 — never lands on a round-half tie, where Spark's HALF_UP on
        # the shortest decimal string and DuckDB's correctly-rounded-double
        # semantics can disagree by one ulp of the 6th decimal)
        F.round(conf - acc, 6).alias("gap"),
        F.abs(F.col("_pms") - F.col("_pos") * F.lit(1_000_000)).alias(
            "weighted_gap_micro"
        ),
    )


def average_precision(
    scored: DataFrame, score_col: str = "score", label_col: str = "label"
) -> DataFrame:
    """Exact average precision (area under the precision-recall curve,
    threshold-sweep definition): one row (n_pos, n_neg, ap, prevalence).
    AP = Σ_i ΔR_i·P_i over DISTINCT score thresholds in decreasing
    order — the class-imbalance-honest companion to auc_roc (a 0.1%-
    positive task can have AUC .99 and AP .05; prevalence is AP's
    random-classifier floor, reported alongside).

    Exactness: the sweep runs over the distinct score grid (the same
    contract as auc_roc), cumulative TP/row counts are exact integers,
    each p_i·(cumTP_i/cum_i) term is nano-rounded (×1e9) and
    exact-summed, and the 1/n_pos division happens once.
    """
    from pyspark.sql import Window

    q = scored.filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(score_col).alias("s"),
        F.col(label_col).cast("boolean").cast("int").alias("y"),
    )
    per_s = q.groupBy("s").agg(
        F.count(F.lit(1)).cast("long").alias("t"),
        F.sum("y").cast("long").alias("p"),
    )
    w = Window.orderBy(F.col("s").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = per_s.select(
        "t",
        "p",
        F.sum("t").over(w).cast("long").alias("cum_t"),
        F.sum("p").over(w).cast("long").alias("cum_p"),
    )
    term = F.round(
        F.col("p").cast("double")
        * (F.col("cum_p").cast("double") / F.col("cum_t").cast("double"))
        * F.lit(1_000_000_000.0)
    ).cast("long")
    agg = cum.agg(
        F.sum("p").cast("long").alias("n_pos"),
        F.sum(F.col("t") - F.col("p")).cast("long").alias("n_neg"),
        F.sum(term).cast("long").alias("ap_nano"),
    )
    n = (F.col("n_pos") + F.col("n_neg")).cast("double")
    return agg.select(
        "n_pos",
        "n_neg",
        F.when(
            F.col("n_pos") > 0,
            F.round(
                F.col("ap_nano").cast("double")
                / (F.col("n_pos").cast("double") * F.lit(1_000_000_000.0)),
                6,
            ),
        ).alias("ap"),
        F.when(n > 0, F.round(F.col("n_pos").cast("double") / n, 6)).alias(
            "prevalence"
        ),
    )


def brier_decomposition(
    scored: DataFrame, prob_col: str = "prob", label_col: str = "label"
) -> DataFrame:
    """Brier score + Murphy decomposition — calibration_bins tells you
    WHERE a probability is off; this tells you the score's overall
    loss and WHY: one row (n, k_probs, brier, reliability, resolution,
    uncertainty). Brier = REL − RES + UNC holds as an EXACT identity
    here because the decomposition bins by DISTINCT forecast value
    (no within-bin forecast spread), not by coarse deciles.

    Exactness: probs quantize to the micro grid, the Brier numerator
    Σ(qp − 1e6·y)² is an exact wide-integer sum, each bin's
    n_k·(p̄_k − ȳ_k)² / n_k·(ȳ_k − ȳ)² term is a fixed double
    expression pico-rounded (×1e12) and exact-summed, and every /n
    happens once on final scalars.
    """
    q = scored.filter(
        F.col(prob_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.round(F.col(prob_col) * F.lit(1_000_000)).cast("long").alias("qp"),
        F.col(label_col).cast("boolean").cast("int").alias("y"),
    )
    tot = q.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
        F.sum(
            (F.col("qp") - F.lit(1_000_000) * F.col("y")).cast(_DEC)
            * (F.col("qp") - F.lit(1_000_000) * F.col("y")).cast(_DEC)
        ).alias("bsum"),
    )
    cells = q.groupBy("qp").agg(
        F.count(F.lit(1)).cast("long").alias("nk"),
        F.sum("y").cast("long").alias("posk"),
    )
    j = cells.crossJoin(F.broadcast(tot))
    PICO = F.lit(1_000_000_000_000.0)
    pbar = F.col("qp").cast("double") / F.lit(1_000_000.0)
    ybark = F.col("posk").cast("double") / F.col("nk").cast("double")
    ybar = F.col("pos").cast("double") / F.col("n").cast("double")
    rel_t = F.round(
        F.col("nk").cast("double") * (pbar - ybark) * (pbar - ybark) * PICO
    ).cast(_DEC)
    res_t = F.round(
        F.col("nk").cast("double") * (ybark - ybar) * (ybark - ybar) * PICO
    ).cast(_DEC)
    agg = j.groupBy("n", "pos", "bsum").agg(
        F.count(F.lit(1)).cast("long").alias("k_probs"),
        F.sum(rel_t).alias("rel_p"),
        F.sum(res_t).alias("res_p"),
    )
    nd = F.col("n").cast("double")
    rate = F.col("pos").cast("double") / nd
    return agg.select(
        "n",
        "k_probs",
        F.round(
            F.col("bsum").cast("double") / (nd * F.lit(1e12)), 6
        ).alias("brier"),
        F.round(F.col("rel_p").cast("double") / (nd * PICO), 6).alias(
            "reliability"
        ),
        F.round(F.col("res_p").cast("double") / (nd * PICO), 6).alias(
            "resolution"
        ),
        F.round(rate * (1 - rate), 6).alias("uncertainty"),
    )


def lift_gains(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    n_buckets: int = 10,
) -> DataFrame:
    """Decile lift / cumulative-gains table — "if we act on the top k%
    by score, what fraction of positives do we capture": one row per
    occupied bucket (bucket, n, n_pos, cum_pct_rows, cum_gain, lift).
    bucket 0 is the highest-score decile; lift is the bucket's positive
    rate over the base rate; cum_gain is recall-at-depth. The campaign-
    targeting view of the same score auc_roc grades threshold-free.

    Tie-deterministic BY CONSTRUCTION (the trap in a naive ntile():
    ties straddling a decile boundary land by partition order): a tied
    score block is assigned wholly by its grid START offset,
    bucket = ⌊start·B/n⌋ — pure integers, so two engines cannot split
    a tie differently. Cumulative sums run over ≤ B ordered buckets.
    """
    from pyspark.sql import Window

    q = scored.filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(score_col).alias("s"),
        F.col(label_col).cast("boolean").cast("int").alias("y"),
    )
    per_s = q.groupBy("s").agg(
        F.count(F.lit(1)).cast("long").alias("t"),
        F.sum("y").cast("long").alias("p"),
    )
    w = Window.orderBy(F.col("s").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = per_s.agg(
        F.sum("t").cast("long").alias("n_all"),
        F.sum("p").cast("long").alias("pos_all"),
    )
    staged = per_s.select(
        "t",
        "p",
        (F.sum("t").over(w) - F.col("t")).cast("long").alias("start"),
    ).crossJoin(F.broadcast(tot))
    bucketed = staged.groupBy(
        F.floor(
            F.col("start") * F.lit(n_buckets) / F.col("n_all")
        ).cast("long").alias("bucket")
    ).agg(
        F.sum("t").cast("long").alias("n"),
        F.sum("p").cast("long").alias("n_pos"),
        F.max("n_all").cast("long").alias("n_all"),
        F.max("pos_all").cast("long").alias("pos_all"),
    )
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = bucketed.select(
        "bucket",
        "n",
        "n_pos",
        "n_all",
        "pos_all",
        F.sum("n").over(wb).cast("long").alias("cum_n"),
        F.sum("n_pos").over(wb).cast("long").alias("cum_pos"),
    )
    base = F.col("pos_all").cast("double") / F.col("n_all").cast("double")
    return cum.select(
        "bucket",
        "n",
        "n_pos",
        F.round(
            F.col("cum_n").cast("double") / F.col("n_all").cast("double"), 6
        ).alias("cum_pct_rows"),
        F.when(
            F.col("pos_all") > 0,
            F.round(
                F.col("cum_pos").cast("double")
                / F.col("pos_all").cast("double"),
                6,
            ),
        ).alias("cum_gain"),
        F.when(
            F.col("pos_all") > 0,
            F.round(
                (F.col("n_pos").cast("double") / F.col("n").cast("double"))
                / base,
                6,
            ),
        ).alias("lift"),
    )


def binary_confusion_stats(
    scored: DataFrame, pred_col: str = "pred", label_col: str = "label"
) -> DataFrame:
    """Binary confusion summary with the imbalance-honest scalars —
    one row (tp, fp, fn, tn, precision, recall, f1, balanced_acc,
    mcc). MCC = (tp·tn − fp·fn)/√((tp+fp)(tp+fn)(tn+fp)(tn+fn)) is
    the single-number gate that cannot be gamed by predicting the
    majority class (accuracy and even F1 can); balanced accuracy is
    its interpretable companion. classification_report gives the
    per-class view; this is the one-row decision gate.

    Exact: four integer cells from ONE hash fold; every metric is a
    fixed double sequence (one sqrt for MCC) on those exact integers.
    """
    q = scored.filter(
        F.col(pred_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(pred_col).cast("boolean").alias("p"),
        F.col(label_col).cast("boolean").alias("y"),
    )
    agg = q.agg(
        F.sum((F.col("p") & F.col("y")).cast("int")).cast("long").alias("tp"),
        F.sum((F.col("p") & ~F.col("y")).cast("int")).cast("long").alias("fp"),
        F.sum((~F.col("p") & F.col("y")).cast("int")).cast("long").alias("fn"),
        F.sum((~F.col("p") & ~F.col("y")).cast("int")).cast("long").alias("tn"),
    )
    tp = F.col("tp").cast("double")
    fp = F.col("fp").cast("double")
    fn = F.col("fn").cast("double")
    tn = F.col("tn").cast("double")
    prec = tp / (tp + fp)
    rec = tp / (tp + fn)
    tnr = tn / (tn + fp)
    mcc_den = F.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    return agg.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.when(F.col("tp") + F.col("fp") > 0, F.round(prec, 6)).alias(
            "precision"
        ),
        F.when(F.col("tp") + F.col("fn") > 0, F.round(rec, 6)).alias("recall"),
        F.when(
            2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
            F.round(2 * tp / (2 * tp + fp + fn), 6),
        ).alias("f1"),
        F.when(
            (F.col("tp") + F.col("fn") > 0) & (F.col("tn") + F.col("fp") > 0),
            F.round((rec + tnr) / 2, 6),
        ).alias("balanced_acc"),
        F.when(
            mcc_den > 0, F.round((tp * tn - fp * fn) / mcc_den, 6)
        ).alias("mcc"),
    )


def regression_metrics(
    scored: DataFrame, pred_col: str = "pred", actual_col: str = "actual"
) -> DataFrame:
    """Regression-predictor report — one row (n, mae, rmse, r2, mape)
    over (prediction, actual) pairs: the numeric-model counterpart of
    binary_confusion_stats. R² = 1 − SSE/SST (SST about the actuals'
    mean — negative R² means the predictor is worse than predicting
    the mean); MAPE skips zero actuals (n_mape reported implicitly by
    its NULL when none qualify).

    Engine-exact: both columns micro-quantize (×1e6), so every error
    is an INTEGER difference — |e| and e² sums are exact wide
    integers; SST comes from exact actual moments; each |e|/|y| MAPE
    term is one double division micro-rounded and exact-summed. ONE
    hash fold, one division (+1 sqrt) per metric.
    """
    q = scored.filter(
        F.col(pred_col).isNotNull() & F.col(actual_col).isNotNull()
    ).select(
        F.round(F.col(pred_col) * F.lit(1_000_000)).cast("long").alias("qp"),
        F.round(F.col(actual_col) * F.lit(1_000_000)).cast("long").alias("qy"),
    )
    e = F.col("qp") - F.col("qy")
    mape_t = F.when(
        F.col("qy") != 0,
        F.round(
            F.abs(e).cast("double") / F.abs(F.col("qy")).cast("double")
            * F.lit(1_000_000.0)
        ),
    ).cast("long")
    agg = q.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.abs(e)).cast(_DEC).alias("sae"),
        F.sum(e.cast(_DEC) * e.cast(_DEC)).alias("sse"),
        F.sum(F.col("qy").cast(_DEC)).alias("sy"),
        F.sum(F.col("qy").cast(_DEC) * F.col("qy").cast(_DEC)).alias("syy"),
        F.count(F.when(F.col("qy") != 0, F.lit(1))).cast("long").alias("n_mape"),
        F.sum(mape_t).cast("long").alias("smape_t"),
    )
    nd = F.col("n").cast("double")
    MICRO = F.lit(1_000_000.0)
    sst = (
        F.col("n").cast(_DEC) * F.col("syy") - F.col("sy") * F.col("sy")
    ).cast("double") / nd
    ssed = F.col("sse").cast("double")
    return agg.select(
        "n",
        F.when(F.col("n") > 0, F.round(F.col("sae").cast("double") / (nd * MICRO), 6)).alias("mae"),
        F.when(F.col("n") > 0, F.round(F.sqrt(ssed / nd) / MICRO, 6)).alias("rmse"),
        F.when(sst > 0, F.round(1 - ssed / sst, 6)).alias("r2"),
        F.when(
            F.col("n_mape") > 0,
            F.round(
                F.col("smape_t").cast("double")
                / (F.col("n_mape").cast("double") * MICRO),
                6,
            ),
        ).alias("mape"),
    )


def rank_biased_overlap(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str = "id",
    rank_col: str = "rank",
    k: int = 20,
    p: float = 0.9,
) -> DataFrame:
    """Truncated rank-biased overlap (RBO@k) between two rankings —
    "do these two scoring functions surface the same things, weighted
    toward the top" (Kendall/Spearman need the same support set and
    weigh rank 1 like rank 1000; RBO compares top-k lists from
    different universes): one row (k, n_both, overlap_at_k, rbo).
    rbo = (1−p)·Σ_{d≤k} p^{d−1}·X_d/d with X_d = |A_d ∩ B_d| —
    the truncated (lower-bound) form, documented; p = 0.9 ⇒ the top
    ~10 ranks carry most of the weight.

    Exactness: X_d comes from each shared id's joint depth
    m = max(rank_a, rank_b) — integer grid counts joined to the ≤ k
    depth frame (k² tiny rows, never a data-sized pairing); each
    p^{d−1}·X_d/d term is nano-rounded and exact-summed, so the two
    engines' pow() ulps cannot reorder anything. Callers must supply
    DETERMINISTIC ranks (ties broken by id — see the query wrappers).
    """
    a = ranked_a.filter(F.col(rank_col) <= k).select(
        F.col(id_col).alias("id"), F.col(rank_col).cast("long").alias("ra")
    )
    b = ranked_b.filter(F.col(rank_col) <= k).select(
        F.col(id_col).alias("id"), F.col(rank_col).cast("long").alias("rb")
    )
    joint = a.join(b, "id").select(
        F.greatest("ra", "rb").alias("m")
    )
    mcells = joint.groupBy("m").agg(F.count(F.lit(1)).cast("long").alias("c"))
    spark = ranked_a.sparkSession
    depths = spark.range(1, k + 1).select(F.col("id").cast("long").alias("d"))
    xd = (
        depths.join(F.broadcast(mcells), F.col("m") <= F.col("d"), "left")
        .groupBy("d")
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("x"))
    )
    term = F.round(
        F.pow(F.lit(float(p)), (F.col("d") - 1).cast("double"))
        * F.col("x").cast("double")
        / F.col("d").cast("double")
        * F.lit(1_000_000_000.0)
    ).cast("long")
    n_both = joint.agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    agg = xd.agg(
        F.sum(term).cast("long").alias("t_nano"),
        F.max(F.when(F.col("d") == k, F.col("x"))).cast("long").alias(
            "overlap_at_k"
        ),
    ).crossJoin(F.broadcast(n_both))
    return agg.select(
        F.lit(k).cast("long").alias("k"),
        "n_both",
        "overlap_at_k",
        F.round(
            F.lit(1.0 - float(p))
            * F.col("t_nano").cast("double") / F.lit(1_000_000_000.0),
            6,
        ).alias("rbo"),
    )
