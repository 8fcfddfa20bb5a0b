"""Deterministic negative sampling for KG-embedding training.

A knowledge-graph construction pipeline's downstream consumer is usually
an embedding trainer (TransE-family), which needs k corrupted triples per
true triple — same (subject, predicate), object replaced by a random
entity that is NOT a true object. The reference materializes only
positive triples (kgraph/ingest.py accumulation); this op is the training
-data step after it.

Determinism contract: the j-th negative for a triple is a pure function
of (s, p, o, j, salt) — an md5-prefix draw over a dense entity index —
so reruns, engines, and resumed jobs produce the identical sample set
(the same reproducibility stance as stratified_sample / train_val_test
_split; rand()-based sampling resamples per retry and can't be oracled).

Scale: the entity index is dense-ranked with ONE global-order window —
fine for entity dimensions (≪ corpus; the KB side of the D4 join), and
the draw itself is map-only arithmetic. The index join is entity-keyed
(broadcastable dim), and false negatives — draws that happen to be true
objects — are removed with one LeftAnti join against the positive set
(the standard "filtered" negative-sampling variant). Collision rate k/n
is the usual tradeoff; regenerate with a bumped salt for fresh epochs."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def negative_samples(
    triples: DataFrame,
    entities: DataFrame,
    k: int = 3,
    entity_col: str = "id",
    salt: str = "neg-v1",
) -> DataFrame:
    """k filtered negatives per (subject_id, predicate, object_id) triple:
    (subject_id, predicate, object_id, sample_idx, neg_object_id), where
    neg_object_id = entities[ md5(s|p|o|j|salt)-prefix mod |entities| ]
    and draws equal to a true object of (s, p) … (exact-triple match) are
    dropped."""
    if k < 1:
        raise ValueError("k must be >= 1")
    ents = entities.select(F.col(entity_col).alias("neg_object_id")).distinct()
    n = ents.count()
    if n == 0:
        raise ValueError("entities is empty")
    idx = ents.withColumn(
        "_i", (F.row_number().over(Window.orderBy("neg_object_id")) - 1).cast("long")
    )
    expanded = triples.select(
        "subject_id", "predicate", "object_id",
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("sample_idx"),
    )
    digest = F.md5(
        F.concat(
            F.col("subject_id"), F.lit("|"), F.col("predicate"), F.lit("|"),
            F.col("object_id"), F.lit("|"),
            F.col("sample_idx").cast("string"), F.lit(salt),
        )
    )
    hashed = expanded.withColumn(
        "_i", (F.conv(F.substring(digest, 1, 6), 16, 10).cast("long") % n)
    )
    drawn = hashed.join(idx, "_i").drop("_i")
    return drawn.join(
        triples.select(
            "subject_id", "predicate", F.col("object_id").alias("neg_object_id")
        ),
        ["subject_id", "predicate", "neg_object_id"],
        "left_anti",
    ).select(
        "subject_id", "predicate", "object_id",
        F.col("sample_idx").cast("long").alias("sample_idx"),
        "neg_object_id",
    )
