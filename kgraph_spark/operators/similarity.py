"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the correctness baseline, and an LSH-bucketed
(random hyperplane sign) variant as the scale path — mirrors the reference's
embedding matchers (find_by_embedding, kgraph/storage/memory.py:123-151;
find_merge_candidates ingest.py:864-925) which are brute force with an
explicit "use ANN at scale" caveat (ingest.py:877-880). The blocked variant
is the answer to that caveat.

Dot products use built-in higher-order functions (zip_with + aggregate) —
JVM-side, no Python in the hot path."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    items: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """(probe_id, vec_id, cosine, rank) — probes broadcast against the item
    table (probe set is small; items scan once, no shuffle of items)."""
    p = F.broadcast(
        probes.select(F.col(probe_id_col), F.col(vec_col).alias("_pvec"))
    )
    scored = items.crossJoin(p).select(
        probe_id_col,
        id_col,
        cosine_col(F.col(vec_col), F.col("_pvec")).alias("cosine"),
    )
    w = Window.partitionBy(probe_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_buckets(
    df: DataFrame,
    dim: int,
    n_planes: int = 12,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-random-projection LSH bucket id per vector (deterministic
    seeded hyperplanes computed driver-side, shipped as literals)."""
    import random

    rng = random.Random(seed)
    planes = [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        proj = _dot(F.col(vec_col), F.array(*[F.lit(x) for x in plane]))
        bucket = bucket + F.when(proj >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0))
    return df.withColumn("bucket", bucket)


def lsh_topk(
    items: DataFrame,
    probes: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """Approximate top-k: only score items in the probe's LSH bucket —
    the 1000-executor path where brute force would scan everything.
    Recall/latency trades via n_planes (fewer planes → bigger buckets)."""
    bi = hyperplane_buckets(items, dim, n_planes, vec_col=vec_col)
    bp = hyperplane_buckets(probes, dim, n_planes, vec_col=vec_col).select(
        probe_id_col, F.col(vec_col).alias("_pvec"), "bucket"
    )
    scored = bi.join(F.broadcast(bp), "bucket").select(
        probe_id_col, id_col, cosine_col(F.col(vec_col), F.col("_pvec")).alias("cosine")
    )
    w = Window.partitionBy(probe_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def blocked_pair_similarity(
    entities: DataFrame,
    threshold: float,
    block_col: str = "entity_type",
    id_col: str = "entity_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """D10/D11 blocked similarity self-join: same-block pairs with cosine ≥
    threshold (block by class — the reference's same-class provisional merge
    at ≥0.88, dedup.py:640-761). Never a global cross join."""
    a = entities.select(F.col(id_col).alias("id_a"), F.col(block_col).alias("blk"), F.col(vec_col).alias("va"))
    b = entities.select(F.col(id_col).alias("id_b"), F.col(block_col).alias("blk"), F.col(vec_col).alias("vb"))
    pairs = a.join(b, ["blk"]).filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("cosine", cosine_col(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("blk", "id_a", "id_b", "cosine")
    )
