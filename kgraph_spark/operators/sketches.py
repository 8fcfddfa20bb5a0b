"""Count-min sketch heavy hitters — deterministic, hence oracle-able.

The classic fixed-memory frequency structure (Cormode & Muthukrishnan
2005): d hash rows × w buckets of counters; an item's estimate is the MIN
of its d bucket counters, which never undercounts and overcounts only by
colliding keys' mass. At 100 TB the d×w sketch is the whole point — it
builds with ONE bounded-size aggregation (the shuffle carries ≤ d·w
running counters regardless of corpus size), merges across
batches/streams by cell-wise addition, and answers "is this key hot?"
without per-key state. Hash rows use md5-prefix arithmetic (the repo's
engine-portable hash), so the sketch — and every estimate — is
bit-identical across engines, runs, and partitionings: the oracle
recomputes the exact same sketch in SQL.

This module keeps the batch form; the streaming twin is the same
groupBy((row, bucket)).sum over an incremental batch unioned cell-wise
onto the persisted sketch (the Bloom-digest pattern streaming/dedup.py
already establishes)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(key, i: int, w: int):
    return F.conv(
        F.substring(F.md5(F.concat(key, F.lit(f"#cms{i}"))), 1, 8), 16, 10
    ).cast("long") % w


def cms_sketch(df: DataFrame, key_col: str, d: int = 3, w: int = 512) -> DataFrame:
    """(row, bucket, cnt) — the d×w counter table. One posexplode (d rows
    per input row, ids only) into one partial/final hash aggregate whose
    result is ≤ d·w rows — bounded memory at ANY input size."""
    if d < 1 or w < 2:
        raise ValueError("need d >= 1 and w >= 2")
    key = F.col(key_col)
    cells = F.array(
        *[F.struct(F.lit(i).alias("row"), _bucket(key, i, w).alias("bucket")) for i in range(d)]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    min_count: int,
    d: int = 3,
    w: int = 512,
) -> DataFrame:
    """Keys whose CMS estimate reaches min_count, with the exact count
    alongside: (key, exact, estimate, overcount). estimate >= exact always
    (one-sided error) — the sketch SHORTLISTS, never misses, and the exact
    pass runs only to expose the collision overcount (at scale you keep
    the shortlist and drop the exact join, or verify just the shortlist).
    The estimate join probes the ≤ d·w sketch — broadcast-sized by
    construction."""
    sk = cms_sketch(df, key_col, d, w)
    keys = df.select(F.col(key_col).alias("key")).groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("exact")
    )
    probes = keys.select(
        "key",
        "exact",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("row"), _bucket(F.col("key"), i, w).alias("bucket"))
                    for i in range(d)
                ]
            )
        ).alias("c"),
    ).select("key", "exact", F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
    est = (
        probes.join(F.broadcast(sk), ["row", "bucket"])
        .groupBy("key", "exact")
        .agg(F.min("cnt").cast("long").alias("estimate"))
    )
    return (
        est.filter(F.col("estimate") >= min_count)
        .select("key", "exact", "estimate", (F.col("estimate") - F.col("exact")).cast("long").alias("overcount"))
    )
