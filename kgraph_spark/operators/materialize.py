"""Incremental materialized-aggregate maintenance — the Iceberg/Delta
changelog pattern: a huge materialized GROUP BY is refreshed from a
(small) change stream instead of recomputed over the full corpus. Inserts
carry op = +1, deletes op = −1 (an update is delete+insert); counts and
sums are ABELIAN under signed multiplicity, so the refresh is

    delta  = changelog aggregated with op-signed terms   (small shuffle)
    merged = base FULL OUTER JOIN delta on the keys      (one key join)
    keep   = groups whose refreshed count stays > 0

and the result equals the from-scratch aggregate over the post-change
corpus EXACTLY — which is the test and the oracle.

Float discipline: the materialized sum is stored as round-6 FIXED-POINT
LONGS (`sum_units`), because a float running sum would drift by
association order across refresh histories (the repo-wide lesson); the
double `value_sum` is derived on read by one division. At 100 TB the
changelog shuffle is proportional to the CHANGES and the merge join is
key-partitioned on both sides (bucket both tables by the keys in Iceberg
and it is shuffle-free)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_UNITS = 1_000_000


def _units(value_col: str):
    return F.round(F.col(value_col) * _UNITS, 0).cast("long")


def init_aggregate(
    rows: DataFrame, keys: list[str], value_col: str = "value"
) -> DataFrame:
    """Materialize (keys…, n, sum_units) from a full snapshot — the
    bootstrap refresh_aggregate then maintains. NULL values count toward
    n but not the sum (SQL aggregate semantics, preserved by refresh)."""
    return rows.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.coalesce(F.sum(_units(value_col)), F.lit(0)).cast("long").alias("sum_units"),
    )


def refresh_aggregate(
    base: DataFrame,
    changelog: DataFrame,
    keys: list[str],
    value_col: str = "value",
    op_col: str = "op",
) -> DataFrame:
    """Apply a +1/−1 changelog to a materialized aggregate. The changelog
    must be consistent (deletes reference rows present in the base state);
    groups whose count reaches 0 drop out of the materialization, exactly
    as a recompute would drop them."""
    delta = changelog.groupBy(*keys).agg(
        F.sum(F.col(op_col)).cast("long").alias("_dn"),
        F.coalesce(F.sum(F.col(op_col) * _units(value_col)), F.lit(0))
        .cast("long")
        .alias("_dsum"),
    )
    merged = base.join(delta, keys, "full_outer").select(
        *keys,
        (F.coalesce(F.col("n"), F.lit(0)) + F.coalesce(F.col("_dn"), F.lit(0)))
        .cast("long")
        .alias("n"),
        (
            F.coalesce(F.col("sum_units"), F.lit(0))
            + F.coalesce(F.col("_dsum"), F.lit(0))
        )
        .cast("long")
        .alias("sum_units"),
    )
    return merged.filter(F.col("n") > 0)


def read_aggregate(agg: DataFrame) -> DataFrame:
    """Reader view: expose the fixed-point sum as a round-6 double."""
    return agg.select(
        *[c for c in agg.columns if c != "sum_units"],
        F.round(F.col("sum_units") / float(_UNITS), 6).alias("value_sum"),
    )
