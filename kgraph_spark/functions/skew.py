"""Skew handling: salted two-phase aggregation (SURVEY.md §4; north_rule
"salted keys for skewed entity mentions").

Where skew actually lands in this pipeline (and why most of it needs no
salt):
  * mention→entity resolution joins are BROADCAST — the hot entity (planted
    in ~10% of documents) never becomes a shuffle key;
  * per-document groupBys key on doc_id — uniform by construction;
  * the (s,p,o) accumulation has map-side partial aggregation, so a hot
    triple key ships one partial row per map partition, not one per source
    row.
The residual risk is aggregations that build PER-KEY COLLECTIONS
(collect_set of supporting documents for the hot entity = 10% of the
corpus): partial aggregation still materializes the full set in one
reducer. `salted_agg` is the standard two-phase answer: aggregate on
(key, salt) first, then merge the partials per key."""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16, col_name: str = "_salt") -> DataFrame:
    """Deterministic salt derived from the row content is NOT needed here —
    the salt only spreads rows, so a cheap uniform source is fine; we use
    pmod(xxhash64 of all columns) to stay deterministic for resume."""
    return df.withColumn(col_name, F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)).cast("int"))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: Callable[[DataFrame], list[Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) applying partial_aggs,
    then groupBy(keys) applying final_aggs over the partial columns.

    Example (hot-entity supporting-documents):
        salted_agg(mentions, ["entity_id"],
                   [F.collect_set("doc_id").alias("docs_part"),
                    F.count("*").alias("n_part")],
                   lambda d: [F.array_distinct(F.flatten(F.collect_list("docs_part"))).alias("docs"),
                              F.sum("n_part").alias("n")])"""
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs(partial))


def salted_count(df: DataFrame, keys: list[str], n_salts: int = 16) -> DataFrame:
    """Salted count — equivalent to groupBy(keys).count() but with the hot
    key's rows pre-reduced across n_salts reducers."""
    return salted_agg(
        df,
        keys,
        [F.count("*").alias("_n_part")],
        lambda _d: [F.sum("_n_part").alias("count")],
        n_salts,
    )


def salted_collect_set(df: DataFrame, keys: list[str], value: str, n_salts: int = 16) -> DataFrame:
    """Salted collect_set(value) per key."""
    return salted_agg(
        df,
        keys,
        [F.collect_set(value).alias("_vals_part")],
        lambda _d: [
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("_vals_part")))).alias(value + "s")
        ],
        n_salts,
    )
