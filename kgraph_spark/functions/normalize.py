"""Normalization keys — Python and Spark-column twins that MUST agree.

norm_key mirrors the reference's normalize_mention_key
(kgraph/pipeline/streaming.py:277-300): casefold, keep alnum+space,
collapse whitespace. norm_dedup adds the British→American spelling map
(dedup.py:36-41). The Spark expressions are pure built-ins so they stay
inside whole-stage codegen (no Python in the hot path)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from kgraph_spark.config import SPELLING_NORMALIZATIONS


def norm_key_py(name: str) -> str:
    key = "".join(c for c in name.strip().casefold() if c.isalnum() or c.isspace())
    key = " ".join(key.split())
    return key or name.strip().casefold()


def norm_dedup_py(name: str) -> str:
    n = norm_key_py(name)
    return SPELLING_NORMALIZATIONS.get(n, n)


def norm_key_col(col: Column) -> Column:
    """Spark twin of norm_key_py (ASCII corpus: [^a-z0-9\\s] drop == isalnum filter)."""
    cleaned = F.regexp_replace(F.lower(F.trim(col)), r"[^a-z0-9\s]", "")
    collapsed = F.trim(F.regexp_replace(cleaned, r"\s+", " "))
    return F.when(collapsed == "", F.lower(F.trim(col))).otherwise(collapsed)


def norm_dedup_col(col: Column) -> Column:
    """Column-expression fallback for inputs without a precomputed norm key.

    Uses a map-literal lookup instead of a when-chain: a chained
    when(key==brit,...).otherwise(prev) embeds the (already large) norm_key
    regex expression once per spelling entry, and pushed-down join-key
    filters then re-evaluate the whole chain per row — measured ~25s on a
    broadcast join that should take 2s. element_at(map, key) references the
    key expression twice total. The hot path avoids even that: the
    extraction pUDF emits precomputed norm keys (operators/mentions.py)."""
    key = norm_key_col(col)
    m = F.create_map(
        *[F.lit(x) for pair in SPELLING_NORMALIZATIONS.items() for x in pair]
    )
    return F.coalesce(F.element_at(m, key), key)
