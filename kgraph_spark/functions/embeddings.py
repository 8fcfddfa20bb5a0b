"""Deterministic embedding generation + cache-as-table (SURVEY.md §2 I1).

Mirrors the reference's deterministic hash embeddings used by its own test
suite (tests/conftest.py:198-225) — a pure function of the text so every
executor/run agrees — and its embedding caches (kgraph/pipeline/caching.py):
"cache hit" becomes a join against a persisted embeddings table, compute
only the misses (anti-join), then union. A real model would replace
`hash_embedding` inside the same pandas_udf; the dataflow is identical."""

from __future__ import annotations

import hashlib
import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kgraph_spark.functions.normalize import norm_key_py

DIM = 32


def hash_embedding(text: str, dim: int = DIM) -> list[float]:
    """L2-normalized deterministic vector from sha256 of the normalized
    text. Similar surface forms do NOT get similar vectors (like the
    reference's mock) — identity, not semantics."""
    h = hashlib.sha256(norm_key_py(text or "").encode()).digest()
    # stretch digest to dim bytes
    buf = (h * ((dim // len(h)) + 1))[:dim]
    v = np.frombuffer(buf, dtype=np.uint8).astype(np.float64) - 127.5
    n = math.sqrt(float((v * v).sum())) or 1.0
    return [float(x / n) for x in v]


@F.pandas_udf(T.ArrayType(T.FloatType()))
def embed_text(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: hash_embedding(t))


LETTERS = "abcdefghijklmnopqrstuvwxyz"


def letter_frequency_embedding(col):
    """SQL-restatable toy encoder: 26-dim letter-count vector as a pure
    column expression (no UDF). Unlike `hash_embedding` (identity, not
    semantics), letter frequencies give STRING-SIMILAR texts similar
    vectors, so the F4 semantic cosine fallback grades real signal — and
    every component is an integer-valued double, so dot products and norms
    are bit-exact across Spark and DuckDB (`list_transform(letters, c ->
    length(s) - length(replace(s, c, '')))`), making the ladder
    driver-oracle-verifiable. A real encoder plugs into the same
    (string column → array) seam."""
    lower = F.lower(col)
    return F.array(
        *[
            (F.length(lower) - F.length(F.replace(lower, F.lit(c), F.lit("")))).cast(
                "double"
            )
            for c in LETTERS
        ]
    )


def embed_with_cache(
    texts: DataFrame,
    cache: DataFrame | None,
    text_col: str = "name",
    key_col: str = "entity_id",
) -> DataFrame:
    """(key, text) + optional cache(key, embedding) → (key, text, embedding).

    Cache hits via left join; only misses run the UDF (the reference's
    CachedEmbeddingGenerator, caching.py:171-533, as set algebra)."""
    if cache is None:
        return texts.withColumn("embedding", embed_text(F.col(text_col)))
    hits = texts.join(cache.select(key_col, "embedding"), key_col, "inner")
    misses = texts.join(cache.select(key_col), key_col, "left_anti").withColumn(
        "embedding", embed_text(F.col(text_col))
    )
    return hits.unionByName(misses)
