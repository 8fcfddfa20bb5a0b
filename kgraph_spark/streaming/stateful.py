"""Custom stateful streaming operator: running per-entity usage counts via
applyInPandasWithState (the D6 usage accumulator as an online operator).

The reference increments usage_count per mention inside its ingest loop
(kgraph/ingest.py:353-374); the streaming twin keeps that counter as
per-entity group state over an unbounded document stream — the pattern any
custom stateful operator (dedup windows, session carts, entity caches)
follows on this pipeline."""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from kgraph_spark.schemas import DOCUMENTS

OUTPUT_SCHEMA = "entity_id string, total_mentions long, docs_seen long"
STATE_SCHEMA = "total long, docs long"


def _update_counts(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    total, docs = state.get if state.exists else (0, 0)
    new_docs = set()
    for pdf in pdfs:
        total += len(pdf)
        new_docs.update(pdf["doc_id"])
    docs += len(new_docs)  # approximation: docs are file-batched, not replayed
    state.update((total, docs))
    yield pd.DataFrame({"entity_id": [key[0]], "total_mentions": [total], "docs_seen": [docs]})


def start_entity_usage_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    gazetteer_rows: list[tuple],
    query_name: str = "entity_usage",
):
    """documents stream → mention extraction (same fused pUDF) → stateful
    per-entity running usage counts → in-memory sink (update mode).

    Returns the StreamingQuery; read current totals from the `query_name`
    in-memory table."""
    from pyspark.sql import functions as F

    from kgraph_spark.operators.mentions import extract_all, mentions_from_extracted
    from kgraph_spark.operators.resolve import alias_index_df, resolve_mentions

    gaz_bcast = spark.sparkContext.broadcast(gazetteer_rows)
    alias_index = alias_index_df(spark, gazetteer_rows)

    stream = spark.readStream.schema(DOCUMENTS).option("maxFilesPerTrigger", 16).parquet(input_dir)
    mentions = resolve_mentions(mentions_from_extracted(extract_all(stream, gaz_bcast)), alias_index)
    counts = mentions.select("doc_id", "entity_id").groupBy("entity_id").applyInPandasWithState(
        _update_counts,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        counts.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime="1 second")
        .start()
    )
