"""Checkpointed stage execution with per-partition lineage + metrics
(SURVEY.md §2 I4; north_rule: "every stage checkpoints per-partition
progress and lineage/metric rows ... so a killed job resumes without
recomputation").

The reference resumes per paper via skip-if-exists on immutable bundle
files with atomic write-then-rename (examples/medlit/scripts/extract.py:357-359,
CONCURRENCY.md:96-120). The Spark restatement:

  * a stage's input is sharded by a deterministic hash of doc_id
    (pmod(xxhash64(doc_id), n_shards)) — any executor layout produces the
    same shard membership;
  * each shard is one atomic parquet write (Spark's commit protocol =
    write-then-rename; the _SUCCESS marker is the commit record) —
    locally parquet stands in for an Iceberg snapshot commit;
  * resume = skip shards whose commit marker exists — the anti-join on
    committed work, generalized;
  * every shard appends a lineage row (stage, shard, docs, rows, seconds,
    status) and every stage a metrics row — both are append-only tables.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = (
    "stage string, shard int, n_input_docs long, n_output_rows long, "
    "seconds double, status string, finished_at_unix long"
)


def shard_col(doc_id_col, n_shards: int):
    return F.pmod(F.xxhash64(doc_id_col), F.lit(n_shards)).cast("int")


def _append_rows(spark: SparkSession, path: Path, rows: list[tuple], schema: str) -> None:
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(str(path))


def run_sharded_stage(
    spark: SparkSession,
    stage: str,
    docs: DataFrame,
    fn: Callable[[DataFrame], DataFrame],
    workdir: str,
    n_shards: int = 8,
    fail_after: int | None = None,
    max_concurrent: int = 4,
) -> DataFrame:
    """Run `fn` over doc shards with skip-if-committed resume.

    fn: pure transform documents → stage output (must carry doc_id lineage
    implicitly; determinism is guaranteed by the content-hashed ID scheme).
    fail_after: test hook — raise after N shards to simulate a killed job
    (forces the sequential path so "after N" is well-defined).

    Uncommitted shards are submitted CONCURRENTLY from a small driver
    thread pool: Spark's scheduler interleaves the independent write jobs,
    so executors never sit idle between shard commits (the round-1 form ran
    shards strictly sequentially — at 64+ shards on a cluster the
    per-shard driver round-trips serialize the fleet). Shard input counts
    come from ONE groupBy job up front instead of a count() per shard, and
    lineage rows are buffered and appended once (concurrent appends to one
    parquet dir race on _temporary). At real scale each shard write is an
    Iceberg snapshot commit and this loop disappears into table commits.

    Returns the stage output DataFrame (reading all committed shards)."""
    out_root = Path(workdir) / stage
    lineage_path = Path(workdir) / "lineage"
    out_root.mkdir(parents=True, exist_ok=True)

    docs = docs.withColumn("_shard", shard_col(F.col("doc_id"), n_shards))
    pending = [
        s for s in range(n_shards) if not (out_root / f"shard={s}" / "_SUCCESS").exists()
    ]  # committed shards skipped — resume = skip-if-exists (I4)

    lineage_rows: list[tuple] = []

    def _run_one(shard: int, n_docs: int) -> None:
        t0 = time.time()
        shard_dir = out_root / f"shard={shard}"
        out = fn(docs.filter(F.col("_shard") == shard).drop("_shard"))
        out.write.mode("overwrite").parquet(str(shard_dir))
        n_rows = spark.read.parquet(str(shard_dir)).count()  # footer metadata only
        lineage_rows.append(
            (stage, shard, n_docs, n_rows, round(time.time() - t0, 3), "committed",
             int(time.time()))
        )

    if pending:
        if fail_after is not None:
            for done, shard in enumerate(pending):
                if done >= fail_after:
                    _append_rows(spark, lineage_path, lineage_rows, LINEAGE_SCHEMA)
                    raise RuntimeError(f"simulated kill after {done} shards")
                _run_one(shard, docs.filter(F.col("_shard") == shard).count())
        else:
            counts = {
                r["_shard"]: r["count"]
                for r in docs.groupBy("_shard").count().collect()
            }
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(len(pending), max_concurrent)) as ex:
                list(ex.map(lambda s: _run_one(s, counts.get(s, 0)), pending))
        if lineage_rows:
            _append_rows(spark, lineage_path, lineage_rows, LINEAGE_SCHEMA)
    return spark.read.parquet(str(out_root))


def write_stage_metrics(spark: SparkSession, workdir: str, stage: str, counters: dict) -> None:
    """G3 stage statistics row → append-only metrics table."""
    path = Path(workdir) / "metrics"
    _append_rows(
        spark,
        path,
        [(stage, json.dumps(counters, sort_keys=True), int(time.time()))],
        "stage string, counters_json string, finished_at_unix long",
    )


def read_lineage(spark: SparkSession, workdir: str) -> DataFrame:
    return spark.read.parquet(str(Path(workdir) / "lineage"))


def checkpointed_pipeline(
    spark: SparkSession,
    docs: DataFrame,
    gazetteer_rows: list[tuple],
    workdir: str,
    n_shards: int = 8,
    cfg=None,
    fail_after: int | None = None,
):
    """Resumable form of pipeline.run_pipeline: the expensive extraction
    pass is sharded + checkpointed (kill → rerun recomputes only missing
    shards); downstream graph construction runs from the committed
    extraction table and its outputs are single atomic commits."""
    from kgraph_spark.config import PipelineConfig
    from kgraph_spark.operators.mentions import extract_all
    from kgraph_spark.pipeline import run_pipeline_from_extracted

    cfg = cfg or PipelineConfig()
    gaz_bcast = spark.sparkContext.broadcast(gazetteer_rows)
    extracted = run_sharded_stage(
        spark,
        "extracted",
        docs,
        lambda d: extract_all(d, gaz_bcast, cfg),
        workdir,
        n_shards=n_shards,
        fail_after=fail_after,
    )
    write_stage_metrics(spark, workdir, "extracted", {"rows": extracted.count()})
    result = run_pipeline_from_extracted(spark, extracted, gazetteer_rows, cfg)
    triples_dir = Path(workdir) / "triples"
    result.triples.write.mode("overwrite").parquet(str(triples_dir))
    write_stage_metrics(
        spark, workdir, "triples", {"rows": spark.read.parquet(str(triples_dir)).count()}
    )
    return spark.read.parquet(str(triples_dir))
