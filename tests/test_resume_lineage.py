"""I4 / north-rule resumability: kill mid-stage, rerun, identical output,
committed shards not recomputed; lineage + metrics rows recorded."""

from __future__ import annotations

import os
import time
from pathlib import Path

import pytest

from kgraph_spark import synth
from kgraph_spark.lineage import checkpointed_pipeline, read_lineage
from kgraph_spark.pipeline import run_pipeline

N_DOCS = 150


def test_kill_and_resume(spark, tmp_path):
    docs = synth.documents_df(spark, N_DOCS)
    gaz = synth.gazetteer_rows()
    workdir = str(tmp_path / "ckpt")

    # killed run: simulate failure after 3 of 8 shards
    with pytest.raises(RuntimeError, match="simulated kill"):
        checkpointed_pipeline(spark, docs, gaz, workdir, n_shards=8, fail_after=3)

    committed = sorted(
        int(p.name.split("=")[1])
        for p in (Path(workdir) / "extracted").glob("shard=*")
        if (p / "_SUCCESS").exists()
    )
    assert len(committed) == 3
    mtimes_before = {
        s: os.path.getmtime(Path(workdir) / "extracted" / f"shard={s}" / "_SUCCESS")
        for s in committed
    }

    time.sleep(1.1)
    # resume: completes remaining shards without touching committed ones
    triples = checkpointed_pipeline(spark, docs, gaz, workdir, n_shards=8)
    for s, before in mtimes_before.items():
        after = os.path.getmtime(Path(workdir) / "extracted" / f"shard={s}" / "_SUCCESS")
        assert after == before, f"shard {s} was recomputed on resume"

    # identical output to the non-checkpointed pipeline
    plain = run_pipeline(spark, docs, gaz)
    got = {(r["subject_id"], r["predicate"], r["object_id"], r["confidence"], r["evidence_count"])
           for r in triples.collect()}
    want = {(r["subject_id"], r["predicate"], r["object_id"], r["confidence"], r["evidence_count"])
            for r in plain.triples.collect()}
    assert got == want
    plain.unpersist()

    # lineage: one committed row per shard; metrics rows for both stages
    lin = read_lineage(spark, workdir)
    rows = {(r["stage"], r["shard"]): r for r in lin.collect()}
    assert len(rows) == 8
    assert all(r["status"] == "committed" for r in rows.values())
    assert sum(r["n_input_docs"] for r in rows.values()) == N_DOCS
    metrics = spark.read.parquet(str(Path(workdir) / "metrics"))
    assert {r["stage"] for r in metrics.collect()} == {"extracted", "triples"}


def test_rerun_is_idempotent(spark, tmp_path):
    docs = synth.documents_df(spark, 60)
    gaz = synth.gazetteer_rows()
    workdir = str(tmp_path / "ckpt2")
    t1 = checkpointed_pipeline(spark, docs, gaz, workdir, n_shards=4)
    n1 = t1.count()
    t2 = checkpointed_pipeline(spark, docs, gaz, workdir, n_shards=4)
    assert t2.count() == n1
    # second run added no lineage rows (nothing recomputed)
    assert read_lineage(spark, workdir).count() == 4
