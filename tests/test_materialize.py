"""Incremental aggregate maintenance: refresh == recompute, exactly.
Plus RRF fusion hand cases (both are retrieval/warehouse maintenance ops)."""

from __future__ import annotations

from kgraph_spark.operators.materialize import (
    init_aggregate,
    read_aggregate,
    refresh_aggregate,
)
from kgraph_spark.operators.relevance import rrf_fuse

EV = "user_id long, event_type string, value double"


def _rows(spark, rows):
    return spark.createDataFrame(rows, EV)


def _state(df):
    return {
        (r["user_id"], r["event_type"]): (r["n"], r["sum_units"])
        for r in df.collect()
    }


def test_refresh_equals_recompute(spark):
    base_rows = _rows(
        spark,
        [(1, "view", 1.5), (1, "view", 2.0), (1, "click", 0.5), (2, "view", 3.0)],
    )
    base = init_aggregate(base_rows, ["user_id", "event_type"])
    # delete one of u1's views, insert a u3 purchase and another u1 click
    changelog = spark.createDataFrame(
        [
            (1, "view", 1.5, -1),
            (3, "purchase", 9.0, 1),
            (1, "click", 0.25, 1),
        ],
        EV + ", op int",
    )
    refreshed = refresh_aggregate(base, changelog, ["user_id", "event_type"])
    final_rows = _rows(
        spark,
        [(1, "view", 2.0), (1, "click", 0.5), (1, "click", 0.25), (2, "view", 3.0), (3, "purchase", 9.0)],
    )
    assert _state(refreshed) == _state(init_aggregate(final_rows, ["user_id", "event_type"]))


def test_refresh_drops_zeroed_groups(spark):
    base = init_aggregate(_rows(spark, [(1, "view", 1.0)]), ["user_id", "event_type"])
    changelog = spark.createDataFrame([(1, "view", 1.0, -1)], EV + ", op int")
    assert refresh_aggregate(base, changelog, ["user_id", "event_type"]).count() == 0


def test_null_values_count_but_do_not_sum(spark):
    base = init_aggregate(
        _rows(spark, [(1, "view", None), (1, "view", 2.0)]), ["user_id", "event_type"]
    )
    st = _state(base)
    assert st[(1, "view")] == (2, 2_000_000)
    changelog = spark.createDataFrame([(1, "view", None, -1)], EV + ", op int")
    refreshed = refresh_aggregate(base, changelog, ["user_id", "event_type"])
    assert _state(refreshed)[(1, "view")] == (1, 2_000_000)
    got = read_aggregate(refreshed).collect()[0]
    assert got["value_sum"] == 2.0


def test_rrf_fuse_hand_case(spark):
    # list 0 ranks: a=1, b=2 ; list 1 ranks: b=1, c=2
    r0 = spark.createDataFrame([("q", "a", 1), ("q", "b", 2)], "probe_id string, vec_id string, rank int")
    r1 = spark.createDataFrame([("q", "b", 1), ("q", "c", 2)], "probe_id string, vec_id string, rank int")
    out = {r["vec_id"]: r for r in rrf_fuse([r0, r1], k0=60).collect()}
    # b: 1/62 + 1/61 > a: 1/61 > c: 1/62
    assert out["b"]["fused_rank"] == 1
    assert out["a"]["fused_rank"] == 2
    assert out["c"]["fused_rank"] == 3
    assert out["a"]["rank_0"] == 1 and out["a"]["rank_1"] is None
    assert abs(out["b"]["rrf_score"] - round(1 / 62 + 1 / 61, 6)) < 1e-9


def test_rrf_top_k_and_tie_break(spark):
    # identical contributions -> tie broken by item id ascending
    r0 = spark.createDataFrame([("q", "z", 1), ("q", "y", 2)], "probe_id string, vec_id string, rank int")
    r1 = spark.createDataFrame([("q", "y", 1), ("q", "z", 2)], "probe_id string, vec_id string, rank int")
    out = rrf_fuse([r0, r1], top_k=1).collect()
    assert len(out) == 1 and out[0]["vec_id"] == "y"


# ---- MMR ------------------------------------------------------------------


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "label int, vec_id long, embedding array<float>")


def test_mmr_prefers_diverse_over_redundant(spark):
    from kgraph_spark.operators.relevance import mmr_topk

    # probe = [1,0]; a1/a2 nearly identical high-relevance; b diverse mid
    items = _vecs(
        spark,
        [
            (0, 1, [1.0, 0.05]),   # rel ~.999
            (0, 2, [1.0, 0.06]),   # near-dup of 1, rel ~.998
            (0, 3, [0.6, 0.8]),    # diverse, rel .6
        ],
    )
    probes = _vecs(spark, [(0, 99, [1.0, 0.0])]).select("label", "embedding")
    got = {
        r["rank"]: r["vec_id"]
        for r in mmr_topk(items, probes, k=3, lam_num=3).collect()
    }
    assert got[1] == 1          # highest relevance first
    assert got[3] == 2          # ...near-dup of #1 forced to LAST
    assert got[2] == 3          # diversity wins round 2 at lambda=0.3
    # relevance-heavy lambda keeps the greedy relevance order instead
    rel = {r["rank"]: r["vec_id"] for r in mmr_topk(items, probes, k=3, lam_num=9).collect()}
    assert rel[2] == 2


def test_mmr_rank1_is_pure_relevance_and_validation(spark):
    import pytest
    from kgraph_spark.operators.relevance import mmr_topk

    items = _vecs(spark, [(0, 1, [1.0, 0.0]), (0, 2, [0.0, 1.0]), (1, 5, [1.0, 1.0])])
    probes = _vecs(spark, [(0, 9, [0.0, 1.0]), (1, 9, [1.0, 1.0])]).select(
        "label", "embedding"
    )
    rows = mmr_topk(items, probes, k=2).collect()
    r1 = {r["label"]: r["vec_id"] for r in rows if r["rank"] == 1}
    assert r1 == {0: 2, 1: 5}
    assert {r["rank"] for r in rows if r["label"] == 1} == {1}  # pool exhausts
    with pytest.raises(ValueError):
        mmr_topk(items, probes, k=0)
    with pytest.raises(ValueError):
        mmr_topk(items, probes, lam_num=11, lam_denom=10)
