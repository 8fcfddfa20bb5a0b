"""IVF ANN: cell assignment path equivalence (JVM literal expression vs
numpy matmul), exact agreement with brute force when every cell is probed,
and k-means refinement keeping the codebook shape."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from kgraph_spark.operators.similarity import (
    assign_cells,
    assign_cells_np,
    brute_force_topk,
    deterministic_centroids,
    ivf_topk,
    kmeans_refine,
)

DIM = 16
N = 200


def _items(spark, n=N, dim=DIM, seed=7):
    rng = random.Random(seed)
    rows = [(i, [rng.gauss(0.0, 1.0) for _ in range(dim)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_assign_cells_jvm_vs_numpy(spark):
    items = _items(spark)
    cents = deterministic_centroids(items, 8)
    jvm = {r["vec_id"]: r["cell"] for r in assign_cells(items, cents).collect()}
    npy = {r["vec_id"]: r["cell"] for r in assign_cells_np(items, cents).collect()}
    assert jvm == npy


def test_ivf_probe_all_cells_equals_brute_force(spark):
    items = _items(spark)
    cents = deterministic_centroids(items, 8)
    probes = items.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    got = {
        (r["probe_id"], r["vec_id"], r["rank"])
        for r in ivf_topk(items, probes, cents, nprobe=8, k=5).collect()
    }
    want = {
        (r["probe_id"], r["vec_id"], r["rank"])
        for r in brute_force_topk(items, probes, k=5).collect()
    }
    assert got == want


def test_ivf_nprobe_subset_recall(spark):
    """nprobe=3 of 8 cells still recovers most of the true top-5 (random
    gaussian data — the probe's own cell holds its nearest neighbors)."""
    items = _items(spark)
    cents = kmeans_refine(items, deterministic_centroids(items, 8), iters=3)
    probes = items.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    approx = {
        (r["probe_id"], r["vec_id"])
        for r in ivf_topk(items, probes, cents, nprobe=3, k=5).collect()
    }
    exact = {
        (r["probe_id"], r["vec_id"])
        for r in brute_force_topk(items, probes, k=5).collect()
    }
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.5, recall
    # the probe itself (cosine 1.0) is always in its own cell → rank 1 found
    assert all((p, p) in approx for p in range(10))


def test_kmeans_refine_shape_and_determinism(spark):
    items = _items(spark, n=120)
    init = deterministic_centroids(items, 4)
    a = kmeans_refine(items, init, iters=2)
    b = kmeans_refine(items, init, iters=2)
    assert a == b
    assert [cid for cid, _ in a] == [0, 1, 2, 3]
    assert all(len(v) == DIM and all(math.isfinite(x) for x in v) for _, v in a)
    # refinement actually moved the centroids off the seed points
    assert any(a[i][1] != init[i][1] for i in range(4))


def test_ivf_numpy_path_matches_jvm_path(spark):
    """use_numpy_assign=True must produce the exact same top-k as the JVM
    literal-expression path — including the probe-side cell ranking (the
    large-nlist path ranks probe cells via numpy argsort, not the codebook
    literal)."""
    items = _items(spark)
    cents = deterministic_centroids(items, 8)
    probes = items.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    jvm = {
        (r["probe_id"], r["vec_id"], r["rank"])
        for r in ivf_topk(items, probes, cents, nprobe=2, k=5).collect()
    }
    npy = {
        (r["probe_id"], r["vec_id"], r["rank"])
        for r in ivf_topk(items, probes, cents, nprobe=2, k=5, use_numpy_assign=True).collect()
    }
    assert jvm == npy

    # both sides of the cell join ride the Arrow/numpy path: two MapInPandas
    # nodes (item assignment + probe cell ranking), so the codebook is never
    # embedded as a per-centroid literal expression on either side
    plan = ivf_topk(
        items, probes, cents, nprobe=2, k=5, use_numpy_assign=True
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 2, plan


def test_kmeans_refine_round_to_pins_codebook(spark):
    """round_to pins every refined coordinate to ≤N decimals (JVM round
    before collect) and empty cells still keep their previous centroid."""
    from kgraph_spark.operators.similarity import kmeans_refine

    items = spark.createDataFrame(
        [(1, [1.0, 0.1234567]), (2, [1.0, 0.7654321])],
        "vec_id bigint, embedding array<double>",
    )
    cents = kmeans_refine(
        items, [(0, [1.0, 0.0]), (99, [-1.0, -1.0])], iters=1, round_to=3
    )  # (99,·) attracts nothing
    by = dict(cents)
    assert by[99] == [-1.0, -1.0]  # empty cell unchanged
    for x in by[0]:
        assert x == round(x, 3)


def test_pq_encode_map_only_and_adc_sanity(spark):
    """PQ: encode is zero-shuffle JVM expressions; ADC with untrained
    deterministic codebooks must still put each probe's true twin first
    (identical vector → every subspace hits the same centroid → adist to
    itself == distance between the shared codes == minimal)."""
    from conftest import plan_text
    from kgraph_spark.operators.similarity import pq_codebooks, pq_encode, pq_topk

    import random

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(40)]
    # twin of item 3 under a new id: must share its code exactly
    rows.append((100, list(rows[3][1])))
    items = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cbs = pq_codebooks(items, m=4, k=8)
    codes = pq_encode(items, cbs)
    assert "Exchange" not in plan_text(codes)
    by_id = {r["vec_id"]: list(r["code"]) for r in codes.collect()}
    assert by_id[100] == by_id[3]
    assert all(len(c) == 4 and all(0 <= x < 8 for x in c) for c in by_id.values())

    probes = items.filter("vec_id = 3").select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    top = pq_topk(codes, probes, cbs, k=3).collect()
    got = [(r["vec_id"], r["rank"]) for r in sorted(top, key=lambda r: r["rank"])]
    # 3 and its twin 100 share a code → identical adist, id tie-break
    assert [v for v, _ in got[:2]] == [3, 100]


def test_pq_codebooks_reject_indivisible_dim(spark):
    import pytest

    from kgraph_spark.operators.similarity import pq_codebooks

    items = spark.createDataFrame(
        [(1, [0.0] * 10)], "vec_id bigint, embedding array<double>"
    )
    with pytest.raises(ValueError, match="divisible"):
        pq_codebooks(items, m=4, k=1)


def test_embedding_centroids_hand_computed(spark):
    from kgraph_spark.operators.similarity import embedding_centroids

    df = spark.createDataFrame(
        [(1, 0, [1.0, 0.0]), (2, 0, [3.0, 2.0]), (3, 1, [0.0, 5.0])],
        "vec_id long, label int, embedding array<float>",
    )
    got = {(r["label"], r["pos"]): r.asDict() for r in embedding_centroids(df).collect()}
    assert got[(0, 0)]["mean"] == 2.0 and got[(0, 1)]["mean"] == 1.0
    assert got[(0, 0)]["n_vectors"] == 2
    assert got[(1, 0)]["mean"] == 0.0 and got[(1, 1)]["mean"] == 5.0


def test_embedding_dispersion_tight_vs_diffuse(spark):
    from kgraph_spark.operators.similarity import embedding_dispersion

    # label 0: identical vectors (cohesion 1.0); label 1: orthogonal pair
    df = spark.createDataFrame(
        [
            (1, 0, [1.0, 0.0]),
            (2, 0, [1.0, 0.0]),
            (3, 1, [1.0, 0.0]),
            (4, 1, [0.0, 1.0]),
        ],
        "vec_id long, label int, embedding array<float>",
    )
    got = {r["label"]: r.asDict() for r in embedding_dispersion(df).collect()}
    assert got[0]["mean_cosine"] == 1.0 and got[0]["min_cosine"] == 1.0
    # orthogonal pair vs centroid (.5,.5): cos = 1/sqrt(2) each
    assert abs(got[1]["mean_cosine"] - 0.707107) < 1e-6
    assert got[1]["n_vectors"] == 2


def test_semantic_dedup_drops_cell_mates_above_threshold(spark):
    from kgraph_spark.operators.similarity import semantic_dedup

    # two orthogonal clusters; ids 1/2/3 near-identical, 10 orthogonal,
    # 11 a near-copy of 10
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),
        (3, [0.998, 0.02, 0.0, 0.0]),
        (10, [0.0, 0.0, 1.0, 0.0]),
        (11, [0.0, 0.0, 0.999, 0.01]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 0.0, 1.0, 0.0])]
    out = {r["vec_id"]: r for r in semantic_dedup(df, cents, 0.99).collect()}
    assert out[1]["keep"] and out[1]["dup_of"] is None
    assert not out[2]["keep"] and out[2]["dup_of"] == 1
    assert not out[3]["keep"] and out[3]["dup_of"] == 1   # smallest neighbor
    assert out[10]["keep"]
    assert not out[11]["keep"] and out[11]["dup_of"] == 10


def test_semantic_dedup_cross_cell_pairs_never_compared(spark):
    from kgraph_spark.operators.similarity import semantic_dedup

    # identical vectors forced into different cells by construction:
    # centroids equal to each vector, so each is its own cell → both kept
    rows = [(1, [1.0, 0.0]), (2, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    out = {r["vec_id"]: r["keep"] for r in semantic_dedup(df, cents, 0.0).collect()}
    assert out == {1: True, 2: True}


def test_random_projection_shape_and_linearity(spark):
    import pytest
    from pyspark.sql import functions as F
    from kgraph_spark.operators.similarity import random_projection

    df = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [2.0, 0.0, 0.0, 0.0]), (3, [0.0] * 4)],
        "vec_id long, embedding array<float>",
    )
    rows = random_projection(df, out_dim=2).collect()
    by = {(r["vec_id"], r["pos"]): r["value"] for r in rows}
    assert len(by) == 6  # 3 rows x 2 dims, flat
    # sign projection is linear: doubling the input doubles every output
    for p in (0, 1):
        assert abs(by[(2, p)] - 2 * by[(1, p)]) < 3e-6
        assert by[(3, p)] == 0.0
    # deterministic across calls
    again = {(r["vec_id"], r["pos"]): r["value"] for r in random_projection(df, out_dim=2).collect()}
    assert by == again
    with pytest.raises(ValueError):
        random_projection(df, out_dim=0)


def test_random_projection_preserves_rough_geometry(spark):
    """JL sanity: orthogonal inputs stay far apart, identical inputs map
    identically — on average over dims (not a per-pair guarantee)."""
    from kgraph_spark.operators.similarity import random_projection

    df = spark.createDataFrame(
        [(1, [1.0] * 16), (2, [1.0] * 16), (3, [-1.0] * 16)],
        "vec_id long, embedding array<float>",
    )
    rows = random_projection(df, out_dim=4).collect()
    by = {(r["vec_id"], r["pos"]): r["value"] for r in rows}
    for p in range(4):
        assert by[(1, p)] == by[(2, p)]
        assert by[(3, p)] == -by[(1, p)]


def test_sample_diversity_redundant_vs_spread(spark):
    from kgraph_spark.operators.similarity import sample_diversity

    df = spark.createDataFrame(
        [
            (0, 1, [1.0, 0.0]), (0, 2, [1.0, 0.001]), (0, 3, [1.0, 0.002]),  # redundant
            (1, 4, [1.0, 0.0]), (1, 5, [0.0, 1.0]),                           # orthogonal
            (2, 6, [1.0, 1.0]),                                               # singleton
        ],
        "label int, vec_id long, embedding array<float>",
    )
    rows = {r["label"]: r for r in sample_diversity(df).collect()}
    assert rows[0]["mean_pairwise_cosine"] > 0.999
    assert rows[0]["n_pairs"] == 3
    assert rows[1]["mean_pairwise_cosine"] == 0.0
    assert rows[2]["n_pairs"] == 0 and rows[2]["mean_pairwise_cosine"] is None


def test_reciprocal_best_match_mutual_argmax(spark):
    from kgraph_spark.operators.similarity import reciprocal_best_match

    # block g: l1 ~ r1 (identical), l2's best is r1 too but r1 prefers l1
    # → l2 unmatched; r2 orthogonal to everything → unmatched.
    left = spark.createDataFrame(
        [
            ("g", 1, [1.0, 0.0, 0.0]),
            ("g", 2, [0.9, 0.1, 0.0]),
        ],
        "label string, vec_id long, embedding array<double>",
    )
    right = spark.createDataFrame(
        [
            ("g", 10, [1.0, 0.0, 0.0]),
            ("g", 20, [0.0, 0.0, 1.0]),
        ],
        "label string, vec_id long, embedding array<double>",
    )
    out = {(r["left_id"], r["right_id"]): r["cosine"]
           for r in reciprocal_best_match(left, right).collect()}
    # l1<->r10 mutual best; l2's best r10 is taken (r10 prefers l1);
    # r20's best is l2 but l2's best is r10 → only one aligned pair... plus
    # l2/r20: l2 best = r10 (cos .993) not r20 (0) → not mutual.
    assert out == {(1, 10): 1.0}


def test_reciprocal_best_match_blocking_and_threshold(spark):
    from kgraph_spark.operators.similarity import reciprocal_best_match

    left = spark.createDataFrame(
        [("a", 1, [1.0, 0.0]), ("b", 2, [1.0, 0.0])],
        "label string, vec_id long, embedding array<double>",
    )
    right = spark.createDataFrame(
        [("a", 10, [0.0, 1.0]), ("b", 20, [1.0, 0.0])],
        "label string, vec_id long, embedding array<double>",
    )
    # without threshold: within block a the only pair (cos 0) is mutual best
    no_thr = {(r["left_id"], r["right_id"])
              for r in reciprocal_best_match(left, right).collect()}
    assert no_thr == {(1, 10), (2, 20)}
    # threshold kills the orthogonal pair; cross-block pairing never happens
    thr = {(r["left_id"], r["right_id"])
           for r in reciprocal_best_match(left, right, min_cosine=0.5).collect()}
    assert thr == {(2, 20)}


def test_sq8_error_profile_hand_case(spark):
    from kgraph_spark.operators.similarity import sq8_error_profile

    # endpoints encode exactly; the midpoint misses by the half-step
    emb = spark.createDataFrame(
        [(1, [0.0, 1.0]), (2, [1.0, 0.0]), (3, [0.5, 0.5])],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in sq8_error_profile(emb).collect()}
    assert out[1]["sse"] == 0 and out[2]["sse"] == 0 and out[1]["rmse"] == 0.0
    # q=500000 -> code round(127.5)=128 -> deq 501961 -> err -1961
    assert out[3]["max_abs_err_micro"] == 1961
    assert out[3]["sse"] == 2 * 1961 * 1961
    assert out[3]["rmse"] == 0.001961


def test_sq8_constant_dimension_zero_error(spark):
    from kgraph_spark.operators.similarity import sq8_error_profile

    emb = spark.createDataFrame(
        [(1, [0.7, 0.1]), (2, [0.7, 0.9])], "vec_id long, embedding array<double>"
    )
    out = {r["vec_id"]: r for r in sq8_error_profile(emb).collect()}
    assert out[1]["sse"] == 0 and out[2]["sse"] == 0


def test_centroid_drift_identical_and_rotated(spark):
    from kgraph_spark.operators.similarity import centroid_drift

    a = spark.createDataFrame(
        [(1, "x", [1.0, 0.0]), (2, "x", [1.0, 0.0]), (3, "y", [0.0, 2.0])],
        "vec_id long, label string, embedding array<double>",
    )
    # same centroids -> cosine 1; y rotated 90 degrees -> cosine 0
    b = spark.createDataFrame(
        [(4, "x", [2.0, 0.0]), (5, "y", [2.0, 0.0])],
        "vec_id long, label string, embedding array<double>",
    )
    out = {r["label"]: r for r in centroid_drift(a, b).collect()}
    assert out["x"]["centroid_cosine"] == 1.0
    assert out["y"]["centroid_cosine"] == 0.0
    assert out["x"]["n_a"] == 2 and out["x"]["n_b"] == 1
