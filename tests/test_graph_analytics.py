"""Graph analytics: degrees, degree-ordered triangles, fixed-iteration
PageRank — hand-computed small graphs plus invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgraph_spark.operators.graph_analytics import (
    adamic_adar,
    clustering_coefficient,
    degree_table,
    kcore,
    pagerank,
    triangle_counts,
)

def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], "subject_id string, object_id string"
    )


def test_degree_table(spark):
    e = _edges(spark, [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")])
    rows = {r["node"]: r for r in degree_table(e).collect()}
    assert rows["a"]["out_degree"] == 2 and rows["a"]["in_degree"] == 1
    assert rows["b"]["out_degree"] == 1 and rows["b"]["in_degree"] == 1
    assert rows["c"]["out_degree"] == 1 and rows["c"]["in_degree"] == 2
    assert all(r["degree"] == r["out_degree"] + r["in_degree"] for r in rows.values())


def test_triangles_k4(spark):
    # K4 has 4 triangles; every node sits in exactly 3
    nodes = ["a", "b", "c", "d"]
    e = _edges(spark, [(x, y) for x in nodes for y in nodes if x < y])
    rows = {r["node"]: r["n_triangles"] for r in triangle_counts(e).collect()}
    assert rows == {n: 3 for n in nodes}


def test_triangles_direction_and_dups_ignored(spark):
    # same triangle expressed with mixed directions + parallel edges
    e = _edges(spark, [("a", "b"), ("b", "a"), ("c", "b"), ("a", "c"), ("a", "c"), ("c", "d")])
    rows = {r["node"]: r["n_triangles"] for r in triangle_counts(e).collect()}
    assert rows == {"a": 1, "b": 1, "c": 1}


def test_triangles_no_cartesian(spark):
    from conftest import plan_text

    e = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c")])
    assert "CartesianProduct" not in plan_text(triangle_counts(e))


def test_pagerank_symmetric_cycle(spark):
    # directed 3-cycle: perfectly symmetric → uniform ranks that sum to 1
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    rows = {r["node"]: r["rank"] for r in pagerank(e, iterations=5).collect()}
    assert rows == {"a": pytest.approx(1 / 3, abs=2e-6), "b": pytest.approx(1 / 3, abs=2e-6), "c": pytest.approx(1 / 3, abs=2e-6)}


def test_pagerank_hub_ranks_highest(spark):
    # star into "hub": hub must outrank every leaf; mass conserved (no dangling
    # once hub points back)
    leaves = [f"l{i}" for i in range(6)]
    e = _edges(spark, [(l, "hub") for l in leaves] + [("hub", l) for l in leaves])
    rows = {r["node"]: r["rank"] for r in pagerank(e, iterations=8).collect()}
    assert all(rows["hub"] > rows[l] for l in leaves)
    assert sum(rows.values()) == pytest.approx(1.0, abs=1e-4)


def test_pagerank_dangling_mass_redistributed(spark):
    # "b" is dangling; without redistribution total rank leaks each round
    e = _edges(spark, [("a", "b"), ("c", "b"), ("b2", "a"), ("b2", "c")])
    rows = {r["node"]: r["rank"] for r in pagerank(e, iterations=6).collect()}
    assert sum(rows.values()) == pytest.approx(1.0, abs=1e-4)


def test_pagerank_exact_fold_matches_sum(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("c", "d"), ("d", "a")])
    plain = {r["node"]: r["rank"] for r in pagerank(e, iterations=5).collect()}
    fold = {r["node"]: r["rank"] for r in pagerank(e, iterations=5, exact_fold=True).collect()}
    assert plain == fold  # identical after per-round rounding


def _wedges(spark, rows):
    return spark.createDataFrame(rows, "subject_id string, object_id string, w double")


def _seeds(spark, nodes):
    return spark.createDataFrame([(n,) for n in nodes], "node string")


def test_sssp_prefers_cheaper_two_hop_path(spark):
    from kgraph_spark.operators.graph_analytics import shortest_paths

    e = _wedges(spark, [("a", "b", 1.0), ("b", "c", 1.0), ("a", "c", 3.0)])
    rows = {r["node"]: r["dist"] for r in shortest_paths(e, _seeds(spark, ["a"]), rounds=2, weight="w").collect()}
    assert rows == {"a": 0.0, "b": 1.0, "c": 2.0}


def test_sssp_rounds_bound_reach_and_parallel_edges_take_min(spark):
    from kgraph_spark.operators.graph_analytics import shortest_paths

    e = _wedges(spark, [("a", "b", 5.0), ("a", "b", 2.0), ("b", "c", 1.0), ("c", "d", 1.0)])
    one = {r["node"]: r["dist"] for r in shortest_paths(e, _seeds(spark, ["a"]), rounds=1, weight="w").collect()}
    assert one == {"a": 0.0, "b": 2.0}  # parallel edge min; c,d unreached
    three = {r["node"]: r["dist"] for r in shortest_paths(e, _seeds(spark, ["a"]), rounds=3, weight="w").collect()}
    assert three["d"] == 4.0


def test_sssp_default_weight_is_hop_count(spark):
    from kgraph_spark.operators.graph_analytics import shortest_paths

    e = _edges(spark, [("a", "b"), ("b", "c")])
    rows = {r["node"]: r["dist"] for r in shortest_paths(e, _seeds(spark, ["a"]), rounds=2).collect()}
    assert rows == {"a": 0.0, "b": 1.0, "c": 2.0}


def test_sssp_rejects_missing_node_column(spark):
    from kgraph_spark.operators.graph_analytics import shortest_paths

    e = _edges(spark, [("a", "b")])
    bad = spark.createDataFrame([("a",)], "wrong string")
    with pytest.raises(ValueError, match="node"):
        shortest_paths(e, bad)


def test_shingles_duplicate_doc_id_rows_do_not_interleave(spark):
    from kgraph_spark.operators.dedup_text import shingles

    docs = spark.createDataFrame(
        [("d", "a b c"), ("d", "x y z")], "doc_id string, text string"
    )
    got = {r["shingle"] for r in shingles(docs, k=3).collect()}
    assert got == {"a b c", "x y z"}  # never a cross-row gram like "b c x"


def test_clustering_coefficient_k4_minus_edge(spark):
    # K4 minus edge (a,d): triangles abc + bcd; coefficients by hand
    e = _edges(spark, [("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d")])
    rows = {r["node"]: r for r in clustering_coefficient(e).collect()}
    assert rows["a"]["coefficient"] == 1.0 and rows["d"]["coefficient"] == 1.0
    assert rows["b"]["coefficient"] == pytest.approx(2 / 3, abs=2e-6)
    assert rows["b"]["degree"] == 3 and rows["b"]["n_triangles"] == 2


def test_clustering_coefficient_degree_one_is_zero(spark):
    e = _edges(spark, [("a", "b")])
    rows = {r["node"]: r["coefficient"] for r in clustering_coefficient(e).collect()}
    assert rows == {"a": 0.0, "b": 0.0}


def test_adamic_adar_scores_common_neighbor(spark):
    import math

    # a-u-b path: (a,b) non-adjacent with common neighbor u of degree 2
    e = _edges(spark, [("a", "u"), ("u", "b")])
    rows = adamic_adar(e).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["node_a"], r["node_b"], r["n_common"]) == ("a", "b", 1)
    assert r["score"] == pytest.approx(round(round(1 / math.log(2), 6), 4), abs=1e-9)


def test_adamic_adar_excludes_existing_edges_and_honors_min_common(spark):
    # square a-b-c-d-a: (a,c) and (b,d) are the diagonals, each with TWO
    # common neighbors; adjacent pairs are excluded
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])
    got = {(r["node_a"], r["node_b"]): r for r in adamic_adar(e, min_common=2).collect()}
    assert set(got) == {("a", "c"), ("b", "d")}
    assert all(r["n_common"] == 2 for r in got.values())
    # triangle: all pairs adjacent → nothing to predict
    tri = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c")])
    assert adamic_adar(tri).count() == 0


def test_personalized_pagerank_concentrates_on_seed_neighborhood(spark):
    # two disjoint 3-cycles; seeding in one leaves the other at exactly 0
    e = _edges(
        spark,
        [("a", "b"), ("b", "c"), ("c", "a"), ("x", "y"), ("y", "z"), ("z", "x")],
    )
    rows = {r["node"]: r["rank"] for r in pagerank(e, iterations=6, seeds=["a"]).collect()}
    assert rows["x"] == rows["y"] == rows["z"] == 0.0
    assert rows["a"] > rows["b"] > 0 and rows["c"] > 0
    assert sum(rows.values()) == pytest.approx(1.0, abs=1e-4)


def test_personalized_pagerank_rejects_empty_seeds(spark):
    e = _edges(spark, [("a", "b")])
    with pytest.raises(ValueError):
        pagerank(e, seeds=[])


def test_personalized_pagerank_rejects_unknown_seed(spark):
    # a phantom seed would silently keep its 1/|S| teleport share unpaid
    e = _edges(spark, [("a", "b")])
    with pytest.raises(ValueError, match="not nodes"):
        pagerank(e, seeds=["a", "ghost"])


def test_kcore_converged_peels_tail(spark):
    # triangle a-b-c plus a pendant path c-d-e: 2-core = the triangle only
    e = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")])
    rows = {r["node"]: r["degree"] for r in kcore(e, k=2).collect()}
    assert rows == {"a": 2, "b": 2, "c": 2}


def test_kcore_cascading_removal_needs_multiple_rounds(spark):
    # chain hanging off a triangle peels one link per synchronous round
    e = _edges(
        spark,
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e"), ("e", "f")],
    )
    one_round = {r["node"] for r in kcore(e, k=2, rounds=1).collect()}
    assert one_round == {"a", "b", "c", "d", "e"}  # only f's edge peeled
    converged = {r["node"] for r in kcore(e, k=2).collect()}
    assert converged == {"a", "b", "c"}


def test_kcore_empty_when_k_exceeds_graph(spark):
    e = _edges(spark, [("a", "b"), ("b", "c")])
    assert kcore(e, k=3).count() == 0


def test_kcore_direction_and_self_loops_ignored(spark):
    e = _edges(spark, [("a", "b"), ("b", "a"), ("a", "a"), ("b", "c"), ("a", "c")])
    rows = {r["node"]: r["degree"] for r in kcore(e, k=2).collect()}
    assert rows == {"a": 2, "b": 2, "c": 2}


def test_pagerank_deep_iteration_stays_linear(spark):
    # r feeds both the dangling agg and the contrib join each round; the
    # per-round pin keeps the plan linear — 12 rounds must stay cheap
    # (an unpinned loop doubles the plan per round: 2^12 subtrees) and
    # conserve probability mass
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "b")])
    rows = {r["node"]: r["rank"] for r in pagerank(e, iterations=12).collect()}
    assert sum(rows.values()) == pytest.approx(1.0, abs=1e-4)
    assert rows["b"] > rows["d"]  # b has two in-edges, d one


def test_label_propagation_triangle_converges_to_min(spark):
    # triangle {a,b,c}: r1 → (a:b, b:a, c:a), r2 → all 'a' (hand-computed)
    e = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c")])
    from kgraph_spark.operators.graph_analytics import label_propagation

    r1 = {r["node"]: r["label"] for r in label_propagation(e, rounds=1).collect()}
    assert r1 == {"a": "b", "b": "a", "c": "a"}
    r2 = {r["node"]: r["label"] for r in label_propagation(e, rounds=2).collect()}
    assert r2 == {"a": "a", "b": "a", "c": "a"}


def test_label_propagation_components_get_distinct_labels(spark):
    # two disjoint triangles → each converges to its own min id
    e = _edges(
        spark,
        [("a", "b"), ("b", "c"), ("a", "c"), ("x", "y"), ("y", "z"), ("x", "z")],
    )
    from kgraph_spark.operators.graph_analytics import label_propagation

    rows = {r["node"]: r["label"] for r in label_propagation(e, rounds=3).collect()}
    assert {rows["a"], rows["b"], rows["c"]} == {"a"}
    assert {rows["x"], rows["y"], rows["z"]} == {"x"}


def test_label_propagation_majority_beats_min_tiebreak(spark):
    # n's neighbors carry labels {p, p, q} after r1 seeds: majority p wins
    # even though q < p would win a tie. Build: p1,p2 labelled p via
    # self-converged pair; star center n with leaves p1, p2, q.
    e = _edges(spark, [("n", "p1"), ("n", "p2"), ("n", "q"), ("p1", "p2")])
    from kgraph_spark.operators.graph_analytics import label_propagation

    # r1: n sees {p1, p2, q} → min p1; p1 sees {n, p2} → min n;
    #     p2 sees {n, p1} → min n; q sees {n} → n
    r1 = {r["node"]: r["label"] for r in label_propagation(e, rounds=1).collect()}
    assert r1 == {"n": "p1", "p1": "n", "p2": "n", "q": "n"}
    # r2: n sees labels {n, n, n} → n; majority of identical labels
    r2 = {r["node"]: r["label"] for r in label_propagation(e, rounds=2).collect()}
    assert r2["n"] == "n"


def test_label_propagation_deterministic_and_no_cartesian(spark):
    from conftest import plan_text
    from kgraph_spark.operators.graph_analytics import label_propagation

    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c")])
    one = sorted(map(tuple, label_propagation(e, rounds=3).collect()))
    two = sorted(map(tuple, label_propagation(e, rounds=3).collect()))
    assert one == two
    assert "CartesianProduct" not in plan_text(label_propagation(e, rounds=2, pin_rounds=False))


def test_hits_hand_computed_two_rounds(spark):
    # h1→{a1,a2}, h2→a1 (hand-computed in the operator's L∞ form):
    # r1: auth a1=1.0 a2=0.5; hub h1=1.0 h2=0.666667
    # r2: auth a1=1.0 a2=0.6;  hub h1=1.0 h2=0.625
    e = _edges(spark, [("h1", "a1"), ("h1", "a2"), ("h2", "a1")])
    from kgraph_spark.operators.graph_analytics import hits

    rows = {r["node"]: r for r in hits(e, iterations=2).collect()}
    assert rows["a1"]["authority"] == pytest.approx(1.0)
    assert rows["a2"]["authority"] == pytest.approx(0.6)
    assert rows["h1"]["hub"] == pytest.approx(1.0)
    assert rows["h2"]["hub"] == pytest.approx(0.625)
    # sources hold no authority; sinks no hub score
    assert rows["h1"]["authority"] == 0.0 and rows["a1"]["hub"] == 0.0


def test_hits_exact_fold_matches_hash_sum(spark):
    from kgraph_spark.operators.graph_analytics import hits

    e = _edges(
        spark,
        [("u", "v"), ("u", "w"), ("v", "w"), ("w", "u"), ("x", "w"), ("x", "v")],
    )
    a = sorted(map(tuple, hits(e, iterations=3, exact_fold=True).collect()))
    b = sorted(map(tuple, hits(e, iterations=3, exact_fold=False).collect()))
    assert [t[0] for t in a] == [t[0] for t in b]
    for ra, rb in zip(a, b):
        assert ra[1] == pytest.approx(rb[1], abs=1e-6)
        assert ra[2] == pytest.approx(rb[2], abs=1e-6)


def test_hits_parallel_edges_collapse(spark):
    from kgraph_spark.operators.graph_analytics import hits

    e1 = _edges(spark, [("h", "a"), ("h", "a"), ("g", "a")])
    e2 = _edges(spark, [("h", "a"), ("g", "a")])
    assert sorted(map(tuple, hits(e1, iterations=2).collect())) == sorted(
        map(tuple, hits(e2, iterations=2).collect())
    )


# ---- transitive_closure ----------------------------------------------------


def test_transitive_closure_chain(spark):
    from kgraph_spark.operators.graph_analytics import transitive_closure

    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])
    got = {(r["src"], r["dst"]): r["depth"] for r in transitive_closure(e, max_depth=3).collect()}
    assert got == {
        ("a", "b"): 1, ("b", "c"): 1, ("c", "d"): 1, ("d", "e"): 1,
        ("a", "c"): 2, ("b", "d"): 2, ("c", "e"): 2,
        ("a", "d"): 3, ("b", "e"): 3,
    }  # depth-4 pair (a,e) excluded by max_depth=3


def test_transitive_closure_min_depth_on_shortcut(spark):
    from kgraph_spark.operators.graph_analytics import transitive_closure

    # diamond with a shortcut: a→b→c and a→c directly → depth(a,c) = 1
    e = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c")])
    got = {(r["src"], r["dst"]): r["depth"] for r in transitive_closure(e, max_depth=4).collect()}
    assert got[("a", "c")] == 1 and got[("a", "b")] == 1 and got[("b", "c")] == 1


def test_transitive_closure_cycle_keeps_self_paths(spark):
    from kgraph_spark.operators.graph_analytics import transitive_closure

    e = _edges(spark, [("a", "b"), ("b", "a")])
    got = {(r["src"], r["dst"]): r["depth"] for r in transitive_closure(e, max_depth=4).collect()}
    assert got[("a", "a")] == 2 and got[("b", "b")] == 2


def test_transitive_closure_rejects_bad_depth(spark):
    from kgraph_spark.operators.graph_analytics import transitive_closure

    with pytest.raises(ValueError, match="max_depth"):
        transitive_closure(_edges(spark, [("a", "b")]), max_depth=0)


# ---- harmonic_centrality ---------------------------------------------------


def test_harmonic_centrality_path_graph(spark):
    from kgraph_spark.operators.graph_analytics import harmonic_centrality

    # path a-b-c-d, seeds {a}: d(a,b)=1, d(a,c)=2, d(a,d)=3
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r["node"]: (r["n_reached"], r["harmonic"]) for r in
           harmonic_centrality(e, seeds, max_hops=3).collect()}
    assert got == {"b": (1, 1.0), "c": (1, 0.5), "d": (1, round(1 / 3, 6))}


def test_harmonic_centrality_two_seeds_sum(spark):
    from kgraph_spark.operators.graph_analytics import harmonic_centrality

    # path a-b-c, seeds {a, c}: b is 1 hop from both → harmonic 2.0;
    # a is 0 from itself (excluded) and 2 from c → 0.5; symmetric for c
    e = _edges(spark, [("a", "b"), ("b", "c")])
    seeds = spark.createDataFrame([("a",), ("c",)], "node string")
    got = {r["node"]: r["harmonic"] for r in
           harmonic_centrality(e, seeds, max_hops=2).collect()}
    assert got == {"a": 0.5, "b": 2.0, "c": 0.5}


def test_harmonic_centrality_requires_node_col(spark):
    from kgraph_spark.operators.graph_analytics import harmonic_centrality

    seeds = spark.createDataFrame([("a",)], "id string")
    with pytest.raises(ValueError, match="node"):
        harmonic_centrality(_edges(spark, [("a", "b")]), seeds)


# ---- deterministic_walks ---------------------------------------------------


def test_deterministic_walks_shape_and_determinism(spark):
    from kgraph_spark.operators.graph_analytics import deterministic_walks

    e = _edges(spark, [("a", "b"), ("a", "c"), ("b", "a"), ("b", "c"),
                       ("c", "a"), ("c", "b")])
    seeds = spark.createDataFrame([("a",), ("b",)], "node string")
    r1 = sorted((r["origin"], r["walk_idx"], tuple(r["path"])) for r in
                deterministic_walks(e, seeds, walk_len=4, walks_per_seed=3).collect())
    r2 = sorted((r["origin"], r["walk_idx"], tuple(r["path"])) for r in
                deterministic_walks(e, seeds, walk_len=4, walks_per_seed=3).collect())
    assert r1 == r2  # replay-identical
    assert len(r1) == 6  # 2 seeds × 3 walks
    assert all(len(p) == 5 and p[0] == o for o, _, p in r1)
    # consecutive path elements must be edges
    edge_set = {("a", "b"), ("a", "c"), ("b", "a"), ("b", "c"), ("c", "a"), ("c", "b")}
    for _, _, p in r1:
        assert all((p[i], p[i + 1]) in edge_set for i in range(len(p) - 1))
    # different walk_idx explores differently somewhere (hash varies by walk)
    by_origin = {}
    for o, w, p in r1:
        by_origin.setdefault(o, set()).add(p)
    assert any(len(v) > 1 for v in by_origin.values())


def test_deterministic_walks_halt_at_sink(spark):
    from kgraph_spark.operators.graph_analytics import deterministic_walks

    e = _edges(spark, [("a", "b"), ("b", "c")])  # c is a sink
    seeds = spark.createDataFrame([("a",)], "node string")
    rows = deterministic_walks(e, seeds, walk_len=5, walks_per_seed=1).collect()
    assert len(rows) == 1
    assert list(rows[0]["path"]) == ["a", "b", "c"] and rows[0]["n_steps"] == 2


def test_deterministic_walks_validation(spark):
    from kgraph_spark.operators.graph_analytics import deterministic_walks

    seeds = spark.createDataFrame([("a",)], "node string")
    with pytest.raises(ValueError, match="walk_len"):
        deterministic_walks(_edges(spark, [("a", "b")]), seeds, walk_len=0)
    with pytest.raises(ValueError, match="node"):
        deterministic_walks(
            _edges(spark, [("a", "b")]),
            spark.createDataFrame([("a",)], "id string"),
        )


def test_neighborhood_jaccard_hand_computed(spark):
    # square a-b-c-d-a: diagonals (a,c) and (b,d) share 2 neighbors,
    # union = 2+2-2 = 2 -> jaccard 1.0; adjacent pairs are removed
    from kgraph_spark.operators.graph_analytics import neighborhood_jaccard

    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])
    got = {(r["node_a"], r["node_b"]): r.asDict() for r in neighborhood_jaccard(e).collect()}
    assert set(got) == {("a", "c"), ("b", "d")}
    assert got[("a", "c")]["n_common"] == 2
    assert got[("a", "c")]["n_union"] == 2
    assert got[("a", "c")]["jaccard"] == 1.0


def test_neighborhood_jaccard_min_common_and_partial_overlap(spark):
    # star center u with leaves x,y + extra edge y-z:
    # (x,y): common {u} =1, union deg(x)+deg(y)-1 = 1+2-1 = 2 -> 0.5
    from kgraph_spark.operators.graph_analytics import neighborhood_jaccard

    e = _edges(spark, [("u", "x"), ("u", "y"), ("y", "z")])
    got = {(r["node_a"], r["node_b"]): r for r in neighborhood_jaccard(e).collect()}
    assert got[("x", "y")]["jaccard"] == 0.5
    # (u,z): common {y}, union 2+1-1=2 -> 0.5
    assert got[("u", "z")]["jaccard"] == 0.5
    assert neighborhood_jaccard(e, min_common=2).count() == 0


def test_scc_cycle_vs_dag(spark):
    from kgraph_spark.operators.graph_analytics import strongly_connected_components

    # cycle a->b->c->a is one SCC; d hangs off one-way (its own SCC)
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")],
        "subject_id string, object_id string",
    )
    got = {r["id"]: r["scc_id"] for r in strongly_connected_components(e).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "d": "d"}


def test_scc_two_cycles_one_way_bridge(spark):
    from kgraph_spark.operators.graph_analytics import strongly_connected_components

    e = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("x", "y"), ("y", "x"), ("a", "x")],
        "subject_id string, object_id string",
    )
    got = {r["id"]: r["scc_id"] for r in strongly_connected_components(e).collect()}
    assert got == {"a": "a", "b": "a", "x": "x", "y": "x"}  # bridge does not merge


def test_feature_propagation_hand_computed(spark):
    from kgraph_spark.operators.graph_analytics import feature_propagation

    # path a-b; isolated c. One round, alpha .5:
    # a' = .5*10 + .5*0 = 5 ; b' = .5*0 + .5*10 = 5 ; c stays 7
    e = _edges(spark, [("a", "b")])
    feats = spark.createDataFrame(
        [("a", 10.0), ("b", 0.0), ("c", 7.0)], "id string, f double"
    )
    got = {r["id"]: r["f"] for r in feature_propagation(e, feats, rounds=1).collect()}
    assert got == {"a": 5.0, "b": 5.0, "c": 7.0}
    # second round contracts toward the common mean
    got2 = {r["id"]: r["f"] for r in feature_propagation(e, feats, rounds=2).collect()}
    assert got2["a"] == 5.0 and got2["b"] == 5.0


def test_feature_propagation_validation(spark):
    import pytest

    from kgraph_spark.operators.graph_analytics import feature_propagation

    e = _edges(spark, [("a", "b")])
    feats = spark.createDataFrame([("a", 1.0), ("b", 2.0)], "id string, f double")
    with pytest.raises(ValueError):
        feature_propagation(e, feats, rounds=0)
    with pytest.raises(ValueError):
        feature_propagation(e, feats, alpha=1.5)


def test_assortativity_star_is_negative(spark):
    from kgraph_spark.operators.graph_analytics import degree_assortativity

    # star: hub degree 4, leaves degree 1 -> perfectly disassortative (-1)
    e = _edges(spark, [("h", x) for x in "abcd"])
    r = degree_assortativity(e).collect()[0]
    assert r["assortativity"] == -1.0
    assert r["n_ends"] == 8


def test_assortativity_regular_graph_undefined(spark):
    from kgraph_spark.operators.graph_analytics import degree_assortativity

    # 4-cycle: every degree 2 -> zero variance -> NULL (undefined)
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])
    assert degree_assortativity(e).collect()[0]["assortativity"] is None


def test_ktruss_peels_tail_keeps_clique(spark):
    from kgraph_spark.operators.graph_analytics import ktruss

    # K4 clique (every edge in 2 triangles) + pendant edge d-e (support 0)
    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    e = _edges(spark, k4 + [("d", "e")])
    rows = ktruss(e, k=3, rounds=2).collect()
    got = {(r["a"], r["b"]): r["support"] for r in rows}
    assert len(got) == 6 and ("d", "e") not in got
    assert all(s == 2 for s in got.values())
    # k=4 demands support >= 2: the whole K4 survives
    assert ktruss(e, k=4, rounds=2).count() == 6
    # k=5 demands support >= 3: nothing survives
    assert ktruss(e, k=5, rounds=2).count() == 0


def test_ktruss_cascading_peel(spark):
    from kgraph_spark.operators.graph_analytics import ktruss

    # triangle a-b-c plus a chain that only peels over multiple rounds:
    # edge c-d has support 0 -> round 1 removes it; nothing else cascades
    e = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")])
    assert ktruss(e, k=3, rounds=1).count() == 3


# ---- global transitivity / WL relabeling / butterflies ----------------


def test_transitivity_k4(spark):
    from kgraph_spark.operators.graph_analytics import global_transitivity

    nodes = ["a", "b", "c", "d"]
    e = _edges(spark, [(x, y) for x in nodes for y in nodes if x < y])
    row = global_transitivity(e).collect()[0]
    # K4: 4 triangles, each node d=3 -> 4*3 = 12 wedges, 3*4/12 = 1.0
    assert row["n_triangles"] == 4
    assert row["n_wedges"] == 12
    assert row["transitivity"] == 1.0


def test_transitivity_star_zero(spark):
    from kgraph_spark.operators.graph_analytics import global_transitivity

    e = _edges(spark, [("hub", x) for x in ["a", "b", "c", "d"]])
    row = global_transitivity(e).collect()[0]
    assert row["n_triangles"] == 0
    assert row["n_wedges"] == 6  # C(4,2) wedges through the hub
    assert row["transitivity"] == 0.0


def test_transitivity_empty_wedges_null(spark):
    from kgraph_spark.operators.graph_analytics import global_transitivity

    e = _edges(spark, [("a", "b")])  # single edge: no wedge at all
    row = global_transitivity(e).collect()[0]
    assert row["n_triangles"] == 0 and row["n_wedges"] == 0
    assert row["transitivity"] is None


def test_wl_distinguishes_roles(spark):
    from kgraph_spark.operators.graph_analytics import wl_labels

    # path a-b-c-d-e: by symmetry {a,e}, {b,d} share a role, c is its own
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])
    rows = {r["node"]: r["wl_label"] for r in wl_labels(e, rounds=2).collect()}
    assert rows["a"] == rows["e"]
    assert rows["b"] == rows["d"]
    assert len({rows["a"], rows["b"], rows["c"]}) == 3


def test_wl_deterministic_and_direction_blind(spark):
    from kgraph_spark.operators.graph_analytics import wl_labels

    e1 = _edges(spark, [("a", "b"), ("b", "c")])
    e2 = _edges(spark, [("b", "a"), ("c", "b"), ("a", "b")])  # flipped + dup
    r1 = sorted((r["node"], r["wl_label"]) for r in wl_labels(e1, rounds=3).collect())
    r2 = sorted((r["node"], r["wl_label"]) for r in wl_labels(e2, rounds=3).collect())
    assert r1 == r2


def test_wl_init_labels_seed(spark):
    from kgraph_spark.operators.graph_analytics import wl_labels

    e = _edges(spark, [("a", "b"), ("b", "c")])
    # identical degree-1 endpoints diverge when seeded with distinct labels
    seeds = spark.createDataFrame(
        [("a", "x"), ("b", "y"), ("c", "z")], "node string, wl_label string"
    )
    rows = {r["node"]: r["wl_label"] for r in wl_labels(e, rounds=1, init_labels=seeds).collect()}
    assert rows["a"] != rows["c"]
    with pytest.raises(ValueError):
        wl_labels(e, rounds=1, init_labels=seeds.withColumnRenamed("wl_label", "lbl"))
    with pytest.raises(ValueError):
        wl_labels(e, rounds=0)


def test_butterflies_k22_and_k23(spark):
    from kgraph_spark.operators.graph_analytics import butterfly_counts

    # K(2,2): one butterfly; K(2,3) on (x,y): c=3 -> C(3,2)=3
    e = _edges(
        spark,
        [("x", "r1"), ("x", "r2"), ("y", "r1"), ("y", "r2"),
         ("u", "s1"), ("u", "s2"), ("u", "s3"), ("v", "s1"), ("v", "s2"), ("v", "s3")],
    )
    rows = {(r["a"], r["b"]): r for r in butterfly_counts(e).collect()}
    assert rows[("x", "y")]["n_common"] == 2 and rows[("x", "y")]["n_butterflies"] == 1
    assert rows[("u", "v")]["n_common"] == 3 and rows[("u", "v")]["n_butterflies"] == 3
    assert len(rows) == 2  # cross pairs share nothing


def test_butterflies_min_common_prunes_and_dedups(spark):
    from kgraph_spark.operators.graph_analytics import butterfly_counts

    e = _edges(spark, [("x", "r1"), ("y", "r1"), ("x", "r1")])  # dup edge
    assert butterfly_counts(e).count() == 0  # c=1 pruned at default min_common=2
    rows = butterfly_counts(e, min_common=1).collect()
    assert len(rows) == 1 and rows[0]["n_common"] == 1 and rows[0]["n_butterflies"] == 0


def test_powerlaw_alpha_hand_values(spark):
    from kgraph_spark.operators.graph_analytics import degree_powerlaw_alpha

    # star with 8 leaves: hub degree 8, leaves degree 1 (below d_min=2)
    e = _edges(spark, [("hub", f"x{i}") for i in range(8)])
    row = degree_powerlaw_alpha(e, d_min=2).collect()[0]
    # tail = {hub}: alpha = 1 + 1/ln(8/2) = 1 + 1/ln 4
    import math

    assert row["n_tail"] == 1
    assert abs(row["alpha"] - (1 + 1 / math.log(4))) < 1e-5


def test_powerlaw_alpha_degenerate_null(spark):
    from kgraph_spark.operators.graph_analytics import degree_powerlaw_alpha

    # every tail node at exactly d_min: sum of ln terms = 0 -> NULL alpha
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    row = degree_powerlaw_alpha(e, d_min=2).collect()[0]
    assert row["n_tail"] == 3 and row["alpha"] is None


def test_modularity_two_cliques_vs_random(spark):
    from kgraph_spark.operators.graph_analytics import modularity

    # two 4-cliques joined by one bridge: the natural 2-community split
    c1 = [f"a{i}" for i in range(4)]
    c2 = [f"b{i}" for i in range(4)]
    pairs = [(x, y) for x in c1 for y in c1 if x < y] + [
        (x, y) for x in c2 for y in c2 if x < y
    ] + [("a0", "b0")]
    e = _edges(spark, pairs)
    good = spark.createDataFrame(
        [(n, "A") for n in c1] + [(n, "B") for n in c2], "node string, label string"
    )
    row = modularity(e, good).collect()[0]
    # m=13; e_A=e_B=6, d_A=13, d_B=13: Q = 2*(6/13 - (13/26)^2) ~ 0.42307
    assert row["m"] == 13 and row["n_communities"] == 2
    assert abs(row["modularity"] - (2 * (6 / 13 - 0.25))) < 1e-5
    # everything in ONE community scores ~0 by construction
    allone = good.select("node", F.lit("X").alias("label"))
    assert abs(modularity(e, allone).collect()[0]["modularity"]) < 1e-9


def test_modularity_partial_labels_singletons(spark):
    from kgraph_spark.operators.graph_analytics import modularity

    e = _edges(spark, [("x", "y"), ("y", "z")])
    labels = spark.createDataFrame([("x", "L")], "node string, label string")
    row = modularity(e, labels).collect()[0]
    # y and z become singletons: no intra edges anywhere
    assert row["n_communities"] == 3
    assert row["modularity"] < 0  # all-cut partitions score negative


def test_neighborhood_sizes_path_and_cap(spark):
    from kgraph_spark.operators.graph_analytics import neighborhood_sizes

    # path a-b-c-d: 2-hop balls are 2,3,3,2
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    rows = {r["node"]: r for r in neighborhood_sizes(e).collect()}
    assert {n: r["n_2hop"] for n, r in rows.items()} == {"a": 2, "b": 3, "c": 3, "d": 2}
    assert rows["b"]["n_1hop"] == 2
    # capping out the hub b (degree 2 > 1) removes paths THROUGH it:
    # a's ball shrinks to its direct neighbor only
    capped = {r["node"]: r["n_2hop"] for r in neighborhood_sizes(e, max_node_degree=1).collect()}
    assert capped["a"] == 1


def test_edge_lift_hand_case(spark):
    from kgraph_spark.operators.graph_analytics import edge_lift

    # triangle a-b (w2), b-c (w1), a-c (w1): W=4, 2W=8
    # strengths: a=3, b=3, c=2
    edges = spark.createDataFrame(
        [("a", "b", 2), ("b", "c", 1), ("c", "a", 1)],
        "subject_id string, object_id string, w int",
    )
    out = {(r["subject_id"], r["object_id"]): r["lift"]
           for r in edge_lift(edges, weight="w").collect()}
    assert out[("a", "b")] == round(2 * 8 / (3 * 3), 6)
    assert out[("b", "c")] == round(1 * 8 / (3 * 2), 6)
    assert out[("a", "c")] == round(1 * 8 / (3 * 2), 6)


def test_edge_lift_direction_blind_and_unweighted(spark):
    from kgraph_spark.operators.graph_analytics import edge_lift

    # b->a and a->b fold to one undirected pair of weight 2; self loop drops
    edges = spark.createDataFrame(
        [("b", "a"), ("a", "b"), ("x", "x")],
        "subject_id string, object_id string",
    )
    rows = edge_lift(edges).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["subject_id"], r["object_id"], r["weight"]) == ("a", "b", 2)
    assert r["lift"] == round(2 * 4 / (2 * 2), 6)  # single-pair graph: 2W=4


def test_reciprocity_hand_graph(spark):
    from kgraph_spark.operators.graph_analytics import reciprocity

    # a→b, b→a (reciprocated pair), a→c (one-way), d→d (self loop, dropped)
    e = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "c"), ("d", "d"), ("a", "b")],
        "subject_id string, object_id string",
    )
    row = reciprocity(e).first()
    assert row["n_edges"] == 3 and row["n_reciprocated"] == 2
    assert row["reciprocity"] == pytest.approx(2 / 3, abs=1e-6)


def test_reciprocity_grouped_zero_and_full(spark):
    from kgraph_spark.operators.graph_analytics import reciprocity

    e = spark.createDataFrame(
        [("sym", "x", "y"), ("sym", "y", "x"), ("asym", "x", "y")],
        "p string, subject_id string, object_id string",
    )
    out = {r["p"]: r for r in reciprocity(e, group_col="p").collect()}
    assert out["sym"]["reciprocity"] == 1.0
    assert out["asym"]["reciprocity"] == 0.0


def test_rich_club_star_vs_clique(spark):
    from kgraph_spark.operators.graph_analytics import rich_club

    # 4-clique + 3 pendant nodes on a: deg(a)=6, deg(b,c,d)=3, pendants 1
    clique = [(u, v) for u in "abcd" for v in "abcd" if u < v]
    pend = [("a", p) for p in ("p1", "p2", "p3")]
    e = spark.createDataFrame(
        clique + pend, "subject_id string, object_id string"
    )
    out = {r["k"]: r for r in rich_club(e, k_grid=[1, 2, 5]).collect()}
    # k=1: clique nodes + a all have deg>1 → 4 nodes, 6 edges → phi=1.0
    assert out[1]["n_nodes"] == 4 and out[1]["phi"] == pytest.approx(1.0)
    assert out[2]["n_nodes"] == 4  # same club at k=2
    # k=5: only the hub clears → phi NULL
    assert out[5]["n_nodes"] == 1 and out[5]["phi"] is None


def test_bowtie_hand_graph(spark):
    from kgraph_spark.operators.graph_analytics import bowtie_classification

    # core cycle a→b→c→a; i→a (IN); c→o (OUT); x→y island (OTHER)
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("i", "a"), ("c", "o"),
         ("x", "y")],
        "subject_id string, object_id string",
    )
    out = {r["id"]: r["cls"] for r in bowtie_classification(e).collect()}
    assert out == {"a": "CORE", "b": "CORE", "c": "CORE", "i": "IN",
                   "o": "OUT", "x": "OTHER", "y": "OTHER"}


def test_bowtie_partition_covers_all_nodes(spark):
    from kgraph_spark.operators.graph_analytics import bowtie_classification

    docs = spark.range(60).select(F.col("id").alias("doc_id"))
    e = docs.select(
        F.col("doc_id").alias("subject_id"),
        ((F.col("doc_id") * 2 + 1) % 60).alias("object_id"),
    )
    rows = bowtie_classification(e).collect()
    assert len(rows) == 60 and all(
        r["cls"] in ("CORE", "IN", "OUT", "OTHER") for r in rows
    )


def test_eccentricity_profile_path_graph(spark):
    from kgraph_spark.operators.graph_analytics import eccentricity_profile

    # path 0->1->2->3: ecc(0)=3, ecc(1)=2, ecc(2)=1; node 3 absent
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "subject_id long, object_id long"
    )
    out = {r["node"]: r for r in eccentricity_profile(e, max_depth=4).collect()}
    assert set(out) == {0, 1, 2}
    assert out[0]["ecc"] == 3 and out[0]["n_reached"] == 3
    assert out[1]["ecc"] == 2 and out[2]["ecc"] == 1
    # horizon clips: max_depth=2 caps node 0 at ecc 2
    out2 = {r["node"]: r for r in eccentricity_profile(e, max_depth=2).collect()}
    assert out2[0]["ecc"] == 2 and out2[0]["n_reached"] == 2


def test_attribute_mixing_perfectly_assortative(spark):
    from kgraph_spark.operators.graph_analytics import attribute_mixing

    e = spark.createDataFrame(
        [(1, 2), (3, 4)], "subject_id long, object_id long"
    )
    t = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y"), (4, "y")], "entity_id long, type string"
    )
    rows = attribute_mixing(e, t).collect()
    assert all(r["assortativity"] == 1.0 for r in rows)
    assert {(r["type_a"], r["type_b"]) for r in rows} == {("x", "x"), ("y", "y")}


def test_attribute_mixing_perfectly_disassortative(spark):
    from kgraph_spark.operators.graph_analytics import attribute_mixing

    e = spark.createDataFrame(
        [(1, 3), (3, 1)], "subject_id long, object_id long"
    )
    t = spark.createDataFrame(
        [(1, "x"), (3, "y")], "entity_id long, type string"
    )
    rows = attribute_mixing(e, t).collect()
    assert all(r["assortativity"] == -1.0 for r in rows)
    assert all(r["frac_micro"] == 500_000 for r in rows)


def test_dag_levels_diamond(spark):
    from kgraph_spark.operators.graph_analytics import dag_levels

    e = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)],
        "subject_id long, object_id long",
    )
    out = {r["node"]: r["level"] for r in dag_levels(e, max_depth=6).collect()}
    assert out == {0: 0, 1: 1, 2: 1, 3: 2, 4: 3}


def test_dag_levels_cycle_clamps_at_max_depth(spark):
    from kgraph_spark.operators.graph_analytics import dag_levels

    # 0 -> 1 <-> 2: the cycle has no root-free fold, levels clamp
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 1)], "subject_id long, object_id long"
    )
    out = {r["node"]: r["level"] for r in dag_levels(e, max_depth=4).collect()}
    assert out[0] == 0
    assert max(out.values()) <= 4  # documented cycle clamp, not divergence


def test_global_efficiency_path_and_complete(spark):
    from kgraph_spark.operators.graph_analytics import global_efficiency

    # directed path 0->1->2: pairs (0,1)d1 (1,2)d1 (0,2)d2
    # sum micro = 1e6+1e6+5e5; ordered pairs = 3*2 = 6
    e = spark.createDataFrame([(0, 1), (1, 2)], "subject_id long, object_id long")
    r = global_efficiency(e, max_depth=4).first()
    assert r["n_nodes"] == 3 and r["n_reachable_pairs"] == 3
    assert r["efficiency"] == round(2_500_000 / 6 / 1e6, 6)
    # complete digraph on 2 nodes: efficiency 1
    k2 = spark.createDataFrame([(0, 1), (1, 0)], "subject_id long, object_id long")
    assert global_efficiency(k2).first()["efficiency"] == 1.0


def test_hub_removal_robustness_hand_case(spark):
    from kgraph_spark.operators.graph_analytics import hub_removal_robustness

    # star: hub h -> 5 leaves, plus a detached edge x-y
    edges = [("h", f"l{i}") for i in range(5)] + [("x", "y")]
    df = spark.createDataFrame(edges, "subject_id string, object_id string")
    out = {r["phase"]: r for r in hub_removal_robustness(df, top_k=1).collect()}
    b, a = out["before"], out["after"]
    assert (b["n_nodes"], b["n_edges"], b["max_degree"], b["wedges"]) == (8, 6, 5, 10)
    assert b["hubs_removed"] == 0 and a["hubs_removed"] == 1
    # removing the hub leaves only x-y; leaves become isolated (dropped)
    assert (a["n_nodes"], a["n_edges"], a["max_degree"], a["wedges"]) == (2, 1, 1, 0)
    # reverse-duplicate edges collapse to one undirected edge
    dup = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "subject_id string, object_id string"
    )
    d = {r["phase"]: r for r in hub_removal_robustness(dup, top_k=0).collect()}
    assert d["before"]["n_edges"] == 1


def test_neighbor_type_entropy_hand_case(spark):
    import math

    from kgraph_spark.operators.graph_analytics import neighbor_type_entropy

    edges = [("Oa", "P1"), ("Oa", "P2"), ("Oa", "S1")]
    df = spark.createDataFrame(edges, "subject_id string, object_id string")
    out = {r["node"]: r for r in neighbor_type_entropy(df).collect()}
    hub = out["Oa"]
    assert (hub["degree"], hub["k_types"]) == (3, 2)
    h = -(2 / 3) * math.log2(2 / 3) - (1 / 3) * math.log2(1 / 3)
    assert hub["h_bits"] == pytest.approx(h, abs=1e-5)
    assert hub["h_norm"] == pytest.approx(h, abs=1e-5)  # k=2 -> /1
    leaf = out["P1"]
    assert (leaf["degree"], leaf["k_types"]) == (1, 1)
    assert leaf["h_bits"] == pytest.approx(0.0, abs=1e-9)
    assert leaf["h_norm"] is None
