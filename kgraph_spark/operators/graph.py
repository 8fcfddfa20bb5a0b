"""Query-side graph operators (SURVEY.md §2 H1–H4).

The reference's BFS subgraph extraction (kgserver/query/graph_traversal.py:178-290)
as an iterative frontier join over the triples/edge table: per hop,
frontier ⨝ edges (both directions), dedup, cap. Hop count ≤ 5 in the
reference; each hop is one shuffle on the join key — at scale the edge table
should be bucketed by subject_id so frontier joins co-locate."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# reference kgserver/query/graph_traversal.py:20-23
MAX_HOPS = 5
MAX_NODES_LIMIT = 2000
MAX_EDGES_LIMIT = 10000
DEFAULT_MAX_NODES = 500


def _bfs_visited(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    max_nodes: int | None,
    directed: bool,
) -> tuple[DataFrame, int]:
    """BFS frontier loop returning (visited(entity_id, hop), visited_count).

    ONE Spark action per hop: the frontier is lazily localCheckpoint-marked
    and its count() both materializes the checkpoint and drives convergence
    + the node-cap check (the round-2 form ran limit(1).count() + a visited
    re-checkpoint + visited.count() — 3-4 driver round-trips per hop).
    `visited` stays a lazy union of checkpointed hop frames, so its plan is
    k shallow leaves, never a deep lineage."""
    fwd = edges.select(F.col("subject_id").alias("src"), F.col("object_id").alias("dst"))
    und = fwd if directed else fwd.union(
        edges.select(F.col("object_id").alias("src"), F.col("subject_id").alias("dst"))
    )
    visited = (
        seeds.select(F.col("entity_id")).distinct().withColumn("hop", F.lit(0))
        .localCheckpoint(eager=False)
    )
    total = visited.count()
    frontier = visited
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(und, frontier["entity_id"] == und["src"], "inner")
            .select(F.col("dst").alias("entity_id"))
            .distinct()
            .join(visited.select("entity_id"), "entity_id", "left_anti")
            .withColumn("hop", F.lit(hop))
            .localCheckpoint(eager=False)
        )
        n_new = nxt.count()  # the hop's single action: compute+checkpoint+count
        if n_new == 0:
            break
        visited = visited.union(nxt)
        frontier = nxt
        total += n_new
        if max_nodes is not None and total >= max_nodes:
            break
    return visited, total


def bfs_subgraph(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 3,
    max_nodes: int | None = None,
    directed: bool = False,
) -> DataFrame:
    """edges(subject_id, predicate, object_id), seeds(entity_id) →
    (entity_id, hop) reachable within max_hops (hop = first-reach distance).

    Mirrors extract_subgraph BFS semantics (graph_traversal.py:178-290):
    frontier expansion with visited-set dedup and optional node cap."""
    visited, total = _bfs_visited(edges, seeds, max_hops, max_nodes, directed)
    if max_nodes is not None and total > max_nodes:
        return visited.orderBy("hop", "entity_id").limit(max_nodes)
    return visited


@dataclass
class SubgraphResult:
    """Mirror of the reference's SubgraphResponse (graph_traversal.py:283-291):
    node/edge frames plus the truncation signal."""

    nodes: DataFrame
    edges: DataFrame
    truncated: bool


def extract_subgraph(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 3,
    max_nodes: int = DEFAULT_MAX_NODES,
    max_edges: int = MAX_EDGES_LIMIT,
    min_confidence: float | None = None,
    directed: bool = False,
) -> SubgraphResult:
    """Full-parity subgraph extraction (reference extract_subgraph,
    graph_traversal.py:178-290 + multi-seed 295-377):

      * min_confidence filters edges BEFORE traversal (they shape topology,
        graph_traversal.py:337-338);
      * hop cap MAX_HOPS=5, node cap min(max_nodes, MAX_NODES_LIMIT=2000),
        edge cap MAX_EDGES_LIMIT=10000;
      * truncated=True whenever a cap dropped anything (node cap mid-BFS or
        edge cap post-filter, graph_traversal.py:252-256, 277-280).

    Truncation choice differs deliberately from the reference: its BFS stops
    mid-hop at whatever iteration order the dict happened to produce; ours
    truncates deterministically by (hop, entity_id) — same cap, stable
    output on any executor layout."""
    max_hops = min(max_hops, MAX_HOPS)
    max_nodes = min(max_nodes, MAX_NODES_LIMIT) if max_nodes else MAX_NODES_LIMIT
    max_edges = min(max_edges, MAX_EDGES_LIMIT) if max_edges else MAX_EDGES_LIMIT
    e = edges
    if min_confidence is not None and "confidence" in e.columns:
        e = e.filter(F.coalesce(F.col("confidence"), F.lit(0.0)) >= min_confidence)
    # cap+1 so the flag can distinguish "exactly at cap" from "truncated";
    # _bfs_visited already knows the visited count — no extra count action
    nodes, total = _bfs_visited(e, seeds, max_hops, max_nodes + 1, directed)
    truncated = False
    if total > max_nodes:
        truncated = True
        nodes = nodes.orderBy("hop", "entity_id").limit(max_nodes).localCheckpoint()
    sub = subgraph_edges(e, nodes)
    n_edges = sub.count()
    if n_edges > max_edges:
        truncated = True
        sub = sub.orderBy("subject_id", "predicate", "object_id").limit(max_edges)
    return SubgraphResult(nodes=nodes, edges=sub, truncated=truncated)


def run_bfs_query(
    edges: DataFrame, query: dict, entities: DataFrame | None = None
) -> tuple[DataFrame, DataFrame]:
    """H2 BFS query language (reference bfsql.md:22-37): JSON query
    {seeds: [...], max_hops, node_filter: {entity_types: [...]},
     edge_filter: {predicates: [...]}} → (nodes, edges).

    Filters affect PRESENTATION, not topology (bfsql.md semantics): the BFS
    runs over all edges; non-matching nodes come back as stubs
    (is_full=false), non-matching edges are dropped from the edge listing
    only.

    entities: the entities dimension (entity_id, entity_type) — node_filter
    matches on the entity's REGISTERED type via a broadcast join (reference
    semantics; an id prefix is not a type). Nodes absent from the dimension
    are stubs when a filter is active."""
    spark = edges.sparkSession
    seeds = spark.createDataFrame([(s,) for s in query["seeds"]], "entity_id string")
    nodes = bfs_subgraph(
        edges,
        seeds,
        max_hops=int(query.get("max_hops", 3)),
        max_nodes=query.get("max_nodes"),
        directed=bool(query.get("directed", False)),
    )
    etypes = (query.get("node_filter") or {}).get("entity_types")
    if etypes:
        if entities is None:
            raise ValueError(
                "node_filter.entity_types requires the entities dimension "
                "(entity_id, entity_type) — id prefixes are not types"
            )
        dim = F.broadcast(
            entities.select("entity_id", F.col("entity_type").alias("_ftype")).distinct()
        )
        nodes = (
            nodes.join(dim, "entity_id", "left")
            .withColumn(
                "is_full", F.coalesce(F.col("_ftype").isin(*etypes), F.lit(False))
            )
            .drop("_ftype")
        )
    else:
        nodes = nodes.withColumn("is_full", F.lit(True))
    sub_edges = subgraph_edges(edges, nodes)
    preds = (query.get("edge_filter") or {}).get("predicates")
    if preds:
        sub_edges = sub_edges.filter(F.col("predicate").isin(*preds))
    return nodes, sub_edges


def subgraph_edges(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """Edges with both endpoints inside the node set (H2 presentation rule:
    filters affect presentation, not topology — bfsql.md:1-60)."""
    n = nodes.select(F.col("entity_id")).distinct()
    return (
        edges.join(n.withColumnRenamed("entity_id", "subject_id"), "subject_id", "left_semi")
        .join(n.withColumnRenamed("entity_id", "object_id"), "object_id", "left_semi")
    )


def entity_alias_index(entities: DataFrame) -> DataFrame:
    """H3 scale path: exploded lowercase alias index (alias_lc, entity_id) —
    one narrow row per name/synonym instead of one wide entity row. Built
    once per bundle (alongside the H4 bucketed triple writer), it turns
    substring search into a scan of two small columns plus an id semi-join;
    the wide entities table is only touched for the matching ids. Same
    normalization (lower) as the scan path so results are identical."""
    return (
        entities.select(
            "entity_id",
            F.explode(
                F.array_union(
                    F.array(F.col("name")), F.coalesce(F.col("synonyms"), F.array())
                )
            ).alias("_alias"),
        )
        .select(F.lower(F.col("_alias")).alias("alias_lc"), "entity_id")
        .distinct()
    )


def find_entities(
    entities: DataFrame,
    name_substring: str | None = None,
    entity_type: str | None = None,
    alias_index: DataFrame | None = None,
) -> DataFrame:
    """H3 entity search (reference find_by_name, memory.py:153-182):
    case-insensitive substring over name + synonyms, optional type filter.

    With `alias_index` (entity_alias_index) the substring predicate runs on
    the narrow index and the entities table is reached by LeftSemi on the
    matching ids — no full wide-row scan (r3 verdict item 7; equivalence +
    plan-asserted in tests). Without it, the scan path stands."""
    out = entities
    if entity_type is not None:
        out = out.filter(F.col("entity_type") == entity_type)
    if name_substring:
        needle = name_substring.lower()
        if alias_index is not None:
            ids = (
                alias_index.filter(F.col("alias_lc").contains(needle))
                .select("entity_id")
                .distinct()
            )
            out = out.join(ids, "entity_id", "left_semi")
        else:
            in_name = F.lower(F.col("name")).contains(needle)
            in_syn = F.exists(
                F.coalesce(F.col("synonyms"), F.array()),
                lambda s: F.lower(s).contains(needle),
            )
            out = out.filter(in_name | in_syn)
    return out


def get_by_subject(edges: DataFrame, subject_id: str) -> DataFrame:
    """H4 (memory.py:424-472) — with the edge table bucketed by subject_id
    this is a pruned single-bucket scan."""
    return edges.filter(F.col("subject_id") == subject_id)


def get_by_object(edges: DataFrame, object_id: str) -> DataFrame:
    return edges.filter(F.col("object_id") == object_id)


def get_by_document(edges: DataFrame, doc_id: str) -> DataFrame:
    return edges.filter(F.array_contains(F.col("source_documents"), doc_id))


def find_by_triple(edges: DataFrame, s: str, p: str, o: str) -> DataFrame:
    return edges.filter(
        (F.col("subject_id") == s) & (F.col("predicate") == p) & (F.col("object_id") == o)
    )
