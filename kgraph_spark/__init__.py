"""kgraph_spark — a PySpark-native knowledge-graph construction engine.

Re-implements the capabilities of the reference wware/kgraph framework
(see /root/reference, studied read-only) as staged, declarative Spark
DataFrame transforms:

    documents(doc_id, spans) → chunks → mentions → entities (resolved,
    canonicalized via connected components) → triples (validated,
    accumulated) → export tables (entities / relationships / mentions /
    evidence + manifest)

Design stance (SURVEY.md §7):
  * Every stage is a pure function DataFrame -> DataFrame.
  * Built-in pyspark.sql.functions wherever possible (whole-stage codegen);
    vectorized pandas UDFs only for regex gazetteer matching, chunking and
    relation-pattern extraction (batched, Arrow-backed, never per-row Python).
  * All joins against dimension tables (KB dict, predicate constraints) are
    broadcast hash joins; big-table shuffles are keyed on doc_id or entity_id.
  * All IDs are content-hashed (no uuid4) so re-runs and distributed
    executors agree — required for idempotent resume.
  * Canonical merge (SAME_AS transitive closure) is a bounded-iteration
    hash-to-min connected-components loop with localCheckpoint per round.
"""

__version__ = "0.1.0"
