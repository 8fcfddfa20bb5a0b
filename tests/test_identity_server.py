"""D13 event-replay equivalence: the batch identity restatement
(operators/identity.py) equals an event-driven IdentityServer replay.

The reference ABC (kgschema/kgschema/identity.py:180-182) states the
equivalence this test proves: "This event-driven model subsumes batch
synonym sweeps: a batch sweep is equivalent to replaying on_entity_added
for every entity in the store." EventIdentityServer below is a synchronous
in-memory restatement of the ABC's resolve / on_entity_added /
find_synonyms / merge semantics (insert-then-probe, advisory-lock-free
because single-threaded); the test replays the same request stream through
it ONE EVENT AT A TIME — in two different orders — and asserts the final
request→survivor map, live-entity set, and tombstone pointers all equal
the batch output exactly."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from kgraph_spark.config import is_authoritative_id
from kgraph_spark.functions.normalize import norm_dedup_py
from kgraph_spark.golden import prov_id
from kgraph_spark.operators.identity import (
    follow_tombstones,
    merge_identities,
    resolve_identity_requests,
    synonym_sweep,
)


class EventIdentityServer:
    """In-memory event-driven twin of the reference IdentityServer ABC.

    Semantics restated from kgschema/identity.py and the ingest loop
    (examples/medlit/pipeline/dedup.py:848-875):
      resolve: authoritative hint short-circuits; else mint the
        content-hash provisional id (the idempotent-creation contract —
        "resolve() handles normalization, authority lookup, provisional
        creation", dedup.py:808-810; name-level dedup is NOT resolve's job,
        on_entity_added's merge is what unifies same-surface entities).
      on_entity_added: claim the event's surfaces, find live entities
        sharing any claimed (norm_key, type), merge them all into the
        preferred survivor (authoritative first, then smallest id — the
        same total order the batch election uses).
      merge: losers marked merged_into=survivor; survivor inherits their
        surfaces; idempotent (re-merging is a no-op)."""

    def __init__(self):
        self.surfaces: dict[str, set[tuple[str, str]]] = {}  # live id -> claimed keys
        self.claims: dict[tuple[str, str], set[str]] = {}  # key -> live claimant ids
        self.merged_into: dict[str, str] = {}

    def _follow(self, eid: str) -> str:
        while eid in self.merged_into:
            eid = self.merged_into[eid]
        return eid

    def resolve(self, mention: str, etype: str, hint: str | None = None) -> str:
        if hint and is_authoritative_id(hint):
            return self._follow(hint)
        return self._follow(prov_id(mention, etype))

    def on_entity_added(self, eid: str, surfaces: list[str], etype: str) -> str:
        eid = self._follow(eid)
        keys = {(norm_dedup_py(s), etype) for s in surfaces if norm_dedup_py(s)}
        self.surfaces.setdefault(eid, set()).update(keys)
        for k in keys:
            self.claims.setdefault(k, set()).add(eid)
        cands = {self._follow(c) for k in keys for c in self.claims.get(k, ())} - {eid}
        if cands:
            group = sorted(cands | {eid}, key=lambda i: (not is_authoritative_id(i), i))
            survivor = group[0]
            for loser in group[1:]:
                self._merge(loser, survivor)
            return survivor
        return eid

    def _merge(self, loser: str, survivor: str) -> None:
        if loser == survivor or loser in self.merged_into:
            return
        self.merged_into[loser] = survivor
        keys = self.surfaces.pop(loser, set())
        self.surfaces.setdefault(survivor, set()).update(keys)
        for k in keys:
            c = self.claims[k]
            c.discard(loser)
            c.add(survivor)
        # path-compress pointers so every tombstone stays one hop away,
        # matching the batch id_map's direct loser→final mapping
        for stale, tgt in list(self.merged_into.items()):
            if tgt == loser:
                self.merged_into[stale] = survivor

    def replay(self, events) -> dict[int, str]:
        assigned = {}
        for i, (mention, etype, hint, synonyms) in events:
            eid = self.resolve(mention, etype, hint)
            eid = self.on_entity_added(eid, [mention, *synonyms], etype)
            assigned[i] = eid
        return {i: self._follow(e) for i, e in assigned.items()}


def _gen_events(seed: int, n: int = 120):
    """Seeded stream: vocab collisions, case/punctuation variants (norm does
    real work), authoritative hints, and synonym lists that bridge groups."""
    rng = random.Random(seed)
    vocab = [f"term {i}" for i in range(18)]
    events = []
    for i in range(n):
        base = rng.choice(vocab)
        mention = rng.choice([base, base.title(), base.upper() + "!", " " + base])
        etype = rng.choice(["drug", "gene"])
        hint = f"MeSH:D{vocab.index(base)}{etype[0]}" if rng.random() < 0.25 else None
        synonyms = [rng.choice(vocab)] if rng.random() < 0.3 else []
        events.append((i, (mention, etype, hint, synonyms)))
    return events


def _batch(spark, events):
    """The batch restatement over the same stream: resolve every request
    against the (empty) store, build the store rows it implies, sweep,
    merge, and follow the id map — order-free."""
    req_rows = [
        (i, mention, etype, hint) for i, (mention, etype, hint, _syn) in events
    ]
    requests = spark.createDataFrame(
        req_rows, "request_id long, mention string, entity_type string, canonical_id_hint string"
    )
    resolved = resolve_identity_requests(
        requests,
        spark.createDataFrame(
            [], "entity_id string, entity_type string, name string, synonyms array<string>"
        ),
    )
    ent_rows = [
        (mention, etype, hint, syn)
        for _i, (mention, etype, hint, syn) in events
    ]
    ents_src = spark.createDataFrame(
        ent_rows, "mention string, entity_type string, canonical_id_hint string, syns array<string>"
    )
    with_ids = resolve_identity_requests(
        ents_src.withColumnRenamed("mention", "mention"),
        spark.createDataFrame(
            [], "entity_id string, entity_type string, name string, synonyms array<string>"
        ),
    )
    entities = (
        with_ids.select(
            "entity_id",
            "entity_type",
            F.col("mention").alias("name"),
            F.array_union(F.array("mention"), F.coalesce("syns", F.array())).alias("synonyms"),
        )
        .groupBy("entity_id", "entity_type")
        .agg(
            F.min("name").alias("name"),
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("synonyms")))).alias("synonyms"),
        )
        .withColumn("status", F.lit("provisional"))
    )
    edges = synonym_sweep(entities)
    merged, id_map = merge_identities(entities, edges)
    final = follow_tombstones(resolved.select("request_id", "entity_id"), merged)
    got = {r["request_id"]: r["entity_id"] for r in final.collect()}
    live = {
        r["entity_id"] for r in merged.filter(F.col("status") != "merged").collect()
    }
    tomb = {
        r["entity_id"]: r["merged_into"]
        for r in merged.filter(F.col("status") == "merged").collect()
    }
    return got, live, tomb


def test_event_replay_equivalence(spark):
    events = _gen_events(seed=7)
    batch_map, batch_live, batch_tomb = _batch(spark, events)

    for order in (events, list(reversed(events)), sorted(events, key=lambda e: repr(e[1]))):
        srv = EventIdentityServer()
        event_map = srv.replay(order)
        assert event_map == batch_map
        event_live = set(srv.surfaces)
        assert event_live == batch_live
        event_tomb = {k: srv._follow(v) for k, v in srv.merged_into.items()}
        assert event_tomb == batch_tomb


def test_resolve_idempotent(spark):
    """identity.py:61-63 — resolving the same mention twice returns the
    same id, and re-running the whole batch reproduces it bit for bit."""
    events = _gen_events(seed=11, n=40)
    m1, l1, t1 = _batch(spark, events)
    m2, l2, t2 = _batch(spark, events)
    assert (m1, l1, t1) == (m2, l2, t2)


def test_merge_idempotent(spark):
    """identity.py:145-147 — merging already-merged entities is a no-op:
    feeding the merged store back through sweep+merge changes nothing."""
    rows = [
        ("MeSH:D1", "drug", "aspirin", ["asa"], "canonical"),
        ("prov-aaa", "drug", "ASA", [], "provisional"),
        ("prov-bbb", "drug", "acetylsalicylic acid", ["asa"], "provisional"),
        ("prov-ccc", "gene", "asa", [], "provisional"),
    ]
    schema = "entity_id string, entity_type string, name string, synonyms array<string>, status string"
    ents = spark.createDataFrame(rows, schema)
    def rowset(df):
        return {
            tuple(tuple(v) if isinstance(v, list) else v for v in r) for r in df.collect()
        }

    merged1, map1 = merge_identities(ents, synonym_sweep(ents))
    r1 = rowset(merged1)
    assert {r["entity_id"]: r["final_id"] for r in map1.collect()} == {
        "prov-aaa": "MeSH:D1",
        "prov-bbb": "MeSH:D1",
    }
    live1 = merged1.filter(F.col("status") != "merged")
    merged2, map2 = merge_identities(live1, synonym_sweep(live1))
    assert map2.count() == 0
    assert rowset(merged2) | rowset(merged1.filter(F.col("status") == "merged")) == r1


def test_follow_tombstones_single_hop(spark):
    ents = spark.createDataFrame(
        [
            ("MeSH:D1", "canonical", None),
            ("prov-x", "merged", "MeSH:D1"),
            ("prov-y", "merged", "MeSH:D1"),
        ],
        "entity_id string, status string, merged_into string",
    )
    ids = spark.createDataFrame(
        [("prov-x",), ("prov-y",), ("MeSH:D1",), ("prov-unknown",)], "entity_id string"
    )
    got = {r["entity_id"] for r in follow_tombstones(ids, ents).collect()}
    assert got == {"MeSH:D1", "prov-unknown"}
