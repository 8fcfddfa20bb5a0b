"""Pass-3 kgbundle build parity on the real corpus.

Spark (operators/medlit_pass3.py) vs the pure-Python golden mirror
(tests/golden/medlit_pass3_golden.py) — EXACT, all four tables. Both use
the same deterministic sha-based prov slugs, so no bijection is needed.

The golden itself was validated against a replay of the reference's own
bundle_builder over the committed inputs (NCBI fetch stubbed — offline on
both sides): 1013/1013 entities payload-exact, 1279/1279 mentions exact,
relationship/evidence rows exact modulo the reference's OWN uuid-order
artifact on symmetric pairs (canonicalize_symmetric picks min/max of
run-dependent uuid prov slugs, and Pass-3's raw-key evidence matching is
order-dependent: 566 vs 564 evidence rows across two runs of the
reference itself). See COVERAGE.md "Real-corpus parity".
"""

from __future__ import annotations

import json
from collections import Counter
from pathlib import Path

import pytest

BUNDLES = "/root/reference/pass1_bundles"
CACHE = "/root/reference/pass1_vocab/seeded_synonym_cache.json"

pytestmark = pytest.mark.skipif(
    not Path(BUNDLES).exists(), reason="reference corpus not mounted"
)

CREATED = "1970-01-01T00:00:00Z"


@pytest.fixture(scope="module")
def spark_bundle(spark):
    from kgraph_spark.operators.medlit_pass2 import run_pass2
    from kgraph_spark.operators.medlit_pass3 import build_bundle_tables
    from kgraph_spark.sources.medlit_bundles import read_bundles

    p2 = run_pass2(spark, BUNDLES, CACHE)
    out = build_bundle_tables(spark, read_bundles(spark, BUNDLES), p2, CREATED)
    return {k: [r.asDict(recursive=True) for r in df.collect()] for k, df in out.items()}


@pytest.fixture(scope="module")
def golden_bundle():
    from golden.medlit_pass2_golden import run_pass2 as g2
    from golden.medlit_pass3_golden import run_pass3 as g3
    from kgraph_spark.functions.medlit_schema import PREDICATE_CONSTRAINTS

    constraints = {p: (set(s), set(o)) for p, (s, o) in PREDICATE_CONSTRAINTS.items()}
    cache = json.loads(Path(CACHE).read_text())
    ents, trips, local = g2(BUNDLES, cache, constraints)
    return g3(BUNDLES, ents, trips, local, CREATED)


def test_entity_rows_exact(spark_bundle, golden_bundle):
    def norm(rows):
        return {
            e["entity_id"]: (
                e["entity_type"], e["name"], e["status"], e["confidence"],
                e["usage_count"], e["canonical_url"],
                tuple(sorted(e["properties"]["synonyms"] or [])),
                e["first_seen_document"], e["first_seen_section"],
                e["total_mentions"], tuple(e["supporting_documents"]),
            )
            for e in rows
        }

    s, g = norm(spark_bundle["entities"]), norm(golden_bundle["entities"])
    assert len(s) == len(g) == 1013
    assert set(s) == set(g)
    diffs = [(k, s[k], g[k]) for k in s if s[k] != g[k]]
    assert not diffs, diffs[:3]


def test_relationship_rows_exact(spark_bundle, golden_bundle):
    def norm(rows):
        out = {}
        for r in rows:
            props = r["properties"] or {}
            pr = props.get("provenance")
            prn = None if pr is None else tuple(
                (p["section"], p["sentence"]) for p in pr
            )
            out[(r["subject_id"], r["predicate"], r["object_id"])] = (
                r["confidence"], tuple(sorted(r["source_documents"])),
                props.get("linguistic_trust"), prn, r["evidence_count"],
                r["strongest_evidence_quote"], r["evidence_confidence_avg"],
            )
        return out

    s, g = norm(spark_bundle["relationships"]), norm(golden_bundle["relationships"])
    assert len(s) == len(g) == 1258
    assert set(s) == set(g)
    diffs = [(k, s[k], g[k]) for k in s if s[k] != g[k]]
    assert not diffs, diffs[:3]


def test_evidence_rows_exact(spark_bundle, golden_bundle):
    def norm(rows):
        return Counter(
            (v["relationship_key"], v["document_id"], v["text_span"],
             v["confidence"], v["start_offset"], v["end_offset"])
            for v in rows
        )

    s, g = norm(spark_bundle["evidence"]), norm(golden_bundle["evidence"])
    assert sum(s.values()) == sum(g.values()) == 566
    assert s == g


def test_mention_rows_exact(spark_bundle, golden_bundle):
    def norm(rows):
        return Counter(
            (m["entity_id"], m["document_id"], m["text_span"], m["confidence"],
             m["extraction_method"])
            for m in rows
        )

    s, g = norm(spark_bundle["mentions"]), norm(golden_bundle["mentions"])
    assert sum(s.values()) == sum(g.values()) == 1279
    assert s == g
