"""Pure-Python golden mirror of kgraph's Pass-3 bundle build.

Fresh implementation of the behavior specified by
/root/reference/examples/medlit/pipeline/bundle_builder.py:413-548
(orphan pruning, usage credits, entity/relationship/evidence/mention rows,
canonical deep links), for use as a test oracle against the Spark twin.
Offline stance: the NCBI title patch is skipped on both sides.
"""

from __future__ import annotations

import json
from pathlib import Path

DENYLIST = {
    "PMC_UNKNOWN", "PMC_extracted", "PMC_PLACEHOLDER",
    "PMC_ID_NOT_PROVIDED", "PMC11000000",
}
DERIVED = {"AUTHORED", "AFFILIATED_WITH", "DESCRIBED", "CITES"}


def canonical_url(cid, etype):
    if not cid:
        return None
    if cid.startswith("DBPedia:"):
        return "https://dbpedia.org/page/" + cid[len("DBPedia:"):].replace(" ", "_")
    if cid.startswith("MeSH:"):
        return "https://meshb.nlm.nih.gov/record/ui?ui=" + cid[len("MeSH:"):]
    if cid.startswith("D") and len(cid) > 1 and cid[1:].isdigit() and etype == "disease":
        return "https://meshb.nlm.nih.gov/record/ui?ui=" + cid
    if cid.startswith("UniProt:"):
        return "https://www.uniprot.org/uniprotkb/" + cid[len("UniProt:"):]
    if cid[0] in "PQ" and etype == "protein" and len(cid) >= 6 and cid[1:].isalnum():
        return "https://www.uniprot.org/uniprotkb/" + cid
    if cid.startswith("HGNC:"):
        return (
            "https://www.genenames.org/data/gene-symbol-report/#!/hgnc_id/"
            + cid[len("HGNC:"):]
        )
    if cid.isdigit() and etype == "gene":
        return "https://www.genenames.org/data/gene-symbol-report/#!/hgnc_id/" + cid
    if cid.startswith("C") and len(cid) > 1 and cid[1:].isdigit():
        return "https://uts.nlm.nih.gov/uts/umls/concept/" + cid
    if cid.startswith("RxNorm:"):
        return None
    if cid.startswith("ROR:"):
        return "https://ror.org/" + cid[len("ROR:"):]
    if cid.startswith("https://ror.org/"):
        return cid
    if cid.startswith("ORCID:"):
        return "https://orcid.org/" + cid[len("ORCID:"):]
    return None


def _section_of(eid):
    parts = eid.split(":")
    return parts[1] if len(parts) >= 2 else None


def run_pass3(bundle_dir, ents, trips, local, created_at="1970-01-01T00:00:00Z"):
    """ents/trips/local = outputs of medlit_pass2_golden.run_pass2."""
    bundles = []
    for path in sorted(Path(bundle_dir).glob("paper_*.json")):
        bundles.append((path.stem.replace("paper_", ""), json.loads(path.read_text())))

    referenced = {t["subject"] for t in trips} | {t["object"] for t in trips}
    ents1 = [e for e in ents if e["entity_id"] in referenced]

    # usage credits (bundle_builder.py:106-162)
    usage: dict[str, dict] = {}

    def credit(mk, paper_id, eid):
        if not mk:
            return
        rec = usage.setdefault(mk, {
            "usage_count": 0, "total_mentions": 0, "supporting_documents": [],
            "first_seen_document": None, "first_seen_section": None,
        })
        rec["total_mentions"] += 1
        allowed = paper_id not in DENYLIST and not paper_id.startswith("PMC_UNKNOWN_")
        if allowed and paper_id not in rec["supporting_documents"]:
            rec["supporting_documents"].append(paper_id)
        if rec["first_seen_document"] is None and allowed:
            rec["first_seen_document"] = paper_id
            rec["first_seen_section"] = _section_of(eid) if eid else None

    for pid, b in bundles:
        for r in b["relationships"]:
            sm = local.get((pid, r["subject"]))
            om = local.get((pid, r["object"]))
            eids = r.get("evidence_ids") or []
            if eids:
                for eid in eids:
                    credit(sm, pid, eid)
                    credit(om, pid, eid)
            elif r["predicate"] in DERIVED:
                credit(sm, pid, None)
                credit(om, pid, None)
    for rec in usage.values():
        rec["usage_count"] = len(rec["supporting_documents"])

    ents2 = [e for e in ents1 if usage.get(e["entity_id"], {}).get("usage_count", 0) > 0]
    surviving = {e["entity_id"] for e in ents2}
    trips2 = [
        t for t in trips if t["subject"] in surviving and t["object"] in surviving
    ]

    entity_rows = []
    for e in ents2:
        etype = (e.get("class") or "unknown").lower()
        u = usage.get(e["entity_id"], {})
        entity_rows.append({
            "entity_id": e["entity_id"],
            "entity_type": etype,
            "name": e.get("name"),
            "status": "canonical" if e.get("canonical_id") else "provisional",
            "confidence": 0.8 if e.get("canonical_id") else 0.5,
            "usage_count": u.get("usage_count", 0),
            "created_at": created_at,
            "source": "medlit:llm",
            "canonical_url": canonical_url(e.get("canonical_id"), etype),
            "properties": {"synonyms": list(e.get("synonyms") or [])},
            "first_seen_document": u.get("first_seen_document"),
            "first_seen_section": u.get("first_seen_section"),
            "total_mentions": u.get("total_mentions", 0),
            "supporting_documents": u.get("supporting_documents", []),
        })

    # relationship evidence stats on raw bundle keys (bundle_builder.py:203-248)
    keys = {(t["subject"], t["predicate"], t["object"]) for t in trips2}
    key_ev: dict[tuple, list[tuple[str, float]]] = {k: [] for k in keys}
    for pid, b in bundles:
        ev_by_id = {ev["id"]: ev for ev in b.get("evidence_entities") or []}
        for r in b["relationships"]:
            sm = local.get((pid, r["subject"]))
            om = local.get((pid, r["object"]))
            if not sm or not om:
                continue
            k = (sm, r["predicate"], om)
            if k not in key_ev:
                continue
            for eid in r.get("evidence_ids") or []:
                ev = ev_by_id.get(eid)
                if ev is not None:
                    key_ev[k].append((ev.get("text") or "", ev.get("confidence", 0.5)))

    rel_rows = []
    for t in trips2:
        k = (t["subject"], t["predicate"], t["object"])
        pairs = key_ev.get(k, [])
        props = {}
        if t.get("linguistic_trust"):
            props["linguistic_trust"] = t["linguistic_trust"]
        if t.get("provenance"):
            props["provenance"] = t["provenance"]
        best = max(pairs, key=lambda p: p[1]) if pairs else None
        rel_rows.append({
            "subject_id": t["subject"],
            "object_id": t["object"],
            "predicate": t["predicate"],
            "confidence": t.get("confidence"),
            "source_documents": t.get("source_papers", []),
            "created_at": created_at,
            "properties": props,
            "evidence_count": len(pairs),
            "strongest_evidence_quote": (best[0] or None) if best else None,
            "evidence_confidence_avg": round(sum(p[1] for p in pairs) / len(pairs), 4)
            if pairs else None,
        })

    ev_rows = []
    for pid, b in bundles:
        ev_by_id = {ev["id"]: ev for ev in b.get("evidence_entities") or []}
        for r in b["relationships"]:
            sm = local.get((pid, r["subject"]))
            om = local.get((pid, r["object"]))
            if not sm or not om:
                continue
            k = (sm, r["predicate"], om)
            if k not in keys:
                continue
            for eid in r.get("evidence_ids") or []:
                ev = ev_by_id.get(eid)
                if ev is None:
                    continue
                text = ev.get("text") or ""
                ev_rows.append({
                    "relationship_key": f"{sm}:{r['predicate']}:{om}",
                    "document_id": pid,
                    "section": None,
                    "start_offset": 0,
                    "end_offset": len(text),
                    "text_span": text,
                    "confidence": ev.get("confidence", 0.5),
                    "supports": True,
                })

    mention_rows = []
    for pid, b in bundles:
        ev_by_id = {ev["id"]: ev for ev in b.get("evidence_entities") or []}
        for r in b["relationships"]:
            sm = local.get((pid, r["subject"]))
            om = local.get((pid, r["object"]))
            for eid in r.get("evidence_ids") or []:
                ev = ev_by_id.get(eid)
                if ev is None:
                    continue
                text = ev.get("text") or ""
                for mk in (sm, om):
                    if mk:
                        mention_rows.append({
                            "entity_id": mk,
                            "document_id": pid,
                            "section": None,
                            "start_offset": 0,
                            "end_offset": len(text),
                            "text_span": text,
                            "confidence": ev.get("confidence", 0.5),
                            "extraction_method": ev.get("extraction_method", "llm"),
                            "created_at": created_at,
                        })
    mention_rows = [m for m in mention_rows if m["entity_id"] in surviving]

    return {
        "entities": entity_rows,
        "relationships": rel_rows,
        "evidence": ev_rows,
        "mentions": mention_rows,
    }
