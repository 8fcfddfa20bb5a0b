"""Pure-Python golden mirror of kgraph's Pass-2 dedup/merge semantics.

Fresh implementation of the behavior specified by
/root/reference/examples/medlit/pipeline/dedup.py:214-792 (name/type index,
SAME_AS auto-merge, triple accumulation with swap correction + symmetric
ordering, post-dedup reconciliation), written for use as a test oracle.
"""
import json, hashlib
from pathlib import Path

SPELLING = {
    "hyperglycaemia": "hyperglycemia", "haemoglobin": "hemoglobin",
    "tumour": "tumor", "oesophagus": "esophagus", "leukaemia": "leukemia",
}
SYMMETRIC = {"ASSOCIATED_WITH", "INTERACTS_WITH", "IS_COLLEAGUE", "SAME_AS"}
AUTH_OVERRIDES = {"Hormone": "drug", "Enzyme": "protein", "Biomarker": "disease"}

def norm_dedup(name):
    n = name.lower().strip()
    return SPELLING.get(n, n)

def is_auth(s):
    if not s or not s.strip(): return False
    if s.startswith("prov-"): return False
    if s.startswith("MeSH:"): return True
    if len(s) > 1 and s[0] == "D" and s[1:].isdigit(): return True
    if s.startswith("C") and len(s) > 1 and s[1:].isdigit(): return True
    if s.startswith("HGNC:"): return True
    if s.isdigit(): return True
    if s.startswith("RxNorm:"): return True
    if (s[0] in "PQ") and len(s) >= 6 and s[1:].isalnum(): return True
    if s.startswith("UniProt:"): return True
    if s.startswith("DBPedia:"): return True
    if s.startswith("PMC") and len(s) > 3 and s[3:].isdigit(): return True
    if s.startswith("ROR:") or s.startswith("https://ror.org/"): return True
    if s.startswith("ORCID:"): return True
    return False

def preferred_auth(e):
    # dedup.py:100-121 (no authority lookup service)
    if e["class"] == "Gene":
        h = (e.get("hgnc_id") or "").strip()
        if h and is_auth(h):
            return f"HGNC:{h}" if h.isdigit() else h
        u = (e.get("umls_id") or "").strip()
        if u and is_auth(u): return u
        c = (e.get("canonical_id") or "").strip()
        if c and is_auth(c): return c
        return None
    for f in ("canonical_id", "umls_id", "hgnc_id", "rxnorm_id", "uniprot_id"):
        v = e.get(f)
        if v and v.strip() and is_auth(v): return v.strip()
    return None

def load_bundles(bundle_dir):
    out = []
    for path in sorted(Path(bundle_dir).glob("paper_*.json")):
        data = json.loads(path.read_text())
        out.append((path.stem.replace("paper_", ""), data))
    return out

def cache_lookup(cache, name, ec):
    # synonym_cache.lookup_entity: first merged/conf>=0.85 entry matching class
    key = name.lower().strip()
    for entry in cache.get(key, []):
        if entry.get("resolution") == "merged" and entry.get("confidence", 0) >= 0.85:
            for side in ("entity_a", "entity_b"):
                s = entry.get(side, {})
                if s.get("name", "").lower() == key and s.get("class") == ec:
                    return s.get("canonical_id")
    return None

def slug(paper_id, local_id):
    # deterministic stand-in for uuid4 prov slugs (compared modulo bijection)
    return "prov-" + hashlib.sha256(f"{paper_id}\x00{local_id}".encode()).hexdigest()[:12]

def run_pass2(bundle_dir, cache, constraints):
    """constraints: {PRED_lower: (set(subject_types), set(object_types))} lowercase types."""
    bundles = load_bundles(bundle_dir)
    b2n = {  # bundle class -> predicate-semantics type (NORMALIZED_TO_BUNDLE inverted)
        "Disease": "disease", "Gene": "gene", "Paper": "paper", "Drug": "drug",
        "Protein": "protein", "Hormone": "hormone", "Enzyme": "enzyme",
        "Biomarker": "biomarker", "Symptom": "symptom", "Procedure": "procedure",
        "Mutation": "mutation", "Pathway": "pathway",
        "BiologicalProcess": "biologicalprocess", "AnatomicalStructure": "anatomicalstructure",
        "Author": "author", "Institution": "institution", "Hypothesis": "hypothesis",
        "Evidence": "evidence", "Location": "location", "Ethnicity": "ethnicity",
    }
    name_idx = {}     # (name_norm, class) -> merge key
    local = {}        # (paper, local_id) -> merge key

    def populate(cid, n, ec):
        k = (n.lower().strip(), ec)
        if k[0]: name_idx[k] = cid
        nn = norm_dedup(n)
        if nn and (nn, ec) != k: name_idx[(nn, ec)] = cid

    def assign(paper_id, e):
        key_local = (paper_id, e["id"])
        if key_local in local: return local[key_local]
        name, ec = e["name"], e["class"]
        k1 = (name.lower(), ec)
        if k1 in name_idx:
            local[key_local] = name_idx[k1]; return local[key_local]
        k2 = (norm_dedup(name), ec)
        if k2 in name_idx:
            local[key_local] = name_idx[k2]; return local[key_local]
        auth = preferred_auth(e)
        if auth:
            for n in {name} | set(e.get("synonyms") or []): populate(auth, n, ec)
            local[key_local] = auth; return auth
        cid = cache_lookup(cache, name, ec)
        if cid:
            for n in {name} | set(e.get("synonyms") or []): populate(cid, n, ec)
            local[key_local] = cid; return cid
        cid = slug(paper_id, e["id"])
        for n in {name} | set(e.get("synonyms") or []): populate(cid, n, ec)
        local[key_local] = cid; return cid

    # 1) assign all
    for pid, b in bundles:
        for e in b["entities"]:
            assign(pid, e)

    def name_class(b, local_id):
        for e in b["entities"]:
            if e["id"] == local_id: return (e["name"], e["class"])
        return (local_id, "?")

    # 2) high-confidence SAME_AS merge
    for pid, b in bundles:
        for r in b["relationships"]:
            if r["predicate"] != "SAME_AS" or r.get("confidence", 0.5) < 0.85: continue
            s = local.get((pid, r["subject"])); o = local.get((pid, r["object"]))
            if s and o and s != o:
                w = s
                if is_auth(o) and not is_auth(s): w = o
                for k, v in list(local.items()):
                    if v in (s, o): local[k] = w
                for k, v in list(name_idx.items()):
                    if v in (s, o): name_idx[k] = w

    # 5) merged entities (first-wins per merge key)
    ents = {}
    for pid, b in bundles:
        for e in b["entities"]:
            mk = local.get((pid, e["id"]))
            if mk is None: continue
            if mk not in ents:
                ents[mk] = {"entity_id": mk,
                            "canonical_id": mk if is_auth(mk) else None,
                            "class": e["class"], "name": e["name"],
                            "synonyms": list(e.get("synonyms") or []),
                            "source": e.get("source", "extracted"), "source_papers": []}
            if pid not in ents[mk]["source_papers"]:
                ents[mk]["source_papers"].append(pid)

    # 6) accumulate triples
    def resolve_by_name(name):
        norm = name.lower().strip(); dnorm = norm_dedup(name)
        cands = {cid for (n, _ec), cid in name_idx.items() if n in (norm, dnorm)}
        if len(cands) == 1: return next(iter(cands))
        auth = [c for c in cands if is_auth(c)]
        if len(auth) == 1: return auth[0]
        return None

    triples = {}
    for pid, b in bundles:
        ev_by_id = {ev["id"]: ev for ev in b.get("evidence_entities") or []}
        for r in b["relationships"]:
            if r["predicate"] == "SAME_AS" and r.get("confidence", 0.5) >= 0.85: continue
            s = local.get((pid, r["subject"])) or resolve_by_name(r["subject"])
            o = local.get((pid, r["object"])) or resolve_by_name(r["object"])
            if not s or not o: continue
            _, s_cls = name_class(b, r["subject"]); _, o_cls = name_class(b, r["object"])
            pred = r["predicate"]
            pl = pred.strip().upper().lower()
            if pred.strip().upper() != "SAME_AS" and pl in constraints:
                subs, objs = constraints[pl]
                st = b2n.get(s_cls) or (s_cls.lower() if s_cls else "?")
                ot = b2n.get(o_cls) or (o_cls.lower() if o_cls else "?")
                if not (st in subs and ot in objs) and (ot in subs and st in objs):
                    s, o = o, s
            if pred.upper() in SYMMETRIC:
                s, o = min(s, o), max(s, o)
            key = (s, pred, o)
            if key not in triples:
                triples[key] = {"subject": s, "predicate": pred, "object": o,
                                "evidence_ids": [], "provenance": [], "source_papers": [],
                                "confidence": r.get("confidence", 0.5),
                                "linguistic_trust": r.get("linguistic_trust")}
            t = triples[key]
            for eid in r.get("evidence_ids") or []:
                if eid not in t["evidence_ids"]:
                    t["evidence_ids"].append(eid)
                    parts = eid.split(":")
                    ev = ev_by_id.get(eid)
                    t["provenance"].append({"section": parts[1] if len(parts) >= 2 else None,
                                            "sentence": (ev or {}).get("text"),
                                            "citation_markers": []})
            for sp in r.get("source_papers") or [pid]:
                if sp not in t["source_papers"]: t["source_papers"].append(sp)
            c = r.get("confidence", 0.5)
            if c > t["confidence"]:
                t["confidence"] = c
                if r.get("linguistic_trust"): t["linguistic_trust"] = r["linguistic_trust"]

    # 6b) reconciliation by (name_lower, class) over merged entities
    by_nc = {}
    for e in ents.values():
        n = (e.get("name") or "").lower().strip()
        if n: by_nc.setdefault((n, e.get("class") or "?"), []).append(e["entity_id"])
    for (_n, ec), ids in list(by_nc.items()):
        if len(ids) <= 1: continue
        ids_sorted = sorted(ids)
        winner = next((i for i in ids_sorted if is_auth(i)), ids_sorted[0])
        for loser in [i for i in ids_sorted if i != winner]:
            if loser in ents and winner in ents:
                w, l = ents[winner], ents[loser]
                w["synonyms"] = list(set((w.get("synonyms") or []) + (l.get("synonyms") or [])))
                for sp in l.get("source_papers") or []:
                    if sp not in w["source_papers"]: w["source_papers"].append(sp)
            dels, news = [], {}
            for (s, p, o), t in list(triples.items()):
                if loser not in (s, o): continue
                ns = winner if s == loser else s; no = winner if o == loser else o
                nk = (ns, p, no); dels.append((s, p, o))
                tgt = news.get(nk) or (triples.get(nk) if nk != (s, p, o) else None)
                if tgt is not None:
                    conf_a, conf_b = tgt.get("confidence", 0), t.get("confidence", 0)
                    trust = tgt.get("linguistic_trust")
                    if conf_b > conf_a and t.get("linguistic_trust"): trust = t["linguistic_trust"]
                    news[nk] = {"subject": ns, "predicate": p, "object": no,
                                "evidence_ids": list(set((tgt.get("evidence_ids") or []) + (t.get("evidence_ids") or []))),
                                "source_papers": list(set((tgt.get("source_papers") or []) + (t.get("source_papers") or []))),
                                "confidence": max(conf_a, conf_b),
                                "linguistic_trust": trust}
                else:
                    news[nk] = {**t, "subject": ns, "object": no}
            for k in dels: del triples[k]
            triples.update(news)
            for k, v in list(local.items()):
                if v == loser: local[k] = winner
            for k, v in list(name_idx.items()):
                if v == loser: name_idx[k] = winner
            if loser in ents: del ents[loser]

    return list(ents.values()), list(triples.values()), local
