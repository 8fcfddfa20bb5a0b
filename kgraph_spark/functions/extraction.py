"""Deterministic extraction core — pure per-document functions.

These are the pluggable "extractor" stage of the pipeline (the reference's
EntityExtractorInterface / RelationshipExtractorInterface,
kgraph/pipeline/interfaces.py:31-232). The deterministic gazetteer +
pattern-rule family mirrors the reference's sherlock pipeline
(examples/sherlock/pipeline/mentions.py:17-89, relationships.py:32-112) and
its test conventions — the reference's own pytest suite never calls an LLM
(tests/conftest.py:261-297 uses bracket mocks).

Pure functions of (text, compiled tables) so that:
  * the Spark pipeline calls them inside Arrow-batched pandas UDFs
    (operators/mentions.py) — precompiled once per executor from a broadcast;
  * the golden oracle (golden.py) calls them per document directly.
Everything downstream of extraction (resolution joins, connected components,
co-occurrence, accumulation) is implemented twice and independently: once as
DataFrame algebra, once as plain-Python dicts — that is the correctness gate.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from kgraph_spark.config import RELATION_PHRASES, ChunkingConfig
from kgraph_spark.functions.normalize import norm_key_py

# --------------------------------------------------------------------------
# chunking — exact semantics of WindowedDocumentChunker.chunk
# (kgraph/pipeline/streaming.py:151-244): sliding window, sentence-boundary
# snap within the last 20% of the window, min_chunk_size filter except for
# the final chunk, step = chunk_size - overlap.
# --------------------------------------------------------------------------


def chunk_text(content: str, cfg: ChunkingConfig) -> list[tuple[str, int, int, int]]:
    """Return [(chunk_content, start_offset, end_offset, chunk_index)]."""
    n = len(content)
    if n == 0:
        return []
    if n <= cfg.chunk_size:
        return [(content, 0, n, 0)]
    chunks: list[tuple[str, int, int, int]] = []
    cur = 0
    idx = 0
    while cur < n:
        end = min(cur + cfg.chunk_size, n)
        if cfg.respect_boundaries and end < n:
            search_start = end - int(cfg.chunk_size * 0.2)
            region = content[search_start:end]
            for punct in (".", "!", "?"):
                last = region.rfind(punct)
                if last != -1:
                    end = search_start + last + 1
                    break
        piece = content[cur:end]
        if len(piece) >= cfg.min_chunk_size or end >= n:
            chunks.append((piece, cur, end, idx))
            idx += 1
        cur += cfg.chunk_size - cfg.overlap
    return chunks


# --------------------------------------------------------------------------
# gazetteer mention extraction (sherlock mentions.py:17-89 semantics:
# word-boundary, case-insensitive, conf 1.0 exact name / 0.95 multi-word
# alias / 0.80 short alias, canonical_id_hint carried).
# Implemented as ONE alternation regex with a zero-width lookahead so
# overlapping occurrences at distinct start positions are all found
# (longest alternative wins at equal start) — O(text) instead of
# O(text × aliases).
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class GazetteerEntry:
    alias: str
    canonical_id: str | None  # None → vocabulary-only, becomes provisional
    entity_type: str
    confidence: float


_WORD_RX = re.compile(r"[A-Za-z0-9]+")
_SIMPLE_ALIAS_RX = re.compile(r"[A-Za-z0-9]+( [A-Za-z0-9]+)*")


class CompiledGazetteer:
    """Token-dictionary matcher with word-boundary semantics.

    Semantics match the per-position alternation-regex formulation
    (word-boundary, case-insensitive, longest alias at a position wins):
    tokenize once with one cheap regex, hash-probe each token against the
    alias dictionary, and extend multi-word aliases from their first token
    (longest candidate first). O(tokens) instead of O(chars × aliases) —
    the alternation form cost ~45 core·s for 20k docs; this is the hot loop
    of the whole pipeline. Aliases that are not plain space-separated
    alphanumerics fall back to their own compiled word-boundary regexes."""

    def __init__(self, entries: list[GazetteerEntry]):
        ordered = sorted(entries, key=lambda e: len(e.alias), reverse=True)
        # matched-surface → norm_key_py memo (closed set; see extract_occurrences)
        self.norm_cache: dict[str, str] = {}
        self.by_key: dict[str, GazetteerEntry] = {}
        for e in ordered:
            # one entry per casefolded surface form (longest/first wins)
            self.by_key.setdefault(e.alias.casefold(), e)

        # first-token → list of (token_tuple, entry), longest first
        self.by_first: dict[str, list[tuple[tuple[str, ...], GazetteerEntry]]] = {}
        self.fallback: list[tuple[re.Pattern, GazetteerEntry]] = []
        for e in ordered:
            key = e.alias.casefold()
            if self.by_key[key] is not e:
                continue  # shadowed duplicate surface
            if _SIMPLE_ALIAS_RX.fullmatch(e.alias):
                toks = tuple(key.split(" "))
                self.by_first.setdefault(toks[0], []).append((toks, e))
            else:
                self.fallback.append(
                    (re.compile(rf"\b{re.escape(e.alias)}\b", re.IGNORECASE), e)
                )

    def find(self, text: str) -> list[tuple[int, int, str, GazetteerEntry]]:
        """[(start, end, matched_text, entry)] for every occurrence
        (overlapping occurrences at distinct start positions included)."""
        out = []
        # single pass over the match objects: (start, end, casefolded) spans
        # — building a second per-word list cost ~10% of the whole fold
        spans = [(m.start(), m.end(), m.group().casefold()) for m in _WORD_RX.finditer(text)]
        n = len(spans)
        by_first = self.by_first
        for i in range(n):
            cands = by_first.get(spans[i][2])
            if cands is None:
                continue
            for toks, entry in cands:  # longest first
                k = len(toks)
                if i + k > n:
                    continue
                if any(spans[i + j][2] != toks[j] for j in range(k)):
                    continue
                # word-boundary continuity: multi-word aliases must be
                # separated by exactly one space (the regex form matched the
                # literal alias text, spaces included)
                if k > 1:
                    ok = all(
                        text[spans[i + j - 1][1]:spans[i + j][0]] == " "
                        for j in range(1, k)
                    )
                    if not ok:
                        continue
                s, epos = spans[i][0], spans[i + k - 1][1]
                out.append((s, epos, text[s:epos], entry))
                break  # longest alias at this start position wins
        for pat, entry in self.fallback:
            for m in pat.finditer(text):
                out.append((m.start(), m.end(), m.group(), entry))
        return out


def extract_occurrences(
    chunks: list[tuple[str, int, int, int]],
    gaz: CompiledGazetteer,
    para_starts: list[int],
) -> list[dict]:
    """ALL gazetteer occurrences, offsets re-based to the document, deduped
    only by (start_offset, norm_key, entity_type) — which collapses the
    duplicates produced by overlapping chunks, never distinct occurrences.

    This is the source of the reference's window-presence semantics: the
    sherlock extractor re-scans each window's text with a word-boundary
    regex and counts EVERY occurrence (relationships.py:81-98), so
    co-occurrence presence must derive from raw hits, not from the C5
    keep-max dedup (which keeps one mention per (name, type) per document).

    para_starts: content offset of each text paragraph, for para_idx
    (paragraph containing the occurrence start)."""
    occ: dict[tuple[int, str, str], dict] = {}
    # matched surfaces are a closed set (gazetteer aliases modulo case), so
    # the normalization memoizes on the per-worker compiled gazetteer —
    # profiled at ~25% of the whole extraction fold before the cache
    nkc = gaz.norm_cache
    for content, c_start, _c_end, _idx in chunks:
        for s, e, matched, entry in gaz.find(content):
            gs, ge = s + c_start, e + c_start
            nk = nkc.get(matched)
            if nk is None:
                nk = nkc[matched] = norm_key_py(matched)
            dk = (gs, nk, entry.entity_type)
            cur = occ.get(dk)
            if cur is not None and cur["confidence"] >= entry.confidence:
                continue
            # paragraph index: last para_start <= gs
            lo, hi = 0, len(para_starts) - 1
            while lo < hi:
                mid = (lo + hi + 1) // 2
                if para_starts[mid] <= gs:
                    lo = mid
                else:
                    hi = mid - 1
            occ[dk] = {
                "text": matched,
                "entity_type": entry.entity_type,
                "start_offset": gs,
                "end_offset": ge,
                "confidence": entry.confidence,
                "canonical_id_hint": entry.canonical_id,
                "para_idx": lo,
                "norm_key": nk,
            }
    return list(occ.values())


def dedup_keepmax(occurrences: list[dict]) -> list[dict]:
    """C5 cross-window dedup by normalized (name, type): keep highest
    confidence, ties → min start_offset (streaming.py:400-409)."""
    best: dict[tuple[str, str], dict] = {}
    for cand in occurrences:
        key = (cand["norm_key"], cand["entity_type"])
        prev = best.get(key)
        if (
            prev is None
            or cand["confidence"] > prev["confidence"]
            or (cand["confidence"] == prev["confidence"] and cand["start_offset"] < prev["start_offset"])
        ):
            best[key] = cand
    return sorted(best.values(), key=lambda d: (d["start_offset"], d["entity_type"]))


def extract_mentions_from_chunks(
    chunks: list[tuple[str, int, int, int]],
    gaz: CompiledGazetteer,
    para_starts: list[int],
) -> list[dict]:
    """Gazetteer pass per chunk, offsets re-based to the document
    (streaming.py:345-424), then the C5 keep-max dedup (dedup_keepmax)."""
    return dedup_keepmax(extract_occurrences(chunks, gaz, para_starts))


# --------------------------------------------------------------------------
# relation-pattern extraction (deterministic stand-in for the reference's
# LLM extractor F2; output shape = RelationshipRow pre-validation,
# bundle_models.py:143-163). One sentence-anchored regex per document pass.
# --------------------------------------------------------------------------

_PHRASE_ALT = "|".join(
    re.escape(p) for p in sorted(RELATION_PHRASES, key=len, reverse=True)
)
_REL_RX = re.compile(
    rf"(?:^|(?<=[.!?]\s))\s*([A-Za-z0-9][A-Za-z0-9 \-]*?)\s+({_PHRASE_ALT})\s+([A-Za-z0-9][A-Za-z0-9 \-]*?)\s*(?=[.!?])"
)


def extract_relations(paragraphs: list[str]) -> list[dict]:
    """Scan each text paragraph for '<subject> <phrase> <object>.' sentences.

    Returns raw (subject_text, predicate, object_text, confidence, para_idx,
    evidence) dicts; endpoint texts are resolved against the entity index
    downstream (reference F3, relationships.py:713-728)."""
    out = []
    for pi, para in enumerate(paragraphs):
        for m in _REL_RX.finditer(para):
            subj, phrase, obj = m.group(1).strip(), m.group(2), m.group(3).strip()
            pred, conf = RELATION_PHRASES[phrase]
            out.append(
                {
                    "subject_text": subj,
                    "predicate": pred,
                    "object_text": obj,
                    "confidence": conf,
                    "para_idx": pi,
                    "evidence": m.group(0).strip(),
                }
            )
    return out
