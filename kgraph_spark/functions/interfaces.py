"""Pluggable extractor seams (SURVEY.md §2 C2/F2/I2/I3).

The reference defines extractor interfaces (kgraph/pipeline/interfaces.py:31-232)
with LLM-backed implementations for production and deterministic ones for
tests (its own pytest suite never calls an LLM — tests/conftest.py:285-297).
We mirror that: the pipeline consumes EXTRACTOR FUNCTIONS of a fixed
signature; the deterministic gazetteer/pattern family is the default, and
an LLM/NER-backed implementation plugs in here without touching the
DataFrame plumbing (it would run inside the same Arrow-batched pUDF)."""

from __future__ import annotations

from typing import Callable, Protocol


class MentionExtractor(Protocol):
    """content per document → list of mention dicts (text, entity_type,
    start_offset, end_offset, confidence, canonical_id_hint, para_idx)."""

    def __call__(self, content: str, paragraphs: list[str]) -> list[dict]: ...


class RelationExtractor(Protocol):
    """paragraphs per document → list of raw relation dicts (subject_text,
    predicate, object_text, confidence, para_idx, evidence)."""

    def __call__(self, paragraphs: list[str]) -> list[dict]: ...


def llm_mention_extractor(*_a, **_k):
    """C2 LLM NER extraction — interface stub, exactly as the reference's
    extractors are pluggable. No LLM at test time (SURVEY §2 determinism
    note); a real implementation batches chunk texts per Arrow batch and
    must emit the MentionExtractor dict shape."""
    raise NotImplementedError(
        "LLM-backed mention extraction is a deployment-time plug-in; "
        "the deterministic gazetteer (functions/extraction.py) is the default"
    )


def llm_relation_extractor(*_a, **_k):
    """F2 LLM relation extraction — interface stub (see C2 note). The
    validation chain (operators/relationships.py, validation_extra.py) is
    extractor-agnostic and runs unchanged on its output."""
    raise NotImplementedError(
        "LLM-backed relation extraction is a deployment-time plug-in; "
        "the pattern-rule extractor (functions/extraction.py) is the default"
    )


def local_ner_extractor(*_a, **_k):
    """C3 local NER model (HF token-classification) — stub: the model
    libraries are not in this container. A real implementation runs the
    batched model inside the same mapInPandas pass, then the C5 keep-max
    dedup applies unchanged."""
    raise NotImplementedError("NER model runtime not available in this environment")
