"""Phonetic blocking for entity resolution: Soundex keys as a
misspelling-tolerant blocking dimension, complementary to the
edit-distance rerank (resolve.rerank_candidates) and the LSH/SNM
blockers (dedup_text) — names that SOUND alike land in one block even
when their first characters differ past the initial.

Reference parity: the reference's name matcher (kgraph/dedup.py
synonym/spelling paths) normalizes spelling variants; Soundex blocking
is the scalable pre-pass that keeps such pairs from needing a corpus
cross-join.

Variant note: this is American Soundex with ONE documented
simplification — H and W behave like vowels (they separate duplicate
codes) instead of being transparent. Everything is JVM/engine built-ins
(upper/translate/regexp/replace/rpad), no UDF. One restatement caveat:
the '(.)\\1+' run-collapse needs backreferences (Java regex has them;
RE2 engines like DuckDB don't) — the RE2-safe equivalent is seven
per-digit collapses '00+'→'0' … '66+'→'6', which the oracle uses.

Scale: soundex_key is a pure per-row expression (whole-stage codegen);
phonetic_blocks is one distinct + one hash aggregate + one broadcast
join back — no sort, no window over data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["soundex_key", "phonetic_blocks"]

# A→0 B→1 C→2 D→3 E→0 F→1 G→2 H→0 I→0 J→2 K→2 L→4 M→5 N→5 O→0 P→1 Q→2
# R→6 S→2 T→3 U→0 V→1 W→0 X→2 Y→0 Z→2   (vowels + H/W/Y → 0)
_ALPHA = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_CODES = "01230120022455012623010202"


def soundex_key(col: Column) -> Column:
    """Soundex key of a word as a pure expression chain:
    strip non-letters → upper → letter→digit translate → collapse runs
    (so the lead letter's own code participates, e.g. Pfister → P236)
    → drop zeros → first letter + 3 digits right-padded with '0'.
    Empty input → NULL."""
    u = F.upper(F.regexp_replace(col, "[^A-Za-z]", ""))
    codes = F.translate(u, _ALPHA, _CODES)
    collapsed = F.regexp_replace(codes, r"(.)\1+", r"$1")
    tail = F.replace(
        collapsed.substr(F.lit(2), F.length(collapsed)), F.lit("0"), F.lit("")
    )
    key = F.concat(F.substring(u, 1, 1), F.rpad(F.substring(tail, 1, 3), 3, "0"))
    return F.when(F.length(u) > 0, key)


def phonetic_blocks(df: DataFrame, text_col: str, min_block: int = 1) -> DataFrame:
    """Phonetic collision census over the corpus vocabulary:
    (soundex_key, word, n_in_block) for every distinct lowercase word of
    text_col, keeping blocks with ≥ min_block members. Blocks with
    n_in_block ≥ 2 are the ER candidate groups a spelling-variant
    matcher should pair (rod/red → R300).

    Distinct word extraction is one hash aggregate; block sizes come
    from a second aggregate on the key, broadcast back (the vocabulary
    is orders of magnitude smaller than the corpus)."""
    words = (
        df.select(
            F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("word")
        )
        .filter(F.col("word") != "")
        .distinct()
    )
    keyed = words.select(soundex_key(F.col("word")).alias("soundex_key"), "word")
    sizes = keyed.groupBy(F.col("soundex_key").alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("n_in_block")
    )
    return (
        keyed.join(F.broadcast(sizes), keyed["soundex_key"] == sizes["k"])
        .filter(F.col("n_in_block") >= min_block)
        .select("soundex_key", "word", "n_in_block")
    )
