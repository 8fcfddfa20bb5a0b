"""Text analysis for training-data pipelines: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

All pure JVM column expressions (whole-stage codegen; no UDFs) with
definitions simple enough to be mirrored exactly in ANSI SQL for the
DuckDB oracle (__spark_entry__.oracle_sql)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"

# marker words per language for the n-gram/stopword language heuristic.
# Deliberately tiny + exactly mirrored in the SQL oracle.
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "das"],
    "es": ["el", "los", "que"],
}


# BPE-ish pre-tokenization: letter runs, digit runs, and each remaining
# non-space symbol — the GPT-2-style split shape that approximates subword
# token counts far better than whitespace on punctuated/code-mixed text.
# Kept RE2/Java-portable so the DuckDB oracle evaluates it identically.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars, n_tokens, n_tokens_bpe, avg_token_len) —
    whitespace tokens plus the BPE-ish regex token estimate."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    return docs.select(
        F.col(id_col),
        F.length(text_col).alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), F.lit(0))).alias(
            "n_tokens_bpe"
        ),
        (F.length(F.regexp_replace(F.col(text_col), r"\s+", "")) / F.size(toks)).alias("avg_token_len"),
    )


# cheap English stopword set for the stopword-ratio quality feature (a
# fluency proxy: natural prose sits around 0.2-0.5, keyword-stuffed or
# non-English boilerplate near 0)
STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be",
]


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Length / punctuation / alpha-ratio / stopword-ratio quality features
    + composite score.

    score = 0.5·alpha_ratio + 0.3·(1 − punct_ratio) + 0.2·min(1, n_tokens/100)
    (the usual cheap pre-filter shape for corpus cleaning; stopword_ratio
    is emitted as a feature for downstream threshold filters)."""
    txt = F.col(text_col)
    n = F.length(txt)
    alpha = F.length(F.regexp_replace(txt, r"[^A-Za-z]", ""))
    punct = F.length(F.regexp_replace(txt, r"[^.,;:!?]", ""))
    toks = F.split(F.trim(txt), r"\s+")
    n_tokens = F.size(toks)
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    # zero-length guards: Spark 4 runs ANSI mode by default, where an
    # unguarded x/0 aborts the whole job on the first empty-text crawl row
    # (routine in web data). Empty docs score 0 on every ratio. The DuckDB
    # oracle corpus has no empty docs, so oracle parity is unaffected.
    stopword_ratio = F.when(
        n_tokens > 0,
        F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t)))) / n_tokens,
    ).otherwise(F.lit(0.0))
    alpha_ratio = F.when(n > 0, alpha / n).otherwise(F.lit(0.0))
    punct_ratio = F.when(n > 0, punct / n).otherwise(F.lit(0.0))
    return docs.select(
        F.col(id_col),
        alpha_ratio.alias("alpha_ratio"),
        punct_ratio.alias("punct_ratio"),
        stopword_ratio.alias("stopword_ratio"),
        n_tokens.alias("n_tokens"),
        (
            0.5 * alpha_ratio
            + 0.3 * (1 - punct_ratio)
            + 0.2 * F.least(F.lit(1.0), n_tokens / F.lit(100.0))
        ).alias("quality_score"),
    )


DEFAULT_CLASSIFIER_WEIGHTS = {
    "bias": -2.0,
    "alpha_ratio": 3.0,
    "stopword_ratio": 2.5,
    "punct_ratio": -4.0,
    "len_feature": 1.5,  # min(1, n_tokens/200)
}


def quality_classifier(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """fastText-style linear quality classifier: (doc_id, logit, prob,
    keep). prob = sigmoid(w·x + b) over the quality_score feature vector
    (alpha ratio, stopword ratio, punctuation ratio, capped length);
    keep = prob >= 0.5 — the binary filter decision a CCNet/fastText
    quality gate makes per document.

    The default weights are a hand-set stand-in for a trained model (the
    repo's determinism stance: plug a trained coefficient dict into
    `weights`); every weight is an exact binary fraction so the logit
    chain is reproducible in any engine, and the logit is rounded to 6
    before the sigmoid so exp() runs on identical doubles. Map-only:
    scoring adds zero shuffles on top of the feature projection."""
    w = dict(DEFAULT_CLASSIFIER_WEIGHTS)
    if weights:
        w.update(weights)
    feats = quality_score(docs, id_col=id_col, text_col=text_col)
    len_feature = F.least(F.lit(1.0), F.col("n_tokens") / F.lit(200.0))
    logit = F.round(
        F.lit(w["bias"])
        + F.lit(w["alpha_ratio"]) * F.col("alpha_ratio")
        + F.lit(w["stopword_ratio"]) * F.col("stopword_ratio")
        + F.lit(w["punct_ratio"]) * F.col("punct_ratio")
        + F.lit(w["len_feature"]) * len_feature,
        6,
    )
    prob = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("logit"))), 6)
    return (
        feats.select(F.col(id_col), logit.alias("logit"))
        .select(
            F.col(id_col),
            "logit",
            prob.alias("prob"),
        )
        .withColumn("keep", F.col("prob") >= 0.5)
    )


def language_id_scores(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_en, n_de, n_es, lang_guess) — SQL-mirrorable exactly."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")

    def cnt(markers):
        return F.size(F.filter(toks, lambda t: t.isin(*markers)))

    n_en, n_de, n_es = (cnt(LANG_MARKERS[lang]) for lang in ("en", "de", "es"))
    guess = (
        F.when((n_en == 0) & (n_de == 0) & (n_es == 0), F.lit("und"))
        .when((n_en >= n_de) & (n_en >= n_es), F.lit("en"))
        .when(n_de >= n_es, F.lit("de"))
        .otherwise(F.lit("es"))
    )
    return docs.select(
        F.col(id_col),
        n_en.alias("n_en"),
        n_de.alias("n_de"),
        n_es.alias("n_es"),
        guess.alias("lang_guess"),
    )


ROLLING_BASE = 131
ROLLING_MOD = 1_000_000_007  # keeps acc*131+cp < 2^63 — no overflow divergence


def fingerprint(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix: int = 64,
    rolling_chars: int = 256,
) -> DataFrame:
    """Cheap content fingerprints: md5 of the first `prefix` chars, a
    Rabin-Karp-style polynomial rolling hash of the first `rolling_chars`
    codepoints (acc = (acc·131 + cp) mod 1e9+7 — order-sensitive, so
    transpositions change it while the md5 prefix would need a first-64
    edit), and a length bucket — fast first-pass grouping before
    exact/near dedup. Pure JVM fold via F.aggregate; no UDF."""
    chars = F.filter(
        F.split(F.substring(F.col(text_col), 1, rolling_chars), ""),
        lambda c: F.length(c) > 0,
    )
    rolling = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * ROLLING_BASE + F.ascii(c)) % ROLLING_MOD,
    )
    return docs.select(
        F.col(id_col),
        F.md5(F.substring(F.col(text_col), 1, prefix)).alias("fp_prefix"),
        rolling.alias("fp_rolling"),
        (F.floor(F.length(text_col) / 64) * 64).alias("len_bucket"),
    )


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", gram_n: int = 3
) -> DataFrame:
    """Gopher/C4-style repetition features for corpus cleaning: the
    fraction of duplicate words and duplicate word n-grams in a document
    (heavily templated / boilerplate pages score high and get filtered).

    Pure built-in expressions (split → sliding window via transform over an
    index sequence → array_distinct), one narrow projection — no shuffle,
    no Python. dup fraction = 1 - distinct/total; 0 when the document is
    too short to have any total (n-gram count 0)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    dup_word = F.when(
        n > 0, F.round(F.lit(1.0) - F.size(F.array_distinct(toks)) / n, 6)
    ).otherwise(F.lit(0.0))
    n_grams = F.greatest(n - (gram_n - 1), F.lit(0))
    # 1-based index sequence clamped to ≥ [1]: sequence(0, -1) would count
    # DOWN and feed slice() an illegal 0 start on short docs; the clamped
    # branch's value is discarded by the n_grams > 0 guard below
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n_grams, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, gram_n)),
    )
    dup_gram = F.when(
        n_grams > 0, F.round(F.lit(1.0) - F.size(F.array_distinct(grams)) / n_grams, 6)
    ).otherwise(F.lit(0.0))
    return docs.select(
        F.col(id_col),
        n.alias("n_tokens"),
        dup_word.alias("dup_word_frac"),
        dup_gram.alias(f"dup_{gram_n}gram_frac"),
    )


def unigram_logprob_model(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 50_000,
    alpha: float = 1.0,
) -> tuple[DataFrame, float]:
    """Build a Laplace-smoothed unigram log-prob model from the corpus —
    the table a CCNet/Gopher-style LM quality filter scores against.

    Returns (model, oov_logp): model = (token, logp) for the `vocab_size`
    most frequent lowercase whitespace tokens (count DESC, token ASC
    tie-break — deterministic), logp = ln((c + alpha) / (T + alpha·(V+1)))
    rounded to 6 decimals so a SQL restatement reproduces it bit-for-bit
    after rounding; oov_logp = ln(alpha / (T + alpha·(V+1))) (rounded 6),
    the smoothing slot lm_quality_score assigns to out-of-vocab tokens.
    T = total token count, V = vocabulary rows actually kept.

    Scale: one explode + one partial-aggregated groupBy(token); the top-K
    cut is a TakeOrdered (bounded by vocab_size, never a full sort of the
    corpus); T and V are two scalars.
    """
    import math

    toks = (
        docs.select(
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("token")
        )
        .filter(F.length("token") > 0)
    )
    # counts feeds three actions (total, vocab cut, model select) and the
    # scorer's broadcast join replays vocab — pin both so the corpus-wide
    # explode+groupBy runs once; counts is vocabulary-sized, vocab is
    # k-bounded
    counts = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    total = counts.agg(F.sum("c").alias("t")).collect()[0]["t"] or 0
    vocab = (
        counts.orderBy(F.col("c").desc(), F.col("token"))
        .limit(vocab_size)
        .localCheckpoint(eager=False)
    )
    v_kept = vocab.count()
    denom = float(total) + alpha * (v_kept + 1)
    model = vocab.select(
        "token", F.round(F.log((F.col("c") + F.lit(alpha)) / F.lit(denom)), 6).alias("logp")
    )
    return model, round(math.log(alpha / denom), 6)


def lm_quality_score(
    docs: DataFrame,
    model: DataFrame,
    oov_logp: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents against a unigram log-prob model: (doc_id,
    n_tokens, avg_neg_logp) where avg_neg_logp is the mean negative
    log-prob of the document's tokens (≈ log-perplexity; higher = less
    like the model corpus — the CCNet head/middle/tail split thresholds
    this). `oov_logp` is the log-prob assigned to out-of-vocab tokens
    (ln(alpha / (T + alpha·(V+1))) for the matching model).

    The model is a broadcast dimension (≤ vocab_size rows): the corpus
    explodes map-side, joins without shuffling, and aggregates back to one
    row per document — one shuffle on doc_id. Because model logp values
    are pre-rounded, the per-doc average is an average of identical
    doubles in any engine; the result is rounded to 4 decimals like every
    cross-engine float in this repo."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("token"),
    ).filter(F.length("token") > 0)
    scored = toks.join(F.broadcast(model), "token", "left").select(
        "doc_id", F.coalesce("logp", F.lit(round(oov_logp, 6))).alias("logp")
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(-F.avg("logp"), 4).alias("avg_neg_logp"),
    )


def hot_ngrams(
    docs: DataFrame,
    k: int = 5,
    top: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-`top` most frequent word k-grams across the corpus:
    (shingle, n_occurrences, n_docs), ordered by (count DESC, shingle ASC)
    — the hot-phrase miner behind boilerplate-template detection and
    memorization audits ("which 5-grams does the corpus repeat most?").

    Reuses the shingle generator with dedupe=False (every OCCURRENCE is a
    row — occurrence counting is duplicate-sensitive, so the set-contract
    distinct would be wrong here, not just wasteful). One partial-agg
    shuffle on the gram, then a global top-k that Spark executes as
    TakeOrderedAndProject (per-partition heaps, never a full sort).
    Deterministic at the cut line: ties break on the gram text in both
    engines."""
    from kgraph_spark.operators.dedup_text import shingles

    sh = shingles(docs, id_col=id_col, text_col=text_col, k=k, dedupe=False)
    agg = sh.groupBy("shingle").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
    )
    return agg.orderBy(F.col("n_occurrences").desc(), F.col("shingle").asc()).limit(top)


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The published Gopher quality-filter signals (Rae et al. 2021,
    Appendix A1.1) per document, plus the composite keep flag:

      * 50 <= word count <= 100,000
      * 3 <= mean word length <= 10
      * symbol-to-word ratio < 0.1  (hash marks + ellipses)
      * > 80% of words contain at least one alphabetic character
      * >= 2 of the 8 Gopher stop words present ({the, be, to, of, and,
        that, have, with})

    Returns (doc_id, n_words, mean_word_len, symbol_ratio,
    alpha_word_frac, n_stop_hits, keep). Ratios are round-6 and the keep
    flag compares the ROUNDED values, so the DuckDB restatement decides
    identically.

    Map-only: every signal is a JVM expression over the token array —
    zero shuffle, survives in the scan stage under whole-stage codegen.
    The HOF lambdas bind array ELEMENTS (filter/transform), never index a
    derived array positionally — the re-evaluation trap that bit the
    bigram builders doesn't apply."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_words = F.size(toks)
    # total non-whitespace chars / words == mean word length (token_stats)
    mean_len = F.round(
        F.length(F.regexp_replace(F.col(text_col), r"\s+", "")) / n_words, 6
    )
    n_hash = F.length(F.col(text_col)) - F.length(F.regexp_replace(F.col(text_col), "#", ""))
    n_ellipsis = (
        F.length(F.col(text_col))
        - F.length(F.regexp_replace(F.col(text_col), r"\.\.\.", ""))
    ) / 3
    symbol_ratio = F.round((n_hash + n_ellipsis) / n_words, 6)
    alpha_frac = F.round(
        F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))) / n_words, 6
    )
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(toks, F.lower)),
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
        )
    )
    keep = (
        n_words.between(50, 100000)
        & mean_len.between(3.0, 10.0)
        & (symbol_ratio < 0.1)
        & (alpha_frac > 0.8)
        & (stop_hits >= 2)
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_words.cast("long").alias("n_words"),
        mean_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_frac.alias("alpha_word_frac"),
        stop_hits.cast("long").alias("n_stop_hits"),
        keep.alias("keep"),
    )


def domain_quality(
    docs: DataFrame,
    min_mean_quality: float = 0.5,
    domain_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Domain-level quality gate: aggregate quality_score per source
    domain into (domain, n_docs, mean_quality, keep) — the blocklist
    induction step web-corpus curation runs BEFORE per-document filtering
    (a domain whose mean quality is junk gets dropped wholesale; per-doc
    filters then clean the survivors). Mean uses round-6 fixed-point
    units over the round-6 scores (order-free integer sums); `keep`
    compares the ROUNDED mean so any engine replays the decision.

    One map-only feature pass (quality_score) + one hash aggregate on the
    domain — the same single-shuffle shape as a word count."""
    q = quality_score(docs, id_col=id_col, text_col=text_col)
    dom = docs.select(F.col(id_col), F.col(domain_col).alias("domain"))
    u = F.round(F.col("quality_score") * 1000000, 0).cast("long")
    agg = (
        q.join(dom, id_col)
        .select("domain", u.alias("_u"))
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.sum("_u") / F.count(F.lit(1)) / 1000000.0, 6).alias("mean_quality"),
        )
    )
    return agg.withColumn("keep", F.col("mean_quality") >= min_mean_quality)


def oov_rate(
    docs: DataFrame,
    min_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Out-of-vocabulary rate per document: the fraction of token
    OCCURRENCES whose type appears in fewer than `min_df` documents
    corpus-wide — high OOV flags gibberish, OCR noise, and wrong-language
    contamination that per-doc heuristics (quality_score) miss because
    they never look across documents.

    Two passes over one tokenization: a vocab-sized df aggregate, then a
    token-keyed join back (LeftSemi-shaped: only the rare-type rows
    matter, common tokens aggregate map-side) and one per-doc count.
    Ratio is an exact integer fraction round-6."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.trim(text_col)), r"\s+")).alias("token"),
    ).filter(F.length("token") > 0)
    df_tab = (
        toks.select("doc_id", "token")
        .distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("_df"))
    )
    rare = df_tab.filter(F.col("_df") < min_df).select("token")
    per_doc = toks.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("n_tokens"))
    rare_counts = (
        toks.join(rare, "token", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_oov"))
    )
    return (
        per_doc.join(rare_counts, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("n_oov"), F.lit(0)).cast("long").alias("n_oov"),
            F.round(
                F.coalesce(F.col("n_oov"), F.lit(0)) / F.col("n_tokens"), 6
            ).alias("oov_rate"),
        )
    )


def token_entropy(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document unigram entropy (doc_id, n_tokens, n_types,
    entropy_bits): −Σ p·log2(p) over the doc's token-type distribution —
    the information-density quality feature (near-zero = degenerate
    repetition that n-gram repetition_stats can miss when the repeated
    unit is one token; implausibly high = token soup / OCR noise). Ranks
    documents where length/punct heuristics (quality_score) are blind.

    Float playbook (the adamic_adar precedent for log-derived weights):
    each type's term (c/n)·log2(n/c) is rounded to a FIXED-POINT long at
    1e-6, summed as exact integers (order-free, engine-identical), and
    divided back once at the end. One tokenize → one (doc, token) count →
    one per-doc sum; all shuffles on doc_id."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.trim(text_col)), r"\s+")).alias("token"),
    ).filter(F.length("token") > 0)
    counts = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).cast("long").alias("c"))
    totals = counts.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
    )
    terms = counts.join(totals, "doc_id").select(
        "doc_id",
        "n_tokens",
        "n_types",
        F.round(
            (F.col("c") / F.col("n_tokens"))
            * F.log2(F.col("n_tokens") / F.col("c"))
            * F.lit(1_000_000.0)
        )
        .cast("long")
        .alias("_t"),
    )
    return terms.groupBy("doc_id", "n_tokens", "n_types").agg(
        F.round(F.sum("_t") / F.lit(1_000_000.0), 6).alias("entropy_bits")
    )


def zipf_slope(
    docs: DataFrame,
    top_n: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ONE-row corpus profile (n_terms, slope, intercept): OLS fit of
    log10(freq) against log10(rank) over the `top_n` most frequent terms —
    natural corpora track Zipf (slope ≈ −1); a flat slope flags template/
    boilerplate floods, a cliff flags deduplicated-to-death or synthetic
    text. The cross-build drift gate for corpus composition.

    Ranks come from ONE global top-n (freq desc, term asc tie-break) over
    the vocab-sized frequency table — top_n rows survive; at a 10^8-type
    corpus swap the exact window for an approx-threshold pre-filter (take
    freq ≥ the approx 1−top_n/|V| quantile, then rank the survivors), same
    contract as the other global-sort swap-ins. Per-term log10 coordinates
    are fixed-point longs at 1e-6 (exact integer Σx, Σy, Σxy, Σx²); the
    closed-form slope combines those exact longs in double — one rounding
    per product, engine-identical — and rounds to 6."""
    from pyspark.sql import Window

    toks = docs.select(
        F.explode(F.split(F.lower(F.trim(text_col)), r"\s+")).alias("token"),
    ).filter(F.length("token") > 0)
    freq = toks.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("freq"))
    ranked = (
        freq.withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("freq"), F.asc("token"))),
        )
        .filter(F.col("rank") <= top_n)
    )
    fp = ranked.select(
        F.round(F.log10(F.col("rank").cast("double")) * F.lit(1_000_000.0))
        .cast("long")
        .alias("x"),
        F.round(F.log10(F.col("freq").cast("double")) * F.lit(1_000_000.0))
        .cast("long")
        .alias("y"),
    )
    sums = fp.agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n = F.col("n_terms").cast("double")
    det = n * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double")
    slope = (
        n * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double")
    ) / det
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / n / F.lit(1_000_000.0)
    return sums.select(
        "n_terms",
        F.when(det != 0, F.round(slope, 6)).alias("slope"),
        F.when(det != 0, F.round(intercept, 6)).alias("intercept"),
    )


def reading_ease(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document Flesch reading ease (doc_id, n_words, n_sentences,
    n_syllables, flesch): 206.835 − 1.015·(words/sentences) −
    84.6·(syllables/words), with syllables approximated by vowel GROUPS
    per word ([aeiouy]+ runs, min 1/word — the standard fast heuristic)
    and sentences by [.!?]+ runs (min 1). The readability axis of the
    quality family: quality_score measures surface hygiene, lm_perplexity
    measures predictability, this measures audience difficulty — academic
    corpora sit near 30, web prose near 60-70; a drift flags register
    shifts in the corpus mix.

    Pure JVM regex counting (no UDF, no explode): counts come from
    length-difference arithmetic on regexp_replace, so the only floats are
    the two exact-integer divisions in one fixed IEEE expression, round-6.
    Both regexes are plain character classes — portable across engines."""
    t = F.lower(F.trim(F.col(text_col)))
    words = F.size(F.filter(F.split(t, r"\s+"), lambda w: F.length(w) > 0)).cast("long")
    # terminator runs ([.!?]+) via the marker trick: replace each run with
    # one control char, count = length delta vs deleting the runs
    sruns = F.length(F.regexp_replace(t, r"[.!?]+", "\x01")) - F.length(
        F.regexp_replace(t, r"[.!?]+", "")
    )
    sentences = F.greatest(sruns.cast("long"), F.lit(1).cast("long"))
    # syllable groups: replace each vowel run with one marker, count markers
    vgroups = F.length(F.regexp_replace(t, r"[aeiouy]+", "\x01")) - F.length(
        F.regexp_replace(t, r"[aeiouy]+", "")
    )
    syllables = F.greatest(vgroups.cast("long"), words)
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (words / sentences)
        - F.lit(84.6) * (syllables / words)
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        words.alias("n_words"),
        sentences.alias("n_sentences"),
        syllables.alias("n_syllables"),
        F.when(words > 0, F.round(flesch, 6)).alias("flesch"),
    )


def lexical_diversity(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc lexical-diversity gate: type-token ratio, hapax share, and
    Simpson's repeat concentration — the vocabulary-collapse signals that
    catch template/boilerplate docs a length filter misses (low TTR =
    few distinct words; high Simpson = one word dominates).

    Float discipline: all three are exact-integer ratios quantized to
    micro by ONE integer division each (the cosine_fixed recipe) —
      ttr_micro     = 1e6·n_types ÷ n_tokens
      hapax_micro   = 1e6·n_hapax ÷ n_types
      simpson_micro = 1e6·Σ nᵢ(nᵢ−1) ÷ N(N−1)   (0 when N < 2)
    so any engine computing the same token counts reproduces the hash.

    Scale: ONE shuffle on (doc, token) with map-side partial counts, then
    a per-doc aggregate — no joins, no UDFs."""
    per_tok = (
        docs.select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("token"),
        )
        .filter(F.length("token") > 0)
        .groupBy(id_col, "token")
        .agg(F.count("*").cast("long").alias("n"))
    )
    return (
        per_tok.groupBy(id_col)
        .agg(
            F.sum("n").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_types"),
            F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).cast("long").alias("n_hapax"),
            F.sum(F.col("n") * (F.col("n") - 1)).cast("long").alias("_rep"),
        )
        .select(
            F.col(id_col),
            "n_tokens",
            "n_types",
            F.expr("1000000 * n_types div n_tokens").alias("ttr_micro"),
            F.expr("1000000 * n_hapax div n_types").alias("hapax_micro"),
            F.when(
                F.col("n_tokens") >= 2,
                F.expr("1000000 * _rep div (n_tokens * (n_tokens - 1))"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("simpson_micro"),
        )
    )


def ngram_novelty(docs: DataFrame, k: int = 3, id_col: str = "doc_id") -> DataFrame:
    """Corpus novelty curve: per document, the share of its word k-grams
    whose FIRST corpus occurrence (min doc_id order) is this document —
    late documents full of already-seen n-grams are recombinations or
    near-dups the dedup pass missed; a healthy crawl keeps novelty high.
    novelty_micro = 10⁶ · n_novel ÷ n_grams (one integer division).

    Scale: one (gram → min doc) aggregate over the shingle set + one
    broadcast-or-hash join back on the gram key + a per-doc rollup. The
    ingestion-order attribution is a pure aggregate — no sequential scan,
    no window over the corpus."""
    from kgraph_spark.operators.dedup_text import shingles

    sh = shingles(docs, id_col=id_col, k=k)
    first = sh.groupBy("shingle").agg(F.min(id_col).alias("_first"))
    return (
        sh.join(first, "shingle")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(F.when(F.col("_first") == F.col(id_col), 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
        )
        .withColumn("novelty_micro", F.expr("1000000 * n_novel div n_grams"))
    )


def term_burstiness(
    docs: DataFrame,
    min_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-term burstiness profile: (token, df, cf, per_doc_rate,
    vmr) — df = documents containing the term, cf = total occurrences,
    per_doc_rate = cf/df (Church & Gale's burstiness: how hard the term
    repeats once it shows up), vmr = variance-to-mean ratio of the
    per-document count ACROSS THE WHOLE CORPUS including zero docs
    (≈1 for Poisson-scattered function words, ≫1 for topical terms that
    clump). The dedup/quality reading: high-vmr high-df terms are
    boilerplate signatures; high-vmr low-df terms are topic anchors.

    Exactness: with per-doc counts c over N docs (zeros implicit),
    vmr = (N·Σc² − (Σc)²) / (N·Σc) — integer numerator/denominator from
    one (doc, token) aggregate, zeros contribute nothing to either sum
    so they never materialize; two round-6 divisions total. ONE shuffle
    on (doc, token), one on token, plus a 1-row corpus-count broadcast."""
    per_doc = (
        docs.select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias(
                "token"
            ),
        )
        .filter(F.length("token") > 0)
        .groupBy(id_col, "token")
        .agg(F.count("*").cast("long").alias("c"))
    )
    n_docs = docs.select(F.count(F.lit(1)).cast("long").alias("_nd"))
    per_term = per_doc.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("c").cast("long").alias("cf"),
        F.sum(F.col("c") * F.col("c")).cast(_DEC := "decimal(38,0)").alias("_sc2"),
    )
    num = (
        F.col("_nd").cast(_DEC) * F.col("_sc2")
        - F.col("cf").cast(_DEC) * F.col("cf").cast(_DEC)
    )
    den = F.col("_nd").cast(_DEC) * F.col("cf").cast(_DEC)
    return (
        per_term.filter(F.col("df") >= min_df)
        .crossJoin(F.broadcast(n_docs))
        .select(
            "token",
            "df",
            "cf",
            F.round(F.col("cf") / F.col("df"), 6).alias("per_doc_rate"),
            F.round(num.cast("double") / den.cast("double"), 6).alias("vmr"),
        )
    )


def source_tvd_drift(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source unigram drift vs the REST of the corpus as total
    variation distance: (source, n_tokens, n_rest_tokens, tvd). TVD =
    ½·Σ_w |p_w − q_w| over the union vocabulary — the log-free drift
    divergence (KL/JS need logs the cross-engine contract can't have):
    0 = same word mix, →1 = disjoint vocabularies. The corpus-QA read:
    a source whose TVD jumps between builds changed its content mix
    (new boilerplate, language shift, scraper breakage).

    Exactness: with source counts c_w (total t_s) and rest counts r_w
    (total t_r), each term is |c_w·t_r − r_w·t_s| — exact wide integers
    summed exactly; ONE double division by 2·t_s·t_r at the end.
    Rest counts come from corpus − source (no per-pair re-scan): one
    (source, token) aggregate, one token aggregate joined back, then a
    per-source rollup. Sources with an empty complement (single-source
    corpus) return NULL tvd."""
    tok = (
        docs.select(
            F.col(source_col).alias("src"),
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias(
                "token"
            ),
        )
        .filter(F.length("token") > 0)
    )
    per_sw = tok.groupBy("src", "token").agg(F.count("*").cast("long").alias("c"))
    per_w = per_sw.groupBy("token").agg(F.sum("c").cast("long").alias("tot_w"))
    totals = per_sw.groupBy("src").agg(F.sum("c").cast("long").alias("t_s"))
    grand = totals.agg(F.sum("t_s").cast("long").alias("t_all"))
    dec = "decimal(38,0)"
    # per (source, word): |c·t_r − r·t_s| with r = tot_w − c, t_r = t_all − t_s.
    # Words ABSENT from the source still contribute r_w·t_s; handling them
    # per-pair would need a |sources|×|vocab| dense frame, so fold them in
    # CLOSED FORM: Σ_{w∉s} r_w = t_r − Σ_{w∈s}(tot_w − c_w).
    joined = (
        per_sw.join(per_w, "token")
        .join(F.broadcast(totals), "src")
        .crossJoin(F.broadcast(grand))
    )
    per_src = joined.groupBy("src", "t_s", "t_all").agg(
        F.sum(
            F.abs(
                F.col("c").cast(dec) * (F.col("t_all") - F.col("t_s")).cast(dec)
                - (F.col("tot_w") - F.col("c")).cast(dec) * F.col("t_s").cast(dec)
            )
        ).alias("_present_sum"),
        F.sum((F.col("tot_w") - F.col("c")).cast(dec)).alias("_rest_mass_present"),
    )
    t_r = (F.col("t_all") - F.col("t_s")).cast(dec)
    absent = (t_r - F.col("_rest_mass_present")) * F.col("t_s").cast(dec)
    num = F.col("_present_sum") + absent
    den = F.lit(2).cast(dec) * F.col("t_s").cast(dec) * t_r
    return per_src.select(
        F.col("src").alias(source_col),
        F.col("t_s").alias("n_tokens"),
        (F.col("t_all") - F.col("t_s")).cast("long").alias("n_rest_tokens"),
        F.when(
            F.col("t_all") > F.col("t_s"),
            F.round(num.cast("double") / den.cast("double"), 6),
        ).alias("tvd"),
    )


def vocabulary_discovery_curve(
    docs: DataFrame,
    n_buckets: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Heaps-law vocabulary growth: scan the corpus in `id_col` order,
    split the id range into `n_buckets` equal-width slices, and report
    per slice (bucket, n_docs, n_tokens, new_types, tokens_cum,
    types_cum) — new_types = tokens whose FIRST occurrence lands in the
    bucket. The curve flattening early = the corpus repeats itself
    (crawl loops, boilerplate); a still-steep tail = more data still
    buys vocabulary — the keep-crawling-or-stop signal for a training
    corpus, and the empirical Heaps exponent feed for zipf_slope.

    Buckets are EQUAL-WIDTH over [min_id, max_id] (exact integer `div`,
    clamped to n_buckets−1), not equal-count: no global row ordering is
    ever materialized. Plan shape: one (token → min doc_id) hash
    aggregate for first occurrences, one per-bucket rollup, and a final
    window over ≤ n_buckets rows for the cumulative sums — the only
    ordered scan is over the bucket table itself. Empty buckets (sparse
    id ranges) are absent rather than zero-filled (evt_grid_fill closes
    gaps when a dense axis is needed)."""
    from pyspark.sql import Window

    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    bounds = F.broadcast(
        docs.agg(
            F.min(F.col(id_col)).cast("long").alias("_lo"),
            (F.max(F.col(id_col)) - F.min(F.col(id_col)) + 1).cast("long").alias("_span"),
        )
    )
    bucket = F.least(
        F.lit(int(n_buckets) - 1),
        F.expr(f"(({id_col} - _lo) * {int(n_buckets)}) div _span"),
    ).cast("long")
    tok = (
        docs.crossJoin(bounds)
        .select(
            bucket.alias("bucket"),
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("token"),
        )
        .filter(F.length("token") > 0)
    )
    doc_counts = (
        docs.crossJoin(bounds)
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    per_bucket = doc_counts.join(
        tok.groupBy("bucket").agg(F.count(F.lit(1)).cast("long").alias("n_tokens")),
        "bucket",
        "left",
    ).na.fill({"n_tokens": 0})
    firsts = tok.groupBy("token").agg(F.min("bucket").alias("first_bucket"))
    news = firsts.groupBy(F.col("first_bucket").alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("new_types")
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_bucket.join(news, "bucket", "left")
        .na.fill({"new_types": 0})
        .select(
            "bucket",
            "n_docs",
            "n_tokens",
            "new_types",
            F.sum("n_tokens").over(w).cast("long").alias("tokens_cum"),
            F.sum("new_types").over(w).cast("long").alias("types_cum"),
        )
    )


def burrows_delta(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    top_k: int = 50,
) -> DataFrame:
    """Burrows' Delta stylometric distance between sources: (source_a,
    source_b, n_tokens, delta) where delta = mean over the corpus'
    top_k most-frequent words of |z_a − z_b|, z = the source's relative
    frequency standardized across sources — THE classical authorship /
    style-drift measure (Burrows 2002): low delta = same register
    (template mills, one crawler), high = distinct voices. The curation
    reading: a source whose delta to everything is tiny is boilerplate.

    Exact discipline: relative frequencies land on the integer-micro
    grid (ONE division per (source, token), absent tokens an exact 0);
    per-token moments (n, Σf, Σf²) are exact integers, so
    z = (n·f − S)·10⁶ / √(n·Q − S²) is one fixed IEEE sequence, rounded
    to micro; |z_a − z_b| then SUMS AS EXACT LONGS (the nDCG lesson —
    never sum raw doubles across tokens) with one final division.
    Zero-variance tokens drop (every source identical — no signal).

    Scale: one (source, token) aggregate on the corpus, a top-k
    TakeOrdered (k rows to the driver plan, never data), the
    |sources|·k grid and |sources|²·k/2 pair rows — bounded by source
    count, never by corpus size."""
    tok = docs.select(
        F.col(source_col).alias("src"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("token"),
    ).filter(F.length("token") > 0)
    cnt = tok.groupBy("src", "token").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = cnt.groupBy("src").agg(F.sum("c").cast("long").alias("t"))
    topk = (
        cnt.groupBy("token")
        .agg(F.sum("c").cast("long").alias("cf"))
        .orderBy(F.col("cf").desc(), F.col("token").asc())
        .limit(top_k)
        .select("token")
    )
    grid = tot.crossJoin(F.broadcast(topk))
    f = grid.join(cnt, ["src", "token"], "left").select(
        "src",
        "token",
        F.round(
            F.coalesce(F.col("c"), F.lit(0)).cast("double") * F.lit(1_000_000.0)
            / F.col("t").cast("double"),
            0,
        ).cast("long").alias("f"),
    )
    d38 = "decimal(38,0)"
    st = f.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("f").cast("long").alias("s"),
        F.sum(F.col("f").cast("decimal(19,0)") * F.col("f").cast("decimal(19,0)"))
        .alias("q"),
    )
    den = (F.col("n").cast(d38) * F.col("q")
           - F.col("s").cast(d38) * F.col("s").cast(d38)).cast("double")
    z = (
        f.join(F.broadcast(st), "token")
        .filter(den > 0)
        .select(
            "src",
            "token",
            F.round(
                (F.col("n") * F.col("f") - F.col("s")).cast("double")
                * F.lit(1_000_000.0)
                / F.sqrt(den),
                0,
            ).cast("long").alias("z"),
        )
    )
    a = z.select(F.col("src").alias("source_a"), "token", F.col("z").alias("za"))
    b = z.select(F.col("src").alias("source_b"), "token", F.col("z").alias("zb"))
    return (
        a.join(b, "token")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.abs(F.col("za") - F.col("zb"))).cast("long").alias("_d"),
        )
        .select(
            "source_a",
            "source_b",
            "n_tokens",
            F.round(
                F.col("_d").cast("double") / F.col("n_tokens").cast("double")
                / F.lit(1_000_000.0),
                6,
            ).alias("delta"),
        )
    )


def chao1_richness(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Chao1 vocabulary-richness estimate + Good-Turing unseen mass —
    one row (n_tokens, n_types, f1, f2, chao1, unseen_mass). The
    "how much vocabulary exists that this corpus has NOT seen yet"
    companion to vocabulary_discovery_curve (which shows the trajectory;
    this estimates the asymptote): chao1 = S + f1(f1−1)/(2(f2+1)) (the
    bias-corrected form, defined even with no doubletons) from the
    singleton/doubleton counts, and Good-Turing unseen probability
    mass p₀ = f1/N — the expected share of the NEXT crawl's tokens that
    are new types. The keep-crawling-or-stop pair: discovery curve
    still steep + large chao1 gap + high p₀ = more data buys vocabulary.

    Tokens are the repo-standard lowercased whitespace tokens. All five
    inputs are exact longs from one type-frequency aggregate; chao1 and
    p₀ are each ONE division of exact integers, round-6'd.

    Scale: one shuffle on the token key (map-side partials collapse
    per-partition repeats), then |types| rows fold to one.
    """
    tok = docs.filter(F.col(text_col).isNotNull()).select(
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("w")
    )
    per_w = tok.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("n"))
    agg = per_w.agg(
        F.sum("n").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum((F.col("n") == 1).cast("int")).cast("long").alias("f1"),
        F.sum((F.col("n") == 2).cast("int")).cast("long").alias("f2"),
    )
    f1d = F.col("f1").cast("double")
    return agg.select(
        "n_tokens",
        "n_types",
        "f1",
        "f2",
        F.round(
            F.col("n_types").cast("double")
            + f1d * (f1d - F.lit(1.0))
            / (F.lit(2.0) * (F.col("f2").cast("double") + F.lit(1.0))),
            6,
        ).alias("chao1"),
        F.when(
            F.col("n_tokens") > 0,
            F.round(f1d / F.col("n_tokens").cast("double"), 6),
        ).alias("unseen_mass"),
    )


def corpus_richness(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-level vocabulary-richness profile — Yule's K (repeat
    concentration, length-robust), Honoré's R (hapax-weighted richness)
    and Herdan's C (log-log type/token ratio): one row (n_tokens,
    n_types, hapax, yule_k, honore_r, herdan_c). The corpus-wide
    companion to the per-doc lexical_diversity gate and the chao1
    asymptote: K spikes when a template dominates the crawl; R collapses
    as hapax share does.

      yule_k   = 10⁴·(Σn_w² − N)/N²          (exact ints, ONE division)
      honore_r = 100·ln N / (1 − V₁/V)        (NULL when V₁ = V)
      herdan_c = ln V / ln N                  (NULL when N ≤ 1)

    Tokens are the repo-standard lowercased whitespace tokens (chao1's
    grid). One token-key aggregate with map-side partials, then |types|
    rows fold to one; lns are fixed IEEE sequences on exact integers.
    """
    tok = docs.filter(F.col(text_col).isNotNull()).select(
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("w")
    )
    per_w = tok.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("n"))
    agg = per_w.agg(
        F.sum("n").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum((F.col("n") == 1).cast("int")).cast("long").alias("hapax"),
        F.sum(F.col("n").cast(_DEC) * F.col("n").cast(_DEC)).alias("s2"),
    )
    nd = F.col("n_tokens").cast("double")
    vd = F.col("n_types").cast("double")
    v1 = F.col("hapax").cast("double")
    return agg.select(
        "n_tokens",
        "n_types",
        "hapax",
        F.when(
            F.col("n_tokens") > 0,
            F.round(
                F.lit(10_000.0)
                * (F.col("s2").cast("double") - nd)
                / (nd * nd),
                6,
            ),
        ).alias("yule_k"),
        F.when(
            F.col("hapax") < F.col("n_types"),
            F.round(F.lit(100.0) * F.log(nd) * vd / (vd - v1), 6),
        ).alias("honore_r"),
        F.when(F.col("n_tokens") > 1, F.round(F.log(vd) / F.log(nd), 6)).alias(
            "herdan_c"
        ),
    )


def collocations_g2(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 20,
) -> DataFrame:
    """Dunning log-likelihood (G²) bigram collocations — the
    significance-ranked phrase detector that PMI over-ranks rare pairs
    on (pmi_collocations' complement): top-k rows (w1, w2, n12, n1, n2,
    g2) by G² over the corpus bigram table. 2×2 cell counts come from
    the bigram marginals (N = total bigrams, n1 = bigrams starting with
    w1, n2 = ending with w2); G² = 2·Σ k·ln(k·N/(R·C)) over the four
    cells with 0·ln0 = 0 — a fixed per-row IEEE chain on exact longs,
    round-6'd; ties break on (w1, w2) so top-k is total-ordered.

    Scale: bigrams from a per-doc lag window (token-grid sized), then
    THREE hash aggregates on bigram/first/second keys; the min_count
    gate prunes the candidate set BEFORE the two marginal joins, and
    marginal tables join on their token keys (co-partitioned shuffles,
    no broadcast of vocab-sized sides).
    """
    toks = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("_d"),
        F.posexplode(
            F.filter(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                lambda x: F.length(x) > 0,
            )
        ).alias("pos", "w"),
    )
    wdoc = Window.partitionBy("_d").orderBy("pos")
    big = toks.select(
        F.lag("w").over(wdoc).alias("w1"), F.col("w").alias("w2")
    ).filter(F.col("w1").isNotNull())
    n12 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("n12"))
    m1 = big.groupBy("w1").agg(F.count(F.lit(1)).cast("long").alias("n1"))
    m2 = big.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("n2"))
    tot = big.agg(F.count(F.lit(1)).cast("long").alias("nn"))
    cand = (
        n12.filter(F.col("n12") >= min_count)
        .join(m1, "w1")
        .join(m2, "w2")
        .crossJoin(F.broadcast(tot))
    )

    def _term(k: Column, r: Column, c: Column) -> Column:
        kd = k.cast("double")
        return F.when(
            k > 0,
            kd
            * (
                F.log(kd)
                + F.log(F.col("nn").cast("double"))
                - F.log(r.cast("double"))
                - F.log(c.cast("double"))
            ),
        ).otherwise(F.lit(0.0))

    k11 = F.col("n12")
    k12 = F.col("n1") - F.col("n12")
    k21 = F.col("n2") - F.col("n12")
    k22 = F.col("nn") - F.col("n1") - F.col("n2") + F.col("n12")
    r1, r2 = F.col("n1"), F.col("nn") - F.col("n1")
    c1, c2 = F.col("n2"), F.col("nn") - F.col("n2")
    g2 = F.round(
        F.lit(2.0)
        * (
            _term(k11, r1, c1)
            + _term(k12, r1, c2)
            + _term(k21, r2, c1)
            + _term(k22, r2, c2)
        ),
        6,
    )
    return (
        cand.select("w1", "w2", "n12", "n1", "n2", g2.alias("g2"))
        .orderBy(F.col("g2").desc(), "w1", "w2")
        .limit(top_k)
    )


def source_kl_divergence(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source KL divergence from the corpus unigram distribution —
    the directed "how far does this crawl source skew from the mixture"
    monitor (the asymmetric companion to source_tvd_drift and the JSD
    gate): one row per source (source, n_tokens, kl_bits), ordered by
    source. KL(p_s ‖ p_corpus) = Σ_w p·log2(p/q); every source token is
    in the corpus, so q > 0 always and absent terms contribute 0.

    Each (source, w) cell contributes ONE nano-rounded
    n·(ln n + ln N_c − ln N_s − ln c_w)/ln2 term summed exactly; the
    shared 1/N_s division happens once — distributed sum order can't
    move the statistic. Two token-key aggregates + one token-key join
    (co-partitioned; corpus totals broadcast).
    """
    tok = docs.filter(
        F.col(text_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        F.col(group_col).alias("g"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("w"),
    )
    sw = tok.groupBy("g", "w").agg(F.count(F.lit(1)).cast("long").alias("n"))
    cw = sw.groupBy("w").agg(F.sum("n").cast("long").alias("c"))
    ns = sw.groupBy("g").agg(F.sum("n").cast("long").alias("ns"))
    nc = cw.agg(F.sum("c").cast("long").alias("nc"))
    ln2 = 0.6931471805599453
    j = (
        sw.join(cw, "w")
        .join(F.broadcast(ns), "g")
        .crossJoin(F.broadcast(nc))
    )
    term_nano = F.round(
        F.col("n").cast("double")
        * (
            F.log(F.col("n").cast("double"))
            + F.log(F.col("nc").cast("double"))
            - F.log(F.col("ns").cast("double"))
            - F.log(F.col("c").cast("double"))
        )
        / F.lit(ln2)
        * F.lit(1_000_000_000.0),
        0,
    ).cast("long")
    per_g = j.groupBy("g", "ns").agg(F.sum(term_nano).cast("long").alias("t_nano"))
    return per_g.select(
        F.col("g").alias(group_col),
        F.col("ns").alias("n_tokens"),
        F.round(
            F.col("t_nano").cast("double")
            / (F.col("ns").cast("double") * F.lit(1_000_000_000.0)),
            6,
        ).alias("kl_bits"),
    ).orderBy(group_col)


def code_likeness(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Code-likeness detector — the "is this document prose or source
    code" gate an LLM-pretraining curation pipeline runs before
    routing documents to text-vs-code dedup/quality tracks: one row
    per doc (doc_id, n_chars, n_lines, sym_ratio, indent_ratio,
    semi_ratio, prob, is_code). Features are the classic structural
    tells — {}();=<>[] symbol density, leading-indent line fraction,
    semicolon-terminated line fraction — combined by a hand-set
    logistic stand-in (the quality_classifier determinism stance:
    plug trained weights in place of the literals).

    Engine-exact: every count is a length-difference / HOF filter on
    the JVM (no Python), ratios divide exact integers, the logit is
    round-6'd before the sigmoid so exp() runs on identical doubles.
    Map-only — zero shuffles.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    sym = n_chars - F.length(F.regexp_replace(t, r"[{}();=<>\[\]]", ""))
    lines = F.split(t, "\n")
    n_lines = F.size(lines)
    indented = F.size(
        F.filter(
            lines,
            lambda l: l.startswith("  ") | l.startswith("\t"),
        )
    )
    semi = F.size(F.filter(lines, lambda l: l.endswith(";")))
    base = docs.filter(t.isNotNull() & F.col(id_col).isNotNull()).select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_lines.cast("long").alias("n_lines"),
        sym.cast("long").alias("_sym"),
        indented.cast("long").alias("_ind"),
        semi.cast("long").alias("_semi"),
    ).filter((F.col("n_chars") > 0) & (F.col("n_lines") > 0))
    sym_ratio = F.col("_sym").cast("double") / F.col("n_chars").cast("double")
    ind_ratio = F.col("_ind").cast("double") / F.col("n_lines").cast("double")
    semi_ratio = F.col("_semi").cast("double") / F.col("n_lines").cast("double")
    logit = F.round(
        F.lit(-4.0)
        + F.lit(14.0) * sym_ratio
        + F.lit(3.0) * ind_ratio
        + F.lit(4.0) * semi_ratio,
        6,
    )
    staged = base.select(
        id_col,
        "n_chars",
        "n_lines",
        F.round(sym_ratio, 6).alias("sym_ratio"),
        F.round(ind_ratio, 6).alias("indent_ratio"),
        F.round(semi_ratio, 6).alias("semi_ratio"),
        logit.alias("_logit"),
    )
    prob = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("_logit"))), 6)
    return staged.select(
        id_col,
        "n_chars",
        "n_lines",
        "sym_ratio",
        "indent_ratio",
        "semi_ratio",
        prob.alias("prob"),
        (prob >= 0.5).alias("is_code"),
    )


def license_markers(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """License / copyright marker scan — the rights-clearance gate a
    pretraining curation pipeline runs before a corpus ships: one row
    per doc (doc_id, n_copyright, has_cc, has_gpl, has_mit,
    license_flagged). Pure substring tells ('copyright', 'creative
    commons' / 'cc-by', GPL phrases, 'mit license') — deliberately NO
    regex classes, so both engines decide from byte-identical
    lowercase containment; counts come from the length-difference
    idiom. Map-only, zero shuffles. A real deployment swaps the
    marker list for its counsel-approved one — the plumbing (flag +
    count columns feeding a filter) is the operator.
    """
    lt = F.lower(F.col(text_col))
    n_copy = (
        (F.length(lt) - F.length(F.replace(lt, F.lit("copyright"), F.lit(""))))
        / F.lit(9)
    ).cast("long")
    has = lambda s: F.contains(lt, F.lit(s))  # noqa: E731
    has_cc = has("creative commons") | has("cc-by")
    has_gpl = has("gnu general public license") | has("gpl")
    has_mit = has("mit license")
    return docs.filter(
        F.col(text_col).isNotNull() & F.col(id_col).isNotNull()
    ).select(
        F.col(id_col),
        n_copy.alias("n_copyright"),
        has_cc.alias("has_cc"),
        has_gpl.alias("has_gpl"),
        has_mit.alias("has_mit"),
        ((n_copy > 0) | has_cc | has_gpl | has_mit).alias("license_flagged"),
    )
