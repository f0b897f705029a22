"""Text-analysis column functions for large-scale document pipelines.

All pure Catalyst expressions (split / regexp / array functions) — no Python
in the row path, so they run inside whole-stage codegen and scale linearly
with executors.  Every function has an exact ANSI-SQL twin used by the
DuckDB oracle (see __spark_entry__.oracle_sql), which is why hashing is
md5-based (portable across engines) rather than xxhash64 (engine-specific).

Greenfield Spark work (no reference counterpart): the north-star LLM-data
operators from BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..cache import scoped_persist

# small, deterministic per-language stopword lists for the n-gram/stopword
# language heuristic — the SQL oracle embeds the same lists
STOPWORDS = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "it", "that", "for"),
    "es": ("el", "la", "los", "las", "de", "que", "y", "en", "un", "una"),
    "fr": ("le", "la", "les", "de", "et", "un", "une", "que", "pour", "dans"),
    "de": ("der", "die", "das", "und", "ein", "eine", "zu", "von", "mit", "ist"),
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization of trimmed text."""
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def char_count(col: Column) -> Column:
    return F.length(col)


BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def bpe_token_count(col: Column) -> Column:
    """GPT-2-style pre-tokenizer count: letter runs, single digits, and
    individual punctuation marks each count as one token — the cheap
    LLM-billing-style estimate (a real BPE merge table refines it ~25%)."""
    return F.regexp_count(col, F.lit(BPE_TOKEN_RE))


def punct_count(col: Column) -> Column:
    return F.regexp_count(col, F.lit(r"[^\w\s]"))


def punct_ratio(col: Column) -> Column:
    return F.round(punct_count(col) / F.greatest(F.length(col), F.lit(1)), 6)


def avg_token_len(col: Column) -> Column:
    non_space = F.length(F.regexp_replace(col, r"\s", ""))
    return F.round(non_space / F.greatest(token_count(col), F.lit(1)), 6)


def stopword_count(col: Column, lang: str = "en") -> Column:
    words = STOPWORDS[lang]
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens(F.lower(col)), lambda t: F.array_contains(arr, t)))


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    return F.round(stopword_count(col, lang) / F.greatest(token_count(col), F.lit(1)), 6)


def quality_score(col: Column) -> Column:
    """Heuristic quality score in [0,1]: length band + stopword presence − punct noise.

    The standard cheap pre-filter for LLM training corpora (C4/Gopher-style
    rules): reasonable length, some function words, not symbol soup.
    """
    n_tok = token_count(col)
    length_ok = F.when((n_tok >= 5) & (n_tok <= 5000), F.lit(0.4)).otherwise(F.lit(0.0))
    stop = stopword_ratio(col, "en")
    stop_component = F.least(stop * 4, F.lit(0.3))
    punct_penalty = F.least(punct_ratio(col) * 2, F.lit(0.3))
    return F.round(length_ok + stop_component + F.lit(0.3) - punct_penalty, 6)


def lang_id(col: Column) -> Column:
    """Stopword-vote language guess over {en,es,fr,de}; 'und' when no votes.

    Deterministic tie-break: highest count wins, then language code order —
    mirrored exactly in the SQL oracle.
    """
    counts = {lang: stopword_count(col, lang) for lang in STOPWORDS}
    best_lang = F.lit("und")
    best_count = F.lit(0)
    # iterate in reversed alpha order so earlier codes win ties at equal count
    for lang in sorted(STOPWORDS, reverse=True):
        cnt = counts[lang]
        take = cnt >= F.greatest(best_count, F.lit(1))
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_count = F.when(take, cnt).otherwise(best_count)
    return best_lang


def normalized_words(col: Column) -> Column:
    """Lowercase, strip non-alphanumerics, distinct sorted word list."""
    cleaned = F.regexp_replace(F.lower(col), r"[^a-z0-9\s]", " ")
    toks = F.split(F.trim(cleaned), r"\s+")
    return F.sort_array(F.array_distinct(F.filter(toks, lambda t: t != F.lit(""))))


def fingerprint(col: Column) -> Column:
    """Order-insensitive document fingerprint: md5 of sorted distinct words.

    Collapses documents that differ only in word order / punctuation / case —
    the classic "fingerprint" clustering key.
    """
    return F.md5(F.concat_ws(" ", normalized_words(col)))


def _gram_array(toks: Column, n: int) -> Column:
    """ALL word n-grams of a token array, built as a zip of ``n`` SHIFTED
    SLICES folded with ``zip_with`` — n array slices total, not one per
    gram.  The obvious ``transform(sequence(...), i -> concat_ws(slice))``
    allocates a sub-array per gram inside an interpreted higher-order
    function and measured 7× SLOWER at sf0.1 (3.1s → 0.45s for bigrams
    over the documents corpus).  Shorter-than-n inputs yield one clamped
    gram (zip_with null-pads the short side; concat_ws skips nulls) —
    byte-identical to the slice formulation, property-tested against it.
    """
    m = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    out = F.slice(toks, 1, m)
    for k in range(1, n):
        out = F.zip_with(
            out, F.slice(toks, k + 1, m), lambda a, b: F.concat_ws(" ", a, b)
        )
    return out


def word_shingles(col: Column, n: int = 3) -> Column:
    """Distinct n-word shingles (the unit for Jaccard / MinHash dedup)."""
    return F.array_distinct(_gram_array(tokens(F.lower(col)), n))


def word_chunks(col: Column, chunk_words: int, sep: str = " ") -> Column:
    """NON-overlapping fixed-width word chunks (case preserved) — the unit
    for sub-document dedup / boilerplate stripping.  ceil(n/w) chunks; the
    tail chunk may be short.

    ONE greedy regex pass: ``\\S+(?:\\s+\\S+){0,w-1}`` consumes up to ``w``
    whitespace-separated tokens per match, then each chunk's internal
    whitespace collapses to ``sep``.  This replaced the earlier HOF
    formulations (zip-of-shifted-slices / transform+slice): those re-
    evaluate the full ``split(trim(text))`` tokenize for every slice arm —
    interpreted higher-order lambdas get NO common-subexpression
    elimination, and Catalyst's generator-inferred ``size(...)>0`` filter
    duplicates the whole build again below the shuffle.  Measured on the
    sf0.1 corpus at w=8: explode(chunks) 1.27s → 0.17s (7×), byte-identical
    output (property-tested).  Empty / whitespace-only input keeps the old
    contract of one empty chunk (``['']``, like ``split('')``).
    """
    if chunk_words < 1:
        raise ValueError(f"chunk_words must be >= 1; got {chunk_words}")
    pat = r"\S+(?:\s+\S+){0,%d}" % (chunk_words - 1)
    raw = F.regexp_extract_all(F.trim(col), F.lit(pat), 0)
    # replacement string is literal: escape regex-replacement specials
    rep = sep.replace("\\", "\\\\").replace("$", "\\$")
    chunks = F.transform(raw, lambda c: F.regexp_replace(c, r"\s+", rep))
    return F.when(F.size(chunks) == 0, F.array(F.lit(""))).otherwise(chunks)


def md5_long(col: Column, n_hex: int = 15) -> Column:
    """Portable integer hash: first ``n_hex`` hex chars of md5 as a long.

    Same value is computable in any engine with md5 — the cross-engine
    primitive under MinHash/SimHash oracles.  ``n_hex=15`` gives 60 bits;
    ``n_hex=8`` gives the 32-bit base hash for affine MinHash derivation.
    """
    return F.conv(F.substring(F.md5(col), 1, n_hex), 16, 10).cast("long")


def ngram_list(col: Column, n: int = 3) -> Column:
    """ALL word n-grams in order (with repeats) — the denominator for
    repetition metrics; ``word_shingles`` is its distinct counterpart."""
    return _gram_array(tokens(F.lower(col)), n)


def repetition_ratio(col: Column, n: int = 3) -> Column:
    """Gopher-style duplicate-n-gram fraction: 1 − distinct/total n-grams.

    High values flag boilerplate / template / looping text — a standard
    pretraining quality filter alongside ``quality_score``.  Pure Catalyst
    expression (no shuffle, no UDF); rounded to 6 dp for cross-engine
    determinism.
    """
    grams = ngram_list(col, n)
    return F.round(
        F.lit(1.0)
        - F.size(F.array_distinct(grams)).cast("double")
        / F.size(grams).cast("double"),
        6,
    )


# Gopher-style rule thresholds (Rae et al. 2021 §A1.1, adapted to this
# corpus's scale).  Each rule is a hard pass/fail; `keep` is their AND.
GOPHER_RULES = {
    "min_words": 20,
    "max_words": 400,
    "min_avg_word_len": 3.0,
    "max_avg_word_len": 12.0,
    "max_symbol_ratio": 0.1,
    "min_stopwords": 2,
    "max_rep_ratio": 0.6,
}


def gopher_quality_stats(col: Column, rules: dict | None = None) -> list[Column]:
    """Gopher-style quality-filter rule bundle: the per-document metrics
    behind the standard pretraining hard filters (word-count band, mean
    word length band, symbol ratio cap, stopword floor, duplicate-bigram
    cap) plus the combined ``keep`` verdict (1/0).

    Unlike the soft ``quality_score``, each rule here is a hard gate — the
    production shape of C4/Gopher filtering, where a document fails closed
    on any rule.  All comparisons are made on the ROUNDED (6 dp) metric
    values so the verdict is bit-identical cross-engine.

    Pure Catalyst expressions (no shuffle, no UDF) — one projection pass
    over the corpus, so the filter scales with executors at any size.

    Greenfield Spark work (no reference counterpart): the north-star
    LLM-data operators from BASELINE.json.
    """
    r = {**GOPHER_RULES, **(rules or {})}
    n_words = token_count(col).cast("long")
    avg_len = avg_token_len(col)
    sym = punct_ratio(col)
    n_stop = stopword_count(col, "en").cast("long")
    rep = repetition_ratio(col, 2)
    keep = (
        (n_words >= r["min_words"])
        & (n_words <= r["max_words"])
        & (avg_len >= r["min_avg_word_len"])
        & (avg_len <= r["max_avg_word_len"])
        & (sym <= r["max_symbol_ratio"])
        & (n_stop >= r["min_stopwords"])
        & (rep <= r["max_rep_ratio"])
    )
    return [
        n_words.alias("n_words"),
        avg_len.alias("avg_word_len"),
        sym.alias("symbol_ratio"),
        n_stop.alias("n_stopwords"),
        rep.alias("rep_ratio"),
        keep.cast("int").alias("keep"),
    ]


# PII detection / redaction.  Patterns are deliberately RE2-safe (no
# lookaround, no backrefs) so the SAME string works in Spark's Java regex,
# DuckDB/RE2, and Python — redaction is oracle-checkable cross-engine.
# Order matters: emails go first so their digits can't half-match as phones.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
]


def redact_pii(col: Column) -> Column:
    """Replace emails / IPv4s / phone-shaped substrings with typed tags.

    A chain of JVM-side ``regexp_replace`` — no UDF, codegen-friendly, and
    the standard pre-training privacy scrub (plus a dedup aid: two docs
    differing only in contact details collapse after redaction).
    """
    out = col
    for _, pattern, tag in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, tag)
    return out


def pii_counts(col: Column) -> list[Column]:
    """One ``<kind>_count`` int column per PII pattern (pre-redaction)."""
    return [
        F.regexp_count(col, F.lit(pattern)).alias(f"n_{kind}")
        for kind, pattern, _ in PII_PATTERNS
    ]


def ngram_novelty(
    df,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
):
    """Per-document novelty: the fraction of a doc's DISTINCT word n-gram
    shingles that appear in no other document (corpus document-frequency
    1).  Boilerplate-heavy pages (headers, navigation, license blocks)
    score near 0, genuinely novel prose near 1 — the complement of what
    dedup measures, and a standard pretraining quality signal.

    Output: (id, n_shingles, novelty), novelty rounded to 6 dp.

    Scale shape: the same inverted-index skeleton as ``ngram_jaccard``
    WITHOUT the self-join — and without even the posting-list join-back: a
    shingle with doc-frequency 1 belongs to exactly ONE document, so
    ``min(doc_id)`` inside the doc-freq aggregate identifies its owner for
    free, and per-doc unique counts come from a second (much smaller)
    groupBy over the df=1 rows.  The full posting list is shuffled once
    (8-byte hash keys); the final join is doc-cardinality, not
    shingle-cardinality.  Skewed ubiquitous shingles cost one hot reduce
    key in the doc-freq agg only (map-side partial aggregation absorbs
    them); measured ~1.8× faster than the join-back formulation at sf0.1
    (6.9s → 3.9s).
    """
    sh = df.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("__s")
    ).select(F.col(id_col), md5_long(F.col("__s")).alias("__h"))
    per_doc = sh.groupBy(id_col).agg(F.count("*").cast("long").alias("n_shingles"))
    uniq = (
        sh.groupBy("__h")
        .agg(F.count("*").alias("__df"), F.min(id_col).alias(id_col))
        .filter(F.col("__df") == 1)
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("__n_uniq"))
    )
    return per_doc.join(uniq, id_col, "left").select(
        F.col(id_col),
        "n_shingles",
        F.round(
            F.coalesce(F.col("__n_uniq"), F.lit(0)) / F.col("n_shingles"), 6
        ).alias("novelty"),
    )


def tfidf_top_terms(
    df,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
):
    """Top-``k`` characteristic terms per document by smoothed TF-IDF
    (sklearn's variant: tf/len · (ln((N+1)/(df+1)) + 1)), ties broken by
    term asc — (id, term, tfidf, rank).

    Plan shape: one token explode feeds a (doc, term) count; doc length is
    a window over the same grouping; document frequency is a groupBy(term)
    whose result — the term DICTIONARY, zipfian-small relative to the
    corpus — broadcasts back onto the scores, so the only full-corpus
    shuffles are the (doc, term) aggregation and the per-doc ranking
    window.  N rides along as a broadcast 1-row frame (no driver collect).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as _F

    toks = df.select(
        _F.col(id_col), _F.explode(tokens(_F.lower(_F.col(text_col)))).alias("term")
    ).filter(_F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(_F.count("*").alias("__n"))
    tf = tf.withColumn(
        "__dl", _F.sum("__n").over(Window.partitionBy(id_col))
    )
    dfreq = tf.groupBy("term").agg(_F.count("*").alias("__df"))
    n_docs = df.agg(_F.count("*").alias("__nd"))
    scored = (
        tf.join(_F.broadcast(dfreq), on="term")
        .crossJoin(_F.broadcast(n_docs))
        .select(
            _F.col(id_col),
            _F.col("term"),
            _F.round(
                (_F.col("__n").cast("double") / _F.col("__dl").cast("double"))
                * (
                    _F.log(
                        (_F.col("__nd") + 1).cast("double")
                        / (_F.col("__df") + 1).cast("double")
                    )
                    + _F.lit(1.0)
                ),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(_F.col("tfidf").desc(), _F.col("term").asc())
    return (
        scored.withColumn("rank", _F.row_number().over(w))
        .filter(_F.col("rank") <= k)
    )


def char_ngram_list(col: Column, n: int = 3) -> Column:
    """ALL character n-grams in order (with repeats).  Shorter-than-n texts
    yield their single clamped substring.

    Implementation note: measured AGAINST the obvious "split once into a
    char array, slice per gram" rewrite — the array form is 6× SLOWER at
    sf0.1 (array allocation + per-gram concat dominate), while ``substr``
    on short documents is effectively O(1) per gram.  Keep substr.
    """
    idx = F.sequence(F.lit(1), F.greatest(F.length(col) - (n - 1), F.lit(1)))
    return F.transform(idx, lambda i: col.substr(i, F.lit(n)))


def char_trigram_score(
    df,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    cache_intermediate: bool = True,
):
    """Per-document mean log-probability under the corpus's own add-one
    smoothed character n-gram frequency model — the cheap perplexity proxy
    used to quality-filter pretraining text (KenLM-style scoring without a
    trained LM): gibberish and encoding junk score far below fluent text.

    Output: (id, n_grams, mean_logprob), logprob per gram rounded to 6 dp
    and the mean computed over 1e6-scaled integer sums so partial-sum
    ordering can never perturb the result across engines/partitionings.

    Scale shape: ONE corpus explode feeds both the model counts and the
    scoring probe; the model's vocabulary is intrinsically bounded
    (charset^n, NOT corpus-sized — unlike word LMs), so the model table
    broadcasts at any corpus size and the only full-corpus shuffles are
    the count groupBy and the per-doc mean.

    ``cache_intermediate`` persists the shared explode for the duration of
    the job (same rule as ``minhash_lsh_pairs``); the persist is SCOPED
    (cache.py) — release it after materializing results with
    ``release_operator_caches`` / ``operator_cache_scope`` (the Pipeline
    batch loop and bench harness do this automatically), or pass ``False``
    and manage the exploded frame externally.
    """
    # the explode feeds BOTH the model counts and the scoring probe —
    # persist it or the corpus re-shingles once per branch (same rule as
    # minhash_lsh_pairs' postings)
    grams = df.select(
        F.col(id_col), F.explode(char_ngram_list(F.lower(F.col(text_col)), n)).alias("__g")
    )
    if cache_intermediate:
        grams = scoped_persist(grams)
    counts = grams.groupBy("__g").agg(F.count("*").cast("long").alias("__c"))
    totals = counts.agg(
        F.sum("__c").cast("long").alias("__tot"),
        F.count("*").cast("long").alias("__v"),
    )
    model = counts.join(totals).select(
        "__g",
        F.round(
            F.log(
                (F.col("__c") + 1).cast("double") / (F.col("__tot") + F.col("__v"))
            ),
            6,
        ).alias("__lp"),
    )
    scored = grams.join(F.broadcast(model), "__g")
    return scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_grams"),
        F.round(
            F.sum(F.round(F.col("__lp") * 1_000_000).cast("long"))
            / (F.count("*") * F.lit(1_000_000.0)),
            6,
        ).alias("mean_logprob"),
    )


def hashed_ngram_buckets(
    col: Column, *, n_buckets: int = 1 << 18, seed: str = "qcls"
) -> Column:
    """Hashed uni+bi-gram feature buckets (array<long>) — the fastText
    input layer: every token and every adjacent token pair hashes into a
    fixed ``n_buckets``-dim space.  Pure Catalyst (tokens + the shifted-
    slice bigram build + md5), no shuffle, no UDF; collisions are part of
    the model (the hashing trick), not an error.
    """
    toks = tokens(F.lower(col))
    grams = F.concat(toks, _gram_array(toks, 2))
    # 32-bit base hash (n_hex=8): the bucket space is <= 2^20, so 32 bits
    # of md5 are plenty and the conv() parse is half the width
    return F.transform(
        grams,
        lambda g: F.pmod(
            md5_long(F.concat(F.lit(seed + ":"), g), 8), F.lit(n_buckets)
        ),
    )


def _bucket_weight_int(b: Column) -> Column:
    """Deterministic pseudo-weight for a feature bucket, as an integer in
    [-1e6, 1e6]: a Knuth multiplicative hash of the bucket id.  Pure
    63-bit-safe BIGINT arithmetic (b < 2^20, so b * 2654435761 < 2^52 —
    no overflow in ANY engine), which makes it ~2x cheaper than a second
    md5 per gram and exactly reproducible in SQL for the oracle."""
    return F.pmod(b * F.lit(2654435761) + F.lit(12345), F.lit(2000001)) - F.lit(
        1000000
    )


def hashed_linear_columns(
    col: Column, *, n_buckets: int = 1 << 18, seed: str = "qcls"
) -> list[Column]:
    """fastText-style linear quality score with hash-derived weights:
    ``quality_logit`` = mean over hashed uni+bi-gram buckets of a
    deterministic weight in [-1, 1] (six-decimal rational, so the per-doc
    sum is EXACT integer arithmetic — partial-sum order can't perturb a
    cross-engine hash), plus ``n_features`` and a ``keep`` flag at 0.

    The derived weights make the full scoring path (hash -> bucket ->
    weight lookup -> mean) oracle-checkable; swap in trained weights with
    ``apply_linear_classifier``, which broadcast-joins a real weight table
    over the same buckets.  Entirely map-side either way — at 100 TB the
    classifier adds zero shuffles to a curation pass.
    """
    toks = tokens(F.lower(col))
    grams = F.concat(toks, _gram_array(toks, 2))

    def gram_weight(g: Column) -> Column:
        bucket = F.pmod(
            md5_long(F.concat(F.lit(seed + ":"), g), 8), F.lit(n_buckets)
        )
        return _bucket_weight_int(bucket)

    # ONE fused aggregate pass (hash -> bucket -> weight -> sum inside the
    # fold) instead of materializing bucket and weight arrays per doc —
    # measured 1.5x faster than transform+transform+aggregate at sf0.1
    n = F.size(grams)
    total = F.aggregate(
        grams, F.lit(0).cast("long"), lambda acc, g: acc + gram_weight(g)
    )
    logit = F.round(total / (n.cast("double") * 1000000.0), 6)
    return [
        n.cast("long").alias("n_features"),
        logit.alias("quality_logit"),
        (logit >= 0).alias("keep"),
    ]


def apply_linear_classifier(
    df,
    weights,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1 << 18,
    seed: str = "qcls",
    bias: float = 0.0,
):
    """Score documents with a TRAINED linear classifier: ``weights`` is a
    (bucket long, weight double) table — the export format of a
    fastText/logistic model over the same hashing-trick features.

    Plan shape: one explode of the per-doc bucket array, a BROADCAST join
    against the weight table (even a 2^20-bucket model is ~8 MB), and one
    groupBy(id) — a single shuffle keyed by document id.  Unmatched
    buckets contribute 0 (sparse model).  Emits (id, n_features,
    quality_logit); parity with ``hashed_linear_columns`` when fed that
    path's md5 weights is pinned by a test.
    """
    exploded = df.select(
        F.col(id_col),
        F.explode(
            hashed_ngram_buckets(F.col(text_col), n_buckets=n_buckets, seed=seed)
        ).alias("bucket"),
    )
    joined = exploded.join(F.broadcast(weights), "bucket", "left")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_features"),
            F.sum(F.coalesce("weight", F.lit(0.0))).alias("__sum"),
        )
        .select(
            id_col,
            "n_features",
            F.round(
                F.col("__sum") / F.col("n_features") + F.lit(bias), 6
            ).alias("quality_logit"),
        )
    )


def readability_columns(col: Column) -> list[Column]:
    """Flesch-style readability signals: sentence count (runs of ``.!?``),
    word count, approximate syllable count (vowel GROUPS per word — the
    standard dictionary-free approximation), and the reading-ease score
    ``206.835 - 1.015*(words/sentences) - 84.6*(syllables/words)``.

    All counts are exact integers from regexp_count (pure Catalyst, no
    UDF, no shuffle); the score divides exact integers and rounds to 6 dp,
    so it is bit-identical cross-engine.  Long low-score documents are a
    standard pretraining quality cut alongside the Gopher gates.
    """
    n_sentences = F.greatest(
        F.regexp_count(col, F.lit(r"[.!?]+")), F.lit(1)
    ).cast("long")
    n_words = F.greatest(token_count(col), F.lit(1)).cast("long")
    # vowel groups, lowercased: "beautiful" -> eau+i+u = 3
    n_syllables = F.greatest(
        F.regexp_count(F.lower(col), F.lit(r"[aeiouy]+")), F.lit(1)
    ).cast("long")
    ease = F.round(
        F.lit(206.835)
        - F.lit(1.015) * (n_words / n_sentences)
        - F.lit(84.6) * (n_syllables / n_words),
        6,
    )
    return [
        n_sentences.alias("n_sentences"),
        n_words.alias("n_words"),
        n_syllables.alias("n_syllables"),
        ease.alias("reading_ease"),
    ]


def bm25_topk(
    df,
    query_terms: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
):
    """BM25 retrieval scoring against a fixed query-term list — the
    classic lexical ranker (Robertson/Sparck Jones; reference exposes the
    corpus-statistic machinery via its scan+agg surface, this composes it
    into the end ranker).  Returns the global top-``k`` docs as
    (id, score, rank), ties broken by id asc.

    Determinism contract (what lets a float ranker sit under a hash
    oracle): every input to the float math is an exact integer — per-term
    tf comes from a conditional count (no double summation), avg doc
    length is carried as the exact pair (sum_dl, n_docs) so ``dl/avgdl``
    is the single division ``dl*n_docs/sum_dl`` — and the per-term score
    terms are added in the FIXED order of ``query_terms`` (an explicit
    left-associated expression, never a groupBy-sum over doubles whose
    addition order is partition-dependent).

    Scale shape: one token explode feeds ONE hash agg on doc_id carrying
    dl + every per-term tf as conditional counts (one shuffle total);
    corpus stats (sum_dl, n_docs, per-term df) are ONE 1-row agg
    broadcast back; the global top-k is orderBy+limit = TakeOrdered,
    never a single-partition window (the rank column is stamped on the
    already-materialized k rows).
    """
    from pyspark.sql import functions as _F

    toks = df.select(
        _F.col(id_col),
        _F.explode(tokens(_F.lower(_F.col(text_col)))).alias("term"),
    ).filter(_F.col("term") != "")
    base = toks.groupBy(id_col).agg(
        _F.count("*").cast("long").alias("__dl"),
        *[
            _F.sum((_F.col("term") == t).cast("long"))
            .cast("long")
            .alias(f"__tf_{i}")
            for i, t in enumerate(query_terms)
        ],
    )
    stats = base.agg(
        _F.sum("__dl").cast("long").alias("__sum_dl"),
        _F.count("*").cast("long").alias("__n_docs"),
        *[
            _F.sum((_F.col(f"__tf_{i}") > 0).cast("long"))
            .cast("long")
            .alias(f"__df_{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = base.crossJoin(_F.broadcast(stats))
    # idf_t = ln(1 + (N - df + 0.5)/(df + 0.5)); tf norm with exact
    # dl*N/sum_dl for dl/avgdl.  Left-associated fixed-order sum.
    score = _F.lit(0.0)
    for i in range(len(query_terms)):
        tf = _F.col(f"__tf_{i}").cast("double")
        dfq = _F.col(f"__df_{i}").cast("double")
        n_docs = _F.col("__n_docs").cast("double")
        rel_dl = (
            _F.col("__dl").cast("double")
            * _F.col("__n_docs").cast("double")
            / _F.col("__sum_dl").cast("double")
        )
        idf = _F.log(
            _F.lit(1.0) + (n_docs - dfq + _F.lit(0.5)) / (dfq + _F.lit(0.5))
        )
        score = score + idf * (
            tf
            * _F.lit(k1 + 1.0)
            / (tf + _F.lit(k1) * (_F.lit(1.0 - b) + _F.lit(b) * rel_dl))
        )
    ranked = (
        scored.select(id_col, _F.round(score, 6).alias("score"))
        .orderBy(_F.col("score").desc(), _F.col(id_col).asc())
        .limit(k)
    )
    from pyspark.sql import Window as _W

    w = _W.orderBy(_F.col("score").desc(), _F.col(id_col).asc())
    return ranked.withColumn("rank", _F.row_number().over(w).cast("int"))


def term_pmi(
    df,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_vocab: int = 64,
    min_pair_count: int = 5,
):
    """Term co-occurrence PMI lift over document-level presence — which
    term pairs appear in the same document more often than chance (query
    expansion / topic-pair mining).  INTEGER-EXACT: emits the raw counts
    plus ``lift_ppm = (c_ab * N * 1e6) div (c_a * c_b)`` — floor division
    of exact bigints, so the iterative-free ranking is hash-identical in
    any engine (the float ``pmi = ln(lift)`` is monotone in it; callers
    who want nats apply log themselves).

    Scale shape: vocabulary = top ``max_vocab`` terms by doc-freq
    (orderBy+limit = TakeOrdered, then BROADCAST back), so the per-doc
    self-join is bounded at |vocab| terms/doc — never an unbounded
    all-token pair explosion.  Pair counting is one hash agg on
    (term_a, term_b).

    Overflow note: c_ab*N*1e6 needs N·N·1e6 < 2^63, i.e. N ≲ 3e6 docs at
    full co-occurrence; above that switch the lift to DECIMAL(38,0) or
    double — kept bigint here because exactness is what the verification
    gate buys.
    """
    from pyspark.sql import functions as _F

    dt = (
        df.select(
            _F.col(id_col).alias("doc"),
            _F.explode(
                _F.array_distinct(tokens(_F.lower(_F.col(text_col))))
            ).alias("term"),
        )
        .filter(_F.col("term") != "")
    )
    dfreq = dt.groupBy("term").agg(_F.count("*").cast("long").alias("c"))
    vocab = dfreq.orderBy(
        _F.col("c").desc(), _F.col("term").asc()
    ).limit(max_vocab)
    n_docs = df.agg(_F.count("*").cast("long").alias("n_docs"))
    dv = dt.join(_F.broadcast(vocab), "term").select("doc", "term", "c")
    a = dv.select(
        "doc", _F.col("term").alias("term_a"), _F.col("c").alias("c_a")
    )
    bb = dv.select(
        "doc", _F.col("term").alias("term_b"), _F.col("c").alias("c_b")
    )
    pairs = (
        a.join(bb, "doc")
        .filter(_F.col("term_a") < _F.col("term_b"))
        .groupBy("term_a", "term_b", "c_a", "c_b")
        .agg(_F.count("*").cast("long").alias("c_ab"))
        .filter(_F.col("c_ab") >= min_pair_count)
    )
    return pairs.crossJoin(_F.broadcast(n_docs)).select(
        "term_a",
        "term_b",
        "c_ab",
        "c_a",
        "c_b",
        _F.expr("(c_ab * n_docs * 1000000) div (c_a * c_b)")
        .cast("long")
        .alias("lift_ppm"),
    )


def rake_keywords(
    df,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords: tuple = STOPWORDS["en"],
    k: int = 15,
):
    """RAKE keyword extraction (Rose et al.): candidate phrases are the
    maximal stopword-free token runs; each word scores degree/frequency
    over the candidate corpus and a phrase scores the sum of its word
    scores.  Returns the global top-``k`` distinct phrases as
    (phrase, n_words, n_occurrences, score_ppm), ties by phrase asc.

    INTEGER-EXACT for the hash gate: word scores are
    ``floor(degree * 1e6 / freq)`` bigints and phrase scores sum them —
    no float division anywhere.

    Scale shape: one posexplode feeds a per-doc cumulative-stopword
    window (KEYED by doc — never global) that assigns phrase ids; phrase
    assembly and word stats are hash aggs; the word-score table is
    vocabulary-sized and BROADCASTS back onto phrase words; the global
    top-k is orderBy+limit = TakeOrdered.
    """
    from pyspark.sql import Window as _W
    from pyspark.sql import functions as _F

    toks = df.select(
        _F.col(id_col).alias("doc"),
        _F.posexplode(tokens(_F.lower(_F.col(text_col)))).alias("pos", "word"),
    ).withColumn(
        "stop",
        _F.col("word").isin(list(stopwords)) | (_F.col("word") == ""),
    )
    w = _W.partitionBy("doc").orderBy("pos")
    pw = (
        toks.withColumn("phrase_id", _F.sum(_F.col("stop").cast("int")).over(w))
        .filter(~_F.col("stop"))
        .select("doc", "phrase_id", "pos", "word")
    )
    phrases = pw.groupBy("doc", "phrase_id").agg(
        _F.count("*").cast("long").alias("plen"),
        _F.array_join(
            _F.transform(
                _F.array_sort(_F.collect_list(_F.struct("pos", "word"))),
                lambda s: s["word"],
            ),
            " ",
        ).alias("phrase"),
    )
    enriched = pw.join(phrases.select("doc", "phrase_id", "plen"), ["doc", "phrase_id"])
    word_scores = (
        enriched.groupBy("word")
        .agg(
            _F.count("*").cast("long").alias("freq"),
            _F.sum("plen").cast("long").alias("deg"),
        )
        .select("word", _F.expr("(deg * 1000000) div freq").alias("wscore"))
    )
    phrase_scores = (
        pw.join(_F.broadcast(word_scores), "word")
        .groupBy("doc", "phrase_id")
        .agg(_F.sum("wscore").cast("long").alias("score_ppm"))
    )
    return (
        phrases.join(phrase_scores, ["doc", "phrase_id"])
        .groupBy("phrase")
        .agg(
            _F.max("plen").cast("long").alias("n_words"),
            _F.count("*").cast("long").alias("n_occurrences"),
            _F.max("score_ppm").cast("long").alias("score_ppm"),
        )
        .orderBy(_F.col("score_ppm").desc(), _F.col("phrase").asc())
        .limit(k)
    )
