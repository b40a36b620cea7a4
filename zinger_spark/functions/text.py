"""Text-analysis column functions for large-scale training-data pipelines.

Everything here is a pure Spark SQL expression (whole-stage codegen,
no Python UDFs), deliberately built from primitives that exist in BOTH
Spark and DuckDB (md5, regexp ops, array lambdas) so the driver's
DuckDB oracle can replicate results bit-for-bit.

Design note for 100 TB: these are per-row narrow transformations — no
shuffle, fully pipelined into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Stopword lists for the n-gram/stopword language-ID heuristic.  Small
# on purpose: they are compiled into the expression (no broadcast
# needed); a production list would ship as a broadcast map.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ein", "zu", "den", "nicht", "ist", "mit"),
    "es": ("el", "la", "de", "que", "y", "los", "en", "un", "una", "por"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une", "dans", "pour"),
    "zh": ("的", "了", "是", "我", "不", "在", "有", "人", "这", "他"),
}
# Deterministic tie-break order (first wins on equal score).
LANG_ORDER = ("en", "de", "es", "fr", "zh")

PUNCT_CLASS = "[.,!?;:]"  # explicit set: identical regex semantics in both engines


def tokens(text: Column) -> Column:
    """Whitespace tokenization of trimmed, lowercased text."""
    return F.split(F.trim(F.lower(text)), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(text), r"\s+"))
    )


def bpe_ish_token_count(text: Column) -> Column:
    """A BPE-ish subword proxy: count alternating letter-runs, digit-runs
    and single punctuation marks — the standard pre-tokenizer regex shape."""
    return F.size(
        F.regexp_extract_all(text, F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"), 1)
    )


def punct_ratio(text: Column) -> Column:
    """Fraction of characters in the explicit punctuation set."""
    n = F.length(text)
    p = n - F.length(F.regexp_replace(text, PUNCT_CLASS, ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(p.cast("double") / n.cast("double"))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords (quality signal)."""
    words = list(LANG_STOPWORDS[lang])
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(*words)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / F.size(toks).cast("double")
    )


def _stopword_hits(toks: Column, words: tuple[str, ...]) -> Column:
    # NB: the lambda must take exactly one arg — F.filter treats a
    # two-arg lambda (even with defaults) as the (element, index) form.
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword hit counts."""
    toks = tokens(text)
    return {
        lang: _stopword_hits(toks, words) for lang, words in LANG_STOPWORDS.items()
    }


def lang_id(text: Column) -> Column:
    """Argmax language with deterministic first-wins tie-break over
    LANG_ORDER; 'und' when no stopword hits at all."""
    scores = lang_scores(text)
    chain = None
    for i, lang in enumerate(LANG_ORDER):
        cond = None
        for j, other in enumerate(LANG_ORDER):
            if other == lang:
                continue
            # strictly greater than earlier-in-order langs, >= later ones
            c = scores[lang] > scores[other] if j < i else scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        chain = F.when(cond, F.lit(lang)) if chain is None else chain.when(cond, F.lit(lang))
    best = chain.otherwise(F.lit("und"))
    total = None
    for lang in LANG_ORDER:
        total = scores[lang] if total is None else total + scores[lang]
    return F.when(total == 0, F.lit("und")).otherwise(best)


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + low punctuation +
    reasonable mean word length. Weights are arbitrary but fixed."""
    n = F.length(text)
    tc = token_count(text)
    mean_wl = F.when(tc == 0, F.lit(0.0)).otherwise(
        (n - tc + 1).cast("double") / tc.cast("double")
    )
    len_ok = F.when((n >= 100) & (n <= 20000), F.lit(1.0)).otherwise(
        F.when(n >= 20, F.lit(0.5)).otherwise(F.lit(0.0))
    )
    punct_ok = F.when(punct_ratio(text) <= 0.1, F.lit(1.0)).otherwise(F.lit(0.0))
    wl_ok = F.when((mean_wl >= 2.0) & (mean_wl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round((0.4 * len_ok + 0.3 * punct_ok + 0.3 * wl_ok), 4)


def md5_hash60(col: Column) -> Column:
    """Deterministic 60-bit integer hash: first 15 hex digits of md5.

    md5 exists in both Spark and DuckDB, so oracle SQL can reproduce the
    exact value:   CAST(('0x' || substr(md5(x),1,15)) AS BIGINT).
    Hot paths that do not need oracle parity should use xxhash64.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def fingerprint(text: Column) -> Column:
    """Document fingerprint: 60-bit hash of whitespace-normalized,
    lowercased text (the rolling-hash use case collapsed to one stable
    content hash; near-dup detection uses shingles/minhash instead)."""
    normalized = F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")
    return md5_hash60(normalized)


def word_shingles(text: Column, k: int = 5) -> Column:
    """Distinct word k-gram shingles (space-joined) — the input to
    minhash / jaccard near-dup. JVM-side: sequence + transform + slice.

    The tokenization is let-bound through a single-element-array
    ``transform`` so the regex split runs ONCE per row: written
    directly, ``toks`` appears 4x in the expression tree and the split
    is re-evaluated per occurrence (higher-order subtrees fall back to
    interpreted eval, outside codegen subexpression elimination) —
    measured 3x slower on an explode-heavy scan at sf0.1."""

    def shingles(toks: Column) -> Column:
        n = F.size(toks)
        grams = F.transform(
            F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        )
        # Shorter-than-k docs: single shingle of the whole text.
        return F.array_distinct(
            F.when(n < k, F.array(F.concat_ws(" ", toks))).otherwise(grams)
        )

    return F.element_at(F.transform(F.array(tokens(text)), shingles), 1)


# ---------------------------------------------------------------------------
# chunking / scrubbing / repetition (r5)

def chunk_spans(
    text: Column,
    chunk_tokens: int = 64,
    stride: int = 48,
    toks: Column | None = None,
) -> Column:
    """Sliding token-window chunking: array of (chunk_idx, start_tok,
    chunk) structs, window ``chunk_tokens`` wide advancing by ``stride``
    (overlap = chunk_tokens - stride, the long-document training prep).
    Pure JVM array ops (sequence + slice + concat_ws), no shuffle; at
    100 TB this pipelines into the scan and the downstream explode sets
    parallelism = chunks.

    Pass ``toks`` as a PROJECTED column for long documents: the token
    expression is referenced inside the chunk lambda, and an outer
    expression in a HOF lambda body re-evaluates per element — with the
    default inline split that is one split per chunk, O(n²/stride) per
    doc."""
    if toks is None:
        toks = tokens(text)
    n = F.size(toks)
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        (F.ceil((n - F.lit(chunk_tokens)).cast("double") / F.lit(stride))).cast("int")
        + 1
    )
    return F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_idx"),
            (i * stride).cast("int").alias("start_tok"),
            F.concat_ws(" ", F.slice(toks, i * stride + 1, chunk_tokens)).alias(
                "chunk"
            ),
        ),
    )


# Conservative ASCII patterns, valid under BOTH Java regex (Spark) and
# RE2 (DuckDB): no backrefs, no lookaround.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
URL_RE = "https?://[^ \\t\\n]+"
PHONE_RE = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"


def count_matches(text: Column, pattern: str) -> Column:
    """Occurrences of a regex in text (JVM-side regexp_count)."""
    return F.regexp_count(text, F.lit(pattern))


def scrub_pii(text: Column) -> Column:
    """Replace emails, then URLs, then phone-shaped digit runs with
    typed placeholder tokens — the pre-training privacy scrub pass.
    Order matters (emails contain dots that the URL pattern must not
    eat; phone last so it cannot fire inside an address)."""
    scrubbed = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    scrubbed = F.regexp_replace(scrubbed, URL_RE, "<URL>")
    return F.regexp_replace(scrubbed, PHONE_RE, "<PHONE>")


def repetition_ratio(text: Column) -> Column:
    """1 - distinct/total tokens: near 0 = diverse text, near 1 =
    degenerate repetition (the boilerplate/spam filter signal)."""
    toks = tokens(text)
    n = F.size(toks)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.round(
            1.0 - F.size(F.array_distinct(toks)).cast("double") / n.cast("double"),
            6,
        )
    )


def top_token_ratio(text: Column) -> Column:
    """Frequency share of the most common token — the complementary
    repetition signal (a doc can have many distinct tokens yet be 50%
    one word).  Single O(n log n) pass per row: sort the token array,
    then one aggregate fold tracking the longest equal-run.  The lambda
    body touches only its own variables — referencing an outer
    expression (e.g. the token split) inside a higher-order-function
    lambda re-evaluates it per element, turning the fold quadratic."""
    toks = tokens(text)
    n = F.size(toks)
    acc0 = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )
    top = F.aggregate(
        F.array_sort(toks),
        acc0,
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc.getField("prev"), acc.getField("run") + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            F.greatest(
                acc.getField("best"),
                F.when(x == acc.getField("prev"), acc.getField("run") + 1).otherwise(
                    F.lit(1).cast("long")
                ),
            ).alias("best"),
        ),
        lambda acc: acc.getField("best"),
    )
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.round(top.cast("double") / n.cast("double"), 6)
    )


# ---------------------------------------------------------------------------
# Gopher-style document-shape metrics (r6)
#
# The repetition/format signals of Rae et al. 2021 (Gopher, table A1) as
# pure JVM array/string expressions — the standard pre-training quality
# rule pack.  Every metric is shuffle-free and pipelined into the scan;
# the composite pass/fail lives in the registry query so thresholds
# stay visible next to the oracle SQL.


def occurrence_count(text: Column, literal: str) -> Column:
    """Non-overlapping occurrences of a literal substring via
    replace-length arithmetic — identical semantics in Spark and DuckDB
    (both oracles use the same (len - len(replace))/len(sub) form)."""
    removed = F.length(text) - F.length(F.replace(text, F.lit(literal), F.lit("")))
    return (removed / len(literal)).cast("long")


def mean_word_length(text: Column) -> Column:
    """Average character length of whitespace tokens (Gopher keeps docs
    with mean word length in [3, 10])."""
    toks = tokens(text)
    n = F.size(toks)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.round(total.cast("double") / n.cast("double"), 6)
    )


def alpha_word_ratio(text: Column) -> Column:
    """Fraction of tokens containing at least one alphabetic character
    (Gopher requires > 0.8; tokens() lowercases, so [a-z] suffices)."""
    toks = tokens(text)
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.round(hits.cast("double") / n.cast("double"), 6)
    )


def symbol_word_ratio(text: Column) -> Column:
    """(# + '...' occurrences) per word — Gopher's symbol-to-word ratio
    (reject > 0.1): hashtag spam and ellipsis-heavy scraped text."""
    toks = tokens(text)
    n = F.size(toks)
    syms = occurrence_count(text, "#") + occurrence_count(text, "...")
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.round(syms.cast("double") / n.cast("double"), 6)
    )


def line_shape_stats(text: Column) -> Column:
    """Per-document line-shape signals as one struct:
    n_lines (non-empty, trimmed), dup_line_frac (1 - distinct/total —
    repeated boilerplate lines), bullet_frac (lines starting with
    -, * or •; Gopher rejects > 0.9), ellipsis_frac (lines ending with
    '...' or '…'; reject > 0.3)."""
    lines = F.filter(
        F.transform(F.split(text, "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    n = F.size(lines)
    nd = F.size(F.array_distinct(lines))
    bullets = F.size(F.filter(lines, lambda l: l.rlike("^[-*•]")))
    ells = F.size(
        F.filter(lines, lambda l: l.endswith("...") | l.endswith("…"))
    )
    zero = F.lit(0.0)
    frac = lambda c: F.round(c.cast("double") / n.cast("double"), 6)  # noqa: E731
    return F.struct(
        n.alias("n_lines"),
        F.when(n == 0, zero).otherwise(frac(n - nd)).alias("dup_line_frac"),
        F.when(n == 0, zero).otherwise(frac(bullets)).alias("bullet_frac"),
        F.when(n == 0, zero).otherwise(frac(ells)).alias("ellipsis_frac"),
    )


def top_ngram_char_fraction(text: Column, n: int) -> Column:
    """Fraction of the document's characters covered by its most
    frequent word n-gram (Gopher rejects docs whose top 2-gram covers
    > 0.20, 3-gram > 0.18, 4-gram > 0.16): count(top) * len(top) /
    len(text).  Ties break to the lexicographically smallest gram so
    the DuckDB oracle (ORDER BY cnt DESC, gram ASC) agrees exactly.

    Single O(g log g) pass per row: grams via arrays_zip of n shifted
    slices (every expensive expression sits in ARGUMENT position,
    evaluated once — an outer expression inside a HOF lambda body is
    re-evaluated per element), sorted, then one run-length fold whose
    strictly-greater update keeps the first (= smallest) gram on ties.
    The corpus-scale path is the explode + partial-agg argmax used by
    the registry's gopher_quality query."""
    toks = tokens(text)
    m = F.size(toks)
    g_cnt = F.greatest(m - (n - 1), F.lit(1))
    zipped = F.arrays_zip(*[F.slice(toks, i + 1, g_cnt) for i in range(n)])
    grams = F.transform(
        zipped,
        lambda z: F.concat_ws(" ", *[z.getField(str(j)) for j in range(n)]),
    )
    acc0 = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
        F.lit("").alias("bestg"),
    )

    def _merge(acc, x):
        new_run = (
            F.when(x == acc.getField("prev"), acc.getField("run") + 1)
            .otherwise(F.lit(1).cast("long"))
        )
        better = new_run > acc.getField("best")
        return F.struct(
            x.alias("prev"),
            new_run.alias("run"),
            F.when(better, new_run).otherwise(acc.getField("best")).alias("best"),
            F.when(better, x).otherwise(acc.getField("bestg")).alias("bestg"),
        )

    top = F.aggregate(F.array_sort(grams), acc0, _merge)
    return F.when((m < n) | (F.length(text) == 0), F.lit(0.0)).otherwise(
        F.round(
            (top.getField("best") * F.length(top.getField("bestg"))).cast("double")
            / F.length(text).cast("double"),
            6,
        )
    )


def script_counts(text: Column) -> Column:
    """Per-document Unicode-script character counts (Han, Latin,
    Cyrillic, digits) as a struct — the script-detection signal a
    multilingual curation pipeline routes on (CJK docs to a CJK
    tokenizer, mixed-script spam to review).  Counted via
    replace-length arithmetic; Java's \\p{IsHan} and RE2's \\p{Han}
    classes agree (verified), so the DuckDB oracle reproduces counts
    exactly."""
    def cnt(cls: str) -> Column:
        return F.length(text) - F.length(F.regexp_replace(text, cls, ""))

    return F.struct(
        cnt(r"\p{IsHan}").alias("han"),
        cnt(r"\p{IsLatin}").alias("latin"),
        cnt(r"\p{IsCyrillic}").alias("cyrillic"),
        cnt(r"[0-9]").alias("digit"),
        F.length(text).alias("n_chars"),
    )


def bm25_scores(
    docs,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    digits: int = 6,
):
    """Okapi BM25 of a fixed query against every document — the
    retrieval scorer a curation pipeline uses for benchmark-targeted
    selection, and the exact-rank baseline for the inverted-index path.

    Physical shape (100-TB form): one tokenize projection, ONE 1-row
    corpus-stats aggregate (N, total length, per-term document
    frequencies — all partial-aggregated) broadcast back onto the
    scan, then per-term tf as JVM array filters.  No per-term joins,
    no explode: cost = one scan + |Q| array scans per row.  Engine
    determinism: the only transcendental (ln in idf) is truncated to
    decimal(28,12) and per-term contributions sum as decimals (the
    operators/lm idiom), so scores are bit-stable across engines and
    partitionings.
    """
    dec = "decimal(28,12)"
    toks = tokens(F.col(text_col))
    base = docs.select(F.col(id_col), toks.alias("__toks")).withColumn(
        "__dl", F.size("__toks")
    )
    aggs = [F.count(F.lit(1)).alias("__n_docs"), F.sum("__dl").alias("__dl_sum")]
    for i, t in enumerate(query_terms):
        aggs.append(
            F.sum(F.array_contains("__toks", t).cast("long")).alias(f"__df_{i}")
        )
    joined = base.crossJoin(F.broadcast(base.agg(*aggs)))
    avgdl = F.col("__dl_sum").cast("double") / F.col("__n_docs")
    dl_norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("__dl").cast("double") / avgdl
    )

    def term_eq(term):
        # closure factory: a default-arg lambda would flip F.filter
        # into its (element, index) form (arity is inspected)
        return lambda x: x == F.lit(term)

    contribs = []
    for i, t in enumerate(query_terms):
        tf = F.size(F.filter(F.col("__toks"), term_eq(t))).cast("double")
        df_ = F.col(f"__df_{i}").cast("double")
        idf = (
            F.ln(
                (F.col("__n_docs").cast("double") - df_ + F.lit(0.5))
                / (df_ + F.lit(0.5))
                + F.lit(1.0)
            )
            .cast(dec)
            .cast("double")
        )
        frac = tf * F.lit(k1 + 1.0) / (tf + dl_norm)
        contribs.append((idf * frac).cast(dec))
    total = contribs[0]
    for c in contribs[1:]:
        total = total + c
    return joined.select(
        F.col(id_col),
        F.col("__dl").alias("n_tokens"),
        F.round(total.cast("double"), digits).alias("bm25"),
    )
