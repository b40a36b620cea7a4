"""Statistical-LM quality scoring for corpus curation (CCNet-style).

The CCNet pipeline (Wenzek et al. 2020) scores every crawled document
by the perplexity of a small language model trained on a trusted corpus
(Wikipedia) and keeps the low-perplexity tail — the single most widely
copied quality signal in LLM data curation after rule-based filters.
This module is the Spark-first form of that signal: n-gram models as
DataFrames, scoring as one broadcast join + one partial-aggregated
groupBy per document set.

Scale design (the 100 TB story):
- the model is vocabulary-bounded, not corpus-bounded: training is one
  explode + partial-agg groupBy whose result is |V| rows regardless of
  corpus size, so it broadcasts;
- scoring joins exploded tokens against the *broadcast* model (no
  shuffle of the corpus on token), then reduces per doc_id — the only
  full shuffle is the per-document aggregation, keyed on doc_id, which
  is as balanced as the input;
- per-token log terms are summed as decimal(28,12), so the aggregate is
  exact and order-independent — the same `_dsum` determinism pattern the
  rest of the repo uses; cross-engine libm ulp noise (≤1e-15 per term)
  is absorbed by the final round().

Determinism contract: same corpus + same train slice → bit-identical
scores on any partitioning and any engine that rounds ln() to ≤1e-12.

No reference parity to cite: brimdata/zinger has no LM scoring; this is
part of the training-data-pipeline suite the engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "train_unigram",
    "train_bigram",
    "merge_unigram",
    "merge_bigram",
    "cross_entropy_unigram",
    "cross_entropy_bigram",
]

# exact, order-independent accumulator for double-valued log terms
_DEC = "decimal(28,12)"


def _tokens(df: DataFrame, text_col: str, *keep: str) -> DataFrame:
    """Whitespace tokens, empty strings dropped (split on the literal
    separator keeps the SQL oracle trivially equivalent)."""
    return (
        df.select(*keep, F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
    )


def train_unigram(train: DataFrame, text_col: str = "text") -> DataFrame:
    """Unigram counts over the trusted slice → DataFrame[w, c].

    One explode + groupBy(w): partial aggregation makes the shuffle
    |V|-bounded per partition, the result |V| rows total.
    """
    return _tokens(train, text_col).groupBy("w").agg(
        F.count(F.lit(1)).alias("c")
    )


def cross_entropy_unigram(
    docs: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    digits: int = 6,
) -> DataFrame:
    """Per-document cross-entropy under an add-one-smoothed unigram LM.

    xent(d) = -(1/|d|) · Σ_w ln( (c(w)+1) / (N+V) )   (nats/token)

    Lower = more like the training slice; CCNet keeps the low tail.
    Returns DataFrame[id_col, n_tokens, xent] with xent rounded to
    `digits` (exact decimal summation underneath — see module doc).
    """
    # |V|-bounded; consumed by the scalar (N, V) aggregate AND the
    # broadcast score join — cut the plan so the training pass over the
    # trusted slice runs once, not once per consumer (r12, guide §5)
    model = model.localCheckpoint(eager=False)
    n_total, v_size = model.agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("v")
    ).first()[:2]
    if n_total is None:
        raise ValueError(
            "cross_entropy_unigram: empty language model (the training "
            "slice produced no tokens) — train on a non-empty slice"
        )
    denom = float(n_total + v_size)
    tok = _tokens(docs, text_col, id_col)
    joined = tok.join(F.broadcast(model), "w", "left")
    term = -F.log(
        (F.coalesce(F.col("c"), F.lit(0)) + 1).cast("double") / F.lit(denom)
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(term.cast(_DEC)).alias("__s"),
        )
        .select(
            id_col,
            "n_tokens",
            F.round(
                F.col("__s").cast("double") / F.col("n_tokens"), digits
            ).alias("xent"),
        )
    )


def merge_unigram(*models: DataFrame) -> DataFrame:
    """Merge unigram models by count addition — the same mergeability
    algebra as the sketch suite, so a 100 TB model builds as per-shard
    models merged pairwise (or per-ingest-batch: keep a model sidecar
    next to the pool and ADD each micro-batch's counts; addition is
    associative + commutative, replay-idempotence comes from the
    batch's txn guard exactly like the HLL sidecar).  Merged-model
    scores are identical to training once on the concatenated corpus —
    count addition is exact, there is no approximation to compound."""
    if not models:
        raise ValueError("merge_unigram needs at least one model")
    out = models[0]
    for m in models[1:]:
        out = out.unionByName(m)
    return out.groupBy("w").agg(F.sum("c").alias("c"))


def merge_bigram(*models: DataFrame) -> DataFrame:
    """Bigram-model merge; same exact count-addition algebra."""
    if not models:
        raise ValueError("merge_bigram needs at least one model")
    out = models[0]
    for m in models[1:]:
        out = out.unionByName(m)
    return out.groupBy("w1", "w2").agg(F.sum("c").alias("c"))


def train_bigram(train: DataFrame, text_col: str = "text") -> DataFrame:
    """Bigram counts → DataFrame[w1, w2, c].  Same bounded-shuffle shape
    as the unigram pass: adjacent pairs come from zip_with over the
    token array (pure JVM), so no positional self-join is needed."""
    pairs = train.select(
        F.explode(
            F.expr(
                f"zip_with(slice(split({text_col}, ' '), 1,"
                f" greatest(size(split({text_col}, ' ')) - 1, 0)),"
                f" slice(split({text_col}, ' '), 2,"
                f" greatest(size(split({text_col}, ' ')) - 1, 0)),"
                " (x, y) -> struct(x AS w1, y AS w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2").filter((F.col("w1") != "") & (F.col("w2") != ""))
    return pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))


def cross_entropy_bigram(
    docs: DataFrame,
    unigram: DataFrame,
    bigram: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.9,
    digits: int = 6,
) -> DataFrame:
    """Interpolated bigram cross-entropy:

    p(w2|w1) = λ · c(w1,w2)/c(w1) + (1-λ) · (c(w2)+1)/(N+V)

    The MLE bigram term backs off to the smoothed unigram through the
    interpolation, so unseen histories score finite.  Both model sides
    broadcast; the corpus is never shuffled on token.
    """
    # the unigram model has THREE consumers (the scalar (N, V)
    # aggregate and the w1/w2 broadcast legs) — without this cut each
    # re-runs the trusted-slice training pass (r12 plan audit, guide §5)
    unigram = unigram.localCheckpoint(eager=False)
    n_total, v_size = unigram.agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("v")
    ).first()[:2]
    if n_total is None:
        raise ValueError(
            "cross_entropy_bigram: empty unigram model (the training "
            "slice produced no tokens) — train on a non-empty slice"
        )
    denom = float(n_total + v_size)
    pairs = docs.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"zip_with(slice(split({text_col}, ' '), 1,"
                f" greatest(size(split({text_col}, ' ')) - 1, 0)),"
                f" slice(split({text_col}, ' '), 2,"
                f" greatest(size(split({text_col}, ' ')) - 1, 0)),"
                " (x, y) -> struct(x AS w1, y AS w2))"
            )
        ).alias("p"),
    ).select(id_col, "p.w1", "p.w2").filter(
        (F.col("w1") != "") & (F.col("w2") != "")
    )
    uni1 = unigram.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    uni2 = unigram.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    big = bigram.select("w1", "w2", F.col("c").alias("c12"))
    joined = (
        pairs.join(F.broadcast(big), ["w1", "w2"], "left")
        .join(F.broadcast(uni1), "w1", "left")
        .join(F.broadcast(uni2), "w2", "left")
    )
    p_big = F.when(
        F.col("c1").isNotNull() & F.col("c12").isNotNull(),
        F.col("c12").cast("double") / F.col("c1").cast("double"),
    ).otherwise(F.lit(0.0))
    p_uni = (F.coalesce(F.col("c2"), F.lit(0)) + 1).cast("double") / F.lit(denom)
    term = -F.log(F.lit(lam) * p_big + F.lit(1.0 - lam) * p_uni)
    return (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(term.cast(_DEC)).alias("__s"),
        )
        .select(
            id_col,
            "n_bigrams",
            F.round(
                F.col("__s").cast("double") / F.col("n_bigrams"), digits
            ).alias("xent"),
        )
    )
