"""DSIR data selection: importance resampling over hashed n-gram
features (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling", NeurIPS — the standard recipe for pulling a
target-domain-like training subset out of a huge raw corpus).

Method: featurize every document as hashed unigram+bigram counts in a
FIXED bucket space (|B| buckets), fit two smoothed bag-of-buckets
models — one on a small TARGET corpus (the domain you want more of),
one on the RAW corpus — and score each raw document with its
log-importance weight

    w(d) = Σ_{g in grams(d)}  ln p_target(bucket(g)) - ln p_raw(bucket(g))

then resample the raw corpus by those weights (DSIR proper adds Gumbel
noise for sampling WITHOUT replacement; the deterministic variant
selects top-k by weight — see ``gumbel_key`` for the sampled form).

Spark realization — every stage is partial-aggregated column algebra:

  * featurize: split + zip_with bigrams + md5-hash to buckets, one
    explode.  Feature space is FIXED (|B| rows per model) regardless of
    corpus size — the models broadcast at any scale.
  * models: one groupBy(bucket) count per corpus; the shuffle is
    |B|-bounded per partition by partial aggregation.
  * weights: explode + two broadcast joins + one groupBy(doc).  The
    per-gram terms sum in DECIMAL(28,12) (exact, order-independent —
    distributed float summation would make the result partitioning-
    dependent, operators/lm.py's rule), rounded on output.
  * at 100 TB: the raw-corpus model is one partial-agg scan; weights
    are one more scan with two broadcast hash joins — no shuffle grows
    past |B| except the final per-doc groupBy, keyed by the id the
    corpus is already partitioned by.

The bucket hash is md5-based (functions.text.md5_hash60) so the DuckDB
oracle reproduces the exact bucket ids, counts, and weights.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.text import md5_hash60

_DEC = "decimal(28,12)"

DEFAULT_BUCKETS = 4096


def hashed_grams(text: Column) -> Column:
    """Unigrams + bigrams of whitespace tokens, as ONE string array
    (bigrams joined with a space).  Split on the literal separator so
    the SQL oracle is trivially equivalent; empties filtered."""
    toks = F.filter(F.split(text, " "), lambda w: w != "")
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def feature_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """DataFrame[id_col, b]: one row per (document, gram occurrence),
    gram hashed into the fixed bucket space."""
    return df.select(
        id_col, F.explode(hashed_grams(F.col(text_col))).alias("g")
    ).select(id_col, F.pmod(md5_hash60(F.col("g")), F.lit(n_buckets)).alias("b"))


def bucket_model(features: DataFrame) -> DataFrame:
    """Bag-of-buckets counts: DataFrame[b, c] (<= n_buckets rows)."""
    return features.groupBy("b").agg(F.count(F.lit(1)).alias("c"))


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
    digits: int = 6,
) -> DataFrame:
    """Per-document log-importance weights of ``raw`` toward
    ``target``: DataFrame[id_col, n_grams, w], w rounded to ``digits``
    (exact decimal summation underneath).  Add-one smoothing on both
    models, so unseen buckets contribute the same finite floor to both
    sides."""
    # Featurize each corpus ONCE.  Without the cut, the raw-corpus
    # explode+hash (the expensive pass) runs 3x per action — as the
    # final join's probe side, inside the broadcast r_model build, and
    # for the n_r scalar — and the target explode runs twice (r12
    # optimization: plans/r12/dsir_select_before.txt shows all three
    # Generate subtrees).  feats is (id, int bucket) — narrow rows, one
    # per gram occurrence — so the cache is a small fraction of the
    # input corpus; t_model is <= n_buckets rows.
    #
    # persist(), not localCheckpoint (r13, measured): the checkpoint
    # swap the r12 advice suggested was tried and REJECTED here —
    # same-session A/B at sf0.1 (reps=5 medians): persist 1.71/1.61 s
    # (select/gumbel) vs lazy checkpoint 2.72/2.75 s and eager
    # checkpoint 3.11/3.05 s.  feats is gram-occurrence-sized, and the
    # SQL cache stores it as compressed COLUMNAR batches while a
    # localCheckpoint writes java-serialized row blocks — 1.6-1.8x on
    # the whole query.  (The narrow bounded frames dedup._materialize
    # cuts don't show this; frame size decides.)  The advice's
    # stale-reuse concern is handled by consumers, not here: a dropped
    # block is recomputed, never silently wrong, and the bench releases
    # all persistent blocks between timed actions so reps stay cold.
    feats = feature_buckets(raw, text_col, id_col, n_buckets).persist()
    t_model = bucket_model(
        feature_buckets(target, text_col, id_col, n_buckets)
    ).persist()
    r_model = bucket_model(feats)
    n_t = (t_model.agg(F.sum("c")).first()[0] or 0) + n_buckets
    # sum of per-bucket counts == number of feature rows: count() the
    # (now cached) feats directly instead of re-aggregating them
    n_r = feats.count() + n_buckets
    joined = (
        feats.join(F.broadcast(t_model.withColumnRenamed("c", "ct")), "b", "left")
        .join(F.broadcast(r_model.withColumnRenamed("c", "cr")), "b", "left")
    )
    term = F.log(
        (F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double") / F.lit(float(n_t))
    ) - F.log(
        (F.coalesce(F.col("cr"), F.lit(0)) + 1).cast("double") / F.lit(float(n_r))
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(term.cast(_DEC)).alias("__s"),
        )
        .select(
            id_col,
            "n_grams",
            F.round(F.col("__s").cast("double"), digits).alias("w"),
        )
    )


def gumbel_key(w: Column, id_col: Column, seed: int = 7) -> Column:
    """DSIR's sampling-without-replacement key: w + Gumbel(0,1) noise,
    the noise derived DETERMINISTICALLY from a seeded hash of the id
    (top-k by this key == one reproducible importance resample; Xie et
    al. §2.2 / the Gumbel-top-k trick).  Uniform u in (0,1) comes from
    the 60-bit md5 hash, so a re-run — or the DuckDB oracle — draws the
    identical noise."""
    u = (
        md5_hash60(F.concat(id_col.cast("string"), F.lit(f":{seed}")))
        .cast("double")
        / F.lit(float(1 << 60))
    )
    # clamp away u=0; -ln(-ln(u)) is the standard Gumbel transform
    return w + -F.log(-F.log(F.greatest(u, F.lit(1e-18))))
