"""Similarity search over embedding columns (array<float>).

  brute_force_topk   exact cosine top-k against a query vector —
                     narrow map + TakeOrderedAndProject (no shuffle of
                     the corpus; driver receives only k rows)
  lsh_topk           sign-bucket LSH: restrict the scan to the query's
                     bucket — at scale, bucket becomes a partition/
                     cluster key so the scan prunes to ~1/2^b of files
  embedding_dup_pairs  near-duplicate vector pairs via bucketed join

Cosine is a sequential double-precision fold (functions/vector.py), so
DuckDB's list functions reproduce scores exactly; rank outputs avoid
float comparison entirely.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd  # module-level: string type hints in pandas UDFs
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.vector import (
    as_double,
    cosine,
    cosine_lit,
    dot,
    fold_norm,
    let,
    norm,
    sign_bucket,
)


def _query_lit(query_vec: Sequence[float]):
    return F.array(*[F.lit(float(x)) for x in query_vec])


def brute_force_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine. orderBy+limit compiles to a per-partition
    top-k + single merge (TakeOrderedAndProject) — the right plan at any
    corpus size. Ties broken by id for determinism."""
    scored = df.select(
        F.col(id_col),
        F.round(cosine_lit(F.col(vec_col), query_vec), 8).alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def probe_buckets(
    query_vec: Sequence[float], dims: tuple[int, ...], n_probe: int = 1
) -> list[str]:
    """Deterministic multi-probe sequence: the query's own sign bucket,
    then buckets at Hamming distance 1 ordered by how close the flipped
    dimension's value sits to the sign boundary (|v| ascending — the
    standard multi-probe heuristic: the nearest boundaries are the
    likeliest to have split true neighbors), then distance-2 pairs in
    the same order, until n_probe buckets are listed."""
    import itertools

    qbits = ["1" if float(query_vec[d]) >= 0 else "0" for d in dims]
    order = sorted(range(len(dims)), key=lambda i: (abs(float(query_vec[dims[i]])), i))
    probes = []
    for dist in range(len(dims) + 1):
        for combo in itertools.combinations(order, dist):
            bits = list(qbits)
            for i in combo:
                bits[i] = "0" if bits[i] == "1" else "1"
            probes.append("".join(bits))
            if len(probes) >= n_probe:
                return probes
    return probes


def rrf_fuse(
    runs: Sequence[DataFrame],
    id_col: str = "doc_id",
    k_const: int = 60,
    topk: int = 20,
    digits: int = 8,
) -> DataFrame:
    """Reciprocal-rank fusion of N bounded retrieval runs (Cormack,
    Clarke & Buettcher, SIGIR'09 — the standard hybrid lexical+dense
    combiner): fused(d) = Σ_runs 1/(k + rank_run(d)), ids absent from a
    run contribute 0.

    Each run is a DataFrame with (id_col, ``rank``) where rank is the
    1-based position in that run's ALREADY-BOUNDED candidate list (a
    top-k from TakeOrderedAndProject, typically ≤ a few hundred rows) —
    so every join here is over candidate lists, never the corpus: the
    retrievers do the corpus-sized reduction, fusion is O(Σ|runs|)
    whatever the index size.  Missing ranks surface as 0 in the
    ``rank_i`` output columns (not NULL — keeps the cross-engine value
    hash stable).  Contributions sum in fixed run order as plain double
    expressions (1/(k+r) is a correctly-rounded IEEE division in any
    engine), rounded to ``digits``; the final rank orders by the
    ROUNDED score with id tie-break, so the output is bit-stable across
    engines and partitionings.
    """
    if not runs:
        raise ValueError("rrf_fuse: runs is empty — need at least one retrieval run")
    for i, run in enumerate(runs):
        if "rank" not in run.columns or id_col not in run.columns:
            raise ValueError(
                f"rrf_fuse: run {i} must have columns ({id_col!r}, 'rank'); "
                f"got {run.columns}"
            )
    fused = None
    for i, run in enumerate(runs):
        leg = run.select(
            F.col(id_col), F.col("rank").alias(f"rank_{i}")
        )
        fused = leg if fused is None else fused.join(leg, id_col, "full_outer")
    score = None
    for i in range(len(runs)):
        c = F.when(
            F.col(f"rank_{i}").isNotNull(),
            F.lit(1.0) / (F.lit(float(k_const)) + F.col(f"rank_{i}").cast("double")),
        ).otherwise(F.lit(0.0))
        score = c if score is None else score + c
    scored = fused.select(
        id_col,
        *[
            F.coalesce(F.col(f"rank_{i}"), F.lit(0)).alias(f"rank_{i}")
            for i in range(len(runs))
        ],
        F.round(score, digits).alias("rrf_score"),
    )
    top = scored.orderBy(F.col("rrf_score").desc(), F.col(id_col)).limit(topk)
    w = Window.orderBy(F.col("rrf_score").desc(), F.col(id_col))
    # the rank window runs over the already-reduced topk rows (bounded
    # input — the ann_* keys' audited idiom), never the candidate union
    return top.withColumn("rank", F.row_number().over(w))


def lsh_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dims: tuple[int, ...] = (0, 1, 2, 3, 4, 5, 6, 7),
    n_probe: int = 1,
) -> DataFrame:
    """Approximate top-k: search the query's sign-LSH bucket, plus the
    ``n_probe - 1`` next-likeliest buckets (multi-probe — recovers the
    recall lost to neighbors split across a sign boundary at the cost
    of scanning proportionally more buckets).

    The bucket predicate is a plain column filter — when the table is
    written partitioned/clustered by bucket, this prunes the scan to
    n_probe buckets (the IVF-style scale path)."""
    probes = probe_buckets(query_vec, dims, n_probe)
    bucketed = df.select(
        F.col(id_col),
        F.col(vec_col),
        sign_bucket(F.col(vec_col), dims).alias("bucket"),
    ).filter(F.col("bucket").isin(probes))
    scored = bucketed.select(
        F.col(id_col),
        F.round(cosine_lit(F.col(vec_col), query_vec), 8).alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def ivf_assign(
    df: DataFrame,
    centroids: Sequence[Sequence[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (IVF cell).

    ``centroids`` come from an offline k-means (or, deterministically,
    a fixed sample); they are plan-time literals, so assignment is a
    narrow argmax over k cosine expressions — no shuffle, no UDF.
    At scale the table is written partitioned by ``ivf_cell`` so probes
    scan only their cell's files.
    """
    # Argmax via greatest() over (score, -i) structs: struct comparison
    # is lexicographic, so ties pick the smaller centroid index. Each
    # cosine expression is referenced exactly ONCE — a when-chain would
    # duplicate subtrees exponentially (and Catalyst's CollapseProject
    # re-inlines named columns, so projecting scores first doesn't help).
    #
    # r12: the row-invariant factors are let-bound (functions.vector.let)
    # — the embedding cast and its norm each evaluate ONCE per row
    # instead of once per centroid, and the centroid norms fold at plan
    # time (fold_norm: bit-identical sequential fold) — k+1 O(d) passes
    # per row instead of 3k, same float ops in the same order.
    cnorms = [fold_norm(c) for c in centroids]

    def _best(v: Column) -> Column:
        nv = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))

        def _argmax(nvb: Column) -> Column:
            best = F.greatest(
                *[
                    F.struct(
                        (
                            F.aggregate(
                                F.zip_with(v, _query_lit(c), lambda x, y: x * y),
                                F.lit(0.0),
                                lambda acc, x: acc + x,
                            )
                            / (nvb * F.lit(cn))
                        ).alias("s"),
                        F.lit(-i).alias("negi"),
                    )
                    for i, (c, cn) in enumerate(zip(centroids, cnorms))
                ]
            )
            return -best.getField("negi")

        return let(nv, _argmax)

    return df.withColumn(
        "ivf_cell", let(as_double(F.col(vec_col)), _best).cast("int")
    )


def ivf_assign_numpy(
    df: DataFrame,
    centroids: Sequence[Sequence[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Production-path IVF assignment: one Arrow-batched pandas UDF
    doing the (n x d) @ (d x k) argmax in numpy — one matmul per batch
    instead of k interpreted cosine expressions per row (the expression
    path keeps bit-exact DuckDB-oracle parity; this one is the
    throughput choice for index builds, ~10x on wide centroids).
    Ties pick the smaller centroid index, same as ivf_assign."""
    import numpy as np  # noqa: PLC0415
    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    cent = np.asarray([[float(x) for x in c] for c in centroids], dtype=np.float64)
    cent_unit = cent / np.linalg.norm(cent, axis=1, keepdims=True)

    @pandas_udf("int")
    def _assign(s: pd.Series) -> pd.Series:
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in s])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        scores = (mat / norms) @ cent_unit.T
        # argmax takes the FIRST maximum -> smaller index on ties,
        # matching greatest() over (score, -i) structs
        return pd.Series(np.argmax(scores, axis=1).astype("int32"))

    return df.withColumn("ivf_cell", _assign(F.col(vec_col)))


def ivf_topk(
    df: DataFrame,
    centroids: Sequence[Sequence[float]],
    query_vec: Sequence[float],
    k: int = 10,
    n_probe: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF approximate top-k: rank centroids by similarity to the query,
    search the ``n_probe`` nearest cells only."""
    sims = [
        (i, sum(float(a) * float(b) for a, b in zip(c, query_vec))
         / ((sum(float(a) ** 2 for a in c) ** 0.5)
            * (sum(float(b) ** 2 for b in query_vec) ** 0.5)))
        for i, c in enumerate(centroids)
    ]
    probe = [i for i, _ in sorted(sims, key=lambda t: (-t[1], t[0]))[:n_probe]]
    assigned = ivf_assign(df, centroids, vec_col)
    scored = assigned.filter(F.col("ivf_cell").isin(probe)).select(
        F.col(id_col),
        F.round(cosine_lit(F.col(vec_col), query_vec), 8).alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def embedding_dup_pairs(
    df: DataFrame,
    threshold: float = 0.99,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dims: tuple[int, ...] = (0, 1, 2, 3),
    max_bucket: int | None = 1000,
    refine_bits: int = 8,
    multiprobe: bool = False,
    parallelism: int | None = None,
) -> DataFrame:
    """Near-duplicate vector pairs (cosine >= threshold).

    Candidates come from an equi-join on the sign-LSH bucket, never a
    cross join.  ``max_bucket`` (finite by DEFAULT — pass None for the
    exhaustive oracle-parity form) is the hot-bucket skew guard: a
    degenerate embedding cluster — near-zero vectors, dead model dims —
    can put a large fraction of the corpus in one sign bucket, and an
    uncapped self-join there is M^2.  With only 2**len(dims) possible
    buckets a blanket drop would silently lose most true pairs on any
    large corpus, so over-cap buckets are instead REFINED with
    ``refine_bits`` additional sign dimensions (bucket granularity
    x 2**refine_bits inside the hot bucket only); recall then degrades
    the same graceful way as the base LSH (pairs split across a
    refinement sign boundary), never to zero.  A bucket still over the
    cap after refinement is genuinely degenerate (>= max_bucket vectors
    agreeing on len(dims)+refine_bits sign bits) and is dropped — use
    ``hot_bucket_report`` to measure what a cap would drop before
    enabling it.

    ``multiprobe=True`` additionally pairs vectors whose buckets differ
    in exactly one of the first len(dims) sign bits (each row emits its
    home bucket plus the one-bit flips; home x variant equi-join),
    recovering near-dups split across one sign boundary at ~len(dims)x
    candidate cost.  Off by default for oracle determinism.

    ``parallelism`` salts the probe side and replicates the build side
    across the salt (the replicate-join), spreading each bucket's
    scoring over N tasks instead of one.  With few sign bits the bucket
    count (2**len(dims)) caps natural task parallelism — a problem on a
    32-core local run reading one parquet file, and equally the skew
    answer for a dup-dense bucket on a cluster.  The candidate SET is
    unchanged (each probe row still meets every build row of its bucket
    exactly once).
    """
    # Norms are computed ONCE per row here; each candidate pair then
    # costs a single dot fold instead of three (dot + two norms) — the
    # grouping dot/(na*nb) is arithmetically identical to cosine(), so
    # scores stay bit-exact vs the oracle.
    b = df.select(
        F.col(id_col).alias("id"),
        as_double(F.col(vec_col)).alias("v"),
        norm(F.col(vec_col)).alias("nv"),
        sign_bucket(F.col(vec_col), dims).alias("bucket"),
    )
    from pyspark.sql import Window  # noqa: PLC0415

    if max_bucket is not None:
        extra = tuple(
            range(max(dims) + 1, max(dims) + 1 + refine_bits)
        )
        w = Window.partitionBy("bucket")
        b = (
            b.withColumn("__w", F.count(F.lit(1)).over(w))
            .withColumn(
                "bucket",
                F.when(F.col("__w") <= max_bucket, F.col("bucket")).otherwise(
                    F.concat(F.col("bucket"), sign_bucket(F.col("v"), extra))
                ),
            )
            .drop("__w")
        )
        b = b.withColumn(
            "__w", F.count(F.lit(1)).over(w)
        ).filter(F.col("__w") <= max_bucket).drop("__w")
    left = b.select(
        F.col("id").alias("a"), F.col("v").alias("va"), F.col("nv").alias("na"), "bucket"
    )

    def _bucket_join(lft: DataFrame, rgt: DataFrame) -> DataFrame:
        # Hash-repartition the PROBE side on id: with the build side
        # broadcast (the common case — it is bucket keys + vectors),
        # scoring parallelism equals the probe side's partition count,
        # which a single small parquet file would otherwise pin to 1.
        # If the build side is too big to broadcast the join shuffles
        # on bucket anyway and this extra exchange is noise.
        if parallelism and parallelism > 1:
            lft = lft.repartition(parallelism, F.col("a"))
        return lft.join(rgt, "bucket")

    if multiprobe:
        # Duplicate-free by construction (no distinct over wide array
        # rows): the right side explodes to its home bucket plus ONLY
        # the DOWNWARD one-bit flips ('1' -> '0').  A cross-boundary
        # pair's buckets differ in exactly one bit, so it is generated
        # exactly once — by the higher bucket's member flipping down to
        # meet the lower bucket's home row.  Same-bucket pairs come from
        # the home probe and keep the a < b filter; cross pairs arrive
        # in one arbitrary id order and are canonicalized with
        # least/greatest.  substring-to-end keeps any refinement suffix.
        nbits = len(dims)
        downflips = [
            F.when(
                F.substring("bucket", i + 1, 1) == "1",
                F.concat(
                    F.substring("bucket", 1, i),
                    F.lit("0"),
                    F.expr(f"substring(bucket, {i + 2})"),
                ),
            )
            for i in range(nbits)
        ]
        probes = F.filter(
            F.array(F.col("bucket"), *downflips), lambda x: x.isNotNull()
        )
        right = b.select(
            F.col("id").alias("b"),
            F.col("v").alias("vb"),
            F.col("nv").alias("nb"),
            F.col("bucket").alias("home"),
            F.explode(probes).alias("bucket"),
        )
        cand = (
            _bucket_join(left, right)
            .filter(
                ((F.col("bucket") == F.col("home")) & (F.col("a") < F.col("b")))
                | (F.col("bucket") != F.col("home"))
            )
            .select(
                F.least("a", "b").alias("a"),
                F.greatest("a", "b").alias("b"),
                F.col("va"),
                F.col("vb"),
                F.col("na"),
                F.col("nb"),
            )
        )
    else:
        right = b.select(
            F.col("id").alias("b"),
            F.col("v").alias("vb"),
            F.col("nv").alias("nb"),
            "bucket",
        )
        cand = _bucket_join(left, right).filter(F.col("a") < F.col("b"))
    return (
        cand.withColumn(
            "score", dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
        )
        .filter(F.col("score") >= threshold)
        .select("a", "b")
    )


def hot_bucket_report(
    df: DataFrame,
    vec_col: str = "embedding",
    dims: tuple[int, ...] = (0, 1, 2, 3),
    max_bucket: int = 1000,
) -> DataFrame:
    """Per-bucket width for ``embedding_dup_pairs``'s sign-LSH keys,
    flagged against ``max_bucket`` — run this BEFORE enabling the cap
    to see exactly which buckets (and how many rows) a cap would send
    to refinement.  One partial-aggregated shuffle on the bucket key."""
    return (
        df.select(sign_bucket(F.col(vec_col), dims).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("over_cap", F.col("n") > max_bucket)
        .orderBy(F.col("n").desc(), F.col("bucket"))
    )


def knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id: str = "qid",
    q_vec: str = "qvec",
) -> DataFrame:
    """Batched exact k-NN join: top-k corpus neighbors for EVERY query
    row (the retrieval-eval / hard-negative-mining shape), not just one
    query vector like brute_force_topk.

    The query side is broadcast (requirement: it fits an executor —
    thousands of probes, not millions), so the corpus never shuffles
    for scoring; the only shuffle is the per-query top-k window over
    scored rows. At extreme corpus x query products, swap the window
    for a two-phase top-k (local top-k per partition, then global) or
    route through lsh_topk/ivf_topk per query bucket. Self-pairs are
    excluded. Returns (q_id, id_col, rk) — ranks only, no float
    column, so oracle comparison never touches score precision.
    """
    scored = corpus.alias("c").join(
        F.broadcast(queries.alias("q")),
        F.col(f"c.{id_col}") != F.col(f"q.{q_id}"),
    ).select(
        F.col(f"q.{q_id}").alias(q_id),
        F.col(f"c.{id_col}").alias(id_col),
        F.round(
            cosine(as_double(F.col(f"c.{vec_col}")), as_double(F.col(f"q.{q_vec}"))), 8
        ).alias("score"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(q_id).orderBy(F.col("score").desc(), F.col(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(q_id, id_col, "rk")
    )


def knn_join_two_phase(
    corpus: DataFrame,
    queries_rows: Sequence[tuple],
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Production-path batched k-NN: per-PARTITION top-k in numpy
    (one (n_batch x d) @ (d x n_q) matmul per Arrow batch, NO shuffle
    of scored rows), then a final window over only k x n_partitions
    x n_queries survivors. The single-phase ``knn_join`` shuffles every
    scored row into per-query partitions — fine up to millions of
    rows, but at corpus x query scale the shuffle IS the job; here the
    shuffle input shrinks by ~corpus_rows / (k x n_partitions).

    ``queries_rows``: [(qid, vector), ...] — collected query batch
    (same broadcast-sized contract as knn_join). Self-pairs excluded.
    Returns (qid, id_col, rk). Scores use float64 matmul, which is not
    bit-identical to the oracle's sequential fold — use knn_join where
    hash-exact parity matters (parity asserted on separated data by
    test_knn_two_phase_matches_single_phase).
    """
    import numpy as np  # noqa: PLC0415
    from pyspark.sql import Window  # noqa: PLC0415

    qids = [int(q) for q, _ in queries_rows]
    qmat = np.asarray([[float(x) for x in v] for _, v in queries_rows], dtype=np.float64)
    qunit = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    n_q = len(qids)
    kk = int(k)

    def _local_topk(batches):
        for pdf in batches:
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            if len(mat) == 0:
                continue
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            scores = (mat / norms) @ qunit.T  # (n_batch, n_q)
            ids = pdf[id_col].to_numpy()
            out_q, out_id, out_s = [], [], []
            for j in range(n_q):
                keep = ids != qids[j]  # drop self-pairs outright: a -inf
                # sentinel could survive the partition top-k when a query
                # has < k non-self candidates and leak into the output
                col = scores[keep, j]
                cids = ids[keep]
                if len(col) == 0:
                    continue
                take = min(kk, len(col))
                # partial select then exact order by (-score, id)
                cand = np.argpartition(-col, take - 1)[:take] if take < len(col) else np.arange(len(col))
                cand = cand[np.lexsort((cids[cand], -col[cand]))][:take]
                out_q.extend([qids[j]] * len(cand))
                out_id.extend(cids[cand].tolist())
                out_s.extend(np.round(col[cand], 8).tolist())
            yield pd.DataFrame({"qid": out_q, id_col: out_id, "score": out_s})

    local = corpus.select(id_col, vec_col).mapInPandas(
        _local_topk, schema=f"qid long, {id_col} long, score double"
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col(id_col))
    return (
        local.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= kk)
        .select("qid", id_col, "rk")
    )


def incremental_embedding_dups(
    corpus: DataFrame,
    new: DataFrame,
    threshold: float = 0.99,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dims: tuple[int, ...] = (0, 1, 2, 3),
    max_bucket: int | None = 1000,
    parallelism: int | None = None,
) -> DataFrame:
    """Embedding near-dup pairs touching a NEW batch (new x corpus and
    new x new) — the maintained-index counterpart of
    embedding_dup_pairs, same (a < b, cosine >= threshold) contract.

    The probe side is only the new batch: candidates come from an
    equi-join of new-bucket rows against the combined postings, so
    per-batch cost is O(|batch| x matched-bucket load), never a corpus
    self-join.  At scale, store the corpus with its (bucket, norm)
    columns precomputed (they are pure per-row projections) and
    partitioned by bucket — then the probe join prunes to the buckets
    the batch lands in.  ``max_bucket`` drops degenerate buckets
    (measured over the COMBINED postings, so a corpus-wide hot bucket
    stays excluded for every future batch); pass None for the
    exhaustive oracle-parity form.
    """

    return incremental_embedding_dups_indexed(
        embedding_index_frame(corpus, vec_col, id_col, dims),
        new,
        threshold=threshold,
        vec_col=vec_col,
        id_col=id_col,
        dims=dims,
        max_bucket=max_bucket,
        parallelism=parallelism,
    )


def embedding_index_frame(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dims: tuple[int, ...] = (0, 1, 2, 3),
) -> DataFrame:
    """The maintained embedding-dup index rows: (id, v, nv, bucket) —
    pure per-row projections of the vectors (double cast, norm, sign
    bucket).  Store partitioned by ``bucket`` so batch probes prune to
    the matched buckets' files; the ``index --kind embedding`` CLI
    maintains it as the running union of accepted batches."""
    return df.select(
        F.col(id_col).alias("id"),
        as_double(F.col(vec_col)).alias("v"),
        norm(F.col(vec_col)).alias("nv"),
        sign_bucket(F.col(vec_col), dims).alias("bucket"),
    )


def incremental_embedding_dups_indexed(
    corpus_idx: DataFrame,
    new: DataFrame,
    threshold: float = 0.99,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dims: tuple[int, ...] = (0, 1, 2, 3),
    max_bucket: int | None = 1000,
    parallelism: int | None = None,
) -> DataFrame:
    """incremental_embedding_dups against a MAINTAINED (id, v, nv,
    bucket) index frame (embedding_index_frame) — each step projects
    only the batch and probes the stored postings."""

    allv = corpus_idx.withColumn("is_new", F.lit(False)).unionByName(
        embedding_index_frame(new, vec_col, id_col, dims).withColumn(
            "is_new", F.lit(True)
        )
    )
    # restrict the corpus postings to buckets the batch touches BEFORE
    # any counting: the hot-bucket width check must not scan the whole
    # corpus per batch (bucket-partitioned storage prunes this
    # semi-join to the matched buckets' files)
    touched = embedding_index_frame(new, vec_col, id_col, dims).select(
        "bucket"
    ).distinct()
    allv = allv.join(touched, "bucket", "left_semi")
    if max_bucket is not None:
        hot = (
            allv.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("__w"))
            .filter(F.col("__w") > max_bucket)
            .select("bucket")
        )
        allv = allv.join(F.broadcast(hot), "bucket", "left_anti")
    probe = allv.filter(F.col("is_new")).select(
        F.col("id").alias("x"), F.col("v").alias("vx"), F.col("nv").alias("nx"), "bucket"
    )
    if parallelism and parallelism > 1:
        probe = probe.repartition(parallelism, F.col("x"))
    post = allv.select(
        F.col("id").alias("y"), F.col("v").alias("vy"), F.col("nv").alias("ny"), "bucket"
    )
    cand = (
        probe.join(post, "bucket")
        .filter(F.col("x") != F.col("y"))
        # new x new pairs are generated from both orientations; pairs
        # with an old side only once — canonicalize + distinct on ids
        # BEFORE scoring so each pair costs one dot fold
        .select(
            F.least("x", "y").alias("a"),
            F.greatest("x", "y").alias("b"),
            F.when(F.col("x") < F.col("y"), F.col("vx")).otherwise(F.col("vy")).alias("va"),
            F.when(F.col("x") < F.col("y"), F.col("vy")).otherwise(F.col("vx")).alias("vb"),
            F.when(F.col("x") < F.col("y"), F.col("nx")).otherwise(F.col("ny")).alias("na"),
            F.when(F.col("x") < F.col("y"), F.col("ny")).otherwise(F.col("nx")).alias("nb"),
        )
        .dropDuplicates(["a", "b"])
    )
    return (
        cand.withColumn("cos", dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")))
        .filter(F.col("cos") >= F.lit(threshold))
        .select("a", "b")
    )


def semantic_dedup(
    df: DataFrame,
    centroids: Sequence[Sequence[float]],
    threshold: float = 0.99,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_cell: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv
    2303.09540): cluster the embedding space, find near-duplicate pairs
    WITHIN each cluster only, and keep one representative (min id) per
    duplicate component.  Returns (id, rep_id, keep).

    The clustering step is the scale lever: pair search is confined to
    cells, so the candidate space is sum-over-cells O(m_i^2) instead of
    O(n^2), and each cell's self-join co-locates on the cell key.
    ``centroids`` come from an offline k-means (at 100 TB: sample-fit,
    then one `ivf_assign_numpy` pass); at realistic k (thousands), cell
    load n/k bounds the per-cell quadratic term, and ``max_cell`` drops
    degenerate cells the same way the LSH paths cap hot buckets.
    Components via alternating large-star/small-star rounds
    (operators/graph.py) — O(log^2 n) rounds for any cluster shape.
    """
    from zinger_spark.operators.graph import connected_components  # noqa: PLC0415

    assigned = ivf_assign(df, centroids, vec_col).select(
        F.col(id_col).alias("id"),
        as_double(F.col(vec_col)).alias("v"),
        norm(F.col(vec_col)).alias("nv"),
        "ivf_cell",
    )
    if max_cell is not None:
        hot = (
            assigned.groupBy("ivf_cell")
            .agg(F.count(F.lit(1)).alias("__w"))
            .filter(F.col("__w") > max_cell)
            .select("ivf_cell")
        )
        assigned = assigned.join(F.broadcast(hot), "ivf_cell", "left_anti")
    left = assigned.select(
        F.col("id").alias("a"), F.col("v").alias("va"), F.col("nv").alias("na"), "ivf_cell"
    )
    right = assigned.select(
        F.col("id").alias("b"), F.col("v").alias("vb"), F.col("nv").alias("nb"), "ivf_cell"
    )
    edges = (
        left.join(right, "ivf_cell")
        .filter(F.col("a") < F.col("b"))
        .withColumn("cos", dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")))
        .filter(F.col("cos") >= F.lit(threshold))
        .select("a", "b")
    )
    verts = df.select(F.col(id_col).alias("id"))
    comp = connected_components(verts, edges, algorithm="star")
    return comp.select(
        F.col("id").alias(id_col),
        F.col("cluster_id").alias("rep_id"),
        (F.col("id") == F.col("cluster_id")).alias("keep"),
    )


def build_ivf_index(
    df: DataFrame,
    centroids: Sequence[Sequence[float]],
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Persist an IVF index: assignments parquet PARTITIONED BY cell,
    plus the centroid table.  This is the 100 TB ANN serving layout —
    a probe reads only its n_probe cells' files (hive partition
    pruning), i.e. ~n_probe/k of the corpus per query, and the index is
    built once and amortized over every query instead of re-assigning
    per query (ivf_topk's mode).  Same deterministic expression-path
    assignment as ivf_assign, so index content is reproducible."""
    assigned = ivf_assign(df, centroids, vec_col)
    (
        assigned.select(id_col, vec_col, "ivf_cell")
        .write.mode("overwrite")
        .partitionBy("ivf_cell")
        .parquet(f"{path}/assignments")
    )
    cdf = df.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cell INT, centroid ARRAY<DOUBLE>",
    )
    cdf.coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_index_topk(
    spark: SparkSession,
    path: str,
    query_vec: Sequence[float],
    k: int = 10,
    n_probe: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Query a persisted IVF index: rank centroids driver-side (the
    centroid table is k rows), then scan ONLY the probed cells — the
    `ivf_cell IN (...)` predicate is a hive partition filter, so
    non-probed cells' files are never opened (plan-audited:
    PartitionFilters on the assignments scan)."""
    cents = sorted(
        (r["cell"], r["centroid"])
        for r in spark.read.parquet(f"{path}/centroids").collect()
    )
    sims = [
        (
            i,
            sum(float(a) * float(b) for a, b in zip(c, query_vec))
            / (
                (sum(float(a) ** 2 for a in c) ** 0.5)
                * (sum(float(b) ** 2 for b in query_vec) ** 0.5)
            ),
        )
        for i, c in cents
    ]
    probe = [i for i, _ in sorted(sims, key=lambda t: (-t[1], t[0]))[:n_probe]]
    scan = spark.read.parquet(f"{path}/assignments").filter(
        F.col("ivf_cell").isin(probe)
    )
    scored = scan.select(
        F.col(id_col),
        F.round(cosine_lit(F.col(vec_col), query_vec), 8).alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def kmeans_fixed_point(
    df: DataFrame,
    k: int = 8,
    iterations: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    quant: int = 1000,
    cscale: int = 1024,
) -> DataFrame:
    """Distributed Lloyd's k-means with FIXED-POINT integer arithmetic —
    deterministic across engines and partitionings, the offline
    counterpart that produces real IVF centroids (ivf_assign's docstring
    "offline k-means" made concrete).

    Determinism design (same philosophy as pagerank_fixed_point):
      * vectors quantize once via floor(x * quant) — one double multiply
        + floor, bit-identical in any engine reading the same parquet;
      * centroids live at fixed-point scale ``cscale``:
        c = (sum(x) * cscale) div count — integer div, no float means;
      * distances are exact ints: sum((x*cscale - c)^2) per dim (for
        |x| <= quant and 64 dims this peaks ~2^48, far inside int64);
      * argmin ties break on the smaller cluster id via struct-min.
    Float k-means converges to partition-order-dependent centroids —
    fine for quality, useless for the reproducible-pipeline contract a
    lake needs (same input -> same index, diffable across runs).

    Physical shape per iteration: points live in LONG format (id, d, x)
    — assignment is a d-keyed join against the k*d centroid table
    (broadcast), one partial-aggregated groupBy (id, cluster), one
    argmin groupBy(id), then the update is one groupBy (cluster, d).
    All shuffles keyed and combiner-friendly; lineage cut per round.
    Init: the k smallest ids' vectors.  Empty clusters drop out
    (deterministically) rather than being reseeded.

    Returns the final centroid table (cluster, d, c) at scale
    ``cscale`` — feed ``c / (quant * cscale)`` to ivf_assign for
    float centroids.
    """
    pts = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.transform(
                as_double(F.col(vec_col)),
                lambda x: F.floor(x * quant).cast("long"),
            )
        ).alias("d", "x"),
    ).localCheckpoint(eager=True)
    # init: the k smallest ids' vectors.  The id list is a BOUNDED
    # k-row collect (TakeOrderedAndProject), enumerated driver-side —
    # no unpartitioned window.
    seed_ids = [
        r["id"] for r in df.select(F.col(id_col).alias("id")).orderBy("id").limit(k).collect()
    ]
    seed = df.sparkSession.createDataFrame(
        [(i, c) for c, i in enumerate(seed_ids)], "id LONG, cluster INT"
    )
    cents = (
        pts.join(F.broadcast(seed), "id")
        .select("cluster", "d", (F.col("x") * cscale).alias("c"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iterations):
        diff = F.col("x") * cscale - F.col("c")
        per_cluster = (
            pts.join(F.broadcast(cents), "d")
            .groupBy("id", "cluster")
            .agg(F.sum(diff * diff).alias("dist"))
        )
        assign = per_cluster.groupBy("id").agg(
            F.min(F.struct("dist", "cluster")).getField("cluster").alias("cluster")
        )
        cents = (
            pts.join(assign, "id")
            .groupBy("cluster", "d")
            .agg(
                F.expr(f"sum(x) * {cscale} div count(1)").alias("c")
            )
            .localCheckpoint(eager=True)
        )
    return cents


# ---------------------------------------------------------------------------
# Product quantization (Jégou, Douze & Schmid, TPAMI 2011 — public
# literature): split each D-dim vector into M subvectors, learn a
# per-subspace codebook with k-means, store each vector as M small
# codes, and answer queries with asymmetric distance computation (ADC):
# per-subspace lookup tables against the RAW query, summed over M.
# Serving memory per vector drops from D floats to M bytes (~16-32x for
# D=64, M=4-8) — the shape that makes 100 TB vector serving fit.
#
# Same fixed-point discipline as kmeans_fixed_point: all training,
# encoding, and ADC arithmetic is exact int64, so codebooks, codes, and
# distances are bit-identical across engines and partitionings.


def pq_train(
    df: DataFrame,
    m: int = 4,
    ksub: int = 8,
    iterations: int = 2,
    dims: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    quant: int = 1000,
    cscale: int = 1024,
) -> DataFrame:
    """Train all M sub-codebooks in ONE Lloyd's chain: points live long
    as (id, m, d, x) with m = the subspace and d the within-subspace
    dim, and every per-iteration shuffle is keyed by (id, m) / (m,
    cluster, d) — cost is one k-means pass over the corpus however many
    subspaces, not M passes.  Centroid tables stay m*ksub*subdim rows
    (broadcast).  Init mirrors kmeans_fixed_point: the ksub smallest
    ids seed every subspace; argmin ties break on the smaller code.

    Returns the codebook frame (m, cluster, d, c) with c at scale
    ``quant * cscale``."""
    if dims % m:
        raise ValueError(f"dims={dims} not divisible by m={m} subspaces")
    pts = (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(
                F.transform(
                    as_double(F.col(vec_col)),
                    lambda x: F.floor(x * quant).cast("long"),
                )
            ).alias("pos", "x"),
        )
        .select(
            "id",
            (F.col("pos") / (dims // m)).cast("int").alias("m"),
            (F.col("pos") % (dims // m)).cast("int").alias("d"),
            "x",
        )
        .localCheckpoint(eager=True)
    )
    seed_ids = [
        r["id"]
        for r in df.select(F.col(id_col).alias("id"))
        .orderBy("id")
        .limit(ksub)
        .collect()
    ]
    seed = df.sparkSession.createDataFrame(
        [(i, c) for c, i in enumerate(seed_ids)], "id LONG, cluster INT"
    )
    cents = (
        pts.join(F.broadcast(seed), "id")
        .select("m", "cluster", "d", (F.col("x") * cscale).alias("c"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iterations):
        assign = _pq_assign(pts, cents, cscale=cscale).withColumnRenamed(
            "code", "cluster"
        )
        cents = (
            pts.join(assign, ["id", "m"])
            .groupBy("m", "cluster", "d")
            .agg(F.expr(f"sum(x) * {cscale} div count(1)").alias("c"))
            .localCheckpoint(eager=True)
        )
    return cents


def _pq_assign(pts: DataFrame, cents: DataFrame, cscale: int = 1024) -> DataFrame:
    """(id, m) -> nearest sub-centroid under exact integer L2 (points
    lifted to the centroids' fixed-point scale); ties break to the
    smaller cluster id (struct-min, same rule as kmeans_fixed_point)."""
    diff = F.col("x") * F.lit(cscale) - F.col("c")
    per = (
        pts.join(F.broadcast(cents), ["m", "d"])
        .groupBy("id", "m", "cluster")
        .agg(F.sum(diff * diff).alias("dist"))
    )
    return per.groupBy("id", "m").agg(
        F.min(F.struct("dist", "cluster")).getField("cluster").alias("code")
    )


def pq_encode(
    df: DataFrame,
    codebooks: DataFrame,
    m: int = 4,
    dims: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    quant: int = 1000,
    cscale: int = 1024,
) -> DataFrame:
    """Vectors -> (id, m, code): one broadcast join against the
    codebooks + one argmin — M small ints per vector out."""
    pts = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.transform(
                as_double(F.col(vec_col)),
                lambda x: F.floor(x * quant).cast("long"),
            )
        ).alias("pos", "x"),
    ).select(
        "id",
        (F.col("pos") / (dims // m)).cast("int").alias("m"),
        (F.col("pos") % (dims // m)).cast("int").alias("d"),
        "x",
    )
    return _pq_assign(pts, codebooks, cscale=cscale)


def pq_adc_table(
    spark: SparkSession,
    codebooks: DataFrame,
    query_vec: Sequence[float],
    m: int = 4,
    dims: int = 64,
    quant: int = 1000,
    cscale: int = 1024,
) -> DataFrame:
    """The ADC lookup table (m, code, t): exact integer squared L2
    between the RAW (uncompressed) query subvector and each
    sub-centroid — m*ksub rows, computed once per query."""
    import math  # noqa: PLC0415

    sub = dims // m
    q = spark.createDataFrame(
        [
            (pos // sub, pos % sub, int(math.floor(float(x) * quant)))
            for pos, x in enumerate(query_vec)
        ],
        "m INT, d INT, qx BIGINT",
    )
    return (
        codebooks.join(F.broadcast(q), ["m", "d"])
        .groupBy("m", "cluster")
        .agg(
            F.sum(
                (F.col("qx") * F.lit(cscale) - F.col("c"))
                * (F.col("qx") * F.lit(cscale) - F.col("c"))
            ).alias("t")
        )
        .withColumnRenamed("cluster", "code")
    )


def pq_adc_topk(
    codes: DataFrame,
    adc: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k by ADC distance: broadcast the m*ksub table onto the codes,
    one partial-aggregated groupBy(id), TakeOrdered k by (dist asc,
    id).  The only corpus-sized frame is the codes — M ints per vector."""
    return (
        codes.join(F.broadcast(adc), ["m", "code"])
        .groupBy("id")
        .agg(F.sum("t").alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), F.col("id"))
        .limit(k)
        .select(F.col("id").alias(id_col), "adc_dist")
    )


def build_ivfpq_index(
    df: DataFrame,
    coarse_centroids: Sequence[Sequence[float]],
    codebooks: DataFrame,
    path: str,
    m: int = 4,
    dims: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    quant: int = 1000,
) -> None:
    """Persist the IVF-PQ serving layout: per-vector (id, m, code) rows
    partitioned by coarse cell + the codebook and coarse-centroid
    tables.  vs build_ivf_index the assignments hold M small ints per
    vector instead of D floats — the 16-32x serving-memory cut — and a
    probe still opens only its n_probe cells' files (hive partition
    pruning on ivf_cell)."""
    assigned = ivf_assign(df, coarse_centroids, vec_col).select(
        F.col(id_col).alias("id"), "ivf_cell"
    )
    codes = pq_encode(df, codebooks, m=m, dims=dims, vec_col=vec_col, id_col=id_col)
    (
        codes.join(assigned, "id")
        .write.mode("overwrite")
        .partitionBy("ivf_cell")
        .parquet(f"{path}/codes")
    )
    spark = df.sparkSession
    spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(coarse_centroids)],
        "cell INT, centroid ARRAY<DOUBLE>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    codebooks.coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")


def ivfpq_index_topk(
    spark: SparkSession,
    path: str,
    query_vec: Sequence[float],
    k: int = 10,
    n_probe: int = 1,
    m: int = 4,
    dims: int = 64,
    quant: int = 1000,
    id_col: str = "vec_id",
) -> DataFrame:
    """Query the persisted IVF-PQ index: rank coarse centroids
    driver-side (bounded table), compute the ADC table from the
    codebook parquet, scan ONLY the probed cells' code files
    (partition filter) and fold M lookups per vector."""
    cents = sorted(
        (r["cell"], r["centroid"])
        for r in spark.read.parquet(f"{path}/centroids").collect()
    )
    sims = [
        (
            i,
            sum(float(a) * float(b) for a, b in zip(c, query_vec))
            / (
                (sum(float(a) ** 2 for a in c) ** 0.5)
                * (sum(float(b) ** 2 for b in query_vec) ** 0.5)
            ),
        )
        for i, c in cents
    ]
    probe = [i for i, _ in sorted(sims, key=lambda t: (-t[1], t[0]))[:n_probe]]
    codebooks = spark.read.parquet(f"{path}/codebooks")
    adc = pq_adc_table(spark, codebooks, query_vec, m=m, dims=dims, quant=quant)
    codes = spark.read.parquet(f"{path}/codes").filter(
        F.col("ivf_cell").isin(probe)
    )
    return pq_adc_topk(codes, adc, k=k, id_col=id_col)


def ivfpq_rerank_topk(
    spark: SparkSession,
    path: str,
    base: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_candidates: int = 100,
    n_probe: int = 1,
    m: int = 4,
    dims: int = 64,
    quant: int = 1000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-PQ with exact re-ranking — the standard production serving
    shape (Jégou'11 §IV): the compressed index (codes in fast storage)
    nominates ``n_candidates`` by integer ADC from only the probed
    cells, then the FULL vectors of just those candidates are fetched
    from the base table and re-scored with exact cosine for the final
    top-k.  Recovers most of the quantization's recall loss while the
    full-vector reads stay bounded by n_candidates per query — the
    base table can live on cold storage.

    The candidate fetch is a broadcast semi-join (n_candidates ids)
    against the base table, so the exact re-rank never shuffles the
    corpus."""
    cand = ivfpq_index_topk(
        spark, path, query_vec, k=n_candidates, n_probe=n_probe,
        m=m, dims=dims, quant=quant, id_col=id_col,
    ).select(id_col)
    fetched = base.join(F.broadcast(cand), id_col)
    scored = fetched.select(
        F.col(id_col),
        F.round(cosine_lit(F.col(vec_col), query_vec), 8).alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)
