"""Distributed approximate-counting sketches — the 100 TB answer to
"how many distinct / which heavy hitters / is this contaminated"
when exact answers would shuffle the full key set.

  hll_registers / hll_estimate    HyperLogLog distinct count: a fixed
                                  2^p-register sketch built with one
                                  partial-aggregated groupBy (the
                                  shuffle moves <= 2^p rows per
                                  partition, never the keys)
  hll_by_group                    per-group HLL (distinct users per
                                  event type at 100 TB without a
                                  (group, user) distinct shuffle)
  hll_merge                       register-wise max — sketches built on
                                  disjoint slices union losslessly, the
                                  property that makes HLL the right
                                  cross-datacenter / cross-day rollup
  kmv_distinct                    K-minimum-values estimator: top-k via
                                  TakeOrderedAndProject (per-partition
                                  heads, no global sort)
  countmin_sketch / countmin_estimates
                                  Count-Min frequency sketch: d x w
                                  integer counter grid, built map-side;
                                  point queries = min over d rows
  bloom_bits / bloom_flag_contaminated
                                  Bloom-filter membership for benchmark
                                  contamination: the probe set collapses
                                  to k*|probes| bit positions (bounded,
                                  broadcastable) instead of a join
                                  against the raw n-grams
  weighted_priority_sample        weight-proportional sampling via
                                  integer priorities (Efraimidis-
                                  Spirakis shape, fixed-point so results
                                  are engine-exact and seed-stable)
  hdr_histogram / hdr_quantiles   mergeable log-linear quantile sketch
                                  (HdrHistogram layout): p99 without a
                                  sort, slices merge by adding counts
  kmv_group_signatures / kmv_pairwise_jaccard
                                  set-intersection sketch: per-group
                                  k-min signatures, pairwise Jaccard in
                                  sketch space (#groups^2, not data^2)

Every sketch here is *deterministic*: hashes are the repo's md5-based
60-bit ``md5_hash60`` (functions/text.py), and all register / counter /
priority arithmetic is integer-only, so a DuckDB oracle reproduces the
sketch bit-for-bit.  (Spark's built-in approx_count_distinct is the
same HLL++ idea, but its sketch is opaque and not reproducible outside
the JVM — these expose the registers as data, which is what a lake
pipeline needs to persist per-partition sketches and roll them up.)

Scale notes (the design the registers-as-rows layout buys):
  * HLL build is groupBy(bucket).max(rho): partial aggregation combines
    map-side, so the exchange carries at most 2^p rows per input
    partition regardless of input size.  p=12 -> 4096 registers, ~1.6%
    relative error; p=14 at 100 TB is 16k rows and ~0.8%.
  * All estimate math happens on two exact integers (sum of 2^(RMAX-r)
    as a bigint, zero-register count), so merging and estimating never
    touch float accumulation order.
  * Count-Min is groupBy(row, bucket).sum: a d*w-cell grid (4x1024
    default) whatever the corpus size; estimates are broadcast joins
    against the grid.
  * Bloom probing needs the *positions* set (k bits per probe n-gram),
    not the n-grams: bounded memory, and false positives are a declared,
    deterministic property of (m, k) rather than an engine quirk.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions.text import md5_hash60

# md5_hash60 yields 60 usable bits; p index bits leave RHO_BITS for the
# leading-zero geometric estimator.
HASH_BITS = 60


def _rho(w: Column, rho_bits: int) -> Column:
    """Position of the leftmost 1-bit of ``w`` within a rho_bits-wide
    word, 1-indexed; w == 0 -> rho_bits + 1 (all zeros).  Computed from
    the length of the binary string (``bin`` exists with identical
    no-leading-zeros semantics in Spark and DuckDB), so no float log2
    edge cases."""
    return F.when(w == 0, F.lit(rho_bits + 1)).otherwise(
        rho_bits + 1 - F.length(F.bin(w))
    )


def hll_registers(df: DataFrame, col: str, p: int = 12) -> DataFrame:
    """Build the HLL register table for ``col``: (bucket, register).

    One narrow projection + one partial-aggregated groupBy.  Only
    non-empty buckets are materialized (register >= 1 by construction);
    the estimator treats absent buckets as zeros, which keeps the
    sketch row count at min(2^p, observed buckets).
    """
    m = 1 << p
    rho_bits = HASH_BITS - p
    h = md5_hash60(F.col(col).cast("string"))
    return (
        df.select(
            (h % m).alias("bucket"),
            _rho(F.shiftright(h, p), rho_bits).alias("r"),
        )
        .groupBy("bucket")
        .agg(F.max("r").alias("register"))
    )


def _estimate_from_registers(regs: DataFrame, p: int, group_cols: list[str]) -> DataFrame:
    """Fold a register table into the HLL estimate, one row per group.

    All sufficient statistics are exact integers:
      S = sum over all 2^p buckets of 2^(RMAX - register)   (bigint;
          absent buckets contribute 2^RMAX each)
      Z = number of zero (absent) registers
    The raw estimate alpha * m^2 / sum(2^-register) becomes
    alpha * m^2 * 2^RMAX / S — one double division of two exact values,
    so partial-aggregation order can never shift the result.  Linear
    counting (m * ln(m/Z)) takes over below the standard 2.5m threshold.
    """
    m = 1 << p
    rho_bits = HASH_BITS - p
    rmax = rho_bits + 1
    # alpha_m for m >= 128 (Flajolet et al. 2007)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    gb = regs.groupBy(*group_cols) if group_cols else regs.groupBy()
    stats = gb.agg(
        # coalesce: a global agg over an EMPTY register set yields one
        # row with a NULL sum; 0 keeps the linear-counting branch live
        # so the estimate is 0, matching estimate_from_register_dict({})
        F.coalesce(
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {rmax} - register)")),
            F.lit(0).cast("long"),
        ).alias("s_present"),
        F.count(F.lit(1)).alias("nonzero"),
    )
    zeros = m - F.col("nonzero")
    s_total = F.col("s_present") + zeros.cast("long") * F.lit(1 << rmax).cast("long")
    raw = F.lit(alpha * m * m * float(1 << rmax)) / s_total.cast("double")
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    out = stats.select(
        *group_cols,
        F.round(est).cast("long").alias("estimate"),
        F.col("nonzero").cast("long").alias("nonzero_registers"),
        s_total.alias("s_stat"),
    )
    return out


def hll_estimate(df: DataFrame, col: str, p: int = 12) -> DataFrame:
    """Distinct-count estimate for ``col``: 1 row
    (estimate, nonzero_registers, s_stat)."""
    return _estimate_from_registers(hll_registers(df, col, p), p, [])


def hll_by_group(df: DataFrame, group_col: str, col: str, p: int = 12) -> DataFrame:
    """Per-group distinct estimate — e.g. distinct users per event type.

    The shuffle key is (group, bucket): at most |groups| * 2^p rows
    survive the map-side combine, independent of input size.  This is
    the pattern that replaces countDistinct(group, user) at 100 TB.
    """
    m = 1 << p
    rho_bits = HASH_BITS - p
    h = md5_hash60(F.col(col).cast("string"))
    regs = (
        df.select(
            F.col(group_col),
            (h % m).alias("bucket"),
            _rho(F.shiftright(h, p), rho_bits).alias("r"),
        )
        .groupBy(group_col, "bucket")
        .agg(F.max("r").alias("register"))
    )
    return _estimate_from_registers(regs, p, [group_col])


def hll_merge(regs_a: DataFrame, regs_b: DataFrame) -> DataFrame:
    """Union two sketches: register-wise max.  Lossless — the merged
    sketch is exactly the sketch of the unioned inputs, which is why
    per-slice sketches roll up across days/partitions/datacenters."""
    return (
        regs_a.unionByName(regs_b)
        .groupBy("bucket")
        .agg(F.max("register").alias("register"))
    )


def kmv_distinct(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """K-minimum-values estimate: keep the k smallest distinct hash
    values; n ~= (k-1) * HASH_SPACE / h_(k).

    The k smallest of anything is TakeOrderedAndProject in Spark:
    per-partition heaps, no global sort, k rows to the driver side of
    the plan.  Returns 1 row (estimate, kth_min).
    """
    space = float(1 << HASH_BITS)
    h = md5_hash60(F.col(col).cast("string"))
    mins = df.select(h.alias("h")).distinct().orderBy("h").limit(k)
    kth = mins.groupBy().agg(F.max("h").alias("kth"), F.count(F.lit(1)).alias("got"))
    # fewer than k distinct values -> the sample IS the population
    return kth.select(
        F.when(F.col("got") < k, F.col("got"))
        .otherwise(F.round(F.lit((k - 1) * space) / F.col("kth").cast("double")).cast("long"))
        .alias("estimate"),
        F.col("kth").alias("kth_min"),
    )


# --------------------------------------------------------------------------
# Count-Min


def _cm_bucket(value: Column, row: int, w: int) -> Column:
    """Row-salted bucket: independent-enough hash per row via a salt
    prefix (same construction both engines can write as SQL)."""
    return md5_hash60(F.concat(F.lit(f"{row}:"), value)) % w


def countmin_sketch(
    df: DataFrame, col: str, weight: Column | None = None, d: int = 4, w: int = 1024
) -> DataFrame:
    """Build the d x w Count-Min grid: (row, bucket, counter).

    The grid is built with ONE groupBy over a d-way posexplode (each
    input row contributes d cells); partial aggregation collapses to at
    most d*w cells per partition before the exchange.  Point estimate
    for x = min_i grid[i][h_i(x)]; always an overestimate, never under.
    """
    wcol = (weight if weight is not None else F.lit(1)).cast("long").alias("wt")
    v = F.col(col).cast("string")
    cells = df.select(
        F.posexplode(F.array(*[_cm_bucket(v, i, w) for i in range(d)])).alias(
            "row", "bucket"
        ),
        wcol,
    )
    return cells.groupBy("row", "bucket").agg(F.sum("wt").alias("counter"))


def countmin_estimates(sketch: DataFrame, items: DataFrame, col: str, d: int = 4, w: int = 1024) -> DataFrame:
    """CM point queries for ``items[col]``: join each item's d (row,
    bucket) probes against the grid and take the min counter.  The grid
    is d*w rows — Spark broadcasts it; the item side streams."""
    v = F.col(col).cast("string")
    probes = items.select(
        col,
        F.posexplode(F.array(*[_cm_bucket(v, i, w) for i in range(d)])).alias(
            "row", "bucket"
        ),
    )
    return (
        # LEFT join: an absent (row,bucket) cell is a counter of 0, and
        # the CM guarantee takes the min over all d cells INCLUDING the
        # empty ones — an inner join would drop them and report a
        # colliding nonzero counter (or no row at all) for unseen items
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(col)
        .agg(
            F.min(F.coalesce(F.col("counter"), F.lit(0).cast("long"))).alias(
                "cm_estimate"
            )
        )
    )


# --------------------------------------------------------------------------
# Bloom filter


def bloom_positions(value: Column, m_bits: int, k: int) -> Column:
    """The k bit positions ``value`` sets/probes in an m_bits filter.

    Kirsch-Mitzenmacher double hashing (pos_i = h1 + i*h2 mod m,
    'Less Hashing, Same Performance', 2006): ONE md5 per value instead
    of k — the hash is the dominant per-row cost of Bloom screening, so
    this is a ~k-fold cut in the hot path (same trick the minhash
    pipeline uses to derive 16 permutations from one hash).  h2 is
    forced odd so it never collapses the probe sequence on the
    power-of-two m the suite uses.  Integer-exact and engine-identical:
    the DuckDB oracle computes the same h1/h2 from the same md5."""
    h = md5_hash60(F.concat(F.lit("b:"), value))
    h1 = h % m_bits
    h2 = (F.shiftright(h, 20) % m_bits).bitwiseOR(F.lit(1))
    return F.array(*[(h1 + i * h2) % m_bits for i in range(k)])


def bloom_bits(probe_df: DataFrame, col: str, m_bits: int = 1 << 16, k: int = 3) -> DataFrame:
    """Distinct bit positions set by the probe set — the filter itself,
    as data (<= k * |probes| rows, bounded by m_bits).  At deploy time
    this collects into an m_bits/8-byte bitmap and broadcasts; as a
    DataFrame it stays joinable and oracle-checkable."""
    v = F.col(col).cast("string")
    return (
        probe_df.select(F.explode(bloom_positions(v, m_bits, k)).alias("pos"))
        .distinct()
    )


def bloom_bitmap(bits: DataFrame, m_bits: int) -> list[int]:
    """Collect a ``bloom_bits`` frame into the packed bitmap the deploy
    path broadcasts: m_bits/64 signed longs.  The collect is bounded by
    the filter size (<= m_bits rows, 512 KiB of ints at m=2^16) no
    matter how large the probe corpus was — this is the one place the
    Bloom pipeline touches the driver, and it is O(m), not O(data)."""
    words = [0] * ((m_bits + 63) >> 6)
    for (p,) in bits.collect():
        words[p >> 6] |= 1 << (p & 63)
    # two's-complement into signed range so F.lit() yields array<bigint>
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_maybe_member(
    value: Column, bitmap: list[int], m_bits: int, k: int = 3
) -> Column:
    """Boolean 'maybe in the filter' test against a literal bitmap —
    the zero-join, zero-shuffle form of ``bloom_flag_contaminated``:
    the m_bits/64-long array ships inside the plan (8 KiB at m=2^16)
    and each probe is k pure-JVM word/bit lookups, so contamination
    screening over a 100 TB corpus is a single scan with a map-side
    filter.  Bit layout matches ``bloom_bitmap``; hash layout matches
    ``bloom_positions``, so results are identical to the join form
    (same deterministic false positives)."""
    # The cast is load-bearing: a bitmap whose packed words all happen
    # to fit in int32 (small/sparse filters) would infer array<int>,
    # and Spark's int-typed shiftright masks the shift amount to 5
    # bits — bit offsets >= 32 would silently probe the wrong bit.
    bm = F.lit(bitmap).cast("array<bigint>")

    def bit_set(p: Column) -> Column:
        word = F.element_at(bm, F.shiftright(p, 6).cast("int") + F.lit(1))
        return (
            F.call_function(
                "shiftright", word, p.bitwiseAND(F.lit(63)).cast("int")
            ).bitwiseAND(F.lit(1))
            == 1
        )

    return F.forall(bloom_positions(value.cast("string"), m_bits, k), bit_set)


def bloom_flag_contaminated(
    docs_ngrams: DataFrame,
    ngram_col: str,
    bits: DataFrame,
    m_bits: int = 1 << 16,
    k: int = 3,
) -> DataFrame:
    """Rows of ``docs_ngrams`` whose n-gram has ALL k positions present
    in the filter (Bloom 'maybe member' — includes the deterministic
    false positives the (m, k) choice implies).

    The probe side explodes to k rows per n-gram and equi-joins the
    (distinct, bounded) bit set — Spark broadcasts it; a hit needs all
    k positions, expressed as count == k after the inner join.
    """
    v = F.col(ngram_col).cast("string")
    probes = docs_ngrams.select(
        "*", F.posexplode(bloom_positions(v, m_bits, k)).alias("_i", "pos")
    )
    keys = [c for c in docs_ngrams.columns]
    return (
        probes.join(F.broadcast(bits), "pos")
        # countDistinct(_i): duplicate input rows group together and
        # would accumulate count == 2k under a plain count, silently
        # failing the == k test; distinct probe indices cap at k
        .groupBy(*keys)
        .agg(F.countDistinct("_i").alias("hits"))
        .filter(F.col("hits") == k)
        .drop("hits")
    )


# --------------------------------------------------------------------------
# Weighted sampling


def weighted_priority_sample(
    df: DataFrame, weight_col: str, n: int, seed: str = "wps", by: list[str] | None = None
) -> DataFrame:
    """Weight-proportional sample of n rows (per group, if ``by``):
    priority sampling with integer fixed-point priorities.

    This is sequential Poisson sampling (Ohlsson 1998): keep the n
    smallest u/w for uniform u — the uniform-key sibling of
    Efraimidis-Spirakis (which uses exponential keys (-ln u)/w; the
    two orderings agree in distribution family but not pointwise, and
    both are approximately probability-proportional-to-size).  We pick
    the uniform-key form BECAUSE it stays integer: priority =
    (h30 << 30) div weight entirely in int64 (h30 = low 30 bits of the
    row hash; max value 2^60 < 2^63), so the ordering is exact and
    identical in any engine — no float pow/ln whose last ulp could
    flip a near-tie.

    The row hash is seeded from the first non-weight column, which must
    be a unique row key — callers should project (id, ..., weight).

    Global samples compile to TakeOrderedAndProject (per-partition
    top-n heaps, never a single-reducer sort); grouped samples use a
    group-partitioned window, parallel across groups.
    """
    idc = [c for c in df.columns if c != weight_col][:1]
    if not idc:
        raise ValueError("need at least one non-weight column as the row key")
    h = md5_hash60(F.concat(F.lit(seed + ":"), F.col(idc[0]).cast("string")))
    h30 = h % (1 << 30)
    # integer div keeps priorities exact: (h30 << 30) is up to 2^60,
    # beyond double's 2^53 integer range, so float division + floor
    # could mis-round — `div` never touches floats.
    #
    # Fractional weight columns (float/double/decimal) are scaled into
    # 2^20 fixed point first — a bare cast('long') would TRUNCATE
    # weights in (0, 1) to 0 and the "weight-proportional" sample would
    # silently degenerate to uniform.  Integer weights keep the
    # unscaled denominator, so their selection is bit-identical to the
    # pre-fix behavior (and to the SQL oracle).  Fixed-point floor can
    # add priority ties that exact rational ordering lacks; ties break
    # deterministically on the row key, never invert.
    wtype = dict(df.dtypes)[weight_col]
    if wtype in ("float", "double") or wtype.startswith("decimal"):
        den = F.round(F.col(weight_col) * (1 << 20)).cast("long")
    else:
        den = F.col(weight_col).cast("long")
    with_prio = (
        df.withColumn("_num", F.shiftleft(h30, 30))
        .withColumn("_den", F.greatest(den, F.lit(1)))
        .withColumn("_prio", F.expr("_num div _den"))
        .drop("_num", "_den")
    )
    if not by:
        return with_prio.orderBy("_prio", idc[0]).limit(n).drop("_prio")
    win = Window.partitionBy(*by).orderBy("_prio", idc[0])
    return (
        with_prio.withColumn("_rk", F.row_number().over(win))
        .filter(F.col("_rk") <= n)
        .drop("_prio", "_rk")
    )


# --------------------------------------------------------------------------
# driver-side register folding (for sidecar-maintained sketches)


def hll_registers_dict(df: DataFrame, col: str, p: int = 12) -> dict[int, int]:
    """The register table as a python dict — a BOUNDED collect (at most
    2^p rows by construction), for persisting a sketch into small
    metadata (a pool sidecar, a manifest) rather than a table."""
    return {
        r["bucket"]: r["register"] for r in hll_registers(df, col, p).collect()
    }


def merge_register_dicts(a: dict[int, int], b: dict[int, int]) -> dict[int, int]:
    """Register-wise max — same lossless union as ``hll_merge``, driver
    side.  max is IDEMPOTENT: merging the same batch's registers twice
    is a no-op, so even an at-least-once replay cannot inflate the
    sketch (unlike a counter)."""
    out = dict(a)
    for k, v in b.items():
        if v > out.get(k, 0):
            out[k] = v
    return out


def estimate_from_register_dict(regs: dict[int, int], p: int = 12) -> int:
    """The HLL estimate from a register dict — same integer sufficient
    statistics and float expression as ``_estimate_from_registers``
    (sums of exact ints, one double division), so the driver-side and
    DataFrame-side estimates agree exactly."""
    import math

    m = 1 << p
    rmax = HASH_BITS - p + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    nonzero = len(regs)
    s_present = sum(1 << (rmax - r) for r in regs.values())
    s_total = s_present + (m - nonzero) * (1 << rmax)
    raw = (alpha * m * m * float(1 << rmax)) / float(s_total)
    zeros = m - nonzero
    if raw <= 2.5 * m and zeros > 0:
        return round(float(m) * math.log(float(m) / float(zeros)))
    return round(raw)


# --------------------------------------------------------------------------
# HDR-style log-linear histogram (mergeable quantiles)


def hdr_histogram(df: DataFrame, col: str, mantissa_bits: int = 4) -> DataFrame:
    """Log-linear histogram over a non-negative integer column — the
    HdrHistogram layout: bucket width 2^(exponent - mantissa_bits), so
    relative error is bounded by 2^-mantissa_bits (~6% at 4 bits, ~0.4%
    at 8) while the whole sketch stays <= ~64 * 2^mb rows.

    The percentile-without-a-sort primitive: ONE partial-aggregated
    groupBy (same bounded-shuffle shape as HLL), and histograms from
    different slices/days MERGE by adding counts — which no exact-
    quantile plan can do.  All-integer bucketing (exponent from
    length(bin(v)), lo = v - v % width — no float log2/pow edges), so a
    DuckDB oracle reproduces the sketch bit-for-bit.

    Returns (bucket_lo, bucket_hi, n): v landed in [bucket_lo,
    bucket_hi); zeros take [0, 1).  Negative inputs are the caller's
    contract to exclude (they'd raise in bin()).
    """
    mb = mantissa_bits
    base = df.select(F.col(col).cast("long").alias("__v"))
    # exponent = length(bin(v)) = floor(log2 v) + 1 for v > 0
    width = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), "
        f"greatest(CAST(length(bin(__v)) AS INT) - 1 - {mb}, 0))"
    )
    lo = F.col("__v") - F.col("__v") % width
    return (
        base.select(
            F.when(F.col("__v") == 0, F.lit(0).cast("long"))
            .otherwise(lo)
            .alias("bucket_lo"),
            F.when(F.col("__v") == 0, F.lit(1).cast("long"))
            .otherwise(lo + width)
            .alias("bucket_hi"),
        )
        .groupBy("bucket_lo", "bucket_hi")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def hdr_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two histograms: counts add per bucket (lossless — same
    cross-slice rollup property as hll_merge)."""
    return (
        a.unionByName(b)
        .groupBy("bucket_lo", "bucket_hi")
        .agg(F.sum("n").alias("n"))
    )


def hdr_quantiles(hist: DataFrame, qs: list[float]) -> DataFrame:
    """Quantile estimates from a histogram: cumulative-count walk over
    the (bounded) bucket table + exact-integer interpolation inside the
    landing bucket.

    rank(q) = ceil(q * N) (1-based); within the bucket holding that
    rank, estimate = lo + ((rank - cum_before - 1) * (hi - lo)) div n.
    Integer div end to end, so the result is engine-exact.  The window
    runs over BUCKET rows (<= ~64 * 2^mb), never data rows; N is a
    1-row broadcast.  Returns (q, estimate) per requested quantile.
    """
    spark = hist.sparkSession
    # hist is sketch-bounded (<= ~64 * 2^mb rows) but computing it is a
    # full corpus aggregation; it has TWO consumers here (the total and
    # the cumulative walk), so cut the plan to run that pass once
    # (r12, guide §5)
    hist = hist.localCheckpoint(eager=False)
    # NB: Spark resolution is case-insensitive by default, so the
    # total's column must not be spelled `N` next to the buckets' `n`
    total = hist.groupBy().agg(F.sum("n").alias("total_n"))
    w = Window.orderBy("bucket_lo").rowsBetween(Window.unboundedPreceding, -1)
    cum = hist.withColumn("cum_before", F.coalesce(F.sum("n").over(w), F.lit(0)))
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q DOUBLE")
    ranked = qdf.crossJoin(F.broadcast(total)).withColumn(
        # greatest(1, ...): q=0 gives ceil(0)=0, which matches no
        # bucket's (cum_before, cum_before+n] interval and would drop
        # the row; rank 1 lands it on the first bucket's minimum
        "rank",
        F.greatest(F.ceil(F.col("q") * F.col("total_n")).cast("long"), F.lit(1)),
    )
    hit = ranked.join(
        cum,
        (F.col("rank") > F.col("cum_before"))
        & (F.col("rank") <= F.col("cum_before") + F.col("n")),
    )
    est = F.col("bucket_lo") + F.expr(
        "(rank - cum_before - 1) * (bucket_hi - bucket_lo) div n"
    )
    return hit.select("q", est.alias("estimate"))


# --------------------------------------------------------------------------
# KMV set-intersection (sketch-space Jaccard between groups)


def kmv_group_signatures(
    df: DataFrame, group_col: str, col: str, k: int = 256
) -> DataFrame:
    """Per-group KMV signature: the k smallest distinct hashes of
    ``col``, as a sorted array — (group, sig).  Build is a distinct +
    per-group top-k (window over the group, state bounded by k), and
    the signature is a fixed <= k-long array per group however large
    the group's value set is."""
    h = md5_hash60(F.col(col).cast("string"))
    hashes = df.select(F.col(group_col).alias("g"), h.alias("h")).distinct()
    w = Window.partitionBy("g").orderBy("h")
    return (
        hashes.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .groupBy("g")
        .agg(F.array_sort(F.collect_list("h")).alias("sig"))
        .select(F.col("g").alias(group_col), "sig")
    )


def kmv_pairwise_jaccard(sigs: DataFrame, group_col: str, k: int = 256) -> DataFrame:
    """Jaccard estimate between every group pair from KMV signatures
    alone (Beyer et al. 2007): for sets A, B with signatures SA, SB,
    take the k smallest of SA ∪ SB; the fraction of those present in
    BOTH signatures estimates |A∩B|/|A∪B|.

    All sketch-space: array ops over <= k-long arrays in a pairwise
    join of GROUPS (tiny — #groups², not data²).  `common` and `denom`
    are exact integers; the ratio is one double division, so the
    estimate is engine-exact.  This is the 100 TB form of the exact
    source_vocab_overlap matrix: signatures build in one pass, overlap
    costs sketch-sized work per pair.
    """
    # sigs is sketch-bounded (one <= k-long row per group) but BUILDING
    # it is a corpus pass (distinct + per-group top-k window); both
    # sides of the pairwise join inline it, so cut the plan to build
    # once (r12, guide §5)
    sigs = sigs.localCheckpoint(eager=False)
    a = sigs.select(F.col(group_col).alias("ga"), F.col("sig").alias("sa"))
    b = sigs.select(F.col(group_col).alias("gb"), F.col("sig").alias("sb"))
    pairs = a.join(b, F.col("ga") < F.col("gb"))
    union_kmin = F.slice(
        F.array_sort(F.array_union(F.col("sa"), F.col("sb"))), 1, k
    )
    common = F.size(
        F.array_intersect(F.array_intersect(union_kmin, F.col("sa")), F.col("sb"))
    )
    denom = F.size(union_kmin)
    return pairs.select(
        F.col("ga").alias("a"),
        F.col("gb").alias("b"),
        common.cast("long").alias("common"),
        denom.cast("long").alias("denom"),
        F.round(common.cast("double") / denom, 6).alias("jaccard_est"),
    )


def kmv_join_size(
    a: DataFrame,
    a_key: str,
    b: DataFrame,
    b_key: str,
    k: int = 256,
) -> DataFrame:
    """Equi-join cardinality estimate — the planner-side question
    ("how big is A JOIN B on key?") answered without running the join.

    KMV + sample-probe (the Beyer et al. distinct machinery extended
    with multiplicities): take the k smallest hashes of the DISTINCT
    key union (TakeOrderedAndProject — per-partition heaps, k rows);
    the k-th min estimates the union size U; then probe BOTH sides
    with the k-key sample (broadcast semi-joins — the only passes over
    the data, each a pushed-down hash probe + partial-agg count) for
    exact per-key multiplicities, and scale:

        |A JOIN B|  ~=  sum over sample keys of cA * cB  *  U / got

    where ``got = |sample|`` — equal to k in the sketching regime
    (each distinct union key lands in the sample w.p. ~k/U), and equal
    to U when the key space is smaller than k, making the estimate
    EXACT there (the sample is the population and the factor is 1).
    All
    arithmetic after the one rounded U estimate is integer trunc-div,
    so the result is engine-exact and oracle-checkable.  Returns 1 row
    (estimate, sampled_pairs, union_est, sample_k).
    """
    space = float(1 << HASH_BITS)
    ka = a.select(F.col(a_key).cast("string").alias("key")).distinct()
    kb = b.select(F.col(b_key).cast("string").alias("key")).distinct()
    union_keys = ka.unionByName(kb).distinct().select(
        "key", md5_hash60(F.col("key")).alias("h")
    )
    # materialize the <=k-row sample ONCE: it feeds three subtrees
    # (the kth/got aggregate and one broadcast probe per side), and
    # without the cut Catalyst inlines the whole union-distinct +
    # TakeOrdered pipeline into each consumer — 3 full scans of BOTH
    # inputs per action instead of 1 (r12 optimization; lazy local
    # checkpoint, not persist, so a re-run never reuses stale data).
    sample = union_keys.orderBy("h").limit(k).localCheckpoint(eager=False)
    kth = sample.groupBy().agg(
        F.max("h").alias("kth"), F.count(F.lit(1)).alias("got")
    )
    u_est = F.when(F.col("got") < k, F.col("got")).otherwise(
        F.round(F.lit((k - 1) * space) / F.col("kth").cast("double")).cast("long")
    )
    ca = (
        a.select(F.col(a_key).cast("string").alias("key"))
        .join(F.broadcast(sample.select("key")), "key")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("ca"))
    )
    cb = (
        b.select(F.col(b_key).cast("string").alias("key"))
        .join(F.broadcast(sample.select("key")), "key")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    s = (
        ca.join(cb, "key")
        .groupBy()
        .agg(F.coalesce(F.sum(F.expr("ca * cb")), F.lit(0)).cast("long").alias("s"))
    )
    return (
        kth.crossJoin(s)
        .select(
            F.col("s"),
            u_est.alias("union_est"),
            F.col("got").cast("long").alias("sample_k"),
        )
        .select(
            F.expr("(s * union_est) div sample_k").alias("estimate"),
            F.col("s").alias("sampled_pairs"),
            "union_est",
            "sample_k",
        )
    )
