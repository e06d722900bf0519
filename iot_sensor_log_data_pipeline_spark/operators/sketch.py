"""Count-Min sketch over a distributed corpus, expressed as DataFrame
aggregation (Cormode & Muthukrishnan 2005) -- the mergeable frequency
sketch for heavy-hitter queries when exact per-key counts don't fit.

Spark-first shape: the sketch IS a DataFrame of ((row, bucket), count)
cells -- built with ONE exact pre-aggregation per key (map-side
combine does the heavy lifting) followed by one (d x distinct-keys)
explode and a second keyed aggregation into d*w cells.  Sketches built
this way merge for free (union + re-aggregate), exactly the property
that makes CMS useful across partitions/days/shards at 100 TB.

Hashing is md5-salted per row (content-derived, engine-portable), so
the DuckDB oracle replays the whole sketch bit-for-bit -- same
discipline as the MinHash pipeline (operators/dedup.py).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Default geometry: 4 rows x 1024 buckets => overestimate bound
#: ~ 2N/w per row with failure probability ~ (1/2)^d on the min.
CMS_DEPTH = 4
CMS_WIDTH = 1024


def cms_bucket(key: Column, row: int, width: int = CMS_WIDTH) -> Column:
    """Row-``row``'s bucket for ``key``: md5 of the row-salted key,
    first 8 hex chars as an integer, mod width."""
    salted = F.concat_ws("#", key, F.lit(str(row)))
    return (
        F.conv(F.substring(F.md5(salted.cast("binary")), 1, 8), 16, 10).cast("long")
        % width
    )


def cms_build(
    keyed_counts: DataFrame,
    key_col: str = "key",
    count_col: str = "n",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(row, bucket, cell_count) cells from exact per-key counts.

    Feed this PRE-AGGREGATED (key, count) pairs, not raw occurrences:
    the exact pre-aggregation is one map-side-combined shuffle on the
    key, after which the sketch explode touches one row per DISTINCT
    key -- the construction stays linear in distinct keys, not corpus
    positions."""
    cells = keyed_counts.select(
        F.col(count_col).alias("_n"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        cms_bucket(F.col(key_col), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cell"),
    )
    return (
        cells.groupBy(
            F.col("cell.row").alias("row"), F.col("cell.bucket").alias("bucket")
        )
        .agg(F.sum("_n").alias("cell_count"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str = "key",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-query estimates: for each probe key, min over the sketch's
    d cells it hashes into (CMS guarantees estimate >= true count).
    The sketch (d*w cells, KBs) broadcasts onto the probes."""
    probe_cells = probes.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        cms_bucket(F.col(key_col), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(key_col, F.col("cell.row").alias("row"), F.col("cell.bucket").alias("bucket"))
    return (
        probe_cells.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy(key_col)
        .agg(F.min("cell_count").alias("est_count"))
    )


#: HyperLogLog geometry: 2^HLL_P registers; the md5's first 2 hex chars
#: are the register index (p=8), the next 12 hex chars (48 bits) feed
#: the leading-zero rank.
HLL_P = 8
HLL_M = 1 << HLL_P
_HLL_RANK_BITS = 48


def hll_registers(
    df: DataFrame,
    key_col: str,
    p: int = HLL_P,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(register, max_rank) HyperLogLog register table (Flajolet et al.
    2007) -- the mergeable distinct-count sketch as a DataFrame.

    One map-side-combined ``max`` aggregation over at most 2^p rows of
    shuffle: the scale shape that replaces exact count-distinct when
    keys don't fit.  Merging sketches = union + re-max, same free
    property as the Count-Min cells.

    Integer-exact rank: the bit length of the 48-bit hash suffix comes
    from ``conv(hex, 16, 2)`` string length (Spark) / ``bin()`` length
    (DuckDB oracle) -- never floating log2, whose last-ulp differences
    across libm implementations would flip ranks at power-of-two
    boundaries."""
    assert p == 8, "register index uses the first 2 hex chars (p=8)"
    digest = F.md5(F.col(key_col).cast("string").cast("binary"))
    suffix = F.substring(digest, 3, 12)
    v = F.conv(suffix, 16, 10).cast("long")
    bitlen = F.when(v == 0, F.lit(0)).otherwise(F.length(F.conv(suffix, 16, 2)))
    return (
        df.select(
            *group_cols,
            F.conv(F.substring(digest, 1, 2), 16, 10).cast("long").alias("register"),
            (F.lit(_HLL_RANK_BITS) - bitlen + 1).cast("long").alias("rank"),
        )
        .groupBy(*group_cols, "register")
        .agg(F.max("rank").alias("max_rank"))
    )


def hll_estimate(
    registers: DataFrame,
    p: int = HLL_P,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One-row cardinality estimate from a register table.

    The harmonic-mean denominator is summed as EXACT integers
    (``sum(2^(49 - max_rank))`` in longs, absent registers contributing
    ``2^49``), so the estimate is bit-deterministic across engines and
    partitionings; the small-range linear-counting correction applies
    below 2.5m when empty registers remain."""
    m = 1 << p
    two49 = 1 << (_HLL_RANK_BITS + 1)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.groupBy(*group_cols).agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({_HLL_RANK_BITS + 1} - max_rank AS INT))")
        ).alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    zeros = F.lit(m) - F.col("n_present")
    s_total = F.col("s_present") + zeros * F.lit(two49)
    e_raw = F.lit(alpha * m * m * float(two49)) / s_total.cast("double")
    corrected = F.when(
        (e_raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(e_raw)
    return agg.select(*group_cols, F.round(corrected, 4).alias("est_distinct"))


#: Bloom-filter geometry: bits sized for ~1M keys at ~1% fp with k=4.
BLOOM_BITS = 1 << 20
BLOOM_K = 4


def _bloom_buckets(key: Column, n_bits: int, k: int) -> Column:
    """The k bucket indices for a key (seed-salted xxhash64, folded to
    [0, n_bits) with a sign-safe double modulo)."""
    return F.array(
        *[
            (
                (F.xxhash64(F.concat_ws("#", key.cast("string"), F.lit(str(i)))) % n_bits)
                + n_bits
            )
            % n_bits
            for i in range(k)
        ]
    )


def bloom_prune_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_bits: int = BLOOM_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Inner equi-join with bloom-filter pre-pruning of the fact side:
    EXACT results (no false negatives), but fact rows whose key cannot
    be in ``dim`` are dropped BEFORE the join shuffle -- the classic
    shuffle-volume reducer when the dim side is too big to broadcast
    as a hash join yet its key set fits a bloom filter (128 KB here).

    Build: dim keys -> k buckets -> distinct -> bit_or-aggregated
    64-bit words (one short shuffle of <= n_bits/64 rows), collected as
    a NumPy bitset into an Arrow-UDF closure (the sketch-to-driver
    pattern; same closure-shipping rationale as the SRP planes and IVF
    centroids -- a 16K-element literal array would compile for
    seconds).  Probe: vectorized bitset test per Arrow batch.
    """
    words = (
        dim.select(
            F.explode(_bloom_buckets(F.col(dim_key), n_bits, k)).alias("b")
        )
        .distinct()
        .groupBy((F.col("b") / 64).cast("long").alias("w"))
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(b % 64 AS INT))")
            ).alias("bits")
        )
        .collect()
    )
    bitset = np.zeros(n_bits // 64, dtype=np.int64)
    for r in words:
        bitset[r["w"]] = r["bits"]

    @F.pandas_udf(T.BooleanType())
    def might_contain(buckets: pd.Series) -> pd.Series:
        if len(buckets) == 0:
            return pd.Series([], dtype=bool)
        B = np.vstack(buckets.to_numpy()).astype(np.int64)  # (n, k)
        hit = (bitset[B >> 6] >> (B & 63)) & 1
        return pd.Series(hit.all(axis=1))

    pruned = fact.where(
        might_contain(_bloom_buckets(F.col(fact_key), n_bits, k))
    )
    return pruned.join(dim, pruned[fact_key] == dim[dim_key])


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    n_bins: int = 128,
) -> DataFrame:
    """Quantile estimates from an equi-width histogram sketch: one
    min/max/count scalar pass, one binned-count aggregation, then
    linear interpolation inside the bin holding each target rank.

    The deterministic, oracle-replayable member of the quantile family
    (``approx_percentile``'s internal sketch is engine-specific, so its
    catalog row is rows-only by design).  Error is bounded by one bin
    width of the value range -- the classic histogram-quantile
    trade-off.  At 100 TB the sketch is the point: bin counts are
    mergeable by addition across partitions/shards/days (map-side
    combine does almost all the work), the scalar stats row is a 1-row
    broadcast (scalar-subquery BNLJ shape, allowlisted), and the
    cumulative walk runs over <= ``n_bins`` rows on one task --
    bounded, never data-scaled.

    FP discipline: bin index and bin-edge arithmetic use the identical
    operand order in Spark and the DuckDB oracle (``((v - lo) * n_bins)
    / (hi - lo)``), so IEEE mul/div rounding matches bit-for-bit;
    estimates round to 1e-6.
    """
    from pyspark.sql.window import Window

    v = F.col(value_col).cast("double")
    stats = df.agg(
        F.min(v).alias("lo"), F.max(v).alias("hi"), F.count(v).alias("n")
    )
    # NULLs are excluded from the sketch entirely: ``n`` above already
    # skips them (count(v)), and an unfiltered scan would send them to
    # a NULL bin group that the cumulative window counts first (Spark
    # sorts NULL bins ahead of 0), skewing every quantile estimate.
    binned = (
        df.select(v.alias("__v"))
        .where(F.col("__v").isNotNull())
        .crossJoin(F.broadcast(stats))
        .select(
            # hi == lo (all values equal) must short-circuit BEFORE the
            # division -- ANSI mode raises on x/0 even inside a branch
            # that rounds away (found by the hypothesis error-bound
            # property test).
            F.when(F.col("hi") == F.col("lo"), F.lit(0))
            .otherwise(
                F.least(
                    F.floor(
                        (F.col("__v") - F.col("lo"))
                        * n_bins
                        / (F.col("hi") - F.col("lo"))
                    ).cast("int"),
                    F.lit(n_bins - 1),
                )
            )
            .alias("bin"),
            "lo",
            "hi",
            "n",
        )
    )
    counts = binned.groupBy("bin", "lo", "hi", "n").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # <= n_bins rows: a global cumulative window here is bounded by the
    # sketch geometry, not the data.
    cum = counts.withColumn(
        "cum", F.sum("cnt").over(Window.orderBy("bin"))
    )
    qtab = cum.sparkSession.range(1).select(
        F.explode(F.array(*[F.lit(float(q)) for q in quantiles])).alias("q")
    )
    target = F.col("q") * F.col("n")
    width = (F.col("hi") - F.col("lo")) / n_bins
    frac = (target - (F.col("cum") - F.col("cnt"))) / F.col("cnt")
    est = F.when(F.col("hi") == F.col("lo"), F.col("lo")).otherwise(
        F.col("lo") + (F.col("bin") + frac) * width
    )
    return (
        cum.join(
            F.broadcast(qtab),
            (F.col("cum") >= target) & ((F.col("cum") - F.col("cnt")) < target),
        )
        .select("q", F.round(est, 6).alias("estimate"))
        .orderBy("q")
    )


def misra_gries_summaries(
    df: DataFrame, key_col: str = "key", k: int = 256
) -> DataFrame:
    """Per-partition Misra-Gries frequency summaries: at most ``k``
    (key, count_lo) rows per partition, where ``count_lo``
    underestimates the true partition count by at most
    ``n_partition / (k + 1)`` (Misra & Gries 1982; the weighted
    batch-decrement form of Berinde et al. 2010).

    The deterministic, mergeable heavy-hitter sketch: summaries merge
    by union + per-key SUM (counts only ever under-approximate, and
    errors add), so a 1000-executor corpus produces <= k rows per
    partition regardless of distinct-key cardinality -- the property
    that makes top-k frequency queries feasible when exact per-key
    counts would themselves be a 100 TB shuffle.

    Arrow path: one ``mapInPandas`` pass; each task folds its batches
    into a k-counter dict (per batch: pandas ``value_counts`` first,
    so the Python loop runs per DISTINCT key in the batch, not per
    row).  No shuffle -- the summary is emitted where the data sits.

    NULL keys count like any other key (a NULL GROUP BY group can be a
    heavy hitter too): per batch they are tallied via ``isna()`` into
    one sentinel counter -- not through ``value_counts``, whose NaN
    representation is not a stable dict key across batches -- and
    emitted as a NULL summary row.
    """
    sentinel = object()  # in-fold stand-in for the NULL key

    def fold(batches):
        counters: dict = {}

        def add(key, c: int) -> None:
            nonlocal counters
            if key in counters:
                counters[key] += c
            elif len(counters) < k:
                counters[key] = c
            else:
                # Weighted decrement: subtracting delta from every
                # counter AND the incoming weight preserves the MG
                # invariant (total decrement per unit <= n/(k+1)).
                delta = min(min(counters.values()), c)
                c -= delta
                counters = {
                    ky: cnt - delta for ky, cnt in counters.items() if cnt > delta
                }
                if c > 0:
                    counters[key] = c

        for pdf in batches:
            s = pdf[key_col]
            n_null = int(s.isna().sum())
            if n_null:
                add(sentinel, n_null)
            for key, c in s.dropna().value_counts().items():
                add(key, int(c))
        yield pd.DataFrame(
            {
                key_col: [
                    None if ky is sentinel else ky for ky in counters
                ],
                "count_lo": [int(v) for v in counters.values()],
            }
        )

    field = df.schema[key_col]
    out_schema = T.StructType(
        [field, T.StructField("count_lo", T.LongType(), False)]
    )
    return df.select(key_col).mapInPandas(fold, schema=out_schema)


def heavy_hitters(
    df: DataFrame,
    key_col: str = "key",
    phi: float = 0.01,
    k: int | None = None,
) -> DataFrame:
    """EXACT phi-heavy hitters (keys with frequency >= ``phi`` of all
    rows) computed sketch-first: per-partition Misra-Gries summaries
    nominate candidates, an exact recount over just the candidates
    verifies.  Result is deterministic and partitioning-independent.

    Completeness: with ``k >= ceil(1/phi) - 1`` counters, any key with
    global count >= phi*n exceeds its partition's n_p/(k+1) error bound
    on at least one partition (pigeonhole over sum n_p = n), so it
    survives in that partition's summary -- the candidate union misses
    no true heavy hitter.  The recount then discards false positives,
    so the output equals the exact GROUP BY answer at a fraction of its
    cost: the only key-shuffle is over candidate keys (<= k per
    partition), and the recount is a broadcast-semi-join + count.
    The recount joins NULL-SAFE (``<=>``), so a NULL key that clears
    phi*n is reported like any other group, matching GROUP BY.
    """
    if k is None:
        k = max(int(1.0 / phi), 8)
    n = df.count()
    cand = (
        misra_gries_summaries(df, key_col=key_col, k=k)
        .select(F.col(key_col).alias("__cand_key"))
        .distinct()
    )
    exact = (
        df.join(
            F.broadcast(cand),
            F.col(key_col).eqNullSafe(F.col("__cand_key")),
            "left_semi",
        )
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    return exact.where(
        F.col("n_occurrences") >= F.ceil(F.lit(float(phi)) * F.lit(n))
    ).select(
        key_col,
        "n_occurrences",
        F.round(F.col("n_occurrences") / F.lit(n), 6).alias("frac"),
    )


#: Default DDSketch relative accuracy: estimates are within 1% of the
#: true value at the target rank.
DD_ALPHA = 0.01


def _dd_gamma(alpha: float) -> float:
    return (1.0 + float(alpha)) / (1.0 - float(alpha))


def dd_bucket(value: Column, alpha: float = DD_ALPHA) -> Column:
    """DDSketch bucket index for a positive value: ``ceil(ln(v) /
    ln(gamma))`` with ``gamma = (1+alpha)/(1-alpha)`` (Masson, Rim &
    Lee 2019).  Bucket ``i`` covers ``(gamma^(i-1), gamma^i]``, so the
    bucket midpoint-in-log-space ``2*gamma^i/(gamma+1)`` is within
    ``alpha`` RELATIVE error of every value in the bucket -- the
    guarantee an equi-width histogram cannot give across magnitudes.

    The log ratio is rounded to 1e-9 before ``ceil`` so Spark and the
    DuckDB oracle agree even if their libm ``ln`` differs in the last
    ulp -- same cross-engine determinism discipline as the md5 bucket
    hashing above.
    """
    gamma = _dd_gamma(alpha)
    return F.ceil(
        F.round(F.log(value.cast("double")) / F.lit(math.log(gamma)), 9)
    ).cast("long")


def ddsketch_buckets(
    df: DataFrame, value_col: str, alpha: float = DD_ALPHA
) -> DataFrame:
    """Fold a value column into DDSketch bucket counts ``(idx, cnt)``.

    The 100-TB properties histograms get from binning, without the
    min/max pre-pass: bucket boundaries depend only on ``alpha`` (never
    on the data), so sketches built on different partitions / days /
    shards MERGE by per-idx count addition with the error bound
    unchanged -- quantiles over a year of telemetry cost one union +
    re-sum of tiny bucket tables.  Bucket count is bounded by dynamic
    range, not rows: values spanning 1e-9..1e9 fit in ~2,100 buckets
    at alpha=0.01.  One exact keyed aggregation (map-side combine);
    no shuffle wider than the bucket table.

    Values ``<= 0`` and NULL are excluded (DDSketch models positive
    reals -- latencies, sizes, prices); callers with signed data
    sketch the two signs separately.
    """
    v = F.col(value_col).cast("double")
    return (
        df.where(v > 0)
        .select(dd_bucket(v, alpha).alias("idx"))
        .groupBy("idx")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def ddsketch_quantiles(
    buckets: DataFrame,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    alpha: float = DD_ALPHA,
) -> DataFrame:
    """Quantile estimates from a DDSketch bucket table: for target rank
    ``floor(q*(n-1)) + 1`` take the first bucket whose cumulative count
    reaches it, and report the bucket's midpoint-in-log-space
    ``2*gamma^idx/(gamma+1)`` -- within ``alpha`` relative error of the
    exact order statistic at that rank (pinned by pytest against NumPy
    on lognormal data).

    The cumulative window runs over the bucket table (bounded by the
    sketch geometry, never data-scaled) and the totals row is a 1-row
    broadcast -- same plan shape as ``histogram_quantiles``.
    """
    from pyspark.sql.window import Window

    gamma = _dd_gamma(alpha)
    cum = buckets.withColumn("cum", F.sum("cnt").over(Window.orderBy("idx")))
    totals = buckets.agg(F.sum("cnt").alias("n"))
    qtab = buckets.sparkSession.range(1).select(
        F.explode(F.array(*[F.lit(float(q)) for q in quantiles])).alias("q")
    )
    rank = F.floor(F.col("q") * (F.col("n") - 1)) + 1
    est = F.lit(2.0) * F.pow(F.lit(gamma), F.col("idx")) / F.lit(gamma + 1.0)
    return (
        cum.crossJoin(F.broadcast(totals))
        .join(
            F.broadcast(qtab),
            (F.col("cum") >= rank) & ((F.col("cum") - F.col("cnt")) < rank),
        )
        .select("q", F.round(est, 6).alias("estimate"))
        .orderBy("q")
    )


def ddsketch_buckets_grouped(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    alpha: float = DD_ALPHA,
) -> DataFrame:
    """Per-group DDSketch bucket counts ``(*group_cols, idx, cnt)`` --
    one keyed aggregation for EVERY group's sketch at once (map-side
    combine collapses each partition to distinct (group, idx) pairs),
    vs one job per group with ``approx_percentile``-style loops.
    Same exclusion rule as ``ddsketch_buckets``: values <= 0 / NULL."""
    v = F.col(value_col).cast("double")
    return (
        df.where(v > 0)
        .select(*group_cols, dd_bucket(v, alpha).alias("idx"))
        .groupBy(*group_cols, "idx")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def ddsketch_quantiles_grouped(
    buckets: DataFrame,
    group_cols: list[str],
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    alpha: float = DD_ALPHA,
) -> DataFrame:
    """Per-group quantile estimates from grouped DDSketch buckets:
    the cumulative walk runs under a window PARTITIONED BY the group
    (each task walks its own groups' <= geometry-bounded bucket rows
    -- no single-task global window), group totals come from one more
    keyed aggregation, and the rank pick is a per-group range join of
    the tiny quantile table.  "p99 latency per tenant over a year"
    as two aggregations + a bounded walk, every group in one plan."""
    from pyspark.sql.window import Window

    gamma = _dd_gamma(alpha)
    cum = buckets.withColumn(
        "cum", F.sum("cnt").over(Window.partitionBy(*group_cols).orderBy("idx"))
    )
    totals = buckets.groupBy(*group_cols).agg(F.sum("cnt").alias("n"))
    qtab = buckets.sparkSession.range(1).select(
        F.explode(F.array(*[F.lit(float(q)) for q in quantiles])).alias("q")
    )
    rank = F.floor(F.col("q") * (F.col("n") - 1)) + 1
    est = F.lit(2.0) * F.pow(F.lit(gamma), F.col("idx")) / F.lit(gamma + 1.0)
    return (
        cum.join(totals, group_cols)
        .join(
            F.broadcast(qtab),
            (F.col("cum") >= rank) & ((F.col("cum") - F.col("cnt")) < rank),
        )
        .select(*group_cols, "q", F.round(est, 6).alias("estimate"))
        .orderBy(*group_cols, "q")
    )


def hll_set_overlap(
    df: DataFrame,
    key_col: str,
    group_col: str,
    p: int = HLL_P,
) -> DataFrame:
    """Pairwise distinct-set overlap between groups from ONE pass of
    HyperLogLog sketches: |A|, |B|, |A u B| by register-wise max-merge
    (the sketch's defining mergeability -- union costs nothing beyond
    re-max), |A n B| by inclusion-exclusion, and the derived Jaccard --
    the cross-source vocabulary/user/id overlap read that would
    otherwise need an exact distinct of every pairwise union (a
    corpus-sized shuffle PER PAIR at 100 TB; here each extra pair
    re-aggregates <= 2^p already-built register rows).

    Standard sketch composition (union is exact-in-sketch; the
    intersection estimate inherits inclusion-exclusion's additive
    error, fine for the macro read this serves -- per-pair error
    bounds are pinned in pytest).  Output per (a < b) pair:
    ``est_a/est_b/est_union/est_intersect/est_jaccard``.

    Shape: one grouped register build (the only corpus-sized agg),
    then everything downstream is (n_groups + n_pairs) x 2^p rows:
    a tiny group-list self-join, two register equi-joins, one re-max,
    the estimate aggs.  All estimate arithmetic reuses
    ``hll_estimate``'s integer-exact denominators, so the whole report
    replays in one SQL statement."""
    regs = hll_registers(df, key_col, p=p, group_cols=(group_col,))
    return hll_overlap_from_registers(regs, group_col, p=p)


def hll_overlap_from_registers(
    regs: DataFrame, group_col: str, p: int = HLL_P
) -> DataFrame:
    """The pair algebra of ``hll_set_overlap`` over an ALREADY-BUILT
    grouped register table -- so a persisted streaming register store
    (``streaming/pipeline.py:load_hll_store``) yields the same live
    overlap report without re-scanning any corpus."""
    est = hll_estimate(regs, p=p, group_cols=(group_col,))
    groups = regs.select(group_col).distinct()
    pairs = groups.select(F.col(group_col).alias("ga")).join(
        groups.select(F.col(group_col).alias("gb")),
        F.col("ga") < F.col("gb"),
    )
    ra = pairs.join(
        regs.withColumnRenamed(group_col, "ga"), "ga"
    ).select("ga", "gb", "register", "max_rank")
    rb = pairs.join(
        regs.withColumnRenamed(group_col, "gb"), "gb"
    ).select("ga", "gb", "register", "max_rank")
    ureg = (
        ra.unionByName(rb)
        .groupBy("ga", "gb", "register")
        .agg(F.max("max_rank").alias("max_rank"))
    )
    uest = hll_estimate(ureg, p=p, group_cols=("ga", "gb")).withColumnRenamed(
        "est_distinct", "est_union"
    )
    ea = est.select(
        F.col(group_col).alias("ga"), F.col("est_distinct").alias("est_a")
    )
    eb = est.select(
        F.col(group_col).alias("gb"), F.col("est_distinct").alias("est_b")
    )
    inter = F.round(
        F.greatest(
            F.col("est_a") + F.col("est_b") - F.col("est_union"), F.lit(0.0)
        ),
        4,
    )
    return (
        uest.join(ea, "ga")
        .join(eb, "gb")
        .select(
            F.col("ga").alias(f"{group_col}_a"),
            F.col("gb").alias(f"{group_col}_b"),
            "est_a",
            "est_b",
            "est_union",
            inter.alias("est_intersect"),
            F.round(inter / F.col("est_union"), 6).alias("est_jaccard"),
        )
        .orderBy(f"{group_col}_a", f"{group_col}_b")
    )


def cms_join_size(
    left_counts: DataFrame,
    right_counts: DataFrame,
    key_col: str = "key",
    count_col: str = "n",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Equi-join OUTPUT-size estimate by Count-Min inner product
    (Cormode & Muthukrishnan 2005 §4.2): the true join size is
    sum_k n_a(k) * n_b(k) = <a, b>; the row-wise inner product of the
    two sketches' cells overestimates it (colliding keys only ADD
    mass), so min over the d rows is the classic a^T b estimator --
    upper-bounded error epsilon * ||a||_1 * ||b||_1 with the standard
    CMS guarantees.

    This is THE join-planning primitive at 100 TB: pricing a fact-fact
    join exactly needs a count-table equi-join (a shuffle of every
    distinct key on both sides); two fixed-geometry sketches (d x w
    cells each, KBs) answer it from one broadcast-sized join of cells
    -- and each side's sketch can come from a maintained stream store
    (``streaming/pipeline.py:load_cms_store``), so the price of a join
    against a live table is known WITHOUT scanning it.

    Returns ONE row (exact_pairs, est_pairs) -- the exact value rides
    along as the correctness gate (est >= exact by construction,
    asserted in pytest); production planning reads est alone."""
    a = cms_build(left_counts, key_col, count_col, depth=depth, width=width)
    b = cms_build(right_counts, key_col, count_col, depth=depth, width=width)
    ip = cms_inner_product(a, b)
    exact = (
        left_counts.select(key_col, F.col(count_col).alias("__na"))
        .join(
            right_counts.select(key_col, F.col(count_col).alias("__nb")),
            key_col,
        )
        .agg(F.coalesce(F.sum(F.col("__na") * F.col("__nb")), F.lit(0)).alias("exact_pairs"))
    )
    return exact.crossJoin(F.broadcast(ip)).select(
        F.col("exact_pairs").cast("long").alias("exact_pairs"),
        F.coalesce(F.col("est_pairs"), F.lit(0)).cast("long").alias("est_pairs"),
    )


def cms_inner_product(a_cells: DataFrame, b_cells: DataFrame) -> DataFrame:
    """The estimator core of ``cms_join_size`` over two ALREADY-BUILT
    cell tables (same geometry required): one row ``(est_pairs)`` =
    min over sketch rows of the cell-wise inner product.  Feed it two
    persisted streaming stores (``streaming/pipeline.py:
    load_cms_store``) and the join between two LIVE tables is priced
    without scanning either -- the cells are KB-sized, the join is
    broadcast-trivial."""
    return (
        a_cells.select("row", "bucket", F.col("cell_count").alias("ca"))
        .join(
            b_cells.select("row", "bucket", F.col("cell_count").alias("cb")),
            ["row", "bucket"],
        )
        .groupBy("row")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("ip"))
        .agg(F.min("ip").alias("est_pairs"))
    )
