"""Data profiling: per-column statistics in ONE pass over the table
(the training-data-pipeline health check: row counts, null rates,
distinct cardinalities, ranges).

All columns' aggregates run in a single HashAggregate (no per-column
jobs like ``DataFrame.describe``'s), then unpivot to one row per
column -- at 100 TB that is exactly one table scan.  Exact distinct
counts are an expand+aggregate; ``approx=True`` swaps in HLL++ for the
mergeable-sketch path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: list[str], approx: bool = False) -> DataFrame:
    """One-pass per-column profile: (column, n_rows, n_nulls,
    n_distinct, min_repr, max_repr) -- min/max rendered as strings so
    heterogeneous column types share one output schema."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        distinct = (
            F.approx_count_distinct(c) if approx else F.countDistinct(F.col(c))
        )
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nulls_{c}"),
            distinct.alias(f"__dist_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)

    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nulls_{c}").cast("long").alias("n_nulls"),
                F.col(f"__dist_{c}").cast("long").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_repr"),
                F.col(f"__max_{c}").alias("max_repr"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(per_col).alias("p")).select("p.*")


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    n_bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between a reference and a current
    snapshot of one numeric column -- the standard distribution-drift
    monitor of a production data pipeline (PSI < 0.1 stable, 0.1-0.25
    moderate shift, > 0.25 investigate).

    Bin edges come from the REFERENCE min/max (equi-width, the same
    sketch geometry as ``sketch.histogram_quantiles``); current values
    outside the reference range clamp into the edge bins, so drift
    beyond the old range shows up as edge-bin mass, never as dropped
    rows.  Per bin: share_ref, share_cur, and the PSI contribution
    ``(share_cur - share_ref) * ln(share_cur / share_ref)`` with
    ``eps`` flooring both shares (the conventional empty-bin guard).
    Total PSI = sum of the contributions.

    Scale shape: one min/max/count scalar pass over ref (1-row
    broadcast onto both sides), one binned hash agg per side (map-side
    combined), a bins-sized join -- the comparison itself never
    shuffles more than 2 x ``n_bins`` rows.  NULLs are excluded on
    both sides (the ``histogram_quantiles`` contract).
    """
    v = F.col(value_col).cast("double")
    stats = ref.agg(F.min(v).alias("lo"), F.max(v).alias("hi"))

    def binned_shares(df: DataFrame, share_name: str) -> DataFrame:
        b = (
            df.select(v.alias("__v"))
            .where(F.col("__v").isNotNull())
            .crossJoin(F.broadcast(stats))
            .select(
                F.when(F.col("hi") == F.col("lo"), F.lit(0))
                .otherwise(
                    F.greatest(
                        F.least(
                            F.floor(
                                (F.col("__v") - F.col("lo"))
                                * n_bins
                                / (F.col("hi") - F.col("lo"))
                            ).cast("int"),
                            F.lit(n_bins - 1),
                        ),
                        F.lit(0),
                    )
                )
                .alias("bin")
            )
        )
        counts = b.groupBy("bin").agg(F.count(F.lit(1)).alias("__c"))
        total = counts.agg(F.sum("__c").cast("double").alias("__t"))
        return counts.crossJoin(F.broadcast(total)).select(
            "bin", (F.col("__c") / F.col("__t")).alias(share_name)
        )

    spark = ref.sparkSession
    bins = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    r = binned_shares(ref, "share_ref")
    c = binned_shares(cur, "share_cur")
    joined = (
        bins.join(r, "bin", "left")
        .join(c, "bin", "left")
        .select(
            "bin",
            F.coalesce("share_ref", F.lit(0.0)).alias("share_ref"),
            F.coalesce("share_cur", F.lit(0.0)).alias("share_cur"),
        )
    )
    sr = F.greatest(F.col("share_ref"), F.lit(eps))
    sc = F.greatest(F.col("share_cur"), F.lit(eps))
    return joined.select(
        "bin",
        "share_ref",
        "share_cur",
        ((sc - sr) * F.log(sc / sr)).alias("psi_contrib"),
    )


def iqr_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    k: float = 1.5,
) -> DataFrame:
    """Per-group Tukey-fence outlier summary: fences at
    ``[p25 - k*IQR, p75 + k*IQR]`` (exact interpolated percentiles),
    reporting per group the fence values, row count, outlier count,
    and outlier fraction -- the robust (quantile-based) member of the
    anomaly family next to the rolling z-score (parametric, windowed)
    and PSI (distributional drift).

    Scale shape: one grouped percentile aggregation builds the fence
    table (group-count rows -- broadcast side), one join back tags
    rows, one grouped count-aggregate summarizes; skewed heavy groups
    ride AQE skew handling like any keyed agg.
    """
    v = F.col(value_col).cast("double")
    fences = df.groupBy(*group_cols).agg(
        F.percentile(v, 0.25).alias("__p25"),
        F.percentile(v, 0.75).alias("__p75"),
    ).select(
        *group_cols,
        (F.col("__p25") - k * (F.col("__p75") - F.col("__p25"))).alias("lo_fence"),
        (F.col("__p75") + k * (F.col("__p75") - F.col("__p25"))).alias("hi_fence"),
    )
    joined = df.join(F.broadcast(fences), group_cols)
    is_out = (v < F.col("lo_fence")) | (v > F.col("hi_fence"))
    return joined.groupBy(*group_cols).agg(
        F.first("lo_fence").alias("lo_fence"),
        F.first("hi_fence").alias("hi_fence"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(is_out.cast("long")).cast("long").alias("n_outliers"),
        (F.sum(is_out.cast("long")) / F.count(F.lit(1))).alias("outlier_frac"),
    )


def embedding_drift(
    ref: DataFrame,
    cur: DataFrame,
    out_dim: int = 4,
    n_bins: int = 10,
    dim: int = 64,
    vec_col: str = "embedding",
    token: str = "proj",
    eps: float = 1e-6,
) -> DataFrame:
    """Embedding-DISTRIBUTION drift between two corpus snapshots: JL
    random projection (``similarity.projection_planes`` -- the
    md5-derived, SQL-replayable matrix) maps each vector onto
    ``out_dim`` content-addressed directions, and each direction gets
    the standard PSI treatment (``psi_drift``'s bin geometry: edges
    from the REFERENCE min/max, out-of-range clamps to edge bins).
    The monitor a retrieval/dedup pipeline runs on its embedding
    column the way ``psi_drift`` watches numeric columns: an encoder
    change, a new data source, or upstream corruption shifts the
    projections long before ANN recall visibly degrades.

    Scale shape: out_dim does NOT multiply corpus passes -- projection
    explodes to (d, v) rows in the same map, so the whole monitor is
    one stats pass over ref plus one binned agg per side (map-side
    combined, keyed on the tiny (d, bin) space), then joins over
    out_dim x n_bins rows.  Returns (d, psi) -- PSI per projected
    direction; alert on max(psi) with the usual 0.1 / 0.25 bands.
    """
    from .similarity import project, projection_planes

    planes = projection_planes(out_dim, dim=dim, token=token)

    def proj_long(df: DataFrame) -> DataFrame:
        return df.select(
            F.posexplode(project(F.col(vec_col), planes)).alias("d", "v")
        ).select(F.col("d").cast("long").alias("d"), "v")

    refl, curl = proj_long(ref), proj_long(cur)
    stats = refl.groupBy("d").agg(F.min("v").alias("lo"), F.max("v").alias("hi"))

    def shares(df: DataFrame, name: str) -> DataFrame:
        b = df.join(F.broadcast(stats), "d").select(
            "d",
            F.when(F.col("hi") == F.col("lo"), F.lit(0))
            .otherwise(
                F.greatest(
                    F.least(
                        F.floor(
                            (F.col("v") - F.col("lo"))
                            * n_bins
                            / (F.col("hi") - F.col("lo"))
                        ).cast("int"),
                        F.lit(n_bins - 1),
                    ),
                    F.lit(0),
                )
            )
            .alias("bin"),
        )
        counts = b.groupBy("d", "bin").agg(F.count(F.lit(1)).alias("__c"))
        totals = counts.groupBy("d").agg(F.sum("__c").cast("double").alias("__t"))
        return counts.join(F.broadcast(totals), "d").select(
            "d", "bin", (F.col("__c") / F.col("__t")).alias(name)
        )

    spark = ref.sparkSession
    grid = (
        spark.range(out_dim)
        .select(F.col("id").alias("d"))
        .crossJoin(spark.range(n_bins).select(F.col("id").cast("int").alias("bin")))
    )
    joined = (
        grid.join(shares(refl, "share_ref"), ["d", "bin"], "left")
        .join(shares(curl, "share_cur"), ["d", "bin"], "left")
        .select(
            "d",
            F.coalesce("share_ref", F.lit(0.0)).alias("sr"),
            F.coalesce("share_cur", F.lit(0.0)).alias("sc"),
        )
    )
    srf = F.greatest(F.col("sr"), F.lit(eps))
    scf = F.greatest(F.col("sc"), F.lit(eps))
    return (
        joined.groupBy("d")
        .agg(F.round(F.sum((scf - srf) * F.log(scf / srf)), 6).alias("psi"))
    )


def embedding_centroid_outliers(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    threshold: float = 0.2,
) -> DataFrame:
    """Per-group centroid-cosine quality score: every vector's cosine
    to its OWN group's mean vector, plus an outlier flag below
    ``threshold`` -- the embedding-space analogue of a CLIP-score
    filter (vectors far from their cluster's center are mislabeled,
    noise, or modality failures; the standard triage before training
    on scraped pairs).

    Two bounded shuffles before the scoring pass: (label, pos)-keyed
    mean (posexplode + avg, rows = labels x dim) and per-label array
    re-assembly -- the centroid table is labels x dim values, broadcast
    to the scoring join regardless of corpus size.  The cosine itself
    is a JVM-side zip_with/aggregate fold; no Python, no shuffle of
    the vectors themselves.
    """
    from .similarity import cosine

    cent = (
        emb.select(
            F.col(label_col).alias("__lbl"),
            F.posexplode(F.col(vec_col)).alias("pos", "x"),
        )
        .groupBy("__lbl", "pos")
        .agg(F.avg(F.col("x").cast("double")).alias("m"))
        .groupBy("__lbl")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm")
        )
        .select("__lbl", F.col("pm.m").alias("centroid"))
    )
    scored = emb.join(
        F.broadcast(cent), emb[label_col] == cent["__lbl"]
    ).select(
        id_col,
        label_col,
        cosine(F.col(vec_col), F.col("centroid")).alias("cos_centroid"),
    )
    return scored.select(
        id_col,
        label_col,
        "cos_centroid",
        (F.col("cos_centroid") < F.lit(float(threshold))).alias("is_outlier"),
    )


def join_skew_report(
    left: DataFrame,
    right: DataFrame,
    key: str,
    k: int = 20,
) -> DataFrame:
    """Pre-join skew diagnostic: the ``k`` join keys that would produce
    the most output pairs, with each side's row count and the exact
    per-key fan-out (count_left * count_right) -- the report you read
    BEFORE launching a 100 TB fact-fact join to decide between
    broadcast, AQE skew splitting, and explicit salting
    (``operators/skew.py``).

    Cost shape: two (key, count) aggregations -- the same shuffle key
    the join itself would use but carrying ONE long per distinct key
    instead of full rows -- an equi-join of the two count tables, and
    a TakeOrdered top-k (per-partition heaps, no global sort).  When
    even the distinct-key table is too hot, nominate candidates with
    ``sketch.heavy_hitters`` first and recount only those; this exact
    form is the oracle-checkable one.
    """
    cl = left.groupBy(key).agg(F.count(F.lit(1)).alias("n_left"))
    cr = right.groupBy(key).agg(F.count(F.lit(1)).alias("n_right"))
    return (
        cl.join(cr, key)
        .select(
            key,
            "n_left",
            "n_right",
            (F.col("n_left") * F.col("n_right")).alias("est_pairs"),
        )
        .orderBy(F.desc("est_pairs"), F.asc(key))
        .limit(k)
    )


def dataset_fingerprint(
    df: DataFrame,
    cols: list[str] | None = None,
    float_decimals: int = 6,
) -> DataFrame:
    """Order- and partitioning-independent content checksum of a
    DataFrame: ONE row ``(n_rows, checksum_sum, checksum_xor)`` that
    two datasets share exactly when they hold the same multiset of
    rows (up to ``float_decimals`` rounding) WITH OVERWHELMING
    PROBABILITY -- equality of the fingerprint is probabilistic, not
    literal ``iff``: each row contributes two independent 60-bit md5
    slices (one per fold), so an undetected difference needs a
    simultaneous collision in both a mod-2^62 sum and a 60-bit XOR of
    distinct hash bits.  This is how you verify a 100 TB copy,
    migration, or replica against its source WITHOUT a global sort or
    a row-level anti-join.

    Mechanics: each row md5-hashes a canonical serialization (sorted
    column order, ``chr(31)`` separators, ``chr(30)`` null sentinel,
    floats via round -> decimal so Spark and external engines format
    identically), then the hashes fold through two COMMUTATIVE
    aggregates over DISJOINT md5 slices -- a mod-2^62 sum of hex chars
    1-15 (catches multiplicity changes XOR cancels pairwise) and a
    60-bit XOR of hex chars 16-30 (catches value perturbations).
    Commutativity makes the result independent of row order, partition
    count, and execution plan, and makes fingerprints MERGEABLE: fold
    per-shard fingerprints (sum the sums mod 2^62, XOR the XORs, add
    the counts) instead of re-scanning -- pinned in pytest.

    Supported column types: integral, float/double (rounded), decimal,
    string, date, boolean.  Timestamps, binary, and nested types are
    refused -- pre-cast them to a canonical string/long form first
    (engines disagree on their default serializations, which would
    silently make fingerprints non-portable).
    """
    from pyspark.sql import types as T

    names = sorted(cols if cols is not None else df.columns)
    norm = []
    for c in names:
        dt = df.schema[c].dataType
        if isinstance(dt, (T.DoubleType, T.FloatType)):
            e = (
                F.round(F.col(c).cast("double"), float_decimals)
                .cast(f"decimal(28,{float_decimals})")
                .cast("string")
            )
        elif isinstance(
            dt,
            (
                T.ArrayType, T.MapType, T.StructType, T.BinaryType,
                T.TimestampType, T.TimestampNTZType,
            ),
        ):
            raise ValueError(
                f"dataset_fingerprint: column {c!r} has type {dt.simpleString()};"
                " pre-cast it to a canonical string/long form"
            )
        else:
            e = F.col(c).cast("string")
        norm.append(F.coalesce(e, F.lit("\x1e")))
    h = F.md5(F.concat_ws("\x1f", *norm).cast("binary"))
    # Disjoint 60-bit slices: sum and XOR see independent hash bits
    # (decimal(38,0) sum holds ~10^20 rows of 2^60 terms before
    # overflow -- far past any corpus).
    v_sum = F.conv(F.substring(h, 1, 15), 16, 10).cast("decimal(38,0)")
    v_xor = F.conv(F.substring(h, 16, 15), 16, 10).cast("long")
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(F.sum(v_sum) % F.lit(2**62), F.lit(0))
        .cast("long")
        .alias("checksum_sum"),
        F.coalesce(F.bit_xor(v_xor), F.lit(0)).alias("checksum_xor"),
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    lo: float = 0.01,
    hi: float = 0.99,
    out_col: str | None = None,
) -> DataFrame:
    """Per-group winsorization -- the TRANSFORM twin of the IQR fence
    report: values clipped to the group's exact ``[p_lo, p_hi]``
    percentiles (the standard robust pre-scaling step before
    mean/stddev-based features, where one stuck sensor or fat-finger
    row would otherwise own the moments).  Adds ``out_col`` (default
    ``<value_col>_winsorized``) and the bounds; rows keep flowing --
    nothing is dropped, unlike the fence report's outlier count.

    Scale shape: one grouped exact-percentile aggregate (group-count
    rows, broadcast back), then a pure in-row clamp -- the same
    two-stage plan as ``iqr_outliers`` with the final agg replaced by
    a map."""
    out = out_col or f"{value_col}_winsorized"
    v = F.col(value_col).cast("double")
    bounds = df.groupBy(*group_cols).agg(
        F.percentile(v, lo).alias("__lo"),
        F.percentile(v, hi).alias("__hi"),
    )
    return (
        df.join(F.broadcast(bounds), group_cols)
        .withColumn(out, F.least(F.greatest(v, F.col("__lo")), F.col("__hi")))
        .withColumnRenamed("__lo", f"{value_col}_lo")
        .withColumnRenamed("__hi", f"{value_col}_hi")
    )


def key_candidate_report(
    tables: dict[str, tuple[DataFrame, list[list[str]]]],
) -> DataFrame:
    """Candidate-key uniqueness audit (the Deequ/dbt-test
    'uniqueness' constraint, batched): for every (table, column-set)
    candidate -- row count, distinct count, duplicate rows, and the
    verdict -- the read that decides whether a column set can serve
    as a merge/upsert key or needs a surrogate.  One count +
    exact-distinct aggregate per candidate (a keyed shuffle of key
    columns only), stacked into one |candidates|-row report."""
    parts = []
    for tname, (df, candidates) in sorted(tables.items()):
        for cols in candidates:
            key = [F.col(c).cast("string") for c in cols]
            parts.append(
                df.agg(
                    F.lit(tname).alias("table_name"),
                    F.lit(",".join(cols)).alias("key_columns"),
                    F.count(F.lit(1)).cast("long").alias("n_rows"),
                    F.count_distinct(*key).cast("long").alias("n_distinct"),
                ).select(
                    "table_name",
                    "key_columns",
                    "n_rows",
                    "n_distinct",
                    (F.col("n_rows") - F.col("n_distinct"))
                    .cast("long")
                    .alias("dup_rows"),
                    (F.col("n_rows") == F.col("n_distinct")).alias("is_unique"),
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def mutual_information(
    df: DataFrame, col_pairs: list[tuple[str, str]]
) -> DataFrame:
    """Mutual information between categorical column pairs -- the
    association-strength profiler (schema-relationship discovery:
    which columns carry the same signal, which splits would leak a
    label, which metadata field actually predicts quality):
    ``I(X;Y) = sum p(x,y) * ln(p(x,y) / (p(x) p(y)))`` in nats, plus
    the normalized form ``I / min(H(X), H(Y))`` in [0, 1] (1 = one
    column determines the other, 0 = independent).

    One joint-count aggregate per pair is the only corpus-sized work;
    marginals, entropies, and the MI sum all derive from the tiny
    joint table (|X| x |Y| rows) -- grouped sums over it, a broadcast
    1-row total, and in-row logs.  NULL categories count as a level
    (they often ARE the signal).
    """
    parts = []
    for x, y in col_pairs:
        xc = F.coalesce(F.col(x).cast("string"), F.lit("__null__"))
        yc = F.coalesce(F.col(y).cast("string"), F.lit("__null__"))
        joint = df.groupBy(xc.alias("__x"), yc.alias("__y")).agg(
            F.count(F.lit(1)).cast("double").alias("__nxy")
        )
        mx = joint.groupBy("__x").agg(F.sum("__nxy").alias("__nx"))
        my = joint.groupBy("__y").agg(F.sum("__nxy").alias("__ny"))
        tot = joint.agg(F.sum("__nxy").alias("__n"))
        cells = (
            joint.join(mx, "__x")
            .join(my, "__y")
            .crossJoin(F.broadcast(tot))
        )
        p_xy = F.col("__nxy") / F.col("__n")
        term_mi = p_xy * F.log(
            F.col("__nxy") * F.col("__n") / (F.col("__nx") * F.col("__ny"))
        )
        # entropies from the same cell table: group each marginal's
        # term by its own key first so every level counts exactly once
        hx = mx.crossJoin(F.broadcast(tot)).agg(
            (-F.sum((F.col("__nx") / F.col("__n"))
                    * F.log(F.col("__nx") / F.col("__n")))).alias("h")
        )
        hy = my.crossJoin(F.broadcast(tot)).agg(
            (-F.sum((F.col("__ny") / F.col("__n"))
                    * F.log(F.col("__ny") / F.col("__n")))).alias("h")
        )
        mi = cells.agg(F.sum(term_mi).alias("mi"))
        parts.append(
            mi.crossJoin(F.broadcast(hx.select(F.col("h").alias("hx"))))
            .crossJoin(F.broadcast(hy.select(F.col("h").alias("hy"))))
            .select(
                F.lit(x).alias("col_x"),
                F.lit(y).alias("col_y"),
                F.round(F.greatest("mi", F.lit(0.0)), 6).alias("mi_nats"),
                F.round("hx", 6).alias("h_x"),
                F.round("hy", 6).alias("h_y"),
                F.round(
                    F.when(
                        F.least("hx", "hy") > 0.0,
                        F.greatest("mi", F.lit(0.0)) / F.least("hx", "hy"),
                    ).otherwise(F.lit(0.0)),
                    6,
                ).alias("nmi"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def ks_drift_report(
    df: DataFrame,
    value_col: str,
    group_col: str,
    n_bins: int = 100,
) -> DataFrame:
    """Binned two-sample Kolmogorov-Smirnov distance of every group's
    value distribution against the REST of the corpus -- the
    nonparametric "which source looks different?" audit that PSI's
    fixed-bin log-ratio blurs (KS is a sup over the whole CDF, so a
    shift concentrated anywhere shows at full strength; PSI dilutes it
    across bins).  One row per group: (group, n, ks_stat).

    Binned deliberately: exact KS needs a global per-group sort of the
    raw values; on equi-width bins the statistic is computed on
    groups x n_bins cumulative counts instead, with error bounded by
    the bin mass (refine by raising ``n_bins`` -- state stays
    geometry-sized).  The sup is evaluated at bin right edges, the
    standard binned-ECDF convention.

    Scale shape: one global min/max scalar pass (1-row broadcast), one
    (group, bin) hash agg over the corpus -- the only data-sized step,
    map-side combined -- then windows/joins over groups x n_bins rows.
    NULL values are excluded (the ``histogram_quantiles`` contract),
    and so are NULL GROUP KEYS: a null group would flow into the
    totals/grand denominators but fall out of the equi-joined
    (grp, bin) grid, silently inflating every other group's rest-CDF
    denominator (ks_stat too high) while reporting cum_g = 0 for
    itself -- rows with an unknown group are out of scope for a
    group-vs-rest audit, not a phantom group.  Single-group inputs
    yield n_rest = 0 and are refused."""
    from pyspark.sql.window import Window

    v = F.col(value_col).cast("double")
    df = df.where(F.col(group_col).isNotNull())
    stats = df.agg(F.min(v).alias("lo"), F.max(v).alias("hi"))
    binned = (
        df.select(F.col(group_col).alias("grp"), v.alias("__v"))
        .where(F.col("__v").isNotNull())
        .crossJoin(F.broadcast(stats))
        .select(
            "grp",
            F.when(F.col("hi") == F.col("lo"), F.lit(0))
            .otherwise(
                F.greatest(
                    F.least(
                        F.floor(
                            (F.col("__v") - F.col("lo"))
                            * n_bins
                            / (F.col("hi") - F.col("lo"))
                        ).cast("int"),
                        F.lit(n_bins - 1),
                    ),
                    F.lit(0),
                )
            )
            .alias("bin"),
        )
    )
    counts = binned.groupBy("grp", "bin").agg(F.count(F.lit(1)).alias("n"))
    totals = counts.groupBy("grp").agg(F.sum("n").alias("n_g"))
    grand = totals.agg(F.sum("n_g").alias("n_all"))
    spark = df.sparkSession
    bins = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    grid = totals.crossJoin(bins)
    cells = grid.join(counts, ["grp", "bin"], "left").select(
        "grp", "bin", "n_g", F.coalesce("n", F.lit(0)).alias("n")
    )
    wg = (
        Window.partitionBy("grp")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cells = cells.withColumn("cum_g", F.sum("n").over(wg))
    allc = (
        cells.groupBy("bin")
        .agg(F.sum("n").alias("n_b"))
        .withColumn(
            "cum_all",
            F.sum("n_b").over(
                Window.orderBy("bin").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ),
        )
        .select("bin", "cum_all")
    )
    diff = F.abs(
        F.col("cum_g") / F.col("n_g")
        - (F.col("cum_all") - F.col("cum_g"))
        / (F.col("n_all") - F.col("n_g"))
    )
    return (
        cells.join(allc, "bin")
        .crossJoin(F.broadcast(grand))
        .where(F.col("n_all") > F.col("n_g"))  # refuse single-group input
        .groupBy(F.col("grp").alias(group_col))
        .agg(
            F.first("n_g").alias("n"),
            F.round(F.max(diff), 6).alias("ks_stat"),
        )
        .orderBy(group_col)
    )
