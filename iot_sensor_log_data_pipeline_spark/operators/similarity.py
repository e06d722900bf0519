"""Similarity search over embedding columns (BASELINE.json north star:
brute-force cosine top-k baseline + LSH-bucketed ANN scale path).

Scale design:
- Brute force is broadcast-queries x one-pass-over-corpus: the corpus
  side NEVER shuffles its vectors; per (query, vector) the dot product
  runs JVM-side (zip_with + aggregate fold -- sequential, so the oracle
  reproduces the exact double summation order).  Top-k per query via
  window row_number (per-partition heaps, no global sort).
- The ANN path hashes vectors into random-hyperplane sign buckets
  (classic SRP-LSH): candidates = vectors sharing at least one band's
  bucket with the query; exact cosine re-ranks candidates only.  At
  100 TB the bucket join replaces the full scan per query with a
  fraction ~ (collision rate)^bands of the corpus.
- Hyperplanes are derived deterministically (seeded NumPy) and shipped
  as literal arrays in the plan (a few KB) -- no driver-side state.

Input contract: embedding vectors must be non-zero (cosine divides by
the norms; ANSI mode raises on a zero vector rather than silently
returning NULL) -- filter zero-norm rows upstream if the corpus can
contain them.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ._scratch_cache import ScratchCaches

DIM = 64

#: Scratch cache for the banded LSH index and the pair-histogram's
#: bin table (lifetime contract in ``_scratch_cache``;
#: ``release_caches()`` for full cleanup).
_SCRATCH = ScratchCaches()


def release_caches() -> None:
    """Unpersist scratch cached by earlier ``lsh_topk`` /
    ``pair_similarity_histogram`` calls."""
    _SCRATCH.release()


def _dbl(x: Column) -> Column:
    return x.cast("double")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in doubles (JVM-side, exact order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: _dbl(x) * _dbl(y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + _dbl(x) * _dbl(x))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for each query vector.

    ``queries`` (small) is broadcast; the big side streams once.
    Self-matches (same id) are excluded.  Deterministic tiebreak on
    neighbor id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    scored = vectors.join(F.broadcast(q), F.col(id_col) != F.col("query_id")).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        cosine(F.col("query_vec"), F.col(vec_col)).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )


def hyperplanes(n_planes: int, dim: int = DIM, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes for sign-LSH (public SRP-LSH
    construction: Charikar, STOC'02)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def hash_hyperplanes(n_planes: int, dim: int = DIM) -> list[list[float]]:
    """Engine-portable hyperplanes: component (j, d) is derived from
    ``md5('plane:j:d')`` -> first 8 hex chars -> uint32 / 2^31 - 1,
    i.e. uniform [-1, 1).  Any symmetric-about-zero component
    distribution gives valid SRP buckets (sign of a random projection),
    and this one is exactly recomputable in ANSI SQL
    (``CAST(('0x' || substr(md5(...), 1, 8)) AS BIGINT)``), so an
    external oracle can replay signatures, bands, and candidates
    stage-for-stage -- the same portability trick as the md5-based
    minhash lanes in ``operators/dedup.py``.  All derived values are
    dyadic rationals (uint32 / 2^31), so the float64 matrix is exact in
    every engine."""
    return [
        [
            int(hashlib.md5(f"plane:{j}:{d}".encode()).hexdigest()[:8], 16)
            / 2147483648.0
            - 1.0
            for d in range(dim)
        ]
        for j in range(n_planes)
    ]


def srp_signature(
    vec: Column, planes: list[list[float]], bands: int, rows_per_band: int
) -> Column:
    """Array of per-band bucket strings: each band concatenates the
    signs of ``rows_per_band`` hyperplane projections."""
    bits = [
        F.when(dot(vec, F.array(*[F.lit(v) for v in plane])) >= 0, "1").otherwise("0")
        for plane in planes
    ]
    return F.array(
        *[
            F.concat_ws(
                "", *bits[b * rows_per_band : (b + 1) * rows_per_band]
            ).alias(f"band{b}")
            for b in range(bands)
        ]
    )


def _srp_bands_udf(planes: list[list[float]], bands: int, rows_per_band: int):
    """Arrow-batched band-bucket computation: one NumPy matmul per
    batch instead of a (planes x dim)-literal codegen expression tree.
    The JVM-expression form (``srp_signature``) is semantically
    identical but its generated code grows with bands*dim -- measured
    as multi-second compile overhead; the matmul path is compile-free
    and vectorized."""
    P = np.asarray(planes, dtype="float64").T  # (dim, n_planes)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def srp_bands(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:  # np.vstack rejects empty Arrow batches
            return pd.Series([], dtype=object)
        M = np.vstack(vecs.to_numpy()).astype("float64")  # (n, dim)
        signs = (M @ P) >= 0.0
        out = []
        for row in signs:
            bits = "".join("1" if b else "0" for b in row)
            out.append(
                [bits[b * rows_per_band : (b + 1) * rows_per_band] for b in range(bands)]
            )
        return pd.Series(out)

    return srp_bands


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame | None = None,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = 8,
    rows_per_band: int = 4,
    seed: int = 42,
    query_filter: Column | None = None,
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate cosine top-k: SRP-LSH band-bucket candidates, exact
    cosine re-rank.  Recall grows with ``bands``; cost ~ corpus
    fraction sharing a bucket (per band ~2^-rows_per_band for random
    vectors).

    Pass ``queries`` as a separate DataFrame, OR -- when the queries
    are a subset of ``vectors`` -- pass ``query_filter`` (a predicate
    over the corpus columns): the banded signature table is then
    computed ONCE and cached, and the query side is a filter over it,
    instead of re-running the signature UDF over both inputs.  At scale
    this is the "persist the LSH index, probe it" pattern.
    """
    if (queries is None) == (query_filter is None):
        raise ValueError("pass exactly one of queries / query_filter")
    if planes is None:
        planes = hyperplanes(bands * rows_per_band, seed=seed)
    elif len(planes) != bands * rows_per_band:
        raise ValueError("planes must have bands * rows_per_band rows")
    bands_udf = _srp_bands_udf(planes, bands, rows_per_band)

    def with_bands(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col),
            F.col(vec_col),
            F.posexplode(bands_udf(F.col(vec_col))).alias("band_id", "bucket"),
        )

    def as_side(df: DataFrame, id_alias: str, vec_alias: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(id_alias),
            F.col(vec_col).alias(vec_alias),
            "band_id",
            "bucket",
        )

    if query_filter is not None:
        banded = _SCRATCH.cache(with_bands(vectors))
        vb = as_side(banded, "neighbor_id", "vec")
        qb = as_side(banded.where(query_filter), "query_id", "query_vec")
    else:
        vb = as_side(with_bands(vectors), "neighbor_id", "vec")
        qb = as_side(with_bands(queries), "query_id", "query_vec")

    cand = (
        vb.join(F.broadcast(qb), ["band_id", "bucket"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.first("query_vec").alias("query_vec"), F.first("vec").alias("vec"))
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        cosine(F.col("query_vec"), F.col("vec")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )


def embedding_cosine_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "exact",
    bands: int = 8,
    rows_per_band: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (the vector-space member of the
    dedup family): all (id_a < id_b) pairs with cosine >= threshold.

    ``method='exact'``: upper-triangle broadcast join with per-row
    precomputed norms -- O(n^2) dot products, the oracle-checkable
    baseline (fine when one side broadcasts; at corpus scale this is
    the per-bucket verifier, not the driver).
    ``method='lsh'``: SRP-LSH band-bucket candidates (same construction
    as ``lsh_topk``) + exact cosine verification of candidates only --
    the subquadratic scale path; recall is the S-curve of the banding,
    checked in tests against the exact method.
    """
    with_norm = vectors.select(
        F.col(id_col), F.col(vec_col), l2_norm(F.col(vec_col)).alias("nrm")
    )
    if method == "exact":
        a = with_norm.select(
            F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), F.col("nrm").alias("na")
        )
        b = with_norm.select(
            F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), F.col("nrm").alias("nb")
        )
        scored = a.join(F.broadcast(b), F.col("id_a") < F.col("id_b")).select(
            "id_a", "id_b", (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("cos_sim")
        )
    elif method == "lsh":
        planes = hyperplanes(bands * rows_per_band, seed=seed)
        bands_udf = _srp_bands_udf(planes, bands, rows_per_band)
        banded = _SCRATCH.cache(
            with_norm.select(
                id_col, vec_col, "nrm",
                F.posexplode(bands_udf(F.col(vec_col))).alias("band_id", "bucket"),
            )
        )
        x = banded.select(
            F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
            F.col("nrm").alias("na"), "band_id", "bucket",
        )
        y = banded.select(
            F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
            F.col("nrm").alias("nb"), "band_id", "bucket",
        )
        cand = (
            x.join(y, ["band_id", "bucket"])
            .where(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
        scored = cand.select(
            "id_a", "id_b",
            (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("cos_sim"),
        )
    else:
        raise ValueError(f"unknown method {method!r}")
    return scored.where(F.col("cos_sim") >= threshold)


def _top_cells_udf(centroids: list[tuple[int, list[float]]], n_top: int):
    """Arrow-batched top-``n_top`` nearest-centroid ids (by dot product)
    per vector: one NumPy matmul per batch.  Same reasoning as
    ``_srp_bands_udf`` -- the JVM-expression alternative is an array of
    n_cells x dim literals whose generated code compiles for seconds at
    n_cells >= 64; the matmul is compile-free, and the centroid matrix
    rides along in the serialized closure (a few KB).  Ties broken by
    lower cell id (stable argsort), deterministic across partitionings.
    """
    C = np.asarray([v for _, v in centroids], dtype="float64").T  # (dim, cells)
    ids = np.asarray([c for c, _ in centroids], dtype="int64")
    n_top = min(n_top, len(ids))

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def top_cells(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:  # np.vstack rejects empty Arrow batches
            return pd.Series([], dtype=object)
        M = np.vstack(vecs.to_numpy()).astype("float64")  # (n, dim)
        order = np.argsort(-(M @ C), axis=1, kind="stable")[:, :n_top]
        return pd.Series([[int(c) for c in ids[row]] for row in order])

    return top_cells


def kmeans_centroids(
    vectors: DataFrame,
    n_cells: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 2048,
    n_iter: int = 10,
    seed: int = 42,
) -> list[tuple[int, list[float]]]:
    """Deterministic sampled spherical k-means coarse quantizer.

    Sample: the ``sample_size`` rows with the smallest md5(id) -- a
    content-derived, partitioning-independent pseudo-random sample that
    Spark executes as TakeOrderedAndProject (no full sort).  Lloyd's
    iterations then run driver-side on the sample (<= sample_size x dim
    doubles) with cosine assignment (rows L2-normalized) and seeded
    init, so centroids are bit-reproducible run to run.  Empty cells
    keep their previous centroid.

    Scale contract: driver memory is sample_size x dim doubles and
    driver compute is sample_size x n_cells x dim x n_iter flops, so
    BOTH arguments must be constant-bounded in the corpus size -- the
    100-TB guarantee holds only when the CALLER caps them
    (``semdedup.quantizer_plan`` does: <= 8192 cells, <= 64k-row
    sample, a one-off BLAS gemm of a few GFLOP).  Passing
    corpus-proportional values here re-creates the driver bottleneck
    this function exists to avoid.
    """
    rows = (
        vectors.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(sample_size)
        .collect()
    )
    X = np.asarray([list(r[vec_col]) for r in rows], dtype="float64")
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)

    rng = np.random.default_rng(seed)
    init_idx = rng.choice(len(X), size=min(n_cells, len(X)), replace=False)
    C = X[np.sort(init_idx)].copy()
    for _ in range(n_iter):
        Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
        assign = (Xn @ Cn.T).argmax(axis=1)
        for cell in range(len(C)):
            members = X[assign == cell]
            if len(members):
                C[cell] = members.mean(axis=0)
    return [(i, [float(x) for x in C[i]]) for i in range(len(C))]


def seed_centroids(
    vectors: DataFrame,
    n_cells: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Quantizer seeds without Lloyd refinement: the ``n_cells`` corpus
    vectors with the smallest ``md5(id)`` (the same content-derived,
    partitioning-independent sample order as ``kmeans_centroids``), in
    md5 order, as cells 0..n_cells-1.  Worse cell balance than k-means
    but exactly replayable in ANSI SQL (``ORDER BY md5(CAST(id AS
    VARCHAR)), id LIMIT n``), which makes the whole IVF
    assign/probe/re-rank machinery oracle-checkable; the Lloyd's
    quantizer is a drop-in upgrade of this list."""
    rows = (
        vectors.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n_cells)
        .collect()
    )
    return [(i, [float(x) for x in r[vec_col]]) for i, r in enumerate(rows)]


#: Default scan budget for IVF-flat derivations -- the candidate
#: budget of the historical 64/12/2 defaults, so deriving geometry
#: never silently shrinks the scan.  ONE constant shared by
#: ``ivf_geometry`` and every call-site derivation below (a second
#: copy of the literal is exactly the drift this constant prevents).
IVF_DEFAULT_SCAN_FRACTION = 0.375


def _derived_n_probe(
    n_cells: int, scan_fraction: float, n_assign: int
) -> int:
    """Probe count filling ``scan_fraction`` of the corpus at the
    given multi-assignment width (expected scanned fraction =
    n_assign * n_probe / n_cells), floor 4."""
    return max(4, int(n_cells * scan_fraction / max(n_assign, 1)))


def _derived_sample_size(n_cells: int) -> int:
    """Lloyd's training-sample size proportional to the cell count
    (16 rows/cell, clamped [2048, 65536]) -- fine quantizers must not
    train on a handful of samples per cell."""
    return max(2048, min(65536, 16 * n_cells))


def ivf_geometry(
    n_vectors: int,
    scan_fraction: float = IVF_DEFAULT_SCAN_FRACTION,
    n_assign: int = 2,
) -> dict[str, int]:
    """Corpus-scaled IVF-flat probe geometry -- the ``ivfpq_geometry``
    derivation applied to the uncompressed index (round-12; the
    round-11 bench still ran plain IVF at a fixed 64 cells, which
    stops tracking local structure as N grows and ceilinged recall at
    0.80 where the derived plan's finer cells track it):

    * ``n_cells``: ~4 * sqrt(N) rounded up to a power of two, clamped
      to [16, 65536] -- cell population ~sqrt(N)/4 keeps the
      assignment matmul and per-cell exact scans balanced;
    * ``n_probe``: the largest count keeping the expected scanned
      fraction (n_assign * n_probe / n_cells) within
      ``scan_fraction`` (default 0.375 = the candidate budget of the
      historical 64/12/2 defaults, so deriving the geometry never
      silently shrinks the scan), floor 4;
    * ``sample_size``: the Lloyd's training sample grows with the
      cell count (16 rows/cell, clamped [2048, 65536]) so fine
      quantizers aren't trained on 8 samples per cell.

    IVF-flat re-ranks exactly inside probed cells, so recall equals
    candidate coverage -- the scan fraction IS the recall/cost knob
    (``ivf_probe_sweep`` measures the curve on a sample).
    """
    import math as _math

    root = max(16, int(4 * _math.sqrt(max(n_vectors, 1))))
    n_cells = 1 << (root - 1).bit_length()  # next power of two
    n_cells = max(16, min(65536, n_cells))
    return {
        "n_cells": n_cells,
        "n_probe": _derived_n_probe(n_cells, scan_fraction, n_assign),
        "n_assign": n_assign,
        "sample_size": _derived_sample_size(n_cells),
    }


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int | None = None,
    n_probe: int | None = None,
    n_assign: int = 2,
    sample_size: int | None = None,
    kmeans_iter: int = 10,
    seed: int = 42,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF-flat approximate top-k: coarse-quantize the corpus into
    ``n_cells`` inverted lists, probe the ``n_probe`` closest cells per
    query, exact cosine re-rank inside the probed cells.

    Coarse quantizer: sampled spherical k-means (``kmeans_centroids``)
    -- data-dependent centroids from a deterministic md5-ordered sample,
    Lloyd's on the driver, centroids shipped in the UDF closure (a few
    KB).  Two recall levers, both standard IVF practice:

    - finer cells at a fixed scan fraction: 64 cells / 12 probes beats
      16 / 4 because smaller cells bound the distance from a member to
      its centroid more tightly (measured on the isotropic bench corpus:
      recall@10 0.50 -> 0.80 at ~the same candidates-per-query);
    - ``n_assign``: each corpus vector joins its ``n_assign`` nearest
      inverted lists (multi-assignment / redundant indexing), trading
      an ``n_assign``-times larger index for recall on vectors that sit
      near cell boundaries (0.80 -> ~0.90 here).  Set ``n_assign=1``
      for the classic single-assignment index when storage dominates.

    Cost at scale: candidates ~= n_assign * n_probe / n_cells of the
    corpus per query (vs all of it for brute force), and the cell
    assignment column is precomputable/persistable for the corpus.

    Pass ``centroids`` explicitly (e.g. from ``seed_centroids``) to
    pin the quantizer; otherwise the sampled Lloyd's quantizer runs.

    Geometry: leave ``n_cells`` / ``n_probe`` / ``sample_size`` as
    None and they derive from the corpus size via ``ivf_geometry``
    (one metadata-cheap count; round-12 -- a fixed 64-cell default
    stops tracking local structure as N grows).  Explicit values pin
    the layout (oracle queries, tests, persisted-index parity).
    """
    if n_cells is None:
        n_cells = (
            len(centroids)
            if centroids is not None
            else ivf_geometry(vectors.count(), n_assign=n_assign)["n_cells"]
        )
    if n_probe is None:
        n_probe = _derived_n_probe(n_cells, IVF_DEFAULT_SCAN_FRACTION, n_assign)
    if sample_size is None:
        sample_size = _derived_sample_size(n_cells)
    if centroids is None:
        centroids = kmeans_centroids(
            vectors,
            n_cells,
            id_col=id_col,
            vec_col=vec_col,
            sample_size=sample_size,
            n_iter=kmeans_iter,
            seed=seed,
        )
    assign_cells = _top_cells_udf(centroids, n_assign)
    probe_cells = _top_cells_udf(centroids, n_probe)

    assigned = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        F.explode(assign_cells(F.col(vec_col))).alias("cell"),
    )
    probes = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        F.explode(probe_cells(F.col(vec_col))).alias("cell"),
    )
    cand = assigned.join(F.broadcast(probes), "cell").where(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        cosine(F.col("query_vec"), F.col("vec")).alias("cos_sim"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )


def filtered_ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    match_col: str | None = None,
    allowed: DataFrame | None = None,
    n_cells: int | None = None,
    n_probe: int | None = None,
    n_assign: int = 2,
    sample_size: int | None = None,
    kmeans_iter: int = 10,
    seed: int = 42,
    centroids: list[tuple[int, list[float]]] | None = None,
    negate: bool = False,
) -> DataFrame:
    """Metadata-FILTERED approximate top-k over an IVF layout -- the
    attribute-constrained vector search every serving store implements
    (per-tenant / same-category / allow-listed retrieval): the filter
    is applied to the candidate set BEFORE the exact cosine re-rank,
    so the k results all satisfy it (post-filtering the unfiltered
    top-k instead can return < k rows and silently drops valid
    neighbors that ranked k+1..k/selectivity).

    Two constraint shapes, composable:

    - ``match_col``: neighbor must carry the SAME value as the query
      in this column (label = label, tenant = tenant) -- the equality
      travels as an extra predicate on the candidate join, staying
      inside the same shuffle; with ``negate=True`` the predicate
      flips to inequality, which is HARD-NEGATIVE MINING (the
      embedding-training shape: the most similar vectors that are NOT
      the query's class make the most informative contrastive
      negatives).  The comparison is null-SAFE (SQL ``IS [NOT]
      DISTINCT FROM``): two NULL labels match each other, and under
      ``negate=True`` a NULL-label neighbor counts as a different
      class from any labeled query -- NULLs never silently drop rows;
    - ``allowed``: a 1-column (``id_col``) allow-list DataFrame; the
      neighbor side is LEFT SEMI joined on it before scoring (the
      vector-DB "filtered by ids from a metadata query" form; Spark
      broadcasts it when small, shuffles when not -- declarative
      either way).

    Selectivity is the scale knob: filtered candidates per query ~=
    selectivity * n_assign * n_probe / n_cells of the corpus, so at a
    fixed recall target ``n_probe`` should grow ~ 1/selectivity (a 5%
    filter wants ~20x the probes of an unfiltered search, still far
    below brute force).  For selectivity below ~1/n_cells, partition
    the index BY the attribute instead (one IVF tree per tenant) --
    documented, not automated.

    Same quantizer contract as ``ivf_topk``: pass ``centroids`` to pin
    (SQL-replayable), else the sampled Lloyd's quantizer trains here
    (geometry derived from corpus size via ``ivf_geometry`` when the
    caller doesn't pin it, the ``ivf_topk`` convention; remember the
    selectivity rule above when choosing ``n_probe``).
    """
    if match_col is None and allowed is None:
        raise ValueError("filtered_ivf_topk needs match_col and/or allowed; "
                         "use ivf_topk for the unfiltered search")
    if negate and match_col is None:
        raise ValueError("negate=True needs match_col")
    if n_cells is None:
        n_cells = (
            len(centroids)
            if centroids is not None
            else ivf_geometry(vectors.count(), n_assign=n_assign)["n_cells"]
        )
    if n_probe is None:
        n_probe = _derived_n_probe(n_cells, IVF_DEFAULT_SCAN_FRACTION, n_assign)
    if sample_size is None:
        sample_size = _derived_sample_size(n_cells)
    if centroids is None:
        centroids = kmeans_centroids(
            vectors,
            n_cells,
            id_col=id_col,
            vec_col=vec_col,
            sample_size=sample_size,
            n_iter=kmeans_iter,
            seed=seed,
        )
    assign_cells = _top_cells_udf(centroids, n_assign)
    probe_cells = _top_cells_udf(centroids, n_probe)

    nb_cols = [
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        F.explode(assign_cells(F.col(vec_col))).alias("cell"),
    ]
    q_cols = [
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        F.explode(probe_cells(F.col(vec_col))).alias("cell"),
    ]
    if match_col is not None:
        nb_cols.append(F.col(match_col).alias("nb_attr"))
        q_cols.append(F.col(match_col).alias("q_attr"))
    assigned = vectors.select(*nb_cols)
    if allowed is not None:
        assigned = assigned.join(
            allowed.select(F.col(id_col).alias("neighbor_id")),
            "neighbor_id",
            "left_semi",
        )
    probes = queries.select(*q_cols)
    cand = assigned.join(F.broadcast(probes), "cell").where(
        F.col("neighbor_id") != F.col("query_id")
    )
    if match_col is not None:
        # Null-SAFE comparison (explicit semantics, not 3VL row drops):
        # equality treats two NULL labels as the same class (a
        # NULL-label query retrieves NULL-label neighbors); negation
        # treats a NULL-label neighbor as a DIFFERENT class from any
        # labeled query (it is a valid hard negative -- under plain
        # `!=` it silently never surfaced).
        eq = F.col("nb_attr").eqNullSafe(F.col("q_attr"))
        cand = cand.where(~eq if negate else eq)
    scored = cand.select(
        "query_id",
        "neighbor_id",
        cosine(F.col("query_vec"), F.col("vec")).alias("cos_sim"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )


def ivf_probe_sweep(
    vectors: DataFrame,
    queries: DataFrame,
    probes: tuple[int, ...] = (1, 2, 4, 8),
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_assign: int = 2,
    centroids: list[tuple[int, list[float]]] | None = None,
    n_cells: int = 64,
    sample_size: int = 2048,
    kmeans_iter: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Recall/cost SWEEP for an IVF layout -- measure, don't guess:
    for each candidate ``n_probe`` level, recall@k of the probe stage
    against the exact top-k AND the fraction of the corpus the re-rank
    would touch, from ONE plan (no per-level re-probing).  The output
    (n_probe, recall_at_k, scan_frac) is the curve a serving team
    reads to pick the probe width for a latency budget -- the IVF twin
    of ``prefix-truncation recall`` (`similarity_dim_truncation`).

    Because the IVF re-rank inside probed cells is exact, an exact
    neighbor that enters the candidate set always survives to the
    final top-k -- so candidate coverage IS end-to-end recall, and one
    (query, neighbor)-keyed table of "first probe level at which this
    neighbor becomes a candidate" (min query-side rank over the
    neighbor's assigned cells) prices every level at once.

    Scale shape: the ground truth is the one brute-force pass (query
    batch broadcast, corpus streamed once -- the sweep is a
    measurement you run on a bounded query SAMPLE, exactly like the
    bench's recall block), the sweep itself adds one postings-shaped
    join at max(probes) width plus two aggregations over
    (levels x pairs) rows -- levels are literal and pairs are bounded
    by the query sample, never the corpus.
    """
    if not probes or any(int(p) < 1 for p in probes):
        raise ValueError("probes must be a non-empty tuple of levels >= 1")
    if centroids is None:
        centroids = kmeans_centroids(
            vectors,
            n_cells,
            id_col=id_col,
            vec_col=vec_col,
            sample_size=sample_size,
            n_iter=kmeans_iter,
            seed=seed,
        )
    spark = vectors.sparkSession
    max_p = max(probes)
    probe_cells = _top_cells_udf(centroids, max_p)
    assign_cells = _top_cells_udf(centroids, n_assign)

    exact = brute_force_topk(
        vectors, queries, k=k, id_col=id_col, vec_col=vec_col
    ).select("query_id", "neighbor_id")
    probe_ranked = queries.select(
        F.col(id_col).alias("query_id"),
        F.posexplode(probe_cells(F.col(vec_col))).alias("cell_pos", "cell"),
    ).select("query_id", (F.col("cell_pos") + 1).alias("cell_rank"), "cell")
    assigned = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.explode(assign_cells(F.col(vec_col))).alias("cell"),
    )
    n_corpus = vectors.count()
    n_q = queries.count()
    if n_q == 0 or n_corpus < 2:
        raise ValueError(
            "ivf_probe_sweep needs a non-empty query sample and >= 2 "
            "corpus vectors (the recall denominator is the exact "
            "top-k over queries x (corpus - self))"
        )
    return _probe_sweep_from_parts(
        spark, exact, probe_ranked, assigned, probes, n_corpus, n_q
    )


def _probe_sweep_from_parts(
    spark: SparkSession,
    exact: DataFrame,
    probe_ranked: DataFrame,
    assigned: DataFrame,
    probes: tuple[int, ...],
    n_corpus: int,
    n_q: int,
) -> DataFrame:
    """The sweep's pricing core, shared by the ad-hoc
    ``ivf_probe_sweep`` and the persisted-index twin
    (``ann_index.ivf_index_probe_sweep``, which reads ``assigned``
    straight off the inverted lists instead of re-assigning):
    ``exact`` = ground-truth (query_id, neighbor_id) pairs,
    ``probe_ranked`` = (query_id, cell_rank, cell) fan-out at
    max(probes) width, ``assigned`` = (neighbor_id, cell) inverted
    lists.  One first-probe-level table prices every level at once."""
    minr = (
        assigned.join(F.broadcast(probe_ranked), "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.min("cell_rank").alias("first_probe"))
    )
    levels = spark.createDataFrame([(int(p),) for p in probes], "n_probe int")

    per_pair = exact.join(minr, ["query_id", "neighbor_id"], "left")
    rec = (
        per_pair.crossJoin(F.broadcast(levels))
        .groupBy("n_probe")
        .agg(
            F.avg(
                F.when(F.col("first_probe") <= F.col("n_probe"), 1.0).otherwise(0.0)
            ).alias("recall")
        )
    )
    scan = (
        minr.crossJoin(F.broadcast(levels))
        .groupBy("n_probe")
        .agg(
            (
                F.sum(
                    F.when(F.col("first_probe") <= F.col("n_probe"), 1).otherwise(0)
                )
                / F.lit(float(n_q) * (float(n_corpus) - 1.0))
            ).alias("scan")
        )
    )
    return (
        rec.join(scan, "n_probe")
        .select(
            "n_probe",
            F.round("recall", 6).alias("recall_at_k"),
            F.round("scan", 6).alias("scan_frac"),
        )
        .orderBy("n_probe")
    )


def mmr_rerank(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    pool: int = 15,
    lam: float = 0.75,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Maximal-marginal-relevance diversification (Carbonell &
    Goldstein, SIGIR'98) -- the post-retrieval step RAG serving stacks
    run so the k passages handed to the model aren't k paraphrases of
    the same one: greedily select from the top-``pool`` exact-cosine
    candidates, each step maximizing

        mmr(c) = lam * rel(c) - (1 - lam) * max_{s in S} sim(c, s)

    (relevance traded against similarity to what's already selected;
    the first pick's penalty term is 0).  Ties break on lower
    neighbor id, fully deterministic.

    ``candidates`` (optional, columns (query_id, neighbor_id)): the
    serving composition -- restrict the pool to a candidate set an
    ANN index probe already produced (``query_pq_index`` /
    ``query_ivfpq_index`` shortlists) instead of the brute-force
    broadcast scoring pass; relevance is still the exact cosine
    between the query vector and each candidate's vector (both looked
    up from ``queries`` / ``vectors`` by id), so the greedy arithmetic
    is identical either way.  ``pool`` still caps the per-query
    candidate count (by rel, then id) so a generous probe shortlist
    can't quadratically inflate the pair table.

    Scale shape: relevance and the pairwise candidate similarities
    are JVM cosine folds (one broadcast-queries scoring pass + one
    pool^2-per-query self-join -- pool is a serving constant, never
    the corpus), and only the greedy selection itself -- a
    sequentially dependent argmax over <= pool rows per query, not
    SQL-expressible without unrolling -- runs in an Arrow
    ``applyInPandas`` over the per-query candidate table.  All
    arithmetic the Python side performs on the JVM-computed doubles is
    order-fixed (multiply, subtract, running max), so results replay
    bit-identically in SQL; keep ``lam`` dyadic (0.75 default) so
    ``1 - lam`` is exact in both engines.

    A query with a single candidate emits that candidate at rank 1
    with a zero penalty term (the pairwise self-join has no row for
    it, so the pair similarities LEFT-join onto the candidate set --
    a query is never silently dropped for having too few neighbors).
    """
    if not 0.0 <= lam <= 1.0:
        raise ValueError("lam must be in [0, 1] (1 = pure relevance)")
    if k < 1 or pool < 2:
        raise ValueError("mmr_rerank needs k >= 1 and pool >= 2 "
                         "(one candidate has nothing to diversify against)")
    # The real id types thread through to the Arrow schema (the
    # _cogroup_cell_topk convention) -- a hard cast('long') would NULL
    # out string ids and collapse every query into one greedy group.
    # query_id comes from ``queries``, neighbor_id from ``vectors``;
    # each output slot uses its own side's type.
    q_id_type = queries.schema[id_col].dataType.simpleString()
    n_id_type = vectors.schema[id_col].dataType.simpleString()
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    if candidates is None:
        scored = vectors.join(
            F.broadcast(q), F.col(id_col) != F.col("query_id")
        ).select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            cosine(F.col("query_vec"), F.col(vec_col)).alias("rel"),
            F.col(vec_col).alias("vec"),
        )
    else:
        # Index-probe candidates: re-score the (query, neighbor) pairs
        # exactly -- the shortlist is bounded, so both lookups join
        # against a broadcastable side and the corpus is never
        # re-scanned.
        scored = (
            candidates.select("query_id", "neighbor_id")
            .join(F.broadcast(q), "query_id")
            .join(
                vectors.select(
                    F.col(id_col).alias("neighbor_id"),
                    F.col(vec_col).alias("vec"),
                ),
                "neighbor_id",
            )
            .where(F.col("neighbor_id") != F.col("query_id"))
            .select(
                "query_id",
                "neighbor_id",
                cosine(F.col("query_vec"), F.col("vec")).alias("rel"),
                "vec",
            )
        )
    w = Window.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("neighbor_id"))
    cand = (
        scored.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= pool)
        .drop("__r")
    )
    a = cand.select(
        "query_id",
        F.col("neighbor_id").alias("a"),
        F.col("rel").alias("rel_a"),
        F.col("vec").alias("va"),
    )
    b = cand.select(
        "query_id", F.col("neighbor_id").alias("b"), F.col("vec").alias("vb")
    )
    sims_tbl = (
        a.join(b, "query_id")
        .where(F.col("a") != F.col("b"))
        .select(
            "query_id",
            "a",
            "b",
            cosine(F.col("va"), F.col("vb")).alias("sim"),
        )
    )
    # LEFT join: a query whose pool holds exactly one candidate has no
    # pair row, but must still reach the greedy stage (null b / sim
    # rows carry the relevance and contribute no penalty entry).
    pairs = a.select("query_id", "a", "rel_a").join(
        sims_tbl, ["query_id", "a"], "left"
    )
    lam_f = float(lam)

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = pdf["query_id"].iloc[0]
        rels = {}
        sims = {}
        for row in pdf.itertuples(index=False):
            rels[row.a] = float(row.rel_a)
            if row.b is not None and not pd.isna(row.b):
                sims[(row.a, row.b)] = float(row.sim)
        selected: list = []
        out = []
        remaining = set(rels)
        for step in range(1, min(k, len(rels)) + 1):
            best_id, best_score = None, None
            for c in sorted(remaining):
                pen = max((sims[(c, s)] for s in selected), default=0.0)
                score = lam_f * rels[c] - (1.0 - lam_f) * pen
                if best_score is None or score > best_score:
                    best_id, best_score = c, score
            selected.append(best_id)
            remaining.discard(best_id)
            out.append((qid, best_id, best_score, step))
        return pd.DataFrame(
            out, columns=["query_id", "neighbor_id", "mmr", "rank"]
        )

    picked = pairs.groupBy("query_id").applyInPandas(
        greedy,
        f"query_id {q_id_type}, neighbor_id {n_id_type}, mmr double, rank long",
    )
    return picked.select(
        "query_id", "neighbor_id", F.round("mmr", 6).alias("mmr"), "rank"
    ).orderBy("query_id", "rank")


def ivf_cogroup_join(
    a: DataFrame,
    b: DataFrame,
    centroids: list[tuple[int, list[float]]],
    k: int = 10,
    n_probe: int = 2,
    n_assign: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell_rows: int | None = None,
) -> DataFrame:
    """Large-by-large ANN join: the top-``k`` cosine neighbors in ``b``
    for EVERY row of ``a`` -- (query_id, neighbor_id, cos_sim, rank).

    ``ivf_topk`` broadcasts the probe side, which is right when queries
    are a small batch; when the query side is ITSELF a corpus
    (embedding-space decontamination of a full training set against a
    benchmark store, cross-corpus record linkage, kNN label transfer),
    a broadcast is impossible.  Here BOTH sides shuffle on the coarse
    cell id: ``b`` single-assigns to its 1-NN cell (the inverted
    lists), ``a`` fans out to its ``n_probe`` nearest cells, and each
    cell's scoring is ONE Q_c @ N_c^T matmul inside a cogrouped Arrow
    pass (``groupBy(cell).cogroup(...).applyInPandas``) that emits
    only that cell's per-query top-k.  A final per-query window keeps
    the global top-k across probed cells.

    ``n_assign`` (default 1) is the recall knob on the CORPUS side:
    with single assignment a (query, neighbor) pair can surface from
    at most one cell, so no dedup pass is needed; ``n_assign > 1``
    multi-assigns corpus vectors to their top cells (the same spill
    trick the IVF index uses, giving EXACT recall parity with
    ``ivf_topk`` -- verified equal, both 0.76 recall@10 at sf0.1 on
    the identical split + Lloyd-64/probe-12 centroids, vs 0.66 for
    single assignment) at the price of one
    extra (query, neighbor)-keyed dedup shuffle whose input is
    <= n_probe * k rows per query.

    Scale shape: shuffle volume is |a| * n_probe + |b| * n_assign rows
    keyed by cell; per-task working set is one cell from each side
    (bounded by the quantizer's cell population, same budget as
    SemDeDup's ``_cell_pairs_arrow``); window input is <= n_probe * k
    rows per query.  Tie-break inside the cell matches the final
    ranking (cosine desc, neighbor id asc), so cell-level truncation
    can never cut a candidate the global window would have kept.

    ``max_cell_rows`` (optional): per-cell cap on the NEIGHBOR side,
    taken in deterministic md5(neighbor_id) order.  Cell populations
    are data-dependent, and a hot cell -- m near-identical corpus
    vectors quantizing to one centroid -- makes that cell's cogroup
    matmul m x |Q_c|, the same quadratic bomb the graph build's LSH
    ring cap (``graph_ann.lsh_seed_pairs``) and the dedup anchors cap
    guard against.  The cap bounds every cell's neighbor table; for a
    genuinely near-duplicate blob any ``max_cell_rows`` members are
    interchangeable as neighbors, so recall inside the blob is
    unaffected while the task-size bound becomes real.  Default None
    preserves the exact-within-probed-cells contract (the oracle
    shape)."""
    probe_cells = _top_cells_udf(centroids, n_probe)
    assign_cells = _top_cells_udf(centroids, n_assign)
    id_type = a.schema[id_col].dataType.simpleString()

    qa = a.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        l2_norm(F.col(vec_col)).alias("qn"),
        F.explode(probe_cells(F.col(vec_col))).alias("cell"),
    )
    nb = b.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nv"),
        l2_norm(F.col(vec_col)).alias("nn"),
        F.explode(assign_cells(F.col(vec_col))).alias("cell"),
    )
    if max_cell_rows is not None:
        if max_cell_rows < k:
            raise ValueError(
                f"max_cell_rows ({max_cell_rows}) must be >= k ({k}) -- a "
                "cap below k silently shortens every result list in "
                "capped cells"
            )
        w_cap = Window.partitionBy("cell").orderBy(
            F.md5(F.col("neighbor_id").cast("string")), F.col("neighbor_id")
        )
        nb = (
            nb.withColumn("__cr", F.row_number().over(w_cap))
            .where(F.col("__cr") <= max_cell_rows)
            .drop("__cr")
        )
    return _cogroup_cell_topk(qa, nb, k, id_type, dedup=n_assign > 1)


def _cogroup_cell_topk(
    qa: DataFrame, nb: DataFrame, k: int, id_type: str, dedup: bool
) -> DataFrame:
    """Cell-cogrouped scoring core shared by ``ivf_cogroup_join`` and
    the persisted-index twin (``ann_index.ivf_index_cogroup_join``).
    ``qa``: (query_id, qv, qn, cell) probe fan-out; ``nb``:
    (neighbor_id, nv, nn, cell) inverted lists; ``dedup`` collapses
    multi-assigned pairs before the final rank window."""

    def cell_topk(qpdf: pd.DataFrame, npdf: pd.DataFrame) -> pd.DataFrame:
        if len(qpdf) == 0 or len(npdf) == 0:
            return pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "cos_sim": []}
            )
        Q = np.vstack(qpdf["qv"].to_numpy()).astype("float64")
        N = np.vstack(npdf["nv"].to_numpy()).astype("float64")
        S = (Q @ N.T) / np.outer(
            qpdf["qn"].to_numpy().astype("float64"),
            npdf["nn"].to_numpy().astype("float64"),
        )
        nids = npdf["neighbor_id"].to_numpy()
        kk = min(k, S.shape[1])
        # per-query top-kk with the final tie-break (score desc, id asc)
        order = np.lexsort((np.broadcast_to(nids, S.shape), -S), axis=1)[:, :kk]
        rows = np.arange(S.shape[0])[:, None]
        out_q = np.repeat(qpdf["query_id"].to_numpy(), kk)
        out_n = nids[order].ravel()
        out_s = S[rows, order].ravel()
        return pd.DataFrame(
            {"query_id": out_q, "neighbor_id": out_n, "cos_sim": out_s}
        )

    per_cell = (
        qa.groupBy("cell")
        .cogroup(nb.groupBy("cell"))
        .applyInPandas(
            cell_topk,
            f"query_id {id_type}, neighbor_id {id_type}, cos_sim double",
        )
    )
    if dedup:
        # multi-assigned corpus rows can surface a pair from several
        # cells with the identical exact score -- collapse before rank
        per_cell = per_cell.groupBy("query_id", "neighbor_id").agg(
            F.max("cos_sim").alias("cos_sim")
        )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        per_cell.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos_sim", 6).alias("cos_sim"),
            "rank",
        )
    )


def pq_seed_codebooks(
    vectors: DataFrame,
    m: int = 8,
    k: int = 16,
    dim: int = DIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Product-quantization codebooks without Lloyd refinement: the
    ``k`` corpus vectors with smallest md5(id) (same deterministic,
    SQL-replayable sample order as ``seed_centroids``), sub-sliced into
    ``m`` subspaces of ``dim // m`` dims.  ``out[s][j]`` is subspace
    ``s``'s centroid ``j``.  A per-subspace Lloyd's pass is the
    drop-in production upgrade of these lists (same shape, same
    downstream code), exactly as ``kmeans_centroids`` upgrades
    ``seed_centroids`` for IVF."""
    rows = (
        vectors.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(k)
        .collect()
    )
    d = dim // m
    return [
        [[float(x) for x in r[vec_col][s * d : (s + 1) * d]] for r in rows]
        for s in range(m)
    ]


def _pq_codes_udf(codebooks: list[list[list[float]]]):
    """Arrow-batched PQ encoding: per subspace, argmin squared L2 to
    the subspace's centroids (ties -> lowest code, stable argmin).
    One matmul-shaped pass per batch; codebooks ride in the closure
    (m * k * d doubles, a few KB)."""
    C = [np.asarray(cb, dtype="float64") for cb in codebooks]  # m x (k, d)
    d = C[0].shape[1]

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def pq_codes(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        M = np.vstack(vecs.to_numpy()).astype("float64")
        out = []
        codes_per_sub = []
        for s, cb in enumerate(C):
            sub = M[:, s * d : (s + 1) * d]  # (n, d)
            # (n, k) squared L2 distances
            d2 = ((sub[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            codes_per_sub.append(d2.argmin(axis=1))  # stable: first min
        codes = np.stack(codes_per_sub, axis=1)  # (n, m)
        for row in codes:
            out.append([int(c) for c in row])
        return pd.Series(out)

    return pq_codes


def _pq_query_dists_udf(codebooks: list[list[list[float]]]):
    """Arrow-batched per-query distance table: flattened array of
    m * k squared L2 distances (index = subspace * k + code) -- the
    ADC lookup table each query broadcasts to the code join."""
    C = [np.asarray(cb, dtype="float64") for cb in codebooks]
    d = C[0].shape[1]
    k = C[0].shape[0]

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def pq_qdists(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        M = np.vstack(vecs.to_numpy()).astype("float64")
        out = []
        for row in M:
            flat = []
            for s, cb in enumerate(C):
                sub = row[s * d : (s + 1) * d]
                flat.extend(((cb - sub[None, :]) ** 2).sum(axis=1).tolist())
            out.append(flat)
        return pd.Series(out)

    return pq_qdists


def pq_adc_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    n_codes: int = 16,
    codebooks: list[list[list[float]]] | None = None,
    rerank: int | None = None,
) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation
    (Jegou, Douze, Schmid 2011): the corpus is stored as ``m`` uint8-ish
    codes per vector (here 8 x 4 bits of information -- a 64x memory
    reduction over float32[64]), queries stay exact, and the
    approximate distance is a table lookup sum:
    dist(q, v) ~= sum_s D_q[s][code_s(v)].

    Scale shape: encoding is an Arrow-batched map pass (codes are
    persistable corpus state, like the IVF assignment); each query's
    m x n_codes lookup table broadcasts; the join is code-keyed
    (subspace, code) -- shuffle-bounded, never per-dimension; top-k is
    a per-query window.  Returns (query_id, neighbor_id, adc_dist,
    rank), ascending distance, self-matches excluded.
    """
    if codebooks is None:
        # Derive dim from the data (bounded head() pull, the knn_graph
        # pattern): the trainer's dim default is the corpus constant,
        # and training 32-dim vectors under dim=64 would hand subspace
        # 0 the whole vector and the rest empty slices.
        sample = vectors.select(vec_col).head()
        data_dim = len(sample[0]) if sample is not None else m
        codebooks = pq_seed_codebooks(
            vectors, m=m, k=n_codes, dim=data_dim, id_col=id_col, vec_col=vec_col
        )
    codes_udf = _pq_codes_udf(codebooks)
    qdists_udf = _pq_query_dists_udf(codebooks)

    codes = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.posexplode(codes_udf(F.col(vec_col))).alias("subspace", "code"),
    )
    qd = queries.select(
        F.col(id_col).alias("query_id"),
        F.posexplode(qdists_udf(F.col(vec_col))).alias("flat_idx", "d2"),
    ).select(
        "query_id",
        (F.col("flat_idx") / n_codes).cast("int").alias("subspace"),
        (F.col("flat_idx") % n_codes).alias("code"),
        "d2",
    )
    scored = (
        codes.join(F.broadcast(qd), ["subspace", "code"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d2").alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    if rerank is None:
        return (
            scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= k)
            .select(
                "query_id",
                "neighbor_id",
                F.round("adc_dist", 6).alias("adc_dist"),
                "rank",
            )
        )
    # ADC+R (Jegou et al.'s re-ranking stage): the quantized distance
    # only SHORTLISTS rerank candidates per query; exact squared L2
    # against the stored vectors decides the final top-k.  At scale the
    # exact pass touches rerank rows per query, not the corpus.
    shortlist = (
        scored.withColumn("adc_rank", F.row_number().over(w))
        .where(F.col("adc_rank") <= rerank)
        .select("query_id", "neighbor_id")
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    nv = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec")
    )
    l2 = F.aggregate(
        F.zip_with(
            F.col("query_vec"),
            F.col("vec"),
            lambda x, y: (_dbl(x) - _dbl(y)) * (_dbl(x) - _dbl(y)),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    exact = shortlist.join(F.broadcast(qv), "query_id").join(nv, "neighbor_id").select(
        "query_id", "neighbor_id", l2.alias("l2_dist")
    )
    w2 = Window.partitionBy("query_id").orderBy(F.asc("l2_dist"), F.asc("neighbor_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w2).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("l2_dist", 6).alias("l2_dist"),
            "rank",
        )
    )


def pq_codebooks(
    vectors: DataFrame,
    m: int = 8,
    k: int = 16,
    dim: int = DIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 2048,
    n_iter: int = 10,
) -> list[list[list[float]]]:
    """Lloyd-refined PQ codebooks: per subspace, k-means over the
    md5-ordered deterministic sample (same sample discipline as
    ``kmeans_centroids`` -- KBs to the driver, scale-invariant),
    initialized from the ``pq_seed_codebooks`` rows.  Deterministic
    but NOT one-statement-SQL-replayable (iterative refinement), so
    the catalog's oracle-checked query pins seed codebooks instead;
    this is the production quantizer (lower quantization error, same
    downstream encode/ADC code)."""
    rows = (
        vectors.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(sample_size)
        .collect()
    )
    X = np.asarray([list(r[vec_col]) for r in rows], dtype="float64")
    d = dim // m
    out = []
    for s in range(m):
        sub = X[:, s * d : (s + 1) * d]
        C = sub[: min(k, len(sub))].copy()
        for _ in range(n_iter):
            d2 = ((sub[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for cell in range(len(C)):
                members = sub[assign == cell]
                if len(members):
                    C[cell] = members.mean(axis=0)
        out.append([[float(x) for x in c] for c in C])
    return out


def ivfpq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = 8,
    n_codes: int = 16,
    rerank: int = 50,
    centroids: list[tuple[int, list[float]]] | None = None,
    codebooks: list[list[list[float]]] | None = None,
    dim: int = DIM,
    n_assign: int = 1,
    rotation: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-PQ: the classic billion-scale composite index (Jegou et
    al. 2011's IVFADC) -- an IVF coarse quantizer prunes the corpus to
    ``n_probe`` cells per query, and inside the probed cells distances
    are PQ lookup sums over RESIDUALS (vector minus its cell
    centroid), re-ranked exactly.  Residual encoding is the point of
    the composition: residuals concentrate near the origin, so the
    same code budget quantizes them with far less error than raw
    vectors -- and the LUT becomes per-(query, cell) because the
    query's residual differs in every probed cell.

    Stage shape at scale: coarse assignment + residual + encode are
    one Arrow map pass each (persistable corpus state -- the serving
    table is m codes + a cell id per vector, the same 64x compression
    as raw PQ); a probe broadcasts |queries| x n_probe x m x n_codes
    LUT rows (KBs); the ADC join is (cell, subspace, code)-keyed and
    touches only probed cells' codes (~n_probe/n_cells of the
    corpus); the exact pass touches ``rerank`` rows per query.

    Defaults pin the md5-seeded quantizers (``seed_centroids`` +
    residual-space ``pq_seed_codebooks``), keeping every stage --
    assignment, residuals, codebook sample, encode, per-cell LUTs,
    ADC, re-rank -- one-statement-SQL replayable; pass Lloyd-trained
    ``centroids``/``codebooks`` as the production upgrade (same
    downstream code).  Pass them TOGETHER or neither (the same
    contract as ``build_ivfpq_index``): the codebooks live in the
    residual space the centroids define, so pairing supplied
    codebooks with fresh seed centroids silently mis-codes.  When
    codebooks are supplied, the per-subspace code count is derived
    from them (``len(codebooks[0])``) and overrides ``n_codes`` --
    the LUT flattens by the codebooks' actual size, so a stale param
    would mis-decode (subspace, code) without any error.  Returns
    (query_id, neighbor_id, l2_dist, rank), ascending exact distance,
    self-matches excluded.

    ``rotation`` (optional, dim x dim orthogonal): OPQ applied to the
    IVFADC RESIDUALS (Ge, He, Ke & Sun 2013 §5 extends OPQ to IVFADC
    exactly this way): residuals -- corpus and query alike -- are
    rotated BEFORE encode / lookup tables, decorrelating and
    variance-balancing the PQ subspaces where the coding error
    actually lives.  No mean-centering: k-means codebooks are
    translation-invariant, and skipping the shift keeps the rotated
    residual an exact left-to-right fold (``_rotate_expr``) that a
    SQL oracle replays bit-for-bit when the rotation's entries are
    exact (the signed-Hadamard ``opq_seed_rotation``).  Distances are
    unchanged by orthogonality, so the exact re-rank still runs in
    the ORIGINAL space.  Requires ``centroids`` + ``codebooks``
    trained in that rotated residual space
    (``ivfpq_opq_quantizers`` / ``ivfpq_opq_seed_quantizers``) --
    rotating at probe time against unrotated codebooks would silently
    mis-code."""
    if (centroids is None) != (codebooks is None):
        raise ValueError(
            "pass centroids and codebooks together (codebooks live in "
            "the residual space the centroids define) or neither"
        )
    if rotation is not None and codebooks is None:
        raise ValueError(
            "rotation needs centroids + codebooks trained in the rotated "
            "residual space (ivfpq_opq_quantizers / "
            "ivfpq_opq_seed_quantizers)"
        )
    if codebooks is not None:
        n_codes = len(codebooks[0])
    if centroids is None:
        centroids = seed_centroids(vectors, n_cells, id_col, vec_col)
    spark = vectors.sparkSession
    cent_df = F.broadcast(
        spark.createDataFrame(
            [(int(c), [float(x) for x in v]) for c, v in centroids],
            "cell int, cv array<double>",
        )
    )
    # Multi-assignment (n_assign > 1): each corpus vector is encoded
    # under its n_assign nearest cells -- the standard IVF fix for the
    # boundary problem (a true neighbor sitting just across a Voronoi
    # face of every probed cell), which round-11 measurement showed is
    # the ENTIRE recall gap at fixed scan fraction (the ADC shortlist
    # inside probed cells was already lossless).  Storage and the
    # effective scanned fraction scale by n_assign; per-(query,
    # neighbor, cell) ADC sums reduce by MIN across the cells a
    # neighbor was found in (each cell's sum is a complete distance
    # estimate under that cell's residual -- summing across cells
    # would double-count).
    assign_cells = _top_cells_udf(centroids, n_assign)
    probe_cells = _top_cells_udf(centroids, n_probe)
    residual = F.zip_with(
        F.col(vec_col), F.col("cv"), lambda x, y: _dbl(x) - _dbl(y)
    )

    corpus = (
        vectors.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col),
            F.explode(assign_cells(F.col(vec_col))).alias("cell"),
        )
        .join(cent_df, "cell")
        .select("neighbor_id", "cell", residual.alias("rv"))
    )
    if rotation is not None:
        corpus = corpus.select(
            "neighbor_id", "cell", _rotate_expr("rv", rotation).alias("rv")
        )
    if codebooks is None:
        # Residual-space seed codebooks: the md5-smallest corpus rows'
        # RESIDUALS, sub-sliced -- the same deterministic sample rule
        # as pq_seed_codebooks, evaluated after coarse assignment.
        # Always trained on NEAREST-cell residuals (rank 0 of the
        # multi-assignment): under n_assign > 1 a vector has one
        # residual per assigned cell, and the md5-ordered sample must
        # stay deterministic -- id ties between a vector's own
        # residuals would make it order-dependent.
        seed_src = corpus
        if n_assign > 1:
            seed_src = (
                vectors.select(
                    F.col(id_col).alias("neighbor_id"),
                    F.col(vec_col),
                    F.posexplode(assign_cells(F.col(vec_col))).alias(
                        "__a_rank", "cell"
                    ),
                )
                .where(F.col("__a_rank") == 0)
                .join(cent_df, "cell")
                .select("neighbor_id", "cell", residual.alias("rv"))
            )
        codebooks = pq_seed_codebooks(
            seed_src.select(
                F.col("neighbor_id").alias(id_col), F.col("rv").alias(vec_col)
            ),
            m=m,
            k=n_codes,
            dim=dim,
            id_col=id_col,
            vec_col=vec_col,
        )
    codes_udf = _pq_codes_udf(codebooks)
    qdists_udf = _pq_query_dists_udf(codebooks)

    codes = corpus.select(
        "neighbor_id",
        "cell",
        F.posexplode(codes_udf(F.col("rv"))).alias("subspace", "code"),
    )
    # Per-(query, probed cell) residual -> LUT: the query's residual
    # differs per cell, so each probed cell gets its own m x n_codes
    # table (|queries| x n_probe x m x n_codes rows total -- KBs).
    probes = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col),
            F.explode(probe_cells(F.col(vec_col))).alias("cell"),
        )
        .join(cent_df, "cell")
        .select("query_id", "cell", residual.alias("q_rv"))
    )
    if rotation is not None:
        probes = probes.select(
            "query_id", "cell", _rotate_expr("q_rv", rotation).alias("q_rv")
        )
    qd = probes.select(
        "query_id",
        "cell",
        F.posexplode(qdists_udf(F.col("q_rv"))).alias("flat_idx", "d2"),
    ).select(
        "query_id",
        "cell",
        (F.col("flat_idx") / n_codes).cast("int").alias("subspace"),
        (F.col("flat_idx") % n_codes).alias("code"),
        "d2",
    )
    per_cell = (
        codes.join(F.broadcast(qd), ["cell", "subspace", "code"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id", "cell")
        .agg(F.sum("d2").alias("cell_dist"))
    )
    # min over cells: with n_assign == 1 this is the identity (one
    # cell per neighbor), keeping the catalog oracle's replay exact.
    scored = per_cell.groupBy("query_id", "neighbor_id").agg(
        F.min("cell_dist").alias("adc_dist")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    shortlist = (
        scored.withColumn("adc_rank", F.row_number().over(w))
        .where(F.col("adc_rank") <= rerank)
        .select("query_id", "neighbor_id")
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    nv = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec")
    )
    l2 = F.aggregate(
        F.zip_with(
            F.col("query_vec"),
            F.col("vec"),
            lambda x, y: (_dbl(x) - _dbl(y)) * (_dbl(x) - _dbl(y)),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.asc("l2_dist"), F.asc("neighbor_id")
    )
    return (
        shortlist.join(F.broadcast(qv), "query_id")
        .join(nv, "neighbor_id")
        .select("query_id", "neighbor_id", l2.alias("l2_dist"))
        .withColumn("rank", F.row_number().over(w2).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("l2_dist", 6).alias("l2_dist"),
            "rank",
        )
    )


def _ivfpq_residual_frame(
    vectors: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id_col, vec_col=residual) under single-cell dot-product
    assignment -- the shared residual construction of the IVF-PQ
    quantizer trainers."""
    spark = vectors.sparkSession
    cent_df = F.broadcast(
        spark.createDataFrame(
            [(int(c), [float(x) for x in v]) for c, v in centroids],
            "cell int, cv array<double>",
        )
    )
    assign = _top_cells_udf(centroids, 1)
    return (
        vectors.select(
            F.col(id_col),
            F.col(vec_col),
            F.explode(assign(F.col(vec_col))).alias("cell"),
        )
        .join(cent_df, "cell")
        .select(
            id_col,
            F.zip_with(
                F.col(vec_col), F.col("cv"), lambda x, y: _dbl(x) - _dbl(y)
            ).alias(vec_col),
        )
    )


def ivfpq_geometry(
    n_vectors: int,
    scan_fraction: float = 0.25,
    n_assign: int = 2,
    k: int = 10,
) -> dict[str, int]:
    """Corpus-scaled IVF-PQ probe geometry (the ``quantizer_plan``
    precedent from SemDeDup): derive (n_cells, n_probe, n_assign,
    rerank) from the corpus size instead of hard-coding a geometry
    that silently stops fitting as the corpus grows.

    Round-11 measurement (sf0.1, 50 queries, Lloyd quantizers): the
    ADC shortlist inside probed cells was LOSSLESS at every tested
    code budget -- recall@10 equalled the coarse-stage ceiling exactly
    (64 cells / 16 probes: ceiling 0.67 = recall 0.67; 256/64: 0.83 =
    0.83), so code budget and rerank depth bought nothing and the two
    real levers are cell granularity and multi-assignment.  Hence:

    * ``n_cells``: ~4 * sqrt(N) rounded up to a power of two, clamped
      to [16, 65536] -- finer cells track local structure, and cell
      population ~sqrt(N)/4 keeps both the assignment matmul
      (N x n_cells) and per-cell scans balanced as N grows.
    * ``n_assign``: 2 by default -- each vector is encoded under its
      two nearest cells, so a true neighbor just across the Voronoi
      face of every probed cell stays findable.  Costs 2x code
      storage (codes are m bytes/vector; the vectors table still
      dominates the index) and counts against the scan budget.
    * ``n_probe``: the largest count keeping the expected scanned
      fraction (n_assign * n_probe / n_cells) within
      ``scan_fraction``, floor 4.
    * ``rerank``: 20 * k, floor 100 -- deep enough that the exact
      pass decides (measured lossless well below this).
    """
    import math as _math

    root = max(16, int(4 * _math.sqrt(max(n_vectors, 1))))
    n_cells = 1 << (root - 1).bit_length()  # next power of two
    n_cells = max(16, min(65536, n_cells))
    n_probe = max(4, int(n_cells * scan_fraction / max(n_assign, 1)))
    return {
        "n_cells": n_cells,
        "n_probe": n_probe,
        "n_assign": n_assign,
        "rerank": max(100, 20 * k),
    }


def ivfpq_seed_quantizers(
    vectors: DataFrame,
    n_cells: int = 16,
    m: int = 8,
    n_codes: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = DIM,
) -> tuple[list[tuple[int, list[float]]], list[list[list[float]]]]:
    """The md5-pinned, SQL-replayable quantizer pair for
    ``ivfpq_topk`` / ``build_ivfpq_index``: ``seed_centroids`` coarse
    cells + residual-space ``pq_seed_codebooks`` -- exactly the pair
    the catalog oracle replays, so a persisted index built from it is
    result-identical to the ad-hoc query.
    ``ivfpq_trained_quantizers`` is the production upgrade."""
    centroids = seed_centroids(vectors, n_cells, id_col, vec_col)
    residuals = _ivfpq_residual_frame(vectors, centroids, id_col, vec_col)
    codebooks = pq_seed_codebooks(
        residuals, m=m, k=n_codes, dim=dim, id_col=id_col, vec_col=vec_col
    )
    return centroids, codebooks


def ivfpq_trained_quantizers(
    vectors: DataFrame,
    n_cells: int = 16,
    m: int = 8,
    n_codes: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = DIM,
) -> tuple[list[tuple[int, list[float]]], list[list[list[float]]]]:
    """The production (Lloyd-trained) quantizer pair for
    ``ivfpq_topk``: k-means coarse centroids, then per-subspace Lloyd
    codebooks trained on the RESIDUALS under that coarse assignment --
    the two-stage training IVFADC prescribes (codebooks trained on raw
    vectors would model the coarse structure the cells already
    removed).  Both trainers are the existing md5-sample driver
    routines (KB-scale, cell-count-scaled); measured at sf0.01:
    L2-recall@10 0.64 (seed) -> 0.84 (trained) at identical probe/
    rerank budgets.

    Sample sizing (round-14 fix): the Lloyd sample follows
    ``_derived_sample_size(n_cells)`` (16 rows/cell, clamped
    [2048, 65536]) exactly as ``ivf_geometry`` prescribes -- the old
    fixed 2048-row default DEGENERATED at n_cells >= 2048: one sample
    point per cluster makes the coarse quantizer memorize the sample,
    and because ``pq_codebooks`` draws the SAME md5-smallest ids, its
    training residuals were all exactly zero -> all-zero codebooks ->
    ADC ordering blind (measured at 200k vectors / 2048 derived
    cells: every code was 0 and a streamed-in exact duplicate was
    unfindable).  The codebook sample shares the derived size so each
    of the ``n_codes`` codewords trains on >= dozens of residuals."""
    sample = _derived_sample_size(n_cells)
    centroids = kmeans_centroids(
        vectors, n_cells, id_col=id_col, vec_col=vec_col, sample_size=sample
    )
    residuals = _ivfpq_residual_frame(vectors, centroids, id_col, vec_col)
    codebooks = pq_codebooks(
        residuals, m=m, k=n_codes, dim=dim, id_col=id_col, vec_col=vec_col,
        sample_size=sample,
    )
    return centroids, codebooks


def ivfpq_opq_quantizers(
    vectors: DataFrame,
    n_cells: int = 16,
    m: int = 8,
    n_codes: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = DIM,
) -> tuple[
    list[tuple[int, list[float]]], list[list[float]], list[list[list[float]]]
]:
    """The PRODUCTION quantizer triple for OPQ-rotated IVF-PQ
    (``ivfpq_topk(rotation=...)``): Lloyd coarse centroids, an OPQ
    rotation derived from the RESIDUAL covariance (PCA + eigenvalue
    allocation -- ``opq_rotation`` on the residual frame, which is
    where the coding error lives; Ge, He, Ke & Sun 2013 §5 applies
    OPQ to IVFADC residuals exactly this way), and Lloyd codebooks
    trained on residuals rotated BY THAT ROTATION via the same
    left-to-right fold the probe applies (``_rotate_expr``), so
    training and serving see bit-identical rotated values.  The
    rotation's mean component is discarded: k-means codebooks are
    translation-invariant, and the uncentered rotation keeps the
    probe-side transform a pure orthogonal fold.  Returns
    (centroids, R, codebooks); pass all three to ``ivfpq_topk``.

    When this lifts recall -- and when it can't: at a deep re-rank
    budget the ADC shortlist inside probed cells is already lossless
    (round-11 measurement: recall == the coarse ceiling), so no
    residual-coding improvement moves recall there; the rotation pays
    off when the shortlist is SHALLOW (rerank ~ k, the
    memory-constrained serving shape) or codes are coarse -- pinned
    on anisotropic data in pytest.

    Sample sizing follows ``_derived_sample_size(n_cells)``, the
    round-14 ``ivfpq_trained_quantizers`` fix: the fixed 2048-row
    default degenerated at n_cells >= 2048 (sample-memorizing coarse
    quantizer -> all-zero codebook training residuals)."""
    sample = _derived_sample_size(n_cells)
    centroids = kmeans_centroids(
        vectors, n_cells, id_col=id_col, vec_col=vec_col, sample_size=sample
    )
    residuals = _ivfpq_residual_frame(vectors, centroids, id_col, vec_col)
    mu, R_np = opq_rotation(residuals, m=m, vec_col=vec_col, dim=dim)
    R = [[float(R_np[i][j]) for j in range(dim)] for i in range(dim)]
    rotated = residuals.select(
        F.col(id_col), _rotate_expr(vec_col, R).alias(vec_col)
    )
    codebooks = pq_codebooks(
        rotated, m=m, k=n_codes, dim=dim, id_col=id_col, vec_col=vec_col,
        sample_size=sample,
    )
    return centroids, R, codebooks


def ivfpq_opq_seed_quantizers(
    vectors: DataFrame,
    n_cells: int = 16,
    m: int = 8,
    n_codes: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = DIM,
) -> tuple[
    list[tuple[int, list[float]]], list[list[float]], list[list[list[float]]]
]:
    """The md5-pinned, SQL-replayable quantizer triple for OPQ-rotated
    IVF-PQ -- ``ivfpq_seed_quantizers`` with the signed-Hadamard
    ``opq_seed_rotation`` (entries +-1/8, exactly orthogonal, products
    exact in float64) applied to the residuals before the codebook
    sample: the whole pipeline -- assignment, residual, rotation,
    codebook sample, encode, per-cell LUTs, ADC, re-rank -- replays as
    one SQL statement (``similarity_ivfpq_opq_ann``'s oracle), the
    ``opq_seed_adc_topk`` precedent composed into IVFADC."""
    centroids = seed_centroids(vectors, n_cells, id_col, vec_col)
    R = opq_seed_rotation(dim)
    residuals = _ivfpq_residual_frame(vectors, centroids, id_col, vec_col)
    rotated = residuals.select(
        F.col(id_col), _rotate_expr(vec_col, R).alias(vec_col)
    )
    codebooks = pq_seed_codebooks(
        rotated, m=m, k=n_codes, dim=dim, id_col=id_col, vec_col=vec_col
    )
    return centroids, R, codebooks


def projection_planes(
    out_dim: int, dim: int = DIM, token: str = "proj"
) -> list[list[float]]:
    """Johnson-Lindenstrauss projection matrix (out_dim x dim),
    derived like ``hash_hyperplanes`` but under its own md5 namespace
    (``'{token}:j:d'``) so the projection is statistically independent
    of the SRP-LSH planes.  Components are uniform [-1, 1) dyadic
    rationals (uint32 / 2^31 - 1): exactly representable in float64
    and exactly recomputable in ANSI SQL, so an external oracle
    replays the projected values bit-for-bit.  Any zero-mean
    sub-Gaussian entry distribution satisfies the JL distance bound
    (Achlioptas 2003 proves the discrete cases; bounded-uniform
    follows by the same sub-Gaussian argument)."""
    return [
        [
            int(hashlib.md5(f"{token}:{j}:{d}".encode()).hexdigest()[:8], 16)
            / 2147483648.0
            - 1.0
            for d in range(dim)
        ]
        for j in range(out_dim)
    ]


def project(vec: Column, planes: list[list[float]]) -> Column:
    """Project ``vec`` onto each plane with the SEQUENTIAL-fold dot
    product (array<double> out).  Sequential on purpose: the oracle's
    ``list_sum(list_transform(...))`` accumulates in the same element
    order over the same exact doubles, so projections -- and therefore
    every downstream ranking computed from them -- replay
    bit-identically across engines.  The literal tree is
    out_dim x dim nodes; at the 8x64 default that codegens instantly
    (the multi-second compile the LSH path dodged was 64x64)."""
    return F.array(
        *[dot(vec, F.array(*[F.lit(w) for w in row])) for row in planes]
    )


def rp_ann_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    out_dim: int = 8,
    oversample: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = DIM,
    token: str = "proj",
) -> DataFrame:
    """Approximate cosine top-k via random-projection prefilter: score
    every (query, vector) pair in the ``out_dim``-dimensional JL
    space (dim/out_dim = 8x fewer multiply-adds per pair at the
    defaults), keep the top ``k * oversample`` shortlist per query,
    then re-rank the shortlist with EXACT full-dimension cosine.
    JL preserves relative distances within (1 +- eps), so true
    neighbors land in the oversampled shortlist with high probability
    -- the classic dimensionality-reduction scale path when vectors
    are too wide to scan at full precision (complementary to LSH/IVF:
    same broadcast-queries x one-corpus-pass shape, but graceful
    recall decay instead of hard bucket misses).

    Applicability: the reduced-space cosine estimate carries noise
    ~ sqrt((1 - cos^2) / out_dim), so the prefilter works when true
    neighbors are separated from the bulk by MORE than that (near-dup
    mining, cluster retrieval -- cos gaps of 0.3+); on corpora whose
    top-k gap is a few hundredths (near-random vectors) the shortlist
    degrades toward sampling and LSH/IVF/graph ANN are the right
    tools.  The planted-cluster pytest pins the contract; the bench
    corpus is the degenerate case and is deliberately not an RP-ANN
    recall line.

    Scale shape: the corpus projects once (pure map, no shuffle) and
    never shuffles its full vectors -- only the shortlist (Q x k x
    oversample rows) is joined back for re-rank.  Self-matches
    excluded; deterministic neighbor-id tiebreaks at both stages.
    """
    planes = projection_planes(out_dim, dim=dim, token=token)
    corpus = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        project(F.col(vec_col), planes).alias("pv"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        project(F.col(vec_col), planes).alias("qp"),
    )
    reduced = corpus.join(
        F.broadcast(q), F.col("neighbor_id") != F.col("query_id")
    ).select(
        "query_id",
        "neighbor_id",
        cosine(F.col("qp"), F.col("pv")).alias("rcos"),
    )
    w_red = Window.partitionBy("query_id").orderBy(
        F.desc("rcos"), F.asc("neighbor_id")
    )
    shortlist = (
        reduced.withColumn("rrank", F.row_number().over(w_red))
        .where(F.col("rrank") <= k * oversample)
        .select("query_id", "neighbor_id")
    )
    qfull = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    rescored = (
        shortlist.join(
            vectors.select(
                F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv")
            ),
            "neighbor_id",
        )
        .join(F.broadcast(qfull), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("query_vec"), F.col("nv")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank"
        )
    )


def sq8_stats(
    vectors: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-dimension (d, dmin, dmax) over the corpus -- the train step
    of int8 scalar quantization (the FAISS SQ8 storage layout: 4x
    smaller than float32, 8x smaller than float64).  One posexplode +
    a dim-keyed agg (dim-count groups, map-side combined)."""
    return (
        vectors.select(F.posexplode(F.col(vec_col)).alias("d", "x"))
        .groupBy("d")
        .agg(
            F.min(F.col("x").cast("double")).alias("dmin"),
            F.max(F.col("x").cast("double")).alias("dmax"),
        )
    )


def scalar_quantize(
    vectors: DataFrame,
    stats: list[tuple[int, float, float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>): each component mapped to its uint8 code
    ``round((x - dmin) * 255 / (dmax - dmin))`` clamped to [0, 255]
    (constant-range dims code to 0).  ``stats`` is the dim-count-sized
    (d, dmin, dmax) list; when None it is computed and collected --
    the bounded sketch-to-closure pattern (64 rows for these
    embeddings, never corpus-sized).  Encoding itself is a pure map
    (in-row transform against literal arrays): no shuffle, linear,
    exactly the shape a 100-TB storage rewrite needs."""
    if stats is None:
        stats = [
            (r["d"], r["dmin"], r["dmax"])
            for r in sq8_stats(vectors, id_col, vec_col).collect()
        ]
    stats = sorted(stats)
    mins = F.array(*[F.lit(float(lo)) for _, lo, _ in stats])
    scales = F.array(
        *[
            F.lit((hi - lo) / 255.0 if hi > lo else 0.0)
            for _, lo, hi in stats
        ]
    )

    def code(x: Column, i: Column) -> Column:
        lo = F.element_at(mins, i + 1)
        sc = F.element_at(scales, i + 1)
        return F.when(sc == 0.0, F.lit(0)).otherwise(
            F.least(
                F.greatest(
                    F.round((x.cast("double") - lo) / sc, 0).cast("int"), F.lit(0)
                ),
                F.lit(255),
            )
        )

    return vectors.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x, i: code(x, i)).alias("codes"),
    )


def sq8_error_report(
    vectors: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-dimension reconstruction report for int8 scalar
    quantization: (d, dmin, dmax, mse, max_abs_err) where the
    dequantized value is ``dmin + code * scale``.  The acceptance
    gate a storage migration runs before switching the serving tier
    to SQ8 codes (max_abs_err is bounded by scale/2 for in-range
    data by construction -- asserted in pytest).

    Declarative twin of ``scalar_quantize`` (dim-keyed joins instead
    of the collected closure) so the whole report is one-statement
    SQL-replayable: explode -> dim-stats agg -> stats join back ->
    error agg.  Two passes over the exploded components; the
    dim-count stats table is scratch-cached between them."""
    e = vectors.select(F.posexplode(F.col(vec_col)).alias("d", "x")).select(
        "d", F.col("x").cast("double").alias("x")
    )
    stats = _SCRATCH.cache(
        e.groupBy("d").agg(
            F.min("x").alias("dmin"), F.max("x").alias("dmax")
        )
    )
    scale = (F.col("dmax") - F.col("dmin")) / 255.0
    code = F.when(F.col("dmax") <= F.col("dmin"), F.lit(0.0)).otherwise(
        F.least(
            F.greatest(F.round((F.col("x") - F.col("dmin")) / scale, 0), F.lit(0.0)),
            F.lit(255.0),
        )
    )
    dq = F.when(F.col("dmax") <= F.col("dmin"), F.col("dmin")).otherwise(
        F.col("dmin") + code * scale
    )
    err = F.col("x") - dq
    return (
        e.join(stats, "d")
        .groupBy(F.col("d").cast("long").alias("d"))
        .agg(
            F.round(F.first("dmin"), 10).alias("dmin"),
            F.round(F.first("dmax"), 10).alias("dmax"),
            F.round(F.avg(err * err), 10).alias("mse"),
            F.round(F.max(F.abs(err)), 10).alias("max_abs_err"),
        )
    )


def embedding_mean(
    vectors: DataFrame, vec_col: str = "embedding", dim: int = DIM
) -> "np.ndarray":
    """Per-dimension means of an embedding column in one Arrow
    partial-sum pass (shuffle volume: partitions x dim rows; driver
    pull: dim doubles -- model geometry, never corpus-sized).  The
    shared pass 1 of ``embedding_covariance`` / ``pca_whiten``."""

    def mean_partials(batches):
        sx = np.zeros(dim, dtype="float64")
        n = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
            sx += M.sum(axis=0)
            n += len(pdf)
        yield pd.DataFrame(
            {
                "d": np.arange(dim, dtype="int64"),
                "sx": sx,
                "n": np.full(dim, n, dtype="int64"),
            }
        )

    mean_rows = (
        vectors.select(vec_col)
        .mapInPandas(mean_partials, schema="d long, sx double, n long")
        .groupBy("d")
        .agg(F.sum("sx").alias("sx"), F.sum("n").alias("n"))
        .collect()
    )
    mu = np.zeros(dim, dtype="float64")
    for r in mean_rows:
        if r["n"]:
            mu[r["d"]] = r["sx"] / r["n"]
    return mu


def embedding_covariance(
    vectors: DataFrame,
    vec_col: str = "embedding",
    dim: int = DIM,
    mu: "np.ndarray | None" = None,
) -> DataFrame:
    """Full (dim x dim) covariance matrix of an embedding column --
    the statistic behind PCA whitening, OPQ rotations, anisotropy
    diagnosis, and encoder-drift audits.

    Plan: TWO corpus passes, centered.  Pass 1 is a dim-sized Arrow
    partial-sum agg for the per-dimension means (bounded collect: dim
    doubles, model geometry, never corpus-sized).  Pass 2 broadcasts
    the means into per-partition Arrow gemm partials (centered X^T X
    as one BLAS matmul per batch); a cell-keyed hash agg merges them
    and cov = sxx_centered / n.  Shuffle volume is partitions x dim^2
    rows, independent of corpus size.

    Why not the one-pass E[xy] - E[x]E[y] form: with nonzero means the
    subtraction cancels catastrophically and the surviving
    partition-order-dependent summation noise can straddle a rounding
    boundary an oracle sits on the other side of (observed in an
    external 1e-6 hash gate; the same pitfall
    ``plans/lifecycle_queries.py:profile_numeric_correlation``
    documents for raw 10^4-magnitude prices).  Centering keeps every
    accumulated term at the magnitude of the covariance itself, so
    relative error stays ~1e-14 instead of being amplified by
    mean^2 / cov.

    Returns (i, j, cov) for all dim^2 cells (the matrix is small;
    symmetric halves are both emitted so consumers can index either
    way).  Pass a precomputed ``mu`` (from ``embedding_mean``) to
    skip pass 1 when the caller already has the means.
    """
    sel = vectors.select(vec_col)
    if mu is None:
        mu = embedding_mean(vectors, vec_col=vec_col, dim=dim)

    def partials(batches):
        sxx = np.zeros((dim, dim), dtype="float64")
        n = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.vstack(pdf[vec_col].to_numpy()).astype("float64") - mu
            sxx += M.T @ M
            n += len(pdf)
        yield pd.DataFrame(
            {
                "cell": np.arange(dim * dim, dtype="int64"),
                "sxx": sxx.ravel(),
                "n": np.full(dim * dim, n, dtype="int64"),
            }
        )

    merged = (
        sel.mapInPandas(partials, schema="cell long, sxx double, n long")
        .groupBy("cell")
        .agg(F.sum("sxx").alias("sxx"), F.sum("n").alias("n"))
    )
    return merged.select(
        (F.col("cell") / dim).cast("int").alias("i"),
        F.pmod(F.col("cell"), F.lit(dim)).cast("int").alias("j"),
        (F.col("sxx") / F.col("n").cast("double")).alias("cov"),
    )


def pca_whiten(
    vectors: DataFrame,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = DIM,
    eps: float = 1e-9,
) -> tuple[DataFrame, list[float]]:
    """PCA-whitening projection: center, rotate onto the top-``k``
    covariance eigenvectors, and scale each direction to unit variance
    -- the decorrelation step OPQ/ADC quantizers and anisotropy-aware
    retrieval apply before coding (whitened space makes Euclidean
    geometry honest when the encoder's dimensions are correlated).

    The covariance comes from ``embedding_covariance`` (one corpus
    pass); eigendecomposition happens driver-side on the dim x dim
    matrix (bounded: dim is model geometry, never corpus-sized) and
    ships back as a broadcast literal matrix applied by one Arrow
    batch matmul -- a second single pass, no shuffle.  Eigenvector
    SIGNS are fixed deterministically (largest-|component| entry made
    positive) so output is stable across runs and partitionings.

    Returns (whitened DataFrame (id_col, vec_col: array<double> of
    len k), eigenvalues desc) -- eigenvalues double as the explained-
    variance report.
    """
    mu, V, evals_k = _pca_basis(vectors, k=k, vec_col=vec_col, dim=dim)
    W = V / np.sqrt(np.maximum(evals_k, 0.0) + eps)  # (dim, k)
    whitened = _apply_projection(vectors, mu, W, id_col=id_col, vec_col=vec_col)
    return whitened, [float(v) for v in evals_k]


def _pca_basis(
    vectors: DataFrame, k: int, vec_col: str = "embedding", dim: int = DIM
) -> tuple["np.ndarray", "np.ndarray", "np.ndarray"]:
    """Shared PCA front half: centered covariance (two corpus passes,
    ``embedding_mean`` + ``embedding_covariance`` sharing the means),
    driver-side eigh on the dim x dim matrix, eigenvectors ordered by
    descending eigenvalue with deterministic signs (largest-|entry|
    component made positive).  Returns (mu[dim], V[dim, k],
    evals[k])."""
    mu = embedding_mean(vectors, vec_col=vec_col, dim=dim)
    cells = embedding_covariance(vectors, vec_col=vec_col, dim=dim, mu=mu).collect()
    C = np.zeros((dim, dim), dtype="float64")
    for r in cells:
        C[r["i"], r["j"]] = r["cov"]
    C = (C + C.T) / 2.0  # enforce exact symmetry for eigh
    evals, evecs = np.linalg.eigh(C)
    order = np.argsort(evals)[::-1][:k]
    evals_k = evals[order]
    V = evecs[:, order]
    for c in range(V.shape[1]):  # deterministic sign: max-|entry| > 0
        pivot = int(np.argmax(np.abs(V[:, c])))
        if V[pivot, c] < 0:
            V[:, c] = -V[:, c]
    return mu, V, evals_k


def _apply_projection(
    vectors: DataFrame,
    mu: "np.ndarray",
    W: "np.ndarray",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(X - mu) @ W as one Arrow batch matmul per partition -- the
    broadcast-literal projection pass shared by whitening and the OPQ
    rotation.  No shuffle; output schema (id_col, vec_col)."""

    def apply_proj(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
            Z = (M - mu) @ W
            yield pd.DataFrame({id_col: pdf[id_col], vec_col: list(Z)})

    out_schema = f"{id_col} long, {vec_col} array<double>"
    return vectors.select(id_col, vec_col).mapInPandas(apply_proj, schema=out_schema)


def opq_rotation(
    vectors: DataFrame,
    m: int = 8,
    vec_col: str = "embedding",
    dim: int = DIM,
) -> tuple["np.ndarray", "np.ndarray"]:
    """OPQ-lite rotation (the non-parametric OPQ initialization of Ge,
    He, Ke & Sun 2013 §3: PCA + eigenvalue allocation): the full-rank
    PCA basis, with eigenvectors PERMUTED so each of the ``m`` PQ
    subspaces receives a balanced share of the variance -- greedy
    assignment of eigenvalues (descending) to the subspace with the
    smallest variance product so far.  Plain PCA ordering would pile
    the variance into subspace 0 and starve the rest, which is exactly
    the imbalance that makes naive PCA+PQ WORSE than raw PQ.

    The rotation is ORTHOGONAL (a permutation of an orthonormal
    basis), so L2 distances -- and therefore the meaning of
    'true top-k' -- are preserved exactly; only the subspace slicing
    changes.  Returns (mu[dim], R[dim, dim]); derived entirely from
    ``embedding_mean`` + ``embedding_covariance`` (the operators'
    one consumer chain: covariance -> basis -> coding rotation)."""
    if dim % m:
        raise ValueError(f"dim ({dim}) must divide into m ({m}) subspaces")
    mu, V, evals = _pca_basis(vectors, k=dim, vec_col=vec_col, dim=dim)
    d_sub = dim // m
    # Greedy LPT allocation balancing the variance SUM per subspace
    # (descending eigenvalues, each to the open bucket with the
    # smallest sum; ties break by subspace index -- deterministic).
    # The paper balances eigenvalue PRODUCTS, but greedy-min-product
    # degenerates when eigenvalues sit below 1 (every addition shrinks
    # the product, so one bucket swallows the whole spectrum head);
    # min-sum is scale-invariant and near-optimal for the same goal.
    buckets: list[list[int]] = [[] for _ in range(m)]
    var_sum = [0.0] * m
    for idx in range(dim):  # evals already descending
        open_b = [b for b in range(m) if len(buckets[b]) < d_sub]
        tgt = min(open_b, key=lambda b: (var_sum[b], b))
        buckets[tgt].append(idx)
        var_sum[tgt] += float(max(evals[idx], 0.0))
    perm = [i for b in buckets for i in b]
    R = V[:, perm]  # (dim, dim) orthogonal
    return mu, R


def opq_adc_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    n_codes: int = 16,
    rerank: int | None = None,
    dim: int = DIM,
    lloyd: bool = False,
) -> DataFrame:
    """PQ-ADC in the OPQ-rotated space: apply ``opq_rotation`` to the
    corpus AND the queries (one Arrow matmul pass each -- rotation
    preserves L2, so results compare 1:1 against raw ``pq_adc_topk``
    on the same ground truth), then run the UNCHANGED codebook-train /
    encode / lookup-table / ADC-rank / re-rank pipeline on the rotated
    vectors.  The decorrelated, variance-balanced subspaces quantize
    with lower distortion, which is the recall lever (measured in the
    bench ANN block: recall@10 vs raw PQ at identical m / n_codes /
    rerank).  ``lloyd=True`` trains production Lloyd codebooks in the
    rotated space (``pq_codebooks``); the default seed codebooks keep
    the pipeline deterministic-cheap.  Cost adds two projection passes
    and one covariance pass over raw PQ -- all corpus-linear, no new
    shuffle."""
    mu, R = opq_rotation(vectors, m=m, vec_col=vec_col, dim=dim)
    # The rotated corpus feeds three scans (codebook training, encode,
    # re-rank); scratch-cache it so the Arrow matmul runs once, not
    # three times (measured at sf0.1: 4.25 -> 3.62 s).
    rv = _SCRATCH.cache(
        _apply_projection(vectors, mu, R, id_col=id_col, vec_col=vec_col)
    )
    rq = _apply_projection(queries, mu, R, id_col=id_col, vec_col=vec_col)
    train = pq_codebooks if lloyd else pq_seed_codebooks
    return pq_adc_topk(
        rv,
        rq,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        m=m,
        n_codes=n_codes,
        codebooks=train(
            rv, m=m, k=n_codes, dim=dim, id_col=id_col, vec_col=vec_col
        ),
        rerank=rerank,
    )


def opq_seed_rotation(dim: int = DIM) -> list[list[float]]:
    """Pinned orthogonal coding rotation for the OPQ oracle twin: a
    signed Walsh-Hadamard transform, R = D1 H D2 / sqrt(dim) with
    R[i][j] = s1(i) * s2(j) * (-1)^popcount(i AND j) / sqrt(dim) and
    md5-derived sign flips (``s(i) = +1 iff the first 8 hex chars of
    md5('rot1:i') are even`` -- the ``hash_hyperplanes`` portability
    idiom).  This is the classic structured randomized rotation
    (the HD blocks of Ailon & Chazelle 2009's fast JL transform, and
    the random-rotation baseline OPQ is measured against in Ge, He,
    Ke & Sun 2013 §4): every output coordinate mixes ALL input
    coordinates with equal weight, spreading per-subspace variance --
    the cheap approximation of eigenvalue allocation -- while staying
    EXACTLY orthogonal (H H^T = dim * I, so R R^T = I; requires dim a
    power of two).

    Exactness contract: with dim = 64 every entry is +-1/8 -- a power
    of two, so ``x * R[i][j]`` is exact in float64 -- and applying the
    rotation with a left-to-right fold gives BIT-IDENTICAL rotated
    vectors in any engine that sums the same order (Spark
    ``F.aggregate`` == DuckDB ``list_sum``): the one stage
    ``opq_rotation`` (data-derived PCA) can never replay in SQL is
    exact here by construction."""
    if dim & (dim - 1):
        raise ValueError(f"dim ({dim}) must be a power of two (Hadamard)")

    def sgn(tag: str, i: int) -> float:
        h = int(hashlib.md5(f"{tag}:{i}".encode()).hexdigest()[:8], 16)
        return 1.0 if h % 2 == 0 else -1.0

    s1 = [sgn("rot1", i) for i in range(dim)]
    s2 = [sgn("rot2", j) for j in range(dim)]
    root = float(dim) ** 0.5
    return [
        [
            s1[i] * s2[j] * (1.0 if bin(i & j).count("1") % 2 == 0 else -1.0) / root
            for j in range(dim)
        ]
        for i in range(dim)
    ]


def _rotate_expr(vec_col: str | Column, R: list[list[float]]) -> Column:
    """Rotated vector as a pure column expression: out[j] =
    fold_i(x[i] * R[i][j]), left-to-right -- the summation order
    DuckDB's ``list_sum`` replays bit-for-bit (no numpy matmul, whose
    pairwise blocking would re-order the additions).  dim^2 literals
    ride in the plan (64 KB at dim 64); JVM-side whole-stage codegen,
    no Python.  Accepts a column name or a Column expression (the
    IVF-PQ residual path rotates a ``zip_with`` expression in place)."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    dim = len(R)
    cols = []
    for j in range(dim):
        col_j = F.array(*[F.lit(float(R[i][j])) for i in range(dim)])
        cols.append(
            F.aggregate(
                F.zip_with(v, col_j, lambda x, r: _dbl(x) * r),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )
    return F.array(*cols)


def opq_seed_adc_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    n_codes: int = 16,
    rerank: int | None = None,
    dim: int = DIM,
) -> DataFrame:
    """PQ-ADC in a PINNED rotated space -- the oracle-checkable twin
    of ``opq_adc_topk`` (the ``seed_centroids`` / ``seed_hub``
    precedent): ``opq_seed_rotation``'s signed-Hadamard rotation
    replaces the data-derived PCA basis, so rotation + seed-codebook
    sample + encode + lookup tables + ADC rank + exact re-rank all
    replay in one SQL statement.  The re-rank computes L2 in the
    ROTATED space -- equal to original-space L2 because the rotation
    is exactly orthogonal, so 'true top-k' keeps its meaning.
    Same stage shape and cost as ``opq_adc_topk`` minus the
    covariance pass; ``opq_adc_topk(lloyd=True)`` remains the
    production path."""
    R = opq_seed_rotation(dim)
    rot = _rotate_expr(vec_col, R)
    rv = vectors.select(F.col(id_col), rot.alias(vec_col))
    rq = queries.select(F.col(id_col), rot.alias(vec_col))
    return pq_adc_topk(
        rv,
        rq,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        m=m,
        n_codes=n_codes,
        codebooks=pq_seed_codebooks(
            rv, m=m, k=n_codes, dim=dim, id_col=id_col, vec_col=vec_col
        ),
        rerank=rerank,
    )


def knn_label_transfer(
    batch: DataFrame,
    corpus: DataFrame,
    centroids: list[tuple[int, list[float]]],
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """kNN label transfer (weak labeling / pseudo-labeling at corpus
    scale): every unlabeled vector gets the majority label of its
    top-``k`` cosine neighbors in the labeled corpus, plus the vote
    count and the winning label's mean similarity -- the confidence
    columns a downstream gate thresholds on.

    Composes ``ivf_cogroup_join`` (the large-by-large shape: the
    unlabeled side is itself a full table, so no broadcast exists),
    then one equi-join to the corpus labels and one
    ``(query, label)``-keyed vote aggregate; the winner is a per-query
    window over at most ``k`` vote rows.  Ties break by vote count,
    then mean similarity (rounded, so the order is reproducible across
    engines), then label -- fully deterministic.
    """
    nn = ivf_cogroup_join(
        batch, corpus, centroids, k=k, n_probe=n_probe,
        id_col=id_col, vec_col=vec_col,
    )
    labels = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("__lbl")
    )
    votes = (
        nn.join(labels, "neighbor_id")
        .groupBy("query_id", "__lbl")
        .agg(
            F.count(F.lit(1)).cast("long").alias("votes"),
            F.round(F.avg("cos_sim"), 6).alias("mean_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("votes"), F.desc("mean_sim"), F.asc("__lbl")
    )
    return (
        votes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            "query_id",
            F.col("__lbl").alias("predicted_label"),
            "votes",
            "mean_sim",
        )
    )


def pair_similarity_histogram(
    vectors: DataFrame,
    sample_buckets: int = 1,
    n_buckets: int = 1,
    bins: int = 40,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Pairwise-cosine distribution of a deterministic corpus sample --
    the calibration read BEFORE picking a semantic-dedup threshold
    (SemDeDup's eps) or an ANN score cutoff: the histogram shows where
    the near-dup mass separates from the background bulk, and
    ``frac_ge`` (fraction of sampled pairs at or above the bin's lower
    edge) prices any candidate eps as 'this share of all pairs would
    be flagged'.

    The sample is the md5 slice ``bucket(id) < sample_buckets`` of
    ``n_buckets`` -- content-addressed, so the histogram is
    reproducible run-to-run and comparable across corpus snapshots
    (same slice semantics as every split/sample here).  Pair scoring
    is a broadcast self-join of the SAMPLE ONLY: its cost is
    (sample size)^2 -- a property of the chosen slice geometry, never
    of the corpus -- which is what makes it safe to run where the
    full all-pairs scan is not.  The tiny bin table is cached (it
    feeds the count and the suffix-sum consumers), and the suffix sum
    is the bucket-explode trick, not an unpartitioned window.

    Bins partition [-1, 1] into ``bins`` equal cells; an exact 1.0
    lands in the top bin.
    """
    if bins < 1 or n_buckets < 1 or not (1 <= sample_buckets <= n_buckets):
        raise ValueError(
            f"need bins >= 1, 1 <= sample_buckets <= n_buckets; got "
            f"bins={bins}, sample_buckets={sample_buckets}, "
            f"n_buckets={n_buckets}"
        )
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long") % n_buckets
    )
    sample = vectors.where(bucket < sample_buckets).select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        l2_norm(F.col(vec_col)).alias("__n"),
    )
    pairs = (
        sample.alias("a")
        .join(
            F.broadcast(sample.alias("b")),
            F.col("a.__id") < F.col("b.__id"),
        )
        .select(
            (
                dot(F.col("a.__v"), F.col("b.__v"))
                / (F.col("a.__n") * F.col("b.__n"))
            ).alias("cos_sim")
        )
    )
    bin_col = F.least(
        F.greatest(
            F.floor((F.col("cos_sim") + 1.0) / 2.0 * bins).cast("long"),
            F.lit(0),
        ),
        F.lit(bins - 1),
    )
    hist = _SCRATCH.cache(
        pairs.select(bin_col.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )
    totals = hist.agg(F.sum("n_pairs").alias("__tot"))
    # suffix sum over the tiny bin table: each bin's count contributes
    # to every bin at or below it (<= bins^2/2 exploded rows)
    ge = (
        hist.select(
            F.explode(F.sequence(F.lit(0), F.col("bin"))).alias("bin"),
            "n_pairs",
        )
        .groupBy("bin")
        .agg(F.sum("n_pairs").cast("long").alias("n_ge"))
    )
    spark = vectors.sparkSession
    grid = spark.range(bins).select(F.col("id").cast("long").alias("bin"))
    return (
        grid.join(hist, "bin", "left")
        .join(ge, "bin", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bin",
            F.round(F.lit(-1.0) + F.col("bin") * (2.0 / bins), 6).alias(
                "cos_lo"
            ),
            F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
            F.round(
                F.coalesce("n_ge", F.lit(0)) / F.col("__tot"), 6
            ).alias("frac_ge"),
        )
    )


def dim_truncation_report(
    vectors: DataFrame,
    queries: DataFrame,
    dims: tuple[int, ...] = (8, 16, 32),
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Recall@k of PREFIX-truncated cosine search vs the full-dim
    exact answer, one row per prefix width -- the measurement behind
    the Matryoshka-style serving decision (Kusupati et al., NeurIPS
    2022): if the first d components already recover the full-dim
    neighbors, the ANN index stores and scores d/dim the bytes, and
    every probe's matmul shrinks by the same factor.  Run this report
    BEFORE building a 100 TB index family, the way
    ``lsh_tuning_report`` prices banding before the pair join.

    Per prefix width the corpus streams once against the broadcast
    query set (``brute_force_topk``'s exact shape -- queries bounded,
    never corpus x corpus); the per-dim top-k lists union with a
    ``dim_prefix`` tag, left-join the full-dim pair set, and one
    grouped agg yields hits and recall.  len(dims) bounded passes, no
    driver-side loops over data.

    Ties inside a truncated ranking break on neighbor id -- the same
    deterministic order the full-dim search and the SQL oracle use, so
    recall is exactly replayable."""
    full = brute_force_topk(
        vectors, queries, k=k, id_col=id_col, vec_col=vec_col
    ).select("query_id", "neighbor_id", F.lit(1).alias("__hit"))
    parts = []
    for d in dims:
        tv = vectors.select(
            F.col(id_col), F.slice(F.col(vec_col), 1, int(d)).alias(vec_col)
        )
        tq = queries.select(
            F.col(id_col), F.slice(F.col(vec_col), 1, int(d)).alias(vec_col)
        )
        parts.append(
            brute_force_topk(tv, tq, k=k, id_col=id_col, vec_col=vec_col)
            .select("query_id", "neighbor_id")
            .withColumn("dim_prefix", F.lit(int(d)).cast("long"))
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.join(full, ["query_id", "neighbor_id"], "left")
        .groupBy("dim_prefix")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_hit"),
            F.round(
                F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
                / F.count(F.lit(1)),
                6,
            ).alias("recall_at_k"),
        )
        .orderBy("dim_prefix")
    )
