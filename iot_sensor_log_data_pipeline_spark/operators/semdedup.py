"""Semantic deduplication (SemDeDup, Abbas et al. 2023,
arXiv:2303.09540): drop documents whose EMBEDDINGS are near-identical,
catching paraphrases and boilerplate rewrites that token-level
MinHash/SimHash cannot see -- the embedding-space member of the dedup
family, bridging ``operators/dedup.py`` (text near-dup machinery) and
``operators/similarity.py`` (vector quantizers).

Algorithm, Spark-first:
1. Coarse-quantize every vector to its nearest centroid cell (the same
   Arrow-batched 1-NN assignment the IVF index uses -- centroids from
   ``seed_centroids`` for oracle-pinned runs or ``kmeans_centroids``
   in production).
2. WITHIN each cell only, find pairs with cosine >= threshold: a
   cell-keyed self-join, never an all-pairs corpus product -- the
   paper's key scalability observation: NEAR-IDENTICAL embeddings
   1-NN-quantize to the same cell, so the restriction's contract is
   near-dup recall at high thresholds (pytest plants near-duplicates
   and asserts all are found within-cell).  Weakly-similar pairs at
   low thresholds legitimately straddle cell boundaries and are out
   of contract -- use ``similarity.embedding_cosine_pairs`` when you
   need those.
3. Connected components over the pair graph (pointer-jumping,
   ``dedup.connected_components``), keep the min-id exemplar per
   component.  (The paper keeps the member with LOWEST similarity to
   the cell centroid; min-id is the deterministic, oracle-replayable
   choice and the keep-policy is an orthogonal one-line window swap.)

At 100 TB: the assignment is one Arrow map pass (persistable, same
column the IVF index stores); the self-join shuffles on the cell id;
per-cell pair volume is bounded by the quantizer's cell sizes (finer
cells trade recall for cost); components run O(log diameter) rounds
on the pair list only.

Cell-cost bounds (the within-cell self-join is sum of per-cell
SQUARES, so one balloon cell is a quadratic bomb -- the paper runs
~1e5 clusters at corpus scale):
- ``n_cells`` defaults to ``ceil(N / target_cell_size)`` capped at
  ``DEFAULT_MAX_N_CELLS`` (``quantizer_plan``), so the quantizer gets
  finer as the corpus grows while the driver-side Lloyd sample and
  the per-executor centroid matrix stay CONSTANT-bounded -- past the
  cap, the distributed splitter below supplies the granularity.
- ``cell_cap`` recursively SPLITS any cell whose membership exceeds
  the cap (``split_oversized_cells``): random-projection median cuts
  (RP-tree style), halving every oversized cell per round, so the
  bound arrives in O(log2(max_cell/cap)) cheap rounds with no balance
  assumptions.  Near-identical vectors project near-identically, so
  planted duplicates stay together (recall pytest keeps the contract
  honest).  A cell of EXACTLY identical vectors cannot be split and
  is frozen intact -- its quadratic pair list is the true answer, not
  a planning accident.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import connected_components, partitioned_components
from .similarity import _top_cells_udf, dot, kmeans_centroids, l2_norm

#: Default members-per-cell target for the corpus-derived quantizer
#: size: n_cells ~ N / this, the granularity at which the within-cell
#: self-join stays ~target^2 per cell.
DEFAULT_TARGET_CELL_SIZE = 256

#: Hard ceiling on the DEFAULT quantizer size.  ``n_cells`` must not
#: grow linearly with the corpus forever: the coarse quantizer is a
#: driver-side Lloyd's over a collected sample plus an
#: n_cells x dim centroid matrix shipped in every assignment UDF
#: closure, so BOTH must stay constant-bounded as N grows.  8192 cells
#: keeps the Lloyd sample (8 per cell, see ``quantizer_plan``) at
#: <= 64k rows -- a few MB collected once -- and the shipped centroid
#: matrix at 8192 * dim doubles (4 MB at dim=64).  Granularity beyond
#: the cap is the job of the DISTRIBUTED ``split_oversized_cells``
#: pass, which bounds per-cell membership regardless of how coarse the
#: quantizer is.  Callers with a distributed quantizer of their own
#: pass ``n_cells``/``centroids`` explicitly and are not capped.
DEFAULT_MAX_N_CELLS = 8192

#: Ceiling on the driver-side Lloyd sample that accompanies the
#: capped default quantizer: 8 members per cell at the cap.
DEFAULT_MAX_QUANTIZER_SAMPLE = 8 * DEFAULT_MAX_N_CELLS


def quantizer_plan(
    n: int,
    target_cell_size: int = DEFAULT_TARGET_CELL_SIZE,
    max_n_cells: int = DEFAULT_MAX_N_CELLS,
) -> tuple[int, int]:
    """(n_cells, lloyd_sample_size) for a corpus of ``n`` vectors.

    ``n_cells = min(ceil(n / target_cell_size), max_n_cells)`` -- the
    paper's many-clusters regime while the corpus is small enough that
    a finer quantizer is free, then a CONSTANT once the driver-side
    Lloyd's would otherwise grow with the corpus.  The sample is 8
    members per cell, likewise constant-capped.  Pure function so the
    100-TB bound is pytest-checkable without a Spark session: for
    arbitrarily large ``n`` the driver collect stays
    <= ``DEFAULT_MAX_QUANTIZER_SAMPLE`` rows and the shipped centroid
    list <= ``max_n_cells`` entries."""
    n_cells = max(1, min(math.ceil(n / target_cell_size), max_n_cells))
    sample = max(2048, min(8 * n_cells, 8 * max_n_cells))
    return n_cells, sample


def assign_nearest_cell(
    vectors: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, vec, nrm, cell): each vector tagged with its nearest
    centroid (argmax dot product, ties to the lower cell id) plus its
    precomputed L2 norm for downstream cosine."""
    one_nn = _top_cells_udf(centroids, 1)
    return vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        l2_norm(F.col(vec_col)).alias("nrm"),
        F.element_at(one_nn(F.col(vec_col)), 1).alias("cell"),
    )


def _rp_direction(cell: int, rnd: int, dim: int) -> list[float]:
    """md5-derived random direction for the (cell, round) cut --
    deterministic, partitioning-independent, engine-portable (the same
    hash-to-uniform[-1,1) construction as
    ``similarity.hash_hyperplanes``)."""
    import hashlib

    return [
        int(hashlib.md5(f"rp:{cell}:{rnd}:{d}".encode()).hexdigest()[:8], 16)
        / 2**31
        - 1.0
        for d in range(dim)
    ]


def split_oversized_cells(
    assigned: DataFrame,
    cell_cap: int,
    max_rounds: int = 16,
    spill_frac: float = 0.05,
) -> DataFrame:
    """Bound per-cell membership by recursive random-projection median
    cuts with SPILL (RP-tree, Dasgupta & Freund STOC'08; overlapping
    cuts a la spill trees, Liu et al. NIPS'04): (id, vec, nrm, cell)
    in, same schema out with every splittable cell at or under
    ``cell_cap``.  Members inside the spill band are assigned to BOTH
    sides, so the output is a MULTI-assignment -- pair consumers
    dedupe on (id_a, id_b) (``semantic_pairs`` does).

    Each round, every oversized cell is cut at the median of its
    members' projections onto an md5-derived random direction:
    (1) per-cell counts -- one hash agg, only oversized cell ids
    (<= n_cells rows) reach the driver; (2) a broadcast (cell,
    direction) table joins members of oversized cells and one more
    agg takes each cell's [0.5 - s/2, 0.5 + s/2] projection quantiles
    (s = ``spill_frac``); (3) members at or below the upper fence keep
    the parent cell id, members above the lower fence move to a fresh
    id -- the band in between lands in both.  Halving per round makes
    convergence O(log2(max_cell/cap)) rounds with NO balance
    assumptions -- the failure mode of nearest-seed Voronoi splitting
    in high dimension, where the center-most seed captures most of a
    tight cluster.

    Near-dup contract: near-identical vectors project near-identically,
    so a duplicate pair is separated only if it straddles the FULL
    spill band -- i.e. the pair's own projection distance exceeds the
    band width, vanishing for genuine near-dups (the planted-dup
    recall pytest keeps this honest).  Memory cost of spill is
    (1 + spill_frac)^rounds, < 2.2x at the default over 16 rounds.
    A cell of EXACTLY identical vectors cannot be split (every
    projection equals both fences, everything stays left); such cells
    are frozen after one unchanged round -- their quadratic pair list
    is the true answer, not a planning accident.
    """
    spark = assigned.sparkSession
    first = assigned.select(F.size("vec").alias("d")).first()
    if first is None:
        return assigned
    dim = first["d"]
    next_cell = (
        assigned.agg(F.max("cell").cast("long")).collect()[0][0] or 0
    ) + 1
    frozen: set[int] = set()
    for rnd in range(max_rounds):
        sizes = {
            r["cell"]: r["n"]
            for r in assigned.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > cell_cap)
            .collect()
        }
        over = sorted(c for c in sizes if c not in frozen)
        if not over:
            break
        dirs = spark.createDataFrame(
            [(int(c), _rp_direction(int(c), rnd, dim)) for c in over],
            "cell int, __r array<float>",
        )
        right_ids = spark.createDataFrame(
            [(int(c), int(next_cell + i)) for i, c in enumerate(over)],
            "cell int, __rid int",
        )
        next_cell += len(over)
        members = assigned.where(F.col("cell").isin([int(c) for c in over]))
        projected = members.join(F.broadcast(dirs), "cell").withColumn(
            "__proj", dot(F.col("vec"), F.col("__r"))
        )
        fences = projected.groupBy("cell").agg(
            F.percentile_approx(
                "__proj",
                F.array(
                    F.lit(0.5 - spill_frac / 2), F.lit(0.5 + spill_frac / 2)
                ),
                F.lit(10000),
            ).alias("__q")
        )
        fenced = (
            projected.join(F.broadcast(fences), "cell")
            .join(F.broadcast(right_ids), "cell")
            .withColumn("__lo", F.element_at("__q", 1))
            .withColumn("__hi", F.element_at("__q", 2))
        )
        left = fenced.where(F.col("__proj") <= F.col("__hi")).select(
            "id", "vec", "nrm", F.col("cell").cast("int").alias("cell")
        )
        right = fenced.where(F.col("__proj") > F.col("__lo")).select(
            "id", "vec", "nrm", F.col("__rid").cast("int").alias("cell")
        )
        reassigned = left.unionByName(right)
        new_assigned = (
            assigned.where(~F.col("cell").isin([int(c) for c in over]))
            .unionByName(reassigned)
            .localCheckpoint(eager=True)
        )
        # Freeze cells that did not shrink (identical-projection blobs
        # where the whole cell sits at the median).
        still = {
            r["cell"]: r["n"]
            for r in new_assigned.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > cell_cap)
            .collect()
        }
        frozen |= {c for c, n in still.items() if sizes.get(c) == n}
        assigned = new_assigned
    return assigned


def _cell_pairs_arrow(assigned: DataFrame, threshold: float) -> DataFrame:
    """Within-cell pair scoring as ONE BLAS matmul per cell
    (``applyInPandas``): each cell's member matrix M (n x dim) scores
    all its pairs at once via (M M^T) / outer(norms) -- bench-measured
    ~40x faster than the per-pair JVM ``aggregate(zip_with(...))``
    fold, which allocates two intermediate arrays per pair (46.5 s at
    sf0.1 for 1.5M candidate pairs on the text twin).  Numerics:
    float64 gemm vs the fold's sequential summation differ at ~1e-15
    relative -- far below the 1e-6 output rounding, so the DuckDB
    oracles (which replay the sequential fold) still hash-match
    (pytest asserts <= 1e-9 agreement).  Grouped Arrow loads ONE CELL
    at a time into executor memory -- exactly the budget ``cell_cap``
    bounds."""
    import numpy as np
    import pandas as pd

    id_type = assigned.schema["id"].dataType.simpleString()
    out_schema = f"cell int, id_a {id_type}, id_b {id_type}, cos_sim double"

    def pairs_of_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame(
                {"cell": [], "id_a": [], "id_b": [], "cos_sim": []}
            )
        M = np.vstack(pdf["vec"].to_numpy()).astype("float64")
        nrm = pdf["nrm"].to_numpy().astype("float64")
        ids = pdf["id"].to_numpy()
        S = (M @ M.T) / np.outer(nrm, nrm)
        iu, ju = np.triu_indices(n, 1)
        keep = S[iu, ju] >= threshold
        ia, jb = ids[iu[keep]], ids[ju[keep]]
        lo, hi = np.minimum(ia, jb), np.maximum(ia, jb)
        return pd.DataFrame(
            {
                "cell": np.full(int(keep.sum()), int(pdf["cell"].iloc[0])),
                "id_a": lo,
                "id_b": hi,
                "cos_sim": S[iu[keep], ju[keep]],
            }
        )

    return assigned.groupBy("cell").applyInPandas(pairs_of_cell, out_schema)


def semantic_pairs(
    vectors: DataFrame,
    threshold: float,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_cap: int | None = None,
    method: str = "arrow",
) -> DataFrame:
    """Within-cell near-duplicate pairs: (cell, id_a, id_b, cos_sim)
    with id_a < id_b and cosine >= threshold.  The shuffle key is the
    cell id, so cost is sum of per-cell squares, not corpus^2;
    ``cell_cap`` additionally splits oversized cells before scoring
    (see ``split_oversized_cells``).  ``method='arrow'`` (default)
    scores each cell with one BLAS matmul; ``method='expr'`` is the
    JVM-fold twin (sequential summation order, pytest-identical to
    1e-9) kept for oracle-exact replays and Arrow-less environments."""
    assigned = assign_nearest_cell(vectors, centroids, id_col, vec_col)
    if cell_cap is not None:
        assigned = split_oversized_cells(assigned, cell_cap)
    if method == "arrow":
        pairs = _cell_pairs_arrow(assigned, threshold)
        if cell_cap is not None:
            pairs = (
                pairs.groupBy("id_a", "id_b")
                .agg(
                    F.min("cell").alias("cell"),
                    F.min("cos_sim").alias("cos_sim"),
                )
                .select("cell", "id_a", "id_b", "cos_sim")
            )
        return pairs
    if method != "expr":
        raise ValueError(f"unknown method {method!r}; use 'arrow' or 'expr'")
    a = assigned.select(
        "cell",
        F.col("id").alias("id_a"),
        F.col("vec").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = assigned.select(
        "cell",
        F.col("id").alias("id_b"),
        F.col("vec").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    pairs = (
        a.join(b, "cell")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "cell",
            "id_a",
            "id_b",
            (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias(
                "cos_sim"
            ),
        )
        .where(F.col("cos_sim") >= threshold)
    )
    if cell_cap is not None:
        # The spill band multi-assigns members, so a pair can surface
        # from two (sub-)cells: keep one row per pair (min cell id;
        # cos_sim is identical on every copy -- same two vectors).
        pairs = pairs.groupBy("id_a", "id_b").agg(
            F.min("cell").alias("cell"), F.min("cos_sim").alias("cos_sim")
        ).select("cell", "id_a", "id_b", "cos_sim")
    return pairs


def semantic_dedup(
    vectors: DataFrame,
    threshold: float,
    centroids: list[tuple[int, list[float]]] | None = None,
    n_cells: int | None = None,
    target_cell_size: int = DEFAULT_TARGET_CELL_SIZE,
    cell_cap: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup survivors: ``vectors`` minus every non-exemplar member
    of each semantic near-dup component (min id survives).

    Quantizer sizing scales with the corpus up to a CONSTANT ceiling
    (``quantizer_plan``): ``n_cells`` defaults to
    ``min(ceil(N / target_cell_size), DEFAULT_MAX_N_CELLS)``, so the
    driver-side Lloyd sample and the shipped centroid matrix are
    bounded for arbitrarily large N -- beyond the cap, granularity
    comes from the DISTRIBUTED per-cell splitting, which the
    production path (no pinned ``centroids``) always enforces at
    ``4 * target_cell_size`` members per cell.  One skewed or merely
    cap-coarsened cluster can therefore never make the within-cell
    self-join quadratic in the corpus.  Pass ``centroids`` to pin the
    quantizer (oracle runs; cap off unless given explicitly)."""
    if centroids is None:
        if n_cells is None:
            n_cells, sample = quantizer_plan(vectors.count(), target_cell_size)
        else:
            sample = max(2048, min(8 * n_cells, DEFAULT_MAX_QUANTIZER_SAMPLE))
        if cell_cap is None:
            cell_cap = 4 * target_cell_size
        centroids = kmeans_centroids(
            vectors,
            n_cells,
            id_col=id_col,
            vec_col=vec_col,
            sample_size=sample,
        )
    pairs = semantic_pairs(
        vectors, threshold, centroids, id_col, vec_col, cell_cap=cell_cap
    )
    if cell_cap is None:
        # Uncapped cells are disjoint (pure 1-NN assignment), so every
        # pair is cell-local and components are too: one grouped
        # union-find pass replaces the iterative rounds.  With a cap,
        # spill-band multi-assignment can stitch components across
        # sub-cells, so the general algorithm stays in charge.
        comp = partitioned_components(pairs, "cell")
    else:
        comp = connected_components(pairs.select("id_a", "id_b"))
    keepers = comp.groupBy("component").agg(F.min("node").alias("keep"))
    drop = (
        comp.join(keepers, "component")
        .where(F.col("node") != F.col("keep"))
        .select(F.col("node").alias(id_col))
    )
    return vectors.join(drop, id_col, "left_anti")
