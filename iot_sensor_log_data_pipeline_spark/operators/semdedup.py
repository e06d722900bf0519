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
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import connected_components
from .similarity import _top_cells_udf, dot, kmeans_centroids, l2_norm


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


def semantic_pairs(
    vectors: DataFrame,
    threshold: float,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Within-cell near-duplicate pairs: (cell, id_a, id_b, cos_sim)
    with id_a < id_b and cosine >= threshold.  The join key is the
    cell id, so cost is sum of per-cell squares, not corpus^2."""
    assigned = assign_nearest_cell(vectors, centroids, id_col, vec_col)
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
    return (
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


def semantic_dedup(
    vectors: DataFrame,
    threshold: float,
    centroids: list[tuple[int, list[float]]] | None = None,
    n_cells: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup survivors: ``vectors`` minus every non-exemplar member
    of each semantic near-dup component (min id survives).  Pass
    ``centroids`` to pin the quantizer (oracle runs); defaults to the
    sampled Lloyd's quantizer."""
    if centroids is None:
        centroids = kmeans_centroids(
            vectors, n_cells, id_col=id_col, vec_col=vec_col
        )
    pairs = semantic_pairs(vectors, threshold, centroids, id_col, vec_col)
    comp = connected_components(pairs.select("id_a", "id_b"))
    keepers = comp.groupBy("component").agg(F.min("node").alias("keep"))
    drop = (
        comp.join(keepers, "component")
        .where(F.col("node") != F.col("keep"))
        .select(F.col("node").alias(id_col))
    )
    return vectors.join(drop, id_col, "left_anti")
