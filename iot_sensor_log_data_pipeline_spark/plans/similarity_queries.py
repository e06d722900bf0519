"""Similarity-search catalog queries (north star: cosine top-k over
the ``embeddings`` table; brute-force baseline + LSH-bucketed ANN).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io_utils import load, parallelize_small
from ..operators import similarity as SIM
from .catalog import register

#: DuckDB double-precision dot product over FLOAT[] columns (explicit
#: element order, double accumulation -- mirrors the Spark fold).
_DOT = (
    "list_sum(list_transform(range({d}), "
    "i -> CAST({a}[i+1] AS DOUBLE) * CAST({b}[i+1] AS DOUBLE)))"
)
_NORM = (
    "sqrt(list_sum(list_transform(range({d}), "
    "i -> CAST({a}[i+1] AS DOUBLE) * CAST({a}[i+1] AS DOUBLE))))"
)


@register(
    "similarity_topk_cosine",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
               WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id,
             e.vec_id AS neighbor_id,
             {_DOT.format(d=64, a='q.qv', b='e.embedding')}
               / ({_NORM.format(d=64, a='q.qv')}
                  * {_NORM.format(d=64, a='e.embedding')}) AS cos_sim
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, round(cos_sim, 6) AS cos_sim, rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored
    )
    WHERE rank <= 10
    ORDER BY query_id, rank
    """,
    tags=("similarity", "north-star", "topk"),
)
def similarity_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for 5 query vectors: broadcast queries
    x single corpus pass, JVM-side zip_with/aggregate dot products,
    per-query row_number top-k.  The exact baseline the ANN path is
    measured against."""
    emb = parallelize_small(load(spark, sf_dir, "embeddings"))
    queries = emb.where(F.col("vec_id") < 5)
    return SIM.brute_force_topk(emb, queries, k=10).orderBy("query_id", "rank")


@register(
    "similarity_lsh_ann",
    oracle=None,  # approximate by design; recall vs brute force checked in tests.
    tags=("similarity", "north-star", "lsh", "ann"),
)
def similarity_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH approximate top-10 for the same 5 queries (8 bands x 4
    hyperplanes, deterministic seed): bucket-join candidates, exact
    cosine re-rank.  The scale path -- candidate volume is a tunable
    fraction of the corpus instead of all of it.  Queries are a subset
    of the corpus, so ``query_filter`` computes the banded index ONCE
    (cached) and probes it, instead of re-hashing both inputs."""
    emb = parallelize_small(load(spark, sf_dir, "embeddings"))
    return SIM.lsh_topk(
        emb, k=10, query_filter=F.col("vec_id") < 5
    ).orderBy("query_id", "rank")


@register(
    "similarity_label_centroids",
    oracle=f"""
    WITH sums AS (
      SELECT label,
             count(*) AS n_vectors,
             round(avg({_NORM.format(d=64, a='embedding')}), 6) AS avg_norm
      FROM embeddings
      GROUP BY label
    )
    SELECT label, n_vectors, avg_norm FROM sums ORDER BY label
    """,
    tags=("similarity", "aggregation"),
)
def similarity_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding statistics (count + mean L2 norm): the
    grouped-aggregation shape of centroid computation (full centroids
    = per-dimension avg; norms keep the oracle compact)."""
    emb = parallelize_small(load(spark, sf_dir, "embeddings"))
    return (
        emb.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg(SIM.l2_norm(F.col("embedding"))), 6).alias("avg_norm"),
        )
        .select(F.col("label").cast("int").alias("label"), "n_vectors", "avg_norm")
        .orderBy("label")
    )


@register(
    "similarity_ivf_ann",
    oracle=None,  # approximate by design; recall vs brute force checked in tests.
    tags=("similarity", "north-star", "ivf", "ann"),
)
def similarity_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat approximate top-10 for the same 5 queries: 16 inverted
    cells, 4 probed per query -- the cluster-pruned alternative to the
    SRP-LSH path (candidates ~ n_probe/n_cells of the corpus)."""
    emb = parallelize_small(load(spark, sf_dir, "embeddings"))
    queries = emb.where(F.col("vec_id") < 5)
    return SIM.ivf_topk(emb, queries, k=10).orderBy("query_id", "rank")
