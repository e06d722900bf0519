"""Persisted inverted text index: build the posting lists once, serve
BM25 queries from disk -- the full-text twin of the persisted ANN
index (``operators/ann_index.py``), completing the build-once/
probe-many story for the retrieval family.

The ad-hoc ``text.bm25_rank`` re-scans the corpus per query batch
(right for one-shot jobs: scan-side tf columns, no index).  A search
service over 100 TB instead pays the posting-list build ONCE and
serves every query from term-pruned postings reads.

On-disk layout (plain parquet under one root):

    <root>/postings/  (term, id, tf)   -- repartitioned by term and
                      sorted within partitions, so parquet row-group
                      min/max statistics prune non-matching terms at
                      scan time (the poor man's term dictionary)
    <root>/doclens/   (id, dl)         -- document lengths for the
                      BM25 length normalization
    <root>/stats/     one row: (n_docs, avgdl) corpus constants

Query cost: a pushdown-pruned postings scan for the query terms
(|terms| tiny), a bounded per-term document-frequency collect
(<= |terms| rows -- the bounded sketch-to-driver pattern), a pivot of
the matched postings to per-term tf columns, one join with doclens on
the doc id, and a TakeOrderedAndProject top-k.  Nothing corpus-scale
happens at query time.

Score parity: the score expression reproduces ``text.bm25_rank``'s
term-order summation exactly (same Robertson/Sparck-Jones +1-smoothed
idf, same operand order), so probing the index is result-identical to
the ad-hoc scan (pytest) and the catalog's index-backed query shares
the ad-hoc query's DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ann_index import _write_small
from .text import token_count, tokens


def _sub(path: str, name: str) -> str:
    return os.path.join(path, name)


def build_text_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Materialize posting lists, document lengths, and corpus stats
    for ``docs`` at ``path``.  One token explode + one (term, doc)
    hash agg -- the single corpus-scale pass."""
    spark = docs.sparkSession
    tok = docs.select(F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("term"))
    postings = (
        tok.groupBy("term", "id")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .repartition("term")
        .sortWithinPartitions("term")
    )
    postings.write.mode("overwrite").parquet(_sub(path, "postings"))
    doclens = docs.select(
        F.col(id_col).alias("id"), token_count(F.col(text_col)).alias("dl")
    )
    doclens.write.mode("overwrite").parquet(_sub(path, "doclens"))
    n_docs, avgdl = doclens.agg(
        F.count(F.lit(1)).cast("double"), F.avg("dl")
    ).collect()[0]
    _write_small(
        spark,
        [(float(n_docs), float(avgdl))],
        "n_docs double, avgdl double",
        _sub(path, "stats"),
    )


def query_text_index(
    spark: SparkSession,
    path: str,
    query_terms: tuple[str, ...],
    k: int = 15,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-``k`` from a persisted index: term-pruned postings
    scan, per-term df (bounded collect), pivot to tf columns in term
    order, length-normalized score identical to ``text.bm25_rank``.
    Returns (doc_id, bm25), descending, doc-id tiebreak."""
    stats = spark.read.parquet(_sub(path, "stats")).collect()[0]
    n, avgdl = float(stats["n_docs"]), float(stats["avgdl"])

    postings = spark.read.parquet(_sub(path, "postings")).where(
        F.col("term").isin(*query_terms)
    )
    # Per-term document frequency: <= |query_terms| rows to the driver
    # (each (term, id) posting is one matching doc).
    df_rows = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df")).collect()
    dfs = {r["term"]: float(r["df"]) for r in df_rows}

    # Pivot matched postings to per-term tf columns (term order fixed
    # by query_terms so the score summation order matches the ad-hoc
    # scan exactly).
    per_doc = postings.groupBy("id").agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("term") == t, F.col("tf"))), F.lit(0)
            ).alias(f"__tf_{i}")
            for i, t in enumerate(query_terms)
        ]
    )
    doclens = spark.read.parquet(_sub(path, "doclens"))
    scored = per_doc.join(doclens, "id")
    score = F.lit(0.0)
    for i, t in enumerate(query_terms):
        df_t = dfs.get(t, 0.0)
        tf = F.col(f"__tf_{i}").cast("double")
        idf = F.log(1.0 + (F.lit(n) - F.lit(df_t) + 0.5) / (F.lit(df_t) + 0.5))
        score = score + idf * (
            tf
            * (k1 + 1.0)
            / (tf + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl)))
        )
    return (
        scored.select(F.col("id").alias("doc_id"), F.round(score, 6).alias("bm25"))
        .where(F.col("bm25") > 0)
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(k)
    )
