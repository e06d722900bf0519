"""Persisted inverted text index: build the posting lists once, serve
BM25 queries from disk -- the full-text twin of the persisted ANN
index (``operators/ann_index.py``), completing the build-once/
probe-many story for the retrieval family.

The ad-hoc ``text.bm25_rank`` re-scans the corpus per query batch
(right for one-shot jobs: scan-side tf columns, no index).  A search
service over 100 TB instead pays the posting-list build ONCE and
serves every query from term-pruned postings reads.

On-disk layout (plain parquet under one root):

    <root>/postings/  (term, id, tf)   -- RANGE-partitioned on
                      (term, id) and sorted within partitions, so
                      parquet row-group min/max statistics prune
                      non-matching terms at scan time (the poor man's
                      term dictionary) while a Zipf-head term whose
                      posting list exceeds one partition's share is
                      SPLIT across partitions by the id sub-key
                      instead of landing on a single straggler task
                      (hash-partitioning by term alone puts a
                      df ~ n_docs stopword's entire list in one task
                      -- an OOM hot spot at corpus scale)
    <root>/doclens/   (id, dl)         -- document lengths for the
                      BM25 length normalization
    <root>/stats/     one row: (n_docs, avgdl) corpus constants
    <root>/stopterms/ (term, df)       -- terms dropped by the
                      optional corpus-relative df cap (empty when the
                      cap is off)

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

Stop-term policy (off by default -- exact parity): pass ``max_df`` /
``max_df_frac`` to drop terms whose document frequency exceeds
``max(max_df, ceil(max_df_frac * n_docs))`` from the postings -- the
corpus-relative cap the dedup family applies to shingles
(``dedup.effective_max_shingle_df``).  A df ~ n_docs term has BM25
idf ~ log(1 + 0.5/df) ~ 0, so dropping it barely moves scores while
removing the largest posting lists from both build shuffle and probe
scans; dropped terms are recorded in ``stopterms/`` and contribute
zero at query time (documented approximation, the classic stopword
contract).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ann_index import (
    _absorbed_batches,
    _fold_tree,
    _folded_ids,
    _heal_swap_for_read,
    _read_small,
    _recover_swap,
    _run_overlapped,
    _swap_dir,
    _write_absorb_manifest,
    _write_small,
)
from .text import token_count, tokens


def _sub(path: str, name: str) -> str:
    return os.path.join(path, name)


#: Marker file ``optimize_text_index`` holds while absorbing stream
#: segments into the main tables.  A crash inside the absorb window
#: leaves absorbed rows in the main tables AND in the segment trees;
#: while the marker exists, ``_read_with_segments`` dedups the union
#: (full-row distinct -- absorbed rows are exact copies of segment
#: rows), so probes stay correct in the half-absorbed state instead
#: of silently double-counting tf/df until the optimize is re-run.
_ABSORB_MARKER = "_absorbing"


def _read_with_segments(spark: SparkSession, path: str, name: str) -> DataFrame:
    """A built table unioned with its streaming segment tree
    (``<name>_stream/batch=<id>/``) when one exists -- how probes see
    stream-ingested documents without a rebuild (the exact
    ``ann_index._read_with_segments`` contract; tombstone filtering
    stays at the call sites, applied to the union).  If a crashed
    absorb left its ``_absorbing`` marker behind, the union is
    full-row-deduped (see ``_ABSORB_MARKER``) -- the healthy path
    pays nothing.  Probes self-heal a crashed swap first
    (``ann_index._heal_swap_for_read``), instead of failing on the
    missing table until the next maintenance run."""
    _heal_swap_for_read(path, name)
    _heal_swap_for_read(path, f"{name}_stream")
    main = spark.read.parquet(_sub(path, name))
    seg_dir = _sub(path, f"{name}_stream")
    if os.path.exists(seg_dir):
        seg = spark.read.option("basePath", seg_dir).parquet(seg_dir)
        # Ids folded into batch=-1 (tree sidecar) or absorbed into the
        # main tables (manifest) are replays when their directory
        # reappears -- excluded, the ann_index contract.
        gone = set(_absorbed_batches(path).get(f"{name}_stream", []))
        gone |= set(_folded_ids(seg_dir))
        if gone:
            seg = seg.where(~F.col("batch").isin(sorted(gone)))
        main = main.unionByName(seg.select(*main.columns))
        if os.path.exists(_sub(path, _ABSORB_MARKER)):
            main = main.distinct()
    return main


def _has_segments(path: str) -> bool:
    return os.path.exists(_sub(path, "doclens_stream")) or os.path.exists(
        _sub(path, "postings_stream")
    )


def build_text_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
    max_df_frac: float | None = None,
    n_partitions: int | None = None,
) -> None:
    """Materialize posting lists, document lengths, corpus stats, and
    the (possibly empty) stop-term table for ``docs`` at ``path``.
    One token explode + one (term, doc) hash agg -- the single
    corpus-scale pass; the optional df cap adds one term-keyed agg
    over the postings (already term-local, map-side combined)."""
    spark = docs.sparkSession

    doclens = docs.select(
        F.col(id_col).alias("id"), token_count(F.col(text_col)).alias("dl")
    )

    def _doclens_branch() -> None:
        doclens.write.mode("overwrite").parquet(_sub(path, "doclens"))
        # N/avgdl aggregate off the WRITTEN doclens table (two narrow
        # columns) instead of re-running the corpus tokenize pass a
        # second time (guide §2.3: don't recompute what a cheaper
        # proxy already holds).
        n_docs, avgdl = (
            spark.read.parquet(_sub(path, "doclens"))
            .agg(F.count(F.lit(1)).cast("double"), F.avg("dl"))
            .collect()[0]
        )
        # The stop-term POLICY is persisted alongside the corpus stats
        # so ``optimize_text_index`` can re-evaluate the cap against
        # the grown corpus without the caller re-supplying it.
        _write_small(
            spark,
            [
                (
                    float(n_docs),
                    float(avgdl),
                    None if max_df is None else float(max_df),
                    None if max_df_frac is None else float(max_df_frac),
                )
            ],
            "n_docs double, avgdl double, max_df double, max_df_frac double",
            _sub(path, "stats"),
        )

    tok = docs.select(F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("term"))
    postings = tok.groupBy("term", "id").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )

    def _write_postings(postings: DataFrame) -> None:
        # Range partitioning on (term, id): keeps term locality for
        # row-group min/max pruning while the id sub-key splits a heavy
        # term across range boundaries.  With ``n_partitions=None`` AQE
        # sizes the shuffle to its advisory byte target, so at corpus
        # scale a df ~ n_docs term spans ceil(list_bytes / advisory)
        # partitions instead of one straggler; pass an explicit count to
        # pin the layout (tests, file-count contracts).  The range
        # partitioner's boundary-sampling job costs a fixed extra ~0.6 s
        # at sf0.1 (bench-measured; checkpointing the postings first does
        # NOT recoup it) -- the deliberate price of the Zipf-skew safety,
        # amortized to noise at corpus scale where the shuffle dominates.
        ranged = (
            postings.repartitionByRange(n_partitions, "term", "id")
            if n_partitions
            else postings.repartitionByRange("term", "id")
        )
        ranged.sortWithinPartitions("term", "id").write.mode("overwrite").parquet(
            _sub(path, "postings")
        )

    if max_df is not None or max_df_frac is not None:
        # The df cap derives from n_docs, so the doclens/stats branch
        # must complete first -- sequential by data dependency.
        _doclens_branch()
        stats = _read_small(spark, _sub(path, "stats"))[0]
        cap = max(max_df or 0, math.ceil((max_df_frac or 0.0) * stats["n_docs"]))
        # Stop-term list: tiny by construction (only the Zipf head
        # exceeds a corpus-relative cap), so the anti-join broadcasts.
        stop = (
            postings.groupBy("term")
            .agg(F.count(F.lit(1)).cast("long").alias("df"))
            .where(F.col("df") > cap)
        )
        stop.write.mode("overwrite").parquet(_sub(path, "stopterms"))
        stop_terms = spark.read.parquet(_sub(path, "stopterms")).select("term")
        _write_postings(
            postings.join(F.broadcast(stop_terms), "term", "left_anti")
        )
    else:
        # No cap: the doclens/stats branch and the postings pass are
        # independent -- overlapped so the two corpus passes share the
        # executor pool instead of running back to back (guide §2.6).
        _write_small(spark, [], "term string, df long", _sub(path, "stopterms"))
        _run_overlapped(_doclens_branch, lambda: _write_postings(postings))


def query_text_index(
    spark: SparkSession,
    path: str,
    query_terms: tuple[str, ...],
    k: int = 15,
    k1: float = 1.2,
    b: float = 0.75,
    allowed: DataFrame | None = None,
) -> DataFrame:
    """BM25 top-``k`` from a persisted index: term-pruned postings
    scan, per-term df (bounded collect), pivot to tf columns in term
    order, length-normalized score identical to ``text.bm25_rank``.
    Query terms in the index's stop-term table contribute zero (their
    postings were dropped at build time).  Returns (doc_id, bm25),
    descending, doc-id tiebreak.

    ``allowed`` (optional, 1 column named ``doc_id``): metadata-filtered
    retrieval -- the scored doc set is LEFT SEMI joined on the
    allow-list before ranking, while df / N / avgdl stay
    CORPUS-GLOBAL (the Lucene filtered-query convention: a filter
    narrows the result set, it does not re-weight term rarity), so a
    doc's score is identical filtered and unfiltered."""
    qset = set(query_terms)
    stopped = {
        r["term"]
        for r in _read_small(spark, _sub(path, "stopterms"))
        if r["term"] in qset
    }
    active_terms = tuple(t for t in query_terms if t not in stopped)
    if not active_terms:
        return spark.createDataFrame([], "doc_id long, bm25 double")

    postings = _read_with_segments(spark, path, "postings").where(
        F.col("term").isin(*active_terms)
    )
    doclens = _read_with_segments(spark, path, "doclens")
    # Tombstoned docs vanish from postings AND doclens immediately --
    # and because df is computed live from the (filtered) postings,
    # idf is takedown-correct at once; only the 1-row N/avgdl stats
    # stay stale until apply_text_deletes (a bounded, documented skew:
    # both are corpus-scale denominators, not per-doc state).
    tomb_dir = _sub(path, "tombstones")
    if os.path.exists(tomb_dir):
        tombs = spark.read.parquet(tomb_dir).select("id").distinct()
        postings = postings.join(tombs, "id", "left_anti")
        doclens = doclens.join(tombs, "id", "left_anti")
    if _has_segments(path):
        # Stream segments exist: the persisted 1-row stats can't see
        # them, so N/avgdl derive LIVE from the (tombstone-filtered)
        # doclens union -- one doc-count-sized aggregate, and as a
        # side effect takedown-correct immediately.  The no-segment
        # path keeps the persisted stats row (zero extra pass, the
        # bench-measured probe cost).
        agg = doclens.agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.avg("dl").alias("avgdl"),
        ).collect()[0]
        n, avgdl = float(agg["n"]), float(agg["avgdl"] or 0.0)
    else:
        stats = _read_small(spark, _sub(path, "stats"))[0]
        n, avgdl = float(stats["n_docs"]), float(stats["avgdl"])
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
            for i, t in enumerate(active_terms)
        ]
    )
    if allowed is not None:
        per_doc = per_doc.join(
            allowed.select(F.col("doc_id").alias("id")), "id", "left_semi"
        )
    scored = per_doc.join(doclens, "id")
    score = F.lit(0.0)
    for i, t in enumerate(active_terms):
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


def query_text_index_batch(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    query_id_col: str = "query_id",
    term_col: str = "term",
    allowed: DataFrame | None = None,
) -> DataFrame:
    """BM25 top-``k`` for a whole BATCH of queries from the persisted
    index in ONE distributed plan -- the amortized serving shape
    (round-13 verdict item 6): per-probe latency at small batch sizes
    is dominated by Spark job-launch overhead, so a store that batches
    its request stream pushes N queries through one postings scan and
    pays ~1/N of the per-call cost.

    ``queries`` is the exploded (``query_id_col``, ``term_col``) term
    BAG -- a term listed twice for a query contributes twice, matching
    the ad-hoc ``text.bm25_rank`` tuple semantics.  Unlike the
    single-query probe, NOTHING is collected to the driver: per-term
    document frequencies are a distributed aggregate over the pruned
    postings and join back broadcast, so the plan works unchanged when
    a batch carries 10k distinct terms.

    Scoring matches ``query_text_index`` value-for-value (same
    +1-smoothed idf, same length normalization, same live-stats rule
    under stream segments, same tombstone semantics); only the
    summation ORDER differs (SUM aggregation vs fixed term-order
    fold), which is below the shared round-6 contract for the tiny
    per-(query, doc) addend counts involved.  Returns (query_id,
    doc_id, bm25, rank), rank <= k, score-descending with doc-id
    tiebreak.

    ``allowed`` (optional, 1 column named ``doc_id``): metadata-
    filtered retrieval for the WHOLE batch -- the matched postings are
    LEFT SEMI joined on the allow-list before scoring, while df / N /
    avgdl stay corpus-global (the ``query_text_index`` Lucene
    filtered-query convention: a filter narrows the result set, it
    does not re-weight term rarity), so a doc's score is identical
    filtered and unfiltered.
    """
    from pyspark.sql import Window

    qterms = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(term_col).alias("term"),
        )
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("q_weight"))
    )
    # Term-pruned postings: LEFT SEMI on the batch's distinct terms
    # (broadcast -- |terms| tiny next to postings), so row-group
    # min/max statistics still prune the scan like the single-query
    # isin() path.
    terms = qterms.select("term").distinct()
    postings = _read_with_segments(spark, path, "postings").join(
        F.broadcast(terms), "term", "left_semi"
    )
    doclens = _read_with_segments(spark, path, "doclens")
    tomb_dir = _sub(path, "tombstones")
    if os.path.exists(tomb_dir):
        tombs = spark.read.parquet(tomb_dir).select("id").distinct()
        postings = postings.join(tombs, "id", "left_anti")
        doclens = doclens.join(tombs, "id", "left_anti")
    if _has_segments(path):
        agg = doclens.agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.avg("dl").alias("avgdl"),
        ).collect()[0]
        n, avgdl = float(agg["n"]), float(agg["avgdl"] or 0.0)
    else:
        stats = _read_small(spark, _sub(path, "stats"))[0]
        n, avgdl = float(stats["n_docs"]), float(stats["avgdl"])
    # Distributed df (vs the single-query bounded collect): one count
    # per matched term, joined back broadcast.  Computed BEFORE the
    # allow-list narrows the scored set -- term rarity stays
    # corpus-global under filtering.
    dfs = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    if allowed is not None:
        postings = postings.join(
            allowed.select(F.col("doc_id").alias("id")), "id", "left_semi"
        )
    tf = F.col("tf").cast("double")
    idf = F.log(1.0 + (F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    contrib = (
        F.col("q_weight")
        * idf
        * (
            tf
            * (k1 + 1.0)
            / (tf + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl)))
        )
    )
    scored = (
        postings.join(F.broadcast(dfs), "term")
        .join(F.broadcast(qterms), "term")
        .join(doclens, "id")
        .groupBy("query_id", "id")
        .agg(F.round(F.sum(contrib), 6).alias("bm25"))
        .where(F.col("bm25") > 0)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("bm25"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("id").alias("doc_id"), "bm25", "rank")
    )


def query_text_index_prf(
    spark: SparkSession,
    path: str,
    query_terms: tuple[str, ...],
    *,
    fb_k: int = 5,
    n_expand: int = 5,
    alpha: float = 0.5,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    allowed: DataFrame | None = None,
) -> DataFrame:
    """BM25 + RM3 pseudo-relevance feedback served entirely from the
    PERSISTED index -- the production shape of
    ``text.bm25_prf_rank``, where no stage re-tokenizes the corpus:

    1. stage 1 is ``query_text_index`` (term-pruned postings probe)
       for the top-``fb_k`` pseudo-relevant docs;
    2. the relevance model P(w|R) = sum_d w_d * tf(w,d)/|d| reads the
       feedback docs' postings rows (an fb_k-id semi-join -- postings
       ARE the tokenization, so tf and dl come straight off the
       index);
    3. the interpolated (<= len(query_terms) + n_expand)-term query
       model is assembled DRIVER-side (every table it derives from is
       fb_k- or n_expand-bounded by construction) and re-scores via
       one more term-pruned postings scan + doclens join.

    Result-identical to the ad-hoc ``bm25_prf_rank`` on the same
    corpus when no stop-term cap dropped a model term's postings
    (asserted in pytest), with the same rounding discipline: P(w|R)
    and model weights round to 9 decimals before selection, the final
    score to 6.  Index-resident cost: two postings probes + one
    fb_k-row posting pull -- no corpus-wide token explode anywhere.

    ``allowed`` (optional, 1 column named ``doc_id``): metadata-
    filtered retrieval, the ``query_text_index`` family contract --
    stage 1 ranks feedback docs from the FILTERED corpus (pseudo-
    relevance must come from docs the caller may see) and the re-score
    is LEFT SEMI joined on the allow-list, while df / N / avgdl stay
    corpus-global (Lucene filtered-query convention: a filter narrows
    the result set, it does not re-weight term rarity).
    """
    if not query_terms:
        raise ValueError("query_text_index_prf needs at least one query term")
    if len(set(query_terms)) != len(query_terms):
        raise ValueError(
            "query_text_index_prf: query_terms contains duplicates -- "
            "each term must appear once"
        )
    if not 0.0 <= alpha <= 1.0:
        raise ValueError("alpha must be in [0, 1] (1 = no expansion)")
    if fb_k < 1 or n_expand < 1:
        raise ValueError("fb_k and n_expand must be >= 1")

    fb_rows = sorted(
        query_text_index(
            spark, path, query_terms, k=fb_k, k1=k1, b=b, allowed=allowed
        ).collect(),
        key=lambda r: r["doc_id"],
    )
    id_type = (
        spark.read.parquet(_sub(path, "doclens")).schema["id"].dataType.simpleString()
    )
    if not fb_rows:
        # No term matched anything: same empty result plain BM25 returns.
        return spark.createDataFrame([], f"doc_id {id_type}, prf_score double")
    fb = spark.createDataFrame(
        [(r["doc_id"], float(r["bm25"])) for r in fb_rows],
        f"id {id_type}, bm25 double",
    )
    ws = sum(float(r["bm25"]) for r in fb_rows)

    postings = _read_with_segments(spark, path, "postings")
    doclens = _read_with_segments(spark, path, "doclens")
    tomb_dir = _sub(path, "tombstones")
    if os.path.exists(tomb_dir):
        tombs = spark.read.parquet(tomb_dir).select("id").distinct()
        postings = postings.join(tombs, "id", "left_anti")
        doclens = doclens.join(tombs, "id", "left_anti")

    # Relevance model over the feedback docs' postings: tf/dl ride the
    # index (postings carry tf; doclens carries |d|), both pruned to
    # the fb_k ids by broadcast semi-joins before anything explodes.
    fb_post = (
        postings.join(F.broadcast(fb), "id")
        .join(F.broadcast(doclens.join(F.broadcast(fb.select("id")), "id", "left_semi")), "id")
        .select("term", (F.col("bm25") * F.col("tf") / F.col("dl")).alias("c"))
    )
    pr = fb_post.groupBy("term").agg(
        F.round(F.sum("c") / F.lit(ws), 9).alias("p_rm")
    )
    expansion = sorted(
        pr.where(~F.col("term").isin(*query_terms))
        .orderBy(F.desc("p_rm"), F.asc("term"))
        .limit(n_expand)
        .collect(),
        key=lambda r: r["term"],
    )
    z = sum(float(r["p_rm"]) for r in expansion)
    model = [(t, float(alpha) / len(query_terms)) for t in query_terms]
    if z > 0:
        # Degenerate feedback (no non-query vocabulary) degrades to the
        # alpha-weighted original query, same as the ad-hoc operator.
        model += [
            (r["term"], round((1.0 - alpha) * float(r["p_rm"]) / z, 9))
            for r in expansion
        ]
    qmodel = spark.createDataFrame(model, "term string, w double")
    model_terms = [t for t, _ in model]

    # Re-score: one term-pruned postings scan.  Per-term df and the
    # corpus stats are the query_text_index conventions (df live from
    # the filtered postings; N/avgdl persisted unless stream segments
    # exist).
    tf2 = postings.where(F.col("term").isin(*model_terms))
    df_rows = tf2.groupBy("term").agg(F.count(F.lit(1)).alias("df")).collect()
    dfs = {r["term"]: float(r["df"]) for r in df_rows}
    if allowed is not None:
        # After df: term rarity stays corpus-global under filtering.
        tf2 = tf2.join(
            allowed.select(F.col("doc_id").alias("id")), "id", "left_semi"
        )
    if _has_segments(path):
        agg = doclens.agg(
            F.count(F.lit(1)).cast("double").alias("n"), F.avg("dl").alias("avgdl")
        ).collect()[0]
        n, avgdl = float(agg["n"]), float(agg["avgdl"] or 0.0)
    else:
        stats = _read_small(spark, _sub(path, "stats"))[0]
        n, avgdl = float(stats["n_docs"]), float(stats["avgdl"])
    df_tbl = spark.createDataFrame(
        [(t, dfs.get(t, 0.0)) for t in model_terms], "term string, df double"
    )
    idf = F.log(1.0 + (F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tf = F.col("tf").cast("double")
    sat = (
        tf * (k1 + 1.0)
        / (tf + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl)))
    )
    scored = (
        tf2.join(F.broadcast(qmodel), "term")
        .join(F.broadcast(df_tbl), "term")
        .join(doclens, "id")
        .select("id", (F.col("w") * idf * sat).alias("s"))
        .groupBy("id")
        .agg(F.round(F.sum("s"), 6).alias("prf_score"))
    )
    return (
        scored.select(F.col("id").alias("doc_id"), "prf_score")
        .where(F.col("prf_score") > 0)
        .orderBy(F.desc("prf_score"), F.asc("doc_id"))
        .limit(k)
    )


def query_text_index_prf_batch(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    *,
    fb_k: int = 5,
    n_expand: int = 5,
    alpha: float = 0.5,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    query_id_col: str = "query_id",
    term_col: str = "term",
    allowed: DataFrame | None = None,
) -> DataFrame:
    """BM25 + RM3 pseudo-relevance feedback for a BATCH of queries,
    entirely from the persisted index, with NOTHING per-query on the
    driver -- the fully distributed form of ``query_text_index_prf``
    (whose relevance model and query model are assembled driver-side,
    fine for one query, a serialization point for a request stream):

    1. stage 1 is ``query_text_index_batch`` at ``k=fb_k`` -- one
       term-pruned postings scan ranks every query's pseudo-relevant
       docs;
    2. the per-query relevance model P(w|R_q) = sum_d w_d tf(w,d)/|d|
       is a (query_id, term) aggregate over the feedback docs'
       postings rows (an fb-doc-bounded id join -- postings ARE the
       tokenization);
    3. per-query expansion terms are one partitioned window (original
       terms excluded per query by an anti-join), the interpolated
       query model is a union of two weight tables, and the re-score
       is a second term-pruned postings scan + doclens join with
       per-query top-k as one more window.

    ``queries`` is exploded (``query_id_col``, ``term_col``); duplicate
    terms within a query are collapsed (RM3 spreads alpha over UNIQUE
    originals -- the single-query API rejects duplicates outright; the
    batch form cannot raise row-locally, so it normalizes).  A query
    whose terms match nothing ranks no feedback docs, builds no model,
    and returns no rows -- the single-query degenerate contract.
    Queries whose expansion pool is empty (feedback docs contain only
    query terms) degrade to the alpha-weighted original query.

    Same rounding discipline as the single-query probe (P(w|R) and
    expansion weights round to 9 before selection/arithmetic, final
    scores to 6; every cross-engine sum is fb_k- / n_expand- /
    model-size-bounded), so a DuckDB oracle replays the whole batch.
    Returns (query_id, doc_id, prf_score, rank), rank <= k.

    ``allowed`` (optional, 1 column named ``doc_id``): metadata-
    filtered retrieval for the whole batch, the family contract --
    stage 1 ranks feedback docs from the FILTERED corpus (via
    ``query_text_index_batch``'s own allow-list) and the re-score
    postings are LEFT SEMI joined on the allow-list AFTER df is
    aggregated, keeping df / N / avgdl corpus-global (a filter narrows
    the result set, it does not re-weight term rarity).  Per-query
    results match ``query_text_index_prf`` under the same allow-list
    (pytest).
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError("alpha must be in [0, 1] (1 = no expansion)")
    if fb_k < 1 or n_expand < 1:
        raise ValueError("fb_k and n_expand must be >= 1")
    from pyspark.sql import Window

    qterms = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(term_col).alias("term"),
        )
        .distinct()
    )
    # Stage 1 feeds two consumers (the weight normalizer and the
    # feedback postings pull); checkpoint so the ranking plan runs
    # once (<= fb_k rows per query -- bounded).
    fb = query_text_index_batch(
        spark, path, qterms, k=fb_k, k1=k1, b=b, allowed=allowed
    ).localCheckpoint(eager=False)
    ws = fb.groupBy("query_id").agg(F.sum("bm25").alias("ws"))

    postings = _read_with_segments(spark, path, "postings")
    doclens = _read_with_segments(spark, path, "doclens")
    tomb_dir = _sub(path, "tombstones")
    if os.path.exists(tomb_dir):
        tombs = spark.read.parquet(tomb_dir).select("id").distinct()
        postings = postings.join(tombs, "id", "left_anti")
        doclens = doclens.join(tombs, "id", "left_anti")

    fb_ids = fb.select("query_id", F.col("doc_id").alias("id"), "bm25")
    fb_post = (
        postings.join(F.broadcast(fb_ids), "id")
        .join(doclens, "id")
        .select(
            "query_id", "term",
            (F.col("bm25") * F.col("tf") / F.col("dl")).alias("c"),
        )
    )
    pr = (
        fb_post.groupBy("query_id", "term")
        .agg(F.sum("c").alias("num"))
        .join(ws, "query_id")
        .select(
            "query_id", "term",
            F.round(F.col("num") / F.col("ws"), 9).alias("p_rm"),
        )
    )
    w_exp = Window.partitionBy("query_id").orderBy(
        F.desc("p_rm"), F.asc("term")
    )
    expansion = (
        pr.join(qterms, ["query_id", "term"], "left_anti")
        .withColumn("__rn", F.row_number().over(w_exp))
        .where(F.col("__rn") <= n_expand)
        .drop("__rn")
        .localCheckpoint(eager=False)
    )
    z = expansion.groupBy("query_id").agg(F.sum("p_rm").alias("z"))
    exp_w = (
        expansion.join(z, "query_id")
        .where(F.col("z") > 0)
        .select(
            "query_id", "term",
            F.round(
                F.lit(1.0 - alpha) * F.col("p_rm") / F.col("z"), 9
            ).alias("w"),
        )
    )
    qsize = qterms.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("double").alias("nq")
    )
    orig_w = qterms.join(qsize, "query_id").select(
        "query_id", "term", (F.lit(float(alpha)) / F.col("nq")).alias("w")
    )
    qmodel = orig_w.unionByName(exp_w)

    model_terms = qmodel.select("term").distinct()
    tf2 = postings.join(F.broadcast(model_terms), "term", "left_semi")
    dfs = tf2.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    if allowed is not None:
        # After df: term rarity stays corpus-global under filtering.
        tf2 = tf2.join(
            allowed.select(F.col("doc_id").alias("id")), "id", "left_semi"
        )
    if _has_segments(path):
        agg = doclens.agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.avg("dl").alias("avgdl"),
        ).collect()[0]
        n, avgdl = float(agg["n"]), float(agg["avgdl"] or 0.0)
    else:
        stats = _read_small(spark, _sub(path, "stats"))[0]
        n, avgdl = float(stats["n_docs"]), float(stats["avgdl"])
    idf = F.log(1.0 + (F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tf = F.col("tf").cast("double")
    sat = (
        tf * (k1 + 1.0)
        / (tf + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl)))
    )
    scored = (
        tf2.join(F.broadcast(dfs), "term")
        .join(F.broadcast(qmodel), "term")
        .join(doclens, "id")
        .groupBy("query_id", "id")
        .agg(F.round(F.sum(F.col("w") * idf * sat), 6).alias("prf_score"))
        .where(F.col("prf_score") > 0)
    )
    w_k = Window.partitionBy("query_id").orderBy(
        F.desc("prf_score"), F.asc("id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_k).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("id").alias("doc_id"), "prf_score", "rank")
    )


def append_text_index(
    new_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_partitions: int | None = None,
) -> None:
    """Incrementally index new documents: tokenize ONLY the new rows,
    append their postings (range-partitioned among themselves) and
    document lengths, and refresh the 1-row corpus stats from the
    merged doclens -- the daily-ingest maintenance path; no rebuild,
    cost is one pass over the NEW docs plus a doclens-sized scan for
    the stats.  Probing the appended index is result-identical to
    rebuilding over the union corpus (pytest).

    Caller contract: ids must be disjoint from ids already indexed
    (append never dedups).  The stop-term cap is NOT re-evaluated:
    postings for already-stopped terms are skipped on the new rows
    (keeping the zero-contribution contract), but terms that only
    BECOME stopword-grade after many appends keep their postings
    until ``optimize_text_index`` re-prunes them -- df drift is slow
    and the cap is a cost guard, not a correctness gate."""
    spark = new_docs.sparkSession

    doclens = new_docs.select(
        F.col(id_col).alias("id"), token_count(F.col(text_col)).alias("dl")
    )
    doclens.write.mode("append").parquet(_sub(path, "doclens"))
    merged = spark.read.parquet(_sub(path, "doclens"))
    n_docs, avgdl = merged.agg(
        F.count(F.lit(1)).cast("double"), F.avg("dl")
    ).collect()[0]
    old_stats = _read_small(spark, _sub(path, "stats"))[0]
    _write_small(
        spark,
        [
            (
                float(n_docs),
                float(avgdl),
                old_stats["max_df"],  # carry the stop-term policy through
                old_stats["max_df_frac"],
            )
        ],
        "n_docs double, avgdl double, max_df double, max_df_frac double",
        _sub(path, "stats"),
    )

    tok = new_docs.select(
        F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("term")
    )
    postings = tok.groupBy("term", "id").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    stop_terms = spark.read.parquet(_sub(path, "stopterms")).select("term")
    postings = postings.join(F.broadcast(stop_terms), "term", "left_anti")
    ranged = (
        postings.repartitionByRange(n_partitions, "term", "id")
        if n_partitions
        else postings.repartitionByRange("term", "id")
    )
    ranged.sortWithinPartitions("term", "id").write.mode("append").parquet(
        _sub(path, "postings")
    )


def optimize_text_index(
    spark: SparkSession,
    path: str,
    max_df: int | None = None,
    max_df_frac: float | None = None,
) -> None:
    """Maintenance re-prune for an append-grown text index (the
    ``optimize_winnowing_index`` twin): terms whose document frequency
    drifted ABOVE the stop cap across appends -- ``append_text_index``
    only skips postings for ALREADY-stopped terms -- are moved to the
    stop-term table and their postings dropped, restoring the
    Zipf-head cost bound (drifting stopword-grade posting lists are
    the known failure mode of long-lived inverted indexes) without
    re-reading any document: one postings df agg, one anti-join, one
    rewrite.  No overflow ledger is needed (unlike winnowing): every
    (term, id) posting row IS one matching document, so the stored
    postings carry the full df.

    The cap re-evaluates the BUILD-time policy (persisted in
    ``stats/``) against the CURRENT corpus size; pass ``max_df`` /
    ``max_df_frac`` to override it.  An index built uncapped with no
    override only absorbs segments.  After the re-prune, probes
    return exactly what a fresh rebuild over the union corpus with
    the same policy returns (pytest).

    Streaming segment trees are ABSORBED (stream stopped): postings
    and doclens unions fold into the main tables (full-row distinct --
    re-running after a crash is the recovery), the N/avgdl stats row
    recomputes from the union (the cap evaluates against the TRUE
    corpus size, and probes regain the zero-extra-pass stats path),
    and the segment trees are removed last.

    Filesystem contract: the postings rewrite swaps directories with
    ``rmtree`` + ``rename`` (local/posix-rename, same as the other
    optimize jobs); single-writer -- do not probe concurrently."""
    import shutil

    # Re-run recovery FIRST -- before the segment check and the eager
    # reads below: a main table caught mid-swap must be restored
    # before spark.read touches it, and a segment tree caught mid-swap
    # must be back in place BEFORE the union decision, or the absorb
    # would record its batch ids as absorbed without ever merging its
    # rows (permanent data loss on replay-exclusion).
    for _name in ("postings", "postings_stream", "doclens_stream"):
        _recover_swap(path, _name)
    stats = _read_small(spark, _sub(path, "stats"))[0]
    segmented = _has_segments(path)
    postings = spark.read.parquet(_sub(path, "postings"))
    doclens = spark.read.parquet(_sub(path, "doclens"))
    if segmented:
        postings = _read_with_segments(spark, path, "postings").distinct()
        doclens = (
            _read_with_segments(spark, path, "doclens")
            .distinct()
            .localCheckpoint(eager=True)
        )
        agg = doclens.agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.avg("dl").alias("avgdl"),
        ).collect()[0]
        n_docs, avgdl = float(agg["n"]), float(agg["avgdl"] or 0.0)
    else:
        n_docs, avgdl = float(stats["n_docs"]), float(stats["avgdl"])
    if max_df is None and max_df_frac is None:
        max_df = None if stats["max_df"] is None else int(stats["max_df"])
        max_df_frac = stats["max_df_frac"]
    capped = max_df is not None or max_df_frac is not None
    if not segmented and os.path.exists(_sub(path, _ABSORB_MARKER)):
        # A crash between segment removal and marker removal in an
        # earlier run leaves the marker orphaned -- and every probe
        # paying the marker's union-distinct forever.  No segments
        # means the absorb finished its rewrites; only this cleanup
        # remained.
        os.remove(_sub(path, _ABSORB_MARKER))
    if not capped and not segmented:
        return  # uncapped, no segments: nothing to do

    if capped:
        cap = max(max_df or 0, math.ceil((max_df_frac or 0.0) * n_docs))
        drifted = (
            postings.groupBy("term")
            .agg(F.count(F.lit(1)).cast("long").alias("df"))
            .where(F.col("df") > cap)
            .localCheckpoint(eager=True)  # materialize before rewrites
        )
    else:
        drifted = None
    if (drifted is None or drifted.isEmpty()) and not segmented:
        return
    if drifted is not None and not drifted.isEmpty():
        merged_stop = (
            spark.read.parquet(_sub(path, "stopterms"))
            .unionByName(drifted)
            .localCheckpoint(eager=True)  # reads the dir overwritten below
        )
        pruned = postings.join(
            F.broadcast(drifted.select("term")), "term", "left_anti"
        )
    else:
        merged_stop = None
        pruned = postings
    pruned = pruned.repartitionByRange("term", "id").sortWithinPartitions(
        "term", "id"
    )
    if segmented:
        # Absorb window opens: from the postings swap below until the
        # segment trees are removed, absorbed rows exist in BOTH the
        # main tables and the segments.  The marker makes probes dedup
        # the union in that window (``_ABSORB_MARKER``); re-running
        # the optimize after a crash remains the full recovery.
        with open(_sub(path, _ABSORB_MARKER), "w") as fh:
            fh.write("absorb in progress; probes dedup segment unions\n")
    tmp = _sub(path, "postings__next")
    pruned.write.mode("overwrite").parquet(tmp)
    _swap_dir(_sub(path, "postings"), tmp)
    if merged_stop is not None:
        merged_stop.write.mode("overwrite").parquet(_sub(path, "stopterms"))
    if segmented:
        doclens.write.mode("overwrite").parquet(_sub(path, "doclens"))
        _write_small(
            spark,
            [(n_docs, avgdl, stats["max_df"], stats["max_df_frac"])],
            "n_docs double, avgdl double, max_df double, max_df_frac double",
            _sub(path, "stats"),
        )
        # Absorb manifest (the shared ann_index writer): a batch
        # replayed after the absorb recreates its directory but never
        # double-counts tf/df against the merged postings.
        _write_absorb_manifest(path, ("postings_stream", "doclens_stream"))
        for name in ("postings_stream", "doclens_stream"):
            seg_dir = _sub(path, name)
            if os.path.exists(seg_dir):
                shutil.rmtree(seg_dir)
        os.remove(_sub(path, _ABSORB_MARKER))


def text_ingest_apply_batch(
    batch: DataFrame,
    batch_id: int,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """One micro-batch of the streaming text-index ingest: tokenize
    the arriving documents against the index's PERSISTED stop-term
    policy (frozen, like every append-* quantizer contract) and write
    the batch's postings and doclens as whole-directory OVERWRITES of
    ``postings_stream/batch=<id>`` / ``doclens_stream/batch=<id>`` --
    the per-batch-id idempotent segment layout the ANN family uses
    (a replayed batch rewrites its own directories, any crash order).
    Probes union the segments automatically (``_read_with_segments``)
    and derive N/avgdl live while segments exist, so a document is
    BM25-searchable the micro-batch after it arrives.

    Stop-policy drift: a NEW term crossing the df cap via streamed
    docs is not stopped until ``optimize_text_index`` re-evaluates
    the persisted policy against the grown corpus -- the cap is a
    cost guard, not a correctness gate (the ``append_winnowing_index``
    posture).  Caller contract: ids disjoint from everything already
    indexed (ingest never dedups -- put a dedup gate upstream)."""
    if not batch.take(1):
        return
    spark = batch.sparkSession
    base = batch.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("__text")
    ).localCheckpoint(eager=True)  # one computation, two derived writes

    def seg(table: str) -> str:
        return os.path.join(_sub(path, f"{table}_stream"), f"batch={int(batch_id)}")

    base.select("id", token_count(F.col("__text")).alias("dl")).write.mode(
        "overwrite"
    ).parquet(seg("doclens"))
    tok = base.select("id", F.explode(tokens("__text")).alias("term"))
    postings = tok.groupBy("term", "id").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    stop_terms = spark.read.parquet(_sub(path, "stopterms")).select("term")
    postings.join(F.broadcast(stop_terms), "term", "left_anti").write.mode(
        "overwrite"
    ).parquet(seg("postings"))


def optimize_text_stream_segments(spark: SparkSession, path: str) -> None:
    """Compact the text index's streaming segment trees: fold every
    ``<table>_stream/batch=*`` into one ``batch=-1`` tree so the probe
    union scans one file set however long the stream ran.  The fold is
    full-row DISTINCT (rows are unique per (term, id) / id by the
    ingest contract, so duplicates are always replayed-batch
    artifacts) under the shared crash-safe fold contract
    (``ann_index._fold_tree``: re-run recovery, replay-directory
    exclusion via the absorb manifest + the tree's ``_folded_ids``
    sidecar, rename-aside swap).  Single-writer, stream stopped."""
    absorbed = _absorbed_batches(path)
    for name in ("postings_stream", "doclens_stream"):
        _fold_tree(spark, path, name, set(absorbed.get(name, [])))


def delete_from_text_index(
    ids: DataFrame, path: str, id_col: str = "doc_id"
) -> None:
    """Tombstone deletes for the inverted text index -- the BM25 member
    of the family-wide takedown path: APPEND doc ids to
    ``tombstones/``; probes exclude the docs immediately, and because
    per-term df is computed live from the filtered postings, idf is
    takedown-correct the same moment.  Only the 1-row N/avgdl stats
    lag until ``apply_text_deletes`` -- corpus-scale denominators, not
    per-doc state, so the skew is bounded and shrinks to zero at the
    physical pass.  Repeat deletes are idempotent."""
    ids.select(F.col(id_col).cast("long").alias("id")).write.mode(
        "append"
    ).parquet(_sub(path, "tombstones"))


def apply_text_deletes(
    spark: SparkSession, path: str, retire_tombstones: bool = False
) -> None:
    """Physically retire a text index's tombstones: rewrite postings
    and doclens minus the deleted docs (read-then-swap), fold each
    streaming segment tree to a filtered ``batch=-1`` (full-row
    distinct -- replayed-batch duplicates collapse), and recompute the
    N/avgdl stats row from the SURVIVING doclens (closing the
    documented logical-phase skew).  Stop terms stay stopped (they
    were corpus-frequency-derived; deletion only ever lowers
    frequencies, so keeping them is conservative, never wrong).

    The tombstone table is KEPT by default (compacted), exactly as in
    ``ann_index.apply_deletes``: with a streaming ingest path a
    stopped-but-not-checkpointed stream can replay an in-flight batch
    containing deleted ids, and dropped tombstones would let them
    resurrect unmasked.  Pass ``retire_tombstones=True`` only when no
    replay is possible (clean checkpoint commit, or batch-only
    index).  Single-writer, probes stopped -- the family contract."""
    import shutil

    tomb_dir = _sub(path, "tombstones")
    if not os.path.exists(tomb_dir):
        return
    tombs = (
        spark.read.parquet(tomb_dir)
        .select("id")
        .distinct()
        .localCheckpoint(eager=True)
    )
    doclens = (
        spark.read.parquet(_sub(path, "doclens"))
        .join(tombs, "id", "left_anti")
        .localCheckpoint(eager=True)
    )
    postings = (
        spark.read.parquet(_sub(path, "postings"))
        .join(tombs, "id", "left_anti")
        .localCheckpoint(eager=True)
    )
    doclens.write.mode("overwrite").parquet(_sub(path, "doclens"))
    postings.write.mode("overwrite").parquet(_sub(path, "postings"))
    absorbed = _absorbed_batches(path)
    for name in ("postings_stream", "doclens_stream"):
        _fold_tree(
            spark,
            path,
            name,
            set(absorbed.get(name, [])),
            transform=lambda df: df.join(tombs, "id", "left_anti"),
        )
    agg = doclens.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    old_stats = _read_small(spark, _sub(path, "stats"))[0]
    _write_small(
        spark,
        [
            (
                float(agg["n"]),
                float(agg["avgdl"] or 0.0),
                old_stats["max_df"],
                old_stats["max_df_frac"],
            )
        ],
        "n_docs double, avgdl double, max_df double, max_df_frac double",
        _sub(path, "stats"),
    )
    if retire_tombstones:
        shutil.rmtree(tomb_dir)
    else:
        tombs.coalesce(1).write.mode("overwrite").parquet(tomb_dir)
