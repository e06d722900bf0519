"""Corpus-curation catalog queries (training-data pipeline surface):
deterministic train/val/test split, repetition-based quality filters,
an end-to-end curation pipeline, and benchmark decontamination -- all
over ``documents`` with exact DuckDB oracle twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io_utils import load, parallelize_small
from ..operators import curation as CU
from ..operators import text as TX
from .catalog import register

_TOKS = "list_filter(string_split_regex(text, ' +'), t -> t <> '')"
_NTOK = f"len({_TOKS})"
_NDIS = f"len(list_distinct({_TOKS}))"
_ALPHA = "length(regexp_replace(text, '[^a-z]', '', 'g')) / length(text)"
_MEANLEN = (
    f"list_sum(list_transform({_TOKS}, t -> CAST(length(t) AS DOUBLE)))"
    f" / greatest({_NTOK}, 1)"
)

#: DuckDB twin of ``curation.split_bucket`` (md5-prefix hash bucket).
_BUCKET = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100"
)
_SPLIT = (
    f"CASE WHEN {_BUCKET} < 90 THEN 'train' "
    f"WHEN {_BUCKET} < 95 THEN 'val' ELSE 'test' END"
)


def _dup_ngram_sql(n: int) -> str:
    """DuckDB twin of ``curation.dup_ngram_fraction`` (operates on the
    ``l`` token-list column of the ``toks`` CTE)."""
    joined = " || ' ' || ".join(f"l[i+{k}]" for k in range(1, n + 1))
    grams = (
        f"list_distinct(list_transform(range(greatest(len(l) - {n - 1}, 0)), "
        f"i -> {joined}))"
    )
    return (
        f"CASE WHEN len(l) < {n} THEN 0.0 ELSE "
        f"1.0 - len({grams}) / CAST(greatest(len(l) - {n - 1}, 1) AS DOUBLE) END"
    )


_SYMBOLS = "length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) / length(text)"
_MAXTOK = (
    f"coalesce(list_max(list_transform({_TOKS}, t -> CAST(length(t) AS BIGINT))), 0)"
)


@register(
    "corpus_train_val_split",
    oracle=f"""
    SELECT {_SPLIT} AS split,
           count(*) AS n_docs,
           CAST(sum({_NTOK}) AS BIGINT) AS n_tokens
    FROM documents
    GROUP BY 1
    ORDER BY split
    """,
    tags=("curation", "north-star", "split"),
)
def corpus_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test split by md5(doc_id) hash
    bucket: membership is content-addressed, so it is stable under
    corpus growth, repartitioning, and re-runs (the property random()
    sampling lacks).  Per-split doc and token counts."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    return (
        docs.select(
            CU.split_label("doc_id").alias("split"),
            TX.token_count(F.col("text")).alias("n_toks"),
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
        )
        .orderBy("split")
    )


@register(
    "text_repetition_filters",
    oracle=f"""
    WITH toks AS (SELECT doc_id, text, {_TOKS} AS l FROM documents)
    SELECT doc_id,
           round({_dup_ngram_sql(2)}, 6) AS dup_2gram_frac,
           round({_dup_ngram_sql(3)}, 6) AS dup_3gram_frac,
           {_MAXTOK} AS max_token_len,
           round({_SYMBOLS}, 6) AS symbol_ratio,
           ({_dup_ngram_sql(2)} <= 0.6 AND {_dup_ngram_sql(3)} <= 0.5
            AND {_MAXTOK} <= 30 AND {_SYMBOLS} <= 0.1) AS keep
    FROM toks
    ORDER BY doc_id
    """,
    tags=("curation", "north-star", "repetition"),
)
def text_repetition_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style repetition battery per document: duplicate
    2-/3-gram fractions, longest-token length, symbol ratio, and the
    blended keep verdict.  All map-side array expressions."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    t = F.col("text")
    return docs.select(
        "doc_id",
        F.round(CU.dup_ngram_fraction(t, 2), 6).alias("dup_2gram_frac"),
        F.round(CU.dup_ngram_fraction(t, 3), 6).alias("dup_3gram_frac"),
        CU.max_token_length(t).alias("max_token_len"),
        F.round(CU.symbol_ratio(t), 6).alias("symbol_ratio"),
        CU.repetition_pass(t).alias("keep"),
    ).orderBy("doc_id")


@register(
    "corpus_curation_pipeline",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, text, lang, source,
             {_NTOK} AS n_toks,
             0.5 * (length(regexp_replace(text, '[^a-z]', '', 'g')) / length(text))
           + 0.3 * (len(list_distinct({_TOKS})) / greatest({_NTOK}, 1))
           + 0.2 * (CASE WHEN list_sum(list_transform({_TOKS},
                             t -> CAST(length(t) AS DOUBLE))) / greatest({_NTOK}, 1)
                         BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END) AS quality
      FROM documents
    ),
    survivors AS (SELECT text, min(doc_id) AS doc_id FROM documents GROUP BY text),
    kept AS (
      SELECT s.* FROM scored s
      JOIN survivors v ON s.doc_id = v.doc_id AND s.text = v.text
      WHERE s.lang = 'en' AND s.quality >= 0.72
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS n_tokens,
           round(avg(quality), 6) AS mean_quality
    FROM kept
    GROUP BY source
    ORDER BY source
    """,
    tags=("curation", "north-star", "pipeline"),
)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation pass, the composition a pre-training corpus
    actually runs: language filter -> quality threshold -> exact-dedup
    survivors -> per-source corpus stats.  Each stage is a narrow
    filter or one hash shuffle; the stages pipeline without
    materialization."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    t = F.col("text")
    scored = docs.select(
        "doc_id",
        "text",
        "lang",
        "source",
        TX.token_count(t).alias("n_toks"),
        TX.quality_score(t).alias("quality"),
    )
    survivors = docs.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    kept = scored.join(survivors, ["doc_id", "text"]).where(
        (F.col("lang") == "en") & (F.col("quality") >= 0.72)
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
            F.round(F.avg("quality"), 6).alias("mean_quality"),
        )
        .orderBy("source")
    )


_SHINGLE8 = (
    "list_distinct(list_transform(range(greatest(len(l) - 7, 0)), "
    "i -> " + " || ' ' || ".join(f"l[i+{k}]" for k in range(1, 9)) + "))"
)


@register(
    "corpus_decontamination",
    oracle=f"""
    WITH toks AS (SELECT doc_id, source, {_TOKS} AS l FROM documents),
    sh AS (SELECT doc_id, source, unnest({_SHINGLE8}) AS shingle FROM toks),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE source = 'src0')
    SELECT a.doc_id, count(*) AS n_overlapping_ngrams
    FROM sh a JOIN bench b ON a.shingle = b.shingle
    WHERE a.source <> 'src0'
    GROUP BY a.doc_id
    ORDER BY a.doc_id
    """,
    tags=("curation", "north-star", "decontamination"),
)
def corpus_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs (source != src0) that
    share any word 8-gram with the held-out eval slice (source = src0),
    with overlap counts -- the hygiene pass that keeps eval data out of
    a training corpus.  The benchmark shingle set broadcasts."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    corpus = docs.where(F.col("source") != "src0")
    benchmark = docs.where(F.col("source") == "src0")
    return CU.contaminated_docs(corpus, benchmark, n=8).orderBy("doc_id")


@register(
    "corpus_contamination_scores",
    oracle=f"""
    WITH toks AS (SELECT doc_id, source, {_TOKS} AS l FROM documents),
    sets AS (SELECT doc_id, source, {_SHINGLE8} AS sh FROM toks),
    corp AS (
      SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_shingles, sh
      FROM sets WHERE source <> 'src0'
    ),
    bench AS (SELECT DISTINCT unnest(sh) AS shingle FROM sets WHERE source = 'src0'),
    matched AS (
      SELECT c.doc_id, count(*) AS n_matched
      FROM (SELECT doc_id, unnest(sh) AS shingle FROM corp) c
      JOIN bench b ON c.shingle = b.shingle
      GROUP BY c.doc_id
    )
    SELECT c.doc_id,
           c.n_shingles,
           CAST(coalesce(m.n_matched, 0) AS BIGINT) AS n_matched,
           round(coalesce(m.n_matched, 0) / greatest(c.n_shingles, 1), 6)
             AS overlap_frac,
           (coalesce(m.n_matched, 0) / greatest(c.n_shingles, 1)) > 0.05
             AS contaminated
    FROM corp c LEFT JOIN matched m ON c.doc_id = m.doc_id
    ORDER BY c.doc_id
    """,
    tags=("curation", "north-star", "decontamination"),
)
def corpus_contamination_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRADED benchmark-overlap triage
    (``operators/curation.py:contamination_scores``): every training
    doc (source != src0) scores the fraction of its distinct word
    8-grams that appear anywhere in the held-out slice (source = src0)
    plus a contaminated flag at 5% -- the view that separates a quoted
    sentence from an embedded eval set.  One shingle pass over the
    corpus (total carried through explode_outer), broadcast benchmark
    set, LEFT join so zero-overlap docs score 0.0."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    corpus = docs.where(F.col("source") != "src0")
    benchmark = docs.where(F.col("source") == "src0")
    return CU.contamination_scores(corpus, benchmark, n=8, threshold=0.05).orderBy(
        "doc_id"
    )


@register(
    "corpus_stratified_sample",
    oracle=f"""
    SELECT doc_id, source, CAST(rk AS BIGINT) AS sample_rank
    FROM (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents
    )
    WHERE rk <= 5
    ORDER BY source, sample_rank
    """,
    tags=("curation", "north-star", "sampling"),
)
def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: the 5 docs with the smallest
    md5(doc_id) per source stratum.  Content-addressed like the split
    operator, so the sample is reproducible across runs and engines --
    and per-stratum TakeOrdered pushes the top-k into partial
    aggregation (no global sort) at scale."""
    from pyspark.sql.window import Window

    docs = parallelize_small(load(spark, sf_dir, "documents"))
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select(
            "doc_id", "source", F.row_number().over(w).cast("long").alias("sample_rank")
        )
        .where(F.col("sample_rank") <= 5)
        .orderBy("source", "sample_rank")
    )


@register(
    "corpus_pack_sequences",
    oracle=f"""
    WITH sized AS (
      SELECT doc_id, source, {_NTOK} AS n_toks FROM documents
    ),
    packed AS (
      SELECT source, n_toks,
             (sum(n_toks) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) - n_toks) // 512 AS chunk_id
      FROM sized
    )
    SELECT source, CAST(chunk_id AS BIGINT) AS chunk_id,
           count(*) AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS n_tokens
    FROM packed
    GROUP BY source, chunk_id
    ORDER BY source, chunk_id
    """,
    tags=("curation", "north-star", "packing"),
)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing: assign docs (in doc_id order, within
    their source shard) to training chunks of ~512 tokens by running
    token count -- the pretraining batch-packing shape.  Windowing is
    PARTITIONED by source on purpose: a global ORDER BY window would
    serialize onto one task at 100 TB; per-shard packing keeps every
    partition independent."""
    from pyspark.sql.window import Window

    docs = parallelize_small(load(spark, sf_dir, "documents"))
    t = F.col("text")
    sized = docs.select("doc_id", "source", TX.token_count(t).alias("n_toks"))
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    packed = sized.select(
        "source",
        "n_toks",
        F.floor((F.sum("n_toks").over(w) - F.col("n_toks")) / 512).alias("chunk_id"),
    )
    return (
        packed.groupBy("source", "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
        )
        .orderBy("source", "chunk_id")
    )


@register(
    "corpus_source_cap",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS cap_rank
      FROM documents
    )
    SELECT source, CAST(cap_rank AS BIGINT) AS cap_rank, doc_id
    FROM ranked WHERE cap_rank <= 10
    ORDER BY source, cap_rank
    """,
    tags=("curation", "north-star", "sampling"),
)
def corpus_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document caps (keep <= 10 docs per source), the
    standard web-corpus domain-cap: survivor selection is
    content-addressed (smallest md5 of the doc id wins), so the kept
    set is deterministic across engines, runs, and partitionings --
    never 'first 10 rows seen', which is partition-order-dependent.
    One bounded window per source shard; no global sort, no skew (the
    window key IS the cap key, so no partition exceeds the cap's
    working set by more than the shard size)."""
    from pyspark.sql.window import Window

    docs = parallelize_small(load(spark, sf_dir, "documents"))
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select(
            "source",
            F.row_number().over(w).cast("long").alias("cap_rank"),
            "doc_id",
        )
        .where(F.col("cap_rank") <= 10)
        .orderBy("source", "cap_rank")
    )


@register(
    "corpus_weighted_sample",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, source, n_chars,
             round(
               ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                        AS BIGINT) + 1.0) / 4294967296.0)
               / n_chars, 10) + 0.0 AS sample_key
      FROM documents
      WHERE n_chars > 0
    )
    SELECT doc_id, source, n_chars, sample_key
    FROM keyed
    ORDER BY sample_key DESC, doc_id
    LIMIT 100
    """,
    tags=("curation", "sampling"),
)
def corpus_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sample without replacement
    (``operators/curation.py:weighted_sample``): 100 docs by the
    Efraimidis-Spirakis key ln(u)/w with md5-derived uniforms and
    weight = n_chars, so longer documents are proportionally likelier.
    Plans as TakeOrderedAndProject (per-partition heaps); the draw is
    content-addressed, so the oracle replays it exactly (keys rounded
    to 1e-10 in both engines to absorb libm-vs-JVM ln ulps)."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    return CU.weighted_sample(
        docs, F.col("n_chars").cast("double"), k=100
    ).select("doc_id", "source", "n_chars", "sample_key")


@register(
    "corpus_content_sample",
    oracle="""
    SELECT doc_id, source, n_chars,
           md5(CAST(doc_id AS VARCHAR)) AS sample_key
    FROM documents
    ORDER BY sample_key ASC, doc_id
    LIMIT 100
    """,
    tags=("curation", "sampling"),
)
def corpus_content_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed uniform bottom-k sample
    (``operators/curation.py:bottomk_sample``): the 100 docs with the
    smallest md5(id) keys -- reproducible across runs/engines,
    mergeable (bottom-k of per-shard bottom-ks), append-stable (new
    data only displaces, never reshuffles).  The fixed-size sample a
    profiling or eyeballing job wants where ``.sample()`` gives a
    different corpus every run.  Plans as TakeOrderedAndProject;
    streaming maintenance twin: ``streaming/pipeline.py:
    start_sample_sink``."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    return CU.bottomk_sample(docs, k=100).select(
        "doc_id", "source", "n_chars", "sample_key"
    )


@register(
    "corpus_mixture_weights",
    oracle=f"""
    WITH pg AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum({_NTOK}) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS total_tokens,
                   CAST(count(*) AS DOUBLE) AS n_groups FROM pg)
    SELECT source, n_docs, n_tokens,
           round(n_tokens / total_tokens, 6) AS token_share,
           round((1.0 / n_groups) / (n_tokens / total_tokens), 6) AS weight
    FROM pg CROSS JOIN tot
    ORDER BY source
    """,
    tags=("curation", "mixture", "domain-weights"),
)
def corpus_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture reweighting
    (``operators/curation.py:mixture_weights``): per-source token
    shares and the sampling weight that moves the corpus to a uniform
    per-domain token budget (the fixed-target special case of DoReMi,
    Xie et al. 2023).  weight > 1 means upsample; feed into
    ``weighted_sample`` for the draw.  One group hash agg + a 1-row
    corpus-total broadcast."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    w = CU.mixture_weights(docs, group_col="source")
    return w.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round("token_share", 6).alias("token_share"),
        F.round("weight", 6).alias("weight"),
    ).orderBy("source")


#: Shared DuckDB DSIR pipeline (hashed unigram bucket models, add-1
#: smoothing, per-token log-ratio sum; English subset as the target
#: domain) -- ends in a ``weights`` CTE of (doc_id, n_tokens,
#: log_weight rounded 1e-6) for EVERY document; reused by the
#: weights-report and importance-resampling oracles.
_DSIR_CTE = f"""
    tok AS (
      SELECT doc_id, unnest({_TOKS}) AS t FROM documents
    ),
    bt AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 1024 AS b
      FROM tok
    ),
    raw_c AS (SELECT b, count(*) AS c FROM bt GROUP BY b),
    tgt_c AS (
      SELECT b, count(*) AS c FROM bt
      JOIN documents d USING (doc_id) WHERE d.lang = 'en' GROUP BY b
    ),
    totals AS (
      SELECT (SELECT coalesce(sum(c), 0) FROM raw_c) + 1024 AS rt,
             (SELECT coalesce(sum(c), 0) FROM tgt_c) + 1024 AS tt
    ),
    ratio AS (
      SELECT g.b,
             ln(((coalesce(t.c, 0) + 1) / CAST(tot.tt AS DOUBLE))
                / ((coalesce(r.c, 0) + 1) / CAST(tot.rt AS DOUBLE)))
               AS log_ratio
      FROM range(1024) g(b)
      CROSS JOIN totals tot
      LEFT JOIN raw_c r ON r.b = g.b
      LEFT JOIN tgt_c t ON t.b = g.b
    ),
    scored AS (
      SELECT bt.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             sum(log_ratio) AS log_weight
      FROM bt JOIN ratio ON ratio.b = bt.b
      GROUP BY bt.doc_id
    ),
    weights AS (
      SELECT d.doc_id,
             coalesce(s.n_tokens, 0) AS n_tokens,
             round(coalesce(s.log_weight, 0.0), 6) + 0.0 AS log_weight
      FROM documents d LEFT JOIN scored s ON s.doc_id = d.doc_id
    )
"""


@register(
    "corpus_dsir_weights",
    oracle=f"""
    WITH {_DSIR_CTE}
    SELECT doc_id, n_tokens, log_weight
    FROM weights
    ORDER BY doc_id
    """,
    tags=("curation", "north-star", "dsir", "importance-sampling"),
)
def corpus_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (``operators/curation.py:dsir_weights``,
    Xie et al. 2023): per-document importance weight of the raw
    multilingual corpus against the English subset as the target
    domain -- hashed unigram bucket models (1024 md5 buckets, add-1
    smoothing), log-probability ratio summed per token occurrence.
    Docs whose token distribution looks English-like score high;
    compose with ``corpus_weighted_sample`` for the paper's
    importance-resampling step.  Two bounded bucket-table collects +
    one broadcast equi-join -- nothing corpus-quadratic."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    target = docs.where(F.col("lang") == "en")
    return (
        CU.dsir_weights(docs, target, n_buckets=1024)
        .select("doc_id", "n_tokens", F.round("log_weight", 6).alias("log_weight"))
        .orderBy("doc_id")
    )


@register(
    "corpus_dsir_resample",
    oracle=f"""
    WITH {_DSIR_CTE},
    keyed AS (
      SELECT doc_id, n_tokens, log_weight,
             round(
               ln(-ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                            AS BIGINT) + 0.5) / 4294967296.0))
               - log_weight, 8) + 0.0 AS sample_key
      FROM weights
    )
    SELECT doc_id, n_tokens, log_weight, sample_key
    FROM keyed
    ORDER BY sample_key, doc_id
    LIMIT 100
    """,
    tags=("curation", "north-star", "dsir", "importance-sampling", "composition"),
)
def corpus_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END DSIR importance resampling
    (``operators/curation.py:dsir_resample``, Xie et al. 2023 §2) --
    the composition the paper actually prescribes: hashed-unigram
    importance weights against the English target domain, then a
    without-replacement Efraimidis-Spirakis draw of 100 documents with
    probability rising in exp(log_weight), executed in log space
    (ascending Gumbel-form key ln(-ln(u)) - log_weight) so corpus-scale
    log-weights never overflow the double range.  Both stages are
    md5-derived, so the oracle replays buckets, ratios, weights, key,
    and top-k boundary exactly.  Plans as the DSIR aggs plus one
    TakeOrderedAndProject -- no global sort."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    target = docs.where(F.col("lang") == "en")
    return CU.dsir_resample(docs, target, k=100, n_buckets=1024).orderBy(
        "sample_key", "doc_id"
    )


#: DuckDB hash-embedding pipeline over ``documents`` (same fragments as
#: the semantic-text dedup oracle in plans/dedup_queries.py).
_HASH_EMB_CTE = f"""
    tok AS (SELECT doc_id, unnest({_TOKS}) AS t FROM documents),
    h AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 64 AS idx,
             CASE WHEN CAST(('0x' || substr(md5(t), 9, 1)) AS BIGINT) % 2 = 0
                  THEN 1.0 ELSE -1.0 END AS s
      FROM tok
    ),
    cells AS (SELECT doc_id, idx, sum(s) AS val FROM h GROUP BY doc_id, idx),
    docs_with AS (
      SELECT doc_id FROM cells GROUP BY doc_id
      HAVING sum(CASE WHEN val <> 0 THEN 1 ELSE 0 END) > 0
    ),
    grid AS (SELECT doc_id, d FROM docs_with CROSS JOIN range(64) t(d)),
    emb AS (
      SELECT g.doc_id, list(coalesce(c.val, 0.0) ORDER BY g.d) AS e
      FROM grid g LEFT JOIN cells c ON c.doc_id = g.doc_id AND c.idx = g.d
      GROUP BY g.doc_id
    )
"""

_DOTN = (
    "list_sum(list_transform(range(64), "
    "i -> CAST({a}[i+1] AS DOUBLE) * CAST({b}[i+1] AS DOUBLE)))"
)
_NRM = (
    "sqrt(list_sum(list_transform(range(64), "
    "i -> CAST({a}[i+1] AS DOUBLE) * CAST({a}[i+1] AS DOUBLE))))"
)


@register(
    "corpus_semantic_decontamination",
    oracle=f"""
    WITH {_HASH_EMB_CTE},
    bench AS (
      SELECT e.doc_id, e.e FROM emb e
      JOIN documents d ON d.doc_id = e.doc_id WHERE d.source = 'src0'
    ),
    corp AS (
      SELECT e.doc_id, e.e FROM emb e
      JOIN documents d ON d.doc_id = e.doc_id WHERE d.source <> 'src0'
    ),
    scored AS (
      SELECT c.doc_id, b.doc_id AS bench_id,
             {_DOTN.format(a='c.e', b='b.e')}
               / ({_NRM.format(a='c.e')} * {_NRM.format(a='b.e')}) AS cos_sim
      FROM corp c CROSS JOIN bench b
    ),
    best AS (
      SELECT doc_id, bench_id, cos_sim FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY cos_sim DESC, bench_id) AS rn
        FROM scored)
      WHERE rn = 1
    )
    SELECT doc_id, bench_id, round(cos_sim, 6) + 0.0 AS cos_sim
    FROM best WHERE cos_sim >= 0.9
    ORDER BY doc_id
    """,
    tags=("curation", "north-star", "decontamination", "semantic", "embedding"),
)
def corpus_semantic_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space benchmark decontamination
    (``operators/curation.py:semantic_contaminated_docs``): training
    docs (source != src0) whose feature-hashing embedding has cosine
    >= 0.9 with any eval doc (source = src0), with the best-matching
    eval doc -- catches PARAPHRASED contamination the verbatim 8-gram
    pass (``corpus_decontamination``) cannot see.  The benchmark
    matrix rides in an Arrow closure (eval sets are small); the corpus
    side is one shuffle-free vectorized pass.  Integer-valued hash
    embeddings make the matmul exact, so the SQL cross-replay oracle
    hash-matches bit-for-bit."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    corpus = docs.where(F.col("source") != "src0")
    benchmark = docs.where(F.col("source") == "src0")
    return (
        CU.semantic_contaminated_docs(corpus, benchmark, threshold=0.9)
        .select("doc_id", "bench_id", F.round("cos_sim", 6).alias("cos_sim"))
        .orderBy("doc_id")
    )


@register(
    "corpus_mixture_temperature",
    oracle=f"""
    WITH pg AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum({_NTOK}) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS total_tokens FROM pg),
    sh AS (
      SELECT source, n_docs, n_tokens,
             n_tokens / total_tokens AS token_share
      FROM pg CROSS JOIN tot
    ),
    z AS (SELECT sum(pow(token_share, 0.3)) AS z FROM sh)
    SELECT source, n_docs, n_tokens,
           round(token_share, 6) AS token_share,
           round(pow(token_share, 0.3) / z, 6) AS target_share,
           round((pow(token_share, 0.3) / z) / token_share, 6) AS weight
    FROM sh CROSS JOIN z
    ORDER BY source
    """,
    tags=("curation", "mixture", "temperature", "domain-weights"),
)
def corpus_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixture
    (``operators/curation.py:temperature_mixture_weights``; mT5 /
    XLM-R sampling rule, alpha = 0.3): target share of each source is
    share^alpha / sum(share^alpha), flattening the natural token
    distribution toward uniform -- the standard knob between 'natural'
    and 'uniform' domain sampling for multilingual / multi-source
    pretraining.  Same scale shape as ``corpus_mixture_weights``: one
    group hash agg + 1-row broadcasts."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    w = CU.temperature_mixture_weights(docs, alpha=0.3)
    return w.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round("token_share", 6).alias("token_share"),
        F.round("target_share", 6).alias("target_share"),
        F.round("weight", 6).alias("weight"),
    ).orderBy("source")


@register(
    "corpus_token_budget_sample",
    oracle=f"""
    WITH pg AS (
      SELECT source, CAST(sum({_NTOK}) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS total_tokens FROM pg),
    sh AS (
      SELECT source, n_tokens / total_tokens AS token_share
      FROM pg CROSS JOIN tot
    ),
    z AS (SELECT sum(pow(token_share, 0.3)) AS z FROM sh),
    tg AS (
      SELECT source,
             CAST(floor(10000.0 * (pow(token_share, 0.3) / z)) AS BIGINT)
               AS token_budget
      FROM sh CROSS JOIN z
    ),
    toks AS (
      SELECT doc_id, source, CAST({_NTOK} AS BIGINT) AS n_tokens
      FROM documents
    ),
    cum AS (
      SELECT doc_id, source, n_tokens,
             CAST(sum(n_tokens) OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      FROM toks
    )
    SELECT c.doc_id, c.source, c.n_tokens, c.cum_tokens, t.token_budget
    FROM cum c JOIN tg t USING (source)
    WHERE c.cum_tokens <= t.token_budget
    ORDER BY c.doc_id
    """,
    tags=("curation", "mixture", "budget", "sampling"),
)
def corpus_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-token-budget corpus assembly
    (``operators/curation.py:token_budget_sample``): a 10k-token
    budget split across sources by temperature-scaled shares
    (alpha = 0.3), each domain filled greedily in md5(doc_id) order
    until its budget is exhausted (inclusive-undershoot rule) -- the
    materialization step that turns mixture weights into an actual
    training corpus.  Domain-count budget broadcast + one window
    cumsum per domain partition."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    return CU.token_budget_sample(docs, total_tokens=10_000, alpha=0.3).orderBy(
        "doc_id"
    )


#: Quality-score twin shared with ``corpus_curation_pipeline``'s
#: oracle (same operand tree as ``operators/text.py:quality_score``).
_QUALITY = f"""0.5 * (length(regexp_replace(text, '[^a-z]', '', 'g')) / length(text))
           + 0.3 * (len(list_distinct({_TOKS})) / greatest({_NTOK}, 1))
           + 0.2 * (CASE WHEN list_sum(list_transform({_TOKS},
                             t -> CAST(length(t) AS DOUBLE))) / greatest({_NTOK}, 1)
                         BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END)"""


@register(
    "corpus_curation_funnel",
    oracle=f"""
    WITH toks AS (SELECT doc_id, text, lang, {_TOKS} AS l FROM documents),
    f AS (
      SELECT doc_id, len(l) AS ntok,
             (lang = 'en') AS f1,
             {_QUALITY} AS q,
             ({_dup_ngram_sql(2)} <= 0.6 AND {_dup_ngram_sql(3)} <= 0.5
              AND {_MAXTOK} <= 30 AND {_SYMBOLS} <= 0.1) AS rep,
             (doc_id = min(doc_id) OVER (PARTITION BY text)) AS surv
      FROM toks
    ),
    g AS (
      SELECT ntok, f1, (f1 AND q >= 0.72) AS f2,
             (f1 AND q >= 0.72 AND rep) AS f3,
             (f1 AND q >= 0.72 AND rep AND surv) AS f4
      FROM f
    )
    SELECT * FROM (
      SELECT CAST(0 AS BIGINT) AS stage_id, 'input' AS stage,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(ntok) AS BIGINT) AS n_tokens FROM g
      UNION ALL
      SELECT 1, 'language', CAST(sum(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT),
             CAST(sum(CASE WHEN f1 THEN ntok ELSE 0 END) AS BIGINT) FROM g
      UNION ALL
      SELECT 2, 'quality', CAST(sum(CASE WHEN f2 THEN 1 ELSE 0 END) AS BIGINT),
             CAST(sum(CASE WHEN f2 THEN ntok ELSE 0 END) AS BIGINT) FROM g
      UNION ALL
      SELECT 3, 'repetition', CAST(sum(CASE WHEN f3 THEN 1 ELSE 0 END) AS BIGINT),
             CAST(sum(CASE WHEN f3 THEN ntok ELSE 0 END) AS BIGINT) FROM g
      UNION ALL
      SELECT 4, 'exact_dedup', CAST(sum(CASE WHEN f4 THEN 1 ELSE 0 END) AS BIGINT),
             CAST(sum(CASE WHEN f4 THEN ntok ELSE 0 END) AS BIGINT) FROM g
    )
    ORDER BY stage_id
    """,
    tags=("curation", "north-star", "funnel", "report"),
)
def corpus_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation funnel report (``operators/curation.py:curation_funnel``):
    cumulative docs/tokens surviving each gate of the standard cascade
    (input -> language -> quality -> repetition -> exact dedup), with
    the same thresholds as ``corpus_curation_pipeline`` so the funnel
    explains that query's output.  One corpus pass, every gate a flag
    column; the only shuffle is the text-hash survivor window."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    return CU.curation_funnel(docs).orderBy("stage_id")


@register(
    "corpus_length_buckets",
    oracle=f"""
    WITH t AS (SELECT CAST({_NTOK} AS BIGINT) AS ntok FROM documents),
    b AS (SELECT quantile_cont(ntok, [
        {", ".join(str(i / 8) for i in range(1, 8))}
    ]) AS bounds FROM t),
    assigned AS (
      SELECT t.ntok,
             CAST(len(list_filter(b.bounds, x -> t.ntok > x)) AS BIGINT)
               AS bucket
      FROM t CROSS JOIN b
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(ntok) AS min_tokens,
           max(ntok) AS max_tokens,
           CAST(sum(ntok) AS BIGINT) AS sum_tokens,
           round(sum(ntok) / (count(*) * CAST(max(ntok) AS DOUBLE)), 6)
             AS pad_efficiency
    FROM assigned GROUP BY bucket ORDER BY bucket
    """,
    tags=("curation", "batching", "padding", "report"),
)
def corpus_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-grouped batching report
    (``operators/curation.py:length_buckets``): 8 token-length buckets
    from exact percentile boundaries with per-bucket padding
    efficiency (real tokens / pad-to-max capacity) -- the planner for
    dynamic batching in training-data assembly.  One percentile agg
    (1-row broadcast) + in-row assignment + one bucket-keyed agg; no
    global sort."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    return CU.length_buckets(docs, n_buckets=8).orderBy("bucket")


@register(
    "corpus_source_overlap",
    oracle=f"""
    WITH toks AS (SELECT doc_id, source, {_TOKS} AS l FROM documents),
    sh AS (
      SELECT DISTINCT source, unnest({_SHINGLE8}) AS shingle
      FROM toks
    ),
    sizes AS (SELECT source, count(*) AS set_size FROM sh GROUP BY source),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT i.src_a, i.src_b,
           CAST(sa.set_size AS BIGINT) AS size_a,
           CAST(sb.set_size AS BIGINT) AS size_b,
           CAST(i.n_common AS BIGINT) AS n_common,
           round(i.n_common / (sa.set_size + sb.set_size - i.n_common), 6)
             AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.source = i.src_a
    JOIN sizes sb ON sb.source = i.src_b
    ORDER BY src_a, src_b
    """,
    tags=("curation", "north-star", "dedup"),
)
def corpus_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-SOURCE overlap audit: pairwise Jaccard between each
    domain's distinct word-8-gram sets -- the corpus-level view that
    flags mirrored / re-crawled / pipelined-twice sources before any
    doc-level dedup runs (two sources with high set Jaccard should be
    merged or one dropped, not fed to MinHash doc-by-doc).  One
    distinct (source, shingle) projection, a shingle-keyed self-join
    whose per-shingle fan-out is bounded by the domain count squared
    (domains are dozens, never corpus-scale), and a domain-pair agg --
    output is domains^2 rows regardless of corpus size."""
    from ..operators.dedup import word_shingles

    docs = parallelize_small(load(spark, sf_dir, "documents"))
    sh = docs.select(
        "source", F.explode(word_shingles(F.col("text"), 8)).alias("shingle")
    ).distinct()
    sizes = sh.groupBy("source").agg(F.count(F.lit(1)).alias("set_size"))
    a = sh.select(F.col("source").alias("src_a"), "shingle")
    b = sh.select(F.col("source").alias("src_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("set_size").alias("size_b"))
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "size_a",
            "size_b",
            "n_common",
            F.round(
                F.col("n_common")
                / (F.col("size_a") + F.col("size_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("src_a", "src_b")
    )


#: ALL positional word 8-grams (occurrence list, index = start pos) --
#: the non-distinct twin of ``_SHINGLE8`` for span-level operators.
_ALLGRAMS8 = (
    "list_transform(range(greatest(len(l) - 7, 0)), "
    "i -> " + " || ' ' || ".join(f"l[i+{k}]" for k in range(1, 9)) + ")"
)


@register(
    "corpus_decontaminate_spans",
    oracle=f"""
    WITH toks AS (SELECT doc_id, source, {_TOKS} AS l FROM documents),
    grams AS (
      SELECT doc_id,
             unnest(range(greatest(len(l) - 7, 0))) AS p,
             unnest({_ALLGRAMS8}) AS g
      FROM toks WHERE source <> 'src0'
    ),
    bench AS (
      SELECT DISTINCT unnest({_ALLGRAMS8}) AS g FROM toks WHERE source = 'src0'
    ),
    hits AS (
      SELECT doc_id, list_sort(list(DISTINCT p)) AS ms
      FROM grams JOIN bench USING (g) GROUP BY doc_id
    ),
    final AS (
      SELECT b.doc_id, b.l,
             list_filter(b.l, (t, i) ->
               len(list_filter(coalesce(h.ms, CAST([] AS BIGINT[])),
                               m -> (i - 1) >= m AND (i - 1) <= m + 7)) = 0
             ) AS kept
      FROM (SELECT doc_id, l FROM toks WHERE source <> 'src0') b
      LEFT JOIN hits h USING (doc_id)
    )
    SELECT doc_id,
           -- DuckDB returns NULL for an empty list; Spark concat_ws
           -- returns '' -- normalize to ''.
           coalesce(array_to_string(kept, ' '), '') AS clean_text,
           CAST(len(l) AS BIGINT) AS n_tokens,
           CAST(len(l) - len(kept) AS BIGINT) AS n_removed
    FROM final ORDER BY doc_id
    """,
    tags=("curation", "north-star", "decontamination"),
)
def corpus_decontaminate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPAN-level decontamination
    (``operators/curation.py:decontaminate_spans``): excise exactly the
    tokens covered by an eval-set (source = src0) 8-gram from every
    training doc and keep the rest -- the "remove the quoted sentence,
    keep the page" policy, vs ``corpus_decontamination``'s
    drop-the-doc.  Positional grams + broadcast benchmark set + one
    per-doc agg; the excision is an in-row indexed filter.  The oracle
    replays positions, hits, and the excision lambda."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    corpus = docs.where(F.col("source") != "src0")
    benchmark = docs.where(F.col("source") == "src0")
    return CU.decontaminate_spans(corpus, benchmark, n=8).orderBy("doc_id")


@register(
    "corpus_shard_assignment",
    oracle=f"""
    WITH per AS (
      SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
               % 8 AS shard,
             {_NTOK} AS ntok
      FROM documents),
    shards AS (
      SELECT shard, count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS n_tokens
      FROM per GROUP BY shard),
    tot AS (SELECT sum(n_tokens) AS t FROM shards)
    SELECT shard, n_docs, n_tokens,
           round(n_tokens / t, 6) AS token_frac,
           round(n_tokens / t - 0.125, 6) + 0.0 AS balance_dev
    FROM shards, tot
    ORDER BY shard
    """,
    tags=("curation", "north-star", "sharding", "write-path"),
)
def corpus_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic output sharding
    (``operators/curation.py:shard_assignment``): the write-path plan
    for a materialized corpus -- md5-hash shard per doc, per-shard
    doc/token counts, token share, and deviation from the ideal
    ``1/n_shards`` balance.  Assignment is a stateless per-row hash
    (appends never move existing docs); the report is one shard-keyed
    agg plus a 1-row totals broadcast.  The oracle replays the hash,
    the rollup, and the share arithmetic."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    return CU.shard_assignment(docs, n_shards=8).orderBy("shard")


@register(
    "corpus_quality_threshold_sweep",
    oracle=f"""
    WITH scored AS (
      SELECT round(0.5 * ({_ALPHA})
                 + 0.3 * ({_NDIS} / greatest({_NTOK}, 1))
                 + 0.2 * (CASE WHEN {_MEANLEN} BETWEEN 2.0 AND 12.0
                               THEN 1.0 ELSE 0.0 END), 6) AS q,
             {_NTOK} AS ntok
      FROM documents),
    grid AS (SELECT * FROM (VALUES (0.2), (0.35), (0.5), (0.65), (0.8))
             AS g(threshold)),
    tot AS (SELECT count(*) AS d, sum(ntok) AS t FROM scored)
    SELECT g.threshold,
           CAST(count(s.q) AS BIGINT) AS kept_docs,
           CAST(coalesce(sum(s.ntok), 0) AS BIGINT) AS kept_tokens,
           round(count(s.q) / (SELECT d FROM tot), 6) AS doc_frac,
           round(coalesce(sum(s.ntok), 0) / (SELECT t FROM tot), 6)
             AS token_frac
    FROM grid g LEFT JOIN scored s ON s.q >= g.threshold
    GROUP BY g.threshold
    ORDER BY g.threshold
    """,
    tags=("curation", "north-star", "quality", "sweep"),
)
def corpus_quality_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter operating-point sweep
    (``operators/curation.py:quality_threshold_sweep``): kept docs /
    kept tokens (counts and corpus fractions) for five candidate
    quality cutoffs, in ONE corpus pass -- per-doc in-row
    thresholds-passed index, a tiny idx-keyed agg, then suffix sums by
    exploding bucket rows to the thresholds they satisfy.  The oracle
    replays the same gate as a grid left-join (the semantics; the
    Spark plan is the one-pass version)."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    score = F.round(TX.quality_score(F.col("text")), 6)
    return CU.quality_threshold_sweep(
        docs, score, thresholds=(0.2, 0.35, 0.5, 0.65, 0.8)
    ).orderBy("threshold")


@register(
    "corpus_epoch_upsample",
    oracle="""
    WITH base AS (
      SELECT doc_id, source,
             0.5 + (CAST(substr(source, 4) AS INT) % 4) * 0.75 AS epochs,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
               % 10000 AS fb
      FROM documents),
    copies AS (
      SELECT doc_id, source, epochs,
             CAST(floor(epochs)
                  + CASE WHEN fb < round((epochs % 1.0) * 10000)
                         THEN 1 ELSE 0 END AS BIGINT) AS n_copies
      FROM base)
    SELECT doc_id, source, epochs,
           unnest(generate_series(1, n_copies)) AS copy_idx
    FROM copies
    WHERE n_copies >= 1
    ORDER BY doc_id, copy_idx
    """,
    tags=("curation", "north-star", "mixture", "epochs"),
)
def corpus_epoch_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fractional-epoch domain repetition
    (``operators/curation.py:epoch_upsample``): materialize a mixture
    as per-doc copies -- ``floor(e)`` guaranteed plus one more for a
    deterministic ``frac(e)`` md5 slice of the domain (epochs 0.5 /
    1.25 / 2.0 / 2.75 by source index mod 4).  Broadcast epochs join +
    in-row ``explode(sequence)``; no shuffle.  The oracle replays the
    hash slice, the copy count, and the fan-out with
    ``generate_series``."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    epochs = {f"src{i}": 0.5 + (i % 4) * 0.75 for i in range(20)}
    return CU.epoch_upsample(docs, epochs).orderBy("doc_id", "copy_idx")


@register(
    "corpus_assemble_end_to_end",
    oracle=f"""
    WITH gated AS (
      SELECT doc_id, text, source, {_TOKS} AS l
      FROM documents
      WHERE lang = 'en' AND ({_QUALITY}) >= 0.72
    ),
    ex AS (
      SELECT doc_id, source, l FROM (
        SELECT doc_id, source, l,
               min(doc_id) OVER (PARTITION BY text) AS me
        FROM gated)
      WHERE doc_id = me
    ),
    nd AS (
      SELECT doc_id, source, l FROM (
        SELECT doc_id, source, l,
               min(doc_id) OVER (PARTITION BY
                 md5(array_to_string(list_sort(list_distinct(l)), ' '))) AS mf
        FROM ex)
      WHERE doc_id = mf
    ),
    surv AS (SELECT doc_id, source, CAST(len(l) AS BIGINT) AS n_tokens FROM nd),
    pg AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS tks
           FROM surv GROUP BY source),
    tot AS (SELECT CAST(sum(tks) AS DOUBLE) AS total_tokens FROM pg),
    shr AS (SELECT source, tks / total_tokens AS token_share
            FROM pg CROSS JOIN tot),
    z AS (SELECT sum(pow(token_share, 0.3)) AS z FROM shr),
    tg AS (
      SELECT source,
             CAST(floor(8000.0 * (pow(token_share, 0.3) / z)) AS BIGINT)
               AS token_budget
      FROM shr CROSS JOIN z
    ),
    cum AS (
      SELECT doc_id, source, n_tokens,
             CAST(sum(n_tokens) OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      FROM surv
    ),
    sel AS (
      SELECT c.doc_id, c.source, c.n_tokens
      FROM cum c JOIN tg t USING (source)
      WHERE c.cum_tokens <= t.token_budget
    ),
    packed AS (
      SELECT doc_id, source, n_tokens,
             CAST((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                       ROWS UNBOUNDED PRECEDING)
                   - n_tokens) // 512 AS BIGINT) AS chunk_id
      FROM sel
    )
    SELECT doc_id, source, n_tokens, chunk_id,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
             % 4 AS shard
    FROM packed
    ORDER BY doc_id
    """,
    tags=("curation", "north-star", "pipeline", "macro"),
)
def corpus_assemble_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE training-corpus assembly as one declarative plan --
    every stage already holds its own green row; this row proves the
    composition stays a single Catalyst plan with no materialization
    between stages (the ``text_chunk_retrieval`` composition
    precedent):

      1. quality gate (lang == 'en', blended score >= 0.72 -- the
         ``corpus_curation_pipeline`` thresholds),
      2. exact-dedup survivors (min doc_id per text),
      3. near-dup survivors (min doc_id per bag-of-words fingerprint,
         ``text.fingerprint`` -- catches permutation/repetition dups
         exact dedup misses),
      4. mixture weights -> token-budget fill (temperature alpha=0.3
         shares of an 8k budget, greedy md5-order fill --
         ``curation.token_budget_sample``, which IS the
         mixture-weights stage materialized),
      5. greedy sequence packing into ~512-token chunks per source,
      6. deterministic md5 output sharding (4 shards).

    Returns the assembled-corpus manifest (doc_id, source, n_tokens,
    chunk_id, shard).  Scale shape: three narrow filters + three
    per-group windows (text / fingerprint / source partitions) + one
    domain-count broadcast -- no corpus-global sort, no driver loop;
    every shuffle key is either content-derived (dedup) or the source
    shard (fill/pack)."""
    from pyspark.sql.window import Window

    docs = parallelize_small(load(spark, sf_dir, "documents"))
    t = F.col("text")
    gated = docs.where(
        (F.col("lang") == "en") & (TX.quality_score(t) >= 0.72)
    )
    w_text = Window.partitionBy("text")
    w_fp = Window.partitionBy(TX.fingerprint(t))
    surv = (
        gated.withColumn("__me", F.min("doc_id").over(w_text))
        .where(F.col("doc_id") == F.col("__me"))
        .withColumn("__mf", F.min("doc_id").over(w_fp))
        .where(F.col("doc_id") == F.col("__mf"))
        .select("doc_id", "text", "source")
    )
    sel = CU.token_budget_sample(surv, total_tokens=8_000, alpha=0.3)
    w_pack = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return sel.select(
        "doc_id",
        "source",
        "n_tokens",
        F.floor(
            (F.sum("n_tokens").over(w_pack) - F.col("n_tokens")) / 512
        ).cast("long").alias("chunk_id"),
        CU.split_bucket("doc_id", 4).alias("shard"),
    ).orderBy("doc_id")
