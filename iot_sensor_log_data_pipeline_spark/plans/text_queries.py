"""Text-analysis catalog queries (north star: token counting, quality
scoring, language-ID, fingerprinting) over ``documents``.

Oracle discipline: every Spark expression has a DuckDB twin built from
the same operand tree (same division operands, same blend order), so
double results are bit-identical before the shared rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io_utils import load, parallelize_small
from ..operators import text as TX
from .catalog import register

#: DuckDB fragments shared by several oracles.
_TOKS = "list_filter(string_split_regex(text, ' +'), t -> t <> '')"
_NTOK = f"len({_TOKS})"
_NDIS = f"len(list_distinct({_TOKS}))"
_ALPHA = "length(regexp_replace(text, '[^a-z]', '', 'g')) / length(text)"
_STOPS = "['the', 'a', 'of', 'and', 'to', 'in', 'is']"
_MEANLEN = (
    f"list_sum(list_transform({_TOKS}, t -> CAST(length(t) AS DOUBLE)))"
    f" / greatest({_NTOK}, 1)"
)


@register(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           lang,
           {_NTOK} AS n_tokens,
           {_NDIS} AS n_distinct_tokens,
           len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_tokens,
           round({_MEANLEN}, 6) AS mean_token_len
    FROM documents
    ORDER BY doc_id
    """,
    tags=("text", "north-star"),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, distinct tokens, BPE-ish
    regex tokens, mean token length -- all JVM-side expressions."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    t = F.col("text")
    return docs.select(
        "doc_id",
        "lang",
        TX.token_count(t).alias("n_tokens"),
        TX.distinct_token_count(t).alias("n_distinct_tokens"),
        TX.bpe_ish_token_count(t).alias("n_bpe_tokens"),
        F.round(TX.mean_token_length(t), 6).alias("mean_token_len"),
    ).orderBy("doc_id")


@register(
    "text_quality_score",
    oracle=f"""
    SELECT doc_id,
           round({_ALPHA}, 6) AS alpha_ratio,
           round(len(list_filter({_TOKS}, t -> list_contains({_STOPS}, t)))
                 / greatest({_NTOK}, 1), 6) AS stopword_ratio,
           round(0.5 * ({_ALPHA})
               + 0.3 * ({_NDIS} / greatest({_NTOK}, 1))
               + 0.2 * (CASE WHEN {_MEANLEN} BETWEEN 2.0 AND 12.0
                             THEN 1.0 ELSE 0.0 END), 6) AS quality
    FROM documents
    ORDER BY doc_id
    """,
    tags=("text", "north-star"),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: alpha ratio, stopword ratio, and the blended
    [0,1] quality heuristic used for corpus filtering."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    t = F.col("text")
    return docs.select(
        "doc_id",
        F.round(TX.alpha_ratio(t), 6).alias("alpha_ratio"),
        F.round(TX.stopword_ratio(t), 6).alias("stopword_ratio"),
        F.round(TX.quality_score(t), 6).alias("quality"),
    ).orderBy("doc_id")


_LANG_SCORE = {
    lang: (
        "len(list_filter("
        + _TOKS
        + ", t -> list_contains(["
        + ", ".join(f"'{w}'" for w in markers)
        + "], t)))"
    )
    for lang, markers in TX.LANG_MARKERS.items()
}
_LANG_PAIRS = ", ".join(
    f"{{'score': CAST({_LANG_SCORE[lang]} AS BIGINT), 'lang': '{lang}'}}"
    for lang in sorted(TX.LANG_MARKERS)
)


@register(
    "text_language_id",
    oracle=f"""
    SELECT doc_id,
           lang,
           coalesce(
             list_max(list_filter([{_LANG_PAIRS}], p -> p.score > 0)).lang,
             'und') AS pred_lang
    FROM documents
    ORDER BY doc_id
    """,
    tags=("text", "north-star", "langid"),
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: argmax of per-language stopword-marker
    hit counts (struct-max gives a deterministic tiebreak)."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id", "lang", TX.predicted_language(F.col("text")).alias("pred_lang")
    ).orderBy("doc_id")


@register(
    "text_fingerprint_clusters",
    oracle=f"""
    SELECT md5(array_to_string(list_sort(list_distinct({_TOKS})), ' ')) AS fingerprint,
           count(*) AS n_docs,
           min(doc_id) AS canonical_doc
    FROM documents
    GROUP BY 1
    HAVING count(*) > 1
    ORDER BY n_docs DESC, fingerprint
    """,
    tags=("text", "north-star", "fingerprint"),
)
def text_fingerprint_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over the sorted distinct token set
    clusters docs that are permutations/repetitions of the same
    vocabulary -- the cheap first pass before MinHash."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    return (
        docs.select("doc_id", TX.fingerprint(F.col("text")).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("canonical_doc"),
        )
        .where(F.col("n_docs") > 1)
        .orderBy(F.desc("n_docs"), F.asc("fingerprint"))
    )


@register(
    "text_top_tokens",
    oracle=f"""
    SELECT w AS token, count(*) AS n
    FROM (SELECT unnest({_TOKS}) AS w FROM documents)
    GROUP BY w
    ORDER BY n DESC, token
    LIMIT 20
    """,
    tags=("text", "explode"),
)
def text_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token frequencies (explode -> count -> top-k): the UDTF-
    shaped operation (Table B: explode of array-producing expression)."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    return (
        docs.select(F.explode(TX.tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(20)
    )


@register(
    "sketch_count_min_tokens",
    oracle=f"""
    WITH tok AS (SELECT unnest({_TOKS}) AS token FROM documents),
    cnt AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
    rows_ AS (SELECT unnest(range(4)) AS row_id),
    sketch AS (
      SELECT row_id,
             CAST(('0x' || substr(md5(token || '#' || row_id), 1, 8)) AS BIGINT)
               % 1024 AS bucket,
             CAST(sum(n) AS BIGINT) AS cell_count
      FROM cnt CROSS JOIN rows_
      GROUP BY 1, 2
    ),
    top AS (SELECT token, n FROM cnt ORDER BY n DESC, token LIMIT 20),
    probe AS (
      SELECT t.token, t.n, r.row_id,
             CAST(('0x' || substr(md5(t.token || '#' || r.row_id), 1, 8)) AS BIGINT)
               % 1024 AS bucket
      FROM top t CROSS JOIN rows_ r
    )
    SELECT p.token, CAST(p.n AS BIGINT) AS exact_n,
           CAST(min(s.cell_count) AS BIGINT) AS est_n
    FROM probe p JOIN sketch s ON p.row_id = s.row_id AND p.bucket = s.bucket
    GROUP BY p.token, p.n
    ORDER BY exact_n DESC, token
    """,
    tags=("text", "sketch", "count-min"),
)
def sketch_count_min_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (4 x 1024) over the corpus token frequencies,
    probed with the 20 true heavy hitters: exact count vs sketch
    estimate side by side (the estimate can only overestimate -- the
    CMS guarantee, also asserted in pytest).  The full sketch build +
    probe replays in the DuckDB oracle, so this 'approximate' structure
    gets an EXACT correctness gate, unlike engine-internal sketches
    (agg_approx_sketches)."""
    from ..operators import sketch as SK

    docs = parallelize_small(load(spark, sf_dir, "documents"))
    cnt = (
        docs.select(F.explode(TX.tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sk = SK.cms_build(cnt, key_col="token", count_col="n")
    top = cnt.orderBy(F.desc("n"), F.asc("token")).limit(20)
    est = SK.cms_estimate(sk, top.select("token"), key_col="token")
    return (
        top.join(est, "token")
        .select("token", F.col("n").alias("exact_n"), F.col("est_count").alias("est_n"))
        .orderBy(F.desc("exact_n"), F.asc("token"))
    )


@register(
    "sketch_hll_distinct_tokens",
    oracle=f"""
    WITH tok AS (SELECT unnest({_TOKS}) AS token FROM documents),
    h AS (SELECT md5(token) AS d FROM tok),
    r AS (SELECT CAST(('0x' || substr(d, 1, 2)) AS BIGINT) AS register,
                 CAST(('0x' || substr(d, 3, 12)) AS BIGINT) AS v
          FROM h)
    SELECT register,
           CAST(max(48 - (CASE WHEN v = 0 THEN 0 ELSE length(bin(v)) END) + 1)
                AS BIGINT) AS max_rank
    FROM r GROUP BY register ORDER BY register
    """,
    tags=("text", "sketch", "hll"),
)
def sketch_hll_distinct_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog register table over the corpus token stream (fed raw
    occurrences, NOT pre-distincted -- max-aggregation absorbs
    duplicates map-side, which is the whole point of the sketch at
    scale).  The register table is integer-exact, so unlike
    engine-internal approx_count_distinct this sketch gets a full
    DuckDB oracle; the cardinality ESTIMATE derived from it is
    accuracy-tested in pytest (est within HLL error bounds of truth)."""
    from ..operators import sketch as SK

    docs = parallelize_small(load(spark, sf_dir, "documents"))
    toks = docs.select(F.explode(TX.tokens(F.col("text"))).alias("token"))
    return SK.hll_registers(toks, "token").orderBy("register")


@register(
    "sketch_heavy_hitters",
    oracle=f"""
    WITH tok AS (SELECT unnest({_TOKS}) AS token FROM documents),
    tot AS (SELECT count(*) AS n FROM tok)
    SELECT t.token,
           count(*) AS n_occurrences,
           round(count(*) * 1.0 / any_value(tot.n), 6) AS frac
    FROM tok t CROSS JOIN tot
    GROUP BY t.token
    HAVING count(*) >= ceil(0.034 * any_value(tot.n))
    ORDER BY n_occurrences DESC, token
    """,
    tags=("text", "sketch", "heavy-hitters"),
)
def sketch_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT phi=3.4% heavy-hitter tokens, computed sketch-first:
    per-partition Misra-Gries summaries (mapInPandas, <= k rows out per
    task) nominate candidates, a broadcast-semi-join recount verifies
    -- so the result equals the plain GROUP BY .. HAVING the oracle
    runs, but the only full-width shuffle is over candidate keys.  At
    this sf the corpus vocabulary fits under k (the sketch never
    decrements); the decrement path and the n/(k+1) error bound are
    pinned by skewed-fixture pytests where distinct keys >> k."""
    from ..operators import sketch as SK

    docs = parallelize_small(load(spark, sf_dir, "documents"))
    toks = docs.select(F.explode(TX.tokens(F.col("text"))).alias("token"))
    hh = SK.heavy_hitters(toks, key_col="token", phi=0.034, k=64)
    return hh.orderBy(F.desc("n_occurrences"), F.asc("token"))


_BM25_TERMS = ("spark", "join", "window")
_BM25_K1, _BM25_B = 1.2, 0.75
_BM25_TF = {
    i: f"len(list_filter({_TOKS}, x -> x = '{t}'))" for i, t in enumerate(_BM25_TERMS)
}
_BM25_SCORE = " + ".join(
    f"ln(1.0 + (n - df{i} + 0.5) / (df{i} + 0.5))"
    f" * (CAST(tf{i} AS DOUBLE) * {_BM25_K1 + 1.0!r}"
    f" / (CAST(tf{i} AS DOUBLE) + {_BM25_K1!r} * ({1.0 - _BM25_B!r}"
    f" + {_BM25_B!r} * dl / avgdl)))"
    for i in range(len(_BM25_TERMS))
)


#: Shared by ``text_bm25_search`` and its persisted-index twin: the
#: index-backed probe reproduces the scan-side score term-for-term
#: (identity asserted in pytest), so both rows replay the same SQL.
_BM25_ORACLE = f"""
    WITH base AS (
      SELECT doc_id,
             {_NTOK} AS dl,
             {", ".join(f"{sql} AS tf{i}" for i, sql in _BM25_TF.items())}
      FROM documents
    ),
    stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             avg(dl) AS avgdl,
             {", ".join(f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df{i}" for i in _BM25_TF)}
      FROM base
    )
    SELECT doc_id, bm25
    FROM (SELECT doc_id, round({_BM25_SCORE}, 6) AS bm25
          FROM base CROSS JOIN stats)
    WHERE bm25 > 0
    ORDER BY bm25 DESC, doc_id
    LIMIT 15
    """


@register(
    "text_bm25_search",
    oracle=_BM25_ORACLE,
    tags=("text", "north-star", "retrieval"),
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval for a fixed query-term bag: one codegen'd
    scan computes per-term frequencies as columns (no explode), corpus
    stats are a single broadcast 1-row aggregate, top-k is
    TakeOrderedAndProject (``operators/text.py:bm25_rank``)."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    return TX.bm25_rank(docs, _BM25_TERMS, k=15, k1=_BM25_K1, b=_BM25_B)


#: Shared by ``text_bm25_prf_search`` and its persisted-index twin:
#: the index-resident probe reproduces every stage (feedback ranking,
#: relevance model, interpolated re-score) number-for-number from the
#: postings/doclens tables (identity asserted in pytest), so both rows
#: replay the same SQL -- the ``_BM25_ORACLE`` convention.
_BM25_PRF_ORACLE = f"""
    WITH base AS (
      SELECT doc_id,
             {_NTOK} AS dl,
             {", ".join(f"{sql} AS tf{i}" for i, sql in _BM25_TF.items())}
      FROM documents
    ),
    stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             avg(dl) AS avgdl,
             {", ".join(f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df{i}" for i in _BM25_TF)}
      FROM base
    ),
    fb AS (
      SELECT doc_id, bm25
      FROM (SELECT doc_id, round({_BM25_SCORE}, 6) AS bm25
            FROM base CROSS JOIN stats)
      WHERE bm25 > 0
      ORDER BY bm25 DESC, doc_id
      LIMIT 5
    ),
    fbtok AS (
      SELECT d.doc_id, f.bm25, len({_TOKS}) AS dl, unnest({_TOKS}) AS term
      FROM documents d JOIN fb f USING (doc_id)
    ),
    per AS (
      SELECT term, doc_id, count(*) AS tf,
             min(bm25) AS bm25, min(dl) AS dl
      FROM fbtok GROUP BY term, doc_id
    ),
    wsum AS (SELECT sum(bm25) AS ws FROM fb),
    pr AS (
      SELECT term,
             round(sum(bm25 * tf / dl) / (SELECT ws FROM wsum), 9) AS p_rm
      FROM per GROUP BY term
    ),
    expansion AS (
      SELECT term, p_rm FROM pr
      WHERE term NOT IN ({", ".join(f"'{t}'" for t in _BM25_TERMS)})
      ORDER BY p_rm DESC, term LIMIT 5
    ),
    z AS (SELECT sum(p_rm) AS z FROM expansion),
    qmodel AS (
      SELECT term, 0.5 / {len(_BM25_TERMS)} AS w
      FROM (VALUES {", ".join(f"('{t}')" for t in _BM25_TERMS)}) t(term)
      UNION ALL
      SELECT term, round(0.5 * p_rm / (SELECT z FROM z), 9) AS w
      FROM expansion
    ),
    tok2 AS (
      SELECT doc_id, {_NTOK} AS dl, unnest({_TOKS}) AS term FROM documents
    ),
    tf2 AS (
      SELECT t.doc_id, t.term,
             CAST(count(*) AS DOUBLE) AS tf,
             min(t.dl) AS dl, min(q.w) AS w
      FROM tok2 t JOIN qmodel q USING (term)
      GROUP BY t.doc_id, t.term
    ),
    df2 AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf2 GROUP BY term),
    stats2 AS (
      SELECT CAST(count(*) AS DOUBLE) AS n, avg({_NTOK}) AS avgdl
      FROM documents
    ),
    scored AS (
      SELECT tf2.doc_id,
             tf2.w * ln(1.0 + (s2.n - d2.df + 0.5) / (d2.df + 0.5))
                   * (tf2.tf * {_BM25_K1 + 1.0!r}
                      / (tf2.tf + {_BM25_K1!r} * ({1.0 - _BM25_B!r}
                         + {_BM25_B!r} * tf2.dl / s2.avgdl))) AS s
      FROM tf2 JOIN df2 d2 USING (term) CROSS JOIN stats2 s2
    )
    SELECT doc_id, prf_score
    FROM (SELECT doc_id, round(sum(s), 6) AS prf_score
          FROM scored GROUP BY doc_id)
    WHERE prf_score > 0
    ORDER BY prf_score DESC, doc_id
    LIMIT 10
    """


@register(
    "text_bm25_prf_search",
    oracle=_BM25_PRF_ORACLE,
    tags=("text", "north-star", "retrieval", "prf", "rm3"),
)
def text_bm25_prf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RM3 pseudo-relevance feedback
    (``operators/text.py:bm25_prf_rank``): rank with the original
    terms, mine expansion terms from the top-5 docs' relevance model
    P(w|R), and re-score the corpus with the interpolated weighted
    query -- documents matching the TOPIC of the top results rank
    even when they miss the literal query words.  Stage 1 is the
    single-scan bm25_rank; the re-score is one token explode pruned
    at the scan by the broadcast 8-row query model; every sum that
    feeds a ranking decision is bounded (fb_k or n_expand addends)
    and rounded before use."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    return TX.bm25_prf_rank(
        docs, _BM25_TERMS, fb_k=5, n_expand=5, alpha=0.5, k=10,
        k1=_BM25_K1, b=_BM25_B,
    )


@register(
    "text_bm25_prf_persisted",
    oracle=_BM25_PRF_ORACLE,
    tags=("text", "north-star", "retrieval", "prf", "rm3",
          "persisted-index"),
)
def text_bm25_prf_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RM3 feedback loop served from the PERSISTED inverted index
    (``operators/text_index.py:query_text_index_prf``) -- the last
    ad-hoc-only text serving operator composed onto its index (the
    ``text_hybrid_rrf_persisted`` pattern): stage-1 BM25 is the
    term-pruned postings probe, the relevance model P(w|R) reads the
    fb_k feedback docs' postings rows (postings ARE the
    tokenization), and the interpolated 8-term query model re-scores
    via a second term-pruned postings scan + doclens join -- no stage
    re-tokenizes the corpus.  Result-identical to
    ``text_bm25_prf_search`` (probe==ad-hoc parity pytest), so both
    rows share one oracle."""
    import os as _os

    from ..io_utils import scratch_dir
    from ..operators import text_index as TI

    docs = parallelize_small(load(spark, sf_dir, "documents"))
    sf_name = _os.path.basename(sf_dir.rstrip("/")) or "corpus"
    troot = scratch_dir("text_index", sf_name)
    TI.build_text_index(docs, troot)
    return TI.query_text_index_prf(
        spark, troot, _BM25_TERMS, fb_k=5, n_expand=5, alpha=0.5, k=10,
        k1=_BM25_K1, b=_BM25_B,
    )


#: Fixed 3-query batch for the batched-probe row: distinct common
#: corpus terms per query, no duplicates (term-bag multiplicity is
#: pinned separately in pytest).
_BM25_BATCH_QUERIES: tuple[tuple[str, ...], ...] = (
    ("spark", "join", "window"),
    ("hash", "merge", "sort"),
    ("filter", "scan", "batch"),
)

_BM25_BATCH_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, {_NTOK} AS dl, unnest({_TOKS}) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf,
             any_value(dl) AS dl
      FROM toks GROUP BY doc_id, term
    ),
    stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n, avg({_NTOK}) AS avgdl
      FROM documents
    ),
    dfs AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
    q(query_id, term) AS (VALUES {", ".join(
        f"(CAST({qid} AS BIGINT), '{t}')"
        for qid, terms in enumerate(_BM25_BATCH_QUERIES)
        for t in terms
    )}),
    scored AS (
      SELECT q.query_id, tf.doc_id,
             round(sum(
               1.0
               * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
               * (tf.tf * {_BM25_K1 + 1.0!r}
                  / (tf.tf + {_BM25_K1!r} * ({1.0 - _BM25_B!r}
                     + {_BM25_B!r} * tf.dl / s.avgdl)))
             ), 6) AS bm25
      FROM q
      JOIN tf USING (term)
      JOIN dfs d USING (term)
      CROSS JOIN stats s
      GROUP BY q.query_id, tf.doc_id
    ),
    pos AS (SELECT * FROM scored WHERE bm25 > 0)
    SELECT query_id, doc_id, bm25, rank
    FROM (SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS rank
          FROM pos)
    WHERE rank <= 10
    ORDER BY query_id, rank
    """


@register(
    "text_bm25_batch_persisted",
    oracle=_BM25_BATCH_ORACLE,
    tags=("text", "north-star", "retrieval", "persisted-index", "batch"),
)
def text_bm25_batch_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 for a BATCH of queries served from the persisted inverted
    index in ONE distributed plan
    (``operators/text_index.py:query_text_index_batch``) -- the
    amortized serving shape: N queries share one term-pruned postings
    scan, document frequencies are a distributed aggregate joined back
    broadcast (nothing per-query reaches the driver), and per-query
    top-k is one partitioned window.  At 100 TB this is how a search
    tier actually runs: batching the request stream divides Spark's
    per-job overhead by the batch size (measured as
    ``text_probe_batch50`` in the bench's persisted_index_sec)."""
    import os as _os

    from ..io_utils import scratch_dir
    from ..operators import text_index as TI

    docs = parallelize_small(load(spark, sf_dir, "documents"))
    sf_name = _os.path.basename(sf_dir.rstrip("/")) or "corpus"
    troot = scratch_dir("text_index", sf_name)
    TI.build_text_index(docs, troot)
    qdf = spark.createDataFrame(
        [
            (qid, t)
            for qid, terms in enumerate(_BM25_BATCH_QUERIES)
            for t in terms
        ],
        "query_id long, term string",
    )
    return TI.query_text_index_batch(
        spark, troot, qdf, k=10, k1=_BM25_K1, b=_BM25_B
    ).orderBy("query_id", "rank")


def _bm25_prf_batch_oracle(allow_pred: str | None = None) -> str:
    """Batched RM3 oracle builder: the ``_BM25_BATCH_ORACLE`` stage-1
    machinery, then per-query relevance models / expansion windows /
    interpolated re-score -- the ``_BM25_PRF_ORACLE`` pipeline
    generalized over a (query_id, term) VALUES table.  Constants:
    fb_k=5, n_expand=5, alpha=0.5, k=10, k1/b shared.

    ``allow_pred`` (round 14): optional SQL predicate over
    ``documents`` defining the retrieval allow-list.  It narrows the
    stage-1 scored set AND the re-score exactly where the engine's
    ``query_text_index_prf_batch(allowed=...)`` semi-joins, while
    dfs1/dfs2/stats stay corpus-global -- the family's Lucene
    filtered-query convention replayed in SQL."""
    allow_cte = (
        f"allow AS (SELECT doc_id FROM documents WHERE {allow_pred}),"
        if allow_pred
        else ""
    )
    allow_join = (
        " JOIN allow USING (doc_id)" if allow_pred else ""
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, {_NTOK} AS dl, unnest({_TOKS}) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf,
             any_value(dl) AS dl
      FROM toks GROUP BY doc_id, term
    ),
    stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n, avg({_NTOK}) AS avgdl
      FROM documents
    ),
    {allow_cte}
    q(query_id, term) AS (VALUES {", ".join(
        f"(CAST({qid} AS BIGINT), '{t}')"
        for qid, terms in enumerate(_BM25_BATCH_QUERIES)
        for t in terms
    )}),
    qsize AS (
      SELECT query_id, CAST(count(*) AS DOUBLE) AS nq FROM q GROUP BY query_id
    ),
    dfs1 AS (
      SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf
      WHERE term IN (SELECT term FROM q) GROUP BY term
    ),
    s1 AS (
      SELECT q.query_id, tf.doc_id,
             round(sum(
               1.0
               * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
               * (tf.tf * {_BM25_K1 + 1.0!r}
                  / (tf.tf + {_BM25_K1!r} * ({1.0 - _BM25_B!r}
                     + {_BM25_B!r} * tf.dl / s.avgdl)))
             ), 6) AS bm25
      FROM q JOIN tf USING (term) JOIN dfs1 d USING (term){allow_join}
      CROSS JOIN stats s
      GROUP BY q.query_id, tf.doc_id
    ),
    fb AS (
      SELECT query_id, doc_id, bm25 FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY bm25 DESC, doc_id) AS rn
        FROM s1 WHERE bm25 > 0)
      WHERE rn <= 5
    ),
    ws AS (SELECT query_id, sum(bm25) AS ws FROM fb GROUP BY query_id),
    pr AS (
      SELECT fb.query_id, tf.term,
             round(sum(fb.bm25 * tf.tf / tf.dl) / any_value(w.ws), 9) AS p_rm
      FROM fb
      JOIN tf ON tf.doc_id = fb.doc_id
      JOIN ws w ON w.query_id = fb.query_id
      GROUP BY fb.query_id, tf.term
    ),
    exp AS (
      SELECT query_id, term, p_rm FROM (
        SELECT pr.*, row_number() OVER (PARTITION BY pr.query_id
                                        ORDER BY pr.p_rm DESC, pr.term) AS rn
        FROM pr
        WHERE NOT EXISTS (SELECT 1 FROM q
                          WHERE q.query_id = pr.query_id
                            AND q.term = pr.term))
      WHERE rn <= 5
    ),
    z AS (SELECT query_id, sum(p_rm) AS z FROM exp GROUP BY query_id),
    model AS (
      SELECT q.query_id, q.term, 0.5 / qs.nq AS w
      FROM q JOIN qsize qs USING (query_id)
      UNION ALL
      SELECT e.query_id, e.term, round(0.5 * e.p_rm / z.z, 9) AS w
      FROM exp e JOIN z USING (query_id) WHERE z.z > 0
    ),
    dfs2 AS (
      SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf
      WHERE term IN (SELECT DISTINCT term FROM model) GROUP BY term
    ),
    scored AS (
      SELECT m.query_id, tf.doc_id,
             round(sum(
               m.w
               * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
               * (tf.tf * {_BM25_K1 + 1.0!r}
                  / (tf.tf + {_BM25_K1!r} * ({1.0 - _BM25_B!r}
                     + {_BM25_B!r} * tf.dl / s.avgdl)))
             ), 6) AS prf_score
      FROM model m JOIN tf USING (term) JOIN dfs2 d USING (term){allow_join}
      CROSS JOIN stats s
      GROUP BY m.query_id, tf.doc_id
    ),
    pos AS (SELECT * FROM scored WHERE prf_score > 0)
    SELECT query_id, doc_id, prf_score, rank
    FROM (SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY prf_score DESC, doc_id) AS rank
          FROM pos)
    WHERE rank <= 10
    ORDER BY query_id, rank
    """


_BM25_PRF_BATCH_ORACLE = _bm25_prf_batch_oracle()


@register(
    "text_bm25_prf_batch_persisted",
    oracle=_BM25_PRF_BATCH_ORACLE,
    tags=("text", "north-star", "retrieval", "prf", "rm3",
          "persisted-index", "batch"),
)
def text_bm25_prf_batch_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RM3 feedback loop for a BATCH of queries in one distributed
    plan off the persisted index
    (``operators/text_index.py:query_text_index_prf_batch``): stage-1
    BM25 ranks every query's feedback docs through one postings scan,
    per-query relevance models are a (query_id, term) aggregate over
    the feedback docs' postings rows, expansion selection and final
    top-k are partitioned windows, and the interpolated re-score is a
    second term-pruned scan -- NOTHING per-query touches the driver,
    unlike the single-query probe whose model assembly is a driver
    round-trip per request.  At 100 TB this is the difference between
    a serving tier that scales with executors and one that serializes
    on the driver."""
    import os as _os

    from ..io_utils import scratch_dir
    from ..operators import text_index as TI

    docs = parallelize_small(load(spark, sf_dir, "documents"))
    sf_name = _os.path.basename(sf_dir.rstrip("/")) or "corpus"
    troot = scratch_dir("text_index", sf_name)
    TI.build_text_index(docs, troot)
    qdf = spark.createDataFrame(
        [
            (qid, t)
            for qid, terms in enumerate(_BM25_BATCH_QUERIES)
            for t in terms
        ],
        "query_id long, term string",
    )
    return TI.query_text_index_prf_batch(
        spark, troot, qdf, fb_k=5, n_expand=5, alpha=0.5, k=10,
        k1=_BM25_K1, b=_BM25_B,
    ).orderBy("query_id", "rank")


@register(
    "text_bm25_prf_batch_filtered",
    oracle=_bm25_prf_batch_oracle("lang = 'en'"),
    tags=("text", "north-star", "retrieval", "prf", "rm3",
          "persisted-index", "batch", "filtered"),
)
def text_bm25_prf_batch_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-FILTERED batched RM3 off the persisted index (round
    14): ``query_text_index_prf_batch(allowed=...)`` with the
    allow-list = English documents -- the retrieval shape a curation
    pipeline actually serves ("expand and re-rank, but only within
    this language/source/license slice").  Family contract
    (``operators/text_index.py``): the allow-list narrows stage-1
    feedback ranking AND the re-score by broadcast LEFT SEMI joins
    while df / N / avgdl stay corpus-global (Lucene filtered-query
    convention), so a doc scores identically filtered and unfiltered
    and the filter is a candidate-set restriction, not a re-weight.
    At 100 TB the allow-list rides broadcast when it is a slice key
    (here: a 1-column projection of the corpus), and the probe's cost
    model is unchanged -- one term-pruned postings scan either way."""
    import os as _os

    from ..io_utils import scratch_dir
    from ..operators import text_index as TI

    docs = parallelize_small(load(spark, sf_dir, "documents"))
    sf_name = _os.path.basename(sf_dir.rstrip("/")) or "corpus"
    troot = scratch_dir("text_index", sf_name)
    TI.build_text_index(docs, troot)
    qdf = spark.createDataFrame(
        [
            (qid, t)
            for qid, terms in enumerate(_BM25_BATCH_QUERIES)
            for t in terms
        ],
        "query_id long, term string",
    )
    allowed = docs.where(F.col("lang") == "en").select("doc_id")
    return TI.query_text_index_prf_batch(
        spark, troot, qdf, fb_k=5, n_expand=5, alpha=0.5, k=10,
        k1=_BM25_K1, b=_BM25_B, allowed=allowed,
    ).orderBy("query_id", "rank")


_RRF_QUERY_TEXT = " ".join(_BM25_TERMS)
_HASH_CELLS = """
      SELECT {key} CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 64 AS idx,
             CASE WHEN CAST(('0x' || substr(md5(t), 9, 1)) AS BIGINT) % 2 = 0
                  THEN 1.0 ELSE -1.0 END AS s
      FROM {src}
"""


def _hybrid_rrf_oracle() -> str:
    from .similarity_queries import _DOT, _NORM

    cos = (
        _DOT.format(d=64, a="q.qv", b="d.v")
        + " / ("
        + _NORM.format(d=64, a="q.qv")
        + " * "
        + _NORM.format(d=64, a="d.v")
        + ")"
    )
    q_values = ", ".join(f"('{t}')" for t in _BM25_TERMS)
    return f"""
    WITH base AS (
      SELECT doc_id,
             {_NTOK} AS dl,
             {", ".join(f"{sql} AS tf{i}" for i, sql in _BM25_TF.items())}
      FROM documents
    ),
    stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             avg(dl) AS avgdl,
             {", ".join(f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df{i}" for i in _BM25_TF)}
      FROM base
    ),
    sparse AS (
      SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r
      FROM (SELECT doc_id, round({_BM25_SCORE}, 6) AS bm25
            FROM base CROSS JOIN stats)
      WHERE bm25 > 0
    ),
    tok AS (SELECT doc_id, unnest({_TOKS}) AS t FROM documents),
    cells0 AS ({_HASH_CELLS.format(key="doc_id,", src="tok")}),
    cells AS (SELECT doc_id, idx, sum(s) AS val FROM cells0
              GROUP BY doc_id, idx),
    docs_with AS (
      SELECT doc_id FROM cells GROUP BY doc_id
      HAVING sum(CASE WHEN val <> 0 THEN 1 ELSE 0 END) > 0
    ),
    dvec AS (
      SELECT g.doc_id, list(coalesce(c.val, 0.0) ORDER BY g.d) AS v
      FROM (SELECT doc_id, d FROM docs_with CROSS JOIN range(64) t(d)) g
      LEFT JOIN cells c ON c.doc_id = g.doc_id AND c.idx = g.d
      GROUP BY g.doc_id
    ),
    qtok AS (SELECT t FROM (VALUES {q_values}) qt(t)),
    qcells0 AS ({_HASH_CELLS.format(key="", src="qtok")}),
    qcells AS (SELECT idx, sum(s) AS val FROM qcells0 GROUP BY idx),
    qvec AS (
      SELECT list(coalesce(qc.val, 0.0) ORDER BY g.d) AS qv
      FROM range(64) g(d) LEFT JOIN qcells qc ON qc.idx = g.d
    ),
    dense AS (
      SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id) AS r
      FROM (SELECT d.doc_id, {cos} AS cos FROM dvec d CROSS JOIN qvec q)
    ),
    contrib AS (
      SELECT doc_id, 1.0 / (60 + r) AS c FROM sparse WHERE r <= 15
      UNION ALL
      SELECT doc_id, 1.0 / (60 + r) AS c FROM dense WHERE r <= 15
    )
    SELECT doc_id, round(sum(c), 6) AS rrf_score,
           CAST(count(*) AS BIGINT) AS n_sources
    FROM contrib GROUP BY doc_id
    ORDER BY rrf_score DESC, doc_id
    LIMIT 10
    """


@register(
    "text_hybrid_rrf_search",
    oracle=_hybrid_rrf_oracle(),
    tags=("text", "north-star", "retrieval", "rag", "similarity"),
)
def text_hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval (``operators/text.py:rrf_fuse``): BM25 top-15
    for the fixed term bag FUSED with dense top-15 (hash-embedding
    cosine for the same query text) by reciprocal-rank fusion --
    score = sum of 1/(60 + rank), the calibration-free combiner
    production RAG stacks run because sparse and dense scores are not
    comparable but ranks are.  Both retrievers already hold their own
    oracle-checked rows (text_bm25_search, text_hash_embedding /
    similarity_topk_cosine); this row proves the COMPOSITION --
    ranking, union, fusion arithmetic, agreement counts -- replays in
    one SQL statement.  The fuse itself touches only the two bounded
    top-k lists; n_sources = 2 marks docs both retrievers agree on."""
    from pyspark.sql.window import Window

    from ..operators.similarity import brute_force_topk

    docs = parallelize_small(load(spark, sf_dir, "documents"))
    sparse = TX.bm25_rank(docs, _BM25_TERMS, k=15, k1=_BM25_K1, b=_BM25_B)
    # Bounded-input global rank: the window runs over <= 15 rows by
    # construction (post-limit), so the single-task window is correct
    # -- the lit(1) partition key states that to the plan audit.
    w = Window.partitionBy(F.lit(1)).orderBy(F.desc("bm25"), F.asc("doc_id"))
    sparse = sparse.withColumn("rank", F.row_number().over(w)).select(
        "doc_id", "rank"
    )
    demb = TX.hash_embedding(docs, dim=64)
    qemb = TX.hash_embedding(
        spark.createDataFrame(
            [(-1, _RRF_QUERY_TEXT)], "doc_id long, text string"
        ),
        dim=64,
    )
    dense = brute_force_topk(
        demb, qemb, k=15, id_col="doc_id", vec_col="embedding"
    ).select(F.col("neighbor_id").alias("doc_id"), "rank")
    return TX.rrf_fuse([sparse, dense], k=10)


def _hybrid_rrf_persisted_ctes() -> str:
    """WITH-body (through the ``contrib`` CTE) of the persisted
    hybrid serving replay -- shared by ``text_hybrid_rrf_persisted``
    and the end-to-end RAG context macro, which extends it with the
    MMR diversification stage."""
    from .similarity_queries import _DOT, _NORM

    cos = (
        _DOT.format(d=64, a="q.qv", b="d.v")
        + " / ("
        + _NORM.format(d=64, a="q.qv")
        + " * "
        + _NORM.format(d=64, a="d.v")
        + ")"
    )
    q_values = ", ".join(f"('{t}')" for t in _BM25_TERMS)
    return f"""
    base AS (
      SELECT doc_id,
             {_NTOK} AS dl,
             {", ".join(f"{sql} AS tf{i}" for i, sql in _BM25_TF.items())}
      FROM documents
    ),
    stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             avg(dl) AS avgdl,
             {", ".join(f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df{i}" for i in _BM25_TF)}
      FROM base
    ),
    sparse AS (
      SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r
      FROM (SELECT doc_id, round({_BM25_SCORE}, 6) AS bm25
            FROM base CROSS JOIN stats)
      WHERE bm25 > 0
    ),
    tok AS (SELECT doc_id, unnest({_TOKS}) AS t FROM documents),
    cells0 AS ({_HASH_CELLS.format(key="doc_id,", src="tok")}),
    cells AS (SELECT doc_id, idx, sum(s) AS val FROM cells0
              GROUP BY doc_id, idx),
    docs_with AS (
      SELECT doc_id FROM cells GROUP BY doc_id
      HAVING sum(CASE WHEN val <> 0 THEN 1 ELSE 0 END) > 0
    ),
    dvec AS (
      SELECT g.doc_id, list(coalesce(c.val, 0.0) ORDER BY g.d) AS v
      FROM (SELECT doc_id, d FROM docs_with CROSS JOIN range(64) t(d)) g
      LEFT JOIN cells c ON c.doc_id = g.doc_id AND c.idx = g.d
      GROUP BY g.doc_id
    ),
    qtok AS (SELECT t FROM (VALUES {q_values}) qt(t)),
    qcells0 AS ({_HASH_CELLS.format(key="", src="qtok")}),
    qcells AS (SELECT idx, sum(s) AS val FROM qcells0 GROUP BY idx),
    qvec AS (
      SELECT list(coalesce(qc.val, 0.0) ORDER BY g.d) AS qv
      FROM range(64) g(d) LEFT JOIN qcells qc ON qc.idx = g.d
    ),
    plane_vals AS (
      SELECT j, d,
             CAST(('0x' || substr(md5('plane:' || j || ':' || d), 1, 8)) AS BIGINT)
               / 2147483648.0 - 1.0 AS w
      FROM range(64) t1(j) CROSS JOIN range(64) t2(d)
    ),
    planes AS (
      SELECT j, list(w ORDER BY d) AS wv FROM plane_vals GROUP BY j
    ),
    dsig AS (
      SELECT d.doc_id, p.j,
             CASE WHEN list_sum(list_transform(range(64),
                 i -> CAST(d.v[i+1] AS DOUBLE) * p.wv[i+1])) >= 0
                  THEN '1' ELSE '0' END AS bit
      FROM dvec d CROSS JOIN planes p
    ),
    dbands AS (
      SELECT doc_id, j // 4 AS band_id,
             string_agg(bit, '' ORDER BY j) AS bucket
      FROM dsig GROUP BY doc_id, j // 4
    ),
    qsig AS (
      SELECT p.j,
             CASE WHEN list_sum(list_transform(range(64),
                 i -> CAST(q.qv[i+1] AS DOUBLE) * p.wv[i+1])) >= 0
                  THEN '1' ELSE '0' END AS bit
      FROM qvec q CROSS JOIN planes p
    ),
    qbands AS (
      SELECT j // 4 AS band_id, string_agg(bit, '' ORDER BY j) AS bucket
      FROM qsig GROUP BY j // 4
    ),
    lcand AS (
      SELECT DISTINCT c.doc_id
      FROM dbands c JOIN qbands q USING (band_id, bucket)
    ),
    dense AS (
      SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id) AS r
      FROM (SELECT d.doc_id, {cos} AS cos
            FROM lcand JOIN dvec d USING (doc_id) CROSS JOIN qvec q)
    ),
    contrib AS (
      SELECT doc_id, 1.0 / (60 + r) AS c FROM sparse WHERE r <= 15
      UNION ALL
      SELECT doc_id, 1.0 / (60 + r) AS c FROM dense WHERE r <= 15
    )
    """


def _hybrid_rrf_persisted_oracle() -> str:
    """Stage-for-stage replay of the PERSISTED hybrid serving path:
    the sparse/dvec/qvec CTEs are those of ``_hybrid_rrf_oracle``;
    the dense retriever replays the SRP-LSH probe (md5-derived plane
    matrix, sign bits, 16x4 band buckets, bucket-join candidates,
    exact cosine re-rank -- the ``_LSH_ANN_ORACLE`` machinery) over
    the hash-embedded documents instead of brute force."""
    return f"""
    WITH {_hybrid_rrf_persisted_ctes()}
    SELECT doc_id, round(sum(c), 6) AS rrf_score,
           CAST(count(*) AS BIGINT) AS n_sources
    FROM contrib GROUP BY doc_id
    ORDER BY rrf_score DESC, doc_id
    LIMIT 10
    """


@register(
    "text_hybrid_rrf_persisted",
    oracle=_hybrid_rrf_persisted_oracle(),
    tags=("text", "north-star", "retrieval", "rag", "similarity",
          "persisted-index"),
)
def text_hybrid_rrf_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hybrid serving READ path, build-once / probe-many: BM25
    top-15 probed from the PERSISTED inverted index
    (``operators/text_index.py:query_text_index``) fused by
    reciprocal ranks with dense top-15 probed from a PERSISTED
    SRP-LSH index over the documents' hash embeddings
    (``operators/ann_index.py:query_lsh_index``, 16 bands x 4
    md5-derived hyperplanes).  ``text_hybrid_rrf_search`` proved the
    fusion over AD-HOC retrievers; this row replaces both with index
    probes -- the production RAG stack shape, where the corpus-scale
    passes happened once at build time and each query costs a
    term-pruned postings read plus a band-bucket candidate join.
    Probe==ad-hoc identities exist per retriever (pytest), so the
    oracle replays BM25 + SRP banding + cosine re-rank + fusion
    stage-for-stage in one SQL statement."""
    sparse, dense, _lroot, _qemb = _hybrid_persisted_probes(spark, sf_dir)
    return TX.rrf_fuse([sparse, dense], k=10)


def _hybrid_rrf_batch_persisted_ctes(allow_pred: str | None = None) -> str:
    """WITH-body (through the ``fused`` CTE) of the BATCHED persisted
    hybrid replay, generalized over a (query_id, term) VALUES table:
    batch BM25 ranks (the ``_BM25_BATCH_ORACLE`` machinery at k=15),
    per-query hash embeddings + SRP-LSH banding + bucket-join
    candidates + exact cosine re-rank (the
    ``_hybrid_rrf_persisted_ctes`` machinery keyed by query_id), and
    per-query reciprocal-rank contributions.  Shared by the batched
    hybrid rows and the batched RAG context macro, which extends it
    with the per-query MMR diversification stage (the same
    single-query -> batch factoring as ``_hybrid_rrf_persisted_ctes``
    vs ``_rag_context_oracle``).

    ``allow_pred`` (round 14): optional SQL predicate over
    ``documents`` defining the retrieval allow-list, applied exactly
    where the engine's filtered probes semi-join -- the sparse
    stage-1 scored set (df/N/avgdl stay corpus-global, the
    ``query_text_index_batch`` contract) and the dense band-bucket
    candidate set BEFORE the cosine re-rank (the ``query_lsh_index``
    contract: ranks are computed over the filtered candidates)."""
    from .similarity_queries import _DOT, _NORM

    allow_cte = (
        f"allow AS (SELECT doc_id FROM documents WHERE {allow_pred}),"
        if allow_pred
        else ""
    )
    allow_join = " JOIN allow USING (doc_id)" if allow_pred else ""

    cos = (
        _DOT.format(d=64, a="qv2.qv", b="d.v")
        + " / ("
        + _NORM.format(d=64, a="qv2.qv")
        + " * "
        + _NORM.format(d=64, a="d.v")
        + ")"
    )
    q_values = ", ".join(
        f"(CAST({qid} AS BIGINT), '{t}')"
        for qid, terms in enumerate(_BM25_BATCH_QUERIES)
        for t in terms
    )
    return f"""q(query_id, term) AS (VALUES {q_values}),
    {allow_cte}
    toksb AS (
      SELECT doc_id, {_NTOK} AS dl, unnest({_TOKS}) AS term
      FROM documents
    ),
    tfb AS (
      SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf,
             any_value(dl) AS dl
      FROM toksb GROUP BY doc_id, term
    ),
    statsb AS (
      SELECT CAST(count(*) AS DOUBLE) AS n, avg({_NTOK}) AS avgdl
      FROM documents
    ),
    dfsb AS (
      SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tfb
      WHERE term IN (SELECT term FROM q) GROUP BY term
    ),
    sb1 AS (
      SELECT q.query_id, tfb.doc_id,
             round(sum(
               1.0
               * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
               * (tfb.tf * {_BM25_K1 + 1.0!r}
                  / (tfb.tf + {_BM25_K1!r} * ({1.0 - _BM25_B!r}
                     + {_BM25_B!r} * tfb.dl / s.avgdl)))
             ), 6) AS bm25
      FROM q JOIN tfb USING (term) JOIN dfsb d USING (term){allow_join}
      CROSS JOIN statsb s
      GROUP BY q.query_id, tfb.doc_id
    ),
    sparse AS (
      SELECT query_id, doc_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY bm25 DESC, doc_id) AS r
      FROM sb1 WHERE bm25 > 0
    ),
    tok AS (SELECT doc_id, unnest({_TOKS}) AS t FROM documents),
    cells0 AS ({_HASH_CELLS.format(key="doc_id,", src="tok")}),
    cells AS (SELECT doc_id, idx, sum(s) AS val FROM cells0
              GROUP BY doc_id, idx),
    docs_with AS (
      SELECT doc_id FROM cells GROUP BY doc_id
      HAVING sum(CASE WHEN val <> 0 THEN 1 ELSE 0 END) > 0
    ),
    dvec AS (
      SELECT g.doc_id, list(coalesce(c.val, 0.0) ORDER BY g.d) AS v
      FROM (SELECT doc_id, d FROM docs_with CROSS JOIN range(64) t(d)) g
      LEFT JOIN cells c ON c.doc_id = g.doc_id AND c.idx = g.d
      GROUP BY g.doc_id
    ),
    qtok AS (SELECT query_id, term AS t FROM q),
    qcells0 AS ({_HASH_CELLS.format(key="query_id,", src="qtok")}),
    qcells AS (SELECT query_id, idx, sum(s) AS val FROM qcells0
               GROUP BY query_id, idx),
    qvec AS (
      SELECT g.query_id, list(coalesce(qc.val, 0.0) ORDER BY g.d) AS qv
      FROM (SELECT DISTINCT query_id, d
            FROM q CROSS JOIN range(64) r(d)) g
      LEFT JOIN qcells qc ON qc.query_id = g.query_id AND qc.idx = g.d
      GROUP BY g.query_id
    ),
    plane_vals AS (
      SELECT j, d,
             CAST(('0x' || substr(md5('plane:' || j || ':' || d), 1, 8)) AS BIGINT)
               / 2147483648.0 - 1.0 AS w
      FROM range(64) t1(j) CROSS JOIN range(64) t2(d)
    ),
    planes AS (
      SELECT j, list(w ORDER BY d) AS wv FROM plane_vals GROUP BY j
    ),
    dsig AS (
      SELECT d.doc_id, p.j,
             CASE WHEN list_sum(list_transform(range(64),
                 i -> CAST(d.v[i+1] AS DOUBLE) * p.wv[i+1])) >= 0
                  THEN '1' ELSE '0' END AS bit
      FROM dvec d CROSS JOIN planes p
    ),
    dbands AS (
      SELECT doc_id, j // 4 AS band_id,
             string_agg(bit, '' ORDER BY j) AS bucket
      FROM dsig GROUP BY doc_id, j // 4
    ),
    qsig AS (
      SELECT qv2.query_id, p.j,
             CASE WHEN list_sum(list_transform(range(64),
                 i -> CAST(qv2.qv[i+1] AS DOUBLE) * p.wv[i+1])) >= 0
                  THEN '1' ELSE '0' END AS bit
      FROM qvec qv2 CROSS JOIN planes p
    ),
    qbands AS (
      SELECT query_id, j // 4 AS band_id,
             string_agg(bit, '' ORDER BY j) AS bucket
      FROM qsig GROUP BY query_id, j // 4
    ),
    lcand AS (
      SELECT DISTINCT qb.query_id, c.doc_id
      FROM dbands c JOIN qbands qb USING (band_id, bucket){allow_join}
    ),
    dense AS (
      SELECT query_id, doc_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, doc_id) AS r
      FROM (SELECT l.query_id, d.doc_id, {cos} AS cos
            FROM lcand l
            JOIN dvec d USING (doc_id)
            JOIN qvec qv2 ON qv2.query_id = l.query_id)
    ),
    contrib AS (
      SELECT query_id, doc_id, 1.0 / (60 + r) AS c FROM sparse WHERE r <= 15
      UNION ALL
      SELECT query_id, doc_id, 1.0 / (60 + r) AS c FROM dense WHERE r <= 15
    ),
    fused AS (
      SELECT query_id, doc_id, round(sum(c), 6) AS rrf_score,
             CAST(count(*) AS BIGINT) AS n_sources
      FROM contrib GROUP BY query_id, doc_id
    )"""


def _hybrid_rrf_batch_persisted_oracle(allow_pred: str | None = None) -> str:
    """Final SELECT over ``_hybrid_rrf_batch_persisted_ctes``: the
    fused per-query top-10 with one partitioned window."""
    return f"""
    WITH {_hybrid_rrf_batch_persisted_ctes(allow_pred)}
    SELECT query_id, doc_id, rrf_score, n_sources, rank
    FROM (SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY rrf_score DESC, doc_id) AS rank
          FROM fused)
    WHERE rank <= 10
    ORDER BY query_id, rank
    """


@register(
    "text_hybrid_rrf_batch_persisted",
    oracle=_hybrid_rrf_batch_persisted_oracle(),
    tags=("text", "north-star", "retrieval", "rag", "similarity",
          "persisted-index", "batch"),
)
def text_hybrid_rrf_batch_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hybrid serving read path for a BATCH of queries, both
    retrievers probed from their persisted indexes in one distributed
    plan each: batched BM25 top-15 per query
    (``query_text_index_batch``), dense top-15 per query from the
    SRP-LSH index over the documents' hash embeddings (one
    ``query_lsh_index`` call carries all query embeddings), fused per
    query by ``operators/text.py:rrf_fuse_batch`` -- the
    calibration-free combiner keyed by (query_id, doc_id) with one
    partitioned window for the fused top-10.  This is
    ``text_hybrid_rrf_persisted`` generalized to the request-stream
    shape: N queries cost two index probes TOTAL, not 2N driver
    round-trips.  Query embeddings carry negative ids so the LSH
    probe's self-exclusion can never collide with a document id."""
    import os as _os

    from ..io_utils import scratch_dir
    from ..operators import ann_index as ANN
    from ..operators import text_index as TI
    from ..operators.similarity import hash_hyperplanes

    docs = parallelize_small(load(spark, sf_dir, "documents"))
    sf_name = _os.path.basename(sf_dir.rstrip("/")) or "corpus"
    troot = scratch_dir("text_index", sf_name)
    TI.build_text_index(docs, troot)
    qdf = spark.createDataFrame(
        [
            (qid, t)
            for qid, terms in enumerate(_BM25_BATCH_QUERIES)
            for t in terms
        ],
        "query_id long, term string",
    )
    sparse = TI.query_text_index_batch(
        spark, troot, qdf, k=15, k1=_BM25_K1, b=_BM25_B
    ).select("query_id", "doc_id", "rank")

    demb = TX.hash_embedding(docs, dim=64)
    lroot = scratch_dir("ann_index", sf_name, "lsh_docs")
    ANN.build_lsh_index(
        demb, lroot, id_col="doc_id", bands=16, rows_per_band=4,
        planes=hash_hyperplanes(64, dim=64),
    )
    qtexts = spark.createDataFrame(
        [
            (-(qid + 1), " ".join(terms))
            for qid, terms in enumerate(_BM25_BATCH_QUERIES)
        ],
        "doc_id long, text string",
    )
    qemb = TX.hash_embedding(qtexts, dim=64)
    dense = ANN.query_lsh_index(
        spark, lroot, qemb, k=15, id_col="doc_id"
    ).select(
        (-F.col("query_id") - 1).alias("query_id"),
        F.col("neighbor_id").alias("doc_id"),
        "rank",
    )
    return TX.rrf_fuse_batch([sparse, dense], k=10).orderBy(
        "query_id", "rank"
    )


@register(
    "text_hybrid_rrf_batch_filtered",
    oracle=_hybrid_rrf_batch_persisted_oracle("lang = 'en'"),
    tags=("text", "north-star", "retrieval", "rag", "similarity",
          "persisted-index", "batch", "filtered"),
)
def text_hybrid_rrf_batch_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-FILTERED batched hybrid retrieval (round 14): the
    batch hybrid read path with the allow-list (English documents)
    pushed into BOTH persisted probes -- sparse
    ``query_text_index_batch(allowed=...)`` (scored set narrowed
    AFTER the df aggregate; term rarity stays corpus-global) and
    dense ``query_lsh_index(allowed=...)`` (band-bucket candidates
    semi-joined BEFORE the cosine re-rank, so dense ranks are
    computed over the filtered candidate set) -- then per-query RRF
    exactly as the unfiltered row.  This is the RAG serving shape
    under a license/language/source slice: the filter rides each
    probe as a broadcast semi-join on a 1-column allow-list, the
    fusion is unchanged, and nothing re-ranks post-hoc (post-hoc
    filtering would silently shorten result lists and skew RRF mass
    -- ranks must be assigned WITHIN the slice)."""
    import os as _os

    from ..io_utils import scratch_dir
    from ..operators import ann_index as ANN
    from ..operators import text_index as TI
    from ..operators.similarity import hash_hyperplanes

    docs = parallelize_small(load(spark, sf_dir, "documents"))
    sf_name = _os.path.basename(sf_dir.rstrip("/")) or "corpus"
    troot = scratch_dir("text_index", sf_name)
    TI.build_text_index(docs, troot)
    allowed = docs.where(F.col("lang") == "en").select("doc_id")
    qdf = spark.createDataFrame(
        [
            (qid, t)
            for qid, terms in enumerate(_BM25_BATCH_QUERIES)
            for t in terms
        ],
        "query_id long, term string",
    )
    sparse = TI.query_text_index_batch(
        spark, troot, qdf, k=15, k1=_BM25_K1, b=_BM25_B, allowed=allowed
    ).select("query_id", "doc_id", "rank")

    demb = TX.hash_embedding(docs, dim=64)
    lroot = scratch_dir("ann_index", sf_name, "lsh_docs")
    ANN.build_lsh_index(
        demb, lroot, id_col="doc_id", bands=16, rows_per_band=4,
        planes=hash_hyperplanes(64, dim=64),
    )
    qtexts = spark.createDataFrame(
        [
            (-(qid + 1), " ".join(terms))
            for qid, terms in enumerate(_BM25_BATCH_QUERIES)
        ],
        "doc_id long, text string",
    )
    qemb = TX.hash_embedding(qtexts, dim=64)
    dense = ANN.query_lsh_index(
        spark, lroot, qemb, k=15, id_col="doc_id", allowed=allowed
    ).select(
        (-F.col("query_id") - 1).alias("query_id"),
        F.col("neighbor_id").alias("doc_id"),
        "rank",
    )
    return TX.rrf_fuse_batch([sparse, dense], k=10).orderBy(
        "query_id", "rank"
    )


def _hybrid_persisted_probes(spark: SparkSession, sf_dir: str):
    """Build-and-probe recipe shared by the persisted hybrid row and
    the RAG context macro (ONE copy, so the retrieval geometry cannot
    drift between the stage row and its composition): persisted text
    index -> BM25 top-15 (globally ranked over the bounded result),
    hash embeddings -> persisted SRP-LSH index -> dense top-15 for
    the standing query text.  Returns (sparse_ranked, dense_ranked,
    lsh_index_root, query_embedding)."""
    import os as _os

    from pyspark.sql.window import Window

    from ..io_utils import scratch_dir
    from ..operators import ann_index as ANN
    from ..operators import text_index as TI
    from ..operators.similarity import hash_hyperplanes

    docs = parallelize_small(load(spark, sf_dir, "documents"))
    sf_name = _os.path.basename(sf_dir.rstrip("/")) or "corpus"

    troot = scratch_dir("text_index", sf_name)
    demb = TX.hash_embedding(docs, dim=64)
    lroot = scratch_dir("ann_index", sf_name, "lsh_docs")
    # The two index builds are independent (different roots, read-only
    # shared input) -- overlapped so the postings shuffle and the
    # signature pass share the executor pool instead of running back
    # to back (guide §2.6); probes run after both complete.
    ANN._run_overlapped(
        lambda: TI.build_text_index(docs, troot),
        lambda: ANN.build_lsh_index(
            demb,
            lroot,
            id_col="doc_id",
            bands=16,
            rows_per_band=4,
            planes=hash_hyperplanes(64, dim=64),
        ),
    )
    sparse = TI.query_text_index(
        spark, troot, _BM25_TERMS, k=15, k1=_BM25_K1, b=_BM25_B
    )
    # Bounded-input global rank (<= 15 rows post-limit, same audit
    # posture as the ad-hoc hybrid).
    w = Window.partitionBy(F.lit(1)).orderBy(F.desc("bm25"), F.asc("doc_id"))
    sparse = sparse.withColumn("rank", F.row_number().over(w)).select(
        "doc_id", "rank"
    )
    qemb = TX.hash_embedding(
        spark.createDataFrame(
            [(-1, _RRF_QUERY_TEXT)], "doc_id long, text string"
        ),
        dim=64,
    )
    dense = ANN.query_lsh_index(
        spark, lroot, qemb, k=15, id_col="doc_id"
    ).select(F.col("neighbor_id").alias("doc_id"), "rank")
    return sparse, dense, lroot, qemb


def _rag_context_oracle() -> str:
    """The full serving read path in one SQL statement: the hybrid
    CTEs (persisted BM25 probe + SRP-LSH dense probe + RRF fusion)
    select the candidate pool, then the shared unrolled-MMR steps
    replay the diversification greedy over the candidates' hash
    embeddings (relevance = cosine to the query embedding, the same
    scale as the pairwise penalties)."""
    from .similarity_queries import _DOT, _MMR_STEPS, _NORM

    def cos(a: str, b: str) -> str:
        return (
            _DOT.format(d=64, a=a, b=b)
            + " / ("
            + _NORM.format(d=64, a=a)
            + " * "
            + _NORM.format(d=64, a=b)
            + ")"
        )

    return f"""
    WITH {_hybrid_rrf_persisted_ctes()},
    rrf AS (
      SELECT doc_id FROM (
        SELECT doc_id, round(sum(c), 6) AS rrf_score
        FROM contrib GROUP BY doc_id
        ORDER BY rrf_score DESC, doc_id LIMIT 10)
    ),
    cand AS (
      SELECT CAST(-1 AS BIGINT) AS query_id, d.doc_id AS neighbor_id,
             {cos('q.qv', 'd.v')} AS rel
      FROM rrf r JOIN dvec d ON d.doc_id = r.doc_id CROSS JOIN qvec q
    ),
    sims AS (
      SELECT ca.query_id, ca.neighbor_id AS a, cb.neighbor_id AS b,
             {cos('da.v', 'db.v')} AS sim
      FROM cand ca
      JOIN cand cb ON cb.query_id = ca.query_id
                  AND cb.neighbor_id <> ca.neighbor_id
      JOIN dvec da ON da.doc_id = ca.neighbor_id
      JOIN dvec db ON db.doc_id = cb.neighbor_id
    ),
    {_MMR_STEPS}
    """


@register(
    "text_rag_context_persisted",
    oracle=_rag_context_oracle(),
    tags=("text", "north-star", "retrieval", "rag", "similarity", "mmr",
          "persisted-index", "macro"),
)
def text_rag_context_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE RAG serving read path as one composition -- the
    serving twin of ``corpus_assemble_end_to_end``: hybrid retrieval
    from the persisted indexes (BM25 top-15 from the inverted index +
    dense top-15 from the SRP-LSH index, RRF-fused to a 10-candidate
    pool) followed by MMR diversification (exact-cosine relevance to
    the query's hash embedding, 0.75/0.25 trade-off) picking the 3
    context passages actually handed to the model.  Every stage is
    separately green (`text_hybrid_rrf_persisted`,
    `similarity_mmr_persisted`); this row proves they COMPOSE: the
    candidates flow probe -> fuse -> greedy without any corpus
    re-scan (retrieval touches postings + band buckets; MMR touches
    <= pool rows), and the oracle replays retrieval + fusion + the
    unrolled greedy in one statement."""
    from ..operators import ann_index as ANN
    from ..operators.similarity import mmr_rerank

    sparse, dense, lroot, qemb = _hybrid_persisted_probes(spark, sf_dir)
    fused = TX.rrf_fuse([sparse, dense], k=10)
    cand = fused.select(
        F.lit(-1).cast("long").alias("query_id"),
        F.col("doc_id").alias("neighbor_id"),
    )
    # MMR relevance/penalty vectors come off the LSH index's stored
    # vector table (tombstone-aware), not a second hash-embedding
    # corpus pass -- the index already materialized exactly these rows
    # at build time.
    stored = ANN.read_index_vectors(spark, lroot, "doc_id", "embedding")
    return mmr_rerank(
        stored, qemb, k=3, pool=10, lam=0.75,
        id_col="doc_id", vec_col="embedding", candidates=cand,
    )


def _rag_context_batch_oracle(allow_pred: str | None = None) -> str:
    """The batched serving read path in one SQL statement: the
    BATCHED hybrid CTEs (per-query BM25 probe + per-query SRP-LSH
    probe + per-query RRF fusion, ``_hybrid_rrf_batch_persisted_ctes``)
    select each query's 10-candidate pool, then the shared unrolled
    MMR steps -- already PARTITION BY query_id, so they generalize
    from the single-query RAG oracle unchanged -- replay the greedy
    per query over the candidates' hash embeddings.  ``allow_pred``
    threads the retrieval allow-list into both probe CTEs (the
    filtered-family convention); the MMR stages need no extra filter
    because every fused candidate is already inside the slice."""
    from .similarity_queries import _DOT, _MMR_STEPS, _NORM

    def cos(a: str, b: str) -> str:
        return (
            _DOT.format(d=64, a=a, b=b)
            + " / ("
            + _NORM.format(d=64, a=a)
            + " * "
            + _NORM.format(d=64, a=b)
            + ")"
        )

    return f"""
    WITH {_hybrid_rrf_batch_persisted_ctes(allow_pred)},
    rrf AS (
      SELECT query_id, doc_id FROM (
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY rrf_score DESC, doc_id) AS rank
        FROM fused) WHERE rank <= 10
    ),
    cand AS (
      SELECT r.query_id, d.doc_id AS neighbor_id,
             {cos('qq.qv', 'd.v')} AS rel
      FROM rrf r
      JOIN dvec d ON d.doc_id = r.doc_id
      JOIN qvec qq ON qq.query_id = r.query_id
    ),
    sims AS (
      SELECT ca.query_id, ca.neighbor_id AS a, cb.neighbor_id AS b,
             {cos('da.v', 'db.v')} AS sim
      FROM cand ca
      JOIN cand cb ON cb.query_id = ca.query_id
                  AND cb.neighbor_id <> ca.neighbor_id
      JOIN dvec da ON da.doc_id = ca.neighbor_id
      JOIN dvec db ON db.doc_id = cb.neighbor_id
    ),
    {_MMR_STEPS}
    """


@register(
    "text_rag_context_batch_persisted",
    oracle=_rag_context_batch_oracle(),
    tags=("text", "north-star", "retrieval", "rag", "similarity", "mmr",
          "persisted-index", "macro", "batch"),
)
def text_rag_context_batch_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE RAG serving read path for a BATCH of queries --
    the top of the batched-serving family: N standing queries ride
    ONE distributed plan through hybrid retrieval from the persisted
    indexes (batched BM25 top-15 via ``query_text_index_batch``,
    dense top-15 per query from the SRP-LSH index in one probe),
    per-query RRF fusion to 10-candidate pools
    (``rrf_fuse_batch``), and per-query MMR diversification --
    ``mmr_rerank`` is already multi-query (one Arrow
    ``applyInPandas`` group per query over <= pool rows), so the
    greedy diversification of every query in the batch is a single
    grouped pass, not N driver-side calls.  This is the serving
    amortization story end-to-end: the single-call row
    (``text_rag_context_persisted``) prices one question; this row
    prices a request stream, where index-probe scans, fusion
    windows, and the MMR pair tables all share one job each.  MMR
    relevance/penalty vectors come off the LSH index's stored vector
    table, exactly as the single-call row."""
    return _rag_context_batch(spark, sf_dir)


@register(
    "text_rag_context_batch_filtered",
    oracle=_rag_context_batch_oracle("lang = 'en'"),
    tags=("text", "north-star", "retrieval", "rag", "similarity", "mmr",
          "persisted-index", "macro", "batch", "filtered"),
)
def text_rag_context_batch_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batched RAG read path under a metadata slice (English
    documents) -- the family matrix closed at the top of the stack:
    the allow-list rides BOTH persisted probes exactly as in
    ``text_hybrid_rrf_batch_filtered`` (sparse scored set narrowed
    after the df aggregate, term rarity corpus-global; dense
    band-bucket candidates semi-joined before the cosine re-rank, so
    ranks are assigned WITHIN the slice), the per-query RRF fusion is
    unchanged, and MMR diversifies each query's fused pool with no
    extra filter -- every candidate is already inside the slice, so
    post-retrieval filtering (which would shorten context lists and
    skew the greedy) never happens."""
    return _rag_context_batch(
        spark, sf_dir,
        allowed=lambda docs: docs.where(F.col("lang") == "en").select("doc_id"),
    )


def _rag_context_batch(
    spark: SparkSession, sf_dir: str, allowed=None
) -> DataFrame:
    """Shared body of the batched RAG rows: build-once persisted text
    + SRP-LSH indexes, batched hybrid probes (optionally allow-list
    filtered, the family contract), per-query RRF fusion, multi-query
    MMR off the index's stored vector table.  ``allowed`` is a
    callable docs -> 1-column (doc_id) DataFrame so the filtered row
    derives its slice from the same corpus scan."""
    import os as _os

    from ..io_utils import scratch_dir
    from ..operators import ann_index as ANN
    from ..operators import text_index as TI
    from ..operators.similarity import hash_hyperplanes, mmr_rerank

    docs = parallelize_small(load(spark, sf_dir, "documents"))
    sf_name = _os.path.basename(sf_dir.rstrip("/")) or "corpus"
    allow_df = allowed(docs) if allowed is not None else None

    troot = scratch_dir("text_index", sf_name)
    TI.build_text_index(docs, troot)
    qdf = spark.createDataFrame(
        [
            (qid, t)
            for qid, terms in enumerate(_BM25_BATCH_QUERIES)
            for t in terms
        ],
        "query_id long, term string",
    )
    sparse = TI.query_text_index_batch(
        spark, troot, qdf, k=15, k1=_BM25_K1, b=_BM25_B, allowed=allow_df
    ).select("query_id", "doc_id", "rank")

    demb = TX.hash_embedding(docs, dim=64)
    lroot = scratch_dir("ann_index", sf_name, "lsh_docs")
    ANN.build_lsh_index(
        demb, lroot, id_col="doc_id", bands=16, rows_per_band=4,
        planes=hash_hyperplanes(64, dim=64),
    )
    # Query embeddings ride the probe under negative ids (the batch
    # hybrid convention -- they can never collide with corpus doc
    # ids), then map back to query_id for fusion and MMR.
    qtexts = spark.createDataFrame(
        [
            (-(qid + 1), " ".join(terms))
            for qid, terms in enumerate(_BM25_BATCH_QUERIES)
        ],
        "doc_id long, text string",
    )
    qemb = TX.hash_embedding(qtexts, dim=64)
    dense = ANN.query_lsh_index(
        spark, lroot, qemb, k=15, id_col="doc_id", allowed=allow_df
    ).select(
        (-F.col("query_id") - 1).alias("query_id"),
        F.col("neighbor_id").alias("doc_id"),
        "rank",
    )
    fused = TX.rrf_fuse_batch([sparse, dense], k=10)
    cand = fused.select(
        "query_id", F.col("doc_id").alias("neighbor_id")
    )
    stored = ANN.read_index_vectors(spark, lroot, "doc_id", "embedding")
    qvecs = qemb.select(
        (-F.col("doc_id") - 1).alias("doc_id"), "embedding"
    )
    return mmr_rerank(
        stored, qvecs, k=3, pool=10, lam=0.75,
        id_col="doc_id", vec_col="embedding", candidates=cand,
    )


@register(
    "text_tfidf_top_terms",
    oracle=f"""
    WITH posting AS (
      SELECT doc_id, dl, term, count(*) AS tf
      FROM (SELECT doc_id, {_NTOK} AS dl, unnest({_TOKS}) AS term FROM documents)
      GROUP BY doc_id, dl, term
    ),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
    dft AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM posting GROUP BY term),
    ranked AS (
      SELECT doc_id, term, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term ASC) AS term_rank
      FROM (SELECT p.doc_id, p.term,
                   round((p.tf / p.dl) * (ln(nn.n / (1.0 + d.df)) + 1.0), 6) AS tfidf
            FROM posting p JOIN dft d ON d.term = p.term CROSS JOIN nn)
    )
    SELECT doc_id, term_rank, term, tfidf
    FROM ranked WHERE term_rank <= 3
    ORDER BY doc_id, term_rank
    """,
    tags=("text", "north-star", "retrieval"),
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 terms by smoothed tf-idf: the corpus-wide df
    is one posting-list groupBy; per-doc ranking is a bounded
    row_number window (``operators/text.py:tfidf_top_terms``)."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    return TX.tfidf_top_terms(docs, top_n=3)


@register(
    "text_pii_redact",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_email,
           len(regexp_extract_all(text,
               '\\+[0-9][0-9 -]{7,13}[0-9]')) AS n_phone,
           len(regexp_extract_all(text,
               '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b')) AS n_ipv4,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\\+[0-9][0-9 -]{7,13}[0-9]', '<PHONE>', 'g'),
               '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '<IP>', 'g'))
             AS redacted_md5
    FROM documents
    ORDER BY doc_id
    """,
    tags=("text", "curation", "pii"),
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (``operators/text.py:redact_pii``): per-rule match
    counts plus the md5 of the redacted text (emails / phones / IPv4 ->
    typed tags, rules in ``PII_RULES`` order).  One codegen'd scan
    pass, no shuffle; the synthetic corpus is PII-free so counts are 0
    and the md5 equals the original -- the behavioral check on crafted
    PII strings lives in ``tests/test_operators.py``."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    counts = TX.pii_counts(F.col("text"))
    return docs.select(
        "doc_id",
        counts["email"].alias("n_email"),
        counts["phone"].alias("n_phone"),
        counts["ipv4"].alias("n_ipv4"),
        F.md5(TX.redact_pii(F.col("text")).cast("binary")).alias("redacted_md5"),
    ).orderBy("doc_id")


@register(
    "text_unigram_logprob",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
    vocab AS (SELECT term, CAST(count(*) AS DOUBLE) AS term_n FROM tok GROUP BY term),
    tot AS (SELECT sum(term_n) AS total_n FROM vocab)
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(ln(v.term_n / tot.total_n)), 6) + 0.0 AS avg_logprob
    FROM tok t JOIN vocab v ON v.term = t.term CROSS JOIN tot
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """,
    tags=("text", "curation", "quality"),
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean unigram log-probability per document under the corpus's own
    unigram LM (``operators/text.py:unigram_logprob``) -- the
    perplexity-flavored quality signal: rare-token soup scores low.
    Corpus total is a 1-row broadcast (scalar-subquery BNLJ shape,
    allowlisted in the plan audit)."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    return TX.unigram_logprob(docs).orderBy("doc_id")


@register(
    "text_bpe_pairs",
    oracle=f"""
    WITH vocab AS (
      SELECT word, count(*) AS n
      FROM (SELECT unnest({_TOKS}) AS word FROM documents)
      GROUP BY word
    ),
    syms AS (SELECT n, regexp_extract_all(word, '(.)', 1) AS s FROM vocab),
    pairs AS (
      SELECT n, s[i + 1] || ' ' || s[i + 2] AS pair
      FROM (SELECT n, s, unnest(range(len(s) - 1)) AS i FROM syms)
    )
    SELECT pair, CAST(sum(n) AS BIGINT) AS cnt
    FROM pairs
    GROUP BY pair
    ORDER BY cnt DESC, pair
    LIMIT 20
    """,
    tags=("text", "tokenizer", "bpe"),
)
def text_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 1 of BPE tokenizer training (``operators/bpe.py``): the
    top-20 frequency-weighted adjacent character pairs of the
    vocabulary -- the merge-candidate table.  Corpus-scale work is one
    token explode + groupBy(word); the pair scan is vocabulary-sized.
    The full iterative merge loop (``bpe_merges``) is data-dependent
    per round and verified against a pure-Python BPE reference in
    pytest instead of one SQL statement."""
    from ..operators.bpe import chars, pair_counts, word_freq_table

    docs = parallelize_small(load(spark, sf_dir, "documents"))
    words = word_freq_table(docs).select("n", chars(F.col("word")).alias("syms"))
    return (
        pair_counts(words)
        .select("pair", F.col("cnt").cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(20)
    )


@register(
    "sketch_hll_by_source",
    oracle=f"""
    WITH tok AS (SELECT source, unnest({_TOKS}) AS token FROM documents),
    h AS (SELECT source, md5(token) AS d FROM tok),
    r AS (SELECT source,
                 CAST(('0x' || substr(d, 1, 2)) AS BIGINT) AS register,
                 CAST(('0x' || substr(d, 3, 12)) AS BIGINT) AS v
          FROM h)
    SELECT source, register,
           CAST(max(48 - (CASE WHEN v = 0 THEN 0 ELSE length(bin(v)) END) + 1)
                AS BIGINT) AS max_rank
    FROM r GROUP BY source, register ORDER BY source, register
    """,
    tags=("text", "sketch", "hll", "grouped"),
)
def sketch_hll_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED HyperLogLog: one register table per source -- the
    sketch-as-grouped-state shape (distinct tokens per shard/day/
    source without exact per-group count-distinct).  Same mergeable
    max-aggregation as the global sketch, keyed by (group, register);
    per-group estimates are accuracy-tested in pytest."""
    from ..operators import sketch as SK

    docs = parallelize_small(load(spark, sf_dir, "documents"))
    toks = docs.select(
        "source", F.explode(TX.tokens(F.col("text"))).alias("token")
    )
    return SK.hll_registers(toks, "token", group_cols=("source",)).orderBy(
        "source", "register"
    )


@register(
    "text_repetition_stats",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS l FROM documents),
    grams AS (
      SELECT doc_id, l[i+1] || ' ' || l[i+2] || ' ' || l[i+3] AS gram
      FROM (SELECT doc_id, l, unnest(range(greatest(len(l) - 2, 0))) AS i
            FROM toks)
    ),
    gc AS (SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY doc_id, gram),
    pd AS (
      SELECT doc_id, sum(c) AS n_ngrams,
             sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup,
             max(c) AS top
      FROM gc GROUP BY doc_id
    ),
    tk AS (SELECT doc_id, len(l) AS n_tok, len(list_distinct(l)) AS n_dis
           FROM toks)
    SELECT p.doc_id, CAST(p.n_ngrams AS BIGINT) AS n_ngrams,
           round(p.dup / p.n_ngrams, 6) AS dup_ngram_frac,
           round(p.top / p.n_ngrams, 6) AS top_ngram_frac,
           round(1.0 - CAST(t.n_dis AS DOUBLE) / t.n_tok, 6) AS dup_token_frac
    FROM pd p JOIN tk t USING (doc_id)
    ORDER BY p.doc_id
    """,
    tags=("text", "quality", "repetition", "gopher"),
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style per-document repetition signals
    (``operators/text.py:repetition_stats``, Rae et al. 2021): total
    3-gram occurrences, duplicated-3-gram fraction, top-3-gram
    fraction, duplicate-token fraction -- the self-repetition filters
    a training-data quality gate thresholds on.  One explode + two
    (doc, gram)-keyed hash aggregations; token stats are pure column
    expressions."""
    from ..operators.text import repetition_stats

    docs = parallelize_small(load(spark, sf_dir, "documents"))
    stats = repetition_stats(docs, n=3)
    return stats.select(
        "doc_id",
        "n_ngrams",
        F.round("dup_ngram_frac", 6).alias("dup_ngram_frac"),
        F.round("top_ngram_frac", 6).alias("top_ngram_frac"),
        F.round("dup_token_frac", 6).alias("dup_token_frac"),
    ).orderBy("doc_id")


@register(
    "text_vocab_coverage",
    oracle=f"""
    WITH tok AS (SELECT unnest({_TOKS}) AS token FROM documents),
    tc AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
    total AS (SELECT sum(cnt) AS total FROM tc),
    top AS (SELECT token, cnt FROM tc ORDER BY cnt DESC, token LIMIT 50)
    SELECT row_number() OVER (ORDER BY cnt DESC, token) AS rank,
           token, CAST(cnt AS BIGINT) AS cnt,
           round(sum(cnt) OVER (ORDER BY cnt DESC, token
                                ROWS UNBOUNDED PRECEDING)
                 / (SELECT total FROM total), 6) AS cum_share
    FROM top
    ORDER BY rank
    """,
    tags=("text", "tokenizer", "zipf", "coverage"),
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus Zipf head (``operators/text.py:vocab_coverage``): the 50
    most frequent tokens and their cumulative share of all token
    occurrences.  Hash-agg token counts, TakeOrderedAndProject top-k
    (per-partition heaps), a 50-row cumulative window on one task, and
    a 1-row corpus-total broadcast -- every stage bounded or
    map-combined at 100 TB."""
    from ..operators.text import vocab_coverage

    docs = parallelize_small(load(spark, sf_dir, "documents"))
    cov = vocab_coverage(docs, top_k=50)
    return cov.select(
        "rank", "token", "cnt", F.round("cum_share", 6).alias("cum_share")
    ).orderBy("rank")


@register(
    "text_bigram_logprob",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS l FROM documents),
    bg AS (
      SELECT doc_id, l[i+1] AS a, l[i+2] AS b
      FROM (SELECT doc_id, l, unnest(range(greatest(len(l) - 1, 0))) AS i
            FROM toks)
    ),
    bn AS (SELECT a, b, CAST(count(*) AS DOUBLE) AS n_ab FROM bg GROUP BY a, b),
    cn AS (SELECT a, sum(n_ab) AS n_a FROM bn GROUP BY a)
    SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(ln(n_ab / n_a)), 6) + 0.0 AS avg_logprob
    FROM bg
    JOIN bn ON bg.a = bn.a AND bg.b = bn.b
    JOIN cn ON bg.a = cn.a
    GROUP BY bg.doc_id
    ORDER BY bg.doc_id
    """,
    tags=("text", "quality", "lm", "bigram"),
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-aware LM quality scoring
    (``operators/text.py:bigram_logprob``): per-document mean bigram
    conditional log-probability under the corpus's own bigram MLE --
    flags documents whose token TRANSITIONS are globally unusual even
    when every token is individually common.  One bigram explode, two
    map-combined hash aggs, equi-joins back, per-doc avg."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    return TX.bigram_logprob(docs).orderBy("doc_id")


@register(
    "text_kneser_ney_logprob",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS l FROM documents),
    bg AS (
      SELECT doc_id, l[i+1] AS a, l[i+2] AS b
      FROM (SELECT doc_id, l, unnest(range(greatest(len(l) - 1, 0))) AS i
            FROM toks)
    ),
    bn AS (SELECT a, b, CAST(count(*) AS DOUBLE) AS n_ab FROM bg GROUP BY a, b),
    cn AS (SELECT a, sum(n_ab) AS n_a, CAST(count(*) AS DOUBLE) AS t_a
           FROM bn GROUP BY a),
    rb AS (SELECT b, CAST(count(*) AS DOUBLE) AS r_b FROM bn GROUP BY b),
    tt AS (SELECT CAST(count(*) AS DOUBLE) AS n_types FROM bn)
    SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(ln((n_ab - 0.75) / n_a
                        + (0.75 * t_a / n_a) * (r_b / n_types))), 6) + 0.0
             AS avg_logprob
    FROM bg
    JOIN bn ON bg.a = bn.a AND bg.b = bn.b
    JOIN cn ON bg.a = cn.a
    JOIN rb ON bg.b = rb.b
    CROSS JOIN tt
    GROUP BY bg.doc_id
    ORDER BY bg.doc_id
    """,
    tags=("text", "quality", "lm", "kneser-ney"),
)
def text_kneser_ney_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney LM scoring
    (``operators/text.py:kneser_ney_logprob``, d = 0.75): the smoothing
    family real KenLM quality filters use, redistributing mass by
    context DIVERSITY -- a token glued to one boilerplate context
    scores low as a continuation even when its raw count is high,
    which the bigram MLE cannot see.  Same one-explode shape as
    ``text_bigram_logprob`` plus two bn-derived hash aggs and a 1-row
    type-total broadcast."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    return TX.kneser_ney_logprob(docs).orderBy("doc_id")


#: The C4-style badwords list for the catalog gate: one term the
#: synthetic corpus actually contains ('dup', ~5% of docs) plus two it
#: does not -- so the query exercises hit, multi-miss, and keep paths.
_BLOCKLIST = ("dup", "junk", "spam")


@register(
    "text_blocklist_filter",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS l FROM documents),
    h AS (
      SELECT doc_id,
             list_filter(l, t -> list_contains(['dup', 'junk', 'spam'], t))
               AS hits
      FROM toks
    )
    SELECT doc_id,
           CAST(len(hits) AS BIGINT) AS n_hits,
           coalesce(array_to_string(list_sort(list_distinct(hits)), ','), '')
             AS hit_terms,
           len(hits) = 0 AS keep
    FROM h
    ORDER BY doc_id
    """,
    tags=("text", "curation", "blocklist", "c4"),
)
def text_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-level blocklist gate (``operators/text.py:blocklist_hits``,
    C4's badwords rule): per document the blocklisted-token occurrence
    count, the distinct terms that hit, and the keep verdict.  ZERO
    shuffle -- the list is an array literal and every column is a
    higher-order expression over the shared ``tokens()`` split, one
    codegen'd corpus pass (the whole-token contract avoids the
    Scunthorpe substring false-positive class by construction)."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    return TX.blocklist_hits(docs, list(_BLOCKLIST)).orderBy("doc_id")


@register(
    "text_hash_embedding",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS t FROM documents),
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
    grid AS (SELECT doc_id, d FROM docs_with CROSS JOIN range(64) t(d))
    SELECT g.doc_id, g.d AS dim_idx,
           round(coalesce(c.val, 0.0), 6) + 0.0 AS val
    FROM grid g LEFT JOIN cells c ON c.doc_id = g.doc_id AND c.idx = g.d
    ORDER BY g.doc_id, g.d
    """,
    tags=("text", "embedding", "feature-hashing"),
)
def text_hash_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing document embeddings
    (``operators/text.py:hash_embedding``, Weinberger et al. 2009):
    every token occurrence adds +-1 (md5-derived sign) to dimension
    md5(token) mod 64, yielding a deterministic, trained-model-free
    text vector whose cosine reflects token-distribution overlap --
    the engine's own text->vector producer for the similarity /
    SemDeDup family.  Output exploded to (doc_id, dim_idx, val) so
    the oracle compares scalars, not float arrays."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    emb = TX.hash_embedding(docs, dim=64)
    return (
        emb.select(
            "doc_id", F.posexplode("embedding").alias("dim_idx", "val")
        )
        .select(
            "doc_id",
            F.col("dim_idx").cast("long").alias("dim_idx"),
            F.round("val", 6).alias("val"),
        )
        .orderBy("doc_id", "dim_idx")
    )


@register(
    "text_bm25_persisted_index",
    oracle=_BM25_ORACLE,
    tags=("text", "north-star", "retrieval", "persisted-index"),
)
def text_bm25_persisted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 served from a PERSISTED inverted index
    (``operators/text_index.py``): posting lists, doc lengths, and
    corpus stats are materialized to parquet once, then the same
    3-term query runs as a term-pruned postings read + pivot + scored
    join -- result-identical to the ad-hoc scan (same summation
    order), sharing its oracle.  At 100 TB the build is the one
    corpus pass; each query touches only its terms' postings."""
    import os as _os

    from ..io_utils import scratch_dir
    from ..operators import text_index as TI

    docs = parallelize_small(load(spark, sf_dir, "documents"))
    sf_name = _os.path.basename(sf_dir.rstrip("/")) or "corpus"
    root = scratch_dir("text_index", sf_name)
    TI.build_text_index(docs, root)
    return TI.query_text_index(
        spark, root, _BM25_TERMS, k=15, k1=_BM25_K1, b=_BM25_B
    )


@register(
    "text_ccnet_quality_buckets",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
    vocab AS (SELECT term, CAST(count(*) AS DOUBLE) AS term_n
              FROM tok GROUP BY term),
    tot AS (SELECT sum(term_n) AS total_n FROM vocab),
    scored AS (
      SELECT t.doc_id,
             CAST(count(*) AS BIGINT) AS n_tokens,
             round(avg(ln(v.term_n / tot.total_n)), 6) + 0.0 AS avg_logprob
      FROM tok t JOIN vocab v ON v.term = t.term CROSS JOIN tot
      GROUP BY t.doc_id
    ),
    tiled AS (
      SELECT s.doc_id, d.lang, s.n_tokens, s.avg_logprob,
             ntile(3) OVER (PARTITION BY d.lang
                            ORDER BY s.avg_logprob DESC, s.doc_id) AS nt
      FROM scored s JOIN documents d USING (doc_id)
    )
    SELECT doc_id, lang, n_tokens, avg_logprob,
           CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                   ELSE 'tail' END AS bucket
    FROM tiled
    ORDER BY doc_id
    """,
    tags=("text", "north-star", "curation", "quality", "ccnet"),
)
def text_ccnet_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail quality split
    (``operators/text.py:ccnet_buckets``, Wenzek et al. 2020): within
    each language, documents ordered by unigram-LM score (the engine's
    self-contained KenLM stand-in) and ntile'd into thirds -- the
    canonical keep-head / sample-middle / drop-tail web-crawl gate.
    Bucketing runs on the 1e-6-rounded score with an id tiebreak so
    the oracle replays the boundary exactly.  One ntile window per
    language partition, no corpus-global sort."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    return TX.ccnet_buckets(docs).orderBy("doc_id")


#: DuckDB twin of ``dedup.word_shingles(text, 3)`` over the token-list
#: column ``l``: distinct 3-gram strings, empty below 3 tokens.
_GRAMS3 = (
    "list_distinct(list_transform(range(greatest(len(l) - 2, 0)), "
    "i -> l[i+1] || ' ' || l[i+2] || ' ' || l[i+3]))"
)


@register(
    "text_ngram_novelty",
    oracle=f"""
    WITH cand AS (SELECT doc_id, {_TOKS} AS l FROM documents
                  WHERE source = 'src0'),
    g AS (SELECT doc_id, unnest({_GRAMS3}) AS gram FROM cand),
    ref AS (
      SELECT DISTINCT unnest({_GRAMS3}) AS gram
      FROM (SELECT {_TOKS} AS l FROM documents WHERE source <> 'src0')
    ),
    per AS (
      SELECT g.doc_id,
             CAST(count(*) AS BIGINT) AS n_grams,
             CAST(sum(CASE WHEN r.gram IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_novel
      FROM g LEFT JOIN ref r ON r.gram = g.gram
      GROUP BY g.doc_id
    )
    SELECT c.doc_id,
           coalesce(p.n_grams, 0) AS n_grams,
           coalesce(p.n_novel, 0) AS n_novel,
           round(CASE WHEN coalesce(p.n_grams, 0) > 0
                      THEN p.n_novel / CAST(p.n_grams AS DOUBLE)
                      ELSE 0.0 END, 6) AS novelty
    FROM cand c LEFT JOIN per p ON p.doc_id = c.doc_id
    ORDER BY c.doc_id
    """,
    tags=("text", "north-star", "novelty", "audit"),
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram novelty audit (``operators/text.py:ngram_novelty``):
    fraction of each src0 document's distinct 3-grams that never occur
    in the rest of the corpus -- the audit run against a synthetic or
    newly-ingested batch to measure how much is genuinely new vs
    copied from the reference data (the corpus-level complement of the
    verbatim-dedup memorization checks).  Two content-keyed equi-joins
    (doc grams -> reference vocabulary), linear in gram count."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    return TX.ngram_novelty(
        docs.where(F.col("source") == "src0"),
        docs.where(F.col("source") != "src0"),
        n=3,
    ).orderBy("doc_id")


@register(
    "text_nb_quality_scores",
    oracle=f"""
    WITH lab AS (
      SELECT doc_id, {_TOKS} AS l,
             (source IN ('src0', 'src1', 'src2')) AS pos
      FROM documents
      WHERE source IN ('src0', 'src1', 'src2', 'src3', 'src4', 'src5')
    ),
    alltok AS (
      SELECT doc_id, unnest({_TOKS}) AS term FROM documents
    ),
    tok AS (SELECT doc_id, pos, unnest(l) AS term FROM lab),
    counts AS (
      SELECT term,
             CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE) AS pos_n,
             CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS DOUBLE) AS neg_n
      FROM tok GROUP BY term
    ),
    tot AS (
      SELECT sum(pos_n) AS total_pos, sum(neg_n) AS total_neg,
             CAST(count(*) AS DOUBLE) AS v
      FROM counts
    ),
    model AS (
      SELECT term,
             ln((pos_n + 1.0) / (total_pos + v))
               - ln((neg_n + 1.0) / (total_neg + v)) AS log_ratio
      FROM counts CROSS JOIN tot
    ),
    pri AS (
      SELECT ln(CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE)
                / CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS DOUBLE))
               AS log_prior
      FROM lab
    ),
    oov AS (
      SELECT ln((total_neg + v) / (total_pos + v)) AS oov_log_ratio FROM tot
    ),
    per AS (
      SELECT t.doc_id,
             CAST(count(*) AS BIGINT) AS n_tokens,
             sum(coalesce(m.log_ratio, o.oov_log_ratio)) AS token_sum
      FROM alltok t LEFT JOIN model m USING (term) CROSS JOIN oov o
      GROUP BY t.doc_id
    )
    SELECT d.doc_id,
           coalesce(p.n_tokens, 0) AS n_tokens,
           round(pri.log_prior + coalesce(p.token_sum, 0.0), 6) + 0.0 AS nb_logit,
           (round(pri.log_prior + coalesce(p.token_sum, 0.0), 6) > 0) AS keep
    FROM documents d LEFT JOIN per p USING (doc_id) CROSS JOIN pri
    ORDER BY d.doc_id
    """,
    tags=("text", "north-star", "curation", "quality", "classifier"),
)
def text_nb_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filter
    (``operators/text.py:nb_quality_model`` / ``nb_quality_scores``):
    train a multinomial-NB classifier on BALANCED curated-vs-crawl
    exemplars (sources src0-src2 stand in for the curated class,
    src3-src5 for raw crawl; equal doc counts make the prior 0, so the
    decision rides on token evidence) and score EVERY document with
    the log-prior + token-log-ratio logit -- the GPT-3 appendix-A /
    LLaMA quality-classifier stage.  Training is one term-keyed agg +
    1-row totals; scoring is a term-keyed left join + per-doc sum.
    ``keep`` thresholds the 1e-6-rounded logit at 0 on both engines."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    pos, neg = ("src0", "src1", "src2"), ("src3", "src4", "src5")
    train = docs.where(F.col("source").isin(*pos, *neg)).select(
        F.col("source").isin(*pos).alias("is_positive"),
        "text",
    )
    model, stats = TX.nb_quality_model(train)
    return TX.nb_quality_scores(docs, model, stats).orderBy("doc_id")


_SYMBOLS = "length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) / length(text)"
_ALPHA_TOK_FRAC = (
    f"len(list_filter({_TOKS}, t -> regexp_matches(t, '[a-z]')))"
    f" / greatest({_NTOK}, 1)"
)
_STOP_HITS = f"len(list_filter({_TOKS}, t -> list_contains({_STOPS}, t)))"


@register(
    "text_gopher_quality_gate",
    oracle=f"""
    SELECT doc_id,
           CAST({_NTOK} AS BIGINT) AS n_tokens,
           round({_MEANLEN}, 6) AS mean_token_len,
           round({_SYMBOLS}, 6) AS symbol_ratio,
           round({_ALPHA_TOK_FRAC}, 6) AS alpha_token_frac,
           CAST({_STOP_HITS} AS BIGINT) AS stopword_hits,
           ({_NTOK} >= 20 AND {_NTOK} <= 10000
            AND {_MEANLEN} >= 3.0 AND {_MEANLEN} <= 10.0
            AND {_SYMBOLS} <= 0.1
            AND {_ALPHA_TOK_FRAC} >= 0.8
            AND {_STOP_HITS} >= 2) AS keep
    FROM documents
    ORDER BY doc_id
    """,
    tags=("text", "north-star", "curation", "quality"),
)
def text_gopher_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule-based quality gate (Rae et al. 2021 §A1.1;
    ``operators/text.py:gopher_keep`` with corpus-scaled thresholds):
    token-count window, mean-token-length window, symbol-ratio cap,
    alphabetic-token floor, stopword floor -- the classic LLM-corpus
    heuristic filter as pure column expressions (whole-stage codegen,
    no UDFs, no shuffle beyond the output sort).  The oracle replays
    every rule from the same operand trees so the keep boolean is
    bit-identical."""
    from ..operators.curation import symbol_ratio

    docs = parallelize_small(load(spark, sf_dir, "documents"))
    t = F.col("text")
    return docs.select(
        "doc_id",
        TX.token_count(t).alias("n_tokens"),
        F.round(TX.mean_token_length(t), 6).alias("mean_token_len"),
        F.round(symbol_ratio(t), 6).alias("symbol_ratio"),
        F.round(TX.alpha_token_frac(t), 6).alias("alpha_token_frac"),
        TX.stopword_hits(t).alias("stopword_hits"),
        TX.gopher_keep(t).alias("keep"),
    ).orderBy("doc_id")


@register(
    "text_tokenizer_fertility",
    oracle=f"""
    WITH sized AS (
      SELECT source,
             {_NTOK} AS ws_toks,
             len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpe_toks,
             length(text) AS n_chars
      FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(ws_toks) AS BIGINT) AS ws_tokens,
           CAST(sum(bpe_toks) AS BIGINT) AS bpe_tokens,
           CAST(sum(n_chars) AS BIGINT) AS n_chars,
           round(sum(bpe_toks) / greatest(sum(ws_toks), 1), 6) AS fertility,
           round(sum(n_chars) / greatest(sum(bpe_toks), 1), 6)
             AS chars_per_bpe_token
    FROM sized GROUP BY source ORDER BY source
    """,
    tags=("text", "north-star", "curation"),
)
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit per domain: BPE-ish subword tokens per
    whitespace word (fertility) and characters per subword token --
    the per-source compression profile that decides token-budget
    allocation and flags domains a tokenizer segments poorly (high
    fertility = more compute per byte of signal).  Pure column
    expressions + one hash agg on source; no UDFs, no extra shuffle."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    t = F.col("text")
    sized = docs.select(
        "source",
        TX.token_count(t).alias("ws_toks"),
        TX.bpe_ish_token_count(t).alias("bpe_toks"),
        F.length(t).cast("long").alias("n_chars"),
    )
    agg = sized.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ws_toks").alias("ws_tokens"),
        F.sum("bpe_toks").alias("bpe_tokens"),
        F.sum("n_chars").alias("n_chars"),
    )
    return agg.select(
        "source",
        "n_docs",
        "ws_tokens",
        "bpe_tokens",
        "n_chars",
        F.round(
            F.col("bpe_tokens") / F.greatest(F.col("ws_tokens"), F.lit(1)), 6
        ).alias("fertility"),
        F.round(
            F.col("n_chars") / F.greatest(F.col("bpe_tokens"), F.lit(1)), 6
        ).alias("chars_per_bpe_token"),
    ).orderBy("source")


@register(
    "text_bigram_pmi",
    oracle=f"""
    WITH toks AS (SELECT {_TOKS} AS l FROM documents),
    bg AS (
      SELECT l[i+1] AS a, l[i+2] AS b
      FROM (SELECT l, unnest(range(greatest(len(l) - 1, 0))) AS i
            FROM toks)
    ),
    un AS (SELECT w, CAST(count(*) AS DOUBLE) AS n
           FROM (SELECT unnest(l) AS w FROM toks) GROUP BY w),
    bn AS (SELECT a, b, count(*) AS n_ab FROM bg GROUP BY a, b),
    tot AS (SELECT sum(n) AS t FROM un),
    btot AS (SELECT CAST(sum(n_ab) AS DOUBLE) AS bt FROM bn)
    SELECT bn.a, bn.b, CAST(bn.n_ab AS BIGINT) AS n_ab,
           round(ln((CAST(bn.n_ab AS DOUBLE) * tot.t * tot.t)
                    / (btot.bt * na.n * nb.n)), 6) + 0.0 AS pmi
    FROM bn
    JOIN un na ON na.w = bn.a
    JOIN un nb ON nb.w = bn.b
    CROSS JOIN tot CROSS JOIN btot
    WHERE bn.n_ab >= 5
    ORDER BY pmi DESC, bn.a, bn.b
    LIMIT 50
    """,
    tags=("text", "north-star", "collocation", "pmi"),
)
def text_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining (``operators/text.py:bigram_pmi``): the 50
    strongest adjacent-token associations by pointwise mutual
    information with the standard min-count guard -- the statistic
    tokenizer merges, stop-phrase lists, and boilerplate detectors
    are derived from.  Two token-linear explodes, map-combined hash
    aggs, pair-table equi-joins, two 1-row totals broadcasts,
    TakeOrdered."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    return TX.bigram_pmi(docs, min_count=5, k=50)


def _hll_overlap_oracle() -> str:
    from ..operators.sketch import HLL_P, _HLL_RANK_BITS

    m = 1 << HLL_P
    two49 = 1 << (_HLL_RANK_BITS + 1)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    # Embed the PYTHON-computed numerator literal on both sides (the
    # Spark plan uses F.lit of the same product), so the only
    # cross-engine float ops are one division (exact-integer
    # denominator) and the rare linear-counting ln -- the _dd_oracle
    # constant-embedding pattern.
    num = repr(alpha * m * m * float(two49))
    est = (
        f"round(CASE WHEN e_raw <= {2.5 * m!r} AND zeros > 0"
        f" THEN {float(m)!r} * ln({float(m)!r} / CAST(zeros AS DOUBLE))"
        f" ELSE e_raw END, 4)"
    )
    inner = (
        f"SELECT {{keys}}, {num} / CAST(s_present + ({m} - n_present)"
        f" * {two49} AS DOUBLE) AS e_raw, {m} - n_present AS zeros"
        f" FROM (SELECT {{keys}}, sum(CAST(1 AS BIGINT)"
        f" << CAST({_HLL_RANK_BITS + 1} - max_rank AS INT)) AS s_present,"
        f" count(*) AS n_present FROM {{src}} GROUP BY {{keys}})"
    )
    return f"""
    WITH tok AS (SELECT source, unnest({_TOKS}) AS token FROM documents),
    h AS (SELECT source, md5(token) AS d FROM tok),
    r AS (SELECT source,
                 CAST(('0x' || substr(d, 1, 2)) AS BIGINT) AS register,
                 CAST(('0x' || substr(d, 3, 12)) AS BIGINT) AS v
          FROM h),
    regs AS (SELECT source, register,
                    CAST(max({_HLL_RANK_BITS} - (CASE WHEN v = 0 THEN 0
                             ELSE length(bin(v)) END) + 1) AS BIGINT)
                      AS max_rank
             FROM r GROUP BY source, register),
    est AS (SELECT source, {est} AS est_distinct
            FROM ({inner.format(keys="source", src="regs")})),
    pairs AS (SELECT a.source AS ga, b.source AS gb
              FROM (SELECT DISTINCT source FROM regs) a
              JOIN (SELECT DISTINCT source FROM regs) b
                ON a.source < b.source),
    uregs AS (SELECT ga, gb, register, max(max_rank) AS max_rank FROM (
                SELECT p.ga, p.gb, r.register, r.max_rank
                FROM pairs p JOIN regs r ON r.source = p.ga
                UNION ALL
                SELECT p.ga, p.gb, r.register, r.max_rank
                FROM pairs p JOIN regs r ON r.source = p.gb)
              GROUP BY ga, gb, register),
    uest AS (SELECT ga, gb, {est} AS est_union
             FROM ({inner.format(keys="ga, gb", src="uregs")}))
    SELECT source_a, source_b, est_a, est_b, est_union,
           round(greatest(est_a + est_b - est_union, 0.0), 4)
             AS est_intersect,
           round(round(greatest(est_a + est_b - est_union, 0.0), 4)
                 / est_union, 6) AS est_jaccard
    FROM (SELECT u.ga AS source_a, u.gb AS source_b,
                 ea.est_distinct AS est_a, eb.est_distinct AS est_b,
                 u.est_union
          FROM uest u
          JOIN est ea ON ea.source = u.ga
          JOIN est eb ON eb.source = u.gb)
    ORDER BY source_a, source_b
    """


@register(
    "sketch_hll_source_overlap",
    oracle=_hll_overlap_oracle(),
    tags=("text", "sketch", "hll", "overlap", "north-star"),
)
def sketch_hll_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary overlap between sources from ONE sketch
    pass (``operators/sketch.py:hll_set_overlap``): per source-pair
    the HLL estimates of |A|, |B|, |A u B| (register max-merge --
    union is free in the sketch), inclusion-exclusion |A n B|, and
    Jaccard -- the cross-source contamination/redundancy macro-read
    that exact distinct would pay a corpus shuffle PER PAIR for.
    The one corpus-sized agg is the grouped register build;
    everything after is (pairs x 256) rows.  The oracle replays
    registers integer-exactly and the estimates with embedded
    constants."""
    from ..operators import sketch as SK

    docs = parallelize_small(load(spark, sf_dir, "documents"))
    toks = docs.select(
        "source", F.explode(TX.tokens(F.col("text"))).alias("token")
    )
    return SK.hll_set_overlap(toks, "token", "source")


@register(
    "text_chunk_windows",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS l FROM documents),
    c AS (
      SELECT doc_id, l, len(l) AS n,
             unnest(range(CAST(floor((len(l) - 1) / 24) AS BIGINT) + 1)) AS i
      FROM toks WHERE len(l) > 0
    )
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_id,
           CAST(i * 24 AS BIGINT) AS start_tok,
           CAST(least(32, n - i * 24) AS BIGINT) AS n_tokens,
           array_to_string(l[i * 24 + 1 : least(i * 24 + 32, n)], ' ')
             AS chunk_text
    FROM c
    WHERE i = 0 OR i * 24 - 24 + 32 < n
    ORDER BY doc_id, chunk_id
    """,
    tags=("text", "north-star", "chunking", "rag"),
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG/context-window chunk materialization
    (``operators/text.py:chunk_documents``): 32-token windows every 24
    tokens (8-token overlap) with strictly-increasing ends and no
    suffix-duplicate tails -- the write-path transform feeding
    embedding and retrieval indexing.  Pure JVM sequence/explode/slice,
    token-linear output, zero shuffles."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    return TX.chunk_documents(docs, chunk_tokens=32, stride=24).orderBy(
        "doc_id", "chunk_id"
    )


def _chunk_retrieval_oracle() -> str:
    from .similarity_queries import _DOT, _NORM

    cos = (
        _DOT.format(d=64, a="q.qv", b="v.v")
        + " / ("
        + _NORM.format(d=64, a="q.qv")
        + " * "
        + _NORM.format(d=64, a="v.v")
        + ")"
    )
    hash_cells = """
      SELECT {key}, CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 64 AS idx,
             CASE WHEN CAST(('0x' || substr(md5(t), 9, 1)) AS BIGINT) % 2 = 0
                  THEN 1.0 ELSE -1.0 END AS s
      FROM {src}
    """
    densify = """
      SELECT g.{key}, list(coalesce(c2.val, 0.0) ORDER BY g.d) AS {out}
      FROM (SELECT {key}, d
            FROM (SELECT {key} FROM {cells} GROUP BY {key}
                  HAVING sum(CASE WHEN val <> 0 THEN 1 ELSE 0 END) > 0)
            CROSS JOIN range(64) t(d)) g
      LEFT JOIN {cells} c2 ON c2.{key} = g.{key} AND c2.idx = g.d
      GROUP BY g.{key}
    """
    return f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS l FROM documents),
    cgen AS (
      SELECT doc_id, l, len(l) AS n,
             unnest(range(CAST(floor((len(l) - 1) / 24) AS BIGINT) + 1)) AS i
      FROM toks WHERE len(l) > 0
    ),
    chunks AS (
      SELECT doc_id * 1000000 + i AS ck, doc_id AS chunk_doc,
             CAST(i AS BIGINT) AS chunk_id,
             array_to_string(l[i * 24 + 1 : least(i * 24 + 32, n)], ' ')
               AS chunk_text
      FROM cgen WHERE i = 0 OR i * 24 - 24 + 32 < n
    ),
    ctok AS (SELECT ck, unnest(list_filter(
               string_split_regex(chunk_text, ' +'), t -> t <> '')) AS t
             FROM chunks),
    ccells0 AS ({hash_cells.format(key="ck", src="ctok")}),
    ccells AS (SELECT ck, idx, sum(s) AS val FROM ccells0 GROUP BY ck, idx),
    cvec AS ({densify.format(key="ck", cells="ccells", out="v")}),
    qtok AS (SELECT doc_id, unnest({_TOKS}) AS t FROM documents
             WHERE doc_id < 2),
    qcells0 AS ({hash_cells.format(key="doc_id", src="qtok")}),
    qcells AS (SELECT doc_id, idx, sum(s) AS val FROM qcells0
               GROUP BY doc_id, idx),
    qvec AS ({densify.format(key="doc_id", cells="qcells", out="qv")}),
    scored AS (
      SELECT q.doc_id AS query_doc, c.chunk_doc, c.chunk_id, c.ck,
             {cos} AS cos
      FROM qvec q
      JOIN cvec v ON TRUE
      JOIN chunks c ON c.ck = v.ck AND c.chunk_doc <> q.doc_id
    )
    SELECT query_doc, chunk_doc, chunk_id, round(cos, 6) + 0.0 AS cos_sim,
           CAST(rank AS BIGINT) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_doc
                                       ORDER BY cos DESC, ck) AS rank
          FROM scored)
    WHERE rank <= 5
    ORDER BY query_doc, rank
    """


@register(
    "text_chunk_retrieval",
    oracle=_chunk_retrieval_oracle(),
    tags=("text", "north-star", "chunking", "rag", "similarity"),
)
def text_chunk_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full RAG read path as one declarative composition: chunk the
    corpus (``chunk_documents``, 32/24 windows), hash-embed every chunk
    and the query documents (``hash_embedding`` -- the engine's
    trained-model-free text->vector producer), score by exact cosine
    against the broadcast queries, top-5 chunks per query excluding
    the query's own document.  Every stage already holds its own
    oracle-checked row; this row proves the COMPOSITION replays
    bit-for-bit (chunk boundaries -> token hashing -> sign cells ->
    dense fold -> cosine -> ranking) in one SQL statement."""
    from ..operators.similarity import cosine

    docs = parallelize_small(load(spark, sf_dir, "documents"))
    # Chunk key = doc_id * 10^6 + chunk_id -- the SAME key scheme as the
    # streaming write twin (streaming/pipeline.py:
    # start_chunk_embed_ingest_sink), which asserts chunk_id < 10^6.  A
    # narrower multiplier (an earlier revision used 100) collides a
    # >=100-chunk document (~2,400+ tokens at 32/24) into the next
    # doc's key space, and because the oracle replays the same formula
    # the correctness harness cannot see the corruption.
    chunks = TX.chunk_documents(docs, chunk_tokens=32, stride=24).select(
        (F.col("doc_id") * 1_000_000 + F.col("chunk_id")).alias("ck"),
        F.col("doc_id").alias("chunk_doc"),
        "chunk_id",
        "chunk_text",
    )
    cemb = TX.hash_embedding(
        chunks, dim=64, id_col="ck", text_col="chunk_text"
    )
    qemb = TX.hash_embedding(docs.where(F.col("doc_id") < 2), dim=64).select(
        F.col("doc_id").alias("query_doc"), F.col("embedding").alias("qv")
    )
    # chunk_doc / chunk_id are RECOVERED arithmetically from the
    # composite key (ck = doc_id * 10^6 + chunk_id is invertible while
    # chunk_id < 10^6, asserted by the streaming twin) instead of
    # joined back from the chunk table: the join re-ran the whole
    # chunk_documents window subtree a second time as its build side
    # (plan-audited: 2x Scan+Window -> 1x, one join removed --
    # guide §2.4).
    scored = (
        cemb.select(
            "ck",
            # Integer division (not floor of a double quotient): exact
            # for every long, where double division is exact only below
            # 2^53.  doc_id >= 0 by corpus contract, so % keeps the
            # dividend sign and recovers chunk_id exactly.
            F.expr("ck div 1000000").alias("chunk_doc"),
            (F.col("ck") % 1_000_000).cast("long").alias("chunk_id"),
            "embedding",
        )
        .join(F.broadcast(qemb), F.col("chunk_doc") != F.col("query_doc"))
        .select(
            "query_doc",
            "chunk_doc",
            "chunk_id",
            "ck",
            cosine(F.col("qv"), F.col("embedding")).alias("cos"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_doc").orderBy(F.desc("cos"), F.asc("ck"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 5)
        .select(
            "query_doc",
            "chunk_doc",
            "chunk_id",
            F.round("cos", 6).alias("cos_sim"),
            "rank",
        )
        .orderBy("query_doc", "rank")
    )
