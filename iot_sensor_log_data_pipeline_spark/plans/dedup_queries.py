"""Deduplication catalog queries (north star: exact, n-gram Jaccard,
MinHash-LSH, SimHash) over ``documents``.

The MinHash/Jaccard oracles replay the md5-based pipeline stage-for-
stage in DuckDB SQL, so the correctness gate covers candidate
generation AND verification, not just the final pair set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io_utils import load, parallelize_small
from ..operators import dedup as DD
from .catalog import register

#: Shared DuckDB fragments: tokenization and distinct 3-gram shingles.
_TOKS = "list_filter(string_split_regex(text, ' +'), t -> t <> '')"
_SHINGLES_CTE = f"""
    toks AS (SELECT doc_id, {_TOKS} AS l FROM documents),
    shingles AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(greatest(len(l) - 2, 0)),
               i -> l[i+1] || ' ' || l[i+2] || ' ' || l[i+3]))) AS shingle
      FROM toks
    ),
    sizes AS (SELECT doc_id, count(*) AS set_size FROM shingles GROUP BY doc_id)
"""

#: Corpus-relative stop-shingle cap (mirrors
#: ``dedup.effective_max_shingle_df``): max(floor, ceil(frac * n_docs)).
_CAP_SQL = (
    f"(SELECT greatest({DD.DEFAULT_MAX_SHINGLE_DF}, "
    f"CAST(ceil({DD.DEFAULT_MAX_SHINGLE_FRAC} * count(*)) AS BIGINT)) "
    "FROM documents)"
)

#: Shared-shingle candidate pairs from the stop-shingle-pruned table,
#: verified by recounting the intersection over the FULL shingle table
#: (pruning affects candidate generation only, never the reported
#: Jaccard -- mirrors ``dedup.ngram_jaccard_pairs``).
_NGRAM_INTER_CTE = f"""
    rare AS (
      SELECT shingle FROM shingles GROUP BY shingle
      HAVING count(*) <= {_CAP_SQL}
    ),
    pruned AS (SELECT s.* FROM shingles s JOIN rare r ON s.shingle = r.shingle),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM pruned a JOIN pruned b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    ),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS n_common
      FROM cand c
      JOIN shingles a ON a.doc_id = c.id_a
      JOIN shingles b ON b.doc_id = c.id_b AND b.shingle = a.shingle
      GROUP BY c.id_a, c.id_b
    )
"""


@register(
    "dedup_exact_documents",
    oracle="""
    SELECT d.doc_id, d.source, d.n_chars
    FROM documents d
    JOIN (SELECT text, min(doc_id) AS doc_id FROM documents GROUP BY text) s
      ON d.doc_id = s.doc_id AND d.text = s.text
    ORDER BY d.doc_id
    """,
    tags=("dedup", "north-star", "exact"),
)
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one survivor (min doc_id) per distinct text via
    hash-groupBy + semi join -- never a pairwise compare.  At 100 TB
    group on md5(text) instead of the full text to shrink shuffle keys."""
    docs = load(spark, sf_dir, "documents")
    survivors = DD.exact_dedup(docs, ["text"], "doc_id")
    return survivors.select("doc_id", "source", "n_chars").orderBy("doc_id")


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    {_NGRAM_INTER_CTE}
    SELECT i.id_a, i.id_b,
           round(i.n_common / (sa.set_size + sb.set_size - i.n_common), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    WHERE i.n_common / (sa.set_size + sb.set_size - i.n_common) >= 0.6
    ORDER BY id_a, id_b
    """,
    tags=("dedup", "north-star", "jaccard"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard near-dup pairs: shared-shingle candidates with
    corpus-relative stop-shingle capping (candidate generation only);
    exact Jaccard >= 0.6 recounted over unpruned shingle sets."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    pairs = DD.ngram_jaccard_pairs(docs, threshold=0.6)
    return pairs.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("id_a", "id_b")


@register(
    "dedup_prefix_filter_jaccard",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM shingles a JOIN shingles b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    ),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS n_common
      FROM cand c
      JOIN shingles a ON a.doc_id = c.id_a
      JOIN shingles b ON b.doc_id = c.id_b AND b.shingle = a.shingle
      GROUP BY c.id_a, c.id_b
    )
    SELECT i.id_a, i.id_b,
           round(i.n_common / (sa.set_size + sb.set_size - i.n_common), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    WHERE i.n_common / (sa.set_size + sb.set_size - i.n_common) >= 0.6
    ORDER BY id_a, id_b
    """,
    tags=("dedup", "north-star", "jaccard", "prefix-filter"),
)
def dedup_prefix_filter_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Jaccard >= 0.6 pairs via prefix filtering (All-Pairs /
    PPJoin candidate generation): only each doc's (1-t)-fraction
    rarest shingles are indexed, yet the candidate set is provably
    complete -- so the oracle here is the UNPRUNED exact answer (the
    stop-shingle-capped ``dedup_ngram_jaccard`` oracle bakes its
    heuristic into the SQL; this one doesn't have to)."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    pairs = DD.prefix_filter_jaccard_pairs(docs, threshold=0.6)
    return pairs.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("id_a", "id_b")


#: The affine-permutation coefficient table, embedded as literals from
#: the same source (``dedup.MINHASH_COEFFS``) the Spark plan uses.
_COEF_ROWS = ", ".join(
    f"({s}, {a1}, {a2}, {a3}, {a4}, {b})"
    for s, (a1, a2, a3, a4, b) in enumerate(DD.MINHASH_COEFFS)
)
_P = DD.MINHASH_PRIME

#: Shared replay of the salted-md5 minhash signatures and band
#: re-hash (``dedup.minhash_signatures_wide`` + ``minhash_bands``),
#: ending at ``bands(doc_id, band_id, band_val)`` -- used by the pair
#: join and the banding cost report.
_MINHASH_BANDS_CTES = f"""
    coefs AS (
      SELECT * FROM (VALUES {_COEF_ROWS}) AS t(seed, a1, a2, a3, a4, b)
    ),
    words AS (
      SELECT doc_id, shingle,
             CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS w1,
             CAST(('0x' || substr(md5(shingle), 9, 8)) AS BIGINT) AS w2,
             CAST(('0x' || substr(md5(shingle), 17, 8)) AS BIGINT) AS w3,
             CAST(('0x' || substr(md5(shingle), 25, 8)) AS BIGINT) AS w4
      FROM shingles
    ),
    mh AS (
      SELECT doc_id, seed,
             min(((a1 * w1) % {_P} + (a2 * w2) % {_P} + (a3 * w3) % {_P}
                  + (a4 * w4) % {_P} + b) % {_P}) AS min_hash
      FROM words CROSS JOIN coefs
      GROUP BY doc_id, seed
    ),
    bands AS (
      SELECT doc_id, seed // {DD.ROWS_PER_BAND} AS band_id,
             md5(string_agg(CAST(min_hash AS VARCHAR), '|' ORDER BY seed)) AS band_val
      FROM mh GROUP BY doc_id, seed // {DD.ROWS_PER_BAND}
    )
"""


@register(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    {_MINHASH_BANDS_CTES},
    cand AS (
      SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
      FROM bands x JOIN bands y
        ON x.band_id = y.band_id AND x.band_val = y.band_val
       AND x.doc_id < y.doc_id
    ),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS n_common
      FROM cand c
      JOIN shingles a ON a.doc_id = c.id_a
      JOIN shingles b ON b.doc_id = c.id_b AND b.shingle = a.shingle
      GROUP BY c.id_a, c.id_b
    )
    SELECT i.id_a, i.id_b,
           round(i.n_common / (sa.set_size + sb.set_size - i.n_common), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    WHERE i.n_common / (sa.set_size + sb.set_size - i.n_common) >= 0.7
    ORDER BY id_a, id_b
    """,
    tags=("dedup", "north-star", "minhash", "lsh"),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs (16 perms, 4 bands x 4): band-bucket
    equi-join candidates, exact-Jaccard >= 0.7 verification.  The
    oracle replays every stage (salted-md5 minhash, band re-hash,
    candidate join, verification) in DuckDB."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    pairs = DD.minhash_lsh_pairs(docs, threshold=0.7)
    return pairs.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("id_a", "id_b")


@register(
    "dedup_simhash",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_transform(
               list_distinct(list_filter(string_split_regex(text, ' +'),
                                         t -> t <> '')),
               t -> md5(t)) AS hashes
      FROM documents
    )
    SELECT doc_id,
           list_aggregate(
             list_transform(range(64), lane ->
               CASE WHEN list_sum(list_transform(hashes, h ->
                 CASE WHEN (strpos('0123456789abcdef',
                                   substring(h, lane // 4 + 1, 1)) - 1)
                           // CAST(pow(2, 3 - lane % 4) AS INT) % 2 = 1
                      THEN 1 ELSE -1 END)) > 0
               THEN '1' ELSE '0' END),
             'string_agg', '') AS simhash
    FROM toks
    ORDER BY doc_id
    """,
    tags=("dedup", "north-star", "simhash"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 64-bit SimHash (bit-string form), entirely JVM-side
    via higher-order array folds.  Verified two ways: a hand-computed
    Python oracle (tests/test_operators.py) AND a full DuckDB SQL
    oracle that re-derives every lane bit from md5 hex chars."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id", DD.simhash64(F.col("text")).alias("simhash")
    ).orderBy("doc_id")


@register(
    "dedup_weighted_simhash",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, ' +'), t -> t <> '') AS l
      FROM documents
    ),
    tok AS (SELECT doc_id, unnest(l) AS token FROM toks),
    tfd AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
    dfd AS (SELECT token, count(*) AS df FROM tfd GROUP BY token),
    n AS (SELECT count(*) AS n FROM documents),
    w AS (
      SELECT tfd.doc_id, tfd.token, tfd.tf * (n.n // dfd.df) AS weight
      FROM tfd JOIN dfd USING (token) CROSS JOIN n
    ),
    votes AS (
      SELECT doc_id, lane,
             sum(CASE WHEN (strpos('0123456789abcdef',
                                   substring(md5(token), lane // 4 + 1, 1)) - 1)
                           // CAST(pow(2, 3 - lane % 4) AS INT) % 2 = 1
                      THEN weight ELSE -weight END) AS v
      FROM w CROSS JOIN range(64) r(lane)
      GROUP BY doc_id, lane
    )
    SELECT doc_id,
           string_agg(CASE WHEN v > 0 THEN '1' ELSE '0' END, '' ORDER BY lane)
             AS simhash
    FROM votes GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("dedup", "north-star", "simhash"),
)
def dedup_weighted_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf*rarity-WEIGHTED 64-bit SimHash
    (``operators/dedup.py:weighted_simhash64``): rare distinguishing
    terms outvote boilerplate, the unweighted simhash's failure mode on
    template-heavy corpora.  Integer weights (tf * N//df) keep every
    lane sum order-independent, so the DuckDB oracle re-derives every
    bit exactly."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    return DD.weighted_simhash64(docs).orderBy("doc_id")


@register(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    {_NGRAM_INTER_CTE},
    edges AS (
      SELECT i.id_a, i.id_b
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.id_a
      JOIN sizes sb ON sb.doc_id = i.id_b
      WHERE i.n_common / (sa.set_size + sb.set_size - i.n_common) >= 0.4
    ),
    sym AS (
      SELECT id_a AS s, id_b AS d FROM edges
      UNION ALL SELECT id_b, id_a FROM edges
    ),
    reach(node, r) AS (
      SELECT s, s FROM sym
      UNION
      SELECT sym.s, reach.r FROM sym JOIN reach ON sym.d = reach.node
    )
    SELECT comp.component AS cluster_id,
           count(*) AS n_docs
    FROM (SELECT node, min(r) AS component FROM reach GROUP BY node) comp
    GROUP BY comp.component
    ORDER BY cluster_id
    """,
    tags=("dedup", "north-star", "clustering"),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: pairwise Jaccard matches (>= 0.4) promoted to
    connected components via iterative min-label propagation
    (operators/dedup.connected_components) -- the step that turns
    match pairs into dedup groups with a canonical survivor (min doc
    id = cluster id).  Oracle computes the same components with a
    recursive transitive-closure CTE."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    pairs = DD.ngram_jaccard_pairs(docs, threshold=0.4)
    comp = DD.connected_components(pairs)
    return (
        comp.groupBy(F.col("component").alias("cluster_id"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("cluster_id")
    )


@register(
    "dedup_embedding_cosine",
    oracle="""
    WITH n AS (
      SELECT vec_id, embedding,
             sqrt(list_sum(list_transform(range(64),
               i -> CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE)))) AS nrm
      FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_sum(list_transform(range(64),
             i -> CAST(a.embedding[i+1] AS DOUBLE) * CAST(b.embedding[i+1] AS DOUBLE)))
             / (a.nrm * b.nrm), 6) + 0.0 AS cos_sim
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE list_sum(list_transform(range(64),
            i -> CAST(a.embedding[i+1] AS DOUBLE) * CAST(b.embedding[i+1] AS DOUBLE)))
          / (a.nrm * b.nrm) >= 0.42
    ORDER BY id_a, id_b
    """,
    tags=("dedup", "north-star", "embedding", "cosine"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (vector-space dedup family):
    exact upper-triangle pass with precomputed norms -- the
    oracle-checkable baseline; ``method='lsh'`` in
    ``operators.similarity.embedding_cosine_pairs`` is the bucketed
    scale path, recall-tested against this exact output.  Threshold
    0.42 is tuned to the synthetic corpus (near-uniform vectors: no
    pairs exist above 0.6)."""
    from ..operators import similarity as S

    emb = parallelize_small(load(spark, sf_dir, "embeddings"))
    pairs = S.embedding_cosine_pairs(emb, threshold=0.42, method="exact")
    return pairs.select(
        "id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim")
    ).orderBy("id_a", "id_b")


@register(
    "dedup_passage_chunks",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
    starts AS (
      SELECT doc_id, w,
             unnest(range(0, greatest(len(w) - 8, 0) + 1, 4)) AS s
      FROM toks
    ),
    per_doc AS (
      SELECT DISTINCT doc_id,
             md5(array_to_string(list_slice(w, s + 1, s + 8), ' ')) AS chunk
      FROM starts
    ),
    freq AS (SELECT chunk, count(*) AS docs_with FROM per_doc GROUP BY chunk)
    SELECT p.doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN f.docs_with > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_chunks,
           round(sum(CASE WHEN f.docs_with > 1 THEN 1 ELSE 0 END) / count(*), 6)
             AS dup_chunk_ratio
    FROM per_doc p JOIN freq f USING (chunk)
    GROUP BY p.doc_id
    ORDER BY p.doc_id
    """,
    tags=("dedup", "north-star", "passage"),
)
def dedup_passage_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-passage statistics (``operators/dedup.py:
    duplicated_passage_stats``): 8-token chunks every 4 tokens, md5'd
    in-row; a document's dup_chunk_ratio is the fraction of its
    distinct chunks shared with another document -- the chunk-level
    relaxation of exact substring dedup.  Shuffles are the chunk-hash
    groupBy and the per-doc rollup, both linear."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    return DD.duplicated_passage_stats(docs, k=8, stride=4).orderBy("doc_id")


def _pagerank_oracle(n_iter: int = 5) -> str:
    """Chained-CTE replay of ``operators/graph.py:pagerank_fixed`` over
    the exact embedding-cosine pair graph (threshold 0.42): one CTE per
    power iteration, identical FP operand order."""
    prev = "r0"
    iters = []
    for t in range(1, n_iter + 1):
        iters.append(
            f"""r{t} AS (
      SELECT nodes.node,
             (1 - 0.85) / nn.n + 0.85 * COALESCE(s.s, 0.0) AS rank
      FROM nodes CROSS JOIN nn
      LEFT JOIN (SELECT und.v AS node, sum({prev}.rank / deg.outdeg) AS s
                 FROM und
                 JOIN {prev} ON {prev}.node = und.u
                 JOIN deg ON deg.u = und.u
                 GROUP BY und.v) s ON s.node = nodes.node
    )"""
        )
        prev = f"r{t}"
    chained = ",\n    ".join(iters)
    return f"""
    WITH pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM (SELECT vec_id, embedding,
                   sqrt(list_sum(list_transform(range(64),
                     i -> CAST(embedding[i+1] AS DOUBLE)
                          * CAST(embedding[i+1] AS DOUBLE)))) AS nrm
            FROM embeddings) a
      JOIN (SELECT vec_id, embedding,
                   sqrt(list_sum(list_transform(range(64),
                     i -> CAST(embedding[i+1] AS DOUBLE)
                          * CAST(embedding[i+1] AS DOUBLE)))) AS nrm
            FROM embeddings) b
        ON a.vec_id < b.vec_id
      WHERE list_sum(list_transform(range(64),
              i -> CAST(a.embedding[i+1] AS DOUBLE)
                   * CAST(b.embedding[i+1] AS DOUBLE)))
            / (a.nrm * b.nrm) >= 0.42
    ),
    und AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b AS u, id_a AS v FROM pairs
    ),
    nodes AS (SELECT DISTINCT u AS node FROM und),
    deg AS (SELECT u, count(*) AS outdeg FROM und GROUP BY u),
    nn AS (SELECT count(*) AS n FROM nodes),
    r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn),
    {chained}
    SELECT node, round(rank, 6) AS rank FROM r{n_iter} ORDER BY node
    """


@register(
    "graph_pagerank_neardup",
    oracle=_pagerank_oracle(),
    tags=("dedup", "graph", "pagerank"),
)
def graph_pagerank_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank hubs of the near-dup graph (``operators/graph.py``):
    5 fixed power iterations over the exact embedding-cosine pairs --
    the canonical-document signal for survivor choice (the doc every
    near-copy points at).  Iterative-DataFrame shape: each round is one
    edge join + one node aggregation, replayed by the oracle as
    chained CTEs."""
    from ..operators import similarity as S
    from ..operators.graph import pagerank_fixed

    emb = parallelize_small(load(spark, sf_dir, "embeddings"))
    pairs = S.embedding_cosine_pairs(emb, threshold=0.42, method="exact")
    return pagerank_fixed(pairs.select("id_a", "id_b"))


@register(
    "dedup_survivor_selection",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    {_NGRAM_INTER_CTE},
    edges AS (
      SELECT i.id_a, i.id_b
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.id_a
      JOIN sizes sb ON sb.doc_id = i.id_b
      WHERE i.n_common / (sa.set_size + sb.set_size - i.n_common) >= 0.4
    ),
    sym AS (
      SELECT id_a AS s, id_b AS d FROM edges
      UNION ALL SELECT id_b, id_a FROM edges
    ),
    reach(node, r) AS (
      SELECT s, s FROM sym
      UNION
      SELECT sym.s, reach.r FROM sym JOIN reach ON sym.d = reach.node
    ),
    comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
    ranked AS (
      SELECT c.component AS cluster_id, c.node AS doc_id,
             row_number() OVER (PARTITION BY c.component
                                ORDER BY d.n_chars DESC, c.node) AS rn
      FROM comp c JOIN documents d ON d.doc_id = c.node
    )
    SELECT cluster_id,
           max(CASE WHEN rn = 1 THEN doc_id END) AS survivor_id,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM ranked
    GROUP BY cluster_id
    ORDER BY cluster_id
    """,
    tags=("dedup", "north-star", "survivor"),
)
def dedup_survivor_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The step after clustering: pick ONE canonical document per
    near-dup cluster -- longest document wins (n_chars desc), doc id
    breaks ties -- and report what each cluster keeps vs drops.
    Composition of the pair -> component -> rank pipeline; at scale
    the survivor choice is a bounded per-component window, never a
    cross-cluster shuffle."""
    from pyspark.sql.window import Window

    docs = parallelize_small(load(spark, sf_dir, "documents"))
    pairs = DD.ngram_jaccard_pairs(docs, threshold=0.4)
    comp = DD.connected_components(pairs)
    ranked = comp.join(docs.select("doc_id", "n_chars"), comp.node == F.col("doc_id")).select(
        F.col("component").alias("cluster_id"),
        "doc_id",
        F.row_number()
        .over(
            Window.partitionBy("component").orderBy(
                F.desc("n_chars"), F.asc("doc_id")
            )
        )
        .alias("rn"),
    )
    return (
        ranked.groupBy("cluster_id")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).alias("survivor_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .orderBy("cluster_id")
    )


#: DuckDB double dot / norm over the 64-dim embedding column (same
#: fragments as plans/similarity_queries.py -- explicit element order,
#: double accumulation, mirroring the Spark sequential fold).
_EDOT = (
    "list_sum(list_transform(range(64), "
    "i -> CAST({a}[i+1] AS DOUBLE) * CAST({b}[i+1] AS DOUBLE)))"
)
_ENORM = (
    "sqrt(list_sum(list_transform(range(64), "
    "i -> CAST({a}[i+1] AS DOUBLE) * CAST({a}[i+1] AS DOUBLE))))"
)

#: Seed quantizer + 1-NN cell assignment (argmax dot, ties to the
#: lower cell id) -- the pinned-quantizer stage shared by both
#: SemDeDup oracles, identical to the IVF seed oracle's assignment.
_SEMDEDUP_ASSIGN_CTE = f"""
    cent AS (
      SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
               AS cell,
             embedding AS cv
      FROM embeddings
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
      LIMIT 16
    ),
    dots AS (
      SELECT e.vec_id, c.cell,
             {_EDOT.format(a='e.embedding', b='c.cv')} AS dp
      FROM embeddings e CROSS JOIN cent c
    ),
    assigned AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id ORDER BY dp DESC, cell) AS rn
        FROM dots)
      WHERE rn = 1
    ),
    sem_pairs AS (
      SELECT a.cell, a.vec_id AS id_a, b.vec_id AS id_b,
             {_EDOT.format(a='ea.embedding', b='eb.embedding')}
               / ({_ENORM.format(a='ea.embedding')}
                  * {_ENORM.format(a='eb.embedding')}) AS cos_sim
      FROM assigned a
      JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id
      JOIN embeddings ea ON ea.vec_id = a.vec_id
      JOIN embeddings eb ON eb.vec_id = b.vec_id
    )
"""


@register(
    "dedup_semantic_pairs",
    oracle=f"""
    WITH {_SEMDEDUP_ASSIGN_CTE}
    SELECT cell, id_a, id_b, round(cos_sim, 6) + 0.0 AS cos_sim
    FROM sem_pairs
    WHERE cos_sim >= 0.3
    ORDER BY cell, id_a, id_b
    """,
    tags=("dedup", "north-star", "semantic", "embedding"),
)
def dedup_semantic_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup stage 1-2 (``operators/semdedup.py``, Abbas et al.
    2023): 1-NN coarse-quantize every embedding against the pinned
    16-cell seed quantizer, then report WITHIN-CELL pairs with cosine
    >= 0.3 -- a cell-keyed self-join whose cost is the sum of per-cell
    squares, never the corpus square.  The oracle replays quantizer,
    assignment, and pair scoring stage-for-stage."""
    from ..operators import semdedup as SD
    from ..operators import similarity as SIM

    emb = parallelize_small(load(spark, sf_dir, "embeddings"))
    cents = SIM.seed_centroids(emb, 16)
    return (
        SD.semantic_pairs(emb, 0.3, cents)
        .select(
            F.col("cell").cast("long").alias("cell"),
            "id_a",
            "id_b",
            F.round("cos_sim", 6).alias("cos_sim"),
        )
        .orderBy("cell", "id_a", "id_b")
    )


@register(
    "dedup_semantic_survivors",
    oracle=f"""
    WITH RECURSIVE {_SEMDEDUP_ASSIGN_CTE},
    edges AS (SELECT id_a, id_b FROM sem_pairs WHERE cos_sim >= 0.3),
    sym AS (
      SELECT id_a AS s, id_b AS d FROM edges
      UNION ALL SELECT id_b, id_a FROM edges
    ),
    reach(node, r) AS (
      SELECT s, s FROM sym
      UNION
      SELECT sym.s, reach.r FROM sym JOIN reach ON sym.d = reach.node
    ),
    comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
    keepers AS (SELECT component, min(node) AS keep FROM comp GROUP BY component),
    dropped AS (
      SELECT c.node FROM comp c JOIN keepers k ON c.component = k.component
      WHERE c.node <> k.keep
    )
    SELECT e.vec_id, CAST(e.label AS INT) AS label
    FROM embeddings e
    WHERE e.vec_id NOT IN (SELECT node FROM dropped)
    ORDER BY e.vec_id
    """,
    tags=("dedup", "north-star", "semantic", "embedding", "components"),
)
def dedup_semantic_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full SemDeDup: within-cell cosine pairs (>= 0.3) -> connected
    components (pointer-jumping) -> min-id exemplar survives each
    component; singletons pass through untouched.  The embedding-space
    dedup that catches paraphrases token-level MinHash cannot.  The
    oracle rebuilds the components with a recursive min-label CTE."""
    from ..operators import semdedup as SD
    from ..operators import similarity as SIM

    emb = parallelize_small(load(spark, sf_dir, "embeddings"))
    cents = SIM.seed_centroids(emb, 16)
    return (
        SD.semantic_dedup(emb, 0.3, centroids=cents)
        .select("vec_id", F.col("label").cast("int").alias("label"))
        .orderBy("vec_id")
    )


@register(
    "dedup_ngram_containment",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    {_NGRAM_INTER_CTE}
    SELECT i.id_a, i.id_b,
           round(i.n_common / least(sa.set_size, sb.set_size), 6)
             AS containment
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    WHERE i.n_common / least(sa.set_size, sb.set_size) >= 0.5
    ORDER BY i.id_a, i.id_b
    """,
    tags=("dedup", "north-star", "containment"),
)
def dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric set containment (Broder 1997):
    |A n B| / min(|A|, |B|) >= 0.5 over 3-gram shingles -- catches a
    short document embedded verbatim in a longer one, which symmetric
    Jaccard under-scores (the union is dominated by the long doc).
    Shares the jaccard pipeline's candidate generation and full-table
    verification (``operators/dedup.py:ngram_containment_pairs``)."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    return (
        DD.ngram_containment_pairs(docs, threshold=0.5)
        .select("id_a", "id_b", F.round("containment", 6).alias("containment"))
        .orderBy("id_a", "id_b")
    )


@register(
    "dedup_entity_fuzzy_names",
    oracle=f"""
    WITH base AS (
      SELECT p_partkey AS id, p_name AS nm, l[len(l)] AS blk
      FROM (SELECT p_partkey, p_name,
                   list_filter(string_split_regex(p_name, ' +'),
                               t -> t <> '') AS l
            FROM part)
    )
    SELECT least(a.nm, b.nm) AS name_a,
           greatest(a.nm, b.nm) AS name_b,
           CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist,
           count(*) AS n_record_pairs
    FROM base a JOIN base b ON a.blk = b.blk AND a.id < b.id
    WHERE levenshtein(a.nm, b.nm) BETWEEN 1 AND 2
    GROUP BY 1, 2, 3
    ORDER BY name_a, name_b
    """,
    tags=("dedup", "entity-resolution", "fuzzy", "blocking"),
)
def dedup_entity_fuzzy_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution fuzzy matching
    (``operators/dedup.py:blocked_levenshtein_pairs``): part-name
    pairs within 2 Levenshtein edits, blocked on the head noun (the
    record-linkage blocking that keeps the comparison block-quadratic,
    never corpus-quadratic), rolled up to distinct NAME pairs with the
    record-pair count -- the reviewable 'are these the same entity?'
    worklist, bounded by vocabulary size however many records repeat
    each name."""
    part = parallelize_small(load(spark, sf_dir, "part"))
    pairs = DD.blocked_levenshtein_pairs(part, "p_partkey", "p_name", max_dist=2)
    return (
        pairs.where(F.col("dist") >= 1)
        .select(
            F.least("name_a", "name_b").alias("name_a"),
            F.greatest("name_a", "name_b").alias("name_b"),
            "dist",
        )
        .groupBy("name_a", "name_b", "dist")
        .agg(F.count(F.lit(1)).alias("n_record_pairs"))
        .orderBy("name_a", "name_b")
    )


@register(
    "dedup_semantic_text_survivors",
    oracle=f"""
    WITH RECURSIVE
    toks AS (SELECT doc_id, {_TOKS} AS l FROM documents),
    tok AS (SELECT doc_id, unnest(l) AS t FROM toks),
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
    ),
    cent AS (
      SELECT row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               - 1 AS cell,
             e AS cv
      FROM emb
      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
      LIMIT 128
    ),
    dots AS (
      SELECT emb.doc_id, cent.cell,
             {_EDOT.format(a='emb.e', b='cent.cv')} AS dp
      FROM emb CROSS JOIN cent
    ),
    assigned AS (
      SELECT doc_id, cell FROM (
        SELECT doc_id, cell,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY dp DESC, cell) AS rn
        FROM dots)
      WHERE rn = 1
    ),
    sem_pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             {_EDOT.format(a='ea.e', b='eb.e')}
               / ({_ENORM.format(a='ea.e')} * {_ENORM.format(a='eb.e')})
               AS cos_sim
      FROM assigned a
      JOIN assigned b ON a.cell = b.cell AND a.doc_id < b.doc_id
      JOIN emb ea ON ea.doc_id = a.doc_id
      JOIN emb eb ON eb.doc_id = b.doc_id
    ),
    edges AS (SELECT id_a, id_b FROM sem_pairs WHERE cos_sim >= 0.9),
    sym AS (
      SELECT id_a AS s, id_b AS d FROM edges
      UNION ALL SELECT id_b, id_a FROM edges
    ),
    reach(node, r) AS (
      SELECT s, s FROM sym
      UNION
      SELECT sym.s, reach.r FROM sym JOIN reach ON sym.d = reach.node
    ),
    comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
    keepers AS (SELECT component, min(node) AS keep FROM comp GROUP BY component),
    dropped AS (
      SELECT c.node FROM comp c JOIN keepers k ON c.component = k.component
      WHERE c.node <> k.keep
    )
    SELECT e.doc_id
    FROM emb e
    WHERE e.doc_id NOT IN (SELECT node FROM dropped)
    ORDER BY e.doc_id
    """,
    tags=("dedup", "north-star", "semantic", "text", "composition"),
)
def dedup_semantic_text_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END text semantic dedup -- the composition a curation
    user actually runs: documents -> feature-hashing embeddings
    (``operators/text.py:hash_embedding``, no trained model) -> full
    SemDeDup (1-NN cells on the pinned 128-seed quantizer -> within-
    cell cosine >= 0.9 pairs -> connected components -> min-id
    exemplar).  Every stage is md5-derived, so the oracle replays
    hashing, quantizer, assignment, pairs, and components
    stage-for-stage in SQL.

    Scale shape -- pinned vs production: this row PINS an md5-seeded
    quantizer with the cap off so the oracle replays in one statement,
    which makes within-cell pairs quadratic in corpus/n_cells.  The
    round-13 16-cell pin measured 45x wall at 10x docs (6.5 s ->
    296 s, SCALE.md); round 14 re-pinned at 128 cells (the verdict
    fix: md5-seeded centroids replay identically in SQL at ANY pinned
    count), shrinking the within-cell pair stage 8x while keeping the
    oracle gate honest.  The production call (``semantic_dedup`` with
    no pinned centroids) derives ``n_cells ~ N / target_cell_size``
    and recursively splits any cell past ``4 * target_cell_size``
    members, which measured 2.16x at the same 10x (18.7 s -> 40.4 s
    -- pairs stay cell-bounded).  The pinned shape is the ORACLE
    GATE, not the deployment recipe."""
    from ..operators import semdedup as SD
    from ..operators import similarity as SIM
    from ..operators import text as TX

    docs = parallelize_small(load(spark, sf_dir, "documents"))
    # Lazy checkpoint: the embedding table feeds the quantizer sample,
    # the cell assignment, AND the survivor anti-join -- without it the
    # token explode + two hash aggs re-run per consumer (bench: ~3x).
    # The checkpointed agg output is AQE-coalesced (tiny at test
    # scale, ~1 partition), so re-spread it before the Arrow
    # assignment UDF -- same test-scale contract as the scan wrap
    # above; a no-op once the table is big enough to keep its splits.
    emb = parallelize_small(
        TX.hash_embedding(docs, dim=64).localCheckpoint(eager=False)
    )
    cents = SIM.seed_centroids(emb, 128, id_col="doc_id", vec_col="embedding")
    surv = SD.semantic_dedup(
        emb, 0.9, centroids=cents, id_col="doc_id", vec_col="embedding"
    )
    return surv.select("doc_id").orderBy("doc_id")


#: Shared verbatim-run pipeline (anchors -> stop-gram cap -> anchor
#: join -> diagonal islands -> runs), reused by the run-report and the
#: span-removal oracles.
_VERBATIM_RUNS_CTE = f"""
    toks AS (SELECT doc_id, {_TOKS} AS l FROM documents),
    pg AS (
      SELECT doc_id, i AS pos, array_to_string(l[i+1:i+8], ' ') AS gram
      FROM (SELECT doc_id, l, unnest(range(len(l) - 7)) AS i
            FROM toks WHERE len(l) >= 8)
    ),
    heavy AS (
      SELECT gram FROM pg GROUP BY gram
      HAVING count(DISTINCT doc_id) > {_CAP_SQL}
          OR count(*) > 4 * {_CAP_SQL}
    ),
    kept AS (SELECT * FROM pg WHERE gram NOT IN (SELECT gram FROM heavy)),
    cand AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             a.pos - b.pos AS diag, a.pos AS pa
      FROM kept a JOIN kept b ON a.gram = b.gram AND a.doc_id < b.doc_id
    ),
    isl AS (
      SELECT *,
             CASE WHEN pa - lag(pa) OVER (PARTITION BY id_a, id_b, diag
                                          ORDER BY pa) = 1
                  THEN 0 ELSE 1 END AS brk
      FROM cand
    ),
    isl2 AS (
      SELECT *, sum(brk) OVER (PARTITION BY id_a, id_b, diag
                               ORDER BY pa) AS island
      FROM isl
    ),
    runs AS (
      SELECT id_a, id_b, min(pa) AS a_start, min(pa) - diag AS b_start,
             CAST(count(*) + 7 AS BIGINT) AS run_len
      FROM isl2 GROUP BY id_a, id_b, diag, island
    )
"""


@register(
    "dedup_verbatim_runs",
    oracle=f"""
    WITH {_VERBATIM_RUNS_CTE}
    SELECT id_a, id_b, a_start, b_start, run_len
    FROM runs
    WHERE run_len >= 15
    ORDER BY id_a, id_b, a_start, b_start
    """,
    tags=("dedup", "north-star", "verbatim", "substring"),
)
def dedup_verbatim_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document EXACT substring dedup
    (``operators/dedup.py:verbatim_runs``, Lee et al. 2022): every
    maximal verbatim token run >= 15 tokens shared by two documents,
    with both 0-based offsets -- the arbitrary-length verbatim-overlap
    detector that fixed-width passage chunks approximate.  Suffix-
    array semantics re-expressed Spark-first: shared 8-gram anchor
    equi-join (stop-gram capped), then gaps-and-islands per
    (pair, diagonal) -- a maximal island of step-1 anchor starts IS a
    maximal run.  The oracle replays anchors, cap, join, and islands
    stage-for-stage."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    return (
        DD.verbatim_runs(docs, k=8, min_len=15)
        .orderBy("id_a", "id_b", "a_start", "b_start")
    )


@register(
    "dedup_verbatim_clean",
    oracle=f"""
    WITH {_VERBATIM_RUNS_CTE},
    spans AS (
      SELECT id_b AS id, b_start AS s, b_start + run_len AS e
      FROM runs WHERE run_len >= 15
    ),
    m1 AS (
      SELECT *, max(e) OVER (PARTITION BY id ORDER BY s, e
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS prev_max
      FROM spans
    ),
    m2 AS (
      SELECT *, CASE WHEN prev_max IS NULL OR s > prev_max
                     THEN 1 ELSE 0 END AS nw
      FROM m1
    ),
    m3 AS (
      SELECT *, sum(nw) OVER (PARTITION BY id ORDER BY s, e
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS island
      FROM m2
    ),
    mspan AS (SELECT id, island, min(s) AS s, max(e) AS e
              FROM m3 GROUP BY id, island),
    toki AS (
      SELECT doc_id, i, l[i+1] AS tok
      FROM toks, unnest(range(len(l))) u(i)
    ),
    keep_tok AS (
      SELECT t.doc_id, t.i, t.tok FROM toki t
      WHERE NOT EXISTS (SELECT 1 FROM mspan m
                        WHERE m.id = t.doc_id AND t.i >= m.s AND t.i < m.e)
    ),
    agg AS (
      SELECT doc_id, array_to_string(list(tok ORDER BY i), ' ') AS clean_text,
             count(*) AS n_kept
      FROM keep_tok GROUP BY doc_id
    )
    SELECT tk.doc_id,
           coalesce(a.clean_text, '') AS clean_text,
           CAST(len(tk.l) - coalesce(a.n_kept, 0) AS BIGINT)
             AS n_tokens_removed
    FROM toks tk LEFT JOIN agg a ON a.doc_id = tk.doc_id
    ORDER BY tk.doc_id
    """,
    tags=("dedup", "north-star", "verbatim", "substring", "curation"),
)
def dedup_verbatim_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REMOVAL half of exact substring dedup
    (``operators/dedup.py:remove_verbatim_spans``, Lee et al. 2022):
    each cross-document verbatim run keeps its lowest-doc-id copy;
    every other copy's span (overlaps merged per doc) is cut out of
    the text by one in-row index filter.  Returns every document with
    its cleaned text and removed-token count -- the corpus a curation
    pipeline would train on.  The oracle replays runs, span merge,
    and token filtering stage-for-stage."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    return (
        DD.remove_verbatim_spans(docs, k=8, min_len=15)
        .orderBy("doc_id")
    )


@register(
    "corpus_leakage_safe_split",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    {_NGRAM_INTER_CTE},
    edges AS (
      SELECT i.id_a, i.id_b
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.id_a
      JOIN sizes sb ON sb.doc_id = i.id_b
      WHERE i.n_common / (sa.set_size + sb.set_size - i.n_common) >= 0.4
    ),
    sym AS (
      SELECT id_a AS s, id_b AS d FROM edges
      UNION ALL SELECT id_b, id_a FROM edges
    ),
    reach(node, r) AS (
      SELECT s, s FROM sym
      UNION
      SELECT sym.s, reach.r FROM sym JOIN reach ON sym.d = reach.node
    ),
    comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
    labeled AS (
      SELECT d.doc_id, coalesce(c.component, d.doc_id) AS rep_id
      FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    )
    SELECT doc_id, rep_id,
           CASE WHEN CAST(('0x' || substr(md5(CAST(rep_id AS VARCHAR)), 1, 8))
                       AS BIGINT) % 100 < 90 THEN 'train'
                WHEN CAST(('0x' || substr(md5(CAST(rep_id AS VARCHAR)), 1, 8))
                       AS BIGINT) % 100 < 95 THEN 'val'
                ELSE 'test' END AS split
    FROM labeled
    ORDER BY doc_id
    """,
    tags=("dedup", "curation", "north-star", "split", "leakage"),
)
def corpus_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split
    (``operators/curation.py:leakage_safe_split``): near-dup clusters
    (n-gram Jaccard >= 0.4 -> connected components) are assigned AS A
    UNIT by hashing the cluster representative, so a paraphrase can
    never sit in train while its twin sits in test -- the
    contamination bug plain per-doc hashing has on duplicated
    corpora.  Singletons hash on their own id (identical to the plain
    split there).  The oracle replays pairs, components, and the
    md5-bucket split."""
    from ..operators import curation as CU

    docs = parallelize_small(load(spark, sf_dir, "documents"))
    pairs = DD.ngram_jaccard_pairs(docs, threshold=0.4)
    return CU.leakage_safe_split(docs, pairs).orderBy("doc_id")


#: Winnowing fingerprint CTEs: positional 4-gram md5-uint32 hashes,
#: min of every 4-hash window, distinct per doc -- the DuckDB twin of
#: ``dedup.winnowing_fingerprints(k=4, w=4)``.
_WINNOW_G4 = (
    "list_transform(range(greatest(len(l) - 3, 0)), "
    "i -> l[i+1] || ' ' || l[i+2] || ' ' || l[i+3] || ' ' || l[i+4])"
)
_WINNOW_CTES = f"""
    toks AS (SELECT doc_id, {_TOKS} AS l FROM documents),
    h AS (
      SELECT doc_id,
             list_transform({_WINNOW_G4},
                 x -> CAST(('0x' || substr(md5(x), 1, 8)) AS BIGINT)) AS hs
      FROM toks
    ),
    fp AS (
      SELECT doc_id, unnest(
        CASE WHEN len(hs) >= 4 THEN
          list_distinct(list_transform(range(len(hs) - 3),
                                       i -> list_min(hs[i+1:i+4])))
        ELSE [] END) AS fp
      FROM h
    )
"""


@register(
    "dedup_winnowing_pairs",
    oracle=f"""
    WITH {_WINNOW_CTES},
    rare AS (
      SELECT fp FROM fp GROUP BY fp HAVING count(*) <= {_CAP_SQL}
    ),
    pruned AS (SELECT f.* FROM fp f JOIN rare r ON f.fp = r.fp),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM pruned a JOIN pruned b
        ON a.fp = b.fp AND a.doc_id < b.doc_id
    )
    SELECT c.id_a, c.id_b, CAST(count(*) AS BIGINT) AS n_shared
    FROM cand c
    JOIN fp fa ON fa.doc_id = c.id_a
    JOIN fp fb ON fb.doc_id = c.id_b AND fb.fp = fa.fp
    GROUP BY c.id_a, c.id_b
    HAVING count(*) >= 2
    ORDER BY id_a, id_b
    """,
    tags=("dedup", "north-star", "winnowing", "fingerprint"),
)
def dedup_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-fingerprint candidate pairs
    (``operators/dedup.py:winnowing_pairs``; Schleimer et al., SIGMOD
    2003 -- the MOSS scheme): docs sharing >= 2 min-of-window 4-gram
    fingerprints, i.e. local overlaps (template reuse, partial
    plagiarism) that whole-document MinHash signatures miss.  Stop
    fingerprints capped corpus-relatively for candidate generation;
    shared counts recounted over the full fingerprint table; all
    fp-keyed equi-joins."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    return DD.winnowing_pairs(docs, k=4, w=4, min_shared=2).orderBy(
        "id_a", "id_b"
    )


@register(
    "dedup_lsh_tuning_report",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    {_MINHASH_BANDS_CTES},
    buckets AS (
      SELECT band_id, band_val, count(*) AS m
      FROM bands GROUP BY band_id, band_val
    )
    SELECT band_id,
           count(*) AS n_buckets,
           CAST(sum(CASE WHEN m = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS singleton_buckets,
           max(m) AS max_bucket,
           CAST(sum(m * (m - 1) // 2) AS BIGINT) AS candidate_pairs
    FROM buckets
    GROUP BY band_id
    ORDER BY band_id
    """,
    tags=("dedup", "north-star", "minhash", "lsh", "tuning"),
)
def dedup_lsh_tuning_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding cost report
    (``operators/dedup.py:lsh_tuning_report``): per band -- bucket
    count, singleton buckets, hottest bucket, and the EXACT candidate
    pair volume the band self-join would emit (sum m*(m-1)/2), without
    materializing a single pair.  The observed complement to the
    1-(1-s^r)^b S-curve: theory picks the recall, this table prices it
    on the actual corpus and flags the straggler bucket before a
    corpus-scale pair run.  The oracle replays signatures, band
    re-hash, and both rollups."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    return DD.lsh_tuning_report(docs).orderBy("band_id")


@register(
    "dedup_source_audit",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id, source,
             md5(array_to_string(list_sort(list_distinct({_TOKS})), ' '))
               AS f
      FROM documents
    ),
    stats AS (
      SELECT f, count(*) AS n, count(DISTINCT source) AS nsrc,
             min(doc_id) AS keep
      FROM fp GROUP BY f
    )
    SELECT fp.source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN s.n > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS dup_docs,
           CAST(sum(CASE WHEN s.nsrc > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS cross_source_dup_docs,
           CAST(sum(CASE WHEN fp.doc_id <> s.keep THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_lost_to_dedup,
           round(sum(CASE WHEN s.n > 1 THEN 1 ELSE 0 END) / count(*), 6)
             AS dup_rate
    FROM fp JOIN stats s ON s.f = fp.f
    GROUP BY fp.source
    ORDER BY fp.source
    """,
    tags=("dedup", "north-star", "audit", "governance"),
)
def dedup_source_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-duplicate governance report
    (``operators/dedup.py:source_dedup_audit``): doc count, docs
    duplicating anything corpus-wide, docs duplicating a DIFFERENT
    source (the mirrored-feed signal per-source dedup can't fix),
    docs a global min-id dedup would drop, and the dup rate -- per
    source, from two fingerprint-keyed aggregates.  The oracle
    replays the canonical fingerprint and both rollups."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    return DD.source_dedup_audit(docs).orderBy("source")
