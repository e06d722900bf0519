"""Deduplication operators (BASELINE.json north star: exact,
MinHash+LSH, SimHash, n-gram Jaccard) over document tables.

Scale design (the whole point of these operators at 100 TB):

- Exact dedup never compares documents pairwise: hash-groupBy on the
  text (or its md5) -- one shuffle keyed by content hash.
- Near-dup NEVER does the O(n^2) cross join.  Candidate generation is
  either a shared-shingle equi-join with stop-shingle frequency capping
  (n-gram Jaccard) or a MinHash-LSH band equi-join (candidates ~ only
  true near-dups + tunable false positives); exact Jaccard verification
  runs only on the candidate set.
- All hashing is md5-based (content-derived, engine-portable) so the
  DuckDB oracle can replay every stage bit-for-bit -- deliberately NOT
  Spark's internal ``hash()``/``xxhash64`` (seeded differently across
  engines; fine in production, unverifiable here).

Every stage -- including SimHash's 64 lane bits and the clustering of
pairs into components -- has a DuckDB oracle; only approximate ANN
remains rows-only by nature.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ._scratch_cache import ScratchCaches
from .ann_index import _read_small
from .text import tokens

#: MinHash configuration: 16 permutations grouped into 4 bands of 4.
#: With band-match probability ~ s^4 per band, the LSH S-curve crosses
#: ~0.7 Jaccard -- tuned for "near-dup" detection.
MINHASH_PERMS = 16
MINHASH_BANDS = 4
ROWS_PER_BAND = MINHASH_PERMS // MINHASH_BANDS

#: Shingles occurring in more than this many documents are dropped from
#: candidate generation (classic stop-shingle pruning: a shingle shared
#: by half the corpus carries no dedup signal but quadratic join cost).
#: This is the FLOOR of the effective cap -- the cap scales with corpus
#: size (``DEFAULT_MAX_SHINGLE_FRAC``) so a fixed 50 doesn't silently
#: declare every shingle "frequent" at 100x the document count.
DEFAULT_MAX_SHINGLE_DF = 50

#: Corpus-relative stop-shingle cap: a shingle is a stop-shingle when
#: its document frequency exceeds max(floor, frac * n_docs).
DEFAULT_MAX_SHINGLE_FRAC = 0.005

#: Scratch cache for the most recent pair-operator call's shingle
#: table (see ``_scratch_cache.ScratchCaches`` for the lifetime
#: contract; ``release_caches()`` gives the full cleanup).
_SCRATCH = ScratchCaches()


def release_caches() -> None:
    """Unpersist every scratch DataFrame cached by earlier pair-operator
    calls (``ngram_jaccard_pairs`` / ``minhash_lsh_pairs``)."""
    _SCRATCH.release()


def _cache_scratch(df: DataFrame) -> DataFrame:
    return _SCRATCH.cache(df)


def effective_max_shingle_df(
    n_docs: int,
    floor: int = DEFAULT_MAX_SHINGLE_DF,
    frac: float = DEFAULT_MAX_SHINGLE_FRAC,
) -> int:
    """Corpus-relative stop-shingle cap: max(floor, ceil(frac * n_docs))."""
    import math

    return max(floor, math.ceil(frac * n_docs))


def word_shingles_all(text: Column | str, n: int = 3) -> Column:
    """ALL word n-gram occurrences of ``text`` in order, duplicates
    kept (empty if < n tokens) -- the occurrence-counting twin of
    ``word_shingles`` for operators that weight by frequency
    (e.g. ``text.repetition_stats``).

    NB: guarded with ``when`` because ``sequence(0, -1)`` in Spark
    produces a *descending* [0, -1], not an empty array.
    """
    toks = tokens(text)
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + k + 1).cast("int")) for k in range(n)]
        ),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of ``text`` (empty if < n tokens)
    -- the SET view all Jaccard/minhash machinery consumes."""
    return F.array_distinct(word_shingles_all(text, n))


def exact_dedup(df: DataFrame, cols: list[str], key_col: str) -> DataFrame:
    """Keep exactly one row (minimum ``key_col``) per distinct ``cols``
    combination.  Aggregation, not dropDuplicates: min-key survivor
    choice is deterministic (dropDuplicates keeps an arbitrary row)."""
    survivors = df.groupBy(*cols).agg(F.min(key_col).alias(key_col))
    return df.join(survivors, on=[*cols, key_col], how="left_semi")


def _shingles_zip(text: Column, n: int) -> Column:
    """Distinct n-gram shingles via arrays_zip of n shifted slices.

    Formulation matters a lot here: ``element_at(tokens(text), i)``
    inside a transform re-evaluates the tokenizer per element
    (quadratic per doc -- measured ~10s for 5k docs), and the
    posexplode+window-lead alternative pays two shuffles (~5s).  Zipped
    slices evaluate the tokenizer O(n) times per ROW, need no shuffle
    at all, and array_distinct dedups within the row (~2s)."""
    toks = tokens(text)
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(toks, k + 1, m) for k in range(n)])
    grams = F.transform(
        zipped,
        lambda s: F.concat_ws(" ", *[s.getField(str(k)) for k in range(n)]),
    )
    return F.array_distinct(grams)


def shingle_table(docs: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Exploded DISTINCT (id, shingle) pairs -- the base relation for
    both n-gram-Jaccard and MinHash paths.  Narrow (no shuffle):
    per-row shingling + explode; distinctness holds because
    array_distinct runs inside each row.  Input parallelism is the
    caller's concern (the catalog layer wraps test-scale scans in
    ``parallelize_small``; at corpus scale the scan splits suffice)."""
    return docs.select(
        F.col(id_col),
        F.explode(_shingles_zip(F.col(text_col), n)).alias("shingle"),
    )


def duplicated_passage_stats(
    docs: DataFrame,
    k: int = 8,
    stride: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document duplicated-passage statistics: chunk each document
    into ``k``-token windows every ``stride`` tokens, md5 the chunks,
    and measure what fraction of a document's distinct chunks also
    appear in at least one OTHER document.  The chunk-level relaxation
    of exact substring dedup (Lee et al. 2021, "Deduplicating Training
    Data Makes Language Models Better"): high ``dup_chunk_ratio`` flags
    boilerplate and cross-document copy-paste that whole-document
    hashing misses.

    Scale shape: tokens are materialized ONCE per row before the chunk
    transform (slicing a column reference is O(k) per chunk; slicing a
    re-evaluated ``tokens(text)`` expression would re-tokenize per
    chunk -- the quadratic trap ``_shingles_zip`` documents), chunks
    are md5'd within the row, and the only shuffles are the chunk-hash
    groupBy (map-side combined) and the per-doc rollup -- both linear
    in corpus token count / stride.  Documents shorter than ``k``
    tokens contribute their whole text as one chunk.
    """
    toked = docs.select(F.col(id_col), tokens(text_col).alias("__toks"))
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size(F.col("__toks")) - k, F.lit(0)),
        F.lit(stride),
    )
    chunks = F.transform(
        starts,
        lambda s: F.md5(
            F.concat_ws(" ", F.slice(F.col("__toks"), s + 1, k)).cast("binary")
        ),
    )
    per_doc = _cache_scratch(
        toked.select(F.col(id_col), F.explode(F.array_distinct(chunks)).alias("chunk"))
    )
    freq = per_doc.groupBy("chunk").agg(F.count(F.lit(1)).alias("docs_with"))
    return (
        per_doc.join(freq, "chunk")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum((F.col("docs_with") > 1).cast("long")).alias("n_dup_chunks"),
            F.round(
                F.sum((F.col("docs_with") > 1).cast("long"))
                / F.count(F.lit(1)),
                6,
            ).alias("dup_chunk_ratio"),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.6,
    max_shingle_df: int | None = None,
    max_shingle_frac: float = DEFAULT_MAX_SHINGLE_FRAC,
) -> DataFrame:
    """Document pairs with shingle-set Jaccard >= threshold.

    candidates: equi-join on shared shingles, with stop-shingles
    (document frequency above ``max(DEFAULT_MAX_SHINGLE_DF,
    ceil(max_shingle_frac * n_docs))``) dropped from candidate
    generation ONLY -- the reported Jaccard is then recounted over the
    FULL shingle table (pruning the intersection but not the set sizes
    would systematically underestimate Jaccard for documents sharing
    frequent shingles).  One wide shuffle keyed by shingle for
    candidates, one keyed by pair for verification -- no cross join.
    """
    inter = _ngram_intersections(
        docs, id_col, text_col, n, max_shingle_df, max_shingle_frac
    )
    return inter.select(
        "id_a",
        "id_b",
        (
            F.col("n_common")
            / (F.col("size_a") + F.col("size_b") - F.col("n_common"))
        ).alias("jaccard"),
    ).where(F.col("jaccard") >= threshold)


def _ngram_intersections(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    max_shingle_df: int | None,
    max_shingle_frac: float,
) -> DataFrame:
    """Shared candidate + verified-intersection pipeline of the n-gram
    set-similarity family: (id_a, id_b, n_common, size_a, size_b) for
    every candidate pair sharing >= 1 rare shingle.  Candidates come
    from the stop-shingle-pruned table; the intersection is recounted
    over the FULL shingle table (pruning candidate generation only --
    pruning the intersection would bias every similarity downstream)."""
    if max_shingle_df is None:
        # One metadata-cheap count: makes the cap corpus-relative so a
        # 100x corpus doesn't silently reclassify every discriminative
        # shingle as frequent.
        max_shingle_df = effective_max_shingle_df(docs.count(), frac=max_shingle_frac)

    sh = _cache_scratch(shingle_table(docs, id_col, text_col, n))
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("set_size"))

    rare = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= max_shingle_df)
        .select("shingle")
    )
    sh_pruned = sh.join(rare, "shingle")

    cand = (
        sh_pruned.select(F.col(id_col).alias("id_a"), "shingle")
        .join(sh_pruned.select(F.col(id_col).alias("id_b"), "shingle"), "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # Verification over the UNPRUNED shingle table, candidates only
    # (mirrors minhash_lsh_pairs): true intersection count.
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        cand.join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return inter.join(
        sizes.select(F.col(id_col).alias("id_a"), F.col("set_size").alias("size_a")),
        "id_a",
    ).join(
        sizes.select(F.col(id_col).alias("id_b"), F.col("set_size").alias("size_b")),
        "id_b",
    )


def ngram_containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
    max_shingle_frac: float = DEFAULT_MAX_SHINGLE_FRAC,
) -> DataFrame:
    """Document pairs where the SMALLER shingle set is mostly contained
    in the larger: containment = |A n B| / min(|A|, |B|) >= threshold
    (Broder 1997's containment, the asymmetric sibling of resemblance/
    Jaccard).  Catches a short document embedded verbatim inside a
    longer one -- a pair symmetric Jaccard scores LOW (the union is
    dominated by the long doc) and therefore misses; the classic case
    is boilerplate wrappers around copied passages.  Same candidate +
    full-table verification pipeline as ``ngram_jaccard_pairs``."""
    inter = _ngram_intersections(
        docs, id_col, text_col, n, max_shingle_df, max_shingle_frac
    )
    return inter.select(
        "id_a",
        "id_b",
        (F.col("n_common") / F.least("size_a", "size_b")).alias("containment"),
    ).where(F.col("containment") >= threshold)


def prefix_filter_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """EXACT set-similarity self-join: every document pair with
    shingle-set Jaccard >= ``threshold`` -- no stop-shingle heuristic,
    no misses.  Prefix filtering (Chaudhuri/Ganti/Kaushik ICDE 2006;
    Bayardo/Ma/Srikant WWW 2007 All-Pairs; Xiao et al. PPJoin): order
    every document's shingles by a GLOBAL canonical order (ascending
    document frequency, rarest first, shingle text as tie-break) and
    index only each doc's first ``|x| - ceil(t*|x|) + 1`` shingles.
    Any pair with Jaccard >= t must share at least one prefix shingle
    (if all shared shingles sat outside both prefixes, the overlap
    would be < ceil(t*max(|a|,|b|)) <= |a intersect b| -- contradiction),
    so the candidate set is COMPLETE, unlike the rare-shingle capped
    join in ``ngram_jaccard_pairs`` which can drop a pair whose every
    shared shingle is corpus-frequent.

    Why this is the 100 TB shape: the inverted index holds only the
    prefix -- a (1-t) fraction of each set, and by construction its
    RAREST members -- so the per-shingle join fan-out collapses
    exactly where the naive shared-shingle join explodes (frequent
    shingles sort to the suffix and are never indexed).  A length
    filter (min size >= ceil(t * max size)) prunes candidates before
    the verify shuffle.  Three shuffles total: document frequency,
    per-doc rank (window partitioned by doc), candidate equi-join on
    prefix shingle; verification recounts the true intersection over
    the full shingle table, candidates only.
    """
    from pyspark.sql.window import Window

    sh = _cache_scratch(shingle_table(docs, id_col, text_col, n))
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("set_size"))
    df_tbl = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    t = float(threshold)
    ranked = (
        sh.join(df_tbl, "shingle")
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(F.asc("df"), F.asc("shingle"))
            ),
        )
        .join(sizes, id_col)
    )
    prefix = ranked.where(
        F.col("rk")
        <= F.col("set_size") - F.ceil(F.lit(t) * F.col("set_size")) + F.lit(1)
    )
    a = prefix.select(
        F.col(id_col).alias("id_a"), "shingle", F.col("set_size").alias("size_a")
    )
    b = prefix.select(
        F.col(id_col).alias("id_b"), "shingle", F.col("set_size").alias("size_b")
    )
    cand = (
        a.join(b, "shingle")
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (
                F.least("size_a", "size_b")
                >= F.ceil(F.lit(t) * F.greatest("size_a", "size_b"))
            )
        )
        .select("id_a", "id_b")
        .distinct()
    )
    full_a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    full_b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        cand.join(full_a, "id_a")
        .join(full_b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    verified = inter.join(
        sizes.select(F.col(id_col).alias("id_a"), F.col("set_size").alias("size_a")),
        "id_a",
    ).join(
        sizes.select(F.col(id_col).alias("id_b"), F.col("set_size").alias("size_b")),
        "id_b",
    )
    return verified.select(
        "id_a",
        "id_b",
        (
            F.col("n_common")
            / (F.col("size_a") + F.col("size_b") - F.col("n_common"))
        ).alias("jaccard"),
    ).where(F.col("jaccard") >= t)


#: Modulus for the affine minhash permutation family: the Mersenne
#: prime 2^31 - 1.  Products (coeff < P) x (md5 word < 2^32) stay under
#: 2^63, so the arithmetic is exact (and ANSI-overflow-safe) in both
#: Spark longs and DuckDB BIGINTs.
MINHASH_PRIME = 2_147_483_647


def _minhash_coeffs(
    perms: int = MINHASH_PERMS, seed: int = 7
) -> list[tuple[int, int, int, int, int]]:
    """Per-permutation coefficients (a1..a4, b) for the universal hash
    over the md5's four 32-bit words -- seeded, so the literals embedded
    in the Spark plan and the DuckDB oracle SQL come from one source."""
    import numpy as np

    rng = np.random.default_rng(seed)
    out = []
    for _ in range(perms):
        a = rng.integers(1, MINHASH_PRIME, size=4)
        b = rng.integers(0, MINHASH_PRIME)
        out.append((int(a[0]), int(a[1]), int(a[2]), int(a[3]), int(b)))
    return out


MINHASH_COEFFS: list[tuple[int, int, int, int, int]] = _minhash_coeffs()


def _md5_words(shingle: Column) -> list[Column]:
    """The md5 digest's four 32-bit words as longs (one md5 per shingle;
    every permutation is derived from these)."""
    digest = F.md5(shingle.cast("binary"))
    return [
        F.conv(F.substring(digest, 1 + 8 * k, 8), 16, 10).cast("long")
        for k in range(4)
    ]


def _affine_hash(words: list[Column], coeffs: tuple[int, int, int, int, int]) -> Column:
    """h = (sum_k (a_k * w_k) % P + b) % P -- a universal hash of the
    128-bit md5.  Each product is reduced before summing so every
    intermediate fits a signed 64-bit integer."""
    a1, a2, a3, a4, b = coeffs
    acc = sum(
        ((F.lit(a) * w) % MINHASH_PRIME for a, w in zip((a1, a2, a3, a4), words)),
        start=F.lit(b),
    )
    return (acc % MINHASH_PRIME).cast("long")


def _seed_hash(seed: int, hash_mode: str = "oracle") -> Column:
    if hash_mode == "oracle":
        return _affine_hash(_md5_words(F.col("shingle")), MINHASH_COEFFS[seed])
    if hash_mode == "fast":
        salted = F.concat_ws("#", F.col("shingle"), F.lit(str(seed)))
        return F.xxhash64(salted)
    raise ValueError(f"unknown hash_mode {hash_mode!r}")


def minhash_signatures_wide(
    shingles: DataFrame,
    id_col: str = "doc_id",
    perms: int = MINHASH_PERMS,
    hash_mode: str = "oracle",
) -> DataFrame:
    """(id, h0..h{perms-1}) -- MinHash: the minimum of a per-permutation
    hash over a doc's shingles is a valid min-wise hash per permutation.

    ``hash_mode='oracle'`` (default) computes ONE md5 per shingle and
    derives every permutation as an affine universal hash of its four
    32-bit words (``(sum a_k w_k + b) mod 2^31-1`` -- the classic
    "one base hash + k affine permutations" minhash construction).
    Chosen over the earlier md5-per-seed form for speed (1 md5 instead
    of 16 per shingle, 8-byte long signatures instead of 32-char hex)
    while staying bit-for-bit replayable in the DuckDB oracle.
    ``hash_mode='fast'`` uses Spark's codegen'd xxhash64 per seed --
    full 64-bit hashes (no correlated 31-bit collisions), the
    production choice at corpus scale, not oracle-replayable.

    WIDE layout on purpose: one hash column per seed with ``min()``
    partial aggregation, so the shuffle moves one row per (doc) instead
    of one per (doc, seed) -- 16x less shuffle volume than the exploded
    formulation, with the hash work staying map-side and parallel.
    """
    if hash_mode == "oracle":
        words = _md5_words(F.col("shingle"))
        hashed = shingles.select(
            id_col,
            *[
                _affine_hash(words, MINHASH_COEFFS[s]).alias(f"h{s}")
                for s in range(perms)
            ],
        )
    else:
        hashed = shingles.select(
            id_col, *[_seed_hash(s, hash_mode).alias(f"h{s}") for s in range(perms)]
        )
    return hashed.groupBy(id_col).agg(
        *[F.min(f"h{s}").alias(f"h{s}") for s in range(perms)]
    )


def minhash_bands(
    signatures: DataFrame,
    id_col: str = "doc_id",
    perms: int = MINHASH_PERMS,
    rows_per_band: int = ROWS_PER_BAND,
    hash_mode: str = "oracle",
) -> DataFrame:
    """(id, band_id, band_val): concatenate each band's seed-ordered
    min-hashes and re-hash -- the LSH bucket key.  Pure projection over
    the wide signatures (no extra shuffle)."""
    n_bands = perms // rows_per_band

    def band_val(b: int) -> Column:
        joined = F.concat_ws(
            "|", *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        )
        if hash_mode == "oracle":
            return F.md5(joined.cast("binary"))
        return F.xxhash64(joined)

    band_vals = F.array(*[band_val(b) for b in range(n_bands)])
    return signatures.select(
        id_col, F.posexplode(band_vals).alias("band_id", "band_val")
    )


def row_minhash_bands(
    text: Column | str,
    n: int = 3,
    perms: int = MINHASH_PERMS,
    rows_per_band: int = ROWS_PER_BAND,
) -> Column:
    """LSH band values computed entirely WITHIN a row: min over the
    row's own shingle array per permutation (``array_min`` of the same
    affine hashes ``minhash_signatures_wide`` aggregates), bands
    re-hashed exactly like ``minhash_bands``.  Bit-identical to the
    groupBy formulation (asserted in tests), but shuffle-free -- which
    makes it usable on an unbounded STREAM where a grouped min would
    need stateful aggregation: each micro-batch row carries its own
    band keys, ready for a stream-static join against a persisted
    corpus index.  Returns ``array<string>`` indexed by band_id
    (null-free only when the doc has >= n tokens; filter short docs
    first).
    """
    col = F.col(text) if isinstance(text, str) else text
    sh = word_shingles(col, n)

    def sig(s: int) -> Column:
        return F.array_min(
            F.transform(sh, lambda el: _affine_hash(_md5_words(el), MINHASH_COEFFS[s]))
        )

    sigs = [sig(s) for s in range(perms)]
    n_bands = perms // rows_per_band
    return F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|", *[sigs[b * rows_per_band + r] for r in range(rows_per_band)]
                ).cast("binary")
            )
            for b in range(n_bands)
        ]
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.7,
    hash_mode: str = "oracle",
) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH candidates + exact-Jaccard
    verification.  The band equi-join emits ~only true near-dups; exact
    Jaccard (shared-shingle counting, restricted to candidates) removes
    LSH false positives.  No frequency cap needed -- banding already
    bounds candidate volume.  The shingle table is computed once and
    cached: it feeds signatures, sizes, AND verification."""
    sh = _cache_scratch(shingle_table(docs, id_col, text_col, n))
    # Cached: the band table is BOTH sides of the candidate self-join,
    # and uncached each side re-ran the full 16-perm signature
    # aggregation over the shingle table (the self-join's build side
    # gets no ReusedExchange).  One row per (doc, band) -- tiny.
    bands = _SCRATCH.cache_more(
        minhash_bands(
            minhash_signatures_wide(sh, id_col, hash_mode=hash_mode),
            id_col,
            hash_mode=hash_mode,
        )
    )
    cand = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.band_id") == F.col("y.band_id"))
            & (F.col("x.band_val") == F.col("y.band_val"))
            & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
        )
        .select(
            F.col(f"x.{id_col}").alias("id_a"), F.col(f"y.{id_col}").alias("id_b")
        )
        .distinct()
    )

    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("set_size"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        cand.join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(
            sizes.select(F.col(id_col).alias("id_a"), F.col("set_size").alias("size_a")),
            "id_a",
        )
        .join(
            sizes.select(F.col(id_col).alias("id_b"), F.col("set_size").alias("size_b")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_common")
                / (F.col("size_a") + F.col("size_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def simhash64(text: Column | str) -> Column:
    """64-bit SimHash as a 64-char '0'/'1' bit-string.

    Per distinct token: md5 -> first 16 hex chars -> 64 bits; each bit
    votes +1/-1 into its lane; the final sign per lane is the SimHash
    bit.  Entirely JVM-side via higher-order array functions (the
    accumulator is a 64-long array folded with zip_with)."""
    toks = F.array_distinct(tokens(text))
    lanes = F.sequence(F.lit(0), F.lit(63))

    def token_votes(t: Column) -> Column:
        hx = F.substring(F.md5(t.cast("binary")), 1, 16)

        def lane_bit(i: Column) -> Column:
            nibble = F.conv(F.substring(hx, (i / 4).cast("int") + 1, 1), 16, 10).cast(
                "int"
            )
            # mask = 2^(3 - i%4); pow is exact for these tiny exponents.
            mask = F.pow(F.lit(2.0), (F.lit(3) - (i % 4)).cast("double")).cast("int")
            return F.when(nibble.bitwiseAND(mask) > 0, F.lit(1)).otherwise(F.lit(-1))

        return F.transform(lanes, lane_bit)

    votes = F.aggregate(
        toks,
        F.transform(lanes, lambda _: F.lit(0)),
        lambda acc, t: F.zip_with(acc, token_votes(t), lambda a, b: a + b),
    )
    bits = F.transform(votes, lambda v: F.when(v > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat_ws("", bits)


def simhash_hamming(a: Column, b: Column) -> Column:
    """Hamming distance between two simhash bit-strings (0..64)."""
    pairs = F.zip_with(
        F.split(a, ""), F.split(b, ""), lambda x, y: (x != y).cast("int")
    )
    return F.aggregate(pairs, F.lit(0), lambda acc, v: acc + v).cast("long")


def weighted_simhash64(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Weighted 64-bit SimHash (Charikar 2002 with per-token weights):
    each token's +-1 lane votes are scaled by ``tf * (N // df)`` --
    term frequency times an INTEGER rarity weight -- so a rare
    distinguishing term outvotes boilerplate, the failure mode of the
    unweighted ``simhash64`` on template-heavy corpora (two docs
    sharing a big boilerplate shell hash identically even when their
    payload differs).

    ``N // df`` (corpus size integer-divided by document frequency) is
    the engine-portable stand-in for idf: every vote is an exact
    integer, so lane sums are order-independent and the DuckDB oracle
    reproduces the sign of every lane bit-for-bit -- a float tf*ln(N/df)
    weight would make near-zero lane sums depend on summation order
    and last-ulp ln() differences across engines.

    Plan: per-doc (token, tf) structs built in the row (one pass over
    the token array), explode -> vocabulary-keyed df agg + equi-join
    (both vocabulary-bounded, not corpus-bounded) -> collect the
    weighted tokens back per doc and fold the 64 lanes in-row.  The
    md5 lane-bit extraction (the expensive expression: md5 + 16x
    conv/substring per token) is evaluated ONCE PER VOCABULARY TERM in
    the df table and carried through the join as a +-1 vote array --
    NOT per (doc, token) pair in the fold, which re-derives it
    corpus-frequency times (measured 15.7 s -> the fold below is pure
    zip_with arithmetic).  Returns (id_col, simhash)."""
    n_docs = docs.count()  # 1-row bounded pull (broadcast-scalar pattern)

    toks = tokens(F.col(text_col))
    tf_structs = F.transform(
        F.array_distinct(toks),
        lambda t: F.struct(
            t.alias("token"),
            F.size(F.filter(toks, lambda x: x == t)).alias("tf"),
        ),
    )
    per_tok = docs.select(
        F.col(id_col).alias("__wsh_id"), F.explode(tf_structs).alias("s")
    ).select("__wsh_id", F.col("s.token").alias("token"), F.col("s.tf").alias("tf"))
    lanes = F.sequence(F.lit(0), F.lit(63))

    def token_votes(t: Column) -> Column:
        hx = F.substring(F.md5(t.cast("binary")), 1, 16)

        def lane_vote(i: Column) -> Column:
            nibble = F.conv(F.substring(hx, (i / 4).cast("int") + 1, 1), 16, 10).cast(
                "int"
            )
            mask = F.pow(F.lit(2.0), (F.lit(3) - (i % 4)).cast("double")).cast("int")
            return F.when(nibble.bitwiseAND(mask) > 0, F.lit(1)).otherwise(F.lit(-1))

        return F.transform(lanes, lane_vote)

    df_tbl = (
        per_tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .select("token", "df", token_votes(F.col("token")).alias("votes"))
    )
    weighted = per_tok.join(df_tbl, "token").select(
        "__wsh_id",
        (F.col("tf") * F.floor(F.lit(n_docs) / F.col("df")).cast("long")).alias(
            "weight"
        ),
        "votes",
    )
    folded = (
        weighted.groupBy("__wsh_id")
        .agg(F.collect_list(F.struct("weight", "votes")).alias("wv"))
        .select(
            F.col("__wsh_id").alias(id_col),
            F.aggregate(
                F.col("wv"),
                F.transform(lanes, lambda _: F.lit(0).cast("long")),
                lambda acc, s: F.zip_with(
                    acc,
                    F.transform(s["votes"], lambda v: v * s["weight"]),
                    lambda a, b: a + b,
                ),
            ).alias("votes"),
        )
    )
    bits = F.transform(
        F.col("votes"), lambda v: F.when(v > 0, F.lit("1")).otherwise(F.lit("0"))
    )
    return folded.select(id_col, F.concat_ws("", bits).alias("simhash"))


def connected_components(
    edges: DataFrame, id_a: str = "id_a", id_b: str = "id_b", max_iter: int = 20
) -> DataFrame:
    """Connected components over a near-dup pair graph: (node,
    component) where component = min node id reachable -- the step that
    turns pairwise matches into dedup clusters with a canonical
    survivor per cluster.

    Iterative min-label propagation with a pointer-jumping shortcut
    (component <- label(component) each round), so label distance
    doubles per iteration and convergence takes O(log diameter) rounds
    -- ``max_iter=20`` therefore covers chains of ~2^20 hops, and
    near-dup clusters converge in 2-3 rounds.  Each iteration is three
    shuffles; intermediate lineage is truncated with localCheckpoint so
    plans do not grow unboundedly.

    Raises ``RuntimeError`` if labels have not stabilized after
    ``max_iter`` rounds: unconverged labels would be silently split
    clusters, which is worse than failing.
    """
    # Materialize the edge list ONCE before iterating: every round
    # joins against ``both``, and without the checkpoint each round
    # re-evaluates the upstream pair computation (for SemDeDup that is
    # the within-cell cosine join; for MinHash the banded candidate
    # pipeline) -- measured 20 s -> 8.6 s on the sf0.1 semantic-dedup
    # bench together with the fused first round below.  At scale the
    # edge list is pairs-sized, far smaller than the corpus scan it
    # replaces.
    both = (
        edges.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(edges.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .localCheckpoint(eager=True)
    )
    # The decimal-sum convergence witness below is only sound for
    # integral ids: a non-numeric id (string doc hashes, UUIDs) casts
    # to NULL, the sum degenerates to None every round, and None ==
    # None would end the loop after one iteration with silently split
    # components.  Non-integral ids fall back to a join-diff change
    # check -- one extra narrow join per round, correct for any
    # orderable id type (F.least orders strings lexicographically).
    from pyspark.sql import types as T

    integral_ids = isinstance(
        both.schema["src"].dataType,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
    )
    # Initialization already performs the first propagation round:
    # label(v) = min({v} U N(v)) -- one aggregation instead of a
    # distinct + a full join round (star-shaped near-dup clusters
    # converge immediately, leaving only the confirming round).
    labels = both.groupBy("src").agg(F.min("dst").alias("nbr_min")).select(
        F.col("src").alias("node"),
        F.least(F.col("src"), F.col("nbr_min")).alias("component"),
    )

    def label_sum(df: DataFrame):
        # Convergence witness (integral ids only): both updates below
        # only LOWER a node's component (F.least against the current
        # value), so the label table changed iff this sum strictly
        # decreased -- one narrow aggregation instead of a self-join
        # diff per round.  decimal sum: exact at any node-count x id
        # magnitude.
        return df.agg(
            F.sum(F.col("component").cast("decimal(38,0)"))
        ).collect()[0][0]

    def labels_changed(new: DataFrame, old: DataFrame) -> bool:
        # Fallback witness for non-integral ids: any node whose label
        # differs between rounds.  take(1) stops at the first diff.
        return bool(
            new.alias("n")
            .join(old.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .take(1)
        )

    prev_sum = label_sum(labels) if integral_ids else None
    for _ in range(max_iter):
        neighbor_min = (
            both.join(labels, both.dst == labels.node)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        propagated = labels.join(
            neighbor_min, labels.node == neighbor_min.src, "left"
        ).select(
            "node",
            F.least(
                F.col("component"), F.coalesce("nbr_component", F.col("component"))
            ).alias("component"),
        )
        # Pointer jumping: follow the label one extra hop (a component
        # id is itself a node id), doubling propagation distance.
        hop = propagated.select(
            F.col("node").alias("p_node"), F.col("component").alias("p_comp")
        )
        new_labels = (
            propagated.join(hop, propagated.component == hop.p_node, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("p_comp", F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        if integral_ids:
            new_sum = label_sum(new_labels)
            converged = new_sum == prev_sum
            prev_sum = new_sum
        else:
            converged = not labels_changed(new_labels, labels)
        labels = new_labels
        if converged:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations; "
        "labels would be silently wrong -- raise max_iter"
    )


def partitioned_components(
    edges: DataFrame,
    part_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Connected components for edge sets LOCAL to a partition key:
    every edge's endpoints live in exactly one ``part_col`` group and
    no node appears under two groups, so components cannot span
    groups.  Output contract identical to ``connected_components``:
    (node, component) with component = min member id.

    Where the precondition holds (SemDeDup with disjoint 1-NN cells:
    pairs come from a within-cell join, so an edge cannot cross
    cells), the O(log diameter) iterative rounds -- each three
    shuffles plus a lineage checkpoint plus a convergence probe --
    collapse to ONE shuffle (the group-by on the partition key) and a
    linear union-find over each group's edge list, at ANY corpus
    size: per-group working set is the cell population, exactly the
    budget ``target_cell_size``/``cell_cap`` already enforce for the
    pair-scoring matmul.  Union-by-min-root makes each set's root its
    minimum member, so no second labeling pass is needed.

    NOT sound for multi-assigned nodes (``split_oversized_cells``
    spill bands put one node in several sub-cells, stitching
    components across groups) -- capped callers must keep the
    iterative algorithm; ``semantic_dedup`` gates on that.
    """
    import pandas as pd

    id_type = edges.schema[id_a].dataType.simpleString()

    def components_of_group(pdf: pd.DataFrame) -> pd.DataFrame:
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for a, b in zip(pdf[id_a], pdf[id_b]):
            if a not in parent:
                parent[a] = a
            if b not in parent:
                parent[b] = b
            ra, rb = find(a), find(b)
            if ra != rb:
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra  # smaller root wins -> root == min member

        nodes = list(parent)
        return pd.DataFrame(
            {"node": nodes, "component": [find(v) for v in nodes]}
        )

    return (
        edges.select(part_col, id_a, id_b)
        .groupBy(part_col)
        .applyInPandas(
            components_of_group, f"node {id_type}, component {id_type}"
        )
    )


def blocked_levenshtein_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_dist: int = 2,
    block: Column | None = None,
) -> DataFrame:
    """Entity-resolution fuzzy matching: record pairs whose ``name_col``
    values are within ``max_dist`` Levenshtein edits, restricted to a
    BLOCKING key (classic record-linkage blocking, Fellegi-Sunter
    style) -- the short-string member of the dedup family ("red
    widget" vs "hot widget" never reaches MinHash's shingle floor).

    ``block`` defaults to the last whitespace token (the head noun of
    product-style names); pass any deterministic expression (prefix,
    phonetic key, sorted-token signature) to trade recall for cost.
    The join is block-keyed, so cost is the sum of per-block squares
    -- never the corpus square; Levenshtein runs JVM-side only on
    in-block pairs.  Returns (id_a, id_b, name_a, name_b, dist),
    id_a < id_b.
    """
    if block is None:
        block = F.element_at(tokens(F.col(name_col)), -1)
    base = df.select(
        F.col(id_col).alias("id"), F.col(name_col).alias("nm"), block.alias("blk")
    )
    a = base.select(
        F.col("id").alias("id_a"), F.col("nm").alias("name_a"), "blk"
    )
    b = base.select(
        F.col("id").alias("id_b"), F.col("nm").alias("name_b"), "blk"
    )
    return (
        a.join(b, "blk")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("long").alias("dist"),
        )
        .where(F.col("dist") <= max_dist)
    )


def verbatim_runs(
    docs: DataFrame,
    k: int = 8,
    min_len: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_gram_df: int | None = None,
    max_gram_frac: float = DEFAULT_MAX_SHINGLE_FRAC,
    max_gram_occurrences: int | None = None,
) -> DataFrame:
    """Cross-document EXACT substring dedup: every maximal verbatim
    token run of length >= ``min_len`` shared by two documents, as
    (id_a, id_b, a_start, b_start, run_len) with id_a < id_b and
    0-based token offsets -- the arbitrary-length verbatim-overlap
    member of the dedup family (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", arXiv:2107.06499;
    their suffix-array construction re-expressed as a shared-k-gram
    equi-join + diagonal islands, the Spark-native equivalent).

    Algorithm: (1) every k-token gram occurrence with its position --
    one in-row transform + explode, no shuffle; (2) corpus-relative
    stop-gram cap (same policy as ``effective_max_shingle_df``: a
    gram in more than max(floor, frac * n_docs) documents is
    boilerplate whose occurrence cross-product would dominate join
    cost -- documented recall tradeoff: runs consisting ONLY of
    stop-grams are not reported) PLUS an occurrence cap
    (``max_gram_occurrences``, default ``4 * max_gram_df``): the df
    cap alone misses the within-doc blowup where a gram repeats
    hundreds of times inside TWO docs ("a a a a ..."), whose anchor
    join is occurrences_A x occurrences_B for one pair -- such
    degenerate grams only arise in pathologically repetitive text,
    which the Gopher repetition gate (`text.repetition_stats`)
    already flags upstream; (3) equi-join occurrences on the
    gram STRING (no hash collisions) -> matched anchor positions;
    (4) gaps-and-islands per (id_a, id_b, diagonal = pa - pb): inside
    a shared run every anchor start matches on the same diagonal at
    consecutive positions, so a maximal island of step-1 anchors IS a
    maximal run, of token length (island size + k - 1).  Sound and
    complete for runs >= k without any per-pair re-scan: candidates
    never leave the executors, and the window partitions by
    (pair, diagonal) -- near-dup-pair-sized state, not corpus-sized.

    ``min_len`` defaults to ``2 * k - 1`` (the shortest run that
    proves more than one anchor's worth of overlap).
    """
    if min_len is None:
        min_len = 2 * k - 1
    if min_len < k:
        raise ValueError(f"min_len ({min_len}) must be >= k ({k})")
    toked = docs.select(
        F.col(id_col).alias("id"), tokens(text_col).alias("__toks")
    )
    pg = (
        toked.where(F.size("__toks") >= k)
        .select(
            "id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("__toks") - k),
                    lambda i: F.struct(
                        i.cast("long").alias("pos"),
                        F.concat_ws(
                            " ", F.slice("__toks", i + 1, k)
                        ).alias("gram"),
                    ),
                )
            ).alias("pg"),
        )
        .select("id", F.col("pg.pos").alias("pos"), F.col("pg.gram").alias("gram"))
    )
    pg = _cache_scratch(pg)

    if max_gram_df is None:
        n_docs = toked.count()
        max_gram_df = effective_max_shingle_df(n_docs, frac=max_gram_frac)
    if max_gram_occurrences is None:
        max_gram_occurrences = 4 * max_gram_df
    heavy = (
        pg.groupBy("gram")
        .agg(
            F.count_distinct("id").alias("df"),
            F.count(F.lit(1)).alias("occ"),
        )
        .where(
            (F.col("df") > max_gram_df)
            | (F.col("occ") > max_gram_occurrences)
        )
        .select("gram")
    )
    kept = pg.join(F.broadcast(heavy), "gram", "left_anti")

    a = kept.select(
        F.col("id").alias("id_a"), F.col("pos").alias("pa"), "gram"
    )
    b = kept.select(
        F.col("id").alias("id_b"), F.col("pos").alias("pb"), "gram"
    )
    cand = (
        a.join(b, "gram")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", (F.col("pa") - F.col("pb")).alias("diag"), "pa"
        )
    )

    from pyspark.sql.window import Window

    w = Window.partitionBy("id_a", "id_b", "diag").orderBy("pa")
    islands = (
        cand.withColumn("__prev", F.lag("pa").over(w))
        .withColumn(
            "__brk",
            F.when(F.col("pa") - F.coalesce("__prev", F.lit(-2)) == 1, 0).otherwise(1),
        )
        .withColumn(
            "__island",
            F.sum("__brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return (
        islands.groupBy("id_a", "id_b", "diag", "__island")
        .agg(F.min("pa").alias("a_start"), F.count(F.lit(1)).alias("__n"))
        .select(
            "id_a",
            "id_b",
            "a_start",
            (F.col("a_start") - F.col("diag")).alias("b_start"),
            (F.col("__n") + F.lit(k - 1)).cast("long").alias("run_len"),
        )
        .where(F.col("run_len") >= min_len)
    )


def remove_verbatim_spans(
    docs: DataFrame,
    runs: DataFrame | None = None,
    k: int = 8,
    min_len: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The REMOVAL half of exact substring dedup (Lee et al. 2022):
    every cross-document verbatim run keeps exactly its lowest-doc-id
    occurrence; all other copies are cut out of their documents.
    Returns (id, clean_text, n_tokens_removed) for EVERY input doc
    (untouched docs pass through with 0 removed).

    Stages: ``verbatim_runs`` (or a precomputed ``runs`` frame) names
    the copies to cut -- the ``id_b`` side of each run, since runs are
    emitted with id_a < id_b; per-doc overlapping spans merge with a
    gaps-and-islands window (running max of span ends); the merged
    spans collect into ONE array per doc (bounded by spans-per-doc,
    not corpus) and a single in-row index filter drops covered tokens.
    Shuffles: the runs pipeline + one per-doc window + one per-doc
    agg -- nothing pairwise beyond the anchor join itself.
    """
    if runs is None:
        runs = verbatim_runs(
            docs, k=k, min_len=min_len, id_col=id_col, text_col=text_col
        )
    from pyspark.sql.window import Window

    spans = runs.select(
        F.col("id_b").alias("id"),
        F.col("b_start").alias("s"),
        (F.col("b_start") + F.col("run_len")).alias("e"),
    )
    w = Window.partitionBy("id").orderBy("s", "e")
    merged = (
        spans.withColumn(
            "__prev_max_e",
            F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        )
        .withColumn(
            "__new",
            F.when(
                F.col("s") > F.coalesce("__prev_max_e", F.lit(-1)), 1
            ).otherwise(0),
        )
        .withColumn(
            "__island",
            F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("id", "__island")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
        .groupBy("id")
        .agg(F.collect_list(F.struct("s", "e")).alias("__spans"))
    )
    toked = docs.select(
        F.col(id_col).alias("id"), tokens(text_col).alias("__toks")
    )
    covered = lambda i: F.exists(  # noqa: E731
        F.col("__spans"), lambda sp: (i >= sp["s"]) & (i < sp["e"])
    )
    return (
        toked.join(merged, "id", "left")
        .select(
            "id",
            F.when(
                F.col("__spans").isNull(), F.col("__toks")
            )
            .otherwise(
                F.filter("__toks", lambda x, i: ~covered(i.cast("long")))
            )
            .alias("__kept"),
            F.size("__toks").alias("__n_in"),
        )
        .select(
            F.col("id").alias(id_col),
            F.concat_ws(" ", F.col("__kept")).alias("clean_text"),
            (F.col("__n_in") - F.size("__kept"))
            .cast("long")
            .alias("n_tokens_removed"),
        )
    )


def build_anchor_index(
    docs: DataFrame,
    path: str,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_gram_df: int | None = None,
    max_gram_frac: float = DEFAULT_MAX_SHINGLE_FRAC,
    max_gram_occurrences: int | None = None,
) -> None:
    """Persist the k-gram anchor table (gram, id, pos) that
    ``verbatim_runs`` builds in-flight -- the build-once half of
    STREAMING verbatim matching (`streaming.pipeline.
    start_verbatim_match_sink` probes it per micro-batch).  Stop-gram
    capped like the batch operator; range-partitioned on (gram, id)
    so probe-side gram lookups prune row groups while Zipf-head grams
    split across partitions (same layout argument as the text
    index)."""
    toked = docs.select(F.col(id_col).alias("id"), tokens(text_col).alias("__toks"))
    pg = (
        toked.where(F.size("__toks") >= k)
        .select(
            "id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("__toks") - k),
                    lambda i: F.struct(
                        i.cast("long").alias("pos"),
                        F.concat_ws(" ", F.slice("__toks", i + 1, k)).alias(
                            "gram"
                        ),
                    ),
                )
            ).alias("pg"),
        )
        .select("id", F.col("pg.pos").alias("pos"), F.col("pg.gram").alias("gram"))
    )
    if max_gram_df is None:
        n_docs = toked.count()
        max_gram_df = effective_max_shingle_df(n_docs, frac=max_gram_frac)
    if max_gram_occurrences is None:
        max_gram_occurrences = 4 * max_gram_df
    heavy = (
        pg.groupBy("gram")
        .agg(
            F.count_distinct("id").alias("df"),
            F.count(F.lit(1)).alias("occ"),
        )
        .where(
            (F.col("df") > max_gram_df)
            | (F.col("occ") > max_gram_occurrences)
        )
        .select("gram")
    )
    import os

    spark = docs.sparkSession
    (
        pg.join(F.broadcast(heavy), "gram", "left_anti")
        .repartitionByRange("gram", "id")
        .sortWithinPartitions("gram", "id")
        .write.mode("overwrite")
        .parquet(os.path.join(path, "anchors"))
    )
    spark.createDataFrame([(int(k),)], "k int").write.mode("overwrite").parquet(
        os.path.join(path, "config")
    )


def winnowing_fingerprints(
    docs: DataFrame,
    k: int = 4,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, fp): the document's DISTINCT winnowing fingerprints
    (Schleimer/Wilkerson/Aiken, SIGMOD 2003 -- the MOSS local
    fingerprinting scheme): hash every positional word ``k``-gram
    (md5-prefix uint32, the engine's portable hash lane), then keep
    the minimum hash of every window of ``w`` consecutive gram
    hashes.  The winnowing guarantee: any shared token run of length
    >= w + k - 1 contributes at least one IDENTICAL fingerprint to
    both documents -- local matches survive, unlike MinHash (whose
    signatures are global-set summaries).  This is the set-based
    min-of-window variant (ties keep every minimum); the positional
    tie-break of the paper only matters for fingerprint DENSITY, not
    the guarantee.

    No shuffle until the caller explodes.  The default path is the
    Arrow-batched UDF (NumPy sliding minima over hashlib-md5 gram
    hashes) -- the ``_srp_bands_udf`` precedent: the pure-expression
    form exists as ``winnowing_fingerprints_expr`` (the shape the
    DuckDB oracle replays) but costs ~9x more, because each of the
    ``w`` shifted slices re-evaluates the whole md5 transform
    (Catalyst performs no common-subexpression elimination across
    array expressions), and the original per-window ``slice`` inside
    a ``transform`` lambda was O(grams^2) md5 work (measured: 44 s ->
    13.9 s -> ~2 s at sf0.1 for the pairs query across the three
    forms).  Results are identical integers in all three.  Docs with
    fewer than w + k - 1 tokens emit no fingerprints.
    """
    return docs.select(
        F.col(id_col),
        F.explode(winnowing_fp_array(F.col(text_col), k, w)).alias("fp"),
    )


def winnowing_fp_array(text: Column, k: int = 4, w: int = 4) -> Column:
    """Column form of the winnowing fingerprint set (array<long>) --
    the Arrow-batched kernel shared by the batch explode and the
    streaming ingest gate (which must carry its own event-time column
    through the explode)."""
    import hashlib as _hl

    import numpy as _np
    from pyspark.sql import types as _T

    @F.pandas_udf(_T.ArrayType(_T.LongType()))
    def _winnow(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = [x for x in (t or "").split(" ") if x]
            n = len(toks)
            if n < k + w - 1:
                out.append([])
                continue
            grams = [" ".join(toks[i : i + k]) for i in range(n - k + 1)]
            hs = _np.array(
                [
                    int(_hl.md5(g.encode()).hexdigest()[:8], 16)
                    for g in grams
                ],
                dtype=_np.int64,
            )
            m = len(hs) - w + 1
            mins = hs[:m].copy()
            for j in range(1, w):
                _np.minimum(mins, hs[j : j + m], out=mins)
            out.append(_np.unique(mins).tolist())
        return pd.Series(out)

    return _winnow(text)


def winnowing_fingerprints_expr(
    docs: DataFrame,
    k: int = 4,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pure-column-expression twin of ``winnowing_fingerprints`` --
    w shifted slices of the md5-uint32 gram-hash array folded with
    ``zip_with(least)`` (the ``_shingles_zip`` trick).  This is the
    operand tree the DuckDB oracle replays; kept for the
    equality pytest and for callers that must avoid Python workers.
    """
    from functools import reduce

    grams = word_shingles_all(F.col(text_col), k)
    hashes = F.transform(
        grams,
        lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long"),
    )
    n_windows = F.size(hashes) - (w - 1)
    shifted = [F.slice(hashes, j + 1, n_windows) for j in range(w)]
    mins = reduce(
        lambda a, b: F.zip_with(a, b, lambda x, y: F.least(x, y)), shifted
    )
    fps = F.when(n_windows >= 1, F.array_distinct(mins)).otherwise(
        F.array().cast("array<bigint>")
    )
    return docs.select(F.col(id_col), F.explode(fps).alias("fp"))


def winnowing_pairs(
    docs: DataFrame,
    k: int = 4,
    w: int = 4,
    min_shared: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_fp_df: int | None = None,
    max_fp_frac: float = DEFAULT_MAX_SHINGLE_FRAC,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowing fingerprints
    -- the candidate generator for local-overlap dedup (template
    reuse, partial plagiarism, boilerplate families) that MinHash's
    whole-document signatures miss and verbatim-run anchoring only
    reports span-by-span.

    Same discipline as every shingle-keyed family member: candidates
    come from the stop-fingerprint-PRUNED table (document frequency
    capped corpus-relatively like ``effective_max_shingle_df``), the
    reported shared count is recounted over the FULL fingerprint
    table, and both sides are fp-keyed equi-joins -- no cross join,
    hot fingerprints bounded.  Returns (id_a, id_b, n_shared),
    id_a < id_b.
    """
    if max_fp_df is None:
        max_fp_df = effective_max_shingle_df(docs.count(), frac=max_fp_frac)

    fp = _cache_scratch(winnowing_fingerprints(docs, k, w, id_col, text_col))
    rare = (
        fp.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= max_fp_df)
        .select("fp")
    )
    pruned = fp.join(rare, "fp")
    cand = (
        pruned.select(F.col(id_col).alias("id_a"), "fp")
        .join(pruned.select(F.col(id_col).alias("id_b"), "fp"), "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    a = fp.select(F.col(id_col).alias("id_a"), "fp")
    b = fp.select(F.col(id_col).alias("id_b"), "fp")
    return (
        cand.join(a, "id_a")
        .join(b, ["id_b", "fp"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def build_winnowing_index(
    docs: DataFrame,
    path: str,
    k: int = 4,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_fp_df: int | None = None,
    max_fp_frac: float = DEFAULT_MAX_SHINGLE_FRAC,
) -> None:
    """Persist the winnowing fingerprint table -- the build-once half
    of the streaming gate (``streaming.pipeline.winnowing_match_stream``
    probes it per micro-batch) and of repeated batch pair mining, the
    same contract as every other persisted index family (anchors,
    LSH/IVF/graph, text postings).  Postings are stop-fp pruned at
    BUILD time (corpus-relative cap, recorded in config) and
    range-partitioned on (fp, id) so probe-side fingerprint lookups
    prune row groups."""
    import os

    if max_fp_df is None:
        max_fp_df = effective_max_shingle_df(docs.count(), frac=max_fp_frac)
    fp = winnowing_fingerprints(docs, k, w, id_col, text_col)
    rare = (
        fp.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("__df"))
        .where(F.col("__df") <= max_fp_df)
        .select("fp")
    )
    spark = docs.sparkSession
    (
        fp.join(rare, "fp")
        .select(F.col(id_col).alias("doc_id"), "fp")
        .repartitionByRange("fp", "doc_id")
        .sortWithinPartitions("fp", "doc_id")
        .write.mode("overwrite")
        .parquet(os.path.join(path, "postings"))
    )
    spark.createDataFrame(
        [(int(k), int(w), int(max_fp_df))], "k int, w int, max_fp_df int"
    ).write.mode("overwrite").parquet(os.path.join(path, "config"))


def load_winnowing_index(spark, path: str) -> tuple[DataFrame, int, int]:
    """(postings, k, w): the persisted fingerprint table (already
    stop-fp pruned at build time) plus the gram/window geometry the
    probe side must reproduce.  Streaming segment trees
    (``postings_stream/batch=<id>``, written by
    ``streaming.pipeline.winnowing_ingest_apply_batch``) union in
    automatically, so a streamed document matches probes the
    micro-batch after it arrives.  Probes self-heal a crashed swap
    first (``ann_index._heal_swap_for_read``), the family contract."""
    import os

    from .ann_index import (
        _ABSORB_MARKER,
        _absorbed_batches,
        _folded_ids,
        _heal_swap_for_read,
    )

    _heal_swap_for_read(path, "postings")
    _heal_swap_for_read(path, "postings_stream")
    cfg = _read_small(spark, os.path.join(path, "config"))[0]
    postings = spark.read.parquet(os.path.join(path, "postings"))
    seg_dir = os.path.join(path, "postings_stream")
    if os.path.exists(seg_dir):
        seg = spark.read.option("basePath", seg_dir).parquet(seg_dir)
        # The family segment contract: ids folded into batch=-1
        # (sidecar) or absorbed into the main postings (manifest) are
        # replays when their directory reappears -- excluded here so
        # local-overlap counts never double.
        gone = set(_absorbed_batches(path).get("postings_stream", []))
        gone |= set(_folded_ids(seg_dir))
        if gone:
            seg = seg.where(~F.col("batch").isin(sorted(gone)))
        postings = postings.unionByName(seg.select(*postings.columns))
        if os.path.exists(os.path.join(path, _ABSORB_MARKER)):
            # crashed absorb window: rows exist in main AND segments
            postings = postings.distinct()
    # Tombstoned docs vanish from every probe immediately (the
    # family-wide takedown hook; see delete_from_winnowing_index).
    tomb_dir = os.path.join(path, "tombstones")
    if os.path.exists(tomb_dir):
        tombs = spark.read.parquet(tomb_dir).select("doc_id").distinct()
        postings = postings.join(tombs, "doc_id", "left_anti")
    return postings, int(cfg["k"]), int(cfg["w"])


def winnowing_ingest_apply_batch(
    batch: DataFrame,
    batch_id: int,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """One micro-batch of the streaming winnowing-index ingest: the
    arriving documents' fingerprints land as a whole-directory
    OVERWRITE of ``postings_stream/batch=<id>`` -- the per-batch-id
    idempotent segment layout (a replayed batch rewrites its own
    directory).  The build-time df cap guards this batch's marginal
    contribution: new fingerprints whose stored-plus-batch df would
    exceed the cap are skipped.  The stored df is measured against the
    main postings and every segment EXCEPT this batch's own id -- the
    "reads exclude the current batch id" replay contract, so a
    replayed batch reaches the same keep/skip decision it reached the
    first time instead of double-counting its own prior write.
    Cap-drift posture and caller contract (disjoint ids) match
    ``append_winnowing_index``."""
    import os

    if not batch.take(1):
        return
    spark = batch.sparkSession
    cfg = _read_small(spark, os.path.join(path, "config"))[0]
    k, w, cap = int(cfg["k"]), int(cfg["w"]), int(cfg["max_fp_df"])

    new_fp = _cache_scratch(
        winnowing_fingerprints(batch, k, w, id_col, text_col).select(
            F.col(id_col).alias("doc_id"), "fp"
        )
    )
    from .ann_index import _ABSORB_MARKER, _absorbed_batches, _folded_ids

    stored = spark.read.parquet(os.path.join(path, "postings"))
    seg_dir = os.path.join(path, "postings_stream")
    if os.path.exists(seg_dir):
        prior = (
            spark.read.option("basePath", seg_dir)
            .parquet(seg_dir)
            .where(F.col("batch") != int(batch_id))
        )
        # Same replay exclusions as every probe read: a directory
        # whose id was folded (sidecar) or absorbed (manifest) already
        # flows through batch=-1 / the main postings -- counting it
        # again here would inflate stored df and wrongly cap-skip
        # healthy fingerprints.
        gone = set(_absorbed_batches(path).get("postings_stream", []))
        gone |= set(_folded_ids(seg_dir))
        if gone:
            prior = prior.where(~F.col("batch").isin(sorted(gone)))
        stored = stored.unionByName(prior.select(*stored.columns))
        if os.path.exists(os.path.join(path, _ABSORB_MARKER)):
            # crashed-absorb window: rows exist in main AND segments
            stored = stored.distinct()
    stored_df = (
        stored.join(new_fp.select("fp").distinct(), "fp")
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("__stored"))
    )
    new_df = new_fp.groupBy("fp").agg(F.count(F.lit(1)).alias("__new"))
    totals = new_df.join(stored_df, "fp", "left").select(
        "fp",
        "__new",
        (F.coalesce("__stored", F.lit(0)) + F.col("__new")).alias("__total"),
    )
    ok = totals.where(F.col("__total") <= cap).select("fp")
    (
        new_fp.join(ok, "fp")
        .write.mode("overwrite")
        .parquet(os.path.join(seg_dir, f"batch={int(batch_id)}"))
    )
    # Overflow ledger, segment form: skipped-fp counts land as the
    # same idempotent batch-keyed overwrite (the batch-appended ledger
    # of ``append_winnowing_index`` would double on replay), so
    # ``optimize_winnowing_index`` can measure TRUE df for streamed
    # corpora too.
    (
        totals.where(F.col("__total") > cap)
        .select("fp", F.col("__new").cast("long").alias("overflow_df"))
        .write.mode("overwrite")
        .parquet(
            os.path.join(path, "overflow_stream", f"batch={int(batch_id)}")
        )
    )


def optimize_winnowing_stream_segments(spark, path: str) -> None:
    """Fold the winnowing index's ``postings_stream/batch=*`` tree
    into one ``batch=-1`` tree (full-row distinct -- replayed-batch
    duplicates collapse; rows are unique per (doc_id, fp) by the
    ingest contract) under the shared crash-safe fold contract
    (``ann_index._fold_tree``: re-run recovery, replay-directory
    exclusion via manifest + sidecar, rename-aside swap) --
    single-writer, stream stopped."""
    from .ann_index import _absorbed_batches, _fold_tree

    absorbed = _absorbed_batches(path)
    _fold_tree(
        spark, path, "postings_stream",
        set(absorbed.get("postings_stream", [])),
    )


def append_winnowing_index(
    new_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Incrementally index new documents' winnowing fingerprints --
    the daily-ingest maintenance path, same contract family as
    ``append_text_index``: one Arrow pass over the NEW docs, one
    row-group-pruned probe of the stored postings (only the
    fingerprints present in the new batch) to measure combined
    document frequency, then an append of the new postings whose
    TOTAL df stays within the build-time cap.

    Caller contract: ids must be disjoint from ids already indexed
    (append never dedups).  Cap drift: fingerprints that cross the cap
    via this batch get no new postings (cost guard holds) and their
    skipped counts land in the ``overflow`` ledger, so
    ``optimize_winnowing_index`` can later measure TRUE df and drop
    their pre-existing postings too -- until then those stay (the cap
    is a cost guard, not a correctness gate)."""
    import os

    spark = new_docs.sparkSession
    cfg = _read_small(spark, os.path.join(path, "config"))[0]
    k, w, cap = int(cfg["k"]), int(cfg["w"]), int(cfg["max_fp_df"])

    new_fp = _cache_scratch(
        winnowing_fingerprints(new_docs, k, w, id_col, text_col).select(
            F.col(id_col).alias("doc_id"), "fp"
        )
    )
    stored = spark.read.parquet(os.path.join(path, "postings"))
    stored_df = (
        stored.join(new_fp.select("fp").distinct(), "fp")
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("__stored"))
    )
    new_df = new_fp.groupBy("fp").agg(F.count(F.lit(1)).alias("__new"))
    totals = new_df.join(stored_df, "fp", "left").select(
        "fp",
        "__new",
        (F.coalesce("__stored", F.lit(0)) + F.col("__new")).alias("__total"),
    )
    ok = totals.where(F.col("__total") <= cap).select("fp")
    (
        new_fp.join(ok, "fp")
        .repartitionByRange("fp", "doc_id")
        .sortWithinPartitions("fp", "doc_id")
        .write.mode("append")
        .parquet(os.path.join(path, "postings"))
    )
    # Overflow ledger: fingerprints whose postings were SKIPPED here
    # (their true df now exceeds the stored df).  optimize reads this
    # to measure real df without re-reading any document.
    (
        totals.where(F.col("__total") > cap)
        .select("fp", F.col("__new").cast("long").alias("overflow_df"))
        .write.mode("append")
        .parquet(os.path.join(path, "overflow"))
    )


def optimize_winnowing_index(spark, path: str) -> None:
    """Maintenance re-prune for an append-grown winnowing index (the
    ``optimize_graph_index`` twin): fingerprints whose document
    frequency drifted ABOVE the build-time cap across many appends
    (append only guards each batch's marginal contribution) are
    dropped entirely, restoring the cost bound without re-reading any
    document -- one postings scan, one df agg, one rewrite.  Layout is
    re-range-partitioned on (fp, id) like a fresh build.  Streaming
    segment trees (postings and the batch-keyed overflow ledger) are
    ABSORBED: their rows join the df measurement and the rewrite, and
    the trees are removed last -- the absorption is distinct-based, so
    re-running after a crash is the recovery.

    Filesystem contract: the postings rewrite swaps directories with
    ``rmtree`` + ``rename`` -- a local/posix-rename assumption, same
    as the parquet compactor and ``optimize_history_store``; object
    stores need a copy-based swap.  The overflow ledger's presence is
    checked explicitly (no blanket exception handling): a ledger that
    exists but fails to READ aborts the optimize with the real error
    instead of silently dropping the skipped-posting counts and then
    deleting the evidence."""
    import os
    import shutil

    from .ann_index import (
        _ABSORB_MARKER,
        _absorbed_batches,
        _folded_ids,
        _recover_swap,
        _swap_dir,
        _write_absorb_manifest,
    )

    for name in ("postings", "postings_stream"):
        _recover_swap(path, name)
    cfg = _read_small(spark, os.path.join(path, "config"))[0]
    cap = int(cfg["max_fp_df"])
    postings = spark.read.parquet(os.path.join(path, "postings"))
    # Absorb streaming segments into the rewrite.  Replay directories
    # (manifest/sidecar-listed ids) are excluded like every other
    # read; the ``_absorbing`` marker written below keeps probes
    # correct (union-distinct) in the window between the postings
    # swap and the segment-tree removal.
    seg_dir = os.path.join(path, "postings_stream")
    have_segments = os.path.isdir(seg_dir)
    marker = os.path.join(path, _ABSORB_MARKER)
    if not have_segments and os.path.exists(marker):
        os.remove(marker)  # orphaned by a crash after tree removal
    prior_absorbed = _absorbed_batches(path)
    if have_segments:
        seg = spark.read.option("basePath", seg_dir).parquet(seg_dir)
        gone = set(prior_absorbed.get("postings_stream", []))
        gone |= set(_folded_ids(seg_dir))
        if gone:
            seg = seg.where(~F.col("batch").isin(sorted(gone)))
        postings = postings.unionByName(
            seg.drop("batch").select(*postings.columns)
        ).distinct()
    stored = postings.groupBy("fp").agg(F.count(F.lit(1)).alias("__df"))
    over_parts = []
    ledger_dir = os.path.join(path, "overflow")
    have_ledger = os.path.isdir(ledger_dir)
    if have_ledger:
        over_parts.append(spark.read.parquet(ledger_dir))
    seg_ledger_dir = os.path.join(path, "overflow_stream")
    have_seg_ledger = os.path.isdir(seg_ledger_dir)
    if have_seg_ledger:
        seg_ledger = spark.read.option("basePath", seg_ledger_dir).parquet(
            seg_ledger_dir
        )
        gone_l = set(prior_absorbed.get("overflow_stream", []))
        if gone_l:
            seg_ledger = seg_ledger.where(
                ~F.col("batch").isin(sorted(gone_l))
            )
        over_parts.append(seg_ledger.select("fp", "overflow_df"))
    if over_parts:
        over = over_parts[0]
        for p in over_parts[1:]:
            over = over.unionByName(p)
        over = over.groupBy("fp").agg(F.sum("overflow_df").alias("__over"))
        stored = stored.join(over, "fp", "left").select(
            "fp",
            (F.col("__df") + F.coalesce("__over", F.lit(0))).alias("__df"),
        )
    keep = stored.where(F.col("__df") <= cap).select("fp")
    pruned = (
        postings.join(keep, "fp")
        .repartitionByRange("fp", "doc_id")
        .sortWithinPartitions("fp", "doc_id")
    )
    if have_segments:
        with open(marker, "w") as fh:
            fh.write("absorb in progress; probes dedup segment unions\n")
    tmp = os.path.join(path, "postings__next")
    pruned.write.mode("overwrite").parquet(tmp)
    _swap_dir(os.path.join(path, "postings"), tmp)
    if have_segments or have_seg_ledger:
        # Absorb manifest (the shared ann_index writer): a batch
        # replayed after its tree is removed recreates its directory
        # but stays excluded from every read forever.
        _write_absorb_manifest(path, ("postings_stream", "overflow_stream"))
    if have_segments:
        shutil.rmtree(seg_dir, ignore_errors=True)
    if have_ledger:
        # Every overflow fingerprint has true df > cap and was just
        # dropped entirely -- the ledger is settled.  Only deleted
        # when it was actually read and applied above.
        shutil.rmtree(ledger_dir, ignore_errors=True)
    if have_seg_ledger:
        shutil.rmtree(seg_ledger_dir, ignore_errors=True)
    if os.path.exists(marker):
        os.remove(marker)


def lsh_tuning_report(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    perms: int = MINHASH_PERMS,
    rows_per_band: int = ROWS_PER_BAND,
    hash_mode: str = "oracle",
) -> DataFrame:
    """LSH banding cost report -- the observed side of the (bands,
    rows_per_band) tuning decision (the banding analysis of Leskovec,
    Rajaraman & Ullman, Mining of Massive Datasets ch. 3).  The
    S-curve gives the THEORY
    (P[candidate | jaccard=s] = 1 - (1 - s^r)^b); what it cannot give
    is the PRICE on this corpus: how many candidate pairs the band
    join will actually emit, which is entirely a property of the
    bucket-size distribution.  Per band: bucket count, singleton
    buckets (docs that collide with nothing -- dead weight), the
    hottest bucket (the straggler task of the self-join), and the
    exact candidate-pair volume sum m*(m-1)/2 -- read BEFORE running
    pair generation at corpus scale, to re-band if a hot bucket or
    the total volume says the self-join would blow up.

    One signatures pass + one (band, bucket)-keyed count + one
    band-keyed rollup; never materializes a pair.  The report costs
    the same as signature computation however skewed the buckets are
    -- which is the point: it is safe to run where the join is not.
    """
    sh = shingle_table(docs, id_col, text_col, n)
    sigs = minhash_signatures_wide(sh, id_col, perms, hash_mode)
    bands = minhash_bands(sigs, id_col, perms, rows_per_band, hash_mode)
    buckets = bands.groupBy("band_id", "band_val").agg(
        F.count(F.lit(1)).cast("long").alias("m")
    )
    return buckets.groupBy("band_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum(F.when(F.col("m") == 1, 1).otherwise(0)).cast("long").alias(
            "singleton_buckets"
        ),
        F.max("m").alias("max_bucket"),
        F.sum(F.col("m") * (F.col("m") - 1) / 2).cast("long").alias(
            "candidate_pairs"
        ),
    )


def source_dedup_audit(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source exact-duplicate governance report -- the 'which
    upstream feed is re-sending the corpus' view that decides where a
    dedup gate pays for itself: for every source, its doc count, how
    many of its docs duplicate ANY other doc (same canonical
    fingerprint, anywhere in the corpus), how many duplicate a doc in
    a DIFFERENT source (mirrored / twice-pipelined feeds -- the case
    per-source dedup can't fix), the docs it would lose to global
    min-id dedup, and the duplicate rate.

    Two aggregates over the fingerprint table: one fingerprint-keyed
    (count + distinct-source count + min id per fp -- the same
    shuffle exact dedup itself pays, fingerprints never re-shuffle as
    full text), one source-keyed rollup of per-doc flags.  Output is
    |sources| rows at any corpus size.
    """
    from .text import fingerprint

    fp = docs.select(
        F.col(id_col).alias("__id"),
        F.col(source_col).alias("__src"),
        fingerprint(F.col(text_col)).alias("__fp"),
    )
    stats = fp.groupBy("__fp").agg(
        F.count(F.lit(1)).alias("__n"),
        F.countDistinct("__src").alias("__nsrc"),
        F.min("__id").alias("__keep"),
    )
    return (
        fp.join(stats, "__fp")
        .groupBy("__src")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("__n") > 1, 1).otherwise(0))
            .cast("long")
            .alias("dup_docs"),
            F.sum(F.when(F.col("__nsrc") > 1, 1).otherwise(0))
            .cast("long")
            .alias("cross_source_dup_docs"),
            F.sum(F.when(F.col("__id") != F.col("__keep"), 1).otherwise(0))
            .cast("long")
            .alias("docs_lost_to_dedup"),
            F.round(
                F.sum(F.when(F.col("__n") > 1, 1).otherwise(0))
                / F.count(F.lit(1)),
                6,
            ).alias("dup_rate"),
        )
        .withColumnRenamed("__src", source_col)
    )


def delete_from_winnowing_index(
    ids: DataFrame, path: str, id_col: str = "doc_id"
) -> None:
    """Tombstone deletes for the winnowing fingerprint index -- the
    MOSS-overlap member of the family-wide takedown path: APPEND doc
    ids to ``tombstones/``; every probe (batch pair mining and the
    streaming gate, both of which read through
    ``load_winnowing_index``) excludes the docs the same moment.  The
    append-side fp ledger keeps the deleted docs' df contributions
    until the physical pass -- deletion only LOWERS true frequencies,
    so stop-fp pruning stays conservative, never wrong.  Repeat
    deletes are idempotent."""
    import os

    ids.select(F.col(id_col).cast("long").alias("doc_id")).write.mode(
        "append"
    ).parquet(os.path.join(path, "tombstones"))


def apply_winnowing_deletes(
    spark, path: str, retire_tombstones: bool = False
) -> None:
    """Physically retire a winnowing index's tombstones: rewrite the
    postings minus the deleted docs (read-then-swap, preserving the
    (fp, doc_id) range layout the probe's row-group pruning relies
    on) and fold the streaming segment tree, if any, to a filtered
    ``batch=-1``.  The tombstone table is KEPT by default (compacted)
    -- with a streaming ingest path, a replayed in-flight batch that
    contained deleted docs must stay masked; pass
    ``retire_tombstones=True`` only when no replay is possible.
    Single-writer, probes and the streaming gate stopped -- the
    family contract."""
    import os
    import shutil

    tomb_dir = os.path.join(path, "tombstones")
    if not os.path.exists(tomb_dir):
        return
    tombs = (
        spark.read.parquet(tomb_dir)
        .select("doc_id")
        .distinct()
        .localCheckpoint(eager=True)
    )
    kept = (
        spark.read.parquet(os.path.join(path, "postings"))
        .join(tombs, "doc_id", "left_anti")
        .repartitionByRange("fp", "doc_id")
        .sortWithinPartitions("fp", "doc_id")
        .localCheckpoint(eager=True)
    )
    kept.write.mode("overwrite").parquet(os.path.join(path, "postings"))
    from .ann_index import _absorbed_batches as _ab
    from .ann_index import _fold_tree as _ft

    _ft(
        spark,
        path,
        "postings_stream",
        set(_ab(path).get("postings_stream", [])),
        transform=lambda df: df.join(tombs, "doc_id", "left_anti"),
    )
    if retire_tombstones:
        shutil.rmtree(tomb_dir)
    else:
        tombs.coalesce(1).write.mode("overwrite").parquet(tomb_dir)
