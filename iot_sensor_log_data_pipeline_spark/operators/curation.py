"""Corpus-curation operators for the LLM-training-data surface:
deterministic splits, repetition-based quality filters, and benchmark
decontamination over ``documents``.

All pure JVM-side Column/DataFrame expressions (whole-stage codegen,
no Python in the hot path), each with an exact DuckDB oracle twin in
``plans/curation_queries.py``.

Scale notes (100 TB):
- ``split_bucket`` is a stateless per-row hash -- no shuffle, no
  driver state, reproducible across runs/partitionings (the property
  that makes train/val membership stable as the corpus grows: a doc's
  split never depends on what else is in the corpus).
- ``repetition filters`` are per-row array expressions -- map-side
  only.
- ``contaminated_docs`` joins on shingle (corpus x benchmark): the
  benchmark side is small (it's an eval set), so the join broadcasts;
  candidates are bucket pairs, never a cartesian.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ._scratch_cache import ScratchCaches
from .dedup import word_shingles
from .text import tokens

#: Scratch cache (lifetime contract in ``_scratch_cache``): holds the
#: per-domain token-share table when it feeds multiple consumers.
_SCRATCH = ScratchCaches()


def release_caches() -> None:
    """Unpersist scratch cached by earlier mixture calls."""
    _SCRATCH.release()


#: Default split weights (percent of the 100-bucket hash space).
DEFAULT_SPLITS: tuple[tuple[str, int], ...] = (
    ("train", 90),
    ("val", 5),
    ("test", 5),
)


def split_bucket(id_col: Column | str, n_buckets: int = 100) -> Column:
    """Deterministic [0, n_buckets) bucket from the first 8 hex chars
    of md5(id) -- content-addressed, partitioning-independent.  The
    md5 prefix is uniform, so bucket shares converge to the weights at
    corpus scale (law of large numbers; exactness is not the point --
    stability of membership is)."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")
        % n_buckets
    )


def split_label(
    id_col: Column | str, splits: tuple[tuple[str, int], ...] = DEFAULT_SPLITS
) -> Column:
    """Map the hash bucket onto named splits by cumulative weight
    (weights must sum to 100): bucket < 90 -> train, < 95 -> val, ..."""
    if sum(w for _, w in splits) != 100:
        raise ValueError(f"split weights must sum to 100: {splits}")
    bucket = split_bucket(id_col)
    expr: Column | None = None
    cum = 0
    for name, weight in splits:
        cum += weight
        cond = bucket < cum
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return expr  # last WHEN covers bucket 99 because cum == n_buckets


def weighted_sample(
    df: DataFrame,
    weight: Column,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sample without replacement: top-``k``
    documents by the Efraimidis-Spirakis A-ES key ``ln(u) / w`` (the
    log form of ``u^(1/w)``; higher is better), with the uniform ``u``
    derived from md5(id) instead of an RNG -- content-addressed, so
    membership is reproducible across runs and partitionings and the
    oracle can replay the draw exactly.

    Inclusion probability rises with ``weight`` (quality score, token
    count, ...).  Scale shape: the key is a stateless per-row
    expression and the top-k plans as TakeOrderedAndProject --
    per-partition heaps, no global sort, no shuffle beyond the final
    k-row gather.  Zero/negative weights are excluded (their key is
    undefined), matching rejection sampling semantics.

    ``u = (uint32(md5(id)[:8]) + 1) / 2^32`` lies in (0, 1]; ``u = 1``
    gives key 0, the best possible draw, so no document is lost to the
    open interval.
    """
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("double")
        + 1.0
    ) / F.lit(4294967296.0)
    key = F.log(u) / weight
    return (
        df.where(weight > 0)
        .withColumn("sample_key", F.round(key, 10))
        .orderBy(F.desc("sample_key"), F.col(id_col))
        .limit(k)
    )


def bottomk_sample(
    df: DataFrame,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Content-addressed UNIFORM sample of exactly ``k`` rows: the
    documents with the ``k`` smallest ``md5(id)`` keys (min-wise /
    bottom-k sampling).  The deterministic fixed-size sample every
    profiling or eyeballing job wants, with three properties an
    RNG-based ``.sample()`` lacks at 100 TB:

    - REPRODUCIBLE: membership depends only on content ids -- same
      sample across runs, partitionings, and engines (the oracle
      replays it as ORDER BY md5 LIMIT k).
    - MERGEABLE: bottom-k of a union == bottom-k of the per-shard
      bottom-ks, so per-shard (or per-micro-batch) candidates fold
      without re-scanning -- the property the streaming sample sink
      (``streaming/pipeline.py:start_sample_sink``) is built on.
    - APPEND-STABLE: new data can only DISPLACE members (never
      reshuffle the survivors), so sample drift across snapshots is
      exactly the displaced set.

    Scale shape: a stateless per-row key + top-k, planned as
    TakeOrderedAndProject (per-partition heaps, k-row gather, no
    global sort).  Emits ``sample_key`` so consumers can fold samples
    themselves."""
    return (
        df.withColumn("sample_key", F.md5(F.col(id_col).cast("string")))
        .orderBy(F.asc("sample_key"), F.col(id_col))
        .limit(k)
    )


def dup_ngram_fraction(text: Column | str, n: int) -> Column:
    """Fraction of word n-gram *positions* occupied by a repeated
    n-gram: 1 - distinct/total (the Gopher-style 'duplicate n-gram
    fraction' repetition signal; 0 for texts shorter than n tokens)."""
    toks = tokens(text)
    total = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    distinct = F.size(word_shingles(text, n))  # already distinct
    return F.when(F.size(toks) < n, F.lit(0.0)).otherwise(
        1.0 - distinct / total.cast("double")
    )


def max_token_length(text: Column | str) -> Column:
    """Length of the longest whitespace token (Gopher caps this: giant
    unbroken strings are markup/binary junk, not prose)."""
    return F.coalesce(
        F.array_max(F.transform(tokens(text), lambda t: F.length(t).cast("long"))),
        F.lit(0).cast("long"),
    )


def symbol_ratio(text: Column | str) -> Column:
    """Fraction of characters that are neither [a-z0-9] nor space."""
    col = F.col(text) if isinstance(text, str) else text
    return F.length(F.regexp_replace(col, "[a-z0-9 ]", "")) / F.length(col)


def repetition_pass(
    text: Column | str,
    max_dup_2gram: float = 0.6,
    max_dup_3gram: float = 0.5,
    max_tok_len: int = 30,
    max_symbols: float = 0.1,
) -> Column:
    """The blended keep/drop verdict of the repetition battery
    (thresholds are the classic Gopher/C4 ballpark, scaled to this
    synthetic corpus's token distribution)."""
    return (
        (dup_ngram_fraction(text, 2) <= max_dup_2gram)
        & (dup_ngram_fraction(text, 3) <= max_dup_3gram)
        & (max_token_length(text) <= max_tok_len)
        & (symbol_ratio(text) <= max_symbols)
    )


def contaminated_docs(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing at least one word
    ``n``-gram with any benchmark doc, with the overlap count -- the
    standard pre-training hygiene pass (drop training docs that leak
    eval data).

    Plan: distinct n-gram shingles on both sides, broadcast the
    benchmark shingle set (eval sets are tiny next to the corpus),
    equi-join on the shingle, per-doc count distinct of matched
    shingles.  One corpus-side shuffle for the final groupBy; the join
    itself is map-side.
    """
    corp = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("shingle"),
    )
    bench = benchmark.select(
        F.explode(word_shingles(F.col(text_col), n)).alias("shingle")
    ).distinct()
    return (
        corp.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_overlapping_ngrams"))
    )


def contamination_scores(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    threshold: float = 0.05,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document benchmark-overlap SCORE -- the graded companion of
    ``contaminated_docs`` (which reports only the docs with any hit):
    every corpus doc gets the fraction of its distinct word n-grams
    that appear anywhere in the benchmark, plus a boolean at
    ``threshold`` -- the triage view a curation run needs to decide
    between dropping a doc and excising a span (a 2% overlap is a
    quoted sentence; an 80% overlap is the eval set).

    Plan: ONE shingle pass over the corpus (the per-doc distinct total
    is computed in the row, then carried through an ``explode_outer``
    so shingle-less docs survive), broadcast benchmark shingle set as
    a LEFT join (zero-overlap docs keep their rows, the hit marker is
    null), one per-doc hash agg.  No join-back and no second shingling
    pass -- the corpus text is read exactly once.
    """
    corp = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.size(word_shingles(F.col(text_col), n)).cast("long").alias("n_shingles"),
        F.explode_outer(word_shingles(F.col(text_col), n)).alias("shingle"),
    )
    bench = (
        benchmark.select(
            F.explode(word_shingles(F.col(text_col), n)).alias("shingle")
        )
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    scored = (
        corp.join(F.broadcast(bench), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.first("n_shingles").alias("n_shingles"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("long").alias("n_matched"),
        )
    )
    frac = F.col("n_matched") / F.greatest(F.col("n_shingles"), F.lit(1))
    return scored.select(
        "doc_id",
        "n_shingles",
        "n_matched",
        F.round(frac, 6).alias("overlap_frac"),
        (frac > threshold).alias("contaminated"),
    )


def mixture_weights(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    target_shares: dict[str, float] | None = None,
) -> DataFrame:
    """Per-domain sampling weights that steer the corpus token mixture
    toward a target (uniform across domains by default) -- the domain
    reweighting step of training-data curation (the fixed-target
    special case of DoReMi-style mixture optimization, Xie et al.
    2023: one reweighting pass, no proxy-model loop).

    Returns (group, n_docs, n_tokens, token_share, weight) where
    ``weight = target_share / token_share``: >1 means upsample this
    domain, <1 downsample; weighted token mass then matches the
    target.  Feed ``weight`` into ``weighted_sample`` for the draw.

    Scale shape: per-group token totals are one hash agg over
    group_col (pure column token_count, no explode); the corpus total
    is a 1-row broadcast (allowlisted scalar pattern).  The group
    table is dashboard-sized at any corpus scale.
    """
    from .text import token_count

    per_group = docs.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(token_count(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    total = per_group.agg(
        F.sum("n_tokens").cast("double").alias("total_tokens"),
        F.count(F.lit(1)).cast("double").alias("n_groups"),
    )
    out = per_group.crossJoin(F.broadcast(total)).withColumn(
        "token_share", F.col("n_tokens") / F.col("total_tokens")
    )
    if target_shares is None:
        target = 1.0 / F.col("n_groups")
    else:
        target = None
        for g, share in sorted(target_shares.items()):
            branch = F.when(F.col(group_col) == g, F.lit(float(share)))
            target = branch if target is None else target.when(
                F.col(group_col) == g, F.lit(float(share))
            )
        target = target.otherwise(F.lit(0.0))
    return out.select(
        group_col,
        "n_docs",
        "n_tokens",
        "token_share",
        (target / F.col("token_share")).alias("weight"),
    )


def temperature_mixture_weights(
    docs: DataFrame,
    alpha: float = 0.3,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled domain mixture (the multilingual-LM sampling
    rule of mT5 / XLM-R: Xue et al., NAACL 2021, arXiv:2010.11934 §3.1;
    Conneau et al., ACL 2020, arXiv:1911.02116 §3): the target share of
    domain i is ``share_i^alpha / sum_j share_j^alpha``, flattening the
    natural token distribution toward uniform as ``alpha -> 0`` (the
    papers use alpha ~= 0.3) and leaving it unchanged at ``alpha = 1``
    -- the generalization sitting between ``mixture_weights``'s two
    fixed cases (uniform target, explicit target).

    Returns (group, n_docs, n_tokens, token_share, target_share,
    weight) with ``weight = target_share / token_share`` (> 1 means
    upsample); feed into ``weighted_sample`` for the draw.  Scale
    shape identical to ``mixture_weights``: one group hash agg + a
    1-row broadcast of the corpus totals (here including
    sum(share^alpha), still one row); the group table is
    dashboard-sized at any corpus scale.
    """
    from .text import token_count

    # Cached: the domain-count-sized table feeds the corpus total, the
    # share^alpha normalizer, and the output rows -- without the cache
    # each consumer re-scans the corpus for the same group aggregate.
    per_group = _SCRATCH.cache(
        docs.groupBy(group_col).agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(token_count(F.col(text_col))).cast("long").alias("n_tokens"),
        )
    )
    total = per_group.agg(F.sum("n_tokens").cast("double").alias("total_tokens"))
    shared = per_group.crossJoin(F.broadcast(total)).withColumn(
        "token_share", F.col("n_tokens") / F.col("total_tokens")
    )
    z = shared.agg(
        F.sum(F.pow("token_share", F.lit(alpha))).alias("z")
    )
    return (
        shared.crossJoin(F.broadcast(z))
        .withColumn(
            "target_share", F.pow("token_share", F.lit(alpha)) / F.col("z")
        )
        .select(
            group_col,
            "n_docs",
            "n_tokens",
            "token_share",
            "target_share",
            (F.col("target_share") / F.col("token_share")).alias("weight"),
        )
    )


def curation_funnel(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang: str = "en",
    min_quality: float = 0.72,
) -> DataFrame:
    """Stage-by-stage survival report for the standard curation
    cascade -- the ops dashboard every corpus team keeps (how many
    docs/tokens survive each gate): input -> language filter ->
    quality threshold -> repetition battery -> exact-dedup survivor.
    Stages are CUMULATIVE (a doc counts at stage k iff it passed
    stages 1..k), matching ``curation_pipeline``'s gates and
    thresholds exactly, so the funnel explains the pipeline's output.

    Scale shape: ONE corpus pass computes every gate as a boolean
    flag column (all map-side expressions); the only shuffle is the
    text-hash window for the exact-dup survivor flag (min id per
    identical text).  The result is a 5-row stage table built by
    ``stack`` from a single aggregate row -- no per-stage re-scan of
    the corpus (the naive funnel runs the scan once per stage).
    Returns (stage_id, stage, n_docs, n_tokens).
    """
    from pyspark.sql.window import Window

    from .text import quality_score, token_count

    t = F.col(text_col)
    flags = docs.select(
        token_count(t).alias("ntok"),
        (F.col("lang") == lang).alias("f1"),
        quality_score(t).alias("q"),
        repetition_pass(t).alias("rep"),
        (
            F.col(id_col) == F.min(id_col).over(Window.partitionBy(text_col))
        ).alias("surv"),
    ).select(
        "ntok",
        "f1",
        (F.col("f1") & (F.col("q") >= min_quality)).alias("f2"),
        "rep",
        "surv",
    ).select(
        "ntok",
        "f1",
        "f2",
        (F.col("f2") & F.col("rep")).alias("f3"),
        "surv",
    )

    def n_of(flag: Column) -> Column:
        return F.sum(F.when(flag, 1).otherwise(0)).cast("long")

    def tok_of(flag: Column) -> Column:
        return F.sum(F.when(flag, F.col("ntok")).otherwise(0)).cast("long")

    f4 = F.col("f3") & F.col("surv")
    agg = flags.agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        F.sum("ntok").cast("long").alias("t0"),
        n_of(F.col("f1")).alias("n1"),
        tok_of(F.col("f1")).alias("t1"),
        n_of(F.col("f2")).alias("n2"),
        tok_of(F.col("f2")).alias("t2"),
        n_of(F.col("f3")).alias("n3"),
        tok_of(F.col("f3")).alias("t3"),
        n_of(f4).alias("n4"),
        tok_of(f4).alias("t4"),
    )
    return agg.selectExpr(
        "stack(5, "
        "0L, 'input', n0, t0, "
        "1L, 'language', n1, t1, "
        "2L, 'quality', n2, t2, "
        "3L, 'repetition', n3, t3, "
        "4L, 'exact_dedup', n4, t4) AS (stage_id, stage, n_docs, n_tokens)"
    )


def token_budget_sample(
    docs: DataFrame,
    total_tokens: int,
    alpha: float = 0.3,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assemble a FIXED-token-budget training corpus: split
    ``total_tokens`` across domains by the temperature-scaled target
    shares (``temperature_mixture_weights``; budget_i =
    floor(total * share_i^alpha / Z)), then fill each domain's budget
    greedily in md5(id) order -- the content-addressed analogue of
    'shuffle each domain and take documents until the token budget is
    hit', which is how a pretraining mixture is actually materialized
    once mixture weights are decided (the sampling step implied by
    mT5/XLM-R-style temperature mixtures and DoReMi weights).

    A document is kept iff its domain's running token total INCLUDING
    it stays within the budget (undershoot, never overshoot).
    Deterministic and replayable: the fill order is md5(id) with an id
    tiebreak, and budgets derive from unrounded shares.

    Scale shape: the budget table is domain-count-sized (broadcast);
    the fill is ONE window cumsum per domain partition (per-group
    sort, explicit ROWS frame, no corpus-global sort) -- the same
    shape as any per-group ranking.  Returns (id, group, n_tokens,
    cum_tokens, token_budget) for kept docs.
    """
    from pyspark.sql.window import Window

    from .text import token_count

    weights = temperature_mixture_weights(
        docs, alpha=alpha, group_col=group_col, text_col=text_col
    )
    budgets = weights.select(
        group_col,
        F.floor(F.lit(float(total_tokens)) * F.col("target_share"))
        .cast("long")
        .alias("token_budget"),
    )
    toks = docs.select(
        id_col, group_col, token_count(F.col(text_col)).alias("n_tokens")
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        toks.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .join(F.broadcast(budgets), group_col)
        .where(F.col("cum_tokens") <= F.col("token_budget"))
        .select(id_col, group_col, "n_tokens", "cum_tokens", "token_budget")
    )


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR importance weights (Xie et al., NeurIPS 2023, "Data
    Selection for Language Models via Importance Resampling",
    arXiv:2302.03169): score every raw document by how target-like
    its hashed token distribution is --
    ``log w(x) = sum over token occurrences of
    log(p_target(bucket) / p_raw(bucket))`` with
    ``bucket = md5(token) mod n_buckets`` and add-1 smoothing on both
    unigram bucket models.  Feed the exponentiated weight into
    ``weighted_sample`` for the paper's importance-resampling step.

    Scale shape: two bucket-keyed hash aggs (raw corpus, target set)
    collect <= 2 * n_buckets rows to the driver (the bounded
    sketch-to-closure pattern) to form the log-ratio table, which
    broadcast-equi-joins back onto one token explode; the per-doc
    reduction is a map-combined sum.  Returns
    (id, n_tokens, log_weight) for EVERY input doc (token-less docs
    score 0).
    """
    spark = docs.sparkSession

    def bucket_of(t):
        return (
            F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
            % n_buckets
        )

    def bucket_counts(df: DataFrame) -> dict[int, int]:
        rows = (
            df.select(F.explode(tokens(text_col)).alias("t"))
            .select(bucket_of(F.col("t")).alias("b"))
            .groupBy("b")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        return {int(r["b"]): int(r["c"]) for r in rows}

    raw_c = bucket_counts(docs)
    tgt_c = bucket_counts(target)
    raw_total = sum(raw_c.values()) + n_buckets
    tgt_total = sum(tgt_c.values()) + n_buckets
    import math

    ratio = spark.createDataFrame(
        [
            (
                b,
                math.log(
                    ((tgt_c.get(b, 0) + 1) / tgt_total)
                    / ((raw_c.get(b, 0) + 1) / raw_total)
                ),
            )
            for b in range(n_buckets)
        ],
        "b long, log_ratio double",
    )
    tok = docs.select(
        F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("t")
    ).select("id", bucket_of(F.col("t")).alias("b"))
    scored = (
        tok.join(F.broadcast(ratio), "b")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("log_ratio").alias("log_weight"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
            F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
        )
    )


def dsir_resample(
    docs: DataFrame,
    target: DataFrame,
    k: int,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR importance RESAMPLING (Xie et al. 2023 §2) -- the draw a
    curation user actually runs: ``dsir_weights`` scores every raw
    document, then ``k`` documents are sampled without replacement
    with probability rising in ``exp(log_weight)``.

    The draw is ``weighted_sample``'s Efraimidis-Spirakis scheme with
    w = exp(log_weight), executed in LOG space: ascending Gumbel-form
    key ``ln(-ln(u)) - log_weight`` orders identically to descending
    ``ln(u) / exp(log_weight)`` (for u in (0,1), ln(u) < 0, so
    maximizing ln(u)/w is minimizing -ln(u)/w = exp(ln(-ln(u)) - ln w)
    and ln is monotone) but never materializes exp(log_weight), which
    overflows doubles once a long target-like document's log-weight
    passes ~709.  ``u = (uint32(md5(id)[:8]) + 0.5) / 2^32`` lies in
    the OPEN interval (0, 1) so both logs stay finite -- the half-up
    offset variant of ``weighted_sample``'s content-addressed uniform.

    The key is computed from the 1e-6-rounded log_weight and itself
    rounded to 1e-8 so the oracle's libm and summation-order ulps
    cannot flip the top-k boundary.  Every document participates
    (a token-less doc has log_weight 0 => weight 1), matching the
    paper's resampling over the full raw corpus.  Scale shape:
    ``dsir_weights``' bounded collects + one stateless key expression
    + TakeOrderedAndProject -- per-partition heaps, no global sort.
    """
    w = dsir_weights(docs, target, n_buckets, id_col, text_col)
    u = (
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
        ).cast("double")
        + 0.5
    ) / F.lit(4294967296.0)
    key = F.round(F.log(-F.log(u)) - F.round("log_weight", 6), 8)
    return (
        w.select(
            id_col,
            "n_tokens",
            F.round("log_weight", 6).alias("log_weight"),
            key.alias("sample_key"),
        )
        .orderBy("sample_key", id_col)
        .limit(k)
    )


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    splits: tuple[tuple[str, int], ...] = DEFAULT_SPLITS,
) -> DataFrame:
    """Near-dup-aware train/val/test split: every member of a near-dup
    CLUSTER receives the split of its cluster representative (the
    connected-component min id), so paraphrases and copies never
    straddle train and eval -- the classic benchmark-leakage bug
    (Lee et al. 2022; Dodge et al. 2021 document the same
    contamination in C4).  ``pairs`` is any near-dup pair frame with
    (id_a, id_b) -- n-gram Jaccard, MinHash, SimHash, or semantic
    pairs all fit.  Singleton docs hash on their own id, so the
    output is identical to ``split_label`` wherever no duplication
    exists.  Returns (id, rep_id, split) for every input doc.

    Scale shape: components run on the pair list only
    (pointer-jumping); the split is then one content-addressed hash
    expression on the representative -- no extra corpus shuffle
    beyond the left join onto the component table.
    """
    from .dedup import connected_components

    comp = connected_components(pairs.select("id_a", "id_b"))
    joined = docs.join(comp, docs[id_col] == comp["node"], "left")
    rep = F.coalesce(comp["component"], docs[id_col])
    return joined.select(
        docs[id_col],
        rep.alias("rep_id"),
        split_label(rep, splits).alias("split"),
    )


def semantic_contaminated_docs(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.85,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Embedding-space benchmark decontamination: corpus documents
    whose feature-hashing embedding (``text.hash_embedding``) has
    cosine >= ``threshold`` with ANY benchmark document -- the
    paraphrase-robust complement of ``contaminated_docs`` (verbatim
    8-gram overlap misses a reworded eval question; embedding cosine
    does not).  Returns (id, bench_id, cos_sim) with the best-matching
    benchmark doc (ties to the lower bench id).

    Scale shape: eval sets are small by nature, so the benchmark
    embedding matrix rides in an Arrow-UDF closure (n_bench x dim
    float64) and the corpus side is ONE shuffle-free vectorized pass
    -- no join at all.  Hash embeddings are integer-valued, so the
    numpy matmul is exact and the DuckDB oracle's sequential sums
    reproduce it bit-for-bit.
    """
    import numpy as np
    import pandas as pd

    from .text import hash_embedding

    emb_c = hash_embedding(corpus, dim=dim, id_col=id_col, text_col=text_col)
    emb_b = hash_embedding(benchmark, dim=dim, id_col=id_col, text_col=text_col)
    bench_rows = sorted(
        ((int(r[id_col]), list(r["embedding"])) for r in emb_b.collect()),
        key=lambda t: t[0],
    )
    if not bench_rows:
        raise ValueError("benchmark set produced no non-empty embeddings")
    bench_ids = np.asarray([i for i, _ in bench_rows], dtype="int64")
    B = np.asarray([v for _, v in bench_rows], dtype="float64")
    Bn = np.linalg.norm(B, axis=1)

    def best_match(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.vstack(pdf["embedding"].to_numpy()).astype("float64")
            S = (M @ B.T) / np.outer(np.linalg.norm(M, axis=1), Bn)
            idx = S.argmax(axis=1)  # first max = lowest bench id (sorted)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "bench_id": bench_ids[idx],
                    "cos_sim": S[np.arange(len(idx)), idx],
                }
            )

    return emb_c.mapInPandas(
        best_match, schema=f"{id_col} long, bench_id long, cos_sim double"
    ).where(F.col("cos_sim") >= threshold)


def length_buckets(
    docs: DataFrame,
    n_buckets: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Length-grouped batching report -- the padding-efficiency
    planner for training-batch assembly (dynamic batching groups
    similar-length sequences so a batch's pad-to-max waste is small;
    this is the report that sizes those groups): documents are
    assigned to ``n_buckets`` length buckets by exact token-count
    percentile boundaries, and each bucket reports its doc count,
    token range, and ``pad_efficiency = sum_tokens / (n_docs *
    max_tokens)`` -- the fraction of a pad-to-max batch that is real
    content (1.0 = no padding waste).

    Deliberately NOT a global ``ntile`` (a corpus-global sort through
    one partition): boundaries come from one percentile aggregate
    (1-row broadcast, the scalar-subquery pattern), assignment is an
    in-row comparison count, and the report is one bucket-keyed agg
    -- every stage scales.  Ties sit below their boundary (strict >),
    so bucket membership is deterministic if not exactly equal-count.
    """
    from .text import token_count

    qs = [i / n_buckets for i in range(1, n_buckets)]
    ntok = token_count(F.col(text_col))
    bounds = docs.agg(
        F.percentile(ntok, F.lit(qs)).alias("bounds")
    )
    assigned = (
        docs.select(ntok.alias("ntok"))
        .crossJoin(F.broadcast(bounds))
        .select(
            "ntok",
            F.size(
                F.filter(F.col("bounds"), lambda b: F.col("ntok") > b)
            ).cast("long").alias("bucket"),
        )
    )
    return (
        assigned.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("ntok").alias("min_tokens"),
            F.max("ntok").alias("max_tokens"),
            F.sum("ntok").cast("long").alias("sum_tokens"),
            F.round(
                F.sum("ntok") / (F.count(F.lit(1)) * F.max("ntok")), 6
            ).alias("pad_efficiency"),
        )
    )


def decontaminate_spans(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SPAN-level benchmark decontamination: instead of dropping every
    document that shares an n-gram with the eval set (the
    ``contaminated_docs`` policy -- wasteful when the overlap is one
    quoted sentence inside a long clean document), excise exactly the
    tokens covered by a benchmark-matching n-gram and keep the rest --
    the surgical eval-hygiene pass (the "remove the contaminated span,
    keep the page" policy of LM eval-decontamination pipelines).

    Plan: positional n-grams explode to (doc, start_pos, gram) rows --
    ALL occurrences, not the distinct set, because excision needs
    positions -- a broadcast equi-join against the benchmark's distinct
    gram set yields matched start positions, one per-doc collect_set
    pulls them back into the row, and the excision itself is an in-row
    indexed ``filter`` (token i survives unless some matched start m
    covers it: m <= i <= m+n-1).  Cost: one corpus shingle pass + one
    vocabulary-keyed broadcast join + one per-doc agg; clean documents
    flow through the LEFT join untouched.

    Returns (id_col, clean_text, n_tokens, n_removed).
    """
    from .dedup import word_shingles_all
    from .text import tokens

    grams = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(word_shingles_all(F.col(text_col), n)).alias("p", "g"),
    )
    bench = (
        benchmark.select(
            F.explode(word_shingles_all(F.col(text_col), n)).alias("g")
        )
        .distinct()
    )
    matched = (
        grams.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("p")).alias("ms"))
    )
    base = corpus.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("__toks")
    )
    ms = F.coalesce(F.col("ms"), F.array().cast("array<int>"))
    kept = F.filter(
        F.col("__toks"),
        lambda t, i: ~F.exists(ms, lambda m: (i >= m) & (i <= m + F.lit(n - 1))),
    )
    return (
        base.join(matched, "doc_id", "left")
        .select(
            F.col("doc_id").alias(id_col),
            F.concat_ws(" ", kept).alias("clean_text"),
            F.size("__toks").cast("long").alias("n_tokens"),
            (F.size("__toks") - F.size(kept)).cast("long").alias("n_removed"),
        )
    )


def shard_assignment(
    docs: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic output sharding -- the write-path planner for a
    materialized training corpus: every document is assigned to one of
    ``n_shards`` output shards by a stateless content-id hash, and the
    per-shard report carries the balance evidence (doc count, token
    count, each shard's share of corpus tokens, and its deviation from
    the ideal ``1/n_shards``).

    The hash is ``split_bucket`` (md5 prefix), so shard membership is
    (a) reproducible across runs and partitionings, (b) independent of
    what else is in the corpus -- appending new docs never moves an
    existing doc's shard -- and (c) uniform, so token skew stays near
    the per-doc-length variance floor rather than any key skew.

    Scale shape: assignment is a per-row expression (no shuffle); the
    report is one shard-keyed aggregate (map-side partials, ``n_shards``
    reduce rows); shares come from a 1-row totals broadcast (the
    scalar-subquery pattern).  The production write is
    ``docs.repartition(n_shards, shard_col).write...`` -- one shuffle
    whose reduce side IS the output file layout, so no post-hoc
    compaction pass is needed.
    """
    from .text import token_count

    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    per_doc = docs.select(
        split_bucket(F.col(id_col), n_shards).alias("shard"),
        token_count(F.col(text_col)).alias("__ntok"),
    )
    # n_shards-row report feeds two consumers (totals + shares) --
    # cache it so the corpus scan underneath runs once.
    per_shard = _SCRATCH.cache(
        per_doc.groupBy("shard").agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__ntok").cast("long").alias("n_tokens"),
        )
    )
    totals = per_shard.agg(F.sum("n_tokens").alias("__tot"))
    return per_shard.crossJoin(F.broadcast(totals)).select(
        "shard",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens") / F.col("__tot"), 6).alias("token_frac"),
        F.round(
            F.col("n_tokens") / F.col("__tot") - 1.0 / n_shards, 6
        ).alias("balance_dev"),
    )


def quality_threshold_sweep(
    docs: DataFrame,
    score: Column,
    thresholds: tuple[float, ...],
    text_col: str = "text",
) -> DataFrame:
    """Filter operating-point sweep in ONE corpus pass: for every
    candidate quality threshold, how many documents and tokens a
    ``score >= threshold`` gate would keep, as counts and corpus
    fractions -- the table a curation run reads to pick its cutoff
    (the kept-token budget is usually the binding constraint, not the
    doc count).

    NOT one filtered aggregate per threshold (that is ``len(
    thresholds)`` corpus scans) and NOT a doc x grid join (that
    shuffles ``|docs| * |grid|`` rows).  Each doc computes, in-row,
    how many of the ascending thresholds it passes (``idx``); one
    ``idx``-keyed aggregate collapses the corpus to at most
    ``len(thresholds)+1`` rows; the survivor-of-threshold-``i`` total
    is then the suffix sum ``idx >= i``, taken by exploding each tiny
    bucket row to the thresholds it satisfies -- equi-keyed end to
    end, so the only shuffle after the map-side partials moves a
    handful of rows.  Thresholds nobody passes still report (kept=0)
    via the right join against the grid.
    """
    from .text import token_count

    if not thresholds:
        raise ValueError("thresholds must be non-empty")
    ths = sorted(thresholds)
    spark = docs.sparkSession
    grid = spark.createDataFrame(
        [(i + 1, float(t)) for i, t in enumerate(ths)], "ti int, threshold double"
    )
    # thresholds-passed index as a SUM OF WHENS, not a higher-order
    # array filter: the score column appears once per threshold, and
    # codegen's subexpression elimination evaluates it ONCE per row --
    # a lambda referencing the score would re-evaluate the (regexp +
    # tokenize)-heavy expression per array element (measured at
    # sf0.1: 2.1s -> 1.8s min-of-2).
    idx = None
    for t in ths:
        term = F.when(score >= F.lit(float(t)), 1).otherwise(0)
        idx = term if idx is None else idx + term
    per_doc = docs.select(
        idx.alias("idx"),
        token_count(F.col(text_col)).alias("__ntok"),
    )
    # The tiny bucket table feeds TWO consumers (totals + suffix
    # sums); cache it so the corpus scan underneath runs once, not
    # once per consumer (same contract as the mixture-weight scratch).
    buckets = _SCRATCH.cache(
        per_doc.groupBy("idx").agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__ntok").cast("long").alias("n_tokens"),
        )
    )
    totals = buckets.agg(
        F.sum("n_docs").alias("__docs"), F.sum("n_tokens").alias("__toks")
    )
    kept = (
        buckets.where(F.col("idx") >= 1)
        .select(F.explode(F.sequence(F.lit(1), F.col("idx"))).alias("ti"),
                "n_docs", "n_tokens")
        .groupBy("ti")
        .agg(
            F.sum("n_docs").cast("long").alias("kept_docs"),
            F.sum("n_tokens").cast("long").alias("kept_tokens"),
        )
    )
    return (
        grid.join(kept, "ti", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "threshold",
            F.coalesce("kept_docs", F.lit(0)).cast("long").alias("kept_docs"),
            F.coalesce("kept_tokens", F.lit(0)).cast("long").alias("kept_tokens"),
            F.round(
                F.coalesce("kept_docs", F.lit(0)) / F.col("__docs"), 6
            ).alias("doc_frac"),
            F.round(
                F.coalesce("kept_tokens", F.lit(0)) / F.col("__toks"), 6
            ).alias("token_frac"),
        )
    )


def epoch_upsample(
    docs: DataFrame,
    epochs: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize a domain-mixture as per-document repetition --
    fractional epochs per source (the 'how many times does each
    domain repeat in the training mix' knob; mixture weights that
    exceed a domain's natural share become epochs > 1): every doc
    gets ``floor(e)`` guaranteed copies plus one more for a
    deterministic ``frac(e)`` hash-slice of the domain, so the
    REALIZED token count per source is exactly ``e`` epochs in
    expectation and reproducible run-to-run (no RNG -- the extra-copy
    membership is the doc's own md5 slice, stable under appends, and
    the fraction is held to 1e-4 by the 10k-bucket hash space).

    Scale shape: the epochs table is a tiny broadcast equi-join on
    source; copy fan-out is an in-row ``explode(sequence(...))`` --
    map-side only, no shuffle at all; rows with ``n_copies = 0``
    (epochs < 1 outside the hash slice) vanish in the same pass.
    Output carries ``copy_idx`` so downstream shuffles (the global
    example shuffle before sequence packing) can key on
    ``(doc, copy)`` and spread repeats across shards.

    Repetition-as-mixture per Muennighoff et al. 2023 (Scaling
    Data-Constrained Language Models): up-weighting a domain past its
    natural share IS repeating it; fractional epochs keep the realized
    token counts exactly on the mixture.
    """
    if not epochs or any(e < 0 for e in epochs.values()):
        raise ValueError("epochs must be a non-empty map of source -> e >= 0")
    spark = docs.sparkSession
    edf = spark.createDataFrame(
        [(s, float(e)) for s, e in sorted(epochs.items())],
        f"{source_col} string, __epochs double",
    )
    frac_bucket = split_bucket(F.col(id_col), 10_000)
    n_copies = (
        F.floor("__epochs")
        + F.when(
            frac_bucket
            < F.round((F.col("__epochs") % 1.0) * 10_000).cast("long"),
            1,
        ).otherwise(0)
    ).cast("long")
    return (
        docs.join(F.broadcast(edf), source_col)
        .select(
            F.col(id_col),
            F.col(source_col),
            F.col("__epochs").alias("epochs"),
            n_copies.alias("n_copies"),
        )
        .where(F.col("n_copies") >= 1)
        .select(
            id_col,
            source_col,
            "epochs",
            F.explode(F.sequence(F.lit(1).cast("long"), F.col("n_copies"))).alias(
                "copy_idx"
            ),
        )
    )
