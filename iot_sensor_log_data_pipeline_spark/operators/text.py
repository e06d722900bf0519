"""Text-analysis operators for the LLM-data-pipeline surface
(BASELINE.json north star: "text analysis" over ``documents``).

Everything here is a pure Column/DataFrame expression built from
JVM-side functions -- no Python UDFs -- so the operators run inside
whole-stage codegen and scale linearly with input (no shuffle except
where aggregation is explicit).

Cross-engine discipline: each expression has an exact DuckDB
counterpart (see ``plans/text_queries.py``), so regex character
classes are kept to RE2/Java-common subsets.

Input contract: ``alpha_ratio``/``space_ratio`` divide by
``length(text)`` -- empty-string documents should be filtered before
the stats battery (ANSI mode raises on the division) -- while the
token-based ratios guard with ``greatest(n, 1)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ._scratch_cache import ScratchCaches

#: Scratch cache (lifetime contract in ``_scratch_cache``): holds the
#: unigram vocabulary / bigram table, each feeding two consumers.
_SCRATCH = ScratchCaches()


def release_caches() -> None:
    """Unpersist scratch cached by earlier ``unigram_logprob`` /
    ``bigram_logprob`` / ``kneser_ney_logprob`` / ``bm25_prf_rank``
    calls."""
    _SCRATCH.release()

#: Minimal per-language stopword anchors for the n-gram/stopword
#: language-ID heuristic.  Deliberately tiny and deterministic -- the
#: operator's value is its *shape* (per-language token-hit scoring);
#: swap in real wordlists for production.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "y", "que", "en", "los"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit"),
    "fr": ("le", "la", "les", "et", "de", "est", "dans"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2", "you3", "wo3"),
}

STOPWORDS: tuple[str, ...] = LANG_MARKERS["en"]


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (split on 1+ spaces, drop empties)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(col, " +"), lambda t: t != "")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("long")


def distinct_token_count(text: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(text))).cast("long")


def bpe_ish_token_count(text: Column | str) -> Column:
    """Sub-word-ish token count: runs of letters, runs of digits, and
    single other non-space chars -- the regex approximation of a BPE
    pre-tokenizer (pattern is RE2/Java-regex common subset)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(col, F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)).cast(
        "long"
    )


def alpha_ratio(text: Column | str) -> Column:
    """Fraction of characters that are a-z (ASCII letters)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.length(F.regexp_replace(col, "[^a-z]", "")) / F.length(col)


def space_ratio(text: Column | str) -> Column:
    col = F.col(text) if isinstance(text, str) else text
    return F.length(F.regexp_replace(col, "[^ ]", "")) / F.length(col)


def stopword_ratio(text: Column | str) -> Column:
    """Fraction of tokens that are (English) stopwords."""
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def mean_token_length(text: Column | str) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double")
    )
    return total / F.greatest(F.size(toks), F.lit(1))


#: Gopher-rule thresholds (Rae et al. 2021, "Scaling Language Models:
#: Methods, Analysis & Insights from Training Gopher", §A1.1 quality
#: filtering), with the token-count floor and stopword floor scaled to
#: this synthetic corpus's range (docs are 10-99 tokens; the paper's
#: 50-token floor over web pages would reject half the corpus for
#: length alone and hide the other rules' behavior).  The line-shape
#: rules (bullet-start / ellipsis-end fractions) are omitted: corpus
#: documents are single-line synthetic prose with no newlines.
GOPHER_MIN_TOKENS = 20
GOPHER_MAX_TOKENS = 10_000
GOPHER_MIN_MEAN_TOK_LEN = 3.0
GOPHER_MAX_MEAN_TOK_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_TOKEN_FRAC = 0.8
GOPHER_MIN_STOPWORD_HITS = 2


def alpha_token_frac(text: Column | str) -> Column:
    """Fraction of tokens containing at least one ASCII letter (the
    Gopher '80% of words contain an alphabetic character' rule)."""
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    return hits / F.greatest(F.size(toks), F.lit(1))


def stopword_hits(text: Column | str) -> Column:
    """Total (non-distinct) stopword occurrences -- Gopher requires at
    least 2 of its stop list to appear; machine-generated keyword soup
    rarely does."""
    return F.size(F.filter(tokens(text), lambda t: t.isin(*STOPWORDS))).cast("long")


def gopher_keep(text: Column | str) -> Column:
    """The conjunction of the Gopher quality rules above: token-count
    window, mean-token-length window, symbol-ratio cap, alphabetic-
    token floor, stopword floor.  Pure column expressions -- the
    classic LLM-corpus gate runs entirely in whole-stage codegen."""
    from .curation import symbol_ratio

    n = token_count(text)
    mtl = mean_token_length(text)
    return (
        (n >= GOPHER_MIN_TOKENS)
        & (n <= GOPHER_MAX_TOKENS)
        & (mtl >= GOPHER_MIN_MEAN_TOK_LEN)
        & (mtl <= GOPHER_MAX_MEAN_TOK_LEN)
        & (symbol_ratio(text) <= GOPHER_MAX_SYMBOL_RATIO)
        & (alpha_token_frac(text) >= GOPHER_MIN_ALPHA_TOKEN_FRAC)
        & (stopword_hits(text) >= GOPHER_MIN_STOPWORD_HITS)
    )


def quality_score(text: Column | str) -> Column:
    """Deterministic [0,1] quality heuristic: rewards alphabetic
    content, plausible token length (2..12 chars), and some lexical
    diversity.  A linear blend so the oracle SQL is expressible."""
    diversity = distinct_token_count(text) / F.greatest(token_count(text), F.lit(1))
    len_ok = F.when(mean_token_length(text).between(2.0, 12.0), F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    return 0.5 * alpha_ratio(text) + 0.3 * diversity + 0.2 * len_ok


def _marker_hits(toks: Column, markers: tuple[str, ...]) -> Column:
    # NB: a plain closure, not a defaulted lambda arg -- PySpark infers
    # higher-order-function arity from the lambda signature, so
    # ``lambda t, m=markers:`` would be called as a two-arg (value,
    # index) lambda.
    return F.size(F.filter(toks, lambda t: t.isin(*markers))).cast("long")


def language_scores(text: Column | str) -> dict[str, Column]:
    """Per-language marker-hit counts (the language-ID signal)."""
    toks = tokens(text)
    return {
        lang: _marker_hits(toks, markers) for lang, markers in LANG_MARKERS.items()
    }


def predicted_language(text: Column | str, default: str = "und") -> Column:
    """argmax over language marker scores; ``und`` (undetermined) when
    no marker hits.  Deterministic tie-break: language name order."""
    scores = language_scores(text)
    pairs = F.array(
        *[
            F.struct(scores[lang].alias("score"), F.lit(lang).alias("lang"))
            for lang in sorted(scores)
        ]
    )
    best = F.array_max(F.filter(pairs, lambda p: p.getField("score") > 0))
    return F.coalesce(best.getField("lang"), F.lit(default))


def fingerprint(text: Column | str) -> Column:
    """Canonical document fingerprint: md5 over the sorted distinct
    token set -- robust to token order and repetition (the standard
    'fingerprint clustering' key)."""
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(text))))
    return F.md5(canon.cast("binary"))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full stats battery as columns (one projection pass)."""
    t = F.col(text_col)
    return df.select(
        "*",
        token_count(t).alias("n_tokens"),
        distinct_token_count(t).alias("n_distinct_tokens"),
        bpe_ish_token_count(t).alias("n_bpe_tokens"),
        F.round(alpha_ratio(t), 6).alias("alpha_ratio"),
        F.round(stopword_ratio(t), 6).alias("stopword_ratio"),
        F.round(mean_token_length(t), 6).alias("mean_token_len"),
        F.round(quality_score(t), 6).alias("quality"),
        predicted_language(t).alias("pred_lang"),
        fingerprint(t).alias("fingerprint"),
    )


def term_frequency(text: Column | str, term: str) -> Column:
    """Occurrences of one exact token in the whitespace token list."""
    return F.size(F.filter(tokens(text), lambda t: t == F.lit(term))).cast("long")


#: PII rules as (name, pattern, replacement-tag).  Patterns stay in the
#: RE2/Java-regex common subset (no lookaround, no backrefs) so the
#: DuckDB oracle applies the literally identical regex; conservative by
#: design -- a curation pass prefers false negatives over mangling
#: clean text.  Order matters and is the application order: emails
#: before ipv4 so an address's dotted domain can't half-match as an IP.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "\\+[0-9][0-9 -]{7,13}[0-9]", "<PHONE>"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
)


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-rule match counts (before redaction)."""
    col = F.col(text) if isinstance(text, str) else text
    return {
        name: F.size(F.regexp_extract_all(col, F.lit(pat), 0)).cast("long")
        for name, pat, _ in PII_RULES
    }


def redact_pii(text: Column | str) -> Column:
    """Replace every PII match with its type tag, rules applied in
    ``PII_RULES`` order.  Pure JVM regexp_replace chain -- codegen'd,
    one scan pass, no shuffle; the standard pre-training redaction
    stage (emails/phones/IPs -> typed placeholders)."""
    col = F.col(text) if isinstance(text, str) else text
    for _, pat, tag in PII_RULES:
        col = F.regexp_replace(col, pat, tag)
    return col


def unigram_logprob(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram distribution -- the self-contained stand-in for LM-based
    quality filtering (CCNet-style perplexity scoring): documents made
    of globally rare tokens score low.

    Scale shape: token explode -> vocab count (one term-keyed shuffle,
    map-side combined) -> total-token scalar (1-row broadcast, the
    scalar-subquery BNLJ shape) -> term-keyed join back -> per-doc avg
    (doc-keyed shuffle).  Everything is linear in token count; the
    vocabulary table is the only reused intermediate.
    """
    tok = docs.select(id_col, F.explode(tokens(text_col)).alias("term"))
    # Cached: the vocabulary feeds both the total-token scalar and the
    # per-token join -- without the cache each consumer re-runs the
    # term-keyed aggregation (two identical wide shuffles in the plan).
    vocab = _SCRATCH.cache(
        tok.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("term_n"))
    )
    total = vocab.agg(F.sum("term_n").alias("total_n"))
    return (
        tok.join(vocab, "term")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(
                F.avg(F.log(F.col("term_n") / F.col("total_n"))), 6
            ).alias("avg_logprob"),
        )
    )


def ccnet_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet-style per-language quality buckets (Wenzek et al., LREC
    2020, "CCNet: Extracting High Quality Monolingual Datasets from
    Web Crawl Data", arXiv:1911.00359): within each language, order
    documents by LM score and split them into equal-count buckets --
    the paper's head / middle / tail thirds, the standard first gate
    of a web-crawl curation pipeline (keep head, sample middle, drop
    tail).

    The LM is the engine's self-contained ``unigram_logprob`` (higher
    mean log-probability = lower perplexity = better), standing in for
    the paper's KenLM exactly as ``text_unigram_logprob`` documents.
    Bucketing uses the 1e-6-ROUNDED score with an id tiebreak so the
    bucket boundary is replayable across engines.  Token-less
    documents have no LM score and are excluded (CCNet scores
    extracted text, not empties).

    Scale shape: the unigram-LM aggs plus ONE ntile window per
    language partition -- a per-language sort, the same shape as any
    per-group ranking; no corpus-global sort.  Returns (id, lang,
    n_tokens, avg_logprob, bucket) with bucket in head/middle/tail
    (or 'b1'..'bN' for other ``n_buckets``).
    """
    from pyspark.sql.window import Window

    scored = unigram_logprob(docs, id_col=id_col, text_col=text_col)
    joined = docs.select(id_col, lang_col).join(scored, id_col)
    w = Window.partitionBy(lang_col).orderBy(
        F.desc("avg_logprob"), F.col(id_col)
    )
    tile = F.ntile(n_buckets).over(w)
    if n_buckets == 3:
        bucket = (
            F.when(tile == 1, "head").when(tile == 2, "middle").otherwise("tail")
        )
    else:
        bucket = F.concat(F.lit("b"), tile.cast("string"))
    return joined.select(
        id_col, lang_col, "n_tokens", "avg_logprob", bucket.alias("bucket")
    )


def ngram_novelty(
    docs: DataFrame,
    reference: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fraction of each document's DISTINCT word n-grams that never
    occur in ``reference`` -- the n-gram novelty signal used to audit
    synthetic / generated corpora against their source data (the
    corpus-level complement of memorization checks: novelty 0 means
    every n-gram is copied, 1 means nothing overlaps; cf. the n-gram
    overlap audits in Lee et al. 2022 and self-BLEU-style diversity
    reports).

    Scale shape: in-row distinct shingling on both sides (no shuffle),
    the reference vocabulary deduped by one gram-keyed agg, then a
    LEFT JOIN of doc grams to the vocabulary on the gram string and a
    per-doc count of misses -- two content-keyed shuffles, linear in
    gram count, no pairwise anything.  Docs with fewer than ``n``
    tokens report 0 grams and novelty 0.0 (nothing to be novel).
    Returns (id, n_grams, n_novel, novelty) for EVERY input doc.
    """
    from .dedup import word_shingles

    grams = docs.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("gram"),
    )
    ref_vocab = reference.select(
        F.explode(word_shingles(F.col(text_col), n)).alias("gram")
    ).distinct()
    per_doc = (
        grams.join(
            ref_vocab.withColumn("__seen", F.lit(1)), "gram", "left"
        )
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(
                F.when(F.col("__seen").isNull(), 1).otherwise(0)
            ).cast("long").alias("n_novel"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_grams", F.lit(0).cast("long")).alias("n_grams"),
            F.coalesce("n_novel", F.lit(0).cast("long")).alias("n_novel"),
            F.round(
                F.when(
                    F.coalesce("n_grams", F.lit(0)) > 0,
                    F.coalesce("n_novel", F.lit(0))
                    / F.coalesce("n_grams", F.lit(1)).cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("novelty"),
        )
    )


def nb_quality_model(
    train: DataFrame,
    label_col: str = "is_positive",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Train the multinomial-Naive-Bayes quality classifier used as the
    model-based quality filter of the GPT-3 / LLaMA pipelines (Brown et
    al. 2020 appendix A; Touvron et al. 2023 train a linear classifier
    on Wikipedia-referenced vs raw CommonCrawl pages -- this is that
    component with NB weights, which keeps training a pure aggregation).

    ``train`` carries a boolean ``label_col`` (True = curated /
    high-quality exemplar, False = raw-crawl exemplar).  Returns
    ``(model, stats)``:

    - ``model``: one row per vocabulary term with ``log_ratio`` =
      ln P(term | pos) - ln P(term | neg) under add-1 smoothing over
      the shared vocabulary (Laplace; V = |vocab|).
    - ``stats``: ONE row with the document-count prior
      ``log_prior = ln(n_pos_docs / n_neg_docs)`` and the out-of-vocab
      constant ``oov_log_ratio = ln((total_neg + V) / (total_pos + V))``
      (the smoothed ratio of a term never seen in either class), for
      scoring corpora that extend beyond the training vocabulary.

    Scale shape: one term-keyed hash agg (map-side combined) over the
    exploded token stream, one 1-row reduction for totals, one 1-row
    doc-count agg -- training is linear in token count and the model
    table is vocabulary-sized (never collected).
    """
    tok = train.select(
        F.col(label_col).cast("boolean").alias("__pos"),
        F.explode(tokens(text_col)).alias("term"),
    )
    # Cached: the term-count table feeds totals AND the per-term model
    # -- without the cache each consumer re-runs the train scan and the
    # term-keyed shuffle (visible as duplicate Exchanges in the plan).
    counts = _SCRATCH.cache(
        tok.groupBy("term").agg(
            F.sum(F.when(F.col("__pos"), 1).otherwise(0))
            .cast("double")
            .alias("pos_n"),
            F.sum(F.when(F.col("__pos"), 0).otherwise(1))
            .cast("double")
            .alias("neg_n"),
        )
    )
    totals = counts.agg(
        F.sum("pos_n").alias("total_pos"),
        F.sum("neg_n").alias("total_neg"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    model = counts.crossJoin(F.broadcast(totals)).select(
        "term",
        (
            F.log((F.col("pos_n") + 1.0) / (F.col("total_pos") + F.col("v")))
            - F.log((F.col("neg_n") + 1.0) / (F.col("total_neg") + F.col("v")))
        ).alias("log_ratio"),
    )
    priors = train.agg(
        F.sum(F.when(F.col(label_col), 1).otherwise(0))
        .cast("double")
        .alias("n_pos_docs"),
        F.sum(F.when(F.col(label_col), 0).otherwise(1))
        .cast("double")
        .alias("n_neg_docs"),
    )
    stats = (
        totals.crossJoin(priors)
        .select(
            F.log(F.col("n_pos_docs") / F.col("n_neg_docs")).alias("log_prior"),
            F.log(
                (F.col("total_neg") + F.col("v")) / (F.col("total_pos") + F.col("v"))
            ).alias("oov_log_ratio"),
        )
    )
    return model, stats


def nb_quality_scores(
    docs: DataFrame,
    model: DataFrame,
    stats: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents with a trained ``nb_quality_model``: per-doc
    Naive-Bayes logit = log-prior + sum over tokens of the term
    log-ratio (out-of-vocabulary tokens contribute the smoothed
    ``oov_log_ratio`` constant).  Positive logit = classified curated;
    the GPT-3 pipeline thresholds this score (there, via a Pareto
    draw) to keep high-quality crawl pages.

    Returns ``(id, n_tokens, nb_logit, keep)`` for EVERY input doc;
    token-less docs carry the prior alone.  ``keep`` compares the
    1e-6-ROUNDED logit to 0 so the decision replays bit-identically
    across engines.

    Scale shape: token explode -> term-keyed LEFT join to the
    vocabulary-sized model -> per-doc sum (doc-keyed shuffle) -> left
    join back to the doc list; linear in token count, the 1-row
    ``stats`` broadcast is the only scalar."""
    tok = docs.select(F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("term"))
    per_doc = (
        tok.join(model, "term", "left")
        .crossJoin(F.broadcast(stats))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.coalesce("log_ratio", "oov_log_ratio")).alias("token_sum"),
        )
    )
    logit = F.round(
        F.col("log_prior") + F.coalesce("token_sum", F.lit(0.0)), 6
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
            logit.alias("nb_logit"),
            (logit > 0.0).alias("keep"),
        )
    )


def bm25_rank(
    docs: DataFrame,
    query_terms: tuple[str, ...],
    *,
    k: int = 15,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 ranked retrieval of ``docs`` against a bag of query terms
    (Robertson/Sparck-Jones idf with the +1 smoothing used by Lucene).

    Scale shape: for a FIXED small query-term set the classic
    explode->posting-list plan is overkill -- per-term frequencies are
    computed as plain column expressions in ONE codegen'd scan pass
    (no explode, no per-term shuffle), the corpus-level statistics
    (N, avgdl, per-term document frequency) reduce to a single 1-row
    aggregate that is broadcast back, and the final top-k is a
    TakeOrderedAndProject (no global sort).  Total cost: one scan +
    one scalar agg + one scan-side score projection, independent of
    vocabulary size.
    """
    base, stats = _bm25_base_stats(
        docs, query_terms, id_col=id_col, text_col=text_col
    )
    return _bm25_rank_tail(
        base, stats, len(query_terms), k=k, k1=k1, b=b, id_col=id_col
    )


def _bm25_base_stats(
    docs: DataFrame,
    query_terms: tuple[str, ...],
    *,
    id_col: str,
    text_col: str,
) -> tuple[DataFrame, DataFrame]:
    """(per-doc tf/dl projection, 1-row corpus stats) -- the two halves
    of ``bm25_rank``'s single-scan plan, split out so ``bm25_prf_rank``
    can CACHE the stats row and reuse N/avgdl for the re-score instead
    of paying a third corpus tokenize pass for the same two numbers."""
    t = F.col(text_col)
    base = docs.select(
        id_col,
        token_count(t).alias("__dl"),
        *[term_frequency(t, term).alias(f"__tf_{i}") for i, term in enumerate(query_terms)],
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.avg("__dl").alias("__avgdl"),
        *[
            F.sum((F.col(f"__tf_{i}") > 0).cast("long")).cast("double").alias(f"__df_{i}")
            for i in range(len(query_terms))
        ],
    )
    return base, stats


def _bm25_rank_tail(
    base: DataFrame,
    stats: DataFrame,
    n_terms: int,
    *,
    k: int,
    k1: float,
    b: float,
    id_col: str,
) -> DataFrame:
    """The scoring tail of ``bm25_rank`` over a prepared (base, stats)
    pair: 1-row stats broadcast, term-order score fold, positive
    filter, TakeOrdered top-k."""
    # Plans as BroadcastNestedLoopJoin with a 1-row build side -- the
    # scalar-subquery shape, allowlisted in tests/test_plans.py.
    scored = base.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    for i in range(n_terms):
        tf = F.col(f"__tf_{i}").cast("double")
        idf = F.log(
            1.0
            + (F.col("__n") - F.col(f"__df_{i}") + 0.5) / (F.col(f"__df_{i}") + 0.5)
        )
        score = score + idf * (
            tf
            * (k1 + 1.0)
            / (tf + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl")))
        )
    return (
        scored.select(id_col, F.round(score, 6).alias("bm25"))
        .where(F.col("bm25") > 0)
        .orderBy(F.desc("bm25"), id_col)
        .limit(k)
    )


def bm25_prf_rank(
    docs: DataFrame,
    query_terms: tuple[str, ...],
    *,
    fb_k: int = 5,
    n_expand: int = 5,
    alpha: float = 0.5,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 with RM3 pseudo-relevance feedback (Lavrenko & Croft 2001;
    Abdul-Jaleel et al., TREC 2004) -- the classic query-expansion
    loop: rank once with the original terms, treat the top-``fb_k``
    docs as pseudo-relevant, estimate a relevance model
    P(w|R) = sum_d w_d * tf(w,d)/|d| (w_d = the doc's normalized
    stage-1 score), take the top-``n_expand`` new terms, and re-score
    the corpus with the interpolated weighted query
    (alpha spread over the originals, 1-alpha over the expansion
    terms by normalized P(w|R)) -- so documents matching the TOPIC of
    the top results rank even when they miss the literal query words.

    Determinism/oracle discipline: stage-1 weights reuse
    ``bm25_rank``'s ROUNDED scores (both engines rank from identical
    doubles), P(w|R) and the term weights round to 9 decimals before
    any selection or arithmetic that feeds ranking, and the final
    weighted score rounds to 6 -- every sum crossing an engine
    boundary is over <= fb_k or <= n_expand addends.

    Scale shape: stage 1 is ``bm25_rank``'s single codegen'd scan;
    the relevance model touches only the ``fb_k`` feedback docs; the
    re-score is one token explode pruned AT THE SCAN by the broadcast
    (<= len(query_terms) + n_expand)-row query model, per-(doc, term)
    map-combined counts, a term-keyed df agg bounded by the model
    size, and a 1-row corpus-stats broadcast -- token-linear total,
    no vocabulary-wide shuffle.

    A query whose terms match nothing yields an empty feedback set;
    the model then degrades to the alpha-weighted original query
    (expansion rows are simply absent), which scores every doc 0 --
    the same empty result plain BM25 returns.
    """
    if not query_terms:
        raise ValueError("bm25_prf_rank needs at least one query term")
    if len(set(query_terms)) != len(query_terms):
        # A duplicated term would fan out twice in the qmodel join and
        # silently double-count its tf in the re-score -- reject, same
        # contract as the other round-11 entry guards.
        raise ValueError(
            "bm25_prf_rank: query_terms contains duplicates -- each term "
            "must appear once (weights already spread alpha evenly)"
        )
    if not 0.0 <= alpha <= 1.0:
        raise ValueError("alpha must be in [0, 1] (1 = no expansion)")
    if fb_k < 1 or n_expand < 1:
        raise ValueError("fb_k and n_expand must be >= 1")
    spark = docs.sparkSession
    # Cached: fb (<= fb_k rows) feeds the token scan AND the weight
    # normalizer; expansion (<= n_expand rows) feeds the weight table
    # AND its normalizer; qmodel (<= |Q| + n_expand rows) is the
    # re-score join's build side.  Without the caches every reference
    # re-expands the stage-1 corpus scan into the plan (the macro-query
    # branch fan-out class recorded in SCALE.md) -- measured at 132
    # exchanges vs ~20 cached.
    # Stage-1 stats are CACHED (1 row) and reused as the re-score's
    # N/avgdl: they are the same two aggregates over the same corpus,
    # so recomputing them cost a whole extra tokenize pass (guide §1.2:
    # don't compute things twice before tuning anything else).
    base1, stats1 = _bm25_base_stats(
        docs, query_terms, id_col=id_col, text_col=text_col
    )
    stats1 = _SCRATCH.cache(stats1)
    fb = _SCRATCH.cache_more(_bm25_rank_tail(
        base1, stats1, len(query_terms), k=fb_k, k1=k1, b=b, id_col=id_col
    ))
    fb_docs = docs.join(fb, id_col).select(
        F.col(id_col), F.col("bm25"), tokens(text_col).alias("l")
    )
    tok = fb_docs.select(
        id_col, "bm25", F.size("l").alias("dl"), F.explode("l").alias("term")
    )
    per = tok.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf"),
        F.first("bm25").alias("bm25"),
        F.first("dl").alias("dl"),
    )
    wsum = fb.agg(F.sum("bm25").alias("ws"))
    pr = (
        per.select("term", (F.col("bm25") * F.col("tf") / F.col("dl")).alias("c"))
        .groupBy("term")
        .agg(F.sum("c").alias("num"))
        .crossJoin(F.broadcast(wsum))
        .select("term", F.round(F.col("num") / F.col("ws"), 9).alias("p_rm"))
    )
    expansion = _SCRATCH.cache_more(
        pr.where(~F.col("term").isin(*query_terms))
        .orderBy(F.desc("p_rm"), F.asc("term"))
        .limit(n_expand)
    )
    z = expansion.agg(F.sum("p_rm").alias("z"))
    exp_w = expansion.crossJoin(F.broadcast(z)).select(
        "term",
        F.round(F.lit(1.0 - alpha) * F.col("p_rm") / F.col("z"), 9).alias("w"),
    )
    orig_w = spark.createDataFrame(
        [(t, float(alpha) / len(query_terms)) for t in query_terms],
        "term string, w double",
    )
    qmodel = _SCRATCH.cache_more(orig_w.unionByName(exp_w))

    tok2 = docs.select(
        F.col(id_col), token_count(F.col(text_col)).alias("dl"),
        F.explode(tokens(text_col)).alias("term"),
    )
    tf2 = _SCRATCH.cache_more(
        tok2.join(F.broadcast(qmodel), "term")
        .groupBy(id_col, "term")
        .agg(
            F.count(F.lit(1)).cast("double").alias("tf"),
            F.first("dl").alias("dl"),
            F.first("w").alias("w"),
        )
    )
    # tf2 is cached because BOTH the df aggregate and the score probe
    # read it: uncached, the df2 branch re-expanded the whole
    # scan-pruned tokenize subtree (the branch fan-out class recorded
    # in SCALE.md) -- a second full corpus pass for a <= model-size
    # count.  The cached table is the model-pruned (doc, term) set:
    # narrow rows, spills gracefully, always cheaper to re-read than
    # to re-tokenize the text column.
    stats2 = stats1.select(
        F.col("__n").alias("n"), F.col("__avgdl").alias("avgdl")
    )
    # Per-term document frequency as a map-combined aggregate + tiny
    # broadcast join.  NOT a count-over-Window.partitionBy(term): the
    # model has <= |Q| + n_expand terms, and a common term can match
    # most of the corpus, so a term-partitioned window funnels ~N rows
    # through one task -- a scale cliff.  The agg partial-combines to
    # <= model-size rows per task; its price is that df2 re-expands
    # the (scan-pruned) tf2 subtree once more in the plan, which is a
    # second linear parallel pass, not a cliff (the branch fan-out
    # class recorded in SCALE.md).
    df2 = tf2.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.log(1.0 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    sat = (
        F.col("tf")
        * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        tf2.join(F.broadcast(df2), "term")
        .crossJoin(F.broadcast(stats2))
        .select(id_col, (F.col("w") * idf * sat).alias("s"))
        .groupBy(id_col)
        .agg(F.round(F.sum("s"), 6).alias("prf_score"))
    )
    return (
        scored.where(F.col("prf_score") > 0)
        .orderBy(F.desc("prf_score"), F.asc(id_col))
        .limit(k)
    )


def rrf_fuse(
    ranked: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k0: int = 60,
    k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009) of N
    ranked retrieval lists: score(d) = sum over lists of
    1 / (k0 + rank_d) -- THE standard hybrid-retrieval combiner
    (sparse BM25 + dense vectors) because it needs no score
    calibration across heterogeneous scorers, only ranks.  Documents
    missing from a list simply contribute nothing (union semantics);
    ``n_sources`` reports how many lists surfaced each survivor --
    the agreement signal re-rankers often gate on.

    Scale shape: inputs are top-k lists BY CONSTRUCTION (bounded rows
    however big the corpus), so the fuse is a union + one tiny hash
    agg + TakeOrdered -- the expensive work already happened inside
    each retriever.  Returns (id_col, rrf_score, n_sources), rrf
    descending, id tiebreak, top ``k``."""
    if not ranked:
        raise ValueError(
            "rrf_fuse needs at least one ranked list -- a retriever "
            "pipeline that produced no lists has nothing to fuse"
        )
    contrib = None
    for df in ranked:
        c = df.select(
            F.col(id_col),
            (
                F.lit(1.0) / (F.lit(float(k0)) + F.col(rank_col).cast("double"))
            ).alias("__c"),
        )
        contrib = c if contrib is None else contrib.unionByName(c)
    return (
        contrib.groupBy(id_col)
        .agg(
            F.round(F.sum("__c"), 6).alias("rrf_score"),
            F.count(F.lit(1)).cast("long").alias("n_sources"),
        )
        .orderBy(F.desc("rrf_score"), F.asc(id_col))
        .limit(k)
    )


def rrf_fuse_batch(
    ranked: list[DataFrame],
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k0: int = 60,
    k: int = 10,
) -> DataFrame:
    """Per-query reciprocal-rank fusion for a BATCH of queries -- the
    ``rrf_fuse`` combiner keyed by (``query_id_col``, ``id_col``):
    each input carries per-query ranked lists (the batched probes'
    output contract), contributions 1/(k0 + rank) union across
    retrievers, and the fused top-``k`` per query is one partitioned
    window.  Same union semantics (a doc missing from one list
    contributes nothing), same ``n_sources`` agreement column, same
    round-6 score contract; inputs are per-query top-k lists by
    construction, so the fuse stays bounded however many queries the
    batch carries.  Returns (query_id, id_col, rrf_score, n_sources,
    rank), rank <= k per query."""
    from pyspark.sql import Window

    if not ranked:
        raise ValueError(
            "rrf_fuse_batch needs at least one ranked list -- a retriever "
            "pipeline that produced no lists has nothing to fuse"
        )
    contrib = None
    for df in ranked:
        c = df.select(
            F.col(query_id_col).alias("query_id"),
            F.col(id_col),
            (
                F.lit(1.0) / (F.lit(float(k0)) + F.col(rank_col).cast("double"))
            ).alias("__c"),
        )
        contrib = c if contrib is None else contrib.unionByName(c)
    fused = contrib.groupBy("query_id", id_col).agg(
        F.round(F.sum("__c"), 6).alias("rrf_score"),
        F.count(F.lit(1)).cast("long").alias("n_sources"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_score"), F.asc(id_col)
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", id_col, "rrf_score", "n_sources", "rank")
    )


def tfidf_top_terms(
    docs: DataFrame,
    *,
    top_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``top_n`` terms per document by smoothed tf-idf
    (tf/doclen * (ln(N/(1+df)) + 1)), deterministic term-asc tiebreak.

    Scale shape: the one genuinely corpus-wide piece is document
    frequency, a groupBy over the distinct (doc, term) posting list --
    one explode + two shuffles keyed on term / (doc, term), both
    partial-aggregated map-side.  df is then joined back to the
    posting list (term-keyed shuffle join; a broadcast when the
    vocabulary is small) and the per-doc top-n is a bounded
    row_number window, never a global sort.
    """
    from pyspark.sql import Window

    t = F.col(text_col)
    posting = (
        docs.select(id_col, F.col(text_col), token_count(t).alias("__dl"))
        .select(id_col, "__dl", F.explode(tokens(text_col)).alias("term"))
        .groupBy(id_col, "__dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = docs.select(F.count(F.lit(1)).cast("double").alias("__n"))
    df_t = posting.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    tfidf = F.round(
        (F.col("tf") / F.col("__dl"))
        * (F.log(F.col("__n") / (1.0 + F.col("df"))) + 1.0),
        6,
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        posting.join(df_t, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(id_col, "term", tfidf.alias("tfidf"))
        .withColumn("term_rank", F.row_number().over(w).cast("long"))
        .where(F.col("term_rank") <= top_n)
        .select(id_col, "term_rank", "term", "tfidf")
        .orderBy(id_col, "term_rank")
    )


def repetition_stats(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document repetition signals (the Gopher quality filters,
    Rae et al. 2021 §A1.1: heavily self-repeating documents are
    low-quality boilerplate/spam and poison LM training):

    - ``n_ngrams``: total ``n``-gram occurrences in the doc;
    - ``dup_ngram_frac``: fraction of occurrences whose n-gram appears
      more than once in the SAME doc;
    - ``top_ngram_frac``: occurrences of the doc's most frequent
      n-gram over the total;
    - ``dup_token_frac``: 1 - distinct/total tokens.

    Scale shape: one explode + two aggregations keyed by (doc, gram)
    then (doc) -- map-side partial aggregation does most of the work
    and the shuffle key cardinality is bounded by corpus token count;
    per-doc token stats are pure column expressions joined back on the
    doc id.  Docs with fewer than ``n`` tokens have no n-grams and are
    omitted (no NULL-fraction rows).  For a filter-predicate (per-row,
    no shuffle) subset of these signals see
    ``curation.dup_ngram_fraction`` / ``curation.repetition_pass``;
    this operator adds the top-gram share, which needs per-doc gram
    COUNTS, not just the distinct-vs-total sizes.
    """
    from .dedup import word_shingles_all

    grams = docs.select(
        F.col(id_col),
        F.explode(word_shingles_all(F.col(text_col), n)).alias("gram"),
    )
    gram_counts = grams.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("c"))
    per_doc = gram_counts.groupBy(id_col).agg(
        F.sum("c").alias("n_ngrams"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))).alias("dup"),
        F.max("c").alias("top"),
    )
    tok = docs.select(
        F.col(id_col),
        token_count(F.col(text_col)).alias("n_tok"),
        distinct_token_count(F.col(text_col)).alias("n_dis"),
    )
    return per_doc.join(tok, id_col).select(
        id_col,
        "n_ngrams",
        (F.col("dup") / F.col("n_ngrams")).alias("dup_ngram_frac"),
        (F.col("top") / F.col("n_ngrams")).alias("top_ngram_frac"),
        (F.lit(1.0) - F.col("n_dis") / F.col("n_tok")).alias("dup_token_frac"),
    )


def vocab_coverage(
    docs: DataFrame, top_k: int = 50, text_col: str = "text"
) -> DataFrame:
    """Corpus vocabulary coverage curve: the ``top_k`` most frequent
    tokens with their cumulative share of all token occurrences --
    the Zipf head that tokenizer and stopword decisions read off
    (e.g. "the top 50 tokens cover X% of the corpus").

    Scale shape: token counts via explode + hash agg (map-side
    combine); the global top-k is TakeOrderedAndProject (per-partition
    heaps, never a full sort); the cumulative window then runs over
    ``top_k`` rows on one task -- bounded, never data-scaled; the
    corpus total is a 1-row broadcast (allowlisted scalar pattern).
    Ties break lexicographically on the token for determinism.
    """
    from pyspark.sql.window import Window

    tok_counts = (
        docs.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = tok_counts.agg(F.sum("cnt").alias("total"))
    top = tok_counts.orderBy(F.desc("cnt"), F.asc("token")).limit(top_k)
    w = (
        Window.orderBy(F.desc("cnt"), F.asc("token"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            F.row_number().over(w).cast("long").alias("rank"),
            "token",
            "cnt",
            (F.sum("cnt").over(w) / F.col("total")).alias("cum_share"),
        )
    )


def _bigram_frame(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, a, b): one row per adjacent token pair -- the shared
    explode of the bigram-LM family (MLE and Kneser-Ney scorers)."""
    toks = docs.select(F.col(id_col), tokens(text_col).alias("l"))
    m = F.greatest(F.size("l") - 1, F.lit(0))
    zipped = F.arrays_zip(F.slice("l", 1, m), F.slice("l", 2, m))
    return toks.select(id_col, F.explode(zipped).alias("p")).select(
        id_col,
        F.col("p").getField("0").alias("a"),
        F.col("p").getField("1").alias("b"),
    )


def bigram_logprob(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document mean bigram conditional log-probability under the
    corpus's own bigram model -- the context-aware upgrade of
    ``unigram_logprob`` (CCNet-style LM quality filtering approximated
    corpus-self: real pipelines use a 5-gram KenLM; the bigram MLE is
    the largest order whose statistics stay exactly SQL-replayable).
    Documents whose token TRANSITIONS are globally unusual score low
    even when each token is individually common -- the signal unigram
    scoring cannot see.

    p(b|a) = count(a,b) / count(a as context); scoring the training
    corpus itself means every scored bigram was observed, so the MLE
    needs no smoothing and the estimate is exact.

    Scale shape: one bigram explode (token-linear), a (a,b)-keyed and
    an a-keyed hash agg (map-side combined, the context table derived
    from the bigram table -- no second corpus pass), equi-joins back,
    per-doc avg.  Docs with < 2 tokens have no bigrams and are
    omitted.
    """
    bg = _bigram_frame(docs, id_col, text_col)
    bn = _SCRATCH.cache(
        bg.groupBy("a", "b").agg(F.count(F.lit(1)).cast("double").alias("n_ab"))
    )
    cn = bn.groupBy("a").agg(F.sum("n_ab").alias("n_a"))
    return (
        bg.join(bn, ["a", "b"])
        .join(cn, "a")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(F.avg(F.log(F.col("n_ab") / F.col("n_a"))), 6).alias(
                "avg_logprob"
            ),
        )
    )


def kneser_ney_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
) -> DataFrame:
    """Per-document mean bigram log-probability under an interpolated
    Kneser-Ney model (Kneser & Ney 1995; Chen & Goodman 1999's
    interpolated form with a fixed absolute discount) -- the smoothing
    the KenLM models real pipelines (CCNet, Gopher) score with, one
    order down so every statistic stays a count table:

        p(b|a) = (c(a,b) - d) / c(a)  +  d * t(a) / c(a) * r(b) / T

    where t(a) = distinct continuations of context ``a``, r(b) =
    distinct left-contexts of ``b`` (the continuation probability:
    "how many contexts does ``b`` complete", the reason 'Francisco'
    scores low despite being frequent), and T = total distinct bigram
    types.  Scoring the training corpus itself means c(a,b) >= 1 > d,
    so the discounted term never clips and the model is exact --
    unlike the MLE (``bigram_logprob``) it also redistributes mass by
    context DIVERSITY, separating boilerplate-glued tokens (high
    count, one context) from genuinely productive ones.

    Scale shape: identical to ``bigram_logprob`` plus two more
    aggregations DERIVED from the cached bigram-type table (context
    fan-out and continuation fan-in are both bn-keyed hash aggs, no
    extra corpus pass) and a 1-row type-total broadcast (the
    scalar-subquery BNLJ shape, allowlisted in the plan audit).  Docs
    with < 2 tokens have no bigrams and are omitted.
    """
    if not 0.0 < discount < 1.0:
        raise ValueError(
            "discount must be in (0, 1): scoring the training corpus "
            "means every c(a,b) >= 1, and d < 1 is what keeps the "
            "discounted term positive without a max() clip"
        )
    bg = _bigram_frame(docs, id_col, text_col)
    bn = _SCRATCH.cache(
        bg.groupBy("a", "b").agg(F.count(F.lit(1)).cast("double").alias("n_ab"))
    )
    cn = bn.groupBy("a").agg(
        F.sum("n_ab").alias("n_a"),
        F.count(F.lit(1)).cast("double").alias("t_a"),
    )
    rb = bn.groupBy("b").agg(F.count(F.lit(1)).cast("double").alias("r_b"))
    types = bn.agg(F.count(F.lit(1)).cast("double").alias("n_types"))
    d = F.lit(float(discount))
    p_kn = (F.col("n_ab") - d) / F.col("n_a") + (
        d * F.col("t_a") / F.col("n_a")
    ) * (F.col("r_b") / F.col("n_types"))
    return (
        bg.join(bn, ["a", "b"])
        .join(cn, "a")
        .join(rb, "b")
        .crossJoin(F.broadcast(types))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(F.avg(F.log(p_kn)), 6).alias("avg_logprob"),
        )
    )


def blocklist_hit_tokens(text_col: Column | str, terms: list[str]) -> Column:
    """The blocklisted-token subarray of ``tokens(text_col)`` -- the
    one match expression both the batch audit (``blocklist_hits``) and
    the streaming ingest gate share, so the two paths can never drift
    on match semantics (whole-token, shared tokenizer, sorted-deduped
    literal list)."""
    if not terms:
        raise ValueError("blocklist_hits needs at least one term")
    lit_terms = F.array(*[F.lit(t) for t in sorted(set(terms))])
    return F.filter(tokens(text_col), lambda t: F.array_contains(lit_terms, t))


def blocklist_hits(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-level blocklist audit -- the C4-style badwords gate
    (Raffel et al. 2020 drop any page containing a listed word;
    Penedo et al. 2023 RefinedWeb keep a weighted variant): per
    document, the number of blocklisted token OCCURRENCES, the sorted
    distinct terms that hit, and the keep verdict (no hits).  Matching
    is on whole tokens from the shared ``tokens()`` split -- substring
    matching is deliberately NOT offered (the Scunthorpe false-positive
    class); callers wanting phrase rules should use ``decontamination``
    shingles instead.

    Scale shape: ZERO shuffle -- the blocklist travels as an array
    literal inside the plan and every output column is a higher-order
    expression over the token array (one codegen'd scan pass).  That
    is the right shape up to lists of a few thousand terms (C4's
    per-language lists are ~400-2000); for 100k+ term lists switch to
    explode + broadcast-hash semi-join, which trades the literal for
    one map-side join at the same single corpus pass.
    """
    hits = blocklist_hit_tokens(text_col, terms)
    return docs.select(
        F.col(id_col),
        F.size(hits).cast("long").alias("n_hits"),
        F.array_join(F.array_sort(F.array_distinct(hits)), ",").alias("hit_terms"),
        (F.size(hits) == 0).alias("keep"),
    )


def hash_embedding(
    docs: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "embedding",
) -> DataFrame:
    """Deterministic text -> dense vector via the hashing trick
    (feature hashing, Weinberger et al. 2009): every token occurrence
    adds +-1 to the dimension ``md5(token) mod dim``, sign drawn from
    another md5 bit -- a trained-model-free document embedding whose
    cosine geometry reflects token-distribution overlap, giving the
    similarity/SemDeDup family a REAL text-derived vector producer
    (the corpus ``embeddings`` table is synthetic).

    Deterministic and engine-portable by construction (same md5
    derivations as the minhash/SRP machinery), so the whole map is
    SQL-replayable.  Scale shape: token explode -> (doc, dim)-keyed
    hash agg (map-side combined; at most ``dim`` rows per doc out of
    the shuffle) -> per-doc map fold into the dense array.  Returns
    (id, embedding array<double>); all-zero vectors are possible only
    for empty docs (dropped -- cosine consumers require non-zero
    vectors, the documented contract of the similarity family).
    """
    tok = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("t"))
    h = tok.select(
        id_col,
        (F.conv(F.substring(F.md5("t"), 1, 8), 16, 10).cast("long") % dim).alias(
            "idx"
        ),
        F.when(
            F.conv(F.substring(F.md5("t"), 9, 1), 16, 10).cast("long") % 2 == 0,
            F.lit(1.0),
        )
        .otherwise(F.lit(-1.0))
        .alias("s"),
    )
    cells = h.groupBy(id_col, "idx").agg(F.sum("s").alias("val"))
    dense = (
        cells.groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("idx"), F.col("val")))
            ).alias("m")
        )
        .select(
            id_col,
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda d: F.coalesce(
                    F.element_at(F.col("m"), d.cast("long")), F.lit(0.0)
                ),
            ).alias(out_col),
        )
    )
    return dense.where(
        F.exists(F.col(out_col), lambda v: v != 0.0)
    )


#: Apache/nginx Common Log Format line shape: host, identd, user,
#: [timestamp], "METHOD path protocol", status, bytes ('-' = none).
CLF_PATTERN = (
    r'^(\S+) (\S+) (\S+) \[([^\]]+)\] "(\S+) (\S+) ([^"]*)" (\d{3}) (\d+|-)$'
)


def parse_common_log(line: Column | str) -> Column:
    """Parse an Apache/nginx Common-Log-Format line into a typed
    struct -- the grok-style extraction every log-analytics ingest
    starts with, as ONE pure-codegen expression (nine
    ``regexp_extract`` groups over a shared anchored pattern; Catalyst
    collapses them into a single regex program per row, no UDF, no
    Python).  Unparseable lines yield a struct of nulls/empty fields
    (``host`` empty) rather than an error -- route them to a dead-letter
    filter with ``parsed.host = ''``.

    Fields: host, identd, user, ts_raw (the bracketed timestamp text,
    left raw -- timezone-offset parsing is the caller's locale
    decision), method, path, protocol, status int, n_bytes long
    (NULL for the CLF ``-`` no-content marker).
    """
    c = F.col(line) if isinstance(line, str) else line

    def g(i: int) -> Column:
        return F.regexp_extract(c, CLF_PATTERN, i)

    return F.struct(
        g(1).alias("host"),
        g(2).alias("identd"),
        g(3).alias("user"),
        g(4).alias("ts_raw"),
        g(5).alias("method"),
        g(6).alias("path"),
        g(7).alias("protocol"),
        F.nullif(g(8), F.lit("")).cast("int").alias("status"),
        F.when(g(9) == "-", F.lit(None))
        .otherwise(F.nullif(g(9), F.lit("")))
        .cast("long")
        .alias("n_bytes"),
    )


def bigram_pmi(
    docs: DataFrame,
    min_count: int = 5,
    k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` adjacent-token collocations by pointwise mutual
    information: PMI(a, b) = ln(p(a,b) / (p(a) p(b))) with p(a,b) the
    corpus bigram MLE and p(.) the unigram MLE -- the classic
    collocation statistic (Church & Hanks, CL 1990).  Where
    ``bigram_logprob`` scores DOCUMENTS by how typical their
    transitions are, this ranks the TRANSITIONS themselves: the
    multiword units a tokenizer-merge pass, a stop-phrase list, or a
    boilerplate detector is built from.

    ``min_count`` drops rare bigrams, whose MLE PMI is maximal by
    construction (two singleton tokens seen together once score
    ln(T^2/B) regardless of meaning) -- the standard guard from the
    original paper.

    Scale shape: one unigram and one bigram explode (token-linear, two
    corpus passes), vocab-/pair-keyed map-combined hash aggs, two
    equi-joins of the (filtered, pair-count-sized) bigram table back
    to unigram counts, two 1-row totals broadcasts, TakeOrdered top-k.
    The PMI operand tree is fixed as
    ln((n_ab * T * T) / (B * n_a * n_b)) so an external oracle folding
    the same doubles lands bit-identically before the rounding."""
    toks = docs.select(tokens(text_col).alias("l"))
    m = F.greatest(F.size("l") - 1, F.lit(0))
    zipped = F.arrays_zip(F.slice("l", 1, m), F.slice("l", 2, m))
    bg = toks.select(F.explode(zipped).alias("p")).select(
        F.col("p").getField("0").alias("a"),
        F.col("p").getField("1").alias("b"),
    )
    un = _SCRATCH.cache(
        toks.select(F.explode("l").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    bn = _SCRATCH.cache(
        bg.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_ab"))
    )
    tot = un.agg(F.sum("n").alias("__t"))
    btot = bn.agg(F.sum("n_ab").cast("double").alias("__bt"))
    na = un.select(F.col("w").alias("a"), F.col("n").alias("n_a"))
    nb = un.select(F.col("w").alias("b"), F.col("n").alias("n_b"))
    pmi = F.log(
        (F.col("n_ab").cast("double") * F.col("__t") * F.col("__t"))
        / (F.col("__bt") * F.col("n_a") * F.col("n_b"))
    )
    return (
        bn.where(F.col("n_ab") >= int(min_count))
        .join(na, "a")
        .join(nb, "b")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(btot))
        .select(
            "a",
            "b",
            F.col("n_ab").cast("long").alias("n_ab"),
            F.round(pmi, 6).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("a"), F.asc("b"))
        .limit(int(k))
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 256,
    stride: int = 192,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Materialize overlapping token-window chunks -- the write-path
    transform feeding embedding, retrieval indexing, and
    fixed-context-window training: (doc, chunk_id, start_tok,
    n_tokens, chunk_text) with ``chunk_tokens``-token windows every
    ``stride`` tokens (overlap = chunk_tokens - stride, so a passage
    split by one window boundary is whole in a neighbor).

    Chunk boundary rule, chosen to be exactly SQL-replayable: windows
    start at 0, stride, 2*stride, ... while the start is inside the
    document, and a trailing window is emitted only if the PREVIOUS
    window did not already reach the end -- so ends strictly increase,
    no chunk is a suffix-duplicate of its predecessor, and every token
    is covered.

    Scale shape: one tokenize + one in-row sequence/explode
    (token-linear output bounded by ~n_tokens/stride chunks per doc),
    pure JVM expressions, no UDF, no shuffle at all -- chunking
    pipelines into whatever downstream agg/write follows."""
    if stride <= 0 or chunk_tokens < stride:
        raise ValueError("need 0 < stride <= chunk_tokens")
    toked = docs.select(
        F.col(id_col), tokens(text_col).alias("l")
    ).where(F.size("l") > 0)
    n = F.size("l")
    last_i = F.floor((n - 1) / stride).cast("int")
    out = (
        toked.select(
            id_col,
            "l",
            n.alias("__n"),
            F.explode(F.sequence(F.lit(0), last_i)).alias("chunk_id"),
        )
        .withColumn("start_tok", F.col("chunk_id") * stride)
        # drop trailing windows whose predecessor already reached the end
        .where(
            (F.col("chunk_id") == 0)
            | (F.col("start_tok") - stride + chunk_tokens < F.col("__n"))
        )
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.col("start_tok").cast("long").alias("start_tok"),
            F.least(
                F.lit(chunk_tokens), F.col("__n") - F.col("start_tok")
            ).cast("long").alias("n_tokens"),
            F.concat_ws(
                " ", F.slice("l", F.col("start_tok") + 1, chunk_tokens)
            ).alias("chunk_text"),
        )
    )
    return out
