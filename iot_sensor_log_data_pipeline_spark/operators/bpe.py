"""BPE merge induction: learn the first ``n_merges`` byte-pair-
encoding merges from a corpus (Sennrich, Haddow, Birch 2016) -- the
tokenizer-training member of the text family (the engine's BPE-ish
token COUNTER approximates an existing tokenizer; this learns one).

Spark-first shape: classic BPE trains on the WORD-FREQUENCY table,
not the corpus -- the only corpus-scale work is one token explode +
groupBy(word).  Every merge round then runs on the vocabulary-sized
table: frequency-weighted adjacent-pair counts via zipped slices, a
1-row argmax pulled to the driver (the bounded sketch-to-driver
pattern), and a greedy left-to-right merge applied as a per-row
``aggregate`` fold over the symbol array (JVM-side; regex replacement
is NOT equivalent -- a consumed delimiter makes the regex skip
immediately-adjacent pair repeats, e.g. ``a a a a`` with pair (a, a)
must become ``aa aa``, which single-pass replace misses).

Determinism: count ties break lexicographically on the (a, b) symbol
TUPLE -- not the space-joined pair string, whose ordering diverges
from tuple order when a symbol contains a char below U+0020 (tokens
split only on spaces, so tabs/newlines can live inside symbols); the
fold is a pure function of the symbol sequence.  The merge recurrence is
verified against a pure-Python BPE reference in pytest; the round-1
pair statistics are oracle-checked (``text_bpe_pairs``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .text import tokens


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) -- the corpus reduced to its vocabulary weights; the
    one corpus-scale step of BPE training."""
    return (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def chars(word: Column) -> Column:
    """Initial symbol sequence: one single-character symbol per char."""
    return F.regexp_extract_all(word, F.lit("(.)"), 1)


def pair_counts(words: DataFrame, syms_col: str = "syms") -> DataFrame:
    """Frequency-weighted adjacent symbol pairs: (a, b, pair, cnt).

    ``a``/``b`` are the raw symbol halves (the deterministic tie-break
    key -- tuple order, not string order of the joined pair); ``pair``
    is the space-joined display form.  Grouping by (a, b) equals
    grouping by the joined string because symbols can never contain a
    space (the tokenizer splits on spaces), but the separate columns
    keep ORDER BY semantics tuple-correct for symbols holding
    sub-space control characters."""
    arr = F.col(syms_col)
    m = F.greatest(F.size(arr) - 1, F.lit(0))
    zipped = F.arrays_zip(F.slice(arr, 1, m), F.slice(arr, 2, m))
    return (
        words.select("n", F.explode(zipped).alias("p"))
        .select(
            "n",
            F.col("p").getField("0").alias("a"),
            F.col("p").getField("1").alias("b"),
        )
        .groupBy("a", "b")
        .agg(F.sum("n").alias("cnt"))
        .select("a", "b", F.concat_ws(" ", "a", "b").alias("pair"), "cnt")
    )


def merge_pair(arr: Column, a: str, b: str, merged: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) -> merged inside a
    symbol array, as one ``aggregate`` fold: the accumulator carries
    (emitted symbols, one pending symbol); a pending ``a`` followed by
    ``b`` emits ``merged`` and clears the pending slot, so a merged
    token is never the left half of another merge in the same pass --
    exactly reference BPE's single-pass semantics (handles runs:
    ``a a a`` -> ``aa a``)."""
    init = F.struct(
        F.array().cast("array<string>").alias("out"), F.lit("").alias("carry")
    )

    def step(acc: Column, s: Column) -> Column:
        is_match = (acc.getField("carry") == a) & (s == b)
        flushed = F.when(
            acc.getField("carry") == "", acc.getField("out")
        ).otherwise(F.concat(acc.getField("out"), F.array(acc.getField("carry"))))
        new_out = F.when(
            is_match, F.concat(acc.getField("out"), F.array(F.lit(merged)))
        ).otherwise(flushed)
        new_carry = F.when(is_match, F.lit("")).otherwise(s)
        return F.struct(new_out.alias("out"), new_carry.alias("carry"))

    def finish(acc: Column) -> Column:
        return F.when(acc.getField("carry") == "", acc.getField("out")).otherwise(
            F.concat(acc.getField("out"), F.array(acc.getField("carry")))
        )

    return F.aggregate(arr, init, step, finish)


def bpe_merges(
    docs: DataFrame, n_merges: int = 3, text_col: str = "text"
) -> DataFrame:
    """The first ``n_merges`` BPE merges as (merge_rank, pair, merged,
    cnt): each round picks the most frequent adjacent symbol pair
    (count desc, then (a, b) tuple asc -- reference BPE's tie-break)
    and rewrites the vocabulary with the pair merged.  Each round is
    O(vocab); only the 1-row argmax leaves the cluster."""
    spark = docs.sparkSession
    words = word_freq_table(docs, text_col).select(
        "n", chars(F.col("word")).alias("syms")
    )
    out = []
    for rank in range(1, n_merges + 1):
        best = (
            pair_counts(words)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b = best[0]["a"], best[0]["b"]
        pair, cnt = best[0]["pair"], best[0]["cnt"]
        merged = a + b
        out.append((rank, pair, merged, int(cnt)))
        words = words.select(
            "n", merge_pair(F.col("syms"), a, b, merged).alias("syms")
        )
    return spark.createDataFrame(
        out, "merge_rank long, pair string, merged string, cnt long"
    )


def bpe_encode_expr(
    docs: DataFrame,
    merges: list[tuple[str, str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize ``text`` by applying learned merges in rank order --
    the APPLY side of BPE (``bpe_merges`` is the training side).

    Pure-column-expression implementation: per word, the initial
    char-symbol array is rewritten by one ``merge_pair`` fold per
    merge, all inside a ``transform`` over the token array, then
    flattened -- entirely JVM-side, no Python in the loop.  Each merge
    nests one more ``aggregate`` around the expression, so codegen
    depth grows linearly with ``len(merges)``: right for small/derived
    merge lists (<= ~16); use ``bpe_encode_udf`` for real tokenizer
    vocabularies."""

    def encode_word(w: Column) -> Column:
        syms = chars(w)
        for a, b, merged in merges:
            syms = merge_pair(syms, a, b, merged)
        return syms

    return docs.withColumn(
        out_col, F.flatten(F.transform(tokens(text_col), encode_word))
    )


def bpe_encode_udf(
    docs: DataFrame,
    merges: list[tuple[str, str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Arrow-batched BPE apply for production merge lists (32k+ merges
    ride the closure as one dict; per-word encoding is the classic
    greedy lowest-rank-pair loop).  Semantically identical to
    ``bpe_encode_expr`` (asserted in pytest); linear in text length
    per merge applied, independent of codegen depth."""
    rank = {(a, b): (i, m) for i, (a, b, m) in enumerate(merges)}

    def encode_word(w: str) -> list[str]:
        syms = list(w)
        while len(syms) > 1:
            best = None
            for i in range(len(syms) - 1):
                r = rank.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r[0] < best[0]):
                    best = (r[0], r[1], syms[i], syms[i + 1])
            if best is None:
                break
            _, merged, a, b = best
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def encode(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: [s for w in t.split() if w for s in encode_word(w)]
        )

    return docs.withColumn(out_col, encode(F.col(text_col)))
