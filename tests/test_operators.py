"""Unit tests for custom operators on tiny in-memory fixtures --
the oracle-less pieces (SimHash, LSH ANN) get hand-computed or
recall-based checks here (SURVEY.md §5 test strategy, point 4)."""

from __future__ import annotations

import hashlib
import math
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from iot_sensor_log_data_pipeline_spark.operators import dedup as DD
from iot_sensor_log_data_pipeline_spark.operators import similarity as SIM
from iot_sensor_log_data_pipeline_spark.operators import text as TX
from iot_sensor_log_data_pipeline_spark.operators.asof import asof_join


def _py_simhash(text: str) -> str:
    toks = sorted({t for t in text.split() if t})
    votes = [0] * 64
    for t in toks:
        hx = hashlib.md5(t.encode()).hexdigest()[:16]
        bits = bin(int(hx, 16))[2:].zfill(64)
        for i, b in enumerate(bits):
            votes[i] += 1 if b == "1" else -1
    return "".join("1" if v > 0 else "0" for v in votes)


def test_simhash_matches_python_oracle(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "a b c d e f g",
        "spark native analytics engine spark native",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id int, text string")
    got = {
        r["id"]: r["sh"]
        for r in df.select("id", DD.simhash64(F.col("text")).alias("sh")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _py_simhash(t), f"simhash mismatch for {t!r}"


def test_simhash_hamming(spark):
    df = spark.createDataFrame([("1010", "1001")], "a string, b string")
    (row,) = df.select(DD.simhash_hamming(F.col("a"), F.col("b")).alias("d")).collect()
    assert row["d"] == 2


def test_exact_dedup_keeps_min_key(spark):
    df = spark.createDataFrame(
        [(3, "x"), (1, "x"), (2, "y"), (5, "x")], "doc_id long, text string"
    )
    got = sorted(
        r["doc_id"] for r in DD.exact_dedup(df, ["text"], "doc_id").collect()
    )
    assert got == [1, 2]


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "text: string")
    rows = df.select(DD.word_shingles(F.col("text"), 3).alias("s")).collect()
    assert rows[0]["s"] == ["a b c", "b c d"]
    assert rows[1]["s"] == []  # fewer than n tokens


def test_ngram_jaccard_identical_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h"), (3, "z y x w v u t s")],
        "doc_id long, text string",
    )
    pairs = DD.ngram_jaccard_pairs(df, threshold=0.9).collect()
    assert [(p["id_a"], p["id_b"], p["jaccard"]) for p in pairs] == [(1, 2, 1.0)]


def test_minhash_lsh_finds_exact_dupes(spark):
    docs = [(i, f"w{i} " * 10) for i in range(10)]  # 10 distinct docs
    docs += [(100, docs[0][1]), (101, docs[1][1])]  # 2 exact dupes
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = {
        (p["id_a"], p["id_b"]) for p in DD.minhash_lsh_pairs(df, threshold=0.9).collect()
    }
    assert (0, 100) in pairs and (1, 101) in pairs
    assert all(a in (0, 1) for a, _ in pairs)


def test_lsh_ann_recall_vs_brute_force(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 3)
    exact = SIM.brute_force_topk(emb, queries, k=10).collect()
    approx = SIM.lsh_topk(emb, queries, k=10).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # Deterministic (seeded planes): with 8 bands x 4 rows recall is
    # high on random unit-ish vectors; floor guards regressions.
    assert recall >= 0.5, f"LSH recall collapsed: {recall}"


def test_asof_join_basics(spark):
    ts = lambda s: datetime.fromisoformat(s)  # noqa: E731
    left = spark.createDataFrame(
        [(1, ts("2024-01-01T10:00:00"), "L1"), (1, ts("2024-01-01T12:00:00"), "L2"),
         (2, ts("2024-01-01T10:00:00"), "L3")],
        "k long, ts timestamp, lbl string",
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01T09:00:00"), 9.0), (1, ts("2024-01-01T11:30:00"), 11.5),
         (1, ts("2024-01-01T12:00:00"), 12.0)],
        "k long, ts timestamp, v double",
    )
    got = {
        (r["k"], r["lbl"]): r["rv"]
        for r in asof_join(
            left, right, by=["k"], left_on="ts", right_on="ts",
            right_cols={"v": "rv"},
        ).collect()
    }
    assert got[(1, "L1")] == 9.0          # nearest prior
    assert got[(1, "L2")] == 12.0         # equal ts matches (<= semantics)
    assert got[(2, "L3")] is None         # no right rows for key 2

    strict = {
        (r["k"], r["lbl"]): r["rv"]
        for r in asof_join(
            left, right, by=["k"], left_on="ts", right_on="ts",
            right_cols={"v": "rv"}, strict=True,
        ).collect()
    }
    assert strict[(1, "L2")] == 11.5      # strictly-before excludes 12:00

    tol = {
        (r["k"], r["lbl"]): r["rv"]
        for r in asof_join(
            left, right, by=["k"], left_on="ts", right_on="ts",
            right_cols={"v": "rv"}, tolerance_seconds=1800,
        ).collect()
    }
    assert tol[(1, "L1")] is None         # 9:00 is >30min before 10:00
    assert tol[(1, "L2")] == 12.0


def test_asof_join_null_right_column_stays_atomic(spark):
    """A NULL inside the matched right row's carried column must come
    through as NULL -- not be back-filled from a different right row
    (per-column last/first(ignorenulls) tears the matched tuple; the
    struct carry keeps it atomic).  Covers backward, forward, and
    nearest."""
    from iot_sensor_log_data_pipeline_spark.operators.asof import (
        asof_join_forward,
        asof_join_nearest,
    )

    ts = lambda s: datetime.fromisoformat(s)  # noqa: E731
    left = spark.createDataFrame(
        [(1, ts("2024-01-01T12:00:00"), "L")], "k long, ts timestamp, lbl string"
    )
    # nearest-prior row (11:00) has v=NULL but w=20; older row (09:00)
    # has v=9.0 -- a torn implementation would emit (9.0, 20).
    # Symmetric layout on the forward side.
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01T09:00:00"), 9.0, 10.0),
            (1, ts("2024-01-01T11:00:00"), None, 20.0),
            (1, ts("2024-01-01T13:00:00"), None, 30.0),
            (1, ts("2024-01-01T15:00:00"), 15.0, 40.0),
        ],
        "k long, ts timestamp, v double, w double",
    )
    kw = dict(by=["k"], left_on="ts", right_on="ts",
              right_cols={"v": "rv", "w": "rw"})
    back = asof_join(left, right, **kw).collect()[0]
    assert (back["rv"], back["rw"]) == (None, 20.0)
    assert back["matched_ts"] == ts("2024-01-01T11:00:00")
    fwd = asof_join_forward(left, right, **kw).collect()[0]
    assert (fwd["rv"], fwd["rw"]) == (None, 30.0)
    assert fwd["matched_ts"] == ts("2024-01-01T13:00:00")
    near = asof_join_nearest(left, right, **kw).collect()[0]
    assert (near["rv"], near["rw"]) == (None, 20.0)  # tie -> prior
    assert near["matched_ts"] == ts("2024-01-01T11:00:00")


def test_text_stats_edges(spark):
    df = spark.createDataFrame(
        [(1, "a  double  space"), (2, "xyz")], "id int, text string"
    )
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            TX.token_count(F.col("text")).alias("n"),
            TX.predicted_language(F.col("text")).alias("lang"),
        ).collect()
    }
    assert rows[1]["n"] == 3  # multi-space split yields no empty tokens
    assert rows[1]["lang"] == "en"  # 'a' is an en marker
    assert rows[2]["lang"] == "und"  # no markers anywhere


def test_quality_score_bounds(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stats = TX.with_text_stats(docs)
    row = stats.agg(
        F.min("quality").alias("lo"), F.max("quality").alias("hi")
    ).collect()[0]
    assert 0.0 <= row["lo"] <= row["hi"] <= 1.0


@pytest.mark.parametrize("n", [2, 3])
def test_shingle_count(spark, n):
    df = spark.createDataFrame([("a b c d e",)], "text: string")
    (row,) = df.select(F.size(DD.word_shingles(F.col("text"), n)).alias("c")).collect()
    assert row["c"] == 5 - n + 1


def test_ivf_ann_recall_vs_brute_force(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 3)
    exact = SIM.brute_force_topk(emb, queries, k=10).collect()
    approx = SIM.ivf_topk(emb, queries, k=10).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, f"IVF recall collapsed: {recall}"
    # Every approx result must be a genuine vector pair with sane rank.
    assert all(1 <= r["rank"] <= 10 for r in approx)


def test_kafka_source_gated(spark):
    from iot_sensor_log_data_pipeline_spark.sources import kafka as K

    # No broker/connector in this environment: availability must be
    # False and the readers must fail with a clear gate error.
    assert K.kafka_available(spark) is False
    with pytest.raises(ModuleNotFoundError):
        K.read_sensor_topic(spark, "localhost:9092")


def test_merge_upsert_semantics(spark):
    from iot_sensor_log_data_pipeline_spark.operators.scd import merge_upsert

    cur = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    upd = spark.createDataFrame([(2, "B"), (3, "C")], "k long, v string")
    got = sorted(
        (r["k"], r["v"]) for r in merge_upsert(cur, upd, ["k"]).collect()
    )
    assert got == [(1, "a"), (2, "B"), (3, "C")]


def test_functions_module_surface(spark):
    import iot_sensor_log_data_pipeline_spark.functions as EF

    df = spark.createDataFrame(
        [(1, "2024-01-05 13:37:00", 1234)], "id int, ts string, cnt int"
    ).select(F.col("id"), F.to_timestamp("ts").alias("ts"), F.col("cnt"))
    row = df.select(
        EF.log_hour("ts").alias("h"),
        EF.histogram_bucket("cnt", 500).alias("b"),
        EF.time_bucket("ts", 600).alias("tb"),
    ).collect()[0]
    assert row["h"] == "2024-01-05-13"
    assert row["b"] == 1000
    assert str(row["tb"]) == "2024-01-05 13:30:00"
    assert set(EF.__all__) >= {"tokens", "cosine", "simhash64", "log_hour"}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_asof_join_matches_pandas_merge_asof(spark, seed):
    """Property check: the union+window as-of join must agree with
    pandas.merge_asof on randomized (seeded) inputs."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    n_l, n_r = 60, 80
    base = pd.Timestamp("2024-01-01")
    left_pd = pd.DataFrame(
        {
            "k": rng.integers(0, 5, n_l),
            "ts": base + pd.to_timedelta(rng.integers(0, 10_000, n_l), unit="s"),
            "lid": np.arange(n_l),
        }
    ).sort_values("ts").reset_index(drop=True)
    right_pd = pd.DataFrame(
        {
            "k": rng.integers(0, 5, n_r),
            "ts": base + pd.to_timedelta(rng.integers(0, 10_000, n_r), unit="s"),
            "rv": np.round(rng.uniform(0, 100, n_r), 2),
        }
    ).sort_values("ts").reset_index(drop=True)
    # merge_asof requires unique-ish ordering; drop right ts dupes per key
    right_pd = right_pd.drop_duplicates(["k", "ts"], keep="last").sort_values("ts")

    expected = pd.merge_asof(
        left_pd, right_pd, on="ts", by="k", direction="backward"
    ).set_index("lid")["rv"]

    left = spark.createDataFrame(left_pd)
    right = spark.createDataFrame(right_pd)
    got = {
        r["lid"]: r["rv_out"]
        for r in asof_join(
            left, right, by=["k"], left_on="ts", right_on="ts",
            right_cols={"rv": "rv_out"},
        ).collect()
    }
    for lid, exp in expected.items():
        g = got[lid]
        if pd.isna(exp):
            assert g is None, f"seed={seed} lid={lid}: got {g}, want null"
        else:
            assert g == exp, f"seed={seed} lid={lid}: got {g}, want {exp}"


def test_ngram_jaccard_cap_scales_with_corpus(spark):
    """A fixed DF cap of 50 prunes every shingle of a 60-document dup
    cluster (DF=60) and finds nothing; the corpus-relative cap
    (frac * n_docs) keeps them and recovers the pairs."""
    dup = [(i, "the quick brown fox jumps over the lazy dog again") for i in range(60)]
    filler = [(1000 + i, f"unique filler text number {i} alpha beta gamma {i}") for i in range(200)]
    df = spark.createDataFrame(dup + filler, "doc_id long, text string")

    fixed = DD.ngram_jaccard_pairs(df, threshold=0.9, max_shingle_df=50)
    assert fixed.count() == 0  # the failure mode at 100x corpus size

    scaled = DD.ngram_jaccard_pairs(df, threshold=0.9, max_shingle_frac=0.25)
    assert scaled.count() == 60 * 59 // 2  # all dup pairs recovered


def test_ngram_jaccard_reports_unpruned_jaccard(spark):
    """Pruning applies to candidate generation only: the reported
    jaccard is recounted over FULL shingle sets, so two identical docs
    score 1.0 even when some of their shingles are stop-shingles."""
    common = "x y z w v u"  # shared by everyone -> stop-shingles
    docs = [(i, f"{common} filler{i} a{i} b{i} c{i}") for i in range(30)]
    docs += [(100, f"{common} same tail here okay fine"), (101, f"{common} same tail here okay fine")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = DD.ngram_jaccard_pairs(df, threshold=0.99, max_shingle_df=10).collect()
    assert [(p["id_a"], p["id_b"], p["jaccard"]) for p in pairs] == [(100, 101, 1.0)]


def test_dedup_releases_scratch_caches(spark):
    """Repeated pair-operator calls must not accumulate cached RDDs:
    each call releases the previous call's scratch, and
    release_caches() drops the last one (ADVICE round 1)."""
    df = spark.createDataFrame(
        [(i, f"w{i} x{i} y{i} z{i} q{i}") for i in range(20)],
        "doc_id long, text string",
    )
    jsc = spark.sparkContext._jsc
    DD.release_caches()
    base = jsc.getPersistentRDDs().size()
    for _ in range(3):
        DD.minhash_lsh_pairs(df, threshold=0.9).count()
        DD.ngram_jaccard_pairs(df, threshold=0.9).count()
        assert jsc.getPersistentRDDs().size() <= base + 1  # at most the live scratch
    DD.release_caches()
    assert jsc.getPersistentRDDs().size() <= base


def test_ivf_kmeans_recall_on_clustered_fixture(spark):
    """A clustered corpus is where quantizer quality shows: first-N-id
    centroids would land all in whichever clusters the low ids hit,
    while sampled k-means spreads cells across the real clusters.
    Recall floor asserted on 8 well-separated Gaussian clusters."""
    rng = __import__("numpy").random.default_rng(7)
    np = __import__("numpy")
    centers = rng.standard_normal((8, 64)) * 10.0
    rows = []
    vid = 0
    for c in range(8):
        for _ in range(50):
            vec = centers[c] + rng.standard_normal(64)
            rows.append((vid, [float(x) for x in vec], c))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    queries = emb.where(F.col("vec_id") % 57 == 3)  # a few queries across clusters
    exact = SIM.brute_force_topk(emb, queries, k=10).collect()
    approx = SIM.ivf_topk(emb, queries, k=10, n_cells=16, n_probe=4).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # Production-quantizer regression gate: measured 1.0 on this
    # fixture; a drop below 0.85 means the Lloyd sampling or the
    # assignment changed behavior, and should fail CI rather than
    # silently move a bench number.
    assert recall >= 0.85, f"k-means IVF recall on clustered data: {recall}"


def test_kmeans_centroids_deterministic(spark):
    rng = __import__("numpy").random.default_rng(3)
    rows = [(i, [float(x) for x in rng.standard_normal(64)]) for i in range(300)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    c1 = SIM.kmeans_centroids(emb, 8, sample_size=256)
    c2 = SIM.kmeans_centroids(emb.repartition(13), 8, sample_size=256)
    assert c1 == c2  # partitioning-independent and seeded


def test_embedding_cosine_pairs_lsh_recall(spark, sf_dir):
    """The LSH-bucketed embedding near-dup path must recover most of
    the exact pair set and introduce nothing below threshold."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {
        (r["id_a"], r["id_b"])
        for r in SIM.embedding_cosine_pairs(emb, 0.42, method="exact").collect()
    }
    lsh_rows = SIM.embedding_cosine_pairs(emb, 0.42, method="lsh").collect()
    lsh = {(r["id_a"], r["id_b"]) for r in lsh_rows}
    assert lsh <= exact  # verification removes every false positive
    assert exact, "fixture should contain pairs at this threshold"
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.5, f"embedding LSH recall collapsed: {recall}"


def test_minhash_fast_mode_finds_exact_dupes(spark):
    """hash_mode='fast' (xxhash64, production path) must find the same
    exact-duplicate pairs as the md5 oracle mode -- identical shingle
    sets give identical signatures under any hash."""
    docs = [(i, f"w{i} " * 10) for i in range(10)]
    docs += [(100, docs[0][1]), (101, docs[1][1])]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = {
        (p["id_a"], p["id_b"])
        for p in DD.minhash_lsh_pairs(df, threshold=0.9, hash_mode="fast").collect()
    }
    assert (0, 100) in pairs and (1, 101) in pairs
    with pytest.raises(ValueError):
        DD.minhash_lsh_pairs(df, hash_mode="sha9000").collect()


def test_approx_sketches_within_bounds(spark, sf_dir):
    """agg_approx_sketches is rows-only at the oracle gate (sketch
    values are engine-specific); this pins it to the exact answers:
    HLL++ count-distinct within its error bound, approx median between
    tight exact percentiles (accuracy=10000 => rank error 1e-4)."""
    from iot_sensor_log_data_pipeline_spark.plans import catalog

    got = {
        r["l_returnflag"]: r
        for r in catalog.all_entries()["agg_approx_sketches"]
        .fn(spark, sf_dir)
        .collect()
    }
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("nd"),
            F.percentile("l_extendedprice", F.lit(0.495)).alias("p_lo"),
            F.percentile("l_extendedprice", F.lit(0.505)).alias("p_hi"),
        )
        .collect()
    }
    for flag, g in got.items():
        e = exact[flag]
        rel = abs(g["approx_parts"] - e["nd"]) / e["nd"]
        assert rel <= 0.15, f"{flag}: HLL rel error {rel}"  # 3x default rsd
        assert e["p_lo"] <= g["approx_median"] <= e["p_hi"], (
            f"{flag}: approx median {g['approx_median']} outside "
            f"[{e['p_lo']}, {e['p_hi']}]"
        )


def test_hash_split_deterministic_and_partition_independent(spark):
    from iot_sensor_log_data_pipeline_spark.operators import curation as CU

    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["s"] for r in df.select("doc_id", CU.split_label("doc_id").alias("s")).collect()}
    b = {
        r["doc_id"]: r["s"]
        for r in df.repartition(17).select("doc_id", CU.split_label("doc_id").alias("s")).collect()
    }
    assert a == b
    # matches the int(md5[:8], 16) % 100 reference computation
    for doc_id in (0, 1, 42, 499):
        bucket = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 100
        expect = "train" if bucket < 90 else ("val" if bucket < 95 else "test")
        assert a[doc_id] == expect, (doc_id, bucket)
    # shares in the hash-uniform ballpark of 90/5/5
    from collections import Counter

    shares = Counter(a.values())
    assert 0.85 <= shares["train"] / 500 <= 0.95


def test_dup_ngram_fraction_hand_case(spark):
    from iot_sensor_log_data_pipeline_spark.operators import curation as CU

    # "a b a b a": 2-grams = [a b, b a, a b, b a] -> 2 distinct / 4 -> 0.5
    df = spark.createDataFrame([("a b a b a",), ("x y z",), ("w",)], "text: string")
    got = [
        (round(r["d2"], 6), round(r["d3"], 6))
        for r in df.select(
            CU.dup_ngram_fraction(F.col("text"), 2).alias("d2"),
            CU.dup_ngram_fraction(F.col("text"), 3).alias("d3"),
        ).collect()
    ]
    # 3-grams of "a b a b a": [a b a, b a b, a b a] -> 2 distinct / 3
    assert got[0] == (0.5, round(1 - 2 / 3, 6))
    assert got[1] == (0.0, 0.0)  # all distinct
    assert got[2] == (0.0, 0.0)  # shorter than n: no positions, 0 by convention


def test_contaminated_docs_finds_planted_overlap(spark):
    from iot_sensor_log_data_pipeline_spark.operators import curation as CU

    leak = "q w e r t y u i o p"  # 10 tokens -> three 8-gram windows
    corpus = spark.createDataFrame(
        [(1, f"pad1 {leak} pad2"), (2, "c d e f g h i j k l"), (3, leak)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(99, f"intro {leak} outro")], "doc_id long, text string")
    got = {r["doc_id"]: r["n_overlapping_ngrams"] for r in CU.contaminated_docs(corpus, bench, n=8).collect()}
    assert set(got) == {1, 3}  # doc 2 shares no 8-gram
    assert got[1] == 3 and got[3] == 3


def test_affine_minhash_matches_python_reference(spark):
    """The md5-word affine hash must equal the plain-Python computation
    (int over md5 hex words, mod arithmetic) for every permutation --
    guards the conv/substr indexing and the overflow-free reduction."""
    shingles = ["a b c", "hello world x", "zzz"]
    df = spark.createDataFrame([(s,) for s in shingles], "shingle: string")
    cols = [DD._affine_hash(DD._md5_words(F.col("shingle")), DD.MINHASH_COEFFS[s]).alias(f"h{s}")
            for s in range(DD.MINHASH_PERMS)]
    got = df.select("shingle", *cols).collect()
    P = DD.MINHASH_PRIME
    for row in got:
        hx = hashlib.md5(row["shingle"].encode()).hexdigest()
        words = [int(hx[8 * k:8 * k + 8], 16) for k in range(4)]
        for s, (a1, a2, a3, a4, b) in enumerate(DD.MINHASH_COEFFS):
            expect = (sum(a * w % P for a, w in zip((a1, a2, a3, a4), words)) + b) % P
            assert row[f"h{s}"] == expect, (row["shingle"], s)


def test_jdbc_source_gated(spark):
    from iot_sensor_log_data_pipeline_spark.sources import jdbc as J

    # No driver jars in this environment: the probe must say so and the
    # reader must fail with the clear gate error, not a JVM stack.
    assert J.jdbc_driver_available(spark, "org.postgresql.Driver") is False
    with pytest.raises(ModuleNotFoundError):
        J.read_table(spark, "jdbc:postgresql://localhost/db", "t",
                     partition_column="id", lower_bound=0, upper_bound=100)
    with pytest.raises(ValueError):
        J.read_table(spark, "jdbc:postgresql://localhost/db", "t",
                     partition_column="id")  # bounds missing
    with pytest.raises(ValueError):
        J.read_table(spark, "jdbc:oracle:thin:@x", "t")  # unknown scheme


def test_gapfill_locf_and_interpolation_hand_case(spark):
    from datetime import datetime

    from iot_sensor_log_data_pipeline_spark.operators import timeseries as TS

    ts = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    # series A: values at :00 and :30 -> two 10-min gaps between them
    df = spark.createDataFrame(
        [("A", ts(0), 10.0), ("A", ts(30), 40.0), ("B", ts(0), 7.0)],
        "k string, bucket timestamp, v double",
    )
    spine = TS.gapfill_spine(df, ["k"], "bucket", 600)
    dense = spine.join(df, ["k", "bucket"], "left")
    out = dense.select(
        "k",
        "bucket",
        TS.locf("v", ["k"], "bucket").alias("locf"),
        TS.linear_interpolate("v", ["k"], "bucket").alias("interp"),
    ).collect()
    got = {(r["k"], r["bucket"].minute): (r["locf"], r["interp"]) for r in out}
    assert got[("A", 0)] == (10.0, 10.0)
    assert got[("A", 10)] == (10.0, 20.0)   # 1/3 of the way 10 -> 40
    assert got[("A", 20)] == (10.0, 30.0)   # 2/3
    assert got[("A", 30)] == (40.0, 40.0)
    assert got[("B", 0)] == (7.0, 7.0)      # single-point series intact
    assert len(got) == 5                    # B has no spine beyond its point


def _py_lttb(xs, ys, n_out):
    import numpy as np

    n = len(xs)
    if n <= n_out:
        return list(range(n))
    edges = np.linspace(1, n - 1, n_out - 1).astype("int64")
    sel = [0]
    for b in range(n_out - 2):
        lo, hi = edges[b], edges[b + 1]
        nlo, nhi = edges[b + 1], (edges[b + 2] if b + 2 < len(edges) else n)
        cx, cy = float(np.mean(xs[nlo:nhi])), float(np.mean(ys[nlo:nhi]))
        ax, ay = xs[sel[-1]], ys[sel[-1]]
        areas = [abs((ax - cx) * (ys[i] - ay) - (ax - xs[i]) * (cy - ay)) for i in range(lo, hi)]
        sel.append(lo + int(np.argmax(areas)))
    sel.append(n - 1)
    return sel


def test_lttb_matches_python_reference(spark):
    import numpy as np

    from iot_sensor_log_data_pipeline_spark.operators.timeseries import lttb_downsample

    rng = np.random.default_rng(11)
    rows = []
    for g in ("s1", "s2"):
        ys = np.cumsum(rng.standard_normal(500))
        rows += [(g, float(i), float(v)) for i, v in enumerate(ys)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {
        g: sorted((r["x"], r["y"]) for r in grp)
        for g, grp in __import__("itertools").groupby(
            sorted(lttb_downsample(df, 60, ["g"], "x", "y").collect(), key=lambda r: r["g"]),
            key=lambda r: r["g"],
        )
    }
    for g in ("s1", "s2"):
        xs = [x for gg, x, y in rows if gg == g]
        ys = [y for gg, x, y in rows if gg == g]
        idx = _py_lttb(xs, ys, 60)
        expect = sorted((xs[i], ys[i]) for i in idx)
        assert got[g] == expect
        assert len(got[g]) == 60
        assert (0.0, ys[0]) in got[g] and (499.0, ys[499]) in got[g]  # endpoints kept


def test_lttb_small_series_passthrough(spark):
    from iot_sensor_log_data_pipeline_spark.operators.timeseries import lttb_downsample

    df = spark.createDataFrame(
        [("a", 1.0, 5.0), ("a", 2.0, 6.0)], "g string, x double, y double"
    )
    assert lttb_downsample(df, 10, ["g"], "x", "y").count() == 2


def test_count_min_sketch_properties(spark):
    from iot_sensor_log_data_pipeline_spark.operators import sketch as SK

    rng = __import__("numpy").random.default_rng(5)
    # zipf-ish key frequencies so there are genuine heavy hitters
    keys = [f"k{i}" for i in range(200)]
    counts = [(k, int(1 + 5000 // (i + 1))) for i, k in enumerate(keys)]
    cnt = spark.createDataFrame(counts, "key string, n long")
    sk = SK.cms_build(cnt)
    assert sk.count() <= SK.CMS_DEPTH * SK.CMS_WIDTH
    est = {
        r["key"]: r["est_count"]
        for r in SK.cms_estimate(sk, cnt.select("key")).collect()
    }
    exact = dict(counts)
    total = sum(exact.values())
    for k, n in exact.items():
        assert est[k] >= n, f"CMS underestimated {k}"        # never underestimates
        assert est[k] <= n + 2 * total // SK.CMS_WIDTH + 1   # per-row bound, d-fold min
    # sketches merge: union of two half-corpus sketches == full sketch
    half1 = SK.cms_build(cnt.where(F.col("key") < "k5"))
    half2 = SK.cms_build(cnt.where(~(F.col("key") < "k5")))
    merged = (
        half1.unionByName(half2)
        .groupBy("row", "bucket")
        .agg(F.sum("cell_count").alias("cell_count"))
    )
    full = {(r["row"], r["bucket"]): r["cell_count"] for r in sk.collect()}
    got = {(r["row"], r["bucket"]): r["cell_count"] for r in merged.collect()}
    assert got == full


def test_hll_registers_match_python_reference_and_estimate(spark):
    from iot_sensor_log_data_pipeline_spark.operators import sketch as SK

    keys = [f"user{i}" for i in range(3000)]
    df = spark.createDataFrame([(k,) for k in keys] * 2, "key: string")  # dupes
    regs = SK.hll_registers(df, "key")
    got = {r["register"]: r["max_rank"] for r in regs.collect()}

    expect: dict[int, int] = {}
    for k in keys:
        d = hashlib.md5(k.encode()).hexdigest()
        reg = int(d[:2], 16)
        v = int(d[2:14], 16)
        rank = 48 - (0 if v == 0 else v.bit_length()) + 1
        expect[reg] = max(expect.get(reg, 0), rank)
    assert got == expect

    (row,) = SK.hll_estimate(regs).collect()
    est = row["est_distinct"]
    # p=8 -> relative error ~1.04/sqrt(256) = 6.5%; 3 sigma bound.
    assert abs(est - 3000) / 3000 < 0.2, est

    # merge property: union + re-max == whole-corpus registers
    half1 = SK.hll_registers(df.where(F.col("key") < "user2"), "key")
    half2 = SK.hll_registers(df.where(~(F.col("key") < "user2")), "key")
    merged = (
        half1.unionByName(half2)
        .groupBy("register")
        .agg(F.max("max_rank").alias("max_rank"))
    )
    assert {(r["register"], r["max_rank"]) for r in merged.collect()} == set(got.items())


def test_bloom_prune_join_exact_vs_plain_join(spark):
    from iot_sensor_log_data_pipeline_spark.operators import sketch as SK

    fact = spark.range(0, 50000).select(
        (F.col("id") % 9973).alias("fk"), F.col("id").alias("v")
    )
    dim = spark.range(0, 200).select(
        (F.col("id") * 37).alias("dk"), (F.col("id") % 5).alias("attr")
    )
    got = sorted(
        (r["fk"], r["v"], r["attr"])
        for r in SK.bloom_prune_join(fact, dim, "fk", "dk").collect()
    )
    expect = sorted(
        (r["fk"], r["v"], r["attr"])
        for r in fact.join(dim, fact["fk"] == dim["dk"]).collect()
    )
    assert got == expect and len(got) > 0


def test_pii_redaction_hand_cases(spark):
    rows = [
        (0, "contact me at jane.doe+spam@example.co.uk for details"),
        (1, "call +1 555 123-4567 or +49 30 1234567 now"),
        (2, "server at 192.168.0.1 and 10.0.0.255 responded"),
        (3, "clean text with no sensitive content at all"),
        (4, "mix: a@b.io then +12 3456 7890 then 8.8.8.8 done"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    counts = TX.pii_counts(F.col("text"))
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            counts["email"].alias("e"),
            counts["phone"].alias("p"),
            counts["ipv4"].alias("i"),
            TX.redact_pii(F.col("text")).alias("red"),
        ).collect()
    }
    assert (got[0]["e"], got[0]["p"], got[0]["i"]) == (1, 0, 0)
    assert got[0]["red"] == "contact me at <EMAIL> for details"
    assert got[1]["e"] == 0 and got[1]["p"] == 2
    assert got[1]["red"] == "call <PHONE> or <PHONE> now"
    assert got[2]["i"] == 2
    assert got[2]["red"] == "server at <IP> and <IP> responded"
    assert got[3]["red"] == rows[3][1]  # clean text untouched
    assert (got[4]["e"], got[4]["p"], got[4]["i"]) == (1, 1, 1)
    assert got[4]["red"] == "mix: <EMAIL> then <PHONE> then <IP> done"


def test_duplicated_passage_stats_hand_case(spark):
    # doc 0 and doc 1 share their first 8 tokens exactly (one aligned
    # chunk); doc 2 is unique; doc 3 is shorter than one chunk.
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, shared + " one two three four"),
        (1, shared + " five six seven eight"),
        (2, "completely different words nine ten eleven twelve thirteen"),
        (3, "tiny doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in DD.duplicated_passage_stats(df, k=8, stride=4).collect()
    }
    # docs 0/1: 12 tokens -> starts 0,4 -> 2 chunks; chunk@0 is shared.
    assert got[0]["n_chunks"] == 2 and got[0]["n_dup_chunks"] == 1
    assert got[1]["n_chunks"] == 2 and got[1]["n_dup_chunks"] == 1
    assert got[0]["dup_chunk_ratio"] == 0.5
    # doc 2: 8 tokens -> one chunk, unshared.
    assert got[2]["n_chunks"] == 1 and got[2]["n_dup_chunks"] == 0
    # doc 3: shorter than k -> whole text as its single chunk.
    assert got[3]["n_chunks"] == 1 and got[3]["n_dup_chunks"] == 0


def test_unigram_logprob_hand_case(spark):
    import math

    # corpus: 6 tokens total; 'x' appears 3 times, 'y' 2, 'z' 1.
    rows = [(0, "x x y"), (1, "x y z")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in TX.unigram_logprob(df).collect()}
    lp = {"x": math.log(3 / 6), "y": math.log(2 / 6), "z": math.log(1 / 6)}
    exp0 = round((2 * lp["x"] + lp["y"]) / 3, 6)
    exp1 = round((lp["x"] + lp["y"] + lp["z"]) / 3, 6)
    assert got[0]["n_tokens"] == 3 and abs(got[0]["avg_logprob"] - exp0) < 1e-9
    assert got[1]["n_tokens"] == 3 and abs(got[1]["avg_logprob"] - exp1) < 1e-9


def test_ngram_jaccard_matches_bruteforce_hypothesis(spark):
    """Property: ``ngram_jaccard_pairs`` (equi-join candidates + full
    recount) reports EXACTLY the pairs a brute-force all-pairs Jaccard
    finds, for random word-soup corpora.  Stop-shingle pruning drops
    only candidate-generation edges, never true pairs, as long as a
    qualifying pair shares at least one sub-cap shingle -- with the cap
    at corpus size nothing is pruned, so equality must be exact."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    words = ("alpha", "beta", "gamma", "delta", "epsilon", "zeta")

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.lists(st.sampled_from(words), min_size=3, max_size=12),
            min_size=2,
            max_size=8,
        )
    )
    def run(corpus):
        rows = [(i, " ".join(toks)) for i, toks in enumerate(corpus)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r["id_a"], r["id_b"])
            for r in DD.ngram_jaccard_pairs(
                df, n=3, threshold=0.5, max_shingle_df=len(rows)
            ).collect()
        }

        def shingles(toks):
            return {
                " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
            }

        expect = set()
        for a in range(len(corpus)):
            for b in range(a + 1, len(corpus)):
                sa, sb = shingles(corpus[a]), shingles(corpus[b])
                if not sa or not sb:
                    continue
                j = len(sa & sb) / len(sa | sb)
                if j >= 0.5:
                    expect.add((a, b))
        assert got == expect

    run()


def test_weighted_sample_matches_python_reference(spark):
    import math

    from iot_sensor_log_data_pipeline_spark.operators import curation as CU

    rows = [(i, float(w)) for i, w in enumerate([5, 1, 50, 10, 2, 100, 7, 3, 0, 25])]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = [
        (r["doc_id"], r["sample_key"])
        for r in CU.weighted_sample(df, F.col("w"), k=4).collect()
    ]

    def key(i, w):
        u = (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) + 1.0) / 2**32
        return round(math.log(u) / w, 10)

    expect = sorted(
        ((i, key(i, w)) for i, w in rows if w > 0),
        key=lambda t: (-t[1], t[0]),
    )[:4]
    assert got == expect


def test_histogram_quantiles_within_one_bin_of_exact(spark):
    from iot_sensor_log_data_pipeline_spark.operators.sketch import (
        histogram_quantiles,
    )

    import numpy as np

    rng = np.random.default_rng(7)
    vals = rng.normal(100.0, 15.0, 4000).tolist()
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    got = {r["q"]: r["estimate"] for r in histogram_quantiles(df, "x").collect()}
    bin_w = (max(vals) - min(vals)) / 128
    for q in (0.25, 0.5, 0.75, 0.9, 0.99):
        exact = float(np.quantile(vals, q))
        assert abs(got[q] - exact) <= bin_w + 1e-9, (q, got[q], exact, bin_w)


def test_row_minhash_bands_match_grouped_pipeline(spark):
    """The shuffle-free per-row band computation must be bit-identical
    to the groupBy signature pipeline it mirrors."""
    rows = [
        (0, "the quick brown fox jumps over the lazy dog today"),
        (1, "spark native analytics engine over parquet tables"),
        (2, "the quick brown fox jumps over the lazy cat today"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    grouped = {
        (r["doc_id"], r["band_id"], r["band_val"])
        for r in DD.minhash_bands(
            DD.minhash_signatures_wide(DD.shingle_table(df, "doc_id", "text"))
        ).collect()
    }
    rowwise = {
        (r["doc_id"], r["band_id"], r["band_val"])
        for r in df.select(
            "doc_id",
            F.posexplode(DD.row_minhash_bands(F.col("text"))).alias(
                "band_id", "band_val"
            ),
        ).collect()
    }
    assert rowwise == grouped


def test_pagerank_hand_case(spark):
    """Path graph a-b-c: the middle node collects mass from both ends;
    symmetry forces rank(a) == rank(c); ranks sum to ~1."""
    from iot_sensor_log_data_pipeline_spark.operators.graph import pagerank_fixed

    edges = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    got = {r["node"]: r["rank"] for r in pagerank_fixed(edges).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1] == got[3]
    assert got[2] > got[1]
    assert abs(sum(got.values()) - 1.0) < 1e-3


def test_pq_adc_recall_against_exact_l2(spark, sf_dir):
    """The production PQ path (Lloyd-refined 256-code codebooks + exact
    re-rank of the ADC top-100 -- the exact configuration bench
    measures) must recover most of the exact squared-L2 top-10.
    Measured 1.0 at sf0.001 and 0.94 at sf0.1; floor at 0.85 so a
    quantizer regression fails CI instead of only moving the bench
    recall number."""
    import numpy as np

    from iot_sensor_log_data_pipeline_spark.io_utils import load

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    approx = SIM.pq_adc_topk(
        emb,
        queries,
        k=10,
        n_codes=256,
        codebooks=SIM.pq_codebooks(emb, m=8, k=256),
        rerank=100,
    )
    got = {
        (r["query_id"], r["neighbor_id"]) for r in approx.collect()
    }

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.vstack([np.asarray(r["embedding"], dtype="float64") for r in rows])
    exact = set()
    for q in range(5):
        qv = X[ids == q][0]
        d2 = ((X - qv) ** 2).sum(axis=1)
        order = [
            int(ids[i])
            for i in np.lexsort((ids, d2))
            if int(ids[i]) != q
        ][:10]
        exact.update((q, n) for n in order)
    recall = len(got & exact) / len(exact)
    assert recall >= 0.85, recall


def _py_bpe_merges(texts: list[str], n_merges: int) -> list[tuple]:
    """Reference BPE (Sennrich et al. 2016) on the word-frequency
    table with greedy left-to-right merge application."""
    from collections import Counter

    vocab = Counter()
    for t in texts:
        for w in t.split():
            if w:
                vocab[w] += 1
    words = {w: list(w) for w in vocab}
    out = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += vocab[w]
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((rank, f"{a} {b}", a + b, cnt))
        for w, syms in words.items():
            ns, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            words[w] = ns
    return out


def test_bpe_merges_match_python_reference(spark):
    from iot_sensor_log_data_pipeline_spark.operators.bpe import bpe_merges

    texts = [
        "aaaa banana banana bandana",
        "low lower lowest low low",
        "aaaa aaaa abab abab abab",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = [
        (r["merge_rank"], r["pair"], r["merged"], r["cnt"])
        for r in bpe_merges(df, n_merges=5).orderBy("merge_rank").collect()
    ]
    assert got == _py_bpe_merges(texts, 5)


def test_bpe_merge_pair_handles_runs(spark):
    """Greedy single-pass semantics on runs: 'a a a a' + (a,a) -> 'aa aa',
    'a a a' -> 'aa a' -- the case naive regex replacement gets wrong."""
    from iot_sensor_log_data_pipeline_spark.operators.bpe import chars, merge_pair

    df = spark.createDataFrame([("aaaa",), ("aaa",), ("ababab",)], "w string")
    got = {
        r["w"]: list(r["m"])
        for r in df.select(
            "w", merge_pair(chars(F.col("w")), "a", "a", "aa").alias("m")
        ).collect()
    }
    assert got["aaaa"] == ["aa", "aa"]
    assert got["aaa"] == ["aa", "a"]
    assert got["ababab"] == ["a", "b", "a", "b", "a", "b"]


def test_dhash64_properties(spark):
    from iot_sensor_log_data_pipeline_spark.operators.multimodal import dhash64

    texts = [
        (0, "the quick brown fox jumps over the lazy dog" * 4),
        (1, "the quick brown fox jumps over the lazy dog" * 4),  # identical
        (2, "zzz completely different content qqq xxx yyy" * 4),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r["doc_id"]: r["h"]
        for r in df.select(
            "doc_id", dhash64(F.encode(F.col("text"), "UTF-8")).alias("h")
        ).collect()
    }
    assert all(len(h) == 64 and set(h) <= {"0", "1"} for h in got.values())
    assert got[0] == got[1]  # identical blobs -> identical hash
    assert got[0] != got[2]  # different content -> different hash


def test_bpe_merges_match_reference_hypothesis(spark):
    """Property: the DataFrame BPE rounds equal reference BPE on random
    small corpora -- exercises count ties (lexicographic break), runs
    of repeated symbols, and merge-then-remerge chains."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from iot_sensor_log_data_pipeline_spark.operators.bpe import bpe_merges

    word = st.text(alphabet="ab", min_size=1, max_size=6)

    @settings(max_examples=6, deadline=None)
    @given(st.lists(st.lists(word, min_size=1, max_size=6), min_size=1, max_size=4))
    def run(corpus):
        texts = [" ".join(ws) for ws in corpus]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = [
            (r["merge_rank"], r["pair"], r["merged"], r["cnt"])
            for r in bpe_merges(df, n_merges=4).orderBy("merge_rank").collect()
        ]
        assert got == _py_bpe_merges(texts, 4)

    run()


def test_grouped_hll_estimates_within_bounds(spark, sf_dir):
    """Per-group HLL estimates must land within ~3 standard errors
    (sigma ~ 1.04/sqrt(256) ~ 6.5%) of exact per-group distinct counts."""
    from iot_sensor_log_data_pipeline_spark.io_utils import load
    from iot_sensor_log_data_pipeline_spark.operators import sketch as SK
    from iot_sensor_log_data_pipeline_spark.operators import text as TX2

    docs = load(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(TX2.tokens(F.col("text"))).alias("token"))
    regs = SK.hll_registers(toks, "token", group_cols=("source",))
    est = {
        r["source"]: r["est_distinct"]
        for r in SK.hll_estimate(regs, group_cols=("source",)).collect()
    }
    exact = {
        r["source"]: r["n"]
        for r in toks.groupBy("source")
        .agg(F.countDistinct("token").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for src, n in exact.items():
        assert abs(est[src] - n) / n <= 0.2, (src, est[src], n)


def test_histogram_quantiles_error_bound_hypothesis(spark):
    """Property: for any value distribution (uniform, clustered,
    heavy-tailed -- whatever hypothesis draws), every histogram-sketch
    quantile estimate lands within one bin width of the exact
    quantile."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from iot_sensor_log_data_pipeline_spark.operators.sketch import (
        histogram_quantiles,
    )

    @settings(max_examples=5, deadline=None)
    @given(
        st.lists(
            st.floats(
                min_value=-1e6,
                max_value=1e6,
                allow_nan=False,
                allow_infinity=False,
            ),
            min_size=20,
            max_size=300,
        )
    )
    def run(vals):
        import math

        df = spark.createDataFrame([(float(v),) for v in vals], "x double")
        got = {r["q"]: r["estimate"] for r in histogram_quantiles(df, "x").collect()}
        lo, hi = min(vals), max(vals)
        bin_w = (hi - lo) / 128
        ordered = sorted(vals)
        for q in (0.25, 0.5, 0.75, 0.9, 0.99):
            # The estimator targets rank q*N with in-bin interpolation,
            # so its guarantee is against the ceil(q*N)-th ORDER
            # STATISTIC (not numpy's between-order-stats interpolation,
            # which can sit a whole value-gap away for tiny N).
            stat = ordered[min(math.ceil(q * len(vals)), len(vals)) - 1]
            assert abs(got[q] - stat) <= bin_w + 1e-6 * max(abs(lo), abs(hi), 1.0), (
                q, got[q], stat, bin_w,
            )

    run()


def test_pagerank_empty_edges(spark):
    from iot_sensor_log_data_pipeline_spark.operators.graph import pagerank_fixed

    edges = spark.createDataFrame([], "id_a long, id_b long")
    assert pagerank_fixed(edges).collect() == []

def test_persisted_lsh_index_matches_adhoc(spark, sf_dir, tmp_path):
    """Probing a persisted SRP-LSH index must be result-identical to
    the ad-hoc ``lsh_topk`` with the same hyperparameters -- the
    contract that lets the catalog's persisted-index query share the
    ad-hoc query's DuckDB oracle."""
    from iot_sensor_log_data_pipeline_spark.io_utils import load
    from iot_sensor_log_data_pipeline_spark.operators import ann_index as ANN

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    planes = SIM.hash_hyperplanes(64, dim=64)
    root = str(tmp_path / "lsh")
    ANN.build_lsh_index(emb, root, bands=16, rows_per_band=4, planes=planes)
    got = sorted(
        tuple(r) for r in ANN.query_lsh_index(spark, root, queries, k=10).collect()
    )
    want = sorted(
        tuple(r)
        for r in SIM.lsh_topk(
            emb, queries, k=10, bands=16, planes=planes
        ).collect()
    )
    assert got == want and len(got) > 0


def test_persisted_ivf_index_matches_adhoc(spark, sf_dir, tmp_path):
    """Same identity contract for the persisted IVF index (pinned seed
    quantizer, 2-way assignment, 4 probes)."""
    from iot_sensor_log_data_pipeline_spark.io_utils import load
    from iot_sensor_log_data_pipeline_spark.operators import ann_index as ANN

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    cents = SIM.seed_centroids(emb, 16)
    root = str(tmp_path / "ivf")
    ANN.build_ivf_index(emb, root, n_cells=16, n_assign=2, centroids=cents)
    got = sorted(
        tuple(r)
        for r in ANN.query_ivf_index(spark, root, queries, k=10, n_probe=4).collect()
    )
    want = sorted(
        tuple(r)
        for r in SIM.ivf_topk(
            emb, queries, k=10, n_cells=16, n_probe=4, n_assign=2, centroids=cents
        ).collect()
    )
    assert got == want and len(got) > 0


def test_persisted_pq_index_matches_adhoc_and_appends(spark, sf_dir, tmp_path):
    """(1) Probing a persisted PQ index is result-identical to the
    ad-hoc ``pq_adc_topk`` at the same seed codebooks / rerank (the
    shared-oracle contract); (2) appended vectors are encoded under
    the FROZEN codebooks and become findable; (3) an OPQ-rotated index
    returns the same neighbor ids/ranks as the ad-hoc
    ``opq_adc_topk``."""
    from iot_sensor_log_data_pipeline_spark.io_utils import load
    from iot_sensor_log_data_pipeline_spark.operators import ann_index as ANN

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    cbs = SIM.pq_seed_codebooks(emb, m=8, k=16)
    root = str(tmp_path / "pq")
    ANN.build_pq_index(emb, root, m=8, n_codes=16, codebooks=cbs)
    got = sorted(
        tuple(r)
        for r in ANN.query_pq_index(spark, root, queries, k=10, rerank=30).collect()
    )
    want = sorted(
        tuple(r)
        for r in SIM.pq_adc_topk(
            emb, queries, k=10, n_codes=16, codebooks=cbs, rerank=30
        ).collect()
    )
    assert got == want and len(got) > 0

    # append: a synthetic near-duplicate of query 0 must become its #1.
    q0 = [float(x) for x in emb.where("vec_id = 0").head()["embedding"]]
    new_id = 10_000_000
    extra = spark.createDataFrame(
        [(new_id, [x * 1.0001 for x in q0])], "vec_id long, embedding array<double>"
    )
    ANN.append_pq_index(extra, root)
    after = ANN.query_pq_index(spark, root, queries, k=10, rerank=30)
    top0 = after.where("query_id = 0 AND rank = 1").head()
    assert top0["neighbor_id"] == new_id

    # OPQ-rotated persisted index: same ids/ranks as the ad-hoc path.
    rot = SIM.opq_rotation(emb, m=8)
    root2 = str(tmp_path / "opq")
    ANN.build_pq_index(emb, root2, m=8, n_codes=16, rotation=rot)
    got2 = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in ANN.query_pq_index(
            spark, root2, queries, k=10, rerank=30
        ).collect()
    )
    # ad-hoc opq with the same quantizer: Lloyd-trained rotated-space
    # codebooks are the build default, so mirror with lloyd=True.
    want2 = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in SIM.opq_adc_topk(
            emb, queries, k=10, n_codes=16, rerank=30, lloyd=True
        ).collect()
    )
    assert got2 == want2 and len(got2) > 0


def test_persisted_index_kind_mismatch_raises(spark, sf_dir, tmp_path):
    from iot_sensor_log_data_pipeline_spark.io_utils import load
    from iot_sensor_log_data_pipeline_spark.operators import ann_index as ANN

    emb = load(spark, sf_dir, "embeddings")
    root = str(tmp_path / "lsh")
    ANN.build_lsh_index(emb, root, bands=4, rows_per_band=4)
    with pytest.raises(ValueError, match="not ivf"):
        ANN.query_ivf_index(spark, root, emb.limit(1), k=5)

def _py_semdedup(vecs: dict, cells: dict, threshold: float) -> set:
    """Pure-Python SemDeDup survivors: within-cell cosine pairs ->
    union-find components -> min-id survives."""
    import numpy as np

    parent = {i: i for i in vecs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = sorted(vecs)
    for i in ids:
        for j in ids:
            if i < j and cells[i] == cells[j]:
                a, b = np.asarray(vecs[i]), np.asarray(vecs[j])
                cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
                if cos >= threshold:
                    ra, rb = find(i), find(j)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    return {i for i in ids if find(i) == i}


def test_semantic_dedup_matches_python_reference(spark):
    """Clustered fixture with planted near-duplicates: the Spark
    SemDeDup pipeline (1-NN cell assignment -> within-cell pairs ->
    components -> min-id exemplar) must agree with a union-find
    reference given the same quantizer."""
    import numpy as np

    from iot_sensor_log_data_pipeline_spark.operators import semdedup as SD
    from iot_sensor_log_data_pipeline_spark.operators.similarity import (
        _top_cells_udf,
    )

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((4, 64)) * 8.0
    rows = []
    vid = 0
    for c in range(4):
        for _ in range(12):
            base = centers[c] + rng.standard_normal(64)
            rows.append((vid, [float(x) for x in base]))
            vid += 1
            if vid % 5 == 0:  # plant a near-duplicate of the row above
                dup = base + rng.standard_normal(64) * 0.01
                rows.append((vid, [float(x) for x in dup]))
                vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = SIM.kmeans_centroids(emb, 4, sample_size=64)

    got = {
        r["vec_id"]
        for r in SD.semantic_dedup(emb, 0.9, centroids=cents).collect()
    }
    # replay the same assignment driver-side for the reference
    assigned = emb.select(
        "vec_id", F.element_at(_top_cells_udf(cents, 1)(F.col("embedding")), 1).alias("cell")
    ).collect()
    cells = {r["vec_id"]: r["cell"] for r in assigned}
    vecs = {r[0]: r[1] for r in rows and [(i, v) for i, v in rows]}
    want = _py_semdedup(vecs, cells, 0.9)
    assert got == want
    assert len(got) < len(rows)  # the planted dups were removed


def test_semantic_pairs_cell_restriction_recall(spark):
    """The within-cell restriction must find every PLANTED near-
    duplicate pair: near-identical embeddings 1-NN-quantize to the
    same cell (the SemDeDup scalability argument -- the restriction's
    contract is near-dup recall, not recall of weakly-similar pairs,
    which legitimately straddle cell boundaries)."""
    import numpy as np

    from iot_sensor_log_data_pipeline_spark.operators import semdedup as SD

    rng = np.random.default_rng(23)
    centers = rng.standard_normal((6, 64)) * 8.0
    rows, planted = [], set()
    vid = 0
    for c in range(6):
        for _ in range(20):
            base = centers[c] + rng.standard_normal(64)
            rows.append((vid, [float(x) for x in base]))
            if vid % 4 == 0:  # plant a near-duplicate
                dup = base + rng.standard_normal(64) * 0.005
                rows.append((vid + 1, [float(x) for x in dup]))
                planted.add((vid, vid + 1))
                vid += 2
            else:
                vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = SIM.kmeans_centroids(emb, 6, sample_size=256)
    cell_pairs = {
        (r["id_a"], r["id_b"])
        for r in SD.semantic_pairs(emb, 0.9, cents).collect()
    }
    exact_pairs = {
        (r["id_a"], r["id_b"])
        for r in SIM.embedding_cosine_pairs(emb, 0.9, method="exact").collect()
    }
    assert cell_pairs <= exact_pairs  # no false pairs: same exact cosine
    assert planted <= exact_pairs  # fixture sanity: dups really are >= 0.9
    missed = planted - cell_pairs
    assert not missed, f"cell restriction lost planted near-dups: {missed}"

def test_bigram_logprob_matches_python(spark):
    """Bigram MLE scoring vs a hand-rolled reference on a tiny corpus."""
    import math
    from collections import Counter

    from iot_sensor_log_data_pipeline_spark.operators.text import bigram_logprob

    texts = {1: "a b a b c", 2: "a b", 3: "c c c", 4: "solo"}
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_logprob"]) for r in bigram_logprob(df).collect()}

    bigrams = {d: list(zip(t.split(), t.split()[1:])) for d, t in texts.items()}
    bn = Counter(b for bs in bigrams.values() for b in bs)
    cn = Counter(b[0] for bs in bigrams.values() for b in bs)
    for d, bs in bigrams.items():
        if not bs:
            assert d not in got  # <2 tokens: omitted
            continue
        want = sum(math.log(bn[b] / cn[b[0]]) for b in bs) / len(bs)
        assert got[d][0] == len(bs)
        assert abs(got[d][1] - round(want, 6)) < 1e-9, (d, got[d], want)


def test_mixture_weights_uniform_and_explicit(spark):
    from iot_sensor_log_data_pipeline_spark.operators.curation import (
        mixture_weights,
    )

    df = spark.createDataFrame(
        [(1, "web", "a b c d e f"), (2, "web", "a b"), (3, "books", "x y")],
        "doc_id long, source string, text string",
    )
    uni = {r["source"]: r for r in mixture_weights(df, "source").collect()}
    assert uni["web"]["n_tokens"] == 8 and uni["books"]["n_tokens"] == 2
    assert abs(uni["web"]["token_share"] - 0.8) < 1e-12
    # uniform target: each domain should hold 1/2 the tokens
    assert abs(uni["web"]["weight"] - 0.5 / 0.8) < 1e-12
    assert abs(uni["books"]["weight"] - 0.5 / 0.2) < 1e-12
    # weighted token mass matches the target mixture
    assert abs(
        uni["web"]["weight"] * 0.8 - uni["books"]["weight"] * 0.2
    ) < 1e-12

    exp = {
        r["source"]: r
        for r in mixture_weights(
            df, "source", target_shares={"web": 0.25, "books": 0.75}
        ).collect()
    }
    assert abs(exp["web"]["weight"] - 0.25 / 0.8) < 1e-12
    assert abs(exp["books"]["weight"] - 0.75 / 0.2) < 1e-12

def test_bpe_encode_expr_and_udf_agree_with_python(spark):
    """BPE APPLY: both the column-expression path and the Arrow-UDF
    path must reproduce a pure-Python sequential-merge reference when
    given merges learned by bpe_merges.  (For trained merge lists,
    sequential-by-rank application == greedy lowest-rank iteration:
    a pair involving a merge-created symbol is always learned later
    than the merge that created the symbol.)"""
    from iot_sensor_log_data_pipeline_spark.operators.bpe import (
        bpe_encode_expr,
        bpe_encode_udf,
        bpe_merges,
    )

    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    learned = [
        (r["pair"].split(" ")[0], r["pair"].split(" ")[1], r["merged"])
        for r in bpe_merges(df, n_merges=5).orderBy("merge_rank").collect()
    ]
    assert len(learned) == 5

    def py_encode(text: str) -> list[str]:
        out = []
        for w in text.split():
            syms = list(w)
            for a, b, m in learned:  # sequential by rank, greedy L2R
                new, i = [], 0
                while i < len(syms):
                    if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                        new.append(m)
                        i += 2
                    else:
                        new.append(syms[i])
                        i += 1
                syms = new
            out.extend(syms)
        return out

    want = {i: py_encode(t) for i, t in enumerate(texts)}
    got_expr = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode_expr(df, learned).collect()
    }
    got_udf = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode_udf(df, learned).collect()
    }
    assert got_expr == want
    assert got_udf == want
    # the merges actually fired (not trivially char-split output)
    assert any(len(t) > 1 for ts in got_expr.values() for t in ts)

def test_lsh_index_incremental_append(spark, sf_dir, tmp_path):
    """build(half) + append(other half) must probe identically to
    build(all) -- the daily-ingest maintenance contract."""
    from iot_sensor_log_data_pipeline_spark.io_utils import load
    from iot_sensor_log_data_pipeline_spark.operators import ann_index as ANN

    emb = load(spark, sf_dir, "embeddings")
    first, second = emb.where(F.col("vec_id") % 2 == 0), emb.where(
        F.col("vec_id") % 2 == 1
    )
    planes = SIM.hash_hyperplanes(32, dim=64)
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    ANN.build_lsh_index(first, inc, bands=8, rows_per_band=4, planes=planes)
    ANN.append_lsh_index(second, inc)
    ANN.build_lsh_index(emb, full, bands=8, rows_per_band=4, planes=planes)
    queries = emb.where(F.col("vec_id") < 5)
    got = sorted(
        tuple(r) for r in ANN.query_lsh_index(spark, inc, queries, k=10).collect()
    )
    want = sorted(
        tuple(r) for r in ANN.query_lsh_index(spark, full, queries, k=10).collect()
    )
    assert got == want and len(got) > 0

def test_hash_embedding_composes_with_semantic_dedup(spark):
    """hash_embedding -> semantic_pairs end-to-end: identical texts
    produce identical vectors (cosine 1.0) and surface as semantic
    near-dup pairs; unrelated texts do not."""
    from iot_sensor_log_data_pipeline_spark.operators import semdedup as SD
    from iot_sensor_log_data_pipeline_spark.operators.text import hash_embedding

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "completely different words entirely unrelated content here"),
            (4, "numbers one two three four five six seven eight nine"),
        ],
        "doc_id long, text string",
    )
    emb = hash_embedding(docs, dim=64)
    assert emb.count() == 4
    cents = SIM.kmeans_centroids(
        emb, 2, id_col="doc_id", vec_col="embedding", sample_size=16
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in SD.semantic_pairs(
            emb, 0.99, cents, id_col="doc_id", vec_col="embedding"
        ).collect()
    }
    assert set(pairs) == {(1, 2)}
    assert abs(pairs[(1, 2)] - 1.0) < 1e-9

def test_ngram_containment_catches_embedded_doc(spark):
    """A short doc embedded verbatim in a long doc: containment ~1.0
    even though Jaccard is low (the asymmetric case the operator
    exists for)."""
    short = "alpha beta gamma delta epsilon"
    long = short + " " + " ".join(f"filler{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, short), (2, long), (3, "zz yy xx ww vv uu")],
        "doc_id long, text string",
    )
    cont = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in DD.ngram_containment_pairs(df, threshold=0.9).collect()
    }
    assert set(cont) == {(1, 2)}
    assert abs(cont[(1, 2)] - 1.0) < 1e-9
    jac = DD.ngram_jaccard_pairs(df, threshold=0.5).collect()
    assert jac == []  # symmetric Jaccard misses the embedded pair

def test_persisted_text_index_matches_adhoc_bm25(spark, sf_dir, tmp_path):
    """BM25 from the persisted inverted index must be result-identical
    to the ad-hoc scan-side ranker -- the contract that lets the
    index-backed catalog query share the ad-hoc oracle."""
    from iot_sensor_log_data_pipeline_spark.io_utils import load
    from iot_sensor_log_data_pipeline_spark.operators import text_index as TI

    docs = load(spark, sf_dir, "documents")
    terms = ("spark", "join", "window")
    root = str(tmp_path / "text_idx")
    TI.build_text_index(docs, root)
    got = [tuple(r) for r in TI.query_text_index(spark, root, terms, k=15).collect()]
    want = [tuple(r) for r in TX.bm25_rank(docs, terms, k=15).collect()]
    assert got == want and len(got) > 0

def test_ivf_index_incremental_append(spark, sf_dir, tmp_path):
    """build(half) + append(other half) must probe identically to
    build(all) for the IVF index (quantizer pinned at build time)."""
    from iot_sensor_log_data_pipeline_spark.io_utils import load
    from iot_sensor_log_data_pipeline_spark.operators import ann_index as ANN

    emb = load(spark, sf_dir, "embeddings")
    cents = SIM.seed_centroids(emb, 16)
    first, second = emb.where(F.col("vec_id") % 2 == 0), emb.where(
        F.col("vec_id") % 2 == 1
    )
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    ANN.build_ivf_index(first, inc, n_cells=16, n_assign=2, centroids=cents)
    ANN.append_ivf_index(second, inc)
    ANN.build_ivf_index(emb, full, n_cells=16, n_assign=2, centroids=cents)
    queries = emb.where(F.col("vec_id") < 5)
    got = sorted(
        tuple(r)
        for r in ANN.query_ivf_index(spark, inc, queries, k=10, n_probe=4).collect()
    )
    want = sorted(
        tuple(r)
        for r in ANN.query_ivf_index(spark, full, queries, k=10, n_probe=4).collect()
    )
    assert got == want and len(got) > 0


def test_text_index_probe_prunes_terms_at_scan(spark, sf_dir, tmp_path):
    """The persisted-index BM25 probe must push the query-term filter
    into the postings parquet scan (PushedFilters: In(term, ...)) --
    the 100 TB property the index exists for."""
    import contextlib
    import io

    from iot_sensor_log_data_pipeline_spark.io_utils import load
    from iot_sensor_log_data_pipeline_spark.operators import text_index as TI

    docs = load(spark, sf_dir, "documents")
    root = str(tmp_path / "text_idx")
    TI.build_text_index(docs, root)
    probe = TI.query_text_index(spark, root, ("spark", "join", "window"), k=15)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probe.explain(mode="formatted")
    plan = buf.getvalue()
    pushed = [
        ln for ln in plan.splitlines() if "PushedFilters" in ln and "term" in ln
    ]
    assert pushed, f"term filter not pushed to postings scan:\n{plan[:2000]}"

def test_psi_drift_detects_planted_shift(spark):
    """PSI ~ 0 for identically-distributed snapshots; large for a
    planted mean shift (the monitoring semantics, not just the math)."""
    from iot_sensor_log_data_pipeline_spark.operators.profiling import psi_drift

    import numpy as np

    rng = np.random.default_rng(5)
    ref = spark.createDataFrame(
        [(float(x),) for x in rng.normal(100.0, 10.0, 4000)], "v double"
    )
    same = spark.createDataFrame(
        [(float(x),) for x in rng.normal(100.0, 10.0, 4000)], "v double"
    )
    shifted = spark.createDataFrame(
        [(float(x),) for x in rng.normal(130.0, 10.0, 4000)], "v double"
    )
    psi_same = psi_drift(ref, same, "v").agg(F.sum("psi_contrib")).collect()[0][0]
    psi_shift = psi_drift(ref, shifted, "v").agg(F.sum("psi_contrib")).collect()[0][0]
    assert psi_same < 0.1, psi_same          # stable
    assert psi_shift > 0.25, psi_shift       # investigate-level drift
    # NULLs on either side are excluded, not a crash or a bin
    with_nulls = spark.createDataFrame(
        [(None,), (100.0,), (None,), (105.0,)], "v double"
    )
    out = psi_drift(ref, with_nulls, "v")
    assert abs(out.agg(F.sum("share_cur")).collect()[0][0] - 1.0) < 1e-9

def test_histogram_quantiles_ignore_nulls(spark):
    """NULL values must be excluded from the sketch entirely (not form
    a NULL bin that skews the cumulative walk) -- estimates over a
    column with NULLs equal estimates over the same column with the
    NULL rows dropped."""
    from iot_sensor_log_data_pipeline_spark.operators.sketch import (
        histogram_quantiles,
    )

    vals = [float(x) for x in range(1, 101)]
    clean = spark.createDataFrame([(v,) for v in vals], "v double")
    dirty = spark.createDataFrame(
        [(v,) for v in vals] + [(None,)] * 37, "v double"
    )
    got_clean = sorted(tuple(r) for r in histogram_quantiles(clean, "v").collect())
    got_dirty = sorted(tuple(r) for r in histogram_quantiles(dirty, "v").collect())
    assert got_clean == got_dirty and len(got_clean) > 0

def test_blocked_levenshtein_pairs_semantics(spark):
    """Fuzzy matches only within a block and within the edit budget;
    cross-block near-names never compared (the blocking trade-off)."""
    df = spark.createDataFrame(
        [
            (1, "red widget"),
            (2, "ted widget"),   # dist 1, same block
            (3, "red gadget"),   # different block: never compared
            (4, "blue widget"),  # dist 3 from 'red widget': over budget
        ],
        "id long, name string",
    )
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in DD.blocked_levenshtein_pairs(df, "id", "name", max_dist=2).collect()
    }
    assert got == {(1, 2): 1}

def test_ngram_containment_matches_bruteforce_hypothesis(spark):
    """Property: ``ngram_containment_pairs`` reports exactly the pairs
    brute-force |A n B| / min(|A|, |B|) finds (cap at corpus size so
    nothing is pruned); containment >= jaccard always holds on the
    reported scores."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    words = ("alpha", "beta", "gamma", "delta", "epsilon", "zeta")

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.lists(st.sampled_from(words), min_size=3, max_size=12),
            min_size=2,
            max_size=8,
        )
    )
    def run(corpus):
        rows = [(i, " ".join(toks)) for i, toks in enumerate(corpus)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r["id_a"], r["id_b"]): r["containment"]
            for r in DD.ngram_containment_pairs(
                df, n=3, threshold=0.5, max_shingle_df=len(rows)
            ).collect()
        }

        def shingles(toks):
            return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

        expect = {}
        for a in range(len(corpus)):
            for b in range(a + 1, len(corpus)):
                sa, sb = shingles(corpus[a]), shingles(corpus[b])
                if not sa or not sb:
                    continue
                c = len(sa & sb) / min(len(sa), len(sb))
                j = len(sa & sb) / len(sa | sb)
                if c >= 0.5:
                    expect[(a, b)] = c
                    assert c >= j  # containment dominates jaccard
        assert set(got) == set(expect)
        for k, v in got.items():
            assert abs(v - expect[k]) < 1e-9

    run()

def test_mixture_weights_compose_with_weighted_sample(spark):
    """The documented composition: feed mixture weights into the
    weighted sampler and the drawn sample's domain mix moves toward
    the target (upsampled domain overrepresented relative to its
    corpus share)."""
    from iot_sensor_log_data_pipeline_spark.operators import curation as CU

    rows = []
    for i in range(400):
        rows.append((i, "web", "w " * 20))          # 400 docs, 20 tokens
    for i in range(400, 440):
        rows.append((i, "books", "b " * 20))        # 40 docs, 20 tokens
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    w = CU.mixture_weights(df, "source")
    weighted = df.join(w.select("source", "weight"), "source")
    sample = CU.weighted_sample(weighted, F.col("weight"), k=100)
    mix = {
        r["source"]: r["n"]
        for r in sample.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    corpus_books_share = 40 / 440
    sample_books_share = mix.get("books", 0) / 100
    assert sample_books_share > corpus_books_share  # books upsampled


def test_connected_components_string_ids(spark):
    """Non-integral node ids: the decimal-sum convergence witness is
    undefined (a string id casts to NULL), so the loop must fall back
    to the join-diff change check.  A 16-node string chain needs
    several propagation rounds -- under the broken witness it would
    return after one round with silently split components."""
    ids = [f"doc{i:02d}" for i in range(16)]
    edges = spark.createDataFrame(
        [(ids[i], ids[i + 1]) for i in range(15)], "id_a string, id_b string"
    )
    got = {
        r["node"]: r["component"]
        for r in DD.connected_components(edges).collect()
    }
    assert set(got) == set(ids)
    assert set(got.values()) == {"doc00"}


def test_connected_components_long_integer_chain(spark):
    """Integral ids keep the decimal-sum witness: a 32-node long chain
    (descending edges, so min-label must travel the whole chain)
    converges to a single component."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(31)], "id_a long, id_b long"
    )
    got = {
        r["node"]: r["component"]
        for r in DD.connected_components(edges).collect()
    }
    assert set(got) == set(range(32))
    assert set(got.values()) == {0}


def test_text_index_heavy_term_spans_partitions(spark, tmp_path):
    """Zipf-skew guard: a stopword-grade term's posting list must be
    SPLIT across output partitions (range partitioning on (term, id)),
    not hash-bucketed onto one straggler task/file."""
    from iot_sensor_log_data_pipeline_spark.operators import text_index as TI

    # 4000 docs all containing "the" (df ~ n_docs) + a light tail.
    rows = [(i, f"the unique{i} filler{i % 7}") for i in range(4000)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    root = str(tmp_path / "skew_idx")
    # explicit partition count: at test scale AQE would coalesce the
    # whole (tiny) shuffle to one partition; production leaves it None
    # and AQE splits by its advisory byte target instead.
    TI.build_text_index(docs, root, n_partitions=8)

    files = (
        spark.read.parquet(str(tmp_path / "skew_idx" / "postings"))
        .where(F.col("term") == "the")
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    assert files > 1, "heavy term landed in a single partition file"


def test_text_index_stop_term_cap(spark, tmp_path):
    """Corpus-relative df cap: a term in more than max_df_frac of the
    docs is dropped from the postings, recorded in stopterms/, and
    contributes zero at query time -- remaining terms score exactly
    like an uncapped index."""
    from iot_sensor_log_data_pipeline_spark.operators import text_index as TI

    rows = [(i, f"the widget{i % 5} tail{i}") for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    capped, plain = str(tmp_path / "capped"), str(tmp_path / "plain")
    TI.build_text_index(docs, capped, max_df_frac=0.5)
    TI.build_text_index(docs, plain)

    stop = {r["term"] for r in spark.read.parquet(capped + "/stopterms").collect()}
    assert stop == {"the"}
    assert (
        spark.read.parquet(capped + "/postings")
        .where(F.col("term") == "the")
        .count()
        == 0
    )
    # scoring on surviving terms is unchanged, and the stop term is a
    # zero contribution rather than an error
    got = [tuple(r) for r in TI.query_text_index(spark, capped, ("the", "widget0"), k=10).collect()]
    want = [tuple(r) for r in TI.query_text_index(spark, plain, ("widget0",), k=10).collect()]
    assert got == want and len(got) > 0
    # all-stop-term query degrades to empty, not a crash
    assert TI.query_text_index(spark, capped, ("the",), k=10).count() == 0


def test_semdedup_cell_cap_bounds_skewed_fixture(spark):
    """One balloon cluster must not make the within-cell self-join
    quadratic: with cell_cap on, recursive splitting bounds every
    cell's membership (so per-cell pair volume <= cap^2), while
    planted near-duplicates are still found within-cell."""
    import numpy as np

    from iot_sensor_log_data_pipeline_spark.operators import semdedup as SD

    rng = np.random.default_rng(31)
    centers = rng.standard_normal((3, 64)) * 10.0
    rows, planted = [], set()
    vid = 0
    # balloon cluster: 600 members; two small ones: 25 each
    for c, n_members in ((0, 600), (1, 25), (2, 25)):
        for j in range(n_members):
            base = centers[c] + rng.standard_normal(64)
            rows.append((vid, [float(x) for x in base]))
            if j % 10 == 0:
                dup = base + rng.standard_normal(64) * 0.003
                rows.append((vid + 1, [float(x) for x in dup]))
                planted.add((vid, vid + 1))
                vid += 2
            else:
                vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = SIM.kmeans_centroids(emb, 3, sample_size=256)

    from iot_sensor_log_data_pipeline_spark.operators.semdedup import (
        assign_nearest_cell,
        split_oversized_cells,
    )

    cap = 64
    unbounded_max = (
        assign_nearest_cell(emb, cents)
        .groupBy("cell").count().agg(F.max("count")).collect()[0][0]
    )
    assert unbounded_max > cap  # fixture really is skewed

    bounded = split_oversized_cells(assign_nearest_cell(emb, cents), cap)
    sizes = [r["count"] for r in bounded.groupBy("cell").count().collect()]
    assert max(sizes) <= cap, f"cell sizes after split: {sorted(sizes)[-5:]}"
    # spill multi-assigns a small band per cut: nobody lost, bounded dup
    assert bounded.select("id").distinct().count() == len(rows)
    assert len(rows) <= sum(sizes) <= int(1.5 * len(rows))

    got_pairs = {
        (r["id_a"], r["id_b"])
        for r in SD.semantic_pairs(emb, 0.95, cents, cell_cap=cap).collect()
    }
    missed = planted - got_pairs
    assert not missed, f"cell cap lost planted near-dups: {missed}"


def test_semdedup_quantizer_plan_bounded_for_any_corpus_size():
    """The default quantizer must stay driver-safe at ANY corpus size:
    n_cells and the Lloyd sample grow with N only up to constant caps
    (the round-5 verdict's scale cliff -- an uncapped default collected
    N/32 rows and ran a k~N/256 driver k-means)."""
    from iot_sensor_log_data_pipeline_spark.operators.semdedup import (
        DEFAULT_MAX_N_CELLS,
        DEFAULT_MAX_QUANTIZER_SAMPLE,
        DEFAULT_TARGET_CELL_SIZE,
        quantizer_plan,
    )

    # small corpora: paper regime, uncapped
    assert quantizer_plan(0) == (1, 2048)
    assert quantizer_plan(10_000) == (
        math.ceil(10_000 / DEFAULT_TARGET_CELL_SIZE),
        2048,
    )
    n_mid = 1_000_000
    cells_mid, sample_mid = quantizer_plan(n_mid)
    assert cells_mid == math.ceil(n_mid / DEFAULT_TARGET_CELL_SIZE)
    assert sample_mid == 8 * cells_mid

    # huge corpora (10^9 docs ~ 100 TB of text, and far beyond):
    # both outputs pinned at the constant caps
    for n in (10**9, 10**12, 10**15):
        cells, sample = quantizer_plan(n)
        assert cells == DEFAULT_MAX_N_CELLS
        assert sample == DEFAULT_MAX_QUANTIZER_SAMPLE
    # monotone: a bigger corpus never gets a SMALLER quantizer
    prev = (0, 0)
    for n in (0, 1, 10**3, 10**6, 10**9, 10**12):
        cur = quantizer_plan(n)
        assert cur >= prev
        prev = cur


def _py_maximal_runs(ta, tb, min_len):
    """All maximal common token runs >= min_len between token lists --
    O(n*m) diagonal walk, the brute-force oracle for verbatim_runs."""
    runs = set()
    for diag in range(-len(tb) + 1, len(ta)):
        i, j, run = max(0, diag), max(0, diag) - diag, 0
        while i <= len(ta) and j <= len(tb):
            if i < len(ta) and j < len(tb) and ta[i] == tb[j]:
                run += 1
            else:
                if run >= min_len:
                    runs.add((i - run, j - run, run))
                run = 0
            i += 1
            j += 1
    return runs


def test_verbatim_runs_match_bruteforce(spark):
    """Planted verbatim substrings: the anchor-join + diagonal-island
    operator must report exactly the maximal common runs >= min_len
    that an O(n*m) reference walk finds -- including two runs on the
    same diagonal and a run shared at different offsets."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(200)]

    def rand_toks(n):
        return [vocab[rng.randrange(len(vocab))] for _ in range(n)]

    shared20 = rand_toks(20)
    shared16 = rand_toks(16)
    shared10 = rand_toks(10)          # below min_len=15: must NOT appear
    d1 = rand_toks(30) + shared20 + rand_toks(5) + shared16 + rand_toks(10)
    d2 = rand_toks(10) + shared20 + rand_toks(25) + shared16 + rand_toks(3)
    d3 = rand_toks(40) + shared10 + rand_toks(12)
    d4 = shared10 + rand_toks(50)
    texts = {1: d1, 2: d2, 3: d3, 4: d4}
    docs = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in texts.items()], "doc_id long, text string"
    )

    k, min_len = 8, 15
    got = {
        (r["id_a"], r["id_b"], r["a_start"], r["b_start"], r["run_len"])
        for r in DD.verbatim_runs(docs, k=k, min_len=min_len).collect()
    }
    want = set()
    ids = sorted(texts)
    for x in ids:
        for y in ids:
            if x < y:
                for (sa, sb, ln) in _py_maximal_runs(texts[x], texts[y], min_len):
                    want.add((x, y, sa, sb, ln))
    assert got == want
    assert any(r[4] >= 20 for r in got)  # the 20-token plant was found
    assert not any(r[4] < min_len for r in got)


def test_graph_ann_recall_and_determinism(spark, tmp_path):
    """LSH-seeded NN-descent graph + beam search: recall@10 >= 0.9 vs
    brute force on a clustered fixture, and the persisted probe is
    deterministic across repeated runs (md5 planes, fixed rounds,
    node-id tiebreaks)."""
    import numpy as np

    from iot_sensor_log_data_pipeline_spark.operators import graph_ann as GA

    rng = np.random.default_rng(5)
    centers = rng.standard_normal((8, 64)) * 4.0
    rows = [
        (int(c * 100 + j), [float(x) for x in centers[c] + rng.standard_normal(64)])
        for c in range(8)
        for j in range(60)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.where(F.col("vec_id") % 100 < 2)  # 16 queries

    path = str(tmp_path / "graph_idx")
    GA.build_graph_index(emb, path)
    got1 = GA.query_graph_index(spark, path, queries, k=10).collect()
    got2 = GA.query_graph_index(spark, path, queries, k=10).collect()
    assert sorted(map(tuple, got1)) == sorted(map(tuple, got2))

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.brute_force_topk(emb, queries, k=10).collect()
    }
    approx = {(r["query_id"], r["neighbor_id"]) for r in got1}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"graph ANN recall {recall}"


def test_knn_graph_edges_are_true_neighbors(spark):
    """Every edge in the NN-descent graph must carry the exact cosine
    of its endpoints, and each node's list is its top-k among SCORED
    candidates (descending, id tiebreak) -- structural invariants the
    beam search relies on."""
    import numpy as np

    from iot_sensor_log_data_pipeline_spark.operators import graph_ann as GA

    rng = np.random.default_rng(9)
    rows = [(i, [float(x) for x in rng.standard_normal(64)]) for i in range(80)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    g = GA.knn_graph(emb, k=5).collect()
    # the column is array<float>: round the reference to float32 too
    vecs = {i: np.asarray(v, dtype="float32").astype("float64") for i, v in rows}
    per_src = {}
    for r in g:
        a, b = vecs[r["src"]], vecs[r["dst"]]
        want = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(r["score"] - want) < 1e-9
        per_src.setdefault(r["src"], []).append((r["score"], r["dst"]))
    for src, lst in per_src.items():
        assert len(lst) <= 5
        assert lst == sorted(lst, key=lambda t: (-t[0], t[1]))


def test_graph_geometry_derivation():
    """``graph_geometry`` (round 14): bench-scale behavior is pinned
    to the round-8 fixed defaults (the small-scale recall suite and
    the bench recall line must not move), the derived budget grows
    monotonically with N, and the measured round-14 operating points
    derive as documented."""
    from iot_sensor_log_data_pipeline_spark.operators import graph_ann as GA

    g6k = GA.graph_geometry(6000)
    assert g6k == {"seed": "lsh", "n_iter": 1, "beam": 32, "hops": 5}
    g50k = GA.graph_geometry(50_000)
    assert g50k["seed"] == "ivf" and g50k["n_iter"] == 0
    assert g50k["beam"] >= 64 and g50k["hops"] >= 10  # the measured-good point
    g200k = GA.graph_geometry(200_000)
    assert g200k == {"seed": "ivf", "n_iter": 0, "beam": 168, "hops": 14}
    prev_beam, prev_hops = 0, 0
    for n in (100, 3000, 20_000, 100_000, 1_000_000, 10_000_000):
        g = GA.graph_geometry(n)
        assert g["beam"] >= prev_beam and g["hops"] >= prev_hops, n
        prev_beam, prev_hops = g["beam"], g["hops"]
    # the threshold is exact: below it lsh, at it ivf
    assert GA.graph_geometry(GA.IVF_SEED_MIN_N - 1)["seed"] == "lsh"
    assert GA.graph_geometry(GA.IVF_SEED_MIN_N)["seed"] == "ivf"


def test_knn_graph_ivf_seed_invariants(spark):
    """The IVF-cogroup-seeded build (round 14) honors the same
    structural contract as the NN-descent build: deterministic across
    runs, exact-cosine edge scores (6 dp -- the cogroup join's
    contract), per-node lists bounded at k and sorted (score desc, id
    tiebreak), and edge recall >= 0.9 on a clustered fixture where
    cell-local exact scoring should be near-perfect."""
    import numpy as np

    from iot_sensor_log_data_pipeline_spark.operators import graph_ann as GA

    rng = np.random.default_rng(17)
    centers = rng.standard_normal((8, 64)) * 4.0
    rows = [
        (int(c * 100 + j), [float(x) for x in centers[c] + rng.standard_normal(64)])
        for c in range(8)
        for j in range(60)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    g1 = GA.knn_graph(emb, k=5, seed="ivf").collect()
    g2 = GA.knn_graph(emb, k=5, seed="ivf").collect()
    assert sorted(map(tuple, g1)) == sorted(map(tuple, g2))

    vecs = {i: np.asarray(v, dtype="float32").astype("float64") for i, v in rows}
    per_src = {}
    for r in g1:
        a, b = vecs[r["src"]], vecs[r["dst"]]
        want = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(r["score"] - want) < 5e-7  # round-6 cogroup contract
        assert r["src"] != r["dst"]
        per_src.setdefault(r["src"], []).append((r["score"], r["dst"]))
    for src, lst in per_src.items():
        assert len(lst) <= 5
        assert lst == sorted(lst, key=lambda t: (-t[0], t[1]))

    sample = emb.where(F.col("vec_id") % 100 < 10)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.brute_force_topk(emb, sample, k=5).collect()
    }
    got = {
        (r["src"], r["dst"])
        for r in g1
        if r["src"] % 100 < 10
    }
    recall = len(truth & got) / len(truth)
    assert recall >= 0.9, f"ivf-seeded edge recall {recall}"


def test_ivf_cogroup_join_max_cell_rows_caps_hot_cell(spark):
    """``ivf_cogroup_join(max_cell_rows=...)`` (round 14): a planted
    near-duplicate blob quantizes to ONE cell and would make that
    cell's cogroup matmul quadratic in the blob; the neighbor-side cap
    bounds it deterministically while every query still gets its k
    results (any cap's worth of blob members are interchangeable
    neighbors).  A cap below k refuses loudly."""
    import numpy as np

    rng = np.random.default_rng(23)
    hot = rng.standard_normal(64) * 5.0
    m = 300
    rows = [
        (i, [float(x) for x in hot + rng.standard_normal(64) * 1e-4])
        for i in range(m)
    ] + [
        (m + i, [float(x) for x in rng.standard_normal(64)])
        for i in range(100)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = SIM.kmeans_centroids(emb, 8)
    capped = SIM.ivf_cogroup_join(
        emb, emb, cents, k=5, n_probe=2, n_assign=1, max_cell_rows=32
    )
    counts = {
        r["query_id"]: r["n"]
        for r in capped.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert len(counts) == m + 100, "a capped cell must not strand queries"
    assert all(n == 5 for n in counts.values())
    # blob queries' neighbors all come from the deterministic capped
    # sample: <= 32 distinct blob members serve as neighbors in a cell
    blob_neighbors = {
        r["neighbor_id"]
        for r in capped.where(F.col("query_id") < m).collect()
        if r["neighbor_id"] < m
    }
    assert len(blob_neighbors) <= 33  # cap per cell (+1: blob spans 2 cells at most here)

    with pytest.raises(ValueError, match="max_cell_rows"):
        SIM.ivf_cogroup_join(
            emb, emb, cents, k=5, max_cell_rows=3
        )


def test_graph_index_config_persists_seed_and_corpus_size(spark, tmp_path):
    """Round-14 config columns: the build persists the resolved seed
    strategy and corpus size; the probe derives its beam/hop budget
    from them (bench-scale: unchanged round-8 budget), and
    ``optimize_graph_index`` refreshes the corpus size over an
    append-grown index so the derived budget tracks growth."""
    import numpy as np

    from iot_sensor_log_data_pipeline_spark.operators import graph_ann as GA
    from iot_sensor_log_data_pipeline_spark.operators.ann_index import _sub

    rng = np.random.default_rng(29)
    rows = [
        (i, [float(x) for x in rng.standard_normal(64)]) for i in range(60)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    path = str(tmp_path / "g_seedcfg")
    GA.build_graph_index(emb.where(F.col("vec_id") < 40), path, k=4)
    cfg = spark.read.parquet(_sub(path, "config")).collect()[0]
    assert cfg["seed"] == "lsh" and cfg["n_vectors"] == 40

    GA.append_graph_index(emb.where(F.col("vec_id") >= 40), path)
    GA.optimize_graph_index(spark, path)
    cfg2 = spark.read.parquet(_sub(path, "config")).collect()[0]
    assert cfg2["n_vectors"] == 60, "optimize must refresh the corpus size"
    assert cfg2["seed"] == "lsh"
    # derived-budget probe still serves (None beam/hops -> derived)
    assert GA.query_graph_index(spark, path, emb.limit(3), k=4).count() > 0


def test_lsh_seed_pairs_hot_bucket_is_linear_not_quadratic(spark):
    """A planted hot bucket (m near-identical vectors collide in every
    band) must seed <= bands * m * seed_cap pairs -- linear in the
    bucket -- not bands * m^2, AND still give EVERY member at least
    one seed edge (the hub-x-hub alternative strands m - seed_cap
    members entirely, collapsing dedup recall on exactly the
    dedup-heavy corpora that produce hot buckets)."""
    import numpy as np

    from iot_sensor_log_data_pipeline_spark.operators import graph_ann as GA
    from iot_sensor_log_data_pipeline_spark.operators.similarity import (
        _srp_bands_udf,
        hash_hyperplanes,
    )

    m, bands, rows_per_band, cap = 400, 16, 4, 4
    rng = np.random.default_rng(7)
    hot = rng.standard_normal(64) * 5.0
    rows = [
        (i, [float(x) for x in hot + rng.standard_normal(64) * 1e-4])
        for i in range(m)
    ]
    emb = spark.createDataFrame(rows, "id long, vec array<float>")
    planes = hash_hyperplanes(bands * rows_per_band, dim=64)
    bands_udf = _srp_bands_udf(planes, bands, rows_per_band)
    banded = emb.select(
        "id", F.posexplode(bands_udf(F.col("vec"))).alias("band_id", "bucket")
    )
    seeds = GA.lsh_seed_pairs(banded, seed_cap=cap)
    n_pairs = seeds.count()
    assert n_pairs <= bands * m * cap, f"{n_pairs} > {bands * m * cap}"
    assert n_pairs < m * (m - 1) / 2  # nowhere near the quadratic blowup
    # nobody stranded: every node appears as a seed src
    assert seeds.select("src").distinct().count() == m
    # and the built graph still links the near-identical blob: every
    # node ends with k true near-dup edges after refinement
    g = GA.knn_graph(
        emb, k=4, id_col="id", vec_col="vec", seed_cap=cap
    )
    degrees = {r["src"]: r["n"] for r in g.groupBy("src").count()
               .withColumnRenamed("count", "n").collect()}
    assert len(degrees) == m and min(degrees.values()) == 4


def test_remove_verbatim_spans_keeps_first_occurrence(spark):
    """Span removal: the lowest-doc-id copy of each shared run stays,
    every other copy is excised; overlapping spans merge; untouched
    docs pass through intact -- checked against a hand-built fixture
    with a three-way shared run."""
    import random

    rng = random.Random(13)
    vocab = [f"t{i}" for i in range(150)]
    rand = lambda n: [vocab[rng.randrange(len(vocab))] for _ in range(n)]  # noqa: E731

    shared = rand(20)
    d1 = rand(10) + shared + rand(10)   # keeper (lowest id)
    d2 = rand(5) + shared + rand(8)     # loses its copy
    d3 = shared + rand(30)              # loses its copy too
    d4 = rand(40)                       # untouched
    texts = {1: d1, 2: d2, 3: d3, 4: d4}
    docs = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in texts.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens_removed"])
        for r in DD.remove_verbatim_spans(docs, k=8, min_len=15).collect()
    }
    assert set(got) == {1, 2, 3, 4}
    assert got[1][0] == " ".join(d1) and got[1][1] == 0     # keeper intact
    assert got[4][0] == " ".join(d4) and got[4][1] == 0     # untouched
    assert got[2][1] == 20 and got[2][0] == " ".join(d2[:5] + d2[25:])
    assert got[3][1] == 20 and got[3][0] == " ".join(d3[20:])
    # the cleaned corpus has no cross-doc runs left among the losers
    cleaned = spark.createDataFrame(
        [(i, t) for i, (t, _) in got.items()], "doc_id long, text string"
    )
    leftover = DD.verbatim_runs(cleaned, k=8, min_len=15).where(
        (F.col("id_a") != 1) & (F.col("id_b") != 1)
    )
    assert leftover.count() == 0


def test_text_index_incremental_append(spark, sf_dir, tmp_path):
    """Append half the corpus to an index built on the other half:
    probing must be result-identical to a full rebuild (and to the
    ad-hoc BM25 scan over the union corpus)."""
    from iot_sensor_log_data_pipeline_spark.io_utils import load
    from iot_sensor_log_data_pipeline_spark.operators import text_index as TI

    docs = load(spark, sf_dir, "documents")
    first = docs.where(F.col("doc_id") % 2 == 0)
    second = docs.where(F.col("doc_id") % 2 == 1)
    terms = ("spark", "join", "window")

    inc, full = str(tmp_path / "inc_idx"), str(tmp_path / "full_idx")
    TI.build_text_index(first, inc)
    TI.append_text_index(second, inc)
    TI.build_text_index(docs, full)

    got = [tuple(r) for r in TI.query_text_index(spark, inc, terms, k=15).collect()]
    want = [tuple(r) for r in TI.query_text_index(spark, full, terms, k=15).collect()]
    adhoc = [tuple(r) for r in TX.bm25_rank(docs, terms, k=15).collect()]
    assert got == want == adhoc and len(got) > 0


def test_optimize_text_index_reprunes_drifted_terms(spark, tmp_path):
    """A term under the df cap at build time that drifts ABOVE it
    across appends keeps serving postings until optimize_text_index
    absorbs it into the stop-term table; after the re-prune, probes
    are result-identical to a fresh rebuild over the union corpus
    with the same (persisted) cap policy."""
    from iot_sensor_log_data_pipeline_spark.operators import text_index as TI

    schema = "doc_id long, text string"
    # 'common' appears in 3/6 build docs (df=3 <= cap=3); each append
    # batch adds 3 more 'common' docs, drifting its df to 9 > 3.
    build_docs = spark.createDataFrame(
        [
            (1, "common alpha beta"),
            (2, "common gamma delta"),
            (3, "common epsilon zeta"),
            (4, "eta theta iota"),
            (5, "kappa lam mu"),
            (6, "nu xi omicron"),
        ],
        schema,
    )
    more = [
        spark.createDataFrame(
            [
                (10 * b + 1, "common pi rho"),
                (10 * b + 2, "common sigma tau"),
                (10 * b + 3, "common upsilon phi"),
            ],
            schema,
        )
        for b in (1, 2)
    ]
    grown, fresh = str(tmp_path / "grown"), str(tmp_path / "fresh")
    TI.build_text_index(build_docs, grown, max_df=3)
    for batch in more:
        TI.append_text_index(batch, grown)

    terms = ("common", "alpha", "sigma")
    # Pre-optimize: the drifted term still serves its build-time postings.
    pre = TI.query_text_index(spark, grown, terms, k=20).collect()
    assert any(r["doc_id"] in (1, 2, 3) for r in pre)

    TI.optimize_text_index(spark, grown)

    union_docs = build_docs.unionByName(more[0]).unionByName(more[1])
    TI.build_text_index(union_docs, fresh, max_df=3)
    got = [tuple(r) for r in TI.query_text_index(spark, grown, terms, k=20).collect()]
    want = [tuple(r) for r in TI.query_text_index(spark, fresh, terms, k=20).collect()]
    assert got == want and len(got) > 0
    stopped = {
        r["term"]
        for r in spark.read.parquet(str(tmp_path / "grown" / "stopterms")).collect()
    }
    assert "common" in stopped
    # No posting rows for stopped terms survive the rewrite.
    n_left = (
        spark.read.parquet(str(tmp_path / "grown" / "postings"))
        .where(F.col("term") == "common")
        .count()
    )
    assert n_left == 0
    # Idempotent: a second optimize with nothing drifted is a no-op.
    TI.optimize_text_index(spark, grown)
    again = [tuple(r) for r in TI.query_text_index(spark, grown, terms, k=20).collect()]
    assert again == got


def test_optimize_ivf_index_rebalances_hot_cells(spark, tmp_path):
    """A skewed append fattens one inverted list under the frozen
    quantizer; optimize_ivf_index splits it to the cap (RP-tree
    median cuts), re-derives mean centroids for the touched cells
    only, and probe recall@10 does not regress."""
    import numpy as np

    from iot_sensor_log_data_pipeline_spark.operators import ann_index as AI

    rng = np.random.default_rng(7)
    centers = rng.standard_normal((4, 32)) * 6.0

    def cluster_rows(c, n, base):
        return [
            (base + j, [float(x) for x in centers[c] + rng.standard_normal(32)])
            for j in range(n)
        ]

    build_rows = sum((cluster_rows(c, 30, 1000 * c) for c in range(4)), [])
    emb = spark.createDataFrame(build_rows, "vec_id long, embedding array<float>")
    path = str(tmp_path / "ivf_opt")
    AI.build_ivf_index(emb, path, n_cells=4, n_assign=1, dim=32)

    # Skewed ingest: 170 more vectors, all in cluster 0's cell.
    hot = spark.createDataFrame(
        cluster_rows(0, 170, 5000), "vec_id long, embedding array<float>"
    )
    AI.append_ivf_index(hot, path)
    sizes = {
        int(r["cell"]): r["n"]
        for r in spark.read.parquet(path + "/entries")
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert max(sizes.values()) > 80  # the hot cell really is fat

    all_rows = build_rows + cluster_rows(0, 170, 5000)
    ids = np.array([i for i, _ in all_rows])
    mat = np.array([v for _, v in all_rows])
    queries = spark.createDataFrame(
        [all_rows[i] for i in range(0, len(all_rows), 17)],
        "vec_id long, embedding array<float>",
    )

    def recall_at_10():
        got = {}
        for r in AI.query_ivf_index(spark, path, queries, k=10, n_probe=2).collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        total, hit = 0, 0
        for qid, nbrs in got.items():
            qv = mat[ids == qid][0]
            sims = (mat @ qv) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(qv))
            order = ids[np.argsort(-sims)]
            truth = {int(x) for x in order[order != qid][:10]}
            hit += len(nbrs & truth)
            total += 10
        return hit / total

    before = recall_at_10()
    AI.optimize_ivf_index(spark, path, cell_cap=80)
    sizes_after = [
        r["n"]
        for r in spark.read.parquet(path + "/entries")
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert max(sizes_after) <= 80, sizes_after
    after = recall_at_10()
    assert after >= before - 0.05, (before, after)
    # Re-running with nothing oversized is a no-op.
    AI.optimize_ivf_index(spark, path, cell_cap=80)
    assert after == recall_at_10()


def test_graph_index_config_round_trips_build_geometry(spark, tmp_path):
    """Non-default build geometry (bands, rows_per_band, seed_cap,
    build_k) is persisted in the index config and survives an append
    (append's intra-batch NN-descent reads it back rather than using
    module defaults)."""
    import numpy as np

    from iot_sensor_log_data_pipeline_spark.operators import graph_ann as GA

    rng = np.random.default_rng(3)
    rows = [
        (i, [float(x) for x in rng.standard_normal(64)]) for i in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    path = str(tmp_path / "g_cfg")
    GA.build_graph_index(
        emb.where(F.col("vec_id") < 30),
        path,
        k=4,
        bands=8,
        rows_per_band=3,
        seed_cap=5,
        build_k=9,
    )
    cfg = spark.read.parquet(path + "/config").collect()[0]
    assert (cfg["bands"], cfg["rows_per_band"], cfg["seed_cap"], cfg["build_k"]) == (
        8, 3, 5, 9,
    )
    GA.append_graph_index(emb.where(F.col("vec_id") >= 30), path)
    GA.optimize_graph_index(spark, path)  # build_k now defaults from config
    hits = GA.query_graph_index(spark, path, emb.limit(3), k=4)
    assert hits.count() > 0


def test_graph_index_incremental_append(spark, tmp_path):
    """Append new vectors to a persisted k-NN graph: a planted
    near-duplicate of an appended point is found by a later probe,
    appended points are reachable as neighbors of existing queries,
    and recall on the union stays above the floor."""
    import numpy as np

    from iot_sensor_log_data_pipeline_spark.operators import graph_ann as GA

    rng = np.random.default_rng(21)
    centers = rng.standard_normal((4, 64)) * 4.0
    rows = [
        (int(c * 1000 + j), [float(x) for x in centers[c] + rng.standard_normal(64)])
        for c in range(4)
        for j in range(50)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    first = emb.where(F.col("vec_id") % 1000 < 40)
    second = emb.where(F.col("vec_id") % 1000 >= 40)

    path = str(tmp_path / "g_idx")
    GA.build_graph_index(first, path)
    GA.append_graph_index(second, path)

    queries = emb.where(F.col("vec_id") % 1000 < 2)
    got = GA.query_graph_index(spark, path, queries, k=10).collect()
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.brute_force_topk(emb, queries, k=10).collect()
    }
    approx = {(r["query_id"], r["neighbor_id"]) for r in got}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"post-append recall {recall}"
    # appended ids do appear as neighbors (reverse edges reachable)
    appended = {r[0] for r in second.select("vec_id").collect()}
    assert appended & {n for _, n in approx}


def test_graph_index_append_links_intra_batch_neighbors(spark, tmp_path):
    """A batch of mutual near-neighbors FAR from the indexed corpus
    must link to each other at append time (batch-local NN-descent),
    not wait for a rebuild: probing with one appended point returns
    its batch-mates (round-5 ADVICE recall gap)."""
    import numpy as np

    from iot_sensor_log_data_pipeline_spark.operators import graph_ann as GA

    rng = np.random.default_rng(33)
    base_rows = [
        (i, [float(x) for x in rng.standard_normal(64)]) for i in range(80)
    ]
    emb = spark.createDataFrame(base_rows, "vec_id long, embedding array<float>")
    path = str(tmp_path / "g_idx2")
    GA.build_graph_index(emb, path)

    far = rng.standard_normal(64) * 50.0  # nowhere near the base cloud
    batch_rows = [
        (1000 + j, [float(x) for x in far + rng.standard_normal(64) * 0.01])
        for j in range(12)
    ]
    batch = spark.createDataFrame(batch_rows, "vec_id long, embedding array<float>")
    GA.append_graph_index(batch, path)

    probe = batch.where(F.col("vec_id") == 1000)
    got = {
        r["neighbor_id"]
        for r in GA.query_graph_index(spark, path, probe, k=5).collect()
    }
    batch_ids = {i for i, _ in batch_rows} - {1000}
    assert got and got <= batch_ids, (
        f"appended cluster not linked intra-batch: got {got}"
    )
    assert len(got) == 5


def test_optimize_graph_index_matches_fresh_rebuild(spark, tmp_path):
    """Append-grown indexes degrade (touched nodes hold > k edges,
    appended nodes only have probe-derived lists); optimize re-prunes
    to exactly k, refines appended nodes' lists, and refreshes entry
    points -- probe results on appended-then-optimized must equal a
    fresh rebuild over the union."""
    import hashlib

    import numpy as np

    from iot_sensor_log_data_pipeline_spark.operators import graph_ann as GA

    rng = np.random.default_rng(51)
    centers = rng.standard_normal((5, 64)) * 6.0
    rows = [
        (int(c * 100 + j), [float(x) for x in centers[c] + rng.standard_normal(64) * 0.3])
        for c in range(5)
        for j in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    first = emb.where(F.col("vec_id") % 100 < 30)
    second = emb.where(F.col("vec_id") % 100 >= 30)

    path = str(tmp_path / "g_opt")
    GA.build_graph_index(first, path)
    GA.append_graph_index(second, path)
    from iot_sensor_log_data_pipeline_spark.operators.ann_index import _sub

    grown = spark.read.parquet(_sub(path, "graph"))
    max_deg_grown = grown.groupBy("src").count().agg(F.max("count")).collect()[0][0]
    assert max_deg_grown > GA.DEFAULT_K  # append really over-grew lists

    GA.optimize_graph_index(spark, path)
    pruned = spark.read.parquet(_sub(path, "graph"))
    max_deg = pruned.groupBy("src").count().agg(F.max("count")).collect()[0][0]
    assert max_deg == GA.DEFAULT_K
    # entry points refreshed over the UNION, md5-deterministic
    entries = {r["id"] for r in spark.read.parquet(_sub(path, "entries")).collect()}
    all_ids = sorted(
        (i for i, _ in rows),
        key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
    )
    assert entries == set(all_ids[:32])

    fresh = str(tmp_path / "g_fresh")
    GA.build_graph_index(emb, fresh)
    queries = emb.where(F.col("vec_id") % 100 < 2)
    got_opt = sorted(
        map(tuple, GA.query_graph_index(spark, path, queries, k=10).collect())
    )
    got_fresh = sorted(
        map(tuple, GA.query_graph_index(spark, fresh, queries, k=10).collect())
    )
    assert got_opt == got_fresh


def test_semantic_pairs_arrow_expr_twins(spark):
    """The BLAS-matmul pair scorer and the JVM-fold scorer must find
    the same pairs with scores agreeing to 1e-9 (gemm vs sequential
    summation), on float vectors where sums are NOT exact."""
    import numpy as np

    from iot_sensor_log_data_pipeline_spark.operators import semdedup as SD

    rng = np.random.default_rng(41)
    centers = rng.standard_normal((3, 64)) * 5.0
    rows = [
        (int(c * 100 + j), [float(x) for x in centers[c] + rng.standard_normal(64)])
        for c in range(3)
        for j in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = SIM.kmeans_centroids(emb, 3, sample_size=64)
    a = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in SD.semantic_pairs(emb, 0.5, cents).collect()
    }
    e = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in SD.semantic_pairs(emb, 0.5, cents, method="expr").collect()
    }
    assert set(a) == set(e) and len(a) > 0
    assert max(abs(a[k] - e[k]) for k in a) < 1e-9


def test_dsir_weights_match_python_reference(spark):
    """DSIR importance weights vs a hand-rolled reference: hashed
    unigram bucket models with add-1 smoothing, log-ratio summed per
    token occurrence; target-like docs must outscore off-target ones."""
    import hashlib
    import math
    from collections import Counter

    from iot_sensor_log_data_pipeline_spark.operators import curation as CU

    texts = {
        1: "alpha beta alpha gamma",
        2: "delta delta epsilon",
        3: "alpha beta beta",
        4: "zeta eta theta iota",
        5: "",
    }
    target_ids = {1, 3}
    B = 64
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    target = docs.where(F.col("doc_id").isin([1, 3]))
    got = {
        r["doc_id"]: (r["n_tokens"], r["log_weight"])
        for r in CU.dsir_weights(docs, target, n_buckets=B).collect()
    }

    def bucket(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % B

    raw = Counter(bucket(t) for s in texts.values() for t in s.split())
    tgt = Counter(
        bucket(t) for i in target_ids for t in texts[i].split()
    )
    rt, tt = sum(raw.values()) + B, sum(tgt.values()) + B
    for i, s in texts.items():
        toks = s.split()
        want = sum(
            math.log(((tgt[bucket(t)] + 1) / tt) / ((raw[bucket(t)] + 1) / rt))
            for t in toks
        )
        assert got[i][0] == len(toks)
        assert abs(got[i][1] - want) < 1e-9
    # target-like docs outrank the off-target doc
    assert got[1][1] > got[4][1] and got[3][1] > got[4][1]


def test_dsir_resample_equals_exp_weighted_aes_draw(spark):
    """The log-space Gumbel key must select EXACTLY the documents the
    direct Efraimidis-Spirakis draw with w = exp(log_weight) selects
    (monotone equivalence), and replay a pure-Python reference of the
    key itself -- plus it must survive log-weights far beyond the
    exp() overflow point, which the direct form cannot."""
    import hashlib
    import math

    from iot_sensor_log_data_pipeline_spark.operators import curation as CU

    texts = {
        i: " ".join(f"w{(i * 7 + j) % 13}" for j in range(3 + i % 5))
        for i in range(1, 25)
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    target = docs.where(F.col("doc_id") % 3 == 0)
    k = 8
    got = [
        (r["doc_id"], r["sample_key"])
        for r in CU.dsir_resample(docs, target, k=k, n_buckets=64).collect()
    ]

    lw = {
        r["doc_id"]: round(r["log_weight"], 6)
        for r in CU.dsir_weights(docs, target, n_buckets=64).collect()
    }

    def u_of(i):
        return (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) + 0.5) / 2**32

    # pure-Python replay of the log-space key
    keys = {i: round(math.log(-math.log(u_of(i))) - lw[i], 8) for i in texts}
    want = sorted(texts, key=lambda i: (keys[i], i))[:k]
    assert [i for i, _ in got] == want
    assert all(abs(s - keys[i]) < 1e-9 for i, s in got)
    # equivalence with the direct draw: top-k by ln(u)/exp(lw) DESC
    direct = sorted(
        texts, key=lambda i: (-math.log(u_of(i)) / math.exp(lw[i]), i)
    )[:k]
    assert set(want) == set(direct)


def test_leakage_safe_split_keeps_clusters_together(spark):
    """Every near-dup cluster must land entirely in ONE split; the
    fixture plants enough duplicate groups that plain per-doc hashing
    provably straddles at least one of them."""
    import random

    from iot_sensor_log_data_pipeline_spark.operators import curation as CU

    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(300)]
    rows, group_of = [], {}
    did = 0
    for g in range(40):  # 40 clusters of 3 near-identical docs
        base = [vocab[rng.randrange(300)] for _ in range(30)]
        for j in range(3):
            t = list(base)
            if j:
                t[rng.randrange(30)] = vocab[rng.randrange(300)]
            rows.append((did, " ".join(t)))
            group_of[did] = g
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = DD.ngram_jaccard_pairs(docs, threshold=0.4)
    got = {
        r["doc_id"]: (r["rep_id"], r["split"])
        for r in CU.leakage_safe_split(docs, pairs).collect()
    }
    assert set(got) == set(group_of)
    # (a) cluster-coherent: one split per group
    by_group = {}
    for d, (rep, sp) in got.items():
        by_group.setdefault(group_of[d], set()).add(sp)
    assert all(len(s) == 1 for s in by_group.values())
    # (b) plain per-doc hashing would straddle some group (the bug)
    naive = {
        r["doc_id"]: r["split"]
        for r in docs.select(
            "doc_id", CU.split_label("doc_id").alias("split")
        ).collect()
    }
    naive_by_group = {}
    for d, sp in naive.items():
        naive_by_group.setdefault(group_of[d], set()).add(sp)
    assert any(len(s) > 1 for s in naive_by_group.values())
    # (c) representative is the cluster min id
    for d, (rep, _) in got.items():
        assert group_of[rep] == group_of[d] and rep <= d


def test_semantic_decontamination_flags_paraphrase(spark):
    """A corpus doc that shares most tokens with a benchmark doc (a
    'paraphrase' with no 8-gram overlap after reordering) must be
    flagged by the embedding pass even though verbatim n-gram overlap
    misses it."""
    from iot_sensor_log_data_pipeline_spark.operators import curation as CU

    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    # same bag of tokens, shuffled: zero shared 8-grams, cosine 1.0
    para = "kappa iota theta eta zeta epsilon delta gamma beta alpha"
    clean = "one two three four five six seven eight nine ten"
    bench = spark.createDataFrame([(100, bench_text)], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(1, para), (2, clean)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["bench_id"], r["cos_sim"])
        for r in CU.semantic_contaminated_docs(corpus, bench, threshold=0.9).collect()
    }
    assert set(got) == {1} and got[1][0] == 100 and got[1][1] > 0.99
    # the verbatim 8-gram pass misses the reordered copy
    ngram = CU.contaminated_docs(corpus, bench, n=8)
    assert ngram.count() == 0


def test_connected_components_matches_unionfind_hypothesis(spark):
    """Property: pointer-jumping connected components equals a plain
    union-find on random edge lists -- for BOTH integral ids (decimal
    sum witness) and string ids (join-diff witness)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=6, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 14), st.integers(0, 14)).filter(
                lambda t: t[0] != t[1]
            ),
            min_size=1,
            max_size=25,
        )
    )
    def run(edges):
        # union-find reference
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want_int = {n: find(n) for n in parent}

        df_int = spark.createDataFrame(edges, "id_a long, id_b long")
        got_int = {
            r["node"]: r["component"]
            for r in DD.connected_components(df_int).collect()
        }
        assert got_int == want_int

        # string twin: same topology, lexicographic min must agree with
        # numeric min because of the zero-padded encoding
        enc = lambda x: f"n{x:02d}"  # noqa: E731
        df_str = spark.createDataFrame(
            [(enc(a), enc(b)) for a, b in edges], "id_a string, id_b string"
        )
        got_str = {
            r["node"]: r["component"]
            for r in DD.connected_components(df_str).collect()
        }
        assert got_str == {enc(n): enc(c) for n, c in want_int.items()}

    run()


def test_verbatim_runs_matches_bruteforce_hypothesis(spark):
    """Property: anchor-join + diagonal islands reports EXACTLY the
    maximal common runs >= min_len that the O(n*m) diagonal walk
    finds, on random corpora with planted shared blocks (cap disabled
    at corpus size so nothing is pruned)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    words = [f"v{i}" for i in range(12)]

    @settings(max_examples=6, deadline=None)
    @given(
        st.lists(
            st.lists(st.sampled_from(words), min_size=6, max_size=30),
            min_size=2,
            max_size=4,
        ),
        st.lists(st.sampled_from(words), min_size=6, max_size=10),
        st.booleans(),
    )
    def run(corpus, block, plant):
        texts = {}
        for i, toks in enumerate(corpus):
            t = list(toks)
            if plant and i < 2:  # plant the shared block in two docs
                t = t[: len(t) // 2] + block + t[len(t) // 2 :]
            texts[i] = t
        df = spark.createDataFrame(
            [(i, " ".join(t)) for i, t in texts.items()],
            "doc_id long, text string",
        )
        k, min_len = 4, 5
        got = {
            (r["id_a"], r["id_b"], r["a_start"], r["b_start"], r["run_len"])
            for r in DD.verbatim_runs(
                df,
                k=k,
                min_len=min_len,
                max_gram_df=len(texts),
                # the df cap alone still derives an occurrence cap of
                # 4 * max_gram_df, which highly repetitive generated
                # docs (one word repeated 30x) can exceed -- lift it
                # explicitly so NOTHING is pruned, as the brute-force
                # oracle below assumes
                max_gram_occurrences=10**9,
            ).collect()
        }
        want = set()
        ids = sorted(texts)
        for x in ids:
            for y in ids:
                if x < y:
                    for sa, sb, ln in _py_maximal_runs(
                        texts[x], texts[y], min_len
                    ):
                        want.add((x, y, sa, sb, ln))
        assert got == want

    run()


def test_ccnet_buckets_replay_python_ntile(spark):
    """CCNet head/middle/tail: per-language ntile over the rounded
    unigram-LM score must match a pure-Python replay (equal-count
    buckets, larger first, score-then-id order), and head docs must
    outscore tail docs within every language."""
    from iot_sensor_log_data_pipeline_spark.operators import text as TX

    rows = []
    did = 0
    for lang, n in (("en", 7), ("de", 5)):
        for j in range(n):
            # common words repeat; rare words make later docs less probable
            toks = ["the"] * (8 - j % 8) + [f"{lang}rare{did}"] * (1 + j % 4)
            rows.append((did, " ".join(toks), lang))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        r["doc_id"]: (r["lang"], r["avg_logprob"], r["bucket"])
        for r in TX.ccnet_buckets(docs).collect()
    }
    assert len(got) == len(rows)

    def py_ntile(items, n):
        # SQL NTILE: sizes differ by at most 1, larger buckets first
        m = len(items)
        base, extra = divmod(m, n)
        out, pos = {}, 0
        for b in range(1, n + 1):
            size = base + (1 if b <= extra else 0)
            for it in items[pos : pos + size]:
                out[it] = b
            pos += size
        return out

    names = {1: "head", 2: "middle", 3: "tail"}
    for lang in ("en", "de"):
        members = sorted(
            (i for i in got if got[i][0] == lang),
            key=lambda i: (-got[i][1], i),
        )
        want = py_ntile(members, 3)
        for i in members:
            assert got[i][2] == names[want[i]], (lang, i)
        head = [got[i][1] for i in members if got[i][2] == "head"]
        tail = [got[i][1] for i in members if got[i][2] == "tail"]
        assert min(head) >= max(tail)


def test_ngram_novelty_hand_fixture(spark):
    """Novelty = fraction of distinct 3-grams absent from the
    reference: a verbatim copy scores 0, fresh text scores 1, a
    half-copy lands exactly in between; sub-3-token docs report 0."""
    from iot_sensor_log_data_pipeline_spark.operators import text as TX

    ref = spark.createDataFrame(
        [(100, "a b c d e f")], "doc_id long, text string"
    )
    # grams in ref: "a b c","b c d","c d e","d e f"
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),     # all 4 grams known -> 0.0
            (2, "x y z w"),         # 2 grams, both novel -> 1.0
            (3, "a b c q"),         # "a b c" known, "b c q" novel -> 0.5
            (4, "a b"),             # < 3 tokens -> 0 grams, 0.0
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty"])
        for r in TX.ngram_novelty(docs, ref, n=3).collect()
    }
    assert got == {
        1: (4, 0, 0.0),
        2: (2, 2, 1.0),
        3: (2, 1, 0.5),
        4: (0, 0, 0.0),
    }


def test_temperature_mixture_limits_and_reference(spark):
    """alpha = 1 must reproduce the natural distribution (all weights
    1), alpha -> 0 the uniform target (mixture_weights' default), and
    alpha = 0.3 a pure-Python share^alpha normalization."""
    from iot_sensor_log_data_pipeline_spark.operators import curation as CU

    rows = []
    did = 0
    for src, n_docs, toks in (("a", 4, 20), ("b", 2, 5), ("c", 1, 2)):
        for _ in range(n_docs):
            rows.append((did, " ".join(["w"] * toks), src))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")

    for alpha in (1.0, 0.3, 1e-9):
        got = {
            r["source"]: (r["token_share"], r["target_share"], r["weight"])
            for r in CU.temperature_mixture_weights(docs, alpha=alpha).collect()
        }
        shares = {s: v[0] for s, v in got.items()}
        z = sum(sh**alpha for sh in shares.values())
        for s, (sh, tgt, w) in got.items():
            want_t = sh**alpha / z
            assert abs(tgt - want_t) < 1e-9, (alpha, s)
            assert abs(w - want_t / sh) < 1e-9, (alpha, s)
        if alpha == 1.0:
            assert all(abs(w - 1.0) < 1e-9 for _, _, w in got.values())
        if alpha == 1e-9:  # ~uniform target
            assert all(abs(t - 1 / 3) < 1e-6 for _, t, _ in got.values())


def test_nb_quality_classifier_python_reference(spark):
    """NB quality filter: logits must match a pure-Python add-1 NB
    replay (including the doc-count prior and the OOV constant), a
    curated-looking doc must score positive and a crawl-looking doc
    negative, and a fully-OOV doc must get n_tokens * oov + prior."""
    import math

    from iot_sensor_log_data_pipeline_spark.operators import text as TX

    pos_docs = ["good clean prose here", "clean good text prose"]
    neg_docs = ["spam spam buy now", "buy spam now now now"]
    train = spark.createDataFrame(
        [(True, t) for t in pos_docs] + [(False, t) for t in neg_docs],
        "is_positive boolean, text string",
    )
    score_rows = [
        (1, "good clean prose"),      # curated-looking
        (2, "spam buy now"),          # crawl-looking
        (3, "zzz qqq"),               # fully OOV
        (4, ""),                      # token-less: prior only
    ]
    docs = spark.createDataFrame(score_rows, "doc_id long, text string")
    model, stats = TX.nb_quality_model(train)
    got = {
        r["doc_id"]: (r["n_tokens"], r["nb_logit"], r["keep"])
        for r in TX.nb_quality_scores(docs, model, stats).collect()
    }

    # pure-Python replay
    from collections import Counter

    cpos, cneg = Counter(), Counter()
    for t in pos_docs:
        cpos.update(t.split())
    for t in neg_docs:
        cneg.update(t.split())
    vocab = set(cpos) | set(cneg)
    v, tp, tn = len(vocab), sum(cpos.values()), sum(cneg.values())
    prior = math.log(len(pos_docs) / len(neg_docs))
    oov = math.log((tn + v) / (tp + v))

    def ratio(term):
        if term not in vocab:
            return oov
        return math.log((cpos[term] + 1) / (tp + v)) - math.log(
            (cneg[term] + 1) / (tn + v)
        )

    for did, text in score_rows:
        toks = text.split()
        want = round(prior + sum(ratio(t) for t in toks), 6)
        n, logit, keep = got[did]
        assert n == len(toks), did
        assert abs(logit - want) < 1e-9, (did, logit, want)
        assert keep == (logit > 0), did
    assert got[1][2] is True and got[2][2] is False
    assert abs(got[3][1] - round(prior + 2 * oov, 6)) < 1e-9


def test_rp_ann_planted_clusters_and_exact_rerank(spark, sf_dir):
    """RP-ANN's contract (see rp_ann_topk docstring): when true
    neighbors are separated from the bulk by more than the JL noise
    (planted clusters, cos ~0.99 in-cluster vs ~0 across), the 8-dim
    prefilter + exact re-rank recovers the exact top-k; and on ANY
    corpus every returned pair's cos_sim equals the exact full-dim
    value (re-rank is exact, only the candidate set is approximate)."""
    import numpy as np

    rng = np.random.default_rng(7)
    centers = rng.standard_normal((10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for c in range(10):
        for m in range(12):
            v = centers[c] + 0.05 * rng.standard_normal(64)
            rows.append((c * 12 + m, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.where(F.col("vec_id").isin(0, 12, 24))  # one per cluster
    exact = SIM.brute_force_topk(emb, queries, k=10).collect()
    approx = SIM.rp_ann_topk(emb, queries, k=10, out_dim=8, oversample=4).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.9, f"RP-ANN planted-cluster recall: {recall}"
    # in-cluster neighbors dominate the result
    for r in approx:
        assert r["neighbor_id"] // 12 == r["query_id"] // 12

    # exact-re-rank property on the real corpus (recall not gated
    # there: its top-k gap is below the JL noise floor by design)
    emb2 = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q2 = emb2.where(F.col("vec_id") < 3)
    exact2 = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in SIM.brute_force_topk(emb2, q2, k=50).collect()
    }
    for r in SIM.rp_ann_topk(emb2, q2, k=10, out_dim=8, oversample=4).collect():
        key = (r["query_id"], r["neighbor_id"])
        if key in exact2:
            assert abs(r["cos_sim"] - exact2[key]) < 1e-9

    # projection replay: Spark sequential fold == NumPy matmul
    planes = np.asarray(SIM.projection_planes(8), dtype="float64")
    row = emb2.where(F.col("vec_id") == 0).select("embedding").head()
    want = planes @ np.asarray(list(row["embedding"]), dtype="float64")
    got = (
        emb2.where(F.col("vec_id") == 0)
        .select(SIM.project(F.col("embedding"), SIM.projection_planes(8)).alias("p"))
        .head()["p"]
    )
    assert np.allclose(np.asarray(got), want, atol=1e-9)


def test_token_budget_sample_python_replay(spark):
    """Budget fill must match a pure-Python greedy replay: per-source
    budgets = floor(total * share^alpha / Z), fill in md5(id) order,
    keep while the inclusive running total fits; no source exceeds its
    budget and every stopped source could not fit its next doc."""
    import hashlib
    import math

    from iot_sensor_log_data_pipeline_spark.operators import curation as CU

    rows, did = [], 0
    for src, n_docs, toks in (("a", 6, 40), ("b", 4, 10), ("c", 3, 25)):
        for _ in range(n_docs):
            rows.append((did, " ".join(f"w{i}" for i in range(toks)), src))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    total = 200
    got = {
        r["doc_id"]: (r["source"], r["n_tokens"], r["cum_tokens"], r["token_budget"])
        for r in CU.token_budget_sample(docs, total_tokens=total, alpha=0.3).collect()
    }

    ntok = {i: len(t.split()) for i, t, _ in rows}
    src_of = {i: s for i, _, s in rows}
    per = {}
    for i in ntok:
        per.setdefault(src_of[i], 0)
        per[src_of[i]] += ntok[i]
    tot_tokens = sum(per.values())
    z = sum((v / tot_tokens) ** 0.3 for v in per.values())
    budget = {
        s: math.floor(total * ((v / tot_tokens) ** 0.3) / z) for s, v in per.items()
    }
    want = {}
    for s in per:
        members = sorted(
            (i for i in ntok if src_of[i] == s),
            key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
        )
        cum = 0
        for i in members:
            cum += ntok[i]
            if cum <= budget[s]:
                want[i] = (s, ntok[i], cum, budget[s])
    assert got == want
    # no budget exceeded; each source stopped only when it had to
    for s in per:
        kept = sum(v[1] for v in want.values() if v[0] == s)
        assert kept <= budget[s]


def test_curation_funnel_hand_fixture(spark):
    """Each funnel stage must drop exactly the planted offenders, and
    stages must be cumulative (monotone non-increasing counts)."""
    from iot_sensor_log_data_pipeline_spark.operators import curation as CU

    good = "the quick brown fox jumps over a lazy dog near the riverbank today"
    rows = [
        (0, good, "en"),                                    # survives all
        (1, "bonjour le monde entier mes amis", "fr"),      # lang drop
        (2, "zz zz zz zz", "en"),                           # quality drop (alpha/diversity)
        (3, good + " spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam", "en"),  # repetition drop (dup 2-grams)
        (4, good, "en"),                                    # exact-dup drop (same text as 0)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        r["stage"]: (r["stage_id"], r["n_docs"], r["n_tokens"])
        for r in CU.curation_funnel(docs).collect()
    }
    assert got["input"][1] == 5
    assert got["language"][1] == 4          # doc 1 out
    assert got["quality"][1] <= 3           # doc 2 out
    assert got["exact_dedup"][1] == 1       # doc 4 out (dup of 0); 3 out earlier
    counts = [got[s][1] for s in ("input", "language", "quality", "repetition", "exact_dedup")]
    assert counts == sorted(counts, reverse=True)
    toks = [got[s][2] for s in ("input", "language", "quality", "repetition", "exact_dedup")]
    assert toks == sorted(toks, reverse=True)


def test_sq8_quantize_roundtrip_and_report(spark, sf_dir):
    """SQ8: codes are uint8-range ints matching a NumPy replay of the
    same min/max scale; per-dim max_abs_err from the report is
    bounded by scale/2 (+1 ulp slack); a constant dim codes to 0 with
    zero error."""
    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    stats_rows = sorted(
        (r["d"], r["dmin"], r["dmax"]) for r in SIM.sq8_stats(emb).collect()
    )
    codes = {
        r["vec_id"]: list(r["codes"])
        for r in SIM.scalar_quantize(emb, stats=stats_rows).collect()
    }
    lo = np.array([s[1] for s in stats_rows])
    hi = np.array([s[2] for s in stats_rows])
    scale = np.where(hi > lo, (hi - lo) / 255.0, 1.0)
    sample = emb.where(F.col("vec_id") < 20).collect()
    for r in sample:
        x = np.asarray(list(r["embedding"]), dtype="float64")
        want = np.clip(np.round((x - lo) / scale), 0, 255).astype(int)
        want = np.where(hi > lo, want, 0)
        got = np.asarray(codes[r["vec_id"]])
        assert ((got >= 0) & (got <= 255)).all()
        assert (got == want).all(), r["vec_id"]

    report = {r["d"]: r for r in SIM.sq8_error_report(emb).collect()}
    for d, dmin, dmax in stats_rows:
        sc = (dmax - dmin) / 255.0 if dmax > dmin else 0.0
        assert report[d]["max_abs_err"] <= sc / 2.0 + 1e-12, d
        assert report[d]["mse"] <= (sc / 2.0) ** 2 + 1e-12, d

    # constant dimension: codes 0, zero error
    const = spark.createDataFrame(
        [(1, [2.5, 1.0]), (2, [2.5, 3.0])], "vec_id long, embedding array<double>"
    )
    rep = {r["d"]: r for r in SIM.sq8_error_report(const).collect()}
    assert rep[0]["mse"] == 0.0 and rep[0]["max_abs_err"] == 0.0
    cc = {r["vec_id"]: list(r["codes"]) for r in SIM.scalar_quantize(const).collect()}
    assert cc[1][0] == 0 and cc[2][0] == 0


def test_embedding_drift_detects_shift(spark):
    """PSI over JL projections: identical snapshots give ~0 PSI per
    direction; a mean-shifted current snapshot drives PSI far above
    the 0.25 'investigate' band on at least one direction."""
    import numpy as np

    from iot_sensor_log_data_pipeline_spark.operators.profiling import (
        embedding_drift,
    )

    rng = np.random.default_rng(11)
    base = rng.standard_normal((200, 64))
    shifted = base + 3.0  # constant mean shift on every component
    mk = lambda arr, off: spark.createDataFrame(  # noqa: E731
        [(off + i, [float(x) for x in row]) for i, row in enumerate(arr)],
        "vec_id long, embedding array<double>",
    )
    ref = mk(base, 0)

    same = {r["d"]: r["psi"] for r in embedding_drift(ref, mk(base, 1000)).collect()}
    assert all(abs(v) < 1e-9 for v in same.values()), same

    drift = {
        r["d"]: r["psi"] for r in embedding_drift(ref, mk(shifted, 1000)).collect()
    }
    assert len(drift) == 4
    assert max(drift.values()) > 0.25, drift


def test_winnowing_guarantee_and_python_replay(spark):
    """Winnowing (k=4, w=4): fingerprints must match a pure-Python
    replay (min of each window of 4-gram md5-uint32 hashes), any
    shared token run of length >= w + k - 1 = 7 must yield >= 1 shared
    fingerprint (the MOSS guarantee), and unrelated docs share none."""
    import hashlib

    run = "alpha beta gamma delta epsilon zeta eta"  # 7 tokens
    rows = [
        (1, "one two three " + run + " four five six"),
        (2, run + " seven eight nine ten eleven"),
        (3, "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10"),
        (4, "a b"),  # below w + k - 1: no fingerprints
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in DD.winnowing_fingerprints(docs, k=4, w=4).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])

    def py_fps(text, k=4, w=4):
        t = text.split()
        grams = [" ".join(t[i : i + k]) for i in range(len(t) - k + 1)]
        hs = [
            int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams
        ]
        return {
            min(hs[i : i + w]) for i in range(len(hs) - w + 1)
        } if len(hs) >= w else set()

    for did, text in rows:
        assert got.get(did, set()) == py_fps(text), did
    assert got[1] & got[2], "shared 7-token run must share a fingerprint"
    assert not (got[1] & got[3]) and not (got[2] & got[3])
    assert 4 not in got

    pairs = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in DD.winnowing_pairs(docs, k=4, w=4, min_shared=1, max_fp_df=10).collect()
    }
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)] == len(got[1] & got[2])

    # Arrow path == pure-expression twin (the oracle's operand tree)
    expr = {}
    for r in DD.winnowing_fingerprints_expr(docs, k=4, w=4).collect():
        expr.setdefault(r["doc_id"], set()).add(r["fp"])
    assert expr == got


def test_winnowing_index_roundtrip(spark, tmp_path):
    """Persisted winnowing index: postings equal the in-flight
    stop-fp-pruned fingerprint table, config records the geometry,
    and the streaming gate probing the LOADED index flags the same
    pair as the DataFrame form."""
    run = "alpha beta gamma delta epsilon zeta eta"
    corpus = spark.createDataFrame(
        [(100, "intro words here " + run + " closing words follow"),
         (101, "a fully unrelated corpus document about something else")],
        "doc_id long, text string",
    )
    root = str(tmp_path / "win_idx")
    DD.build_winnowing_index(corpus, root, k=4, w=4, max_fp_df=10)
    postings, k, w = DD.load_winnowing_index(spark, root)
    assert (k, w) == (4, 4)
    want = {
        (r["doc_id"], r["fp"])
        for r in DD.winnowing_fingerprints(corpus, 4, 4).collect()
    }
    got = {(r["doc_id"], r["fp"]) for r in postings.collect()}
    assert got == want  # cap 10 prunes nothing on this tiny corpus


def test_winnowing_fingerprints_hypothesis(spark):
    """Property: for arbitrary small-vocab token lists, the Arrow
    fingerprint path equals the pure-Python winnowing replay exactly
    (min of every w-window of k-gram md5-uint32 hashes, distinct)."""
    import hashlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    words = ("alpha", "beta", "gamma", "delta", "epsilon")

    def py_fps(toks, k=3, w=3):
        if len(toks) < k + w - 1:
            return set()
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        hs = [int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams]
        return {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.lists(st.sampled_from(words), min_size=0, max_size=15),
            min_size=1,
            max_size=6,
        )
    )
    def run(corpus):
        rows = [(i, " ".join(toks)) for i, toks in enumerate(corpus)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {}
        for r in DD.winnowing_fingerprints(df, k=3, w=3).collect():
            got.setdefault(r["doc_id"], set()).add(r["fp"])
        for i, toks in enumerate(corpus):
            assert got.get(i, set()) == py_fps(toks), (i, toks)

    run()


def test_length_buckets_python_replay(spark):
    """Length buckets: assignment must match a pure-Python replay of
    the percentile-boundary rule (strict >), buckets must be ordered
    by token range, and pad_efficiency must equal sum/(n*max)."""
    from iot_sensor_log_data_pipeline_spark.operators import curation as CU

    lens = [3, 5, 5, 8, 12, 13, 20, 21, 40, 41, 42, 100]
    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(lens)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["bucket"]: (r["n_docs"], r["min_tokens"], r["max_tokens"],
                      r["sum_tokens"], r["pad_efficiency"])
        for r in CU.length_buckets(docs, n_buckets=4).collect()
    }

    import numpy as np

    bounds = np.quantile(np.array(lens, dtype=float), [0.25, 0.5, 0.75],
                         method="linear")
    want = {}
    for n in lens:
        b = int(sum(n > x for x in bounds))
        want.setdefault(b, []).append(n)
    assert set(got) == set(want)
    for b, members in want.items():
        n_docs, mn, mx, sm, eff = got[b]
        assert (n_docs, mn, mx, sm) == (
            len(members), min(members), max(members), sum(members)
        ), b
        assert abs(eff - round(sum(members) / (len(members) * max(members)), 6)) < 1e-9
    # ranges must not overlap across ordered buckets
    ordered = sorted(got)
    for a, b in zip(ordered, ordered[1:]):
        assert got[a][2] <= got[b][1]


def test_winnowing_index_append_matches_rebuild(spark, tmp_path):
    """Appending a batch to the winnowing index must equal a fresh
    rebuild over the union when no fingerprint crosses the cap; a
    fingerprint crossing the cap via the batch gains no new postings
    (cost-guard contract) while keeping its stored ones."""
    run = "alpha beta gamma delta epsilon zeta eta"
    base = spark.createDataFrame(
        [(1, "intro words here " + run + " closing words follow"),
         (2, "completely different base document about various topics")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(10, "prefix tokens " + run + " suffix tokens trailing"),
         (11, "another novel appended document with fresh content words")],
        "doc_id long, text string",
    )
    root = str(tmp_path / "win_append")
    DD.build_winnowing_index(base, root, k=4, w=4, max_fp_df=10)
    DD.append_winnowing_index(batch, root)
    appended = {
        (r["doc_id"], r["fp"])
        for r in DD.load_winnowing_index(spark, root)[0].collect()
    }
    rebuild_root = str(tmp_path / "win_rebuild")
    DD.build_winnowing_index(
        base.unionByName(batch), rebuild_root, k=4, w=4, max_fp_df=10
    )
    rebuilt = {
        (r["doc_id"], r["fp"])
        for r in DD.load_winnowing_index(spark, rebuild_root)[0].collect()
    }
    assert appended == rebuilt

    # cap-crossing fp: cap 2, three docs sharing the run
    root2 = str(tmp_path / "win_cap")
    DD.build_winnowing_index(base, root2, k=4, w=4, max_fp_df=2)
    big = spark.createDataFrame(
        [(20, "x1 x2 " + run + " y1 y2"), (21, "z1 z2 " + run + " q1 q2")],
        "doc_id long, text string",
    )
    DD.append_winnowing_index(big, root2)
    post2, _, _ = DD.load_winnowing_index(spark, root2)
    shared_fp = {
        r["fp"] for r in DD.winnowing_fingerprints(
            spark.createDataFrame([(0, run)], "doc_id long, text string"), 4, 4
        ).collect()
    }
    by_fp = {}
    for r in post2.collect():
        by_fp.setdefault(r["fp"], set()).add(r["doc_id"])
    for fp in shared_fp & set(by_fp):
        # stored posting for doc 1 remains; 20/21 never appended (1+2 > cap)
        assert by_fp[fp] <= {1, 2}, (fp, by_fp[fp])


def test_recursive_order_chain_equals_row_number(spark):
    """The recursive chain walk must reproduce per-customer
    row_number ordering on a hand fixture with ties broken by order
    key, and cover every order exactly once."""
    from datetime import datetime

    from iot_sensor_log_data_pipeline_spark.plans.relational_queries import (
        _RECURSIVE_CHAIN_SQL,
    )

    d = lambda s: datetime.fromisoformat(s)  # noqa: E731
    rows = [
        (101, 1, d("2024-01-03")), (102, 1, d("2024-01-01")),
        (103, 1, d("2024-01-02")), (104, 1, d("2024-01-02")),  # tie on date
        (201, 2, d("2024-02-01")),
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate timestamp"
    ).createOrReplaceTempView("orders")
    got = {
        (r["o_custkey"], r["chain_pos"]): r["o_orderkey"]
        for r in spark.sql(_RECURSIVE_CHAIN_SQL).collect()
    }
    assert got == {
        (1, 1): 102, (1, 2): 103, (1, 3): 104, (1, 4): 101,
        (2, 1): 201,
    }


def test_byte_entropy_replay_and_ordering(spark):
    """Byte entropy: the 16-bin histogram entropy must match a pure
    Python replay over the UTF-8 BYTES (multibyte chars count per
    byte, not per codepoint), single-character content scores 0, and
    byte-diverse content outscores plain lowercase text."""
    import math

    from iot_sensor_log_data_pipeline_spark.operators import multimodal as MM

    diverse = "".join(chr(c) for c in range(33, 127)) + "\u00e9\u00fc\u0153"
    rows = [
        (1, diverse),
        (2, "aaaaaaaaaaaa"),          # single bin -> entropy 0
        (3, "plain words of text"),   # a-z + space -> low entropy
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    feats = MM.extract_features(MM.attach_fake_media(docs))
    got = {}
    for r in feats.collect():
        h = list(r["byte_hist"])
        got[r["doc_id"]] = (
            -sum(p * math.log2(p) for p in h if p > 0), h, r["n_bytes"]
        )

    for did, text in rows:
        bs = text.encode("utf-8")
        want_h = [0.0] * 16
        for b in bs:
            want_h[b // 16] += 1.0 / len(bs)
        want_e = -sum(p * math.log2(p) for p in want_h if p > 0)
        ent, h, nb = got[did]
        assert nb == len(bs), did
        assert all(abs(a - b) < 1e-9 for a, b in zip(h, want_h)), did
        assert abs(ent - want_e) < 1e-9, did
    assert got[2][0] == 0.0
    assert got[1][0] > got[3][0] > 0.0

    from iot_sensor_log_data_pipeline_spark.plans.multimodal_queries import (
        multimodal_byte_entropy,  # noqa: F401  (import sanity)
    )


def test_rolling_actives_hand_fixture(spark):
    """DAU/WAU: the trailing-7-day distinct-user count must match a
    pure-Python replay on a fixture where users appear on scattered
    days (a user active twice in the window counts once)."""
    from datetime import datetime

    from iot_sensor_log_data_pipeline_spark.plans.relational_queries import (
        events_rolling_actives,
    )

    rows, eid = [], 0
    plan = {1: [1, 2, 9], 2: [1, 8, 9], 3: [9]}  # user -> active days
    for u, ds in plan.items():
        for d in ds:
            rows.append((eid, datetime(2024, 1, d, 12, 0, 0), u, "view", 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(f"{tmp}/events.parquet")
        got = {
            r["day"]: (r["dau"], r["wau"])
            for r in events_rolling_actives(spark, tmp).collect()
        }
    want = {}
    for d in sorted({d for ds in plan.values() for d in ds}):
        dau = sum(1 for ds in plan.values() if d in ds)
        wau = sum(1 for ds in plan.values() if any(d - 6 <= x <= d for x in ds))
        want[f"2024-01-{d:02d}"] = (dau, wau)
    assert got == want


def test_last_touch_attribution_hand_fixture(spark):
    """Attribution: the latest in-window click wins, ties break by
    click id, clicks after the purchase or older than the lookback
    never attribute, and unattributed purchases keep null click."""
    from datetime import datetime

    from iot_sensor_log_data_pipeline_spark.plans.relational_queries import (
        events_last_touch_attribution,
    )

    d = datetime
    rows = [
        # user 1: two clicks before purchase -> latest (id 3) wins
        (1, d(2024, 1, 2, 10, 0, 0), 1, "click", 0.0, "{}"),
        (3, d(2024, 1, 2, 11, 0, 0), 1, "click", 0.0, "{}"),
        (5, d(2024, 1, 2, 12, 0, 0), 1, "purchase", 9.0, "{}"),
        # user 2: only click is AFTER the purchase -> unattributed
        (7, d(2024, 1, 3, 12, 0, 0), 2, "purchase", 9.0, "{}"),
        (8, d(2024, 1, 3, 13, 0, 0), 2, "click", 0.0, "{}"),
        # user 3: click 25h before purchase -> outside lookback
        (9, d(2024, 1, 4, 0, 0, 0), 3, "click", 0.0, "{}"),
        (10, d(2024, 1, 5, 1, 0, 0), 3, "purchase", 9.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(f"{tmp}/events.parquet")
        got = {
            r["purchase_id"]: (r["click_id"], r["lag_seconds"])
            for r in events_last_touch_attribution(spark, tmp).collect()
        }
    assert got[5] == (3, 3600.0)
    assert got[7] == (None, None)
    assert got[10] == (None, None)


def test_rfm_segments_python_replay(spark, sf_dir):
    """RFM scores must match a pure-Python quartile replay (linear
    interpolation, strict-greater boundary rule, recency inverted)."""
    import numpy as np

    from iot_sensor_log_data_pipeline_spark.plans.relational_queries import (
        customer_rfm_segments,
    )

    got = {
        r["custkey"]: (r["recency_days"], r["frequency"], r["monetary"],
                       r["r_score"], r["f_score"], r["m_score"])
        for r in customer_rfm_segments(spark, sf_dir).collect()
    }
    rec = np.array([v[0] for v in got.values()], dtype=float)
    freq = np.array([v[1] for v in got.values()], dtype=float)
    mon = np.array([v[2] for v in got.values()], dtype=float)
    rb = np.quantile(rec, [0.25, 0.5, 0.75], method="linear")
    fb = np.quantile(freq, [0.25, 0.5, 0.75], method="linear")
    mb = np.quantile(mon, [0.25, 0.5, 0.75], method="linear")
    for ck, (r, f_, m, rs, fs, ms) in got.items():
        assert rs == 4 - int(sum(r > x for x in rb)), ck
        assert fs == 1 + int(sum(f_ > x for x in fb)), ck
        assert ms == 1 + int(sum(m > x for x in mb)), ck
    assert {v[3] for v in got.values()} <= {1, 2, 3, 4}


def test_optimize_winnowing_index_restores_cap(spark, tmp_path):
    """After appends drift a fingerprint above the cap, optimize drops
    ALL its postings (stored and appended), and the result equals a
    fresh rebuild over the union corpus."""
    run = "alpha beta gamma delta epsilon zeta eta"
    mk = lambda i, pre: (i, f"{pre}1 {pre}2 " + run + f" {pre}3 {pre}4")  # noqa: E731
    base = spark.createDataFrame([mk(1, "a"), mk(2, "b")], "doc_id long, text string")
    root = str(tmp_path / "win_opt")
    DD.build_winnowing_index(base, root, k=4, w=4, max_fp_df=2)
    batch = spark.createDataFrame([mk(10, "c"), mk(11, "d")], "doc_id long, text string")
    DD.append_winnowing_index(batch, root)
    DD.optimize_winnowing_index(spark, root)
    got = {
        (r["doc_id"], r["fp"])
        for r in DD.load_winnowing_index(spark, root)[0].collect()
    }
    rebuild_root = str(tmp_path / "win_opt_rebuild")
    DD.build_winnowing_index(
        base.unionByName(batch), rebuild_root, k=4, w=4, max_fp_df=2
    )
    want = {
        (r["doc_id"], r["fp"])
        for r in DD.load_winnowing_index(spark, rebuild_root)[0].collect()
    }
    assert got == want
    # the shared-run fps (df 2 stored, would-be 4 total) are gone
    shared = {
        r["fp"] for r in DD.winnowing_fingerprints(
            spark.createDataFrame([(0, run)], "doc_id long, text string"), 4, 4
        ).collect()
    }
    assert not shared & {fp for _, fp in got}


def test_contamination_scores_grades_and_keeps_clean_docs(spark):
    """contamination_scores vs a hand count: doc 1 has 3 of 11 shingles
    matched, doc 3 is a verbatim copy (3/3), doc 2 overlaps nothing but
    must still appear with score 0.0, doc 4 is too short to shingle
    (n_shingles 0) and must survive the explode_outer with frac 0."""
    from iot_sensor_log_data_pipeline_spark.operators import curation as CU

    leak = "q w e r t y u i o p"  # 10 tokens -> three 8-gram windows
    corpus = spark.createDataFrame(
        [
            (1, f"pad1 {leak} pad2"),  # 12 tokens -> 5 shingles, 3 matched
            (2, "c d e f g h i j k l"),  # 3 shingles, 0 matched
            (3, leak),  # 3 shingles, 3 matched
            (4, "too short"),  # < 8 tokens -> 0 shingles
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(99, f"intro {leak} outro")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in CU.contamination_scores(corpus, bench, n=8, threshold=0.5).collect()
    }
    assert set(rows) == {1, 2, 3, 4}
    assert rows[1]["n_shingles"] == 5 and rows[1]["n_matched"] == 3
    assert rows[1]["overlap_frac"] == 0.6 and rows[1]["contaminated"]
    assert rows[2]["n_matched"] == 0 and rows[2]["overlap_frac"] == 0.0
    assert rows[3]["n_matched"] == 3 and rows[3]["contaminated"]
    assert rows[4]["n_shingles"] == 0 and rows[4]["overlap_frac"] == 0.0


def test_gopher_keep_rules_individually(spark):
    """Each Gopher rule rejects its own violation and the clean doc
    passes all five -- per-rule hand fixtures, not just the conjunction."""
    good = (
        "the quick brown fox jumps over the lazy dog and then runs "
        "back home to rest in the warm sun for a while longer today"
    )  # 24 tokens, all alpha, stopword-rich
    fixtures = [
        (0, good, True),
        (1, "the cat sat on a mat", False),  # 6 tokens < 20
        (2, " ".join(["a"] * 30), False),  # mean token len 1 < 3
        (3, good + " !!!! #### $$$$ %%%% &&&& ****", False),  # symbols
        (4, "the of " + " ".join(str(i) for i in range(100, 125)), False),  # digits
        (5, " ".join(f"word{i}" for i in range(25)), False),  # no stopwords
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in fixtures], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["keep"]
        for r in df.select(
            "doc_id", TX.gopher_keep(F.col("text")).alias("keep")
        ).collect()
    }
    assert got == {i: want for i, _, want in fixtures}


def test_snapshot_diff_classification_and_null_safety(spark):
    """snapshot_diff hand case covering all four classes plus the
    null-safe compare in both directions (value->NULL and NULL->value
    are changes; NULL->NULL is not)."""
    from iot_sensor_log_data_pipeline_spark.operators.scd import snapshot_diff

    before = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", 20.0),
            (3, "c", 30.0),
            (4, None, 40.0),
            (5, None, 50.0),
        ],
        "k long, s string, v double",
    )
    after = spark.createDataFrame(
        [
            (1, "a", 10.0),  # unchanged
            (2, "B", 21.0),  # changed, 2 cols
            (4, "now-set", 40.0),  # NULL -> value: changed, 1 col
            (5, None, 50.0),  # NULL == NULL: unchanged
            (6, "new", 60.0),  # added
        ],  # key 3 removed
        "k long, s string, v double",
    )
    rows = {
        r["k"]: (r["change_type"], r["n_changed_cols"])
        for r in snapshot_diff(before, after, ["k"], ["s", "v"]).collect()
    }
    assert rows == {
        1: ("unchanged", 0),
        2: ("changed", 2),
        3: ("removed", 0),
        4: ("changed", 1),
        5: ("unchanged", 0),
        6: ("added", 0),
    }


def test_graph_index_legacy_config_appends_with_defaults(spark, tmp_path):
    """An index persisted with the pre-geometry 4-column config
    (kind, k, n_iter, n_entry) must keep appending and optimizing --
    the geometry falls back to module defaults (build_k = 2*k) instead
    of dying on a missing field."""
    import numpy as np

    from iot_sensor_log_data_pipeline_spark.operators import graph_ann as GA

    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.standard_normal(32)]) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    path = str(tmp_path / "g_legacy")
    GA.build_graph_index(emb.where(F.col("vec_id") < 20), path, k=4)

    # Rewrite the config as the legacy 4-column schema.
    import shutil

    cfg = spark.read.parquet(path + "/config").collect()[0]
    shutil.rmtree(path + "/config")
    spark.createDataFrame(
        [(cfg["kind"], cfg["k"], cfg["n_iter"], cfg["n_entry"])],
        "kind string, k int, n_iter int, n_entry int",
    ).coalesce(1).write.parquet(path + "/config")

    GA.append_graph_index(emb.where(F.col("vec_id") >= 20), path)
    GA.optimize_graph_index(spark, path)
    hits = GA.query_graph_index(spark, path, emb.limit(3), k=4)
    assert hits.count() > 0


def _py_weighted_simhash(texts: dict[int, str]) -> dict[int, str]:
    """Pure-Python replay of weighted_simhash64 (tf * N//df votes)."""
    from collections import Counter

    n = len(texts)
    tfs = {d: Counter(t.split()) for d, t in texts.items()}
    dfc = Counter()
    for c in tfs.values():
        for tok in c:
            dfc[tok] += 1
    out = {}
    for d, c in tfs.items():
        votes = [0] * 64
        for tok, tf in c.items():
            w = tf * (n // dfc[tok])
            bits = bin(int(hashlib.md5(tok.encode()).hexdigest()[:16], 16))[2:].zfill(64)
            for i, b in enumerate(bits):
                votes[i] += w if b == "1" else -w
        out[d] = "".join("1" if v > 0 else "0" for v in votes)
    return out


def test_weighted_simhash_matches_python_reference(spark):
    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "the quick brown dog sleeps under the old tree",
        3: "completely different payload tokens entirely here now",
        4: "the the the repeated stopword heavy doc here",
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: r["simhash"]
        for r in DD.weighted_simhash64(df).collect()
    }
    assert got == _py_weighted_simhash(texts)


def test_weighted_simhash_separates_boilerplate_twins(spark):
    """The design claim: on template-heavy docs the rare payload tokens
    (weight N//1 = N) outvote corpus-wide boilerplate (weight N//N = 1),
    so weighted fingerprints of payload-differing template twins are
    FARTHER apart than their unweighted ones."""
    boiler = "standard header block shared by every document"
    texts = {i: f"{boiler} unique{i}a unique{i}b" for i in range(8)}
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    weighted = {
        r["doc_id"]: r["simhash"] for r in DD.weighted_simhash64(df).collect()
    }
    unweighted = {
        r["doc_id"]: r["sh"]
        for r in df.select(
            "doc_id", DD.simhash64(F.col("text")).alias("sh")
        ).collect()
    }

    def ham(a, b):
        return sum(x != y for x, y in zip(a, b))

    pairs = [(i, j) for i in range(8) for j in range(i + 1, 8)]
    wavg = sum(ham(weighted[i], weighted[j]) for i, j in pairs) / len(pairs)
    uavg = sum(ham(unweighted[i], unweighted[j]) for i, j in pairs) / len(pairs)
    assert wavg > uavg, (wavg, uavg)
    assert wavg > 10  # payload genuinely dominates the fingerprint


def test_interval_overlap_join_matches_naive_and_emits_once(spark):
    """Bucketed interval join vs the naive theta join on a fixture that
    exercises: containment, partial overlap, endpoint touch, disjoint,
    and a pair overlapping across MANY shared buckets (the greatest-
    start bucket rule must emit it exactly once)."""
    from datetime import datetime

    from iot_sensor_log_data_pipeline_spark.operators.intervals import (
        interval_overlap_join,
    )

    def t(h, m=0):
        return datetime(2024, 1, 1, h, m)

    left = spark.createDataFrame(
        [
            (1, t(0), t(10)),   # long: spans 11 hour-buckets
            (2, t(3), t(3, 30)),
            (3, t(20), t(21)),
        ],
        "l_id long, s_a timestamp, e_a timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, t(1), t(9)),    # overlaps 1 across many buckets
            (11, t(3, 15), t(4)),  # overlaps 1 and 2
            (12, t(10), t(11)),  # touches 1 at the endpoint
            (13, t(22), t(23)),  # disjoint from everything
        ],
        "r_id long, s_b timestamp, e_b timestamp",
    )
    got = sorted(
        (r["l_id"], r["r_id"])
        for r in interval_overlap_join(
            left, right, "s_a", "e_a", "s_b", "e_b", bucket_seconds=3600
        ).collect()
    )
    naive = sorted(
        (r["l_id"], r["r_id"])
        for r in left.join(
            right,
            (F.col("s_a") <= F.col("e_b")) & (F.col("s_b") <= F.col("e_a")),
        ).collect()
    )
    assert got == naive == [(1, 10), (1, 11), (1, 12), (2, 10), (2, 11)]
    # exactly-once: no duplicates even for the 9-shared-bucket pair
    assert len(got) == len(set(got))


def test_interval_overlap_join_rejects_column_clash(spark):
    from datetime import datetime

    from iot_sensor_log_data_pipeline_spark.operators.intervals import (
        interval_overlap_join,
    )

    df = spark.createDataFrame(
        [(1, datetime(2024, 1, 1), datetime(2024, 1, 2))],
        "id long, s timestamp, e timestamp",
    )
    with pytest.raises(ValueError, match="disjoint"):
        interval_overlap_join(df, df, "s", "e", "s", "e")


def test_pca_whiten_decorrelates_and_is_partition_stable(spark, sf_dir):
    """PCA whitening: (1) the whitened top-k covariance is the identity
    (decorrelation + unit variance -- the property OPQ/ADC coding needs),
    (2) eigenvalues come back descending, (3) output is bit-stable under
    repartitioning (deterministic sign fix + order-independent gemm
    partials within rounding)."""
    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(400)
    whitened, evals = SIM.pca_whiten(emb, k=8)
    assert evals == sorted(evals, reverse=True)
    rows = whitened.collect()
    Z = np.vstack([r["embedding"] for r in rows])
    C = np.cov(Z, rowvar=False, bias=True)
    assert np.abs(C - np.eye(8)).max() < 1e-2, np.abs(C - np.eye(8)).max()

    whitened2, evals2 = SIM.pca_whiten(emb.repartition(7), k=8)
    got1 = {r["vec_id"]: tuple(round(x, 8) for x in r["embedding"]) for r in rows}
    got2 = {
        r["vec_id"]: tuple(round(x, 8) for x in r["embedding"])
        for r in whitened2.collect()
    }
    assert got1 == got2
    assert [round(v, 8) for v in evals] == [round(v, 8) for v in evals2]


def test_opq_rotation_orthogonal_balanced_and_stable(spark, sf_dir):
    """OPQ-lite rotation: (1) orthogonal (R^T R = I), so L2 -- and the
    ground truth any recall number compares against -- is preserved;
    (2) eigenvalue allocation balances variance across subspaces (the
    max/min subspace variance ratio must be far below plain PCA
    ordering's); (3) deterministic under repartitioning; and (4) the
    full opq_adc_topk composition returns exactly k ranked rows per
    query over the same schema as raw pq_adc_topk."""
    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(400)
    mu, R = SIM.opq_rotation(emb, m=8)
    assert np.abs(R.T @ R - np.eye(64)).max() < 1e-9

    mu2, R2 = SIM.opq_rotation(emb.repartition(7), m=8)
    assert np.abs(R - R2).max() < 1e-9 and np.abs(mu - mu2).max() < 1e-9

    # Subspace variance balance: rotated per-subspace variance sums.
    rows = emb.collect()
    X = np.vstack([r["embedding"] for r in rows]).astype("float64")
    Z = (X - mu) @ R
    sub_var = Z.var(axis=0).reshape(8, 8).sum(axis=1)
    mu_p, V, evals = SIM._pca_basis(emb, k=64)
    pca_var = ((X - mu_p) @ V).var(axis=0).reshape(8, 8).sum(axis=1)
    bal_ratio = sub_var.max() / sub_var.min()
    pca_ratio = pca_var.max() / pca_var.min()
    assert bal_ratio < pca_ratio, (bal_ratio, pca_ratio)
    assert bal_ratio < 1.5, bal_ratio  # near-flat across subspaces

    queries = emb.where(F.col("vec_id") < 3)
    out = SIM.opq_adc_topk(emb, queries, k=5, m=8, n_codes=16, rerank=20)
    got = out.collect()
    assert {r["query_id"] for r in got} == {0, 1, 2}
    assert sorted(r["rank"] for r in got if r["query_id"] == 0) == [1, 2, 3, 4, 5]
    assert out.columns == ["query_id", "neighbor_id", "l2_dist", "rank"]


def test_opq_rotation_beats_raw_pq_on_anisotropic_data(spark):
    """The value proposition: on CORRELATED, anisotropic vectors (a
    random rotation of a steep 100:1 spectrum -- the shape real
    encoder embeddings have), the eigenvalue-allocated rotation must
    beat raw PQ recall at identical quantizer geometry.  Also the
    regression test for the dim-forwarding bug where a 16-dim corpus
    trained codebooks under the 64-dim default (subspace 0 got the
    whole vector, the rest empty slices).  Ground truth is exact L2 --
    the metric PQ ranks by."""
    import numpy as np

    rng = np.random.default_rng(11)
    dim, m, n = 16, 4, 1200
    Q, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
    X = rng.standard_normal((n, dim)) @ np.diag(np.geomspace(10.0, 0.1, dim)) @ Q.T
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    queries = df.where(F.col("vec_id") < 5)
    truth = {}
    for q in range(5):
        ex = ((X - X[q]) ** 2).sum(-1)
        ex[q] = np.inf
        truth[q] = {int(i) for i in np.argsort(ex)[:10]}

    def recall(out):
        return sum(
            1 for r in out.collect() if r["neighbor_id"] in truth[r["query_id"]]
        ) / 50

    pq = recall(SIM.pq_adc_topk(
        df, queries, k=10, m=m, n_codes=32,
        codebooks=SIM.pq_seed_codebooks(df, m=m, k=32, dim=dim), rerank=40,
    ))
    opq = recall(SIM.opq_adc_topk(
        df, queries, k=10, m=m, n_codes=32, rerank=40, dim=dim,
    ))
    assert opq > pq, (opq, pq)          # measured 0.98 vs 0.88
    assert opq >= 0.9, opq


def test_ivfpq_opq_rotation_beats_raw_at_shallow_rerank(spark):
    """The OPQ+IVFPQ composition's value proposition (Ge et al. 2013
    §5: OPQ on IVFADC residuals), pinned where it can actually show:
    ALL cells probed (coarse stage lossless, so the delta isolates
    residual coding quality) and a SHALLOW re-rank (rerank == k --
    the memory-constrained serving shape where ADC ordering decides),
    on correlated anisotropic vectors (100:1 spectrum under a random
    rotation).  At the deep re-rank the derived geometry prescribes,
    the ADC shortlist is already lossless inside probed cells and
    both variants sit at the coarse ceiling (round-11 measurement,
    bench lines ivfpq / ivfpq_opq) -- this test pins the regime where
    the rotation pays.  Also asserts the rotated pipeline's contract:
    rotation without its co-trained codebooks is rejected."""
    import numpy as np
    import pytest as _pytest

    rng = np.random.default_rng(13)
    dim, m, n = 16, 4, 1500
    Q, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
    X = rng.standard_normal((n, dim)) @ np.diag(np.geomspace(10.0, 0.1, dim)) @ Q.T
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    queries = df.where(F.col("vec_id") < 5)
    truth = {}
    for q in range(5):
        ex = ((X - X[q]) ** 2).sum(-1)
        ex[q] = np.inf
        truth[q] = {int(i) for i in np.argsort(ex)[:10]}

    def recall(out):
        return sum(
            1 for r in out.collect() if r["neighbor_id"] in truth[r["query_id"]]
        ) / 50

    geo = dict(n_cells=8, n_probe=8, rerank=10, k=10, dim=dim)
    cents_raw, cbs_raw = SIM.ivfpq_trained_quantizers(
        df, n_cells=8, m=m, n_codes=16, dim=dim
    )
    raw = recall(SIM.ivfpq_topk(
        df, queries, centroids=cents_raw, codebooks=cbs_raw, **geo
    ))
    cents_opq, R, cbs_opq = SIM.ivfpq_opq_quantizers(
        df, n_cells=8, m=m, n_codes=16, dim=dim
    )
    opq = recall(SIM.ivfpq_topk(
        df, queries, centroids=cents_opq, codebooks=cbs_opq, rotation=R, **geo
    ))
    # Measured: raw 0.50 -> opq 0.70 at 16 codes/subspace, rerank 10.
    # The pin is the DELTA (the rotation's effect at fixed budget);
    # the absolute is bounded by the deliberately coarse code budget.
    assert opq >= raw + 0.1, (opq, raw)
    assert opq >= 0.65, opq

    with _pytest.raises(ValueError, match="rotation needs"):
        SIM.ivfpq_topk(df, queries, rotation=R, **geo)


def test_embedding_covariance_survives_large_means(spark):
    """Catastrophic-cancellation regression: large-magnitude (1e4)
    near-zero-covariance columns are exactly the data where the
    one-pass E[xy] - E[x]E[y] form loses ~8 digits to cancellation and
    partition-order noise crosses a 1e-6 rounding boundary (the
    round-8 external hash-fail).  The centered two-pass form must
    match numpy's exact covariance at 1e-6 rounding AND be rounding-
    stable under repartitioning."""
    import numpy as np

    rng = np.random.default_rng(7)
    dim, n = 6, 2000
    # mean 1e4, noise O(1) -> cov cells O(1), mean^2/cov ~ 1e8
    X = 1e4 + rng.standard_normal((n, dim))
    expect = np.round(np.cov(X, rowvar=False, bias=True), 6)
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(n)],
        "vec_id long, v array<double>",
    )
    for parts in (1, 13):
        got = np.zeros((dim, dim))
        rows = SIM.embedding_covariance(
            df.repartition(parts), vec_col="v", dim=dim
        ).collect()
        for r in rows:
            got[r["i"], r["j"]] = round(r["cov"], 6)
        assert np.array_equal(got, expect), np.abs(got - expect).max()


def test_decontaminate_spans_excises_exactly_the_covered_tokens(spark):
    """Span-level decontamination: the planted 8-gram's tokens vanish,
    surrounding tokens survive, clean docs pass through unchanged, and
    a fully-contaminated doc empties rather than disappearing."""
    from iot_sensor_log_data_pipeline_spark.operators import curation as CU

    leak = "q w e r t y u i"  # exactly 8 tokens -> one positional gram
    corpus = spark.createDataFrame(
        [
            (1, f"keep1 keep2 {leak} keep3"),
            (2, "all clean text here"),
            (3, leak),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9, f"pre {leak} post")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in CU.decontaminate_spans(corpus, bench, n=8).collect()
    }
    assert rows[1]["clean_text"] == "keep1 keep2 keep3"
    assert rows[1]["n_tokens"] == 11 and rows[1]["n_removed"] == 8
    assert rows[2]["clean_text"] == "all clean text here"
    assert rows[2]["n_removed"] == 0
    assert rows[3]["clean_text"] == "" and rows[3]["n_removed"] == 8


def test_prefix_filter_jaccard_complete_and_prunes_candidates(spark, sf_dir):
    """Prefix filtering must return EXACTLY the pairs the unpruned
    shared-shingle join finds (completeness is the theorem; equality
    because verification is exact either way), while indexing strictly
    fewer (doc, shingle) postings than the full inverted index."""
    from iot_sensor_log_data_pipeline_spark.io_utils import load, parallelize_small
    from iot_sensor_log_data_pipeline_spark.operators import dedup as DD

    docs = parallelize_small(load(spark, sf_dir, "documents"))
    t = 0.5

    got = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 6))
        for r in DD.prefix_filter_jaccard_pairs(docs, threshold=t).collect()
    }

    # Naive exact baseline: full shared-shingle candidates, exact verify.
    sh = DD.shingle_table(docs, "doc_id", "text", 3)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("set_size"))
    a = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    full = (
        inter.join(
            sizes.select(F.col("doc_id").alias("id_a"), F.col("set_size").alias("sa")),
            "id_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("id_b"), F.col("set_size").alias("sb")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            (F.col("n_common") / (F.col("sa") + F.col("sb") - F.col("n_common"))).alias(
                "jaccard"
            ),
        )
        .where(F.col("jaccard") >= t)
    )
    want = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 6)) for r in full.collect()
    }
    assert got == want
    assert want, "fixture should contain at least one near-dup pair"

    # The prefix index must be a strict subset of the full posting list.
    from pyspark.sql.window import Window

    df_tbl = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    ranked = (
        sh.join(df_tbl, "shingle")
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("shingle"))
            ),
        )
        .join(sizes, "doc_id")
    )
    n_prefix = ranked.where(
        F.col("rk") <= F.col("set_size") - F.ceil(F.lit(t) * F.col("set_size")) + 1
    ).count()
    n_full = sh.count()
    assert n_prefix < n_full * 0.6, (n_prefix, n_full)


def test_misra_gries_bounds_and_heavy_hitters_exact(spark):
    """Skewed fixture with distinct keys >> k: (a) per-partition MG
    summaries respect the n/(k+1) underestimate bound and contain
    every key above it; (b) sketch-first heavy_hitters equals the
    exact GROUP BY answer, independent of partitioning."""
    import collections

    from iot_sensor_log_data_pipeline_spark.operators import sketch as SK

    # 30% hot1, 10% hot2, remainder spread over 200 cold keys.
    rows = (
        [("hot1",)] * 300
        + [("hot2",)] * 100
        + [(f"cold{i % 200}",) for i in range(600)]
    )
    df = spark.createDataFrame(rows, "key string")
    n = len(rows)
    truth = collections.Counter(r[0] for r in rows)
    k = 8

    # (a) single-partition summary: MG invariants against exact counts.
    summary = {
        r["key"]: r["count_lo"]
        for r in SK.misra_gries_summaries(df.coalesce(1), "key", k=k).collect()
    }
    assert len(summary) <= k
    bound = n / (k + 1)
    for key, lo in summary.items():
        assert 0 < lo <= truth[key]
        assert truth[key] - lo <= bound
    for key, cnt in truth.items():
        if cnt > bound:
            assert key in summary, (key, cnt, bound)

    # (b) exact heavy hitters, any partition layout.  k=16 satisfies
    # the completeness precondition k+1 > 1/phi (k=8 would not: a key
    # at exactly the phi threshold could evade every summary).
    want = {
        (key, cnt, round(cnt / n, 6))
        for key, cnt in truth.items()
        if cnt >= -(-0.1 * n // 1)  # ceil(phi * n)
    }
    for parts in (1, 7):
        got = {
            (r["key"], r["n_occurrences"], r["frac"])
            for r in SK.heavy_hitters(
                df.repartition(parts), "key", phi=0.1, k=16
            ).collect()
        }
        assert got == want, (parts, got, want)


def test_heavy_hitters_counts_null_keys(spark):
    """A NULL key above phi*n must be reported like any other GROUP BY
    group: MG summaries tally NULLs via the sentinel counter (pandas
    value_counts drops them) and the recount joins null-safe."""
    from iot_sensor_log_data_pipeline_spark.operators import sketch as SK

    rows = [(None,)] * 40 + [("a",)] * 30 + [(f"c{i}",) for i in range(30)]
    df = spark.createDataFrame(rows, "key string")
    for parts in (1, 5):
        got = {
            r["key"]: r["n_occurrences"]
            for r in SK.heavy_hitters(
                df.repartition(parts), "key", phi=0.2, k=16
            ).collect()
        }
        assert got == {None: 40, "a": 30}, (parts, got)


def test_zorder_write_multi_column_skipping(spark, sf_dir, tmp_path):
    """Z-order layout: after clustering events on (user_id, value),
    per-file min/max footers must be selective for BOTH columns --
    whereas a lexicographic sort on user_id leaves value spanning
    ~the full range in every file.  Content must round-trip exactly."""
    import pyarrow.parquet as pq

    from iot_sensor_log_data_pipeline_spark.io_utils import load, parallelize_small
    from iot_sensor_log_data_pipeline_spark.operators import compaction as CP

    events = parallelize_small(load(spark, sf_dir, "events"))
    zpath = str(tmp_path / "zorder")
    spath = str(tmp_path / "sorted")
    n_files = 16
    n_written = CP.zorder_write(events, zpath, ["user_id", "value"], n_files=n_files)
    assert n_written == n_files

    (
        events.repartitionByRange(n_files, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(spath)
    )

    def mean_widths(path):
        lo = {"user_id": float("inf"), "value": float("inf")}
        hi = {"user_id": float("-inf"), "value": float("-inf")}
        per_file = []
        import os

        files = [
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet")
        ]
        stats = []
        for f in files:
            md = pq.read_metadata(f)
            fstat = {}
            for col in ("user_id", "value"):
                cmin, cmax = float("inf"), float("-inf")
                for rg in range(md.num_row_groups):
                    for ci in range(md.num_columns):
                        cc = md.row_group(rg).column(ci)
                        if cc.path_in_schema == col and cc.statistics:
                            cmin = min(cmin, float(cc.statistics.min))
                            cmax = max(cmax, float(cc.statistics.max))
                fstat[col] = (cmin, cmax)
                lo[col] = min(lo[col], cmin)
                hi[col] = max(hi[col], cmax)
            stats.append(fstat)
        out = {}
        for col in ("user_id", "value"):
            span = hi[col] - lo[col]
            out[col] = sum(
                (s[col][1] - s[col][0]) / span for s in stats
            ) / len(stats)
        return out

    zw = mean_widths(zpath)
    sw = mean_widths(spath)
    # Sorted layout: near-perfect on the sort key, broad on value.
    assert sw["user_id"] < 0.2
    assert sw["value"] > 0.6
    # Z-order: selective on BOTH dimensions at once -- and materially
    # tighter on the non-leading column than the lexicographic sort.
    assert zw["user_id"] < 0.5, zw
    assert zw["value"] < 0.5, zw
    assert zw["value"] < sw["value"] * 0.7, (zw, sw)

    # Row-lossless: same multiset of (event_id, value) back.
    back = spark.read.parquet(zpath)
    assert back.count() == events.count()
    a = {(r["event_id"], r["value"]) for r in back.collect()}
    b = {(r["event_id"], r["value"]) for r in events.collect()}
    assert a == b


def test_ddsketch_quantiles_relative_error_and_exact_merge(spark):
    """DDSketch (Masson et al. 2019): p50/p90/p99 estimates on
    lognormal data are within alpha RELATIVE error of the exact order
    statistic at the same rank, and sketches built on disjoint halves
    merge by per-idx count addition into EXACTLY the whole-data sketch
    (boundaries are alpha-determined, so the merge loses nothing)."""
    import numpy as np

    from iot_sensor_log_data_pipeline_spark.operators import sketch as SK

    alpha = 0.01
    rng = np.random.default_rng(7)
    vals = np.exp(rng.normal(0.0, 1.5, size=4000))  # spans ~4 decades
    df = spark.createDataFrame([(float(v),) for v in vals], "value double")

    qs = (0.5, 0.9, 0.99)
    est = {
        r["q"]: r["estimate"]
        for r in SK.ddsketch_quantiles(
            SK.ddsketch_buckets(df, "value", alpha=alpha), qs, alpha=alpha
        ).collect()
    }
    srt = np.sort(vals)
    n = len(vals)
    for q in qs:
        true = srt[int(np.floor(q * (n - 1)))]
        assert abs(est[q] - true) / true <= alpha * 1.001 + 1e-6, (
            q, est[q], true,
        )

    half_a = spark.createDataFrame(
        [(float(v),) for v in vals[: n // 2]], "value double"
    )
    half_b = spark.createDataFrame(
        [(float(v),) for v in vals[n // 2 :]], "value double"
    )
    merged = (
        SK.ddsketch_buckets(half_a, "value", alpha=alpha)
        .unionByName(SK.ddsketch_buckets(half_b, "value", alpha=alpha))
        .groupBy("idx")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = SK.ddsketch_buckets(df, "value", alpha=alpha)
    as_dict = lambda b: {r["idx"]: r["cnt"] for r in b.collect()}  # noqa: E731
    assert as_dict(merged) == as_dict(whole)


def test_hot_key_split_join_matches_plain_join(spark):
    """The differentiated skew join is a physical routing decision,
    not a semantic one: inner and left results equal the plain join
    bit-for-bit on skewed data with NULL fact keys and dim-missing
    keys, and the hot branch really broadcasts."""
    from iot_sensor_log_data_pipeline_spark.operators.skew import (
        hot_key_split_join,
    )

    fact_rows = (
        [(1, "a")] * 50            # hot, in dim
        + [(2, "b")] * 30          # hot, NOT in dim
        + [(i, "c") for i in range(3, 20)]  # cold tail, some in dim
        + [(None, "d")] * 3        # NULL keys
    )
    fact = spark.createDataFrame(fact_rows, "k int, payload string")
    dim = spark.createDataFrame(
        [(1, "dim1"), (3, "dim3"), (4, "dim4"), (99, "dim99")],
        "k int, attr string",
    )

    def rows(df):
        return sorted(
            [(r["k"], r["payload"], r["attr"]) for r in df.collect()],
            key=str,
        )

    for how in ("inner", "left"):
        split = hot_key_split_join(fact, dim, "k", n_hot=2, how=how)
        plain = fact.join(dim, "k", how)
        assert rows(split) == rows(plain), how

    explicit = hot_key_split_join(fact, dim, "k", hot_keys=[1, 2], how="inner")
    assert rows(explicit) == rows(fact.join(dim, "k", "inner"))
    plan = explicit._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan

    with pytest.raises(ValueError):
        hot_key_split_join(fact, dim, "k", how="full")


def test_dataset_fingerprint_invariance_merge_and_sensitivity(spark):
    """The content checksum is invariant under row order and partition
    count, mergeable across shards without re-scanning, and sensitive
    to a single perturbed value AND to duplicate-row multiplicity
    (which a pure XOR fold would cancel pairwise)."""
    from iot_sensor_log_data_pipeline_spark.operators.profiling import (
        dataset_fingerprint,
    )

    rows = [(i, f"name{i}", float(i) * 1.5 if i % 7 else None) for i in range(500)]
    df = spark.createDataFrame(rows, "id int, name string, score double")
    base = dataset_fingerprint(df).collect()[0]
    assert base["n_rows"] == 500

    shuffled = df.repartition(13).sortWithinPartitions(F.desc("name"))
    assert dataset_fingerprint(shuffled).collect()[0] == base

    # Mergeability: fold the two halves' fingerprints in plain Python.
    lo = dataset_fingerprint(df.where("id < 250")).collect()[0]
    hi = dataset_fingerprint(df.where("id >= 250")).collect()[0]
    assert (
        lo["n_rows"] + hi["n_rows"],
        (lo["checksum_sum"] + hi["checksum_sum"]) % 2**62,
        lo["checksum_xor"] ^ hi["checksum_xor"],
    ) == tuple(base)

    perturbed = df.withColumn(
        "score", F.when(F.col("id") == 123, 999.0).otherwise(F.col("score"))
    )
    pert = dataset_fingerprint(perturbed).collect()[0]
    assert pert["checksum_xor"] != base["checksum_xor"]

    doubled = df.where("id = 42").unionByName(df)
    dup = dataset_fingerprint(doubled).collect()[0]
    assert dup["n_rows"] == 501
    assert dup["checksum_sum"] != base["checksum_sum"]

    with pytest.raises(ValueError, match="pre-cast"):
        dataset_fingerprint(
            df.withColumn("ts", F.current_timestamp())
        )


def test_incremental_join_delta_equals_new_minus_old(spark):
    """Insert-only incremental view maintenance: the delta rows equal
    (new A join new B) minus (old A join old B) as MULTISETS -- rows
    whose key gains matches on both sides in the same refresh appear
    exactly once -- with and without base-side semi-pruning."""
    import collections

    from iot_sensor_log_data_pipeline_spark.operators.scd import (
        incremental_join_delta,
    )

    a_old = spark.createDataFrame(
        [(1, "a1"), (1, "a1b"), (2, "a2"), (5, "a5")], "k int, av string"
    )
    da = spark.createDataFrame(
        [(1, "da1"), (3, "da3"), (4, "da4")], "k int, av string"
    )
    b_old = spark.createDataFrame(
        [(1, "b1"), (3, "b3"), (9, "b9")], "k int, bv string"
    )
    db = spark.createDataFrame(
        [(1, "db1"), (4, "db4"), (5, "db5")], "k int, bv string"
    )

    def multiset(df):
        return collections.Counter(
            (r["k"], r["av"], r["bv"]) for r in df.collect()
        )

    new_join = a_old.unionByName(da).join(b_old.unionByName(db), "k")
    old_join = a_old.join(b_old, "k")
    expected = multiset(new_join)
    expected.subtract(multiset(old_join))
    expected = +expected

    for prune in (True, False):
        got = multiset(
            incremental_join_delta(a_old, da, b_old, db, "k", prune_base=prune)
        )
        assert got == expected, prune


def test_ddsketch_grouped_quantiles_per_group_error(spark):
    """Grouped DDSketch: each group's p50/p90/p99 is within alpha
    relative error of that group's own exact order statistic, from ONE
    keyed aggregation over all groups."""
    import numpy as np

    from iot_sensor_log_data_pipeline_spark.operators import sketch as SK

    alpha = 0.01
    rng = np.random.default_rng(13)
    groups = {
        "small": np.exp(rng.normal(-1.0, 0.5, size=800)),
        "wide": np.exp(rng.normal(1.0, 2.0, size=1200)),
    }
    rows = [(g, float(v)) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "tenant string, value double")

    qs = (0.5, 0.9, 0.99)
    got = {
        (r["tenant"], r["q"]): r["estimate"]
        for r in SK.ddsketch_quantiles_grouped(
            SK.ddsketch_buckets_grouped(df, ["tenant"], "value", alpha=alpha),
            ["tenant"], qs, alpha=alpha,
        ).collect()
    }
    assert len(got) == 6
    for g, vs in groups.items():
        srt = np.sort(vs)
        for q in qs:
            true = srt[int(np.floor(q * (len(vs) - 1)))]
            est = got[(g, q)]
            assert abs(est - true) / true <= alpha * 1.001 + 1e-6, (g, q)


def test_partitioned_components_matches_iterative(spark):
    """Per-group union-find == the iterative label-propagation result
    on group-local edge sets (chains, cliques, singleton merges), and
    the SemDeDup cap-None fast path returns the same survivors as the
    iterative algorithm on the same pair graph."""
    from iot_sensor_log_data_pipeline_spark.operators.dedup import (
        connected_components,
        partitioned_components,
    )

    # chains + a clique + an isolated pair, spread over 3 groups
    edges = [
        (0, 1, 2), (0, 2, 3), (0, 3, 4),          # chain 1-2-3-4
        (1, 10, 11), (1, 11, 12), (1, 10, 12),    # triangle
        (2, 20, 21),                              # pair
        (2, 30, 31), (2, 31, 32), (2, 30, 32), (2, 32, 33),
    ]
    df = spark.createDataFrame(edges, "cell int, id_a long, id_b long")
    got = {
        (r["node"], r["component"])
        for r in partitioned_components(df, "cell").collect()
    }
    want = {
        (r["node"], r["component"])
        for r in connected_components(df.select("id_a", "id_b")).collect()
    }
    assert got == want
    assert (33, 30) in got  # chain end reaches the min through 2 hops


def test_ivf_cogroup_join_full_probe_is_exact(spark):
    """With n_probe = n_cells the cogrouped IVF join scans every
    inverted list, so it must equal the exact brute-force top-k; and
    with fewer probes it returns a subset drawn only from probed
    cells, never a wrong score."""
    import numpy as np

    from iot_sensor_log_data_pipeline_spark.operators import similarity as SIM

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(120, 8)).astype("float64")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    corpus = df.where("vec_id < 100")
    batch = df.where("vec_id >= 100")
    cents = SIM.seed_centroids(corpus, 4)

    exact = {}
    for qi in range(100, 120):
        q = vecs[qi]
        sims = vecs[:100] @ q / (
            np.linalg.norm(vecs[:100], axis=1) * np.linalg.norm(q)
        )
        order = np.lexsort((np.arange(100), -sims))[:5]
        exact[qi] = [(int(n), round(float(sims[n]), 6)) for n in order]

    full = SIM.ivf_cogroup_join(batch, corpus, cents, k=5, n_probe=4)
    got = {}
    for r in full.collect():
        got.setdefault(r["query_id"], []).append(
            (r["neighbor_id"], r["cos_sim"])
        )
    assert got == exact

    partial = SIM.ivf_cogroup_join(batch, corpus, cents, k=5, n_probe=2)
    exact_scores = {
        (q, n): s for q, lst in exact.items() for n, s in lst
    }
    for r in partial.collect():
        # any returned pair that IS in the exact top-5 must carry the
        # exact score (scoring is always exact; only recall is approx)
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_scores:
            assert abs(r["cos_sim"] - exact_scores[key]) < 1e-9


def test_shard_assignment_balance_and_determinism(spark):
    """Shard ids are the md5 bucket of the doc id (stable under
    appends: a doc's shard never depends on corpus contents), every
    doc lands in exactly one shard, and the shares sum to 1."""
    import hashlib

    from iot_sensor_log_data_pipeline_spark.operators import curation as CU

    docs = spark.createDataFrame(
        [(i, "w " * (i % 7 + 1)) for i in range(200)], "doc_id long, text string"
    )
    rep = CU.shard_assignment(docs, n_shards=4).collect()
    assert sum(r["n_docs"] for r in rep) == 200
    assert abs(sum(r["token_frac"] for r in rep) - 1.0) < 1e-5
    # membership replay: python md5 prefix mod 4 == the operator's shard
    def shard_of(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 4

    got_docs = {r["shard"]: r["n_docs"] for r in rep}
    import collections

    want = collections.Counter(shard_of(i) for i in range(200))
    assert got_docs == dict(want)
    # appending docs must not move existing ones: shard is per-row
    more = spark.createDataFrame(
        [(i, "w") for i in range(200, 300)], "doc_id long, text string"
    )
    rep2 = CU.shard_assignment(docs.unionByName(more), 4).collect()
    want2 = collections.Counter(shard_of(i) for i in range(300))
    assert {r["shard"]: r["n_docs"] for r in rep2} == dict(want2)


def test_quality_threshold_sweep_matches_per_threshold_filters(spark):
    """The one-pass sweep equals the naive one-filter-per-threshold
    answer, including a threshold that nothing passes (kept = 0)."""
    from pyspark.sql import functions as F

    from iot_sensor_log_data_pipeline_spark.operators import curation as CU

    rows = [(i, "tok " * (i + 1)) for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    score = F.col("doc_id") / 10.0  # 0.0 .. 0.9, trivially replayable
    ths = (0.25, 0.5, 0.95)
    got = {
        r["threshold"]: (r["kept_docs"], r["kept_tokens"], r["doc_frac"])
        for r in CU.quality_threshold_sweep(docs, score, ths).collect()
    }
    total_toks = sum(i + 1 for i in range(10))
    for t in ths:
        keep = [i for i in range(10) if i / 10.0 >= t]
        assert got[t][0] == len(keep)
        assert got[t][1] == sum(i + 1 for i in keep)
        assert abs(got[t][2] - len(keep) / 10.0) < 1e-6
    assert got[0.95] == (0, 0, 0.0)


def test_epoch_upsample_realizes_fractional_epochs(spark):
    """floor(e) copies always; the +1 slice is exactly the docs whose
    md5 10k-bucket sits below frac(e)*10000; copy_idx is contiguous;
    epochs < 1 keeps only the slice; a 0-epoch source vanishes."""
    import hashlib

    from iot_sensor_log_data_pipeline_spark.operators import curation as CU

    rows = [(i, f"s{i % 3}") for i in range(120)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    epochs = {"s0": 2.5, "s1": 0.25, "s2": 0.0}
    out = CU.epoch_upsample(docs, epochs).collect()

    def bucket(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 10_000

    want = {}
    for i, src in rows:
        e = epochs[src]
        n = int(e) + (1 if bucket(i) < round((e % 1.0) * 10_000) else 0)
        if n >= 1:
            want[i] = n
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append(r["copy_idx"])
    assert {k: len(v) for k, v in got.items()} == want
    for k, v in got.items():
        assert sorted(v) == list(range(1, len(v) + 1))
    assert all(r["source"] != "s2" for r in out)


def test_knn_label_transfer_recovers_planted_clusters(spark):
    """Corpus = 3 tight clusters with distinct labels; held-out
    queries drawn near each cluster center must get that cluster's
    label with a unanimous vote at full probe."""
    import numpy as np

    from iot_sensor_log_data_pipeline_spark.operators import similarity as SIM

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(3, 8)) * 10.0
    rows, queries = [], []
    vid = 0
    for lbl in range(3):
        for _ in range(20):
            v = centers[lbl] + rng.normal(size=8) * 0.05
            rows.append((vid, [float(x) for x in v], lbl))
            vid += 1
    for lbl in range(3):
        for _ in range(5):
            v = centers[lbl] + rng.normal(size=8) * 0.05
            queries.append((vid, [float(x) for x in v]))
            vid += 1
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    batch = spark.createDataFrame(queries, "vec_id long, embedding array<double>")
    cents = SIM.seed_centroids(corpus, 4)
    out = SIM.knn_label_transfer(
        batch, corpus, cents, k=5, n_probe=4
    ).collect()
    assert len(out) == 15
    for r in out:
        want = (r["query_id"] - 60) // 5
        assert r["predicted_label"] == want, r
        assert r["votes"] == 5  # unanimous inside a tight cluster


def test_lsh_tuning_report_counts_the_join_volume(spark):
    """The report's per-band candidate_pairs is exactly the number of
    same-bucket ordered pairs the band self-join would emit in that
    band, and planted exact duplicates surface as a hot bucket."""
    import collections

    from iot_sensor_log_data_pipeline_spark.operators import dedup as DD

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, base + f" unique{i} marker{i} tail{i}") for i in range(12)]
    rows += [(100 + j, base) for j in range(6)]  # 6 identical docs
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    rep = {r["band_id"]: r for r in DD.lsh_tuning_report(docs).collect()}

    sh = DD.shingle_table(docs, "doc_id", "text", 3)
    sigs = DD.minhash_signatures_wide(sh)
    bands = DD.minhash_bands(sigs).collect()
    per_bucket = collections.Counter(
        (r["band_id"], r["band_val"]) for r in bands
    )
    want = collections.defaultdict(
        lambda: {"n": 0, "single": 0, "mx": 0, "pairs": 0}
    )
    for (bid, _), m in per_bucket.items():
        w = want[bid]
        w["n"] += 1
        w["single"] += m == 1
        w["mx"] = max(w["mx"], m)
        w["pairs"] += m * (m - 1) // 2
    assert set(rep) == set(want)
    for bid, w in want.items():
        r = rep[bid]
        assert (
            r["n_buckets"], r["singleton_buckets"], r["max_bucket"],
            r["candidate_pairs"],
        ) == (w["n"], w["single"], w["mx"], w["pairs"])
    # identical docs share every band bucket: hottest bucket >= 6,
    # contributing >= C(6,2) pairs in each band
    for r in rep.values():
        assert r["max_bucket"] >= 6
        assert r["candidate_pairs"] >= 15


def test_pair_similarity_histogram_accounts_every_pair(spark):
    """Bin counts sum to C(sample, 2), frac_ge is the true suffix
    fraction, planted identical vectors land in the top bin, and the
    sample slice is the md5 bucket (content-addressed)."""
    import hashlib
    import itertools

    import numpy as np

    from iot_sensor_log_data_pipeline_spark.operators import similarity as SIM

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.normal(size=6)]) for i in range(40)]
    rows += [(100, [1.0] * 6), (101, [1.0] * 6)]  # identical twins
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    out = {r["bin"]: r for r in SIM.pair_similarity_histogram(
        df, sample_buckets=1, n_buckets=2, bins=10
    ).collect()}

    def in_sample(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 2 < 1

    ids = [i for i, _ in rows if in_sample(i)]
    vecs = {i: np.array(v) for i, v in rows}
    sims = [
        float(vecs[a] @ vecs[b] / (np.linalg.norm(vecs[a]) * np.linalg.norm(vecs[b])))
        for a, b in itertools.combinations(sorted(ids), 2)
    ]
    n_pairs = len(ids) * (len(ids) - 1) // 2
    assert sum(r["n_pairs"] for r in out.values()) == n_pairs
    import collections

    want = collections.Counter(
        min(max(int((s + 1.0) / 2.0 * 10), 0), 9) for s in sims
    )
    for b in range(10):
        assert out[b]["n_pairs"] == want.get(b, 0)
        ge = sum(want.get(j, 0) for j in range(b, 10))
        assert abs(out[b]["frac_ge"] - round(ge / n_pairs, 6)) < 1e-9
    if in_sample(100) and in_sample(101):
        assert out[9]["n_pairs"] >= 1  # the twins' cos=1.0 pair


def test_source_dedup_audit_flags_planted_mirror(spark):
    """A source that mirrors another's docs shows full cross-source
    dup counts; reordered token twins collapse to one fingerprint; a
    clean source reports zeros; min-id survivors are never counted as
    lost."""
    from iot_sensor_log_data_pipeline_spark.operators import dedup as DD

    rows = [
        (1, "alpha beta gamma", "a"),
        (2, "delta epsilon zeta", "a"),
        (10, "alpha beta gamma", "mirror"),       # exact cross-source dup
        (11, "zeta delta epsilon", "mirror"),     # reordered dup of 2
        (20, "totally unique content", "clean"),
        (3, "delta epsilon zeta", "a"),           # within-source dup of 2
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r for r in DD.source_dedup_audit(docs).collect()}

    assert out["clean"]["dup_docs"] == 0
    assert out["clean"]["docs_lost_to_dedup"] == 0
    assert out["mirror"]["n_docs"] == 2
    assert out["mirror"]["dup_docs"] == 2
    assert out["mirror"]["cross_source_dup_docs"] == 2
    assert out["mirror"]["docs_lost_to_dedup"] == 2  # min ids are in 'a'
    assert out["a"]["n_docs"] == 3
    assert out["a"]["dup_docs"] == 3        # all three fps are shared
    assert out["a"]["cross_source_dup_docs"] == 3
    assert out["a"]["docs_lost_to_dedup"] == 1  # doc 3 loses to doc 2
    assert abs(out["a"]["dup_rate"] - 1.0) < 1e-9


def test_asof_forward_and_nearest_match_pandas_merge_asof(spark):
    """Forward and nearest as-of joins agree with pandas merge_asof
    (direction='forward'/'nearest') on keyed microsecond timestamps,
    including the tie->prior convention and tolerance nulling."""
    import pandas as pd

    from iot_sensor_log_data_pipeline_spark.operators.asof import (
        asof_join_forward,
        asof_join_nearest,
    )

    lrows = [
        (1, "u1", "2024-01-01 00:00:10.500000", 1.0),
        (2, "u1", "2024-01-01 00:01:00", 2.0),
        (3, "u2", "2024-01-01 00:00:05", 3.0),
        (4, "u3", "2024-01-01 00:00:05", 4.0),  # key with no rights
        (5, "u1", "2024-01-01 00:00:20", 5.0),  # equidistant -> prior
    ]
    rrows = [
        ("u1", "2024-01-01 00:00:10.500000", 10.0),  # exact tie with 1
        ("u1", "2024-01-01 00:00:30", 30.0),
        ("u1", "2024-01-01 00:02:00", 120.0),
        ("u2", "2024-01-01 00:00:06.250000", 6.0),
    ]
    left = spark.createDataFrame(
        [(i, u, pd.Timestamp(t).to_pydatetime(), v) for i, u, t, v in lrows],
        "event_id long, user_id string, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [(u, pd.Timestamp(t).to_pydatetime(), v) for u, t, v in rrows],
        "user_id string, ts timestamp, value double",
    )
    lpdf = pd.DataFrame(
        [(i, u, pd.Timestamp(t), v) for i, u, t, v in lrows],
        columns=["event_id", "user_id", "ts", "value"],
    ).sort_values("ts")
    rpdf = pd.DataFrame(
        [(u, pd.Timestamp(t), v) for u, t, v in rrows],
        columns=["user_id", "ts", "rv"],
    ).sort_values("ts")

    for direction, fn in (
        ("forward", asof_join_forward),
        ("nearest", asof_join_nearest),
    ):
        want = pd.merge_asof(
            lpdf, rpdf, on="ts", by="user_id", direction=direction
        ).set_index("event_id")["rv"].to_dict()
        got = {
            r["event_id"]: r["rv"]
            for r in fn(
                left, right, by=["user_id"], left_on="ts", right_on="ts",
                right_cols={"value": "rv"},
            ).collect()
        }
        for k, v in want.items():
            if pd.isna(v):
                assert got[k] is None, (direction, k, got[k])
            else:
                assert got[k] == v, (direction, k, got[k], v)

    # tolerance: the only u2 match is 1.25s away; a 1s horizon nulls it
    tol = asof_join_nearest(
        left, right, by=["user_id"], left_on="ts", right_on="ts",
        right_cols={"value": "rv"}, tolerance_seconds=1,
    ).collect()
    by_id = {r["event_id"]: r["rv"] for r in tol}
    assert by_id[3] is None
    assert by_id[1] == 10.0  # distance 0 survives any horizon


def test_winsorize_clamps_to_group_percentiles(spark):
    """A planted extreme value clamps to its own group's p-bounds;
    in-range rows pass through bit-identical; the other group's bounds
    are untouched by the outlier."""
    import numpy as np

    from iot_sensor_log_data_pipeline_spark.operators.profiling import winsorize

    vals_a = [float(i) for i in range(1, 100)] + [1e9]  # outlier in a
    vals_b = [float(i) for i in range(1, 101)]
    rows = [(i, "a", v) for i, v in enumerate(vals_a)]
    rows += [(100 + i, "b", v) for i, v in enumerate(vals_b)]
    df = spark.createDataFrame(rows, "id long, grp string, value double")
    out = {r["id"]: r for r in winsorize(df, "value", ["grp"], 0.05, 0.95).collect()}

    lo_a, hi_a = np.percentile(vals_a, [5, 95], method="linear")
    assert abs(out[99]["value_winsorized"] - hi_a) < 1e-6  # outlier clamped
    mid = out[50]  # value 51.0, inside [lo_a, hi_a]
    assert mid["value_winsorized"] == mid["value"]
    lo_b, hi_b = np.percentile(vals_b, [5, 95], method="linear")
    assert abs(out[150]["value_lo"] - lo_b) < 1e-6
    assert abs(out[150]["value_hi"] - hi_b) < 1e-6
    assert len(out) == 200  # transform drops nothing


def test_key_candidate_report_verdicts(spark):
    """Unique single key, violated single key, and a repairing
    composite key all report exact counts."""
    from iot_sensor_log_data_pipeline_spark.operators.profiling import (
        key_candidate_report,
    )

    df = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1), (3, 1)], "a long, b long"
    )
    rep = {
        (r["table_name"], r["key_columns"]): r
        for r in key_candidate_report({"t": (df, [["a"], ["a", "b"]])}).collect()
    }
    single = rep[("t", "a")]
    assert (single["n_rows"], single["n_distinct"], single["dup_rows"]) == (4, 3, 1)
    assert not single["is_unique"]
    comp = rep[("t", "a,b")]
    assert comp["n_distinct"] == 4 and comp["is_unique"]


def test_ivf_cogroup_join_multi_assign_stays_exact_and_deduped(spark):
    """With n_assign=2 and full probe the join still equals exact
    brute force -- the dedup collapse removes multi-cell repeats and
    never duplicates a (query, neighbor) pair."""
    import numpy as np

    from iot_sensor_log_data_pipeline_spark.operators import similarity as SIM

    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(90, 8)).astype("float64")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(90)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    corpus = df.where("vec_id < 70")
    batch = df.where("vec_id >= 70")
    cents = SIM.seed_centroids(corpus, 4)

    out = SIM.ivf_cogroup_join(
        batch, corpus, cents, k=5, n_probe=4, n_assign=2
    ).collect()
    pairs = [(r["query_id"], r["neighbor_id"]) for r in out]
    assert len(pairs) == len(set(pairs))  # deduped
    got = {}
    for r in out:
        got.setdefault(r["query_id"], []).append((r["neighbor_id"], r["cos_sim"]))
    for qi in range(70, 90):
        q = vecs[qi]
        sims = vecs[:70] @ q / (
            np.linalg.norm(vecs[:70], axis=1) * np.linalg.norm(q)
        )
        order = np.lexsort((np.arange(70), -sims))[:5]
        assert got[qi] == [(int(n), round(float(sims[n]), 6)) for n in order]


def test_ivf_index_cogroup_join_matches_adhoc(spark, tmp_path):
    """Joining a batch against the persisted IVF index (inverted lists
    read from disk, stored n_assign drives the dedup) is
    result-identical to the ad-hoc cogroup join with the same
    centroids and assignment width -- including after an incremental
    append."""
    import numpy as np

    from iot_sensor_log_data_pipeline_spark.operators import ann_index as ANN
    from iot_sensor_log_data_pipeline_spark.operators import similarity as SIM

    rng = np.random.default_rng(13)
    vecs = rng.normal(size=(80, 8)).astype("float64")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    corpus = df.where("vec_id < 50")
    extra = df.where("vec_id >= 50 and vec_id < 60")
    batch = df.where("vec_id >= 60")
    cents = SIM.seed_centroids(corpus, 4)

    root = str(tmp_path / "ivf_cg")
    ANN.build_ivf_index(corpus, root, n_cells=4, n_assign=2, centroids=cents, dim=8)

    def key(df_):
        return sorted(
            (r["query_id"], r["rank"], r["neighbor_id"], r["cos_sim"])
            for r in df_.collect()
        )

    got = key(ANN.ivf_index_cogroup_join(spark, root, batch, k=5, n_probe=2))
    want = key(
        SIM.ivf_cogroup_join(batch, corpus, cents, k=5, n_probe=2, n_assign=2)
    )
    assert got == want

    ANN.append_ivf_index(extra, root)
    got2 = key(ANN.ivf_index_cogroup_join(spark, root, batch, k=5, n_probe=2))
    want2 = key(
        SIM.ivf_cogroup_join(
            batch, corpus.unionByName(extra), cents, k=5, n_probe=2, n_assign=2
        )
    )
    assert got2 == want2
    assert got2 != got  # the appended rows actually participate


def test_quality_threshold_sweep_hypothesis(spark):
    """Property: the one-pass sweep equals per-threshold brute-force
    filtering for random scores and random ascending grids, including
    all-pass / none-pass thresholds."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyspark.sql import functions as F

    from iot_sensor_log_data_pipeline_spark.operators import curation as CU

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=0, max_value=100), min_size=1, max_size=12
        ),
        st.lists(
            st.integers(min_value=-10, max_value=110),
            min_size=1,
            max_size=5,
            unique=True,
        ),
    )
    def run(scores, grid):
        rows = [(i, "t " * (i % 4 + 1), s) for i, s in enumerate(scores)]
        docs = spark.createDataFrame(rows, "doc_id long, text string, s long")
        ths = tuple(float(t) for t in sorted(grid))
        got = {
            r["threshold"]: (r["kept_docs"], r["kept_tokens"])
            for r in CU.quality_threshold_sweep(
                docs, F.col("s").cast("double"), ths
            ).collect()
        }
        for t in ths:
            keep = [i for i, s in enumerate(scores) if s >= t]
            toks = sum(i % 4 + 1 for i in keep)
            assert got[t] == (len(keep), toks), (t, got[t])

    run()


def test_epoch_upsample_hypothesis(spark):
    """Property: per-doc copy counts follow floor(e) + md5-slice(frac)
    exactly for random fractional epochs (4-decimal grid), and total
    realized copies per source match the replayed rule."""
    import hashlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from iot_sensor_log_data_pipeline_spark.operators import curation as CU

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=0, max_value=35000),  # e in [0, 3.5]
            min_size=1,
            max_size=3,
        )
    )
    def run(raw):
        epochs = {f"s{j}": raw[j] / 10_000 for j in range(len(raw))}
        rows = [(i, f"s{i % len(raw)}") for i in range(60)]
        docs = spark.createDataFrame(rows, "doc_id long, source string")
        got = {}
        for r in CU.epoch_upsample(docs, epochs).collect():
            got[r["doc_id"]] = got.get(r["doc_id"], 0) + 1
        want = {}
        for i, src in rows:
            e = epochs[src]
            fb = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 10_000
            n = int(e) + (1 if fb < round((e % 1.0) * 10_000) else 0)
            if n >= 1:
                want[i] = n
        assert got == want

    run()


def test_cusum_alarms_catch_planted_mean_shift(spark):
    """A sustained +2.5-sigma shift fires within a few points of the
    change; the long clean baseline stays silent even though no single
    point is extreme; a constant series (sd = 0) never fires.  (The
    reset-after-alarm recurrence itself is bit-verified by the
    recursive-CTE oracle replay in the catalog gate.)"""
    import numpy as np

    from iot_sensor_log_data_pipeline_spark.operators import timeseries as TS

    rng = np.random.default_rng(4)
    pre = rng.normal(0.0, 1.0, 200)
    post = rng.normal(2.5, 1.0, 30)  # sustained shift, points unremarkable
    rows = [(int(i), "dev1", float(v)) for i, v in enumerate(np.r_[pre, post])]
    rows += [(int(i), "flat", 7.0) for i in range(50)]
    df = spark.createDataFrame(rows, "seq long, dev string, value double")
    out = sorted(
        (
            (r["seq"], r["s_hi"], r["alarm"] and r["s_hi"] > 4.0)
            for r in TS.cusum_alarms(
                df, "value", ["dev"], ["seq"], k=0.5, h=4.0
            ).where("dev = 'dev1'").collect()
        )
    )
    high_alarms = [seq for seq, _, a in out if a]
    assert high_alarms and 200 <= high_alarms[0] <= 215
    assert all(seq >= 200 for seq in high_alarms)  # baseline stays quiet
    flat = TS.cusum_alarms(
        df.where("dev = 'flat'"), "value", ["dev"], ["seq"]
    ).collect()
    assert all(not r["alarm"] and r["s_hi"] == 0.0 for r in flat)


def test_mutual_information_detects_dependence(spark):
    """A determined column (y = f(x)) scores NMI = 1; an independent
    uniform pair scores near 0; MI matches a NumPy replay; NULLs count
    as a level."""
    import math

    from iot_sensor_log_data_pipeline_spark.operators.profiling import (
        mutual_information,
    )

    rows = []
    for i in range(240):
        x = f"x{i % 4}"
        rows.append(
            (
                i,
                x,
                f"f({x})",                # determined by x
                f"u{(i * 7 + i // 4) % 3}",  # de-correlated from x
                None if i % 5 == 0 else "v",  # has NULLs
            )
        )
    df = spark.createDataFrame(rows, "i long, x string, fx string, u string, n string")
    out = {
        (r["col_x"], r["col_y"]): r
        for r in mutual_information(
            df, [("x", "fx"), ("x", "u"), ("x", "n")]
        ).collect()
    }
    assert out[("x", "fx")]["nmi"] == 1.0
    assert out[("x", "fx")]["mi_nats"] == round(math.log(4), 6)  # H(x)=ln 4
    assert out[("x", "u")]["nmi"] < 0.02
    # NULL level participates: H(n) = H({0.2, 0.8}) > 0, nmi defined
    assert abs(
        out[("x", "n")]["h_y"]
        - round(-(0.2 * math.log(0.2) + 0.8 * math.log(0.8)), 6)
    ) < 1e-6


def test_index_appends_cast_to_stored_element_type(spark, sf_dir, tmp_path):
    """Appending a double-typed batch into a float-typed index must not
    leave mixed parquet schemas (read-time FAILED_READ_FILE): every
    append path casts to the persisted element type.  Covers LSH, IVF,
    and graph appends (the PQ path is covered in its own test)."""
    from iot_sensor_log_data_pipeline_spark.io_utils import load
    from iot_sensor_log_data_pipeline_spark.operators import ann_index as ANN
    from iot_sensor_log_data_pipeline_spark.operators import graph_ann as GA

    emb = load(spark, sf_dir, "embeddings").limit(100)
    q0 = [float(x) for x in emb.where("vec_id = 0").head()["embedding"]]
    extra = spark.createDataFrame(
        [(30_000_000, [x * 1.0001 for x in q0])],
        "vec_id long, embedding array<double>",
    )
    queries = emb.where(F.col("vec_id") < 2)

    lsh_root = str(tmp_path / "lsh")
    ANN.build_lsh_index(emb, lsh_root, bands=8, rows_per_band=4,
                        planes=SIM.hash_hyperplanes(32, dim=64))
    ANN.append_lsh_index(extra, lsh_root)
    assert ANN.query_lsh_index(spark, lsh_root, queries, k=5).count() > 0

    ivf_root = str(tmp_path / "ivf")
    ANN.build_ivf_index(emb, ivf_root, n_cells=8, n_assign=2,
                        centroids=SIM.seed_centroids(emb, 8))
    ANN.append_ivf_index(extra, ivf_root)
    assert (
        ANN.query_ivf_index(spark, ivf_root, queries, k=5, n_probe=4)
        .where("query_id = 0 AND rank = 1").head()["neighbor_id"] == 30_000_000
    )

    g_root = str(tmp_path / "graph")
    GA.build_graph_index(emb, g_root, k=4, n_iter=1)
    GA.append_graph_index(extra, g_root)
    assert GA.query_graph_index(spark, g_root, queries, k=5).count() > 0


def test_parse_common_log_fields_and_dead_letter(spark):
    """CLF parser: a well-formed line extracts every typed field
    ('-' bytes -> NULL), a malformed line yields the empty-host
    dead-letter struct instead of raising."""
    from iot_sensor_log_data_pipeline_spark.operators.text import parse_common_log

    df = spark.createDataFrame(
        [
            (1, '127.0.0.1 - frank [10/Oct/2000:13:55:36 +0000] '
                '"GET /apache_pb.gif HTTP/1.0" 200 2326'),
            (2, '10.1.1.1 - - [10/Oct/2000:13:55:36 +0000] '
                '"POST /submit HTTP/1.1" 404 -'),
            (3, "totally not a log line"),
        ],
        "id long, line string",
    )
    rows = {r["id"]: r["p"] for r in
            df.select("id", parse_common_log("line").alias("p")).collect()}
    ok = rows[1]
    assert (ok["host"], ok["user"], ok["method"], ok["path"],
            ok["protocol"], ok["status"], ok["n_bytes"]) == (
        "127.0.0.1", "frank", "GET", "/apache_pb.gif", "HTTP/1.0", 200, 2326)
    assert rows[2]["n_bytes"] is None and rows[2]["status"] == 404
    assert rows[3]["host"] == "" and rows[3]["status"] is None


def test_seasonal_residual_flags_off_cycle_reading(spark):
    """Planted diurnal cycle: a value normal at its OWN hour's level
    but far from another hour's baseline is flagged only when it
    appears at the wrong hour; global z-scoring would miss it."""
    from datetime import datetime, timedelta

    from iot_sensor_log_data_pipeline_spark.operators.timeseries import (
        seasonal_residual_anomalies,
    )

    base = datetime(2024, 1, 1)
    rows = []
    i = 0
    for day in range(20):
        for hour, level in ((3, 10.0), (14, 100.0)):
            rows.append((i, base + timedelta(days=day, hours=hour),
                         level + (i % 5) * 0.1))
            i += 1
    # the plant: a 100-level reading at 03:00 (normal for 14:00)
    rows.append((999, base + timedelta(days=21, hours=3), 100.0))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    df = df.withColumn("event_type", F.lit("temp"))
    out = {r["event_id"]: r for r in seasonal_residual_anomalies(df).collect()}
    # the plant sits inside its own hour's baseline, inflating that
    # hour's sigma (the standard masking effect), so z lands ~4.5 --
    # still far over threshold.
    assert out[999]["is_anomaly"] and out[999]["residual_z"] > 3
    assert not any(r["is_anomaly"] for eid, r in out.items() if eid != 999)


def test_salt_advisor_strategies_and_widths(spark):
    """Planted fan-outs exercise all three strategies: under-budget
    keys ride as-is, single-row-side hot keys route to the split join,
    plural-x-plural hot keys get a salt width that spreads the key's
    exact output to the task budget."""
    from iot_sensor_log_data_pipeline_spark.operators.skew import salt_advisor

    left = spark.createDataFrame(
        [("hot",)] * 12 + [("single",)] * 12 + [("cold",)] * 2,
        "k string",
    )
    right = spark.createDataFrame(
        [("hot",)] * 5 + [("single",)] + [("cold",)] * 3,
        "k string",
    )
    out = {
        r["k"]: r
        for r in salt_advisor(left, right, "k", target_pairs=10).collect()
    }
    assert out["hot"]["strategy"] == "salt"
    assert out["hot"]["est_pairs"] == 60
    assert out["hot"]["salt_factor"] == 6  # ceil(60 / 10)
    assert out["single"]["strategy"] == "split"  # 12x1, over budget
    assert out["single"]["salt_factor"] == 1
    assert out["cold"]["strategy"] == "as-is"  # 6 pairs <= 10
    assert out["cold"]["salt_factor"] == 1


def test_dim_truncation_report_full_prefix_is_perfect(spark):
    """The report's contract at the boundary: a 'truncated' width equal
    to the full dimensionality must recover the exact answer (recall
    1.0), and recall is monotone data-wise here -- a planted corpus
    whose first 2 components INVERT the full-dim neighborhoods drives
    the narrow prefix measurably below 1."""
    from iot_sensor_log_data_pipeline_spark.operators.similarity import (
        dim_truncation_report,
    )

    # Neighbor structure lives in dims 3-4; dims 1-2 anti-correlate.
    rows = [
        (0, [1.0, 0.0, 10.0, 0.0]),
        (1, [0.0, 1.0, 10.0, 0.1]),   # true neighbor of 0
        (2, [1.0, 0.0, 0.0, 10.0]),   # prefix-twin of 0, far in full dim
        (3, [0.9, 0.1, 9.0, 0.5]),
        (4, [0.1, 0.9, 0.5, 9.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.where("vec_id = 0")
    rep = {
        r["dim_prefix"]: r
        for r in dim_truncation_report(
            emb, queries, dims=(2, 4), k=2
        ).collect()
    }
    assert rep[4]["recall_at_k"] == 1.0
    assert rep[4]["n_pairs"] == 2
    assert rep[2]["recall_at_k"] < 1.0


def test_bigram_pmi_ranks_collocations_over_frequency(spark):
    """PMI's defining property: an always-together pair outranks a
    merely frequent pair; the min-count guard drops singleton bigrams
    whose MLE PMI would otherwise be maximal by construction."""
    from iot_sensor_log_data_pipeline_spark.operators.text import bigram_pmi

    docs = spark.createDataFrame(
        [(i, "hong kong the cat the dog rare pair") for i in range(5)]
        + [(5, "the cat sat on the mat"), (6, "kong hong never")],
        "doc_id long, text string",
    )
    out = bigram_pmi(docs, min_count=2, k=10).collect()
    by_pair = {(r["a"], r["b"]): r["pmi"] for r in out}
    # 'hong kong' occurs only together (5x); 'the cat' shares 'the'
    # with many other bigrams -- PMI must rank the exclusive pair higher.
    assert ("hong", "kong") in by_pair
    assert by_pair[("hong", "kong")] > by_pair[("the", "cat")]
    # min_count=2 drops the one-off 'rare pair'? No -- it appears 5x
    # (once per repeated doc); 'kong hong' (1x) is the dropped one.
    assert ("kong", "hong") not in by_pair


def test_hll_set_overlap_tracks_true_overlap(spark):
    """Planted half-overlapping key sets: the sketch union/intersection
    estimates land within HLL error of truth (p=8 -> ~6.5% relative),
    the disjoint pair reads near-zero Jaccard, and the half-overlap
    pair's Jaccard is materially higher."""
    from iot_sensor_log_data_pipeline_spark.operators.sketch import (
        hll_set_overlap,
    )

    rows = (
        [("a", f"k{i}") for i in range(2000)]          # A = 0..1999
        + [("b", f"k{i}") for i in range(1000, 3000)]  # B = 1000..2999
        + [("c", f"x{i}") for i in range(2000)]        # C disjoint
    )
    df = spark.createDataFrame(rows, "g string, key string")
    out = {
        (r["g_a"], r["g_b"]): r for r in hll_set_overlap(df, "key", "g").collect()
    }
    ab = out[("a", "b")]
    # truth: |A|=|B|=2000, union=3000, intersect=1000, jaccard=1/3
    assert abs(ab["est_union"] - 3000) / 3000 < 0.2
    # intersection inherits inclusion-exclusion's additive error (the
    # union and both sides each carry ~6.5% of their OWN magnitude)
    assert 400 < ab["est_intersect"] < 1600
    ac = out[("a", "c")]
    assert ac["est_jaccard"] < 0.1
    assert ab["est_jaccard"] > ac["est_jaccard"] + 0.1


def test_table_layout_report_flags_fragmentation_and_clears_after_optimize(
    spark, tmp_path
):
    """A deliberately fragmented partitioned table reads 'compact';
    after optimize_parquet_table the same report reads 'ok' with the
    file count at the report's own ideal."""
    from iot_sensor_log_data_pipeline_spark.operators.compaction import (
        optimize_parquet_table,
        table_layout_report,
    )

    table = str(tmp_path / "frag")
    df = spark.createDataFrame(
        [(i, i % 2, "x" * 50) for i in range(2000)], "id long, p int, pad string"
    )
    # 16 files per partition of a tiny table -> all of them "small"
    df.repartition(16).write.partitionBy("p").parquet(table)

    rep = {r["partition"]: r for r in table_layout_report(spark, table).collect()}
    assert set(rep) == {"p=0", "p=1"}
    for r in rep.values():
        assert r["n_files"] == 16
        assert r["verdict"] == "compact"
        assert r["n_small"] == 16
        assert r["ideal_n_files"] == 1

    optimize_parquet_table(spark, table)
    rep2 = {r["partition"]: r for r in table_layout_report(spark, table).collect()}
    for r in rep2.values():
        assert r["verdict"] == "ok", r
        assert r["n_files"] == 1


def test_chunk_documents_covers_every_token_without_suffix_dups(spark):
    """Chunk boundary contract: every token index is inside some chunk,
    consecutive chunks overlap by chunk_tokens - stride, ends strictly
    increase (no chunk is a suffix-duplicate of its predecessor), and
    the chunk text is the exact token slice."""
    from iot_sensor_log_data_pipeline_spark.operators.text import chunk_documents

    words = " ".join(f"w{i}" for i in range(23))
    docs = spark.createDataFrame(
        [(1, words), (2, "a b c"), (3, "solo")], "doc_id long, text string"
    )
    out = chunk_documents(docs, chunk_tokens=8, stride=5).collect()
    by_doc = {}
    for r in sorted(out, key=lambda r: (r["doc_id"], r["chunk_id"])):
        by_doc.setdefault(r["doc_id"], []).append(r)

    # doc 1: 23 tokens, starts 0,5,10,15 (start 20: chunk 15..22 already
    # reached the end, so no trailing suffix-dup)
    starts = [r["start_tok"] for r in by_doc[1]]
    assert starts == [0, 5, 10, 15]
    covered = set()
    for r in by_doc[1]:
        covered.update(range(r["start_tok"], r["start_tok"] + r["n_tokens"]))
        toks = r["chunk_text"].split(" ")
        assert toks == [f"w{i}" for i in range(r["start_tok"], r["start_tok"] + r["n_tokens"])]
    assert covered == set(range(23))
    ends = [r["start_tok"] + r["n_tokens"] for r in by_doc[1]]
    assert ends == sorted(set(ends))  # strictly increasing

    # short docs: one chunk, full text
    assert [r["chunk_text"] for r in by_doc[2]] == ["a b c"]
    assert by_doc[2][0]["n_tokens"] == 3
    assert [r["chunk_text"] for r in by_doc[3]] == ["solo"]


def test_ks_drift_report_flags_shifted_group(spark):
    """A planted +0.5-range shift in one group dominates the KS
    ranking; same-distribution groups read near zero; a single-group
    input yields no rows (n_rest = 0 is refused, not divided by)."""
    from iot_sensor_log_data_pipeline_spark.operators.profiling import (
        ks_drift_report,
    )

    rows = (
        [("a", i / 1000.0) for i in range(1000)]
        + [("b", (i + 0.5) / 1000.0) for i in range(1000)]  # interleaved, same dist
        + [("c", 0.5 + i / 2000.0) for i in range(1000)]    # shifted half-range up
    )
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r for r in ks_drift_report(df, "v", "g", n_bins=50).collect()}
    assert set(out) == {"a", "b", "c"}
    assert out["c"]["ks_stat"] > 0.4
    assert out["a"]["ks_stat"] < 0.3 and out["b"]["ks_stat"] < 0.3
    assert out["c"]["ks_stat"] > out["a"]["ks_stat"] + 0.2
    assert out["a"]["n"] == 1000

    solo = ks_drift_report(
        spark.createDataFrame([("a", 1.0), ("a", 2.0)], "g string, v double"),
        "v",
        "g",
    )
    assert solo.count() == 0


def test_ks_drift_report_ignores_null_group(spark):
    """Rows with a NULL group key are out of scope, not a phantom
    group: they must not appear as an output row AND must not inflate
    the rest-CDF denominator of real groups.  Regression for the bug
    where null-group mass entered totals/grand but fell out of the
    equi-joined grid, making every group's rest-CDF top out below 1
    (ks_stat silently too high)."""
    from iot_sensor_log_data_pipeline_spark.operators.profiling import (
        ks_drift_report,
    )

    base = [("a", i / 100.0) for i in range(100)] + [
        ("b", (i + 0.5) / 100.0) for i in range(100)
    ]
    clean = spark.createDataFrame(base, "g string, v double")
    noisy = spark.createDataFrame(
        base + [(None, 0.7) for _ in range(500)], "g string, v double"
    )
    ref = {r["g"]: r["ks_stat"] for r in ks_drift_report(clean, "v", "g").collect()}
    got = {r["g"]: r["ks_stat"] for r in ks_drift_report(noisy, "v", "g").collect()}
    assert set(got) == {"a", "b"}  # no null output row
    assert got == ref  # null mass changed nothing


def test_cms_join_size_upper_bounds_exact(spark):
    """The inner-product estimator's contract: est >= exact always
    (collisions only add mass), and with 1024-wide rows over a handful
    of keys the estimate is exact."""
    from iot_sensor_log_data_pipeline_spark.operators.sketch import cms_join_size

    ca = spark.createDataFrame(
        [("a", 10), ("b", 3), ("only-left", 7)], "k string, n long"
    )
    cb = spark.createDataFrame(
        [("a", 4), ("b", 5), ("only-right", 9)], "k string, n long"
    )
    r = cms_join_size(ca, cb, key_col="k").collect()[0]
    assert r["exact_pairs"] == 10 * 4 + 3 * 5
    assert r["est_pairs"] >= r["exact_pairs"]
    assert r["est_pairs"] == r["exact_pairs"]  # no collisions at this scale

    # disjoint key sets: exact 0; the estimate may carry collision mass
    # but must not go negative or null
    r0 = cms_join_size(
        spark.createDataFrame([("x", 2)], "k string, n long"),
        spark.createDataFrame([("y", 2)], "k string, n long"),
        key_col="k",
    ).collect()[0]
    assert r0["exact_pairs"] == 0 and r0["est_pairs"] >= 0


def test_chunk_documents_properties_hypothesis(spark):
    """Property over random doc lengths and window geometries: every
    token index is covered by exactly the chunks a pure-Python
    reference emits -- same starts, same lengths, same text -- and
    ends strictly increase (no suffix-duplicate tails)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from iot_sensor_log_data_pipeline_spark.operators.text import chunk_documents

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=4),
        st.integers(min_value=2, max_value=12),  # chunk_tokens
        st.integers(min_value=1, max_value=12),  # stride (capped below)
    )
    def run(lengths, chunk_tokens, stride):
        stride = min(stride, chunk_tokens)
        docs = spark.createDataFrame(
            [(i, " ".join(f"t{j}" for j in range(n))) for i, n in enumerate(lengths)],
            "doc_id long, text string",
        )
        got = sorted(
            (r["doc_id"], r["chunk_id"], r["start_tok"], r["n_tokens"], r["chunk_text"])
            for r in chunk_documents(
                docs, chunk_tokens=chunk_tokens, stride=stride
            ).collect()
        )

        expect = []
        for i, n in enumerate(lengths):
            toks = [f"t{j}" for j in range(n)]
            prev_end = -1
            ci = 0
            for s in range(0, n, stride):
                if s > 0 and (s - stride) + chunk_tokens >= n:
                    ci += 1
                    continue  # predecessor already reached the end
                chunk = toks[s : s + chunk_tokens]
                end = s + len(chunk)
                assert end > prev_end
                prev_end = end
                expect.append((i, ci, s, len(chunk), " ".join(chunk)))
                ci += 1
        assert got == sorted(expect)
        covered = {
            (d, t)
            for (d, _c, s, ln, _tx) in expect
            for t in range(s, s + ln)
        }
        assert covered == {
            (i, t) for i, n in enumerate(lengths) for t in range(n)
        }

    run()


def test_expire_partitions_dry_run_then_delete(spark, tmp_path):
    """Retention contract: dry run only reports, delete drops exactly
    the sub-cutoff partition directories, surviving data stays
    readable, and an empty-match cutoff is a no-op."""
    from iot_sensor_log_data_pipeline_spark.operators.compaction import (
        expire_partitions,
    )

    table = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"2024-01-0{1 + i % 3}") for i in range(30)],
        "id long, day string",
    )
    df.write.partitionBy("day").parquet(table)

    rep = expire_partitions(spark, table, "day", "2024-01-03").collect()
    assert [(r["partition_value"], r["action"]) for r in rep] == [
        ("2024-01-01", "would-delete"),
        ("2024-01-02", "would-delete"),
    ]
    assert spark.read.parquet(table).count() == 30  # dry run touched nothing

    rep2 = expire_partitions(
        spark, table, "day", "2024-01-03", dry_run=False
    ).collect()
    assert all(r["action"] == "deleted" for r in rep2)
    left = spark.read.parquet(table)
    assert left.count() == 10
    # partition-column type inference reads the value back as a DATE
    assert [str(r["day"]) for r in left.select("day").distinct().collect()] == [
        "2024-01-03"
    ]
    assert expire_partitions(spark, table, "day", "2024-01-01").count() == 0


def test_index_tombstone_deletes_across_family(spark, tmp_path):
    """Tombstone deletes: a deleted id vanishes from LSH and PQ probes
    immediately (logical), including ids living only in stream
    segments; apply_deletes physically retires the rows but KEEPS the
    tombstone table (so a crash-window replay of an in-flight ingest
    batch that contained deleted ids stays masked -- the
    right-to-be-forgotten contract); probe results are identical
    before and after the physical pass; a replayed batch re-inserting
    a victim stays invisible; retire_tombstones=True clears the table
    for the clean-stop case; re-deleting is idempotent."""
    from iot_sensor_log_data_pipeline_spark.io_utils import load
    from iot_sensor_log_data_pipeline_spark.operators import ann_index as AI
    from iot_sensor_log_data_pipeline_spark.operators import similarity as SIM
    from iot_sensor_log_data_pipeline_spark.streaming.pipeline import (
        index_ingest_apply_batch,
    )

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    corpus = emb.where("vec_id >= 5 AND vec_id < 60")
    streamed = emb.where("vec_id >= 60 AND vec_id < 70")
    queries = emb.where("vec_id < 5")

    for kind, build, probe in (
        (
            "lsh",
            lambda p: AI.build_lsh_index(
                corpus, p, bands=16, rows_per_band=4,
                planes=SIM.hash_hyperplanes(64, dim=64),
            ),
            lambda p: AI.query_lsh_index(spark, p, queries, k=50),
        ),
        (
            "pq",
            lambda p: AI.build_pq_index(
                corpus, p, m=8, n_codes=16,
                codebooks=SIM.pq_seed_codebooks(corpus, m=8, k=16),
            ),
            lambda p: AI.query_pq_index(spark, p, queries, k=50, rerank=60),
        ),
    ):
        root = str(tmp_path / f"idx_{kind}")
        build(root)
        index_ingest_apply_batch(streamed, 0, root)

        before = {r["neighbor_id"] for r in probe(root).collect()}
        victims = sorted(before)[:2] + [65]  # one from the stream segment
        vdf = spark.createDataFrame([(int(v),) for v in set(victims)], "vec_id long")
        AI.delete_from_index(vdf, root)
        AI.delete_from_index(vdf, root)  # idempotent

        logical = probe(root)
        got = {r["neighbor_id"] for r in logical.collect()}
        assert not (got & set(victims)), (kind, got & set(victims))
        logical_rows = sorted(tuple(r) for r in logical.collect())

        AI.apply_deletes(spark, root)
        import os as _os

        # default: tombstones survive the physical pass (crash-window
        # replay protection), compacted to a distinct set
        assert _os.path.exists(_os.path.join(root, "tombstones"))
        after_rows = sorted(tuple(r) for r in probe(root).collect())
        assert after_rows == logical_rows, kind
        vec_ids = {
            r["id"] for r in spark.read.parquet(
                _os.path.join(root, "vectors")
            ).collect()
        }
        assert not (vec_ids & set(victims)), kind

        # crash-window replay: the same ingest batch (containing
        # victim 65) fires again after the rewrite -- the retained
        # tombstones must keep it masked at probe time
        index_ingest_apply_batch(streamed, 0, root)
        replayed = {r["neighbor_id"] for r in probe(root).collect()}
        assert not (replayed & set(victims)), (kind, replayed & set(victims))

        # clean-stop retirement: second physical pass scrubs the
        # replayed rows and may now drop the tombstone table
        AI.apply_deletes(spark, root, retire_tombstones=True)
        assert not _os.path.exists(_os.path.join(root, "tombstones"))
        final_rows = sorted(tuple(r) for r in probe(root).collect())
        assert final_rows == logical_rows, kind


def test_graph_index_tombstone_deletes(spark, tmp_path):
    """Graph tombstones: a deleted node never appears in probe results
    (logical), apply_graph_deletes retires it physically, refreshes
    entry points from survivors, keeps the tombstones by default
    (retire_tombstones=True clears them), and the surviving
    neighborhood re-links (probes still return k rows)."""
    import os as _os

    from iot_sensor_log_data_pipeline_spark.io_utils import load
    from iot_sensor_log_data_pipeline_spark.operators import graph_ann as GA

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    corpus = emb.where("vec_id >= 5 AND vec_id < 80")
    queries = emb.where("vec_id < 3")
    root = str(tmp_path / "gidx")
    GA.build_graph_index(corpus, root, k=6, n_entry=8)

    before = GA.query_graph_index(spark, root, queries, k=6).collect()
    victims = sorted({r["neighbor_id"] for r in before})[:2]
    vdf = spark.createDataFrame([(int(v),) for v in victims], "vec_id long")
    GA.delete_from_graph_index(vdf, root)

    logical = GA.query_graph_index(spark, root, queries, k=6).collect()
    assert not ({r["neighbor_id"] for r in logical} & set(victims))
    assert logical, "probe returned nothing under tombstones"

    GA.apply_graph_deletes(spark, root)
    # default: tombstones retained (crash-window replay protection)
    assert _os.path.exists(_os.path.join(root, "tombstones"))
    GA.apply_graph_deletes(spark, root, retire_tombstones=True)
    assert not _os.path.exists(_os.path.join(root, "tombstones"))
    after = GA.query_graph_index(spark, root, queries, k=6).collect()
    assert not ({r["neighbor_id"] for r in after} & set(victims))
    # per query still k results after the repair pass
    from collections import Counter

    per_q = Counter(r["query_id"] for r in after)
    assert all(v == 6 for v in per_q.values()), per_q
    vec_ids = {
        r["id"] for r in spark.read.parquet(_os.path.join(root, "vectors")).collect()
    }
    assert not (vec_ids & set(victims))
    entries = {
        r["id"] for r in spark.read.parquet(_os.path.join(root, "entries")).collect()
    }
    assert len(entries) == 8 and not (entries & set(victims))


def test_text_index_tombstone_deletes(spark, tmp_path):
    """Text-index tombstones: a deleted doc vanishes from BM25 results
    immediately with takedown-correct df; apply_text_deletes retires
    the rows, recomputes N/avgdl from survivors, preserves the
    stop-term policy columns, and keeps the tombstones by default
    (retire_tombstones=True clears them for the clean-stop case)."""
    import os as _os

    from iot_sensor_log_data_pipeline_spark.operators import text_index as TI

    docs = spark.createDataFrame(
        [
            (1, "spark engine spark catalyst"),
            (2, "spark shuffle exchange"),
            (3, "catalyst optimizer rules"),
            (4, "totally unrelated words here"),
        ],
        "doc_id long, text string",
    )
    root = str(tmp_path / "tidx")
    TI.build_text_index(docs, root)

    before = TI.query_text_index(spark, root, ("spark",), k=4).collect()
    assert {r["doc_id"] for r in before} == {1, 2}

    TI.delete_from_text_index(
        spark.createDataFrame([(1,)], "doc_id long"), root
    )
    logical = TI.query_text_index(spark, root, ("spark",), k=4).collect()
    assert {r["doc_id"] for r in logical} == {2}

    TI.apply_text_deletes(spark, root)
    # default: tombstones retained (crash-window replay protection)
    assert _os.path.exists(_os.path.join(root, "tombstones"))
    after = TI.query_text_index(spark, root, ("spark",), k=4).collect()
    assert {r["doc_id"] for r in after} == {2}
    TI.apply_text_deletes(spark, root, retire_tombstones=True)
    assert not _os.path.exists(_os.path.join(root, "tombstones"))
    after = TI.query_text_index(spark, root, ("spark",), k=4).collect()
    assert {r["doc_id"] for r in after} == {2}
    stats = spark.read.parquet(_os.path.join(root, "stats")).head()
    assert stats["n_docs"] == 3.0
    assert "max_df" in stats.asDict()  # policy columns preserved
    ids = {
        r["id"]
        for r in spark.read.parquet(_os.path.join(root, "doclens")).collect()
    }
    assert ids == {2, 3, 4}


def test_winnowing_index_tombstone_deletes(spark, tmp_path):
    """Winnowing tombstones: a deleted doc stops matching immediately
    (all probes read through the filtered loader), the physical pass
    retires its postings and keeps the tombstones by default
    (retire_tombstones=True clears them for the clean-stop case)."""
    import os as _os

    root = str(tmp_path / "widx")
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy dog again and again"),
            (3, "completely different content with no shared runs at all okay"),
        ],
        "doc_id long, text string",
    )
    DD.build_winnowing_index(docs, root, k=4, w=4)

    probe = spark.createDataFrame(
        [(99, "the quick brown fox jumps over the lazy dog again and again")],
        "doc_id long, text string",
    )

    def matched_corpus_ids():
        postings, k, w = DD.load_winnowing_index(spark, root)
        pf = DD.winnowing_fingerprints(probe, k, w).select("fp")
        return {
            r["doc_id"] for r in postings.join(pf, "fp").collect()
        }

    assert matched_corpus_ids() == {1, 2}

    DD.delete_from_winnowing_index(
        spark.createDataFrame([(1,)], "doc_id long"), root
    )
    assert matched_corpus_ids() == {2}

    DD.apply_winnowing_deletes(spark, root)
    # default: tombstones retained (crash-window replay protection)
    assert _os.path.exists(_os.path.join(root, "tombstones"))
    assert matched_corpus_ids() == {2}
    DD.apply_winnowing_deletes(spark, root, retire_tombstones=True)
    assert not _os.path.exists(_os.path.join(root, "tombstones"))
    assert matched_corpus_ids() == {2}
    ids = {
        r["doc_id"]
        for r in spark.read.parquet(_os.path.join(root, "postings")).collect()
    }
    assert 1 not in ids


def test_hll_registers_merge_property_hypothesis(spark):
    """The mergeability invariant every HLL consumer (streaming sink,
    overlap algebra) rests on, stated exactly: registers(A union B) ==
    max-merge(registers(A), registers(B)) -- bit-for-bit, for random
    key multisets including overlap and duplicates."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from iot_sensor_log_data_pipeline_spark.operators.sketch import hll_registers

    @settings(max_examples=6, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=50), max_size=40),
        st.lists(st.integers(min_value=20, max_value=80), max_size=40),
    )
    def run(keys_a, keys_b):
        if not keys_a and not keys_b:
            return
        fa = spark.createDataFrame([(f"k{k}",) for k in keys_a] or [("__none__",)], "key string")
        fb = spark.createDataFrame([(f"k{k}",) for k in keys_b] or [("__none__",)], "key string")
        if not keys_a:
            fa = fa.where("key <> '__none__'")
        if not keys_b:
            fb = fb.where("key <> '__none__'")
        direct = {
            (r["register"], r["max_rank"])
            for r in hll_registers(fa.unionByName(fb), "key").collect()
        }
        from pyspark.sql import functions as F2

        merged = {
            (r["register"], r["max_rank"])
            for r in hll_registers(fa, "key")
            .unionByName(hll_registers(fb, "key"))
            .groupBy("register")
            .agg(F2.max("max_rank").alias("max_rank"))
            .collect()
        }
        assert direct == merged

    run()


def test_derived_partsupp_invariants(spark):
    """The partsupp stand-in's contract: one row per distinct
    (l_partkey, l_suppkey) pair in lineitem, md5-derived attributes in
    their documented domains, and bit-stable across derivations (the
    DuckDB oracles replay the same formulas, so any nondeterminism
    here would flake all five TPC-H rows)."""
    from iot_sensor_log_data_pipeline_spark.io_utils import load
    from iot_sensor_log_data_pipeline_spark.plans.partsupp_queries import (
        derived_partsupp,
    )

    sf = "/root/testdata/sf0.001"
    ps = derived_partsupp(spark, sf)
    rows = ps.collect()
    pairs = {(r["ps_partkey"], r["ps_suppkey"]) for r in rows}
    assert len(pairs) == len(rows)  # key uniqueness
    expected = {
        (r["l_partkey"], r["l_suppkey"])
        for r in load(spark, sf, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
        .collect()
    }
    assert pairs == expected
    assert all(1 <= r["ps_availqty"] <= 9999 for r in rows)
    assert all(100.0 <= r["ps_supplycost"] < 1000.0 for r in rows)
    again = {tuple(r) for r in derived_partsupp(spark, sf).collect()}
    assert again == {tuple(r) for r in rows}  # deterministic replay


def test_incremental_join_cdc_delta_identity(spark):
    """The CDC view-maintenance contract: applying the retract/insert
    delta to the stored join reproduces the full re-join exactly
    (multiset), across update (including a join-key MOVE), delete,
    and delete-then-reinsert batches."""
    from iot_sensor_log_data_pipeline_spark.operators.scd import (
        apply_cdc,
        incremental_join_cdc_delta,
    )

    a = spark.createDataFrame(
        [(1, 10, 5.0), (2, 10, 6.0), (3, 20, 7.0), (4, 30, 8.0)],
        "pk long, k long, v double",
    )
    b = spark.createDataFrame(
        [(10, "x"), (20, "y"), (30, "z"), (40, "w")], "k long, name string"
    )

    def view(af, bf):
        return sorted(tuple(r) for r in af.join(bf, "k").collect())

    def apply_delta(old_rows, delta):
        rows = list(old_rows)
        for r in delta.collect():
            t = tuple(r)[1:]  # drop action
            if r["action"] == "retract":
                rows.remove(t)  # multiset remove; raises if absent
            else:
                rows.append(t)
        return sorted(rows)

    # batch 1: update pk=1 moving join key 10 -> 20 (two key groups
    # touched), delete pk=3, plain value update pk=4; delete customer 40
    cdc_a1 = spark.createDataFrame(
        [(1, 20, 5.5, "update"), (3, None, None, "delete"),
         (4, 30, 9.0, "update")],
        "pk long, k long, v double, op string",
    )
    cdc_b1 = spark.createDataFrame([(40, None, "delete")],
                                   "k long, name string, op string")
    d1 = incremental_join_cdc_delta(a, cdc_a1, b, cdc_b1,
                                    on="k", pk_a="pk", pk_b="k")
    a1 = apply_cdc(a, cdc_a1, "pk")
    b1 = apply_cdc(b, cdc_b1, "k")
    assert apply_delta(view(a, b), d1) == view(a1, b1)

    # batch 2: reinsert pk=3 under a different join key + new customer
    cdc_a2 = spark.createDataFrame([(3, 40, 7.5, "insert")],
                                   "pk long, k long, v double, op string")
    cdc_b2 = spark.createDataFrame([(40, "w2", "insert")],
                                   "k long, name string, op string")
    d2 = incremental_join_cdc_delta(a1, cdc_a2, b1, cdc_b2,
                                    on="k", pk_a="pk", pk_b="k")
    a2 = apply_cdc(a1, cdc_a2, "pk")
    b2 = apply_cdc(b1, cdc_b2, "k")
    assert apply_delta(view(a1, b1), d2) == view(a2, b2)
    # the reinserted row is visible in the final view
    assert any(r[0] == 40 and r[1] == 3 for r in view(a2, b2))


def test_incremental_join_cdc_delta_property_hypothesis(spark):
    """The CDC view-maintenance identity, stated exactly for random
    CDC batches on both sides: apply(V_old, delta) == full re-join of
    the CDC-applied bases (multiset), for arbitrary mixes of inserts,
    deletes, and updates -- including updates that move the join key
    and keys shared by many rows on the A side."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from iot_sensor_log_data_pipeline_spark.operators.scd import (
        apply_cdc,
        incremental_join_cdc_delta,
    )

    keys = st.integers(min_value=0, max_value=5)

    @settings(max_examples=6, deadline=None)
    @given(
        # base A: up to 8 rows, pks 0..7, many-per-join-key allowed
        st.lists(keys, min_size=1, max_size=8),
        # ops on A: (pk, op, new_key) -- op 0=del, 1=update, 2=insert
        st.lists(
            st.tuples(st.integers(0, 11), st.integers(0, 2), keys),
            max_size=6,
        ),
        # B-side deletes + inserts over join keys
        st.lists(st.tuples(keys, st.integers(0, 1)), max_size=4),
    )
    def run(a_keys, a_ops, b_ops):
        a_rows = [(pk, k, float(pk * 10 + k)) for pk, k in enumerate(a_keys)]
        b_rows = [(k, f"n{k}") for k in range(6)]
        a = spark.createDataFrame(a_rows, "pk long, k long, v double")
        b = spark.createDataFrame(b_rows, "k long, name string")

        seen_a: dict[int, tuple] = {}
        existing = {pk for pk, _, _ in a_rows}
        for pk, op, nk in a_ops:
            if pk in seen_a:
                continue  # one op per pk per batch (CDC batch contract)
            if op == 0 and pk in existing:
                seen_a[pk] = (pk, None, None, "delete")
            elif op == 1 and pk in existing:
                seen_a[pk] = (pk, nk, float(pk + 100), "update")
            elif op == 2 and pk not in existing:
                seen_a[pk] = (pk, nk, float(pk + 200), "insert")
        seen_b: dict[int, tuple] = {}
        for k, op in b_ops:
            if k in seen_b:
                continue
            if op == 0 and k < 6:
                seen_b[k] = (k, None, "delete")
            elif op == 1 and k >= 6:
                seen_b[k] = (k, f"new{k}", "insert")
        cdc_a = spark.createDataFrame(
            list(seen_a.values()) or [(999, 0, 0.0, "insert")],
            "pk long, k long, v double, op string",
        )
        cdc_b = spark.createDataFrame(
            list(seen_b.values()) or [(99, "x", "insert")],
            "k long, name string, op string",
        )

        delta = incremental_join_cdc_delta(
            a, cdc_a, b, cdc_b, on="k", pk_a="pk", pk_b="k"
        ).collect()
        old_view = sorted(tuple(r) for r in a.join(b, "k").collect())
        a2, b2 = apply_cdc(a, cdc_a, "pk"), apply_cdc(b, cdc_b, "k")
        new_view = sorted(tuple(r) for r in a2.join(b2, "k").collect())

        applied = list(old_view)
        for r in delta:
            t = tuple(r)[1:]
            if r["action"] == "retract":
                applied.remove(t)  # raises ValueError if over-retracted
            else:
                applied.append(t)
        assert sorted(applied) == new_view

    run()


def test_text_index_optimize_absorbs_segments(spark, tmp_path):
    """optimize_text_index folds streaming segments into the main
    tables: trees removed, stats row refreshed to the union corpus
    (probes regain the fast stats path), BM25 results unchanged, and
    a cap re-evaluated against the TRUE (union) corpus size."""
    import os as _os

    from iot_sensor_log_data_pipeline_spark.operators import text_index as TI

    root = str(tmp_path / "tidx_absorb")
    TI.build_text_index(
        spark.createDataFrame(
            [(1, "spark engine catalyst"), (2, "unrelated words entirely")],
            "doc_id long, text string",
        ),
        root,
    )
    TI.text_ingest_apply_batch(
        spark.createDataFrame(
            [(7, "spark spark streaming arrival")], "doc_id long, text string"
        ),
        0,
        root,
    )
    before = sorted(
        tuple(r) for r in TI.query_text_index(spark, root, ("spark",), k=5).collect()
    )
    TI.optimize_text_index(spark, root)
    assert not _os.path.exists(_os.path.join(root, "postings_stream"))
    assert not _os.path.exists(_os.path.join(root, "doclens_stream"))
    after = sorted(
        tuple(r) for r in TI.query_text_index(spark, root, ("spark",), k=5).collect()
    )
    assert after == before
    stats = spark.read.parquet(_os.path.join(root, "stats")).head()
    assert stats["n_docs"] == 3.0  # union corpus, not the stale build row


def test_winnowing_optimize_absorbs_segments_and_stream_ledger(spark, tmp_path):
    """optimize_winnowing_index absorbs streamed postings AND the
    batch-keyed overflow ledger: a fingerprint whose TRUE df (stored +
    stream-skipped) exceeds the cap loses its pre-existing postings
    too, and all segment/ledger trees are cleared."""
    import os as _os

    from iot_sensor_log_data_pipeline_spark.operators import dedup as DD

    root = str(tmp_path / "widx_absorb")
    hot = "aa bb cc dd ee ff gg hh"  # one shared run across every doc
    base = spark.createDataFrame(
        [(1, hot), (2, hot)], "doc_id long, text string"
    )
    DD.build_winnowing_index(base, root, k=4, w=4, max_fp_df=3)

    # stream three more copies: total df for the hot fps would be 5 > 3,
    # so the batch is SKIPPED (cap guard) and lands in the ledger
    DD.winnowing_ingest_apply_batch(
        spark.createDataFrame(
            [(3, hot), (4, hot), (5, hot)], "doc_id long, text string"
        ),
        0,
        root,
    )
    assert _os.path.isdir(_os.path.join(root, "overflow_stream"))

    DD.optimize_winnowing_index(spark, root)
    assert not _os.path.exists(_os.path.join(root, "postings_stream"))
    assert not _os.path.exists(_os.path.join(root, "overflow_stream"))
    # true df 5 > cap 3: the hot fingerprints' stored postings dropped
    postings = spark.read.parquet(_os.path.join(root, "postings"))
    assert postings.count() == 0


def test_ivfpq_exhaustive_settings_equal_exact_l2(spark):
    """IVFPQ degenerates to exact search when nothing is pruned:
    probing ALL cells with a corpus-sized re-rank shortlist must
    return exactly the brute-force L2 top-k -- the correctness frame
    around the approximation (cell pruning and ADC then only ever
    SHORTLIST; the exact pass decides)."""
    import numpy as np

    from iot_sensor_log_data_pipeline_spark.io_utils import load
    from iot_sensor_log_data_pipeline_spark.operators import similarity as SIM
    from pyspark.sql import functions as F2

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    rows = emb.collect()
    V = {r["vec_id"]: np.array(r["embedding"], dtype="float64") for r in rows}
    queries = emb.where(F2.col("vec_id") < 3)
    got = SIM.ivfpq_topk(
        emb, queries, k=5, n_cells=8, n_probe=8, n_codes=16,
        rerank=len(rows),
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    for qid in (0, 1, 2):
        exact = sorted(
            (float(np.sum((V[qid] - v) ** 2)), nid)
            for nid, v in V.items()
            if nid != qid
        )[:5]
        want = [nid for _, nid in exact]
        assert [n for _, n in sorted(by_q[qid])] == want, qid


def test_persisted_ivfpq_parity_ingest_and_takedown(spark, tmp_path):
    """The persisted IVF-PQ twin: probing the on-disk index with the
    same seed quantizer pair and budgets is row-identical to the
    ad-hoc ivfpq_topk; a stream-ingested vector is probe-findable at
    rank 1 for its own embedding; a tombstoned streamed id vanishes
    logically and stays gone through the physical pass."""
    import os as _os

    from iot_sensor_log_data_pipeline_spark.io_utils import load
    from iot_sensor_log_data_pipeline_spark.operators import ann_index as AI
    from iot_sensor_log_data_pipeline_spark.operators import similarity as SIM
    from iot_sensor_log_data_pipeline_spark.streaming.pipeline import (
        index_ingest_apply_batch,
    )
    from pyspark.sql import functions as F2

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    corpus = emb.where("vec_id >= 5 AND vec_id < 60")
    streamed = emb.where("vec_id >= 60 AND vec_id < 64")
    queries = emb.where("vec_id < 3")
    root = str(tmp_path / "ivfpq_idx")

    cents, cbs = SIM.ivfpq_seed_quantizers(corpus, n_cells=8, m=8, n_codes=16)
    adhoc = sorted(
        tuple(r)
        for r in SIM.ivfpq_topk(
            corpus, queries, k=5, n_probe=4, rerank=30,
            centroids=cents, codebooks=cbs,
        ).collect()
    )
    AI.build_ivfpq_index(
        corpus, root, n_cells=8, m=8, n_codes=16,
        centroids=cents, codebooks=cbs,
    )
    persisted = sorted(
        tuple(r)
        for r in AI.query_ivfpq_index(
            spark, root, queries, k=5, n_probe=4, rerank=30
        ).collect()
    )
    assert persisted == adhoc

    # streaming ingest: the dispatcher's ivfpq branch
    index_ingest_apply_batch(streamed, 0, root)
    probe = emb.where("vec_id = 61").selectExpr(
        "vec_id + 1000 AS vec_id", "embedding"
    )
    hits = AI.query_ivfpq_index(spark, root, probe, k=5, n_probe=8, rerank=30)
    top = [r for r in hits.collect() if r["rank"] == 1][0]
    assert top["neighbor_id"] == 61

    # takedown: masked logically, still masked after the physical pass
    AI.delete_from_index(
        spark.createDataFrame([(61,)], "vec_id long"), root
    )
    got = {r["neighbor_id"]
           for r in AI.query_ivfpq_index(spark, root, probe, k=5,
                                         n_probe=8, rerank=30).collect()}
    assert 61 not in got
    AI.apply_deletes(spark, root)
    got = {r["neighbor_id"]
           for r in AI.query_ivfpq_index(spark, root, probe, k=5,
                                         n_probe=8, rerank=30).collect()}
    assert 61 not in got
    ids = {r["id"] for r in spark.read.parquet(
        _os.path.join(root, "codes")).collect()}
    assert 61 not in ids


def test_rrf_fuse_union_semantics_and_ordering(spark):
    """RRF contract: score = sum over lists of 1/(k0 + rank); a doc
    missing from one list contributes only its present term; agreement
    shows in n_sources; ordering is score-desc with id tiebreak."""
    from iot_sensor_log_data_pipeline_spark.operators.text import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank long")
    b = spark.createDataFrame([(2, 1), (4, 2)], "doc_id long, rank long")
    out = {r["doc_id"]: r for r in rrf_fuse([a, b], k0=60, k=10).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[2]["n_sources"] == 2 and out[1]["n_sources"] == 1
    assert abs(out[2]["rrf_score"] - round(1 / 62 + 1 / 61, 6)) < 1e-9
    assert abs(out[1]["rrf_score"] - round(1 / 61, 6)) < 1e-9
    ordered = [r["doc_id"] for r in rrf_fuse([a, b], k0=60, k=10).collect()]
    assert ordered[0] == 2  # two sources beat any single source here
    # id tiebreak: docs 1 and 4(b rank2=1/62) vs 3... explicit check:
    # scores: 2: 1/62+1/61, 1: 1/61, 4: 1/62, 3: 1/63
    assert ordered == [2, 1, 4, 3]


def test_rrf_fuse_empty_input_raises(spark):
    """ADVICE r10: an empty ranked-list list must fail with a clear
    ValueError, not an opaque NoneType AttributeError."""
    import pytest as _pytest

    from iot_sensor_log_data_pipeline_spark.operators.text import rrf_fuse

    with _pytest.raises(ValueError, match="at least one ranked list"):
        rrf_fuse([])


def test_ivfpq_topk_quantizer_guards(spark):
    """ADVICE r10: ivfpq_topk must (a) refuse codebooks without
    centroids (residual codebooks live in the space the centroids
    define), and (b) derive the per-subspace code count from the
    supplied codebooks -- a 64-code codebook passed with the default
    n_codes=16 param used to mis-decode (subspace, code) silently."""
    import pytest as _pytest

    from iot_sensor_log_data_pipeline_spark.io_utils import load
    from iot_sensor_log_data_pipeline_spark.operators import similarity as SIM

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    corpus = emb.where("vec_id >= 5 AND vec_id < 60")
    queries = emb.where("vec_id < 2")
    cents, cbs = SIM.ivfpq_seed_quantizers(corpus, n_cells=8, m=8, n_codes=32)

    with _pytest.raises(ValueError, match="together"):
        SIM.ivfpq_topk(corpus, queries, codebooks=cbs)
    with _pytest.raises(ValueError, match="together"):
        SIM.ivfpq_topk(corpus, queries, centroids=cents)

    # n_codes derived from the codebooks: leaving the param at its
    # default (16) must give the same rows as stating 32 explicitly.
    derived = sorted(
        tuple(r)
        for r in SIM.ivfpq_topk(
            corpus, queries, k=5, n_probe=4, rerank=30,
            centroids=cents, codebooks=cbs,
        ).collect()
    )
    explicit = sorted(
        tuple(r)
        for r in SIM.ivfpq_topk(
            corpus, queries, k=5, n_probe=4, rerank=30, n_codes=32,
            centroids=cents, codebooks=cbs,
        ).collect()
    )
    assert derived == explicit and derived


def test_apply_cdc_per_pk_ordering_contract(spark):
    """ADVICE r10: apply_cdc cannot order same-pk ops within a batch,
    so (a) without seq_col a multi-op pk raises instead of silently
    resolving delete-last, and (b) with seq_col the highest-sequence
    op wins -- delete-then-reinsert resolves to the reinsert, and
    reinsert-then-delete resolves to the delete."""
    import pytest as _pytest

    from iot_sensor_log_data_pipeline_spark.operators.scd import apply_cdc

    base = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "pk long, v double"
    )
    multi = spark.createDataFrame(
        [(1, None, "delete", 1), (1, 11.0, "insert", 2)],
        "pk long, v double, op string, seq long",
    )
    with _pytest.raises(ValueError, match="at most one op per pk"):
        apply_cdc(base, multi.drop("seq"), "pk")

    # delete@1 then reinsert@2: the reinsert survives
    got = {r["pk"]: r["v"] for r in apply_cdc(base, multi, "pk", seq_col="seq").collect()}
    assert got == {1: 11.0, 2: 20.0}

    # reinsert@1 then delete@2: the delete survives
    rev = spark.createDataFrame(
        [(1, 11.0, "insert", 1), (1, None, "delete", 2)],
        "pk long, v double, op string, seq long",
    )
    got = {r["pk"]: r["v"] for r in apply_cdc(base, rev, "pk", seq_col="seq").collect()}
    assert got == {2: 20.0}

    # seq_col output hygiene: the sequence column is dropped
    cols = apply_cdc(base, multi, "pk", seq_col="seq").columns
    assert "seq" not in cols


def test_text_index_probe_correct_in_crashed_absorb_window(spark, tmp_path):
    """ADVICE r10: a crash between the absorb's main-table rewrites
    and the segment-tree removal leaves absorbed rows in BOTH places.
    The ``_absorbing`` marker makes probes dedup the union, so BM25
    stays exactly right in the half-absorbed state; re-running the
    optimize remains the recovery and clears the marker."""
    import os as _os
    import shutil as _shutil

    from iot_sensor_log_data_pipeline_spark.operators import text_index as TI

    root = str(tmp_path / "tidx_crash")
    TI.build_text_index(
        spark.createDataFrame(
            [(1, "spark engine catalyst"), (2, "unrelated words entirely")],
            "doc_id long, text string",
        ),
        root,
    )
    TI.text_ingest_apply_batch(
        spark.createDataFrame(
            [(7, "spark spark streaming arrival")], "doc_id long, text string"
        ),
        0,
        root,
    )
    healthy = sorted(
        tuple(r) for r in TI.query_text_index(spark, root, ("spark",), k=5).collect()
    )

    # Crash injection: fail the optimize exactly at segment removal,
    # after every main-table rewrite has landed.
    real_rmtree = _shutil.rmtree

    def crashing_rmtree(p, *a, **kw):
        if str(p).endswith("_stream"):
            raise OSError("injected crash before segment removal")
        return real_rmtree(p, *a, **kw)

    _shutil.rmtree = crashing_rmtree
    try:
        import pytest as _pytest

        with _pytest.raises(OSError, match="injected crash"):
            TI.optimize_text_index(spark, root)
    finally:
        _shutil.rmtree = real_rmtree

    # Half-absorbed: marker held, segments still present, main tables
    # already absorbed -- the probe must NOT double-count tf/df.
    assert _os.path.exists(_os.path.join(root, "_absorbing"))
    assert _os.path.exists(_os.path.join(root, "postings_stream"))
    during = sorted(
        tuple(r) for r in TI.query_text_index(spark, root, ("spark",), k=5).collect()
    )
    assert during == healthy

    # Re-run is the recovery: segments gone, marker gone, results same.
    TI.optimize_text_index(spark, root)
    assert not _os.path.exists(_os.path.join(root, "_absorbing"))
    assert not _os.path.exists(_os.path.join(root, "postings_stream"))
    after = sorted(
        tuple(r) for r in TI.query_text_index(spark, root, ("spark",), k=5).collect()
    )
    assert after == healthy


def test_hybrid_rrf_persisted_matches_adhoc_retriever_composition(spark):
    """The persisted hybrid serving path (text_hybrid_rrf_persisted)
    is row-identical to fusing the AD-HOC retrievers at the same
    geometry -- bm25_rank and lsh_topk with the identical term bag,
    band count, and md5 hyperplanes -- proving the index probes add
    nothing beyond build-once amortization (the per-retriever
    probe==ad-hoc identities composed end-to-end)."""
    from pyspark.sql import functions as F2
    from pyspark.sql.window import Window

    from iot_sensor_log_data_pipeline_spark.io_utils import load, parallelize_small
    from iot_sensor_log_data_pipeline_spark.operators import text as TX
    from iot_sensor_log_data_pipeline_spark.operators.similarity import (
        hash_hyperplanes,
        lsh_topk,
    )
    from iot_sensor_log_data_pipeline_spark.plans import catalog
    from iot_sensor_log_data_pipeline_spark.plans.text_queries import (
        _BM25_B,
        _BM25_K1,
        _BM25_TERMS,
        _RRF_QUERY_TEXT,
    )

    sf_dir = "/root/testdata/sf0.001"
    persisted = sorted(
        tuple(r)
        for r in catalog.all_entries()["text_hybrid_rrf_persisted"]
        .fn(spark, sf_dir)
        .collect()
    )

    docs = parallelize_small(load(spark, sf_dir, "documents"))
    sparse = TX.bm25_rank(docs, _BM25_TERMS, k=15, k1=_BM25_K1, b=_BM25_B)
    w = Window.partitionBy(F2.lit(1)).orderBy(
        F2.desc("bm25"), F2.asc("doc_id")
    )
    sparse = sparse.withColumn("rank", F2.row_number().over(w)).select(
        "doc_id", "rank"
    )
    demb = TX.hash_embedding(docs, dim=64)
    qemb = TX.hash_embedding(
        spark.createDataFrame(
            [(-1, _RRF_QUERY_TEXT)], "doc_id long, text string"
        ),
        dim=64,
    )
    dense = lsh_topk(
        demb,
        queries=qemb,
        k=15,
        id_col="doc_id",
        bands=16,
        rows_per_band=4,
        planes=hash_hyperplanes(64, dim=64),
    ).select(F2.col("neighbor_id").alias("doc_id"), "rank")
    adhoc = sorted(
        tuple(r) for r in TX.rrf_fuse([sparse, dense], k=10).collect()
    )
    assert persisted == adhoc and persisted


def test_opq_seed_rotation_properties_and_exhaustive_equality(spark):
    """The pinned OPQ rotation is exactly orthogonal with +-1/8
    entries (signed Walsh-Hadamard), and opq_seed_adc_topk under
    exhaustive settings (corpus-sized re-rank) returns the exact
    brute-force L2 neighbor ORDER -- the rotation preserves L2, so
    ADC only ever shortlists and the exact pass decides."""
    import numpy as np

    from iot_sensor_log_data_pipeline_spark.io_utils import load
    from iot_sensor_log_data_pipeline_spark.operators import similarity as SIM

    R = np.array(SIM.opq_seed_rotation(64))
    assert np.abs(R @ R.T - np.eye(64)).max() == 0.0  # exactly orthogonal
    assert set(np.abs(R).ravel().tolist()) == {0.125}

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    corpus = emb.where("vec_id < 80")
    queries = emb.where("vec_id < 3")
    rows = {r["vec_id"]: np.array(r["embedding"], dtype="float64")
            for r in corpus.collect()}
    got = SIM.opq_seed_adc_topk(
        corpus, queries, k=5, m=8, n_codes=16, rerank=len(rows)
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    for qid in (0, 1, 2):
        exact = sorted(
            (float(np.sum((rows[qid] - v) ** 2)), nid)
            for nid, v in rows.items()
            if nid != qid
        )[:5]
        want = [nid for _, nid in exact]
        assert [n for _, n in sorted(by_q[qid])] == want


def test_ivfpq_geometry_plan_and_multi_assign_recall(spark):
    """ivfpq_geometry derives a power-of-two cell count ~4 sqrt(N)
    with probes filling the scan budget; multi-assignment (the
    round-11 coarse-recall lever) strictly lifts recall over single
    assignment at the same cells/probes on the real corpus, and
    exhaustive settings still degenerate to exact search."""
    import numpy as np

    from iot_sensor_log_data_pipeline_spark.io_utils import load
    from iot_sensor_log_data_pipeline_spark.operators import similarity as SIM

    g = SIM.ivfpq_geometry(2000)
    assert g == {"n_cells": 256, "n_probe": 32, "n_assign": 2, "rerank": 200}
    assert SIM.ivfpq_geometry(100)["n_cells"] >= 16  # clamp floor
    big = SIM.ivfpq_geometry(10**9)
    assert big["n_cells"] == 65536  # clamp ceiling
    assert big["n_assign"] * big["n_probe"] / big["n_cells"] <= 0.25 + 1e-9

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    corpus = emb.cache()
    queries = emb.where("vec_id < 10")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.brute_force_topk(corpus, queries, k=5).collect()
    }
    cents, cbs = SIM.ivfpq_trained_quantizers(corpus, n_cells=16, m=8, n_codes=32)
    rec = {}
    for n_assign in (1, 2):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in SIM.ivfpq_topk(
                corpus, queries, k=5, n_probe=4, rerank=100,
                n_assign=n_assign, centroids=cents, codebooks=cbs,
            ).collect()
        }
        rec[n_assign] = len(exact & got) / len(exact)
    assert rec[2] >= rec[1]

    # Exhaustive frame with multi-assignment: probing ALL cells with a
    # corpus-sized shortlist must still return exact L2 top-k (the
    # per-cell MIN reduction may not corrupt distances).
    rows = {r["vec_id"]: np.array(r["embedding"], dtype="float64")
            for r in corpus.where("vec_id < 80").collect()}
    small = corpus.where("vec_id < 80")
    got = SIM.ivfpq_topk(
        small, small.where("vec_id < 3"), k=5, n_cells=8, n_probe=8,
        n_codes=16, rerank=len(rows), n_assign=2,
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    for qid in (0, 1, 2):
        want = [nid for _, nid in sorted(
            (float(np.sum((rows[qid] - v) ** 2)), nid)
            for nid, v in rows.items() if nid != qid
        )[:5]]
        assert [n for _, n in sorted(by_q[qid])] == want


def test_ivfpq_geometry_hits_target_on_clustered_data(spark):
    """The derived IVF-PQ plan reaches recall@10 >= 0.9 at a 25% scan
    budget on CLUSTERED vectors -- the shape real encoders emit and
    the case the coarse quantizer exists for.  (The bench corpus is
    near-isotropic, which caps its coarse ceiling at ~0.79 @ 25%;
    this test pins the claim that the geometry, not the operator, is
    corpus-bound there.)"""
    import numpy as np

    from iot_sensor_log_data_pipeline_spark.operators import similarity as SIM

    rng = np.random.RandomState(7)
    n_clusters, per = 40, 50
    centers = rng.normal(0, 10.0, size=(n_clusters, 64))
    X = np.vstack([
        centers[c] + rng.normal(0, 0.8, size=(per, 64))
        for c in range(n_clusters)
    ])
    n = len(X)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).cache()
    queries = df.where("vec_id < 20")

    exact = set()
    for q in range(20):
        d = sorted(
            (float(np.sum((X[q] - X[j]) ** 2)), j)
            for j in range(n) if j != q
        )[:10]
        exact |= {(q, j) for _, j in d}

    geo = SIM.ivfpq_geometry(n, scan_fraction=0.25, k=10)
    cents, cbs = SIM.ivfpq_trained_quantizers(
        df, n_cells=geo["n_cells"], m=8, n_codes=64
    )
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.ivfpq_topk(
            df, queries, k=10,
            n_cells=geo["n_cells"], n_probe=geo["n_probe"],
            rerank=geo["rerank"], n_assign=geo["n_assign"],
            centroids=cents, codebooks=cbs,
        ).collect()
    }
    recall = len(exact & got) / len(exact)
    assert recall >= 0.9, f"clustered-corpus recall {recall} < 0.9"


def test_ann_index_absorb_stream_segments_parity_replay_and_crash(spark, tmp_path):
    """absorb_stream_segments retires the segment trees of an
    ingest-fed index: (a) probe results are unchanged by the absorb,
    (b) a batch REPLAYED after its absorb recreates its directory but
    never double-counts (the manifest excludes its id forever), and
    (c) a crash inside the absorb window leaves probes correct (the
    marker dedups) and re-running completes the job."""
    import os as _os
    import shutil as _shutil

    import pytest as _pytest

    from iot_sensor_log_data_pipeline_spark.io_utils import load
    from iot_sensor_log_data_pipeline_spark.operators import ann_index as AI
    from iot_sensor_log_data_pipeline_spark.operators import similarity as SIM
    from iot_sensor_log_data_pipeline_spark.streaming.pipeline import (
        index_ingest_apply_batch,
    )

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    corpus = emb.where("vec_id >= 10 AND vec_id < 60")
    batch0 = emb.where("vec_id >= 60 AND vec_id < 64")
    batch1 = emb.where("vec_id >= 64 AND vec_id < 68")
    queries = emb.where("vec_id < 3")
    root = str(tmp_path / "lsh_absorb")

    AI.build_lsh_index(
        corpus, root, bands=16, rows_per_band=4,
        planes=SIM.hash_hyperplanes(64, dim=64),
    )
    index_ingest_apply_batch(batch0, 0, root)
    index_ingest_apply_batch(batch1, 1, root)
    before = sorted(
        tuple(r)
        for r in AI.query_lsh_index(spark, root, queries, k=5).collect()
    )

    # (c) crash injection FIRST: fail exactly at segment-tree removal,
    # after the main rewrites and the manifest landed.
    real_rmtree = _shutil.rmtree

    def crashing_rmtree(p, *a, **kw):
        if str(p).endswith("_stream"):
            raise OSError("injected crash before segment removal")
        return real_rmtree(p, *a, **kw)

    _shutil.rmtree = crashing_rmtree
    try:
        with _pytest.raises(OSError, match="injected crash"):
            AI.absorb_stream_segments(spark, root)
    finally:
        _shutil.rmtree = real_rmtree
    assert _os.path.exists(_os.path.join(root, "_absorbing"))
    assert _os.path.exists(_os.path.join(root, "entries_stream"))
    during = sorted(
        tuple(r)
        for r in AI.query_lsh_index(spark, root, queries, k=5).collect()
    )
    assert during == before  # half-absorbed state probes correctly

    # re-run is the recovery: trees gone, marker gone, parity holds (a)
    AI.absorb_stream_segments(spark, root)
    assert not _os.path.exists(_os.path.join(root, "_absorbing"))
    assert not _os.path.exists(_os.path.join(root, "entries_stream"))
    assert not _os.path.exists(_os.path.join(root, "vectors_stream"))
    after = sorted(
        tuple(r)
        for r in AI.query_lsh_index(spark, root, queries, k=5).collect()
    )
    assert after == before

    # (b) replay batch 0 after its absorb: the directory reappears but
    # the manifest keeps its rows out of every probe.
    index_ingest_apply_batch(batch0, 0, root)
    assert _os.path.exists(_os.path.join(root, "entries_stream"))
    replayed = sorted(
        tuple(r)
        for r in AI.query_lsh_index(spark, root, queries, k=5).collect()
    )
    assert replayed == before

    # a genuinely NEW batch after the absorb stays probe-visible
    batch2 = emb.where("vec_id >= 68 AND vec_id < 70")
    index_ingest_apply_batch(batch2, 2, root)
    probe = emb.where("vec_id = 68").selectExpr(
        "vec_id + 1000 AS vec_id", "embedding"
    )
    hits = AI.query_lsh_index(spark, root, probe, k=3)
    assert 68 in {r["neighbor_id"] for r in hits.collect()}

    # absorbing again folds the replay artifact + the new batch:
    # results must be IDENTICAL across that absorb (same corpus, 68/69
    # now in the main tables instead of a segment tree).
    pre_absorb2 = sorted(
        tuple(r)
        for r in AI.query_lsh_index(spark, root, queries, k=5).collect()
    )
    AI.absorb_stream_segments(spark, root)
    assert not _os.path.exists(_os.path.join(root, "entries_stream"))
    hits = AI.query_lsh_index(spark, root, probe, k=3)
    assert 68 in {r["neighbor_id"] for r in hits.collect()}
    final = sorted(
        tuple(r)
        for r in AI.query_lsh_index(spark, root, queries, k=5).collect()
    )
    assert final == pre_absorb2


def test_ann_index_absorb_covers_codes_tree_ivfpq(spark, tmp_path):
    """The absorb handles the PQ-family layout too (codes_stream +
    vectors_stream): after absorbing a streamed batch into an IVF-PQ
    index, the trees are gone, probe results are unchanged, and the
    streamed vector stays findable from the main tables."""
    import os as _os

    from iot_sensor_log_data_pipeline_spark.io_utils import load
    from iot_sensor_log_data_pipeline_spark.operators import ann_index as AI
    from iot_sensor_log_data_pipeline_spark.operators import similarity as SIM
    from iot_sensor_log_data_pipeline_spark.streaming.pipeline import (
        index_ingest_apply_batch,
    )

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    corpus = emb.where("vec_id >= 5 AND vec_id < 60")
    streamed = emb.where("vec_id >= 60 AND vec_id < 64")
    queries = emb.where("vec_id < 3")
    root = str(tmp_path / "ivfpq_absorb")

    cents, cbs = SIM.ivfpq_seed_quantizers(corpus, n_cells=8, m=8, n_codes=16)
    AI.build_ivfpq_index(
        corpus, root, n_cells=8, m=8, n_codes=16,
        centroids=cents, codebooks=cbs,
    )
    index_ingest_apply_batch(streamed, 0, root)
    before = sorted(
        tuple(r)
        for r in AI.query_ivfpq_index(
            spark, root, queries, k=5, n_probe=8, rerank=60
        ).collect()
    )
    AI.absorb_stream_segments(spark, root)
    assert not _os.path.exists(_os.path.join(root, "codes_stream"))
    assert not _os.path.exists(_os.path.join(root, "vectors_stream"))
    after = sorted(
        tuple(r)
        for r in AI.query_ivfpq_index(
            spark, root, queries, k=5, n_probe=8, rerank=60
        ).collect()
    )
    assert after == before
    probe = emb.where("vec_id = 61").selectExpr(
        "vec_id + 1000 AS vec_id", "embedding"
    )
    hits = AI.query_ivfpq_index(spark, root, probe, k=5, n_probe=8, rerank=60)
    top = [r for r in hits.collect() if r["rank"] == 1][0]
    assert top["neighbor_id"] == 61


def test_persisted_ivfpq_multi_assign_parity(spark, tmp_path):
    """build_ivfpq_index(n_assign=2) stores one codes row per assigned
    cell and query_ivfpq_index reproduces the ad-hoc multi-assign
    ivfpq_topk row-for-row; a streamed batch encodes with the STORED
    n_assign (segment codes rows double too)."""
    from iot_sensor_log_data_pipeline_spark.io_utils import load
    from iot_sensor_log_data_pipeline_spark.operators import ann_index as AI
    from iot_sensor_log_data_pipeline_spark.operators import similarity as SIM
    from iot_sensor_log_data_pipeline_spark.streaming.pipeline import (
        index_ingest_apply_batch,
    )

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    corpus = emb.where("vec_id >= 5 AND vec_id < 60")
    queries = emb.where("vec_id < 3")
    root = str(tmp_path / "ivfpq_ma")

    cents, cbs = SIM.ivfpq_seed_quantizers(corpus, n_cells=8, m=8, n_codes=16)
    adhoc = sorted(
        tuple(r)
        for r in SIM.ivfpq_topk(
            corpus, queries, k=5, n_probe=4, rerank=30, n_assign=2,
            centroids=cents, codebooks=cbs,
        ).collect()
    )
    AI.build_ivfpq_index(
        corpus, root, n_cells=8, m=8, n_codes=16, n_assign=2,
        centroids=cents, codebooks=cbs,
    )
    n_corpus = corpus.count()
    codes = spark.read.parquet(str(tmp_path / "ivfpq_ma" / "codes"))
    assert codes.count() == 2 * n_corpus  # one row per assigned cell
    persisted = sorted(
        tuple(r)
        for r in AI.query_ivfpq_index(
            spark, root, queries, k=5, n_probe=4, rerank=30
        ).collect()
    )
    assert persisted == adhoc and persisted

    # streamed batch encodes under the stored n_assign=2
    streamed = emb.where("vec_id >= 60 AND vec_id < 62")
    index_ingest_apply_batch(streamed, 0, root)
    seg = spark.read.parquet(str(tmp_path / "ivfpq_ma" / "codes_stream"))
    assert seg.count() == 2 * streamed.count()
    probe = emb.where("vec_id = 60").selectExpr(
        "vec_id + 1000 AS vec_id", "embedding"
    )
    hits = AI.query_ivfpq_index(spark, root, probe, k=5, n_probe=8, rerank=30)
    top = [r for r in hits.collect() if r["rank"] == 1][0]
    assert top["neighbor_id"] == 60


def test_filtered_ivf_topk_exhaustive_equals_filtered_brute_force(spark):
    """At full probe width (n_probe = n_cells, n_assign = 1) the IVF
    candidate set is the whole corpus, so the filtered search must
    EQUAL the exact brute-force top-k over the label-restricted
    corpus -- filter semantics verified with zero approximation."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    corpus = emb.where("vec_id < 80")
    queries = corpus.where("vec_id < 3")
    cents = SIM.seed_centroids(corpus, 8)
    got = SIM.filtered_ivf_topk(
        corpus, queries, k=5, match_col="label",
        n_cells=8, n_probe=8, n_assign=1, centroids=cents,
    ).collect()
    q_labels = {r["vec_id"]: r["label"] for r in queries.collect()}
    want = []
    for qid, lbl in q_labels.items():
        same = corpus.where(F.col("label") == lbl)
        want += [
            (r["query_id"], r["neighbor_id"], r["rank"])
            for r in SIM.brute_force_topk(
                same, queries.where(F.col("vec_id") == qid), k=5
            ).collect()
        ]
    assert sorted((r["query_id"], r["neighbor_id"], r["rank"]) for r in got) == sorted(want)
    # every returned neighbor carries the query's label
    nb_labels = {r["vec_id"]: r["label"] for r in corpus.collect()}
    assert all(nb_labels[r["neighbor_id"]] == q_labels[r["query_id"]] for r in got)


def test_filtered_ivf_topk_allowed_list_and_guard(spark):
    import pytest as _pytest

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    corpus = emb.where("vec_id < 60")
    queries = corpus.where("vec_id < 2")
    with _pytest.raises(ValueError, match="match_col and/or allowed"):
        SIM.filtered_ivf_topk(corpus, queries)
    allowed = corpus.where("vec_id % 3 = 0").select("vec_id")
    cents = SIM.seed_centroids(corpus, 8)
    got = SIM.filtered_ivf_topk(
        corpus, queries, k=4, allowed=allowed,
        n_cells=8, n_probe=8, n_assign=1, centroids=cents,
    ).collect()
    sub = corpus.where("vec_id % 3 = 0")
    want = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in SIM.brute_force_topk(sub, queries, k=4).collect()
    )
    assert sorted((r["query_id"], r["neighbor_id"], r["rank"]) for r in got) == want
    assert all(r["neighbor_id"] % 3 == 0 for r in got)


def test_query_ivf_index_allowed_matches_adhoc_filtered(spark, tmp_path):
    """The persisted index's allow-list probe must be result-identical
    to the ad-hoc filtered search at the same quantizer and probe
    width (the build-once/probe-many parity contract of the family)."""
    from iot_sensor_log_data_pipeline_spark.operators import ann_index as AI

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    corpus = emb.where("vec_id < 80")
    queries = emb.where("vec_id >= 80 AND vec_id < 83")
    allowed = corpus.where("label IN (1, 2, 3)").select("vec_id")
    cents = SIM.seed_centroids(corpus, 8)
    root = str(tmp_path / "ivf_filtered")
    AI.build_ivf_index(corpus, root, n_cells=8, n_assign=2, centroids=cents)
    persisted = sorted(
        tuple(r)
        for r in AI.query_ivf_index(
            spark, root, queries, k=5, n_probe=4, allowed=allowed
        ).collect()
    )
    adhoc = sorted(
        tuple(r)
        for r in SIM.filtered_ivf_topk(
            corpus, queries, k=5, allowed=allowed,
            n_cells=8, n_probe=4, n_assign=2, centroids=cents,
        ).collect()
    )
    assert persisted == adhoc and persisted


def test_kneser_ney_logprob_matches_python(spark):
    """Interpolated-KN scoring vs a hand-rolled reference, plus the
    model identity: p(.|a) sums to exactly 1 over the full continuation
    vocabulary for every context."""
    import math
    from collections import Counter

    from iot_sensor_log_data_pipeline_spark.operators.text import (
        kneser_ney_logprob,
    )

    texts = {1: "a b a b c", 2: "a b", 3: "c c c b", 4: "solo"}
    d = 0.75
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in kneser_ney_logprob(df).collect()
    }

    bigrams = {k: list(zip(t.split(), t.split()[1:])) for k, t in texts.items()}
    bn = Counter(b for bs in bigrams.values() for b in bs)
    n_a = Counter()
    t_a = Counter()
    r_b = Counter()
    for (a, b), c in bn.items():
        n_a[a] += c
        t_a[a] += 1
        r_b[b] += 1
    T = len(bn)

    def p_kn(a, b):
        return (bn[(a, b)] - d) / n_a[a] + d * t_a[a] / n_a[a] * r_b[b] / T

    # identity: sum over the full continuation vocab is 1 per context
    for a in n_a:
        full = sum(
            max(bn.get((a, b), 0) - d, 0.0) / n_a[a]
            + d * t_a[a] / n_a[a] * r_b[b] / T
            for b in r_b
        )
        assert abs(full - 1.0) < 1e-12, (a, full)

    for k, bs in bigrams.items():
        if not bs:
            assert k not in got
            continue
        want = sum(math.log(p_kn(a, b)) for a, b in bs) / len(bs)
        assert got[k][0] == len(bs)
        assert abs(got[k][1] - round(want, 6)) < 1e-9, (k, got[k], want)


def test_blocklist_hits_whole_token_semantics(spark):
    import pytest as _pytest

    from iot_sensor_log_data_pipeline_spark.operators.text import blocklist_hits

    df = spark.createDataFrame(
        [
            (1, "clean text only"),
            (2, "spam spam eggs"),
            (3, "scunthorpe is a town"),   # substring 'thorpe' must NOT hit
            (4, "junk and spam mixed"),
        ],
        "doc_id long, text string",
    )
    with _pytest.raises(ValueError, match="at least one term"):
        blocklist_hits(df, [])
    got = {r["doc_id"]: r for r in blocklist_hits(df, ["spam", "junk", "thorpe"]).collect()}
    assert (got[1]["n_hits"], got[1]["hit_terms"], got[1]["keep"]) == (0, "", True)
    assert (got[2]["n_hits"], got[2]["hit_terms"], got[2]["keep"]) == (2, "spam", False)
    assert (got[3]["n_hits"], got[3]["keep"]) == (0, True)
    assert (got[4]["n_hits"], got[4]["hit_terms"], got[4]["keep"]) == (2, "junk,spam", False)


def test_query_index_allowed_family_parity(spark, tmp_path):
    """Family-wide filtered-probe contract: probing the FULL index
    with an allow-list must be result-identical to probing an index
    built over ONLY the allowed subset at the same frozen quantizers
    -- for lsh (same planes => same buckets), pq (per-vector codes
    are subset-independent), and ivfpq (ditto, per assigned cell).
    That identity is what makes the semi-join a real filter, not an
    approximation layered on an approximation."""
    from iot_sensor_log_data_pipeline_spark.operators import ann_index as AI

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    corpus = emb.where("vec_id < 80")
    queries = emb.where("vec_id >= 80 AND vec_id < 83")
    allowed = corpus.where("vec_id % 2 = 0").select("vec_id")
    sub = corpus.where("vec_id % 2 = 0")

    # -- lsh (deterministic planes from the shared seed)
    full, part = str(tmp_path / "l_full"), str(tmp_path / "l_sub")
    AI.build_lsh_index(corpus, full, bands=8, rows_per_band=2)
    AI.build_lsh_index(sub, part, bands=8, rows_per_band=2)
    got = sorted(
        tuple(r)
        for r in AI.query_lsh_index(
            spark, full, queries, k=5, allowed=allowed
        ).collect()
    )
    want = sorted(
        tuple(r) for r in AI.query_lsh_index(spark, part, queries, k=5).collect()
    )
    assert got == want and got

    # -- pq (pinned seed codebooks, with exact re-rank)
    cbs = SIM.pq_seed_codebooks(corpus, m=8, k=8)
    full, part = str(tmp_path / "p_full"), str(tmp_path / "p_sub")
    AI.build_pq_index(corpus, full, m=8, n_codes=8, codebooks=cbs)
    AI.build_pq_index(sub, part, m=8, n_codes=8, codebooks=cbs)
    got = sorted(
        tuple(r)
        for r in AI.query_pq_index(
            spark, full, queries, k=5, rerank=20, allowed=allowed
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in AI.query_pq_index(spark, part, queries, k=5, rerank=20).collect()
    )
    assert got == want and got
    assert all(r[1] % 2 == 0 for r in got)  # neighbor_id respects the filter

    # -- ivfpq (pinned centroid+codebook pair)
    cents, rcbs = SIM.ivfpq_seed_quantizers(corpus, n_cells=8, m=8, n_codes=8)
    full, part = str(tmp_path / "q_full"), str(tmp_path / "q_sub")
    AI.build_ivfpq_index(
        corpus, full, n_cells=8, m=8, n_codes=8, centroids=cents, codebooks=rcbs
    )
    AI.build_ivfpq_index(
        sub, part, n_cells=8, m=8, n_codes=8, centroids=cents, codebooks=rcbs
    )
    got = sorted(
        tuple(r)
        for r in AI.query_ivfpq_index(
            spark, full, queries, k=5, n_probe=8, rerank=20, allowed=allowed
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in AI.query_ivfpq_index(
            spark, part, queries, k=5, n_probe=8, rerank=20
        ).collect()
    )
    assert got == want and got


def test_query_graph_index_allowed_filtered_results(spark, tmp_path):
    """Filtered graph search (results-only filter, routing untouched):
    with an exhaustive beam the hit set covers every reachable allowed
    node, so the filtered probe equals brute force over the allowed
    subset; a selective probe returns only allowed ids."""
    from iot_sensor_log_data_pipeline_spark.operators import graph_ann as GA

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    corpus = emb.where("vec_id < 40")
    queries = emb.where("vec_id >= 40 AND vec_id < 42")
    allowed = corpus.where("vec_id % 2 = 0").select("vec_id")
    root = str(tmp_path / "g_filtered")
    GA.build_graph_index(corpus, root, k=8, n_iter=2)

    got = GA.query_graph_index(
        spark, root, queries, k=5, beam=64, hops=6, allowed=allowed
    ).collect()
    assert got and all(r["neighbor_id"] % 2 == 0 for r in got)
    want = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in SIM.brute_force_topk(
            corpus.where("vec_id % 2 = 0"), queries, k=5
        ).collect()
    )
    assert sorted((r["query_id"], r["neighbor_id"], r["rank"]) for r in got) == want

    # narrow beam: still only allowed ids, results well-formed
    narrow = GA.query_graph_index(
        spark, root, queries, k=3, beam=8, hops=3, allowed=allowed
    ).collect()
    assert all(r["neighbor_id"] % 2 == 0 for r in narrow)


def test_query_text_index_allowed_keeps_global_stats(spark, tmp_path):
    """Filtered BM25 (Lucene filtered-query convention): the allow-list
    narrows the RESULT SET but df/N/avgdl stay corpus-global, so each
    surviving doc keeps its unfiltered score -- and docs ranked past k
    unfiltered surface once their betters are filtered out."""
    from iot_sensor_log_data_pipeline_spark.operators import text_index as TI

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    root = str(tmp_path / "t_filtered")
    TI.build_text_index(docs, root)
    terms = ("spark", "join", "window")
    full = {
        r["doc_id"]: r["bm25"]
        for r in TI.query_text_index(spark, root, terms, k=10_000).collect()
    }
    allowed = docs.where("doc_id % 3 = 0").select("doc_id")
    got = TI.query_text_index(
        spark, root, terms, k=10, allowed=allowed
    ).collect()
    assert got and all(r["doc_id"] % 3 == 0 for r in got)
    # score identity: filtered scores equal the unfiltered ones
    assert all(abs(full[r["doc_id"]] - r["bm25"]) < 1e-12 for r in got)
    # ranking identity: exactly the top-10 allowed docs by global score
    want = sorted(
        ((-s, d) for d, s in full.items() if d % 3 == 0)
    )[:10]
    assert [r["doc_id"] for r in got] == [d for _, d in want]


def test_ivf_probe_sweep_monotone_and_exhaustive(spark):
    """The sweep's structural guarantees: recall and scan fraction are
    non-decreasing in n_probe, and probing every cell reaches recall
    1.0 at scan fraction 1.0 (n_assign >= 1 puts every neighbor in
    some probed cell)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    corpus = emb.where("vec_id < 60")
    queries = corpus.where("vec_id < 3")
    cents = SIM.seed_centroids(corpus, 8)
    rows = SIM.ivf_probe_sweep(
        corpus, queries, probes=(1, 4, 8), k=5, n_assign=2, centroids=cents
    ).collect()
    assert [r["n_probe"] for r in rows] == [1, 4, 8]
    recalls = [r["recall_at_k"] for r in rows]
    scans = [r["scan_frac"] for r in rows]
    assert recalls == sorted(recalls) and scans == sorted(scans)
    assert recalls[-1] == 1.0 and scans[-1] == 1.0
    assert scans[0] < 1.0  # a 1-probe scan must touch a strict subset


def test_mmr_rerank_diversifies_and_matches_hand_greedy(spark):
    """MMR behavior on a crafted pool: the first pick is the most
    relevant candidate, and the second pick skips the near-duplicate
    of the first (rel-rank 2) for the diverse candidate -- plus exact
    score agreement with the hand-computed greedy."""
    import math

    q = [1.0, 0.0, 0.0]
    c1 = [1.0, 0.1, 0.0]    # most relevant
    c2 = [1.0, 0.11, 0.0]   # near-duplicate of c1, rel-rank 2
    c3 = [0.9, 0.0, 0.44]   # less relevant, diverse (orthogonal-ish)
    rows = [(0, q), (1, c1), (2, c2), (3, c3)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = SIM.mmr_rerank(
        df, df.where("vec_id = 0"), k=2, pool=3, lam=0.5
    ).collect()
    assert [(r["rank"], r["neighbor_id"]) for r in got] == [(1, 1), (2, 3)]

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

    want1 = 0.5 * cos(q, c1) - 0.5 * 0.0
    want2 = 0.5 * cos(q, c3) - 0.5 * cos(c3, c1)
    assert abs(got[0]["mmr"] - round(want1, 6)) < 1e-12
    assert abs(got[1]["mmr"] - round(want2, 6)) < 1e-12


def test_filtered_ivf_topk_negate_mines_hard_negatives(spark):
    """negate=True flips the match predicate: at full probe width the
    result equals brute force over the DIFFERENT-label subset (the
    hard-negative mining contract); negate without match_col raises."""
    import pytest as _pytest

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    corpus = emb.where("vec_id < 80")
    queries = corpus.where("vec_id < 3")
    with _pytest.raises(ValueError, match="negate=True needs match_col"):
        SIM.filtered_ivf_topk(corpus, queries, allowed=corpus.select("vec_id"),
                              negate=True)
    cents = SIM.seed_centroids(corpus, 8)
    got = SIM.filtered_ivf_topk(
        corpus, queries, k=5, match_col="label", negate=True,
        n_cells=8, n_probe=8, n_assign=1, centroids=cents,
    ).collect()
    labels = {r["vec_id"]: r["label"] for r in corpus.collect()}
    want = []
    for r in queries.collect():
        neg = corpus.where(F.col("label") != labels[r["vec_id"]])
        want += [
            (x["query_id"], x["neighbor_id"], x["rank"])
            for x in SIM.brute_force_topk(
                neg, queries.where(F.col("vec_id") == r["vec_id"]), k=5
            ).collect()
        ]
    assert sorted((r["query_id"], r["neighbor_id"], r["rank"]) for r in got) == sorted(want)
    assert all(labels[r["neighbor_id"]] != labels[r["query_id"]] for r in got)


def test_bm25_prf_surfaces_topic_docs_missing_query_terms(spark):
    """The RM3 point: a document containing none of the literal query
    words but sharing the feedback docs' topic vocabulary scores > 0
    in the PRF ranking (plain BM25 gives it exactly nothing)."""
    from iot_sensor_log_data_pipeline_spark.operators.text import (
        bm25_prf_rank,
        bm25_rank,
    )

    rows = [
        # on-topic docs matching the query terms + topic word 'shuffle'
        (1, "spark join shuffle spark join shuffle plan"),
        (2, "spark join shuffle exchange spark shuffle"),
        (3, "join shuffle spark plan shuffle stage"),
        # the target: topic vocabulary only, no query terms
        (4, "shuffle exchange stage plan shuffle shuffle"),
        # off-topic noise
        (5, "banana apple orange pear grape melon"),
        (6, "red green blue yellow purple pink"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    q = ("spark", "join")
    plain = {r["doc_id"] for r in bm25_rank(docs, q, k=10).collect()}
    assert 4 not in plain
    prf = {r["doc_id"]: r["prf_score"] for r in
           bm25_prf_rank(docs, q, fb_k=3, n_expand=3, k=10).collect()}
    assert 4 in prf and prf[4] > 0
    assert 5 not in prf and 6 not in prf  # off-topic stays out


def test_round11_operator_guards(spark):
    """Edge-contract sweep for the round-11 additions: bad parameters
    fail loudly at plan time; a no-match PRF query returns empty
    instead of crashing on its empty feedback set."""
    import pytest as _pytest

    from iot_sensor_log_data_pipeline_spark.operators.text import (
        bm25_prf_rank,
        kneser_ney_logprob,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    corpus = emb.where("vec_id < 20")
    queries = corpus.where("vec_id < 2")
    with _pytest.raises(ValueError, match="non-empty tuple"):
        SIM.ivf_probe_sweep(corpus, queries, probes=())
    with _pytest.raises(ValueError, match="non-empty query sample"):
        SIM.ivf_probe_sweep(
            corpus, corpus.where("vec_id < 0"), probes=(1, 2),
            centroids=SIM.seed_centroids(corpus, 4),
        )
    with _pytest.raises(ValueError, match="lam must be"):
        SIM.mmr_rerank(corpus, queries, lam=1.5)
    with _pytest.raises(ValueError, match="pool >= 2"):
        SIM.mmr_rerank(corpus, queries, pool=1)

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a c d e")], "doc_id long, text string"
    )
    with _pytest.raises(ValueError, match="discount must be"):
        kneser_ney_logprob(docs, discount=1.0)
    with _pytest.raises(ValueError, match="at least one query term"):
        bm25_prf_rank(docs, ())
    with _pytest.raises(ValueError, match="alpha must be"):
        bm25_prf_rank(docs, ("a",), alpha=2.0)
    # no-match query: empty result, no crash on the empty feedback set
    assert bm25_prf_rank(docs, ("zzz",)).count() == 0


def test_fold_absorb_replay_compositions_never_double_count(spark, tmp_path):
    """The fold/absorb/replay composition matrix (round-11 review
    findings): (a) fold -> replay of the folded batch (sidecar
    exclusion closes the old until-next-fold window), (b) fold ->
    absorb -> replay (the manifest must list fold-destroyed ids read
    from the sidecar), (c) absorb -> replay -> fold (the fold must be
    manifest-aware and not launder absorbed rows into batch=-1)."""
    import json as _json
    import os as _os

    from iot_sensor_log_data_pipeline_spark.io_utils import load
    from iot_sensor_log_data_pipeline_spark.operators import ann_index as AI
    from iot_sensor_log_data_pipeline_spark.streaming.pipeline import (
        index_ingest_apply_batch,
    )

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    corpus = emb.where("vec_id >= 10 AND vec_id < 60")
    batch0 = emb.where("vec_id >= 60 AND vec_id < 64")
    queries = emb.where("vec_id < 3")

    def probe(root):
        return sorted(
            tuple(r)
            for r in AI.query_lsh_index(spark, root, queries, k=5).collect()
        )

    def rowcount(root):
        return AI._read_with_segments(spark, root, "entries").count()

    # (a) fold, then the folded batch replays
    root = str(tmp_path / "fold_replay")
    AI.build_lsh_index(corpus, root, bands=16, rows_per_band=4,
                       planes=SIM.hash_hyperplanes(64, dim=64))
    index_ingest_apply_batch(batch0, 0, root)
    want = probe(root)
    n_want = rowcount(root)
    AI.optimize_stream_segments(spark, root)
    sidecar = _os.path.join(root, "entries_stream", "_folded_ids.json")
    assert _json.load(open(sidecar)) == [0]
    index_ingest_apply_batch(batch0, 0, root)  # replay after the fold
    assert rowcount(root) == n_want and probe(root) == want

    # (b) fold -> absorb -> replay: manifest carries the sidecar ids
    AI.absorb_stream_segments(spark, root)
    mf = _json.load(open(_os.path.join(root, "_absorbed.json")))
    assert 0 in mf["entries_stream"]
    index_ingest_apply_batch(batch0, 0, root)  # replay after the absorb
    assert rowcount(root) == n_want and probe(root) == want

    # (c) absorb -> replay -> fold: the fold must not launder the
    # replayed (already-absorbed) rows into batch=-1
    root2 = str(tmp_path / "absorb_fold")
    AI.build_lsh_index(corpus, root2, bands=16, rows_per_band=4,
                       planes=SIM.hash_hyperplanes(64, dim=64))
    index_ingest_apply_batch(batch0, 0, root2)
    AI.absorb_stream_segments(spark, root2)
    index_ingest_apply_batch(batch0, 0, root2)  # replay
    AI.optimize_stream_segments(spark, root2)  # fold sees the replay dir
    assert rowcount(root2) == n_want and probe(root2) == want


def test_absorb_swap_recovery_and_orphaned_marker(spark, tmp_path):
    """(1) A crash between the swap's two renames (main table moved
    aside, replacement not yet in place) recovers on re-run via
    _recover_swap; (2) an orphaned _absorbing marker with no segment
    trees is cleared by the next absorb call instead of taxing every
    probe with the union-distinct forever (ann + text families)."""
    import os as _os

    from iot_sensor_log_data_pipeline_spark.io_utils import load
    from iot_sensor_log_data_pipeline_spark.operators import ann_index as AI
    from iot_sensor_log_data_pipeline_spark.operators import text_index as TI
    from iot_sensor_log_data_pipeline_spark.streaming.pipeline import (
        index_ingest_apply_batch,
    )

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    corpus = emb.where("vec_id >= 10 AND vec_id < 60")
    batch0 = emb.where("vec_id >= 60 AND vec_id < 64")
    queries = emb.where("vec_id < 3")
    root = str(tmp_path / "swap_rec")
    AI.build_lsh_index(corpus, root, bands=16, rows_per_band=4,
                       planes=SIM.hash_hyperplanes(64, dim=64))
    index_ingest_apply_batch(batch0, 0, root)
    want = sorted(
        tuple(r)
        for r in AI.query_lsh_index(spark, root, queries, k=5).collect()
    )
    # simulate the mid-swap crash: entries moved aside, no replacement
    _os.rename(_os.path.join(root, "entries"),
               _os.path.join(root, "entries") + "__old")
    AI.absorb_stream_segments(spark, root)  # re-run = recovery + absorb
    assert not _os.path.exists(_os.path.join(root, "entries__old"))
    got = sorted(
        tuple(r)
        for r in AI.query_lsh_index(spark, root, queries, k=5).collect()
    )
    assert got == want

    # orphaned marker, no segments: next absorb clears it (ann family)
    open(_os.path.join(root, "_absorbing"), "w").write("orphan\n")
    AI.absorb_stream_segments(spark, root)
    assert not _os.path.exists(_os.path.join(root, "_absorbing"))

    # text-index twin: orphaned marker cleared by the next optimize
    docs = load(spark, "/root/testdata/sf0.001", "documents").where("doc_id < 40")
    troot = str(tmp_path / "text_marker")
    TI.build_text_index(docs, troot)
    open(_os.path.join(troot, "_absorbing"), "w").write("orphan\n")
    TI.optimize_text_index(spark, troot)
    assert not _os.path.exists(_os.path.join(troot, "_absorbing"))


def test_apply_cdc_equal_sequence_semantics(spark):
    """Equal-sequence ties in the seq_col path: delete + upsert at the
    same (pk, seq) resolves to the upsert (apply-in-order semantics),
    while TWO upserts at the same (pk, seq) raise instead of letting
    shuffle order pick a survivor."""
    import pytest as _pytest

    from iot_sensor_log_data_pipeline_spark.operators.scd import apply_cdc

    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    ok = spark.createDataFrame(
        [(1, "DEL", "delete", 5), (1, "re", "insert", 5), (2, "B2", "update", 3)],
        "k long, v string, op string, seq long",
    )
    got = {r["k"]: r["v"] for r in apply_cdc(base, ok, "k", seq_col="seq").collect()}
    assert got == {1: "re", 2: "B2"}

    bad = spark.createDataFrame(
        [(1, "x", "update", 5), (1, "y", "update", 5)],
        "k long, v string, op string, seq long",
    )
    with _pytest.raises(ValueError, match="equal-sequence upserts"):
        apply_cdc(base, bad, "k", seq_col="seq")


def test_query_graph_index_allowed_seeds_from_all_scored_entries(spark, tmp_path):
    """The hit set must be seeded from every SCORED entry point, not
    the beam-truncated frontier: with hops=0 and beam=1 the results
    are exactly the allowed entries (all of which were scored), never
    just the single beam survivor."""
    from iot_sensor_log_data_pipeline_spark.operators import graph_ann as GA

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    corpus = emb.where("vec_id < 40")
    queries = emb.where("vec_id >= 40 AND vec_id < 41")
    allowed = corpus.where("vec_id % 2 = 0").select("vec_id")
    root = str(tmp_path / "g_seed")
    GA.build_graph_index(corpus, root, k=8, n_iter=1, n_entry=32)
    got = GA.query_graph_index(
        spark, root, queries, k=2, beam=1, hops=0, allowed=allowed
    ).collect()
    assert len(got) == 2  # pre-fix: at most the 1 beam survivor
    assert all(r["neighbor_id"] % 2 == 0 for r in got)


def test_second_review_fix_battery(spark, tmp_path):
    """Round-11 second review pass, regression battery:
    (1) the absorb manifest preserves keys for trees absent on disk;
    (2) a fold caught mid-swap (tree moved aside) recovers on the next
        fold instead of stranding the folded data;
    (3) apply_cdc tolerates byte-identical replayed rows in both
        paths (only genuinely different payloads raise);
    (4) mmr_rerank works with string ids end-to-end;
    (5) text + winnowing indexes never double-count a batch replayed
        after its absorb (the manifest port)."""
    import json as _json
    import os as _os

    from iot_sensor_log_data_pipeline_spark.io_utils import load
    from iot_sensor_log_data_pipeline_spark.operators import ann_index as AI
    from iot_sensor_log_data_pipeline_spark.operators import dedup as DD
    from iot_sensor_log_data_pipeline_spark.operators import text_index as TI
    from iot_sensor_log_data_pipeline_spark.operators.scd import apply_cdc
    from iot_sensor_log_data_pipeline_spark.streaming.pipeline import (
        index_ingest_apply_batch,
    )

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    corpus = emb.where("vec_id >= 10 AND vec_id < 50")
    batch0 = emb.where("vec_id >= 60 AND vec_id < 63")
    queries = emb.where("vec_id < 2")

    # (1) manifest keys survive for absent trees
    root = str(tmp_path / "mf_keys")
    AI.build_lsh_index(corpus, root, bands=8, rows_per_band=2)
    index_ingest_apply_batch(batch0, 0, root)
    AI.absorb_stream_segments(spark, root)
    index_ingest_apply_batch(batch0, 0, root)      # replay both trees
    import shutil as _shutil
    _shutil.rmtree(_os.path.join(root, "vectors_stream"))  # partial replay
    AI.absorb_stream_segments(spark, root)
    mf = _json.load(open(_os.path.join(root, "_absorbed.json")))
    assert mf["vectors_stream"] == [0] and mf["entries_stream"] == [0]

    # (2) fold mid-swap crash recovery
    root2 = str(tmp_path / "fold_crash")
    AI.build_lsh_index(corpus, root2, bands=8, rows_per_band=2)
    index_ingest_apply_batch(batch0, 0, root2)
    want = sorted(
        tuple(r)
        for r in AI.query_lsh_index(spark, root2, queries, k=5).collect()
    )
    _os.rename(_os.path.join(root2, "entries_stream"),
               _os.path.join(root2, "entries_stream") + "__old")
    AI.optimize_stream_segments(spark, root2)  # recovery + fold
    assert _os.path.exists(_os.path.join(root2, "entries_stream"))
    assert not _os.path.exists(_os.path.join(root2, "entries_stream__old"))
    got = sorted(
        tuple(r)
        for r in AI.query_lsh_index(spark, root2, queries, k=5).collect()
    )
    assert got == want

    # (3) identical replayed rows tolerated
    base = spark.createDataFrame([(1, "a")], "k long, v string")
    dup_seq = spark.createDataFrame(
        [(1, "x", "update", 5), (1, "x", "update", 5)],
        "k long, v string, op string, seq long",
    )
    got_cdc = {r["k"]: r["v"]
               for r in apply_cdc(base, dup_seq, "k", seq_col="seq").collect()}
    assert got_cdc == {1: "x"}
    dup_plain = spark.createDataFrame(
        [(1, "y", "update"), (1, "y", "update")], "k long, v string, op string"
    )
    got_cdc2 = {r["k"]: r["v"]
                for r in apply_cdc(base, dup_plain, "k").collect()}
    assert got_cdc2 == {1: "y"}

    # (4) string ids through MMR
    rows = [("q", [1.0, 0.0, 0.0]), ("a", [1.0, 0.1, 0.0]),
            ("b", [1.0, 0.11, 0.0]), ("c", [0.9, 0.0, 0.44])]
    sdf = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    picked = SIM.mmr_rerank(
        sdf, sdf.where("vec_id = 'q'"), k=2, pool=3, lam=0.5
    ).collect()
    assert [r["neighbor_id"] for r in picked] == ["a", "c"]

    # (5) text + winnowing replay-after-absorb
    troot = str(tmp_path / "t_replay")
    docs = spark.createDataFrame(
        [(1, "spark engine catalyst"), (2, "unrelated words entirely")],
        "doc_id long, text string",
    )
    newdoc = spark.createDataFrame(
        [(7, "spark spark streaming arrival")], "doc_id long, text string"
    )
    TI.build_text_index(docs, troot)
    TI.text_ingest_apply_batch(newdoc, 0, troot)
    t_want = sorted(
        tuple(r)
        for r in TI.query_text_index(spark, troot, ("spark",), k=5).collect()
    )
    TI.optimize_text_index(spark, troot)          # absorb
    TI.text_ingest_apply_batch(newdoc, 0, troot)  # replay
    t_got = sorted(
        tuple(r)
        for r in TI.query_text_index(spark, troot, ("spark",), k=5).collect()
    )
    assert t_got == t_want

    wroot = str(tmp_path / "w_replay")
    wdocs = spark.createDataFrame(
        [(1, "aa bb cc dd ee ff gg hh"), (2, "zz yy xx ww vv uu tt ss")],
        "doc_id long, text string",
    )
    wnew = spark.createDataFrame(
        [(9, "aa bb cc dd qq rr pp oo")], "doc_id long, text string"
    )
    DD.build_winnowing_index(wdocs, wroot, k=4, w=4, max_fp_df=10)
    DD.winnowing_ingest_apply_batch(wnew, 0, wroot)
    n_want = DD.load_winnowing_index(spark, wroot)[0].count()
    DD.optimize_winnowing_index(spark, wroot)     # absorb
    DD.winnowing_ingest_apply_batch(wnew, 0, wroot)  # replay
    assert DD.load_winnowing_index(spark, wroot)[0].count() == n_want


def test_third_review_fix_battery(spark, tmp_path):
    """Third review pass, regression battery: (1) optimize_text_index
    recovers a mid-swap main table or segment tree BEFORE reading or
    deciding segment presence (no data loss, no unreachable
    recovery); (2) the winnowing ingest's df-cap measurement excludes
    folded/absorbed replay directories like every other read;
    (3) apply_cdc still works on map-typed payload columns (the
    replay-dedup skips them instead of crashing)."""
    import os as _os

    from iot_sensor_log_data_pipeline_spark.operators import dedup as DD
    from iot_sensor_log_data_pipeline_spark.operators import text_index as TI
    from iot_sensor_log_data_pipeline_spark.operators.scd import apply_cdc

    # (1a) main table mid-swap: re-run IS the recovery
    troot = str(tmp_path / "t_rec")
    docs = spark.createDataFrame(
        [(1, "spark engine catalyst"), (2, "unrelated words entirely")],
        "doc_id long, text string",
    )
    TI.build_text_index(docs, troot)
    newdoc = spark.createDataFrame(
        [(7, "spark spark streaming arrival")], "doc_id long, text string"
    )
    TI.text_ingest_apply_batch(newdoc, 0, troot)
    want = sorted(
        tuple(r)
        for r in TI.query_text_index(spark, troot, ("spark",), k=5).collect()
    )
    _os.rename(_os.path.join(troot, "postings"),
               _os.path.join(troot, "postings") + "__old")
    TI.optimize_text_index(spark, troot)
    got = sorted(
        tuple(r)
        for r in TI.query_text_index(spark, troot, ("spark",), k=5).collect()
    )
    assert got == want

    # (1b) segment tree mid-swap: the restored tree must be MERGED,
    # not recorded-as-absorbed-and-deleted
    troot2 = str(tmp_path / "t_rec2")
    TI.build_text_index(docs, troot2)
    TI.text_ingest_apply_batch(newdoc, 0, troot2)
    want2 = sorted(
        tuple(r)
        for r in TI.query_text_index(spark, troot2, ("spark",), k=5).collect()
    )
    _os.rename(_os.path.join(troot2, "postings_stream"),
               _os.path.join(troot2, "postings_stream") + "__old")
    TI.optimize_text_index(spark, troot2)
    got2 = sorted(
        tuple(r)
        for r in TI.query_text_index(spark, troot2, ("spark",), k=5).collect()
    )
    assert got2 == want2  # doc 7's postings survived the absorb

    # (2) winnowing df-cap measurement ignores replay directories
    wroot = str(tmp_path / "w_cap")
    hot = "aa bb cc dd ee ff gg hh"
    DD.build_winnowing_index(
        spark.createDataFrame([(1, hot)], "doc_id long, text string"),
        wroot, k=4, w=4, max_fp_df=3,
    )
    b0 = spark.createDataFrame([(2, hot)], "doc_id long, text string")
    DD.winnowing_ingest_apply_batch(b0, 0, wroot)
    DD.optimize_winnowing_stream_segments(spark, wroot)  # fold (sidecar)
    DD.winnowing_ingest_apply_batch(b0, 0, wroot)        # replay dir
    b1 = spark.createDataFrame([(3, hot)], "doc_id long, text string")
    DD.winnowing_ingest_apply_batch(b1, 1, wroot)
    postings, _, _ = DD.load_winnowing_index(spark, wroot)
    # true df = 3 <= cap 3: doc 3 must be indexed (pre-fix the
    # replayed dir double-counted doc 2 and cap-skipped doc 3)
    assert postings.where("doc_id = 3").count() > 0

    # (3) map-typed payloads flow through apply_cdc
    base = spark.createDataFrame(
        [(1, {"a": "1"})], "k long, tags map<string,string>"
    )
    cdc = spark.createDataFrame(
        [(2, {"b": "2"}, "insert")],
        "k long, tags map<string,string>, op string",
    )
    got_map = apply_cdc(base, cdc, "k").count()
    assert got_map == 2


def test_round12_advice_fix_battery(spark, tmp_path):
    """Regression pytests for the four round-11 ADVICE findings:
    (1) a query whose candidate pool holds exactly ONE neighbor still
    emits that neighbor at rank 1 (pre-fix the pairs self-join had no
    row for it and the query vanished); (2) duplicate query_terms in
    bm25_prf_rank raise instead of silently double-counting tf in the
    re-score; (3) filtered_ivf_topk's match predicate is null-safe --
    NULL-label neighbors surface as hard negatives and NULL-label
    queries match NULL-label neighbors; (4) probe paths self-heal a
    crashed _swap_dir (main table missing, __old present) instead of
    failing until the next maintenance run."""
    import os as _os

    import pytest as _pytest

    from iot_sensor_log_data_pipeline_spark.operators import ann_index as ANN
    from iot_sensor_log_data_pipeline_spark.operators import text_index as TI
    from iot_sensor_log_data_pipeline_spark.operators.text import bm25_prf_rank

    # (1) single-candidate query: 1 query + 1 corpus neighbor
    df = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.8, 0.6, 0.0])],
        "vec_id long, embedding array<double>",
    )
    got = SIM.mmr_rerank(df, df.where("vec_id = 0"), k=3, pool=2, lam=0.75).collect()
    assert [(r["query_id"], r["neighbor_id"], r["rank"]) for r in got] == [(0, 1, 1)]
    assert abs(got[0]["mmr"] - round(0.75 * 0.8, 6)) < 1e-9
    # ... and via an explicit candidates table (the serving shape)
    cand = spark.createDataFrame([(0, 1)], "query_id long, neighbor_id long")
    got_c = SIM.mmr_rerank(
        df, df.where("vec_id = 0"), k=3, pool=2, lam=0.75, candidates=cand
    ).collect()
    assert [(r["neighbor_id"], r["rank"]) for r in got_c] == [(1, 1)]

    # (2) duplicate query terms rejected
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a c d e")], "doc_id long, text string"
    )
    with _pytest.raises(ValueError, match="duplicates"):
        bm25_prf_rank(docs, ("a", "a"))

    # (3) null-safe match semantics
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], "x"),      # query (labeled)
            (1, [0.9, 0.1], None),     # NULL-label: valid hard negative
            (2, [0.8, 0.2], "x"),      # same label: excluded under negate
            (3, [0.7, 0.3], "y"),      # different label
            (10, [0.0, 1.0], None),    # NULL-label query
            (11, [0.1, 1.0], None),    # NULL-label neighbor: matches q10
        ],
        "vec_id long, embedding array<double>, label string",
    )
    cents = SIM.seed_centroids(emb, 2)
    neg = SIM.filtered_ivf_topk(
        emb, emb.where("vec_id = 0"), k=5, match_col="label", negate=True,
        n_cells=2, n_probe=2, n_assign=2, centroids=cents,
    ).collect()
    neg_ids = {r["neighbor_id"] for r in neg}
    assert 1 in neg_ids and 3 in neg_ids and 2 not in neg_ids
    eqm = SIM.filtered_ivf_topk(
        emb, emb.where("vec_id = 10"), k=5, match_col="label",
        n_cells=2, n_probe=2, n_assign=2, centroids=cents,
    ).collect()
    eq_ids = {r["neighbor_id"] for r in eqm}
    assert 1 in eq_ids and 11 in eq_ids and 2 not in eq_ids

    # (4) probe-side swap self-heal: ANN index + text index
    vecs = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    root = str(tmp_path / "lsh_heal")
    ANN.build_lsh_index(
        vecs, root, bands=4, rows_per_band=2,
        planes=SIM.hash_hyperplanes(8, dim=2),
    )
    _os.rename(_os.path.join(root, "entries"), _os.path.join(root, "entries__old"))
    q = vecs.where("vec_id = 0")
    assert ANN.query_lsh_index(spark, root, q, k=3).count() >= 0
    assert _os.path.exists(_os.path.join(root, "entries"))

    troot = str(tmp_path / "text_heal")
    TI.build_text_index(docs, troot)
    _os.rename(
        _os.path.join(troot, "postings"), _os.path.join(troot, "postings__old")
    )
    got_t = TI.query_text_index(spark, troot, ("a", "d"), k=5).collect()
    assert len(got_t) == 2
    assert _os.path.exists(_os.path.join(troot, "postings"))


def test_round13_advice_fix_battery(spark, tmp_path, monkeypatch):
    """Regression pytests for the four round-12 ADVICE findings:
    (1) _apply_match_filter LEFT-joins the attrs side table, so a
    candidate with no attrs row keeps nb_attr = NULL and the null-safe
    predicate decides (pre-fix the inner join silently dropped
    metadata-less neighbors under BOTH polarities); (2) a non-heal
    rename failure inside _swap_dir best-effort restores the main
    table from its __old aside before re-raising (pre-fix availability
    depended on a later probe's heal); (3) read_index_vectors is the
    public tombstone-aware accessor for an index's stored vectors
    (plans no longer reach into _read_with_segments); (4) bench canary
    references are keyed by scale factor, so normalization never
    conflates corpus size with host drift at a non-pinned sf.

    Plus the round-13 batched probe: query_text_index_batch matches
    the single-query probe value-for-value per query, and term-bag
    multiplicity doubles a duplicated term's contribution."""
    import os as _os

    import pytest as _pytest

    from iot_sensor_log_data_pipeline_spark.operators import ann_index as ANN
    from iot_sensor_log_data_pipeline_spark.operators import text_index as TI

    # (1) metadata-less neighbor: attrs covers ids {2, 3} only; under
    # negate=True the attr-less neighbor 1 must surface as a hard
    # negative, and under equality a NULL-attr query matches it.
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], "x"),
            (1, [0.9, 0.1], None),   # NO attrs row at all
            (2, [0.8, 0.2], "x"),
            (3, [0.7, 0.3], "y"),
            (10, [0.6, 0.4], None),  # NULL-attr query
        ],
        "vec_id long, embedding array<double>, label string",
    )
    attrs = emb.where("vec_id in (0, 2, 3, 10)").select("vec_id", "label")
    root = str(tmp_path / "ivf_attr")
    cents = SIM.seed_centroids(emb, 2)
    ANN.build_ivf_index(emb, root, n_cells=2, n_assign=2, centroids=cents)
    neg = ANN.query_ivf_index(
        spark, root, emb.where("vec_id = 0"), k=5, n_probe=2,
        match_col="label", attrs=attrs, negate=True,
    ).collect()
    neg_ids = {r["neighbor_id"] for r in neg}
    assert 1 in neg_ids, "attr-less neighbor must surface as hard negative"
    assert 3 in neg_ids and 2 not in neg_ids
    eqm = ANN.query_ivf_index(
        spark, root, emb.where("vec_id = 10"), k=5, n_probe=2,
        match_col="label", attrs=attrs,
    ).collect()
    eq_ids = {r["neighbor_id"] for r in eqm}
    assert 1 in eq_ids, "missing attrs row == NULL attr (IS NOT DISTINCT FROM)"
    assert 2 not in eq_ids and 3 not in eq_ids

    # (2) non-heal _swap_dir failure restores the main table
    final = str(tmp_path / "swapt" / "tbl")
    tmp_stage = str(tmp_path / "swapt" / "tbl__next")
    _os.makedirs(final)
    _os.makedirs(tmp_stage)
    with open(_os.path.join(final, "live"), "w") as fh:
        fh.write("x")
    real_rename = _os.rename

    def failing_rename(src, dst):
        if src == tmp_stage:
            raise OSError("simulated non-heal rename failure")
        return real_rename(src, dst)

    monkeypatch.setattr(
        "iot_sensor_log_data_pipeline_spark.operators.ann_index.os.rename",
        failing_rename,
    )
    with _pytest.raises(OSError, match="simulated"):
        ANN._swap_dir(final, tmp_stage)
    monkeypatch.undo()
    assert _os.path.exists(_os.path.join(final, "live")), (
        "main table must be restored from __old on the failure path"
    )
    assert not _os.path.exists(final + "__old")

    # (3) public vector accessor: renamed columns + tombstone-aware
    ANN.delete_from_index(spark.createDataFrame([(2,)], "vec_id long"), root)
    acc = ANN.read_index_vectors(spark, root, "vec_id", "embedding")
    assert acc.columns == ["vec_id", "embedding"]
    assert {r["vec_id"] for r in acc.collect()} == {0, 1, 3, 10}

    # (4) canary refs keyed by sf
    import bench as B

    assert set(B.CANARIES_BY_SF) == {"0.1"}
    assert "q1_pricing_summary" in B.CANARIES_BY_SF["0.1"]

    # (5) batched probe == per-query probe, value-for-value
    docs = spark.createDataFrame(
        [(1, "a b c a"), (2, "a c d e"), (3, "b d e e"), (4, "c c d")],
        "doc_id long, text string",
    )
    troot = str(tmp_path / "ti_batch")
    TI.build_text_index(docs, troot)
    batch_queries = {0: ("a", "b"), 1: ("c", "e"), 2: ("d",)}
    qdf = spark.createDataFrame(
        [(qid, t) for qid, ts in batch_queries.items() for t in ts],
        "query_id long, term string",
    )
    got = TI.query_text_index_batch(spark, troot, qdf, k=3)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["bm25"], r["rank"]))
    for qid, terms in batch_queries.items():
        want = [
            (r["doc_id"], r["bm25"], i + 1)
            for i, r in enumerate(
                TI.query_text_index(spark, troot, terms, k=3).collect()
            )
        ]
        assert sorted(by_q.get(qid, [])) == sorted(want), f"query {qid}"

    # (5b) term-bag multiplicity: 'a' twice doubles its contribution
    qdup = spark.createDataFrame(
        [(9, "a"), (9, "a")], "query_id long, term string"
    )
    qone = spark.createDataFrame([(8, "a")], "query_id long, term string")
    dup_scores = {
        r["doc_id"]: r["bm25"]
        for r in TI.query_text_index_batch(spark, troot, qdup, k=5).collect()
    }
    one_scores = {
        r["doc_id"]: r["bm25"]
        for r in TI.query_text_index_batch(spark, troot, qone, k=5).collect()
    }
    assert set(dup_scores) == set(one_scores)
    for d, s in one_scores.items():
        assert abs(dup_scores[d] - round(2 * s, 6)) < 2e-6

    # (5c) allow-list narrows the batch result without re-weighting:
    # filtered scores equal unfiltered scores on the surviving docs
    # (df/N/avgdl stay corpus-global -- the Lucene convention).
    allow = spark.createDataFrame([(1,), (3,)], "doc_id long")
    unfiltered = {
        (r["query_id"], r["doc_id"]): r["bm25"]
        for r in TI.query_text_index_batch(spark, troot, qdf, k=5).collect()
    }
    filtered = TI.query_text_index_batch(
        spark, troot, qdf, k=5, allowed=allow
    ).collect()
    assert {r["doc_id"] for r in filtered} <= {1, 3}
    for r in filtered:
        assert unfiltered[(r["query_id"], r["doc_id"])] == r["bm25"]


def test_text_prf_batch_matches_per_query(spark, tmp_path):
    """The batched RM3 probe (round 13) is result-identical, per
    query, to the single-query ``query_text_index_prf`` at the same
    fb_k/n_expand/alpha budgets; its allow-list (round 14, the r13
    advice gap: the claim predated the parameter) narrows stage 1 AND
    the re-score like the family contract while df/N/avgdl stay
    corpus-global, matching the single-query probe under the same
    allow-list; duplicate terms in a query's bag collapse to the
    unique set (the single-query API rejects them outright)."""
    from iot_sensor_log_data_pipeline_spark.operators import text_index as TI

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    troot = str(tmp_path / "ti")
    TI.build_text_index(docs, troot)
    batch = {0: ("spark", "join"), 1: ("hash", "merge"), 2: ("scan",)}
    qdf = spark.createDataFrame(
        [(qid, t) for qid, ts in batch.items() for t in ts],
        "query_id long, term string",
    )
    got = {}
    for r in TI.query_text_index_prf_batch(
        spark, troot, qdf, fb_k=3, n_expand=3, alpha=0.5, k=8
    ).collect():
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["prf_score"], r["rank"])
        )
    for qid, terms in batch.items():
        want = [
            (r["doc_id"], r["prf_score"], i + 1)
            for i, r in enumerate(
                TI.query_text_index_prf(
                    spark, troot, terms, fb_k=3, n_expand=3, alpha=0.5, k=8
                ).collect()
            )
        ]
        assert sorted(got.get(qid, [])) == sorted(want), f"query {qid}"

    # duplicate bag rows collapse: same result as the unique set
    qdup = spark.createDataFrame(
        [(7, "spark"), (7, "join"), (7, "spark")], "query_id long, term string"
    )
    quniq = spark.createDataFrame(
        [(8, "spark"), (8, "join")], "query_id long, term string"
    )
    gd = sorted(
        (r["doc_id"], r["prf_score"], r["rank"])
        for r in TI.query_text_index_prf_batch(
            spark, troot, qdup, fb_k=3, n_expand=3, alpha=0.5, k=8
        ).collect()
    )
    gu = sorted(
        (r["doc_id"], r["prf_score"], r["rank"])
        for r in TI.query_text_index_prf_batch(
            spark, troot, quniq, fb_k=3, n_expand=3, alpha=0.5, k=8
        ).collect()
    )
    assert gd == gu

    # Allow-list parity: the batch under an allow-list matches the
    # single-query probe under the SAME allow-list, per query.  The
    # allow-list excludes at least one doc each query ranked
    # unfiltered, so the filter demonstrably bites (feedback docs AND
    # re-scored docs both come from the allowed set).
    unfiltered_ids = {doc for rows in got.values() for (doc, _, _) in rows}
    all_ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    allow_ids = [d for i, d in enumerate(all_ids) if i % 2 == 0]
    assert set(allow_ids) & unfiltered_ids and (
        unfiltered_ids - set(allow_ids)
    ), "allow-list must both keep and drop some unfiltered results"
    allow = spark.createDataFrame([(d,) for d in allow_ids], "doc_id long")
    got_f = {}
    for r in TI.query_text_index_prf_batch(
        spark, troot, qdf, fb_k=3, n_expand=3, alpha=0.5, k=8, allowed=allow
    ).collect():
        got_f.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["prf_score"], r["rank"])
        )
    for qid, terms in batch.items():
        want_f = [
            (r["doc_id"], r["prf_score"], i + 1)
            for i, r in enumerate(
                TI.query_text_index_prf(
                    spark, troot, terms, fb_k=3, n_expand=3, alpha=0.5, k=8,
                    allowed=allow,
                ).collect()
            )
        ]
        assert sorted(got_f.get(qid, [])) == sorted(want_f), f"filtered {qid}"
        assert {d for (d, _, _) in got_f.get(qid, [])} <= set(allow_ids)


def test_text_rag_batch_matches_per_query(spark, tmp_path):
    """The batched RAG context composition (round 14: batched hybrid
    retrieval -> per-query RRF -> multi-query MMR) is result-identical,
    per query, to the single-query composition (single BM25 probe +
    single LSH probe -> rrf_fuse -> mmr_rerank) at the same
    k/pool/lam budgets -- the same batch==per-query contract the
    probe families carry, proven at the top of the serving stack."""
    from pyspark.sql.window import Window

    from iot_sensor_log_data_pipeline_spark.operators import ann_index as AI
    from iot_sensor_log_data_pipeline_spark.operators import text_index as TI
    from iot_sensor_log_data_pipeline_spark.operators.similarity import (
        hash_hyperplanes,
        mmr_rerank,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    troot = str(tmp_path / "ti")
    TI.build_text_index(docs, troot)
    demb = TX.hash_embedding(docs, dim=64)
    lroot = str(tmp_path / "lsh")
    AI.build_lsh_index(
        demb, lroot, id_col="doc_id", bands=16, rows_per_band=4,
        planes=hash_hyperplanes(64, dim=64),
    )
    stored = AI.read_index_vectors(spark, lroot, "doc_id", "embedding")

    batch = {0: ("spark", "join"), 1: ("hash", "merge"), 2: ("scan", "filter")}
    qdf = spark.createDataFrame(
        [(qid, t) for qid, ts in batch.items() for t in ts],
        "query_id long, term string",
    )
    sparse_b = TI.query_text_index_batch(spark, troot, qdf, k=15).select(
        "query_id", "doc_id", "rank"
    )
    qtexts = spark.createDataFrame(
        [(-(qid + 1), " ".join(ts)) for qid, ts in batch.items()],
        "doc_id long, text string",
    )
    qemb = TX.hash_embedding(qtexts, dim=64)
    dense_b = AI.query_lsh_index(spark, lroot, qemb, k=15, id_col="doc_id").select(
        (-F.col("query_id") - 1).alias("query_id"),
        F.col("neighbor_id").alias("doc_id"),
        "rank",
    )
    fused_b = TX.rrf_fuse_batch([sparse_b, dense_b], k=10)
    cand_b = fused_b.select("query_id", F.col("doc_id").alias("neighbor_id"))
    qvecs = qemb.select((-F.col("doc_id") - 1).alias("doc_id"), "embedding")
    got = {}
    for r in mmr_rerank(
        stored, qvecs, k=3, pool=10, lam=0.75,
        id_col="doc_id", vec_col="embedding", candidates=cand_b,
    ).collect():
        got.setdefault(r["query_id"], []).append(
            (r["neighbor_id"], round(r["mmr"], 9), r["rank"])
        )

    for qid, terms in batch.items():
        sparse_1 = TI.query_text_index(spark, troot, list(terms), k=15)
        w = Window.partitionBy(F.lit(1)).orderBy(
            F.desc("bm25"), F.asc("doc_id")
        )
        sparse_1 = sparse_1.withColumn(
            "rank", F.row_number().over(w)
        ).select("doc_id", "rank")
        qemb_1 = qemb.where(F.col("doc_id") == -(qid + 1))
        dense_1 = AI.query_lsh_index(
            spark, lroot, qemb_1, k=15, id_col="doc_id"
        ).select(F.col("neighbor_id").alias("doc_id"), "rank")
        fused_1 = TX.rrf_fuse([sparse_1, dense_1], k=10)
        cand_1 = fused_1.select(
            F.lit(-(qid + 1)).cast("long").alias("query_id"),
            F.col("doc_id").alias("neighbor_id"),
        )
        want = [
            (r["neighbor_id"], round(r["mmr"], 9), r["rank"])
            for r in mmr_rerank(
                stored, qemb_1, k=3, pool=10, lam=0.75,
                id_col="doc_id", vec_col="embedding", candidates=cand_1,
            ).collect()
        ]
        assert sorted(got.get(qid, [])) == sorted(want), f"query {qid}"
        assert len(got.get(qid, [])) == 3, f"query {qid} context size"

    # Filtered batch (round 14): the allow-list through BOTH probes
    # must (a) keep every context passage inside the slice and (b)
    # match the per-query filtered composition.  The slice (every
    # other doc id) demonstrably drops some unfiltered contexts.
    unfiltered_ids = {doc for rows in got.values() for (doc, _, _) in rows}
    all_ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    allow_ids = [d for i, d in enumerate(all_ids) if i % 2 == 0]
    assert unfiltered_ids - set(allow_ids), "slice must drop some contexts"
    allow = spark.createDataFrame([(d,) for d in allow_ids], "doc_id long")
    sparse_f = TI.query_text_index_batch(
        spark, troot, qdf, k=15, allowed=allow
    ).select("query_id", "doc_id", "rank")
    dense_f = AI.query_lsh_index(
        spark, lroot, qemb, k=15, id_col="doc_id", allowed=allow
    ).select(
        (-F.col("query_id") - 1).alias("query_id"),
        F.col("neighbor_id").alias("doc_id"),
        "rank",
    )
    fused_f = TX.rrf_fuse_batch([sparse_f, dense_f], k=10)
    got_f = {}
    for r in mmr_rerank(
        stored, qvecs, k=3, pool=10, lam=0.75,
        id_col="doc_id", vec_col="embedding",
        candidates=fused_f.select(
            "query_id", F.col("doc_id").alias("neighbor_id")
        ),
    ).collect():
        got_f.setdefault(r["query_id"], []).append(
            (r["neighbor_id"], round(r["mmr"], 9), r["rank"])
        )
    for qid in batch:
        ids_f = {d for (d, _, _) in got_f.get(qid, [])}
        assert ids_f <= set(allow_ids), f"filtered {qid} leaked {ids_f}"
        assert got_f.get(qid), f"filtered {qid} lost its context"


def test_persisted_ivfpq_opq_parity_and_rotated_ingest(spark, tmp_path):
    """The OPQ-rotated IVF-PQ persisted index (round 13) serves results
    identical to the ad-hoc ``ivfpq_topk(rotation=...)`` at the same
    quantizer triple, and a streaming-ingested batch encodes THROUGH
    the persisted rotation (the rotation is quantizer state: findable
    post-ingest at the same ADC path)."""
    from iot_sensor_log_data_pipeline_spark.operators import ann_index as AI
    from iot_sensor_log_data_pipeline_spark.streaming.pipeline import (
        index_ingest_apply_batch,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").where(
        "vec_id < 150"
    )
    queries = emb.where("vec_id < 3")
    cents, R, cbs = SIM.ivfpq_opq_seed_quantizers(emb, n_cells=8, m=8, n_codes=16)
    root = str(tmp_path / "ivfpq_opq")
    AI.build_ivfpq_index(
        emb, root, n_cells=8, m=8, n_codes=16,
        centroids=cents, codebooks=cbs, rotation=R,
    )
    got = AI.query_ivfpq_index(
        spark, root, queries, k=5, n_probe=4, rerank=30
    ).collect()
    want = SIM.ivfpq_topk(
        emb, queries, k=5, n_probe=4, rerank=30,
        centroids=cents, codebooks=cbs, rotation=R,
    ).collect()
    assert sorted(tuple(r) for r in got) == sorted(tuple(r) for r in want)
    assert len(got) == 15

    # Rotated ingest: a new vector near query 0 must be findable, and
    # its segment codes must equal a rotated re-encode (not a raw one).
    q0 = [float(x) for x in queries.where("vec_id = 0").collect()[0]["embedding"]]
    newv = spark.createDataFrame(
        [(900, [v + 0.001 for v in q0])], "vec_id long, embedding array<double>"
    )
    index_ingest_apply_batch(newv, 0, root)
    post = AI.query_ivfpq_index(spark, root, queries, k=5, n_probe=8, rerank=60)
    assert 900 in {
        r["neighbor_id"] for r in post.where("query_id = 0").collect()
    }
    seg_codes = sorted(
        tuple(r["codes"])
        for r in spark.read.parquet(
            str(tmp_path / "ivfpq_opq" / "codes_stream")
        ).where("id = 900").collect()
    )
    want_codes = sorted(
        tuple(r["codes"])
        for r in AI._ivfpq_encode(
            newv, cents, cbs, "vec_id", "embedding", rotation=R
        ).collect()
    )
    assert seg_codes == want_codes


def test_serving_compositions_match_adhoc(spark, tmp_path):
    """The round-12 serving compositions are result-identical to their
    ad-hoc twins (the text_hybrid_rrf_persisted precedent): (a) MMR
    over query_pq_index candidates == MMR over pq_adc_topk candidates
    at the same seed codebooks/budgets; (b) the index-resident RM3
    probe == bm25_prf_rank on the same corpus."""
    from iot_sensor_log_data_pipeline_spark.operators import ann_index as ANN
    from iot_sensor_log_data_pipeline_spark.operators import text_index as TI
    from iot_sensor_log_data_pipeline_spark.operators.text import bm25_prf_rank

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").where(
        "vec_id < 120"
    )
    queries = emb.where("vec_id < 3")
    cbs = SIM.pq_seed_codebooks(emb, m=8, k=16)
    root = str(tmp_path / "pq")
    ANN.build_pq_index(emb, root, m=8, n_codes=16, codebooks=cbs)
    cand_idx = ANN.query_pq_index(spark, root, queries, k=8, rerank=30)
    cand_adhoc = SIM.pq_adc_topk(
        emb, queries, k=8, n_codes=16, codebooks=cbs, rerank=30
    )
    got = SIM.mmr_rerank(
        emb, queries, k=3, pool=8, lam=0.75, candidates=cand_idx
    ).collect()
    want = SIM.mmr_rerank(
        emb, queries, k=3, pool=8, lam=0.75, candidates=cand_adhoc
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) == 9  # 3 queries x 3 ranks

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    troot = str(tmp_path / "ti")
    TI.build_text_index(docs, troot)
    q = ("spark", "join")
    got_t = TI.query_text_index_prf(
        spark, troot, q, fb_k=3, n_expand=3, alpha=0.5, k=10
    ).collect()
    want_t = bm25_prf_rank(docs, q, fb_k=3, n_expand=3, alpha=0.5, k=10).collect()
    assert [tuple(r) for r in got_t] == [tuple(r) for r in want_t]
    assert len(got_t) > 0


def test_ivf_geometry_hits_target_on_clustered_data(spark):
    """The derived plain-IVF plan (ivf_geometry: ~4*sqrt(N) cells,
    2-way assignment, probes filling a 25% scan budget) reaches
    recall@10 >= 0.9 on CLUSTERED vectors for BOTH probe shapes: the
    broadcast-queries ivf_topk and the large-by-large
    ivf_cogroup_join -- the round-12 twin of
    test_ivfpq_geometry_hits_target_on_clustered_data (the bench
    corpus is near-isotropic, which caps its coarse ceiling; this
    pins that the geometry, not the operator, is corpus-bound
    there)."""
    import numpy as np

    rng = np.random.RandomState(11)
    n_clusters, per = 40, 50
    centers = rng.normal(0, 10.0, size=(n_clusters, 64))
    X = np.vstack([
        centers[c] + rng.normal(0, 0.8, size=(per, 64))
        for c in range(n_clusters)
    ])
    n = len(X)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).cache()
    queries = df.where("vec_id < 20")

    geo = SIM.ivf_geometry(n, scan_fraction=0.25)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.brute_force_topk(df, queries, k=10).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.ivf_topk(
            df, queries, k=10, n_cells=geo["n_cells"],
            n_probe=geo["n_probe"], n_assign=geo["n_assign"],
            sample_size=geo["sample_size"],
        ).collect()
    }
    recall = len(exact & got) / len(exact)
    assert recall >= 0.9, f"ivf clustered recall {recall} < 0.9"

    corpus = df.where("vec_id >= 20")
    cents = SIM.kmeans_centroids(
        corpus, geo["n_cells"], sample_size=geo["sample_size"]
    )
    exact_cg = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.brute_force_topk(corpus, queries, k=10).collect()
    }
    cg = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.ivf_cogroup_join(
            queries.select("vec_id", "embedding"), corpus, cents,
            k=10, n_probe=geo["n_probe"], n_assign=2,
        ).collect()
    }
    recall_cg = len(exact_cg & cg) / len(exact_cg)
    assert recall_cg >= 0.9, f"cogroup clustered recall {recall_cg} < 0.9"


def test_query_ivf_index_match_col_parity_and_guards(spark, tmp_path):
    """query_ivf_index(match_col=, attrs=, negate=) == the ad-hoc
    filtered_ivf_topk at the same pinned quantizer -- both polarities
    -- and the parameter contract fails loudly (negate without
    match_col; match_col without the attrs side table)."""
    import pytest as _pytest

    from iot_sensor_log_data_pipeline_spark.operators import ann_index as ANN

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").where(
        "vec_id < 100"
    )
    queries = emb.where("vec_id < 3")
    cents = SIM.seed_centroids(emb, 8)
    root = str(tmp_path / "ivf_attr")
    ANN.build_ivf_index(emb, root, n_cells=8, n_assign=2, centroids=cents)
    attrs = emb.select("vec_id", "label")
    for neg in (False, True):
        got = ANN.query_ivf_index(
            spark, root, queries, k=5, n_probe=4,
            match_col="label", attrs=attrs, negate=neg,
        ).collect()
        want = SIM.filtered_ivf_topk(
            emb, queries, k=5, match_col="label", negate=neg,
            n_cells=8, n_probe=4, n_assign=2, centroids=cents,
        ).collect()
        assert sorted(tuple(r) for r in got) == sorted(tuple(r) for r in want)
    with _pytest.raises(ValueError, match="negate=True needs match_col"):
        ANN.query_ivf_index(spark, root, queries, negate=True)
    with _pytest.raises(ValueError, match="passed together"):
        ANN.query_ivf_index(spark, root, queries, match_col="label")


def test_query_index_match_col_family_parity(spark, tmp_path):
    """match_col/attrs/negate on the lsh / pq / ivfpq probes: for a
    single-label query, the equality constraint must equal the
    already-pinned allowed= path with the allow-list set to that
    label's ids, and negate=True must equal allowed= set to the
    complement -- per index kind (the family identity the allowed=
    rows established in round 11)."""
    from iot_sensor_log_data_pipeline_spark.operators import ann_index as ANN

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").where(
        "vec_id < 100"
    )
    q = emb.where("vec_id = 1")
    (qlabel,) = [r["label"] for r in q.collect()]
    same = emb.where(F.col("label").eqNullSafe(F.lit(qlabel))).select("vec_id")
    diff = emb.where(~F.col("label").eqNullSafe(F.lit(qlabel))).select("vec_id")
    attrs = emb.select("vec_id", "label")

    lroot = str(tmp_path / "lsh")
    ANN.build_lsh_index(
        emb, lroot, bands=8, rows_per_band=4,
        planes=SIM.hash_hyperplanes(32, dim=64),
    )
    proot = str(tmp_path / "pq")
    ANN.build_pq_index(
        emb, proot, m=8, n_codes=16,
        codebooks=SIM.pq_seed_codebooks(emb, m=8, k=16),
    )
    iroot = str(tmp_path / "ivfpq")
    cents, cbs = SIM.ivfpq_seed_quantizers(emb, n_cells=4, m=8, n_codes=16)
    ANN.build_ivfpq_index(
        emb, iroot, n_cells=4, m=8, n_codes=16, centroids=cents, codebooks=cbs
    )

    probes = {
        "lsh": lambda **kw: ANN.query_lsh_index(spark, lroot, q, k=5, **kw),
        "pq": lambda **kw: ANN.query_pq_index(spark, proot, q, k=5, rerank=20, **kw),
        "ivfpq": lambda **kw: ANN.query_ivfpq_index(
            spark, iroot, q, k=5, n_probe=4, rerank=20, **kw
        ),
    }
    for kind, probe in probes.items():
        for neg, ref_list in ((False, same), (True, diff)):
            got = probe(match_col="label", attrs=attrs, negate=neg).collect()
            want = probe(allowed=ref_list).collect()
            assert sorted(tuple(r) for r in got) == sorted(
                tuple(r) for r in want
            ), f"{kind} negate={neg} mismatch"
            assert len(got) > 0, f"{kind} negate={neg} returned nothing"


def test_round12_review_fix_battery(spark, tmp_path, monkeypatch):
    """Round-12 self-review findings: (1) _swap_dir survives a probe's
    _heal_swap_for_read firing inside its two-rename window (the heal
    cannot distinguish a crash from an in-flight swap; the swap must
    retry, not die and strand the staged tree); (2) the winnowing
    probe path self-heals a crashed swap like the ann/text families."""
    import os as _os

    from iot_sensor_log_data_pipeline_spark.operators import ann_index as AI

    # (1) simulated heal race: the first rename(tmp -> final) finds
    # the target restored by a concurrent probe and must retry.
    final = tmp_path / "t"
    tmp = tmp_path / "t__next"
    final.mkdir()
    (final / "old.txt").write_text("old")
    tmp.mkdir()
    (tmp / "new.txt").write_text("new")
    real_rename = _os.rename
    fired = {"done": False}

    def racy_rename(src, dst):
        if not fired["done"] and str(src) == str(tmp):
            fired["done"] = True
            real_rename(str(final) + "__old", str(final))  # the "heal"
        return real_rename(src, dst)

    monkeypatch.setattr(AI.os, "rename", racy_rename)
    AI._swap_dir(str(final), str(tmp))
    monkeypatch.setattr(AI.os, "rename", real_rename)
    assert (final / "new.txt").exists()
    assert not (final / "old.txt").exists()
    assert not _os.path.exists(str(final) + "__old")
    assert not tmp.exists()

    # (2) winnowing probe self-heal
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "pack my box with five dozen liquor jugs")],
        "doc_id long, text string",
    )
    wroot = str(tmp_path / "winnow")
    DD.build_winnowing_index(docs, wroot)
    _os.rename(
        _os.path.join(wroot, "postings"), _os.path.join(wroot, "postings__old")
    )
    postings, k, w = DD.load_winnowing_index(spark, wroot)
    assert postings.count() > 0
    assert _os.path.exists(_os.path.join(wroot, "postings"))


def test_ivf_index_probe_sweep_matches_adhoc(spark, tmp_path):
    """The persisted-store sweep == the ad-hoc sweep at the same
    pinned quantizer (stored inverted lists replace re-assignment),
    and the persisted variant rejects empty query samples."""
    import pytest as _pytest

    from iot_sensor_log_data_pipeline_spark.operators import ann_index as ANN

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").where(
        "vec_id < 80"
    )
    queries = emb.where("vec_id < 3")
    cents = SIM.seed_centroids(emb, 8)
    root = str(tmp_path / "ivf_sweep")
    ANN.build_ivf_index(emb, root, n_cells=8, n_assign=2, centroids=cents)
    got = ANN.ivf_index_probe_sweep(
        spark, root, queries, probes=(1, 2, 4), k=5
    ).collect()
    want = SIM.ivf_probe_sweep(
        emb, queries, probes=(1, 2, 4), k=5, n_assign=2, centroids=cents
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    recalls = [r["recall_at_k"] for r in got]
    assert recalls == sorted(recalls)  # wider probes never lose recall
    with _pytest.raises(ValueError, match="non-empty"):
        ANN.ivf_index_probe_sweep(
            spark, root, emb.where("vec_id < 0"), probes=(1,)
        )


def test_round14_advice_fix_battery(monkeypatch):
    """Regression pytests for the three round-13 ADVICE findings:
    (1) ``bench.warm_canary_ratio`` runs one UNTIMED pass before the
    timed min-of-passes, so the adjacent streaming canary is measured
    warm like the pinned fully-warm reference (pre-fix the streaming
    ratio carried first-plan JIT, inflating normalized throughput
    ~16%); (2) ``bench.timed_over_batch`` divides by the ACTUAL
    distinct-query count, never an assumed 50, and raises on an empty
    batch (pre-fix a short text vocab or sparse vec_id range silently
    understated the amortized per-query cost); (3)
    ``query_text_index_prf_batch`` has the family's ``allowed=``
    parameter (the docstring claim in
    test_text_prf_batch_matches_per_query predated the parameter --
    the behavioral parity pin lives there)."""
    import inspect
    import time

    import pytest as _pytest

    import bench as B
    from iot_sensor_log_data_pipeline_spark.operators import text_index as TI

    # (1) one untimed warm pass + `passes` timed passes, ratio from
    # the timed min only: with a ref of 1.0 the ratio equals the
    # fastest TIMED run, and the call count proves the warm pass ran.
    calls = {"n": 0}

    def run():
        calls["n"] += 1

    ratio = B.warm_canary_ratio(run, ref=1.0, passes=2)
    assert calls["n"] == 3, "1 untimed warm + 2 timed passes"
    assert 0.0 <= ratio < 1.0  # a no-op body measures ~0 s against ref 1.0

    # (2) amortized cost divides by the actual batch size
    per_q = B.timed_over_batch(lambda: None, n_queries=10, passes=1)
    assert per_q >= 0.0
    slow = B.timed_over_batch(lambda: time.sleep(0.05), n_queries=5, passes=1)
    assert 0.05 / 5 * 0.5 <= slow <= 0.05  # ~wall/5, not wall/50
    with _pytest.raises(ValueError, match="empty query batch"):
        B.timed_over_batch(lambda: None, n_queries=0)

    # (3) family parity: the batched RM3 probe accepts allowed=
    assert "allowed" in inspect.signature(TI.query_text_index_prf_batch).parameters
    assert "allowed" in inspect.signature(TI.query_text_index_prf).parameters


def test_graph_probe_batch_matches_per_query(spark, tmp_path):
    """The graph beam search is batch-invariant (round-14 verdict item
    3): probing N queries in one ``query_graph_index`` call returns,
    per query, exactly the rows that probing each query alone returns.
    This is the property that makes the bench's ``graph_probe_batch50``
    amortized line honest -- the beam search is already a batched
    frontier join by construction (every hop expands ALL queries'
    beams through one adjacency join; no cross-query state), so
    batching divides job-launch overhead without changing results."""
    import numpy as np

    from iot_sensor_log_data_pipeline_spark.operators import graph_ann as GA

    rng = np.random.default_rng(14)
    centers = rng.standard_normal((4, 16)) * 4.0
    rows = [
        (int(c * 100 + j), [float(x) for x in centers[c] + rng.standard_normal(16)])
        for c in range(4)
        for j in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    path = str(tmp_path / "graph_batch")
    GA.build_graph_index(emb, path)

    queries = emb.where(F.col("vec_id") % 100 < 2)  # 8 queries
    batch = {
        (r["query_id"], r["neighbor_id"], round(r["cos_sim"], 9))
        for r in GA.query_graph_index(spark, path, queries, k=5).collect()
    }
    solo = set()
    for qrow in queries.select("vec_id").collect():
        one = queries.where(F.col("vec_id") == qrow["vec_id"])
        solo |= {
            (r["query_id"], r["neighbor_id"], round(r["cos_sim"], 9))
            for r in GA.query_graph_index(spark, path, one, k=5).collect()
        }
    assert batch == solo


def test_ivfpq_trainers_derive_lloyd_sample_from_cell_count(spark, monkeypatch):
    """Round-14 scale-bug pin: both IVF-PQ production trainers size
    their Lloyd samples by ``_derived_sample_size(n_cells)`` (16
    rows/cell, clamped) instead of the 2048-row default.  The old
    default DEGENERATED at n_cells >= 2048: one sample point per
    cluster made the coarse quantizer memorize the md5-smallest-2048
    sample, and ``pq_codebooks`` -- drawing the SAME md5-smallest ids
    -- then trained on residuals that were all exactly zero, yielding
    64 identical all-zero codewords per subspace and an ADC stage
    blind to everything (measured at 200k vectors / 2048 derived
    cells: a streamed-in exact duplicate was unfindable because the
    shortlist collapsed to an id-order scan).  End-to-end repro needs
    a 200k corpus, so this pins the sample-size plumbing both
    trainers now share."""
    captured = {}
    real_kmeans = SIM.kmeans_centroids
    real_pq = SIM.pq_codebooks

    def spy_kmeans(vectors, n_cells, **kw):
        captured["kmeans_sample"] = kw.get("sample_size")
        return real_kmeans(vectors, n_cells, **kw)

    def spy_pq(vectors, **kw):
        captured["pq_sample"] = kw.get("sample_size")
        return real_pq(vectors, **kw)

    monkeypatch.setattr(SIM, "kmeans_centroids", spy_kmeans)
    monkeypatch.setattr(SIM, "pq_codebooks", spy_pq)

    emb = spark.createDataFrame(
        [(i, [float((i * 7 + j) % 13) for j in range(16)]) for i in range(80)],
        "vec_id long, embedding array<double>",
    )
    for trainer in (
        lambda: SIM.ivfpq_trained_quantizers(
            emb, n_cells=4096, m=4, n_codes=8, dim=16
        ),
        lambda: SIM.ivfpq_opq_quantizers(
            emb, n_cells=4096, m=4, n_codes=8, dim=16
        ),
    ):
        captured.clear()
        trainer()
        want = SIM._derived_sample_size(4096)  # 65536-clamped, >> 4096
        assert captured["kmeans_sample"] == want, captured
        assert captured["pq_sample"] == want, captured
        assert want > 4096, "sample must exceed the cell count"


def test_round14_metadata_io_fast_path(spark, tmp_path):
    """Round-14 optimization battery: the driver-side KB-metadata I/O
    (_write_small / _read_small pyarrow fast path) is value- and
    schema-identical to the Spark writer/reader it replaced, including
    NULL cells, empty tables, and the non-local fallback trigger."""
    from iot_sensor_log_data_pipeline_spark.operators.ann_index import (
        _arrow_schema_from_ddl,
        _read_small,
        _run_overlapped,
        _write_small,
    )

    p = str(tmp_path / "meta")
    rows = [("lsh", 16, None, [1.0, -0.5]), ("ivf", None, 2.5, [])]
    _write_small(spark, rows, "kind string, n int, x double, w array<double>", p)
    # Spark reads the pyarrow-written table back with the exact schema
    # the createDataFrame path produced.
    df = spark.read.parquet(p)
    assert dict(df.dtypes) == {
        "kind": "string", "n": "int", "x": "double", "w": "array<double>"
    }
    got = sorted(_read_small(spark, p), key=lambda r: r["kind"])
    assert got == [
        {"kind": "ivf", "n": None, "x": 2.5, "w": []},
        {"kind": "lsh", "n": 16, "x": None, "w": [1.0, -0.5]},
    ]
    assert sorted(
        (r.asDict() for r in df.collect()), key=lambda r: r["kind"]
    ) == got

    # Empty table round-trips (the no-cap stopterms write).
    pe = str(tmp_path / "empty")
    _write_small(spark, [], "term string, df long", pe)
    assert _read_small(spark, pe) == []
    assert spark.read.parquet(pe).count() == 0

    # Overwrite semantics: a second write replaces, never appends.
    _write_small(spark, [("x", 1, None, [])],
                 "kind string, n int, x double, w array<double>", p)
    assert len(_read_small(spark, p)) == 1

    # A type outside the metadata vocabulary falls back to the Spark
    # writer (still correct, just distributed).
    assert _arrow_schema_from_ddl("d decimal(10,2)") is None
    from decimal import Decimal

    pd_ = str(tmp_path / "dec")
    _write_small(spark, [(Decimal("1.25"),)], "v decimal(10,2)", pd_)
    assert spark.read.parquet(pd_).count() == 1

    # _run_overlapped propagates a thunk's exception after all finish.
    import pytest as _pytest

    seen = []
    with _pytest.raises(RuntimeError, match="boom"):
        _run_overlapped(
            lambda: seen.append(1),
            lambda: (_ for _ in ()).throw(RuntimeError("boom")),
        )
    assert seen == [1]


def test_graph_probe_driver_path_matches_distributed(spark, tmp_path):
    """Round-15 driver-local beam search: for an index under the size
    gate the probe walks the graph on the driver with bit-identical
    float semantics (exact fold order, HALF_UP rounding, NaN-first
    descending ties).  Parity is pinned EXACTLY (tuple equality of
    every column, doubles included) against the distributed walk,
    across tombstones, streaming segments, and the exclude-batch
    replay hook -- the branches the fast path re-implements."""
    import numpy as np

    from iot_sensor_log_data_pipeline_spark.operators import graph_ann as GA

    rng = np.random.default_rng(15)
    rows = [(i, [float(x) for x in rng.standard_normal(64)]) for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.where(F.col("vec_id") < 6)

    path = str(tmp_path / "graph_parity_idx")
    GA.build_graph_index(emb, path)
    # streaming segment + tombstones so the fast path's union /
    # exclusion logic is exercised, not just the happy path
    seg = spark.createDataFrame(
        [(1000 + i, [float(x) for x in rng.standard_normal(64)]) for i in range(8)],
        "vec_id long, embedding array<float>",
    )
    GA.graph_ingest_apply_batch(seg, 7, path)
    GA.delete_from_graph_index(
        spark.createDataFrame([(3,), (1003,)], "vec_id long"), path
    )

    def probe(**kw):
        return sorted(
            map(
                tuple,
                GA.query_graph_index(
                    spark, path, queries, k=10, beam=16, hops=4, **kw
                ).collect(),
            )
        )

    assert GA._local_dir_bytes(str(tmp_path / "graph_parity_idx/graph")) > 0
    driver_rows = probe()
    old_gate = GA._DRIVER_PROBE_MAX_BYTES
    GA._DRIVER_PROBE_MAX_BYTES = 0  # force the distributed walk
    try:
        dist_rows = probe()
    finally:
        GA._DRIVER_PROBE_MAX_BYTES = old_gate
    assert driver_rows == dist_rows
    assert len(driver_rows) > 0
    assert not any(r[1] in (3, 1003) for r in driver_rows)  # tombstones out

    # the ingest replay hook: excluding the segment's own batch must
    # match on both paths too
    drv_excl = probe(_exclude_batch=7)
    GA._DRIVER_PROBE_MAX_BYTES = 0
    try:
        dist_excl = probe(_exclude_batch=7)
    finally:
        GA._DRIVER_PROBE_MAX_BYTES = old_gate
    assert drv_excl == dist_excl
    assert not any(1000 <= r[1] < 1008 for r in drv_excl)  # segment excluded
