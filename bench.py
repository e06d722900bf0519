"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

Each query is executed to completion with the ``noop`` sink (full plan
runs, nothing is collected to the driver -- the honest measure of
distributed execution cost, and how a 100 TB run would be driven).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from iot_sensor_log_data_pipeline_spark.plans import catalog  # noqa: E402
from iot_sensor_log_data_pipeline_spark.session import (  # noqa: E402
    default_parallelism,
    get_spark,
)

#: Headline set: one per major subsystem, weighted toward shuffling plans.
HEADLINE: tuple[str, ...] = (
    "hourly_avg_value",
    "hourly_avg_by_type",
    "histogram_max_value",
    "value_props_corr",
    "row_transform_flatten",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "join_semi_anti_balance",
    "window_top_orders_per_customer",
    "downsample_ohlc_10min",
    "sessionize_events",
    "subquery_correlated_q17",
    "udf_grouped_map_zscore",
    "dedup_exact_documents",
    "dedup_minhash_lsh",
    "dedup_passage_chunks",
    "dedup_semantic_survivors",
    # round 5: verbatim substring dedup (find + clean) and the
    # documents -> hash-embedding -> SemDeDup composition
    "dedup_verbatim_runs",
    "dedup_verbatim_clean",
    "dedup_semantic_text_survivors",
    "similarity_topk_cosine",
    "similarity_lsh_ann",
    "similarity_ivf_seed_ann",
    "text_quality_score",
    "text_unigram_logprob",
    "text_bigram_logprob",
    "text_repetition_stats",
    # round 6: per-language ntile gate (CCNet head/middle/tail)
    "text_ccnet_quality_buckets",
    # round 6: NB quality classifier (train + score, full corpus)
    "text_nb_quality_scores",
    # round 6: JL prefilter + exact re-rank (serving path; recall
    # evidence lives in the planted-cluster pytest, not this corpus)
    "similarity_rp_ann",
    # round 6: MOSS winnowing local-overlap candidate pairs
    "dedup_winnowing_pairs",
    "profile_psi_drift",
    "events_path_trigrams",
    "downsample_lttb_value",
    "corpus_weighted_sample",
    "corpus_mixture_weights",
    # round 6: the DSIR importance-resampling composition
    "corpus_dsir_resample",
    # round 8: tf*rarity-weighted SimHash (vocabulary join + in-row fold)
    "dedup_weighted_simhash",
    # round 8: bucketed interval-overlap join over user sessions
    "events_session_overlap",
    # round 8: one-pass Arrow-gemm embedding covariance
    "profile_embedding_covariance",
    # round 8: span-level decontamination (positional grams + excision)
    "corpus_decontaminate_spans",
    # round 8: Gopher rule gate (pure codegen column battery)
    "text_gopher_quality_gate",
    # round 8: DDSketch relative-error quantiles (alpha-only buckets)
    "sketch_dd_quantiles",
    # round 8: differentiated skew join (hot keys broadcast, cold shuffle)
    "join_hot_key_split",
    # round 8: pre-join skew diagnostic (count-only shuffles + top-k)
    "profile_join_skew",
    # round 8: large-by-large cogrouped IVF ANN join + its label-vote
    # composition (the no-broadcast-side similarity shape)
    "similarity_ivf_cogroup_join",
    "similarity_knn_label_transfer",
    # round 8: one-pass filter operating-point sweep
    "corpus_quality_threshold_sweep",
    # round 8: sequential recurrence-with-reset (grouped Arrow fold)
    "anomaly_cusum_shifts",
    # round 9: pinned hub graph build + unchanged beam-search probe
    "similarity_graph_seed_ann",
    # round 9: persisted PQ build + compressed-code ADC probe
    "similarity_persisted_pq_ann",
    # round 9: OPQ rotation (covariance -> eigh -> LPT allocation) + ADC
    "similarity_opq_adc_ann",
    # round 9: content-addressed bottom-k sample (TakeOrdered shape)
    "corpus_content_sample",
    # round 9: per-hot-key skew mitigation plan (count-only shuffles)
    "profile_salt_advisor",
    # round 9: Matryoshka prefix-truncation recall report (3 widths)
    "similarity_dim_truncation",
    # round 9: bigram-PMI collocation mining (two explodes + totals)
    "text_bigram_pmi",
    # round 9: one-register-build pairwise source overlap (HLL algebra)
    "sketch_hll_source_overlap",
    # round 9: chunk -> hash-embed -> cosine top-k (the RAG read path)
    "text_chunk_retrieval",
    # round 9: binned two-sample KS vs rest (one (group,bin) hash agg)
    "profile_ks_drift",
    # round 10: TPC-H Q9 over the derived partsupp (the composite-key
    # lineitem x partsupp join + exact-DECIMAL signed money)
    "q9_product_type_profit",
    # round 10: CDC view maintenance (affected-key recompute + exceptAll)
    "incremental_join_cdc_refresh",
    # round 10: IVF-PQ residual composite (cell-pruned ADC + re-rank)
    "similarity_ivfpq_ann",
    # round 11: metadata-filtered vector search (pre-re-rank predicate)
    "similarity_filtered_seed_ann",
    # round 11: MMR diversification (pool-bounded Arrow greedy)
    "similarity_mmr_rerank",
    # round 11: RM3 feedback loop (two ranked passes + 8-term model)
    "text_bm25_prf_search",
    # round 11: interpolated Kneser-Ney scoring (bigram-type-table aggs)
    "text_kneser_ney_logprob",
    # round 11: zero-shuffle token blocklist gate (array-literal scan)
    "text_blocklist_filter",
    # round 12: MMR served from the persisted PQ index (probe -> greedy)
    "similarity_mmr_persisted",
    # round 12: RM3 served from the inverted index (no corpus re-tokenize)
    "text_bm25_prf_persisted",
    # round 12: hard negatives via the persisted probe's attribute constraint
    "similarity_hard_negatives_persisted",
    # round 12: the one-plan RAG read path (retrieve -> fuse -> diversify)
    "text_rag_context_persisted",
)

#: Canary queries: plans pinned since <= round 9 whose code is
#: deliberately never touched -- their round-over-round timing ratio
#: measures HOST drift, not code.  Every artifact reports
#: ``canary_factor`` = geometric mean of (current / reference) over
#: these, so a uniform ambient shift (round-11 postmortem: every
#: untouched query read ~1.34x slower purely from host throughput) is
#: machine-visible instead of a judgement call.  References pinned
#: from the round-12 quiet-machine run; re-pin ONLY when the host
#: demonstrably changes (record it in SCALE.md).
#:
#: Keyed by SCALE FACTOR (round-13 advice fix): the references are
#: absolute seconds from the sf0.1 quiet-host run, so applying them at
#: any other ``SPARK_GRAFT_SF_DIR`` would conflate corpus size with
#: host drift.  At an unpinned sf, ``canary_factor`` is None and raw
#: timings stand alone (honest, if less comparable).
CANARIES_BY_SF: dict[str, dict[str, float]] = {
    "0.1": {
        "q1_pricing_summary": 1.236,
        "text_quality_score": 0.848,
        "corpus_content_sample": 0.254,
    },
}


def timed_over_batch(fn, n_queries: int, passes: int = 2) -> float:
    """Amortized per-query seconds for a batched probe: min-of-passes
    wall time divided by the ACTUAL distinct-query count -- never an
    assumed batch size (round-13 advice: the text probe's vocab is
    limit(150) grouped i//3 and the vector batch assumes dense vec_id
    < 50; a short batch must not silently understate the per-query
    cost).  Raises on an empty batch instead of recording a lie."""
    if n_queries <= 0:
        raise ValueError(f"empty query batch (n_queries={n_queries})")
    best = None
    for _ in range(passes):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    return round(best / n_queries, 4)


def warm_canary_ratio(run_fn, ref: float, passes: int = 2) -> float:
    """Host-drift ratio of a canary plan against its pinned quiet-host
    reference, measured WARM: one untimed pass first, then
    min-of-``passes`` timed.  The pinned refs come from the bench's
    fully-warm two-pass protocol, so an adjacent probe that is the
    session's first execution of the plan conflates JIT warmup with
    host drift (round-13 advice: the streaming ratio read 1.26 vs the
    same session's full-protocol 1.06, inflating the normalized
    throughput ~16%)."""
    run_fn()  # untimed: compile/JIT/page-cache warmup
    best = None
    for _ in range(passes):
        t0 = time.perf_counter()
        run_fn()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    return round(best / ref, 4)


def wait_for_quiet_machine(
    threshold: float = 3.0, timeout_s: int = 180, poll_s: int = 5
) -> dict:
    """Gate the run on ambient load: spin-wait until the 1-minute load
    average drops below ``threshold`` (or the timeout passes), and
    report what happened INTO the result JSON -- a bench artifact taken
    on a busy machine must say so loudly instead of reading as a code
    regression.  Round-9 postmortem: the committed artifact ran at
    load 6.14 and printed graph_build 11.25 s where a quiet machine
    measures 8.8 s -- the artifact hid an actual improvement."""
    initial = os.getloadavg()[0]
    waited = 0
    load = initial
    while load > threshold and waited < timeout_s:
        time.sleep(poll_s)
        waited += poll_s
        load = os.getloadavg()[0]
    return {
        "threshold": threshold,
        "initial": round(initial, 2),
        "at_start": round(load, 2),
        "waited_sec": waited,
        "gate_passed": load <= threshold,
    }


def ann_recall(spark, sf_dir: str, k: int = 10, n_queries: int = 50) -> dict[str, float]:
    """recall@k of the approximate ANN paths vs brute-force cosine on
    the bench corpus -- printed every round so quantizer/banding work
    is measurable, not just 'still runs'.

    n_queries 5 -> 50 in round 11: 5 queries x 10 neighbors = 50
    exact pairs gave the recall lines a +-0.1 sampling band (the
    round-10 ivfpq '0.80' measured 0.67 over 50 queries at identical
    geometry), which is wider than the effects being tracked.  Every
    recall value re-baselines this round; round-over-round deltas
    start from BENCH_r11."""
    from pyspark.sql import functions as F

    from iot_sensor_log_data_pipeline_spark.io_utils import load
    from iot_sensor_log_data_pipeline_spark.operators import graph_ann as GA
    from iot_sensor_log_data_pipeline_spark.operators import similarity as SIM

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < n_queries)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.brute_force_topk(emb, queries, k=k).collect()
    }
    # Corpus-scaled IVF-PQ geometry (round 11, similarity.py:
    # ivfpq_geometry): cells/probes/assignment derived from N at a 25%
    # scan budget instead of a hard-coded 64/16.
    n_emb = emb.count()
    _IVFPQ_GEO = SIM.ivfpq_geometry(n_emb, scan_fraction=0.25, k=k)
    _IVFPQ_TRAINED = SIM.ivfpq_trained_quantizers(
        emb, n_cells=_IVFPQ_GEO["n_cells"], m=8, n_codes=64
    )
    _IVFPQ_OPQ = SIM.ivfpq_opq_quantizers(
        emb, n_cells=_IVFPQ_GEO["n_cells"], m=8, n_codes=64
    )
    # ONE derived IVF-flat geometry for BOTH the broadcast "ivf" line
    # and the cogroup line, from the same N -- deriving each from its
    # own side's count can straddle a power-of-two cell boundary and
    # make the two recalls compare cell quality instead of join
    # strategy.
    _IVF_GEO = SIM.ivf_geometry(n_emb)
    out = {}
    approx_runs = (
        # same md5-derived planes as the catalog's similarity_lsh_ann
        ("lsh", lambda: SIM.lsh_topk(
            emb, queries, k=k, bands=16,
            planes=SIM.hash_hyperplanes(64, dim=64))),
        # round 12: geometry derives from N (ivf_geometry; previously
        # a fixed Lloyd-64/probe-12 that ceilinged at 0.80 as the
        # corpus outgrew it) -- passed explicitly so this line and the
        # cogroup line below provably share one quantizer plan.
        ("ivf", lambda: SIM.ivf_topk(
            emb, queries, k=k, n_cells=_IVF_GEO["n_cells"],
            n_probe=_IVF_GEO["n_probe"], n_assign=_IVF_GEO["n_assign"],
            sample_size=_IVF_GEO["sample_size"])),
        # production PQ path: Lloyd codebooks, 256 codes per subspace
        # (vs 64 in rounds <= 3 -- finer cells cut quantization error,
        # the round-3 verdict's recall ask), exact re-rank of the ADC
        # top-100.  Measured at sf0.1: 0.72 @ k=64/rr100 -> 0.88 @
        # k=256/rr50 -> 0.94 @ k=256/rr100 (same shortlist budget as
        # the round-3 number).
        ("pq", lambda: SIM.pq_adc_topk(
            emb, queries, k=k, n_codes=256,
            codebooks=SIM.pq_codebooks(emb, m=8, k=256), rerank=100)),
        # OPQ-lite (round 9): eigenvalue-allocated PCA rotation before
        # the SAME Lloyd/rerank geometry as "pq" -- the delta between
        # these two lines is the rotation's recall effect ON THIS
        # CORPUS.  Caveat: the synthetic bench embeddings are
        # near-isotropic (eigenvalue ratio ~1.9), so the rotation has
        # nothing to decorrelate here and can land at or slightly
        # below raw PQ; its win case -- correlated, steep-spectrum
        # vectors, the shape real encoders emit -- is pinned in
        # test_opq_rotation_beats_raw_pq_on_anisotropic_data
        # (0.98 vs 0.88 at a 100:1 spectrum).
        ("opq", lambda: SIM.opq_adc_topk(
            emb, queries, k=k, n_codes=256, rerank=100, lloyd=True)),
        # graph path: NN-descent build + beam-search probe (round 5) --
        # the highest-recall member; build cost shows under
        # persisted_index_sec, this line measures only accuracy.
        ("graph", lambda: GA.graph_topk(emb, queries, k=k)),
        # IVF-PQ (round 10; geometry derived since round 11): the
        # residual composite at PRODUCTION quantizers (Lloyd coarse +
        # Lloyd residual codebooks, trained once above and reused) at
        # the ivfpq_geometry plan -- n_cells ~ 4 sqrt(N), 2-way
        # multi-assignment, probes filling a 25% scan budget.
        # Round-11 measurement (50 queries, sf0.1): the ADC shortlist
        # is lossless inside probed cells, so recall == the coarse
        # ceiling; the old 64/16 single-assign geometry ceilinged at
        # 0.67 and the derived 256/32/assign-2 plan reads 0.79 at the
        # same 25% scan (0.86 @ 38%, 0.91 @ 50%).  The remaining gap
        # to pq's ~0.9+ is the corpus: near-isotropic synthetic
        # vectors have no cluster structure for the coarse quantizer
        # to exploit -- the clustered-data case (real encoder output)
        # is pinned >= 0.9 at 25% scan in
        # test_ivfpq_geometry_hits_target_on_clustered_data.  NOTE:
        # ranks by exact-L2 like "pq", compared against the cosine
        # exact set (same convention as every line here).
        ("ivfpq", lambda: SIM.ivfpq_topk(
            emb, queries, k=k,
            n_cells=_IVFPQ_GEO["n_cells"], n_probe=_IVFPQ_GEO["n_probe"],
            n_codes=64, rerank=_IVFPQ_GEO["rerank"],
            n_assign=_IVFPQ_GEO["n_assign"],
            centroids=_IVFPQ_TRAINED[0], codebooks=_IVFPQ_TRAINED[1])),
        # OPQ-rotated IVF-PQ (round 13, Ge et al. 2013 §5): the
        # residual-PCA rotation + Lloyd codebooks trained in the
        # rotated residual space, at the SAME geometry/scan budget as
        # "ivfpq" -- the delta between the two lines is the rotation's
        # recall effect.  Expectation on THIS corpus: ~flat at the deep
        # rerank the geometry prescribes (the ADC shortlist is already
        # lossless inside probed cells, so both sit at the coarse
        # ceiling); the rotation's win case -- shallow rerank ~ k on
        # anisotropic vectors -- is pinned in
        # test_ivfpq_opq_rotation_beats_raw_at_shallow_rerank.
        ("ivfpq_opq", lambda: SIM.ivfpq_topk(
            emb, queries, k=k,
            n_cells=_IVFPQ_GEO["n_cells"], n_probe=_IVFPQ_GEO["n_probe"],
            rerank=_IVFPQ_GEO["rerank"], n_assign=_IVFPQ_GEO["n_assign"],
            centroids=_IVFPQ_OPQ[0], codebooks=_IVFPQ_OPQ[2],
            rotation=_IVFPQ_OPQ[1])),
    )
    for label, fn in approx_runs:
        approx = {
            (r["query_id"], r["neighbor_id"]) for r in fn().collect()
        }
        out[label] = round(len(exact & approx) / len(exact), 4)
    # Cogrouped large-by-large join (round 8), at the SAME derived
    # quantizer geometry as the "ivf" line (round 12: ivf_geometry --
    # previously pinned Lloyd-64/probe-12) so the two recalls compare
    # the join strategy, not the cell quality.  Disjoint batch/corpus
    # split (the join has no self-exclusion -- its contract is two
    # tables), so its exact reference is over the same split.
    corpus = emb.where(F.col("vec_id") >= n_queries)
    exact_cg = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.brute_force_topk(corpus, queries, k=k).collect()
    }
    cg = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.ivf_cogroup_join(
            queries.select("vec_id", "embedding"),
            corpus,
            SIM.kmeans_centroids(
                corpus, _IVF_GEO["n_cells"],
                sample_size=_IVF_GEO["sample_size"],
            ),
            k=k,
            n_probe=_IVF_GEO["n_probe"],
            n_assign=2,
        ).collect()
    }
    out["ivf_cogroup"] = round(len(exact_cg & cg) / len(exact_cg), 4)
    return out


def persisted_index_breakdown(spark, sf_dir: str) -> dict[str, float]:
    """Build vs probe timings for the three persisted indexes (SRP-LSH,
    IVF, inverted text) -- separated so a probe-path regression is
    visible instead of being masked by build noise (the catalog's
    ``*_persisted_*`` bench lines time build+probe together).  Probes
    run min-of-2 (plan cost, not first-run JIT); builds run once (they
    are the amortized cost by definition)."""
    from pyspark.sql import functions as F

    from iot_sensor_log_data_pipeline_spark.io_utils import (
        load,
        parallelize_small,
        scratch_dir,
    )
    from iot_sensor_log_data_pipeline_spark.operators import ann_index as ANN
    from iot_sensor_log_data_pipeline_spark.operators import similarity as SIM
    from iot_sensor_log_data_pipeline_spark.operators import text_index as TI
    from iot_sensor_log_data_pipeline_spark.plans.text_queries import (
        _BM25_B,
        _BM25_K1,
        _BM25_TERMS,
    )

    emb = parallelize_small(load(spark, sf_dir, "embeddings"))
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    queries = emb.where(F.col("vec_id") < 5)
    # Batched serving probe (round 13, verdict item 6): a 5-query probe
    # is dominated by Spark job-launch overhead (~1.5-3 s/call at
    # sf0.1), the wrong denominator for a per-query serving claim.  The
    # *_probe_batch50 lines push 50 queries through ONE query_*_index
    # call and record the AMORTIZED per-query seconds -- the honest
    # serving number for a store that batches its request stream.
    queries50 = emb.where(F.col("vec_id") < 50)
    n_q50 = queries50.select("vec_id").distinct().count()
    out: dict[str, float] = {}

    def timed_batch50(key: str, fn, n_queries: int) -> None:
        # timed_over_batch divides by the ACTUAL distinct-query count,
        # not an assumed 50 (round-13 advice) -- record the count next
        # to the line whenever it differs so the artifact reads true.
        out[key] = timed_over_batch(fn, n_queries)
        if n_queries != 50:
            out[f"{key}_n_queries"] = n_queries

    def timed(key: str, fn, passes: int = 1) -> None:
        best = None
        for _ in range(passes):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        out[key] = round(best, 3)

    lsh_root = scratch_dir("bench_index", "lsh")
    timed(
        "lsh_build",
        lambda: ANN.build_lsh_index(
            emb, lsh_root, bands=16, rows_per_band=4,
            planes=SIM.hash_hyperplanes(64, dim=64),
        ),
    )
    timed(
        "lsh_probe",
        lambda: ANN.query_lsh_index(spark, lsh_root, queries, k=10)
        .write.format("noop").mode("overwrite").save(),
        passes=2,
    )
    timed_batch50(
        "lsh_probe_batch50",
        lambda: ANN.query_lsh_index(spark, lsh_root, queries50, k=10)
        .write.format("noop").mode("overwrite").save(),
        n_q50,
    )

    ivf_root = scratch_dir("bench_index", "ivf")
    timed(
        "ivf_build",
        lambda: ANN.build_ivf_index(
            emb, ivf_root, n_cells=16, n_assign=2,
            centroids=SIM.seed_centroids(emb, 16),
        ),
    )
    timed(
        "ivf_probe",
        lambda: ANN.query_ivf_index(spark, ivf_root, queries, k=10, n_probe=4)
        .write.format("noop").mode("overwrite").save(),
        passes=2,
    )
    timed_batch50(
        "ivf_probe_batch50",
        lambda: ANN.query_ivf_index(spark, ivf_root, queries50, k=10, n_probe=4)
        .write.format("noop").mode("overwrite").save(),
        n_q50,
    )

    text_root = scratch_dir("bench_index", "text")
    timed("text_build", lambda: TI.build_text_index(docs, text_root))
    timed(
        "text_probe",
        lambda: TI.query_text_index(
            spark, text_root, _BM25_TERMS, k=15, k1=_BM25_K1, b=_BM25_B
        ).write.format("noop").mode("overwrite").save(),
        passes=2,
    )
    # Batched text probe: 50 deterministic 3-term queries through ONE
    # query_text_index_batch plan; prep is collected OUTSIDE the timed
    # region so the line measures the probe, not query construction.
    # Round-14 protocol change (r13 advice follow-through): the corpus
    # vocabulary is only 31 distinct terms at EVERY sf, so the round-13
    # construction (i // 3 over the vocab) built an 11-query batch that
    # was divided by 50 -- the recorded text amortization was ~4.5x
    # optimistic.  Queries now CYCLE term combinations (i, i+7, i+13
    # mod |vocab|) so the batch is genuinely 50 distinct 3-term
    # queries; r<=13 text_probe_batch50 numbers are not comparable.
    from iot_sensor_log_data_pipeline_spark.operators import text as TX

    vocab = [
        r["term"]
        for r in docs.select(
            F.explode(TX.tokens(F.col("text"))).alias("term"), "doc_id"
        )
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.desc("df"), "term")
        .limit(150)
        .collect()
    ]
    nv = len(vocab)
    qbatch = spark.createDataFrame(
        [
            (q, vocab[(q + off) % nv])
            for q in range(50)
            for off in (0, 7, 13)
            if nv >= 3
        ],
        "query_id long, term string",
    )
    n_qtext = 50 if nv >= 3 else 0
    timed_batch50(
        "text_probe_batch50",
        lambda: TI.query_text_index_batch(
            spark, text_root, qbatch, k=10, k1=_BM25_K1, b=_BM25_B
        ).write.format("noop").mode("overwrite").save(),
        n_qtext,
    )
    # RM3 serving probe (round 12): the full feedback loop off the
    # SAME persisted text index -- the query-time cost of
    # text_bm25_prf_persisted with the build amortized away.
    timed(
        "text_prf_probe",
        lambda: TI.query_text_index_prf(
            spark, text_root, _BM25_TERMS, fb_k=5, n_expand=5, alpha=0.5,
            k=10, k1=_BM25_K1, b=_BM25_B,
        ).write.format("noop").mode("overwrite").save(),
        passes=2,
    )

    from iot_sensor_log_data_pipeline_spark.operators import graph_ann as GA

    graph_root = scratch_dir("bench_index", "graph")
    timed("graph_build", lambda: GA.build_graph_index(emb, graph_root))
    timed(
        "graph_probe",
        lambda: GA.query_graph_index(spark, graph_root, queries, k=10)
        .write.format("noop").mode("overwrite").save(),
        passes=2,
    )
    # Batched graph probe (round 14, verdict item 3): the beam search
    # is ALREADY a batched frontier join by construction -- every hop
    # expands all queries' beams in one adjacency join -- so the batch
    # line needs no new operator, just the honest 50-query denominator
    # the other five index families got in round 13.
    timed_batch50(
        "graph_probe_batch50",
        lambda: GA.query_graph_index(spark, graph_root, queries50, k=10)
        .write.format("noop").mode("overwrite").save(),
        n_q50,
    )

    # PQ (round 9): the encode pass is the build; the probe is the
    # broadcast lookup-table join over the compressed codes + re-rank.
    pq_root = scratch_dir("bench_index", "pq")
    timed(
        "pq_build",
        lambda: ANN.build_pq_index(
            emb, pq_root, m=8, n_codes=64,
            codebooks=SIM.pq_seed_codebooks(emb, m=8, k=64),
        ),
    )
    timed(
        "pq_probe",
        lambda: ANN.query_pq_index(spark, pq_root, queries, k=10, rerank=50)
        .write.format("noop").mode("overwrite").save(),
        passes=2,
    )
    timed_batch50(
        "pq_probe_batch50",
        lambda: ANN.query_pq_index(spark, pq_root, queries50, k=10, rerank=50)
        .write.format("noop").mode("overwrite").save(),
        n_q50,
    )
    # MMR serving probe (round 12): probe shortlist -> exact-cosine
    # greedy off the SAME persisted PQ index -- the query-time cost of
    # similarity_mmr_persisted with the build amortized away.
    timed(
        "pq_mmr_probe",
        lambda: SIM.mmr_rerank(
            emb, queries, k=3, pool=10, lam=0.75,
            candidates=ANN.query_pq_index(spark, pq_root, queries, k=10, rerank=50),
        ).write.format("noop").mode("overwrite").save(),
        passes=2,
    )

    # IVF-PQ (round 11): the flagship serving composite at the derived
    # geometry, built with the default production quantizers (Lloyd
    # coarse + residual codebooks) -- the build line is the REAL
    # amortized cost: train + assign + residual-encode.
    ivfpq_root = scratch_dir("bench_index", "ivfpq")
    ivfpq_geo = SIM.ivfpq_geometry(emb.count(), scan_fraction=0.25)
    timed(
        "ivfpq_build",
        lambda: ANN.build_ivfpq_index(
            emb, ivfpq_root, n_cells=ivfpq_geo["n_cells"], m=8, n_codes=64,
            n_assign=ivfpq_geo["n_assign"],
        ),
    )
    timed(
        "ivfpq_probe",
        lambda: ANN.query_ivfpq_index(
            spark, ivfpq_root, queries, k=10,
            n_probe=ivfpq_geo["n_probe"], rerank=ivfpq_geo["rerank"],
        ).write.format("noop").mode("overwrite").save(),
        passes=2,
    )
    timed_batch50(
        "ivfpq_probe_batch50",
        lambda: ANN.query_ivfpq_index(
            spark, ivfpq_root, queries50, k=10,
            n_probe=ivfpq_geo["n_probe"], rerank=ivfpq_geo["rerank"],
        ).write.format("noop").mode("overwrite").save(),
        n_q50,
    )

    # Batched RAG read path (round 14): the top of the batched-serving
    # stack priced end-to-end -- 50 questions through ONE
    # hybrid-retrieve (batched BM25 off text_root + batched dense off a
    # persisted SRP-LSH index over the documents' hash embeddings) ->
    # per-query RRF -> multi-query MMR plan.  The single-call
    # comparator is the text_rag_context_persisted headline line; this
    # is the amortized per-question cost when the request stream
    # batches.  Question terms reuse the cycled text-batch
    # construction, so the sparse probe sees the same 50 queries as
    # text_probe_batch50.
    dlsh_root = scratch_dir("bench_index", "doc_lsh")
    demb = TX.hash_embedding(docs, dim=64)
    timed(
        "doc_lsh_build",
        lambda: ANN.build_lsh_index(
            demb, dlsh_root, id_col="doc_id", bands=16, rows_per_band=4,
            planes=SIM.hash_hyperplanes(64, dim=64),
        ),
    )
    if n_qtext:
        stored = ANN.read_index_vectors(spark, dlsh_root, "doc_id", "embedding")
        qtexts50 = spark.createDataFrame(
            [
                (
                    -(q + 1),
                    " ".join(vocab[(q + off) % nv] for off in (0, 7, 13)),
                )
                for q in range(50)
            ],
            "doc_id long, text string",
        )
        qemb50 = TX.hash_embedding(qtexts50, dim=64)
        qvecs50 = qemb50.select(
            (-F.col("doc_id") - 1).alias("doc_id"), "embedding"
        )

        def rag_batch() -> None:
            sparse = TI.query_text_index_batch(
                spark, text_root, qbatch, k=15, k1=_BM25_K1, b=_BM25_B
            ).select("query_id", "doc_id", "rank")
            dense = ANN.query_lsh_index(
                spark, dlsh_root, qemb50, k=15, id_col="doc_id"
            ).select(
                (-F.col("query_id") - 1).alias("query_id"),
                F.col("neighbor_id").alias("doc_id"),
                "rank",
            )
            fused = TX.rrf_fuse_batch([sparse, dense], k=10)
            SIM.mmr_rerank(
                stored, qvecs50, k=3, pool=10, lam=0.75,
                id_col="doc_id", vec_col="embedding",
                candidates=fused.select(
                    "query_id", F.col("doc_id").alias("neighbor_id")
                ),
            ).write.format("noop").mode("overwrite").save()

        timed_batch50("rag_batch50", rag_batch, n_qtext)
    return out


def streaming_throughput(spark, n_rows: int = 200_000, passes: int = 2) -> float:
    """Rows/sec through the watermarked streaming hourly rollup
    (AvailableNow trigger over a parquet directory, noop sink) -- the
    streaming twin of the headline A20 aggregate, measured so streaming
    regressions are visible round-over-round, not just batch ones.
    Best-of-``passes`` with a fresh checkpoint each pass (the same
    min-of-passes protocol as the headline queries -- the round-6
    single-pass number moved with ambient machine load, not code)."""
    import shutil
    import tempfile

    from iot_sensor_log_data_pipeline_spark.sources.sensor import sensor_batch
    from iot_sensor_log_data_pipeline_spark.streaming.pipeline import hourly_rollup

    tmp = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        src = os.path.join(tmp, "src")
        batch = sensor_batch(spark, n_rows)
        batch.write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(batch.schema).parquet(src)
        best = 0.0
        for i in range(passes):
            ckpt = os.path.join(tmp, f"ckpt{i}")
            t0 = time.perf_counter()
            q = (
                hourly_rollup(stream)
                .writeStream.format("noop")
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            best = max(best, n_rows / (time.perf_counter() - t0))
        return round(best, 1)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    # Artifact hygiene (round-11): the driver parses stdout for the
    # summary JSON, but the JVM writes banners/log lines straight to
    # fd 1 before the session quiets down, so the JSON used to arrive
    # after noise ("parsed": null in BENCH_r10).  Route EVERYTHING
    # aimed at fd 1 (including the JVM, which inherits the fd table at
    # launch) to stderr for the whole run, and write the summary as
    # the first -- and only -- real-stdout line at the end.
    real_stdout = os.dup(1)
    os.dup2(2, 1)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = default_parallelism()
    # Load gate BEFORE the session spins up (round 10): wait out
    # ambient load, and record the gate verdict in the artifact.
    load_gate = wait_for_quiet_machine()
    spark = get_spark(
        app_name="engine-bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    entries = catalog.all_entries()
    names = [n for n in HEADLINE if n in entries]
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    # Canary references are absolute quiet-host seconds pinned at ONE
    # sf; at any other scale factor normalization would conflate corpus
    # size with host drift, so it is skipped (factor None).
    canaries = CANARIES_BY_SF.get(sf)

    # JVM/codegen warmup on the smallest corpus so per-query numbers
    # measure the plan, not first-run JIT.
    warm = entries[names[0]].fn(spark, "/root/testdata/sf0.001")
    warm.write.format("noop").mode("overwrite").save()

    # Streaming throughput is measured FIRST (round-10 protocol): it
    # historically ran last, after the index builds, on a hot machine
    # -- the metric's round-over-round drift tracked end-of-run load,
    # not code (64k-115k band across identical code).
    #
    # Round-13 (r12 postmortem: the start-of-run gate passed at 2.91
    # but load ended at 8.01 and streaming collapsed 74k->20k rows/s on
    # bit-unchanged code): the streaming measurement now (a) re-checks
    # the load gate immediately before it runs, (b) retries once if the
    # 1-minute load rose past the gate while it ran, and (c) is
    # normalized by its own ADJACENT canary pass (min-of-2
    # q1_pricing_summary at sf_dir against the pinned quiet-host ref)
    # -- the same host-drift correction the headline queries get.
    stream_gate = wait_for_quiet_machine(timeout_s=120)
    stream_rps = streaming_throughput(spark)
    stream_retried = False
    if os.getloadavg()[0] > stream_gate["threshold"]:
        # The host got busy DURING the measurement; best-of the retry
        # after re-gating, so one noisy window can't sink the metric.
        stream_retried = True
        stream_gate = wait_for_quiet_machine(timeout_s=120)
        stream_rps = max(stream_rps, streaming_throughput(spark))
    stream_canary_name = "q1_pricing_summary"
    if canaries and stream_canary_name in canaries:
        # warm_canary_ratio runs one untimed pass first (round-13
        # advice: this adjacent probe used to be the session's FIRST
        # execution of the q1 plan, inflating the ratio ~16% with JIT
        # warmup the pinned fully-warm ref never carries).
        stream_canary_ratio = warm_canary_ratio(
            lambda: entries[stream_canary_name]
            .fn(spark, sf_dir)
            .write.format("noop")
            .mode("overwrite")
            .save(),
            canaries[stream_canary_name],
        )
        # Throughput scales INVERSELY with host slowdown: multiply.
        stream_rps_normalized = round(stream_rps * stream_canary_ratio, 1)
    else:
        stream_canary_ratio = None
        stream_rps_normalized = None

    # Two full passes in fixed order, min-of-2 per query: the second
    # pass reuses JIT-compiled codegen and OS page cache, so the min is
    # the stable plan cost and round-over-round deltas aren't JIT/IO
    # noise.  Round-2 postmortem: recorded numbers were taken under
    # external sandbox load and read as a phantom +43% regression, so
    # the 1-minute load average is now recorded with the result and a
    # third pass runs whenever the machine was busy at start -- min-of-3
    # under contention is a closer estimate of the uncontended cost.
    load_start = os.getloadavg()[0]
    n_passes = 3 if load_start > 0.5 * cpus else 2
    timings: dict[str, float] = {}
    for _pass in range(n_passes):
        for name in names:
            t0 = time.perf_counter()
            df = entries[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            elapsed = round(time.perf_counter() - t0, 3)
            if name not in timings or elapsed < timings[name]:
                timings[name] = elapsed

    recall = ann_recall(spark, sf_dir)
    index_breakdown = persisted_index_breakdown(spark, sf_dir)
    # Persisted-index headline lines measure the PROBE path only (the
    # serving cost a regression must never hide behind build noise --
    # round-5 verdict item #6); build cost lives in persisted_index_sec.
    # The keys carry a _probe suffix because the <= r5 lines under the
    # plain names timed build+probe: a silent rename would read as a
    # phantom 3x speedup.
    timings["similarity_persisted_lsh_ann_probe"] = index_breakdown["lsh_probe"]
    timings["text_bm25_persisted_index_probe"] = index_breakdown["text_probe"]
    total = round(sum(timings.values()), 3)

    # Host-drift canary (round 12): geometric mean of the canary
    # queries' ratios to their pinned quiet-host references.  A factor
    # far from 1.0 with unchanged plans = ambient shift; divide raw
    # timings by it to compare code across artifacts.
    ratios = [
        timings[name] / ref
        for name, ref in (canaries or {}).items()
        if name in timings and timings[name] > 0
    ]
    canary_factor = (
        round(math.exp(sum(math.log(r) for r in ratios) / len(ratios)), 4)
        if ratios
        else None
    )
    detail = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_canary_normalized": (
            {k: round(v / canary_factor, 3) for k, v in timings.items()}
            if canary_factor
            else None
        ),
        "sf": sf_val,
        "cpus": cpus,
        "ann_recall_at_10": recall,
        "persisted_index_sec": index_breakdown,
        "streaming_rows_per_sec": stream_rps,
        "streaming_rows_per_sec_normalized": stream_rps_normalized,
        "streaming_canary_ratio": stream_canary_ratio,
        "streaming_load_gate": stream_gate,
        "streaming_retried": stream_retried,
        "load_avg_1m": {
            "start": round(load_start, 2),
            "end": round(os.getloadavg()[0], 2),
        },
        "load_gate": load_gate,
        "timing_passes": n_passes,
        "canary_refs": canaries,
        "canary_factor": canary_factor,
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1)

    # The driver captures only the TAIL of stdout (observed: 2000
    # chars), so the full per-query dict -- 95+ keys -- overflowed it
    # and every round's artifact read "parsed": null.  The single
    # stdout line is therefore COMPACT: totals, recalls, canary
    # factor, the canary + 5 slowest query timings (contract shape
    # preserved), with the complete breakdown in BENCH_DETAIL.json.
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:5])
    compact_queries = {
        **{k: timings[k] for k in (canaries or {}) if k in timings},
        **slowest,
    }
    payload = json.dumps(
        {
            "metric": "headline_queries_total_sec",
            "value": total,
            "unit": "sec",
            "queries": compact_queries,
            "n_queries": len(timings),
            "sf": sf_val,
            "cpus": cpus,
            "ann_recall_at_10": recall,
            "streaming_rows_per_sec": stream_rps,
            "streaming_rows_per_sec_normalized": stream_rps_normalized,
            "canary_factor": canary_factor,
            "load_gate_passed": load_gate["gate_passed"],
            "timing_passes": n_passes,
            "detail_file": "BENCH_DETAIL.json",
        }
    )
    os.write(real_stdout, (payload + "\n").encode())
    spark.stop()


if __name__ == "__main__":
    main()
