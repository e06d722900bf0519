"""The round-14 measurement pass (round-13 verdict items 1, 3, 4, 5):

- ``semdedup_repinned``: the re-pinned ``dedup_semantic_text_survivors``
  catalog row (oracle quantizer 16 -> 128 md5-seeded cells) at sf0.1
  and scaledata/sf1 -- the round-13 weak item's "Done" condition is an
  sf1 time well under the 16-cell pin's measured 296 s.
- ``vec200k_opq``: the OPQ-IVFADC composition's at-scale recall point.
  The bench corpus is isotropic BY CONSTRUCTION (any rotation of white
  noise is white noise -- round-13 watch item), so this runs
  ``ivfpq_opq_quantizers`` (Lloyd coarse + residual-PCA rotation +
  rotated codebooks) against plain ``ivfpq_trained_quantizers`` on
  ``scaledata/vec200k_aniso`` (200k correlated anisotropic vectors,
  100:1 spectrum under a seeded rotation) at the SHALLOW re-rank
  budget (rerank == k) where residual-coding quality decides.
- ``batch_at_scale``: the 50-query batched text + ivfpq probes at
  scaledata/sf1 / vec200k -- the round-13 25-50x amortization claim's
  first above-sf0.1 numbers (amortized per-query vs single-call).
- ``streaming_sf1``: ``streaming_rows_per_sec`` at 2M rows (10x the
  bench protocol) plus one index-ingest sink (ivfpq) at 20k streamed
  vectors (10x the sf0.1 embedding count), both under the bench's
  load-gate + warm-canary protocol.

Outputs ONE JSON object (stdout) consumed into SF1_MEASURE.json /
SCALE.md.  Run AFTER ``tools/make_scaledata.py``; uses the engine
session (local[32]); takes ~15-25 min.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, passes: int = 2) -> float:
    best = None
    for _ in range(passes):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    return round(best, 3)


def main() -> None:
    real_stdout = os.dup(1)
    os.dup2(2, 1)

    import numpy as np
    import pyarrow.parquet as pq_
    from pyspark.sql import functions as F

    import bench as B
    from iot_sensor_log_data_pipeline_spark.io_utils import load
    from iot_sensor_log_data_pipeline_spark.operators import ann_index as ANN
    from iot_sensor_log_data_pipeline_spark.operators import similarity as SIM
    from iot_sensor_log_data_pipeline_spark.operators import text_index as TI
    from iot_sensor_log_data_pipeline_spark.plans import catalog
    from iot_sensor_log_data_pipeline_spark.plans.text_queries import (
        _BM25_B,
        _BM25_K1,
    )
    from iot_sensor_log_data_pipeline_spark.session import (
        default_parallelism,
        get_spark,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf1_dir = os.path.join(repo, "scaledata", "sf1")
    aniso_dir = os.path.join(repo, "scaledata", "vec200k_aniso")
    v200_dir = os.path.join(repo, "scaledata", "vec200k")

    gate = B.wait_for_quiet_machine(timeout_s=180)
    cpus = default_parallelism()
    spark = get_spark(
        app_name="r14-measure", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    entries = catalog.all_entries()
    result: dict = {"load_gate": gate, "cpus": cpus}

    def log(msg: str) -> None:
        print(f"[r14-measure] {msg}", file=sys.stderr, flush=True)

    # warmup (smallest corpus)
    entries["dedup_semantic_text_survivors"].fn(
        spark, "/root/testdata/sf0.001"
    ).write.format("noop").mode("overwrite").save()

    # --- 1. re-pinned SemDeDup gate row at sf0.1 and sf1 --------------
    log("semdedup repinned")
    row = entries["dedup_semantic_text_survivors"].fn
    t01 = timed(lambda: row(spark, "/root/testdata/sf0.1")
                .write.format("noop").mode("overwrite").save())
    t1 = timed(lambda: row(spark, sf1_dir)
               .write.format("noop").mode("overwrite").save())
    result["semdedup_repinned"] = {
        "pinned_cells": 128,
        "sf0.1_sec": t01,
        "sf1_sec": t1,
        "ratio_at_10x_docs": round(t1 / t01, 2),
        "r13_16cell_sf1_sec": 296.0,
    }
    log(f"semdedup repinned: {result['semdedup_repinned']}")

    # --- 2. OPQ-IVFADC recall at 200k anisotropic vectors -------------
    log("vec200k_opq")
    tbl = pq_.read_table(os.path.join(aniso_dir, "embeddings.parquet"))
    M = np.stack(tbl["embedding"].to_numpy(zero_copy_only=False)).astype(
        "float32"
    )
    n = M.shape[0]
    nq = 50
    # L2 ground truth (the ivfpq_topk metric; the corpus is NOT
    # unit-normalized): ||x-q||^2 = ||x||^2 - 2 x.q + const per query.
    norms = (M * M).sum(axis=1)
    sims = M @ M[:nq].T
    truth = {}
    for q in range(nq):
        d = norms - 2.0 * sims[:, q]
        d[q] = np.inf  # self-match excluded, same as the operators
        truth[q] = {int(i) for i in np.argsort(d)[:10]}
    emb = load(spark, aniso_dir, "embeddings").repartition(cpus).cache()
    emb.count()
    queries = emb.where(F.col("vec_id") < nq)
    geo = SIM.ivfpq_geometry(n)

    def recall(df) -> float:
        hits = sum(
            1 for r in df.collect() if r["neighbor_id"] in truth[r["query_id"]]
        )
        return round(hits / (10 * nq), 4)

    t0 = time.perf_counter()
    cents_raw, cbs_raw = SIM.ivfpq_trained_quantizers(
        emb, n_cells=geo["n_cells"], m=8, n_codes=64
    )
    train_raw = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    cents_opq, R, cbs_opq = SIM.ivfpq_opq_quantizers(
        emb, n_cells=geo["n_cells"], m=8, n_codes=64
    )
    train_opq = round(time.perf_counter() - t0, 3)
    # "Shallow" must scale with the ADC candidate pool: the probed
    # cells hold ~scan_fraction * N ~ 50k candidates, so rerank == k
    # (the pytest's budget over a 1.5k-candidate pool) degenerates to
    # noise here -- recall 0.01 for raw AND rotated on the first
    # attempt.  The sweep below prices the budget axis instead:
    # rerank 50 (0.1% of the pool, ADC ordering decides) and the
    # derived production 200 (0.4%).
    by_rerank = {}
    for rr in (50, geo["rerank"]):
        budget = dict(
            k=10, n_cells=geo["n_cells"], n_probe=geo["n_probe"],
            n_assign=geo["n_assign"], rerank=rr,
        )
        raw_rec = recall(SIM.ivfpq_topk(
            emb, queries, centroids=cents_raw, codebooks=cbs_raw, **budget
        ))
        opq_rec = recall(SIM.ivfpq_topk(
            emb, queries, centroids=cents_opq, codebooks=cbs_opq,
            rotation=R, **budget,
        ))
        by_rerank[str(rr)] = {"raw": raw_rec, "opq": opq_rec}
        log(f"rerank={rr}: raw {raw_rec} opq {opq_rec}")
    result["vec200k_opq"] = {
        "corpus": "vec200k_aniso (100:1 spectrum, seeded rotation)",
        "n_vectors": n,
        "geometry": {**geo, "m": 8, "n_codes": 64},
        "train_raw_sec": train_raw,
        "train_opq_sec": train_opq,
        "recall_at_10_by_rerank": by_rerank,
    }

    # --- 3. batched probes at scale ------------------------------------
    log("batch_at_scale: text @ sf1")
    docs1 = load(spark, sf1_dir, "documents")
    troot = tempfile.mkdtemp(prefix="r14_text_idx_")
    ivroot = tempfile.mkdtemp(prefix="r14_ivfpq_idx_")
    try:
        t_build_text = timed(
            lambda: TI.build_text_index(docs1, troot), passes=1
        )
        from iot_sensor_log_data_pipeline_spark.operators import text as TX

        # Same 50-query cycling construction as bench.py round 14 (the
        # 31-term corpus vocabulary makes an i//3 grouping an 11-query
        # batch -- the r13-advice understatement).
        vocab = [
            r["term"]
            for r in docs1.select(
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
            ],
            "query_id long, term string",
        )
        n_qtext = 50
        text_batch_perq = round(
            B.timed_over_batch(
                lambda: TI.query_text_index_batch(
                    spark, troot, qbatch, k=10, k1=_BM25_K1, b=_BM25_B
                ).write.format("noop").mode("overwrite").save(),
                n_qtext,
            ),
            4,
        )
        one_terms = tuple(vocab[:3])
        text_single = timed(
            lambda: TI.query_text_index(
                spark, troot, one_terms, k=10, k1=_BM25_K1, b=_BM25_B
            ).write.format("noop").mode("overwrite").save()
        )

        log("batch_at_scale: ivfpq @ vec200k")
        emb200 = load(spark, v200_dir, "embeddings").repartition(cpus).cache()
        n200 = emb200.count()
        geo200 = SIM.ivfpq_geometry(n200, scan_fraction=0.25)
        t_build_ivfpq = timed(
            lambda: ANN.build_ivfpq_index(
                emb200, ivroot, n_cells=geo200["n_cells"], m=8, n_codes=64,
                n_assign=geo200["n_assign"],
            ),
            passes=1,
        )
        q50 = emb200.where(F.col("vec_id") < 50)
        n_q50 = q50.select("vec_id").distinct().count()
        ivfpq_batch_perq = round(
            B.timed_over_batch(
                lambda: ANN.query_ivfpq_index(
                    spark, ivroot, q50, k=10,
                    n_probe=geo200["n_probe"], rerank=geo200["rerank"],
                ).write.format("noop").mode("overwrite").save(),
                n_q50,
            ),
            4,
        )
        q5 = emb200.where(F.col("vec_id") < 5)
        ivfpq_single = timed(
            lambda: ANN.query_ivfpq_index(
                spark, ivroot, q5, k=10,
                n_probe=geo200["n_probe"], rerank=geo200["rerank"],
            ).write.format("noop").mode("overwrite").save()
        )
        result["batch_at_scale"] = {
            "text_sf1": {
                "n_docs": 50_000,
                "build_sec": t_build_text,
                "batch50_per_query_sec": text_batch_perq,
                "n_queries": n_qtext,
                "single_call_sec": text_single,
                "amortization_x": round(text_single / text_batch_perq, 1)
                if text_batch_perq
                else None,
            },
            "ivfpq_vec200k": {
                "n_vectors": n200,
                "geometry": geo200,
                "build_sec": t_build_ivfpq,
                "batch50_per_query_sec": ivfpq_batch_perq,
                "n_queries": n_q50,
                "single_call_sec_5q": ivfpq_single,
                "amortization_x": round(ivfpq_single / ivfpq_batch_perq, 1)
                if ivfpq_batch_perq
                else None,
            },
        }
        log(f"batch_at_scale: {result['batch_at_scale']}")

        # --- 4. streaming at sf1 ---------------------------------------
        log("streaming_sf1")
        sgate = B.wait_for_quiet_machine(timeout_s=120)
        rps = B.streaming_throughput(spark, n_rows=2_000_000)
        canaries = B.CANARIES_BY_SF["0.1"]
        ratio = B.warm_canary_ratio(
            lambda: entries["q1_pricing_summary"]
            .fn(spark, "/root/testdata/sf0.1")
            .write.format("noop").mode("overwrite").save(),
            canaries["q1_pricing_summary"],
        )
        # Ingest sink: 20k NEW vectors (disjoint ids) streamed into the
        # 200k persisted ivfpq index via one availableNow pass.
        ing_src = tempfile.mkdtemp(prefix="r14_ingest_")
        try:
            newv = (
                emb200.where(F.col("vec_id") < 20_000)
                .select(
                    (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
                )
            )
            src = os.path.join(ing_src, "src")
            newv.write.mode("overwrite").parquet(src)
            schema = spark.read.parquet(src).schema
            from iot_sensor_log_data_pipeline_spark.streaming.pipeline import (
                start_index_ingest_sink,
            )

            stream = spark.readStream.schema(schema).parquet(src)
            ckpt = os.path.join(ing_src, "ckpt")
            t0 = time.perf_counter()
            # The ingest sink runs on the default continuous trigger
            # (maintenance sinks never self-terminate) -- drain with
            # processAllAvailable + stop, the sink's own test protocol;
            # awaitTermination would block forever.
            q = start_index_ingest_sink(stream, ivroot, ckpt)
            q.processAllAvailable()
            ingest_sec = time.perf_counter() - t0
            q.stop()
            ingest_rps = round(20_000 / ingest_sec, 1)
            # probe-side sanity: an ingested vector is findable.  The
            # query keeps its ORIGINAL id (0): ingested id 1_000_000
            # duplicates vec 0's embedding, so it must surface at
            # distance ~0 -- querying under id 1_000_000 itself would
            # exclude the hit as a self-match (the first cut of this
            # check did exactly that and read a false negative).
            probe = ANN.query_ivfpq_index(
                spark, ivroot, emb200.where(F.col("vec_id") == 0),
                k=3, n_probe=geo200["n_probe"], rerank=geo200["rerank"],
            ).collect()
            found = 1_000_000 in {r["neighbor_id"] for r in probe}
        finally:
            shutil.rmtree(ing_src, ignore_errors=True)
        result["streaming_sf1"] = {
            "n_rows": 2_000_000,
            "rows_per_sec_raw": rps,
            "canary_ratio": ratio,
            "rows_per_sec_normalized": round(rps * ratio, 1),
            "load_gate": sgate,
            "ivfpq_ingest_rows": 20_000,
            "ivfpq_ingest_rows_per_sec": ingest_rps,
            "ingested_vector_findable": found,
        }
        log(f"streaming_sf1: {result['streaming_sf1']}")
    finally:
        shutil.rmtree(troot, ignore_errors=True)
        shutil.rmtree(ivroot, ignore_errors=True)

    result["load_avg_1m"] = round(os.getloadavg()[0], 2)
    os.write(real_stdout, (json.dumps(result) + "\n").encode())
    spark.stop()


if __name__ == "__main__":
    main()
