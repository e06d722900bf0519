"""Round-14 follow-on measurement: the BATCHED RAG read path at sf1.

``text_rag_context_batch_persisted`` closed the batched-serving family
at the top of the stack (batched hybrid retrieve -> per-query RRF ->
multi-query MMR); this pass gives that composition its above-sf0.1
number the way ``tools/measure_r14.py`` did for the raw probes:

- build the persisted text index + document SRP-LSH index ONCE over
  the 50k-doc scaledata/sf1 corpus;
- push 50 cycled 3-term questions through ONE retrieve->fuse->MMR
  plan (the bench ``rag_batch50`` construction) and record the
  amortized per-question seconds;
- run the same composition for a single question (the
  ``text_rag_context_persisted`` shape) as the per-call comparator.

Outputs ONE JSON object (stdout) merged into SF1_MEASURE.json under
``rag_batch_sf1``.  Run on a quiet machine AFTER
``tools/make_scaledata.py``; ~3-6 min on local[32].
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

    from pyspark.sql import functions as F

    import bench as B
    from iot_sensor_log_data_pipeline_spark.io_utils import load
    from iot_sensor_log_data_pipeline_spark.operators import ann_index as ANN
    from iot_sensor_log_data_pipeline_spark.operators import similarity as SIM
    from iot_sensor_log_data_pipeline_spark.operators import text as TX
    from iot_sensor_log_data_pipeline_spark.operators import text_index as TI
    from iot_sensor_log_data_pipeline_spark.plans.text_queries import (
        _BM25_B,
        _BM25_K1,
    )
    from iot_sensor_log_data_pipeline_spark.session import get_spark

    sf1_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scaledata", "sf1",
    )
    if not os.path.isdir(sf1_dir):
        raise SystemExit("run tools/make_scaledata.py first (no scaledata/sf1)")

    cpus = B.default_parallelism()
    gate = B.wait_for_quiet_machine()
    spark = get_spark(
        app_name="r14-rag-batch-sf1", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    def log(msg: str) -> None:
        os.write(2, f"[rag-batch-sf1] {msg}\n".encode())

    docs = load(spark, sf1_dir, "documents")
    troot = tempfile.mkdtemp(prefix="r14_rag_text_")
    lroot = tempfile.mkdtemp(prefix="r14_rag_lsh_")
    try:
        log("build text index")
        t_text = timed(lambda: TI.build_text_index(docs, troot), passes=1)
        log("build doc LSH index")
        demb = TX.hash_embedding(docs, dim=64)
        t_lsh = timed(
            lambda: ANN.build_lsh_index(
                demb, lroot, id_col="doc_id", bands=16, rows_per_band=4,
                planes=SIM.hash_hyperplanes(64, dim=64),
            ),
            passes=1,
        )
        stored = ANN.read_index_vectors(spark, lroot, "doc_id", "embedding")

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
            ],
            "query_id long, term string",
        )
        qtexts = spark.createDataFrame(
            [
                (
                    -(q + 1),
                    " ".join(vocab[(q + off) % nv] for off in (0, 7, 13)),
                )
                for q in range(50)
            ],
            "doc_id long, text string",
        )
        qemb = TX.hash_embedding(qtexts, dim=64)
        qvecs = qemb.select(
            (-F.col("doc_id") - 1).alias("doc_id"), "embedding"
        )

        def rag(qterms_df, qemb_df, qvec_df) -> None:
            sparse = TI.query_text_index_batch(
                spark, troot, qterms_df, k=15, k1=_BM25_K1, b=_BM25_B
            ).select("query_id", "doc_id", "rank")
            dense = ANN.query_lsh_index(
                spark, lroot, qemb_df, k=15, id_col="doc_id"
            ).select(
                (-F.col("query_id") - 1).alias("query_id"),
                F.col("neighbor_id").alias("doc_id"),
                "rank",
            )
            fused = TX.rrf_fuse_batch([sparse, dense], k=10)
            SIM.mmr_rerank(
                stored, qvec_df, k=3, pool=10, lam=0.75,
                id_col="doc_id", vec_col="embedding",
                candidates=fused.select(
                    "query_id", F.col("doc_id").alias("neighbor_id")
                ),
            ).write.format("noop").mode("overwrite").save()

        log("batched RAG: 50 questions, one plan")
        batch_perq = round(
            B.timed_over_batch(
                lambda: rag(qbatch, qemb, qvecs), 50
            ),
            4,
        )
        log(f"amortized {batch_perq} s/question")

        q1_terms = qbatch.where(F.col("query_id") == 0)
        q1_emb = qemb.where(F.col("doc_id") == -1)
        q1_vec = qvecs.where(F.col("doc_id") == 0)
        single = timed(lambda: rag(q1_terms, q1_emb, q1_vec))
        log(f"single call {single} s")

        result = {
            "rag_batch_sf1": {
                "n_docs": docs.count(),
                "text_build_sec": t_text,
                "doc_lsh_build_sec": t_lsh,
                "batch50_per_question_sec": batch_perq,
                "n_questions": 50,
                "single_call_sec": single,
                "amortization_x": round(single / batch_perq, 1)
                if batch_perq
                else None,
                "load_gate": gate,
            },
            "load_avg_1m": round(os.getloadavg()[0], 2),
        }
        os.write(real_stdout, (json.dumps(result) + "\n").encode())
    finally:
        shutil.rmtree(troot, ignore_errors=True)
        shutil.rmtree(lroot, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
