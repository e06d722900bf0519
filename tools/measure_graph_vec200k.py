"""Round-14 follow-on measurement: the GRAPH ANN family at 200k vectors.

The graph index is the highest-recall family on the bench corpus
(recall@10 ~1.0 at sf0.1 / 6k vectors) but had no above-sf0.1 point:
NN-descent's cost model (~N * 16k^2 cosines, bounded by the LSH seed
cap and the working-width degree caps -- never N^2) and the beam
search's hop-bounded join chain both claim linear-ish scaling, and
this pass checks the claim where it matters:

- build the persisted k-NN-graph index ONCE over scaledata/vec200k
  (200k isotropic 64-dim vectors, 100x the bench corpus);
- recall@10 of the batched beam probe over 50 queries vs brute-force
  cosine truth (the bench's ``ann_recall`` protocol);
- the amortized 50-query batched probe vs a 5-query call (the
  ``batch_at_scale`` protocol of ``tools/measure_r14.py``).

Outputs ONE JSON object (stdout) merged into SF1_MEASURE.json under
``graph_vec200k``.  Run on a quiet machine AFTER
``tools/make_scaledata.py``; the build is the expensive step
(~N*16k^2 = ~10^8-10^9 cosine folds on local[32]).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    real_stdout = os.dup(1)
    os.dup2(2, 1)

    from pyspark.sql import functions as F

    import bench as B
    from iot_sensor_log_data_pipeline_spark.io_utils import load
    from iot_sensor_log_data_pipeline_spark.operators import graph_ann as GA
    from iot_sensor_log_data_pipeline_spark.operators import similarity as SIM
    from iot_sensor_log_data_pipeline_spark.session import get_spark

    v200_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scaledata", "vec200k",
    )
    if not os.path.isdir(v200_dir):
        raise SystemExit("run tools/make_scaledata.py first (no vec200k)")

    cpus = B.default_parallelism()
    gate = B.wait_for_quiet_machine()
    # The NN-descent candidate-scoring shuffle carries two 64-dim
    # vectors per pair (~N * (2k)^2 rows at 200k nodes); at the bench
    # default (8g heap shared by 32 local executor threads, cpus
    # shuffle partitions) a single partition exceeds task memory.  On
    # a cluster this is executor sizing; locally, give the one JVM a
    # scale-appropriate heap and 4x the shuffle partitions so each
    # scoring partition stays task-sized.
    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    spark = get_spark(
        app_name="r14-graph-200k", master=f"local[{cpus}]",
        shuffle_partitions=4 * cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    def log(msg: str) -> None:
        os.write(2, f"[graph-200k] {msg}\n".encode())

    emb = load(spark, v200_dir, "embeddings").repartition(cpus).cache()
    n = emb.count()
    log(f"{n} vectors")
    root = tempfile.mkdtemp(prefix="r14_graph200k_")
    try:
        t0 = time.perf_counter()
        GA.build_graph_index(emb, root)
        build_sec = round(time.perf_counter() - t0, 1)
        log(f"build {build_sec} s")

        queries = emb.where(F.col("vec_id") < 50)
        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in SIM.brute_force_topk(emb, queries, k=10).collect()
        }
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in GA.query_graph_index(
                spark, root, queries, k=10
            ).collect()
        }
        rec = round(len(got & exact) / max(len(exact), 1), 3)
        log(f"recall@10 {rec} over 50 queries")

        n_q50 = queries.select("vec_id").distinct().count()
        batch_perq = round(
            B.timed_over_batch(
                lambda: GA.query_graph_index(spark, root, queries, k=10)
                .write.format("noop").mode("overwrite").save(),
                n_q50,
            ),
            4,
        )
        q5 = emb.where(F.col("vec_id") < 5)
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            GA.query_graph_index(spark, root, q5, k=10).write.format(
                "noop"
            ).mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        single5 = round(best, 3)
        log(f"batched {batch_perq} s/query; 5-query call {single5} s")

        result = {
            "graph_vec200k": {
                "n_vectors": n,
                "build_sec": build_sec,
                "recall_at_10": rec,
                "n_queries": n_q50,
                "batch50_per_query_sec": batch_perq,
                "single_call_sec_5q": single5,
                "amortization_x": round(single5 / batch_perq, 1)
                if batch_perq
                else None,
                "load_gate": gate,
            },
            "load_avg_1m": round(os.getloadavg()[0], 2),
        }
        os.write(real_stdout, (json.dumps(result) + "\n").encode())
    finally:
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
