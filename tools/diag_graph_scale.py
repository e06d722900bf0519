"""Diagnose the graph-ANN recall collapse at 200k vectors (round 14).

``tools/measure_graph_vec200k.py`` found probe recall@10 = 0.064 at
200k vectors (vs 0.998 at the 6k bench corpus) at the family's
default build/probe geometry.  Two distinct failure modes could
produce that number, and they have different fixes:

- BUILD quality: one NN-descent round from LSH ring seeds may not
  converge at 200k (seeds are 0.13% of the corpus there vs 4% at 6k).
  Measured directly as EDGE recall: fraction of the true 10-NN edges
  present in the stored adjacency for a node sample.
- PROBE reachability: a pure k-NN graph has only short-range edges --
  greedy beam search from a fixed entry set may simply never reach
  the query's neighborhood at 200k however good the edges are (the
  navigability problem HNSW's layers / NSW's long links exist for).
  Measured as probe recall at the default geometry vs a boosted
  budget (wider beam, more hops, more entries).

Prints one JSON object per corpus size with build_sec, edge_recall,
and probe recall under several (n_entry, beam, hops) budgets.
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
    cpus = B.default_parallelism()
    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    spark = get_spark(
        app_name="r14-graph-diag", master=f"local[{cpus}]",
        shuffle_partitions=4 * cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    def log(msg: str) -> None:
        os.write(2, f"[graph-diag] {msg}\n".encode())

    full = load(spark, v200_dir, "embeddings")
    sizes = [int(s) for s in (sys.argv[1:] or ["50000", "200000"])]
    out = {}
    for n_target in sizes:
        emb = (
            full.where(F.col("vec_id") < n_target)
            .repartition(cpus)
            .cache()
        )
        n = emb.count()
        log(f"corpus {n}")
        root = tempfile.mkdtemp(prefix=f"graphdiag_{n}_")
        try:
            t0 = time.perf_counter()
            GA.build_graph_index(emb, root)
            build_sec = round(time.perf_counter() - t0, 1)
            log(f"build {build_sec} s")

            # Edge recall over a 100-node sample away from the query ids.
            sample = emb.where(
                (F.col("vec_id") >= 1000) & (F.col("vec_id") < 1100)
            )
            true_edges = {
                (r["query_id"], r["neighbor_id"])
                for r in SIM.brute_force_topk(emb, sample, k=10).collect()
            }
            stored = {
                (r["src"], r["dst"])
                for r in spark.read.parquet(os.path.join(root, "graph"))
                .where((F.col("src") >= 1000) & (F.col("src") < 1100))
                .collect()
            }
            edge_rec = round(
                len(true_edges & stored) / max(len(true_edges), 1), 3
            )
            log(f"edge recall {edge_rec}")

            queries = emb.where(F.col("vec_id") < 50)
            exact = {
                (r["query_id"], r["neighbor_id"])
                for r in SIM.brute_force_topk(emb, queries, k=10).collect()
            }
            probes = {}
            for beam, hops in ((32, 5), (64, 10), (128, 15)):
                got = {
                    (r["query_id"], r["neighbor_id"])
                    for r in GA.query_graph_index(
                        spark, root, queries, k=10, beam=beam, hops=hops
                    ).collect()
                }
                rec = round(len(got & exact) / max(len(exact), 1), 3)
                probes[f"beam{beam}_hops{hops}"] = rec
                log(f"probe beam={beam} hops={hops}: {rec}")
            out[str(n)] = {
                "build_sec": build_sec,
                "edge_recall": edge_rec,
                "probe_recall": probes,
            }
        finally:
            shutil.rmtree(root, ignore_errors=True)
        emb.unpersist()
    os.write(real_stdout, (json.dumps(out) + "\n").encode())
    spark.stop()


if __name__ == "__main__":
    main()
