"""The sf1 measurement pass (round-13 verdict item 4): price the five
most expensive bench families at 10x the bench corpus, and the derived
ANN geometry at 100x vectors -- measured, not extrapolated.

Outputs ONE JSON object (stdout) consumed into SCALE.md:

- ``families``: min-of-2 wall seconds for the five most expensive
  round-12 bench entries at sf0.1 (the bench corpus) and at
  ``scaledata/sf1`` (10x documents/embeddings), plus the ratio.  A
  family whose plan is row-linear should ratio ~10x or less (fixed
  overheads amortize); a super-linear ratio flags a pair/shuffle stage
  that outgrew its budget.
- ``vec200k``: the ``ivf_geometry``-derived plan at 200k vectors --
  across a power-of-two cell boundary (2048 cells vs sf0.1's 256):
  Lloyd training cost, probe cost for 50 queries, and recall@10
  against brute force on the same split.

Run AFTER ``tools/make_scaledata.py``.  Uses the engine session
(local[32]); takes ~5-10 min.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAMILIES = (
    "text_rag_context_persisted",
    "text_bm25_prf_persisted",
    "similarity_mmr_persisted",
    "dedup_semantic_text_survivors",
    "text_bm25_prf_search",
)


def main() -> None:
    real_stdout = os.dup(1)
    os.dup2(2, 1)

    from pyspark.sql import functions as F

    from iot_sensor_log_data_pipeline_spark.io_utils import load
    from iot_sensor_log_data_pipeline_spark.operators import similarity as SIM
    from iot_sensor_log_data_pipeline_spark.plans import catalog
    from iot_sensor_log_data_pipeline_spark.session import (
        default_parallelism,
        get_spark,
    )

    cpus = default_parallelism()
    spark = get_spark(
        app_name="sf1-measure", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    entries = catalog.all_entries()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf1_dir = os.path.join(repo, "scaledata", "sf1")

    def timed(fn, passes: int = 2) -> float:
        best = None
        for _ in range(passes):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        return round(best, 3)

    # warmup
    entries[FAMILIES[-1]].fn(spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()

    families = {}
    for name in FAMILIES:
        print(f"[sf1-measure] {name}", file=sys.stderr, flush=True)
        t01 = timed(
            lambda: entries[name].fn(spark, "/root/testdata/sf0.1")
            .write.format("noop").mode("overwrite").save()
        )
        t1 = timed(
            lambda: entries[name].fn(spark, sf1_dir)
            .write.format("noop").mode("overwrite").save()
        )
        families[name] = {
            "sf0.1_sec": t01,
            "sf1_sec": t1,
            "ratio": round(t1 / t01, 2),
        }

    print("[sf1-measure] families done:", json.dumps(families),
          file=sys.stderr, flush=True)

    # --- derived IVF geometry at 200k vectors -------------------------
    emb = load(spark, os.path.join(repo, "scaledata", "vec200k"), "embeddings")
    emb = emb.repartition(cpus).cache()
    n = emb.count()
    geo = SIM.ivf_geometry(n)
    queries = emb.where(F.col("vec_id") < 50)
    t_train0 = time.perf_counter()
    cents = SIM.kmeans_centroids(
        emb, geo["n_cells"], sample_size=geo["sample_size"]
    )
    t_train = round(time.perf_counter() - t_train0, 3)
    t_probe = timed(
        lambda: SIM.ivf_topk(
            emb, queries, k=10, n_cells=geo["n_cells"], n_probe=geo["n_probe"],
            n_assign=geo["n_assign"], centroids=cents,
        ).write.format("noop").mode("overwrite").save()
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.brute_force_topk(emb, queries, k=10).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.ivf_topk(
            emb, queries, k=10, n_cells=geo["n_cells"], n_probe=geo["n_probe"],
            n_assign=geo["n_assign"], centroids=cents,
        ).collect()
    }
    result = {
        "families": families,
        "vec200k": {
            "n_vectors": n,
            "geometry": geo,
            "kmeans_train_sec": t_train,
            "probe50_sec": t_probe,
            "recall_at_10": round(len(exact & approx) / len(exact), 4),
        },
        "cpus": cpus,
        "load_avg_1m": round(os.getloadavg()[0], 2),
    }
    os.write(real_stdout, (json.dumps(result) + "\n").encode())
    spark.stop()


if __name__ == "__main__":
    main()
