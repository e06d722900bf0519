"""Round-14 optimization profiler: per-query Spark-job breakdown.

For each selected headline query, runs one warm pass then one timed
pass labeled via ``setJobDescription`` with the Spark event log on,
then parses the event log into per-query job counts and durations.
The split answers the first optimization question (guide §1): is a
slow query many small sequential jobs (driver/job-launch bound), a
planning gap (driver-side work between jobs), or one fat stage
(genuine compute)?

Usage: python tools/profile_r14.py [query ...]   (default: top set)
Output: JSON lines to stdout, one per query:
  {"name":..., "wall_s":..., "n_jobs":..., "jobs_sum_s":...,
   "gap_s":..., "top_jobs":[[desc_or_id, sec], ...]}
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iot_sensor_log_data_pipeline_spark.plans import catalog  # noqa: E402
from iot_sensor_log_data_pipeline_spark.session import (  # noqa: E402
    default_parallelism,
    get_spark,
)

DEFAULT_TARGETS = [
    "text_rag_context_persisted",
    "text_bm25_prf_persisted",
    "similarity_mmr_persisted",
    "dedup_semantic_text_survivors",
    "similarity_graph_seed_ann",
    "events_session_overlap",
    "similarity_opq_adc_ann",
    "similarity_hard_negatives_persisted",
    "dedup_verbatim_clean",
    "incremental_join_cdc_refresh",
    "dedup_minhash_lsh",
    "dedup_verbatim_runs",
    "similarity_persisted_pq_ann",
    "similarity_ivfpq_ann",
    "text_bm25_prf_search",
    "dedup_winnowing_pairs",
    "corpus_decontaminate_spans",
    "corpus_dsir_resample",
    "anomaly_cusum_shifts",
    "text_chunk_retrieval",
]


def main() -> None:
    targets = sys.argv[1:] or DEFAULT_TARGETS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    evdir = "/tmp/evprof_r14"
    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir, exist_ok=True)

    cpus = default_parallelism()
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("profile-r14")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", evdir)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .getOrCreate()
    )
    from iot_sensor_log_data_pipeline_spark.session import apply_runtime_confs

    apply_runtime_confs(spark)
    spark.sparkContext.setLogLevel("ERROR")

    entries = catalog.all_entries()
    # JVM warmup
    w = entries[targets[0]].fn(spark, "/root/testdata/sf0.001")
    w.write.format("noop").mode("overwrite").save()

    # PROFILE_PASSES=1 skips the warm pass: cold-ish walls are fine for
    # RANKING at sf1 where some families run minutes (round 15).
    warm = os.environ.get("PROFILE_PASSES", "2") != "1"
    walls: dict[str, float] = {}
    for name in targets:
        fn = entries[name].fn
        if warm:
            spark.sparkContext.setJobDescription(f"warm:{name}")
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        # timed pass
        spark.sparkContext.setJobDescription(f"timed:{name}")
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls[name] = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
    spark.stop()

    # Parse event log
    jobs: dict[str, list[tuple[int, float]]] = {}
    starts: dict[int, tuple[str, float]] = {}
    ev_files = []
    for path in glob.glob(os.path.join(evdir, "*")):
        if os.path.isdir(path):  # Spark 4 rolling event-log dirs
            ev_files.extend(
                p
                for p in glob.glob(os.path.join(path, "*"))
                if os.path.isfile(p) and "appstatus" not in os.path.basename(p)
            )
        else:
            ev_files.append(path)
    for path in ev_files:
        with open(path) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") == "SparkListenerJobStart":
                    desc = (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    )
                    starts[ev["Job ID"]] = (desc, ev["Submission Time"])
                elif ev.get("Event") == "SparkListenerJobEnd":
                    jid = ev["Job ID"]
                    if jid in starts:
                        desc, t0 = starts[jid]
                        dur = (ev["Completion Time"] - t0) / 1000.0
                        jobs.setdefault(desc, []).append((jid, dur))

    for name in targets:
        per = jobs.get(f"timed:{name}", [])
        total = sum(d for _, d in per)
        top = sorted(per, key=lambda x: -x[1])[:5]
        print(
            json.dumps(
                {
                    "name": name,
                    "wall_s": round(walls.get(name, -1), 3),
                    "n_jobs": len(per),
                    "jobs_sum_s": round(total, 3),
                    "gap_s": round(walls.get(name, 0) - total, 3),
                    "top_jobs": [[jid, round(d, 3)] for jid, d in top],
                }
            )
        )


if __name__ == "__main__":
    main()
