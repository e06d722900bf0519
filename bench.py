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
    "similarity_topk_cosine",
    "similarity_lsh_ann",
    "text_quality_score",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = default_parallelism()
    spark = get_spark(
        app_name="engine-bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    entries = catalog.all_entries()
    names = [n for n in HEADLINE if n in entries]

    # JVM/codegen warmup on the smallest corpus so per-query numbers
    # measure the plan, not first-run JIT.
    warm = entries[names[0]].fn(spark, "/root/testdata/sf0.001")
    warm.write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = entries[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
