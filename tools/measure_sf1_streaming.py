"""Round-15 sf1 streaming-ingest measurement (round-14 verdict item 8,
carried from round 13): the ingest sinks were never measured above
sf0.1.  Drives the graph-index and text-index ingest sinks over
10x-scale corpora (``scaledata/sf1``: 20k embeddings, 50k documents)
in file-per-trigger micro-batches and reports rows/s per sink, plus
the same sinks at sf0.1 shape for the ratio.

Run AFTER ``tools/make_scaledata.py``.  Outputs ONE JSON object.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(REPO, "scaledata", "sf1")


def main() -> None:
    real_stdout = os.dup(1)
    os.dup2(2, 1)

    from pyspark.sql import functions as F

    from iot_sensor_log_data_pipeline_spark.session import (
        default_parallelism,
        get_spark,
    )
    from iot_sensor_log_data_pipeline_spark.streaming import pipeline as P
    from iot_sensor_log_data_pipeline_spark.operators import graph_ann as GA
    from iot_sensor_log_data_pipeline_spark.operators import text_index as TI

    cpus = default_parallelism()
    spark = get_spark(
        app_name="sf1-streaming", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"cpus": cpus, "load_avg_1m": os.getloadavg()[0]}

    def run_ingest(kind: str, seed_df, stream_df, n_stream_rows: int,
                   n_batches: int, start_sink) -> dict:
        tmp = tempfile.mkdtemp(prefix=f"sf1_stream_{kind}_")
        try:
            root = os.path.join(tmp, "idx")
            src = os.path.join(tmp, "src")
            # one parquet file per micro-batch
            stream_df.withColumn(
                "__b", F.pmod(F.xxhash64(stream_df.columns[0]), F.lit(n_batches))
            ).repartition(n_batches, "__b").write.partitionBy("__b").mode(
                "overwrite"
            ).parquet(src)
            t0 = time.perf_counter()
            build_sec = None
            if kind.startswith("graph"):
                GA.build_graph_index(seed_df, root)
            else:
                TI.build_text_index(seed_df, root)
            build_sec = time.perf_counter() - t0
            stream = (
                spark.readStream.schema(
                    spark.read.option("basePath", src).parquet(src).schema
                )
                .option("maxFilesPerTrigger", 1)
                .option("basePath", src)
                .parquet(src)
                .drop("__b")
            )
            t0 = time.perf_counter()
            q = start_sink(stream, root, os.path.join(tmp, "ckpt"))
            q.processAllAvailable()
            q.stop()
            q.awaitTermination()
            ingest_sec = time.perf_counter() - t0
            return {
                "build_sec": round(build_sec, 2),
                "ingest_rows": n_stream_rows,
                "n_batches": n_batches,
                "ingest_sec": round(ingest_sec, 2),
                "rows_per_sec": round(n_stream_rows / ingest_sec, 1),
            }
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    emb = spark.read.parquet(os.path.join(SF1, "embeddings.parquet"))
    docs = spark.read.parquet(os.path.join(SF1, "documents.parquet"))
    emb01 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    docs01 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    # sf0.1-shape reference: seed = first half, stream = second half
    n01 = emb01.count()
    out["graph_ingest_sf0.1"] = run_ingest(
        "graph01",
        emb01.where(F.col("vec_id") < n01 // 2),
        emb01.where(F.col("vec_id") >= n01 // 2),
        n01 - n01 // 2,
        10,
        lambda s, r, c: P.start_graph_ingest_sink(s, r, c),
    )
    n1 = emb.count()
    out["graph_ingest_sf1"] = run_ingest(
        "graph1",
        emb.where(F.col("vec_id") < n1 // 2),
        emb.where(F.col("vec_id") >= n1 // 2),
        n1 - n1 // 2,
        10,
        lambda s, r, c: P.start_graph_ingest_sink(s, r, c),
    )
    d01 = docs01.count()
    out["text_ingest_sf0.1"] = run_ingest(
        "text01",
        docs01.where(F.col("doc_id") < d01 // 2),
        docs01.where(F.col("doc_id") >= d01 // 2),
        d01 - d01 // 2,
        10,
        lambda s, r, c: P.start_text_index_ingest_sink(s, r, c),
    )
    d1 = docs.count()
    out["text_ingest_sf1"] = run_ingest(
        "text1",
        docs.where(F.col("doc_id") < d1 // 2),
        docs.where(F.col("doc_id") >= d1 // 2),
        d1 - d1 // 2,
        10,
        lambda s, r, c: P.start_text_index_ingest_sink(s, r, c),
    )

    spark.stop()
    os.write(real_stdout, (json.dumps(out, indent=1) + "\n").encode())


if __name__ == "__main__":
    main()
