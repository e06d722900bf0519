"""PySpark-native analytics engine with the query and data-processing
capabilities of ``LeeHyungi0622/iot-sensor-log-data-pipeline``.

The reference (surveyed in ``SURVEY.md``) is an AWS-managed IoT sensor
pipeline: SenseHAT producer -> MQTT -> Kinesis -> {S3+Athena compaction,
OpenSearch hourly indices + Kibana aggregates}.  This package re-expresses
that entire surface -- plus the relational/LLM-data extension surface --
as an idiomatic Spark engine:

- ``session``      : tuned SparkSession factory (AQE, UTC, Arrow).
- ``schemas``      : explicit StructTypes for every table (no inference).
- ``io_utils``     : parquet/json/csv readers over the test corpus.
- ``sources``      : streaming sensor simulator (reference producer analogue).
- ``functions``    : scalar helpers (time bucketing, histogram buckets, json).
- ``operators``    : relational + LLM-data operators (dedup, similarity,
                     text analysis, as-of join, compaction, multimodal).
- ``streaming``    : structured-streaming pipeline assembly + count trigger.
- ``plans``        : the query catalog registered with the driver contract
                     (``__spark_entry__.py``), each query paired with ANSI
                     oracle SQL for the DuckDB correctness gate.
"""

__version__ = "0.1.0"
