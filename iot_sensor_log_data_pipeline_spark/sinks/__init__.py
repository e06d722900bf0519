"""Sink-side connectors: table formats (Delta/Iceberg, availability-
gated) complementing the file sinks in ``streaming.pipeline`` and the
parquet maintenance job in ``operators.compaction``."""
