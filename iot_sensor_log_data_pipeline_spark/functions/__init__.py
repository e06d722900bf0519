"""Public scalar-function surface of the engine.

Curated re-exports plus the canonical time/histogram bucketing helpers
(the reference's two chart x-axes, Table A20-A23).  Specialized
function families live with their operators -- text metrics in
:mod:`..operators.text`, vector math in :mod:`..operators.similarity`,
hashing/shingling in :mod:`..operators.dedup`, engine-stable numeric
aggregates in :mod:`..plans._numeric` -- and the most broadly useful
ones are re-exported here as the engine's one-stop functions module.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..operators.dedup import simhash64, simhash_hamming, word_shingles
from ..operators.similarity import cosine, dot, l2_norm
from ..operators.text import (
    alpha_ratio,
    bpe_ish_token_count,
    fingerprint,
    predicted_language,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
)

#: Hour-bucket format of the reference's OpenSearch index rotation
#: (``sensor-log-YYYY-MM-DD-HH``, README.md:110).
HOUR_FMT = "yyyy-MM-dd-HH"


def log_hour(ts: Column | str, fmt: str = HOUR_FMT) -> Column:
    """Hourly partition/grouping key (Table A11/A20)."""
    col = F.col(ts) if isinstance(ts, str) else ts
    return F.date_format(col, fmt)


def histogram_bucket(col: Column | str, width: int) -> Column:
    """Numeric histogram bucketing (Table A22/A23: the Kibana line
    chart's ~500-wide buckets over the publish counter)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.floor(c / width) * width).cast("long")


def time_bucket(ts: Column | str, seconds: int) -> Column:
    """Arbitrary-width time bucket (epoch-aligned), the downsampling
    key of ``downsample_ohlc_10min``."""
    col = F.col(ts) if isinstance(ts, str) else ts
    return F.timestamp_seconds((col.cast("long") / seconds).cast("long") * seconds)


__all__ = [
    "HOUR_FMT",
    "alpha_ratio",
    "bpe_ish_token_count",
    "cosine",
    "dot",
    "fingerprint",
    "histogram_bucket",
    "l2_norm",
    "log_hour",
    "predicted_language",
    "quality_score",
    "simhash64",
    "simhash_hamming",
    "stopword_ratio",
    "time_bucket",
    "token_count",
    "tokens",
    "word_shingles",
]
