"""Skew-aware join: key salting (SURVEY.md 'Partitioning & shuffle';
task brief 'skewed keys hurt ... salting for skew').

AQE's skew-join splitting (enabled session-wide in this engine) handles
most skew transparently; explicit salting remains the tool when one key
dominates so hard that even split sub-partitions bottleneck, or when
the skewed side feeds an aggregation rather than a join.  The salted
join here is semantics-preserving: fact keys gain a random-ish salt
derived from a row attribute (deterministic, so retries are stable),
the dim side is exploded across all salt values, and the join key
becomes (key, salt) -- spreading one hot key over ``n_salts``
partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    salt_source: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact`` with ``dim`` on ``key`` with the fact side
    salted across ``n_salts`` sub-keys.

    ``salt_source``: a fact column whose hash picks the salt
    (deterministic across retries -- never ``rand()``, which breaks
    task retry idempotency); defaults to the key itself combined with
    ``spark_partition_id`` being avoided for determinism, so any
    high-cardinality column works (e.g. the fact's primary key).
    """
    src = F.col(salt_source) if salt_source else F.col(key)
    salted_fact = fact.withColumn("__salt", F.pmod(F.xxhash64(src), n_salts))
    exploded_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>"))
    )
    joined = salted_fact.join(exploded_dim, on=[key, "__salt"], how=how)
    return joined.drop("__salt")
