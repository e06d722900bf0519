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


def hot_key_split_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    hot_keys: list | None = None,
    n_hot: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Differentiated skew join: rows whose join key is HOT take a
    broadcast-hash path against just the dim rows for those keys; the
    cold majority takes the normal shuffle path; the union is exactly
    the plain join (equality pinned in pytest, inner and left).

    This is the classic fix when AQE skew-splitting can't help: AQE
    splits an oversized shuffle PARTITION, but one key whose matches
    must meet on a single reducer still bottlenecks -- routing that
    key around the shuffle entirely (its dim rows broadcast to
    wherever its fact rows already sit) removes the hotspot without
    salting every row.  ``salted_join`` above remains the tool when
    even the hot-side dim subset is too big to broadcast.

    ``hot_keys``: explicit hot-key list (bounded -- it rides into an
    ``isin`` predicate, which Catalyst pushes to both scans).  When
    None, the top ``n_hot`` fact keys by count are taken via
    TakeOrdered (per-partition heaps; a bounded driver pull, same
    contract as the sketch closures).  Nominate with
    ``sketch.heavy_hitters`` or ``profiling.join_skew_report`` when
    the key-count table itself is the expensive part.

    ``how``: "inner" or "left" (fact-preserving); other types would
    need dim-side null-extension across the split and are refused.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"hot_key_split_join supports inner/left, got {how!r}")
    if hot_keys is None:
        hot_keys = [
            r[key]
            for r in fact.where(F.col(key).isNotNull())
            .groupBy(key)
            .agg(F.count(F.lit(1)).alias("__n"))
            .orderBy(F.desc("__n"), F.asc(key))
            .limit(n_hot)
            .collect()
        ]
    if not hot_keys:
        return fact.join(dim, key, how)
    is_hot = F.col(key).isin(hot_keys)
    # NULL keys: is_hot is NULL, so they fall through BOTH where()
    # filters unless routed explicitly -- a left join must keep them
    # (they null-extend), so they ride the cold branch.
    cold_pred = ~is_hot if how == "inner" else (~is_hot | F.col(key).isNull())
    hot_out = fact.where(is_hot).join(
        F.broadcast(dim.where(is_hot)), key, how
    )
    # Cold fact keys can never match hot dim rows, so the cold-side
    # dim scan drops them too (NULL dim keys match nothing in an
    # equi-join and dim rows don't null-extend under inner/left, so
    # dropping them with ~is_hot's 3VL is safe).
    cold_out = fact.where(cold_pred).join(dim.where(~is_hot), key, how)
    return hot_out.unionByName(cold_out)


def salt_advisor(
    left: DataFrame,
    right: DataFrame,
    key: str,
    target_pairs: int = 1_000_000,
    k: int = 20,
) -> DataFrame:
    """Per-hot-key mitigation plan: the planning step BETWEEN
    ``profiling.join_skew_report`` (which ranks the hot keys) and the
    two executors above (which need a strategy and a salt width as
    inputs).  For the ``k`` keys with the largest exact join fan-out
    it emits the strategy a 100 TB fact-fact join would pick:

    - ``as-is``       fan-out <= ``target_pairs``; AQE handles it.
    - ``split``       hot key, but one side is single-row -- routing
                      it through ``hot_key_split_join`` broadcasts
                      that side's rows for the key; no salting needed
                      because the matched payload is key-count-sized.
    - ``salt``        both sides plural AND over target: salt the
                      bigger side, explode the smaller; ``salt_factor``
                      = ceil(est_pairs / target_pairs) spreads the
                      key's output evenly at the target task size.

    ``target_pairs`` is the per-task output budget (rows one reducer
    should own -- derive it from executor memory / row width, the same
    sizing exercise as ``spark.sql.shuffle.partitions``).

    Cost shape: identical to ``join_skew_report`` -- two (key, count)
    aggs carrying one long per distinct key, an equi-join of the count
    tables, a TakeOrdered top-k; the advice columns are per-row
    arithmetic on the counts.  One-statement-SQL-replayable, so the
    catalog row is fully oracle-checked.
    """
    cl = left.groupBy(key).agg(F.count(F.lit(1)).alias("n_left"))
    cr = right.groupBy(key).agg(F.count(F.lit(1)).alias("n_right"))
    est = F.col("n_left") * F.col("n_right")
    tp = F.lit(int(target_pairs))
    strategy = (
        F.when(est <= tp, F.lit("as-is"))
        .when((F.col("n_left") == 1) | (F.col("n_right") == 1), F.lit("split"))
        .otherwise(F.lit("salt"))
    )
    # The width only means something on the salt path: as-is needs no
    # spreading and split routes around the shuffle entirely.
    salt = F.when(strategy == "salt", F.ceil(est / tp)).otherwise(F.lit(1))
    return (
        cl.join(cr, key)
        .select(
            key,
            "n_left",
            "n_right",
            est.alias("est_pairs"),
            salt.cast("long").alias("salt_factor"),
            strategy.alias("strategy"),
        )
        .orderBy(F.desc("est_pairs"), F.asc(key))
        .limit(k)
    )
