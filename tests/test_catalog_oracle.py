"""The correctness gate, locally: every catalog query with an oracle
must match DuckDB exactly at the driver's correctness scale (sf0.01);
oracle-less queries must at least execute and return a stable schema.
"""

from __future__ import annotations

import pytest

from iot_sensor_log_data_pipeline_spark.plans import catalog

from .oracle_harness import check_query

NAMES = sorted(catalog.all_entries())


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, sf_correctness_dir, name):
    problems = check_query(spark, name, sf_correctness_dir)
    assert not problems, f"{name}: " + " | ".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["log_hour", "avg_value", "n_events"]


def test_oracle_keys_subset_of_queries():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) > 0
