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


def test_verify_priority_names_resolve():
    """Every name pinned into the external-verify window must exist and
    be unique -- a typo here silently burns a slot in the driver's
    50-query cap, so fail loudly instead."""
    priority = catalog.verify_priority()
    registered = set(catalog.all_entries())
    unknown = [n for n in priority if n not in registered]
    assert not unknown, f"priority names not in catalog: {unknown}"
    assert len(priority) == len(set(priority)), "duplicate priority names"
    assert len(priority) <= 50, "priority list exceeds the driver window"


def test_priority_window_order():
    """queries() must emit priority names first, in priority order."""
    names = list(catalog.all_entries())
    priority = [n for n in catalog.verify_priority()]
    assert names[: len(priority)] == priority


def test_verify_window_covers_unverified():
    """The rotation guard: every oracle-backed query that has never
    received an external CORRECTNESS row must sit inside the next
    external window (the first 50 of ``verify_priority()``).  Round 7
    shipped 4 queries that missed the window for two rounds because
    the rotation plan was written as a comment and never applied to
    the tuple -- this test makes that class of slip a red test instead
    of a judge finding."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen: set[str] = set()
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        with open(path) as f:
            seen.update(json.load(f))
    window = set(catalog.verify_priority()[:50])
    unscheduled = [
        name
        for name, entry in catalog.all_entries().items()
        if entry.oracle is not None and name not in seen and name not in window
    ]
    assert not unscheduled, (
        "oracle-backed queries with no external CORRECTNESS row are not "
        f"in the next verify window: {unscheduled}"
    )
