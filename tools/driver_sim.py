"""Driver simulation per the verify skill: vanilla SparkSession (no
engine confs), smoke entry(), then every declared query at sf0.01
compared against its DuckDB oracle via tests/oracle_harness.py.
Prints one line per failing query; exits 0 on all-green."""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from pyspark.sql import SparkSession  # noqa: E402

spark = SparkSession.builder.master("local[8]").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e  # noqa: E402
from oracle_harness import compare_frames, run_oracle  # noqa: E402

assert len(e.entry(spark).collect()) > 0, "smoke failed"
print("smoke ok", flush=True)

sf = "/root/testdata/sf0.01"
only = set(sys.argv[1:])
fails = []
t0 = time.time()
qs = e.queries()
oracles = e.oracle_sql()
for i, (name, fn) in enumerate(sorted(qs.items())):
    if only and name not in only:
        continue
    try:
        pdf = fn(spark, sf).toPandas()
        sql = oracles.get(name)
        if sql:
            diff = compare_frames(pdf, run_oracle(sql, sf))
            if diff:
                fails.append(name)
                print(f"FAIL {name}: {diff}", flush=True)
            else:
                print(f"ok {name}", flush=True)
        else:
            assert len(pdf) > 0, f"rows-only {name} returned 0 rows"
            print(f"ok(rows-only) {name}", flush=True)
    except Exception as ex:  # noqa: BLE001
        fails.append(name)
        print(f"ERROR {name}: {ex!r}"[:300], flush=True)
print(f"done {len(qs)} queries in {time.time()-t0:.0f}s; fails={fails}", flush=True)
sys.exit(1 if fails else 0)
