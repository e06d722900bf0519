"""Cross-engine-stable numeric aggregate builders.

The corpus's money-like columns hold scale-2 decimal values stored as
doubles.  Sums of such doubles accumulate engine-dependent error
(summation order differs between Spark partial aggregation and the
DuckDB oracle), and their true sums/averages frequently land EXACTLY
on a rounding-grid boundary (e.g. avg = cents/2^k => ...5 at the
rounded digit), where that 1-ulp error decides the rounded digit --
observed as real oracle mismatches (q10 revenue at sf0.01,
hourly_avg at sf0.1).

Fix: do the additive part in exact DECIMAL arithmetic and convert to
double only afterwards -- both engines then produce the bit-identical
double before any rounding.  Helpers below build the Spark column and
matching DuckDB SQL fragment together so they cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,2)"
DEC_SQL = "DECIMAL(18,2)"


def dec_sum(col: str) -> Column:
    """Exact sum of a scale-2 column, as double."""
    return F.sum(F.col(col).cast(DEC)).cast("double")


def dec_sum_sql(col: str) -> str:
    return f"CAST(sum(CAST({col} AS {DEC_SQL})) AS DOUBLE)"


def dec_avg(col: str, digits: int = 6) -> Column:
    """avg() of a scale-2 column with an exact-decimal numerator:
    identical doubles on both engines before the shared rounding."""
    return F.round(dec_sum(col) / F.count(F.lit(1)), digits)


def dec_avg_sql(col: str, digits: int = 6) -> str:
    return f"round({dec_sum_sql(col)} / count(*), {digits})"


def round_half_up(col: Column, digits: int = 6) -> Column:
    """Cross-engine-deterministic HALF-UP rounding for non-negative
    doubles: ``floor(x * 10^d + 0.5) / 10^d``.  Unlike ``round()`` --
    where Spark rounds the double's SHORTEST DECIMAL REPR (HALF_UP on
    BigDecimal.valueOf) while DuckDB rounds the exact binary value, so
    the two disagree by one output ulp whenever x is a terminating
    decimal ending in 5 at digit d+1 (exactly what midpoint
    interpolation of scale-2 inputs produces) -- every step here is
    plain double arithmetic with identical results in both engines."""
    scale = float(10**digits)
    return F.floor(col * scale + F.lit(0.5)) / scale


def round_half_up_sql(expr: str, digits: int = 6) -> str:
    scale = float(10**digits)
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"
