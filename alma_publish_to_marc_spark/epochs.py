"""Shared epoch-day arithmetic — the ONE definition of the
parity-critical integer idiom (CLAUDE.md: epoch math is `div`/`//` on
unix micros, never a double divide; engine date-part builtins
disagree)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

US_PER_DAY = 86_400_000_000


def day_col(name: str) -> Column:
    """Epoch day of a timestamp column, exact integer division."""
    return F.expr(f"unix_micros(cast({name} as timestamp))"
                  f" div {US_PER_DAY}")


def sql_day(expr: str) -> str:
    """DuckDB twin of :func:`day_col`."""
    return f"CAST(epoch_us({expr}) // {US_PER_DAY} AS BIGINT)"
