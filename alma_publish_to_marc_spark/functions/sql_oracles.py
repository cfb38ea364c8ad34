"""Shared DuckDB-SQL fragment generators kept in lockstep with the
Spark-side expressions (functions/scalars.py, functions/text.py).
Centralizing them prevents the per-module copies from drifting."""

from __future__ import annotations


def sql_trim_punctuation(expr: str, iterations: int = 8) -> str:
    """Bounded unrolling of trim_punctuation (OP-F1) — mirrors
    scalars.trim_punctuation_bounded exactly."""
    out = expr
    for _ in range(iterations):
        out = f"regexp_replace({out}, ' *[,/;:] *$', '')"
    for _ in range(iterations):
        out = rf"regexp_replace({out}, '( *[^\W\d]{{3,}})\.$', '\1')"
    out = rf"regexp_replace({out}, '^\[?([^\[\]]+)\]?$', '\1')"
    out = f"trim({out})"
    return f"(CASE WHEN {out} = '.' THEN '' ELSE {out} END)"


def sql_rm_ws(expr: str) -> str:
    return f"regexp_replace({expr}, ' +', ' ', 'g')"
