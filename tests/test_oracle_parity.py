"""Every registered query must match its DuckDB oracle at sf0.001.

This mirrors the driver's correctness gate (row count + column set +
order-insensitive cell compare) so regressions surface in `pytest`
before the driver sees them. The heavier sf0.01 sweep lives in
tools/check_parity.py.
"""

from __future__ import annotations

import pytest

from tools.check_parity import compare

from .conftest import SF_SMOKE


def _names():
    import __spark_entry__ as e

    return sorted(e.queries().keys())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, duck, name):
    import __spark_entry__ as e

    sdf = e.queries()[name](spark, SF_SMOKE).toPandas()
    oracles = e.oracle_sql()
    if name not in oracles:
        assert len(sdf) >= 0  # rows-only check for non-SQL-expressible ops
        return
    ddf = duck.execute(oracles[name]).fetchdf()
    problems = compare(name, sdf, ddf)
    hard = [p for p in problems
            if "APPROX" in p or "rowcount" in p or "columns" in p]
    assert not hard, problems


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) >= 10
