"""Property tests pinning the round-4 cross-engine hazards.

Two bugs cost real debugging time this round; these tests make them
permanent regressions instead of rediscoveries:

1. MONEY MIDPOINTS — ``round(sum_e4/1e4, 2)`` lands on a true ``.xx5``
   decimal midpoint whenever ``sum_e4 ≡ 50 (mod 100)``, where Spark
   (BigDecimal over the double's exact expansion) and DuckDB (libm)
   round DIFFERENT ways. The fix (`tpch_queries._money`) makes the
   half-up decision in integer space. The property: Spark expression,
   DuckDB expression, and a pure-integer Python reference agree on
   adversarially midpoint-heavy inputs.

2. DUCKDB IN-PLACE FOLD — DuckDB 1.0 ``list_reduce`` evaluates
   ``struct_pack`` fields in place on the accumulator: a field reading
   an acc field that an earlier field already wrote sees the NEW
   value. The Brown-smoothing fold orders fields (s2 before s1) so
   every read precedes its write. The property: Spark fold, DuckDB
   fold, and a Python reference agree on random integer series.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st


# adversarial e4 sums: dense around multiples of 50 (the midpoint class)
_midpointish = st.one_of(
    st.integers(min_value=-10**15, max_value=10**15),
    st.integers(min_value=-10**7, max_value=10**7).map(lambda k: k * 50),
    st.integers(min_value=-10**7, max_value=10**7).map(lambda k: k * 100 + 50),
)


def _py_money(e4: int) -> float:
    return math.floor((e4 + 50) / 100.0) / 100.0


@settings(max_examples=30, deadline=None)
@given(st.lists(_midpointish, min_size=1, max_size=40))
def test_money_midpoints_agree_across_engines(spark, duck, e4s):
    from pyspark.sql import functions as F

    from alma_publish_to_marc_spark.plans.tpch_queries import (_money,
                                                               _sql_money)

    sdf = (spark.createDataFrame([(v,) for v in e4s], "e4 long")
           .agg(_money(F.sum("e4")).alias("m")).collect())
    total = sum(e4s)
    d = duck.execute(
        f"SELECT {_sql_money(str(total))} AS m").fetchone()[0]
    assert sdf[0]["m"] == d == _py_money(total)


def _py_brown(xs):
    s1 = s2 = xs[0]
    for x in xs[1:]:
        s1, s2 = (math.floor((x + s1) / 2.0), math.floor((s1 + s2) / 2.0))
    return s1, s2


@settings(max_examples=15, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**9),
                min_size=1, max_size=50))
def test_brown_fold_agrees_across_engines(spark, duck, xs):
    from pyspark.sql import functions as F

    # Spark fold — same construction as timeseries_queries
    elems = F.transform(F.col("xs"), lambda x: F.struct(
        F.lit(0).cast("long").alias("s2"), x.alias("s1"),
        F.lit(0).cast("long").alias("i")))
    init = F.struct(F.lit(0).cast("long").alias("s2"),
                    F.lit(0).cast("long").alias("s1"),
                    F.lit(0).cast("long").alias("i"))

    def step(acc, e):
        first = F.struct(e["s1"].alias("s2"), e["s1"].alias("s1"),
                         F.lit(1).cast("long").alias("i"))
        rest = F.struct(
            F.floor((acc["s1"] + acc["s2"]) / 2.0).cast("long").alias("s2"),
            F.floor((e["s1"] + acc["s1"]) / 2.0).cast("long").alias("s1"),
            (acc["i"] + 1).alias("i"))
        return F.when(acc["i"] == 0, first).otherwise(rest)

    row = (spark.createDataFrame([(xs,)], "xs array<long>")
           .select(F.aggregate(elems, init, step).alias("acc"))
           .collect()[0]["acc"])

    lit = "[" + ",".join(str(x) for x in xs) + "]"
    d = duck.execute(f"""
        SELECT list_reduce(
          list_prepend(struct_pack(s2 := 0::BIGINT, s1 := 0::BIGINT,
                                   i := 0::BIGINT),
                       list_transform({lit}::BIGINT[], x -> struct_pack(
                           s2 := 0::BIGINT, s1 := x, i := 0::BIGINT))),
          (acc, e) -> CASE WHEN acc.i = 0
            THEN struct_pack(s2 := e.s1, s1 := e.s1, i := 1::BIGINT)
            ELSE struct_pack(
              s2 := CAST(floor((acc.s1 + acc.s2) / 2.0) AS BIGINT),
              s1 := CAST(floor((e.s1 + acc.s1) / 2.0) AS BIGINT),
              i := acc.i + 1)
          END)""").fetchone()[0]
    ps1, ps2 = _py_brown(xs)
    assert (row["s1"], row["s2"]) == (d["s1"], d["s2"]) == (ps1, ps2)
    assert row["i"] == d["i"] == len(xs)
