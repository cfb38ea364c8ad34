"""Reusable relational operators (SURVEY.md §2.3–2.7).

Each function is a pure DataFrame→DataFrame transform; the reference
semantics it reproduces are cited. All are shuffle-conscious:

- anti/semi joins shuffle once on the join key (or broadcast when the
  right side is small — Catalyst/AQE decides; pass a broadcast hint via
  ``hint_broadcast=True`` when the caller *knows* the side is tiny).
- latest/first-per-key use a single window shuffle on the partition key;
  at 100 TB this is one exchange of the input, no join needed.
- replace_by_key is the batch form of delete-then-insert (OP-SET2):
  one anti-join shuffle + a union (union is shuffle-free).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def broadcast_lookup(fact: DataFrame, dim: DataFrame, keys: Sequence[str],
                     how: str = "left") -> DataFrame:
    """OP-J1 (`alma_publish_to_database.py:130-137`): the reference loads
    the location dimension into a driver-side dict and probes per row;
    Spark-first this is a broadcast hash join — no shuffle of the fact."""
    return fact.join(F.broadcast(dim), on=list(keys), how=how)


def anti_join_deletes(stored: DataFrame, incoming: DataFrame,
                      keys: Sequence[str]) -> DataFrame:
    """OP-J2/J3 (`alma_publish_to_database.py:139-143,238-241`): rows
    present in the warehouse but absent from the incoming batch — the
    delete set. `left_anti` plans as one shuffle (or broadcast) join."""
    return stored.join(incoming.select(*keys).dropDuplicates(list(keys)),
                       on=list(keys), how="left_anti")


def semi_join(left: DataFrame, right: DataFrame, keys: Sequence[str]) -> DataFrame:
    """OP-J9 (`ddl/data_sync_db.sql:546-557` EXISTS check)."""
    return left.join(right.select(*keys).dropDuplicates(list(keys)),
                     on=list(keys), how="left_semi")


def latest_per_key(df: DataFrame, keys: Sequence[str],
                   ts_col: str, tiebreak: Sequence[str] = ()) -> DataFrame:
    """OP-W3 / last-writer-wins (`alma_publish_to_database.py:124`;
    `database_insert.py:22-23`): keep the newest row per key. Tiebreak
    columns make the result deterministic under timestamp collisions —
    required for idempotent MERGE semantics."""
    order = [F.desc(ts_col), *[F.desc(c) for c in tiebreak]]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (df.withColumn("_rn", F.row_number().over(w))
              .where(F.col("_rn") == 1).drop("_rn"))


def first_per_group(df: DataFrame, keys: Sequence[str],
                    order_cols: Sequence[str]) -> DataFrame:
    """OP-A7/OP-W2 (`alma_analytics_to_item_status.py:39-51`): the
    reference keeps the first TSV row per pid via adjacent-row compare;
    distributed form is rank-1 by explicit order (file order ≈ order_cols)."""
    w = Window.partitionBy(*keys).orderBy(*[F.asc(c) for c in order_cols])
    return (df.withColumn("_rn", F.row_number().over(w))
              .where(F.col("_rn") == 1).drop("_rn"))


def replace_by_key(stored: DataFrame, incoming: DataFrame,
                   keys: Sequence[str]) -> DataFrame:
    """OP-SET2 (`alma_publish_to_database.py:217,224-233`): delete-then-
    insert of all rows for keys present in the batch (external ids /
    bib_parts are wholesale-replaced per record). Batch form:
    stored ▷ incoming-keys ∪ incoming."""
    survivors = stored.join(incoming.select(*keys).dropDuplicates(list(keys)),
                            on=list(keys), how="left_anti")
    return survivors.unionByName(incoming.select(*survivors.columns))


def salted_join(skewed: DataFrame, other: DataFrame, key: str,
                salt_buckets: int = 16, how: str = "inner") -> DataFrame:
    """Skew-resistant equi-join (beyond the reference, which never joins
    at scale): explode the *small/replicable* side into ``salt_buckets``
    copies and salt the skewed side's key with a uniform random-ish
    bucket, so one hot key (a bib with millions of items, one dominant
    library) spreads across ``salt_buckets`` reducers instead of pinning
    a single task. Deterministic salt — hash of the whole row modulo
    buckets — keeps reruns/retries stable (no rand(), which breaks task
    retry idempotency). Result is exactly the plain join.

    AQE's skew-join split (spark.sql.adaptive.skewJoin) covers sort-merge
    cases automatically; explicit salting remains the tool when the
    planner can't see the skew (e.g. key computed late) or for
    aggregation-style fan-in before a groupBy."""
    # pmod, not abs+%: abs(Integer.MIN_VALUE) overflows negative and would
    # silently drop the row (no replicated bucket matches a negative salt).
    salt = F.pmod(F.hash(*[F.col(c) for c in skewed.columns]),
                  F.lit(salt_buckets)).alias("_salt")
    left = skewed.select("*", salt)
    right = other.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
        .alias("_salt"))
    return left.join(right, [key, "_salt"], how).drop("_salt")


def changed_rows(df: DataFrame, keys: Sequence[str], order_col: str,
                 value_col: str) -> DataFrame:
    """OP-W2 adjacent-change detection (`alma_analytics_to_item_status.py:
    41-48`): rows whose value differs from the previous row within key,
    in order_col order. First row of each key counts as changed."""
    w = Window.partitionBy(*keys).orderBy(F.asc(order_col))
    prev = F.lag(value_col).over(w)
    return df.withColumn(
        "changed",
        F.when(prev.isNull() | (prev != F.col(value_col)), F.lit(True))
         .otherwise(F.lit(False)),
    )
