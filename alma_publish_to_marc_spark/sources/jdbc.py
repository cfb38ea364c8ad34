"""SRC-10/11: JDBC source and upsert sink.

The reference reads Postgres with server-side cursors (`fetchmany(1000)`,
`database_insert.py:107-116`) and writes with generated
`INSERT … ON CONFLICT DO UPDATE` prepared statements (`:11-46`).

Spark-first:
- reads: `spark.read.jdbc` with `fetchsize` (the cursor batch) and
  `partitionColumn/lowerBound/upperBound/numPartitions` for parallel
  range scans — the distributed generalization of the cursor loop.
- upsert sink: Spark's JDBC writer is append/overwrite only, so keyed
  upsert goes through `foreachPartition`: one DB connection per
  partition, executemany batches of generated ON CONFLICT statements —
  exactly the reference's statement shape, scaled out per partition.

No database runs in this container, so tests cover statement generation
and partition-batching; the connection path is exercised only when a
DB-API driver + URL are provided.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession


def read_table(spark: SparkSession, url: str, table: str,
               fetchsize: int = 1000,
               partition_column: str | None = None,
               bounds: tuple[int, int] | None = None,
               num_partitions: int = 8,
               properties: dict | None = None) -> DataFrame:
    """SRC-10: JDBC scan; `fetchsize` mirrors the reference's 1000-row
    cursor batches (database_insert.py:112)."""
    reader = (spark.read.format("jdbc")
              .option("url", url).option("dbtable", table)
              .option("fetchsize", str(fetchsize)))
    if partition_column and bounds:
        reader = (reader.option("partitionColumn", partition_column)
                  .option("lowerBound", str(bounds[0]))
                  .option("upperBound", str(bounds[1]))
                  .option("numPartitions", str(num_partitions)))
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def generate_upsert_sql(table: str, key_columns: Sequence[str],
                        value_columns: Sequence[str],
                        guard_column: str | None = None,
                        no_updates: bool = False,
                        placeholder: str = "%s") -> str:
    """SRC-11/12 statement codegen (behavior of database_insert.py:6-46):
    ON CONFLICT(keys) DO UPDATE SET values, version = version + 1,
    update_date_time = now() [WHERE stored.guard < excluded.guard];
    `no_updates` → DO NOTHING."""
    cols = [*key_columns, *value_columns]
    collist = ", ".join(cols)
    ph = ", ".join([placeholder] * len(cols))
    conflict = ", ".join(key_columns)
    if no_updates:
        return (f"INSERT INTO {table} ({collist}) VALUES ({ph}) "
                f"ON CONFLICT ({conflict}) DO NOTHING")
    sets = ", ".join(f"{c} = excluded.{c}" for c in value_columns)
    stmt = (f"INSERT INTO {table} ({collist}) VALUES ({ph}) "
            f"ON CONFLICT ({conflict}) DO UPDATE SET {sets}, "
            f"version = {table}.version + 1, update_date_time = now()")
    if guard_column:
        stmt += f" WHERE {table}.{guard_column} < excluded.{guard_column}"
    return stmt


def upsert_partition_batches(rows, columns: Sequence[str],
                             batch_size: int = 1000):
    """OP-S4/OP-S5: yield executemany-sized tuple batches (the reference
    commits per 1000, alma_analytics_to_item_status.py:44-46)."""
    batch = []
    for row in rows:
        batch.append(tuple(row[c] for c in columns))
        if len(batch) >= batch_size:
            yield batch
            batch = []
    if batch:
        yield batch


def upsert_via_foreach_partition(df: DataFrame, table: str,
                                 key_columns: Sequence[str],
                                 connection_factory: Callable[[], object],
                                 guard_column: str | None = None,
                                 batch_size: int = 1000) -> None:
    """SRC-11 sink: per-partition connection + executemany upserts —
    the distributed form of the reference's per-thread connections
    (alma_publish_to_database.py:450-480)."""
    columns = df.columns
    value_columns = [c for c in columns if c not in key_columns]
    sql = generate_upsert_sql(table, key_columns, value_columns, guard_column)

    def write(partition) -> None:
        conn = connection_factory()
        try:
            cur = conn.cursor()
            for batch in upsert_partition_batches(partition, columns,
                                                  batch_size):
                cur.executemany(sql, batch)
                conn.commit()
        except Exception:
            conn.rollback()
            raise
        finally:
            conn.close()

    df.foreachPartition(write)
