"""Table-maintenance utilities: the small-files problem.

Streaming sinks and per-batch appends (exactly the shapes
``streaming/curation.py`` produces) accumulate many small parquet
files; scan cost then scales with file count, not bytes. Compaction
rewrites a directory into ~target-size files — the OPTIMIZE pass every
lakehouse schedules, expressed with plain Spark primitives.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024  # HDFS-block-ish file target


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet_dir(spark: SparkSession, in_dir: str, out_dir: str,
                        target_bytes: int = DEFAULT_TARGET_BYTES) -> int:
    """Rewrite ``in_dir``'s parquet files into ``ceil(bytes/target)``
    files at ``out_dir``; returns the output file count.

    The file count comes from the ACTUAL on-disk byte size (a metadata
    walk, no data read), so the rewrite is one repartition-and-write —
    coalesce() would be wrong here twice over: it caps parallelism of
    the WRITE to the output file count, and with fewer input than
    output partitions it can't split at all. Compaction into a
    DIFFERENT directory + atomic swap by the caller is the
    crash-safe protocol (the source stays readable throughout), same
    stage-and-swap discipline as plans/migrations.py.
    """
    n_files = max(1, math.ceil(_dir_bytes(in_dir) / target_bytes))
    df: DataFrame = spark.read.parquet(in_dir)
    df.repartition(n_files).write.mode("overwrite").parquet(out_dir)
    written = sum(
        1 for _r, _d, fs in os.walk(out_dir)
        for f in fs if f.endswith(".parquet"))
    return written
