"""SparkSession construction tuned for this engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32); the same
settings are what we would ship on a multi-executor cluster:

- AQE on (runtime coalesce, skew-join splitting, dynamic broadcast demotion)
- Arrow on (every pandas UDF / mapInPandas stage is Arrow-batched)
- shuffle partitions sized to the local core count; on a real cluster AQE
  coalesces from a deliberately-high initial number, so we set the initial
  partitions high and let AQE shrink rather than hand-tuning per query.
- session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle (naive timestamps) and are stable across environments.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

_shipped: set[int] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable on Python workers regardless of the
    driver's cwd: zip the package and addPyFile it (UDF/mapInPandas
    closures reference these modules by import, so workers must be able
    to import them — sys.path hacks on the driver don't propagate)."""
    key = id(spark.sparkContext)
    if key in _shipped:
        return
    try:
        pkg_dir = os.path.dirname(os.path.abspath(__file__))
        zpath = os.path.join(tempfile.gettempdir(),
                             "alma_publish_to_marc_spark_pyfiles.zip")
        with zipfile.ZipFile(zpath, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if not fn.endswith(".py"):
                        continue
                    full = os.path.join(root, fn)
                    rel = os.path.join("alma_publish_to_marc_spark",
                                       os.path.relpath(full, pkg_dir))
                    zf.write(full, rel)
        spark.sparkContext.addPyFile(zpath)
        _shipped.add(key)
    except Exception:
        pass  # best effort; co-located cwd still works without it


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable configs to an existing session.

    Used both by :func:`get_spark` and by the driver-contract entry points,
    which receive an externally-built session we cannot rebuild.
    """
    conf = spark.conf
    conf.set("spark.sql.session.timeZone", "UTC")
    conf.set("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    # Parquet scans: keep row-group pruning + column pruning effective.
    conf.set("spark.sql.parquet.filterPushdown", "true")
    conf.set("spark.sql.parquet.aggregatePushdown", "true")
    # Runtime bloom-filter join pruning: when one side of a shuffle join
    # is selective, inject a bloom filter of its keys into the other
    # side's scan — at 100 TB this cuts the probe-side shuffle of the
    # sort-merge joins (e.g. tfidf's tf⋈dfreq on term) before exchange.
    conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    # The driver testdata stores TIMESTAMP(NANOS) which the vectorized
    # reader rejects; read as long and convert in tables.load().
    conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    _ship_package(spark)
    return spark


def get_spark(app_name: str = "alma-publish-to-marc-spark",
              cpus: int | None = None) -> SparkSession:
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    return tune(builder.getOrCreate())
