"""Spark 4 Python DataSource for Alma publish drops: after
``register(spark)``, ``spark.read.format("marcpublish").load(glob)``
yields the same nested-record frame as
``publish.read_publish_records`` (SRC-1/2 + SRC-6 routing,
`alma_publish_parser.py:197-238,291-292`).

Why both exist: the binaryFile+mapInPandas path composes with other
DataFrame sources and inherits Spark's file-split scheduling; the
DataSource form is the catalog-friendly packaging (usable from pure SQL
via ``CREATE TABLE ... USING marcpublish``) and carries its own
partition planning — one input partition per publish file, the same
parallelism unit as the reference's per-file ThreadPool tasks.

Scale: partition planning is a driver-side listing (cheap metadata);
each partition streams one file through the tar/XML codec on an
executor, so a 100 TB backlog scales with file count exactly like the
mapInPandas path. No shuffle anywhere.
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    DataSourceStreamReader,
                                    DataSourceWriter, InputPartition)

from ..schemas import PUBLISH_RECORD
from . import marclib
from .publish import _extract_xml_payloads


def _rec_tuple(rec: dict) -> tuple:
    """Nested dict → schema-ordered tuples (the DataSource row form)."""
    return (
        rec.get("mms_id"),
        rec.get("leader"),
        [(cf.get("tag"), cf.get("data"))
         for cf in rec.get("control_fields") or []],
        [(f.get("tag"), f.get("ind1"), f.get("ind2"),
          [(s.get("code"), s.get("value")) for s in f.get("subfields") or []])
         for f in rec.get("fields") or []],
        rec.get("source_file"),
    )


def _upsert_files(path: str) -> list[str]:
    """Sorted upsert files under a path/glob (SRC-4 lexicographic
    order; delete manifests route elsewhere)."""
    pattern = path
    if os.path.isdir(pattern):
        pattern = os.path.join(pattern, "*")
    return sorted(
        p for p in _glob.glob(pattern)
        if os.path.isfile(p) and "delete" not in os.path.basename(p))


def _read_file(path: str):
    """Executor-side: stream one publish file into record tuples."""
    with open(path, "rb") as fh:
        content = fh.read()
    try:
        for payload in _extract_xml_payloads(path, content):
            for rec in marclib.from_marcxml(payload, source_file=path):
                yield _rec_tuple(rec)
    except Exception:
        # log-and-continue per file (parse_file semantics): a
        # null-mms_id row routes to split_publish's error stream
        yield _rec_tuple(marclib.new_record(source_file=path))


class MarcPublishReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.path = options.get("path") or ""

    def partitions(self):  # driver-side: one partition per upsert file
        return [InputPartition(p) for p in _upsert_files(self.path)]

    def read(self, partition):
        yield from _read_file(partition.value)


class MarcPublishStreamReader(DataSourceStreamReader):
    """Micro-batch incremental reader over the publish landing dir —
    the streaming form of the same source: each trigger picks up files
    that arrived since the last committed offset.

    The offset is the lexicographically-largest file name processed so
    far, which is exactly the contract the batch surface already relies
    on (SRC-4: drops are timestamped, names arrive in order —
    `alma_publish_parser.py:197-238`'s sorted listing). Offsets are
    tiny (one name), replayable (``partitions(start, end)`` re-derives
    the file set from the two bounds, so a failed batch re-reads the
    same files — exactly-once with a checkpointed sink), and partition
    planning stays a driver-side listing with one partition per new
    file, read executor-side like the batch reader."""

    def __init__(self, options: dict) -> None:
        self.path = options.get("path") or ""

    def initialOffset(self) -> dict:
        return {"last": ""}

    def latestOffset(self) -> dict:
        files = _upsert_files(self.path)
        return {"last": files[-1] if files else ""}

    def partitions(self, start: dict, end: dict):
        lo, hi = start.get("last", ""), end.get("last", "")
        return [InputPartition(p) for p in _upsert_files(self.path)
                if lo < p <= hi]

    def read(self, partition):
        yield from _read_file(partition.value)

    def commit(self, end: dict) -> None:
        pass  # processed files stay in place; the offset is the cursor


class MarcPublishWriter(DataSourceWriter):
    """Executor-side binary MARC sink (the DataSource form of SRC-15:
    `alma_publish_to_marc.py:16-24,36-37`'s MARCWriter): each task
    serializes its partition of nested records to ISO 2709 and writes
    one ``part-<uuid>.mrc`` file under the target directory; the commit
    message carries (path, n_records) back to the driver, where
    ``commit`` writes a ``_SUCCESS`` manifest listing every part — the
    usual all-or-nothing file-sink protocol (readers key on _SUCCESS,
    half-written runs without it are invisible). ``abort`` removes this
    task's file so retries can't double-publish."""

    def __init__(self, options: dict) -> None:
        self.path = options.get("path") or ""

    def write(self, iterator):
        import uuid

        from pyspark.sql.datasource import WriterCommitMessage

        os.makedirs(self.path, exist_ok=True)
        out = os.path.join(self.path, f"part-{uuid.uuid4().hex}.mrc")
        n = 0
        with open(out, "wb") as fh:
            for row in iterator:
                rec = {
                    "mms_id": row.mms_id,
                    "leader": row.leader,
                    "control_fields": [
                        {"tag": cf.tag, "data": cf.data}
                        for cf in row.control_fields or []],
                    "fields": [
                        {"tag": f.tag, "ind1": f.ind1, "ind2": f.ind2,
                         "subfields": [{"code": s.code, "value": s.value}
                                       for s in f.subfields or []]}
                        for f in row.fields or []],
                }
                fh.write(marclib.to_iso2709(rec))
                n += 1
        if n == 0:
            os.remove(out)  # no empty part files
            return WriterCommitMessage()
        msg = WriterCommitMessage()
        msg.path, msg.count = out, n  # type: ignore[attr-defined]
        return msg

    def commit(self, messages):
        parts = sorted(
            (m.path, m.count) for m in messages
            if m is not None and getattr(m, "path", None))
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            for path, count in parts:
                fh.write(f"{os.path.basename(path)}\t{count}\n")

    def abort(self, messages):
        for m in messages or []:
            p = getattr(m, "path", None)
            if p and os.path.exists(p):
                os.remove(p)


class MarcPublishDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "marcpublish"

    def schema(self):
        return PUBLISH_RECORD

    def reader(self, schema) -> MarcPublishReader:
        return MarcPublishReader(self.options)

    def streamReader(self, schema) -> MarcPublishStreamReader:
        return MarcPublishStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> MarcPublishWriter:
        # overwrite must clear prior parts at plan time (driver-side):
        # a glob reader over *.mrc would otherwise re-ingest stale
        # files the new _SUCCESS manifest doesn't list — silent
        # double-publish on rewrite
        if overwrite:
            path = self.options.get("path") or ""
            if os.path.isdir(path):
                for f in os.listdir(path):
                    if f.endswith(".mrc") or f == "_SUCCESS":
                        os.remove(os.path.join(path, f))
        return MarcPublishWriter(self.options)


def _register_by_value() -> None:
    """Make the pickled DataSource self-contained.

    Executors see this package via ``addPyFile`` (session.tune), but the
    STREAMING planner process (`python_streaming_source_runner.py`) that
    unpickles the DataSource during micro-batch planning does not add
    Python includes to its path — on a real cluster driver (or any
    driver whose cwd isn't the repo) a by-reference pickle of the reader
    class raises ModuleNotFoundError before the first offset is read.
    Registering the module graph for cloudpickle by-value serialization
    embeds the class and its helpers in the pickle itself, so planning
    works wherever pyspark+pandas are importable.
    """
    try:
        from pyspark import cloudpickle
    except ImportError:  # pragma: no cover - cloudpickle always bundled
        return
    if not hasattr(cloudpickle, "register_pickle_by_value"):
        return
    from .. import schemas
    from . import publish
    import sys

    for mod in (sys.modules[__name__], publish, marclib, schemas):
        cloudpickle.register_pickle_by_value(mod)


def register(spark) -> None:
    from ..session import tune

    tune(spark)  # ships the package so executors can unpickle the reader
    _register_by_value()  # streaming planner unpickles with no includes
    spark.dataSource.register(MarcPublishDataSource)
