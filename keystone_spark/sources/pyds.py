"""Python DataSource API (Spark 4): fixed-length binary records as a
first-class ``spark.read.format("binary_records")`` source.

The reference's CIFAR loader (reference: ``loaders/CifarLoader.scala``)
reads fixed-record-length binary files; ``sources/loaders.binary_records``
already covers the helper-function form. This module is the Spark-4-native
form: a custom DataSource with

- **parallel byte-range partitions** — each InputPartition owns a
  contiguous record range of one file, so a 100 TB directory of record
  files scans with one task per range, no driver-side byte shuffling;
- **filter pushdown INTO the Python source** (``pushFilters``): range
  predicates on ``record_idx`` (=, <, <=, >, >=) narrow the byte ranges
  BEFORE any I/O — a ``WHERE record_idx < 100`` on a billion-record file
  seeks straight to the first 100 records. Unsupported filters are
  returned to Spark for post-scan evaluation, per the API contract.

Register once per session::

    spark.dataSource.register(BinaryRecordsDataSource)
    df = (spark.read.format("binary_records")
          .option("path", "/data/*.bin").option("record_bytes", 3073)
          .load())
"""

from __future__ import annotations

import glob as _glob
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)


@dataclass
class _RecordRange(InputPartition):
    path: str
    start_rec: int  # global record index of the first record in range
    file_rec0: int  # global record index of the file's first record
    n_recs: int


class BinaryRecordsReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("binary_records requires option 'path'")
        self.record_bytes = int(options.get("record_bytes", 0))
        if self.record_bytes <= 0:
            raise ValueError("binary_records requires option 'record_bytes' > 0")
        self.partition_records = int(options.get("partition_records", 65536))
        # pushed bounds on record_idx: half-open [lo, hi)
        self.lo = 0
        self.hi: int | None = None

    def pushFilters(self, filters: list[Filter]):
        for f in filters:
            # ColumnPath is a tuple of name parts; simple column => len 1
            attr = getattr(f, "attribute", ())
            if tuple(attr) != ("record_idx",):
                yield f
                continue
            if isinstance(f, EqualTo):
                v = int(f.value)
                self.lo = max(self.lo, v)
                self.hi = v + 1 if self.hi is None else min(self.hi, v + 1)
            elif isinstance(f, GreaterThan):
                self.lo = max(self.lo, int(f.value) + 1)
            elif isinstance(f, GreaterThanOrEqual):
                self.lo = max(self.lo, int(f.value))
            elif isinstance(f, LessThan):
                self.hi = (
                    int(f.value) if self.hi is None else min(self.hi, int(f.value))
                )
            elif isinstance(f, LessThanOrEqual):
                v = int(f.value) + 1
                self.hi = v if self.hi is None else min(self.hi, v)
            else:
                yield f  # unsupported shape: Spark evaluates it post-scan

    def partitions(self):
        paths = sorted(_glob.glob(self.path)) or [self.path]
        parts: list[_RecordRange] = []
        rec0 = 0
        for p in paths:
            n = os.path.getsize(p) // self.record_bytes
            # intersect the file's [rec0, rec0+n) with pushed [lo, hi)
            lo = max(rec0, self.lo)
            hi = rec0 + n if self.hi is None else min(rec0 + n, self.hi)
            r = lo
            while r < hi:
                cnt = min(self.partition_records, hi - r)
                parts.append(_RecordRange(p, r, rec0, cnt))
                r += cnt
            rec0 += n
        # zero matching ranges: one empty partition keeps the scan valid
        return parts or [_RecordRange(paths[0], 0, 0, 0)]

    def read(self, part: _RecordRange):
        if part.n_recs <= 0:
            return
        rb = self.record_bytes
        with open(part.path, "rb") as f:
            f.seek((part.start_rec - part.file_rec0) * rb)
            for i in range(part.n_recs):
                rec = f.read(rb)
                if len(rec) < rb:
                    break
                yield (part.path, part.start_rec + i, rec)


class BinaryRecordsStreamReader(DataSourceStreamReader):
    """Streaming twin: micro-batches over a GROWING directory of record
    files. The offset is the count of (sorted) files already ingested —
    deterministic and replayable: ``partitions(start, end)`` plans the
    files in [start, end) as record-range partitions read ON EXECUTORS
    (this is the scalable DataSourceStreamReader, not the driver-only
    Simple variant), so a checkpointed restart re-plans exactly the same
    files. Records of one file share its micro-batch; new files form the
    next batch."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("binary_records requires option 'path'")
        self.record_bytes = int(options.get("record_bytes", 0))
        if self.record_bytes <= 0:
            raise ValueError("binary_records requires option 'record_bytes' > 0")
        self.partition_records = int(options.get("partition_records", 65536))

    def _files(self) -> list[str]:
        return sorted(_glob.glob(self.path))

    def initialOffset(self) -> dict:
        return {"n_files": 0}

    def latestOffset(self) -> dict:
        return {"n_files": len(self._files())}

    def partitions(self, start: dict, end: dict):
        parts: list[_RecordRange] = []
        files = self._files()
        rec0 = 0
        for i, p in enumerate(files[: end["n_files"]]):
            n = os.path.getsize(p) // self.record_bytes
            if i >= start["n_files"]:
                r = rec0
                while r < rec0 + n:
                    cnt = min(self.partition_records, rec0 + n - r)
                    parts.append(_RecordRange(p, r, rec0, cnt))
                    r += cnt
            rec0 += n
        return parts or [_RecordRange(self.path, 0, 0, 0)]

    def read(self, part: _RecordRange):
        yield from BinaryRecordsReader.read(self, part)  # same range logic

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: files are immutable once listed


@dataclass
class _WroteFile(WriterCommitMessage):
    path: str
    n_recs: int


class BinaryRecordsWriter(DataSourceWriter):
    """Custom sink: each task streams its rows' ``record`` payloads into
    one fixed-record-length part file (task-temp name, content written
    executor-side), and the driver-side ``commit`` atomically renames
    the temp files into place only when EVERY task succeeded — the
    standard two-phase commit that makes a 1000-task write all-or-
    nothing; ``abort`` removes the temps."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("binary_records requires option 'path'")
        self.record_bytes = int(options.get("record_bytes", 0))
        if self.record_bytes <= 0:
            raise ValueError("binary_records requires option 'record_bytes' > 0")
        self.overwrite = overwrite

    def write(self, rows) -> _WroteFile:
        import uuid

        from pyspark import TaskContext

        tc = TaskContext.get()
        pid = tc.partitionId() if tc else 0
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"._tmp-{pid:05d}-{uuid.uuid4().hex}.bin")
        n = 0
        with open(tmp, "wb") as f:
            for row in rows:
                rec = bytes(row["record"])
                if len(rec) != self.record_bytes:
                    raise ValueError(
                        f"record length {len(rec)} != record_bytes "
                        f"{self.record_bytes}"
                    )
                f.write(rec)
                n += 1
        return _WroteFile(tmp, n)

    def commit(self, messages) -> None:
        if self.overwrite:
            for old in _glob.glob(os.path.join(self.path, "part-*.bin")):
                os.remove(old)
            base = 0
        else:
            # Append must never clobber previously committed part files:
            # start numbering past the highest existing index.
            existing = _glob.glob(os.path.join(self.path, "part-*.bin"))
            base = max(
                (
                    int(os.path.basename(p)[len("part-"):-len(".bin")]) + 1
                    for p in existing
                ),
                default=0,
            )
        for i, m in enumerate(sorted(
            (m for m in messages if m is not None), key=lambda m: m.path
        )):
            os.replace(m.path, os.path.join(self.path, f"part-{base + i:05d}.bin"))

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class BinaryRecordsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "binary_records"

    def schema(self) -> StructType:
        return StructType(
            [
                StructField("file", StringType()),
                StructField("record_idx", LongType()),
                StructField("record", BinaryType()),
            ]
        )

    def reader(self, schema: StructType) -> DataSourceReader:
        return BinaryRecordsReader(self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return BinaryRecordsStreamReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        if "record" not in schema.fieldNames():
            raise ValueError("binary_records writer needs a 'record' column")
        return BinaryRecordsWriter(self.options, overwrite)


def register_binary_records(spark) -> None:
    """Idempotent registration of the custom source on a session.
    Python-source filter pushdown ships behind a conf (Spark 4.1) —
    enable it, else implementing pushFilters is an error."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(BinaryRecordsDataSource)
