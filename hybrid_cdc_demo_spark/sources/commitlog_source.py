"""First-class ``format("commitlog")`` source via the Python
DataSource API (Spark 4): the reference's length-prefixed commitlog as
a REGISTERED Spark source, batch and streaming.

What this adds over the binaryFile + mapInPandas path
(sources/commitlog.py): the binaryFile file source treats segment
files as immutable — a file is read once, whole, and a segment still
being APPENDED to is never revisited. The reference's reader instead
tails growing files from a persisted ``(commitlog_file,
byte_position)`` offset (src/cdc/reader.py:81-98, 132-201;
src/models/offset.py:20-48). This stream reader reproduces exactly
that: its streaming offset IS a ``{file: frame-aligned byte
position}`` map, so a segment that grows between triggers is resumed
MID-FILE at the last complete frame boundary, and the truncated tail
of an in-progress write is never emitted (reader.py:167-175).

Scale posture: the unit of read parallelism is the segment file slice
(one InputPartition per grown file region — executors read only
deltas); the driver's per-trigger work is walking frame headers over
each file's appended tail only (cached alignment, no re-scan of
consumed bytes), which mirrors the reference's poll loop and is
O(new bytes) per trigger. At 100 TB the same shape holds because
commitlog segments are bounded (Cassandra rolls them at a fixed
size); a writer-maintained footer index could replace the tail walk
entirely.
"""

from __future__ import annotations

import glob as _glob
import os
import struct
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from hybrid_cdc_demo_spark.sources.commitlog import FRAME_SCHEMA, _split_frames

_COLUMNS = [f.name for f in FRAME_SCHEMA.fields]


def _frame_rows(content: bytes, path: str, base: int) -> Iterator[tuple]:
    """_split_frames over a slice that starts at frame offset ``base``
    within ``path``; emits tuples in FRAME_SCHEMA column order with
    ABSOLUTE byte positions."""
    for rec in _split_frames(content, path):
        rec["byte_position"] += base
        yield tuple(rec[c] for c in _COLUMNS)


def _aligned_end(path: str, start: int) -> int:
    """Frame-aligned end of ``path``: the byte position just past the
    last COMPLETE frame, walking headers from ``start`` (which must
    itself be frame-aligned). Only the [start, EOF) delta is read."""
    size = os.path.getsize(path)
    if size <= start:
        return start
    with open(path, "rb") as fh:
        fh.seek(start)
        delta = fh.read(size - start)
    pos = 0
    n = len(delta)
    while pos + 4 <= n:
        (length,) = struct.unpack(">I", delta[pos : pos + 4])
        if pos + 4 + length > n:
            break  # truncated tail — writer still appending
        pos += 4 + length
    return start + pos


def _segment_files(options: dict) -> list[str]:
    path = options.get("path")
    if not path:
        raise ValueError("commitlog source requires a path: .load(<dir>)")
    pattern = options.get("pathGlobFilter", "*.log")
    return sorted(_glob.glob(os.path.join(path, pattern)))


class CommitlogPartition(InputPartition):
    def __init__(self, path: str, lo: int, hi: int):
        self.path = path
        self.lo = lo
        self.hi = hi


class CommitlogBatchReader(DataSourceReader):
    """One partition per segment file (the reference's natural unit of
    parallelism); truncated tails tolerated per file."""

    def __init__(self, options: dict):
        self.files = _segment_files(options)

    def partitions(self) -> Sequence[InputPartition]:
        return [
            CommitlogPartition(f, 0, os.path.getsize(f)) for f in self.files
        ] or [CommitlogPartition("", 0, 0)]

    def read(self, part: CommitlogPartition) -> Iterator[tuple]:
        if not part.path or part.hi <= part.lo:
            return
        with open(part.path, "rb") as fh:
            fh.seek(part.lo)
            content = fh.read(part.hi - part.lo)
        yield from _frame_rows(content, part.path, part.lo)


class CommitlogStreamReader(DataSourceStreamReader):
    """Streaming offsets = ``{file: frame-aligned position}`` — the
    reference's (file, position) resume coordinates as the source's
    native offset type. Growing files are re-polled and resumed
    mid-file; new files join the map at 0."""

    def __init__(self, options: dict):
        self.options = options
        self._aligned: dict[str, int] = {}  # per-run tail-walk cache

    def initialOffset(self) -> dict:
        return {}

    def latestOffset(self) -> dict:
        for f in _segment_files(self.options):
            # retention may delete a segment between the glob and the
            # stat/tail-walk; a vanished file keeps its last known
            # offset (read() already tolerates missing files) instead
            # of failing the whole streaming query on the driver
            try:
                known = self._aligned.get(f, 0)
                size = os.path.getsize(f)
                if size > known:
                    self._aligned[f] = _aligned_end(f, known)
                elif f not in self._aligned:
                    self._aligned[f] = 0
            except OSError:
                self._aligned.setdefault(f, 0)
        return dict(self._aligned)

    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[InputPartition]:
        parts = []
        for path, hi in end.items():
            lo = int(start.get(path, 0))
            if hi > lo:
                parts.append(CommitlogPartition(path, lo, int(hi)))
        # the engine requires >= 1 partition per batch
        return parts or [CommitlogPartition("", 0, 0)]

    def read(self, part: CommitlogPartition) -> Iterator[tuple]:
        if not part.path or part.hi <= part.lo:
            return
        # retention may have removed a fully-consumed segment between
        # planning and execution; by alignment, [lo, hi) of a live file
        # holds only complete frames
        if not os.path.exists(part.path):
            return
        with open(part.path, "rb") as fh:
            fh.seek(part.lo)
            content = fh.read(part.hi - part.lo)
        yield from _frame_rows(content, part.path, part.lo)

    def commit(self, end: dict) -> None:
        # offsets are checkpointed by the engine; nothing to persist
        pass


class CommitlogDataSource(DataSource):
    """``spark.read.format("commitlog")`` / ``spark.readStream.format(
    "commitlog")`` after ``spark.dataSource.register(
    CommitlogDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "commitlog"

    def schema(self):
        return FRAME_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return CommitlogBatchReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return CommitlogStreamReader(self.options)


def register_commitlog_source(spark) -> None:
    """Idempotent registration of the commitlog format."""
    spark.dataSource.register(CommitlogDataSource)
