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


def _aligned_end(
    path: str, start: int, max_bytes: int | None = None, min_one: bool = False
) -> int:
    """Frame-aligned end of ``path``: the byte position just past the
    last COMPLETE frame, walking headers from ``start`` (which must
    itself be frame-aligned). Only the [start, EOF) delta is read.
    ``max_bytes`` caps the walk (admission control): stop before the
    frame that would exceed the budget; ``min_one`` admits the first
    frame regardless so an over-budget single frame still makes
    progress (a stalled source is worse than one oversized batch)."""
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
        if (
            max_bytes is not None
            and pos + 4 + length > max_bytes
            and not (min_one and pos == 0)
        ):
            break  # budget exhausted at a frame boundary
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
    mid-file; new files join the map at 0.

    **Admission control** (``maxBytesPerTrigger`` option): the
    reference DECLARES backpressure (``max_in_flight_batches``,
    settings.py:87-89) and never enforces it; here it is enforced at
    the source — each trigger admits at most N frame-aligned bytes
    beyond what previous triggers served, so a cold start over a deep
    backlog (or a burst) becomes a sequence of bounded micro-batches
    instead of one table-sized batch. The Python DataSource API has
    no ReadLimit hook, so the cap lives in ``latestOffset``.

    Restart safety: a fresh reader's capped ``latestOffset`` could
    regress below the query's checkpoint (the API never hands the
    reader its restart offset). ``_floor`` — the running max of every
    ``start`` offset the engine passes to :meth:`partitions` and
    every committed ``end`` — clamps both the served cursor and each
    partition's ``lo``, so a transiently regressed offset window can
    never re-emit frames that an earlier run already delivered."""

    def __init__(self, options: dict):
        self.options = options
        self._aligned: dict[str, int] = {}  # per-run tail-walk cache
        mb = options.get("maxBytesPerTrigger")
        self._max_bytes = int(mb) if mb is not None else None
        #: frame-aligned positions handed out by latestOffset so far
        self._served: dict[str, int] = {}
        #: monotone floor learned from engine-provided offsets
        self._floor: dict[str, int] = {}
        #: the FIRST poll of a run serves the full backlog uncapped:
        #: Trigger.AvailableNow latches one latestOffset() as its
        #: terminal target (the engine never re-polls), so a capped
        #: first answer would silently END the run with data left on
        #: disk — partial drain is a completeness bug, an oversized
        #: first batch is only a sizing one. Continuous triggers get
        #: the cap from the second poll onward.
        self._first_poll = True

    def initialOffset(self) -> dict:
        return {}

    def _refresh_aligned(self) -> None:
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

    def latestOffset(self) -> dict:
        self._refresh_aligned()
        first, self._first_poll = self._first_poll, False
        if self._max_bytes is None or first:
            self._served = dict(self._aligned)
            return dict(self._aligned)
        for f, v in self._floor.items():
            if self._served.get(f, 0) < v:
                self._served[f] = v
        budget = self._max_bytes
        out = dict(self._served)
        for f in sorted(self._aligned):
            cur = out.get(f, 0)
            out[f] = cur  # every known file stays in the offset map
            avail = self._aligned[f] - cur
            if avail <= 0 or budget <= 0:
                continue
            if avail <= budget:
                out[f] = self._aligned[f]
                budget -= avail
            else:
                try:
                    hi = _aligned_end(f, cur, max_bytes=budget, min_one=True)
                except OSError:
                    continue
                budget -= hi - cur
                out[f] = hi
        self._served = out
        return dict(out)

    def _raise_floor(self, offsets: dict) -> None:
        for f, v in offsets.items():
            v = int(v)
            if self._floor.get(f, 0) < v:
                self._floor[f] = v

    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[InputPartition]:
        self._raise_floor(start)
        parts = []
        for path, hi in end.items():
            lo = max(int(start.get(path, 0)), self._floor.get(path, 0))
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
        # offsets are checkpointed by the engine; remember them as the
        # monotone floor for the admission-control cursor
        self._raise_floor(end)


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
