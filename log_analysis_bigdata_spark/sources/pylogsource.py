"""Custom Spark data source for raw HDFS-log dumps (Python Data Source
API, Spark 4).

The reference ingests its raw LogHub dump by pointing a text reader at
the file and regex-parsing afterwards (`prepare_data_batch.ipynb` cell
14). That works because HDFS.log is newline-delimited; formats Spark has
no native reader for (multi-line records, session markers, proprietary
framing) historically forced driver-side preprocessing. Spark 4's
Python Data Source API removes that cliff: this module registers a
first-class ``spark.read.format("hdfslog")`` source that

- lists the input files ONCE on the driver (metadata only),
- creates one InputPartition per file — executors read files in
  parallel, the same parallelism contract as the native text source,
- yields (value, src_file, line_no) rows, so parse errors are
  attributable to an exact file:line — provenance the plain text
  reader drops (its ``input_file_name()`` has no line number).

The Python reader runs in the executors' Python workers with Arrow
transfer — the sanctioned slow path. For plain newline logs the native
text source is still the right choice (JVM-side, ~10× less overhead);
this source earns its cost exactly when the format needs custom framing
logic, which is the case it exists for. Downstream, the rows feed the
same ``functions.logparse.parse_log_lines`` as every other ingest path.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

LOG_SOURCE_SCHEMA = "value string, src_file string, line_no int"


class HdfsLogDataSource(DataSource):
    """``spark.read.format("hdfslog").load(path)``: raw log lines with
    file + line-number provenance. Options: ``path`` (file or dir),
    ``suffix`` (default ``.log``, dir listing filter).

    Also usable as ``spark.readStream.format("hdfslog")`` — the stream
    reader TAILS the files: each micro-batch delivers only lines
    appended since the last committed offset (a per-file line-count
    dict), exactly-once across restarts via the checkpointed offset log.
    This is the engine twin of the reference's producer loop, which
    tails the raw log and pushes increments to Kafka
    (kafka_producer.py) — here the tail IS the source, no broker hop.
    """

    @classmethod
    def name(cls) -> str:
        return "hdfslog"

    def schema(self) -> str:
        return LOG_SOURCE_SCHEMA

    def reader(self, schema) -> "HdfsLogReader":
        return HdfsLogReader(self.options)

    def simpleStreamReader(self, schema) -> "HdfsLogStreamReader":
        return HdfsLogStreamReader(self.options)


class HdfsLogReader(DataSourceReader):
    def __init__(self, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("hdfslog: 'path' option is required")
        self._suffix = options.get("suffix", ".log")
        if os.path.isdir(path):
            self._files = sorted(
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith(self._suffix)
            )
        else:
            self._files = [path]

    def partitions(self) -> list[InputPartition]:
        # one partition per file: the driver ships only the path string;
        # each executor task streams its own file. For the multi-GB
        # single-file case, extend value to (path, start, end) byte
        # ranges — the framing logic below is the only part that changes.
        return [InputPartition(f) for f in self._files]

    def read(self, partition: InputPartition):
        path = partition.value
        with open(path, "r", encoding="utf-8", errors="replace") as fh:
            for i, line in enumerate(fh, start=1):
                line = line.rstrip("\n")
                if line:
                    yield (line, path, i)


class HdfsLogStreamReader(SimpleDataSourceStreamReader):
    """Tail-follow stream over a directory of log files.

    Offset = ``{file_path: lines_already_delivered}``. Each trigger
    lists the directory (new files appear with count 0), reads every
    file's lines PAST its offset, and returns (rows, next_offset).
    Spark checkpoints the offsets, so a restarted query resumes exactly
    after the last committed line — at-least-once delivery upgraded to
    exactly-once by the offset log, with no broker in the path.

    The Simple reader variant is deliberate: it reads on the driver and
    is documented for low-throughput sources. A production tail over
    thousands of hot files wants the partitioned DataSourceStreamReader
    (offsets per file-range, executors read in parallel) — same offset
    model, listed as the scale path; the semantics tested here (tail,
    restart-resume, blank-line skip) are identical.
    """

    def __init__(self, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("hdfslog: 'path' option is required")
        self._dir = path
        self._suffix = options.get("suffix", ".log")

    def _list_files(self) -> list[str]:
        if os.path.isdir(self._dir):
            return sorted(
                os.path.join(self._dir, f)
                for f in os.listdir(self._dir)
                if f.endswith(self._suffix)
            )
        return [self._dir]

    # Offset value per file: [generation, lines_delivered]. The
    # generation bumps when rotation/truncation is detected (current
    # line count < committed count), so offsets stay MONOTONE across a
    # rotation — resetting the raw line count alone would make the end
    # offset sort below the start offset, and readBetweenOffsets-based
    # recovery would replay that batch as empty, silently dropping the
    # rows the original batch delivered. Legacy plain-int offsets (from
    # pre-generation checkpoints) parse as generation 0.
    @staticmethod
    def _parse(v) -> tuple[int, int]:
        if isinstance(v, (list, tuple)):
            return int(v[0]), int(v[1])
        return 0, int(v)

    def initialOffset(self) -> dict:
        # start of history: nothing delivered from any current file
        return {f: [0, 0] for f in self._list_files()}

    def read(self, start: dict):
        current = self._list_files()
        rows = []
        # offsets for deleted files are pruned (ADVICE r5): building
        # `end` from `current` only keeps the dict from growing without
        # bound across rotations
        end = {}
        for path in current:
            gen, done = self._parse(start.get(path, 0))
            # ONE pass delivers and counts together (a separate counting
            # pass would double tailer I/O, and lines appended between
            # two passes would be delivered without being counted —
            # duplicate delivery on the next trigger)
            n = 0
            deliver = []
            try:
                fh = open(path, "r", encoding="utf-8", errors="replace")
            except FileNotFoundError:
                # deleted between the directory listing and the open —
                # skip it this batch; omitting it from `end` prunes its
                # offset, the same path a pre-listing delete takes
                continue
            except OSError:
                # transient open failure (EACCES/EMFILE/...): the file
                # still exists, so carry the committed offset forward
                # unchanged. Pruning it here would treat a blip as a
                # deletion and re-deliver the whole file from line 1 on
                # the next successful batch (ADVICE r6).
                end[path] = [gen, done]
                continue
            with fh:
                for i, line in enumerate(fh, start=1):
                    n = i
                    if i > done:
                        line = line.rstrip("\n")
                        if line:
                            deliver.append((line, path, i))
            if n < done:
                # rotation/truncation: the file was recreated with fewer
                # lines than committed. New generation; deliver the new
                # file's content from line 1 (second pass, rotation-only),
                # capped at the first pass's count so a concurrent append
                # can't slip uncounted rows into this batch. A recreated
                # file that is already LONGER than the old offset is
                # indistinguishable from appends under line-count offsets
                # — documented limitation of broker-less tailing.
                gen += 1
                deliver = []
                with open(path, "r", encoding="utf-8", errors="replace") as fh:
                    for i, line in enumerate(fh, start=1):
                        if i > n:
                            break
                        line = line.rstrip("\n")
                        if line:
                            deliver.append((line, path, i))
            rows.extend(deliver)
            end[path] = [gen, n]
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic replay for recovery: re-read each file's
        # (start, end] line window; a generation bump inside the batch
        # means the window restarts at line 1 of the recreated file
        rows = []
        for path, e in end.items():
            egen, hi = self._parse(e)
            sgen, lo = self._parse(start.get(path, 0))
            if egen > sgen:
                lo = 0
            if hi <= lo or not os.path.exists(path):
                continue
            with open(path, "r", encoding="utf-8", errors="replace") as fh:
                for i, line in enumerate(fh, start=1):
                    if i <= lo or i > hi:
                        continue
                    line = line.rstrip("\n")
                    if line:
                        rows.append((line, path, i))
        return iter(rows)
