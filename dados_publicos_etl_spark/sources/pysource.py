"""Custom Python Data Source (Spark 4 DataSource API).

The reference's only "source" beyond files is a driver-side HTTP
download (/root/reference/src/script/scraping.py:23-89 — fetch the
RFB zip, transcode, land as CSV).  That pattern does not scale: one
machine pulls all bytes.  The Spark 4 Python Data Source API is the
idiomatic replacement — a custom source declares its schema and a
PARTITION LIST, and every executor pulls only its slice in parallel,
with the usual source contract (column pruning via the projected
schema, deterministic re-read on task retry).

``SyntheticDocsDataSource`` is the in-container stand-in for such a
feed: a deterministic document generator partitioned into id ranges.
At 100 TB the same shape serves a real paged API / object listing —
``partitions()`` returns page tokens or file ranges instead of id
ranges, and ``read()`` fetches one page per task.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

_WORDS = (
    "data spark etl public cnae receita empresa query scale "
    "shuffle join partition stream batch token text dedup"
).split()


def _doc_text(doc_id: int, n_tokens: int = 24) -> str:
    """Deterministic pseudo-text: token i of doc d indexes _WORDS by a
    multiplicative hash — stable across retries, Python versions, and
    executors (no `random` module state).
    """
    k = len(_WORDS)
    return " ".join(
        _WORDS[((doc_id * 1_000_003 + i) * 2_654_435_761 >> 7) % k]
        for i in range(n_tokens)
    )


@dataclass
class _IdRange(InputPartition):
    start: int
    end: int  # exclusive


class _SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("numrows", 1000))
        self.n_parts = int(options.get("numpartitions", 8))

    def partitions(self):
        # contiguous id ranges -> balanced, splittable, retry-safe
        step = max(1, -(-self.n_rows // self.n_parts))
        return [
            _IdRange(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _IdRange):
        for doc_id in range(partition.start, partition.end):
            yield (
                doc_id,
                _doc_text(doc_id),
                _WORDS[doc_id % 3],  # pseudo "lang" grouping key
            )


class SyntheticDocsDataSource(DataSource):
    """`spark.read.format("synthetic_docs")` after registration."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id long, text string, lang string"

    def reader(self, schema) -> _SyntheticDocsReader:
        return _SyntheticDocsReader(self.options)


# ---------------------------------------------------------------------------
# Writer side — two-phase commit sink (Spark 4 DataSourceWriter API)
# ---------------------------------------------------------------------------


@dataclass
class _PartFile(WriterCommitMessage):
    path: str
    n_rows: int


class _JsonlDirWriter(DataSourceWriter):
    """Task-isolated JSONL writer with driver-side two-phase commit.

    The exactly-once contract every distributed sink needs, in the
    smallest form: each TASK writes to a uuid temp file and reports a
    commit message; only the DRIVER's commit() renames temp files to
    final names (speculative/retried task attempts leave orphan temps
    that abort() removes).  The same shape serves a real external
    system — stage to a transactional upload, commit in one place.
    At scale the payload write is object-store multipart, and commit
    publishes a manifest.
    """

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_dir sink requires a path option")

    def write(self, rows):
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"_tmp-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w") as fh:
            for row in rows:
                fh.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _PartFile(path=tmp, n_rows=n)

    def commit(self, messages):
        for i, m in enumerate(messages):
            final = os.path.join(
                os.path.dirname(m.path), f"part-{i:05d}.jsonl"
            )
            os.replace(m.path, final)

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class JsonlDirDataSource(DataSource):
    """`df.write.format("jsonl_dir").option("path", d).save()` after
    registration — a minimal exactly-once custom Python sink."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_dir"

    def schema(self) -> str:  # pragma: no cover - reader not supported
        return "value string"

    def writer(self, schema, overwrite: bool) -> _JsonlDirWriter:
        return _JsonlDirWriter(self.options)


# ---------------------------------------------------------------------------
# Streaming side — offset-tracked custom stream source (Spark 4
# SimpleDataSourceStreamReader API)
# ---------------------------------------------------------------------------


class _SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Offset-based micro-batch reader over the deterministic event
    generator.

    The streaming source contract in its smallest honest form:

    - ``initialOffset`` anchors the stream;
    - ``read(start)`` returns (rows, end_offset) — one micro-batch of
      at most ``batchsize`` rows, advancing the offset;
    - ``readBetweenOffsets(start, end)`` REPLAYS a committed range
      deterministically, which is what makes recovery-from-checkpoint
      exactly-once (Spark re-reads the last uncommitted batch by
      offset range after a restart).

    A real feed (Kafka-like log, paged HTTP API, CDC slot) swaps the
    generator for client calls keyed on the same offset dict; the
    bounded ``numrows`` here makes the stream finite so
    processAllAvailable terminates in tests.
    """

    def __init__(self, options):
        self.n_rows = int(options.get("numrows", 100))
        self.batch = int(options.get("batchsize", 25))

    def initialOffset(self):
        return {"next": 0}

    def read(self, start):
        i = int(start["next"])
        end = min(i + self.batch, self.n_rows)
        return (self._rows(i, end), {"next": end})

    def readBetweenOffsets(self, start, end):
        return self._rows(int(start["next"]), int(end["next"]))

    def _rows(self, i, end):
        return iter(
            [
                (
                    x,
                    _doc_text(x, n_tokens=6),
                    ((x * 2_654_435_761) % 1000) / 10.0,
                )
                for x in range(i, end)
            ]
        )


class SyntheticEventsStreamSource(DataSource):
    """`spark.readStream.format("synthetic_events_stream")` after
    registration — a custom Python STREAMING source with offsets."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events_stream"

    def schema(self) -> str:
        return "event_id long, payload string, value double"

    def simpleStreamReader(self, schema) -> _SyntheticEventsStreamReader:
        return _SyntheticEventsStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticDocsDataSource)
    spark.dataSource.register(JsonlDirDataSource)
    spark.dataSource.register(SyntheticEventsStreamSource)
