"""Spark 4 Python DataSource API (SPARK-44076) — custom sources and
sinks written in pure Python, registered per-session, running
partition-parallel on executors like any other scan.

Three components, each exercising a different corner of the API:

- ``SyntheticDocsSource`` (batch reader, ``format("synthetic_docs")``):
  a deterministic corpus generator whose every field is an md5-pure
  function of ``doc_id`` — so a DuckDB oracle can REGENERATE the same
  corpus in SQL and cell-check a query over this source end-to-end
  (see ``plans/extension_queries.py::q_scan_python_datasource``). The
  reader implements ``pushFilters``: ``doc_id`` range predicates prune
  whole InputPartitions before generation (real pushdown — the pruned
  partitions are never scheduled), and remaining rows are filtered
  generator-side; unsupported predicates are returned to Spark to
  re-apply, per the API contract.

- ``SyntheticEventsStreamSource`` (streaming reader,
  ``readStream.format("synthetic_events")``): a rate-like
  microbatch source with deterministic offsets (row counters) and
  md5-derived event fields — partition-parallel within each batch via
  the ``partitions(start, end)`` hook.

- ``ShardedJsonlSink`` (batch writer, ``format("jsonl_shards")``):
  one JSONL shard per partition + a ``_MANIFEST`` written only at
  ``commit()`` (task outputs become visible atomically; ``abort()``
  leaves no manifest), demonstrating the commit-protocol side.

The reference's sources are pandas ``read_csv``/``read_sql``
(``dags/music_streaming_etl_dags.py:114-125``) — single-process, no
pushdown, no commit protocol; this is the Spark-4-native counterpart.

Scale notes: generation is embarrassingly parallel (one partition per
id range, zero shuffle); the stream reader's state is a single row
counter; the sink writes are task-local with an O(#partitions) commit.
Python-side generation throughput is the deliberate workload here —
this is a SOURCE, not a transform in the hot path.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

# shared literal vocab/langs — the DuckDB oracle embeds the same lists
VOCAB = [
    "key", "agg", "row", "scan", "slow", "fast", "table", "value",
    "part", "hash", "merge", "batch", "spark", "query", "sort", "window",
]
LANGS = ["en", "de", "es", "fr", "zh"]


def _md5_bucket(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % mod


def doc_fields(doc_id: int) -> tuple[int, str, str]:
    """(doc_id, lang, text) — every field an md5-pure function of the
    id, reproducible in any engine with an md5() builtin."""
    h = hashlib.md5(str(doc_id).encode()).hexdigest()
    lang = LANGS[int(h[:8], 16) % 5]
    n_words = 5 + int(h[8:16], 16) % 20
    words = [
        VOCAB[_md5_bucket(f"{doc_id}:{j}", len(VOCAB))] for j in range(n_words)
    ]
    return doc_id, lang, " ".join(words)


class _DocsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.n_parts = int(options.get("parts", 8))
        self.lo = 0          # tightened by pushed doc_id predicates
        self.hi = self.n
        self.lang_eq: str | None = None

    def pushFilters(self, filters):
        for f in filters:
            if isinstance(f, GreaterThanOrEqual) and f.attribute == ("doc_id",):
                self.lo = max(self.lo, int(f.value))
            elif isinstance(f, GreaterThan) and f.attribute == ("doc_id",):
                self.lo = max(self.lo, int(f.value) + 1)
            elif isinstance(f, LessThan) and f.attribute == ("doc_id",):
                self.hi = min(self.hi, int(f.value))
            elif isinstance(f, LessThanOrEqual) and f.attribute == ("doc_id",):
                self.hi = min(self.hi, int(f.value) + 1)
            elif isinstance(f, EqualTo) and f.attribute == ("lang",):
                self.lang_eq = f.value
            else:
                yield f  # not ours — Spark re-applies it post-scan

    def partitions(self):
        # ranges are computed AFTER pushFilters: a pruned id range
        # yields fewer partitions — pushdown visible in the task count
        step = max(1, (self.n + self.n_parts - 1) // self.n_parts)
        parts = []
        for i in range(self.n_parts):
            lo, hi = i * step, min((i + 1) * step, self.n)
            lo, hi = max(lo, self.lo), min(hi, self.hi)
            if lo < hi:
                parts.append(InputPartition((lo, hi)))
        return parts or [InputPartition((0, 0))]

    def read(self, part):
        lo, hi = part.value
        for i in range(lo, hi):
            did, lang, text = doc_fields(i)
            if self.lang_eq is not None and lang != self.lang_eq:
                continue
            yield (did, lang, text)


class SyntheticDocsSource(DataSource):
    @classmethod
    def name(cls):
        return "synthetic_docs"

    def schema(self):
        return "doc_id bigint, lang string, text string"

    def reader(self, schema):
        return _DocsReader(self.options)


def event_fields(i: int) -> tuple[int, int, str]:
    """(event_id, user_id, event_type) for global row index i."""
    return (
        i,
        _md5_bucket(f"u{i}", 50),
        ["view", "click", "purchase"][_md5_bucket(f"t{i}", 3)],
    )


@dataclass
class _RowOffset:
    row: int


class _EventsStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.rows_per_batch = int(options.get("rowsPerBatch", 100))
        self.n_parts = int(options.get("parts", 4))
        self._latest = 0

    def initialOffset(self):
        return {"row": 0}

    def latestOffset(self):
        self._latest += self.rows_per_batch
        return {"row": self._latest}

    def partitions(self, start, end):
        lo, hi = start["row"], end["row"]
        step = max(1, (hi - lo + self.n_parts - 1) // self.n_parts)
        return [
            InputPartition((max(lo, lo + i * step), min(hi, lo + (i + 1) * step)))
            for i in range(self.n_parts)
            if lo + i * step < hi
        ]

    def read(self, part):
        lo, hi = part.value
        for i in range(lo, hi):
            yield event_fields(i)

    def commit(self, end):
        pass  # offsets are pure row counters — nothing to release


class SyntheticEventsStreamSource(DataSource):
    @classmethod
    def name(cls):
        return "synthetic_events"

    def schema(self):
        return "event_id bigint, user_id bigint, event_type string"

    def streamReader(self, schema):
        return _EventsStreamReader(self.options)


@dataclass
class _ShardCommit(WriterCommitMessage):
    filename: str
    n_rows: int


class _JsonlShardWriter(DataSourceWriter):
    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        fname = f"part-{pid:05d}.jsonl"
        n = 0
        with open(os.path.join(self.path, fname), "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _ShardCommit(filename=fname, n_rows=n)

    def commit(self, messages):
        manifest = {
            "shards": sorted(
                [{"file": m.filename, "rows": m.n_rows} for m in messages],
                key=lambda s: s["file"],
            ),
            "total_rows": sum(m.n_rows for m in messages),
        }
        with open(os.path.join(self.path, "_MANIFEST"), "w") as fh:
            json.dump(manifest, fh)

    def abort(self, messages):
        # no manifest → readers treat the directory as uncommitted
        pass


class ShardedJsonlSink(DataSource):
    @classmethod
    def name(cls):
        return "jsonl_shards"

    def writer(self, schema, overwrite):
        return _JsonlShardWriter(self.options)


def register_all(spark) -> None:
    """Idempotent per-session registration of all three sources.
    Python-source filter pushdown ships behind a flag in Spark 4.1 —
    a reader implementing ``pushFilters`` refuses to initialize
    without it, so flip it here (runtime-settable, session-scoped)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    for src in (SyntheticDocsSource, SyntheticEventsStreamSource, ShardedJsonlSink):
        spark.dataSource.register(src)
