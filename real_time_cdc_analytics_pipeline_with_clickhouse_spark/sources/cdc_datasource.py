"""``cdc_replay`` — a custom Python DataSource (Spark 4 DataSource API)
carrying the CDC wire contract end-to-end with REAL connector
semantics: batch scans with file-level partitions, a streaming reader
with checkpointable offsets + commit, and a streaming writer with the
task-stage → driver-commit protocol.

The reference consumes Debezium envelopes from Kafka
(EngagementStreamJob ESJ:76-107) and produces rollups back to Kafka
(ESJ:132-150).  The Kafka connector jar is absent in this container
(the gated skip in test_streaming), so the engine's replay analog has
been ``spark.readStream.text`` — correct, but it exercises none of the
SOURCE machinery a connector needs: offset tracking, restart resume,
rate limiting, a commit hook.  This module supplies that machinery
through Spark's public Python DataSource API, so the full
source→unwrap→enrich→sink topology runs against an engine-visible
connector with Kafka-equivalent semantics:

- **offsets** are ``{"n": files_processed, "last": high_water_name}``
  over the SORTED file listing of an append-only feed directory — the
  file analog of a Kafka (partition → next_offset) map.  Offsets live
  in the streaming checkpoint, so a restarted query resumes exactly
  where the last committed trigger ended (tested).
- **scale shape**: the driver only LISTS the directory per trigger
  (O(#files), no content I/O); each new file becomes one
  ``InputPartition`` and executors read the bytes.  This is the same
  division of labor as Kafka's driver-side offset planning +
  executor-side fetch.
- **append-only contract, enforced loudly**: feed files must sort
  AFTER the high-water mark (zero-padded batch ids do this naturally).
  A name sorting below the mark means an out-of-band rewrite — the
  reader raises instead of silently skipping or double-reading it.
- **rate limiting**: ``maxFilesPerTrigger`` caps each micro-batch,
  the file analog of Kafka's ``maxOffsetsPerTrigger`` backpressure.
- **writer commit protocol**: tasks stage ``part-*`` files in a
  ``_staging`` dir and report them in commit messages; the driver
  renames them into place and drops a ``_batch-<id>`` manifest —
  a replayed micro-batch (same epoch after failure) sees its manifest
  and commits nothing, giving the same replay idempotence as the
  warehouse sink's epoch markers (tested).

Rows carry ``(value, _source_file, _line)`` — the payload plus
Kafka-metadata-column-style provenance; downstream consumes
``value`` exactly as it would from the Kafka source.
"""

from __future__ import annotations

import os
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    InputPartition,
    WriterCommitMessage,
)

SCHEMA = "value string, _source_file string, _line int"


def _list_feed_files(path: str) -> list[str]:
    """Sorted basenames of data files (hidden/underscore files are
    sink-metadata, not feed data)."""
    if not os.path.isdir(path):
        return []
    return sorted(
        f
        for f in os.listdir(path)
        if not f.startswith(("_", "."))
        and os.path.isfile(os.path.join(path, f))
    )


class _FilePartition(InputPartition):
    def __init__(self, path: str, name: str):
        self.path = path
        self.name = name


def _read_file(path: str, name: str) -> Iterator[tuple]:
    with open(os.path.join(path, name), "r", encoding="utf-8") as fh:
        for i, line in enumerate(fh):
            line = line.rstrip("\n")
            if line:
                yield (line, name, i)


class CDCReplayBatchReader(DataSourceReader):
    """Batch scan: one partition per feed file — executor-side reads,
    driver-side listing only."""

    def __init__(self, options):
        self.path = options["path"]

    def partitions(self) -> Sequence[InputPartition]:
        return [_FilePartition(self.path, n) for n in _list_feed_files(self.path)]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        return _read_file(partition.path, partition.name)


class CDCReplayStreamReader(DataSourceStreamReader):
    """Streaming source with Kafka-shaped offset semantics (see module
    docstring)."""

    def __init__(self, options):
        self.path = options["path"]
        self.max_files = int(options.get("maxfilespertrigger", 0)) or None
        # high-water mark of every offset this reader has SEEN — raised
        # by our own latestOffset answers, by planned batches
        # (partitions) and by commits.  latestOffset must never answer
        # below it: a fresh reader after restart knows nothing, and a
        # rate-limited answer below the checkpointed start would
        # REGRESS the offset log and re-deliver files (caught by
        # test_restart_with_rate_limit_never_duplicates).
        self._floor = 0

    def initialOffset(self) -> dict:
        return {"n": 0, "last": ""}

    def _check_monotonic(self, files: list[str], offset: dict) -> None:
        n, last = offset["n"], offset["last"]
        if n > 0 and (len(files) < n or files[n - 1] != last):
            raise RuntimeError(
                f"cdc_replay feed at {self.path} violated the append-only "
                f"sorted-name contract: expected file #{n} to be {last!r}, "
                f"listing has {files[n - 1] if len(files) >= n else 'fewer files'!r}. "
                "Feed writers must only ADD files that sort after the "
                "high-water mark (use zero-padded batch ids)."
            )

    def latestOffset(self) -> dict:
        files = _list_feed_files(self.path)
        if len(files) < self._floor:
            # files below the already-seen mark were deleted (janitor
            # overreach) — fail with the contract error, not the
            # IndexError the floor clamp below would otherwise hit
            raise RuntimeError(
                f"cdc_replay feed at {self.path} lost files below the "
                f"committed high-water mark: {self._floor} offsets are "
                f"checkpointed but only {len(files)} files remain. "
                "Retention must keep every file at or above the last "
                "commit; restore the files or re-baseline with a fresh "
                "checkpoint."
            )
        end = len(files)
        if self.max_files is not None:
            end = min(end, self._floor + self.max_files)
        end = max(end, self._floor)  # never move backwards
        self._floor = end
        return {"n": end, "last": files[end - 1] if end else ""}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        files = _list_feed_files(self.path)
        self._check_monotonic(files, start)
        self._check_monotonic(files, end)
        # a planned batch proves the checkpoint reached end — a fresh
        # reader (restart) learns the true high-water mark here before
        # its first rate-limited latestOffset answer
        self._floor = max(self._floor, start["n"], end["n"])
        return [_FilePartition(self.path, n) for n in files[start["n"] : end["n"]]]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        return _read_file(partition.path, partition.name)

    def commit(self, end: dict) -> None:
        # Offsets are durable in the streaming checkpoint; nothing to
        # release source-side (files are the retention story, like
        # Kafka's retention.ms — a janitor MAY delete files below the
        # committed mark, which the sorted-listing check tolerates
        # only via full re-baseline, so default is keep-everything).
        # The committed end also raises the floor — on restart Spark
        # replays the last commit to the fresh reader, seeding the
        # rate-limit high-water mark before the first latestOffset.
        self._floor = max(self._floor, end["n"])


class _StagedFiles(WriterCommitMessage):
    def __init__(self, names):
        self.names = names


class CDCReplayStreamWriter(DataSourceStreamWriter):
    """Outbox-style JSON-lines sink with the two-phase commit shape
    real connectors need: tasks stage, the driver publishes, replayed
    epochs no-op on their manifest."""

    def __init__(self, options):
        self.path = options["path"]
        os.makedirs(os.path.join(self.path, "_staging"), exist_ok=True)

    def write(self, iterator) -> _StagedFiles:
        import uuid

        from pyspark import TaskContext

        ctx = TaskContext.get()
        name = f"part-{ctx.partitionId():05d}-{uuid.uuid4().hex}.jsonl"
        staged = os.path.join(self.path, "_staging", name)
        n = 0
        with open(staged, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(str(row[0]) + "\n")
                n += 1
        if n == 0:
            os.remove(staged)
            return _StagedFiles([])
        return _StagedFiles([name])

    def _manifest(self, batch_id: int) -> str:
        return os.path.join(self.path, f"_batch-{batch_id}")

    def commit(self, messages, batch_id: int) -> None:
        """Two-phase publish where the MANIFEST is the commit point:
        the staged→final mapping is written (atomic rename) BEFORE any
        publish rename, so a crash at any instant leaves one of two
        recoverable states — no manifest (nothing published; the
        replayed epoch commits its own fresh staging from scratch) or
        manifest present (the replayed epoch deterministically FINISHES
        the recorded renames and discards its own re-staged files).
        Publishing before the manifest instead would let a crash
        mid-renames double-publish on replay: the replayed tasks stage
        under fresh uuid names, so the orphaned half-published files
        could never be reconciled with the new attempt's."""
        manifest = self._manifest(batch_id)
        if os.path.exists(manifest):  # replayed epoch: finish + discard
            with open(manifest, encoding="utf-8") as fh:
                recorded = dict(
                    line.split("\t") for line in fh.read().splitlines() if line
                )
            for staged_name, final in recorded.items():
                staged = os.path.join(self.path, "_staging", staged_name)
                if os.path.exists(staged):
                    os.replace(staged, os.path.join(self.path, final))
            for m in messages:
                for name in m.names:
                    if name not in recorded:
                        staged = os.path.join(self.path, "_staging", name)
                        if os.path.exists(staged):
                            os.remove(staged)
            return
        mapping = [
            (name, f"{batch_id:010d}-{name}") for m in messages for name in m.names
        ]
        tmp = manifest + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write("\n".join(f"{a}\t{b}" for a, b in mapping))
        os.replace(tmp, manifest)
        for staged_name, final in mapping:
            os.replace(
                os.path.join(self.path, "_staging", staged_name),
                os.path.join(self.path, final),
            )

    def abort(self, messages, batch_id: int) -> None:
        for m in messages:
            for name in getattr(m, "names", []):
                staged = os.path.join(self.path, "_staging", name)
                if os.path.exists(staged):
                    os.remove(staged)


class CDCReplayDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "cdc_replay"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> CDCReplayBatchReader:
        return CDCReplayBatchReader(self.options)

    def streamReader(self, schema) -> CDCReplayStreamReader:
        return CDCReplayStreamReader(self.options)

    def streamWriter(self, schema, overwrite: bool) -> CDCReplayStreamWriter:
        return CDCReplayStreamWriter(self.options)


def register(spark) -> None:
    """Idempotent session registration; after this,
    ``spark.readStream.format('cdc_replay').option('path', dir)`` and
    the matching ``writeStream.format('cdc_replay')`` work anywhere in
    the session."""
    spark.dataSource.register(CDCReplayDataSource)


def read_cdc_stream(spark, path: str, max_files_per_trigger: int | None = None):
    """The connector-backed replacement for ``read_json_lines_stream``:
    same one-string-``value`` downstream contract, real offsets."""
    register(spark)
    r = spark.readStream.format("cdc_replay").option("path", path)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return r.load()
