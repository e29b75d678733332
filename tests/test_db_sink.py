"""DBAPI sink round-trip (reference `database_postgres.py:10-83` writes
cleaned frames to Postgres in 1000-row chunks; here the same chunked
executemany append runs per-partition through sqlite3 — the PEP-249
driver available in-image — and is verified by reading the rows back)."""

import sqlite3

from pyspark.sql import functions as F

from light_etl_windows_container_poc_spark.sinks import write_dbapi


def test_write_dbapi_round_trip(spark, tmp_path):
    db = str(tmp_path / "wh.db")
    with sqlite3.connect(db) as conn:
        conn.execute("CREATE TABLE dim_users (user_id INTEGER, name TEXT)")

    df = (spark.range(0, 500)
          .select(F.col("id").alias("user_id"),
                  F.concat(F.lit("u"), F.col("id")).alias("name"))
          .repartition(4))

    def connect(db_path=db):
        # generous timeout: concurrent partitions serialize on sqlite's
        # single-writer lock (Postgres has no such constraint)
        return sqlite3.connect(db_path, timeout=60)

    write_dbapi(df, connect, "dim_users", batch_size=100)

    with sqlite3.connect(db) as conn:
        n, lo, hi = conn.execute(
            "SELECT count(*), min(user_id), max(user_id) FROM dim_users"
        ).fetchone()
        sample = conn.execute(
            "SELECT name FROM dim_users WHERE user_id = 42").fetchone()
    assert (n, lo, hi) == (500, 0, 499)
    assert sample == ("u42",)


def test_write_dbapi_appends(spark, tmp_path):
    db = str(tmp_path / "append.db")
    with sqlite3.connect(db) as conn:
        conn.execute("CREATE TABLE t (x INTEGER)")

    def connect(db_path=db):
        return sqlite3.connect(db_path, timeout=60)

    small = spark.range(0, 10).select(F.col("id").alias("x")).coalesce(1)
    write_dbapi(small, connect, "t")
    write_dbapi(small, connect, "t")   # append-always contract
    with sqlite3.connect(db) as conn:
        assert conn.execute("SELECT count(*) FROM t").fetchone() == (20,)


def test_write_jdbc_derby_round_trip(spark, tmp_path):
    """REAL JDBC round trip: the image ships Apache Derby's embedded
    driver on Spark's classpath, so write_jdbc exercises the actual
    Spark JDBC write path (table auto-create on append + batched insert)
    against a real SQL database, then reads the rows back via the JDBC
    source — the closest in-image analog to the reference's Postgres
    append (database_postgres.py:10-44)."""
    from light_etl_windows_container_poc_spark.sinks import write_jdbc

    url = f"jdbc:derby:{tmp_path}/derbydb;create=true"
    driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    df = (spark.range(0, 300)
          .select(F.col("id").alias("user_id"),
                  F.concat(F.lit("u"), F.col("id")).alias("name"),
                  (F.col("id") * 1.5).alias("score"))
          .repartition(3))
    write_jdbc(df, url, "dim_users", mode="append", driver=driver)
    write_jdbc(df.limit(10), url, "dim_users", mode="append", driver=driver)

    back = (spark.read.format("jdbc").option("url", url)
            .option("dbtable", "dim_users").option("driver", driver).load())
    assert back.count() == 310
    row = back.filter(F.col("user_id") == 42).collect()[0]
    assert (row.name, row.score) == ("u42", 63.0)


def test_streaming_dbapi_sink_appends_and_dedups_replays(
        spark, sf_dir, tmp_path):
    """Micro-batches stream into sqlite; a replayed (stream_key,
    batch_id) is suppressed by the marker, while a DIFFERENT stream
    writing the same table is NOT mistaken for a replay."""
    import functools

    from light_etl_windows_container_poc_spark.queries.streaming_q import \
        _events_stream
    from light_etl_windows_container_poc_spark.streaming.sinks import (
        dbapi_stream_sink, start_dbapi_stream)

    db = str(tmp_path / "stream.db")
    with sqlite3.connect(db) as conn:
        conn.execute("CREATE TABLE ev (user_id INTEGER, value REAL)")
    factory = functools.partial(sqlite3.connect, db, timeout=30)

    stream = _events_stream(spark, sf_dir).select("user_id", "value")
    q = start_dbapi_stream(stream, factory, "ev",
                           checkpoint_dir=str(tmp_path / "ck_a"))
    q.awaitTermination(300)

    from light_etl_windows_container_poc_spark.catalog import load_tables
    n = load_tables(spark, sf_dir, ("events",))["events"].count()
    with sqlite3.connect(db) as conn:
        got = conn.execute("SELECT count(*) FROM ev").fetchone()[0]
        marked = conn.execute(
            "SELECT count(*) FROM ev__batches").fetchone()[0]
    assert got == n and marked >= 1

    # recovery replay: the SAME (stream_key, batch_id) arrives again -> the
    # marker suppresses the duplicate write
    batch = load_tables(spark, sf_dir, ("events",))["events"] \
        .select("user_id", "value").limit(50)
    sink = dbapi_stream_sink(factory, "ev",
                             stream_key=str(tmp_path / "ck_a"))
    sink(batch, 0)  # batch 0 of ck_a already committed by the stream
    with sqlite3.connect(db) as conn:
        assert conn.execute("SELECT count(*) FROM ev").fetchone()[0] == n

    # a DIFFERENT stream identity reusing batch id 0 is NOT a replay:
    # its rows must land (the bare-batch-id collision bug)
    other = dbapi_stream_sink(factory, "ev", stream_key="other-stream")
    other(batch, 0)
    with sqlite3.connect(db) as conn:
        assert conn.execute("SELECT count(*) FROM ev").fetchone()[0] == n + 50
