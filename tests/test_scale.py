from __future__ import annotations

from pyspark.sql import functions as F

from light_etl_windows_container_poc_spark.catalog import load_tables
from light_etl_windows_container_poc_spark.operators.scale import (
    commit_discovered, compact_files, discover_new_files, salted_join,
    write_bucketed)
from light_etl_windows_container_poc_spark.pipeline import health_check
from light_etl_windows_container_poc_spark.plans import assert_single_shuffle


def test_salted_join_matches_plain_join(spark, sf_dir):
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    li = t["lineitem"].select("l_partkey", "l_quantity")
    part = t["part"].select(F.col("p_partkey").alias("l_partkey"), "p_brand")
    plain = li.join(part, "l_partkey").groupBy("p_brand").count()
    salted = salted_join(li, part, "l_partkey", salt=4) \
        .groupBy("p_brand").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_bucketed_join_skips_shuffle(spark, sf_dir):
    # saveAsTable uses the session's (static) warehouse dir: ./spark-warehouse
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    try:
        write_bucketed(t["orders"].select("o_orderkey", "o_totalprice"),
                       "b_orders", "o_orderkey", num_buckets=4)
        write_bucketed(t["lineitem"].select("l_orderkey", "l_quantity")
                       .withColumnRenamed("l_orderkey", "o_orderkey"),
                       "b_lineitem", "o_orderkey", num_buckets=4)
        joined = (spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
                  .groupBy().sum("l_quantity"))
        # co-bucketed join: no Exchange before the join; only the final agg
        assert_single_shuffle(joined, max_exchanges=1)
        expected = t["lineitem"].groupBy().sum("l_quantity").collect()[0][0]
        assert joined.collect()[0][0] == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_compact_files(spark, tmp_path, sf_dir):
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    frag = str(tmp_path / "fragmented")
    li.repartition(40).write.parquet(frag)   # 40 tiny files
    out = str(tmp_path / "compacted")
    n = compact_files(spark, frag, out, target_mb=128)
    assert n == 1  # tiny data → single output file
    assert spark.read.parquet(out).count() == li.count()


def test_discover_new_files_incremental(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    (d / "a.csv").write_text("x\n1\n")
    (d / "b.csv").write_text("x\n2\n")
    state = str(tmp_path / "state")

    first = discover_new_files(spark, str(d), state)
    assert {p.path.split("/")[-1] for p in first.collect()} == {"a.csv", "b.csv"}
    commit_discovered(first, state)

    # nothing new → empty
    assert discover_new_files(spark, str(d), state).count() == 0

    # new file + modified file are both rediscovered
    (d / "c.csv").write_text("x\n3\n")
    import os, time
    now = time.time() + 5
    (d / "a.csv").write_text("x\n9\n")
    os.utime(d / "a.csv", (now, now))
    again = discover_new_files(spark, str(d), state)
    assert {p.path.split("/")[-1] for p in again.collect()} == {"a.csv", "c.csv"}


def test_health_check(spark, tmp_path, sf_dir):
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    li.limit(5).write.mode("overwrite").parquet(str(tmp_path / "wh" / "ok_table"))
    h = health_check(spark, str(tmp_path / "wh"), ["ok_table", "missing_table"])
    assert h["session_alive"] is True
    assert h["tables"]["ok_table"] == "ok"
    assert h["tables"]["missing_table"].startswith("error")
    assert h["status"] == "degraded"


def test_discover_respects_allowlist_and_skips_empty(spark, tmp_path):
    d = tmp_path / "inbox2"
    d.mkdir()
    (d / "good.csv").write_text("a,b\n1,2\n")
    (d / "sheet.XLSX").write_text("fake")       # allow-list is case-blind
    (d / "notes.txt").write_text("nope")        # not allowed
    (d / "empty.csv").write_text("")            # empty → skipped
    state = str(tmp_path / "state2")
    found = discover_new_files(
        spark, str(d), state, glob="*",
        allowed_extensions=(".csv", ".xlsx", ".xls", ".xlsm", ".xlsb"))
    names = sorted(p.split("/")[-1] for p in
                   [r.path for r in found.collect()])
    assert names == ["good.csv", "sheet.XLSX"]


def test_capped_priority_sample_matches_full_sort(spark, sf_dir):
    """The threshold pre-filtered cap sample must be bit-identical to the
    plain full-sort window, including when the pre-filter is forced to
    cut too deep (tiny safety) and the per-group fallback engages."""
    from pyspark.sql import Window as W

    from light_etl_windows_container_poc_spark.catalog import load_tables
    from light_etl_windows_container_poc_spark.operators.scale import \
        capped_priority_sample

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    pri = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("cap")))
    w = W.partitionBy("source").orderBy(pri, "doc_id")
    truth = sorted(
        (r.source, r.doc_id, r.rk)
        for r in docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5).collect())
    for safety in (4, 1):
        got = sorted(
            (r.source, r.doc_id, r.rk)
            for r in capped_priority_sample(docs, "doc_id", "source",
                                            cap=5, safety=safety).collect())
        assert got == truth, f"safety={safety}"


def test_exact_quantile_cuts_match_percentile_disc(spark):
    """The distributed helper must agree with SQL-standard
    percentile_disc on adversarial shapes: ties, skew, negatives,
    tiny N, and N divisible by the quantile denominator."""
    import random

    from light_etl_windows_container_poc_spark.operators.scale import \
        exact_quantile_cuts

    rng = random.Random(7)
    datasets = [
        [1, 2, 3, 4, 5, 6, 7, 8, 9, 10],          # N divisible by 5
        [5] * 9 + [6],                             # heavy ties
        [-3, -1, -1, 0, 2, 2, 2, 9],               # negatives + ties
        [rng.randrange(-1000, 1000) for _ in range(137)],
        [42],                                      # N=1
    ]
    probs = {"c2": 0.2, "c4": 0.4, "c5": 0.5, "c6": 0.6, "c8": 0.8}
    for vals in datasets:
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        got = exact_quantile_cuts(df, "v", probs, max_buckets=7).first()
        df.createOrReplaceTempView("eqc_t")
        want = spark.sql(
            "SELECT " + ", ".join(
                f"percentile_disc({p}) WITHIN GROUP (ORDER BY v) AS {a}"
                for a, p in probs.items()) + " FROM eqc_t").first()
        for a in probs:
            assert got[a] == int(want[a]), (vals, a, got[a], want[a])


def test_exact_quantile_cuts_empty_input(spark):
    from light_etl_windows_container_poc_spark.operators.scale import \
        exact_quantile_cuts

    df = spark.createDataFrame([], "v long")
    row = exact_quantile_cuts(df, "v", {"c5": 0.5}).first()
    assert row["c5"] is None
