"""Scale-mechanics operators: skew-salted joins, bucketed co-located
joins, small-file compaction, incremental file discovery.

These are the knobs a 100 TB deployment turns; each has a plan-shape test
in tests/test_scale.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F


def salted_join(big: DataFrame, skewed_small: DataFrame, key: str,
                salt: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join resilient to hot keys: the big side gets a random salt in
    [0, salt); the small side is replicated ``salt`` times with every salt
    value. A key holding 30% of a 100 TB table then spreads over ``salt``
    reducers instead of one straggler.

    AQE's skew-join handles moderate skew automatically; explicit salting
    is for the pathological keys AQE can't split (single-key partitions).
    """
    big_salted = big.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    small_replicated = skewed_small.withColumn("__salt", salts)
    joined = big_salted.join(small_replicated, [key, "__salt"], how)
    return joined.drop("__salt")


def write_bucketed(df: DataFrame, table_name: str, key: str,
                   num_buckets: int = 16, sort_by: str | None = None) -> None:
    """Persist hash-bucketed (optionally sorted) by the join key: later
    joins/aggs on ``key`` between co-bucketed tables skip the shuffle
    entirely — the classic pre-shuffle trade for hot join paths."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, key)
    if sort_by:
        w = w.sortBy(sort_by)
    w.saveAsTable(table_name)


def compact_files(spark: SparkSession, path: str, out_path: str,
                  target_mb: int = 128) -> int:
    """Small-file compaction: rewrite a directory of tiny parquet files
    into ~target_mb outputs. Returns the output file count.

    Sizing uses only FILE METADATA from the binaryFile listing (its
    `length` column — `content` is pruned, no bytes read), so it works on
    any Hadoop-compatible filesystem (HDFS/S3/local), not just a POSIX
    mount; the rewrite itself is one distributed pass.
    """
    total = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.parquet")
             .option("recursiveFileLookup", "true")
             .load(path)
             .agg(F.sum("length").alias("total"))
             .collect()[0]["total"]) or 0
    n_out = max(1, round(total / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    df.repartition(n_out).write.mode("overwrite").parquet(out_path)
    return n_out


def discover_new_files(spark: SparkSession, input_dir: str, state_path: str,
                       glob: str = "*.csv",
                       allowed_extensions: tuple[str, ...] | None = None,
                       skip_empty: bool = True) -> DataFrame:
    """Reference watcher parity (`pattern_based_cleaner_watcher.py:239-314`)
    as a stateless-driver batch op: list files with the binaryFile source
    (path, modificationTime, length), anti-join against the persisted state
    table → NEW or MODIFIED files only; caller processes them and then
    ``commit_discovered`` updates the state.

    ``allowed_extensions`` mirrors `fileserver.is_allowed_file`
    (fileserver.py:41-44: .xlsx/.xls/.xlsm/.xlsb/.csv allow-list) and
    ``skip_empty`` the watcher's empty-file skip — both are metadata-only
    predicates on the listing, no file content is read to reject a file.

    The reference kept this state in a Python dict (lost on restart, one
    watcher process); here it's a parquet table — restart-safe and shared
    by any number of ingest jobs.
    """
    listing = (spark.read.format("binaryFile")
               .option("pathGlobFilter", glob)
               .option("recursiveFileLookup", "true")
               .load(input_dir)
               .select("path", F.col("modificationTime").alias("mtime"),
                       F.col("length").alias("size")))
    if allowed_extensions is not None:
        ext = F.lower(F.regexp_extract(F.col("path"), r"(\.[^./\\]+)$", 1))
        listing = listing.filter(ext.isin(*[e.lower()
                                            for e in allowed_extensions]))
    if skip_empty:
        listing = listing.filter(F.col("size") > 0)
    try:
        state = spark.read.parquet(state_path).select(
            F.col("path").alias("seen_path"), F.col("mtime").alias("seen_mtime"))
    except Exception:  # first run: no state yet → everything is new
        return listing
    return (listing.join(state, (listing.path == state.seen_path)
                         & (listing.mtime == state.seen_mtime), "left_anti"))


def commit_discovered(discovered: DataFrame, state_path: str) -> None:
    """Record processed files (append; latest mtime per path wins on the
    next discovery's anti-join because the join requires BOTH path+mtime
    to match a seen entry)."""
    discovered.select("path", "mtime").write.mode("append").parquet(state_path)


def capped_priority_sample(df: DataFrame, id_col: str, group_col: str,
                           cap: int, safety: int = 4) -> DataFrame:
    """EXACT per-group top-``cap`` priority sample (md5 order — the
    domain-rebalancing cap) with a map-side threshold pre-filter, so a
    pathological group holding billions of rows never feeds its full bulk
    into the row_number sort.

    Priority is the md5 hex string of the salted id; its first-6-hex-digit
    integer is an ORDER-CONSISTENT PREFIX of the full priority. Per group
    with n rows, rows with prefix ≥ t ≈ 2^24·cap·safety/n are discarded
    map-side (an expected cap·safety survivors); if a group keeps at least
    min(cap, n) survivors, its true top-cap provably all survived (any
    discarded row is strictly greater in the prefix, hence in the full
    order). Groups where the pre-filter cut too deep — vanishingly rare at
    safety=4 but detected exactly — fall back to the unfiltered window.

    Shuffle: group counts (tiny), the ~cap·safety survivors per group, and
    only fallback groups' full rows. Result is bit-identical to the plain
    full-sort window (asserted in tests)."""
    pri = F.md5(F.concat(F.col(id_col).cast("string"), F.lit("cap")))
    pri24 = F.conv(F.substring(pri, 1, 6), 16, 10).cast("long")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    thr = counts.select(
        group_col,
        F.when(F.col("__n") > cap * safety,
               F.ceil(F.lit(float(1 << 24) * cap * safety) / F.col("__n"))
               .cast("long"))
        .otherwise(F.lit(1 << 24)).alias("__thr"),
        F.least(F.lit(cap).cast("long"), F.col("__n")).alias("__need"))
    pre = (df.withColumn("__p24", pri24)
           .join(F.broadcast(thr), group_col)
           .filter(F.col("__p24") < F.col("__thr")))
    got = pre.groupBy(group_col).agg(F.count(F.lit(1)).alias("__got"),
                                     F.max("__need").alias("__need2"))
    bad = got.filter(F.col("__got") < F.col("__need2")).select(group_col)
    ok_rows = pre.join(F.broadcast(bad), group_col, "left_anti")
    fallback_rows = (df.join(F.broadcast(bad), group_col)
                     .withColumn("__p24", pri24)
                     .join(F.broadcast(thr), group_col))
    w = W.partitionBy(group_col).orderBy(pri, F.col(id_col))
    cols = [c for c in df.columns]
    return (ok_rows.unionByName(fallback_rows)
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= cap)
            .select(*cols, "rk"))


def exact_quantile_cuts(df: DataFrame, col: str,
                        probs: dict[str, float],
                        max_buckets: int = 4096) -> DataFrame:
    """SQL-standard ``percentile_disc`` cut points (smallest value whose
    cume_dist >= p) over an INTEGER column, computed DISTRIBUTED — the
    drop-in replacement for Spark's ``percentile_disc`` aggregate on
    relations that scale with the data. Returns ONE row with a column
    per ``probs`` alias, meant to be ``F.broadcast``-cross-joined back.

    Why not the built-in: Spark's percentile aggregates accumulate a
    value→count map of EVERY distinct value into a single final buffer —
    effectively a driver-side collect of the column's distinct domain
    (measured: 18s WARM for one decile pass over 600k lineitem prices,
    and it only grows with the data). This helper keeps every data-sized
    step distributed:

    1. ``groupBy(value)`` histogram — shuffle ∝ |distinct values|;
    2. value-range bucketing (width sized so ≤ ``max_buckets`` buckets):
       within-bucket running counts use a window PARTITIONED by bucket;
    3. bucket offsets — the only unpartitioned window, over ≤
       ``max_buckets`` rows BY CONSTRUCTION (the pack_sequences
       bounded-spine argument), broadcast back;
    4. one filtered-min aggregate per prob.

    Cross-engine contract: the keep condition is ``cum / N >= p`` with
    cum, N exact BIGINTs divided ONCE in doubles — bit-identical to what
    a ``cume_dist() OVER (ORDER BY v)`` replay computes in DuckDB, so
    oracle hashes are safe by construction (no reliance on any engine's
    internal percentile rounding).
    """
    df = df.filter(F.col(col).isNotNull())  # percentile_disc ignores nulls
    stats = df.agg(F.min(col).alias("mn"), F.max(col).alias("mx"),
                   F.count(F.lit(1)).alias("n")).first()
    mn, n = stats["mn"], stats["n"]
    if not n:
        return df.sparkSession.createDataFrame(
            [tuple(None for _ in probs)],
            ", ".join(f"{a} bigint" for a in probs))
    width = max(1, (int(stats["mx"]) - int(mn)) // max_buckets + 1)
    h = (df.groupBy(F.col(col).alias("v"))
         .agg(F.count(F.lit(1)).alias("c"))
         .withColumn("bkt", F.expr(f"(v - {int(mn)}L) div {width}L")))
    wb = (W.partitionBy("bkt").orderBy("v")
          .rowsBetween(W.unboundedPreceding, 0))
    within = h.withColumn("cw", F.sum("c").over(wb))
    # bucket offsets: ≤ max_buckets rows — the bounded global window
    wg = W.orderBy("bkt").rowsBetween(W.unboundedPreceding, -1)
    off = (h.groupBy("bkt").agg(F.sum("c").alias("bc"))
           .withColumn("off", F.coalesce(F.sum("bc").over(wg), F.lit(0)))
           .select("bkt", "off"))
    cum = (within.join(F.broadcast(off), "bkt")
           .withColumn("cum", F.col("cw") + F.col("off")))
    nn = F.lit(int(n)).cast("double")
    return cum.agg(*[
        F.min(F.when(F.col("cum").cast("double") / nn >= F.lit(float(p)),
                     F.col("v"))).alias(alias)
        for alias, p in probs.items()])


def salting_advice(df: DataFrame, key_col: str, n_partitions: int,
                   k: int = 64) -> DataFrame:
    """Sketch-driven per-key salt factors — the planner step that turns
    the heavy-hitter summary into a concrete skew plan BEFORE a 100 TB
    shuffle, instead of salting uniformly (which replicates the whole
    build side) or discovering the straggler at runtime.

    A key holding c rows needs ceil(c / (n/n_partitions)) reducers to
    spread to fair-share size. Counts come from one Misra-Gries pass
    (operators/sketches.mg_partial_summaries_with_n): MG never overcounts and
    undercounts by at most n/k, so factors are computed from
    est + n/k — an upper bound on the true count — and a true share of
    s ≥ 1/k can never slip past the advisor unsalted. State is ≤ k rows
    per partition regardless of key cardinality; only keys needing
    factor ≥ 2 are returned (the broadcast stays ≤ k rows).

    ONE scan of df: the MG partials carry each partition's row count on
    a token-NULL carrier row (`mg_partial_summaries_with_n`), so n
    comes from the materialized ≤ (k+1)·partitions-row relation instead
    of a separate count() pass — for an advisor that exists to run
    BEFORE a 100 TB shuffle, one table scan instead of two.

    Returns (key, factor int ≥ 2)."""
    from .sketches import mg_merge, mg_partial_summaries_with_n

    partials = (mg_partial_summaries_with_n(
        df.select(F.col(key_col).cast("string").alias(key_col)),
        key_col, k).localCheckpoint(eager=True))
    n = (partials.filter(F.col("token").isNull())
         .agg(F.sum("est")).collect()[0][0]) or 0
    if n == 0:
        return (df.sparkSession.createDataFrame([], "key string, factor int"))
    hh = mg_merge(partials.filter(F.col("token").isNotNull()), k)
    fair = max(1, -(-n // n_partitions))  # ceil(n / n_partitions)
    slack = -(-n // k)                    # MG max undercount, ceil'd
    return (hh.select(F.col("token").alias("key"),
                      F.ceil((F.col("est") + F.lit(slack))
                             / F.lit(fair)).cast("int").alias("factor"))
            .filter(F.col("factor") >= 2))


def salted_join_advised(big: DataFrame, small: DataFrame, key: str,
                        advice: DataFrame, how: str = "inner") -> DataFrame:
    """Equi-join salted ONLY on the advised hot keys: cold keys ride
    salt 0 with no replication, each hot key's probe rows spread over
    its own ``factor`` salts and only ITS build rows replicate — the
    per-key refinement of `salted_join` (which replicates the entire
    build side by the global factor). ``advice`` is the ≤ k-row output
    of `salting_advice`; both sides join it broadcast, so the plan adds
    two broadcast joins and zero extra shuffles of the big side beyond
    the (key, salt) join itself.

    Output multiset equals the unsalted join (pytest-certified): salts
    partition each key's row pairs, they never drop or duplicate one.
    Inner/left joins only: under right/full semantics a replicated
    build row with NO probe match would surface once PER SALT.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join_advised supports inner/left joins, got {how!r}: "
            "replicated build rows without a probe match would duplicate "
            "under right/full semantics")
    # the advice relation joins into BOTH sides under reserved names so
    # a user column named 'factor' can never make the reference
    # ambiguous (AnalysisException) or get silently dropped; the
    # __-prefixed working columns are reserved outright
    reserved = {"__advkey", "__adv_factor", "__salt", "__salts"}
    for side, cols in (("big", big.columns), ("small", small.columns)):
        clash = reserved & set(cols)
        if clash:
            raise ValueError(
                f"salted_join_advised reserves columns {sorted(clash)} "
                f"for its salting plumbing but {side} already has them — "
                "rename them before the call")
    adv = F.broadcast(advice.select(F.col("key").alias("__advkey"),
                                    F.col("factor").alias("__adv_factor")))
    fac = F.col("__adv_factor")
    bk = F.col(key).cast("string")
    big_s = (big.join(adv, bk == F.col("__advkey"), "left")
             .withColumn("__salt",
                         F.when(fac.isNull(), F.lit(0))
                         .otherwise((F.rand(seed=42) * fac).cast("int")))
             .drop("__advkey", "__adv_factor"))
    small_s = (small.join(adv, F.col(key).cast("string")
                          == F.col("__advkey"), "left")
               .withColumn("__salts",
                           F.sequence(F.lit(0),
                                      F.coalesce(fac, F.lit(1)) - 1))
               .withColumn("__salt", F.explode("__salts"))
               .drop("__advkey", "__adv_factor", "__salts"))
    return big_s.join(small_s, [key, "__salt"], how).drop("__salt")
