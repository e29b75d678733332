"""Mergeable frequency sketches: distributed Misra-Gries heavy hitters,
the Count-Min grid, and the AMS second-frequency-moment estimator.

The reference's warehouse answers "top values by frequency" with full
GROUP BY counts (tasks_postgres.py:237-263 job-status rollups); at
100 TB a full count of a high-cardinality column is itself a shuffle of
|distinct| rows. Misra-Gries is the deterministic mergeable summary for
that question: k counters per partition, partials merged with the
subtract-(k+1)-th-largest rule (the Agarwal et al. mergeable-summaries
merge), giving the guarantees

    est(x) <= true(x)                      (never overcounts)
    true(x) - est(x) <= n / (k+1)          (bounded undercount)
    true(x) > n/(k+1)  =>  x in summary    (no heavy item is lost)

independent of partitioning, row order, or merge shape. The summary is
`k` rows per partition on the wire — shuffle cost is partitions*k, not
|distinct| — and the certification query (queries/breadth29.py)
hash-proves the guarantee columns against exact counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_partial_summaries(df: DataFrame, col: str, k: int) -> DataFrame:
    """One Misra-Gries summary (<= k rows: token, est) per partition.

    Each Arrow batch folds in via vectorized value_counts, then the
    summary compresses back to k entries by subtracting the (k+1)-th
    largest count from everything and dropping non-positives — the
    mergeable-summaries compress, equivalent to (but much faster than)
    the textbook one-decrement-per-overflow loop, with the same bounds.
    """

    def run(batches):
        import pandas as pd

        counters = pd.Series(dtype="int64")
        for pdf in batches:
            vc = pdf[col].value_counts()
            counters = counters.add(vc, fill_value=0)
            if len(counters) > k:
                cut = counters.nlargest(k + 1).iloc[-1]
                counters = counters - cut
                counters = counters[counters > 0]
        counters = counters.astype("int64")
        yield pd.DataFrame(
            {"token": counters.index.astype(str), "est": counters.values})

    return df.mapInPandas(run, "token string, est long")


def mg_partial_summaries_with_n(df: DataFrame, col: str,
                                k: int) -> DataFrame:
    """`mg_partial_summaries` plus one token-NULL row per partition
    carrying the partition's ROW COUNT in est — callers that need both
    the summary and n (the salting advisor's slack term n/k and
    fair-share n/partitions) pay ONE scan of df instead of a count()
    pass followed by a sketch pass. Real tokens are never NULL (the
    summary's index is stringified), so the carrier rows are
    unambiguous; filter them off before `mg_merge`."""

    def run(batches):
        import pandas as pd

        counters = pd.Series(dtype="int64")
        n = 0
        for pdf in batches:
            n += len(pdf)
            vc = pdf[col].value_counts()
            counters = counters.add(vc, fill_value=0)
            if len(counters) > k:
                cut = counters.nlargest(k + 1).iloc[-1]
                counters = counters - cut
                counters = counters[counters > 0]
        counters = counters.astype("int64")
        yield pd.concat(
            [pd.DataFrame({"token": counters.index.astype(str),
                           "est": counters.values}),
             pd.DataFrame({"token": pd.array([None], dtype="object"),
                           "est": [n]})],
            ignore_index=True)

    return df.mapInPandas(run, "token string, est long")


def mg_merge(partials: DataFrame, k: int) -> DataFrame:
    """Merge per-partition MG summaries into one global <= k-row summary.

    Sum per-token counters, then apply the same compress: subtract the
    (k+1)-th largest summed count (0 when fewer than k+1 tokens
    survive) and keep strict positives. Everything here operates on a
    partitions*k-row relation — the window-free limit/agg form keeps it
    one tiny job.
    """
    summed = partials.groupBy("token").agg(F.sum("est").alias("est"))
    top = (summed.orderBy(F.desc("est"), "token").limit(k + 1)
           .agg(F.count(F.lit(1)).alias("n_top"),
                F.min("est").alias("kth")))
    cut = F.when(F.col("n_top") == k + 1, F.col("kth")).otherwise(F.lit(0))
    return (summed.crossJoin(F.broadcast(top))
            .select("token", (F.col("est") - cut).alias("est"))
            .filter(F.col("est") > 0))


def mg_heavy_hitters(df: DataFrame, col: str, k: int) -> DataFrame:
    """End-to-end distributed Misra-Gries: (token, est), <= k rows."""
    return mg_merge(mg_partial_summaries(df, col, k), k)


# ---------------------------------------------------------------------------
# Count-Min: the OVERcounting complement to Misra-Gries. MG never
# overcounts and answers "what is heavy"; CM never UNDERcounts and
# answers point queries for ANY key, including keys MG evicted. State is
# a fixed depth*width counter grid regardless of cardinality, merged by
# plain addition (sum is associative, so partial aggregation gives the
# identical grid for any partitioning) — the whole sketch is one
# map-side-combined groupBy of depth*width cells, never a shuffle of
# |distinct| rows. Hashes are the repo-standard md5 bridge so DuckDB
# replays every cell exactly.
# ---------------------------------------------------------------------------
def cm_bucket(seed_col, key_col, width: int):
    """Row h_seed(key) % width via the md5 bridge (exact in DuckDB as
    CAST(('0x' || substring(md5(seed || ':' || key), 1, 8)) AS BIGINT))."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", seed_col.cast("string"),
                              key_col.cast("string"))), 1, 8),
        16, 10).cast("long")
    return h % width


def cm_build(df: DataFrame, col: str, depth: int, width: int) -> DataFrame:
    """The depth*width counter grid: (seed, bucket, cnt).

    The explode multiplies rows by `depth` BEFORE the aggregate, but
    hash-partial aggregation compresses each task to <= depth*width
    cells on the map side — the shuffle carries tasks*depth*width rows,
    independent of input size or key cardinality.
    """
    from ..catalog import spread_scan

    seeds = F.array(*[F.lit(s) for s in range(depth)])
    # per-row work below is `depth` md5s: on a sub-cores-files scan the
    # single decode task would also run EVERY hash (map-side aggregation
    # keeps it all in the scan stage) — spread first; provable no-op on
    # many-file inputs (catalog.spread_scan). Spread on a ROW-unique
    # composite, NOT the counted column: its heavy hitters are exactly
    # what the sketch measures, so hashing on it would send most rows of
    # a skewed input to one partition (r15 advisory). The row position
    # is deterministic per scan layout (sequential within each input
    # split), so the assignment is stable under task retry.
    return (spread_scan(df, F.xxhash64(F.col(col),
                                       F.monotonically_increasing_id()))
            .select(F.explode(seeds).alias("seed"), F.col(col).alias("k"))
            .select("seed", cm_bucket(F.col("seed"), F.col("k"), width)
                    .alias("bucket"))
            .groupBy("seed", "bucket")
            .agg(F.count(F.lit(1)).alias("cnt")))


def cm_point_query(counters: DataFrame, keys: DataFrame, key_col: str,
                   depth: int, width: int) -> DataFrame:
    """est(key) = min over seeds of grid[seed][h_seed(key)].

    CM's deterministic guarantee: est >= true for every key (each cell
    holds the key's own count plus whatever collided into it). A cell
    the grid never stored is ZERO (canonical sketch semantics, via the
    left join + coalesce): a key hashing into any empty cell estimates
    0, i.e. the sketch can PROVE absence. Keys present in the stream
    never hit an empty cell (their own count is in all depth cells), so
    the certified point-query relation is unaffected. `keys` is a
    bounded probe relation; the grid side is depth*width rows, so the
    join broadcasts.
    """
    seeds = F.array(*[F.lit(s) for s in range(depth)])
    probes = (keys.select(F.col(key_col),
                          F.explode(seeds).alias("seed"))
              .select(key_col, "seed",
                      cm_bucket(F.col("seed"), F.col(key_col), width)
                      .alias("bucket")))
    return (probes.join(F.broadcast(counters), ["seed", "bucket"], "left")
            .groupBy(key_col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .alias("est_cnt")))


# ---------------------------------------------------------------------------
# AMS (Alon-Matias-Szegedy) F2 sketch: the second-frequency-moment /
# SELF-JOIN-SIZE estimator — the statistic a join planner wants before
# committing a 100 TB shuffle (F2 = |R ⋈ R| on the join key; a skewed
# key inflates it quadratically, so F2/n² is the canonical skew score).
# State is `counters` signed sums X_j = Σ_v f_v·sign_j(v) with
# sign_j(v) = ±1 drawn from the md5 bridge — E[X_j²] = F2 exactly, and
# the sketch MERGES BY PLAIN ADDITION (X_j is linear in the rows), so
# any partitioning, micro-batching, or replay-overwrite produces the
# identical counter vector. All arithmetic is integer: every cell is
# DuckDB-replayable, and X_j ≤ n keeps X_j² within BIGINT at any
# realistic n.
# ---------------------------------------------------------------------------
def ams_sign(seed_col, key_col):
    """±1 from one md5-bridge bit: first hex nibble of md5(seed:key)
    mod 2, mapped 0→+1 / 1→−1. DuckDB twin:
    1 - 2*(CAST(('0x'||substring(md5(seed||':'||key),1,1)) AS BIGINT)%2)."""
    bit = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", seed_col.cast("string"),
                              key_col.cast("string"))), 1, 1),
        16, 10).cast("long") % 2
    return F.lit(1) - F.lit(2) * bit


def ams_build(df: DataFrame, col: str, counters: int) -> DataFrame:
    """The signed counter vector: (j, x) for j in 0..counters-1.

    The explode multiplies rows by `counters` before the aggregate, but
    map-side partial aggregation compresses each task to `counters`
    cells — the shuffle carries tasks*counters rows, independent of
    input size or key cardinality (the cm_build shape).
    """
    from ..catalog import spread_scan

    seeds = F.array(*[F.lit(s) for s in range(counters)])
    # same spread rationale as cm_build: `counters` md5s per input row
    # all land in the scan task on a sub-cores-files layout — and the
    # same row-unique spread key (the counted column's heavy hitters
    # are the skew the sketch exists to measure)
    return (spread_scan(df, F.xxhash64(F.col(col),
                                       F.monotonically_increasing_id()))
            .select(F.explode(seeds).alias("j"), F.col(col).alias("k"))
            .select("j", ams_sign(F.col("j"), F.col("k")).alias("s"))
            .groupBy("j")
            .agg(F.sum("s").cast("long").alias("x")))


def ams_f2_estimate(counter_df: DataFrame, counters: int,
                    groups: int) -> DataFrame:
    """Median-of-means over the counter vector, kept in exact integers.

    Counters split into `groups` blocks of per = counters/groups each;
    block sum S_g = Σ x_j² is an integer, the block mean is S_g/per,
    and the (even-count) median of means is (S_(mid) + S_(mid+1)) /
    (2·per). So the estimate scaled by 2·per — the sum of the two
    middle order statistics — is exact BIGINT arithmetic with no
    division anywhere: the caller compares est_x2p against (2·per)·F2
    instead of est against F2. One row out: (est_x2p,).
    """
    if counters % groups or groups % 2:
        # a runt group would bias the group means, and an odd group
        # count makes "the two middle order statistics" the wrong
        # median form — both silently, so reject loudly instead
        raise ValueError(
            f"ams_f2_estimate needs groups | counters and an even "
            f"group count, got counters={counters} groups={groups}")
    per = counters // groups
    s = (counter_df
         .groupBy((F.col("j") / per).cast("int").alias("g"))
         .agg(F.sum(F.col("x") * F.col("x")).cast("long").alias("sg")))
    from pyspark.sql import Window
    rk = s.withColumn("rn", F.row_number().over(
        Window.orderBy("sg")))  # `groups` rows — bounded global window
    mid = (groups // 2, groups // 2 + 1)
    return (rk.filter(F.col("rn").isin(*mid))
            .agg(F.sum("sg").cast("long").alias("est_x2p")))
