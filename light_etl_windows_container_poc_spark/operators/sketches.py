"""Mergeable frequency sketches: distributed Misra-Gries heavy hitters.

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
    seeds = F.array(*[F.lit(s) for s in range(depth)])
    return (df.select(F.explode(seeds).alias("seed"), F.col(col).alias("k"))
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
