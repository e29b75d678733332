"""Round-6 breadth, second wave: warehouse analytics — equi-depth
histograms via broadcast percentile_disc cuts (the user_rfm pattern
generalized), Benford first-digit audit, chi-square independence of a
contingency table, week-over-week change, and largest day-over-day
movers.

Determinism contracts: decile/quintile cut boundaries p·N round exactly
in IEEE doubles (see user_rfm), so percentile_disc == the oracle's
cume_dist replay; expected-value terms (Benford log10, chi² (O−E)²/E)
are micro-rounded per cell before any integer summation (the
dsir_weights contract — never sum raw doubles across engines); ratios
that can be negative (WoW change, daily deltas) stay as a SINGLE double
division of exact integers, never integer div (trunc-vs-floor diverges
on negatives).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_tables
from .registry import query
from .tpch import _units


# --------------------------------------------------------------------------
# Equi-depth (decile) histogram of lineitem extended price: cut points
# from ONE percentile_disc pass, broadcast back onto the scan for the
# bucket CASE ladder — the scale-safe alternative to ntile(10) over the
# fact table (which would single-task 100 TB of rows).
# --------------------------------------------------------------------------
@query("equidepth_histogram", oracle="""
WITH b AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem
),
cd AS (SELECT cents, cume_dist() OVER (ORDER BY cents) AS cd FROM b),
cuts AS (
  SELECT min(CASE WHEN cd >= 0.1 THEN cents END) AS c1,
         min(CASE WHEN cd >= 0.2 THEN cents END) AS c2,
         min(CASE WHEN cd >= 0.3 THEN cents END) AS c3,
         min(CASE WHEN cd >= 0.4 THEN cents END) AS c4,
         min(CASE WHEN cd >= 0.5 THEN cents END) AS c5,
         min(CASE WHEN cd >= 0.6 THEN cents END) AS c6,
         min(CASE WHEN cd >= 0.7 THEN cents END) AS c7,
         min(CASE WHEN cd >= 0.8 THEN cents END) AS c8,
         min(CASE WHEN cd >= 0.9 THEN cents END) AS c9
  FROM cd
),
s AS (
  SELECT b.cents,
         CAST(1 + CAST(b.cents > c.c1 AS INT) + CAST(b.cents > c.c2 AS INT)
                + CAST(b.cents > c.c3 AS INT) + CAST(b.cents > c.c4 AS INT)
                + CAST(b.cents > c.c5 AS INT) + CAST(b.cents > c.c6 AS INT)
                + CAST(b.cents > c.c7 AS INT) + CAST(b.cents > c.c8 AS INT)
                + CAST(b.cents > c.c9 AS INT) AS INT) AS bucket
  FROM b, cuts c
)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(cents) AS BIGINT) AS min_cents,
       CAST(max(cents) AS BIGINT) AS max_cents,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM s GROUP BY bucket ORDER BY bucket
""")
def equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cut points via `exact_quantile_cuts` (distributed histogram +
    bucketed cumsum), NOT the built-in percentile_disc — whose
    all-values aggregation buffer measured 18s WARM on 600k rows and is
    effectively a column collect at scale."""
    from ..operators.scale import exact_quantile_cuts

    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    b = li.select(_units(F.col("l_extendedprice"), 100).alias("cents"))
    cuts = exact_quantile_cuts(
        b, "cents", {f"c{q}": q / 10.0 for q in range(1, 10)})
    ladder = F.lit(1)
    for q in range(1, 10):
        ladder = ladder + (F.col("cents") > F.col(f"c{q}")).cast("int")
    return (b.crossJoin(F.broadcast(cuts))
            .select("cents", ladder.cast("int").alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                 F.min("cents").cast("long").alias("min_cents"),
                 F.max("cents").cast("long").alias("max_cents"),
                 F.sum("cents").cast("long").alias("sum_cents"))
            .orderBy("bucket"))


# --------------------------------------------------------------------------
# Benford first-digit audit of order totals — the classic fraud /
# data-quality screen. Observed shares in exact milli-units; the Benford
# expectation log10(1 + 1/d) micro-rounded once per digit.
# --------------------------------------------------------------------------
@query("benford_digit_profile", oracle="""
WITH c AS (
  SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                             AS VARCHAR), 1, 1) AS INT) AS digit
  FROM orders
),
t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM c)
SELECT digit, CAST(count(*) AS BIGINT) AS n,
       CAST(1000 * count(*) // (SELECT total FROM t) AS BIGINT)
         AS observed_milli,
       CAST(round(1000000 * log10(1 + 1.0 / digit)) AS BIGINT)
         AS benford_micro
FROM c GROUP BY digit ORDER BY digit
""")
def benford_digit_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One aggregate into ≤9 groups + a broadcast scalar total: output
    ∝ 9 rows at any corpus size. Digits come from the exact integer
    cents (totalprice > 0 in TPC-H), so both engines see identical
    strings."""
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    c = orders.select(
        F.substring(_units(F.col("o_totalprice"), 100).cast("string"),
                    1, 1).cast("int").alias("digit"))
    t = c.agg(F.count(F.lit(1)).cast("long").alias("total"))
    return (c.groupBy("digit")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .crossJoin(F.broadcast(t))
            .select("digit", "n",
                    F.expr("1000 * n div total").cast("long")
                    .alias("observed_milli"),
                    F.round(1_000_000 * F.log10(1 + 1.0 / F.col("digit")))
                    .cast("long").alias("benford_micro"))
            .orderBy("digit"))


# --------------------------------------------------------------------------
# Chi-square independence: event_type × day-of-week contingency table,
# per-cell (O−E)²/E in micro units. The stream reduces to |types|·7
# cells before any float math; row/column totals broadcast back.
# Spark dayofweek() is 1=Sunday..7, DuckDB's is 0=Sunday..6 — aligned
# to the 0-based convention here.
# --------------------------------------------------------------------------
@query("chi2_independence", oracle="""
WITH cell AS (
  SELECT event_type, CAST(dayofweek(ts) AS INT) AS dow,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, dayofweek(ts)
),
rt AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS rt FROM cell
       GROUP BY event_type),
ct AS (SELECT dow, CAST(sum(n) AS BIGINT) AS ct FROM cell GROUP BY dow),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM cell)
SELECT c.event_type, c.dow, c.n,
       CAST(round(1000000.0 * (CAST(c.n AS DOUBLE)
              - CAST(r.rt AS DOUBLE) * CAST(x.ct AS DOUBLE)
                / CAST(t.tot AS DOUBLE))
            * (CAST(c.n AS DOUBLE)
              - CAST(r.rt AS DOUBLE) * CAST(x.ct AS DOUBLE)
                / CAST(t.tot AS DOUBLE))
            / (CAST(r.rt AS DOUBLE) * CAST(x.ct AS DOUBLE)
               / CAST(t.tot AS DOUBLE))) AS BIGINT) AS term_micro
FROM cell c JOIN rt r ON c.event_type = r.event_type
JOIN ct x ON c.dow = x.dow CROSS JOIN tot t
ORDER BY c.event_type, c.dow
""")
def chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    cell = (ev.select("event_type",
                      (F.dayofweek("ts") - 1).cast("int").alias("dow"))
            .groupBy("event_type", "dow")
            .agg(F.count(F.lit(1)).cast("long").alias("n")))
    rt = cell.groupBy("event_type").agg(F.sum("n").cast("long").alias("rt"))
    ct = cell.groupBy("dow").agg(F.sum("n").cast("long").alias("ct"))
    tot = cell.agg(F.sum("n").cast("long").alias("tot"))
    e = (F.col("rt").cast("double") * F.col("ct").cast("double")
         / F.col("tot").cast("double"))
    d = F.col("n").cast("double") - e
    term = F.round(F.lit(1000000.0) * d * d / e).cast("long")
    return (cell.join(F.broadcast(rt), "event_type")
            .join(F.broadcast(ct), "dow")
            .crossJoin(F.broadcast(tot))
            .select("event_type", "dow", "n", term.alias("term_micro"))
            .orderBy("event_type", "dow"))


# --------------------------------------------------------------------------
# Week-over-week volume change per event type: weekly cents volume
# (ISO weeks — both engines truncate to Monday), lag window on the
# |types|·|weeks| relation, change as ONE double division of exact
# integers (may be negative — integer div is banned on that domain).
# --------------------------------------------------------------------------
@query("pct_change_wow", oracle="""
WITH m AS (
  SELECT event_type, strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY event_type, date_trunc('week', ts)
)
SELECT event_type, week, cents,
       lag(cents) OVER (PARTITION BY event_type ORDER BY week)
         AS prev_cents,
       CAST(cents - lag(cents) OVER (PARTITION BY event_type
                                     ORDER BY week) AS DOUBLE)
         / CAST(lag(cents) OVER (PARTITION BY event_type ORDER BY week)
                AS DOUBLE) AS wow_change
FROM m ORDER BY event_type, week
""")
def pct_change_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    m = (ev.select("event_type",
                   F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd")
                   .alias("week"),
                   F.round(F.col("value") * 100).cast("long").alias("c"))
         .groupBy("event_type", "week")
         .agg(F.sum("c").cast("long").alias("cents")))
    w = W.partitionBy("event_type").orderBy("week")
    prev = F.lag("cents").over(w)
    return (m.select("event_type", "week", "cents",
                     prev.alias("prev_cents"),
                     ((F.col("cents") - prev).cast("double")
                      / prev.cast("double")).alias("wow_change"))
            .orderBy("event_type", "week"))


# --------------------------------------------------------------------------
# Top movers: the 3 largest absolute day-over-day count swings per event
# type. Both windows partition by type — the unpartitioned relation is
# never ranked.
# --------------------------------------------------------------------------
@query("top_movers", oracle="""
WITH d AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, date_trunc('day', ts)
),
l AS (
  SELECT event_type, CAST(day AS VARCHAR) AS day, n,
         CAST(n - lag(n) OVER (PARTITION BY event_type ORDER BY day)
              AS BIGINT) AS delta
  FROM d
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY abs(delta) DESC, day) AS rn
  FROM l WHERE delta IS NOT NULL
)
SELECT event_type, day, n, delta, CAST(rn AS INT) AS rn
FROM r WHERE rn <= 3 ORDER BY event_type, rn
""")
def top_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    d = (ev.select("event_type",
                   F.date_trunc("day", "ts").cast("date").alias("day"))
         .groupBy("event_type", "day")
         .agg(F.count(F.lit(1)).cast("long").alias("n")))
    wl = W.partitionBy("event_type").orderBy("day")
    l = d.select("event_type",
                 F.date_format("day", "yyyy-MM-dd").alias("day"), "n",
                 (F.col("n") - F.lag("n").over(wl)).cast("long")
                 .alias("delta"))
    wr = W.partitionBy("event_type").orderBy(F.abs("delta").desc(), "day")
    return (l.filter(F.col("delta").isNotNull())
            .select("*", F.row_number().over(wr).cast("int").alias("rn"))
            .filter(F.col("rn") <= 3)
            .orderBy("event_type", "rn"))