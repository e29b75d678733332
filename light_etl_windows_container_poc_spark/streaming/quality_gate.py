"""Streaming row-level data-quality gate.

The batch `dq_rules` audit (queries/breadth24.py) turned into a load
gate: each micro-batch is flagged against declarative rule expressions,
clean rows continue to the warehouse, violating rows land in a
quarantine table with their failed-rule names attached, and a per-batch
audit relation records rule-level violation counts. (Reference parity:
`validate_file` + the quarantine/`error` status flow of
`pattern_based_cleaner_watcher.py`, lifted from per-file to per-row and
from polling to Structured Streaming.)

Scale notes: rule evaluation is a single projection over the batch (an
array of CASE expressions — pure JVM, no UDF); the clean/quarantine
split reuses one cached flagged frame so the batch scans once; the
audit aggregate reduces to |rules| rows before any collect. Quarantine
writes are append-only parquet partitioned by nothing (callers with
date-partitioned layouts pass their own writer options).

Replay semantics: foreachBatch appends are at-least-once on recovery.
The audit log carries batch_id, so downstream consumers dedup on
(batch_id, rule); for exactly-once *row* delivery compose with
`parquet_upsert_sink` (streaming/sinks.py) instead of the plain append.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

_FLAG_COL = "_dq_violations"


def flag_rule_violations(df: DataFrame,
                         rules: Mapping[str, Column]) -> DataFrame:
    """Append an array column of failed-rule names (``rules`` maps
    rule name → violation predicate, True == row violates). One
    projection, evaluated inside whole-stage codegen."""
    flags = F.array_compact(F.array(
        *[F.when(cond, F.lit(name)).otherwise(F.lit(None))
          for name, cond in rules.items()]))
    return df.withColumn(_FLAG_COL, flags)


def split_on_rules(flagged: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows drop the flag column; quarantine
    rows keep it (stringified for parquet friendliness as `dq_failed`)."""
    clean = flagged.filter(F.size(_FLAG_COL) == 0).drop(_FLAG_COL)
    bad = (flagged.filter(F.size(_FLAG_COL) > 0)
           .withColumn("dq_failed", F.concat_ws(",", _FLAG_COL))
           .drop(_FLAG_COL))
    return clean, bad


def rule_audit(flagged: DataFrame, rules: Mapping[str, Column],
               batch_id: int) -> DataFrame:
    """|rules|+1 audit rows for one batch: per-rule violation counts
    (explicit zeros for rules that never fired — an absent row is
    indistinguishable from a broken rule) plus a `_rows` total row."""
    exploded = (flagged.select(F.explode(F.col(_FLAG_COL)).alias("rule"))
                .groupBy("rule")
                .agg(F.count(F.lit(1)).cast("long").alias("n_violations")))
    names = flagged.sparkSession.createDataFrame(
        [(n,) for n in rules], "rule string")
    per_rule = (names.join(exploded, "rule", "left")
                .select("rule", F.coalesce("n_violations", F.lit(0))
                        .cast("long").alias("n_violations")))
    total = flagged.select(
        F.lit("_rows").alias("rule"),
        F.count(F.lit(1)).cast("long").alias("n_violations"))
    return (per_rule.unionByName(total)
            .select(F.lit(batch_id).cast("long").alias("batch_id"),
                    "rule", "n_violations"))


def dq_gate_sink(rules: Mapping[str, Column], clean_path: str,
                 quarantine_path: str,
                 audit_path: str) -> Callable[[DataFrame, int], None]:
    """foreachBatch function wiring flag → split → three appends."""

    def gate(batch: DataFrame, batch_id: int) -> None:
        flagged = flag_rule_violations(batch, rules)
        flagged.persist()
        try:
            clean, bad = split_on_rules(flagged)
            clean.write.mode("append").parquet(clean_path)
            bad.write.mode("append").parquet(quarantine_path)
            (rule_audit(flagged, rules, batch_id)
             .write.mode("append").parquet(audit_path))
        finally:
            flagged.unpersist()

    return gate


def start_dq_gate_stream(stream: DataFrame, rules: Mapping[str, Column],
                         clean_path: str, quarantine_path: str,
                         audit_path: str, checkpoint_dir: str,
                         available_now: bool = True) -> StreamingQuery:
    """Run the gate over a streaming DataFrame. ``available_now=True``
    drains the backlog and stops (test/driver shape); False runs
    continuously."""
    writer = (stream.writeStream
              .foreachBatch(dq_gate_sink(rules, clean_path,
                                         quarantine_path, audit_path))
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
