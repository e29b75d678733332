"""Plan inspection helpers — the engine's scale-hygiene gate.

`explain` text is the ground truth for what will actually run: these
helpers let tests assert that a filter reached the parquet scan, a dim
join broadcast, a scan pruned its columns, and no Python UDF snuck into a
JVM-only pipeline. Regressions in any of these are 100 TB incidents that
a row-count test would never catch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # same as .explain("formatted")
        df._jdf.queryExecution(), "formatted")


def assert_has_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Every fragment must appear in a PushedFilters: [...] entry."""
    plan = formatted_plan(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters:" in ln]
    assert pushed, f"no PushedFilters in plan:\n{plan}"
    blob = " ".join(pushed)
    for frag in fragments:
        assert frag in blob, f"filter {frag!r} not pushed; got: {blob}\n{plan}"


def assert_reads_only_columns(df: DataFrame, table_cols: set[str],
                              allowed: set[str]) -> None:
    """The parquet ReadSchema must request no column outside ``allowed``
    (column pruning works)."""
    plan = formatted_plan(df)
    read = [ln for ln in plan.splitlines() if "ReadSchema:" in ln]
    assert read, f"no ReadSchema in plan:\n{plan}"
    for ln in read:
        for col in table_cols - allowed:
            assert f"{col}:" not in ln, f"unpruned column {col} in {ln}"


def assert_broadcast_join(df: DataFrame, min_count: int = 1) -> None:
    plan = formatted_plan(df)
    n = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
    assert n >= min_count, f"expected ≥{min_count} broadcast joins:\n{plan}"


def assert_no_python_udf(df: DataFrame) -> None:
    """JVM-only pipelines must not contain Python evals (BatchEvalPython /
    ArrowEvalPython / MapInPandas nodes)."""
    plan = formatted_plan(df)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonMapInArrow",
                   "MapInPandas"):
        assert marker not in plan, f"{marker} found in supposedly-JVM plan:\n{plan}"


def assert_single_shuffle(df: DataFrame, max_exchanges: int) -> None:
    """Bound the number of Exchange (shuffle) nodes in the physical plan.

    Counts only the numbered node headers — the formatted plan prints each
    node twice (tree line + detail section)."""
    import re

    plan = formatted_plan(df)
    n = len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.M))
    assert n <= max_exchanges, f"{n} exchanges (max {max_exchanges}):\n{plan}"
