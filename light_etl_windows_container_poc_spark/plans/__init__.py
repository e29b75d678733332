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


def plan_report(df: DataFrame) -> dict:
    """Structured summary of the physical plan — the assertion helpers'
    signals as data, for dashboards / pipeline pre-flight checks /
    notebooks. Keys:

    - ``exchanges``: shuffle count (node headers, not the detail echo)
    - ``broadcast_joins`` / ``sortmerge_joins`` / ``nested_loop_joins``
    - ``python_evals``: Arrow/row Python nodes (MapInPandas etc.)
    - ``scans``: list of {format, pushed_filters, read_schema} per scan
    - ``codegen_spans``: WholeStageCodegen region count (0 on an
      UNEXECUTED adaptive plan — AQE annotates codegen ids only once
      the final plan exists; run an action first to see the regions)
    - ``single_partition_exchanges``: Exchanges distributing to
      SinglePartition — the all-rows-through-one-task shape every
      global sort / unpartitioned window / ordered limit requires.
      This is also the global-window detector: a Window over an empty
      partition spec always plans one (the formatted text itself does
      not distinguish partitioned from unpartitioned window specs
      reliably, so no separate window field is reported).
    - ``warnings``: human-readable flags (cartesian product,
      single-partition exchange, python eval) worth a look before a
      100 TB run
    """
    import re

    plan = formatted_plan(df)
    heads = re.findall(r"^\(\d+\) ([A-Za-z]+)", plan, flags=re.M)
    scans = []
    fmt = None
    for ln in plan.splitlines():
        s = ln.strip()
        if re.match(r"^\(\d+\) Scan ", s):
            fmt = s.split("Scan ", 1)[1].split()[0]
        elif "PushedFilters:" in s and scans is not None:
            scans.append({"format": fmt,
                          "pushed_filters": s.split("PushedFilters:", 1)[1]
                          .strip(), "read_schema": None})
        elif "ReadSchema:" in s and scans:
            if scans[-1]["read_schema"] is None:
                scans[-1]["read_schema"] = s.split("ReadSchema:", 1)[1].strip()
    py_nodes = ("BatchEvalPython", "ArrowEvalPython", "PythonMapInArrow",
                "MapInPandas")
    # formatted explain prints the Exchange distribution on its detail
    # line ("Arguments: SinglePartition, ..."), NOT next to the node
    # header — match the argument, not a node name
    single_part = len(re.findall(r"Arguments: SinglePartition", plan))
    report = {
        "exchanges": sum(1 for h in heads if h == "Exchange"),
        "broadcast_joins": sum(1 for h in heads if h == "BroadcastHashJoin"),
        "sortmerge_joins": sum(1 for h in heads if h == "SortMergeJoin"),
        "nested_loop_joins": sum(
            1 for h in heads
            if h in ("BroadcastNestedLoopJoin", "CartesianProduct")),
        "python_evals": sum(1 for h in heads if h in py_nodes),
        # formatted mode marks regions as "[codegen id : N]" suffixes,
        # not node headers — count distinct region ids
        "codegen_spans": len(set(re.findall(r"codegen id : (\d+)", plan))),
        "single_partition_exchanges": single_part,
        "scans": scans,
    }
    warnings = []
    if report["nested_loop_joins"]:
        warnings.append("nested-loop/cartesian join: O(n·m) at scale")
    if report["python_evals"]:
        warnings.append("Python eval node in plan: Arrow-batch cost per row"
                        " batch — fine for decode/GEMM, wrong for hot"
                        " relational paths")
    if single_part:
        warnings.append("single-partition exchange (global sort/window/"
                        "limit): all rows through one task")
    report["warnings"] = warnings
    return report
