"""Round-13 head candidates pre-certified through the EXACT local-gate
compare (tools/check_oracle's pandas fetch + frame_fingerprint) at
sf0.001 — queries/breadth44.py registers the substring-dedup pair in a
later round by adding the @query decorator; the certification evidence
exists NOW (the 0.01/0.1 legs run in the round-close gate sweep)."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from check_oracle import (  # noqa: E402
    _pandas_rows,
    frame_fingerprint,
    oracle_type_problems,
)

from light_etl_windows_container_poc_spark.catalog import (  # noqa: E402
    TABLES,
    table_path,
)
from light_etl_windows_container_poc_spark.queries.breadth44 import (  # noqa: E402
    DEDUP_SUBSTRING_EXACT_ORACLE,
    DEDUP_SUBSTRING_STRIP_ORACLE,
    dedup_substring_exact,
    dedup_substring_strip,
)


@pytest.fixture()
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{table_path(sf_dir, t)}')")
    yield c
    c.close()


def _gate_compare(spark_df, con, oracle_sql):
    assert oracle_type_problems(con, oracle_sql) == []
    scols = spark_df.columns
    srows = [tuple(r) for r in spark_df.collect()]
    odf = con.execute(oracle_sql).df()
    ocols, orows = list(odf.columns), _pandas_rows(odf)
    assert len(srows) == len(orows)
    assert sorted(scols) == sorted(ocols)
    assert frame_fingerprint(scols, srows) == frame_fingerprint(ocols, orows)
    return len(srows)


def test_dedup_substring_exact_gate_green(spark, sf_dir, con):
    n = _gate_compare(dedup_substring_exact(spark, sf_dir), con,
                      DEDUP_SUBSTRING_EXACT_ORACLE)
    assert n > 0, "the fixture corpus must contain duplicated spans"


def test_dedup_substring_strip_gate_green(spark, sf_dir, con):
    n = _gate_compare(dedup_substring_strip(spark, sf_dir), con,
                      DEDUP_SUBSTRING_STRIP_ORACLE)
    assert n == 500  # every doc returned, stripped or identity


def test_decontaminate_substring_gate_green(spark, sf_dir, con):
    from light_etl_windows_container_poc_spark.queries.breadth44 import (
        DECONTAMINATE_SUBSTRING_ORACLE,
        decontaminate_substring,
    )

    sdf = decontaminate_substring(spark, sf_dir)
    n = _gate_compare(sdf, con, DECONTAMINATE_SUBSTRING_ORACLE)
    assert n > 400  # every corpus doc (500 minus the eval slice)


def test_breadth44_plans_are_cartesian_free(spark, sf_dir):
    """The r13-queue candidates hold the registered families' plan
    hygiene: no CartesianProduct / BroadcastNestedLoop anywhere (the
    strip's doc-local range anti-join must plan as an equi-join on id
    with the range as residual condition), and every window is
    per-doc-partitioned (no global Window)."""
    from light_etl_windows_container_poc_spark.queries.breadth44 import (
        decontaminate_substring,
        dedup_substring_exact,
        dedup_substring_strip,
    )

    import re

    for fn in (dedup_substring_exact, dedup_substring_strip,
               decontaminate_substring):
        plan = fn(spark, sf_dir)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "CartesianProduct" not in plan, fn.__name__
        assert "BroadcastNestedLoop" not in plan, fn.__name__
        # every windowspecdefinition must carry partition columns: a
        # spec whose FIRST element is already an ordering clause is a
        # global window (the duplicate-count window partitions by class
        # key, island merging by doc id — nothing legitimately global)
        specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
        global_specs = [
            s for s in specs
            if s.split(",")[0].strip().endswith(("ASC NULLS FIRST",
                                                 "DESC NULLS LAST"))]
        assert not global_specs, (fn.__name__, global_specs)
