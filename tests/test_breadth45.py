"""Round-14 head candidate pre-certified through the EXACT local-gate
compare (tools/check_oracle's pandas fetch + frame_fingerprint) at
sf0.001 — queries/breadth45.py registers substring_incremental_cert in
a later round by adding the @query decorator; the certification
evidence exists NOW (the 0.01/0.1 legs run in the round-close gate
sweep)."""

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
from light_etl_windows_container_poc_spark.queries.breadth45 import (  # noqa: E402
    SUBSTRING_INCREMENTAL_ORACLE,
    substring_incremental_cert,
)


@pytest.fixture()
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{table_path(sf_dir, t)}')")
    yield c
    c.close()


def test_substring_incremental_cert_gate_green(spark, sf_dir, con):
    sdf = substring_incremental_cert(spark, sf_dir)
    assert oracle_type_problems(con, SUBSTRING_INCREMENTAL_ORACLE) == []
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    odf = con.execute(SUBSTRING_INCREMENTAL_ORACLE).df()
    ocols, orows = list(odf.columns), _pandas_rows(odf)
    assert len(srows) == len(orows)
    assert sorted(scols) == sorted(ocols)
    assert frame_fingerprint(scols, srows) == frame_fingerprint(ocols, orows)
    # the append path must be LOAD-BEARING in the certified output:
    # batch 2 must contain at least one doc whose only duplication
    # evidence is history seen via batch 1's append (hist_starts > 0
    # docs exist in batch 2), else the cert degenerates to two
    # independent decontaminations
    import collections
    by_batch = collections.defaultdict(list)
    for r in srows:
        d = dict(zip(scols, r))
        by_batch[d["batch"]].append(d)
    assert by_batch[1] and by_batch[2]
    assert any(d["hist_starts"] > 0 for d in by_batch[2])


def test_substring_incremental_cert_plan_hygiene(spark, sf_dir, tmp_path):
    """No CartesianProduct / BroadcastNestedLoop, and every window is
    partitioned (per-doc or per-fingerprint — never global). The cert's
    own output is checkpointed (scan-only plan), so the hygiene check
    runs the same build+probe with a LIVE probe plan
    (update_index=False leaves the returned frame unmaterialized)."""
    import re

    from pyspark.sql import functions as F

    from light_etl_windows_container_poc_spark.catalog import load_tables
    from light_etl_windows_container_poc_spark.operators.incremental_substring import (
        build_substring_index,
        incremental_substring_dedup,
    )

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    idx = str(tmp_path / "idx")
    build_substring_index(docs.filter(F.col("doc_id") % 3 != 0), 20, idx)
    sdf = incremental_substring_dedup(
        docs.filter(F.col("doc_id") % 3 == 0), 20, idx,
        update_index=False)
    plan = sdf._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    global_specs = [
        s for s in specs
        if s.split(",")[0].strip().endswith(("ASC NULLS FIRST",
                                             "DESC NULLS LAST"))]
    assert not global_specs, global_specs


def test_substring_takedown_cert_gate_green(spark, sf_dir, con):
    from light_etl_windows_container_poc_spark.queries.breadth45 import (
        SUBSTRING_TAKEDOWN_ORACLE,
        substring_takedown_cert,
    )

    sdf = substring_takedown_cert(spark, sf_dir)
    assert oracle_type_problems(con, SUBSTRING_TAKEDOWN_ORACLE) == []
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    odf = con.execute(SUBSTRING_TAKEDOWN_ORACLE).df()
    ocols, orows = list(odf.columns), _pandas_rows(odf)
    assert len(srows) == len(orows)
    assert sorted(scols) == sorted(ocols)
    assert frame_fingerprint(scols, srows) == frame_fingerprint(ocols, orows)
    # the takedown must be LOAD-BEARING: some doc's hist_starts drops
    # between phase 0 and phase 1 (else nothing was actually unmarked),
    # and phase 2 must equal phase 1 row-for-row (vacuum invariance)
    cols = dict(zip(scols, range(len(scols))))
    p = {0: {}, 1: {}, 2: {}}
    for r in srows:
        p[r[cols["phase"]]][r[cols["doc_id"]]] = r
    assert any(p[0][d][cols["hist_starts"]] > p[1][d][cols["hist_starts"]]
               for d in p[0])
    assert all(
        tuple(p[1][d][i] for c, i in cols.items() if c != "phase")
        == tuple(p[2][d][i] for c, i in cols.items() if c != "phase")
        for d in p[1])
