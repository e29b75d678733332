"""The local gate's type guard: DuckDB output types with no faithful
pandas rendering (HUGEINT/UHUGEINT → float64) must FAIL the gate before
the hash compare ever runs.

This class shipped twice — r2 ``etl_quality_profile`` and r8
``cusum_drift`` (the round's only red driver row): a windowed/plain
``sum()`` over BIGINT promotes to HUGEINT in DuckDB, ``fetchall()``
hides it (Python ints), and the driver's pandas path renders it as
float64 ("38670.0" vs Spark's "38670"). The guard makes the gate, not
vigilance, stop the third shipment.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from check_oracle import _norm, oracle_type_problems  # noqa: E402


@pytest.fixture()
def con():
    c = duckdb.connect()
    yield c
    c.close()


def test_uncast_sum_over_bigint_is_flagged(con):
    # the exact cusum_drift failure shape: windowed sum(BIGINT) → HUGEINT
    bad = """
    WITH d AS (SELECT * FROM (VALUES (1, CAST(10 AS BIGINT)),
                                     (2, CAST(20 AS BIGINT))) t(k, v))
    SELECT k, sum(v) OVER (ORDER BY k) AS running FROM d
    """
    problems = oracle_type_problems(con, bad)
    assert problems == ["running:HUGEINT"]


def test_plain_aggregate_sum_is_flagged(con):
    # non-windowed sum(BIGINT) promotes too (the r2 etl_quality_profile shape)
    bad = "SELECT sum(CAST(5 AS BIGINT)) AS total"
    assert oracle_type_problems(con, bad) == ["total:HUGEINT"]


def test_cast_output_passes(con):
    ok = "SELECT CAST(sum(CAST(5 AS BIGINT)) AS BIGINT) AS total"
    assert oracle_type_problems(con, ok) == []


def test_every_registered_oracle_is_pandas_safe(con):
    """DESCRIBE all registered oracles against empty views of the real
    table schemas: no oracle may emit a HUGEINT output column. (The r8
    judge's audit found exactly one — cusum_drift — now cast.)"""
    import __spark_entry__ as ent
    from light_etl_windows_container_poc_spark.catalog import TABLES, table_path

    sf_dir = "/root/testdata/sf0.001"
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{table_path(sf_dir, t)}')")
    offenders = {}
    for name, sql in ent.oracle_sql().items():
        problems = oracle_type_problems(con, sql)
        if problems:
            offenders[name] = problems
    assert not offenders, f"uncast HUGEINT oracle outputs: {offenders}"


def test_norm_unwraps_numpy_scalars():
    """Through the pandas path, values arrive as numpy scalars; they must
    normalize identically to Spark's Python scalars (np.bool_ is NOT a
    Python bool — unguarded, True would hash as 'True' vs Spark's '1')."""
    np = pytest.importorskip("numpy")
    assert _norm(np.bool_(True)) == _norm(True) == "1"
    assert _norm(np.int64(38670)) == _norm(38670) == "38670"
    assert _norm(np.float64(38670.0)) == _norm(38670.0) == "38670"
    assert _norm(np.float64(0.25)) == _norm(0.25) == "0.25"


def test_norm_matches_driver_pandas_equivalences():
    """Two renderings the driver's pandas fetch cannot distinguish —
    numeric NULL vs NaN, DATE vs midnight Timestamp — must normalize
    equal locally too, or every nullable-numeric / date-typed oracle
    goes red through the pandas path while staying driver-green."""
    import datetime

    assert _norm(float("nan")) == _norm(None) == "NULL"
    assert (_norm(datetime.date(2024, 1, 1))
            == _norm(datetime.datetime(2024, 1, 1))
            == "2024-01-01 00:00:00")
