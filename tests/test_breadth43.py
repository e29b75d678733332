"""Round-12 head candidate pre-certified through the EXACT local-gate
compare (tools/check_oracle's pandas fetch + frame_fingerprint) at
sf0.001 — queries/breadth42.py registers pipeline_e2e_stream_cert in a
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
from light_etl_windows_container_poc_spark.queries.breadth42 import (  # noqa: E402
    PIPELINE_E2E_STREAM_ORACLE,
    pipeline_e2e_stream_cert,
)


@pytest.fixture()
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{table_path(sf_dir, t)}')")
    yield c
    c.close()


def test_pipeline_e2e_stream_cert_gate_green(spark, sf_dir, con):
    assert oracle_type_problems(con, PIPELINE_E2E_STREAM_ORACLE) == []
    sdf = pipeline_e2e_stream_cert(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    odf = con.execute(PIPELINE_E2E_STREAM_ORACLE).df()
    ocols, orows = list(odf.columns), _pandas_rows(odf)
    assert len(srows) == len(orows) == 2  # one row per routed table
    assert sorted(scols) == sorted(ocols)
    assert frame_fingerprint(scols, srows) == frame_fingerprint(ocols, orows)
