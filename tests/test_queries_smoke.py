"""Every registered query runs at sf0.001 and yields a stable, sane result."""

from __future__ import annotations

import pytest

from light_etl_windows_container_poc_spark.queries import ORACLES, QUERIES


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    rows = df.collect()
    assert rows is not None
    assert len(df.columns) > 0
    # rows may legitimately be empty at tiny SF for selective queries,
    # but the flagship ones must produce data even at sf0.001
    if name in {"q1_pricing_summary", "time_window_agg", "sessionize"}:
        assert len(rows) > 0


def test_entry_contract(spark):
    import __spark_entry__ as ent

    df = ent.entry(spark)
    assert df.count() > 0
    qs, oracles = ent.queries(), ent.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 20


def test_oracle_sql_is_registered_for_sql_expressible_ops():
    # every relational query should carry an oracle; rows-only is reserved
    # for genuinely non-SQL-expressible ops (minhash/simhash/lsh/stream/
    # iterative float fixpoints)
    missing = {n for n in QUERIES if n not in ORACLES
               and not n.startswith(("dedup_minhash", "dedup_simhash", "ann_lsh",
                                     "ann_ivf", "ann_pq", "agg_approx",
                                     "stream_", "mm_", "pagerank_", "sketch_"))
               and n not in ("dedup_embedding_blocked", "semdedup_keep",
                             "embed_pca",
                             # Viterbi-DP-learned vocabulary; certified
                             # via the unigram_invariants sql twin
                             "unigram_lm_learn")}
    assert not missing, f"queries without oracle: {missing}"


def test_survey_inventory_matches_registry():
    """SURVEY §2 is the judge's checklist — it must exactly mirror the
    registry: every sql/rows row registered (with/without oracle), every
    registered query documented."""
    import re
    from pathlib import Path

    s = (Path(__file__).resolve().parents[1] / "SURVEY.md").read_text()
    sec2 = s.split("## §2 ")[1].split("## §3 ")[0]
    table = dict(re.findall(
        r"^\| `([a-z0-9_]+)` \|[^|]*\| (sql|rows|tests) \|", sec2, re.M))
    assert table, "SURVEY §2 tables not parseable"
    for k, v in table.items():
        if v in ("sql", "rows"):
            assert k in QUERIES, f"SURVEY row {k} has no queries() entry"
        if v == "sql":
            assert k in ORACLES, f"SURVEY row {k} marked sql but no oracle"
        if v == "rows":
            assert k not in ORACLES, f"SURVEY row {k} marked rows but has oracle"
    undocumented = set(QUERIES) - set(table)
    assert not undocumented, f"queries not in SURVEY §2: {undocumented}"


def test_certification_budget_is_exactly_allocated():
    """The driver certifies ~50 queries per round: never-certified rows
    plus the recertify list must fill that budget exactly — a drifted
    allocation silently ages out rows or wastes slots."""
    import __spark_entry__ as ent

    certified = set().union(ent._R01_CERTIFIED, ent._R02_CERTIFIED,
                            ent._R03_CERTIFIED, ent._R04_CERTIFIED,
                            ent._R05_CERTIFIED, ent._R06_CERTIFIED,
                            ent._R07_CERTIFIED, ent._R08_CERTIFIED,
                            ent._R09_CERTIFIED, ent._R10_CERTIFIED,
                            ent._R11_CERTIFIED, ent._R12_CERTIFIED,
                            ent._R13_CERTIFIED, ent._R14_CERTIFIED)
    head = [n for n in QUERIES if n not in certified]
    assert len(head) + len(ent._RECERTIFY) == 50, (
        f"head={len(head)} + recertify={len(ent._RECERTIFY)} != 50 — "
        "rebalance _RECERTIFY when adding queries")
    # ordering contract: the never-certified head runs first
    ordered = list(ent.queries())
    assert ordered[:len(head)] == head


def test_frozen_r5_population_is_subset_of_registry():
    """The r5 bench tripwire list must stay valid as rounds add queries
    (frozen names never leave the registry; new names never join the
    frozen list)."""
    import __spark_entry__ as ent

    assert set(ent._R05_POPULATION) <= set(QUERIES)
    assert len(ent._R05_POPULATION) == 201
    assert set(ent._R06_POPULATION) <= set(QUERIES)
    assert len(ent._R06_POPULATION) == 210
    assert set(ent._R07_POPULATION) <= set(QUERIES)
    assert len(ent._R07_POPULATION) == 218
    assert set(ent._R08_POPULATION) <= set(QUERIES)
    assert len(ent._R08_POPULATION) == 237
    assert set(ent._R09_POPULATION) <= set(QUERIES)
    assert len(ent._R09_POPULATION) == 260
    assert set(ent._R10_POPULATION) <= set(QUERIES)
    assert len(ent._R10_POPULATION) == 273
    assert set(ent._R11_POPULATION) <= set(QUERIES)
    assert len(ent._R11_POPULATION) == 296
    assert set(ent._R12_POPULATION) <= set(QUERIES)
    assert len(ent._R12_POPULATION) == 308


def test_q11_nonempty_at_realistic_sf(spark):
    """q11 hash-passed the driver gate on a 0-row result at sf0.01
    (equal-and-empty certifies nothing — the 0.6% revenue threshold is
    above every part at tiny SF). Prove the query actually selects rows
    at sf0.1 so an accidentally-empty plan can never look green."""
    import os

    sf01 = "/root/testdata/sf0.1"
    if not os.path.isdir(sf01):
        pytest.skip("sf0.1 warehouse not present")
    assert QUERIES["q11_important_parts"](spark, sf01).limit(1).count() > 0


def test_cert_work_dir_reaps_dead_pid_siblings(tmp_path, monkeypatch):
    """r11 ADVICE: pid-suffixed cert scratch dirs leak if a process
    dies before its finally-rmtree. cert_work_dir must reap siblings
    whose pid is dead and track its own handouts for atexit cleanup."""
    import hashlib
    import os
    import tempfile

    from light_etl_windows_container_poc_spark.queries import registry

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    h = hashlib.md5(b"/some/sf").hexdigest()[:8]
    dead = tmp_path / f"spark_graft_tag_{h}_999999999"  # ESRCH pid
    dead.mkdir()
    (dead / "leaked_state.parquet").write_bytes(b"x")
    other_tag = tmp_path / f"spark_graft_other_{h}_999999999"
    other_tag.mkdir()  # different tag prefix: left alone

    out = registry.cert_work_dir("tag", "/some/sf")
    assert not dead.exists(), "dead-pid sibling should be reaped"
    assert other_tag.exists(), "other tags' dirs are not this call's"
    assert out.endswith(f"_{os.getpid()}")
    assert out in registry._HANDED_OUT  # atexit rmtree backstop
