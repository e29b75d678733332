"""Round-8 breadth: z-order physical write path (footer-level file
skipping), curation v2 composite, streaming MG certification."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from light_etl_windows_container_poc_spark.catalog import load_tables
from light_etl_windows_container_poc_spark.plans import formatted_plan
from light_etl_windows_container_poc_spark.queries.breadth30 import _z_terms
from light_etl_windows_container_poc_spark.queries.registry import QUERIES


def _file_minmax(path, cols):
    """Per-file min/max from the parquet footers (what a lake engine's
    file-skipping index actually reads)."""
    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i
               for i in range(len(md.schema.names))}
        mins = {c: None for c in cols}
        maxs = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            for c in cols:
                st = md.row_group(rg).column(idx[c]).statistics
                mins[c] = st.min if mins[c] is None else min(mins[c], st.min)
                maxs[c] = st.max if maxs[c] is None else max(maxs[c], st.max)
        out.append((f, mins, maxs))
    return out


def _orders_xy(spark, sf_dir):
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    return orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_custkey").alias("x"),
        F.greatest(
            F.datediff(F.col("o_orderdate").cast("date"),
                       F.lit("1992-01-01").cast("date")).cast("long"),
            F.lit(0).cast("long")).alias("y"))


def test_zorder_layout_skips_more_files_than_single_key(spark, sf_dir,
                                                        tmp_path):
    """The lake lever: on the same file budget, the z-ordered layout's
    per-file (x, y) rectangles exclude the 2-D probe box from MORE
    files than a custkey-sorted layout (whose files span the full y
    range). Asserted from the parquet footers — engine-independent."""
    base = _orders_xy(spark, sf_dir)
    # a WIDE x band (half the key range) × a narrow y window: the box
    # shape single-key clustering is worst at — x alone barely prunes,
    # so the y dimension has to do the work, and only the z layout
    # gives files tight y rectangles. (The certified query's narrow
    # box is the pruning-soundness case; this is the layout-win case.)
    box = base.agg(
        F.expr("CAST(max(x) * 25 div 100 AS BIGINT)").alias("lo_x"),
        F.expr("CAST(max(x) * 75 div 100 AS BIGINT)").alias("hi_x"),
        F.expr("CAST(min(y) + (max(y) - min(y)) * 40 div 100 AS BIGINT)")
        .alias("lo_y"),
        F.expr("CAST(min(y) + (max(y) - min(y)) * 45 div 100 AS BIGINT)")
        .alias("hi_y")).collect()[0]

    zp = str(tmp_path / "zorder")
    kp = str(tmp_path / "bykey")
    z = base.withColumn("zv", F.expr(_z_terms("x", "y", "", True)))
    (z.repartitionByRange(16, "zv").sortWithinPartitions("zv")
     .write.parquet(zp))
    (base.repartitionByRange(16, "x").sortWithinPartitions("x")
     .write.parquet(kp))

    def candidates(path):
        hits = 0
        files = _file_minmax(path, ["x", "y"])
        for _, mins, maxs in files:
            if (maxs["x"] >= box["lo_x"] and mins["x"] <= box["hi_x"]
                    and maxs["y"] >= box["lo_y"]
                    and mins["y"] <= box["hi_y"]):
                hits += 1
        return hits, len(files)

    z_hit, z_tot = candidates(zp)
    k_hit, k_tot = candidates(kp)
    assert z_tot == k_tot == 16
    # both layouts must prune SOMETHING and z must prune strictly more
    assert z_hit < k_hit, (z_hit, k_hit)
    assert z_hit < z_tot


def test_zorder_roundtrip_plan_pushes_box_filter(spark, sf_dir):
    plan = formatted_plan(QUERIES["zorder_write_roundtrip"](spark, sf_dir))
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(x" in plan and "LessThanOrEqual(y" in plan


def test_curate_corpus_v2_shape(spark, sf_dir):
    rows = QUERIES["curate_corpus_v2"](spark, sf_dir).collect()
    assert rows, "composite produced no groups"
    splits = {r["split"] for r in rows}
    assert "train" in splits
    for r in rows:
        assert r["n_docs"] >= 1
        assert r["total_tokens"] >= r["n_docs"]  # gate requires >=20 words
        assert 1 <= r["n_shards"] <= 16
        assert r["n_bins"] >= 1


def test_curate_corpus_v2_mix_is_selective(spark, sf_dir):
    """The budget stage must actually select (non-vacuous): the
    composite's surviving token mass stays within the per-source quota
    envelope — kept tokens <= ~2x budget (md5 buckets are uniform, the
    slack covers granularity), and strictly fewer docs than the
    pre-mix pipeline would keep with fraction 1."""
    from light_etl_windows_container_poc_spark.queries.breadth31 import \
        _V2_BUDGET_TOKENS

    rows = QUERIES["curate_corpus_v2"](spark, sf_dir).collect()
    total = sum(r["total_tokens"] for r in rows)
    assert total <= 2 * _V2_BUDGET_TOKENS, total


def test_stream_heavy_hitters_cert_all_green(spark, sf_dir):
    rows = QUERIES["stream_heavy_hitters_cert"](spark, sf_dir).collect()
    assert rows
    assert all(r["cert_ok"] == 1 for r in rows)
    assert any(r["heavy"] == 1 for r in rows), "threshold vacuous"


# --------------------------------------------------------------------------
# Incremental z-order OPTIMIZE (operators/zorder.py)
# --------------------------------------------------------------------------

def _zsplit(spark, sf_dir):
    base = _orders_xy(spark, sf_dir)
    main = base.filter(F.col("k") % 7 != 0)
    d1 = base.filter(F.col("k") % 7 == 0).filter(F.col("k") % 2 == 0)
    d2 = base.filter(F.col("k") % 7 == 0).filter(F.col("k") % 2 == 1)
    return base, main, d1, d2


def test_zorder_optimize_roundtrip_and_incrementality(spark, sf_dir,
                                                      tmp_path):
    """write → two delta appends → optimize: read-back row-exact at
    every step, only overlapped files rewritten (unaffected files are
    HARDLINKED — same inode), and the optimized footers are tight
    again (every row's zv inside its file's range)."""
    from light_etl_windows_container_poc_spark.operators.zorder import (
        _file_z_ranges, append_zorder_delta, optimize_zorder,
        read_zordered, write_zordered)

    base, main, d1, d2 = _zsplit(spark, sf_dir)
    path = str(tmp_path / "ztab")
    write_zordered(main, path, "x", "y", n_files=8)
    append_zorder_delta(d1, path, "x", "y")
    append_zorder_delta(d2, path, "x", "y")

    def ids(df):
        return sorted(r["k"] for r in df.select("k").collect())

    all_ids = ids(base)
    assert ids(read_zordered(spark, path)) == all_ids

    before = {f: os.stat(f).st_ino
              for f, _, _ in _file_z_ranges(path)}
    stats = optimize_zorder(spark, path)
    assert stats["delta_files"] >= 2
    assert stats["rewritten"] >= 1
    # row-exact after fold, delta drained
    assert ids(read_zordered(spark, path)) == all_ids
    assert not os.listdir(os.path.join(path, "_delta"))
    # incrementality: every linked file kept its inode (no data copied)
    after = {f: os.stat(f).st_ino for f, _, _ in _file_z_ranges(path)}
    shared = [f for f in after
              if os.path.basename(f) in
              {os.path.basename(b) for b in before}]
    assert len(shared) == stats["linked"]
    for f in shared:
        old = {os.path.basename(b): i for b, i in before.items()}
        assert after[f] == old[os.path.basename(f)], "linked file copied"
    # footers tight: ranges non-overlapping-ish and contain their rows
    ranges = _file_z_ranges(path)
    import pyarrow.parquet as pq
    for f, lo, hi in ranges:
        t = pq.read_table(f, columns=["zv"])
        zs = t.column("zv").to_pylist()
        assert min(zs) >= lo and max(zs) <= hi


def test_zorder_optimize_crash_window_and_resweep(spark, sf_dir,
                                                  tmp_path):
    """The manifest window: after the generation swap the folded delta
    files may still exist — readers must SKIP them (manifest), and the
    next optimize sweeps them without re-applying."""
    import json as _json

    from light_etl_windows_container_poc_spark.operators.zorder import (
        append_zorder_delta, optimize_zorder, read_zordered,
        write_zordered)

    base, main, d1, d2 = _zsplit(spark, sf_dir)
    path = str(tmp_path / "ztab")
    write_zordered(main, path, "x", "y", n_files=4)
    append_zorder_delta(d1, path, "x", "y")
    optimize_zorder(spark, path)

    def ids(df):
        return sorted(r["k"] for r in df.select("k").collect())

    want = sorted(set(ids(main.unionByName(d1))))
    assert ids(read_zordered(spark, path)) == want

    # simulate the crash window: resurrect an applied delta file name
    man = _json.load(open(os.path.join(path, "_applied_delta.json")))
    assert man["applied"]
    ghost = os.path.join(path, "_delta", man["applied"][0])
    d1.limit(5).withColumn(
        "zv", F.lit(0).cast("long")).write.mode("overwrite").parquet(
        str(tmp_path / "ghost"))
    import glob as _glob
    import shutil as _shutil
    src = _glob.glob(str(tmp_path / "ghost" / "*.parquet"))[0]
    _shutil.copy(src, ghost)
    # readers skip it (manifest), so the view is unchanged
    assert ids(read_zordered(spark, path)) == want
    # next optimize sweeps it without folding it again
    append_zorder_delta(d2, path, "x", "y")
    optimize_zorder(spark, path)
    want2 = sorted(set(want) | set(ids(d2)))
    assert ids(read_zordered(spark, path)) == want2
    assert not os.path.exists(ghost)


# --------------------------------------------------------------------------
# Hilbert curve (operators/zorder.py)
# --------------------------------------------------------------------------

def test_hilbert_reference_is_bijective_and_adjacent():
    """The property that defines the curve: on a 2^b x 2^b grid the
    index is a bijection onto [0, 4^b) and consecutive indexes are
    UNIT grid steps (the locality z-order lacks — Morton jumps at
    quadrant seams)."""
    from light_etl_windows_container_poc_spark.operators.zorder import \
        hilbert_d_py

    n = 16
    seen = {}
    for x in range(n):
        for y in range(n):
            d = hilbert_d_py(x, y, bits=4)
            assert 0 <= d < n * n and d not in seen
            seen[d] = (x, y)
    for d in range(1, n * n):
        (x0, y0), (x1, y1) = seen[d - 1], seen[d]
        assert abs(x0 - x1) + abs(y0 - y1) == 1


def test_hilbert_df_matches_reference(spark, sf_dir):
    from light_etl_windows_container_poc_spark.operators.zorder import (
        hilbert_d_py, hilbert_df)

    base = _orders_xy(spark, sf_dir).limit(300)
    rows = hilbert_df(base, "x", "y", out_col="hv", bits=16).collect()
    assert rows
    for r in rows:
        assert r["hv"] == hilbert_d_py(int(r["x"]), int(r["y"]), 16)


def test_hilbert_prunes_at_least_as_tight_as_zorder(spark, sf_dir):
    """On the certified zone budget, Hilbert's candidate zones and
    scanned rows never exceed z-order's (unit-step locality can only
    tighten the per-zone rectangles on this box family)."""
    rows = {r["layout"]: r for r in
            QUERIES["hilbert_zone_prune"](spark, sf_dir).collect()}
    assert set(rows) == {"hilbert", "zorder", "custkey_sort"}
    h, z = rows["hilbert"], rows["zorder"]
    assert h["rows_scanned"] <= z["rows_scanned"], (h, z)
    assert h["candidate_zones"] <= z["candidate_zones"], (h, z)
    # pruning is sound for every layout: scanned >= rows actually in box
    for r in rows.values():
        assert r["rows_scanned"] >= r["rows_in_box"]


def test_zorder_optimize_roundtrip_hilbert_curve(spark, sf_dir, tmp_path):
    """The maintenance machinery is curve-agnostic: the same
    write → append → optimize → read loop is row-exact when the table
    is clustered on the Hilbert index instead of the Morton one."""
    from light_etl_windows_container_poc_spark.operators.zorder import (
        append_zorder_delta, optimize_zorder, read_zordered,
        write_zordered)

    base, main, d1, d2 = _zsplit(spark, sf_dir)
    path = str(tmp_path / "htab")
    write_zordered(main, path, "x", "y", n_files=6, curve="hilbert")
    append_zorder_delta(d1, path, "x", "y", curve="hilbert")
    append_zorder_delta(d2, path, "x", "y", curve="hilbert")

    def ids(df):
        return sorted(r["k"] for r in df.select("k").collect())

    assert ids(read_zordered(spark, path)) == ids(base)
    stats = optimize_zorder(spark, path)
    assert stats["delta_files"] >= 2
    assert ids(read_zordered(spark, path)) == ids(base)
