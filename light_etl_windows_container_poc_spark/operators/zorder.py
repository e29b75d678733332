"""Z-ordered table maintenance: write, append, and INCREMENTAL
optimize — the lake-layout loop Delta's ``OPTIMIZE ZORDER BY`` runs,
re-expressed over plain parquet directories.

Layout:

    table/
      part-*.parquet        the z-sorted generation (each file covers a
                            contiguous zv range => a tight (x, y)
                            rectangle in the parquet footers)
      _delta/*.parquet      unsorted appends since the last optimize
      _applied_delta.json   delta files already folded into the sorted
                            generation (see crash-safety below)

Readers (`read_zordered`) take the sorted generation plus every delta
file not named by the manifest — Spark ignores underscore-prefixed
entries, so the staging/manifest machinery is invisible to a plain
``spark.read.parquet`` of the sorted files.

INCREMENTAL optimize: only the sorted files whose footer zv range
overlaps an arriving delta row are rewritten; untouched files are
HARDLINKED into the staging generation (same-filesystem metadata op,
no data copied) — IO cost follows the affected fraction, not the table
size. On an object store the hardlink becomes a metadata-layer copy
(manifest pointer), which is exactly what table formats exist to
provide; the parquet layout and affected-range math here are unchanged.

Crash-safety (the heavy-hitters manifest pattern): the new generation
is staged (links + rewritten files + an ``_applied_delta.json`` naming
every delta file folded in) and swapped in with the crash-safe
two-rename `_swap_in`. The manifest travels ATOMICALLY with the swap,
so the window "new generation live, old delta not yet deleted" cannot
double-count — readers skip manifest-named delta files. The next
optimize (or the tail of this one) sweeps them.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_DELTA = "_delta"
_MANIFEST = "_applied_delta.json"


def z_expr(x: str, y: str, bits: int = 16) -> Column:
    """BIGINT Morton interleave of the low ``bits`` of two non-negative
    integer columns. Same 16-bit envelope note as breadth30's certified
    form: keys above 2^bits-1 alias (pruning stays sound, zones get
    looser); widen bits or pre-shift for larger key domains."""
    terms = []
    for i in range(bits):
        terms.append(f"shiftleft(shiftright({x}, {i}) & 1, {2 * i})")
        terms.append(f"shiftleft(shiftright({y}, {i}) & 1, {2 * i + 1})")
    return F.expr(" + ".join(terms)).cast("long")


def _with_curve(df: DataFrame, x_col: str, y_col: str, bits: int,
                curve: str) -> DataFrame:
    """Append the clustering key ``zv`` under the chosen space-filling
    curve. The maintenance machinery below (optimize/read) is
    curve-agnostic — it only ever sees the ``zv`` column — so a table's
    curve is fixed at write time and appends must reuse it."""
    if curve == "morton":
        return df.withColumn("zv", z_expr(x_col, y_col, bits))
    if curve == "hilbert":
        return hilbert_df(df, x_col, y_col, out_col="zv", bits=bits)
    raise ValueError(f"unknown curve {curve!r}")


def write_zordered(df: DataFrame, path: str, x_col: str, y_col: str,
                   n_files: int = 16, bits: int = 16,
                   curve: str = "morton") -> None:
    """Land ``df`` physically curve-ordered: range-partition on zv,
    sort within files, so every file's footer carries a tight rectangle
    in BOTH dimensions (``curve="hilbert"`` for the unit-step-locality
    variant — see `hilbert_d_py`)."""
    z = _with_curve(df, x_col, y_col, bits, curve)
    (z.repartitionByRange(n_files, "zv").sortWithinPartitions("zv")
     .write.mode("overwrite").parquet(path))


def append_zorder_delta(df: DataFrame, path: str, x_col: str, y_col: str,
                        bits: int = 16, curve: str = "morton") -> None:
    """Fast append: land the batch (with its zv, SAME curve as the
    table was written with) UNSORTED under ``_delta/`` — arrival cost
    is a plain write; the layout debt is paid by the next
    `optimize_zorder`, not the ingest path."""
    z = _with_curve(df, x_col, y_col, bits, curve)
    z.write.mode("append").parquet(os.path.join(path, _DELTA))


def _applied(path: str) -> set[str]:
    p = os.path.join(path, _MANIFEST)
    if not os.path.exists(p):
        return set()
    with open(p) as f:
        return set(json.load(f)["applied"])


def _delta_files(path: str) -> list[str]:
    return sorted(
        f for f in glob.glob(os.path.join(path, _DELTA, "*.parquet"))
        if os.path.basename(f) not in _applied(path))


def read_zordered(spark: SparkSession, path: str) -> DataFrame:
    """Sorted generation ∪ unapplied delta. The sorted read is the
    pruned path (footer rectangles); delta is the small unsorted tail
    between optimizes."""
    cur = spark.read.parquet(path)
    delta = _delta_files(path)
    if not delta:
        return cur
    return cur.unionByName(spark.read.parquet(*delta))


def _file_z_ranges(path: str) -> list[tuple[str, int, int]]:
    """(file, zv_min, zv_max) from the parquet footers — the same
    metadata a lake engine's file index serves."""
    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        col = {md.schema.column(i).name: i
               for i in range(len(md.schema.names))}["zv"]
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col).statistics
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo is not None:
            out.append((f, int(lo), int(hi)))
    return out


def optimize_zorder(spark: SparkSession, path: str,
                    rows_per_file_hint: int | None = None) -> dict:
    """Fold the unapplied delta back into the sorted layout, rewriting
    ONLY the overlapped files. Returns counters for observability
    ({"rewritten", "linked", "delta_files"}). Ordering (each step safe
    to crash after):

    1. sweep delta files a previous optimize already applied;
    2. plan: footer z-ranges vs delta zv values → affected file set
       (delta rows beyond every range attach to the nearest file);
    3. stage the new generation: hardlink every UNAFFECTED file,
       rewrite each affected file merged+sorted with its delta rows,
       write the manifest naming the folded delta files;
    4. `_swap_in` (two atomic renames — old or new generation is
       always fully live, manifest included);
    5. delete the folded delta files (already invisible via the
       manifest, so this is pure storage sweep).
    """
    import shutil
    import tempfile

    from .ann_index import _swap_in

    # 1. sweep previously-applied delta
    for name in _applied(path):
        p = os.path.join(path, _DELTA, name)
        if os.path.exists(p):
            os.remove(p)

    delta = _delta_files(path)
    if not delta:
        return {"rewritten": 0, "linked": 0, "delta_files": 0}

    ranges = _file_z_ranges(path)
    # 2. per-file delta assignment: zv -> covering file, else nearest —
    # computed DISTRIBUTED (broadcast the k-row range relation, argmin
    # per zv, distinct file names out). The driver only ever sees the
    # <= #files affected-name set, never the delta's values; a
    # collect-the-delta plan would stop scaling exactly when optimize
    # matters most (a large arrival backlog).
    affected: set[str] = set()
    if ranges:
        rng = spark.createDataFrame(
            [(f, lo, hi) for f, lo, hi in ranges],
            "file string, lo long, hi long")
        d = spark.read.parquet(*delta).select("zv")
        gap = (F.when((F.col("zv") >= F.col("lo"))
                      & (F.col("zv") <= F.col("hi")), F.lit(0))
               .otherwise(F.least(F.abs(F.col("zv") - F.col("lo")),
                                  F.abs(F.col("zv") - F.col("hi")))))
        best = (d.crossJoin(F.broadcast(rng))
                .groupBy("zv")
                .agg(F.min(F.struct(gap.alias("gap"), F.col("file")))
                     .alias("b"))
                .select(F.col("b.file").alias("file")).distinct())
        affected = {r["file"] for r in best.collect()}

    parent = os.path.dirname(os.path.abspath(path)) or "."
    staging = tempfile.mkdtemp(prefix=".zorder_opt_", dir=parent)
    try:
        linked = 0
        for f, _, _ in ranges:
            if f not in affected:
                os.link(f, os.path.join(staging, os.path.basename(f)))
                linked += 1
        # 3. merged rewrite of the affected slice + all delta rows
        srcs = sorted(affected) + delta
        merged = spark.read.parquet(*srcs).sortWithinPartitions("zv")
        n_files = max(1, len(affected)) if rows_per_file_hint is None \
            else max(1, -(-merged.count() // rows_per_file_hint))
        part = os.path.join(staging, "_rewrite")
        (merged.repartitionByRange(n_files, "zv")
         .sortWithinPartitions("zv").write.parquet(part))
        for i, f in enumerate(
                sorted(glob.glob(os.path.join(part, "*.parquet")))):
            os.rename(f, os.path.join(staging, f"part-opt-{i:05d}.parquet"))
        shutil.rmtree(part)
        # delta dir must survive the swap — link unapplied-but-unfolded
        # files? (none: we fold ALL unapplied delta); recreate the dir
        # with the remaining files hardlinked so the swap preserves them
        os.makedirs(os.path.join(staging, _DELTA), exist_ok=True)
        for f in glob.glob(os.path.join(path, _DELTA, "*.parquet")):
            os.link(f, os.path.join(staging, _DELTA, os.path.basename(f)))
        with open(os.path.join(staging, _MANIFEST), "w") as fh:
            json.dump({"applied": [os.path.basename(f) for f in delta]},
                      fh)
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    _swap_in(staging, path)
    # 5. storage sweep (readers already skip these via the manifest)
    for f in delta:
        p = os.path.join(path, _DELTA, os.path.basename(f))
        if os.path.exists(p):
            os.remove(p)
    return {"rewritten": len(affected), "linked": linked,
            "delta_files": len(delta)}


# --------------------------------------------------------------------------
# Hilbert curve index — the better-locality alternative to the Morton
# interleave above (every unit step on the Hilbert curve is a unit step
# in the grid, so zone rectangles have no Morton "seams"; this is the
# clustering modern lakehouse OPTIMIZE implementations moved to).
# Expressed as `bits` chained integer projections (one per curve
# level), pure CASE/div/mod arithmetic — the same expression text runs
# in Spark and DuckDB, which is what makes the layout certifiable.
# --------------------------------------------------------------------------

def hilbert_d_py(x: int, y: int, bits: int = 16) -> int:
    """Pure-Python reference (Wikipedia xy2d): property-tested
    bijective + unit-step-adjacent; the SQL stages below are proven
    equal to this in tests."""
    n = 1 << bits
    d, s = 0, n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def hilbert_stage_exprs(x: str, y: str, d: str, lvl: int, bits: int,
                        dialect_spark: bool) -> tuple[str, str, str]:
    """(new_x, new_y, new_d) expression strings for one curve level —
    shared text modulo the integer-division spelling. All operands stay
    non-negative (coordinates live in [0, 2^bits)), so % and div are
    engine-identical."""
    div = "div" if dialect_spark else "//"
    n = 1 << bits
    s = 1 << lvl
    rx = f"(({x} {div} {s}) % 2)"
    ry = f"(({y} {div} {s}) % 2)"
    nd = (f"{d} + {s * s} * (CASE WHEN {rx} = 1 THEN "
          f"(CASE WHEN {ry} = 1 THEN 2 ELSE 3 END) ELSE {ry} END)")
    nx = (f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 "
          f"THEN {n - 1} - {y} ELSE {y} END) ELSE {x} END")
    ny = (f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 "
          f"THEN {n - 1} - {x} ELSE {x} END) ELSE {y} END")
    return nx, ny, nd


def hilbert_df(df: DataFrame, x_col: str, y_col: str,
               out_col: str = "hv", bits: int = 16) -> DataFrame:
    """Append the Hilbert index of (x_col, y_col) — `bits` chained
    codegen projections, all other columns passed through. Same 16-bit
    envelope as `z_expr` (keys above 2^bits-1 alias; pruning stays
    sound)."""
    cur = df.selectExpr("*", f"CAST({x_col} AS BIGINT) AS _hx",
                        f"CAST({y_col} AS BIGINT) AS _hy",
                        "CAST(0 AS BIGINT) AS _hd")
    keep = df.columns
    for lvl in range(bits - 1, -1, -1):
        nx, ny, nd = hilbert_stage_exprs("_hx", "_hy", "_hd", lvl, bits,
                                         dialect_spark=True)
        cur = cur.selectExpr(*keep, f"({nx}) AS _hx", f"({ny}) AS _hy",
                             f"({nd}) AS _hd")
    return cur.selectExpr(*keep, f"_hd AS {out_col}")


def hilbert_sql_ctes(base_cte: str, cols: str, x: str, y: str,
                     bits: int = 16, prefix: str = "h") -> str:
    """DuckDB CTE chain computing the same index: `{prefix}{bits}` is
    the base with (_hx, _hy, _hd) seeded; `{prefix}0` carries the final
    `_hd`. ``cols`` are passthrough columns kept at every stage."""
    parts = [f"{prefix}{bits} AS (SELECT {cols}, CAST({x} AS BIGINT) AS _hx,"
             f" CAST({y} AS BIGINT) AS _hy, CAST(0 AS BIGINT) AS _hd"
             f" FROM {base_cte})"]
    for lvl in range(bits - 1, -1, -1):
        nx, ny, nd = hilbert_stage_exprs("_hx", "_hy", "_hd", lvl, bits,
                                         dialect_spark=False)
        parts.append(
            f"{prefix}{lvl} AS (SELECT {cols}, ({nx}) AS _hx,"
            f" ({ny}) AS _hy, ({nd}) AS _hd FROM {prefix}{lvl + 1})")
    return ",\n".join(parts)
