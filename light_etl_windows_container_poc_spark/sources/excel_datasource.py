"""Excel as a first-class Spark data source (Spark 4 Python DataSource
API): ``spark.read.format("excel").schema(ddl).option("sheet", ...)
.load(path)``.

Same dependency-free codecs as `read_excel` (SpreadsheetML / BIFF8 /
BIFF12, covering the reference fileserver's accepted set,
fileserver.py:41-44), exposed through the standard reader UX instead of
the binaryFile+mapInPandas composition. Planning is driver-side file
listing only; each workbook is ONE input partition, so a directory of
files decodes in parallel across executors and a 100 TB lake of
spreadsheets scales with the file count. Rows are yielded as tuples in
schema order — Spark applies the user schema, so column pruning is the
schema itself (list only the columns you need plus `usecols`).

Register once per session:

    from light_etl_windows_container_poc_spark.sources.excel_datasource \
        import ExcelDataSource
    spark.dataSource.register(ExcelDataSource)

Executors must be able to import this package —
`session.ensure_package_on_executors(spark)` (a no-op re-add on a real
cluster where --py-files did it at submit).

Options: ``sheet`` (index or name, default 0), ``skiprows``, ``nrows``,
``usecols`` (Excel letter ranges, e.g. "A:C,E"), ``on_error``
(raise | quarantine — quarantine skips undecodable workbooks).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    DataSourceWriter, InputPartition,
                                    SimpleDataSourceStreamReader,
                                    WriterCommitMessage)
from pyspark.sql.types import StructType

_EXCEL_EXTS = (".xlsx", ".xlsm", ".xls", ".xlsb")


class _WorkbookPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _list_workbooks(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    found: list[str] = []
    for root, _dirs, files in os.walk(path):
        for fn in sorted(files):
            if fn.lower().endswith(_EXCEL_EXTS):
                found.append(os.path.join(root, fn))
    if not found:
        raise FileNotFoundError(f"no Excel workbooks under {path}")
    return found


class ExcelDataSourceReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.options = options
        self.path = options.get("path")
        if not self.path:
            raise ValueError("excel data source requires a load(path)")

    def partitions(self) -> list[InputPartition]:
        # one workbook per partition: decode parallelism == file count
        return [_WorkbookPartition(p) for p in _list_workbooks(self.path)]

    def read(self, partition: _WorkbookPartition) -> Iterator[tuple]:
        # imports stay inside read(): executed on executors, where the
        # package arrives via addPyFile / --py-files
        from .files import parse_workbook

        opts = self.options
        sheet = opts.get("sheet", "0")
        sheet = int(sheet) if str(sheet).lstrip("-").isdigit() else sheet
        on_error = opts.get("on_error", "raise")
        try:
            # open() sits INSIDE the guard: quarantine must also cover a
            # file deleted/moved between listing and read (and checkpoint-
            # recovery replay via readBetweenOffsets must skip such files)
            with open(partition.path, "rb") as fh:
                raw = fh.read()
            pdf = parse_workbook(
                raw, path=partition.path, sheet_name=sheet,
                skiprows=int(opts["skiprows"]) if "skiprows" in opts
                else None,
                nrows=int(opts["nrows"]) if "nrows" in opts else None,
                usecols=opts.get("usecols"))
        except Exception:
            if on_error == "quarantine":
                return
            raise
        names = [f.name for f in self.schema.fields]
        missing = [n for n in names
                   if n != "source_path" and n not in pdf.columns]
        if missing:
            raise ValueError(
                f"{partition.path}: schema columns {missing} not in "
                f"workbook columns {list(pdf.columns)}")
        for _, row in pdf.iterrows():
            yield tuple(
                partition.path if n == "source_path"
                else (None if row[n] is None or row[n] != row[n]
                      else (row[n].item() if hasattr(row[n], "item")
                            else row[n]))
                for n in names)


class ExcelDataSource(DataSource):
    """``format("excel")`` — schema must be supplied by the caller
    (`.schema(ddl)`); add a `source_path string` field to get file
    provenance per row.

    Also readable as a STREAM (``spark.readStream.format("excel")``):
    each micro-batch picks up workbooks that are new or modified since
    the last committed offset — the reference watcher's poll loop
    (`pattern_based_cleaner_watcher.py:239-314`: NEW/MODIFIED by mtime,
    empty-file skip) as a real Structured Streaming source, which the
    built-in file source cannot do for Excel payloads."""

    @classmethod
    def name(cls) -> str:
        return "excel"

    def schema(self) -> str:
        raise ValueError(
            "excel data source needs an explicit .schema(ddl) — header "
            "inference would re-decode every workbook at plan time")

    def reader(self, schema: StructType) -> ExcelDataSourceReader:
        return ExcelDataSourceReader(schema, dict(self.options))

    def simpleStreamReader(self, schema: StructType) \
            -> "ExcelStreamReader":
        return ExcelStreamReader(schema, dict(self.options))

    def writer(self, schema: StructType,
               overwrite: bool) -> "ExcelDataSourceWriter":
        return ExcelDataSourceWriter(schema, dict(self.options), overwrite)


class _ExcelCommit(WriterCommitMessage):
    def __init__(self, filename: str | None, rows: int):
        self.filename = filename
        self.rows = rows


class ExcelDataSourceWriter(DataSourceWriter):
    """``df.write.format("excel").save(dir)`` — one workbook per
    non-empty partition (`part-<uuid>.xlsx`, header row = schema field
    names), written via the same dependency-free SpreadsheetML builder
    the tests round-trip through the reader.

    Commit protocol: partitions write to dot-prefixed temp names (Spark
    path filters ignore them), the driver-side commit renames them into
    place and drops a _SUCCESS marker, abort removes the temps — a
    failed job never leaves half-visible workbooks. Option
    ``sheet_name`` names the sheet (default Sheet1). Spark's Python
    data sources accept only Append/Overwrite save modes — use
    ``.mode("append")`` for a first write too."""

    def __init__(self, schema: StructType, options: dict,
                 overwrite: bool):
        self.schema = schema
        self.options = options
        self.overwrite = overwrite
        self.path = options.get("path")
        if not self.path:
            raise ValueError("excel writer requires a save(path)")
        # overwrite deletion is DEFERRED to commit(): clearing the target
        # here would leave an empty directory if the job then fails,
        # breaking the no-half-visible-output guarantee below
        os.makedirs(self.path, exist_ok=True)

    def write(self, iterator) -> _ExcelCommit:
        import uuid

        from .xlsx import build_xlsx_bytes

        header = [f.name for f in self.schema.fields]
        grid = [header]
        for row in iterator:
            grid.append([row[n] for n in header])
        if len(grid) == 1:
            return _ExcelCommit(None, 0)
        name = f"part-{uuid.uuid4().hex[:12]}.xlsx"
        tmp = os.path.join(self.path, f".{name}.tmp")
        with open(tmp, "wb") as fh:
            fh.write(build_xlsx_bytes(
                {self.options.get("sheet_name", "Sheet1"): grid}))
        return _ExcelCommit(name, len(grid) - 1)

    def commit(self, messages) -> None:
        new_names = {m.filename for m in messages if m and m.filename}
        for name in new_names:
            os.replace(os.path.join(self.path, f".{name}.tmp"),
                       os.path.join(self.path, name))
        if self.overwrite:
            # only after the new parts are renamed into place: drop the
            # PRE-EXISTING visible entries (new part names are uuids — no
            # collisions). A failure at any earlier point leaves the old
            # data intact; a crash mid-sweep leaves old+new visible but
            # never an empty directory.
            import shutil
            for fn in os.listdir(self.path):
                full = os.path.join(self.path, fn)
                if fn.startswith(".") or fn in new_names:
                    continue
                try:
                    if os.path.isdir(full):
                        shutil.rmtree(full)
                    else:
                        os.remove(full)
                except OSError:
                    pass
        with open(os.path.join(self.path, "_SUCCESS"), "w"):
            pass

    def abort(self, messages) -> None:
        for m in messages:
            if m and m.filename:
                try:
                    os.remove(os.path.join(self.path, f".{m.filename}.tmp"))
                except OSError:
                    pass


def _decode_rows(path: str, schema: StructType,
                 options: dict) -> Iterator[tuple]:
    """Shared decode → schema-ordered tuples (batch partitions and
    stream batches emit identical rows for the same file)."""
    reader = ExcelDataSourceReader(schema, {**options, "path": path})
    return reader.read(_WorkbookPartition(path))


class ExcelStreamReader(SimpleDataSourceStreamReader):
    """Offsets are the seen-set: ``{"seen": {path: mtime_ns}}``. A file
    is picked up when its path is unseen OR its mtime advanced (the
    reference's NEW/MODIFIED detection); empty files are skipped like
    the reference's empty-file guard. `readBetweenOffsets` replays a
    committed range deterministically from the offset delta, which is
    what checkpoint recovery requires. The seen-set lives in the offset
    log — fine for directory-scale inputs like the reference's shared
    drive; a lake-scale deployment would compact it into a state table
    (`scale_discovery` has that shape).

    Driver-memory bounds: the Simple stream API decodes on the DRIVER
    (its contract), so rows flow through a lazy generator — at most one
    workbook's rows are decoded at a time, never a batch-sized list.
    ``maxFilesPerTrigger`` (default unlimited) additionally caps each
    micro-batch's file count for CONTINUOUS streams, where the backlog
    then drains across triggers. Measured caveat: one availableNow run
    takes a single read() snapshot under this API, so with a cap it
    drains at most that many files per run — leave the cap unset for
    drain-everything availableNow semantics. For a heavy one-shot
    backfill, the BATCH reader (`format("excel")`, one partition per
    workbook on executors) is the right tool; this stream exists for
    the watcher's steady drip.
    """

    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.options = options
        self.path = options.get("path")
        self.max_files = int(options.get("maxfilespertrigger",
                                         options.get("maxFilesPerTrigger",
                                                     0)))
        if not self.path:
            raise ValueError("excel stream requires a load(path)")

    def initialOffset(self) -> dict:
        return {"seen": {}}

    def _scan(self) -> dict[str, int]:
        out: dict[str, int] = {}
        if os.path.isdir(self.path):
            for root, _dirs, files in os.walk(self.path):
                for fn in sorted(files):
                    if fn.lower().endswith(_EXCEL_EXTS):
                        p = os.path.join(root, fn)
                        st = os.stat(p)
                        if st.st_size > 0:
                            out[p] = st.st_mtime_ns
        elif os.path.isfile(self.path):
            st = os.stat(self.path)
            if st.st_size > 0:
                out[self.path] = st.st_mtime_ns
        return out

    def _new_files(self, start: dict, end: dict) -> list[str]:
        seen = start.get("seen", {})
        return [p for p, m in sorted(end.get("seen", {}).items())
                if p not in seen or seen[p] < m]

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        import itertools

        scanned = self._scan()
        fresh = self._new_files(start, {"seen": scanned})
        picked = fresh[:self.max_files] if self.max_files > 0 else fresh
        # end offset covers ONLY the picked files (plus what was already
        # seen): the rest of the backlog arrives in later micro-batches
        seen = dict(start.get("seen", {}))
        seen.update({p: scanned[p] for p in picked})
        end = {"seen": seen}
        rows = itertools.chain.from_iterable(
            _decode_rows(p, self.schema, self.options) for p in picked)
        return rows, end

    def readBetweenOffsets(self, start: dict,
                           end: dict) -> Iterator[tuple]:
        for p in self._new_files(start, end):
            yield from _decode_rows(p, self.schema, self.options)

    def commit(self, end: dict) -> None:
        pass  # offsets are self-contained; nothing external to release
