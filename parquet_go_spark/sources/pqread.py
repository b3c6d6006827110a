"""``spark.read.format("pqread")`` — arbitrary parquet directories
decoded through OUR kernels with automatic filter pushdown.

The manual API is ``interop.pqreader.spark_read``; this Data Source
adds the declarative surface: a plain ``WHERE`` clause on the
DataFrame pushes down via Spark's ``pushFilters`` (Spark 4.1 Python
Data Source API) into the reader's stat/bloom row-group pruning and
ColumnIndex page skipping — the OpenFile + column_index.go read path
(/root/reference/file.go:65-130) behind a ``spark.read`` line.

Pushdown safety: ``read_table`` applies pushed predicates EXACTLY
(rows are dropped, not merely skipped-and-rechecked), so only
predicates whose semantics provably match Spark's comparison
semantics are pushed:

- float32 columns are never pushed — Spark compares FLOAT promoted to
  double, while the reader (like pyarrow) compares in float32; a
  literal that rounds DOWN to a float32 tick would drop rows Spark
  keeps. Everything else (ints, strings, binary, dates, timestamps,
  double, decimal, bool-free ops) compares identically.
- naive TimestampType literals anchor to UTC on the DRIVER (the
  executor OS tz can differ), exactly like the colcodec source.
- any predicate the reader cannot compile against the footer is
  silently not pushed (Spark re-applies every filter regardless).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType

from parquet_go_spark.sources.datasource import _anchor_tz


@dataclass
class _FileSlice(InputPartition):
    path: str


def _files_of(path: str) -> list[str]:
    files = sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )
    if not files:
        raise ValueError(f"pqread: no parquet files under {path}")
    return files


def _pushable_columns(probe) -> dict[str, str]:
    """column → spark-ish tz class for _anchor_tz; float32 and nested
    columns are excluded (see module docstring)."""
    import pyarrow as pa

    out = {}
    for field in probe:
        t = field.type
        if pa.types.is_float32(t):
            continue
        if pa.types.is_nested(t):
            continue
        if pa.types.is_timestamp(t):
            out[field.name] = "timestamp" if t.tz else "timestamp_ntz"
        else:
            out[field.name] = "scalar"
    return out


def _translate(filters, cols: dict[str, str]):
    preds = []
    for f in filters:
        attr = getattr(f, "attribute", None)
        if not attr or len(attr) != 1 or attr[0] not in cols:
            continue
        col = attr[0]
        t = cols[col]
        if isinstance(f, EqualTo):
            preds.append((col, "=", _anchor_tz(t, f.value)))
        elif isinstance(f, In):
            vals = list(f.value)
            if vals:
                preds.append((col, "in", _anchor_tz(t, vals)))
        elif isinstance(f, GreaterThan):
            preds.append((col, ">", _anchor_tz(t, f.value)))
        elif isinstance(f, GreaterThanOrEqual):
            preds.append((col, ">=", _anchor_tz(t, f.value)))
        elif isinstance(f, LessThan):
            preds.append((col, "<", _anchor_tz(t, f.value)))
        elif isinstance(f, LessThanOrEqual):
            preds.append((col, "<=", _anchor_tz(t, f.value)))
    return preds


class PqreadReader(DataSourceReader):
    def __init__(self, path: str):
        self._path = path
        self._preds: list = []

    def pushFilters(self, filters):  # noqa: N802
        from parquet_go_spark.interop import pqreader

        filters = list(filters)
        files = _files_of(self._path)
        probe = pqreader.read_schema(files[0])
        candidates = _translate(filters, _pushable_columns(probe))
        # compile once against the real footer: anything the reader
        # would reject at task time is simply not pushed
        with open(files[0], "rb") as fh:
            fmd = pqreader._read_footer_file(
                fh, os.path.getsize(files[0]), files[0])
        root = pqreader._parse_schema(fmd[2])
        pqreader._annotate(root, 0, 0, ())
        self._preds = []
        for p in candidates:
            try:
                pqreader._compile_predicate(root, fmd, p)
            except ValueError:
                continue
            self._preds.append(p)
        # Spark must still evaluate every filter exactly; eager assign
        # + plain iterator (a generator would disengage silently if a
        # future Spark short-circuits iteration)
        return iter(filters)

    def partitions(self):
        return [_FileSlice(p) for p in _files_of(self._path)]

    def read(self, partition: _FileSlice | None):
        if partition is None:
            return
        import pyarrow as pa

        from parquet_go_spark.interop import pqreader

        tbl = pqreader.read_table(
            partition.path, predicate=self._preds or None)
        # Spark's Arrow bridge has no nanosecond timestamp: INT96 (and
        # ns-annotated) columns surface as ns from the reader — cast to
        # the µs Spark declares in schema()
        for i, fld in enumerate(tbl.schema):
            if pa.types.is_timestamp(fld.type) and fld.type.unit == "ns":
                tbl = tbl.set_column(
                    i, fld.name,
                    tbl.column(i).cast(pa.timestamp("us", fld.type.tz)))
        yield from tbl.to_batches()


class PqreadDataSource(DataSource):
    """spark.read.format("pqread").load(<parquet directory>)."""

    @classmethod
    def name(cls) -> str:
        return "pqread"

    def schema(self) -> StructType:
        import pyarrow as pa
        from pyspark.sql.pandas.types import from_arrow_schema

        from parquet_go_spark.interop import pqreader

        path = self.options.get("path")
        if not path:
            raise ValueError("pqread: .load(<parquet directory>) required")
        probe = pqreader.read_schema(_files_of(path)[0])
        fields = [
            f.with_type(pa.timestamp("us", f.type.tz))
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
            else f
            for f in probe
        ]
        return from_arrow_schema(pa.schema(fields))

    def reader(self, schema: StructType) -> PqreadReader:
        return PqreadReader(self.options["path"])


def register(spark) -> None:
    """Driver-side registration; executors import this module from
    --py-files. Enables the Python-data-source filter pushdown conf
    (ships disabled in Spark 4.1)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(PqreadDataSource)
