"""VARIANT shredding over DataFrames — the scoped Spark-side slice of
the reference's shredded VARIANT surface (/root/reference/
type_variant.go:27, variant_shredded_write.go, variant_shredded_read.go;
binary layout in codecs/variant.py, golden-checked against the
apache/parquet-testing shredded_variant fixtures).

``shred_json`` turns a flat-JSON string column into the shredded
variant group shape — struct<metadata: binary, value: binary,
typed_value: struct<...>> — that the pipeline's existing struct stream
grammar encodes directly:

- typed fields extract JVM-side (``from_json`` — codegen'd, no Python),
- the residual (keys NOT shredded) encodes into the spec's variant
  binary via one mapInArrow kernel (the binary format is not
  SQL-expressible; the kernel is the documented Python slice and runs
  batch-at-a-time over only the json column's bytes),
- the metadata dictionary covers every key so field ids are stable.

``unshred_json`` reconstructs the JSON string (typed fields merged with
the decoded residual, keys sorted — a canonical form both engines can
re-derive). Scale shape: both directions are narrow maps over the scan;
no shuffle, no driver funnel."""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (ArrayType, BinaryType, BooleanType,
                               DateType, DoubleType, IntegerType, LongType,
                               StringType, StructField, StructType)

_SPEC_PRIMITIVES = {
    "boolean": BooleanType(), "int": IntegerType(), "int32": IntegerType(),
    "integer": IntegerType(), "bigint": LongType(), "int64": LongType(),
    "long": LongType(), "double": DoubleType(), "string": StringType(),
    "binary": BinaryType(), "date": DateType(),
}


def _spec_group_type(spec) -> StructType:
    """Shredding spec node → the spec's {value, typed_value} group type."""
    if isinstance(spec, dict):
        typed = StructType([
            StructField(k, _spec_group_type(s)) for k, s in spec.items()
        ])
    elif isinstance(spec, (list, tuple)):
        if len(spec) != 1:
            raise ValueError("array spec must have exactly one element")
        typed = ArrayType(_spec_group_type(spec[0]))
    else:
        typed = _SPEC_PRIMITIVES[str(spec).lower()]
    return StructType([
        StructField("value", BinaryType()),
        StructField("typed_value", typed),
    ])


def shred_variant(df: DataFrame, json_col: str, spec, *,
                  out_col: str = "var") -> DataFrame:
    """Replace `json_col` (a JSON string column of ANY shape) with the
    spec's recursive shredded variant group — struct<metadata binary,
    value binary, typed_value T(spec)> where objects shred field-wise
    into nested {value, typed_value} groups and arrays element-wise
    through list<group> (VariantShredding.md case tables; reference
    variant_shredded_write.go). The flat-JSON-only ``shred_json``
    remains for the common one-level case where typed extraction stays
    JVM-side; this operator routes the whole row through the
    codecs.variant shredder in one mapInArrow kernel (the case-table
    fallback encoding is not SQL-expressible). Scale shape: a narrow
    map over the scan — no shuffle, no driver funnel; per-batch memory
    is one Arrow batch of (metadata, value, typed) columns."""
    from parquet_go_spark.codecs import variant as vcodec

    base_fields = [f for f in df.schema.fields if f.name != json_col]
    group_t = _spec_group_type(spec)
    var_t = StructType([
        StructField("metadata", BinaryType()),
        StructField("value", group_t["value"].dataType),
        StructField("typed_value", group_t["typed_value"].dataType),
    ])
    out_schema = StructType(base_fields + [StructField(out_col, var_t)])

    def shred(batches):
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_type

        pa_var = to_arrow_type(var_t)
        for b in batches:
            names = b.schema.names
            j = b.column(names.index(json_col))
            rows = []
            for s in j.to_pylist():
                if s is None:
                    rows.append(None)
                    continue
                obj = json.loads(s)
                meta, grp = vcodec.shred_row(obj, spec)
                rows.append({"metadata": meta, "value": grp["value"],
                             "typed_value": grp["typed_value"]})
            cols = [b.column(names.index(f.name)) for f in base_fields]
            yield pa.record_batch(
                cols + [pa.array(rows, pa_var)],
                schema=pa.schema(
                    [b.schema.field(names.index(f.name))
                     for f in base_fields]
                    + [pa.field(out_col, pa_var)]),
            )

    return df.mapInArrow(shred, out_schema)


def unshred_variant(df: DataFrame, var_col: str = "var", *,
                    out_col: str = "json") -> DataFrame:
    """Recursive inverse of ``shred_variant``: any shredded variant
    group (arbitrary nesting of object/array/primitive typed_value
    columns) → canonical JSON string. Arrow's to_pylist delivers the
    nested {value, typed_value} groups exactly as
    ``reconstruct_shredded`` consumes them, so the kernel is one call
    per row. A narrow map — no shuffle."""
    from parquet_go_spark.codecs import variant as vcodec

    base_fields = [f for f in df.schema.fields if f.name != var_col]
    out_schema = StructType(
        base_fields + [StructField(out_col, StringType())])

    def decode(batches):
        import pyarrow as pa

        for b in batches:
            names = b.schema.names
            var = b.column(names.index(var_col))
            out = []
            for row in var.to_pylist():
                if row is None or row.get("metadata") is None:
                    out.append(None)
                    continue
                v = vcodec.reconstruct_shredded(
                    row["metadata"], row.get("value"),
                    row.get("typed_value"))
                out.append(json.dumps(v, sort_keys=True,
                                      separators=(",", ":")))
            cols = [b.column(names.index(f.name)) for f in base_fields]
            yield pa.record_batch(
                cols + [pa.array(out, pa.string())],
                schema=pa.schema(
                    [b.schema.field(names.index(f.name))
                     for f in base_fields]
                    + [pa.field(out_col, pa.string())]),
            )

    return df.mapInArrow(decode, out_schema)


def shred_json(df: DataFrame, json_col: str,
               fields: list[tuple[str, str]], *,
               out_col: str = "var") -> DataFrame:
    """Replace `json_col` with a shredded variant struct `out_col`.

    fields: [(key, spark_type)] — the keys shredded into typed_value;
    every other key lands variant-encoded in the residual `value`
    (NULL when nothing is left over, matching the spec's "value must be
    null when fully shredded" rule)."""
    from parquet_go_spark.codecs import variant as vcodec

    shredded = [name for name, _ in fields]
    typed_schema = ", ".join(f"`{n}` {t}" for n, t in fields)

    base_fields = [f for f in df.schema.fields if f.name != json_col]
    out_schema = StructType(
        base_fields
        + [StructField("__vmeta", BinaryType()),
           StructField("__vvalue", BinaryType()),
           StructField("__vjson", df.schema[json_col].dataType)]
    )

    def encode_residual(batches):
        import pyarrow as pa

        for b in batches:
            names = b.schema.names
            j = b.column(names.index(json_col))
            metas, resids = [], []
            for s in j.to_pylist():
                if s is None:
                    metas.append(None)
                    resids.append(None)
                    continue
                obj = json.loads(s)
                if not isinstance(obj, dict):
                    raise ValueError(
                        "shred_json: flat-JSON slice requires a JSON "
                        f"object per row, got {type(obj).__name__}")
                resid = {k: v for k, v in obj.items() if k not in shredded}
                # metadata covers ALL keys RECURSIVELY (stable ids for
                # shredded fields AND every key inside nested residual
                # values — a top-level-only dictionary would KeyError
                # when the residual encoder meets a nested object)
                name_ids: dict[str, int] = {k: i for i, k
                                            in enumerate(obj)}
                vcodec._collect_names(resid, name_ids)
                metas.append(vcodec.encode_metadata(list(name_ids)))
                resids.append(
                    vcodec.encode_value(resid, name_ids) if resid
                    else None)
            cols = [b.column(names.index(f.name))
                    for f in base_fields]
            yield pa.record_batch(
                cols + [pa.array(metas, pa.binary()),
                        pa.array(resids, pa.binary()), j],
                schema=pa.schema(
                    [b.schema.field(names.index(f.name))
                     for f in base_fields]
                    + [pa.field("__vmeta", pa.binary()),
                       pa.field("__vvalue", pa.binary()),
                       pa.field("__vjson", j.type)]),
            )

    enc = df.mapInArrow(encode_residual, out_schema)
    return enc.select(
        *[f.name for f in base_fields],
        F.struct(
            F.col("__vmeta").alias("metadata"),
            F.col("__vvalue").alias("value"),
            F.from_json(F.col("__vjson"), typed_schema).alias(
                "typed_value"),
        ).alias(out_col),
    )


def unshred_json(df: DataFrame, var_col: str = "var", *,
                 out_col: str = "json") -> DataFrame:
    """Shredded variant struct → canonical JSON string (typed fields
    merged with the decoded residual; keys sorted; absent keys stay
    absent). One mapInArrow kernel — a narrow map, no shuffle."""
    from parquet_go_spark.codecs import variant as vcodec

    base_fields = [f for f in df.schema.fields if f.name != var_col]
    out_schema = StructType(
        base_fields + [StructField(out_col, StringType())])

    def decode(batches):
        import pyarrow as pa

        for b in batches:
            names = b.schema.names
            var = b.column(names.index(var_col))
            out = []
            for row in var.to_pylist():
                if row is None or row.get("metadata") is None:
                    out.append(None)
                    continue
                typed = row.get("typed_value")
                if isinstance(typed, dict):
                    # the flat slice stores typed_value as a struct of
                    # SCALARS; lift to the spec's field-group grammar
                    # (null scalar = absent field) for the shared
                    # reconstructor
                    typed = {
                        k: (None if v is None
                            else {"value": None, "typed_value": v})
                        for k, v in typed.items()
                    }
                v = vcodec.reconstruct_shredded(
                    row["metadata"], row.get("value"), typed)
                # typed_value struct rows with every field null mean "no
                # typed fields" — reconstruct_shredded returns {} merged
                # with residual; drop keys whose typed value is None AND
                # absent from the source (from_json yields null for
                # missing keys — a null field is indistinguishable from
                # an absent one after shredding, so the canonical form
                # omits nulls, mirrored by the oracle)
                if isinstance(v, dict):
                    v = {k: x for k, x in v.items() if x is not None}
                out.append(json.dumps(v, sort_keys=True,
                                      separators=(",", ":")))
            cols = [b.column(names.index(f.name)) for f in base_fields]
            yield pa.record_batch(
                cols + [pa.array(out, pa.string())],
                schema=pa.schema(
                    [b.schema.field(names.index(f.name))
                     for f in base_fields]
                    + [pa.field(out_col, pa.string())]),
            )

    return df.mapInArrow(decode, out_schema)
