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
from pyspark.sql.types import (BinaryType, StringType, StructField,
                               StructType)


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
