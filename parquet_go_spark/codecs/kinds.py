"""Physical kinds and codec ids.

Kind enum values mirror the parquet physical types the reference supports
(/root/reference/encoding/values.go:10-22); codec ids mirror the parquet
format encoding codes (/root/reference/format/parquet.go:580-631) with FSST
added as an extension id (not in parquet-format; from the FSST paper,
PVLDB 13(11), 2020).
"""

from __future__ import annotations

import numpy as np


class Kind:
    BOOLEAN = 0
    INT32 = 1
    INT64 = 2
    INT96 = 3  # handled as FIXED_LEN_BYTE_ARRAY(12)
    FLOAT = 4
    DOUBLE = 5
    BYTE_ARRAY = 6
    FIXED_LEN_BYTE_ARRAY = 7


class Codec:
    PLAIN = 0
    PLAIN_DICTIONARY = 2  # deprecated; read-compat only
    RLE = 3
    BIT_PACKED = 4  # deprecated levels-only encoding
    DELTA_BINARY_PACKED = 5
    DELTA_LENGTH_BYTE_ARRAY = 6
    DELTA_BYTE_ARRAY = 7
    RLE_DICTIONARY = 8
    BYTE_STREAM_SPLIT = 9
    FSST = 200  # extension, not a parquet format code


CODEC_NAMES = {
    Codec.PLAIN: "PLAIN",
    Codec.PLAIN_DICTIONARY: "PLAIN_DICTIONARY",
    Codec.RLE: "RLE",
    Codec.BIT_PACKED: "BIT_PACKED",
    Codec.DELTA_BINARY_PACKED: "DELTA_BINARY_PACKED",
    Codec.DELTA_LENGTH_BYTE_ARRAY: "DELTA_LENGTH_BYTE_ARRAY",
    Codec.DELTA_BYTE_ARRAY: "DELTA_BYTE_ARRAY",
    Codec.RLE_DICTIONARY: "RLE_DICTIONARY",
    Codec.BYTE_STREAM_SPLIT: "BYTE_STREAM_SPLIT",
    Codec.FSST: "FSST",
}

CODEC_IDS = {v: k for k, v in CODEC_NAMES.items()}

KIND_NAMES = {
    Kind.BOOLEAN: "BOOLEAN",
    Kind.INT32: "INT32",
    Kind.INT64: "INT64",
    Kind.INT96: "INT96",
    Kind.FLOAT: "FLOAT",
    Kind.DOUBLE: "DOUBLE",
    Kind.BYTE_ARRAY: "BYTE_ARRAY",
    Kind.FIXED_LEN_BYTE_ARRAY: "FIXED_LEN_BYTE_ARRAY",
}

# little-endian numpy dtype per fixed-width kind
KIND_DTYPES = {
    Kind.INT32: np.dtype("<i4"),
    Kind.INT64: np.dtype("<i8"),
    Kind.FLOAT: np.dtype("<f4"),
    Kind.DOUBLE: np.dtype("<f8"),
}

KIND_WIDTHS = {
    Kind.INT32: 4,
    Kind.INT64: 8,
    Kind.INT96: 12,
    Kind.FLOAT: 4,
    Kind.DOUBLE: 8,
}
