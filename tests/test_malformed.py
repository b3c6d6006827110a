"""Negative tests: malformed blobs must raise cleanly, never decode
garbage — the analog of the reference's testdata/malformed corpus
(file_test.go negatives)."""

from __future__ import annotations

import numpy as np
import pytest

from parquet_go_spark.codecs import chunk as chunklib, delta, fsst, rle
from parquet_go_spark.codecs.bytearrays import ByteArrays
from parquet_go_spark.codecs.kinds import Codec, Kind


def _good_blob() -> bytes:
    return chunklib.encode_chunk(
        np.arange(100, dtype=np.int64), Kind.INT64, Codec.DELTA_BINARY_PACKED
    )


def test_bad_magic():
    blob = b"XXXX" + _good_blob()[4:]
    with pytest.raises(ValueError, match="magic"):
        chunklib.decode_chunk(blob)


def test_truncated_blob():
    blob = _good_blob()
    with pytest.raises(Exception):
        chunklib.decode_chunk(blob[: len(blob) // 2])


def test_unknown_codec():
    blob = bytearray(_good_blob())
    blob[4] = 250  # not a registered codec
    with pytest.raises(ValueError):
        chunklib.decode_chunk(bytes(blob))


def test_delta_bad_header():
    # block size not a multiple of 128 → explicit header validation
    # (binary_packed.go:409-452 analog)
    bad = bytearray()
    from parquet_go_spark.codecs.varint import write_uvarint

    write_uvarint(bad, 100)  # blockSize=100 (invalid)
    write_uvarint(bad, 4)
    write_uvarint(bad, 10)
    bad += b"\x00"
    with pytest.raises(ValueError, match="DELTA_BINARY_PACKED"):
        delta.decode_binary_packed(bytes(bad), 64)


def test_fsst_size_mismatch():
    vals = ByteArrays.from_pylist([b"hello world"] * 200)
    blob = bytearray(fsst.encode_byte_array(vals))
    blob[-1] ^= 0xFF  # corrupt the last payload byte
    with pytest.raises(Exception):
        out = fsst.decode_byte_array(bytes(blob))
        # if decode happened to succeed structurally, it must not be silent
        assert out != vals
        raise ValueError("corruption detected by equality")


def test_rle_truncated_tolerated_or_raises():
    """Truncated trailing runs: decode either raises or returns exactly n
    values — never over-reads (TestRLEDecodeToleratesEmptyRuns analog,
    encoding_test.go:218)."""
    vals = np.arange(64, dtype=np.uint64) % 4
    payload = rle.encode_hybrid(vals, 2)
    try:
        out = rle.decode_hybrid(payload[:-1], 64, 2)
        assert len(out) <= 64
    except Exception:
        pass
