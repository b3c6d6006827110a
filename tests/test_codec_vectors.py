"""Round-trip unit tests per codec×kind, porting the reference's
adversarial vector families (/root/reference/encoding/encoding_test.go:31-193)
and small-N sweeps (/root/reference/encoding/test/test.go:64-91).

Equality is exact (bit-identical values), mirroring assertEqualBytes
(encoding_test.go:572-602).
"""

from __future__ import annotations

import numpy as np
import pytest

from parquet_go_spark.codecs import bitpacked, bytestreamsplit, delta, plain, rle
from parquet_go_spark.codecs.bytearrays import ByteArrays
from parquet_go_spark.codecs.kinds import Kind

I32, I64 = np.iinfo(np.int32), np.iinfo(np.int64)

BOOLEAN_VECTORS = [
    [],
    [True],
    [False],
    [True, False, True, False, True, True, False, False, True, False],
    [True] * 32,
    [True] * 33,
    [False] * 32,
    [False] * 33,
    [True, False] * 8,  # alternating x16
    ([True, False] * 8)[:15],  # alternating x15
]

LEVEL_VECTORS = [
    [],
    [0],
    [1],
    [0, 1, 0, 2, 3, 7, 0, 1, 1, 0],
    [42] * 24,
    list(range(32)),  # never repeating (width 6)
    [0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3],  # streaks
]

INT32_VECTORS = [
    [],
    [0],
    [1],
    [-1, 0, 1, 0, 2, 3, 4, 5, 6, I32.max, I32.max, 0],
    [24, 36, 47, 32, 29, 4, 9, 20, 2, 18],  # delta-binary-packed regression seed
    [42] * 24,
    [42] * 33,
    list(range(100)),
    [I32.min, I32.max] * 17,
    [0, 0, 0, 0, 5, 5, 5, 5] * 9,
]

INT64_VECTORS = [
    [],
    [0],
    [1],
    [-1, 0, 1, 0, 2, 3, 4, 5, 6, I64.max, I64.max, 0],
    [I64.min, I64.max, I64.min, I64.max, 0, I64.max, I64.min, I64.max] * 5,  # 64-bit delta torture
    [42] * 129,
    list(range(300)),
]

FLOAT_VECTORS = [
    [],
    [0.0],
    [1.0],
    [0.5, -0.5, 3.14, float(np.finfo(np.float32).max), 0.0, -1e-30],
]

DOUBLE_VECTORS = [
    [],
    [0.0],
    [1.0],
    [0.5, -0.5, 3.141592653589793, float(np.finfo(np.float64).max), 0.0, -1e-300],
]

BYTE_ARRAY_VECTORS = [
    [],
    [b""],
    [b"A", b"B", b"C"],
    [b"hello world!", b"1234567890" * 100],
    [b"", b"", b"x", b""],
    [b"same", b"same", b"same"],
    [b"src/a/b/file_1.py", b"src/a/b/file_2.py", b"src/a/c/other.go", b"src/a/c/other.go"],
]


def _ba(vs) -> ByteArrays:
    return ByteArrays.from_pylist(vs)


def _check_ba(got: ByteArrays, want: list[bytes]):
    assert got.to_pylist() == want


# -- PLAIN ---------------------------------------------------------------

@pytest.mark.parametrize("vec", BOOLEAN_VECTORS)
def test_plain_boolean(vec):
    a = np.array(vec, dtype=bool)
    buf = plain.encode_boolean(a)
    assert np.array_equal(plain.decode_boolean(buf, len(a)), a)


@pytest.mark.parametrize("vec", INT32_VECTORS)
def test_plain_int32(vec):
    a = np.array(vec, dtype=np.int32)
    buf = plain.encode_numeric(a, Kind.INT32)
    assert np.array_equal(plain.decode_numeric(buf, len(a), Kind.INT32), a)


@pytest.mark.parametrize("vec", INT64_VECTORS)
def test_plain_int64(vec):
    a = np.array(vec, dtype=np.int64)
    buf = plain.encode_numeric(a, Kind.INT64)
    assert np.array_equal(plain.decode_numeric(buf, len(a), Kind.INT64), a)


@pytest.mark.parametrize("vec", DOUBLE_VECTORS)
def test_plain_double(vec):
    a = np.array(vec, dtype=np.float64)
    buf = plain.encode_numeric(a, Kind.DOUBLE)
    assert np.array_equal(plain.decode_numeric(buf, len(a), Kind.DOUBLE), a)


@pytest.mark.parametrize("vec", BYTE_ARRAY_VECTORS)
def test_plain_byte_array(vec):
    ba = _ba(vec)
    buf = plain.encode_byte_array(ba)
    # 4-byte LE length prefix layout check on a known value
    _check_ba(plain.decode_byte_array(buf, len(vec)), vec)


def test_plain_byte_array_layout():
    buf = plain.encode_byte_array(_ba([b"AB", b""]))
    assert buf == b"\x02\x00\x00\x00AB\x00\x00\x00\x00"


@pytest.mark.parametrize("size", [1, 2, 4, 8, 10, 16])
def test_plain_flba(size):
    base = (b"ABCDEFGH" * 8)[: size * 3]
    a = np.frombuffer(base, dtype=np.uint8).reshape(3, size)
    buf = plain.encode_flba(a, size)
    assert buf == base
    assert np.array_equal(plain.decode_flba(buf, 3, size), a)


# -- RLE hybrid ----------------------------------------------------------

@pytest.mark.parametrize("vec", LEVEL_VECTORS)
@pytest.mark.parametrize("width", [3, 5, 8])
def test_rle_levels(vec, width):
    a = np.array(vec, dtype=np.uint8)
    if len(a) and int(a.max()) >= (1 << width):
        pytest.skip("values exceed width")
    buf = rle.encode_levels(a, width)
    assert np.array_equal(rle.decode_levels(buf, len(a), width), a)


@pytest.mark.parametrize("vec", BOOLEAN_VECTORS)
def test_rle_boolean(vec):
    a = np.array(vec, dtype=bool)
    buf = rle.encode_boolean(a)
    assert np.array_equal(rle.decode_boolean(buf, len(a)), a)


@pytest.mark.parametrize("width", list(range(0, 33)))
def test_rle_small_n_sweep(width):
    """Every N in 0..67 at each width — block/group boundary torture
    (cf. encoding/test/test.go:64-91)."""
    rng = np.random.default_rng(width)
    for n in range(0, 68):
        if width == 0:
            a = np.zeros(n, dtype=np.uint64)
        else:
            a = rng.integers(0, 1 << width, size=n, dtype=np.uint64)
        buf = rle.encode_hybrid(a, width)
        assert np.array_equal(rle.decode_hybrid(buf, n, width), a), (width, n)


def test_rle_tolerates_empty_and_truncated_runs():
    # empty run header (count 0) then a real run — must not loop/crash
    import parquet_go_spark.codecs.varint as vi

    out = bytearray()
    vi.write_uvarint(out, 0)  # empty RLE run
    out += b"\x07"  # its value byte
    vi.write_uvarint(out, 5 << 1)
    out += b"\x03"
    got = rle.decode_hybrid(bytes(out), 5, 8)
    assert np.array_equal(got, np.full(5, 3, dtype=np.uint64))
    # truncated: ask for more values than encoded → zero-padded
    got2 = rle.decode_hybrid(bytes(out), 9, 8)
    assert np.array_equal(got2[:5], np.full(5, 3, dtype=np.uint64))


def test_rle_dictionary_indexes():
    for idx in ([], [0], [0] * 50, [3, 3, 3, 1, 0, 2] * 20, list(range(1000))):
        a = np.array(idx, dtype=np.int32)
        buf = rle.encode_dictionary_indexes(a)
        assert np.array_equal(rle.decode_dictionary_indexes(buf, len(a)), a)


# -- BIT_PACKED (deprecated) ----------------------------------------------

@pytest.mark.parametrize("width", [1, 2, 3, 7, 8])
def test_bitpacked_levels(width):
    rng = np.random.default_rng(width)
    for n in (0, 1, 7, 8, 9, 64, 65):
        a = rng.integers(0, 1 << width, size=n, dtype=np.uint64).astype(np.uint8)
        buf = bitpacked.encode_levels(a, width)
        assert np.array_equal(bitpacked.decode_levels(buf, n, width), a)


# -- DELTA_BINARY_PACKED ---------------------------------------------------

@pytest.mark.parametrize("vec", INT32_VECTORS)
def test_delta_binary_packed_int32(vec):
    a = np.array(vec, dtype=np.int32)
    buf = delta.encode_binary_packed(a, 32)
    got, consumed = delta.decode_binary_packed(buf, 32)
    assert consumed == len(buf)
    assert np.array_equal(got, a)


@pytest.mark.parametrize("vec", INT64_VECTORS)
def test_delta_binary_packed_int64(vec):
    a = np.array(vec, dtype=np.int64)
    buf = delta.encode_binary_packed(a, 64)
    got, consumed = delta.decode_binary_packed(buf, 64)
    assert consumed == len(buf)
    assert np.array_equal(got, a)


@pytest.mark.parametrize("bits", [32, 64])
def test_delta_binary_packed_small_n_sweep(bits):
    """N=0..200 hits the 128-block / 32-miniblock boundaries."""
    rng = np.random.default_rng(bits)
    dt = np.int32 if bits == 32 else np.int64
    info = np.iinfo(dt)
    for n in list(range(0, 140)) + [159, 160, 161, 191, 192, 193, 200, 257]:
        a = rng.integers(info.min, info.max, size=n, dtype=dt)
        buf = delta.encode_binary_packed(a, bits)
        got, consumed = delta.decode_binary_packed(buf, bits)
        assert consumed == len(buf), n
        assert np.array_equal(got, a), n


def test_delta_binary_packed_sorted_is_small():
    a = np.arange(100_000, dtype=np.int64)
    buf = delta.encode_binary_packed(a, 64)
    assert len(buf) < a.nbytes / 50  # constant deltas pack to ~0 bits


# -- DELTA_LENGTH / DELTA_BYTE_ARRAY ---------------------------------------

@pytest.mark.parametrize("vec", BYTE_ARRAY_VECTORS)
def test_delta_length_byte_array(vec):
    ba = _ba(vec)
    buf = delta.encode_length_byte_array(ba)
    _check_ba(delta.decode_length_byte_array(buf, len(vec)), vec)


@pytest.mark.parametrize("vec", BYTE_ARRAY_VECTORS)
def test_delta_byte_array(vec):
    ba = _ba(vec)
    buf = delta.encode_byte_array(ba)
    _check_ba(delta.decode_byte_array(buf, len(vec)), vec)


def test_delta_byte_array_prefix_exploits_sorted_paths():
    paths = [f"src/pkg{i//50}/module_{i//10}/file_{i}.py".encode() for i in range(2000)]
    paths.sort()
    ba = _ba(paths)
    buf = delta.encode_byte_array(ba)
    plain_size = len(plain.encode_byte_array(ba))
    assert len(buf) < plain_size * 0.6
    _check_ba(delta.decode_byte_array(buf, len(paths)), paths)


# -- BYTE_STREAM_SPLIT ------------------------------------------------------

@pytest.mark.parametrize("vec", FLOAT_VECTORS)
def test_bss_float(vec):
    a = np.array(vec, dtype=np.float32)
    buf = bytestreamsplit.encode(a, 4)
    assert np.array_equal(bytestreamsplit.decode(buf, len(a), 4, Kind.FLOAT), a)


@pytest.mark.parametrize("vec", DOUBLE_VECTORS)
def test_bss_double(vec):
    a = np.array(vec, dtype=np.float64)
    buf = bytestreamsplit.encode(a, 8)
    assert np.array_equal(bytestreamsplit.decode(buf, len(a), 8, Kind.DOUBLE), a)


def test_bss_layout():
    a = np.array([1, 2], dtype=np.int32)  # 01 00 00 00 / 02 00 00 00
    assert bytestreamsplit.encode(a, 4) == b"\x01\x02" + b"\x00" * 6


def test_native_rle_streams_match_numpy():
    """The compiled hybrid kernels must reproduce the numpy encoder's
    streams BYTE-FOR-BYTE (same grouping policy → same golden sizes)
    and cross-decode in both directions."""
    import numpy as np
    import pytest

    from parquet_go_spark.codecs import rle

    if rle._NATIVE is None:
        pytest.skip("no C toolchain on this host")
    rng = np.random.default_rng(17)
    for width, hi in [(1, 2), (3, 8), (7, 100), (12, 4000), (32, 2**32 - 1)]:
        for vals in (
            rng.integers(0, hi, 10001).astype(np.uint64),
            np.full(9999, hi - 1, dtype=np.uint64),
            np.repeat(rng.integers(0, hi, 40),
                      rng.integers(1, 300, 40)).astype(np.uint64),
            np.arange(13, dtype=np.uint64) % min(hi, 3),
        ):
            native = rle.encode_hybrid(vals, width)
            saved = rle._NATIVE
            try:
                rle._NATIVE = None
                ref = rle.encode_hybrid(vals, width)
                dec_np = rle.decode_hybrid(native, len(vals), width)
            finally:
                rle._NATIVE = saved
            dec_c = rle.decode_hybrid(ref, len(vals), width)
            assert native == ref
            assert np.array_equal(dec_np, vals)
            assert np.array_equal(dec_c, vals)


def test_native_rle_malformed_matches_numpy():
    """Anomalous streams must behave identically across paths: the C
    kernel returns -1 on malformed/overlong varints and truncated
    bit-packed payloads (a 2^63 group count once drove an out-of-bounds
    read), deferring to the numpy reference so errors and tolerances
    are byte-for-byte the old ones."""
    import numpy as np
    import pytest

    from parquet_go_spark.codecs import rle

    if rle._NATIVE is None:
        pytest.skip("no C toolchain on this host")

    def both(buf, n, width):
        def run():
            try:
                return rle.decode_hybrid(buf, n, width), None
            except Exception as e:  # noqa: BLE001 — behavior capture
                return None, type(e).__name__

        a, aerr = run()
        saved = rle._NATIVE
        try:
            rle._NATIVE = None
            b, berr = run()
        finally:
            rle._NATIVE = saved
        assert aerr == berr, (aerr, berr)
        if a is not None:
            assert np.array_equal(a, b)
        return aerr

    # varint group count ~2^63: payload-bytes product would overflow
    assert both(b"\xff" * 9 + b"\x01", 10, 7) == "OverflowError"
    # overlong varint carrying bits past 2^64
    assert both(b"\xff" * 9 + b"\x07", 10, 7) == "OverflowError"
    # bit-packed payload truncated mid-run: an error, never zero-fill
    assert both(b"\x05\x01\x02\x03", 16, 8) == "ValueError"
    # empty RLE runs remain tolerated
    v = np.arange(16, dtype=np.uint64) % 5
    assert both(b"\x00\x00" + rle.encode_hybrid(v, 3), 16, 3) is None
