"""Optional compiled kernels (FSST encode/decode hot loops).

The numpy FSST parse is allocation- and bandwidth-bound at ~18-20 MB/s
per core (three measured optimization attempts rejected — see
BASELINE.md); the honest lever named there is a native kernel. This
module ships ~90 lines of C **as source inside the package** (so it is
`--py-files` compatible: every executor's Python worker compiles it once
on first import with the host toolchain) and binds it with ctypes. If no
C compiler is present, compilation fails, or the platform is not
little-endian, everything silently falls back to the pure-numpy kernels
— the numpy path remains the reference implementation and is exercised
directly in tests via `SPARK_COLCODEC_NATIVE=0`.

The C encoder is the FSST paper's canonical greedy longest-match parse
(shortCodes-style 2-byte dispatch + per-prefix candidate lists ordered
longest-first), not a translation of the numpy pair-merge parse; both
produce valid streams for the same serialized symbol table, and the
sequential decoder accepts either. Blob bytes are deterministic per
environment (required for manifest resume); cross-environment resume
re-encodes only missing partitions, for which determinism is not
load-bearing.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import shutil
import subprocess
import sys
import tempfile

_C_SOURCE = r"""
#include <stdint.h>
#include <string.h>

/* FSST greedy longest-match encode.
 *
 * in/n           : plain bytes
 * keys/lens      : symbol table, code i = (keys[i] little-endian, lens[i])
 * pstart[65537]  : per-2-byte-prefix offsets into pcands
 * pcands         : codes of len>=2 symbols grouped by first-2-byte prefix,
 *                  longest first within a prefix
 * single[256]    : code of the 1-byte symbol for that byte, or -1
 * out            : capacity must be >= 2*n (worst case: all escapes)
 * returns encoded length
 */
long fsst_encode(const uint8_t *in, long n,
                 const uint64_t *keys, const uint8_t *lens,
                 const int32_t *pstart, const int32_t *pcands,
                 const int16_t *single, uint8_t *out)
{
    static const uint64_t MASK[9] = {
        0ULL, 0xFFULL, 0xFFFFULL, 0xFFFFFFULL, 0xFFFFFFFFULL,
        0xFFFFFFFFFFULL, 0xFFFFFFFFFFFFULL, 0xFFFFFFFFFFFFFFULL,
        0xFFFFFFFFFFFFFFFFULL};
    long i = 0, o = 0;
    long fast_end = n - 8; /* positions where a full word load is safe */
    while (i <= fast_end) {
        uint64_t w;
        memcpy(&w, in + i, 8);
        uint32_t p2 = (uint32_t)(w & 0xFFFF);
        int32_t c0 = pstart[p2], c1 = pstart[p2 + 1];
        int matched = 0;
        for (int32_t ci = c0; ci < c1; ci++) {
            int32_t code = pcands[ci];
            uint8_t L = lens[code];
            if ((w & MASK[L]) == keys[code]) {
                out[o++] = (uint8_t)code;
                i += L;
                matched = 1;
                break;
            }
        }
        if (!matched) {
            int16_t sc = single[(uint8_t)w];
            if (sc >= 0) {
                out[o++] = (uint8_t)sc;
            } else {
                out[o++] = 255;
                out[o++] = (uint8_t)w;
            }
            i++;
        }
    }
    while (i < n) { /* tail: partial word, candidate must fit */
        long avail = n - i;
        uint64_t w = 0;
        memcpy(&w, in + i, avail >= 8 ? 8 : avail);
        int matched = 0;
        if (avail >= 2) {
            uint32_t p2 = (uint32_t)(w & 0xFFFF);
            int32_t c0 = pstart[p2], c1 = pstart[p2 + 1];
            for (int32_t ci = c0; ci < c1; ci++) {
                int32_t code = pcands[ci];
                uint8_t L = lens[code];
                if (L <= avail && (w & MASK[L]) == keys[code]) {
                    out[o++] = (uint8_t)code;
                    i += L;
                    matched = 1;
                    break;
                }
            }
        }
        if (!matched) {
            int16_t sc = single[in[i]];
            if (sc >= 0) {
                out[o++] = (uint8_t)sc;
            } else {
                out[o++] = 255;
                out[o++] = in[i];
            }
            i++;
        }
    }
    return o;
}

/* XXH64 (public-domain algorithm, Yann Collet) — parquet bloom filters
 * hash each value's plain-encoded bytes with seed 0. Batch form: value i
 * is data[offs[i] .. offs[i+1]). */
static inline uint64_t rotl64(uint64_t x, int r)
{
    return (x << r) | (x >> (64 - r));
}

#define XP1 0x9E3779B185EBCA87ULL
#define XP2 0xC2B2AE3D27D4EB4FULL
#define XP3 0x165667B19E3779F9ULL
#define XP4 0x85EBCA77C2B2AE63ULL
#define XP5 0x27D4EB2F165667C5ULL

static uint64_t xxh64(const uint8_t *p, long len, uint64_t seed)
{
    const uint8_t *end = p + len;
    uint64_t h;
    if (len >= 32) {
        uint64_t v1 = seed + XP1 + XP2, v2 = seed + XP2, v3 = seed,
                 v4 = seed - XP1;
        do {
            uint64_t k;
            memcpy(&k, p, 8); v1 = rotl64(v1 + k * XP2, 31) * XP1; p += 8;
            memcpy(&k, p, 8); v2 = rotl64(v2 + k * XP2, 31) * XP1; p += 8;
            memcpy(&k, p, 8); v3 = rotl64(v3 + k * XP2, 31) * XP1; p += 8;
            memcpy(&k, p, 8); v4 = rotl64(v4 + k * XP2, 31) * XP1; p += 8;
        } while (p + 32 <= end);
        h = rotl64(v1, 1) + rotl64(v2, 7) + rotl64(v3, 12) + rotl64(v4, 18);
        v1 *= XP2; h ^= rotl64(v1, 31) * XP1; h = h * XP1 + XP4;
        v2 *= XP2; h ^= rotl64(v2, 31) * XP1; h = h * XP1 + XP4;
        v3 *= XP2; h ^= rotl64(v3, 31) * XP1; h = h * XP1 + XP4;
        v4 *= XP2; h ^= rotl64(v4, 31) * XP1; h = h * XP1 + XP4;
    } else {
        h = seed + XP5;
    }
    h += (uint64_t)len;
    while (p + 8 <= end) {
        uint64_t k;
        memcpy(&k, p, 8);
        h ^= rotl64(k * XP2, 31) * XP1;
        h = rotl64(h, 27) * XP1 + XP4;
        p += 8;
    }
    if (p + 4 <= end) {
        uint32_t k;
        memcpy(&k, p, 4);
        h ^= (uint64_t)k * XP1;
        h = rotl64(h, 23) * XP2 + XP3;
        p += 4;
    }
    while (p < end) {
        h ^= (uint64_t)(*p++) * XP5;
        h = rotl64(h, 11) * XP1;
    }
    h ^= h >> 33;
    h *= XP2;
    h ^= h >> 29;
    h *= XP3;
    h ^= h >> 32;
    return h;
}

void xxh64_batch(const uint8_t *data, const int64_t *offs, long n,
                 uint64_t seed, uint64_t *out)
{
    for (long i = 0; i < n; i++)
        out[i] = xxh64(data + offs[i], (long)(offs[i + 1] - offs[i]), seed);
}

/* Engine-bloom per-value polynomial hash. Must match the numpy
 * reference in bloom.py bit-for-bit (same blob bytes either way):
 *   acc    = sum_j value[j] * K2^j                  (mod 2^64)
 *   out[i] = splitmix-mix(acc ^ (len * K3))
 * The numpy path materializes ~24 bytes of int64 temporaries per input
 * byte (repeat/arange/add.at) — this loop is pure sequential reads. */
#define BK1 0x9E3779B97F4A7C15ULL
#define BK2 0xBF58476D1CE4E5B9ULL
#define BK3 0x94D049BB133111EBULL

static inline uint64_t bmix64(uint64_t x)
{
    x += BK1;
    x = (x ^ (x >> 30)) * BK2;
    x = (x ^ (x >> 27)) * BK3;
    return x ^ (x >> 31);
}

void poly64_batch(const uint8_t *data, const int64_t *offs, long n,
                  uint64_t *out)
{
    for (long i = 0; i < n; i++) {
        const uint8_t *p = data + offs[i];
        long len = (long)(offs[i + 1] - offs[i]);
        uint64_t acc = 0;
        for (long j = len - 1; j >= 0; j--)
            acc = acc * BK2 + p[j];
        out[i] = bmix64(acc ^ ((uint64_t)len * BK3));
    }
}

/* Parquet hybrid RLE/bit-packed encode, width 1..32 (dictionary
 * indexes, rep/def levels, RLE-boolean, small ints). Replicates the
 * numpy encoder's grouping BYTE-FOR-BYTE (same blobs, same golden
 * sizes): aligned groups of 8 classified const/non-const; adjacent
 * const groups of equal value merge into RLE runs; adjacent non-const
 * groups into bit-packed runs; a trailing partial group is padded with
 * the last value (bit-packed) or stores the exact count (RLE).
 * out capacity: >= 64 + (n+8)*((width+7)/8) + (n/8+2)*10. Returns
 * encoded length. */
static inline long put_uvarint(uint8_t *out, long o, uint64_t x)
{
    while (x >= 0x80) {
        out[o++] = (uint8_t)(x | 0x80);
        x >>= 7;
    }
    out[o++] = (uint8_t)x;
    return o;
}

/* group g is constant? (tail group padded with the last value);
 * writes the group's first value to *g0 */
static inline int group_is_const(const uint64_t *v, long n, long g,
                                 uint64_t *g0)
{
    *g0 = v[g * 8];
    for (int j = 1; j < 8; j++) {
        long idx = g * 8 + j;
        uint64_t x = idx < n ? v[idx] : v[n - 1];
        if (x != *g0)
            return 0;
    }
    return 1;
}

long rle_encode(const uint64_t *v, long n, int width, uint8_t *out)
{
    long o = 0;
    int vbytes = (width + 7) / 8;
    long ng = (n + 7) / 8;
    long g = 0;
    while (g < ng) {
        uint64_t g0;
        int is_const = group_is_const(v, n, g, &g0);
        if (is_const) {
            /* extend the RLE run over equal const groups */
            long e = g + 1;
            uint64_t e0;
            while (e < ng && group_is_const(v, n, e, &e0) && e0 == g0)
                e++;
            long count = (e - g) * 8;
            if (e == ng && (n % 8))
                count -= 8 - (n % 8);
            o = put_uvarint(out, o, (uint64_t)count << 1);
            for (int b = 0; b < vbytes; b++)
                out[o++] = (uint8_t)(g0 >> (8 * b));
            g = e;
        } else {
            /* extend the bit-packed run over non-const groups */
            long e = g + 1;
            uint64_t e0;
            while (e < ng && !group_is_const(v, n, e, &e0))
                e++;
            o = put_uvarint(out, o, ((uint64_t)(e - g) << 1) | 1);
            uint64_t acc = 0;
            int nbits = 0;
            for (long i = g * 8; i < e * 8; i++) {
                uint64_t x = i < n ? v[i] : v[n - 1];
                acc |= x << nbits;
                nbits += width;
                while (nbits >= 8) {
                    out[o++] = (uint8_t)acc;
                    acc >>= 8;
                    nbits -= 8;
                }
            }
            if (nbits)
                out[o++] = (uint8_t)acc;
            g = e;
        }
    }
    return o;
}

/* Hybrid decode: fills exactly n values, skipping empty RLE runs.
 * Returns n, or -1 on anything anomalous — malformed/overlong varint,
 * or a bit-packed run whose declared payload exceeds the buffer — so
 * the caller falls back to the numpy reference and malformed-input
 * behavior stays identical across paths (numpy raises on a payload
 * truncated mid-run; it must not be silently zero-filled here). */
long rle_decode(const uint8_t *in, long len, long n, int width,
                uint64_t *out)
{
    long pos = 0, got = 0;
    int vbytes = (width + 7) / 8;
    uint64_t mask = width >= 64 ? ~0ULL : ((1ULL << width) - 1);
    while (got < n && pos < len) {
        uint64_t h = 0;
        int shift = 0;
        for (;;) {
            if (pos >= len)
                return -1;
            uint8_t b = in[pos++];
            if (shift == 63 && b > 1)
                return -1; /* bits past 2^64: numpy reads a bigint */
            h |= (uint64_t)(b & 0x7F) << shift;
            if (!(b & 0x80))
                break;
            shift += 7;
            if (shift > 63)
                return -1;
        }
        if (h & 1) {
            long groups = (long)(h >> 1);
            /* payload is exactly groups*width bytes; compare without
             * multiplying (groups can be 2^62 on corrupt input — the
             * product would overflow and wreck the bounds checks) */
            if (groups > (len - pos) / width)
                return -1;
            long cnt = groups * 8;
            long run_end = pos + groups * width;
            uint64_t acc = 0;
            int nbits = 0;
            long i = 0;
            long want = cnt < (n - got) ? cnt : (n - got);
            while (i < want) {
                /* width <= 32, so 4-byte refills keep everything in one
                 * 64-bit register (nbits stays < 64) */
                if (nbits <= 32 && pos + 4 <= run_end) {
                    uint32_t w;
                    memcpy(&w, in + pos, 4);
                    acc |= (uint64_t)w << nbits;
                    nbits += 32;
                    pos += 4;
                } else {
                    while (nbits < width) { /* tail: byte refill, 0-pad */
                        uint64_t b = pos < run_end ? in[pos] : 0;
                        pos++;
                        acc |= b << nbits;
                        nbits += 8;
                    }
                }
                while (nbits >= width && i < want) {
                    out[got++] = acc & mask;
                    acc >>= width;
                    nbits -= width;
                    i++;
                }
            }
            pos = run_end; /* skip any unconsumed payload */
        } else {
            long cnt = (long)(h >> 1);
            uint64_t val = 0;
            for (int b = 0; b < vbytes && pos < len; b++)
                val |= (uint64_t)in[pos++] << (8 * b);
            for (long i = 0; i < cnt && got < n; i++)
                out[got++] = val;
        }
    }
    for (long i = got; i < n; i++)
        out[i] = 0;
    return n;
}

/* FSST sequential decode. out capacity (cap) must leave 8 bytes of
 * slack past the expected size so symbol writes can be one unconditional
 * 8-byte store. Returns decoded length, -1 on malformed input (escape at
 * end / code out of range), -2 on output overflow. */
long fsst_decode(const uint8_t *in, long n,
                 const uint64_t *keys, const uint8_t *lens, long nsyms,
                 uint8_t *out, long cap)
{
    long i = 0, o = 0;
    long safe = cap - 8;
    while (i < n) {
        uint8_t c = in[i++];
        if (c == 255) {
            if (i >= n)
                return -1;
            if (o >= cap)
                return -2;
            out[o++] = in[i++];
        } else {
            if (c >= nsyms)
                return -1;
            if (o > safe)
                return -2;
            uint64_t w = keys[c];
            memcpy(out + o, &w, 8);
            o += lens[c];
        }
    }
    return o;
}
"""


class _Lib:
    __slots__ = ("encode", "decode", "xxh64", "poly64",
                 "rle_encode", "rle_decode")

    def __init__(self, dll: ctypes.CDLL):
        u8p = ctypes.POINTER(ctypes.c_uint8)
        self.xxh64 = dll.xxh64_batch
        self.xxh64.restype = None
        self.xxh64.argtypes = [
            u8p, ctypes.POINTER(ctypes.c_int64), ctypes.c_long,
            ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint64),
        ]
        self.poly64 = dll.poly64_batch
        self.poly64.restype = None
        self.poly64.argtypes = [
            u8p, ctypes.POINTER(ctypes.c_int64), ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint64),
        ]
        self.rle_encode = dll.rle_encode
        self.rle_encode.restype = ctypes.c_long
        self.rle_encode.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_long, ctypes.c_int,
            u8p,
        ]
        self.rle_decode = dll.rle_decode
        self.rle_decode.restype = ctypes.c_long
        self.rle_decode.argtypes = [
            u8p, ctypes.c_long, ctypes.c_long, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint64),
        ]
        self.encode = dll.fsst_encode
        self.encode.restype = ctypes.c_long
        self.encode.argtypes = [
            u8p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint64), u8p,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int16), u8p,
        ]
        self.decode = dll.fsst_decode
        self.decode.restype = ctypes.c_long
        self.decode.argtypes = [
            u8p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint64), u8p, ctypes.c_long,
            u8p, ctypes.c_long,
        ]


def _build(cc: str, cache_dir: str, so_path: str) -> None:
    os.makedirs(cache_dir, exist_ok=True)
    src = os.path.join(cache_dir, "fsst.c")
    with open(src, "w") as f:
        f.write(_C_SOURCE)
    fd, tmp_so = tempfile.mkstemp(dir=cache_dir, suffix=".so")
    os.close(fd)
    try:
        subprocess.run(
            [cc, "-O3", "-fPIC", "-shared", "-o", tmp_so, src],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp_so, so_path)  # atomic: concurrent workers race safely
    finally:
        if os.path.exists(tmp_so):
            os.unlink(tmp_so)


def _cache_dir(digest: str) -> str | None:
    """Per-user 0o700 cache dir for the compiled kernels. The path
    embeds the uid and the dir must be OWNED by this user: a
    deterministic world-visible path under /tmp would let any other
    local user pre-create it and plant a malicious fsst.so that we then
    ctypes.CDLL — arbitrary code execution. A dir we don't own (or
    can't verify) means "no native kernels", never "trust it"."""
    uid = os.getuid() if hasattr(os, "getuid") else 0
    base = os.environ.get("XDG_CACHE_HOME") or tempfile.gettempdir()
    d = os.path.join(base, f"colcodec-native-{uid}-{digest}")
    try:
        os.makedirs(d, mode=0o700, exist_ok=True)
        st = os.stat(d)
        if hasattr(os, "getuid") and st.st_uid != uid:
            return None
        os.chmod(d, 0o700)  # exist_ok keeps a prior mode — force ours
    except OSError:
        return None
    return d


def load() -> _Lib | None:
    """Compile (once per host, cached by source hash) and bind the kernels.

    Returns None — meaning "use the numpy path" — when disabled via
    SPARK_COLCODEC_NATIVE=0, on big-endian hosts (the kernels assume the
    table's little-endian uint64 key packing matches memory order), or
    when no working C compiler is available.
    """
    if os.environ.get("SPARK_COLCODEC_NATIVE", "1") == "0":
        return None
    if sys.byteorder != "little":
        return None
    digest = hashlib.sha256(_C_SOURCE.encode()).hexdigest()[:16]
    cache_dir = _cache_dir(digest)
    if cache_dir is None:
        return None
    so_path = os.path.join(cache_dir, "fsst.so")
    try:
        if not os.path.exists(so_path):
            cc = next(
                (c for c in ("cc", "gcc", "clang") if shutil.which(c)), None
            )
            if cc is None:
                return None
            _build(cc, cache_dir, so_path)
        if hasattr(os, "getuid") and os.stat(so_path).st_uid != os.getuid():
            return None  # not our artifact — refuse to load it
        return _Lib(ctypes.CDLL(so_path))
    except Exception:
        return None
