"""FSST: Fast Static Symbol Table string compression.

Extension codec mandated by the north star — NOT in parquet-go; derived
from the published paper "FSST: Fast Random Access String Compression",
PVLDB 13(11), 2020. Up to 255 symbols of 1-8 bytes each get 1-byte
codes; code 255 is an escape followed by one literal byte.

Vectorized design (no per-byte Python):
  * A symbol is (length, key) where key packs the symbol bytes into a
    uint64 little-endian — so symbol comparison/lookup is integer math.
  * Parsing (both for training and encoding) is iterative pair-merging:
    start with one token per byte, then repeatedly merge adjacent token
    pairs whose concatenation is a table symbol. Intra-pass overlap
    conflicts are resolved by keeping alternate candidates within each
    run of consecutive candidates (left-greedy, fully vectorized via
    maximum.accumulate).
  * Training counts token and adjacent-pair frequencies on a sample and
    keeps the 255 symbols with the best gain (count x bytes-saved),
    iterated for a few generations exactly like the paper's bottom-up
    symbol construction.
  * Decoding distinguishes escape markers from escaped 0xFF literals
    with the run-parity trick, then reconstructs output with one
    repeat/arange gather.

Chunk layout (strings are encoded as one concatenated stream; original
row boundaries are restored from the stored lengths, so symbols may
span adjacent rows — harmless for round-trip):
  uvarint n_strings | DELTA_BINARY_PACKED(lengths:int32) |
  u8 n_symbols | n_symbols length bytes | concatenated symbol bytes |
  uvarint encoded_len | encoded bytes
"""

from __future__ import annotations

import numpy as np

from . import delta
from .bytearrays import ByteArrays
from .varint import read_uvarint, write_uvarint

MAX_SYMBOLS = 255
ESCAPE = 255
MAX_LEN = 8
SAMPLE_BYTES = 1 << 16
GENERATIONS = 6  # symbol quality converges at 6 bottom-up generations
# (ratio 3.03 vs 2.04 at 2) — ~50 ms per chunk, negligible vs encoding
PARSE_PASSES = 4  # compression converges at 4 passes on code-like
# corpora (ratio 1.734 at 4 == 6 passes; 1.63 at 2) — the loop also
# stops early as soon as a pass finds no merge

_H1 = np.uint64(0x9E3779B97F4A7C15)
_H2 = np.uint64(0xC2B2AE3D27D4EB4F)
_BUCKET_BITS = 16
_NBUCKETS = 1 << _BUCKET_BITS


def _buckets(keys: np.ndarray, salt: int) -> np.ndarray:
    """Hash a packed symbol key to a 16-bit bucket. Key-only hashing: the
    table dedupes same-key symbols at build time (a key collides across
    lengths only when a symbol has trailing NUL bytes), so the length
    never needs hashing — saving a uint64 conversion + multiply on every
    lookup over millions of positions. The salt makes the ≤255 table
    symbols collision-free, so lookup is one gather + exact verify."""
    s = np.uint64((salt * int(_H2)) & 0xFFFFFFFFFFFFFFFF)
    h = np.asarray(keys, dtype=np.uint64) * _H1 + s
    h ^= h >> np.uint64(33)
    h *= _H1
    return (h >> np.uint64(64 - _BUCKET_BITS)).astype(np.int64)


class FsstTable:
    __slots__ = ("lengths", "keys", "salt", "_bucket_key", "_bucket_meta")

    def __init__(self, lengths: np.ndarray, keys: np.ndarray):
        """lengths: (k,) uint8 in 1..8; keys: (k,) uint64. Codes are the
        positions in (length, key) sorted order — deterministic.

        Same-key duplicates (symbols differing only by trailing NULs) are
        dropped, keeping the shortest — required for key-only hashing."""
        order = np.lexsort((lengths, keys))
        keys = keys[order].astype(np.uint64)
        lengths = lengths[order].astype(np.uint8)
        keep = np.ones(len(keys), dtype=bool)
        keep[1:] = keys[1:] != keys[:-1]
        keys, lengths = keys[keep], lengths[keep]
        order = np.lexsort((keys, lengths))
        self.lengths = lengths[order]
        self.keys = keys[order]
        self.salt = 0
        for salt in range(256):  # ≤255 syms in 65536 buckets: ~0.6 tries
            b = _buckets(self.keys, salt)
            if len(np.unique(b)) == len(b):
                self.salt = salt
                break
        else:
            raise RuntimeError("FSST: no collision-free salt found")
        # fused bucket tables: key for the exact match + (code+1 | len<<16)
        # for metadata — lookup is 2 gathers instead of a code indirection
        # followed by key/length gathers
        b = _buckets(self.keys, self.salt)
        bk = np.zeros(_NBUCKETS, dtype=np.uint64)
        bm = np.zeros(_NBUCKETS, dtype=np.int32)
        bk[b] = self.keys
        bm[b] = (np.arange(len(self.keys), dtype=np.int32) + 1) | (
            self.lengths.astype(np.int32) << 16
        )
        self._bucket_key = bk
        self._bucket_meta = bm

    def __len__(self) -> int:
        return len(self.lengths)

    def lookup(self, lens: np.ndarray, keys: np.ndarray) -> np.ndarray:
        """Vectorized (len, key) -> code, -1 if absent."""
        if len(self.keys) == 0 or len(lens) == 0:
            return np.full(len(lens), -1, dtype=np.int64)
        b = _buckets(keys, self.salt)
        meta = self._bucket_meta[b]
        hit = (self._bucket_key[b] == keys) & (
            (meta >> 16) == lens
        ) & (meta != 0)
        return np.where(hit, (meta & 0xFFFF) - 1, -1).astype(np.int64)

    def serialize(self) -> bytes:
        out = bytearray([len(self.lengths)])
        out += self.lengths.tobytes()
        for i in range(len(self.lengths)):
            ln = int(self.lengths[i])
            out += int(self.keys[i]).to_bytes(8, "little")[:ln]
        return bytes(out)

    @staticmethod
    def deserialize(buf, pos: int) -> tuple["FsstTable", int]:
        k = buf[pos]
        pos += 1
        lengths = np.frombuffer(bytes(buf[pos : pos + k]), dtype=np.uint8).copy()
        pos += k
        keys = np.zeros(k, dtype=np.uint64)
        for i in range(k):
            ln = int(lengths[i])
            keys[i] = int.from_bytes(bytes(buf[pos : pos + ln]), "little")
            pos += ln
        return FsstTable(lengths, keys), pos


def _merge_pass(tok_key: np.ndarray, tok_len: np.ndarray, table: FsstTable):
    """One pair-merge pass; mutates and compresses the token arrays.

    tok_key is uint64, tok_len is uint8; both owned by the caller loop
    (safe to mutate). Pairs longer than 8 bytes get a clamped (wrong)
    key, but the exact length verify in lookup rejects them.
    """
    n = len(tok_key)
    if n < 2:
        return tok_key, tok_len, False
    pair_len = tok_len[:-1] + tok_len[1:]  # uint8; max 16, no overflow
    shift = np.minimum(tok_len[:-1], 7).astype(np.uint64)
    shift <<= np.uint64(3)
    pair_key = tok_key[1:] << shift
    pair_key |= tok_key[:-1]
    cand = table.lookup(pair_len, pair_key) >= 0
    if not cand.any():
        return tok_key, tok_len, False
    # resolve overlaps: within each run of consecutive candidates keep
    # the ones at even offset from the run start (left-greedy);
    # run starts via diff + cumsum (SIMD) instead of maximum.accumulate
    run_start = cand.copy()
    run_start[1:] &= ~cand[:-1]
    run_id = np.cumsum(run_start, dtype=np.int32)  # 1-based run number
    starts = np.flatnonzero(run_start)
    ci = np.flatnonzero(cand)
    offset = ci - starts[run_id[ci] - 1]
    ki = ci[(offset & 1) == 0]
    tok_key[ki] = pair_key[ki]
    tok_len[ki] = pair_len[ki]
    alive = np.ones(n, dtype=bool)
    alive[ki + 1] = False
    return tok_key[alive], tok_len[alive], True


TRAIN_PARSE_PASSES = 1  # during training, parse the sample SHALLOW: pair
# counts over short tokens estimate greedy-encode gain far better than
# counts over already-merged long tokens — measured ratio 3.0 vs 1.3 on
# code-like text with deep training parses


def _parse(data: np.ndarray, table: FsstTable,
           max_passes: int | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Tokenize data (uint8 array) into table symbols + leftover bytes."""
    tok_key = data.astype(np.uint64)
    tok_len = np.ones(len(data), dtype=np.uint8)
    for _ in range(max_passes or PARSE_PASSES):
        tok_key, tok_len, changed = _merge_pass(tok_key, tok_len, table)
        if not changed:
            break
    return tok_key, tok_len


def _unique_counts(lens: np.ndarray, keys: np.ndarray):
    """Unique (len, key) pairs + counts via lexsort (no hashing)."""
    if len(lens) == 0:
        return lens, keys, np.empty(0, dtype=np.int64)
    order = np.lexsort((keys, lens))
    sl, sk = lens[order], keys[order]
    new = np.ones(len(sl), dtype=bool)
    new[1:] = (sl[1:] != sl[:-1]) | (sk[1:] != sk[:-1])
    starts = np.flatnonzero(new)
    counts = np.diff(np.append(starts, len(sl)))
    return sl[starts], sk[starts], counts


def train(data: np.ndarray, generations: int = GENERATIONS) -> FsstTable:
    """Build a symbol table from (a sample of) the data."""
    sample = data[:SAMPLE_BYTES]
    if len(sample) == 0:
        return FsstTable(np.empty(0, np.uint8), np.empty(0, np.uint64))
    # generation 0: most frequent single bytes
    counts = np.bincount(sample, minlength=256)
    order = np.argsort(-counts, kind="stable")
    present = order[counts[order] > 0][:MAX_SYMBOLS]
    table = FsstTable(
        np.ones(len(present), dtype=np.uint8), present.astype(np.uint64)
    )
    for _ in range(generations):
        tok_key, tok_len = _parse(sample, table, TRAIN_PARSE_PASSES)
        # candidate pool: current tokens + adjacent-pair concatenations
        t_l, t_k, t_c = _unique_counts(tok_len, tok_key)
        cand_l = [t_l]
        cand_k = [t_k]
        cand_c = [t_c]
        if len(tok_key) > 1:
            ll = tok_len[:-1].astype(np.uint64)
            pair_len = tok_len[:-1] + tok_len[1:]
            shift = np.minimum(ll << np.uint64(3), np.uint64(56))
            pair_key = tok_key[:-1] | (tok_key[1:] << shift)
            fits = pair_len <= MAX_LEN
            p_l, p_k, p_c = _unique_counts(pair_len[fits], pair_key[fits])
            cand_l.append(p_l)
            cand_k.append(p_k)
            cand_c.append(p_c)
        al = np.concatenate(cand_l)
        ak = np.concatenate(cand_k)
        ac = np.concatenate(cand_c)
        # merge duplicates between token & pair pools
        ul, uk, _ = _unique_counts(al, ak)
        # re-accumulate counts onto unique entries
        order = np.lexsort((ak, al))
        sl, sk, sc = al[order], ak[order], ac[order]
        new = np.ones(len(sl), dtype=bool)
        new[1:] = (sl[1:] != sl[:-1]) | (sk[1:] != sk[:-1])
        gid = np.cumsum(new) - 1
        gcounts = np.bincount(gid, weights=sc).astype(np.int64)
        ul = sl[new]
        uk = sk[new]
        # gain: bytes saved = count*(len-1) for multi-byte symbols,
        # count*1 for single bytes (escape avoidance)
        gain = np.where(ul >= 2, gcounts * (ul - 1), gcounts)
        top = np.argsort(-gain, kind="stable")[:MAX_SYMBOLS]
        top = top[gain[top] > 0]
        table = FsstTable(ul[top].astype(np.uint8), uk[top])
    return table


ENC_BLOCK = 256 << 10  # cache-resident segments: the parse working set is
# ~9x the segment (uint64 token keys + pair temporaries), so 256 KB keeps
# it inside L2/L3 instead of DRAM — measured 6x aggregate-throughput gain
# at 32 concurrent workers on a bandwidth-limited host, and it removes the
# first-call heap-growth stall on big chunks


def encode_stream(data: np.ndarray, table: FsstTable) -> bytes:
    """Encode a flat uint8 stream with a trained table.

    Encoded blocks concatenate into one valid stream: every escape marker
    consumes exactly the following byte, so the decoder's run-parity scan
    is insensitive to where block boundaries fell (symbols simply never
    span a boundary — a negligible ratio cost)."""
    if len(data) <= ENC_BLOCK:
        return _encode_block(data, table)
    return b"".join(
        _encode_block(data[s : s + ENC_BLOCK], table)
        for s in range(0, len(data), ENC_BLOCK)
    )


def _encode_block(data: np.ndarray, table: FsstTable) -> bytes:
    if len(data) == 0:
        return b""
    tok_key, tok_len = _parse(data, table)
    codes = table.lookup(tok_len, tok_key)
    # unmatched tokens are single leftover bytes -> escape
    matched = codes >= 0
    out_len = np.where(matched, 1, 2).astype(np.int64)
    out_off = np.concatenate([[0], np.cumsum(out_len)])
    total = int(out_off[-1])
    out = np.empty(total, dtype=np.uint8)
    mpos = out_off[:-1][matched]
    out[mpos] = codes[matched].astype(np.uint8)
    upos = out_off[:-1][~matched]
    out[upos] = ESCAPE
    out[upos + 1] = tok_key[~matched].astype(np.uint8)
    return out.tobytes()


def decode_stream(buf: np.ndarray, table: FsstTable, expected: int) -> np.ndarray:
    """Decode a code stream back to the original uint8 stream."""
    codes = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    n = len(codes)
    if n == 0:
        return np.empty(0, dtype=np.uint8)
    is_esc_val = codes == ESCAPE
    # markers: within each run of consecutive 0xFF bytes (run starting at
    # a non-consumed position), positions at even run offset are escape
    # markers; odd ones are escaped literals
    run_start = is_esc_val.copy()
    run_start[1:] &= ~is_esc_val[:-1]
    run_id = np.cumsum(run_start)
    starts = np.flatnonzero(run_start)
    ei = np.flatnonzero(is_esc_val)
    marker = np.zeros(n, dtype=bool)
    if len(ei):
        offset = ei - starts[run_id[ei] - 1]
        marker[ei[(offset & 1) == 0]] = True
    literal = np.zeros(n, dtype=bool)
    literal[1:] = marker[:-1]
    token_pos = ~literal  # marker or plain code
    tpos = np.flatnonzero(token_pos)
    t_marker = marker[tpos]
    tcodes = codes[tpos].astype(np.int64)
    # output lengths per token
    sym_lens = table.lengths.astype(np.int64)
    out_lens = np.where(t_marker, 1, sym_lens[np.where(t_marker, 0, tcodes)] if len(sym_lens) else 1)
    if len(sym_lens) == 0:
        out_lens = np.ones(len(tpos), dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(out_lens)])
    total = int(offs[-1])
    out = np.empty(total, dtype=np.uint8)
    # literals (escaped bytes)
    lmask = t_marker
    out[offs[:-1][lmask]] = codes[tpos[lmask] + 1]
    # symbols: per-length column scatter — ≤ 8+7+…+1 = 36 vectorized
    # writes total instead of materializing per-byte index arrays
    smask = ~t_marker
    if smask.any():
        mat = (
            table.keys.astype("<u8").view(np.uint8).reshape(-1, MAX_LEN)
        )  # row i = symbol i's bytes in order (little-endian packing)
        sc = tcodes[smask]
        s_out_off = offs[:-1][smask]
        s_lens = sym_lens[sc]
        for ln in np.unique(table.lengths):
            ln = int(ln)
            m = s_lens == ln
            if not m.any():
                continue
            o = s_out_off[m]
            c = sc[m]
            for j in range(ln):
                out[o + j] = mat[c, j]
    if total != expected:
        raise ValueError(f"FSST decode size mismatch: {total} != {expected}")
    return out


def encode_byte_array(values: ByteArrays, table: FsstTable | None = None) -> bytes:
    """Chunk layout: uvarint n_strings | DELTA(lengths) | table |
    uvarint n_blocks | n_blocks × uvarint enc_len | concatenated block
    payloads. Per-block sizes let decode work block-by-block with the
    same cache-resident working set as encode (each block decodes
    ENC_BLOCK plain bytes, except the last)."""
    data = values.data[: values.offsets[-1]]
    table = table or train(data)
    lengths = values.lengths.astype(np.int32)
    blocks = [
        _encode_block(data[s : s + ENC_BLOCK], table)
        for s in range(0, len(data), ENC_BLOCK)
    ]
    out = bytearray()
    write_uvarint(out, len(values))
    out += delta.encode_binary_packed(lengths, 32)
    out += table.serialize()
    write_uvarint(out, len(blocks))
    for b in blocks:
        write_uvarint(out, len(b))
    for b in blocks:
        out += b
    return bytes(out)


def decode_byte_array(buf, n: int | None = None) -> ByteArrays:
    mv = buf if isinstance(buf, (bytes, bytearray)) else memoryview(buf)
    pos = 0
    n_strings, pos = read_uvarint(mv, pos)
    lengths, consumed = delta.decode_binary_packed(mv[pos:], 32)
    pos += consumed
    lengths = lengths[:n_strings].astype(np.int64)
    table, pos = FsstTable.deserialize(mv, pos)
    n_blocks, pos = read_uvarint(mv, pos)
    enc_lens = []
    for _ in range(n_blocks):
        ln, pos = read_uvarint(mv, pos)
        enc_lens.append(ln)
    total = int(lengths.sum())
    data = np.empty(total, dtype=np.uint8)
    dpos = 0
    for i, ln in enumerate(enc_lens):
        enc = np.frombuffer(mv, dtype=np.uint8, offset=pos, count=ln)
        pos += ln
        expect = min(ENC_BLOCK, total - dpos)
        data[dpos : dpos + expect] = decode_stream(enc, table, expect)
        dpos += expect
    if dpos != total:
        raise ValueError(f"FSST chunk decode mismatch: {dpos} != {total}")
    offsets = np.zeros(n_strings + 1, dtype=np.int64)
    offsets[1:] = np.cumsum(lengths)
    return ByteArrays(data, offsets)
