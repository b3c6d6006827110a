"""Value-level verification for the queries without a DuckDB oracle
(VERDICT round-2 item 4): minhash_pairs, simhash, simhash_pairs depend
on Spark's xxhash64, which DuckDB cannot reproduce — but a pure-Python
Spark-exact XXH64 (tests/xxh64ref.py, pinned bit-for-bit against the
engine) can. Each test recomputes the full operator pipeline in plain
Python over a 200-document slice of the real sf0.001 corpus and asserts
EXACT equality of the Spark output, so hash-construction bugs cannot
hide behind the weaker rows-only driver check.
"""

from __future__ import annotations

import math
import re
from itertools import combinations

import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from parquet_go_spark.operators import dedup
from tests.xxh64ref import xxhash64

SF_DIR = "/root/testdata/sf0.001"
N_DOCS = 200


@pytest.fixture(scope="module")
def corpus():
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    rows = [(r["doc_id"], r["text"]) for r in t.to_pylist()]
    rows = [r for r in rows if r[0] < N_DOCS]
    assert len(rows) == N_DOCS
    return rows


@pytest.fixture(scope="module")
def docs_df(spark, corpus):
    return spark.createDataFrame(corpus, "doc_id bigint, text string")


def _grams(text: str, n: int = 3) -> list[str]:
    if len(text) < n:
        return []
    seen, out = set(), []
    for i in range(len(text) - n + 1):
        g = text[i:i + n]
        if g not in seen:
            seen.add(g)
            out.append(g)
    return out


def _round_portable(x: float, digits: int) -> float:
    f = 10 ** digits
    return math.floor(x * f + 0.5) / f


def _ref_minhash_pairs(corpus, *, n=3, num_perm=64, bands=8, threshold=0.8):
    """Mirror of dedup.minhash_dedup_pairs in plain Python."""
    gram_sets = {i: _grams(t, n) for i, t in corpus}
    sigs = {}
    for i, grams in gram_sets.items():
        if not grams:  # no gram rows → doc absent from the signature agg
            continue
        sigs[i] = [min(xxhash64(g, ("i", p)) for g in grams)
                   for p in range(num_perm)]
    rows = num_perm // bands
    buckets: dict[tuple, list[int]] = {}
    for i, sig in sigs.items():
        for b in range(bands):
            h = xxhash64(*sig[b * rows:(b + 1) * rows])
            buckets.setdefault((b, h), []).append(i)
    cands = set()
    for ids in buckets.values():
        for a, b in combinations(sorted(ids), 2):
            cands.add((a, b))
    est_cut = max(0.0, threshold - 0.15)
    out = {}
    for a, b in cands:
        # mirror the operator's byte-packed estimator: agreement counts
        # equal LOW BYTES of the signature components (an upper bound on
        # component agreement; Python's & on negative ints is two's
        # complement, so x & 0xFF matches Spark's signed-bigint low byte)
        agree = sum(
            (x & 0xFF) == (y & 0xFF) for x, y in zip(sigs[a], sigs[b])
        ) / num_perm
        if agree < est_cut:
            continue
        ga, gb = set(gram_sets[a]), set(gram_sets[b])
        j = _round_portable(len(ga & gb) / (len(ga) + len(gb) - len(ga & gb)), 6)
        if j >= threshold:
            out[(a, b)] = j
    return out


def _ref_simhash(corpus):
    """Mirror of dedup.simhash in plain Python (signed-64 sketches)."""
    out = {}
    for i, text in corpus:
        toks = re.split(r"\s+", text.strip())
        votes = [0] * 64
        for t in toks:
            h = xxhash64(t)
            for bit in range(64):
                votes[bit] += 1 if (h >> bit) & 1 else -1
        u = 0
        for bit in range(64):
            if votes[bit] > 0:
                u |= 1 << bit
        out[i] = u - (1 << 64) if u >= (1 << 63) else u
    return out


def _ref_simhash_pairs(sketches, max_hamming=8):
    """Brute-force ALL-pairs oracle. Round 4's reference mirrored the
    operator's banding, so a recall gap was invisible to the test; the
    round-5 operator guarantees recall at the radius (permuted-block
    tables), so its output must equal exhaustive comparison exactly —
    the oracle is now scheme-independent."""
    out = {}
    for a, b in combinations(sorted(sketches), 2):
        ham = bin((sketches[a] ^ sketches[b]) & ((1 << 64) - 1)).count("1")
        if ham <= max_hamming:
            out[(a, b)] = ham
    return out


def test_minhash_pairs_exact_values(docs_df, corpus):
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in dedup.minhash_dedup_pairs(
               docs_df, "doc_id", "text", threshold=0.8).collect()}
    want = _ref_minhash_pairs(corpus, threshold=0.8)
    assert got == want
    assert len(want) > 0, "fixture should contain near-dup pairs"


def test_simhash_exact_values(docs_df, corpus):
    got = {r["id"]: r["simhash"]
           for r in dedup.simhash(docs_df, "doc_id", "text").collect()}
    want = _ref_simhash(corpus)
    assert got == want


def test_simhash_pairs_exact_values(docs_df, corpus):
    sk = dedup.simhash(docs_df, "doc_id", "text")
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in dedup.simhash_near_pairs(sk, max_hamming=8).collect()}
    want = _ref_simhash_pairs(_ref_simhash(corpus), max_hamming=8)
    assert got == want
    assert len(want) > 0, "fixture should contain near pairs"


def _signed64(u: int) -> int:
    u &= (1 << 64) - 1
    return u - (1 << 64) if u >= (1 << 63) else u


def test_simhash_block_tables_soundness():
    from itertools import combinations as _comb

    for k in (0, 1, 3, 8, 16):
        for m in (1, 2, 3):
            sizes, offsets, tables = dedup.simhash_block_tables(k, m)
            assert sum(sizes) == 64
            assert offsets == [sum(sizes[:i]) for i in range(len(sizes))]
            assert tables == list(_comb(range(k + m), m))
    with pytest.raises(ValueError):
        dedup.simhash_block_tables(63, 2)


def test_simhash_pairs_adversarial_spread_bits(spark):
    """Pairs differing in 4-8 bits spread across ALL four 16-bit quarters
    — the exact class the round-4 4×16 banding silently missed (no
    quarter equal → no shared band). The permuted-block tables must find
    every one of them."""
    base = 0x0123_4567_89AB_CDEF
    # 8 flipped bits, two per 16-bit quarter
    spread8 = base ^ (
        (1 << 0) | (1 << 9) | (1 << 17) | (1 << 30)
        | (1 << 33) | (1 << 46) | (1 << 50) | (1 << 63)
    )
    # 4 flipped bits, one per quarter
    spread4 = base ^ ((1 << 3) | (1 << 20) | (1 << 37) | (1 << 54))
    far = base ^ ((1 << 64) - 1)  # hamming 64 decoy
    sketches = {0: base, 1: spread8, 2: spread4, 3: far}
    # sanity: every quarter of (0,1) and (0,2) differs → old banding missed
    for other in (spread8, spread4):
        assert all(
            ((base >> (16 * q)) & 0xFFFF) != ((other >> (16 * q)) & 0xFFFF)
            for q in range(4)
        )
    sk = spark.createDataFrame(
        [(i, _signed64(u)) for i, u in sketches.items()],
        "id bigint, simhash bigint",
    )
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in dedup.simhash_near_pairs(sk, max_hamming=8).collect()}
    assert got == _ref_simhash_pairs(sketches, max_hamming=8)
    assert got[(0, 1)] == 8 and got[(0, 2)] == 4


def test_simhash_auto_key_blocks_escalates():
    """The cost model must widen keys as the corpus grows (a fixed
    scheme's candidate join output is quadratic in docs — the sf1 scale
    step measured it), and cap the table count."""
    from math import comb

    kbs = [dedup.simhash_auto_key_blocks(n, 8)
           for n in (500, 5_000, 50_000, 500_000, 50_000_000)]
    assert kbs == sorted(kbs)  # monotone escalation
    assert kbs[0] <= 2 and kbs[2] >= 3  # 50k docs must not stay at kb=2
    for n in (1, 10**12):
        kb = dedup.simhash_auto_key_blocks(n, 8)
        assert comb(8 + kb, kb) <= 2048


def test_simhash_pairs_key_blocks_invariant(spark):
    """Every key_blocks scheme (and auto) must return IDENTICAL pairs —
    recall is guaranteed per scheme and the hamming verify is exact."""
    import random

    rng = random.Random(0xB10C)
    sketches = {}
    for j in range(40):
        u = rng.getrandbits(64)
        sketches[2 * j] = u
        v = u
        for b in rng.sample(range(64), rng.randrange(0, 12)):
            v ^= 1 << b
        sketches[2 * j + 1] = v
    sk = spark.createDataFrame(
        [(j, _signed64(u)) for j, u in sketches.items()],
        "id bigint, simhash bigint",
    )
    want = _ref_simhash_pairs(sketches, max_hamming=8)
    for kb in (1, 2, 3, "auto"):
        got = {(r["id_a"], r["id_b"]): r["hamming"]
               for r in dedup.simhash_near_pairs(
                   sk, max_hamming=8, key_blocks=kb).collect()}
        assert got == want, f"key_blocks={kb}"
    # n_docs hint path: no counting job, same output
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in dedup.simhash_near_pairs(
               sk, max_hamming=8, n_docs=len(sketches)).collect()}
    assert got == want


@pytest.mark.parametrize("max_hamming", [3, 8])
def test_simhash_pairs_random_recall(spark, max_hamming):
    """Seeded random sketches with planted perturbations at every radius
    0..max_hamming: operator output == exhaustive all-pairs comparison."""
    import random

    rng = random.Random(0x5EED + max_hamming)
    sketches = {}
    i = 0
    for _ in range(12):
        u = rng.getrandbits(64)
        sketches[i] = u
        i += 1
        for ham in range(max_hamming + 1):
            flips = rng.sample(range(64), ham)
            v = u
            for b in flips:
                v ^= 1 << b
            sketches[i] = v
            i += 1
    sk = spark.createDataFrame(
        [(j, _signed64(u)) for j, u in sketches.items()],
        "id bigint, simhash bigint",
    )
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in dedup.simhash_near_pairs(sk, max_hamming=max_hamming)
           .collect()}
    assert got == _ref_simhash_pairs(sketches, max_hamming=max_hamming)
    assert len(got) >= 12 * max_hamming  # planted pairs exist


def test_xxh64_reference_pinned_to_spark(spark):
    """The Python XXH64 must equal the engine bit-for-bit across arg
    shapes (string, chained int32, long chains, empty, long string)."""
    df = spark.range(1).select(
        F.xxhash64(F.lit("abc")).alias("a"),
        F.xxhash64(F.lit("")).alias("b"),
        F.xxhash64(F.lit("hello world, this is a longer string 1234567")).alias("c"),
        F.xxhash64(F.lit("abc"), F.lit(7)).alias("d"),
        F.xxhash64(F.lit(123456789).cast("bigint")).alias("e"),
        F.xxhash64(F.lit(-5).cast("bigint"), F.lit(9).cast("bigint")).alias("f"),
        F.xxhash64(F.lit("x" * 100)).alias("g"),
    ).head()
    assert df["a"] == xxhash64("abc")
    assert df["b"] == xxhash64("")
    assert df["c"] == xxhash64("hello world, this is a longer string 1234567")
    assert df["d"] == xxhash64("abc", ("i", 7))
    assert df["e"] == xxhash64(123456789)
    assert df["f"] == xxhash64(-5, 9)
    assert df["g"] == xxhash64("x" * 100)
