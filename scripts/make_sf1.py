"""Deterministically synthesize /tmp/sf1 (10x sf0.1) for the round-5
scale-step bench: every table is 10 shifted copies of the sf0.1 table.

Key columns shift by copy*stride so ids stay unique; documents.text
goes through a per-copy character cipher and embeddings through a
per-copy dimension roll so near-duplicate structure scales ~linearly
(verbatim or lightly-perturbed copies are cross-copy near-duplicates,
which squares candidate counts and makes every LSH-family operator
look super-linear for data reasons, not plan reasons — see the inline
comments for the rejected designs). Everything is a pure function of
(sf0.1 bytes, copy id) — no randomness, no external data.
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
COPIES = 10

ID_COLS = {
    "customer": ["c_custkey"], "documents": ["doc_id"],
    "embeddings": ["vec_id"], "events": ["event_id"],
    "lineitem": ["l_orderkey"], "orders": ["o_orderkey"],
    "part": ["p_partkey"], "supplier": ["s_suppkey"],
}


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    for name in ("region", "nation"):  # dims stay as-is
        pq.write_table(pq.read_table(f"{SRC}/{name}.parquet"),
                       f"{DST}/{name}.parquet")
    for name, keys in ID_COLS.items():
        t = pq.read_table(f"{SRC}/{name}.parquet")
        strides = {k: int(pc.max(t.column(k)).as_py()) + 1 for k in keys}
        copies = []
        for c in range(COPIES):
            tc_ = t
            for k in keys:
                i = tc_.column_names.index(k)
                tc_ = tc_.set_column(
                    i, k, pc.add(tc_.column(k),
                                 pa.scalar(c * strides[k],
                                           tc_.column(k).type.id and
                                           tc_.column(k).type)))
            if name == "documents" and c > 0:
                # per-copy CHARACTER CIPHER (bijective rotation inside
                # [a-z], [A-Z], [0-9]; whitespace/punct fixed): every
                # n-gram containing an alphanumeric changes, so copy k
                # of a document is NOT a minhash/simhash near-duplicate
                # of copy j, while WITHIN a copy the cipher is a
                # bijection on texts — exact-dup and near-dup structure
                # inside each copy is preserved verbatim. (A cyclic
                # string shift was tried first and rejected: n-gram
                # multisets are rotation-invariant up to the seam, so
                # cross-copy similarity survived and the scale-step
                # measured data growth, not plan shape.)
                i = tc_.column_names.index("text")
                lo = "abcdefghijklmnopqrstuvwxyz"
                up = lo.upper()
                dg = "0123456789"
                k = 7 * c
                tab = str.maketrans(
                    lo + up + dg,
                    lo[k % 26:] + lo[:k % 26]
                    + up[k % 26:] + up[:k % 26]
                    + dg[c % 10:] + dg[:c % 10])
                txt = pa.array(
                    [t_.translate(tab)
                     for t_ in tc_.column("text").to_pylist()],
                    pa.string())
                tc_ = tc_.set_column(i, "text", txt)
            if name == "embeddings" and c > 0:
                # per-copy ROLL of the dimensions: norms and intra-copy
                # angles are exactly preserved (near-dup structure per
                # copy == sf0.1), while cross-copy cosine collapses to
                # the random-vector baseline (a 1e-3 perturbation left
                # copies ~identical and inflated LSH buckets ~10x deep,
                # quadratic candidate growth for data reasons).
                i = tc_.column_names.index("embedding")
                col = tc_.column("embedding").combine_chunks()
                off = np.asarray(col.offsets, dtype=np.int64)
                vals = np.asarray(col.values, dtype=np.float32)
                dim = int(off[1] - off[0]) if len(off) > 1 else 1
                mat = vals[:off[-1]].reshape(-1, dim)
                mat = np.roll(mat, 7 * c, axis=1)
                new = pa.ListArray.from_arrays(
                    pa.array(off, pa.int32()),
                    pa.array(mat.reshape(-1), pa.float32()))
                tc_ = tc_.set_column(i, "embedding", new)
            copies.append(tc_)
        out = pa.concat_tables(copies)
        pq.write_table(out, f"{DST}/{name}.parquet")
        print(name, out.num_rows, flush=True)


if __name__ == "__main__":
    main()
