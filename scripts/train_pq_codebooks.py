#!/usr/bin/env python3
"""Train the product-quantization codebooks baked into
ocr_spark/functions/pq_codebooks.py.

PQ codebook training is SAMPLE-based by design (FAISS practice: train
on ~10^5-10^6 sampled vectors, encode the full corpus with the frozen
codebooks) — so the trainer is a deterministic driver-side Lloyd's
over the sampled parquet, not a distributed job: at 100 TB the sample
is what fits here, and the expensive step (encoding) is the
scan-stage expression in pq.py.

Determinism: init = the subvectors of the K lowest vec_ids, fixed 25
iterations, ties -> lowest code; empty cells keep their center. Pure
python floats (no numpy reductions) so the baked literals are
reproducible bit-for-bit anywhere.

Usage: python scripts/train_pq_codebooks.py [sf_dir] > ocr_spark/functions/pq_codebooks.py
"""
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
M, K, ITERS = 16, 16, 25

rows = duckdb.connect().execute(
    f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet' ORDER BY vec_id"
).fetchall()
dim = len(rows[0][1])
assert dim % M == 0, (dim, M)
ds = dim // M

books = []
for m in range(M):
    subs = [[float(x) for x in emb[m * ds : (m + 1) * ds]] for _, emb in rows]
    cents = [list(subs[i]) for i in range(K)]
    for _ in range(ITERS):
        sums = [[0.0] * ds for _ in range(K)]
        counts = [0] * K
        for s in subs:
            best, bd = 0, None
            for ci, c in enumerate(cents):
                d = 0.0
                for x, y in zip(s, c):
                    d += (x - y) * (x - y)
                if bd is None or d < bd:
                    best, bd = ci, d
            counts[best] += 1
            for j, x in enumerate(s):
                sums[best][j] += x
        for ci in range(K):
            if counts[ci] > 0:
                cents[ci] = [v / counts[ci] for v in sums[ci]]
    books.append(cents)

print('"""Baked PQ codebooks (M=%d subspaces x K=%d codes x %d dims) for' % (M, K, ds))
print("the product-quantization contract queries. Output of")
print("scripts/train_pq_codebooks.py over the sf0.01 embeddings sample —")
print("regenerate with that script. Sample-trained by design (FAISS")
print('practice); the codebook is a frozen input artifact like the IVF')
print('centroids."""')
print()
print("PQ_CODEBOOKS_SF001: list[list[list[float]]] = [")
for m, cents in enumerate(books):
    print(f"    [  # subspace {m}")
    for c in cents:
        print("        [" + ", ".join(repr(v) for v in c) + "],")
    print("    ],")
print("]")
