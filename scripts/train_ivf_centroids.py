#!/usr/bin/env python3
"""Regenerate ocr_spark/functions/ivf_centroids.py — the baked IVF
codebook used by the ivf_topk_trained contract query.

Usage: python scripts/train_ivf_centroids.py [sf_dir]
(default /root/testdata/sf0.01; training is deterministic and
partition-invariant, so reruns are byte-identical for the same input)
"""
import sys

sys.path.insert(0, "/root/repo")

from ocr_spark.functions.similarity import kmeans_centroids  # noqa: E402
from ocr_spark.pipeline.session import get_spark  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = "/root/repo/ocr_spark/functions/ivf_centroids.py"

spark = get_spark("local[16]")
cents = kmeans_centroids(spark.read.parquet(f"{SF}/embeddings.parquet"))
spark.stop()

lines = [
    '"""Baked IVF cell centers for the trained-path contract query.',
    "",
    "Output of ``kmeans_centroids`` (distributed spherical Lloyd's,",
    "ocr_spark/functions/similarity.py) over the sf0.01 embeddings table",
    "— regenerate with scripts/train_ivf_centroids.py. Baked as literals",
    "so the Spark query and its DuckDB twin share bit-identical centers:",
    "training is an OFFLINE step whose result is an input parameter, the",
    "same way a production IVF index ships its codebook. Verified",
    'partition-invariant (exact-integer recenter sums) before baking."""',
    "",
    "TRAINED_CENTROIDS_SF001: list[list[float]] = [",
]
for c in cents:
    lines.append("    [")
    for i in range(0, len(c), 4):
        lines.append("        " + ", ".join(repr(v) for v in c[i : i + 4]) + ",")
    lines.append("    ],")
lines.append("]")
with open(OUT, "w") as f:
    f.write("\n".join(lines) + "\n")
print(f"wrote {OUT}: {len(cents)} x {len(cents[0])}")
