"""int8 embedding quantization: DuckDB-twin parity, the scale/2
round-trip error bound, top-k recall of the dequantized index vs
exact cosine, degenerate vectors, and the zero-shuffle plan."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from ocr_spark.functions.quantize import (
    ann_quantized_topk,
    ann_quantized_topk_sql,
    dequantize,
    quantize_embeddings,
    quantize_flat,
    quantize_flat_sql,
)
from ocr_spark.functions.similarity import cosine_topk
from ocr_spark.plans import plan_str

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_matches_oracle(spark):
    got = sorted(map(tuple, quantize_flat(_emb(spark)).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    want = sorted(map(tuple, con.execute(quantize_flat_sql()).fetchall()))
    assert got == want and len(got) > 0


def test_roundtrip_error_bound(spark):
    """|dequant - original| <= scale/2 per component, everywhere."""
    emb = _emb(spark)
    q = quantize_embeddings(emb)
    joined = dequantize(q).withColumnRenamed("embedding", "approx").join(
        emb.select("vec_id", "embedding"), "vec_id"
    ).join(q.select("vec_id", "scale"), "vec_id")
    worst = joined.select(
        F.expr(
            "array_max(zip_with(embedding, approx, "
            "(a, b) -> abs(CAST(a AS DOUBLE) - b))) - scale / 2 AS excess"
        )
    ).agg(F.max("excess").alias("m")).collect()[0]["m"]
    assert worst <= 1e-9, worst


def test_topk_recall_vs_exact(spark):
    """The quantized index must recover >= 90% of the exact cosine
    top-10 neighbours for the standard query set."""
    emb = _emb(spark).select("vec_id", "embedding")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, n_queries=5, k=10).collect()
    }
    approx_emb = dequantize(quantize_embeddings(emb))
    approx = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(approx_emb, n_queries=5, k=10).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, recall


def test_degenerate_vectors(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, []), (3, [0.5, -1.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: r for r in quantize_embeddings(df).collect()}
    assert rows[1].scale == 0.0 and rows[1].qvec == [0, 0]
    assert rows[2].scale == 0.0 and rows[2].qvec == []
    assert rows[3].qvec == [64, -127]  # 0.5/ (1/127) = 63.5 -> floor(64.0)
    back = {r.vec_id: r.embedding for r in dequantize(quantize_embeddings(df)).collect()}
    assert back[3][1] == -1.0


def test_ann_quantized_matches_oracle_and_dequantized_ranking(spark):
    """The int8 search path: (a) engine parity with the DuckDB twin,
    (b) identical ranking to exact cosine over the DEQUANTIZED vectors
    (scales cancel, so integer scoring is not an extra approximation)."""
    emb = _emb(spark).select("vec_id", "embedding")
    got = sorted(map(tuple, ann_quantized_topk(emb).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    want = sorted(map(tuple, con.execute(ann_quantized_topk_sql()).fetchall()))
    assert got == want and len(got) == 50
    deq = cosine_topk(dequantize(quantize_embeddings(emb)), n_queries=5, k=10)
    pairs_int = {(r[0], r[1], r[2]) for r in got}
    pairs_deq = {
        (r.query_id, r.neighbor_id, r.rank) for r in deq.collect()
    }
    assert pairs_int == pairs_deq


def test_ann_quantized_plan_broadcasts_query_side(spark):
    plan = plan_str(ann_quantized_topk(_emb(spark)), "simple")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan, plan


def test_plan_zero_shuffle(spark):
    plan = plan_str(quantize_embeddings(_emb(spark)), "simple")
    assert "Exchange" not in plan and "Join" not in plan, plan
