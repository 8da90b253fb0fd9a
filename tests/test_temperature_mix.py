"""Temperature-based source mixing: per-source expected rates,
small-source up-weighting, rerun determinism, NULL-source handling,
knob validation, and DuckDB-twin parity on the real corpus."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from ocr_spark.functions.sampling import temperature_mix, temperature_mix_sql

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_matches_oracle(spark):
    got = sorted(
        map(tuple, temperature_mix(_docs(spark), budget_frac=0.5).collect())
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = sorted(
        map(tuple, con.execute(temperature_mix_sql(budget_frac=0.5)).fetchall())
    )
    assert got == want
    n = _docs(spark).count()
    # realized total near budget (hash buckets are near-uniform)
    assert 0.35 * n <= len(got) <= 0.65 * n


def test_small_sources_upweighted(spark):
    """alpha=0.5 keeps a HIGHER fraction of a small source than of a
    big one (rate ratio = sqrt(n_big/n_small))."""
    rows = [(i, "big") for i in range(4000)] + [
        (i + 10_000, "small") for i in range(250)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mix(df, budget_frac=0.5).groupBy("source").count()
    kept = {r["source"]: r["count"] for r in out.collect()}
    frac_big = kept.get("big", 0) / 4000
    frac_small = kept.get("small", 0) / 250
    # theoretical rates ~0.42 and ~1.0 (sqrt(16) = 4x ratio, the small
    # source saturates at p = 1); allow hash noise
    assert frac_small > 1.9 * frac_big
    assert frac_small == 1.0  # p clamps at 1 -> every small doc kept


def test_rerun_and_partitioning_invariance(spark):
    df = _docs(spark)
    a = sorted(r.doc_id for r in temperature_mix(df, 0.4).select("doc_id").collect())
    b = sorted(
        r.doc_id
        for r in temperature_mix(df.repartition(13), 0.4).select("doc_id").collect()
    )
    assert a == b and len(a) > 0


def test_null_sources_group_together(spark):
    rows = [(i, None) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mix(df, budget_frac=0.5)
    # single source -> p = min(1, 0.5 * N * w / (w * N)) = 0.5
    assert 100 <= out.count() <= 200
    assert out.columns == ["doc_id", "source"]


def test_validation(spark):
    df = spark.createDataFrame([(1, "s")], "doc_id long, source string")
    for kw in ({"budget_frac": 0.0}, {"budget_frac": 1.5},
               {"budget_frac": 0.5, "alpha": -0.1}):
        with pytest.raises(ValueError):
            temperature_mix(df, **kw)
        with pytest.raises(ValueError):
            temperature_mix_sql(**kw)
    with pytest.raises(ValueError):
        temperature_mix(df.withColumn("_src_key", F.lit("x")), 0.5)
