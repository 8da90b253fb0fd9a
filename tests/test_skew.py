"""Salted two-phase aggregation: result-identical to a plain groupBy,
physically split across salt sub-groups."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ocr_spark.functions.skew import salted_agg, salted_avg


@pytest.fixture()
def skewed(spark):
    # one hot key holding 90% of rows — the shape salting exists for
    n = 2000
    keys = ["hot"] * (n - 200) + [f"k{i % 20}" for i in range(200)]
    return spark.createDataFrame(
        pd.DataFrame({"k": keys, "v": [float(i % 97) for i in range(n)]})
    )


def test_salted_agg_matches_plain_groupby(skewed):
    plain = {
        r.k: (r.s, r.n, r.lo, r.hi)
        for r in skewed.groupBy("k")
        .agg(
            F.sum("v").alias("s"),
            F.count("v").alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }
    salted = {
        r.k: (r.s, r.n, r.lo, r.hi)
        for r in salted_agg(
            skewed,
            ["k"],
            {"s": ("sum", "v"), "n": ("count", "v"), "lo": ("min", "v"), "hi": ("max", "v")},
        ).collect()
    }
    assert set(salted) == set(plain)
    for k in plain:
        assert salted[k][1:] == plain[k][1:]
        assert salted[k][0] == pytest.approx(plain[k][0], rel=1e-12)


def test_salted_avg(skewed):
    plain = {r.k: r.a for r in skewed.groupBy("k").agg(F.avg("v").alias("a")).collect()}
    salted = {r.k: r.avg_v for r in salted_avg(skewed, ["k"], "v").collect()}
    for k in plain:
        assert salted[k] == pytest.approx(plain[k], rel=1e-12)


def test_salted_agg_plan_shape(skewed):
    df = salted_agg(skewed, ["k"], {"n": ("count", "v")}, n_salts=8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # two exchanges: phase 1 keyed on (k, _salt), phase 2 on k alone —
    # plus map-side partial aggregation in both phases
    assert plan.count("Exchange") == 2, plan
    assert "_salt" in plan, plan
    assert "partial_count" in plan, plan


def test_rejects_non_mergeable(skewed):
    with pytest.raises(ValueError, match="non-mergeable"):
        salted_agg(skewed, ["k"], {"a": ("avg", "v")})


def test_key_skew_stats_semantics(skewed):
    from ocr_spark.functions.skew import key_skew_stats

    out = key_skew_stats(skewed, "k", top_k=5).collect()
    assert [r.rank for r in out] == [1, 2, 3, 4, 5]
    top = out[0]
    assert top.key == "hot" and top.n_rows == 1800
    # 1800/2000 of all rows = 900_000 ppm
    assert top.share_ppm == 900000
    # 21 distinct keys, floored uniform mean 2000//21 = 95 rows ->
    # hot multiple 1800*1000//95 (the overflow-safe ordering: never
    # n_rows * n_keys * 1000, which wraps past 2^63 at trillion-row
    # corpus scale)
    assert top.hot_x1000 == 1800 * 1000 // (2000 // 21)
    # tail keys are the 20 k%20 keys with 10 rows each; ties broken
    # by key ascending so the cut is deterministic
    assert [r.key for r in out[1:]] == ["k0", "k1", "k10", "k11"]
    with pytest.raises(ValueError, match="top_k"):
        key_skew_stats(skewed, "k", top_k=0)


def test_key_skew_stats_null_keys_and_oracle(spark):
    import duckdb

    from ocr_spark.functions.skew import key_skew_stats, key_skew_stats_sql

    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'"
    )
    # the contract key shape: one synthetic hot key + uniform tail
    key = ("CASE WHEN user_id % 10 < 5 THEN 'hot' "
           "ELSE CAST(user_id % 1000 AS STRING) END")
    sdf = key_skew_stats(events, key, top_k=12)
    g = sorted(map(tuple, sdf.collect()))
    odf = con.execute(key_skew_stats_sql("events", key, top_k=12)).df()
    o = sorted(
        tuple(v.item() if hasattr(v, "item") else v for v in r)
        for r in odf[sdf.columns].itertuples(index=False, name=None)
    )
    assert g == o
    # NULL keys group and order last among ties (engine-agreed):
    nulls = spark.createDataFrame(
        [(None,), ("a",), ("a",), (None,)], "key_src string"
    )
    out = key_skew_stats(nulls, "key_src", top_k=5).collect()
    assert [(r.key, r.n_rows) for r in out] == [("a", 2), (None, 2)]


def test_key_skew_stats_plan(spark):
    """Top-k must be a distributed TakeOrdered, never a global sort
    materializing the key census on one partition."""
    from ocr_spark.functions.skew import key_skew_stats

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = key_skew_stats(events, "event_type", 5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:2000]
