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
