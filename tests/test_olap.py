"""OLAP breadth operators: semantics + the physical plans we designed
for (rollup = ONE Expand+aggregate pass, top-k = WindowGroupLimit
map-side truncation)."""

from __future__ import annotations

import pytest

from ocr_spark.functions.olap import (
    percentile_chars,
    rollup_doc_stats,
    topk_per_group,
)

SF_DIR = "/root/testdata/sf0.001"


from ocr_spark.plans import plan_str as _plan


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_rollup_levels_are_consistent(docs):
    rows = rollup_doc_stats(docs).collect()
    by_gid = {}
    for r in rows:
        by_gid.setdefault(r.gid, []).append(r)
    # grand total (gid=3) == sum of per-source subtotals (gid=1)
    # == sum of leaf rows (gid=0)
    [total] = by_gid[3]
    assert total.n_docs == sum(r.n_docs for r in by_gid[1])
    assert total.n_docs == sum(r.n_docs for r in by_gid[0])
    assert total.total_chars == sum(r.total_chars for r in by_gid[0])
    # subtotal rows carry NULL lang, leaf rows don't
    assert all(r.lang is None for r in by_gid[1])
    assert all(r.lang is not None for r in by_gid[0])


def test_rollup_is_one_aggregation_pass(docs):
    # "simple" mode lists each operator once (formatted repeats them
    # in the detail section), so occurrence counts are meaningful
    plan = _plan(rollup_doc_stats(docs), "simple")
    # one Expand feeding a partial+final hash aggregate — not a job
    # per grouping level
    assert plan.count("Expand") == 1, plan
    assert "partial_count" in plan, plan
    assert plan.count("Exchange") == 1, plan


def test_percentiles_bracket_the_distribution(docs):
    rows = percentile_chars(docs).collect()
    assert rows, "no groups"
    for r in rows:
        assert r.p50_chars <= r.p90_chars <= r.p99_chars
        assert r.n_docs > 0


def test_percentile_is_single_shuffle(docs):
    plan = _plan(percentile_chars(docs), "simple")
    assert plan.count("Exchange") == 1, plan
    assert "partial_percentile_approx" in plan, plan


def test_percentile_nearest_rank_fuzz_across_engines(spark):
    """The exactness claim behind percentile_chars: exact-mode
    percentile_approx picks the SAME nearest-rank element as DuckDB's
    quantile_disc for arbitrary group sizes (1..~60), duplicates
    included. Fuzzed across 40 random groups x 3 percentiles."""
    import random

    import duckdb
    import pandas as pd

    from ocr_spark.functions.olap import percentile_chars, percentile_chars_sql

    rng = random.Random(8675309)
    rows = []
    for g in range(40):
        size = rng.choice([1, 2, 3, rng.randint(4, 60)])
        for i in range(size):
            # narrow value range forces duplicate values inside groups
            rows.append((g * 1000 + i, f"g{g}", rng.randint(0, 20)))
    pdf = pd.DataFrame(rows, columns=["doc_id", "lang", "n_chars"])
    df = spark.createDataFrame(pdf)
    con = duckdb.connect()
    con.register("pct_fuzz_df", pdf)
    con.execute("CREATE OR REPLACE VIEW pct_fuzz AS SELECT * FROM pct_fuzz_df")
    got = sorted(map(tuple, percentile_chars(df).collect()))
    want = sorted(
        map(tuple, con.execute(percentile_chars_sql("pct_fuzz")).fetchall())
    )
    assert got == want


def test_topk_per_group_semantics(docs):
    k = 3
    out = topk_per_group(docs, k=k).collect()
    per_src = {}
    for r in out:
        per_src.setdefault(r.source, []).append(r)
    full = {
        (r.source, r.doc_id): r.n_chars
        for r in docs.select("source", "doc_id", "n_chars").collect()
    }
    for src, rows in per_src.items():
        assert len(rows) <= k
        assert sorted(r.rnk for r in rows) == list(range(1, len(rows) + 1))
        # every returned doc is >= every non-returned doc of that source
        returned = {r.doc_id for r in rows}
        floor = min(r.n_chars for r in rows)
        others = [
            v for (s, d), v in full.items() if s == src and d not in returned
        ]
        assert all(v <= floor for v in others)


def test_topk_plan_truncates_before_shuffle(docs):
    plan = _plan(topk_per_group(docs))
    # Spark 3.5+ pushes the rank filter below the exchange as
    # WindowGroupLimit: each map task ships only its local top-k
    assert "WindowGroupLimit" in plan, plan


def test_cube_levels_are_consistent(docs):
    from ocr_spark.functions.olap import cube_doc_stats

    rows = cube_doc_stats(docs).collect()
    by_gid = {}
    for r in rows:
        by_gid.setdefault(r.gid, []).append(r)
    assert set(by_gid) == {0, 1, 2, 3}
    total = sum(r.n_docs for r in by_gid[0])
    # every marginal reproduces the same grand total
    assert sum(r.n_docs for r in by_gid[1]) == total  # per-source
    assert sum(r.n_docs for r in by_gid[2]) == total  # per-lang
    assert by_gid[3][0].n_docs == total               # grand
    # per-lang marginals agree with the base cells
    base_by_lang = {}
    for r in by_gid[0]:
        base_by_lang[r.lang] = base_by_lang.get(r.lang, 0) + r.n_docs
    assert {r.lang: r.n_docs for r in by_gid[2]} == base_by_lang


def test_cube_is_one_aggregation_pass(docs):
    from ocr_spark.functions.olap import cube_doc_stats

    plan = _plan(cube_doc_stats(docs), "simple")
    assert plan.count("Expand") == 1
    assert plan.count("Exchange") == 1


def test_pivot_cells_and_density(docs):
    from ocr_spark.functions.olap import pivot_lang_by_source

    out = pivot_lang_by_source(docs).collect()
    flat = {
        (r["source"], r["lang"]): r["n"]
        for r in docs.groupBy("source", "lang")
        .agg(__import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n"))
        .collect()
    }
    for r in out:
        for lang in ("de", "en", "es", "fr", "zh"):
            assert r[f"n_{lang}"] == flat.get((r["source"], lang), 0)
    # dense: no NULL cells
    assert all(v is not None for r in out for v in r)


def test_pivot_plan_shape(docs):
    """Pinned pivot values are baked into the pivotfirst aggregate (no
    eager distinct-collect discovery job), the standard two-stage
    pivot plan (cell counts on (source,lang), then pivotfirst on
    source — both with map-side partials), and the scan reads only
    the two grouping columns."""
    from ocr_spark.functions.olap import pivot_lang_by_source

    plan = _plan(pivot_lang_by_source(docs), "simple")
    assert "pivotfirst(lang" in plan and "de, en, es, fr, zh" in plan
    assert plan.count("Exchange") == 2
    assert "partial_pivotfirst" in plan and "partial_count" in plan
    assert "ReadSchema: struct<lang:string,source:string>" in plan


def test_unpivot_roundtrip_and_density(docs):
    from pyspark.sql import functions as F

    from ocr_spark.functions.olap import unpivot_lang_counts

    out = unpivot_lang_counts(docs)
    rows = out.collect()
    # dense long form: every (source, pinned-lang) cell present
    n_sources = docs.select("source").distinct().count()
    assert len(rows) == n_sources * 5
    assert all(r["n_docs"] >= 0 for r in rows)
    # melt inverts the pivot: totals reconcile with the base table
    assert (
        out.agg(F.sum("n_docs")).collect()[0][0]
        == docs.where(F.col("lang").isin("de", "en", "es", "fr", "zh")).count()
    )
    # lang names un-prefixed
    assert {r["lang"] for r in rows} == {"de", "en", "es", "fr", "zh"}


def test_chars_histogram_bins(docs):
    from pyspark.sql import functions as F

    from ocr_spark.functions.olap import chars_histogram

    out = {r["bin"]: r for r in chars_histogram(docs, 0, 600, 12).collect()}
    n = docs.count()
    assert sum(r["n_docs"] for r in out.values()) == n
    width = 600 // 12
    for b, r in out.items():
        if 1 <= b <= 12:  # interior bins respect their edges
            assert r["min_chars"] >= (b - 1) * width
            assert r["max_chars"] < b * width
    # overflow bins carry anything outside [lo, hi)
    lo_cnt = docs.where(F.col("n_chars") < 0).count()
    hi_cnt = docs.where(F.col("n_chars") >= 600).count()
    assert out.get(0, None) is None if lo_cnt == 0 else out[0]["n_docs"] == lo_cnt
    assert (13 not in out) if hi_cnt == 0 else out[13]["n_docs"] == hi_cnt
    with pytest.raises(ValueError):
        chars_histogram(docs, 10, 10, 5)


def test_chars_histogram_matches_duckdb_twin(docs):
    import duckdb

    from ocr_spark.functions.olap import chars_histogram, chars_histogram_sql

    got = sorted(map(tuple, chars_histogram(docs, 0, 600, 12).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = sorted(
        map(tuple, con.execute(chars_histogram_sql("documents", 0, 600, 12)).fetchall())
    )
    assert got == want and len(got) >= 5
