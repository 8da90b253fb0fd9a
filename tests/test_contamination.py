"""Benchmark decontamination: per-item leak report (the inverse of
the per-doc contamination gate)."""

from __future__ import annotations



# ---------------------------------------------------------------------------
# benchmark_leak_report
# ---------------------------------------------------------------------------


def test_leak_report_per_item(spark):
    from ocr_spark.functions.contamination import benchmark_leak_report

    leaked_item = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    clean_item = "one two three four five six seven eight nine ten"
    short_item = "exact answer"
    bench = spark.createDataFrame(
        [(100, leaked_item), (101, clean_item), (102, short_item),
         (103, None), (104, "")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "prefix " + leaked_item + " suffix words here"),
            (2, leaked_item),
            (3, "contains the exact answer verbatim"),
            (4, "unrelated corpus text entirely different tokens"),
        ],
        "doc_id long, text string",
    )
    rows = {r.item_id: r for r in benchmark_leak_report(docs, bench, w=5, min_overlap=2).collect()}
    # NULL/empty items carry no signal -> not emitted
    assert set(rows) == {100, 101, 102}
    assert rows[100].kind == "wgram" and rows[100].n_docs_hit == 2
    assert rows[100].max_overlap >= 2 and rows[100].leaked
    assert rows[101].kind == "wgram" and rows[101].n_docs_hit == 0
    assert rows[101].max_overlap == 0 and not rows[101].leaked
    assert rows[102].kind == "short" and rows[102].n_docs_hit == 1
    assert rows[102].max_overlap == -1 and rows[102].leaked


def test_leak_report_matches_oracle(spark):
    import duckdb

    from ocr_spark.functions.contamination import (
        benchmark_leak_report,
        benchmark_leak_report_sql,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.where("doc_id % 29 = 0")
    got = sorted(
        map(tuple, benchmark_leak_report(docs, bench, w=8, min_overlap=2).collect())
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    want = sorted(
        map(
            tuple,
            con.execute(
                benchmark_leak_report_sql(
                    "documents",
                    "(SELECT * FROM documents WHERE doc_id % 29 = 0)",
                    w=8,
                    min_overlap=2,
                )
            ).fetchall(),
        )
    )
    assert got == want
    # every benchmark item is accounted for (self-inclusion: each item
    # is its own corpus doc here, so every wgram item leaks)
    assert len(got) == bench.count()


def test_leak_report_is_not_a_row_inverse_of_the_gate(spark):
    """Documented semantics: a doc whose overlap is SPREAD across
    items (1 gram with each of two items, min_overlap=2) is dropped
    by the pooled gate yet charges NO single item in the report —
    neither item individually leaked."""
    from ocr_spark.functions.contamination import (
        benchmark_leak_report,
        contamination,
    )

    g = lambda i: f"s{i}a s{i}b s{i}c s{i}d s{i}e"  # one 5-gram each
    bench = spark.createDataFrame(
        [(100, g(1) + " tailone extra words here"),
         (101, g(2) + " tailtwo extra words here")],
        "doc_id long, text string",
    )
    doc = spark.createDataFrame(
        [(1, g(1) + " BRIDGE " + g(2))], "doc_id long, text string"
    )
    gate = contamination(doc, bench, w=5, min_overlap=2).collect()[0]
    assert gate.contaminated and gate.n_overlap == 2  # pooled across items
    rows = {
        r.item_id: r
        for r in benchmark_leak_report(doc, bench, w=5, min_overlap=2).collect()
    }
    assert not rows[100].leaked and not rows[101].leaked  # per-item view
