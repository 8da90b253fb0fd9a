"""URL canonicalization: hand-case semantics, cross-engine parity on
hostile URLs, NULL/non-URL handling, and the zero-shuffle plan."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from ocr_spark.functions.urls import canonicalize_urls, canonicalize_urls_sql
from ocr_spark.plans import plan_str

CASES = [
    "HTTP://Example.COM:80/A/B/?utm_source=x&id=3#frag",
    "https://Sub.Dom.Example.org:443//x//",
    "https://example.com",
    "https://a.b/?utm_source=1&utm_campaign=2",
    "http://Host/path?gclid=9&q=Keep&fbclid=2",
    "ftp://Host:21/file",
    "http://localhost:8080/x/",
    "not a url",
    "",
    None,
    "https://t.co/abc?id=1&utm_x=2&id2=3#z",
]
EXPECT = {
    CASES[0]: ("http://example.com/A/B?id=3", "example.com"),
    CASES[1]: ("https://sub.dom.example.org//x", "example.org"),
    CASES[2]: ("https://example.com/", "example.com"),
    CASES[3]: ("https://a.b/", "a.b"),
    CASES[4]: ("http://host/path?q=Keep", "host"),
    CASES[5]: ("ftp://host:21/file", "host"),
    CASES[6]: ("http://localhost:8080/x", "localhost"),
    CASES[7]: (None, None),
    CASES[8]: (None, None),
    None: (None, None),
    CASES[10]: ("https://t.co/abc?id=1&id2=3", "t.co"),
}


def _df(spark):
    return spark.createDataFrame(
        [(i, u) for i, u in enumerate(CASES)], "row_id long, url string"
    )


def test_hand_cases(spark):
    got = {r.url: (r.canon_url, r.host) for r in canonicalize_urls(_df(spark)).collect()}
    for url, want in EXPECT.items():
        assert got[url] == want, (url, got[url], want)


def test_cross_engine_parity(spark):
    got = sorted(
        (r.row_id, r.canon_url, r.host)
        for r in canonicalize_urls(_df(spark)).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (row_id BIGINT, url VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", [(i, u) for i, u in enumerate(CASES)]
    )
    want = sorted(
        map(
            tuple,
            con.execute(
                "SELECT row_id, canon_url, host FROM ("
                + canonicalize_urls_sql("SELECT * FROM t")
                + ")"
            ).fetchall(),
        )
    )
    assert got == want


def test_column_guard_and_plan(spark):
    df = _df(spark)
    with pytest.raises(ValueError):
        canonicalize_urls(df.withColumn("host", F.lit("x")))
    plan = plan_str(canonicalize_urls(df), "simple")
    assert "Exchange" not in plan and "Join" not in plan, plan


def test_canonical_collapses_dup_variants(spark):
    """The dedup motivation: surface variants of one page collapse to
    one canonical key."""
    variants = [
        "http://EXAMPLE.com:80/page/?utm_source=a",
        "http://example.com/page?utm_campaign=b",
        "http://example.com/page/#section",
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(variants)], "row_id long, url string"
    )
    keys = {r.canon_url for r in canonicalize_urls(df).collect()}
    assert keys == {"http://example.com/page"}
