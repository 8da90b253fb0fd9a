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


# ---------------------------------------------------------------------------
# domain_stats / blocklist_filter
# ---------------------------------------------------------------------------


def _crawl(spark):
    import pandas as pd

    rows = [
        (1, "https://A.com/page1"),
        (2, "https://a.com/page1?utm_source=x"),  # same canonical page
        (3, "https://a.com/page2"),
        (4, "https://b.org/only"),
        (5, "not a url"),
        (6, None),
        (7, "https://Sub.a.com/page1"),  # same registrable domain a.com
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "url"])
    return pdf, spark.createDataFrame(pdf, schema="doc_id long, url string")


def test_domain_stats_semantics(spark):
    from ocr_spark.functions.urls import domain_stats

    _, df = _crawl(spark)
    got = {r.host: (r.n_docs, r.n_pages) for r in domain_stats(df).collect()}
    # a.com: docs 1,2,3,7 — doc 2 collapses onto doc 1's canonical
    # page, doc 7's subdomain keeps its own canonical URL
    assert got == {"a.com": (4, 3), "b.org": (1, 1)}


def test_domain_stats_cross_engine(spark):
    import duckdb as dd

    from ocr_spark.functions.urls import domain_stats, domain_stats_sql

    pdf, df = _crawl(spark)
    con = dd.connect()
    con.register("crawl_pdf", pdf)
    got = sorted(map(tuple, domain_stats(df).collect()))
    want = sorted(
        map(
            tuple,
            con.execute(
                domain_stats_sql("SELECT * FROM crawl_pdf")
            ).fetchall(),
        )
    )
    assert got == want


def test_blocklist_filter_semantics_and_parity(spark):
    import duckdb as dd

    from ocr_spark.functions.urls import blocklist_filter, blocklist_filter_sql

    pdf, df = _crawl(spark)
    bl = spark.createDataFrame([("a.com",), (None,)], "host string")
    out = blocklist_filter(df, bl)
    kept = sorted(r.doc_id for r in out.collect())
    # a.com docs (1,2,3,7) blocked; b.org kept; non-URL rows pass
    assert kept == [4, 5, 6]
    con = dd.connect()
    con.register("crawl_pdf", pdf)
    cols = sorted(out.columns)
    key = lambda t: [(v is None, str(v)) for v in t]  # noqa: E731
    got = sorted(
        (tuple(r[c] for c in cols) for r in out.collect()), key=key
    )
    want_rows = con.execute(
        blocklist_filter_sql(
            "SELECT * FROM crawl_pdf",
            "SELECT * FROM (VALUES ('a.com'), (NULL)) AS t(host)",
        )
    ).df()
    want = sorted(
        (
            tuple(None if v != v else v for v in r) if any(
                isinstance(v, float) for v in r
            ) else tuple(r)
            for r in want_rows[cols].itertuples(index=False, name=None)
        ),
        key=key,
    )
    assert got == want


def test_blocklist_filter_requires_host_column(spark):
    from ocr_spark.functions.urls import blocklist_filter

    _, df = _crawl(spark)
    bad = spark.createDataFrame([("a.com",)], "domain string")
    with pytest.raises(ValueError):
        blocklist_filter(df, bad)


# ---------------------------------------------------------------------------
# url_dedup
# ---------------------------------------------------------------------------


def test_url_dedup_collapses_aliases_keep_best(spark):
    from ocr_spark.functions.urls import url_dedup

    good = "the a of and to in is was for on " * 8
    noisy = good + "!?!;" * 200
    rows = [
        (1, noisy, "https://example.com/page?utm_source=x"),
        (2, good, "https://EXAMPLE.com/page/"),   # same canonical page
        (3, good, "https://other.org/a"),
        (4, good, "not a url"),                   # NULL canon -> not emitted
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, url string")
    got = {r.canon_url: r for r in url_dedup(df).collect()}
    assert len(got) == 2  # NULL-url doc not emitted
    page = [r for r in got.values() if r.n_members == 2][0]
    assert page.best_doc_id == 2  # cleaner copy wins over lower id


def test_url_dedup_matches_oracle(spark):
    import duckdb

    from ocr_spark.functions.urls import url_dedup, url_dedup_sql

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from pyspark.sql import functions as F

    with_url = docs.select(
        "doc_id",
        "text",
        F.expr(
            "concat('https://www.example.com/page/',"
            " CAST(doc_id % 50 AS STRING), '?utm_campaign=x')"
        ).alias("url"),
    )
    got = sorted(map(tuple, url_dedup(with_url).collect()))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    want = sorted(
        map(
            tuple,
            con.execute(
                url_dedup_sql(
                    "SELECT doc_id, text, 'https://www.example.com/page/' ||"
                    " CAST(doc_id % 50 AS VARCHAR) ||"
                    " '?utm_campaign=x' AS url FROM documents"
                )
            ).fetchall(),
        )
    )
    assert got == want
    assert len(got) == 50 and all(r[2] == 10 for r in got)  # 10 aliases/page


def test_url_dedup_plan_has_no_corpus_self_join(spark):
    from ocr_spark.functions import urls as curl
    from ocr_spark.plans import plan_str as _plan
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    with_url = docs.select(
        "doc_id", "text",
        F.concat(F.lit("https://e.com/p/"), F.col("doc_id") % 50).alias("url"),
    )
    p = _plan(curl.url_dedup(with_url), "simple")
    assert "Join" not in p  # quality computed in the SAME scan


def test_url_dedup_string_ids_cross_engine(spark):
    import duckdb
    import pandas as pd

    from ocr_spark.functions.urls import url_dedup, url_dedup_sql

    body = "the a of and to in is was for on " * 6
    pdf = pd.DataFrame(
        {
            "doc_id": ["sha1:b", "sha1:a", "sha1:c"],
            "text": [body, body, body + " more"],
            "url": [
                "https://e.com/p1?utm_source=x",
                "https://E.com/p1",
                "https://e.com/p2",
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    con = duckdb.connect()
    con.register("t_ud_sid", pdf)
    got = sorted(map(tuple, url_dedup(df).collect()))
    want = sorted(
        map(
            tuple,
            con.execute(
                url_dedup_sql("SELECT * FROM t_ud_sid", id_sql="doc_id")
            ).fetchall(),
        )
    )
    assert got == want
    reps = {r[0]: r[1] for r in got}
    assert any(v == "sha1:a" for v in reps.values())  # tie -> min string id
