"""URL canonicalization — the dedup-key normalizer for crawled
corpora: the same page arrives as ``HTTP://Example.com:80/a/?utm_
source=feed#top`` and ``http://example.com/a`` and must collapse to
one key before any URL-level dedup or per-host balancing.

Canonical form (applied in this order):
  1. scheme and host lowercased (ONLY those — path/query are
     case-significant per RFC 3986);
  2. fragment stripped;
  3. tracking query params removed (utm_*, fbclid, gclid); an emptied
     query drops its '?';
  4. default port stripped (:80 for http, :443 for https);
  5. trailing slashes collapsed off the path ('' and '/' both render
     as '/').
Rows without a '://' scheme separator are not URLs: canon_url and
host come back NULL (never a half-normalized guess).

``host`` additionally exposes the approximate registrable domain
(last two dot-labels — a deliberate public-suffix-list-free
heuristic, documented divergence for multi-label suffixes like
.co.uk).

Engine portability: every step is regexp_extract / regexp_replace /
split + higher-order filter with patterns that stay inside the
Java-and-RE2 shared dialect — NO lookarounds (RE2 has none), no \\s
(the schema.WS trap), no backreferences. Zero shuffle: all scan-stage
string expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRACKING = "^(utm_[A-Za-z0-9_]*|fbclid|gclid)="
_SCHEME = "^([A-Za-z][A-Za-z0-9+.-]*)://"


def _canon_exprs_spark(col: str) -> dict[str, str]:
    scheme = f"lower(regexp_extract({col}, '{_SCHEME}', 1))"
    rest = f"regexp_replace({col}, '{_SCHEME}', '')"
    hostport = f"lower(regexp_extract({rest}, '^([^/?#]*)', 1))"
    pqf = f"regexp_replace({rest}, '^[^/?#]*', '')"
    pq = f"regexp_replace({pqf}, '#.*$', '')"
    rawpath = f"regexp_extract({pq}, '^([^?]*)', 1)"
    rawq = f"regexp_extract({pq}, '[?](.*)$', 1)"
    query = (
        f"array_join(filter(split({rawq}, '&'), "
        f"p -> p NOT RLIKE '{TRACKING}'), '&')"
    )
    host = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({hostport}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({hostport}, ':443$', '') "
        f"ELSE {hostport} END"
    )
    path = (
        f"CASE WHEN regexp_replace({rawpath}, '/+$', '') = '' THEN '/' "
        f"ELSE regexp_replace({rawpath}, '/+$', '') END"
    )
    canon = (
        f"CASE WHEN {scheme} = '' THEN NULL ELSE "
        f"concat({scheme}, '://', {host}, {path}, "
        f"CASE WHEN {query} = '' THEN '' ELSE concat('?', {query}) END) END"
    )
    bare_host = f"regexp_replace({host}, ':[0-9]+$', '')"
    reg_dom = (
        f"CASE WHEN {scheme} = '' THEN NULL "
        f"WHEN {bare_host} RLIKE '[^.]+[.][^.]+$' "
        f"THEN regexp_extract({bare_host}, '([^.]+[.][^.]+)$', 1) "
        f"ELSE {bare_host} END"
    )
    return {"canon_url": canon, "host": reg_dom}


def _canon_exprs_duckdb(col: str) -> dict[str, str]:
    scheme = f"lower(regexp_extract({col}, '{_SCHEME}', 1))"
    rest = f"regexp_replace({col}, '{_SCHEME}', '')"
    hostport = f"lower(regexp_extract({rest}, '^([^/?#]*)', 1))"
    pqf = f"regexp_replace({rest}, '^[^/?#]*', '')"
    pq = f"regexp_replace({pqf}, '#.*$', '')"
    rawpath = f"regexp_extract({pq}, '^([^?]*)', 1)"
    rawq = f"regexp_extract({pq}, '[?](.*)$', 1)"
    # coalesce: DuckDB's array_to_string returns NULL for an EMPTY
    # list (Spark's array_join returns ''), and its concat() skips
    # NULL args instead of propagating — both would leak a lone '?'
    query = (
        f"coalesce(array_to_string(list_filter(string_split({rawq}, '&'), "
        f"p -> NOT regexp_matches(p, '{TRACKING}')), '&'), '')"
    )
    host = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({hostport}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({hostport}, ':443$', '') "
        f"ELSE {hostport} END"
    )
    path = (
        f"CASE WHEN regexp_replace({rawpath}, '/+$', '') = '' THEN '/' "
        f"ELSE regexp_replace({rawpath}, '/+$', '') END"
    )
    canon = (
        f"CASE WHEN coalesce({scheme}, '') = '' THEN NULL ELSE "
        f"concat({scheme}, '://', {host}, {path}, "
        f"CASE WHEN {query} = '' THEN '' ELSE concat('?', {query}) END) END"
    )
    bare_host = f"regexp_replace({host}, ':[0-9]+$', '')"
    reg_dom = (
        f"CASE WHEN coalesce({scheme}, '') = '' THEN NULL "
        f"WHEN regexp_matches({bare_host}, '[^.]+[.][^.]+$') "
        f"THEN regexp_extract({bare_host}, '([^.]+[.][^.]+)$', 1) "
        f"ELSE {bare_host} END"
    )
    return {"canon_url": canon, "host": reg_dom}


def canonicalize_urls(df: DataFrame, col: str = "url") -> DataFrame:
    """Append ``canon_url`` and ``host`` (approximate registrable
    domain) for the URL column; non-URL rows (no ``scheme://``) get
    NULLs. Scan-stage string expressions only — zero shuffle."""
    for helper in ("canon_url", "host"):
        if helper in df.columns:
            raise ValueError(f"input already has a {helper} column")
    ex = _canon_exprs_spark(col)
    return df.withColumn("canon_url", F.expr(ex["canon_url"])).withColumn(
        "host", F.expr(ex["host"])
    )


def canonicalize_urls_sql(source: str, col: str = "url") -> str:
    """DuckDB twin over any SELECT producing the same columns."""
    ex = _canon_exprs_duckdb(col)
    return (
        f"SELECT *, {ex['canon_url']} AS canon_url, {ex['host']} AS host "
        f"FROM ({source}) src"
    )


# ---------------------------------------------------------------------------
# domain-level aggregation + blocklist filtering
# ---------------------------------------------------------------------------


def domain_stats(df: DataFrame, col: str = "url") -> DataFrame:
    """(host, n_docs, n_pages): per-registrable-domain corpus stats —
    the URL-level triage signal behind RefinedWeb-style source
    filtering (which domains dominate the crawl; where duplicate-URL
    mass concentrates). ``n_pages`` counts DISTINCT canonical URLs, so
    ``n_docs - n_pages`` per host is re-crawl/alias volume the URL
    canonicalizer collapsed. Non-URL rows (NULL host) are excluded —
    they have no domain to aggregate under.

    Shape at scale: canonicalization is scan-stage; ONE shuffle on
    host with map-side partial aggregation (countDistinct is the
    standard two-phase expand — per-host page sets never materialize).
    """
    return (
        canonicalize_urls(df, col)
        .where(F.col("host").isNotNull())
        .groupBy("host")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("canon_url").alias("n_pages"),
        )
    )


def domain_stats_sql(source: str, col: str = "url") -> str:
    """DuckDB twin of :func:`domain_stats`."""
    return f"""
      SELECT host,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(DISTINCT canon_url) AS BIGINT) AS n_pages
      FROM ({canonicalize_urls_sql(source, col)})
      WHERE host IS NOT NULL
      GROUP BY host
    """


def blocklist_filter(
    df: DataFrame, blocked_hosts: DataFrame, col: str = "url"
) -> DataFrame:
    """Drop rows whose registrable domain appears in ``blocked_hosts``
    (a DataFrame with one ``host`` column) — the first gate every web
    pipeline runs (adult/malware/spam domain lists, e.g. UT1's ~4.6M
    entries). Rows that are not URLs (NULL host) pass through: absence
    of a URL is not evidence of a blocked domain; gate them separately
    if the pipeline requires URLs.

    The blocklist joins as a plain equi-join on host — at UT1 scale
    it is broadcastable and Spark/AQE picks that automatically; forcing
    ``F.broadcast`` here would be wrong for multi-GB lists. Output
    carries the input columns plus canon_url/host (already paid for).
    """
    if "host" not in blocked_hosts.columns:
        raise ValueError("blocked_hosts must have a 'host' column")
    # no distinct() on the list: left_anti never duplicates left rows
    # regardless of right-side dups, and a UT1-scale list would pay a
    # full extra exchange + aggregate for nothing
    return canonicalize_urls(df, col).join(
        blocked_hosts.select("host"), "host", "left_anti"
    )


def blocklist_filter_sql(
    source: str, blocked_source: str, col: str = "url"
) -> str:
    """DuckDB twin of :func:`blocklist_filter` (anti-join keeps NULL
    hosts in both engines — a NULL key never matches)."""
    return f"""
      SELECT * FROM ({canonicalize_urls_sql(source, col)}) c
      WHERE c.host IS NULL OR c.host NOT IN (
        SELECT host FROM ({blocked_source}) WHERE host IS NOT NULL
      )
    """


# ---------------------------------------------------------------------------
# URL-keyed dedup (crawl-level first pass)
# ---------------------------------------------------------------------------


def url_dedup(docs: DataFrame, col: str = "url") -> DataFrame:
    """(canon_url, best_doc_id, n_members, best_quality): per
    CANONICAL url, the highest-quality document (ties -> lowest
    doc_id) — the crawl-level first-pass dedup every large pipeline
    runs BEFORE any content hashing: re-crawls and tracking-parameter
    variants of one page collapse on the canonical key with zero text
    comparison. Content-level dedup (exact/minhash) then runs on the
    survivors only.

    Input needs (doc_id, text, ``col``); rows whose URL does not
    canonicalize (no scheme -> NULL key) are NOT emitted — a NULL key
    carries no aliasing evidence, and collapsing all NULL-url docs to
    one survivor would silently merge unrelated pages. Callers route
    the NULL-url remainder to content dedup unchanged.

    Scale shape: canonicalization AND the quality score are computed
    in the SAME scan (quality_score's ``keep`` passthrough — no
    corpus self-join back on doc_id); the only shuffle is the window
    sort partitioned by canon_url (uniform — a canonical url is a
    natural near-unique key; a pathological mega-alias key is exactly
    the duplication this operator removes). ``doc_id`` is
    ID-TYPE-AGNOSTIC."""
    from pyspark.sql import Window

    from ocr_spark.functions.text import quality_score

    canon = canonicalize_urls(docs.select("doc_id", "text", col), col)
    scored = quality_score(canon, keep=("canon_url",)).where(
        F.col("canon_url").isNotNull()
    )
    w = Window.partitionBy("canon_url").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "n_members", F.count("*").over(Window.partitionBy("canon_url"))
        )
        .where(F.col("_rn") == 1)
        .select(
            "canon_url",
            F.col("doc_id").alias("best_doc_id"),
            F.col("n_members").cast("long").alias("n_members"),
            F.col("quality").alias("best_quality"),
        )
    )


def url_dedup_sql(
    source: str,
    col: str = "url",
    id_sql: str = "CAST(doc_id AS BIGINT)",
) -> str:
    """DuckDB twin of :func:`url_dedup` — the quality twin runs over
    the canonicalized source in one scan (``keep`` passthrough);
    ``id_sql`` plumbs the id type end-to-end (string-id corpora pass
    ``'doc_id'``). ``source`` must produce (doc_id, text, ``col``)."""
    from ocr_spark.functions.text import quality_score_sql

    scored = quality_score_sql(
        f"({canonicalize_urls_sql(source, col)}) canon",
        id_sql=id_sql,
        keep=("canon_url",),
    )
    return f"""
      WITH r AS (
        SELECT canon_url, doc_id, quality,
               row_number() OVER (
                 PARTITION BY canon_url
                 ORDER BY quality DESC, doc_id ASC) AS _rn,
               count(*) OVER (PARTITION BY canon_url) AS n_members
        FROM ({scored}) WHERE canon_url IS NOT NULL
      )
      SELECT canon_url, doc_id AS best_doc_id,
             CAST(n_members AS BIGINT) AS n_members,
             quality AS best_quality
      FROM r WHERE _rn = 1
    """
