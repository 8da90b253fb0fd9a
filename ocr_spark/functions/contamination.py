"""Benchmark decontamination: flag training documents sharing w-gram
shingles with a benchmark/eval set (the GPT-3/Llama "13-gram overlap"
check).

Scale shape (the only one that survives 100 TB):

- per-document shingle sets are deduplicated INSIDE the array
  (``array_distinct``) before exploding — no distinct-shuffle over the
  exploded corpus;
- shingles are folded to the portable 60-bit md5 hash, so the join key
  is uniform (no hot shingle key) and fixed-width;
- the benchmark side is tiny by definition (an eval set, not a
  corpus): its distinct hash set is BROADCAST, so the corpus-side scan
  never shuffles — the only corpus-wide Exchange is the final per-doc
  count aggregation, with map-side partials.

Benchmark items SHORTER than w words can't be caught by w-gram
equality (the doc side only emits w-grams; a 10-word eval question
embedded in a 500-word doc would never match a 13-gram). Those items
are checked by exact substring containment against a broadcast of the
short texts — a BroadcastNestedLoopJoin, which is normally a
forbidden plan shape but is the honest one here: the short-item list
is a handful of rows, so the "nested loop" is a per-row scan-stage
substring test, not an all-pairs blowup.

Emits only documents with at least one overlapping shingle or one
contained short item (the removal worklist); ``contaminated`` flags
shingle counts at/over ``min_overlap`` — containment of a full short
item is always flagged. Hash collisions (2^-60 per pair) can only ADD
a spurious overlap; the DuckDB twin hashes identically, so the gate
compares like for like.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_spark.functions.dedup import shingles_expr, shingles_sql
from ocr_spark.functions.hashing import md5_long_expr, md5_long_sql
from ocr_spark.schema import WS

CONTAM_W = 13  # the standard decontamination n-gram width
MIN_OVERLAP = 2


def _n_words(col: str = "text") -> str:
    return f"size(split({col}, '{WS}+'))"


def _doc_shingle_hashes(docs: DataFrame, w: int) -> DataFrame:
    """(doc_id, h): per-doc DISTINCT w-gram hashes — THE corpus-side
    shingle rendering, shared by the per-doc gate and the per-item
    leak report so a tokenization/hash fix can never desynchronize
    them."""
    return docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.expr(shingles_expr(w)))).alias("sh"),
    ).select("doc_id", F.expr(md5_long_expr("sh")).alias("h"))


def _short_items(benchmark: DataFrame, w: int) -> DataFrame:
    """Non-empty benchmark rows under ``w`` words (the containment
    branch's input), with text duplicated as b_text — shared
    rendering."""
    return benchmark.where(
        F.col("text").isNotNull()
        & (F.col("text") != "")
        & F.expr(f"{_n_words()} < {w}")
    ).withColumn("b_text", F.col("text"))


def _dsh_sql(table: str, w: int, id_sql: str = "CAST(doc_id AS BIGINT)") -> str:
    """DuckDB twin of :func:`_doc_shingle_hashes`."""
    return f"""
        SELECT {id_sql} AS doc_id, {md5_long_sql('sh')} AS h
        FROM (SELECT doc_id, unnest(list_distinct({shingles_sql(w)})) AS sh
              FROM {table})
    """


def contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    w: int = CONTAM_W,
    min_overlap: int = MIN_OVERLAP,
    broadcast_benchmark: bool = True,
    short_item_containment: bool = True,
) -> DataFrame:
    """(doc_id, n_overlap, n_contained, contaminated) for every doc in
    ``docs`` sharing >=1 distinct w-gram with ``benchmark`` or fully
    containing a benchmark item shorter than w words.

    ``n_overlap`` counts distinct shared w-grams; ``n_contained``
    counts distinct short benchmark items appearing verbatim.
    ``contaminated`` = n_overlap >= min_overlap OR n_contained >= 1.

    Pass ``broadcast_benchmark=False`` only if the benchmark side is
    genuinely too large to broadcast (rare); the join then falls back
    to a shuffle on the uniform 60-bit hash key.
    ``short_item_containment=False`` restores pure w-gram semantics
    (short benchmark items are then silently uncheckable — only safe
    when every item has >= w words).
    """
    dsh = _doc_shingle_hashes(docs, w)
    bsh = (
        benchmark.where(F.expr(f"{_n_words()} >= {w}"))
        .select(F.explode(F.expr(shingles_expr(w))).alias("sh"))
        .select(F.expr(md5_long_expr("sh")).alias("h"))
        .distinct()
    )
    if broadcast_benchmark:
        bsh = F.broadcast(bsh)
    sh_hits = dsh.join(bsh, "h").groupBy("doc_id").agg(
        F.count("*").alias("n_overlap")
    )
    if not short_item_containment:
        return sh_hits.select(
            "doc_id",
            "n_overlap",
            F.lit(0).alias("n_contained"),
            (F.col("n_overlap") >= min_overlap).alias("contaminated"),
        )
    shorts = _short_items(benchmark, w).select("b_text").distinct()
    # one row per (doc row, short item) pair by construction (shorts
    # is distinct), so count(*) == count(distinct b_text) — and skips
    # the extra dedup Exchange a count_distinct would add
    ct_hits = (
        docs.join(F.broadcast(shorts), F.expr("contains(text, b_text)"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contained"))
    )
    return (
        sh_hits.join(ct_hits, "doc_id", "full")
        .select(
            "doc_id",
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            F.coalesce("n_contained", F.lit(0)).alias("n_contained"),
        )
        .withColumn(
            "contaminated",
            (F.col("n_overlap") >= min_overlap) | (F.col("n_contained") >= 1),
        )
    )


def contamination_sql(
    table: str = "documents",
    bench_table: str = "documents",
    w: int = CONTAM_W,
    min_overlap: int = MIN_OVERLAP,
    short_item_containment: bool = True,
) -> str:
    nw = f"len(regexp_split_to_array(text, '{WS}+'))"
    sh_hits = f"""
      SELECT dsh.doc_id AS doc_id, count(*) AS n_overlap
      FROM ({_dsh_sql(table, w)}) dsh
      JOIN (
        SELECT DISTINCT {md5_long_sql('sh')} AS h
        FROM (SELECT unnest({shingles_sql(w)}) AS sh
              FROM {bench_table} WHERE {nw} >= {w})
      ) bsh USING (h)
      GROUP BY dsh.doc_id
    """
    if not short_item_containment:
        return f"""
          SELECT doc_id, n_overlap, 0 AS n_contained,
                 n_overlap >= {min_overlap} AS contaminated
          FROM ({sh_hits})
        """
    ct_hits = f"""
      SELECT d.doc_id AS doc_id, count(*) AS n_contained
      FROM {table} d
      JOIN (SELECT DISTINCT text AS b_text FROM {bench_table}
            WHERE text IS NOT NULL AND text != '' AND {nw} < {w}) b
        ON contains(d.text, b.b_text)
      GROUP BY d.doc_id
    """
    return f"""
      SELECT coalesce(s.doc_id, c.doc_id) AS doc_id,
             coalesce(s.n_overlap, 0) AS n_overlap,
             coalesce(c.n_contained, 0) AS n_contained,
             coalesce(s.n_overlap, 0) >= {min_overlap}
               OR coalesce(c.n_contained, 0) >= 1 AS contaminated
      FROM ({sh_hits}) s
      FULL OUTER JOIN ({ct_hits}) c ON s.doc_id = c.doc_id
    """


def benchmark_leak_report(
    docs: DataFrame,
    benchmark: DataFrame,
    w: int = CONTAM_W,
    min_overlap: int = MIN_OVERLAP,
) -> DataFrame:
    """(item_id, kind, n_docs_hit, max_overlap, leaked): the
    per-BENCHMARK-ITEM complement of :func:`contamination` — how many
    corpus documents leak each item and how badly. ``contamination``
    answers "which docs must I drop"; this answers the eval owner's
    question "which of my test items are compromised", zero-hit items
    included (they prove the eval is clean, not just that dirty docs
    were dropped).

    NOT a row-for-row inverse: the gate pools shared grams ACROSS
    items per doc (a doc sharing 1 gram with each of two items is
    contaminated at min_overlap=2), while this report thresholds per
    (item, doc) pair — such a spread-overlap doc is dropped by the
    gate yet charges NO single item here, correctly: neither item
    individually leaked. Read the gate for drop decisions and this
    report for item health; their totals are not reconcilable by
    construction.

    kind='wgram' (items with >= ``w`` words): a doc counts iff it
    shares >= ``min_overlap`` distinct w-grams with the item;
    max_overlap = the worst doc's shared-gram count (0 when clean).
    kind='short' (non-empty items under ``w`` words): a doc counts
    iff it contains the item verbatim; max_overlap = -1 (gram overlap
    undefined at this length; the span_diff sentinel discipline).
    NULL/empty-text items carry no signal and are not emitted.
    leaked = n_docs_hit >= 1.

    Scale shape mirrors ``contamination``: the benchmark side (tiny
    by definition) is broadcast; the corpus explodes per-doc DISTINCT
    gram hashes once; the per-(item, doc) counts aggregate on the
    uniform 60-bit hash then collapse to |items| rows."""
    items = benchmark.select(F.col("doc_id").alias("item_id"), "text")
    long_items = items.where(F.expr(f"{_n_words()} >= {w}"))
    bsh = long_items.select(
        "item_id",
        F.explode(F.array_distinct(F.expr(shingles_expr(w)))).alias("sh"),
    ).select("item_id", F.expr(md5_long_expr("sh")).alias("h"))
    dsh = _doc_shingle_hashes(docs, w)
    pair = (
        dsh.join(F.broadcast(bsh), "h")
        .groupBy("item_id", "doc_id")
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= min_overlap)
    )
    per_long = pair.groupBy("item_id").agg(
        F.count("*").alias("n_docs_hit"),
        F.max("n_shared").alias("max_overlap"),
    )
    long_report = (
        long_items.select("item_id")
        .join(per_long, "item_id", "left")
        .select(
            "item_id",
            F.lit("wgram").alias("kind"),
            F.coalesce("n_docs_hit", F.lit(0)).cast("long").alias("n_docs_hit"),
            F.coalesce("max_overlap", F.lit(0)).cast("long").alias("max_overlap"),
        )
    )
    shorts = _short_items(items, w).select("item_id", "b_text")
    ct = (
        docs.join(F.broadcast(shorts), F.expr("contains(text, b_text)"))
        .groupBy("item_id")
        .agg(F.count("*").alias("n_docs_hit"))
    )
    short_report = (
        shorts.select("item_id")
        .join(ct, "item_id", "left")
        .select(
            "item_id",
            F.lit("short").alias("kind"),
            F.coalesce("n_docs_hit", F.lit(0)).cast("long").alias("n_docs_hit"),
            F.lit(-1).cast("long").alias("max_overlap"),
        )
    )
    return long_report.unionByName(short_report).withColumn(
        "leaked", F.col("n_docs_hit") >= 1
    )


def benchmark_leak_report_sql(
    table: str = "documents",
    bench_table: str = "documents",
    w: int = CONTAM_W,
    min_overlap: int = MIN_OVERLAP,
    id_sql: str = "CAST(doc_id AS BIGINT)",
) -> str:
    """DuckDB twin of :func:`benchmark_leak_report`."""
    nw = f"len(regexp_split_to_array(text, '{WS}+'))"
    return f"""
      WITH items AS (
        SELECT {id_sql} AS item_id, text FROM {bench_table}
      ),
      long_items AS (SELECT * FROM items WHERE {nw} >= {w}),
      bsh AS (
        SELECT item_id, {md5_long_sql('sh')} AS h
        FROM (SELECT item_id, unnest(list_distinct({shingles_sql(w)})) AS sh
              FROM long_items)
      ),
      dsh AS ({_dsh_sql(table, w, id_sql)}),
      pair AS (
        SELECT item_id, doc_id, count(*) AS n_shared
        FROM dsh JOIN bsh USING (h)
        GROUP BY item_id, doc_id
        HAVING count(*) >= {min_overlap}
      ),
      per_long AS (
        SELECT item_id, count(*) AS n_docs_hit, max(n_shared) AS max_overlap
        FROM pair GROUP BY item_id
      ),
      long_report AS (
        SELECT li.item_id, 'wgram' AS kind,
               CAST(coalesce(p.n_docs_hit, 0) AS BIGINT) AS n_docs_hit,
               CAST(coalesce(p.max_overlap, 0) AS BIGINT) AS max_overlap
        FROM long_items li LEFT JOIN per_long p USING (item_id)
      ),
      shorts AS (
        SELECT item_id, text AS b_text FROM items
        WHERE text IS NOT NULL AND text != '' AND {nw} < {w}
      ),
      ct AS (
        SELECT s.item_id, count(*) AS n_docs_hit
        FROM {table} d JOIN shorts s ON contains(d.text, s.b_text)
        GROUP BY s.item_id
      ),
      short_report AS (
        SELECT s.item_id, 'short' AS kind,
               CAST(coalesce(c.n_docs_hit, 0) AS BIGINT) AS n_docs_hit,
               CAST(-1 AS BIGINT) AS max_overlap
        FROM shorts s LEFT JOIN ct c USING (item_id)
      )
      SELECT *, n_docs_hit >= 1 AS leaked FROM (
        SELECT * FROM long_report UNION ALL SELECT * FROM short_report
      )
    """
