"""Table reconstruction from interleaved OTSL cell spans.

The extraction kernel parses docling's serialized table structure
losslessly: every OTSL cell token becomes a span of kind
``table_<token>`` and row breaks become ``table_nl`` spans
(``kernel/doctags.py:87`` — the reference pins ``table_mode: "fast"``,
/root/reference/webapp/pdf_utils.py). That preserves the information
but leaves it sequential; :func:`table_reconstruct` turns the span
SEQUENCE back into the analytics-ready grid — one row per anchor cell
with (row, col, rowspan, colspan, is_header, text) — so extracted
tables can be queried/joined like tables instead of read like tape.

OTSL token semantics (docling's public grammar):

- ``fcel``/``ecel``: content / empty cell (anchors);
- ``ched``/``rhed``/``srow``: column-header / row-header / section
  row cells (anchors, flagged ``is_header``);
- ``lcel``: horizontal merge — extends the anchor to its LEFT;
- ``ucel``: vertical merge — extends the anchor ABOVE;
- ``xcel``: 2-D merge — the interior of a rowspan x colspan block;
- ``nl``: end of row.

Reconstruction is pure window algebra (no per-row Python, no UDF):

1. table segmentation: within a document's total span order, a table
   span whose predecessor is NOT a table span starts a new
   ``table_id`` (consecutive blocks separated by prose/media split
   correctly);
2. grid assignment: ``row`` = count of ``nl`` tokens before the cell
   in its table, ``col`` = position among the row's non-``nl`` cells;
3. spans via gaps-and-islands: ``colspan`` = the anchor's run length
   over following ``lcel`` in its row; ``rowspan`` = the run length
   over following ``ucel``/``xcel`` down its own column. A
   spec-conforming block (anchor, ``lcel`` right, ``ucel`` below,
   ``xcel`` interior) yields exactly its rectangle; malformed token
   soup (crawler damage) degrades deterministically instead of
   erroring — orphan merge runs simply anchor nothing.

Scale shape: ONE doc_id Exchange — every window partitions by keys
that start with ``doc_id`` (subset rule), so the segmentation,
grid-assignment, and both run-length windows reuse the same
partitioning with re-sorts only. Output is anchors only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# anchor tokens carry content/position; header kinds flag is_header
_ANCHORS = ("fcel", "ecel", "ched", "rhed", "srow")
_HEADERS = ("ched", "rhed", "srow")


def table_reconstruct(
    docs: DataFrame, kind_prefix: str = "table_"
) -> DataFrame:
    """(doc_id, table_id, row, col, rowspan, colspan, is_header,
    text): the cell grid of every OTSL table block in the span table.
    See the module docstring for the algorithm; ``kind_prefix``
    matches the kernel's ``table_<token>`` kinds."""
    from pyspark.sql import Window

    p = kind_prefix
    tok = F.expr(f"substring(kind, {len(p) + 1})")
    flat = (
        docs.select("doc_id", F.explode("spans").alias("s"))
        .select(
            "doc_id",
            F.col("s.kind").alias("kind"),
            F.col("s.text").alias("text"),
            F.col("s.offset").alias("offset"),
            F.col("s.media_ref").alias("media_ref"),
        )
        .withColumn("_is_tbl", F.col("kind").startswith(p))
    )
    # total span order (the chunker's rule: offset NULLS FIRST +
    # deterministic tie-breaks)
    w_doc = Window.partitionBy("doc_id").orderBy(
        F.col("offset").asc_nulls_first(),
        F.coalesce("text", F.lit("")),
        F.coalesce("media_ref", F.lit("")),
        "kind",
    )
    prev_tbl = F.lag("_is_tbl", 1, False).over(w_doc)
    seg = flat.withColumn(
        "table_id",
        F.sum(
            (F.col("_is_tbl") & ~prev_tbl).cast("int")
        ).over(w_doc.rowsBetween(Window.unboundedPreceding, 0))
        - F.lit(1),
    ).where("_is_tbl")
    cells = seg.withColumn("tok", tok)
    w_tbl = Window.partitionBy("doc_id", "table_id").orderBy(
        F.col("offset").asc_nulls_first(),
        F.coalesce("text", F.lit("")),
        F.coalesce("media_ref", F.lit("")),
        "kind",
    )
    grid = (
        cells.withColumn(
            "row",
            F.sum((F.col("tok") == "nl").cast("int")).over(
                w_tbl.rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        .withColumn("row", F.coalesce("row", F.lit(0)))
        .where(F.col("tok") != "nl")
    )
    w_row = Window.partitionBy("doc_id", "table_id", "row").orderBy(
        F.col("offset").asc_nulls_first(),
        F.coalesce("text", F.lit("")),
        F.coalesce("media_ref", F.lit("")),
        "kind",
    )
    grid = grid.withColumn("col", F.row_number().over(w_row) - 1)
    # gaps-and-islands: horizontal segments break on every non-lcel,
    # vertical segments (per column) on every non-ucel/xcel
    h_start = (F.col("tok") != "lcel").cast("int")
    v_start = (~F.col("tok").isin("ucel", "xcel")).cast("int")
    grid = grid.withColumn(
        "_hseg",
        F.sum(h_start).over(w_row.rowsBetween(Window.unboundedPreceding, 0)),
    )
    w_col = Window.partitionBy("doc_id", "table_id", "col").orderBy("row")
    grid = grid.withColumn(
        "_vseg",
        F.sum(v_start).over(w_col.rowsBetween(Window.unboundedPreceding, 0)),
    )
    w_h = Window.partitionBy("doc_id", "table_id", "row", "_hseg")
    w_v = Window.partitionBy("doc_id", "table_id", "col", "_vseg")
    out = (
        grid.withColumn("colspan", F.count(F.lit(1)).over(w_h).cast("int"))
        .withColumn("rowspan", F.count(F.lit(1)).over(w_v).cast("int"))
        .where(F.col("tok").isin(*_ANCHORS))
        .select(
            "doc_id",
            F.col("table_id").cast("int").alias("table_id"),
            F.col("row").cast("int").alias("row"),
            "col",
            "rowspan",
            "colspan",
            F.col("tok").isin(*_HEADERS).alias("is_header"),
            F.coalesce("text", F.lit("")).alias("text"),
        )
    )
    return out


def table_reconstruct_sql(
    spans_sql: str = "SELECT * FROM spans", kind_prefix: str = "table_"
) -> str:
    """DuckDB twin over a FLAT span source — the same window chain,
    independently formulated (string-offset ordering keys written
    out), so agreement cross-checks segmentation, grid assignment,
    and both run-length computations."""
    p = kind_prefix
    anchors = ", ".join(f"'{a}'" for a in _ANCHORS)
    headers = ", ".join(f"'{h}'" for h in _HEADERS)
    order_keys = (
        '"offset" ASC NULLS FIRST, coalesce(text, \'\'), '
        "coalesce(media_ref, ''), kind"
    )
    return f"""
      WITH src AS ({spans_sql}),
      flagged AS (
        SELECT *, (kind LIKE '{p}%') AS _is_tbl FROM src
      ),
      started AS (
        -- DuckDB forbids nesting lag() inside sum()'s argument, so
        -- the block-start flag gets its own CTE level
        SELECT *, (_is_tbl AND NOT coalesce(lag(_is_tbl)
                 OVER (PARTITION BY doc_id ORDER BY {order_keys}),
                 false)) AS _new
        FROM flagged
      ),
      segd AS (
        SELECT *, sum(CASE WHEN _new THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY {order_keys}
                     ROWS UNBOUNDED PRECEDING) - 1 AS table_id
        FROM started
      ),
      cells AS (
        SELECT doc_id, table_id, text, media_ref, "offset", kind,
               substring(kind, {len(p) + 1}) AS tok
        FROM segd WHERE _is_tbl
      ),
      rows_ AS (
        SELECT *, coalesce(sum(CASE WHEN tok = 'nl' THEN 1 ELSE 0 END)
                 OVER (PARTITION BY doc_id, table_id
                       ORDER BY {order_keys}
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS row
        FROM cells
      ),
      grid AS (
        SELECT *, CAST(row_number() OVER (
                 PARTITION BY doc_id, table_id, row
                 ORDER BY {order_keys}) - 1 AS INT) AS col
        FROM rows_ WHERE tok <> 'nl'
      ),
      segs AS (
        SELECT *,
               sum(CASE WHEN tok <> 'lcel' THEN 1 ELSE 0 END)
                 OVER (PARTITION BY doc_id, table_id, row
                       ORDER BY {order_keys}
                       ROWS UNBOUNDED PRECEDING) AS _hseg,
               sum(CASE WHEN tok NOT IN ('ucel', 'xcel')
                        THEN 1 ELSE 0 END)
                 OVER (PARTITION BY doc_id, table_id, col
                       ORDER BY row ROWS UNBOUNDED PRECEDING) AS _vseg
        FROM grid
      )
      SELECT doc_id, CAST(table_id AS INT) AS table_id,
             CAST(row AS INT) AS row, col,
             CAST(count(*) OVER (PARTITION BY doc_id, table_id, col,
                                 _vseg) AS INT) AS rowspan,
             CAST(count(*) OVER (PARTITION BY doc_id, table_id, row,
                                 _hseg) AS INT) AS colspan,
             tok IN ({headers}) AS is_header,
             coalesce(text, '') AS text
      FROM segs
      QUALIFY tok IN ({anchors})
    """


def table_shapes(
    docs: DataFrame, kind_prefix: str = "table_"
) -> DataFrame:
    """(doc_id, table_id, n_rows, n_cols, n_cells, n_header_cells,
    has_merges): per-table shape census over :func:`table_reconstruct`
    — the corpus-level answer to "what do extracted tables look like"
    (tiny key-value pairs vs wide data grids vs merged-header layout
    monsters), and the gate statistic for table-aware curation
    (e.g. drop 1xN link farms, keep real grids). One extra partial-agg
    on the reconstruction's existing doc_id partitioning."""
    t = table_reconstruct(docs, kind_prefix)
    return t.groupBy("doc_id", "table_id").agg(
        F.max(F.col("row") + F.col("rowspan")).cast("int").alias("n_rows"),
        F.max(F.col("col") + F.col("colspan")).cast("int").alias("n_cols"),
        F.count(F.lit(1)).cast("int").alias("n_cells"),
        F.sum(F.col("is_header").cast("int")).cast("int").alias(
            "n_header_cells"
        ),
        F.max(
            ((F.col("rowspan") > 1) | (F.col("colspan") > 1)).cast("int")
        ).cast("boolean").alias("has_merges"),
    )


def table_shapes_sql(
    spans_sql: str = "SELECT * FROM spans", kind_prefix: str = "table_"
) -> str:
    """DuckDB twin — same aggregate over the reconstruction twin."""
    return f"""
      SELECT doc_id, table_id,
             CAST(max(row + rowspan) AS INT) AS n_rows,
             CAST(max(col + colspan) AS INT) AS n_cols,
             CAST(count(*) AS INT) AS n_cells,
             CAST(sum(CASE WHEN is_header THEN 1 ELSE 0 END) AS INT)
               AS n_header_cells,
             CAST(max(CASE WHEN rowspan > 1 OR colspan > 1
                      THEN 1 ELSE 0 END) AS BOOLEAN) AS has_merges
      FROM ({table_reconstruct_sql(spans_sql, kind_prefix)})
      GROUP BY doc_id, table_id
    """
