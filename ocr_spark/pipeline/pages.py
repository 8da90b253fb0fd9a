"""Page splitting & page metadata (SURVEY.md R1-R4).

The reference splits multi-page PDFs into one work unit per page and
attaches {original_name, page_number (1-based), total_pages}
(/root/reference/webapp/pdf_utils.py:44-68,
/root/reference/webapp/state.py:425-449). Columnar equivalent: derive
a pages array and posexplode it — one narrow pass, no shuffle; page
metadata falls out of the explode position instead of a window.

On a 100 TB corpus this is the fan-out stage: the explode multiplies
rows but keeps them in the same partition as the parent doc, so
downstream per-page work needs no re-shuffle until an aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ocr_spark.schema import WS

WORDS_PER_PAGE = 40
SPLIT_FALLBACK_NOTE = "SPLIT_FAILED: processed as single page"


def _pages_expr(words_per_page: int) -> str:
    w = words_per_page
    return (
        f"transform(sequence(0, (size(split(text, '{WS}+')) + {w - 1}) div {w} - 1), "
        f"i -> concat_ws(' ', slice(split(text, '{WS}+'), i * {w} + 1, {w})))"
    )


def split_pages(docs: DataFrame, words_per_page: int = WORDS_PER_PAGE) -> DataFrame:
    """R1+R2+R3: (doc_id, page_number, total_pages, page_text, split_note).

    Empty/whitespace-only docs take the split-failure fallback: one
    page 1/1 holding the raw text plus a note — the doc is never
    dropped (/root/reference/webapp/state.py:440-449).
    """
    pages = _pages_expr(words_per_page)
    split_ok = F.expr(f"size(split(text, '{WS}+')) > 0") & (F.trim(F.col("text")) != "")
    with_pages = docs.select(
        "doc_id",
        F.when(split_ok, F.expr(pages)).otherwise(F.array(F.col("text"))).alias("pages"),
        F.when(split_ok, F.lit("")).otherwise(F.lit(SPLIT_FALLBACK_NOTE)).alias("split_note"),
    )
    return with_pages.select(
        "doc_id",
        F.posexplode("pages").alias("pos", "page_text"),
        F.size("pages").alias("total_pages"),
        "split_note",
    ).select(
        "doc_id",
        (F.col("pos") + 1).cast("int").alias("page_number"),
        F.col("total_pages").cast("int"),
        "page_text",
        "split_note",
    )


def split_pages_sql(table: str = "documents", words_per_page: int = WORDS_PER_PAGE) -> str:
    w = words_per_page
    pages = (
        f"list_transform(range(0, (len(regexp_split_to_array(text, '{WS}+')) + {w - 1}) // {w}), "
        f"i -> array_to_string(list_slice(regexp_split_to_array(text, '{WS}+'), "
        f"i * {w} + 1, i * {w} + {w}), ' '))"
    )
    split_ok = f"(len(regexp_split_to_array(text, '{WS}+')) > 0 AND trim(text) <> '')"
    # parallel unnests zip in DuckDB: page_number rides along page_text
    return f"""
      SELECT doc_id,
             CAST(unnest(range(1, len(pages) + 1)) AS INT) AS page_number,
             CAST(len(pages) AS INT) AS total_pages,
             unnest(pages) AS page_text,
             split_note
      FROM (
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CASE WHEN {split_ok} THEN {pages} ELSE [text] END AS pages,
               CASE WHEN {split_ok} THEN '' ELSE '{SPLIT_FALLBACK_NOTE}' END AS split_note
        FROM {table}
      )
    """


# only CANONICAL suffix renderings claim a number: 'report_1' claims 1
# but 'report_01' does not (the reference compares full strings, so a
# zero-padded real name never collides with a generated 'base_1')
_SUFFIX_RE = r"^(.*)_([1-9][0-9]*)$"
# Path.stem / Path.suffix split: extension = from the LAST '.' iff it
# is neither the name's first character nor its last
_EXT_RE = r"^(.+)(\.[^.]+)$"


def unique_names(docs: DataFrame, name_col: str = "source") -> DataFrame:
    """R4: dedup colliding names — the first doc of each name keeps it
    bare; later duplicates get counter suffixes inserted BEFORE the
    extension (``report.pdf`` -> ``report_1.pdf``), exactly like the
    reference's ``f"{stem}_{counter}{suffix}"`` while-loop
    (/root/reference/webapp/pdf_utils.py:26-41), and the counters SKIP
    any candidate that already exists as a real name (without the
    skip, input ['a','a','a_1'] would emit 'a_1' twice). The
    stem/extension split mirrors ``Path.stem``/``Path.suffix``: the
    extension is the part from the last '.' provided it is neither the
    first nor the last character ('.bashrc' and 'a.' have none).
    Divergence note: the reference's output depends on sequential
    upload order; this columnar form is order-canonical (doc_id order)
    and globally unique by construction.

    Shuffles on the name key — small-cardinality dimension data; at
    corpus scale names are near-unique so partitions stay flat.
    """
    ext = F.regexp_extract("name", _EXT_RE, 2)
    base = docs.select(
        "doc_id", F.col(name_col).alias("name")
    ).select(
        "doc_id",
        "name",
        F.when(ext != "", F.regexp_extract("name", _EXT_RE, 1))
        .otherwise(F.col("name"))
        .alias("stem"),
        ext.alias("ext"),
    )
    named = base.withColumn(
        "seq", F.row_number().over(Window.partitionBy("name").orderBy("doc_id"))
    )
    # counter i is claimed for (stem S, ext E) by any REAL name whose
    # own stem is 'S_i' with the same extension (full-string collision
    # with the would-be candidate 'S_i' + E)
    taken = (
        base.select(
            F.regexp_extract("stem", _SUFFIX_RE, 1).alias("tbase"),
            F.regexp_extract("stem", _SUFFIX_RE, 2).alias("ti_s"),
            F.col("ext").alias("text"),
        )
        .where(F.col("ti_s") != "")
        .select("tbase", "text", F.col("ti_s").cast("long").alias("ti"))
        .distinct()
    )
    need = (
        named.where(F.col("seq") >= 2)
        .groupBy("name", "stem", "ext")
        .agg(F.max(F.col("seq") - 1).alias("max_k"))
    )
    ntaken = taken.groupBy(
        F.col("tbase").alias("stem"), F.col("text").alias("ext")
    ).agg(F.count("*").alias("n_taken"))
    # k-th free suffix: enumerate 1..(max_k + taken) candidates,
    # drop the taken ones, rank what survives
    cands = (
        need.join(ntaken, ["stem", "ext"], "left")
        .select(
            "name",
            "stem",
            "ext",
            F.explode(
                F.sequence(F.lit(1), F.col("max_k") + F.coalesce("n_taken", F.lit(0)))
            ).alias("i"),
        )
    )
    free = cands.join(
        taken,
        (cands.stem == taken.tbase) & (cands.ext == taken.text) & (cands.i == taken.ti),
        "left_anti",
    )
    ranked = free.withColumn(
        "k", F.row_number().over(Window.partitionBy("name").orderBy("i"))
    ).select(F.col("name").alias("_rname"), F.col("i").alias("_ri"), "k")
    out = named.join(
        ranked,
        (F.col("name") == F.col("_rname")) & (F.col("seq") - 1 == F.col("k")),
        "left",
    )
    return out.select(
        "doc_id",
        "name",
        F.when(F.col("seq") == 1, F.col("name"))
        .otherwise(
            F.concat(F.col("stem"), F.lit("_"), F.col("_ri").cast("string"), F.col("ext"))
        )
        .alias("unique_name"),
    )


def unique_names_sql(table: str = "documents", name_col: str = "source") -> str:
    return f"""
      WITH base AS (
        SELECT doc_id, name,
               CASE WHEN regexp_extract(name, '^(.+)(\\.[^.]+)$', 2) <> ''
                    THEN regexp_extract(name, '^(.+)(\\.[^.]+)$', 1)
                    ELSE name END AS stem,
               regexp_extract(name, '^(.+)(\\.[^.]+)$', 2) AS ext
        FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id, {name_col} AS name
              FROM {table})
      ),
      named AS (
        SELECT doc_id, name, stem, ext,
               row_number() OVER (PARTITION BY name ORDER BY doc_id) AS seq
        FROM base
      ),
      taken AS (
        SELECT DISTINCT regexp_extract(stem, '^(.*)_([1-9][0-9]*)$', 1) AS tbase,
               ext AS text,
               CAST(regexp_extract(stem, '^(.*)_([1-9][0-9]*)$', 2) AS BIGINT) AS ti
        FROM base WHERE regexp_matches(stem, '^(.*)_([1-9][0-9]*)$')
      ),
      need AS (
        SELECT name, stem, ext, max(seq - 1) AS max_k
        FROM named WHERE seq >= 2 GROUP BY 1, 2, 3
      ),
      cands AS (
        SELECT need.name, need.stem, need.ext,
               unnest(range(1, max_k + coalesce(t.cnt, 0) + 1)) AS i
        FROM need LEFT JOIN (SELECT tbase, text, count(*) AS cnt
                             FROM taken GROUP BY 1, 2) t
          ON need.stem = t.tbase AND need.ext = t.text
      ),
      free AS (
        SELECT c.name, c.i FROM cands c
        ANTI JOIN taken
          ON c.stem = taken.tbase AND c.ext = taken.text AND c.i = taken.ti
      ),
      ranked AS (
        SELECT name, i, row_number() OVER (PARTITION BY name ORDER BY i) AS k
        FROM free
      )
      SELECT n.doc_id, n.name,
             CASE WHEN n.seq = 1 THEN n.name
                  ELSE n.stem || '_' || CAST(r.i AS VARCHAR) || n.ext END
               AS unique_name
      FROM named n
      LEFT JOIN ranked r ON n.name = r.name AND n.seq - 1 = r.k
    """


def page_count_probe(docs: DataFrame) -> DataFrame:
    """P3 analog: pages_detected per doc
    (/root/reference/pipeline.py:409 counts '# Page' anchors; here the
    deterministic page count of the split)."""
    return split_pages(docs).groupBy("doc_id").agg(
        F.max("total_pages").alias("pages_detected")
    )


def page_count_probe_sql(table: str = "documents") -> str:
    return f"""
      SELECT doc_id, max(total_pages) AS pages_detected
      FROM ({split_pages_sql(table)}) GROUP BY doc_id
    """
