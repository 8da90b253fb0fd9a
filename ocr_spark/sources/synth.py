"""Deterministic doc->spans synthesizer over the driver's flat
``documents`` table (doc_id:int64, text:string, ...).

The driver-provided parquet corpus (TESTDATA.md) is flat text; the
engine's input contract is the interleaved span table from
BASELINE.json ``input_hint``. This module derives the span table
*deterministically* from the flat text so that

  (a) the Spark pipeline has a realistic interleaved input at any SF,
  (b) the exact same derivation is expressible in ANSI SQL, letting
      the DuckDB oracle value-check the whole extraction end-to-end.

Rule (shared by both emitters — keep in lockstep):
  words   = regexp-split(text, '\\s+')
  nchunks = (len(words) + W - 1) div W          with W = WORDS_PER_SPAN
  span i in [0, nchunks):
    m = (doc_id + i) % 17
    kind = 'section_header_level_1' if i == 0
           else {3:'page_header', 8:'page_footer', 5:'picture',
                 11:'list_item', 14:'caption', 15:'link'}.get(m,'text')
    text      = '' if picture else join(words[i*W : i*W+W], ' ')
    media_ref = 'img-<doc_id>-<i>' if picture else ''
    offset    = i
"""

from pyspark.sql import Column, DataFrame

from ocr_spark.schema import WS
from pyspark.sql import functions as F

WORDS_PER_SPAN = 6
KIND_MOD = 17
# m-value -> kind (i == 0 overrides to section header).
MOD_KINDS = {
    3: "page_header",
    8: "page_footer",
    5: "picture",
    11: "list_item",
    14: "caption",
    15: "link",
}

_KIND_CASE_SQL = (
    "CASE WHEN {i} = 0 THEN 'section_header_level_1' "
    + " ".join(
        f"WHEN ({{d}} + {{i}}) % {KIND_MOD} = {m} THEN '{k}'"
        for m, k in sorted(MOD_KINDS.items())
    )
    + " ELSE 'text' END"
)


def _kind_case(doc: str, i: str) -> str:
    return _KIND_CASE_SQL.format(d=doc, i=i)


def synthesize_spans(docs: DataFrame, nested: bool = True) -> DataFrame:
    """Flat documents -> interleaved span table, pure Spark exprs
    (whole-stage codegen; no Python).

    nested=True  -> (doc_id string, spans array<struct<...>>)
    nested=False -> flat (doc_id, kind, text, media_ref, offset)
    """
    w = WORDS_PER_SPAN
    kind_sql = _kind_case("doc_id", "i")
    span_struct = f"""
      transform(sequence(0, int(nchunks - 1)), i -> struct(
        {kind_sql} AS kind,
        CASE WHEN {kind_sql} = 'picture' THEN ''
             ELSE array_join(slice(words, i*{w}+1, {w}), ' ') END AS text,
        CASE WHEN {kind_sql} = 'picture' THEN concat('img-', doc_id, '-', i)
             ELSE '' END AS media_ref,
        CAST(i AS INT) AS offset))
    """
    out = (
        docs.select("doc_id", "text")
        .withColumn("words", F.split(F.col("text"), WS + "+"))
        .withColumn("nchunks", F.expr("(size(words)+%d) div %d" % (w - 1, w)))
        .select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.expr(span_struct).alias("spans"),
        )
    )
    if nested:
        return out
    return out.select(
        "doc_id", F.explode("spans").alias("s")
    ).select("doc_id", "s.kind", "s.text", "s.media_ref", "s.offset")


def synth_spans_sql(doc_table: str = "documents") -> str:
    """DuckDB CTE producing the identical flat span rows:
    (doc_id string, kind, text, media_ref, "offset").

    Embed via: WITH spans AS ({this}) SELECT ... FROM spans.
    Note doc_id is cast to VARCHAR to match the Spark side, and
    "offset" must stay quoted (reserved word in DuckDB).
    """
    w = WORDS_PER_SPAN
    kind_sql = _kind_case("doc_id", "i")
    return f"""
      SELECT CAST(doc_id AS VARCHAR) AS doc_id,
             {kind_sql} AS kind,
             CASE WHEN {kind_sql} = 'picture' THEN ''
                  ELSE array_to_string(list_slice(words, i*{w}+1, i*{w}+{w}), ' ') END AS text,
             CASE WHEN {kind_sql} = 'picture' THEN concat('img-', doc_id, '-', i)
                  ELSE '' END AS media_ref,
             CAST(i AS INT) AS "offset"
      FROM (
        SELECT doc_id, words, unnest(range(0, (len(words)+{w - 1})//{w})) AS i
        FROM (SELECT doc_id, regexp_split_to_array(text, '{WS}+') AS words
              FROM {doc_table})
      )
    """
