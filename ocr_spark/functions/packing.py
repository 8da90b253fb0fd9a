"""Training-sequence packing index: the concat-then-cut sample map a
pretraining loader needs — which chunk segments, at which token
offsets, compose each fixed-length training sequence ("pack").

This is the distributed analog of Megatron-LM's GPT dataset
`sample_idx`/`doc_idx` build: tokens are conceptually concatenated in
a deterministic order and cut every ``seq_len`` tokens, so documents
straddle sequence boundaries (standard GPT-style packing — no padding
except the final pack of each shard). The reference's closest analog
is its page-cursor protocol (/root/reference/webapp/jobs.py:25-51):
fixed-size work windows advancing over an ordered stream.

Layering with the existing ops: `sampling.pack_shards` assigns whole
DOCUMENTS to ~budget-sized shards (a storage/sharding concern);
`chunking.chunk_documents` cuts text into model windows; this module
produces the per-SEQUENCE composition index over those chunks — the
artifact the data loader actually consumes.

Scale shape: ONE shuffle (the per-shard running-sum window on a
uniform md5-derived shard key); the straddle explode is a generator
in the same stage, emitting ~(1 + n_tokens/seq_len) rows per chunk.
Shards are independent, so 100 TB packs with parallelism = n_shards
(set n_shards >> executor count); within a shard the order is the
deterministic total order (doc_id, chunk_id), making the index
rerun-stable, partition-count-invariant, and engine-portable —
everything is int64 arithmetic, so the DuckDB twin agrees exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ocr_spark.functions.hashing import md5_long, md5_long_sql

SEQ_LEN = 128
N_SHARDS = 8
_SALT = "pack:v1|"


def _validate(seq_len: int, n_shards: int, name: str = "seq_len") -> None:
    if seq_len < 1:
        raise ValueError(f"{name} must be >= 1")
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")


def shard_col(n_shards: int, doc_id: str = "doc_id") -> F.Column:
    """THE shard assignment (salted 60-bit md5 of doc_id mod
    n_shards) — one definition shared by pack_index and by writers
    that co-locate chunk text with its shard's index rows."""
    return F.pmod(
        md5_long(F.concat(F.lit(_SALT), F.col(doc_id).cast("string"))),
        F.lit(n_shards),
    )


def pack_index(
    chunks: DataFrame,
    seq_len: int = SEQ_LEN,
    n_shards: int = N_SHARDS,
) -> DataFrame:
    """(shard, pack_id, doc_id, chunk_id, begin_tok, end_tok,
    pack_off): for every training sequence ``(shard, pack_id)``, the
    chunk segments that fill it.

    ``begin_tok``/``end_tok`` are the [begin, end) token slice of the
    chunk, ``pack_off`` is where that slice starts inside the pack.
    Every pack is exactly ``seq_len`` tokens except the last pack of
    each shard (the only place padding can appear). A chunk's shard is
    a salted 60-bit md5 of its doc_id, so a document never straddles
    shards; within a shard chunks concatenate in (doc_id, chunk_id)
    order. Zero-token and NULL-doc_id chunks are dropped — explicitly,
    in both engines (chunk_documents never emits either; a NULL id has
    no place in the (doc_id, chunk_id) total order, and the engines'
    NULL sort defaults disagree).
    """
    _validate(seq_len, n_shards)
    base = chunks.where(F.col("doc_id").isNotNull()).select(
        "doc_id",
        "chunk_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        shard_col(n_shards).alias("shard"),
    ).where(F.col("n_tokens") > 0)
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id", "chunk_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = base.select(
        "shard",
        "doc_id",
        "chunk_id",
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("before"),
    )
    # a chunk touches packs floor(before/L) .. floor((before+n-1)/L)
    return cum.select(
        "shard",
        F.explode(
            F.expr(
                f"sequence(before div {seq_len}, "
                f"(before + n_tokens - 1) div {seq_len})"
            )
        ).alias("pack_id"),
        "doc_id",
        "chunk_id",
        "n_tokens",
        "before",
    ).select(
        "shard",
        "pack_id",
        "doc_id",
        "chunk_id",
        F.greatest(F.lit(0), F.col("pack_id") * seq_len - F.col("before"))
        .cast("long")
        .alias("begin_tok"),
        F.least(
            F.col("n_tokens"), (F.col("pack_id") + 1) * seq_len - F.col("before")
        )
        .cast("long")
        .alias("end_tok"),
        (
            F.col("before")
            + F.greatest(F.lit(0), F.col("pack_id") * seq_len - F.col("before"))
            - F.col("pack_id") * seq_len
        )
        .cast("long")
        .alias("pack_off"),
    )


def pack_stats(
    chunks: DataFrame,
    seq_len: int = SEQ_LEN,
    n_shards: int = N_SHARDS,
) -> DataFrame:
    """(shard, pack_id, n_segments, n_docs, filled): per training
    sequence, how many chunk segments and distinct documents compose
    it and how many tokens it holds — ``filled == seq_len`` everywhere
    except each shard's final pack (the padding/waste report a packing
    run is judged by)."""
    idx = pack_index(chunks, seq_len, n_shards)
    return idx.groupBy("shard", "pack_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum(F.col("end_tok") - F.col("begin_tok")).alias("filled"),
    )


def _index_sql(chunks_sql: str, seq_len: int, n_shards: int) -> str:
    shard = md5_long_sql(f"'{_SALT}' || CAST(doc_id AS VARCHAR)")
    return f"""
      WITH chunks AS ({chunks_sql}),
      based AS (
        SELECT doc_id, chunk_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               {shard} % {n_shards} AS shard
        FROM chunks WHERE n_tokens > 0 AND doc_id IS NOT NULL
      ),
      cum AS (
        SELECT shard, doc_id, chunk_id, n_tokens,
               CAST(SUM(n_tokens) OVER (
                 PARTITION BY shard ORDER BY doc_id, chunk_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_tokens AS BIGINT) AS before
        FROM based
      ),
      seg AS (
        SELECT shard, p.i AS pack_id, doc_id, chunk_id, n_tokens, before
        FROM cum,
             LATERAL unnest(generate_series(before // {seq_len},
                                            (before + n_tokens - 1) // {seq_len}))
               AS p(i)
      )
      SELECT shard, pack_id, doc_id, chunk_id,
             GREATEST(0, pack_id * {seq_len} - before) AS begin_tok,
             LEAST(n_tokens, (pack_id + 1) * {seq_len} - before) AS end_tok,
             before + GREATEST(0, pack_id * {seq_len} - before)
               - pack_id * {seq_len} AS pack_off
      FROM seg
    """


def pack_index_sql(
    chunks_sql: str,
    seq_len: int = SEQ_LEN,
    n_shards: int = N_SHARDS,
) -> str:
    """DuckDB twin of :func:`pack_index`; ``chunks_sql`` is a SELECT
    producing (doc_id, chunk_id, n_tokens) — e.g.
    ``chunking.chunk_documents_sql()``. Both engines' shard hash is the
    shared 60-bit md5 fold (non-negative, so ``%`` == ``pmod``) and
    all arithmetic is int64, so the index matches bit-for-bit."""
    _validate(seq_len, n_shards)
    return _index_sql(chunks_sql, seq_len, n_shards)


def pack_stats_sql(
    chunks_sql: str,
    seq_len: int = SEQ_LEN,
    n_shards: int = N_SHARDS,
) -> str:
    """DuckDB twin of :func:`pack_stats` (sums cast back to BIGINT —
    DuckDB widens SUM(BIGINT) to HUGEINT)."""
    _validate(seq_len, n_shards)
    return f"""
      SELECT shard, pack_id,
             CAST(COUNT(*) AS BIGINT) AS n_segments,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(SUM(end_tok - begin_tok) AS BIGINT) AS filled
      FROM ({_index_sql(chunks_sql, seq_len, n_shards)})
      GROUP BY shard, pack_id
    """


# ---------------------------------------------------------------------------
# media-atomic slot packing over interleaved chunks
# ---------------------------------------------------------------------------

SLOTS_PER_PACK = 4


def pack_interleaved(
    chunks: DataFrame,
    slots: int = SLOTS_PER_PACK,
    n_shards: int = N_SHARDS,
) -> DataFrame:
    """(shard, pack_id, slot, doc_id, chunk_id, n_tokens, overflow):
    media-atomic sequence packing over ``chunk_interleaved`` output —
    ``slots`` whole chunks per pack, chunks NEVER split.

    :func:`pack_index` cuts at token granularity, which is correct for
    text but illegal for interleaved chunks: a cut landing inside a
    media span's token block would split the unsplittable. Slot
    packing trades fill for atomicity: chunk_interleaved guarantees
    every non-overflow chunk costs <= its budget B, so a pack of
    ``slots`` chunks costs <= slots*B tokens — choose
    seq_len = slots * B and every pack fits, wasting at most the
    slack the budget-aligned chunks already carry (measure it with
    :func:`pack_interleaved_stats`; raise B / lower slots if the
    waste ppm matters). OVERFLOW chunks (a single span bigger than B)
    can exceed any slot budget, so each gets a pack of its own, slot
    0, numbered after the shard's slot packs — the loader sees them
    isolated instead of silently blowing a sequence.

    Determinism: shard = the shared salted md5 of doc_id (a document
    never straddles shards); within a shard, chunks order by
    (overflow, doc_id, chunk_id) and pack_id/slot are pure integer
    arithmetic on the row number — rerun-stable,
    partition-count-invariant, engine-exact.

    Scale shape: ONE shuffle (the per-shard row-number window; the
    overflow-count window reuses the same partitioning). Shards are
    independent — parallelism = n_shards, same as pack_index.
    """
    _validate(slots, n_shards, name="slots")
    base = (
        chunks.where(F.col("doc_id").isNotNull())
        .select(
            "doc_id",
            "chunk_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("overflow").cast("boolean").alias("overflow"),
            shard_col(n_shards).alias("shard"),
        )
        .where(F.col("n_tokens") > 0)
    )
    ow = F.when(F.col("overflow"), F.lit(1)).otherwise(F.lit(0))
    w_rn = Window.partitionBy("shard").orderBy(
        ow.asc(), "doc_id", "chunk_id"
    )
    w_all = Window.partitionBy("shard")
    rn = F.row_number().over(w_rn)
    c = F.sum(1 - ow).over(w_all)  # non-overflow chunks in the shard
    n_slot_packs = F.floor((c + slots - 1) / slots)
    return base.select(
        "shard",
        F.when(
            F.col("overflow"),
            (n_slot_packs + (rn - c) - 1),
        )
        .otherwise(F.floor((rn - 1) / slots))
        .cast("long")
        .alias("pack_id"),
        F.when(F.col("overflow"), F.lit(0))
        .otherwise((rn - 1) % slots)
        .cast("int")
        .alias("slot"),
        "doc_id",
        "chunk_id",
        "n_tokens",
        "overflow",
    )


def pack_interleaved_stats(
    chunks: DataFrame,
    slots: int = SLOTS_PER_PACK,
    n_shards: int = N_SHARDS,
) -> DataFrame:
    """(shard, pack_id, n_chunks, n_docs, n_tokens, has_overflow):
    per-pack composition — the fill/waste report for slot packing
    (compare n_tokens against slots * budget; ``has_overflow`` packs
    are the isolated giant-span sequences)."""
    idx = pack_interleaved(chunks, slots, n_shards)
    return idx.groupBy("shard", "pack_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.max(F.col("overflow").cast("int")).cast("boolean").alias(
            "has_overflow"
        ),
    )


def _interleaved_sql(chunks_sql: str, slots: int, n_shards: int) -> str:
    shard = md5_long_sql(f"'{_SALT}' || CAST(doc_id AS VARCHAR)")
    return f"""
      WITH ichunks AS ({chunks_sql}),
      based AS (
        SELECT doc_id, chunk_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               overflow, CASE WHEN overflow THEN 1 ELSE 0 END AS ow,
               {shard} % {n_shards} AS shard
        FROM ichunks WHERE n_tokens > 0 AND doc_id IS NOT NULL
      ),
      numbered AS (
        SELECT *,
               ROW_NUMBER() OVER (
                 PARTITION BY shard ORDER BY ow, doc_id, chunk_id
               ) AS rn,
               SUM(1 - ow) OVER (PARTITION BY shard) AS c
        FROM based
      )
      SELECT shard,
             CAST(CASE WHEN overflow
               THEN (c + {slots} - 1) // {slots} + (rn - c) - 1
               ELSE (rn - 1) // {slots} END AS BIGINT) AS pack_id,
             CAST(CASE WHEN overflow THEN 0
               ELSE (rn - 1) % {slots} END AS INT) AS slot,
             doc_id, chunk_id, n_tokens, overflow
      FROM numbered
    """


def pack_interleaved_sql(
    chunks_sql: str,
    slots: int = SLOTS_PER_PACK,
    n_shards: int = N_SHARDS,
) -> str:
    """DuckDB twin of :func:`pack_interleaved`; ``chunks_sql`` is a
    SELECT producing (doc_id, chunk_id, n_tokens, overflow) — e.g.
    ``interleave.chunk_interleaved_sql(...)``. Integer floor division
    on non-negative operands only, so ``//`` == Spark ``div``."""
    _validate(slots, n_shards, name="slots")
    return _interleaved_sql(chunks_sql, slots, n_shards)


def pack_interleaved_stats_sql(
    chunks_sql: str,
    slots: int = SLOTS_PER_PACK,
    n_shards: int = N_SHARDS,
) -> str:
    """DuckDB twin of :func:`pack_interleaved_stats`."""
    _validate(slots, n_shards, name="slots")
    return f"""
      SELECT shard, pack_id,
             CAST(COUNT(*) AS BIGINT) AS n_chunks,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
             CAST(MAX(CASE WHEN overflow THEN 1 ELSE 0 END) AS BOOLEAN)
               AS has_overflow
      FROM ({_interleaved_sql(chunks_sql, slots, n_shards)})
      GROUP BY shard, pack_id
    """
