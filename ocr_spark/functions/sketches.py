"""Mergeable sketches: distinct counting that composes at 100 TB.

Exact COUNT(DISTINCT) over a huge keyspace shuffles every distinct
value; a sketch shuffles a few KB per group. Spark 3.5+ ships Apache
DataSketches HLL natively (``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate``), which gives the property that matters at
scale: sketches built independently per shard/day/partition MERGE
into exactly the sketch a single pass would have built — so daily
jobs can maintain running distinct counts without reprocessing
history.

``approx_distinct`` (HLL++ via ``approx_count_distinct``) is the
one-shot form; ``shard_sketches``/``merge_sketches`` are the
incremental form. Tests pin (a) relative error against the exact
count and (b) shard-then-merge == single-pass equality (bit-exact,
not approximate — merge is lossless for HLL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LG_K = 12  # DataSketches default; ~1.6% rse, ~2^lg_k = 4 KB per
           # sketch (HLL_8 layout: one byte per register)


def exact_distinct(
    df: DataFrame, keys: list[str], col: str, out: str = "n_users"
) -> DataFrame:
    """Per-group EXACT distinct count — the oracle-able twin of
    ``approx_distinct`` (shuffles the distinct values; fine while
    per-group cardinality fits a reducer, swap for the sketch past
    that)."""
    return df.groupBy(*keys).agg(F.countDistinct(col).alias(out))


def approx_distinct(
    df: DataFrame,
    keys: list[str],
    col: str,
    rsd: float = 0.05,
    out: str | None = None,
) -> DataFrame:
    """Per-group approximate distinct count (HLL++), one shuffle of
    fixed-size sketch partials — never of the distinct values.
    ``out`` names the count column (default ``approx_distinct_<col>``);
    pass the same name as the exact twin's to keep a published table's
    schema stable across exact/approx runs."""
    return df.groupBy(*keys).agg(
        F.approx_count_distinct(col, rsd).alias(
            out or f"approx_distinct_{col}"
        )
    )


def shard_sketches(
    df: DataFrame, keys: list[str], shard_key: str, col: str, lg_k: int = LG_K
) -> DataFrame:
    """Per-(keys, shard) HLL sketches — the incremental artifact a
    daily pipeline persists (binary column, ~2^lg_k bytes each)."""
    return df.groupBy(*keys, shard_key).agg(
        F.hll_sketch_agg(col, F.lit(lg_k)).alias("sketch")
    )


def merge_sketches(sketches: DataFrame, keys: list[str]) -> DataFrame:
    """Union persisted shard sketches and estimate: (keys,
    distinct_estimate). Lossless — equals the single-pass sketch."""
    return (
        sketches.groupBy(*keys)
        .agg(F.hll_union_agg("sketch").alias("merged"))
        .select(
            *keys,
            F.hll_sketch_estimate("merged").alias("distinct_estimate"),
        )
    )


# ---------------------------------------------------------------------------
# count-min sketch (approximate frequencies, mergeable)
# ---------------------------------------------------------------------------

CMS_DEPTH = 4  # hash rows; error probability decays as (1/2)^depth-ish
CMS_WIDTH = 1024  # cells per row; over-estimate ~ n_items / width

# The exact top-k (text.vocab_topk) shuffles every distinct token;
# the CMS shuffles a FIXED depth*width cell table no matter how large
# the vocabulary is, and sketches built per shard/day merge by cell
# addition into exactly the single-pass sketch. Estimates are
# one-sided: estimate >= true count, over by at most the collision
# mass in the sketch cell. Hashing is the repo's portable salted md5
# fold, so the sketch TABLE itself is deterministic and cross-engine
# oracle-checkable (unlike probabilistic-seed implementations).


def _cms_cells(col_expr, depth: int, width: int, salt: str):
    from ocr_spark.functions.hashing import md5_long

    v = F.coalesce(col_expr.cast("string"), F.lit(""))
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                (md5_long(F.concat(F.lit(f"{salt}:{i}:"), v)) % width).alias(
                    "cell"
                ),
            )
            for i in range(depth)
        ]
    )


def cms_build(
    df: DataFrame,
    col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    salt: str = "cms:v1",
) -> DataFrame:
    """(row, cell, n): the count-min sketch table of ``col`` — one
    scan (each value expands to ``depth`` cells in-plan), one shuffle
    of at most depth*width groups with map-side partials."""
    return (
        df.select(F.explode(_cms_cells(F.col(col), depth, width, salt)).alias("c"))
        .select("c.row", "c.cell")
        .groupBy("row", "cell")
        .agg(F.count("*").alias("n"))
    )


def cms_merge(sketches: DataFrame) -> DataFrame:
    """Merge shard sketch tables by cell addition — equals the
    single-pass sketch EXACTLY (counter addition is associative).

    CALLER CONTRACT: every input sketch must have been built with the
    SAME (depth, width, salt). The cell table carries no parameter
    metadata (unlike HLL, where DataSketches embeds lg_k in the
    binary and the union validates it), so merging incompatible
    sketches returns a well-formed but meaningless table with no
    error. Persist the parameters next to persisted sketches."""
    return sketches.groupBy("row", "cell").agg(F.sum("n").alias("n"))


def cms_estimate(
    sketch: DataFrame,
    df: DataFrame,
    col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    salt: str = "cms:v1",
) -> DataFrame:
    """(value, estimate): point-query estimates for the distinct
    values of ``df.col`` — min over the value's ``depth`` cells
    (absent cell = 0). Broadcast-friendly: the sketch is at most
    depth*width rows."""
    hashed = (
        df.select(F.col(col).alias("value"))
        .distinct()
        .select(
            "value",
            F.explode(_cms_cells(F.col("value"), depth, width, salt)).alias("c"),
        )
        .select("value", "c.row", "c.cell")
    )
    return (
        hashed.join(F.broadcast(sketch), ["row", "cell"], "left")
        .fillna(0, ["n"])
        .groupBy("value")
        .agg(F.min("n").alias("estimate"))
    )


def cms_build_sql(
    values_source: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    salt: str = "cms:v1",
) -> str:
    """DuckDB twin of :func:`cms_build`; ``values_source`` must yield
    one column named ``v``."""
    from ocr_spark.functions.hashing import md5_long_sql

    s = salt.replace("'", "''")
    h = md5_long_sql(
        f"'{s}:' || CAST(r.i AS VARCHAR) || ':' || coalesce(CAST(v AS VARCHAR), '')"
    )
    return f"""
      SELECT row, cell, count(*) AS n FROM (
        SELECT r.i AS row, {h} % {width} AS cell
        FROM {values_source} CROSS JOIN range(0, {depth}) r(i)
      ) GROUP BY row, cell
    """

# ---------------------------------------------------------------------------
# Bloom filter (approximate set membership, mergeable)
# ---------------------------------------------------------------------------

BLOOM_BITS = 1 << 16  # filter size m; FP rate ~ (1 - e^{-kn/m})^k
BLOOM_K = 4  # hash functions per value

# The incremental-ingest staple: "which of today's doc ids did we
# already ingest?" answered without shuffling yesterday's id set —
# the filter is at most m rows (set bit positions) no matter how many
# ids went in, and filters built per shard/day merge by bit-OR (set
# union of the bit tables) into exactly the single-pass filter.
# Membership is one-sided: an inserted value is ALWAYS reported
# present (no false negatives); an absent value is reported present
# with probability ~(1 - e^{-kn/m})^k. Same portable salted-md5 cells
# as the CMS, so the bit table itself is deterministic and
# cross-engine oracle-checkable.


def _bloom_bits(col_expr, m_bits: int, k: int, salt: str):
    from ocr_spark.functions.hashing import md5_long

    v = F.coalesce(col_expr.cast("string"), F.lit(""))
    return F.array(
        *[
            (md5_long(F.concat(F.lit(f"{salt}:{i}:"), v)) % m_bits)
            for i in range(k)
        ]
    )


def bloom_build(
    df: DataFrame,
    col: str,
    m_bits: int = BLOOM_BITS,
    k: int = BLOOM_K,
    salt: str = "bloom:v1",
) -> DataFrame:
    """(bit,): the set bit positions of a Bloom filter over ``col`` —
    one scan (each value expands to ``k`` bits in-plan), one shuffle
    of at most ``m_bits`` groups with map-side partial dedup."""
    return (
        df.select(F.explode(_bloom_bits(F.col(col), m_bits, k, salt)).alias("bit"))
        .distinct()
    )


def bloom_merge(filters: DataFrame) -> DataFrame:
    """Merge shard bit tables by union — equals the single-pass
    filter EXACTLY (bit-OR is the Bloom merge).

    CALLER CONTRACT: same (m_bits, k, salt) for every input filter;
    the bit table carries no parameter metadata (same caveat as
    :func:`cms_merge`). Persist the parameters next to the filter."""
    return filters.select("bit").distinct()


def bloom_contains(
    bloom: DataFrame,
    df: DataFrame,
    col: str,
    m_bits: int = BLOOM_BITS,
    k: int = BLOOM_K,
    salt: str = "bloom:v1",
    out: str = "maybe_present",
) -> DataFrame:
    """(value, maybe_present): membership probes for the distinct
    values of ``df.col`` — true iff ALL ``k`` of the value's bits are
    set. Broadcast-friendly: the filter is at most ``m_bits`` rows, so
    the probe is a scan-stage broadcast join however large the probe
    side is. ``bloom`` must be a DISTINCT bit table (what
    :func:`bloom_build`/:func:`bloom_merge` emit) — duplicate bit rows
    would fan the count out and report false non-membership."""
    hashed = (
        df.select(F.col(col).alias("value"))
        .distinct()
        .select(
            "value",
            F.explode(_bloom_bits(F.col("value"), m_bits, k, salt)).alias("bit"),
        )
    )
    # left join + count of MATCHED bits (count of a non-null column),
    # grouped on the probe value itself — NULL probe values stay one
    # group, so no join-back on a NULL key is ever needed
    return (
        hashed.join(
            F.broadcast(bloom.select(F.col("bit").alias("_set_bit"))),
            hashed["bit"] == F.col("_set_bit"),
            "left",
        )
        .groupBy("value")
        .agg((F.count("_set_bit") == k).alias(out))
    )


def _bloom_bits_sql(value_expr: str, m_bits: int, k: int, salt: str) -> str:
    """DuckDB bit expression for row index ``r.i`` (0..k-1)."""
    from ocr_spark.functions.hashing import md5_long_sql

    s = salt.replace("'", "''")
    h = md5_long_sql(
        f"'{s}:' || CAST(r.i AS VARCHAR) || ':' || "
        f"coalesce(CAST({value_expr} AS VARCHAR), '')"
    )
    return f"{h} % {m_bits}"


def bloom_build_sql(
    values_source: str,
    m_bits: int = BLOOM_BITS,
    k: int = BLOOM_K,
    salt: str = "bloom:v1",
) -> str:
    """DuckDB twin of :func:`bloom_build`; ``values_source`` must
    yield one column named ``v``."""
    bit = _bloom_bits_sql("v", m_bits, k, salt)
    return f"""
      SELECT DISTINCT {bit} AS bit
      FROM {values_source} CROSS JOIN range(0, {k}) r(i)
    """


def bloom_contains_sql(
    build_source: str,
    probe_source: str,
    m_bits: int = BLOOM_BITS,
    k: int = BLOOM_K,
    salt: str = "bloom:v1",
    out: str = "maybe_present",
) -> str:
    """DuckDB twin of ``bloom_contains(bloom_build(build), probe)``;
    both sources must yield one column named ``v``."""
    bit = _bloom_bits_sql("v", m_bits, k, salt)
    return f"""
      WITH bloom AS (
        SELECT DISTINCT {bit} AS bit
        FROM {build_source} CROSS JOIN range(0, {k}) r(i)
      ),
      hashed AS (
        SELECT v AS value, {bit} AS bit
        FROM (SELECT DISTINCT v FROM {probe_source}) CROSS JOIN range(0, {k}) r(i)
      )
      SELECT h.value,
             count(b.bit) = {k} AS {out}
      FROM hashed h LEFT JOIN bloom b ON h.bit = b.bit
      GROUP BY h.value
    """


# ---------------------------------------------------------------------------
# mergeable quantile sketch (HDR-histogram binning, integer-exact)
# ---------------------------------------------------------------------------

HIST_SUB_BITS = 5  # sub-buckets per power of two; relative error <= 2^-5


def _hist_bin_expr(v: str, m: int) -> str:
    """Spark SQL: BIGINT -> histogram bin id. NULL and v <= 0 map to
    bin 0; small values 1 <= v < 2^(m+1) get UNIT bins (bin = v,
    exact — the standard HDR small-value regime; naively keeping the
    MSB in the sub-bits here double-counts 2^e in the representative,
    up to 100% error, the session-9 review catch); larger values map
    to ((e << m) | sub) + 1 with e = floor(log2 v) via
    length(bin(v)) - 1 (no libm: the binary-string length IS the
    exponent, identically in both engines) and sub = the m bits below
    the MSB. Bin ids are monotone in v: the first geometric bin
    (e = m + 1) starts at (m+1)·2^m + 1 > 2^(m+1) - 1, the last unit
    bin."""
    e = f"(length(bin({v})) - 1)"
    sub = f"(shiftright({v}, {e} - {m}) & {(1 << m) - 1})"
    return (
        f"CASE WHEN {v} IS NULL OR {v} <= 0 THEN CAST(0 AS BIGINT) "
        f"WHEN {v} < {1 << (m + 1)} THEN CAST({v} AS BIGINT) "
        f"ELSE CAST((({e} * {1 << m}) | {sub}) + 1 AS BIGINT) END"
    )


def _hist_bin_sql(v: str, m: int) -> str:
    """DuckDB twin of :func:`_hist_bin_expr`."""
    e = f"(length(bin({v})) - 1)"
    sub = f"((({v}) >> ({e} - {m})) & {(1 << m) - 1})"
    return (
        f"CASE WHEN {v} IS NULL OR {v} <= 0 THEN CAST(0 AS BIGINT) "
        f"WHEN {v} < {1 << (m + 1)} THEN CAST({v} AS BIGINT) "
        f"ELSE CAST((({e} * {1 << m}) | {sub}) + 1 AS BIGINT) END"
    )


def _hist_rep_expr(bin_col: str, m: int) -> str:
    """Bin id -> representative value (the bin's LOWER bound; exact
    for the unit-bin regime bin < 2^(m+1), where bin == value).
    Dialect-shared pure integer shifts."""
    b = f"({bin_col} - 1)"
    e = f"({b} div {1 << m})"
    sub = f"({b} % {1 << m})"
    return (
        f"CASE WHEN {bin_col} < {1 << (m + 1)} THEN CAST({bin_col} AS BIGINT) "
        f"ELSE CAST(shiftleft(CAST({1 << m} AS BIGINT) + {sub}, CAST({e} - {m} AS INT)) AS BIGINT) END"
    )


def _hist_rep_sql(bin_col: str, m: int) -> str:
    b = f"({bin_col} - 1)"
    e = f"({b} // {1 << m})"
    sub = f"({b} % {1 << m})"
    return (
        f"CASE WHEN {bin_col} < {1 << (m + 1)} THEN CAST({bin_col} AS BIGINT) "
        f"ELSE CAST((CAST({1 << m} AS BIGINT) + {sub}) << CAST({e} - {m} AS INT) AS BIGINT) END"
    )


def hist_sketch_build(
    df: DataFrame, col: str, sub_bits: int = HIST_SUB_BITS
) -> DataFrame:
    """(bin, n): the HDR-histogram quantile sketch of a non-negative
    BIGINT column — geometric bins with ``2^sub_bits`` linear
    sub-buckets per power of two, so any quantile estimate's relative
    error is <= 2^-sub_bits (~3% at the default 5).

    The mergeable complement to the exact nearest-rank percentile
    (olap.percentile_chars): exact mode needs the value multiset per
    group; this sketch is a FIXED <= (64 - sub_bits)·2^sub_bits + 1
    row table (~1.9k rows) no matter the data size, built with one
    map-side-partial shuffle, and per-shard/day sketches merge by bin
    addition into exactly the single-pass sketch. Binning is pure
    integer work — floor(log2 v) is the binary-string length, no
    libm — so sketch AND estimates are engine-exact and
    oracle-checkable (the CMS/Bloom discipline). NULLs and values
    <= 0 occupy the dedicated zero bin (rows are never dropped);
    values below 2^(sub_bits+1) get exact unit bins;
    counts/lengths/latencies are the intended domain."""
    return (
        df.selectExpr(
            f"{_hist_bin_expr(f'CAST({col} AS BIGINT)', sub_bits)} AS bin"
        )
        .groupBy("bin")
        .agg(F.count("*").alias("n"))
    )


def hist_sketch_merge(sketches: DataFrame) -> DataFrame:
    """Merge shard sketches by bin addition — equals the single-pass
    sketch EXACTLY. Same caller contract as cms_merge: all inputs
    must share sub_bits (the bin table carries no parameter
    metadata)."""
    return sketches.groupBy("bin").agg(F.sum("n").alias("n"))


def hist_quantiles(
    sketch: DataFrame,
    qs_permille: tuple = (500, 900, 990),
    sub_bits: int = HIST_SUB_BITS,
) -> DataFrame:
    """(q_permille, est): nearest-rank quantile estimates from the
    sketch — the first bin whose cumulative count reaches
    ceil(q·total), reported as the bin's lower-bound representative.

    Quantiles are permille INTEGERS so the rank threshold is the
    exact integer ceil-division ``(q·total + 999) div 1000`` — no
    float crosses the hash-compared path, and the operands stay
    NON-NEGATIVE because Spark's ``div`` truncates toward zero while
    DuckDB's ``//`` floors: the negate-and-divide ceil idiom silently
    disagrees between engines whenever q·total is not a multiple of
    1000 (caught by the error-bound test, not the divisible-total
    contract corpus). The sketch is localCheckpoint'ed
    (its lineage may be a corpus aggregation; cum and total both
    consume it — the fluency_buckets precedent), then everything runs
    at operator scale: the cumulative window and the q-to-bin
    inequality join touch <= ~1.9k bins x |qs| rows (the one
    sanctioned tiny-side nested loop, the contamination precedent)."""
    from pyspark.sql import Window

    for q in qs_permille:
        if not (0 < q <= 1000):
            raise ValueError(f"q_permille must be in (0, 1000], got {q}")
    sk = sketch.localCheckpoint()
    cum = sk.withColumn("cum", F.sum("n").over(Window.orderBy("bin")))
    total = sk.agg(F.sum("n").alias("total"))
    qs_df = sk.sparkSession.createDataFrame(
        [(int(q),) for q in qs_permille], "q_permille int"
    )
    ranks = qs_df.crossJoin(F.broadcast(total)).select(
        "q_permille", F.expr("(q_permille * total + 999) div 1000").alias("rank")
    )
    return (
        ranks.join(F.broadcast(cum), F.col("cum") >= F.col("rank"), "left")
        .groupBy("q_permille")
        .agg(F.min("bin").alias("bin"))
        .select(
            "q_permille",
            F.expr(_hist_rep_expr("bin", sub_bits)).alias("est"),
        )
    )


def hist_sketch_build_sql(
    values_source: str, sub_bits: int = HIST_SUB_BITS
) -> str:
    """DuckDB twin of :func:`hist_sketch_build`; ``values_source``
    must yield one BIGINT column ``v``."""
    return (
        f"SELECT {_hist_bin_sql('v', sub_bits)} AS bin, "
        f"CAST(count(*) AS BIGINT) AS n FROM ({values_source}) GROUP BY 1"
    )


def hist_quantiles_sql(
    sketch_sql: str,
    qs_permille: tuple = (500, 900, 990),
    sub_bits: int = HIST_SUB_BITS,
) -> str:
    """DuckDB twin of :func:`hist_quantiles` over a sketch subquery."""
    parts = []
    for q in qs_permille:
        if not (0 < q <= 1000):
            raise ValueError(f"q_permille must be in (0, 1000], got {q}")
        parts.append(
            f"SELECT CAST({q} AS INT) AS q_permille, "
            f"{_hist_rep_sql('bin', sub_bits)} AS est FROM ("
            f"SELECT min(bin) AS bin FROM cum "
            f"WHERE cum >= ({q} * total + 999) // 1000)"
        )
    union = " UNION ALL ".join(parts)
    return f"""
      WITH sk AS ({sketch_sql}),
      tot AS (SELECT sum(n) AS total FROM sk),
      cum AS (
        SELECT bin, sum(n) OVER (ORDER BY bin) AS cum, total
        FROM sk CROSS JOIN tot
      )
      {union}
    """


# ---------------------------------------------------------------------------
# bottom-k set sketch: pairwise source-overlap estimation
# ---------------------------------------------------------------------------

BOTTOMK_DEFAULT = 64


def source_overlap(
    docs: DataFrame, k: int = BOTTOMK_DEFAULT, group_col: str = "source"
) -> DataFrame:
    """(source_a, source_b, n_common, k_eff, est_jaccard_permille):
    estimated content Jaccard between every pair of sources — the
    "which feeds mirror each other" curation diagnostic (two crawls of
    the same site, a dataset repackaged under a new name) answered
    WITHOUT any cross-source document join.

    Method: bottom-k set sketch (Cohen & Kaplan 2007; the KMV sketch).
    Per source, keep the k smallest distinct 60-bit content hashes.
    For a pair (A, B), take the k smallest hashes of the sketch UNION
    and count how many belong to both sides: J(A, B) ~ n_common /
    k_eff. For a hash inside the union bottom-k, sketch membership
    equals SET membership (if h were in A but past A's k-th minimum,
    k smaller A-hashes would already fill the union bottom-k), so the
    estimator is the textbook one, and every arithmetic step is exact
    integers — engine-identical, oracle-checkable.

    Scale shape: ONE corpus-scale pass — distinct (source, hash) then
    a per-source bottom-k window (map-side WindowGroupLimit truncation,
    uniform hash ordering). Everything after runs on the sketch table
    (n_sources x k rows), which is localCheckpoint'ed once for its two
    plan references; the pair expansion is the sanctioned tiny-side
    self-join. NULL sources sketch normally but are excluded from the
    pair matrix (a '<' on NULL matches nothing, identically in both
    engines).
    """
    from pyspark.sql import Window

    from ocr_spark.functions.hashing import md5_long

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    per = (
        docs.select(
            F.col(group_col).alias("src"),
            md5_long(F.coalesce(F.col("text"), F.lit(""))).alias("h"),
        )
        .distinct()
    )
    w = Window.partitionBy("src").orderBy("h")
    sk = (
        per.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("src", "h")
        .localCheckpoint()
    )
    srcs = sk.select("src").distinct()
    pairs = (
        srcs.alias("a")
        .crossJoin(srcs.alias("b"))
        .where(F.col("a.src") < F.col("b.src"))
        .select(F.col("a.src").alias("sa"), F.col("b.src").alias("sb"))
    )
    ea = pairs.join(sk, F.col("src") == F.col("sa")).select(
        "sa", "sb", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b")
    )
    eb = pairs.join(sk, F.col("src") == F.col("sb")).select(
        "sa", "sb", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
    )
    u = (
        ea.unionByName(eb)
        .groupBy("sa", "sb", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w2 = Window.partitionBy("sa", "sb").orderBy("h")
    ub = u.withColumn("rk", F.row_number().over(w2)).where(F.col("rk") <= k)
    return (
        ub.groupBy("sa", "sb")
        .agg(
            F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_common"),
            F.count("*").cast("long").alias("k_eff"),
        )
        .select(
            F.col("sa").alias("source_a"),
            F.col("sb").alias("source_b"),
            "n_common",
            "k_eff",
            F.expr("(1000 * n_common) div k_eff").alias("est_jaccard_permille"),
        )
    )


def source_overlap_sql(
    table: str = "documents",
    k: int = BOTTOMK_DEFAULT,
    group_col: str = "source",
) -> str:
    """DuckDB twin of :func:`source_overlap`; ``table`` must carry
    (``group_col``, text)."""
    from ocr_spark.functions.hashing import md5_long_sql

    h = md5_long_sql("coalesce(text, '')")
    return f"""
      WITH per AS (
        SELECT DISTINCT {group_col} AS src, {h} AS h FROM {table}
      ),
      sk AS (
        SELECT src, h FROM (
          SELECT src, h, row_number() OVER (PARTITION BY src ORDER BY h) AS rk
          FROM per
        ) WHERE rk <= {k}
      ),
      srcs AS (SELECT DISTINCT src FROM sk),
      pairs AS (
        SELECT a.src AS sa, b.src AS sb FROM srcs a
        JOIN srcs b ON a.src < b.src
      ),
      u AS (
        SELECT sa, sb, h, max(in_a) AS in_a, max(in_b) AS in_b FROM (
          SELECT p.sa, p.sb, s.h, 1 AS in_a, 0 AS in_b
          FROM pairs p JOIN sk s ON s.src = p.sa
          UNION ALL
          SELECT p.sa, p.sb, s.h, 0 AS in_a, 1 AS in_b
          FROM pairs p JOIN sk s ON s.src = p.sb
        ) GROUP BY sa, sb, h
      ),
      ub AS (
        SELECT * FROM (
          SELECT sa, sb, in_a, in_b,
                 row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rk
          FROM u
        ) WHERE rk <= {k}
      )
      SELECT sa AS source_a, sb AS source_b,
             CAST(sum(in_a * in_b) AS BIGINT) AS n_common,
             CAST(count(*) AS BIGINT) AS k_eff,
             (1000 * CAST(sum(in_a * in_b) AS BIGINT)) // count(*)
               AS est_jaccard_permille
      FROM ub GROUP BY sa, sb
    """
