"""Product quantization: the memory-bounded ANN representation
(Jégou et al. 2011, public; the PQ half of the FAISS IVF-PQ standard).
Completes the repo's ANN family: brute cosine -> LSH/multi-probe ->
IVF (coarse cells) -> int8 (scalar quantization) -> PQ (vector
codebooks: 64 float32 dims -> M small codes — the baked books use
M=16 subspaces x 16 codes = sixteen 4-bit codes, a 32x compression —
which is what actually fits 10^12 vectors in cluster RAM).

- ``pq_encode``: per subspace, argmin squared-L2 against the frozen
  literal codebook — a pure scan-stage expression (no join, no
  shuffle), exactly like the trained-IVF assignment. At 100 TB this
  is the one full pass the index build costs.
- ``pq_adc_topk``: asymmetric distance computation — the query stays
  RAW (broadcast, tiny) and the database side is codes-only; the
  distance is the sum over subspaces of squared-L2 between the
  query's subvector and the centroid its neighbor's code names.
  Ranking shuffles only (query_id, neighbor_id, dist) rows.

Codebooks are trained offline on a SAMPLE (scripts/
train_pq_codebooks.py, FAISS practice) and baked as literals —
a frozen input artifact like the IVF centroids, so the Spark
expression and the DuckDB twin share bit-identical tables. All
distance folds are the repo's sequential left-fold convention, so
argmin/rank decisions agree across engines exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ocr_spark.functions.text import floor6, floor6_sql

# the repo's ONE literal-double-array rendering convention (keeps the
# Spark expression and the DuckDB twin bit-identical) lives in
# similarity.py — reuse it, never re-render
from ocr_spark.functions.similarity import _plane_lit_sql as _cent_lit_sql

N_QUERIES = 5
TOP_K = 10


def _dims(codebooks: list[list[list[float]]]) -> tuple[int, int, int]:
    m = len(codebooks)
    k = len(codebooks[0])
    ds = len(codebooks[0][0])
    if any(len(b) != k for b in codebooks) or any(
        len(c) != ds for b in codebooks for c in b
    ):
        raise ValueError("ragged codebooks")
    return m, k, ds


def _l2_sql(sub: str, cent_lit: str, ds: int) -> str:
    """DuckDB twin: same left fold over the same element order."""
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, {ds + 1}), i -> "
        f"(CAST(({sub})[i] AS DOUBLE) - ({cent_lit})[i]) * "
        f"(CAST(({sub})[i] AS DOUBLE) - ({cent_lit})[i]))), (acc, v) -> acc + v)"
    )


def _l2_col(sub, cent):
    """Spark Column: sequential-fold squared L2 between a slice column
    and a centroid (a python list -> ONE Literal node via ``F.lit``,
    never k*ds rendered CAST expressions — string-rendered literal
    arrays blow whole-stage codegen up, measured 4.5x slower on the
    encode pass — or an already-bound Column such as a HOF lambda
    variable); the fold order and values are identical either way."""
    if not isinstance(cent, Column):
        cent = F.lit(cent)
    return F.aggregate(
        F.zip_with(
            sub, cent, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
        ),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _codes_col(codebooks, vec: str = "embedding"):
    """Spark Column: array<int> of per-subspace argmin codes (ties ->
    lowest code, via array_position-of-min).

    The k per-code distances come from ONE ``transform`` over the
    subspace codebook bound as a single array<array<double>> literal —
    not k separately-built fold expressions. Same values, same order,
    but the expression tree (and the generated code) is k times
    smaller, which cuts the driver-side plan build from ~5 s to well
    under a second per query at k=16 and shrinks the janino compile
    the first execution pays."""
    m, k, ds = _dims(codebooks)
    per_sub = []
    for mi in range(m):
        sub = F.slice(F.col(vec), mi * ds + 1, ds)
        dists = F.transform(F.lit(codebooks[mi]), lambda cent: _l2_col(sub, cent))
        per_sub.append(
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
        )
    return F.array(*per_sub)


def _codes_sql(codebooks, vec: str = "embedding") -> str:
    m, k, ds = _dims(codebooks)
    per_sub = []
    for mi in range(m):
        sub = f"{vec}[{mi * ds + 1}:{mi * ds + ds}]"
        dists = "[" + ", ".join(
            _l2_sql(sub, _cent_lit_sql(codebooks[mi][ci]), ds) for ci in range(k)
        ) + "]"
        per_sub.append(
            f"CAST(list_position({dists}, list_min({dists})) - 1 AS INT)"
        )
    return "[" + ", ".join(per_sub) + "]"


def pq_encode(emb: DataFrame, codebooks: list[list[list[float]]]) -> DataFrame:
    """(vec_id, codes): each vector compressed to M per-subspace
    codebook codes — the PQ index build, a scan-stage expression."""
    return emb.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        _codes_col(codebooks).alias("codes"),
    )


def pq_encode_sql(
    codebooks: list[list[list[float]]], table: str = "embeddings"
) -> str:
    """DuckDB twin of :func:`pq_encode`."""
    return (
        f"SELECT CAST(vec_id AS BIGINT) AS vec_id, "
        f"{_codes_sql(codebooks)} AS codes FROM {table}"
    )


def _dtab_col(codebooks, vec: str = "q_emb"):
    """Spark Column, array<array<double>>: the classic ADC precompute
    — per subspace, the squared-L2 from the query's subvector to
    EVERY code's centroid. m*k folds per QUERY; each candidate pair
    then costs m array lookups instead of m folds."""
    m, k, ds = _dims(codebooks)
    subs = []
    for mi in range(m):
        sub = F.slice(F.col(vec), mi * ds + 1, ds)
        # one transform over the literal codebook per subspace (see
        # _codes_col) — k-fold smaller tree, identical values/order
        subs.append(
            F.transform(F.lit(codebooks[mi]), lambda cent: _l2_col(sub, cent))
        )
    return F.array(*subs)


def _dtab_sql(codebooks, vec: str = "embedding") -> str:
    m, k, ds = _dims(codebooks)
    subs = []
    for mi in range(m):
        sub = f"{vec}[{mi * ds + 1}:{mi * ds + ds}]"
        subs.append(
            "[" + ", ".join(
                _l2_sql(sub, _cent_lit_sql(codebooks[mi][ci]), ds) for ci in range(k)
            ) + "]"
        )
    return "[" + ", ".join(subs) + "]"


def _adc_dist_expr(m: int) -> str:
    """Per-pair ADC distance: m nested-array lookups into the query's
    dtab, summed in subspace order (identical to the hoisted folds)."""
    return "(" + " + ".join(
        f"element_at(element_at(dtab, {mi + 1}), codes[{mi}] + 1)" for mi in range(m)
    ) + ")"


def _adc_dist_sql(m: int, q: str = "q", c: str = "c") -> str:
    return "(" + " + ".join(
        f"{q}.dtab[{mi + 1}][{c}.codes[{mi + 1}] + 1]" for mi in range(m)
    ) + ")"


def pq_adc_topk(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
) -> DataFrame:
    """(query_id, neighbor_id, rank, dist): ADC top-k — raw query vs
    PQ-coded database. dist is the PQ approximation of squared L2
    (sum over subspaces of ||q_sub - centroid[code]||^2), computed as
    distance-TABLE lookups (``_dtab_col``); ties rank by neighbor_id
    so both engines agree."""
    m, _, _ = _dims(codebooks)
    coded = pq_encode(emb, codebooks)
    q = (
        emb.select(
            F.col("vec_id").cast("long").alias("query_id"),
            F.col("embedding").alias("q_emb"),
        )
        .where(F.col("query_id") < n_queries)
        .select("query_id", _dtab_col(codebooks).alias("dtab"))
    )
    dist = _adc_dist_expr(m)
    pairs = (
        F.broadcast(q)
        .join(coded, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.expr(dist).alias("dist_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("dist_raw"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "rank", floor6(F.col("dist_raw")).alias("dist")
        )
    )


def pq_adc_topk_sql(
    codebooks: list[list[list[float]]],
    table: str = "embeddings",
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
) -> str:
    """DuckDB twin of :func:`pq_adc_topk` — same code argmins, same
    hoisted distance tables and lookup sum, same (dist, neighbor_id)
    tie-break."""
    m, _, _ = _dims(codebooks)
    dist = _adc_dist_sql(m)
    return f"""
      WITH coded AS ({pq_encode_sql(codebooks, table)}),
      q AS (
        SELECT CAST(vec_id AS BIGINT) AS query_id,
               {_dtab_sql(codebooks)} AS dtab
        FROM {table} WHERE CAST(vec_id AS BIGINT) < {n_queries}
      ),
      pairs AS (
        SELECT q.query_id, c.vec_id AS neighbor_id, {dist} AS dist_raw
        FROM q JOIN coded c ON c.vec_id <> q.query_id
      ),
      ranked AS (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY dist_raw ASC, neighbor_id ASC) AS rank,
               dist_raw
        FROM pairs
      )
      SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
             {floor6_sql('dist_raw')} AS dist
      FROM ranked WHERE rank <= {k}
    """


def pq_encode_flat(
    emb: DataFrame, codebooks: list[list[list[float]]]
) -> DataFrame:
    """(vec_id, subspace, code): pq_encode with the codes array
    flattened — the contract-query shape (the driver's value-hash
    compares scalars)."""
    return pq_encode(emb, codebooks).select(
        "vec_id", F.posexplode("codes").alias("subspace", "code")
    )


def pq_encode_flat_sql(
    codebooks: list[list[list[float]]], table: str = "embeddings"
) -> str:
    """DuckDB twin of :func:`pq_encode_flat` (unnest WITH ORDINALITY
    is 1-based; subspace matches Spark's 0-based posexplode)."""
    return f"""
      SELECT vec_id, CAST(u.i - 1 AS INT) AS subspace, CAST(codes[u.i] AS INT) AS code
      FROM ({pq_encode_sql(codebooks, table)}),
           LATERAL unnest(generate_series(1, {len(codebooks)})) AS u(i)
    """


def ivfpq_topk(
    emb: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
) -> DataFrame:
    """(query_id, neighbor_id, rank, dist): IVF-PQ — the FAISS index
    composition. The coarse quantizer (trained spherical-k-means
    cells, shared with ivf_topk) prunes candidates to the query's own
    cell (nprobe=1); PQ asymmetric distance ranks within it.

    This is the shape that searches 10^12 vectors: candidates per
    query ~ n/cells instead of n, each candidate costing an M-term
    table lookup instead of a 64-dim float scan. One scan computes
    BOTH quantizations (cell argmax + code argmins are expressions
    over the same row — no self-join); the probe join is centroid-equi
    with the tiny query side broadcast.
    """
    from ocr_spark.functions.similarity import _assignments

    m, _, _ = _dims(codebooks)
    # materialize the index frame once (lsh_verified_pairs
    # precedent): it feeds the candidate side of every probe, and a
    # live lineage re-evaluates the interpreted argmax + code exprs
    # per plan reference — worse, join null-safety pushes
    # isnotnull(<argmax expr>) below the repartition into the
    # single-split scan task. At 100 TB the IVF-PQ index is a stored
    # table; this models exactly that — and like a real PQ index it
    # stores ONLY (vec_id, centroid, codes), never the raw vectors
    # (keeping embedding would make it ~32x larger than the codes).
    coded = _assignments(emb, len(centroids), centroids).select(
        "vec_id",
        "centroid",
        _codes_col(codebooks).alias("codes"),
    ).localCheckpoint()
    # the query side re-derives its cell + distance tables from the
    # RAW n_queries rows (the vec_id filter pushes into the scan, so
    # the interpreted argmax runs on n_queries rows, not the corpus)
    q = _assignments(
        emb.where(F.col("vec_id") < n_queries), len(centroids), centroids
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("centroid").alias("q_centroid"),
        _dtab_col(codebooks, vec="embedding").alias("dtab"),
    )
    dist = _adc_dist_expr(m)
    pairs = (
        F.broadcast(q)
        .join(
            coded,
            (F.col("centroid") == F.col("q_centroid"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.expr(dist).alias("dist_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("dist_raw"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "rank", floor6(F.col("dist_raw")).alias("dist")
        )
    )


def ivfpq_topk_sql(
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    table: str = "embeddings",
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
) -> str:
    """DuckDB twin of :func:`ivfpq_topk` — cell assignment via the
    shared similarity.trained_assigned_sql argmax, same hoisted ADC
    distance tables as pq_adc_topk_sql, same (dist, neighbor_id)
    tie-break."""
    from ocr_spark.functions.similarity import trained_assigned_sql

    m, _, _ = _dims(codebooks)
    dist = _adc_dist_sql(m)
    return f"""
      WITH coded AS (
        SELECT vec_id, embedding, centroid,
               {_codes_sql(codebooks)} AS codes
        FROM {trained_assigned_sql(centroids, table)} t
      ),
      q AS (
        SELECT vec_id AS query_id, centroid AS q_centroid,
               {_dtab_sql(codebooks)} AS dtab
        FROM coded WHERE vec_id < {n_queries}
      ),
      pairs AS (
        SELECT q.query_id, c.vec_id AS neighbor_id, {dist} AS dist_raw
        FROM q JOIN coded c
          ON c.centroid = q.q_centroid AND c.vec_id <> q.query_id
      ),
      ranked AS (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY dist_raw ASC, neighbor_id ASC) AS rank,
               dist_raw
        FROM pairs
      )
      SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
             {floor6_sql('dist_raw')} AS dist
      FROM ranked WHERE rank <= {k}
    """


def _probe_base(emb: DataFrame, centroids, n_queries: int | None):
    """Query-side frame (query_id, embedding, _u) with the unit
    vector hoisted as a column — shared by the nprobe cell ranking.
    ``n_queries=None`` keeps every row (the stored-index search path,
    where the input IS the query batch). Fold arithmetic is identical
    to similarity._assignments' argmax (normalize first, THEN fold)."""
    from ocr_spark.functions.similarity import _norm_expr

    if n_queries is not None:
        emb = emb.where(F.col("vec_id") < n_queries)
    base = emb.select(
        F.col("vec_id").cast("long").alias("query_id"),
        F.col("embedding"),
        F.expr(_norm_expr("embedding")).alias("norm"),
    )
    unit = F.transform(F.col("embedding"), lambda x: x.cast("double") / F.col("norm"))
    return base.withColumn("_u", unit)


def _probe_cells_col(centroids, nprobe: int):
    """array<bigint>: the query's top-nprobe cell ids by unit-dot.
    Ranking key is (-dot, cell_id) ascending — double negation is
    IEEE-exact, so nprobe=1 reproduces the argmax (max dot, ties ->
    lowest id) bit-for-bit in both engines."""
    folds = [
        F.aggregate(
            F.zip_with(
                F.col("_u"), F.lit(c), lambda x, y: x.cast("double") * y.cast("double")
            ),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
        for c in centroids
    ]
    cand = F.array(*[
        F.struct((-folds[i]).alias("d"), F.lit(i).cast("long").alias("c"))
        for i in range(len(centroids))
    ])
    return F.transform(F.slice(F.array_sort(cand), 1, nprobe), lambda s: s["c"])


def ivfpq_nprobe_topk(
    emb: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    nprobe: int = 2,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
) -> DataFrame:
    """(query_id, neighbor_id, rank, dist): IVF-PQ with multi-cell
    probing — the standard FAISS recall knob. Candidates come from
    the query's top-``nprobe`` cells by centroid cosine instead of
    only the argmax cell, repairing the recall lost to vectors that
    sit just across a cell boundary; candidate count is
    ~nprobe*n/cells, still never the corpus. ``nprobe=1`` returns
    exactly :func:`ivfpq_topk`'s output.

    A vector belongs to exactly one cell and probe cells are
    distinct, so no candidate is scored twice — no dedup needed.
    """
    if not 1 <= nprobe <= len(centroids):
        raise ValueError("nprobe must satisfy 1 <= nprobe <= n_centroids")
    from ocr_spark.functions.similarity import _assignments

    m, _, _ = _dims(codebooks)
    coded = _assignments(emb, len(centroids), centroids).select(
        "vec_id",
        "centroid",
        _codes_col(codebooks).alias("codes"),
    ).localCheckpoint()
    q = _probe_base(emb, centroids, n_queries).select(
        "query_id",
        _dtab_col(codebooks, vec="embedding").alias("dtab"),
        F.explode(_probe_cells_col(centroids, nprobe)).alias("q_centroid"),
    )
    dist = _adc_dist_expr(m)
    pairs = (
        F.broadcast(q)
        .join(
            coded,
            (F.col("centroid") == F.col("q_centroid"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.expr(dist).alias("dist_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("dist_raw"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "rank", floor6(F.col("dist_raw")).alias("dist")
        )
    )


def ivfpq_nprobe_topk_sql(
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    nprobe: int = 2,
    table: str = "embeddings",
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
) -> str:
    """DuckDB twin of :func:`ivfpq_nprobe_topk` — same (-dot, cell)
    probe ranking, same shared-argmax candidate cells, same ADC
    tables and tie-breaks."""
    if not 1 <= nprobe <= len(centroids):
        raise ValueError("nprobe must satisfy 1 <= nprobe <= n_centroids")
    from ocr_spark.functions.similarity import (
        _dot_sql,
        _norm_sql,
        _plane_lit_sql,
        trained_assigned_sql,
    )

    m, _, _ = _dims(codebooks)
    dim = len(centroids[0])
    unit = (
        f"list_transform(range(1, {dim + 1}), "
        f"i -> CAST(embedding[i] AS DOUBLE) / {_norm_sql('embedding', dim)})"
    )
    cand = "[" + ", ".join(
        "{'d': -(" + _dot_sql("u", _plane_lit_sql(c), dim) + f"), 'c': CAST({i} AS BIGINT)}}"
        for i, c in enumerate(centroids)
    ) + "]"
    cells = f"list_transform(list_sort({cand})[1:{nprobe}], s -> s.c)"
    dist = _adc_dist_sql(m)
    return f"""
      WITH coded AS (
        SELECT vec_id, centroid, {_codes_sql(codebooks)} AS codes
        FROM {trained_assigned_sql(centroids, table)} t
      ),
      qbase AS (
        SELECT CAST(vec_id AS BIGINT) AS query_id, embedding, {unit} AS u
        FROM {table} WHERE CAST(vec_id AS BIGINT) < {n_queries}
      ),
      qcells AS (
        SELECT query_id, {_dtab_sql(codebooks)} AS dtab, {cells} AS cells
        FROM qbase
      ),
      q AS (
        SELECT query_id, dtab, p.cell AS q_centroid
        FROM qcells, LATERAL unnest(cells) AS p(cell)
      ),
      pairs AS (
        SELECT q.query_id, c.vec_id AS neighbor_id, {dist} AS dist_raw
        FROM q JOIN coded c
          ON c.centroid = q.q_centroid AND c.vec_id <> q.query_id
      ),
      ranked AS (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY dist_raw ASC, neighbor_id ASC) AS rank,
               dist_raw
        FROM pairs
      )
      SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
             {floor6_sql('dist_raw')} AS dist
      FROM ranked WHERE rank <= {k}
    """


def build_ivfpq_index(
    emb: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
) -> DataFrame:
    """(vec_id, centroid, codes): the persistable IVF-PQ index rows —
    one scan computes both quantizations. Write with
    ``.partitionBy("centroid")`` so stored-index probes
    partition-prune (see :func:`search_ivfpq_index`)."""
    from ocr_spark.functions.similarity import _assignments

    _dims(codebooks)
    return _assignments(emb, len(centroids), centroids).select(
        "vec_id", "centroid", _codes_col(codebooks).alias("codes")
    )


def search_ivfpq_index(
    index: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    nprobe: int = 1,
    k: int = TOP_K,
) -> DataFrame:
    """(query_id, neighbor_id, rank, dist): probe a PERSISTED IVF-PQ
    index (the build_ivfpq_index layout) with a batch of raw query
    vectors ``(vec_id, embedding)``.

    The query batch's probe-cell union is collected driver-side (a
    query batch is small by definition — nprobe cells per query, at
    most n_centroids values) and applied as a filter BEFORE the probe
    join: on a centroid-partitioned parquet/Iceberg index that is a
    partition filter, so the scan touches only the probed cells'
    files and the corpus-sized remainder is never read. This is the
    read-side payoff of storing the index partitioned by cell.
    """
    if not 1 <= nprobe <= len(centroids):
        raise ValueError("nprobe must satisfy 1 <= nprobe <= n_centroids")
    m, _, _ = _dims(codebooks)
    q = _probe_base(queries, centroids, None).select(
        "query_id",
        _dtab_col(codebooks, vec="embedding").alias("dtab"),
        F.explode(_probe_cells_col(centroids, nprobe)).alias("q_centroid"),
    ).localCheckpoint()
    probe_cells = [r.q_centroid for r in q.select("q_centroid").distinct().collect()]
    pruned = index.where(F.col("centroid").isin(probe_cells))
    dist = _adc_dist_expr(m)
    pairs = (
        F.broadcast(q)
        .join(
            pruned,
            (F.col("centroid") == F.col("q_centroid"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.expr(dist).alias("dist_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("dist_raw"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "rank", floor6(F.col("dist_raw")).alias("dist")
        )
    )
