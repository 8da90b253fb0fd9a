"""Link-graph PageRank for crawl/corpus prioritization.

A web-scale curation pipeline ranks domains/pages by link authority
to decide crawl frontier priority and per-source training-mix weight.
This module implements power-iteration PageRank as a DataFrame loop —
the one genuinely iterative algorithm in the repo besides k-means
(`ivf_centroids.py`) and connected components (`dedup.py`), and it
follows the same two disciplines those two established:

1. **Exact integer arithmetic.** Ranks are fixed-point BIGINTs at
   scale ``rank_scale(N) = max(10^12, N * 10^6)`` — the scale grows
   with the node count so every node always holds >= 10^6 rank units
   (see :func:`rank_scale`). Every step is integer multiply / integer
   div / integer sum, so the result is independent of partition
   count, task scheduling, and engine (float sums are
   order-dependent; integer sums are not). The DuckDB oracle twin is
   the same recurrence unrolled into chained CTEs — bit-equal.
2. **Bounded lineage.** Each iteration ends in ``localCheckpoint()``
   (eager), so the plan never accretes k joins deep and a lost
   executor replays at most one iteration.

Both variants share ONE recurrence; the seeded (personalized) form
just restricts where teleport and dangling mass land. With S =
rank_scale(N), T = the teleport target set (all nodes for the
uniform variant, the seed set for the personalized one), k = |T|,
all ops integer:

    r0(v)   = S div N
    out(u)  = multi-edge out-degree
    c(e)    = r(src(e)) div out(src(e))          per edge
    in(v)   = sum of c(e) over in-edges           exact BIGINT sum
    dang    = sum of r(u) over out-degree-0 nodes (operator-scale
              scalar: ONE bigint collected per iteration)
    r'(v)   = [v in T] * (15*S) div (100*k)
              + (85 * (in(v) + [v in T] * (dang div k))) div 100

Scale shape per iteration: one hash join ranks⋈edges on src (edges
carry their out-degree from a one-time prep join, so the loop body is
join + partial-agg sum on dst + left join back onto the node set —
two shuffles on uniform integer/string keys). At 100 TB the edge
table should be bucketed by src so the per-iteration join is
co-located; ranks are tiny relative to edges (one row per node).

Node ids are ID-TYPE-AGNOSTIC (int or string — no casts, the same
contract as the dedup layer).

Reference analog: none — the reference is a single-corpus OCR app.
This is part of the beyond-reference training-data surface
(SURVEY.md §2 "LLM-data-pipeline operators").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12  # fixed-point floor (small graphs)
PER_NODE_SCALE = 10**6  # fixed-point units GUARANTEED per node
D_NUM, D_DEN = 85, 100  # damping 0.85 as an exact rational


def rank_scale(n_nodes: int) -> int:
    """Fixed-point scale for an ``n_nodes`` graph.

    A constant scale dies at web scale: with 10^10 nodes a 10^12
    scale gives each node ~100 rank units, so any out-degree above
    ~100 truncates ``rank div out`` to zero and authority collapses
    to teleport noise. Scaling with N keeps >= PER_NODE_SCALE units
    per node — contributions stay non-zero up to out-degree ~10^6,
    and per-edge truncation error stays ~1e-6 of a node's rank.
    Overflow bound: the recurrence computes 85 * scale, so BIGINT
    holds up to n_nodes ~ 1e11 (scale 1e17) — raise PER_NODE_SCALE
    awareness before going beyond.
    """
    return max(SCALE, n_nodes * PER_NODE_SCALE)


def _lit_spark(v) -> str:
    """Spark SQL literal (backslash is an ESCAPE character in Spark's
    string literals — unlike DuckDB — so it must be doubled too)."""
    if isinstance(v, str):
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    return str(int(v))


def _lit_sql(v) -> str:
    """DuckDB literal (single-quote doubling; backslash is literal)."""
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return str(int(v))


def _power_iteration(
    edges: DataFrame, iters: int, seeds: list | None
) -> DataFrame:
    """Shared driver for both variants (seeds=None = uniform)."""
    if iters < 0:
        raise ValueError("iters must be >= 0")
    if seeds is not None and not seeds:
        raise ValueError("seeds must be non-empty")
    edges = edges.select("src", "dst")

    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    # N is a single scalar — the same operator-scale driver traffic
    # as the k-means centroid collect (similarity.py).
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.withColumn("rank", F.lit(0).cast("long"))

    if seeds is None:
        pred = None
        k = n_nodes
    else:
        pred = "node IN (" + ", ".join(_lit_spark(v) for v in seeds) + ")"
        k = nodes.where(F.expr(pred)).count()
        if k == 0:
            raise ValueError("no seed is present in the graph")

    # one-time prep: out-degree stitched onto every edge so the loop
    # body never recomputes it
    outdeg = edges.groupBy("src").agg(F.count("*").alias("out"))
    edges_w = edges.join(outdeg, "src").localCheckpoint()
    # static dangling node set (out-degree 0 = never appears as src)
    dangling_nodes = nodes.join(
        edges.select("src").distinct(),
        nodes["node"] == F.col("src"),
        "left_anti",
    ).localCheckpoint()

    scale = rank_scale(n_nodes)
    teleport = (D_DEN - D_NUM) * scale // (D_DEN * k)

    def _rank_expr(dang_share: int) -> str:
        in_term = "coalesce(in_sum, CAST(0 AS BIGINT))"
        if pred is None:
            return (
                f"CAST({teleport} + ({D_NUM} * ({in_term} + {dang_share}))"
                f" div {D_DEN} AS BIGINT)"
            )
        return (
            f"CAST(CASE WHEN {pred} THEN {teleport} ELSE 0 END"
            f" + ({D_NUM} * ({in_term}"
            f" + CASE WHEN {pred} THEN {dang_share} ELSE 0 END))"
            f" div {D_DEN} AS BIGINT)"
        )

    ranks = nodes.withColumn("rank", F.lit(scale // n_nodes).cast("long"))
    for _ in range(iters):
        dang = (
            dangling_nodes.join(ranks, "node")
            .agg(F.sum("rank").alias("m"))
            .collect()[0]["m"]
            or 0
        )
        contribs = (
            edges_w.join(ranks, edges_w["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr("rank div out").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .selectExpr("node", _rank_expr(dang // k) + " AS rank")
            .localCheckpoint()
        )
    return ranks


def pagerank(edges: DataFrame, iters: int = 3) -> DataFrame:
    """(node, rank): fixed-point PageRank after ``iters`` power
    iterations over ``edges(src, dst)``. Multi-edges count with
    multiplicity; nodes = distinct(src) ∪ distinct(dst); nodes with
    no out-edges contribute their mass uniformly (dangling
    redistribution).
    """
    return _power_iteration(edges, iters, None)


def personalized_pagerank(
    edges: DataFrame, seeds: list, iters: int = 3
) -> DataFrame:
    """(node, rank): topic-sensitive PageRank — the teleport mass (and
    dangling mass) goes ONLY to the ``seeds`` instead of uniformly to
    every node, so rank measures proximity to a trusted set. The
    curation use: seed with known-good domains, rank the crawl
    frontier by authority FLOW from them (TrustRank-style).

    Seeds are passed as literal values (operator-scale — a seed set
    is hundreds of domains, not a table); values must match the node
    id type. Seeds absent from the graph are ignored; if NONE is
    present the operator raises (a k=0 teleport is undefined).
    """
    return _power_iteration(edges, iters, seeds)


def _pagerank_sql_impl(
    edges_source: str, iters: int, seeds: list | None
) -> str:
    """Shared CTE generator (seeds=None = uniform twin)."""
    if iters < 0:
        raise ValueError("iters must be >= 0")
    if seeds is not None and not seeds:
        raise ValueError("seeds must be non-empty")
    scale = f"greatest({SCALE}, (SELECT n FROM nn) * {PER_NODE_SCALE})"
    ctes = [
        f"e AS (SELECT src, dst FROM {edges_source})",
        "nodes AS (SELECT DISTINCT node FROM"
        " (SELECT src AS node FROM e UNION ALL SELECT dst FROM e))",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        "outdeg AS (SELECT src, count(*) AS out FROM e GROUP BY src)",
        # NOT EXISTS, not NOT IN: a NULL src in the edge list must not
        # empty the dangling set (left_anti parity with the Spark side)
        "dangset AS (SELECT node FROM nodes WHERE NOT EXISTS"
        " (SELECT 1 FROM e WHERE e.src = nodes.node))",
        f"r0 AS (SELECT node, CAST({scale} // (SELECT n FROM nn) AS BIGINT)"
        " AS rank FROM nodes)",
    ]
    if seeds is None:
        pred = None
        k = "(SELECT n FROM nn)"
    else:
        seed_list = ", ".join(_lit_sql(v) for v in seeds)
        pred = f"nodes.node IN ({seed_list})"
        # error() mirrors the Spark side's ValueError when no seed is
        # in the graph — without it the k=0 teleport would surface as
        # an unexplained division-by-zero
        ctes.append(
            "sk AS (SELECT CASE WHEN count(*) = 0 THEN"
            " CAST(error('no seed is present in the graph') AS BIGINT)"
            f" ELSE count(*) END AS k FROM nodes WHERE node IN ({seed_list}))"
        )
        k = "(SELECT k FROM sk)"
    tele = f"(({D_DEN - D_NUM} * {scale}) // ({D_DEN} * {k}))"

    prev = "r0"
    for i in range(1, iters + 1):
        cur = f"r{i}"
        ctes.append(
            f"d{i} AS (SELECT CAST(coalesce(sum(r.rank), 0) AS BIGINT) AS m"
            f" FROM {prev} r JOIN dangset USING (node))"
        )
        ctes.append(
            f"i{i} AS (SELECT e.dst AS node,"
            f" CAST(sum(r.rank // o.out) AS BIGINT) AS in_sum"
            f" FROM e JOIN {prev} r ON e.src = r.node"
            f" JOIN outdeg o ON e.src = o.src GROUP BY e.dst)"
        )
        in_term = "coalesce(i.in_sum, CAST(0 AS BIGINT))"
        dang_share = f"(SELECT m FROM d{i}) // {k}"
        if pred is None:
            body = f"{tele} + ({D_NUM} * ({in_term} + {dang_share})) // {D_DEN}"
        else:
            body = (
                f"CASE WHEN {pred} THEN {tele} ELSE 0 END"
                f" + ({D_NUM} * ({in_term}"
                f" + CASE WHEN {pred} THEN {dang_share} ELSE 0 END))"
                f" // {D_DEN}"
            )
        ctes.append(
            f"{cur} AS (SELECT nodes.node, CAST({body} AS BIGINT) AS rank"
            f" FROM nodes LEFT JOIN i{i} i ON nodes.node = i.node)"
        )
        prev = cur
    return "WITH " + ",\n".join(ctes) + f"\nSELECT node, rank FROM {prev}"


def pagerank_sql(edges_source: str, iters: int = 3) -> str:
    """DuckDB twin of :func:`pagerank`: the identical integer
    recurrence unrolled into ``iters`` chained CTEs.

    ``edges_source`` must be a parenthesized subquery or table name
    yielding (src, dst). DuckDB's sum(BIGINT) returns HUGEINT, so
    every sum is cast back to BIGINT before further integer math —
    values are bounded by rank_scale(N) (<= ~1e17 within the
    documented n_nodes ~ 1e11 bound), so the cast is lossless.
    """
    return _pagerank_sql_impl(edges_source, iters, None)


def personalized_pagerank_sql(
    edges_source: str, seeds: list, iters: int = 3
) -> str:
    """DuckDB twin of :func:`personalized_pagerank` (seed-count k is
    computed in-query; if NO seed is present the query raises via
    DuckDB's error(), matching the Spark side's ValueError)."""
    return _pagerank_sql_impl(edges_source, iters, seeds)


# ---------------------------------------------------------------------------
# triangle counting (degree-ordered orientation)
# ---------------------------------------------------------------------------


def _simple_graph(edges: DataFrame, src: str, dst: str):
    """(und, deg): the undirected simple graph (self-loops dropped,
    direction/multiplicity collapsed to canonical a < b pairs) and
    its degree table — ONE definition shared by triangle_counts and
    clustering_coefficients so their degree semantics cannot
    drift."""
    e = edges.select(
        F.col(src).alias("_a"), F.col(dst).alias("_b")
    ).where("_a IS NOT NULL AND _b IS NOT NULL AND _a <> _b")
    und = e.selectExpr(
        "least(_a, _b) AS a", "greatest(_a, _b) AS b"
    ).distinct()
    deg = (
        und.selectExpr("a AS v")
        .unionAll(und.selectExpr("b AS v"))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    return und, deg


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(node, n_triangles): per-node triangle participation over the
    UNDIRECTED simple graph induced by ``edges`` (self-loops dropped,
    direction and multiplicity collapsed). Nodes in no triangle emit
    no row; the global triangle count is ``sum(n_triangles) / 3``.
    Completes the graph family: PageRank (authority), connected
    components (dedup.py — reachability), triangles (local clustering
    — the community-density signal link-spam detection keys on).

    Engine mapping — the degree-ordered orientation algorithm: orient
    every undirected edge from its lower to its higher endpoint under
    the total order rho(v) = (degree(v), v). Every triangle
    x < y < z (by rho) then has exactly ONE wedge at its minimum
    vertex (x -> y, x -> z) whose closing edge (y -> z) is also
    oriented — so triangles = wedges joined against the oriented edge
    set, each counted once, no division by 6.

    Scale shape: the orientation IS the skew defense — a hub of
    degree d keeps only its neighbors of HIGHER (degree, id), so
    oriented out-degree is bounded by O(sqrt(m)) and the wedge
    self-join is O(m^1.5) total instead of sum(d^2) (a single
    10^7-degree hub never builds 10^14 wedges). All joins are
    equi-joins on node keys: distinct + degree aggregate (two
    uniform shuffles), two degree-attach joins, the wedge self-join
    on the oriented source, and the closure equi-join on (lo, hi).
    Node ids are ID-TYPE-AGNOSTIC (no casts — int or string, the
    dedup-layer contract); rho ties break on the id itself,
    deterministic in both engines.
    """
    und, deg = _simple_graph(edges, src, dst)
    return _triangles(und, deg)


def _triangles(und: DataFrame, deg: DataFrame) -> DataFrame:
    """Triangle machinery over a prepared simple graph — shared so
    clustering_coefficients reuses one (und, deg) computation instead
    of re-scanning the edge table."""
    j = (
        und.join(deg.selectExpr("v AS a", "d AS da"), "a")
        .join(deg.selectExpr("v AS b", "d AS db"), "b")
    )
    a_first = "(da < db OR (da = db AND a < b))"
    # dhi only: the wedge tie-break needs the HI endpoint's degree; the
    # lo side's degree is never referenced again, so carrying it would
    # ride both sides of the self-join as dead shuffle width
    oriented = j.selectExpr(
        f"CASE WHEN {a_first} THEN a ELSE b END AS lo",
        f"CASE WHEN {a_first} THEN b ELSE a END AS hi",
        f"CASE WHEN {a_first} THEN db ELSE da END AS dhi",
    )
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    wedges = e1.join(e2, F.col("e1.lo") == F.col("e2.lo")).where(
        "(e1.dhi < e2.dhi) OR (e1.dhi = e2.dhi AND e1.hi < e2.hi)"
    ).selectExpr("e1.lo AS x", "e1.hi AS y", "e2.hi AS z")
    closing = oriented.selectExpr("lo AS y", "hi AS z")
    tris = wedges.join(closing, ["y", "z"])
    return (
        tris.selectExpr("explode(array(x, y, z)) AS node")
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )


def triangle_counts_sql(
    edges_sql: str, src: str = "src", dst: str = "dst"
) -> str:
    """DuckDB twin of :func:`triangle_counts` (identical orientation,
    wedge, and closure algebra; ``edges_sql`` is any SELECT producing
    the edge columns)."""
    a_first = "(da < db OR (da = db AND a < b))"
    return f"""
      WITH raw AS (
        SELECT {src} AS _a, {dst} AS _b FROM ({edges_sql})
        WHERE {src} IS NOT NULL AND {dst} IS NOT NULL
          AND {src} <> {dst}
      ),
      und AS (
        SELECT DISTINCT least(_a, _b) AS a, greatest(_a, _b) AS b
        FROM raw
      ),
      deg AS (
        SELECT v, count(*) AS d FROM (
          SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und
        ) GROUP BY v
      ),
      j AS (
        SELECT und.a, und.b, la.d AS da, lb.d AS db
        FROM und
        JOIN deg la ON la.v = und.a
        JOIN deg lb ON lb.v = und.b
      ),
      oriented AS (
        SELECT CASE WHEN {a_first} THEN a ELSE b END AS lo,
               CASE WHEN {a_first} THEN b ELSE a END AS hi,
               CASE WHEN {a_first} THEN db ELSE da END AS dhi
        FROM j
      ),
      wedges AS (
        SELECT e1.lo AS x, e1.hi AS y, e2.hi AS z
        FROM oriented e1 JOIN oriented e2 ON e1.lo = e2.lo
        WHERE (e1.dhi < e2.dhi) OR (e1.dhi = e2.dhi AND e1.hi < e2.hi)
      ),
      tris AS (
        SELECT w.x, w.y, w.z
        FROM wedges w
        JOIN oriented c ON c.lo = w.y AND c.hi = w.z
      ),
      exploded AS (
        SELECT unnest([x, y, z]) AS node FROM tris
      )
      SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
      FROM exploded
      GROUP BY node
    """


def clustering_coefficients(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(node, degree, n_triangles, coeff_ppm): local clustering
    coefficient per node as exact integer ppm —
    ``(2_000_000 * T) div (d * (d - 1))``, 0 for degree < 2 — over
    the same undirected simple graph as :func:`triangle_counts`
    (shared ``_simple_graph`` definition). EVERY node gets a row
    (zero-triangle nodes included, coeff 0): the per-node density
    signal community detection and link-spam scoring threshold on,
    where triangle_counts alone only lists participants.

    Exactness bound: the ppm numerator is BIGINT, so per-node
    triangle counts are exact up to ~4.6 * 10^12 (T * 2e6 at the
    int64 ceiling); a node in more triangles than that exceeds any
    real corpus graph. The denominator d * (d - 1) is safe to
    d ~ 3 * 10^9. Integer division is on non-negative operands, so
    Spark ``div`` and DuckDB ``//`` agree (the established gotcha).

    Scale shape: triangle_counts' O(m^1.5) wedge machinery plus one
    left join from the degree table onto the per-node triangle
    aggregate — both keyed on the node, uniform.
    """
    und, deg = _simple_graph(edges, src, dst)
    tris = _triangles(und, deg)
    return (
        deg.join(tris, deg["v"] == tris["node"], "left")
        .select(
            deg["v"].alias("node"),
            F.col("d").cast("long").alias("degree"),
            F.coalesce("n_triangles", F.lit(0))
            .cast("long")
            .alias("n_triangles"),
        )
        .selectExpr(
            "node",
            "degree",
            "n_triangles",
            "CASE WHEN degree >= 2 THEN (CAST(2000000 AS BIGINT) *"
            " n_triangles) div (degree * (degree - 1))"
            " ELSE CAST(0 AS BIGINT) END AS coeff_ppm",
        )
    )


def clustering_coefficients_sql(
    edges_sql: str, src: str = "src", dst: str = "dst"
) -> str:
    """DuckDB twin of :func:`clustering_coefficients` (the triangle
    twin as a subquery, left-joined onto the same degree CTE)."""
    return f"""
      WITH raw AS (
        SELECT {src} AS _a, {dst} AS _b FROM ({edges_sql})
        WHERE {src} IS NOT NULL AND {dst} IS NOT NULL
          AND {src} <> {dst}
      ),
      und AS (
        SELECT DISTINCT least(_a, _b) AS a, greatest(_a, _b) AS b
        FROM raw
      ),
      deg AS (
        SELECT v, count(*) AS d FROM (
          SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und
        ) GROUP BY v
      ),
      tris AS (
        {triangle_counts_sql(edges_sql, src, dst)}
      )
      SELECT deg.v AS node,
             CAST(deg.d AS BIGINT) AS degree,
             CAST(coalesce(tris.n_triangles, 0) AS BIGINT)
               AS n_triangles,
             CASE WHEN deg.d >= 2
                  THEN CAST((CAST(2000000 AS BIGINT)
                         * coalesce(tris.n_triangles, 0))
                       // (deg.d * (deg.d - 1)) AS BIGINT)
                  ELSE CAST(0 AS BIGINT) END AS coeff_ppm
      FROM deg LEFT JOIN tris ON tris.node = deg.v
    """
