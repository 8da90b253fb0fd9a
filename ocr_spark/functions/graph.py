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

Recurrence (d = 85/100 damping, S = rank_scale(N), all ops integer):

    r0(v)   = S div N
    out(u)  = multi-edge out-degree
    c(e)    = r(src(e)) div out(src(e))          per edge
    in(v)   = sum of c(e) over in-edges           exact BIGINT sum
    dang    = sum of r(u) over out-degree-0 nodes (operator-scale
              scalar: ONE bigint collected per iteration)
    r'(v)   = (15*S) div (100*N)
              + (85 * (in(v) + dang div N)) div 100

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


def pagerank(edges: DataFrame, iters: int = 3) -> DataFrame:
    """(node, rank): fixed-point PageRank after ``iters`` power
    iterations over ``edges(src, dst)``. Multi-edges count with
    multiplicity; nodes = distinct(src) ∪ distinct(dst); nodes with
    no out-edges contribute their mass uniformly (dangling
    redistribution).
    """
    if iters < 0:
        raise ValueError("iters must be >= 0")
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
    teleport = (D_DEN - D_NUM) * scale // (D_DEN * n_nodes)

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
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.expr(
                        f"({D_NUM} * (coalesce(in_sum, CAST(0 AS BIGINT))"
                        f" + {dang // n_nodes})) div {D_DEN}"
                    )
                ).cast("long").alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks


def pagerank_sql(edges_source: str, iters: int = 3) -> str:
    """DuckDB twin of :func:`pagerank`: the identical integer
    recurrence unrolled into ``iters`` chained CTEs.

    ``edges_source`` must be a parenthesized subquery or table name
    yielding (src, dst). DuckDB's sum(BIGINT) returns HUGEINT, so
    every sum is cast back to BIGINT before further integer math —
    values are bounded by rank_scale(N) (<= ~1e17 within the
    documented n_nodes ~ 1e11 bound), so the cast is lossless.
    """
    if iters < 0:
        raise ValueError("iters must be >= 0")
    scale = (
        f"greatest({SCALE}, (SELECT n FROM nn) * {PER_NODE_SCALE})"
    )
    tele = (
        f"(({D_DEN - D_NUM} * {scale}) // ({D_DEN} * (SELECT n FROM nn)))"
    )
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
    prev = "r0"
    for i in range(1, iters + 1):
        cur = f"r{i}"
        dang = (
            f"d{i} AS (SELECT CAST(coalesce(sum(r.rank), 0) AS BIGINT) AS m"
            f" FROM {prev} r JOIN dangset USING (node))"
        )
        ins = (
            f"i{i} AS (SELECT e.dst AS node,"
            f" CAST(sum(r.rank // o.out) AS BIGINT) AS in_sum"
            f" FROM e JOIN {prev} r ON e.src = r.node"
            f" JOIN outdeg o ON e.src = o.src GROUP BY e.dst)"
        )
        step = (
            f"{cur} AS (SELECT nodes.node, CAST({tele}"
            f" + ({D_NUM} * (coalesce(i.in_sum, CAST(0 AS BIGINT))"
            f" + (SELECT m FROM d{i}) // (SELECT n FROM nn)))"
            f" // {D_DEN} AS BIGINT) AS rank"
            f" FROM nodes LEFT JOIN i{i} i ON nodes.node = i.node)"
        )
        ctes += [dang, ins, step]
        prev = cur
    return "WITH " + ",\n".join(ctes) + f"\nSELECT node, rank FROM {prev}"


def personalized_pagerank(
    edges: DataFrame, seeds: list, iters: int = 3
) -> DataFrame:
    """(node, rank): topic-sensitive PageRank — the teleport mass (and
    dangling mass) goes ONLY to the ``seeds`` instead of uniformly to
    every node, so rank measures proximity to a trusted set. The
    curation use: seed with known-good domains, rank the crawl
    frontier by authority FLOW from them (TrustRank-style).

    Same integer recurrence as :func:`pagerank` with the teleport
    reshaped (S = rank_scale(N), k = |seeds ∩ nodes|, all ops
    integer):

        r0(v)      = S div N
        tele(v)    = (15*S) div (100*k)   if v in seeds else 0
        r'(v)      = tele(v)
                     + (85 * (in(v) + (dang div k if v in seeds
                                       else 0))) div 100

    Seeds are passed as literal values (operator-scale — a seed set
    is hundreds of domains, not a table); values must match the node
    id type. Seeds absent from the graph are ignored.
    """
    if iters < 0:
        raise ValueError("iters must be >= 0")
    if not seeds:
        raise ValueError("seeds must be non-empty")
    edges = edges.select("src", "dst")
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.withColumn("rank", F.lit(0).cast("long"))
    n_seeds = nodes.where(F.col("node").isin(seeds)).count()
    if n_seeds == 0:
        raise ValueError("no seed is present in the graph")

    outdeg = edges.groupBy("src").agg(F.count("*").alias("out"))
    edges_w = edges.join(outdeg, "src").localCheckpoint()
    dangling_nodes = nodes.join(
        edges.select("src").distinct(),
        nodes["node"] == F.col("src"),
        "left_anti",
    ).localCheckpoint()

    scale = rank_scale(n_nodes)
    tele_seed = (D_DEN - D_NUM) * scale // (D_DEN * n_seeds)

    def _lit(v) -> str:
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return str(int(v))

    pred = "node IN (" + ", ".join(_lit(v) for v in seeds) + ")"

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
            .selectExpr(
                "node",
                f"CAST(CASE WHEN {pred} THEN {tele_seed} ELSE 0 END"
                f" + ({D_NUM} * (coalesce(in_sum, CAST(0 AS BIGINT))"
                f" + CASE WHEN {pred} THEN {dang // n_seeds} ELSE 0 END))"
                f" div {D_DEN} AS BIGINT) AS rank",
            )
            .localCheckpoint()
        )
    return ranks


def personalized_pagerank_sql(
    edges_source: str, seeds: list, iters: int = 3
) -> str:
    """DuckDB twin of :func:`personalized_pagerank` (seed-count k is
    computed in-query: seeds absent from the graph are ignored, same
    as the Spark side)."""
    if iters < 0:
        raise ValueError("iters must be >= 0")
    if not seeds:
        raise ValueError("seeds must be non-empty")

    def _lit(v) -> str:
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return str(int(v))

    seed_list = ", ".join(_lit(v) for v in seeds)
    scale = f"greatest({SCALE}, (SELECT n FROM nn) * {PER_NODE_SCALE})"
    tele = (
        f"(({D_DEN - D_NUM} * {scale}) // ({D_DEN} * (SELECT k FROM sk)))"
    )
    ctes = [
        f"e AS (SELECT src, dst FROM {edges_source})",
        "nodes AS (SELECT DISTINCT node FROM"
        " (SELECT src AS node FROM e UNION ALL SELECT dst FROM e))",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        f"sk AS (SELECT count(*) AS k FROM nodes WHERE node IN ({seed_list}))",
        "outdeg AS (SELECT src, count(*) AS out FROM e GROUP BY src)",
        "dangset AS (SELECT node FROM nodes WHERE NOT EXISTS"
        " (SELECT 1 FROM e WHERE e.src = nodes.node))",
        f"r0 AS (SELECT node, CAST({scale} // (SELECT n FROM nn) AS BIGINT)"
        " AS rank FROM nodes)",
    ]
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
        ctes.append(
            f"{cur} AS (SELECT nodes.node, CAST("
            f"CASE WHEN nodes.node IN ({seed_list}) THEN {tele} ELSE 0 END"
            f" + ({D_NUM} * (coalesce(i.in_sum, CAST(0 AS BIGINT))"
            f" + CASE WHEN nodes.node IN ({seed_list})"
            f" THEN (SELECT m FROM d{i}) // (SELECT k FROM sk)"
            f" ELSE 0 END)) // {D_DEN} AS BIGINT) AS rank"
            f" FROM nodes LEFT JOIN i{i} i ON nodes.node = i.node)"
        )
        prev = cur
    return "WITH " + ",\n".join(ctes) + f"\nSELECT node, rank FROM {prev}"
