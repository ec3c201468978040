"""Iterative graph analytics with exact cross-engine replay.

PageRank (Brin & Page 1998) as a Pregel-style DataFrame loop: each
iteration is one edge⋈rank join plus one destination-keyed aggregation —
the standard scalable shape (shuffles bounded by edges, node state by
nodes; no adjacency ever collects to the driver). Connected components
(label propagation) lives in operators/dedup.py:connected_components;
this module adds the weighted-importance side of graph profiling.

Exact replay design (the q111 trainer pattern): ranks are INTEGER
micro-units. Per-edge contributions are ``round(rank_micro / out_deg)``
— one IEEE double division + half-away round, bit-identical in any
engine — and all sums are integer sums, immune to float fold order. The
DuckDB oracle replays the full iteration chain (every per-iteration CTE
MATERIALIZED — an inlined chain re-evaluates iteration 1 exponentially)
to bit-identical final ranks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MICRO = 1_000_000


def pagerank(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    iters: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over a directed edge list (dangling nodes keep their
    teleport mass; duplicate edges count once — callers pre-distinct).

    Returns ``(node, rank_micro)`` — rank in integer micro-units, summing
    to ~N·1e6. One eager checkpoint per iteration truncates the lineage
    (the connected_components pattern); per-iteration cost is one
    src-keyed join + one dst-keyed aggregation, both bounded by |E|.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    base = nodes.join(deg, nodes["node"] == deg["src"], "left").select(
        "node", F.coalesce(F.col("out_deg"), F.lit(0)).alias("out_deg")
    ).localCheckpoint(eager=True)
    teleport = int(round((1.0 - damping) * _MICRO))
    # the rank frame carries out_deg forward so each iteration is ONE
    # src-keyed join + ONE dst-keyed agg (no per-iteration degree lookup)
    ranks = base.select(
        "node", "out_deg", F.lit(_MICRO).cast("bigint").alias("r")
    )
    for _ in range(iters):
        contrib = (
            e.join(
                # dangling nodes (out_deg 0) contribute nothing; excluding
                # them also keeps the division ANSI-safe
                ranks.where(F.col("out_deg") > 0).select(
                    F.col("node").alias("src"),
                    F.round(F.col("r") / F.col("out_deg"), 0)
                    .cast("bigint")
                    .alias("c"),
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            base.join(contrib, "node", "left")
            .select(
                "node",
                "out_deg",
                (
                    F.lit(teleport)
                    + F.round(
                        F.lit(damping) * F.coalesce(F.col("in_sum"), F.lit(0)),
                        0,
                    ).cast("bigint")
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.col("r").alias("rank_micro"))


def pagerank_sql(
    edges_subquery: str,
    src_col: str,
    dst_col: str,
    iters: int = 10,
    damping: float = 0.85,
) -> str:
    """DuckDB twin of :func:`pagerank` — replays init → ``iters``
    iterations to bit-identical micro-unit ranks. Every CTE is
    MATERIALIZED (the q111 lesson: iteration k is referenced by k+1's
    join twice — src lookup and dst scan — and an inlined chain
    re-evaluates iteration 1 exponentially)."""
    teleport = int(round((1.0 - damping) * _MICRO))
    ctes = [
        f"e AS MATERIALIZED (SELECT {src_col} AS src, {dst_col} AS dst"
        f" FROM ({edges_subquery}))",
        "nodes AS MATERIALIZED (SELECT src AS node FROM e"
        " UNION SELECT dst FROM e)",
        "base AS MATERIALIZED (SELECT n.node,"
        " coalesce(d.out_deg, 0) AS out_deg FROM nodes n LEFT JOIN"
        " (SELECT src, CAST(count(*) AS BIGINT) AS out_deg FROM e GROUP BY src) d"
        " ON n.node = d.src)",
        f"r0 AS MATERIALIZED (SELECT node, CAST({_MICRO} AS BIGINT) AS r"
        " FROM base)",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"""r{t} AS MATERIALIZED (
        SELECT b.node,
               CAST({teleport} + CAST(round({damping} * coalesce(s.in_sum, 0), 0) AS BIGINT) AS BIGINT) AS r
        FROM base b LEFT JOIN (
            SELECT e.dst AS node,
                   CAST(sum(CAST(round(p.r / b2.out_deg, 0) AS BIGINT)) AS BIGINT) AS in_sum
            FROM e
            JOIN r{t - 1} p ON e.src = p.node
            JOIN base b2 ON e.src = b2.node
            GROUP BY e.dst
        ) s ON b.node = s.node
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT node, r AS rank_micro FROM r{iters}"
    )
