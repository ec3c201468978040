"""PageRank laws (operators/graph.py) + pivot round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from pytrousse_spark.operators.graph import pagerank


def test_pagerank_mass_and_symmetry(spark):
    """Teleport mass is conserved (sum ≈ N·1e6 up to per-node rounding)
    and symmetric nodes get identical ranks."""
    # 4-cycle: perfectly symmetric -> all ranks equal
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], ["src", "dst"]
    )
    rows = pagerank(edges, "src", "dst", iters=10).collect()
    ranks = {r["node"]: r["rank_micro"] for r in rows}
    assert len(set(ranks.values())) == 1
    assert abs(sum(ranks.values()) - 4_000_000) <= 4 * 10


def test_pagerank_hub_outranks_leaves(spark):
    """Star graph: the hub, pointed at by every leaf, outranks them."""
    leaves = list(range(2, 8))
    edges = spark.createDataFrame(
        [(i, 1) for i in leaves] + [(1, i) for i in leaves], ["src", "dst"]
    )
    ranks = {
        r["node"]: r["rank_micro"]
        for r in pagerank(edges, "src", "dst", iters=10).collect()
    }
    assert all(ranks[1] > ranks[i] for i in leaves)
    leaf_ranks = {ranks[i] for i in leaves}
    assert len(leaf_ranks) == 1  # leaves are symmetric


def test_pagerank_dangling_node_keeps_teleport(spark):
    """A node with no outgoing edges still holds >= teleport mass and
    contributes nothing (its rank never flows on)."""
    edges = spark.createDataFrame([(1, 2), (3, 2)], ["src", "dst"])
    ranks = {
        r["node"]: r["rank_micro"]
        for r in pagerank(edges, "src", "dst", iters=5, damping=0.85).collect()
    }
    assert ranks[2] > ranks[1] == ranks[3] == 150_000  # pure teleport


def test_pivot_unpivot_roundtrip(spark):
    """unpivot(pivot(x)) reproduces the original (day, type, count)."""
    from pytrousse_spark.io import read_parquet_df
    from tests.conftest import SF_DIR
    import __spark_entry__ as e

    wide = e.queries()["q118_pivot"](spark, SF_DIR)
    long = wide.unpivot(
        ["day"], e._EVENT_TYPES, "event_type", "n"
    ).where(F.col("n") > 0)
    ev = read_parquet_df(spark, f"{SF_DIR}/events.parquet")
    direct = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    assert sorted(map(tuple, long.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_triangle_count_known_graphs(spark):
    from pytrousse_spark.operators.graph import triangle_count

    # K4 has 4 triangles, 6 edges, wedges = 4 * C(3,2) = 12, C = 3*4/12 = 1
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    df = spark.createDataFrame(k4, "s bigint, d bigint")
    (r,) = triangle_count(df, "s", "d").collect()
    assert (r["n_vertices"], r["n_edges"], r["n_triangles"]) == (4, 6, 4)
    assert r["n_wedges"] == 12 and r["global_clustering"] == 1.0

    # path a-b-c: one wedge, no triangle
    p = spark.createDataFrame([(1, 2), (2, 3)], "s bigint, d bigint")
    (r,) = triangle_count(p, "s", "d").collect()
    assert r["n_triangles"] == 0 and r["n_wedges"] == 1
    assert r["global_clustering"] == 0.0


def test_triangle_count_canonicalizes_input(spark):
    from pytrousse_spark.operators.graph import triangle_count

    # triangle given with duplicates, reversed edges and a self-loop
    rows = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3)]
    df = spark.createDataFrame(rows, "s bigint, d bigint")
    (r,) = triangle_count(df, "s", "d").collect()
    assert (r["n_edges"], r["n_triangles"]) == (3, 1)


def test_degree_assortativity_known_graphs(spark):
    """A star is maximally disassortative (r = -1); a cycle is
    degree-regular (zero variance -> NULL); a double-star barbell is
    strongly positive at the hub-hub edge... checked against the
    hand-computed Newman formula for the path P4 (r = -0.5)."""
    from pytrousse_spark.operators.graph import degree_assortativity

    def g(edges):
        df = spark.createDataFrame(edges, "s long, d long")
        return degree_assortativity(df, "s", "d").collect()[0]

    star = g([(0, i) for i in range(1, 6)])
    assert star["n_nodes"] == 6 and star["n_edges"] == 5
    assert star["assortativity"] == -1.0

    cycle = g([(i, (i + 1) % 5) for i in range(5)])
    assert cycle["assortativity"] is None  # 2-regular: zero variance
    assert cycle["mean_degree"] == 2.0

    # path 0-1-2-3: degrees 1,2,2,1 -> Newman r = -0.5
    path = g([(0, 1), (1, 2), (2, 3)])
    assert abs(path["assortativity"] + 0.5) < 1e-6
