"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exercises the engine's operator inventory (SURVEY.md §2 plus
the beyond-reference LLM-pipeline operators); ``oracle_sql()`` carries the
DuckDB-equivalent SQL for every query whose semantics are SQL-expressible.
Column names/aliases are kept identical on both sides; every double output is
rounded identically on both sides (float-sum order differs between engines).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pytrousse_spark import from_df, read_parquet_df
from pytrousse_spark.functions import text as tx
from pytrousse_spark.functions.numeric_repair import repair_sql
from pytrousse_spark.operators import dedup as dd
from pytrousse_spark.operators import similarity as sim
from pytrousse_spark.operators.anonymize import anonymize_data, id_owner_sql
from pytrousse_spark.operators.binning import (
    add_group_specific_bin_id,
    combine_categorical_columns_to_one,
    split_continuous_column_into_bins,
)
from pytrousse_spark.operators.transforms import (
    FillNA,
    OneHotEncoder,
    OrdinalEncoder,
    ReplaceStrings,
    ReplaceSubstrings,
)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

_table_cache: dict[tuple[int, str, str], DataFrame] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # applicationId (not id(spark)): a recycled object address must not alias
    # DataFrames of a stopped session
    key = (spark.sparkContext.applicationId, sf_dir, name)
    if key not in _table_cache:
        # the driver's session may not have been built by get_spark(); pin
        # the timezone so timestamp results match the UTC-naive oracle
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        # NOTE: no blanket rebalance here — a round-3 experiment rebalanced
        # documents/embeddings at the scan and the md5-heavy dedup family
        # got ~1.45x faster, but every scan-light documents query paid the
        # full-text exchange (q61 0.15->1.4s, q69 0.3->6.2s, q63/q60/q62
        # similar). rebalance_undersplit now lives INSIDE the hash-heavy
        # operators (minhash/simhash/fingerprint staging), where the
        # compute-per-row justifies it and it remains a no-op at real scale.
        _table_cache[key] = read_parquet_df(
            spark, os.path.join(sf_dir, f"{name}.parquet")
        )
    return _table_cache[key]


_books_cache: dict[tuple[str, str], list] = {}


def _pq_books(spark: SparkSession, sf_dir: str) -> list:
    """Trained PQ codebooks shared by q90 and q101 (identical params, fully
    deterministic Lloyd training — hash-picked seeds, round-6 means), so
    the ~10-job training runs once per (session, sf_dir) instead of once
    per consumer. Exactly the serving architecture PQ assumes: codebooks
    are a trained ARTIFACT reused across queries, like the table cache;
    each gate query still trains standalone in a fresh session, and the
    oracle replays the identical training chain either way."""
    from pytrousse_spark.operators import quantization as pq

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _books_cache:
        e = _t(spark, sf_dir, "embeddings")
        _books_cache[key] = pq.pq_codebooks_kmeans(
            e, "vec_id", "embedding", num_sub=8, num_cent=16, dim=64, iters=2
        )
    return _books_cache[key]


# ===========================================================================
# Relational passthrough queries (SURVEY.md §2.2-2.4, §2.11; Phase 4)
# ===========================================================================
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: filter → groupBy → multi-agg.

    Scale notes: predicate + column pruning reach the parquet scan; partial
    aggregation map-side; two grouping keys of tiny cardinality → no skew.
    """
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def _sql_q01() -> str:
    return """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """


def q02_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + group + deterministic top-10 (broadcastable dims)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    rev = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("o_orderkey", "c_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    # orderBy+limit compiles to TakeOrderedAndProject (distributed top-k);
    # a global row_number window would funnel everything to one partition.
    return (
        rev.orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "c_name", "revenue")
    )


def _sql_q02() -> str:
    return """
    WITH rev AS (
        SELECT o_orderkey, c_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        GROUP BY o_orderkey, c_name
    )
    SELECT o_orderkey, c_name, revenue FROM rev
    ORDER BY revenue DESC, o_orderkey ASC LIMIT 10
    """


def q03_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5-style snowflake join: region→nation→customer→orders→lineitem."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def _sql_q03() -> str:
    return """
    SELECT r_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """


def q04_filter_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style single-table filtered aggregate (pushdown showcase)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount").between(0.03, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )


def _sql_q04() -> str:
    return """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """


def q05_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: orders having at least one high-discount lineitem."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    hot = li.where(F.col("l_discount") >= 0.09)
    return (
        o.join(hot, o["o_orderkey"] == hot["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


def _sql_q05() -> str:
    return """
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_discount >= 0.09
    )
    GROUP BY o_orderpriority
    """


def q06_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no order above 300k total price."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    big = o.where(F.col("o_totalprice") > 300_000)
    return (
        c.join(big, c["c_custkey"] == big["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


def _sql_q06() -> str:
    return """
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer
    WHERE NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_totalprice > 300000
    )
    GROUP BY c_mktsegment
    """


def q07_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by total price (ranking window)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"), "rnk")
    )


def _sql_q07() -> str:
    return """
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice,
           CAST(row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC
           ) AS BIGINT) AS rnk
    FROM orders
    QUALIFY rnk <= 3
    """


def q08_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union/intersect/except over nation keys of customers vs suppliers."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    both = c.intersect(s).withColumn("src", F.lit("both"))
    cust_only = c.subtract(s).withColumn("src", F.lit("cust_only"))  # set EXCEPT
    return both.unionByName(cust_only)


def _sql_q08() -> str:
    return """
    WITH c AS (SELECT c_nationkey AS nationkey FROM customer),
         s AS (SELECT s_nationkey AS nationkey FROM supplier),
         both_k AS (SELECT nationkey FROM c INTERSECT SELECT nationkey FROM s),
         conly  AS (SELECT nationkey FROM c EXCEPT SELECT nationkey FROM s)
    SELECT nationkey, 'both' AS src FROM both_k
    UNION ALL
    SELECT nationkey, 'cust_only' AS src FROM conly
    """


def q09_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation over (returnflag, linestatus)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


def _sql_q09() -> str:
    return """
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """


def q10_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window batch aggregation on the events stream table (batch
    twin of streaming.windowed_event_counts)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def _sql_q10() -> str:
    return """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n_events, round(sum(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2
    """


def q11_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) via lag + running sum — the batch
    twin of streaming session windows, expressed identically in SQL."""
    ev = _t(spark, sf_dir, "events")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # integer microseconds on BOTH engines: Spark ts is nanos→micros truncated
    # at read (io.py), so second-truncated gaps flip the 30-min boundary vs an
    # oracle computing fractional epoch over TIMESTAMP(NANOS) data
    gap = (
        F.unix_micros(F.col("ts"))
        - F.lag(F.unix_micros(F.col("ts"))).over(w_order)
    )
    new_sess = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    w_run = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        ev.withColumn("new_sess", new_sess)
        .withColumn("session_id", F.sum("new_sess").over(w_run))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


def _sql_q11() -> str:
    return """
    WITH base AS (
        -- Spark truncates the parquet TIMESTAMP(NANOS) to micros at read;
        -- mirror that before any gap/order logic so both engines sessionize
        -- over identical instants
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ), flagged AS (
        SELECT user_id, event_id, ts,
               CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                         OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_sess
        FROM base
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        -- CAST: DuckDB's windowed sum yields HUGEINT (int128); Spark emits
        -- BIGINT. Values are identical but the serialized type is not, which
        -- breaks the driver's value-hash. Every other window/group sum in
        -- this file is cast the same way.
        SELECT *, CAST(sum(new_sess) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id, count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM sess GROUP BY user_id, session_id
    """


def q12_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar-function surface: extract, trunc, datediff."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id",
            F.year("ts").cast("long").alias("y"),
            F.month("ts").cast("long").alias("m"),
            (F.dayofweek("ts") - 1).cast("long").alias("dow"),  # 0=Sunday
            F.to_date(F.col("ts")).alias("day"),
            F.datediff(F.col("ts"), F.lit("2024-01-01")).cast("long").alias(
                "days_since"
            ),
        )
    )


def _sql_q12() -> str:
    return """
    SELECT event_id,
           CAST(year(ts) AS BIGINT) AS y,
           CAST(month(ts) AS BIGINT) AS m,
           CAST(date_part('dow', ts) AS BIGINT) AS dow,
           CAST(ts AS DATE) AS day,
           CAST(datediff('day', TIMESTAMP '2024-01-01', ts) AS BIGINT) AS days_since
    FROM events
    """


def q13_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar-function surface: case, trim, substr, split, regexp,
    pad, reverse, concat."""
    p = _t(spark, sf_dir, "part")
    t = F.col("p_type")
    return p.select(
        "p_partkey",
        F.upper(t).alias("up"),
        F.lower(t).alias("lo"),
        F.substring(t, 1, 5).alias("sub5"),
        F.length(t).cast("long").alias("len"),
        F.split(t, " ").getItem(0).alias("first_word"),
        F.regexp_extract(t, r"([A-Z]+)$", 1).alias("last_caps"),
        F.lpad(F.col("p_brand"), 12, "#").alias("padded"),
        F.reverse(t).alias("rev"),
        F.concat_ws("|", F.col("p_brand"), t).alias("joined"),
    )


def _sql_q13() -> str:
    return """
    SELECT p_partkey,
           upper(p_type) AS up,
           lower(p_type) AS lo,
           substr(p_type, 1, 5) AS sub5,
           CAST(length(p_type) AS BIGINT) AS len,
           string_split(p_type, ' ')[1] AS first_word,
           coalesce(regexp_extract(p_type, '([A-Z]+)$', 1), '') AS last_caps,
           lpad(p_brand, 12, '#') AS padded,
           reverse(p_type) AS rev,
           concat_ws('|', p_brand, p_type) AS joined
    FROM part
    """


def q14_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple DISTINCT aggregates per group."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_distinct(F.col("l_suppkey")).alias("n_supp"),
        F.count_distinct(F.col("l_partkey")).alias("n_part"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


def _sql_q14() -> str:
    return """
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_supp,
           count(DISTINCT l_partkey) AS n_part,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem GROUP BY l_returnflag
    """


def q15_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers above the global average account balance."""
    c = _t(spark, sf_dir, "customer")
    avg_bal = c.agg(F.avg("c_acctbal").alias("__avg"))
    return (
        c.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("__avg"))
        .select("c_custkey", F.round("c_acctbal", 2).alias("c_acctbal"))
    )


def _sql_q15() -> str:
    return """
    SELECT c_custkey, round(c_acctbal, 2) AS c_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
    """



def q16_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (profiling-adjacent agg).

    p50/p90 come from ONE ``percentile(col, array(...))`` buffer instead
    of two independent ``percentile`` aggregates over the same column
    (r13, guide §1.2): the exact-percentile aggregate buffers every
    value per group, so two scalar calls built two identical
    value-count maps per group and shuffled both. Same function, same
    interpolation — element extraction only."""
    li = _t(spark, sf_dir, "lineitem")
    pp = F.expr("percentile(l_extendedprice, array(0.5, 0.9))")
    return li.groupBy("l_returnflag").agg(
        F.round(pp[0], 4).alias("p50"),
        F.round(pp[1], 4).alias("p90"),
        F.round(F.expr("percentile(l_quantity, 0.25)"), 4).alias("q25"),
    )


def _sql_q16() -> str:
    return """
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
           round(quantile_cont(l_quantity, 0.25), 4) AS q25
    FROM lineitem GROUP BY l_returnflag
    """


def q17_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction from the events props column."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.select(
        "event_id",
        k.alias("k_str"),
        k.cast("long").alias("k_num"),
    ).where(F.col("k_num") > 50)


def _sql_q17() -> str:
    return """
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
    """


def q18_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation (all grouping-set combinations)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
    )


def _sql_q18() -> str:
    return """
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           round(avg(l_discount), 6) AS avg_disc
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """



def q19_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed Trousse pipeline in ONE Catalyst plan (SURVEY §3 E2):
    synthesize NULLs -> FillNA -> ReplaceStrings -> OrdinalEncoder -> bin."""
    from pytrousse_spark.operators.base import Pipeline

    c = _t(spark, sf_dir, "customer").withColumn(
        "seg", F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    )
    pipe = Pipeline(
        FillNA(["seg"], "FILLED"),
        ReplaceStrings(["seg"], {"MACHINERY": "MACH"}),
        OrdinalEncoder(["seg"], derived_columns=["seg_code"]),
    )
    out = pipe(from_df(c))
    binned = split_continuous_column_into_bins(out, "c_acctbal", [0, 5000])
    return binned.df.select(
        "c_custkey", "seg", "seg_code", "c_acctbal_bin_id"
    )


def _sql_q19() -> str:
    return """
    WITH t AS (
        SELECT c_custkey, c_acctbal,
               CASE WHEN coalesce(nullif(c_mktsegment, 'BUILDING'), 'FILLED')
                         = 'MACHINERY'
                    THEN 'MACH'
                    ELSE coalesce(nullif(c_mktsegment, 'BUILDING'), 'FILLED')
               END AS seg
        FROM customer
    ), codes AS (
        SELECT seg AS v,
               CAST(row_number() OVER (ORDER BY seg) - 1 AS BIGINT) AS code
        FROM (SELECT DISTINCT seg FROM t WHERE seg IS NOT NULL)
    ), bounds AS (
        SELECT min(c_acctbal) - 1 AS lo, max(c_acctbal) AS hi FROM t
    )
    SELECT c_custkey, seg, codes.code AS seg_code,
           CAST(CASE WHEN c_acctbal >= (SELECT lo FROM bounds)
                      AND c_acctbal <= (SELECT hi FROM bounds)
                THEN (CASE WHEN c_acctbal >= 0 THEN 1 ELSE 0 END
                    + CASE WHEN c_acctbal >= 5000 THEN 1 ELSE 0 END)
                END AS SMALLINT) AS c_acctbal_bin_id
    FROM t LEFT JOIN codes ON t.seg = codes.v
    """


# ===========================================================================
# pytrousse operator surface (SURVEY.md §2.5-2.8)
# ===========================================================================
def q20_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL property census of the profiler (§2.10, widened round 5 per
    the r4 verdict so ONE green row re-certifies the whole surface each
    round): per column — null count/ratio, exact distinct (gate flavor;
    the engine profiler swaps in HLL at scale), numeric-parse ratio
    (A5), and the classification booleans exactly as
    pytrousse_spark.profiling.ColumnProfile derives them
    (reference dataset.py:232-372,493-535): is_categorical
    (distinct < 7 or distinct < count//300), is_constant
    (distinct-with-null == 1), is_trivial (null_ratio > 0.999 or
    constant), col_class (numerical / string / mixed / other, strings
    reclassified by parse ratio). One aggregation pass, one row per
    column."""
    d = _t(spark, sf_dir, "documents")
    total = F.count(F.lit(1))
    aggs = [total.alias("__total")]
    string_cols = {
        f.name for f in d.schema.fields if f.dataType.simpleString() == "string"
    }
    numeric_cols = {
        f.name
        for f in d.schema.fields
        if f.dataType.simpleString() in
        ("tinyint", "smallint", "int", "bigint", "float", "double")
        or f.dataType.simpleString().startswith("decimal")
    }
    for c in d.columns:
        aggs.append((total - F.count(F.col(c))).alias(f"{c}__nulls"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"{c}__distinct"))
        if c in string_cols:
            parsed = F.col(c).try_cast("double")
            aggs.append(
                F.avg(
                    F.when(
                        F.col(c).isNotNull(),
                        parsed.isNotNull().cast("double"),
                    )
                ).alias(f"{c}__pr")
            )
    row = d.agg(*aggs)

    # r9 VERDICT item 6 (q20 drift): the old census inlined every
    # derived expression PER COLUMN into one giant struct array —
    # `trivial` re-inlined `constant` which re-inlined `uv`, 5x over —
    # and Catalyst analysis of that tree dominated the wall (~0.9 s of
    # the 1.4 s gate at sf0.1; the agg itself is 0.6 s). Explode a
    # MINIMAL per-column struct first, then write each derived
    # expression ONCE over the 5-row frame.
    def raw(c: str):
        pr = (
            F.col(f"{c}__pr")
            if c in string_cols
            else F.lit(None).cast("double")
        )
        klass0 = (
            "numerical"
            if c in numeric_cols
            else ("string" if c in string_cols else "other")
        )
        return F.struct(
            F.lit(c).alias("col_name"),
            F.col(f"{c}__nulls").cast("long").alias("n_nulls"),
            F.col(f"{c}__distinct").cast("long").alias("n_distinct"),
            pr.alias("__pr"),
            F.lit(klass0).alias("__k0"),
        )

    per = row.select(
        F.explode(F.array(*[raw(c) for c in d.columns])).alias("s"),
        F.col("__total").cast("long").alias("__tot"),
    ).select("s.*", "__tot")
    nulls, dst, tot = F.col("n_nulls"), F.col("n_distinct"), F.col("__tot")
    cnt = tot - nulls
    pr = F.col("__pr")
    # reference's len(Series.unique()) counts NaN as one extra value
    # (dropna=False) — dataset.py:526 — so nulls add 1 to the unique
    # count while the //300 denominator stays the non-null count()
    uv = dst + (nulls > 0).cast("long")
    constant = (uv == 1) | (tot == 0)
    return per.select(
        "col_name",
        "n_nulls",
        "n_distinct",
        F.round(nulls.cast("double") / tot.cast("double"), 6).alias(
            "null_ratio"
        ),
        F.round(pr, 6).alias("parse_ratio"),
        ((uv < 7) | (uv < F.floor(cnt / 300).cast("long"))).alias(
            "is_categorical"
        ),
        constant.alias("is_constant"),
        (
            (nulls.cast("double") > 0.999 * tot.cast("double")) | constant
        ).alias("is_trivial"),
        F.when(F.col("__k0") != "string", F.col("__k0"))
        .when((pr == 1.0) & (cnt > 0), "numerical")
        .when((pr > 0.0) & (pr < 1.0), "mixed")
        .otherwise("string")
        .alias("col_class"),
    )


def _sql_q20() -> str:
    string_cols = {"text", "lang", "source"}
    numeric_cols = {"doc_id", "n_chars"}
    parts = []
    for c in ("doc_id", "text", "lang", "source", "n_chars"):
        if c in string_cols:
            pr = (
                f"round(avg(CASE WHEN {c} IS NOT NULL THEN CASE WHEN "
                f"TRY_CAST({c} AS DOUBLE) IS NOT NULL THEN 1.0 ELSE 0.0 "
                f"END END), 6)"
            )
            prraw = (
                f"avg(CASE WHEN {c} IS NOT NULL THEN CASE WHEN "
                f"TRY_CAST({c} AS DOUBLE) IS NOT NULL THEN 1.0 ELSE 0.0 "
                f"END END)"
            )
            klass = (
                f"CASE WHEN {prraw} = 1.0 AND count({c}) > 0 "
                f"THEN 'numerical' WHEN {prraw} > 0.0 AND {prraw} < 1.0 "
                f"THEN 'mixed' ELSE 'string' END"
            )
        else:
            pr = "CAST(NULL AS DOUBLE)"
            klass = "'numerical'" if c in numeric_cols else "'other'"
        parts.append(f"""
        SELECT '{c}' AS col_name,
               CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
               CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
               round(CAST(count(*) - count({c}) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE), 6) AS null_ratio,
               {pr} AS parse_ratio,
               (count(DISTINCT {c})
                  + CASE WHEN count(*) - count({c}) > 0 THEN 1 ELSE 0 END < 7
                OR count(DISTINCT {c})
                  + CASE WHEN count(*) - count({c}) > 0 THEN 1 ELSE 0 END
                < CAST(floor(CAST(count({c}) AS DOUBLE) / 300) AS BIGINT))
                   AS is_categorical,
               (count(DISTINCT {c})
                + CASE WHEN count(*) - count({c}) > 0 THEN 1 ELSE 0 END = 1
                OR count(*) = 0) AS is_constant,
               (CAST(count(*) - count({c}) AS DOUBLE)
                > 0.999 * CAST(count(*) AS DOUBLE)
                OR count(DISTINCT {c})
                   + CASE WHEN count(*) - count({c}) > 0 THEN 1 ELSE 0 END = 1
                OR count(*) = 0) AS is_trivial,
               {klass} AS col_class
        FROM documents""")
    return " UNION ALL ".join(parts)


def q21_fillna(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 FillNA through the operator API (nulls synthesized via nullif)."""
    c = _t(spark, sf_dir, "customer").withColumn(
        "seg_gap", F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    )
    ds = from_df(c)
    out = FillNA(["seg_gap"], "FILLED", derived_columns=["seg_filled"])(ds)
    return out.df.select("c_custkey", "seg_gap", "seg_filled")


def _sql_q21() -> str:
    return """
    SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg_gap,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'FILLED') AS seg_filled
    FROM customer
    """


def q22_replace_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 whole-value replacement on l_returnflag."""
    ds = from_df(_t(spark, sf_dir, "lineitem"))
    out = ReplaceStrings(["l_returnflag"], {"N": "NONE", "R": "RET"})(ds)
    return out.df.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n"))


def _sql_q22() -> str:
    return """
    SELECT CASE l_returnflag WHEN 'N' THEN 'NONE' WHEN 'R' THEN 'RET'
                ELSE l_returnflag END AS l_returnflag,
           count(*) AS n
    FROM lineitem GROUP BY 1
    """


def q23_replace_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 substring cascade on p_type (two sequential pairs)."""
    ds = from_df(_t(spark, sf_dir, "part"))
    out = ReplaceSubstrings(["p_type"], {"PROMO": "PM", " ": "_"})(ds)
    return out.df.select("p_partkey", "p_type")


def _sql_q23() -> str:
    return """
    SELECT p_partkey,
           replace(replace(p_type, 'PROMO', 'PM'), ' ', '_') AS p_type
    FROM part
    """


def q24_onehot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 one-hot on o_orderstatus (categories F/O/P at this SF)."""
    ds = from_df(_t(spark, sf_dir, "orders"))
    out = OneHotEncoder(["o_orderstatus"])(ds)
    return out.df.select(
        "o_orderkey", "o_orderstatus_F_enc", "o_orderstatus_O_enc", "o_orderstatus_P_enc"
    )


def _sql_q24() -> str:
    return """
    SELECT o_orderkey,
           o_orderstatus = 'F' AS o_orderstatus_F_enc,
           o_orderstatus = 'O' AS o_orderstatus_O_enc,
           o_orderstatus = 'P' AS o_orderstatus_P_enc
    FROM orders
    """


def q25_ordinal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 ordinal encoding of c_mktsegment (sorted-vocabulary codes)."""
    ds = from_df(_t(spark, sf_dir, "customer"))
    out = OrdinalEncoder(["c_mktsegment"], derived_columns=["seg_code"])(ds)
    return out.df.select("c_custkey", "c_mktsegment", "seg_code")


def _sql_q25() -> str:
    return """
    WITH codes AS (
        SELECT c_mktsegment AS v,
               CAST(row_number() OVER (ORDER BY c_mktsegment) - 1 AS BIGINT) AS code
        FROM (SELECT DISTINCT c_mktsegment FROM customer WHERE c_mktsegment IS NOT NULL)
    )
    SELECT c_custkey, c_mktsegment, codes.code AS seg_code
    FROM customer LEFT JOIN codes ON c_mktsegment = codes.v
    """


def q26_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 threshold binning of l_quantity (thresholds land in higher bin)."""
    ds = from_df(_t(spark, sf_dir, "lineitem"))
    out = split_continuous_column_into_bins(ds, "l_quantity", [10, 25, 40])
    return out.df.groupBy("l_quantity_bin_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("l_quantity"), 2).alias("min_q"),
        F.round(F.max("l_quantity"), 2).alias("max_q"),
    )


def _sql_q26() -> str:
    return """
    WITH b AS (
        SELECT l_quantity,
               CAST(CASE WHEN l_quantity IS NOT NULL
                          AND l_quantity >= (SELECT min(l_quantity) - 1 FROM lineitem)
                          AND l_quantity <= (SELECT max(l_quantity) FROM lineitem)
                    THEN (CASE WHEN l_quantity >= 10 THEN 1 ELSE 0 END
                        + CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END
                        + CASE WHEN l_quantity >= 40 THEN 1 ELSE 0 END)
                    END AS SMALLINT) AS l_quantity_bin_id
        FROM lineitem
    )
    SELECT l_quantity_bin_id, count(*) AS n,
           round(min(l_quantity), 2) AS min_q, round(max(l_quantity), 2) AS max_q
    FROM b GROUP BY 1
    """


def q27_combo_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 categorical-combination id over (l_returnflag, l_linestatus)."""
    ds = from_df(_t(spark, sf_dir, "lineitem"))
    out, name = combine_categorical_columns_to_one(
        ds, ("l_returnflag", "l_linestatus")
    )
    return out.df.select(
        "l_orderkey",
        "l_linenumber",
        F.col(name).alias("combo_id"),
    )


def _sql_q27() -> str:
    return """
    WITH v1 AS (
        SELECT l_returnflag AS v,
               row_number() OVER (ORDER BY l_returnflag) - 1 AS c
        FROM (SELECT DISTINCT l_returnflag FROM lineitem WHERE l_returnflag IS NOT NULL)
    ), v2 AS (
        SELECT l_linestatus AS v,
               row_number() OVER (ORDER BY l_linestatus) - 1 AS c
        FROM (SELECT DISTINCT l_linestatus FROM lineitem WHERE l_linestatus IS NOT NULL)
    )
    SELECT l_orderkey, l_linenumber,
           CAST(v1.c * (SELECT count(*) FROM v2) + v2.c AS SMALLINT) AS combo_id
    FROM lineitem
    LEFT JOIN v1 ON l_returnflag = v1.v
    LEFT JOIN v2 ON l_linestatus = v2.v
    """


def q28_group_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4 per-group binning of p_retailprice by p_brand (uniform bins,
    fallback group Brand#4 for brands under 70 samples)."""
    ds = from_df(_t(spark, sf_dir, "part"))
    out, _ = add_group_specific_bin_id(
        ds,
        "p_retailprice",
        "p_brand",
        "Brand#4",
        new_column_name="price_bin",
        bin_thresh_increase=1,
        bin_count=5,
        sample_count_threshold=70,
    )
    return out.df.select("p_partkey", "p_brand", "price_bin")


def _sql_q28() -> str:
    return """
    WITH gs AS (
        SELECT p_brand AS g, min(p_retailprice) AS mn, max(p_retailprice) AS mx,
               count(p_retailprice) AS cnt
        FROM part GROUP BY 1
    ), fb AS (SELECT mn, mx FROM gs WHERE g = 'Brand#4'),
    eff AS (
        SELECT gs.g,
               CASE WHEN gs.cnt < 70 THEN fb.mn ELSE gs.mn END AS mn,
               CASE WHEN gs.cnt < 70 THEN fb.mx ELSE gs.mx END AS mx
        FROM gs, fb
    )
    SELECT p_partkey, p_brand,
           CAST(CASE WHEN p_retailprice IS NOT NULL
                      AND p_retailprice >= eff.mn - eff.mn * 1e-10
                      AND p_retailprice <= eff.mx + 1
                THEN least(
                    (CASE WHEN p_retailprice >= (eff.mx - eff.mn)/5*1 + eff.mn THEN 1 ELSE 0 END
                   + CASE WHEN p_retailprice >= (eff.mx - eff.mn)/5*2 + eff.mn THEN 1 ELSE 0 END
                   + CASE WHEN p_retailprice >= (eff.mx - eff.mn)/5*3 + eff.mn THEN 1 ELSE 0 END
                   + CASE WHEN p_retailprice >= (eff.mx - eff.mn)/5*4 + eff.mn THEN 1 ELSE 0 END), 4)
                END AS SMALLINT) AS price_bin
    FROM part JOIN eff ON p_brand = eff.g
    """


def q29_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2/R3 typo-repair cascade over synthesized dirty numerics (decimal
    commas, degree suffixes, out-of-scale markers, junk words)."""
    li = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("string")
    dirty = (
        F.when(F.col("l_orderkey") % 11 == 0, F.lit("---"))
        .when(F.col("l_orderkey") % 7 == 0, F.concat(F.lit(">"), qty))
        .when(F.col("l_orderkey") % 5 == 0, F.concat(qty, F.lit("°")))
        .when(F.col("l_orderkey") % 3 == 0, F.replace(qty, F.lit("."), F.lit(",")))
        .otherwise(qty)
    )
    from pytrousse_spark.functions.numeric_repair import with_repaired

    df = li.select(
        "l_orderkey", "l_linenumber", dirty.alias("dirty"), dirty.alias("fixed")
    )
    return with_repaired(df, ("fixed",)).withColumn(
        "fixed", F.round(F.col("fixed"), 6)
    )


def _sql_q29() -> str:
    dirty = """
        CASE WHEN l_orderkey % 11 = 0 THEN '---'
             WHEN l_orderkey % 7 = 0 THEN '>' || CAST(l_quantity AS VARCHAR)
             WHEN l_orderkey % 5 = 0 THEN CAST(l_quantity AS VARCHAR) || '°'
             WHEN l_orderkey % 3 = 0 THEN replace(CAST(l_quantity AS VARCHAR), '.', ',')
             ELSE CAST(l_quantity AS VARCHAR) END
    """
    return f"""
    WITH d AS (
        SELECT l_orderkey, l_linenumber, {dirty} AS dirty FROM lineitem
    )
    SELECT l_orderkey, l_linenumber, dirty,
           round({repair_sql('dirty')}, 6) AS fixed
    FROM d
    """


def q30_anonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2-N4 anonymization of customer names (deterministic salted scheme)."""
    ds = from_df(_t(spark, sf_dir, "customer"))
    out, _priv = anonymize_data(ds, ["c_name"], ["c_name"], salt="graft")
    return out.df.select(
        "c_custkey", "ID_OWNER", F.round("c_acctbal", 2).alias("c_acctbal")
    )


def _sql_q30() -> str:
    return f"""
    SELECT c_custkey, {id_owner_sql(['c_name'], 'graft')} AS ID_OWNER,
           round(c_acctbal, 2) AS c_acctbal
    FROM customer
    """


# ===========================================================================
# LLM-data-pipeline operators (dedup / similarity / text / multimodal)
# ===========================================================================
def q40_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one survivor (min doc_id) per (lang, source) group."""
    d = _t(spark, sf_dir, "documents")
    out = dd.exact_dedup(d, ["lang", "source"], "doc_id")
    return out.select("lang", "source", "doc_id", "n_chars")


def _sql_q40() -> str:
    return """
    SELECT lang, source,
           arg_min(doc_id, doc_id) AS doc_id,
           arg_min(n_chars, doc_id) AS n_chars
    FROM documents GROUP BY lang, source
    """


def q41_dup_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-group census on the exact-dedup key."""
    d = _t(spark, sf_dir, "documents")
    return dd.duplicate_groups(d, ["lang", "source"])


def _sql_q41() -> str:
    return """
    SELECT lang, source, count(*) AS dup_count
    FROM documents GROUP BY lang, source HAVING count(*) > 1
    """


def q42_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (8 perms over word 3-shingles, portable hash)."""
    d = _t(spark, sf_dir, "documents")
    staged = dd.with_minhash_signature(d, "text", num_perm=8)
    cols = [
        F.element_at(F.col("__sig"), i + 1).alias(f"sig_{i}") for i in range(8)
    ]
    return staged.select("doc_id", *cols)


def _sql_q42() -> str:
    sig = dd.minhash_signature_sql("text", num_perm=8)
    cols = ", ".join(f"__sig[{i + 1}] AS sig_{i}" for i in range(8))
    return f"SELECT doc_id, {cols} FROM (SELECT doc_id, {sig} AS __sig FROM documents)"


def q43_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs (8 perms, 4 bands)."""
    d = _t(spark, sf_dir, "documents")
    return dd.minhash_lsh_pairs(d, "text", "doc_id", num_perm=8, bands=4)


def _sql_q43() -> str:
    sig = dd.minhash_signature_sql("text", num_perm=8)
    return f"""
    WITH sigs AS (SELECT doc_id, {sig} AS s FROM documents),
    banded AS (
        SELECT doc_id, unnest([
            '0_' || s[1] || '_' || s[2],
            '1_' || s[3] || '_' || s[4],
            '2_' || s[5] || '_' || s[6],
            '3_' || s[7] || '_' || s[8]
        ]) AS band
        FROM sigs
    )
    SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
    FROM banded l JOIN banded r USING (band)
    WHERE l.doc_id < r.doc_id
    """


def q44_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard pairs >= 0.2 (inverted-index join)."""
    d = _t(spark, sf_dir, "documents")
    return dd.ngram_jaccard_pairs(d, "text", "doc_id", n=3, threshold=0.2)


def _sql_q44() -> str:
    return dd.ngram_jaccard_pairs_sql("documents", "text", "doc_id", 3, 0.2)


def q54_near_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed production near-dedup: LSH candidates (8 perms, 4 bands) →
    exact n-gram Jaccard >= 0.2 computed only for candidates."""
    d = _t(spark, sf_dir, "documents")
    return dd.near_dedup_pairs(
        d, "text", "doc_id", num_perm=8, bands=4, threshold=0.2
    )


def _sql_q54() -> str:
    return dd.near_dedup_pairs_sql(
        "documents", "text", "doc_id", num_perm=8, bands=4, threshold=0.2
    )


def q55_near_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surviving doc ids after composed near-dedup (greedy min-id survivor)."""
    d = _t(spark, sf_dir, "documents")
    out = dd.near_dedup(
        d, "text", "doc_id", num_perm=8, bands=4, threshold=0.2
    )
    return out.select("doc_id")


def _sql_q55() -> str:
    pairs = dd.near_dedup_pairs_sql(
        "documents", "text", "doc_id", num_perm=8, bands=4, threshold=0.2
    )
    return f"""
    SELECT doc_id FROM documents
    WHERE doc_id NOT IN (SELECT id_b FROM ({pairs}))
    """


def q56_embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup, LSH-composed production path: hyperplane-bucket
    candidate pairs → exact-fold cosine verify (cos >= 0.4). Nothing
    quadratic, nothing collected — the path a 100 TB corpus runs (the exact
    sweep q46 is the oracle baseline)."""
    e = _t(spark, sf_dir, "embeddings")
    return dd.embedding_neardup_lsh(e, "embedding", "vec_id", dim=64)


def _sql_q56() -> str:
    return dd.embedding_neardup_lsh_sql("embeddings", "embedding", "vec_id", dim=64)


def q45_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash fingerprints (staged token-hash array)."""
    d = _t(spark, sf_dir, "documents")
    return dd.with_simhash(d, "text").select("doc_id", "simhash16")


def _sql_q45() -> str:
    return f"SELECT doc_id, {dd.simhash_sql('text')} AS simhash16 FROM documents"


def q46_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos >= 0.3).

    Uses the sequential-fold numpy stage — bit-identical to the pure
    expression fold (and the DuckDB oracle), ~10× faster on the O(n²) pair
    sweep."""
    e = _t(spark, sf_dir, "embeddings")
    return dd.embedding_neardup_pairs(
        e, "embedding", "vec_id", threshold=0.3, method="exact_np"
    )


def _sql_q46() -> str:
    from pytrousse_spark.functions.vectors import cosine_sql

    cs = cosine_sql("a.embedding", "b.embedding", 64)
    return f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, round({cs}, 6) AS cos
    FROM embeddings a, embeddings b
    WHERE a.vec_id < b.vec_id AND round({cs}, 6) >= 0.3
    """


def q46b_neardup_blas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-scale near-dup path (broadcast matrix + Arrow-batched BLAS
    matmul) with the parity assertion INSIDE the query: full-outer join of
    the BLAS pair set against the exact-fold pair set. The oracle expects
    (n_pairs, 0, 0) — any BLAS/fold disagreement flips a count and fails the
    hash check. Raw BLAS-path timing is tracked separately in bench extras.
    The parity sweep runs on a deterministic third of the vectors (vec_id %
    3 = 0, ~1/9 of the pair work): pytest exercises the full-set parity, so
    the headline bench stops paying ~2s for a proof that is already pinned
    elsewhere (round-2 VERDICT item 8)."""
    e = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") % 3 == 0)
    blas = dd.embedding_neardup_pairs(
        e, "embedding", "vec_id", threshold=0.3, method="blas"
    ).select("id_a", "id_b", F.lit(1).alias("__b"))
    exact = dd.embedding_neardup_pairs(
        e, "embedding", "vec_id", threshold=0.3, method="exact_np"
    ).select("id_a", "id_b", F.lit(1).alias("__e"))
    j = blas.join(exact, ["id_a", "id_b"], "full_outer")
    return j.agg(
        F.sum(
            F.when(F.col("__b").isNotNull() & F.col("__e").isNotNull(), 1)
            .otherwise(0)
        ).cast("long").alias("n_pairs"),
        F.sum(F.when(F.col("__e").isNull(), 1).otherwise(0))
        .cast("long").alias("n_only_blas"),
        F.sum(F.when(F.col("__b").isNull(), 1).otherwise(0))
        .cast("long").alias("n_only_expr"),
    )


def _sql_q46b() -> str:
    from pytrousse_spark.functions.vectors import cosine_sql

    cs = cosine_sql("a.embedding", "b.embedding", 64)
    return f"""
    SELECT count(*) AS n_pairs,
           CAST(0 AS BIGINT) AS n_only_blas,
           CAST(0 AS BIGINT) AS n_only_expr
    FROM (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM embeddings a, embeddings b
        WHERE a.vec_id % 3 = 0 AND b.vec_id % 3 = 0
          AND a.vec_id < b.vec_id AND round({cs}, 6) >= 0.3
    )
    """


def q47_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 neighbors for queries vec_id < 10."""
    e = _t(spark, sf_dir, "embeddings")
    return sim.cosine_topk(e, e.where("vec_id < 10"), 5)


def _sql_q47() -> str:
    return sim.cosine_topk_sql("embeddings", 5, 64, query_filter="q.vec_id < 10")


def q64_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination check over the q61 hash split: training documents
    containing >=30% of a test document's distinct 3-grams (containment
    |A∩B|/|B| — a long train doc embedding a short benchmark item still
    scores high). Bench side broadcasts; the corpus never shuffles."""
    from pytrousse_spark.operators import sampling as sp

    d = _t(spark, sf_dir, "documents")
    split = sp.hash_split(d, "doc_id")
    train = split.where("split = 'train'").select("doc_id", "text")
    test = split.where("split = 'test'").select("doc_id", "text")
    return dd.contamination_pairs(train, test, min_containment=0.3)


def _sql_q64() -> str:
    from pytrousse_spark.operators import sampling as sp

    case = sp.hash_split_sql("doc_id")
    return dd.contamination_pairs_sql(
        f"(SELECT doc_id, text FROM documents WHERE {case} = 'train') tr",
        f"(SELECT doc_id, text FROM documents WHERE {case} = 'test') te",
        min_containment=0.3,
    )


def q63_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-token-window chunking with overlap (32/8): the pre-training
    chunk step as a pure expression pipeline — tokens staged once, chunk
    starts from a sequence explode, linear fan-out."""
    d = _t(spark, sf_dir, "documents")
    return tx.chunk_documents(d, "text", "doc_id", chunk_tokens=32, overlap=8)


def _sql_q63() -> str:
    return tx.chunk_documents_sql(
        "documents", "text", "doc_id", chunk_tokens=32, overlap=8
    )


def q66_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary with document frequencies (min 5 occurrences) —
    one explode + one aggregation, scan-bound at any corpus size."""
    d = _t(spark, sf_dir, "documents")
    return tx.vocabulary(d, "text", "doc_id", min_count=5)


def _sql_q66() -> str:
    return tx.vocabulary_sql("documents", "text", "doc_id", min_count=5)


def q67_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (tf · ln(N/df), rounded tie-break on
    token) — the classic relevance ranking as explode + two aggs + window."""
    d = _t(spark, sf_dir, "documents")
    return tx.tfidf_top_terms(d, "text", "doc_id", k=3)


def _sql_q67() -> str:
    return tx.tfidf_top_terms_sql("documents", "text", "doc_id", k=3)


def q69_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio-metadata decode: synthesize a valid RIFF/WAVE payload per
    document (parameters derived from doc_id + token count), then recover
    the parameters from the BYTES ALONE by walking the chunk list — the
    oracle predicts the same values by formula, so a decoder bug breaks the
    hash match."""
    from pytrousse_spark.operators.multimodal import (
        decode_wav_meta,
        synthesize_wav_column,
    )

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.size(tx.tokens(F.col("text"))).cast("long").alias("n_tokens")
    )
    wav = synthesize_wav_column(d)
    return decode_wav_meta(wav)


def _sql_q69() -> str:
    toks = tx.tokens_sql("text")
    return f"""
    SELECT doc_id,
           CAST(8000 + (doc_id % 3) * 4000 AS INT) AS sample_rate,
           CAST(1 + doc_id % 2 AS INT) AS channels,
           16 AS bit_depth,
           CAST(len({toks}) * 10 AS BIGINT) AS n_samples,
           round(len({toks}) * 10 * 1000.0
                 / (8000 + (doc_id % 3) * 4000), 3) AS duration_ms
    FROM documents
    """


def q68_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concatenate-and-split sequence packing (256-token budget,
    8 hash shards): per document, the packed sequence it starts in and its
    offset — windowed cumulative sums within shards, no global order."""
    from pytrousse_spark.operators import packing as pk

    d = _t(spark, sf_dir, "documents")
    return pk.pack_documents(d, "text", "doc_id")


def _sql_q68() -> str:
    from pytrousse_spark.operators import packing as pk

    return pk.pack_documents_sql("documents", "text", "doc_id")


def q65_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive duplicate clusters: connected components over the verified
    near-dup pair graph (iterative min-label propagation — one shuffle per
    round, rounds = graph diameter). Oracle replays the closure with a
    recursive CTE."""
    d = _t(spark, sf_dir, "documents")
    pairs = dd.near_dedup_pairs(
        d, "text", "doc_id", num_perm=8, bands=4, threshold=0.2
    )
    return dd.connected_components(pairs).select(
        F.col("id").alias("doc_id"), F.col("component")
    )


def _sql_q65() -> str:
    pairs = dd.near_dedup_pairs_sql(
        "documents", "text", "doc_id", num_perm=8, bands=4, threshold=0.2
    )
    return f"""
    WITH RECURSIVE edges AS (
      SELECT id_a AS src, id_b AS dst FROM ({pairs})
      UNION SELECT id_b, id_a FROM ({pairs})
    ), reach(id, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
    )
    SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id
    """


def q61_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible train/val/test assignment by salted content hash (the
    hash-mod split of large-scale pipelines — stable across engines, runs,
    and repartitioning, unlike randomSplit) + per-split census."""
    from pytrousse_spark.operators import sampling as sp

    d = _t(spark, sf_dir, "documents")
    out = sp.hash_split(d, "doc_id")
    return out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(F.length("text")), 4).alias("avg_len"),
    )


def _sql_q61() -> str:
    from pytrousse_spark.operators import sampling as sp

    case = sp.hash_split_sql("doc_id")
    return f"""
    SELECT {case} AS split, count(*) AS n_docs,
           round(avg(length(text)), 4) AS avg_len
    FROM documents GROUP BY 1
    """


def q62_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10-docs-per-language downsample (min salted hash, ties
    by id) — reproducible stratified sampling, one window shuffle."""
    from pytrousse_spark.functions import text as tx
    from pytrousse_spark.operators import sampling as sp

    from pytrousse_spark.io import rebalance_undersplit

    d = rebalance_undersplit(_t(spark, sf_dir, "documents")).withColumn(
        "lang_guess", tx.lang_id(F.col("text"))
    )
    out = sp.hash_topk_per_group(d, ["lang_guess"], 10, "doc_id")
    return out.select("lang_guess", "doc_id")


def _sql_q62() -> str:
    from pytrousse_spark.functions import text as tx
    from pytrousse_spark.operators import sampling as sp

    inner = sp.hash_topk_per_group_sql(
        "(SELECT doc_id, " + tx.lang_id_sql("text") + " AS lang_guess FROM documents) s",
        ["lang_guess"],
        10,
        "doc_id",
    )
    return f"SELECT lang_guess, doc_id FROM ({inner})"


def q60_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join (bucketed, canonical-bucket dedup — no
    distinct): shipments in transit [shipdate, shipdate + qty%14 days]
    overlapped against a 52-week 1996 calendar; per-week transit census."""
    from pytrousse_spark.operators.rangejoin import interval_join

    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between("1996-01-01", "1996-12-31")
    )
    day0 = F.lit("1970-01-01")
    lo = F.datediff(F.col("l_shipdate"), day0)
    l = li.select(
        lo.cast("double").alias("l_lo"),
        (lo + F.col("l_quantity").cast("int") % 14).cast("double").alias("l_hi"),
        "l_quantity",
    )
    # 9496 = day number of 1996-01-01
    wk = spark.range(52).select(
        (F.lit(9496) + F.col("id") * 7).cast("double").alias("r_lo"),
        (F.lit(9496) + F.col("id") * 7 + 6).cast("double").alias("r_hi"),
    )
    out = interval_join(
        l, wk, "l_lo", "l_hi", "r_lo", "r_hi", bucket_width=7.0
    )
    return (
        out.groupBy("r_lo")
        .agg(
            F.count(F.lit(1)).alias("n_transit"),
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        )
        .select(
            F.date_add(F.lit("1970-01-01").cast("date"), F.col("r_lo").cast("int"))
            .alias("week_start"),
            "n_transit",
            "sum_qty",
        )
    )


def _sql_q60() -> str:
    return """
    WITH li AS (
      SELECT (CAST(l_shipdate AS DATE) - DATE '1970-01-01') AS l_lo,
             (CAST(l_shipdate AS DATE) - DATE '1970-01-01')
               + (CAST(l_quantity AS INT) % 14) AS l_hi,
             l_quantity
      FROM lineitem
      WHERE l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
    ), wk AS (
      SELECT 9496 + 7 * k AS r_lo, 9496 + 7 * k + 6 AS r_hi
      FROM (SELECT unnest(range(0, 52)) AS k)
    )
    SELECT DATE '1970-01-01' + CAST(r_lo AS INT) AS week_start,
           count(*) AS n_transit,
           round(sum(l_quantity), 4) AS sum_qty
    FROM li JOIN wk ON l_lo <= r_hi AND r_lo <= l_hi
    GROUP BY r_lo
    """


def q59_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed training-corpus prep: language/quality/length gates → exact
    fingerprint dedup → verified near-dedup (min-id survivors). The whole
    pre-training cleaning flow as one pipeline."""
    from pytrousse_spark.operators import corpus as cp

    d = _t(spark, sf_dir, "documents")
    return cp.clean_corpus(d)


def _sql_q59() -> str:
    from pytrousse_spark.operators import corpus as cp

    return cp.clean_corpus_sql("documents")


def q58_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL pairs at simhash-Hamming <= 3 over 32-bit fingerprints — exact
    result at bucket-join cost via the Manku-Jain-Das Sarma pigeonhole band
    trick (4 bands of 8 bits; any <=3-bit difference matches one band)."""
    d = _t(spark, sf_dir, "documents")
    return dd.simhash_pairs(d, "text", "doc_id", bits=32)


def _sql_q58() -> str:
    return dd.simhash_pairs_sql("documents", "text", "doc_id", bits=32)


def q57_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat approximate top-5 for queries vec_id < 40: hash-picked
    coarse centroids, map-side cell assignment (no shuffle), nprobe=4 probe
    + exact re-rank over co-located candidates only."""
    e = _t(spark, sf_dir, "embeddings")
    return sim.ivf_topk(e, e.where("vec_id < 40"), 5)


def _sql_q57() -> str:
    return sim.ivf_topk_sql("embeddings", 5, 64, query_filter="e.vec_id < 40")


def q90_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization search for queries vec_id < 40: 64-dim float32
    vectors compress to 8 k-means-trained codes (map-side expression
    encode — no shuffle, no Python); ADC scores pairs with 8 broadcast-LUT
    lookups, the top-100 candidates re-rank exactly. Completes the
    similarity ladder: exact (q47) → LSH → IVF (q57) → PQ (IVF-PQ at
    scale = this encode inside q57's cells).
    """
    from pytrousse_spark.operators import quantization as pq

    e = _t(spark, sf_dir, "embeddings")
    books = _pq_books(spark, sf_dir)
    return pq.pq_adc_topk(
        e, e.where("vec_id < 40"), "vec_id", "embedding", books, k=5, rerank=100
    )


def _sql_q90() -> str:
    from pytrousse_spark.operators.quantization import pq_adc_topk_sql

    return pq_adc_topk_sql(
        "embeddings", 5, 64, num_sub=8, num_cent=16, iters=2, rerank=100,
        query_filter="q.vec_id < 40",
    )


def q91_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis–Spirakis weighted sample: 100 documents drawn
    proportionally to n_chars, deterministic given the salt. Map-side key
    expression + TakeOrderedAndProject — the non-sampled mass never
    shuffles."""
    from pytrousse_spark.operators.sampling import weighted_sample

    d = _t(spark, sf_dir, "documents")
    out = weighted_sample(
        d.select("doc_id", "n_chars"), "doc_id", "n_chars", k=100
    )
    return out.select("doc_id", "n_chars", "es_key")


def _sql_q91() -> str:
    from pytrousse_spark.operators.sampling import weighted_sample_sql

    return weighted_sample_sql(
        "documents", "doc_id", "n_chars", k=100,
        select_cols="doc_id, n_chars",
    )


def q92_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-defused equi-join behind the oracle gate: lineitem salted
    across 16 buckets joins the orders dim exploded 16x, so a hot orderkey
    spreads over 16 tasks instead of one straggler. The result is
    salt-invariant, so the oracle is the plain join — this pins that
    salting changes the distribution, never the answer."""
    from pytrousse_spark.operators.relational import salted_join

    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    j = salted_join(li, od, on="l_orderkey", salt_buckets=16)
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
        .alias("revenue"),
    )


def _sql_q92() -> str:
    return """
    SELECT o_orderpriority, count(*) AS n_lines,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """


def q93_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-trained add-one bigram LM, per-document NLL — the model-based
    quality gate one step past q74's unigram surprisal (CCNet's KenLM
    filter, engine-native). Token-keyed shuffles only; exact micro-unit
    sums keep the per-doc fold engine-portable."""
    d = _t(spark, sf_dir, "documents")
    return tx.bigram_nll(d, "text", "doc_id")


def _sql_q93() -> str:
    return tx.bigram_nll_sql("documents", "text", "doc_id")


def q94_stream_enrich_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-static enrichment join (streaming/events.py
    enrich_events_stream; availableNow parity pinned in tests): events
    broadcast-join a synthetic user-segment dim, aggregate per segment."""
    from pytrousse_spark.streaming.events import enrich_events_stream

    ev = _t(spark, sf_dir, "events")
    dim = spark.createDataFrame(
        [(i, "heavy" if i % 3 == 0 else "light") for i in range(200)],
        ["user_id", "segment"],
    )
    return enrich_events_stream(ev, dim)


def _sql_q94() -> str:
    return """
    WITH dim AS (
        SELECT i AS user_id,
               CASE WHEN i % 3 = 0 THEN 'heavy' ELSE 'light' END AS segment
        FROM generate_series(0, 199) AS g(i)
    )
    SELECT segment, count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM events JOIN dim USING (user_id)
    GROUP BY segment
    """


def q95_png_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG codec round trip, oracle-certified: each document id
    becomes a genuine 24x16 grayscale PNG (zlib IDAT, scanline filters
    cycling through all five standard types), decoded back by the
    pure-stdlib chunk-walk/inflate/unfilter path; the decoded pixel
    checksum must equal the oracle's closed form over the generating
    formula. Upgrades the round-2 'image decode honestly stubbed' caveat
    to a tested codec for the PNG/gray8 subset."""
    from pytrousse_spark.operators.multimodal import (
        decode_png_meta,
        synthesize_png_column,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id").orderBy("doc_id").limit(200)
    media = synthesize_png_column(d, "doc_id", width=24, height=16)
    return decode_png_meta(media, "media", "doc_id")


def _sql_q95() -> str:
    return """
    SELECT doc_id,
           CAST(24 AS INT) AS width,
           CAST(16 AS INT) AS height,
           CAST(8 AS INT) AS bit_depth,
           CAST(0 AS INT) AS color_type,
           CAST((SELECT SUM((doc_id * 7 + 3 * x.i + 5 * y.j) % 256)
                 FROM generate_series(0, 23) AS x(i),
                      generate_series(0, 15) AS y(j)) AS BIGINT) AS pixel_sum
    FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 200)
    """


def q96_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout key over (n_chars, doc_id mod 2^16): the
    sort key that clusters rows close in BOTH dimensions into the same
    files so min/max statistics prune scans on either predicate
    (OPTIMIZE ZORDER in lakehouse engines). Bit-exact integer expression;
    top-200 by key via TakeOrderedAndProject."""
    from pytrousse_spark.operators.relational import zorder_key

    d = _t(spark, sf_dir, "documents")
    a = F.pmod(F.col("n_chars"), F.lit(1 << 16))
    b = F.pmod(F.col("doc_id"), F.lit(1 << 16))
    return (
        d.select(
            "doc_id",
            "n_chars",
            zorder_key(a, b, bits=16).alias("zkey"),
        )
        .orderBy("zkey", "doc_id")
        .limit(200)
    )


def _sql_q96() -> str:
    from pytrousse_spark.operators.relational import zorder_key_sql

    z = zorder_key_sql("(n_chars % 65536)", "(doc_id % 65536)", bits=16)
    return f"""
    SELECT doc_id, n_chars, CAST({z} AS BIGINT) AS zkey
    FROM documents
    ORDER BY zkey, doc_id LIMIT 200
    """


def q97_band_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the STREAMING near-dup alert operator
    (streaming/neardup.py — per-band state, one id per band): every doc
    sharing an LSH band with the band's first doc raises
    (band, first_doc, dup_doc). The stream's availableNow drain is pinned
    equal to this plan in tests, so the streaming path sits transitively
    behind this oracle row."""
    from pytrousse_spark.streaming.neardup import near_dup_band_alerts

    d = _t(spark, sf_dir, "documents")
    return near_dup_band_alerts(d, "text", "doc_id", num_perm=8, bands=4)


def _sql_q97() -> str:
    sig = dd.minhash_signature_sql("text", num_perm=8)
    return f"""
    WITH sigs AS (SELECT doc_id, {sig} AS s FROM documents),
    banded AS (
        SELECT doc_id, unnest([
            '0_' || s[1] || '_' || s[2],
            '1_' || s[3] || '_' || s[4],
            '2_' || s[5] || '_' || s[6],
            '3_' || s[7] || '_' || s[8]
        ]) AS band
        FROM sigs
    ),
    firsts AS (SELECT band, min(doc_id) AS first_doc FROM banded GROUP BY band)
    SELECT b.band, f.first_doc, b.doc_id AS dup_doc
    FROM banded b JOIN firsts f USING (band)
    WHERE b.doc_id <> f.first_doc
    """


def q98_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-evaluation surface: confusion matrix of the stopword
    language-ID against the labeled lang column, plus per-cell share of
    the labeled language's row total. One scan + one (label, predicted)
    hash agg + a broadcast-sized row-total window."""
    from pytrousse_spark.io import rebalance_undersplit

    d = rebalance_undersplit(_t(spark, sf_dir, "documents"))
    cm = (
        d.where(F.col("text").isNotNull())
        .select(F.col("lang").alias("label"), tx.lang_id(F.col("text")).alias("predicted"))
        .groupBy("label", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("label")
    return cm.select(
        "label",
        "predicted",
        "n",
        F.round(F.col("n") / F.sum("n").over(w), 4).alias("row_share"),
    )


def _sql_q98() -> str:
    pred = tx.lang_id_sql("text")
    return f"""
    WITH cm AS (
        SELECT lang AS label, {pred} AS predicted, count(*) AS n
        FROM documents WHERE text IS NOT NULL
        GROUP BY label, predicted
    )
    SELECT label, predicted, n,
           round(n / (CAST(sum(n) OVER (PARTITION BY label) AS DOUBLE)), 4)
             AS row_share
    FROM cm
    """


def q99_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable HyperLogLog: estimate the number of distinct word
    3-shingles in the corpus from 2^12 registers, vs the exact count.
    Registers use pure integer rank math (no float log), so the sketch is
    bit-for-bit reproducible by the oracle — the third sketch in the
    family (Bloom q87, Count-Min q88); Spark's approx_count_distinct is
    the same idea with engine-private hashing. One bounded hash-agg
    shuffle; the registers collect is 4096 small ints."""
    from pytrousse_spark.operators.sketch import hll_estimate_row, hll_registers
    from pytrousse_spark.functions.text import word_shingles
    from pytrousse_spark.io import rebalance_undersplit

    # md5+shingle work per row justifies spreading the undersplit scan
    # (same rule as the minhash/simhash staging; no-op at real scale)
    d = rebalance_undersplit(_t(spark, sf_dir, "documents")).where(
        F.col("text").isNotNull()
    )
    keys = d.select(F.explode(word_shingles(F.col("text"), 3)).alias("k"))
    # ONE job end to end (r12 VERDICT item 3, guide §2.2): the distinct
    # pass feeds a single register agg that ALSO counts rows per bucket,
    # so exact = sum(c) over the 4096 collected registers — no second
    # aggregation over (and no checkpoint of) the corpus-sized distinct
    # shingle set (r12 shape: distinct checkpoint + registers agg +
    # separate count() job).
    dk = keys.distinct()
    regs = hll_registers(dk, "k", p=12, with_count=True)
    rows = regs.collect()
    est = hll_estimate_row([(r["bucket"], r["r"]) for r in rows], p=12)
    exact = sum(r["c"] for r in rows)
    rel = round(abs(est["estimate"] - exact) / exact, 4)
    return spark.createDataFrame(
        [(est["estimate"], est["zero_registers"], exact, rel)],
        "estimate double, zero_registers long, exact_distinct long, rel_err double",
    )


def _sql_q99() -> str:
    from pytrousse_spark.operators.sketch import hll_sql
    from pytrousse_spark.functions.text import word_shingles_sql

    inner = hll_sql("SELECT k FROM keys", "k", p=12)
    return f"""
    WITH keys AS (
        SELECT unnest({word_shingles_sql('text', 3)}) AS k
        FROM documents WHERE text IS NOT NULL
    ), hll AS ({inner}),
    ex AS (SELECT CAST(count(DISTINCT k) AS BIGINT) AS exact_distinct FROM keys)
    SELECT hll.estimate,
           CAST(hll.zero_registers AS BIGINT) AS zero_registers,
           ex.exact_distinct,
           round(abs(hll.estimate - ex.exact_distinct) / ex.exact_distinct, 4)
             AS rel_err
    FROM hll, ex
    """


_HISTQ = (0.25, 0.5, 0.75, 0.95)


def q100_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram quantile sketch: l_extendedprice quantiles from a
    4096-bin equi-width histogram — ONE min/max/count pass plus ONE
    fixed-size hash agg (shuffle bounded by B, no sort), then a B-row
    collect + interpolation. Completes the sketch family: membership
    (q87), frequency (q88), distinct (q99), quantiles.

    This is the 100 TB scale path and the whole gate query; the exact
    percentile() comparison (which buffers every value in one final
    aggregation — 8.0s of a 12.8s wall at sf0.1, measured r3) now lives in
    bench extra x100, the same declared-baseline treatment as x46."""
    from pytrousse_spark.operators.sketch import histogram_quantile_estimates

    li = _t(spark, sf_dir, "lineitem")
    ests = histogram_quantile_estimates(
        li, "l_extendedprice", list(_HISTQ), num_bins=4096
    )
    return spark.createDataFrame(
        [(e["q"], e["estimate"]) for e in ests], "q double, estimate double"
    )


def _sql_q100() -> str:
    from pytrousse_spark.operators.sketch import histogram_quantiles_sql

    return histogram_quantiles_sql(
        "lineitem", "l_extendedprice", list(_HISTQ), num_bins=4096
    )


def q101_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ search for queries vec_id < 40 — the similarity ladder's end
    state (q57 x q90): corpus rows get a coarse IVF cell AND an 8-subspace
    PQ code in one map-side pass; queries probe their 4 nearest cells;
    co-located candidates are ADC-scored (8 LUT lookups each, not 64
    multiplications), and only the ADC top-100 per query pays the exact
    cosine. Same nprobe as q57 with strictly less scored work: the exact
    evaluations per query are capped at rerank instead of every co-located
    candidate, and ADC reads 8-byte codes instead of 256-byte vectors."""
    from pytrousse_spark.operators import quantization as pq

    e = _t(spark, sf_dir, "embeddings")
    books = _pq_books(spark, sf_dir)
    return pq.ivf_pq_topk(
        e, e.where("vec_id < 40"), "vec_id", "embedding", books,
        k=5, num_cells=16, nprobe=4, rerank=100,
    )


def _sql_q101() -> str:
    from pytrousse_spark.operators.quantization import ivf_pq_topk_sql

    # unqualified filter: resolves against the corpus alias in both the
    # probes (e) and lut (q) contexts of the twin
    return ivf_pq_topk_sql(
        "embeddings", 5, 64, num_sub=8, num_cent=16, iters=2,
        num_cells=16, nprobe=4, rerank=100, query_filter="vec_id < 40",
    )


def q102_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV ingestion behind the hash gate (SURVEY §2.1 S1/S5): the
    documents table is written to CSV (quoted, escaped) and read back
    through ``io.read_csv`` with an explicit schema — the 100 TB-correct
    path; no inference pass — plus multiLine/escape for embedded newlines.
    The returned per-source profile (row count, distinct ids, char mass,
    and a text-content hash signature) is computed ONLY from the re-read
    CSV, while the oracle computes it from the original parquet — any
    value corrupted by the serialize/parse trip flips the signature."""
    import tempfile

    from pyspark.sql import types as T

    from pytrousse_spark import io as pio
    from pytrousse_spark.functions.hashing import h60

    d = _t(spark, sf_dir, "documents")
    # per-session path: the result is collected lazily AFTER this function
    # returns, so the directory must outlive the call; keying it by
    # applicationId keeps concurrent harnesses (driver battery, bench,
    # pytest) from clobbering each other's files mid-read. On a real
    # cluster this would be shared storage, not driver-local tmp.
    out_dir = os.path.join(
        tempfile.gettempdir(),
        "pytrousse_q102_csv_"
        f"{spark.sparkContext.applicationId}_"
        f"{os.path.basename(os.path.normpath(sf_dir))}",
    )
    (
        d.write.mode("overwrite")
        .option("header", "true")
        .option("escape", '"')
        .csv(out_dir)
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    back = pio.read_csv(
        spark,
        out_dir,
        schema=schema,
        options={"multiLine": "true", "escape": '"'},
    ).df
    return back.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("doc_id").alias("n_ids"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum(
            F.pmod(
                h60(F.concat(F.lit("t|"), F.col("text"))),
                F.lit(1_000_000_000),
            )
        ).alias("text_sig"),
    )


def _sql_q102() -> str:
    from pytrousse_spark.functions.hashing import h60_sql

    h = h60_sql("'t|' || text")
    return f"""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_ids,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(sum(({h}) % 1000000000) AS BIGINT) AS text_sig
    FROM documents
    GROUP BY source
    """


def q103_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL mergeability behind the hash gate — the sharded-build layout a
    100 TB profile run uses: per-source register sets built in ONE
    (group, bucket)-keyed aggregation (shuffle bounded by groups x 2^p),
    then the corpus-wide sketch obtained by bucket-wise max — NO re-scan
    of the data. The ALL row's estimate is bit-for-bit the whole-corpus
    q99 estimate (max is associative/commutative/idempotent), which is the
    mergeability law itself, oracle-checked."""
    from pytrousse_spark.functions.text import word_shingles
    from pytrousse_spark.io import rebalance_undersplit
    from pytrousse_spark.operators.sketch import (
        hll_estimate_row,
        hll_merge_registers,
        hll_registers_grouped,
    )

    d = rebalance_undersplit(_t(spark, sf_dir, "documents")).where(
        F.col("text").isNotNull()
    )
    keyed = d.select(
        F.col("source"), F.explode(word_shingles(F.col("text"), 3)).alias("k")
    )
    # register-store: the grouped build feeds BOTH the per-source collect
    # and the DataFrame merge; checkpoint the (tiny, groups x 2^p) register
    # table so the md5/shingle scan runs once (signature-store pattern)
    regs = hll_registers_grouped(keyed, "source", "k", p=12).localCheckpoint()
    by_grp: dict[str, list[tuple[int, int]]] = {}
    for r in regs.collect():  # bounded: sources x 2^12 rows
        by_grp.setdefault(r["grp"], []).append((r["bucket"], r["r"]))
    out = []
    for g in sorted(by_grp):
        e = hll_estimate_row(by_grp[g], p=12)
        out.append((g, e["estimate"], e["zero_registers"]))
    merged = hll_merge_registers(regs)
    e = hll_estimate_row(
        [(r["bucket"], r["r"]) for r in merged.collect()], p=12
    )
    out.append(("ALL", e["estimate"], e["zero_registers"]))
    return spark.createDataFrame(
        out, "source string, estimate double, zero_registers long"
    )


def _sql_q103() -> str:
    from pytrousse_spark.functions.text import word_shingles_sql
    from pytrousse_spark.operators.sketch import hll_grouped_sql

    inner = (
        f"SELECT source, unnest({word_shingles_sql('text', 3)}) AS k "
        "FROM documents WHERE text IS NOT NULL"
    )
    return hll_grouped_sql(
        inner, "source", "k", p=12, merged_label="ALL",
        out_group_col="source",
    )


def q104_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth binning profile: l_extendedprice cut into 4
    equal-frequency buckets whose boundaries come from the histogram
    quantile sketch (one fixed-size hash agg — no sort, the scale path an
    exact qcut can't take), assignment via B1's later-wins closed form as
    a map-side literal-array expression. Extends the reference's binning
    family (B1 user thresholds, B4 per-group geometric) with the
    data-driven variant every preprocessing pipeline needs."""
    from pytrousse_spark.operators.binning import quantile_bins

    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_extendedprice").isNotNull()
    )
    binned, _ = quantile_bins(li, "l_extendedprice", num_bins=4)
    return binned.groupBy(F.col("__qbin").alias("bin_id")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min(F.col("l_extendedprice").cast("double")), 4).alias("lo"),
        F.round(F.max(F.col("l_extendedprice").cast("double")), 4).alias("hi"),
    )


def _sql_q104() -> str:
    from pytrousse_spark.operators.binning import quantile_bins_profile_sql

    return quantile_bins_profile_sql("lineitem", "l_extendedprice", num_bins=4)


def q105_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-quality power law: slope/intercept/r² of ln(freq)~ln(rank)
    over the top-500 tokens (Zipf's law; natural text ≈ −1), plus whole
    vocabulary mass and the modal token. Shuffle bounded by vocabulary;
    rank via TakeOrderedAndProject (never a global sort); the regression
    runs over 500 staged log points the oracle replays exactly."""
    return tx.zipf_fit(_t(spark, sf_dir, "documents"), "text", "doc_id", top_r=500)


def _sql_q105() -> str:
    return tx.zipf_fit_sql("documents", "text", "doc_id", top_r=500)


#: deterministic snapshot-B mutation for q106: keys hash-mod 10 → 0 deleted,
#: 1 repriced (+7.25, exact in binary), 2 cloned as inserts (+1e9 key, +1.5).
_CDC_SEED = "cdc"


def _q106_snapshots(spark: SparkSession, sf_dir: str):
    from pytrousse_spark.functions.hashing import h60_seeded

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    base = o.withColumn(
        "m", h60_seeded(F.col("o_orderkey").cast("string"), _CDC_SEED) % 10
    )
    price = F.col("o_totalprice")
    b = (
        base.where(F.col("m") != 0)
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.when(F.col("m") == 1, price + 7.25)
            .otherwise(price)
            .alias("o_totalprice"),
            "o_orderpriority",
        )
        .unionByName(
            base.where(F.col("m") == 2).select(
                (F.col("o_orderkey") + 1000000000).alias("o_orderkey"),
                "o_orderstatus",
                (price + 1.5).alias("o_totalprice"),
                "o_orderpriority",
            )
        )
    )
    return o, b


def q106_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance: CDC change set between two order snapshots
    (B = A with a deterministic hash-keyed delete/reprice/insert mix),
    classified by one co-partitioned full-outer join over map-side row
    fingerprints (operators/cdc.py — at rest, bucket both snapshots by the
    key and this diff is exchange-free). The round-trip law
    merge_apply(A, diff) == B is pinned in tests/test_cdc.py."""
    from pytrousse_spark.operators.cdc import snapshot_diff

    a, b = _q106_snapshots(spark, sf_dir)
    diff = snapshot_diff(
        a, b, ["o_orderkey"],
        ["o_orderstatus", "o_totalprice", "o_orderpriority"],
    )
    return diff.groupBy("change_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.coalesce(F.col("o_totalprice"), F.lit(0.0))), 2).alias(
            "sum_new_price"
        ),
        F.round(
            F.sum(F.coalesce(F.col("old_o_totalprice"), F.lit(0.0))), 2
        ).alias("sum_old_price"),
    )


def _q106_old_sql() -> str:
    return "SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority FROM orders"


def _q106_new_sql() -> str:
    from pytrousse_spark.functions.hashing import h60_seeded_sql

    m = f"({h60_seeded_sql('CAST(o_orderkey AS VARCHAR)', _CDC_SEED)} % 10)"
    return f"""
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN {m} = 1 THEN o_totalprice + 7.25
                  ELSE o_totalprice END AS o_totalprice,
             o_orderpriority
      FROM orders WHERE {m} <> 0
      UNION ALL
      SELECT o_orderkey + 1000000000, o_orderstatus, o_totalprice + 1.5,
             o_orderpriority
      FROM orders WHERE {m} = 2
    """


def _sql_q106() -> str:
    from pytrousse_spark.operators.cdc import snapshot_diff_sql

    a_sub = _q106_old_sql()
    b_sub = _q106_new_sql()
    diff = snapshot_diff_sql(
        a_sub, b_sub, ["o_orderkey"],
        ["o_orderstatus", "o_totalprice", "o_orderpriority"],
    )
    return f"""
    SELECT change_type, CAST(count(*) AS BIGINT) AS n,
           round(sum(coalesce(o_totalprice, 0.0)), 2) AS sum_new_price,
           round(sum(coalesce(old_o_totalprice, 0.0)), 2) AS sum_old_price
    FROM ({diff}) GROUP BY change_type
    """


#: q107 projection shape: 64-dim embeddings down 4x to 16.
_RP_IN, _RP_OUT, _RP_SALT = 64, 16, "q107"


def q107_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL ±1 random projection 64→16 over the embeddings table — the
    map-side pre-reduction that shrinks every downstream index (LSH/IVF/
    PQ) and its build shuffle by 4x. Sign matrix derived from the portable
    hash (never stored), projection = 16 index-ordered JVM folds, ZERO
    shuffles; emits the first 4 components and the norm-distortion ratio
    the JL lemma bounds (law pinned in tests/test_projection.py)."""
    from pytrousse_spark.operators.projection import random_project

    emb = _t(spark, sf_dir, "embeddings")
    proj = random_project(
        emb, "embedding", _RP_IN, _RP_OUT, salt=_RP_SALT
    )
    p = F.col("projected")
    sq = F.aggregate(
        p, F.lit(0.0), lambda acc, v: acc + v * v
    )
    osq = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda acc, v: acc + v.cast("double") * v.cast("double"),
    )
    return proj.select(
        "vec_id",
        *[F.round(p[j], 6).alias(f"p{j}") for j in range(4)],
        F.round(F.sqrt(sq) / F.sqrt(osq), 4).alias("norm_ratio"),
    )


def _sql_q107() -> str:
    from pytrousse_spark.operators.projection import (
        rp_component_sql,
        rp_signs,
    )

    signs = rp_signs(_RP_IN, _RP_OUT, _RP_SALT)
    comps = ", ".join(
        rp_component_sql("embedding", signs[j], _RP_IN, _RP_OUT)
        for j in range(_RP_OUT)
    )
    ps = ", ".join(f"round(proj[{j + 1}], 6) AS p{j}" for j in range(4))
    osq = (
        f"list_sum(list_transform(range(1, {_RP_IN + 1}), "
        f"i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))"
    )
    return f"""
    WITH pr AS (
      SELECT vec_id, [{comps}] AS proj, {osq} AS osq
      FROM embeddings
    )
    SELECT vec_id, {ps},
           round(sqrt(list_sum(list_transform(range(1, {_RP_OUT + 1}),
                 i -> proj[i] * proj[i]))) / sqrt(osq), 4) AS norm_ratio
    FROM pr
    """


def q108_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join via bucketing (the prompt's scale lever made a gate
    query): orders and lineitem are written as managed tables bucketed AND
    sorted by the join key, so the fact-fact SortMergeJoin reads both sides
    with ZERO Exchange and ZERO Sort — the shuffle is pre-paid once at
    write time and every later join/diff/rollup on the key rides free
    (plan law pinned in tests/test_plans.py). The aggregate is computed
    ONLY from the bucketed tables; the oracle joins the original parquet —
    any row lost or duplicated by the bucketed write flips the hash."""
    import re as _re

    from pytrousse_spark.operators.relational import write_bucketed

    tag = (
        _re.sub(r"\W", "_", spark.sparkContext.applicationId)
        + "_"
        + _re.sub(r"\W", "_", os.path.basename(os.path.normpath(sf_dir)))
    )
    spark.sql("CREATE DATABASE IF NOT EXISTS pytrousse_buckets")
    ot, lt = f"pytrousse_buckets.orders_{tag}", f"pytrousse_buckets.li_{tag}"
    write_bucketed(
        _t(spark, sf_dir, "orders"), ot, "o_orderkey", 8,
        sort_by="o_orderkey", single_file_per_bucket=True,
    )
    write_bucketed(
        _t(spark, sf_dir, "lineitem"), lt, "l_orderkey", 8,
        sort_by="l_orderkey", single_file_per_bucket=True,
    )
    ob, lb = spark.table(ot), spark.table(lt)
    return (
        lb.join(ob, lb["l_orderkey"] == ob["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


def _sql_q108() -> str:
    return """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """


def q109_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k-per-stratum deterministic sampling at scale: per-source
    counts broadcast a map-side hash threshold that cuts every stratum to
    O(k) rows BEFORE the ranking shuffle, then exact row_number — equal
    row-for-row to the naive whole-stratum window (law in
    tests/test_sampling.py) without its giant-stratum pathology. The
    balanced-subset primitive behind eval-set construction and per-domain
    caps in corpus curation."""
    from pytrousse_spark.operators.sampling import stratified_sample

    d = _t(spark, sf_dir, "documents")
    samp = stratified_sample(d, ["source"], 30, "doc_id")
    return samp.select("source", "doc_id", "n_chars")


def _sql_q109() -> str:
    from pytrousse_spark.operators.sampling import stratified_sample_sql

    inner = stratified_sample_sql("documents", ["source"], 30, "doc_id")
    return f"SELECT source, doc_id, n_chars FROM ({inner})"


def q111_logreg_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filter trained IN the engine: logistic
    regression by batch GD — each iteration ONE map-side-partial
    aggregate whose row contributions are integer micro-units, so the
    gradient sums are exact and the DuckDB oracle replays init → 20
    iterations → confusion metrics to bit-identical weights. The model
    is 4 numbers; the corpus never shuffles (the fastText-quality-filter
    pattern of public LLM pipelines). The synthetic corpus has no
    semantic structure, so the gate label is a length threshold the
    optimizer must recover from MIXED features (it does: the length
    feature gets the dominant weight, accuracy 0.99; any label column
    plugs into the same trainer)."""
    from pytrousse_spark.operators.classifier import logreg_quality_gate

    d = _t(spark, sf_dir, "documents")
    return logreg_quality_gate(
        d, "text", (F.col("n_chars") > 300), iters=20, lr=5.0
    )


def _sql_q111() -> str:
    from pytrousse_spark.operators.classifier import logreg_quality_sql

    return logreg_quality_sql(
        "documents", "text", "(n_chars > 300)", iters=20, lr=5.0
    )


def q110_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization: events resampled to a per-user hourly
    grid (sequence+explode from each user's span — no global calendar
    join), gaps carry the last observation forward through one per-key
    window. Shuffles bounded by users x occupied buckets, never raw event
    volume; summarized per user so the gate hashes every filled cell."""
    from pytrousse_spark.operators.timeseries import resample_gapfill

    ev = _t(spark, sf_dir, "events")
    g = resample_gapfill(ev, "user_id", "ts", "value", "1 hour")
    return g.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_slots"),
        F.sum(F.col("is_gap").cast("long")).alias("n_gaps"),
        F.round(F.sum(F.coalesce(F.col("v_sum"), F.lit(0.0))), 2).alias(
            "observed_mass"
        ),
        F.round(F.sum("v_ff"), 2).alias("carried_mass"),
    )


def _sql_q110() -> str:
    from pytrousse_spark.operators.timeseries import resample_gapfill_sql

    inner = resample_gapfill_sql("events", "user_id", "ts", "value", "1 hour")
    return f"""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_slots,
           CAST(sum(CASE WHEN is_gap THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
           round(sum(coalesce(v_sum, 0.0)), 2) AS observed_mass,
           round(sum(v_ff), 2) AS carried_mass
    FROM ({inner}) GROUP BY user_id
    """


def q112_prefix_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT similarity join via prefix filtering (AllPairs/PPJoin family):
    shingle sets ordered by global df-ascending rarity, only the
    ``|s| - ceil(t|s|) + 1``-shingle prefixes join, length-filter prunes,
    then exact Jaccard verifies. No false negatives at the threshold —
    the deterministic alternative to MinHash-LSH (q54) when exactness is
    required; postings bounded to rare-shingle prefixes, documents never
    shuffle. Equality with the brute-force inverted index is pinned in
    tests/test_dedup_similarity.py."""
    d = _t(spark, sf_dir, "documents")
    return dd.prefix_jaccard_pairs(d, "text", "doc_id", n=3, threshold=0.4)


def _sql_q112() -> str:
    return dd.prefix_jaccard_pairs_sql("documents", "text", "doc_id", 3, 0.4)


def q113_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-analytics cohort retention: users bucketed by the day of
    their first event; per (cohort, day offset) the active fraction.
    Events are reduced to DISTINCT (user, day) and one first-event agg
    BEFORE any join — the matrix shuffle is bounded by users x active
    days, never event volume; cohort sizes broadcast."""
    from pytrousse_spark.operators.cohort import cohort_retention

    ev = _t(spark, sf_dir, "events")
    return cohort_retention(ev, "user_id", "ts", period="day")


def _sql_q113() -> str:
    from pytrousse_spark.operators.cohort import cohort_retention_sql

    return cohort_retention_sql("events", "user_id", "ts", period="day")


def q114_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view→click→purchase over the first two
    days (narrow window so each step discriminates): step k counts users
    with a step-k event at-or-after their step-(k-1) conversion time,
    conversion = earliest qualifying event. Each step is one filtered
    user-keyed min-agg joined to the previous step frame — shuffle
    bounded by that type's events, never total volume."""
    from pytrousse_spark.operators.cohort import funnel_steps

    ev = _t(spark, sf_dir, "events").where(F.col("ts") < F.lit("2024-01-03"))
    return funnel_steps(
        ev, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    )


def _sql_q114() -> str:
    from pytrousse_spark.operators.cohort import funnel_steps_sql

    return funnel_steps_sql(
        "(SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-03')",
        "user_id",
        "ts",
        "event_type",
        ["view", "click", "purchase"],
    )


def q115_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standing-aggregate maintenance without rescanning history: orders
    split at 2001-01-01 into base (history) and delta (new arrivals);
    each side reduces to mergeable partials (count / micro-unit sum /
    min / max) and the merge shuffles only group rows. Sums ride integer
    micro-units so merge == direct recompute BIT-exactly (law pinned in
    tests/test_incremental.py) — the algebraic-aggregate twin of q103's
    HLL register merge."""
    from pytrousse_spark.operators.incremental import (
        merge_rollups,
        partial_rollup,
        rollup_view,
    )

    o = _t(spark, sf_dir, "orders")
    cut = F.lit("2001-01-01").cast("timestamp")
    keys = ["o_orderpriority", "o_orderstatus"]
    base = partial_rollup(o.where(F.col("o_orderdate") < cut), keys, "o_totalprice")
    delta = partial_rollup(
        o.where(F.col("o_orderdate") >= cut), keys, "o_totalprice"
    )
    return rollup_view(merge_rollups([base, delta], keys), keys)


def _sql_q115() -> str:
    from pytrousse_spark.operators.incremental import incremental_rollup_sql

    return incremental_rollup_sql(
        "SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '2001-01-01'",
        "SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01'",
        ["o_orderpriority", "o_orderstatus"],
        "o_totalprice",
    )


def q116_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 over the q106 snapshot pair: one
    map-side-fingerprint full-outer join emits the versioned history
    (t0 versions closed when deleted/changed, open t1 versions for
    inserts/changes). Unchanged keys cost one hash equality; bucketed
    snapshots make the join exchange-free at rest. Laws (current rows ==
    new snapshot; <=1 open version per key) pinned in tests/test_cdc.py."""
    from pytrousse_spark.operators.cdc import scd2_history

    o, b = _q106_snapshots(spark, sf_dir)
    return scd2_history(o, b, ["o_orderkey"], "2024-01-01", "2024-02-01")


def _sql_q116() -> str:
    from pytrousse_spark.operators.cdc import scd2_history_sql

    return scd2_history_sql(
        _q106_old_sql(),
        _q106_new_sql(),
        ["o_orderkey"],
        "2024-01-01",
        "2024-02-01",
        ["o_orderstatus", "o_totalprice", "o_orderpriority"],
    )


def q117_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine PageRank over the customer↔supplier trade graph (edges =
    distinct (customer, supplier) pairs from orders⋈lineitem, both
    directions). 8 Pregel-style iterations, each ONE edge⋈rank join + one
    dst-keyed agg; ranks are integer micro-units (contributions = one
    IEEE division + half-away round each) so the DuckDB oracle replays
    the full chain to BIT-identical ranks — the q111 exact-replay pattern
    applied to an iterative graph algorithm."""
    from pytrousse_spark.operators.graph import pagerank

    from pytrousse_spark.io import rebalance_undersplit

    o = _t(spark, sf_dir, "orders")
    # spread the 600k-row join probe (single-row-group bench input —
    # no-op at real scale); checkpoint the distinct pair frame so the
    # two union directions read it once instead of re-running the
    # join+distinct per branch
    l = rebalance_undersplit(_t(spark, sf_dir, "lineitem"))
    pairs = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("a"),
            F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    edges = pairs.unionByName(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).select(F.col("a").alias("src"), F.col("b").alias("dst"))
    return pagerank(edges, "src", "dst", iters=8)


def _sql_q117() -> str:
    from pytrousse_spark.operators.graph import pagerank_sql

    sub = """
    SELECT a AS src, b AS dst FROM (
      SELECT DISTINCT 'c:' || CAST(o_custkey AS VARCHAR) AS a,
                      's:' || CAST(l_suppkey AS VARCHAR) AS b
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
    UNION ALL
    SELECT b, a FROM (
      SELECT DISTINCT 'c:' || CAST(o_custkey AS VARCHAR) AS a,
                      's:' || CAST(l_suppkey AS VARCHAR) AS b
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
    """
    return pagerank_sql(sub, "src", "dst", iters=8)


#: q118 pivot columns — pinned so the output schema is deterministic and
#: the scan never pays a distinct-values pre-pass.
_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q118_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide daily activity matrix: pivot event_type into per-type count
    columns with an explicit value list (no distinct pre-scan, stable
    schema — the only pivot shape that works unattended at 100 TB).
    One (day)-keyed hash aggregation with map-side partials; round-trip
    back through unpivot is pinned in tests/test_graph.py."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.to_date("ts").alias("day"))
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .select(
            "day",
            *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES],
        )
    )


def _sql_q118() -> str:
    cols = ",\n           ".join(
        f"CAST(count(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS {t}"
        for t in _EVENT_TYPES
    )
    return f"""
    SELECT CAST(ts AS DATE) AS day,
           {cols}
    FROM events GROUP BY 1
    """


def q119_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting (daily active + cumulative unique users) WITHOUT
    a distinct-over-window: first-seen period per user is one entity-keyed
    min-agg, actives reuse the DISTINCT (user, day) reduction, and the
    running total is a window over the 30-row day axis — the shape that
    replaces the unscalable count(DISTINCT) OVER (ORDER BY day)."""
    from pytrousse_spark.operators.timeseries import cumulative_distinct

    ev = _t(spark, sf_dir, "events")
    return cumulative_distinct(ev, "user_id", "ts", period="day")


def _sql_q119() -> str:
    from pytrousse_spark.operators.timeseries import cumulative_distinct_sql

    return cumulative_distinct_sql("events", "user_id", "ts", period="day")


def q120_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA (decay 1/2, 16-observation window) over event
    values — BIT-exact across engines: micro-unit values, exact
    power-of-two integer weights, integer weighted sums; the only floats
    are one final division pair. One per-key ROWS-frame window, no
    self-join; summarized per user so the gate hashes every smoothed
    point."""
    from pytrousse_spark.operators.timeseries import ewma

    ev = _t(spark, sf_dir, "events")
    e = ewma(ev, "user_id", "ts", "value", "event_id", window=16)
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(F.sum("ewma"), 4).alias("ewma_mass"),
        F.round(F.min("ewma"), 6).alias("ewma_min"),
        F.round(F.max("ewma"), 6).alias("ewma_max"),
    )


def _sql_q120() -> str:
    from pytrousse_spark.operators.timeseries import ewma_sql

    inner = ewma_sql("events", "user_id", "ts", "value", "event_id", 16)
    return f"""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_points,
           round(sum(ewma), 4) AS ewma_mass,
           round(min(ewma), 6) AS ewma_min,
           round(max(ewma), 6) AS ewma_max
    FROM ({inner}) GROUP BY user_id
    """


def q121_mad_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-user anomaly census: values beyond 3·1.4826·MAD from
    the per-user median (Hampel's rule). Two exact per-key percentile
    aggs + broadcast stat joins; exact group percentiles buffer one
    USER's values (bounded by per-key activity — the unbounded-history
    alternative is the q100 histogram sketch)."""
    from pytrousse_spark.operators.timeseries import mad_anomalies

    ev = _t(spark, sf_dir, "events")
    return mad_anomalies(ev, "user_id", "value", k=3.0)


def _sql_q121() -> str:
    from pytrousse_spark.operators.timeseries import mad_anomalies_sql

    return mad_anomalies_sql("events", "user_id", "value", k=3.0)


def q122_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind q09's rollup and
    q18's cube): per (flag,status), per flag, and grand-total aggregates
    in ONE pass with a grouping_id disambiguator — Catalyst expands the
    sets into a single Expand+hash-agg, no per-set rescans."""
    ev = _t(spark, sf_dir, "lineitem")
    ev.createOrReplaceTempView("__q122_lineitem")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
               coalesce(l_linestatus, 'ALL') AS l_linestatus,
               CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus)
                    AS BIGINT) AS gid,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(l_extendedprice), 2) AS sum_price
        FROM __q122_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        """
    )


def _sql_q122() -> str:
    return """
    SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
           coalesce(l_linestatus, 'ALL') AS l_linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus)
                AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_returnflag), ())
    """


def q123_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization (clip to the [p05, p95] band) before any
    mean-based statistic — heavy-tail damage control without dropping
    rows. One exact per-group percentile agg broadcast back; the fact
    table never shuffles. Summarized per group so the gate hashes every
    clip decision."""
    from pytrousse_spark.operators.repair import winsorize

    li = _t(spark, sf_dir, "lineitem")
    w = winsorize(li, "l_returnflag", "l_extendedprice", 0.05, 0.95)
    v, vw = F.col("l_extendedprice"), F.col("l_extendedprice_w")
    return w.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((v < vw).cast("bigint")).alias("n_clip_lo"),
        F.sum((v > vw).cast("bigint")).alias("n_clip_hi"),
        F.round(F.sum(v), 2).alias("sum_raw"),
        F.round(F.sum(vw), 2).alias("sum_winsorized"),
    )


def _sql_q123() -> str:
    from pytrousse_spark.operators.repair import winsorize_summary_sql

    return winsorize_summary_sql(
        "lineitem", "l_returnflag", "l_extendedprice", 0.05, 0.95
    )


def q124_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage over part names: edit-distance <= 2 pairs,
    candidate-bounded by a declared blocking key (the head noun — the
    Fellegi–Sunter blocking practice; recall is the key's recall by
    contract, not silently). Linkage runs over DISTINCT values with a
    min-key representative — the entity-resolution reduction that keeps
    clone-heavy tables (thousands of rows per name here) from exploding
    the pair space quadratically; levenshtein verifies JVM-side inside
    the block join, no cross product anywhere."""
    from pytrousse_spark.operators.relational import fuzzy_join_blocked

    p = (
        _t(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.min("p_partkey").alias("p_partkey"))
    )
    return fuzzy_join_blocked(
        p, p, "p_partkey", "p_name", "split(p_name, ' ')[1]", max_dist=2
    )


def _sql_q124() -> str:
    from pytrousse_spark.operators.relational import fuzzy_join_blocked_sql

    return fuzzy_join_blocked_sql(
        "(SELECT p_name, CAST(min(p_partkey) AS BIGINT) AS p_partkey"
        " FROM part GROUP BY p_name)",
        "p_partkey",
        "p_name",
        "split_part(p_name, ' ', 2)",
        2,
    )


def q125_hll_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users per day from MERGED daily HLL
    sketches — the metric exact count(DISTINCT) OVER a sliding RANGE
    cannot compute at scale (distinct does not decompose over sliding
    windows; the exact form buffers every key per frame). Data scanned
    ONCE into per-day registers; the window merges days x 2^9 register
    rows by bucket-wise max (HLL mergeability), the q99 estimator runs
    per day. Accuracy vs exact pinned in tests/test_sketch.py."""
    from pytrousse_spark.operators.sketch import hll_trailing_distinct

    ev = _t(spark, sf_dir, "events")
    return hll_trailing_distinct(ev, "ts", "user_id", window_days=7, p=9)


def _sql_q125() -> str:
    from pytrousse_spark.operators.sketch import hll_trailing_sql

    return hll_trailing_sql("SELECT * FROM events", "ts", "user_id", 7, 9)


def q126_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-flight join pricing: self-join cardinality (F2 = Σ n_k²) of
    lineitem on l_partkey estimated from the Count-Min grid's inner
    product with itself (AGMS-style) — never underestimates, costs d×w
    cells regardless of key cardinality. The gate emits the exact F2
    alongside (feasible here; at 100 TB distinct keys outgrow the exact
    path and the sketch is the only pricer)."""
    from pytrousse_spark.operators.sketch import count_min_self_join_size

    li = _t(spark, sf_dir, "lineitem")
    return count_min_self_join_size(li, "l_partkey", w=1 << 14, d=4)


def _sql_q126() -> str:
    from pytrousse_spark.operators.sketch import count_min_self_join_size_sql

    return count_min_self_join_size_sql("lineitem", "l_partkey", 1 << 14, 4)


def q127_grouped_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-GROUP p50/p95 from equi-width histogram sketches, fully
    engine-side (no driver collect — works for millions of groups):
    per-group stats broadcast, one (group, bin)-keyed agg bounded by
    groups x B, per-group running-sum window over bins, crossing-bin
    interpolation as expressions. The swap-in for exact per-group
    percentile that q121/q123 point at; <0.03% vs exact at B=1024 here."""
    from pytrousse_spark.operators.sketch import histogram_quantiles_grouped

    li = _t(spark, sf_dir, "lineitem")
    return histogram_quantiles_grouped(
        li, "l_returnflag", "l_extendedprice", [0.5, 0.95], num_bins=1024
    )


def _sql_q127() -> str:
    from pytrousse_spark.operators.sketch import (
        histogram_quantiles_grouped_sql,
    )

    return histogram_quantiles_grouped_sql(
        "lineitem", "l_returnflag", "l_extendedprice", [0.5, 0.95], 1024
    )


def q128_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution for funnel completers
    (view→click→purchase, whole-month window): minutes from first to
    final conversion, bucketed by a literal CASE ladder. One user-keyed
    join of two already-reduced step frames — the distribution shuffle is
    bounded by completers."""
    from pytrousse_spark.operators.cohort import time_to_convert

    ev = _t(spark, sf_dir, "events")
    return time_to_convert(
        ev, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    )


def _sql_q128() -> str:
    from pytrousse_spark.operators.cohort import time_to_convert_sql

    return time_to_convert_sql(
        "events", "user_id", "ts", "event_type", ["view", "click", "purchase"]
    )


def q129_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive keyword search ('merge' AND 'window' AND 'shuffle')
    with TF-IDF ranking: posting rows filter to the literal term list
    BEFORE any shuffle, per-term dfs broadcast back, top-20 via
    TakeOrderedAndProject with id tiebreak — the corpus query path; a
    token-bucketed posting table makes it exchange-free at rest."""
    from pytrousse_spark.functions.text import search_docs

    d = _t(spark, sf_dir, "documents")
    return search_docs(d, "text", "doc_id", ["merge", "window", "shuffle"], k=20)


def _sql_q129() -> str:
    from pytrousse_spark.functions.text import search_docs_sql

    return search_docs_sql(
        "documents", "text", "doc_id", ["merge", "window", "shuffle"], 20
    )


def q130_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EDA correlation matrix over lineitem's four numeric measures in
    ONE aggregation pass (K + K(K+1)/2 sums with map-side partials —
    single-row shuffle regardless of table size). Sums accumulate as
    DECIMAL so they are exact and fold-order-free in both engines; only
    the final corr formula runs in doubles."""
    from pytrousse_spark.profiling import correlation_matrix

    li = _t(spark, sf_dir, "lineitem")
    return correlation_matrix(
        li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    )


def _sql_q130() -> str:
    from pytrousse_spark.profiling import correlation_matrix_sql

    return correlation_matrix_sql(
        "lineitem", ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    )


def q131_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form linear regression l_extendedprice ~ quantity +
    discount: the 2x2 normal-equation solve over ONE-pass DECIMAL
    sufficient statistics (no iterations — the linear-model companion to
    q111's gradient-descent trainer). One scan, single-row shuffle, any
    table size; recovery of a planted linear law pinned in
    tests/test_classifier.py."""
    from pytrousse_spark.operators.classifier import ols_two_feature

    li = _t(spark, sf_dir, "lineitem")
    return ols_two_feature(li, "l_extendedprice", "l_quantity", "l_discount")


def _sql_q131() -> str:
    from pytrousse_spark.operators.classifier import ols_two_feature_sql

    return ols_two_feature_sql(
        "lineitem", "l_extendedprice", "l_quantity", "l_discount"
    )


def q132_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket rules over order baskets (parts co-purchased in one
    order), top-50 by lift: pair space from a basket-keyed self-join
    bounded by per-basket size (declared cap excludes pathological
    baskets), item counts broadcast, lift from exact integer
    cross-multiplication so both engines divide the same two BIGINTs."""
    from pytrousse_spark.operators.mining import association_rules

    li = _t(spark, sf_dir, "lineitem")
    return association_rules(
        li, "l_orderkey", "l_partkey", min_pair_count=2, top_k=50
    )


def _sql_q132() -> str:
    from pytrousse_spark.operators.mining import association_rules_sql

    return association_rules_sql(
        "lineitem", "l_orderkey", "l_partkey", min_pair_count=2, top_k=50
    )


def q133_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences (event_id tiebreak pins equal-timestamp order): ONE
    entity-keyed shuffle for the lag window, then state-pair hash aggs —
    the clickstream 'what happens after X' query."""
    from pytrousse_spark.operators.mining import event_transitions

    ev = _t(spark, sf_dir, "events")
    return event_transitions(ev, "user_id", "ts", "event_type", "event_id")


def _sql_q133() -> str:
    from pytrousse_spark.operators.mining import event_transitions_sql

    return event_transitions_sql(
        "events", "user_id", "ts", "event_type", "event_id"
    )


def q134_chi2_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square keyword triage: top-30 tokens by dependence with the
    lang='en' label — exact BIGINT contingency cells from one
    (doc, token) DISTINCT + one token agg; the statistic evaluates in
    doubles with the identical expression shape in both engines."""
    from pytrousse_spark.operators.classifier import chi2_feature_selection

    d = _t(spark, sf_dir, "documents")
    return chi2_feature_selection(
        d, "text", "doc_id", F.col("lang") == "en", top_k=30, min_docs=5
    )


def _sql_q134() -> str:
    from pytrousse_spark.operators.classifier import chi2_feature_selection_sql

    return chi2_feature_selection_sql(
        "documents", "text", "doc_id", "lang = 'en'", top_k=30, min_docs=5
    )


def q135_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the co-purchase graph (parts co-occurring in
    >= 2 order baskets): degree-ordered orientation bounds the wedge
    join by sum out_deg^2 — the hub-safe exact triangle count, plus the
    global clustering coefficient."""
    from pytrousse_spark.operators.graph import triangle_count

    li = _t(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("__b"), F.col("l_partkey").alias("__i")
    ).distinct()
    edges = (
        items.join(items.withColumnRenamed("__i", "__j"), "__b")
        .where(F.col("__i") < F.col("__j"))
        .groupBy("__i", "__j")
        .agg(F.count(F.lit(1)).alias("__c"))
        .where(F.col("__c") >= 2)
    )
    return triangle_count(edges, "__i", "__j")


def _sql_q135() -> str:
    from pytrousse_spark.operators.graph import triangle_count_sql

    edges = """
        SELECT a.__i AS __i, b.__i AS __j
        FROM (SELECT DISTINCT l_orderkey AS __b, l_partkey AS __i
              FROM lineitem) a
        JOIN (SELECT DISTINCT l_orderkey AS __b, l_partkey AS __i
              FROM lineitem) b USING (__b)
        WHERE a.__i < b.__i
        GROUP BY 1, 2 HAVING count(*) >= 2
    """
    return triangle_count_sql(edges, "__i", "__j")


def q136_hll_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary overlap between the English and German sub-corpora
    from HLL sketches: |A|, |B|, |A∪B| (bucket-wise register max) and
    |A∩B| by inclusion–exclusion — the cross-corpus overlap question
    exact COUNT(DISTINCT) cannot answer at scale without co-shuffling
    both corpora on the token key; here the sides never meet, only two
    2^10-register sketches do."""
    from pytrousse_spark.functions.text import tokens
    from pytrousse_spark.operators.sketch import hll_set_ops

    d = _t(spark, sf_dir, "documents")

    def toks(lang: str) -> DataFrame:
        return (
            d.where(F.col("lang") == lang)
            .select(tokens(F.col("text")).alias("__tk"))
            .select(F.explode_outer("__tk").alias("token"))
        )

    return hll_set_ops(toks("en"), toks("de"), "token", p=10)


def _sql_q136() -> str:
    from pytrousse_spark.functions.text import tokens_sql
    from pytrousse_spark.operators.sketch import hll_set_ops_sql

    def sub(lang: str) -> str:
        return (
            f"SELECT unnest({tokens_sql('text')}) AS token "
            f"FROM documents WHERE lang = '{lang}'"
        )

    return hll_set_ops_sql(sub("en"), sub("de"), "token", p=10)


def q137_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline of orders maximizing (o_totalprice, o_orderdate) — the
    'biggest AND most recent' Pareto set. The Spark plan prunes the
    interior mass with a bucketed broadcast suffix-max BEFORE the exact
    sweep (sweep input ~frontier-sized); the oracle computes the same
    skyline from the mathematical definition — an independent-derivation
    parity check."""
    from pytrousse_spark.operators.relational import pareto_frontier

    o = _t(spark, sf_dir, "orders")
    return pareto_frontier(o, "o_totalprice", "o_orderdate")


def _sql_q137() -> str:
    from pytrousse_spark.operators.relational import pareto_frontier_sql

    return pareto_frontier_sql(
        "SELECT * FROM orders", "o_totalprice", "o_orderdate"
    )


def q138_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality contract over lineitem: six expectations
    (+ a composite-key uniqueness rule) checked in ONE aggregation over
    one scan — rule count never adds passes; the census the repair
    cascade (q29) acts on, generalized Great-Expectations-style."""
    from pytrousse_spark.operators.quality import expect

    li = _t(spark, sf_dir, "lineitem")
    return expect(
        li,
        {
            "quantity_in_range": "l_quantity BETWEEN 1 AND 50",
            "discount_in_band": "l_discount BETWEEN 0.0 AND 0.10",
            "price_positive": "l_extendedprice > 0",
            "shipdate_not_null": "l_shipdate IS NOT NULL",
            "returnflag_domain": "l_returnflag IN ('A', 'N', 'R')",
            "tax_nonnegative": "l_tax >= 0",
        },
        unique={"order_line_unique": ["l_orderkey", "l_linenumber"]},
    )


def _sql_q138() -> str:
    from pytrousse_spark.operators.quality import expect_sql

    return expect_sql(
        "SELECT * FROM lineitem",
        {
            "quantity_in_range": "l_quantity BETWEEN 1 AND 50",
            "discount_in_band": "l_discount BETWEEN 0.0 AND 0.10",
            "price_positive": "l_extendedprice > 0",
            "shipdate_not_null": "l_shipdate IS NOT NULL",
            "returnflag_domain": "l_returnflag IN ('A', 'N', 'R')",
            "tax_nonnegative": "l_tax >= 0",
        },
        unique={"order_line_unique": ["l_orderkey", "l_linenumber"]},
    )


def q139_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of the daily revenue series
    (period 7): centered moving-average trend, per-weekday-position
    seasonal index, residual — DECIMAL-exact sums under every division,
    so both engines emit identical doubles. The raw events table reduces
    to the day series BEFORE any window."""
    from pytrousse_spark.operators.timeseries import seasonal_decompose

    ev = _t(spark, sf_dir, "events")
    series = ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(
        F.sum(
            F.round(F.col("value"), 4).cast("decimal(18,4)")
        ).alias("revenue")
    )
    return seasonal_decompose(series, "day", "revenue", period=7)


def _sql_q139() -> str:
    from pytrousse_spark.operators.timeseries import seasonal_decompose_sql

    series = """
        SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
               sum(CAST(round(value, 4) AS DECIMAL(18,4))) AS revenue
        FROM events GROUP BY 1
    """
    return seasonal_decompose_sql(series, "day", "revenue", period=7)


def q140_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: every purchase is credited to
    the most recent preceding 'view' by the same user within 3 days —
    an as-of backward join (q51's operator) feeding a campaign-keyed
    rollup. Unattributed purchases surface as campaign NULL instead of
    silently dropping."""
    from pytrousse_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.round(F.col("value"), 4).cast("decimal(18,4)").alias("p_val"),
    )
    views = (
        ev.where(F.col("event_type") == "view")
        .select(
            "user_id",
            F.col("ts").alias("v_ts"),
            F.get_json_object("props", "$.k").cast("long").alias("campaign"),
        )
        # (user, ts) dedup pins the as-of survivor (q51b convention)
        .groupBy("user_id", "v_ts")
        .agg(F.max("campaign").alias("campaign"))
    )
    j = asof_join(
        purchases,
        views,
        on="user_id",
        left_time="p_ts",
        right_time="v_ts",
        direction="backward",
        tolerance=3 * 86400,
    )
    return (
        j.groupBy(F.col("campaign_right").alias("campaign"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("p_val").cast("double").alias("revenue"),
        )
    )


def _sql_q140() -> str:
    return """
    WITH purchases AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS p_ts,
               CAST(round(value, 4) AS DECIMAL(18,4)) AS p_val
        FROM events WHERE event_type = 'purchase'
    ), views AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS v_ts,
               max(CAST(json_extract_string(props, '$.k') AS BIGINT))
                   AS campaign
        FROM events WHERE event_type = 'view'
        GROUP BY 1, 2
    ), j AS (
        SELECT p.user_id, p.p_val,
               (SELECT v.campaign FROM views v
                WHERE v.user_id = p.user_id
                  AND v.v_ts <= p.p_ts
                  AND epoch(p.p_ts - v.v_ts) <= 3 * 86400
                ORDER BY v.v_ts DESC LIMIT 1) AS campaign
        FROM purchases p
    )
    SELECT campaign, CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(p_val) AS DOUBLE) AS revenue
    FROM j GROUP BY 1
    """


def q141_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: TF-IDF keyword ranking (q129's path) fused with
    the cosine ranking against doc 0's stored embedding by Reciprocal
    Rank Fusion — no score calibration, only (id, rank) cross the fuse,
    so the vector side swaps to ANN (q57/q90/q101) unchanged at scale."""
    from pytrousse_spark.operators.similarity import hybrid_search_rrf

    d = _t(spark, sf_dir, "documents")
    e = _t(spark, sf_dir, "embeddings")
    return hybrid_search_rrf(
        d,
        e,
        "text",
        "doc_id",
        "embedding",
        "vec_id",
        ["merge", "window"],
        query_vec_id=0,
        k=20,
    )


def _sql_q141() -> str:
    from pytrousse_spark.operators.similarity import hybrid_search_rrf_sql

    return hybrid_search_rrf_sql(
        "documents",
        "embeddings",
        "text",
        "doc_id",
        "embedding",
        "vec_id",
        ["merge", "window"],
        query_vec_id=0,
        dim=64,
        k=20,
    )


def q142_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of three lineitem measures, early-month
    shipments (reference) vs late-month (current): pooled-edge equal
    width bins, eps-floored proportions, nano-unit integer fold — the
    deployed-model drift alarm as one melt + one hash-agg."""
    from pytrousse_spark.profiling import psi_drift

    li = _t(spark, sf_dir, "lineitem")
    ref = li.where(F.dayofmonth("l_shipdate") <= 15)
    cur = li.where(F.dayofmonth("l_shipdate") > 15)
    return psi_drift(
        ref, cur, ["l_quantity", "l_extendedprice", "l_discount"]
    )


def _sql_q142() -> str:
    from pytrousse_spark.profiling import psi_drift_sql

    return psi_drift_sql(
        "SELECT * FROM lineitem WHERE day(CAST(l_shipdate AS TIMESTAMP)) <= 15",
        "SELECT * FROM lineitem WHERE day(CAST(l_shipdate AS TIMESTAMP)) > 15",
        ["l_quantity", "l_extendedprice", "l_discount"],
    )


def q143_stream_join_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the watermarked stream-stream interval join
    (streaming/events.py:view_purchase_stream_join): views pair with
    same-user purchases within 30 minutes after. The streaming plan
    takes the IDENTICAL join expression with watermarks bounding the
    join state; availableNow parity vs this twin is pinned in
    tests/test_streaming.py (the q70/q94 convention)."""
    from pytrousse_spark.streaming.events import view_purchase_stream_join

    ev = _t(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view")
    purchases = ev.where(F.col("event_type") == "purchase")
    return view_purchase_stream_join(views, purchases, max_gap_minutes=30)


def _sql_q143() -> str:
    return """
    SELECT v.user_id, v.ts AS v_ts, p.ts AS p_ts,
           CAST(floor(epoch(p.ts) - epoch(v.ts)) AS BIGINT) AS gap_sec,
           round(p.value, 4) AS p_val
    FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE event_type = 'view') v
    JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
          FROM events WHERE event_type = 'purchase') p
      ON p.user_id = v.user_id
     AND p.ts >= v.ts
     AND p.ts <= v.ts + INTERVAL 30 MINUTE
    """


def q144_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quoted-phrase search ('value table') over positional
    postings: posting rows filter to the phrase's terms BEFORE any
    shuffle, adjacency resolves by (id, pos+i) keyed joins bounded by
    term posting sizes — the exact-phrase path q129's conjunctive
    search cannot express."""
    from pytrousse_spark.functions.text import phrase_search

    d = _t(spark, sf_dir, "documents")
    return phrase_search(
        d, "text", "doc_id", ["value", "table"], k=20
    )


def _sql_q144() -> str:
    from pytrousse_spark.functions.text import phrase_search_sql

    return phrase_search_sql(
        "documents", "text", "doc_id", ["value", "table"], 20
    )


def q145_ols_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment closed-form OLS (price ~ quantity + discount per
    return flag): thousands of models from ONE grouped aggregation of
    DECIMAL sufficient statistics — the model-per-entity pattern an
    iterate-per-model trainer cannot scale to; degenerate groups emit
    NULLs, not Infs."""
    from pytrousse_spark.operators.classifier import ols_grouped

    li = _t(spark, sf_dir, "lineitem")
    return ols_grouped(
        li, "l_returnflag", "l_extendedprice", "l_quantity", "l_discount"
    )


def _sql_q145() -> str:
    from pytrousse_spark.operators.classifier import ols_grouped_sql

    return ols_grouped_sql(
        "lineitem", "l_returnflag", "l_extendedprice", "l_quantity",
        "l_discount",
    )


def q146_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 session entry paths (first 3 event types per 30-min-gap
    session): q11's sessionization feeding a per-position MAX path
    assembly — never collect_list, whose intra-group order is
    engine-dependent. One entity-keyed Exchange serves both windows."""
    from pytrousse_spark.operators.mining import session_paths

    ev = _t(spark, sf_dir, "events")
    return session_paths(
        ev, "user_id", "ts", "event_type", "event_id",
        gap_minutes=30, depth=3, top_k=10,
    )


def _sql_q146() -> str:
    from pytrousse_spark.operators.mining import session_paths_sql

    return session_paths_sql(
        "events", "user_id", "ts", "event_type", "event_id",
        gap_minutes=30, depth=3, top_k=10,
    )


def q147_contingency_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Independence test lang x source over documents: R x C chi-square
    + Cramér's V from ONE cell aggregation — marginals reduce from the
    cell frame, absent cells enter as zero observed, contributions fold
    as nano-unit integers."""
    from pytrousse_spark.profiling import contingency_chi2

    d = _t(spark, sf_dir, "documents")
    return contingency_chi2(d, "lang", "source")


def _sql_q147() -> str:
    from pytrousse_spark.profiling import contingency_chi2_sql

    return contingency_chi2_sql("SELECT * FROM documents", "lang", "source")


def q148_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users split into two arms by the portable
    md5 hash (q61's splitter — bit-identical in the oracle), conversion
    = any purchase at-or-after first view, pooled two-proportion z
    statistic with |z| > 1.96 significance — the q114 funnel shape plus
    a map-side arm label."""
    from pytrousse_spark.operators.cohort import ab_test_conversion

    ev = _t(spark, sf_dir, "events")
    return ab_test_conversion(
        ev, "user_id", "event_type", "view", "purchase"
    )


def _sql_q148() -> str:
    from pytrousse_spark.operators.cohort import ab_test_conversion_sql

    return ab_test_conversion_sql(
        "events", "user_id", "event_type", "view", "purchase"
    )


def q149_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration: Gini coefficient of per-customer order
    totals from the histogram sketch (exact Gini needs a global sort;
    the sketch is one bin-keyed agg + a B-row window at any scale;
    accuracy vs the exact rank formula pinned in tests)."""
    from pytrousse_spark.profiling import gini_sketch

    o = _t(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(
            F.round(F.col("o_totalprice"), 4).cast("decimal(28,4)")
        ).cast("double").alias("revenue")
    )
    return gini_sketch(per_cust, "revenue", num_bins=1024)


def _sql_q149() -> str:
    from pytrousse_spark.profiling import gini_sketch_sql

    sub = """
        SELECT CAST(sum(CAST(round(o_totalprice, 4) AS DECIMAL(28,4)))
                    AS DOUBLE) AS revenue
        FROM orders GROUP BY o_custkey
    """
    return gini_sketch_sql(sub, "revenue", num_bins=1024)


def q150_unordered_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Any-order milestone funnel: users by number of distinct step
    types touched (view/click/signup/purchase), plus completers whose
    whole set fits in 72 hours — the checklist complement of the
    ORDERED funnel q114."""
    from pytrousse_spark.operators.cohort import unordered_funnel

    ev = _t(spark, sf_dir, "events")
    return unordered_funnel(
        ev, "user_id", "ts", "event_type",
        ["view", "click", "signup", "purchase"], window_hours=72,
    )


def _sql_q150() -> str:
    from pytrousse_spark.operators.cohort import unordered_funnel_sql

    return unordered_funnel_sql(
        "events", "user_id", "ts", "event_type",
        ["view", "click", "signup", "purchase"], window_hours=72,
    )


def q151_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit screen over order totals: observed vs
    log10(1 + 1/d) shares with per-digit and total chi-square — the
    forensic-analytics census as one scan + one 9-cell agg."""
    from pytrousse_spark.profiling import benford_test

    o = _t(spark, sf_dir, "orders")
    return benford_test(o, "o_totalprice")


def _sql_q151() -> str:
    from pytrousse_spark.profiling import benford_test_sql

    return benford_test_sql("SELECT * FROM orders", "o_totalprice")


def q152_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus distance: Jensen–Shannon divergence (nats) between the
    English and German sub-corpora's token distributions — the
    domain-mixing / shift metric; PSI (q142) is its binned numeric
    sibling. Vocab-keyed join of two token aggs, pico-unit integer
    fold."""
    from pytrousse_spark.functions.text import js_divergence

    d = _t(spark, sf_dir, "documents")
    return js_divergence(
        d.where(F.col("lang") == "en"),
        d.where(F.col("lang") == "de"),
        "text",
        min_count=2,
    )


def _sql_q152() -> str:
    from pytrousse_spark.functions.text import js_divergence_sql

    return js_divergence_sql(
        "SELECT * FROM documents WHERE lang = 'en'",
        "SELECT * FROM documents WHERE lang = 'de'",
        "text",
        min_count=2,
    )


def q153_rank_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group quantile normalization: percent_rank of price within
    each return flag, summarized into deciles (count + DECIMAL-exact
    mean price per cell) — the transform's near-uniform decile counts
    ARE the property under test."""
    from pytrousse_spark.operators.transforms import percent_rank_transform

    li = _t(spark, sf_dir, "lineitem")
    r = percent_rank_transform(li, "l_returnflag", "l_extendedprice")
    decile = F.least(F.lit(9), F.floor(F.col("pct_rank") * 10).cast("int"))
    return (
        r.select(
            "l_returnflag",
            decile.alias("decile"),
            F.round(F.col("l_extendedprice"), 4)
            .cast("decimal(28,4)")
            .alias("__p"),
        )
        .groupBy("l_returnflag", "decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # cast the DECIMAL sum to double BEFORE dividing: decimal
            # division precision/scale rules differ across engines
            F.round(
                F.sum("__p").cast("double") / F.count(F.lit(1)), 4
            ).alias("mean_price"),
        )
    )


def _sql_q153() -> str:
    return """
    WITH ranked AS (
        SELECT l_returnflag,
               round(percent_rank() OVER (
                   PARTITION BY l_returnflag ORDER BY l_extendedprice
               ), 6) AS pct_rank,
               CAST(round(l_extendedprice, 4) AS DECIMAL(28,4)) AS __p
        FROM lineitem WHERE l_extendedprice IS NOT NULL
    )
    SELECT l_returnflag,
           CAST(least(9, floor(pct_rank * 10)) AS INT) AS decile,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(__p) AS DOUBLE) / count(*), 4) AS mean_price
    FROM ranked GROUP BY 1, 2
    """


def q154_sampling_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word2vec-style α=0.75 smoothed sampling distribution over the
    corpus unigram counts (top-50 by weight): exact micro-unit
    normalizer, uplift column shows the tail upsampling — the
    negative-sampling / domain-mixture reweighting primitive."""
    from pytrousse_spark.functions.text import (
        smoothed_sampling_weights,
        tokens,
    )

    d = _t(spark, sf_dir, "documents")
    counts = (
        d.select(tokens(F.col("text")).alias("__tk"))
        .select(F.explode_outer("__tk").alias("token"))
        .where(F.col("token").isNotNull())
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return smoothed_sampling_weights(counts, "token", "n", alpha=0.75, k=50)


def _sql_q154() -> str:
    from pytrousse_spark.functions.text import (
        smoothed_sampling_weights_sql,
        tokens_sql,
    )

    counts = (
        f"SELECT token, CAST(count(*) AS BIGINT) AS n FROM ("
        f"SELECT unnest({tokens_sql('text')}) AS token FROM documents"
        f") WHERE token IS NOT NULL GROUP BY 1"
    )
    return smoothed_sampling_weights_sql(counts, "token", "n", 0.75, 50)


def q155_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon-entropy census of documents' categorical columns (lang,
    source): ONE melted hash-agg for all columns, nano-unit folds —
    the information-theoretic row of the profiler (low normalized
    entropy flags skew the cardinality classes miss)."""
    from pytrousse_spark.profiling import entropy_profile

    d = _t(spark, sf_dir, "documents")
    return entropy_profile(d, ["lang", "source"])


def _sql_q155() -> str:
    from pytrousse_spark.profiling import entropy_profile_sql

    return entropy_profile_sql(
        "SELECT * FROM documents", ["lang", "source"]
    )


def q156_rank_transform_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe rank transform (the round-4 verdict's one perf-weak
    item closed): q153's quantile normalization re-run through the
    histogram-CDF approximation — NO per-group global sort, so a
    3-value group key (the exact window's single-task funnel) is safe
    at any scale. Same decile summarization as q153; the near-uniform
    decile counts certify the CDF mapping. Max |approx - exact| rank
    error is pinned <= 1e-3 at B=4096 in tests/test_transforms.py
    (measured 2.45e-4 on this gate's column at sf0.01)."""
    from pytrousse_spark.operators.transforms import (
        percent_rank_transform_approx,
    )

    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    r = percent_rank_transform_approx(li, "l_returnflag", "l_extendedprice")
    decile = F.least(F.lit(9), F.floor(F.col("pct_rank") * 10).cast("int"))
    return (
        r.select(
            "l_returnflag",
            decile.alias("decile"),
            F.round(F.col("l_extendedprice"), 4)
            .cast("decimal(28,4)")
            .alias("__p"),
        )
        .groupBy("l_returnflag", "decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum("__p").cast("double") / F.count(F.lit(1)), 4
            ).alias("mean_price"),
        )
    )


def _sql_q156() -> str:
    from pytrousse_spark.operators.transforms import (
        percent_rank_transform_approx_sql,
    )

    inner = percent_rank_transform_approx_sql(
        "(SELECT l_returnflag, l_extendedprice FROM lineitem) li",
        "l_returnflag",
        "l_extendedprice",
    )
    return f"""
    WITH ranked AS ({inner})
    SELECT l_returnflag,
           CAST(least(9, floor(pct_rank * 10)) AS INT) AS decile,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(CAST(round(l_extendedprice, 4) AS DECIMAL(28,4)))
                      AS DOUBLE) / count(*), 4) AS mean_price
    FROM ranked GROUP BY 1, 2
    """


def q157_rolling_window_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q85's per-user rolling 1-hour count/avg through the BUCKETED
    PREFIX DECOMPOSITION (operators/timeseries.rolling_time_window) —
    max task bounded by the densest single (user, hour) bucket instead
    of the largest user's whole history (the round-5 skew battery
    measured the plain window at 4.4x wall under 20% single-user skew;
    this path is the fix). The oracle is DuckDB's plain RANGE window —
    the decomposition must reproduce the exact frame semantics
    bit-for-bit (value mass in integer micro-units)."""
    from pytrousse_spark.operators.timeseries import rolling_time_window

    ev = _t(spark, sf_dir, "events")
    out = rolling_time_window(
        ev, "user_id", "ts", "value", "1 hour", strategy="bucketed"
    )
    return out.select("event_id", "user_id", "ts", "roll_n", "roll_avg")


def _sql_q157() -> str:
    # NULL-ts rows pass through with NULL roll_n/roll_avg (the operator's
    # documented contract — no defined [t-W, t] frame); NULL user_id is a
    # real window partition in both engines. events carries no NULLs at
    # any SF, so this arm is empty here, but the contract is pinned by
    # tests/test_timeseries.py on a NULL-bearing frame.
    return """
    SELECT event_id, user_id, ts,
           CAST(count(*) OVER w AS BIGINT) AS roll_n,
           CASE WHEN count(value) OVER w > 0 THEN
             round((CAST(sum(CAST(round(value * 1000000) AS BIGINT)) OVER w
                         AS DOUBLE) / 1000000.0)
                   / CAST(count(value) OVER w AS DOUBLE), 4)
           END AS roll_avg
    FROM events
    WHERE ts IS NOT NULL
    WINDOW w AS (
      PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
    )
    UNION ALL
    SELECT event_id, user_id, ts,
           CAST(NULL AS BIGINT) AS roll_n, CAST(NULL AS DOUBLE) AS roll_avg
    FROM events WHERE ts IS NULL
    """


def q158_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity census over customer quasi-identifiers (nation,
    market segment): per-threshold share of rows in equivalence classes
    smaller than k, plus the anonymity level the table actually
    satisfies — the release-side risk readout beside q30's identity
    hashing. One QI hash agg + one conditional aggregate (see
    operators/anonymize.k_anonymity_census)."""
    from pytrousse_spark.operators.anonymize import k_anonymity_census

    c = _t(spark, sf_dir, "customer")
    return k_anonymity_census(c, ["c_nationkey", "c_mktsegment"], [5, 10, 15, 25])


def _sql_q158() -> str:
    from pytrousse_spark.operators.anonymize import k_anonymity_census_sql

    return k_anonymity_census_sql(
        "SELECT * FROM customer", ["c_nationkey", "c_mktsegment"], [5, 10, 15, 25]
    )


def q159_prefix_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncation-duplicate clusters: documents sharing their first 256
    characters but differing beyond — the near-dup class between exact
    dedup (q40) and MinHash (q42), caught exactly for the price of ONE
    hash agg on the prefix anchor (operators/dedup.prefix_dup_clusters)."""
    from pytrousse_spark.operators.dedup import prefix_dup_clusters

    d = _t(spark, sf_dir, "documents")
    return prefix_dup_clusters(d, "text", "doc_id", 256, 2)


def _sql_q159() -> str:
    from pytrousse_spark.operators.dedup import prefix_dup_clusters_sql

    return prefix_dup_clusters_sql("documents", "text", "doc_id", 256, 2)


# q160's deterministic score: the rational "fast sigmoid"
# 0.5 + z/(2(1+|z|)) of the standardized length feature — only
# +,*,/,abs, so both engines produce bit-identical doubles (exp-based
# logistic could differ in the last ulp between libm builds).
_Q160_SCORE_SQL = (
    "0.5 + ((CAST(n_chars AS DOUBLE) - 300.0) / 80.0)"
    " / (2.0 * (1.0 + abs((CAST(n_chars AS DOUBLE) - 300.0) / 80.0)))"
)


def q160_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + Brier score of a document-quality scorer
    (fast-sigmoid of standardized length) against the lang='en' label:
    per-bin mean prediction vs empirical rate, calibration gap, and the
    corpus Brier — the readout before trusting a quality filter as a
    sampling weight. Micro-unit integer folds; one 10-cell hash agg
    (operators/classifier.calibration_bins)."""
    from pytrousse_spark.operators.classifier import calibration_bins

    d = _t(spark, sf_dir, "documents")
    z = (F.col("n_chars").cast("double") - F.lit(300.0)) / F.lit(80.0)
    p = F.lit(0.5) + z / (F.lit(2.0) * (F.lit(1.0) + F.abs(z)))
    scored = d.select(
        p.alias("p"), (F.col("lang") == "en").cast("int").alias("y")
    )
    return calibration_bins(scored, "p", "y", 10)


def _sql_q160() -> str:
    from pytrousse_spark.operators.classifier import calibration_bins_sql

    inner = (
        f"SELECT {_Q160_SCORE_SQL} AS p, CAST(lang = 'en' AS INT) AS y"
        " FROM documents"
    )
    return calibration_bins_sql(inner, "p", "y", 10)


def q161_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional containment join (doc-inside-doc): ordered pairs with
    |A∩B|/|A| >= 0.8 over 3-gram shingle sets — the quoted-article /
    pagination-superset near-dup class symmetric Jaccard (q112) misses.
    Asymmetric prefix filter: contained-side rare-shingle prefixes join
    container-side full postings (operators/dedup.containment_pairs_prefix)."""
    from pytrousse_spark.operators.dedup import containment_pairs_prefix

    d = _t(spark, sf_dir, "documents")
    return containment_pairs_prefix(d, "text", "doc_id", 3, 0.8).orderBy(
        "id_a", "id_b"
    )


def _sql_q161() -> str:
    from pytrousse_spark.operators.dedup import containment_pairs_prefix_sql

    return (
        containment_pairs_prefix_sql("documents", "text", "doc_id", 3, 0.8)
        + " ORDER BY id_a, id_b"
    )


def q162_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct l-diversity census over part quasi-identifiers (brand,
    type) with p_size as the sensitive attribute: per-threshold share of
    rows in classes with < l distinct sensitive values — the
    homogeneity-attack readout k-anonymity (q158) cannot see. One
    two-level distinct agg + one conditional aggregate
    (operators/anonymize.l_diversity_census)."""
    from pytrousse_spark.operators.anonymize import l_diversity_census

    p = _t(spark, sf_dir, "part")
    return l_diversity_census(p, ["p_brand", "p_type"], "p_size", [5, 8, 10, 12])


def _sql_q162() -> str:
    from pytrousse_spark.operators.anonymize import l_diversity_census_sql

    return l_diversity_census_sql(
        "SELECT * FROM part", ["p_brand", "p_type"], "p_size", [5, 8, 10, 12]
    )


def q163_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style copy detection: doc pairs sharing >= 5 winnowed
    k-gram fingerprints (Schleimer 2003 — any shared substring of
    length >= k+w-1 guarantees a shared pick, at ~2/(w+1) storage).
    Catches long verbatim spans that set-level Jaccard dilutes away.
    Map-side winnowing + df-capped inverted-index self-join
    (operators/dedup.winnow_overlap_pairs)."""
    from pytrousse_spark.operators.dedup import winnow_overlap_pairs

    d = _t(spark, sf_dir, "documents")
    return winnow_overlap_pairs(d, "text", "doc_id", 16, 8, 5, 50)


def _sql_q163() -> str:
    from pytrousse_spark.operators.dedup import winnow_overlap_pairs_sql

    return winnow_overlap_pairs_sql("documents", "text", "doc_id", 16, 8, 5, 50)


def q164_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine BPE tokenizer training (Sennrich 2016): 10 merges
    learned from the corpus word-frequency vocabulary — exact BIGINT
    pair counts, lexicographic tie-break, greedy merge application via
    sentinel-wrapped string replace. The oracle RE-DERIVES every merge
    itself (unrolled training replay, operators/bpe.bpe_train_sql), so
    the gate certifies the whole training chain, not just the artifact."""
    from pytrousse_spark.operators.bpe import bpe_merge_table

    d = _t(spark, sf_dir, "documents")
    return bpe_merge_table(d, "text", 10)


def _sql_q164() -> str:
    from pytrousse_spark.operators.bpe import bpe_train_sql

    return bpe_train_sql("documents", "text", 10)


def q165_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization (Bolstad 2003 CDF matching): map each
    return-flag group's price distribution onto the POOLED distribution
    — per-group sketch rank (no per-group sort) + global-histogram
    inverse CDF via a broadcast mass-range join. Summarized per (group,
    decile of the normalized value) with micro-unit mean folds; after
    normalization the per-group means align across groups — the
    batch-effect-removal readout (operators/transforms.quantile_normalize)."""
    from pytrousse_spark.operators.transforms import quantile_normalize

    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    qn = quantile_normalize(li, "l_returnflag", "l_extendedprice")
    return (
        qn.where(F.col("qn_value").isNotNull())
        .select(
            "l_returnflag",
            F.least(
                F.lit(9),
                F.floor(F.col("qn_value") * 10 / F.lit(110000.0)).cast("int"),
            ).alias("decile"),
            F.round(F.col("qn_value") * F.lit(1e2), 0)
            .cast("bigint")
            .alias("__cents"),
        )
        .groupBy("l_returnflag", "decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(
                F.sum("__cents") / (F.count(F.lit(1)) * F.lit(100.0)), 2
            ).alias("mean_qn"),
        )
        .orderBy("l_returnflag", "decile")
    )


def _sql_q165() -> str:
    from pytrousse_spark.operators.transforms import quantile_normalize_sql

    inner = quantile_normalize_sql(
        "(SELECT l_returnflag, l_extendedprice FROM lineitem) AS li0",
        "l_returnflag",
        "l_extendedprice",
    )
    return f"""
    SELECT l_returnflag,
           CAST(least(9, CAST(floor(qn_value * 10 / 110000.0) AS INT))
                AS INT) AS decile,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(CAST(round(qn_value * 1e2, 0) AS BIGINT))
                      AS DOUBLE) / (count(*) * 100.0), 2) AS mean_qn
    FROM ({inner})
    WHERE qn_value IS NOT NULL
    GROUP BY 1, 2
    ORDER BY 1, 2
    """


def q166_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM mean-shift detection (Page 1954) per event type over the
    daily value series: one-sided cumulative sums with slack k=2 and
    threshold h=5, computed in CLOSED FORM as reflected random walks
    (cumsum minus running-min) — two window folds over the calendar-
    bounded bucket grid, exact micro-unit integers throughout
    (operators/timeseries.cusum_changepoints). The drift detector with
    memory beside q121's per-point MAD outliers."""
    from pytrousse_spark.operators.timeseries import cusum_changepoints

    ev = _t(spark, sf_dir, "events")
    return cusum_changepoints(
        ev, "ts", "value", "day", 2.0, 5.0, ["event_type"]
    )


def _sql_q166() -> str:
    from pytrousse_spark.operators.timeseries import cusum_changepoints_sql

    return cusum_changepoints_sql(
        "events", "ts", "value", "day", 2.0, 5.0, ["event_type"]
    )


def q167_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch LINEAR attribution: every view in the 3-day lookback
    before a purchase shares the purchase value equally — exact integer
    micro-unit credits with the division remainder pinned to the
    earliest touch, so per-purchase credit conserves bit-for-bit
    (operators/cohort.linear_attribution). The equal-credit sibling of
    q140's last-touch as-of join."""
    from pytrousse_spark.operators.cohort import linear_attribution

    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("v_ts"),
        F.get_json_object("props", "$.k").cast("long").alias("campaign"),
    )
    return linear_attribution(
        purchases, views,
        user_col="user_id", purchase_id_col="event_id",
        purchase_ts_col="ts", value_col="value",
        touch_ts_col="v_ts", channel_col="campaign",
    )


def _sql_q167() -> str:
    from pytrousse_spark.operators.cohort import linear_attribution_sql

    p = """
        SELECT user_id AS __u, event_id AS __pid,
               CAST(ts AS TIMESTAMP) AS __pts,
               CAST(round(CAST(value AS DOUBLE) * 1000000, 0) AS BIGINT)
                   AS __vm
        FROM events WHERE event_type = 'purchase'
    """
    t = """
        SELECT user_id AS __u, CAST(ts AS TIMESTAMP) AS __tts,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS __ch
        FROM events WHERE event_type = 'view'
    """
    return linear_attribution_sql(p, t)


def q177_linear_attribution_scalable(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q167's linear attribution through the COUNT-BASED decomposition
    (operators/cohort.linear_attribution_scalable) — no pairwise
    purchase x touch materialization, no per-user join partition: the
    round-6 skew battery measured the pairwise range join at 18-24x
    wall degradation under 20% single-user skew; this path's max task
    is the densest (user, channel, window-bucket). The oracle is the
    SAME pairwise SQL as q167 — the decomposition must reproduce it
    bit-for-bit (integer micro-unit credits, remainder to the earliest
    touch with native-type channel tie-break)."""
    from pytrousse_spark.operators.cohort import linear_attribution_scalable

    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("v_ts"),
        F.get_json_object("props", "$.k").cast("long").alias("campaign"),
    )
    return linear_attribution_scalable(
        purchases, views,
        user_col="user_id", purchase_id_col="event_id",
        purchase_ts_col="ts", value_col="value",
        touch_ts_col="v_ts", channel_col="campaign",
    )


def q178_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier time-to-convert curve (Kaplan & Meier 1958): per
    user, days from first view to first subsequent purchase; users who
    never purchase are RIGHT-CENSORED at the observation end instead of
    dropped — the estimator's whole point (a naive mean would bias
    toward fast converters). Subjects reduce to one row each, then all
    windows run over the distinct-duration frame
    (operators/survival.kaplan_meier)."""
    from pytrousse_spark.operators.survival import kaplan_meier

    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "__fv"
        ),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("__fp"),
    )
    obs_end = ev.agg(F.max("ts").alias("__end"))
    subjects = (
        per_user.where(F.col("__fv").isNotNull())
        .crossJoin(F.broadcast(obs_end))
        .select(
            F.when(
                F.col("__fp").isNotNull() & (F.col("__fp") >= F.col("__fv")),
                F.floor(
                    (F.unix_micros("__fp") - F.unix_micros("__fv"))
                    / F.lit(86_400_000_000)
                ),
            )
            .otherwise(
                F.floor(
                    (F.unix_micros("__end") - F.unix_micros("__fv"))
                    / F.lit(86_400_000_000)
                )
            )
            .cast("double")
            .alias("dur_days"),
            (
                F.col("__fp").isNotNull() & (F.col("__fp") >= F.col("__fv"))
            ).cast("int").alias("converted"),
        )
    )
    return kaplan_meier(subjects, "dur_days", "converted")


def _sql_q178() -> str:
    from pytrousse_spark.operators.survival import kaplan_meier_sql

    subjects = """
        WITH pu AS (
            SELECT user_id,
                   min(CASE WHEN event_type = 'view'
                            THEN CAST(ts AS TIMESTAMP) END) AS __fv,
                   min(CASE WHEN event_type = 'purchase'
                            THEN CAST(ts AS TIMESTAMP) END) AS __fp
            FROM events GROUP BY user_id
        ), oe AS (
            SELECT max(CAST(ts AS TIMESTAMP)) AS __end FROM events
        )
        SELECT CAST(CASE WHEN __fp IS NOT NULL AND __fp >= __fv
                    THEN floor(epoch_us(__fp - __fv) / 86400000000)
                    ELSE floor(epoch_us(__end - __fv) / 86400000000)
               END AS DOUBLE) AS dur_days,
               CASE WHEN __fp IS NOT NULL AND __fp >= __fv
                    THEN 1 ELSE 0 END AS converted
        FROM pu CROSS JOIN oe WHERE __fv IS NOT NULL
    """
    return kaplan_meier_sql(subjects, "dur_days", "converted")


def q179_roc_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC operating points for order value predicting urgent priority
    — q175's AUC unrolled into the (tpr, fpr, precision) sweep over a
    256-bin score histogram: exact BIGINT cumulatives, the curve window
    runs over the <= B-row histogram, never over orders
    (operators/classifier.roc_curve_binned)."""
    from pytrousse_spark.operators.classifier import roc_curve_binned

    o = _t(spark, sf_dir, "orders").select(
        "o_totalprice",
        F.col("o_orderpriority")
        .isin("1-URGENT", "2-HIGH")
        .cast("int")
        .alias("is_urgent"),
    )
    return roc_curve_binned(o, "o_totalprice", "is_urgent")


def _sql_q179() -> str:
    from pytrousse_spark.operators.classifier import roc_curve_binned_sql

    return roc_curve_binned_sql(
        "SELECT o_totalprice, CASE WHEN o_orderpriority IS NULL THEN NULL"
        " WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END"
        " AS is_urgent FROM orders",
        "o_totalprice",
        "is_urgent",
    )


def q180_auc_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment ROC AUC (order status slicing the value->urgency
    ranking): the fairness/regression readout a global AUC hides. Same
    histogram rank-sum identity as q175, per group — (group, bin) agg
    bounded by groups x B, fact table never sorts
    (operators/classifier.auc_binned_grouped)."""
    from pytrousse_spark.operators.classifier import auc_binned_grouped

    o = _t(spark, sf_dir, "orders").select(
        "o_orderstatus",
        "o_totalprice",
        F.col("o_orderpriority")
        .isin("1-URGENT", "2-HIGH")
        .cast("int")
        .alias("is_urgent"),
    )
    return auc_binned_grouped(o, "o_orderstatus", "o_totalprice", "is_urgent")


def _sql_q180() -> str:
    from pytrousse_spark.operators.classifier import auc_binned_grouped_sql

    return auc_binned_grouped_sql(
        "SELECT o_orderstatus, o_totalprice,"
        " CASE WHEN o_orderpriority IS NULL THEN NULL"
        " WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END"
        " AS is_urgent FROM orders",
        "o_orderstatus",
        "o_totalprice",
        "is_urgent",
    )


def q181_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-bootstrap CI for the mean order value via the POISSON
    bootstrap (Hanley 2006) with keyed-PRF weights — deterministic,
    coordination-free resampling (each row contributes Poisson(1)
    copies per replicate; no global with-replacement draw). Integer
    micro-unit replicate folds, EXACT order-statistic bounds over the
    R-replicate frame (operators/sampling.bootstrap_mean_ci)."""
    from pytrousse_spark.operators.sampling import bootstrap_mean_ci

    o = _t(spark, sf_dir, "orders")
    return bootstrap_mean_ci(
        o, "o_totalprice", "o_orderkey", n_replicates=100, salt="r6"
    )


def _sql_q181() -> str:
    from pytrousse_spark.operators.sampling import bootstrap_mean_ci_sql

    return bootstrap_mean_ci_sql(
        "SELECT o_orderkey, o_totalprice FROM orders",
        "o_totalprice",
        "o_orderkey",
        n_replicates=100,
        salt="r6",
    )


def q182_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar-quantized cosine top-k (the faiss ScalarQuantizer /
    vector-DB int8 mode beside the PQ family q90/q101): per-vector
    symmetric scale, BIGINT dot folds — the scales cancel in the
    cosine, so scoring is order-free integer arithmetic (4x less data
    motion than float32 at the same plan shape). Recall vs the exact
    float top-k is pinned in tests (operators/quantization.sq8_cosine_topk)."""
    from pytrousse_spark.operators.quantization import sq8_cosine_topk

    e = _t(spark, sf_dir, "embeddings")
    return sq8_cosine_topk(e, 5, query_ids_below=10)


def _sql_q182() -> str:
    from pytrousse_spark.operators.quantization import sq8_cosine_topk_sql

    return sq8_cosine_topk_sql("embeddings", 5, 64, query_ids_below=10)


def q183_conformal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal interval for a per-priority mean-price predictor
    of order value (Vovk/Papadopoulos): the calibration-residual
    quantile at the conformal rank ceil((n+1)(1-alpha)) read from a
    histogram sketch — no global sort; the bin-edge rounding only
    WIDENS, so the distribution-free >= 1-alpha coverage guarantee
    survives, and the recounted coverage rides along
    (operators/classifier.conformal_interval)."""
    from pytrousse_spark.operators.classifier import conformal_interval

    o = _t(spark, sf_dir, "orders")
    means = o.groupBy("o_orderpriority").agg(
        F.round(F.avg("o_totalprice"), 4).alias("__pred")
    )
    scored = o.join(F.broadcast(means), "o_orderpriority", "inner")
    return conformal_interval(scored, "__pred", "o_totalprice", alpha=0.1)


def _sql_q183() -> str:
    from pytrousse_spark.operators.classifier import conformal_interval_sql

    scored = (
        "SELECT o.o_totalprice, m.__pred FROM orders o JOIN ("
        "SELECT o_orderpriority, round(avg(o_totalprice), 4) AS __pred"
        " FROM orders GROUP BY 1) m USING (o_orderpriority)"
    )
    return conformal_interval_sql(scored, "__pred", "o_totalprice", 0.1)


def _km_subjects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q178's time-to-convert subjects plus an experiment arm
    (user_id parity — the deterministic arm split; the salted-hash arm
    machinery is certified separately by q61/q148)."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "__fv"
        ),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("__fp"),
    )
    obs_end = ev.agg(F.max("ts").alias("__end"))
    return (
        per_user.where(F.col("__fv").isNotNull())
        .crossJoin(F.broadcast(obs_end))
        .select(
            (F.col("user_id") % 2).cast("int").alias("arm"),
            F.when(
                F.col("__fp").isNotNull() & (F.col("__fp") >= F.col("__fv")),
                F.floor(
                    (F.unix_micros("__fp") - F.unix_micros("__fv"))
                    / F.lit(86_400_000_000)
                ),
            )
            .otherwise(
                F.floor(
                    (F.unix_micros("__end") - F.unix_micros("__fv"))
                    / F.lit(86_400_000_000)
                )
            )
            .cast("double")
            .alias("dur_days"),
            (
                F.col("__fp").isNotNull() & (F.col("__fp") >= F.col("__fv"))
            ).cast("int").alias("converted"),
        )
    )


_KM_SUBJECTS_SQL = """
    WITH pu AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view'
                        THEN CAST(ts AS TIMESTAMP) END) AS __fv,
               min(CASE WHEN event_type = 'purchase'
                        THEN CAST(ts AS TIMESTAMP) END) AS __fp
        FROM events GROUP BY user_id
    ), oe AS (
        SELECT max(CAST(ts AS TIMESTAMP)) AS __end FROM events
    )
    SELECT CAST(user_id % 2 AS INT) AS arm,
           CAST(CASE WHEN __fp IS NOT NULL AND __fp >= __fv
                THEN floor(epoch_us(__fp - __fv) / 86400000000)
                ELSE floor(epoch_us(__end - __fv) / 86400000000)
           END AS DOUBLE) AS dur_days,
           CASE WHEN __fp IS NOT NULL AND __fp >= __fv
                THEN 1 ELSE 0 END AS converted
    FROM pu CROSS JOIN oe WHERE __fv IS NOT NULL
"""


def q184_km_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-ARM Kaplan-Meier time-to-convert curves — the A/B survival
    readout (compare conversion speed between experiment arms with
    censoring handled honestly); every reduction/window partitioned by
    arm over duration-level frames
    (operators/survival.kaplan_meier_grouped)."""
    from pytrousse_spark.operators.survival import kaplan_meier_grouped

    return kaplan_meier_grouped(
        _km_subjects(spark, sf_dir), "arm", "dur_days", "converted"
    )


def _sql_q184() -> str:
    from pytrousse_spark.operators.survival import kaplan_meier_sql

    # the grouped twin: run the single-curve twin per arm and union —
    # identical estimator semantics, arm prepended
    arms = []
    for a in (0, 1):
        inner = kaplan_meier_sql(
            f"SELECT * FROM ({_KM_SUBJECTS_SQL}) s WHERE arm = {a}",
            "dur_days",
            "converted",
        )
        arms.append(f"SELECT CAST({a} AS INT) AS arm, * FROM ({inner})")
    return " UNION ALL ".join(arms)


def q185_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test between the two arms' conversion curves (Mantel
    1966): O/E/V folds over pooled event times with exact dense-grid
    risk sets — the significance readout for q184's curves (1-df chi2;
    95% critical value 3.841) (operators/survival.logrank_test)."""
    from pytrousse_spark.operators.survival import logrank_test

    return logrank_test(
        _km_subjects(spark, sf_dir), "arm", "dur_days", "converted"
    )


def _sql_q185() -> str:
    from pytrousse_spark.operators.survival import logrank_test_sql

    return logrank_test_sql(
        _KM_SUBJECTS_SQL, "arm", "dur_days", "converted"
    )


def q186_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test between early- and
    late-January purchase values — the exact-ECDF sibling of the PSI
    gate (q142): D statistic + asymptotic p-value, computed with the
    range-bucketed prefix decomposition (no global sort); the oracle
    is the PLAIN global cumulative window, so the decomposition itself
    is what the gate certifies (profiling.ks_two_sample)."""
    from pytrousse_spark.profiling import ks_two_sample

    ev = _t(spark, sf_dir, "events")
    pur = ev.where(F.col("event_type") == "purchase")
    return ks_two_sample(
        pur.where(F.col("ts") < "2024-01-16"),
        pur.where(F.col("ts") >= "2024-01-16"),
        "value",
    )


def _sql_q186() -> str:
    from pytrousse_spark.profiling import ks_two_sample_sql

    return ks_two_sample_sql(
        "SELECT * FROM events WHERE event_type = 'purchase'"
        " AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16'",
        "SELECT * FROM events WHERE event_type = 'purchase'"
        " AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-16'",
        "value",
    )


def q187_cat_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate categorical association census (order status x
    priority): chi-squared via the zero-cell-free identity
    n*(S-1), Cramer's V, mutual information + normalized MI — the
    profiler's dependence row beside the univariate entropy census
    (q155); one joint hash-agg bounded by distinct pairs
    (profiling.categorical_association)."""
    from pytrousse_spark.profiling import categorical_association

    o = _t(spark, sf_dir, "orders")
    return categorical_association(o, "o_orderstatus", "o_orderpriority")


def _sql_q187() -> str:
    from pytrousse_spark.profiling import categorical_association_sql

    return categorical_association_sql(
        "SELECT * FROM orders", "o_orderstatus", "o_orderpriority"
    )


def q188_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng et al. 2013)
    over January purchase revenue: pre-period (before Jan 16) per-user
    spend as the covariate, post-period spend as the metric, portable
    salted-hash arms — the variance_reduction column is the shrink
    CUPED buys; decimal-exact sufficient statistics
    (operators/cohort.cuped_ab_test)."""
    from pytrousse_spark.operators.cohort import cuped_ab_test

    ev = _t(spark, sf_dir, "events")
    return cuped_ab_test(
        ev, "user_id", "event_type", "purchase", "value",
        "2024-01-16 00:00:00",
    )


def _sql_q188() -> str:
    from pytrousse_spark.operators.cohort import cuped_ab_test_sql

    return cuped_ab_test_sql(
        "events", "user_id", "event_type", "purchase", "value",
        "2024-01-16 00:00:00",
    )


def q189_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences over the 2x2 (arm, pre/post-Jan-16)
    panel of per-user purchase spend: the quasi-experimental
    counterfactual readout beside the randomized CUPED gate (q188) —
    same units/arms/cent-exact moments, textbook 2x2 SE
    (operators/cohort.diff_in_diff)."""
    from pytrousse_spark.operators.cohort import diff_in_diff

    ev = _t(spark, sf_dir, "events")
    return diff_in_diff(
        ev, "user_id", "event_type", "purchase", "value",
        "2024-01-16 00:00:00",
    )


def _sql_q189() -> str:
    from pytrousse_spark.operators.cohort import diff_in_diff_sql

    return diff_in_diff_sql(
        "events", "user_id", "event_type", "purchase", "value",
        "2024-01-16 00:00:00",
    )


def q190_position_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch POSITION-BASED (U-shaped 40/20/40) attribution over
    the q167 purchase/view frames: first and last view in the 3-day
    window take 40% each, middles split 20% — exact integer micro-unit
    shares conserving each purchase's value bit-for-bit
    (operators/cohort.position_attribution)."""
    from pytrousse_spark.operators.cohort import position_attribution

    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("v_ts"),
        F.get_json_object("props", "$.k").cast("long").alias("campaign"),
    )
    return position_attribution(
        purchases, views,
        user_col="user_id", purchase_id_col="event_id",
        purchase_ts_col="ts", value_col="value",
        touch_ts_col="v_ts", channel_col="campaign",
    )


def _sql_q190() -> str:
    from pytrousse_spark.operators.cohort import position_attribution_sql

    p = """
        SELECT user_id AS __u, event_id AS __pid,
               CAST(ts AS TIMESTAMP) AS __pts,
               CAST(round(CAST(value AS DOUBLE) * 1000000, 0) AS BIGINT)
                   AS __vm
        FROM events WHERE event_type = 'purchase'
    """
    t = """
        SELECT user_id AS __u, CAST(ts AS TIMESTAMP) AS __tts,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS __ch
        FROM events WHERE event_type = 'view'
    """
    return position_attribution_sql(p, t)


def q191_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the q135 co-purchase graph (Newman
    2002): Pearson correlation of endpoint degrees over the
    symmetrized edges — do hub parts co-occur with hubs? Completes the
    graph family (components/PageRank/triangles) with the mixing
    diagnostic; decimal-exact degree moments
    (operators/graph.degree_assortativity)."""
    from pytrousse_spark.operators.graph import degree_assortativity

    li = _t(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("__b"), F.col("l_partkey").alias("__i")
    ).distinct()
    edges = (
        items.join(items.withColumnRenamed("__i", "__j"), "__b")
        .where(F.col("__i") < F.col("__j"))
        .groupBy("__i", "__j")
        .agg(F.count(F.lit(1)).alias("__c"))
        .where(F.col("__c") >= 2)
    )
    return degree_assortativity(edges, "__i", "__j")


def _sql_q191() -> str:
    from pytrousse_spark.operators.graph import degree_assortativity_sql

    edges = """
        SELECT a.__i AS __i, b.__i AS __j
        FROM (SELECT DISTINCT l_orderkey AS __b, l_partkey AS __i
              FROM lineitem) a
        JOIN (SELECT DISTINCT l_orderkey AS __b, l_partkey AS __i
              FROM lineitem) b USING (__b)
        WHERE a.__i < b.__i
        GROUP BY 1, 2 HAVING count(*) >= 2
    """
    return degree_assortativity_sql(edges, "__i", "__j")


def q192_pca2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form 2-feature PCA over lineitem (quantity, price): the
    2x2 eigenproblem solved IN-ENGINE with sqrt-only IEEE arithmetic
    (no driver eigensolver) from decimal-exact micro-unit moments;
    result = first-component projection histogram + unit loadings +
    explained-variance ratio (operators/projection.pca2)."""
    from pytrousse_spark.operators.projection import pca2

    li = _t(spark, sf_dir, "lineitem")
    return pca2(li, "l_quantity", "l_extendedprice")


def _sql_q192() -> str:
    from pytrousse_spark.operators.projection import pca2_sql

    return pca2_sql(
        "SELECT * FROM lineitem", "l_quantity", "l_extendedprice"
    )


def q193_seasonal_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest on daily order revenue: last
    28 days scored by MASE (Hyndman-Koehler 2006) against the
    in-sample one-step-naive MAE — the forecast-evaluation gate
    beside the decomposition (q139); exact cent-integer errors over
    the gapfilled calendar spine
    (operators/timeseries.seasonal_naive_backtest)."""
    from pytrousse_spark.operators.timeseries import seasonal_naive_backtest

    o = _t(spark, sf_dir, "orders")
    return seasonal_naive_backtest(o, "o_orderdate", "o_totalprice")


def _sql_q193() -> str:
    from pytrousse_spark.operators.timeseries import (
        seasonal_naive_backtest_sql,
    )

    return seasonal_naive_backtest_sql(
        "SELECT * FROM orders", "o_orderdate", "o_totalprice"
    )


def q194_position_attribution_scalable(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q190's U-shaped attribution through the first/last/count
    decomposition (operators/cohort.position_attribution_scalable) —
    no pairwise purchase x touch materialization: per-channel windowed
    counts + the first-build and (new) LAST-build two-bucket as-ofs.
    The skew battery measured the pairwise form at 16.5x under 20%
    single-user skew; this path's max task is the densest (user,
    channel, bucket). The oracle is the SAME pairwise SQL as q190 —
    the decomposition must reproduce it bit-for-bit."""
    from pytrousse_spark.operators.cohort import (
        position_attribution_scalable,
    )

    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("v_ts"),
        F.get_json_object("props", "$.k").cast("long").alias("campaign"),
    )
    return position_attribution_scalable(
        purchases, views,
        user_col="user_id", purchase_id_col="event_id",
        purchase_ts_col="ts", value_col="value",
        touch_ts_col="v_ts", channel_col="campaign",
    )


def q195_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation over the event stream: per-purchaser
    recency/frequency/monetary quintiles from the HISTOGRAM-SKETCH
    rank (q156's transform — no NTILE global sort on any dimension),
    rolled to the occupied 5x5x5 cells with cent-exact average spend
    (operators/cohort.rfm_segments)."""
    from pytrousse_spark.operators.cohort import rfm_segments

    ev = _t(spark, sf_dir, "events")
    return rfm_segments(ev, "user_id", "event_type", "purchase", "value")


def _sql_q195() -> str:
    from pytrousse_spark.operators.cohort import rfm_segments_sql

    return rfm_segments_sql(
        "events", "user_id", "event_type", "purchase", "value"
    )


def q196_ab_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-detectable-effect / power readout for the q148 A/B
    design at alpha=0.05 two-sided, 80% power — the pre-readout sanity
    check (a lift below the MDE is noise no matter the p-value);
    injected z-quantile literals, q176 CAST rule
    (operators/cohort.ab_power_mde)."""
    from pytrousse_spark.operators.cohort import ab_power_mde

    ev = _t(spark, sf_dir, "events")
    return ab_power_mde(ev, "user_id", "event_type", "view", "purchase")


def _sql_q196() -> str:
    from pytrousse_spark.operators.cohort import ab_power_mde_sql

    return ab_power_mde_sql(
        "events", "user_id", "event_type", "view", "purchase"
    )


def q197_segment_ab_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment A/B z-tests with Benjamini-Hochberg FDR control:
    the multiple-comparisons discipline for segment-sliced
    experiments; p-values from the A&S 7.1.26 normal-tail polynomial
    (IDENTICAL expression text in both engines — neither has erf),
    BH step-up over the bounded segment frame
    (operators/cohort.segment_ab_bh)."""
    from pytrousse_spark.operators.cohort import segment_ab_bh

    ev = _t(spark, sf_dir, "events")
    return segment_ab_bh(
        ev, "user_id", "event_type", "view", "purchase", n_segments=4
    )


def _sql_q197() -> str:
    from pytrousse_spark.operators.cohort import segment_ab_bh_sql

    return segment_ab_bh_sql(
        "events", "user_id", "event_type", "view", "purchase", 4
    )


def q198_ratio_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-per-view A/B readout with DELTA-METHOD standard errors
    (Deng et al. KDD 2018): per-user numerator/denominator sums whose
    within-user correlation the naive SE ignores; decimal-exact
    moments, single IEEE chain (operators/cohort.ratio_metric_delta).
    Completes the experimentation family: rates (q148), CUPED (q188),
    DiD (q189), MDE (q196), FDR (q197), ratio metrics (here)."""
    from pytrousse_spark.operators.cohort import ratio_metric_delta

    ev = _t(spark, sf_dir, "events")
    return ratio_metric_delta(
        ev, "user_id", "event_type", "purchase", "value", "view"
    )


def _sql_q198() -> str:
    from pytrousse_spark.operators.cohort import ratio_metric_delta_sql

    return ratio_metric_delta_sql(
        "events", "user_id", "event_type", "purchase", "value", "view"
    )


def q199_rmst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restricted mean survival time at tau = 14 days over the q178
    time-to-convert subjects: the area under the KM curve — the
    model-free censoring-safe effect size ("average conversion-free
    days in the first two weeks"); exact step-function integral over
    the bounded duration frame (operators/survival.rmst)."""
    from pytrousse_spark.operators.survival import rmst

    subj = _km_subjects(spark, sf_dir).select("dur_days", "converted")
    return rmst(subj, "dur_days", "converted", tau=14.0)


def _sql_q199() -> str:
    from pytrousse_spark.operators.survival import rmst_sql

    return rmst_sql(
        f"SELECT dur_days, converted FROM ({_KM_SUBJECTS_SQL}) s",
        "dur_days",
        "converted",
        14.0,
    )


def q200_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language classifier trained in-engine on
    the documents corpus (labels = lang) and read back as the
    resubstitution confusion matrix + accuracy — the *trained* sibling
    of the heuristic lang_id gate (q98), the CCNet/fastText corpus-LID
    shape (McCallum & Nigam 1998; Wenzek et al. 2020). Model = two
    corpus aggs; scoring = one token-keyed join against the sparse
    aggregated model (operators/classifier.naive_bayes_confusion)."""
    from pytrousse_spark.operators.classifier import naive_bayes_confusion

    d = _t(spark, sf_dir, "documents")
    return naive_bayes_confusion(d, "text", "lang", "doc_id")


def _sql_q200() -> str:
    from pytrousse_spark.operators.classifier import (
        naive_bayes_confusion_sql,
    )

    return naive_bayes_confusion_sql(
        "SELECT * FROM documents", "text", "lang", "doc_id"
    )


def q201_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision stump (one-split CART weak learner) on document length
    predicting lang='en' — the interpretable threshold rule beside the
    logreg quality gate (q110 family): 32-bin histogram + prefix sums
    on the bounded grid, weighted-Gini argmin with micro-unit
    knife-edge-safe ranking (operators/classifier.decision_stump)."""
    from pytrousse_spark.operators.classifier import decision_stump

    d = _t(spark, sf_dir, "documents").select(
        F.col("n_chars"), (F.col("lang") == "en").cast("int").alias("y")
    )
    return decision_stump(d, "n_chars", "y", 32)


def _sql_q201() -> str:
    from pytrousse_spark.operators.classifier import decision_stump_sql

    return decision_stump_sql(
        "SELECT n_chars, CAST(lang = 'en' AS INT) AS y FROM documents",
        "n_chars",
        "y",
        32,
    )


def q202_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test between early- and
    late-January purchase values — the location-shift sibling of the
    q186 KS shape test, over the same split: binned-rank 2U fold (the
    q175 AUC identity), tie-corrected variance with a HUGEINT/DECIMAL
    tie fold, A&S normal-tail p-value
    (profiling.mann_whitney_u)."""
    from pytrousse_spark.profiling import mann_whitney_u

    ev = _t(spark, sf_dir, "events")
    pur = ev.where(F.col("event_type") == "purchase")
    return mann_whitney_u(
        pur.where(F.col("ts") < "2024-01-16"),
        pur.where(F.col("ts") >= "2024-01-16"),
        "value",
    )


def _sql_q202() -> str:
    from pytrousse_spark.profiling import mann_whitney_u_sql

    base = (
        "SELECT value FROM events WHERE event_type = 'purchase' AND ts {} "
        "TIMESTAMP '2024-01-16'"
    )
    return mann_whitney_u_sql(base.format("<"), base.format(">="), "value")


def q203_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth fit V(n) ~ K*n^beta over the
    documents corpus in doc-id ingestion order — the corpus-health
    readout beside the Zipf fit (q105): 32 checkpoint points from two
    bounded-grid prefix folds (first-occurrence counting via min-doc-id
    per token — the q157 bucket-prefix device), nano-unit log-log OLS.
    The oracle recomputes every checkpoint with PLAIN filtered
    aggregates, certifying the decomposition
    (operators/corpus.heaps_law_fit)."""
    from pytrousse_spark.operators.corpus import heaps_law_fit

    d = _t(spark, sf_dir, "documents")
    return heaps_law_fit(d, "text", "doc_id", 32)


def _sql_q203() -> str:
    from pytrousse_spark.operators.corpus import heaps_law_fit_sql

    return heaps_law_fit_sql(
        "SELECT * FROM documents", "text", "doc_id", 32
    )


def q168_hill_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill tail-index estimate over order totals (Hill 1975): alpha
    from the top-200 order statistics via TakeOrderedAndProject + one
    nano-unit fold — the tail-heaviness diagnostic beside the Zipf token
    fit; alpha_hat recovers 1.54 on planted Pareto-1.5 (law test)
    (profiling.hill_tail_index)."""
    from pytrousse_spark.profiling import hill_tail_index

    o = _t(spark, sf_dir, "orders")
    return hill_tail_index(o, "o_totalprice", 200)


def _sql_q168() -> str:
    from pytrousse_spark.profiling import hill_tail_index_sql

    return hill_tail_index_sql("SELECT * FROM orders", "o_totalprice", 200)


def q169_dataset_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/S4 dataset persistence behind the hash gate (r5 VERDICT item
    3; reference dataset.py:668-807 shelve sink/source re-expressed as
    parquet + JSON lineage sidecar, io.py:149/167): a customer Dataset
    is transformed (FillNA — one lineage record, one derived column,
    one metadata column), written with ``write_dataset``, re-read with
    ``read_dataset`` (sidecar validated), and the returned per-segment
    profile is computed ONLY from the ROUND-TRIPPED dataset — counts,
    distinct keys, integer-cent balance mass, and a text-hash signature
    over a restored derived value. The sidecar's lineage/metadata/
    derived counts ride along as literal columns the oracle pins, so
    parquet corruption flips the hash and sidecar drift flips the
    counts (or read_dataset raises)."""
    import tempfile

    from pytrousse_spark import io as pio
    from pytrousse_spark.functions.hashing import h60

    c = _t(spark, sf_dir, "customer").withColumn(
        "seg_gap", F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    )
    ds = from_df(c, metadata_cols=("c_name",))
    ds = FillNA(["seg_gap"], "FILLED", derived_columns=["seg_filled"])(ds)
    # per-session path, same lifetime/concurrency reasoning as q102: the
    # driver collects AFTER this returns, so the dir must outlive the
    # call; applicationId keys concurrent harnesses apart. On a cluster
    # this is shared storage, not driver-local tmp.
    out_dir = os.path.join(
        tempfile.gettempdir(),
        "pytrousse_q169_ds_"
        f"{spark.sparkContext.applicationId}_"
        f"{os.path.basename(os.path.normpath(sf_dir))}",
    )
    pio.write_dataset(ds, out_dir, mode="overwrite")
    back = pio.read_dataset(spark, out_dir)
    return (
        back.df.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("c_custkey").alias("n_ids"),
            F.sum(
                F.round(F.col("c_acctbal") * 100, 0).cast("long")
            ).alias("bal_cents"),
            F.sum(
                F.pmod(
                    h60(F.concat_ws("|", "c_name", "seg_filled")),
                    F.lit(1_000_000_000),
                )
            ).alias("sig"),
        )
        .select(
            "*",
            F.lit(len(back.history)).cast("int").alias("lineage_ops"),
            F.lit(len(back.metadata_cols)).cast("int").alias("n_meta"),
            F.lit(len(back.derived_columns)).cast("int").alias("n_derived"),
        )
    )


def _sql_q169() -> str:
    from pytrousse_spark.functions.hashing import h60_sql

    h = h60_sql(
        "c_name || '|' || coalesce(nullif(c_mktsegment, 'BUILDING'), "
        "'FILLED')"
    )
    return f"""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_ids,
           CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
               AS bal_cents,
           CAST(sum(({h}) % 1000000000) AS BIGINT) AS sig,
           CAST(1 AS INT) AS lineage_ops,
           CAST(1 AS INT) AS n_meta,
           CAST(1 AS INT) AS n_derived
    FROM customer
    GROUP BY c_mktsegment
    """


def q171_png_rgb_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL truecolor RGB8 PNG codec round trip (r5 VERDICT item 8 —
    the one honest multimodal increment available without pillow/
    ffmpeg): each document id becomes a genuine 16x12 color-type-2 PNG
    (zlib IDAT, filters cycling all five standard types, a/c neighbors
    one 3-byte PIXEL left), decoded back by the pure-stdlib
    chunk-walk/inflate/unfilter path; the decoded channel checksum must
    equal the oracle's closed form over the generating formula
    (operators/multimodal.py)."""
    from pytrousse_spark.operators.multimodal import (
        decode_png_meta,
        synthesize_png_rgb_column,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id").orderBy("doc_id").limit(150)
    media = synthesize_png_rgb_column(d, "doc_id", width=16, height=12)
    return decode_png_meta(media, "media", "doc_id")


def _sql_q171() -> str:
    return """
    SELECT doc_id,
           CAST(16 AS INT) AS width,
           CAST(12 AS INT) AS height,
           CAST(8 AS INT) AS bit_depth,
           CAST(2 AS INT) AS color_type,
           CAST((SELECT SUM((doc_id * 7 + 3 * x.i + 5 * y.j + 11 * ch.c)
                            % 256)
                 FROM generate_series(0, 15) AS x(i),
                      generate_series(0, 11) AS y(j),
                      generate_series(0, 2) AS ch(c)) AS BIGINT)
               AS pixel_sum
    FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 150)
    """


def q173_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness census over customer quasi-identifiers (Li 2007) —
    the third leg of the privacy trio (q158 k-anonymity, q162
    l-diversity): per-threshold share of rows in equivalence classes
    whose market-segment DISTRIBUTION strays more than t (total
    variation) from the global one — the skewness-attack readout
    l-diversity misses. Dense class x value grid, pico-unit integer
    folds, integer threshold compares
    (operators/anonymize.t_closeness_census)."""
    from pytrousse_spark.operators.anonymize import t_closeness_census

    c = _t(spark, sf_dir, "customer")
    return t_closeness_census(
        c, ["c_nationkey"], "c_mktsegment", [0.05, 0.1, 0.2]
    )


def _sql_q173() -> str:
    from pytrousse_spark.operators.anonymize import t_closeness_census_sql

    return t_closeness_census_sql(
        "SELECT * FROM customer", ["c_nationkey"], "c_mktsegment",
        [0.05, 0.1, 0.2],
    )


def q174_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially private event-type counts (Laplace mechanism,
    Dwork 2006): count + Lap(1/eps) per group with the noise drawn from
    a keyed PRF (salted portable hash -> inverse CDF) instead of an RNG
    — reproducible, cross-engine-exact, eps-DP per release salt. The
    release-side complement of the privacy censuses
    (operators/anonymize.dp_noisy_counts)."""
    from pytrousse_spark.operators.anonymize import dp_noisy_counts

    ev = _t(spark, sf_dir, "events")
    return dp_noisy_counts(ev, ["event_type"], epsilon=1.0, salt="r6")


def _sql_q174() -> str:
    from pytrousse_spark.operators.anonymize import dp_noisy_counts_sql

    return dp_noisy_counts_sql(
        "SELECT * FROM events", ["event_type"], epsilon=1.0, salt="r6"
    )


def q175_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC of order value as a predictor of urgent priority, via the
    rank-sum identity over a 4096-bin score histogram — exact BIGINT
    pair fold, ONE division, no global sort (the exact rank-sum's
    funnel); in-bin rows are ties, error bounded by in-bin pair mass
    and pinned vs exact pairwise AUC in tests
    (operators/classifier.auc_binned)."""
    from pytrousse_spark.operators.classifier import auc_binned

    o = _t(spark, sf_dir, "orders").select(
        "o_totalprice",
        F.col("o_orderpriority")
        .isin("1-URGENT", "2-HIGH")
        .cast("int")
        .alias("is_urgent"),
    )
    return auc_binned(o, "o_totalprice", "is_urgent")


def _sql_q175() -> str:
    from pytrousse_spark.operators.classifier import auc_binned_sql

    return auc_binned_sql(
        "SELECT o_totalprice, CASE WHEN o_orderpriority IS NULL THEN NULL"
        " WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END"
        " AS is_urgent FROM orders",
        "o_totalprice",
        "is_urgent",
    )


def _q176_frames(spark: SparkSession, sf_dir: str):
    """Left = customer projections; right = the same entities with
    deterministic field corruption (every 3rd balance bucket shifted,
    every 5th segment rewritten) — the dirty-file half of the linkage
    gate. Returned as (left, right)."""
    c = _t(spark, sf_dir, "customer")
    tail = F.expr("right(c_name, 4)")
    bucket = F.floor(F.col("c_acctbal") / 100).cast("long")
    left = c.select(
        "c_custkey", "c_nationkey", "c_mktsegment",
        bucket.alias("bal_bucket"), tail.alias("name_tail"),
    )
    right = c.select(
        F.col("c_custkey").alias("r_id"),
        "c_nationkey",
        F.when(F.col("c_custkey") % 5 == 0, F.lit("MACHINERY"))
        .otherwise(F.col("c_mktsegment")).alias("c_mktsegment"),
        (bucket + F.when(F.col("c_custkey") % 3 == 0, 1).otherwise(0))
        .alias("bal_bucket"),
        tail.alias("name_tail"),
    )
    return left, right


_Q176_COMPARES = [
    ("c_mktsegment", 0.9, 0.2),
    ("bal_bucket", 0.9, 0.01),
    ("name_tail", 0.99, 0.0001),
]


def q176_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage (1969): customers
    linked to a deterministically-corrupted copy of themselves — blocked
    on nation (the candidate bound), per-field agreement weights
    ln(m/u) / ln((1-m)/(1-u)) computed in PYTHON and injected as
    literals (no engine ln — bit-identical scores), three-way
    link/possible/non-link decision. Summarized as a per-decision
    census with the same-entity count — the precision/recall readout
    (operators/linkage.fs_link_pairs). SCALE NOTE: nation is a
    demo-scale blocking key (25 blocks -> n^2/625 candidate pairs); a
    production linkage blocks on tighter keys (zip+year, phonetic name
    codes) or multi-pass union-of-blockings — the operator takes any
    key list, the quadratic bound is the caller's blocking choice."""
    from pytrousse_spark.operators.linkage import fs_link_pairs

    left, right = _q176_frames(spark, sf_dir)
    pairs = fs_link_pairs(
        left, right, "c_custkey", "r_id", ["c_nationkey"],
        _Q176_COMPARES, lower=-1.0, upper=5.0,
    )
    return pairs.groupBy("decision").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(
            F.when(F.col("c_custkey") == F.col("r_id"), 1).otherwise(0)
        ).cast("bigint").alias("n_same_entity"),
        F.min("score").alias("min_score"),
        F.max("score").alias("max_score"),
    )


def _sql_q176() -> str:
    from pytrousse_spark.operators.linkage import fs_link_pairs_sql

    left = (
        "SELECT c_custkey, c_nationkey, c_mktsegment,"
        " CAST(floor(c_acctbal / 100) AS BIGINT) AS bal_bucket,"
        " right(c_name, 4) AS name_tail FROM customer"
    )
    right = (
        "SELECT c_custkey AS r_id, c_nationkey,"
        " CASE WHEN c_custkey % 5 = 0 THEN 'MACHINERY'"
        " ELSE c_mktsegment END AS c_mktsegment,"
        " CAST(floor(c_acctbal / 100) AS BIGINT)"
        " + CASE WHEN c_custkey % 3 = 0 THEN 1 ELSE 0 END AS bal_bucket,"
        " right(c_name, 4) AS name_tail FROM customer"
    )
    inner = fs_link_pairs_sql(
        left, right, "c_custkey", "r_id", ["c_nationkey"],
        _Q176_COMPARES, lower=-1.0, upper=5.0,
    )
    return f"""
    WITH pairs AS ({inner})
    SELECT decision,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN c_custkey = r_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_same_entity,
           min(score) AS min_score,
           max(score) AS max_score
    FROM pairs GROUP BY decision
    """


def q170_rank_transform_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Auto-routed rank transform (r5 VERDICT item 5): ONE cheap
    group-profile aggregation (max per-group row count — map-side
    partials, two numbers to the driver) picks the exact window vs the
    histogram-sketch CDF. Here the 2-status lineitem key exceeds the
    per-group sort budget at EVERY SF (the budget is set to 500 rows so
    the routing decision is SF-invariant), so auto takes the sketch
    path — zero per-group Sort, the q156 plan shape — and the oracle IS
    the sketch twin. The routing rule itself is pinned both ways in
    tests/test_transforms.py (3-group key -> sketch, unique key ->
    exact)."""
    from pytrousse_spark.operators.transforms import percent_rank_transform

    li = _t(spark, sf_dir, "lineitem").select("l_linestatus", "l_quantity")
    r = percent_rank_transform(
        li,
        "l_linestatus",
        "l_quantity",
        strategy="auto",
        exact_max_group_rows=500,
    )
    decile = F.least(F.lit(9), F.floor(F.col("pct_rank") * 10).cast("int"))
    return (
        r.select(
            "l_linestatus",
            decile.alias("decile"),
            F.col("l_quantity"),
        )
        .groupBy("l_linestatus", "decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        )
    )


def _sql_q170() -> str:
    from pytrousse_spark.operators.transforms import (
        percent_rank_transform_approx_sql,
    )

    inner = percent_rank_transform_approx_sql(
        "(SELECT l_linestatus, l_quantity FROM lineitem) li",
        "l_linestatus",
        "l_quantity",
    )
    return f"""
    WITH ranked AS ({inner})
    SELECT l_linestatus,
           CAST(least(9, floor(pct_rank * 10)) AS INT) AS decile,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(l_quantity), 4) AS avg_qty
    FROM ranked
    GROUP BY 1, 2
    """


def q172_k_anonymity_enforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppression ENFORCEMENT behind the hash gate, NULL class included
    (drives the r5 ADVICE fix: the semi join is null-safe per QI column,
    so a NULL quasi-identifier class with >= k members SURVIVES — the
    census q158 counts it, so enforcement must keep it). Customers with
    a synthesized NULL segment are suppressed to 8-anonymity over
    (nation, segment); the per-segment survivor profile includes the
    NULL-segment row, which the old null-rejecting join deleted
    wholesale (operators/anonymize.enforce_k_anonymity)."""
    from pytrousse_spark.operators.anonymize import enforce_k_anonymity

    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_gap"),
    )
    kept = enforce_k_anonymity(c, ["c_nationkey", "seg_gap"], 8)
    return kept.groupBy("seg_gap").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("c_custkey").alias("n_ids"),
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.sum(F.col("c_custkey") % F.lit(1_000_003)).alias("key_sig"),
    )


def _sql_q172() -> str:
    return """
    WITH t AS (
        SELECT c_custkey, c_nationkey,
               nullif(c_mktsegment, 'BUILDING') AS seg_gap
        FROM customer
    ), sized AS (
        SELECT *, count(*) OVER (PARTITION BY c_nationkey, seg_gap)
                      AS __cls
        FROM t
    )
    SELECT seg_gap,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_ids,
           CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
           CAST(sum(c_custkey % 1000003) AS BIGINT) AS key_sig
    FROM sized WHERE __cls >= 8
    GROUP BY seg_gap
    """


def q48_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: token counts, language-id, quality, fingerprint —
    tokens/shingles staged once per row (see functions/text.py)."""
    from pytrousse_spark.io import rebalance_undersplit

    d = rebalance_undersplit(_t(spark, sf_dir, "documents"))
    t = F.col("text")
    toks = F.col("__tk")
    return (
        d.withColumn("__tk", tx.tokens(t))
        .withColumn("__sh", tx.shingles_from_tokens(toks, 3))
        .select(
            "doc_id",
            F.size(toks).cast("long").alias("n_tokens"),
            tx.bpe_ish_token_count(t).alias("n_subtokens"),
            tx.lang_id_from_tokens(toks).alias("lang_guess"),
            tx.quality_score_from_tokens(t, toks).alias("quality"),
            tx.fingerprint_from_shingles(F.col("__sh")).alias("fingerprint"),
        )
    )


def _sql_q48() -> str:
    return f"""
    SELECT doc_id,
           CAST(len({tx.tokens_sql('text')}) AS BIGINT) AS n_tokens,
           {tx.bpe_ish_token_count_sql('text')} AS n_subtokens,
           {tx.lang_id_sql('text')} AS lang_guess,
           {tx.quality_score_sql('text')} AS quality,
           {tx.fingerprint_sql('text')} AS fingerprint
    FROM documents
    """


def q49_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: opaque binary payload + typed metadata struct."""
    from pytrousse_spark.operators.multimodal import attach_media_column

    d = _t(spark, sf_dir, "documents")
    m = attach_media_column(d, "text")
    return m.select(
        "doc_id",
        F.col("media_meta.byte_size").alias("byte_size"),
        F.col("media_meta.sha256").alias("payload_sha256"),
    )


def _sql_q49() -> str:
    return """
    SELECT doc_id, CAST(strlen(text) AS BIGINT) AS byte_size,
           sha256(text) AS payload_sha256
    FROM documents
    """


def q31_overlap_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5 overlapping-bin row duplication on l_quantity ([0,25] and [20,50]
    overlap in 20-25; values there appear in both bins)."""
    from pytrousse_spark.operators.binning import explode_overlapping_bins

    ds = from_df(_t(spark, sf_dir, "lineitem"))
    out = explode_overlapping_bins(ds, "l_quantity", [(0, 25), (20, 50)], "qbin")
    return out.df.select("l_orderkey", "l_linenumber", "qbin")


def _sql_q31() -> str:
    return """
    SELECT l_orderkey, l_linenumber, CAST(0 AS SMALLINT) AS qbin
    FROM lineitem WHERE l_quantity BETWEEN 0 AND 25
    UNION ALL
    SELECT l_orderkey, l_linenumber, CAST(1 AS SMALLINT) AS qbin
    FROM lineitem WHERE l_quantity BETWEEN 20 AND 50
    """


def q32_multi_combo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3 prefix combinations (feature_fix.py:425-455): combo id for
    (l_returnflag) then (l_returnflag, l_linestatus), both in one lazy plan."""
    from pytrousse_spark.operators.binning import (
        make_categorical_columns_multiple_combinations,
    )

    ds = from_df(_t(spark, sf_dir, "lineitem"))
    out, combo_cols = make_categorical_columns_multiple_combinations(
        ds, ["l_returnflag", "l_linestatus"]
    )
    return out.df.select(
        "l_orderkey",
        "l_linenumber",
        F.col(combo_cols[0]).alias("combo_rf"),
        F.col(combo_cols[1]).alias("combo_rf_ls"),
    )


def _sql_q32() -> str:
    return """
    WITH v1 AS (
        SELECT l_returnflag AS v,
               row_number() OVER (ORDER BY l_returnflag) - 1 AS c
        FROM (SELECT DISTINCT l_returnflag FROM lineitem WHERE l_returnflag IS NOT NULL)
    ), v2 AS (
        SELECT l_linestatus AS v,
               row_number() OVER (ORDER BY l_linestatus) - 1 AS c
        FROM (SELECT DISTINCT l_linestatus FROM lineitem WHERE l_linestatus IS NOT NULL)
    )
    SELECT l_orderkey, l_linenumber,
           CAST(v1.c AS SMALLINT) AS combo_rf,
           CAST(v1.c * (SELECT count(*) FROM v2) + v2.c AS SMALLINT) AS combo_rf_ls
    FROM lineitem
    LEFT JOIN v1 ON l_returnflag = v1.v
    LEFT JOIN v2 ON l_linestatus = v2.v
    """


def q33_encode_single(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6 orchestrated single-column encode (feature_fix.py:242-349): NULLs
    route through the 'Nan' placeholder category and case variants fold via
    initcap(lower(x)); the encoded output restores NULL for NULL inputs."""
    from pytrousse_spark.operators.encoding import (
        encode_single_categorical_column,
    )

    c = _t(spark, sf_dir, "customer")
    seg = (
        F.when(F.col("c_custkey") % 7 == 0, F.lit(None))
        .when(F.col("c_custkey") % 2 == 0, F.lower(F.col("c_mktsegment")))
        .otherwise(F.col("c_mktsegment"))
    )
    ds = from_df(c.select("c_custkey", seg.alias("seg")))
    out = encode_single_categorical_column(ds, "seg", encoding="ORDINAL")
    return out.df.select("c_custkey", "seg", "seg_enc")


def _sql_q33() -> str:
    # DuckDB v1.0 has no initcap; c_mktsegment values are single words, so
    # upper-first-char over lower() is an exact twin of initcap(lower(x)).
    return """
    WITH base AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 7 = 0 THEN NULL
                    WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment)
                    ELSE c_mktsegment END AS seg
        FROM customer
    ), prep AS (
        SELECT c_custkey, seg,
               CASE WHEN seg IS NULL THEN 'Nan'
                    ELSE upper(substr(lower(seg), 1, 1)) || substr(lower(seg), 2)
               END AS p
        FROM base
    ), vocab AS (
        SELECT p AS v, CAST(row_number() OVER (ORDER BY p) - 1 AS BIGINT) AS code
        FROM (SELECT DISTINCT p FROM prep)
    )
    SELECT c_custkey, seg,
           CASE WHEN seg IS NULL THEN NULL ELSE code END AS seg_enc
    FROM prep JOIN vocab ON p = v
    """


def q34_encode_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7 multi-column ONEHOT encode (feature_fix.py:352-397): per column the
    B6 flow — Nan placeholder for NULLs (its category column dropped), NULL
    row → NULL in all K outputs, data-dependent derived column names."""
    from pytrousse_spark.operators.encoding import (
        encode_multi_categorical_columns,
    )

    o = _t(spark, sf_dir, "orders")
    status = F.when(F.col("o_orderkey") % 11 == 0, F.lit(None)).otherwise(
        F.col("o_orderstatus")
    )
    prio = F.concat(F.lit("p"), F.substring("o_orderpriority", 1, 1))
    ds = from_df(
        o.select("o_orderkey", status.alias("status"), prio.alias("prio"))
    )
    out = encode_multi_categorical_columns(
        ds, ("prio", "status"), encoding="ONEHOT"
    )
    return out.df.select(
        "o_orderkey",
        *[f"prio_P{i}_enc" for i in range(1, 6)],
        "status_F_enc",
        "status_O_enc",
        "status_P_enc",
    )


def _sql_q34() -> str:
    prio_cols = ",\n           ".join(
        f"prio = 'p{i}' AS prio_P{i}_enc" for i in range(1, 6)
    )
    status_cols = ",\n           ".join(
        f"CASE WHEN status IS NULL THEN NULL ELSE status = '{s}' END"
        f" AS status_{s}_enc"
        for s in ("F", "O", "P")
    )
    return f"""
    WITH base AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_orderstatus END AS status,
               'p' || substr(o_orderpriority, 1, 1) AS prio
        FROM orders
    )
    SELECT o_orderkey,
           {prio_cols},
           {status_cols}
    FROM base
    """


def q50_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame-sampling plan: every 30th estimated frame per doc."""
    from pytrousse_spark.operators.multimodal import (
        attach_media_column,
        frame_sample_plan,
    )

    d = _t(spark, sf_dir, "documents")
    m = attach_media_column(d, "text", media_type="video")
    return frame_sample_plan(m, every_nth=30).select("doc_id", "frame_index")


def _sql_q50() -> str:
    return """
    WITH m AS (
        SELECT doc_id,
               CAST(floor(CAST(strlen(text) AS BIGINT) / 100) + 1 AS INT) AS est
        FROM documents
    )
    SELECT doc_id, CAST(unnest(range(0, est, 30)) AS BIGINT) AS frame_index
    FROM m
    """



def q51_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operator Spark lacks natively): each purchase event gets
    the user's most recent preceding view event. Right side deduplicated per
    (user, ts) so tie survivors are deterministic in both engines."""
    from pytrousse_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("event_id"))
    )
    out = asof_join(
        purchases, views, on="user_id", left_time="ts", right_time="ts",
        right_cols=["event_id"],
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("event_id_right").alias("view_event_id"),
        F.col("ts_right").alias("view_ts"),
    )


def _sql_q51() -> str:
    return """
    WITH purchases AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), views AS (
        SELECT user_id, ts, max(event_id) AS event_id
        FROM events WHERE event_type = 'view' GROUP BY user_id, ts
    )
    SELECT p.event_id, p.user_id, p.ts,
           v.event_id AS view_event_id, v.ts AS view_ts
    FROM purchases p
    ASOF LEFT JOIN views v ON p.user_id = v.user_id AND p.ts >= v.ts
    """



def q51b_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, FORWARD direction with a 1-hour tolerance: each purchase
    gets the user's next view event at-or-after it, NULLs when the next view
    is more than an hour out. Oracles the direction="forward" and tolerance
    branches of operators/asof.py (q51 covers backward only); DuckDB's ASOF
    supports the forward inequality directly, tolerance via CASE (the
    forward match is the minimal v.ts >= p.ts, so a match beyond tolerance
    implies no match within it)."""
    from pytrousse_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("event_id"))
    )
    out = asof_join(
        purchases, views, on="user_id", left_time="ts", right_time="ts",
        right_cols=["event_id"], direction="forward", tolerance=3600.0,
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("event_id_right").alias("view_event_id"),
        F.col("ts_right").alias("view_ts"),
    )


def _sql_q51b() -> str:
    return """
    WITH purchases AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), views AS (
        SELECT user_id, ts, max(event_id) AS event_id
        FROM events WHERE event_type = 'view' GROUP BY user_id, ts
    )
    SELECT p.event_id, p.user_id, p.ts,
           CASE WHEN v.ts <= p.ts + INTERVAL 1 HOUR THEN v.event_id END
               AS view_event_id,
           CASE WHEN v.ts <= p.ts + INTERVAL 1 HOUR THEN v.ts END AS view_ts
    FROM purchases p
    ASOF LEFT JOIN views v ON p.user_id = v.user_id AND p.ts <= v.ts
    """



def q70_stream_dedup_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming ingestion-dedup guard
    (streaming/events.py dedup_events_stream): plant full-row duplicates by
    re-appending every 7th event, dedup on event_id. Because the planted
    duplicates are bit-identical rows, any dropDuplicates survivor is
    value-identical — deterministic under the driver's hash. The streaming
    side (dropDuplicatesWithinWatermark) is pinned to this twin by
    tests/test_streaming.py's operator-parity test; this row puts the shared
    semantics behind the driver's oracle gate."""
    from pytrousse_spark.streaming.events import dedup_events_stream

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    doubled = ev.unionAll(ev.where(F.col("event_id") % 7 == 0))
    return dedup_events_stream(doubled, key_cols=("event_id",))


def _sql_q70() -> str:
    return """
    SELECT DISTINCT event_id, user_id, event_type, ts
    FROM (
        SELECT event_id, user_id, event_type, ts FROM events
        UNION ALL
        SELECT event_id, user_id, event_type, ts FROM events
        WHERE event_id % 7 = 0
    )
    """



def q71_interval_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-struct round trip (reference dataset.py:334 Interval columns):
    B1-bin l_quantity, attach each bin's [lo, hi] as a struct<lower,upper>
    via attach_bin_intervals (ingestion side of pandas Interval), then read
    the struct BACK through a bin re-assignment — recomputing the bin id
    from the interval bounds alone and counting rows where membership holds.
    Oracles the interval-struct data path end-to-end, not just the profile
    classification."""
    ds = from_df(_t(spark, sf_dir, "lineitem"))
    binned = split_continuous_column_into_bins(ds, "l_quantity", [10, 25, 40])
    from pytrousse_spark.operators.binning import attach_bin_intervals

    with_iv = attach_bin_intervals(binned, "l_quantity_bin_id")
    df = with_iv.df
    iv = F.col("l_quantity_bin_id_interval")
    q = F.col("l_quantity").cast("double")
    return (
        df.where(iv.isNotNull())
        .groupBy(F.col("l_quantity_bin_id").alias("bin_id"))
        .agg(
            F.round(F.min(iv.getField("lower")), 2).alias("lo"),
            F.round(F.max(iv.getField("upper")), 2).alias("hi"),
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    (q >= iv.getField("lower")) & (q <= iv.getField("upper")),
                    1,
                ).otherwise(0)
            ).cast("long").alias("n_in_range"),
        )
    )


def _sql_q71() -> str:
    # same closed-form binning as _sql_q26, bounds rebuilt from the
    # threshold list exactly as attach_bin_intervals reads them from the
    # operator's history record: [min-1, 10, 25, 40, max]
    return """
    WITH bounds AS (
        SELECT min(l_quantity) - 1 AS b0, max(l_quantity) AS b4 FROM lineitem
    ), b AS (
        SELECT l_quantity,
               CAST(CASE WHEN l_quantity IS NOT NULL
                          AND l_quantity >= (SELECT b0 FROM bounds)
                          AND l_quantity <= (SELECT b4 FROM bounds)
                    THEN (CASE WHEN l_quantity >= 10 THEN 1 ELSE 0 END
                        + CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END
                        + CASE WHEN l_quantity >= 40 THEN 1 ELSE 0 END)
                    END AS SMALLINT) AS bin_id
        FROM lineitem
    ), iv AS (
        SELECT bin_id, l_quantity,
               CASE bin_id WHEN 0 THEN (SELECT b0 FROM bounds)
                           WHEN 1 THEN 10.0 WHEN 2 THEN 25.0
                           WHEN 3 THEN 40.0 END AS lower,
               CASE bin_id WHEN 0 THEN 10.0 WHEN 1 THEN 25.0
                           WHEN 2 THEN 40.0
                           WHEN 3 THEN (SELECT b4 FROM bounds) END AS upper
        FROM b WHERE bin_id IS NOT NULL
    )
    SELECT bin_id, round(min(lower), 2) AS lo, round(max(upper), 2) AS hi,
           count(*) AS n,
           CAST(sum(CASE WHEN l_quantity >= lower AND l_quantity <= upper
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_in_range
    FROM iv GROUP BY bin_id
    """



def q72_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction census: plant synthetic PII (email/phone/IP/SSN/card)
    into a deterministic subset of documents, then count matches per type
    and measure the scrubbed text — the redaction pass of a pre-training
    pipeline, entirely regexp expressions (scan-bound at 100 TB)."""
    from pytrousse_spark.functions.pii import pii_counts, scrub_pii

    d = _t(spark, sf_dir, "documents")
    planted = d.withColumn(
        "__t",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.lit(" contact alice.smith@example.com now"),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.lit(" call 555-123-4567 from 10.0.0.1"),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.lit(" ssn 123-45-6789 card 4111-1111-1111-1111"),
            ).otherwise(F.lit("")),
        ),
    )
    counts = pii_counts(F.col("__t"))
    return planted.select(
        "doc_id",
        *[v.alias(k) for k, v in counts.items()],
        F.length(scrub_pii(F.col("__t"))).cast("long").alias("scrubbed_len"),
    )


def _sql_q72() -> str:
    from pytrousse_spark.functions.pii import pii_counts_sql, scrub_pii_sql

    planted = (
        "text || (CASE WHEN doc_id % 5 = 0 "
        "THEN ' contact alice.smith@example.com now' ELSE '' END)"
        " || (CASE WHEN doc_id % 7 = 0 "
        "THEN ' call 555-123-4567 from 10.0.0.1' ELSE '' END)"
        " || (CASE WHEN doc_id % 11 = 0 "
        "THEN ' ssn 123-45-6789 card 4111-1111-1111-1111' ELSE '' END)"
    )
    counts = ",\n           ".join(
        f"{sql} AS {name}" for name, sql in pii_counts_sql("__t").items()
    )
    return f"""
    WITH p AS (SELECT doc_id, {planted} AS __t FROM documents)
    SELECT doc_id,
           {counts},
           CAST(length({scrub_pii_sql('__t')}) AS BIGINT) AS scrubbed_len
    FROM p
    """


def q73_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: distinct-token ratio,
    most-frequent-token share, most-frequent-bigram share."""
    from pytrousse_spark.io import rebalance_undersplit

    d = rebalance_undersplit(_t(spark, sf_dir, "documents"))
    return tx.repetition_stats(d, "text", "doc_id")


def _sql_q73() -> str:
    return tx.repetition_stats_sql("documents", "text", "doc_id")


def q74_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-free perplexity filter: mean unigram surprisal per document
    under the corpus's own unigram distribution."""
    d = _t(spark, sf_dir, "documents")
    return tx.unigram_surprisal(d, "text", "doc_id")


def _sql_q74() -> str:
    return tx.unigram_surprisal_sql("documents", "text", "doc_id")


def q75_cross_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus dedup: incoming (test-split) documents that survive
    exact-fingerprint AND verified near-dup matching against the reference
    (train-split) corpus — 'is this new crawl novel vs my training set'.
    Only cross-side candidate pairs materialize."""
    from pytrousse_spark.operators import sampling as sp

    d = _t(spark, sf_dir, "documents")
    split = sp.hash_split(d, "doc_id")
    incoming = split.where("split = 'test'").select("doc_id", "text", "n_chars")
    reference = split.where("split = 'train'").select("doc_id", "text")
    out = dd.cross_dedup(
        incoming, reference, "text", "doc_id",
        num_perm=8, bands=4, threshold=0.2,
    )
    return out.select("doc_id", "n_chars")


def _sql_q75() -> str:
    from pytrousse_spark.operators.sampling import hash_split_sql

    lbl = hash_split_sql("doc_id")
    inc = f"(SELECT doc_id, text, n_chars FROM documents WHERE {lbl} = 'test')"
    ref = f"(SELECT doc_id, text FROM documents WHERE {lbl} = 'train')"
    inner = dd.cross_dedup_sql(
        inc, ref, "text", "doc_id", num_perm=8, bands=4, threshold=0.2
    )
    return f"SELECT doc_id, n_chars FROM ({inner})"


_MIX_WEIGHTS = {"en": 0.4, "de": 0.2, "fr": 0.2, "zh": 0.2}


def q76_target_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mix downsampling: per-language targets derived from the
    binding group (min n_g/w_g), selection by salted content hash — the
    deterministic '40% en / 20% de / 20% fr / 20% zh' mixing step; 'es' is
    deliberately outside the weights and must drop entirely."""
    from pytrousse_spark.operators.sampling import target_mix_sample

    d = _t(spark, sf_dir, "documents")
    out = target_mix_sample(d, "lang", _MIX_WEIGHTS, "doc_id")
    return out.select("doc_id", "lang")


def _sql_q76() -> str:
    from pytrousse_spark.operators.sampling import target_mix_sample_sql

    inner = target_mix_sample_sql("documents", "lang", _MIX_WEIGHTS, "doc_id")
    return f"SELECT doc_id, lang FROM ({inner})"


def q77_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dedup with the keep-longest survivor policy: each
    duplicate cluster keeps its highest-n_chars member (ties to smaller id)
    instead of min-id — one max_by hash agg per component, no window."""
    d = _t(spark, sf_dir, "documents")
    out = dd.near_dedup_keep_best(
        d, "text", "doc_id", "n_chars",
        num_perm=8, bands=4, threshold=0.2,
    )
    return out.select("doc_id", "n_chars")


def _sql_q77() -> str:
    inner = dd.near_dedup_keep_best_sql(
        "documents", "text", "doc_id", "n_chars",
        num_perm=8, bands=4, threshold=0.2,
    )
    return f"SELECT doc_id, n_chars FROM ({inner})"



def q78_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means over the embedding table: deterministic hash-picked
    init, 2 iterations, map-side assignment vs broadcast centroid literals
    (vectors never shuffle; update shuffles only (cluster, pos) hash-agg
    partials). Oracle = the same loop unrolled into CTEs."""
    from pytrousse_spark.operators.clustering import kmeans

    e = _t(spark, sf_dir, "embeddings")
    return kmeans(e, "vec_id", "embedding", k=8, iters=2)


def _sql_q78() -> str:
    from pytrousse_spark.operators.clustering import kmeans_sql

    return kmeans_sql("embeddings", 8, 64, iters=2)


def q79_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means cells, then cosine pairs ONLY
    within a cell; drop the greater id of any pair with cos >= tau. The
    cell-keyed self-join is the only shuffle; cross-cell pairs are never
    formed."""
    from pytrousse_spark.operators.clustering import semantic_dedup_pairs

    e = _t(spark, sf_dir, "embeddings")
    return semantic_dedup_pairs(
        e, "vec_id", "embedding", k=8, iters=2, tau=0.2
    )


def _sql_q79() -> str:
    from pytrousse_spark.operators.clustering import semantic_dedup_pairs_sql

    return semantic_dedup_pairs_sql("embeddings", 8, 64, iters=2, tau=0.2)


def q80_dup_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplication signal (Lee et al. 2022): per-document
    share of 3-gram positions whose 3-gram occurs in >=2 distinct docs —
    catches boilerplate stitching that document-level fingerprints miss."""
    d = _t(spark, sf_dir, "documents")
    return tx.duplicated_ngram_stats(d, "text", "doc_id", n=3, min_docs=2)


def _sql_q80() -> str:
    return tx.duplicated_ngram_stats_sql(
        "documents", "text", "doc_id", n=3, min_docs=2
    )


def q81_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): log p_target/p_source per
    document under add-one-smoothed unigram LMs, target = the English
    subset — the 'select web data that looks like my target domain' step."""
    from pytrousse_spark.operators.sampling import dsir_importance

    d = _t(spark, sf_dir, "documents")
    return dsir_importance(d, "text", "doc_id", "lang = 'en'")


def _sql_q81() -> str:
    from pytrousse_spark.operators.sampling import dsir_importance_sql

    return dsir_importance_sql("documents", "text", "doc_id", "lang = 'en'")


def q82_cluster_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced diversification (cluster-then-cap): k-means cells,
    then at most 40 vectors per cell by salted id hash — caps over-dense
    embedding regions; map-side assignment, one k-keyed window shuffle."""
    from pytrousse_spark.operators.clustering import cluster_cap_sample

    e = _t(spark, sf_dir, "embeddings")
    return cluster_cap_sample(e, "vec_id", "embedding", k=8, iters=2, cap=40)


def _sql_q82() -> str:
    from pytrousse_spark.operators.clustering import cluster_cap_sample_sql

    return cluster_cap_sample_sql("embeddings", 8, 64, iters=2, cap=40)


def q83_remove_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level dedup transform (Lee et al. 2022): strip every token
    covered by a 3-gram occurring in >=2 docs, reassemble the survivors —
    the cleaning step whose census q80 reports."""
    d = _t(spark, sf_dir, "documents")
    return tx.remove_duplicated_ngrams(d, "text", "doc_id", n=3, min_docs=2)


def _sql_q83() -> str:
    return tx.remove_duplicated_ngrams_sql(
        "documents", "text", "doc_id", n=3, min_docs=2
    )


def q84_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus collocations: top-50 adjacent bigrams by PMI with support
    >=5 (Church & Hanks 1990) — phrase mining / boilerplate spotting."""
    d = _t(spark, sf_dir, "documents")
    return tx.pmi_collocations(d, "text", top_k=50, min_count=5)


def _sql_q84() -> str:
    return tx.pmi_collocations_sql("documents", "text", top_k=50, min_count=5)


def q85_rolling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per-user rolling 1-hour mean/count of
    `value` — the frame is time-based (RANGE over epoch micros), not
    row-based, so sparse and dense users get the same semantics.

    SCALE NOTE: the plain window funnels each user's history through one
    task (4.4x wall under 20% single-user skew, bench.py skew battery).
    q157 computes the IDENTICAL frame via the bucketed prefix
    decomposition (timeseries.rolling_time_window) with max task bounded
    by one (user, hour) bucket — use that path for skewed keys."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).cast("long").alias("roll_n"),
        F.round(F.avg("value").over(w), 4).alias("roll_avg"),
    )


def _sql_q85() -> str:
    return """
    SELECT event_id, user_id, ts,
           CAST(count(*) OVER w AS BIGINT) AS roll_n,
           round(avg(value) OVER w, 4) AS roll_avg
    FROM events
    WINDOW w AS (
      PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
    )
    """


def q86_quality_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality tiering: NTILE(4) buckets over per-doc unigram
    surprisal (tier 1 = most templated, 4 = noisiest); unique doc_id
    tie-break keeps the bucketing engine-deterministic.

    SCALE NOTE: the global ORDER BY window is the oracle-exact form and
    single-partitions the tier pass. At corpus scale swap it for
    percentile_approx(mean_surprisal, [.25,.5,.75]) thresholds broadcast
    into a map-side CASE — same tiers up to sketch error, no global sort."""
    d = _t(spark, sf_dir, "documents")
    s = tx.unigram_surprisal(d, "text", "doc_id")
    w = Window.orderBy("mean_surprisal", "doc_id")
    return s.select(
        "doc_id",
        "mean_surprisal",
        F.ntile(4).over(w).cast("int").alias("tier"),
    )


def _sql_q86() -> str:
    inner = tx.unigram_surprisal_sql("documents", "text", "doc_id")
    return f"""
    SELECT doc_id, mean_surprisal,
           CAST(ntile(4) OVER (ORDER BY mean_surprisal, doc_id) AS INT)
             AS tier
    FROM ({inner})
    """


_BLOOM_SRC = ("src0", "src1", "src2", "src3", "src4")


def q87_bloom_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom contamination pre-screen: per probe document, how many of its
    word 3-shingles are *probably* present in the build-half corpus.

    Production path under test: the build shingles collapse into a 64
    Kibit Bloom sketch (one DISTINCT-positions shuffle bounded by m; 8 KiB
    bitset broadcast), and every probe document is screened entirely
    map-side — shingle positions are computed JVM-side, one vectorized
    Arrow bit test + reduceat segment-sum per batch. Zero-hit documents are
    GUARANTEED clean (Bloom has no false negatives), so at 100 TB this
    gates the exact contamination join (q64) down to the suspicious tail
    without ever shuffling the probe corpus. Oracle reproduces the sketch
    bit-for-bit via the portable h60 family.
    """
    from pytrousse_spark.operators.bloom import (
        bloom_positions,
        bloom_shingle_screen,
    )
    from pytrousse_spark.functions.text import word_shingles

    from pytrousse_spark.io import rebalance_undersplit

    d = _t(spark, sf_dir, "documents")
    # rebalance BEFORE shingling so the regex shingle explode and the md5
    # both parallelize (documents is a single-row-group file locally; at
    # real scale this is a no-op) — the r4 verdict's "bloom is slow"
    # signal was this single-task build, not position codegen
    build = rebalance_undersplit(
        d.where(F.col("source").isin(*_BLOOM_SRC) & F.col("text").isNotNull())
    )
    probe = d.where(
        (~F.col("source").isin(*_BLOOM_SRC)) & F.col("text").isNotNull()
    )
    build_sh = build.select(
        F.explode(word_shingles(F.col("text"), 3)).alias("sh")
    )
    pos = bloom_positions(build_sh, "sh", m=1 << 16, k=3)
    out = bloom_shingle_screen(
        probe, word_shingles(F.col("text"), 3), pos, m=1 << 16, k=3
    )
    return out.select(
        "doc_id",
        "n_shingles",
        "n_hits",
        F.round(F.col("n_hits") / F.col("n_shingles"), 4).alias("hit_frac"),
    )


def _sql_q87() -> str:
    from pytrousse_spark.functions.text import word_shingles_sql

    from pytrousse_spark.operators.bloom import bloom_position_sql_expr

    src = ", ".join(f"'{s}'" for s in _BLOOM_SRC)
    sh_sql = word_shingles_sql("text", 3)
    # generate_series alias is gi, not i: word_shingles_sql's internal
    # lambda binds i, and DuckDB lambda vars must not collide with columns
    h = bloom_position_sql_expr("sh", 1 << 16, "g.gi")
    return f"""
    WITH pos AS (
        SELECT DISTINCT {h} AS pos
        FROM (SELECT unnest({sh_sql}) AS sh
              FROM documents WHERE source IN ({src}) AND text IS NOT NULL) b
        CROSS JOIN generate_series(0, 2) AS g(gi)
    ),
    probe AS (
        SELECT doc_id, {sh_sql} AS sh
        FROM documents WHERE source NOT IN ({src}) AND text IS NOT NULL
    ),
    psh AS (SELECT doc_id, unnest(sh) AS sh FROM probe),
    occ AS (SELECT doc_id, sh, count(*) AS n_occ FROM psh GROUP BY doc_id, sh),
    shp AS (
        SELECT doc_id, sh, {h} AS pos
        FROM occ CROSS JOIN generate_series(0, 2) AS g(gi)
    ),
    msh AS (
        SELECT doc_id, sh, count(*) AS got
        FROM shp JOIN pos USING (pos) GROUP BY doc_id, sh
    ),
    hits AS (
        SELECT o.doc_id,
               SUM(CASE WHEN m.got = 3 THEN o.n_occ ELSE 0 END) AS n_hits
        FROM occ o LEFT JOIN msh m ON o.doc_id = m.doc_id AND o.sh = m.sh
        GROUP BY o.doc_id
    )
    SELECT p.doc_id,
           CAST(len(p.sh) AS INT) AS n_shingles,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           round(CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / len(p.sh), 4)
             AS hit_frac
    FROM probe p LEFT JOIN hits h USING (doc_id)
    """


def q88_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch vs ground truth: estimate the frequencies of the 50
    most common tokens from a 4x16384 counter grid.

    Scale story: the grid build is the ONLY shuffle and carries at most
    d*w = 64k cells no matter how many trillions of tokens stream through
    (map-side partial aggregation absorbs the volume); estimation is a
    broadcast join against the grid. The estimate never undercounts —
    ``overcount`` is provably >= 0, which the oracle reproduces exactly via
    the portable h60 cell hashes.
    """
    from pytrousse_spark.operators.sketch import (
        count_min_build,
        count_min_estimate,
    )
    from pytrousse_spark.functions.text import tokens
    from pytrousse_spark.io import rebalance_undersplit

    docs = rebalance_undersplit(_t(spark, sf_dir, "documents"))
    toks = docs.where(F.col("text").isNotNull()).select(
        F.explode(tokens(F.col("text"))).alias("token")
    )
    sketch = count_min_build(toks, "token", w=1 << 14, d=4)
    top = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_n"))
        .orderBy(F.desc("exact_n"), "token")
        .limit(50)
    )
    est = count_min_estimate(top, "token", sketch, w=1 << 14, d=4)
    return est.select(
        "token",
        "exact_n",
        F.col("cm_estimate").cast("long").alias("cm_estimate"),
        (F.col("cm_estimate") - F.col("exact_n")).cast("long").alias("overcount"),
    )


def _sql_q88() -> str:
    from pytrousse_spark.functions.text import tokens_sql
    from pytrousse_spark.operators.sketch import count_min_build_sql

    cm = count_min_build_sql("SELECT token FROM tok", "token", w=1 << 14, d=4)
    h = "(('0x' || substr(md5('cm' || g.gi || '|' || t.token), 1, 15))::BIGINT) % 16384"
    return f"""
    WITH tok AS (
        SELECT unnest({tokens_sql('text')}) AS token
        FROM documents WHERE text IS NOT NULL
    ),
    cm AS ({cm}),
    top AS (
        SELECT token, CAST(count(*) AS BIGINT) AS exact_n
        FROM tok GROUP BY token ORDER BY exact_n DESC, token LIMIT 50
    ),
    pp AS (
        SELECT t.token, t.exact_n, g.gi AS j, {h} AS pos
        FROM top t CROSS JOIN generate_series(0, 3) AS g(gi)
    ),
    est AS (
        SELECT token, exact_n, min(COALESCE(c, 0)) AS cm_estimate
        FROM pp LEFT JOIN cm USING (j, pos) GROUP BY token, exact_n
    )
    SELECT token, exact_n, CAST(cm_estimate AS BIGINT) AS cm_estimate,
           CAST(cm_estimate - exact_n AS BIGINT) AS overcount
    FROM est
    """


def q89_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native Spark session windows (30-min gap) per user — the built-in
    operator equivalent of q11's hand-rolled lag/cumsum sessionization, and
    the exact batch twin of the streaming session aggregation
    (streaming/events.py sessionized_event_stream; availableNow parity
    pinned in tests).

    SCALE NOTE: session_window aggregates shuffle once on user_id and merge
    per-key locally (no global sort); in streaming mode state is
    watermark-bounded. Boundary semantics verified: an event exactly at
    gap distance MERGES (new session iff gap > 30 min), end = last + gap.
    """
    ev = _t(spark, sf_dir, "events")
    out = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )
    return out.select(
        "user_id",
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "n_events",
        "sum_value",
    )


def _sql_q89() -> str:
    return """
    WITH base AS (
        SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS ts FROM events
    ), flagged AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                         OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_sess
        FROM base
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT *, CAST(sum(new_sess) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM sess GROUP BY user_id, session_id
    """


def q52_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join, hybrid strategy: narrow bands take the bucketed equi-join
    (shuffle on bucket ids only); the open-ended 'high' band spans ~1e8
    buckets, so it routes through the broadcast nested-loop path instead of
    exploding (was the dominant cost of this query: a 100M-element sequence
    explode for one interval row)."""
    from pytrousse_spark.operators.rangejoin import range_join

    ev = _t(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [("low", 0.0, 25.0), ("mid", 20.0, 60.0), ("high", 55.0, 1e9)],
        ["band", "lo", "hi"],
    )
    out = range_join(ev, bands, "value", "lo", "hi", bucket_width=10.0,
                     max_buckets_per_range=1000)
    return out.groupBy("band").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


def _sql_q52() -> str:
    return """
    WITH bands(band, lo, hi) AS (
        VALUES ('low', 0.0, 25.0), ('mid', 20.0, 60.0), ('high', 55.0, 1e9)
    )
    SELECT band, count(*) AS n, round(sum(value), 4) AS sum_value
    FROM events JOIN bands ON value >= lo AND value <= hi
    GROUP BY band
    """



def q53_group_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group normalization: z-score of extendedprice within returnflag
    (aggregate window functions avg/stddev_samp)."""
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag")
    mu = F.avg("l_extendedprice").over(w)
    sd = F.stddev_samp("l_extendedprice").over(w)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.round((F.col("l_extendedprice") - mu) / sd, 4).alias("z"),
    )


def _sql_q53() -> str:
    return """
    SELECT l_orderkey, l_linenumber, l_returnflag,
           round((l_extendedprice - avg(l_extendedprice) OVER w)
                 / stddev_samp(l_extendedprice) OVER w, 4) AS z
    FROM lineitem
    WINDOW w AS (PARTITION BY l_returnflag)
    """



def q204_acf_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACF table at lags 1..7 on the daily event-value series with the
    cumulative Ljung-Box portmanteau Q and Wilson-Hilferty p at each
    lag — the autocorrelation diagnosis beside the seasonal backtest
    (q193) and CUSUM (q166): n^2-scaled exact-integer ACF folds in
    DECIMAL(38)/HUGEINT, femto-unit Q cumsum, shared A&S tail
    (operators/timeseries.acf_ljung_box)."""
    from pytrousse_spark.operators.timeseries import acf_ljung_box

    ev = _t(spark, sf_dir, "events")
    return acf_ljung_box(ev, "ts", "value", 7)


def _sql_q204() -> str:
    from pytrousse_spark.operators.timeseries import acf_ljung_box_sql

    return acf_ljung_box_sql("SELECT * FROM events", "ts", "value", 7)


def q205_pettitt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt rank-based change-point test on the daily event-value
    series — the nonparametric sibling of the CUSUM gate (q166):
    doubled midranks keep U_t exact BIGINT on the calendar-bounded
    spine; the single float op is one exp
    (operators/timeseries.pettitt_test)."""
    from pytrousse_spark.operators.timeseries import pettitt_test

    ev = _t(spark, sf_dir, "events")
    return pettitt_test(ev, "ts", "value")


def _sql_q205() -> str:
    from pytrousse_spark.operators.timeseries import pettitt_test_sql

    return pettitt_test_sql("SELECT * FROM events", "ts", "value")


def q206_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotonic-trend test + Sen's slope on the daily
    event-value series — the distribution-free drift readout beside
    Pettitt's single-shift alternative: exact-integer S and x18 tie-
    corrected variance, order-statistic (not float-summed) Sen median,
    continuity-corrected z through the shared A&S tail; the pair grid
    is CALENDAR-bounded, never table-sized
    (operators/timeseries.mann_kendall)."""
    from pytrousse_spark.operators.timeseries import mann_kendall

    ev = _t(spark, sf_dir, "events")
    return mann_kendall(ev, "ts", "value")


def _sql_q206() -> str:
    from pytrousse_spark.operators.timeseries import mann_kendall_sql

    return mann_kendall_sql("SELECT * FROM events", "ts", "value")



def q207_loo_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of order priority vs the
    fulfilled flag (Micci-Barreca 2001) — the leakage-safe mean
    encoder every tabular pipeline needs: a row never sees its own
    label, singleton categories stay NULL, one broadcast category agg,
    no fact shuffle (operators/feature_prep.loo_target_encoding)."""
    from pytrousse_spark.operators.feature_prep import loo_target_encoding

    o = _t(spark, sf_dir, "orders")
    return loo_target_encoding(
        o, "o_orderkey", "o_orderpriority",
        (F.col("o_orderstatus") == "F").cast("int"),
    )


def _sql_q207() -> str:
    from pytrousse_spark.operators.feature_prep import (
        loo_target_encoding_sql,
    )

    return loo_target_encoding_sql(
        "SELECT * FROM orders", "o_orderkey", "o_orderpriority",
        "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END",
    )


def q208_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight of evidence + information value of order priority vs the
    fulfilled flag (Siddiqi 2006): ln of one exact-integer division per
    category, nano-unit IV fold over the bounded category frame, NULL
    woe on zero cells (operators/feature_prep.woe_iv)."""
    from pytrousse_spark.operators.feature_prep import woe_iv

    o = _t(spark, sf_dir, "orders")
    return woe_iv(
        o, "o_orderpriority",
        (F.col("o_orderstatus") == "F").cast("int"),
    )


def _sql_q208() -> str:
    from pytrousse_spark.operators.feature_prep import woe_iv_sql

    return woe_iv_sql(
        "SELECT * FROM orders",
        "o_orderpriority",
        "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END",
    )


def q209_lift_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift / cumulative-gains table of order total price as a
    score for the fulfilled flag — bands come from the histogram-sketch
    rank transform (q156's device), NOT an NTILE global sort; exact
    integer counts, single divisions
    (operators/feature_prep.lift_gains)."""
    from pytrousse_spark.operators.feature_prep import lift_gains

    o = _t(spark, sf_dir, "orders")
    return lift_gains(
        o, "o_totalprice",
        (F.col("o_orderstatus") == "F").cast("int"), 10,
    )


def _sql_q209() -> str:
    from pytrousse_spark.operators.feature_prep import lift_gains_sql

    return lift_gains_sql(
        "SELECT * FROM orders", "o_totalprice",
        "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END", 10,
    )


def q210_eb_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes beta-binomial shrinkage of per-user purchase
    rates (Robbins 1956, method-of-moments prior): nano-unit moment
    folds in DECIMAL(38)/HUGEINT, degenerate priors stay NULL, one
    key agg + a 2-number broadcast prior
    (operators/feature_prep.eb_rate_shrinkage)."""
    from pytrousse_spark.operators.feature_prep import eb_rate_shrinkage

    ev = _t(spark, sf_dir, "events")
    return eb_rate_shrinkage(
        ev, "user_id", F.lit(1),
        (F.col("event_type") == "purchase").cast("int"),
    )


def _sql_q210() -> str:
    from pytrousse_spark.operators.feature_prep import (
        eb_rate_shrinkage_sql,
    )

    return eb_rate_shrinkage_sql(
        "SELECT * FROM events", "user_id", "1",
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END",
    )



def q211_fastss_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT edit-distance-1 neighbor pairs over customer names via
    FastSS deletion-neighborhood signatures (Bocek 2007) — the
    blocking-free, recall-lossless fuzzy join beside the declared-
    blocking variant (fuzzy_join_blocked) and the set-similarity
    prefix filter (q112). The oracle is the BRUTE-FORCE O(n^2)
    levenshtein scan, so the gate certifies deletion-neighborhood
    completeness itself (operators/relational.fastss_neighbors)."""
    from pytrousse_spark.operators.relational import fastss_neighbors

    c = _t(spark, sf_dir, "customer")
    return fastss_neighbors(c, "c_custkey", "c_name")


def _sql_q211() -> str:
    from pytrousse_spark.operators.relational import fastss_neighbors_sql

    return fastss_neighbors_sql("customer", "c_custkey", "c_name")


_FK_EDGES = [
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier",
     "s_suppkey"),
    ("customer->nation", "customer", "c_nationkey", "nation",
     "n_nationkey"),
]


def q212_fk_orphan_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity census over the five TPC-H foreign-key
    edges: NULL-key and orphan counts + orphan rate per edge, each via
    one pruned-parent LEFT ANTI join (AQE broadcasts the distinct-key
    side) (operators/relational.fk_orphan_census)."""
    from pytrousse_spark.operators.relational import fk_orphan_census

    edges = [
        (name, _t(spark, sf_dir, child), fk, _t(spark, sf_dir, parent), pk)
        for name, child, fk, parent, pk in _FK_EDGES
    ]
    return fk_orphan_census(edges)


def _sql_q212() -> str:
    from pytrousse_spark.operators.relational import fk_orphan_census_sql

    return fk_orphan_census_sql(_FK_EDGES)



def q213_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Flesch Reading Ease census over documents with the
    deterministic vowel-group syllable heuristic — the readability
    dimension of corpus quality beside length/punct tiers (q86):
    per-doc scores micro-unit-rounded before the group mean, Flesch's
    own 50/70 band anchors (operators/corpus.readability_census)."""
    from pytrousse_spark.operators.corpus import readability_census

    d = _t(spark, sf_dir, "documents")
    return readability_census(d, "text", "lang")


def _sql_q213() -> str:
    from pytrousse_spark.operators.corpus import readability_census_sql

    return readability_census_sql("SELECT * FROM documents", "text", "lang")


def q214_cmh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Mantel-Haenszel nation-stratified association between
    the BUILDING market segment and order fulfillment — the
    confounder-adjusted readout the pooled chi-square (q187) cannot
    give (Simpson's-paradox-proof): nano-unit E/V/odds folds,
    continuity-corrected df-1 chi2 through the shared A&S tail, plus
    the MH common odds ratio (operators/cohort.cmh_test)."""
    from pytrousse_spark.operators.cohort import cmh_test

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = o.join(c, o["o_custkey"] == c["c_custkey"], "inner")
    return cmh_test(
        j, "c_nationkey",
        (F.col("c_mktsegment") == "BUILDING").cast("int"),
        (F.col("o_orderstatus") == "F").cast("int"),
    )


def _sql_q214() -> str:
    from pytrousse_spark.operators.cohort import cmh_test_sql

    return cmh_test_sql(
        "SELECT * FROM orders o JOIN customer c"
        " ON o.o_custkey = c.c_custkey",
        "c_nationkey",
        "CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END",
        "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END",
    )


def q215_cluster_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified-silhouette + Davies-Bouldin validity indices for the
    q78 k-means fit — the "is this clustering any good" readout every
    embedding pipeline needs beside the fit itself: per-point scores
    micro-unit-rounded before any mean, centroid-pair distances
    computed with the q78-proven fold in BOTH engines, oracle replays
    the full training chain
    (operators/clustering.cluster_quality)."""
    from pytrousse_spark.operators.clustering import cluster_quality

    e = _t(spark, sf_dir, "embeddings")
    return cluster_quality(e, "vec_id", "embedding", 8, 2)


def _sql_q215() -> str:
    from pytrousse_spark.operators.clustering import cluster_quality_sql

    return cluster_quality_sql("embeddings", 8, 64, 2)



def q216_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT isotonic calibration of order total price to the
    fulfilled-flag probability via the minimax identity
    fit(b) = max_{i<=b} min_{j>=b} avg(y over i..j) — the closed form
    of pool-adjacent-violators on the bounded 64-bin grid, no
    iteration, no driver fold; nano-unit interval averages make every
    max/min an integer order statistic
    (operators/classifier.isotonic_calibration)."""
    from pytrousse_spark.operators.classifier import isotonic_calibration

    o = _t(spark, sf_dir, "orders").withColumn(
        "__yy", (F.col("o_orderstatus") == "F").cast("int")
    )
    return isotonic_calibration(o, "o_totalprice", "__yy", 64)


def _sql_q216() -> str:
    from pytrousse_spark.operators.classifier import (
        isotonic_calibration_sql,
    )

    return isotonic_calibration_sql(
        "SELECT *, CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END"
        " AS __yy FROM orders",
        "o_totalprice", "__yy", 64,
    )


def q217_textrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level TextRank keywords (Mihalcea & Tarau 2004) — the
    staged tokenizer feeding the q117 micro-unit PageRank over the
    word-adjacency graph, top-30 by (rank DESC, token) via
    TakeOrderedAndProject (operators/corpus.textrank_keywords)."""
    from pytrousse_spark.operators.corpus import textrank_keywords

    d = _t(spark, sf_dir, "documents")
    return textrank_keywords(d, "text", 30, 6)


def _sql_q217() -> str:
    from pytrousse_spark.operators.corpus import textrank_keywords_sql

    return textrank_keywords_sql("SELECT * FROM documents", "text", 30, 6)



def q218_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation function between the click and purchase daily
    value series at lags -7..7 — the lead-lag detector beside the
    single-series ACF (q204): shared zero-filled calendar spine,
    n^2-scaled exact-integer cross folds in DECIMAL(38)/HUGEINT,
    sqrt-product denominator, NULL on zero variance
    (operators/timeseries.cross_correlation)."""
    from pytrousse_spark.operators.timeseries import cross_correlation

    ev = _t(spark, sf_dir, "events")
    return cross_correlation(
        ev, "ts", "value", "event_type", "click", "purchase", 7
    )


def _sql_q218() -> str:
    from pytrousse_spark.operators.timeseries import (
        cross_correlation_sql,
    )

    return cross_correlation_sql(
        "SELECT * FROM events", "ts", "value", "event_type",
        "click", "purchase", 7,
    )



def q219_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag winsorized and trimmed means of extended price at
    the sketch [p5, p95] — Tukey robust statistics on the q127 grouped
    histogram quantiles (no per-group sort), micro-unit integer means
    (profiling.winsorized_group_stats)."""
    from pytrousse_spark.profiling import winsorized_group_stats

    li = _t(spark, sf_dir, "lineitem")
    return winsorized_group_stats(li, "l_returnflag", "l_extendedprice")


def _sql_q219() -> str:
    from pytrousse_spark.profiling import winsorized_group_stats_sql

    return winsorized_group_stats_sql(
        "lineitem", "l_returnflag", "l_extendedprice"
    )


def q220_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT tie-corrected Kendall tau-b between quantity and line
    number — ordinal association from the CONTINGENCY GRID (one cell
    agg + a bounded cell self-join; pair folds never touch rows), the
    100 TB-safe design for bounded-cardinality columns
    (profiling.kendall_tau_b)."""
    from pytrousse_spark.profiling import kendall_tau_b

    li = _t(spark, sf_dir, "lineitem")
    return kendall_tau_b(li, "l_quantity", "l_linenumber")


def _sql_q220() -> str:
    from pytrousse_spark.profiling import kendall_tau_b_sql

    return kendall_tau_b_sql(
        "SELECT * FROM lineitem", "l_quantity", "l_linenumber"
    )


def q221_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe approximate Spearman rank correlation between
    quantity and extended price: two histogram-sketch rank passes
    (q156 device — no global sort) + one exact integer Pearson of the
    micro-unit ranks (profiling.spearman_approx)."""
    from pytrousse_spark.profiling import spearman_approx

    li = _t(spark, sf_dir, "lineitem")
    return spearman_approx(li, "l_quantity", "l_extendedprice")


def _sql_q221() -> str:
    from pytrousse_spark.profiling import spearman_approx_sql

    return spearman_approx_sql(
        "SELECT * FROM lineitem", "l_quantity", "l_extendedprice"
    )



def q222_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis day-of-week effect test on the daily event-value
    series — the distribution-free one-way ANOVA beside Mann-Whitney's
    two-sample gate (q202): doubled midranks on the calendar spine,
    nano-unit R^2/n folds, tie-corrected H through Wilson-Hilferty +
    the shared A&S tail
    (operators/timeseries.kruskal_wallis_dow)."""
    from pytrousse_spark.operators.timeseries import kruskal_wallis_dow

    ev = _t(spark, sf_dir, "events")
    return kruskal_wallis_dow(ev, "ts", "value")


def _sql_q222() -> str:
    from pytrousse_spark.operators.timeseries import (
        kruskal_wallis_dow_sql,
    )

    return kruskal_wallis_dow_sql("SELECT * FROM events", "ts", "value")


def q223_markov_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resubstitution accuracy of the majority-next-state Markov
    predictor over per-user event sequences — the q133 transition
    matrix turned into the simplest deployable model and scored
    in-engine (q200 confusion-readout convention); one entity-keyed
    shuffle, model selection on the states^2 frame
    (operators/mining.markov_next_event_accuracy)."""
    from pytrousse_spark.operators.mining import (
        markov_next_event_accuracy,
    )

    ev = _t(spark, sf_dir, "events")
    return markov_next_event_accuracy(
        ev, "user_id", "ts", "event_type", "event_id"
    )


def _sql_q223() -> str:
    from pytrousse_spark.operators.mining import (
        markov_next_event_accuracy_sql,
    )

    return markov_next_event_accuracy_sql(
        "events", "user_id", "ts", "event_type", "event_id"
    )



def q224_neyman_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sample of 500 orders by priority:
    budget split proportional to N_h*sd_h via an integer
    largest-remainder method (micro-unit shares, exact `div`), drawn
    with the q109 two-stage salted-hash order (no stratum funnels one
    window partition); id_checksum pins the exact drawn set
    (operators/sampling.neyman_allocation_sample)."""
    from pytrousse_spark.operators.sampling import (
        neyman_allocation_sample,
    )

    o = _t(spark, sf_dir, "orders")
    return neyman_allocation_sample(
        o, "o_orderpriority", "o_totalprice", "o_orderkey", 500
    )


def _sql_q224() -> str:
    from pytrousse_spark.operators.sampling import (
        neyman_allocation_sample_sql,
    )

    return neyman_allocation_sample_sql(
        "orders", "o_orderpriority", "o_totalprice", "o_orderkey", 500
    )



def q225_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type daily OHLC + VWAP bars — the resample staple as
    ONE (key, bucket)-keyed hash agg with map-side partials: open and
    close are min_by/max_by over a fixed-width (ts, order) key, never
    a first/last window over raw ticks
    (operators/timeseries.ohlc_bars)."""
    from pytrousse_spark.operators.timeseries import ohlc_bars

    ev = _t(spark, sf_dir, "events")
    return ohlc_bars(ev, "event_type", "ts", "value", "event_id", "1 day")


def _sql_q225() -> str:
    from pytrousse_spark.operators.timeseries import ohlc_bars_sql

    return ohlc_bars_sql(
        "events", "event_type", "ts", "value", "event_id", "1 day"
    )



def q226_ipw_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-propensity-weighted ATE of the BUILDING segment on order
    totals with an IN-ENGINE logistic propensity model (q111's
    batch-GD training, replayed in FULL by the oracle) on acctbal +
    nation features — the observational companion to CUPED/DiD:
    clipped Hajek weights, micro-unit folds
    (operators/cohort.ipw_ate)."""
    from pytrousse_spark.operators.cohort import ipw_ate

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = o.join(c, o["o_custkey"] == c["c_custkey"], "inner")
    return ipw_ate(
        j, (F.col("c_mktsegment") == "BUILDING").cast("int"),
        "o_totalprice",
        F.col("c_acctbal") / 1000.0,
        F.col("c_nationkey").cast("double") / 25.0,
    )


def _sql_q226() -> str:
    from pytrousse_spark.operators.cohort import ipw_ate_sql

    return ipw_ate_sql(
        "SELECT * FROM orders o JOIN customer c"
        " ON o.o_custkey = c.c_custkey",
        "CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END",
        "o_totalprice",
        "c_acctbal / 1000.0",
        "CAST(c_nationkey AS DOUBLE) / 25.0",
    )



def q227_daily_rate_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily view->purchase conversion rates with Wilson score
    intervals — the monitoring line with the CI that behaves at small
    n and extreme rates; two (day, user) DISTINCT aggs + the Wilson
    scalar chain with CAST-to-DOUBLE z literals
    (operators/cohort.daily_rate_wilson)."""
    from pytrousse_spark.operators.cohort import daily_rate_wilson

    ev = _t(spark, sf_dir, "events")
    return daily_rate_wilson(
        ev, "user_id", "event_type", "view", "purchase"
    )


def _sql_q227() -> str:
    from pytrousse_spark.operators.cohort import daily_rate_wilson_sql

    return daily_rate_wilson_sql(
        "events", "user_id", "event_type", "view", "purchase"
    )


def q228_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort LTV curves: cumulative purchase revenue per user
    by cohort age, dense offsets (zero-revenue periods appear — a
    curve with holes misreads as a drop); integer-cent folds, grid-
    bounded cumulative window
    (operators/cohort.cohort_ltv_curve)."""
    from pytrousse_spark.operators.cohort import cohort_ltv_curve

    ev = _t(spark, sf_dir, "events")
    return cohort_ltv_curve(
        ev, "user_id", "event_type", "purchase", "value"
    )


def _sql_q228() -> str:
    from pytrousse_spark.operators.cohort import cohort_ltv_curve_sql

    return cohort_ltv_curve_sql(
        "events", "user_id", "event_type", "purchase", "value"
    )



def q229_numeric_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between quantity and extended price via a
    32x32 equi-width histogram — the continuous companion of the
    categorical MI gate (q187): every term is ln of ONE exact-integer
    ratio (DECIMAL38/HUGEINT products), nano-rounded per cell before
    the fold; nmi normalizes by min marginal entropy
    (profiling.numeric_mutual_information)."""
    from pytrousse_spark.profiling import numeric_mutual_information

    li = _t(spark, sf_dir, "lineitem")
    return numeric_mutual_information(
        li, "l_quantity", "l_extendedprice"
    )


def _sql_q229() -> str:
    from pytrousse_spark.profiling import (
        numeric_mutual_information_sql,
    )

    return numeric_mutual_information_sql(
        "SELECT * FROM lineitem", "l_quantity", "l_extendedprice"
    )


def q230_lsh_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH band-parameter planner at 64 hashes / threshold
    0.5: the S-curve FP/FN masses integrated per (bands, rows)
    factorization with nano-unit trapezoid folds; picks (16, 4) —
    the in-engine replacement for the banding rule of thumb behind
    q43's LSH settings (operators/dedup.lsh_parameter_plan)."""
    from pytrousse_spark.operators.dedup import lsh_parameter_plan

    return lsh_parameter_plan(spark, 64, 0.5)


def _sql_q230() -> str:
    from pytrousse_spark.operators.dedup import lsh_parameter_plan_sql

    return lsh_parameter_plan_sql(64, 0.5)



def q231_wasserstein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wasserstein-1 (earth mover's) drift distance of extended price,
    early-month vs late-month shipments — the drift measure with UNITS
    beside PSI (q142) and KS (q186): exact integer CDF-difference
    prefix folds on pooled-edge bins, one unit conversion at the end
    (profiling.wasserstein1_binned)."""
    from pytrousse_spark.profiling import wasserstein1_binned

    li = _t(spark, sf_dir, "lineitem")
    ref = li.where(F.dayofmonth("l_shipdate") <= 15)
    cur = li.where(F.dayofmonth("l_shipdate") > 15)
    return wasserstein1_binned(ref, cur, "l_extendedprice")


def _sql_q231() -> str:
    from pytrousse_spark.profiling import wasserstein1_binned_sql

    return wasserstein1_binned_sql(
        "SELECT * FROM lineitem WHERE day(l_shipdate) <= 15",
        "SELECT * FROM lineitem WHERE day(l_shipdate) > 15",
        "l_extendedprice",
    )


def q232_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wang-Smith-Hyndman seasonal and trend strength of the daily
    event-value series over the classical decomposition — the one-look
    "is there real weekly structure" readout beside the Kruskal-Wallis
    test (q222): micro-unit component variances in DECIMAL38/HUGEINT
    (operators/timeseries.seasonal_strength)."""
    from pytrousse_spark.operators.timeseries import seasonal_strength

    ev = _t(spark, sf_dir, "events")
    return seasonal_strength(ev, "ts", "value", 7)


def _sql_q232() -> str:
    from pytrousse_spark.operators.timeseries import (
        seasonal_strength_sql,
    )

    return seasonal_strength_sql("SELECT * FROM events", "ts", "value", 7)



def q233_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift between even and odd vector ids — the
    vector-native drift readout beside PSI/KS/W1: centroid cosine,
    centroid distance and mean-norm ratio from micro-unit component
    folds; one position-keyed agg per side, no vector joins
    (operators/similarity.embedding_drift)."""
    from pytrousse_spark.operators.similarity import embedding_drift

    emb = _t(spark, sf_dir, "embeddings")
    return embedding_drift(
        emb.where(F.col("vec_id") % 2 == 0),
        emb.where(F.col("vec_id") % 2 == 1),
    )


def _sql_q233() -> str:
    from pytrousse_spark.operators.similarity import embedding_drift_sql

    return embedding_drift_sql(
        "SELECT * FROM embeddings WHERE vec_id % 2 = 0",
        "SELECT * FROM embeddings WHERE vec_id % 2 = 1",
    )


def q234_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user, as a histogram
    — gaps-and-islands over the DISTINCT (user, day) reduction; the
    engagement readout beside retention q66 and growth accounting q68
    (operators/cohort.activity_streaks)."""
    from pytrousse_spark.operators.cohort import activity_streaks

    ev = _t(spark, sf_dir, "events")
    return activity_streaks(ev, "user_id", "ts")


def _sql_q234() -> str:
    from pytrousse_spark.operators.cohort import activity_streaks_sql

    return activity_streaks_sql("events", "user_id", "ts")


def q235_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day peak concurrent sessions — sweep-line (+1/-1 running
    max) over q11's gap sessionization, computed with the bucketed
    per-day prefix + cross-day carry decomposition; the ORACLE is the
    plain single-global-window sweep, certifying the decomposition the
    same way q157/q186 are certified
    (operators/timeseries.peak_concurrency)."""
    from pytrousse_spark.operators.timeseries import peak_concurrency

    ev = _t(spark, sf_dir, "events")
    return peak_concurrency(ev, "user_id", "ts", "event_id")


def _sql_q235() -> str:
    from pytrousse_spark.operators.timeseries import peak_concurrency_sql

    return peak_concurrency_sql("events", "user_id", "ts", "event_id")


def q236_spatial_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All customer pairs within planar distance 20,000 micro-units —
    grid-cell bucketed (9-offset equi-join, exact BIGINT distance^2,
    zero floats); the ORACLE is the brute-force O(n^2) join, so parity
    certifies completeness like q211's FastSS oracle. Coordinates are
    h60-derived micro-units (a real deployment feeds GPS columns)
    (operators/spatial.grid_radius_join)."""
    from pytrousse_spark.functions.hashing import h60_seeded
    from pytrousse_spark.operators.spatial import grid_radius_join

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        (h60_seeded(F.col("c_custkey").cast("string"), "gx") % 1_000_000)
        .alias("gx"),
        (h60_seeded(F.col("c_custkey").cast("string"), "gy") % 1_000_000)
        .alias("gy"),
    )
    return grid_radius_join(cust, "c_custkey", "gx", "gy", 20_000)


def _sql_q236() -> str:
    from pytrousse_spark.functions.hashing import h60_seeded_sql
    from pytrousse_spark.operators.spatial import grid_radius_join_sql

    gx = h60_seeded_sql("CAST(c_custkey AS VARCHAR)", "gx")
    gy = h60_seeded_sql("CAST(c_custkey AS VARCHAR)", "gy")
    pts = (
        "(SELECT c_custkey, "
        f"{gx} % 1000000 AS gx, {gy} % 1000000 AS gy FROM customer)"
    )
    return grid_radius_join_sql(pts, "c_custkey", "gx", "gy", 20_000)


def q237_sequential_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Support of ordered event-type 2-sequences <a then b> under
    first-occurrence semantics (AprioriAll's length-2 core) — one row
    per (user, type) BEFORE pairing, so the join is bounded by users x
    types^2, never event volume; complements q133's adjacent
    transitions (operators/mining.sequential_pattern_support)."""
    from pytrousse_spark.operators.mining import sequential_pattern_support

    ev = _t(spark, sf_dir, "events")
    return sequential_pattern_support(
        ev, "user_id", "event_type", "ts", "event_id"
    )


def _sql_q237() -> str:
    from pytrousse_spark.operators.mining import (
        sequential_pattern_support_sql,
    )

    return sequential_pattern_support_sql(
        "events", "user_id", "event_type", "ts", "event_id"
    )


def q238_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov removal-effect attribution (Anderl 2014):
    channel credit = drop in chain conversion probability when the
    channel is knocked out; exact nano-unit integer value iteration
    whose ENTIRE 60-round chain the oracle replays as unrolled CTEs
    (the q226-IPW replay pattern); completes the attribution ladder
    beside linear q167/q177 and position q190/q194
    (operators/cohort.markov_attribution)."""
    from pytrousse_spark.operators.cohort import markov_attribution

    ev = _t(spark, sf_dir, "events")
    return markov_attribution(
        ev, "user_id", "event_type", "ts", "event_id"
    )


def _sql_q238() -> str:
    from pytrousse_spark.operators.cohort import markov_attribution_sql

    return markov_attribution_sql(
        "events", "user_id", "event_type", "ts", "event_id"
    )


def q239_granger_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granger lag-1 lead-lag F-test: does yesterday's click value
    predict today's purchase value beyond purchases' own lag? The
    directional hypothesis test beside q218's symmetric CCF — exact
    DECIMAL/HUGEINT sufficient statistics on the shared daily spine,
    identical closed-form F expression in both engines, A&S normal
    tail for p (operators/timeseries.granger_lead_lag)."""
    from pytrousse_spark.operators.timeseries import granger_lead_lag

    ev = _t(spark, sf_dir, "events")
    return granger_lead_lag(ev, "ts", "value", "event_type", "click", "purchase")


def _sql_q239() -> str:
    from pytrousse_spark.operators.timeseries import granger_lead_lag_sql

    return granger_lead_lag_sql(
        "SELECT * FROM events", "ts", "value", "event_type", "click", "purchase"
    )


def q240_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the q135 co-purchase graph (parts co-occurring in >= 2
    baskets): 12 synchronous peel rounds, each one degree agg + two
    semi-joins with per-round checkpoints (the q117 iteration
    discipline); oracle replays the identical unrolled peel
    (operators/graph.k_core)."""
    from pytrousse_spark.operators.graph import k_core

    li = _t(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("__b"), F.col("l_partkey").alias("__i")
    ).distinct()
    edges = (
        items.join(items.withColumnRenamed("__i", "__j"), "__b")
        .where(F.col("__i") < F.col("__j"))
        .groupBy("__i", "__j")
        .agg(F.count(F.lit(1)).alias("__c"))
        .where(F.col("__c") >= 2)
    )
    return k_core(edges, "__i", "__j", 3)


def _sql_q240() -> str:
    from pytrousse_spark.operators.graph import k_core_sql

    edges = """
        SELECT __i, __j FROM (
            SELECT a.__i, b.__i AS __j, count(*) AS __c
            FROM (SELECT DISTINCT l_orderkey AS __b, l_partkey AS __i
                  FROM lineitem) a
            JOIN (SELECT DISTINCT l_orderkey AS __b, l_partkey AS __i
                  FROM lineitem) b
              ON a.__b = b.__b AND a.__i < b.__i
            GROUP BY 1, 2
        ) WHERE __c >= 2
    """
    return k_core_sql(edges, "__i", "__j", 3)


def q241_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley-value attribution over the coalition-presence
    game (Shapley 1953; Zhao 2018) — integer factorial weights on the
    2^K subset lattice, ONE user-keyed bitmask pass over events;
    completes the attribution ladder: linear q167, position q190,
    Markov removal q238, Shapley q241
    (operators/cohort.shapley_attribution)."""
    from pytrousse_spark.operators.cohort import shapley_attribution

    ev = _t(spark, sf_dir, "events")
    return shapley_attribution(
        ev, "user_id", "event_type", "ts", "event_id", "purchase",
        ["click", "error", "signup", "view"],
    )


def _sql_q241() -> str:
    from pytrousse_spark.operators.cohort import shapley_attribution_sql

    return shapley_attribution_sql(
        "events", "user_id", "event_type", "ts", "event_id", "purchase",
        ["click", "error", "signup", "view"],
    )


def q242_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 disjunctive ranked retrieval over the documents
    corpus — length-normalized, saturation-damped scoring with N and
    avgdl computed IN-PLAN as a broadcast scalar row (no driver
    literal); the retrieval-quality upgrade of q129's conjunctive
    tf-idf search (functions/text.bm25_search)."""
    from pytrousse_spark.functions.text import bm25_search

    d = _t(spark, sf_dir, "documents")
    return bm25_search(
        d, "text", "doc_id", ["merge", "window", "shuffle"], k=25
    )


def _sql_q242() -> str:
    from pytrousse_spark.functions.text import bm25_search_sql

    return bm25_search_sql(
        "documents", "text", "doc_id", ["merge", "window", "shuffle"], k=25
    )


def q243_poisson_rate_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-period Poisson rate-ratio test on daily purchase counts
    (first vs second half of month, exposure = observed days) — the
    count-data inference axis beside the proportion z-tests q148/q197;
    one conditional aggregate, identical double chain, A&S tail p
    (operators/timeseries.poisson_rate_ratio)."""
    from pytrousse_spark.operators.timeseries import poisson_rate_ratio

    ev = _t(spark, sf_dir, "events")
    return poisson_rate_ratio(ev, "ts", 15, "purchase")


def _sql_q243() -> str:
    from pytrousse_spark.operators.timeseries import poisson_rate_ratio_sql

    return poisson_rate_ratio_sql("SELECT * FROM events", "ts", 15, "purchase")


def q244_km_greenwood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q178's time-to-convert KM curve with Greenwood-variance 95%
    bands — uncertainty quantification for the survival family; the
    Greenwood increments fold nano-rounded BIGINT exactly like the
    log-survival terms (operators/survival.kaplan_meier_ci)."""
    from pytrousse_spark.operators.survival import kaplan_meier_ci

    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "__fv"
        ),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("__fp"),
    )
    obs_end = ev.agg(F.max("ts").alias("__end"))
    subjects = (
        per_user.where(F.col("__fv").isNotNull())
        .crossJoin(F.broadcast(obs_end))
        .select(
            F.when(
                F.col("__fp").isNotNull() & (F.col("__fp") >= F.col("__fv")),
                F.floor(
                    (F.unix_micros("__fp") - F.unix_micros("__fv"))
                    / F.lit(86_400_000_000)
                ),
            )
            .otherwise(
                F.floor(
                    (F.unix_micros("__end") - F.unix_micros("__fv"))
                    / F.lit(86_400_000_000)
                )
            )
            .cast("double")
            .alias("dur_days"),
            (
                F.col("__fp").isNotNull() & (F.col("__fp") >= F.col("__fv"))
            ).cast("int").alias("converted"),
        )
    )
    return kaplan_meier_ci(subjects, "dur_days", "converted")


def _sql_q244() -> str:
    from pytrousse_spark.operators.survival import kaplan_meier_ci_sql

    subjects = """
        WITH pu AS (
            SELECT user_id,
                   min(CASE WHEN event_type = 'view'
                            THEN CAST(ts AS TIMESTAMP) END) AS __fv,
                   min(CASE WHEN event_type = 'purchase'
                            THEN CAST(ts AS TIMESTAMP) END) AS __fp
            FROM events GROUP BY user_id
        ), oe AS (
            SELECT max(CAST(ts AS TIMESTAMP)) AS __end FROM events
        )
        SELECT CAST(CASE WHEN __fp IS NOT NULL AND __fp >= __fv
                    THEN floor(epoch_us(__fp - __fv) / 86400000000)
                    ELSE floor(epoch_us(__end - __fv) / 86400000000)
               END AS DOUBLE) AS dur_days,
               CASE WHEN __fp IS NOT NULL AND __fp >= __fv
                    THEN 1 ELSE 0 END AS converted
        FROM pu CROSS JOIN oe WHERE __fv IS NOT NULL
    """
    return kaplan_meier_ci_sql(subjects, "dur_days", "converted")


def q245_item_item_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-to-item collaborative filtering (Sarwar 2001) over the
    customer-part purchase matrix: user-keyed co-occurrence pairs
    (the q135 wedge axis, never a cross join), exact-count cosine,
    per-item top-5 neighbors — the recommender modality beside the
    embedding ANN ladder (operators/similarity.item_item_cf)."""
    from pytrousse_spark.operators.similarity import item_item_cf

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    ratings = li.join(
        o.select("o_orderkey", "o_custkey"),
        li.l_orderkey == o.o_orderkey,
    ).select("o_custkey", "l_partkey")
    return item_item_cf(ratings, "o_custkey", "l_partkey", k=5, min_cooc=2)


def _sql_q245() -> str:
    from pytrousse_spark.operators.similarity import item_item_cf_sql

    ratings = """
        SELECT o.o_custkey, l.l_partkey
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """
    return item_item_cf_sql(ratings, "o_custkey", "l_partkey", 5, 2)


def q246_aipw_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doubly-robust AIPW treatment effect (Robins 1994) on q226's
    observational setup — propensity chain replayed in FULL plus
    per-arm closed-form OLS outcome models computed in-plan; the
    causal ladder's top rung: naive -> IPW q226 -> AIPW q246
    (operators/cohort.aipw_ate)."""
    from pytrousse_spark.operators.cohort import aipw_ate

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = o.join(c, o["o_custkey"] == c["c_custkey"], "inner")
    return aipw_ate(
        j, (F.col("c_mktsegment") == "BUILDING").cast("int"),
        "o_totalprice",
        F.col("c_acctbal") / 1000.0,
        F.col("c_nationkey").cast("double") / 25.0,
    )


def _sql_q246() -> str:
    from pytrousse_spark.operators.cohort import aipw_ate_sql

    return aipw_ate_sql(
        "SELECT * FROM orders o JOIN customer c"
        " ON o.o_custkey = c.c_custkey",
        "CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END",
        "o_totalprice",
        "c_acctbal / 1000.0",
        "CAST(c_nationkey AS DOUBLE) / 25.0",
    )


def q247_uplift_qini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uplift-by-decile table with the Qini cumulative curve
    (Radcliffe 2007): acctbal as the targeting score, BUILDING
    segment as treatment, high-value order as response — model-free
    uplift evaluation beside the lift/gains table q209
    (operators/feature_prep.uplift_by_band)."""
    from pytrousse_spark.operators.feature_prep import uplift_by_band

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = o.join(c, o["o_custkey"] == c["c_custkey"], "inner")
    return uplift_by_band(
        j,
        "c_acctbal",
        (F.col("c_mktsegment") == "BUILDING").cast("int"),
        (F.col("o_totalprice") > 150_000).cast("int"),
    )


def _sql_q247() -> str:
    from pytrousse_spark.operators.feature_prep import uplift_by_band_sql

    return uplift_by_band_sql(
        "SELECT * FROM orders o JOIN customer c"
        " ON o.o_custkey = c.c_custkey",
        "c_acctbal",
        "CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END",
        "CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END",
    )


def q248_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type burstiness (Goh-Barabasi B) and daily Fano
    factor — the inter-event-time shape census; gap statistics via
    the (key, day)-bucketed decomposition (q157/q235 device) so no
    per-key global window; gap^2 moments widened to DECIMAL38/HUGEINT
    up front (operators/timeseries.burstiness_census)."""
    from pytrousse_spark.operators.timeseries import burstiness_census

    ev = _t(spark, sf_dir, "events")
    return burstiness_census(ev, "event_type", "ts", "event_id")


def _sql_q248() -> str:
    from pytrousse_spark.operators.timeseries import burstiness_census_sql

    return burstiness_census_sql(
        "SELECT * FROM events", "event_type", "ts", "event_id"
    )


def q249_gesd_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalized ESD outlier rounds (Rosner 1983) on the daily
    event-value series — the iterative unmasking sibling of the
    one-shot MAD gate (q121): each round re-estimates mean/sd over
    the remaining days and flags the most extreme one, with an EXACT
    integer argmax |n*c - s| so no float comparison picks the day
    (operators/timeseries.gesd_outliers)."""
    from pytrousse_spark.operators.timeseries import gesd_outliers

    ev = _t(spark, sf_dir, "events")
    return gesd_outliers(ev, "ts", "value", k=5)


def _sql_q249() -> str:
    from pytrousse_spark.operators.timeseries import gesd_outliers_sql

    return gesd_outliers_sql("SELECT * FROM events", "ts", "value", k=5)


def q250_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community census of the q135/q240 co-purchase graph (parts
    co-occurring in >= 2 baskets) via 6 synchronous label-propagation
    rounds (Raghavan 2007), min-label tie rule — fully deterministic,
    no random visit order, so the oracle replays the identical
    unrolled rounds converged or not (the q240 contract)
    (operators/graph.label_propagation)."""
    from pytrousse_spark.operators.graph import label_propagation

    li = _t(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("__b"), F.col("l_partkey").alias("__i")
    ).distinct()
    edges = (
        items.join(items.withColumnRenamed("__i", "__j"), "__b")
        .where(F.col("__i") < F.col("__j"))
        .groupBy("__i", "__j")
        .agg(F.count(F.lit(1)).alias("__c"))
        .where(F.col("__c") >= 2)
    )
    return label_propagation(edges, "__i", "__j", rounds=6)


def _sql_q250() -> str:
    from pytrousse_spark.operators.graph import label_propagation_sql

    edges = """
        SELECT __i, __j FROM (
            SELECT a.__i, b.__i AS __j, count(*) AS __c
            FROM (SELECT DISTINCT l_orderkey AS __b,
                         l_partkey AS __i FROM lineitem) a
            JOIN (SELECT DISTINCT l_orderkey AS __b,
                         l_partkey AS __i FROM lineitem) b
              ON a.__b = b.__b AND a.__i < b.__i
            GROUP BY 1, 2
        ) WHERE __c >= 2
    """
    return label_propagation_sql(edges, "__i", "__j", rounds=6)


def q251_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust daily trend of event value — median pairwise
    slope + median residual intercept with the EXPLICIT two-middle-row
    median (no engine quantile interpolation); pairs are O(T^2) of the
    calendar-bounded spine, never of the raw table
    (operators/timeseries.theil_sen_trend)."""
    from pytrousse_spark.operators.timeseries import theil_sen_trend

    ev = _t(spark, sf_dir, "events")
    return theil_sen_trend(ev, "ts", "value")


def _sql_q251() -> str:
    from pytrousse_spark.operators.timeseries import theil_sen_trend_sql

    return theil_sen_trend_sql("SELECT * FROM events", "ts", "value")


def q252_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram (center, context) training-pair table over documents
    with Mikolov frequency subsampling — the word2vec data-prep stage
    done in-engine: portable-h60 keep decisions so both engines drop
    the SAME occurrences, vocab-sized broadcast threshold table,
    doc-keyed band join (operators/corpus.skipgram_pairs)."""
    from pytrousse_spark.operators.corpus import skipgram_pairs

    docs = _t(spark, sf_dir, "documents")
    return skipgram_pairs(docs, "doc_id", "text")


def _sql_q252() -> str:
    from pytrousse_spark.operators.corpus import skipgram_pairs_sql

    return skipgram_pairs_sql("SELECT * FROM documents", "doc_id", "text")


def q253_distance_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance correlation between the click and purchase daily value
    series (Szekely 2007) beside Pearson from the same exact pivot —
    the any-dependence detector: n^2-scaled double-centering keeps
    every fold an exact DECIMAL38/HUGEINT integer; pairs are O(T^2) of
    the calendar-bounded spine
    (operators/timeseries.distance_correlation)."""
    from pytrousse_spark.operators.timeseries import distance_correlation

    ev = _t(spark, sf_dir, "events")
    return distance_correlation(
        ev, "ts", "value", "event_type", "click", "purchase"
    )


def _sql_q253() -> str:
    from pytrousse_spark.operators.timeseries import (
        distance_correlation_sql,
    )

    return distance_correlation_sql(
        "SELECT * FROM events", "ts", "value", "event_type",
        "click", "purchase",
    )


def q254_unicode_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Unicode hygiene census of the documents corpus —
    mojibake (U+FFFD), C0 control contamination and UTF-8 byte/char
    overhead in ONE map-side regexp pass + one source-keyed agg, no
    UDF; code-point and RE2-class semantics probed identical across
    engines (operators/quality.unicode_census)."""
    from pytrousse_spark.operators.quality import unicode_census

    docs = _t(spark, sf_dir, "documents")
    return unicode_census(docs, "source", "text")


def _sql_q254() -> str:
    from pytrousse_spark.operators.quality import unicode_census_sql

    return unicode_census_sql("SELECT * FROM documents", "source", "text")


def q255_huber_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Huber IRLS robust daily trend of event value beside its own OLS
    — per-iteration MAD rescaling, micro-unit INTEGER weights before
    any sum (the q111 discipline) so the weighted normal equations are
    exact DECIMAL38/HUGEINT in both engines; oracle replays every
    iteration as MATERIALIZED CTEs
    (operators/timeseries.huber_trend)."""
    from pytrousse_spark.operators.timeseries import huber_trend

    ev = _t(spark, sf_dir, "events")
    return huber_trend(ev, "ts", "value")


def _sql_q255() -> str:
    from pytrousse_spark.operators.timeseries import huber_trend_sql

    return huber_trend_sql("SELECT * FROM events", "ts", "value")


def q256_gumbel_maxima(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel extreme-value fit on weekly block maxima of daily event
    value (PWM estimators, Landwehr 1979) with 10- and 52-block return
    levels — the full-law EVT sibling of the Hill tail gate q168; both
    PWM folds are exact HUGEINT/DECIMAL38 integers with a provably
    tie-safe rank weighting
    (operators/timeseries.gumbel_block_maxima)."""
    from pytrousse_spark.operators.timeseries import gumbel_block_maxima

    ev = _t(spark, sf_dir, "events")
    return gumbel_block_maxima(ev, "ts", "value", block_days=7)


def _sql_q256() -> str:
    from pytrousse_spark.operators.timeseries import (
        gumbel_block_maxima_sql,
    )

    return gumbel_block_maxima_sql(
        "SELECT * FROM events", "ts", "value", block_days=7
    )


def q257_triple_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-sequence support <a then b then c> over user event
    histories via greedy subsequence matching (provably complete —
    first a, first b after it, first c after that b) on the composed
    (epoch-micros, event_id) string key; frontier bounded by
    events x vocab, census by users x vocab^3
    (operators/mining.triple_sequence_support)."""
    from pytrousse_spark.operators.mining import triple_sequence_support

    ev = _t(spark, sf_dir, "events")
    return triple_sequence_support(
        ev, "user_id", "event_type", "ts", "event_id"
    )


def _sql_q257() -> str:
    from pytrousse_spark.operators.mining import (
        triple_sequence_support_sql,
    )

    return triple_sequence_support_sql(
        "events", "user_id", "event_type", "ts", "event_id"
    )


def q258_skipgram_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative-sample census completing the q252 SGNS data-prep:
    unigram^0.75 integer mass table, portable-h60 draws per directed
    (pair, slot), draw-to-word via a BROADCAST cumulative-range join
    (the q165 inverse-CDF device) — the big side never shuffles
    (operators/corpus.skipgram_negatives)."""
    from pytrousse_spark.operators.corpus import skipgram_negatives

    docs = _t(spark, sf_dir, "documents")
    return skipgram_negatives(docs, "doc_id", "text")


def _sql_q258() -> str:
    from pytrousse_spark.operators.corpus import skipgram_negatives_sql

    return skipgram_negatives_sql(
        "SELECT * FROM documents", "doc_id", "text"
    )


def q259_regression_discontinuity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharp RDD estimate of crossing the acctbal-5000 threshold on
    order value — the threshold-rule causal member beside IPW/AIPW/
    DiD/CUPED: two local linear fits inside a 3000-wide bandwidth,
    jump at the cutoff as the effect; ONE filtered pass + one 2-group
    agg of exact HUGEINT/DECIMAL38 cent folds
    (operators/cohort.regression_discontinuity)."""
    from pytrousse_spark.operators.cohort import regression_discontinuity

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = o.join(c, o["o_custkey"] == c["c_custkey"], "inner")
    return regression_discontinuity(
        j, "c_acctbal", "o_totalprice", cutoff=5000.0, bandwidth=3000.0
    )


def _sql_q259() -> str:
    from pytrousse_spark.operators.cohort import (
        regression_discontinuity_sql,
    )

    return regression_discontinuity_sql(
        "SELECT * FROM orders o JOIN customer c"
        " ON o.o_custkey = c.c_custkey",
        "c_acctbal", "o_totalprice", cutoff=5000.0, bandwidth=3000.0,
    )


def q260_rake_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raking / IPF survey calibration (Deming-Stephan): reweight the
    ordering customers ("respondents") so their nation x segment
    margins match the FULL customer population; weights are micro-unit
    integers floored identically in both engines, sweeps iterate a
    category-grid cell table, never the data
    (operators/sampling.rake_weights)."""
    from pytrousse_spark.operators.sampling import rake_weights

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    sample = c.join(
        o.select(F.col("o_custkey").alias("c_custkey")).distinct(),
        "c_custkey",
        "left_semi",
    )
    return rake_weights(sample, c, "c_nationkey", "c_mktsegment")


def _sql_q260() -> str:
    from pytrousse_spark.operators.sampling import rake_weights_sql

    return rake_weights_sql(
        "SELECT * FROM customer WHERE c_custkey IN"
        " (SELECT o_custkey FROM orders)",
        "SELECT * FROM customer",
        "c_nationkey",
        "c_mktsegment",
    )


def q261_vocab_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 richness lower bound + Good-Turing unseen-token mass from
    the frequency-of-frequencies profile — "how much vocabulary have
    we NOT crawled" beside the Heaps growth fit q203; two exact
    integer aggs and two closed forms, no join/window
    (operators/corpus.vocab_richness)."""
    from pytrousse_spark.operators.corpus import vocab_richness

    docs = _t(spark, sf_dir, "documents")
    return vocab_richness(docs, "text")


def _sql_q261() -> str:
    from pytrousse_spark.operators.corpus import vocab_richness_sql

    return vocab_richness_sql("SELECT * FROM documents", "text")


def q262_fairness_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-fairness audit of the acctbal>5000 "approval" rule against
    the has-high-value-order label, per market segment: selection
    rate / TPR / FPR with demographic-parity ratios and equalized-odds
    gaps vs the deterministically-picked largest reference group; ONE
    conditional agg + a broadcast 1-row reference
    (operators/classifier.fairness_census)."""
    from pytrousse_spark.operators.classifier import fairness_census

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    lab = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.max(
            (F.col("o_totalprice") > 150_000).cast("int")
        ).alias("__hi")
    )
    j = c.join(lab, "c_custkey", "left").select(
        "c_mktsegment",
        "c_acctbal",
        F.coalesce(F.col("__hi"), F.lit(0)).alias("__hi"),
    )
    return fairness_census(
        j,
        "c_mktsegment",
        (F.col("c_acctbal") > 5000).cast("int"),
        F.col("__hi"),
    )


def _sql_q262() -> str:
    from pytrousse_spark.operators.classifier import fairness_census_sql

    return fairness_census_sql(
        """
        SELECT c.c_mktsegment, c.c_acctbal,
               COALESCE(l.__hi, 0) AS __hi
        FROM customer c
        LEFT JOIN (SELECT o_custkey AS c_custkey,
                          max(CASE WHEN o_totalprice > 150000
                              THEN 1 ELSE 0 END) AS __hi
                   FROM orders GROUP BY 1) l
          ON l.c_custkey = c.c_custkey
        """,
        "c_mktsegment",
        "CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END",
        "__hi",
    )


def q263_markov_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate + perplexity of the user-behavior Markov chain —
    the predictability readout above the q133 transition matrix:
    stationary distribution by integer-div power iteration (exact
    micro-unit vectors both engines, q224 div lesson), one log2 fold;
    ONE entity-keyed lag shuffle, iteration on the states^2 matrix
    (operators/mining.markov_entropy_rate)."""
    from pytrousse_spark.operators.mining import markov_entropy_rate

    ev = _t(spark, sf_dir, "events")
    return markov_entropy_rate(
        ev, "user_id", "ts", "event_type", "event_id"
    )


def _sql_q263() -> str:
    from pytrousse_spark.operators.mining import markov_entropy_rate_sql

    return markov_entropy_rate_sql(
        "events", "user_id", "ts", "event_type", "event_id"
    )


def q264_qte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects of the BUILDING segment on order
    value — WHERE in the distribution the effect lives, vs the
    single-number ATE gates (q226/q246): type-1 inverse CDFs from the
    distinct-value cumulative frame (q186 KS device), integer rank
    probes, all-integer output
    (operators/cohort.quantile_treatment_effects)."""
    from pytrousse_spark.operators.cohort import quantile_treatment_effects

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = o.join(c, o["o_custkey"] == c["c_custkey"], "inner")
    return quantile_treatment_effects(
        j, (F.col("c_mktsegment") == "BUILDING").cast("int"),
        "o_totalprice",
    )


def _sql_q264() -> str:
    from pytrousse_spark.operators.cohort import (
        quantile_treatment_effects_sql,
    )

    return quantile_treatment_effects_sql(
        "SELECT * FROM orders o JOIN customer c"
        " ON o.o_custkey = c.c_custkey",
        "CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END",
        "o_totalprice",
    )


def q265_optimal_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-sensitive operating point (Elkan 2001): the acctbal cutoff
    maximizing 100*TP - 25*FP against the has-high-value-order label —
    the deployable-threshold chooser above the q160/q175 diagnostics;
    reverse-cumulative counts on the distinct-score frame, exact
    BIGINT utilities, highest-threshold tie rule
    (operators/classifier.optimal_threshold)."""
    from pytrousse_spark.operators.classifier import optimal_threshold

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    lab = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.max((F.col("o_totalprice") > 150_000).cast("int")).alias("__hi")
    )
    j = c.join(lab, "c_custkey", "left").select(
        "c_acctbal", F.coalesce(F.col("__hi"), F.lit(0)).alias("__hi")
    )
    return optimal_threshold(j, "c_acctbal", F.col("__hi"))


def _sql_q265() -> str:
    from pytrousse_spark.operators.classifier import optimal_threshold_sql

    return optimal_threshold_sql(
        """
        SELECT c.c_acctbal, COALESCE(l.__hi, 0) AS __hi
        FROM customer c
        LEFT JOIN (SELECT o_custkey AS c_custkey,
                          max(CASE WHEN o_totalprice > 150000
                              THEN 1 ELSE 0 END) AS __hi
                   FROM orders GROUP BY 1) l
          ON l.c_custkey = c.c_custkey
        """,
        "c_acctbal",
        "__hi",
    )


def q266_sequential_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-sequential A/B monitor at 5 equally-spaced looks with
    O'Brien-Fleming boundaries — the peeking-safe experiment readout
    above the fixed-horizon z-test q148: parity-split arms, exact
    epoch-micro cuts, pooled two-proportion z per look vs the
    wide-early boundary (operators/cohort.sequential_ab_looks)."""
    from pytrousse_spark.operators.cohort import sequential_ab_looks

    ev = _t(spark, sf_dir, "events")
    return sequential_ab_looks(
        ev, "user_id", "ts",
        (F.col("event_type") == "purchase").cast("int"),
    )


def _sql_q266() -> str:
    from pytrousse_spark.operators.cohort import sequential_ab_looks_sql

    return sequential_ab_looks_sql(
        "SELECT * FROM events", "user_id", "ts",
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END",
    )


def q267_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-vocabulary Jaccard matrix — set overlap beside
    the exact-match contamination gate q64 and the frequency-weighted
    JS distance q152; one DISTINCT (source, token) reduction, a
    token-keyed pair join bounded by vocab x sources^2, broadcast
    sizes, inclusion-exclusion union
    (operators/corpus.source_vocab_overlap)."""
    from pytrousse_spark.operators.corpus import source_vocab_overlap

    docs = _t(spark, sf_dir, "documents")
    return source_vocab_overlap(docs, "source", "text")


def _sql_q267() -> str:
    from pytrousse_spark.operators.corpus import source_vocab_overlap_sql

    return source_vocab_overlap_sql(
        "SELECT * FROM documents", "source", "text"
    )


def q268_log_odds_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """"Fightin' words" token divergence (Monroe 2008) between the
    even- and odd-doc_id halves of the corpus — the informative-
    Dirichlet-prior log-odds z that fixes raw log-odds exploding on
    rare tokens; exact BIGINT counts, identical z chain, top-30 by
    |z| via TakeOrderedAndProject
    (operators/corpus.log_odds_tokens)."""
    from pytrousse_spark.operators.corpus import log_odds_tokens

    docs = _t(spark, sf_dir, "documents").withColumn(
        "__half",
        F.when(F.col("doc_id") % 2 == 0, F.lit("even")).otherwise(
            F.lit("odd")
        ),
    )
    return log_odds_tokens(docs, "__half", "text", "even", "odd")


def _sql_q268() -> str:
    from pytrousse_spark.operators.corpus import log_odds_tokens_sql

    return log_odds_tokens_sql(
        "SELECT *, CASE WHEN doc_id % 2 = 0 THEN 'even' ELSE 'odd' END"
        " AS __half FROM documents",
        "__half", "text", "even", "odd",
    )


_Q269_QUERIES = {
    "q1": ["merge", "window", "shuffle"],
    "q2": ["vector", "scan"],
    "q3": ["sort", "limit", "partition"],
}


def q269_ndcg_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the q242 BM25 engine against a conjunctive
    phrase-containment relevance oracle, over three fixed multi-term
    queries — the measured-retrieval eval harness: DCG/IDCG discounts
    on integer ranks, ideal capped at min(R, k)
    (operators/classifier.ndcg_at_k)."""
    from pytrousse_spark.functions.text import bm25_search, tokens
    from pytrousse_spark.operators.classifier import ndcg_at_k

    d = _t(spark, sf_dir, "documents")
    # tokenized once for all three relevance oracles (r12: was one
    # tokenize pass per query)
    staged = d.select(
        "doc_id", tokens(F.col("text")).alias("__tk")
    ).localCheckpoint(eager=False)
    rank_parts, rel_parts = [], []
    for qname, terms in _Q269_QUERIES.items():
        w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        rank_parts.append(
            bm25_search(d, "text", "doc_id", terms, k=10).select(
                F.lit(qname).alias("query"),
                "doc_id",
                F.row_number().over(w).cast("int").alias("rank"),
            )
        )
        cond = F.lit(True)
        for t in terms:
            cond = cond & F.array_contains(F.col("__tk"), t)
        rel_parts.append(
            staged.where(cond).select(
                F.lit(qname).alias("query"), "doc_id"
            )
        )
    ranking = rank_parts[0]
    for p in rank_parts[1:]:
        ranking = ranking.unionByName(p)
    relevance = rel_parts[0]
    for p in rel_parts[1:]:
        relevance = relevance.unionByName(p)
    return ndcg_at_k(ranking, relevance, k=10)


def _sql_q269() -> str:
    from pytrousse_spark.functions.text import bm25_search_sql, tokens_sql
    from pytrousse_spark.operators.classifier import ndcg_at_k_sql

    tk = tokens_sql("text")
    rank_parts, rel_parts = [], []
    for qname, terms in _Q269_QUERIES.items():
        inner = bm25_search_sql("documents", "text", "doc_id", terms, k=10)
        rank_parts.append(
            f"""SELECT '{qname}' AS "query", doc_id,
                CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC)
                     AS INTEGER) AS rank
                FROM ({inner})"""
        )
        conds = " AND ".join(
            f"list_contains({tk}, '{t}')" for t in terms
        )
        rel_parts.append(
            f"""SELECT '{qname}' AS "query", doc_id
                FROM documents WHERE {conds}"""
        )
    ranking = " UNION ALL ".join(rank_parts)
    relevance = " UNION ALL ".join(rel_parts)
    return ndcg_at_k_sql(ranking, relevance, k=10)


def q270_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-estimator calibration audit over the documents corpus:
    exact n-gram Jaccard pairs >= 0.1 vs their 16-permutation
    signature estimates, binned — the measured evidence behind the
    LSH-candidates/exact-verify dedup design; all folds exact
    micro-unit integers (operators/dedup.minhash_calibration)."""
    from pytrousse_spark.operators.dedup import minhash_calibration

    d = _t(spark, sf_dir, "documents")
    return minhash_calibration(d, "text", "doc_id")


def _sql_q270() -> str:
    from pytrousse_spark.operators.dedup import minhash_calibration_sql

    return minhash_calibration_sql("documents", "text", "doc_id")


def q271_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy three-way Brier decomposition of the q160 quality scorer
    against the lang='en' label — reliability (miscalibration) vs
    resolution (discrimination) vs irreducible uncertainty, plus the
    within-bin variance residual; micro-unit staging, HUGEINT folds,
    nano-unit outer sums (fold-order-free)
    (operators/classifier.brier_decomposition)."""
    from pytrousse_spark.operators.classifier import brier_decomposition

    d = _t(spark, sf_dir, "documents")
    z = (F.col("n_chars").cast("double") - F.lit(300.0)) / F.lit(80.0)
    p = F.lit(0.5) + z / (F.lit(2.0) * (F.lit(1.0) + F.abs(z)))
    scored = d.select(
        p.alias("p"), (F.col("lang") == "en").cast("int").alias("y")
    )
    return brier_decomposition(scored, "p", "y")


def _sql_q271() -> str:
    from pytrousse_spark.operators.classifier import (
        brier_decomposition_sql,
    )

    return brier_decomposition_sql(
        """
        SELECT 0.5 + ((CAST(n_chars AS DOUBLE) - 300.0) / 80.0)
               / (2.0 * (1.0 + abs((CAST(n_chars AS DOUBLE) - 300.0)
                                   / 80.0))) AS p,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM documents
        """,
        "p",
        "y",
    )


def q272_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa chance-corrected agreement between two document
    quality heuristics (chars > 300 vs whitespace tokens > 40) — the
    annotation-pipeline interchangeability gate; ONE conditional agg
    builds the exact 2x2 table (operators/classifier.cohens_kappa)."""
    from pytrousse_spark.functions.text import token_count
    from pytrousse_spark.operators.classifier import cohens_kappa

    d = _t(spark, sf_dir, "documents")
    return cohens_kappa(
        d,
        (F.col("n_chars") > 300).cast("int"),
        (token_count(F.col("text")) > 40).cast("int"),
    )


def _sql_q272() -> str:
    from pytrousse_spark.functions.text import tokens_sql
    from pytrousse_spark.operators.classifier import cohens_kappa_sql

    tk = tokens_sql("text")
    return cohens_kappa_sql(
        "SELECT * FROM documents",
        "CASE WHEN n_chars > 300 THEN 1 ELSE 0 END",
        f"CASE WHEN len({tk}) > 40 THEN 1 ELSE 0 END",
    )


def q273_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T revenue-inequality index across customers with the
    between/within-NATION decomposition — the additively-decomposable
    concentration readout Gini q149 cannot give; pico-unit x*ln(x)
    folds keep the one data-sized float sum fold-order-free
    (operators/cohort.theil_index)."""
    from pytrousse_spark.operators.cohort import theil_index

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    rev = (
        o.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.sum("o_totalprice").alias("__rev"))
        .join(c, "c_custkey")
    )
    return theil_index(rev, "c_nationkey", "__rev")


def _sql_q273() -> str:
    from pytrousse_spark.operators.cohort import theil_index_sql

    return theil_index_sql(
        """
        SELECT c.c_nationkey, r.__rev
        FROM (SELECT o_custkey AS c_custkey,
                     sum(o_totalprice) AS __rev
              FROM orders GROUP BY 1) r
        JOIN customer c ON c.c_custkey = r.c_custkey
        """,
        "c_nationkey",
        "__rev",
    )


def q274_unicode_census_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q254's Unicode hygiene census where the ENGINE side actually
    executes the Structured Streaming maintenance path (r7 VERDICT
    item 5 — the five measured sinks previously had only batch twins
    driver-gated): the documents table is re-staged as a multi-file
    source, read with readStream + maxFilesPerTrigger so the
    availableNow run processes SEVERAL micro-batches, each appending
    the six mergeable per-group BIGINT counters via foreachBatch
    (streaming/events.unicode_census_stream); the readout merges the
    partials store (unicode_census_from_partials) and must hash-match
    the SAME batch-census DuckDB oracle as q254 — at-least-once,
    order-independent partials pinned by the driver itself.

    The tiny merged readout (one row per source) is re-materialized as
    a local DataFrame so the staging directory can be cleaned up
    before returning; the streaming job has already run to completion
    by then (availableNow terminates)."""
    import shutil
    import tempfile

    from pytrousse_spark.streaming.events import (
        unicode_census_from_partials,
        unicode_census_stream,
    )

    docs = _t(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="pytrousse_uc_stream_gate_")
    try:
        src = os.path.join(tmp, "src")
        store = os.path.join(tmp, "store")
        docs.repartition(4).write.mode("overwrite").parquet(src)
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        unicode_census_stream(stream, "source", "text", store)
        out = unicode_census_from_partials(spark, store)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q275_png_palette_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PALETTED PNG codec round trip (r7 VERDICT item 8 — color
    type 3, the first of the two honest multimodal increments left):
    each document id becomes a genuine 16x12 color-type-3 PNG (PLTE
    chunk of the deterministic 40-entry test palette, 1-byte indices
    filtered through all five standard filter types), decoded back by
    the pure-stdlib chunk-walk/inflate/unfilter/palette-map path; the
    decoded RGB checksum must equal the oracle's closed form over the
    index formula and palette formula (operators/multimodal.py)."""
    from pytrousse_spark.operators.multimodal import (
        decode_png_meta,
        synthesize_png_palette_column,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id").orderBy("doc_id").limit(150)
    media = synthesize_png_palette_column(d, "doc_id", width=16, height=12)
    return decode_png_meta(media, "media", "doc_id")


def _sql_q275() -> str:
    # palette entry channel c of index i = (i*37 + 11c + 5) % 256;
    # index of pixel (x, y) = (doc_id*7 + 3x + 5y) % 40
    return """
    SELECT doc_id,
           CAST(16 AS INT) AS width,
           CAST(12 AS INT) AS height,
           CAST(8 AS INT) AS bit_depth,
           CAST(3 AS INT) AS color_type,
           CAST((SELECT SUM((((doc_id * 7 + 3 * x.i + 5 * y.j) % 40)
                             * 37 + 11 * ch.c + 5) % 256)
                 FROM generate_series(0, 15) AS x(i),
                      generate_series(0, 11) AS y(j),
                      generate_series(0, 2) AS ch(c)) AS BIGINT)
               AS pixel_sum
    FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 150)
    """


def q277_dirichlet_ql_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirichlet-smoothed query-likelihood retrieval (Zhai-Lafferty
    2001) over the documents corpus — the language-modeling member of
    the retrieval trio beside BM25 (q242) and tf-idf (q129): every
    document scores (absent terms draw smoothed collection mass) via
    the K + matched - Qe*ln(dl+mu) decomposition, with the collection
    LM (cf_t/|C|) and the (K, Qe) scalars computed IN-PLAN as broadcast
    rows (functions/text.dirichlet_ql_search)."""
    from pytrousse_spark.functions.text import dirichlet_ql_search

    d = _t(spark, sf_dir, "documents")
    return dirichlet_ql_search(
        d, "text", "doc_id", ["merge", "window", "shuffle"], mu=2000.0,
        k=25,
    )


def _sql_q277() -> str:
    from pytrousse_spark.functions.text import dirichlet_ql_search_sql

    return dirichlet_ql_search_sql(
        "documents", "text", "doc_id", ["merge", "window", "shuffle"],
        mu=2000.0, k=25,
    )


def q278_embedding_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding ISOTROPY census — effective
    variance-carrying directions (participation ratio over the
    per-dimension variances), expected-random-cosine anisotropy
    ||mu||^2/E||x||^2 (Ethayarajh 2019 common-direction pathology) and
    RMS norm, all from ONE (label, position)-keyed exact-integer agg +
    a labels x dim fold (operators/similarity.embedding_isotropy) —
    the embedding-quality gate before ANN/dedup trusts the vectors."""
    from pytrousse_spark.operators.similarity import embedding_isotropy

    emb = _t(spark, sf_dir, "embeddings")
    return embedding_isotropy(emb, "embedding", "label")


def _sql_q278() -> str:
    from pytrousse_spark.operators.similarity import embedding_isotropy_sql

    return embedding_isotropy_sql(
        "SELECT * FROM embeddings", "embedding", "label"
    )


def q279_propensity_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-NN propensity-score matching ATT of the BUILDING segment on
    order totals (Rosenbaum-Rubin 1983) — the matching member of the
    causal family beside IPW q226 / AIPW q246, sharing their exact
    logistic-GD propensity chain (replayed in FULL by the oracle);
    treated/control reduce to bounded micro-quantized score LEVELS, the
    nearest control level comes from the two-sided as-of device, and
    every fold is exact-integer (operators/cohort.propensity_matching)."""
    from pytrousse_spark.operators.cohort import propensity_matching

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = o.join(c, o["o_custkey"] == c["c_custkey"], "inner")
    return propensity_matching(
        j, (F.col("c_mktsegment") == "BUILDING").cast("int"),
        "o_totalprice",
        F.col("c_acctbal") / 1000.0,
        F.col("c_nationkey").cast("double") / 25.0,
    )


def _sql_q279() -> str:
    from pytrousse_spark.operators.cohort import propensity_matching_sql

    return propensity_matching_sql(
        "SELECT * FROM orders o JOIN customer c"
        " ON o.o_custkey = c.c_custkey",
        "CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END",
        "o_totalprice",
        "c_acctbal / 1000.0",
        "CAST(c_nationkey AS DOUBLE) / 25.0",
    )


def q280_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry strength ranking (Bradley-Terry 1952, Hunter 2004
    MM) over deterministic brand 'duels': in every order, the two
    lowest-linenumber lineitems compete and the CHEAPER extended price
    wins its part's brand the duel (ties and same-brand duels drop).
    The full 20-round MM iteration replays unrolled in the oracle —
    the arena-style eval member beside NDCG/AUC/kappa
    (operators/classifier.bradley_terry)."""
    from pytrousse_spark.operators.classifier import bradley_terry

    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.where(F.col("l_linenumber") <= 2).join(
        p.select("p_partkey", "p_brand"),
        li["l_partkey"] == p["p_partkey"],
    ).select("l_orderkey", "l_linenumber", "l_extendedprice", "p_brand")
    a = j.where(F.col("l_linenumber") == 1).select(
        F.col("l_orderkey").alias("__o"),
        F.col("l_extendedprice").alias("__pa"),
        F.col("p_brand").alias("__ba"),
    )
    b = j.where(F.col("l_linenumber") == 2).select(
        F.col("l_orderkey").alias("__o"),
        F.col("l_extendedprice").alias("__pb"),
        F.col("p_brand").alias("__bb"),
    )
    duels = (
        a.join(b, "__o")
        .where(
            (F.col("__ba") != F.col("__bb"))
            & (F.col("__pa") != F.col("__pb"))
        )
        .select(
            F.when(F.col("__pa") < F.col("__pb"), F.col("__ba"))
            .otherwise(F.col("__bb"))
            .alias("winner"),
            F.when(F.col("__pa") < F.col("__pb"), F.col("__bb"))
            .otherwise(F.col("__ba"))
            .alias("loser"),
        )
    )
    return bradley_terry(duels, "winner", "loser", iters=20)


def _sql_q280() -> str:
    from pytrousse_spark.operators.classifier import bradley_terry_sql

    duels = """
        SELECT CASE WHEN a.__pa < b.__pb THEN a.__ba ELSE b.__bb END
                   AS winner,
               CASE WHEN a.__pa < b.__pb THEN b.__bb ELSE a.__ba END
                   AS loser
        FROM (SELECT l_orderkey AS __o, l_extendedprice AS __pa,
                     p_brand AS __ba
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE l_linenumber = 1) a
        JOIN (SELECT l_orderkey AS __o, l_extendedprice AS __pb,
                     p_brand AS __bb
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE l_linenumber = 2) b ON a.__o = b.__o
        WHERE a.__ba <> b.__bb AND a.__pa <> b.__pb
    """
    return bradley_terry_sql(duels, "winner", "loser", iters=20)


def q281_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction over q135's co-purchase graph
    (parts co-occurring in >= 2 order baskets): top-25 missing edges by
    the hub-discounted common-neighbor score sum 1/ln(deg z), apexes
    generated at the common neighbor (wedge join bounded by
    sum deg^2 under the documented apex cap), adjacent pairs dropped
    via anti-join (operators/graph.adamic_adar)."""
    from pytrousse_spark.operators.graph import adamic_adar

    li = _t(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("__bk"), F.col("l_partkey").alias("__i")
    ).distinct()
    edges = (
        items.join(items.withColumnRenamed("__i", "__j"), "__bk")
        .where(F.col("__i") < F.col("__j"))
        .groupBy("__i", "__j")
        .agg(F.count(F.lit(1)).alias("__c"))
        .where(F.col("__c") >= 2)
    )
    return adamic_adar(edges, "__i", "__j", top_k=25)


def _sql_q281() -> str:
    from pytrousse_spark.operators.graph import adamic_adar_sql

    edges = """
        SELECT __i, __j FROM (
            SELECT a.__i, b.__i AS __j
            FROM (SELECT DISTINCT l_orderkey AS __bk, l_partkey AS __i
                  FROM lineitem) a
            JOIN (SELECT DISTINCT l_orderkey AS __bk, l_partkey AS __i
                  FROM lineitem) b
              ON a.__bk = b.__bk AND a.__i < b.__i
        ) GROUP BY __i, __j HAVING count(*) >= 2
    """
    return adamic_adar_sql(edges, "__i", "__j", top_k=25)


def q282_aalen_johansen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aalen-Johansen competing-risks cumulative incidence: per user,
    days from first view to WHICHEVER comes first of a subsequent
    purchase (cause 'convert') or a subsequent error (cause 'abandon'),
    censored at the observation end when neither occurs — the
    two-cause upgrade of q178's single-cause KM (1 - KM per cause
    would overstate both; AJ conserves incidence mass: sum CIF + S = 1
    pinned in tests). Same subject reduction, duration-level windows
    only (operators/survival.aalen_johansen)."""
    from pytrousse_spark.operators.survival import aalen_johansen

    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "__fv"
        ),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("__fp"),
        F.min(
            F.when(F.col("event_type") == "error", F.col("ts"))
        ).alias("__fe"),
    )
    obs_end = ev.agg(F.max("ts").alias("__end"))
    vp = F.col("__fp").isNotNull() & (F.col("__fp") >= F.col("__fv"))
    ve = F.col("__fe").isNotNull() & (F.col("__fe") >= F.col("__fv"))
    p_first = vp & (~ve | (F.col("__fp") <= F.col("__fe")))
    e_first = ve & (~vp | (F.col("__fe") < F.col("__fp")))
    evt_ts = F.when(p_first, F.col("__fp")).when(e_first, F.col("__fe"))
    days = lambda c: F.floor(  # noqa: E731
        (F.unix_micros(c) - F.unix_micros("__fv"))
        / F.lit(86_400_000_000)
    ).cast("double")
    subjects = (
        per_user.where(F.col("__fv").isNotNull())
        .crossJoin(F.broadcast(obs_end))
        .select(
            F.when(evt_ts.isNotNull(), days(evt_ts))
            .otherwise(days(F.col("__end")))
            .alias("dur_days"),
            F.when(p_first, F.lit("convert"))
            .when(e_first, F.lit("abandon"))
            .alias("cause"),
        )
    )
    return aalen_johansen(subjects, "dur_days", "cause")


def _sql_q282() -> str:
    from pytrousse_spark.operators.survival import aalen_johansen_sql

    subjects = """
        WITH pu AS (
            SELECT user_id,
                   min(CASE WHEN event_type = 'view'
                            THEN CAST(ts AS TIMESTAMP) END) AS __fv,
                   min(CASE WHEN event_type = 'purchase'
                            THEN CAST(ts AS TIMESTAMP) END) AS __fp,
                   min(CASE WHEN event_type = 'error'
                            THEN CAST(ts AS TIMESTAMP) END) AS __fe
            FROM events GROUP BY user_id
        ), oe AS (
            SELECT max(CAST(ts AS TIMESTAMP)) AS __end FROM events
        ), st AS (
            SELECT __fv, __fp, __fe, __end,
                   (__fp IS NOT NULL AND __fp >= __fv) AS vp,
                   (__fe IS NOT NULL AND __fe >= __fv) AS ve
            FROM pu CROSS JOIN oe WHERE __fv IS NOT NULL
        ), cl AS (
            SELECT *,
                   (vp AND (NOT ve OR __fp <= __fe)) AS p_first,
                   (ve AND (NOT vp OR __fe < __fp)) AS e_first
            FROM st
        )
        SELECT CAST(floor(epoch_us(
                   (CASE WHEN p_first THEN __fp
                         WHEN e_first THEN __fe
                         ELSE __end END) - __fv) / 86400000000)
               AS DOUBLE) AS dur_days,
               CASE WHEN p_first THEN 'convert'
                    WHEN e_first THEN 'abandon' END AS cause
        FROM cl
    """
    return aalen_johansen_sql(subjects, "dur_days", "cause")


def q283_group_jackknife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-SOURCE-out jackknife of corpus mean quality — the
    data-ablation readout ('which source pulls the corpus metric, with
    a group-correlation-respecting SE'): per-source influence,
    pseudo-values and the delete-a-group jackknife standard error from
    global-minus-group exact-integer algebra, no per-group re-scan
    (operators/sampling.group_jackknife over functions/text
    quality_score)."""
    from pytrousse_spark.operators.sampling import group_jackknife

    d = _t(spark, sf_dir, "documents").select(
        "source", tx.quality_score(F.col("text")).alias("__q")
    )
    return group_jackknife(d, "source", "__q")


def _sql_q283() -> str:
    from pytrousse_spark.functions.text import quality_score_sql
    from pytrousse_spark.operators.sampling import group_jackknife_sql

    staged = (
        f"SELECT source, {quality_score_sql('text')} AS __q"
        " FROM documents"
    )
    return group_jackknife_sql(staged, "source", "__q")


def q284_ohlc_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second streaming-executed driver gate (q274's pattern on the
    STATEFUL numeric sink): the events table re-stages as a multi-file
    source, the REAL availableNow foreachBatch stream appends mergeable
    per-(type, day) OHLC/VWAP partials (open/close ride arg-min/max of
    the composed (ts, order) key, so out-of-order micro-batches cannot
    corrupt them), and the merged readout must hash-match q225's batch
    bars oracle (streaming/events.ohlc_events_stream)."""
    import shutil
    import tempfile

    from pytrousse_spark.streaming.events import (
        ohlc_events_stream,
        ohlc_from_partials,
    )

    ev = _t(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="pytrousse_ohlc_stream_gate_")
    try:
        src = os.path.join(tmp, "src")
        store = os.path.join(tmp, "store")
        ev.repartition(4).write.mode("overwrite").parquet(src)
        staged = spark.read.parquet(src)
        stream = (
            spark.readStream.schema(staged.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        ohlc_events_stream(stream, "event_type", "value", store, "1 day")
        out = ohlc_from_partials(spark, store)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q285_embedding_mmd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-2 polynomial-kernel MMD drift between the even- and
    odd-id halves of the embeddings table — the covariance-sensitive
    drift gate beside q233's centroid readout (a rotation of the cloud
    around an unchanged mean is invisible to centroid cosine/distance
    but lights up the second-moment Frobenius term). Closed moment
    form, no pairwise kernel sums; n*d^2 map expansion into a
    d^2-cell agg (operators/similarity.embedding_mmd_poly2)."""
    from pytrousse_spark.operators.similarity import embedding_mmd_poly2

    emb = _t(spark, sf_dir, "embeddings")
    ref = emb.where(F.col("vec_id") % 2 == 0)
    cur = emb.where(F.col("vec_id") % 2 == 1)
    return embedding_mmd_poly2(ref, cur, "vec_id", "embedding")


def _sql_q285() -> str:
    from pytrousse_spark.operators.similarity import embedding_mmd_poly2_sql

    return embedding_mmd_poly2_sql(
        "SELECT * FROM embeddings WHERE vec_id % 2 = 0",
        "SELECT * FROM embeddings WHERE vec_id % 2 = 1",
        "vec_id",
        "embedding",
    )


def q276_png_rgba_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL RGBA PNG codec round trip (r7 VERDICT item 8 — color type
    6, the alpha half): q171's generator/decoder extended to 4-byte
    pixels (the a/c filter neighbors move one 4-byte pixel left — the
    exact spot a stride bug would corrupt), closed-form channel
    checksum over all four channels (operators/multimodal.py)."""
    from pytrousse_spark.operators.multimodal import (
        decode_png_meta,
        synthesize_png_rgba_column,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id").orderBy("doc_id").limit(150)
    media = synthesize_png_rgba_column(d, "doc_id", width=16, height=12)
    return decode_png_meta(media, "media", "doc_id")


def _sql_q276() -> str:
    return """
    SELECT doc_id,
           CAST(16 AS INT) AS width,
           CAST(12 AS INT) AS height,
           CAST(8 AS INT) AS bit_depth,
           CAST(6 AS INT) AS color_type,
           CAST((SELECT SUM((doc_id * 7 + 3 * x.i + 5 * y.j + 11 * ch.c)
                            % 256)
                 FROM generate_series(0, 15) AS x(i),
                      generate_series(0, 11) AS y(j),
                      generate_series(0, 3) AS ch(c)) AS BIGINT)
               AS pixel_sum
    FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 150)
    """


def q286_png_gray16_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL 16-BIT grayscale PNG codec round trip (r8 VERDICT item 8 —
    the depth axis the 8-bit family left uncovered): each document id
    becomes a genuine bit-depth-16 color-type-0 PNG (2-byte big-endian
    samples, filters cycling all five types with a/c neighbors one
    2-byte SAMPLE left — the exact spot a byte-level-vs-sample-level
    filter bug would corrupt), decoded back by the same chunk-walk
    path; the decoded 16-bit sample checksum must equal the oracle's
    closed form over (id*131 + 257x + 263y) mod 65536
    (operators/multimodal.py: encode_png_gray16 / decode_png)."""
    from pytrousse_spark.operators.multimodal import (
        decode_png_meta,
        synthesize_png_gray16_column,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id").orderBy("doc_id").limit(150)
    media = synthesize_png_gray16_column(d, "doc_id", width=16, height=12)
    return decode_png_meta(media, "media", "doc_id")


def _sql_q286() -> str:
    return """
    SELECT doc_id,
           CAST(16 AS INT) AS width,
           CAST(12 AS INT) AS height,
           CAST(16 AS INT) AS bit_depth,
           CAST(0 AS INT) AS color_type,
           CAST((SELECT SUM((doc_id * 131 + 257 * x.i + 263 * y.j)
                            % 65536)
                 FROM generate_series(0, 15) AS x(i),
                      generate_series(0, 11) AS y(j)) AS BIGINT)
               AS pixel_sum
    FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 150)
    """


def q287_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) over the DIRECTED
    customer→supplier purchase graph (edges = distinct pairs from
    orders⋈lineitem): hub customers buy from authoritative suppliers,
    authoritative suppliers sell to hub customers — the query-time
    companion to q117's PageRank. 6 iterations, each half = one
    edge-keyed join + one hash agg + a broadcast max-normalization in
    integer micro-units; the DuckDB twin replays the chain
    bit-for-bit (operators/graph.hits)."""
    from pytrousse_spark.operators.graph import hits

    from pytrousse_spark.io import rebalance_undersplit

    o = _t(spark, sf_dir, "orders")
    # spread the 600k-row join probe (single-row-group bench input — a
    # no-op at real scale)
    l = rebalance_undersplit(_t(spark, sf_dir, "lineitem"))
    edges = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    return hits(edges, "src", "dst", iters=6)


def _sql_q287() -> str:
    from pytrousse_spark.operators.graph import hits_sql

    return hits_sql(
        "SELECT DISTINCT 'c:' || CAST(o_custkey AS VARCHAR) AS src,"
        " 's:' || CAST(l_suppkey AS VARCHAR) AS dst"
        " FROM lineitem JOIN orders ON l_orderkey = o_orderkey",
        "src",
        "dst",
        iters=6,
    )


def q288_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's continuity-corrected test (1947) comparing two
    PAIRED English-detection classifiers on the documents corpus —
    truth = the labeled lang column, A = the full stopword lang-id
    heuristic (q98's classifier), B = a crude ' the '-containment
    rule: only the discordant pairs (A right / B wrong and the
    reverse) carry evidence, the comparison an unpaired accuracy
    z-test gets wrong. ONE full-scan hash agg of conditional counts
    (operators/classifier.mcnemar_test)."""
    from pytrousse_spark.operators.classifier import mcnemar_test

    d = _t(spark, sf_dir, "documents")
    return mcnemar_test(
        d,
        (F.col("lang") == "en"),
        (tx.lang_id(F.col("text")) == "en"),
        (
            F.instr(
                F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" ")),
                " the ",
            )
            > 0
        ),
    )


def _sql_q288() -> str:
    from pytrousse_spark.functions.text import lang_id_sql
    from pytrousse_spark.operators.classifier import mcnemar_test_sql

    return mcnemar_test_sql(
        "documents",
        "(lang = 'en')",
        f"(({lang_id_sql('text')}) = 'en')",
        "(position(' the ' IN ' ' || lower(text) || ' ') > 0)",
    )


def q289_conformal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals (Lei et al. 2018) for the
    per-quantity train-mean price model over lineitem: 6:2:2
    train/calibration/test by the portable salted id hash (q61's
    device), conformal half-width = the ceil((n+1)(1-alpha))-th
    smallest calibration |residual| selected over integer-cent
    RESIDUAL LEVELS (one hash agg + a bounded level window — no
    data-sized sort, the propensity-matching level pattern), test
    coverage >= 1 - alpha in expectation — the distribution-free
    guarantee an eval pipeline reports beside point error
    (operators/classifier.split_conformal)."""
    from pytrousse_spark.operators.classifier import split_conformal

    li = _t(spark, sf_dir, "lineitem")
    return split_conformal(
        li,
        F.col("l_orderkey") * 8 + F.col("l_linenumber"),
        "l_quantity",
        "l_extendedprice",
        alpha=0.1,
    )


def _sql_q289() -> str:
    from pytrousse_spark.operators.classifier import split_conformal_sql

    return split_conformal_sql(
        "lineitem",
        "l_orderkey * 8 + l_linenumber",
        "l_quantity",
        "l_extendedprice",
        alpha=0.1,
    )


def q291_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of the retrieval
    trio's rankings — BM25 (q242), Dirichlet QL (q277) and conjunctive
    tf-idf (q129) — for the same query over documents: the standard
    production combiner that reads only ranks, never the incomparable
    raw scores. Per-term reciprocals round to integer nanos so the
    cross-list fold is exact in both engines
    (functions/text.rrf_fuse)."""
    from pytrousse_spark.functions.text import (
        bm25_search,
        dirichlet_ql_search,
        rrf_fuse,
        search_docs,
    )

    d = _t(spark, sf_dir, "documents")
    terms = ["merge", "window", "shuffle"]
    return rrf_fuse(
        [
            bm25_search(d, "text", "doc_id", terms, k=25),
            dirichlet_ql_search(d, "text", "doc_id", terms, mu=2000.0, k=25),
            search_docs(d, "text", "doc_id", terms, k=25),
        ],
        "doc_id",
        k_const=60,
        top_k=20,
    )


def _sql_q291() -> str:
    from pytrousse_spark.functions.text import (
        bm25_search_sql,
        dirichlet_ql_search_sql,
        rrf_fuse_sql,
        search_docs_sql,
    )

    terms = ["merge", "window", "shuffle"]
    return rrf_fuse_sql(
        [
            bm25_search_sql("documents", "text", "doc_id", terms, k=25),
            dirichlet_ql_search_sql(
                "documents", "text", "doc_id", terms, mu=2000.0, k=25
            ),
            search_docs_sql("documents", "text", "doc_id", terms, k=25),
        ],
        "doc_id",
        k_const=60,
        top_k=20,
    )


def q292_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha (nominal) over a three-'annotator' language
    labeling of the documents corpus — the labeled lang column, the
    stopword lang-id heuristic (q98's classifier), and a crude
    marker-word rule — the inter-annotator reliability statistic that
    handles any rater count and missing ratings, beside Cohen's kappa
    (q272) which cannot. Long-format ratings union, unit-keyed
    coincidence self-join bounded by raters^2, exact micro-unit folds
    (operators/classifier.krippendorff_alpha)."""
    from pytrousse_spark.operators.classifier import krippendorff_alpha

    d = _t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    crude = (
        F.when(
            F.instr(
                F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" ")),
                " the ",
            )
            > 0,
            F.lit("en"),
        )
        .when(
            F.instr(
                F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" ")),
                " und ",
            )
            > 0,
            F.lit("de"),
        )
        .otherwise(F.lit("other"))
    )
    ratings = (
        d.select(F.col("doc_id").alias("u"), F.col("lang").alias("v"))
        .unionByName(
            d.select(
                F.col("doc_id").alias("u"),
                tx.lang_id(F.col("text")).alias("v"),
            )
        )
        .unionByName(d.select(F.col("doc_id").alias("u"), crude.alias("v")))
    )
    return krippendorff_alpha(ratings, "u", "v")


def _sql_q292() -> str:
    from pytrousse_spark.functions.text import lang_id_sql
    from pytrousse_spark.operators.classifier import krippendorff_alpha_sql

    crude = (
        "CASE WHEN position(' the ' IN ' ' || lower(text) || ' ') > 0"
        " THEN 'en'"
        " WHEN position(' und ' IN ' ' || lower(text) || ' ') > 0"
        " THEN 'de' ELSE 'other' END"
    )
    sub = (
        "SELECT doc_id AS u, lang AS v FROM documents"
        " WHERE text IS NOT NULL"
        " UNION ALL "
        f"SELECT doc_id AS u, ({lang_id_sql('text')}) AS v FROM documents"
        " WHERE text IS NOT NULL"
        " UNION ALL "
        f"SELECT doc_id AS u, {crude} AS v FROM documents"
        " WHERE text IS NOT NULL"
    )
    return krippendorff_alpha_sql(sub, "u", "v")


def q293_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST equivalence test (Schuirmann 1987) over hash-split arms of
    per-user event value — the 'are these the SAME within ±delta'
    readout a failed difference test cannot give, completing the A/B
    family beside CUPED (q188), sequential looks (q266) and the rate
    tests. ONE user-keyed agg + a 2-row Welch moment fold, exact
    DECIMAL sufficient statistics (operators/cohort.tost_equivalence).
    delta=400 on this table sits well inside the equivalence region
    (the two arms ARE the same population split by hash)."""
    from pytrousse_spark.operators.cohort import tost_equivalence

    ev = _t(spark, sf_dir, "events")
    return tost_equivalence(ev, "user_id", "value", delta=400.0)


def _sql_q293() -> str:
    from pytrousse_spark.operators.cohort import tost_equivalence_sql

    return tost_equivalence_sql("events", "user_id", "value", delta=400.0)


def q294_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q (1950) over THREE paired English-detection
    classifiers on documents — the k-classifier extension of McNemar
    (q288 is exactly the k=2, continuity-corrected case): stopword
    lang-id, ' the '-containment, and an ASCII-share rule, all scored
    against the labeled lang column in ONE conditional-count scan;
    only rows where the classifiers disagree carry evidence
    (operators/classifier.cochran_q)."""
    from pytrousse_spark.operators.classifier import cochran_q

    d = _t(spark, sf_dir, "documents")
    pad = F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" "))
    return cochran_q(
        d,
        (F.col("lang") == "en"),
        [
            (tx.lang_id(F.col("text")) == "en"),
            (F.instr(pad, " the ") > 0),
            (
                F.length(F.regexp_replace(F.col("text"), r"[\x00-\x7F]", ""))
                * 50
                < F.length(F.col("text"))
            ),
        ],
    )


def _sql_q294() -> str:
    from pytrousse_spark.functions.text import lang_id_sql
    from pytrousse_spark.operators.classifier import cochran_q_sql

    return cochran_q_sql(
        "documents",
        "(lang = 'en')",
        [
            f"(({lang_id_sql('text')}) = 'en')",
            "(position(' the ' IN ' ' || lower(text) || ' ') > 0)",
            "(length(regexp_replace(text, '[\\x00-\\x7F]', '', 'g')) * 50"
            " < length(text))",
        ],
    )


def q297_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U + Cliff's delta comparing click vs purchase
    order values — the nonparametric two-sample location test with its
    effect size, level-decomposed (integer-cent level frame + ONE
    window over levels, never a data-sized sort); tie-corrected z
    (operators/classifier.mann_whitney_u)."""
    from pytrousse_spark.operators.classifier import mann_whitney_u

    ev = _t(spark, sf_dir, "events")
    return mann_whitney_u(ev, "event_type", "value", "click", "purchase")


def _sql_q297() -> str:
    from pytrousse_spark.operators.classifier import mann_whitney_u_sql

    return mann_whitney_u_sql(
        "events", "event_type", "value", "click", "purchase"
    )


def q298_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F across ALL FIVE event types' order values —
    integer-cent group moments in one map-side agg (sum of squares in
    DECIMAL(38)), then the F and eta-squared as single double
    expressions (operators/classifier.anova_oneway); q299 gates its
    equal-variance assumption on the same frame."""
    from pytrousse_spark.operators.classifier import anova_oneway

    ev = _t(spark, sf_dir, "events")
    return anova_oneway(ev, "event_type", "value")


def _sql_q298() -> str:
    from pytrousse_spark.operators.classifier import anova_oneway_sql

    return anova_oneway_sql("events", "event_type", "value")


def q299_bartlett(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's variance-homogeneity chi2 over the SAME five event-
    type groups as q298 — the assumption check in front of ANOVA,
    from the identical integer-cent moment frame
    (operators/classifier.bartlett_test)."""
    from pytrousse_spark.operators.classifier import bartlett_test

    ev = _t(spark, sf_dir, "events")
    return bartlett_test(ev, "event_type", "value")


def _sql_q299() -> str:
    from pytrousse_spark.operators.classifier import bartlett_test_sql

    return bartlett_test_sql("events", "event_type", "value")


def q300_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa over THREE deterministic English-detection raters
    (q294's classifier panel re-cast as annotators) each rating every
    document en/other — the fixed-rater-count agreement statistic
    completing the trio: Cohen (q272, 2 raters), Fleiss (fixed r),
    Krippendorff (q292, variable r)
    (operators/classifier.fleiss_kappa)."""
    from pytrousse_spark.functions import text as tx
    from pytrousse_spark.operators.classifier import fleiss_kappa

    d = _t(spark, sf_dir, "documents")
    pad = F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" "))
    preds = [
        (tx.lang_id(F.col("text")) == "en"),
        (F.instr(pad, " the ") > 0),
        (
            F.length(F.regexp_replace(F.col("text"), r"[\x00-\x7F]", ""))
            * 50
            < F.length(F.col("text"))
        ),
    ]
    # ONE corpus scan (not one per rater): all three ratings compute in
    # a single projection and explode to the long frame
    ratings = d.select(
        F.col("doc_id").alias("unit"),
        F.explode(
            F.array(
                *[F.when(p, "en").otherwise("other") for p in preds]
            )
        ).alias("rating"),
    )
    return fleiss_kappa(ratings, "unit", "rating", raters=3)


def _sql_q300() -> str:
    from pytrousse_spark.functions.text import lang_id_sql
    from pytrousse_spark.operators.classifier import fleiss_kappa_sql

    preds = [
        f"(({lang_id_sql('text')}) = 'en')",
        "(position(' the ' IN ' ' || lower(text) || ' ') > 0)",
        "(length(regexp_replace(text, '[\\x00-\\x7F]', '', 'g')) * 50"
        " < length(text))",
    ]
    parts = " UNION ALL ".join(
        f"SELECT doc_id AS unit, CASE WHEN {p} THEN 'en' ELSE 'other' END"
        f" AS rating FROM documents"
        for p in preds
    )
    return fleiss_kappa_sql(f"({parts})", "unit", "rating", raters=3)


def q301_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend test: does the English share of the
    corpus TREND with document size? — scores = 128-char size buckets
    (capped at 4), outcome = labeled lang = 'en'; one score-level agg,
    exact integer folds (operators/classifier.cochran_armitage_trend)."""
    from pytrousse_spark.operators.classifier import cochran_armitage_trend

    d = _t(spark, sf_dir, "documents")
    return cochran_armitage_trend(
        d,
        F.least(F.floor(F.col("n_chars") / 128), F.lit(4)),
        (F.col("lang") == "en"),
    )


def _sql_q301() -> str:
    from pytrousse_spark.operators.classifier import (
        cochran_armitage_trend_sql,
    )

    return cochran_armitage_trend_sql(
        "documents",
        "least(CAST(floor(n_chars / 128) AS BIGINT), 4)",
        "(lang = 'en')",
    )


def q302_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson lag-1 autocorrelation pooled over per-user event
    value series (ordered by ts with event_id tie-break — deterministic
    lag): the mean cancels in the difference numerator, so the whole
    statistic is exact integer-cent arithmetic — per-key lag windows,
    one moment agg, one division
    (operators/timeseries.durbin_watson)."""
    from pytrousse_spark.operators.timeseries import durbin_watson

    ev = _t(spark, sf_dir, "events")
    return durbin_watson(ev, "user_id", "ts", "value", "event_id")


def _sql_q302() -> str:
    from pytrousse_spark.operators.timeseries import durbin_watson_sql

    return durbin_watson_sql("events", "user_id", "ts", "value", "event_id")


def q303_mrr_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR@10 of the q242 BM25 engine on the q269 harness (same three
    fixed queries, same conjunctive containment relevance oracle) —
    the first-hit retrieval metric beside q269's NDCG: 1/rank folds in
    integer micro-units (operators/classifier.mrr_at_k)."""
    from pytrousse_spark.functions.text import bm25_search, tokens
    from pytrousse_spark.operators.classifier import mrr_at_k

    d = _t(spark, sf_dir, "documents")
    staged = d.select(
        "doc_id", tokens(F.col("text")).alias("__tk")
    ).localCheckpoint(eager=False)  # one tokenize for all 3 oracles
    rank_parts, rel_parts = [], []
    for qname, terms in _Q269_QUERIES.items():
        w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        rank_parts.append(
            bm25_search(d, "text", "doc_id", terms, k=10).select(
                F.lit(qname).alias("query"),
                "doc_id",
                F.row_number().over(w).cast("int").alias("rank"),
            )
        )
        cond = F.lit(True)
        for t in terms:
            cond = cond & F.array_contains(F.col("__tk"), t)
        rel_parts.append(
            staged.where(cond).select(F.lit(qname).alias("query"), "doc_id")
        )
    ranking = rank_parts[0]
    for p in rank_parts[1:]:
        ranking = ranking.unionByName(p)
    relevance = rel_parts[0]
    for p in rel_parts[1:]:
        relevance = relevance.unionByName(p)
    return mrr_at_k(ranking, relevance, k=10)


def _sql_q303() -> str:
    from pytrousse_spark.functions.text import bm25_search_sql, tokens_sql
    from pytrousse_spark.operators.classifier import mrr_at_k_sql

    tk = tokens_sql("text")
    rank_parts, rel_parts = [], []
    for qname, terms in _Q269_QUERIES.items():
        inner = bm25_search_sql("documents", "text", "doc_id", terms, k=10)
        rank_parts.append(
            f"""SELECT '{qname}' AS "query", doc_id,
                CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC)
                     AS INTEGER) AS rank
                FROM ({inner})"""
        )
        conds = " AND ".join(f"list_contains({tk}, '{t}')" for t in terms)
        rel_parts.append(
            f"""SELECT '{qname}' AS "query", doc_id
                FROM documents WHERE {conds}"""
        )
    ranking = " UNION ALL ".join(rank_parts)
    relevance = " UNION ALL ".join(rel_parts)
    return mrr_at_k_sql(ranking, relevance, k=10)


def q295_png_rgb48_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL 16-BIT TRUECOLOR PNG codec round trip (r9 VERDICT item 8's
    named gap — 16-bit COLOR was the grid's last metadata-only depth
    cell): each document id becomes a genuine bit-depth-16 color-type-2
    PNG (6-byte pixels, big-endian samples, filters cycling all five
    types with a/c neighbors one 6-byte PIXEL left — multi-byte samples
    COMPOSED with multi-channel pixels), decoded back by the same
    chunk-walk path; both the plain and the position-weighted checksum
    must equal the oracle's closed form over
    (id*131 + 257x + 263y + 4099c) mod 65536
    (operators/multimodal.py: encode_png_rgb48 / decode_png)."""
    from pytrousse_spark.operators.multimodal import (
        decode_png_meta_weighted,
        synthesize_png_rgb48_column,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id").orderBy("doc_id").limit(150)
    media = synthesize_png_rgb48_column(d, "doc_id", width=12, height=10)
    return decode_png_meta_weighted(media, "media", "doc_id")


def _sql_q295() -> str:
    return """
    SELECT doc_id,
           CAST(12 AS INT) AS width,
           CAST(10 AS INT) AS height,
           CAST(16 AS INT) AS bit_depth,
           CAST(2 AS INT) AS color_type,
           CAST((SELECT SUM((doc_id * 131 + 257 * x.i + 263 * y.j
                             + 4099 * c.k) % 65536)
                 FROM generate_series(0, 11) AS x(i),
                      generate_series(0, 9) AS y(j),
                      generate_series(0, 2) AS c(k)) AS BIGINT)
               AS pixel_sum,
           CAST((SELECT SUM(((doc_id * 131 + 257 * x.i + 263 * y.j
                              + 4099 * c.k) % 65536)
                            * ((y.j * 12 + x.i) * 3 + c.k + 1))
                 FROM generate_series(0, 11) AS x(i),
                      generate_series(0, 9) AS y(j),
                      generate_series(0, 2) AS c(k)) AS BIGINT)
               AS pos_weighted_sum
    FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 150)
    """


def q296_png_graya_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GRAYSCALE+ALPHA PNG codec round trip (color type 4 — the
    last 8-bit color type the decodable grid lacked): each document id
    becomes a genuine 2-byte-per-pixel gray+alpha PNG (a/c filter
    neighbors one 2-byte PIXEL left — same byte offset as q286's
    16-bit gray but for a CHANNEL, not depth, reason, so confusing the
    two layouts corrupts exactly one of the twin gates), decoded by the
    same chunk-walk path; plain + position-weighted checksums against
    the closed form (id*7 + 3x + 5y + 11c) mod 256
    (operators/multimodal.py: encode_png_graya / decode_png)."""
    from pytrousse_spark.operators.multimodal import (
        decode_png_meta_weighted,
        synthesize_png_graya_column,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id").orderBy("doc_id").limit(150)
    media = synthesize_png_graya_column(d, "doc_id", width=16, height=12)
    return decode_png_meta_weighted(media, "media", "doc_id")


def _sql_q296() -> str:
    return """
    SELECT doc_id,
           CAST(16 AS INT) AS width,
           CAST(12 AS INT) AS height,
           CAST(8 AS INT) AS bit_depth,
           CAST(4 AS INT) AS color_type,
           CAST((SELECT SUM((doc_id * 7 + 3 * x.i + 5 * y.j + 11 * c.k)
                            % 256)
                 FROM generate_series(0, 15) AS x(i),
                      generate_series(0, 11) AS y(j),
                      generate_series(0, 1) AS c(k)) AS BIGINT)
               AS pixel_sum,
           CAST((SELECT SUM(((doc_id * 7 + 3 * x.i + 5 * y.j + 11 * c.k)
                             % 256)
                            * ((y.j * 16 + x.i) * 2 + c.k + 1))
                 FROM generate_series(0, 15) AS x(i),
                      generate_series(0, 11) AS y(j),
                      generate_series(0, 1) AS c(k)) AS BIGINT)
               AS pos_weighted_sum
    FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 150)
    """


def q304_png_subbyte_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUB-BYTE GRAYSCALE PNG codec round trip (r10 VERDICT item 2's
    reserved gate — the r10 decode/encode work was pytest-only): bit
    depth cycles 1/2/4 by doc_id%3, interlace alternates
    sequential/Adam7 by doc_id%2, and width 21 leaves every scanline's
    last byte partially filled at all three depths, so pad-bit
    retention, LSB-first unpacking, sample-level (instead of packed-
    byte) unfiltering, or an Adam7 bit-scatter transposition each move
    the position-weighted checksum. Oracle: closed form over
    (id*7 + 3x + 5y) mod 2^depth
    (operators/multimodal.py: encode_png_gray_packed / decode_png /
    _deinterlace_adam7_subbyte)."""
    from pytrousse_spark.operators.multimodal import (
        decode_png_meta_weighted,
        synthesize_png_subbyte_column,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id").orderBy("doc_id").limit(150)
    media = synthesize_png_subbyte_column(d, "doc_id", width=21, height=14)
    return decode_png_meta_weighted(media, "media", "doc_id")


def _sql_q304() -> str:
    return """
    SELECT doc_id,
           CAST(21 AS INT) AS width,
           CAST(14 AS INT) AS height,
           CAST(d AS INT) AS bit_depth,
           CAST(0 AS INT) AS color_type,
           CAST((SELECT SUM((doc_id * 7 + 3 * x.i + 5 * y.j) % (1 << d))
                 FROM generate_series(0, 20) AS x(i),
                      generate_series(0, 13) AS y(j)) AS BIGINT)
               AS pixel_sum,
           CAST((SELECT SUM(((doc_id * 7 + 3 * x.i + 5 * y.j) % (1 << d))
                            * (y.j * 21 + x.i + 1))
                 FROM generate_series(0, 20) AS x(i),
                      generate_series(0, 13) AS y(j)) AS BIGINT)
               AS pos_weighted_sum
    FROM (SELECT doc_id,
                 CASE CAST(doc_id % 3 AS INT)
                      WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END AS d
          FROM documents ORDER BY doc_id LIMIT 150)
    """


def q305_png_palette_subbyte_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SUB-BYTE PALETTED PNG codec round trip (color type 3 at depths
    1/2/4 — the GIF-era indexed layouts): packed palette INDICES
    unfilter at 1 byte/pixel, unpack MSB-first, then map through a
    2^depth-entry PLTE to flat RGB; interlace alternates by doc_id%2.
    The oracle composes the index formula (id*7 + 3x + 5y) mod 2^depth
    through the deterministic palette formula (i*37 + 11c + 5) mod 256,
    so an index/entry transposition, a truncated PLTE, or unpacking
    drift all move both checksums
    (operators/multimodal.py: encode_png_palette_packed / decode_png)."""
    from pytrousse_spark.operators.multimodal import (
        decode_png_meta_weighted,
        synthesize_png_palette_subbyte_column,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id").orderBy("doc_id").limit(150)
    media = synthesize_png_palette_subbyte_column(d, "doc_id", width=21, height=14)
    return decode_png_meta_weighted(media, "media", "doc_id")


def _sql_q305() -> str:
    return """
    SELECT doc_id,
           CAST(21 AS INT) AS width,
           CAST(14 AS INT) AS height,
           CAST(d AS INT) AS bit_depth,
           CAST(3 AS INT) AS color_type,
           CAST((SELECT SUM((((doc_id * 7 + 3 * x.i + 5 * y.j) % (1 << d))
                             * 37 + 11 * c.k + 5) % 256)
                 FROM generate_series(0, 20) AS x(i),
                      generate_series(0, 13) AS y(j),
                      generate_series(0, 2) AS c(k)) AS BIGINT)
               AS pixel_sum,
           CAST((SELECT SUM(((((doc_id * 7 + 3 * x.i + 5 * y.j) % (1 << d))
                              * 37 + 11 * c.k + 5) % 256)
                            * ((y.j * 21 + x.i) * 3 + c.k + 1))
                 FROM generate_series(0, 20) AS x(i),
                      generate_series(0, 13) AS y(j),
                      generate_series(0, 2) AS c(k)) AS BIGINT)
               AS pos_weighted_sum
    FROM (SELECT doc_id,
                 CASE CAST(doc_id % 3 AS INT)
                      WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END AS d
          FROM documents ORDER BY doc_id LIMIT 150)
    """


def _paired_user_avgs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user paired frame for q306: x = the user's average click
    value, y = average purchase value, both derived as exact integer-
    cent folds (sum of cents / count, rounded once) so the Spark and
    DuckDB sides round identically — a raw double avg would be
    fold-order-nondeterministic between engines."""
    ev = _t(spark, sf_dir, "events")
    c = F.round(F.col("value").cast("double") * 100, 0).cast("bigint")

    def _avg(t: str):
        s = F.sum(F.when(F.col("event_type") == t, F.col("__c")))
        n = F.count(F.when(F.col("event_type") == t, 1))
        return F.round(s.cast("double") / n.cast("double"), 0) / F.lit(100.0)

    return (
        ev.where(
            F.col("value").isNotNull()
            & F.col("event_type").isin("click", "purchase")
        )
        .select("user_id", "event_type", c.alias("__c"))
        .groupBy("user_id")
        .agg(_avg("click").alias("x"), _avg("purchase").alias("y"))
        .where(F.col("x").isNotNull() & F.col("y").isNotNull())
    )


_SQL_PAIRED_USER_AVGS = """
    SELECT user_id,
           round(CAST(sum(CASE WHEN event_type = 'click' THEN c END)
                      AS DOUBLE)
                 / CAST(count(CASE WHEN event_type = 'click' THEN 1 END)
                        AS DOUBLE), 0) / 100.0 AS x,
           round(CAST(sum(CASE WHEN event_type = 'purchase' THEN c END)
                      AS DOUBLE)
                 / CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END)
                        AS DOUBLE), 0) / 100.0 AS y
    FROM (SELECT user_id, event_type,
                 CAST(round(CAST(value AS DOUBLE) * 100, 0) AS BIGINT) AS c
          FROM events
          WHERE value IS NOT NULL AND event_type IN ('click', 'purchase'))
    GROUP BY user_id
    HAVING x IS NOT NULL AND y IS NOT NULL
"""


def q306_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank over PAIRED per-user click vs purchase
    average order values — the within-subject companion of q297's
    Mann-Whitney (which treats the groups as independent): does the
    typical user's click-vs-purchase value difference center on zero?
    Zero differences drop, |d| ties take average ranks via the bounded
    prefix hierarchy, tie-corrected z
    (operators/classifier.wilcoxon_signed_rank)."""
    from pytrousse_spark.operators.classifier import wilcoxon_signed_rank

    return wilcoxon_signed_rank(_paired_user_avgs(spark, sf_dir), "x", "y")


def _sql_q306() -> str:
    from pytrousse_spark.operators.classifier import wilcoxon_signed_rank_sql

    return wilcoxon_signed_rank_sql(
        f"({_SQL_PAIRED_USER_AVGS}) AS pairs", "x", "y"
    )


def q307_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test across three paired 'treatments' — each user's
    average click / view / purchase value, complete blocks only (users
    observed under all three) — the continuous-response complement of
    q294's Cochran Q: within-user ranking (k-bounded window
    partitions), doubled-rank exact integer folds, Conover tie
    correction (operators/classifier.friedman_test)."""
    from pytrousse_spark.operators.classifier import friedman_test

    ev = _t(spark, sf_dir, "events")
    c = F.round(F.col("value").cast("double") * 100, 0).cast("bigint")
    per = (
        ev.where(
            F.col("value").isNotNull()
            & F.col("event_type").isin("click", "view", "purchase")
        )
        .select("user_id", "event_type", c.alias("__c"))
        .groupBy("user_id", "event_type")
        .agg(
            (
                F.round(
                    F.sum("__c").cast("double")
                    / F.count(F.lit(1)).cast("double"),
                    0,
                )
                / F.lit(100.0)
            ).alias("v")
        )
    )
    return friedman_test(per, "user_id", "event_type", "v")


def _sql_q307() -> str:
    from pytrousse_spark.operators.classifier import friedman_test_sql

    per = """
    SELECT user_id, event_type,
           round(CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE), 0)
               / 100.0 AS v
    FROM (SELECT user_id, event_type,
                 CAST(round(CAST(value AS DOUBLE) * 100, 0) AS BIGINT) AS c
          FROM events
          WHERE value IS NOT NULL
                AND event_type IN ('click', 'view', 'purchase'))
    GROUP BY user_id, event_type
    """
    return friedman_test_sql(f"({per}) AS per", "user_id", "event_type", "v")


def q309_cramer_von_mises(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér-von Mises drift criterion between early- and
    late-January purchase values — the INTEGRAL-squared ECDF distance
    on q186's exact frame (KS reacts to the worst single gap; CvM
    accumulates every gap, the body-wide mix-drift signal): pooled
    cent-level frame, cumulatives from the bounded prefix hierarchy,
    per-level pico-unit rounding into a DECIMAL(38) order-free fold
    (profiling.cramer_von_mises)."""
    from pytrousse_spark.profiling import cramer_von_mises

    ev = _t(spark, sf_dir, "events")
    pur = ev.where(F.col("event_type") == "purchase")
    return cramer_von_mises(
        pur.where(F.col("ts") < "2024-01-16"),
        pur.where(F.col("ts") >= "2024-01-16"),
        "value",
    )


def _sql_q309() -> str:
    from pytrousse_spark.profiling import cramer_von_mises_sql

    return cramer_von_mises_sql(
        "SELECT * FROM events WHERE event_type = 'purchase'"
        " AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16'",
        "SELECT * FROM events WHERE event_type = 'purchase'"
        " AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-16'",
        "value",
    )


def q310_wasserstein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1-D Wasserstein-1 (earth mover's) distance between early-
    and late-January purchase values — completing q186/q309's drift
    trio with the AREA between the ECDFs in dollars (the number a mix
    rebalancing is judged by): adjacency from the hierarchical bounded
    lead (operators/_prefix.next_level), cumulatives from the bounded
    prefix hierarchy, per-level micro-unit rounding into a DECIMAL(38)
    order-free fold (profiling.wasserstein_1d)."""
    from pytrousse_spark.profiling import wasserstein_1d

    ev = _t(spark, sf_dir, "events")
    pur = ev.where(F.col("event_type") == "purchase")
    return wasserstein_1d(
        pur.where(F.col("ts") < "2024-01-16"),
        pur.where(F.col("ts") >= "2024-01-16"),
        "value",
    )


def _sql_q310() -> str:
    from pytrousse_spark.profiling import wasserstein_1d_sql

    return wasserstein_1d_sql(
        "SELECT * FROM events WHERE event_type = 'purchase'"
        " AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16'",
        "SELECT * FROM events WHERE event_type = 'purchase'"
        " AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-16'",
        "value",
    )


def q311_drift_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group drift REPORT (the r11 backlog's mixture-rebalancing
    table): all six distribution distances — KS sup-gap, Kuiper
    V = D+ + D-, Cramér-von Mises squared-gap mass, tail-weighted
    Anderson-Darling, exact Wasserstein-1 area, energy distance —
    between early- and late-January event values, PER event type, in
    one plan sharing one pooled (group, cent-level) frame, one
    GROUPED bounded-prefix pass and one grouped bounded-lead pass
    (operators/_prefix.py with group_cols threaded through every
    tier; profiling.drift_by_group)."""
    from pytrousse_spark.profiling import drift_by_group

    ev = _t(spark, sf_dir, "events")
    return drift_by_group(
        ev.where(F.col("ts") < "2024-01-16"),
        ev.where(F.col("ts") >= "2024-01-16"),
        "value",
        "event_type",
    )


def _sql_q311() -> str:
    from pytrousse_spark.profiling import drift_by_group_sql

    return drift_by_group_sql(
        "SELECT * FROM events"
        " WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16'",
        "SELECT * FROM events"
        " WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-16'",
        "value",
        "event_type",
    )


def q314_anderson_darling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Anderson-Darling drift criterion between early- and
    late-January purchase values — the TAIL-WEIGHTED member of the
    q186/q309/q310 drift family (each ECDF gap divided by B(N-B), so
    contamination/truncation drift out in the tails moves it first):
    tie-adjusted Scholz-Stephens 1987 eq. 7 at k=2 over the pooled
    cent-level frame, mid-rank halves carried as DOUBLED exact
    integers, bounded-prefix cumulatives, per-level pico-unit rounding
    into a DECIMAL(38) order-free fold
    (profiling.anderson_darling_2s)."""
    from pytrousse_spark.profiling import anderson_darling_2s

    ev = _t(spark, sf_dir, "events")
    pur = ev.where(F.col("event_type") == "purchase")
    return anderson_darling_2s(
        pur.where(F.col("ts") < "2024-01-16"),
        pur.where(F.col("ts") >= "2024-01-16"),
        "value",
    )


def _sql_q314() -> str:
    from pytrousse_spark.profiling import anderson_darling_2s_sql

    return anderson_darling_2s_sql(
        "SELECT * FROM events WHERE event_type = 'purchase'"
        " AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16'",
        "SELECT * FROM events WHERE event_type = 'purchase'"
        " AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-16'",
        "value",
    )


def q315_energy_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1-D energy distance (Székely-Rizzo) between early- and
    late-January purchase values — the kernel-free distance whose
    multivariate form backs the embedding MMD gate (q285), here in its
    exact ECDF form 2*∫(F_a-F_b)² dx on the q310 level frame: one
    route decision, hierarchical bounded lead for adjacency, bounded
    prefix cumulatives, micro-unit DECIMAL(38) fold; T = n_a*n_b/N*D²
    (profiling.energy_distance)."""
    from pytrousse_spark.profiling import energy_distance

    ev = _t(spark, sf_dir, "events")
    pur = ev.where(F.col("event_type") == "purchase")
    return energy_distance(
        pur.where(F.col("ts") < "2024-01-16"),
        pur.where(F.col("ts") >= "2024-01-16"),
        "value",
    )


def _sql_q315() -> str:
    from pytrousse_spark.profiling import energy_distance_sql

    return energy_distance_sql(
        "SELECT * FROM events WHERE event_type = 'purchase'"
        " AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16'",
        "SELECT * FROM events WHERE event_type = 'purchase'"
        " AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-16'",
        "value",
    )


def q316_grouped_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group Mann-Whitney U + Cliff's delta between early- and
    late-January event values, PER event type — the SIGNIFICANCE
    companion of q311's distance report (did each group's location
    shift clear noise, and by what effect size): one plan for all
    groups on the pooled (group, cent-level) frame, grouped bounded
    prefix cumulatives, exact DECIMAL(38,0) win/tie folds
    (operators/classifier.mann_whitney_by_group)."""
    from pytrousse_spark.operators.classifier import mann_whitney_by_group

    ev = _t(spark, sf_dir, "events")
    return mann_whitney_by_group(
        ev.where(F.col("ts") < "2024-01-16"),
        ev.where(F.col("ts") >= "2024-01-16"),
        "value",
        "event_type",
    )


def _sql_q316() -> str:
    from pytrousse_spark.operators.classifier import (
        mann_whitney_by_group_sql,
    )

    return mann_whitney_by_group_sql(
        "SELECT * FROM events"
        " WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16'",
        "SELECT * FROM events"
        " WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-16'",
        "value",
        "event_type",
    )


def q317_kuiper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kuiper test between early- and late-January purchase
    values — the cyclic-safe KS sibling (V = D+ + D-, equal power
    across the support; the phase/hour-of-day drift detector KS's
    median-concentrated power misses): exact pooled cent-level frame,
    bounded-prefix cumulatives, nano-unit Kuiper-series fold with the
    lam<0.4 clamp (profiling.kuiper_two_sample)."""
    from pytrousse_spark.profiling import kuiper_two_sample

    ev = _t(spark, sf_dir, "events")
    pur = ev.where(F.col("event_type") == "purchase")
    return kuiper_two_sample(
        pur.where(F.col("ts") < "2024-01-16"),
        pur.where(F.col("ts") >= "2024-01-16"),
        "value",
    )


def _sql_q317() -> str:
    from pytrousse_spark.profiling import kuiper_two_sample_sql

    return kuiper_two_sample_sql(
        "SELECT * FROM events WHERE event_type = 'purchase'"
        " AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16'",
        "SELECT * FROM events WHERE event_type = 'purchase'"
        " AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-16'",
        "value",
    )


def q313_repeated_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Siegel repeated-median robust daily trend of event value — the
    50%-breakdown upgrade of q251's Theil-Sen AND its scale fix (the
    r11 backlog's last calendar-quadratic): the inner medians run in
    windows PARTITIONED BY day (exactly T-1 rows each), so no O(T^2)
    global sort remains — the only global sort is over the T per-day
    medians (operators/timeseries.repeated_median_trend)."""
    from pytrousse_spark.operators.timeseries import repeated_median_trend

    ev = _t(spark, sf_dir, "events")
    return repeated_median_trend(ev, "ts", "value")


def _sql_q313() -> str:
    from pytrousse_spark.operators.timeseries import (
        repeated_median_trend_sql,
    )

    return repeated_median_trend_sql("SELECT * FROM events", "ts", "value")


def q312_grouped_wasserstein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SOURCE exact Wasserstein-1 drift of document lengths between
    English and non-English docs — the standalone grouped-W1 operator
    (profiling.wasserstein_1d_by_group) on a DIFFERENT table/grouping
    than q311's report: group keys ride the grouped bounded-prefix
    helpers, per-group totals attach by keyed join, and a group empty
    on either side yields NULL w1 (sources with no non-English docs
    exercise that path at sf0.01)."""
    from pytrousse_spark.profiling import wasserstein_1d_by_group

    docs = _t(spark, sf_dir, "documents")
    return wasserstein_1d_by_group(
        docs.where(F.col("lang") == "en"),
        docs.where(F.col("lang") != "en"),
        "n_chars",
        "source",
    )


def _sql_q312() -> str:
    from pytrousse_spark.profiling import wasserstein_1d_by_group_sql

    return wasserstein_1d_by_group_sql(
        "SELECT * FROM documents WHERE lang = 'en'",
        "SELECT * FROM documents WHERE lang <> 'en'",
        "n_chars",
        "source",
    )


def q308_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe robust variance-homogeneity F over the SAME five
    event-type groups as q298/q299 — Levene's test with median centers,
    the heavy-tail-robust alternative to q299's Bartlett: exact
    per-group medians from the (group, cent-level) frame (no per-group
    value buffering), half-cent integer deviations, ANOVA-recipe folds
    (operators/classifier.brown_forsythe)."""
    from pytrousse_spark.operators.classifier import brown_forsythe

    ev = _t(spark, sf_dir, "events")
    return brown_forsythe(ev, "event_type", "value")


def _sql_q308() -> str:
    from pytrousse_spark.operators.classifier import brown_forsythe_sql

    return brown_forsythe_sql("events", "event_type", "value")


def q290_png_adam7_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADAM7-INTERLACED PNG codec round trip (r8 VERDICT item 8's
    second half): each document id becomes a genuine interlace-
    method-1 grayscale PNG — seven progressive passes, each an
    independent sub-image with its own filter bytes and prior line —
    decoded by scattering every pass back to (x0 + k·dx, y0 + r·dy).
    The oracle checks BOTH the plain pixel sum AND a position-WEIGHTED
    checksum sum(P·(y·w + x + 1)): a scatter bug that merely permutes
    pixels passes the former and fails the latter
    (operators/multimodal.py: encode_png_gray_adam7 /
    _deinterlace_adam7 / decode_png_meta_weighted)."""
    from pytrousse_spark.operators.multimodal import (
        decode_png_meta_weighted,
        synthesize_png_adam7_column,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id").orderBy("doc_id").limit(150)
    media = synthesize_png_adam7_column(d, "doc_id", width=24, height=16)
    return decode_png_meta_weighted(media, "media", "doc_id")


def _sql_q290() -> str:
    return """
    SELECT doc_id,
           CAST(24 AS INT) AS width,
           CAST(16 AS INT) AS height,
           CAST(8 AS INT) AS bit_depth,
           CAST(0 AS INT) AS color_type,
           CAST((SELECT SUM((doc_id * 7 + 3 * x.i + 5 * y.j) % 256)
                 FROM generate_series(0, 23) AS x(i),
                      generate_series(0, 15) AS y(j)) AS BIGINT)
               AS pixel_sum,
           CAST((SELECT SUM(((doc_id * 7 + 3 * x.i + 5 * y.j) % 256)
                            * (y.j * 24 + x.i + 1))
                 FROM generate_series(0, 23) AS x(i),
                      generate_series(0, 15) AS y(j)) AS BIGINT)
               AS pos_weighted_sum
    FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 150)
    """


# ===========================================================================
# driver contract
# ===========================================================================
def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q01_pricing_summary(spark, "/root/testdata/sf0.001")


def _row_is_evidence(row: object) -> bool:
    """A CORRECTNESS row counts as driver evidence only if it is GREEN
    (all three matches true, no error) or a weak-but-passing rows-only
    check for a query with no oracle (err == "no_oracle" with a real
    spark row count — the driver's documented fallback for non-SQL-
    expressible ops). RED / errored rows are NOT evidence: round 9's
    q294 failed red, was fixed in round 10, yet its mere presence in
    CORRECTNESS_r09.json made the rotor treat it as round-9-fresh and
    defer re-certification behind ~150 older green rows (VERDICT r10
    item 1). A failed check proves the query needs re-checking, not
    that it was checked."""
    if not isinstance(row, dict):
        return False
    if row.get("err") == "no_oracle":
        return row.get("spark_rows") is not None
    return (
        not row.get("err")
        and row.get("rows_match") is True
        and row.get("schema_match") is True
        and row.get("hash_match") is True
    )


def _evidence_rounds(here: str | None = None) -> dict[str, int]:
    """Newest GREEN driver-evidence round per query name, read from the
    CORRECTNESS_r*.json files the driver writes next to this file.
    Rows failing `_row_is_evidence` are skipped entirely, so a query
    whose only driver rows are red sorts as never-checked (head of the
    rotation queue)."""
    import glob as _glob
    import json as _json
    import re as _re

    newest: dict[str, int] = {}
    if here is None:
        here = os.path.dirname(os.path.abspath(__file__))
    for path in _glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = _re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                data = _json.load(fh)
        except (ValueError, OSError):
            continue
        for name, row in data.items():
            if not _row_is_evidence(row):
                continue
            newest[name] = max(newest.get(name, 0), rnd)
    return newest


def _freshness_rotate(
    base: dict[str, Callable[[SparkSession, str], DataFrame]],
) -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Self-rotating registry head (round-8 fix for VERDICT r7 item 1):
    the driver's correctness battery consumes the FIRST 50 entries, so
    the registry must lead with every never-driver-checked query (in
    base registration order), then all checked queries strictly
    ascending by their newest evidence round (ties keep base order).
    Rounds 6 and 7 both hand-rotated this head and both times the
    freshness tests went red after the driver's JSON landed; computing
    the order from the evidence history at call time makes staleness
    structurally impossible."""
    newest = _evidence_rounds()
    pos = {n: i for i, n in enumerate(base)}
    order = sorted(base, key=lambda n: (newest.get(n, 0), pos[n]))
    return {n: base[n] for n in order}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry of every implemented query/operator (SURVEY.md §2 plus
    the beyond-reference LLM-pipeline families). Iteration order is the
    driver's check order and is computed by `_freshness_rotate`:
    never-checked gates first, then oldest driver evidence first, so
    the 50-row driver budget always lands on the least-certified slots.
    Every entry, head or tail, runs the identical type-faithful
    DuckDB-parity check in tests/test_oracle_parity.py regardless of
    driver budget. The literal below keeps the historical (round-7)
    registration order; rotation happens at return time."""
    base: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        # -- head: zero driver evidence (new this round) --------------------
        "q204_acf_ljung_box": q204_acf_ljung_box,
        "q205_pettitt": q205_pettitt,
        "q206_mann_kendall": q206_mann_kendall,
        "q207_loo_target_encoding": q207_loo_target_encoding,
        "q208_woe_iv": q208_woe_iv,
        "q209_lift_gains": q209_lift_gains,
        "q210_eb_shrinkage": q210_eb_shrinkage,
        "q211_fastss_neighbors": q211_fastss_neighbors,
        "q212_fk_orphan_census": q212_fk_orphan_census,
        "q213_readability": q213_readability,
        "q214_cmh": q214_cmh,
        "q215_cluster_quality": q215_cluster_quality,
        "q216_isotonic_calibration": q216_isotonic_calibration,
        "q217_textrank": q217_textrank,
        "q218_cross_correlation": q218_cross_correlation,
        "q219_winsorized_stats": q219_winsorized_stats,
        "q220_kendall_tau": q220_kendall_tau,
        "q221_spearman": q221_spearman,
        "q222_kruskal_wallis": q222_kruskal_wallis,
        "q223_markov_accuracy": q223_markov_accuracy,
        "q224_neyman_sample": q224_neyman_sample,
        "q225_ohlc_bars": q225_ohlc_bars,
        "q226_ipw_ate": q226_ipw_ate,
        "q227_daily_rate_wilson": q227_daily_rate_wilson,
        "q228_cohort_ltv": q228_cohort_ltv,
        "q229_numeric_mi": q229_numeric_mi,
        "q230_lsh_planner": q230_lsh_planner,
        "q231_wasserstein": q231_wasserstein,
        "q232_seasonal_strength": q232_seasonal_strength,
        "q233_embedding_drift": q233_embedding_drift,
        "q234_activity_streaks": q234_activity_streaks,
        "q235_peak_concurrency": q235_peak_concurrency,
        "q236_spatial_radius_join": q236_spatial_radius_join,
        "q237_sequential_patterns": q237_sequential_patterns,
        "q238_markov_attribution": q238_markov_attribution,
        "q239_granger_lead_lag": q239_granger_lead_lag,
        "q240_k_core": q240_k_core,
        "q241_shapley_attribution": q241_shapley_attribution,
        "q242_bm25_search": q242_bm25_search,
        "q243_poisson_rate_ratio": q243_poisson_rate_ratio,
        "q244_km_greenwood": q244_km_greenwood,
        "q245_item_item_cf": q245_item_item_cf,
        "q246_aipw_ate": q246_aipw_ate,
        "q247_uplift_qini": q247_uplift_qini,
        "q248_burstiness": q248_burstiness,
        "q249_gesd_outliers": q249_gesd_outliers,
        "q250_label_propagation": q250_label_propagation,
        "q251_theil_sen": q251_theil_sen,
        "q252_skipgram_pairs": q252_skipgram_pairs,
        "q253_distance_correlation": q253_distance_correlation,
        "q254_unicode_census": q254_unicode_census,
        "q255_huber_trend": q255_huber_trend,
        "q256_gumbel_maxima": q256_gumbel_maxima,
        "q257_triple_sequences": q257_triple_sequences,
        "q258_skipgram_negatives": q258_skipgram_negatives,
        "q259_regression_discontinuity": q259_regression_discontinuity,
        "q260_rake_weights": q260_rake_weights,
        "q261_vocab_richness": q261_vocab_richness,
        "q262_fairness_census": q262_fairness_census,
        "q263_markov_entropy": q263_markov_entropy,
        "q264_qte": q264_qte,
        "q265_optimal_threshold": q265_optimal_threshold,
        "q266_sequential_ab": q266_sequential_ab,
        "q267_source_vocab_overlap": q267_source_vocab_overlap,
        "q268_log_odds_tokens": q268_log_odds_tokens,
        "q269_ndcg_bm25": q269_ndcg_bm25,
        "q270_minhash_calibration": q270_minhash_calibration,
        "q271_brier_decomposition": q271_brier_decomposition,
        "q272_cohens_kappa": q272_cohens_kappa,
        "q273_theil_index": q273_theil_index,
        "q274_unicode_census_streamed": q274_unicode_census_streamed,
        "q275_png_palette_roundtrip": q275_png_palette_roundtrip,
        "q276_png_rgba_roundtrip": q276_png_rgba_roundtrip,
        "q277_dirichlet_ql_search": q277_dirichlet_ql_search,
        "q278_embedding_isotropy": q278_embedding_isotropy,
        "q279_propensity_matching": q279_propensity_matching,
        "q280_bradley_terry": q280_bradley_terry,
        "q281_adamic_adar": q281_adamic_adar,
        "q282_aalen_johansen": q282_aalen_johansen,
        "q283_group_jackknife": q283_group_jackknife,
        "q284_ohlc_streamed": q284_ohlc_streamed,
        "q285_embedding_mmd": q285_embedding_mmd,
        "q286_png_gray16_roundtrip": q286_png_gray16_roundtrip,
        "q287_hits": q287_hits,
        "q288_mcnemar": q288_mcnemar,
        "q289_conformal": q289_conformal,
        "q290_png_adam7_roundtrip": q290_png_adam7_roundtrip,
        "q291_rrf_fusion": q291_rrf_fusion,
        "q292_krippendorff_alpha": q292_krippendorff_alpha,
        "q293_tost_equivalence": q293_tost_equivalence,
        "q294_cochran_q": q294_cochran_q,
        "q295_png_rgb48_roundtrip": q295_png_rgb48_roundtrip,
        "q296_png_graya_roundtrip": q296_png_graya_roundtrip,
        "q304_png_subbyte_roundtrip": q304_png_subbyte_roundtrip,
        "q305_png_palette_subbyte_roundtrip": q305_png_palette_subbyte_roundtrip,
        "q306_wilcoxon_signed_rank": q306_wilcoxon_signed_rank,
        "q307_friedman": q307_friedman,
        "q308_brown_forsythe": q308_brown_forsythe,
        "q309_cramer_von_mises": q309_cramer_von_mises,
        "q310_wasserstein": q310_wasserstein,
        "q311_drift_by_group": q311_drift_by_group,
        "q312_grouped_wasserstein": q312_grouped_wasserstein,
        "q313_repeated_median": q313_repeated_median,
        "q314_anderson_darling": q314_anderson_darling,
        "q315_energy_distance": q315_energy_distance,
        "q316_grouped_mann_whitney": q316_grouped_mann_whitney,
        "q317_kuiper": q317_kuiper,
        "q297_mann_whitney": q297_mann_whitney,
        "q298_anova_f": q298_anova_f,
        "q299_bartlett": q299_bartlett,
        "q300_fleiss_kappa": q300_fleiss_kappa,
        "q301_cochran_armitage": q301_cochran_armitage,
        "q302_durbin_watson": q302_durbin_watson,
        "q303_mrr_bm25": q303_mrr_bm25,
        # -- head: r2 evidence (q54 missed the r6 50-budget at slot 51) --
        "q54_near_dedup_pairs": q54_near_dedup_pairs,
        # -- head: oldest r3 evidence, registry order (fills the 50) -------
        "q01_pricing_summary": q01_pricing_summary,
        "q10_events_hourly": q10_events_hourly,
        "q11_sessionize": q11_sessionize,
        "q51b_asof_forward": q51b_asof_forward,
        "q55_near_dedup": q55_near_dedup,
        "q56_embedding_neardup_lsh": q56_embedding_neardup_lsh,
        "q57_ivf_topk": q57_ivf_topk,
        "q58_simhash_pairs": q58_simhash_pairs,
        "q59_clean_corpus": q59_clean_corpus,
        "q60_interval_join": q60_interval_join,
        "q61_hash_split": q61_hash_split,
        "q62_group_sample": q62_group_sample,
        "q63_chunk_documents": q63_chunk_documents,
        "q64_contamination": q64_contamination,
        "q65_dup_clusters": q65_dup_clusters,
        "q66_vocabulary": q66_vocabulary,
        "q67_tfidf": q67_tfidf,
        "q69_wav_decode": q69_wav_decode,
        "q70_stream_dedup_batch": q70_stream_dedup_batch,
        "q71_interval_roundtrip": q71_interval_roundtrip,
        "q72_pii_scrub": q72_pii_scrub,
        "q73_repetition": q73_repetition,
        "q74_surprisal": q74_surprisal,
        "q75_cross_dedup": q75_cross_dedup,
        "q76_target_mix": q76_target_mix,
        "q77_dedup_keep_best": q77_dedup_keep_best,
        "q78_kmeans": q78_kmeans,
        "q79_semantic_dedup": q79_semantic_dedup,
        "q80_dup_ngrams": q80_dup_ngrams,
        "q81_dsir": q81_dsir,
        "q82_cluster_cap": q82_cluster_cap,
        "q83_remove_dup_spans": q83_remove_dup_spans,
        "q84_collocations": q84_collocations,
        "q85_rolling_window": q85_rolling_window,
        "q86_quality_tiers": q86_quality_tiers,
        "q87_bloom_contamination": q87_bloom_contamination,
        "q88_count_min": q88_count_min,
        "q89_session_window": q89_session_window,
        "q90_pq_adc": q90_pq_adc,
        "q91_weighted_sample": q91_weighted_sample,
        "q92_salted_join": q92_salted_join,
        "q93_bigram_lm": q93_bigram_lm,
        "q94_stream_enrich_batch": q94_stream_enrich_batch,
        "q95_png_roundtrip": q95_png_roundtrip,
        "q96_zorder": q96_zorder,
        "q97_band_alerts": q97_band_alerts,
        "q98_langid_confusion": q98_langid_confusion,
        "q99_hll_distinct": q99_hll_distinct,
        "q100_histogram_quantiles": q100_histogram_quantiles,
        # -- tail: r4 evidence, oldest-first invariant holds --------------
        "q68_pack_sequences": q68_pack_sequences,
        "q101_ivf_pq": q101_ivf_pq,
        "q102_csv_roundtrip": q102_csv_roundtrip,
        "q103_hll_merge": q103_hll_merge,
        "q104_quantile_bins": q104_quantile_bins,
        "q105_zipf_fit": q105_zipf_fit,
        "q106_snapshot_diff": q106_snapshot_diff,
        "q107_random_projection": q107_random_projection,
        "q108_bucketed_join": q108_bucketed_join,
        "q109_stratified_sample": q109_stratified_sample,
        "q110_gapfill": q110_gapfill,
        "q111_logreg_quality": q111_logreg_quality,
        "q112_prefix_jaccard": q112_prefix_jaccard,
        "q113_cohort_retention": q113_cohort_retention,
        "q114_funnel": q114_funnel,
        "q115_incremental_rollup": q115_incremental_rollup,
        "q116_scd2_history": q116_scd2_history,
        "q117_pagerank": q117_pagerank,
        "q118_pivot": q118_pivot,
        "q119_cumulative_distinct": q119_cumulative_distinct,
        "q120_ewma": q120_ewma,
        "q121_mad_anomalies": q121_mad_anomalies,
        "q122_grouping_sets": q122_grouping_sets,
        "q123_winsorize": q123_winsorize,
        "q124_fuzzy_join": q124_fuzzy_join,
        "q125_hll_trailing": q125_hll_trailing,
        "q126_join_size_estimate": q126_join_size_estimate,
        "q127_grouped_quantiles": q127_grouped_quantiles,
        "q128_time_to_convert": q128_time_to_convert,
        "q129_keyword_search": q129_keyword_search,
        "q130_correlation_matrix": q130_correlation_matrix,
        "q131_ols": q131_ols,
        "q132_association_rules": q132_association_rules,
        "q133_event_transitions": q133_event_transitions,
        "q134_chi2_features": q134_chi2_features,
        "q135_triangles": q135_triangles,
        "q136_hll_overlap": q136_hll_overlap,
        "q137_pareto_frontier": q137_pareto_frontier,
        "q138_expectations": q138_expectations,
        "q139_seasonal_decompose": q139_seasonal_decompose,
        "q140_attribution": q140_attribution,
        "q141_hybrid_search": q141_hybrid_search,
        "q142_psi_drift": q142_psi_drift,
        "q143_stream_join_batch": q143_stream_join_batch,
        "q144_phrase_search": q144_phrase_search,
        "q145_ols_grouped": q145_ols_grouped,
        "q146_session_paths": q146_session_paths,
        "q147_contingency_chi2": q147_contingency_chi2,
        "q148_ab_test": q148_ab_test,
        "q149_gini": q149_gini,
        # -- tail: r5 evidence, oldest-first invariant holds --------------
        "q02_top_revenue_orders": q02_top_revenue_orders,
        "q03_nation_volume": q03_nation_volume,
        "q04_filter_agg": q04_filter_agg,
        "q05_semi_join": q05_semi_join,
        "q06_anti_join": q06_anti_join,
        "q07_window_rank": q07_window_rank,
        "q08_set_ops": q08_set_ops,
        "q09_rollup": q09_rollup,
        "q12_date_functions": q12_date_functions,
        "q13_string_functions": q13_string_functions,
        "q14_distinct_agg": q14_distinct_agg,
        "q15_scalar_subquery": q15_scalar_subquery,
        "q16_percentiles": q16_percentiles,
        "q17_json_extract": q17_json_extract,
        "q18_cube": q18_cube,
        "q21_fillna": q21_fillna,
        "q22_replace_strings": q22_replace_strings,
        "q23_replace_substrings": q23_replace_substrings,
        "q24_onehot": q24_onehot,
        "q25_ordinal": q25_ordinal,
        "q26_binning": q26_binning,
        "q19_pipeline": q19_pipeline,
        "q20_profile": q20_profile,
        "q27_combo_encoding": q27_combo_encoding,
        "q28_group_binning": q28_group_binning,
        "q29_repair": q29_repair,
        "q30_anonymize": q30_anonymize,
        "q31_overlap_bins": q31_overlap_bins,
        "q32_multi_combo": q32_multi_combo,
        "q33_encode_single": q33_encode_single,
        "q34_encode_multi": q34_encode_multi,
        "q150_unordered_funnel": q150_unordered_funnel,
        "q151_benford": q151_benford,
        "q152_js_divergence": q152_js_divergence,
        "q153_rank_transform": q153_rank_transform,
        "q154_sampling_weights": q154_sampling_weights,
        "q155_entropy_profile": q155_entropy_profile,
        "q156_rank_transform_sketch": q156_rank_transform_sketch,
        "q157_rolling_window_scalable": q157_rolling_window_scalable,
        "q158_k_anonymity": q158_k_anonymity,
        "q159_prefix_dups": q159_prefix_dups,
        "q160_calibration": q160_calibration,
        "q161_containment": q161_containment,
        "q162_l_diversity": q162_l_diversity,
        "q163_winnow_overlap": q163_winnow_overlap,
        "q164_bpe_train": q164_bpe_train,
        "q165_quantile_normalize": q165_quantile_normalize,
        "q166_cusum": q166_cusum,
        "q167_linear_attribution": q167_linear_attribution,
        "q168_hill_tail": q168_hill_tail,
        # -- tail: r6 evidence, oldest-first invariant holds --------------
        "q169_dataset_roundtrip": q169_dataset_roundtrip,
        "q170_rank_transform_auto": q170_rank_transform_auto,
        "q171_png_rgb_roundtrip": q171_png_rgb_roundtrip,
        "q172_k_anonymity_enforce": q172_k_anonymity_enforce,
        "q173_t_closeness": q173_t_closeness,
        "q174_dp_counts": q174_dp_counts,
        "q175_auc": q175_auc,
        "q176_record_linkage": q176_record_linkage,
        "q177_linear_attribution_scalable": q177_linear_attribution_scalable,
        "q178_kaplan_meier": q178_kaplan_meier,
        "q179_roc_curve": q179_roc_curve,
        "q180_auc_grouped": q180_auc_grouped,
        "q181_bootstrap_ci": q181_bootstrap_ci,
        "q182_sq8_topk": q182_sq8_topk,
        "q183_conformal": q183_conformal,
        "q184_km_grouped": q184_km_grouped,
        "q185_logrank": q185_logrank,
        "q186_ks_drift": q186_ks_drift,
        "q187_cat_association": q187_cat_association,
        "q188_cuped": q188_cuped,
        "q189_diff_in_diff": q189_diff_in_diff,
        "q190_position_attribution": q190_position_attribution,
        "q191_assortativity": q191_assortativity,
        "q192_pca2": q192_pca2,
        "q193_seasonal_mase": q193_seasonal_mase,
        "q194_position_attribution_scalable": q194_position_attribution_scalable,
        "q195_rfm": q195_rfm,
        "q196_ab_mde": q196_ab_mde,
        "q197_segment_ab_bh": q197_segment_ab_bh,
        "q198_ratio_metric": q198_ratio_metric,
        "q199_rmst": q199_rmst,
        "q200_naive_bayes": q200_naive_bayes,
        "q201_decision_stump": q201_decision_stump,
        "q202_mann_whitney": q202_mann_whitney,
        "q203_heaps_law": q203_heaps_law,
        "q40_dedup_exact": q40_dedup_exact,
        "q41_dup_census": q41_dup_census,
        "q42_minhash": q42_minhash,
        "q43_lsh_pairs": q43_lsh_pairs,
        "q44_jaccard_pairs": q44_jaccard_pairs,
        "q45_simhash": q45_simhash,
        "q46_embedding_neardup": q46_embedding_neardup,
        "q46b_neardup_blas": q46b_neardup_blas,
        "q47_cosine_topk": q47_cosine_topk,
        "q48_text_stats": q48_text_stats,
        "q49_media_meta": q49_media_meta,
        "q50_frame_sample": q50_frame_sample,
        "q51_asof_join": q51_asof_join,
        "q52_range_join": q52_range_join,
        "q53_group_zscore": q53_group_zscore,
    }
    return _freshness_rotate(base)


def bench_extras() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Production-path timing variants — benchmarked alongside ``queries()``
    but NOT part of the correctness contract (no oracle): the fast-hash
    (``xxhash64``) tier of minhash/LSH/simhash (the md5 tier exists for
    DuckDB verifiability; production runs use the JVM hash) and the raw
    BLAS near-dup path (q46b wraps it in a parity check; this entry times
    the path alone)."""

    def x42(spark: SparkSession, sf_dir: str) -> DataFrame:
        d = _t(spark, sf_dir, "documents")
        staged = dd.with_minhash_signature(
            d, "text", num_perm=8, hash_fn="xxhash64"
        )
        return staged.select(
            "doc_id",
            *[
                F.element_at(F.col("__sig"), i + 1).alias(f"sig_{i}")
                for i in range(8)
            ],
        )

    def x43(spark: SparkSession, sf_dir: str) -> DataFrame:
        d = _t(spark, sf_dir, "documents")
        return dd.minhash_lsh_pairs(
            d, "text", "doc_id", num_perm=8, bands=4, hash_fn="xxhash64"
        )

    def x45(spark: SparkSession, sf_dir: str) -> DataFrame:
        d = _t(spark, sf_dir, "documents")
        return dd.with_simhash(d, "text", hash_fn="xxhash64").select(
            "doc_id", "simhash16"
        )

    def x46(spark: SparkSession, sf_dir: str) -> DataFrame:
        e = _t(spark, sf_dir, "embeddings")
        return dd.embedding_neardup_pairs(
            e, "embedding", "vec_id", threshold=0.3, method="blas"
        )

    def x54(spark: SparkSession, sf_dir: str) -> DataFrame:
        d = _t(spark, sf_dir, "documents")
        return dd.near_dedup_pairs(
            d, "text", "doc_id", num_perm=8, bands=4, threshold=0.2,
            hash_fn="xxhash64",
        )

    def x16(spark: SparkSession, sf_dir: str) -> DataFrame:
        # q16's exact percentile holds all group values; this is the
        # fixed-memory sketch tier (single aggregation, mergeable state)
        # a 100 TB profile run uses instead.
        li = _t(spark, sf_dir, "lineitem")
        return li.groupBy("l_returnflag").agg(
            F.round(
                F.expr("approx_percentile(l_extendedprice, 0.5, 10000)"), 4
            ).alias("p50"),
            F.round(
                F.expr("approx_percentile(l_extendedprice, 0.9, 10000)"), 4
            ).alias("p90"),
            F.round(
                F.expr("approx_percentile(l_quantity, 0.25, 10000)"), 4
            ).alias("q25"),
        )

    def x58(spark: SparkSession, sf_dir: str) -> DataFrame:
        d = _t(spark, sf_dir, "documents")
        return dd.simhash_pairs(
            d, "text", "doc_id", bits=32, hash_fn="xxhash64"
        )

    def x75(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pytrousse_spark.operators import sampling as sp

        d = _t(spark, sf_dir, "documents")
        split = sp.hash_split(d, "doc_id")
        return dd.cross_dedup(
            split.where("split = 'test'").select("doc_id", "text"),
            split.where("split = 'train'").select("doc_id", "text"),
            "text", "doc_id", num_perm=8, bands=4, threshold=0.2,
            hash_fn="xxhash64",
        )

    def x77(spark: SparkSession, sf_dir: str) -> DataFrame:
        d = _t(spark, sf_dir, "documents")
        return dd.near_dedup_keep_best(
            d, "text", "doc_id", "n_chars",
            num_perm=8, bands=4, threshold=0.2, hash_fn="xxhash64",
        )

    def x87(spark: SparkSession, sf_dir: str) -> DataFrame:
        # q87's production tier: same bloom screen with the JVM xxhash64
        # family — times the data work without the wide md5 position
        # expressions whose one-time codegen dominates q87's cold run
        # (8.6s cold / 2.5s warm, PLANS.md r3).
        from pytrousse_spark.operators.bloom import (
            bloom_positions,
            bloom_shingle_screen,
        )
        from pytrousse_spark.functions.text import word_shingles

        d = _t(spark, sf_dir, "documents")
        build = d.where(
            F.col("source").isin(*_BLOOM_SRC) & F.col("text").isNotNull()
        )
        probe = d.where(
            (~F.col("source").isin(*_BLOOM_SRC)) & F.col("text").isNotNull()
        )
        build_sh = build.select(
            F.explode(word_shingles(F.col("text"), 3)).alias("sh")
        )
        pos = bloom_positions(build_sh, "sh", m=1 << 16, k=3, hash_fn="xxhash64")
        out = bloom_shingle_screen(
            probe, word_shingles(F.col("text"), 3), pos, m=1 << 16, k=3,
            hash_fn="xxhash64",
        )
        return out.select(
            "doc_id",
            "n_shingles",
            "n_hits",
            F.round(F.col("n_hits") / F.col("n_shingles"), 4).alias("hit_frac"),
        )

    def x90(spark: SparkSession, sf_dir: str) -> DataFrame:
        # q90's serving tier: ADC search with pre-trained (seed-only)
        # codebooks — isolates the per-query data work (map-side encode +
        # broadcast LUT join + re-rank) from the ~10-job k-means training
        # overhead that a real deployment amortizes across many queries.
        from pytrousse_spark.operators import quantization as pq

        e = _t(spark, sf_dir, "embeddings")
        books = pq.pq_codebooks_kmeans(
            e, "vec_id", "embedding", num_sub=8, num_cent=16, dim=64, iters=0
        )
        return pq.pq_adc_topk(
            e, e.where("vec_id < 40"), "vec_id", "embedding", books, k=5,
            rerank=100,
        )

    def x101(spark: SparkSession, sf_dir: str) -> DataFrame:
        # q101's serving tier: IVF-PQ search with pre-trained (seed-only)
        # codebooks — brackets the serving cost the same way x90 does for
        # flat ADC, isolating cell-join + LUT-score + re-rank from the
        # shared k-means training q101 pays when it runs first.
        from pytrousse_spark.operators import quantization as pq

        e = _t(spark, sf_dir, "embeddings")
        books = pq.pq_codebooks_kmeans(
            e, "vec_id", "embedding", num_sub=8, num_cent=16, dim=64, iters=0
        )
        return pq.ivf_pq_topk(
            e, e.where("vec_id < 40"), "vec_id", "embedding", books,
            k=5, num_cells=16, nprobe=4, rerank=100,
        )

    def x100(spark: SparkSession, sf_dir: str) -> DataFrame:
        # The exact-percentile comparison leg q100 carried through r3:
        # percentile() buffers every value in one final aggregation (8.0s
        # of q100's 12.8s wall at sf0.1) — kept as a declared baseline to
        # document the sketch's error, never the scale path.
        from pytrousse_spark.operators.sketch import (
            histogram_quantile_estimates,
        )

        li = _t(spark, sf_dir, "lineitem")
        ests = histogram_quantile_estimates(
            li, "l_extendedprice", list(_HISTQ), num_bins=4096
        )
        est_df = spark.createDataFrame(
            [(e["q"], e["estimate"]) for e in ests], "q double, estimate double"
        )
        exact_row = li.agg(
            *[
                F.round(
                    F.expr(f"percentile(l_extendedprice, {q})"), 4
                ).alias(f"e{i}")
                for i, q in enumerate(_HISTQ)
            ]
        ).first()
        ex_df = spark.createDataFrame(
            [(q, float(exact_row[i])) for i, q in enumerate(_HISTQ)],
            "q double, exact double",
        )
        return est_df.join(ex_df, "q").select(
            "q",
            "estimate",
            "exact",
            F.round(
                F.abs(F.col("estimate") - F.col("exact")) / F.col("exact"), 6
            ).alias("rel_err"),
        )

    def x163(spark: SparkSession, sf_dir: str) -> DataFrame:
        # q163's fast tier: winnowing over xxhash64 k-gram hashes — the
        # md5 tier exists for DuckDB verifiability; production fingerprints
        # use the JVM hash (~3s of the q163 headline is md5+conv).
        from pytrousse_spark.operators.dedup import winnow_overlap_pairs

        d = _t(spark, sf_dir, "documents")
        return winnow_overlap_pairs(
            d, "text", "doc_id", 16, 8, 5, 50, hash_fn="xxhash64"
        )

    def x181(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pytrousse_spark.operators.sampling import bootstrap_mean_ci

        o = _t(spark, sf_dir, "orders")
        return bootstrap_mean_ci(
            o, "o_totalprice", "o_orderkey", n_replicates=100,
            salt="r6", hash_fn="xxhash64",
        )

    return {
        "x16_percentiles_sketch": x16,
        "x42_minhash_xxhash64": x42,
        "x43_lsh_pairs_xxhash64": x43,
        "x45_simhash_xxhash64": x45,
        "x46_neardup_blas_raw": x46,
        "x54_near_dedup_xxhash64": x54,
        "x58_simhash_pairs_xxhash64": x58,
        "x75_cross_dedup_xxhash64": x75,
        "x77_keep_best_xxhash64": x77,
        "x87_bloom_xxhash64": x87,
        "x90_pq_adc_pretrained": x90,
        "x100_quantiles_exact_baseline": x100,
        "x101_ivf_pq_pretrained": x101,
        "x163_winnow_xxhash64": x163,
        "x181_bootstrap_xxhash64": x181,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q01_pricing_summary": _sql_q01(),
        "q02_top_revenue_orders": _sql_q02(),
        "q03_nation_volume": _sql_q03(),
        "q04_filter_agg": _sql_q04(),
        "q05_semi_join": _sql_q05(),
        "q06_anti_join": _sql_q06(),
        "q07_window_rank": _sql_q07(),
        "q08_set_ops": _sql_q08(),
        "q09_rollup": _sql_q09(),
        "q10_events_hourly": _sql_q10(),
        "q11_sessionize": _sql_q11(),
        "q12_date_functions": _sql_q12(),
        "q13_string_functions": _sql_q13(),
        "q14_distinct_agg": _sql_q14(),
        "q15_scalar_subquery": _sql_q15(),
        "q16_percentiles": _sql_q16(),
        "q17_json_extract": _sql_q17(),
        "q18_cube": _sql_q18(),
        "q19_pipeline": _sql_q19(),
        "q20_profile": _sql_q20(),
        "q21_fillna": _sql_q21(),
        "q22_replace_strings": _sql_q22(),
        "q23_replace_substrings": _sql_q23(),
        "q24_onehot": _sql_q24(),
        "q25_ordinal": _sql_q25(),
        "q26_binning": _sql_q26(),
        "q27_combo_encoding": _sql_q27(),
        "q28_group_binning": _sql_q28(),
        "q29_repair": _sql_q29(),
        "q30_anonymize": _sql_q30(),
        "q31_overlap_bins": _sql_q31(),
        "q32_multi_combo": _sql_q32(),
        "q33_encode_single": _sql_q33(),
        "q34_encode_multi": _sql_q34(),
        "q40_dedup_exact": _sql_q40(),
        "q41_dup_census": _sql_q41(),
        "q42_minhash": _sql_q42(),
        "q43_lsh_pairs": _sql_q43(),
        "q44_jaccard_pairs": _sql_q44(),
        "q45_simhash": _sql_q45(),
        "q46_embedding_neardup": _sql_q46(),
        "q46b_neardup_blas": _sql_q46b(),
        "q47_cosine_topk": _sql_q47(),
        "q48_text_stats": _sql_q48(),
        "q49_media_meta": _sql_q49(),
        "q50_frame_sample": _sql_q50(),
        "q51_asof_join": _sql_q51(),
        "q51b_asof_forward": _sql_q51b(),
        "q70_stream_dedup_batch": _sql_q70(),
        "q71_interval_roundtrip": _sql_q71(),
        "q72_pii_scrub": _sql_q72(),
        "q73_repetition": _sql_q73(),
        "q74_surprisal": _sql_q74(),
        "q75_cross_dedup": _sql_q75(),
        "q76_target_mix": _sql_q76(),
        "q77_dedup_keep_best": _sql_q77(),
        "q78_kmeans": _sql_q78(),
        "q79_semantic_dedup": _sql_q79(),
        "q80_dup_ngrams": _sql_q80(),
        "q81_dsir": _sql_q81(),
        "q82_cluster_cap": _sql_q82(),
        "q83_remove_dup_spans": _sql_q83(),
        "q84_collocations": _sql_q84(),
        "q85_rolling_window": _sql_q85(),
        "q86_quality_tiers": _sql_q86(),
        "q87_bloom_contamination": _sql_q87(),
        "q88_count_min": _sql_q88(),
        "q89_session_window": _sql_q89(),
        "q90_pq_adc": _sql_q90(),
        "q91_weighted_sample": _sql_q91(),
        "q92_salted_join": _sql_q92(),
        "q93_bigram_lm": _sql_q93(),
        "q94_stream_enrich_batch": _sql_q94(),
        "q95_png_roundtrip": _sql_q95(),
        "q96_zorder": _sql_q96(),
        "q97_band_alerts": _sql_q97(),
        "q98_langid_confusion": _sql_q98(),
        "q99_hll_distinct": _sql_q99(),
        "q100_histogram_quantiles": _sql_q100(),
        "q101_ivf_pq": _sql_q101(),
        "q102_csv_roundtrip": _sql_q102(),
        "q103_hll_merge": _sql_q103(),
        "q104_quantile_bins": _sql_q104(),
        "q105_zipf_fit": _sql_q105(),
        "q106_snapshot_diff": _sql_q106(),
        "q107_random_projection": _sql_q107(),
        "q108_bucketed_join": _sql_q108(),
        "q109_stratified_sample": _sql_q109(),
        "q110_gapfill": _sql_q110(),
        "q111_logreg_quality": _sql_q111(),
        "q112_prefix_jaccard": _sql_q112(),
        "q113_cohort_retention": _sql_q113(),
        "q114_funnel": _sql_q114(),
        "q115_incremental_rollup": _sql_q115(),
        "q116_scd2_history": _sql_q116(),
        "q117_pagerank": _sql_q117(),
        "q118_pivot": _sql_q118(),
        "q119_cumulative_distinct": _sql_q119(),
        "q120_ewma": _sql_q120(),
        "q121_mad_anomalies": _sql_q121(),
        "q122_grouping_sets": _sql_q122(),
        "q123_winsorize": _sql_q123(),
        "q124_fuzzy_join": _sql_q124(),
        "q125_hll_trailing": _sql_q125(),
        "q126_join_size_estimate": _sql_q126(),
        "q127_grouped_quantiles": _sql_q127(),
        "q128_time_to_convert": _sql_q128(),
        "q129_keyword_search": _sql_q129(),
        "q130_correlation_matrix": _sql_q130(),
        "q131_ols": _sql_q131(),
        "q132_association_rules": _sql_q132(),
        "q133_event_transitions": _sql_q133(),
        "q134_chi2_features": _sql_q134(),
        "q135_triangles": _sql_q135(),
        "q136_hll_overlap": _sql_q136(),
        "q137_pareto_frontier": _sql_q137(),
        "q138_expectations": _sql_q138(),
        "q139_seasonal_decompose": _sql_q139(),
        "q140_attribution": _sql_q140(),
        "q141_hybrid_search": _sql_q141(),
        "q142_psi_drift": _sql_q142(),
        "q143_stream_join_batch": _sql_q143(),
        "q144_phrase_search": _sql_q144(),
        "q145_ols_grouped": _sql_q145(),
        "q146_session_paths": _sql_q146(),
        "q147_contingency_chi2": _sql_q147(),
        "q148_ab_test": _sql_q148(),
        "q149_gini": _sql_q149(),
        "q150_unordered_funnel": _sql_q150(),
        "q151_benford": _sql_q151(),
        "q152_js_divergence": _sql_q152(),
        "q153_rank_transform": _sql_q153(),
        "q154_sampling_weights": _sql_q154(),
        "q155_entropy_profile": _sql_q155(),
        "q156_rank_transform_sketch": _sql_q156(),
        "q157_rolling_window_scalable": _sql_q157(),
        "q158_k_anonymity": _sql_q158(),
        "q159_prefix_dups": _sql_q159(),
        "q160_calibration": _sql_q160(),
        "q161_containment": _sql_q161(),
        "q162_l_diversity": _sql_q162(),
        "q163_winnow_overlap": _sql_q163(),
        "q164_bpe_train": _sql_q164(),
        "q165_quantile_normalize": _sql_q165(),
        "q166_cusum": _sql_q166(),
        "q167_linear_attribution": _sql_q167(),
        "q168_hill_tail": _sql_q168(),
        "q169_dataset_roundtrip": _sql_q169(),
        "q170_rank_transform_auto": _sql_q170(),
        "q171_png_rgb_roundtrip": _sql_q171(),
        "q172_k_anonymity_enforce": _sql_q172(),
        "q173_t_closeness": _sql_q173(),
        "q174_dp_counts": _sql_q174(),
        "q175_auc": _sql_q175(),
        "q176_record_linkage": _sql_q176(),
        "q177_linear_attribution_scalable": _sql_q167(),
        "q178_kaplan_meier": _sql_q178(),
        "q179_roc_curve": _sql_q179(),
        "q180_auc_grouped": _sql_q180(),
        "q181_bootstrap_ci": _sql_q181(),
        "q182_sq8_topk": _sql_q182(),
        "q183_conformal": _sql_q183(),
        "q184_km_grouped": _sql_q184(),
        "q185_logrank": _sql_q185(),
        "q186_ks_drift": _sql_q186(),
        "q187_cat_association": _sql_q187(),
        "q188_cuped": _sql_q188(),
        "q189_diff_in_diff": _sql_q189(),
        "q190_position_attribution": _sql_q190(),
        "q191_assortativity": _sql_q191(),
        "q192_pca2": _sql_q192(),
        "q193_seasonal_mase": _sql_q193(),
        "q194_position_attribution_scalable": _sql_q190(),
        "q195_rfm": _sql_q195(),
        "q196_ab_mde": _sql_q196(),
        "q197_segment_ab_bh": _sql_q197(),
        "q198_ratio_metric": _sql_q198(),
        "q199_rmst": _sql_q199(),
        "q200_naive_bayes": _sql_q200(),
        "q201_decision_stump": _sql_q201(),
        "q202_mann_whitney": _sql_q202(),
        "q203_heaps_law": _sql_q203(),
        "q204_acf_ljung_box": _sql_q204(),
        "q205_pettitt": _sql_q205(),
        "q206_mann_kendall": _sql_q206(),
        "q207_loo_target_encoding": _sql_q207(),
        "q208_woe_iv": _sql_q208(),
        "q209_lift_gains": _sql_q209(),
        "q210_eb_shrinkage": _sql_q210(),
        "q211_fastss_neighbors": _sql_q211(),
        "q212_fk_orphan_census": _sql_q212(),
        "q213_readability": _sql_q213(),
        "q214_cmh": _sql_q214(),
        "q215_cluster_quality": _sql_q215(),
        "q216_isotonic_calibration": _sql_q216(),
        "q217_textrank": _sql_q217(),
        "q218_cross_correlation": _sql_q218(),
        "q219_winsorized_stats": _sql_q219(),
        "q220_kendall_tau": _sql_q220(),
        "q221_spearman": _sql_q221(),
        "q222_kruskal_wallis": _sql_q222(),
        "q223_markov_accuracy": _sql_q223(),
        "q224_neyman_sample": _sql_q224(),
        "q225_ohlc_bars": _sql_q225(),
        "q226_ipw_ate": _sql_q226(),
        "q227_daily_rate_wilson": _sql_q227(),
        "q228_cohort_ltv": _sql_q228(),
        "q229_numeric_mi": _sql_q229(),
        "q230_lsh_planner": _sql_q230(),
        "q231_wasserstein": _sql_q231(),
        "q232_seasonal_strength": _sql_q232(),
        "q233_embedding_drift": _sql_q233(),
        "q234_activity_streaks": _sql_q234(),
        "q235_peak_concurrency": _sql_q235(),
        "q236_spatial_radius_join": _sql_q236(),
        "q237_sequential_patterns": _sql_q237(),
        "q238_markov_attribution": _sql_q238(),
        "q239_granger_lead_lag": _sql_q239(),
        "q240_k_core": _sql_q240(),
        "q241_shapley_attribution": _sql_q241(),
        "q242_bm25_search": _sql_q242(),
        "q243_poisson_rate_ratio": _sql_q243(),
        "q244_km_greenwood": _sql_q244(),
        "q245_item_item_cf": _sql_q245(),
        "q246_aipw_ate": _sql_q246(),
        "q247_uplift_qini": _sql_q247(),
        "q248_burstiness": _sql_q248(),
        "q249_gesd_outliers": _sql_q249(),
        "q250_label_propagation": _sql_q250(),
        "q251_theil_sen": _sql_q251(),
        "q252_skipgram_pairs": _sql_q252(),
        "q253_distance_correlation": _sql_q253(),
        "q254_unicode_census": _sql_q254(),
        "q255_huber_trend": _sql_q255(),
        "q256_gumbel_maxima": _sql_q256(),
        "q257_triple_sequences": _sql_q257(),
        "q258_skipgram_negatives": _sql_q258(),
        "q259_regression_discontinuity": _sql_q259(),
        "q260_rake_weights": _sql_q260(),
        "q261_vocab_richness": _sql_q261(),
        "q262_fairness_census": _sql_q262(),
        "q263_markov_entropy": _sql_q263(),
        "q264_qte": _sql_q264(),
        "q265_optimal_threshold": _sql_q265(),
        "q266_sequential_ab": _sql_q266(),
        "q267_source_vocab_overlap": _sql_q267(),
        "q268_log_odds_tokens": _sql_q268(),
        "q269_ndcg_bm25": _sql_q269(),
        "q270_minhash_calibration": _sql_q270(),
        "q271_brier_decomposition": _sql_q271(),
        "q272_cohens_kappa": _sql_q272(),
        "q273_theil_index": _sql_q273(),
        # the streamed gate's oracle IS the batch census SQL — the
        # stream's merged partials must reproduce it bit-for-bit
        "q274_unicode_census_streamed": _sql_q254(),
        "q275_png_palette_roundtrip": _sql_q275(),
        "q276_png_rgba_roundtrip": _sql_q276(),
        "q277_dirichlet_ql_search": _sql_q277(),
        "q278_embedding_isotropy": _sql_q278(),
        "q279_propensity_matching": _sql_q279(),
        "q280_bradley_terry": _sql_q280(),
        "q281_adamic_adar": _sql_q281(),
        "q282_aalen_johansen": _sql_q282(),
        "q283_group_jackknife": _sql_q283(),
        "q284_ohlc_streamed": _sql_q225(),
        "q285_embedding_mmd": _sql_q285(),
        "q286_png_gray16_roundtrip": _sql_q286(),
        "q287_hits": _sql_q287(),
        "q288_mcnemar": _sql_q288(),
        "q289_conformal": _sql_q289(),
        "q290_png_adam7_roundtrip": _sql_q290(),
        "q291_rrf_fusion": _sql_q291(),
        "q292_krippendorff_alpha": _sql_q292(),
        "q293_tost_equivalence": _sql_q293(),
        "q294_cochran_q": _sql_q294(),
        "q295_png_rgb48_roundtrip": _sql_q295(),
        "q296_png_graya_roundtrip": _sql_q296(),
        "q304_png_subbyte_roundtrip": _sql_q304(),
        "q305_png_palette_subbyte_roundtrip": _sql_q305(),
        "q306_wilcoxon_signed_rank": _sql_q306(),
        "q307_friedman": _sql_q307(),
        "q308_brown_forsythe": _sql_q308(),
        "q309_cramer_von_mises": _sql_q309(),
        "q310_wasserstein": _sql_q310(),
        "q311_drift_by_group": _sql_q311(),
        "q312_grouped_wasserstein": _sql_q312(),
        "q313_repeated_median": _sql_q313(),
        "q314_anderson_darling": _sql_q314(),
        "q315_energy_distance": _sql_q315(),
        "q316_grouped_mann_whitney": _sql_q316(),
        "q317_kuiper": _sql_q317(),
        "q297_mann_whitney": _sql_q297(),
        "q298_anova_f": _sql_q298(),
        "q299_bartlett": _sql_q299(),
        "q300_fleiss_kappa": _sql_q300(),
        "q301_cochran_armitage": _sql_q301(),
        "q302_durbin_watson": _sql_q302(),
        "q303_mrr_bm25": _sql_q303(),
        "q52_range_join": _sql_q52(),
        "q53_group_zscore": _sql_q53(),
        "q54_near_dedup_pairs": _sql_q54(),
        "q55_near_dedup": _sql_q55(),
        "q56_embedding_neardup_lsh": _sql_q56(),
        "q57_ivf_topk": _sql_q57(),
        "q58_simhash_pairs": _sql_q58(),
        "q59_clean_corpus": _sql_q59(),
        "q60_interval_join": _sql_q60(),
        "q61_hash_split": _sql_q61(),
        "q62_group_sample": _sql_q62(),
        "q63_chunk_documents": _sql_q63(),
        "q64_contamination": _sql_q64(),
        "q65_dup_clusters": _sql_q65(),
        "q66_vocabulary": _sql_q66(),
        "q67_tfidf": _sql_q67(),
        "q68_pack_sequences": _sql_q68(),
        "q69_wav_decode": _sql_q69(),
    }
