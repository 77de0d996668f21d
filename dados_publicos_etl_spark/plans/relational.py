"""Core relational query catalog (SURVEY.md §2.B: joins, aggregations,
windows, sorts, set ops, scalar functions).

The reference has none of these (its relational surface is a single
scan-project-write job); the driver's TPC-H-ish tables are the
workload.  Every plan here is written scale-first:

- dimension tables (region/nation/supplier/part at TPC-H proportions)
  are explicitly ``F.broadcast``-hinted — at 100 TB the fact tables
  shuffle, the dims never should;
- aggregations go through ``groupBy`` so Catalyst plans partial
  (map-side) aggregation before the shuffle;
- top-k is ``orderBy().limit(k)`` which Spark plans as
  TakeOrderedAndProject (no global sort materialization);
- filters are expression-form so they push into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dados_publicos_etl_spark.functions.numeric import money_sum
from dados_publicos_etl_spark.io import read_table
from dados_publicos_etl_spark.operators.clean import clean_cnae
from dados_publicos_etl_spark.plans.registry import query

# ---------------------------------------------------------------------------
# Reference-parity (SURVEY §2.A): the CNAE cleaning query re-targeted at the
# driver tables (same semantics as /root/reference/src/script/script.py:53-59).
# ---------------------------------------------------------------------------


@query(
    "cnae_clean",
    oracle="""
    SELECT n_nationkey AS CODIGO,
           NULLIF(TRIM(n_name), '') AS DESCRICAO,
           CASE WHEN (n_nationkey % 2) = 1 THEN 'PRIMARIO'
                ELSE 'SECUNDARIO' END AS SEGMENTO
    FROM nation
    """,
    description="Reference transform parity: trim + empty->NULL + parity "
    "enum (script.py:53-59) applied to an (int,string) table.",
)
def cnae_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("CODIGO"),
        F.col("n_name").alias("DESCRICAO"),
    )
    return clean_cnae(df)


@query(
    "audit_counts",
    oracle="""
    SELECT 'lineitem' AS table_name, CAST(COUNT(*) AS BIGINT) AS qtd_rows FROM lineitem
    UNION ALL
    SELECT 'orders' AS table_name, CAST(COUNT(*) AS BIGINT) AS qtd_rows FROM orders
    UNION ALL
    SELECT 'customer' AS table_name, CAST(COUNT(*) AS BIGINT) AS qtd_rows FROM customer
    """,
    description="Audit row-count op (reference monitor.py:70-100) as one "
    "distributed job instead of serial per-file pandas counts.",
)
def audit_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = []
    for name in ("lineitem", "orders", "customer"):
        parts.append(
            read_table(spark, sf_dir, name)
            .agg(F.count(F.lit(1)).alias("qtd_rows"))
            .select(F.lit(name).alias("table_name"), "qtd_rows")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# Aggregation
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle="""
    WITH agg AS (
      SELECT l_returnflag, l_linestatus,
             (CAST(SUM(CAST(ROUND((l_quantity) * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0) AS sum_qty,
             (CAST(SUM(CAST(ROUND((l_extendedprice) * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0) AS sum_base_price,
             (CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0) AS sum_disc_price,
             (CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0) AS sum_charge,
             (CAST(SUM(CAST(ROUND((l_discount) * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0) AS sum_disc,
             COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
    )
    SELECT l_returnflag, l_linestatus, sum_qty, sum_base_price,
           sum_disc_price, sum_charge,
           ROUND(sum_qty / count_order, 4) AS avg_qty,
           ROUND(sum_base_price / count_order, 4) AS avg_price,
           ROUND(sum_disc / count_order, 4) AS avg_disc,
           count_order
    FROM agg
    """,
    description="TPC-H Q1 shape: scan + pushed filter + grouped multi-agg "
    "(partial agg map-side, one shuffle on the 6-value group key).",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # averages derive from the pre-rounded sums: raw double sums differ
    # from any oracle in the last bits (parallel summation order), but
    # round(sum,2)/count is computed from identical inputs on both
    # sides, so the round(.,4) can never flip on a boundary.
    agg = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum("l_quantity").alias("sum_qty"),
            money_sum("l_extendedprice").alias("sum_base_price"),
            money_sum(disc_price).alias("sum_disc_price"),
            money_sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            money_sum("l_discount").alias("sum_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        "sum_charge",
        F.round(F.col("sum_qty") / F.col("count_order"), 4).alias("avg_qty"),
        F.round(F.col("sum_base_price") / F.col("count_order"), 4).alias(
            "avg_price"
        ),
        F.round(F.col("sum_disc") / F.col("count_order"), 4).alias("avg_disc"),
        "count_order",
    )


@query(
    "distinct_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps
    FROM lineitem
    GROUP BY l_returnflag
    """,
    description="Distinct aggregation (Spark plans expand + two-phase agg).",
)
def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
        )
    )


@query(
    "rollup_sales",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           (CAST(SUM(CAST(ROUND((l_quantity) * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    description="Grouping sets: ROLLUP over two keys (Expand operator, "
    "single shuffle).",
)
def rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            money_sum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "cube_status",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           (CAST(SUM(CAST(ROUND((o_totalprice) * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0) AS total_price,
           COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    description="Grouping sets: CUBE over two keys.",
)
def cube_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            money_sum("o_totalprice").alias("total_price"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "pivot_status",
    oracle="""
    SELECT l_returnflag,
           (CAST(SUM(CAST(ROUND((CASE WHEN l_linestatus = 'O' THEN l_quantity END) * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0) AS O,
           (CAST(SUM(CAST(ROUND((CASE WHEN l_linestatus = 'F' THEN l_quantity END) * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0) AS F
    FROM lineitem
    GROUP BY l_returnflag
    """,
    description="Pivot (explicit value list so no extra distinct-values "
    "scan; compiles to conditional aggregation).",
)
def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    pivoted = (
        read_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .sum("l_quantity")
    )
    return pivoted.select(
        "l_returnflag",
        F.round(F.col("O"), 2).alias("O"),
        F.round(F.col("F"), 2).alias("F"),
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           (CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0) AS revenue,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    description="TPC-H Q3 shape: selective dim filter -> fact join -> "
    "grouped agg -> top-k (TakeOrderedAndProject).",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    cutoff = F.lit("1999-01-01 00:00:00").cast("timestamp")
    orders = read_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q5_revenue_by_nation",
    oracle="""
    SELECT n_name,
           (CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '2000-01-01 00:00:00'
    GROUP BY n_name
    """,
    description="TPC-H Q5 shape: 6-table join; all dims broadcast, facts "
    "shuffle once on the join key.",
)
def q5_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2000-01-01 00:00:00").cast("timestamp"))
    )
    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 100000)
    GROUP BY c_mktsegment
    """,
    description="Left-semi join (EXISTS) — no duplication of the left side.",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    big_orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 100000
    )
    return (
        cust.join(big_orders, cust.c_custkey == big_orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    description="Left-anti join (NOT EXISTS): customers with no orders.",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "join_outer",
    oracle="""
    SELECT c_custkey,
           CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
           ROUND(COALESCE(SUM(o_totalprice), 0), 2) AS total_spent
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
    description="Left-outer join + null-preserving aggregation.",
)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_spent"
            ),
        )
    )


@query(
    "range_join_price_band",
    oracle="""
    SELECT b.band AS band, COUNT(*) AS n_parts
    FROM part p
    JOIN (SELECT 'low' AS band, 0.0 AS lo, 500.0 AS hi
          UNION ALL SELECT 'mid', 500.0, 1500.0
          UNION ALL SELECT 'high', 1500.0, 1e9) b
      ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY b.band
    """,
    description="Range (non-equi) join against a banding table — broadcast "
    "nested-loop on a tiny build side, the scalable pattern for banding.",
)
def range_join_price_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, sf_dir, "part")
    # VALUES -> LocalRelation: broadcastable without an RDD job
    # (createDataFrame would plan Scan ExistingRDD and pay a job to
    # materialize three rows).
    bands = spark.sql(
        "SELECT * FROM VALUES ('low', 0.0D, 500.0D), "
        "('mid', 500.0D, 1500.0D), ('high', 1500.0D, 1e9D) "
        "AS t(band, lo, hi)"
    )
    return (
        part.join(
            F.broadcast(bands),
            (part.p_retailprice >= bands.lo) & (part.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


# ---------------------------------------------------------------------------
# Window functions / top-k
# ---------------------------------------------------------------------------


@query(
    "window_topk_orders",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders)
    WHERE rn <= 3
    """,
    description="Top-k per group via row_number window (single shuffle on "
    "the partition key; rank pruning).",
)
def window_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        read_table(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
            "rn",
        )
    )


@query(
    "window_running_total",
    oracle="""
    SELECT user_id, event_id,
           (CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DOUBLE) / 100.0)
             AS running_value,
           ROUND(value - COALESCE(LAG(value) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id), 0), 2) AS delta_value
    FROM events
    """,
    description="Running sum + lag over event streams (rowsBetween frame).",
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        read_table(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            (
                F.sum(F.round(F.col("value") * 100, 0).cast("long"))
                .over(w.rowsBetween(W.unboundedPreceding, 0))
                / 100.0
            ).alias("running_value"),
            F.round(
                F.col("value") - F.coalesce(F.lag("value").over(w), F.lit(0.0)),
                2,
            ).alias("delta_value"),
        )
    )


@query(
    "window_rank_dense",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice,
           RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey)
             AS price_rank,
           DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_size)
             AS size_dense_rank,
           NTILE(4) OVER (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)
             AS price_quartile
    FROM part
    """,
    description="rank / dense_rank / ntile window family.",
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, sf_dir, "part")
    by_price = W.partitionBy("p_brand").orderBy(
        F.desc("p_retailprice"), F.asc("p_partkey")
    )
    by_size = W.partitionBy("p_brand").orderBy("p_size")
    quart = W.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    return part.select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        F.rank().over(by_price).alias("price_rank"),
        F.dense_rank().over(by_size).alias("size_dense_rank"),
        F.ntile(4).over(quart).alias("price_quartile"),
    )


@query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    description="Global top-k: TakeOrderedAndProject, no full sort.",
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@query(
    "set_ops",
    oracle="""
    WITH big AS (SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000),
         urgent AS (SELECT o_custkey AS custkey FROM orders
                    WHERE o_orderpriority = '1-URGENT')
    SELECT 'union' AS op, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT custkey FROM big UNION SELECT custkey FROM urgent)
    UNION ALL
    SELECT 'intersect' AS op, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT custkey FROM big INTERSECT SELECT custkey FROM urgent)
    UNION ALL
    SELECT 'except' AS op, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT custkey FROM big EXCEPT SELECT custkey FROM urgent)
    UNION ALL
    SELECT 'except_all' AS op, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT custkey FROM big EXCEPT ALL SELECT custkey FROM urgent)
    """,
    description="UNION (distinct) / INTERSECT / EXCEPT / EXCEPT ALL over "
    "key sets.",
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 150000).select(
        F.col("o_custkey").alias("custkey")
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    rows = [
        ("union", big.union(urgent).distinct()),
        ("intersect", big.intersect(urgent)),
        ("except", big.subtract(urgent)),  # EXCEPT (distinct semantics)
        ("except_all", big.exceptAll(urgent)),  # bag semantics
    ]
    parts = [
        d.agg(F.count(F.lit(1)).alias("n")).select(F.lit(op).alias("op"), "n")
        for op, d in rows
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# Scalar functions: dates, strings, JSON
# ---------------------------------------------------------------------------


@query(
    "date_functions",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
           CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS order_quarter,
           COUNT(*) AS n_orders,
           (CAST(SUM(CAST(ROUND((o_totalprice) * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0) AS total_price
    FROM orders
    GROUP BY order_year, order_quarter
    """,
    description="Date part extraction + time-bucketed aggregation.",
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "orders")
        .groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.quarter("o_orderdate").alias("order_quarter"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum("o_totalprice").alias("total_price"),
        )
    )


@query(
    "string_functions",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand) AS brand_upper,
           SUBSTRING(p_name, 1, 10) AS name_prefix,
           CAST(LENGTH(p_name) AS INT) AS name_len,
           p_type || '/' || p_brand AS type_brand,
           REPLACE(p_brand, 'Brand#', 'B') AS brand_short
    FROM part
    WHERE p_name LIKE '%a%'
    """,
    description="String scalar surface: upper/substring/length/concat/"
    "replace + LIKE pushdown.",
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%a%"))
        .select(
            "p_partkey",
            F.upper("p_brand").alias("brand_upper"),
            F.substring("p_name", 1, 10).alias("name_prefix"),
            F.length("p_name").alias("name_len"),
            F.concat_ws("/", "p_type", "p_brand").alias("type_brand"),
            F.regexp_replace("p_brand", "Brand#", "B").alias("brand_short"),
        )
    )


@query(
    "json_events",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
    description="JSON extraction from a string column + aggregation "
    "(get_json_object; schema_of_json/from_json for typed access).",
)
def json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("n"))
    )


@query(
    "grouping_sets_sales",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
             AS gid,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    description="Explicit GROUPING SETS (neither ROLLUP nor CUBE "
    "shape) + grouping_id to disambiguate real NULL keys from "
    "superaggregate rows.  Plans as one Expand + one shuffle — at "
    "scale this beats N separate groupBys (N scans, N shuffles) for "
    "multi-granularity reporting.",
)
def grouping_sets_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    read_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "v_orders_gs"
    )
    # DataFrame API has rollup/cube but not arbitrary grouping sets;
    # SQL is the canonical surface for this shape.
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               grouping_id(o_orderstatus, o_orderpriority) AS gid,
               COUNT(*) AS n
        FROM v_orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    ).withColumn("gid", F.col("gid").cast("long"))


@query(
    "listagg_nations",
    oracle="""
    SELECT r_name,
           string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    description="Ordered string aggregation (Spark 4 listagg WITHIN "
    "GROUP ~ DuckDB string_agg ORDER BY): deterministic because the "
    "within-group sort fixes concatenation order regardless of "
    "partitioning.  Broadcast join on the 5-row region dim.",
)
def listagg_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    return (
        nation.join(
            F.broadcast(region),
            nation.n_regionkey == region.r_regionkey,
        )
        .groupBy("r_name")
        .agg(
            F.expr(
                "listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)"
            ).alias("nations")
        )
    )


@query(
    "stats_moments",
    oracle="""
    WITH mu AS (
      SELECT l_returnflag, AVG(l_extendedprice) AS m
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           ROUND(corr(l_extendedprice, l_quantity), 4) AS price_qty_corr,
           ROUND(covar_samp(l_extendedprice, l_quantity), 2)
             AS price_qty_covar,
           ROUND(stddev_samp(l_extendedprice), 2) AS price_stddev,
           -- Spark's skewness/kurtosis are the POPULATION (g1 /
           -- excess-g2) forms; DuckDB's builtins apply sample bias
           -- correction, so the oracle computes the population
           -- moments explicitly (two-pass centered = numerically
           -- exact at any group size).
           ROUND(AVG(POW(l_extendedprice - m, 3))
                 / POW(AVG(POW(l_extendedprice - m, 2)), 1.5), 4)
             AS price_skew,
           ROUND(AVG(POW(l_extendedprice - m, 4))
                 / POW(AVG(POW(l_extendedprice - m, 2)), 2) - 3, 4)
             AS price_kurt
    FROM lineitem l JOIN mu USING (l_returnflag)
    GROUP BY l.l_returnflag
    """,
    description="Statistical moment aggregates (corr / covar_samp / "
    "stddev_samp / skewness / kurtosis) per return flag — all "
    "single-pass mergeable moment sketches, so partial aggregation "
    "carries the scan and only 3 groups cross the exchange.",
)
def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher statistical moments as one partial-aggregable pass.

    Every one of these reduces to tracking power sums / co-moments
    per partition and merging — the same scale shape as SUM/COUNT, so
    the plan is scan -> partial HashAggregate -> tiny exchange ->
    final.  No second pass, no window.  (Spark and DuckDB both use
    the numerically-stable co-moment formulation; results agree to
    well past the rounding applied here.)
    """
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_extendedprice", "l_quantity"), 4).alias(
            "price_qty_corr"
        ),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 2).alias(
            "price_qty_covar"
        ),
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("price_stddev"),
        F.round(F.skewness("l_extendedprice"), 4).alias("price_skew"),
        F.round(F.kurtosis("l_extendedprice"), 4).alias("price_kurt"),
    )


@query(
    "join_null_safe",
    oracle="""
    WITH a AS (
      SELECT NULLIF(o_orderpriority, '1-URGENT') AS priority_key,
             CAST(COUNT(*) AS BIGINT) AS n_1997
      FROM orders WHERE year(o_orderdate) = 1997 GROUP BY 1
    ), b AS (
      SELECT NULLIF(o_orderpriority, '1-URGENT') AS priority_key,
             CAST(COUNT(*) AS BIGINT) AS n_1998
      FROM orders WHERE year(o_orderdate) = 1998 GROUP BY 1
    )
    SELECT COALESCE(a.priority_key, b.priority_key) AS priority_key,
           COALESCE(n_1997, 0) AS n_1997,
           COALESCE(n_1998, 0) AS n_1998
    FROM a FULL OUTER JOIN b
      ON a.priority_key IS NOT DISTINCT FROM b.priority_key
    """,
    description="Null-safe full-outer join (<=> / IS NOT DISTINCT "
    "FROM): the NULL bucket (urgent priority nulled out) matches "
    "across sides instead of being dropped — the semantics a plain "
    "equality join silently gets wrong.",
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year counts keyed on a NULLABLE key.

    ``eqNullSafe`` compiles to a hash join with the null-safe
    equality as the key (both engines hash NULL to a regular bucket
    under <=>), so the plan is the same exchange shape as a normal
    equi-join — no fallback to nested-loop.
    """
    orders = read_table(spark, sf_dir, "orders")
    key = F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias(
        "priority_key"
    )
    a = (
        orders.filter(F.year("o_orderdate") == 1997)
        .groupBy(key)
        .agg(F.count(F.lit(1)).cast("long").alias("n_1997"))
    )
    b = (
        orders.filter(F.year("o_orderdate") == 1998)
        .groupBy(key)
        .agg(F.count(F.lit(1)).cast("long").alias("n_1998"))
    )
    return (
        a.join(
            b,
            a["priority_key"].eqNullSafe(b["priority_key"]),
            "full_outer",
        )
        .select(
            F.coalesce(a["priority_key"], b["priority_key"]).alias(
                "priority_key"
            ),
            F.coalesce("n_1997", F.lit(0)).alias("n_1997"),
            F.coalesce("n_1998", F.lit(0)).alias("n_1998"),
        )
    )


@query(
    "schema_evolution_union",
    oracle="""
    SELECT doc_id, text, lang
    FROM documents WHERE doc_id % 2 = 0
    UNION ALL BY NAME
    SELECT doc_id, text, source, n_chars
    FROM documents WHERE doc_id % 2 = 1
    """,
    description="Schema-evolution union (unionByName with "
    "allowMissingColumns ~ DuckDB UNION ALL BY NAME): merging corpus "
    "snapshots whose schemas drifted; missing columns null-fill, "
    "nothing positional.",
)
def schema_evolution_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union two snapshot schemas by NAME, null-filling the gaps.

    The corpus-snapshot merge problem: v1 shipped (doc_id, text,
    lang), v2 added source/n_chars and dropped lang.  Positional
    UNION corrupts silently; ``unionByName(allowMissingColumns=True)``
    aligns on names.  Narrow (no shuffle) — the union is just
    partition concatenation, so it scales as a pure scan.  On disk
    the same drift is handled by parquet ``mergeSchema`` reads
    (sources/formats.py).
    """
    docs = read_table(spark, sf_dir, "documents")
    v1 = docs.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", "text", "lang"
    )
    v2 = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "text", "source", "n_chars"
    )
    return v1.unionByName(v2, allowMissingColumns=True)


@query(
    "string_functions_ext",
    oracle="""
    SELECT p_partkey,
           translate(p_brand, '#', '-') AS brand_tr,
           levenshtein(p_brand, 'Brand#11') AS brand_dist,
           split_part(p_type, ' ', 1) AS type_head,
           CAST(len(regexp_extract_all(p_name, '[aeiou]+')) AS INT)
             AS n_vowel_runs,
           lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
           reverse(p_name) AS name_rev
    FROM part
    """,
    description="Extended string scalar surface: translate / "
    "levenshtein / split_part / regexp_extract_all / lpad / reverse "
    "— all codegen'd JVM expressions, zero shuffle.",
)
def string_functions_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.translate("p_brand", "#", "-").alias("brand_tr"),
        F.levenshtein("p_brand", F.lit("Brand#11")).alias("brand_dist"),
        F.split_part("p_type", F.lit(" "), F.lit(1)).alias("type_head"),
        F.size(
            F.regexp_extract_all("p_name", F.lit("[aeiou]+"), F.lit(0))
        ).alias("n_vowel_runs"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias(
            "key_padded"
        ),
        F.reverse("p_name").alias("name_rev"),
    )


@query(
    "date_functions_ext",
    oracle="""
    SELECT o_orderkey,
           strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d')
             AS quarter_start,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           CAST(date_diff('day', o_orderdate,
                          TIMESTAMP '1998-08-02 00:00:00') AS INT)
             AS days_to_ref,
           CAST(isodow(o_orderdate) - 1 AS INT) AS weekday_mon0,
           strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m
    FROM orders
    """,
    description="Extended date scalar surface: date_trunc(quarter) / "
    "last_day / datediff / weekday / add_months (month-end clamped "
    "identically on both engines).  Narrow map, no shuffle.",
)
def date_functions_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.date_format(F.date_trunc("quarter", "o_orderdate"), "yyyy-MM-dd")
        .alias("quarter_start"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias(
            "month_end"
        ),
        F.datediff(
            F.lit("1998-08-02").cast("date"), F.col("o_orderdate")
        ).cast("int").alias("days_to_ref"),
        F.weekday("o_orderdate").cast("int").alias("weekday_mon0"),
        F.date_format(F.add_months("o_orderdate", 3), "yyyy-MM-dd").alias(
            "plus3m"
        ),
    )


@query(
    "map_functions",
    oracle="""
    SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY user_id, event_type
    HAVING COUNT(*) >= 3
    """,
    description="Map-typed column surface: map_from_entries over a "
    "grouped collect, map_filter (n >= 3), explode back to rows — "
    "relational oracle pins the round-trip exactly.",
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build / filter / explode a MapType column.

    The map round-trip (rows -> map -> filtered map -> rows) is the
    engine surface for per-entity keyed aggregates (feature maps,
    per-type counters).  Everything is JVM-side; the only shuffles
    are the two aggregations.
    """
    ev = read_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    m = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "n"))
        ).alias("m")
    )
    filt = m.select(
        "user_id",
        F.map_filter("m", lambda _k, v: v >= 3).alias("m"),
    )
    return filt.select(
        "user_id", F.explode("m").alias("event_type", "n")
    )


@query(
    "array_functions",
    oracle="""
    WITH a AS (
      SELECT l_orderkey,
             list(l_quantity ORDER BY l_linenumber, l_quantity) AS qtys
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           CAST(len(qtys) AS INT) AS n_lines,
           array_to_string(list_transform(list_slice(qtys, 1, 3),
                           x -> CAST(CAST(x AS INT) AS VARCHAR)), ',')
             AS qty_head,
           list_contains(qtys, 10.0) AS has_ten,
           CAST(COALESCE(list_position(qtys, 10.0), 0) AS BIGINT)
             AS pos_ten,
           array_to_string(list_transform(list_reverse(qtys),
                           x -> CAST(CAST(x AS INT) AS VARCHAR)), ',')
             AS qty_rev
    FROM a
    """,
    description="Array function surface: ordered collect, slice, "
    "contains, position, reverse over a per-order quantity array.  "
    "One shuffle (the grouped collect); everything after is narrow.",
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(F.struct("l_linenumber", "l_quantity"))
        ).alias("s")
    )
    qtys = F.expr("transform(s, x -> x.l_quantity)")
    base = per.select("l_orderkey", qtys.alias("qtys"))
    as_csv = lambda c: F.concat_ws(  # noqa: E731 — serialize for hash
        ",", F.transform(c, lambda x: x.cast("int").cast("string"))
    )
    return base.select(
        "l_orderkey",
        F.size("qtys").alias("n_lines"),
        as_csv(F.slice("qtys", 1, 3)).alias("qty_head"),
        F.array_contains("qtys", F.lit(10.0)).alias("has_ten"),
        F.array_position("qtys", F.lit(10.0)).alias("pos_ten"),
        as_csv(F.reverse("qtys")).alias("qty_rev"),
    )


@query(
    "lateral_join_topn",
    oracle="""
    SELECT n.n_name, c.c_name, c.c_acctbal
    FROM nation n, LATERAL (
      SELECT c_name, c_acctbal FROM customer
      WHERE c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_name LIMIT 2
    ) c
    """,
    description="Correlated LATERAL subquery: top-2 customers by "
    "account balance PER nation, expressed as a lateral join (the "
    "SQL-standard per-row subquery surface).  Catalyst decorrelates "
    "it into a window/top-k plan rather than executing per-row — "
    "deterministic tie-break on (acctbal DESC, name).",
)
def lateral_join_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    read_table(spark, sf_dir, "nation").createOrReplaceTempView(
        "_lat_nation"
    )
    read_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "_lat_customer"
    )
    # LATERAL is SQL-only surface (no DataFrame equivalent); the
    # decorrelated plan is the same window top-k a DataFrame
    # row_number()<=2 would produce.
    return spark.sql(
        """
        SELECT n.n_name, c.c_name, c.c_acctbal
        FROM _lat_nation n, LATERAL (
          SELECT c_name, c_acctbal FROM _lat_customer
          WHERE c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_name LIMIT 2
        ) c
        """
    )


@query(
    "benford_audit",
    oracle="""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS STRING), 1, 1)
                  AS INT) AS d
      FROM orders WHERE o_totalprice >= 1
    ), counts AS (
      SELECT d, COUNT(*) AS n FROM digits GROUP BY d
    ), tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS t FROM counts)
    SELECT d, CAST(n AS BIGINT) AS n,
           ROUND(n / t, 4) AS observed,
           ROUND(log10(1.0 + 1.0 / d), 4) AS benford_expected,
           ROUND(ABS(n / t - log10(1.0 + 1.0 / d)) * 1000, 4)
             AS abs_dev_x1000
    FROM counts CROSS JOIN tot
    """,
    description="Benford's-law first-digit audit over order totals: "
    "observed leading-digit shares vs log10(1+1/d) with per-digit "
    "absolute deviation — the classic forensic screen for fabricated "
    "or truncated numeric columns, as one conditional aggregate "
    "(9-row output at any corpus size).  Synthetic uniform-ish "
    "totals will deviate from Benford — the AUDIT is the operator, "
    "the verdict is data-dependent.",
)
def benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    digits = orders.filter(F.col("o_totalprice") >= 1).select(
        # floor, not a raw double->bigint cast: Spark's cast
        # truncates but DuckDB's ROUNDS — floor is explicit on both
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("d")
    )
    counts = digits.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum("n").cast("double").alias("t"))
    obs = F.col("n") / F.col("t")
    exp = F.log10(1.0 + 1.0 / F.col("d"))
    return counts.crossJoin(F.broadcast(tot)).select(
        "d",
        "n",
        F.round(obs, 4).alias("observed"),
        F.round(exp, 4).alias("benford_expected"),
        F.round(F.abs(obs - exp) * 1000, 4).alias("abs_dev_x1000"),
    )


@query(
    "diversified_topk",
    oracle="""
    WITH ranked AS (
      SELECT o_orderkey, o_orderpriority, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey)
               AS rank_in_group
      FROM orders
    ), capped AS (
      SELECT * FROM ranked WHERE rank_in_group <= 5
    )
    SELECT o_orderkey, o_orderpriority,
           ROUND(o_totalprice, 2) AS o_totalprice,
           CAST(rank_in_group AS INT) AS rank_in_group
    FROM capped
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    description="Diversified top-k (group quotas): global top-20 "
    "orders by value, but at most 5 per priority class — the "
    "result-diversification rule of retrieval/feed ranking.  One "
    "per-group window caps the quota map-side-ish (only 5 rows per "
    "group survive to the final TakeOrdered), so the global sort "
    "sees |groups| x quota rows, not the corpus.",
)
def diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    capped = (
        orders.select(
            "o_orderkey", "o_orderpriority", "o_totalprice"
        )
        .withColumn("rank_in_group", F.row_number().over(w))
        .filter(F.col("rank_in_group") <= 5)
    )
    return (
        capped.select(
            "o_orderkey",
            "o_orderpriority",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.col("rank_in_group").cast("int").alias("rank_in_group"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )
