"""Additional TPC-H-shaped queries adapted to the driver star schema
(no partsupp table; predicates adjusted to the synthetic value
domains).  Same registry contract: every query carries its DuckDB
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dados_publicos_etl_spark.functions.numeric import money_sum
from dados_publicos_etl_spark.io import read_table
from dados_publicos_etl_spark.plans.registry import query


@query(
    "q7_nation_volume",
    oracle="""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS INT) AS ship_year,
           (CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0) AS volume
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE cn.n_nationkey <> sn.n_nationkey
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY cust_nation, supp_nation, ship_year
    """,
    description="TPC-H Q7 shape: trade volume between distinct "
    "nation pairs by year — the same dim (nation) broadcast-joined "
    "twice under different aliases.",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(sn), supp.s_nationkey == F.col("sn_key"))
        .filter(F.col("cn_key") != F.col("sn_key"))
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("volume")
        )
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           (CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0) AS revenue,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    description="TPC-H Q10 shape: revenue lost to returns, top-20 "
    "customers (grouped agg then TakeOrderedAndProject).",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    nation = read_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q12_shipmode_priority",
    oracle="""
    SELECT CAST(EXTRACT(year FROM l_shipdate) AS INT) AS ship_year,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY ship_year
    """,
    description="TPC-H Q12 shape: conditional counting by priority "
    "class (CASE inside SUM).",
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q14_promo_share",
    oracle="""
    SELECT CAST(EXTRACT(year FROM l_shipdate) AS INT) AS ship_year,
           ROUND(
             100.0 * (CAST(SUM(CAST(ROUND((CASE WHEN p_type = 'PROMO'
                               THEN l_extendedprice * (1 - l_discount)
                               ELSE 0 END) * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0)
             / (CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0), 4)
             AS promo_share_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY ship_year
    """,
    description="TPC-H Q14 shape: promo revenue share — conditional "
    "ratio derived from pre-rounded sums (oracle-exact).",
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    agg = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            money_sum(promo).alias("_promo"),
            money_sum(rev).alias("_total"),
        )
    )
    return agg.select(
        "ship_year",
        F.round(100.0 * F.col("_promo") / F.col("_total"), 4).alias(
            "promo_share_pct"
        ),
    )


@query(
    "q19_disjunctive",
    oracle="""
    SELECT (CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100, 0)
                  AS BIGINT)) AS DOUBLE) / 100.0) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 5 AND l_quantity <= 25)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity >= 10 AND l_quantity <= 40)
       OR (p_type = 'LARGE' AND l_quantity >= 20)
    """,
    description="TPC-H Q19 shape: disjunctive multi-column predicates "
    "spanning both join sides (Catalyst pushes the part-only terms "
    "into the dim scan).",
)
def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(5, 25)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 40)
        )
        | ((F.col("p_type") == "LARGE") & (F.col("l_quantity") >= 20))
    )
    return joined.filter(cond).agg(
        money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "argmax_per_group",
    oracle="""
    SELECT n_name, c_custkey AS top_custkey, c_acctbal AS top_acctbal
    FROM (
      SELECT n_name, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY n_name
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer JOIN nation ON c_nationkey = n_nationkey)
    WHERE rn = 1
    """,
    description="Argmax per group (TPC-H Q2's correlated-min pattern) "
    "via a single window pass instead of an aggregate + re-join.",
)
def argmax_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    w = W.partitionBy("n_name").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "n_name",
            F.col("c_custkey").alias("top_custkey"),
            F.col("c_acctbal").alias("top_acctbal"),
        )
    )


@query(
    "embedding_centroids",
    oracle="""
    SELECT label, CAST(i - 1 AS INT) AS dim,
           ROUND((CAST(SUM(CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 10000, 0)
                     AS BIGINT)) AS DOUBLE) / 10000.0) / COUNT(*), 6)
             AS centroid
    FROM embeddings, (SELECT unnest(range(1, 65)) AS i) idx
    GROUP BY label, dim
    """,
    description="Per-label centroid vectors in long form (label, dim, "
    "value): posexplode + grouped mean — the reduce step of IVF "
    "training, one shuffle on (label, dim).",
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode("embedding").alias("dim", "v")
    )
    return (
        exploded.groupBy("label", "dim")
        .agg(
            money_sum(F.col("v").cast("double"), scale=10000).alias("_s"),
            F.count(F.lit(1)).alias("_n"),
        )
        .select(
            "label",
            "dim",
            F.round(F.col("_s") / F.col("_n"), 6).alias("centroid"),
        )
    )


@query(
    "q6_forecast_revenue_sql",
    oracle="""
    SELECT (CAST(SUM(CAST(ROUND((l_extendedprice * l_discount) * 100, 0)
                  AS BIGINT)) AS DOUBLE) / 100.0) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.09
      AND l_quantity < 24
    """,
    description="TPC-H Q6 shape via the SQL API (temp view + "
    "spark.sql) — Catalyst produces the same plan as the DataFrame "
    "form; demonstrates the engine's SQL entry point.",
)
def q6_forecast_revenue_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    read_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "v_lineitem"
    )
    return spark.sql(
        """
        SELECT (CAST(SUM(CAST(ROUND((l_extendedprice * l_discount) * 100, 0)
                      AS BIGINT)) AS DOUBLE) / 100.0) AS revenue,
               COUNT(*) AS n_lines
        FROM v_lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount BETWEEN 0.02 AND 0.09
          AND l_quantity < 24
        """
    )


@query(
    "decimal_agg",
    oracle="""
    SELECT o_orderstatus,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18, 2))) AS DOUBLE)
             AS total_price_dec,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_orderstatus
    """,
    description="Exact DECIMAL(18,2) aggregation: decimal sums are "
    "order-independent by construction (the alternative to the "
    "cents-integer trick); result cast to DOUBLE for the comparison.",
)
def decimal_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price_dec"),
        F.count(F.lit(1)).alias("n"),
    )
