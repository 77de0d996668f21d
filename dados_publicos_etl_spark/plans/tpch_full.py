"""TPC-H query shapes q2/q8/q9/q11/q13/q15/q16/q18/q20/q21/q22
adapted to the driver star schema.

The driver testdata has no ``partsupp`` table and omits several
classic columns (``l_commitdate``/``l_receiptdate``/``l_shipmode``,
``o_comment``, ``c_phone``), so the five partsupp-dependent queries
and q13/q21/q22 are *shape-preserving adaptations*: every one keeps
the defining plan feature of its TPC-H original (correlated min,
ratio-of-conditional-aggregates, scalar-subquery HAVING, outer-join
histogram, EXISTS/NOT-EXISTS self-joins, scalar-subquery max, NOT-IN
anti-join, IN-with-HAVING semi-join chain) while substituting columns
that exist.  Each docstring notes the substitution.

Scale notes (100 TB stance): region/nation/supplier are broadcast —
they stay small at any scale factor.  ``part`` and ``customer`` are
NOT broadcast (they grow with SF); their joins shuffle on the key and
AQE picks the strategy.  Self-joins on ``lineitem`` (q21) are
key-partitioned semi/anti joins on ``l_orderkey`` — co-partitioned,
single shuffle each, no cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dados_publicos_etl_spark.functions.numeric import money_sum, money_sum_sql
from dados_publicos_etl_spark.io import read_table
from dados_publicos_etl_spark.plans.registry import query


def _ts(s: str):
    return F.lit(s).cast("timestamp")


# ---------------------------------------------------------------------------
# q2 — minimum-cost supplier (correlated MIN; partsupp replaced by the
# observed per-(part,supplier) min unit price from lineitem)
# ---------------------------------------------------------------------------


@query(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH supp AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
    ), cost AS (
      SELECT p_partkey, p_type, s_suppkey, s_name, s_acctbal, n_name,
             MIN(ROUND(l_extendedprice / l_quantity, 2)) AS supply_cost
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
               AND p_type = 'STANDARD' AND p_size <= 10
      JOIN supp ON s_suppkey = l_suppkey
      GROUP BY p_partkey, p_type, s_suppkey, s_name, s_acctbal, n_name
    ), ranked AS (
      SELECT *, MIN(supply_cost) OVER (PARTITION BY p_partkey) AS min_cost
      FROM cost
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type, supply_cost
    FROM ranked
    WHERE supply_cost = min_cost
    ORDER BY s_acctbal DESC, s_name, p_partkey
    LIMIT 100
    """,
    description="TPC-H Q2 shape: correlated MIN-per-part over a "
    "region-restricted supplier set; partsupp emulated by the min "
    "observed unit price per (part, supplier) in lineitem.  Unique "
    "(s_name, p_partkey) sort key makes the LIMIT deterministic.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = read_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    nation = read_table(spark, sf_dir, "nation")
    supp = (
        read_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    nation.n_regionkey == region.r_regionkey,
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part = read_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10)
    )
    cost = (
        read_table(spark, sf_dir, "lineitem")
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(
            "p_partkey", "p_type", "s_suppkey", "s_name", "s_acctbal", "n_name"
        )
        .agg(
            F.min(
                F.round(F.col("l_extendedprice") / F.col("l_quantity"), 2)
            ).alias("supply_cost")
        )
    )
    w = W.partitionBy("p_partkey")
    return (
        cost.withColumn("min_cost", F.min("supply_cost").over(w))
        .filter(F.col("supply_cost") == F.col("min_cost"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_type",
            "supply_cost",
        )
        .orderBy(F.desc("s_acctbal"), "s_name", "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q8 — national market share (ratio of conditional aggregates)
# ---------------------------------------------------------------------------


@query(
    "q8_market_share",
    oracle=f"""
    WITH all_nations AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey AND p_type = 'PROMO'
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      JOIN orders   ON l_orderkey = o_orderkey
                   AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
                   AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region   ON cn.n_regionkey = r_regionkey AND r_name = 'AMERICA'
    )
    SELECT o_year,
           ROUND({money_sum_sql("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END")}
                 / {money_sum_sql("volume")}, 6) AS mkt_share,
           {money_sum_sql("volume")} AS total_volume
    FROM all_nations
    GROUP BY o_year
    """,
    description="TPC-H Q8 shape: 7-way join, ratio of a conditional "
    "aggregate to the total per year (market share of NATION_3 "
    "suppliers into AMERICA customers for PROMO parts).",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "AMERICA"
    )
    cust_nat = (
        read_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    nation.n_regionkey == region.r_regionkey,
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp_nat = (
        read_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    part = read_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO"
    )
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1995-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-01-01 00:00:00"))
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        read_table(spark, sf_dir, "lineitem")
        .join(part.select("p_partkey"), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp_nat), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            orders.select("o_orderkey", "o_custkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust_nat, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .select(
            F.year("o_orderdate").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    target_vol = F.when(
        F.col("supp_nation") == "NATION_3", F.col("volume")
    ).otherwise(F.lit(0.0))
    return base.groupBy("o_year").agg(
        F.round(
            money_sum(target_vol) / money_sum(F.col("volume")), 6
        ).alias("mkt_share"),
        money_sum(F.col("volume")).alias("total_volume"),
    )


# ---------------------------------------------------------------------------
# q9 — product-type profit (supply cost proxied by 0.6 * p_retailprice)
# ---------------------------------------------------------------------------


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
           {money_sum_sql(
               "l_extendedprice * (1 - l_discount)"
               " - 0.6 * p_retailprice * l_quantity")} AS sum_profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey AND p_name LIKE '%widget%'
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    GROUP BY n_name, EXTRACT(year FROM o_orderdate)
    """,
    description="TPC-H Q9 shape: profit per supplier-nation per year "
    "for parts matching a name pattern; ps_supplycost proxied as "
    "0.6 * p_retailprice (no partsupp table in the driver schema).",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    )
    supp_nat = (
        read_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(read_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "n_name")
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        read_table(spark, sf_dir, "lineitem")
        .join(
            part.select("p_partkey", "p_retailprice"),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(supp_nat), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(money_sum(profit).alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# q11 — important stock (scalar-subquery HAVING threshold)
# ---------------------------------------------------------------------------

_Q11_VALUE = money_sum_sql("l_extendedprice * (1 - l_discount)")


@query(
    "q11_important_stock",
    oracle=f"""
    WITH asia AS (
      SELECT s_suppkey FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
    )
    SELECT l_partkey AS partkey, {_Q11_VALUE} AS part_value
    FROM lineitem
    WHERE l_suppkey IN (SELECT s_suppkey FROM asia)
    GROUP BY l_partkey
    HAVING {_Q11_VALUE} > (
      SELECT {_Q11_VALUE} * 0.0008
      FROM lineitem
      WHERE l_suppkey IN (SELECT s_suppkey FROM asia)
    )
    """,
    description="TPC-H Q11 shape: per-part value restricted to one "
    "region's suppliers, kept only when above a scalar-subquery "
    "fraction of the global total (value = discounted revenue; no "
    "partsupp).  Spark side computes the scalar once and broadcasts "
    "it into the HAVING filter.",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    asia_supp = (
        read_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    nation.n_regionkey == region.r_regionkey,
                ).select("n_nationkey")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    value = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    scoped = read_table(spark, sf_dir, "lineitem").join(
        F.broadcast(asia_supp),
        F.col("l_suppkey") == F.col("s_suppkey"),
        "left_semi",
    )
    # LAZY checkpoint: the scalar threshold AND the filter both read
    # per_part; without it the lineitem aggregate runs twice (r10
    # subtree audit).
    per_part = scoped.groupBy(F.col("l_partkey").alias("partkey")).agg(
        money_sum(value).alias("part_value")
    ).localCheckpoint(eager=False)
    threshold = per_part.agg(
        (F.sum(F.round(F.col("part_value") * 100, 0).cast("long")) / 100.0
         * 0.0008).alias("thr")
    )
    return (
        per_part.crossJoin(F.broadcast(threshold))
        .filter(F.col("part_value") > F.col("thr"))
        .select("partkey", "part_value")
    )


# ---------------------------------------------------------------------------
# q13 — customer order-count distribution (outer-join histogram)
# ---------------------------------------------------------------------------


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
    description="TPC-H Q13 shape: customers x non-urgent order counts "
    "histogram via LEFT OUTER join with an ON-clause filter (the "
    "o_comment NOT LIKE filter substituted with o_orderpriority).",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer").select("c_custkey")
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    counts = (
        cust.join(
            orders.select("o_orderkey", "o_custkey"),
            cust.c_custkey == orders.o_custkey,
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return counts.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


# ---------------------------------------------------------------------------
# q15 — top supplier (scalar-subquery MAX over an aggregated view)
# ---------------------------------------------------------------------------

_Q15_REV = money_sum_sql("l_extendedprice * (1 - l_discount)")


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, {_Q15_REV} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    description="TPC-H Q15 shape: quarterly revenue per supplier, "
    "select the max via a scalar subquery.  Cents-integer revenue "
    "makes the double equality engine-stable.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    rev = (
        read_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1996-04-01 00:00:00"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        read_table(spark, sf_dir, "supplier")
        .join(rev, F.col("s_suppkey") == F.col("supplier_no"))
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# q16 — supplier counts per part group (NOT IN anti-join)
# ---------------------------------------------------------------------------


@query(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    """,
    description="TPC-H Q16 shape: distinct-supplier count per "
    "(brand, type, size) with a NOT-IN exclusion subquery (suppliers "
    "with negative balance substituting the complaints filter); "
    "NOT IN compiles to a broadcast left_anti join.",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    )
    bad_supp = read_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        read_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(
            F.broadcast(bad_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(
            part.select("p_partkey", "p_brand", "p_type", "p_size"),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# q18 — large-volume customers (HAVING on a grouped fact, IN-join back)
# ---------------------------------------------------------------------------


@query(
    "q18_large_volume",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey, {money_sum_sql("l_quantity")} AS sum_qty
      FROM lineitem
      GROUP BY l_orderkey
      HAVING {money_sum_sql("l_quantity")} > 250
    )
    SELECT c_name, c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o_totalprice, sum_qty
    FROM big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    description="TPC-H Q18 shape: orders whose total quantity exceeds "
    "a threshold (grouped HAVING), joined back to orders+customer; "
    "top-100 by price with a unique (o_orderkey) tie-break.",
)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    big = (
        read_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(money_sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    return (
        big.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice", "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q20 — part-promotion suppliers (IN + HAVING semi-join chain)
# ---------------------------------------------------------------------------


@query(
    "q20_part_promotion",
    oracle=f"""
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey AND r_name = 'AFRICA'
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem
      JOIN part ON p_partkey = l_partkey AND p_name LIKE 'red%'
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_suppkey
      HAVING {money_sum_sql("l_quantity")} > 280
    )
    """,
    description="TPC-H Q20 shape: suppliers in one region who shipped "
    "more than a threshold quantity of name-matched parts in a year — "
    "a grouped-HAVING subquery consumed as a left_semi join.",
)
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    red = read_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("red%")
    )
    heavy = (
        read_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
        )
        .join(
            red.select("p_partkey"),
            F.col("p_partkey") == F.col("l_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey")
        .agg(money_sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 280)
        .select("l_suppkey")
    )
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "AFRICA"
    )
    return (
        read_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    nation.n_regionkey == region.r_regionkey,
                ).select("n_nationkey")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(heavy),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_name", "s_acctbal")
    )


# ---------------------------------------------------------------------------
# q21 — suppliers who kept orders waiting (EXISTS / NOT EXISTS self-joins)
# ---------------------------------------------------------------------------


@query(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey AND n_name = 'NATION_7'
    JOIN orders   ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
    WHERE l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    description="TPC-H Q21 shape: sole-failing-supplier detection via "
    "EXISTS + NOT EXISTS lineitem self-joins (failure indicator = "
    "l_returnflag = 'R'; no receipt/commit dates in the driver "
    "schema).  Self-joins are orderkey-equi semi/anti joins — "
    "co-partitioned, no cross product.",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    n7_supp = (
        read_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                read_table(spark, sf_dir, "nation").filter(
                    F.col("n_name") == "NATION_7"
                ).select("n_nationkey")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .join(F.broadcast(n7_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_orderkey", "l_suppkey", "s_name")
        .alias("l1")
    )
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .alias("l3")
    )
    cand = l1.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    ).join(
        l3,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
        "left_anti",
    )
    fixed = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    return (
        cand.join(fixed, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q22 — global sales opportunity (scalar AVG subquery + NOT EXISTS)
# ---------------------------------------------------------------------------

_Q22_CODES = ("11", "17", "23", "29", "31", "41", "47")


@query(
    "q22_global_sales",
    oracle=f"""
    WITH scoped AS (
      SELECT right(c_name, 2) AS cntrycode, c_custkey, c_acctbal
      FROM customer
      WHERE right(c_name, 2) IN {_Q22_CODES!r}
    ), avg_bal AS (
      SELECT {money_sum_sql("c_acctbal")} / COUNT(*) AS ab
      FROM scoped WHERE c_acctbal > 0
    )
    SELECT cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           {money_sum_sql("c_acctbal")} AS totacctbal
    FROM scoped, avg_bal
    WHERE c_acctbal > ab
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
      )
    GROUP BY cntrycode
    """,
    description="TPC-H Q22 shape: above-average-balance customers with "
    "no urgent orders, grouped by a name-derived country code "
    "(c_phone absent; NOT EXISTS adapted to urgent orders since every "
    "customer has at least one order).  Scalar AVG is cents-exact so "
    "the > comparison is engine-stable.",
)
def q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    scoped = (
        read_table(spark, sf_dir, "customer")
        .withColumn("cntrycode", F.right(F.col("c_name"), F.lit(2)))
        .filter(F.col("cntrycode").isin(*_Q22_CODES))
        .select("cntrycode", "c_custkey", "c_acctbal")
    )
    avg_bal = scoped.filter(F.col("c_acctbal") > 0).agg(
        (
            (F.sum(F.round(F.col("c_acctbal") * 100, 0).cast("long")) / 100.0)
            / F.count(F.lit(1))
        ).alias("ab")
    )
    urgent = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_custkey")
    return (
        scoped.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            money_sum("c_acctbal").alias("totacctbal"),
        )
    )
