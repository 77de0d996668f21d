"""Skew mitigation operators (100 TB concern; SURVEY.md §4/§7).

A hot grouping/join key makes one shuffle partition the straggler.
Two standard remedies, both result-identical to the naive plan:

- **salted aggregation**: group by (key, salt) first (spreads the hot
  key over N partitions, map-side partials stay effective), then
  re-aggregate by key.  Works for any algebraic aggregate.
- **salted broadcast-free join**: replicate the small side N ways and
  salt the big side, so a hot join key spreads over N tasks.  (AQE's
  skewJoin handles moderate skew automatically — the engine enables
  it in session.py; explicit salting is for the extreme tail.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dados_publicos_etl_spark.io import read_table
from dados_publicos_etl_spark.plans.registry import query


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``aggs`` maps output name -> (partial_agg_expr, merge_agg_expr),
    e.g. ``{"n": (F.count(F.lit(1)), F.sum("n"))}``: stage 1 groups by
    keys+salt computing the partial, stage 2 groups by keys merging
    partials.  The salt column is a uniform int from a seeded
    ``F.rand(seed=42)`` — deterministic per partition, so results are
    reproducible while still spreading a hot key over ``n_salts``
    shuffle partitions.
    """
    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[merge.alias(name) for name, (_, merge) in aggs.items()]
    )


def replicate_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-proof equi-join: salt the big side, replicate the small
    side n_salts ways, join on (key, salt).  Row-identical to
    ``big.join(small, key)``."""
    big_s = big.withColumn("_salt", (F.rand(seed=7) * n_salts).cast("int"))
    small_r = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return big_s.join(small_r, [key, "_salt"]).drop("_salt")


@query(
    "skew_salted_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           (CAST(SUM(CAST(ROUND((l_quantity) * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0) AS sum_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    description="Salted two-stage aggregation over a 3-value (maximally "
    "skewed) key — result-identical to the naive groupBy, but the hot "
    "keys spread over 16 partitions before the final merge.",
)
def skew_salted_agg(spark, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        keys=["l_returnflag"],
        aggs={
            "n": (F.count(F.lit(1)), F.sum("n")),
            "_sq": (F.sum("l_quantity"), F.sum("_sq")),
        },
    )
    return out.select(
        "l_returnflag", "n", F.round("_sq", 2).alias("sum_qty")
    )


@query(
    "skew_salted_join",
    oracle="""
    SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    description="Salt-and-replicate join on a 25-value key — "
    "row-identical to the plain join; the salt spreads each hot key "
    "over 8 tasks.",
)
def skew_salted_join(spark, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    joined = replicate_broadcast_join(cust, nation, key="c_nationkey")
    return joined.groupBy("n_name").agg(F.count(F.lit(1)).alias("n_customers"))

# ---------------------------------------------------------------------------
# Join-key skew diagnosis (the report that decides WHICH remedy)
# ---------------------------------------------------------------------------

@query(
    "join_skew_report",
    oracle="""
    WITH freq AS (
      SELECT l_orderkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY l_orderkey
    ), tot AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(MAX(cnt) AS BIGINT) AS max_cnt
      FROM freq
    ), hist AS (
      SELECT CAST(CASE WHEN cnt = 1 THEN 0
                  ELSE CAST(floor(ln(cnt) / ln(2)) AS BIGINT) END
             AS BIGINT) AS log2_bucket,
             CAST(COUNT(*) AS BIGINT) AS n_keys_in_bucket,
             CAST(SUM(cnt) AS BIGINT) AS n_rows_in_bucket
      FROM freq GROUP BY 1
    )
    SELECT h.log2_bucket, h.n_keys_in_bucket, h.n_rows_in_bucket,
           t.n_keys AS total_keys, t.max_cnt AS hottest_key_rows,
           (t.max_cnt * t.n_keys > 4 * t.n) AS skew_flag
    FROM hist h CROSS JOIN tot t
    """,
    description="Join-key skew DIAGNOSIS over the fact table's join "
    "key: log2-bucketed key-frequency histogram plus the hottest "
    "key's row count and an integer-exact skew flag (hottest > 4x "
    "the mean key size, the heuristic AQE's skewedPartitionFactor "
    "encodes) — the report that decides WHICH remedy applies before "
    "a big join: under the flag, salt the key "
    "(operators/skew.py remedies) or lean on AQE skew splitting; "
    "without it, a plain hash join is fine.  One hash aggregate to "
    "the key-frequency table, a second to the constant-size "
    "histogram; nothing data-scale leaves the executors, and the "
    "cross-joined totals row is scalar.  The skew comparison is "
    "exact integer cross-multiplication, no float boundary.",
)
def join_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    freq = li.groupBy(F.col("l_orderkey").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot = freq.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("cnt").cast("long").alias("max_cnt"),
    )
    bucket = F.when(F.col("cnt") == 1, F.lit(0)).otherwise(
        F.floor(F.log(F.col("cnt").cast("double")) / F.log(F.lit(2.0)))
    )
    hist = freq.groupBy(
        bucket.cast("long").alias("log2_bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_keys_in_bucket"),
        F.sum("cnt").cast("long").alias("n_rows_in_bucket"),
    )
    return hist.crossJoin(F.broadcast(tot)).select(
        "log2_bucket",
        "n_keys_in_bucket",
        "n_rows_in_bucket",
        F.col("n_keys").alias("total_keys"),
        F.col("max_cnt").alias("hottest_key_rows"),
        (F.col("max_cnt") * F.col("n_keys") > 4 * F.col("n")).alias(
            "skew_flag"
        ),
    )
