"""MERGE / upsert emulation (SURVEY.md §2.B 'CDC / SCD2').

Spark without Delta/Iceberg has no MERGE INTO; the engine provides
the standard emulation — anti-join out the matched keys, union the
source — which is exactly what a MERGE ... WHEN MATCHED UPDATE WHEN
NOT MATCHED INSERT computes for full-row updates.  At scale both
sides shuffle once on the key (or zero times if both are bucketed on
it; see tests/test_sources_warehouse.py::test_bucketed_join_has_no_shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dados_publicos_etl_spark.io import read_table
from dados_publicos_etl_spark.plans.registry import query


def upsert(target: DataFrame, source: DataFrame, key: str) -> DataFrame:
    """MERGE: source rows win on key collision; unmatched target rows
    survive; source-only keys insert.  Schemas must match."""
    kept = target.join(source, on=key, how="left_anti")
    return kept.unionByName(source)


def scd2_close_and_append(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    version_col: str = "version",
) -> DataFrame:
    """SCD2-lite: bump ``version`` for updated keys, append new rows.

    ``current`` rows for updated keys are retained (history) with
    their old version; updates come in as version+1.
    """
    max_v = (
        current.groupBy(key).agg(F.max(version_col).alias("_maxv"))
    )
    stamped = (
        updates.join(max_v, on=key, how="left")
        .withColumn(
            version_col, F.coalesce(F.col("_maxv") + 1, F.lit(1))
        )
        .drop("_maxv")
    )
    return current.unionByName(stamped)


@query(
    "merge_upsert",
    oracle="""
    WITH source AS (
      SELECT c_custkey, c_name, c_nationkey, c_acctbal, 'VIP' AS c_mktsegment
      FROM customer
      WHERE c_acctbal > 5000
    ), merged AS (
      SELECT * FROM customer
      WHERE c_custkey NOT IN (SELECT c_custkey FROM source)
      UNION ALL
      SELECT * FROM source
    )
    SELECT c_mktsegment, COUNT(*) AS n,
           (CAST(SUM(CAST(ROUND((c_acctbal) * 100, 0) AS BIGINT)) AS DOUBLE)
            / 100.0) AS total_balance
    FROM merged
    GROUP BY c_mktsegment
    """,
    description="MERGE INTO emulation (anti-join + union): upsert a "
    "derived 'VIP' segment for high-balance customers, then audit the "
    "segment distribution.",
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    source = cust.filter(F.col("c_acctbal") > 5000).withColumn(
        "c_mktsegment", F.lit("VIP")
    )
    merged = upsert(cust, source, key="c_custkey")
    from dados_publicos_etl_spark.functions.numeric import money_sum

    return merged.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        money_sum("c_acctbal").alias("total_balance"),
    )


@query(
    "scd2_history",
    oracle="""
    WITH changes AS (
      SELECT user_id, ts, event_id, event_type AS status,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_status
      FROM events
    ), versions AS (
      SELECT user_id, ts, event_id, status,
             LEAD(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS next_ts
      FROM changes
      WHERE prev_status IS NULL OR status <> prev_status
    )
    SELECT user_id, status,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
           COALESCE(strftime(next_ts, '%Y-%m-%d %H:%M:%S.%f'),
                    '9999-12-31 00:00:00.000000') AS valid_to,
           next_ts IS NULL AS is_current
    FROM versions
    """,
    description="SCD2 dimension build from an event log: collapse "
    "consecutive same-status events (lag), then derive "
    "valid_from/valid_to intervals (lead) with an open-ended current "
    "row — the standard two-window type-2 history derivation, one "
    "shuffle on the business key.",
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 history: each user's event_type treated as a slowly
    changing 'status'; output one validity interval per status run.

    NOTE the LEAD is over the CHANGE rows only (post-filter), so an
    interval closes when the NEXT DIFFERENT status begins — runs of
    the same status stay one interval.
    """
    from pyspark.sql import Window as W

    ev = read_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.col("event_type").alias("status"),
        F.lag("event_type").over(w).alias("prev_status"),
    ).filter(
        F.col("prev_status").isNull()
        | (F.col("status") != F.col("prev_status"))
    )
    w2 = W.partitionBy("user_id").orderBy("ts", "event_id")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    versions = changes.select(
        "user_id",
        "status",
        F.date_format("ts", fmt).alias("valid_from"),
        F.coalesce(
            F.date_format(F.lead("ts").over(w2), fmt),
            F.lit("9999-12-31 00:00:00.000000"),
        ).alias("valid_to"),
        F.lead("ts").over(w2).isNull().alias("is_current"),
    )
    return versions


# ---------------------------------------------------------------------------
# Full tri-state MERGE (update / insert / delete) with action audit
# ---------------------------------------------------------------------------


@query(
    "merge_tristate",
    oracle="""
    WITH target AS (
      SELECT c_custkey AS k, c_mktsegment AS seg,
             CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS bal_cents
      FROM customer WHERE c_custkey % 3 <> 0
    ), source AS (
      SELECT c_custkey AS k, 'RESEG' AS seg,
             CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) + 100 AS bal_cents
      FROM customer WHERE c_custkey % 2 = 0
    )
    SELECT COALESCE(t.k, s.k) AS k,
           CASE WHEN t.k IS NOT NULL AND s.k IS NOT NULL THEN 'update'
                WHEN s.k IS NOT NULL THEN 'insert'
                ELSE 'delete' END AS action,
           CASE WHEN s.k IS NOT NULL THEN s.seg ELSE t.seg END AS seg,
           CASE WHEN s.k IS NOT NULL THEN s.bal_cents
                ELSE t.bal_cents END AS bal_cents,
           (s.k IS NULL) AS removed
    FROM target t FULL OUTER JOIN source s ON t.k = s.k
    """,
    description="Full tri-state MERGE semantics (the Delta/Iceberg "
    "MERGE INTO contract): WHEN MATCHED -> update, WHEN NOT MATCHED "
    "BY TARGET -> insert, WHEN NOT MATCHED BY SOURCE -> delete — "
    "implemented as ONE null-safe full-outer join + row-local CASE "
    "(one key shuffle; never three separate scans/anti-joins), "
    "emitting the action audit log a lakehouse MERGE materializes "
    "alongside the data.  Deterministic mod-keyed target/source "
    "stand in for yesterday's table and today's feed; the `removed` "
    "flag is what the destructive writer filters on, so audit and "
    "apply share one plan.",
)
def merge_tristate(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100, 0).cast("long")
    target = cust.filter(F.col("c_custkey") % 3 != 0).select(
        F.col("c_custkey").alias("t_k"),
        F.col("c_mktsegment").alias("t_seg"),
        cents.alias("t_bal"),
    )
    source = cust.filter(F.col("c_custkey") % 2 == 0).select(
        F.col("c_custkey").alias("s_k"),
        F.lit("RESEG").alias("s_seg"),
        (cents + 100).alias("s_bal"),
    )
    j = target.join(source, target.t_k == source.s_k, "full_outer")
    in_t, in_s = F.col("t_k").isNotNull(), F.col("s_k").isNotNull()
    return j.select(
        F.coalesce("t_k", "s_k").alias("k"),
        F.when(in_t & in_s, "update")
        .when(in_s, "insert")
        .otherwise("delete")
        .alias("action"),
        F.when(in_s, F.col("s_seg")).otherwise(F.col("t_seg")).alias("seg"),
        F.when(in_s, F.col("s_bal"))
        .otherwise(F.col("t_bal"))
        .alias("bal_cents"),
        (~in_s).alias("removed"),
    )


# ---------------------------------------------------------------------------
# Point-in-time (PIT) join against the SCD2 history
# ---------------------------------------------------------------------------


@query(
    "scd2_pit_join",
    oracle="""
    WITH changes AS (
      SELECT user_id, ts, event_id, event_type AS status,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_status
      FROM events
    ), versions AS (
      SELECT user_id, status, ts AS vf,
             LEAD(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS vt
      FROM changes
      WHERE prev_status IS NULL OR status <> prev_status
    ), facts AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT v.status,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           (CAST(SUM(CAST(ROUND((f.value) * 100, 0) AS BIGINT)) AS DOUBLE)
            / 100.0) AS sum_value
    FROM facts f
    JOIN versions v
      ON f.user_id = v.user_id
     AND f.ts >= v.vf AND (v.vt IS NULL OR f.ts < v.vt)
    GROUP BY 1
    """,
    description="Point-in-time correct dimension join: purchase facts "
    "joined to the SCD2 status interval that was valid AT THE FACT'S "
    "OWN EVENT TIME (f.ts in [valid_from, valid_to)) — the lookup "
    "every leakage-safe feature pipeline needs (training features "
    "must reflect the dimension AS OF the label's time, never the "
    "current row).  Spark-first shape: the interval table derives "
    "from the same two-window SCD2 build as scd2_history, the join "
    "is an EQUI-join on the business key with the containment "
    "predicate as a join filter — per-user interval counts are "
    "small, so no BNLJ forms and the shuffle is keyed on user_id "
    "(at a billion users it is the same hash shuffle, just wider); "
    "if per-key interval counts ever explode, the bucketed interval "
    "machinery of interval_bucket_join (plans/events.py) drops in "
    "unchanged.",
)
def scd2_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from dados_publicos_etl_spark.functions.numeric import money_sum

    ev = read_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    versions = (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            F.col("event_type").alias("status"),
            F.lag("event_type").over(w).alias("prev_status"),
        )
        .filter(
            F.col("prev_status").isNull()
            | (F.col("status") != F.col("prev_status"))
        )
        .select(
            F.col("user_id").alias("v_user"),
            "status",
            F.col("ts").alias("vf"),
            F.lead("ts").over(
                W.partitionBy("user_id").orderBy("ts", "event_id")
            ).alias("vt"),
        )
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = facts.join(
        versions,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("ts") >= F.col("vf"))
        & (F.col("vt").isNull() | (F.col("ts") < F.col("vt"))),
    )
    return joined.groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("n_purchases"),
        money_sum("value").alias("sum_value"),
    )
