"""Streaming sinks: foreachBatch — the micro-batch escape hatch.

``foreachBatch`` hands each micro-batch to arbitrary DataFrame code
(MERGE, multi-sink fan-out, warehouse loads) with the batch_id for
exactly-once bookkeeping.  This is the streaming equivalent of the
reference's per-layer load steps (/root/reference/src/utils/
load_bq.py): each batch is a "layer load" with idempotency keyed on
batch_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_RAW_EVENTS_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)


def stream_events_foreach_batch(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> int:
    """readStream the events table and land per-event-type counts via
    foreachBatch parquet writes; returns the number of micro-batches
    processed.

    Exactly-once: the output path embeds batch_id, so a replayed
    batch overwrites its own directory instead of double-appending
    (the standard idempotent-foreachBatch pattern).  The checkpoint
    dir gives source-offset recovery; together they make the sink
    restart-safe.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    n_batches = {"n": 0}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .write.mode("overwrite")
            .parquet(f"{out_dir}/batch_id={batch_id}")
        )
        n_batches["n"] += 1

    # layout-aware (see streaming/source.py): directory-layout tables
    # stream directly, single-file layout keeps the leaf-name filter
    import os

    table = f"{sf_dir}/events.parquet"
    if os.path.isdir(table):
        stream = spark.readStream.schema(_RAW_EVENTS_SCHEMA).parquet(table)
    else:
        stream = (
            spark.readStream.schema(_RAW_EVENTS_SCHEMA)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches["n"]


from dados_publicos_etl_spark.plans.registry import query  # noqa: E402

# (sf_dir,) -> TemporaryDirectory holding the 2-file split copy of
# events used to force multiple micro-batches (scaffolding for an
# external CDC feed; cached so repeat invocations measure the merge)
_CDC_FEED_DIRS: dict[tuple, object] = {}

# state dirs of completed runs — kept for the session so returned
# DataFrames stay readable; removed by finalizers at interpreter exit
_CDC_STATE_DIRS: list = []


def _cdc_feed_dir(spark: SparkSession, sf_dir: str) -> str:
    import tempfile

    key = (sf_dir,)
    hit = _CDC_FEED_DIRS.get(key)
    if hit is not None:
        return hit.name
    tmp = tempfile.TemporaryDirectory(prefix="spark_cdc_feed_")
    # point at the exact table path: works whether events.parquet is
    # the testdata's single FILE or a directory of part files (the
    # scale-probe replica layout) — a pathGlobFilter on the parent
    # dir would match only the leaf-FILE form and feed NOTHING on a
    # directory layout
    src = spark.read.schema(_RAW_EVENTS_SCHEMA).parquet(
        f"{sf_dir}/events.parquet"
    )
    for half in (0, 1):
        (
            src.filter(F.col("event_id") % 2 == half)
            .coalesce(1)
            .write.mode("append")
            .parquet(tmp.name)
        )
    _CDC_FEED_DIRS[key] = tmp
    return tmp.name


@query(
    "stream_cdc_upsert",
    oracle="""
    WITH per AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY user_id
    ), ranked AS (
      SELECT user_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rk
      FROM events
    )
    SELECT p.user_id, p.n_events,
           r.event_type AS last_type,
           ROUND(r.value, 2) AS last_value
    FROM per p JOIN ranked r ON p.user_id = r.user_id AND r.rk = 1
    """,
    description="Streaming CDC upsert end-to-end: a 2-file event feed "
    "streams in micro-batches (maxFilesPerTrigger=1); each batch "
    "aggregates per-user state (count + max_by latest event) and "
    "MERGES it into the persisted state table — counts add, latest-"
    "event wins by (ts, event_id) ACROSS batches, so the result is "
    "batch-split-invariant and equals the batch oracle over the "
    "whole feed.  The foreachBatch-merge loop is the standard "
    "warehouse CDC shape; state versions alternate directories so a "
    "batch never reads the file it overwrites.",
)
def stream_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from dados_publicos_etl_spark.io import parquet_ts_unit, epoch_micros_sql
    from dados_publicos_etl_spark.streaming.windows import _streaming_shuffle

    feed = _cdc_feed_dir(spark, sf_dir)
    unit = parquet_ts_unit(f"{sf_dir}/events.parquet")
    state_tmp = tempfile.TemporaryDirectory(prefix="spark_cdc_state_")
    state = {"path": None, "version": 0}

    def upsert(batch_df: DataFrame, _bid: int) -> None:
        b = (
            batch_df.withColumn(
                "ts_us", F.expr(epoch_micros_sql("ts", unit))
            )
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.max(
                    F.struct("ts_us", "event_id", "event_type", "value")
                ).alias("last"),
            )
        )
        if state["path"] is not None:
            s = spark.read.parquet(state["path"]).alias("s")
            merged = (
                s.join(b.alias("b"), "user_id", "full_outer")
                .select(
                    "user_id",
                    (
                        F.coalesce(F.col("s.n_events"), F.lit(0))
                        + F.coalesce(F.col("b.n_events"), F.lit(0))
                    ).alias("n_events"),
                    F.greatest(
                        F.col("s.last"), F.col("b.last")
                    ).alias("last"),
                )
            )
        else:
            merged = b
        state["version"] += 1
        new_path = f"{state_tmp.name}/v{state['version']}"
        merged.write.mode("overwrite").parquet(new_path)
        state["path"] = new_path

    stream = (
        spark.readStream.schema(_RAW_EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    with _streaming_shuffle(spark):
        q = stream.writeStream.foreachBatch(upsert).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    # the state table is DATA-scale (one row per user) — never
    # collect it; keep the final version's directory alive for the
    # session (finalizer removes it at exit) and hand back the scan
    _CDC_STATE_DIRS.append(state_tmp)
    return spark.read.parquet(state["path"]).select(
        "user_id",
        "n_events",
        F.col("last.event_type").alias("last_type"),
        F.round(F.col("last.value"), 2).alias("last_value"),
    )


_SHQ_BIN = 10  # fixed value-bin width (values ~0-500 -> ~50 bins/type)


@query(
    "stream_histogram_quantile",
    oracle=f"""
    WITH bins AS (
      SELECT event_type,
             CAST(floor(value / {_SHQ_BIN}) AS BIGINT) AS bin,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY event_type, bin
    ), cum AS (
      SELECT event_type, bin, cnt,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
             SUM(cnt) OVER (PARTITION BY event_type) AS n
      FROM bins
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n,
           CAST(MIN(CASE WHEN cum * 2 >= n
                    THEN (bin + 1) * {_SHQ_BIN} END) AS BIGINT)
             AS p50_upper,
           CAST(MIN(CASE WHEN cum * 10 >= n * 9
                    THEN (bin + 1) * {_SHQ_BIN} END) AS BIGINT)
             AS p90_upper
    FROM cum GROUP BY event_type
    """,
    description="STREAMING quantiles via the mergeable fixed-bin "
    "histogram: each micro-batch aggregates its (event_type, bin) "
    "counts and foreachBatch ADDS them into a versioned state table "
    "— count addition commutes, so the result is batch-split-"
    "invariant and equals the batch quantile oracle over the whole "
    "feed; the serving read derives p50/p90 by integer threshold "
    "crossing.  State is bins x types (bounded by value range / bin "
    "width), NOT rows — the streaming percentile monitor that never "
    "grows with traffic, vs approx_percentile which cannot run on "
    "an unbounded stream at all.  Composes histogram_quantile_"
    "mergeable's merge law with the stream_cdc_upsert machinery.",
)
def stream_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pyspark.sql import Window as W

    from dados_publicos_etl_spark.streaming.windows import (
        _streaming_shuffle,
    )

    feed = _cdc_feed_dir(spark, sf_dir)
    state_tmp = tempfile.TemporaryDirectory(prefix="spark_shq_state_")
    state = {"path": None, "version": 0}

    def merge_hist(batch_df: DataFrame, _bid: int) -> None:
        b = batch_df.groupBy(
            "event_type",
            F.floor(F.col("value") / _SHQ_BIN).cast("long").alias("bin"),
        ).agg(F.count(F.lit(1)).alias("cnt"))
        if state["path"] is not None:
            s = spark.read.parquet(state["path"])
            b = (
                s.unionByName(b)
                .groupBy("event_type", "bin")
                .agg(F.sum("cnt").alias("cnt"))
            )
        state["version"] += 1
        new_path = f"{state_tmp.name}/v{state['version']}"
        b.write.mode("overwrite").parquet(new_path)
        state["path"] = new_path

    stream = (
        spark.readStream.schema(_RAW_EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    with _streaming_shuffle(spark):
        q = stream.writeStream.foreachBatch(merge_hist).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    _CDC_STATE_DIRS.append(state_tmp)
    hist = spark.read.parquet(state["path"])
    wcum = W.partitionBy("event_type").orderBy("bin")
    wall = W.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "bin",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )
    return cum.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.min(
            F.when(
                F.col("cum") * 2 >= F.col("n"),
                (F.col("bin") + 1) * _SHQ_BIN,
            )
        )
        .cast("long")
        .alias("p50_upper"),
        F.min(
            F.when(
                F.col("cum") * 10 >= F.col("n") * 9,
                (F.col("bin") + 1) * _SHQ_BIN,
            )
        )
        .cast("long")
        .alias("p90_upper"),
    )


@query(
    "stream_kl_drift",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY day, event_type
    ), day_tot AS (
      SELECT day, CAST(SUM(c) AS BIGINT) AS n_d
      FROM daily GROUP BY day
    ), gmix AS (
      SELECT event_type, CAST(SUM(c) AS BIGINT) AS g
      FROM daily GROUP BY event_type
    ), gtot AS (
      SELECT CAST(SUM(g) AS BIGINT) AS n_g FROM gmix
    )
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           t.n_d AS n_events,
           ROUND(SUM((CAST(d.c AS DOUBLE) / t.n_d)
                     * LN((CAST(d.c AS DOUBLE) / t.n_d)
                          / (CAST(g.g AS DOUBLE) / gt.n_g))), 6)
             AS kl_nat
    FROM daily d
    JOIN day_tot t ON d.day = t.day
    JOIN gmix g ON d.event_type = g.event_type
    CROSS JOIN gtot gt
    GROUP BY d.day, t.n_d
    """,
    description="STREAMING drift monitor: each micro-batch's "
    "(day, event_type) counts are ADDED into a versioned state "
    "table by foreachBatch (count addition commutes -> batch-split-"
    "invariant, equals the batch oracle over the whole feed), and "
    "the serving read computes per-day KL divergence of that day's "
    "event mix against the all-time mix.  State is days x "
    "event-types — calendar-bounded, never row-bounded — so the "
    "monitor runs forever at constant memory; the alerting read "
    "costs O(state), not O(stream).  Composes the "
    "kl_event_mix_divergence metric with the stream_cdc_upsert "
    "mergeable-state machinery (same law as "
    "stream_histogram_quantile's bin counts).",
)
def stream_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from dados_publicos_etl_spark.streaming.windows import (
        _streaming_shuffle,
    )

    feed = _cdc_feed_dir(spark, sf_dir)
    state_tmp = tempfile.TemporaryDirectory(prefix="spark_skl_state_")
    state = {"path": None, "version": 0}

    def merge_counts(batch_df: DataFrame, _bid: int) -> None:
        b = batch_df.groupBy(
            # NTZ arithmetic: timestamp_micros yields LTZ and would
            # shift the day bucket under a non-UTC driver session
            F.expr(
                "CAST(timestampadd(MICROSECOND, ts, "
                "TIMESTAMP_NTZ '1970-01-01 00:00:00') AS DATE)"
            ).alias("day"),
            "event_type",
        ).agg(F.count(F.lit(1)).alias("c"))
        if state["path"] is not None:
            s = spark.read.parquet(state["path"])
            b = (
                s.unionByName(b)
                .groupBy("day", "event_type")
                .agg(F.sum("c").alias("c"))
            )
        state["version"] += 1
        new_path = f"{state_tmp.name}/v{state['version']}"
        b.write.mode("overwrite").parquet(new_path)
        state["path"] = new_path

    stream = (
        spark.readStream.schema(_RAW_EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    with _streaming_shuffle(spark):
        q = stream.writeStream.foreachBatch(merge_counts).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    _CDC_STATE_DIRS.append(state_tmp)
    daily = spark.read.parquet(state["path"])
    day_tot = daily.groupBy("day").agg(F.sum("c").alias("n_d"))
    gmix = daily.groupBy("event_type").agg(F.sum("c").alias("g"))
    n_g = daily.agg(F.sum("c")).first()[0]
    if not n_g:  # empty feed -> loud, not float(None)
        raise ValueError(
            "stream_kl_drift: the event feed produced no state rows "
            "(empty or unreadable events table?)"
        )
    p_d = F.col("c").cast("double") / F.col("n_d")
    p_g = F.col("g").cast("double") / F.lit(float(n_g))
    return (
        daily.join(day_tot, "day")
        .join(F.broadcast(gmix), "event_type")
        .groupBy("day", "n_d")
        .agg(F.round(F.sum(p_d * F.log(p_d / p_g)), 6).alias("kl_nat"))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("n_d").cast("long").alias("n_events"),
            "kl_nat",
        )
    )


_SHLL_M = 64  # portable HLL registers (p = 6), matching
              # plans/stats2.hll_portable_registers' construction


@query(
    "stream_hll_distinct",
    oracle=f"""
    WITH hashed AS (
      SELECT event_type,
             md5(CAST(user_id AS VARCHAR)) AS h
      FROM events
    ), ranks AS (
      SELECT event_type,
             CAST(('0x' || substr(h, 1, 2)) AS BIGINT) % {_SHLL_M}
               AS bucket,
             CASE WHEN CAST(('0x' || substr(h, 3, 6)) AS BIGINT) = 0
                  THEN 25
                  ELSE 25 - length(bin(CAST(('0x' || substr(h, 3, 6))
                                            AS BIGINT))) END AS r
      FROM hashed
    )
    SELECT event_type, bucket, CAST(MAX(r) AS BIGINT) AS r
    FROM ranks GROUP BY event_type, bucket
    """,
    description="STREAMING distinct-user sketch per event type: each "
    "micro-batch computes its portable md5-derived HLL registers "
    f"({_SHLL_M} per type — the construction "
    "hll_portable_registers differentially proves) and foreachBatch "
    "merges them into a versioned state table by MAX — register max "
    "commutes and is idempotent, so the result is batch-split-"
    "invariant AND replay-safe (at-least-once delivery cannot "
    "corrupt a max-merge), equal to the batch registers over the "
    "whole feed, which is the oracle.  State is |types| x "
    f"{_SHLL_M} rows at ANY traffic volume — the streaming "
    "COUNT(DISTINCT) that a 100 TB/day stream cannot afford "
    "exactly; the serving read derives the estimate from kilobytes "
    "of state.  Completes the mergeable-state sink family: counts "
    "(CDC), histograms (quantiles), KL cells (drift), now "
    "cardinality.",
)
def stream_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from dados_publicos_etl_spark.streaming.windows import (
        _streaming_shuffle,
    )

    feed = _cdc_feed_dir(spark, sf_dir)
    state_tmp = tempfile.TemporaryDirectory(prefix="spark_shll_state_")
    state = {"path": None, "version": 0}

    def regs_of(df: DataFrame) -> DataFrame:
        h = F.md5(F.col("user_id").cast("string"))
        w = F.conv(F.substring(h, 3, 6), 16, 10).cast("long")
        return (
            df.select(
                "event_type",
                (
                    F.conv(F.substring(h, 1, 2), 16, 10).cast("long")
                    % _SHLL_M
                ).alias("bucket"),
                F.when(w == 0, F.lit(25))
                .otherwise(F.lit(25) - F.length(F.bin(w)))
                .cast("long")
                .alias("r"),
            )
            .groupBy("event_type", "bucket")
            .agg(F.max("r").alias("r"))
        )

    def merge_regs(batch_df: DataFrame, _bid: int) -> None:
        b = regs_of(batch_df)
        if state["path"] is not None:
            s = spark.read.parquet(state["path"])
            b = (
                s.unionByName(b)
                .groupBy("event_type", "bucket")
                .agg(F.max("r").alias("r"))
            )
        state["version"] += 1
        new_path = f"{state_tmp.name}/v{state['version']}"
        b.write.mode("overwrite").parquet(new_path)
        state["path"] = new_path

    stream = (
        spark.readStream.schema(_RAW_EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    with _streaming_shuffle(spark):
        q = stream.writeStream.foreachBatch(merge_regs).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    _CDC_STATE_DIRS.append(state_tmp)
    return spark.read.parquet(state["path"]).select(
        "event_type", "bucket", F.col("r").cast("long").alias("r")
    )
