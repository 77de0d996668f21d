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
