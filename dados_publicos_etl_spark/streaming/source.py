"""Shared streaming file source for the events table.

Structured Streaming's file source needs an explicit schema, and the
driver testdata has carried both TIMESTAMP(NANOS) and TIMESTAMP(MICROS)
``ts`` columns across rounds.  Declaring ``ts long`` keeps NANOS files
readable (``spark.sql.legacy.parquet.nanosAsLong``), but the raw int64
must then be rescaled by the unit the WRITER used — so every streaming
reader goes through this one helper, which sniffs the unit from the
parquet footer exactly like the batch path (``io.read_table``) does.
Hardcoding a unit is the 1970-windows bug class.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dados_publicos_etl_spark.io import epoch_micros_sql, parquet_ts_unit

EVENTS_RAW_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)


def read_event_stream(
    spark: SparkSession, sf_dir: str, ntz: bool = False
) -> DataFrame:
    """``readStream`` over ``<sf_dir>/events.parquet`` with ``ts``
    normalized to a microsecond timestamp.

    ``ntz=False`` (default) yields TIMESTAMP (LTZ) — required by
    watermarks; render window bounds through ``to_utc_timestamp`` to
    stay session-timezone-stable.  ``ntz=True`` yields TIMESTAMP_NTZ
    (UTC wall time), matching the batch path for operators that only
    format/compare timestamps.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    unit = parquet_ts_unit(os.path.join(sf_dir, "events.parquet"), "ts")
    micros = epoch_micros_sql("ts", unit)
    if ntz:
        ts_expr = (
            f"timestampadd(MICROSECOND, {micros}, "
            "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
        )
    else:
        ts_expr = f"timestamp_micros({micros})"
    return (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.expr(ts_expr))
    )
