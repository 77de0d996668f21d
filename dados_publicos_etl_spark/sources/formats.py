"""JSON / binary-file sources (SURVEY.md §2.A S1-S3 mapping).

The reference's ingest path (HTTP scrape -> zip -> transcode ->
object storage, /root/reference/src/utils/scraping.py:23-91) is
driver-side by nature; once bytes land on storage, these are the
Spark-native readers the engine uses:

- ``binaryFile`` replaces the reference's whole-file byte handling
  (zip members, BOM checks) with a distributed (path, length,
  content) scan — the entry point for multimodal payloads.
- JSON with explicit schema replaces ad-hoc json parsing; inference
  is opt-in, mirroring io.read_csv.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    multiline: bool = False,
) -> DataFrame:
    reader = spark.read.option("multiLine", str(multiline).lower())
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Distributed whole-file scan: (path, modificationTime, length,
    content) — content is BinaryType, feed it to
    operators.multimodal.to_multimodal / extract_byte_features."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def read_orc(
    spark: SparkSession, path: str, merge_schema: bool = False
) -> DataFrame:
    """ORC scan — columnar like parquet (vectorized reader, predicate
    pushdown, column pruning all apply); the warehouse-interop format
    when the catalog standardizes on ORC instead of parquet."""
    return (
        spark.read.option("mergeSchema", str(merge_schema).lower()).orc(path)
    )


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str = "snappy",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_text(
    spark: SparkSession, path: str, whole_text: bool = False
) -> DataFrame:
    """Raw line source: one string column ``value`` per line (or per
    file with whole_text) — the pre-tokenization entry for text
    corpora that aren't yet column-structured.  NB the reader kwarg
    (not ``.option("wholetext", ...)``, which Spark silently
    ignores)."""
    return spark.read.text(path, wholetext=whole_text)
