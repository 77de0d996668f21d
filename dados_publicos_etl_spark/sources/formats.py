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
