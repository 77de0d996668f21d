"""Deterministic sampling operators (north-star extension: corpus
curation needs reproducible samples — data mixes, eval splits, audit
subsets — not ``rand()``).

Both operators key the sampling decision on a cryptographic hash of
the ROW's stable id, never on partition-dependent randomness:

- the decision is reproducible across runs, engines, cluster sizes
  and partitionings (``F.rand`` is only per-partition-seeded, so a
  repartition reshuffles the sample);
- it needs no shuffle for the Bernoulli form — a narrow filter over
  the scan at 100 TB;
- the per-group fixed-size form is one window pass: hash-order within
  group is uniform, so rank <= k is a uniform k-sample without
  replacement per group.

Oracles reproduce the exact same md5-bucket decisions in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dados_publicos_etl_spark.io import read_table
from dados_publicos_etl_spark.plans.registry import query


def hash_bucket(c: Column | str, buckets: int = 256) -> Column:
    """Uniform bucket in [0, buckets) from md5 of the id's string form.

    Uses the first 8 hex chars (32 bits) — enough entropy for rate
    control; identical SQL exists on any engine with md5().
    """
    col = F.col(c) if isinstance(c, str) else c
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % buckets
    )


def sample_bernoulli(df: DataFrame, id_col: str, rate: float) -> DataFrame:
    """Deterministic Bernoulli sample: keep ~rate of rows, stable
    across runs/partitionings."""
    return df.filter(hash_bucket(id_col, 10_000) < int(rate * 10_000))


_RATES = {"en": 64, "es": 128, "fr": 128, "de": 128, "zh": 128}  # /256


@query(
    "sample_stratified",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                AS BIGINT) % 256)
          < (CASE lang {" ".join(f"WHEN '{k}' THEN {v}" for k, v in _RATES.items())}
             ELSE 0 END)
    """,
    description="Stratified deterministic sampling: per-language keep "
    "rates (en 25%, others 50%) decided by md5(doc_id) bucket — "
    "reproducible on any engine/partitioning, zero shuffle.",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Down-sample the dominant language (data-mix rebalancing)."""
    docs = read_table(spark, sf_dir, "documents")
    rate = F.lit(0)
    for lang, r in _RATES.items():
        rate = F.when(F.col("lang") == lang, r).otherwise(rate)
    return docs.filter(hash_bucket("doc_id") < rate).select("doc_id", "lang")


_K_PER_GROUP = 20


@query(
    "sample_pergroup",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents
    )
    SELECT doc_id, lang, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= {_K_PER_GROUP}
    """,
    description=f"Fixed-size uniform sample per group ({_K_PER_GROUP} "
    "docs/language): rank by md5(doc_id) within group — a "
    "deterministic reservoir; one window pass, skew-free.",
)
def sample_pergroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= _K_PER_GROUP)
    )
