"""dados_publicos_etl_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference ETL pipeline
(ksantanac/dados-publicos-etl, a Receita Federal / CNAE public-data
medallion pipeline: raw -> trusted -> refined -> warehouse) as an
idiomatic, Spark-first library, and extends it with the LLM-data-
pipeline operators (dedup, similarity search, multimodal columns,
text analysis) designed for 100 TB scale.

Design stance (SURVEY.md §7):
- DataFrame-in / DataFrame-out operators; Catalyst plans everything.
- One explicit schema registry (``schemas.py``); inference is opt-in.
- Storage layers are plain paths (any Hadoop-compatible FS); the
  warehouse sink is ``saveAsTable`` — cloud connectors are optional
  adapters, never hard dependencies.
- Python stays on the driver for orchestration only; per-row Python
  is banned from hot paths (Pandas UDFs where unavoidable).
"""

from dados_publicos_etl_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
