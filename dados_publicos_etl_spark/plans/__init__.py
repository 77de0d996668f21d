"""Query plans: the engine's query catalog + registry."""

from dados_publicos_etl_spark.plans.registry import QUERIES, QuerySpec, query

__all__ = ["QUERIES", "QuerySpec", "query"]
