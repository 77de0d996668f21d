"""Query registry: name -> (Spark plan builder, DuckDB oracle SQL).

Each registered query is one operator-coverage proof from SURVEY.md §2:
the Spark side is the idiomatic DataFrame/SQL plan, the oracle is the
ANSI-SQL equivalent DuckDB runs on the same parquet for the driver's
differential check (row-count + schema + order-insensitive value hash).

Rules that keep the differential check stable (see __spark_entry__
contract):
- alias every computed column identically on both sides;
- round every floating aggregate on both sides (Spark's partial
  aggregation order differs from DuckDB's — raw double sums differ in
  the last bits);
- cast integer SUMs to BIGINT in the oracle (DuckDB widens to
  HUGEINT);
- format timestamps to strings when they appear in output;
- deterministic tie-breaks on every LIMIT/top-k.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: SparkQuery
    oracle: str | None  # None => non-SQL-expressible, rows-only check
    description: str = ""


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None, description: str = ""):
    """Decorator registering a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: SparkQuery) -> SparkQuery:
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle,
                                  description=description)
        return fn

    return deco
