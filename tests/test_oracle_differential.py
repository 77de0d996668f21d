"""Differential test: every registered query with an oracle must match
DuckDB on the smoke-scale data (the driver repeats this at sf0.01)."""

from __future__ import annotations

import pytest

from dados_publicos_etl_spark.plans import QUERIES
from dados_publicos_etl_spark.plans import catalog  # noqa: F401
from tests.oracle_harness import compare

NAMES = sorted(QUERIES)


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, sf_dir, name):
    spec = QUERIES[name]
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only smoke for non-SQL-expressible ops
        return
    compare(df, spec.oracle, sf_dir)
