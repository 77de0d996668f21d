#!/usr/bin/env python
"""Regenerate the frozen sf0.01 golden parquets for the no-oracle
(seeded / model-dependent) queries pinned by tests/test_golden_seeded.py.

Run DELIBERATELY when a seed or algorithm changes — never to paper
over an unexplained diff.  Normalization matches the test: columns
sorted by name, rows sorted by all columns, index dropped.

    python tools/gen_goldens.py [query ...]   # default: all pinned
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

GOLDEN_SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    from test_golden_seeded import GOLDEN_DIR, SEEDED_QUERIES

    from dados_publicos_etl_spark.plans import QUERIES
    from dados_publicos_etl_spark.plans import catalog  # noqa: F401
    from dados_publicos_etl_spark.session import get_session

    names = sys.argv[1:] or SEEDED_QUERIES
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_session(
        app_name="gen-goldens", master="local[8]", shuffle_partitions=8
    )
    for name in names:
        pdf = QUERIES[name].fn(spark, GOLDEN_SF_DIR).toPandas()
        cols = sorted(pdf.columns)
        pdf = pdf[cols].sort_values(cols).reset_index(drop=True)
        out = os.path.join(GOLDEN_DIR, f"{name}_sf0.01.parquet")
        pdf.to_parquet(out)
        print(f"{name}: {len(pdf)} rows -> {out}")
    spark.stop()


if __name__ == "__main__":
    main()
