#!/usr/bin/env python
"""Catalog-wide driver-collect audit: run EVERY registered query at
1x and at an FK-consistent 10x replica with ``DataFrame.collect``
wrapped by a size recorder, and report each query's largest internal
driver collect at both scales.

This is the evidence behind the round-9 standing audit
(``tests/test_plans.py::test_driver_collects_bounded_at_10x``): a
distributed operator may pull CONSTANT-bounded panels/offsets to the
driver, or a training sample HARD-CAPPED by a plan-level ``limit``
(_IVF_TRAIN_CAP) — never a relation that grows with the corpus.  The
r8 verdict found exactly one violator (dedup_semantic_cells trained
on a 6.25n-row collect); this tool is how that class stays dead.

Usage: python tools/collect_audit.py [sf_dir] [n_copies]
Emits one JSON line: {"sf_dir", "n_copies", "queries": {name:
[c1, c10]}, "errors": {...}} — only queries with at least one
internal collect appear.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from dados_publicos_etl_spark.plans import QUERIES  # noqa: E402
from dados_publicos_etl_spark.plans import catalog  # noqa: E402,F401
from dados_publicos_etl_spark.session import get_session  # noqa: E402


def install_recorder():
    """Wrap the classic DataFrame.collect with a row-count recorder.
    Returns the live list of sizes (clear() between queries)."""
    from pyspark.sql.classic.dataframe import DataFrame as CDF

    sizes: list[int] = []
    orig = CDF.collect

    def spy(self):
        rows = orig(self)
        sizes.append(len(rows))
        return rows

    CDF.collect = spy
    return sizes


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n_copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_session(app_name="collect_audit", master="local[16]",
                        shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    sizes = install_recorder()

    from tools.scale_probe import replicate_corpus

    tmp = tempfile.mkdtemp(prefix="collect_audit_10x_")
    replicate_corpus(spark, sf, tmp, n_copies)

    errors: dict[str, str] = {}

    def sweep(d: str) -> dict[str, int]:
        out: dict[str, int] = {}
        for name in sorted(QUERIES):
            sizes.clear()
            try:
                QUERIES[name].fn(spark, d).count()
            except Exception as ex:  # keep auditing the rest
                errors[f"{name}@{d}"] = str(ex).split("\n")[0][:160]
                continue
            if sizes:
                out[name] = max(sizes)
        return out

    c1, c10 = sweep(sf), sweep(tmp)
    print(json.dumps({
        "sf_dir": sf, "n_copies": n_copies,
        "queries": {k: [c1.get(k, 0), c10.get(k, 0)]
                    for k in sorted(set(c1) | set(c10))},
        "errors": errors,
    }))


if __name__ == "__main__":
    main()
