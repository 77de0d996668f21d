"""Measure catalog queries under the DRIVER'S vanilla session.

The driver's correctness harness builds a plain
``SparkSession.builder.master("local[8]").getOrCreate()`` — Spark's
legacy 200 shuffle partitions, no engine tuning.  The iterative
operators' per-round convergence actions (eager localCheckpoint +
count) each schedule shuffle-partition-many near-empty tasks there,
so this probe times queries SOLO under that exact session shape to
verify the loops are vanilla-session-safe (round-12 verdict item #3:
golden_record_merge <= ~3 s at sf0.01).

Usage: python tools/vanilla_probe.py [query ...]  (default: the
iterative family).  Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT = [
    "golden_record_merge",
    "entity_resolution_e2e",
    "boruvka_msf",
    "k_core_peel",
    "label_propagation_communities",
    "k_truss_edges",
    "cheapest_path_bounded",
    "kmeans_lloyd_exact",
    "ppr_seeded",
    "harmonic_centrality_3hop",
    "dag_longest_path_layers",
    "pagerank_suppliers",
    "hits_authorities",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    sf = os.environ.get("VANILLA_SF_DIR", "/root/testdata/sf0.01")
    from pyspark.sql import SparkSession

    # the driver's session: NO engine tuning beyond what every Spark
    # user gets out of the box (nanosAsLong is a reader necessity for
    # the driver testdata, set by the driver harness too)
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .appName("vanilla-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    assert spark.conf.get("spark.sql.shuffle.partitions") == "200"

    import __spark_entry__ as entry

    qs = entry.queries()
    # Warm the session the way the driver's full sim is warm by the
    # time it reaches any given query: table footers read, codegen /
    # broadcast machinery exercised once.  Cold-JVM startup is a
    # per-SESSION cost, not a per-query one — timing it against the
    # first query in the list would mis-attribute ~5 s.
    from dados_publicos_etl_spark.schemas import TABLE_NAMES

    for t in TABLE_NAMES:
        spark.read.parquet(os.path.join(sf, f"{t}.parquet")).count()
    qs["q1_pricing_summary"](spark, sf).count()

    out = {}
    for name in names:
        t0 = time.monotonic()
        n = qs[name](spark, sf).count()
        out[name] = {"sec": round(time.monotonic() - t0, 3), "rows": n}
        print(f"{name:35s} {out[name]['sec']:8.2f}s  {n} rows",
              file=sys.stderr)
    print(json.dumps({"sf_dir": sf, "queries": out}))


if __name__ == "__main__":
    main()
