#!/usr/bin/env python
"""Run any catalog query by name from the command line.

The user-facing entry point for ad-hoc use and for `spark-submit`
jobs (docs/deployment.md): one query per invocation, parquet or CSV
out, exit code as the success signal.

Usage:
    python tools/run_query.py NAME [--sf DIR] [--out PATH]
                              [--format parquet|csv] [--show N]
    python tools/run_query.py --list

With --out the result is written (overwrite) and the row count
printed; without it the first --show rows (default 20) print to
stdout.  On a cluster, submit this file with the engine zip on
--py-files and pass object-store URIs for --sf/--out.
"""
from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("name", nargs="?", help="catalog query name")
    ap.add_argument("--list", action="store_true", help="list queries")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--out", default=None)
    ap.add_argument("--format", default="parquet",
                    choices=["parquet", "csv"])
    ap.add_argument("--show", type=int, default=20)
    args = ap.parse_args()

    from dados_publicos_etl_spark.plans import QUERIES
    from dados_publicos_etl_spark.plans import catalog  # noqa: F401

    if args.list:
        for name, spec in sorted(QUERIES.items()):
            kind = "oracle" if spec.oracle else "rows-only"
            print(f"{name:40s} {kind}")
        return 0
    if not args.name:
        print("error: query name required (or --list)", file=sys.stderr)
        return 2
    if args.name not in QUERIES:
        import difflib

        close = difflib.get_close_matches(args.name, QUERIES, n=3)
        print(f"error: unknown query {args.name!r}"
              + (f"; did you mean {close}?" if close else ""),
              file=sys.stderr)
        return 2

    from dados_publicos_etl_spark.session import get_session

    spark = get_session(app_name=f"run_query:{args.name}")
    spark.sparkContext.setLogLevel("ERROR")
    df = QUERIES[args.name].fn(spark, args.sf)
    if args.out:
        w = df.write.mode("overwrite")
        if args.format == "csv":
            w.option("header", "true").csv(args.out)
        else:
            w.parquet(args.out)
        n = spark.read.format(args.format).load(args.out).count() \
            if args.format == "parquet" else \
            spark.read.option("header", "true").csv(args.out).count()
        print(f"{args.name}: {n} rows -> {args.out}")
    else:
        df.show(args.show, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
