#!/usr/bin/env python
"""Per-query optimization profiler (r12 optimization round).

For each named catalog query (or the top-N slowest from a bench
artifact) this measures, in one tuned session:

  - solo wall time, min of --runs (same count() action as bench.py),
  - the number of Spark JOBS and STAGES the query triggers (via the
    status tracker) — the per-action overhead floor at bench scale is
    job_count x ~60-150 ms, so a high job count IS the finding,
  - the formatted physical plan, with Exchange / BroadcastExchange /
    *EvalPython node counts summarized,
  - optionally writes the plan to plans/r12/<name>_<tag>.txt.

Usage:
  python tools/qprof.py NAME [NAME...] [--sf DIR] [--runs 3]
                        [--plans-dir plans/r12 --tag before]
  python tools/qprof.py --from-artifact BENCH_LOCAL_r12.json --top 30
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def plan_summary(plan: str) -> dict:
    return {
        # \bExchange\b already excludes BroadcastExchange (no word
        # boundary inside the compound name) — no subtraction, which
        # double-counted the exclusion and could go negative (r12
        # advice item).
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "broadcast_exchanges": len(
            re.findall(r"\bBroadcastExchange\b", plan)
        ),
        "sort_merge_joins": len(re.findall(r"\bSortMergeJoin\b", plan)),
        "broadcast_hash_joins": len(
            re.findall(r"\bBroadcastHashJoin\b", plan)
        ),
        "py_eval": len(
            re.findall(r"\b(BatchEvalPython|ArrowEvalPython|MapInArrow|"
                       r"MapInPandas|FlatMapGroupsInPandas)\b", plan)
        ),
        "windows": len(re.findall(r"\bWindow\b", plan)),
        "single_partition": len(
            re.findall(r"\bSinglePartition\b", plan)
        ),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--from-artifact")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    names = list(args.names)
    art = None
    if args.from_artifact:
        with open(args.from_artifact) as fh:
            art = json.load(fh)
        ranked = sorted(art["queries"].items(), key=lambda kv: -kv[1])
        names += [n for n, _ in ranked[: args.top] if n not in names]

    from dados_publicos_etl_spark.plans import QUERIES
    from dados_publicos_etl_spark.plans import catalog  # noqa: F401
    from dados_publicos_etl_spark.session import get_session
    from dados_publicos_etl_spark.io import read_table
    from dados_publicos_etl_spark.schemas import TABLE_NAMES

    spark = get_session(app_name="qprof")
    for t in TABLE_NAMES:
        read_table(spark, args.sf, t).count()

    tracker = spark.sparkContext.statusTracker()
    results: dict[str, dict] = {}
    for name in names:
        if name not in QUERIES:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        spec = QUERIES[name]
        spark.sparkContext.setJobDescription(f"qprof:{name}")
        best = float("inf")
        jobs0 = stages0 = jobs1 = stages1 = 0
        for i in range(args.runs):
            spark.catalog.clearCache()
            for rdd in (
                spark.sparkContext._jsc.getPersistentRDDs().values()
            ):
                rdd.unpersist()
            # job/stage counts via the DAGScheduler's monotone id
            # counters (count of jobs/stages EVER SUBMITTED)
            dag = spark.sparkContext._jsc.sc().dagScheduler()
            jobs_before = dag.nextJobId()
            stages_before = dag.nextStageId()
            t0 = time.perf_counter()
            df = spec.fn(spark, args.sf)
            df.count()
            dt = time.perf_counter() - t0
            jobs_after = dag.nextJobId()
            stages_after = dag.nextStageId()
            if i == 0:
                jobs0 = jobs_after - jobs_before
                stages0 = stages_after - stages_before
            jobs1 = jobs_after - jobs_before
            stages1 = stages_after - stages_before
            best = min(best, dt)
        df = spec.fn(spark, args.sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        summ = plan_summary(plan)
        results[name] = {
            "solo_best": round(best, 3),
            "jobs_first": jobs0,
            "jobs_warm": jobs1,
            "stages_first": stages0,
            "stages_warm": stages1,
            **summ,
        }
        print(
            f"{name:38s} {best:7.3f}s jobs={jobs1:<3d} stages={stages1:<4d}"
            f" exch={summ['exchanges']:<2d} bcast={summ['broadcast_exchanges']:<2d}"
            f" smj={summ['sort_merge_joins']} py={summ['py_eval']}"
            f" win={summ['windows']} sp={summ['single_partition']}"
        )
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            with open(
                os.path.join(args.plans_dir, f"{name}_{args.tag}.txt"), "w"
            ) as fh:
                fh.write(plan)
        spark.sparkContext.setJobDescription(None)

    if args.json_out:
        with open(args.json_out, "w") as fh:
            json.dump(results, fh, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
