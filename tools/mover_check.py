"""Mechanical bench-mover spot-check (r11 verdict What's-wrong #1/#2).

Given two bench artifacts (prior round's local artifact and the new
one), this tool

1. enumerates EVERY query whose raw per-query time moved more than
   ``--threshold`` (default 1.5x) in either direction — no hand-
   picking which regressions get re-measured; and
2. re-measures each mover with the BENCH_NOTES r11 #1 protocol:
   solo min-of-5 in a fresh tuned session, bracketed by the SAME
   pinned host probe bench.py uses, so the verdict for each mover is
   a normalized ratio, not a raw reading taken on an unknown host
   window.

Output: one JSON line with, per mover, the old/new artifact raws,
the solo min-of-5, the session's host ratio, and the normalized
verdict ratio (solo / host_ratio / old_raw).  A mover whose
normalized ratio is within ``--noise`` (default 1.25) of 1.0 is
classified "host"; above it, "code" — the table BENCH_NOTES must
carry for every >threshold mover.

Usage:
  python tools/mover_check.py BENCH_LOCAL_r11.json BENCH_LOCAL_r12.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# the pinned probe set + frozen r9 references, same as bench.py
PROBE_REF_R9 = {
    "q1_pricing_summary": 0.408,
    "topk_orders": 0.215,
    "window_rank_dense": 0.185,
    "text_stats": 0.215,
    "doc_fingerprint": 0.133,
    "multimodal_features": 0.403,
    "stream_tumbling_window": 0.226,
}


def movers(old: dict, new: dict, threshold: float) -> list[tuple]:
    out = []
    for name, t_new in sorted(new["queries"].items()):
        t_old = old["queries"].get(name)
        if t_old is None or t_old <= 0 or t_new <= 0:
            continue
        ratio = t_new / t_old
        if ratio > threshold or ratio < 1.0 / threshold:
            out.append((name, t_old, t_new, round(ratio, 3)))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old_artifact")
    ap.add_argument("new_artifact")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--noise", type=float, default=1.25)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        ),
    )
    args = ap.parse_args()

    with open(args.old_artifact) as fh:
        old = json.load(fh)
    with open(args.new_artifact) as fh:
        new = json.load(fh)
    mv = movers(old, new, args.threshold)
    if not mv:
        print(json.dumps({"movers": [], "verdict": "no movers above "
                          f"{args.threshold}x"}))
        return

    from dados_publicos_etl_spark.plans import QUERIES
    from dados_publicos_etl_spark.plans import catalog  # noqa: F401
    from dados_publicos_etl_spark.session import get_session

    spark = get_session(app_name="mover-check")
    spark.sparkContext.setLogLevel("ERROR")

    def min_of(name: str, n: int = 5) -> float:
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            QUERIES[name].fn(spark, args.sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        return best

    # warm the session so the first mover doesn't absorb JVM startup
    from dados_publicos_etl_spark.io import read_table
    from dados_publicos_etl_spark.schemas import TABLE_NAMES

    for t in TABLE_NAMES:
        read_table(spark, args.sf_dir, t).count()

    probe_pre = {n: round(min_of(n), 3) for n in sorted(PROBE_REF_R9)}
    host_pre = sum(probe_pre.values()) / sum(PROBE_REF_R9.values())

    results = []
    for name, t_old, t_new, ratio in mv:
        solo = round(min_of(name), 3)
        results.append(
            {"query": name, "old_raw": t_old, "new_raw": t_new,
             "artifact_ratio": ratio, "solo_min5": solo}
        )
        print(f"{name:35s} old {t_old:7.3f} new {t_new:7.3f} "
              f"({ratio:5.2f}x) solo {solo:7.3f}", file=sys.stderr)

    probe_post = {n: round(min_of(n), 3) for n in sorted(PROBE_REF_R9)}
    host_post = sum(probe_post.values()) / sum(PROBE_REF_R9.values())
    host_ratio = round((host_pre + host_post) / 2, 3)

    for r in results:
        # normalized vs the OLD artifact's own host window: the old
        # artifact carries its host_ratio, so compare speed-of-code,
        # not speed-of-host
        old_host = old.get("host_ratio", 1.0) or 1.0
        norm = (r["solo_min5"] / host_ratio) / (r["old_raw"] / old_host)
        r["normalized_ratio"] = round(norm, 3)
        r["verdict"] = (
            "code" if norm > args.noise
            else ("improvement" if norm < 1.0 / args.noise else "host")
        )
    spark.stop()
    print(json.dumps({
        "sf_dir": args.sf_dir,
        "threshold": args.threshold,
        "host_ratio_pre": round(host_pre, 3),
        "host_ratio_post": round(host_post, 3),
        "host_ratio": host_ratio,
        "old_host_ratio": old.get("host_ratio"),
        "movers": results,
    }))


if __name__ == "__main__":
    main()
