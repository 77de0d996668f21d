#!/usr/bin/env python
"""Double-evaluated-subtree audit (round-9 verdict item #6).

Round 9's one weak component (`cdc_chunk_dedup`) fed one expensive
explode->window pipeline into two consumers, so Spark planned and
EXECUTED the whole subtree twice.  This tool generalizes that finding
into a standing audit: for every registered query it walks the
executed physical plan and fingerprints every subtree rooted at an
expensive operator (Generate, Window, aggregates, joins, sorts) by
its CANONICALIZED tree string (expression IDs normalized, so two
separately-planned instances of the same computation collide).  A
fingerprint appearing >= 2 times in one plan means the operator tree
below it runs twice in one action — the shape that doubles the most
expensive pass at corpus scale.

Exclusions, by design:
- subtrees under a ReusedExchange / ReusedSubquery root (Spark
  already dedups the execution);
- bare FileScan re-reads (the house discipline PREFERS a second
  columnar scan over shuffling text — cf. exact_substring_scrub,
  dedup docstrings — so re-scans are not findings, recomputed
  OPERATOR trees are);
- InMemoryTableScan / Scan ExistingRDD leaves (cached / checkpointed
  data: multiple scans share one materialization).

Output: one line per (query, duplicated-subtree-root) finding plus a
JSON summary to SUBTREE_AUDIT.json.  tests/test_plans.py pins the
finding set against an allowlist with one-line justifications (the
_BNLJ_OK maintenance contract).
"""

from __future__ import annotations

import json
import os
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# operator roots whose re-execution is worth flagging
EXPENSIVE = (
    "Generate",
    "Window",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "Sort",
)

# roots that mean "already deduplicated / cached" — do not descend
SHARED = ("ReusedExchange", "ReusedSubquery", "InMemoryTableScan",
          "TableCacheQueryStage")


def _walk(node, out: list, ex_ancestors: tuple) -> None:
    """Collect (node, exchange-ancestor-fingerprints) depth-first.
    ``ex_ancestors`` carries the canonical fingerprint of every
    Exchange on the path above the node — the units Spark's (and
    AQE's) exchange-reuse dedups at runtime.  Whether any of those
    ancestors is DUPLICATED (and the node therefore shared, not
    re-executed) is decided after the walk, once every exchange has
    been counted — one traversal instead of the former count-then-
    re-walk pair (r10 ADVICE)."""
    name = node.nodeName()
    if any(name.startswith(s) for s in SHARED):
        return
    out.append((node, ex_ancestors))
    if name.startswith("Exchange") or name.startswith(
            "BroadcastExchange"):
        ex_ancestors = ex_ancestors + (
            node.canonicalized().treeString(),)
    ch = node.children()
    for i in range(ch.size()):
        _walk(ch.apply(i), out, ex_ancestors)
    # AQE wrapper nodes hide their subtree behind queryStage/inputPlan
    if name == "AdaptiveSparkPlan":
        _walk(node.inputPlan(), out, ex_ancestors)


def audit_plan(df) -> list[dict]:
    """Return duplicated-expensive-subtree findings for one query.

    One walk, two reads of its result.  First, every Exchange
    subtree is fingerprint-counted: two canonically-equal exchanges
    are ONE runtime execution (Spark plans a ReusedExchange; under
    AQE, stage-level reuse does the same even though the
    pre-execution plan doesn't show it), so any duplication living
    under a duplicated exchange is shared, not re-executed.  Then
    duplicated expensive-rooted subtrees NOT covered by a
    duplicated-exchange ancestor are flagged — the genuinely
    re-planned, re-executed computation (the cdc_chunk_dedup /
    tfidf_cosine_neardup class)."""
    root = df._jdf.queryExecution().executedPlan()
    nodes: list = []
    _walk(root, nodes, ())
    # duplicated-exchange canonical forms (from the same walk)
    ex_fps: Counter = Counter()
    for n, _anc in nodes:
        name = n.nodeName()
        if name.startswith("Exchange") or name.startswith(
                "BroadcastExchange"):
            ex_fps[n.canonicalized().treeString()] += 1
    shared_ex = {fp for fp, c in ex_fps.items() if c >= 2}

    fps: Counter = Counter()
    sample: dict[str, str] = {}
    n_unshared: Counter = Counter()
    for n, ex_ancestors in nodes:
        name = n.nodeName()
        if not any(name.startswith(e) for e in EXPENSIVE):
            continue
        fp = n.canonicalized().treeString()
        fps[fp] += 1
        if not any(a in shared_ex for a in ex_ancestors):
            n_unshared[fp] += 1
        sample.setdefault(fp, name)
    return [
        {"root": sample[fp], "count": c,
         "unshared": n_unshared[fp],
         "nodes": fp.count("\n") + 1,
         "head": fp.splitlines()[0][:140]}
        for fp, c in fps.items()
        # >= 2 instances NOT under a shared exchange => the subtree
        # really runs >= 2 times
        if n_unshared[fp] >= 2
    ]


def main() -> None:
    from dados_publicos_etl_spark.plans import QUERIES
    from dados_publicos_etl_spark.plans import catalog  # noqa: F401
    from dados_publicos_etl_spark.session import get_session

    only = sys.argv[1:] or sorted(QUERIES)
    spark = get_session(app_name="subtree-audit", master="local[8]",
                        shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_AUDIT", "/root/testdata/sf0.001")
    report: dict[str, list[dict]] = {}
    errors: dict[str, str] = {}
    for name in only:
        try:
            findings = audit_plan(QUERIES[name].fn(spark, sf))
        except Exception as ex:  # plan-build failure is its own finding
            errors[name] = str(ex)[:200]
            continue
        if findings:
            report[name] = findings
            for f in findings:
                print(f"{name}: {f['count']}x {f['root']} "
                      f"({f['nodes']} nodes) {f['head']}")
        # release blocks pinned by checkpoint-materializing builders
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
    out = {"sf": sf, "n_queries": len(only),
           "n_flagged": len(report), "findings": report,
           "errors": errors}
    with open(os.path.join(REPO, "SUBTREE_AUDIT.json"), "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"flagged {len(report)}/{len(only)} queries "
          f"({len(errors)} errors) -> SUBTREE_AUDIT.json")
    spark.stop()


if __name__ == "__main__":
    main()
