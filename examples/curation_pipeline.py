#!/usr/bin/env python
"""End-to-end LLM training-data curation funnel, runnable locally:

    python examples/curation_pipeline.py /root/testdata/sf0.001

Chains the catalog's named pipeline stages the way a pretraining run
composes them, printing the document funnel after every gate:

  ingest -> Gopher quality gate -> exact dedup (survivor per digest)
  -> near-dup cluster survivorship -> benchmark decontamination
  -> DSIR target-domain tilt -> temperature language rebalance
  -> token-balanced training shards

Every stage is one of the differential-checked catalog operators; the
funnel composes their keep-decisions with plain joins, so the whole
script is a narrow plan over one corpus scan per stage — the same
composition at 100 TB, just with the broadcast hints dropped where
the small side stops being small (each stage's docstring covers its
scale shape).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main(sf_dir: str) -> None:
    from dados_publicos_etl_spark.io import read_table
    from dados_publicos_etl_spark.operators.corpus import (
        decontaminate_bloom_e2e,
        dsir_importance_weights,
        gopher_quality_rules,
    )
    from dados_publicos_etl_spark.operators.dedup import dedup_exact
    from dados_publicos_etl_spark.operators.graph import (
        dedup_quality_survivor,
    )
    from dados_publicos_etl_spark.operators.sampling import (
        temperature_mix_sampling,
        training_shard_assignment,
    )
    from dados_publicos_etl_spark.session import get_session

    spark = get_session(app_name="curation_pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    docs = read_table(spark, sf_dir, "documents")
    n0 = docs.count()
    print(f"ingest:            {n0} docs")

    keep = gopher_quality_rules(spark, sf_dir).filter("gopher_keep")
    n1 = keep.count()
    print(f"gopher gate:       {n1} docs ({n0 - n1} dropped)")

    keepers = dedup_exact(spark, sf_dir).select(
        F.col("keeper_doc_id").alias("doc_id")
    )
    keep = keep.join(keepers, "doc_id")
    n2 = keep.count()
    print(f"exact dedup:       {n2} docs ({n1 - n2} dropped)")

    near = dedup_quality_survivor(spark, sf_dir)
    dropped_near = near.filter(~F.col("keep")).select("doc_id")
    keep = keep.join(dropped_near, "doc_id", "left_anti")
    n3 = keep.count()
    print(f"near-dup dedup:    {n3} docs ({n2 - n3} dropped)")

    contaminated = decontaminate_bloom_e2e(spark, sf_dir).filter(
        "contaminated"
    ).select("doc_id")
    keep = keep.join(contaminated, "doc_id", "left_anti")
    n4 = keep.count()
    print(f"decontamination:   {n4} docs ({n3 - n4} dropped)")

    tilt = dsir_importance_weights(spark, sf_dir).filter("above_mean")
    keep = keep.join(tilt.select("doc_id"), "doc_id")
    n5 = keep.count()
    print(f"DSIR tilt:         {n5} docs ({n4 - n5} dropped)")

    print("\ntemperature rebalance (per language):")
    temperature_mix_sampling(spark, sf_dir).orderBy("lang").show()

    print("training shards (token-balanced):")
    training_shard_assignment(spark, sf_dir).orderBy("shard").show()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
