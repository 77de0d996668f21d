#!/usr/bin/env python
"""Submittable job main — the docs/deployment.md recipe, runnable.

Local smoke:
    python examples/job_main.py /root/testdata/sf0.001 /tmp/job_out

Cluster (see docs/deployment.md for packaging):
    spark-submit --deploy-mode cluster --py-files engine.zip \
        examples/job_main.py s3a://bucket/tpch/sf100 s3a://bucket/out
"""
from __future__ import annotations

import os
import sys

# local-run convenience; harmless under spark-submit --py-files
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from dados_publicos_etl_spark.plans import QUERIES  # noqa: E402
from dados_publicos_etl_spark.plans import catalog  # noqa: E402,F401


def main(sf_dir: str, out_dir: str, query: str = "corpus_pipeline_e2e") -> None:
    # NO .master(...): the cluster manager decides; engine confs come
    # from spark-submit --conf so one artifact serves every env.
    spark = (
        SparkSession.builder.appName(f"dados-publicos-etl:{query}")
        .getOrCreate()
    )
    result = QUERIES[query].fn(spark, sf_dir)
    result.write.mode("overwrite").parquet(out_dir)
    print(f"{query}: wrote {spark.read.parquet(out_dir).count()} rows "
          f"to {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], *(sys.argv[3:4]))
