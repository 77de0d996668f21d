"""Golden end-to-end test of the reference-shaped CNAE pipeline
(SURVEY.md §5): raw ';' CSV -> clean -> trusted '|' CSV + BOM ->
refined parquet, with audit-count reconciliation across layers."""

from __future__ import annotations

import codecs
import glob
import os

from dados_publicos_etl_spark import io as eio
from dados_publicos_etl_spark import schemas
from dados_publicos_etl_spark.operators.clean import clean_cnae

RAW_ROWS = [
    '111;"Cultivo de cereais"',
    '112;"  Cultivo de; algodão  "',  # quoted delimiter + padding
    "113;",  # empty description -> NULL
    '114;"Açaí (latin-1 range chars)"',
    '999;""',
]


def test_cnae_pipeline_golden(spark, tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "Cnaes.csv").write_text("\n".join(RAW_ROWS), encoding="utf-8")
    trusted = str(tmp_path / "trusted")
    refined = str(tmp_path / "refined")

    # raw -> trusted (the reference Spark job: script.py:38-70 semantics)
    df = eio.read_csv(spark, str(raw), schema=schemas.CNAE_RAW, sep=";")
    cleaned = clean_cnae(df)
    eio.write_csv(cleaned, trusted, sep="|", single_file=True, bom=True)

    files = glob.glob(os.path.join(trusted, "part-*.csv"))
    assert len(files) == 1, "single_file=True must coalesce to one file"
    blob = open(files[0], "rb").read()
    assert blob.startswith(codecs.BOM_UTF8), "trusted CSV carries a BOM"
    assert not os.path.exists(os.path.join(trusted, "_SUCCESS"))

    body = blob[len(codecs.BOM_UTF8):].decode("utf-8").splitlines()
    assert body[0] == "CODIGO|DESCRICAO|SEGMENTO"
    rows = dict(line.split("|", 1) for line in body[1:])
    assert rows["111"] == "Cultivo de cereais|PRIMARIO"
    assert rows["112"] == "Cultivo de; algodão|SECUNDARIO"  # trimmed
    assert rows["113"] == "|PRIMARIO"  # NULL description
    assert rows["999"] == "|PRIMARIO"  # empty -> NULL

    # BOM fixup is idempotent (reference scraping.py:146-151)
    assert eio.add_utf8_bom(trusted) == 0

    # trusted -> refined (K5 as one Spark job, not a pandas loop)
    refined_df = eio.csv_to_parquet(
        spark, trusted, refined, sep="|", schema=schemas.CNAE_TRUSTED
    )
    back = spark.read.parquet(refined)
    # audit reconciliation: counts equal across layers
    assert back.count() == refined_df.count() == cleaned.count() == len(RAW_ROWS)
    got = {r.CODIGO: (r.DESCRICAO, r.SEGMENTO) for r in back.collect()}
    assert got[113] == (None, "PRIMARIO")
    assert got[112] == ("Cultivo de; algodão", "SECUNDARIO")


def test_csv_malformed_row_policies(spark, tmp_path):
    """Messy public-data ingestion: PERMISSIVE captures the corrupt
    raw line for quarantine, DROPMALFORMED drops it, FAILFAST aborts."""
    import pytest
    from pyspark.sql import types as T
    from pyspark.sql import functions as F

    from dados_publicos_etl_spark.io import read_csv

    src = tmp_path / "messy.csv"
    src.write_text("1;alpha\n2;beta\n9;extra;too;many\n3;delta\n")
    schema = T.StructType(
        [
            T.StructField("CODIGO", T.IntegerType()),
            T.StructField("DESCRICAO", T.StringType()),
            T.StructField("_bad", T.StringType()),
        ]
    )

    permissive = read_csv(
        spark, str(src), schema=schema, corrupt_col="_bad"
    ).cache()
    assert permissive.count() == 4
    bad = permissive.filter(F.col("_bad").isNotNull()).collect()
    assert len(bad) == 1 and bad[0]["_bad"] == "9;extra;too;many"
    assert bad[0]["CODIGO"] == 9  # parseable prefix retained
    permissive.unpersist()

    dropped = read_csv(
        spark,
        str(src),
        schema=T.StructType(schema.fields[:2]),
        mode="DROPMALFORMED",
    )
    # collect(), not count(): CSV column pruning means count() parses
    # zero columns and malformed rows never surface (the classic
    # csv.parser.columnPruning trap)
    assert len(dropped.collect()) == 3

    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        read_csv(
            spark,
            str(src),
            schema=T.StructType(schema.fields[:2]),
            mode="FAILFAST",
        ).collect()


def test_incremental_daily_pipeline(spark, sf_dir, tmp_path):
    """End-to-end incremental ETL: day-2 increment rewrites ONLY its
    partition (dynamic overwrite) and the running aggregate is
    maintained by merging partials — no full-history recompute —
    then matches a from-scratch aggregation exactly."""
    from pyspark.sql import functions as F

    from dados_publicos_etl_spark.io import overwrite_partitions, read_table

    out = str(tmp_path / "orders_daily")
    orders = read_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    day1 = orders.filter("order_year < 1998")
    day2 = orders.filter("order_year >= 1998")

    def partials(df):
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .alias("cents"),
        )

    # day 1: full load + partial aggregate snapshot
    overwrite_partitions(day1, out, partition_by=["order_year"])
    agg_state = partials(spark.read.parquet(out))

    # day 2: write only the new partition; merge its partials into the
    # maintained state (mergeable-partials pattern, no history rescan)
    overwrite_partitions(day2, out, partition_by=["order_year"])
    merged = (
        agg_state.unionByName(partials(day2))
        .groupBy("o_orderstatus")
        .agg(F.sum("n").alias("n"), F.sum("cents").alias("cents"))
    )

    scratch = partials(read_table(spark, sf_dir, "orders"))
    got = {
        r["o_orderstatus"]: (r["n"], r["cents"]) for r in merged.collect()
    }
    want = {
        r["o_orderstatus"]: (r["n"], r["cents"]) for r in scratch.collect()
    }
    assert got == want
    # and the physical layout holds every year partition exactly once
    years = spark.read.parquet(out).select("order_year").distinct().count()
    assert years == orders.select("order_year").distinct().count()
