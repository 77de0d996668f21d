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
