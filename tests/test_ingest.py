"""Ingest utilities (reference S1-S3): zip extraction + charset
transcode + landing, feeding the Spark CSV reader end-to-end."""

from __future__ import annotations

import io
import zipfile

from dados_publicos_etl_spark import io as eio
from dados_publicos_etl_spark import schemas
from dados_publicos_etl_spark.sources import ingest


def _zip_bytes(name: str, content: bytes) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(name, content)
    return buf.getvalue()


def test_find_link():
    html = '<a href="x.csv">x</a> <a href="http://gov.br/dados/Cnaes.zip">z</a>'
    assert ingest.find_link(html, "Cnaes.zip") == "http://gov.br/dados/Cnaes.zip"
    assert ingest.find_link(html, "Other.zip") is None


def test_extract_zip_transcodes_latin1():
    latin1_csv = '111;"Cultivo de algodão"'.encode("iso-8859-1")
    payload = _zip_bytes("Cnaes.csv", latin1_csv)
    out = ingest.extract_zip_member(payload)
    assert out.decode("utf-8") == '111;"Cultivo de algodão"'


def test_ingest_to_spark_end_to_end(spark, tmp_path):
    latin1_csv = '7;"Criação de bovinos"\n8;""'.encode("iso-8859-1")
    payload = _zip_bytes("Cnaes.csv", latin1_csv)
    content = ingest.extract_zip_member(payload)
    raw = ingest.land_file(content, str(tmp_path / "raw" / "Cnaes.csv"))
    df = eio.read_csv(spark, raw, schema=schemas.CNAE_RAW, sep=";")
    rows = {r.CODIGO: r.DESCRICAO for r in df.collect()}
    # Spark CSV reads "" as NULL (nullValue default) — the same
    # normalization the reference applies explicitly downstream.
    assert rows == {7: "Criação de bovinos", 8: None}
