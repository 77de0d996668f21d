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


class _RecordedResponse:
    """Canned requests.Response stand-in replaying recorded bytes
    through the streaming iterator interface http_fetch uses."""

    def __init__(self, payload: bytes, status: int = 200):
        self._payload = payload
        self.status_code = status

    def iter_content(self, chunk_size: int):
        for i in range(0, len(self._payload), chunk_size):
            yield self._payload[i : i + chunk_size]

    def raise_for_status(self):
        if self.status_code >= 400:
            raise RuntimeError(f"HTTP {self.status_code}")

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def test_http_fetch_recorded_response(spark, tmp_path, monkeypatch):
    """S2 offline: the full reference ingest path — scrape the index
    page for the zip link, streamed download (recorded transport),
    unzip + latin-1->UTF-8 transcode, land, distributed CSV read
    (mirrors /root/reference/src/utils/scraping.py:23-91)."""
    import requests

    latin1_csv = '42;"Geração de energia elétrica"'.encode("iso-8859-1")
    payload = _zip_bytes("Cnaes.csv", latin1_csv)
    url = "http://recorded.test/dados/Cnaes.zip"
    seen = {}

    def fake_get(got_url, stream=True, timeout=None):
        seen["url"], seen["stream"] = got_url, stream
        return _RecordedResponse(payload)

    monkeypatch.setattr(requests, "get", fake_get)

    html = f'<p>mirror</p><a href="{url}">Cnaes</a>'
    link = ingest.find_link(html, "Cnaes.zip")
    body = ingest.http_fetch(link, chunk_size=7)  # forces multi-chunk
    assert seen == {"url": url, "stream": True}
    assert body == payload

    content = ingest.extract_zip_member(body)
    raw = ingest.land_file(content, str(tmp_path / "raw" / "Cnaes.csv"))
    df = eio.read_csv(spark, raw, schema=schemas.CNAE_RAW, sep=";")
    rows = {r.CODIGO: r.DESCRICAO for r in df.collect()}
    assert rows == {42: "Geração de energia elétrica"}


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
