"""Cleaning / derivation operators (reference P1-P4).

These are the reference's entire transform surface
(/root/reference/src/script/script.py:53-59): trim, empty-string ->
NULL, and a parity-driven CASE WHEN enum.  All stay inside Catalyst
expression form (whole-stage codegen; no Python UDFs), so predicate
pushdown and column pruning keep working through them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def trim_cols(df: DataFrame, *cols: str) -> DataFrame:
    """Strip leading/trailing whitespace (parity: script.py:53)."""
    out = df
    for c in cols:
        out = out.withColumn(c, F.trim(F.col(c)))
    return out


def empty_to_null(df: DataFrame, *cols: str) -> DataFrame:
    """Normalize empty strings to SQL NULL (parity: script.py:54-56).

    The reference uses ``eqNullSafe("")`` so a NULL input compares
    false (stays NULL) rather than yielding NULL from the comparison;
    ``F.nullif`` has exactly those semantics.
    """
    out = df
    for c in cols:
        out = out.withColumn(c, F.nullif(F.col(c), F.lit("")))
    return out


def parity_segment(
    code: Column | str,
    odd_label: str = "PRIMARIO",
    even_label: str = "SECUNDARIO",
) -> Column:
    """CODIGO % 2 == 1 -> odd_label else even_label (script.py:57-59)."""
    c = F.col(code) if isinstance(code, str) else code
    return F.when(c % 2 == 1, F.lit(odd_label)).otherwise(F.lit(even_label))


def case_when(pairs: list[tuple[Column, Column]], default: Column) -> Column:
    """General CASE WHEN builder used by derived-column operators."""
    expr = None
    for cond, value in pairs:
        expr = F.when(cond, value) if expr is None else expr.when(cond, value)
    return default if expr is None else expr.otherwise(default)


def clean_cnae(
    df: DataFrame,
    code_col: str = "CODIGO",
    desc_col: str = "DESCRICAO",
    segment_col: str = "SEGMENTO",
) -> DataFrame:
    """The reference's full cleaning query (script.py:53-59) as one op:
    trim -> empty->NULL -> parity enum.  Works on any (int, string)
    pair of columns.
    """
    return (
        trim_cols(df, desc_col)
        .transform(lambda d: empty_to_null(d, desc_col))
        .withColumn(segment_col, parity_segment(code_col))
    )


def repair_mojibake(df: DataFrame, col: str, out_col: str | None = None) -> DataFrame:
    """Repair UTF-8-as-Latin-1 double-encoding ("mojibake": é -> Ã©),
    the classic wound from pipelines like the reference's ISO-8859-1
    source transcode (/root/reference/src/utils/scraping.py zip
    extraction) applied twice.

    A row is repaired iff the reverse trip round-trips: re-encoding
    the text as Latin-1 yields bytes that decode as valid UTF-8 AND
    contain a multi-byte sequence (pure ASCII is left alone).  Runs
    as one Arrow-batched pass — string repair is per-row pure Python
    on the worker, no shuffle; undecodable rows pass through
    unchanged (repair must be lossless-or-identity).
    """
    import pandas as pd

    out = out_col or col
    other = [c for c in df.columns if c != col]

    def fix(batches):
        for pdf in batches:
            def one(s: str) -> str:
                try:
                    b = s.encode("latin-1")
                except UnicodeEncodeError:
                    return s
                try:
                    repaired = b.decode("utf-8")
                except UnicodeDecodeError:
                    return s
                return repaired if repaired != s else s

            res = pdf.copy()
            res[out] = pdf[col].map(one)
            yield res

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    if out not in df.columns:
        schema += f", {out} string"

        def fix_new(batches):
            for pdf in batches:
                def one(s):
                    try:
                        b = s.encode("latin-1")
                        return b.decode("utf-8")
                    except (UnicodeEncodeError, UnicodeDecodeError):
                        return s
                pdf = pdf.copy()
                pdf[out] = pdf[col].map(one)
                yield pdf

        return df.mapInPandas(fix_new, schema=schema)
    return df.mapInPandas(fix, schema=schema)
