"""Local replica of the driver's DuckDB-differential check.

Runs a registered Spark query and its oracle SQL on the same sf dir,
then compares row count, column names/order-insensitive values the
way the driver does (sort columns by name, sort rows, hash) — but
with readable diffs for development.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_localize(None)
            except TypeError:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif pd.api.types.is_float_dtype(s):
            df[c] = np.round(s.astype("float64"), 9)
        elif s.dtype == object:
            df[c] = s.where(pd.notna(s), None)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )
    return df


def compare(spark_df, oracle_sql_text: str, sf_dir: str) -> None:
    """Assert the Spark result and the DuckDB oracle result match."""
    got = spark_df.toPandas()
    con = duckdb_con(sf_dir)
    want = con.sql(oracle_sql_text).df()
    con.close()

    assert sorted(map(str.lower, got.columns)) == sorted(
        map(str.lower, want.columns)
    ), f"column mismatch: spark={sorted(got.columns)} oracle={sorted(want.columns)}"
    got.columns = [c.lower() for c in got.columns]
    want.columns = [c.lower() for c in want.columns]
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"

    g, w = _normalize(got), _normalize(want)
    for c in g.columns:
        gc, wc = g[c], w[c]
        if pd.api.types.is_float_dtype(gc) or pd.api.types.is_float_dtype(wc):
            ga = gc.astype("float64").to_numpy()
            wa = wc.astype("float64").to_numpy()
            both_nan = np.isnan(ga) & np.isnan(wa)
            ok = both_nan | (ga == wa)
            if not ok.all():
                bad = np.flatnonzero(~ok)[:5]
                raise AssertionError(
                    f"float column {c!r} differs at rows {bad}: "
                    f"spark={ga[bad]} oracle={wa[bad]}"
                )
        else:
            if not gc.astype(str).equals(wc.astype(str)):
                mism = (gc.astype(str) != wc.astype(str)).to_numpy().nonzero()[0][:5]
                raise AssertionError(
                    f"column {c!r} differs at rows {mism}: "
                    f"spark={gc.iloc[mism].tolist()} oracle={wc.iloc[mism].tolist()}"
                )
