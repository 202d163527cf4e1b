"""Driver-style query-vs-DuckDB-oracle comparison used by t3 tests."""

from __future__ import annotations

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.copy()
    out = out[sorted(out.columns)]
    for c in out.columns:
        if str(out[c].dtype).startswith(("int", "Int", "uint")):
            out[c] = out[c].astype("int64")
        elif str(out[c].dtype).startswith(("float", "Float")):
            out[c] = out[c].astype("float64")
        elif str(out[c].dtype).startswith("datetime64"):
            out[c] = out[c].astype("datetime64[us]")
        elif out[c].dtype == object:
            out[c] = out[c].astype(str)
    return out.sort_values(list(out.columns), kind="stable").reset_index(drop=True)


def compare(spark_df, sql: str, sf_dir: str) -> tuple[bool, str]:
    got = normalize(spark_df.toPandas())
    con = duck_con(sf_dir)  # keep alive: relations weak-ref their connection
    want = normalize(con.sql(sql).df())
    con.close()
    if list(got.columns) != list(want.columns):
        return False, f"columns differ: {list(got.columns)} vs {list(want.columns)}"
    if len(got) != len(want):
        return False, f"row count differs: {len(got)} vs {len(want)}"
    eq = got.equals(want)
    if not eq:
        diff = (got != want) & ~(got.isna() & want.isna())
        bad = diff.any(axis=1)
        return False, (
            f"values differ in {int(bad.sum())} rows, e.g.\nGOT:\n"
            f"{got[bad].head(5)}\nWANT:\n{want[bad].head(5)}"
        )
    return True, "ok"
