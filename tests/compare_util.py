"""Local replica of the driver's Spark-vs-DuckDB comparison."""

from __future__ import annotations

import duckdb
import pandas as pd

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(spark_df, duck_df: pd.DataFrame) -> tuple[bool, str]:
    a = normalize(spark_df.toPandas())
    b = normalize(duck_df)
    if len(a) != len(b):
        return False, f"row count {len(a)} vs {len(b)}"
    if list(a.columns) != list(b.columns):
        return False, f"columns {list(a.columns)} vs {list(b.columns)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            import numpy as np
            if not np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=1e-9, equal_nan=True):
                return False, f"float col {c} mismatch"
        else:
            eq = (av.astype(object).where(pd.notna(av), None)
                  == bv.astype(object).where(pd.notna(bv), None))
            if not eq.all():
                i = int(eq.idxmin())
                return False, (f"col {c} row {i}: spark={av.iloc[i]!r} duck={bv.iloc[i]!r}\n"
                               f"spark row: {a.iloc[i].to_dict()}\nduck  row: {b.iloc[i].to_dict()}")
    return True, f"ok ({len(a)} rows)"
