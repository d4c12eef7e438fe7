"""DuckDB-as-oracle comparison, approximating the driver's check:
row count + column names + order-insensitive value comparison."""

from __future__ import annotations

import datetime
import math
import os

import duckdb


def duckdb_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _norm_cell(v):
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


def normalize(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name (driver convention), normalize cells, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def compare_spark_duckdb(spark_df, oracle_sql: str, sf_dir: str) -> None:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols, d_rows = duckdb_run(oracle_sql, sf_dir)
    assert sorted(s_cols) == sorted(d_cols), f"columns differ: {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"row count differs: {len(s_rows)} vs {len(d_rows)}"
    sn, dn = normalize(s_cols, s_rows), normalize(d_cols, d_rows)
    mismatches = [(a, b) for a, b in zip(sn, dn) if a != b]
    assert not mismatches, f"{len(mismatches)} row mismatches; first: {mismatches[0]}"
