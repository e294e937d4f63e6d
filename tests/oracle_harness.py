"""DuckDB-oracle comparison harness (mirrors the driver's t2 check).

Runs a declared Spark query and its oracle SQL on the same parquet
fixtures, canonicalizes both results (sort columns by name, sort rows,
round doubles, timestamps → epoch micros), and compares.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

from transe_pyspark_spark.sources.readers import TABLES


def run_oracle(sql: str, sf_dir: str) -> tuple[list[str], list[tuple]]:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _canon_value(v: Any) -> Any:
    import datetime
    import decimal

    if isinstance(v, bool):
        return int(v)
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, datetime.datetime):
        return int(v.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    return v


def canonicalize(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare(spark_df, oracle: str, sf_dir: str) -> tuple[bool, str]:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    o_cols, o_rows = run_oracle(oracle, sf_dir)
    if sorted(s_cols) != sorted(o_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    if len(s_rows) != len(o_rows):
        return False, f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    cs, co = canonicalize(s_cols, s_rows), canonicalize(o_cols, o_rows)
    if cs != co:
        diffs = [(a, b) for a, b in zip(cs, co) if a != b][:3]
        return False, f"value mismatch, first diffs (spark, oracle): {diffs}"
    return True, f"ok ({len(s_rows)} rows)"
