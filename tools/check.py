#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (SURVEY.md §5.2).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each SparkEntry query's parquet dump from <verifyOutDir>/<name>/,
runs the matching oracle SQL (from <verifyOutDir>/oracle_sql.json) in
DuckDB over the same test tables, sorts columns by name, and compares
row-by-row. Reports per-query match plus the first mismatching cell.

Driver-side tooling only — not part of the shipped library.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def to_df(x):
    df = x
    # sort columns by name (driver semantics)
    return df[sorted(df.columns)]


def compare(name, spark_df, duck_df):
    issues = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        return [f"columns differ: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"]
    # The driver's hash is dtype-sensitive (e.g. DuckDB SUM(BIGINT) ->
    # HUGEINT -> pandas float64 vs Spark int64 hash-differs even when
    # every value compares equal), and it row-sorts every column, which
    # crashes on array cells. Flag both classes loudly — value-equal
    # output with either problem still fails the driver gate (r9: 8
    # dtype hash-misses + 3 array sort crashes, all invisible locally).
    import numpy as np
    for col in sorted(spark_df.columns):
        sd, dd = str(spark_df[col].dtype), str(duck_df[col].dtype)
        # datetime64 resolution (ns vs us) is benign — the driver's
        # hash normalizes timestamps (r9 evidence: every ns-vs-us query
        # was hash-green); int-vs-float and int-width diffs are NOT.
        if sd != dd and not (sd.startswith("datetime64") and dd.startswith("datetime64")):
            issues.append(f"DTYPE col {col}: spark={sd} duck={dd}")
        # first NON-NULL cell, on BOTH frames — a leading NULL or a
        # duck-side-only array column must not slip past the guard
        for side, frame in (("spark", spark_df), ("duck", duck_df)):
            nn = frame[col].dropna()
            if len(nn) and isinstance(nn.iloc[0], (np.ndarray, list, dict)):
                issues.append(
                    f"UNSORTABLE col {col} ({side}): array/struct cell crashes driver row-sort")
    if issues:
        return issues
    s = to_df(spark_df)
    d = to_df(duck_df)
    if len(s) != len(d):
        return [f"row count differs: spark={len(s)} duck={len(d)}"]
    for col in s.columns:
        sv, dv = s[col].tolist(), d[col].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            a, b = norm_cell(a), norm_cell(b)
            import numpy as np
            if isinstance(a, float) and isinstance(b, float):
                ok = (a == b)
            elif hasattr(a, "timestamp") and hasattr(b, "timestamp"):
                ok = pd.Timestamp(a) == pd.Timestamp(b)
            elif isinstance(a, (list, tuple, np.ndarray)) or isinstance(b, (list, tuple, np.ndarray)):
                ok = list(a) == list(b)
            else:
                ok = (a == b) or (a is None and b is None)
            if not ok:
                issues.append(f"col {col} row {i}: spark={a!r} duck={b!r}")
                break
        if len(issues) >= 3:
            break
    return issues


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_ok = n_bad = n_skip = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        pq_dir = Path(out_dir, name)
        if not pq_dir.exists():
            print(f"MISSING  {name} (no spark output)")
            n_bad += 1
            continue
        spark_df = pd.read_parquet(pq_dir)
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            n_bad += 1
            continue
        issues = compare(name, spark_df, duck_df)
        if issues:
            print(f"MISMATCH {name} ({len(spark_df)} rows):")
            for it in issues:
                print(f"   {it}")
            n_bad += 1
        else:
            print(f"OK       {name} ({len(spark_df)} rows)")
            n_ok += 1
    # rows-only queries (no oracle)
    for d in sorted(Path(out_dir).iterdir()):
        if d.is_dir() and d.name not in oracle:
            n = len(pd.read_parquet(d))
            print(f"ROWSONLY {d.name} ({n} rows)")
            n_skip += 1
    print(f"\n{n_ok} ok, {n_bad} bad, {n_skip} rows-only")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
