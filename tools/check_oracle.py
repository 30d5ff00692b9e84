#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB with views over
<sfDir>/*.parquet, and compares: column sets, row counts, and value equality
after sorting columns by name and rows by all columns.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cmp(name, spark_df, duck_df):
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        return f"COLS spark={sc} duck={dc}"
    if len(spark_df) != len(duck_df):
        return f"ROWS spark={len(spark_df)} duck={len(duck_df)}"
    s, d = canon(spark_df), canon(duck_df)
    for c in s.columns:
        a, b = s[c], d[c]
        try:
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                af = a.astype(float)
                bf = b.astype(float)
                bad = ~((af == bf) | (af.isna() & bf.isna()))
            elif a.dtype.kind == "M" or b.dtype.kind == "M":
                bad = pd.to_datetime(a).ne(pd.to_datetime(b)) & ~(
                    a.isna() & b.isna())
            else:
                bad = a.astype(str).ne(b.astype(str))
        except Exception as e:  # noqa: BLE001
            return f"COMPARE-ERR col={c}: {e}"
        if bad.any():
            i = bad.idxmax()
            return (f"VAL col={c} row={i}: spark={s[c][i]!r} duck={d[c][i]!r}"
                    f" ({int(bad.sum())} diffs)")
    return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: no spark output ({e})")
            n_bad += 1
            continue
        try:
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        err = cmp(name, spark_df, duck_df)
        if err:
            print(f"FAIL {name}: {err}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(spark_df)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} fail")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
