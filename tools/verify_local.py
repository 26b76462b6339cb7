#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/verify_local.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), registers
the sf parquet tables as DuckDB views, runs each oracle SQL, and compares
with the Spark-written parquet under <verifyOutDir>/<name>/. Columns are
sorted by name, rows sorted by all columns (mirroring the driver's
"sort columns by name before hashing" contract). Reports exact-match /
mismatch per query with diagnostics.

Dev tool only — the Scala library has no Python dependency.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def values_equal(a, b):
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True
            return fa == fb
    except (TypeError, ValueError):
        pass
    return str(a) == str(b)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            expected = canon(con.sql(sql).df())
        except Exception as ex:
            print(f"FAIL {name}: oracle SQL error: {str(ex)[:300]}")
            n_fail += 1
            continue
        try:
            actual = canon(duckdb.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df())
        except Exception as ex:
            print(f"FAIL {name}: spark output missing/unreadable: {str(ex)[:200]}")
            n_fail += 1
            continue
        if list(expected.columns) != list(actual.columns):
            print(f"FAIL {name}: columns oracle={list(expected.columns)} spark={list(actual.columns)}")
            n_fail += 1
            continue
        if len(expected) != len(actual):
            print(f"FAIL {name}: rows oracle={len(expected)} spark={len(actual)}")
            n_fail += 1
            continue
        # dtype check (schema part of the driver gate)
        dtype_mismatch = [
            (c, str(expected[c].dtype), str(actual[c].dtype))
            for c in expected.columns
            if str(expected[c].dtype) != str(actual[c].dtype)]
        bad = None
        for i in range(len(expected)):
            for c in expected.columns:
                if not values_equal(expected[c].iloc[i], actual[c].iloc[i]):
                    bad = (i, c, expected[c].iloc[i], actual[c].iloc[i])
                    break
            if bad:
                break
        if bad:
            i, c, e, a = bad
            print(f"FAIL {name}: first diff row {i} col {c}: oracle={e!r} spark={a!r}")
            n_fail += 1
        else:
            note = f"  [dtype diff: {dtype_mismatch}]" if dtype_mismatch else ""
            print(f"PASS {name} ({len(expected)} rows){note}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
