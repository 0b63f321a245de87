#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/check_parity.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs
the matching oracle SQL from oracle_sql.json in DuckDB over <sfDir>'s
tables, and compares: schema (column names sorted), row count, and values
(rows compared in the order produced, since every query carries a total
ORDER BY on both sides; a sorted-rows comparison is reported too).

Dev tool only — not part of the Spark library.
"""
import sys, json, glob, math

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet({files!r})")
            want = con.sql(oracle[name])
            gcols = sorted(got.columns)
            wcols = sorted(want.columns)
            if gcols != wcols:
                print(f"FAIL {name}: columns {gcols} != {wcols}")
                n_fail += 1
                continue
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        try:
            got_rows = [tuple(canon(r[got.columns.index(c)]) for c in gcols)
                        for r in got.fetchall()]
            want_rows = [tuple(canon(r[want.columns.index(c)]) for c in wcols)
                         for r in want.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: fetch {e}")
            n_fail += 1
            continue
        if got_rows == want_rows:
            print(f"PASS {name} ({len(got_rows)} rows)")
            n_pass += 1
        elif sorted(got_rows) == sorted(want_rows):
            print(f"PASS* {name} ({len(got_rows)} rows; order differs)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: {len(got_rows)} vs {len(want_rows)} rows")
            for i, (g, w) in enumerate(zip(got_rows, want_rows)):
                if g != w:
                    print(f"  first diff at row {i}:\n    spark={g}\n    duck ={w}")
                    break
            if len(got_rows) != len(want_rows):
                only_g = [r for r in got_rows if r not in set(want_rows)][:3]
                only_w = [r for r in want_rows if r not in set(got_rows)][:3]
                print(f"  spark-only: {only_g}\n  duck-only:  {only_w}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
