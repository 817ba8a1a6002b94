#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query
output written by graft.Verify, run the corresponding oracle SQL in
DuckDB over the same parquet tables, sort columns by name, sort rows,
and compare values exactly. Usage:
    python3 tools/check_correctness.py <verify_out_dir> <sf_dir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(out_dir: str, sf_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
            exp = con.execute(sql).df()
            g, e = canon(got), canon(exp)
            if list(g.columns) != list(e.columns):
                print(f"FAIL {name}: columns {list(g.columns)} vs "
                      f"{list(e.columns)}")
                n_fail += 1
                continue
            if len(g) != len(e):
                print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
                n_fail += 1
                continue
            dtypes_g = [str(t) for t in g.dtypes]
            dtypes_e = [str(t) for t in e.dtypes]
            mismatch_cols = []
            for c in g.columns:
                a, b = g[c], e[c]
                if a.dtype != b.dtype:
                    mismatch_cols.append((c, f"dtype {a.dtype} vs {b.dtype}"))
                    continue
                if a.dtype == object:
                    eq = (a.fillna("\0NULL") == b.fillna("\0NULL")).all()
                else:
                    eq = ((a == b) | (a.isna() & b.isna())).all()
                if not eq:
                    bad = (~((a == b) | (a.isna() & b.isna()))).idxmax()
                    mismatch_cols.append(
                        (c, f"first diff row {bad}: {a[bad]!r} vs {b[bad]!r}"))
            if mismatch_cols:
                print(f"FAIL {name}: {mismatch_cols[:3]}")
                if dtypes_g != dtypes_e:
                    print(f"     dtypes: {dtypes_g} vs {dtypes_e}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(g)} rows)")
                n_pass += 1
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: {type(ex).__name__}: {ex}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
