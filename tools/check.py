#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (my own feedback loop;
NOT part of the Spark library). Runs after `sbt "runMain graft.Verify
<sfDir> <outDir>"`:

  python3 tools/check.py <sfDir> <outDir>

Registers each <sfDir>/*.parquet as a DuckDB view named by file stem,
runs every oracle_sql.json query, and compares against <outDir>/<name>
parquet dumps: column names (sorted), row count, and cell values.
"""
import sys, glob, os, json
import duckdb
import pandas as pd


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify everything for a stable value compare
    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        if hasattr(v, "tolist"):  # numpy arrays from parquet lists
            return repr(list(v))
        return repr(v)
    return df.map(cell)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for f in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(f).replace(".parquet", "")
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        mine_dir = f"{out_dir}/{name}"
        try:
            expected = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e)[:200]}")
            n_fail += 1
            continue
        try:
            mine = con.sql(f"SELECT * FROM '{mine_dir}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: my parquet unreadable: {str(e)[:200]}")
            n_fail += 1
            continue
        a, b = norm(expected), norm(mine)
        if sorted(a.columns) != sorted(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            n_fail += 1
            continue
        neq = (a.values != b.values)
        if neq.any():
            i, j = list(zip(*neq.nonzero()))[0][0], neq.nonzero()[1][0]
            print(f"FAIL {name}: first diff at row {i} col {a.columns[j]}: "
                  f"oracle={a.iloc[i, j]!r} mine={b.iloc[i, j]!r}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(a)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
