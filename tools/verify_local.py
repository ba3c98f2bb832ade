#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: verify_local.py <sfDir> <outDir>
  1. (caller already ran)  sbt "runMain graft.Verify <sfDir> <outDir>"
  2. this script loads outDir/<name>/ parquet + runs outDir/oracle_sql.json
     in DuckDB over <sfDir>'s tables, sorts columns by name, and compares
     row-by-row stringified values.

Dev tool only — the driver has its own comparator; this catches mismatches
before the round gate does.
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df


def cell(v):
    if v is None or v != v:  # NaN/None
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def main(sfdir, outdir):
    # guard against stale outputs from an aborted Verify run
    import time
    age = time.time() - os.path.getmtime(f"{outdir}/oracle_sql.json")
    if age > 600:
        print(f"WARNING: oracle_sql.json is {int(age)}s old - stale Verify output?")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written dataset dir (e.g. ScaleUp output)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_dir = f"{outdir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output at {res_dir}")
            n_fail += 1
            continue
        try:
            got = canon(pq.read_table(res_dir).to_pandas())
            exp = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        ok = True
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            ok = False
        elif len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            ok = False
        else:
            for c in got.columns:
                g = [cell(v) for v in got[c]]
                e = [cell(v) for v in exp[c]]
                if g != e:
                    bad = next(i for i in range(len(g)) if g[i] != e[i])
                    print(f"FAIL {name}: col {c} row {bad}: spark={g[bad]} duckdb={e[bad]}")
                    ok = False
                    break
        if ok:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
