#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify first
(writes <out>/<query>/ parquet dirs + oracle_sql.json), then this script
runs each oracle SQL in DuckDB over the same sf parquet tables and
compares rows / schema / value-hash with columns sorted by name.
Usage: check_correctness.py <sfdir> <verify_out> [query ...]
"""
import sys, json, glob, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def h(df: pd.DataFrame):
    parts = []
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            s = col.astype(str)
        elif str(col.dtype).startswith("datetime"):
            s = col.astype("datetime64[ns]").astype("int64").astype(str)
        elif col.dtype == float:
            s = col.map(lambda v: "null" if pd.isna(v) else repr(round(v, 9)))
        else:
            s = col.astype(str)
        s = s.where(~col.isna(), "null")
        parts.append("\x01".join(s.tolist()))
    return hashlib.md5("\x02".join(parts).encode()).hexdigest()

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    import os
    for t in TABLES:
        # driver testdata ships single files; GenData's sf1 tables are
        # Spark-written DIRECTORIES named <t>.parquet — glob inside those
        p = f"{sfdir}/{t}.parquet"
        pat = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = n_noorc = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"{name}: NO SPARK OUTPUT"); n_fail += 1; continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files])
        sql = oracle.get(name)
        if not sql:
            print(f"{name}: no_oracle ({len(spark_df)} rows)"); n_noorc += 1; continue
        try:
            ora_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"{name}: ORACLE ERROR: {e}"); n_fail += 1; continue
        s, o = norm(spark_df), norm(ora_df)
        rows = len(s) == len(o)
        schema = list(s.columns) == list(o.columns)
        hmatch = rows and schema and h(s) == h(o)
        if rows and schema and hmatch:
            print(f"{name}: OK ({len(s)} rows)"); n_pass += 1
        else:
            n_fail += 1
            print(f"{name}: MISMATCH rows={len(s)}/{len(o)} schema={schema} hash={hmatch}")
            if not schema:
                print(f"  spark cols:  {list(s.columns)}\n  oracle cols: {list(o.columns)}")
            else:
                print("  spark head:\n", s.head(8).to_string())
                print("  oracle head:\n", o.head(8).to_string())
    print(f"\npass={n_pass} fail={n_fail} no_oracle={n_noorc}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
