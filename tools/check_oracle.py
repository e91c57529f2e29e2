#!/usr/bin/env python3
"""Local pre-check of SparkEntry oracles, mimicking the driver's t2 gate:
run graft.Verify first (writes <out>/<query>.parquet + oracle_sql.json),
then this script runs each oracle in DuckDB against the same sf dir and
compares values (columns sorted by name, rows sorted, 1e-9 tolerance on
floats). Dev tool only — not part of the shipped library.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(x):
    if hasattr(x, "to_pydatetime"):
        return x.to_pydatetime()
    if isinstance(x, float):
        return round(x, 9)
    try:
        import decimal
        if isinstance(x, decimal.Decimal):
            return float(x)
    except ImportError:
        pass
    return x


def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    return sorted(out, key=lambda t: tuple(repr(x) for x in t)), \
        [colnames[i] for i in order]


def approx_eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(af) and math.isnan(bf):
            return True
        return abs(af - bf) <= 1e-9 * max(1.0, abs(af), abs(bf))
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            spark_tbl = pq.read_table(f"{out_dir}/{name}")
            spark_cols = spark_tbl.column_names
            spark_rows = [tuple(r.values()) for r in spark_tbl.to_pylist()]
            res = con.execute(sql)
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as e:
            failed.append((name, f"EXEC: {e}"))
            continue
        if sorted(spark_cols) != sorted(duck_cols):
            failed.append((name, f"SCHEMA: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"))
            continue
        s_rows, _ = canon(spark_rows, spark_cols)
        d_rows, _ = canon(duck_rows, duck_cols)
        if len(s_rows) != len(d_rows):
            failed.append((name, f"ROWS: spark={len(s_rows)} duck={len(d_rows)}"))
            continue
        bad = None
        for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
            if not all(approx_eq(a, b) for a, b in zip(sr, dr)):
                bad = (i, sr, dr)
                break
        if bad:
            failed.append((name, f"VALUE@{bad[0]}: spark={bad[1][:6]} duck={bad[2][:6]}"))
        else:
            print(f"  OK   {name} ({len(s_rows)} rows)")
    for name, why in failed:
        print(f"  FAIL {name}: {why}")
    print(f"{len(oracle) - len(failed)}/{len(oracle)} oracle queries match")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
