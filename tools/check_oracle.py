#!/usr/bin/env python3
"""Dev-only pre-check that mimics the driver's correctness gate:
run each oracle_sql.json query in DuckDB over the sf parquet tables and
compare (rows / schema / values) against the Spark parquet dumps.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, bytes):
        return v.hex()
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got_tbl = pq.read_table(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})"); n_fail += 1; continue
        try:
            exp = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); n_fail += 1; continue
        g_cols, e_cols = sorted(got_tbl.column_names), sorted(exp.column_names)
        if g_cols != e_cols:
            print(f"FAIL {name}: schema {g_cols} != {e_cols}"); n_fail += 1; continue
        if got_tbl.num_rows != exp.num_rows:
            print(f"FAIL {name}: rows {got_tbl.num_rows} != {exp.num_rows}"); n_fail += 1; continue
        g = got_tbl.select(g_cols).to_pylist()
        e = exp.select(e_cols).to_pylist()
        g = sorted([tuple(canon(r[c]) for c in g_cols) for r in g], key=repr)
        e = sorted([tuple(canon(r[c]) for c in e_cols) for r in e], key=repr)
        bad = [(a, b) for a, b in zip(g, e) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(g)} rows differ; first: spark={bad[0][0]} duck={bad[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({got_tbl.num_rows} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
