#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
Reads each <outDir>/<name> parquet (Spark result) and runs the matching
oracle_sql.json query in DuckDB over the sfDir tables; compares row count,
sorted-column-name value hash.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(rows, cols):
    # sort columns by name, round floats, stringify, sort rows
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = f"{v:.6g}"
            vals.append(str(v))
        out.append("\x01".join(vals))
    out.sort()
    return out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            sp = con.execute(f"SELECT * FROM '{spark_dir}/*.parquet'")
            sp_cols = [d[0] for d in sp.description]
            sp_rows = sp.fetchall()
            du = con.execute(sql)
            du_cols = [d[0] for d in du.description]
            du_rows = du.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if sorted(sp_cols) != sorted(du_cols):
            print(f"FAIL {name}: cols spark={sorted(sp_cols)} duck={sorted(du_cols)}")
            n_fail += 1; continue
        a, b = canon(sp_rows, sp_cols), canon(du_rows, du_cols)
        if len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}"); n_fail += 1; continue
        if a != b:
            diff = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
            print(f"FAIL {name}: value mismatch at sorted rows {diff}")
            for i in diff[:2]:
                print(f"  spark: {a[i][:200]}")
                print(f"  duck : {b[i][:200]}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(a)} rows)"); n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
