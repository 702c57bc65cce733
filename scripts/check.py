#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: read Verify's parquet
dumps + oracle_sql.json, run each oracle in DuckDB over the same sf dir,
compare row count, schema (column names), and values (rows sorted).

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style value hash: exact repr; we rounded upstream in both
        # engines, so doubles must be bit-identical here
        return repr(v)
    return repr(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.sql(sql).fetchall()
            exp_cols = [d[0] for d in con.sql(sql).description]
            got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = [d[0] for d in got_rel.description]
            got = got_rel.fetchall()
            # sort columns by name (driver semantics), then sort rows
            eidx = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
            gidx = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
            if sorted(exp_cols) != sorted(got_cols):
                print(f"FAIL {name}: schema exp={sorted(exp_cols)} got={sorted(got_cols)}")
                n_fail += 1
                continue
            if len(exp) != len(got):
                print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
                n_fail += 1
                continue
            erows = sorted(tuple(canon(r[i]) for i in eidx) for r in exp)
            grows = sorted(tuple(canon(r[i]) for i in gidx) for r in got)
            if erows != grows:
                bad = [(e, g) for e, g in zip(erows, grows) if e != g][:3]
                print(f"FAIL {name}: values differ, first diffs: {bad}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(got)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
