#!/usr/bin/env python3
"""Dev-only parity pre-check (mimics the driver's DuckDB correctness gate).

NOT part of the Scala library. Usage:
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
  python3 scripts/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json, sys, glob, os
import duckdb

def canon(rows, cols):
    # sort columns by name, then rows; stringify floats via repr of round-trip
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                v = f"{v:.9g}"
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out), [cols[i] for i in idx]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{out_dir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: empty spark output dir"); n_fail += 1; continue
        srel = con.execute(f"SELECT * FROM read_parquet({files!r})")
        scols = [d[0] for d in srel.description]
        srows, scols_s = canon(srel.fetchall(), scols)
        try:
            drel = con.execute(sql)
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_fail += 1; continue
        dcols = [d[0] for d in drel.description]
        drows, dcols_s = canon(drel.fetchall(), dcols)
        if scols_s != dcols_s:
            print(f"FAIL {name}: columns {scols_s} != {dcols_s}"); n_fail += 1
        elif srows != drows:
            print(f"FAIL {name}: {len(srows)} spark rows vs {len(drows)} duckdb rows")
            for a, b in list(zip(srows, drows))[:5]:
                if a != b:
                    print(f"  spark : {a}\n  duckdb: {b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)"); n_pass += 1
    extra = set(json.load(open(f"{out_dir}/oracle_sql.json")).keys())
    print(f"\n{n_pass} pass, {n_fail} fail, {len(extra)} oracles")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
