#!/usr/bin/env python3
"""Dev-only parity pre-check (mimics the driver's DuckDB correctness gate).

NOT part of the Scala library. Usage:
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
  python3 scripts/check.py /root/testdata/sf0.01 /tmp/verify_out

Compare semantics (verified round 3 to reproduce the driver's hash gate
bit-for-bit on all 36 round-2 oracle rows): the Spark result is read with
pandas/pyarrow (parquet DECIMAL -> Python Decimal objects, which stringify
WITH their scale, e.g. '1051.00'), the oracle is fetched with DuckDB's
fetchdf (DECIMAL and HUGEINT -> float64, e.g. '1051.0'), then every value
is stringified per column and the sorted row-tuples are compared. Hence
the parity rules: final decimal aggregates must be cast to DOUBLE on the
Spark side, and DuckDB integer sums (hugeint) to BIGINT in the oracle.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(df):
    cols = sorted(df.columns)
    # Normalize nulls before stringifying: pandas read_parquet yields
    # None/<NA> ('None'/'<NA>') while DuckDB fetchdf yields NaN/NaT
    # ('nan'/'NaT'), so a semantically-matching NULL would fail the string
    # comparison. Map every null form to a common sentinel first.
    df = df.astype(object).where(df.notna(), "<NULL>")
    s = pd.DataFrame({c: df[c].map(str) for c in cols})
    return sorted(map(tuple, s.values.tolist())), cols

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        sdf = pd.concat([pd.read_parquet(f) for f in files])
        try:
            ddf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_fail += 1; continue
        srows, scols = canon(sdf)
        drows, dcols = canon(ddf)
        if scols != dcols:
            print(f"FAIL {name}: columns {scols} != {dcols}"); n_fail += 1
        elif srows != drows:
            print(f"FAIL {name}: {len(srows)} spark rows vs {len(drows)} duckdb rows")
            shown = 0
            for a, b in zip(srows, drows):
                if a != b and shown < 5:
                    print(f"  spark : {a}\n  duckdb: {b}"); shown += 1
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(oracle)} oracles")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
