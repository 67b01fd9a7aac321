#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness compare.

Usage: python3 scripts/compare_oracle.py <sfDir> <verifyOutDir>

Reads each <query>.parquet that graft.Verify wrote, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the sf tables, and
compares row count, schema (sorted column names), and a value hash
(rows sorted, columns sorted by name — mirroring the driver).
"""
import sys, json, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = True
for d in sorted(glob.glob(f"{out_dir}/*/")):
    name = os.path.basename(d.rstrip("/"))
    spark = con.sql(f"SELECT * FROM '{d}/*.parquet'").fetchdf()
    if name not in oracles:
        print(f"{name:24s} rows={len(spark)} (no_oracle)")
        continue
    oracle = con.sql(oracles[name]).fetchdf()
    cols_s = sorted(spark.columns)
    cols_o = sorted(oracle.columns)
    schema_ok = cols_s == cols_o
    rows_ok = len(spark) == len(oracle)
    hash_ok = False
    if schema_ok and rows_ok:
        a = spark[cols_s].sort_values(cols_s).reset_index(drop=True)
        b = oracle[cols_o].sort_values(cols_o).reset_index(drop=True)
        try:
            import pandas as pd
            hash_ok = all(
                (a[c].astype(str).values == b[c].astype(str).values).all()
                for c in cols_s)
        except Exception as e:
            hash_ok = False
    status = "OK" if (schema_ok and rows_ok and hash_ok) else "FAIL"
    if status == "FAIL":
        ok = False
    print(f"{name:24s} {status} rows={len(spark)}/{len(oracle)} schema={schema_ok} hash={hash_ok}")
    if status == "FAIL" and schema_ok and rows_ok:
        for c in cols_s:
            av = spark[cols_s].sort_values(cols_s).reset_index(drop=True)[c]
            bv = oracle[cols_o].sort_values(cols_o).reset_index(drop=True)[c]
            neq = (av.astype(str).values != bv.astype(str).values)
            if neq.any():
                i = neq.argmax()
                print(f"    col {c}: first diff row {i}: spark={av.iloc[i]!r} oracle={bv.iloc[i]!r} (dtypes {av.dtype}/{bv.dtype})")
    elif status == "FAIL":
        print(f"    spark cols={cols_s}\n    oracle cols={cols_o}")
sys.exit(0 if ok else 1)
