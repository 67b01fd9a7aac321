import sys, json, glob, os
import duckdb
sf_dir, out_dir = sys.argv[1], sys.argv[2]
skip = set(sys.argv[3].split(',')) if len(sys.argv) > 3 else set()
only = set(sys.argv[4].split(',')) if len(sys.argv) > 4 else None
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events documents embeddings").split():
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
for d in sorted(glob.glob(f"{out_dir}/*/")):
    name = os.path.basename(d.rstrip("/"))
    if name in skip or (only is not None and name not in only):
        continue
    spark = con.sql(f"SELECT * FROM '{d}/*.parquet'").fetchdf()
    if name not in oracles:
        print(f"{name:24s} rows={len(spark)} (no_oracle)", flush=True); continue
    oracle = con.sql(oracles[name]).fetchdf()
    cols_s, cols_o = sorted(spark.columns), sorted(oracle.columns)
    schema_ok, rows_ok = cols_s == cols_o, len(spark) == len(oracle)
    hash_ok = False
    if schema_ok and rows_ok:
        a = spark[cols_s].sort_values(cols_s).reset_index(drop=True)
        b = oracle[cols_o].sort_values(cols_o).reset_index(drop=True)
        hash_ok = all((a[c].astype(str).values == b[c].astype(str).values).all() for c in cols_s)
    print(f"{name:24s} {'OK' if (schema_ok and rows_ok and hash_ok) else 'FAIL'} rows={len(spark)}/{len(oracle)} schema={schema_ok} hash={hash_ok}", flush=True)
    if schema_ok and rows_ok and not hash_ok:
        a = spark[cols_s].sort_values(cols_s).reset_index(drop=True)
        b = oracle[cols_o].sort_values(cols_o).reset_index(drop=True)
        for c in cols_s:
            neq = (a[c].astype(str).values != b[c].astype(str).values)
            if neq.any():
                i = neq.argmax()
                print(f"    col {c}: row {i}: spark={a[c].iloc[i]!r} oracle={b[c].iloc[i]!r}", flush=True)
