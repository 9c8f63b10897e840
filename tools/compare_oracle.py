#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: for each SparkEntry query
dumped by graft.Verify, run the oracle SQL in DuckDB over the same parquet
tables, sort columns by name and rows by all columns, and compare values."""
import json, sys, glob
import duckdb, pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vfy"

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
# a query that THREW in graft.Verify leaves an entry here (and no output
# dir); surface those as failures instead of silently comparing nothing
try:
    errors = json.load(open(f"{out_dir}/errors.json"))
except FileNotFoundError:
    errors = {}
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else v)
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype("int64")
        if str(df[c].dtype) in ("float32",):
            df[c] = df[c].astype("float64")
        if str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

fails = 0
for name, msg in errors.items():
    print(f"[ERR  ] {name}: {msg[:160]}"); fails += 1
# every declared query must have produced SOMETHING (output or an error)
produced = {d.split("/")[-1] for d in glob.glob(f"{out_dir}/q_*")}
for name in oracle:
    if name not in produced and name not in errors:
        print(f"[MISS ] {name}: never attempted"); fails += 1
for qdir in sorted(glob.glob(f"{out_dir}/q_*")):
    name = qdir.split("/")[-1]
    spark_df = pd.concat([pd.read_parquet(p) for p in glob.glob(f"{qdir}/*.parquet")]) \
        if glob.glob(f"{qdir}/*.parquet") else None
    if spark_df is None:
        print(f"[MISS ] {name}: no spark output"); fails += 1; continue
    if name not in oracle:
        # a rows-only query that returns ZERO rows verifies nothing —
        # fail the gate instead of printing a marker nobody reads
        if len(spark_df) == 0:
            print(f"[ROWS!] {name}: no oracle and ZERO rows — vacuous check")
            fails += 1
        else:
            print(f"[ROWS ] {name}: no oracle, rows={len(spark_df)}")
        continue
    try:
        duck_df = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"[DUCK!] {name}: oracle SQL failed: {e}"); fails += 1; continue
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        print(f"[COLS!] {name}: spark={list(a.columns)} duck={list(b.columns)}"); fails += 1; continue
    if len(a) != len(b):
        print(f"[ROWS!] {name}: spark={len(a)} duck={len(b)}"); fails += 1; continue
    eq = a.equals(b)
    if not eq:
        diff = (a != b) & ~(a.isna() & b.isna())
        ndiff = int(diff.any(axis=1).sum())
        print(f"[VALS!] {name}: {ndiff}/{len(a)} differing rows")
        mask = diff.any(axis=1)
        print(pd.concat([a[mask].head(3).add_prefix("spark_"),
                         b[mask].head(3).add_prefix("duck_")], axis=1).to_string())
        fails += 1
    else:
        print(f"[OK   ] {name}: {len(a)} rows")
print(f"\n{'ALL OK' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
