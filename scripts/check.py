#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read Verify output
parquet per query, run oracle_sql.json in DuckDB over the same sf dir,
compare row count / schema / value hash (columns sorted by name)."""
import sys, os, json, glob, hashlib
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
# optional: --only-dumped checks just the entries Verify actually wrote
# (subset iteration / the decade gate's changed-entry mode) instead of
# erroring on every name missing from a partial dump
only_dumped = "--only-dumped" in sys.argv[3:]

con = duckdb.connect()
for f in glob.glob(f"{sf_dir}/*.parquet"):
    name = f.split("/")[-1].replace(".parquet", "")
    # driver testdata ships single files; GenData (sf1 scale runs) writes
    # standard Spark parquet DIRECTORIES — glob inside those
    src = f"{f}/*.parquet" if os.path.isdir(f) else f
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df

def h(df):
    return hashlib.md5(df.to_csv(index=False, float_format="%.10g").encode()).hexdigest()

names = sorted(oracle)
if only_dumped:
    skipped = [n for n in names if not os.path.exists(f"{out_dir}/{n}")]
    names = [n for n in names if os.path.exists(f"{out_dir}/{n}")]
    if skipped:
        print(f"[check] --only-dumped: checking {len(names)}, "
              f"skipping {len(skipped)} not in this dump")

ok = fail = 0
for name in names:
    try:
        spark_df = norm(pd.read_parquet(f"{out_dir}/{name}"))
        duck_df = norm(con.execute(oracle[name]).df())
        rows = len(spark_df) == len(duck_df)
        schema = list(spark_df.dtypes.astype(str)) == list(duck_df.dtypes.astype(str))
        hmatch = h(spark_df) == h(duck_df)
        if rows and hmatch:
            ok += 1
            print(f"OK    {name}  rows={len(spark_df)} schema_dtypes_match={schema}")
        else:
            fail += 1
            print(f"FAIL  {name}  rows {len(spark_df)} vs {len(duck_df)} schema={schema} hash={hmatch}")
            if len(spark_df) and len(duck_df):
                merged = spark_df.compare(duck_df) if len(spark_df) == len(duck_df) and list(spark_df.columns)==list(duck_df.columns) else None
                if merged is not None and len(merged):
                    print(merged.head(5))
                else:
                    print(" spark:", spark_df.head(3).to_dict("records"))
                    print(" duck :", duck_df.head(3).to_dict("records"))
    except Exception as e:
        fail += 1
        print(f"ERROR {name}: {str(e)[:300]}")

rows_only = [n for n in json.load(open(f"{out_dir}/names.json"))] if False else []
print(f"\n{ok} ok, {fail} fail of {len(names)} oracled queries")
sys.exit(1 if fail else 0)
