#!/usr/bin/env python3
"""Ground the "within 2x of baseline" criterion with real numbers.

The reference (yifeif/presto-on-ray) publishes no benchmarks, so the only
same-machine, same-data baseline available is the DuckDB oracle itself:
every hash-verified entry already has ANSI SQL (OracleSql.scala, dumped by
Verify as oracle_sql.json) that computes the identical result over the
identical parquet. This script wall-clocks each oracle query in DuckDB at a
given scale factor, using the same protocol as Bench.scala (one warm run,
then report min of two steady-state runs, full materialization via
fetchall), and writes BASELINE_duckdb_<sf>.json:

  {"engine": "duckdb", "version": ..., "threads": N, "sf": ...,
   "queries": {name: sec, ...}, "total": sec}

Compare with BENCH_r{N}.json per query to get the spark-vs-duckdb ratio
table in SURVEY §6. Run driver-side tooling only (duckdb is not a library
dependency of the Scala engine).

Usage: python3 tools/baseline_duckdb.py [sf_dir] [oracle_sql.json] [out.json]
"""
import sys, json, time, glob, os
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
oracle_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"
sf_name = os.path.basename(sf_dir.rstrip("/"))
out_path = sys.argv[3] if len(sys.argv) > 3 else f"BASELINE_duckdb_{sf_name}.json"

con = duckdb.connect()
con.execute("PRAGMA threads=32")  # match Bench's local[32]
for f in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(f).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(oracle_path))

def once(sql):
    t0 = time.perf_counter()
    con.execute(sql).fetchall()  # full materialization, like toRdd.count
    return time.perf_counter() - t0

results, errors = {}, {}
for name in sorted(oracle):
    sql = oracle[name]
    try:
        once(sql)                       # warm (parquet metadata, plan cache)
        results[name] = round(min(once(sql), once(sql)), 4)
    except Exception as e:
        errors[name] = str(e)[:200]
    print(f"{name}: {results.get(name, 'ERR')}", file=sys.stderr)

out = {
    "engine": "duckdb", "version": duckdb.__version__, "threads": 32,
    "sf": sf_name, "nq": len(results),
    "total": round(sum(results.values()), 2),
    "queries": results,
}
if errors:
    out["errors"] = errors
json.dump(out, open(out_path, "w"), indent=1)
print(json.dumps({k: out[k] for k in ("engine", "sf", "nq", "total")}))
