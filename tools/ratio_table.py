#!/usr/bin/env python3
"""Spark-vs-DuckDB ratio adjudication for SURVEY §6.

Joins a Bench spread dump (bench_spread_<sf>.json — per-query [min..max]
of three timed runs) with BASELINE_duckdb_<sf>.json (same-machine,
same-parquet DuckDB timings of the oracle SQL) and prints the three cuts
the round-9 verdict prescribed:

  1. full-inventory ratio (Spark total vs DuckDB total),
  2. comparable-subset ratio + per-query distribution,
  3. heavy-kernel cut (entries where either engine spends >= 1s —
     where data volume, not dispatch overhead, dominates).

Usage: python3 tools/ratio_table.py [bench_spread.json] [baseline.json]
"""
import sys, json

spread_path = sys.argv[1] if len(sys.argv) > 1 else "bench_spread_sf0.1.json"
base_path = sys.argv[2] if len(sys.argv) > 2 else "BASELINE_duckdb_sf0.1.json"

spread = json.load(open(spread_path))["spread"]
base = json.load(open(base_path))
dq = base["queries"]

spark = {k: v[0] for k, v in spread.items()}  # min of 3 = steady state
common = sorted(set(spark) & set(dq))

# This is an adjudication tool: an empty intersection or a zero total
# means mismatched input files, and a readable message beats a
# ZeroDivisionError/ValueError traceback.
if not common:
    sys.exit(f"no common queries between {spread_path} and {base_path} — "
             "are these the same inventory?")


def ratio(s, d):
    return f"{s / d:.2f}x" if d > 0 else "n/a (duckdb total is 0)"


st = sum(spark[k] for k in common)
dt = sum(dq[k] for k in common)
print(f"comparable subset: {len(common)} queries, spark {st:.1f}s vs duckdb {dt:.1f}s -> ratio {ratio(st, dt)}")
print(f"full spark inventory: {sum(spark.values()):.1f}s over {len(spark)} queries; duckdb missing {sorted(set(spark)-set(dq))}")

ratios = sorted(((spark[k] / dq[k] if dq[k] > 0 else float('inf'), k) for k in common))
med = ratios[len(ratios)//2]
print(f"per-query ratio: median {med[0]:.1f}x ({med[1]}); spark faster on {sum(1 for r,_ in ratios if r < 1)} of {len(ratios)}")

heavy = [k for k in common if spark[k] >= 1.0 or dq[k] >= 1.0]
hs, hd = sum(spark[k] for k in heavy), sum(dq[k] for k in heavy)
if heavy:
    print(f"\nheavy cut (either side >= 1s): {len(heavy)} queries, spark {hs:.1f}s vs duckdb {hd:.1f}s -> ratio {ratio(hs, hd)}")
    for k in sorted(heavy, key=lambda k: -(dq[k] - spark[k])):
        r = f"{spark[k]/dq[k]:6.2f}x" if dq[k] > 0 else "   n/a"
        print(f"  {k:28s} spark {spark[k]:8.2f}  duckdb {dq[k]:8.2f}  ratio {r}")
else:
    print("\nheavy cut (either side >= 1s): empty — every query is sub-second on both engines")

light = [k for k in common if k not in heavy]
if light:
    ls, ld = sum(spark[k] for k in light), sum(dq[k] for k in light)
    print(f"\nlight cut (both sides < 1s): {len(light)} queries, spark {ls:.1f}s vs duckdb {ld:.1f}s -> ratio {ratio(ls, ld)}")
    print(f"  (spark per-query floor: min {min(spark[k] for k in light):.2f}s — job scheduling + codegen dispatch, amortizes at scale)")
else:
    print("\nlight cut (both sides < 1s): empty")
