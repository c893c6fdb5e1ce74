#!/usr/bin/env python3
"""Round-start testdata schema check (the r10 lesson: the driver
regenerates /root/testdata between rounds and changed events.ts encoding
in r10 — readers must be re-validated against the CURRENT schemas before
trusting last round's code).

Prints every table's schema at every scale factor, and — when a snapshot
file exists — diffs against it so a driver-side schema change is one
command away from being visible:

  python3 tools/schema_dump.py              # print + diff vs tools/testdata_schemas.json
  python3 tools/schema_dump.py --save       # (re)write the snapshot

Exit code 1 on any diff, so it can gate a round's first build.
"""
import sys, json, glob, os

try:
    import pyarrow.parquet as pq
except ImportError:
    sys.exit("pyarrow not available (driver-side tool only)")

SNAP = os.path.join(os.path.dirname(__file__), "testdata_schemas.json")
ROOT = "/root/testdata"

current = {}
for sf_dir in sorted(glob.glob(f"{ROOT}/sf*")):
    sf = os.path.basename(sf_dir)
    for f in sorted(glob.glob(f"{sf_dir}/*.parquet")):
        s = pq.read_schema(f)
        current[f"{sf}/{os.path.basename(f)}"] = {
            n: str(s.field(n).type) for n in s.names}

if "--save" in sys.argv:
    json.dump(current, open(SNAP, "w"), indent=1, sort_keys=True)
    print(f"snapshot written: {SNAP} ({len(current)} tables)")
    sys.exit(0)

for k, cols in current.items():
    print(f"{k}: " + ", ".join(f"{n}:{t}" for n, t in cols.items()))

if not os.path.exists(SNAP):
    sys.exit(f"\nno snapshot at {SNAP} — run with --save to pin the current schemas")

snap = json.load(open(SNAP))
diffs = []
for k in sorted(set(snap) | set(current)):
    if k not in current:
        diffs.append(f"REMOVED table {k}")
    elif k not in snap:
        diffs.append(f"NEW table {k}: {current[k]}")
    elif snap[k] != current[k]:
        for c in sorted(set(snap[k]) | set(current[k])):
            a, b = snap[k].get(c), current[k].get(c)
            if a != b:
                diffs.append(f"CHANGED {k}.{c}: {a} -> {b}")

if diffs:
    print("\nSCHEMA DIFFS vs snapshot (driver changed the testdata — re-audit readers):")
    for d in diffs:
        print("  " + d)
    sys.exit(1)
print(f"\nschemas match snapshot ({len(current)} tables)")
