#!/usr/bin/env python3
"""Partition-layout invariance check: compare two Verify dump dirs of the
same inventory produced under DIFFERENT Spark parallelism (e.g. local[24]
vs local[7]). Any entry whose output depends on partition order — a
non-total ORDER BY, an order-sensitive aggregation, a collect_list that
leaks into values — hashes differently between the two dumps, with no
oracle in the loop. Same hash function as scripts/check.py."""
import sys, glob, os, hashlib
import pandas as pd

a_dir, b_dir = sys.argv[1], sys.argv[2]

def h(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return hashlib.md5(df.to_csv(index=False, float_format="%.10g").encode()).hexdigest()

names = sorted(os.path.basename(p) for p in glob.glob(f"{a_dir}/*")
               if os.path.isdir(p))
ok = fail = 0
for name in names:
    if not os.path.isdir(f"{b_dir}/{name}"):
        print(f"SKIP  {name}: missing in {b_dir}")
        continue
    try:
        da, db = pd.read_parquet(f"{a_dir}/{name}"), pd.read_parquet(f"{b_dir}/{name}")
        if len(da) != len(db):
            fail += 1
            print(f"FAIL  {name}: rows {len(da)} vs {len(db)}")
        elif h(da) != h(db):
            fail += 1
            print(f"FAIL  {name}: hash mismatch (order/value fork across layouts)")
        else:
            ok += 1
    except Exception as e:
        fail += 1
        print(f"ERROR {name}: {str(e)[:200]}")
print(f"\n{ok} invariant, {fail} layout-dependent of {len(names)} entries")
