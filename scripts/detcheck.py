#!/usr/bin/env python3
"""Determinism check: value-compare two Verify output dirs query by query
(columns sorted by name, rows hashed the same way check.py does)."""
import sys, glob, hashlib
import pandas as pd

a_dir, b_dir = sys.argv[1], sys.argv[2]

def h(path):
    df = pd.read_parquet(path)
    df = df.reindex(sorted(df.columns), axis=1)
    return hashlib.md5(df.to_csv(index=False, float_format="%.10g").encode()).hexdigest()

names = sorted(p.split("/")[-1] for p in glob.glob(f"{a_dir}/*") if not p.endswith(".json"))
same = diff = 0
for n in names:
    try:
        if h(f"{a_dir}/{n}") == h(f"{b_dir}/{n}"):
            same += 1
        else:
            diff += 1
            print(f"DIFF  {n}")
    except Exception as e:
        diff += 1
        print(f"ERR   {n}: {e}")
print(f"{same} identical, {diff} differing of {len(names)} queries")
