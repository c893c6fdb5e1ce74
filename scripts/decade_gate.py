#!/usr/bin/env python3
"""Standing round-close DECADE GATE (r15 verdict task 2, promoted r16):
full-inventory — or named-subset — oracle verification at sf1.0, 10x the
bench SF. The r15 one-off run of this gate caught TEN real correctness
forks invisible at sf0.01/sf0.1 (partition-order pair structs, non-total
ORDER BYs, round-after-double-division means, epoch truncation, id
collisions, IEEE -0.0 rendering); from r16 on it runs at every round
close over at least the round's changed-entry superset, full inventory
when oracle shapes were touched.

Usage: python3 scripts/decade_gate.py [sf] [only=csv-of-entry-names]
  sf defaults to 1.0. Data regenerates deterministically (GenData draws
  are pure xxhash64 of (table, row, position) — byte-reproducible), so
  reruns always verify against identical data.

Requires compiled classes (sbt -batch compile). Runs outside the sbt
lock via scripts/graft_java.sh, so it can overlap an sbt session.
"""
import os
import subprocess
import sys

sf = sys.argv[1] if len(sys.argv) > 1 else "1.0"
only = sys.argv[2] if len(sys.argv) > 2 else None

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
tag = sf.replace(".", "_")
sf_dir = f"/tmp/gate_sf{tag}"
out_dir = f"/tmp/gate_verify_sf{tag}"
env = dict(os.environ, GRAFT_XMX="24g", SPARK_GRAFT_CPUS="16")
java = os.path.join(repo, "scripts", "graft_java.sh")

print(f"[gate] 1/3 GenData sf={sf} -> {sf_dir}", flush=True)
subprocess.run([java, "graft.tools.GenData", sf, sf_dir],
               env=env, check=True, capture_output=True)

print(f"[gate] 2/3 Verify dump -> {out_dir}"
      + (f" (only={only})" if only else " (full inventory)"), flush=True)
cmd = [java, "graft.Verify", sf_dir, out_dir] + ([only] if only else [])
p = subprocess.run(cmd, env=env, capture_output=True, text=True)
for line in p.stderr.splitlines():
    if line.startswith("[verify]"):
        print(line, flush=True)  # real per-entry failures
if p.returncode != 0:
    print(p.stderr[-3000:], file=sys.stderr)
    sys.exit(f"[gate] Verify JVM failed (exit {p.returncode})")

print("[gate] 3/3 DuckDB oracle compare", flush=True)
chk = subprocess.run(
    ["python3", os.path.join(repo, "scripts", "check.py"), sf_dir, out_dir]
    + (["--only-dumped"] if only else []))
sys.exit(chk.returncode)
