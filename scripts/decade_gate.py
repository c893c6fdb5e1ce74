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

def preflight():
    """r16 lesson (SURVEY §6): a killed Spark JVM's multi-GB
    /tmp/blockmgr-* leftover starved DuckDB's k-core recursion of temp
    space mid-gate and produced a false g05 ERROR that cost two manual
    adjudications. Sweep stale Spark spill dirs (only when no java
    process is alive — a live JVM's blockmgr must never be touched) and
    refuse to start a long DuckDB replay without disk headroom."""
    import shutil
    # a live java JVM owns /tmp/blockmgr-*/spark-*; a live python/duckdb
    # process may own /tmp/duckdb_temp* (r17 advice: a concurrent gate
    # replay's live temp was sweepable) — treat any of them as "in use"
    busy = set()
    for pid in os.listdir("/proc"):
        if not pid.isdigit() or pid == str(os.getpid()):
            continue
        try:
            with open(f"/proc/{pid}/comm") as f:
                comm = f.read().strip()
            if comm == "java" or comm.startswith("python") or "duckdb" in comm:
                busy.add(comm)
        except OSError:
            continue
    import glob
    stale = glob.glob("/tmp/blockmgr-*") + glob.glob("/tmp/spark-*") \
        + glob.glob("/tmp/duckdb_temp*")
    if stale and busy:
        print(f"[gate] preflight: {len(stale)} spill path(s) in /tmp but "
              f"possibly-owning process(es) alive ({', '.join(sorted(busy))}) "
              "— not sweeping (kill stray consumers and rerun if these are "
              "leftovers)", flush=True)
    elif stale:
        freed = 0
        swept = 0
        for d in stale:
            try:
                if os.path.isdir(d):
                    sz = sum(f.stat().st_size for f in os.scandir(d)
                             if f.is_file())
                    shutil.rmtree(d, ignore_errors=True)
                else:
                    sz = os.path.getsize(d)
                    os.remove(d)  # rmtree(ignore_errors) silently no-ops on files
                swept += 1
                freed += sz
            except OSError:
                continue
        print(f"[gate] preflight: swept {swept}/{len(stale)} stale spill "
              f"path(s) from /tmp (~{freed / 1e9:.1f} GB at top level)",
              flush=True)
    free_gb = shutil.disk_usage("/tmp").free / 1e9
    # sf1 k-core alone spills tens of GB of DuckDB temp; below 40 GB the
    # replay is more likely to produce a false ERROR than evidence
    if free_gb < 40:
        sys.exit(f"[gate] preflight: only {free_gb:.0f} GB free on /tmp — "
                 "the sf1 DuckDB replay needs ~40 GB headroom; free disk "
                 "and rerun")
    print(f"[gate] preflight: {free_gb:.0f} GB free on /tmp", flush=True)


preflight()

print(f"[gate] 1/3 GenData sf={sf} -> {sf_dir}", flush=True)
subprocess.run([java, "graft.tools.GenData", sf, sf_dir],
               env=env, check=True, capture_output=True)

# a stale out_dir from a previous (possibly full) run would make the
# --only-dumped compare below re-replay every entry it finds — clear it
# so an only= run checks exactly what this run dumped
import shutil
shutil.rmtree(out_dir, ignore_errors=True)

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
