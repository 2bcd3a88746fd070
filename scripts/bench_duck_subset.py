#!/usr/bin/env python3
"""Time a SUBSET of oracle queries in DuckDB (best-of-2) — the
per-entry twin of graft.BenchOne, for recording scale rows without
paying the whole-suite baseline_bench.py run.

Usage: bench_duck_subset.py SF_DIR ORACLE_JSON name [name...]
"""
import sys, json, glob, os, time
import duckdb

sf_dir, oracle_json = sys.argv[1], sys.argv[2]
names = sys.argv[3:]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[: -len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
oracle = json.load(open(oracle_json))
out = {}
for name in names:
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        con.sql(oracle[name]).fetchall()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    out[name] = round(best, 3)
    print(f"[duck] {name:24s} best={best:.3f}", file=sys.stderr)
print(json.dumps({"sf": sf_dir, "queries": out}))
