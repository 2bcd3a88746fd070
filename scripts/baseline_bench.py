#!/usr/bin/env python3
"""Record the DuckDB single-node baseline: wall-time per oracle query
at a given sf dir. Used to fill BASELINE.md so the driver's bench
gate is measurable against a real number."""
import sys, json, glob, os, time
import duckdb

sf_dir, oracle_json = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
oracle = json.load(open(oracle_json))
out = {}
for name, sql in sorted(oracle.items()):
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        con.sql(sql).fetchall()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    out[name] = round(best, 3)
print(json.dumps({"sf": sf_dir, "total": round(sum(out.values()), 3), "queries": out}))
