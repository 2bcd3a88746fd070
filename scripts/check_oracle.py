#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run each oracle SQL
in DuckDB against the sf parquet tables and compare to the parquet
results that graft.Verify dumped. Columns sorted by name, rows sorted
by all columns, exact value compare (driver hashes — so we demand
exact equality and report any diff)."""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
fails = 0
for name, sql in sorted(oracle.items()):
    res_path = os.path.join(out_dir, name)
    if not os.path.isdir(res_path):
        print(f"FAIL {name}: no spark result dir"); fails += 1; continue
    try:
        want = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}"); fails += 1; continue
    got = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{res_path}/*.parquet")],
                    ignore_index=True) if glob.glob(f"{res_path}/*.parquet") else None
    if got is None:
        print(f"FAIL {name}: no spark parquet"); fails += 1; continue
    want = want.reindex(sorted(want.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(want.columns) != list(got.columns):
        print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}"); fails += 1; continue
    want = want.sort_values(by=list(want.columns)).reset_index(drop=True)
    got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    if len(want) != len(got):
        print(f"FAIL {name}: rows {len(got)} != {len(want)}"); fails += 1; continue
    # exact compare, but surface near-misses distinctly
    diffs = []
    for c in want.columns:
        wc, gc = want[c], got[c]
        try:
            eq = (wc.values == gc.values) | (wc.isna().values & gc.isna().values)
        except Exception:
            eq = wc.astype(str).values == gc.astype(str).values
        if not eq.all():
            idx = (~eq).nonzero()[0][:3]
            diffs.append((c, [(int(i), wc.iloc[i], gc.iloc[i]) for i in idx]))
    if diffs:
        fails += 1
        print(f"FAIL {name}: value diffs:")
        for c, rows in diffs:
            for i, w, g in rows:
                print(f"   col={c} row={i}: oracle={w!r} spark={g!r}")
    else:
        print(f"OK   {name} ({len(want)} rows)")
print(f"\n{len(oracle) - fails}/{len(oracle)} oracle queries match")
sys.exit(1 if fails else 0)
