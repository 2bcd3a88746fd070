#!/usr/bin/env python3
"""Scoped sf100 value check for dedup_simhash (the r14 minhash
pattern): the UNSCOPED oracle is an all-pairs join over N docs'
signatures — infeasible at 5M docs — so this check re-runs the exact
same oracle SQL with the corpus restricted to the TOUCHED docs (every
doc appearing in an emitted pair) and demands set equality:

  - soundness: every emitted pair must re-derive to hamming <= max
    from raw text in DuckDB's own arithmetic;
  - completeness WITHIN the touched set: any qualifying pair BETWEEN
    touched docs that the operator missed appears in the scoped
    re-derivation and fails the equality.

(A pair both of whose docs are untouched stays outside the scope —
that is the honest limit of the scoped form, recorded in BASELINE.)

Usage: check_simhash_scoped.py <sf_dir> <verify_out_dir>
  where verify_out_dir holds graft.Verify's dump (dedup_simhash/ +
  oracle_sql.json from the SAME run).
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name}_all AS SELECT * FROM '{p}'")

pairs = pd.concat([pd.read_parquet(f) for f in
                   glob.glob(os.path.join(out_dir, "dedup_simhash", "*.parquet"))],
                  ignore_index=True)
pairs = pairs.sort_values(by=list(pairs.columns)).reset_index(drop=True)
con.register("got_pairs", pairs)
print(f"emitted pairs: {len(pairs)}")

# the touched-doc scope
con.execute("""CREATE VIEW touched AS
  SELECT doc_a AS doc_id FROM got_pairs UNION SELECT doc_b FROM got_pairs""")
n_touched = con.execute("SELECT COUNT(*) FROM touched").fetchone()[0]
print(f"touched docs: {n_touched}")

# the dumped oracle SQL, scoped: `documents` resolves to the touched
# restriction (the SQL references the view by name, so defining the
# view IS the scoping — no string surgery on the oracle text)
sql = json.load(open(os.path.join(out_dir, "oracle_sql.json")))["dedup_simhash"]
con.execute("""CREATE VIEW documents AS
  SELECT d.* FROM documents_all d JOIN touched t USING (doc_id)""")
want = con.sql(sql).df().sort_values(by=list(pairs.columns)).reset_index(drop=True)
print(f"scoped re-derivation pairs: {len(want)}")

if len(want) != len(pairs):
    print("FAIL: pair-set size mismatch"); sys.exit(1)
for c in pairs.columns:
    if not (want[c].values == pairs[c].values).all():
        print(f"FAIL: column {c} differs"); sys.exit(1)
print("OK: emitted pair set == scoped exact re-derivation (sound + touched-complete)")
