#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run each oracle SQL
in DuckDB against the sf parquet tables and compare to the parquet
results that graft.Verify dumped. Columns sorted by name, rows sorted
by all columns, exact value compare (driver hashes — so we demand
exact equality and report any diff).

Optional third arg TIMEOUT_SECS (scale sweeps, r19): each oracle runs
in a child process killed at the deadline and recorded as DNF —
DuckDB's replica oracles (full ANN re-derivations, all-pairs verify
grids) are CPU-DNF-class a decade or two up, and the sweep's value is
the oracles that DO finish (the r14 convention: DNFs are documented,
not silently skipped). DNFs do not count as failures; mismatches do.

Optional fourth arg JOBS (default 1): run up to JOBS oracles
concurrently, each still under its own deadline. With JOBS>1 each
DuckDB connection is capped at 8 threads so J stragglers don't
oversubscribe the box; the per-oracle verdicts are unchanged (each
child is isolated), only wall-clock shrinks — a serial sweep of a
100-entry registry whose replica oracles DNF at the deadline would
otherwise spend hours in kill-waits alone.
"""
import sys, json, glob, os, time
import multiprocessing as mp


def compare_one(sf_dir, out_dir, name, sql, q, threads=None):
    import duckdb
    import pandas as pd
    con = duckdb.connect()
    if threads:
        # scale-sweep mode: bound each child so one replica oracle
        # cannot OOM the box (the r19 first sf10 attempt lost two
        # children to kernel OOM kills at ~48 GB RSS); DuckDB spills
        # to the temp dir instead, and a genuine can't-fit lands as
        # an OutOfMemory error classified DNF-MEM below.
        con.execute(f"SET threads={threads}")
        con.execute(f"SET memory_limit='{os.environ.get('DUCK_MEM', '18GB')}'")
        # spill dir must be PER CHILD: DuckDB wipes its temp dir on
        # close, so a shared dir lets a finishing child delete a
        # running sibling's spill blocks mid-query
        spill = f"/tmp/duck_spill/{name}"
        os.makedirs(spill, exist_ok=True)
        con.execute(f"SET temp_directory='{spill}'")
        # and bound the spill too: four concurrent ANN replica
        # oracles filled a 49 GB disk to 100% on the r19 sf10 sweep;
        # a child that cannot fit in cap+spill is the DNF class
        con.execute(f"SET max_temp_directory_size="
                    f"'{os.environ.get('DUCK_SPILL', '10GB')}'")
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        t = os.path.basename(p)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    res_path = os.path.join(out_dir, name)
    if not os.path.isdir(res_path):
        q.put((name, "FAIL", "no spark result dir")); return
    try:
        want = con.sql(sql).df()
    except Exception as e:
        resource = any(s in str(e) for s in
                       ("emory", "temp_directory", "No space", "space left"))
        q.put((name, "DNF" if resource else "FAIL",
               f"oracle sql error: {e}")); return
    files = glob.glob(f"{res_path}/*.parquet")
    if not files:
        q.put((name, "FAIL", "no spark parquet")); return
    got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    want = want.reindex(sorted(want.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(want.columns) != list(got.columns):
        q.put((name, "FAIL", f"columns {list(got.columns)} != {list(want.columns)}")); return
    want = want.sort_values(by=list(want.columns)).reset_index(drop=True)
    got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    if len(want) != len(got):
        q.put((name, "FAIL", f"rows {len(got)} != {len(want)}")); return
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
        msg = "; ".join(
            f"col={c} row={i}: oracle={w!r} spark={g!r}"
            for c, rows in diffs for i, w, g in rows)
        q.put((name, "FAIL", f"value diffs: {msg}"))
    else:
        q.put((name, "OK", f"{len(want)} rows"))


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    timeout = float(sys.argv[3]) if len(sys.argv) > 3 else None
    jobs = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    threads = 8 if jobs > 1 else None
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    fails, dnfs, oks = 0, [], 0
    # optional 5th arg: a prior run's log — entries it already OK'd
    # are carried forward (sweep restarts shouldn't repay finished
    # oracles; verdicts are per-entry and independent)
    resumed = set()
    if len(sys.argv) > 5 and os.path.exists(sys.argv[5]):
        for line in open(sys.argv[5]):
            if line.startswith("OK   "):
                resumed.add(line.split()[1])
    for name in sorted(resumed & set(oracle)):
        print(f"OK   {name} (carried from prior run)", flush=True)
        oks += 1
    # optional 6th arg: comma-separated names to skip up front —
    # the already-known DNF-class entries (replica oracles whose
    # from-scratch SQL re-derivation is resource-DNF at this scale);
    # recorded as DNF so the summary documents them (r14 convention)
    skip = set(sys.argv[6].split(",")) if len(sys.argv) > 6 else set()
    for name in sorted(skip & set(oracle) - resumed):
        print(f"DNF  {name}: skipped up front (documented DNF-class "
              f"replica oracle at this scale)", flush=True)
        dnfs.append(name)
    pending = sorted((n, s) for n, s in oracle.items()
                     if n not in resumed and n not in skip)
    running = []  # (name, proc, queue, deadline)

    def classify(name, status, msg):
        nonlocal fails, oks
        if status == "OK":
            print(f"OK   {name} ({msg})", flush=True); oks += 1
        elif status == "DNF":
            print(f"DNF  {name}: {msg}", flush=True); dnfs.append(name)
        else:
            print(f"FAIL {name}: {msg}", flush=True); fails += 1

    def drain(q, wait):
        # mp.Queue hands results over a pipe a feeder thread flushes
        # asynchronously — poll briefly rather than get_nowait, which
        # can race the flush and miss a verdict the child DID write
        try:
            return q.get(timeout=wait)
        except Exception:
            return None

    def reap(slot):
        name, proc, q, deadline = slot
        if proc.is_alive():
            if timeout is not None and time.monotonic() >= deadline:
                # a verdict may already be queued (the child can finish
                # its put and then block — e.g. a FAIL whose diff text
                # exceeds the pipe buffer stalls the feeder thread);
                # honor it instead of masking a real mismatch as DNF
                v = drain(q, 0.1)
                proc.terminate(); proc.join()
                if v is None:
                    v = drain(q, 1.0)
                if v is not None:
                    classify(name, v[1], v[2])
                else:
                    print(f"DNF  {name}: oracle exceeded {timeout:.0f}s "
                          f"(documented, not a failure)", flush=True)
                    dnfs.append(name)
                return True
            return False
        proc.join()
        v = drain(q, 1.0)
        if v is None:
            # no verdict = the child was killed (kernel OOM at scale),
            # not a value mismatch — resource-DNF class; rerun solo
            # with jobs=1 to confirm before trusting the entry
            print(f"DNF  {name}: oracle process died without a verdict "
                  f"(resource-killed — rerun solo to confirm)", flush=True)
            dnfs.append(name)
        else:
            classify(name, v[1], v[2])
        return True

    while pending or running:
        while pending and len(running) < jobs:
            name, sql = pending.pop(0)
            q = mp.Queue()
            proc = mp.Process(target=compare_one,
                              args=(sf_dir, out_dir, name, sql, q, threads))
            proc.start()
            running.append((name, proc, q,
                            (time.monotonic() + timeout) if timeout else None))
        running = [s for s in running if not reap(s)]
        if running:
            time.sleep(0.5)
    print(f"\n{oks}/{len(oracle)} oracle queries match"
          + (f", {len(dnfs)} DNF past {timeout:.0f}s: {' '.join(sorted(dnfs))}" if dnfs else ""))
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
