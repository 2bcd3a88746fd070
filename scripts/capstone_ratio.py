#!/usr/bin/env python3
"""Capstone ratio tables: graft bench JSON vs duck baseline JSON.

Fair-set rules (BASELINE.md, r12+): exclude the replica-SQL entries
(ann family + semantic/embedding dedup — their DuckDB "oracle" is a
re-derivation, not an equivalent engine plan, and times graft's
favor unfairly); the second row additionally excludes the
machinery-priced stream twins (their oracle prices a batch plan
against streaming state machinery).

Usage: capstone_ratio.py GRAFT_JSON DUCK_JSON
"""
import sys, json

REPLICA = {
    "ann_ivf", "ann_ivf_pq", "ann_ivf_pq_append", "ann_ivf_probe",
    "ann_pq", "ann_recall", "ann_topk_brute", "ann_topk_lsh",
    "dedup_embedding", "dedup_semantic", "dedup_semantic_incremental",
    # round 17: the vector-takedown probe shares the ann_ivf_probe
    # replica-SQL oracle — same fairness class
    "retract_vectors",
}
STREAMS = {
    "stream_curate_gate", "stream_dedup", "stream_dedup_docs",
    "stream_enrich", "stream_join", "stream_sessionize",
    "stream_shard_assign", "stream_substring_profile", "stream_tumbling",
}

graft = json.load(open(sys.argv[1]))["queries"]
duck = json.load(open(sys.argv[2]))["queries"]
common = sorted(set(graft) & set(duck))


def row(label, names):
    g = sum(graft[n] for n in names)
    d = sum(duck[n] for n in names)
    print(f"| {label} | {len(names)} | {g:.1f} | {d:.1f} | {g/d:.2f}x |")


print("| set | n | graft s | duck s | ratio |")
print("|---|---|---|---|---|")
row("all shared", common)
fair = [n for n in common if n not in REPLICA]
row("fair (excl replica-SQL ann/semantic/embedding)", fair)
nostream = [n for n in fair if n not in STREAMS]
row("fair excl machinery-priced streams", nostream)
blow = {n for n in fair if duck[n] > 5 * graft[n]}
row(f"fair excl blowout-oracle wins (duck > 5x graft: {len(blow)})",
    [n for n in fair if n not in blow])
print()
worst = sorted(fair, key=lambda n: duck[n] / max(graft[n], 1e-9))[:12]
print("worst fair entries (graft/duck):")
for n in worst:
    print(f"  {n:32s} {graft[n]:8.3f} vs {duck[n]:8.3f}  {graft[n]/max(duck[n],1e-9):6.2f}x")
