#!/usr/bin/env python3
"""Generate larger-SF synthetic documents/embeddings/events tables
with the same schema and statistical shape as the driver's testdata
(TESTDATA.md), for scale runs beyond the provided sf0.1.

Usage: gen_sf.py <scale-vs-sf0.1> <outdir>
  e.g. gen_sf.py 10 /tmp/graft_sf1     # "sf1": 50k docs, 20k vecs, 1M events

Deterministic (seed fixed). Matches the sf0.1 tables in:
  - schema (int64 ids, float32 list embeddings, TIMESTAMP(NANOS) ts)
  - language/source mix, text length range, shared ~30-word vocab
  - planted near-duplicates (a copy with a short suffix) at the same
    ~5% rate, so dedup operator selectivity scales linearly
  - 10 embedding clusters (gaussian around per-label centers)
  - 5 uniform event types over 30 days, ~1/15 users per event row
Only the three tables the dedup/text/stream operators read are
generated; the TPC-H-ish tables stay driver-owned.
"""
import os, sys, json, random
import pyarrow as pa
import pyarrow.parquet as pq

scale = float(sys.argv[1])
out = sys.argv[2]

N_DOCS = int(5000 * scale)
N_VECS = int(2000 * scale)
N_EVENTS = int(100000 * scale)
N_USERS = int(1500 * scale)
DUP_RATE = 0.05  # measured on sf0.1: 250/5000 docs are planted dups
VOCAB = ("batch part spark line column order small sort fast value scan a hash "
         "slow group agg filter query big key window row table stream merge "
         "data vector join customer the").split()
LANGS = ["en"] * 8 + ["de", "es", "fr", "zh"] * 3
DIM, N_LABELS = 64, 10

rng = random.Random(42)

# documents: dup docs copy an earlier base doc and append a suffix
os.makedirs(out, exist_ok=True)
texts, langs, sources = [], [], []
for i in range(N_DOCS):
    r = rng
    if i > 10 and r.random() < DUP_RATE:
        base = r.randrange(i)  # sf0.1 bases span the whole corpus
        texts.append(texts[base] + " dup")
    else:
        # measured word-count range on sf0.1: 10..100, mean ~54
        texts.append(" ".join(r.choice(VOCAB) for _ in range(r.randint(10, 100))))
    langs.append(r.choice(LANGS))
    sources.append(f"src{r.randrange(20)}")
docs = pa.table({
    "doc_id": pa.array(range(N_DOCS), pa.int64()),
    "text": pa.array(texts, pa.string()),
    "lang": pa.array(langs, pa.string()),
    "source": pa.array(sources, pa.string()),
    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
})
pq.write_table(docs, f"{out}/documents.parquet", row_group_size=50_000)

# embeddings: DRIVER-FAITHFUL shape (fixed round 17) — unit-normalized
# near-uniform vectors with ~3% planted near-duplicates (previous
# vector + small noise, cos ~0.999). The original "tight gaussian
# clusters" (center + N(0, 0.3)) gave EVERY same-label pair cosine
# ~0.8: at the 0.4 near-dup threshold the pair output is quadratic —
# ~2e11 pairs at sf100, which no engine can emit. The driver's actual
# testdata measures unit norms with same-label cosine density equal
# to cross-label at the threshold (~5e-4) — labels are decoration,
# near-dups are planted, and pair outputs scale linearly.
import math
labels = [rng.randrange(N_LABELS) for _ in range(N_VECS)]
vecs = []
for i in range(N_VECS):
    if i % 33 == 32 and vecs:
        v = [x + rng.gauss(0, 0.05) for x in vecs[-1]]
    else:
        v = [rng.gauss(0, 1.0) for _ in range(DIM)]
    nrm = math.sqrt(sum(x * x for x in v)) or 1.0
    vecs.append([x / nrm for x in v])
emb = pa.table({
    "vec_id": pa.array(range(N_VECS), pa.int64()),
    "embedding": pa.array(vecs, pa.list_(pa.float32())),
    "label": pa.array(labels, pa.int32()),
})
pq.write_table(emb, f"{out}/embeddings.parquet", row_group_size=100_000)

# events: 30 days from 2024-01-01, ns timestamps
T0 = 1704067200_000_000_000  # 2024-01-01T00:00:00Z in ns
SPAN = 30 * 24 * 3600 * 1_000_000_000
etypes = ["click", "view", "purchase", "signup", "error"]
ts = [T0 + int(rng.random() * SPAN) for _ in range(N_EVENTS)]
events = pa.table({
    "event_id": pa.array(range(N_EVENTS), pa.int64()),
    "ts": pa.array(ts, pa.timestamp("ns")),
    "user_id": pa.array([rng.randrange(N_USERS) for _ in range(N_EVENTS)], pa.int64()),
    "event_type": pa.array([rng.choice(etypes) for _ in range(N_EVENTS)], pa.string()),
    # measured on sf0.1: exponential, mean ~50 (p50 34.8 = 50*ln2, p99 228)
    "value": pa.array([round(rng.expovariate(1 / 50.0), 2) for _ in range(N_EVENTS)], pa.float64()),
    "props": pa.array([json.dumps({"k": rng.randrange(100)}) for _ in range(N_EVENTS)], pa.string()),
})
pq.write_table(events, f"{out}/events.parquet", row_group_size=1_000_000)

# --- TPC-H-ish relational tables (round 7: the join/window families
# had no measured scale story). Same schema and measured shape as the
# driver's sf0.1: all column distributions are uniform/independent
# (corr(l_extendedprice, l_quantity) = 0.001 on sf0.1; shipdate
# uncorrelated with orderdate), names/enums copied from the sf0.1
# value sets, timestamps ms-unit like the driver's parquet.
N_CUST = int(15000 * scale)
N_SUPP = int(1000 * scale)
N_PART = int(20000 * scale)
N_ORDERS = int(150000 * scale)
N_LINE = int(600000 * scale)
DAY_MS = 24 * 3600 * 1000
T95 = 788918400000  # 1995-01-01 in ms

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
pq.write_table(pa.table({
    "r_regionkey": pa.array(range(5), pa.int32()),
    "r_name": pa.array(REGIONS, pa.string()),
}), f"{out}/region.parquet")
pq.write_table(pa.table({
    "n_nationkey": pa.array(range(25), pa.int32()),
    "n_name": pa.array([f"NATION_{i}" for i in range(25)], pa.string()),
    "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
}), f"{out}/nation.parquet")

SEGS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
pq.write_table(pa.table({
    "c_custkey": pa.array(range(N_CUST), pa.int64()),
    "c_name": pa.array([f"Customer#{i:09d}" for i in range(N_CUST)], pa.string()),
    "c_nationkey": pa.array([rng.randrange(25) for _ in range(N_CUST)], pa.int32()),
    "c_acctbal": pa.array([round(rng.uniform(-1000, 10000), 2) for _ in range(N_CUST)], pa.float64()),
    "c_mktsegment": pa.array([rng.choice(SEGS) for _ in range(N_CUST)], pa.string()),
}), f"{out}/customer.parquet")
pq.write_table(pa.table({
    "s_suppkey": pa.array(range(N_SUPP), pa.int64()),
    "s_name": pa.array([f"Supplier#{i:09d}" for i in range(N_SUPP)], pa.string()),
    "s_nationkey": pa.array([rng.randrange(25) for _ in range(N_SUPP)], pa.int32()),
    "s_acctbal": pa.array([round(rng.uniform(-1000, 10000), 2) for _ in range(N_SUPP)], pa.float64()),
}), f"{out}/supplier.parquet")

ADJS = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUNS = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
pq.write_table(pa.table({
    "p_partkey": pa.array(range(N_PART), pa.int64()),
    "p_name": pa.array([f"{rng.choice(ADJS)} {rng.choice(NOUNS)}" for _ in range(N_PART)], pa.string()),
    "p_brand": pa.array([f"Brand#{rng.randrange(25)}" for _ in range(N_PART)], pa.string()),
    "p_type": pa.array([rng.choice(PTYPES) for _ in range(N_PART)], pa.string()),
    "p_size": pa.array([rng.randrange(1, 51) for _ in range(N_PART)], pa.int32()),
    "p_retailprice": pa.array([round(rng.uniform(900, 1000), 2) for _ in range(N_PART)], pa.float64()),
}), f"{out}/part.parquet")

PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
pq.write_table(pa.table({
    "o_orderkey": pa.array(range(N_ORDERS), pa.int64()),
    "o_custkey": pa.array([rng.randrange(N_CUST) for _ in range(N_ORDERS)], pa.int64()),
    "o_orderstatus": pa.array([rng.choice("FOP") for _ in range(N_ORDERS)], pa.string()),
    "o_totalprice": pa.array([round(rng.uniform(1000, 500000), 2) for _ in range(N_ORDERS)], pa.float64()),
    # uniform over 1995-01-01..2001-08-01 (2404 days), midnight-only
    "o_orderdate": pa.array([T95 + rng.randrange(2405) * DAY_MS for _ in range(N_ORDERS)], pa.timestamp("ms")),
    "o_orderpriority": pa.array([rng.choice(PRIOS) for _ in range(N_ORDERS)], pa.string()),
}), f"{out}/orders.parquet")

pq.write_table(pa.table({
    "l_orderkey": pa.array([rng.randrange(N_ORDERS) for _ in range(N_LINE)], pa.int64()),
    "l_partkey": pa.array([rng.randrange(N_PART) for _ in range(N_LINE)], pa.int64()),
    "l_suppkey": pa.array([rng.randrange(N_SUPP) for _ in range(N_LINE)], pa.int64()),
    "l_linenumber": pa.array([rng.randrange(1, 8) for _ in range(N_LINE)], pa.int32()),
    "l_quantity": pa.array([float(rng.randrange(1, 51)) for _ in range(N_LINE)], pa.float64()),
    "l_extendedprice": pa.array([round(rng.uniform(900, 105000), 2) for _ in range(N_LINE)], pa.float64()),
    "l_discount": pa.array([rng.randrange(11) / 100.0 for _ in range(N_LINE)], pa.float64()),
    "l_tax": pa.array([rng.randrange(9) / 100.0 for _ in range(N_LINE)], pa.float64()),
    "l_returnflag": pa.array([rng.choice("ANR") for _ in range(N_LINE)], pa.string()),
    "l_linestatus": pa.array([rng.choice("FO") for _ in range(N_LINE)], pa.string()),
    # 1995-01-02..2001-11-04, uncorrelated with o_orderdate (as measured)
    "l_shipdate": pa.array([T95 + DAY_MS + rng.randrange(2499) * DAY_MS for _ in range(N_LINE)], pa.timestamp("ms")),
}), f"{out}/lineitem.parquet")

print(json.dumps({"outdir": out, "docs": N_DOCS, "vecs": N_VECS, "events": N_EVENTS,
                  "orders": N_ORDERS, "lineitem": N_LINE}))
