#!/usr/bin/env python3
"""Chunked large-scale generator for the three operator tables
(documents / embeddings / events) — the sf100 companion to gen_sf.py.

gen_sf.py builds whole tables as Python lists, which is fine to sf10
(500k docs / 10M events) but too slow and memory-hungry at sf100
(5M docs / 100M events). This generator writes the SAME schema and
statistical shape (same vocab, word-count range, 5% planted-dup rate
with whole-corpus bases, language/source mix, event-type mix,
exponential value, ns timestamps) with numpy-vectorized columns and
chunked ParquetWriter output (bounded row groups — keep files
splittable; a single monolithic row group made a 57 MB file
single-threaded to scan).

Determinism: numpy RNG seeded 42. Distributions match gen_sf.py's
SHAPE, not its exact byte stream — scale rows are perf evidence, and
the DuckDB oracle always re-derives from the same parquet, so
cross-engine comparisons stay exact.

Usage: gen_sf_big.py <scale-vs-sf0.1> <outdir> [tables]
  tables: comma list of documents,embeddings,events (default: all)
  e.g. gen_sf_big.py 1000 /tmp/graft_sf100 documents,events
"""
import os, sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

scale = float(sys.argv[1])
out = sys.argv[2]
tables = (sys.argv[3] if len(sys.argv) > 3 else "documents,embeddings,events").split(",")

N_DOCS = int(5000 * scale)
N_VECS = int(2000 * scale)
N_EVENTS = int(100000 * scale)
N_USERS = int(1500 * scale)
DUP_RATE = 0.05
VOCAB = ("batch part spark line column order small sort fast value scan a hash "
         "slow group agg filter query big key window row table stream merge "
         "data vector join customer the").split()
LANGS = ["en"] * 8 + (["de", "es", "fr", "zh"] * 3)
DIM, N_LABELS = 64, 10

rng = np.random.default_rng(42)
os.makedirs(out, exist_ok=True)

if "documents" in tables:
    CHUNK = 250_000
    vocab = np.array(VOCAB)
    texts = []  # full history kept: dup bases span the whole corpus
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                        ("lang", pa.string()), ("source", pa.string()),
                        ("n_chars", pa.int64())])
    w = pq.ParquetWriter(f"{out}/documents.parquet", schema)
    done = 0
    while done < N_DOCS:
        n = min(CHUNK, N_DOCS - done)
        lens = rng.integers(10, 101, n)
        words = vocab[rng.integers(0, len(vocab), int(lens.sum()))]
        offs = np.concatenate(([0], np.cumsum(lens)))
        dup = (rng.random(n) < DUP_RATE) & (np.arange(done, done + n) > 10)
        bases = (rng.random(n) * np.arange(done, done + n)).astype(np.int64)
        # append to the FULL history inside the loop: a dup's base may
        # point at an earlier doc of this same chunk
        for i in range(n):
            if dup[i]:
                texts.append(texts[bases[i]] + " dup")
            else:
                texts.append(" ".join(words[offs[i]:offs[i + 1]]))
        chunk_texts = texts[done:done + n]
        langs = np.array(LANGS)[rng.integers(0, len(LANGS), n)]
        srcs = np.char.add("src", rng.integers(0, 20, n).astype(str))
        w.write_table(pa.table({
            "doc_id": pa.array(range(done, done + n), pa.int64()),
            "text": pa.array(chunk_texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(srcs, pa.string()),
            "n_chars": pa.array([len(t) for t in chunk_texts], pa.int64()),
        }), row_group_size=50_000)
        done += n
        print(f"documents: {done}/{N_DOCS}", file=sys.stderr)
    w.close()

if "embeddings" in tables:
    CHUNK = 500_000
    # DRIVER-FAITHFUL shape (fixed round 17, mirroring gen_sf.py):
    # unit-normalized near-uniform vectors + ~3% planted near-dups.
    # The original center + N(0, 0.3) clusters made every same-label
    # pair cosine ~0.8 — a quadratic (~2e11-pair) output at the 0.4
    # threshold that killed dedup_semantic's sf100 run on DISK, and
    # misrepresented the driver corpus the operators are graded on.
    schema = pa.schema([("vec_id", pa.int64()),
                        ("embedding", pa.list_(pa.float32())),
                        ("label", pa.int32())])
    w = pq.ParquetWriter(f"{out}/embeddings.parquet", schema)
    done = 0
    while done < N_VECS:
        n = min(CHUNK, N_VECS - done)
        labels = rng.integers(0, N_LABELS, n)
        vecs = rng.normal(0, 1.0, (n, DIM)).astype(np.float32)
        dup = np.arange(32, n, 33)
        vecs[dup] = vecs[dup - 1] + rng.normal(0, 0.05, (len(dup), DIM)).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        flat = pa.array(vecs.reshape(-1), pa.float32())
        lists = pa.ListArray.from_arrays(
            pa.array(np.arange(n + 1, dtype=np.int32) * DIM), flat)
        w.write_table(pa.table({
            "vec_id": pa.array(range(done, done + n), pa.int64()),
            "embedding": lists,
            "label": pa.array(labels, pa.int32()),
        }), row_group_size=100_000)
        done += n
        print(f"embeddings: {done}/{N_VECS}", file=sys.stderr)
    w.close()

if "events" in tables:
    CHUNK = 5_000_000
    T0 = 1704067200_000_000_000  # 2024-01-01T00:00:00Z ns
    SPAN = 30 * 24 * 3600 * 1_000_000_000
    etypes = np.array(["click", "view", "purchase", "signup", "error"])
    schema = pa.schema([("event_id", pa.int64()), ("ts", pa.timestamp("ns")),
                        ("user_id", pa.int64()), ("event_type", pa.string()),
                        ("value", pa.float64()), ("props", pa.string())])
    w = pq.ParquetWriter(f"{out}/events.parquet", schema)
    done = 0
    while done < N_EVENTS:
        n = min(CHUNK, N_EVENTS - done)
        ts = T0 + (rng.random(n) * SPAN).astype(np.int64)
        vals = np.round(rng.exponential(50.0, n), 2)
        props = np.char.add(np.char.add('{"k": ', rng.integers(0, 100, n).astype(str)), "}")
        w.write_table(pa.table({
            "event_id": pa.array(range(done, done + n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("ns")),
            "user_id": pa.array(rng.integers(0, N_USERS, n), pa.int64()),
            "event_type": pa.array(etypes[rng.integers(0, 5, n)], pa.string()),
            "value": pa.array(vals, pa.float64()),
            "props": pa.array(props, pa.string()),
        }), row_group_size=1_000_000)
        done += n
        print(f"events: {done}/{N_EVENTS}", file=sys.stderr)
    w.close()

print("done:", out)
