#!/usr/bin/env python3
"""Deterministic scale-up of the driver's testdata (dev tool, driver-side
python only — the engine never depends on this).

Usage: gen_scale.py <src_sf_dir> <out_dir> <factor>

Model: the TPC-H scaling convention — MORE entities, not bigger ones.
Each fact/dim table is replicated `factor` times into DISJOINT key
universes (every key column shifted by k * (max_key + 1) of its own
table), so every join stays within its universe and per-key densities
(orders per customer, events per user, lineitems per order) match the
source exactly. Dates and the event time window stay fixed, as the
driver's own sf0.01 -> sf0.1 step does (users scale 10x, the window
does not).

Two tables get more than key remapping, because byte-identical copies
would synthesize workload the source corpus does not have:
 - documents: copy 0 is the original corpus (keeping its planted
   near-dup pairs); copies k>0 shuffle each doc's word order with a
   seeded RNG — same vocabulary, same lengths, near-zero shingle
   overlap with the original, so the dedup pair density stays at the
   source's level instead of exploding 45x on fake exact-dup clusters.
 - embeddings: copies k>0 add seeded Gaussian noise (sigma=0.15 per
   component, renormalized to the source norm) and keep the label, so
   the cluster structure scales without minting 45x near-identical
   vector pairs.

region/nation are fixed dimensions and copy through unchanged.
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

src, out, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
rng = np.random.default_rng(4242)

import os
os.makedirs(out, exist_ok=True)


def offset(ids):
    return int(ids.max()) + 1


def write(name, table):
    pq.write_table(table, f"{out}/{name}.parquet")
    print(f"[gen-scale] {name}: {table.num_rows} rows")


def replicate(name, key_cols, carry_keys=()):
    """Replicate `factor`x, shifting each key column by k * (its own
    table's max+1). carry_keys: (col, src_table_key_col) pairs shifted
    by the REFERENCED table's stride so joins stay in-universe."""
    t = pq.read_table(f"{src}/{name}.parquet")
    d = {c: t[c].to_numpy(zero_copy_only=False) for c in t.column_names}
    strides = {c: offset(d[c]) for c in key_cols}
    for c, ref in carry_keys:
        ref_t = pq.read_table(f"{src}/{ref[0]}.parquet", columns=[ref[1]])
        strides[c] = offset(ref_t[ref[1]].to_numpy())
    cols = {c: [] for c in t.column_names}
    for k in range(factor):
        for c in t.column_names:
            v = d[c]
            if c in strides:
                v = v + k * strides[c]
            cols[c].append(v)
    arrays = {c: np.concatenate(vs) for c, vs in cols.items()}
    write(name, pa.table({c: pa.array(arrays[c], type=t.schema.field(c).type)
                          for c in t.column_names}))


# Fixed dims: straight copies.
for name in ("region", "nation"):
    write(name, pq.read_table(f"{src}/{name}.parquet"))

replicate("supplier", ["s_suppkey"])
replicate("customer", ["c_custkey"])
replicate("part", ["p_partkey"])
replicate("orders", ["o_orderkey"],
          carry_keys=[("o_custkey", ("customer", "c_custkey"))])
replicate("lineitem", [],
          carry_keys=[("l_orderkey", ("orders", "o_orderkey")),
                      ("l_partkey", ("part", "p_partkey")),
                      ("l_suppkey", ("supplier", "s_suppkey"))])

# events: preserve the writer's physical type (INT64 TIMESTAMP(NANOS) or
# timestamp[us] — the loader is schema-adaptive, the generator just
# passes the arrow schema through).
ev = pq.read_table(f"{src}/events.parquet")
evd = {c: ev[c].to_numpy(zero_copy_only=False) for c in ev.column_names}
ev_strides = {"event_id": offset(evd["event_id"]),
              "user_id": offset(evd["user_id"])}
ev_cols = {c: [] for c in ev.column_names}
for k in range(factor):
    for c in ev.column_names:
        v = evd[c]
        if c in ev_strides:
            v = v + k * ev_strides[c]
        ev_cols[c].append(v)
ev_out = {c: np.concatenate(vs) for c, vs in ev_cols.items()}
write("events", pa.table({c: pa.array(ev_out[c], type=ev.schema.field(c).type)
                          for c in ev.column_names}))

# documents: copy 0 verbatim; shuffled word order for k > 0.
docs = pq.read_table(f"{src}/documents.parquet")
dd = {c: docs[c].to_numpy(zero_copy_only=False) for c in docs.column_names}
doc_stride = offset(dd["doc_id"])
out_cols = {c: [] for c in docs.column_names}
for k in range(factor):
    for c in docs.column_names:
        if c == "doc_id":
            out_cols[c].append(dd[c] + k * doc_stride)
        elif c == "text" and k > 0:
            shuffled = []
            for i, txt in enumerate(dd["text"]):
                words = str(txt).split(" ")
                r = np.random.default_rng((k << 32) ^ i ^ 0x5EED)
                r.shuffle(words)
                shuffled.append(" ".join(words))
            out_cols[c].append(np.array(shuffled, dtype=object))
        else:
            out_cols[c].append(dd[c])
write("documents", pa.table(
    {c: pa.array(np.concatenate(out_cols[c]), type=docs.schema.field(c).type)
     for c in docs.column_names}))

# embeddings: noisy renormalized copies for k > 0, labels carried.
emb = pq.read_table(f"{src}/embeddings.parquet")
vec_ids = emb["vec_id"].to_numpy()
labels = emb["label"].to_numpy()
vecs = np.array(emb["embedding"].to_pylist(), dtype=np.float32)
norms = np.linalg.norm(vecs, axis=1, keepdims=True)
vec_stride = offset(vec_ids)
all_ids, all_vecs, all_labels = [], [], []
for k in range(factor):
    if k == 0:
        nv = vecs
    else:
        noise = rng.normal(0.0, 0.15, size=vecs.shape).astype(np.float32)
        nv = vecs + noise * norms
        nn = np.linalg.norm(nv, axis=1, keepdims=True)
        nn[nn == 0] = 1.0
        nv = (nv / nn * norms).astype(np.float32)
    all_ids.append(vec_ids + k * vec_stride)
    all_vecs.append(nv)
    all_labels.append(labels)
emb_table = pa.table({
    "vec_id": pa.array(np.concatenate(all_ids), type=emb.schema.field("vec_id").type),
    "embedding": pa.array([list(map(float, v)) for v in np.concatenate(all_vecs)],
                          type=emb.schema.field("embedding").type),
    "label": pa.array(np.concatenate(all_labels), type=emb.schema.field("label").type),
})
write("embeddings", emb_table)
print(f"[gen-scale] wrote {out} at {factor}x {src}")
