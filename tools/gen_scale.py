#!/usr/bin/env python3
"""Derive a 10x "sf1" corpus from the driver's sf0.1 tables, for the
scale-proof runs recorded in NOTES (sf0.1 -> sf1 wall ratios of the
scale-sensitive operators). /root/testdata is read-only, so the derived
tables land under /root/repo/scale/sf1 (gitignored); the relational tables
are copied through unchanged (the scale targets only read documents /
embeddings).

Derivation is deterministic and preserves the corpus character the dedup
family depends on:
  - documents: 10 copies; copy 0 verbatim; copy k>0 offsets doc_id by
    k*10_000_000 and prepends a copy token to 70% of texts (distinct docs)
    while leaving 30% byte-identical (cross-copy exact duplicates, the
    duplicate-heavy-crawl shape).
  - embeddings: 10 copies; copy k>0 offsets vec_id and nudges the first
    component of 70% of vectors by k*1e-3 (near-dup but not identical);
    30% stay identical across copies.

Usage: python3 tools/gen_scale.py [src_sf_dir] [dst_dir] [factor]
"""
import shutil
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

SRC = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
DST = Path(sys.argv[2] if len(sys.argv) > 2 else "/root/repo/scale/sf1")
FACTOR = int(sys.argv[3]) if len(sys.argv) > 3 else 10
OFFSET = 10_000_000

DST.mkdir(parents=True, exist_ok=True)

# documents -------------------------------------------------------------
docs = pq.read_table(SRC / "documents.parquet")
doc_id = docs.column("doc_id").to_pylist()
text = docs.column("text").to_pylist()
lang = docs.column("lang").to_pylist()
source = docs.column("source").to_pylist()

ids, txts, langs, srcs, nchars = [], [], [], [], []
for k in range(FACTOR):
    for i in range(len(doc_id)):
        ids.append(doc_id[i] + k * OFFSET)
        t = text[i]
        if k > 0 and doc_id[i] % 10 < 7:
            t = f"variant{k} " + t
        txts.append(t)
        langs.append(lang[i])
        srcs.append(source[i])
        nchars.append(len(t))

pq.write_table(
    pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(txts, pa.string()),
         "lang": pa.array(langs, pa.string()), "source": pa.array(srcs, pa.string()),
         "n_chars": pa.array(nchars, pa.int64())}),
    DST / "documents.parquet")

# embeddings ------------------------------------------------------------
emb = pq.read_table(SRC / "embeddings.parquet")
vec_id = emb.column("vec_id").to_pylist()
vecs = emb.column("embedding").to_pylist()
label = emb.column("label").to_pylist()

eids, evecs, elabels = [], [], []
for k in range(FACTOR):
    for i in range(len(vec_id)):
        eids.append(vec_id[i] + k * OFFSET)
        v = vecs[i]
        if k > 0 and vec_id[i] % 10 < 7:
            v = [v[0] + k * 1e-3] + v[1:]
        evecs.append(v)
        elabels.append(label[i])

pq.write_table(
    pa.table(
        {"vec_id": pa.array(eids, pa.int64()),
         "embedding": pa.array(evecs, pa.list_(pa.float32())),
         "label": pa.array(elabels, pa.int32())}),
    DST / "embeddings.parquet")

# fact tables: 10 copies with offset keys; dimension FKs unchanged so the
# star joins stay valid (copy k's orders reference the original customers)
FACT_OFFSET = 1_000_000_000

orders = pq.read_table(SRC / "orders.parquet")
ocols = {c: orders.column(c).to_pylist() for c in orders.schema.names}
out = {c: [] for c in orders.schema.names}
for k in range(FACTOR):
    for c in orders.schema.names:
        if c == "o_orderkey":
            out[c].extend(v + k * FACT_OFFSET for v in ocols[c])
        else:
            out[c].extend(ocols[c])
pq.write_table(
    pa.table({c: pa.array(out[c], orders.schema.field(c).type)
              for c in orders.schema.names}),
    DST / "orders.parquet")

li = pq.read_table(SRC / "lineitem.parquet")
lcols = {c: li.column(c).to_pylist() for c in li.schema.names}
lout = {c: [] for c in li.schema.names}
for k in range(FACTOR):
    for c in li.schema.names:
        if c == "l_orderkey":
            lout[c].extend(v + k * FACT_OFFSET for v in lcols[c])
        else:
            lout[c].extend(lcols[c])
pq.write_table(
    pa.table({c: pa.array(lout[c], li.schema.field(c).type)
              for c in li.schema.names}),
    DST / "lineitem.parquet")

ev = pq.read_table(SRC / "events.parquet")
ecols = {c: ev.column(c).to_pylist() for c in ev.schema.names}
eout = {c: [] for c in ev.schema.names}
for k in range(FACTOR):
    for c in ev.schema.names:
        if c == "event_id":
            eout[c].extend(v + k * FACT_OFFSET for v in ecols[c])
        else:
            eout[c].extend(ecols[c])
pq.write_table(
    pa.table({c: pa.array(eout[c], ev.schema.field(c).type)
              for c in ev.schema.names}),
    DST / "events.parquet")

# dimensions pass through unchanged
for t in "region nation customer supplier part".split():
    shutil.copyfile(SRC / f"{t}.parquet", DST / f"{t}.parquet")

for t in ["documents", "embeddings"]:
    print(t, pq.ParquetFile(DST / f"{t}.parquet").metadata.num_rows, "rows")
print("wrote", DST)
