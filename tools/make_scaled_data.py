"""Build a LOCAL scaled-up copy of an sf dir for performance measurement.

The driver's round-end bench may run at a larger, driver-generated scale
factor (BENCH_r07.json recorded sf=1.0) that is not present under
/root/testdata.  This tool fabricates a same-shape stand-in by stacking
``factor`` shifted copies of the sf0.1 tables, so optimization work can be
measured at the scale the driver actually times.  Measurement-only: the
content is NOT the driver's sf1.0 (different ids/texts), but row counts,
group cardinalities, duplicate structure and join fan-outs match its shape:

- ids shift per copy by a multiple of 30 (documents) / the id range (rest),
  preserving the ``doc_id % 3`` / ``% 10`` batch splits the gates use;
- document text is re-tokenized per copy (every word prefixed with a copy
  tag) so near-dup pairs exist only WITHIN a copy — total pair count scales
  linearly like a real bigger corpus, not quadratically like naive cloning;
- embeddings get deterministic per-copy sign flips, decorrelating copies so
  cosine/ANN candidate structure also scales linearly.

Usage: python tools/make_scaled_data.py [factor] [src_dir] [dst_dir]
Defaults: factor=10, src=/root/testdata/sf0.1, dst=/tmp/sfscaled_<factor>x.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64, copy=True)
    x += np.uint64(0x9E3779B97F4A7C15)
    z = x
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _shift(col: pa.ChunkedArray, k: int, step: int) -> pa.Array:
    return pc.add(col, pa.scalar(k * step, pa.int64())).combine_chunks()


def build(factor: int, src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)

    def write(name: str, copies: list[pa.Table]) -> None:
        out = pa.concat_tables(copies)
        pq.write_table(out, os.path.join(dst, f"{name}.parquet"))
        print(f"  {name}: {out.num_rows} rows")

    # small dims: copy verbatim
    for name in ("nation", "region", "supplier"):
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        pq.write_table(t, os.path.join(dst, f"{name}.parquet"))

    # documents: per-copy token prefix decorrelates gram space across copies
    docs = pq.read_table(os.path.join(src, "documents.parquet"))
    doc_step = ((pc.max(docs["doc_id"]).as_py() // 30) + 1) * 30
    copies = []
    for k in range(factor):
        t = docs
        if k:
            # attached single-char word prefix: re-tokenizes every word
            # without inserting new tokens, so gram statistics (counts,
            # doc frequencies, per-doc distinct counts) keep the original
            # corpus shape while copies stay decorrelated
            text = pc.replace_substring(t["text"], " ", f" {k:x}")
            t = t.set_column(t.schema.get_field_index("text"), "text", text)
            t = t.set_column(
                t.schema.get_field_index("n_chars"), "n_chars",
                pc.cast(pc.utf8_length(t["text"]), pa.int64()),
            )
        t = t.set_column(0, "doc_id", _shift(t["doc_id"], k, doc_step))
        copies.append(t)
    write("documents", copies)

    # events
    ev = pq.read_table(os.path.join(src, "events.parquet"))
    eid_step = pc.max(ev["event_id"]).as_py() + 1
    uid_step = pc.max(ev["user_id"]).as_py() + 1
    copies = []
    for k in range(factor):
        t = ev
        t = t.set_column(0, "event_id", _shift(t["event_id"], k, eid_step))
        t = t.set_column(
            t.schema.get_field_index("user_id"), "user_id",
            _shift(t["user_id"], k, uid_step),
        )
        copies.append(t)
    write("events", copies)

    # lineitem / orders / customer / part with consistent foreign keys
    li = pq.read_table(os.path.join(src, "lineitem.parquet"))
    od = pq.read_table(os.path.join(src, "orders.parquet"))
    cu = pq.read_table(os.path.join(src, "customer.parquet"))
    pt = pq.read_table(os.path.join(src, "part.parquet"))
    ok_step = pc.max(od["o_orderkey"]).as_py() + 1
    ck_step = pc.max(cu["c_custkey"]).as_py() + 1
    pk_step = pc.max(pt["p_partkey"]).as_py() + 1
    copies_li, copies_od, copies_cu, copies_pt = [], [], [], []
    for k in range(factor):
        t = li
        t = t.set_column(0, "l_orderkey", _shift(t["l_orderkey"], k, ok_step))
        t = t.set_column(1, "l_partkey", _shift(t["l_partkey"], k, pk_step))
        copies_li.append(t)
        t = od
        t = t.set_column(0, "o_orderkey", _shift(t["o_orderkey"], k, ok_step))
        t = t.set_column(1, "o_custkey", _shift(t["o_custkey"], k, ck_step))
        copies_od.append(t)
        t = cu
        t = t.set_column(0, "c_custkey", _shift(t["c_custkey"], k, ck_step))
        copies_cu.append(t)
        t = pt
        t = t.set_column(0, "p_partkey", _shift(t["p_partkey"], k, pk_step))
        copies_pt.append(t)
    write("lineitem", copies_li)
    write("orders", copies_od)
    write("customer", copies_cu)
    write("part", copies_pt)

    # embeddings: deterministic per-copy sign flips (copy 0 untouched so the
    # ANN_QUERY_IDS vectors are the originals)
    emb = pq.read_table(os.path.join(src, "embeddings.parquet"))
    vid_step = pc.max(emb["vec_id"]).as_py() + 1
    flat = emb["embedding"].combine_chunks()
    offsets = flat.offsets.to_numpy()
    values = flat.values.to_numpy(zero_copy_only=False).astype(np.float32)
    n = len(emb)
    dim = int(offsets[1] - offsets[0])
    copies = []
    for k in range(factor):
        t = emb
        t = t.set_column(0, "vec_id", _shift(t["vec_id"], k, vid_step))
        if k:
            idx = np.arange(n * dim, dtype=np.int64) + k * 1_000_003
            signs = np.where(_splitmix64(idx) & np.uint64(1), -1.0, 1.0).astype(
                np.float32
            )
            vals = values * signs
            arr = pa.ListArray.from_arrays(
                pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int32), pa.int32()),
                pa.array(vals, pa.float32()),
            )
            t = t.set_column(
                t.schema.get_field_index("embedding"), "embedding",
                arr.cast(t.schema.field("embedding").type),
            )
        copies.append(t)
    write("embeddings", copies)

    # bench warm pass expects a sibling sf0.001 dir relative to sf_dir's
    # parent; the timing harness reads the real testdata instead, so no
    # warm-dir is fabricated here.
    with open(os.path.join(dst, "_DONE"), "w") as f:
        f.write("ok\n")


if __name__ == "__main__":
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = (
        sys.argv[3]
        if len(sys.argv) > 3
        else f"/tmp/sfscaled_{factor}x"
    )
    build(factor, src, dst)
    print(f"wrote {dst}")
