"""Scale-factor multiplier for the driver's synthetic testdata: builds
an sf(0.1 * N) directory from /root/testdata/sf0.1 by cloning every
fact/entity table N times with CONSISTENT key offsets (foreign keys
reference the same copy's dimension rows, so join selectivities and
group cardinalities scale linearly, exactly as TPC-H scaling does).

Copies are decorrelated where replication would fake pathological
duplication that the source distribution doesn't have:

* ``documents.text`` — words are shuffled with a per-(copy, doc)
  seeded RNG, so shingle/minhash/simhash near-dup rates per copy match
  the original instead of every doc acquiring N-1 exact twins (which
  would grow pair outputs O(N^2) and poison scaling-slope readings);
* ``embeddings.embedding`` — circular-shifted by the copy index, so
  cross-copy cosine is ~random instead of 1.0.

``region`` / ``nation`` stay fixed (constant across SF in TPC-H);
``nationkey`` references therefore keep their values in all copies.
Timestamps are left unchanged: time-window densities scale with volume
(same window, N x the rows), which is the realistic 100 TB shape.

Usage: python tools/make_sf.py [N] [out_dir]
  (default N=10, out_dir=<repo>/testdata_sf1)
"""

from __future__ import annotations

import os
import random
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# per-table integer key columns and the key-domain each belongs to;
# every column in one domain gets the same offset so FK joins land on
# the same copy's rows
KEYS = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part",
                 "l_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
FIXED = ("region", "nation")


def _domain_offsets() -> dict:
    offs = {}
    for t, cols in KEYS.items():
        tb = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
        for col, dom in cols.items():
            mx = pc.max(tb[col]).as_py() or 0
            offs[dom] = max(offs.get(dom, 0), int(mx) + 1)
    return offs


def _shuffle_words(text: "str | None", seed: int) -> "str | None":
    if text is None:
        return None
    words = text.split()
    random.Random(seed).shuffle(words)
    return " ".join(words)


def build(n_copies: int, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    offs = _domain_offsets()
    for t in FIXED:
        tb = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
        pq.write_table(tb, os.path.join(out_dir, f"{t}.parquet"))
        print(f"{t}: fixed {tb.num_rows}")
    for t, cols in KEYS.items():
        src = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
        copies = []
        for k in range(n_copies):
            tb = src
            for col, dom in cols.items():
                idx = tb.schema.get_field_index(col)
                shifted = pc.add(tb[col], pa.scalar(k * offs[dom],
                                                    type=tb.schema[idx].type))
                tb = tb.set_column(idx, tb.schema.field(idx), shifted)
            if t == "documents" and k > 0:
                ids = tb["doc_id"].to_pylist()
                txt = tb["text"].to_pylist()
                new = [_shuffle_words(x, hash((k, i)) & 0x7FFFFFFF)
                       for i, x in zip(ids, txt)]
                nchars = [None if x is None else len(x) for x in new]
                ti = tb.schema.get_field_index("text")
                tb = tb.set_column(ti, tb.schema.field(ti),
                                   pa.array(new, type=pa.string()))
                ci = tb.schema.get_field_index("n_chars")
                tb = tb.set_column(ci, tb.schema.field(ci),
                                   pa.array(nchars, type=pa.int64()))
            if t == "embeddings" and k > 0:
                vecs = tb["embedding"].to_pylist()
                new = [None if v is None else v[k % len(v):] + v[:k % len(v)]
                       for v in vecs]
                ei = tb.schema.get_field_index("embedding")
                tb = tb.set_column(ei, tb.schema.field(ei),
                                   pa.array(new, type=tb.schema[ei].type))
            copies.append(tb)
        out = pa.concat_tables(copies)
        pq.write_table(out, os.path.join(out_dir, f"{t}.parquet"))
        print(f"{t}: {src.num_rows} x {n_copies} = {out.num_rows}")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        repo, "testdata_sf1"
    )
    build(n, out)
