#!/usr/bin/env python
"""Derive an ADVERSARIALLY SKEWED copy of the testdata corpus
(round 8): same schema, same row counts, but with the heavy-tail key
distributions that break naive plans at cluster scale.

Why: every correctness artifact so far (driver, full sweep, sf1 scale
sweep) runs on the generator's roughly-uniform key distributions. Real
100 TB corpora are Zipfian — one bot user emits half the event stream,
one boilerplate page is 30% of a crawl, one order is a bulk
reseller — and skew is where plans break: a shuffle partition that
holds half the table, a dedup cluster with 10^5 members, an LSH bucket
whose pair expansion is quadratic. The skewed corpus re-runs the WHOLE
oracle sweep (tools/full_sweep.py, DuckDB reads the same files, so
parity stays exact) plus timing ratios vs the uniform corpus
(tools/skew_audit.py).

Skew applied (deterministic, id-hash based — no RNG):
- documents: 30% of rows carry the text of the first document
  (n_chars kept consistent) — a giant exact/near-dup cluster.
- events:    50% of rows belong to ONE user — a hot grouping/session
  key and a hot stateful-dedup key.
- lineitem:  15% of rows move to ONE existing orderkey — a hot join
  and aggregation key against orders.
- embeddings: 30% of rows carry ONE identical vector — a degenerate
  centroid cell and a maximally hot LSH bucket.
- region/nation/customer/supplier/part/orders: copied unchanged.

Usage: python tools/skew_testdata.py [src_sf_dir] [out_dir]
       (defaults /root/testdata/sf0.01 -> /root/repo/.skew/sf0.01)
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _replace_column(table: pa.Table, name: str, values) -> pa.Table:
    idx = table.schema.get_field_index(name)
    field = table.schema.field(idx)
    arr = pa.array(values, type=field.type)
    return table.set_column(idx, field, arr)


def skew_documents(t: pa.Table) -> pa.Table:
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    hot = texts[0]
    new_texts = [hot if (i % 10) < 3 else x for i, x in zip(ids, texts)]
    t = _replace_column(t, "text", new_texts)
    return _replace_column(t, "n_chars", [len(x) for x in new_texts])


def skew_events(t: pa.Table) -> pa.Table:
    eids = t.column("event_id").to_pylist()
    users = t.column("user_id").to_pylist()
    hot = users[0]
    return _replace_column(
        t, "user_id", [hot if (e % 2) == 0 else u for e, u in zip(eids, users)]
    )


def skew_lineitem(t: pa.Table) -> pa.Table:
    keys = t.column("l_orderkey").to_pylist()
    hot = keys[0]
    return _replace_column(
        t,
        "l_orderkey",
        [hot if (i % 100) < 15 else k for i, k in enumerate(keys)],
    )


def skew_embeddings(t: pa.Table) -> pa.Table:
    ids = t.column("vec_id").to_pylist()
    vecs = t.column("embedding").to_pylist()
    hot = vecs[0]
    return _replace_column(
        t, "embedding", [hot if (i % 10) < 3 else v for i, v in zip(ids, vecs)]
    )


SKEWERS = {
    "documents": skew_documents,
    "events": skew_events,
    "lineitem": skew_lineitem,
    "embeddings": skew_embeddings,
}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.skew/sf0.01"
    os.makedirs(out, exist_ok=True)
    for name in TABLES:
        src_path = os.path.join(src, f"{name}.parquet")
        dst_path = os.path.join(out, f"{name}.parquet")
        if name not in SKEWERS:
            shutil.copyfile(src_path, dst_path)
            print(f"{name}: copied unchanged")
            continue
        t = pq.read_table(src_path)
        skewed = SKEWERS[name](t)
        assert skewed.schema.equals(t.schema), name
        assert skewed.num_rows == t.num_rows, name
        pq.write_table(skewed, dst_path)
        print(f"{name}: skewed ({t.num_rows} rows)")
    print(f"skewed corpus at {out}")


if __name__ == "__main__":
    main()
