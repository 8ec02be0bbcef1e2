#!/usr/bin/env python
"""Deterministic hash-expansion of the sf0.1 corpus tables to larger
scale factors for the heavy-tier scaling sweep (VERDICT r5 task #3).

SCALING_r05 certified ~linear growth over the 100x range sf0.001 →
sf0.1, but the dedup/ANN/graph/BPE families' top-step ratios still
carry fixed-cost dilution. The driver testdata stops at sf0.1, so
this script derives sf0.3 / sf1 versions of the three corpus tables
(documents, embeddings, events) INSIDE the repo (never touching
/root/testdata) with the growth mode a real corpus has:

* documents — replica docs are fresh word sequences RESAMPLED from
  the sf0.1 corpus's empirical word distribution (same vocabulary,
  Zipf shape, and doc-length distribution; duplicate-GROUP sizes stay
  constant while the number of groups grows — rotating/copying text
  would instead grow every dup group by the multiplier and fake a
  quadratic pair blowup no real crawl has).
* embeddings — replica vectors perturb originals at relative
  magnitude 1.0 (cos ≈ 0.707 to the source): IVF/k-means cluster
  structure densifies realistically, and the bulk of replicas sits
  below the 0.8+ near-dup thresholds (a <2% noise tail above 0.8
  adds at most (m-1)*tail partners per original — still LINEAR pair
  growth, the growth mode of a real corpus).
* events — replicas are NEW users (user_id stride-shifted) over the
  same time range: per-user history stays constant, the user universe
  grows — the growth mode of a real product.

All randomness is numpy PCG seeded from (table, replica, sf) — the
same invocation always produces byte-identical parquet, so the
scaling artifact is reproducible without committing ~50 MB of data.
The seven small TPC-H tables are symlinked from sf0.1 (heavy-tier
queries never touch them; symlinks keep load_table working).

Usage:
    python tools/expand_testdata.py [--out-root .scaling] [--sfs 0.3,1]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def _seed(table: str, k: int) -> int:
    """Stable cross-process seed (Python's str hash is salted)."""
    import hashlib

    return int.from_bytes(
        hashlib.sha256(f"{table}:{k}".encode()).digest()[:8], "big"
    )
ID_STRIDE = 10_000_000  # far above any sf0.1 id
SMALL_TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]


def _multiplier(sf: float) -> int:
    m = round(sf / 0.1)
    if m < 1 or abs(m * 0.1 - sf) > 1e-9:
        raise SystemExit(f"sf {sf} must be an integer multiple of 0.1")
    return m


def expand_documents(out_dir: str, m: int) -> None:
    pdf = pq.read_table(os.path.join(SRC, "documents.parquet")).to_pandas()
    word_lists = pdf["text"].str.split(" ")
    lengths = word_lists.str.len().to_numpy()
    flat = np.concatenate(word_lists.to_numpy())
    vocab, counts = np.unique(flat, return_counts=True)
    probs = counts / counts.sum()
    reps = [pdf]
    for k in range(1, m):
        rng = np.random.default_rng(_seed("documents", k))
        # one vectorized draw for the whole replica, re-split by the
        # original length distribution (lengths reshuffled per replica)
        rep_lengths = rng.permutation(lengths)
        words = rng.choice(vocab, size=int(rep_lengths.sum()), p=probs)
        bounds = np.cumsum(rep_lengths)[:-1]
        texts = [" ".join(w) for w in np.split(words, bounds)]
        rep = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy() + k * ID_STRIDE,
                "text": texts,
                "lang": pdf["lang"].to_numpy(),
                "source": pdf["source"].to_numpy(),
            }
        )
        rep["n_chars"] = rep["text"].str.len().astype("int64")
        reps.append(rep)
    out = pd.concat(reps, ignore_index=True)
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(out, schema=schema, preserve_index=False),
        os.path.join(out_dir, "documents.parquet"),
    )


def expand_embeddings(out_dir: str, m: int) -> None:
    pdf = pq.read_table(os.path.join(SRC, "embeddings.parquet")).to_pandas()
    mat = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    reps = [pdf]
    for k in range(1, m):
        rng = np.random.default_rng(_seed("embeddings", k))
        noise = rng.standard_normal(mat.shape)
        noise /= np.linalg.norm(noise, axis=1, keepdims=True)
        pert = (mat + norms * noise).astype(np.float32)
        rep = pd.DataFrame(
            {
                "vec_id": pdf["vec_id"].to_numpy() + k * ID_STRIDE,
                "embedding": list(pert),
                "label": pdf["label"].to_numpy(),
            }
        )
        reps.append(rep)
    out = pd.concat(reps, ignore_index=True)
    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(out, schema=schema, preserve_index=False),
        os.path.join(out_dir, "embeddings.parquet"),
    )


def expand_events(out_dir: str, m: int) -> None:
    table = pq.read_table(os.path.join(SRC, "events.parquet"))
    pdf = table.to_pandas()
    reps = [pdf]
    for k in range(1, m):
        rep = pdf.copy()
        rep["event_id"] = rep["event_id"] + k * ID_STRIDE
        rep["user_id"] = rep["user_id"] + k * ID_STRIDE
        reps.append(rep)
    out = pd.concat(reps, ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(out, schema=table.schema, preserve_index=False),
        os.path.join(out_dir, "events.parquet"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-root", default=".scaling")
    ap.add_argument("--sfs", default="0.3,1")
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = os.path.join(repo, args.out_root)
    for sf_str in args.sfs.split(","):
        sf = float(sf_str)
        m = _multiplier(sf)
        out_dir = os.path.join(root, f"sf{sf_str}")
        os.makedirs(out_dir, exist_ok=True)
        expand_documents(out_dir, m)
        expand_embeddings(out_dir, m)
        expand_events(out_dir, m)
        for t in SMALL_TABLES:
            link = os.path.join(out_dir, f"{t}.parquet")
            if not os.path.exists(link):
                os.symlink(os.path.join(SRC, f"{t}.parquet"), link)
        sizes = {
            t: pq.ParquetFile(os.path.join(out_dir, f"{t}.parquet")).metadata.num_rows
            for t in ("documents", "embeddings", "events")
        }
        print(f"sf{sf_str}: {sizes} -> {out_dir}", file=sys.stderr)


if __name__ == "__main__":
    main()
