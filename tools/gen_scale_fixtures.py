#!/usr/bin/env python
"""Generate sf1-SCALE synthetic fixtures for the SCALING_r15 gauge.

The shipped driver fixtures stop at sf0.1 (documents 5k / embeddings
2k / events 100k rows — TESTDATA.md, read-only), where every bench
query is plan-latency-bound and an 8-core vs 32-core run measures
nothing (the r14 verdict's scaling block: all ratios ~1). This tool
synthesizes 10x-sized documents/embeddings/events tables with the
same schemas (pyarrow-verified against sf0.1, including the events
TIMESTAMP(NANOS, isAdjustedToUTC=false) quirk load_table handles) and
similar statistical shape (vocab-sampled texts of 10-100 words,
dim-64 float embeddings, 30-day event stream), purely so the
compute-heavy operator families have enough rows for parallel scaling
to be measurable. Deterministic (numpy seed 42). NOT oracle fixtures:
correctness stays pinned at the shipped SFs; this data exists only to
measure wall-clock vs cores.

Usage: python tools/gen_scale_fixtures.py /tmp/sfscale1 [scale]
(scale defaults to 10 = 10x the sf0.1 row counts)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "spark line column order small sort fast value scan hash slow "
    "group batch agg filter query big key window row part table "
    "stream merge data join vector customer the a le la el der und"
).split()
LANGS = ["en", "en", "zh", "es", "fr", "de"]


def gen_documents(out: str, n: int, rng: np.random.Generator) -> None:
    n_words = rng.integers(10, 101, size=n)
    texts = []
    vocab = np.array(VOCAB)
    for nw in n_words:
        texts.append(" ".join(vocab[rng.integers(0, len(vocab), nw)]))
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(
            [LANGS[i] for i in rng.integers(0, len(LANGS), n)],
            pa.string(),
        ),
        "source": pa.array(
            [f"src{i % 20}" for i in range(n)], pa.string()
        ),
        "n_chars": pa.array(
            [len(t) for t in texts], pa.int64()
        ),
    })
    pq.write_table(tbl, os.path.join(out, "documents.parquet"))


def gen_embeddings(out: str, n: int, rng: np.random.Generator) -> None:
    vecs = (rng.standard_normal((n, 64)) * 0.12).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(
            rng.integers(0, 10, n).astype(np.int32), pa.int32()
        ),
    })
    pq.write_table(tbl, os.path.join(out, "embeddings.parquet"))


def gen_events(out: str, n: int, rng: np.random.Generator) -> None:
    base = np.datetime64("2024-01-01T00:00:00", "ns")
    span = np.timedelta64(30 * 24 * 3600 * 10**9, "ns")
    ts = base + (rng.random(n) * span.astype(np.int64)).astype(
        "timedelta64[ns]"
    )
    ts.sort()
    types = np.array(["view", "click", "purchase", "signup", "error"])
    ks = rng.integers(0, 100, n)
    tbl = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        # naive nanos — the same TIMESTAMP(NANOS, isAdjustedToUTC
        # =false) physical type the driver fixture carries
        "ts": pa.array(ts, pa.timestamp("ns")),
        "user_id": pa.array(
            rng.integers(0, 15000, n), pa.int64()
        ),
        "event_type": pa.array(
            types[rng.integers(0, len(types), n)], pa.string()
        ),
        "value": pa.array(
            np.round(rng.random(n) * 200, 2), pa.float64()
        ),
        "props": pa.array(
            [f'{{"k": {k}}}' for k in ks], pa.string()
        ),
    })
    pq.write_table(tbl, os.path.join(out, "events.parquet"))


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfscale1"
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    gen_documents(out, 5_000 * scale, rng)
    gen_embeddings(out, 2_000 * scale, rng)
    gen_events(out, 100_000 * scale, rng)
    # the TPC-H-ish star tables are not part of the scaling gauge;
    # symlink the sf0.1 originals so star-schema-reading queries
    # still resolve if one sneaks into the list
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        dst = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(f"/root/testdata/sf0.1/{t}.parquet", dst)
    print(f"wrote {out} at scale {scale}")


if __name__ == "__main__":
    main()
