#!/usr/bin/env python
"""Generate a Zipf-token document corpus — the df-SKEWED fixture the
synthetic /root/testdata corpus cannot provide.

Why it exists (VERDICT r5 "Next round" #1 option b): the driver-generated
documents tables draw ~54-token texts from a ~30-word vocabulary, so at
sf1 EVERY 3-shingle is hot (median df 65, p99 107) and the exact
inverted-index Jaccard join's sum(df^2) fan-out has no cold tail to
prune — PPJoin's prefix filter was measured there at only a 2.7x cut and
any df cap between "no recall" and "no cut" is empty (SCALING.md). Real
web corpora are Zipf: token frequency ~ rank^-1.07 (Zipf 1949), and
vocabulary grows with corpus size ~ N^0.5 (Heaps' law) — so boilerplate
shingles are a HOT TAIL while near-duplicate support is rare shingles,
the shape prefix filtering and df caps are designed for. This script
renders that shape deterministically.

Corpus recipe (all draws from one seeded PCG64 stream, no wall clock):
- vocabulary V = ceil(40 * sqrt(total_tokens))   (Heaps beta = 0.5)
- token draw: P(rank r) ~ r^-1.07 via inverse-CDF searchsorted
- doc length: uniform 30..78 tokens (mean ~54, like the driver corpus)
- near-duplicates: after a 100-doc warmup, each doc is with p=0.08 a copy
  of a uniformly-chosen earlier doc with 1..5 token substitutions —
  3-shingle Jaccard of a pair lands roughly in 0.45..0.95, so the 0.5
  threshold sees true positives AND near-misses.

Schema matches documents.parquet (doc_id, text, lang, source, n_chars).

Usage: python scripts/make_zipf.py [out_root]
Writes {out_root}/zipf0.1/documents.parquet (5 000 docs),
{out_root}/zipf1/documents.parquet (50 000 docs) and
{out_root}/zipf10/documents.parquet (500 000 docs — the decade where the
plain index join's fan-out becomes intractable); default out_root is
localdata/.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ZIPF_S = 1.07
HEAPS_K = 40
DUP_RATE = 0.08
LEN_LO, LEN_HI = 30, 78
SEED = 20260815


def make_corpus(n_docs: int, seed: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    total_tokens = n_docs * (LEN_LO + LEN_HI) // 2
    vocab = int(np.ceil(HEAPS_K * np.sqrt(total_tokens)))
    weights = np.arange(1, vocab + 1, dtype=np.float64) ** -ZIPF_S
    cum = np.cumsum(weights / weights.sum())

    def draw(k: int) -> np.ndarray:
        # clip: float rounding of the normalized cumsum can leave
        # cum[-1] < 1.0, and a draw above it would index one past the
        # declared vocabulary (no-op on the committed fixtures — their
        # max token id is verified < vocab — but guards regeneration)
        idx = np.searchsorted(cum, rng.random(k))
        return np.minimum(idx, vocab - 1).astype(np.int64)

    docs: list[np.ndarray] = []
    for i in range(n_docs):
        if i >= 100 and rng.random() < DUP_RATE:
            base = int(rng.integers(0, i))
            toks = docs[base].copy()
            n_edit = int(rng.integers(1, 6))
            pos = rng.integers(0, len(toks), n_edit)
            toks[pos] = draw(n_edit)
        else:
            toks = draw(int(rng.integers(LEN_LO, LEN_HI + 1)))
        docs.append(toks)

    texts = [" ".join(f"w{t}" for t in d) for d in docs]
    return pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n_docs, pa.string()),
            "source": pa.array([f"src{i % 5}" for i in range(n_docs)], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "localdata"
    )
    for name, n_docs in (("zipf0.1", 5_000), ("zipf1", 50_000), ("zipf10", 500_000)):
        out = os.path.join(root, name)
        os.makedirs(out, exist_ok=True)
        path = os.path.join(out, "documents.parquet")
        # seed varies by scale so zipf1 is not a superset of zipf0.1 —
        # each scale is an independent draw of the same distribution
        pq.write_table(make_corpus(n_docs, SEED + n_docs), path)
        print(name, "->", path, n_docs, "docs")


if __name__ == "__main__":
    main()
