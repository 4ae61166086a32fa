"""Deduplication operators over a documents table.

Five dedup families (SURVEY.md 'Beyond the reference'):

* exact        — content-hash partition + per-group min-id keep
                 (``groupby(text).min(doc_id)``; the hash carries the
                 shuffle, never the full text comparison cross-block)
* MinHash+LSH  — shingle -> minhash -> band groupby -> candidate pairs ->
                 Jaccard verify (the same machinery as entity
                 canonicalization, ``stages/canonicalize.py``)
* SimHash      — 64-bit signature, near-dup = small Hamming distance within
                 a 16-bit band bucket
* n-gram Jaccard — exact pairwise verify *inside LSH blocks only* (never
                 all-pairs)
* embedding cosine — near-dup via normalized-vector LSH buckets
                 (random-hyperplane signs) + in-bucket cosine verify

Each returns a Dataset; at scale the only all-to-all is the band/bucket
groupby whose input was pre-shrunk per batch.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from functools import lru_cache

from ..functions.hashing import (
    MinHasher,
    char_shingles,
    hamming64,
    jaccard,
    simhash64,
    stable_hash64,
    word_shingles,
)


@lru_cache(maxsize=65536)
def _word_shingles_cached(text: str, k: int) -> frozenset:
    """Per-worker memo: a doc lands in every one of its LSH bands, so its
    shingle set would otherwise be recomputed bands-times during verify."""
    return frozenset(word_shingles(text.split(), k))

# Candidate-pair generation: per-bucket pair enumeration. ray.data's
# map_groups invokes the UDF once per group; with LSH buckets averaging ~2
# members that is tens of thousands of pandas constructions (~25s for 76k
# buckets at sf0.1). Below ``driver_limit`` band rows we therefore collect
# the (bucket, id) pairs to the driver and enumerate there (milliseconds);
# above it, the distributed groupby path runs — same output, tested equal.
CANDIDATE_DRIVER_LIMIT = 2_000_000


def _candidate_pairs(
    bucket_rows: rd.Dataset,
    bucket_col: str,
    id_col: str,
    driver_limit: int = CANDIDATE_DRIVER_LIMIT,
) -> rd.Dataset:
    """Dedup'd id pairs (a < b) sharing at least one bucket."""
    sample = bucket_rows.take(driver_limit)
    if len(sample) < driver_limit:
        by_bucket: dict = {}
        for r in sample:
            by_bucket.setdefault(r[bucket_col], []).append(r[id_col])
        pairs = set()
        for ids in by_bucket.values():
            ids = sorted(set(ids))
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    pairs.add((ids[i], ids[j]))
        ordered = sorted(pairs)
        return rd.from_arrow(pa.table({
            "doc_a": pa.array([a for a, _ in ordered], pa.int64()),
            "doc_b": pa.array([b for _, b in ordered], pa.int64()),
        }))

    def candidates(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(group[id_col]))
        a_out, b_out = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_out.append(ids[i])
                b_out.append(ids[j])
        return pd.DataFrame({"doc_a": a_out, "doc_b": b_out})

    return (
        bucket_rows.groupby(bucket_col)
        .map_groups(candidates, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .map_groups(lambda g: g.head(1), batch_format="pandas")
    )



def exact_dedup(docs: rd.Dataset) -> rd.Dataset:
    """Exact dedup: one row per distinct text, keeping the smallest doc_id
    plus the duplicate count. Hash-first so the shuffle key is a fixed-width
    int64 even for multi-KB texts."""

    def add_hash(batch: pa.Table) -> pa.Table:
        hashes = [stable_hash64(t) & ((1 << 62) - 1)
                  for t in batch.column("text").to_pylist()]
        return batch.append_column("text_hash", pa.array(hashes, pa.int64()))

    def keep_first(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values("doc_id")
        first = group.iloc[0]
        return pd.DataFrame([{
            "doc_id": int(first["doc_id"]),
            "text": first["text"],
            "n_dups": len(group),
        }])

    return (
        docs.select_columns(["doc_id", "text"])
        .map_batches(add_hash, batch_format="pyarrow")
        .groupby("text_hash")
        .map_groups(keep_first, batch_format="pandas")
    )


class MinHashBands:
    """Actor-pool stage: doc -> (band_key, doc_id, sig) rows over word
    shingles. The hasher's permutations are seed-fixed: identical on every
    worker."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 3):
        self.hasher = MinHasher(num_perm)
        self.bands = bands
        self.k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_band: List[str] = []
        out_id: List[int] = []
        for doc_id, text in zip(doc_ids, texts):
            sig = self.hasher.signature(word_shingles(text.split(), self.k))
            for key in self.hasher.band_keys(sig, self.bands):
                out_band.append(key)
                out_id.append(doc_id)
        return pa.table({
            "band_key": pa.array(out_band, pa.string()),
            "doc_id": pa.array(out_id, pa.int64()),
        })


def minhash_near_dup_pairs(
    docs: rd.Dataset,
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> rd.Dataset:
    """Near-duplicate pairs (doc_a < doc_b, exact word-shingle Jaccard >=
    threshold).

    Staging (each pair verified exactly once):
      1. band rows carry IDS ONLY (no text through the shuffle);
      2. ``groupby(band_key)`` emits candidate id pairs;
      3. ``groupby(a, b)`` dedups candidates BEFORE any verification
         (the same pair collides in many bands);
      4. verify per batch: a vectorized minhash-signature screen drops
         pairs whose estimated similarity is far below threshold, then
         exact Jaccard confirms — zero false positives.

    Texts/signatures for step 4 come from a broadcast of the doc table —
    the small-side path. At 100 TB, replace the broadcast with a
    hash-partitioned join of candidates against the doc store on doc_id
    (same semantics, one extra shuffle).
    """
    import ray

    hasher = MinHasher(num_perm)

    def band_rows(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_band, out_id = [], []
        for doc_id, text in zip(doc_ids, texts):
            sig = hasher.signature(word_shingles(text.split(), shingle_k))
            for key in hasher.band_keys(sig, bands):
                out_band.append(key)
                out_id.append(doc_id)
        return pa.table({
            "band_key": pa.array(out_band, pa.string()),
            "doc_id": pa.array(out_id, pa.int64()),
        })

    pairs = _candidate_pairs(
        docs.select_columns(["doc_id", "text"])
        .map_batches(band_rows, batch_format="pyarrow"),
        "band_key", "doc_id",
    )

    # Broadcast the doc payloads once (signatures + texts).
    doc_df = docs.select_columns(["doc_id", "text"]).to_pandas()
    sig_matrix = np.stack([
        hasher.signature(word_shingles(t.split(), shingle_k))
        for t in doc_df["text"]
    ])
    payload_ref = ray.put({
        "texts": dict(zip(doc_df["doc_id"], doc_df["text"])),
        "sig_index": dict(zip(doc_df["doc_id"], range(len(doc_df)))),
        "sigs": sig_matrix,
    })
    screen = max(0.0, threshold - 0.25)  # est-similarity slack before exact

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        payload = ray.get(payload_ref)
        texts, sig_index, sigs = (
            payload["texts"], payload["sig_index"], payload["sigs"],
        )
        if not len(batch):
            return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                                 "doc_b": pd.Series(dtype="int64"),
                                 "jaccard": pd.Series(dtype="float64")})
        ia = np.array([sig_index[d] for d in batch["doc_a"]])
        ib = np.array([sig_index[d] for d in batch["doc_b"]])
        est = (sigs[ia] == sigs[ib]).mean(axis=1)
        a_out, b_out, j_out = [], [], []
        for (a, b), e in zip(zip(batch["doc_a"], batch["doc_b"]), est):
            if e < screen:
                continue
            jac = jaccard(_word_shingles_cached(texts[a], shingle_k),
                          _word_shingles_cached(texts[b], shingle_k))
            if jac >= threshold:
                a_out.append(a)
                b_out.append(b)
                j_out.append(round(jac, 6))
        return pd.DataFrame({"doc_a": a_out, "doc_b": b_out, "jaccard": j_out})

    return pairs.map_batches(verify, batch_format="pandas")


def simhash_near_dup_pairs(
    docs: rd.Dataset, max_hamming: int = 8
) -> rd.Dataset:
    """SimHash near-dup: bucket by each of four 16-bit signature quarters
    (a pair within Hamming distance <= 16/4*? — standard block trick: any
    pair with <= 3 differing quarters collides in >= 1 quarter), verify
    Hamming distance inside buckets."""

    import ray

    def sig_rows(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_bucket, out_id = [], []
        for doc_id, text in zip(doc_ids, texts):
            sig = simhash64(text.split())
            for q in range(4):
                quarter = (sig >> (q * 16)) & 0xFFFF
                out_bucket.append(f"{q}:{quarter:04x}")
                out_id.append(doc_id)
        return pa.table({
            "bucket": pa.array(out_bucket, pa.string()),
            "doc_id": pa.array(out_id, pa.int64()),
        })

    pairs = _candidate_pairs(
        docs.select_columns(["doc_id", "text"])
        .map_batches(sig_rows, batch_format="pyarrow"),
        "bucket", "doc_id",
    )

    doc_df = docs.select_columns(["doc_id", "text"]).to_pandas()
    sig_ref = ray.put({
        int(d): simhash64(t.split()) for d, t in zip(doc_df["doc_id"], doc_df["text"])
    })

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        sigs = ray.get(sig_ref)
        a_out, b_out, h_out = [], [], []
        for a, b in zip(batch["doc_a"], batch["doc_b"]):
            h = hamming64(sigs[a], sigs[b])
            if h <= max_hamming:
                a_out.append(a)
                b_out.append(b)
                h_out.append(h)
        return pd.DataFrame({"doc_a": a_out, "doc_b": b_out, "hamming": h_out})

    return pairs.map_batches(verify, batch_format="pandas")


def embedding_near_dup_pairs(
    embeddings: rd.Dataset,
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 7,
) -> rd.Dataset:
    """Embedding-cosine near-dup: random-hyperplane sign buckets (seed-fixed
    planes broadcast by closure), exact cosine verify inside buckets."""
    rng = np.random.RandomState(seed)
    planes = None  # lazily sized from the first batch's dim

    def bucket_rows(batch: pa.Table) -> pa.Table:
        nonlocal planes
        vec_ids = batch.column("vec_id").to_pylist()
        vecs = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float32)
        if planes is None or planes.shape[1] != vecs.shape[1]:
            planes = np.random.RandomState(seed).randn(n_planes, vecs.shape[1]).astype(np.float32)
        signs = (vecs @ planes.T) >= 0
        keys = ["".join("1" if b else "0" for b in row) for row in signs]
        return pa.table({
            "bucket": pa.array(keys, pa.string()),
            "vec_id": pa.array(vec_ids, pa.int64()),
            "embedding": batch.column("embedding"),
        })

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        rows = group.drop_duplicates("vec_id").sort_values("vec_id")
        ids = rows["vec_id"].tolist()
        vecs = np.asarray(rows["embedding"].tolist(), dtype=np.float32)
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        unit = vecs / norms[:, None]
        cos = unit @ unit.T
        a_out, b_out, c_out = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if cos[i, j] >= threshold:
                    a_out.append(ids[i])
                    b_out.append(ids[j])
                    c_out.append(round(float(cos[i, j]), 6))
        return pd.DataFrame({"vec_a": a_out, "vec_b": b_out, "cosine": c_out})

    return (
        embeddings.select_columns(["vec_id", "embedding"])
        .map_batches(bucket_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(verify, batch_format="pandas")
    )
