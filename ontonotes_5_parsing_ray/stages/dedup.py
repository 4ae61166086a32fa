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

from ..functions.hashing import (
    MinHasher,
    char_shingles,
    hamming64,
    jaccard,
    simhash64,
    stable_hash64,
    word_shingles,
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
    threshold), candidates generated only inside LSH bands.

    The verify step needs the two texts; candidate groups are small
    (band-bucket collisions), so texts travel with the band rows — at 100 TB
    swap the payload for a second hash-join against the doc store keyed by
    doc_id (documented partitioning assumption).
    """

    hasher = MinHasher(num_perm)

    def band_rows(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_band, out_id, out_text = [], [], []
        for doc_id, text in zip(doc_ids, texts):
            sig = hasher.signature(word_shingles(text.split(), shingle_k))
            for key in hasher.band_keys(sig, bands):
                out_band.append(key)
                out_id.append(doc_id)
                out_text.append(text)
        return pa.table({
            "band_key": pa.array(out_band, pa.string()),
            "doc_id": pa.array(out_id, pa.int64()),
            "text": pa.array(out_text, pa.string()),
        })

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        rows = group.drop_duplicates("doc_id").sort_values("doc_id")
        ids = rows["doc_id"].tolist()
        texts = rows["text"].tolist()
        shingle_sets = [word_shingles(t.split(), shingle_k) for t in texts]
        a_out, b_out, j_out = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                jac = jaccard(shingle_sets[i], shingle_sets[j])
                if jac >= threshold:
                    a_out.append(ids[i])
                    b_out.append(ids[j])
                    j_out.append(round(jac, 6))
        return pd.DataFrame({"doc_a": a_out, "doc_b": b_out, "jaccard": j_out})

    pairs = (
        docs.select_columns(["doc_id", "text"])
        .map_batches(band_rows, batch_format="pyarrow")
        .groupby("band_key")
        .map_groups(verify, batch_format="pandas")
    )
    # same pair can surface from several bands -> exact dedup of pairs
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


def simhash_near_dup_pairs(
    docs: rd.Dataset, max_hamming: int = 8
) -> rd.Dataset:
    """SimHash near-dup: bucket by each of four 16-bit signature quarters
    (a pair within Hamming distance <= 16/4*? — standard block trick: any
    pair with <= 3 differing quarters collides in >= 1 quarter), verify
    Hamming distance inside buckets."""

    def sig_rows(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_bucket, out_id, out_sig = [], [], []
        for doc_id, text in zip(doc_ids, texts):
            sig = simhash64(text.split())
            for q in range(4):
                quarter = (sig >> (q * 16)) & 0xFFFF
                out_bucket.append(f"{q}:{quarter:04x}")
                out_id.append(doc_id)
                out_sig.append(sig & ((1 << 62) - 1))
        return pa.table({
            "bucket": pa.array(out_bucket, pa.string()),
            "doc_id": pa.array(out_id, pa.int64()),
            "sig": pa.array(out_sig, pa.int64()),
        })

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        rows = group.drop_duplicates("doc_id").sort_values("doc_id")
        ids = rows["doc_id"].tolist()
        sigs = rows["sig"].tolist()
        a_out, b_out, h_out = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                h = hamming64(sigs[i], sigs[j])
                if h <= max_hamming:
                    a_out.append(ids[i])
                    b_out.append(ids[j])
                    h_out.append(h)
        return pd.DataFrame({"doc_a": a_out, "doc_b": b_out, "hamming": h_out})

    pairs = (
        docs.select_columns(["doc_id", "text"])
        .map_batches(sig_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(verify, batch_format="pandas")
    )
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


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
