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

from ..functions.rounding import round_half_away
from ..functions.hashing import (
    MinHasher,
    char_shingles,
    hamming64,
    hash64_vec,
    jaccard,
    partition_vec,
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
# buckets at sf0.1). Below ``driver_limit`` band rows we therefore stream
# the (bucket, id) columns to the driver and enumerate there (milliseconds);
# above it, the distributed groupby path runs — same output, tested equal.
CANDIDATE_DRIVER_LIMIT = 2_000_000


def _candidate_pairs(
    bucket_rows: rd.Dataset,
    bucket_col: str,
    id_col: str,
    driver_limit: int = CANDIDATE_DRIVER_LIMIT,
) -> rd.Dataset:
    """Dedup'd id pairs (a < b) sharing at least one bucket.

    The input is materialized once (it is ids+bucket keys only — never doc
    payloads) and reused by whichever branch runs; the driver branch moves
    Arrow columns, not row dicts."""
    bucket_rows = bucket_rows.materialize()
    if bucket_rows.count() <= driver_limit:
        df = bucket_rows.to_pandas()
        by_bucket: dict = {}
        for bucket, doc in zip(df[bucket_col].to_numpy(), df[id_col].to_numpy()):
            by_bucket.setdefault(bucket, []).append(doc)
        pairs = set()
        for ids in by_bucket.values():
            ids = sorted(set(ids))
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    pairs.add((int(ids[i]), int(ids[j])))
        ordered = sorted(pairs)
        return rd.from_arrow(pa.table({
            "doc_a": pa.array([a for a, _ in ordered], pa.int64()),
            "doc_b": pa.array([b for _, b in ordered], pa.int64()),
        }))

    P = 64  # bounded groups: buckets hash into P partitions, pairs are
    #         enumerated bucket-by-bucket INSIDE each partition (one pandas
    #         frame per partition, never one UDF call per bucket)

    def add_part(batch: pa.Table) -> pa.Table:
        parts = partition_vec(
            batch.column(bucket_col).to_numpy(zero_copy_only=False), P)
        return batch.append_column("part", pa.array(parts, pa.int32()))

    def candidates_partition(group: pd.DataFrame) -> pa.Table:
        a_out, b_out = [], []
        for _bucket, g in group.groupby(bucket_col, sort=False):
            ids = sorted(set(g[id_col]))
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    a_out.append(ids[i])
                    b_out.append(ids[j])
        return pa.table({"doc_a": pa.array(a_out, pa.int64()),
                         "doc_b": pa.array(b_out, pa.int64())})

    from ray.data.aggregate import Count

    # duplicate band hits collapse via a native aggregate (one row per pair,
    # no per-pair pandas UDF), then the count column is projected away.
    return (
        bucket_rows.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(candidates_partition, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="n_bands"))
        .map_batches(lambda t: t.select(["doc_a", "doc_b"]),
                     batch_format="pyarrow")
    )


# Candidate-count switchover for the verify stage: at or below this many
# distinct candidate docs, their payload (signatures, texts) is computed
# distributed, shipped to the driver ONCE and broadcast into the verify
# map (no extra shuffle). Above it, nothing candidate-shaped ever touches
# the driver: payloads are attached to the pairs with two hash-partitioned
# joins (pairs ⋈ payload on doc_a, then on doc_b) and verification runs
# inside the join partitions.
PAYLOAD_BROADCAST_LIMIT = 200_000


def _distinct_candidate_ids(pairs: rd.Dataset) -> rd.Dataset:
    """Distinct doc ids appearing in any candidate pair, as a Dataset
    (map-side per-batch unique, then one small groupby combine)."""
    from ray.data.aggregate import Count

    def distinct_ids(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy(zero_copy_only=False)
        b = batch.column("doc_b").to_numpy(zero_copy_only=False)
        uniq = np.unique(np.concatenate([a, b])) if len(a) else np.array([], np.int64)
        return pa.table({"doc_id": pa.array(uniq.astype(np.int64), pa.int64())})

    per_batch = pairs.map_batches(distinct_ids, batch_format="pyarrow")
    return per_batch.groupby("doc_id").aggregate(
        Count(alias_name="n")
    ).map_batches(lambda t: t.select(["doc_id"]), batch_format="pyarrow")


def _ids_set(cand_ids: rd.Dataset) -> set:
    """Driver id set from a (small, already-counted) id Dataset; tolerates
    the empty-Dataset schema loss through to_pandas."""
    df = cand_ids.to_pandas()
    return set(df["doc_id"].tolist()) if "doc_id" in df.columns else set()


def _route_candidates(pairs: rd.Dataset, limit: int):
    """Pick the verify route from the (materialized) candidate pairs.

    Returns ``("broadcast", id_set)`` or ``("join", cand_ids_dataset)``.
    When the pair count alone bounds the candidate set under ``limit``, the
    ids are derived driver-side from the pairs columns directly — no
    distributed distinct round-trip for the common small case. Only a large
    pair set pays for the distributed distinct, and only a large CANDIDATE
    set takes the join route."""
    n_pairs = pairs.count()
    if 2 * n_pairs <= limit:
        df = pairs.to_pandas()
        ids = (set(df["doc_a"].tolist()) | set(df["doc_b"].tolist())
               if len(df) and "doc_a" in df.columns else set())
        return "broadcast", ids
    cand = _distinct_candidate_ids(pairs).materialize()
    if cand.count() <= limit:
        return "broadcast", _ids_set(cand)
    return "join", cand


def _broadcast_candidate_payload(
    docs: rd.Dataset, cand_ids: set, payload_fn, columns
) -> pd.DataFrame:
    """Small-candidate-set fast path: broadcast the id set as a filter over
    the docs stream, run ``payload_fn`` DISTRIBUTED over the survivors, and
    ship only its per-candidate output to the driver."""
    import ray

    ids_ref = ray.put(cand_ids)

    def fil(batch: pd.DataFrame) -> pa.Table:
        keep = batch[batch["doc_id"].isin(ray.get(ids_ref))]
        return payload_fn(keep)

    return docs.select_columns(columns).map_batches(
        fil, batch_format="pandas"
    ).to_pandas()


def _joined_pair_payload(
    docs: rd.Dataset,
    pairs: rd.Dataset,
    cand_ids: rd.Dataset,
    payload_fn,
    columns,
    payload_cols,
) -> rd.Dataset:
    """Too-big-to-broadcast verify path: attach each pair's two payloads via
    hash-partitioned joins — the driver never holds candidates.

    1. docs ⋈ cand_ids on doc_id (inner) prunes the corpus stream to
       candidate docs; ``payload_fn`` runs distributed over them.
    2. pairs ⋈ payload on doc_a, then on doc_b (columns suffixed _a/_b).

    Three bounded exchanges total; every stage streams."""
    from .relational import hash_join

    cand_docs = hash_join(docs.select_columns(columns), cand_ids,
                          on=["doc_id"])
    payload = cand_docs.map_batches(
        lambda b: payload_fn(b), batch_format="pandas"
    ).materialize()  # O(candidates); reused by both joins

    side_a = payload.map_batches(
        lambda t: t.rename_columns(
            ["doc_a"] + [f"{c}_a" for c in payload_cols]),
        batch_format="pyarrow",
    )
    side_b = payload.map_batches(
        lambda t: t.rename_columns(
            ["doc_b"] + [f"{c}_b" for c in payload_cols]),
        batch_format="pyarrow",
    )
    joined = hash_join(pairs, side_a, on=["doc_a"])
    return hash_join(joined, side_b, on=["doc_b"])



def exact_dedup(docs: rd.Dataset) -> rd.Dataset:
    """Exact dedup: one row per distinct text, keeping the smallest doc_id
    plus the duplicate count.

    Map-side combine first (per-batch dedup shrinks the shuffle input to
    distinct-texts-per-batch), then ONE native ``groupby.aggregate`` —
    no per-group pandas UDF (a mostly-unique 100 TB corpus has billions of
    distinct texts; one UDF call each was the round-1 scale bug). The group
    key is ``(text_hash, text)``: the fixed-width hash leads the sort so key
    comparisons are int-first, while the text in the key splits 62-bit hash
    collisions correctly instead of silently merging distinct documents."""
    from ray.data.aggregate import Min as RMin, Sum as RSum

    def partial_dedup(batch: pd.DataFrame) -> pa.Table:
        g = batch.groupby("text", sort=False).agg(
            doc_id=("doc_id", "min"), n=("doc_id", "size")
        ).reset_index()
        # vectorized content hash (C-speed siphash); internal group key
        # only — projected away before the result leaves the operator
        g["text_hash"] = (hash64_vec(g["text"])
                          & np.uint64((1 << 62) - 1)).astype("int64")
        return pa.Table.from_pandas(
            g[["text_hash", "text", "doc_id", "n"]], preserve_index=False
        )

    parts = docs.select_columns(["doc_id", "text"]).map_batches(
        partial_dedup, batch_format="pandas"
    ).materialize()  # pin before the shuffle (sort samples re-execute lazy upstreams)
    return (
        parts.groupby(["text_hash", "text"])
        .aggregate(RMin("doc_id", alias_name="doc_id"),
                   RSum("n", alias_name="n_dups"))
        .map_batches(lambda t: t.select(["doc_id", "text", "n_dups"]),
                     batch_format="pyarrow")
    )


class MinHashBands:
    """Actor-pool stage: doc -> (band_key, doc_id, sig) rows over word
    shingles. The hasher's permutations are seed-fixed: identical on every
    worker."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 3):
        self.hasher = MinHasher(num_perm, base_hash="md5_32")
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
    payload_broadcast_limit: int = PAYLOAD_BROADCAST_LIMIT,
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

    Verify payloads (signature + text per CANDIDATE doc, never the corpus)
    are computed distributed and auto-routed by candidate count: a small set
    broadcasts to the verify map; a large one is attached to the pairs with
    hash-partitioned joins (pairs ⋈ payload on doc_a then doc_b) and
    verified inside join partitions — the driver never materializes
    candidate texts (both routes produce identical pair sets, tested equal).
    """
    import ray

    # md5_32 shingle base: the whole signature pipeline (shingle hash,
    # permutations, banding) is reproducible in DuckDB, which is what lets
    # the driver value-hash this operator (entity canonicalization keeps
    # blake2b — its clusters must stay stable across rounds)
    hasher = MinHasher(num_perm, base_hash="md5_32")

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
    ).materialize()

    screen = max(0.0, threshold - 0.25)  # est-similarity slack before exact

    # Candidate-only payload (signatures + texts), computed distributed.
    # Signatures travel as fixed-width BINARY (num_perm x 8 bytes): arrow's
    # hash join rejects list-typed payload columns, and bytes are the
    # compact wire format anyway.
    def payload_fn(keep: pd.DataFrame) -> pa.Table:
        sigs = [hasher.signature(word_shingles(t.split(), shingle_k)).tobytes()
                for t in keep["text"]]
        return pa.table({
            "doc_id": pa.array(keep["doc_id"].tolist(), pa.int64()),
            "text": pa.array(keep["text"].tolist(), pa.string()),
            "sig": pa.array(sigs, pa.binary()),
        })

    route, cand = _route_candidates(pairs, payload_broadcast_limit)
    if route == "join":
        joined = _joined_pair_payload(
            docs, pairs, cand, payload_fn,
            ["doc_id", "text"], ["text", "sig"],
        )

        def verify_joined(batch: pd.DataFrame) -> pd.DataFrame:
            if not len(batch):
                return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                                     "doc_b": pd.Series(dtype="int64"),
                                     "jaccard": pd.Series(dtype="float64")})
            sa = np.stack([np.frombuffer(s, np.uint64) for s in batch["sig_a"]])
            sb = np.stack([np.frombuffer(s, np.uint64) for s in batch["sig_b"]])
            est = (sa == sb).mean(axis=1)
            a_out, b_out, j_out = [], [], []
            for a, b, ta, tb, e in zip(batch["doc_a"], batch["doc_b"],
                                       batch["text_a"], batch["text_b"], est):
                if e < screen:
                    continue
                jac = jaccard(_word_shingles_cached(ta, shingle_k),
                              _word_shingles_cached(tb, shingle_k))
                if jac >= threshold:
                    a_out.append(a)
                    b_out.append(b)
                    j_out.append(float(round_half_away(jac, 6)))
            return pd.DataFrame({"doc_a": np.asarray(a_out, np.int64),
                                 "doc_b": np.asarray(b_out, np.int64),
                                 "jaccard": np.asarray(j_out, np.float64)})

        return joined.map_batches(verify_joined, batch_format="pandas")

    pdf = _broadcast_candidate_payload(
        docs, cand, payload_fn, ["doc_id", "text"],
    )
    sig_matrix = (np.stack([np.frombuffer(b, np.uint64) for b in pdf["sig"]])
                  if len(pdf) else np.empty((0, num_perm), dtype=np.uint64))
    payload_ref = ray.put({
        "texts": dict(zip(pdf["doc_id"], pdf["text"])),
        "sig_index": dict(zip(pdf["doc_id"], range(len(pdf)))),
        "sigs": sig_matrix,
    })

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
                j_out.append(float(round_half_away(jac, 6)))
        return pd.DataFrame({"doc_a": a_out, "doc_b": b_out, "jaccard": j_out})

    return pairs.map_batches(verify, batch_format="pandas")


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount for uint64 arrays (numpy<2 has no bitwise_count):
    view each word as 8 bytes, unpack to bits, sum."""
    if not len(x):
        return np.array([], dtype=np.int64)
    return np.unpackbits(
        np.ascontiguousarray(x, dtype=np.uint64).view(np.uint8).reshape(-1, 8),
        axis=1,
    ).sum(axis=1).astype(np.int64)


def simhash_near_dup_pairs(
    docs: rd.Dataset,
    max_hamming: int = 8,
    payload_broadcast_limit: int = PAYLOAD_BROADCAST_LIMIT,
) -> rd.Dataset:
    """SimHash near-dup: bucket by each of four 16-bit signature quarters
    (the standard block trick: any pair with <= 3 differing quarters
    collides in >= 1 quarter — exact for max_hamming <= 3, recall < 1 above
    that, which the SQL oracle mirrors), verify Hamming distance on the
    candidate pairs.

    Signature payloads auto-route like minhash: broadcast below
    ``payload_broadcast_limit`` candidates, hash-partitioned pairs ⋈
    signatures joins above it (identical pair sets, tested equal)."""

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
    ).materialize()

    # Candidate-only signature payload (16 bytes per candidate — the corpus
    # text never reaches the driver on either route).
    def payload_fn(keep: pd.DataFrame) -> pa.Table:
        return pa.table({
            "doc_id": pa.array(keep["doc_id"].tolist(), pa.int64()),
            "sig": pa.array([simhash64(t.split()) for t in keep["text"]],
                            pa.uint64()),
        })

    route, cand = _route_candidates(pairs, payload_broadcast_limit)
    if route == "join":
        joined = _joined_pair_payload(
            docs, pairs, cand, payload_fn, ["doc_id", "text"], ["sig"],
        )

        def verify_joined(batch: pd.DataFrame) -> pd.DataFrame:
            if not len(batch):
                return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                                     "doc_b": pd.Series(dtype="int64"),
                                     "hamming": pd.Series(dtype="int64")})
            sa = batch["sig_a"].to_numpy(dtype=np.uint64)
            sb = batch["sig_b"].to_numpy(dtype=np.uint64)
            h = _popcount64(np.bitwise_xor(sa, sb))
            keep = h <= max_hamming
            return pd.DataFrame({
                "doc_a": batch["doc_a"].to_numpy(dtype=np.int64)[keep],
                "doc_b": batch["doc_b"].to_numpy(dtype=np.int64)[keep],
                "hamming": h[keep],
            })

        return joined.map_batches(verify_joined, batch_format="pandas")

    pdf = _broadcast_candidate_payload(
        docs, cand, payload_fn, ["doc_id", "text"],
    )
    sig_ref = ray.put({int(d): int(s) for d, s in zip(pdf["doc_id"], pdf["sig"])})

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
    max_bucket: int = 8192,
) -> rd.Dataset:
    """Embedding-cosine near-dup: random-hyperplane sign buckets (seed-fixed
    planes broadcast by closure), exact cosine verify inside buckets.

    In-bucket verify is all-pairs, so a hot bucket is quadratic: buckets
    larger than ``max_bucket`` are recursively split with additional
    seed-fixed hyperplanes and verified within sub-buckets only — bounded
    work at a recall cost only for pairs split by the extra planes (small at
    near-dup thresholds, where vectors are nearly parallel)."""
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

    def _verify_rows(ids: np.ndarray, unit: np.ndarray, depth: int,
                     a_out: list, b_out: list, c_out: list) -> None:
        if len(ids) > max_bucket and depth < 6:
            split_planes = np.random.RandomState(
                seed + 101 * (depth + 1)
            ).randn(2, unit.shape[1]).astype(np.float32)
            signs = (unit @ split_planes.T) >= 0
            subkey = signs[:, 0].astype(np.int8) * 2 + signs[:, 1].astype(np.int8)
            for key in range(4):
                mask = subkey == key
                if mask.sum() > 1:
                    _verify_rows(ids[mask], unit[mask], depth + 1,
                                 a_out, b_out, c_out)
            return
        cos = unit @ unit.T
        iu, ju = np.triu_indices(len(ids), k=1)
        hits = cos[iu, ju] >= threshold
        for i, j, c in zip(iu[hits], ju[hits], cos[iu, ju][hits]):
            a_out.append(int(ids[i]))
            b_out.append(int(ids[j]))
            c_out.append(round(float(c), 6))

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        rows = group.drop_duplicates("vec_id").sort_values("vec_id")
        ids = rows["vec_id"].to_numpy(dtype=np.int64)
        vecs = np.asarray(rows["embedding"].tolist(), dtype=np.float32)
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        unit = vecs / norms[:, None]
        a_out, b_out, c_out = [], [], []
        _verify_rows(ids, unit, 0, a_out, b_out, c_out)
        order = sorted(range(len(a_out)), key=lambda i: (a_out[i], b_out[i]))
        return pd.DataFrame({"vec_a": [a_out[i] for i in order],
                             "vec_b": [b_out[i] for i in order],
                             "cosine": [c_out[i] for i in order]})

    return (
        embeddings.select_columns(["vec_id", "embedding"])
        .map_batches(bucket_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(verify, batch_format="pandas")
    )


def drop_near_dup_docs(
    docs: rd.Dataset,
    pairs: rd.Dataset,
    id_col: str = "doc_id",
    broadcast_limit: int = PAYLOAD_BROADCAST_LIMIT,
) -> rd.Dataset:
    """Near-dup COLLAPSE: drop every pair's larger id (``doc_b``; pairs are
    a < b, so the smaller id is the kept representative).

    Auto-routed like the verify stage: a small pair set broadcasts the drop
    ids as a semi-anti filter; above ``broadcast_limit`` pairs the drop set
    never touches the driver — a hash-partitioned LEFT join + null filter
    (distributed anti join) does the subtraction. Both routes keep exactly
    one row per surviving id (tested equal)."""
    import pyarrow.compute as pc

    from .relational import broadcast_semi_join, hash_join

    pairs = pairs.materialize()
    if pairs.count() <= broadcast_limit:
        dup_df = pairs.map_batches(
            lambda t: t.select(["doc_b"]), batch_format="pyarrow"
        ).to_pandas()
        dups = (set(dup_df["doc_b"].tolist())
                if "doc_b" in dup_df.columns else set())
        return broadcast_semi_join(docs, dups, id_col, anti=True)

    from ray.data.aggregate import Count

    dup_ids = pairs.map_batches(
        lambda t: t.select(["doc_b"]), batch_format="pyarrow"
    ).groupby("doc_b").aggregate(Count(alias_name="n")).map_batches(
        lambda t: t.select(["doc_b"]).rename_columns([id_col])
                   .append_column("_dup", pa.array([1] * len(t), pa.int8())),
        batch_format="pyarrow",
    )
    joined = hash_join(docs, dup_ids, on=[id_col], join_type="left_outer")
    return joined.map_batches(
        lambda t: t.filter(pc.is_null(t.column("_dup")))
                   .drop_columns(["_dup"]),
        batch_format="pyarrow",
    )
