"""Streaming exact-dedup against a SHARED MUTABLE index (sharded actors).

This is the one operator family the Dataset API genuinely cannot express
(SURVEY.md 'drop to raw Ray actors only where the Dataset API can't'): an
INCREMENTAL dedup membership index that ingest streams consult and update
concurrently. Batch exact dedup (``stages/dedup.py:exact_dedup``) answers
"collapse this corpus"; this answers "is this document new, given everything
any worker has already admitted this run" — the shape a continuously-fed
training-data pipeline needs.

Design:
* The index is ``num_shards`` ``@ray.remote`` actors, each owning the hash
  range ``hash64(text) % num_shards == shard_id`` — a partitioned mutable
  dict, so no single actor serializes all traffic and shards scale with the
  cluster (place them across nodes at 100 TB).
* Ingest tasks batch their probes: ONE ``claim`` RPC per (batch, shard)
  carrying the batch's hashes for that shard — never a call per document.
* ``claim`` is atomic per shard AND idempotent per claim token: the first
  claimant of a hash wins and the shard records WHICH token won it, so a
  Ray task retry (worker death, object-store eviction, lineage
  reconstruction) that re-presents the same batch under the same token gets
  the same admit mask back instead of silently losing its documents. Which
  duplicate wins under concurrency is arrival order (nondeterministic); the
  SET of admitted texts is deterministic.
* The filtered result is MATERIALIZED before it is returned, so consuming
  the returned Dataset twice replays cached blocks instead of re-probing
  the index. A deliberate second ``streaming_exact_dedup`` call over the
  same corpus is a new pass (fresh token nonce) and admits nothing new.
* 62-bit hashes keep shard memory at ~16 B/doc (hash -> winning token);
  the full text is never shipped to the index.
"""

from __future__ import annotations

import hashlib
import uuid
from typing import List, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.hashing import hash64_vec


@ray.remote
class DedupShard:
    """One shard of the shared dedup index: a mutable hash->token map with
    atomic first-claimant-wins semantics (actor method calls serialize per
    actor). Re-claiming a hash under the token that originally won it
    returns True again — the idempotency that makes ingest retry-safe."""

    def __init__(self) -> None:
        self._owner: dict = {}

    def claim(self, hashes: List[int], token: int) -> List[bool]:
        out = []
        owner = self._owner
        for h in hashes:
            winner = owner.setdefault(h, token)
            out.append(winner == token)
        return out

    def size(self) -> int:
        return len(self._owner)


def create_index(num_shards: int = 8) -> List["ray.actor.ActorHandle"]:
    """A FRESH index per run: the claim-token idempotency scopes retries
    within one run; reusing shards across logically distinct runs is
    supported (later passes admit nothing already seen) but admissions
    always belong to the pass that first claimed them."""
    return [DedupShard.remote() for _ in range(num_shards)]


def index_size(shards) -> int:
    return sum(ray.get([s.size.remote() for s in shards]))


def _batch_token(pass_nonce: bytes, hashes: np.ndarray,
                 batch: pd.DataFrame, text_col: str) -> int:
    """Claim token for one batch: retry-stable (a Ray re-execution of the
    same block presents identical bytes) but DISTINCT for distinct batches
    even when their texts are byte-identical — the non-text columns (doc
    ids) are folded in, so two aligned blocks of a boilerplate-heavy corpus
    cannot replay each other's token and double-admit (r4 ADVICE)."""
    id_cols = [c for c in batch.columns if c != text_col]
    if not id_cols:
        raise ValueError(
            "streaming_exact_dedup needs at least one non-text column "
            "(a row id) so retry-idempotent claim tokens can tell "
            "byte-identical text batches apart — select doc_id + text, "
            "not text alone")
    extra = b""
    for c in id_cols:
        extra += hash64_vec(batch[c]).tobytes()
    return int.from_bytes(
        hashlib.blake2b(pass_nonce + extra + hashes.tobytes(),
                        digest_size=8).digest(), "little")


def streaming_exact_dedup(
    ds: rd.Dataset,
    shards,
    text_col: str = "text",
) -> rd.Dataset:
    """Filter ``ds`` to rows whose text is NEW to the shared index, admitting
    them as a side effect. Each batch makes one ``claim`` RPC per shard it
    touches (unique hashes only); the mask is reassembled positionally.

    Retry safety: the claim token is ``hash(pass nonce, batch id columns,
    batch hashes)`` — stable when Ray re-executes the same block within
    this call, unique across calls AND across same-text batches — so a
    retried task re-admits exactly its own documents and nothing else.
    The result is materialized before returning: consuming it twice replays
    cached blocks rather than re-probing the (already mutated) index."""
    num_shards = len(shards)
    pass_nonce = uuid.uuid4().bytes  # scopes idempotency to THIS call

    def fil(batch: pd.DataFrame) -> pa.Table:
        if not len(batch):
            return pa.Table.from_pandas(batch, preserve_index=False)
        hashes = hash64_vec(batch[text_col]) & np.uint64((1 << 62) - 1)
        # in-batch duplicates: only each hash's FIRST occurrence is a
        # candidate (unique hashes ship; replayed tokens can't double-admit)
        uniq, first_idx = np.unique(hashes, return_index=True)
        token = _batch_token(pass_nonce, hashes, batch, text_col)
        shard_of = (uniq % np.uint64(num_shards)).astype(np.int64)
        keep = np.zeros(len(batch), dtype=bool)
        futures: List[Tuple[np.ndarray, "ray.ObjectRef"]] = []
        for s in np.unique(shard_of):
            sel = np.nonzero(shard_of == s)[0]
            futures.append(
                (first_idx[sel], shards[int(s)].claim.remote(
                    [int(h) for h in uniq[sel]], token)))
        for idx, fut in futures:
            keep[idx] = ray.get(fut)
        return pa.Table.from_pandas(batch[keep], preserve_index=False)

    return ds.map_batches(fil, batch_format="pandas").materialize()
