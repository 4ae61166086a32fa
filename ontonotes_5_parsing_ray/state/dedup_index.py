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
* ``claim`` is atomic per shard: the first claimant of a hash wins;
  concurrent duplicate admissions are impossible because a hash's shard is
  unique. Which duplicate wins under concurrency is arrival order
  (nondeterministic); the SET of admitted texts is deterministic.
* 62-bit hashes keep shard memory at ~8 B/doc + text-hash set overhead;
  the full text is never shipped to the index.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.hashing import hash64_vec


@ray.remote
class DedupShard:
    """One shard of the shared dedup index: a mutable hash set with atomic
    first-claimant-wins semantics (actor method calls serialize per actor)."""

    def __init__(self) -> None:
        self._seen: set = set()

    def claim(self, hashes: List[int]) -> List[bool]:
        out = []
        seen = self._seen
        for h in hashes:
            if h in seen:
                out.append(False)
            else:
                seen.add(h)
                out.append(True)
        return out

    def size(self) -> int:
        return len(self._seen)


def create_index(num_shards: int = 8) -> List["ray.actor.ActorHandle"]:
    return [DedupShard.remote() for _ in range(num_shards)]


def index_size(shards) -> int:
    return sum(ray.get([s.size.remote() for s in shards]))


def streaming_exact_dedup(
    ds: rd.Dataset,
    shards,
    text_col: str = "text",
) -> rd.Dataset:
    """Filter ``ds`` to rows whose text is NEW to the shared index, admitting
    them as a side effect. Each batch makes one ``claim`` RPC per shard it
    touches; the mask is reassembled positionally."""
    num_shards = len(shards)

    def fil(batch: pd.DataFrame) -> pa.Table:
        if not len(batch):
            return pa.Table.from_pandas(batch, preserve_index=False)
        hashes = hash64_vec(batch[text_col]) & np.uint64((1 << 62) - 1)
        shard_of = (hashes % np.uint64(num_shards)).astype(np.int64)
        keep = np.zeros(len(batch), dtype=bool)
        futures: List[Tuple[np.ndarray, "ray.ObjectRef"]] = []
        for s in np.unique(shard_of):
            idx = np.nonzero(shard_of == s)[0]
            futures.append(
                (idx, shards[int(s)].claim.remote(
                    [int(h) for h in hashes[idx]])))
        for idx, fut in futures:
            keep[idx] = ray.get(fut)
        # in-batch duplicates: the shard sees the batch's hashes in order,
        # so only the first occurrence claims — no extra pass needed
        return pa.Table.from_pandas(batch[keep], preserve_index=False)

    return ds.map_batches(fil, batch_format="pandas")
