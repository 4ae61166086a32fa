"""Per-partition checkpointing and lineage for resumable runs.

The reference has no checkpointing (rerun from scratch — SURVEY.md §4);
the north_rule requires it. Model:

* Output is laid out one directory per stage, one file-set per partition
  (hash-bucket of ``conv_id``), written atomically: write to
  ``<dir>/.tmp-<partition>`` then rename.
* A partition is complete iff ``<dir>/_DONE-<partition>`` exists; the marker
  carries a JSON lineage record (rows, stage, input partitions, engine
  version) — the per-partition lineage + metrics record.
* Resume = enumerate markers, skip finished partitions, re-run the rest
  (an anti-join of done markers vs the partition list).

Partition key: ``bucket = hash64_vec(conv_id) % num_buckets`` — the same
vectorized hash every shuffle-bucketing stage uses, so one partitioning
decision is reused across stages (SURVEY.md "pick ONE partitioning key").
The hash identity is recorded in the checkpoint ``_CONFIG``
(``partition_hash``): a checkpoint written under a different partitioner
must not resume (conversations would map to different buckets).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional

import numpy as np

from ..functions.hashing import hash64_vec

ENGINE_VERSION = "0.2.0"

# Identity of the partition hash; stored in materialized-checkpoint configs.
# Bump whenever partition_of/hash64_vec change value semantics.
PARTITION_HASH = "siphash13-v1"


def partition_of(conv_id: str, num_buckets: int) -> int:
    """Scalar twin of the vectorized partitioner (same values; per-call
    convenience for tests and driver-side bookkeeping)."""
    # int() BEFORE the modulo: numpy uint64 % python-int silently promotes
    # to float64 and loses low bits
    return int(hash64_vec(np.array([conv_id], dtype=object))[0]) % num_buckets


def done_marker(out_dir: str, partition: int) -> str:
    return os.path.join(out_dir, f"_DONE-{partition:05d}")


def is_partition_done(out_dir: str, partition: int) -> bool:
    return os.path.isfile(done_marker(out_dir, partition))


def pending_partitions(out_dir: str, num_buckets: int) -> List[int]:
    """Anti-join of done markers vs the full partition list."""
    return [p for p in range(num_buckets) if not is_partition_done(out_dir, p)]


def write_lineage(
    out_dir: str,
    partition: int,
    stage: str,
    rows: int,
    extra: Optional[Dict] = None,
) -> None:
    """Atomically record partition completion + lineage/metrics."""
    os.makedirs(out_dir, exist_ok=True)
    record = {
        "stage": stage,
        "partition": partition,
        "rows": rows,
        "engine_version": ENGINE_VERSION,
        "wall_ts": time.time(),  # metrics only; never used in data
    }
    if extra:
        record.update(extra)
    tmp = done_marker(out_dir, partition) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(record, fh)
    os.replace(tmp, done_marker(out_dir, partition))


def read_lineage(out_dir: str) -> List[Dict]:
    out = []
    if not os.path.isdir(out_dir):
        return out
    for name in sorted(os.listdir(out_dir)):
        if name.startswith("_DONE-") and not name.endswith(".tmp"):
            with open(os.path.join(out_dir, name)) as fh:
                out.append(json.load(fh))
    return out
