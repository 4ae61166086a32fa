"""Distributed cross-conversation canonicalization (MinHash/LSH + components).

The distributed twin of ``functions/canon.cluster_surfaces`` — same
semantics, shuffle-aware execution (SURVEY.md §7.1 step 6):

1. distinct normalized surfaces, pre-aggregated inside ``map_batches``
   before the ``groupby`` (map-side combine: the shuffle moves unique
   surfaces, not mentions);
2. MinHash signatures + LSH band keys per surface (``map_batches``,
   fixed-seed permutations so every worker agrees);
3. ``groupby(band_key).map_groups`` -> verified candidate pairs
   (exact Jaccard inside blocks only);
4. connected components by iterative min-label propagation
   (``groupby(norm).aggregate(Min)`` per round, driver loop until the label
   sum is stable — labels encode (len, lex) order so the converged label IS
   the oracle's shortest-then-lexicographic representative,
   ``reduce_entities.py:110-115``);
5. the resulting ``norm -> canon`` map is applied back either by broadcast
   (``ray.put`` once, dict lookup per batch — the small-side fast path) or
   by a hash-partitioned groupby join when the map is too big to broadcast.

Label-propagation correctness: each round every node takes the min label in
its closed neighborhood; at fixpoint labels equal per-component minima ==
union-find components, independent of block arrival order (determinism
requirement, SURVEY.md §4).
"""

from __future__ import annotations

from typing import Dict

import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Min

from ..functions.canon import (
    DEFAULT_BANDS,
    DEFAULT_NUM_PERM,
    DEFAULT_THRESHOLD,
    SHINGLE_K,
    verify_pair,
)
from ..functions.hashing import MinHasher, char_shingles, stable_hash64

# Broadcast-vs-shuffle switchover for applying the canon map. Tuned for a
# 128 GiB-heap driver: ~50M short strings; beyond that, use the groupby join.
BROADCAST_LIMIT = 5_000_000


def _label_key(norm: str) -> str:
    """Order-encoding so min(label) == min by (len, lex): zero-padded length
    prefix, then the string itself."""
    return f"{len(norm):06d}\x00{norm}"


def _label_to_norm(label: str) -> str:
    return label.split("\x00", 1)[1]


class BandKeys:
    """Actor-pool stage: surface -> LSH band-key rows (signature computed
    once per surface; hasher built once per actor)."""

    def __init__(self, num_perm: int = DEFAULT_NUM_PERM, bands: int = DEFAULT_BANDS):
        self.hasher = MinHasher(num_perm)
        self.bands = bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        norms = batch.column("norm").to_pylist()
        out_norm, out_band = [], []
        for norm in norms:
            sig = self.hasher.signature(char_shingles(norm, SHINGLE_K))
            for key in self.hasher.band_keys(sig, self.bands):
                out_norm.append(norm)
                out_band.append(key)
        return pa.table({
            "band_key": pa.array(out_band, pa.string()),
            "norm": pa.array(out_norm, pa.string()),
        })


def _block_pairs(group: pd.DataFrame, threshold: float) -> pd.DataFrame:
    uniq = sorted(set(group["norm"]))
    a_out, b_out = [], []
    for i in range(len(uniq)):
        for j in range(i + 1, len(uniq)):
            if verify_pair(uniq[i], uniq[j], threshold):
                a_out.append(uniq[i])
                b_out.append(uniq[j])
    return pd.DataFrame({"a": a_out, "b": b_out})


def distinct_norms(surfaces: rd.Dataset) -> rd.Dataset:
    """Distinct ``norm`` values with a map-side combine: per-batch dedup in
    ``map_batches`` shrinks the shuffle input before the global groupby."""
    def per_batch_distinct(batch: pa.Table) -> pa.Table:
        norms = sorted(set(batch.column("norm").to_pylist()))
        return pa.table({"norm": pa.array(norms, pa.string())})

    deduped = surfaces.map_batches(per_batch_distinct, batch_format="pyarrow")
    return deduped.groupby("norm").aggregate(Min("norm", alias_name="norm_min")) \
                  .map_batches(
                      lambda t: pa.table({"norm": t.column("norm")}),
                      batch_format="pyarrow",
                  )


# Below this vocabulary size, clustering runs on the driver with the exact
# same kernel the oracle uses (functions.canon.cluster_surfaces) — the
# "small side -> driver object" pattern. Above it, the distributed
# band-groupby + min-label-propagation path takes over. Both produce
# identical cluster assignments (components + (len,lex)-min representative
# are order-free), verified by tests at the boundary.
DRIVER_CLUSTER_LIMIT = 100_000


def build_canon_map(
    surfaces: rd.Dataset,
    threshold: float = DEFAULT_THRESHOLD,
    max_rounds: int = 64,
    driver_limit: int = DRIVER_CLUSTER_LIMIT,
) -> rd.Dataset:
    """``Dataset[norm] -> Dataset[norm, canon]`` clustering (auto small/large path)."""

    def per_batch_distinct(batch: pa.Table) -> pa.Table:
        norms = sorted(set(batch.column("norm").to_pylist()))
        return pa.table({"norm": pa.array(norms, pa.string())})

    deduped = surfaces.map_batches(per_batch_distinct, batch_format="pyarrow")

    if driver_limit > 0:
        # Small-side fast path with NO shuffle: stream the per-batch distinct
        # rows to the driver with a cap; if the stream fits, the global set
        # union + clustering happen here with the exact oracle kernel.
        cap = driver_limit * 4
        sample = deduped.take(cap)
        if len(sample) < cap:
            norms = sorted({r["norm"] for r in sample})
            if len(norms) <= driver_limit:
                from ..functions.canon import cluster_surfaces

                mapping = cluster_surfaces(norms, threshold=threshold)
                items = sorted(mapping.items())
                return rd.from_arrow(pa.table({
                    "norm": pa.array([k for k, _ in items], pa.string()),
                    "canon": pa.array([v for _, v in items], pa.string()),
                }))

    # Distributed path: global distinct via groupby, then LSH + components.
    uniq = distinct_norms(surfaces).materialize()

    from .util import pool_size

    banded = uniq.map_batches(
        BandKeys, batch_format="pyarrow", concurrency=pool_size(2),
        batch_size=4096,
    )
    pairs = banded.groupby("band_key").map_groups(
        lambda g: _block_pairs(g, threshold), batch_format="pandas"
    )
    # duplicate band hits for the same pair are removed by an exact groupby
    pairs = pairs.groupby(["a", "b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    ).materialize()

    # Min-label propagation over the (tiny relative to input) surface graph.
    labels = uniq.map_batches(
        lambda t: pa.table({
            "norm": t.column("norm"),
            "label": pa.array(
                [_label_key(n) for n in t.column("norm").to_pylist()],
                pa.string(),
            ),
        }),
        batch_format="pyarrow",
    ).materialize()

    def edges_both(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_pylist()
        b = batch.column("b").to_pylist()
        return pa.table({
            "norm": pa.array(a + b, pa.string()),
            "nbr": pa.array(b + a, pa.string()),
        })

    edges = pairs.map_batches(edges_both, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return labels.map_batches(
            lambda t: pa.table({
                "norm": t.column("norm"),
                "canon": pa.array(
                    [_label_to_norm(l) for l in t.column("label").to_pylist()],
                    pa.string(),
                ),
            }),
            batch_format="pyarrow",
        )

    def propagate(labels_ds: rd.Dataset) -> rd.Dataset:
        # neighbor labels: join edges with labels on nbr via pandas merge
        # inside per-key groups would need a join; with the surface graph
        # being driver-tractable per key we use a broadcast of labels only
        # when small, else a groupby-based join.
        lbl_map = {r["norm"]: r["label"] for r in labels_ds.take_all()}
        lbl_ref = ray.put(lbl_map)

        def nbr_labels(batch: pa.Table) -> pa.Table:
            m = ray.get(lbl_ref)
            norms = batch.column("norm").to_pylist()
            nbrs = batch.column("nbr").to_pylist()
            return pa.table({
                "norm": pa.array(norms, pa.string()),
                "label": pa.array([m[n] for n in nbrs], pa.string()),
            })

        candidates = edges.map_batches(nbr_labels, batch_format="pyarrow")
        merged = labels_ds.union(candidates)
        return merged.groupby("norm").aggregate(
            Min("label", alias_name="label")
        ).materialize()

    # NOTE(scale): the take_all above bounds this loop to canon maps that fit
    # the driver; the BROADCAST_LIMIT guard in apply_canon_map documents the
    # same assumption. For a >5e7-entity vocabulary, swap nbr_labels for a
    # hash-partitioned groupby join (same semantics, one extra shuffle/round).
    # Rounds needed = eccentricity of each component from its min-label
    # node + 1 to observe stability. Real surface-variant clusters are
    # shallow; the cap guards adversarial chains — hitting it raises rather
    # than silently returning unconverged labels (a 16-round cap once
    # produced wrong components on a dense 1.2k-surface test graph).
    prev_sig = None
    converged = False
    for _ in range(max_rounds):
        labels = propagate(labels)
        sig = labels.map_batches(
            lambda t: pa.table({
                "h": pa.array(
                    [sum(stable_hash64(l) for l in t.column("label").to_pylist())
                     % ((1 << 40) - 1)],
                    pa.int64(),
                )
            }),
            batch_format="pyarrow",
        ).sum("h")
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        raise RuntimeError(
            f"label propagation did not converge in {max_rounds} rounds; "
            "raise max_rounds (component chains deeper than the cap)"
        )

    return labels.map_batches(
        lambda t: pa.table({
            "norm": t.column("norm"),
            "canon": pa.array(
                [_label_to_norm(l) for l in t.column("label").to_pylist()],
                pa.string(),
            ),
        }),
        batch_format="pyarrow",
    )


def canon_map_to_dict(canon_map: rd.Dataset) -> Dict[str, str]:
    """Materialize the canon map to a broadcastable dict (small-side path)."""
    n = canon_map.count()
    if n > BROADCAST_LIMIT:
        raise ValueError(
            f"canon map has {n} entries > BROADCAST_LIMIT={BROADCAST_LIMIT}; "
            "use the hash-partitioned join path"
        )
    return {r["norm"]: r["canon"] for r in canon_map.take_all()}
