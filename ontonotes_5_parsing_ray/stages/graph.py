"""Distributed graph analytics over edge Datasets.

Connected components live in ``stages/canonicalize.py`` (large/small-star
contraction); this module adds iterative rank propagation. PageRank is the
canonical "iterative algorithm on Ray Data" shape: the driver orchestrates
a fixed number of rounds; each round is one distributed join + one
combine, and per-round state (the rank vector) auto-routes — broadcast via
``ray.put`` while the node table fits, a node-hash ``hash_join`` when it
does not.

Graph contract: callers pass WEIGHTED directed edges ``(src, dst, w)``
with no dangling nodes — every node must appear as a ``src`` (undirected
graphs, encoded as both edge directions, satisfy this automatically).
Dangling-node mass redistribution is intentionally out of scope.
"""

from __future__ import annotations

from typing import Union

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from .relational import hash_join, preagg_groupby_ds, to_arrow

__all__ = ["pagerank"]


def pagerank(
    edges: rd.Dataset,
    damping: float = 0.85,
    iterations: int = 5,
    broadcast_limit: int = 2_000_000,
) -> Union[pd.DataFrame, rd.Dataset]:
    """Weighted PageRank by power iteration:
    ``r'(v) = (1-d)/N + d * sum_{(u,v,w)} r(u) * w / outdeg(u)``.

    The edge table is pinned once; out-degrees are one distributed
    combine. Each iteration then either (node count ≤ ``broadcast_limit``)
    broadcasts the rank/out-degree vectors and runs one vectorized
    contributions pass + a driver combine, or (above the limit) joins the
    rank Dataset onto the out-degree-augmented edges by node hash and
    combines distributed — per-round state is materialized so iteration
    ``k+1`` never re-executes rounds ``1..k`` through lineage.

    Returns a ``pd.DataFrame`` (broadcast route) or ``rd.Dataset`` (join
    route) of ``(node, rank)``; ranks are raw doubles — callers round.
    The contribution arithmetic is shaped ``(rank * w) / outdeg`` so a SQL
    twin using the same expression reproduces it bit-for-bit.
    """
    edges = edges.materialize()
    outdeg = preagg_groupby_ds(
        edges, ["src"], {"outdeg": ("w", "sum")}).materialize()
    n_nodes = outdeg.count()
    if n_nodes == 0:
        return pd.DataFrame({"node": pd.Series([], dtype=object),
                             "rank": pd.Series([], dtype="float64")})
    base = (1.0 - damping) / n_nodes

    if n_nodes <= broadcast_limit:
        state = outdeg.to_pandas().set_index("src")["outdeg"]
        nodes = state.index.to_numpy()
        ranks = pd.Series(1.0 / n_nodes, index=state.index)
        for _ in range(iterations):
            ref = ray.put(pd.DataFrame({"rank": ranks, "outdeg": state}))

            def contribs(b: pd.DataFrame) -> pa.Table:
                st = ray.get(ref)
                r = st["rank"].reindex(b["src"]).to_numpy(np.float64)
                od = st["outdeg"].reindex(b["src"]).to_numpy(np.float64)
                c = (r * b["w"].to_numpy(np.float64)) / od
                part = (pd.DataFrame({"node": b["dst"], "c": c})
                        .groupby("node", sort=False)["c"].sum()
                        .reset_index())
                return to_arrow(part)

            summed = preagg_groupby_ds(
                edges.map_batches(contribs, batch_format="pandas"),
                ["node"], {"c": ("c", "sum")},
            ).to_pandas().set_index("node")["c"]
            ranks = base + damping * summed.reindex(
                ranks.index).fillna(0.0)
        return (pd.DataFrame({"node": nodes, "rank": ranks.to_numpy()})
                .reset_index(drop=True))

    # join route: node table too big to broadcast
    edges_aug = hash_join(edges, outdeg, on=["src"]).materialize()

    def init_ranks(b: pd.DataFrame) -> pa.Table:
        return pa.table({
            "node": pa.array(b["src"].astype(str), pa.string()),
            "rank": pa.array(np.full(len(b), 1.0 / n_nodes), pa.float64()),
        })

    ranks_ds = outdeg.map_batches(
        init_ranks, batch_format="pandas").materialize()
    for _ in range(iterations):
        joined = hash_join(edges_aug, ranks_ds, on=["src"],
                           right_on=["node"])

        def contribs_j(b: pd.DataFrame) -> pa.Table:
            c = ((b["rank"].to_numpy(np.float64)
                  * b["w"].to_numpy(np.float64))
                 / b["outdeg"].to_numpy(np.float64))
            part = (pd.DataFrame({"node": b["dst"], "c": c})
                    .groupby("node", sort=False)["c"].sum().reset_index())
            return to_arrow(part)

        summed = preagg_groupby_ds(
            joined.map_batches(contribs_j, batch_format="pandas"),
            ["node"], {"c": ("c", "sum")},
        )

        def finish(b: pd.DataFrame) -> pa.Table:
            return pa.table({
                "node": pa.array(b["node"].astype(str), pa.string()),
                "rank": pa.array(
                    base + damping * b["c"].to_numpy(np.float64),
                    pa.float64()),
            })

        ranks_ds = summed.map_batches(
            finish, batch_format="pandas").materialize()
    return ranks_ds
