"""Relational building blocks: broadcast joins, pre-aggregated groupbys,
top-k, windowed event aggregates.

These power the TPC-H-ish queries in ``__ray_entry__`` and correspond to the
reference's lookup/aggregate operators (SURVEY.md J1 broadcast semi-join,
A1-A4 aggregates, K1 top-k): the small side is materialized once, shipped
via ``ray.put``, and probed per batch — no shuffle; the wide aggregates
pre-combine inside ``map_batches`` before the (tiny) final groupby.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.rounding import round_half_away


def broadcast_join(
    left: rd.Dataset,
    right_df: pd.DataFrame,
    on: Sequence[str],
    how: str = "inner",
) -> rd.Dataset:
    """Broadcast hash join: ``right_df`` (small side, already driver-resident)
    is ``ray.put`` once; every batch does a pandas merge against it.

    The J1 pattern (``utils.py:952-983``) generalized: O(1) dict probe per
    row, zero shuffle. The small side must fit a worker heap — caller's
    contract, same as the reference's driver-resident split dict.
    """
    right_ref = ray.put(right_df)
    on = list(on)

    def probe(batch: pd.DataFrame) -> pd.DataFrame:
        right = ray.get(right_ref)
        return batch.merge(right, on=on, how=how)

    return left.map_batches(probe, batch_format="pandas")


def broadcast_semi_join(
    left: rd.Dataset, keys: set, key_col: str, anti: bool = False
) -> rd.Dataset:
    """Semi/anti join: broadcast the key set, filter inside map_batches."""
    keys_ref = ray.put(keys)

    def fil(batch: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(keys_ref)
        mask = batch[key_col].isin(ks)
        return batch[~mask] if anti else batch[mask]

    return left.map_batches(fil, batch_format="pandas")


# Partial-row count above which the final combine runs as a distributed
# Ray groupby instead of a driver-side pandas groupby. Below it, shipping
# vocabulary-sized partials to the driver is faster than an all-to-all.
PREAGG_DRIVER_LIMIT = 2_000_000


def preagg_groupby(
    ds: rd.Dataset,
    keys: Sequence[str],
    aggs: Dict[str, tuple],
    driver_limit: int = PREAGG_DRIVER_LIMIT,
) -> pd.DataFrame:
    """Pre-aggregated groupby: per-batch pandas combine first, then a final
    combine of the (keys-cardinality x batches) partials — on the driver for
    small key spaces, as a distributed ``groupby().aggregate`` when the
    partials exceed ``driver_limit`` rows (high-cardinality keys).

    ``aggs`` maps output column -> (input column, kind) with kind in
    {sum, count, min, max}; means are derived by the caller from sum+count
    (mergeable decomposition). Correct for distributive/algebraic aggregates
    only — exactly the ones the reference's statistics need (A1-A3).
    """
    keys = list(keys)

    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(keys, sort=False, dropna=False)
        out = {}
        for out_col, (in_col, kind) in aggs.items():
            if kind == "sum":
                out[out_col] = g[in_col].sum()
            elif kind == "count":
                out[out_col] = g[in_col].size()
            elif kind == "min":
                out[out_col] = g[in_col].min()
            elif kind == "max":
                out[out_col] = g[in_col].max()
            else:
                raise ValueError(kind)
        return pd.DataFrame(out).reset_index()

    parts_ds = ds.map_batches(partials, batch_format="pandas")
    sample = parts_ds.take(driver_limit)
    if len(sample) < driver_limit:
        parts = pd.DataFrame(sample)
        if not len(parts):
            return parts
        g = parts.groupby(keys, sort=True, dropna=False)
        final = {}
        for out_col, (_in, kind) in aggs.items():
            if kind in ("sum", "count"):
                final[out_col] = g[out_col].sum()
            elif kind == "min":
                final[out_col] = g[out_col].min()
            elif kind == "max":
                final[out_col] = g[out_col].max()
        return pd.DataFrame(final).reset_index()

    # Distributed final combine (sum-of-counts == count, so count partials
    # merge with Sum).
    from ray.data.aggregate import Max as RMax, Min as RMin, Sum as RSum

    ray_aggs = []
    for out_col, (_in, kind) in aggs.items():
        if kind in ("sum", "count"):
            ray_aggs.append(RSum(out_col, alias_name=out_col))
        elif kind == "min":
            ray_aggs.append(RMin(out_col, alias_name=out_col))
        elif kind == "max":
            ray_aggs.append(RMax(out_col, alias_name=out_col))
    out = parts_ds.groupby(keys).aggregate(*ray_aggs).to_pandas()
    return out.sort_values(keys).reset_index(drop=True)


def topk(df: pd.DataFrame, by: List[str], ascending: List[bool], k: int) -> pd.DataFrame:
    """Deterministic driver-side top-k of an already-small aggregate."""
    return df.sort_values(by, ascending=ascending, kind="mergesort").head(k).reset_index(drop=True)


def windowed_event_counts(
    events: rd.Dataset,
    window_seconds: int = 3600,
) -> pd.DataFrame:
    """Tumbling-window aggregate per (event_type, window): count + value sum.

    Windows are epoch-aligned (``floor(epoch/size)``) so per-batch partials
    merge exactly — no ordering assumption, no watermark (bounded batch
    semantics; see SURVEY.md §2.10). SQL twin: GROUP BY event_type,
    epoch bucket.
    """

    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[["ts", "event_type", "value"]].copy()
        epoch = b["ts"].astype("int64") // 1_000_000
        b["window_start"] = (epoch // window_seconds) * window_seconds
        g = b.groupby(["event_type", "window_start"], sort=False)
        return pd.DataFrame({
            "n_events": g["value"].size(),
            "value_sum": g["value"].sum(),
        }).reset_index()

    parts = rd.Dataset.to_pandas(
        events.map_batches(partials, batch_format="pandas")
    )
    g = parts.groupby(["event_type", "window_start"], sort=True)
    out = pd.DataFrame({
        "n_events": g["n_events"].sum(),
        "value_sum": round_half_away(g["value_sum"].sum().to_numpy(), 6),
    }).reset_index()
    return out


def sessionize_events(
    events: rd.Dataset,
    gap_seconds: int = 1800,
) -> rd.Dataset:
    """Session windows per user: a new session starts when the gap from the
    previous event exceeds ``gap_seconds``.

    ``groupby(user_id).map_groups`` with an in-group sort by ts — the
    streaming-window pattern over a partitioned log (ordering assumption:
    per-user only, never global)."""

    def per_user(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(["ts", "event_id"], kind="mergesort")
        epoch = group["ts"].astype("int64") // 1_000_000
        new_session = (epoch.diff().fillna(gap_seconds + 1) > gap_seconds)
        session_idx = new_session.cumsum().astype("int64") - 1
        g2 = group.assign(session_idx=session_idx.values, epoch=epoch.values)
        agg = g2.groupby("session_idx", sort=True).agg(
            user_id=("user_id", "first"),
            session_start=("epoch", "min"),
            session_end=("epoch", "max"),
            n_events=("event_id", "size"),
            value_sum=("value", "sum"),
        ).reset_index()
        agg["value_sum"] = round_half_away(agg["value_sum"].to_numpy(), 6)
        return agg[["user_id", "session_idx", "session_start", "session_end",
                    "n_events", "value_sum"]]

    return events.select_columns(
        ["event_id", "ts", "user_id", "value"]
    ).groupby("user_id").map_groups(per_user, batch_format="pandas")
