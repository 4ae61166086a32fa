"""Dataset splitting + seeded shuffle + validated load — the reference's
build-output machinery re-expressed (SURVEY.md S4/S5/S6/S7, J1, K2, D1).

* Split routing: the reference semi-joins each document's path against
  driver-resident train/development/test ID lists (``utils.py:952-983``) and
  asserts the lists disjoint (``ontonotes5_to_json.py:77-79``). Here the
  split map is a broadcast small side keyed by ``conv_id`` (explicit lists),
  with a deterministic-hash fallback for conversations not listed.
* Seeded shuffle: ``random_shuffle(seed=...)`` per split before writing —
  the K2 analogue of the reference's ``random.shuffle`` with a fixed seed.
* Validated load: ``load_annotations_validated`` re-checks the span
  invariants on read, exactly as ``load_ontonotes5_from_json``
  (``utils.py:1106-1257``) re-validates structure — but vectorized per
  Arrow batch, with violations going to an error column (dead-letter), not
  exceptions.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions.hashing import stable_hash64

SPLITS = ("train", "validation", "test")


def check_split_lists_disjoint(lists: Dict[str, Sequence[str]]) -> None:
    """D1: assert the explicit ID lists are pairwise disjoint."""
    names = sorted(lists)
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            overlap = set(lists[a]) & set(lists[b])
            if overlap:
                raise ValueError(
                    f"split lists {a!r} and {b!r} overlap: {sorted(overlap)[:5]}"
                )


def split_of_conv(conv_id: str, weights: Tuple[int, int, int] = (8, 1, 1)) -> str:
    """Deterministic hash split (fallback when no explicit lists exist)."""
    total = sum(weights)
    h = stable_hash64("split:" + conv_id) % total
    if h < weights[0]:
        return "train"
    if h < weights[0] + weights[1]:
        return "validation"
    return "test"


def assign_splits(
    ds: rd.Dataset,
    id_lists: Optional[Dict[str, Sequence[str]]] = None,
    weights: Tuple[int, int, int] = (8, 1, 1),
) -> rd.Dataset:
    """Add a ``split`` column: broadcast explicit lists (J1 semi-join) with
    hash fallback. Never three driver lists — the split is a COLUMN
    (SURVEY.md §1.4)."""
    if id_lists:
        check_split_lists_disjoint(id_lists)
        lookup = {cid: name for name, ids in id_lists.items() for cid in ids}
    else:
        lookup = {}
    lookup_ref = ray.put(lookup)

    def add_split(batch: pa.Table) -> pa.Table:
        table = ray.get(lookup_ref)
        splits = [
            table.get(c) or split_of_conv(c, weights)
            for c in batch.column("conv_id").to_pylist()
        ]
        return batch.append_column("split", pa.array(splits, pa.string()))

    return ds.map_batches(add_split, batch_format="pyarrow")


def load_identifiers(file_name: str) -> List[str]:
    """S6: read an on-disk ``.id`` manifest — one identifier per line,
    whitespace stripped, blank lines dropped; an empty file is an error
    (reference ``utils.py:871-883``). Tabular keys mean no filename
    re-splitting (M18 is N/A by design)."""
    with open(file_name, encoding="utf-8", errors="ignore") as fp:
        lines = [ln.strip() for ln in fp]
    lines = [ln for ln in lines if ln]
    if not lines:
        raise ValueError(f'File "{file_name}" is empty!')
    return lines


# Manifest file names follow the reference ('development.id'); the loaded
# dict uses THIS engine's split names (development -> validation).
SPLIT_FILE_NAMES = (("train", "train"), ("development", "validation"),
                    ("test", "test"))


def parse_splitting(dir_name: str) -> Dict[str, List[str]]:
    """S7: recursive split-manifest walker (reference ``utils.py:886-937``):
    every directory named ``all`` must hold ``train.id`` /
    ``development.id`` / ``test.id``; identifier lists accumulate across the
    whole tree. Driver-side by design — manifests are metadata, never data.
    """
    base = os.path.basename(os.path.normpath(dir_name))
    if not base:
        raise ValueError("A directory name is empty!")
    out: Dict[str, List[str]] = {}
    if base == "all":
        for ref_name, ours in SPLIT_FILE_NAMES:
            path = os.path.join(dir_name, ref_name + ".id")
            if not os.path.isfile(path):
                raise ValueError(f'File "{path}" does not exist!')
            out.setdefault(ours, []).extend(load_identifiers(path))
    else:
        for entry in sorted(os.listdir(dir_name)):
            sub = os.path.join(dir_name, entry)
            if os.path.isdir(sub):
                for k, v in parse_splitting(sub).items():
                    out.setdefault(k, []).extend(v)
    return out


def assign_splits_from_dir(
    ds: rd.Dataset,
    split_dir: str,
    weights: Tuple[int, int, int] = (8, 1, 1),
) -> rd.Dataset:
    """File-manifest front end to :func:`assign_splits`: IDs found under
    ``split_dir`` route exactly like explicit in-memory lists."""
    lists = parse_splitting(split_dir)
    return assign_splits(ds, lists or None, weights)


def write_split_dataset(
    ds: rd.Dataset,
    out_dir: str,
    seed: int = 42,
    shuffle: bool = True,
) -> Dict[str, str]:
    """Seeded-shuffle each split and write one Parquet directory per split
    (the S4 analogue: ``random.shuffle`` + per-split output, but streaming
    and partitioned instead of three driver lists)."""
    out: Dict[str, str] = {}
    for split in SPLITS:
        subset = ds.map_batches(
            lambda t, s=split: t.filter(pc.equal(t.column("split"), s)),
            batch_format="pyarrow",
        )
        if shuffle:
            subset = subset.random_shuffle(seed=seed)
        split_dir = os.path.join(out_dir, f"split={split}")
        subset.write_parquet(split_dir)
        out[split] = split_dir
    return out


def split_counts(ds_with_split: rd.Dataset) -> pd.DataFrame:
    """A4-style per-split report (pre-aggregated)."""
    from ..stages.relational import preagg_groupby

    out = preagg_groupby(
        ds_with_split.select_columns(["split"]), ["split"],
        {"n_rows": ("split", "count")},
    )
    return out.sort_values("split").reset_index(drop=True)


# --------------------------------------------------------------------------
# Validated load (S5)
# --------------------------------------------------------------------------

def validate_annotation_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Vectorized span-invariant checks over long-form annotation rows:
    0 <= start < end, spans sorted + non-overlapping within each
    (conv_id, turn_idx, kind, tag) group. Violations become rows in the
    returned error frame (dead-letter), mirroring ``check_bounds``'s error
    strings (``utils.py:454-486``)."""
    errs: List[dict] = []
    bad_order = batch["start"] >= batch["end"]
    for row in batch[bad_order].itertuples(index=False):
        errs.append({
            "conv_id": row.conv_id, "turn_idx": int(row.turn_idx),
            "error": f"span ({row.start},{row.end}) is empty or inverted",
        })
    neg = batch["start"] < 0
    for row in batch[neg].itertuples(index=False):
        errs.append({
            "conv_id": row.conv_id, "turn_idx": int(row.turn_idx),
            "error": f"span start {row.start} < 0",
        })
    good = batch[~(bad_order | neg)]
    grouped = good.sort_values(["conv_id", "turn_idx", "kind", "tag", "start"])
    key_cols = ["conv_id", "turn_idx", "kind", "tag"]
    same_group = (grouped[key_cols] == grouped[key_cols].shift()).all(axis=1)
    overlap = same_group & (grouped["start"] < grouped["end"].shift())
    for row in grouped[overlap].itertuples(index=False):
        errs.append({
            "conv_id": row.conv_id, "turn_idx": int(row.turn_idx),
            "error": f"overlapping spans in {row.kind}/{row.tag} at {row.start}",
        })
    if not errs:
        return pd.DataFrame({
            "conv_id": pd.Series(dtype=object),
            "turn_idx": pd.Series(dtype="int64"),
            "error": pd.Series(dtype=object),
        })
    return pd.DataFrame(errs)


def load_annotations_validated(path: str) -> Tuple[rd.Dataset, rd.Dataset]:
    """Read a long-form annotation Parquet and validate per batch.

    Returns ``(annotations, violations)``. NOTE: the within-group overlap
    check is exact only when a (conv_id, turn_idx) group does not straddle a
    batch boundary; pass data partitioned by conv (as this engine writes it)
    or accept boundary false-negatives — the same per-record scope the
    reference's loader validates.
    """
    ds = rd.read_parquet(path)
    violations = ds.map_batches(validate_annotation_batch, batch_format="pandas")
    return ds, violations
