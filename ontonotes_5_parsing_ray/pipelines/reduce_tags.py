"""Tag-vocabulary reduction — the ``reduce_entities`` pipeline re-expressed
(SURVEY.md §2.9, §3.2).

Two-phase aggregate-then-rewrite:

1. PASS 1 (A3): global (kind, tag) frequency via pre-aggregated groupby —
   the aggregate result is tiny (tag vocabulary) and becomes a driver
   object.
2. Rules (C0): per kind, top-N seeds + nearest-seed assignment + shortest-
   then-lexicographic canonical renaming (``functions.tagdist``).
3. PASS 2 (C2): broadcast-rules ``map_batches`` rewrite of the long-form
   annotation table; spans of tags that collapse into the same canonical
   tag are merged per (conv_id, turn_idx, kind, canonical) group with the
   O(k) interval merge (C1, ``functions.spans.insert_span`` semantics ==
   bitmap ``insert_new_bounds``).

At 10^12 scale the second pass re-reads from Parquet instead of
materializing between passes (SURVEY.md §4 'Two-pass structure').
"""

from __future__ import annotations

from typing import Dict

import pandas as pd
import ray
import ray.data as rd

from ..functions.spans import insert_span
from ..functions.tagdist import build_reduction_rules
from .stats import tag_frequencies_by_kind


def build_rules(annotations: rd.Dataset, max_types: int) -> Dict[str, Dict[str, str]]:
    """PASS 1 + rule construction; returns rules[kind][tag] -> canonical."""
    freqs = tag_frequencies_by_kind(annotations)
    rules: Dict[str, Dict[str, str]] = {}
    for kind, group in freqs.groupby("kind"):
        tag_freqs = dict(zip(group["tag"], group["n_spans"]))
        rules[kind], _clusters = build_reduction_rules(tag_freqs, max_types)
    return rules


def rewrite_annotations(
    annotations: rd.Dataset, rules: Dict[str, Dict[str, str]]
) -> rd.Dataset:
    """PASS 2: rename tags via broadcast rules and merge collapsing spans.

    Spans merge *within a turn's (kind, canonical-tag) list* — which needs
    rows of one (conv_id, turn_idx) together; a groupby on that composite
    key provides it. The group function applies the C1 insert-merge exactly
    as the reference's rewrite loop (``reduce_entities.py:154-173``).
    """
    rules_ref = ray.put(rules)

    def rewrite_group(group: pd.DataFrame) -> pd.DataFrame:
        rls = ray.get(rules_ref)
        out_rows = []
        conv_id = group["conv_id"].iloc[0]
        turn_idx = group["turn_idx"].iloc[0]
        for kind, kgroup in group.groupby("kind", sort=True):
            kind_rules = rls.get(kind, {})
            merged: Dict[str, list] = {}
            for tag, tgroup in kgroup.groupby("tag", sort=True):
                canon = kind_rules.get(tag, tag)
                spans = sorted(zip(tgroup["start"], tgroup["end"]))
                if canon in merged:
                    for span in spans:
                        merged[canon] = insert_span(span, merged[canon])
                else:
                    merged[canon] = [tuple(s) for s in spans]
            for tag in sorted(merged):
                for start, end in merged[tag]:
                    out_rows.append({
                        "conv_id": conv_id, "turn_idx": turn_idx,
                        "kind": kind, "tag": tag,
                        "start": int(start), "end": int(end),
                    })
        return pd.DataFrame(
            out_rows,
            columns=["conv_id", "turn_idx", "kind", "tag", "start", "end"],
        )

    return annotations.groupby(["conv_id", "turn_idx"]).map_groups(
        rewrite_group, batch_format="pandas"
    )


def reduce_tags(annotations: rd.Dataset, max_types: int) -> rd.Dataset:
    """The full two-pass pipeline (materializes the input once so the two
    passes share the annotation scan at test scale; at production scale pass
    a re-readable Parquet-backed dataset instead)."""
    annotations = annotations.materialize()
    rules = build_rules(annotations, max_types)
    return rewrite_annotations(annotations, rules)
