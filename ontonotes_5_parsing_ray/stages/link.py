"""Conversation-scoped linking: stable turn ordering + coref + SVO triples.

``ds.groupby("conv_id").map_groups(link_group, batch_format="pandas")`` —
the group function sorts by ``turn_idx`` *inside* the group (the stable-
turn-ordering invariant, SURVEY.md K3/J2a: never rely on global dataset
order), then runs the shared ``link_conversation`` kernel.

Output is a single union table with a ``row_kind`` discriminator
(``mention`` | ``triple``) so one ``map_groups`` pass yields both products;
downstream splits with vectorized filters. Skew note: one conversation =
one group; extremely long conversations are bounded by the generator's
``skew_turns`` and, at production scale, by the salted pre-aggregation in
``pipelines/kg.py`` (per-turn annotation is already salted by block; only
this linking stage needs whole-conversation locality, which is inherent to
coreference semantics).
"""

from __future__ import annotations

import json
from typing import List

import pandas as pd

from ..functions.kgrules import link_conversation

UNION_COLUMNS = [
    "row_kind", "conv_id", "turn_idx", "start", "end", "surface",
    "entity_type", "is_pronoun", "chain_id", "antecedent",
    "pred", "subj", "obj", "subj_type", "obj_type", "error",
]

_EMPTY = {
    "start": -1, "end": -1, "surface": "", "entity_type": "",
    "is_pronoun": False, "chain_id": -1, "antecedent": "",
    "pred": "", "subj": "", "obj": "", "subj_type": "", "obj_type": "",
    "error": "",
}


def link_group(group: pd.DataFrame) -> pd.DataFrame:
    """Per-conversation linking; input = annotated turns of ONE conv_id.

    Dead-letter rows (``ok == False``) pass through as ``row_kind='error'``
    so one grouping pass produces mentions, triples AND the error channel —
    annotation never re-runs for a second consumer.
    """
    group = group.sort_values("turn_idx", kind="mergesort")
    conv_id = group["conv_id"].iloc[0]
    turns = []
    for turn_idx, ok, payload in zip(
        group["turn_idx"], group["ok"], group["link_json"]
    ):
        if not ok:
            continue
        raw_mentions, raw_verbs = json.loads(payload)
        mentions = [
            {"start": s, "end": e, "surface": surf, "entity_type": et,
             "is_pronoun": bool(pron)}
            for s, e, surf, et, pron in raw_mentions
        ]
        verbs = [((s, e), lemma) for s, e, lemma in raw_verbs]
        turns.append((int(turn_idx), mentions, verbs))
    mention_rows, triple_rows = link_conversation(turns)
    rows: List[dict] = []
    for turn_idx, ok, err in zip(group["turn_idx"], group["ok"], group["error"]):
        if not ok:
            rows.append({**_EMPTY, "row_kind": "error", "conv_id": conv_id,
                         "turn_idx": int(turn_idx), "error": err})
    for m in mention_rows:
        rows.append({
            **_EMPTY, "row_kind": "mention", "conv_id": conv_id,
            "turn_idx": m["turn_idx"], "start": m["start"], "end": m["end"],
            "surface": m["surface"], "entity_type": m["entity_type"],
            "is_pronoun": bool(m["is_pronoun"]), "chain_id": m["chain_id"],
            "antecedent": m["antecedent"] if m["antecedent"] is not None else "",
        })
    for t in triple_rows:
        rows.append({
            **_EMPTY, "row_kind": "triple", "conv_id": conv_id,
            "turn_idx": t["turn_idx"],
            "pred": t["pred"], "subj": t["subj"], "obj": t["obj"],
            "subj_type": t["subj_type"], "obj_type": t["obj_type"],
        })
    if not rows:
        return pd.DataFrame({c: pd.Series(dtype=_dtype(c)) for c in UNION_COLUMNS})
    return pd.DataFrame(rows, columns=UNION_COLUMNS)


def _dtype(col: str):
    if col in ("turn_idx", "start", "end", "chain_id"):
        return "int64"
    if col == "is_pronoun":
        return "bool"
    return "object"
