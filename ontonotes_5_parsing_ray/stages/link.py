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


def _parse_payload(payload: str):
    raw_mentions, raw_verbs = json.loads(payload)
    mentions = [
        {"start": s, "end": e, "surface": surf, "entity_type": et,
         "is_pronoun": bool(pron)}
        for s, e, surf, et, pron in raw_mentions
    ]
    verbs = [((s, e), lemma) for s, e, lemma in raw_verbs]
    return mentions, verbs


# --------------------------------------------------------------------------
# Salted two-phase linking (explicit skew handling, north_rule)
# --------------------------------------------------------------------------

BULK_COLUMNS = [
    "row_kind", "conv_id", "bucket", "turn_idx", "start", "end", "surface",
    "entity_type", "is_pronoun", "norm", "antecedent", "pending_key",
    "pred", "subj", "obj", "subj_type", "obj_type",
    "subj_pending", "obj_pending", "error", "summary_json",
]

_BULK_EMPTY = {
    "turn_idx": -1, "start": -1, "end": -1, "surface": "", "entity_type": "",
    "is_pronoun": False, "norm": "", "antecedent": "", "pending_key": "",
    "pred": "", "subj": "", "obj": "", "subj_type": "", "obj_type": "",
    "subj_pending": "", "obj_pending": "", "error": "", "summary_json": "",
}


def link_bucket_group(group: pd.DataFrame) -> pd.DataFrame:
    """Phase A group fn: one (conv_id, turn_bucket) — bounded memory even
    for a 10^7-turn conversation."""
    from ..functions.kgrules import link_bucket_partial

    group = group.sort_values("turn_idx", kind="mergesort")
    conv_id = group["conv_id"].iloc[0]
    bucket = int(group["bucket"].iloc[0])
    turns = []
    rows = []
    for turn_idx, ok, err, payload in zip(
        group["turn_idx"], group["ok"], group["error"], group["link_json"]
    ):
        if not ok:
            rows.append({**_BULK_EMPTY, "row_kind": "error", "conv_id": conv_id,
                         "bucket": bucket, "turn_idx": int(turn_idx),
                         "error": err})
            continue
        mentions, verbs = _parse_payload(payload)
        turns.append((int(turn_idx), mentions, verbs))
    part = link_bucket_partial(turns)
    for m in part["mentions"]:
        rows.append({
            **_BULK_EMPTY, "row_kind": "mention", "conv_id": conv_id,
            "bucket": bucket, "turn_idx": m["turn_idx"],
            "start": m["start"], "end": m["end"], "surface": m["surface"],
            "entity_type": m["entity_type"], "is_pronoun": bool(m["is_pronoun"]),
            "norm": m["norm"],
            "antecedent": m["antecedent"] if m["antecedent"] is not None else "",
            "pending_key": m["pending_key"],
        })
    for t in part["triples"]:
        rows.append({
            **_BULK_EMPTY, "row_kind": "triple", "conv_id": conv_id,
            "bucket": bucket, "turn_idx": t["turn_idx"], "pred": t["pred"],
            "subj": t["subj"] if t["subj"] is not None else "",
            "obj": t["obj"] if t["obj"] is not None else "",
            "subj_type": t["subj_type"], "obj_type": t["obj_type"],
            "subj_pending": t["subj_pending"], "obj_pending": t["obj_pending"],
        })
    rows.append({
        **_BULK_EMPTY, "row_kind": "summary", "conv_id": conv_id,
        "bucket": bucket,
        "summary_json": json.dumps({
            "new_norms": part["new_norms"],
            "last_entity": part["last_entity"],
            "pending_keys": part["pending_keys"],
        }, ensure_ascii=False),
    })
    return pd.DataFrame(rows, columns=BULK_COLUMNS)


def resolve_conv_group(group: pd.DataFrame) -> pd.DataFrame:
    """Phase B group fn: one conv_id's bucket SUMMARIES only (tiny)."""
    from ..functions.kgrules import merge_bucket_summaries

    group = group.sort_values("bucket", kind="mergesort")
    conv_id = group["conv_id"].iloc[0]
    summaries = [json.loads(s) for s in group["summary_json"]]
    chain_of_norm, resolutions = merge_bucket_summaries(summaries)
    rows = []
    for norm, cid in chain_of_norm.items():
        rows.append({"conv_id": conv_id, "kind": "chain", "key": norm,
                     "chain_id": cid, "surface": "", "norm": "",
                     "entity_type": ""})
    for key, res in resolutions.items():
        rows.append({
            "conv_id": conv_id, "kind": "pending", "key": key,
            "chain_id": -1,
            "surface": res["surface"] if res else "",
            "norm": res["norm"] if res else "",
            "entity_type": res["entity_type"] if res else "",
        })
    if not rows:
        rows.append({"conv_id": conv_id, "kind": "noop", "key": "",
                     "chain_id": -1, "surface": "", "norm": "",
                     "entity_type": ""})
    return pd.DataFrame(
        rows, columns=["conv_id", "kind", "key", "chain_id", "surface",
                       "norm", "entity_type"],
    )


def finalize_bulk_rows(
    batch: pd.DataFrame, chain_maps: dict, pendings: dict
) -> pd.DataFrame:
    """Phase C: apply resolutions to bulk rows -> the unsalted UNION schema."""
    from ..functions.kgrules import PENDING

    out = []
    for row in batch.itertuples(index=False):
        conv_chains = chain_maps.get(row.conv_id, {})
        if row.row_kind == "error":
            out.append({**_EMPTY, "row_kind": "error", "conv_id": row.conv_id,
                        "turn_idx": int(row.turn_idx), "error": row.error})
        elif row.row_kind == "mention":
            ent_type, norm, antecedent = row.entity_type, row.norm, row.antecedent
            if row.pending_key:
                res = pendings.get((row.conv_id, row.pending_key))
                if res is None:
                    ent_type, norm, antecedent = "PRON", "", ""
                else:
                    ent_type = res["entity_type"]
                    norm = res["norm"]
                    antecedent = res["surface"]
            chain_id = conv_chains.get(norm, -1) if norm else -1
            out.append({
                **_EMPTY, "row_kind": "mention", "conv_id": row.conv_id,
                "turn_idx": int(row.turn_idx), "start": int(row.start),
                "end": int(row.end), "surface": row.surface,
                "entity_type": ent_type, "is_pronoun": bool(row.is_pronoun),
                "chain_id": chain_id, "antecedent": antecedent,
            })
        elif row.row_kind == "triple":
            subj, subj_type = row.subj, row.subj_type
            obj, obj_type = row.obj, row.obj_type
            drop = False
            if row.subj_pending:
                res = pendings.get((row.conv_id, row.subj_pending))
                if res is None:
                    drop = True
                else:
                    subj, subj_type = res["surface"], res["entity_type"]
            if row.obj_pending:
                res = pendings.get((row.conv_id, row.obj_pending))
                if res is None:
                    drop = True
                else:
                    obj, obj_type = res["surface"], res["entity_type"]
            if drop or subj == PENDING or obj == PENDING:
                continue  # unresolved-pronoun triple (same rule as unsalted)
            out.append({
                **_EMPTY, "row_kind": "triple", "conv_id": row.conv_id,
                "turn_idx": int(row.turn_idx), "pred": row.pred,
                "subj": subj, "obj": obj,
                "subj_type": subj_type, "obj_type": obj_type,
            })
    if not out:
        return pd.DataFrame({c: pd.Series(dtype=_dtype(c)) for c in UNION_COLUMNS})
    return pd.DataFrame(out, columns=UNION_COLUMNS)
