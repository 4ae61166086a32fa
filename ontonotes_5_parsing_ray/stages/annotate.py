"""Per-turn annotation stage (the fused M1-M16 transform).

``ray.data.Dataset.map_batches(AnnotateTurns, batch_format="pyarrow",
concurrency=N)`` — an actor pool because the stage owns compiled regexes,
lexicons and the alignment machinery (setup once per actor in ``__init__``,
work per batch in ``__call__``), the slot where a real parser model would be
hosted (SURVEY.md §2.2 M3, §7.2).

Input batch:  ``conv_id, turn_idx, role, text`` (Arrow, zero-copy).
Output batch: input columns + ``ok:bool, error:string, record_json:string``
— semantic failures are data (the reference's ``(records, err_msg)``
dead-letter channel, ``ontonotes5_to_json.py:80,106-107``), never exceptions,
so one malformed turn cannot kill a block at 10^12-turn scale.
"""

from __future__ import annotations

import json
from typing import List

import pyarrow as pa

from ..functions.record import annotate_turn_text, record_to_long_form


class AnnotateTurns:
    """Actor-pool callable: annotate each turn of an Arrow batch.

    Per-actor memo: real transcript corpora repeat boilerplate turns
    (greetings, tool preambles) heavily, so annotation results are cached by
    ``(text, mode)`` — dedup-before-compute. The cache is bounded; eviction
    is whole-flush (simple, and the hot set is tiny relative to the bound).
    Cached or not, results are byte-identical to the oracle's.
    """

    CACHE_LIMIT = 200_000

    def __init__(
        self,
        simulate_model_tokens_for_tools: bool = True,
        emit: str = "record",
    ):
        # Per-actor setup: importing functions.* compiles every regex and
        # builds the gazetteer/lexicon tables once per worker process.
        if emit not in ("record", "link", "both"):
            raise ValueError(emit)
        self.tool_subwords = simulate_model_tokens_for_tools
        self.emit = emit
        self._memo: dict = {}

    @staticmethod
    def _link_payload_json(record) -> str:
        """Compact mentions+verbs payload — the only bytes the conv_id
        shuffle has to move (full records stay out of the all-to-all)."""
        from ..functions.kgrules import turn_link_payload

        mentions, verbs = turn_link_payload(record)
        return json.dumps(
            [
                [[m["start"], m["end"], m["surface"], m["entity_type"],
                  1 if m["is_pronoun"] else 0] for m in mentions],
                [[s, e, lemma] for (s, e), lemma in verbs],
            ],
            ensure_ascii=False,
        )

    def _annotate(self, text: str, subwords: bool):
        from ..functions.analysis import detect_language

        key = (text, subwords)
        hit = self._memo.get(key)
        if hit is None:
            lang = detect_language(text)
            record, e = annotate_turn_text(text, simulate_model_tokens=subwords)
            if record is None:
                hit = ("", "", e, lang)
            else:
                rec_json = (
                    json.dumps(record, ensure_ascii=False)
                    if self.emit in ("record", "both") else ""
                )
                link_json = (
                    self._link_payload_json(record)
                    if self.emit in ("link", "both") else ""
                )
                hit = (rec_json, link_json, "", lang)
            if len(self._memo) >= self.CACHE_LIMIT:
                self._memo.clear()
            self._memo[key] = hit
        return hit

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        roles = batch.column("role").to_pylist()
        ok: List[bool] = []
        err: List[str] = []
        rec_json: List[str] = []
        link_json: List[str] = []
        langs: List[str] = []
        for text, role in zip(texts, roles):
            rec, link, e, lang = self._annotate(
                text, self.tool_subwords and role == "tool")
            ok.append(e == "")
            err.append(e)
            rec_json.append(rec)
            link_json.append(link)
            langs.append(lang)
        out = (
            batch
            .append_column("ok", pa.array(ok, pa.bool_()))
            .append_column("error", pa.array(err, pa.string()))
            .append_column("lang", pa.array(langs, pa.string()))
        )
        if self.emit in ("record", "both"):
            out = out.append_column("record_json", pa.array(rec_json, pa.string()))
        if self.emit in ("link", "both"):
            out = out.append_column("link_json", pa.array(link_json, pa.string()))
        return out


def annotations_long_form(batch: pa.Table) -> pa.Table:
    """Explode annotated turns to long-form rows
    ``(conv_id, turn_idx, kind, tag, start, end)``.

    The shuffle-friendly representation (SURVEY.md §1.4): dynamic tag
    vocabularies stay *data*, so Arrow schemas unify across blocks.
    """
    conv_ids = batch.column("conv_id").to_pylist()
    turn_idxs = batch.column("turn_idx").to_pylist()
    oks = batch.column("ok").to_pylist()
    recs = batch.column("record_json").to_pylist()
    out = {"conv_id": [], "turn_idx": [], "kind": [], "tag": [],
           "start": [], "end": []}
    for conv_id, turn_idx, ok, rec in zip(conv_ids, turn_idxs, oks, recs):
        if not ok:
            continue
        record = json.loads(rec)
        for kind, tag, start, end in record_to_long_form(record):
            out["conv_id"].append(conv_id)
            out["turn_idx"].append(turn_idx)
            out["kind"].append(kind)
            out["tag"].append(tag)
            out["start"].append(start)
            out["end"].append(end)
    return pa.table({
        "conv_id": pa.array(out["conv_id"], pa.string()),
        "turn_idx": pa.array(out["turn_idx"], pa.int32()),
        "kind": pa.array(out["kind"], pa.string()),
        "tag": pa.array(out["tag"], pa.string()),
        "start": pa.array(out["start"], pa.int32()),
        "end": pa.array(out["end"], pa.int32()),
    })
