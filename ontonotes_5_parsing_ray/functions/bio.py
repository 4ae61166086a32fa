"""Mention detection: BIO labeling and BIO -> entity-span folding.

The reference extracts BIO labels from OnF ``Leaves:`` sections
(``ontonotes5/utils.py:114-222``) and folds them into per-type span dicts
(``utils.py:738-768``). The target's transcripts carry no gold labels, so the
labeler here is the deterministic gazetteer-based mention detector that fills
SURVEY.md M4's "per-turn mention detector" slot; the folder reproduces the
reference's fold semantics exactly (entity span runs from the B- token's start
to the next token's start / text end).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from .spans import Span
from .treeparse import pos_tag

# Deterministic gazetteer: known entity surfaces by type, stored as token
# tuples for longest-match lookup. This doubles as the vocabulary of the
# synthetic transcript generator, so mention detection is exact on generated
# data but still fires on arbitrary text via the NNP fallback.
_PERSON = [
    "Alice Zhang", "Bob Marley", "Carol Danvers", "David Chen", "Erin Brock",
    "Frank Ocean", "Grace Hopper", "Henry Ford", "Irene Adler", "Jack Ma",
    "Karen Page", "Liam Neeson", "Maria Garcia", "Nina Simone", "Omar Little",
]
_ORG = [
    "Acme Corp", "Acme Corporation", "ACME Corp.", "Globex", "Globex Inc",
    "Initech", "Initech LLC", "Umbrella Corp", "Stark Industries",
    "Wayne Enterprises", "Hooli", "Pied Piper", "Aperture Labs",
    "Black Mesa", "Tyrell Corp",
]
_GPE = [
    "Hong Kong", "New York", "San Francisco", "London", "Paris", "Berlin",
    "Tokyo", "Beijing", "Moscow", "Cairo", "Sydney", "Toronto",
]
_DATE = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "January",
         "February", "March", "April", "June", "July", "September", "October"]

GAZETTEER_TYPES: Dict[Tuple[str, ...], str] = {}
for _names, _t in ((_PERSON, "PERSON"), (_ORG, "ORG"), (_GPE, "GPE"), (_DATE, "DATE")):
    for _n in _names:
        GAZETTEER_TYPES[tuple(_n.split())] = _t

_MAX_GAZ_LEN = max(len(k) for k in GAZETTEER_TYPES)


def bio_label_tokens(tokens: Sequence[str]) -> List[str]:
    """Deterministic BIO labels for a token sequence.

    Longest-match gazetteer lookup first; unmatched maximal runs of NNP-tagged
    tokens become CARDINAL-free ``MISC`` entities only if length >= 2 (single
    capitalized tokens are too noisy); everything else is ``O``.
    """
    n = len(tokens)
    labels = ["O"] * n
    i = 0
    while i < n:
        matched = False
        for ln in range(min(_MAX_GAZ_LEN, n - i), 0, -1):
            key = tuple(tokens[i: i + ln])
            ent_type = GAZETTEER_TYPES.get(key)
            if ent_type is not None:
                labels[i] = "B-" + ent_type
                for k in range(i + 1, i + ln):
                    labels[k] = "I-" + ent_type
                i += ln
                matched = True
                break
        if matched:
            continue
        if tokens[i][:1].isupper() and pos_tag(tokens[i]) == "NNP" and i + 1 < n \
                and tokens[i + 1][:1].isupper() and pos_tag(tokens[i + 1]) == "NNP":
            j = i
            while j < n and tokens[j][:1].isupper() and pos_tag(tokens[j]) == "NNP":
                j += 1
            labels[i] = "B-MISC"
            for k in range(i + 1, j):
                labels[k] = "I-MISC"
            i = j
        else:
            i += 1
    return labels


def fold_bio_to_entity_spans(
    bio: Sequence[str],
    token_bounds: Sequence[Span],
    text_len: int,
) -> Dict[str, List[Span]]:
    """Fold a BIO sequence + token char spans into per-type entity spans.

    Reference semantics (utils.py:738-768): an entity opens at a ``B-`` token's
    start; it closes at the *start* of the first following ``O`` token (or at a
    new ``B-``), and a trailing open entity closes at ``text_len``. ``I-``
    continuations keep the entity open.
    """
    entities: Dict[str, List[Span]] = {}
    prev = "O"
    start = -1
    for label, (tok_start, _tok_end) in zip(bio, token_bounds):
        if label == "O":
            if prev != "O":
                entities.setdefault(prev, []).append((start, tok_start))
                prev = "O"
                start = -1
        elif label.startswith("B-"):
            if prev != "O":
                entities.setdefault(prev, []).append((start, tok_start))
            prev = label[2:]
            start = tok_start
        # I- : keep the current entity open (reference ignores type switches here)
    if prev != "O":
        entities.setdefault(prev, []).append((start, text_len))
    return entities
