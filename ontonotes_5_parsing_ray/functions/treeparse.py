"""Constituency structure: S-expression parsing and a deterministic rule parser.

Two producers of the same intermediate representation — a list of
``(token, tag_path)`` where ``tag_path`` is the constituent-label path from the
root and its last element is the POS tag (the reference's ``parse_tree``
output, reference ``ontonotes5/utils.py:59-111``):

* :func:`parse_sexpr_tree` — a Penn-Treebank S-expression parser with the same
  strict error behaviour as the reference (for inputs that carry real trees).
* :func:`rule_parse` — the target pipeline's deterministic "parser model" slot
  (SURVEY.md M3): a lexicon+suffix POS tagger plus a shallow chunker that
  assigns each token a path ``[TOP, S, <chunk>, <pos>]``. In production this
  stage is hosted in an actor pool and can be swapped for a real model; the
  rule parser keeps the pipeline fully deterministic and dependency-free.
"""

from __future__ import annotations

import re
from typing import List, Sequence, Tuple

TokenWithPath = Tuple[str, List[str]]

_BRACKET_RE = re.compile(r"(\(|\))")


def parse_sexpr_tree(tree: str) -> List[TokenWithPath]:
    """Parse a Penn-Treebank S-expression into ``(leaf, tag_path)`` pairs.

    Same contract as the reference parser (utils.py:59-111): a bracket-scan
    with a tag stack; non-leaf labels are single bare words after ``(``; a
    leaf closes as ``(TAG token)``; malformed structure raises ``ValueError``.
    """
    if not tree.strip():
        return []
    err = f'"{tree}" is wrong syntax tree!'
    depth = 0
    prev_pos = -1
    prev_bracket = ""
    tags: List[str] = []
    out: List[TokenWithPath] = []
    for m in _BRACKET_RE.finditer(tree):
        pos = m.start()
        bracket = tree[pos]
        if bracket == "(":
            depth += 1
            if prev_pos >= 0:
                if prev_bracket == "":
                    raise ValueError(err)
                between = tree[prev_pos + 1: pos].strip()
                if prev_bracket == "(":
                    if not between:
                        raise ValueError(err)
                    parts = between.split()
                    if len(parts) != 1:
                        raise ValueError(tree)
                    tags.append(parts[0])
                else:
                    if between:
                        raise ValueError(err)
            elif prev_bracket != "":
                raise ValueError(err)
        else:
            if depth < 1 or prev_pos < 0 or prev_bracket == "":
                raise ValueError(err)
            between = tree[prev_pos + 1: pos].strip()
            if prev_bracket == ")":
                if between:
                    raise ValueError(err)
                tags = tags[:-1]
            else:
                parts = between.split()
                if len(parts) != 2:
                    raise ValueError(tree)
                out.append((parts[1], tags + [parts[0]]))
            depth -= 1
        prev_bracket = bracket
        prev_pos = pos
    return out


# --- deterministic rule tagger / chunker --------------------------------------

PRONOUNS = {
    "he", "she", "it", "they", "we", "i", "you", "him", "her", "them", "us", "me",
    "his", "hers", "its", "their", "our", "this", "that", "these", "those", "who",
}
DETERMINERS = {"the", "a", "an", "some", "any", "each", "every", "no"}
PREPOSITIONS = {
    "in", "on", "at", "of", "for", "with", "from", "to", "by", "about", "into",
    "over", "under", "after", "before", "between", "during", "against",
}
CONJUNCTIONS = {"and", "or", "but", "nor", "so", "yet"}
AUXILIARIES = {
    "is", "are", "was", "were", "be", "been", "being", "am",
    "has", "have", "had", "do", "does", "did", "will", "would",
    "can", "could", "may", "might", "shall", "should", "must",
}
# Base verb lexicon: the generator's predicate vocabulary plus common verbs.
VERB_LEXICON = {
    "found", "acquire", "meet", "visit", "launch", "build", "sell", "buy",
    "hire", "fire", "lead", "join", "leave", "create", "announce", "release",
    "develop", "design", "own", "run", "manage", "praise", "criticize",
    "sue", "fund", "invest", "partner", "merge", "open", "close", "report",
    "say", "tell", "ask", "call", "email", "ship", "deploy", "test", "use",
    "work", "move", "travel", "sign", "win", "lose", "support", "help",
}
_VERB_FORMS = {}
for _v in VERB_LEXICON:
    _VERB_FORMS[_v] = _v
    _VERB_FORMS[_v + "s"] = _v
    _VERB_FORMS[_v + "es"] = _v
    _VERB_FORMS[_v + "ed"] = _v
    _VERB_FORMS[_v + "d"] = _v
    _VERB_FORMS[_v + "ing"] = _v
    if _v.endswith("e"):
        _VERB_FORMS[_v[:-1] + "ing"] = _v
# irregular forms of the lexicon verbs
_VERB_FORMS.update({
    "founded": "found", "met": "meet", "led": "lead", "left": "leave",
    "ran": "run", "sold": "sell", "bought": "buy", "built": "build",
    "won": "win", "lost": "lose", "said": "say", "told": "tell",
})

_CJK_CHAR_RE = re.compile("[가-힣぀-ヿ一-鿿]")
_PUNCT_RE = re.compile(r"^[^\w\s]+$", re.UNICODE)


def pos_tag(token: str) -> str:
    """Deterministic POS tag for one token (the reference's leaf-tag analogue)."""
    low = token.lower()
    if _PUNCT_RE.match(token):
        return "PUNCT"
    if _CJK_CHAR_RE.search(token):
        return "FW"
    if low in PRONOUNS:
        return "PRP"
    if low in DETERMINERS:
        return "DT"
    if low in PREPOSITIONS:
        return "IN"
    if low in CONJUNCTIONS:
        return "CC"
    if low in AUXILIARIES:
        return "MD" if low in {"will", "would", "can", "could", "may",
                               "might", "shall", "should", "must"} else "AUX"
    if low in _VERB_FORMS:
        return "VBD" if low.endswith("ed") or low in {
            "met", "led", "left", "ran", "sold", "bought", "built", "won",
            "lost", "said", "told", "founded",
        } else "VB"
    if token[:1].isdigit():
        return "CD"
    if token[:1].isupper():
        return "NNP"
    if low.endswith("ly"):
        return "RB"
    if low.endswith(("ous", "ful", "ive", "ical", "able")):
        return "JJ"
    return "NN"


def verb_lemma(token: str) -> str:
    """Lemma of a verb-tagged token (falls back to the lowercased surface)."""
    return _VERB_FORMS.get(token.lower(), token.lower())


_NP_POS = {"DT", "JJ", "NN", "NNP", "PRP", "CD", "FW"}
_VP_POS = {"VB", "VBD", "AUX", "MD", "RB"}


def rule_parse(tokens: Sequence[str]) -> List[TokenWithPath]:
    """Shallow deterministic parse: ``(token, [TOP, S, <chunk>, <pos>])``.

    Chunking: maximal runs of nominal tags form NP; verbal runs form VP; a
    preposition followed by a nominal run forms PP with the nominal run nested
    as ``PP, NP``; punctuation and conjunctions attach directly under S.
    This fills the parser-model slot of SURVEY.md M3/M15 deterministically.
    """
    pos = [pos_tag(t) for t in tokens]
    out: List[TokenWithPath] = []
    i = 0
    n = len(tokens)
    while i < n:
        p = pos[i]
        if p in _NP_POS:
            j = i
            while j < n and pos[j] in _NP_POS:
                j += 1
            for k in range(i, j):
                out.append((tokens[k], ["TOP", "S", "NP", pos[k]]))
            i = j
        elif p in _VP_POS:
            j = i
            while j < n and pos[j] in _VP_POS:
                j += 1
            for k in range(i, j):
                out.append((tokens[k], ["TOP", "S", "VP", pos[k]]))
            i = j
        elif p == "IN":
            j = i + 1
            while j < n and pos[j] in _NP_POS:
                j += 1
            if j > i + 1:
                out.append((tokens[i], ["TOP", "S", "PP", pos[i]]))
                for k in range(i + 1, j):
                    out.append((tokens[k], ["TOP", "S", "PP", "NP", pos[k]]))
                i = j
            else:
                out.append((tokens[i], ["TOP", "S", pos[i]]))
                i += 1
        else:
            out.append((tokens[i], ["TOP", "S", p]))
            i += 1
    return out
