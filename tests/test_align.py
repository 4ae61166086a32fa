"""Alignment tests: exact, fuzzy ladder, subword DP (reference utils.py:225-404)."""

import pytest

from ontonotes_5_parsing_ray.functions.align import (
    align_tokens,
    exact_token_bounds,
    fuzzy_token_bounds,
    split_word_into_subwords,
)
from ontonotes_5_parsing_ray.functions.spans import check_spans
from ontonotes_5_parsing_ray.functions.text import tokenize_any_text


def test_exact_bounds_greedy():
    text = "Alice Zhang founded Acme Corp ."
    toks = tokenize_any_text(text)
    bounds = exact_token_bounds(text, toks)
    assert bounds[0] == (0, 5)
    assert [text[s:e] for s, e in bounds] == toks


def test_exact_bounds_raises_on_missing_token():
    with pytest.raises(ValueError):
        exact_token_bounds("abc def", ["abc", "xyz"])


def test_subword_dp_earliest_split_tiebreak():
    bounds, dist = split_word_into_subwords("Corporation", ["Corp", "##orat", "##ion"])
    assert bounds == [(0, 4), (4, 8), (8, 11)]
    # equal-length base case: one char per subword
    bounds, _ = split_word_into_subwords("abc", ["a", "b", "c"])
    assert bounds == [(0, 1), (1, 2), (2, 3)]
    # single subword: whole word
    bounds, _ = split_word_into_subwords("abcdef", ["abq"])
    assert bounds == [(0, 6)]
    with pytest.raises(ValueError):
        split_word_into_subwords("ab", ["x", "y", "z"])


def test_fuzzy_alignment_covers_subword_tokens():
    text = "Corporation announced results"
    tokens = ["Corp", "##orat", "##ion", "anno", "##unce", "##d", "resu", "##lts"]
    bounds = align_tokens(text, tokens)
    assert len(bounds) == len(tokens)
    assert check_spans(text, bounds) == ""


def test_fuzzy_equal_token_count_short_circuits():
    text = "hello world"
    bounds = fuzzy_token_bounds(text, ["xxxxx", "yyyyy"])
    assert bounds == [(0, 5), (6, 11)]


def test_align_raises_when_hopeless():
    with pytest.raises(ValueError):
        align_tokens("abc", ["zzzzzz", "qqqqqq", "wwwwww", "abc", "x", "y", "z", "q"])


def test_property_invariants_on_cjk():
    text = "他 访问 了 北京"
    toks = tokenize_any_text(text)
    bounds = align_tokens(text, toks)
    # property-style: monotone, in-range, stripped, whitespace-only gaps
    assert check_spans(text, bounds) == ""
    prev = 0
    for s, e in bounds:
        assert text[prev:s].strip() == ""
        prev = e
