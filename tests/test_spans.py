"""Span algebra unit tests (semantics of reference utils.py:407-486,1002-1044)."""

import pytest

from ontonotes_5_parsing_ray.functions.spans import (
    check_spans,
    drop_nested_spans,
    insert_span,
    strip_spans,
    unite_overlapping_spans,
)


def test_strip_spans_shrinks_whitespace():
    text = "  hello  world "
    assert strip_spans(text, [(0, 7), (7, 15)]) == [(2, 7), (9, 14)]


def test_drop_nested_keeps_outermost():
    assert drop_nested_spans([(0, 10), (2, 5), (12, 15)]) == [(0, 10), (12, 15)]


def test_unite_merges_overlap_and_adjacency():
    assert unite_overlapping_spans([(0, 3), (3, 5), (7, 9), (8, 12)]) == [(0, 5), (7, 12)]


def test_unite_raises_on_unsorted():
    with pytest.raises(ValueError):
        unite_overlapping_spans([(5, 8), (0, 2)])


def test_check_spans_catches_each_invariant():
    text = "hello world"
    assert check_spans(text, [(0, 5), (6, 11)]) == ""
    assert "start=" in check_spans(text, [(3, 3)])
    assert "prev_end" in check_spans(text, [(0, 5), (4, 8)])
    assert "len(text)" in check_spans(text, [(0, 50)])
    # span with leading space is not stripped
    assert "not stripped" in check_spans(text, [(5, 8)])


def test_insert_span_matches_bitmap_semantics():
    # before / after without touching: plain insert
    assert insert_span((0, 1), [(3, 5)]) == [(0, 1), (3, 5)]
    assert insert_span((7, 9), [(3, 5)]) == [(3, 5), (7, 9)]
    # overlap + adjacency merge (bitmap runs merge when touching)
    assert insert_span((2, 6), [(0, 3), (5, 8)]) == [(0, 8)]
    assert insert_span((3, 5), [(0, 3), (5, 8)]) == [(0, 8)]
    assert insert_span((4, 5), [(0, 2), (6, 8)]) == [(0, 2), (4, 5), (6, 8)]
    with pytest.raises(ValueError):
        insert_span((0, 1), [(2, 2)])
    with pytest.raises(ValueError):
        insert_span((0, 1), [(2, 5), (3, 8)])
