"""Statistics/report pipelines — the A1/A2/A4 analogues (SURVEY.md §2.5).

All are pre-aggregated groupbys: per-batch partial counts inside
``map_batches``, tiny final combine (the map-side-combiner pattern the
reference's in-memory loops imply at ``utils.py:1260-1299``).
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from ..stages.relational import preagg_groupby


def language_frequencies(docs: rd.Dataset, lang_col: str = "lang") -> pd.DataFrame:
    """Group-by language, count docs; sort (-count, lang)
    (reference ``get_language_frequencies``, utils.py:1260-1273)."""
    out = preagg_groupby(
        docs.select_columns([lang_col]), [lang_col],
        {"n_samples": (lang_col, "count")},
    )
    return out.sort_values(
        ["n_samples", lang_col], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)


def entity_frequencies(
    annotations: rd.Dataset, kind: str = "entities"
) -> pd.DataFrame:
    """Per entity-type span counts over the long-form annotation table;
    sort (-count, type) (reference ``get_entity_frequencies``,
    utils.py:1276-1299). ``kind`` filters morphology/syntax/entities."""
    import pyarrow.compute as pc

    filtered = annotations.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), kind)).select(["tag"]),
        batch_format="pyarrow",
    )
    out = preagg_groupby(filtered, ["tag"], {"n_spans": ("tag", "count")})
    return out.sort_values(
        ["n_spans", "tag"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)


def tag_frequencies_by_kind(annotations: rd.Dataset) -> pd.DataFrame:
    """Corpus-wide (kind, tag) frequency pass — the A3 aggregate
    (``reduce_entities.py:64-86``) as one pre-aggregated groupby."""
    out = preagg_groupby(
        annotations.select_columns(["kind", "tag"]), ["kind", "tag"],
        {"n_spans": ("tag", "count")},
    )
    return out.sort_values(
        ["kind", "n_spans", "tag"], ascending=[True, False, True], kind="mergesort"
    ).reset_index(drop=True)
