"""Streaming exact dedup against the sharded shared-index actors."""

import pandas as pd
import pyarrow as pa


def _dup_heavy_ds(n=3000, distinct=700):
    import ray.data as rd

    texts = [f"document body number {i % distinct} with shared content"
             for i in range(n)]
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })), distinct


def test_streaming_dedup_admits_each_text_once(ray_session):
    from ontonotes_5_parsing_ray.state.dedup_index import (
        create_index,
        index_size,
        streaming_exact_dedup,
    )

    ds, distinct = _dup_heavy_ds()
    shards = create_index(4)
    kept = streaming_exact_dedup(ds, shards).to_pandas()
    # the admitted SET is deterministic even though winners are not
    assert len(kept) == distinct
    assert kept["text"].nunique() == distinct
    assert index_size(shards) == distinct

    # a second stream over the same corpus admits nothing new
    again = streaming_exact_dedup(ds, shards).to_pandas()
    assert len(again) == 0
    assert index_size(shards) == distinct


def test_streaming_dedup_matches_batch_exact_dedup(ray_session):
    from ontonotes_5_parsing_ray.stages.dedup import exact_dedup
    from ontonotes_5_parsing_ray.state.dedup_index import (
        create_index,
        streaming_exact_dedup,
    )

    ds, _ = _dup_heavy_ds(n=2000, distinct=333)
    batch_texts = set(exact_dedup(ds).to_pandas()["text"])
    stream_texts = set(
        streaming_exact_dedup(ds, create_index(8)).to_pandas()["text"])
    assert stream_texts == batch_texts
