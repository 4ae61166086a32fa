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


def test_streaming_dedup_double_consumption_and_retry_idempotence(ray_session):
    """ADVICE r3: consuming the returned Dataset twice must yield the same
    rows (materialized result), and a replayed claim under the same token
    (what a Ray task retry presents) must re-admit its own documents."""
    import ray

    from ontonotes_5_parsing_ray.state.dedup_index import (
        DedupShard,
        create_index,
        streaming_exact_dedup,
    )

    ds, distinct = _dup_heavy_ds(n=1200, distinct=200)
    shards = create_index(4)
    kept_ds = streaming_exact_dedup(ds, shards)
    first = kept_ds.to_pandas()
    second = kept_ds.to_pandas()  # re-consumption: cached blocks, no probes
    assert len(first) == distinct
    pd.testing.assert_frame_equal(first, second)

    # retry idempotence at the shard level: same (hashes, token) replay
    shard = DedupShard.remote()
    mask1 = ray.get(shard.claim.remote([1, 2, 3], 77))
    mask_retry = ray.get(shard.claim.remote([1, 2, 3], 77))
    assert mask1 == [True, True, True]
    assert mask_retry == [True, True, True]
    # a DIFFERENT pass (new token) over the same hashes admits nothing
    assert ray.get(shard.claim.remote([1, 2, 3], 78)) == [False] * 3


def test_batch_token_distinguishes_identical_text_batches(ray_session):
    """r4-ADVICE: two byte-identical TEXT batches within one pass (aligned
    blocks of a boilerplate-heavy corpus) must get DISTINCT claim tokens —
    their doc ids differ — while a retry of the SAME batch reproduces its
    token exactly."""
    import numpy as np

    from ontonotes_5_parsing_ray.functions.hashing import hash64_vec
    from ontonotes_5_parsing_ray.state.dedup_index import _batch_token

    nonce = b"\x01" * 16
    texts = [f"shared boilerplate {i}" for i in range(64)]
    b1 = pd.DataFrame({"doc_id": np.arange(64, dtype=np.int64),
                       "text": texts})
    b2 = pd.DataFrame({"doc_id": np.arange(64, 128, dtype=np.int64),
                       "text": texts})
    h = hash64_vec(b1["text"]) & np.uint64((1 << 62) - 1)
    t1 = _batch_token(nonce, h, b1, "text")
    t2 = _batch_token(nonce, h, b2, "text")
    t1_retry = _batch_token(nonce, h, b1.copy(), "text")
    assert t1 != t2           # same texts, different batches -> different
    assert t1 == t1_retry     # a replayed block reproduces its own token


def test_streaming_dedup_identical_text_blocks_admit_once(ray_session):
    """End-to-end: a corpus whose blocks carry byte-identical text runs
    (distinct doc ids) admits each distinct text exactly once."""
    import numpy as np
    import ray.data as rd

    from ontonotes_5_parsing_ray.state.dedup_index import (
        create_index,
        index_size,
        streaming_exact_dedup,
    )

    texts = [f"boilerplate block row {i}" for i in range(1500)]
    t1 = pa.table({"doc_id": pa.array(np.arange(1500)), 
                   "text": pa.array(texts)})
    t2 = pa.table({"doc_id": pa.array(np.arange(1500, 3000)),
                   "text": pa.array(texts)})
    ds = rd.from_arrow([t1, t2])
    shards = create_index(4)
    kept = streaming_exact_dedup(ds, shards).to_pandas()
    assert len(kept) == 1500
    assert kept["text"].nunique() == 1500
    assert index_size(shards) == 1500


def test_streaming_dedup_rejects_text_only_input(ray_session):
    """A text-only dataset has no row identity for retry-stable claim
    tokens — the operator fail-stops instead of silently double-admitting
    aligned identical batches."""
    import pytest
    import ray.data as rd

    from ontonotes_5_parsing_ray.state.dedup_index import (
        create_index,
        streaming_exact_dedup,
    )

    ds = rd.from_arrow(pa.table({"text": pa.array(["a", "b", "a"])}))
    with pytest.raises(Exception, match="non-text column"):
        streaming_exact_dedup(ds, create_index(2)).count()
