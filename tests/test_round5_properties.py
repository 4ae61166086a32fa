"""Property-based tests for the round-5 kernels (hypothesis).

Pure-kernel properties run without Ray; the two Dataset-level checks use
the session fixture. These complement the example-based tests with
randomized shapes, dtypes and tie structures.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st


# ---------------------------------------------------------------------------
# NTILE arithmetic == the SQL definition, exhaustively over small totals
# ---------------------------------------------------------------------------

@given(total=st.integers(min_value=1, max_value=400),
       n_tiles=st.integers(min_value=1, max_value=12))
def test_ntile_formula_matches_sql_definition(total, n_tiles):
    """The vectorized tile formula reproduces SQL NTILE exactly: tile
    sizes differ by at most one, the first total % n tiles carry the
    extra row, and tiles are contiguous in rank order."""
    base, rem = total // n_tiles, total % n_tiles
    cut = rem * (base + 1)
    r = np.arange(1, total + 1, dtype=np.int64)
    tile = np.where(
        r <= cut,
        (r - 1) // (base + 1),
        rem + (r - 1 - cut) // max(base, 1),
    ) + 1
    # build the reference assignment the way the SQL spec words it
    sizes = [(base + 1 if i < rem else base) for i in range(n_tiles)]
    ref = np.repeat(np.arange(1, n_tiles + 1), sizes)
    assert (tile == ref).all()


# ---------------------------------------------------------------------------
# streaming-dedup claim tokens: retry-stable, batch-distinct
# ---------------------------------------------------------------------------

@given(
    n=st.integers(min_value=1, max_value=50),
    id_offset=st.integers(min_value=1, max_value=10_000),
    data=st.data(),
)
@settings(deadline=None, max_examples=50)
def test_batch_token_properties(n, id_offset, data):
    """For ANY batch: (a) a byte-identical replay reproduces the token,
    (b) shifting the id column (same texts) changes it, (c) a different
    pass nonce changes it."""
    from ontonotes_5_parsing_ray.functions.hashing import hash64_vec
    from ontonotes_5_parsing_ray.state.dedup_index import _batch_token

    texts = data.draw(st.lists(
        st.text(min_size=0, max_size=20), min_size=n, max_size=n))
    b1 = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                       "text": texts})
    b2 = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64) + id_offset,
                       "text": texts})
    h = hash64_vec(b1["text"]) & np.uint64((1 << 62) - 1)
    nonce = b"\x07" * 16
    t1 = _batch_token(nonce, h, b1, "text")
    assert t1 == _batch_token(nonce, h, b1.copy(), "text")   # retry-stable
    assert t1 != _batch_token(nonce, h, b2, "text")          # batch-distinct
    assert t1 != _batch_token(b"\x08" * 16, h, b1, "text")   # pass-scoped


# ---------------------------------------------------------------------------
# HLL md5 registers: fold == SQL rank definition, order/dedup-invariant
# ---------------------------------------------------------------------------

@given(vals=st.lists(st.integers(min_value=0, max_value=10**9),
                     min_size=1, max_size=200))
@settings(deadline=None, max_examples=50)
def test_hll_md5_fold_matches_scalar_definition(vals):
    """hll_add_hashes(hll_hashes_md5(v)) equals the scalar per-value
    definition (idx = h >> 52, rank = 53 - bit_length(h % 2^52)) and is
    invariant to duplication and order."""
    from ontonotes_5_parsing_ray.functions.hashing import token_hash64_md5
    from ontonotes_5_parsing_ray.functions.sketches import (
        HLL_M,
        hll_add_hashes,
        hll_hashes_md5,
        hll_new,
    )

    arr = np.asarray(vals, dtype=np.int64)
    regs = hll_add_hashes(hll_new(), hll_hashes_md5(arr))
    ref = np.zeros(HLL_M, dtype=np.uint8)
    for v in set(vals):
        h = token_hash64_md5(str(v))
        idx = h >> 52
        rank = 53 - (h % (1 << 52)).bit_length()
        ref[idx] = max(ref[idx], rank)
    assert (regs == ref).all()
    # duplication + reversal change nothing
    arr2 = np.concatenate([arr[::-1], arr])
    regs2 = hll_add_hashes(hll_new(), hll_hashes_md5(arr2))
    assert (regs2 == ref).all()


# ---------------------------------------------------------------------------
# CMS md5 indices: estimate never undercounts, merge == one-pass
# ---------------------------------------------------------------------------

@given(tokens=st.lists(st.sampled_from(["a", "bb", "ccc", "dd", "e", "ff"]),
                       min_size=1, max_size=300))
@settings(deadline=None, max_examples=50)
def test_cms_md5_one_sided_and_mergeable(tokens):
    from ontonotes_5_parsing_ray.functions.sketches import (
        cms_add,
        cms_merge,
        cms_new,
        cms_query,
    )

    vc = pd.Series(tokens).value_counts()
    one = cms_add(cms_new(), vc.index.to_numpy(object),
                  vc.to_numpy(), md5=True)
    half = len(tokens) // 2
    a, b = tokens[:half], tokens[half:]
    merged = cms_new()
    for part in (a, b):
        if part:
            pv = pd.Series(part).value_counts()
            merged = cms_merge(merged, cms_add(
                cms_new(), pv.index.to_numpy(object),
                pv.to_numpy(), md5=True))
    assert (merged == one).all()
    est = cms_query(one, vc.index.to_numpy(object), md5=True)
    assert (est >= vc.to_numpy()).all()


# ---------------------------------------------------------------------------
# Dataset-level: global_row_number over randomized shapes (string keys too)
# ---------------------------------------------------------------------------

def test_global_row_number_string_keys_and_single_block(ray_session):
    import ray.data as rd

    from ontonotes_5_parsing_ray.stages.relational import global_row_number

    rng = np.random.RandomState(9)
    df = pd.DataFrame({
        "name": ["w" + str(i % 37) for i in range(500)],
        "uid": np.arange(500, dtype=np.int64),
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = global_row_number(ds, by=["name", "uid"], out_col="rn") \
        .to_pandas().sort_values("rn").reset_index(drop=True)
    want = df.sort_values(["name", "uid"], kind="mergesort") \
        .reset_index(drop=True)
    assert (got["uid"].to_numpy() == want["uid"].to_numpy()).all()
    assert got["rn"].tolist() == list(range(1, 501))


def test_grouped_quantiles_ds_string_keys(ray_session):
    import ray.data as rd

    from ontonotes_5_parsing_ray.stages.relational import (
        grouped_quantiles,
        grouped_quantiles_ds,
    )

    rng = np.random.RandomState(13)
    df = pd.DataFrame({
        "k": rng.choice(["alpha", "beta", "gamma"], size=3000),
        "v": rng.randn(3000),
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(6)
    want = grouped_quantiles(ds, "k", "v", qs=(0.5,), col_names=["m"],
                             key_driver_limit=0)
    got = grouped_quantiles_ds(ds, "k", "v", qs=(0.5,), col_names=["m"]) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, want.sort_values("k").reset_index(drop=True),
        check_exact=False, rtol=0, atol=1e-12)
