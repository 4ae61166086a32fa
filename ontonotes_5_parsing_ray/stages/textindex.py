"""Partitioned on-disk inverted index over a document corpus.

The text-retrieval sibling of the LSH / IVF embedding indexes
(``stages/ann.py``): one streaming pass tokenizes the corpus into distinct
``(token, doc_id)`` postings and writes them hive-partitioned by
``hash(token) % num_buckets``. A keyword query then opens ONLY its query
tokens' bucket directories — at 100 TB a search touches
``len(query_tokens) / num_buckets`` of the postings instead of scanning the
corpus, and the pruning happens at the READ (partition directories never
opened), not as a post-read filter.

Same atomic build lifecycle as the ANN indexes: callers build into a
scratch dir and ``os.replace`` into place, with ``_META`` written last (see
``pipelines.queries._ensure_inverted_index``).
"""

from __future__ import annotations

import json
import os
from typing import List, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.hashing import partition_vec
from .relational import preagg_groupby_ds, to_arrow

__all__ = ["build_inverted_index", "search_keywords"]


def build_inverted_index(
    docs: rd.Dataset,
    out_dir: str,
    num_buckets: int = 64,
) -> str:
    """Build the bucket-partitioned postings layout under ``out_dir``.

    Per-batch: vectorized whitespace tokenize (explode), batch-local
    ``drop_duplicates`` — postings are globally distinct because a document
    is exactly one input row, so ``(token, doc_id)`` can never recur across
    batches. The bucket column is the deterministic siphash partitioner
    (``functions.hashing.partition_vec``) shared with every other shuffle
    in the engine, so a query process recomputes identical buckets.

    Layout: ``bucket=<k>/*.parquet`` + ``_META`` json (num_buckets),
    written LAST so a half-built index is never mistaken for a whole one.
    """

    def postings(b: pd.DataFrame) -> pa.Table:
        b = b.reset_index(drop=True)
        ex = b["text"].str.strip().str.split().explode().dropna()
        post = pd.DataFrame({
            "token": ex.to_numpy(dtype=object),
            "doc_id": b["doc_id"].to_numpy()[ex.index.to_numpy()],
        }).drop_duplicates()
        post["bucket"] = partition_vec(post["token"].to_numpy(), num_buckets)
        return to_arrow(post)

    os.makedirs(out_dir, exist_ok=True)
    docs.map_batches(postings, batch_format="pandas").write_parquet(
        out_dir, partition_cols=["bucket"]
    )
    with open(os.path.join(out_dir, "_META"), "w") as fh:
        json.dump({"num_buckets": num_buckets}, fh)
    return out_dir


def _bucket_files(index_dir: str, buckets: Sequence[int]) -> List[str]:
    # ray.data.read_parquet expands ONE directory but not a list of them —
    # enumerate the partition files explicitly
    files: List[str] = []
    for b in buckets:
        part_dir = os.path.join(index_dir, f"bucket={int(b)}")
        if os.path.isdir(part_dir):
            files.extend(
                os.path.join(part_dir, f)
                for f in sorted(os.listdir(part_dir))
                if f.endswith(".parquet")
            )
    return files


def search_keywords(
    index_dir: str,
    tokens: Sequence[str],
    mode: str = "and",
) -> rd.Dataset:
    """Keyword search through a :func:`build_inverted_index` layout.

    Opens only the query tokens' bucket partitions, filters the postings to
    the exact tokens, then one distributed pre-aggregated combine counts
    distinct query tokens per document (postings are distinct by
    construction). ``mode='and'`` keeps docs matching ALL tokens,
    ``'or'`` any. The result stays a Dataset — a common token can match a
    corpus-scale doc set.
    """
    if mode not in ("and", "or"):
        raise ValueError(mode)
    with open(os.path.join(index_dir, "_META")) as fh:
        meta = json.load(fh)
    toks = sorted(set(tokens))
    if not toks:
        raise ValueError("empty token list")
    buckets = np.unique(
        partition_vec(np.asarray(toks, dtype=object), meta["num_buckets"]))
    files = _bucket_files(index_dir, buckets)
    if not files:
        return rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64())}))

    postings = rd.read_parquet(files, columns=["token", "doc_id"])
    tok_set = set(toks)

    # explicit Arrow types: a zero-hit batch must not degrade to
    # null-typed columns (empty object-dtype frames lose their schema,
    # and the final to_pandas of an all-empty result would drop doc_id)
    def hits(b: pd.DataFrame) -> pa.Table:
        h = b[b["token"].isin(tok_set)]
        return pa.table({
            "doc_id": pa.Array.from_pandas(h["doc_id"]),
            "token": pa.array(h["token"].astype(str), pa.string()),
        })

    counts = preagg_groupby_ds(
        postings.map_batches(hits, batch_format="pandas"),
        ["doc_id"], {"n": ("token", "count")},
    )
    need = len(toks) if mode == "and" else 1

    def keep(b: pd.DataFrame) -> pa.Table:
        if "n" not in b.columns:  # schema-less empty block
            return pa.table({"doc_id": pa.array([], pa.int64())})
        return pa.table(
            {"doc_id": pa.Array.from_pandas(b.loc[b["n"] >= need, "doc_id"])})

    return counts.map_batches(keep, batch_format="pandas")
