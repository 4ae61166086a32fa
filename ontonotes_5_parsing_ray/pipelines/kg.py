"""The flagship pipeline: transcripts -> knowledge graph (nodes + edges).

Ray-Data-first composition (SURVEY.md §3.4):

    read_parquet (pruned columns)
      -> map_batches(AnnotateTurns)               [actor pool, Arrow batches]
      -> groupby(hash(conv) % P).map_groups      [stable turn order + coref]
      -> canonicalization (MinHash/LSH + min-label components)
      -> broadcast canon map -> rewrite triples   [map_batches]
      -> groupby aggregates -> nodes / edges
      -> write_parquet partitioned + lineage markers

Scale notes
-----------
* The only whole-conversation shuffle is the linking groupby — inherent to
  coref semantics. Everything upstream is embarrassingly block-parallel.
* Canonicalization shuffles *distinct surfaces*, not mentions (map-side
  distinct first), then broadcasts the resulting map back (``ray.put`` once,
  read per actor) — no second all-to-all over the mention table.
* Nothing materializes the full input; intermediates that are materialized
  (canon map, distinct surfaces) are O(|entity vocabulary|), not O(turns).
"""

from __future__ import annotations

import json
from typing import Dict, Optional

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions.canon import DEFAULT_THRESHOLD, canonical_entity_id
from ..functions.kgrules import normalize_surface
from ..stages.annotate import AnnotateTurns
from ..stages.canonicalize import build_canon_map, canon_map_to_dict
from ..stages.util import pool_size

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "ts"]
REQUIRED_TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text"]


def _transcript_schema_names(path: str) -> set:
    import pyarrow.parquet as pq

    try:
        return set(pq.ParquetDataset(path).schema.names)
    except Exception:
        # fall back to letting read_parquet surface the real error
        return set(TRANSCRIPT_COLUMNS)


def read_transcripts(path: str) -> rd.Dataset:
    """Column-pruned read: ``tool`` never leaves storage (SURVEY.md 'prune
    at the read'); ``ts`` rides along as node provenance when present
    (``first_seen_ts``, reference ``ontonotes5_to_json.py:110-111``'s
    per-record metadata analogue). ``ts`` (and ``lang``) are OPTIONAL: the
    column list is intersected with the file schema so a ts-less transcript
    parquet reads cleanly and ``_prov_columns`` fills ``ts = -1``.

    JSONL / CSV inputs dispatch by extension to ``sources.formats`` (Ray's
    native readers + schema normalization) so every downstream stage is
    format-agnostic."""
    lower = path.lower()
    if lower.endswith((".jsonl", ".json")):
        from ..sources.formats import read_transcripts_jsonl

        return read_transcripts_jsonl(path)
    if lower.endswith(".csv"):
        from ..sources.formats import read_transcripts_csv

        return read_transcripts_csv(path)
    names = _transcript_schema_names(path)
    missing = [c for c in REQUIRED_TRANSCRIPT_COLUMNS if c not in names]
    if missing:
        raise ValueError(
            f"transcripts at {path} lack required column(s) {missing}; "
            f"need {REQUIRED_TRANSCRIPT_COLUMNS} (ts optional)"
        )
    cols = [c for c in TRANSCRIPT_COLUMNS if c in names]
    return rd.read_parquet(path, columns=cols)


LINK_COLUMNS = ["conv_id", "turn_idx", "ok", "link_json", "error", "ts", "lang"]


def _prov_columns(batch: pa.Table) -> pa.Table:
    """Normalize provenance: ``ts`` -> int64 epoch-µs (resolution-explicit),
    ``lang`` -> string; inputs lacking either get -1 / "" so every link path
    sees one schema. Timestamp-typed ``ts`` is cast THROUGH timestamp('us')
    first — a bare int64 cast keeps the source unit, so pandas-default ns
    parquet would yield epoch-ns (1000x the documented µs). Nulls become -1
    (the missing-provenance sentinel) instead of NaN."""
    n = len(batch)
    names = set(batch.column_names)
    if "ts" in names:
        col = batch.column("ts")
        if pa.types.is_timestamp(col.type):
            col = pc.cast(col, pa.timestamp("us"))
        ts = pc.fill_null(pc.cast(col, pa.int64()), -1)
    else:
        ts = pa.array([-1] * n, pa.int64())
    lang = (batch.column("lang") if "lang" in names
            else pa.array([""] * n, pa.string()))
    return pa.table({
        "conv_id": batch.column("conv_id"),
        "turn_idx": batch.column("turn_idx"),
        "ok": batch.column("ok"),
        "link_json": batch.column("link_json"),
        "error": batch.column("error"),
        "ts": ts,
        "lang": lang,
    })


def annotate(
    ds: rd.Dataset,
    concurrency: Optional[int] = None,
    emit: str = "record",
) -> rd.Dataset:
    return ds.map_batches(
        AnnotateTurns,
        fn_constructor_kwargs={"emit": emit},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=pool_size(concurrency or 4),
        num_cpus=1,
    )


LINK_PARTITIONS = 64


def link(annotated: rd.Dataset, num_partitions: int = LINK_PARTITIONS) -> rd.Dataset:
    """One grouping pass produces mentions + triples + the error channel.

    Only the compact ``link_json`` payload crosses the shuffle, and the
    shuffle key is ``hash(conv_id) % P`` — every conversation still lands
    whole (coref locality) but the corpus forms ``P`` bounded groups, not
    one pandas group per conversation (billions at 100 TB). The per-conv
    kernel runs inside :func:`link_partition_group`."""
    from ..functions.hashing import partition_vec
    from ..stages.link import link_partition_group

    turns = annotated.map_batches(_prov_columns, batch_format="pyarrow")
    with_part = turns.map_batches(
        lambda t: t.append_column("part", pa.array(
            partition_vec(t.column("conv_id").to_numpy(zero_copy_only=False),
                          num_partitions), pa.int32())),
        batch_format="pyarrow",
    )
    return with_part.groupby("part").map_groups(
        lambda g: link_partition_group(g.drop(columns=["part"])),
        batch_format="pandas",
    )


# Resolution-row count above which phase C of the salted linker switches
# from the broadcast-dict fast path to the co-partitioned groupby route
# (resolutions are O(entity vocabulary + leading pronouns) — tiny relative
# to mentions, but unbounded in principle).
RESOLUTION_BROADCAST_LIMIT = 2_000_000


def link_salted(
    annotated: rd.Dataset,
    bucket_size: int = 512,
    resolution_broadcast_limit: int = RESOLUTION_BROADCAST_LIMIT,
) -> rd.Dataset:
    """Skew-safe linking: the salted-key two-phase variant (north_rule).

    Phase A groups by the salted key ``(conv_id, turn_idx // bucket_size)``
    so no group ever exceeds ``bucket_size`` turns — a 10^7-turn conversation
    becomes 20k bounded groups instead of one giant one. Phase B reduces the
    per-bucket *summaries only* (tiny) per conv_id. Phase C applies the
    resolutions. Output is identical to :func:`link` (asserted by tests on
    skewed data).

    Phase C auto-routes on resolution count: at or below
    ``resolution_broadcast_limit`` the resolutions become driver dicts
    broadcast via ``ray.put`` (fast path); above it nothing touches the
    driver — bulk rows and resolution rows are CO-PARTITIONED by
    ``hash(conv_id) % P`` in one groupby and the identical finalize kernel
    runs per partition with partition-local dicts (one more bounded
    exchange, same semantics, tested equal).
    """
    import pyarrow.compute as pc

    from ..stages.link import finalize_bulk_rows, resolve_conv_group

    import numpy as np

    from ..functions.hashing import hash64_vec
    from ..stages.link import link_bucket_partition

    def add_bucket_part(t: pa.Table) -> pa.Table:
        bucket = pc.cast(pc.floor(pc.divide(
            pc.cast(t.column("turn_idx"), pa.float64()),
            float(bucket_size))), pa.int64())
        # salted key = mix(hash(conv), bucket): vectorized, no per-row
        # f-string/hash call; any deterministic mix spreads hot convs
        conv_h = hash64_vec(t.column("conv_id").to_numpy(zero_copy_only=False))
        b_np = bucket.to_numpy(zero_copy_only=False).astype(np.uint64)
        mixed = conv_h ^ (b_np * np.uint64(0x9E3779B97F4A7C15))
        part = pa.array((mixed % np.uint64(LINK_PARTITIONS)).astype(np.int32),
                        pa.int32())
        return t.append_column("bucket", bucket).append_column("part", part)

    turns = annotated.map_batches(
        _prov_columns, batch_format="pyarrow"
    ).map_batches(add_bucket_part, batch_format="pyarrow")
    # hash((conv, bucket)) partitions: a 10^7-turn conversation's buckets
    # SPREAD across partitions (the salting goal) while each (conv, bucket)
    # group stays whole; P bounded pandas groups, not one per bucket.
    bulk = turns.groupby("part").map_groups(
        lambda g: link_bucket_partition(g.drop(columns=["part"])),
        batch_format="pandas",
    ).materialize()

    from ..stages.link import resolve_conv_partition

    from ..functions.hashing import partition_vec

    def summary_rows(t: pa.Table) -> pa.Table:
        s = t.filter(pc.equal(t.column("row_kind"), "summary")).select(
            ["conv_id", "bucket", "summary_json"])
        return s.append_column("rpart", pa.array(
            partition_vec(s.column("conv_id").to_numpy(zero_copy_only=False),
                          LINK_PARTITIONS), pa.int32()))

    summaries = bulk.map_batches(summary_rows, batch_format="pyarrow")
    resolutions_ds = summaries.groupby("rpart").map_groups(
        lambda g: resolve_conv_partition(g.drop(columns=["rpart"])),
        batch_format="pandas",
    ).materialize()

    if resolutions_ds.count() <= resolution_broadcast_limit:
        from ..stages.link import resolution_dicts

        chain_maps, pendings = resolution_dicts(resolutions_ds.to_pandas())
        chains_ref = ray.put(chain_maps)
        pendings_ref = ray.put(pendings)

        def finalize(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch[batch["row_kind"] != "summary"]
            return finalize_bulk_rows(
                batch, ray.get(chains_ref), ray.get(pendings_ref))

        return bulk.map_batches(finalize, batch_format="pandas")

    # Co-partitioned phase C: align both streams on one superset schema
    # (resolution rows ride as row_kind='resolution'), hash(conv) % P, one
    # grouping pass applies the shared finalize kernel per partition.
    from ..stages.link import (
        BULK_COLUMNS,
        _BULK_EMPTY,
        finalize_partition_group,
    )

    EXTRA = ["kind", "key", "chain_id"]

    def bulk_superset(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(pc.equal(t.column("row_kind"), "summary")))
        n = len(t)
        t = (t.append_column("kind", pa.array([""] * n, pa.string()))
              .append_column("key", pa.array([""] * n, pa.string()))
              .append_column("chain_id", pa.array([-1] * n, pa.int64())))
        part = pa.array(
            partition_vec(t.column("conv_id").to_numpy(zero_copy_only=False),
                          LINK_PARTITIONS), pa.int32())
        return t.select(BULK_COLUMNS + EXTRA).append_column("part", part)

    def _superset_type(c: str) -> pa.DataType:
        v = _BULK_EMPTY.get(c, "")
        if isinstance(v, bool):
            return pa.bool_()
        return pa.int64() if isinstance(v, int) else pa.string()

    def res_superset(batch: pd.DataFrame) -> pa.Table:
        # explicit per-column Arrow types: an EMPTY resolution batch must
        # not degrade to null-typed columns (the union with bulk_superset's
        # typed schema would fail at runtime on the join route)
        n = len(batch)
        data = {}
        for c in BULK_COLUMNS:
            if c == "row_kind":
                data[c] = pa.array(["resolution"] * n, pa.string())
            elif c in ("conv_id", "surface", "norm", "entity_type"):
                data[c] = pa.array(batch[c].astype(str), pa.string())
            elif c == "bucket":
                data[c] = pa.array([-1] * n, pa.int64())
            else:
                data[c] = pa.array([_BULK_EMPTY[c]] * n, _superset_type(c))
        data["kind"] = pa.array(batch["kind"].astype(str), pa.string())
        data["key"] = pa.array(batch["key"].astype(str), pa.string())
        data["chain_id"] = pa.array(
            batch["chain_id"].astype("int64").to_numpy(), pa.int64())
        data["part"] = pa.array(
            partition_vec(batch["conv_id"], LINK_PARTITIONS), pa.int32())
        return pa.table(data)

    merged = bulk.map_batches(bulk_superset, batch_format="pyarrow").union(
        resolutions_ds.map_batches(res_superset, batch_format="pandas")
    )
    return merged.groupby("part").map_groups(
        lambda g: finalize_partition_group(g.drop(columns=["part"])),
        batch_format="pandas",
    )


def split_linked(linked: rd.Dataset):
    """Vectorized split of the union table into mentions / raw triples."""
    import pyarrow.compute as pc

    mentions = linked.map_batches(
        lambda t: t.filter(pc.equal(t.column("row_kind"), "mention")).select(
            ["conv_id", "turn_idx", "start", "end", "surface",
             "entity_type", "is_pronoun", "chain_id", "antecedent",
             "ts", "lang"]
        ),
        batch_format="pyarrow",
    )
    triples = linked.map_batches(
        lambda t: t.filter(pc.equal(t.column("row_kind"), "triple")).select(
            ["conv_id", "turn_idx", "pred", "subj", "obj",
             "subj_type", "obj_type"]
        ),
        batch_format="pyarrow",
    )
    return mentions, triples


def surfaces_for_canon(mentions: rd.Dataset, triples: rd.Dataset) -> rd.Dataset:
    import pyarrow.compute as pc

    def mention_norms(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(t.column("is_pronoun")))
        return pa.table({
            "norm": pa.array(
                sorted({normalize_surface(s) for s in t.column("surface").to_pylist()}),
                pa.string(),
            )
        })

    def triple_norms(t: pa.Table) -> pa.Table:
        norms = {normalize_surface(s) for s in t.column("subj").to_pylist()}
        norms |= {normalize_surface(o) for o in t.column("obj").to_pylist()}
        return pa.table({"norm": pa.array(sorted(norms), pa.string())})

    return mentions.map_batches(mention_norms, batch_format="pyarrow").union(
        triples.map_batches(triple_norms, batch_format="pyarrow")
    )


def canonicalize_triples(
    triples: rd.Dataset, canon_ref: "ray.ObjectRef"
) -> rd.Dataset:
    """Rewrite subj/obj to canonical surfaces + ids via the broadcast map."""

    def rewrite(batch: pa.Table) -> pa.Table:
        canon: Dict[str, str] = ray.get(canon_ref)
        subj = batch.column("subj").to_pylist()
        obj = batch.column("obj").to_pylist()
        subj_canon = [canon.get(normalize_surface(s), normalize_surface(s)) for s in subj]
        obj_canon = [canon.get(normalize_surface(o), normalize_surface(o)) for o in obj]
        return (
            batch
            .append_column("subj_canon", pa.array(subj_canon, pa.string()))
            .append_column("obj_canon", pa.array(obj_canon, pa.string()))
            .append_column("subj_id", pa.array(
                [canonical_entity_id(c) for c in subj_canon], pa.string()))
            .append_column("obj_id", pa.array(
                [canonical_entity_id(c) for c in obj_canon], pa.string()))
        )

    return triples.map_batches(rewrite, batch_format="pyarrow")


def canonicalize_triples_join(
    triples: rd.Dataset, canon_map: rd.Dataset, num_partitions: int = None
) -> rd.Dataset:
    """The too-big-to-broadcast twin of :func:`canonicalize_triples`: the
    canon map stays a Dataset and each of subj/obj is resolved with a
    hash-partitioned LEFT join on the normalized surface (missing norms keep
    themselves, as in the broadcast dict's ``.get`` default). Two bounded
    exchanges instead of one driver-held dict — same output, tested equal.
    """
    from ..stages.relational import hash_join

    def add_norms(batch: pa.Table) -> pa.Table:
        subj_n = [normalize_surface(s) for s in batch.column("subj").to_pylist()]
        obj_n = [normalize_surface(o) for o in batch.column("obj").to_pylist()]
        return (batch
                .append_column("subj_norm", pa.array(subj_n, pa.string()))
                .append_column("obj_norm", pa.array(obj_n, pa.string())))

    with_norms = triples.map_batches(add_norms, batch_format="pyarrow")

    subj_map = canon_map.map_batches(
        lambda t: t.rename_columns(["subj_norm", "subj_canon_j"]),
        batch_format="pyarrow")
    joined = hash_join(with_norms, subj_map, on=["subj_norm"],
                       join_type="left_outer", num_partitions=num_partitions)
    obj_map = canon_map.map_batches(
        lambda t: t.rename_columns(["obj_norm", "obj_canon_j"]),
        batch_format="pyarrow")
    joined = hash_join(joined, obj_map, on=["obj_norm"],
                       join_type="left_outer", num_partitions=num_partitions)

    def finish(batch: pa.Table) -> pa.Table:
        subj_canon = [
            c if c is not None else n
            for c, n in zip(batch.column("subj_canon_j").to_pylist(),
                            batch.column("subj_norm").to_pylist())
        ]
        obj_canon = [
            c if c is not None else n
            for c, n in zip(batch.column("obj_canon_j").to_pylist(),
                            batch.column("obj_norm").to_pylist())
        ]
        out = batch.drop_columns(
            ["subj_norm", "obj_norm", "subj_canon_j", "obj_canon_j"])
        return (out
                .append_column("subj_canon", pa.array(subj_canon, pa.string()))
                .append_column("obj_canon", pa.array(obj_canon, pa.string()))
                .append_column("subj_id", pa.array(
                    [canonical_entity_id(c) for c in subj_canon], pa.string()))
                .append_column("obj_id", pa.array(
                    [canonical_entity_id(c) for c in obj_canon], pa.string())))

    return joined.map_batches(finish, batch_format="pyarrow")


def _mentions_with_canonical_broadcast(
    mentions: rd.Dataset, canon_ref: "ray.ObjectRef"
) -> rd.Dataset:
    """Non-pronoun mentions + ``canonical_surface`` via the broadcast map."""

    def add_canonical(batch: pa.Table) -> pa.Table:
        canon: Dict[str, str] = ray.get(canon_ref)
        t = batch.filter(pc.invert(batch.column("is_pronoun")))
        t = t.select(["conv_id", "turn_idx", "surface", "entity_type",
                      "ts", "lang"])
        canonical = [canon.get(normalize_surface(s), normalize_surface(s))
                     for s in t.column("surface").to_pylist()]
        return t.append_column(
            "canonical_surface", pa.array(canonical, pa.string()))

    return mentions.map_batches(add_canonical, batch_format="pyarrow")


def _mentions_with_canonical_join(
    mentions: rd.Dataset, canon_map: rd.Dataset,
    num_partitions: Optional[int] = None,
) -> rd.Dataset:
    """The too-big-to-broadcast twin: resolve ``canonical_surface`` with a
    hash-partitioned LEFT join on the normalized surface (missing norms keep
    themselves — the broadcast dict's ``.get`` default)."""
    from ..stages.relational import hash_join

    def add_norm(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.invert(batch.column("is_pronoun")))
        t = t.select(["conv_id", "turn_idx", "surface", "entity_type",
                      "ts", "lang"])
        norms = [normalize_surface(s) for s in t.column("surface").to_pylist()]
        return t.append_column("norm", pa.array(norms, pa.string()))

    joined = hash_join(
        mentions.map_batches(add_norm, batch_format="pyarrow"),
        canon_map, on=["norm"], join_type="left_outer",
        num_partitions=num_partitions,
    )

    def finish(batch: pa.Table) -> pa.Table:
        canonical = [
            c if c is not None else n
            for c, n in zip(batch.column("canon").to_pylist(),
                            batch.column("norm").to_pylist())
        ]
        return batch.drop_columns(["norm", "canon"]).append_column(
            "canonical_surface", pa.array(canonical, pa.string()))

    return joined.map_batches(finish, batch_format="pyarrow")


def build_nodes(mentions: rd.Dataset, canon_ref: "ray.ObjectRef",
                driver_combine_limit: int = 200_000) -> rd.Dataset:
    """Node table via partial aggregation: per-batch partials keyed by
    canonical surface, then one small groupby-combine (pre-aggregate before
    the shuffle, SURVEY.md 'push aggregation partial')."""
    return _nodes_from_canonical(
        _mentions_with_canonical_broadcast(mentions, canon_ref),
        driver_combine_limit=driver_combine_limit)


def build_nodes_join(
    mentions: rd.Dataset, canon_map: rd.Dataset,
    num_partitions: Optional[int] = None,
    driver_combine_limit: int = 200_000,
) -> rd.Dataset:
    """Join-route node table (canon map stays a Dataset; same output as
    :func:`build_nodes`, tested equal)."""
    return _nodes_from_canonical(
        _mentions_with_canonical_join(mentions, canon_map, num_partitions),
        driver_combine_limit=driver_combine_limit)


# Per-node surface_forms list cap: top-N by mention count. A pronoun-like
# surface slipping through canonicalization could otherwise accrete an
# unbounded (multi-GB at 100x) JSON row.
SURFACE_FORMS_CAP = 32


def _nodes_from_canonical(mentions_canonical: rd.Dataset,
                          driver_combine_limit: int = 200_000) -> rd.Dataset:
    """Shared tail of the node build: per-batch partials over batches that
    already carry ``canonical_surface``, then the hash-bucketed combine."""

    def partials(batch: pa.Table) -> pd.DataFrame:
        df = batch.select(
            ["canonical_surface", "conv_id", "turn_idx", "surface",
             "entity_type", "ts", "lang"]
        ).to_pandas()
        if not len(df):
            # dtype-stable empty frame: schemaless empty blocks confuse the
            # streaming executor's schema unification
            return pd.DataFrame({
                "canonical_surface": pd.Series(dtype=object),
                "surface": pd.Series(dtype=object),
                "entity_type": pd.Series(dtype=object),
                "n": pd.Series(dtype="int64"),
                "first_conv_id": pd.Series(dtype=object),
                "first_turn_idx": pd.Series(dtype="int64"),
                "first_seen_ts": pd.Series(dtype="int64"),
                "lang": pd.Series(dtype=object),
            })
        grp = df.groupby(
            ["canonical_surface", "surface", "entity_type"], sort=True
        ).agg(
            n=("conv_id", "size"),
        ).reset_index()
        # provenance = the (min conv, min turn) mention's row (deterministic)
        firsts = df.sort_values(["conv_id", "turn_idx"]).groupby(
            ["canonical_surface", "surface", "entity_type"], sort=True
        ).head(1)[["canonical_surface", "surface", "entity_type",
                   "conv_id", "turn_idx", "ts", "lang"]]
        firsts = firsts.rename(columns={
            "conv_id": "first_conv_id", "turn_idx": "first_turn_idx",
            "ts": "first_seen_ts"})
        out = grp.merge(
            firsts, on=["canonical_surface", "surface", "entity_type"]
        )
        return out

    def combine_partition(group: pd.DataFrame) -> pa.Table:
        """Vectorized combine of ONE hash partition of partial rows: inner
        pandas groupbys handle every canonical surface in the partition at
        once — never one UDF call per entity (entity vocabulary is corpus-
        scale; per-group map_groups was the exact_dedup anti-pattern)."""
        df = group.drop(columns=["part"], errors="ignore")
        # majority entity type, ties by name: sort by (-count, type), head(1)
        tc = df.groupby(["canonical_surface", "entity_type"], sort=False)["n"] \
               .sum().reset_index()
        tc = tc.sort_values(["canonical_surface", "n", "entity_type"],
                            ascending=[True, False, True], kind="mergesort")
        best_type = tc.drop_duplicates("canonical_surface") \
                      .set_index("canonical_surface")["entity_type"]
        firsts = df.sort_values(
            ["canonical_surface", "first_conv_id", "first_turn_idx"],
            kind="mergesort",
        ).drop_duplicates("canonical_surface").set_index("canonical_surface")
        # surface_forms is CAPPED at the top-N forms by mention count
        # (ties lexicographic): one mega-entity must not grow a multi-GB
        # row; n_surface_forms keeps the true distinct total
        sc = df.groupby(["canonical_surface", "surface"], sort=False)["n"] \
               .sum().reset_index()
        sc = sc.sort_values(["canonical_surface", "n", "surface"],
                            ascending=[True, False, True], kind="mergesort")
        n_forms = sc.groupby("canonical_surface", sort=True)["surface"].size()
        kept = sc.groupby("canonical_surface", sort=False) \
                 .head(SURFACE_FORMS_CAP)
        surface_forms = kept.groupby("canonical_surface", sort=True)["surface"] \
            .agg(lambda s: json.dumps(list(s), ensure_ascii=False))
        n_mentions = df.groupby("canonical_surface", sort=True)["n"].sum()
        out = pd.DataFrame({
            "canonical_surface": n_mentions.index,
            "entity_type": best_type.reindex(n_mentions.index).to_numpy(),
            "surface_forms": surface_forms.reindex(n_mentions.index).to_numpy(),
            "n_surface_forms": n_forms.reindex(n_mentions.index).to_numpy().astype("int64"),
            "n_mentions": n_mentions.to_numpy().astype("int64"),
            "first_conv_id": firsts["first_conv_id"].reindex(n_mentions.index).to_numpy(),
            "first_turn_idx": firsts["first_turn_idx"].reindex(n_mentions.index).to_numpy().astype("int64"),
            "first_seen_ts": firsts["first_seen_ts"].reindex(n_mentions.index).to_numpy().astype("int64"),
            "lang": firsts["lang"].reindex(n_mentions.index).to_numpy(),
        })
        out.insert(0, "canonical_id",
                   [canonical_entity_id(c) for c in out["canonical_surface"]])
        return pa.Table.from_pandas(out, preserve_index=False)

    NODE_PARTITIONS = 64

    def add_part(batch: pd.DataFrame) -> pa.Table:
        from ..functions.hashing import partition_vec

        batch = batch.copy()
        batch["part"] = partition_vec(batch["canonical_surface"],
                                      NODE_PARTITIONS)
        return pa.Table.from_pandas(batch, preserve_index=False)

    parts = mentions_canonical.map_batches(
        lambda t: pa.Table.from_pandas(partials(t), preserve_index=False),
        batch_format="pyarrow",
    ).materialize()  # pin partials; reused by whichever combine route runs
    # Vocabulary-sized partials combine on the driver with ONE call of the
    # same vectorized kernel — a 64-partition sort shuffle for a few
    # hundred entities is pure fixed cost that dilutes the parallel
    # fraction (measured in the 4-vs-16-CPU scaling ratio). Corpus-scale
    # vocabularies keep the hash-bucketed distributed combine.
    if 0 < parts.count() <= driver_combine_limit:
        return rd.from_arrow(combine_partition(parts.to_pandas()))
    return (
        parts
        .map_batches(add_part, batch_format="pandas")
        .groupby("part")
        .map_groups(combine_partition, batch_format="pandas")
    )


def build_edges(canon_triples: rd.Dataset,
                driver_combine_limit: int = 200_000) -> rd.Dataset:
    """Exact-dedup edges: partial per-batch counts then a grouped combine —
    the D2 analogue (``groupby((subj,pred,obj)).first``) with map-side
    pre-aggregation."""

    def partials(batch: pa.Table) -> pd.DataFrame:
        df = batch.select(
            ["subj_id", "pred", "obj_id", "subj_canon", "obj_canon", "conv_id"]
        ).to_pandas()
        if not len(df):
            return pd.DataFrame({
                "subj_id": pd.Series(dtype=object),
                "pred": pd.Series(dtype=object),
                "obj_id": pd.Series(dtype=object),
                "subj_canon": pd.Series(dtype=object),
                "obj_canon": pd.Series(dtype=object),
                "n": pd.Series(dtype="int64"),
                "first_conv_id": pd.Series(dtype=object),
            })
        return df.groupby(
            ["subj_id", "pred", "obj_id", "subj_canon", "obj_canon"], sort=True
        ).agg(n=("conv_id", "size"), first_conv_id=("conv_id", "min")).reset_index()

    from ray.data.aggregate import Min as RMin, Sum as RSum

    # Native aggregate combine: distinct-edge cardinality is corpus-scale,
    # so no per-edge UDF. subj_canon/obj_canon are functions of the ids and
    # ride in the group key.
    parts = canon_triples.map_batches(
        lambda t: pa.Table.from_pandas(partials(t), preserve_index=False),
        batch_format="pyarrow",
    ).materialize()  # pin pre-agg partials before the shuffle
    # Edge vocabularies below the driver budget combine with one pandas
    # groupby — the native Aggregate's shuffle is pure fixed cost there
    # (same routing rationale as the node combine); corpus-scale edge sets
    # keep the distributed aggregate.
    if 0 < parts.count() <= driver_combine_limit:
        out = parts.to_pandas().groupby(
            ["subj_id", "pred", "obj_id", "subj_canon", "obj_canon"],
            sort=True,
        ).agg(n_occurrences=("n", "sum"),
              first_conv_id=("first_conv_id", "min")).reset_index()
        return rd.from_arrow(pa.Table.from_pandas(out, preserve_index=False))
    return parts.groupby(
        ["subj_id", "pred", "obj_id", "subj_canon", "obj_canon"]
    ).aggregate(
        RSum("n", alias_name="n_occurrences"),
        RMin("first_conv_id", alias_name="first_conv_id"),
    )


def run_kg_pipeline(
    transcript_path: str,
    canon_threshold: float = DEFAULT_THRESHOLD,
    concurrency: Optional[int] = None,
    salted_bucket_size: Optional[int] = None,
    canon_driver_limit: Optional[int] = None,
    canon_broadcast_limit: Optional[int] = None,
) -> Dict[str, rd.Dataset]:
    """Build the KG in memory; returns the component Datasets.

    The linked union table is materialized once (it is O(mentions+triples),
    far smaller than the input) so mentions/triples/canon all derive from it
    without re-running annotation.

    Canon application auto-routes on map size: at or below
    ``canon_broadcast_limit`` (default ``canonicalize.BROADCAST_LIMIT``) the
    map broadcasts as a dict; above it the already-tested hash-partitioned
    join twins (:func:`canonicalize_triples_join`, :func:`build_nodes_join`)
    take over — the pipeline never fail-stops on map size and the driver
    never holds an over-limit map.
    """
    from ..stages.canonicalize import BROADCAST_LIMIT

    ds = read_transcripts(transcript_path)
    annotated = annotate(ds, concurrency=concurrency, emit="link")
    if salted_bucket_size:
        linked = link_salted(annotated, bucket_size=salted_bucket_size).materialize()
    else:
        linked = link(annotated).materialize()
    mentions, triples = split_linked(linked)
    canon_kwargs = ({} if canon_driver_limit is None
                    else {"driver_limit": canon_driver_limit})
    canon_map = build_canon_map(
        surfaces_for_canon(mentions, triples), threshold=canon_threshold,
        **canon_kwargs,
    ).materialize()
    limit = (BROADCAST_LIMIT if canon_broadcast_limit is None
             else canon_broadcast_limit)
    if canon_map.count() <= limit:
        canon_ref = ray.put(canon_map_to_dict(canon_map, limit=limit))
        canon_triples = canonicalize_triples(triples, canon_ref)
        nodes = build_nodes(mentions, canon_ref)
    else:
        canon_triples = canonicalize_triples_join(triples, canon_map)
        nodes = build_nodes_join(mentions, canon_map)
    edges = build_edges(canon_triples)
    errors = linked.map_batches(
        lambda t: t.filter(pc.equal(t.column("row_kind"), "error")).select(
            ["conv_id", "turn_idx", "error"]
        ),
        batch_format="pyarrow",
    )
    return {
        "mentions": mentions,
        "triples": canon_triples,
        "nodes": nodes,
        "edges": edges,
        "errors": errors,
    }
