"""Split routing (J1/K2/D1/S4) and validated load (S5)."""

import os

import pandas as pd
import pyarrow as pa
import pytest


def test_split_lists_disjoint_check():
    from ontonotes_5_parsing_ray.pipelines.splits import check_split_lists_disjoint

    check_split_lists_disjoint({"train": ["a"], "test": ["b"]})
    with pytest.raises(ValueError):
        check_split_lists_disjoint({"train": ["a", "b"], "test": ["b"]})


def test_assign_and_write_splits(ray_session, tiny_transcripts, tmp_path):
    import ray.data as rd

    from ontonotes_5_parsing_ray.pipelines.kg import read_transcripts
    from ontonotes_5_parsing_ray.pipelines.splits import (
        assign_splits,
        split_counts,
        write_split_dataset,
    )

    ds = read_transcripts(tiny_transcripts)
    explicit = {"train": ["conv000000"], "validation": [], "test": ["conv000001"]}
    with_split = assign_splits(ds, id_lists=explicit).materialize()

    df = with_split.to_pandas()
    assert set(df[df["conv_id"] == "conv000000"]["split"]) == {"train"}
    assert set(df[df["conv_id"] == "conv000001"]["split"]) == {"test"}
    # hash fallback covers the rest, all three splits populated, and every
    # conversation lands wholly in ONE split
    per_conv = df.groupby("conv_id")["split"].nunique()
    assert (per_conv == 1).all()
    counts = split_counts(with_split)
    assert set(counts["split"]) == {"train", "validation", "test"}
    assert counts["n_rows"].sum() == len(df)

    # seeded shuffle is deterministic: same seed -> same row order
    out = write_split_dataset(with_split, str(tmp_path), seed=7)
    t1 = rd.read_parquet(out["train"]).to_pandas()
    out2 = write_split_dataset(with_split, str(tmp_path / "again"), seed=7)
    t2 = rd.read_parquet(out2["train"]).to_pandas()
    assert t1["conv_id"].tolist() == t2["conv_id"].tolist()
    assert t1["turn_idx"].tolist() == t2["turn_idx"].tolist()


def test_validated_load_catches_violations(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data as rd

    from ontonotes_5_parsing_ray.pipelines.splits import load_annotations_validated

    table = pa.table({
        "conv_id": pa.array(["c1"] * 4, pa.string()),
        "turn_idx": pa.array([0, 0, 0, 1], pa.int32()),
        "kind": pa.array(["entities"] * 4, pa.string()),
        "tag": pa.array(["ORG"] * 4, pa.string()),
        "start": pa.array([0, 3, 8, -2], pa.int32()),
        "end": pa.array([4, 7, 8, 1], pa.int32()),   # ok, overlaps, empty, negative
    })
    path = str(tmp_path / "ann.parquet")
    pq.write_table(table, path)
    _ann, violations = load_annotations_validated(path)
    errs = violations.to_pandas()
    msgs = " | ".join(errs["error"])
    assert "empty or inverted" in msgs
    assert "< 0" in msgs

    # overlap detection is per batch (boundary caveat documented): check the
    # batch kernel directly with all rows of one group together
    from ontonotes_5_parsing_ray.pipelines.splits import validate_annotation_batch

    kernel_errs = validate_annotation_batch(table.to_pandas())
    assert any("overlapping" in e for e in kernel_errs["error"])


def test_parse_splitting_manifests(ray_session, tmp_path):
    """S6/S7: on-disk .id manifests route identically to explicit lists."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from ontonotes_5_parsing_ray.pipelines.splits import (
        assign_splits,
        assign_splits_from_dir,
        load_identifiers,
        parse_splitting,
    )

    root = tmp_path / "splitting" / "corpus_a" / "all"
    root.mkdir(parents=True)
    (root / "train.id").write_text("c0\nc1\n\n  c2  \n")
    (root / "development.id").write_text("c3\n")
    (root / "test.id").write_text("c4\n")
    root_b = tmp_path / "splitting" / "corpus_b" / "all"
    root_b.mkdir(parents=True)
    (root_b / "train.id").write_text("c5\n")
    (root_b / "development.id").write_text("c6\n")
    (root_b / "test.id").write_text("c7\n")

    lists = parse_splitting(str(tmp_path / "splitting"))
    assert lists == {"train": ["c0", "c1", "c2", "c5"],
                     "validation": ["c3", "c6"], "test": ["c4", "c7"]}

    ds = rd.from_arrow(pa.table({
        "conv_id": pa.array([f"c{i}" for i in range(8)], pa.string()),
    }))
    via_dir = assign_splits_from_dir(ds, str(tmp_path / "splitting")) \
        .to_pandas().sort_values("conv_id")
    via_lists = assign_splits(ds, lists).to_pandas().sort_values("conv_id")
    assert via_dir["split"].tolist() == via_lists["split"].tolist()
    assert via_dir["split"].tolist() == [
        "train", "train", "train", "validation", "test",
        "train", "validation", "test"]

    # reference parity: empty manifest and missing file are errors
    (root / "empty.id").write_text("\n\n")
    with pytest.raises(ValueError, match="is empty"):
        load_identifiers(str(root / "empty.id"))
    incomplete = tmp_path / "broken" / "all"
    incomplete.mkdir(parents=True)
    (incomplete / "train.id").write_text("x\n")
    with pytest.raises(ValueError, match="does not exist"):
        parse_splitting(str(tmp_path / "broken"))
