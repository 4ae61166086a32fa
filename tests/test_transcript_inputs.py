"""Input-schema robustness: optional ts, timestamp-unit safety, null ts.

Externally-written transcript parquet varies: no ts column at all (the CLI
documents ts as optional), pandas-default ns timestamps, or null ts values.
All must flow through read_transcripts -> link -> nodes with first_seen_ts
in epoch-µs (or -1 when missing)."""

import numpy as np
import pandas as pd
import pytest


def _write_parquet(df: pd.DataFrame, path) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), str(path))
    return str(path)


@pytest.fixture(scope="module")
def small_turns_df():
    from ontonotes_5_parsing_ray.sources.transcripts import build_transcripts_table

    df = build_transcripts_table(n_convs=4, seed=11, skew_frac=0.0).to_pandas()
    return df[["conv_id", "turn_idx", "role", "text", "ts"]]


def test_tsless_transcripts_run(ray_session, small_turns_df, tmp_path):
    from ontonotes_5_parsing_ray.pipelines.kg import run_kg_pipeline

    path = _write_parquet(small_turns_df.drop(columns=["ts"]),
                          tmp_path / "nots.parquet")
    out = run_kg_pipeline(path, concurrency=2)
    nodes = out["nodes"].to_pandas()
    assert len(nodes) > 0
    assert (nodes["first_seen_ts"] == -1).all()


def test_ns_timestamps_yield_epoch_us(ray_session, small_turns_df, tmp_path):
    df = small_turns_df.copy()
    # pandas-default ns resolution; same instants as the source table
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[ns]")
    expected_us = (df["ts"].astype("datetime64[us]").astype("int64")).min()

    from ontonotes_5_parsing_ray.pipelines.kg import run_kg_pipeline

    path = _write_parquet(df, tmp_path / "ns.parquet")
    nodes = run_kg_pipeline(path, concurrency=2)["nodes"].to_pandas()
    assert len(nodes) > 0
    # every first_seen_ts is a µs-scale epoch, not 1000x off
    assert (nodes["first_seen_ts"] >= expected_us).all()
    assert (nodes["first_seen_ts"] < expected_us * 10).all()


def test_null_ts_becomes_sentinel(ray_session, small_turns_df, tmp_path):
    df = small_turns_df.copy()
    df["ts"] = pd.to_datetime(df["ts"])
    df.loc[:, "ts"] = pd.NaT  # all-null: every node must get the sentinel

    from ontonotes_5_parsing_ray.pipelines.kg import run_kg_pipeline

    path = _write_parquet(df, tmp_path / "nullts.parquet")
    nodes = run_kg_pipeline(path, concurrency=2)["nodes"].to_pandas()
    assert len(nodes) > 0
    assert (nodes["first_seen_ts"] == -1).all()


def test_missing_required_column_raises(tmp_path, small_turns_df):
    from ontonotes_5_parsing_ray.pipelines.kg import read_transcripts

    path = _write_parquet(small_turns_df.drop(columns=["text"]),
                          tmp_path / "notext.parquet")
    with pytest.raises(ValueError, match="text"):
        read_transcripts(path)
