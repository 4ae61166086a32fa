"""JSONL / CSV transcript sources must flow through the identical pipeline
and produce the identical graph as the parquet source."""

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def small_df():
    from ontonotes_5_parsing_ray.sources.transcripts import build_transcripts_table

    df = build_transcripts_table(n_convs=4, seed=23, skew_frac=0.0).to_pandas()
    return df[["conv_id", "turn_idx", "role", "text", "ts"]]


def _triples(ray_session, path):
    from ontonotes_5_parsing_ray.pipelines.kg import run_kg_pipeline

    t = run_kg_pipeline(path, concurrency=2)["triples"].to_pandas()
    cols = sorted(t.columns)
    return t[cols].sort_values(cols).reset_index(drop=True)


def test_jsonl_and_csv_match_parquet(ray_session, small_df, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq_path = str(tmp_path / "t.parquet")
    pq.write_table(pa.Table.from_pandas(small_df, preserve_index=False), pq_path)

    jl = small_df.copy()
    jl["ts"] = (jl["ts"].astype("datetime64[us]").astype("int64"))  # µs ints
    jsonl_path = str(tmp_path / "t.jsonl")
    jl.to_json(jsonl_path, orient="records", lines=True)

    csv_path = str(tmp_path / "t.csv")
    jl.to_csv(csv_path, index=False)

    base = _triples(ray_session, pq_path)
    via_jsonl = _triples(ray_session, jsonl_path)
    via_csv = _triples(ray_session, csv_path)
    assert len(base) > 10
    pd.testing.assert_frame_equal(base, via_jsonl)
    pd.testing.assert_frame_equal(base, via_csv)


def test_missing_required_column_raises(ray_session, small_df, tmp_path):
    jsonl_path = str(tmp_path / "bad.jsonl")
    small_df.drop(columns=["role", "ts"]).to_json(
        jsonl_path, orient="records", lines=True)
    from ontonotes_5_parsing_ray.pipelines.kg import read_transcripts

    with pytest.raises(Exception, match="role"):
        read_transcripts(jsonl_path).materialize()
