"""CLI smoke tests: every subcommand runs end-to-end via main(argv)
(the `ray job submit` surface; reference console-script parity,
reference setup.py:61-66)."""

import json
import os

import pandas as pd
import pytest


def test_cli_run_kg_and_downstream(ray_session, tiny_transcripts, tmp_path, capsys):
    from ontonotes_5_parsing_ray.cli import main

    kg_dir = str(tmp_path / "kg_out")
    rc = main(["run-kg", "-s", tiny_transcripts, "-d", kg_dir,
               "--num-partitions", "2", "--concurrency", "2"])
    assert rc == 0
    tables = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["tables"]
    assert os.path.isdir(tables["nodes"]) and os.path.isdir(tables["edges"])

    # reduce-tags + stats over a synthetic long-form annotation table
    ann = pd.DataFrame({
        "conv_id": ["c1"] * 4 + ["c2"] * 2,
        "turn_idx": [0, 0, 1, 1, 0, 0],
        "kind": ["morphology"] * 6,
        "tag": ["NN", "NN-X", "VB", "NN", "NNP", "NN"],
        "start": [0, 3, 10, 20, 0, 5],
        "end": [2, 8, 14, 24, 3, 9],
    })
    ann_path = str(tmp_path / "ann.parquet")
    ann.to_parquet(ann_path)
    red_dir = str(tmp_path / "reduced")
    assert main(["reduce-tags", "-s", ann_path, "-d", red_dir, "-n", "2"]) == 0
    capsys.readouterr()
    assert main(["stats", "-s", red_dir]) == 0
    out = capsys.readouterr().out
    assert "morphology:" in out

    assert main(["reduce-tags", "-s", ann_path, "-d", red_dir, "-n", "1"]) == 2

    splits_dir = str(tmp_path / "splits_out")
    assert main(["splits", "-s", tiny_transcripts, "-d", splits_dir]) == 0
    assert any(p.startswith("split=") for p in os.listdir(splits_dir))


def test_cli_export_json(ray_session, tiny_transcripts, tmp_path, capsys):
    from ontonotes_5_parsing_ray.cli import main
    from ontonotes_5_parsing_ray.pipelines.export import load_reference_json

    out = str(tmp_path / "onto.json")
    rc = main(["export-json", "-s", tiny_transcripts, "-d", out,
               "-r", "13", "--concurrency", "2"])
    assert rc == 0
    samples, ann = load_reference_json(out)   # loader validates structure
    assert len(samples) > 0 and len(ann) > 0
