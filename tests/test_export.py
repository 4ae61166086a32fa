"""Reference-JSON interchange: export round-trips through the validating
loader; malformed inputs raise reference-style errors."""

import json

import pandas as pd
import pytest


def _annotated_with_split(ray_session, tiny_transcripts):
    from ontonotes_5_parsing_ray.pipelines.kg import annotate, read_transcripts
    from ontonotes_5_parsing_ray.pipelines.splits import assign_splits

    ds = annotate(read_transcripts(tiny_transcripts), concurrency=2,
                  emit="record")
    return assign_splits(ds)


def test_reference_json_round_trip(ray_session, tiny_transcripts, tmp_path):
    from ontonotes_5_parsing_ray.pipelines.export import (
        build_reference_samples,
        load_reference_json,
        write_reference_json,
        write_reference_samples_parquet,
    )

    annotated = _annotated_with_split(ray_session, tiny_transcripts)
    samples = build_reference_samples(annotated).materialize()
    out_file = str(tmp_path / "onto.json")
    write_reference_json(samples, out_file)

    with open(out_file, encoding="utf-8") as fh:
        data = json.load(fh)
    assert set(data) <= {"TRAINING", "VALIDATION", "TESTING"}
    assert len(data["TRAINING"]) > 0
    one = data["TRAINING"][0]
    assert {"text", "morphology", "syntax", "entities", "language"} <= set(one)

    loaded_samples, loaded_ann = load_reference_json(out_file)
    assert len(loaded_samples) == sum(len(v) for v in data.values())
    # spans round-trip exactly (exporter never emits padded spans)
    for part in data:
        for idx, sample in enumerate(data[part]):
            got = loaded_ann[(loaded_ann["part"] == part)
                             & (loaded_ann["sample_idx"] == idx)]
            n_spans = sum(len(v) for kind in
                          ("morphology", "syntax", "entities")
                          for v in sample[kind].values())
            assert len(got) == n_spans

    # scale path writes partitioned parquet
    pq_dir = write_reference_samples_parquet(samples, str(tmp_path / "pq"))
    import os
    assert any(p.startswith("part=") for p in os.listdir(pq_dir))


def test_reference_json_loader_validation(tmp_path):
    from ontonotes_5_parsing_ray.pipelines.export import load_reference_json

    def dump(obj):
        p = tmp_path / "bad.json"
        p.write_text(json.dumps(obj))
        return str(p)

    with pytest.raises(ValueError, match="Expected"):
        load_reference_json(dump([1, 2]))
    with pytest.raises(ValueError, match="text is not specified"):
        load_reference_json(dump({"TRAINING": [{"morphology": {},
                                                "syntax": {},
                                                "entities": {}}]}))
    with pytest.raises(ValueError, match="entities is not specified"):
        load_reference_json(dump({"TRAINING": [{"text": "ab",
                                                "morphology": {},
                                                "syntax": {}}]}))
    with pytest.raises(ValueError, match="non-empty list"):
        load_reference_json(dump({"TRAINING": [{
            "text": "ab", "morphology": {"NN": []}, "syntax": {},
            "entities": {}}]}))
    with pytest.raises(ValueError, match="inadmissible"):
        load_reference_json(dump({"TRAINING": [{
            "text": "ab", "morphology": {"NN": [[1, 1]]}, "syntax": {},
            "entities": {}}]}))

    # whitespace-padded span bounds shrink to the stripped text
    _s, ann = load_reference_json(dump({"TRAINING": [{
        "text": "a bc d", "morphology": {"NN": [[1, 5]]}, "syntax": {},
        "entities": {}}]}))
    assert ann.iloc[0]["start"] == 2 and ann.iloc[0]["end"] == 4


def test_load_reference_json_dataset_roundtrip(ray_session, tiny_transcripts,
                                               tmp_path):
    """The Dataset-returning loader wraps load_reference_json: same
    long-form annotation rows, exposed as a distributed Dataset."""
    import ray.data as rd

    from ontonotes_5_parsing_ray.pipelines.export import (
        build_reference_samples,
        load_reference_json,
        load_reference_json_dataset,
        write_reference_json,
    )

    annotated = _annotated_with_split(ray_session, tiny_transcripts)
    samples = build_reference_samples(annotated).materialize()
    path = str(tmp_path / "ref.json")
    write_reference_json(samples, path)
    _samples, frame = load_reference_json(path)
    ds = load_reference_json_dataset(path)
    assert isinstance(ds, rd.Dataset)
    assert ds.count() == len(frame)
