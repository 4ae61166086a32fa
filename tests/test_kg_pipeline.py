"""The P/R gate: distributed pipeline vs single-process oracle (north_rule:
triple P/R >= 0.95; expected exactly 1.0 because both share the kernels).
Run with ``python -m pytest -x -q``.
"""

from ontonotes_5_parsing_ray.oracle.kg import precision_recall, triple_set


def test_triple_precision_recall_gate(kg_result, golden_result):
    p, r = precision_recall(
        triple_set(kg_result["triples"]), triple_set(golden_result["triples"])
    )
    assert p >= 0.95 and r >= 0.95, (p, r)
    assert p == 1.0 and r == 1.0


def test_graph_tables_match_oracle(kg_result, golden_result):
    nodes = kg_result["nodes"].sort_values("canonical_surface").reset_index(drop=True)
    gnodes = golden_result["nodes"].sort_values("canonical_surface").reset_index(drop=True)
    assert len(nodes) == len(gnodes)
    merged = nodes.merge(gnodes, on="canonical_surface", suffixes=("_r", "_g"))
    assert (merged["entity_type_r"] == merged["entity_type_g"]).all()
    assert (merged["n_mentions_r"] == merged["n_mentions_g"]).all()

    edges = kg_result["edges"]
    gedges = golden_result["edges"]
    assert len(edges) == len(gedges)
    key_r = set(zip(edges["subj_id"], edges["pred"], edges["obj_id"]))
    key_g = set(zip(gedges["subj_id"], gedges["pred"], gedges["obj_id"]))
    assert key_r == key_g

    assert len(kg_result["errors"]) == len(golden_result["errors"])


def test_per_turn_text_equality_invariant(kg_result, tiny_table):
    """The input_hint invariant: every mention's surface equals the
    corresponding turn text slice under stable (conv_id, turn_idx) order."""
    texts = {}
    df = tiny_table.to_pandas()
    for row in df.itertuples(index=False):
        texts[(row.conv_id, int(row.turn_idx))] = row.text
    mentions = kg_result["mentions"]
    checked = 0
    for row in mentions.itertuples(index=False):
        raw = texts[(row.conv_id, int(row.turn_idx))]
        # mention offsets index the normalized turn text; for turns without
        # special-token blanking the raw text IS the normalized text
        if "EDITED" not in raw and "  " not in raw and raw.strip() == raw:
            assert raw[row.start:row.end] == row.surface
            checked += 1
    assert checked > 100


def test_turn_ordering_invariant(kg_result):
    """Input rows are shuffled on disk; chain ids must still be assigned in
    first-appearance order under stable (turn_idx, start) order."""
    mentions = kg_result["mentions"]
    for conv_id, group in mentions[~mentions["is_pronoun"]].groupby("conv_id"):
        group = group.sort_values(["turn_idx", "start"])
        seen = set()
        for _, row in group.iterrows():
            cid = row["chain_id"]
            if cid not in seen:
                assert not seen or cid > max(seen), (conv_id, cid)
                seen.add(cid)


def test_node_provenance_first_seen_ts_and_lang(kg_result, tiny_table):
    """Round-2: nodes carry first_seen_ts (epoch-µs of the first mention's
    turn) and a detected language (reference attaches language to every
    record, ontonotes5_to_json.py:110-111)."""
    import pandas as pd

    nodes = kg_result["nodes"]
    assert "first_seen_ts" in nodes.columns and "lang" in nodes.columns
    assert (nodes["first_seen_ts"] > 0).all()     # synthetic ts is positive
    assert (nodes["lang"] != "").all()

    # first_seen_ts must equal the transcript ts of (first_conv_id,
    # first_turn_idx) exactly
    df = tiny_table.to_pandas()
    ts_of = {(c, int(t)): int(pd.Timestamp(ts).value // 1000)
             for c, t, ts in zip(df["conv_id"], df["turn_idx"], df["ts"])}
    for row in nodes.itertuples(index=False):
        expected = ts_of[(row.first_conv_id, int(row.first_turn_idx))]
        assert int(row.first_seen_ts) == expected, row.canonical_surface


def test_canonicalize_triples_join_equals_broadcast(ray_session, tiny_transcripts):
    """The hash-partitioned-join canon application (too-big-to-broadcast
    path) must equal the broadcast-dict path row for row."""
    import pandas as pd
    import ray

    from ontonotes_5_parsing_ray.stages.canonicalize import (
        build_canon_map,
        canon_map_to_dict,
    )
    from ontonotes_5_parsing_ray.pipelines.kg import (
        annotate,
        canonicalize_triples,
        canonicalize_triples_join,
        link,
        read_transcripts,
        split_linked,
        surfaces_for_canon,
    )

    annotated = annotate(read_transcripts(tiny_transcripts),
                         concurrency=2, emit="link")
    linked = link(annotated).materialize()
    mentions, triples = split_linked(linked)
    canon_map = build_canon_map(
        surfaces_for_canon(mentions, triples)).materialize()

    bcast = canonicalize_triples(
        triples, ray.put(canon_map_to_dict(canon_map))).to_pandas()
    joined = canonicalize_triples_join(triples, canon_map).to_pandas()

    cols = sorted(bcast.columns)
    assert sorted(joined.columns) == cols
    key = ["conv_id", "turn_idx", "pred", "subj", "obj"]
    b = bcast[cols].sort_values(key).reset_index(drop=True)
    j = joined[cols].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(b, j)


def test_full_pipeline_with_distributed_canon_path(ray_session, tiny_transcripts):
    """End-to-end KG build with the DISTRIBUTED canonicalization path forced
    (canon_driver_limit=0: LSH banding + star components, no driver
    clustering) must produce the identical graph."""
    from ontonotes_5_parsing_ray.pipelines.kg import run_kg_pipeline

    fast = run_kg_pipeline(tiny_transcripts, concurrency=2)
    dist = run_kg_pipeline(tiny_transcripts, concurrency=2,
                           canon_driver_limit=0)
    f_edges = fast["edges"].to_pandas()
    d_edges = dist["edges"].to_pandas()
    key = lambda df: set(zip(df["subj_id"], df["pred"], df["obj_id"],
                             df["n_occurrences"]))
    assert key(f_edges) == key(d_edges)
    f_nodes = fast["nodes"].to_pandas()
    d_nodes = dist["nodes"].to_pandas()
    assert (set(zip(f_nodes["canonical_id"], f_nodes["n_mentions"]))
            == set(zip(d_nodes["canonical_id"], d_nodes["n_mentions"])))


def test_full_pipeline_auto_routes_join_canon_apply(ray_session, kg_result,
                                                    tiny_transcripts):
    """canon_broadcast_limit=0 forces the join-route canon APPLICATION
    through the full pipeline (triples AND nodes AND edges) — the output
    must equal the broadcast route's exactly."""
    import pandas as pd

    from ontonotes_5_parsing_ray.pipelines.kg import run_kg_pipeline

    joined = run_kg_pipeline(tiny_transcripts, concurrency=2,
                             canon_broadcast_limit=0)
    for name, key in (
        ("triples", ["conv_id", "turn_idx", "pred", "subj", "obj"]),
        ("nodes", ["canonical_id"]),
        ("edges", ["subj_id", "pred", "obj_id"]),
    ):
        b = kg_result[name]
        j = joined[name].to_pandas()
        cols = sorted(b.columns)
        assert sorted(j.columns) == cols, name
        pd.testing.assert_frame_equal(
            b[cols].sort_values(key).reset_index(drop=True),
            j[cols].sort_values(key).reset_index(drop=True),
        )


def test_materialize_auto_routes_join_canon_apply(ray_session,
                                                  tiny_transcripts, tmp_path):
    """materialize_kg with canon_broadcast_limit=0 (join route) writes the
    same graph tables as the default broadcast route."""
    import pandas as pd
    import ray.data as rd

    from ontonotes_5_parsing_ray.pipelines.materialize import materialize_kg

    out_b = materialize_kg(tiny_transcripts, str(tmp_path / "bcast"),
                           num_partitions=2, concurrency=2)
    out_j = materialize_kg(tiny_transcripts, str(tmp_path / "join"),
                           num_partitions=2, concurrency=2,
                           canon_broadcast_limit=0)
    for name, key in (("triples", ["conv_id", "turn_idx", "pred", "subj", "obj"]),
                      ("nodes", ["canonical_id"]),
                      ("edges", ["subj_id", "pred", "obj_id"])):
        b = rd.read_parquet(out_b[name]).to_pandas()
        j = rd.read_parquet(out_j[name]).to_pandas()
        cols = sorted(b.columns)
        pd.testing.assert_frame_equal(
            b[cols].sort_values(key).reset_index(drop=True),
            j[cols].sort_values(key).reset_index(drop=True),
        )


def test_surface_forms_capped_topn(ray_session):
    """A node with more distinct surfaces than the cap keeps only the top-N
    by count (ties lexicographic) in surface_forms, while n_surface_forms
    reports the true distinct total."""
    import json

    import pyarrow as pa
    import ray
    import ray.data as rd

    from ontonotes_5_parsing_ray.pipelines.kg import (
        SURFACE_FORMS_CAP,
        build_nodes,
    )

    n_forms = SURFACE_FORMS_CAP + 8
    rows = []
    for i in range(n_forms):
        # surface i appears (n_forms - i) times -> count-rank == index order
        for rep in range(n_forms - i):
            rows.append((f"c{rep}", rep, f"MegaCorp v{i:03d}", "ORG"))
    mentions = rd.from_arrow(pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int64()),
        "start": pa.array([0] * len(rows), pa.int64()),
        "end": pa.array([1] * len(rows), pa.int64()),
        "surface": pa.array([r[2] for r in rows], pa.string()),
        "entity_type": pa.array([r[3] for r in rows], pa.string()),
        "is_pronoun": pa.array([False] * len(rows), pa.bool_()),
        "chain_id": pa.array([0] * len(rows), pa.int64()),
        "antecedent": pa.array([""] * len(rows), pa.string()),
        "ts": pa.array([0] * len(rows), pa.int64()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
    }))
    # canon map folds every surface onto one canonical entity
    from ontonotes_5_parsing_ray.functions.kgrules import normalize_surface

    canon = {normalize_surface(f"MegaCorp v{i:03d}"): "megacorp"
             for i in range(n_forms)}
    nodes = build_nodes(mentions, ray.put(canon)).to_pandas()
    assert len(nodes) == 1
    node = nodes.iloc[0]
    forms = json.loads(node["surface_forms"])
    assert len(forms) == SURFACE_FORMS_CAP
    assert int(node["n_surface_forms"]) == n_forms
    # top-N by count: the most frequent surfaces (lowest i) survive
    assert forms == [f"MegaCorp v{i:03d}" for i in range(SURFACE_FORMS_CAP)]
    assert int(node["n_mentions"]) == sum(n_forms - i for i in range(n_forms))


def test_node_edge_combine_routes_equal(ray_session, tiny_transcripts):
    """driver_combine_limit=0 forces the distributed node/edge combines;
    output must equal the driver fast path row-for-row."""
    import pandas as pd
    import ray

    from ontonotes_5_parsing_ray.pipelines.kg import (
        annotate,
        build_edges,
        build_nodes,
        canonicalize_triples,
        link,
        read_transcripts,
        split_linked,
        surfaces_for_canon,
    )
    from ontonotes_5_parsing_ray.stages.canonicalize import (
        build_canon_map,
        canon_map_to_dict,
    )

    annotated = annotate(
        read_transcripts(tiny_transcripts), concurrency=2, emit="link"
    ).materialize()
    linked = link(annotated).materialize()
    mentions, triples = split_linked(linked)
    canon = build_canon_map(
        surfaces_for_canon(mentions, triples)).materialize()
    ref = ray.put(canon_map_to_dict(canon))
    ct = canonicalize_triples(triples, ref).materialize()

    def norm(df):
        return df.sort_values(list(df.columns), kind="mergesort") \
            .reset_index(drop=True)

    e_drv = norm(build_edges(ct).to_pandas())
    e_dist = norm(build_edges(ct, driver_combine_limit=0).to_pandas())
    pd.testing.assert_frame_equal(e_drv, e_dist)
    n_drv = norm(build_nodes(mentions, ref).to_pandas())
    n_dist = norm(build_nodes(mentions, ref,
                              driver_combine_limit=0).to_pandas())
    pd.testing.assert_frame_equal(n_drv, n_dist)
    assert len(e_drv) > 0 and len(n_drv) > 0
