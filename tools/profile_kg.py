"""Per-stage wall-clock + Ray Data stats for the flagship KG pipeline.

Usage:
    python tools/profile_kg.py [transcripts_path] [num_cpus]

Materializes each stage separately (which SERIALIZES work the real pipeline
overlaps — per-stage walls are upper bounds; their sum exceeds the fused
end-to-end time) and prints the stage table plus each materialized stage's
``ds.stats()`` operator breakdown. This is the iterate-on-stats loop the
scale notes prescribe: run after touching any stage, look for a stage whose
wall is not dominated by its useful compute.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else None
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR",
                 log_to_driver=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

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

    if path is None:
        from ontonotes_5_parsing_ray.sources.transcripts import (
            default_transcripts_dir,
            generate_transcripts,
        )

        path = generate_transcripts(
            default_transcripts_dir("profile_2000"), n_convs=2000, seed=42,
            skew_frac=0.003, skew_turns=1200, shard_count=16,
            unique_refs=True,
        )

    stats_blobs = {}
    walls = {}

    def stage(name, fn):
        t0 = time.time()
        out = fn()
        walls[name] = time.time() - t0
        return out

    ann = stage("annotate", lambda: annotate(
        read_transcripts(path), concurrency=max(2, num_cpus - 2),
        emit="link").materialize())
    stats_blobs["annotate"] = ann.stats()
    linked = stage("link", lambda: link(ann).materialize())
    stats_blobs["link"] = linked.stats()
    mentions, triples = split_linked(linked)
    canon = stage("canon_build", lambda: build_canon_map(
        surfaces_for_canon(mentions, triples)).materialize())
    ref = ray.put(canon_map_to_dict(canon))
    ct = stage("canon_apply+edges", lambda: build_edges(
        canonicalize_triples(triples, ref)).materialize())
    stats_blobs["edges"] = ct.stats()
    nodes = stage("nodes", lambda: build_nodes(mentions, ref).materialize())
    stats_blobs["nodes"] = nodes.stats()

    print("\n== stage walls (serialized; the fused pipeline overlaps these) ==")
    for name, sec in walls.items():
        print(f"  {name:>18}: {sec:7.2f} s")
    print(f"  {'sum':>18}: {sum(walls.values()):7.2f} s")
    for name, blob in stats_blobs.items():
        print(f"\n== ds.stats(): {name} ==")
        # operator summary lines only (drop the per-block histograms)
        for line in blob.splitlines():
            if line.strip().startswith(("Operator", "* ", "Dataset")) \
                    or "wall time" in line.lower():
                print("  " + line.rstrip())
    ray.shutdown()


if __name__ == "__main__":
    main()
