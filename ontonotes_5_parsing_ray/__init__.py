"""Ray-Data-native knowledge-graph construction engine.

A from-scratch re-expression of the query / data-processing capabilities of
``nsu-ai/ontonotes-5-parsing`` (reference at ``/root/reference``, studied for
behaviour only) as an idiomatic Ray Data pipeline: per-turn annotation with
``map_batches`` over Arrow batches, conversation-scoped coreference with
``groupby(conv_id).map_groups``, MinHash/LSH cross-conversation
canonicalization, and Parquet node/edge graph materialization with
per-partition lineage and checkpoint markers.

Layout
------
``functions/``  pure, single-process kernels (span algebra, tokenization,
                alignment, tag distance, hashing) shared by the Ray stages and
                the single-process oracle.
``oracle/``     the reference-semantics extractor: the golden single-process
                implementation the distributed pipeline is gated against
                (triple P/R >= 0.95).
``sources/``    deterministic synthetic transcript generation + readers.
``stages/``     Ray Data batch transforms (stateless tasks & actor pools).
``pipelines/``  end-to-end compositions (KG build, stats, tag reduction).
``state/``      checkpoint markers, lineage records, resume logic.
"""

__version__ = "0.1.0"
