"""Alternate transcript source formats: JSONL and CSV.

The engine's canonical input is Parquet (column-pruned at the read), but a
user of the reference feeds it archive/JSON inputs — these readers give the
same one-line on-ramp for line-delimited JSON and CSV exports: read with
Ray's native readers, then normalize to the transcript schema (required
columns validated, ``ts``/``lang`` optional) so the whole pipeline downstream
is format-agnostic. Fan-in happens at the read: every downstream stage sees
the identical Arrow schema regardless of source format.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

REQUIRED = ["conv_id", "turn_idx", "role", "text"]
OPTIONAL = ["ts", "lang"]


def _normalize(ds: rd.Dataset) -> rd.Dataset:
    """Project to the transcript schema with per-batch validation: required
    columns must exist; optional ones ride along when present; extras drop
    (the pruned-read analogue for formats without column pushdown)."""

    def norm(batch: pd.DataFrame) -> pa.Table:
        missing = [c for c in REQUIRED if c not in batch.columns]
        if missing:
            raise ValueError(
                f"transcript source lacks required column(s) {missing}; "
                f"need {REQUIRED} (ts/lang optional)")
        cols = REQUIRED + [c for c in OPTIONAL if c in batch.columns]
        out = batch[cols].copy()
        out["conv_id"] = out["conv_id"].astype(str)
        out["turn_idx"] = out["turn_idx"].astype("int64")
        out["role"] = out["role"].astype(str)
        out["text"] = out["text"].astype(str)
        return pa.Table.from_pandas(out, preserve_index=False)

    return ds.map_batches(norm, batch_format="pandas")


def read_transcripts_jsonl(path: str) -> rd.Dataset:
    """Line-delimited JSON transcripts -> normalized transcript Dataset."""
    return _normalize(rd.read_json(path))


def read_transcripts_csv(path: str) -> rd.Dataset:
    """CSV transcripts -> normalized transcript Dataset."""
    return _normalize(rd.read_csv(path))
