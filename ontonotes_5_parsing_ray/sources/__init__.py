"""Input sources: deterministic synthetic transcripts + Parquet readers."""
