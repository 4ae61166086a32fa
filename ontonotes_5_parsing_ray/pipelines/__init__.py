"""End-to-end pipeline compositions (Dataset -> Dataset functions)."""
