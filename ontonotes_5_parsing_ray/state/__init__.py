"""Checkpoint markers, lineage records, resume logic."""
