"""The reference-semantics golden extractor (single-process).

Plays the role of the reference's sequential driver
(``ontonotes5_to_json.py:93-126``): one process, one thread, conversation by
conversation. The distributed Ray pipeline is gated against this module's
output (triple P/R >= 0.95, expected 1.0 because both call the same kernels).
"""

from .kg import extract_kg_single_process  # noqa: F401
