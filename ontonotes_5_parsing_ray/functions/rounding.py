"""DuckDB-compatible rounding.

Python's ``round``/pandas ``.round`` use round-half-to-even; DuckDB's
``round()`` rounds half away from zero. Every value that is compared against
a SQL oracle goes through :func:`round_half_away` so 0.8203125 -> 0.820313
on both sides.
"""

from __future__ import annotations

import numpy as np


def round_half_away(x, digits: int = 6):
    """Round half away from zero (scalar, list, Series or ndarray)."""
    factor = 10.0 ** digits
    arr = np.asarray(x, dtype=np.float64)
    out = np.sign(arr) * np.floor(np.abs(arr) * factor + 0.5) / factor
    if np.isscalar(x) or arr.ndim == 0:
        return float(out)
    return out
