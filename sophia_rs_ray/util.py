"""Small shared helpers."""

from __future__ import annotations

import numpy as np


def round_away(x, digits: int):
    """Round half away from zero — matches DuckDB's ``round()`` so Ray
    results hash-compare equal to the SQL oracle (numpy/pyarrow default
    to half-to-even, which differs on exact midpoints)."""
    m = 10.0 ** digits
    arr = np.asarray(x, dtype=np.float64)
    return np.sign(arr) * np.floor(np.abs(arr) * m + 0.5) / m
