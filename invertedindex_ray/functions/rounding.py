"""Half-away-from-zero rounding, matching SQL ROUND (DuckDB/ANSI).

Python's builtin round / np.round use banker's rounding (ties to even),
which disagrees with SQL on exact decimal ties (e.g. 105/128 = 0.8203125
-> SQL 0.820313, Python 0.820312). Every pipeline column that is compared
against a DuckDB oracle rounds through here.
"""

from __future__ import annotations

import math

import numpy as np


def round_half_up(x, ndigits: int):
    """Vectorized half-away-from-zero round (SQL ROUND semantics)."""
    scale = 10.0 ** ndigits
    arr = np.asarray(x, dtype=np.float64)
    out = np.sign(arr) * np.floor(np.abs(arr) * scale + 0.5) / scale
    if np.isscalar(x) or arr.ndim == 0:
        return float(out)
    return out


def round_half_up_scalar(x: float, ndigits: int) -> float:
    scale = 10.0 ** ndigits
    return math.copysign(math.floor(abs(x) * scale + 0.5) / scale, x)
