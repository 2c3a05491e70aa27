"""Deterministic vectorized hashing shared by build and query sides.

``pandas.util.hash_array`` (siphash with a fixed key) is deterministic
across processes and runs — unlike Python's builtin ``hash`` — so the
query engine can recompute the same (term, part) -> bucket routing that
the build used, with no lookup table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def hash_strings(values) -> np.ndarray:
    """uint64 hash per string (deterministic)."""
    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr)


def term_bucket(terms, parts, num_buckets: int) -> np.ndarray:
    """Route (term, doc-partition) -> shuffle bucket. A term's partitions
    spread across buckets, so one Zipf head term cannot bottleneck a single
    build task (head-term skew handling, SURVEY.md §4)."""
    h = hash_strings(terms)
    p = np.asarray(parts).astype(np.uint64)
    return ((h ^ (p * _GOLDEN)) % np.uint64(num_buckets)).astype(np.int32)


def term_bucket_one(term: str, part: int, num_buckets: int) -> int:
    return int(term_bucket(np.array([term], dtype=object), np.array([part]), num_buckets)[0])


def url_hash_ids(urls) -> np.ndarray:
    """63-bit coordination-free doc ids (id_mode='hash')."""
    return (hash_strings(urls) >> np.uint64(1)).astype(np.int64)
