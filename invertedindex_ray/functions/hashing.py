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
    """uint64 hash per string — content-deterministic for ANY string,
    including embedded NUL bytes. ``categorize=False`` is load-bearing:
    the categorize path factorizes through pandas' C string hashtable,
    which treats char* as NUL-terminated, so a string containing
    ``\\x00`` gets the hash of whichever NUL-truncated sibling
    factorize saw first — i.e. a hash that depends on the BATCH, not
    the value. That silently splits one key across partitions in the
    keyed reductions (found via lang_source_matrix; web text can
    legally contain U+0000, so dedup shingles were exposed too).
    categorize=False hashes each value directly: identical uint64s for
    NUL-free strings (all existing oracles keep their partitioning),
    ~1.3x slower on highly duplicated arrays, ~3x FASTER on
    near-unique ones (measured: 148->199 ms and 549->165 ms per 1M)."""
    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, categorize=False)


def term_bucket(terms, parts, num_buckets: int) -> np.ndarray:
    """Route (term, doc-partition) -> shuffle bucket. A term's partitions
    spread across buckets, so one Zipf head term cannot bottleneck a single
    build task (head-term skew handling, SURVEY.md §4)."""
    h = hash_strings(terms)
    p = np.asarray(parts).astype(np.uint64)
    return ((h ^ (p * _GOLDEN)) % np.uint64(num_buckets)).astype(np.int32)


def term_bucket_one(term: str, part: int, num_buckets: int) -> int:
    return int(term_bucket(np.array([term], dtype=object), np.array([part]), num_buckets)[0])


def term_buckets_all_parts(term: str, n_parts: int, num_buckets: int) -> np.ndarray:
    """Bucket of (term, part) for every part with ONE string hash — the
    query-side hot path hashes each term once, not once per partition."""
    h = hash_strings(np.array([term], dtype=object))[0]
    parts = np.arange(n_parts, dtype=np.uint64)
    return ((h ^ (parts * _GOLDEN)) % np.uint64(num_buckets)).astype(np.int32)


def url_hash_ids(urls) -> np.ndarray:
    """63-bit coordination-free doc ids (id_mode='hash')."""
    return (hash_strings(urls) >> np.uint64(1)).astype(np.int64)


def md5_hash63(strings) -> np.ndarray:
    """63-bit md5-based string hash with an exact DuckDB mirror:
    ``(md5_number_lower(s) >> 1)::BIGINT`` — md5_number_lower is the
    little-endian integer of md5 bytes 8..16. Used by the fingerprinting
    pipelines (simhash, winnowing) so the driver's SQL oracle can
    reproduce the hashes bit-for-bit."""
    import hashlib

    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[8:16], "little")
            >> 1
            for s in strings
        ),
        dtype=np.int64,
        count=len(strings),
    )


_M1 = np.uint64(0x5555555555555555)
_M2 = np.uint64(0x3333333333333333)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_H01 = np.uint64(0x0101010101010101)


def popcount64(v: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR); input uint64, output int64."""
    v = v.astype(np.uint64, copy=True)
    v -= (v >> np.uint64(1)) & _M1
    v = (v & _M2) + ((v >> np.uint64(2)) & _M2)
    v = (v + (v >> np.uint64(4))) & _M4
    return ((v * _H01) >> np.uint64(56)).astype(np.int64)


def mix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain mixing constants) —
    a collision-resistant uint64 mix for partition/bucket keys."""
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))
