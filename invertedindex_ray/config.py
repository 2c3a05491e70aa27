"""Index configuration.

Mirrors the reference's user-extension surface (SURVEY.md §2 bottom row):
``application.properties`` booleans ``stemming``/``stopwords``
(/root/reference/application.properties, read at
src/main/java/it/unipi/indexer/Indexer.java:52-54) plus the scoring and
layout constants from src/main/java/it/unipi/utils/Constants.java:39-49,
extended with the Ray-side partitioning knobs that the single-threaded
reference did not need.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class IndexConfig:
    # --- text processing (reference parity) ---
    stemming: bool = True          # Snowball/Porter2 English
    stopwords: bool = True         # 127-entry list incl. "" (resources/stopwords.txt)
    max_term_len: int = 20         # Constants.java:42 (chars, truncation BEFORE stemming)

    # --- scoring (Constants.java:44-46) ---
    bm25_k1: float = 1.2
    bm25_b: float = 0.75

    # --- index layout ---
    # On-disk posting-stream codec: "vb" (reference layout,
    # EncodingUtils.java:14-76), "gamma" or "delta" (Elias bit-aligned
    # codes — denser on small d-gaps; bit-aligned streams carry no skip
    # pointers, so their cursors decode whole lists).
    codec: str = "vb"
    skip_pointers_threshold: int = 1024   # Constants.java:39 — df above which skips exist
    # Document-partitioned sharding: each posting list is split into
    # `num_doc_partitions` contiguous doc-id ranges; partitions build and
    # checkpoint independently and the query cursor chains them in order.
    # 1 == the reference's single global posting list layout.
    num_doc_partitions: int = 1
    # Term-shuffle fan-out: postings are hash-bucketed on (term, partition)
    # into this many groups for the one wide groupby; each bucket is built
    # by one task and written as one resumable segment file.
    num_buckets: int = 32

    # --- doc-id assignment ---
    # "dense": ids are the dense rank of `url` in sorted order (deterministic,
    #   reproduces the reference's dense-int ergonomics; needs the slim doc
    #   table to be sorted once).
    # "hash": id = 63-bit hash of url (coordination-free; the 10^12-doc path).
    id_mode: str = "dense"

    # --- query processor (Constants.java:48-49, QueryProcessor.java:36) ---
    top_k: int = 20
    max_query_terms: int = 32
    query_cache_size: int = 500

    def __post_init__(self) -> None:
        if self.codec not in ("vb", "gamma", "delta"):
            raise ValueError(
                f"unknown codec {self.codec!r} (one of 'vb', 'gamma', 'delta')"
            )
        if self.id_mode not in ("dense", "hash"):
            raise ValueError(f"unknown id_mode {self.id_mode!r}")

    def fingerprint(self) -> str:
        """Stable hash of the config — stamped into the build manifest so a
        resume never mixes artifacts built under different settings."""
        blob = json.dumps(asdict(self), sort_keys=True).encode()
        return hashlib.sha256(blob).hexdigest()[:16]

    # Fields that determine the on-disk index layout / stored values; a
    # QueryEngine opened with different values would hash terms into the
    # wrong bucket files or use stale MaxScore bounds.
    LAYOUT_FIELDS = (
        "stemming", "stopwords", "max_term_len",
        "bm25_k1", "bm25_b",
        "codec", "skip_pointers_threshold", "num_doc_partitions",
        "num_buckets", "id_mode",
    )

    def save(self, index_dir: str) -> None:
        """Persist to ``<index_dir>/config.json`` so the index directory is
        self-describing (the reference bakes its layout into Constants.java;
        here the knobs are data, so they must travel with the artifacts)."""
        import os

        path = os.path.join(index_dir, "config.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(asdict(self), f, indent=1)
        os.replace(tmp, path)

    @classmethod
    def load(cls, index_dir: str) -> "IndexConfig | None":
        """Load the persisted build config, or None for pre-config indexes."""
        import os

        path = os.path.join(index_dir, "config.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            d = json.load(f)
        known = {k: v for k, v in d.items() if k in cls.__dataclass_fields__}
        return cls(**known)
