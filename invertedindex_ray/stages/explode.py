"""Postings explode stage: tokenized docs -> (term, doc_id, tf, doc_len,
part, bucket) posting rows.

Doc-id resolution happens here:

- ``dense`` mode: doc_id = rank of url among surviving docs in sorted-url
  order. The sorted url array is broadcast once via ``ray.put`` and looked
  up with ``np.searchsorted`` per batch — a broadcast join, not a shuffle
  (SURVEY.md §2 J1/J2). Suitable while the slim doc table fits workers
  (~10^8 docs); beyond that use:
- ``hash`` mode: doc_id = 63-bit deterministic hash of url — zero
  coordination, the 10^12-doc path. Posting-list order is then hash order
  (still a deterministic total order, which is all the DAAT engine needs).

``part`` is the contiguous doc-id range partition (document-partitioned
index, SURVEY.md §4 skew row); ``bucket`` routes (term, part) into the
single wide groupby.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from invertedindex_ray.config import IndexConfig
from invertedindex_ray.functions.hashing import term_bucket, url_hash_ids

_ID_SPACE_HASH = 2**63


def part_divisor(config: IndexConfig, num_docs: int) -> int:
    space = num_docs if config.id_mode == "dense" else _ID_SPACE_HASH
    p = max(1, config.num_doc_partitions)
    return max(1, -(-space // p))  # ceil


class PostingsExplode:
    def __init__(
        self,
        config: IndexConfig,
        num_docs: int,
        sorted_urls_ref=None,  # ray.ObjectRef of np.ndarray[object], dense mode
    ):
        self.config = config
        self.num_docs = num_docs
        self.divisor = part_divisor(config, num_docs)
        self._urls_ref = sorted_urls_ref
        self._sorted_urls = None

    def _resolve_ids(self, urls: np.ndarray) -> np.ndarray:
        if self.config.id_mode == "hash":
            return url_hash_ids(urls)
        if self._sorted_urls is None:
            import ray

            self._sorted_urls = ray.get(self._urls_ref)
        return np.searchsorted(self._sorted_urls, urls).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        terms_list = batch["terms"]
        terms_list = (
            terms_list.combine_chunks() if isinstance(terms_list, pa.ChunkedArray) else terms_list
        )
        tfs_list = batch["tfs"]
        tfs_list = (
            tfs_list.combine_chunks() if isinstance(tfs_list, pa.ChunkedArray) else tfs_list
        )
        offsets = terms_list.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lengths = offsets[1:] - offsets[:-1]

        urls = np.asarray(batch["url"].to_pylist(), dtype=object)
        doc_ids = self._resolve_ids(urls)
        doc_len = batch["doc_len"].to_numpy(zero_copy_only=False)

        flat_terms = terms_list.values
        flat_tfs = tfs_list.values
        rep_ids = np.repeat(doc_ids, lengths)
        rep_len = np.repeat(doc_len, lengths).astype(np.int32)
        parts = (rep_ids // self.divisor).astype(np.int32)

        # hash unique terms only (dictionary encode), then take
        import pyarrow.compute as pc

        d = pc.dictionary_encode(flat_terms)
        uniq = np.asarray(d.dictionary.to_pylist(), dtype=object)
        idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # bucket must mix term and part: compute on (uniq-hash taken) ^ part
        from invertedindex_ray.functions.hashing import hash_strings, _GOLDEN

        uh = hash_strings(uniq) if len(uniq) else np.empty(0, dtype=np.uint64)
        th = uh[idx] if len(idx) else np.empty(0, dtype=np.uint64)
        buckets = (
            (th ^ (parts.astype(np.uint64) * _GOLDEN)) % np.uint64(self.config.num_buckets)
        ).astype(np.int32)

        return pa.table(
            {
                "term": flat_terms,
                "doc_id": pa.array(rep_ids, type=pa.int64()),
                "tf": flat_tfs,
                "doc_len": pa.array(rep_len, type=pa.int32()),
                "part": pa.array(parts, type=pa.int32()),
                "bucket": pa.array(buckets, type=pa.int32()),
            }
        )
