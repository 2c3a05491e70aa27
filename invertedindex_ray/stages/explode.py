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


class PostingsPartial(PostingsExplode):
    """Combiner variant of the explode stage: emits ONE row per
    (term, part) per batch with the postings as sorted list columns plus
    partial aggregates (cf, max BM25 partial score) — the SPIMI in-memory
    block reborn as a per-batch combine (SURVEY.md §2 ST1).

    Cuts the wide shuffle from one row per posting (with a term string
    each) to one row per distinct (term, part) per batch, and moves the
    doc_len-dependent scoring work into the embarrassingly-parallel map
    stage so doc_len never shuffles at all.
    """

    def __init__(self, config, num_docs: int, avg_doc_len: float, sorted_urls_ref=None):
        super().__init__(config, num_docs, sorted_urls_ref)
        self.avg_doc_len = avg_doc_len

    def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
        from invertedindex_ray.functions.scoring import bm25_partial

        t = super().__call__(batch)
        term = t["term"]
        term = term.combine_chunks() if isinstance(term, pa.ChunkedArray) else term
        import pyarrow.compute as pc

        d = pc.dictionary_encode(term)
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = d.dictionary
        doc_id = t["doc_id"].to_numpy(zero_copy_only=False)
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc_len = t["doc_len"].to_numpy(zero_copy_only=False)
        part = t["part"].to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = t["bucket"].to_numpy(zero_copy_only=False)

        order = np.lexsort((doc_id, part, codes))
        codes, doc_id, tf, doc_len, part, bucket = (
            codes[order], doc_id[order], tf[order], doc_len[order],
            part[order], bucket[order],
        )
        n = len(doc_id)
        if n == 0:
            return pa.table(
                {
                    "term": pa.array([], type=pa.string()),
                    "part": pa.array([], type=pa.int32()),
                    "bucket": pa.array([], type=pa.int32()),
                    "doc_ids": pa.array([], type=pa.list_(pa.int64())),
                    "tfs": pa.array([], type=pa.list_(pa.int32())),
                    "cf": pa.array([], type=pa.int64()),
                    "maxp": pa.array([], type=pa.float64()),
                }
            )
        change = np.empty(n, dtype=bool)
        change[0] = True
        np.not_equal(codes[1:], codes[:-1], out=change[1:])
        change[1:] |= part[1:] != part[:-1]
        run_starts = np.flatnonzero(change)
        run_ends = np.append(run_starts[1:], n)

        partial = bm25_partial(
            tf, doc_len, self.avg_doc_len, self.config.bm25_k1, self.config.bm25_b
        )
        cf = np.add.reduceat(tf, run_starts)
        maxp = np.maximum.reduceat(partial, run_starts)

        offsets = np.concatenate(([0], run_ends)).astype(np.int64)
        id_lists = pa.ListArray.from_arrays(
            pa.array(offsets.astype(np.int32), type=pa.int32()),
            pa.array(doc_id, type=pa.int64()),
        )
        tf_lists = pa.ListArray.from_arrays(
            pa.array(offsets.astype(np.int32), type=pa.int32()),
            pa.array(tf.astype(np.int32), type=pa.int32()),
        )
        return pa.table(
            {
                "term": vocab.take(pa.array(codes[run_starts], type=pa.int64())),
                "part": pa.array(part[run_starts].astype(np.int32), type=pa.int32()),
                "bucket": pa.array(bucket[run_starts], type=pa.int32()),
                "doc_ids": id_lists,
                "tfs": tf_lists,
                "cf": pa.array(cf, type=pa.int64()),
                "maxp": pa.array(maxp, type=pa.float64()),
            }
        )
