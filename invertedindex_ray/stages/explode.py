"""Postings explode stage: stamped tokenized docs (doc_id, doc_len, terms,
tfs) -> (term, doc_id, tf, doc_len, part, bucket) posting rows.

Doc ids are assigned upstream by the prepare stage (build.py): ``dense``
mode stamps the rank of url in sorted order distributively (per-block
prefix sums — no driver-side URL array, no broadcast); ``hash`` mode
stamps a 63-bit deterministic url hash (zero coordination, the 10^12-doc
path; posting-list order is hash order — still a deterministic total
order, which is all the DAAT engine needs). Either way the explode input
arrives in ascending doc-id order, so per-batch runs are nearly sorted
and d-gaps stay small (SURVEY.md §2 J1/J2).

``part`` is the contiguous doc-id range partition (document-partitioned
index, SURVEY.md §4 skew row); ``bucket`` routes (term, part) into the
single wide groupby.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from invertedindex_ray.config import IndexConfig

_ID_SPACE_HASH = 2**63


def part_divisor(config: IndexConfig, num_docs: int) -> int:
    space = num_docs if config.id_mode == "dense" else _ID_SPACE_HASH
    p = max(1, config.num_doc_partitions)
    return max(1, -(-space // p))  # ceil


class PostingsExplode:
    def __init__(self, config: IndexConfig, num_docs: int):
        self.config = config
        self.num_docs = num_docs
        self.divisor = part_divisor(config, num_docs)

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

        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
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
    (term, part) per batch with the postings **VB-compressed** plus
    partial aggregates (cf, max BM25 partial score) — the SPIMI in-memory
    block reborn as a per-batch combine (SURVEY.md §2 ST1), with the
    spill-block compression (BinaryIndexer.writeBlockToDisk) moved into
    the shuffle itself.

    Cuts the wide shuffle from one 12+-byte row per posting to ~1-2
    bytes per posting: doc ids are d-gapped + variable-byte encoded per
    sorted run, tfs VB'd, so the all-to-all moves compressed binary blobs.
    Doc-len-dependent scoring happens map-side; doc_len never shuffles.
    """

    def __init__(self, config, num_docs: int, avg_doc_len: float):
        super().__init__(config, num_docs)
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
                    "doc_ids_vb": pa.array([], type=pa.binary()),
                    "tfs_vb": pa.array([], type=pa.binary()),
                    "n": pa.array([], type=pa.int32()),
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

        # d-gap within each run (first value absolute), then one VB encode
        # over the whole batch; per-run blob = contiguous byte slice
        from invertedindex_ray.functions import codec

        gaps = doc_id.copy()
        gaps[1:] -= doc_id[:-1]
        gaps[run_starts] = doc_id[run_starts]
        id_stream, id_ends = codec.vb_encode(gaps)
        tf_stream, tf_ends = codec.vb_encode(tf)

        def _blob_array(stream: np.ndarray, ends: np.ndarray) -> pa.Array:
            byte_offsets = np.zeros(len(run_starts) + 1, dtype=np.int32)
            byte_offsets[1:] = ends[run_ends - 1]
            return pa.Array.from_buffers(
                pa.binary(),
                len(run_starts),
                [None, pa.py_buffer(byte_offsets.tobytes()), pa.py_buffer(stream.tobytes())],
            )

        return pa.table(
            {
                "term": vocab.take(pa.array(codes[run_starts], type=pa.int64())),
                "part": pa.array(part[run_starts].astype(np.int32), type=pa.int32()),
                "bucket": pa.array(bucket[run_starts], type=pa.int32()),
                "doc_ids_vb": _blob_array(id_stream, id_ends),
                "tfs_vb": _blob_array(tf_stream, tf_ends),
                "n": pa.array((run_ends - run_starts).astype(np.int32), type=pa.int32()),
                "cf": pa.array(cf, type=pa.int64()),
                "maxp": pa.array(maxp, type=pa.float64()),
            }
        )
