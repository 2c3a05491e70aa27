"""Segment build stage: one shuffle-bucket of postings -> compressed
per-(term, part) posting segments on disk + slim stats for the lexicon.

Replaces the reference's k-way merge
(/root/reference/src/main/java/it/unipi/indexer/BinaryIndexer.java:92-223):
the ``groupby("bucket")`` hash shuffle brings every posting of a
(term, part) together; inside the group everything is vectorized numpy —
one lexsort, one d-gap pass, one VB encode of the whole bucket, slice per
run. Per-posting BM25 partial scores feed the term-upper-bound
(LexiconTermBinaryIndexing.java:39-57) via max-reduceat; the global idf
factor is applied later at lexicon build (see scoring.bm25_partial).

Resumable: each bucket writes ``segments/bucket={b}.parquet`` and a
``segstats/bucket={b}.parquet`` sidecar atomically; a rerun that finds
both returns the sidecar without re-encoding (per-partition lineage).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from invertedindex_ray.config import IndexConfig
from invertedindex_ray.functions import codec
from invertedindex_ray.state.manifest import atomic_write_table

SEGMENT_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("part", pa.int32()),
        ("df", pa.int64()),
        ("doc_ids_vb", pa.binary()),
        ("tfs_vb", pa.binary()),
        ("skips", pa.binary()),
    ]
)

STATS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("part", pa.int32()),
        ("bucket", pa.int32()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("maxp", pa.float64()),
    ]
)


def segment_path(index_dir: str, bucket: int) -> str:
    return os.path.join(index_dir, "segments", f"bucket={bucket}.parquet")


def segstats_path(index_dir: str, bucket: int) -> str:
    return os.path.join(index_dir, "segstats", f"bucket={bucket}.parquet")


class SegmentWriter:
    def __init__(self, index_dir: str, config: IndexConfig, avg_doc_len: float):
        self.index_dir = index_dir
        self.config = config
        self.avg_doc_len = avg_doc_len

    def __call__(self, group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return STATS_SCHEMA.empty_table()
        bucket = int(group["bucket"][0].as_py())
        seg_file = segment_path(self.index_dir, bucket)
        stats_file = segstats_path(self.index_dir, bucket)
        if os.path.exists(seg_file) and os.path.exists(stats_file):
            import pyarrow.parquet as pq

            return pq.read_table(stats_file)

        # rows are per-batch partial runs (stages/explode.py PostingsPartial):
        # term, part, bucket, doc_ids_vb, tfs_vb, n, cf, maxp — postings
        # arrive VB-compressed from the shuffle; decode all runs in one
        # vectorized pass (concatenate blobs -> vb_decode -> segmented
        # un-gap via cumsum with per-run offset correction)
        term_col = group["term"]
        term_col = term_col.combine_chunks() if isinstance(term_col, pa.ChunkedArray) else term_col
        d = pc.dictionary_encode(term_col)
        row_codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = d.dictionary
        row_part = group["part"].to_numpy(zero_copy_only=False).astype(np.int64)
        row_cf = group["cf"].to_numpy(zero_copy_only=False)
        row_maxp = group["maxp"].to_numpy(zero_copy_only=False)
        row_len = group["n"].to_numpy(zero_copy_only=False).astype(np.int64)

        def _concat_blobs(col) -> bytes:
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            return b"".join(col.to_pylist())

        gaps = codec.vb_decode(_concat_blobs(group["doc_ids_vb"])).astype(np.int64)
        flat_tfs = codec.vb_decode(_concat_blobs(group["tfs_vb"])).astype(np.int64)
        starts = np.zeros(len(row_len), dtype=np.int64)
        np.cumsum(row_len[:-1], out=starts[1:])
        c = np.cumsum(gaps)
        base = np.zeros(len(row_len), dtype=np.int64)
        base[1:] = c[starts[1:] - 1]  # cumsum just before each run start
        flat_ids = c - np.repeat(base, row_len)
        flat_codes = np.repeat(row_codes, row_len)
        flat_part = np.repeat(row_part, row_len)

        order = np.lexsort((flat_ids, flat_part, flat_codes))
        term_codes = flat_codes[order]
        doc_id = flat_ids[order]
        tf = flat_tfs[order]
        part = flat_part[order]

        # run boundaries on (term, part)
        n = len(doc_id)
        change = np.empty(n, dtype=bool)
        change[0] = True
        np.not_equal(term_codes[1:], term_codes[:-1], out=change[1:])
        change[1:] |= part[1:] != part[:-1]
        run_starts = np.flatnonzero(change)
        run_ends = np.append(run_starts[1:], n)
        df = run_ends - run_starts

        # d-gaps with per-run reset, one VB pass over the whole bucket
        gaps = doc_id.copy()
        gaps[1:] -= doc_id[:-1]
        gaps[run_starts] = doc_id[run_starts]
        # per-(term, part) stats: merge the per-batch partial aggregates
        row_order = np.lexsort((row_part, row_codes))
        rc, rp = row_codes[row_order], row_part[row_order]
        rchange = np.empty(len(rc), dtype=bool)
        rchange[0] = True
        np.not_equal(rc[1:], rc[:-1], out=rchange[1:])
        rchange[1:] |= rp[1:] != rp[:-1]
        rstarts = np.flatnonzero(rchange)
        cf = np.add.reduceat(row_cf[row_order], rstarts)
        maxp = np.maximum.reduceat(row_maxp[row_order], rstarts)

        stream_codec = getattr(self.config, "codec", "vb")
        if stream_codec == "vb":
            doc_stream, doc_ends = codec.vb_encode(gaps)
            tf_stream, tf_ends = codec.vb_encode(tf)

            # per-run byte slices
            run_doc_start = np.where(run_starts > 0, doc_ends[run_starts - 1], 0)
            run_doc_end = doc_ends[run_ends - 1]
            run_tf_start = np.where(run_starts > 0, tf_ends[run_starts - 1], 0)
            run_tf_end = tf_ends[run_ends - 1]

            doc_bytes = doc_stream.tobytes()
            tf_bytes = tf_stream.tobytes()
            threshold = self.config.skip_pointers_threshold
            n_runs = len(run_starts)
            doc_blobs: list[bytes] = []
            tf_blobs: list[bytes] = []
            skip_blobs: list[bytes] = []
            for r in range(n_runs):
                ds0, ds1 = int(run_doc_start[r]), int(run_doc_end[r])
                ts0, ts1 = int(run_tf_start[r]), int(run_tf_end[r])
                doc_blobs.append(doc_bytes[ds0:ds1])
                tf_blobs.append(tf_bytes[ts0:ts1])
                if df[r] > threshold:
                    s, e = run_starts[r], run_ends[r]
                    skip_blobs.append(
                        codec.build_skips(
                            doc_id[s:e],
                            doc_ends[s:e] - ds0,
                            tf_ends[s:e] - ts0,
                            threshold,
                        )
                    )
                else:
                    skip_blobs.append(b"")
        else:
            # Elias gamma/delta: bit-aligned self-describing blobs, one
            # encode per run (the non-default path; skip pointers store
            # BYTE offsets into a VB stream, so bit-aligned runs carry
            # none and their cursors decode the whole list)
            n_runs = len(run_starts)
            doc_blobs = [
                codec.encode_stream(gaps[s:e], stream_codec)
                for s, e in zip(run_starts, run_ends)
            ]
            tf_blobs = [
                codec.encode_stream(tf[s:e], stream_codec)
                for s, e in zip(run_starts, run_ends)
            ]
            skip_blobs = [b""] * n_runs

        run_terms = vocab.take(pa.array(term_codes[run_starts], type=pa.int64()))
        seg_table = pa.table(
            {
                "term": run_terms,
                "part": pa.array(part[run_starts].astype(np.int32), type=pa.int32()),
                "df": pa.array(df.astype(np.int64), type=pa.int64()),
                "doc_ids_vb": pa.array(doc_blobs, type=pa.binary()),
                "tfs_vb": pa.array(tf_blobs, type=pa.binary()),
                "skips": pa.array(skip_blobs, type=pa.binary()),
            }
        )
        stats_table = pa.table(
            {
                "term": run_terms,
                "part": pa.array(part[run_starts].astype(np.int32), type=pa.int32()),
                "bucket": pa.array(np.full(n_runs, bucket, dtype=np.int32), type=pa.int32()),
                "df": pa.array(df.astype(np.int64), type=pa.int64()),
                "cf": pa.array(cf.astype(np.int64), type=pa.int64()),
                "maxp": pa.array(maxp, type=pa.float64()),
            }
        )
        atomic_write_table(seg_file, seg_table)
        atomic_write_table(stats_file, stats_table)
        return stats_table
