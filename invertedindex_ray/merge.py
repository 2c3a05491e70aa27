"""Index merge — combine two built indexes into one index equivalent to
a single build over the concatenated corpus, WITHOUT re-tokenizing.

This is the incremental-ingestion path at scale: shards of a 100 TB
corpus build independent indexes (each one wide shuffle over its own
slice), then merges fold them together moving only the already
VB-compressed segment runs (~1-2 B/posting) plus the slim doc-table
rows. It generalizes the reference's SPIMI block merge
(BinaryIndexer.mergeBlocks, Indexer.java) from per-build temp blocks to
whole persisted indexes.

Why a merge must re-encode rather than concatenate: postings are
partitioned by doc-id RANGE (``part = doc_id // part_divisor``,
stages/explode.py:28-32) and the divisor depends on the total doc
count, so a merged index re-assigns parts; and the per-term MaxScore
upper bound (``maxp``) depends on the corpus ``avg_doc_len``, which
changes under the union. Both require decoding the runs — but decoding
compressed runs is still orders cheaper than re-tokenizing, and the
re-encode reuses the exact vectorized machinery of the build
(stages/segment.py SegmentWriter), so the merged index is
bit-compatible with a fresh build's artifacts.

Pipeline shape (all streaming):
  read segments(A) ─┐  map_batches: decode runs, offset ids (dense),
  read segments(B) ─┴─ re-part / re-bucket, recompute maxp ──▶ union
   ──▶ sort(bucket) ──▶ SegmentWriter (per-bucket atomic files)
   ──▶ groupby(term) lexicon (tub under the merged avg_doc_len)
Doc tables: dense mode copies shard A's part files and rewrites shard
B's with offset ids (per-file Ray tasks, filename order preserves the
positional layout); hash mode re-sorts the union by doc_id (slim rows)
and verifies id uniqueness (duplicate content across shards would
corrupt posting lists).

Contract: both indexes must share an identical config fingerprint; in
dense id mode the merged ingestion order is "all of A, then all of B".
"""

from __future__ import annotations

from invertedindex_ray.sources.io import read_parquet_clean as _rpq

import os
import shutil

import numpy as np
import pyarrow as pa

from invertedindex_ray.config import IndexConfig
from invertedindex_ray.functions import codec
from invertedindex_ray.functions.hashing import term_bucket
from invertedindex_ray.stages.explode import part_divisor
from invertedindex_ray.stages.segment import STATS_SCHEMA, SegmentWriter

_PARTIAL_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("part", pa.int32()),
        ("bucket", pa.int32()),
        ("doc_ids_vb", pa.binary()),
        ("tfs_vb", pa.binary()),
        ("n", pa.int32()),
        ("cf", pa.int64()),
        ("maxp", pa.float64()),
    ]
)


def _concat_blobs(col) -> bytes:
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return b"".join(col.to_pylist())


def _blob_array(stream: np.ndarray, ends: np.ndarray, run_starts, run_ends) -> pa.Array:
    """Per-run byte slices of one VB stream as a binary array without
    copying per blob (same layout trick as stages/explode.py:165-172)."""
    byte_offsets = np.zeros(len(run_starts) + 1, dtype=np.int32)
    if len(run_starts):
        byte_offsets[1:] = ends[run_ends - 1]
    return pa.Array.from_buffers(
        pa.binary(),
        len(run_starts),
        [None, pa.py_buffer(byte_offsets.tobytes()), pa.py_buffer(stream.tobytes())],
    )


def _repartition_runs(
    batch: pa.Table,
    *,
    id_offset: int,
    divisor: int,
    num_buckets: int,
    avg_doc_len: float,
    k1: float,
    b: float,
    stream_codec: str = "vb",
    doc_len_arr: np.ndarray,
    doc_ids_arr: np.ndarray | None,
    delete_sorted: np.ndarray | None = None,
    renumber: bool = False,
) -> pa.Table:
    """One batch of a shard's persisted segment rows -> partial-run rows
    in the build shuffle's schema, with ids offset, parts/buckets
    reassigned under the merged divisor, and maxp recomputed under the
    merged avg_doc_len. ``delete_sorted`` drops those doc ids from every
    run; ``renumber`` re-densifies the survivors (new_id = old_id minus
    the number of deleted ids below it — the dense-mode deletion
    semantic, which makes the result bit-equal to a fresh build over
    the remaining corpus in the original ingestion order).
    Decode/boundary/encode patterns mirror stages/segment.py:84-131
    (cited, shared provenance)."""
    if batch.num_rows == 0:
        return _PARTIAL_SCHEMA.empty_table()
    from invertedindex_ray.functions.scoring import bm25_partial

    import pyarrow.compute as pc

    row_len = batch["df"].to_numpy(zero_copy_only=False).astype(np.int64)
    if stream_codec == "vb":
        gaps = codec.vb_decode(_concat_blobs(batch["doc_ids_vb"])).astype(np.int64)
        tf = codec.vb_decode(_concat_blobs(batch["tfs_vb"])).astype(np.int64)
    else:
        # bit-aligned blobs are self-describing per run: decode each and
        # concatenate (non-default path; transport stays VB below)
        gaps = np.concatenate(
            [codec.decode_stream(blob, stream_codec)
             for blob in batch["doc_ids_vb"].to_pylist()]
            or [np.empty(0, dtype=np.int64)]
        )
        tf = np.concatenate(
            [codec.decode_stream(blob, stream_codec)
             for blob in batch["tfs_vb"].to_pylist()]
            or [np.empty(0, dtype=np.int64)]
        )
    starts = np.zeros(len(row_len), dtype=np.int64)
    np.cumsum(row_len[:-1], out=starts[1:])
    c = np.cumsum(gaps)
    base = np.zeros(len(row_len), dtype=np.int64)
    base[1:] = c[starts[1:] - 1]
    orig_ids = c - np.repeat(base, row_len)  # absolute shard-local ids
    row_idx = np.repeat(np.arange(len(row_len), dtype=np.int64), row_len)

    if delete_sorted is not None and len(delete_sorted):
        pos = np.searchsorted(delete_sorted, orig_ids)
        clipped = np.minimum(pos, len(delete_sorted) - 1)
        gone = delete_sorted[clipped] == orig_ids
        keep = ~gone
        orig_ids, tf, row_idx = orig_ids[keep], tf[keep], row_idx[keep]
        if not len(orig_ids):
            return _PARTIAL_SCHEMA.empty_table()

    if renumber and delete_sorted is not None and len(delete_sorted):
        new_ids = orig_ids - np.searchsorted(delete_sorted, orig_ids) + id_offset
    else:
        new_ids = orig_ids + id_offset
    new_part = new_ids // divisor

    n = len(new_ids)
    change = np.empty(n, dtype=bool)
    change[0] = True
    np.not_equal(row_idx[1:], row_idx[:-1], out=change[1:])
    change[1:] |= new_part[1:] != new_part[:-1]
    run_starts = np.flatnonzero(change)
    run_ends = np.append(run_starts[1:], n)

    # doc_len lookup: positional in dense shards, searchsorted in hash
    if doc_ids_arr is None:
        dl = doc_len_arr[orig_ids]
    else:
        dl = doc_len_arr[np.searchsorted(doc_ids_arr, orig_ids)]
    partial = bm25_partial(tf, dl, avg_doc_len, k1, b)
    maxp = np.maximum.reduceat(partial, run_starts)
    cf = np.add.reduceat(tf, run_starts)

    gaps_out = new_ids.copy()
    gaps_out[1:] -= new_ids[:-1]
    gaps_out[run_starts] = new_ids[run_starts]
    id_stream, id_ends = codec.vb_encode(gaps_out)
    tf_stream, tf_ends = codec.vb_encode(tf)

    term_col = batch["term"]
    term_col = (
        term_col.combine_chunks() if isinstance(term_col, pa.ChunkedArray) else term_col
    )
    run_terms = term_col.take(pa.array(row_idx[run_starts], type=pa.int64()))
    run_parts = new_part[run_starts]
    buckets = term_bucket(
        np.asarray(run_terms.to_pylist(), dtype=object), run_parts, num_buckets
    )
    return pa.table(
        {
            "term": run_terms,
            "part": pa.array(run_parts.astype(np.int32), type=pa.int32()),
            "bucket": pa.array(buckets, type=pa.int32()),
            "doc_ids_vb": _blob_array(id_stream, id_ends, run_starts, run_ends),
            "tfs_vb": _blob_array(tf_stream, tf_ends, run_starts, run_ends),
            "n": pa.array((run_ends - run_starts).astype(np.int32), type=pa.int32()),
            "cf": pa.array(cf.astype(np.int64), type=pa.int64()),
            "maxp": pa.array(maxp, type=pa.float64()),
        }
    )


def _shard_partials(index_dir: str, id_offset: int, divisor: int,
                    cfg: IndexConfig, avg_new: float,
                    delete_ref=None, renumber: bool = False):
    """Lazy Dataset of re-partitioned partial runs for one shard.
    ``delete_ref``: ray.ObjectRef of a sorted int64 array of doc ids to
    drop (broadcast once, read per task)."""
    import ray
    import ray.data as rd

    from invertedindex_ray.state.disktables import DocTable

    dt = DocTable(os.path.join(index_dir, "doc_table"), mode="ondisk")
    dl_ref = ray.put(dt.doc_len)
    ids_ref = ray.put(dt.doc_ids)  # None for dense shards

    def f(batch: pa.Table) -> pa.Table:
        import ray as _ray

        return _repartition_runs(
            batch,
            id_offset=id_offset,
            divisor=divisor,
            num_buckets=cfg.num_buckets,
            stream_codec=getattr(cfg, "codec", "vb"),
            avg_doc_len=avg_new,
            k1=cfg.bm25_k1,
            b=cfg.bm25_b,
            doc_len_arr=_ray.get(dl_ref),
            doc_ids_arr=_ray.get(ids_ref),
            delete_sorted=_ray.get(delete_ref) if delete_ref is not None else None,
            renumber=renumber,
        )

    return _rpq(os.path.join(index_dir, "segments")).map_batches(
        f, batch_format="pyarrow"
    )


def _merge_doc_tables_dense(dir_a: str, dir_b: str, out_dir: str, offset: int) -> None:
    """Copy shard A's part files, rewrite shard B's with offset ids.
    One Ray task per file; 'a-'/'b-' filename prefixes preserve the
    global doc-id order the positional DocTable layout requires."""
    import ray

    from invertedindex_ray.state.disktables import _parquet_files

    out = os.path.join(out_dir, "doc_table")
    os.makedirs(out, exist_ok=True)

    @ray.remote
    def copy_file(src: str, dst: str) -> None:
        shutil.copyfile(src, dst)

    @ray.remote
    def shift_file(src: str, dst: str, off: int) -> None:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        t = pq.read_table(src)
        t = t.set_column(
            t.schema.get_field_index("doc_id"),
            "doc_id",
            pc.add(t["doc_id"], off).cast(pa.int64()),
        )
        pq.write_table(t, dst)

    tasks = [
        copy_file.remote(f, os.path.join(out, f"a-{os.path.basename(f)}"))
        for f in _parquet_files(os.path.join(dir_a, "doc_table"))
    ] + [
        shift_file.remote(f, os.path.join(out, f"b-{os.path.basename(f)}"), offset)
        for f in _parquet_files(os.path.join(dir_b, "doc_table"))
    ]
    ray.get(tasks)


def _merge_doc_tables_hash(dir_a: str, dir_b: str, out_dir: str) -> None:
    """Union + re-sort the slim doc tables by doc_id; duplicate content
    hashes across shards (same url indexed twice) are an error — checked
    block-locally during the write plus across block boundaries from the
    written files' parquet column stats (complete on sorted data)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    out = os.path.join(out_dir, "doc_table")

    def check_block(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        if len(ids) > 1 and (ids[1:] == ids[:-1]).any():
            dup = int(ids[np.flatnonzero(ids[1:] == ids[:-1])[0]])
            raise ValueError(
                f"hash-mode merge: doc id {dup} exists in both indexes "
                "(same url indexed twice) — deduplicate the corpora first"
            )
        return batch

    (
        _rpq(os.path.join(dir_a, "doc_table"))
        .union(_rpq(os.path.join(dir_b, "doc_table")))
        .sort("doc_id")
        .map_batches(check_block, batch_format="pyarrow")
        .write_parquet(out)
    )
    # cross-file boundary check from parquet stats (no data read)
    from invertedindex_ray.state.disktables import _parquet_files

    bounds = []
    for f in _parquet_files(out):
        m = pq.ParquetFile(f).metadata
        if m.num_rows == 0:
            continue
        col = m.schema.to_arrow_schema().get_field_index("doc_id")
        mins = [m.row_group(i).column(col).statistics.min for i in range(m.num_row_groups)]
        maxs = [m.row_group(i).column(col).statistics.max for i in range(m.num_row_groups)]
        bounds.append((min(mins), max(maxs)))
    bounds.sort()
    for (lo_a, hi_a), (lo_b, _) in zip(bounds, bounds[1:]):
        if lo_b <= hi_a:
            raise ValueError(
                "hash-mode merge: duplicate doc id across output files "
                f"(file max {hi_a} >= next file min {lo_b})"
            )


def _write_segments_and_lexicon(out_dir: str, cfg: IndexConfig, stats,
                                partials, builder, what: str) -> None:
    """Shared tail of merge/delete: bucket-sort the partial runs, write
    segments through the build's own SegmentWriter, finish the lexicon,
    and enforce token conservation (Σcf == corpus tokens)."""
    import ray.data as rd

    shuffled = partials.sort("bucket")
    writer = SegmentWriter(out_dir, cfg, stats.avg_doc_len)

    def write_segment_block(block: pa.Table) -> pa.Table:
        # same whole-bucket slicing contract as build.py:543-558
        if block.num_rows == 0:
            return STATS_SCHEMA.empty_table()
        buckets = block["bucket"].to_numpy(zero_copy_only=False)
        change = np.flatnonzero(buckets[1:] != buckets[:-1]) + 1
        b_starts = np.concatenate(([0], change))
        b_ends = np.concatenate((change, [len(buckets)]))
        outs = [
            writer(block.slice(int(s), int(e - s))) for s, e in zip(b_starts, b_ends)
        ]
        return pa.concat_tables(outs) if outs else STATS_SCHEMA.empty_table()

    seg_stats = shuffled.map_batches(
        write_segment_block, batch_format="pyarrow", batch_size=None
    )
    builder._finish_lexicon(seg_stats, stats)

    # token-conservation guard (same invariant as build.py:646-667)
    if os.path.isdir(os.path.join(out_dir, "segstats")):
        from ray.data.aggregate import Sum

        seg = _rpq(os.path.join(out_dir, "segstats"))
        cf_total = int(
            seg.aggregate(Sum("cf", alias_name="cf_total")).get("cf_total", 0) or 0
        )
        if cf_total != stats.total_tokens:
            raise RuntimeError(
                f"{what} lost or duplicated postings: sum(cf) = {cf_total} "
                f"but the corpus has {stats.total_tokens} tokens"
            )

    stats.save(out_dir)
    builder.manifest.mark_complete(
        "stats", num_docs=stats.num_docs, total_tokens=stats.total_tokens
    )
    builder.manifest.mark_complete("doc_table", num_docs=stats.num_docs)
    builder.manifest.mark_complete("segments")
    builder.manifest.mark_complete("lexicon")
    builder.manifest.mark_complete("build")


def merge_indexes(dir_a: str, dir_b: str, out_dir: str):
    """Merge two built indexes into ``out_dir``; returns the merged
    CollectionStats. Requires identical config fingerprints. Dense id
    mode offsets shard B's ids by shard A's doc count (ingestion order
    "A then B"); hash mode requires url-disjoint corpora."""
    import ray.data as rd

    from invertedindex_ray.build import CollectionStats, IndexBuilder

    cfg_a, cfg_b = IndexConfig.load(dir_a), IndexConfig.load(dir_b)
    if cfg_a is None or cfg_b is None:
        raise ValueError("both inputs must be built indexes (config.json missing)")
    if cfg_a.fingerprint() != cfg_b.fingerprint():
        raise ValueError(
            "config fingerprints differ "
            f"({cfg_a.fingerprint()} vs {cfg_b.fingerprint()}); indexes "
            "built under different configs cannot be merged"
        )
    cfg = cfg_a
    stats_a = CollectionStats.load(dir_a)
    stats_b = CollectionStats.load(dir_b)
    if os.path.isdir(out_dir) and os.listdir(out_dir):
        raise ValueError(f"merge target {out_dir} exists and is not empty")
    os.makedirs(out_dir, exist_ok=True)

    num_docs = stats_a.num_docs + stats_b.num_docs
    total_tokens = stats_a.total_tokens + stats_b.total_tokens
    avg = (total_tokens / num_docs) if num_docs else 0.0
    stats = CollectionStats(
        num_docs=num_docs, total_tokens=total_tokens, avg_doc_len=avg
    )
    offset_b = stats_a.num_docs if cfg.id_mode == "dense" else 0
    divisor = part_divisor(cfg, num_docs)

    builder = IndexBuilder(out_dir, cfg)
    cfg.save(out_dir)

    # ---- doc table
    if cfg.id_mode == "dense":
        _merge_doc_tables_dense(dir_a, dir_b, out_dir, offset_b)
    else:
        _merge_doc_tables_hash(dir_a, dir_b, out_dir)

    # ---- segments + lexicon (one fused execution, as in the build:
    # build.py:624-668)
    partials = _shard_partials(dir_a, 0, divisor, cfg, avg).union(
        _shard_partials(dir_b, offset_b, divisor, cfg, avg)
    )
    _write_segments_and_lexicon(out_dir, cfg, stats, partials, builder, "merge")
    return stats


def delete_docs(index_dir: str, out_dir: str, doc_ids) -> "object":
    """Delete ``doc_ids`` from a built index, writing the result to
    ``out_dir`` WITHOUT re-tokenizing — the retraction half of
    incremental maintenance (merge_indexes is the addition half).

    Dense id mode re-densifies the survivors (new_id = old_id minus the
    number of deleted ids below it), so the output is bit-equal to a
    fresh build over the remaining corpus in the original ingestion
    order. Hash mode keeps ids (content-derived) — also fresh-build
    equal. Per-term df/cf, the part divisor and every MaxScore bound
    (avg_doc_len changes!) are recomputed; unknown ids fail loudly.

    Scale shape: the deleted-id set is broadcast ONCE (``ray.put`` of a
    sorted int64 array; deletion lists are assumed small relative to
    the corpus — GDPR erasure, spam takedowns) and every segment batch
    drops ids with one vectorized searchsorted; only the surviving
    VB-compressed runs re-shuffle.
    """
    import ray
    import ray.data as rd

    from invertedindex_ray.build import CollectionStats, IndexBuilder
    from invertedindex_ray.state.disktables import DocTable, _parquet_files

    cfg = IndexConfig.load(index_dir)
    if cfg is None:
        raise ValueError("input must be a built index (config.json missing)")
    stats_old = CollectionStats.load(index_dir)
    if os.path.isdir(out_dir) and os.listdir(out_dir):
        raise ValueError(f"delete target {out_dir} exists and is not empty")
    os.makedirs(out_dir, exist_ok=True)

    del_sorted = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
    dt = DocTable(os.path.join(index_dir, "doc_table"), mode="ondisk")
    if cfg.id_mode == "dense":
        bad = del_sorted[(del_sorted < 0) | (del_sorted >= stats_old.num_docs)]
        if len(bad):
            raise ValueError(f"unknown doc ids (dense 0..{stats_old.num_docs - 1}): {bad[:5]}")
        deleted_tokens = int(dt.doc_len[del_sorted].sum())
    else:
        pos = np.searchsorted(dt.doc_ids, del_sorted)
        clipped = np.minimum(pos, len(dt.doc_ids) - 1)
        missing = del_sorted[(pos >= len(dt.doc_ids)) | (dt.doc_ids[clipped] != del_sorted)]
        if len(missing):
            raise ValueError(f"unknown doc ids: {missing[:5]}")
        deleted_tokens = int(dt.doc_len[np.searchsorted(dt.doc_ids, del_sorted)].sum())

    num_docs = stats_old.num_docs - len(del_sorted)
    total_tokens = stats_old.total_tokens - deleted_tokens
    avg = (total_tokens / num_docs) if num_docs else 0.0
    stats = CollectionStats(
        num_docs=num_docs, total_tokens=total_tokens, avg_doc_len=avg
    )
    divisor = part_divisor(cfg, num_docs) if num_docs else 1
    renumber = cfg.id_mode == "dense"
    del_ref = ray.put(del_sorted)

    builder = IndexBuilder(out_dir, cfg)
    cfg.save(out_dir)

    # ---- doc table: per-file rewrite (same basenames keep the global
    # positional order dense DocTable requires)
    out_dt = os.path.join(out_dir, "doc_table")
    os.makedirs(out_dt, exist_ok=True)

    @ray.remote
    def rewrite_file(src: str, dst: str, renum: bool) -> None:
        import pyarrow.parquet as pq_mod

        t = pq_mod.read_table(src)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dels = ray.get(del_ref)
        pos = np.searchsorted(dels, ids)
        clipped = np.minimum(pos, len(dels) - 1) if len(dels) else pos
        keep = ~(dels[clipped] == ids) if len(dels) else np.ones(len(ids), bool)
        t = t.filter(pa.array(keep))
        if renum and len(dels):
            ids_k = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            new = ids_k - np.searchsorted(dels, ids_k)
            t = t.set_column(
                t.schema.get_field_index("doc_id"),
                "doc_id",
                pa.array(new, type=pa.int64()),
            )
        pq_mod.write_table(t, dst)

    ray.get(
        [
            rewrite_file.remote(f, os.path.join(out_dt, os.path.basename(f)), renumber)
            for f in _parquet_files(os.path.join(index_dir, "doc_table"))
        ]
    )

    partials = _shard_partials(
        index_dir, 0, divisor, cfg, avg, delete_ref=del_ref, renumber=renumber
    )
    _write_segments_and_lexicon(out_dir, cfg, stats, partials, builder, "delete")
    return stats


def convert_codec(index_dir: str, out_dir: str, codec: str):
    """Re-encode a built index's posting streams under another codec
    (IndexConfig.codec: vb | gamma | delta) WITHOUT re-tokenizing and
    WITHOUT any shuffle — the codec-migration half of day-2 index
    maintenance (merge/delete/upsert are the content half).

    Doc ids, parts, buckets, run order, df/cf/tub, the doc table and
    the collection stats are all invariant under the stream codec, so
    every artifact except the segment blobs copies verbatim and each
    segment bucket file converts INDEPENDENTLY — one Ray task per
    file, no exchange at all. At petabyte index scale that means a
    codec migration moves each compressed byte exactly twice (read +
    write) with embarrassing parallelism, and a killed run resumes by
    skipping files that already exist (same per-file atomicity as the
    build). Skip pointers are rebuilt for a VB target (byte offsets
    are codec-specific) and dropped for bit-aligned targets, exactly
    as a fresh build under the target codec would."""
    import dataclasses

    import ray

    from invertedindex_ray.build import CollectionStats, IndexBuilder
    from invertedindex_ray.state.disktables import _parquet_files

    cfg = IndexConfig.load(index_dir)
    if cfg is None:
        raise ValueError("input must be a built index (config.json missing)")
    src_codec = getattr(cfg, "codec", "vb")
    if codec == src_codec:
        raise ValueError(f"index already uses codec {codec!r}")
    new_cfg = dataclasses.replace(cfg, codec=codec)  # __post_init__ validates
    if os.path.isdir(out_dir) and os.listdir(out_dir):
        # resume is allowed ONLY into a partial convert of this exact
        # target config (per-file skip semantics below); anything else
        # is refused rather than silently mixed
        prev = IndexConfig.load(out_dir)
        if prev is None or prev.fingerprint() != new_cfg.fingerprint():
            raise ValueError(
                f"convert target {out_dir} exists and is not a partial "
                "convert under the same config"
            )
    os.makedirs(out_dir, exist_ok=True)
    builder = IndexBuilder(out_dir, new_cfg)
    new_cfg.save(out_dir)

    @ray.remote
    def copy_file(src: str, dst: str) -> None:
        # tmp + rename: resume skips existing files, so a torn direct
        # copy would survive as a permanently truncated artifact
        if not os.path.exists(dst):
            tmp = dst + ".tmp"
            shutil.copyfile(src, tmp)
            os.replace(tmp, dst)

    threshold = cfg.skip_pointers_threshold
    dst_codec = new_cfg.codec

    @ray.remote
    def convert_file(src: str, dst: str) -> None:
        if os.path.exists(dst):
            return  # resume: this bucket already converted
        import pyarrow.parquet as pq

        from invertedindex_ray.functions import codec as cmod
        from invertedindex_ray.state.manifest import atomic_write_table

        t = pq.read_table(src)
        new_d: list[bytes] = []
        new_t: list[bytes] = []
        new_s: list[bytes] = []
        for d, tf in zip(t["doc_ids_vb"].to_pylist(), t["tfs_vb"].to_pylist()):
            ids, tfs = cmod.decode_posting_list(d, tf, src_codec)
            if dst_codec == "vb":
                db, tb, sk = cmod.encode_posting_list(ids, tfs, threshold)
            else:
                gaps = ids.copy()
                gaps[1:] -= ids[:-1]
                db = cmod.encode_stream(gaps, dst_codec)
                tb = cmod.encode_stream(tfs, dst_codec)
                sk = b""
            new_d.append(db)
            new_t.append(tb)
            new_s.append(sk)
        for name, vals in (
            ("doc_ids_vb", new_d), ("tfs_vb", new_t), ("skips", new_s)
        ):
            t = t.set_column(
                t.schema.get_field_index(name), name,
                pa.array(vals, type=pa.binary()),
            )
        atomic_write_table(dst, t)

    tasks = []
    # codec-invariant artifacts copy verbatim (per-file Ray tasks)
    for sub in ("doc_table", "lexicon", "segstats"):
        sdir = os.path.join(index_dir, sub)
        if not os.path.isdir(sdir):
            continue
        ddir = os.path.join(out_dir, sub)
        os.makedirs(ddir, exist_ok=True)
        tasks += [
            copy_file.remote(f, os.path.join(ddir, os.path.basename(f)))
            for f in _parquet_files(sdir)
        ]
    seg_out = os.path.join(out_dir, "segments")
    os.makedirs(seg_out, exist_ok=True)
    tasks += [
        convert_file.remote(f, os.path.join(seg_out, os.path.basename(f)))
        for f in _parquet_files(os.path.join(index_dir, "segments"))
    ]
    ray.get(tasks)

    stats = CollectionStats.load(index_dir)
    stats.save(out_dir)
    builder.manifest.mark_complete(
        "stats", num_docs=stats.num_docs, total_tokens=stats.total_tokens
    )
    builder.manifest.mark_complete("doc_table", num_docs=stats.num_docs)
    builder.manifest.mark_complete("segments")
    builder.manifest.mark_complete("lexicon")
    builder.manifest.mark_complete("build")
    return stats


def upsert_docs(index_dir: str, out_dir: str, pages, *, scratch_dir: str | None = None):
    """Upsert (hash id mode only): re-index the ``pages`` delta and fold
    it into an existing index WITHOUT re-tokenizing the base corpus —
    the day-2 crawl refresh. Steps:

    1. build a delta index from ``pages`` under the base config;
    2. :func:`delete_docs` from the base every doc id that also appears
       in the delta (ids are ``url_hash_ids``, so an updated url maps
       to the same id — its stale postings are retracted);
    3. :func:`merge_indexes` the pruned base with the delta.

    Result is bit-equal to a fresh build over (base corpus minus
    updated urls) + delta. Dense mode is refused: dense ids encode
    ingestion order, which an in-place update cannot preserve — rebuild
    or switch to hash ids for mutable corpora.

    Only the delta tokenizes; the base moves as compressed runs
    (delete + merge), so the cost is O(delta) + O(index bytes), never
    O(corpus tokens)."""
    import shutil as _shutil
    import tempfile

    from invertedindex_ray.build import IndexBuilder
    from invertedindex_ray.state.disktables import DocTable

    cfg = IndexConfig.load(index_dir)
    if cfg is None:
        raise ValueError("input must be a built index (config.json missing)")
    if cfg.id_mode != "hash":
        raise ValueError(
            "upsert requires id_mode='hash' (dense ids encode ingestion "
            "order, which an in-place update cannot preserve)"
        )
    if os.path.isdir(out_dir) and os.listdir(out_dir):
        raise ValueError(f"upsert target {out_dir} exists and is not empty")

    scratch = scratch_dir or tempfile.mkdtemp(prefix="iidx-upsert-")
    delta_dir = os.path.join(scratch, "delta")
    pruned_dir = os.path.join(scratch, "pruned")
    try:
        IndexBuilder(delta_dir, cfg).build(pages)
        delta_ids = DocTable(os.path.join(delta_dir, "doc_table"), mode="ondisk").doc_ids
        base_ids = DocTable(os.path.join(index_dir, "doc_table"), mode="ondisk").doc_ids
        overlap = np.intersect1d(delta_ids, base_ids)
        if len(overlap):
            delete_docs(index_dir, pruned_dir, overlap)
            base_for_merge = pruned_dir
        else:
            base_for_merge = index_dir
        merge_indexes(base_for_merge, delta_dir, out_dir)
    finally:
        if scratch_dir is None:
            _shutil.rmtree(scratch, ignore_errors=True)
    from invertedindex_ray.build import CollectionStats

    return CollectionStats.load(out_dir)
