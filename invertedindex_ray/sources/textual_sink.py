"""Textual (ASCII) debug dump of a built index — the reference's
TextualIndexer (/root/reference/src/main/java/it/unipi/indexer/
TextualIndexer.java:21-183) kept a human-diffable mirror of the binary
index; this is the Ray Data analog: decode the VB segments back to plain
postings and write them as sorted CSV lines

    term,part,df,doc_ids,tfs

with doc_ids/tfs space-joined. Used as a debugging oracle for the binary
path (SURVEY.md §5 item 4): tests diff this dump against the pure-Python
expected index.
"""

from __future__ import annotations

from invertedindex_ray.sources.io import read_parquet_clean as _rpq

import os

import pyarrow as pa


def _decode_batch(batch: pa.Table, stream_codec: str = "vb") -> pa.Table:
    from invertedindex_ray.functions import codec

    terms = batch["term"].to_pylist()
    parts = batch["part"].to_pylist()
    dfs = batch["df"].to_pylist()
    dvb = batch["doc_ids_vb"].to_pylist()
    tvb = batch["tfs_vb"].to_pylist()
    id_strs, tf_strs = [], []
    for d, t in zip(dvb, tvb):
        ids, tfs = codec.decode_posting_list(d, t, stream_codec)
        id_strs.append(" ".join(map(str, ids.tolist())))
        tf_strs.append(" ".join(map(str, tfs.tolist())))
    return pa.table(
        {
            "term": pa.array(terms, type=pa.string()),
            "part": pa.array(parts, type=pa.int64()),
            "df": pa.array(dfs, type=pa.int64()),
            "doc_ids": pa.array(id_strs, type=pa.string()),
            "tfs": pa.array(tf_strs, type=pa.string()),
        }
    )


def dump_textual_index(index_dir: str, out_dir: str):
    """Decode ``index_dir/segments`` and write the ASCII mirror to
    ``out_dir`` as CSV, globally sorted by (term, part) like the merged
    textual lexicon (TextualIndexer.java:84-183). Returns the Dataset."""
    import functools

    import ray.data as rd

    from invertedindex_ray.config import IndexConfig

    cfg = IndexConfig.load(index_dir)
    stream_codec = getattr(cfg, "codec", "vb") if cfg is not None else "vb"
    seg = _rpq(os.path.join(index_dir, "segments"))
    out = seg.map_batches(
        functools.partial(_decode_batch, stream_codec=stream_codec),
        batch_format="pyarrow",
    ).sort(["term", "part"])
    out.write_csv(out_dir)
    return out
