"""Substring-level duplicate span detection: find every position range
whose word n-gram also appears in ANOTHER document (the signal behind
exact-substring training-data dedup, Lee et al. 2022, 'Deduplicating
Training Data Makes Language Models Better' — there via suffix arrays;
here via hashed n-gram inversion, the shape that distributes).

Contract: a word position i in doc d is DUPLICATED if the n-gram
starting at i (1-based, ``[^a-z0-9]+`` tokenization) occurs in at least
one other document. Consecutive duplicated start positions are merged
into maximal spans ``(doc_id, span_start, span_end, n_grams)`` where
span_end = last start + n - 1 (the last word index the span covers).
Within-doc self-repeats do NOT count (that signal is
``textstats.repetition_stats``); hashes are md5-based so the driver's
DuckDB oracle reproduces the bucketing exactly.

Scale shape: two keyed reductions, both via the hash-partitioned
vectorized path (functions.grouping) — (1) partition by gram hash: all
occurrences of one gram are colocated, so the distinct-doc test is one
lexsort + reduceat per partition and only duplicated rows survive
(~16 B/row shuffle); (2) partition by doc_id: per-doc
gaps-and-islands merge of start positions. No driver-side state, no
broadcast of the (unbounded at 100 TB) duplicated-gram set.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from invertedindex_ray.pipelines.textstats import _WORD, _read_docs

_HIT_SCHEMA = pa.schema([("doc_id", pa.int64()), ("pos", pa.int64())])
_SPAN_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("span_start", pa.int64()),
        ("span_end", pa.int64()),
        ("n_grams", pa.int64()),
    ]
)


def dup_ngram_spans(sf_dir: str, *, n: int = 8) -> "ray.data.Dataset":
    """(doc_id, span_start, span_end, n_grams): maximal runs of word
    positions whose ``n``-grams each occur in more than one document."""
    from invertedindex_ray.functions.hashing import md5_hash63
    from invertedindex_ray.pipelines.dedup import _grouped_partitions

    rows_schema = pa.schema(
        [("h", pa.int64()), ("doc_id", pa.int64()), ("pos", pa.int64())]
    )

    def gram_rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return rows_schema.empty_table()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch["text"].to_pylist()
        out_h, out_d, out_p = [], [], []
        for d, t in zip(ids, texts):
            words = [w for w in _WORD.split((t or "").lower()) if w]
            if len(words) < n:
                continue
            grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
            h = md5_hash63(grams)
            out_h.append(h)
            out_d.append(np.full(len(h), d, dtype=np.int64))
            out_p.append(np.arange(1, len(h) + 1, dtype=np.int64))
        if not out_h:
            return rows_schema.empty_table()
        return pa.table(
            {
                "h": pa.array(np.concatenate(out_h), type=pa.int64()),
                "doc_id": pa.array(np.concatenate(out_d), type=pa.int64()),
                "pos": pa.array(np.concatenate(out_p), type=pa.int64()),
            }
        )

    def keep_cross_doc_dups(g) -> "pd.DataFrame":
        import pandas as pd

        h = g["h"].to_numpy()
        d = g["doc_id"].to_numpy()
        p = g["pos"].to_numpy()
        order = np.lexsort((p, d, h))
        h, d, p = h[order], d[order], p[order]
        m = len(h)
        new_h = np.ones(m, dtype=bool)
        new_h[1:] = h[1:] != h[:-1]
        new_hd = np.ones(m, dtype=bool)
        new_hd[1:] = new_h[1:] | (d[1:] != d[:-1])
        starts = np.flatnonzero(new_h)
        # distinct docs per h = count of (h, doc) firsts within each h run
        ndocs = np.add.reduceat(new_hd.astype(np.int64), starts) if m else np.empty(0, np.int64)
        lens = np.diff(np.append(starts, m))
        keep = np.repeat(ndocs > 1, lens)
        return pd.DataFrame({"doc_id": d[keep], "pos": p[keep]})

    from invertedindex_ray.functions.grouping import table_partitions

    _np_gram = table_partitions(
        f"{sf_dir}/documents.parquet", expand=64  # ~n-grams per doc
    )
    hits = _grouped_partitions(
        _read_docs(sf_dir).map_batches(gram_rows, batch_format="pyarrow"),
        lambda t: t["h"].to_numpy().astype(np.uint64),
        keep_cross_doc_dups,
        _HIT_SCHEMA,
        n_partitions=_np_gram,
    )

    def merge_spans(g) -> "pd.DataFrame":
        import pandas as pd

        d = g["doc_id"].to_numpy()
        p = g["pos"].to_numpy()
        order = np.lexsort((p, d))
        d, p = d[order], p[order]
        m = len(d)
        new = np.ones(m, dtype=bool)
        if m:
            new[1:] = (d[1:] != d[:-1]) | (p[1:] != p[:-1] + 1)
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], m) - 1
        return pd.DataFrame(
            {
                "doc_id": d[starts],
                "span_start": p[starts],
                "span_end": p[ends] + (n - 1),
                "n_grams": (ends - starts + 1).astype(np.int64),
            }
        )

    return _grouped_partitions(
        hits,
        lambda t: t["doc_id"].to_numpy().astype(np.uint64),
        merge_spans,
        _SPAN_SCHEMA,
        n_partitions=_np_gram,
    )
