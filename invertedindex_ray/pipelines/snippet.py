"""Best-passage (snippet) extraction over the documents table.

For a query (a term set) and a window of ``W`` token positions, find —
per document containing at least one query term — the window with the
MOST query-term occurrences. This is the passage-selection primitive
behind result snippets / highlight generation; the reference engine
ranks whole documents only (QueryProcessor returns docNos), so this is
an extension, but it shares the zero-shuffle per-doc shape of
pipelines/phrase.py and pipelines/proximity.py (same tokenizer).

Canonical window contract (what the SQL oracle mirrors): candidate
windows are ANCHORED at query-term hit positions — window [a, a+W-1]
for each hit position a. An optimal window can always be slid right
until its first hit becomes its anchor, so anchoring loses no maxima
and makes the reported start deterministic: the row is
``(query, doc_id, win_start, n_hits)`` with the maximal hit count and
the smallest anchor among maximal windows.

Vectorization: one ``pc.is_in`` over the flat token array per query,
then batch-wide ``searchsorted`` on the ``doc_idx * 2^32 + pos``
composite key (hit counts per anchored window), then per-doc
max-and-earliest via one ``maximum.reduceat`` on a packed
``count * 2^33 - pos`` score (count <= doc tokens << 2^20, so the pack
is exact in int64). No loop over docs, positions, or windows.
"""

from __future__ import annotations

from invertedindex_ray.sources.io import read_parquet_clean as _rpq

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from invertedindex_ray.pipelines.proximity import _SHIFT, _positions

# Fixed driver query set: (query terms, window). The last query must
# contribute zero rows.
DRIVER_SNIPPETS: list[tuple[str, int]] = [
    ("table hash", 8),
    ("merge group batch", 10),
    ("zzznope qqnada", 5),
]

_OUT_SCHEMA = pa.schema(
    [
        ("query", pa.string()),
        ("doc_id", pa.int64()),
        ("win_start", pa.int64()),
        ("n_hits", pa.int64()),
    ]
)

_PACK = np.int64(1) << np.int64(33)


def _snippet_batch(
    batch: pa.Table, queries: list[tuple[str, int]]
) -> pa.Table:
    if batch.num_rows == 0:
        return _OUT_SCHEMA.empty_table()
    toks, doc_idx, pos = _positions(batch)
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    key = doc_idx * _SHIFT + pos

    out_q: list[str] = []
    out_doc: list[np.ndarray] = []
    out_s: list[np.ndarray] = []
    out_n: list[np.ndarray] = []
    for q, w in queries:
        terms = q.split()
        hit_mask = pc.is_in(
            toks, value_set=pa.array(terms, type=pa.string())
        ).to_numpy(zero_copy_only=False)
        hk = key[hit_mask]
        if not len(hk):
            continue
        hd = doc_idx[hit_mask]
        hp = pos[hit_mask]
        # hits in [a, a+w-1] for each anchor a: hk is sorted, windows
        # cannot cross docs (w < 2^32)
        idx = np.arange(len(hk), dtype=np.int64)
        cnt = np.searchsorted(hk, hk + w) - idx
        # per-doc best: max count, then smallest anchor among maxima
        score = cnt * _PACK - hp
        new = np.ones(len(hk), dtype=bool)
        new[1:] = hd[1:] != hd[:-1]
        starts = np.flatnonzero(new)
        best = np.maximum.reduceat(score, starts)
        bc = best // _PACK + (best % _PACK != 0)  # ceil -> count
        bs = bc * _PACK - best  # recover anchor position
        d = doc_ids[hd[starts]]
        out_q.extend([q] * len(d))
        out_doc.append(d)
        out_s.append(bs.astype(np.int64))
        out_n.append(bc.astype(np.int64))
    if not out_q:
        return _OUT_SCHEMA.empty_table()
    return pa.table(
        {
            "query": pa.array(out_q, type=pa.string()),
            "doc_id": pa.array(np.concatenate(out_doc), type=pa.int64()),
            "win_start": pa.array(np.concatenate(out_s), type=pa.int64()),
            "n_hits": pa.array(np.concatenate(out_n), type=pa.int64()),
        }
    )


def snippet_windows(
    sf_dir: str, queries: list[tuple[str, int]] | None = None
) -> ray.data.Dataset:
    """(query, doc_id, win_start, n_hits): per doc, the hit-anchored
    window of ``w`` tokens holding the most query-term occurrences
    (earliest anchor on ties); docs with zero hits emit nothing."""
    queries = DRIVER_SNIPPETS if queries is None else queries
    ds = _rpq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(
        lambda b: _snippet_batch(b, queries), batch_format="pyarrow"
    )
