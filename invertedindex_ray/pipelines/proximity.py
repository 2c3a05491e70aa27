"""Proximity (windowed co-occurrence) search over the documents table.

The sloppy-phrase cousin of pipelines/phrase.py: a (term_a, term_b,
window) query matches every ORDERED position pair (p_a, p_b) inside one
document with ``|p_a - p_b| <= window``, reporting the pair count and
the minimum distance per doc. Like exact phrase matching, every match
lies wholly inside one document, so the operator is ONE ``map_batches``
pass with zero shuffle — no positional index is built or exchanged.

Tokenization matches phrase.py exactly (lowercase, maximal ``[a-z0-9]+``
runs, 1-based positions over the surviving tokens) so the two operators
share one SQL position mirror.

Vectorization: positions of both terms are extracted with two Arrow
``equal`` kernels over the flat token array; the per-doc window count
collapses to TWO ``np.searchsorted`` calls batch-wide by composing a
``doc_idx * 2^32 + pos`` key (window < 2^32, so a range query can never
cross a document boundary) — count(p_b in [p_a-W, p_a+W]) and the
nearest-neighbor distance come from the insertion points, with no loop
over docs or positions. At 100 TB: work linear in corpus tokens, output
only (query, doc_id, n_pairs, min_dist) rows.
"""

from __future__ import annotations

from invertedindex_ray.sources.io import read_parquet_clean as _rpq

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# Fixed driver query set: (term_a, term_b, window). Vocabulary chosen
# from the synthetic corpus; the last pair must contribute zero rows.
DRIVER_PROX: list[tuple[str, str, int]] = [
    ("table", "merge", 5),
    ("hash", "group", 3),
    ("batch", "table", 4),
    ("zzznope", "table", 5),
]

_OUT_SCHEMA = pa.schema(
    [
        ("query", pa.string()),
        ("doc_id", pa.int64()),
        ("n_pairs", pa.int64()),
        ("min_dist", pa.int64()),
    ]
)

_SHIFT = np.int64(1) << np.int64(32)


def _positions(batch: pa.Table):
    """Flat token array + per-token doc index + 1-based positions,
    identical semantics to phrase.py's tokenizer."""
    text = batch["text"]
    text = text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
    cleaned = pc.replace_substring_regex(
        pc.utf8_lower(text), pattern="[^a-z0-9]", replacement=" "
    )
    wl = pc.split_pattern(cleaned, " ")
    offs = wl.offsets.to_numpy().astype(np.int64)
    flat = wl.values
    if offs[0] != 0 or len(flat) != offs[-1]:
        flat = flat.slice(offs[0], offs[-1] - offs[0])
        offs = offs - offs[0]
    nonempty = pc.not_equal(flat, "")
    mask = nonempty.to_numpy(zero_copy_only=False)
    toks = flat.filter(nonempty)
    n_docs = batch.num_rows
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(offs))[mask]
    # 1-based rank among the surviving tokens of each doc
    tok_per_doc = np.bincount(doc_idx, minlength=n_docs)
    doc_start = np.concatenate([[0], np.cumsum(tok_per_doc)[:-1]])
    pos = np.arange(len(doc_idx), dtype=np.int64) - doc_start[doc_idx] + 1
    return toks, doc_idx, pos


def _prox_batch(
    batch: pa.Table, queries: list[tuple[str, str, int]]
) -> pa.Table:
    if batch.num_rows == 0:
        return _OUT_SCHEMA.empty_table()
    toks, doc_idx, pos = _positions(batch)
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    key = doc_idx * _SHIFT + pos  # sorted by construction

    out_q: list[str] = []
    out_doc: list[np.ndarray] = []
    out_n: list[np.ndarray] = []
    out_md: list[np.ndarray] = []
    for ta, tb, w in queries:
        ka = key[pc.equal(toks, ta).to_numpy(zero_copy_only=False)]
        kb = key[pc.equal(toks, tb).to_numpy(zero_copy_only=False)]
        if not len(ka) or not len(kb):
            continue
        lo = np.searchsorted(kb, ka - w)
        hi = np.searchsorted(kb, ka + w, side="right")
        cnt = hi - lo
        have = cnt > 0
        if not have.any():
            continue
        # nearest b position per a: one of the two insertion-point
        # neighbors, clipped to the in-window slice [lo, hi)
        ins = np.searchsorted(kb, ka)
        left = np.where(
            ins > lo, np.abs(ka - kb[np.maximum(ins - 1, 0)]), _SHIFT
        )
        right = np.where(
            ins < hi, np.abs(kb[np.minimum(ins, len(kb) - 1)] - ka), _SHIFT
        )
        near = np.minimum(left, right)
        d = doc_idx[np.searchsorted(key, ka)]  # doc of each a occurrence
        n_docs = len(doc_ids)
        per_doc = np.bincount(d, weights=cnt, minlength=n_docs).astype(np.int64)
        md = np.full(n_docs, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(md, d[have], near[have])
        nz = np.flatnonzero(per_doc)
        out_q.extend([f"{ta} {tb}"] * len(nz))
        out_doc.append(doc_ids[nz])
        out_n.append(per_doc[nz])
        out_md.append(md[nz])
    if not out_q:
        return _OUT_SCHEMA.empty_table()
    return pa.table(
        {
            "query": pa.array(out_q, type=pa.string()),
            "doc_id": pa.array(np.concatenate(out_doc), type=pa.int64()),
            "n_pairs": pa.array(np.concatenate(out_n), type=pa.int64()),
            "min_dist": pa.array(np.concatenate(out_md), type=pa.int64()),
        }
    )


def proximity_search(
    sf_dir: str, queries: list[tuple[str, str, int]] | None = None
) -> ray.data.Dataset:
    """(query, doc_id, n_pairs, min_dist) for every doc where term_a and
    term_b co-occur within ``window`` token positions; n_pairs counts
    every in-window (a, b) occurrence pair, min_dist is the closest."""
    queries = DRIVER_PROX if queries is None else queries
    ds = _rpq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(
        lambda b: _prox_batch(b, queries), batch_format="pyarrow"
    )
