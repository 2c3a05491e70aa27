"""Positional phrase search over the documents table.

An extension beyond the reference's term-level index (its postings carry
no positions — models/PostingList.java stores (docId, tf) only): exact
phrase matching needs token POSITIONS. Rather than shuffling a corpus-
wide positional index, phrase matching is embarrassingly parallel per
document — every occurrence of a phrase lies entirely inside one doc —
so the whole operator is ONE ``map_batches`` pass with zero shuffle:

- tokens: lowercase, non-alphanumeric -> space, keep maximal ``[a-z0-9]+``
  runs (positions count only real tokens; no stopword removal and no
  stemming — a phrase is literal text, DuckDB mirror:
  ``regexp_extract_all(regexp_replace(lower(text), '[^a-z0-9]', ' ', 'g'),
  '[a-z0-9]+')``)
- the (small, constant) phrase list rides into every task inside the
  function closure; per batch each phrase costs ``m`` vectorized Arrow
  string equals over the flattened token array plus numpy shifted-AND —
  no Python loop over rows or tokens
- occurrences are counted OVERLAPPING (position j matches when tokens
  j..j+m-1 equal the phrase inside one doc), matching the SQL
  self-join-on-(p+1) oracle

At 100 TB this shape holds: work is proportional to corpus tokens, the
output is only (phrase, doc_id, n_matches) match rows, and nothing is
materialized corpus-wide.
"""

from __future__ import annotations

from invertedindex_ray.sources.io import read_parquet_clean as _rpq

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# The contract's fixed phrase set: two common bigrams, one trigram run,
# one unigram, one absent phrase (must contribute zero rows).
DRIVER_PHRASES = [
    "table hash",
    "merge group",
    "batch batch batch",
    "spark",
    "zzznope phrase",
]

_OUT_SCHEMA = pa.schema(
    [
        ("phrase", pa.string()),
        ("doc_id", pa.int64()),
        ("n_matches", pa.int64()),
    ]
)


def doc_token_arrays(batch: pa.Table) -> tuple[np.ndarray, "pa.Array"]:
    """(doc_row_idx, tokens) flat arrays for a (doc_id, text) batch under
    the phrase-position token definition: lowercase, non-alphanumeric ->
    space, positions are ranks among the surviving non-empty tokens.
    Shared by the scan matcher below and the positional-index builder
    (pipelines/positional.py) so the two phrase engines agree exactly."""
    text = batch["text"]
    text = text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
    cleaned = pc.replace_substring_regex(
        pc.utf8_lower(text), pattern="[^a-z0-9]", replacement=" "
    )
    wl = pc.split_pattern(cleaned, " ")
    offs = wl.offsets.to_numpy().astype(np.int64)
    flat = wl.values
    if offs[0] != 0 or len(flat) != offs[-1]:
        # sliced ListArray: values carry out-of-window elements
        flat = flat.slice(offs[0], offs[-1] - offs[0])
        offs = offs - offs[0]
    # drop the empty tokens the space-split produces; positions are
    # ranks among the surviving real tokens
    nonempty = pc.not_equal(flat, "")
    mask = nonempty.to_numpy(zero_copy_only=False)
    toks = flat.filter(nonempty)
    n_rows = batch.num_rows
    doc_idx = np.repeat(np.arange(n_rows, dtype=np.int64), np.diff(offs))[mask]
    return doc_idx, toks


def _match_batch(batch: pa.Table, phrases: list[list[str]]) -> pa.Table:
    if batch.num_rows == 0:
        return _OUT_SCHEMA.empty_table()
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    doc_idx, toks = doc_token_arrays(batch)
    L = len(toks)

    out_phrase: list[str] = []
    out_doc: list[np.ndarray] = []
    out_n: list[np.ndarray] = []
    for terms in phrases:
        m = len(terms)
        if L < m or m == 0:
            continue
        # m vectorized equals over the flat token array, then shifted AND
        eqs = [
            pc.equal(toks, t).to_numpy(zero_copy_only=False) for t in terms
        ]
        span = L - m + 1
        hit = eqs[0][:span].copy()
        for i in range(1, m):
            hit &= eqs[i][i : i + span]
        if m > 1:
            hit &= doc_idx[:span] == doc_idx[m - 1 :]
        pos = np.flatnonzero(hit)
        if not len(pos):
            continue
        per_doc = np.bincount(doc_idx[pos], minlength=len(doc_ids))
        nz = np.flatnonzero(per_doc)
        out_phrase.extend([" ".join(terms)] * len(nz))
        out_doc.append(doc_ids[nz])
        out_n.append(per_doc[nz].astype(np.int64))
    if not out_phrase:
        return _OUT_SCHEMA.empty_table()
    return pa.table(
        {
            "phrase": pa.array(out_phrase, type=pa.string()),
            "doc_id": pa.array(np.concatenate(out_doc), type=pa.int64()),
            "n_matches": pa.array(np.concatenate(out_n), type=pa.int64()),
        }
    )


def phrase_search(
    sf_dir: str, phrases: list[str] | None = None
) -> ray.data.Dataset:
    """(phrase, doc_id, n_matches) for every doc containing each phrase
    as a contiguous token sequence; overlapping occurrences counted."""
    phrases = DRIVER_PHRASES if phrases is None else phrases
    split = [p.split() for p in phrases]
    ds = _rpq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(
        lambda b: _match_batch(b, split), batch_format="pyarrow"
    )
