"""Text-processing chain: normalize -> tokenize -> stopword filter ->
truncate -> stem, with Java-exact semantics.

Reference chain (/root/reference/src/main/java/it/unipi/utils/
TextProcessingUtils.java:17-53, applied at indexer/Indexer.java:86-124):

1. lowercase
2. replace ``[^a-zA-Z0-9]`` with a space
3. split on ``" +"`` with **Java String.split semantics**: a leading empty
   token is kept when the text starts with a separator; trailing empty
   tokens are removed repeatedly; splitting the empty string yields
   ``[""]`` (no-match special case).
4. stopword filter (127-entry list whose first entry is the empty string,
   so the leading "" token is itself a stopword)
5. ``doc_len`` counts tokens surviving the stopword filter, *before*
   truncation/stemming (Indexer.java:92-95)
6. truncate to 20 chars (String.substring — chars, not bytes;
   TextProcessingUtils.java:34-36)
7. Snowball English stem (porter2.py)

The batch entry point :func:`tokenize_docs` is Arrow-vectorized:
lower/clean/split run as pyarrow.compute kernels, per-token work (steps
4-7) runs once per *unique* token via ``dictionary_encode`` (Zipf skew
makes the unique set small) with a cross-batch stem memo, and per-doc TF
aggregation is one ``np.unique`` over packed (doc, term) keys.
"""

from __future__ import annotations

import re
from importlib import resources as importlib_resources

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from invertedindex_ray.functions import porter2

_CLEAN_RE = re.compile(r"[^a-zA-Z0-9]")
_SPLIT_RE = re.compile(r" +")
_CLEAN_PATTERN = "[^a-zA-Z0-9]"
_SPLIT_PATTERN = " +"


def load_stopwords() -> frozenset[str]:
    """The reference's 127-entry stopword list; first line is empty, making
    "" a stopword (TextProcessingUtils.java:13,21-31)."""
    text = (
        importlib_resources.files("invertedindex_ray")
        .joinpath("resources/stopwords.txt")
        .read_text(encoding="utf-8")
    )
    return frozenset(text.splitlines())


STOPWORDS = load_stopwords()


def tokenize(text: str) -> list[str]:
    """Java-exact ``tokenize`` (single string; used for queries and tests).

    Matches ``TextProcessingUtils.tokenize`` + Java ``String.split(" +")``:
    leading empty token kept, trailing empties removed repeatedly, and the
    empty input yields ``[""]``.
    """
    cleaned = _CLEAN_RE.sub(" ", text.lower())
    if cleaned == "":
        return [""]
    toks = _SPLIT_RE.split(cleaned)
    while toks and toks[-1] == "":
        toks.pop()
    return toks


def preprocess_token(
    token: str, *, stemming: bool = True, stopword_removal: bool = True, max_term_len: int = 20
) -> str | None:
    """Full per-token chain; returns None when the token is dropped."""
    if stopword_removal and token in STOPWORDS:
        return None
    t = token[:max_term_len]
    if stemming:
        t = porter2.stem(t)
    return t


class StemMemo:
    """Cross-batch token -> stem memo (held per map_batches actor or as a
    module global in long-lived workers). Bounded: raw web vocabulary is
    effectively unbounded (ids, typos, noise), so on overflow the cache
    resets — the Zipf head repopulates within a batch, tail misses just
    re-stem."""

    __slots__ = ("cache", "max_size")

    def __init__(self, max_size: int = 1_000_000) -> None:
        self.cache: dict[str, str] = {}
        self.max_size = max_size

    def stem_many(self, tokens: list[str]) -> list[str]:
        cache = self.cache
        if len(cache) > self.max_size:
            cache.clear()
        s = porter2.stem
        out = []
        for tok in tokens:
            v = cache.get(tok)
            if v is None:
                v = s(tok)
                cache[tok] = v
            out.append(v)
        return out


def _java_split_lists(texts: pa.Array) -> pa.ListArray:
    """lower + clean + split(" +") over a string column, trimming list tails
    to Java semantics. Interior tokens are never empty (separators are
    maximal runs), so each raw list is [maybe-"", tok..., maybe-""]."""
    # empty body is skipped before tokenization (Indexer.java:84); null too
    empty_doc = pc.fill_null(pc.equal(pc.utf8_length(texts), 0), True).to_numpy(
        zero_copy_only=False
    )
    arr = pc.utf8_lower(texts)
    arr = pc.replace_substring_regex(arr, pattern=_CLEAN_PATTERN, replacement=" ")
    lists = pc.split_pattern_regex(arr, pattern=_SPLIT_PATTERN)
    lists = lists.combine_chunks() if isinstance(lists, pa.ChunkedArray) else lists

    offsets = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = lists.values
    starts, ends = offsets[:-1], offsets[1:]
    lengths = ends - starts

    empty_mask = pc.equal(values, "").to_numpy(zero_copy_only=False)
    if lists.null_count:
        # null text -> treat as empty doc (skipped upstream in the reference)
        valid = ~np.asarray(lists.is_null())
    else:
        valid = None

    last_empty = np.zeros(len(lengths), dtype=bool)
    nz = lengths > 0
    last_empty[nz] = empty_mask[ends[nz] - 1]
    first_empty = np.zeros(len(lengths), dtype=bool)
    first_empty[nz] = empty_mask[starts[nz]]

    new_len = lengths.copy()
    # L >= 2 ending with "": drop it; ["",""] drops to 0. L == 1 kept as-is
    # (Java returns [original] when no separator matched, incl. "" -> [""]).
    trim1 = (lengths >= 2) & last_empty
    new_len[trim1] -= 1
    both = (lengths == 2) & last_empty & first_empty
    new_len[both] = 0
    if valid is not None:
        new_len[~valid] = 0
    # zero out empty docs entirely (their raw split was [""])
    drop_all = empty_doc & (new_len > 0)
    new_len[drop_all] = 0

    # rebuild list array with trimmed tails; each list trims at most its last
    # slot (trim1) plus its first slot (the ["",""] case), so the drop mask
    # is two vectorized scatters — no per-doc loop.
    keep = np.ones(len(values), dtype=bool)
    if trim1.any():
        keep[ends[trim1] - 1] = False
    if both.any():
        keep[starts[both]] = False
    if drop_all.any():
        # empty docs produced a single [""] slot
        keep[starts[drop_all]] = False
    new_values = values.filter(pa.array(keep))
    new_offsets = np.zeros(len(new_len) + 1, dtype=np.int64)
    np.cumsum(new_len, out=new_offsets[1:])
    return pa.ListArray.from_arrays(
        pa.array(new_offsets.astype(np.int32), type=pa.int32()), new_values
    )


def tokenize_docs(
    texts: pa.ChunkedArray | pa.Array | list,
    *,
    stemming: bool = True,
    stopword_removal: bool = True,
    max_term_len: int = 20,
    memo: StemMemo | None = None,
) -> tuple[pa.ListArray, pa.ListArray, np.ndarray]:
    """Vectorized chain over a column of document bodies.

    Returns ``(terms, tfs, doc_len)``: ``terms`` is a ``list<string>``
    array of the distinct processed terms per doc, ``tfs`` the matching
    ``list<int32>`` frequencies, ``doc_len`` the non-stopword token count
    per doc (int32; 0 for empty/stopword-only docs, which the caller must
    drop before doc-id assignment, Indexer.java:84,121).
    """
    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.array(texts, type=pa.string())
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_docs = len(texts)

    lists = _java_split_lists(texts)
    offsets = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lengths = offsets[1:] - offsets[:-1]
    flat = lists.values  # pa.StringArray of all tokens

    # unique raw tokens via dictionary encode (C++ hash table)
    dict_arr = pc.dictionary_encode(flat)
    raw_indices = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq_tokens: list[str] = dict_arr.dictionary.to_pylist()

    # per-unique-token processing
    if stopword_removal:
        keep_u = np.fromiter(
            (u not in STOPWORDS for u in uniq_tokens), dtype=bool, count=len(uniq_tokens)
        )
    else:
        keep_u = np.ones(len(uniq_tokens), dtype=bool)
    kept_u_idx = np.flatnonzero(keep_u)
    kept_tokens = [uniq_tokens[i][:max_term_len] for i in kept_u_idx]
    if stemming:
        memo = memo or StemMemo()
        processed = memo.stem_many(kept_tokens)
    else:
        processed = kept_tokens

    # merge stems: dictionary-encode the processed unique strings
    proc_dict = pc.dictionary_encode(pa.array(processed, type=pa.string()))
    proc_ids_for_kept = proc_dict.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = proc_dict.dictionary  # final batch vocabulary (pa.StringArray)

    # map every flat token -> final term id (or -1 for dropped)
    u_to_term = np.full(len(uniq_tokens), -1, dtype=np.int64)
    u_to_term[kept_u_idx] = proc_ids_for_kept
    flat_term = u_to_term[raw_indices] if len(raw_indices) else raw_indices

    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lengths)
    token_keep = flat_term >= 0
    doc_len = np.bincount(doc_idx[token_keep], minlength=n_docs).astype(np.int32)

    # per-(doc, term) tf via packed keys (term ids < 2^32 per batch)
    packed = (doc_idx[token_keep] << np.int64(32)) | flat_term[token_keep]
    uniq_pairs, tf = np.unique(packed, return_counts=True)
    pair_doc = (uniq_pairs >> np.int64(32)).astype(np.int64)
    pair_term = (uniq_pairs & np.int64(0xFFFFFFFF)).astype(np.int64)

    pairs_per_doc = np.bincount(pair_doc, minlength=n_docs)
    out_offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(pairs_per_doc, out=out_offsets[1:])
    out_offsets_arr = pa.array(out_offsets, type=pa.int64())

    term_values = vocab.take(pa.array(pair_term, type=pa.int64()))
    terms = pa.ListArray.from_arrays(
        pa.array(out_offsets.astype(np.int32), type=pa.int32()), term_values
    )
    tfs = pa.ListArray.from_arrays(
        pa.array(out_offsets.astype(np.int32), type=pa.int32()),
        pa.array(tf.astype(np.int32), type=pa.int32()),
    )
    return terms, tfs, doc_len
