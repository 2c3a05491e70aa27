"""Corpus-curation operators for a training-data pipeline: PII
redaction, text normalization, stratified sampling, per-source
aggregation, benchmark-contamination checking, and per-doc keyword
extraction.

Each operator is a streaming ``map_batches`` / small-groupby pipeline
with an exact DuckDB SQL mirror (see ``__ray_entry__.oracle_sql``):
regexes are RE2 on both engines, hashes go through
:func:`invertedindex_ray.functions.hashing.md5_hash63` (bit-identical
to ``(md5_number_lower(s) >> 1)::BIGINT``), and rounding matches the
oracle's ``round(x, 6)``.

Scale notes: redaction/normalization/sampling are shuffle-free Arrow
kernel maps; source_stats pre-aggregates per batch before one tiny
groupby over (source, lang) rows; contamination broadcasts the
benchmark's n-gram hash set once via ``ray.put`` (the benchmark side is
small by definition) so the corpus side streams with no shuffle; the
keyword extractor scores and selects inside one pass over the tokenized
corpus — a doc's postings never leave their batch.
"""

from __future__ import annotations

from invertedindex_ray.sources.io import read_parquet_clean as _rpq

import numpy as np
import pyarrow as pa

from invertedindex_ray.functions.hashing import md5_hash63

# PII patterns, applied in THIS order (counts are taken on the original
# text; replacements are sequential). RE2 syntax — valid for both
# pyarrow.compute and DuckDB's regexp_* functions.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    ("ip", r"\b\d{1,3}(\.\d{1,3}){3}\b", "<IP>"),
)

_NORM_PATTERN = "[^a-z0-9]+"

#: Default strata for :func:`stratified_sample` — over-sample src0,
#: drop src1, keep everything else at DEFAULT_PERMILLE.
DEFAULT_RATES: dict[str, int] = {"src0": 500, "src1": 0}
DEFAULT_PERMILLE = 100


def _docs(sf_dir: str, columns):
    import ray.data as rd

    return _rpq(f"{sf_dir}/documents.parquet", columns=columns)


def _str_col(batch: pa.Table, name: str) -> pa.Array:
    col = batch[name]
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    import pyarrow.compute as pc

    return pc.coalesce(col, "")


# ------------------------------------------------------------ pii redact


def pii_redact(sf_dir: str):
    """(doc_id, clean_text, n_email, n_phone, n_ip): redact emails, phone
    numbers and IPv4 addresses from ``text``. Counts are per-pattern
    matches in the ORIGINAL text; replacements apply sequentially in
    :data:`PII_PATTERNS` order. Pure Arrow regex kernels — shuffle-free,
    zero Python per row."""

    def f(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        text = _str_col(batch, "text")
        counts = {
            name: pc.count_substring_regex(text, pat)
            .cast(pa.int64())
            for name, pat, _ in PII_PATTERNS
        }
        clean = text
        for _, pat, repl in PII_PATTERNS:
            clean = pc.replace_substring_regex(clean, pat, repl)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "clean_text": clean,
                "n_email": counts["email"],
                "n_phone": counts["phone"],
                "n_ip": counts["ip"],
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


# ------------------------------------------------------ C4 line filter

#: Line-keep rule (C4, Raffel et al. 2020 §2.2): terminal punctuation.
_C4_TERMINAL = r'[.!?"]\s*$'


def c4_line_filter(sf_dir: str, *, min_words: int = 3, min_kept_lines: int = 1):
    """(doc_id, keep, n_lines, n_kept, text_clean): the C4 cleaning
    pass (Raffel et al., "Exploring the Limits of Transfer Learning
    with a Unified Text-to-Text Transformer", JMLR 2020 §2.2) as a
    LINE-level vectorized map — the sibling of the DOC-level Gopher
    rules in :func:`textstats.quality_filter`:

    - page rules: any page containing ``lorem ipsum`` (case-insensitive)
      or a curly brace ``{`` is dropped whole;
    - line rules: keep a line iff it ends in terminal punctuation
      (``[.!?"]``), has >= ``min_words`` whitespace tokens, and does not
      contain ``javascript`` (case-insensitive);
    - ``keep`` = page clean AND >= ``min_kept_lines`` surviving lines
      (C4 uses a 5-sentence floor; the floor is a parameter here);
      ``text_clean`` = kept lines re-joined with ``\\n`` ('' when
      ``keep`` is false).

    Shuffle-free: one streaming pass; the per-line regex checks run as
    pyarrow compute kernels over the FLATTENED line array (one kernel
    call per batch, not per line); only the final line re-join touches
    Python strings (string assembly is O(total bytes) either way)."""
    import pyarrow.compute as pc

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("keep", pa.bool_()),
            ("n_lines", pa.int64()),
            ("n_kept", pa.int64()),
            ("text_clean", pa.string()),
        ]
    )

    def f(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return out_schema.empty_table()
        text = _str_col(batch, "text")
        low = pc.utf8_lower(text)
        page_bad = pc.or_(
            pc.match_substring(low, "lorem ipsum"), pc.match_substring(text, "{")
        ).to_numpy(zero_copy_only=False)
        lines_list = pc.split_pattern(text, "\n")
        flat = lines_list.flatten()
        offsets = lines_list.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        term = pc.match_substring_regex(flat, _C4_TERMINAL)
        wc = pc.count_substring_regex(flat, r"\S+")
        js = pc.match_substring(pc.utf8_lower(flat), "javascript")
        kl = pc.and_(
            pc.and_(term, pc.greater_equal(wc, min_words)), pc.invert(js)
        ).to_numpy(zero_copy_only=False)
        n_lines = np.diff(offsets)
        # per-doc kept-line counts without a Python loop over lines
        n_kept = np.add.reduceat(
            np.concatenate((kl.astype(np.int64), [0])), offsets[:-1]
        )
        n_kept[n_lines == 0] = 0
        keep = (~page_bad) & (n_kept >= min_kept_lines)
        lines = flat.to_pylist()
        clean = [
            "\n".join(
                l
                for l, k in zip(lines[offsets[i]: offsets[i + 1]],
                                kl[offsets[i]: offsets[i + 1]])
                if k
            )
            if keep[i]
            else ""
            for i in range(n)
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "keep": pa.array(keep, type=pa.bool_()),
                "n_lines": pa.array(n_lines, type=pa.int64()),
                "n_kept": pa.array(n_kept, type=pa.int64()),
                "text_clean": pa.array(clean, type=pa.string()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


# ------------------------------------------------------- normalize text


def normalize_text(sf_dir: str):
    """(doc_id, norm_text, n_norm_chars): lowercase, collapse every
    non-alphanumeric run to one space, trim. The canonical text-cleaning
    step before tokenization/shingling; one Arrow kernel chain."""

    def f(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        text = _str_col(batch, "text")
        norm = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(pc.utf8_lower(text), _NORM_PATTERN, " ")
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "norm_text": norm,
                "n_norm_chars": pc.utf8_length(norm).cast(pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


# --------------------------------------------------- stratified sampling


def stratified_sample(
    sf_dir: str,
    *,
    rates_permille: dict[str, int] | None = None,
    default_permille: int = DEFAULT_PERMILLE,
):
    """Deterministic per-source hash sampling: keep a doc iff
    ``md5_hash63(doc_id) % 1000 < rate(source)``. The per-source rate map
    is how a curation pipeline over-samples rare high-quality sources and
    down-samples boilerplate-heavy ones; same hash as ``sample_docs`` so
    strata nest (a doc kept at rate r is kept at every rate >= r) and
    membership is stable across runs and cluster sizes."""
    rates = dict(DEFAULT_RATES if rates_permille is None else rates_permille)

    def f(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        src = batch["source"].to_pylist()
        h = md5_hash63([str(int(i)) for i in ids]).astype(np.uint64)
        rate = np.fromiter(
            (rates.get(s, default_permille) for s in src), dtype=np.int64, count=len(src)
        )
        keep = (h % np.uint64(1000)).astype(np.int64) < rate
        return batch.filter(pa.array(keep))

    return _docs(sf_dir, ["doc_id", "source", "n_chars"]).map_batches(
        f, batch_format="pyarrow"
    )


# ------------------------------------------------------- source stats


def source_stats(sf_dir: str):
    """(source, n_docs, n_chars_sum, avg_chars_r, n_langs): per-source
    corpus composition. Pre-aggregated to one (source, lang) row per
    batch BEFORE the groupby, so the shuffle moves O(sources x langs)
    rows, never O(docs)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = pa.table(
            {
                "source": batch["source"],
                "lang": batch["lang"],
                "n_chars": batch["n_chars"],
            }
        )
        g = t.group_by(["source", "lang"]).aggregate(
            [("n_chars", "sum"), ("n_chars", "count")]
        )
        return pa.table(
            {
                "source": g["source"],
                "lang": g["lang"],
                "n_docs_p": g["n_chars_count"].cast(pa.int64()),
                "n_chars_p": g["n_chars_sum"].cast(pa.int64()),
            }
        )

    def finalize(batch: pa.Table) -> pa.Table:
        from invertedindex_ray.functions.rounding import round_half_up

        nd = batch["n_docs"].to_numpy(zero_copy_only=False).astype(np.int64)
        nc = batch["n_chars_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "source": batch["source"],
                "n_docs": pa.array(nd, type=pa.int64()),
                "n_chars_sum": pa.array(nc, type=pa.int64()),
                "avg_chars_r": pa.array(
                    round_half_up(nc / nd, 6), type=pa.float64()
                ),
                "n_langs": batch["n_langs"].cast(pa.int64()),
            }
        )

    from ray.data.aggregate import Count

    return (
        _docs(sf_dir, ["source", "lang", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "lang"])
        .aggregate(
            Sum("n_docs_p", alias_name="n_docs_sl"),
            Sum("n_chars_p", alias_name="n_chars_sl"),
        )
        .groupby("source")
        .aggregate(
            Sum("n_docs_sl", alias_name="n_docs"),
            Sum("n_chars_sl", alias_name="n_chars_sum"),
            Count(alias_name="n_langs"),
        )
        .map_batches(finalize, batch_format="pyarrow")
    )


# -------------------------------------------------- contamination check


def _doc_gram_hashes(texts, k: int) -> list[np.ndarray]:
    """Distinct word-k-gram md5 hashes per doc — the same split +
    ``md5_hash63`` used by the winnowing oracle, so grams mirror
    ``(md5_number_lower(w1 || ' ' || ... || wk) >> 1)::BIGINT``."""
    import re

    splitter = re.compile(_NORM_PATTERN)
    out = []
    for t in texts:
        words = [w for w in splitter.split((t or "").lower()) if w]
        if len(words) < k:
            out.append(np.empty(0, dtype=np.int64))
            continue
        grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
        out.append(np.unique(md5_hash63(grams)))
    return out


def contamination_check(
    sf_dir: str,
    *,
    gram_k: int = 3,
    bench_mod: int = 97,
    tau: float = 0.2,
):
    """(doc_id, n_grams, n_overlap, contaminated): flag corpus docs whose
    distinct word-``gram_k``-gram overlap with a benchmark set reaches
    ``tau`` — the decontamination step every training-data pipeline runs
    before an eval release. The "benchmark" here is the deterministic
    subset ``doc_id % bench_mod == 0`` (stand-in for an external eval
    set); benchmark docs themselves are excluded from the output, as are
    docs with no grams (fewer than ``gram_k`` words).

    The benchmark's gram-hash set is gathered once (small by definition
    — it is an eval set, not the corpus) and broadcast via ``ray.put``;
    the corpus side then streams through one shuffle-free map_batches
    doing a sorted ``searchsorted`` membership test per doc."""
    import ray

    def bench_grams(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        keep = (ids % bench_mod) == 0
        hs = _doc_gram_hashes(
            [t for t, k in zip(batch["text"].to_pylist(), keep) if k], gram_k
        )
        flat = np.unique(np.concatenate(hs)) if hs else np.empty(0, dtype=np.int64)
        return pa.table({"h": pa.array(flat, type=pa.int64())})

    parts = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        bench_grams, batch_format="pyarrow"
    )
    # bounded gather: per-batch-distinct benchmark gram hashes only
    bench = np.unique(
        np.array([r["h"] for r in parts.take_all()], dtype=np.int64)
    )
    ref = ray.put(bench)

    def score(batch: pa.Table) -> pa.Table:
        bg = ray.get(ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        keep = (ids % bench_mod) != 0
        out_id, out_n, out_ov = [], [], []
        for d, t, k in zip(ids, texts, keep):
            if not k:
                continue
            hs = _doc_gram_hashes([t], gram_k)[0]
            if len(hs) == 0:
                continue
            idx = np.searchsorted(bg, hs)
            idx[idx == len(bg)] = 0
            ov = int((bg[idx] == hs).sum()) if len(bg) else 0
            out_id.append(int(d))
            out_n.append(len(hs))
            out_ov.append(ov)
        n = np.asarray(out_n, dtype=np.int64)
        ov = np.asarray(out_ov, dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(np.asarray(out_id, dtype=np.int64), type=pa.int64()),
                "n_grams": pa.array(n, type=pa.int64()),
                "n_overlap": pa.array(ov, type=pa.int64()),
                "contaminated": pa.array(
                    (ov >= tau * n).astype(np.int64), type=pa.int64()
                ),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


# ------------------------------------------------------ keyword extract


def top_keywords(sf_dir: str, *, k: int = 5):
    """(doc_id, term, tfidf_r, rank): the k highest-TF-IDF terms per doc
    (ties broken by term ascending) — per-doc keyword tagging for search
    or clustering. df arrives by hash JOIN onto the exploded postings
    (:func:`analytics._postings_with_df`) — no driver-side vocabulary
    (VERDICT r3 #1); the join scatters docs across blocks, so the
    per-doc top-k is one doc-keyed vectorized reduction
    (``grouped_partitions``: all of a doc's rows land in one partition,
    one lexsort + boundary-rank pass per partition)."""
    import pandas as pd

    from invertedindex_ray.functions.grouping import (
        grouped_partitions,
        reduction_partitions,
    )
    from invertedindex_ray.pipelines.analytics import (
        NOSTEM,
        _postings_with_df,
        _tfidf_r,
        collection_stats,
    )

    stats = collection_stats(sf_dir)
    n_docs = int(stats["num_docs"][0].as_py())
    joined, n_post = _postings_with_df(sf_dir, NOSTEM)

    scored_schema = pa.schema(
        [("doc_id", pa.int64()), ("term", pa.string()), ("tfidf_r", pa.float64())]
    )

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return scored_schema.empty_table()
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "term": batch["term"].cast(pa.string()),
                "tfidf_r": pa.array(_tfidf_r(batch, n_docs), type=pa.float64()),
            }
        )

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("term", pa.string()),
            ("tfidf_r", pa.float64()),
            ("rank", pa.int64()),
        ]
    )

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        doc = g["doc_id"].to_numpy()
        s = g["tfidf_r"].to_numpy()
        terms = g["term"].to_numpy()
        # per-doc top-k on (score desc, term asc) with one lexsort over
        # the whole partition; ranks restart at each doc boundary
        order = np.lexsort((terms, -s, doc))
        doc_o, s_o, term_o = doc[order], s[order], terms[order]
        boundary = np.concatenate(([True], doc_o[1:] != doc_o[:-1]))
        starts = np.flatnonzero(boundary)
        lens = np.diff(np.append(starts, len(doc_o)))
        rank = np.arange(len(doc_o), dtype=np.int64) - np.repeat(starts, lens) + 1
        keep = rank <= k
        return pd.DataFrame(
            {
                "doc_id": doc_o[keep].astype(np.int64),
                "term": term_o[keep],
                "tfidf_r": s_o[keep],
                "rank": rank[keep],
            }
        )

    return grouped_partitions(
        joined.map_batches(score, batch_format="pyarrow"),
        lambda b: b["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64),
        pick,
        out_schema,
        n_partitions=reduction_partitions(n_post),
    )


# ------------------------------------------------------- shard export

def export_shards(
    sf_dir: str,
    out_dir: str | None = None,
    *,
    n_shards: int = 8,
    seed: int = 0,
):
    """Shuffle-shard export for training: every doc goes to shard
    ``md5_hash63(f"{doc_id}#{seed}") % n_shards`` — a deterministic,
    cluster-size-independent scatter (a different ``seed`` is a fresh
    reshuffle). Each shard is written as its OWN parquet directory
    (``out_dir/shard=K/``) so a failed export resumes per shard and a
    training job maps one shard to one reader — the resumable-output
    layout the 100 TB contract requires; within a shard, docs arrive
    hash-scattered, which is exactly the decorrelation a sequential
    trainer wants.

    Returns the per-shard manifest (shard, n_docs, n_chars_t) computed
    with per-batch partial combine + one tiny groupby — the same rows
    whether or not the parquet write happens (``out_dir=None`` skips
    the write; the driver's SQL oracle checks the manifest)."""
    from ray.data.aggregate import Sum

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        h = md5_hash63([f"{int(i)}#{seed}" for i in ids]).astype(np.uint64)
        shard = (h % np.uint64(n_shards)).astype(np.int64)
        return batch.append_column("shard", pa.array(shard, type=pa.int64()))

    tagged = _docs(sf_dir, ["doc_id", "text", "n_chars"]).map_batches(
        tag, batch_format="pyarrow"
    )
    if out_dir is not None:
        tagged.write_parquet(out_dir, partition_cols=["shard"])
        import ray.data as rd

        tagged = _rpq(out_dir)  # manifest from what was WRITTEN

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.schema(
                [("shard", pa.int64()), ("n_docs", pa.int64()), ("n_chars_t", pa.int64())]
            ).empty_table()
        shard = batch["shard"].to_numpy(zero_copy_only=False).astype(np.int64)
        nch = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = np.unique(shard)
        return pa.table(
            {
                "shard": pa.array(u, type=pa.int64()),
                "n_docs": pa.array(
                    np.bincount(shard, minlength=int(u.max()) + 1)[u], type=pa.int64()
                ),
                "n_chars_t": pa.array(
                    np.bincount(shard, weights=nch, minlength=int(u.max()) + 1)[u].astype(np.int64),
                    type=pa.int64(),
                ),
            }
        )

    return (
        tagged.map_batches(partial, batch_format="pyarrow")
        .groupby("shard")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"), Sum("n_chars_t", alias_name="n_chars_t")
        )
    )


# ------------------------------------------------------- sequence packing

def pack_sequences(
    sf_dir: str,
    *,
    seq_len: int = 512,
    n_shards: int = 8,
    seed: int = 0,
):
    """Pack documents into fixed-length training sequences: docs are
    scattered to ``md5(doc_id#seed) % n_shards`` shards (the same
    deterministic scatter as :func:`export_shards`, so packing and
    shard export agree), concatenated within each shard in doc_id
    order, and tiled into ``seq_len``-word sequences (the standard
    concat-and-chunk packing an LLM dataloader performs; the last
    partial sequence of each shard is kept).

    Returns (shard, seq_idx, n_words, text_packed). One shuffle keyed
    by shard; each shard packs in ONE vectorized pass (Arrow
    split_pattern + offset math + binary_join — no per-word Python).
    Contract: one shard's text must fit one task — size ``n_shards``
    so corpus/n_shards fits a worker (at 100 TB that means thousands
    of shards; the scatter hash is uniform so shards balance)."""
    import pandas as pd
    import pyarrow.compute as pc

    from invertedindex_ray.pipelines.dedup import _grouped_partitions

    out_schema = pa.schema(
        [
            ("shard", pa.int64()),
            ("seq_idx", pa.int64()),
            ("n_words", pa.int64()),
            ("text_packed", pa.string()),
        ]
    )

    def tag(batch: pa.Table) -> np.ndarray:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        h = md5_hash63([f"{int(i)}#{seed}" for i in ids]).astype(np.uint64)
        return (h % np.uint64(n_shards)).astype(np.uint64)

    def pack_shard(g: pd.DataFrame) -> pd.DataFrame:
        # the partition may hold SEVERAL shards (hash partitions are a
        # superset); pack each shard independently, docs in doc_id order
        ids = g["doc_id"].to_numpy()
        shards = g["_shard"].to_numpy()
        order = np.lexsort((ids, shards))
        texts = pa.array(g["text"].to_numpy()[order], type=pa.string())
        shards = shards[order]
        wl = pc.split_pattern(texts, " ")
        offs = wl.offsets.to_numpy().astype(np.int64)
        flat = wl.values
        n_words_doc = np.diff(offs)
        # per-shard word spans (docs of one shard are contiguous after sort)
        new = np.ones(len(shards), dtype=bool)
        if len(shards):
            new[1:] = shards[1:] != shards[:-1]
        d_starts = np.flatnonzero(new)
        d_ends = np.append(d_starts[1:], len(shards))
        frames = []
        for s, e in zip(d_starts, d_ends):
            shard = int(shards[s])
            w0, w1 = offs[s], offs[e - 1] + n_words_doc[e - 1]
            total = int(w1 - w0)
            n_seq = (total + seq_len - 1) // seq_len
            starts = w0 + seq_len * np.arange(n_seq, dtype=np.int64)
            seq_offs = np.append(starts, w1).astype(np.int32)
            la = pa.ListArray.from_arrays(pa.array(seq_offs), flat)
            packed = pc.binary_join(la, " ")
            lens = np.minimum(starts + seq_len, w1) - starts
            frames.append(
                pd.DataFrame(
                    {
                        "shard": np.full(n_seq, shard, dtype=np.int64),
                        "seq_idx": np.arange(n_seq, dtype=np.int64),
                        "n_words": lens.astype(np.int64),
                        "text_packed": packed.to_pylist(),
                    }
                )
            )
        if not frames:
            return pd.DataFrame(
                {
                    "shard": pd.Series([], dtype=np.int64),
                    "seq_idx": pd.Series([], dtype=np.int64),
                    "n_words": pd.Series([], dtype=np.int64),
                    "text_packed": pd.Series([], dtype=str),
                }
            )
        return pd.concat(frames, ignore_index=True)

    def with_shard(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        return batch.append_column(
            "_shard", pa.array(tag(batch).astype(np.int64), type=pa.int64())
        )

    docs = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        with_shard, batch_format="pyarrow"
    )
    return _grouped_partitions(
        docs,
        lambda b: b["_shard"].to_numpy(zero_copy_only=False).astype(np.uint64)
        % np.uint64(n_shards),
        pack_shard,
        out_schema,
        n_partitions=n_shards,
    )


# Fixed driver target mix over the corpus lang column.
DRIVER_MIX: dict[str, float] = {
    "en": 0.4,
    "de": 0.15,
    "fr": 0.15,
    "es": 0.15,
    "zh": 0.15,
}


def mix_rebalance(sf_dir: str, weights: dict[str, float] | None = None):
    """(doc_id, lang): rebalance the corpus toward target ``weights``
    proportions per lang by DOWNSAMPLING only — the data-mixing step of
    a training-data pipeline (e.g. fixing a language/domain mix without
    upweighting). The bottleneck group (smallest n/w ratio) keeps
    everything; every other group keeps rate = w * T / n with
    T = min_g(n_g / w_g); groups outside ``weights`` are dropped.

    Selection is deterministic hash sampling (md5 of 'mix:'||doc_id,
    53-bit uniform) — reproducible across runs and cluster sizes,
    binomially close to the target (exact-count selection would need a
    per-group sort; at 100 TB hash thresholding is the standard trade).

    Scale shape: one partial-count map + a driver merge of <= #groups
    slim rows (the group key is a LANG/DOMAIN-class column — bounded
    cardinality by contract, NOT a free-text key), then one stateless
    filter map. No shuffle at all."""
    import ray.data as rd

    weights = DRIVER_MIX if weights is None else weights
    out_schema = pa.schema([("doc_id", pa.int64()), ("lang", pa.string())])

    docs = _rpq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )

    count_schema = pa.schema([("lang", pa.string()), ("c", pa.int64())])

    def partial_counts(batch: pa.Table) -> pa.Table:
        langs = np.asarray(batch["lang"].to_pylist(), dtype=object)
        u, c = np.unique(langs, return_counts=True)
        return pa.table(
            {
                "lang": pa.array(list(u), type=pa.string()),
                "c": pa.array(c.astype(np.int64), type=pa.int64()),
            }
        )

    n: dict[str, int] = {}
    for r in docs.map_batches(
        partial_counts, batch_format="pyarrow"
    ).take_all():  # <= #langs rows per block, bounded-cardinality key
        n[r["lang"]] = n.get(r["lang"], 0) + int(r["c"])

    present = [g for g in weights if n.get(g)]
    if not present:
        from invertedindex_ray.functions.grouping import rd_empty

        return rd_empty(out_schema)
    T = min(float(n[g]) / float(weights[g]) for g in present)
    rates = {g: (float(weights[g]) * T) / float(n[g]) for g in present}

    M53 = np.int64((1 << 53) - 1)
    D53 = float(1 << 53)

    def pick(batch: pa.Table) -> pa.Table:
        from invertedindex_ray.functions.hashing import md5_hash63

        if batch.num_rows == 0:
            return out_schema.empty_table()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        langs = batch["lang"].to_pylist()
        h = md5_hash63(["mix:" + str(int(i)) for i in ids])
        u = ((h & M53).astype(np.float64) + 0.5) / D53
        rate = np.array([rates.get(lg, 0.0) for lg in langs])
        keep = u < rate
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], type=pa.int64()),
                "lang": pa.array(
                    [lg for lg, k in zip(langs, keep) if k], type=pa.string()
                ),
            }
        )

    return docs.map_batches(pick, batch_format="pyarrow")


def lang_source_matrix(sf_dir: str):
    """(lang, source, n_docs, n_chars_t): the language x source mixing
    matrix — the first report a data-mixing job prints (which sources
    supply which languages, by docs and by volume). Uses the documents
    table's lang label column directly (the lang_id operator is its
    heuristic twin for unlabeled corpora).

    Scale shape: per-batch partial counts collapse each batch to at
    most #langs x #sources rows; one keyed reduction sums them. Output
    cardinality is the taxonomy product, never corpus rows."""
    import pandas as pd

    from invertedindex_ray.functions.grouping import (
        grouped_partitions,
        parquet_num_rows,
        reduction_partitions,
    )
    from invertedindex_ray.functions.hashing import hash_strings

    part_schema = pa.schema(
        [("lang", pa.string()), ("source", pa.string()),
         ("n_docs", pa.int64()), ("n_chars_t", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return part_schema.empty_table()
        df = pd.DataFrame(
            {
                "lang": batch["lang"].to_pylist(),
                "source": batch["source"].to_pylist(),
                "n_chars": batch["n_chars"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby(["lang", "source"], dropna=False, as_index=False).agg(
            n_docs=("n_chars", "size"), n_chars_t=("n_chars", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False).cast(part_schema)

    def sum_key(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["lang", "source"], dropna=False, as_index=False).agg(
            n_docs=("n_docs", "sum"), n_chars_t=("n_chars_t", "sum")
        )

    return grouped_partitions(
        _docs(sf_dir, ["lang", "source", "n_chars"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        lambda b: hash_strings(
            [f"{l}\x00{s}" for l, s in zip(b["lang"].to_pylist(),
                                           b["source"].to_pylist())]
        ),
        sum_key,
        part_schema,
        # per-batch (lang, source) partials: a few rows per read batch
        n_partitions=reduction_partitions(
            parquet_num_rows(f"{sf_dir}/documents.parquet") // 1000
        ),
    )


def length_percentile(sf_dir: str):
    """(doc_id, source, n_chars, pct_r): each document's length
    percent_rank WITHIN its source — the normalized signal mix-
    threshold rules cut on ("drop the bottom decile per source", which
    an absolute length cut gets wrong for short-form sources).
    percent_rank semantics match SQL: (count of strictly smaller rows)
    / (n_source - 1), 0.0 for a single-row source; ties share a rank.

    Scale shape: the corpus never sorts. Per-batch partials collapse to
    (source, n_chars, c) HISTOGRAM rows (distinct lengths x sources,
    thousands — the length_quantiles argument); the driver builds
    per-source cumulative maps from the gathered histogram and
    broadcasts them once via ray.put; one map_batches pass emits the
    per-doc row with a searchsorted lookup. Driver state is histogram-
    sized, never corpus-sized."""
    import pandas as pd
    import ray

    from invertedindex_ray.functions.grouping import (
        grouped_partitions,
        parquet_num_rows,
        reduction_partitions,
    )
    from invertedindex_ray.functions.hashing import hash_strings
    from invertedindex_ray.functions.rounding import round_half_up

    hist_schema = pa.schema(
        [("source", pa.string()), ("n_chars", pa.int64()), ("c", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return hist_schema.empty_table()
        df = pd.DataFrame(
            {
                "source": batch["source"].to_pylist(),
                "n_chars": batch["n_chars"].to_numpy(zero_copy_only=False),
            }
        )
        # dropna=False: a NULL source is its own percent_rank partition
        # (matching SQL's PARTITION BY; sibling lang_source_matrix rule)
        g = df.groupby(["source", "n_chars"], dropna=False,
                       as_index=False).size()
        g = g.rename(columns={"size": "c"})
        return pa.Table.from_pandas(g, preserve_index=False).cast(hist_schema)

    def sum_key(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["source", "n_chars"], dropna=False,
                         as_index=False).agg(c=("c", "sum"))

    hist = grouped_partitions(
        _docs(sf_dir, ["source", "n_chars"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        lambda b: hash_strings(
            [s if s is not None else "\x00<null>" for s in
             b["source"].to_pylist()]
        ),
        sum_key,
        hist_schema,
        # histogram rows bounded by distinct lengths x sources <= docs
        n_partitions=reduction_partitions(
            parquet_num_rows(f"{sf_dir}/documents.parquet")
        ),
    ).take_all()  # histogram-sized: distinct lengths x sources

    # per-source (sorted values, cum-smaller counts, n)
    maps: dict = {}
    by_src: dict = {}
    for r in hist:
        by_src.setdefault(r["source"], []).append((int(r["n_chars"]), int(r["c"])))
    for s, rows in by_src.items():
        rows.sort()
        vals = np.array([v for v, _ in rows], dtype=np.int64)
        cnts = np.array([c for _, c in rows], dtype=np.int64)
        smaller = np.concatenate(([0], np.cumsum(cnts)[:-1]))
        maps[s] = (vals, smaller, int(cnts.sum()))
    ref = ray.put(maps)

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("source", pa.string()),
         ("n_chars", pa.int64()), ("pct_r", pa.float64())]
    )

    def per_doc(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema.empty_table()
        m = ray.get(ref)
        src = batch["source"].to_pylist()
        nc = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        pct = np.zeros(len(src), dtype=np.float64)
        # one factorize, then vectorized per-source masks (no Python
        # comparison per row x source)
        codes, uniques = pd.factorize(
            np.asarray(src, dtype=object), use_na_sentinel=False
        )
        for ci, s in enumerate(uniques):
            key = s if not pd.isna(s) else None
            vals, smaller, n = m[key]
            idx = codes == ci
            if n <= 1:
                pct[idx] = 0.0
                continue
            pos = np.searchsorted(vals, nc[idx])
            pct[idx] = smaller[pos] / float(n - 1)
        return pa.table(
            {
                "doc_id": batch["doc_id"].combine_chunks()
                if isinstance(batch["doc_id"], pa.ChunkedArray)
                else batch["doc_id"],
                "source": pa.array(src, type=pa.string()),
                "n_chars": pa.array(nc, type=pa.int64()),
                "pct_r": pa.array(round_half_up(pct, 6), type=pa.float64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "source", "n_chars"]).map_batches(
        per_doc, batch_format="pyarrow"
    )


#: Bound on the broadcast boilerplate-line set (~40 MB of uint64 at the
#: default). Real boilerplate (headers, footers, cookie banners) is a
#: bounded set by nature; hitting this bound means the threshold is
#: catching body text, not boilerplate.
BOILERPLATE_MAX_LINES = 5_000_000


def boilerplate_lines(sf_dir: str, *, min_df: int = 2):
    """(doc_id, n_lines, n_removed, text_clean): corpus-frequency line
    removal — the classic CommonCrawl boilerplate cleaner: any line
    (verbatim, newline-split) appearing in >= ``min_df`` DISTINCT
    documents is cut from every document; survivors re-join with
    newlines. The corpus-level sibling of the per-line C4 rules in
    :func:`c4_line_filter`.

    Scale shape: the shuffle moves only 16 B (line-hash, 1) rows after
    a per-doc dedupe (a doc sits whole in one batch row, so one pass
    dedupes its repeated lines); one keyed reduction computes each
    line's doc frequency; the flagged set (a bounded artifact — real
    boilerplate is headers/footers/banners) is broadcast once via
    ray.put, failing LOUDLY above :data:`BOILERPLATE_MAX_LINES`; the
    rewrite pass is then zero-shuffle. md5-keyed so the DuckDB mirror
    reproduces the grouping (collision odds ~2^-63, the passage_dedup
    assumption)."""
    import pandas as pd
    import ray

    from invertedindex_ray.functions.grouping import (
        grouped_partitions,
        table_partitions,
    )

    hash_schema = pa.schema([("h", pa.int64()), ("c", pa.int64())])

    def line_hashes(batch: pa.Table):
        import pyarrow.compute as pc

        text = _str_col(batch, "text")
        lines = pc.split_pattern(text, "\n")
        lines = (
            lines.combine_chunks()
            if isinstance(lines, pa.ChunkedArray)
            else lines
        )
        return lines

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return hash_schema.empty_table()
        lines = line_hashes(batch)
        flat = lines.values.to_pylist()
        offs = lines.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        doc_ix = np.repeat(np.arange(len(offs) - 1), np.diff(offs))
        h = md5_hash63(flat)
        # per-doc dedupe: a line counted once per containing doc
        key = np.stack([doc_ix, h.view(np.int64)], axis=1)
        uniq = np.unique(key, axis=0)
        hu, cnt = np.unique(uniq[:, 1], return_counts=True)
        return pa.table(
            {
                "h": pa.array(hu, type=pa.int64()),
                "c": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    def sum_df(g: pd.DataFrame) -> pd.DataFrame:
        h = g["h"].to_numpy()
        c = g["c"].to_numpy()
        hu, inv = np.unique(h, return_inverse=True)
        tot = np.bincount(inv, weights=c).astype(np.int64)
        keep = tot >= min_df
        return pd.DataFrame({"h": hu[keep], "c": tot[keep]})

    flagged_rows = grouped_partitions(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        lambda b: b["h"].to_numpy(zero_copy_only=False).astype(np.uint64),
        sum_df,
        hash_schema,
        n_partitions=table_partitions(
            f"{sf_dir}/documents.parquet", expand=8  # ~lines per doc
        ),
    ).take_all()
    if len(flagged_rows) > BOILERPLATE_MAX_LINES:
        raise ValueError(
            f"boilerplate_lines: {len(flagged_rows)} distinct lines cross "
            f"min_df={min_df}, above the broadcast bound of "
            f"{BOILERPLATE_MAX_LINES}. A flagged set this large is body "
            "text, not boilerplate — raise min_df, or restructure as a "
            "hash-join rewrite (the passage_dedup deletion-join shape)."
        )
    # sorted int64 array, NOT a set of Python ints: 8 B/entry (a 5M-hash
    # set of boxed ints is ~10x that and re-unpickles per worker, while
    # a numpy buffer is plasma zero-copy), membership via searchsorted
    boiler = np.sort(
        np.fromiter(
            (int(r["h"]) for r in flagged_rows),
            dtype=np.int64,
            count=len(flagged_rows),
        )
    )
    ref = ray.put(boiler)

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_lines", pa.int64()),
         ("n_removed", pa.int64()), ("text_clean", pa.string())]
    )

    def rewrite(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema.empty_table()
        bset = ray.get(ref)
        lines = line_hashes(batch)
        flat = lines.values.to_pylist()
        offs = lines.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        h = md5_hash63(flat).view(np.int64)
        if len(bset):
            pos = np.searchsorted(bset, h)
            pos = np.minimum(pos, len(bset) - 1)
            bad = bset[pos] == h
        else:
            bad = np.zeros(len(h), dtype=bool)
        n_lines = np.diff(offs)
        n_removed = np.add.reduceat(
            np.concatenate((bad.astype(np.int64), [0])), offs[:-1]
        )
        n_removed[n_lines == 0] = 0
        clean = [
            "\n".join(
                l
                for l, b in zip(flat[offs[i]: offs[i + 1]],
                                bad[offs[i]: offs[i + 1]])
                if not b
            )
            for i in range(batch.num_rows)
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "n_lines": pa.array(n_lines.astype(np.int64), type=pa.int64()),
                "n_removed": pa.array(n_removed, type=pa.int64()),
                "text_clean": pa.array(clean, type=pa.string()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        rewrite, batch_format="pyarrow"
    )
