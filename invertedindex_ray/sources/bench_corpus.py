"""Deterministic benchmark corpus: web-page-shaped docs at tunable scale.

The driver's documents table is tiny (500-5000 rows), so build-throughput
benchmarks synthesize a larger pages corpus (seeded, cached under /tmp).
Doc lengths ~U(40, 320) tokens with a Zipf vocabulary — comparable token
volume per doc to web text, and head terms exercise skip pointers
(df > 1024) and the salted shuffle at bench scale.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_WORDS = np.array(
    [
        "data", "index", "search", "query", "page", "web", "crawl", "link",
        "site", "text", "word", "time", "user", "info", "news", "home",
        "ranking", "retrieval", "posting", "lexicon", "compression", "pointer",
        "frequency", "document", "partition", "shuffle", "streaming", "cluster",
        "running", "jumped", "quickly", "happily", "nation", "generous",
        "condition", "relation", "adjust", "hopeful", "electric", "community",
        "generate", "apply", "flies", "cries", "agree", "system", "value",
        "number", "table", "group", "batch", "stream", "window", "filter",
        "join", "merge", "sort", "hash", "scan", "store", "cache", "block",
        "the", "and", "of", "to", "is", "in", "for", "with", "was", "this",
    ]
    + [f"tail{i:04d}" for i in range(2000)],
    dtype=object,
)


def corpus_path(n_docs: int, seed: int = 42, variant: str = "uniform") -> str:
    # a DIRECTORY of parquet files (one per rows_per_group docs): read
    # parallelism is per-file, so a single big file would cap the
    # read->tokenize stage at #row-groups tasks no matter the CPU count
    if variant == "uniform":
        suffix = ""
    else:
        # EVERY generation constant feeds the cache key via one hash —
        # tuning any of them must invalidate the cached corpus, or the
        # bench silently measures stale data
        import hashlib

        params = repr((
            _SKEW_RUN, _SKEW_HOT_EVERY, _SKEW_FOCUS_REPEATS,
            _SKEW_FOCUS_RANKS, _SKEW_HOT_LEN, _SKEW_COLD_LEN,
            _SKEW_N_FOCUS, _ZIPF_EXP,
            hashlib.sha256("\x00".join(_WORDS).encode()).hexdigest(),
        )).encode()
        suffix = f"-{variant}-{hashlib.sha256(params).hexdigest()[:10]}"

    return f"/tmp/iidx-bench-corpus-{n_docs}-{seed}{suffix}"


# skewed-variant layout: doc-id runs of this many consecutive docs
# alternate hot/cold, so per-posting BM25 scores are CORRELATED with
# doc id — the regime where Block-Max WAND's per-block bounds diverge
# from the list-level bound and block skipping pays (Ding & Suel 2011
# evaluate on exactly this property of real postings; the uniform
# variant's i.i.d. scores make every 128-posting block contain a
# near-max posting, so block max == list max and BMW degenerates to
# WAND — BASELINE.md round-4 BMW section).
_SKEW_RUN = 4096
_SKEW_HOT_EVERY = 8          # 1 run in 8 is hot (~12% of docs)
_SKEW_FOCUS_REPEATS = (6, 20)  # tf boost inside hot docs
_SKEW_HOT_LEN = (30, 60)       # hot-doc token count
_SKEW_COLD_LEN = (400, 700)    # cold-doc token count
_SKEW_N_FOCUS = (2, 4)         # focus words planted per hot doc
_UNIFORM_LEN = (40, 320)       # uniform-variant doc token count
_ZIPF_EXP = 1.07               # vocabulary rank skew
# focus band: vocabulary ranks boosted in hot docs. Deliberately in the
# Zipf TAIL (cold docs carry tf<=1 for these), so a focus list's cold
# block maxima sit ~3x below its hot maxima — head/mid ranks don't work
# because Zipf tf grows with doc length and washes the contrast out
# (measured: ranks 20-60 gave cold tf 2-6 and bmw==wand). The pool is
# kept SMALL so pairs of focus words co-boost in enough hot docs that a
# top-10 threshold needs every query term — then the BMW pivot is the
# last cursor and block skips jump to block boundaries, not to the next
# cursor's doc id (the regime Ding & Suel 2011 report 2-3x wins in).
_SKEW_FOCUS_RANKS = (150, 190)


def ensure_corpus(
    n_docs: int,
    seed: int = 42,
    *,
    rows_per_group: int = 5_000,
    variant: str = "uniform",
) -> str:
    """Generate (once) and return the dir of the bench pages parquet.

    ``variant="uniform"``: doc lengths ~U(40, 320), i.i.d. Zipf tokens.
    ``variant="skewed"``: doc-id runs of 4096 alternate hot (short docs,
    30-60 tokens, with a few mid-vocabulary focus words repeated 6-20x)
    and cold (long docs, 400-700 tokens, plain Zipf) — wide doc-length
    spread + Zipf tf concentrated in hot doc-id ranges, so each posting
    list's per-block score maxima vary by 2-3x along the list."""
    if variant not in ("uniform", "skewed"):
        raise ValueError(f"unknown corpus variant {variant!r}")
    path = corpus_path(n_docs, seed, variant)
    if os.path.isdir(path) and os.listdir(path):
        return path
    rng = np.random.default_rng(seed)
    n_vocab = len(_WORDS)
    # Zipf-ish rank probabilities over the vocabulary
    p = 1.0 / np.arange(1, n_vocab + 1) ** _ZIPF_EXP
    p /= p.sum()
    focus_pool = np.arange(*_SKEW_FOCUS_RANKS)

    tmp = path + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    file_no = 0
    done = 0
    while done < n_docs:
        n = min(rows_per_group, n_docs - done)
        if variant == "skewed":
            doc_idx = np.arange(done, done + n, dtype=np.int64)
            hot = (doc_idx // _SKEW_RUN) % _SKEW_HOT_EVERY == 0
            lengths = np.where(
                hot,
                rng.integers(*_SKEW_HOT_LEN, size=n),
                rng.integers(*_SKEW_COLD_LEN, size=n),
            )
        else:
            hot = np.zeros(n, dtype=bool)
            lengths = rng.integers(*_UNIFORM_LEN, size=n)
        total = int(lengths.sum())
        words = rng.choice(_WORDS, size=total, p=p)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lengths, out=offsets[1:])
        texts = [" ".join(words[offsets[i]:offsets[i + 1]]) for i in range(n)]
        if hot.any():
            # overwrite a prefix of each hot doc with repeated focus
            # words (tf 6-20): hot docs are short AND term-concentrated,
            # so their postings carry 2-3x the per-posting BM25 partial
            # of cold postings for the same term
            lo, hi = _SKEW_FOCUS_REPEATS
            for i in np.flatnonzero(hot):
                doc_words = words[offsets[i]:offsets[i + 1]].copy()
                n_focus = int(rng.integers(*_SKEW_N_FOCUS))
                picks = rng.choice(focus_pool, size=n_focus, replace=False)
                pos = 0
                for w_idx in picks:
                    reps = min(int(rng.integers(lo, hi)), len(doc_words) - pos)
                    doc_words[pos:pos + reps] = _WORDS[w_idx]
                    pos += reps
                    if pos >= len(doc_words):
                        break
                texts[i] = " ".join(doc_words)
        urls = [f"https://bench.example.org/{seed}/{done + i:010d}" for i in range(n)]
        table = pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "warc_ts": pa.array(
                    np.arange(done, done + n, dtype=np.int64) * 1_000_000
                    + 1_704_067_200_000_000,
                    type=pa.timestamp("us"),
                ),
                "html": pa.array([b""] * n, type=pa.binary()),
                "text": pa.array(texts, type=pa.string()),
                "lang": pa.array(["en"] * n, type=pa.string()),
            }
        )
        pq.write_table(table, os.path.join(tmp, f"part-{file_no:05d}.parquet"))
        file_no += 1
        done += n
    os.replace(tmp, path)
    return path
