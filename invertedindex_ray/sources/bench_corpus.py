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


def corpus_path(n_docs: int, seed: int = 42) -> str:
    # a DIRECTORY of parquet files (one per rows_per_group docs): read
    # parallelism is per-file, so a single big file would cap the
    # read->tokenize stage at #row-groups tasks no matter the CPU count
    return f"/tmp/iidx-bench-corpus-{n_docs}-{seed}"


def ensure_corpus(n_docs: int, seed: int = 42, *, rows_per_group: int = 5_000) -> str:
    """Generate (once) and return the dir of the bench pages parquet."""
    path = corpus_path(n_docs, seed)
    if os.path.isdir(path) and os.listdir(path):
        return path
    rng = np.random.default_rng(seed)
    n_vocab = len(_WORDS)
    # Zipf-ish rank probabilities over the vocabulary
    p = 1.0 / np.arange(1, n_vocab + 1) ** 1.07
    p /= p.sum()

    tmp = path + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    file_no = 0
    done = 0
    while done < n_docs:
        n = min(rows_per_group, n_docs - done)
        lengths = rng.integers(40, 320, size=n)
        total = int(lengths.sum())
        words = rng.choice(_WORDS, size=total, p=p)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lengths, out=offsets[1:])
        texts = [" ".join(words[offsets[i]:offsets[i + 1]]) for i in range(n)]
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
