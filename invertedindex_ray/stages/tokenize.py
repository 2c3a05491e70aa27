"""Tokenize stage: pages -> per-doc (url, doc_len, terms, tfs).

A callable class so ``map_batches(TokenizeStage, concurrency=N)`` runs it
as an actor pool: the stopword set is module state and the token->stem
memo accumulates across batches per actor (the reference reuses one
stemmer instance the same way, TextProcessingUtils.java:15).

Replaces the reference's ingest+tokenize loop
(/root/reference/src/main/java/it/unipi/indexer/Indexer.java:57-124);
the per-doc TF collapse (LexiconTermIndexing.java:36-49) happens inside
:func:`textproc.tokenize_docs`. Docs with doc_len == 0 are dropped here —
they consume no doc id (Indexer.java:84,121).
"""

from __future__ import annotations

import pyarrow as pa

from invertedindex_ray.config import IndexConfig
from invertedindex_ray.functions.textproc import StemMemo, tokenize_docs

TOKENIZED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("doc_len", pa.int32()),
        ("terms", pa.list_(pa.string())),
        ("tfs", pa.list_(pa.int32())),
    ]
)


# Module-level stem memo: Ray task workers are long-lived processes, so a
# plain-function tokenize stage keeps cross-batch memoization without the
# actor-pool spin-up cost (an actor pool pays ~seconds of startup per
# execution; tasks reuse the already-warm worker pool). The memo is a pure
# cache — no correctness state — so task-level parallelism stays safe.
_GLOBAL_MEMO = StemMemo()


def tokenize_pages_batch(batch: pa.Table, config: IndexConfig | None = None) -> pa.Table:
    """Stateless-task variant of TokenizeStage (same output schema)."""
    import pyarrow.compute as pc

    cfg = config or IndexConfig()
    terms, tfs, doc_len = tokenize_docs(
        batch["text"],
        stemming=cfg.stemming,
        stopword_removal=cfg.stopwords,
        max_term_len=cfg.max_term_len,
        memo=_GLOBAL_MEMO if cfg.stemming else None,
    )
    url = batch["url"]
    url = url.combine_chunks() if isinstance(url, pa.ChunkedArray) else url
    out = pa.table(
        {
            "url": url,
            "doc_len": pa.array(doc_len, type=pa.int32()),
            "terms": terms,
            "tfs": tfs,
        }
    )
    return out.filter(pc.greater(out["doc_len"], 0))


class TokenizeStage:
    def __init__(self, config: IndexConfig | None = None):
        self.config = config or IndexConfig()
        self.memo = StemMemo() if self.config.stemming else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.config
        terms, tfs, doc_len = tokenize_docs(
            batch["text"],
            stemming=cfg.stemming,
            stopword_removal=cfg.stopwords,
            max_term_len=cfg.max_term_len,
            memo=self.memo,
        )
        url = batch["url"]
        url = url.combine_chunks() if isinstance(url, pa.ChunkedArray) else url
        out = pa.table(
            {
                "url": url,
                "doc_len": pa.array(doc_len, type=pa.int32()),
                "terms": terms,
                "tfs": tfs,
            }
        )
        # empty-after-stopwords docs consume no doc id
        import pyarrow.compute as pc

        return out.filter(pc.greater(out["doc_len"], 0))
