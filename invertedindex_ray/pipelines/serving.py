"""Actor-pool batch query serving: the reference's interactive query
processor (QueryProcessor.java REPL, loaded-once mmapped state) re-expressed
as a stateful Ray Data stage (SURVEY.md §2 ST3).

A ``QueryEngineActor`` loads the index ONCE in ``__init__`` (lexicon +
doc table resident, segment buckets cached lazily) and evaluates a batch
of queries per ``__call__`` — `ds.map_batches(QueryEngineActor,
concurrency=N)` gives N independent engines serving a query stream with
backpressure; query throughput scales with the actor count because the
index is read-only shared state.
"""

from __future__ import annotations

import os

import pyarrow as pa

from invertedindex_ray.config import IndexConfig

SERVE_SCHEMA = pa.schema(
    [
        ("qid", pa.string()),
        ("url", pa.string()),
        ("rank", pa.int64()),
        ("score", pa.float64()),
    ]
)


def shared_index_state(index_dir: str):
    """Decode the doc table + lexicon ONCE (driver or a single task) and
    put them in the object store; pass the returned ref to
    :func:`serve_queries` (``state_ref=``) so every engine actor maps
    the same plasma buffers zero-copy instead of paying its own disk
    decode + resident copy (VERDICT r3 #2). Payload is numpy arrays +
    one Arrow url array — all plasma-zero-copy; the lexicon's terms are
    a fixed-width ``|S`` bytes matrix (a dict of interned Python strings
    cannot be shared across processes). Segments stay per-actor and
    lazy — posting blobs are the part of the index that must never be
    resident anywhere at web scale."""
    import ray

    from invertedindex_ray.state.disktables import DocTable, Lexicon

    return ray.put(
        {
            "doc_table": DocTable.export_shared(
                os.path.join(index_dir, "doc_table")
            ),
            "lexicon": Lexicon.export_shared(os.path.join(index_dir, "lexicon")),
        }
    )


class QueryEngineActor:
    """Callable class for ``map_batches``: one QueryEngine per actor."""

    def __init__(
        self,
        index_dir: str,
        config: IndexConfig | None = None,
        k: int = 100,
        qtype: str = "OR",
        engine_kwargs: dict | None = None,
        state_ref=None,
    ):
        from invertedindex_ray.engine import QueryEngine

        kw = dict(engine_kwargs or {})
        if state_ref is not None:
            import ray

            # zero-copy plasma get: numpy buffers are mapped, not copied
            kw["shared_state"] = ray.get(state_ref)
        # engine_kwargs passes store modes through: at web scale serving
        # actors run doc_store="ondisk" / lexicon_store="ondisk" so each
        # actor's RSS stays bounded (state/disktables.py), or the pool
        # shares one decoded copy via ``state_ref``
        self.engine = QueryEngine(index_dir, config, **kw)
        self.k = k
        self.qtype = qtype

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids_in = batch["qid"].to_pylist()
        texts = batch["query"].to_pylist()
        qids, urls, ranks, scores = [], [], [], []
        for qid, q in zip(qids_in, texts):
            # qtype="raw": the query text already carries its [AND|OR]
            # operator (driver query sets); otherwise prepend the fixed one
            full = q if self.qtype == "raw" else f"{self.qtype} {q}"
            res = self.engine.query(full, self.k)
            for rank, (url, score) in enumerate(res, 1):
                qids.append(qid)
                urls.append(url)
                ranks.append(rank)
                scores.append(score)
        return pa.table(
            {
                "qid": pa.array(qids, type=pa.string()),
                "url": pa.array(urls, type=pa.string()),
                "rank": pa.array(ranks, type=pa.int64()),
                "score": pa.array(scores, type=pa.float64()),
            }
        )


def serve_queries(
    index_dir: str,
    queries: list[tuple[str, str]],
    *,
    config: IndexConfig | None = None,
    k: int = 100,
    qtype: str = "OR",
    concurrency: int = 4,
    batch_size: int = 64,
    engine_kwargs: dict | None = None,
    state_ref=None,
):
    """Evaluate a query set through an actor pool of query engines.

    ``state_ref``: optional :func:`shared_index_state` ref — the pool's
    actors then share one decoded doc-table/lexicon copy per node.

    Returns a Dataset of (qid, url, rank, score) rows. At real scale the
    query list would itself be a Dataset (read_csv of a TREC topic file);
    a list keeps the driver contract simple.
    """
    import ray.data as rd

    ds = rd.from_items([{"qid": qid, "query": q} for qid, q in queries])
    return ds.map_batches(
        QueryEngineActor,
        fn_constructor_args=(index_dir, config, k, qtype, engine_kwargs, state_ref),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
