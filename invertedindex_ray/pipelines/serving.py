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


class QueryEngineActor:
    """Callable class for ``map_batches``: one QueryEngine per actor."""

    def __init__(
        self,
        index_dir: str,
        config: IndexConfig | None = None,
        k: int = 100,
        qtype: str = "OR",
        engine_kwargs: dict | None = None,
    ):
        from invertedindex_ray.engine import QueryEngine

        # engine_kwargs passes store modes through: at web scale serving
        # actors run doc_store="ondisk" / lexicon_store="ondisk" so each
        # actor's RSS stays bounded (state/disktables.py)
        self.engine = QueryEngine(index_dir, config, **(engine_kwargs or {}))
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
):
    """Evaluate a query set through an actor pool of query engines.

    Returns a Dataset of (qid, url, rank, score) rows. At real scale the
    query list would itself be a Dataset (read_csv of a TREC topic file);
    a list keeps the driver contract simple.
    """
    import ray.data as rd

    ds = rd.from_items([{"qid": qid, "query": q} for qid, q in queries])
    return ds.map_batches(
        QueryEngineActor,
        fn_constructor_args=(index_dir, config, k, qtype, engine_kwargs),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
