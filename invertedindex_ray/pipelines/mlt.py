"""More-like-this retrieval: find the documents most similar to a set
of seed documents, using the index's own signals end to end — each
seed's top-TF-IDF keywords become an OR query scored with BM25 over the
whole corpus (the classic Lucene/Elasticsearch ``more_like_this``
semantics, rebuilt on the SQL-checked batch-retrieval pipeline).

Shape: one pass over the tokenized corpus extracts the seeds' keyword
queries (per-doc top-m TF-IDF, full-corpus df broadcast via ``ray.put``
— same bounded-vocabulary broadcast as ``curation.top_keywords``), then
:func:`batch_query.batch_topk` scores them distributively (semi-join on
broadcast query terms -> partial sums -> one (qid, doc) aggregate ->
per-qid top-k). Seeds are excluded from their own result lists BEFORE
ranking. Everything here mirrors to SQL exactly (see
``__ray_entry__._mlt_sql``).

Scale notes: the seed set is small by contract (it is a "find me more
of these" request, not the corpus), so the keyword table is a bounded
``take_all``; the corpus side streams through the same two shuffles as
``topk_batch``. At index-serving time the same semantics come free from
the DAAT engine (build the OR query from ``curation.top_keywords`` and
hand it to ``QueryEngine.query``); this pipeline is the index-free
batch variant.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from invertedindex_ray.config import IndexConfig
from invertedindex_ray.functions.rounding import round_half_up
from invertedindex_ray.pipelines.analytics import (
    NOSTEM,
    _explode_batch,
    _tokenized,
    collection_stats,
    lexicon,
)

_KW_SCHEMA = pa.schema(
    [
        ("seed_id", pa.int64()),
        ("term", pa.string()),
        ("tfidf_r", pa.float64()),
        ("kw_rank", pa.int64()),
    ]
)


def seed_keywords(
    sf_dir: str,
    *,
    seed_mod: int = 101,
    m: int = 5,
    cfg: IndexConfig = NOSTEM,
) -> dict[int, list[str]]:
    """Per-seed top-``m`` TF-IDF keywords (ties: term ascending), for
    seed docs ``doc_id % seed_mod == 0``. Keyword selection happens
    inside the tokenized pass (rows are doc-contiguous), with the
    full-corpus (term -> df) map broadcast once."""
    import ray

    stats = collection_stats(sf_dir, cfg)
    n_docs = int(stats["num_docs"][0].as_py())
    lex = lexicon(sf_dir, cfg).select_columns(["term", "df"]).take_all()
    df_ref = ray.put({r["term"]: int(r["df"]) for r in lex})

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        mask = (ids % seed_mod) == 0
        if not mask.any():
            return _KW_SCHEMA.empty_table()
        import pyarrow.compute as pc

        t = _explode_batch(batch.filter(pa.array(mask)))
        dfm = ray.get(df_ref)
        term = t["term"]
        term = term.combine_chunks() if isinstance(term, pa.ChunkedArray) else term
        d = pc.dictionary_encode(term)
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        idf_u = np.fromiter(
            (math.log(n_docs / dfm[tm]) for tm in d.dictionary.to_pylist()),
            dtype=np.float64,
            count=len(d.dictionary),
        )
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = round_half_up(idf_u[codes] * (1.0 + np.log(tf)), 6)
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        terms = np.asarray(term.to_pylist(), dtype=object)
        order = np.lexsort((terms, -s, doc))
        doc_o, s_o, term_o = doc[order], s[order], terms[order]
        starts = np.flatnonzero(np.concatenate(([True], doc_o[1:] != doc_o[:-1])))
        lens = np.diff(np.append(starts, len(doc_o)))
        rank = np.arange(len(doc_o), dtype=np.int64) - np.repeat(starts, lens) + 1
        keep = rank <= m
        return pa.table(
            {
                "seed_id": pa.array(doc_o[keep], type=pa.int64()),
                "term": pa.array(term_o[keep].tolist(), type=pa.string()),
                "tfidf_r": pa.array(s_o[keep], type=pa.float64()),
                "kw_rank": pa.array(rank[keep], type=pa.int64()),
            }
        )

    rows = (
        _tokenized(sf_dir, cfg)
        .map_batches(pick, batch_format="pyarrow")
        .take_all()  # bounded: n_seeds * m rows
    )
    out: dict[int, list[tuple[int, str]]] = {}
    for r in rows:
        out.setdefault(int(r["seed_id"]), []).append((int(r["kw_rank"]), r["term"]))
    return {s: [t for _, t in sorted(v)] for s, v in out.items()}


def more_like_this(
    sf_dir: str,
    *,
    seed_mod: int = 101,
    m: int = 5,
    k: int = 10,
    cfg: IndexConfig = NOSTEM,
) -> pa.Table:
    """(seed_id, doc_id, score_r, rank): for each seed doc, the ``k``
    most-BM25-similar other docs under the seed's top-``m`` TF-IDF
    keyword OR-query. Deterministic ordering (score_r DESC, doc_id ASC);
    the seed itself is excluded before ranks are assigned."""
    from invertedindex_ray.pipelines.batch_query import batch_topk

    kws = seed_keywords(sf_dir, seed_mod=seed_mod, m=m, cfg=cfg)
    queries = [(str(s), "or " + " ".join(terms)) for s, terms in sorted(kws.items())]
    tbl = batch_topk(
        sf_dir, queries, k=k, cfg=cfg, exclude={str(s): s for s in kws}
    )
    import pyarrow.compute as pc

    return pa.table(
        {
            "seed_id": pc.cast(tbl["qid"], pa.int64()),
            "doc_id": tbl["doc_id"],
            "score_r": tbl["score_r"],
            "rank": tbl["rank"],
        }
    )
