"""RM3 pseudo-relevance feedback: expand each query with terms drawn
from its own top-ranked documents, then re-retrieve with the expanded
weighted query (Lavrenko & Croft relevance models interpolated with the
original query — the RM3 variant popularized by Indri/Anserini).

Semantics (all disjunctive; RM3 is a relevance-model method, AND has no
meaning for the expanded query):

1. First pass: BM25 OR top-``fb_docs`` per query (the SQL-checked
   :func:`batch_query.batch_topk` machinery, scores rounded to 9 dp).
2. Relevance model: ``rm(t) = sum over feedback docs d of
   (tf(t,d)/|d|) * score(d)``, L1-normalized per query, rounded to 9 dp;
   top-``fb_terms`` terms by (weight DESC, term ASC).
3. Interpolation: ``w(t) = alpha * 1/|q| [t in original query]
   + (1-alpha) * rm(t) [t in expansion]``, rounded to 9 dp.
4. Second pass: weighted disjunctive BM25
   (``score(d) = sum w(t) * bm25(t,d)``), deterministic top-``k``.

Scale shape: both retrieval passes are the streaming batch_topk
pipeline (semi-join on broadcast terms, partial sums, one (qid, doc)
reduction). The ONLY driver-side state is the feedback-doc term table —
bounded by ``|queries| * fb_docs`` documents by contract (this is a
query-set operator, not a corpus operator) — and the per-query weight
maps. Feedback docs are selected with a broadcast id set, never a
shuffle. Expansion terms are already corpus tokens, so the second pass
uses the ``parsed=`` hook and skips re-preprocessing (a stemmer would
double-stem; see batch_query.batch_topk).

The driver oracle (__ray_entry__._rm3_sql) mirrors every step in SQL —
same roundings, same tie rules — so the full feedback loop is
hash-checked end to end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from invertedindex_ray.config import IndexConfig
from invertedindex_ray.functions.rounding import round_half_up_scalar
from invertedindex_ray.pipelines.analytics import (
    NOSTEM,
    _explode_batch,
    _tokenized,
)
from invertedindex_ray.pipelines.batch_query import batch_topk, parse_queries

_FB_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("term", pa.string()),
        ("tf", pa.int64()),
        ("doc_len", pa.int64()),
    ]
)


def _feedback_term_rows(sf_dir: str, cfg: IndexConfig, fb_ids: set) -> list:
    """(doc_id, term, tf, doc_len) rows for the feedback docs — one
    streaming pass filtering on a broadcast id set; bounded take_all
    (|queries| * fb_docs docs by contract)."""
    import ray
    import pyarrow.compute as pc

    ids_ref = ray.put(pa.array(sorted(fb_ids), type=pa.int64()))

    def pick(batch: pa.Table) -> pa.Table:
        import ray as _ray

        mask = pc.is_in(batch["doc_id"].cast(pa.int64()), value_set=_ray.get(ids_ref))
        batch = batch.filter(mask)
        if batch.num_rows == 0:
            return _FB_SCHEMA.empty_table()
        t = _explode_batch(batch)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "term": t["term"],
                "tf": t["tf"],
                "doc_len": t["doc_len"],
            }
        )

    return (
        _tokenized(sf_dir, cfg)
        .map_batches(pick, batch_format="pyarrow")
        .take_all()
    )


def rm3_search(
    sf_dir: str,
    queries: list[tuple[str, str]],
    *,
    fb_docs: int = 5,
    fb_terms: int = 8,
    alpha: float = 0.5,
    k: int = 10,
    cfg: IndexConfig = NOSTEM,
) -> pa.Table:
    """(qid, doc_id, score_r, rank) under RM3-expanded queries."""
    parsed0 = parse_queries(queries, cfg)
    parsed_or = [(qid, "or", terms) for qid, _, terms in parsed0]

    fb = batch_topk(sf_dir, None, k=fb_docs, cfg=cfg, parsed=parsed_or)
    fb_ids = set(fb["doc_id"].to_pylist())

    # doc -> [(term, tf, doc_len)] for feedback docs
    doc_terms: dict[int, list] = {}
    if fb_ids:
        for r in _feedback_term_rows(sf_dir, cfg, fb_ids):
            doc_terms.setdefault(int(r["doc_id"]), []).append(
                (r["term"], int(r["tf"]), int(r["doc_len"]))
            )

    # per-query feedback rows in rank order (deterministic float sums)
    fb_by_q: dict[str, list] = {}
    qids_fb = fb["qid"].to_pylist()
    docs_fb = fb["doc_id"].to_pylist()
    scores_fb = fb["score_r"].to_pylist()
    ranks_fb = fb["rank"].to_pylist()
    for qid, d, s, rk in zip(qids_fb, docs_fb, scores_fb, ranks_fb):
        fb_by_q.setdefault(qid, []).append((rk, int(d), float(s)))

    weights: dict[str, dict[str, float]] = {}
    for qid, _, terms in parsed_or:
        nq = len(terms)
        if nq == 0:
            continue
        # FLOAT-ORDER ASSUMPTION (ADVICE r3): contributions accumulate in
        # feedback-RANK order (deterministic), while the SQL oracle's
        # SUM() is order-unspecified. Both sides round to 9 dp before
        # comparison, so they diverge only if an exact sum lands on a
        # rounding boundary AND DuckDB associates differently — never
        # observed (tests are bit-exact). If the oracle ever flakes here,
        # canonicalize both sides: sum per term in ascending doc_id order
        # and add a deterministic ORDER BY inside the SQL aggregate.
        rm: dict[str, float] = {}
        for _, d, s in sorted(fb_by_q.get(qid, [])):
            for t, tf, dl in doc_terms.get(d, ()):
                rm[t] = rm.get(t, 0.0) + (tf / dl) * s
        w: dict[str, float] = {t: alpha / nq for t in terms}
        if rm:
            z = float(np.sum([rm[t] for t in sorted(rm)]))
            p = {t: round_half_up_scalar(v / z, 9) for t, v in rm.items()}
            top = sorted(p.items(), key=lambda kv: (-kv[1], kv[0]))[:fb_terms]
            for t, pv in top:
                w[t] = w.get(t, 0.0) + (1.0 - alpha) * pv
        weights[qid] = {t: round_half_up_scalar(v, 9) for t, v in w.items()}

    parsed2 = [
        (qid, "or", frozenset(weights[qid])) for qid in sorted(weights)
        if weights[qid]
    ]
    return batch_topk(
        sf_dir, None, k=k, cfg=cfg, parsed=parsed2, term_weights=weights
    )
