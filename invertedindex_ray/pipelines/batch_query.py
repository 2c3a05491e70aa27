"""Distributed batch retrieval: score a query set against the corpus as a
pure Ray Data pipeline (the batch analog of the interactive DAAT engine —
SURVEY.md §2 O3/S5 rows; semantics = exhaustive BM25, deterministic
(score DESC, doc_id ASC) top-k with scores rounded to 9 dp).

Shape: tokenize -> explode -> semi-join on broadcast query terms ->
per-(qid, doc) partial-sum inside map_batches -> groupby(qid, doc_id)
aggregate -> per-qid top-k via map_groups. The only shuffles are the tiny
df aggregate and the (qid, doc_id) score aggregate over matching postings.

Used as the SQL-checkable retrieval gate: DuckDB mirrors every step
(see __ray_entry__.oracle_sql); the MaxScore DAAT engine is verified
rank-identical to this exhaustive scoring in pytest.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from invertedindex_ray.config import IndexConfig
from invertedindex_ray.functions.rounding import round_half_up
from invertedindex_ray.functions.textproc import preprocess_token, tokenize
from invertedindex_ray.pipelines.analytics import (
    NOSTEM,
    _explode_batch,
    _tokenized,
    collection_stats_from,
)


def _matching_postings_fn(term_set: frozenset):
    """Batch transform: explode to postings and keep only query terms
    (the semi-join on the broadcast term set) — shared by the BM25 and
    query-likelihood pipelines."""
    value_set = pa.array(sorted(term_set), type=pa.string())

    def matching_postings(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = _explode_batch(batch)
        return t.filter(pc.is_in(t["term"], value_set=value_set))

    return matching_postings


def parse_queries(queries: list[tuple[str, str]], cfg: IndexConfig):
    """[(qid, '[AND|OR] text')] -> [(qid, qtype, frozenset(terms))] using the
    reference's query preprocessing (QueryProcessor.java:135-174)."""
    out = []
    for qid, q in queries:
        toks = tokenize(q)
        qtype = toks[0] if toks else ""
        if qtype not in ("and", "or"):
            continue
        limit = len(toks)
        if len(toks) > cfg.max_query_terms:
            limit = cfg.max_query_terms + 1
        terms = set()
        for t in toks[1:limit]:
            p = preprocess_token(
                t, stemming=cfg.stemming, stopword_removal=cfg.stopwords,
                max_term_len=cfg.max_term_len,
            )
            if p is not None:
                terms.add(p)
        out.append((qid, qtype, frozenset(terms)))
    return out


def batch_topk(
    sf_dir: str,
    queries: list[tuple[str, str]] | None,
    k: int = 20,
    cfg: IndexConfig = NOSTEM,
    exclude: dict[str, int] | None = None,
    *,
    parsed: list[tuple[str, str, frozenset]] | None = None,
    term_weights: dict[str, dict[str, float]] | None = None,
    return_internals: bool = False,
) -> pa.Table:
    """Returns (qid, doc_id, score_r, rank) for every query.

    AND semantics follow the reference: if any query term is absent from
    the corpus the query returns nothing; otherwise docs must match every
    term. OR ignores missing terms. ``exclude`` maps a qid to one doc_id
    dropped from that query's results BEFORE ranking (the
    more-like-this seed-exclusion hook).

    ``parsed`` bypasses :func:`parse_queries` with pre-parsed
    ``(qid, qtype, terms)`` triples — the hook for callers whose terms
    are already corpus tokens and must NOT be re-preprocessed (RM3
    expansion terms). ``term_weights[qid][term]`` scales that term's
    BM25 contribution for that query (default 1.0) — the weighted-query
    primitive RM3 scores with. ``return_internals=True`` returns
    ``(result, post, df_map)`` so a downstream pass (ltr_features) can
    reuse the materialized matched-postings Dataset and term df map
    instead of re-running the corpus tokenize + semi-join.
    """
    if parsed is None:
        parsed = parse_queries(queries, cfg)
    all_terms = sorted(set().union(*[t for _, _, t in parsed]) if parsed else set())
    if not all_terms:
        empty = pa.table(
            {"qid": pa.array([], type=pa.string()),
             "doc_id": pa.array([], type=pa.int64()),
             "score_r": pa.array([], type=pa.float64()),
             "rank": pa.array([], type=pa.int64())}
        )
        return (empty, None, {}) if return_internals else empty

    # tokenize ONCE and reuse for stats, df and scoring (three derived
    # executions read the materialized blocks instead of re-tokenizing)
    tok = _tokenized(sf_dir, cfg).materialize()
    stats = collection_stats_from(tok)
    n_docs = int(stats["num_docs"][0].as_py())
    avg = float(stats["avg_doc_len"][0].as_py())
    term_set = frozenset(all_terms)

    # materialized: reused by the df aggregate AND the scoring pass (a
    # lazy `post` would re-run explode+filter once per consumer)
    post = tok.map_batches(
        _matching_postings_fn(term_set), batch_format="pyarrow"
    ).materialize()
    # df for the (few) query terms — a tiny shuffle
    from ray.data.aggregate import Count

    df_tbl = post.groupby("term").aggregate(Count(alias_name="df"))
    df_map = {
        r["term"]: int(r["df"]) for r in df_tbl.take_all()
    }

    k1, b = cfg.bm25_k1, cfg.bm25_b

    def score_rows(batch: pa.Table) -> pa.Table:
        terms = batch["term"].to_pylist()
        tf = batch["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dl = batch["doc_len"].to_numpy(zero_copy_only=False).astype(np.float64)
        df = np.fromiter((df_map[t] for t in terms), dtype=np.int64, count=len(terms))
        idf = np.fromiter(
            (math.log(n_docs / int(d)) for d in df), dtype=np.float64, count=len(df)
        )
        partial = tf / ((k1 * ((1 - b) + b * (dl / avg))) + tf)
        return pa.table(
            {
                "term": batch["term"].combine_chunks()
                if isinstance(batch["term"], pa.ChunkedArray)
                else batch["term"],
                "doc_id": batch["doc_id"].combine_chunks()
                if isinstance(batch["doc_id"], pa.ChunkedArray)
                else batch["doc_id"],
                "score": pa.array(partial * idf, type=pa.float64()),
            }
        )

    scored = post.map_batches(score_rows, batch_format="pyarrow")

    # expand to (qid, doc_id, score, hit) rows per query containing the term
    term_to_queries: dict[str, list[str]] = {}
    and_n_required: dict[str, int] = {}
    dead_qids = set()
    for qid, qtype, terms in parsed:
        present = [t for t in terms if t in df_map]
        if qtype == "and":
            if len(present) < len(terms) or not terms:
                dead_qids.add(qid)  # missing term -> no results
                continue
            and_n_required[qid] = len(terms)
        if not present:
            dead_qids.add(qid)
            continue
        for t in present:
            term_to_queries.setdefault(t, []).append(qid)

    def fanout(batch: pa.Table) -> pa.Table:
        terms = batch["term"].to_pylist()
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
        score = batch["score"].to_numpy(zero_copy_only=False)
        qids, d_out, s_out = [], [], []
        for i, t in enumerate(terms):
            for qid in term_to_queries.get(t, ()):
                qids.append(qid)
                d_out.append(doc_id[i])
                if term_weights is not None:
                    s_out.append(score[i] * term_weights.get(qid, {}).get(t, 1.0))
                else:
                    s_out.append(score[i])
        return pa.table(
            {
                "qid": pa.array(qids, type=pa.string()),
                "doc_id": pa.array(np.asarray(d_out, dtype=np.int64), type=pa.int64()),
                "score": pa.array(np.asarray(s_out, dtype=np.float64), type=pa.float64()),
            }
        )

    from invertedindex_ray.functions.grouping import reduction_partitions
    from invertedindex_ray.pipelines.dedup import _grouped_partitions

    per_doc_schema = pa.schema(
        [("qid", pa.string()), ("doc_id", pa.int64()),
         ("score", pa.float64()), ("n_hit", pa.int64())]
    )
    # exact upper bound of the fanout rows entering the (qid, doc)
    # reduction: each query containing a term contributes df rows
    n_fanout = sum(
        df_map[t] * len(qids) for t, qids in term_to_queries.items()
    )

    def sum_per_qdoc(g):
        # (qid, doc)-keyed partial-sum merge — near-unique key, so one
        # vectorized reduceat per hash partition (dedup._grouped_partitions
        # rationale); scores are summed in (qid, doc, score) order so the
        # float result is deterministic across block arrivals
        import pandas as pd

        q = g["qid"].to_numpy()
        d = g["doc_id"].to_numpy()
        s = g["score"].to_numpy()
        qc, quniq = pd.factorize(q, sort=False)
        order = np.lexsort((s, d, qc))
        qc, d, s = qc[order], d[order], s[order]
        first = np.ones(len(d), dtype=bool)
        if len(d):
            first[1:] = (qc[1:] != qc[:-1]) | (d[1:] != d[:-1])
        starts = np.flatnonzero(first)
        sums = np.add.reduceat(s, starts) if len(s) else np.empty(0)
        n_hit = np.diff(np.append(starts, len(d)))
        return pd.DataFrame(
            {
                "qid": quniq[qc[starts]],
                "doc_id": d[starts].astype(np.int64),
                "score": sums,
                "n_hit": n_hit.astype(np.int64),
            }
        )

    per_doc = _grouped_partitions(
        scored.map_batches(fanout, batch_format="pyarrow"),
        lambda b: b["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64),
        sum_per_qdoc,
        per_doc_schema,
        n_partitions=reduction_partitions(n_fanout),
    )

    import pandas as pd

    def topk_group(g: pd.DataFrame) -> pd.DataFrame:
        qid = g["qid"].iloc[0]
        need = and_n_required.get(qid)
        if need is not None:
            g = g[g["n_hit"] == need]
        if exclude is not None and qid in exclude:
            g = g[g["doc_id"] != exclude[qid]]
        g = g.assign(score_r=round_half_up(g["score"].to_numpy(), 9))
        g = g.sort_values(["score_r", "doc_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["qid", "doc_id", "score_r", "rank"]]

    out = per_doc.groupby("qid").map_groups(topk_group, batch_format="pandas")
    res = out.to_pandas()
    if len(res):
        res = res[~res["qid"].isin(dead_qids)]
        res = res.sort_values(["qid", "rank"]).reset_index(drop=True)
    result = pa.Table.from_pandas(
        res.astype({"qid": str, "doc_id": np.int64, "score_r": np.float64, "rank": np.int64}),
        preserve_index=False,
    ) if len(res) else pa.table(
        {"qid": pa.array([], type=pa.string()),
         "doc_id": pa.array([], type=pa.int64()),
         "score_r": pa.array([], type=pa.float64()),
         "rank": pa.array([], type=pa.int64())}
    )
    return (result, post, df_map) if return_internals else result


def batch_topk_lm(
    sf_dir: str,
    queries: list[tuple[str, str]] | None,
    k: int = 20,
    mu: float = 2000.0,
    cfg: IndexConfig = NOSTEM,
) -> pa.Table:
    """(qid, doc_id, score_r, rank): Dirichlet-smoothed query-likelihood
    retrieval (Zhai & Lafferty, SIGIR 2001) — the second classic scoring
    model next to BM25, over the same postings spine as
    :func:`batch_topk`.

    Rank-equivalent decomposition computed over MATCHED postings only::

        score(q, d) = sum_{t in q, tf>0} ln(1 + tf * C / (mu * cf_t))
                      + n_q * ln(mu / (dl_d + mu))

    where C = total corpus tokens, cf_t = collection frequency and n_q =
    the query's in-vocabulary distinct term count (the per-query constant
    ``sum ln(mu * cf_t / C)`` is dropped — rank-invariant). QL is
    inherently disjunctive, so the query set's AND/OR tag is ignored;
    out-of-vocabulary terms drop (standard practice — their MLE
    collection probability is 0).

    Scale shape: identical to batch_topk — one tokenize pass, postings
    semi-joined on the broadcast query-term set, cf via a tiny
    per-query-term aggregate, per-(qid, doc) partial sums through one
    slim keyed reduction; doc_len rides the posting rows so no doc-table
    join is needed. Scores round to 9 dp; ties break by ascending
    doc_id."""
    import pandas as pd

    from invertedindex_ray.pipelines.dedup import _grouped_partitions

    parsed = parse_queries(queries, cfg)
    all_terms = sorted(set().union(*[t for _, _, t in parsed]) if parsed else set())
    empty = pa.table(
        {"qid": pa.array([], type=pa.string()),
         "doc_id": pa.array([], type=pa.int64()),
         "score_r": pa.array([], type=pa.float64()),
         "rank": pa.array([], type=pa.int64())}
    )
    if not all_terms:
        return empty

    tok = _tokenized(sf_dir, cfg).materialize()
    stats = collection_stats_from(tok)
    c_total = float(stats["total_tokens"][0].as_py())
    term_set = frozenset(all_terms)

    post = tok.map_batches(
        _matching_postings_fn(term_set), batch_format="pyarrow"
    ).materialize()
    from ray.data.aggregate import Sum

    cf_tbl = post.groupby("term").aggregate(Sum("tf", alias_name="cf"))
    cf_map = {r["term"]: int(r["cf"]) for r in cf_tbl.take_all()}
    if not cf_map:
        return empty

    # per-query in-vocab distinct term counts (the dl-term multiplier)
    nq_map: dict[str, int] = {}
    term_to_queries: dict[str, list[str]] = {}
    for qid, _qtype, terms in parsed:
        present = [t for t in terms if t in cf_map]
        if not present:
            continue
        nq_map[qid] = len(present)
        for t in present:
            term_to_queries.setdefault(t, []).append(qid)

    def score_rows(batch: pa.Table) -> pa.Table:
        terms = batch["term"].to_pylist()
        tf = batch["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dl = batch["doc_len"].to_numpy(zero_copy_only=False).astype(np.int64)
        cf = np.fromiter(
            (cf_map[t] for t in terms), dtype=np.float64, count=len(terms)
        )
        # ln(1 + x) NOT log1p: the SQL mirror computes ln(1 + tf*C/(mu*cf))
        part = np.log(1.0 + tf * c_total / (mu * cf))
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
        qids, d_out, s_out, dl_out = [], [], [], []
        for i, t in enumerate(terms):
            for qid in term_to_queries.get(t, ()):
                qids.append(qid)
                d_out.append(doc_id[i])
                s_out.append(part[i])
                dl_out.append(dl[i])
        return pa.table(
            {
                "qid": pa.array(qids, type=pa.string()),
                "doc_id": pa.array(
                    np.asarray(d_out, dtype=np.int64), type=pa.int64()
                ),
                "score": pa.array(
                    np.asarray(s_out, dtype=np.float64), type=pa.float64()
                ),
                "doc_len": pa.array(
                    np.asarray(dl_out, dtype=np.int64), type=pa.int64()
                ),
            }
        )

    per_doc_schema = pa.schema(
        [("qid", pa.string()), ("doc_id", pa.int64()),
         ("score", pa.float64()), ("doc_len", pa.int64())]
    )
    from invertedindex_ray.functions.grouping import reduction_partitions

    # cf >= df bounds the per-term posting rows each query fans out
    n_fanout = sum(
        cf_map[t] * len(qids) for t, qids in term_to_queries.items()
    )

    def sum_per_qdoc(g):
        # same deterministic (qid, doc, score)-ordered reduceat merge as
        # batch_topk; doc_len is constant per doc so first-of-group is it
        q = g["qid"].to_numpy()
        d = g["doc_id"].to_numpy()
        s = g["score"].to_numpy()
        dl = g["doc_len"].to_numpy()
        qc, quniq = pd.factorize(q, sort=False)
        order = np.lexsort((s, d, qc))
        qc, d, s, dl = qc[order], d[order], s[order], dl[order]
        first = np.ones(len(d), dtype=bool)
        if len(d):
            first[1:] = (qc[1:] != qc[:-1]) | (d[1:] != d[:-1])
        starts = np.flatnonzero(first)
        sums = np.add.reduceat(s, starts) if len(s) else np.empty(0)
        return pd.DataFrame(
            {
                "qid": quniq[qc[starts]],
                "doc_id": d[starts].astype(np.int64),
                "score": sums,
                "doc_len": dl[starts].astype(np.int64),
            }
        )

    per_doc = _grouped_partitions(
        post.map_batches(score_rows, batch_format="pyarrow"),
        lambda b: b["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64),
        sum_per_qdoc,
        per_doc_schema,
        n_partitions=reduction_partitions(n_fanout),
    )

    def topk_group(g: pd.DataFrame) -> pd.DataFrame:
        qid = g["qid"].iloc[0]
        n_q = float(nq_map.get(qid, 0))
        dl = g["doc_len"].to_numpy().astype(np.float64)
        full = g["score"].to_numpy() + n_q * np.log(mu / (dl + mu))
        g = g.assign(score_r=round_half_up(full, 9))
        g = g.sort_values(["score_r", "doc_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["qid", "doc_id", "score_r", "rank"]]

    out = per_doc.groupby("qid").map_groups(topk_group, batch_format="pandas")
    res = out.to_pandas()
    if not len(res):
        return empty
    res = res.sort_values(["qid", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(
        res.astype(
            {"qid": str, "doc_id": np.int64, "score_r": np.float64,
             "rank": np.int64}
        ),
        preserve_index=False,
    )
