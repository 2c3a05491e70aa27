"""Learning-to-rank feature extraction: per (query, candidate-doc)
feature rows for training a reranker — the bridge between the retrieval
stack and the training-data-export stack.

Candidates are the exact BM25 top-k (batch_query.batch_topk, the
SQL-checked retrieval gate); features are per-pair aggregates over the
matched postings (hit count, tf sums/max, rarest-term df) plus doc_len.
All features except bm25_r are integers, so the oracle comparison is
exact by construction.

Scale shape: the candidate set is bounded by the query-set contract
(n_queries x k rows), so it rides in the task closure; the feature pass
is the same broadcast-semi-join over postings the retrieval pipelines
use, and the per-pair aggregation reduces <= |candidates| x |query
terms| slim rows — bounded driver-side, like batch_topk's df_map.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from invertedindex_ray.config import IndexConfig
from invertedindex_ray.pipelines.analytics import NOSTEM
from invertedindex_ray.pipelines.batch_query import batch_topk, parse_queries

LTR_SCHEMA = pa.schema(
    [
        ("qid", pa.string()),
        ("doc_id", pa.int64()),
        ("bm25_r", pa.float64()),
        ("rank", pa.int64()),
        ("n_hit", pa.int64()),
        ("sum_tf", pa.int64()),
        ("max_tf", pa.int64()),
        ("min_df", pa.int64()),
        ("doc_len", pa.int64()),
    ]
)


def ltr_features(
    sf_dir: str,
    queries: list[tuple[str, str]],
    k: int = 20,
    cfg: IndexConfig = NOSTEM,
) -> pa.Table:
    """(qid, doc_id, bm25_r, rank, n_hit, sum_tf, max_tf, min_df,
    doc_len): one feature row per BM25 top-k candidate."""
    parsed = parse_queries(queries, cfg)
    cand, post, df_map = batch_topk(
        sf_dir, None, k=k, cfg=cfg, parsed=parsed, return_internals=True
    )
    if cand.num_rows == 0:
        return LTR_SCHEMA.empty_table()
    cand_pairs = frozenset(
        zip(
            cand["qid"].to_pylist(),
            cand["doc_id"].to_numpy(zero_copy_only=False).tolist(),
        )
    )

    # the matched-postings Dataset and df map come straight from
    # batch_topk's internals — no second corpus tokenize/semi-join pass,
    # and the query set parses exactly once (threaded in via parsed=)
    term_to_queries: dict[str, list[str]] = {}
    for qid, _qtype, terms in parsed:
        for t in terms:
            term_to_queries.setdefault(t, []).append(qid)

    def pair_rows(batch: pa.Table) -> pa.Table:
        terms = batch["term"].to_pylist()
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
        tf = batch["tf"].to_numpy(zero_copy_only=False)
        dl = batch["doc_len"].to_numpy(zero_copy_only=False)
        qids, d_out, tf_out, df_out, dl_out = [], [], [], [], []
        for i, t in enumerate(terms):
            for qid in term_to_queries.get(t, ()):
                if (qid, int(doc_id[i])) in cand_pairs:
                    qids.append(qid)
                    d_out.append(doc_id[i])
                    tf_out.append(tf[i])
                    df_out.append(df_map[t])
                    dl_out.append(dl[i])
        return pa.table(
            {
                "qid": pa.array(qids, type=pa.string()),
                "doc_id": pa.array(
                    np.asarray(d_out, dtype=np.int64), type=pa.int64()
                ),
                "tf": pa.array(np.asarray(tf_out, dtype=np.int64), type=pa.int64()),
                "df": pa.array(np.asarray(df_out, dtype=np.int64), type=pa.int64()),
                "doc_len": pa.array(
                    np.asarray(dl_out, dtype=np.int64), type=pa.int64()
                ),
            }
        )

    # <= |candidates| x |query terms| slim rows: bounded by the
    # query-set contract, so a driver-side pandas aggregate is exact
    # and tiny (same argument as batch_topk's df_map gather)
    rows = pa.Table.from_pylist(
        post.map_batches(pair_rows, batch_format="pyarrow").take_all()
    )
    if rows.num_rows == 0:
        return LTR_SCHEMA.empty_table()
    feat = (
        rows.to_pandas()
        .groupby(["qid", "doc_id"], as_index=False)
        .agg(
            n_hit=("tf", "size"),
            sum_tf=("tf", "sum"),
            max_tf=("tf", "max"),
            min_df=("df", "min"),
            doc_len=("doc_len", "first"),
        )
    )
    out = (
        cand.to_pandas()
        .merge(feat, on=["qid", "doc_id"], how="inner")
        .rename(columns={"score_r": "bm25_r"})
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(
        out.astype(
            {
                "qid": str,
                "doc_id": np.int64,
                "bm25_r": np.float64,
                "rank": np.int64,
                "n_hit": np.int64,
                "sum_tf": np.int64,
                "max_tf": np.int64,
                "min_df": np.int64,
                "doc_len": np.int64,
            }
        )[[f.name for f in LTR_SCHEMA]],
        preserve_index=False,
    ).cast(LTR_SCHEMA)
