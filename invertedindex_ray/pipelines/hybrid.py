"""Hybrid retrieval: reciprocal-rank fusion (RRF; Cormack, Clarke &
Buettcher, SIGIR 2009) of a SPARSE ranking (BM25 more-like-this over the
inverted index) and a DENSE ranking (cosine nearest neighbors over the
embeddings table) for the same seed set — the standard two-tower
"lexical + vector" retrieval stack, built entirely from this repo's
SQL-checked components.

Seeds are the docs with ``doc_id % seed_mod == 0`` (the more-like-this
seed contract); the documents and embeddings tables share one id space.
Both systems rank WITHOUT the seed itself; fusion scores a doc
``sum over systems of 1/(k0 + rank)`` with absent-list terms omitted,
then re-ranks (rrf desc, doc_id asc).

Scale shape: the sparse side is :func:`mlt.more_like_this` (distributed
batch retrieval, driver state bounded by the seed contract); the dense
side broadcasts the small seed-vector matrix once (``ray.put``) and
every embeddings batch does one f64 matmul + partial top-k, exactly like
:func:`similarity.ann_topk`. Fusion itself joins two (n_seeds x k)
results — bounded query OUTPUTS, fused with one pyarrow pass on the
driver (at 100 TB these are the k-row-per-query answer sets, never
corpus-sized).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from invertedindex_ray.functions.rounding import round_half_up
from invertedindex_ray.pipelines.similarity import (
    SMALLEST_MAX_N,
    _partial_topk_rows,
    _read_embeddings,
)

HYBRID_SCHEMA = pa.schema(
    [
        ("seed_id", pa.int64()),
        ("doc_id", pa.int64()),
        ("rrf_r", pa.float64()),
        ("rank", pa.int64()),
    ]
)


def _seed_matrix(sf_dir: str, seed_mod: int) -> tuple[np.ndarray, np.ndarray]:
    """(seed_ids, seed_vectors) for vec_id % seed_mod == 0 — a bounded
    driver gather (the seed set IS the query workload), guarded like
    similarity._smallest_by_vec_id."""

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array((ids % seed_mod) == 0))

    rows = (
        _read_embeddings(sf_dir).map_batches(pick, batch_format="pyarrow").take_all()
    )
    if len(rows) > SMALLEST_MAX_N:
        raise ValueError(
            f"hybrid_rrf: {len(rows)} seeds exceed the driver-gather bound "
            f"of {SMALLEST_MAX_N}; raise seed_mod (the seed set is a "
            "query workload, not a corpus-sized input)"
        )
    rows.sort(key=lambda r: int(r["vec_id"]))
    ids = np.array([int(r["vec_id"]) for r in rows], dtype=np.int64)
    mat = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    return ids, mat


def dense_neighbors(sf_dir: str, *, seed_mod: int = 101, k: int = 10) -> pa.Table:
    """(seed_id, doc_id, cos_r, rank): exact cosine top-k per seed
    vector, seed itself excluded BEFORE ranks are assigned (ties:
    rounded cos desc, vec_id asc — the ann_topk rank rule)."""
    import pandas as pd
    import ray

    qids, qmat = _seed_matrix(sf_dir, seed_mod)
    qnorm = np.linalg.norm(qmat, axis=1)
    qnorm[qnorm == 0] = 1.0
    ref = ray.put((qids, qmat, qnorm))

    empty = pa.schema(
        [("qid", pa.int64()), ("vec_id", pa.int64()), ("cos", pa.float64())]
    ).empty_table()

    def partial_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        q_ids, q_mat, q_norm = ray.get(ref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        emb = np.stack(
            [np.asarray(x, dtype=np.float64) for x in batch["embedding"].to_pylist()]
        )
        norms = np.linalg.norm(emb, axis=1)
        norms[norms == 0] = 1.0
        cos = (q_mat @ emb.T) / (q_norm[:, None] * norms[None, :])
        # self-exclusion: the seed's own row can never rank
        for qi, qid in enumerate(q_ids):
            cos[qi, ids == qid] = -np.inf
        out_q, out_v, out_c = _partial_topk_rows(q_ids, cos, ids, k)
        keep = np.isfinite(np.asarray(out_c, dtype=np.float64))
        return pa.table(
            {
                "qid": pa.array(np.asarray(out_q, dtype=np.int64)[keep], type=pa.int64()),
                "vec_id": pa.array(np.asarray(out_v, dtype=np.int64)[keep], type=pa.int64()),
                "cos": pa.array(np.asarray(out_c, dtype=np.float64)[keep], type=pa.float64()),
            }
        )

    partial = _read_embeddings(sf_dir).map_batches(
        partial_topk, batch_format="pyarrow", batch_size=1024
    )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(cos_r=round_half_up(g["cos"].to_numpy(), 6))
        g = g.sort_values(["cos_r", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["qid", "vec_id", "cos_r", "rank"]]

    out = (
        partial.groupby("qid").map_groups(final_topk, batch_format="pandas").to_pandas()
    )
    out = out.sort_values(["qid", "rank"]).reset_index(drop=True)
    return pa.table(
        {
            "seed_id": pa.array(out["qid"].to_numpy(np.int64), type=pa.int64()),
            "doc_id": pa.array(out["vec_id"].to_numpy(np.int64), type=pa.int64()),
            "cos_r": pa.array(out["cos_r"].to_numpy(np.float64), type=pa.float64()),
            "rank": pa.array(out["rank"].to_numpy(np.int64), type=pa.int64()),
        }
    )


def hybrid_rrf(
    sf_dir: str,
    *,
    seed_mod: int = 101,
    m: int = 5,
    k_sparse: int = 10,
    k_dense: int = 10,
    k: int = 10,
    rrf_k0: int = 60,
) -> pa.Table:
    """(seed_id, doc_id, rrf_r, rank): RRF fusion of the BM25
    more-like-this ranking and the dense cosine ranking for each seed.
    ``rrf_r = round(1/(k0+rank_sparse) + 1/(k0+rank_dense), 9)`` with the
    sparse term added FIRST (fixed float order, mirrored in SQL); a doc
    absent from one list contributes only the other term."""
    from invertedindex_ray.pipelines.mlt import more_like_this

    sparse = more_like_this(sf_dir, seed_mod=seed_mod, m=m, k=k_sparse)
    dense = dense_neighbors(sf_dir, seed_mod=seed_mod, k=k_dense)

    # fuse the two bounded (n_seeds x k) answer sets
    scores: dict[tuple[int, int], list[float]] = {}
    for t, slot in ((sparse, 0), (dense, 1)):
        sid = t["seed_id"].to_numpy(zero_copy_only=False)
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        rnk = t["rank"].to_numpy(zero_copy_only=False)
        for s, d, r in zip(sid, did, rnk):
            scores.setdefault((int(s), int(d)), [0.0, 0.0])[slot] = 1.0 / (
                rrf_k0 + int(r)
            )
    rows = [
        (s, d, float(round_half_up(np.array([sp + dn]), 9)[0]))
        for (s, d), (sp, dn) in scores.items()
    ]
    # (rrf desc, doc_id asc) per seed; seeds ascending
    rows.sort(key=lambda r: (r[0], -r[2], r[1]))
    out_s, out_d, out_r, out_rank = [], [], [], []
    last_seed, rank = None, 0
    for s, d, v in rows:
        rank = 1 if s != last_seed else rank + 1
        last_seed = s
        if rank > k:
            continue
        out_s.append(s)
        out_d.append(d)
        out_r.append(v)
        out_rank.append(rank)
    return pa.table(
        {
            "seed_id": pa.array(out_s, type=pa.int64()),
            "doc_id": pa.array(out_d, type=pa.int64()),
            "rrf_r": pa.array(out_r, type=pa.float64()),
            "rank": pa.array(out_rank, type=pa.int64()),
        }
    )
