"""Similarity search over the embeddings table (vec_id, embedding:
list<float>, label).

- :func:`ann_topk` — brute-force cosine top-k: the query matrix is
  broadcast once (ray.put) and every batch does one f64 matmul; per-batch
  partial top-k keeps the shuffle tiny (k rows per query per batch).
  This is the exact baseline and the SQL-checked entry.
- :func:`ivf_ann_topk` — IVF-style scale path: deterministic seeded
  centroids, per-batch cluster assignment, probe the nprobe nearest
  centroids only. Approximate but deterministic (rows-only check).

At 100 TB of vectors the same shape holds: broadcast queries, partial
top-k per block, single small merge; IVF bounds the scanned fraction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from invertedindex_ray.functions.rounding import round_half_up


def _read_embeddings(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])


def _query_matrix(sf_dir: str, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic query set: the first n_queries vectors by vec_id."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids)[:n_queries]
    mat = np.stack(
        [np.asarray(t["embedding"][int(i)].as_py(), dtype=np.float64) for i in order]
    )
    return ids[order].astype(np.int64), mat


def ann_topk(sf_dir: str, *, n_queries: int = 5, k: int = 10):
    """(qid, vec_id, cos_r, rank): exact cosine top-k per query vector.
    cos_r rounded to 6 dp; ties broken by vec_id ascending."""
    import ray

    qids, qmat = _query_matrix(sf_dir, n_queries)
    qnorm = np.linalg.norm(qmat, axis=1)
    qnorm[qnorm == 0] = 1.0  # zero query vector: cosines 0, not NaN
    ref = ray.put((qids, qmat, qnorm))

    def partial_topk(batch: pa.Table) -> pa.Table:
        q_ids, q_mat, q_norm = ray.get(ref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        emb = np.stack(
            [np.asarray(x, dtype=np.float64) for x in batch["embedding"].to_pylist()]
        )
        norms = np.linalg.norm(emb, axis=1)
        norms[norms == 0] = 1.0
        cos = (q_mat @ emb.T) / (q_norm[:, None] * norms[None, :])
        out_q, out_v, out_c = [], [], []
        kk = min(k, cos.shape[1])
        for qi in range(len(q_ids)):
            row = cos[qi]
            idx = np.argpartition(-row, kk - 1)[:kk]
            out_q.extend([int(q_ids[qi])] * len(idx))
            out_v.extend(ids[idx].tolist())
            out_c.extend(row[idx].tolist())
        return pa.table(
            {
                "qid": pa.array(np.asarray(out_q, dtype=np.int64), type=pa.int64()),
                "vec_id": pa.array(np.asarray(out_v, dtype=np.int64), type=pa.int64()),
                "cos": pa.array(np.asarray(out_c, dtype=np.float64), type=pa.float64()),
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

    out = partial.groupby("qid").map_groups(final_topk, batch_format="pandas").to_pandas()
    out = out.sort_values(["qid", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(
        out.astype(
            {"qid": np.int64, "vec_id": np.int64, "cos_r": np.float64, "rank": np.int64}
        ),
        preserve_index=False,
    )


def embedding_neardup_pairs(sf_dir: str, *, tau: float = 0.4):
    """(vec_a, vec_b, cos_r): all pairs with cosine >= tau (vec_a < vec_b).
    Small-side broadcast: the full (normalized) matrix is put once and each
    batch compares against it — O(N*B) flops, no shuffle. At web scale this
    becomes LSH-bucketed (random hyperplanes) first; documented trade-off."""
    import pyarrow.parquet as pq

    import ray

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    all_ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    mat = np.stack([np.asarray(x, dtype=np.float64) for x in t["embedding"].to_pylist()])
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    ref = ray.put((all_ids, mat, norms))

    def pairs(batch: pa.Table) -> pa.Table:
        ids_all, m_all, n_all = ray.get(ref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        emb = np.stack(
            [np.asarray(x, dtype=np.float64) for x in batch["embedding"].to_pylist()]
        )
        nb = np.linalg.norm(emb, axis=1)
        nb[nb == 0] = 1.0
        cos = (emb @ m_all.T) / (nb[:, None] * n_all[None, :])
        keep = cos >= tau
        # vec_a < vec_b halves the pairs and drops self-matches
        lt = ids[:, None] < ids_all[None, :]
        keep &= lt
        bi, ai = np.nonzero(keep)
        return pa.table(
            {
                "vec_a": pa.array(ids[bi], type=pa.int64()),
                "vec_b": pa.array(ids_all[ai], type=pa.int64()),
                "cos_r": pa.array(round_half_up(cos[bi, ai], 6), type=pa.float64()),
            }
        )

    return _read_embeddings(sf_dir).map_batches(pairs, batch_format="pyarrow", batch_size=1024)


def ivf_ann_topk(sf_dir: str, *, n_queries: int = 5, k: int = 10, n_centroids: int = 16, nprobe: int = 4):
    """IVF-bucketed approximate top-k (deterministic): centroids = seeded
    sample of the corpus; each batch only scores vectors whose centroid is
    among the query's nprobe nearest. Rows-only check (approximate)."""
    import pyarrow.parquet as pq

    import ray

    qids, qmat = _query_matrix(sf_dir, n_queries)
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    full = np.stack([np.asarray(x, dtype=np.float64) for x in t["embedding"].to_pylist()])
    rng = np.random.default_rng(7)
    cent_idx = rng.choice(len(full), size=min(n_centroids, len(full)), replace=False)
    centroids = full[np.sort(cent_idx)]
    cnorm = np.linalg.norm(centroids, axis=1)
    cnorm[cnorm == 0] = 1.0

    qnorm = np.linalg.norm(qmat, axis=1)
    qnorm[qnorm == 0] = 1.0  # zero query vector: cosines 0, not NaN
    qc = (qmat @ centroids.T) / (qnorm[:, None] * cnorm[None, :])
    probe = np.argsort(-qc, axis=1)[:, :nprobe]  # (nq, nprobe)
    ref = ray.put((qids, qmat, qnorm, centroids, cnorm, probe))

    def partial(batch: pa.Table) -> pa.Table:
        q_ids, q_mat, q_norm, cents, c_norm, prb = ray.get(ref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        emb = np.stack(
            [np.asarray(x, dtype=np.float64) for x in batch["embedding"].to_pylist()]
        )
        norms = np.linalg.norm(emb, axis=1)
        norms[norms == 0] = 1.0
        assign = np.argmax((emb @ cents.T) / (norms[:, None] * c_norm[None, :]), axis=1)
        out_q, out_v, out_c = [], [], []
        for qi in range(len(q_ids)):
            mask = np.isin(assign, prb[qi])
            if not mask.any():
                continue
            sub = emb[mask]
            cos = (sub @ q_mat[qi]) / (norms[mask] * q_norm[qi])
            kk = min(k, len(cos))
            idx = np.argpartition(-cos, kk - 1)[:kk]
            out_q.extend([int(q_ids[qi])] * len(idx))
            out_v.extend(ids[mask][idx].tolist())
            out_c.extend(cos[idx].tolist())
        return pa.table(
            {
                "qid": pa.array(np.asarray(out_q, dtype=np.int64), type=pa.int64()),
                "vec_id": pa.array(np.asarray(out_v, dtype=np.int64), type=pa.int64()),
                "cos": pa.array(np.asarray(out_c, dtype=np.float64), type=pa.float64()),
            }
        )

    part = _read_embeddings(sf_dir).map_batches(partial, batch_format="pyarrow", batch_size=1024)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(cos_r=round_half_up(g["cos"].to_numpy(), 6))
        g = g.sort_values(["cos_r", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["qid", "vec_id", "cos_r", "rank"]]

    out = part.groupby("qid").map_groups(final, batch_format="pandas").to_pandas()
    out = out.sort_values(["qid", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(
        out.astype(
            {"qid": np.int64, "vec_id": np.int64, "cos_r": np.float64, "rank": np.int64}
        ),
        preserve_index=False,
    )
