"""Distributed k-means over the embeddings table, and SemDeDup-style
semantic deduplication built on top of it.

- :func:`kmeans_centroids` — classic Lloyd k-means, Ray-Data-first:
  each iteration is ONE streaming pass; every batch does a f64 matmul
  assignment against the broadcast centroids and emits a single partial
  row (k x d sum matrix + k counts, ~5 KB at k=10/d=64). The driver
  reduces the bounded per-block partials (counts are exact ints; float
  sums are reduced in sorted batch-key order for determinism) and
  updates centroids. Init is the first k vectors by vec_id —
  deterministic, no RNG (same convention as IVF in similarity.py).
- :func:`kmeans_clusters` — final assignment pass: (vec_id, cluster,
  dist_r). SQL-oracled since r5: the fixed 5 Lloyd iterations unroll
  as chained CTEs in the DuckDB mirror (__ray_entry__._kmeans_ctes);
  pytest additionally checks assignments against a pure-numpy Lloyd
  oracle.
- :func:`semantic_dedup` — SemDeDup (Abbas et al. 2023,
  arXiv:2303.09540): cluster first, then exact pairwise cosine WITHIN
  each cluster only — the cluster structure bounds the quadratic pair
  blowup that makes corpus-wide all-pairs impossible at 100 TB.
  Oversized clusters are capped LOUDLY (same no-silent-caps contract
  as the LSH buckets in dedup.py).

At 100 TB: k-means moves only k x d partials per block per iteration
(no shuffle at all); semantic_dedup's one shuffle moves each embedding
exactly once, partitioned by cluster id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from invertedindex_ray.functions.rounding import round_half_up
from invertedindex_ray.pipelines.dedup import _capped
from invertedindex_ray.pipelines.similarity import (
    _read_embeddings,
    _smallest_by_vec_id,
)


def _batch_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(vec_ids int64, n x d float64 matrix) from an Arrow batch —
    zero-copy flatten of the list<float> values, one reshape."""
    emb = batch["embedding"]
    emb = emb.combine_chunks() if isinstance(emb, pa.ChunkedArray) else emb
    widths = np.diff(emb.offsets.to_numpy())
    if len(widths) and (widths != widths[0]).any():
        raise ValueError("ragged embedding column: all vectors must share one dim")
    d = int(widths[0]) if len(widths) else 0
    mat = emb.values.to_numpy(zero_copy_only=False).astype(np.float64)
    mat = mat.reshape(len(widths), d)
    ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    return ids, mat


def _assign(mat: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Nearest centroid by squared euclidean; ties resolve to the
    lowest cluster index (np.argmin convention — mirrored by the
    pytest oracle)."""
    d2 = (
        (mat * mat).sum(axis=1)[:, None]
        - 2.0 * (mat @ centroids.T)
        + (centroids * centroids).sum(axis=1)[None, :]
    )
    return np.argmin(d2, axis=1)


def kmeans_centroids(
    sf_dir: str, *, k: int = 10, iters: int = 5
) -> np.ndarray:
    """Lloyd iterations; returns the k x d float64 centroid matrix.
    Empty clusters keep their previous centroid (deterministic, no
    re-seeding RNG)."""
    import ray

    _, centroids = _smallest_by_vec_id(sf_dir, k)
    for _ in range(iters):
        cref = ray.put(centroids)
        kk, dd = centroids.shape

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(cref)
            ids, mat = _batch_matrix(batch)
            a = _assign(mat, c)
            sums = np.zeros((kk, dd), dtype=np.float64)
            for j in np.unique(a):
                sums[j] = mat[a == j].sum(axis=0)
            counts = np.bincount(a, minlength=kk).astype(np.int64)
            return pa.table(
                {
                    "bkey": pa.array([int(ids.min()) if len(ids) else -1]),
                    "sums": pa.array([sums.tobytes()], type=pa.binary()),
                    "counts": pa.array([counts.tobytes()], type=pa.binary()),
                }
            )

        rows = (
            _read_embeddings(sf_dir)
            .map_batches(partial, batch_format="pyarrow")
            .take_all()
        )  # bounded: ONE slim row per block
        rows.sort(key=lambda r: r["bkey"])
        tot = np.zeros((kk, dd), dtype=np.float64)
        cnt = np.zeros(kk, dtype=np.int64)
        for r in rows:
            tot += np.frombuffer(r["sums"], dtype=np.float64).reshape(kk, dd)
            cnt += np.frombuffer(r["counts"], dtype=np.int64)
        nonempty = cnt > 0
        new = centroids.copy()
        new[nonempty] = tot[nonempty] / cnt[nonempty, None]
        centroids = new
    return centroids


def kmeans_clusters(sf_dir: str, *, k: int = 10, iters: int = 5):
    """(vec_id, cluster, dist_r): final assignment under the fitted
    centroids; dist_r = euclidean distance rounded to 6."""
    import ray

    centroids = kmeans_centroids(sf_dir, k=k, iters=iters)
    cref = ray.put(centroids)

    def assign_batch(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        ids, mat = _batch_matrix(batch)
        a = _assign(mat, c)
        dist = np.linalg.norm(mat - c[a], axis=1)
        return pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "cluster": pa.array(a.astype(np.int64), type=pa.int64()),
                "dist_r": pa.array(round_half_up(dist, 6), type=pa.float64()),
            }
        )

    return _read_embeddings(sf_dir).map_batches(assign_batch, batch_format="pyarrow")


def semantic_dedup(
    sf_dir: str,
    *,
    k: int = 10,
    iters: int = 5,
    tau: float = 0.4,
    cluster_cap: int = 100_000,
):
    """SemDeDup: (vec_a, vec_b, cluster, cos_r) for every same-cluster
    pair with cosine >= tau (vec_a < vec_b). One shuffle, partitioned
    by cluster id; in-cluster cosine is a single normalized matmul.
    Clusters larger than ``cluster_cap`` are skipped LOUDLY (at real
    scale raise k instead — SemDeDup's own remedy)."""
    import ray

    centroids = kmeans_centroids(sf_dir, k=k, iters=iters)
    cref = ray.put(centroids)

    def tag(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        ids, mat = _batch_matrix(batch)
        a = _assign(mat, c)
        return pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "cluster": pa.array(a.astype(np.int64), type=pa.int64()),
                "embedding": batch["embedding"].combine_chunks()
                if isinstance(batch["embedding"], pa.ChunkedArray)
                else batch["embedding"],
            }
        )

    def cluster_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "vec_a": pd.Series([], dtype=np.int64),
                "vec_b": pd.Series([], dtype=np.int64),
                "cluster": pd.Series([], dtype=np.int64),
                "cos_r": pd.Series([], dtype=np.float64),
            }
        )
        n = len(g)
        if n < 2 or _capped("semantic_dedup", n, cluster_cap):
            return empty
        ids = g["vec_id"].to_numpy().astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        mat = np.stack(
            [np.asarray(v, dtype=np.float64) for v in g["embedding"].to_numpy()]
        )[order]
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        mat = mat / norms[:, None]
        cos = mat @ mat.T
        ia, ib = np.triu_indices(n, 1)
        cr = round_half_up(cos[ia, ib], 6)
        keep = cr >= tau
        return pd.DataFrame(
            {
                "vec_a": ids[ia[keep]],
                "vec_b": ids[ib[keep]],
                "cluster": np.full(int(keep.sum()), int(g["cluster"].iloc[0]), dtype=np.int64),
                "cos_r": cr[keep],
            }
        )

    return (
        _read_embeddings(sf_dir)
        .map_batches(tag, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(cluster_pairs, batch_format="pandas")
    )
