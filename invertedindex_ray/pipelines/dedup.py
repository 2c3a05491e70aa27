"""Deduplication pipelines for large-scale training-data curation.

All are expressed Ray-Data-first:

- exact:       content-hash inside map_batches -> groupby(hash) ->
               keep-first (hash-partitioned; no text leaves the mappers
               beyond one md5 per doc)
- MinHash+LSH: shingle -> minhash signature per batch -> explode to
               (band, band_hash) rows -> groupby band bucket -> candidate
               pairs -> signature-estimated Jaccard filter
- n-gram Jaccard (exact): distinct shingle rows -> groupby(shingle) ->
  co-occurrence pairs -> groupby(pair) count -> exact Jaccard vs broadcast
  set sizes (SQL-checkable)
- SimHash:     64-bit tf-weighted fingerprint per doc; banded buckets ->
               candidate pairs with Hamming distance <= max_hamming

Determinism: all hashing uses pandas' fixed-key siphash
(functions/hashing.py) — stable across processes and cluster sizes.
Scale notes are in each function's docstring.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from invertedindex_ray.functions.hashing import hash_strings
from invertedindex_ray.functions.rounding import round_half_up

_SPLIT = r"[^a-z0-9]+"


def _read_docs(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


# ------------------------------------------------------------- exact dedup

def exact_dedup(sf_dir: str):
    """(doc_id, n_dups): one row per distinct text, doc_id = smallest id in
    the duplicate group. At 100 TB only the 16-byte digest shuffles."""
    from ray.data.aggregate import Count, Min

    def with_hash(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        h = [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]
        return pa.table(
            {
                "content_md5": pa.array(h, type=pa.string()),
                "doc_id": batch["doc_id"].combine_chunks()
                if isinstance(batch["doc_id"], pa.ChunkedArray)
                else batch["doc_id"],
            }
        )

    ds = _read_docs(sf_dir).map_batches(with_hash, batch_format="pyarrow")
    agg = ds.groupby("content_md5").aggregate(
        Min("doc_id", alias_name="doc_id"), Count(alias_name="n_dups")
    )
    return agg.select_columns(["doc_id", "n_dups"]).map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "n_dups": t["n_dups"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


# ------------------------------------------------------------- shingling

def _shingle_hashes(texts: list[str], k: int) -> list[np.ndarray]:
    """Per doc: uint64 hashes of the distinct word k-gram shingles."""
    out = []
    import re

    splitter = re.compile(_SPLIT)
    for t in texts:
        words = [w for w in splitter.split((t or "").lower()) if w]
        if len(words) < k:
            out.append(np.empty(0, dtype=np.uint64))
            continue
        sh = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
        out.append(np.unique(hash_strings(np.asarray(sh, dtype=object))))
    return out


# ------------------------------------------------------------- minhash lsh

def _mulmod_minhash(A: np.ndarray, B: np.ndarray, x: np.ndarray, P) -> np.ndarray:
    """min over shingles x of (A*x + B) mod P per permutation, with exact
    122-bit multiply via operand splitting (all uint64; P = 2^61-1).

    a*x = a_hi*x_hi*2^64 + (a_hi*x_lo + a_lo*x_hi)*2^32 + a_lo*x_lo with
    32-bit splits; 2^64 ≡ 8 and m*2^32 ≡ (m>>29) + (m&(2^29-1))<<32
    (mod P, since 2^61 ≡ 1)."""
    u32 = np.uint64(0xFFFFFFFF)

    def red(v: np.ndarray) -> np.ndarray:  # v < 2^64 -> v mod P
        v = (v & P) + (v >> np.uint64(61))
        return np.where(v >= P, v - P, v)

    a_hi, a_lo = A >> np.uint64(32), A & u32
    x_hi, x_lo = x >> np.uint64(32), x & u32
    t_lo = red(a_lo[:, None] * x_lo[None, :])                       # < 2^64
    t_hh = red((a_hi[:, None] * x_hi[None, :]) * np.uint64(8))      # < 2^61
    m = a_hi[:, None] * x_lo[None, :] + a_lo[:, None] * x_hi[None, :]  # < 2^62
    t_mid = red((m >> np.uint64(29)) + ((m & np.uint64((1 << 29) - 1)) << np.uint64(32)))
    vals = red(red(t_lo + t_hh + t_mid) + B[:, None])
    return vals.min(axis=1)


def minhash_lsh_pairs(
    sf_dir: str,
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.5,
):
    """(doc_a, doc_b, est_jaccard_r) candidate near-dup pairs.

    Signatures via universal hashing (a*h+b mod p over the shingle hash),
    vectorized per batch; LSH bands explode to (band, band_hash, doc_id)
    rows and the groupby brings collisions together. Estimated Jaccard =
    fraction of agreeing signature slots; no raw text ever shuffles.
    At 10^12 docs the band groupby is the only wide op and each bucket is
    tiny (collisions only); skewed buckets (boilerplate shingles) are
    capped inside the group fn.
    """
    import ray.data as rd

    rows = bands
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands
    rng = np.random.default_rng(0xC0FFEE)
    P = np.uint64((1 << 61) - 1)
    A = rng.integers(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    B = rng.integers(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)

    def signatures(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        shingles = _shingle_hashes(texts, shingle_k)
        doc_ids, band_ids, band_hashes, sigs = [], [], [], []
        for d, sh in zip(ids, shingles):
            if len(sh) == 0:
                continue
            # minhash: min over shingles of (a*x+b) mod p, per permutation.
            # a*x needs 122 bits, so split both operands and reduce mod
            # P = 2^61-1 (Mersenne: 2^61 ≡ 1 mod P) entirely in uint64 —
            # a plain uint64 multiply would wrap mod 2^64 and lose the
            # universal-hash property.
            x = sh.astype(np.uint64) % P
            sig = _mulmod_minhash(A, B, x, P)
            sigs.append(sig)
            for b in range(bands):
                seg = sig[b * rows_per_band : (b + 1) * rows_per_band]
                h = hashlib.md5(seg.tobytes()).digest()[:8]
                band_ids.append(b)
                band_hashes.append(int.from_bytes(h, "big") >> 1)
                doc_ids.append(int(d))
        n = len(doc_ids)
        return pa.table(
            {
                "band": pa.array(np.asarray(band_ids, dtype=np.int32), type=pa.int32()),
                "band_hash": pa.array(
                    np.asarray(band_hashes, dtype=np.int64), type=pa.int64()
                ),
                "doc_id": pa.array(np.asarray(doc_ids, dtype=np.int64), type=pa.int64()),
                "sig": pa.array(
                    [s.astype(np.int64) for s in np.repeat(sigs, bands, axis=0)]
                    if n
                    else [],
                    type=pa.list_(pa.int64()),
                ),
            }
        )

    band_rows = _read_docs(sf_dir).map_batches(signatures, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        if len(g) < 2 or len(g) > 200:  # cap pathological buckets
            return pd.DataFrame({"doc_a": [], "doc_b": [], "est_jaccard_r": []})
        ids = g["doc_id"].to_numpy()
        sigs = np.stack(g["sig"].to_numpy())
        out_a, out_b, out_j = [], [], []
        for i in range(len(ids)):
            agree = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
            for off, jac in enumerate(agree):
                if jac >= threshold:
                    out_a.append(ids[i])
                    out_b.append(ids[i + 1 + off])
                    out_j.append(round(float(jac), 6))
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b, "est_jaccard_r": out_j})

    pairs = band_rows.groupby(["band", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )
    # same pair can surface from several bands -> distinct
    pdf = pairs.to_pandas()
    if len(pdf) == 0:
        return pa.table(
            {"doc_a": pa.array([], type=pa.int64()),
             "doc_b": pa.array([], type=pa.int64()),
             "est_jaccard_r": pa.array([], type=pa.float64())}
        )
    pdf = (
        pdf.drop_duplicates(["doc_a", "doc_b"])
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(pdf.astype(
        {"doc_a": np.int64, "doc_b": np.int64, "est_jaccard_r": np.float64}
    ), preserve_index=False)


# ------------------------------------------------------- exact ngram jaccard

def ngram_jaccard_pairs(sf_dir: str, *, k: int = 3, tau: float = 0.5):
    """(doc_a, doc_b, jaccard_r): exact word-k-gram Jaccard >= tau.

    Distinct (shingle_hash, doc_id) rows -> groupby(shingle) emits
    co-occurring pairs -> groupby(pair) counts intersections -> exact
    Jaccard against broadcast set sizes. SQL-checkable (self-join mirror).
    Head shingles (boilerplate) are capped per bucket, documented loss.
    """
    from ray.data.aggregate import Count

    import ray

    def shingle_rows(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        sh = _shingle_hashes(texts, k)
        lens = np.fromiter((len(s) for s in sh), dtype=np.int64, count=len(sh))
        return pa.table(
            {
                "shingle": pa.array(
                    np.concatenate(sh).astype(np.int64) if len(sh) else [],
                    type=pa.int64(),
                ),
                "doc_id": pa.array(np.repeat(ids, lens), type=pa.int64()),
            }
        )

    rows = _read_docs(sf_dir).map_batches(shingle_rows, batch_format="pyarrow")
    sizes_ds = rows.groupby("doc_id").aggregate(Count(alias_name="n_shingles"))
    sizes = {
        int(r["doc_id"]): int(r["n_shingles"]) for r in sizes_ds.take_all()
    }
    sizes_ref = ray.put(sizes)

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g["doc_id"].to_numpy())
        if len(ids) < 2 or len(ids) > 500:
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        a, b = np.triu_indices(len(ids), 1)
        return pd.DataFrame({"doc_a": ids[a], "doc_b": ids[b]})

    co = (
        rows.groupby("shingle")
        .map_groups(pairs_in_bucket, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="inter"))
    )

    def jaccard(batch: pa.Table) -> pa.Table:
        sz = ray.get(sizes_ref)
        a = batch["doc_a"].to_numpy(zero_copy_only=False)
        b = batch["doc_b"].to_numpy(zero_copy_only=False)
        inter = batch["inter"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = np.fromiter((sz[int(x)] for x in a), dtype=np.float64, count=len(a))
        nb = np.fromiter((sz[int(x)] for x in b), dtype=np.float64, count=len(b))
        j = inter / (na + nb - inter)
        keep = j >= tau
        return pa.table(
            {
                "doc_a": pa.array(a[keep].astype(np.int64), type=pa.int64()),
                "doc_b": pa.array(b[keep].astype(np.int64), type=pa.int64()),
                "jaccard_r": pa.array(round_half_up(j[keep], 6), type=pa.float64()),
            }
        )

    return co.map_batches(jaccard, batch_format="pyarrow")


# ------------------------------------------------------------- simhash

def simhash_dedup(sf_dir: str, *, max_hamming: int = 3):
    """(doc_a, doc_b, hamming): near-dup candidates whose 64-bit
    tf-weighted SimHash fingerprints differ in <= max_hamming bits.
    Banding on 4x16-bit chunks finds all pairs with hamming <= 3."""
    import re

    import ray.data as rd

    splitter = re.compile(_SPLIT)

    def fingerprints(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        fps = np.zeros(len(texts), dtype=np.uint64)
        for i, t in enumerate(texts):
            words = [w for w in splitter.split((t or "").lower()) if w]
            if not words:
                continue
            uniq, counts = np.unique(np.asarray(words, dtype=object), return_counts=True)
            h = hash_strings(uniq)
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
                np.int64
            )
            v = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
            fp = np.uint64(0)
            for b in range(64):
                if v[b] > 0:
                    fp |= np.uint64(1) << np.uint64(b)
            fps[i] = fp
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "simhash": pa.array(fps.astype(np.int64), type=pa.int64()),
            }
        )

    fp = _read_docs(sf_dir).map_batches(fingerprints, batch_format="pyarrow")

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        h = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        outs = {"band": [], "key": [], "doc_id": [], "simhash": []}
        for b in range(4):
            seg = (h >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            outs["band"].extend([b] * len(ids))
            outs["key"].extend(seg.astype(np.int64).tolist())
            outs["doc_id"].extend(ids.tolist())
            outs["simhash"].extend(h.astype(np.int64).tolist())
        return pa.table(
            {
                "band": pa.array(outs["band"], type=pa.int32()),
                "key": pa.array(outs["key"], type=pa.int64()),
                "doc_id": pa.array(outs["doc_id"], type=pa.int64()),
                "simhash": pa.array(outs["simhash"], type=pa.int64()),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        if len(g) < 2 or len(g) > 200:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []})
        ids = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy().astype(np.uint64)
        out_a, out_b, out_h = [], [], []
        for i in range(len(ids)):
            x = hs[i] ^ hs[i + 1 :]
            ham = np.vectorize(lambda v: bin(int(v)).count("1"))(x) if len(x) else x
            for off, hm in enumerate(ham):
                if hm <= max_hamming:
                    out_a.append(ids[i])
                    out_b.append(ids[i + 1 + off])
                    out_h.append(int(hm))
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b, "hamming": out_h})

    pairs = (
        fp.map_batches(band_rows, batch_format="pyarrow")
        .groupby(["band", "key"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    pdf = pairs.to_pandas()
    if len(pdf) == 0:
        return pa.table(
            {"doc_a": pa.array([], type=pa.int64()),
             "doc_b": pa.array([], type=pa.int64()),
             "hamming": pa.array([], type=pa.int64())}
        )
    pdf = (
        pdf.drop_duplicates(["doc_a", "doc_b"]).sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    return pa.Table.from_pandas(
        pdf.astype({"doc_a": np.int64, "doc_b": np.int64, "hamming": np.int64}),
        preserve_index=False,
    )
