"""Sketch / heavy-hitter aggregates over the documents table — the
approximate-aggregate family a training-data pipeline uses to profile a
corpus without a full shuffle.

- :func:`top_terms` — EXACT distributed heavy hitters: per-batch term
  counts (partial combine) -> one groupby(term) -> global top-N by
  (count desc, term asc). The shuffle moves one row per distinct term
  per batch; SQL-checkable.
- :func:`cms_term_counts` — count-min sketch (Cormode & Muthukrishnan
  2005): each batch builds a d×w sketch of its token stream; sketches
  are MERGEABLE by elementwise sum, so the reduce is a tiny fixed-size
  aggregation no matter the corpus size (the canonical "novel sketch as
  a combiner" custom operator). Point queries overestimate by at most
  εN with probability 1-δ (ε=e/w, δ=e^-d); the pytest asserts both the
  ≥-true guarantee and the bound.

Hashing is deterministic (md5-based row seeds), so sketch contents are
reproducible across runs and cluster sizes.
"""

from __future__ import annotations

from invertedindex_ray.sources.io import read_parquet_clean as _rpq

import numpy as np
import pyarrow as pa

from invertedindex_ray.functions.hashing import hash_strings

_SPLIT = r"[^a-z0-9]+"


def _read_docs(sf_dir: str):
    import ray.data as rd

    return _rpq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


def _batch_term_counts(batch: pa.Table) -> pa.Table:
    """(term, n_p): per-batch token counts (the partial combine)."""
    import re

    import pyarrow.compute as pc

    text = batch["text"]
    text = text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
    toks = pc.split_pattern_regex(
        pc.utf8_lower(pc.coalesce(text, "")), _SPLIT
    )
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    flat = toks.values.filter(pc.not_equal(toks.values, ""))
    d = pc.dictionary_encode(flat)
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    n = np.bincount(codes, minlength=len(d.dictionary)).astype(np.int64)
    return pa.table(
        {
            "term": d.dictionary,
            "n_p": pa.array(n, type=pa.int64()),
        }
    )


def top_terms(sf_dir: str, n: int = 50):
    """(term, n_occurrences, rank): the n most frequent word tokens,
    exactly — rank by (count desc, term asc). Partial-combine keeps the
    shuffle at one row per distinct term per batch; the final top-N is a
    driver-side selection over the (vocabulary-sized) aggregate via a
    bounded per-block partial top-N."""
    import pandas as pd

    from invertedindex_ray.functions.grouping import (
        table_partitions as _table_partitions,
    )
    from invertedindex_ray.functions.hashing import hash_strings
    from invertedindex_ray.pipelines.dedup import _grouped_partitions

    agg_schema = pa.schema([("term", pa.string()), ("n_occurrences", pa.int64())])

    def sum_per_term(g: pd.DataFrame) -> pd.DataFrame:
        # vocabulary-keyed merge: vectorized factorize/bincount per hash
        # partition (dedup._grouped_partitions rationale)
        codes, terms = pd.factorize(g["term"].to_numpy(), sort=False)
        cnt = np.bincount(codes, weights=g["n_p"].to_numpy()).astype(np.int64)
        return pd.DataFrame({"term": terms, "n_occurrences": cnt})

    agg = _grouped_partitions(
        _read_docs(sf_dir).map_batches(_batch_term_counts, batch_format="pyarrow"),
        lambda b: hash_strings(b["term"].to_pylist()),
        sum_per_term,
        agg_schema,
        n_partitions=_table_partitions(f"{sf_dir}/documents.parquet", expand=64),
    )

    def partial_topn(batch: pa.Table) -> pa.Table:
        cnt = batch["n_occurrences"].to_numpy(zero_copy_only=False)
        if len(cnt) > n:
            terms = np.asarray(batch["term"].to_pylist(), dtype=object)
            sel = np.lexsort((terms, -cnt))[:n]
            batch = batch.take(pa.array(np.sort(sel)))
        return batch

    t = pa.Table.from_pylist(
        agg.map_batches(partial_topn, batch_format="pyarrow").take_all()
    )
    cnt = t["n_occurrences"].to_numpy(zero_copy_only=False).astype(np.int64)
    terms = np.asarray(t["term"].to_pylist(), dtype=object)
    order = np.lexsort((terms, -cnt))[:n]
    return pa.table(
        {
            "term": pa.array(terms[order], type=pa.string()),
            "n_occurrences": pa.array(cnt[order], type=pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64), type=pa.int64()),
        }
    )


def _cms_params(width: int, depth: int) -> np.ndarray:
    """Deterministic per-row xor seeds for the d hash functions."""
    rng = np.random.default_rng(0x5EEC)
    return rng.integers(0, 2**63, size=depth, dtype=np.uint64)


def _cms_add(sketch: np.ndarray, hashes: np.ndarray, counts: np.ndarray,
             seeds: np.ndarray) -> None:
    w = sketch.shape[1]
    for r, seed in enumerate(seeds):
        idx = ((hashes ^ seed) % np.uint64(w)).astype(np.int64)
        np.add.at(sketch[r], idx, counts)


def cms_term_counts(
    sf_dir: str,
    terms: list[str],
    *,
    width: int = 2048,
    depth: int = 4,
):
    """(term, est_count): count-min-sketch point estimates for ``terms``.

    Per-batch d×w sketches merge by ELEMENTWISE SUM — the whole corpus
    reduces to one fixed 64 KB matrix regardless of size, shipped as one
    row per batch (bounded by block count, not rows). est >= true always;
    est <= true + (e/width)·N with probability 1 - e^-depth."""
    seeds = _cms_params(width, depth)

    def batch_sketch(batch: pa.Table) -> pa.Table:
        t = _batch_term_counts(batch)
        h = hash_strings(np.asarray(t["term"].to_pylist(), dtype=object))
        cnt = t["n_p"].to_numpy(zero_copy_only=False)
        sk = np.zeros((depth, width), dtype=np.int64)
        _cms_add(sk, h, cnt, seeds)
        return pa.table({"sketch": pa.array([sk.ravel()], type=pa.list_(pa.int64()))})

    rows = (
        _read_docs(sf_dir)
        .map_batches(batch_sketch, batch_format="pyarrow")
        .take_all()
    )  # one fixed-size row per batch: bounded driver merge
    sketch = np.zeros(depth * width, dtype=np.int64)
    for r in rows:
        sketch += np.asarray(r["sketch"], dtype=np.int64)
    sketch = sketch.reshape(depth, width)

    qh = hash_strings(np.asarray(list(terms), dtype=object))
    est = np.empty(len(terms), dtype=np.int64)
    for i, h in enumerate(qh):
        cells = [
            sketch[r, int((np.uint64(h) ^ seed) % np.uint64(width))]
            for r, seed in enumerate(seeds)
        ]
        est[i] = min(cells)
    return pa.table(
        {
            "term": pa.array(list(terms), type=pa.string()),
            "est_count": pa.array(est, type=pa.int64()),
        }
    )


# ----------------------------------------------------------- hyperloglog

def _clz_shifted(x: np.ndarray, width: int) -> np.ndarray:
    """Leading-zero count of the top ``width`` bits of uint64 ``x``
    (values with all ``width`` bits zero return ``width``). Branchless
    6-step binary search — exact for all 64-bit inputs, unlike a
    float log2."""
    x = x.copy()
    n = np.zeros(x.shape, dtype=np.int64)
    shift = np.uint64(32)
    for s in (32, 16, 8, 4, 2, 1):
        su = np.uint64(s)
        high_zero = x < (np.uint64(1) << (np.uint64(64) - su))
        n += np.where(high_zero, s, 0)
        x = np.where(high_zero, x << su, x)
    return np.minimum(n, width)


def _hll_batch_registers(hashes: np.ndarray, p: int) -> np.ndarray:
    """m=2**p max-rank registers for one batch's distinct-hash stream."""
    m = 1 << p
    h = hashes.astype(np.uint64)
    bucket = (h >> np.uint64(64 - p)).astype(np.int64)
    rem = h << np.uint64(p)  # low 64-p bits, left-aligned
    rho = (_clz_shifted(rem, 64 - p) + 1).astype(np.int64)
    reg = np.zeros(m, dtype=np.int64)
    np.maximum.at(reg, bucket, rho)
    return reg


def _hll_estimate(reg: np.ndarray) -> float:
    """Standard HLL estimator (Flajolet et al. 2007) with the
    small-range linear-counting correction."""
    m = len(reg)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.float64(2.0) ** (-reg))
    zeros = int((reg == 0).sum())
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return float(est)


def hll_distinct_terms(sf_dir: str, *, p: int = 12):
    """(n_distinct_est,): HyperLogLog estimate of the corpus's distinct
    token count. Each batch reduces its token stream to one m=2**p
    register row (4 KB at p=12); rows merge by ELEMENTWISE MAX, so the
    whole corpus collapses to a fixed-size sketch with no term shuffle
    at all — the scale path for vocabulary profiling where the exact
    ``groupby(term)`` (see :func:`top_terms`) would move billions of
    rows. Standard error ~= 1.04/sqrt(m) (~1.6% at p=12); approximate by
    construction, so no SQL oracle — the pytest asserts the error bound
    against the exact count and that split-merge equals one-shot."""

    def batch_registers(batch: pa.Table) -> pa.Table:
        t = _batch_term_counts(batch)
        h = hash_strings(np.asarray(t["term"].to_pylist(), dtype=object))
        reg = _hll_batch_registers(h, p)
        return pa.table({"reg": pa.array([reg], type=pa.list_(pa.int64()))})

    rows = (
        _read_docs(sf_dir)
        .map_batches(batch_registers, batch_format="pyarrow")
        .take_all()
    )  # one fixed-size row per batch: bounded driver merge
    reg = np.zeros(1 << p, dtype=np.int64)
    for r in rows:
        reg = np.maximum(reg, np.asarray(r["reg"], dtype=np.int64))
    return pa.table(
        {"n_distinct_est": pa.array([int(round(_hll_estimate(reg)))], type=pa.int64())}
    )


# ------------------------------------------------------------- bloom filter

def _bloom_positions(hashes: np.ndarray, m: int, k: int) -> np.ndarray:
    """k bit positions per key via double hashing (Kirsch-Mitzenmacher:
    pos_i = h1 + i*h2 mod m — k independent-enough probes from two
    64-bit halves of one hash)."""
    h = hashes.astype(np.uint64)
    h1 = h % np.uint64(m)
    h2 = (h >> np.uint64(32)) % np.uint64(m) | np.uint64(1)  # odd => full cycle
    i = np.arange(k, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :]) % np.uint64(m)).reshape(-1)


def _bloom_batch_bits(hashes: np.ndarray, m: int, k: int) -> np.ndarray:
    bits = np.zeros(m, dtype=bool)
    if len(hashes):
        bits[_bloom_positions(hashes, m, k)] = True
    return bits


def bloom_build(sf_dir: str, *, m: int = 1 << 20, k: int = 7) -> np.ndarray:
    """Mergeable Bloom filter over the corpus's exact content digests
    (md5 of text) — the crawl-frontier / cross-corpus membership
    sketch: "has this exact document been seen before?" in O(1) per
    probe with ZERO false negatives and a tunable false-positive rate
    ((1-e^{-kn/m})^k; ~0.6% at n=100k, m=2^20, k=7).

    Each batch reduces to one m-bit row (128 KB at m=2^20); rows merge
    by elementwise OR, so the corpus collapses to a fixed-size filter
    with no shuffle at all — same mergeable-sketch shape as the CMS and
    HLL. At 100 TB, per-block filters OR pairwise in a tree; the final
    filter broadcasts to dedup/frontier workers via ray.put."""
    import hashlib as _hashlib

    def batch_bits(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        h = np.fromiter(
            (
                int.from_bytes(
                    _hashlib.md5((t or "").encode("utf-8")).digest()[:8], "little"
                )
                for t in texts
            ),
            dtype=np.uint64,
            count=len(texts),
        )
        bits = _bloom_batch_bits(h, m, k)
        return pa.table(
            {"bits": pa.array([np.packbits(bits).tobytes()], type=pa.binary())}
        )

    rows = (
        _read_docs(sf_dir)
        .map_batches(batch_bits, batch_format="pyarrow")
        .take_all()
    )  # one fixed-size row per batch: bounded driver merge
    acc = np.zeros(m // 8, dtype=np.uint8)
    for r in rows:
        acc |= np.frombuffer(r["bits"], dtype=np.uint8)
    return np.unpackbits(acc).astype(bool)


def bloom_membership(sf_dir: str, *, m: int = 1 << 20, k: int = 7):
    """(n_docs, n_bits_set, fp_rate_est_r, all_members): build the
    corpus Bloom filter and verify EVERY corpus digest probes positive
    (the no-false-negative guarantee, checked distributively: the
    filter broadcasts once via ray.put and each batch probes its own
    docs). fp_rate_est_r = (bits_set/m)^k rounded to 6 — the standard
    occupancy estimate of the false-positive rate."""
    import hashlib as _hashlib

    import ray

    from invertedindex_ray.functions.rounding import round_half_up

    bits = bloom_build(sf_dir, m=m, k=k)
    ref = ray.put(bits)

    def probe(batch: pa.Table) -> pa.Table:
        import ray as _ray

        b = _ray.get(ref)
        texts = batch["text"].to_pylist()
        h = np.fromiter(
            (
                int.from_bytes(
                    _hashlib.md5((t or "").encode("utf-8")).digest()[:8], "little"
                )
                for t in texts
            ),
            dtype=np.uint64,
            count=len(texts),
        )
        if len(h):
            pos = _bloom_positions(h, m, k).reshape(k, len(h))
            member = b[pos].all(axis=0)
        else:
            member = np.zeros(0, dtype=bool)
        return pa.table(
            {
                "n": pa.array([len(texts)], type=pa.int64()),
                "n_member": pa.array([int(member.sum())], type=pa.int64()),
            }
        )

    rows = _read_docs(sf_dir).map_batches(probe, batch_format="pyarrow").take_all()
    n = sum(r["n"] for r in rows)
    n_member = sum(r["n_member"] for r in rows)
    occupancy = bits.mean()
    return pa.table(
        {
            "n_docs": pa.array([int(n)], type=pa.int64()),
            "n_bits_set": pa.array([int(bits.sum())], type=pa.int64()),
            "fp_rate_est_r": pa.array(
                [float(round_half_up(np.array([occupancy**k]), 6)[0])],
                type=pa.float64(),
            ),
            "all_members": pa.array([int(n_member == n)], type=pa.int64()),
        }
    )


def zipf_slope(sf_dir: str, n: int = 1000):
    """(n_terms, slope_r, intercept_r): one-row corpus-health
    diagnostic — the OLS fit of ln(count) on ln(rank) over the top-n
    term frequencies. Natural text follows Zipf's law with slope near
    -1; a slope drifting toward 0 flags boilerplate/duplication and a
    steep slope flags a degenerate vocabulary, so data-mixing jobs
    watch this number per source/snapshot.

    Scale shape: rides :func:`top_terms` (per-batch partial counts, one
    vocabulary-hash-partitioned reduction, bounded per-block top-n) —
    only n rows ever reach the driver; the regression itself is O(n)
    numpy. slope = cov(x,y)/var(x) with x=ln(rank), y=ln(count),
    matching DuckDB's regr_slope/regr_intercept population formulas."""
    t = top_terms(sf_dir, n=n)
    cnt = t["n_occurrences"].to_numpy(zero_copy_only=False).astype(np.float64)
    rank = t["rank"].to_numpy(zero_copy_only=False).astype(np.float64)
    from invertedindex_ray.functions.rounding import round_half_up

    if len(cnt) >= 2:
        x = np.log(rank)
        y = np.log(cnt)
        mx = x.mean()
        my = y.mean()
        var = (x * x).mean() - mx * mx
        raw_slope = ((x * y).mean() - mx * my) / var
        slope = float(round_half_up(np.array([raw_slope]), 6)[0])
        intercept = float(
            round_half_up(np.array([my - raw_slope * mx]), 6)[0]
        )
    else:
        # <2 points: zero rank variance — regr_slope/regr_intercept are
        # NULL in the SQL mirror, so emit NULLs, not 0.0
        slope = None
        intercept = None
    return pa.table(
        {
            "n_terms": pa.array([len(cnt)], type=pa.int64()),
            "slope_r": pa.array([slope], type=pa.float64()),
            "intercept_r": pa.array([intercept], type=pa.float64()),
        }
    )


def vocab_stats(sf_dir: str):
    """(n_tokens, n_terms, n_hapax, hapax_ratio_r, ttr_r): one-row
    vocabulary health diagnostic — token count, distinct-term count,
    hapax legomena (terms occurring exactly once; their share rises
    with noise/OCR garbage and falls with duplication) and the
    type-token ratio. Terms are the lowered ``[^a-z0-9]+`` splits (the
    top_terms convention).

    Scale shape: per-batch partial counts, ONE vocabulary-hash keyed
    reduction — each term lives in exactly one partition, so the
    partition's (n_terms_p, n_hapax_p, n_tokens_p) partials are exact
    and the driver sums <= n_partitions rows. The vocabulary itself
    never leaves the cluster."""
    import pandas as pd

    from invertedindex_ray.functions.grouping import (
        table_partitions as _table_partitions,
    )
    from invertedindex_ray.functions.hashing import hash_strings
    from invertedindex_ray.functions.rounding import round_half_up
    from invertedindex_ray.pipelines.dedup import _grouped_partitions

    part_schema = pa.schema(
        [("n_terms", pa.int64()), ("n_hapax", pa.int64()),
         ("n_tokens", pa.int64())]
    )

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        codes, _terms = pd.factorize(g["term"].to_numpy(), sort=False)
        tot = np.bincount(codes, weights=g["n_p"].to_numpy()).astype(np.int64)
        return pd.DataFrame(
            {
                "n_terms": [len(tot)],
                "n_hapax": [int((tot == 1).sum())],
                "n_tokens": [int(tot.sum())],
            }
        )

    rows = _grouped_partitions(
        _read_docs(sf_dir).map_batches(
            _batch_term_counts, batch_format="pyarrow"
        ),
        lambda b: hash_strings(b["term"].to_pylist()),
        per_partition,
        part_schema,
        n_partitions=_table_partitions(f"{sf_dir}/documents.parquet", expand=64),
    ).take_all()  # <= n_partitions rows
    n_terms = sum(int(r["n_terms"]) for r in rows)
    n_hapax = sum(int(r["n_hapax"]) for r in rows)
    n_tokens = sum(int(r["n_tokens"]) for r in rows)
    hapax = n_hapax / n_terms if n_terms else 0.0
    ttr = n_terms / n_tokens if n_tokens else 0.0
    return pa.table(
        {
            "n_tokens": pa.array([n_tokens], type=pa.int64()),
            "n_terms": pa.array([n_terms], type=pa.int64()),
            "n_hapax": pa.array([n_hapax], type=pa.int64()),
            "hapax_ratio_r": pa.array(
                round_half_up(np.array([hapax]), 6), type=pa.float64()
            ),
            "ttr_r": pa.array(
                round_half_up(np.array([ttr]), 6), type=pa.float64()
            ),
        }
    )
