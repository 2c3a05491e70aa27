"""Analytical index pipelines over the ``documents`` table — each one is a
small Ray Data pipeline with an exact DuckDB-SQL mirror (driver correctness
gate). They exercise the same operators the index build uses (M1-M6,
A1-A4 in SURVEY.md §2) in SQL-checkable form; the full binary index build
and DAAT engine are exercised by entry()/topk_daat and pytest.

All pipelines here run with ``stemming=False`` (an official reference
config, application.properties) because no SQL stemmer exists in DuckDB
offline; the stemmed path is pytest-gated against Porter2 vectors.
"""

from __future__ import annotations

from invertedindex_ray.sources.io import read_parquet_clean as _rpq

import numpy as np
import pyarrow as pa

from invertedindex_ray.config import IndexConfig
from invertedindex_ray.functions.rounding import round_half_up
from invertedindex_ray.functions.scoring import bm25_partial
from invertedindex_ray.stages.tokenize import TokenizeStage

NOSTEM = IndexConfig(stemming=False)


def _read_docs(sf_dir: str):
    import ray.data as rd

    return _rpq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


class _TokenizeDocs(TokenizeStage):
    """TokenizeStage keyed by doc_id instead of url (documents table)."""

    def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
        import pyarrow.compute as pc

        from invertedindex_ray.functions.textproc import tokenize_docs

        cfg = self.config
        terms, tfs, doc_len = tokenize_docs(
            batch["text"],
            stemming=cfg.stemming,
            stopword_removal=cfg.stopwords,
            max_term_len=cfg.max_term_len,
            memo=self.memo,
        )
        ids = batch["doc_id"]
        out = pa.table(
            {
                "doc_id": ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids,
                "doc_len": pa.array(doc_len, type=pa.int32()),
                "terms": terms,
                "tfs": tfs,
            }
        )
        return out.filter(pc.greater(out["doc_len"], 0))


def _tokenize_docs_batch(batch: pa.Table, cfg: IndexConfig) -> pa.Table:
    """Stateless-task tokenize keyed by doc_id (documents table), using
    the per-worker module-global stem memo."""
    import pyarrow.compute as pc

    from invertedindex_ray.functions.textproc import tokenize_docs
    from invertedindex_ray.stages.tokenize import _GLOBAL_MEMO

    terms, tfs, doc_len = tokenize_docs(
        batch["text"],
        stemming=cfg.stemming,
        stopword_removal=cfg.stopwords,
        max_term_len=cfg.max_term_len,
        memo=_GLOBAL_MEMO if cfg.stemming else None,
    )
    ids = batch["doc_id"]
    out = pa.table(
        {
            "doc_id": ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids,
            "doc_len": pa.array(doc_len, type=pa.int32()),
            "terms": terms,
            "tfs": tfs,
        }
    )
    return out.filter(pc.greater(out["doc_len"], 0))


def _tokenized(sf_dir: str, cfg: IndexConfig):
    # stateless tasks on the warm worker pool (full cluster parallelism;
    # a fixed-size actor pool here capped every analytics pipeline at its
    # actor count). The stem memo is module state per worker process.
    return _read_docs(sf_dir).map_batches(
        lambda b: _tokenize_docs_batch(b, cfg),
        batch_format="pyarrow", batch_size=2048,
    )


def _explode_batch(batch: pa.Table) -> pa.Table:
    terms = batch["terms"]
    terms = terms.combine_chunks() if isinstance(terms, pa.ChunkedArray) else terms
    tfs = batch["tfs"]
    tfs = tfs.combine_chunks() if isinstance(tfs, pa.ChunkedArray) else tfs
    offsets = terms.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lengths = offsets[1:] - offsets[:-1]
    doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
    doc_len = batch["doc_len"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "term": terms.values,
            "doc_id": pa.array(np.repeat(doc_id, lengths), type=pa.int64()),
            "tf": tfs.values.cast(pa.int64()),
            "doc_len": pa.array(np.repeat(doc_len, lengths).astype(np.int64), type=pa.int64()),
        }
    )


# ---------- M1-M5: per-doc stats ----------

def doc_stats(sf_dir: str, cfg: IndexConfig = NOSTEM):
    """(doc_id, doc_len) for docs surviving the empty/stopword-only filter."""
    return _tokenized(sf_dir, cfg).select_columns(["doc_id", "doc_len"]).map_batches(
        lambda t: t.set_column(1, "doc_len", t["doc_len"].cast(pa.int64())),
        batch_format="pyarrow",
    )


# ---------- A1: collection statistics ----------

def collection_stats_from(tok) -> pa.Table:
    """Stats from an (optionally materialized) tokenized dataset."""
    from ray.data.aggregate import Count, Sum

    agg = tok.select_columns(["doc_len"]).aggregate(Count(), Sum("doc_len"))
    n = int(agg["count()"])
    tot = int(agg["sum(doc_len)"] or 0)
    return pa.table(
        {
            "num_docs": pa.array([n], type=pa.int64()),
            "total_tokens": pa.array([tot], type=pa.int64()),
            "avg_doc_len": pa.array([tot / n if n else 0.0], type=pa.float64()),
        }
    )


def collection_stats(sf_dir: str, cfg: IndexConfig = NOSTEM):
    """One row: num_docs, total_tokens, avg_doc_len (Indexer.java:129-131)."""
    return collection_stats_from(_tokenized(sf_dir, cfg))


# ---------- postings + lexicon (A2/A3) ----------

def postings(sf_dir: str, cfg: IndexConfig = NOSTEM):
    """(term, doc_id, tf) posting rows."""
    return _tokenized(sf_dir, cfg).map_batches(
        _explode_batch, batch_format="pyarrow"
    ).select_columns(["term", "doc_id", "tf"])


def lexicon(sf_dir: str, cfg: IndexConfig = NOSTEM):
    """(term, df, cf) — pre-aggregated per batch before the groupby
    (partial-combine pattern: the shuffle moves one row per distinct term
    per batch, not one per posting)."""
    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = _explode_batch(batch)
        term = t["term"]
        term = term.combine_chunks() if isinstance(term, pa.ChunkedArray) else term
        d = pc.dictionary_encode(term)
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        tf = t["tf"].to_numpy(zero_copy_only=False)
        n = len(d.dictionary)
        df_p = np.bincount(codes, minlength=n)
        cf_p = np.bincount(codes, weights=tf, minlength=n).astype(np.int64)
        return pa.table(
            {
                "term": d.dictionary,
                "df_p": pa.array(df_p.astype(np.int64), type=pa.int64()),
                "cf_p": pa.array(cf_p, type=pa.int64()),
            }
        )

    parts = _tokenized(sf_dir, cfg).map_batches(partial, batch_format="pyarrow")

    # vocabulary-keyed merge of the partials: hash-partitioned + one
    # vectorized factorize/bincount per partition (Ray's per-group
    # aggregate is ~40x slower on near-unique keys at web-scale vocab —
    # see dedup._grouped_partitions)
    from invertedindex_ray.functions.grouping import table_partitions
    from invertedindex_ray.functions.hashing import hash_strings
    from invertedindex_ray.pipelines.dedup import _grouped_partitions

    out_schema = pa.schema(
        [("term", pa.string()), ("df", pa.int64()), ("cf", pa.int64())]
    )

    def sum_per_term(g):
        import pandas as pd

        codes, terms = pd.factorize(g["term"].to_numpy(), sort=False)
        df = np.bincount(codes, weights=g["df_p"].to_numpy()).astype(np.int64)
        cf = np.bincount(codes, weights=g["cf_p"].to_numpy()).astype(np.int64)
        return pd.DataFrame({"term": terms, "df": df, "cf": cf})

    return _grouped_partitions(
        parts,
        lambda b: hash_strings(b["term"].to_pylist()),
        sum_per_term,
        out_schema,
        n_partitions=table_partitions(
            f"{sf_dir}/documents.parquet", expand=64
        ),
    )


# ---------- A4: term upper bounds ----------

def term_upper_bounds(sf_dir: str, cfg: IndexConfig = NOSTEM):
    """(term, df, cf, tub_r): max BM25 contribution per term, rounded to
    6 dp (LexiconTermBinaryIndexing.computeStatistics)."""
    import math


    stats = collection_stats(sf_dir, cfg)
    n_docs = int(stats["num_docs"][0].as_py())
    avg = float(stats["avg_doc_len"][0].as_py())

    def with_partial(batch: pa.Table) -> pa.Table:
        t = _explode_batch(batch)
        part = bm25_partial(
            t["tf"].to_numpy(zero_copy_only=False),
            t["doc_len"].to_numpy(zero_copy_only=False),
            avg, cfg.bm25_k1, cfg.bm25_b,
        )
        return t.append_column("partial", pa.array(part, type=pa.float64()))

    rows = _tokenized(sf_dir, cfg).map_batches(with_partial, batch_format="pyarrow")

    from invertedindex_ray.functions.grouping import table_partitions
    from invertedindex_ray.functions.hashing import hash_strings
    from invertedindex_ray.pipelines.dedup import _grouped_partitions

    agg_schema = pa.schema(
        [("term", pa.string()), ("df", pa.int64()), ("cf", pa.int64()),
         ("maxp", pa.float64())]
    )

    def agg_per_term(g):
        import pandas as pd

        codes, terms = pd.factorize(g["term"].to_numpy(), sort=False)
        df = np.bincount(codes).astype(np.int64)
        cf = np.bincount(codes, weights=g["tf"].to_numpy()).astype(np.int64)
        maxp = np.full(len(terms), -np.inf)
        np.fmax.at(maxp, codes, g["partial"].to_numpy())
        return pd.DataFrame({"term": terms, "df": df, "cf": cf, "maxp": maxp})

    agg = _grouped_partitions(
        rows,
        lambda b: hash_strings(b["term"].to_pylist()),
        agg_per_term,
        agg_schema,
        n_partitions=table_partitions(
            f"{sf_dir}/documents.parquet", expand=64
        ),
    )

    def finish(batch: pa.Table) -> pa.Table:
        df = batch["df"].to_numpy(zero_copy_only=False)
        maxp = batch["maxp"].to_numpy(zero_copy_only=False)
        tub = np.fromiter(
            (m * math.log(n_docs / int(d)) for m, d in zip(maxp, df)),
            dtype=np.float64, count=len(df),
        )
        return pa.table(
            {
                "term": batch["term"].combine_chunks()
                if isinstance(batch["term"], pa.ChunkedArray)
                else batch["term"],
                "df": batch["df"].cast(pa.int64()),
                "cf": batch["cf"].cast(pa.int64()),
                "tub_r": pa.array(round_half_up(tub, 6), type=pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------- Q5: TF-IDF scoring ----------

POSTINGS_SCHEMA = pa.schema(
    [("term", pa.string()), ("doc_id", pa.int64()), ("tf", pa.int64())]
)
_DF_SCHEMA = pa.schema([("term", pa.string()), ("df", pa.int64())])


def _postings_with_df(sf_dir: str, cfg: IndexConfig, doc_filter=None):
    """(term, doc_id, tf, df) posting rows with document frequency
    hash-JOINED on — never collected or broadcast: at 100 TB with
    stopwords off the term dictionary is billions of entries and fits
    neither the driver nor one plasma object (VERDICT r3 #1; same rule
    as textstats.unigram_surprisal's count tables). Shape:

    1. one tokenize pass -> exploded postings, materialized once (block
       refs reused by both consumers below; the object store spills);
    2. df via a per-batch (term, df_p) partial + one hash-partitioned
       vectorized reduction (one slim row per distinct term per batch
       through the shuffle — mirrors the SQL's ``lex AS (SELECT term,
       count(*) FROM tfs GROUP BY term)``);
    3. an inner hash join of df back onto the postings, fan-out derived
       from DATA size (posting row count), never cluster size.

    ``doc_filter`` (optional, ``fn(doc_id ndarray) -> bool mask``)
    restricts the LEFT side of the join only — df is still computed from
    the FULL corpus (the mlt/seed use case: score a small doc subset
    against whole-corpus statistics without joining every posting).

    Returns ``(joined_dataset, n_posting_rows)``."""
    from invertedindex_ray.functions.grouping import (
        grouped_partitions,
        materialized_nonempty,
        normalize_schema,
        pair_join_partitions,
        reduction_partitions,
    )
    from invertedindex_ray.functions.hashing import hash_strings

    rows = normalize_schema(
        _tokenized(sf_dir, cfg).map_batches(_explode_batch, batch_format="pyarrow"),
        POSTINGS_SCHEMA,
    )
    rows, n_post = materialized_nonempty(rows, POSTINGS_SCHEMA)

    def df_partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        term = batch["term"]
        term = term.combine_chunks() if isinstance(term, pa.ChunkedArray) else term
        d = pc.dictionary_encode(term)
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dfp = np.bincount(codes, minlength=len(d.dictionary)).astype(np.int64)
        return pa.table(
            {
                "term": d.dictionary,
                "df": pa.array(dfp, type=pa.int64()),
            }
        )

    def sum_df(g):
        import pandas as pd

        codes, terms = pd.factorize(g["term"].to_numpy(), sort=False)
        df = np.bincount(codes, weights=g["df"].to_numpy()).astype(np.int64)
        return pd.DataFrame({"term": terms, "df": df})

    dfs = grouped_partitions(
        rows.map_batches(df_partial, batch_format="pyarrow"),
        lambda b: hash_strings(b["term"].to_pylist()),
        sum_df,
        _DF_SCHEMA,
        n_partitions=reduction_partitions(n_post),
    )
    dfs, _ = materialized_nonempty(dfs, _DF_SCHEMA)

    left, n_left = rows, n_post
    if doc_filter is not None:
        def keep(batch: pa.Table) -> pa.Table:
            mask = doc_filter(batch["doc_id"].to_numpy(zero_copy_only=False))
            return batch.filter(pa.array(mask))

        left, n_left = materialized_nonempty(
            rows.map_batches(keep, batch_format="pyarrow"), POSTINGS_SCHEMA
        )

    joined = left.join(
        dfs,
        join_type="inner",  # every posting's term has a df by construction
        num_partitions=pair_join_partitions(max(n_left, 1)),
        on=("term",),
    )
    return joined, n_post


def _tfidf_r(batch: pa.Table, n_docs: int) -> np.ndarray:
    """Rounded ln(N/df)*(1+ln(tf)) for a joined (tf, df) batch —
    math.log (libm), not np.log (SIMD, 1-ulp off), for oracle parity;
    computed once per DISTINCT df / tf value, not per posting row."""
    import math

    df = batch["df"].to_numpy(zero_copy_only=False).astype(np.int64)
    udf, inv_df = np.unique(df, return_inverse=True)
    idf_u = np.fromiter(
        (math.log(n_docs / int(d)) for d in udf), dtype=np.float64, count=len(udf)
    )
    tf = batch["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
    utf, inv_tf = np.unique(tf, return_inverse=True)
    logtf = np.fromiter(
        (math.log(int(v)) for v in utf), dtype=np.float64, count=len(utf)
    )
    return round_half_up(idf_u[inv_df] * (1.0 + logtf[inv_tf]), 6)


def tfidf_scores(sf_dir: str, cfg: IndexConfig = NOSTEM):
    """(term, doc_id, tfidf_r): ln(N/df) * (1 + ln(tf)) per posting, the
    reference's alternative scoring function (ScoringFunctions.java:14-17,
    implemented but unused by default). df arrives via
    :func:`_postings_with_df`'s hash join — no driver-side vocabulary."""
    stats = collection_stats(sf_dir, cfg)
    n_docs = int(stats["num_docs"][0].as_py())

    joined, _ = _postings_with_df(sf_dir, cfg)

    out_schema = pa.schema(
        [("term", pa.string()), ("doc_id", pa.int64()), ("tfidf_r", pa.float64())]
    )

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema.empty_table()
        return pa.table(
            {
                "term": batch["term"].cast(pa.string()),
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "tfidf_r": pa.array(_tfidf_r(batch, n_docs), type=pa.float64()),
            }
        )

    return joined.map_batches(score, batch_format="pyarrow")


# Fixed driver prefix set; the last prefix must match no terms.
DRIVER_PREFIXES: list[str] = ["s", "t", "zzq"]


def prefix_terms(sf_dir: str, prefixes: list[str] | None = None,
                 cfg: IndexConfig = NOSTEM):
    """(prefix, term, df, cf): wildcard/prefix term lookup — every
    vocabulary term starting with each prefix, with its document and
    collection frequency. The term-sorted lexicon makes this a range
    scan in the reference's design (DiskDataStructuresSearch binary
    search gives the lower bound); here it is one vectorized
    ``pc.starts_with`` filter per prefix over the (already reduced,
    one-row-per-term) lexicon dataset — no extra shuffle."""
    import pyarrow.compute as pc

    prefixes = DRIVER_PREFIXES if prefixes is None else prefixes
    out_schema = pa.schema(
        [
            ("prefix", pa.string()),
            ("term", pa.string()),
            ("df", pa.int64()),
            ("cf", pa.int64()),
        ]
    )

    def match(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema.empty_table()
        outs = []
        term = batch["term"]
        term = term.combine_chunks() if isinstance(term, pa.ChunkedArray) else term
        for p in prefixes:
            hit = batch.filter(pc.starts_with(term, pattern=p))
            if hit.num_rows:
                outs.append(
                    pa.table(
                        {
                            "prefix": pa.array([p] * hit.num_rows, type=pa.string()),
                            "term": hit["term"].cast(pa.string()),
                            "df": hit["df"].cast(pa.int64()),
                            "cf": hit["cf"].cast(pa.int64()),
                        }
                    )
                )
        if not outs:
            return out_schema.empty_table()
        return pa.concat_tables(outs)

    return lexicon(sf_dir, cfg).map_batches(match, batch_format="pyarrow")


# Fixed driver fuzzy set; the last word must match no terms.
DRIVER_FUZZY: list[str] = ["tble", "scann", "hash", "zzzq"]


def _padded_byte_matrix(term_arr):
    """Zero-copy-ish (one gather) padded uint8 matrix + lengths for an
    Arrow string array. Terms are post-tokenizer ([a-z0-9]+), so bytes
    == characters and byte comparisons match DuckDB's levenshtein."""
    arr = (
        term_arr.combine_chunks()
        if isinstance(term_arr, pa.ChunkedArray)
        else term_arr
    )
    if arr.type != pa.string():
        # large_string carries int64 offsets — reading them as int32
        # would silently garble every term; normalize first
        arr = arr.cast(pa.string())
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.zeros(0, np.uint8)
    starts, lens = offs[:-1], np.diff(offs)
    lmax = int(lens.max()) if len(lens) else 0
    mat = np.zeros((len(arr), lmax), dtype=np.uint8)
    if lmax:
        col = np.arange(lmax, dtype=np.int64)[None, :]
        valid = col < lens[:, None]
        mat[valid] = data[(starts[:, None] + col)[valid]]
    return mat, lens


def fuzzy_terms(sf_dir: str, words: list[str] | None = None,
                cfg: IndexConfig = NOSTEM):
    """(q, term, dist, df): typo-tolerant term resolution — every
    vocabulary term within Levenshtein distance <= 1 of each query word,
    with the edit distance and document frequency (the df lets a query
    rewriter pick the most attested correction). The reference resolves
    terms by exact binary search (DiskDataStructuresSearch.java:36-67);
    this is the standard fuzzy extension an interactive search frontend
    layers on the same lexicon.

    Distance <= 1 decomposes by length into three vectorized byte-matrix
    checks per query word (no per-term Python, no DP table):
    - same length: <= 1 mismatching position;
    - term one longer: term == q with one char inserted — leading-match
      prefix + shifted-suffix equality;
    - term one shorter: q == term with one char inserted (symmetric).
    Each batch of the (already reduced, one-row-per-term) lexicon is
    screened independently — embarrassingly parallel, no extra shuffle,
    and the query set rides in the task closure (it is tiny)."""
    import pyarrow.compute as pc  # noqa: F401  (parity with siblings)

    words = DRIVER_FUZZY if words is None else words
    out_schema = pa.schema(
        [
            ("q", pa.string()),
            ("term", pa.string()),
            ("dist", pa.int64()),
            ("df", pa.int64()),
        ]
    )
    qbytes = [(w, np.frombuffer(w.encode("utf-8"), dtype=np.uint8)) for w in words]

    def _suffix_ok(eq: np.ndarray, shifted: np.ndarray) -> np.ndarray:
        """rows where shifted[i, pre_i:] is all-True, pre_i = leading-True
        run of eq[i] (the insertion point); pre_i == width means the whole
        prefix matches and the edit is at the end (vacuously true)."""
        k, m = eq.shape
        if m == 0:
            return np.ones(k, dtype=bool)
        pre = np.where(eq.all(axis=1), m, np.argmin(eq, axis=1))
        suf = np.logical_and.accumulate(shifted[:, ::-1], axis=1)[:, ::-1]
        sufx = np.concatenate([suf, np.ones((k, 1), dtype=bool)], axis=1)
        return sufx[np.arange(k), pre]

    def match(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema.empty_table()
        mat, lens = _padded_byte_matrix(batch["term"])
        outs = []

        def emit(word, sel_idx, dist):
            if len(sel_idx) == 0:
                return
            hit = batch.take(pa.array(sel_idx, type=pa.int64()))
            outs.append(
                pa.table(
                    {
                        "q": pa.array([word] * hit.num_rows, type=pa.string()),
                        "term": hit["term"].cast(pa.string()),
                        "dist": pa.array(dist, type=pa.int64()),
                        "df": hit["df"].cast(pa.int64()),
                    }
                )
            )

        for word, qa in qbytes:
            m = len(qa)
            # same length: substitution (or exact)
            idx = np.flatnonzero(lens == m)
            if len(idx) and m:
                mism = (mat[idx, :m] != qa[None, :]).sum(axis=1)
                keep = mism <= 1
                emit(word, idx[keep], mism[keep].astype(np.int64))
            # term one longer: one char deleted from the term yields q
            idx = np.flatnonzero(lens == m + 1)
            if len(idx):
                rows = mat[idx, : m + 1]
                ok = _suffix_ok(rows[:, :m] == qa[None, :],
                                rows[:, 1 : m + 1] == qa[None, :])
                emit(word, idx[ok], np.ones(int(ok.sum()), dtype=np.int64))
            # term one shorter: one char inserted into the term yields q
            idx = np.flatnonzero(lens == m - 1)
            if len(idx) and m >= 1:
                rows = mat[idx, : m - 1]
                ok = _suffix_ok(rows == qa[None, : m - 1],
                                rows == qa[None, 1:m])
                emit(word, idx[ok], np.ones(int(ok.sum()), dtype=np.int64))
        if not outs:
            return out_schema.empty_table()
        return pa.concat_tables(outs)

    return lexicon(sf_dir, cfg).map_batches(match, batch_format="pyarrow")


def spell_suggest(sf_dir: str, words: list[str] | None = None,
                  cfg: IndexConfig = NOSTEM):
    """(q, suggestion, dist, df): did-you-mean — the single best
    correction per query word from the Levenshtein<=1 candidates of
    :func:`fuzzy_terms`, picked by (dist asc, df desc, term asc): an
    exact vocabulary hit suggests itself (dist 0); a word with no
    candidate within distance 1 yields no row (mirrors the SQL inner
    join). The candidate set is bounded (a handful of rows per query
    word), so the final pick is a driver-side pass over a tiny table;
    all the heavy lifting is fuzzy_terms' vectorized byte-matrix screen
    over the distributed lexicon."""
    cand = fuzzy_terms(sf_dir, words=words, cfg=cfg).to_pandas()
    out_schema = pa.schema(
        [("q", pa.string()), ("suggestion", pa.string()),
         ("dist", pa.int64()), ("df", pa.int64())]
    )
    if not len(cand):
        return out_schema.empty_table()
    cand = cand.sort_values(
        ["q", "dist", "df", "term"], ascending=[True, True, False, True]
    )
    best = cand.groupby("q", as_index=False).first()
    return pa.table(
        {
            "q": pa.array(best["q"].tolist(), type=pa.string()),
            "suggestion": pa.array(best["term"].tolist(), type=pa.string()),
            "dist": pa.array(
                best["dist"].to_numpy().astype(np.int64), type=pa.int64()
            ),
            "df": pa.array(
                best["df"].to_numpy().astype(np.int64), type=pa.int64()
            ),
        }
    )
