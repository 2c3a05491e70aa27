"""IndexBuilder: the end-to-end Ray Data index build pipeline.

Rebuild of the reference's two-phase SPIMI build
(/root/reference/src/main/java/it/unipi/indexer/Indexer.java:57-139 ingest,
BinaryIndexer.java:92-223 merge) as a streaming Dataset pipeline
(SURVEY.md §3 target shape):

    read_parquet(pages)[url, text]
      -> map_batches(TokenizeStage, actor pool)      # tokenize+stem+TF
      -> write_parquet(tokenized/)                   # checkpoint (resume)
    tokenized[url, doc_len]
      -> sort(url) + block-offset prefix sum         # dense doc ids (J1)
      -> doc_table/ + stats.json                     # A1 collection stats
    tokenized -> map_batches(PostingsExplode)        # (term,doc_id,tf,...)
      -> groupby(bucket)                             # THE one wide shuffle
      -> map_groups(SegmentWriter)                   # sort, d-gap, VB, skips
      -> segstats -> groupby(term) -> lexicon/       # df, cf, term ub (A2-A4)

Memory-pressure spills, retries and backpressure come from Ray's streaming
executor + object store (replacing the reference's heap watchdog,
Indexer.java:142-163). Every stage records completion in manifest.json;
segment buckets are individually resumable.

Index layout on disk::

    index_dir/
      manifest.json           # per-stage lineage + metrics
      stats.json              # num_docs, total_tokens, avg_doc_len
      tokenized/*.parquet     # checkpoint: url, doc_len, terms, tfs
      doc_table/*.parquet     # doc_id, url, doc_len (sorted by doc_id)
      segments/bucket=K.parquet  # term, part, df, doc_ids_vb, tfs_vb, skips
      segstats/bucket=K.parquet  # slim per-(term,part) stats sidecar
      lexicon/*.parquet       # term, df, cf, tub (sorted by term)
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from invertedindex_ray.config import IndexConfig
from invertedindex_ray.stages.explode import PostingsPartial
from invertedindex_ray.stages.segment import SegmentWriter
from invertedindex_ray.stages.tokenize import TokenizeStage
from invertedindex_ray.state.manifest import Manifest, atomic_write_json


@dataclass
class CollectionStats:
    num_docs: int
    total_tokens: int
    avg_doc_len: float

    @classmethod
    def load(cls, index_dir: str) -> "CollectionStats":
        with open(os.path.join(index_dir, "stats.json")) as f:
            d = json.load(f)
        return cls(d["num_docs"], d["total_tokens"], d["avg_doc_len"])

    def save(self, index_dir: str) -> None:
        atomic_write_json(
            os.path.join(index_dir, "stats.json"),
            {
                "num_docs": self.num_docs,
                "total_tokens": self.total_tokens,
                "avg_doc_len": self.avg_doc_len,
            },
        )


class IndexBuilder:
    def __init__(
        self,
        index_dir: str,
        config: IndexConfig | None = None,
        *,
        tokenize_concurrency: int | None = None,
        tokenize_batch_size: int = 1024,
        explode_batch_size: int = 2048,
    ):
        self.index_dir = index_dir
        self.config = config or IndexConfig()
        self.tokenize_concurrency = tokenize_concurrency
        self.tokenize_batch_size = tokenize_batch_size
        self.explode_batch_size = explode_batch_size
        os.makedirs(index_dir, exist_ok=True)
        self.manifest = Manifest.load_or_create(index_dir, self.config.fingerprint())

    # ---------- stage 1: tokenize checkpoint ----------

    def _tokenized_dir(self) -> str:
        return os.path.join(self.index_dir, "tokenized")

    def _run_tokenize(self, pages) -> None:
        if self.manifest.stage_complete("tokenized"):
            return
        import ray

        cols = set(pages.schema().names)
        if {"url", "text"} - cols:
            raise ValueError(f"pages dataset must have url+text, got {cols}")
        ds = pages
        if "html" in cols:
            # html -> text extraction (S1/§3 lifecycle): identity on rows
            # whose text is already populated (input_hint: byte-identical
            # text per url); fills text from html otherwise. A heavyweight
            # HTML parser would make this an actor pool (callable class).
            from invertedindex_ray.sources.pages import extract_text_batch

            ds = ds.select_columns(["url", "text", "html"]).map_batches(
                extract_text_batch, batch_format="pyarrow"
            )
        if set(ds.schema().names) - {"url", "text"}:
            ds = ds.select_columns(["url", "text"])
        cfg = self.config
        if self.tokenize_concurrency is not None:
            # explicit actor pool (useful when a heavy model/parser loads in
            # __init__; see TokenizeStage)
            tok = ds.map_batches(
                TokenizeStage,
                fn_constructor_args=(cfg,),
                batch_format="pyarrow",
                batch_size=self.tokenize_batch_size,
                concurrency=self.tokenize_concurrency,
            )
        else:
            # default: stateless tasks on the warm worker pool with a
            # module-global stem memo (no per-execution actor spin-up)
            from invertedindex_ray.stages.tokenize import tokenize_pages_batch

            tok = ds.map_batches(
                lambda b: tokenize_pages_batch(b, cfg),
                batch_format="pyarrow",
                batch_size=self.tokenize_batch_size,
            )
        out = self._tokenized_dir()
        # a crashed attempt leaves partial UUID-named files; write_parquet
        # appends rather than replaces, so clear the stage dir first
        shutil.rmtree(out, ignore_errors=True)
        tok.write_parquet(out)
        self.manifest.mark_complete("tokenized", path=out)

    def _read_tokenized(self, columns=None):
        import ray.data as rd

        return rd.read_parquet(self._tokenized_dir(), columns=columns)

    # ---------- stage 2: stats ----------

    def _run_stats(self) -> CollectionStats:
        if self.manifest.stage_complete("stats"):
            return CollectionStats.load(self.index_dir)
        from ray.data.aggregate import Count, Sum

        slim = self._read_tokenized(columns=["doc_len"])
        agg = slim.aggregate(Count(), Sum("doc_len"))
        num_docs = int(agg["count()"])
        total = int(agg["sum(doc_len)"] or 0)
        # avgDocLen = (double) numTokens / numDocs (Indexer.java:129-131)
        stats = CollectionStats(num_docs, total, total / num_docs if num_docs else 0.0)
        stats.save(self.index_dir)
        self.manifest.mark_complete("stats", num_docs=num_docs, total_tokens=total)
        return stats

    # ---------- stage 3: doc table + dense ids ----------

    def _doc_table_dir(self) -> str:
        return os.path.join(self.index_dir, "doc_table")

    def _run_doc_table(self, stats: CollectionStats) -> None:
        if self.manifest.stage_complete("doc_table"):
            return
        import ray
        import ray.data as rd

        slim = self._read_tokenized(columns=["url", "doc_len"])
        if self.config.id_mode == "hash":
            from invertedindex_ray.functions.hashing import url_hash_ids

            def add_hash_ids(batch: pa.Table) -> pa.Table:
                urls = np.asarray(batch["url"].to_pylist(), dtype=object)
                ids = url_hash_ids(urls)
                return batch.append_column("doc_id", pa.array(ids, type=pa.int64()))

            out = slim.map_batches(add_hash_ids, batch_format="pyarrow").sort("doc_id")
            shutil.rmtree(self._doc_table_dir(), ignore_errors=True)
            out.write_parquet(self._doc_table_dir())
        else:
            # dense ids = rank in sorted-url order, assigned via the
            # zipWithIndex pattern: materialize the sorted slim table, prefix-
            # sum per-block row counts (metadata only), then stamp ids inside
            # each block by offset. Driver work is O(#blocks), not O(rows).
            mat = slim.sort("url").materialize()
            refs, counts = [], []
            for bundle in mat.iter_internal_ref_bundles():
                for ref, meta in zip(bundle.block_refs, bundle.metadata):
                    refs.append(ref)
                    counts.append(meta.num_rows)
            offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))

            @ray.remote
            def stamp(block: pa.Table, offset: int) -> pa.Table:
                ids = np.arange(offset, offset + block.num_rows, dtype=np.int64)
                return block.append_column("doc_id", pa.array(ids, type=pa.int64()))

            stamped = [stamp.remote(r, int(o)) for r, o in zip(refs, offsets)]
            shutil.rmtree(self._doc_table_dir(), ignore_errors=True)
            rd.from_arrow_refs(stamped).write_parquet(self._doc_table_dir())
        self.manifest.mark_complete("doc_table", num_docs=stats.num_docs)

    def _load_sorted_urls(self) -> np.ndarray:
        """doc-id-ordered urls as a fixed-width numpy bytes array: UTF-8
        byte order matches Arrow's string sort order, so np.searchsorted
        gives the rank; primitive ndarrays ship zero-copy through the
        object store (an object-dtype array would pickle per worker)."""
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        t = pq.read_table(self._doc_table_dir(), columns=["url", "doc_id"])
        order = pc.sort_indices(t["doc_id"])
        urls = t["url"].take(order).to_pylist()
        arr = np.array([u.encode("utf-8") for u in urls], dtype=bytes)
        # url is the document identity (input_hint: byte-identical text per
        # url); duplicate urls would make rank lookup collapse two doc ids
        # onto one and silently corrupt postings — fail loudly instead and
        # point at the dedup pipeline
        if len(arr) > 1 and (arr[1:] == arr[:-1]).any():
            dup = arr[1:][arr[1:] == arr[:-1]][0]
            raise ValueError(
                f"duplicate url in corpus (e.g. {dup!r}): urls must be "
                "unique for dense doc ids — deduplicate first "
                "(pipelines.dedup.exact_dedup) or use id_mode='hash' "
                "with pre-deduped input"
            )
        return arr

    # ---------- stage 4: postings shuffle + segments ----------

    def _run_segments(self, stats: CollectionStats) -> None:
        if self.manifest.stage_complete("segments"):
            return
        import ray

        tok = self._read_tokenized(columns=["url", "doc_len", "terms", "tfs"])
        urls_ref = None
        if self.config.id_mode == "dense":
            urls_ref = ray.put(self._load_sorted_urls())
        explode = PostingsPartial(
            self.config, stats.num_docs, stats.avg_doc_len, urls_ref
        )
        postings = tok.map_batches(
            explode, batch_format="pyarrow", batch_size=self.explode_batch_size
        )
        writer = SegmentWriter(self.index_dir, self.config, stats.avg_doc_len)

        def write_segment_group(group: pa.Table) -> pa.Table:
            return writer(group)

        seg_stats = postings.groupby("bucket").map_groups(
            write_segment_group, batch_format="pyarrow"
        )
        # consume: stats rows are tiny; count() drives the pipeline
        n_entries = seg_stats.count()
        self.manifest.mark_complete("segments", segment_entries=n_entries)

    # ---------- stage 5: lexicon ----------

    def _lexicon_dir(self) -> str:
        return os.path.join(self.index_dir, "lexicon")

    def _run_lexicon(self, stats: CollectionStats) -> None:
        if self.manifest.stage_complete("lexicon"):
            return
        import ray.data as rd
        from ray.data.aggregate import Max, Sum

        seg_stats = rd.read_parquet(os.path.join(self.index_dir, "segstats"))
        lex = (
            seg_stats.groupby("term")
            .aggregate(Sum("df", alias_name="df"), Sum("cf", alias_name="cf"),
                       Max("maxp", alias_name="maxp"))
        )
        num_docs = stats.num_docs

        def finish(batch: pa.Table) -> pa.Table:
            import math

            df = batch["df"].to_numpy(zero_copy_only=False)
            maxp = batch["maxp"].to_numpy(zero_copy_only=False)
            # tub = max(partial) * ln(N/df) — exactly max(BM25) per posting
            # (IEEE multiply by a positive scalar is monotonic). math.log,
            # not np.log: the SIMD log differs by 1 ulp from libm, and the
            # query engine scores with math.log (scoring.bm25).
            idf = np.fromiter(
                (math.log(num_docs / int(d)) for d in df), dtype=np.float64, count=len(df)
            )
            tub = maxp * idf
            return pa.table(
                {
                    "term": batch["term"].combine_chunks()
                    if isinstance(batch["term"], pa.ChunkedArray)
                    else batch["term"],
                    "df": batch["df"].cast(pa.int64()),
                    "cf": batch["cf"].cast(pa.int64()),
                    "tub": pa.array(tub, type=pa.float64()),
                }
            )

        shutil.rmtree(self._lexicon_dir(), ignore_errors=True)
        lex.map_batches(finish, batch_format="pyarrow").sort("term").write_parquet(
            self._lexicon_dir()
        )
        self.manifest.mark_complete("lexicon")

    # ---------- public API ----------

    def build(self, pages) -> CollectionStats:
        """Run (or resume) the full build; returns collection stats."""
        self.config.save(self.index_dir)  # make the index dir self-describing
        self._run_tokenize(pages)
        stats = self._run_stats()
        self._run_doc_table(stats)
        self._run_segments(stats)
        self._run_lexicon(stats)
        self.manifest.mark_complete("build")
        return stats


def build_index(pages, index_dir: str, config: IndexConfig | None = None, **kw) -> CollectionStats:
    return IndexBuilder(index_dir, config, **kw).build(pages)
