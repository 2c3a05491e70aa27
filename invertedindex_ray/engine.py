"""BM25 query engine: conjunctive / disjunctive top-k retrieval with
document-at-a-time traversal and MaxScore dynamic pruning.

Faithful re-expression of the reference query processor
(/root/reference/src/main/java/it/unipi/query/processor/QueryProcessor.java):

- query preprocessing == the indexing chain, first token selects AND/OR,
  >32 terms truncated, tokens deduped (QueryProcessor.java:135-174)
- posting lists sorted by ascending term upper bound; MaxScore essential/
  non-essential split with pivot + threshold updates (:216-327)
- conjunctive max-frontier with nextGEQ alignment (:329-412)
- top-k priority queue with the reference's **tie-collapse quirk**: the
  TreeSet orders DocumentScore by score only, so a doc whose score equals
  an existing member is silently dropped (models/DocumentScore.java:6-12)
- LRU query-result cache keyed by {tokens + query type}, max 500
  (QueryProcessor.java:36,112-130)

Posting cursors chain the per-(term, part) segments in ascending part
order; parts are contiguous doc-id ranges, so chained traversal is in
global doc-id order — identical semantics to the reference's single
posting list (PostingListInterface.java:100-178), with `nextGEQ` as a
binary search plus skip-pointer support for the lazily-decoded path.
"""

from __future__ import annotations

import os
from bisect import insort
from collections import OrderedDict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from invertedindex_ray.build import CollectionStats
from invertedindex_ray.config import IndexConfig
from invertedindex_ray.functions import codec
from invertedindex_ray.functions.hashing import term_buckets_all_parts
from invertedindex_ray.functions.scoring import bm25
from invertedindex_ray.functions.textproc import tokenize, preprocess_token
from invertedindex_ray.stages.segment import segment_path


class IllegalQueryTypeError(ValueError):
    pass


class PostingCursor:
    """Cursor over one term's postings (all parts chained, decoded arrays).

    Mirrors PostingListInterface: ``next()`` advances one posting and
    returns False when exhausted (current values keep their last state);
    ``next_geq(d)`` advances to the first doc id >= d.
    """

    __slots__ = ("term", "tub", "ids", "tfs", "pos", "doc_id", "tf", "n")

    def __init__(self, term: str, tub: float, ids: np.ndarray, tfs: np.ndarray):
        self.term = term
        self.tub = tub
        self.ids = ids
        self.tfs = tfs
        self.n = len(ids)  # cached: next/next_geq are the hot loop
        self.pos = -1
        self.doc_id = -1
        self.tf = 0

    def next(self) -> bool:
        p = self.pos + 1
        if p >= self.n:
            return False
        self.pos = p
        self.doc_id = int(self.ids[p])
        self.tf = int(self.tfs[p])
        return True

    def next_geq(self, target: int) -> bool:
        if self.pos >= self.n:
            return False
        if self.doc_id >= target:
            return True
        # bound ndarray method, NOT np.searchsorted: the fromnumeric
        # dispatch wrapper costs more than the search itself at the
        # ~600K-calls-per-query-batch rate of the sequential traversals
        i = int(self.ids.searchsorted(target, "left"))
        if i >= self.n:
            # exhausted: current stays at the last posting, like the
            # reference's while-next loop ending on hasNext == false
            self.pos = self.n - 1
            self.doc_id = int(self.ids[-1])
            self.tf = int(self.tfs[-1])
            return False
        self.pos = i
        self.doc_id = int(self.ids[i])
        self.tf = int(self.tfs[i])
        return True


_BMW_EXHAUSTED = 1 << 62  # block_last sentinel past the list's final doc


class BlockMaxCursor(PostingCursor):
    """PostingCursor + per-block score upper bounds for Block-Max WAND
    (Ding & Suel, "Faster Top-k Document Retrieval Using Block-Max
    Indexes", SIGIR 2011). Blocks are a fixed ``block`` postings wide;
    ``block_max[j]`` upper-bounds every per-posting BM25 score in block
    j. The bounds come from the vectorized score array
    (``get_scored_postings``) inflated by 1e-12 RELATIVE — the final
    scoring uses the reference-op-order scalar formula, which can differ
    from the vectorized one by a few ulps, and a block max must never
    sit below a true score or BMW could skip a doc the exact traversal
    admits. Skipping is conservative by that hair; admitted sets stay
    rank-identical (asserted against MaxScore/WAND in tests)."""

    __slots__ = ("block_last", "block_max", "_bw", "_nb")

    def __init__(
        self,
        term: str,
        tub: float,
        ids: np.ndarray,
        tfs: np.ndarray,
        scores: np.ndarray,
        block: int = 128,
    ):
        super().__init__(term, tub, ids, tfs)
        n = len(ids)
        nb = (n + block - 1) // block
        last_idx = np.minimum(np.arange(1, nb + 1, dtype=np.int64) * block, n) - 1
        # plain Python lists: the traversal probes these once or twice
        # per WAND iteration, and list indexing + int compares are ~10x
        # cheaper than numpy scalar dispatch at that call granularity
        self.block_last = ids[last_idx].astype(np.int64).tolist()
        starts = np.arange(nb, dtype=np.int64) * block
        self.block_max = (
            np.maximum.reduceat(scores, starts) * (1.0 + 1e-12)
        ).tolist()
        self._bw = block
        self._nb = nb

    def _block_of(self, d: int) -> int:
        """Index of the block holding the first posting with doc id >= d
        (== n_blocks when d is past the list's final doc). The scan
        starts at the cursor's CURRENT block — callers only probe with
        d >= self.doc_id, so blocks before it can never qualify — and
        walks forward (amortized O(1): the traversal's probe points are
        monotone within a query)."""
        j = self.pos // self._bw if self.pos > 0 else 0
        bl = self.block_last
        nb = self._nb
        while j < nb and bl[j] < d:
            j += 1
        return j

    def block_max_for(self, d: int) -> float:
        j = self._block_of(d)
        return self.block_max[j] if j < self._nb else 0.0

    def block_last_for(self, d: int) -> int:
        j = self._block_of(d)
        return self.block_last[j] if j < self._nb else _BMW_EXHAUSTED


class LazyPostingCursor:
    """Skip-block cursor: decodes ONE √df-sized block at a time, jumping
    via skip pointers in ``next_geq`` — the reference's lazy traversal
    (PostingListInterface.java:100-178, skip seek at :138-178) and the
    10^12-doc path: a head term's multi-GB posting list never fully
    decodes to serve a conjunctive query.

    Chains a term's per-part segment rows in ascending part order (parts
    are contiguous doc-id ranges). Protocol-compatible with
    :class:`PostingCursor`.
    """

    __slots__ = (
        "term", "tub", "rows", "row_i", "_dblob", "_tblob", "_skips",
        "_n_blocks", "_block", "_ids", "_tfs", "pos", "doc_id", "tf",
        "stream_codec",
    )

    def __init__(self, term: str, tub: float,
                 rows: list[tuple[int, bytes, bytes, bytes]],
                 stream_codec: str = "vb"):
        self.term = term
        self.tub = tub
        self.rows = rows  # [(part, doc_ids_vb, tfs_vb, skips)], part-sorted
        self.stream_codec = stream_codec  # gamma/delta rows carry no skips
        self.row_i = -1
        self._block = -1
        self._n_blocks = 0
        self._ids: np.ndarray | None = None
        self._tfs: np.ndarray | None = None
        self.pos = -1
        self.doc_id = -1
        self.tf = 0

    def _open_row(self, i: int) -> None:
        part, dblob, tblob, sblob = self.rows[i]
        self.row_i = i
        self._dblob = dblob
        self._tblob = tblob
        self._skips = codec.parse_skips(sblob)
        self._n_blocks = len(self._skips) + 1
        self._block = -1

    def _decode_block(self, k: int) -> None:
        s = self._skips
        dstart = 0 if k == 0 else int(s[k - 1, 1])
        tstart = 0 if k == 0 else int(s[k - 1, 2])
        dend = int(s[k, 1]) if k < len(s) else len(self._dblob)
        tend = int(s[k, 2]) if k < len(s) else len(self._tblob)
        gaps = codec.decode_stream(self._dblob[dstart:dend], self.stream_codec)
        ids = np.cumsum(gaps)
        if k > 0:
            # first gap spans the block boundary; the skip entry carries
            # the absolute first doc id of this block
            ids += int(s[k - 1, 0]) - int(gaps[0])
        self._ids = ids
        self._tfs = codec.decode_stream(
            self._tblob[tstart:tend], self.stream_codec
        )
        self._block = k
        self.pos = -1

    def _set(self, pos: int) -> None:
        self.pos = pos
        self.doc_id = int(self._ids[pos])
        self.tf = int(self._tfs[pos])

    def next(self) -> bool:
        while True:
            if self._block >= 0 and self.pos + 1 < len(self._ids):
                self._set(self.pos + 1)
                return True
            if self.row_i >= 0 and self._block + 1 < self._n_blocks:
                self._decode_block(self._block + 1)
                continue
            if self.row_i + 1 < len(self.rows):
                self._open_row(self.row_i + 1)
                self._decode_block(0)
                continue
            return False

    def next_geq(self, target: int) -> bool:
        if self._block < 0:
            if not self.next():
                return False
        if self.doc_id >= target:
            return True
        while True:
            s = self._skips
            # candidate block in the current row: last block whose first
            # doc id is <= target (skip entries hold blocks 1..n-1)
            k = int(np.searchsorted(s[:, 0], target, side="right")) if len(s) else 0
            if k > self._block:
                self._decode_block(k)
            if self._ids[-1] >= target:
                self._set(int(np.searchsorted(self._ids, target, side="left")))
                return True
            if self._block + 1 < self._n_blocks:
                # target sits in the gap between block k and k+1: the
                # answer is block k+1's first posting
                self._decode_block(self._block + 1)
                self._set(0)
                return True
            # row exhausted below target: chain to the next part's row
            if self.row_i + 1 < len(self.rows):
                self._open_row(self.row_i + 1)
                self._decode_block(0)
                if self._ids[0] >= target:
                    self._set(0)
                    return True
                continue
            # fully exhausted: park on the very last posting (PostingCursor
            # / reference while-next semantics), report failure
            self._set(len(self._ids) - 1)
            return False


class TopKQueue:
    """The reference's TreeSet<DocumentScore>: descending-score order where
    compareTo == 0 collapses entries — equal scores keep only the first
    inserted doc."""

    __slots__ = ("k", "neg_scores", "by_score")

    def __init__(self, k: int):
        self.k = k
        self.neg_scores: list[float] = []  # sorted ascending == score descending
        # score -> member key (doc id in the engine; any hashable works)
        self.by_score: dict[float, object] = {}

    def __len__(self) -> int:
        return len(self.neg_scores)

    def last_score(self) -> float:
        return -self.neg_scores[-1]

    def add(self, doc_no: str, score: float) -> None:
        if score in self.by_score:
            return  # tie-collapse: TreeSet.add is a no-op on compareTo==0
        insort(self.neg_scores, -score)
        self.by_score[score] = doc_no
        if len(self.neg_scores) > self.k:
            dropped = -self.neg_scores.pop()
            del self.by_score[dropped]

    def results(self) -> list[tuple[str, float]]:
        return [(self.by_score[-ns], -ns) for ns in self.neg_scores]


class QueryEngine:
    """Loads a built index and serves `[AND|OR] term1 ... termN` queries.

    Query-side state mirrors the reference's never-load-it-all design
    (DiskDataStructuresSearch.java:22-67): ``doc_len`` is resident (the
    4 B/doc fixed-width array BM25 gathers from), while url strings and
    the lexicon switch between fully-resident ("resident") and on-demand
    row-group fetch with binary search ("ondisk") via ``doc_store`` /
    ``lexicon_store`` ("auto" picks by size — see state/disktables.py).
    Segments are read per term with parquet row-group pruning and cached
    per (term, part).
    """

    def __init__(
        self,
        index_dir: str,
        config: IndexConfig | None = None,
        *,
        traversal: str = "vectorized",
        scoring: str = "bm25",
        cursor: str = "decoded",
        doc_store: str = "auto",
        lexicon_store: str = "auto",
        segments: str = "bucket",
        term_cache_size: int = 4096,
        postings_cache_size: int = 65536,
        shared_state: dict | None = None,
        bmw_block: int = 128,
    ):
        """``traversal``:

        - ``"vectorized"`` (default): numpy exhaustive scoring + closed-form
          queue replay. Produces the same result set as MaxScore DAAT —
          the pruned docs provably cannot enter the queue (their bounded
          score never exceeds the threshold), and the final queue equals
          {top-k distinct scores, each held by its first-traversal (= min
          doc id) doc}. Per-term score arrays are cached, so a query is a
          concatenate + bincount + lexsort. This is the 10^12-doc path.
        - ``"daat"``: the reference-faithful sequential MaxScore DAAT
          (QueryProcessor.java:251-412), with its pivot-dependent float
          summation order. The two differ only by 1-ulp effects on exact
          score ties; tests assert canonical equality.
        - ``"wand"``: classic WAND dynamic pruning (Broder et al.,
          "Efficient Query Evaluation using a Two-Level Retrieval
          Process", CIKM 2003) for OR queries — the pivot is found by
          summing term upper bounds over cursors sorted by CURRENT doc
          id, and pre-pivot cursors leapfrog with ``next_geq`` so whole
          doc-id ranges are skipped without scoring. Returns the same
          top-k set as MaxScore (both enumerate candidate docs in
          ascending id order and admit on ``score > threshold``; a doc
          WAND skips has upper bound <= threshold so it could never be
          admitted). AND queries route to the same conjunctive DAAT as
          ``"daat"`` (conjunctive traversal is already next_geq-driven).
        """
        self.index_dir = index_dir
        persisted = IndexConfig.load(index_dir)
        if config is None:
            # the index dir is self-describing: use the build-time config
            self.config = persisted or IndexConfig()
        else:
            if persisted is not None:
                bad = [
                    f
                    for f in IndexConfig.LAYOUT_FIELDS
                    if getattr(persisted, f) != getattr(config, f)
                ]
                if bad:
                    raise ValueError(
                        f"config mismatch with index at {index_dir}: fields "
                        f"{bad} differ from the build-time config.json — "
                        "open with config=None to use the persisted config"
                    )
            self.config = config
        self.traversal = traversal
        # "tfidf" = the reference's alternative scorer
        # (ScoringFunctions.java:14-17). The stored term upper bounds are
        # BM25-based, so MaxScore pruning doesn't apply — vectorized
        # (exhaustive) traversal only.
        if scoring not in ("bm25", "tfidf"):
            raise ValueError(f"unknown scoring {scoring!r}")
        if scoring == "tfidf" and traversal != "vectorized":
            raise ValueError("tfidf scoring requires traversal='vectorized'")
        self.scoring = scoring
        if traversal not in ("vectorized", "daat", "wand", "bmw"):
            raise ValueError(f"unknown traversal {traversal!r}")
        # "decoded": whole posting lists decoded + cached (fast for hot
        # terms). "lazy": LazyPostingCursor decodes one skip-block at a
        # time in the DAAT path (head lists never fully decode).
        if cursor not in ("decoded", "lazy"):
            raise ValueError(f"unknown cursor mode {cursor!r}")
        if traversal == "bmw" and cursor != "decoded":
            # block maxima come from the decoded per-posting score array
            raise ValueError("traversal='bmw' requires cursor='decoded'")
        self.cursor_mode = cursor
        # BMW posting-block width; small values help tiny test indexes,
        # 128 matches the block-max literature at scale
        self.bmw_block = int(bmw_block)
        # "bucket": whole bucket file decoded + cached on first touch
        # (fast when buckets fit memory). "pruned": per-term filtered
        # parquet reads (row-group pruning over the term-sorted file) with
        # a bounded term LRU — the web-scale serving mode where a bucket
        # file may be tens of GB (DiskDataStructuresSearch range reads).
        if segments not in ("bucket", "pruned"):
            raise ValueError(f"unknown segments mode {segments!r}")
        self.segments_mode = segments
        self.stats = CollectionStats.load(index_dir)

        from invertedindex_ray.state.disktables import DocTable, Lexicon

        if shared_state is not None:
            # decoded doc table + lexicon injected from the Ray object
            # store (serving.shared_index_state): every actor on a node
            # maps the SAME plasma buffers zero-copy instead of paying
            # its own disk decode + resident copy (VERDICT r3 #2)
            self._lexicon = Lexicon.from_shared(shared_state["lexicon"])
            self.docs = DocTable.from_shared(shared_state["doc_table"])
        else:
            self._lexicon = Lexicon(
                os.path.join(index_dir, "lexicon"), lexicon_store
            )
            self.docs = DocTable(os.path.join(index_dir, "doc_table"), doc_store)
        self._dense = self.docs.dense

        self._n_parts = max(1, self.config.num_doc_partitions)

        # decoded / scored posting arrays, LRU-bounded by TERM COUNT so a
        # long-lived serving actor's memory can't grow without bound (the
        # Zipf head working set stays hot; cold tail terms re-decode)
        self._postings_cache: OrderedDict[str, tuple[np.ndarray, np.ndarray] | None] = OrderedDict()
        self._scored_cache: OrderedDict[str, tuple[np.ndarray, np.ndarray] | None] = OrderedDict()
        self._postings_cache_size = postings_cache_size
        self._bucket_cache: dict[int, dict[str, list[tuple[int, bytes, bytes, bytes]]]] = {}
        self._term_rows_cache: OrderedDict[tuple[int, str], list] = OrderedDict()
        self._term_cache_size = term_cache_size
        self._query_cache: OrderedDict[frozenset, list] = OrderedDict()

    # ---------- caches ----------

    @staticmethod
    def _cache_put(cache: OrderedDict, size: int, key, val) -> None:
        """The ONLY insert path for the LRU-bounded caches: every insert
        trims, so None sentinels (out-of-vocabulary / empty-postings
        probes) are bounded too — a serving actor fed an endless stream
        of unseen terms (typos, adversarial tails) must not grow the
        OrderedDicts without bound (ADVICE r2)."""
        cache[key] = val
        cache.move_to_end(key)
        while len(cache) > size:
            cache.popitem(last=False)

    # ---------- lexicon / doc table ----------

    @property
    def lexicon(self) -> dict[str, tuple[int, int, float]]:
        """Resident lexicon dict (tests/tools); ondisk engines use
        :meth:`lexicon_row` instead."""
        if self._lexicon.table is None:
            raise AttributeError(
                "lexicon is in ondisk mode; use lexicon_row(term)"
            )
        return self._lexicon.table

    def lexicon_row(self, term: str) -> tuple[int, int, float] | None:
        return self._lexicon.get(term)

    def doc_lookup(self, doc_id: int) -> tuple[str, int]:
        return self.docs.lookup(doc_id)

    # ---------- postings ----------

    def _bucket_rows(self, bucket: int) -> dict[str, list[tuple[int, bytes, bytes]]]:
        """term -> [(part, doc_ids_vb, tfs_vb)] for one bucket file, loaded
        once and cached. The reference mmaps the whole postings file
        (QueryProcessor.java:50-56); this is the per-bucket analog. At true
        web scale the engine would instead keep only the lexicon resident
        and range-read (offset, size) slices per term — the layout already
        records per-row blob sizes, so that switch is local to this method."""
        cached = self._bucket_cache.get(bucket)
        if cached is not None:
            return cached
        path = segment_path(self.index_dir, bucket)
        out: dict[str, list[tuple[int, bytes, bytes, bytes]]] = {}
        if os.path.exists(path):
            t = pq.read_table(
                path, columns=["term", "part", "doc_ids_vb", "tfs_vb", "skips"]
            )
            terms = t["term"].to_pylist()
            parts = t["part"].to_numpy(zero_copy_only=False)
            dvb = t["doc_ids_vb"].to_pylist()
            tvb = t["tfs_vb"].to_pylist()
            svb = t["skips"].to_pylist()
            for tm, p, d, f, s in zip(terms, parts, dvb, tvb, svb):
                out.setdefault(tm, []).append((int(p), d, f, s))
        self._bucket_cache[bucket] = out
        return out

    def _pruned_term_rows(self, bucket: int, term: str) -> list:
        """All (part, doc_ids_vb, tfs_vb, skips) rows of one term in one
        bucket via a filtered parquet read (row-group pruning: the bucket
        file is term-sorted), LRU-cached per (bucket, term)."""
        key = (bucket, term)
        cached = self._term_rows_cache.get(key)
        if cached is not None:
            self._term_rows_cache.move_to_end(key)
            return cached
        path = segment_path(self.index_dir, bucket)
        rows: list = []
        if os.path.exists(path):
            t = pq.read_table(
                path,
                columns=["term", "part", "doc_ids_vb", "tfs_vb", "skips"],
                filters=[("term", "==", term)],
            )
            rows = list(
                zip(
                    (int(x) for x in t["part"].to_pylist()),
                    t["doc_ids_vb"].to_pylist(),
                    t["tfs_vb"].to_pylist(),
                    t["skips"].to_pylist(),
                )
            )
        self._cache_put(self._term_rows_cache, self._term_cache_size, key, rows)
        return rows

    def _read_segment_rows(self, term: str) -> list[tuple[int, bytes, bytes, bytes]]:
        rows = []
        buckets = term_buckets_all_parts(
            term, self._n_parts, self.config.num_buckets
        )
        if self.segments_mode == "pruned":
            by_bucket: dict[int, list[int]] = {}
            for part, b in enumerate(buckets):
                by_bucket.setdefault(int(b), []).append(part)
            for b, parts in by_bucket.items():
                wanted = set(parts)
                rows.extend(
                    r for r in self._pruned_term_rows(b, term) if r[0] in wanted
                )
        else:
            for part, b in enumerate(buckets):
                rows.extend(
                    r for r in self._bucket_rows(int(b)).get(term, ()) if r[0] == part
                )
        rows.sort(key=lambda r: r[0])
        return rows

    def get_postings(self, term: str) -> tuple[np.ndarray, np.ndarray] | None:
        """Decoded (doc_ids, tfs) for a term, parts chained in doc-id order."""
        if term in self._postings_cache:
            self._postings_cache.move_to_end(term)
            return self._postings_cache[term]
        if self._lexicon.get(term) is None:
            # out-of-vocabulary: no I/O beyond the lexicon probe (the
            # reference's lexicon binary search fails first,
            # QueryProcessor.java:176-183)
            self._cache_put(
                self._postings_cache, self._postings_cache_size, term, None
            )
            return None
        rows = self._read_segment_rows(term)
        if not rows:
            self._cache_put(
                self._postings_cache, self._postings_cache_size, term, None
            )
            return None
        ids_parts, tf_parts = [], []
        for _, dvb, tvb, _skips in rows:
            ids, tfs = codec.decode_posting_list(
                dvb, tvb, getattr(self.config, "codec", "vb")
            )
            ids_parts.append(ids)
            tf_parts.append(tfs)
        ids = np.concatenate(ids_parts)
        tfs = np.concatenate(tf_parts)
        out = (ids, tfs)
        self._cache_put(self._postings_cache, self._postings_cache_size, term, out)
        return out

    def get_scored_postings(self, term: str) -> tuple[np.ndarray, np.ndarray] | None:
        """(doc_ids, bm25_scores) for a term — per-posting scores
        precomputed once (idf * tf/(k1*norm+tf) in the reference op order)
        and cached; the vectorized query path is then pure array merging."""
        if term in self._scored_cache:
            self._scored_cache.move_to_end(term)
            return self._scored_cache[term]
        p = self.get_postings(term)
        row = self._lexicon.get(term)
        if p is None or row is None:
            self._cache_put(
                self._scored_cache, self._postings_cache_size, term, None
            )
            return None
        ids, tfs = p
        import math

        k1, b = self.config.bm25_k1, self.config.bm25_b
        avg = self.stats.avg_doc_len
        idf = math.log(self.stats.num_docs / row[0])
        if self.scoring == "tfidf":
            # ln(N/df) * (1 + ln(tf)) — ScoringFunctions.java:14-17;
            # doc lengths are not used, so skip the per-posting gather
            uniq, inv = np.unique(tfs, return_inverse=True)
            logtf = np.fromiter(
                (math.log(int(v)) for v in uniq), dtype=np.float64, count=len(uniq)
            )
            scores = idf * (1.0 + logtf[inv])
        else:
            if self._dense:
                dls = self.docs.doc_len[ids]
            else:
                dls = self.docs.doc_len[np.searchsorted(self.docs.doc_ids, ids)]
            tfsf = tfs.astype(np.float64)
            scores = (
                tfsf / ((k1 * ((1 - b) + b * (dls.astype(np.float64) / avg))) + tfsf)
            ) * idf
        out = (ids, scores)
        self._cache_put(self._scored_cache, self._postings_cache_size, term, out)
        return out

    # ---------- query preprocessing (M7) ----------

    def preprocess(self, query: str) -> tuple[str, set[str]]:
        tokens = tokenize(query)
        first = tokens[0] if tokens else ""
        if first == "and":
            qtype = "and"
        elif first == "or":
            qtype = "or"
        else:
            raise IllegalQueryTypeError("Input Format: [AND|OR] term1 ... termN")
        limit = len(tokens)
        if len(tokens) > self.config.max_query_terms:
            limit = self.config.max_query_terms + 1
        token_set: set[str] = set()
        cfg = self.config
        for tok in tokens[1:limit]:
            p = preprocess_token(
                tok,
                stemming=cfg.stemming,
                stopword_removal=cfg.stopwords,
                max_term_len=cfg.max_term_len,
            )
            if p is not None:
                token_set.add(p)
        return qtype, token_set

    # ---------- main entry ----------

    def query(self, query: str, k: int | None = None) -> list[tuple[str, float]]:
        """Run `[AND|OR] terms...`; returns [(doc_no, score)] by descending
        score (tie-collapsed, <= k entries). Empty list when no results."""
        k = k if k is not None else self.config.top_k
        qtype, token_set = self.preprocess(query)
        if k <= 0:
            return []

        # qtype kept OUT of the token set: a term that stems to the literal
        # string "and"/"or" must not collide with the query type
        cache_key = (qtype, frozenset(token_set), k)
        cached = self._query_cache.get(cache_key)
        if cached is not None:
            self._query_cache.move_to_end(cache_key)
            return list(cached)

        if self.traversal == "vectorized":
            results = self._vectorized_query(qtype, token_set, k)
            if results is not None:
                self._cache_put(
                    self._query_cache,
                    self.config.query_cache_size,
                    cache_key,
                    list(results),
                )
            return results if results is not None else []

        cursors: list[PostingCursor] = []
        lex_rows: dict[str, tuple[int, int, float]] = {}
        for tok in token_set:
            row = self._lexicon.get(tok)
            if row is None:
                if qtype == "and":
                    return []  # missing term: conjunctive returns nothing
                continue
            lex_rows[tok] = row
            if self.cursor_mode == "lazy":
                seg_rows = self._read_segment_rows(tok)
                if not seg_rows:
                    if qtype == "and":
                        return []
                    continue
                cursors.append(
                    LazyPostingCursor(
                        tok, row[2], seg_rows,
                        stream_codec=getattr(self.config, "codec", "vb"),
                    )
                )
            else:
                p = self.get_postings(tok)
                if p is None:
                    if qtype == "and":
                        return []
                    continue
                if self.traversal == "bmw":
                    sp = self.get_scored_postings(tok)
                    cursors.append(
                        BlockMaxCursor(
                            tok, row[2], p[0], p[1], sp[1], block=self.bmw_block
                        )
                    )
                else:
                    cursors.append(PostingCursor(tok, row[2], p[0], p[1]))

        # advance each list to its first posting; drop empty ones
        cursors = [c for c in cursors if c.next()]
        if not cursors:
            return []
        # ascending term upper bound (O4)
        cursors.sort(key=lambda c: c.tub)

        n = len(cursors)
        doc_upper = [0.0] * n
        doc_upper[0] = cursors[0].tub
        for i in range(1, n):
            doc_upper[i] = doc_upper[i - 1] + cursors[i].tub

        if qtype == "and":
            queue = self._conjunctive(cursors, doc_upper, lex_rows, k)
        elif self.traversal == "wand":
            queue = self._wand_disjunctive(cursors, lex_rows, k)
        elif self.traversal == "bmw":
            queue = self._bmw_disjunctive(cursors, lex_rows, k)
        else:
            queue = self._disjunctive(cursors, doc_upper, lex_rows, k)

        # queue members are doc ids; resolve the <= k urls only now
        results = [(self.doc_lookup(d)[0], s) for d, s in queue.results()]
        self._cache_put(
            self._query_cache, self.config.query_cache_size, cache_key, list(results)
        )
        return results

    # ---------- vectorized traversal ----------

    def _vectorized_query(
        self, qtype: str, token_set: set[str], k: int
    ) -> list[tuple[str, float]] | None:
        """Exhaustive numpy scoring + closed-form MaxScore queue replay.

        Term contributions are summed in ascending-term-upper-bound order
        (the DAAT pivot=0 order). Final set = top-k distinct total scores,
        each represented by its minimum doc id — proven equal to the
        sequential queue's content (see class docstring)."""
        terms = []
        zero_idf = False
        n_docs = self.docs.num_docs
        for tok in token_set:
            sp = self.get_scored_postings(tok)
            if sp is None:
                if qtype == "and":
                    return []
                continue
            row = self._lexicon.get(tok)
            zero_idf |= row[0] == n_docs  # df == N: every score is 0.0
            terms.append((row[2], tok, sp))
        if not terms:
            return []
        terms.sort(key=lambda t: t[0])  # tub ascending == DAAT list order

        ids = np.concatenate([sp[0] for _, _, sp in terms])
        scores = np.concatenate([sp[1] for _, _, sp in terms])
        if self._dense and len(ids) * 4 >= n_docs:
            # dense ids, head query: direct O(n + N) accumulation, no sort
            acc = np.bincount(ids, weights=scores, minlength=n_docs)
            if qtype == "or" and not zero_idf:
                # all scores strictly positive -> acc > 0 iff any posting
                # hit; the count bincount is pure overhead here
                hit = np.flatnonzero(acc)
            elif qtype == "and":
                cnt = np.bincount(ids, minlength=n_docs)
                hit = np.flatnonzero(cnt == len(terms))
            else:
                cnt = np.bincount(ids, minlength=n_docs)
                hit = np.flatnonzero(cnt)
            if not len(hit):
                return []
            uniq_ids = hit
            totals = acc[hit]
            # (both branches add each doc's term scores in input order, so
            # the sparse path below is bit-identical — np.bincount and the
            # grouped bincount accumulate in order of appearance)
        else:
            uniq_ids, inv, counts = np.unique(
                ids, return_inverse=True, return_counts=True
            )
            totals = np.bincount(inv, weights=scores)
            if qtype == "and":
                mask = counts == len(terms)
                if not mask.any():
                    return []
                uniq_ids = uniq_ids[mask]
                totals = totals[mask]

        # narrow before the lexsort: O(n) argpartition keeps the m best
        # totals; when >= k DISTINCT scores sit strictly above the
        # partition cutoff, every score group of the final top-k distinct
        # values is complete inside the candidate set (anything outside
        # is <= cutoff), so min-doc-id representatives stay exact. Head
        # queries hit 10-50% of the corpus — sorting only ~max(256, 4k)
        # candidates instead of the whole hit set is the difference
        # between ~40 ms and ~5 ms per cold head query at 200k docs.
        n_hits = len(totals)
        m = max(256, 4 * k)
        while n_hits > 2 * m:
            part = np.argpartition(-totals, m - 1)[:m]
            cutoff = totals[part].min()
            above = totals[part]
            above = above[above > cutoff]
            if len(np.unique(above)) >= k:
                uniq_ids = uniq_ids[part]
                totals = totals[part]
                break
            m *= 4
        # top-k distinct scores, min doc id each: lexsort by (-score, id),
        # keep the first row of each score group, take k
        order = np.lexsort((uniq_ids, -totals))
        s_sorted = totals[order]
        d_sorted = uniq_ids[order]
        first = np.empty(len(s_sorted), dtype=bool)
        if len(s_sorted):
            first[0] = True
            np.not_equal(s_sorted[1:], s_sorted[:-1], out=first[1:])
        keep = np.flatnonzero(first)[:k]
        return [
            (self.doc_lookup(int(d_sorted[i]))[0], float(s_sorted[i])) for i in keep
        ]

    # ---------- DAAT traversals ----------

    def _score(self, tf: int, doc_len: int, df: int) -> float:
        return bm25(
            tf,
            doc_len,
            df,
            self.stats.num_docs,
            self.stats.avg_doc_len,
            self.config.bm25_k1,
            self.config.bm25_b,
        )

    def _disjunctive(self, cursors, doc_upper, lex_rows, k) -> TopKQueue:
        # QueryProcessor.processDisjunctiveQuery (:251-327)
        queue = TopKQueue(k)
        threshold = 0.0
        pivot = 0
        n = len(cursors)
        current = min(c.doc_id for c in cursors)
        finished: set[int] = set()

        while current != -1 and pivot < n:
            if len(finished) == n:
                break
            nxt = -1
            score = 0.0
            # doc_len only — url strings are resolved AFTER traversal, for
            # the <= k queue members (out-of-core doc table stays cold)
            doc_len = self.docs.doc_len_at(self.docs.index_of(current))

            # essential lists
            for i in range(pivot, n):
                if i in finished:
                    continue
                c = cursors[i]
                if c.doc_id == current:
                    score += self._score(c.tf, doc_len, lex_rows[c.term][0])
                    if not c.next():
                        finished.add(i)
                if (nxt == -1 or c.doc_id < nxt) and i not in finished:
                    nxt = c.doc_id

            # non-essential lists (with upper-bound early exit)
            for i in range(pivot - 1, -1, -1):
                if i in finished:
                    continue
                if score + doc_upper[i] <= threshold:
                    break
                c = cursors[i]
                if not c.next_geq(current):
                    finished.add(i)
                if c.doc_id == current:
                    score += self._score(c.tf, doc_len, lex_rows[c.term][0])

            if len(queue) < k or score > queue.last_score():
                queue.add(current, score)
                threshold = queue.last_score() if len(queue) == k else 0.0
                while pivot < n and doc_upper[pivot] <= threshold:
                    pivot += 1

            current = nxt
        return queue

    def _wand_disjunctive(self, cursors, lex_rows, k) -> TopKQueue:
        """WAND (Broder et al., CIKM 2003, Fig. 4): cursors stay sorted
        by current doc id; the pivot is the first prefix whose summed
        term upper bounds beat the queue threshold. If the lowest cursor
        already sits on the pivot doc, the doc is fully scored; else one
        pre-pivot cursor leapfrogs to ``next_geq(pivot_doc)``. With the
        tie-collapse queue the admitted set equals MaxScore's: both
        evaluate candidates in ascending doc order and admit on
        ``score > last_score`` — a skipped doc's upper bound was
        <= threshold, so its true score could never be admitted.
        While the queue is not yet full the threshold is -1 (no skips:
        zero-score docs are admissible, matching the exhaustive set)."""
        from bisect import insort

        queue = TopKQueue(k)
        # sorted-by-doc-id invariant maintained incrementally: only moved
        # cursors are re-inserted (classic WAND; a full re-sort per loop
        # step is O(n log n) per posting step — ADVICE r3). Tie order
        # among equal doc ids is semantically irrelevant: scoring gathers
        # the whole equal-doc prefix and sums in tub order, and the
        # leapfrog victim is picked by max tub over strictly-behind
        # cursors.
        live = sorted(cursors, key=lambda c: c.doc_id)
        while live:
            threshold = queue.last_score() if len(queue) == k else -1.0
            acc = 0.0
            pivot = -1
            for i, c in enumerate(live):
                acc += c.tub
                if acc > threshold:
                    pivot = i
                    break
            if pivot == -1:
                break  # no remaining doc can beat the threshold
            pivot_doc = live[pivot].doc_id
            if live[0].doc_id == pivot_doc:
                # every cursor at pivot_doc is a sorted prefix: score it.
                # Contributions are summed in ascending-tub term order —
                # the same float summation order as the vectorized
                # traversal (terms sorted by tub), so exact-score ties
                # collapse identically across the two pruning paths.
                doc_len = self.docs.doc_len_at(self.docs.index_of(pivot_doc))
                n_at = 0
                while n_at < len(live) and live[n_at].doc_id == pivot_doc:
                    n_at += 1
                at_doc = live[:n_at]
                del live[:n_at]
                score = 0.0
                for c in sorted(at_doc, key=lambda c: c.tub):
                    score += self._score(c.tf, doc_len, lex_rows[c.term][0])
                for c in at_doc:
                    if c.next():
                        insort(live, c, key=lambda x: x.doc_id)
                if len(queue) < k or score > queue.last_score():
                    queue.add(pivot_doc, score)
            else:
                # leapfrog: advance the highest-upper-bound cursor that
                # is strictly BEHIND the pivot doc (Broder's pick —
                # statistically the shortest list, so it skips the most
                # postings per seek). Pre-pivot cursors can already sit
                # ON pivot_doc (doc-id ties); next_geq would be a no-op
                # on those, so they must not be chosen.
                j = -1
                best_tub = -1.0
                for i in range(pivot):
                    ci = live[i]
                    if ci.doc_id < pivot_doc and ci.tub > best_tub:
                        best_tub = ci.tub
                        j = i
                c = live.pop(j)
                if c.next_geq(pivot_doc):
                    insort(live, c, key=lambda x: x.doc_id)
                # else: parked on its last posting — done
        return queue

    def _bmw_disjunctive(self, cursors, lex_rows, k) -> TopKQueue:
        """Block-Max WAND (Ding & Suel, SIGIR 2011): the WAND pivot is
        found with TERM upper bounds as usual, then re-checked SHALLOWLY
        against the sum of the pivot prefix's per-BLOCK maxima. If even
        the block maxima cannot beat the threshold, every doc up to the
        nearest block boundary d'-1 is skipped in one ``next_geq(d')``
        (no per-doc work at all); otherwise the step degrades to classic
        WAND. Correctness: for any doc in [pivot_doc, d'), each prefix
        cursor is still inside the same block (d'-1 <= its block_last)
        and every cursor PAST the pivot currently sits at a doc >= d'
        (d' is min'd with live[pivot+1].doc_id), so the doc's true score
        <= the checked block-max sum <= threshold — it could never be
        admitted (admission needs score > last_score). While the queue
        is not full the threshold is -1 and nothing skips, matching the
        exhaustive set. Admitted sets are rank-identical to
        MaxScore/WAND (same ascending-doc candidate order, same
        tie-collapse queue, same ascending-tub float summation)."""
        from bisect import insort

        queue = TopKQueue(k)
        live = sorted(cursors, key=lambda c: c.doc_id)
        n_scored = n_block_skips = 0
        while live:
            threshold = queue.last_score() if len(queue) == k else -1.0
            acc = 0.0
            pivot = -1
            for i, c in enumerate(live):
                acc += c.tub
                if acc > threshold:
                    pivot = i
                    break
            if pivot == -1:
                break  # no remaining doc can beat the threshold
            pivot_doc = live[pivot].doc_id

            # shallow block-max check over the pivot prefix — one
            # _block_of walk per cursor serves BOTH the max and the
            # boundary (the two-pass variant doubled the hottest call
            # in the profile)
            bsum = 0.0
            d_bound = _BMW_EXHAUSTED
            for c in live[: pivot + 1]:
                j = c._block_of(pivot_doc)
                if j < c._nb:
                    bsum += c.block_max[j]
                    if c.block_last[j] < d_bound:
                        d_bound = c.block_last[j]
            if bsum <= threshold:
                # whole block range is hopeless: jump past the nearest
                # block boundary (GetNewCandidate). Every prefix cursor
                # sits at doc_id <= pivot_doc, and its current block's
                # last id is >= pivot_doc (or the sentinel), so
                # boundary+1 > pivot_doc always.
                d_next = d_bound + 1
                if pivot + 1 < len(live):
                    d_next = min(d_next, live[pivot + 1].doc_id)
                if d_next > pivot_doc:
                    # prefix cursors all sit below d_next; move the
                    # max-tub one past the dead range
                    j = max(range(pivot + 1), key=lambda i: live[i].tub)
                    c = live.pop(j)
                    n_block_skips += 1
                    if c.next_geq(d_next):
                        insort(live, c, key=lambda x: x.doc_id)
                    continue
                # else: a cursor PAST the pivot also sits on pivot_doc —
                # the prefix block-max sum does not bound the doc's true
                # score, so fall through to the classic WAND step

            if live[0].doc_id == pivot_doc:
                doc_len = self.docs.doc_len_at(self.docs.index_of(pivot_doc))
                n_at = 0
                while n_at < len(live) and live[n_at].doc_id == pivot_doc:
                    n_at += 1
                at_doc = live[:n_at]
                del live[:n_at]
                score = 0.0
                for c in sorted(at_doc, key=lambda c: c.tub):
                    score += self._score(c.tf, doc_len, lex_rows[c.term][0])
                n_scored += 1
                for c in at_doc:
                    if c.next():
                        insort(live, c, key=lambda x: x.doc_id)
                if len(queue) < k or score > queue.last_score():
                    queue.add(pivot_doc, score)
            else:
                j = -1
                best_tub = -1.0
                for i in range(pivot):
                    ci = live[i]
                    if ci.doc_id < pivot_doc and ci.tub > best_tub:
                        best_tub = ci.tub
                        j = i
                c = live.pop(j)
                if c.next_geq(pivot_doc):
                    insort(live, c, key=lambda x: x.doc_id)
        # instrumentation for tests/tuning: docs fully scored vs block
        # ranges skipped wholesale
        self.last_bmw_stats = {"scored": n_scored, "block_skips": n_block_skips}
        return queue

    def _conjunctive(self, cursors, doc_upper, lex_rows, k) -> TopKQueue:
        # QueryProcessor.processConjunctiveQuery (:329-412)
        queue = TopKQueue(k)
        threshold = 0.0
        pivot = 0
        n = len(cursors)
        current = max(c.doc_id for c in cursors)
        a_list_finished = False

        while pivot < n and not a_list_finished:
            score = 0.0
            doc_len = self.docs.doc_len_at(self.docs.index_of(current))

            for i in range(pivot, n):
                c = cursors[i]
                if not c.next_geq(current):
                    a_list_finished = True
                if c.doc_id == current:
                    score += self._score(c.tf, doc_len, lex_rows[c.term][0])
                    if not c.next():
                        a_list_finished = True
                else:
                    score = -1.0
                    break

            if score != -1.0:
                for i in range(pivot - 1, -1, -1):
                    if score + doc_upper[i] <= threshold:
                        break
                    c = cursors[i]
                    if not c.next_geq(current):
                        a_list_finished = True
                    if c.doc_id == current:
                        score += self._score(c.tf, doc_len, lex_rows[c.term][0])
                    else:
                        score = -1.0
                        break

            if score != -1.0:
                if len(queue) < k or score > queue.last_score():
                    queue.add(current, score)
                    threshold = queue.last_score() if len(queue) == k else 0.0
                    while pivot < n and doc_upper[pivot] <= threshold:
                        pivot += 1

            current = max(c.doc_id for c in cursors)
        return queue


class BruteForceOracle:
    """Exhaustive scorer used by tests: score every doc per query with the
    same BM25 and reproduce the tie-collapse top-k semantics — the oracle
    for rank-identity of the DAAT engine (SURVEY.md §5 rebuild test plan)."""

    def __init__(self, engine: QueryEngine):
        self.e = engine

    def query(self, query: str, k: int | None = None) -> list[tuple[str, float]]:
        e = self.e
        k = k if k is not None else e.config.top_k
        qtype, token_set = e.preprocess(query)
        per_doc: dict[int, float] = {}
        match_count: dict[int, int] = {}
        terms = []
        for tok in sorted(token_set):
            row = e._lexicon.get(tok)
            p = e.get_postings(tok) if row else None
            if row is None or p is None:
                if qtype == "and":
                    return []
                continue
            terms.append(tok)
            ids, tfs = p
            df = row[0]
            for d, tf in zip(ids.tolist(), tfs.tolist()):
                dl = e.docs.doc_len_at(e.docs.index_of(d))
                s = e._score(int(tf), dl, df)
                per_doc[d] = per_doc.get(d, 0.0) + s
                match_count[d] = match_count.get(d, 0) + 1
        if not terms:
            return []
        if qtype == "and":
            per_doc = {
                d: s for d, s in per_doc.items() if match_count[d] == len(terms)
            }
        queue = TopKQueue(k)
        # traversal order: ascending doc id (the DAAT frontier order)
        for d in sorted(per_doc):
            s = per_doc[d]
            if len(queue) < k or s > queue.last_score():
                queue.add(e.doc_lookup(d)[0], s)
        return queue.results()
