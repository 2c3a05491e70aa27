"""Out-of-core query-side lookups: positional doc-table fetch and sorted
lexicon binary search over the on-disk parquet layout.

Mirrors the reference's design where the query processor never loads the
doc table or lexicon fully — mmap + O(1) positional access / binary
search (/root/reference/src/main/java/it/unipi/utils/
DiskDataStructuresSearch.java:22-67). Here the same roles are played by:

- ``DocTable``: ``doc_len`` is resident as one int32 numpy array (4 B/doc
  — the per-posting gather in BM25 scoring needs O(1) random access; at
  10^9 docs this is 4 GB, the analog of the reference's mmapped
  fixed-width DOCUMENT_INDEX). ``url`` strings — the dominant cost,
  50-100 B/doc — are fetched on demand: global position -> part file
  (zero-padded names, doc-id order) -> row group -> row, through a small
  LRU of decoded row-group url arrays. Engine RSS no longer scales with
  the corpus's url bytes.
- ``Lexicon``: per-row-group (min_term, max_term) ranges come from the
  parquet footers (terms are globally sorted by the build); a term lookup
  binary-searches the range index, decodes one row group (LRU-cached) and
  searchsorts inside it — the reference's lexicon binary search
  (DiskDataStructuresSearch.lexiconBinarySearch) at row-group
  granularity.

Both also offer a ``resident`` mode (everything in memory) for small
indexes and tests; ``auto`` picks by row count.
"""

from __future__ import annotations

import os
from collections import OrderedDict

import numpy as np
import pyarrow.parquet as pq

# auto mode: resident below these row counts (small index / test sizes),
# on-demand above
AUTO_RESIDENT_DOCS = 5_000_000
AUTO_RESIDENT_TERMS = 2_000_000


def _parquet_files(d: str) -> list[str]:
    return sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
    )


class _RowGroupLRU:
    """Tiny LRU of decoded row-group columns, keyed by (file_idx, rg_idx)."""

    def __init__(self, max_entries: int):
        self.max_entries = max_entries
        self._cache: OrderedDict[tuple, object] = OrderedDict()

    def get(self, key):
        v = self._cache.get(key)
        if v is not None:
            self._cache.move_to_end(key)
        return v

    def put(self, key, value):
        self._cache[key] = value
        self._cache.move_to_end(key)
        while len(self._cache) > self.max_entries:
            self._cache.popitem(last=False)


class DocTable:
    """Doc-id -> (url, doc_len) lookups over ``doc_table/part-*.parquet``.

    ``mode``: "resident" | "ondisk" | "auto" — plus "shared", reachable
    only through :meth:`from_shared`: the decoded arrays live in the Ray
    object store (put once by the driver) and every engine actor on a
    node maps the SAME plasma copy zero-copy, so N serving actors stop
    paying N disk decodes and N resident copies (VERDICT r3 #2).
    """

    @classmethod
    def export_shared(cls, doc_table_dir: str) -> dict:
        """Plasma-friendly payload: numpy arrays (zero-copy through the
        object store) + one Arrow url array (buffers out-of-band)."""
        import pyarrow as pa

        t = cls(doc_table_dir, mode="resident")
        return {
            "doc_len": t.doc_len,
            "doc_ids": t.doc_ids,
            "dense": t.dense,
            "urls": t._urls
            if t._urls is not None
            else pa.array([], type=pa.string()),
            "num_docs": t.num_docs,
        }

    @classmethod
    def from_shared(cls, payload: dict) -> "DocTable":
        self = cls.__new__(cls)
        self.dir = None
        self.files = []
        self.mode = "shared"
        self.num_docs = int(payload["num_docs"])
        self.doc_len = payload["doc_len"]
        self.doc_ids = payload["doc_ids"]
        self.dense = bool(payload["dense"])
        self._urls = payload["urls"]
        self._url_cache = _RowGroupLRU(1)
        self._file_offsets = None
        self._rg_offsets = []
        return self

    def __init__(self, doc_table_dir: str, mode: str = "auto", url_cache_row_groups: int = 64):
        self.dir = doc_table_dir
        self.files = _parquet_files(doc_table_dir)
        metas = [pq.ParquetFile(f).metadata for f in self.files]
        rows = [m.num_rows for m in metas]
        self.num_docs = int(sum(rows))
        if mode == "auto":
            mode = "resident" if self.num_docs <= AUTO_RESIDENT_DOCS else "ondisk"
        self.mode = mode
        # cumulative row offsets per file: global position -> file
        self._file_offsets = np.concatenate(([0], np.cumsum(rows))).astype(np.int64)
        # per-file row-group row offsets (for the url fetch path)
        self._rg_offsets = []
        for m in metas:
            sizes = [m.row_group(i).num_rows for i in range(m.num_row_groups)]
            self._rg_offsets.append(
                np.concatenate(([0], np.cumsum(sizes))).astype(np.int64)
            )
        # doc ids + doc lens: read WITHOUT urls (12 B/doc, the part that
        # must be random-access for scoring); detect the dense layout
        ids_parts, len_parts = [], []
        for f in self.files:
            t = pq.read_table(f, columns=["doc_id", "doc_len"])
            ids_parts.append(t["doc_id"].to_numpy(zero_copy_only=False))
            len_parts.append(t["doc_len"].to_numpy(zero_copy_only=False))
        ids = (
            np.concatenate(ids_parts).astype(np.int64)
            if ids_parts
            else np.empty(0, dtype=np.int64)
        )
        self.doc_len = (
            np.concatenate(len_parts).astype(np.int32)
            if len_parts
            else np.empty(0, dtype=np.int32)
        )
        order = None
        if len(ids) and not np.all(ids[1:] > ids[:-1]):
            # unordered layout (e.g. an externally-produced doc table):
            # normalize once; the positional url fetch cannot work then
            if self.mode == "ondisk":
                raise ValueError(
                    f"doc table at {doc_table_dir} is not doc-id-ordered; "
                    "ondisk mode needs the positional part-file layout — "
                    "rebuild the index or use mode='resident'"
                )
            order = np.argsort(ids, kind="stable")
            ids = ids[order]
            self.doc_len = self.doc_len[order]
        self.dense = bool(
            len(ids) and ids[0] == 0 and ids[-1] == len(ids) - 1
        )
        # hash mode needs the id array resident to find positions
        # (8 B/doc); dense mode drops it — position == id
        self.doc_ids = None if self.dense else ids
        self._urls = None
        self._url_cache = _RowGroupLRU(url_cache_row_groups)
        if self.mode == "resident":
            parts = [pq.read_table(f, columns=["url"])["url"] for f in self.files]
            import pyarrow as pa

            urls = (
                pa.concat_arrays([p.combine_chunks() for p in parts])
                if parts
                else pa.array([], type=pa.string())
            )
            if order is not None:
                urls = urls.take(order)
            self._urls = urls

    def index_of(self, doc_id: int) -> int:
        """Global position of a doc id (== doc_id when dense)."""
        if self.dense:
            return doc_id
        return int(np.searchsorted(self.doc_ids, doc_id))

    def doc_len_at(self, pos: int) -> int:
        return int(self.doc_len[pos])

    def url_at(self, pos: int) -> str:
        if self._urls is not None:
            return self._urls[pos].as_py()
        fi = int(np.searchsorted(self._file_offsets, pos, side="right") - 1)
        row_in_file = pos - int(self._file_offsets[fi])
        rgo = self._rg_offsets[fi]
        rg = int(np.searchsorted(rgo, row_in_file, side="right") - 1)
        key = (fi, rg)
        col = self._url_cache.get(key)
        if col is None:
            col = (
                pq.ParquetFile(self.files[fi])
                .read_row_group(rg, columns=["url"])["url"]
                .combine_chunks()
            )
            self._url_cache.put(key, col)
        return col[row_in_file - int(rgo[rg])].as_py()

    def lookup(self, doc_id: int) -> tuple[str, int]:
        pos = self.index_of(doc_id)
        return self.url_at(pos), int(self.doc_len[pos])


class Lexicon:
    """term -> (df, cf, tub) over the sorted ``lexicon/*.parquet``.

    ``mode``: "resident" | "ondisk" | "auto" — plus "shared" (see
    :meth:`from_shared`): terms live as one fixed-width ``|S`` bytes
    matrix in the object store (UTF-8, null-padded — byte order equals
    code-point order, so the build's Python-str sort is preserved) and
    lookups binary-search it zero-copy. A dict of 1 M+ interned Python
    strings cannot be shared across actor processes; a numpy bytes
    array can.
    """

    @classmethod
    def export_shared(cls, lexicon_dir: str) -> dict:
        files = _parquet_files(lexicon_dir)
        terms_l, dfs, cfs, tubs = [], [], [], []
        for f in files:
            t = pq.read_table(f, columns=["term", "df", "cf", "tub"])
            terms_l.extend(s.encode("utf-8") for s in t["term"].to_pylist())
            dfs.append(t["df"].to_numpy(zero_copy_only=False))
            cfs.append(t["cf"].to_numpy(zero_copy_only=False))
            tubs.append(t["tub"].to_numpy(zero_copy_only=False))
        terms = np.asarray(terms_l, dtype=np.bytes_)  # minimal |S width
        if len(terms) and not np.all(terms[:-1] <= terms[1:]):
            # files may interleave term ranges; normalize to one sorted run
            order = np.argsort(terms, kind="stable")
            terms = terms[order]
            df = np.concatenate(dfs)[order]
            cf = np.concatenate(cfs)[order]
            tub = np.concatenate(tubs)[order]
        else:
            df = np.concatenate(dfs) if dfs else np.empty(0, dtype=np.int64)
            cf = np.concatenate(cfs) if cfs else np.empty(0, dtype=np.int64)
            tub = np.concatenate(tubs) if tubs else np.empty(0, dtype=np.float64)
        return {
            "terms": terms,
            "df": df.astype(np.int64),
            "cf": cf.astype(np.int64),
            "tub": tub.astype(np.float64),
        }

    @classmethod
    def from_shared(cls, payload: dict) -> "Lexicon":
        self = cls.__new__(cls)
        self.dir = None
        self.mode = "shared"
        self.table = None
        self._shared = payload
        self.num_terms = len(payload["terms"])
        self._pfs = {}
        self._ranges = []
        self._range_min = []
        self._cache = _RowGroupLRU(1)
        return self

    def _get_shared(self, term: str) -> tuple[int, int, float] | None:
        p = self._shared
        terms: np.ndarray = p["terms"]
        key = term.encode("utf-8")
        if len(terms) == 0 or len(key) > terms.dtype.itemsize:
            # longer than every stored term -> cannot be present
            return None
        j = int(np.searchsorted(terms, np.bytes_(key)))
        if j >= len(terms) or terms[j] != key:
            return None
        return int(p["df"][j]), int(p["cf"][j]), float(p["tub"][j])

    def __init__(self, lexicon_dir: str, mode: str = "auto", cache_row_groups: int = 256):
        self.dir = lexicon_dir
        files = _parquet_files(lexicon_dir)
        # build the row-group range index from footers only (no data read):
        # (file, rg, min_term, max_term); files may be written in any name
        # order, so sort ranges by min_term
        ranges = []
        self._pfs = {}
        total_rows = 0
        for f in files:
            pf = pq.ParquetFile(f)
            self._pfs[f] = pf
            md = pf.metadata
            total_rows += md.num_rows
            idx = md.schema.to_arrow_schema().get_field_index("term")
            for rg in range(md.num_row_groups):
                rgm = md.row_group(rg)
                if rgm.num_rows == 0:
                    continue
                stats = rgm.column(idx).statistics
                if stats is None or stats.min is None:
                    # footers without string stats: fall back to reading
                    # the first/last term of the group
                    t = pf.read_row_group(rg, columns=["term"])["term"]
                    mn, mx = t[0].as_py(), t[-1].as_py()
                else:
                    mn, mx = stats.min, stats.max
                ranges.append((mn, mx, f, rg))
        ranges.sort(key=lambda r: r[0])
        self.num_terms = total_rows
        self._range_min = [r[0] for r in ranges]
        self._ranges = ranges
        if mode == "auto":
            mode = "resident" if total_rows <= AUTO_RESIDENT_TERMS else "ondisk"
        self.mode = mode
        self._cache = _RowGroupLRU(cache_row_groups)
        self.table: dict[str, tuple[int, int, float]] | None = None
        if mode == "resident":
            t = pq.read_table(lexicon_dir)
            self.table = {
                tm: (int(d), int(c), float(u))
                for tm, d, c, u in zip(
                    t["term"].to_pylist(),
                    t["df"].to_numpy(zero_copy_only=False),
                    t["cf"].to_numpy(zero_copy_only=False),
                    t["tub"].to_numpy(zero_copy_only=False),
                )
            }

    def _load_group(self, f: str, rg: int):
        key = (f, rg)
        g = self._cache.get(key)
        if g is None:
            t = self._pfs[f].read_row_group(rg, columns=["term", "df", "cf", "tub"])
            terms = np.asarray(t["term"].to_pylist(), dtype=object)
            g = (
                terms,
                t["df"].to_numpy(zero_copy_only=False),
                t["cf"].to_numpy(zero_copy_only=False),
                t["tub"].to_numpy(zero_copy_only=False),
            )
            self._cache.put(key, g)
        return g

    def get(self, term: str) -> tuple[int, int, float] | None:
        if self.table is not None:
            return self.table.get(term)
        if self.mode == "shared":
            return self._get_shared(term)
        from bisect import bisect_right

        i = bisect_right(self._range_min, term) - 1
        if i < 0:
            return None
        mn, mx, f, rg = self._ranges[i]
        if term > mx:
            return None
        terms, df, cf, tub = self._load_group(f, rg)
        j = int(np.searchsorted(terms, term))
        if j >= len(terms) or terms[j] != term:
            return None
        return int(df[j]), int(cf[j]), float(tub[j])
