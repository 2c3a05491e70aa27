"""Byte-layout exporter tests: golden record bytes vs the reference's
fixed layouts (Constants.java:34-41) and a full roundtrip on the built
index."""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from invertedindex_ray.functions import codec
from invertedindex_ray.sources.binary_export import (
    DOCUMENT_ENTRY_SIZE,
    LEXICON_ENTRY_SIZE,
    SKIP_BLOCK_DIMENSION,
    export_reference_binary,
    read_reference_binary,
)


class _FakeDocs:
    def __init__(self, urls, lens):
        self.doc_ids = None  # dense
        self.doc_len = np.asarray(lens, dtype=np.int32)
        self._urls = urls

    def lookup(self, doc_id):
        return self._urls[doc_id], int(self.doc_len[doc_id])


class _FakeStats:
    def __init__(self, n, avg):
        self.num_docs, self.avg_doc_len = n, avg


class _FakeEngine:
    """Minimal engine surface for the exporter: a long skip-bearing list
    (df=2000 > 1024) plus a short one."""

    def __init__(self):
        n = 2000
        self._postings = {
            "longterm": (np.arange(0, 2 * n, 2, dtype=np.int64), np.ones(n, dtype=np.int64)),
            "abc": (np.array([5, 9], dtype=np.int64), np.array([3, 1], dtype=np.int64)),
        }
        self.lexicon = {
            t: (len(ids), int(tfs.sum()), 1.5) for t, (ids, tfs) in self._postings.items()
        }
        urls = [f"u{i}" for i in range(2 * n)]
        self.docs = _FakeDocs(urls, np.full(2 * n, 7))
        self.stats = _FakeStats(2 * n, 7.0)

    def get_postings(self, term):
        return self._postings[term]

    def doc_lookup(self, doc_id):
        return self.docs.lookup(doc_id)


class TestGoldenLayout:
    def test_record_sizes_and_golden_bytes(self, tmp_path):
        e = _FakeEngine()
        sizes = export_reference_binary(e, str(tmp_path / "dat"))
        n_docs = 4000
        assert sizes["document_table.dat"] == n_docs * DOCUMENT_ENTRY_SIZE
        assert sizes["lexicon.dat"] == 2 * LEXICON_ENTRY_SIZE
        assert sizes["collection_statistics.dat"] == 12

        # golden first doc record: "u0" + 28 NULs + int32 0 + int32 7
        with open(tmp_path / "dat" / "document_table.dat", "rb") as f:
            rec = f.read(DOCUMENT_ENTRY_SIZE)
        assert rec == b"u0" + b"\x00" * 28 + struct.pack(">ii", 0, 7)

        # lexicon is term-sorted: "abc" first; golden bytes for its record
        with open(tmp_path / "dat" / "lexicon.dat", "rb") as f:
            lrec = f.read(LEXICON_ENTRY_SIZE)
        # abc: df=2, cf=4, offsets 0/0, sizes = VB bytes of gaps [5,4] and
        # tfs [3,1] (all single-byte VB values -> 2 bytes each)
        assert lrec == b"abc" + b"\x00" * 17 + struct.pack(
            ">iiqqiid", 2, 4, 0, 0, 2, 2, 1.5
        )
        # and those VB bytes are the reference codec's: 5->0x85, 4->0x84
        with open(tmp_path / "dat" / "postings_doc_ids.dat", "rb") as f:
            assert f.read(2) == bytes([0x85, 0x84])

    def test_skip_block_layout(self, tmp_path):
        e = _FakeEngine()
        export_reference_binary(e, str(tmp_path / "dat"))
        parsed = read_reference_binary(str(tmp_path / "dat"))
        df = 2000
        block = int(math.ceil(math.sqrt(df)))
        n_blocks = int(math.ceil(df / block))
        ids, tfs, skips = parsed["postings"]["longterm"]
        assert len(skips) == n_blocks - 1
        want_ids, want_tfs = e.get_postings("longterm")
        assert (ids == want_ids).all()
        assert (tfs == want_tfs).all()
        # each skip entry: (first absolute docId of the NEXT block,
        # cumulative VB byte offsets of the preceding blocks)
        gaps = want_ids.copy()
        gaps[1:] -= want_ids[:-1]
        _, id_ends = codec.vb_encode(gaps)
        _, tf_ends = codec.vb_encode(want_tfs)
        for i, (sdid, soff, foff) in enumerate(skips):
            end = (i + 1) * block
            assert sdid == want_ids[end]
            assert soff == id_ends[end - 1]
            assert foff == tf_ends[end - 1]
        # lexicon sizes must cover skips + encoded ids
        df_, cf_, ids_off, tfs_off, ids_size, tfs_size, tub = parsed["lexicon"][
            "longterm"
        ]
        assert ids_size == (n_blocks - 1) * SKIP_BLOCK_DIMENSION + int(id_ends[-1])
        assert tfs_size == int(tf_ends[-1])

    def test_stats_layout(self, tmp_path):
        e = _FakeEngine()
        export_reference_binary(e, str(tmp_path / "dat"))
        parsed = read_reference_binary(str(tmp_path / "dat"))
        assert parsed["stats"] == (4000, 7.0)


@pytest.mark.usefixtures("ray_session")
class TestExportRoundtripBuiltIndex:
    def test_roundtrip_matches_engine(self, tmp_path, tiny_pages):
        """Export the real built tiny index and re-parse with the
        independent decoder: every doc record, lexicon entry and posting
        list must match the engine's view."""
        import ray.data as rd

        from invertedindex_ray.build import build_index
        from invertedindex_ray.config import IndexConfig
        from invertedindex_ray.engine import QueryEngine

        cfg = IndexConfig(num_buckets=4)
        idx = str(tmp_path / "idx")
        build_index(rd.read_parquet(tiny_pages, columns=["url", "text"]), idx, cfg)
        e = QueryEngine(idx, cfg)
        out = str(tmp_path / "dat")
        export_reference_binary(e, out)
        parsed = read_reference_binary(out)

        assert parsed["stats"][0] == e.stats.num_docs
        assert parsed["stats"][1] == e.stats.avg_doc_len
        assert len(parsed["docs"]) == e.stats.num_docs
        for did, doc_no, dlen in parsed["docs"][:50]:
            url, want_len = e.doc_lookup(did)
            assert doc_no == url.encode("utf-8")[:30].decode("utf-8", "ignore")
            assert dlen == want_len

        assert set(parsed["lexicon"]) == set(e.lexicon)
        for term, (df, cf, *_rest, tub) in parsed["lexicon"].items():
            wdf, wcf, wtub = e.lexicon[term]
            assert (df, cf, tub) == (wdf, wcf, wtub), term
            ids, tfs, _ = parsed["postings"][term]
            wids, wtfs = e.get_postings(term)
            assert (ids == wids).all() and (tfs == wtfs).all(), term
