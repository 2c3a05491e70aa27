"""Unit tests for the out-of-core stores (state/disktables.py): row-group
binary search over multi-file / multi-row-group layouts, boundary terms,
and positional doc-table fetch — no Ray needed."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from invertedindex_ray.state.disktables import DocTable, Lexicon


def _write_lexicon(d: str, terms: list[str], row_group_size: int, n_files: int = 1):
    os.makedirs(d, exist_ok=True)
    n = len(terms)
    per = -(-n // n_files)
    for fi in range(n_files):
        chunk = terms[fi * per : (fi + 1) * per]
        if not chunk:
            continue
        t = pa.table(
            {
                "term": pa.array(chunk, type=pa.string()),
                "df": pa.array([len(s) for s in chunk], type=pa.int64()),
                "cf": pa.array([len(s) * 2 for s in chunk], type=pa.int64()),
                "tub": pa.array([float(len(s)) / 7 for s in chunk], type=pa.float64()),
            }
        )
        pq.write_table(t, os.path.join(d, f"{fi:03d}.parquet"),
                       row_group_size=row_group_size)


TERMS = sorted(
    {f"term{i:04d}" for i in range(0, 500, 3)} | {"aaa", "zzz", "mmm"}
)


class TestLexiconOndisk:
    @pytest.mark.parametrize("rg,files", [(7, 1), (16, 3), (1, 2), (1000, 1)])
    def test_every_term_found_across_layouts(self, tmp_path, rg, files):
        d = str(tmp_path / f"lex-{rg}-{files}")
        _write_lexicon(d, TERMS, rg, files)
        lex = Lexicon(d, mode="ondisk", cache_row_groups=4)
        assert lex.table is None
        for t in TERMS:
            assert lex.get(t) == (len(t), len(t) * 2, float(len(t)) / 7), t
        # misses: before the first, after the last, between row groups
        assert lex.get("a") is None
        assert lex.get("zzzz") is None
        for t in TERMS[:50]:
            assert lex.get(t + "!") is None  # "!" sorts before alnum

    def test_resident_matches_ondisk(self, tmp_path):
        d = str(tmp_path / "lex")
        _write_lexicon(d, TERMS, 13, 2)
        res = Lexicon(d, mode="resident")
        ond = Lexicon(d, mode="ondisk")
        for t in TERMS:
            assert res.get(t) == ond.get(t), t

    def test_cache_bounded(self, tmp_path):
        d = str(tmp_path / "lex")
        _write_lexicon(d, TERMS, 5, 1)
        lex = Lexicon(d, mode="ondisk", cache_row_groups=2)
        for t in TERMS:
            lex.get(t)
        assert len(lex._cache._cache) <= 2


class TestDocTableLayouts:
    def test_multi_rowgroup_positional_fetch(self, tmp_path):
        d = str(tmp_path / "dt")
        os.makedirs(d)
        n = 101
        for fi, (lo, hi) in enumerate([(0, 40), (40, 77), (77, n)]):
            ids = np.arange(lo, hi, dtype=np.int64)
            t = pa.table(
                {
                    "doc_id": pa.array(ids, type=pa.int64()),
                    "url": pa.array([f"u{i:05d}" for i in ids], type=pa.string()),
                    "doc_len": pa.array((ids % 9 + 1).astype(np.int32), type=pa.int32()),
                }
            )
            pq.write_table(t, os.path.join(d, f"part-{fi:06d}.parquet"),
                           row_group_size=16)
        dt = DocTable(d, mode="ondisk", url_cache_row_groups=2)
        assert dt.dense and dt.num_docs == n
        for i in [0, 15, 16, 39, 40, 76, 77, 100]:
            assert dt.lookup(i) == (f"u{i:05d}", i % 9 + 1)

    def test_non_dense_ids(self, tmp_path):
        d = str(tmp_path / "dt")
        os.makedirs(d)
        ids = np.array([3, 9, 27, 81, 243], dtype=np.int64)
        t = pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "url": pa.array([f"u{i}" for i in ids], type=pa.string()),
                "doc_len": pa.array(np.full(len(ids), 5, dtype=np.int32), type=pa.int32()),
            }
        )
        pq.write_table(t, os.path.join(d, "part-000000.parquet"))
        dt = DocTable(d, mode="ondisk")
        assert not dt.dense
        for i in ids:
            assert dt.lookup(int(i)) == (f"u{i}", 5)

    def test_unordered_rejected_ondisk_accepted_resident(self, tmp_path):
        d = str(tmp_path / "dt")
        os.makedirs(d)
        t = pa.table(
            {
                "doc_id": pa.array([5, 1, 3], type=pa.int64()),
                "url": pa.array(["u5", "u1", "u3"], type=pa.string()),
                "doc_len": pa.array([1, 2, 3], type=pa.int32()),
            }
        )
        pq.write_table(t, os.path.join(d, "part-000000.parquet"))
        with pytest.raises(ValueError, match="not doc-id-ordered"):
            DocTable(d, mode="ondisk")
        dt = DocTable(d, mode="resident")
        assert dt.lookup(1) == ("u1", 2)
        assert dt.lookup(5) == ("u5", 1)
