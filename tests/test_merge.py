"""Index merge (invertedindex_ray/merge.py): merging two shard builds
must be indistinguishable from one build over the concatenated corpus —
same lexicon, doc table, decoded postings (incl. skip metadata via the
textual mirror) and engine results. Generalizes the reference's SPIMI
block merge (BinaryIndexer.mergeBlocks, Indexer.java:70-118) to whole
persisted indexes."""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from invertedindex_ray.build import build_index
from invertedindex_ray.config import IndexConfig
from invertedindex_ray.engine import QueryEngine
from invertedindex_ray.merge import merge_indexes
from invertedindex_ray.sources.pages import synth_pages_table

N_DOCS = 120
SEED = 7
QUERIES = [
    "OR the quick brown fox",
    "OR apple banana cherry run running",
    "AND the and of",
    "OR zebra quantum",
]


def _read_dir(path: str) -> pa.Table:
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    return pa.concat_tables([pq.read_table(f) for f in files])


def _canon_lexicon(index_dir: str):
    t = _read_dir(os.path.join(index_dir, "lexicon"))
    rows = sorted(
        zip(
            t["term"].to_pylist(),
            t["df"].to_pylist(),
            t["cf"].to_pylist(),
            [round(x, 9) for x in t["tub"].to_pylist()],
        )
    )
    return rows


def _canon_doc_table(index_dir: str):
    t = _read_dir(os.path.join(index_dir, "doc_table"))
    return sorted(
        zip(t["doc_id"].to_pylist(), t["url"].to_pylist(), t["doc_len"].to_pylist())
    )


def _decoded_postings(index_dir: str, tmp: str):
    """Full decoded postings via the textual mirror (S3): term ->
    [(doc_id, tf), ...] in part order."""
    import pyarrow.csv as pacsv

    from invertedindex_ray.sources.textual_sink import dump_textual_index

    out = os.path.join(tmp, "textual-" + os.path.basename(index_dir.rstrip("/")))
    dump_textual_index(index_dir, out)
    frags = [pacsv.read_csv(f) for f in sorted(glob.glob(os.path.join(out, "*")))]
    t = pa.concat_tables(frags)
    got: dict[str, list[tuple[int, int]]] = {}
    for term, _part, ids, tfs in sorted(
        zip(
            t["term"].to_pylist(),
            t["part"].to_pylist(),
            t["doc_ids"].to_pylist(),
            t["tfs"].to_pylist(),
        )
    ):
        pairs = list(zip(map(int, str(ids).split()), map(int, str(tfs).split())))
        got.setdefault(term, []).extend(pairs)
    return got


def _split_pages(table: pa.Table, d: str) -> tuple[str, str]:
    half = table.num_rows // 2
    pa_dir, pb_dir = os.path.join(d, "pa"), os.path.join(d, "pb")
    for p, tbl in ((pa_dir, table.slice(0, half)), (pb_dir, table.slice(half))):
        os.makedirs(p, exist_ok=True)
        pq.write_table(tbl, os.path.join(p, "pages.parquet"))
    return pa_dir, pb_dir


def _build(pages_path: str, idx_dir: str, cfg: IndexConfig):
    import ray.data as rd

    pages = rd.read_parquet(pages_path, columns=["url", "text"])
    return build_index(pages, idx_dir, cfg, tokenize_concurrency=2)


@pytest.fixture(scope="module", params=["dense", "hash"])
def merged(request, ray_session, tmp_path_factory):
    """Build full + two shards + merged, for both id modes."""
    id_mode = request.param
    cfg = IndexConfig(num_doc_partitions=2, num_buckets=8, id_mode=id_mode)
    d = str(tmp_path_factory.mktemp(f"merge-{id_mode}"))
    table = synth_pages_table(N_DOCS, seed=SEED)
    full_pages = os.path.join(d, "full")
    os.makedirs(full_pages, exist_ok=True)
    pq.write_table(table, os.path.join(full_pages, "pages.parquet"))
    pa_dir, pb_dir = _split_pages(table, d)

    full_idx = os.path.join(d, "idx_full")
    idx_a = os.path.join(d, "idx_a")
    idx_b = os.path.join(d, "idx_b")
    stats_full = _build(full_pages, full_idx, cfg)
    _build(pa_dir, idx_a, cfg)
    _build(pb_dir, idx_b, cfg)

    merged_idx = os.path.join(d, "idx_merged")
    stats_merged = merge_indexes(idx_a, idx_b, merged_idx)
    return d, cfg, full_idx, merged_idx, stats_full, stats_merged, idx_a, idx_b


class TestMergeEquivalence:
    def test_stats_identical(self, merged):
        _, _, _, _, sf, sm, _, _ = merged
        assert (sf.num_docs, sf.total_tokens) == (sm.num_docs, sm.total_tokens)
        assert sf.avg_doc_len == pytest.approx(sm.avg_doc_len, rel=0, abs=0)

    def test_lexicon_identical(self, merged):
        _, _, full_idx, merged_idx, *_ = merged
        assert _canon_lexicon(merged_idx) == _canon_lexicon(full_idx)

    def test_doc_table_identical(self, merged):
        _, _, full_idx, merged_idx, *_ = merged
        assert _canon_doc_table(merged_idx) == _canon_doc_table(full_idx)

    def test_decoded_postings_identical(self, merged, tmp_path):
        d, _, full_idx, merged_idx, *_ = merged
        tmp = str(tmp_path)
        assert _decoded_postings(merged_idx, tmp) == _decoded_postings(full_idx, tmp)

    def test_engine_results_identical(self, merged):
        _, _, full_idx, merged_idx, *_ = merged
        ef = QueryEngine(full_idx)
        em = QueryEngine(merged_idx)
        for q in QUERIES:
            assert em.query(q, k=10) == ef.query(q, k=10), q

    def test_merged_index_is_resumable_complete(self, merged):
        """The merged dir carries a complete manifest: opening and
        re-merging guards work, and a second merge to the same dir is
        refused rather than clobbering."""
        _, _, _, merged_idx, _, _, idx_a, idx_b = merged
        with pytest.raises(ValueError, match="exists and is not empty"):
            merge_indexes(idx_a, idx_b, merged_idx)


class TestMergeGuards:
    def test_fingerprint_mismatch_raises(self, ray_session, tmp_path):
        table = synth_pages_table(40, seed=3)
        pa_dir, pb_dir = _split_pages(table, str(tmp_path))
        ia, ib = str(tmp_path / "ia"), str(tmp_path / "ib")
        _build(pa_dir, ia, IndexConfig(num_buckets=4, stemming=True))
        _build(pb_dir, ib, IndexConfig(num_buckets=4, stemming=False))
        with pytest.raises(ValueError, match="fingerprints differ"):
            merge_indexes(ia, ib, str(tmp_path / "out"))

    def test_unbuilt_input_raises(self, tmp_path):
        os.makedirs(tmp_path / "empty_a")
        os.makedirs(tmp_path / "empty_b")
        with pytest.raises(ValueError, match="config.json missing"):
            merge_indexes(
                str(tmp_path / "empty_a"),
                str(tmp_path / "empty_b"),
                str(tmp_path / "out"),
            )

    def test_hash_mode_duplicate_doc_raises(self, ray_session, tmp_path):
        """Hash ids are content-derived: the same url in both shards
        would corrupt the merged posting lists, so the merge must fail
        loudly, not silently double-count."""
        cfg = IndexConfig(num_buckets=4, id_mode="hash")
        table = synth_pages_table(40, seed=3)
        pa_dir = str(tmp_path / "pa")
        os.makedirs(pa_dir)
        pq.write_table(table.slice(0, 24), os.path.join(pa_dir, "pages.parquet"))
        pb_dir = str(tmp_path / "pb")
        os.makedirs(pb_dir)
        # overlap: docs 20..24 appear in BOTH shards
        pq.write_table(table.slice(20), os.path.join(pb_dir, "pages.parquet"))
        ia, ib = str(tmp_path / "ia"), str(tmp_path / "ib")
        _build(pa_dir, ia, cfg)
        _build(pb_dir, ib, cfg)
        with pytest.raises(Exception, match="both indexes|duplicate doc id"):
            merge_indexes(ia, ib, str(tmp_path / "out"))


@pytest.fixture(scope="module", params=["dense", "hash"])
def deleted(request, ray_session, tmp_path_factory):
    """Full build, fresh build over the remainder, and delete_docs
    output, for both id modes. Deletes every 3rd doc id."""
    import numpy as np
    import pyarrow.compute as pc

    from invertedindex_ray.merge import delete_docs

    id_mode = request.param
    cfg = IndexConfig(num_doc_partitions=2, num_buckets=8, id_mode=id_mode)
    d = str(tmp_path_factory.mktemp(f"del-{id_mode}"))
    table = synth_pages_table(N_DOCS, seed=SEED)
    full_pages = os.path.join(d, "full")
    os.makedirs(full_pages)
    pq.write_table(table, os.path.join(full_pages, "pages.parquet"))
    full_idx = os.path.join(d, "idx_full")
    _build(full_pages, full_idx, cfg)

    dtf = _read_dir(os.path.join(full_idx, "doc_table"))
    all_ids = np.sort(dtf["doc_id"].to_numpy())
    dels = all_ids[::3]
    urls_del = set(
        dtf.filter(pc.is_in(dtf["doc_id"], value_set=pa.array(dels)))["url"].to_pylist()
    )
    keep = [u not in urls_del for u in table["url"].to_pylist()]
    rem_pages = os.path.join(d, "rem")
    os.makedirs(rem_pages)
    pq.write_table(table.filter(pa.array(keep)), os.path.join(rem_pages, "pages.parquet"))
    fresh_idx = os.path.join(d, "idx_fresh")
    _build(rem_pages, fresh_idx, cfg)

    del_idx = os.path.join(d, "idx_del")
    stats = delete_docs(full_idx, del_idx, dels)
    return d, full_idx, fresh_idx, del_idx, stats, dels


class TestDeleteEquivalence:
    """delete_docs output must be bit-equal to a fresh build over the
    remaining corpus (dense: survivors re-densified in ingestion order;
    hash: content-derived ids unchanged)."""

    def test_lexicon_identical(self, deleted):
        _, _, fresh_idx, del_idx, *_ = deleted
        assert _canon_lexicon(del_idx) == _canon_lexicon(fresh_idx)

    def test_doc_table_identical(self, deleted):
        _, _, fresh_idx, del_idx, *_ = deleted
        assert _canon_doc_table(del_idx) == _canon_doc_table(fresh_idx)

    def test_decoded_postings_identical(self, deleted, tmp_path):
        _, _, fresh_idx, del_idx, *_ = deleted
        tmp = str(tmp_path)
        assert _decoded_postings(del_idx, tmp) == _decoded_postings(fresh_idx, tmp)

    def test_engine_results_identical(self, deleted):
        _, _, fresh_idx, del_idx, *_ = deleted
        ed, ef = QueryEngine(del_idx), QueryEngine(fresh_idx)
        for q in QUERIES:
            assert ed.query(q, k=10) == ef.query(q, k=10), q

    def test_stats_updated(self, deleted):
        _, full_idx, _, _, stats, dels = deleted
        from invertedindex_ray.build import CollectionStats

        old = CollectionStats.load(full_idx)
        assert stats.num_docs == old.num_docs - len(dels)
        assert stats.total_tokens < old.total_tokens

    def test_unknown_id_raises(self, deleted, tmp_path):
        from invertedindex_ray.merge import delete_docs

        _, full_idx, *_ = deleted
        with pytest.raises(ValueError, match="unknown doc ids"):
            delete_docs(full_idx, str(tmp_path / "out"), [10**15])


class TestUpsert:
    def test_upsert_equals_fresh_build(self, ray_session, tmp_path):
        """Hash-mode upsert (delete stale ids + merge delta) must be
        bit-equal to a fresh build over the updated corpus: 10 docs
        replaced with new text (same urls), 10 brand-new docs added."""
        import numpy as np

        from invertedindex_ray.merge import upsert_docs

        cfg = IndexConfig(num_doc_partitions=2, num_buckets=8, id_mode="hash")
        base_tbl = synth_pages_table(100, seed=7)
        delta_new = synth_pages_table(130, seed=7).slice(100, 30)

        # updated docs: urls of rows 30..39 with DIFFERENT text (from a
        # different seed), plus 30 genuinely new urls
        alt = synth_pages_table(100, seed=9)
        updated = pa.table(
            {
                "url": base_tbl["url"].slice(30, 10),
                "warc_ts": base_tbl["warc_ts"].slice(30, 10),
                "html": alt["html"].slice(30, 10),
                "text": alt["text"].slice(30, 10),
                "lang": base_tbl["lang"].slice(30, 10),
            }
        ).select(base_tbl.column_names)
        delta_tbl = pa.concat_tables(
            [updated, delta_new.select(base_tbl.column_names)]
        )

        d = str(tmp_path)
        for name, tbl in (("base", base_tbl), ("delta", delta_tbl)):
            os.makedirs(os.path.join(d, name))
            pq.write_table(tbl, os.path.join(d, name, "pages.parquet"))
        base_idx = os.path.join(d, "idx_base")
        _build(os.path.join(d, "base"), base_idx, cfg)

        import ray.data as rd

        out_idx = os.path.join(d, "idx_upserted")
        stats = upsert_docs(
            base_idx,
            out_idx,
            rd.read_parquet(os.path.join(d, "delta"), columns=["url", "text"]),
            scratch_dir=os.path.join(d, "scratch"),
        )

        # fresh build over the updated corpus
        keep = [i for i in range(100) if not (30 <= i < 40)]
        updated_corpus = pa.concat_tables(
            [base_tbl.take(pa.array(keep)), delta_tbl]
        )
        os.makedirs(os.path.join(d, "updated"))
        pq.write_table(updated_corpus, os.path.join(d, "updated", "pages.parquet"))
        fresh_idx = os.path.join(d, "idx_fresh")
        _build(os.path.join(d, "updated"), fresh_idx, cfg)

        assert _canon_lexicon(out_idx) == _canon_lexicon(fresh_idx)
        assert _canon_doc_table(out_idx) == _canon_doc_table(fresh_idx)
        eu, ef = QueryEngine(out_idx), QueryEngine(fresh_idx)
        for q in QUERIES:
            assert eu.query(q, k=10) == ef.query(q, k=10), q
        from invertedindex_ray.build import CollectionStats

        fresh_stats = CollectionStats.load(fresh_idx)
        assert stats.num_docs == fresh_stats.num_docs
        assert stats.total_tokens == fresh_stats.total_tokens

    def test_upsert_refuses_dense_mode(self, ray_session, tmp_path):
        from invertedindex_ray.merge import upsert_docs

        cfg = IndexConfig(num_buckets=4, id_mode="dense")
        tbl = synth_pages_table(20, seed=3)
        os.makedirs(tmp_path / "p")
        pq.write_table(tbl, str(tmp_path / "p" / "pages.parquet"))
        idx = str(tmp_path / "idx")
        _build(str(tmp_path / "p"), idx, cfg)
        import ray.data as rd

        with pytest.raises(ValueError, match="id_mode='hash'"):
            upsert_docs(idx, str(tmp_path / "out"),
                        rd.read_parquet(str(tmp_path / "p")))
