"""End-to-end builds under each on-disk posting-stream codec
(IndexConfig.codec: vb / gamma / delta).

The reference's capability is VB only (EncodingUtils.java:14-76); the
Elias codecs are the classic bit-aligned alternatives. Parity bar: a
gamma/delta index must serve byte-for-byte the SAME postings and
rank-identical top-k as the VB index over the same corpus — the codec
is a layout knob, never a semantics knob.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from invertedindex_ray.config import IndexConfig
from invertedindex_ray.engine import QueryEngine
from invertedindex_ray.functions import codec
from invertedindex_ray.sources.pages import synth_pages_table

N_DOCS = 200
SEED = 29
CODECS = ("vb", "gamma", "delta")


class TestStreamCodecUnits:
    @given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=200))
    @settings(max_examples=50, deadline=None)
    def test_roundtrip_all_codecs(self, vals):
        v = np.asarray(vals, dtype=np.int64)
        for c in CODECS:
            blob = codec.encode_stream(v, c)
            out = codec.decode_stream(blob, c)
            np.testing.assert_array_equal(out, v)

    def test_zero_values_survive(self):
        # Elias codes encode >=1 only; the stream layer shifts +1 so the
        # 0 gaps/ids that dense doc-id streams start with round-trip
        v = np.array([0, 0, 1, 0, 7], dtype=np.int64)
        for c in CODECS:
            np.testing.assert_array_equal(
                codec.decode_stream(codec.encode_stream(v, c), c), v
            )

    def test_empty_stream(self):
        for c in CODECS:
            assert len(codec.decode_stream(codec.encode_stream(
                np.empty(0, dtype=np.int64), c), c)) == 0
            assert len(codec.decode_stream(b"", c)) == 0

    def test_unknown_codec_raises(self):
        with pytest.raises(ValueError):
            codec.encode_stream(np.array([1]), "snappy")
        with pytest.raises(ValueError):
            codec.decode_stream(b"\x00\x00\x00\x00", "snappy")
        with pytest.raises(ValueError):
            IndexConfig(codec="snappy")

    def test_decode_posting_list_dispatch(self):
        ids = np.array([0, 3, 4, 10], dtype=np.int64)
        tfs = np.array([2, 1, 5, 1], dtype=np.int64)
        gaps = np.diff(ids, prepend=0)
        for c in CODECS:
            d = codec.encode_stream(gaps, c)
            t = codec.encode_stream(tfs, c)
            out_ids, out_tfs = codec.decode_posting_list(d, t, c)
            np.testing.assert_array_equal(out_ids, ids)
            np.testing.assert_array_equal(out_tfs, tfs)


@pytest.fixture(scope="module")
def codec_builds(ray_session, tmp_path_factory):
    """One corpus, three indexes (one per codec)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from invertedindex_ray.build import build_index

    d = tmp_path_factory.mktemp("codec_builds")
    table = synth_pages_table(N_DOCS, seed=SEED)
    pages_path = str(d / "pages.parquet")
    pq.write_table(table, pages_path)
    dirs = {}
    for c in CODECS:
        cfg = IndexConfig(codec=c, num_doc_partitions=2, num_buckets=8)
        idx = str(d / f"index_{c}")
        build_index(
            rd.read_parquet(pages_path, columns=["url", "text"]),
            idx, cfg, tokenize_concurrency=2,
        )
        dirs[c] = (idx, cfg)
    return dirs


class TestCodecBuildParity:
    def test_config_roundtrip(self, codec_builds):
        for c, (idx, _) in codec_builds.items():
            assert IndexConfig.load(idx).codec == c

    def test_postings_identical_across_codecs(self, codec_builds):
        engines = {c: QueryEngine(idx, cfg) for c, (idx, cfg) in codec_builds.items()}
        ref = engines["vb"]
        terms = sorted(ref.lexicon.keys())
        assert len(terms) > 50
        for c in ("gamma", "delta"):
            e = engines[c]
            assert sorted(e.lexicon.keys()) == terms
            for t in terms:
                ids_v, tfs_v = ref.get_postings(t)
                ids_c, tfs_c = e.get_postings(t)
                np.testing.assert_array_equal(ids_c, ids_v, err_msg=f"{c}:{t}")
                np.testing.assert_array_equal(tfs_c, tfs_v, err_msg=f"{c}:{t}")

    def test_lexicon_stats_identical(self, codec_builds):
        engines = {c: QueryEngine(idx, cfg) for c, (idx, cfg) in codec_builds.items()}
        ref = engines["vb"]
        for c in ("gamma", "delta"):
            lex = engines[c].lexicon
            for t, (df, cf, tub) in ref.lexicon.items():
                df2, cf2, tub2 = lex[t]
                assert (df, cf) == (df2, cf2)
                assert tub == pytest.approx(tub2, rel=0, abs=0)

    @pytest.mark.parametrize("traversal", ["vectorized", "daat", "wand"])
    def test_topk_rank_identical(self, codec_builds, traversal):
        queries = [
            "OR web search ranking", "AND data page", "OR the quick index",
            "OR zipf corpus term document", "AND system query",
        ]
        results = {}
        for c, (idx, cfg) in codec_builds.items():
            e = QueryEngine(idx, cfg, traversal=traversal)
            results[c] = [e.query(q, k=10) for q in queries]
        for c in ("gamma", "delta"):
            for rv, rc in zip(results["vb"], results[c]):
                assert [(d, round(s, 9)) for d, s in rv] == [
                    (d, round(s, 9)) for d, s in rc
                ], f"{c} {traversal}"

    def test_lazy_cursor_traversal_matches(self, codec_builds):
        # the LazyPostingCursor path decodes per block; gamma/delta rows
        # carry no skips, so the whole list is one block — results must
        # still be identical
        for c in ("gamma", "delta"):
            idx, cfg = codec_builds[c]
            el = QueryEngine(idx, cfg, traversal="daat", cursor="lazy")
            ed = QueryEngine(idx, cfg, traversal="daat", cursor="decoded")
            for q in ("OR web data search", "AND page term"):
                assert el.query(q, k=10) == ed.query(q, k=10)

    def test_bitaligned_segments_carry_no_skips(self, codec_builds):
        import pyarrow.parquet as pq

        for c in ("gamma", "delta"):
            idx, _ = codec_builds[c]
            seg_dir = os.path.join(idx, "segments")
            for f in os.listdir(seg_dir):
                t = pq.read_table(os.path.join(seg_dir, f), columns=["skips"])
                assert all(len(b) == 0 for b in t["skips"].to_pylist())

    def test_textual_dump_identical(self, codec_builds, tmp_path, ray_session):
        from invertedindex_ray.sources.textual_sink import dump_textual_index

        outs = {}
        for c in CODECS:
            idx, _ = codec_builds[c]
            out = str(tmp_path / f"dump_{c}")
            rows = dump_textual_index(idx, out).take_all()
            outs[c] = sorted(
                (r["term"], r["part"], r["df"], r["doc_ids"], r["tfs"]) for r in rows
            )
        assert outs["gamma"] == outs["vb"]
        assert outs["delta"] == outs["vb"]


class TestCodecMerge:
    def test_merge_gamma_equals_fresh_build(self, ray_session, tmp_path):
        """merge(A,B) under codec=gamma == fresh gamma build over A+B."""
        import pyarrow.parquet as pq
        import ray.data as rd

        from invertedindex_ray.build import build_index
        from invertedindex_ray.merge import merge_indexes

        cfg = IndexConfig(codec="gamma", num_buckets=4)
        table = synth_pages_table(120, seed=31)
        a_tbl, b_tbl = table.slice(0, 70), table.slice(70)
        paths = {}
        for name, t in (("a", a_tbl), ("b", b_tbl), ("all", table)):
            p = str(tmp_path / f"pages_{name}.parquet")
            pq.write_table(t, p)
            paths[name] = p
        dirs = {}
        for name in ("a", "b", "all"):
            idx = str(tmp_path / f"idx_{name}")
            build_index(rd.read_parquet(paths[name], columns=["url", "text"]), idx, cfg)
            dirs[name] = idx
        merged = str(tmp_path / "idx_merged")
        merge_indexes(dirs["a"], dirs["b"], merged)

        em = QueryEngine(merged, cfg)
        ef = QueryEngine(dirs["all"], cfg)
        assert sorted(em.lexicon.keys()) == sorted(ef.lexicon.keys())
        for t in em.lexicon:
            np.testing.assert_array_equal(
                em.get_postings(t)[0], ef.get_postings(t)[0], err_msg=t
            )
            np.testing.assert_array_equal(
                em.get_postings(t)[1], ef.get_postings(t)[1], err_msg=t
            )


class TestConvertCodec:
    def test_convert_matches_fresh_build(self, codec_builds, tmp_path, ray_session):
        """convert_codec(vb -> gamma) must equal the fresh gamma build
        byte-for-byte on the posting streams (same runs, same order,
        same encoder), and gamma -> vb must restore the VB blobs AND
        their skip pointers."""
        import pyarrow.parquet as pq

        from invertedindex_ray.merge import convert_codec

        def stream_blobs(idx):
            rows = {}
            seg = os.path.join(idx, "segments")
            for f in sorted(os.listdir(seg)):
                t = pq.read_table(os.path.join(seg, f))
                for r in t.to_pylist():
                    rows[(r["term"], r["part"])] = (
                        r["doc_ids_vb"], r["tfs_vb"], r["skips"]
                    )
            return rows

        vb_idx, vb_cfg = codec_builds["vb"]
        g_idx, g_cfg = codec_builds["gamma"]

        conv_g = str(tmp_path / "conv_gamma")
        convert_codec(vb_idx, conv_g, "gamma")
        assert IndexConfig.load(conv_g).codec == "gamma"
        assert stream_blobs(conv_g) == stream_blobs(g_idx)

        conv_v = str(tmp_path / "conv_vb")
        convert_codec(g_idx, conv_v, "vb")
        assert stream_blobs(conv_v) == stream_blobs(vb_idx)

        # engine over the converted index is query-identical
        e_conv = QueryEngine(conv_g, IndexConfig.load(conv_g))
        e_ref = QueryEngine(vb_idx, vb_cfg)
        for q in ("OR web data search", "AND page term"):
            assert [(d, round(s, 9)) for d, s in e_conv.query(q, k=10)] == [
                (d, round(s, 9)) for d, s in e_ref.query(q, k=10)
            ]

    def test_convert_same_codec_rejected(self, codec_builds, tmp_path):
        from invertedindex_ray.merge import convert_codec

        vb_idx, _ = codec_builds["vb"]
        with pytest.raises(ValueError, match="already uses codec"):
            convert_codec(vb_idx, str(tmp_path / "x"), "vb")

    def test_convert_resumes_per_file(self, codec_builds, tmp_path, ray_session):
        """Resume semantics: a target that is a PARTIAL convert under
        the same config is resumed (already-converted segment files are
        skipped, not clobbered); any other non-empty target is refused."""
        import dataclasses

        import pyarrow.parquet as pq

        from invertedindex_ray.merge import convert_codec

        vb_idx, vb_cfg = codec_builds["vb"]

        # refused: non-empty dir that is not a partial convert
        junk = str(tmp_path / "junk")
        os.makedirs(junk)
        with open(os.path.join(junk, "stray.txt"), "w") as f:
            f.write("x")
        with pytest.raises(ValueError, match="not a partial convert"):
            convert_codec(vb_idx, junk, "gamma")

        # resumed: plant the target config + one sentinel segment file;
        # the sentinel must survive the convert untouched
        out = str(tmp_path / "resume")
        os.makedirs(os.path.join(out, "segments"))
        dataclasses.replace(vb_cfg, codec="gamma").save(out)
        seg_name = sorted(os.listdir(os.path.join(vb_idx, "segments")))[0]
        marker = os.path.join(out, "segments", seg_name)
        sentinel = pq.read_table(
            os.path.join(vb_idx, "segments", seg_name)
        ).slice(0, 1)
        pq.write_table(sentinel, marker)
        convert_codec(vb_idx, out, "gamma")
        assert pq.read_table(marker).num_rows == 1  # skipped, not rewritten
        # every OTHER bucket was converted
        assert sorted(os.listdir(os.path.join(out, "segments"))) == sorted(
            os.listdir(os.path.join(vb_idx, "segments"))
        )


class TestAssembleChunking:
    def test_chunk_boundaries_are_exact(self, monkeypatch):
        """The chunked decoder path only activates above _ASSEMBLE_CHUNK
        codes; shrink the chunk so the suite crosses boundaries on every
        run (a boundary off-by-one would otherwise only corrupt high-df
        production lists)."""
        rng = np.random.default_rng(7)
        vals = rng.integers(1, 2**40, size=1000).astype(np.uint64)
        vals[:5] = [1, 2**62, 1, 2**62, 3]  # extreme widths at a boundary
        for chunk in (1, 7, 256):
            monkeypatch.setattr(codec, "_ASSEMBLE_CHUNK", chunk)
            for enc, dec in (
                (codec.elias_gamma_encode, codec.elias_gamma_decode),
                (codec.elias_delta_encode, codec.elias_delta_decode),
            ):
                blob, bits = enc(vals)
                np.testing.assert_array_equal(dec(blob, bits), vals)
