"""Round-4 hardening tests: loud bounds on driver-materializing paths
(VERDICT r3 #3), read-time column pruning (VERDICT r3 #4), and the
ADVICE r3 robustness fixes (empty-corpus quantiles, large_string lexicon
buffers)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


class TestSimilarityGuards:
    """The brute-force oracle paths must refuse LOUDLY above their
    documented bounds instead of silently OOMing the driver."""

    def test_smallest_by_vec_id_refuses_huge_n(self):
        from invertedindex_ray.pipelines.similarity import (
            SMALLEST_MAX_N,
            _smallest_by_vec_id,
        )

        with pytest.raises(ValueError, match="driver-merge bound"):
            _smallest_by_vec_id(SF, SMALLEST_MAX_N + 1)

    @pytest.mark.usefixtures("ray_session")
    def test_allpairs_refuses_over_bound_table(self, tmp_path, monkeypatch):
        """An embeddings table whose FOOTER reports more rows than
        ALLPAIRS_MAX_ROWS is rejected before any data is read."""
        import invertedindex_ray.pipelines.similarity as sim

        d = tmp_path / "sf"
        d.mkdir()
        t = pa.table(
            {
                "vec_id": pa.array([0, 1, 2], type=pa.int64()),
                "embedding": pa.array(
                    [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]],
                    type=pa.list_(pa.float32()),
                ),
            }
        )
        pq.write_table(t, str(d / "embeddings.parquet"))
        # shrink the bound rather than writing >1M rows
        monkeypatch.setattr(sim, "ALLPAIRS_MAX_ROWS", 2)
        with pytest.raises(ValueError, match="method='lsh'"):
            sim._allpairs_neardup(str(d), tau=0.9)

    @pytest.mark.usefixtures("ray_session")
    def test_allpairs_still_works_under_bound(self, tmp_path):
        from invertedindex_ray.pipelines.similarity import _allpairs_neardup

        d = tmp_path / "sf"
        d.mkdir()
        t = pa.table(
            {
                "vec_id": pa.array([0, 1, 2], type=pa.int64()),
                "embedding": pa.array(
                    [[1.0, 0.0], [1.0, 0.001], [0.0, 1.0]],
                    type=pa.list_(pa.float32()),
                ),
            }
        )
        pq.write_table(t, str(d / "embeddings.parquet"))
        rows = _allpairs_neardup(str(d), tau=0.99).take_all()
        pairs = {(r["vec_a"], r["vec_b"]) for r in rows}
        assert pairs == {(0, 1)}


class TestCliReadPruning:
    def test_pages_read_columns_drops_crawl_metadata(self, tmp_path):
        """The ingest read must project to url/text(/html) at the READ —
        warc_ts / lang / junk columns never leave storage."""
        from invertedindex_ray.__main__ import pages_read_columns

        p = tmp_path / "pages.parquet"
        t = pa.table(
            {
                "url": pa.array(["u1"], type=pa.string()),
                "warc_ts": pa.array([0], type=pa.int64()),
                "html": pa.array([b"<p>x</p>"], type=pa.binary()),
                "text": pa.array(["x"], type=pa.string()),
                "lang": pa.array(["en"], type=pa.string()),
            }
        )
        pq.write_table(t, str(p))
        assert pages_read_columns(str(p)) == ["url", "text", "html"]

    def test_pages_read_columns_no_html(self, tmp_path):
        from invertedindex_ray.__main__ import pages_read_columns

        p = tmp_path / "pages.parquet"
        t = pa.table(
            {
                "url": pa.array(["u1"], type=pa.string()),
                "text": pa.array(["x"], type=pa.string()),
                "lang": pa.array(["en"], type=pa.string()),
            }
        )
        pq.write_table(t, str(p))
        assert pages_read_columns(str(p)) == ["url", "text"]


@pytest.mark.usefixtures("ray_session")
class TestAdviceFixes:
    def test_length_quantiles_empty_corpus(self, tmp_path):
        """ADVICE r3: an empty corpus returns an empty (q, n_tokens)
        frame, not IndexError."""
        from invertedindex_ray.pipelines.textstats import length_quantiles

        d = tmp_path / "sf"
        d.mkdir()
        t = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "text": pa.array([], type=pa.string()),
            }
        )
        pq.write_table(t, str(d / "documents.parquet"))
        df = length_quantiles(str(d))
        assert len(df) == 0
        assert list(df.columns) == ["q", "n_tokens"]

    def test_padded_byte_matrix_large_string(self):
        """ADVICE r3: large_string (int64 offsets) must not be misread
        through the int32 buffer view."""
        from invertedindex_ray.pipelines.analytics import _padded_byte_matrix

        words = ["table", "scan", "z"]
        m_small, l_small = _padded_byte_matrix(pa.array(words, type=pa.string()))
        m_large, l_large = _padded_byte_matrix(
            pa.array(words, type=pa.large_string())
        )
        assert np.array_equal(m_small, m_large)
        assert np.array_equal(l_small, l_large)


class TestParquetNumRows:
    def test_file_and_directory_layouts(self, tmp_path):
        """Footer row counts must work for a single file AND for the
        directory-of-part-files layout (the only shape at 100 TB) —
        pq.ParquetFile on a directory raises, which broke every
        footer-sized join when the bench corpus went multi-file."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from invertedindex_ray.functions.grouping import parquet_num_rows

        single = str(tmp_path / "single.parquet")
        pq.write_table(pa.table({"x": list(range(7))}), single)
        assert parquet_num_rows(single) == 7

        d = tmp_path / "documents.parquet"
        d.mkdir()
        pq.write_table(pa.table({"x": [1, 2, 3]}), str(d / "part-0.parquet"))
        pq.write_table(pa.table({"x": [4, 5]}), str(d / "part-1.parquet"))
        (d / "_SUCCESS").write_text("")  # non-parquet files are ignored
        assert parquet_num_rows(str(d)) == 5


class TestReductionPartitions:
    """Round-5 fix for the VERDICT r4 #1 scale-killer: every keyed
    reduction derives its fan-out from the input row count instead of a
    hard-coded 32-way mask (one task held 1/32 of all keyed rows, so
    per-task memory grew linearly with input)."""

    def test_floor_is_32(self):
        from invertedindex_ray.functions.grouping import reduction_partitions

        assert reduction_partitions(0) == 32
        assert reduction_partitions(1) == 32
        # every small-SF oracle keeps its exact round-4 partitioning
        assert reduction_partitions(2_000_000 * 32) == 32

    def test_grows_with_input_rows(self):
        from invertedindex_ray.functions.grouping import reduction_partitions

        small = reduction_partitions(10_000)
        big = reduction_partitions(1_000_000_000)
        huge = reduction_partitions(1_000_000_000_000)
        assert small < big < huge
        # bounded per-task rows once above the floor
        for n_rows in (10**8, 10**9, 10**10):
            n = reduction_partitions(n_rows)
            assert n_rows / n <= 2_000_000

    def test_power_of_two_and_capped(self):
        from invertedindex_ray.functions.grouping import reduction_partitions

        for n_rows in (0, 10**6, 10**9, 10**14):
            n = reduction_partitions(n_rows)
            assert n & (n - 1) == 0
        assert reduction_partitions(10**18) == 65536

    def test_table_partitions_reads_footer_only(self, tmp_path):
        from invertedindex_ray.functions.grouping import table_partitions

        t = pa.table({"x": pa.array(np.arange(1000), type=pa.int64())})
        pq.write_table(t, tmp_path / "docs.parquet")
        assert table_partitions(str(tmp_path / "docs.parquet")) == 32
        # expansion factor pushes the estimate across the doubling bound
        assert table_partitions(
            str(tmp_path / "docs.parquet"), expand=2_000_000
        ) > 32

    def test_grouped_partitions_rejects_non_power_of_two(self):
        from invertedindex_ray.functions.grouping import grouped_partitions

        with pytest.raises(ValueError, match="power of two"):
            grouped_partitions(None, None, None,
                               pa.schema([("x", pa.int64())]),
                               n_partitions=33)


@pytest.mark.usefixtures("ray_session")
class TestGroupbyEmptySplits:
    """Documents the round-5 finding behind the bench-tail schema
    warnings (VERDICT r4 "What's wrong" #3): Ray's sort-based groupby
    emits schema-less EMPTY blocks for barren output splits — with NO
    library code involved — and the executor logs a RefBundle schema
    warning per affected operator. The rows themselves are unaffected;
    the warning is filtered in bench.py only. The actionable half of
    the r4 warning tail (pa.Schema.__hash__ raising on the b'pandas'
    file metadata) is fixed for real in sources/io.read_parquet_clean."""

    def test_vanilla_groupby_emits_schemaless_empty_blocks(self):
        import pandas as pd
        import ray
        import ray.data as rd

        tables = [
            pa.table(
                {
                    "_p": pa.array(np.full(100, i % 3), type=pa.int32()),
                    "v": pa.array(np.arange(100), type=pa.int64()),
                }
            )
            for i in range(20)
        ]

        def gf(g: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"k": g["_p"].iloc[:1], "s": [g["v"].sum()]})

        mat = (
            rd.from_arrow(tables)
            .groupby("_p")
            .map_groups(gf, batch_format="pandas")
            .materialize()
        )
        empties = 0
        for b in mat.iter_internal_ref_bundles():
            for ref, meta in zip(b.block_refs, b.metadata):
                if meta.num_rows == 0:
                    blk = ray.get(ref)
                    # Ray-built empty split: zero columns, no schema
                    assert len(getattr(blk, "schema", blk).names) == 0
                    empties += 1
        assert empties > 0, (
            "Ray stopped emitting schema-less empty splits — drop the "
            "bench.py RefBundle log filter, it is no longer needed"
        )
        # and the aggregate itself is exact despite the empties
        got = {int(r["k"]): int(r["s"]) for r in mat.take_all()}
        assert got == {0: 7 * 4950, 1: 7 * 4950, 2: 6 * 4950}

    def test_funnel_exact_on_sparse_events_slice(self, tmp_path):
        """Regression for the empty-partition events class: a 3-user
        events table leaves almost every reduction partition barren;
        the funnel counts must still be exact and fully typed."""
        from invertedindex_ray.pipelines.relational import funnel_counts

        d = tmp_path / "sf"
        d.mkdir()
        ts0 = 1_700_000_000_000_000
        rows = {
            "event_id": pa.array(range(7), type=pa.int64()),
            "user_id": pa.array([1, 1, 1, 2, 2, 3, 3], type=pa.int64()),
            "ts": pa.array(
                [ts0 + i * 1_000_000 for i in range(7)],
                type=pa.timestamp("us"),
            ),
            "event_type": pa.array(
                ["view", "click", "purchase", "view", "click", "view", "view"],
                type=pa.string(),
            ),
            "value": pa.array([1.0] * 7, type=pa.float64()),
        }
        pq.write_table(pa.table(rows), d / "events.parquet")
        out = funnel_counts(str(d)).to_pandas().sort_values("step")
        assert list(out["n_users"]) == [3, 2, 1]
        assert out["n_users"].dtype == np.int64


class TestPositionalBucketDerivation:
    def test_bucket_count_scales_with_corpus(self, tmp_path, monkeypatch):
        from invertedindex_ray.pipelines.positional import _derived_buckets

        d = tmp_path / "sf"
        d.mkdir()
        t = pa.table({"doc_id": pa.array(np.arange(500), type=pa.int64())})
        pq.write_table(t, d / "documents.parquet")
        assert _derived_buckets(str(d)) == 32  # small corpus keeps the floor

        import invertedindex_ray.functions.grouping as g

        monkeypatch.setattr(g, "parquet_num_rows", lambda p: 100_000_000)
        assert _derived_buckets(str(d)) > 32
