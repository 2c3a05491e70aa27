"""S5/S6: TREC run writer + query TSV reader (QueryProcessorTest.java:77-108)."""

from __future__ import annotations

import pyarrow as pa

from invertedindex_ray.pipelines.trec import (
    read_query_tsv,
    trec_run_table,
    write_trec_run,
)


class FakeEngine:
    """Returns two fixed results per query."""

    def __init__(self):
        self.seen = []

    def query(self, q, k):
        self.seen.append((q, k))
        return [("docA", 2.5), ("docB", 1.25)]


class TestQueryTsvReader:
    def test_reads_and_skips_malformed(self, tmp_path):
        p = tmp_path / "q.tsv"
        p.write_text("1\thello world\n\nno-tab-line\n2\tsecond query\twith tab\n")
        got = read_query_tsv(str(p))
        # tab-less and blank lines skipped; only first tab splits
        assert got == [("1", "hello world"), ("2", "second query\twith tab")]

    def test_limit(self, tmp_path):
        p = tmp_path / "q.tsv"
        p.write_text("".join(f"{i}\tq{i}\n" for i in range(10)))
        assert len(read_query_tsv(str(p), limit=3)) == 3

    def test_reference_dev_set_loads(self):
        from invertedindex_ray.pipelines.query_sets import reference_query_set

        qs = reference_query_set(limit=5)
        assert len(qs) == 5
        assert all(qid and q for qid, q in qs)


class TestTrecRun:
    def test_table_shape_and_ranks(self):
        e = FakeEngine()
        t = trec_run_table(e, [("7", "foo bar"), ("8", "baz")], k=100)
        assert t.column_names == ["qid", "q0", "doc_no", "rank", "score", "run_id"]
        assert t.num_rows == 4
        assert t["rank"].to_pylist() == [1, 2, 1, 2]
        assert t["q0"].to_pylist() == ["Q0"] * 4
        # the reference prefixes OR and uses the given k
        assert e.seen == [("OR foo bar", 100), ("OR baz", 100)]

    def test_file_format(self, tmp_path):
        e = FakeEngine()
        t = trec_run_table(e, [("7", "foo")], k=10, run_id="01")
        out = tmp_path / "run.txt"
        write_trec_run(t, str(out))
        lines = out.read_text().splitlines()
        assert lines[0] == "7 Q0 docA 1 2.5 01"
        assert lines[1] == "7 Q0 docB 2 1.25 01"
