"""Unit tests for query-engine internals: top-k tie-collapse TreeSet
semantics, posting cursor next/nextGEQ, scoring op-order."""

from __future__ import annotations

import math

import numpy as np

from invertedindex_ray.engine import PostingCursor, TopKQueue
from invertedindex_ray.functions.scoring import bm25, bm25_partial, tfidf


class TestTopKQueue:
    def test_basic_order(self):
        q = TopKQueue(3)
        q.add("a", 1.0)
        q.add("b", 3.0)
        q.add("c", 2.0)
        assert q.results() == [("b", 3.0), ("c", 2.0), ("a", 1.0)]

    def test_eviction(self):
        q = TopKQueue(2)
        for d, s in [("a", 1.0), ("b", 3.0), ("c", 2.0)]:
            q.add(d, s)
        assert q.results() == [("b", 3.0), ("c", 2.0)]

    def test_tie_collapse_keeps_first(self):
        # DocumentScore.compareTo only compares score -> TreeSet.add no-op
        q = TopKQueue(5)
        q.add("first", 2.0)
        q.add("second", 2.0)  # silently dropped
        q.add("third", 1.0)
        assert q.results() == [("first", 2.0), ("third", 1.0)]
        assert len(q) == 2  # queue can end up with < k entries

    def test_last_score(self):
        q = TopKQueue(2)
        q.add("a", 5.0)
        q.add("b", 4.0)
        assert q.last_score() == 4.0


class TestPostingCursor:
    def _c(self, ids):
        ids = np.array(ids, dtype=np.int64)
        return PostingCursor("t", 1.0, ids, np.ones(len(ids), dtype=np.int64))

    def test_next_sequence(self):
        c = self._c([2, 5, 9])
        assert c.next() and c.doc_id == 2
        assert c.next() and c.doc_id == 5
        assert c.next() and c.doc_id == 9
        assert not c.next()
        assert c.doc_id == 9  # current survives exhaustion

    def test_next_geq_exact_and_between(self):
        c = self._c([2, 5, 9, 40])
        c.next()
        assert c.next_geq(5) and c.doc_id == 5
        assert c.next_geq(6) and c.doc_id == 9
        assert c.next_geq(9) and c.doc_id == 9  # already GEQ: no move
        assert not c.next_geq(100)
        assert c.doc_id == 40  # lands on last, returns False

    def test_next_geq_backward_target_no_move(self):
        c = self._c([2, 5, 9])
        c.next()
        c.next_geq(9)
        assert c.next_geq(3) and c.doc_id == 9


class TestScoring:
    def test_bm25_formula(self):
        # (tf/(k1*((1-b)+b*dl/avg)+tf)) * ln(N/df), ScoringFunctions.java:7-12
        got = bm25(tf=3, doc_len=10, df=5, num_docs=100, avg_doc_len=20.0)
        expected = (3 / ((1.2 * ((1 - 0.75) + 0.75 * (10 / 20.0))) + 3)) * math.log(
            100 / 5
        )
        assert got == expected  # bit-identical

    def test_partial_times_idf_equals_bm25(self):
        tf, dl, df, n, avg = 7, 33, 12, 1000, 27.5
        partial = bm25_partial([tf], [dl], avg)[0]
        assert partial * math.log(n / df) == bm25(tf, dl, df, n, avg)

    def test_max_commutes_with_idf(self):
        rng = np.random.default_rng(3)
        tf = rng.integers(1, 50, 1000)
        dl = rng.integers(1, 500, 1000)
        partial = bm25_partial(tf, dl, 120.0)
        idf = math.log(1e6 / 321)
        assert (partial * idf).max() == partial.max() * idf

    def test_tfidf(self):
        assert tfidf(4, 10, 1000) == math.log(1000 / 10) * (1 + math.log(4))
