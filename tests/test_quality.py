"""Retrieval-quality regression harness (VERDICT r1 #6).

Mirrors the reference's batch evaluation (QueryProcessorTest.java:77-108:
run the query set, score against qrels, assert mAP/RR/nDCG@10). Golden
qrels were generated from the exhaustive BruteForceOracle over the
sf0.001 corpus (tools/gen_golden_qrels.py); any change that shifts the
DAAT engine's ranking moves the metrics off the frozen values and fails
here.
"""

from __future__ import annotations

import json
import math
import os

import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "retrieval_quality.json")


class TestMetricUnits:
    def test_average_precision(self):
        from invertedindex_ray.functions.evaluation import average_precision

        # rel docs at ranks 1 and 3 of 4 retrieved, 2 relevant total:
        # AP = (1/1 + 2/3) / 2
        assert average_precision(["a", "x", "b", "y"], {"a", "b"}) == pytest.approx(
            (1 + 2 / 3) / 2
        )
        assert average_precision(["x", "y"], {"a"}) == 0.0
        assert average_precision(["a"], set()) == 0.0
        # relevant but unretrieved docs still divide (trec_eval semantics)
        assert average_precision(["a"], {"a", "b"}) == pytest.approx(0.5)

    def test_reciprocal_rank(self):
        from invertedindex_ray.functions.evaluation import reciprocal_rank

        assert reciprocal_rank(["x", "a"], {"a"}) == 0.5
        assert reciprocal_rank(["a"], {"a"}) == 1.0
        assert reciprocal_rank(["x"], {"a"}) == 0.0

    def test_ndcg(self):
        from invertedindex_ray.functions.evaluation import ndcg_at_k

        # one relevant doc at rank 2, ideal at rank 1
        got = ndcg_at_k(["x", "a"], {"a"}, k=10)
        assert got == pytest.approx((1 / math.log2(3)) / (1 / math.log2(2)))
        assert ndcg_at_k(["a", "b"], {"a", "b"}, k=10) == 1.0
        assert ndcg_at_k(["x", "y"], {"a"}, k=10) == 0.0

    def test_evaluate_run_counts_missing_queries(self):
        from invertedindex_ray.functions.evaluation import evaluate_run

        m = evaluate_run({"q1": ["a"]}, {"q1": ["a"], "q2": ["b"]})
        assert m["n_queries"] == 2
        assert m["map"] == pytest.approx(0.5)


@pytest.mark.usefixtures("ray_session")
class TestGoldenRegression:
    def test_engine_metrics_match_golden(self, tmp_path):
        """Build the same index config over the same corpus and reproduce
        the frozen mAP/mRR/nDCG@10 exactly — a ranking drift fails here."""
        from invertedindex_ray.build import IndexBuilder
        from invertedindex_ray.config import IndexConfig
        from invertedindex_ray.engine import QueryEngine
        from invertedindex_ray.functions.evaluation import evaluate_run
        from invertedindex_ray.pipelines.query_sets import DRIVER_QUERY_SET
        from invertedindex_ray.sources.pages import read_pages_from_documents

        with open(GOLDEN) as f:
            golden = json.load(f)
        cfg = IndexConfig()
        idx = str(tmp_path / "golden-idx")
        IndexBuilder(idx, cfg).build(
            read_pages_from_documents(golden["sf_dir"])
        )
        e = QueryEngine(idx, cfg)
        run = {
            qid: [d for d, _ in e.query(q, golden["k"])]
            for qid, q in DRIVER_QUERY_SET
        }
        metrics = evaluate_run(run, golden["qrels"], ndcg_k=10)
        for key, want in golden["metrics"].items():
            assert metrics[key] == pytest.approx(want, abs=1e-12), key
