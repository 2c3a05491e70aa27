"""Generate golden qrels + retrieval-quality metrics for the regression
test (tests/test_quality.py).

Builds the default (stemmed) index over the sf0.001 documents corpus,
takes the exhaustive BruteForceOracle's top-QREL_DEPTH docs per driver
query as binary relevance judgments, evaluates the MaxScore DAAT engine
against them, and freezes both to tests/golden/retrieval_quality.json.
Any future change that alters the engine's ranking shifts the metrics
and fails the regression test.

Usage: python tools/gen_golden_qrels.py
"""

from __future__ import annotations

import json
import os
import sys

QREL_DEPTH = 5
K = 20
SF_DIR = "/root/testdata/sf0.001"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                   "retrieval_quality.json")


def build_and_eval(index_dir: str) -> dict:
    from invertedindex_ray.build import IndexBuilder
    from invertedindex_ray.config import IndexConfig
    from invertedindex_ray.engine import BruteForceOracle, QueryEngine
    from invertedindex_ray.functions.evaluation import evaluate_run
    from invertedindex_ray.pipelines.query_sets import DRIVER_QUERY_SET
    from invertedindex_ray.sources.pages import read_pages_from_documents

    cfg = IndexConfig()
    b = IndexBuilder(index_dir, cfg)
    if not b.manifest.stage_complete("build"):
        b.build(read_pages_from_documents(SF_DIR))
    e = QueryEngine(index_dir, cfg)
    oracle = BruteForceOracle(e)

    qrels: dict[str, list[str]] = {}
    run: dict[str, list[str]] = {}
    for qid, q in DRIVER_QUERY_SET:
        qrels[qid] = [d for d, _ in oracle.query(q, QREL_DEPTH)]
        run[qid] = [d for d, _ in e.query(q, K)]
    metrics = evaluate_run(run, qrels, ndcg_k=10)
    return {"sf_dir": SF_DIR, "qrel_depth": QREL_DEPTH, "k": K,
            "qrels": qrels, "metrics": metrics}


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    payload = build_and_eval("/tmp/iidx-golden-qrels")
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print("wrote", os.path.normpath(OUT))
    print("metrics:", payload["metrics"])
    ray.shutdown()


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    main()
