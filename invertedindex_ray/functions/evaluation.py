"""Retrieval-quality metrics: mAP, mean reciprocal rank, nDCG@k.

The reference's headline evaluation reports mAP 0.1935 / RR 0.1974 /
nDCG@10 0.2324 for BM25 over MS MARCO dev qrels
(/root/reference/src/test/java/it/unipi/query/processor/
QueryProcessorTest.java:77-108, documentation.pdf §5.1, computed with
trec_eval). This module implements the same binary-relevance metrics so
the rebuilt engine's ranking quality can be regression-tested against
golden qrels (tests/golden/, generated from the exhaustive scoring
oracle over the synthetic corpus).

Conventions (trec_eval parity):
- AP: mean over RELEVANT retrieved docs of precision@rank, divided by
  the TOTAL number of relevant docs (retrieved or not); 0 if the query
  has no relevant docs.
- RR: 1/rank of the first relevant retrieved doc; 0 if none retrieved.
- nDCG@k: binary gains, log2(rank+1) discount, ideal = all relevant
  docs ranked first.
"""

from __future__ import annotations

import math
from collections.abc import Iterable, Mapping, Sequence


def average_precision(ranked: Sequence[str], relevant: Iterable[str]) -> float:
    rel = set(relevant)
    if not rel:
        return 0.0
    hits = 0
    total = 0.0
    for i, doc in enumerate(ranked, 1):
        if doc in rel:
            hits += 1
            total += hits / i
    return total / len(rel)


def reciprocal_rank(ranked: Sequence[str], relevant: Iterable[str]) -> float:
    rel = set(relevant)
    for i, doc in enumerate(ranked, 1):
        if doc in rel:
            return 1.0 / i
    return 0.0


def ndcg_at_k(ranked: Sequence[str], relevant: Iterable[str], k: int = 10) -> float:
    rel = set(relevant)
    if not rel:
        return 0.0
    dcg = sum(
        1.0 / math.log2(i + 1)
        for i, doc in enumerate(ranked[:k], 1)
        if doc in rel
    )
    ideal = sum(1.0 / math.log2(i + 1) for i in range(1, min(len(rel), k) + 1))
    return dcg / ideal if ideal else 0.0


def ndcg_at_k_graded(
    ranked: Sequence[str], grades: Mapping[str, int], k: int = 10
) -> float:
    """nDCG@k with graded relevance: gain = 2^grade - 1 (trec_eval /
    Burges et al. convention), log2(rank+1) discount, ideal = docs
    sorted by descending grade."""
    pos = [g for g in grades.values() if g > 0]
    if not pos:
        return 0.0
    dcg = sum(
        (2.0 ** grades.get(doc, 0) - 1.0) / math.log2(i + 1)
        for i, doc in enumerate(ranked[:k], 1)
    )
    ideal = sum(
        (2.0 ** g - 1.0) / math.log2(i + 1)
        for i, g in enumerate(sorted(pos, reverse=True)[:k], 1)
    )
    return dcg / ideal if ideal else 0.0


def evaluate_run(
    run: Mapping[str, Sequence[str]],
    qrels: Mapping[str, Iterable[str]],
    *,
    ndcg_k: int = 10,
    grades: Mapping[str, Mapping[str, int]] | None = None,
) -> dict[str, float]:
    """run: qid -> ranked doc ids; qrels: qid -> relevant doc ids.
    Queries present in qrels but absent from the run count as zeros
    (trec_eval -c semantics). Returns {"map", "mrr", "ndcg@k", "n_queries"}.

    ``grades``: optional qid -> {doc: grade} graded judgments; when
    given, nDCG uses graded gains (AP/RR stay binary over grade >= 1,
    the trec_eval convention).
    """
    qids = sorted(qrels)
    if not qids:
        return {"map": 0.0, "mrr": 0.0, f"ndcg@{ndcg_k}": 0.0, "n_queries": 0}
    ap = rr = nd = 0.0
    for qid in qids:
        ranked = list(run.get(qid, ()))
        rel = set(qrels[qid])
        ap += average_precision(ranked, rel)
        rr += reciprocal_rank(ranked, rel)
        if grades is not None:
            nd += ndcg_at_k_graded(ranked, grades.get(qid, {}), ndcg_k)
        else:
            nd += ndcg_at_k(ranked, rel, ndcg_k)
    n = len(qids)
    return {
        "map": ap / n,
        "mrr": rr / n,
        f"ndcg@{ndcg_k}": nd / n,
        "n_queries": n,
    }


def run_from_results(results: Mapping[str, Sequence[tuple[str, float]]]) -> dict[str, list[str]]:
    """Engine output ({qid: [(doc_no, score), ...]}) -> run mapping."""
    return {qid: [d for d, _ in rows] for qid, rows in results.items()}
