"""TREC run output (S5) and query TSV input (S6).

Mirrors the reference's batch-evaluation harness
(/root/reference/src/test/java/it/unipi/query/processor/QueryProcessorTest.java):

- ``read_query_tsv`` — the ``qid\\tquery`` TSV reader (:80-88); lines
  without a tab are skipped like the collection reader's malformed-line
  rule.
- ``trec_run_table`` / ``write_trec_run`` — the TREC run-file writer
  (:92-107): one ``qid Q0 docNo rank score runid`` line per result, rank
  starting at 1, descending score.

Query sets are tiny (thousands of rows), so these are driver-side pyarrow
helpers, not Dataset stages; the expensive part — evaluating the queries —
runs through the QueryEngine (interactive) or pipelines.batch_query
(distributed batch mode).
"""

from __future__ import annotations

import pyarrow as pa

TREC_SCHEMA = pa.schema(
    [
        ("qid", pa.string()),
        ("q0", pa.string()),
        ("doc_no", pa.string()),
        ("rank", pa.int64()),
        ("score", pa.float64()),
        ("run_id", pa.string()),
    ]
)


def read_query_tsv(path: str, limit: int | None = None) -> list[tuple[str, str]]:
    """Read a ``qid\\tquery`` TSV (QueryProcessorTest.java:80-88); skips
    blank and tab-less lines."""
    out: list[tuple[str, str]] = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or "\t" not in line:
                continue
            qid, q = line.split("\t", 1)
            out.append((qid, q))
            if limit is not None and len(out) >= limit:
                break
    return out


def trec_run_table(
    engine,
    queries: list[tuple[str, str]],
    k: int = 100,
    qtype: str = "OR",
    run_id: str = "01",
) -> pa.Table:
    """Evaluate ``queries`` with ``engine`` and return the TREC run rows.

    The reference prefixes every dev query with "OR " and uses k=100
    (QueryProcessorTest.java:96-99)."""
    qids, q0s, docs, ranks, scores, runs = [], [], [], [], [], []
    for qid, q in queries:
        for rank, (doc_no, score) in enumerate(engine.query(f"{qtype} {q}", k), 1):
            qids.append(qid)
            q0s.append("Q0")
            docs.append(doc_no)
            ranks.append(rank)
            scores.append(score)
            runs.append(run_id)
    return pa.table(
        {
            "qid": pa.array(qids, type=pa.string()),
            "q0": pa.array(q0s, type=pa.string()),
            "doc_no": pa.array(docs, type=pa.string()),
            "rank": pa.array(ranks, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
            "run_id": pa.array(runs, type=pa.string()),
        }
    )


def write_trec_run(table: pa.Table, path: str) -> None:
    """Write ``qid Q0 docNo rank score runid`` lines
    (QueryProcessorTest.java:102-105)."""
    cols = [table[c].to_pylist() for c in ("qid", "q0", "doc_no", "rank", "score", "run_id")]
    with open(path, "w", encoding="utf-8") as f:
        for qid, q0, doc, rank, score, run in zip(*cols):
            f.write(f"{qid} {q0} {doc} {rank} {score} {run}\n")
