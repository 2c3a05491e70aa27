"""Fixed deterministic query sets for driver checks and benchmarks."""

from __future__ import annotations

# Terms drawn from the driver documents-table vocabulary; includes
# missing-term AND (dead query), missing-term OR, and all-stopword cases.
DRIVER_QUERY_SET: list[tuple[str, str]] = [
    ("q01", "OR join hash merge"),
    ("q02", "AND sort merge join"),
    ("q03", "OR fast slow big small"),
    ("q04", "AND table scan filter"),
    ("q05", "OR stream window batch spark"),
    ("q06", "AND vector column"),
    ("q07", "OR data query nosuchterm999"),
    ("q08", "AND data nosuchterm999"),
    ("q09", "OR the a was"),
    ("q10", "AND customer order line group"),
]


def reference_query_set(limit: int | None = None) -> list[tuple[str, str]]:
    """The reference repo's 6,980-query MS MARCO dev set
    (/root/reference/collection/queries.dev.small.tsv, used by
    QueryProcessorTest.java:77-108). Text-only public data; used for
    query-throughput benchmarking against our synthetic corpus."""
    out = []
    with open("/root/reference/collection/queries.dev.small.tsv", encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or "\t" not in line:
                continue
            qid, q = line.split("\t", 1)
            out.append((qid, q))
            if limit and len(out) >= limit:
                break
    return out
