"""Driver-contract meta-invariants: every oracle has a query, the
modules import clean, and the key sets match what SURVEY.md claims."""

from __future__ import annotations

import sys


def _entry():
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    return e


class TestContractMeta:
    def test_every_oracle_key_has_a_query(self):
        e = _entry()
        q = set(e.queries().keys())
        o = set(e.oracle_sql().keys())
        missing = o - q
        assert not missing, f"oracle_sql keys without queries(): {sorted(missing)}"

    def test_oracle_coverage_floor(self):
        """Only the declared rows-only entries may lack an oracle:
        approximate-by-construction sketches and iterative algorithms."""
        e = _entry()
        q = set(e.queries().keys())
        o = set(e.oracle_sql().keys())
        rows_only = q - o
        allowed = {
            "cms_term_counts",       # approximate by construction
            "hll_distinct_terms",    # approximate by construction
            # kmeans_clusters / semantic_dedup graduated to SQL oracles
            # in r5 (Lloyd unrolled as chained CTEs — _kmeans_ctes)
            "ann_ivf_pq_topk",       # iterative PQ training (pytest-gated)
            "ann_pq_recall",         # recall probe of the PQ path
            "topk_daat",             # legacy alias kept rows-only pre-r2;
                                     # now also SQL-checked if present in o
        }
        assert rows_only <= allowed, f"unexpected rows-only entries: {sorted(rows_only - allowed)}"

    def test_queries_are_callables(self):
        e = _entry()
        for name, fn in e.queries().items():
            assert callable(fn), name

    def test_oracle_sql_is_nonempty_text(self):
        e = _entry()
        for name, sql in e.oracle_sql().items():
            assert isinstance(sql, str) and "SELECT" in sql.upper(), name
