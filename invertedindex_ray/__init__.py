"""invertedindex_ray — a Ray-Data-native full-text inverted-index engine.

A from-scratch rebuild of the capabilities of terranovaa/InvertedIndex
(SPIMI-style index builder + BM25 DAAT query processor, see SURVEY.md)
expressed as idiomatic Ray Data pipelines over Arrow batches:

- ``build.IndexBuilder``   — read_parquet(pages) -> tokenize/stem map_batches
  -> deterministic doc-id assignment -> postings explode -> bucketed
  groupby shuffle -> per-(term, doc-partition) compressed posting segments
  + global lexicon + doc table + collection stats, with a resume manifest.
- ``engine.QueryEngine``   — conjunctive/disjunctive top-k BM25 retrieval,
  document-at-a-time with MaxScore pruning, chained per-partition posting
  cursors, LRU result cache.
- ``pipelines/``           — large-scale training-data ops (dedup family,
  ANN similarity search, text analysis, multimodal plumbing).

Nothing in this package calls ray.init()/ray.shutdown(); sessions are owned
by bench.py / tests / the driver.
"""

from invertedindex_ray.config import IndexConfig

__all__ = ["IndexConfig"]
__version__ = "0.2.1"
