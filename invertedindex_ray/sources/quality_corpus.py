"""Planted-relevance corpus for NON-CIRCULAR retrieval-quality
evaluation.

The golden-qrels harness (tests/test_quality.py) freezes the engine's
own ranking — it catches drift but cannot say whether the ranking is
GOOD. This corpus plants graded relevance at generation time, before
any ranker exists: each doc is either background noise, weakly about
one topic (grade 1), or strongly about it (grade 2), where "about"
means a controlled fraction of the doc's tokens come from the topic's
dedicated vocabulary. Queries are topic-word samples, so the ideal
ranking is known by construction and mAP/MRR/nDCG@10 measure absolute
quality — the same metric set the reference reports for BM25 over
MS MARCO dev (QueryProcessorTest.java:77-108: mAP 0.1935 / RR 0.1974 /
nDCG@10 0.2324; different corpus, so the numbers are context, not a
target).

Everything is seeded and deterministic; topic words ("topic07w12")
pass the text chain unchanged (no stopword hit, digits block stemming,
< 20 chars).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from invertedindex_ray.sources.bench_corpus import _WORDS

_TOPIC_WORDS = 30
_STRONG_FRAC = 0.10   # docs strongly about their topic (grade 2)
_WEAK_FRAC = 0.20     # docs weakly about their topic (grade 1)


def _topic_vocab(t: int) -> np.ndarray:
    return np.array(
        [f"topic{t:03d}w{j:02d}" for j in range(_TOPIC_WORDS)], dtype=object
    )


def synth_graded_corpus(
    n_docs: int,
    *,
    n_topics: int = 50,
    seed: int = 11,
    queries_per_topic: int = 1,
    query_terms: int = 3,
):
    """Returns ``(pages_table, queries, qrels, grades)``:

    - ``pages_table``: Arrow (url, text) — engine-buildable pages;
    - ``queries``: [(qid, query_text)] — ``query_terms`` words sampled
      from each topic's vocabulary;
    - ``qrels``: {qid: set(url)} — binary relevant = grade >= 1;
    - ``grades``: {qid: {url: grade}} — graded judgments (1 weak,
      2 strong) for graded nDCG.
    """
    rng = np.random.default_rng(seed)
    n_vocab = len(_WORDS)
    p = 1.0 / np.arange(1, n_vocab + 1) ** 1.07
    p /= p.sum()
    topic_vocabs = [_topic_vocab(t) for t in range(n_topics)]

    roll = rng.random(n_docs)
    strong = roll < _STRONG_FRAC
    weak = (~strong) & (roll < _STRONG_FRAC + _WEAK_FRAC)
    topic_of = rng.integers(0, n_topics, size=n_docs)
    lengths = rng.integers(60, 200, size=n_docs)

    urls = [f"https://quality.example.org/{i:08d}" for i in range(n_docs)]
    texts: list[str] = []
    for i in range(n_docs):
        n_tok = int(lengths[i])
        toks = rng.choice(_WORDS, size=n_tok, p=p)
        if strong[i] or weak[i]:
            frac = rng.uniform(0.45, 0.70) if strong[i] else rng.uniform(0.12, 0.30)
            n_topic = max(1, int(round(frac * n_tok)))
            at = rng.choice(n_tok, size=n_topic, replace=False)
            toks[at] = rng.choice(topic_vocabs[topic_of[i]], size=n_topic)
        texts.append(" ".join(toks))

    table = pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
        }
    )

    queries: list[tuple[str, str]] = []
    for t in range(n_topics):
        for j in range(queries_per_topic):
            words = rng.choice(topic_vocabs[t], size=query_terms, replace=False)
            queries.append((f"t{t:03d}q{j}", " ".join(words)))

    qrels: dict[str, set] = {qid: set() for qid, _ in queries}
    grades: dict[str, dict] = {qid: {} for qid, _ in queries}
    rel_idx = np.flatnonzero(strong | weak)
    for i in rel_idx:
        g = 2 if strong[i] else 1
        for j in range(queries_per_topic):
            qid = f"t{topic_of[i]:03d}q{j}"
            qrels[qid].add(urls[i])
            grades[qid][urls[i]] = g
    return table, queries, qrels, grades
