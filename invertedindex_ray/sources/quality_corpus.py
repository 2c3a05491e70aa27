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
_LEN_RANGE = (60, 200)            # doc length in tokens
_STRONG_TOPIC_FRAC = (0.45, 0.70)  # topic-token fraction, grade-2 docs
_WEAK_TOPIC_FRAC = (0.12, 0.30)    # topic-token fraction, grade-1 docs
_ZIPF_EXP = 1.07                   # background vocabulary skew
_TEXT_STREAM_XOR = 0x9E3779B9      # labels/texts rng-stream split


def _topic_vocab(t: int) -> np.ndarray:
    return np.array(
        [f"topic{t:03d}w{j:02d}" for j in range(_TOPIC_WORDS)], dtype=object
    )


def corpus_fingerprint(n_docs: int, *, n_topics: int = 50, seed: int = 11) -> str:
    """Short hash of EVERY generation parameter (module constants AND
    the background vocabulary content) — cache keys derived from it
    invalidate whenever anything that shapes the corpus or the qrels
    changes (the stale-cache class the bench must never hit)."""
    import hashlib

    blob = repr((
        n_docs, n_topics, seed,
        _TOPIC_WORDS, _STRONG_FRAC, _WEAK_FRAC,
        _LEN_RANGE, _STRONG_TOPIC_FRAC, _WEAK_TOPIC_FRAC,
        _ZIPF_EXP, _TEXT_STREAM_XOR,
        hashlib.sha256("\x00".join(_WORDS).encode()).hexdigest(),
    )).encode()
    return hashlib.sha256(blob).hexdigest()[:10]


def synth_graded_corpus(
    n_docs: int,
    *,
    n_topics: int = 50,
    seed: int = 11,
    queries_per_topic: int = 1,
    query_terms: int = 3,
    include_texts: bool = True,
):
    """Returns ``(pages_table, queries, qrels, grades)``:

    - ``pages_table``: Arrow (url, text) — engine-buildable pages
      (``None`` when ``include_texts=False``);
    - ``queries``: [(qid, query_text)] — ``query_terms`` words sampled
      from each topic's vocabulary;
    - ``qrels``: {qid: set(url)} — binary relevant = grade >= 1;
    - ``grades``: {qid: {url: grade}} — graded judgments (1 weak,
      2 strong) for graded nDCG.

    Labels/queries and text content come from two INDEPENDENT seeded
    streams, so ``include_texts=False`` (for a caller whose index is
    already built) reproduces byte-identical queries/qrels without
    paying for text generation.
    """
    rng_labels = np.random.default_rng(seed)
    rng_texts = np.random.default_rng(seed ^ _TEXT_STREAM_XOR)
    topic_vocabs = [_topic_vocab(t) for t in range(n_topics)]

    roll = rng_labels.random(n_docs)
    strong = roll < _STRONG_FRAC
    weak = (~strong) & (roll < _STRONG_FRAC + _WEAK_FRAC)
    topic_of = rng_labels.integers(0, n_topics, size=n_docs)
    lengths = rng_labels.integers(*_LEN_RANGE, size=n_docs)

    queries: list[tuple[str, str]] = []
    for t in range(n_topics):
        for j in range(queries_per_topic):
            words = rng_labels.choice(topic_vocabs[t], size=query_terms, replace=False)
            queries.append((f"t{t:03d}q{j}", " ".join(words)))

    urls = [f"https://quality.example.org/{i:08d}" for i in range(n_docs)]
    qrels: dict[str, set] = {qid: set() for qid, _ in queries}
    grades: dict[str, dict] = {qid: {} for qid, _ in queries}
    for i in np.flatnonzero(strong | weak):
        g = 2 if strong[i] else 1
        for j in range(queries_per_topic):
            qid = f"t{topic_of[i]:03d}q{j}"
            qrels[qid].add(urls[i])
            grades[qid][urls[i]] = g

    if not include_texts:
        return None, queries, qrels, grades

    # background tokens: ONE Zipf draw for the whole corpus (the
    # per-doc choice(p=...) loop rebuilt the vocabulary CDF 50K times —
    # same vectorization as bench_corpus.ensure_corpus)
    n_vocab = len(_WORDS)
    p = 1.0 / np.arange(1, n_vocab + 1) ** _ZIPF_EXP
    p /= p.sum()
    total = int(lengths.sum())
    words = rng_texts.choice(_WORDS, size=total, p=p)
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    texts: list[str] = []
    for i in range(n_docs):
        toks = words[offsets[i]:offsets[i + 1]]
        if strong[i] or weak[i]:
            toks = toks.copy()
            n_tok = len(toks)
            frac = (
                rng_texts.uniform(*_STRONG_TOPIC_FRAC)
                if strong[i] else rng_texts.uniform(*_WEAK_TOPIC_FRAC)
            )
            n_topic = max(1, int(round(frac * n_tok)))
            at = rng_texts.choice(n_tok, size=n_topic, replace=False)
            toks[at] = rng_texts.choice(topic_vocabs[topic_of[i]], size=n_topic)
        texts.append(" ".join(toks))

    table = pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    return table, queries, qrels, grades
