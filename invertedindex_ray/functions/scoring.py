"""BM25 / TF-IDF scoring with the reference's exact float64 op order.

Reference: /root/reference/src/main/java/it/unipi/utils/ScoringFunctions.java:7-17,
constants Constants.java:44-46 (k1=1.2, b=0.75, natural log). Keeping the
same operation order makes scores bit-identical between Java doubles and
numpy/python float64 (IEEE-754).
"""

from __future__ import annotations

import math

import numpy as np

K1 = 1.2
B = 0.75


def bm25(tf: int, doc_len: int, df: int, num_docs: int, avg_doc_len: float,
         k1: float = K1, b: float = B) -> float:
    """Scalar BM25, op-order identical to ScoringFunctions.BM25."""
    return (tf / ((k1 * ((1 - b) + b * (doc_len / avg_doc_len))) + tf)) * math.log(
        num_docs / df
    )


def bm25_partial(tf, doc_len, avg_doc_len, k1: float = K1, b: float = B):
    """The df-independent factor tf / (k1*((1-b)+b*dl/avg) + tf), vectorized.

    BM25 = partial * ln(N/df); since ln(N/df) is a positive per-term scalar
    and IEEE multiplication by a positive constant is monotonic,
    max(partial) * idf == max(partial * idf) exactly — which lets the
    term upper bound (MaxScore, LexiconTermBinaryIndexing.java:39-57) be
    aggregated across doc partitions before the global df is known.
    """
    tf = np.asarray(tf, dtype=np.float64)
    doc_len = np.asarray(doc_len, dtype=np.float64)
    return tf / ((k1 * ((1 - b) + b * (doc_len / avg_doc_len))) + tf)


def idf(df: int, num_docs: int) -> float:
    return math.log(num_docs / df)


def tfidf(tf: int, df: int, num_docs: int) -> float:
    """ScoringFunctions.TFIDF (implemented in the reference, unused by default)."""
    return math.log(num_docs / df) * (1 + math.log(tf))
