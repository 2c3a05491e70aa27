"""The canonical web-pages input table (BASELINE.json input_hint):

    (url: string, warc_ts: timestamp[us], html: binary, text: string,
     lang: string)

Two deterministic producers:

- :func:`synth_pages_table` — seeded synthetic corpus for tests/benches
  (FIXTURES.md §1): Zipf head terms, stopword noise, punctuation/Unicode,
  >20-char tokens, empty and stopword-only docs.
- :func:`pages_from_documents` — derive a pages Dataset from the driver's
  ``documents`` parquet (TESTDATA.md) so driver-checked queries run over
  the mandated shape. The mapping is pure/deterministic per row.

Plays the role of the reference's tar.gz TSV collection reader
(/root/reference/src/main/java/it/unipi/indexer/Indexer.java:57-84); with
Ray Data, streaming decompression/splitting/parallel reads come from
``ray.data.read_parquet``.
"""

from __future__ import annotations

from invertedindex_ray.sources.io import read_parquet_clean as _rpq

import numpy as np
import pyarrow as pa

_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_VOCAB_COMMON = [
    "data", "index", "search", "query", "page", "web", "crawl", "link",
    "site", "text", "word", "time", "user", "info", "news", "home",
]
_VOCAB_MID = [
    "ranking", "retrieval", "posting", "lexicon", "compression", "pointer",
    "frequency", "document", "partition", "shuffle", "streaming", "cluster",
    "running", "jumped", "quickly", "happily", "nationally", "generously",
    "conditional", "relational", "adjustment", "hopefulness", "electrical",
    "communities", "generated", "apply", "flies", "cries", "agreed",
]
_STOP_SAMPLE = [
    "the", "and", "of", "a", "to", "is", "in", "it", "that", "for", "was",
    "on", "are", "with", "as", "at", "by", "this",
]
_NOISE = [
    "café", "naïve", "überlong", "λambda", "résumé", "東京",
    "supercalifragilisticexpialidocious", "antidisestablishmentarianism",
    "a" * 25, "x1y2z3q4w5e6r7t8y9u0extra",
]


def synth_pages_texts(n_docs: int, seed: int = 42) -> list[str]:
    """Deterministic document bodies (see FIXTURES.md §1)."""
    rng = np.random.default_rng(seed)
    texts: list[str] = []
    zipf_p = 1.0 / np.arange(1, len(_VOCAB_COMMON) + 1)
    zipf_p /= zipf_p.sum()
    for i in range(n_docs):
        r = rng.random()
        if r < 0.02:
            texts.append("")  # empty doc: consumes no doc id
            continue
        if r < 0.04:
            texts.append(" ".join(rng.choice(_STOP_SAMPLE, size=6)))  # stopword-only
            continue
        n_tokens = int(rng.integers(5, 60))
        words = []
        for _ in range(n_tokens):
            u = rng.random()
            if u < 0.45:
                words.append(str(rng.choice(_VOCAB_COMMON, p=zipf_p)))
            elif u < 0.70:
                words.append(str(rng.choice(_VOCAB_MID)))
            elif u < 0.90:
                words.append(str(rng.choice(_STOP_SAMPLE)))
            else:
                words.append(str(rng.choice(_NOISE)))
        body = " ".join(words)
        if rng.random() < 0.2:
            body = "?" + body + "!!!"  # leading/trailing separators
        if rng.random() < 0.1:
            body = body.replace(" ", ",  ", 1)
        texts.append(body)
    return texts


def synth_pages_table(n_docs: int, seed: int = 42) -> pa.Table:
    texts = synth_pages_texts(n_docs, seed)
    urls = [f"https://example.org/p/{seed}/{i:08d}" for i in range(n_docs)]
    ts = pa.array(
        np.arange(n_docs, dtype=np.int64) * 1_000_000 + _EPOCH_US, type=pa.timestamp("us")
    )
    html = pa.array(
        [b"<html><body>" + t.encode("utf-8") + b"</body></html>" for t in texts],
        type=pa.binary(),
    )
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": ts,
            "html": html,
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(["en"] * n_docs, type=pa.string()),
        }
    )


def documents_to_pages_batch(batch: pa.Table) -> pa.Table:
    """Pure per-batch mapping documents(doc_id, text, lang, source, n_chars)
    -> pages(url, warc_ts, html, text, lang). Deterministic per row (the
    per-row invariant from input_hint: text is byte-identical per url)."""
    doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
    source = batch["source"].to_pylist()
    text = batch["text"]
    urls = pa.array(
        [f"https://example.org/{s}/{d:010d}" for s, d in zip(source, doc_id)],
        type=pa.string(),
    )
    ts = pa.array(doc_id * 1_000_000 + _EPOCH_US, type=pa.timestamp("us"))
    texts_py = text.to_pylist()
    html = pa.array(
        [
            b"<html><body>" + (t or "").encode("utf-8") + b"</body></html>"
            for t in texts_py
        ],
        type=pa.binary(),
    )
    return pa.table(
        {
            "url": urls,
            "warc_ts": ts,
            "html": html,
            "text": text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text,
            "lang": batch["lang"].combine_chunks()
            if isinstance(batch["lang"], pa.ChunkedArray)
            else batch["lang"],
        }
    )


def read_pages_from_documents(sf_dir: str):
    """documents parquet -> pages Dataset (lazy; the html column is derived,
    so only (doc_id, text, lang, source) leave storage)."""
    import ray.data as rd

    ds = _rpq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
    )
    return ds.map_batches(documents_to_pages_batch, batch_format="pyarrow")


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """html -> text extraction stage (S1/M-extract in SURVEY.md §3 rebuild
    lifecycle). When the ``text`` column is already populated it is the
    identity on text (the input_hint invariant: byte-identical text per
    url); otherwise it decodes our deterministic ``<html><body>…`` wrapper.
    A real-world corpus would plug an HTML parser actor pool here.
    """
    text = batch["text"]
    if text.null_count == 0:
        return batch
    html = batch["html"].to_pylist()
    texts = text.to_pylist()
    out = []
    for t, h in zip(texts, html):
        if t is not None:
            out.append(t)
        elif h is None:
            out.append("")
        else:
            body = h
            if body.startswith(b"<html><body>") and body.endswith(b"</body></html>"):
                body = body[len(b"<html><body>") : -len(b"</body></html>")]
            out.append(body.decode("utf-8", errors="replace"))
    return batch.set_column(
        batch.schema.get_field_index("text"), "text", pa.array(out, type=pa.string())
    )
