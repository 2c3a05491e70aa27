"""Text-analysis pipelines for training-data curation: language ID,
quality scoring, token counting, document fingerprinting. All vectorized
map_batches; language marker sets and regexes are per-actor state."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

from invertedindex_ray.functions.hashing import hash_strings
from invertedindex_ray.functions.rounding import round_half_up_scalar
from invertedindex_ray.functions.textproc import STOPWORDS

_WORD = re.compile(r"[^a-zA-Z0-9]+")

# small high-frequency marker sets per language (public common-word lists)
_LANG_MARKERS: dict[str, frozenset] = {
    "en": frozenset("the and of to in is that it for was with as on are this be".split()),
    "de": frozenset("der die das und ist nicht ein eine mit von den im für auf sich".split()),
    "fr": frozenset("le la les et de des un une est dans pour que qui sur pas".split()),
    "es": frozenset("el la los las y de un una es en que por para con del no".split()),
}


def _read_docs(sf_dir: str, columns=("doc_id", "text")):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


# ------------------------------------------------------------- token count

def token_count(sf_dir: str):
    """(doc_id, n_tokens): non-empty alnum-run tokens per doc (SQL mirror:
    list_filter(regexp_split_to_array(...)))."""

    def f(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n = np.fromiter(
            (len([w for w in _WORD.split(t or "") if w]) for t in texts),
            dtype=np.int64, count=len(texts),
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"].combine_chunks()
                if isinstance(batch["doc_id"], pa.ChunkedArray)
                else batch["doc_id"],
                "n_tokens": pa.array(n, type=pa.int64()),
            }
        )

    return _read_docs(sf_dir).map_batches(f, batch_format="pyarrow")


# ------------------------------------------------------------- quality

def quality_score(sf_dir: str):
    """(doc_id, n_chars_t, alpha_ratio_r, stop_ratio_r): simple quality
    signals — length, alphabetic-character ratio, stopword ratio — each
    SQL-expressible and rounded to 6 dp."""

    def f(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n_chars, alpha_ratio, stop_ratio = [], [], []
        for t in texts:
            t = t or ""
            n = len(t)
            n_alpha = sum(1 for c in t if ("a" <= c <= "z") or ("A" <= c <= "Z"))
            toks = [w for w in _WORD.split(t.lower()) if w]
            n_stop = sum(1 for w in toks if w in STOPWORDS)
            n_chars.append(n)
            alpha_ratio.append(round_half_up_scalar(n_alpha / n, 6) if n else 0.0)
            stop_ratio.append(round_half_up_scalar(n_stop / len(toks), 6) if toks else 0.0)
        return pa.table(
            {
                "doc_id": batch["doc_id"].combine_chunks()
                if isinstance(batch["doc_id"], pa.ChunkedArray)
                else batch["doc_id"],
                "n_chars_t": pa.array(np.asarray(n_chars, dtype=np.int64), type=pa.int64()),
                "alpha_ratio_r": pa.array(np.asarray(alpha_ratio), type=pa.float64()),
                "stop_ratio_r": pa.array(np.asarray(stop_ratio), type=pa.float64()),
            }
        )

    return _read_docs(sf_dir).map_batches(f, batch_format="pyarrow")


# ------------------------------------------------------------- language id

class LangIdStage:
    """Marker-word n-gram heuristic language ID (actor-pool stage: marker
    tables built once per actor). CJK codepoint ratio handles zh; otherwise
    argmax of per-language marker hit counts with 'en' tie preference."""

    def __init__(self) -> None:
        self.markers = _LANG_MARKERS
        self.word = _WORD

    def _detect(self, text: str) -> str:
        if not text:
            return "unknown"
        n_cjk = sum(1 for c in text if "一" <= c <= "鿿")
        if n_cjk >= max(1, len(text) // 20):
            return "zh"
        toks = [w for w in self.word.split(text.lower()) if w]
        if not toks:
            return "unknown"
        best_lang, best = "unknown", 0
        for lang in ("en", "de", "fr", "es"):  # fixed order = deterministic ties
            hits = sum(1 for w in toks if w in self.markers[lang])
            if hits > best:
                best, best_lang = hits, lang
        return best_lang

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        pred = [self._detect(t or "") for t in texts]
        return pa.table(
            {
                "doc_id": batch["doc_id"].combine_chunks()
                if isinstance(batch["doc_id"], pa.ChunkedArray)
                else batch["doc_id"],
                "pred_lang": pa.array(pred, type=pa.string()),
            }
        )


def lang_id(sf_dir: str):
    return _read_docs(sf_dir).map_batches(
        LangIdStage, batch_format="pyarrow", concurrency=2
    )


# ------------------------------------------------------------- fingerprints

def fingerprint_md5(sf_dir: str):
    """(doc_id, fp): content digest (SQL mirror: md5(text))."""

    def f(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        fp = [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]
        return pa.table(
            {
                "doc_id": batch["doc_id"].combine_chunks()
                if isinstance(batch["doc_id"], pa.ChunkedArray)
                else batch["doc_id"],
                "fp": pa.array(fp, type=pa.string()),
            }
        )

    return _read_docs(sf_dir).map_batches(f, batch_format="pyarrow")


def winnow_fingerprints(sf_dir: str, *, kgram: int = 5, window: int = 4):
    """(doc_id, n_fps, fps): winnowing document fingerprints — rolling
    k-gram hashes, minimum per sliding window (Schleimer et al. 2003,
    'Winnowing: Local Algorithms for Document Fingerprinting'). Used for
    robust partial-overlap detection; deterministic (rows-only check)."""

    def f(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        out_n, out_fps = [], []
        for t in texts:
            words = [w for w in _WORD.split((t or "").lower()) if w]
            if len(words) < kgram:
                out_n.append(0)
                out_fps.append([])
                continue
            grams = [" ".join(words[i : i + kgram]) for i in range(len(words) - kgram + 1)]
            h = hash_strings(np.asarray(grams, dtype=object)).astype(np.int64)
            if len(h) <= window:
                sel = np.unique(h[[int(np.argmin(h))]])
            else:
                mins = []
                for i in range(len(h) - window + 1):
                    w = h[i : i + window]
                    mins.append(int(w.min()))
                sel = np.unique(np.asarray(mins, dtype=np.int64))
            out_n.append(len(sel))
            out_fps.append(sel.tolist())
        return pa.table(
            {
                "doc_id": batch["doc_id"].combine_chunks()
                if isinstance(batch["doc_id"], pa.ChunkedArray)
                else batch["doc_id"],
                "n_fps": pa.array(np.asarray(out_n, dtype=np.int64), type=pa.int64()),
                "fps": pa.array(out_fps, type=pa.list_(pa.int64())),
            }
        )

    return _read_docs(sf_dir).map_batches(f, batch_format="pyarrow")
