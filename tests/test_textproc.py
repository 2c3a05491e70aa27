"""Tokenizer chain tests: Java String.split semantics, stopwords incl. "",
truncation order, and vectorized/batch parity with the scalar path."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from invertedindex_ray.functions import textproc
from invertedindex_ray.functions.textproc import STOPWORDS, tokenize, tokenize_docs


class TestJavaSplitSemantics:
    def test_simple(self):
        assert tokenize("Hello, World!") == ["hello", "world"]

    def test_leading_separator_keeps_empty_token(self):
        # Java: " a".split(" +") == ["", "a"]
        assert tokenize("?hello") == ["", "hello"]
        assert tokenize("  spaced") == ["", "spaced"]

    def test_trailing_separators_dropped(self):
        assert tokenize("hello!") == ["hello"]
        assert tokenize("hello   ") == ["hello"]
        assert tokenize("a-b-") == ["a", "b"]

    def test_all_separators_gives_empty(self):
        # Java: "   ".split(" +") == []
        assert tokenize("   ") == []
        assert tokenize("?!,.") == []

    def test_empty_string_gives_single_empty_token(self):
        # Java: "".split(" +") == [""]
        assert tokenize("") == [""]

    def test_lowercase_and_digits(self):
        assert tokenize("ABC123 DeF") == ["abc123", "def"]

    def test_unicode_replaced(self):
        assert tokenize("caffè λatte") == ["caff", "atte"]


class TestStopwords:
    def test_count_and_empty_member(self):
        assert "" in STOPWORDS
        # 127 word lines + the leading empty line (no trailing newline in the
        # file, so Java Files.readAllLines also sees 128 entries)
        assert len(STOPWORDS) == 128
        for w in ["i", "the", "and", "now", "don", "t", "s"]:
            assert w in STOPWORDS
        assert "hello" not in STOPWORDS


class TestPreprocessToken:
    def test_truncate_before_stem(self):
        tok = "a" * 25
        out = textproc.preprocess_token(tok, stemming=False)
        assert out == "a" * 20
        # truncation happens BEFORE stemming (Indexer.java:96-101)
        out2 = textproc.preprocess_token("internationalizations", stemming=True)
        from invertedindex_ray.functions.porter2 import stem

        assert out2 == stem("internationalizations"[:20])

    def test_stopword_dropped(self):
        assert textproc.preprocess_token("the") is None
        assert textproc.preprocess_token("") is None
        assert textproc.preprocess_token("the", stopword_removal=False) == "the"


def _scalar_reference(texts, stemming=True, stopword_removal=True):
    """Row-at-a-time reference implementation of the full chain."""
    out = []
    for t in texts:
        if t is None or t == "":
            out.append(({}, 0))
            continue
        counts: dict[str, int] = {}
        doc_len = 0
        for tok in tokenize(t):
            p = textproc.preprocess_token(
                tok, stemming=stemming, stopword_removal=stopword_removal
            )
            if p is None:
                continue
            doc_len += 1
            counts[p] = counts.get(p, 0) + 1
        out.append((counts, doc_len))
    return out


class TestTokenizeDocsBatch:
    TEXTS = [
        "The quick brown fox jumps over the lazy dog!",
        "",
        "   ",
        "running RUNS ran runner's",
        "?leading punctuation... and trailing!!!",
        "ALL STOPWORDS: the and of a to is",
        "supercalifragilisticexpialidocious antidisestablishmentarianism",
        "répétition of café? caffè!",
        "a1b2c3 123 0 00 numbers",
        None,
        "word " * 50,
        "dup dup dup unique",
    ]

    def test_matches_scalar_reference(self):
        for stemming in (True, False):
            terms, tfs, doc_len = tokenize_docs(
                self.TEXTS, stemming=stemming, stopword_removal=True
            )
            ref = _scalar_reference(self.TEXTS, stemming=stemming)
            assert len(terms) == len(self.TEXTS)
            for i, (counts, dl) in enumerate(ref):
                got = dict(
                    zip(terms[i].as_py(), tfs[i].as_py())
                )
                assert got == counts, f"doc {i} stemming={stemming}"
                assert doc_len[i] == dl, f"doc {i} doc_len"

    def test_no_stopword_removal(self):
        terms, tfs, doc_len = tokenize_docs(
            self.TEXTS, stemming=False, stopword_removal=False
        )
        ref = _scalar_reference(self.TEXTS, stemming=False, stopword_removal=False)
        for i, (counts, dl) in enumerate(ref):
            got = dict(zip(terms[i].as_py(), tfs[i].as_py()))
            assert got == counts, f"doc {i}"
            assert doc_len[i] == dl

    def test_doc_len_counts_pre_stem_tokens(self):
        # two tokens stemming to the same term still count 2 in doc_len
        terms, tfs, doc_len = tokenize_docs(["run running"], stemming=True)
        assert doc_len[0] == 2
        assert terms[0].as_py() == ["run"]
        assert tfs[0].as_py() == [2]

    def test_arrow_input(self):
        arr = pa.array(["hello world", "world"], type=pa.string())
        terms, tfs, dl = tokenize_docs(arr, stemming=False)
        assert sorted(terms[0].as_py()) == ["hello", "world"]
        assert dl.dtype == np.int32
