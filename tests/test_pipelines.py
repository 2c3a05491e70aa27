"""Training-data pipeline tests: dedup family cross-checks, ANN recall,
text analysis determinism, multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def _pdf(x):
    import pandas as pd
    import pyarrow as pa

    if isinstance(x, pd.DataFrame):
        return x
    if isinstance(x, pa.Table):
        return x.to_pandas()
    return x.to_pandas()


@pytest.mark.usefixtures("ray_session")
class TestDedup:
    def test_exact_dedup_covers_all_docs(self):
        from invertedindex_ray.pipelines.dedup import exact_dedup

        df = _pdf(exact_dedup(SF))
        assert df["n_dups"].sum() == 500
        assert df["doc_id"].is_unique

    def test_snippet_indexed_matches_scan_engine(self, tmp_path):
        """Best-window selection from the positional artifact must match
        the scan engine exactly, including a repeated-term query (each
        position must count once) and an all-absent query (zero rows)."""
        from invertedindex_ray.pipelines.positional import snippet_windows_indexed
        from invertedindex_ray.pipelines.snippet import snippet_windows

        qs = [("table hash", 8), ("batch batch", 6), ("zzznope qqnada", 5)]
        canon = lambda df: sorted(
            zip(df["query"], df["doc_id"], df["win_start"], df["n_hits"])
        )
        scan = canon(_pdf(snippet_windows(SF, qs)))
        indexed = canon(
            _pdf(
                snippet_windows_indexed(
                    SF, qs, index_dir=str(tmp_path / "posidx3")
                )
            )
        )
        assert indexed == scan and len(scan) > 0

    def test_value_quantile_sample_accuracy(self):
        """The deterministic bottom-k sample quantile must land within
        O(1/sqrt(k)) quantile-rank distance of the exact quantile: the
        estimate's true CDF position is asserted within 0.1 of q for
        k=1024 (binomial bound ~3/sqrt(k) = 0.094)."""
        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.relational import value_quantile_sample

        got = _pdf(value_quantile_sample(SF))
        t = pq.read_table(
            f"{SF}/events.parquet", columns=["event_type", "value"]
        ).to_pandas()
        assert len(got) > 0
        for r in got.itertuples():
            vals = np.sort(t.loc[t["event_type"] == r.event_type, "value"].to_numpy())
            pos = np.searchsorted(vals, r.value_q, side="right") / len(vals)
            assert abs(pos - r.q) <= 0.1, (r.event_type, r.q, pos)

    def test_phrase_indexed_matches_scan_engine(self, tmp_path):
        """The positional-index phrase engine must return exactly the
        scan matcher's rows — including overlapping occurrences,
        repeated-term phrases, unigrams, and absent phrases — and the
        second call must reuse the built artifact (resume marker)."""
        import os

        from invertedindex_ray.pipelines.phrase import phrase_search
        from invertedindex_ray.pipelines.positional import (
            build_positional_index,
            phrase_search_indexed,
        )

        phrases = [
            "table hash",
            "batch batch batch",
            "spark",
            "zzznope phrase",
            "a a",  # overlapping bigram of a repeated token
        ]
        idx = str(tmp_path / "posidx")
        canon = lambda df: sorted(
            zip(df["phrase"], df["doc_id"], df["n_matches"])
        )
        scan = canon(_pdf(phrase_search(SF, phrases)))
        indexed = canon(
            _pdf(phrase_search_indexed(SF, phrases, index_dir=idx))
        )
        assert indexed == scan and len(scan) > 0
        # resume: the manifest short-circuits the rebuild
        marker = os.path.join(idx, "pos_manifest.json")
        assert os.path.exists(marker)
        before = os.path.getmtime(marker)
        m = build_positional_index(SF, idx)
        assert os.path.getmtime(marker) == before and m

    def test_positional_index_invalidated_by_corpus_change(self, tmp_path):
        """A regenerated corpus at the SAME path must invalidate the
        cached artifact — a stale positional index silently serving the
        OLD corpus's matches breaks the scan-engine contract."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        import os

        from invertedindex_ray.pipelines.positional import phrase_search_indexed

        sf = str(tmp_path / "sf")
        os.makedirs(sf)
        idx = str(tmp_path / "pidx")
        pq.write_table(
            pa.table({"doc_id": [1], "text": ["alpha beta gamma"]}),
            os.path.join(sf, "documents.parquet"),
        )
        r1 = _pdf(phrase_search_indexed(sf, ["alpha beta"], index_dir=idx))
        assert list(r1["doc_id"]) == [1]
        # regenerate the corpus in place: the old phrase is gone
        pq.write_table(
            pa.table({"doc_id": [2], "text": ["delta epsilon zeta"]}),
            os.path.join(sf, "documents.parquet"),
        )
        r2 = _pdf(phrase_search_indexed(sf, ["alpha beta", "delta epsilon"],
                                        index_dir=idx))
        assert list(r2["doc_id"]) == [2]
        assert set(r2["phrase"]) == {"delta epsilon"}

    def test_phrase_indexed_unnormalized_phrase_matches_scan(self, tmp_path):
        """A caller phrase that is not pre-normalized (uppercase /
        punctuation) must behave exactly like the scan engine: no
        normalization, hence zero rows — not a silently-normalized
        match set with a different label."""
        from invertedindex_ray.pipelines.phrase import phrase_search
        from invertedindex_ray.pipelines.positional import phrase_search_indexed

        qs = ["Merge-Group", "table hash"]
        canon = lambda df: sorted(
            zip(df["phrase"], df["doc_id"], df["n_matches"])
        )
        scan = canon(_pdf(phrase_search(SF, qs)))
        indexed = canon(
            _pdf(phrase_search_indexed(SF, qs, index_dir=str(tmp_path / "p4")))
        )
        assert indexed == scan
        assert all(p != "merge group" for p, _d, _n in indexed)

    def test_minhash_rejects_unknown_hasher(self):
        from invertedindex_ray.pipelines.dedup import minhash_lsh_pairs

        with pytest.raises(ValueError, match="hasher"):
            minhash_lsh_pairs(SF, hasher="MD5")

    def test_proximity_indexed_matches_scan_engine(self, tmp_path):
        """The indexed proximity engine shares the positional artifact
        and must match the scan engine exactly — including a same-term
        query (both roles on one posting list) and a zero-hit pair."""
        from invertedindex_ray.pipelines.positional import (
            proximity_search_indexed,
        )
        from invertedindex_ray.pipelines.proximity import proximity_search

        qs = [
            ("table", "merge", 5),
            ("hash", "hash", 3),       # same-term: (p, p) pairs, dist 0
            ("zzznope", "table", 5),   # zero rows
        ]
        canon = lambda df: sorted(
            zip(df["query"], df["doc_id"], df["n_pairs"], df["min_dist"])
        )
        scan = canon(_pdf(proximity_search(SF, qs)))
        indexed = canon(
            _pdf(
                proximity_search_indexed(
                    SF, qs, index_dir=str(tmp_path / "posidx2")
                )
            )
        )
        assert indexed == scan and len(scan) > 0

    def test_bpe_token_count_semantics(self, tmp_path):
        """The GPT-2-style pre-tokenizer pattern: contraction suffixes
        split, punctuation runs are their own pieces, digit runs split
        from letters — counts must exceed whitespace-word counts on
        such text and exactly match a re.findall recompute."""
        import re

        import pyarrow as pa
        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.textstats import (
            BPE_SPLIT_PATTERN,
            bpe_token_count,
        )

        texts = [
            "it's a well-known fact!!",      # 's, -, !! are own pieces
            "abc123 def",                    # digit run splits
            "",                              # empty
        ]
        pq.write_table(
            pa.table({"doc_id": [0, 1, 2], "text": texts}),
            str(tmp_path / "documents.parquet"),
        )
        got = _pdf(bpe_token_count(str(tmp_path))).set_index("doc_id")["n_bpe_tokens"]
        pat = re.compile(BPE_SPLIT_PATTERN)
        for i, t in enumerate(texts):
            assert got.loc[i] == len(pat.findall(t)), t
        assert got.loc[0] > len(texts[0].split())  # finer than words
        assert got.loc[2] == 0

    def test_source_kl_matches_direct_recompute(self):
        """Distributed KL(source || corpus) must equal a driver-side
        Counter recompute on the real table; KL is non-negative and 0
        only when a source's distribution equals the corpus's."""
        import math
        from collections import Counter

        import pyarrow.parquet as pq

        from invertedindex_ray.functions.rounding import round_half_up
        from invertedindex_ray.pipelines.textstats import source_kl

        got = _pdf(source_kl(SF)).set_index("source").sort_index()
        t = pq.read_table(f"{SF}/documents.parquet", columns=["source", "text"])
        per_src: dict[str, Counter] = {}
        glob: Counter = Counter()
        for s, txt in zip(t["source"].to_pylist(), t["text"].to_pylist()):
            ws = (txt or "").split(" ")
            per_src.setdefault(s, Counter()).update(ws)
            glob.update(ws)
        t_all = sum(glob.values())
        for s, cnt in per_src.items():
            ts = sum(cnt.values())
            kl = sum(
                (c / ts) * math.log((c / ts) / (glob[w] / t_all))
                for w, c in cnt.items()
            )
            assert got.loc[s, "n_tokens"] == ts
            assert abs(got.loc[s, "kl_r"] - float(round_half_up(np.array([kl]), 6)[0])) <= 1e-6, s
            assert got.loc[s, "kl_r"] >= -1e-9

    def test_dedup_keep_best_prefers_longest(self, tmp_path):
        """keep-best keeps the LONGEST cluster member even when the
        min-id representative (dedup_filter's keeper) is shorter."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.dedup import dedup_filter, dedup_keep_best

        base = " ".join(f"w{i}" for i in range(40))
        docs = pa.table(
            {
                "doc_id": [1, 2, 3],
                "text": [base, base + " extra tail words here", "unrelated thing"],
                "n_chars": [len(base), len(base) + 23, 15],
            }
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        kept_best = set(_pdf(dedup_keep_best(str(tmp_path)))["doc_id"])
        kept_min = set(_pdf(dedup_filter(str(tmp_path)))["doc_id"])
        assert kept_best == {2, 3}  # longest member 2 survives
        assert kept_min == {1, 3}   # min-id rule keeps 1 instead

    def test_hybrid_rrf_semantics(self):
        """RRF fusion invariants on the real tables: every (seed, doc)
        pair in the fused top-k appears in at least one source list; a
        doc present in BOTH lists scores the sum of its two RRF terms;
        ranks are dense per seed; the seed never ranks itself."""
        from invertedindex_ray.pipelines.hybrid import dense_neighbors, hybrid_rrf
        from invertedindex_ray.pipelines.mlt import more_like_this

        sparse = more_like_this(SF).to_pandas()
        dense = dense_neighbors(SF).to_pandas()
        fused = hybrid_rrf(SF).to_pandas()
        s_rank = {(r.seed_id, r.doc_id): r.rank for r in sparse.itertuples()}
        d_rank = {(r.seed_id, r.doc_id): r.rank for r in dense.itertuples()}
        assert len(fused) > 0
        for r in fused.itertuples():
            key = (r.seed_id, r.doc_id)
            assert key in s_rank or key in d_rank, key
            assert r.seed_id != r.doc_id
            expect = (1.0 / (60 + s_rank[key]) if key in s_rank else 0.0) + (
                1.0 / (60 + d_rank[key]) if key in d_rank else 0.0
            )
            assert abs(r.rrf_r - expect) < 1e-9, key
        for seed, g in fused.groupby("seed_id"):
            assert list(g["rank"]) == list(range(1, len(g) + 1))
        # at least one seed should have a doc boosted by BOTH systems on
        # overlapping candidates, or all-singles — either way scores
        # must be non-increasing within a seed
        for _, g in fused.groupby("seed_id"):
            v = g["rrf_r"].to_numpy()
            assert (v[:-1] >= v[1:] - 1e-12).all()

    def test_c4_line_filter_rules(self, tmp_path):
        """Every C4 rule path on crafted docs: terminal punctuation,
        3-word floor, javascript lines, lorem-ipsum/brace page drops,
        multi-line re-join order, and the min_kept_lines page floor.
        (The synthetic corpus is single-line unpunctuated text, so only
        a crafted table exercises the discriminating paths.)"""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.curation import c4_line_filter

        docs = pa.table(
            {
                "doc_id": [1, 2, 3, 4, 5, 6],
                "text": [
                    # kept lines 1+3; line 2 lacks terminal punct
                    "Good first line here.\nno punct line\nAnother good line!",
                    # page drop: lorem ipsum (case-insensitive)
                    "Totally fine sentence.\nsome Lorem Ipsum filler.",
                    # page drop: curly brace
                    "A good line too.\nfunction f() { return 1; }",
                    # line too short (2 words) + javascript line
                    'Two words.\nEnable javascript to view this page.',
                    # quoted terminal punctuation counts
                    'He said "stop right there."',
                    "",  # empty doc: 1 line, nothing kept
                ],
            }
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        df = _pdf(c4_line_filter(str(tmp_path))).set_index("doc_id").sort_index()
        assert bool(df.loc[1, "keep"]) and df.loc[1, "n_lines"] == 3
        assert df.loc[1, "n_kept"] == 2
        assert df.loc[1, "text_clean"] == (
            "Good first line here.\nAnother good line!"
        )
        assert not bool(df.loc[2, "keep"]) and df.loc[2, "text_clean"] == ""
        assert not bool(df.loc[3, "keep"])
        assert not bool(df.loc[4, "keep"]) and df.loc[4, "n_kept"] == 0
        assert bool(df.loc[5, "keep"]) and df.loc[5, "n_kept"] == 1
        assert not bool(df.loc[6, "keep"]) and df.loc[6, "n_lines"] == 1
        # page floor: doc 1 has 2 kept lines, doc 5 only 1
        df3 = _pdf(
            c4_line_filter(str(tmp_path), min_kept_lines=2)
        ).set_index("doc_id")
        assert bool(df3.loc[1, "keep"]) and not bool(df3.loc[5, "keep"])

    def test_passage_dedup_semantics(self, tmp_path):
        """Passage-level exact dedup: global first-occurrence keep at
        8-word granularity, including whole-doc dups (empty output),
        intra-doc repeats (cut once) and short tail passages."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.dedup import passage_dedup

        p1 = " ".join(f"w{i}" for i in range(8))
        p2 = " ".join(f"x{i}" for i in range(8))
        pa_ = " ".join(f"a{i}" for i in range(8))
        d1 = f"{p1} {p2}"          # 2 unique passages
        d2 = d1                     # exact copy: everything cut
        d3 = f"{p1} u1 u2 u3"      # first passage dup, 3-word tail kept
        d4 = f"{pa_} {pa_} b1"     # intra-doc repeat cut once
        pq.write_table(
            pa.table(
                {"doc_id": [1, 2, 3, 4], "text": [d1, d2, d3, d4]}
            ),
            str(tmp_path / "documents.parquet"),
        )
        df = _pdf(passage_dedup(str(tmp_path))).set_index("doc_id").sort_index()
        assert df.loc[1, "text_dedup"] == d1 and df.loc[1, "n_kept"] == 2
        assert df.loc[2, "text_dedup"] == "" and df.loc[2, "n_kept"] == 0
        assert df.loc[2, "n_paras"] == 2
        assert df.loc[3, "text_dedup"] == "u1 u2 u3" and df.loc[3, "n_kept"] == 1
        assert df.loc[4, "text_dedup"] == f"{pa_} b1" and df.loc[4, "n_kept"] == 2

    def test_passage_dedup_invariants_on_corpus(self):
        """On the real corpus: n_kept <= n_paras, Σn_kept = #distinct
        passages, and every output doc re-assembles to a word count equal
        to the sum of its kept passage lengths."""
        from invertedindex_ray.pipelines.dedup import passage_dedup

        df = _pdf(passage_dedup(SF))
        assert len(df) == 500
        assert (df["n_kept"] <= df["n_paras"]).all()
        assert (df["n_kept"] > 0).any() and (df["n_kept"] < df["n_paras"]).any()
        # distinct 8-word passages, computed independently
        import pyarrow.parquet as pq

        texts = pq.read_table(f"{SF}/documents.parquet")["text"].to_pylist()
        distinct = set()
        for t in texts:
            ws = t.split(" ")
            for i in range(0, len(ws), 8):
                distinct.add(" ".join(ws[i : i + 8]))
        assert df["n_kept"].sum() == len(distinct)
        # word-count conservation on the survivors
        nw = df["text_dedup"].map(lambda s: len(s.split(" ")) if s else 0)
        assert int(nw.sum()) < sum(len(t.split(" ")) for t in texts)

    def test_minhash_finds_exact_jaccard_pairs(self):
        """LSH candidates must cover the high-similarity exact pairs
        (estimate >= 0.5 band-collides with near-certainty at j >= 0.8)."""
        from invertedindex_ray.pipelines.dedup import (
            minhash_lsh_pairs,
            ngram_jaccard_pairs,
        )

        exact = _pdf(ngram_jaccard_pairs(SF, k=3, tau=0.8))
        est = _pdf(minhash_lsh_pairs(SF, threshold=0.5))
        exact_pairs = set(zip(exact["doc_a"], exact["doc_b"]))
        est_pairs = set(zip(est["doc_a"], est["doc_b"]))
        missing = exact_pairs - est_pairs
        assert not missing, f"LSH missed high-sim pairs: {missing}"

    def test_minhash_siphash_hasher_detects_same_pairs(self):
        """hasher='siphash' (vectorized, no SQL mirror) must detect the
        same high-similarity pairs as the md5 oracle path — MinHash's
        behavior is hasher-agnostic for any universal hash."""
        from invertedindex_ray.pipelines.dedup import (
            minhash_lsh_pairs,
            ngram_jaccard_pairs,
        )

        exact = _pdf(ngram_jaccard_pairs(SF, k=3, tau=0.8))
        exact_pairs = set(zip(exact["doc_a"], exact["doc_b"]))
        sip = _pdf(minhash_lsh_pairs(SF, threshold=0.5, hasher="siphash"))
        sip_pairs = set(zip(sip["doc_a"], sip["doc_b"]))
        missing = exact_pairs - sip_pairs
        assert not missing, f"siphash LSH missed high-sim pairs: {missing}"

    def test_minhash_inplace_kernel_matches_reference(self):
        """The in-place mulmod kernel (bandwidth optimization) must be
        bit-identical to a straightforward out-of-place evaluation of
        min((a*x + b) mod P) via Python big ints."""
        from invertedindex_ray.pipelines.dedup import _mulmod_minhash, minhash_perms

        P_i = (1 << 61) - 1
        P = np.uint64(P_i)
        A, B = minhash_perms(64)
        rng = np.random.default_rng(5)
        for n in (1, 3, 513):
            x = rng.integers(0, 1 << 61, size=n, dtype=np.uint64)
            got = _mulmod_minhash(A, B, x, P)
            expect = np.array(
                [
                    min((int(a) * int(v) + int(b)) % P_i for v in x)
                    for a, b in zip(A, B)
                ],
                dtype=np.uint64,
            )
            np.testing.assert_array_equal(got, expect)

    def test_minhash_survives_high_join_partition_count(self, monkeypatch):
        """Regression for the round-2 crash: with more join partitions
        than candidate rows can fill, some hash partitions receive zero
        rows, and a schema-less empty block used to make the Acero join
        key unresolvable (ArrowInvalid on FieldRef doc_a). The result
        must also be IDENTICAL to the default plan — partition count is
        physical, not semantic. (8 forced partitions >> the ~28 sf0.001
        candidate pairs, so empty partitions are guaranteed; the original
        16-partition/32-cpu crash shape is re-verified by the driver's
        own correctness run at 32 cpus. 16 here would spawn 32 join
        aggregator actors on the 4-cpu test session and starve the map
        tasks.)"""
        import invertedindex_ray.pipelines.dedup as dd

        def srt(df):
            return df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)

        # broadcast_max_pairs=0 forces the hash-join verification path
        # (the default broadcast path would never reach the join)
        base = srt(_pdf(dd.minhash_lsh_pairs(SF, threshold=0.5,
                                             broadcast_max_pairs=0)))
        monkeypatch.setattr(dd, "_pair_join_partitions", lambda n: 8)
        forced = srt(_pdf(dd.minhash_lsh_pairs(SF, threshold=0.5,
                                               broadcast_max_pairs=0)))
        assert base.equals(forced)
        assert len(forced) > 0
        # and the default broadcast path must agree with the join path
        bcast = srt(_pdf(dd.minhash_lsh_pairs(SF, threshold=0.5)))
        assert base.equals(bcast)

    def test_join_partitions_derived_from_data_size(self):
        """The join fan-out is a pure function of row count (VERDICT r2
        #2) — no cluster probe, fixed floor, bounded cap."""
        from invertedindex_ray.pipelines.dedup import _pair_join_partitions

        assert _pair_join_partitions(0) == 2
        assert _pair_join_partitions(99_999) == 2
        assert _pair_join_partitions(250_000) == 3
        assert _pair_join_partitions(10**12) == 64

    def test_bucket_caps_are_loud(self, caplog):
        """'No silent caps' (VERDICT r2 #3): a pathological bucket above
        the cap must emit a warning naming the loss; below-cap buckets
        stay silent."""
        import logging

        from invertedindex_ray.pipelines.dedup import _capped

        with caplog.at_level(logging.WARNING, logger="invertedindex_ray.dedup"):
            assert _capped("minhash_lsh", 2001, 2000)
        assert any(
            "dropping pathological bucket of 2001 docs" in r.message
            for r in caplog.records
        )
        caplog.clear()
        with caplog.at_level(logging.WARNING, logger="invertedindex_ray.dedup"):
            assert not _capped("minhash_lsh", 2000, 2000)
        assert not caplog.records

    def test_simhash_symmetric_and_deterministic(self):
        from invertedindex_ray.pipelines.dedup import simhash_dedup

        a = _pdf(simhash_dedup(SF))
        b = _pdf(simhash_dedup(SF))
        assert a.equals(b)
        assert (a["doc_a"] < a["doc_b"]).all()


@pytest.mark.usefixtures("ray_session")
class TestSimilarity:
    def test_ann_self_match_first(self):
        from invertedindex_ray.pipelines.similarity import ann_topk

        df = _pdf(ann_topk(SF, n_queries=3, k=5))
        for qid, g in df.groupby("qid"):
            top = g.sort_values("rank").iloc[0]
            assert top["vec_id"] == qid  # query vector is its own best match
            assert top["cos_r"] == 1.0

    def test_ivf_recall_against_exact(self):
        from invertedindex_ray.pipelines.similarity import ann_topk, ivf_ann_topk

        exact = _pdf(ann_topk(SF, n_queries=5, k=10))
        approx = _pdf(ivf_ann_topk(SF, n_queries=5, k=10, n_centroids=8, nprobe=4))
        recalls = []
        for qid, g in exact.groupby("qid"):
            e = set(g["vec_id"])
            a = set(approx[approx["qid"] == qid]["vec_id"])
            recalls.append(len(e & a) / len(e))
        assert np.mean(recalls) >= 0.5  # nprobe=4 of 8 centroids

    def test_neardup_pairs_ordered(self):
        from invertedindex_ray.pipelines.similarity import embedding_neardup_pairs

        df = _pdf(embedding_neardup_pairs(SF, tau=0.4))
        assert (df["vec_a"] < df["vec_b"]).all()
        assert (df["cos_r"] >= 0.4).all()


@pytest.mark.usefixtures("ray_session")
class TestTextStats:
    def test_lang_id_pipeline_runs_and_is_deterministic(self):
        # NB: the driver documents table has RANDOM lang labels over
        # English-vocabulary text, so label accuracy is meaningless there;
        # heuristic quality is asserted on real samples below.
        from invertedindex_ray.pipelines.textstats import lang_id

        a = _pdf(lang_id(SF)).sort_values("doc_id").reset_index(drop=True)
        b = _pdf(lang_id(SF)).sort_values("doc_id").reset_index(drop=True)
        assert a.equals(b)
        assert set(a["pred_lang"]) <= {"en", "de", "fr", "es", "zh", "unknown"}

    def test_lang_id_heuristic_samples(self):
        from invertedindex_ray.pipelines.textstats import LangIdStage

        s = LangIdStage()
        assert s._detect("the cat sat on the mat and it was happy") == "en"
        assert s._detect("der Hund ist nicht mit der Katze im Haus") == "de"
        assert s._detect("le chat est dans la maison avec les enfants") == "fr"
        assert s._detect("el perro es un animal que vive en la casa") == "es"
        assert s._detect("今天天气很好我们去公园散步吧") == "zh"
        assert s._detect("") == "unknown"
        assert s._detect("12345 67890") == "unknown"

    def test_quality_ranges(self):
        from invertedindex_ray.pipelines.textstats import quality_score

        df = _pdf(quality_score(SF))
        assert df["alpha_ratio_r"].between(0, 1).all()
        assert df["stop_ratio_r"].between(0, 1).all()

    def test_winnow_deterministic_nonempty(self):
        from invertedindex_ray.pipelines.textstats import winnow_fingerprints

        a = _pdf(winnow_fingerprints(SF)).sort_values(["doc_id", "fp"]).reset_index(drop=True)
        b = _pdf(winnow_fingerprints(SF)).sort_values(["doc_id", "fp"]).reset_index(drop=True)
        assert a.equals(b)
        # nearly every doc produces fingerprints (exploded rows)
        import duckdb

        n_docs = duckdb.sql(
            f"select count(*) from read_parquet('{SF}/documents.parquet')"
        ).fetchone()[0]
        assert a["doc_id"].nunique() > 0.9 * n_docs


@pytest.mark.usefixtures("ray_session")
class TestMultimodal:
    def test_decode_features_schema_and_determinism(self):
        from invertedindex_ray.pipelines.multimodal import decode_features

        a = _pdf(decode_features(SF)).sort_values("url").reset_index(drop=True)
        assert list(a.columns) == ["url", "width", "height"] + [f"f{j}" for j in range(8)]
        for j in range(8):
            assert a[f"f{j}"].between(0, 1).all()
        assert a["width"].between(64, 64 + 255).all()
        b = _pdf(decode_features(SF)).sort_values("url").reset_index(drop=True)
        assert a.equals(b)

    def test_decoder_unit(self):
        from invertedindex_ray.pipelines.multimodal import FakeImageDecoder

        d = FakeImageDecoder()
        w, h, f = d._decode_one(b"payload")
        w2, h2, f2 = d._decode_one(b"payload")
        assert (w, h) == (w2, h2)
        assert np.array_equal(f, f2)
        assert len(f) == 8 and (0 <= f).all() and (f < 1).all()


@pytest.mark.usefixtures("ray_session")
class TestWindows:
    def test_tumbling_counts_match_duckdb(self):
        import duckdb

        from invertedindex_ray.pipelines.windows import tumbling_counts

        got = (
            _pdf(tumbling_counts(SF))
            .sort_values(["window_start", "event_type"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
        )
        exp = con.execute(
            """SELECT date_trunc('hour', ts) AS window_start, event_type,
                      count(*)::BIGINT AS n_events,
                      round(sum(value), 6) AS sum_value_r
               FROM events GROUP BY 1, 2 ORDER BY 1, 2"""
        ).df().reset_index(drop=True)
        assert len(got) == len(exp)
        assert got["n_events"].tolist() == exp["n_events"].tolist()
        assert np.allclose(got["sum_value_r"], exp["sum_value_r"], atol=1e-9)

    def test_sessionize_gap_semantics(self):
        from invertedindex_ray.pipelines.windows import sessionize

        got = _pdf(sessionize(SF, gap_minutes=30))
        # sessions of one user never overlap and respect the gap rule
        for uid, g in got.groupby("user_id"):
            g = g.sort_values("session_start")
            prev_end = None
            for _, row in g.iterrows():
                assert row["session_end"] >= row["session_start"]
                if prev_end is not None:
                    gap = (row["session_start"] - prev_end).total_seconds()
                    assert gap > 30 * 60, uid
                prev_end = row["session_end"]
        # total events conserved
        import pyarrow.parquet as pq

        n = pq.read_table(f"{SF}/events.parquet", columns=["event_id"]).num_rows
        assert int(got["n_events"].sum()) == n


@pytest.mark.usefixtures("ray_session")
class TestSketches:
    def test_bloom_no_false_negatives_and_bounded_fp(self):
        """Every corpus digest must probe positive (exact guarantee);
        random non-member probes must false-positive at ~the occupancy
        estimate; OR-merging per-half filters equals the one-shot."""
        import hashlib

        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.sketches import (
            _bloom_batch_bits,
            _bloom_positions,
            bloom_build,
            bloom_membership,
        )

        m, k = 1 << 16, 7
        t = _pdf(bloom_membership(SF, m=m, k=k))
        assert t["all_members"].iloc[0] == 1 and t["n_docs"].iloc[0] == 500

        bits = bloom_build(SF, m=m, k=k)
        # FP rate on guaranteed non-members (synthetic hashes)
        rng = np.random.default_rng(5)
        probes = rng.integers(0, 2**63, 20_000).astype(np.uint64)
        pos = _bloom_positions(probes, m, k).reshape(k, len(probes))
        fp = bits[pos].all(axis=0).mean()
        est = bits.mean() ** k
        assert fp <= max(3 * est, 0.01)
        # mergeability: OR of per-half filters == one-shot over all docs
        texts = pq.read_table(f"{SF}/documents.parquet")["text"].to_pylist()
        h = np.fromiter(
            (
                int.from_bytes(hashlib.md5(x.encode()).digest()[:8], "little")
                for x in texts
            ),
            dtype=np.uint64,
            count=len(texts),
        )
        merged = _bloom_batch_bits(h[:250], m, k) | _bloom_batch_bits(h[250:], m, k)
        assert (merged == _bloom_batch_bits(h, m, k)).all()
        assert (merged == bits).all()  # and equals the distributed build

    def test_top_terms_exact_against_duckdb(self):
        import duckdb

        from invertedindex_ray.pipelines.sketches import top_terms

        got = top_terms(SF, n=10).to_pandas()
        exp = duckdb.sql(f"""
            WITH tk AS (
              SELECT unnest(list_filter(regexp_split_to_array(lower(coalesce(text, '')), '[^a-z0-9]+'), x -> x <> '')) AS w
              FROM read_parquet('{SF}/documents.parquet')
            ),
            c AS (SELECT w, count(*) n FROM tk GROUP BY w)
            SELECT w, n FROM c ORDER BY n DESC, w LIMIT 10
        """).fetchdf()
        assert got["term"].tolist() == exp["w"].tolist()
        assert got["n_occurrences"].tolist() == exp["n"].tolist()

    def test_cms_overestimates_within_bound(self):
        import duckdb

        from invertedindex_ray.pipelines.sketches import cms_term_counts

        true = dict(duckdb.sql(f"""
            WITH tk AS (
              SELECT unnest(list_filter(regexp_split_to_array(lower(coalesce(text, '')), '[^a-z0-9]+'), x -> x <> '')) AS w
              FROM read_parquet('{SF}/documents.parquet')
            ) SELECT w, count(*) FROM tk GROUP BY w
        """).fetchall())
        n_total = sum(true.values())
        probe = list(true)[:20] + ["definitelynotaword"]
        width, depth = 2048, 4
        est = cms_term_counts(SF, probe, width=width, depth=depth)
        import math

        eps_bound = math.e / width * n_total
        for t, e in zip(est["term"].to_pylist(), est["est_count"].to_pylist()):
            tv = true.get(t, 0)
            assert e >= tv, (t, e, tv)          # CMS never underestimates
            assert e <= tv + eps_bound, (t, e, tv)  # and stays within eN/w

    def test_cms_deterministic(self):
        from invertedindex_ray.pipelines.sketches import cms_term_counts

        a = cms_term_counts(SF, ["data", "join"]).to_pydict()
        b = cms_term_counts(SF, ["data", "join"]).to_pydict()
        assert a == b


@pytest.mark.usefixtures("ray_session")
class TestRelational:
    def test_sample_is_deterministic_subset(self):
        from invertedindex_ray.pipelines.relational import sample_docs

        a = _pdf(sample_docs(SF)).sort_values("doc_id").reset_index(drop=True)
        b = _pdf(sample_docs(SF)).sort_values("doc_id").reset_index(drop=True)
        assert a.equals(b)
        assert 0 < len(a) < 500  # a strict, non-empty subset at 10%

    def test_json_props_parses_all(self):
        from invertedindex_ray.pipelines.relational import json_props

        df = _pdf(json_props(SF))
        assert df["k"].notna().all()
        assert (df["k"] >= 0).all()

    def test_late_events_watermark_semantics(self):
        from invertedindex_ray.pipelines.relational import late_events

        df = _pdf(late_events(SF, lateness_minutes=0))
        # with zero allowed lateness, any out-of-arrival-order event is
        # late; with a huge allowance, none are
        df2 = _pdf(late_events(SF, lateness_minutes=10**7))
        assert df["is_late"].sum() >= df2["is_late"].sum()
        assert df2["is_late"].sum() == 0

    def test_whale_user_fails_loudly(self):
        """The one-user-per-task contract (VERDICT r2 #6): a key whose
        rows exceed max_group_rows must raise a loud ValueError with the
        key and remediation, never silently OOM a worker. All four
        per-key operators share the guard; sessionize exercises it end
        to end through Ray, the rest via the guard directly."""
        import pytest as _pt
        import ray

        from invertedindex_ray.pipelines.relational import guard_group_rows
        from invertedindex_ray.pipelines.windows import sessionize

        with _pt.raises(ValueError, match="whale.*1000 rows|asof_join_events"):
            guard_group_rows("asof_join_events", "whale", 1000, 10)
        guard_group_rows("asof_join_events", "ok", 10, 10)  # at bound: fine

        # end to end: sf0.001 events have >5 rows for some user, so a
        # tiny bound must blow up inside the map_groups task
        with _pt.raises((ValueError, ray.exceptions.RayTaskError)) as ei:
            _pdf(sessionize(SF, max_group_rows=5))
        assert "above the per-task bound" in str(ei.value)

    def test_asof_join_brute_force(self):
        import duckdb

        from invertedindex_ray.pipelines.relational import asof_join_events

        got = _pdf(asof_join_events(SF)).sort_values("event_id").reset_index(drop=True)
        ev = duckdb.sql(
            f"select event_id, user_id, epoch_us(ts) t, event_type, value "
            f"from read_parquet('{SF}/events.parquet')"
        ).fetchdf()
        import numpy as np

        expect = {}
        for _, r in ev[ev.event_type == "purchase"].iterrows():
            cand = ev[(ev.user_id == r.user_id) & (ev.event_type == "click")
                      & (ev.t <= r.t)]
            if len(cand):
                best_t = cand.t.max()
                expect[int(r.event_id)] = float(cand[cand.t == best_t].value.max())
            else:
                expect[int(r.event_id)] = None
        for _, r in got.iterrows():
            want = expect[int(r.event_id)]
            if want is None:
                assert np.isnan(r.prior_value) or r.prior_value is None, r.event_id
            else:
                assert r.prior_value == want, r.event_id


@pytest.mark.usefixtures("ray_session")
class TestCuration:
    def test_export_shards_write_and_readback(self, tmp_path):
        """The written shard dirs must reproduce the full corpus exactly
        (no loss, no dup), shard assignment must be deterministic across
        runs, and the returned manifest must match what is on disk."""
        import os

        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.curation import export_shards

        out = str(tmp_path / "shards")
        manifest = _pdf(export_shards(SF, out, n_shards=4, seed=7))
        manifest = manifest.sort_values("shard").reset_index(drop=True)
        assert manifest["n_docs"].sum() == 500
        shard_dirs = sorted(os.listdir(out))
        assert shard_dirs == [f"shard={i}" for i in range(4)]
        seen = {}
        for sd in shard_dirs:
            k = int(sd.split("=")[1])
            t = pq.read_table(
                os.path.join(out, sd)
            )
            row = manifest[manifest["shard"] == k].iloc[0]
            assert t.num_rows == row["n_docs"]
            assert int(
                np.asarray(t["n_chars"].to_pylist()).sum()
            ) == row["n_chars_t"]
            for d in t["doc_id"].to_pylist():
                seen[d] = k
        assert len(seen) == 500  # every doc exactly once across shards
        # determinism: same seed -> same manifest; new seed -> reshuffle
        again = _pdf(export_shards(SF, None, n_shards=4, seed=7)).sort_values(
            "shard"
        ).reset_index(drop=True)
        assert again.equals(manifest)
        other = _pdf(export_shards(SF, None, n_shards=4, seed=8))
        assert not other.sort_values("shard").reset_index(drop=True).equals(manifest)

    def test_pack_sequences_conserves_words(self):
        """Packing must conserve every word: Σ n_words == corpus words,
        every non-final sequence of a shard is exactly seq_len words,
        and re-splitting the packed text reproduces the shard's doc
        stream in doc_id order."""
        import pyarrow.parquet as pq

        from invertedindex_ray.functions.hashing import md5_hash63
        from invertedindex_ray.pipelines.curation import pack_sequences

        L = 64
        df = _pdf(pack_sequences(SF, seq_len=L, n_shards=4, seed=0))
        docs = pq.read_table(f"{SF}/documents.parquet",
                             columns=["doc_id", "text"]).to_pandas()
        total_words = int(docs["text"].map(lambda s: len(s.split(" "))).sum())
        assert int(df["n_words"].sum()) == total_words
        for shard, g in df.groupby("shard"):
            g = g.sort_values("seq_idx")
            assert (g["n_words"].iloc[:-1] == L).all()  # only the tail is short
            assert list(g["seq_idx"]) == list(range(len(g)))
            # stream equality vs a direct per-shard concat
            h = md5_hash63([f"{int(i)}#0" for i in docs["doc_id"]])
            mine = docs[(h % 4) == shard].sort_values("doc_id")
            expect = " ".join(mine["text"])
            assert " ".join(g["text_packed"]) == expect

    def test_unigram_surprisal_ordering(self):
        """Docs made of rare tokens must score higher surprisal than the
        corpus median; token counts must match a direct split."""
        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.textstats import unigram_surprisal

        df = _pdf(unigram_surprisal(SF)).set_index("doc_id")
        texts = pq.read_table(f"{SF}/documents.parquet",
                              columns=["doc_id", "text"]).to_pandas()
        nt = texts.set_index("doc_id")["text"].map(lambda s: len(s.split(" ")))
        assert (df["n_tokens"].sort_index() == nt.sort_index()).all()
        # exact oracle on one doc
        from collections import Counter

        allw = Counter(w for t in texts["text"] for w in t.split(" "))
        N = sum(allw.values())
        d0 = texts.iloc[0]
        ws = d0["text"].split(" ")
        exp = np.mean([-np.log(allw[w] / N) for w in ws])
        assert abs(df.loc[d0["doc_id"], "surprisal_r"] - exp) < 1e-5

    def test_bigram_xent_exact_oracle(self):
        """Per-doc mean -ln p(w2|w1) under the corpus MLE bigram LM must
        match a direct Counter-based computation on one doc, and every
        doc with >= 2 tokens must appear with its exact bigram count."""
        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.textstats import bigram_xent

        df = _pdf(bigram_xent(SF)).set_index("doc_id")
        texts = pq.read_table(f"{SF}/documents.parquet",
                              columns=["doc_id", "text"]).to_pandas()
        from collections import Counter

        bc: Counter = Counter()
        lc: Counter = Counter()
        for t in texts["text"]:
            ws = t.split(" ")
            for a, b in zip(ws, ws[1:]):
                bc[(a, b)] += 1
                lc[a] += 1
        expected_docs = {
            int(r["doc_id"])
            for _, r in texts.iterrows()
            if len(r["text"].split(" ")) >= 2
        }
        assert set(df.index) == expected_docs
        d0 = texts.iloc[0]
        ws = d0["text"].split(" ")
        pairs = list(zip(ws, ws[1:]))
        exp = np.mean([-np.log(bc[p] / lc[p[0]]) for p in pairs])
        row = df.loc[int(d0["doc_id"])]
        assert int(row["n_bigrams"]) == len(pairs)
        assert abs(row["xent_r"] - exp) < 1e-5

    def test_quality_filter_mask_consistent_with_signals(self):
        """The fused one-pass verdict must agree rule-by-rule with the
        standalone quality_score / repetition_stats pipelines at the
        same thresholds (and actually drop something)."""
        from invertedindex_ray.pipelines.textstats import (
            quality_filter,
            quality_score,
            repetition_stats,
        )

        f = _pdf(quality_filter(SF)).set_index("doc_id").sort_index()
        q = _pdf(quality_score(SF)).set_index("doc_id").sort_index()
        r = _pdf(repetition_stats(SF)).set_index("doc_id").sort_index()
        mask = (
            (r["n_words"] < 20) * 1
            + (r["n_words"] > 100_000) * 2
            + (q["alpha_ratio_r"] < 0.8) * 4
            + (q["stop_ratio_r"] < 0.02) * 8
            + (r["top_word_ratio_r"] > 0.15) * 16
            + (r["dup_bigram_ratio_r"] > 0.06) * 32
        )
        assert (f["fail_mask"] == mask).all()
        assert (f["keep"] == (mask == 0).astype(int)).all()
        assert 0 < f["keep"].sum() < len(f)  # the filter must bite

    def test_pii_redact_counts_and_clean(self):
        import re

        from invertedindex_ray.pipelines.curation import PII_PATTERNS, pii_redact

        df = _pdf(pii_redact(SF))
        assert len(df) == 500
        pats = {name: re.compile(pat) for name, pat, _ in PII_PATTERNS}
        # redacted text contains no surviving matches of any pattern
        for col, name in (("n_email", "email"), ("n_phone", "phone"), ("n_ip", "ip")):
            assert (df[col] >= 0).all()
            assert not df["clean_text"].str.contains(pats[name], regex=True).any()
        # spot-check counts against Python re on a sample of originals
        import pyarrow.parquet as pq

        texts = pq.read_table(f"{SF}/documents.parquet",
                              columns=["doc_id", "text"]).to_pandas()
        m = df.merge(texts, on="doc_id").head(50)
        for _, r in m.iterrows():
            assert r.n_email == len(pats["email"].findall(r.text or ""))

    def test_normalize_text_alphabet(self):
        from invertedindex_ray.pipelines.curation import normalize_text

        df = _pdf(normalize_text(SF))
        assert len(df) == 500
        ok = df["norm_text"].str.fullmatch(r"([a-z0-9]+( [a-z0-9]+)*)?")
        assert ok.all()
        assert (df["n_norm_chars"] == df["norm_text"].str.len()).all()

    def test_stratified_sample_rates_and_nesting(self):
        from invertedindex_ray.pipelines.curation import stratified_sample

        df = _pdf(stratified_sample(SF))
        assert (df.groupby("source").size().index != "src1").all()  # rate 0
        # determinism + nesting: a lower uniform rate is a subset
        lo = _pdf(stratified_sample(SF, rates_permille={}, default_permille=50))
        hi = _pdf(stratified_sample(SF, rates_permille={}, default_permille=200))
        assert set(lo.doc_id) <= set(hi.doc_id)
        again = _pdf(stratified_sample(SF))
        assert sorted(again.doc_id) == sorted(df.doc_id)

    def test_source_stats_matches_pandas(self):
        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.curation import source_stats

        got = _pdf(source_stats(SF)).sort_values("source").reset_index(drop=True)
        docs = pq.read_table(f"{SF}/documents.parquet",
                             columns=["source", "lang", "n_chars"]).to_pandas()
        g = docs.groupby("source")
        want_docs = g.size()
        want_chars = g.n_chars.sum()
        want_langs = g.lang.nunique()
        for _, r in got.iterrows():
            assert r.n_docs == want_docs[r.source]
            assert r.n_chars_sum == want_chars[r.source]
            assert r.n_langs == want_langs[r.source]
            assert abs(r.avg_chars_r - r.n_chars_sum / r.n_docs) < 1e-6

    def test_contamination_semantics(self):
        from invertedindex_ray.pipelines.curation import contamination_check

        df = _pdf(contamination_check(SF))
        # benchmark docs (doc_id % 97 == 0) are excluded from the output
        assert not (df.doc_id % 97 == 0).any()
        assert ((df.contaminated == 1) == (df.n_overlap >= 0.2 * df.n_grams)).all()
        assert (df.n_overlap <= df.n_grams).all()
        assert df.contaminated.sum() > 0  # synthetic corpus has known dupes

    def test_top_keywords_rank_contract(self):
        from invertedindex_ray.pipelines.curation import top_keywords

        df = _pdf(top_keywords(SF))
        g = df.groupby("doc_id")
        assert (g["rank"].max() <= 5).all()
        assert (g["rank"].min() == 1).all()
        # within a doc, rank order == (tfidf desc, term asc)
        for _, grp in list(g)[:25]:
            s = grp.sort_values("rank")
            pairs = list(zip(-s.tfidf_r, s.term))
            assert pairs == sorted(pairs)


@pytest.mark.usefixtures("ray_session")
class TestRepetitionStats:
    def test_handcrafted_docs(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.textstats import repetition_stats

        docs = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                "text": [
                    "spam spam spam spam",           # one word repeated
                    "a b c d e",                     # all distinct
                    "x y x y x y",                   # repeated bigram stream
                    "",                               # degenerate
                ],
                "lang": ["en"] * 4,
                "source": ["s"] * 4,
                "n_chars": pa.array([19, 9, 11, 0], type=pa.int64()),
            }
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        df = (
            repetition_stats(str(tmp_path))
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        r1 = df.loc[1]
        assert r1.n_words == 4 and r1.n_unique_words == 1
        assert r1.top_word_ratio_r == 1.0
        assert r1.dup_bigram_ratio_r == 0.666667  # 3 bigrams, 1 unique, round 6
        r2 = df.loc[2]
        assert r2.top_word_ratio_r == 0.2 and r2.dup_bigram_ratio_r == 0.0
        r3 = df.loc[3]
        # 5 bigrams: xy,yx,xy,yx,xy -> 2 unique, max count 3
        assert r3.n_bigrams == 5 and r3.dup_bigram_ratio_r == 0.6
        assert r3.top_bigram_ratio_r == 0.6
        r4 = df.loc[4]
        assert r4.n_words == 0 and r4.top_word_ratio_r == 0.0
        assert r4.n_bigrams == 0 and r4.dup_bigram_ratio_r == 0.0

    def test_invariants_on_corpus(self):
        from invertedindex_ray.pipelines.textstats import repetition_stats

        df = _pdf(repetition_stats(SF))
        assert len(df) == 500
        assert (df.n_unique_words <= df.n_words).all()
        assert ((df.top_word_ratio_r >= 0) & (df.top_word_ratio_r <= 1)).all()
        assert ((df.dup_bigram_ratio_r >= 0) & (df.dup_bigram_ratio_r < 1)).all()
        assert (df.n_bigrams == (df.n_words - 1).clip(lower=0)).all()


@pytest.mark.usefixtures("ray_session")
class TestMoreLikeThis:
    def test_contract_and_relevance(self):
        from invertedindex_ray.pipelines.mlt import more_like_this, seed_keywords

        kws = seed_keywords(SF, seed_mod=101, m=5)
        assert set(kws) == {0, 101, 202, 303, 404}
        assert all(1 <= len(v) <= 5 for v in kws.values())

        df = _pdf(more_like_this(SF, seed_mod=101, m=5, k=10))
        for seed, grp in df.groupby("seed_id"):
            # seed never appears in its own results
            assert (grp.doc_id != seed).all()
            s = grp.sort_values("rank")
            assert list(s["rank"]) == list(range(1, len(s) + 1))
            assert (s.score_r.diff().dropna() <= 0).all()
            assert (s.score_r > 0).all()  # every hit shares >=1 keyword

    def test_exclude_hook(self):
        from invertedindex_ray.pipelines.batch_query import batch_topk

        base = batch_topk(SF, [("q1", "or data query join")], k=5).to_pandas()
        top_doc = int(base.iloc[0].doc_id)
        ex = batch_topk(
            SF, [("q1", "or data query join")], k=5, exclude={"q1": top_doc}
        ).to_pandas()
        assert top_doc not in set(ex.doc_id)
        # rank 1 is re-assigned to the runner-up, not left as a gap
        assert int(ex.iloc[0]["rank"]) == 1
        assert int(ex.iloc[0].doc_id) == int(base.iloc[1].doc_id)


@pytest.mark.usefixtures("ray_session")
class TestHLL:
    def test_small_vocab_near_exact(self):
        """Tiny vocabularies hit the linear-counting regime — the
        estimate should be essentially exact."""
        import duckdb

        from invertedindex_ray.pipelines.sketches import hll_distinct_terms

        est = int(_pdf(hll_distinct_terms(SF)).n_distinct_est[0])
        true = duckdb.sql(
            f"""SELECT count(DISTINCT w) FROM (
                  SELECT unnest(list_filter(
                    regexp_split_to_array(lower(coalesce(text,'')), '[^a-z0-9]+'),
                    x -> x <> '')) AS w
                  FROM read_parquet('{SF}/documents.parquet'))"""
        ).fetchone()[0]
        assert abs(est - true) <= max(2, 0.02 * true)

    def test_high_cardinality_error_bound(self, tmp_path):
        """50k distinct tokens: HLL regime; error well under 4 sigma
        (sigma = 1.04/sqrt(4096) ~= 1.6%)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.sketches import hll_distinct_terms

        words = [f"w{i:06d}" for i in range(50_000)]
        texts = [" ".join(words[i : i + 100]) for i in range(0, 50_000, 100)]
        docs = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": texts,
            }
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        est = int(_pdf(hll_distinct_terms(str(tmp_path))).n_distinct_est[0])
        assert abs(est - 50_000) / 50_000 < 0.065

    def test_registers_merge_by_max(self):
        """Split-merge == one-shot sketch (the mergeability contract the
        distributed reduce relies on)."""
        from invertedindex_ray.functions.hashing import hash_strings
        from invertedindex_ray.pipelines.sketches import (
            _hll_batch_registers,
            _hll_estimate,
        )

        words = np.asarray([f"t{i}" for i in range(10_000)], dtype=object)
        h = hash_strings(words)
        full = _hll_batch_registers(h, 10)
        merged = np.maximum(
            _hll_batch_registers(h[:3000], 10),
            np.maximum(
                _hll_batch_registers(h[3000:7000], 10),
                _hll_batch_registers(h[7000:], 10),
            ),
        )
        assert (full == merged).all()
        assert _hll_estimate(full) == _hll_estimate(merged)


@pytest.mark.usefixtures("ray_session")
class TestClustering:
    def _numpy_lloyd(self, k=10, iters=5):
        import pyarrow.parquet as pq

        t = pq.read_table(f"{SF}/embeddings.parquet")
        emb = t["embedding"].combine_chunks()
        mat = (
            emb.values.to_numpy(zero_copy_only=False)
            .astype(np.float64)
            .reshape(t.num_rows, -1)
        )
        ids = t["vec_id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        c = mat[order[:k]].copy()
        for _ in range(iters):
            d2 = (mat * mat).sum(1)[:, None] - 2 * mat @ c.T + (c * c).sum(1)[None, :]
            a = np.argmin(d2, axis=1)
            new = c.copy()
            for j in range(k):
                m = a == j
                if m.any():
                    new[j] = mat[m].mean(0)
            c = new
        d2 = (mat * mat).sum(1)[:, None] - 2 * mat @ c.T + (c * c).sum(1)[None, :]
        return ids, mat, np.argmin(d2, axis=1)

    def test_kmeans_matches_numpy_lloyd(self):
        """Distributed k-means (per-block partial sums, sorted driver
        reduce) must assign every vector to the same cluster as a
        single-process Lloyd run with identical deterministic init."""
        from invertedindex_ray.pipelines.clustering import kmeans_clusters

        df = _pdf(kmeans_clusters(SF)).sort_values("vec_id").reset_index(drop=True)
        ids, _, a = self._numpy_lloyd()
        oracle = dict(zip(ids, a))
        assert len(df) == 500
        assert (
            df["cluster"].to_numpy()
            == np.array([oracle[v] for v in df["vec_id"]])
        ).all()

    def test_semantic_dedup_matches_bruteforce(self):
        """SemDeDup pairs == brute-force same-cluster cosine pairs."""
        from invertedindex_ray.pipelines.clustering import semantic_dedup

        tau = 0.35
        got = _pdf(semantic_dedup(SF, tau=tau))
        got_pairs = set(zip(got["vec_a"], got["vec_b"]))
        ids, mat, a = self._numpy_lloyd()
        n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        order = np.argsort(ids, kind="stable")
        ids_s, n_s, a_s = ids[order], n[order], a[order]
        exp = set()
        from invertedindex_ray.functions.rounding import round_half_up

        for j in range(10):
            m = a_s == j
            sub_ids, sub = ids_s[m], n_s[m]
            cos = sub @ sub.T
            ia, ib = np.triu_indices(len(sub_ids), 1)
            keep = round_half_up(cos[ia, ib], 6) >= tau
            exp |= set(zip(sub_ids[ia[keep]], sub_ids[ib[keep]]))
        assert got_pairs == exp
        assert len(exp) > 0  # the fixture must actually exercise pairs
        assert (got["cos_r"] >= tau).all()

    def test_semantic_dedup_cluster_cap_drops_only_oversized(self):
        """The cap drops pairs ONLY from clusters above the cap (the
        warning itself is emitted by _capped, whose loudness is covered
        by TestDedup.test_bucket_caps_are_loud — it fires inside Ray
        workers here, invisible to driver-side caplog)."""
        from invertedindex_ray.pipelines.clustering import semantic_dedup

        cap = 45
        tau = 0.35
        got = _pdf(semantic_dedup(SF, tau=tau, cluster_cap=cap))
        ids, mat, a = self._numpy_lloyd()
        sizes = np.bincount(a, minlength=10)
        small = {j for j in range(10) if sizes[j] <= cap}
        assert small and small != set(range(10))  # cap must bite partially
        assert set(got["cluster"]) <= small
        # and within the surviving clusters, nothing is lost
        n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        from invertedindex_ray.functions.rounding import round_half_up

        exp = set()
        for j in small:
            m = a == j
            sub_ids, sub = ids[m], n[m]
            cos = sub @ sub.T
            ia, ib = np.triu_indices(len(sub_ids), 1)
            keep = round_half_up(cos[ia, ib], 6) >= tau
            for x, y in zip(sub_ids[ia[keep]], sub_ids[ib[keep]]):
                exp.add((min(x, y), max(x, y)))
        assert set(zip(got["vec_a"], got["vec_b"])) == exp


@pytest.mark.usefixtures("ray_session")
class TestGroupedPartitions:
    """Unit semantics of dedup._grouped_partitions — the repo-wide
    replacement for high-cardinality groupby aggregates."""

    def _run(self, tbl, n_partitions=4):
        import pandas as pd
        import pyarrow as pa
        import ray.data as rd

        from invertedindex_ray.pipelines.dedup import _grouped_partitions

        schema = pa.schema([("k", pa.int64()), ("s", pa.int64())])

        def group_fn(g: pd.DataFrame) -> pd.DataFrame:
            k = g["k"].to_numpy()
            v = g["v"].to_numpy()
            order = np.argsort(k, kind="stable")
            k, v = k[order], v[order]
            first = np.ones(len(k), dtype=bool)
            if len(k):
                first[1:] = k[1:] != k[:-1]
            starts = np.flatnonzero(first)
            import numpy as _np

            return pd.DataFrame(
                {"k": k[starts], "s": _np.add.reduceat(v, starts) if len(v) else []}
            )

        return _grouped_partitions(
            rd.from_arrow(tbl),
            lambda b: b["k"].to_numpy(zero_copy_only=False).astype(np.uint64)
            % np.uint64(n_partitions),
            group_fn,
            schema,
            n_partitions=n_partitions,
        ).to_pandas()

    def test_exact_per_key_sums(self):
        import pyarrow as pa

        rng = np.random.default_rng(1)
        k = rng.integers(0, 1000, 20_000).astype(np.int64)
        v = rng.integers(0, 100, 20_000).astype(np.int64)
        got = self._run(pa.table({"k": k, "v": v})).set_index("k")["s"]
        import pandas as pd

        exp = pd.Series(v).groupby(pd.Series(k)).sum()
        assert got.sort_index().equals(exp.sort_index())

    def test_empty_input_yields_typed_empty(self):
        """A fully-empty input must still produce a dataset whose SCHEMA
        is the declared one (that is what downstream joins resolve keys
        against — the round-2 minhash crash class). Ray's to_pandas drops
        columns on any empty dataset, so assert on the dataset schema."""
        import pyarrow as pa
        import pandas as pd
        import ray.data as rd

        from invertedindex_ray.pipelines.dedup import _grouped_partitions

        schema = pa.schema([("k", pa.int64()), ("s", pa.int64())])
        tbl = pa.table(
            {"k": pa.array([], type=pa.int64()), "v": pa.array([], type=pa.int64())}
        )

        def gf(g: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"k": [], "s": []})

        out = _grouped_partitions(
            rd.from_arrow(tbl),
            lambda b: b["k"].to_numpy(zero_copy_only=False).astype(np.uint64)
            % np.uint64(4),
            gf,
            schema,
            n_partitions=4,
        )
        assert out.count() == 0
        s = out.schema(fetch_if_missing=True)
        assert s.names == ["k", "s"]

    def test_all_rows_of_key_share_partition(self):
        """Correctness precondition: per-key reductions are exact because
        a key never splits across partitions — each key appears exactly
        once in the output."""
        import pyarrow as pa

        k = np.repeat(np.arange(97, dtype=np.int64), 13)
        v = np.ones(len(k), dtype=np.int64)
        got = self._run(pa.table({"k": k, "v": v}))
        assert got["k"].is_unique
        assert (got["s"] == 13).all()


@pytest.mark.usefixtures("ray_session")
class TestPhraseSearch:
    def _run(self, docs, phrases, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data as rd

        from invertedindex_ray.pipelines.phrase import phrase_search

        p = tmp_path / "docs.parquet"
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(docs)), type=pa.int64()),
                    "text": pa.array(docs, type=pa.string()),
                }
            ),
            str(p),
        )
        # phrase_search reads <dir>/documents.parquet
        import os
        os.rename(str(p), str(tmp_path / "documents.parquet"))
        df = phrase_search(str(tmp_path), phrases).to_pandas()
        return {
            (r.phrase, r.doc_id): r.n_matches for r in df.itertuples()
        }

    def test_basic_and_overlap_and_boundaries(self, tmp_path):
        docs = [
            "alpha beta gamma",            # phrase at doc start
            "x alpha beta",                # phrase at doc end
            "alpha Beta! alpha beta",      # normalization + two matches
            "beta alpha",                  # reversed: no match
            "",                            # empty doc
            "run run run run",             # overlapping trigram: 2 matches
        ]
        got = self._run(
            docs, ["alpha beta", "run run run", "gamma", "nope nope"], tmp_path
        )
        assert got[("alpha beta", 0)] == 1
        assert got[("alpha beta", 1)] == 1
        assert got[("alpha beta", 2)] == 2
        assert ("alpha beta", 3) not in got
        assert got[("run run run", 5)] == 2
        assert got[("gamma", 0)] == 1
        assert all(p != "nope nope" for p, _ in got)

    def test_no_cross_doc_match(self, tmp_path):
        # "beta" ends doc 0 and "alpha" starts doc 1: the flattened token
        # stream is contiguous, so the doc-boundary guard must reject it
        got = self._run(["x beta", "alpha y"], ["beta alpha"], tmp_path)
        assert got == {}

    def test_matches_duckdb_on_corpus(self):
        import duckdb

        from invertedindex_ray.pipelines.phrase import (
            DRIVER_PHRASES,
            phrase_search,
        )

        df = (
            phrase_search(SF)
            .to_pandas()
            .sort_values(["phrase", "doc_id"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')"
        )
        import sys
        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as entry

        exp = (
            con.execute(entry._phrase_sql())
            .fetchdf()
            .sort_values(["phrase", "doc_id"])
            .reset_index(drop=True)
        )
        assert len(df) == len(exp) > 0
        assert (df["n_matches"].to_numpy() == exp["n_matches"].to_numpy()).all()
        assert (df["doc_id"].to_numpy() == exp["doc_id"].to_numpy()).all()


class TestDSIR:
    def test_matches_sql_oracle_and_favors_target_lang(self):
        """Bit-exact parity with the driver oracle at sf0.001, plus the
        semantic invariant the weight exists for: target-language (en)
        docs must score a higher mean importance weight than the rest."""
        import duckdb
        import pandas as pd
        import __ray_entry__ as e

        from invertedindex_ray.pipelines.textstats import dsir_weights

        df = _pdf(dsir_weights(SF)).sort_values("doc_id").reset_index(drop=True)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
        )
        exp = (
            con.execute(e.oracle_sql()["dsir_weights"])
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(df, exp, check_dtype=False)

        langs = pd.read_parquet(
            f"{SF}/documents.parquet", columns=["doc_id", "lang"]
        )
        m = df.merge(langs, on="doc_id")
        mean_en = m.loc[m["lang"] == "en", "dsir_logw_r"].mean()
        mean_rest = m.loc[m["lang"] != "en", "dsir_logw_r"].mean()
        assert mean_en > mean_rest


class TestRM3:
    QUERIES = [
        ("r1", "OR join hash merge"),
        ("r2", "OR data query stream"),
        ("r3", "AND sort merge join"),  # treated disjunctively by RM3
    ]

    def test_matches_sql_oracle(self):
        """Bit-exact parity of the full feedback loop with the driver
        oracle at sf0.001 (driver query set)."""
        import duckdb
        import pandas as pd
        import __ray_entry__ as e

        from invertedindex_ray.pipelines.rm3 import rm3_search
        from invertedindex_ray.pipelines.query_sets import DRIVER_QUERY_SET

        df = (
            rm3_search(SF, DRIVER_QUERY_SET)
            .to_pandas()
            .sort_values(["qid", "rank"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
        )
        exp = (
            con.execute(e.oracle_sql()["rm3_search"])
            .df()
            .sort_values(["qid", "rank"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(df, exp, check_dtype=False)

    def test_alpha_one_degenerates_to_plain_or(self):
        """alpha=1.0 kills the expansion: ranking must equal the plain
        disjunctive batch retrieval (scores scaled by 1/|q|)."""
        from invertedindex_ray.pipelines.batch_query import batch_topk, parse_queries
        from invertedindex_ray.pipelines.analytics import NOSTEM
        from invertedindex_ray.pipelines.rm3 import rm3_search

        got = rm3_search(SF, self.QUERIES, alpha=1.0, k=10).to_pandas()
        parsed = [(q, "or", t) for q, _, t in parse_queries(self.QUERIES, NOSTEM)]
        plain = batch_topk(SF, None, k=10, parsed=parsed).to_pandas()
        g = got.sort_values(["qid", "rank"]).reset_index(drop=True)
        p = plain.sort_values(["qid", "rank"]).reset_index(drop=True)
        assert (g["qid"] == p["qid"]).all()
        assert (g["doc_id"] == p["doc_id"]).all()

    def test_expansion_changes_ranking(self):
        """With default alpha the expanded query must retrieve at least
        one doc the original top-k missed (otherwise feedback is a no-op
        and the operator is pointless)."""
        from invertedindex_ray.pipelines.batch_query import batch_topk, parse_queries
        from invertedindex_ray.pipelines.analytics import NOSTEM
        from invertedindex_ray.pipelines.rm3 import rm3_search

        got = rm3_search(SF, self.QUERIES, k=10).to_pandas()
        parsed = [(q, "or", t) for q, _, t in parse_queries(self.QUERIES, NOSTEM)]
        plain = batch_topk(SF, None, k=10, parsed=parsed).to_pandas()
        diff = False
        for qid in got["qid"].unique():
            a = set(got.loc[got["qid"] == qid, "doc_id"])
            b = set(plain.loc[plain["qid"] == qid, "doc_id"])
            if a - b:
                diff = True
        assert diff


class TestDupSpans:
    def test_handcrafted_spans(self, tmp_path):
        """Two docs share a 10-word passage -> both report a merged span
        covering it; a doc that repeats its OWN 8-gram only is silent
        (within-doc repeats belong to repetition_stats)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.spans import dup_ngram_spans

        shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        selfrep = "one two three four five six seven eight " * 2
        docs = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                "text": pa.array(
                    [
                        "prefix words here " + shared + " tail one",
                        shared + " other suffix entirely",
                        selfrep.strip(),
                    ]
                ),
            }
        )
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(docs, str(d / "documents.parquet"))
        df = _pdf(dup_ngram_spans(str(d))).sort_values(
            ["doc_id", "span_start"]
        ).reset_index(drop=True)
        assert set(df["doc_id"]) == {1, 2}
        # doc 1: shared passage is words 4..13 -> starts 4..6 (n=8),
        # span_end = 6 + 7 = 13; doc 2: starts 1..3, end 10
        r1 = df[df["doc_id"] == 1].iloc[0]
        assert (r1["span_start"], r1["span_end"], r1["n_grams"]) == (4, 13, 3)
        r2 = df[df["doc_id"] == 2].iloc[0]
        assert (r2["span_start"], r2["span_end"], r2["n_grams"]) == (1, 10, 3)

    def test_corpus_invariants(self):
        """Spans are within doc token bounds, non-overlapping per doc,
        and every span length >= n words."""
        from invertedindex_ray.pipelines.spans import dup_ngram_spans
        from invertedindex_ray.pipelines.textstats import token_count

        df = _pdf(dup_ngram_spans(SF))
        nt = _pdf(token_count(SF)).set_index("doc_id")["n_tokens"]
        assert len(df) > 0
        assert (df["span_start"] >= 1).all()
        assert (df["span_end"] - df["span_start"] >= 7).all()
        assert (df["span_end"] <= df["doc_id"].map(nt)).all()
        for _, g in df.groupby("doc_id"):
            g = g.sort_values("span_start")
            # merged islands: next span starts at least 2 after prev start
            # and must not be mergeable (gap in start positions)
            assert (g["span_start"].diff().dropna() > g["n_grams"].iloc[:-1].values).all()


@pytest.mark.usefixtures("ray_session")
class TestDedupClusters:
    def _pairs(self, a, b):
        import pyarrow as pa
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array(a, type=pa.int64()),
                    "doc_b": pa.array(b, type=pa.int64()),
                }
            )
        )

    def test_handcrafted_components(self):
        """Chain (diameter 9, stresses multi-round propagation),
        triangle, isolated pair: transitive closure with min-id rep."""
        from invertedindex_ray.pipelines.dedup import cluster_pairs

        a = [1, 2, 3, 4, 5, 6, 7, 8, 9, 100, 100, 101, 200]
        b = [2, 3, 4, 5, 6, 7, 8, 9, 10, 101, 102, 102, 201]
        df = _pdf(cluster_pairs(self._pairs(a, b))).sort_values(
            "doc_id"
        ).reset_index(drop=True)
        chain = df[df.doc_id <= 10]
        assert len(chain) == 10
        assert (chain.cluster_rep == 1).all()
        assert (chain.cluster_size == 10).all()
        tri = df[(df.doc_id >= 100) & (df.doc_id <= 102)]
        assert (tri.cluster_rep == 100).all() and (tri.cluster_size == 3).all()
        pair = df[df.doc_id >= 200]
        assert (pair.cluster_rep == 200).all() and (pair.cluster_size == 2).all()

    def test_nonconvergence_is_loud(self):
        """A diameter-5 chain cannot converge in 3 rounds: the cap must
        raise, never return a silently-wrong partial labeling."""
        from invertedindex_ray.pipelines.dedup import cluster_pairs

        p = self._pairs([1, 2, 3, 4, 5], [2, 3, 4, 5, 6])
        with pytest.raises(RuntimeError, match="converge"):
            _pdf(cluster_pairs(p, max_iters=3))

    def test_corpus_matches_union_find(self):
        """dedup_clusters == a local union-find over the same verified
        MinHash pairs (independent reference implementation)."""
        from invertedindex_ray.pipelines.dedup import (
            dedup_clusters,
            minhash_lsh_pairs,
        )

        pairs = _pdf(minhash_lsh_pairs(SF, threshold=0.5))
        parent: dict[int, int] = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(pairs.doc_a, pairs.doc_b):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expect = {n: find(n) for n in parent}
        df = _pdf(dedup_clusters(SF, threshold=0.5))
        got = dict(zip(df.doc_id.astype(int), df.cluster_rep.astype(int)))
        assert got == expect
        sizes = df.groupby("cluster_rep")["doc_id"].transform("size")
        assert (df.cluster_size.to_numpy() == sizes.to_numpy()).all()

    def test_dedup_filter_keeps_reps_only(self):
        """Survivors = corpus minus non-representative cluster members;
        every cluster keeps exactly its min-id rep."""
        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.dedup import dedup_clusters, dedup_filter

        cl = _pdf(dedup_clusters(SF, threshold=0.5))
        kept = set(_pdf(dedup_filter(SF, threshold=0.5)).doc_id.astype(int))
        all_ids = set(
            pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
            .column("doc_id").to_pylist()
        )
        removed = set(cl[cl.doc_id != cl.cluster_rep].doc_id.astype(int))
        assert kept == all_ids - removed
        assert set(cl.cluster_rep.astype(int)) <= kept


@pytest.mark.usefixtures("ray_session")
class TestProximity:
    def test_handcrafted_windows(self, tmp_path):
        """Window-edge inclusion, ordered-pair counting, min distance,
        cross-doc isolation, absent terms."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.proximity import proximity_search

        docs = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                "text": pa.array(
                    [
                        # alpha at 1,6; beta at 4 -> pairs (1,4) d=3 in,
                        # (6,4) d=2 in for w=3 => n_pairs=2, min=2
                        "alpha x y beta z alpha",
                        # alpha at 1, beta at 5 -> d=4 > w=3: no row
                        "alpha x y z beta",
                        # beta only: pairing with doc 1's alphas must NOT leak
                        "beta beta beta",
                    ]
                ),
            }
        )
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(docs, str(d / "documents.parquet"))
        df = _pdf(
            proximity_search(str(d), queries=[("alpha", "beta", 3), ("alpha", "nope", 9)])
        )
        assert len(df) == 1
        r = df.iloc[0]
        assert (r["doc_id"], r["n_pairs"], r["min_dist"]) == (1, 2, 2)

    def test_symmetric_window(self, tmp_path):
        """b before a counts too (|pa - pb| semantics, both orders)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.proximity import proximity_search

        docs = pa.table(
            {
                "doc_id": pa.array([7], type=pa.int64()),
                "text": pa.array(["beta x alpha"]),
            }
        )
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(docs, str(d / "documents.parquet"))
        df = _pdf(proximity_search(str(d), queries=[("alpha", "beta", 2)]))
        assert len(df) == 1
        assert (df.iloc[0]["n_pairs"], df.iloc[0]["min_dist"]) == (1, 2)


@pytest.mark.usefixtures("ray_session")
class TestDSIRSelect:
    def test_matches_local_gumbel_topk(self):
        """dsir_select == local Gumbel-top-k recomputed from the weight
        table (independent reference path, no block-partial logic)."""
        from invertedindex_ray.functions.hashing import md5_hash63
        from invertedindex_ray.functions.rounding import round_half_up
        from invertedindex_ray.pipelines.textstats import dsir_select, dsir_weights

        w = _pdf(dsir_weights(SF))
        h = md5_hash63([str(int(i)) for i in w.doc_id])
        u = ((h & np.int64((1 << 53) - 1)).astype(np.float64) + 0.5) / float(1 << 53)
        w = w.assign(key=round_half_up(w.dsir_logw_r.to_numpy() + (-np.log(-np.log(u))), 6))
        expect = w.sort_values(["key", "doc_id"], ascending=[False, True]).head(20)
        got = dsir_select(SF, n=20)
        assert list(got.doc_id) == list(expect.doc_id)
        assert np.allclose(got.sel_key_r, expect.key)
        # deterministic across runs
        again = dsir_select(SF, n=20)
        assert list(again.doc_id) == list(got.doc_id)


@pytest.mark.usefixtures("ray_session")
class TestSnippet:
    def test_handcrafted_best_window(self, tmp_path):
        """Max-hit window wins; earliest anchor breaks ties; zero-hit
        docs and absent-term queries emit nothing."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.snippet import snippet_windows

        docs = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                "text": pa.array(
                    [
                        # hits at 1, 5, 6, 7 (alpha/beta); w=4: window
                        # anchored at 5 holds {5,6,7} = 3 hits (max)
                        "alpha x y z beta alpha beta z z",
                        # hits at 2 and 6; w=4 -> two windows of 1 hit
                        # each; earliest anchor 2 wins the tie
                        "x alpha y z q beta",
                        "nothing relevant here",
                    ]
                ),
            }
        )
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(docs, str(d / "documents.parquet"))
        df = _pdf(
            snippet_windows(str(d), queries=[("alpha beta", 4), ("zz yy", 3)])
        ).sort_values("doc_id").reset_index(drop=True)
        assert list(df.doc_id) == [1, 2]
        assert (df.iloc[0]["win_start"], df.iloc[0]["n_hits"]) == (5, 3)
        assert (df.iloc[1]["win_start"], df.iloc[1]["n_hits"]) == (2, 1)


@pytest.mark.usefixtures("ray_session")
class TestPMI:
    def test_handcrafted_pmi(self, tmp_path):
        """Exclusive collocation outranks frequent-but-independent pair;
        min_count floors support."""
        import math

        import pyarrow as pa
        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.textstats import pmi_bigrams

        # "zig zag" always together (5x); "the cat"/"the dog" dilute "the"
        text1 = "zig zag " * 5
        text2 = "the cat the dog " * 5
        docs = pa.table(
            {
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "text": pa.array([text1.strip(), text2.strip()]),
            }
        )
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(docs, str(d / "documents.parquet"))
        df = pmi_bigrams(str(d), min_count=5, k=10)
        assert (df.iloc[0]["w1"], df.iloc[0]["w2"]) == ("zig", "zag")
        # exact PMI: c(zig zag)=5, c(zig)=c(zag)=5, N_uni=30, N_bi=28
        expect = math.log((5 / 28) / ((5 / 30) * (5 / 30)))
        assert abs(df.iloc[0]["pmi_r"] - round(expect, 6)) < 1e-9
        # rare pairs (count < 5) never appear
        assert (df["n_pairs"] >= 5).all()


@pytest.mark.usefixtures("ray_session")
class TestMixRebalance:
    def test_bottleneck_keeps_all_and_mix_lands(self, tmp_path):
        """The bottleneck group keeps every doc; other groups downsample
        toward the target ratio; unknown groups are dropped."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.curation import mix_rebalance

        n_a, n_b, n_x = 400, 50, 30
        docs = pa.table(
            {
                "doc_id": pa.array(range(n_a + n_b + n_x), type=pa.int64()),
                "lang": pa.array(["en"] * n_a + ["de"] * n_b + ["xx"] * n_x),
            }
        )
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(docs, str(d / "documents.parquet"))
        # target 50/50: de (50 docs) is the bottleneck -> keeps all 50,
        # en downsamples to ~50
        df = _pdf(mix_rebalance(str(d), weights={"en": 0.5, "de": 0.5}))
        by = df.lang.value_counts().to_dict()
        assert by.get("de") == n_b
        assert "xx" not in by
        assert abs(by.get("en", 0) - n_b) <= 25  # binomial tolerance
        # deterministic
        df2 = _pdf(mix_rebalance(str(d), weights={"en": 0.5, "de": 0.5}))
        assert sorted(df.doc_id) == sorted(df2.doc_id)


@pytest.mark.usefixtures("ray_session")
class TestLengthQuantiles:
    def test_matches_full_sort(self):
        """Histogram-path quantiles == brute-force sorted-array indexing
        (ceil(q*N)-1) on the gathered token counts."""
        import math

        from invertedindex_ray.pipelines.textstats import (
            DRIVER_QUANTILES,
            length_quantiles,
            token_count,
        )

        n = np.sort(_pdf(token_count(SF)).n_tokens.to_numpy())
        df = length_quantiles(SF)
        for q, v in zip(df.q, df.n_tokens):
            assert v == n[max(math.ceil(q * len(n)) - 1, 0)]
        assert list(df.q) == list(DRIVER_QUANTILES)


@pytest.mark.usefixtures("ray_session")
class TestPrefixTerms:
    def test_prefix_matches_lexicon(self):
        """prefix_terms rows == the lexicon filtered by startswith; the
        absent prefix contributes nothing."""
        from invertedindex_ray.pipelines.analytics import lexicon, prefix_terms

        lex = _pdf(lexicon(SF))
        df = _pdf(prefix_terms(SF, prefixes=["s", "zzq"]))
        want = lex[lex.term.str.startswith("s")]
        assert set(df[df.prefix == "s"].term) == set(want.term)
        got = df[df.prefix == "s"].set_index("term")
        for t, r in want.set_index("term").iterrows():
            assert got.loc[t, "df"] == r["df"] and got.loc[t, "cf"] == r["cf"]
        assert (df.prefix != "zzq").all()

    def test_fuzzy_matches_brute_force_levenshtein(self):
        """fuzzy_terms rows == the lexicon screened by a brute-force DP
        Levenshtein at distance <= 1 (covers substitution, insertion,
        deletion and exact hits; the absent word contributes nothing)."""
        from invertedindex_ray.pipelines.analytics import fuzzy_terms, lexicon

        def lev(a: str, b: str) -> int:
            prev = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                cur = [i]
                for j, cb in enumerate(b, 1):
                    cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                                   prev[j - 1] + (ca != cb)))
                prev = cur
            return prev[-1]

        words = ["tble", "scann", "hash", "zzzq", "vralue"]
        lex = _pdf(lexicon(SF))
        df = _pdf(fuzzy_terms(SF, words=words))
        for w in words:
            want = {t: lev(w, t) for t in lex.term if lev(w, t) <= 1}
            got = df[df.q == w].set_index("term")
            assert set(got.index) == set(want), (w, set(got.index), want)
            for t, d in want.items():
                assert int(got.loc[t, "dist"]) == d
                assert int(got.loc[t, "df"]) == int(
                    lex.set_index("term").loc[t, "df"])
        assert (df.q != "zzzq").all()


class TestGopherQuality:
    def test_rule_paths(self, tmp_path):
        """Each Gopher rule trips on exactly the crafted doc built to
        trip it; the all-clean doc keeps."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.textstats import gopher_quality

        good = (
            "The results of that study have been reviewed with care and "
            "attention to detail. " * 5
        ).strip()  # 70 words, all rules pass
        docs = pa.table(
            {
                "doc_id": [1, 2, 3, 4, 5, 6, 7, 8],
                "text": [
                    good,
                    "too few words of that, have with the be to and",  # < 50 words
                    good + " " + "#" * 1 + " #" * 20,  # symbol ratio > 0.1
                    good + "\n" + "\n".join("- bullet item here" for _ in range(60))
                    + "\n" + good,  # bullet lines > 0.9? no — mixed; see below
                    good + "\n" + "\n".join(
                        "so the story continues..." for _ in range(30)
                    ),  # ellipsis-ended lines > 0.3
                    ("1234 5678 " * 30).strip()
                    + " the be to of and that have with",  # alpha frac < 0.8
                    ("lorem dolor sit amet consectetur " * 14).strip(),  # req < 2
                    "",  # empty
                ],
            }
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        df = _pdf(gopher_quality(str(tmp_path))).set_index("doc_id").sort_index()

        assert bool(df.loc[1, "keep"])
        assert 50 <= df.loc[1, "n_words"] <= 100_000
        assert df.loc[1, "req_words"] >= 2

        assert not bool(df.loc[2, "keep"]) and df.loc[2, "n_words"] < 50
        assert not bool(df.loc[3, "keep"]) and df.loc[3, "symbol_ratio_r"] > 0.1
        # doc 4: 60 bullet lines of 62 total -> frac > 0.9
        assert df.loc[4, "n_lines"] == 62
        assert not bool(df.loc[4, "keep"]) and df.loc[4, "bullet_frac_r"] > 0.9
        assert not bool(df.loc[5, "keep"]) and df.loc[5, "ellipsis_frac_r"] > 0.3
        assert not bool(df.loc[6, "keep"]) and df.loc[6, "alpha_word_frac_r"] < 0.8
        assert not bool(df.loc[7, "keep"]) and df.loc[7, "req_words"] < 2
        assert not bool(df.loc[8, "keep"]) and df.loc[8, "n_words"] == 0
        assert df.loc[8, "n_lines"] == 1  # '' splits to one empty line

    def test_signal_recompute(self):
        """Signals recompute per doc in plain Python over the synthetic
        corpus head (mean word len, symbol ratio, required words)."""
        import re

        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.textstats import (
            _GOPHER_REQUIRED,
            gopher_quality,
        )

        df = _pdf(gopher_quality(SF)).set_index("doc_id")
        texts = pq.read_table(
            f"{SF}/documents.parquet", columns=["doc_id", "text"]
        ).to_pandas().set_index("doc_id")["text"]
        for doc_id in list(texts.index)[:40]:
            t = texts.loc[doc_id] or ""
            words = [w for w in re.split(r"\s+", t) if w]
            row = df.loc[doc_id]
            assert row["n_words"] == len(words)
            if words:
                assert abs(
                    row["mean_word_len_r"]
                    - sum(len(w) for w in words) / len(words)
                ) < 1e-6
                n_sym = t.count("#") + t.count("...")
                assert abs(row["symbol_ratio_r"] - n_sym / len(words)) < 1e-6
                low = {w.lower() for w in words}
                assert row["req_words"] == sum(r in low for r in _GOPHER_REQUIRED)


class TestZipfSlope:
    def test_recompute(self):
        """Slope/intercept recompute from a Counter over the corpus with
        the same tie order (count desc, term asc)."""
        import re
        from collections import Counter

        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.sketches import zipf_slope

        texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"])[
            "text"
        ].to_pylist()
        cnt = Counter()
        for t in texts:
            cnt.update(w for w in re.split(r"[^a-z0-9]+", (t or "").lower()) if w)
        top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
        y = np.log([c for _, c in top])
        x = np.log(np.arange(1, len(top) + 1, dtype=np.float64))
        slope = ((x * y).mean() - x.mean() * y.mean()) / (
            (x * x).mean() - x.mean() ** 2
        )
        intercept = y.mean() - slope * x.mean()

        got = _pdf(zipf_slope(SF, n=1000))
        assert len(got) == 1
        assert int(got.loc[0, "n_terms"]) == len(top)
        assert abs(got.loc[0, "slope_r"] - slope) < 1e-6
        assert abs(got.loc[0, "intercept_r"] - intercept) < 1e-6
        # sanity: rank-frequency slope is strictly negative (the
        # synthetic corpus is much flatter than natural text's ~ -1)
        assert got.loc[0, "slope_r"] < 0.0

    def test_degenerate_small(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.sketches import zipf_slope

        docs = pa.table({"doc_id": [1], "text": ["aaa aaa bbb"]})
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        got = _pdf(zipf_slope(str(tmp_path), n=1000))
        # terms: aaa (2), bbb (1) -> ranks 1, 2
        x = np.log([1.0, 2.0])
        y = np.log([2.0, 1.0])
        slope = ((x * y).mean() - x.mean() * y.mean()) / (
            (x * x).mean() - x.mean() ** 2
        )
        assert int(got.loc[0, "n_terms"]) == 2
        assert abs(got.loc[0, "slope_r"] - slope) < 1e-6


class TestLMDirichlet:
    def test_recompute(self):
        """Dirichlet QL scores recompute in plain Python (Counter + math)
        over sf0.001; ranks and 9-dp scores match exactly."""
        import math
        import re
        from collections import Counter

        import pyarrow.parquet as pq

        from invertedindex_ray.functions.textproc import preprocess_token
        from invertedindex_ray.pipelines.batch_query import batch_topk_lm

        mu, k = 2000.0, 10
        qset = [("q1", "or data query join"), ("q2", "or table scan zzznope")]
        got = _pdf(batch_topk_lm(SF, qset, k=k, mu=mu))

        texts = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        docs = {}
        for doc_id, t in zip(texts["doc_id"].to_pylist(), texts["text"].to_pylist()):
            toks = [
                p
                for w in re.split(r"[^a-z0-9]+", (t or "").lower())
                if w
                and (p := preprocess_token(w, stemming=False,
                                           stopword_removal=True))
            ]
            if toks:
                docs[doc_id] = Counter(toks)
        cf = Counter()
        for c in docs.values():
            cf.update(c)
        c_total = float(sum(cf.values()))

        for qid, qtext in qset:
            terms = sorted({w for w in qtext.split()[1:] if cf.get(w)})
            n_q = len(terms)
            scores = {}
            for d, tfm in docs.items():
                part = 0.0
                hit = False
                # ascending-score add order matches the pipeline's
                # lexsorted reduceat merge
                parts = sorted(
                    math.log(1.0 + tfm[t] * c_total / (mu * cf[t]))
                    for t in terms if tfm.get(t)
                )
                if parts:
                    hit = True
                    for p in parts:
                        part += p
                if hit:
                    dl = float(sum(tfm.values()))
                    scores[d] = round(
                        part + n_q * math.log(mu / (dl + mu)), 9
                    )
            want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
            sub = got[got.qid == qid].sort_values("rank")
            assert list(sub["doc_id"]) == [d for d, _ in want], qid
            for (_, s), (_, row) in zip(want, sub.iterrows()):
                assert abs(row["score_r"] - s) < 2e-9, (qid, row["doc_id"])

    def test_oov_and_empty(self, tmp_path):
        """All-OOV query returns nothing; longer docs rank lower for
        equal tf (the Dirichlet length normalizer)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.batch_query import batch_topk_lm

        docs = pa.table(
            {
                "doc_id": [1, 2],
                "text": ["apple banana", "apple banana cherry cherry cherry"],
            }
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        got = _pdf(
            batch_topk_lm(
                str(tmp_path),
                [("q1", "or apple"), ("q2", "or zzznope qqnope")],
                k=5,
            )
        )
        assert (got.qid != "q2").all()
        sub = got[got.qid == "q1"].sort_values("rank")
        # same tf=1 for 'apple'; doc 1 is shorter -> higher QL score
        assert list(sub["doc_id"]) == [1, 2]
        assert sub["score_r"].iloc[0] > sub["score_r"].iloc[1]


class TestFunnelRetention:
    def _write_events(self, tmp_path, rows):
        import datetime as dt

        import pyarrow as pa
        import pyarrow.parquet as pq

        base = dt.datetime(2024, 1, 1)
        t = pa.table(
            {
                "event_id": list(range(1, len(rows) + 1)),
                "ts": pa.array(
                    [base + dt.timedelta(hours=h) for _, _, h in rows],
                    type=pa.timestamp("us"),
                ),
                "user_id": pa.array([u for u, _, _ in rows], type=pa.int64()),
                "event_type": pa.array([e for _, e, _ in rows], type=pa.string()),
                "value": pa.array([0.0] * len(rows), type=pa.float64()),
                "props": pa.array(["{}"] * len(rows), type=pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))

    def test_funnel_strict_order(self, tmp_path):
        """Step events BEFORE the previous step's first-reach don't
        count; each user advances at most once per step."""
        from invertedindex_ray.pipelines.relational import funnel_counts

        rows = [
            # user 1: full ordered funnel
            (1, "view", 0), (1, "click", 1), (1, "purchase", 2),
            # user 2: only click precedes the first view (view h=1,
            # click h=0), so the purchase can't chain -> stuck at 'view'
            (2, "click", 0), (2, "view", 1), (2, "purchase", 2),
            # user 3: view then click, no purchase
            (3, "view", 0), (3, "click", 5),
            # user 4: never views
            (4, "click", 0), (4, "purchase", 1),
            # user 5: simultaneous-ish but strictly increasing hours
            (5, "view", 1), (5, "click", 1),  # same ts: NOT strictly after
        ]
        self._write_events(tmp_path, rows)
        got = _pdf(funnel_counts(str(tmp_path))).set_index("step")
        # step 1 (view): users 1,2,3,5
        assert got.loc[1, "n_users"] == 4
        # step 2 (click after first view): users 1,3 (user 5's click ties)
        assert got.loc[2, "n_users"] == 2
        # step 3 (purchase after that click): user 1 only
        assert got.loc[3, "n_users"] == 1
        assert list(got["step_name"]) == ["view", "click", "purchase"]

    def test_retention_recompute(self):
        """Retention triangle recomputes in plain Python over sf0.001."""
        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.relational import retention_cohorts

        t = pq.read_table(
            f"{SF}/events.parquet", columns=["user_id", "ts"]
        )
        uid = t["user_id"].to_numpy()
        day = t["ts"].to_numpy().view("int64") // 86_400_000_000
        first = {}
        active = set()
        for u, d in zip(uid, day):
            first[u] = min(first.get(u, d), d)
            active.add((u, d))
        want = {}
        for u, d in active:
            key = (first[u], d - first[u])
            want[key] = want.get(key, 0) + 1

        got = _pdf(retention_cohorts(SF))
        gday = got["cohort_day"].to_numpy().view("int64") // 86_400_000_000
        assert len(got) == len(want)
        for cd, off, n in zip(gday, got["day_offset"], got["n_users"]):
            assert want[(cd, off)] == n
        # offset 0 rows exist for every cohort and count the cohort size
        coh_sizes = {}
        for u, f in first.items():
            coh_sizes[f] = coh_sizes.get(f, 0) + 1
        for cd, size in coh_sizes.items():
            assert want[(cd, 0)] == size


class TestSourceJaccard:
    def test_recompute(self):
        """Pairwise Jaccard recomputes from Python sets over sf0.001."""
        import re

        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.textstats import source_jaccard

        t = pq.read_table(f"{SF}/documents.parquet", columns=["source", "text"])
        vocab: dict = {}
        for s, x in zip(t["source"].to_pylist(), t["text"].to_pylist()):
            ws = {w for w in re.split(r"[^a-z0-9]+", (x or "").lower()) if w}
            vocab.setdefault(s, set()).update(ws)

        got = _pdf(source_jaccard(SF))
        assert (got["source_a"] < got["source_b"]).all()
        seen = set()
        for _, r in got.iterrows():
            a, b = r["source_a"], r["source_b"]
            seen.add((a, b))
            inter = len(vocab[a] & vocab[b])
            assert inter > 0
            assert r["n_a"] == len(vocab[a]) and r["n_b"] == len(vocab[b])
            assert r["n_both"] == inter
            want = inter / len(vocab[a] | vocab[b])
            assert abs(r["jaccard_r"] - want) < 1e-6
        # every nonzero-intersection pair is present
        srcs = sorted(vocab)
        for i, a in enumerate(srcs):
            for b in srcs[i + 1:]:
                if vocab[a] & vocab[b]:
                    assert (a, b) in seen

    def test_source_bound_guard(self, tmp_path, monkeypatch):
        import pyarrow as pa
        import pyarrow.parquet as pq
        import pytest

        from invertedindex_ray.pipelines import textstats

        docs = pa.table(
            {
                "doc_id": [1, 2],
                "text": ["alpha beta", "beta gamma"],
                "source": ["s1", "s2"],
            }
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        monkeypatch.setattr(textstats, "MAX_JACCARD_SOURCES", 1)
        with pytest.raises(ValueError, match="bitmask bound"):
            textstats.source_jaccard(str(tmp_path))


class TestIVFPQ:
    def test_codebooks_deterministic_and_trained(self):
        import numpy as np

        from invertedindex_ray.pipelines.similarity import (
            _pq_codebooks,
            _smallest_by_vec_id,
        )

        b1 = _pq_codebooks(SF, m=8, ks=16, iters=3)
        b2 = _pq_codebooks(SF, m=8, ks=16, iters=3)
        assert b1.shape == (8, 16, 8)
        assert np.array_equal(b1, b2)  # no RNG anywhere
        # training moved the codebooks off the init
        b0 = _pq_codebooks(SF, m=8, ks=16, iters=0)
        assert not np.array_equal(b0, b1)

    def test_quantization_error_shrinks(self):
        """Mean squared subvector reconstruction error after Lloyd
        iterations is <= the init codebook's (k-means monotonicity)."""
        import numpy as np
        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.similarity import _pq_codebooks

        t = pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])
        mat = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        m, dsub = 8, mat.shape[1] // 8

        def mse(books):
            tot = 0.0
            for j in range(m):
                sub = mat[:, j * dsub:(j + 1) * dsub]
                d2 = (
                    (sub * sub).sum(1)[:, None]
                    - 2.0 * sub @ books[j].T
                    + (books[j] * books[j]).sum(1)[None, :]
                )
                tot += d2.min(axis=1).sum()
            return tot

        e0 = mse(_pq_codebooks(SF, m=8, ks=16, iters=0))
        e3 = mse(_pq_codebooks(SF, m=8, ks=16, iters=3))
        assert e3 < e0

    def test_adc_approximates_cosine(self):
        """ADC scores track true cosine: mean |approx - exact| is small
        and the PQ top-1 for a database query is the query itself."""
        import numpy as np
        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.similarity import (
            _pq_codebooks,
            ivf_pq_topk,
        )

        books = _pq_codebooks(SF, m=16, ks=64, iters=5)
        t = pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])
        mat = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        m, dsub = 16, mat.shape[1] // 16
        codes = np.empty((len(unit), m), dtype=np.int64)
        for j in range(m):
            sub = unit[:, j * dsub:(j + 1) * dsub]
            d2 = (
                (sub * sub).sum(1)[:, None]
                - 2.0 * sub @ books[j].T
                + (books[j] * books[j]).sum(1)[None, :]
            )
            codes[:, j] = np.argmin(d2, axis=1)
        q = unit[0]
        lut = np.einsum("jd,jkd->jk", q.reshape(m, dsub), books)
        approx = lut[np.arange(m)[None, :], codes].sum(axis=1)
        exact = unit @ q
        assert np.abs(approx - exact).mean() < 0.1

        top = _pdf(ivf_pq_topk(SF, n_queries=3, k=10))
        for qi in range(3):
            sub = top[top.qid == qi].sort_values("rank")
            assert sub["vec_id"].iloc[0] == qi  # self is its own best match

    def test_recall_floor(self):
        """Deterministic recall@10 of the PQ path on the synthetic
        corpus (near-random vectors — a hard case for PQ) stays above
        an honest floor."""
        from invertedindex_ray.pipelines.similarity import ann_pq_recall

        r = _pdf(ann_pq_recall(SF))
        assert len(r) == 5
        assert r["recall_r"].mean() >= 0.5
        assert (r["n_hit"] >= 1).all()


class TestTailEdgeCases:
    """Regression tests for the round-4 tail self-review findings."""

    def test_source_jaccard_null_source(self, tmp_path):
        """NULL-source docs drop (SQL inner-join semantics), no crash."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.textstats import source_jaccard

        docs = pa.table(
            {
                "doc_id": [1, 2, 3],
                "text": ["alpha beta", "beta gamma", "alpha beta gamma"],
                "source": pa.array(["s1", "s2", None], type=pa.string()),
            }
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        got = _pdf(source_jaccard(str(tmp_path)))
        assert len(got) == 1
        r = got.iloc[0]
        # the NULL-source doc contributes to NEITHER vocabulary
        assert (r["source_a"], r["source_b"]) == ("s1", "s2")
        assert r["n_a"] == 2 and r["n_b"] == 2 and r["n_both"] == 1

    def test_funnel_null_ts_never_qualifies(self, tmp_path):
        import datetime as dt

        import pyarrow as pa
        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.relational import funnel_counts

        base = dt.datetime(2024, 1, 1)
        t = pa.table(
            {
                "event_id": [1, 2, 3],
                "ts": pa.array(
                    [None, base, base + dt.timedelta(hours=1)],
                    type=pa.timestamp("us"),
                ),
                "user_id": pa.array([1, 1, 1], type=pa.int64()),
                "event_type": pa.array(
                    ["view", "click", "purchase"], type=pa.string()
                ),
                "value": pa.array([0.0] * 3, type=pa.float64()),
                "props": pa.array(["{}"] * 3, type=pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        got = _pdf(funnel_counts(str(tmp_path))).set_index("step")
        # the NULL-ts view must NOT become a -2^63 first-reach that
        # lets the click/purchase chain
        assert got["n_users"].tolist() == [0, 0, 0]

    def test_funnel_repeated_step_guard(self):
        import pytest

        from invertedindex_ray.pipelines.relational import funnel_counts

        with pytest.raises(ValueError, match="repeated event type"):
            funnel_counts(SF, steps=("view", "view", "click"))

    def test_retention_null_ts_dropped(self, tmp_path):
        import datetime as dt

        import pyarrow as pa
        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.relational import retention_cohorts

        base = dt.datetime(2024, 1, 2)
        t = pa.table(
            {
                "event_id": [1, 2],
                "ts": pa.array([None, base], type=pa.timestamp("us")),
                "user_id": pa.array([7, 7], type=pa.int64()),
                "event_type": pa.array(["view", "view"], type=pa.string()),
                "value": pa.array([0.0, 0.0], type=pa.float64()),
                "props": pa.array(["{}", "{}"], type=pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        got = _pdf(retention_cohorts(str(tmp_path)))
        # one real event -> exactly one (cohort, 0) row; no bogus
        # int64-min cohort from the NaT sentinel
        assert len(got) == 1
        assert got["day_offset"].iloc[0] == 0 and got["n_users"].iloc[0] == 1
        assert got["cohort_day"].iloc[0].year == 2024

    def test_zipf_degenerate_nulls(self, tmp_path):
        """<2 distinct terms: slope/intercept are NULL (regr_slope
        parity), not 0.0."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.sketches import zipf_slope

        docs = pa.table({"doc_id": [1], "text": ["aaa aaa aaa"]})
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        got = zipf_slope(str(tmp_path))
        assert got["n_terms"][0].as_py() == 1
        assert got["slope_r"][0].as_py() is None
        assert got["intercept_r"][0].as_py() is None


class TestSpellSuggest:
    def test_pick_rule(self, tmp_path):
        """Best = (dist asc, df desc, term asc); exact hits suggest
        themselves; unmatched words yield no row."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.analytics import spell_suggest

        # vocabulary: 'table' x3 docs, 'cable' x1 doc, 'tble' absent
        docs = pa.table(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "table stuff here",
                    "table again now",
                    "table third time",
                    "cable run",
                ],
            }
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        got = _pdf(
            spell_suggest(str(tmp_path), words=["tble", "table", "zzznope"])
        ).set_index("q")
        # 'tble' -> both 'table' (df 3) and 'cable' at dist... cable vs
        # tble is dist 2, so only 'table' (insertion) qualifies
        assert got.loc["tble", "suggestion"] == "table"
        assert got.loc["tble", "dist"] == 1 and got.loc["tble", "df"] == 3
        # exact hit suggests itself at dist 0
        assert got.loc["table", "suggestion"] == "table"
        assert got.loc["table", "dist"] == 0
        assert "zzznope" not in got.index

    def test_df_tiebreak(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.analytics import spell_suggest

        # 'hat' and 'cat' both dist-1 from 'bat'; 'cat' has higher df
        docs = pa.table(
            {
                "doc_id": [1, 2, 3],
                "text": ["hat stand", "cat toy", "cat nap"],
            }
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        got = _pdf(spell_suggest(str(tmp_path), words=["bat"])).set_index("q")
        assert got.loc["bat", "suggestion"] == "cat"
        assert got.loc["bat", "df"] == 2


class TestLTRFeatures:
    def test_features_recompute(self):
        """Feature rows cover exactly the BM25 top-k candidates and the
        integer features recompute from the postings."""
        import re
        from collections import Counter

        import pyarrow.parquet as pq

        from invertedindex_ray.functions.textproc import preprocess_token
        from invertedindex_ray.pipelines.batch_query import batch_topk
        from invertedindex_ray.pipelines.ltr import ltr_features

        qset = [("q1", "or data query join"), ("q2", "and table scan")]
        got = _pdf(ltr_features(SF, qset, k=10))
        cand = _pdf(batch_topk(SF, qset, k=10))
        assert len(got) == len(cand)
        assert set(zip(got.qid, got.doc_id)) == set(zip(cand.qid, cand.doc_id))
        # bm25_r and rank carry over unchanged
        m = got.merge(cand, on=["qid", "doc_id"])
        assert (m["bm25_r"] == m["score_r"]).all()
        assert (m["rank_x"] == m["rank_y"]).all()

        texts = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        docs = {}
        for doc_id, t in zip(texts["doc_id"].to_pylist(), texts["text"].to_pylist()):
            toks = [
                p
                for w in re.split(r"[^a-z0-9]+", (t or "").lower())
                if w
                and (p := preprocess_token(w, stemming=False,
                                           stopword_removal=True))
            ]
            if toks:
                docs[doc_id] = Counter(toks)
        df = Counter()
        for c in docs.values():
            df.update(set(c))
        # NOSTEM config keeps stopword removal; none of these words are
        # stopwords so they pass through unchanged
        qterms = {
            "q1": {
                preprocess_token(w, stemming=False, stopword_removal=True)
                for w in ("data", "query", "join")
            },
            "q2": {
                preprocess_token(w, stemming=False, stopword_removal=True)
                for w in ("table", "scan")
            },
        }
        for _, r in got.iterrows():
            tfm = docs[r["doc_id"]]
            hits = {t: tfm[t] for t in qterms[r["qid"]] if tfm.get(t)}
            assert r["n_hit"] == len(hits)
            assert r["sum_tf"] == sum(hits.values())
            assert r["max_tf"] == max(hits.values())
            assert r["min_df"] == min(df[t] for t in hits)
            assert r["doc_len"] == sum(tfm.values())


class TestFunnelOracleNullParity:
    def test_sql_mirror_drops_null_ts_step1(self, tmp_path):
        """The funnel oracle's s1 CTE must not count a user whose only
        step-1 events have NULL ts (review finding: min over all-NULL
        still forms a GROUP BY group)."""
        import datetime as dt

        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        import __ray_entry__ as entrymod
        from invertedindex_ray.pipelines.relational import funnel_counts

        base = dt.datetime(2024, 1, 1)
        t = pa.table(
            {
                "event_id": [1, 2, 3],
                "ts": pa.array(
                    [None, base, base + dt.timedelta(hours=1)],
                    type=pa.timestamp("us"),
                ),
                "user_id": pa.array([1, 1, 1], type=pa.int64()),
                "event_type": pa.array(
                    ["view", "click", "purchase"], type=pa.string()
                ),
                "value": pa.array([0.0] * 3, type=pa.float64()),
                "props": pa.array(["{}"] * 3, type=pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tmp_path}/events.parquet')"
        )
        sql = entrymod.oracle_sql()["funnel_counts"]
        want = con.sql(sql).df().sort_values("step")["n_users"].tolist()
        got = (
            _pdf(funnel_counts(str(tmp_path)))
            .sort_values("step")["n_users"]
            .tolist()
        )
        assert want == got == [0, 0, 0]


class TestEventTransitions:
    def test_recompute(self):
        """Transition counts recompute from a per-user sorted replay."""
        from collections import Counter

        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.relational import event_transitions

        t = pq.read_table(
            f"{SF}/events.parquet",
            columns=["user_id", "ts", "event_id", "event_type"],
        ).to_pandas()
        t = t.dropna(subset=["ts"]).sort_values(["user_id", "ts", "event_id"])
        want: Counter = Counter()
        for _, g in t.groupby("user_id"):
            et = g["event_type"].tolist()
            for a, b in zip(et, et[1:]):
                want[(a, b)] += 1

        got = _pdf(event_transitions(SF))
        assert len(got) == len(want)
        for _, r in got.iterrows():
            assert want[(r["prev_type"], r["next_type"])] == r["n"]
        # totals conserve: sum = events - users (one headless event each)
        n_users = t["user_id"].nunique()
        assert got["n"].sum() == len(t) - n_users

    def test_single_event_users(self, tmp_path):
        import datetime as dt

        import pyarrow as pa
        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.relational import event_transitions

        base = dt.datetime(2024, 1, 1)
        t = pa.table(
            {
                "event_id": [1, 2, 3],
                "ts": pa.array(
                    [base, base, base + dt.timedelta(hours=1)],
                    type=pa.timestamp("us"),
                ),
                "user_id": pa.array([1, 2, 2], type=pa.int64()),
                "event_type": pa.array(["view", "view", "click"], type=pa.string()),
                "value": pa.array([0.0] * 3, type=pa.float64()),
                "props": pa.array(["{}"] * 3, type=pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        got = _pdf(event_transitions(str(tmp_path)))
        # user 1 contributes nothing; user 2: view -> click once
        assert len(got) == 1
        assert got.iloc[0].tolist() == ["view", "click", 1]


class TestLangSourceMatrix:
    def test_recompute(self):
        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.curation import lang_source_matrix

        t = pq.read_table(
            f"{SF}/documents.parquet", columns=["lang", "source", "n_chars"]
        ).to_pandas()
        want = t.groupby(["lang", "source"], as_index=False).agg(
            n_docs=("n_chars", "size"), n_chars_t=("n_chars", "sum")
        )
        got = _pdf(lang_source_matrix(SF))
        assert len(got) == len(want)
        m = got.merge(want, on=["lang", "source"], suffixes=("_g", "_w"))
        assert len(m) == len(want)
        assert (m["n_docs_g"] == m["n_docs_w"]).all()
        assert (m["n_chars_t_g"] == m["n_chars_t_w"]).all()

    def test_hash_strings_nul_determinism(self):
        """Regression: hash_strings must be content-deterministic for
        strings with embedded NUL — the categorize path hashed them
        batch-dependently (pandas factorize truncates at \\x00), which
        split one key across partitions in keyed reductions."""
        import numpy as np

        from invertedindex_ray.functions.hashing import hash_strings

        keys = [f"de\x00src{i}" for i in range(20)] + ["fr\x00src1"]
        batch = hash_strings(keys)
        single = np.array([hash_strings([k])[0] for k in keys])
        assert (batch == single).all()
        assert len(set(batch.tolist())) == len(keys)  # all distinct


class TestLengthPercentile:
    def test_matches_pandas_percent_rank(self):
        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.curation import length_percentile

        t = pq.read_table(
            f"{SF}/documents.parquet", columns=["doc_id", "source", "n_chars"]
        ).to_pandas()
        # SQL percent_rank = (count strictly smaller) / (n - 1)
        t["want"] = (
            t.groupby("source")["n_chars"].rank(method="min") - 1
        ) / (t.groupby("source")["n_chars"].transform("size") - 1)
        got = _pdf(length_percentile(SF)).set_index("doc_id")
        for _, r in t.iterrows():
            assert abs(got.loc[r["doc_id"], "pct_r"] - r["want"]) < 1e-6

    def test_single_row_source(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.curation import length_percentile

        docs = pa.table(
            {
                "doc_id": [1, 2, 3],
                "source": ["a", "b", "b"],
                "n_chars": [100, 5, 10],
            }
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        got = _pdf(length_percentile(str(tmp_path))).set_index("doc_id")
        assert got.loc[1, "pct_r"] == 0.0  # single-row source
        assert got.loc[2, "pct_r"] == 0.0
        assert got.loc[3, "pct_r"] == 1.0


class TestNulTextDedup:
    def test_minhash_pairs_with_nul_text(self, tmp_path):
        """End-to-end NUL regression: two documents whose shared text
        contains an embedded NUL byte must still collide in MinHash-LSH
        (the categorize-path hash made NUL shingles batch-dependent)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.dedup import minhash_lsh_pairs

        body = ("the quick brown\x00fox jumps over the lazy dog and keeps "
                "running through the field " * 6)
        docs = pa.table(
            {
                "doc_id": [1, 2, 3],
                "text": [body, body + " tiny tail", "completely different "
                         "words about another topic entirely " * 8],
            }
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        got = _pdf(minhash_lsh_pairs(str(tmp_path), threshold=0.5))
        pairs = set(zip(got["doc_a"], got["doc_b"])) if len(got) else set()
        assert (1, 2) in pairs
        assert all(3 not in p for p in pairs)


class TestBoilerplateVocab:
    def test_boilerplate_rules(self, tmp_path):
        """A line shared by >= min_df docs is cut everywhere; unique
        lines survive; counts are per-doc."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.curation import boilerplate_lines

        footer = "copyright example corp all rights reserved"
        docs = pa.table(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    f"unique first line\n{footer}",
                    f"another body line\n{footer}\nsecond body line",
                    "totally unique document",
                ],
            }
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        got = _pdf(boilerplate_lines(str(tmp_path), min_df=2)).set_index(
            "doc_id"
        )
        assert got.loc[1, "n_removed"] == 1
        assert got.loc[1, "text_clean"] == "unique first line"
        assert got.loc[2, "n_removed"] == 1
        assert got.loc[2, "text_clean"] == "another body line\nsecond body line"
        assert got.loc[3, "n_removed"] == 0
        assert got.loc[3, "text_clean"] == "totally unique document"
        # a line repeated INSIDE one doc but nowhere else is NOT boiler
        docs2 = pa.table(
            {"doc_id": [1], "text": ["same line\nsame line\nother"]}
        )
        pq.write_table(docs2, str(tmp_path / "documents.parquet"))
        got2 = _pdf(boilerplate_lines(str(tmp_path), min_df=2))
        assert got2["n_removed"].iloc[0] == 0

    def test_boilerplate_broadcast_guard(self, tmp_path, monkeypatch):
        import pyarrow as pa
        import pyarrow.parquet as pq
        import pytest

        from invertedindex_ray.pipelines import curation

        docs = pa.table(
            {"doc_id": [1, 2], "text": ["shared line", "shared line"]}
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        monkeypatch.setattr(curation, "BOILERPLATE_MAX_LINES", 0)
        with pytest.raises(ValueError, match="broadcast bound"):
            curation.boilerplate_lines(str(tmp_path), min_df=2)

    def test_vocab_stats_recompute(self):
        import re
        from collections import Counter

        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.sketches import vocab_stats

        texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"])[
            "text"
        ].to_pylist()
        cnt = Counter()
        for t in texts:
            cnt.update(w for w in re.split(r"[^a-z0-9]+", (t or "").lower()) if w)
        got = _pdf(vocab_stats(SF))
        assert got["n_terms"].iloc[0] == len(cnt)
        assert got["n_tokens"].iloc[0] == sum(cnt.values())
        n_hapax = sum(1 for v in cnt.values() if v == 1)
        assert got["n_hapax"].iloc[0] == n_hapax
        assert abs(got["hapax_ratio_r"].iloc[0] - n_hapax / len(cnt)) < 1e-6
        assert abs(got["ttr_r"].iloc[0] - len(cnt) / sum(cnt.values())) < 1e-6


class TestReviewEdgeCases2:
    def test_transitions_null_event_type(self, tmp_path):
        """NULL event types drop both sides (factorize's -1 code would
        decode into the wrong pair; the oracle pins IS NOT NULL)."""
        import datetime as dt

        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        import __ray_entry__ as entrymod
        from invertedindex_ray.pipelines.relational import event_transitions

        base = dt.datetime(2024, 1, 1)
        t = pa.table(
            {
                "event_id": [1, 2, 3],
                "ts": pa.array(
                    [base + dt.timedelta(hours=h) for h in range(3)],
                    type=pa.timestamp("us"),
                ),
                "user_id": pa.array([1, 1, 1], type=pa.int64()),
                "event_type": pa.array(["a", None, "b"], type=pa.string()),
                "value": pa.array([0.0] * 3, type=pa.float64()),
                "props": pa.array(["{}"] * 3, type=pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        got = _pdf(event_transitions(str(tmp_path)))
        # NULL row drops entirely: a -> b is the only transition
        assert len(got) == 1
        assert got.iloc[0].tolist() == ["a", "b", 1]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tmp_path}/events.parquet')"
        )
        want = con.sql(entrymod.oracle_sql()["event_transitions"]).df()
        assert len(want) == 1 and want["n"].iloc[0] == 1

    def test_length_percentile_null_source(self, tmp_path):
        """A NULL source is its own percent_rank partition (SQL
        PARTITION BY semantics), not a KeyError."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.curation import length_percentile

        docs = pa.table(
            {
                "doc_id": [1, 2, 3, 4],
                "source": pa.array(["a", "a", None, None], type=pa.string()),
                "n_chars": [10, 20, 5, 15],
            }
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        got = _pdf(length_percentile(str(tmp_path))).set_index("doc_id")
        assert got.loc[1, "pct_r"] == 0.0 and got.loc[2, "pct_r"] == 1.0
        assert got.loc[3, "pct_r"] == 0.0 and got.loc[4, "pct_r"] == 1.0


class TestSurprisalBuckets:
    def test_bucket_rule_recompute(self):
        """Buckets recompute from the surprisal values and the
        deterministic sample thresholds; roughly balanced terciles."""
        import math

        from invertedindex_ray.functions.hashing import md5_hash63
        from invertedindex_ray.pipelines.textstats import (
            surprisal_buckets,
            unigram_surprisal,
        )

        sur = _pdf(unigram_surprisal(SF))
        got = _pdf(surprisal_buckets(SF)).set_index("doc_id")
        assert len(got) == len(sur)

        p = md5_hash63([f"{int(i)}#sb" for i in sur["doc_id"]])
        order = np.argsort(p)[:1024]
        import numpy as _np

        s = _np.sort(sur["surprisal_r"].to_numpy()[order])
        n = len(s)
        t1 = s[min(n - 1, math.ceil(n / 3) - 1)]
        t2 = s[min(n - 1, math.ceil(2 * n / 3) - 1)]
        for _, r in sur.iterrows():
            want = 1 + (r["surprisal_r"] > t1) + (r["surprisal_r"] > t2)
            assert got.loc[r["doc_id"], "bucket"] == want
        # terciles are roughly balanced on a 500-doc corpus
        counts = got["bucket"].value_counts()
        assert set(counts.index) <= {1, 2, 3}
        assert counts.min() > len(got) * 0.2


class TestMinhashEval:
    def test_probe_values(self):
        """The eval's counts recompute from the two pipelines' own pair
        sets; on the synthetic corpus the banded LSH at threshold=0.5
        finds every tau=0.5 exact-Jaccard pair."""
        from invertedindex_ray.pipelines.dedup import (
            minhash_eval,
            minhash_lsh_pairs,
            ngram_jaccard_pairs,
        )

        got = _pdf(minhash_eval(SF))
        ex = {(int(r["doc_a"]), int(r["doc_b"]))
              for r in ngram_jaccard_pairs(SF, k=3, tau=0.5).take_all()}
        ap = {(int(r["doc_a"]), int(r["doc_b"]))
              for r in minhash_lsh_pairs(SF, threshold=0.5).take_all()}
        assert got["n_exact"].iloc[0] == len(ex)
        assert got["n_approx"].iloc[0] == len(ap)
        assert got["n_both"].iloc[0] == len(ex & ap)
        assert 0.0 <= got["precision_r"].iloc[0] <= 1.0
        assert got["recall_r"].iloc[0] >= 0.9  # near-identical dup pairs


class TestTPCH:
    def test_q1_recompute(self):
        """Q1 aggregates recompute from a pandas pass with the same
        exact-cents arithmetic."""
        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.tpch import _ts_us, q1_pricing_summary

        t = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
        cut = _ts_us("1998-09-02")
        t = t[t["l_shipdate"].astype("int64") <= cut]
        pc = np.rint(t["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        dc = np.rint(t["l_discount"].to_numpy() * 100).astype(np.int64)
        got = _pdf(q1_pricing_summary(SF)).set_index(
            ["l_returnflag", "l_linestatus"]
        )
        grp = t.assign(pc=pc, dc=dc).groupby(["l_returnflag", "l_linestatus"])
        for key, g in grp:
            row = got.loc[key]
            assert row["count_order"] == len(g)
            assert row["sum_qty"] == int(g["l_quantity"].sum())
            assert abs(row["sum_base_price_r"] - g["pc"].sum() / 100.0) < 1e-9
            dpc = (g["pc"] * (100 - g["dc"])).sum()
            assert abs(row["sum_disc_price_r"] - dpc / 10000.0) < 1e-6
        assert got["count_order"].sum() == len(t)

    def test_q6_recompute(self):
        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.tpch import _ts_us, q6_revenue

        t = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
        lo, hi = _ts_us("1996-01-01"), _ts_us("1997-01-01")
        ship = t["l_shipdate"].astype("int64")
        dc = np.rint(t["l_discount"].to_numpy() * 100).astype(np.int64)
        pc = np.rint(t["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        keep = (
            (ship >= lo).to_numpy() & (ship < hi).to_numpy()
            & (dc >= 5) & (dc <= 7)
            & (t["l_quantity"].to_numpy() < 24)
        )
        want = int((pc[keep] * dc[keep]).sum()) / 10000.0
        got = _pdf(q6_revenue(SF))
        assert got["n_rows"].iloc[0] == int(keep.sum())
        assert abs(got["revenue_r"].iloc[0] - want) < 1e-9

    def test_q3_join_chain(self):
        """Q3's top order recomputes via pandas joins; ranks are dense
        and revenue non-increasing."""
        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.tpch import _ts_us, q3_top_orders

        cut = _ts_us("1997-01-01")
        cust = pq.read_table(f"{SF}/customer.parquet").to_pandas()
        orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
        li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
        ck = set(cust[cust.c_mktsegment == "BUILDING"]["c_custkey"])
        o = orders[
            (orders.o_custkey.isin(ck))
            & (orders.o_orderdate.astype("int64") < cut)
        ]
        l = li[li.l_shipdate.astype("int64") > cut].copy()
        l["rev"] = (
            np.rint(l["l_extendedprice"].to_numpy() * 100).astype(np.int64)
            * (100 - np.rint(l["l_discount"].to_numpy() * 100).astype(np.int64))
        )
        m = l.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        rev = m.groupby("o_orderkey")["rev"].sum().sort_values(ascending=False)
        got = _pdf(q3_top_orders(SF))
        assert len(got) == min(10, len(rev))
        assert got["rank"].tolist() == list(range(1, len(got) + 1))
        v = got["revenue_r"].to_numpy()
        assert (v[:-1] >= v[1:]).all()
        assert got["o_orderkey"].iloc[0] == rev.index[0]
        assert abs(got["revenue_r"].iloc[0] - rev.iloc[0] / 10000.0) < 1e-9


class TestTPCHQ5Q14:
    def test_q5_recompute(self):
        """Q5 per-nation revenue recomputes via pandas joins with the
        same-nation customer/supplier rule."""
        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.tpch import (
            _ts_us,
            q5_local_supplier_volume,
        )

        lo, hi = _ts_us("1996-01-01"), _ts_us("1997-01-01")
        nat = pq.read_table(f"{SF}/nation.parquet").to_pandas()
        reg = pq.read_table(f"{SF}/region.parquet").to_pandas()
        asia = set(reg[reg.r_name == "ASIA"]["r_regionkey"])
        nk = nat[nat.n_regionkey.isin(asia)]
        names = dict(zip(nk.n_nationkey, nk.n_name))
        supp = pq.read_table(f"{SF}/supplier.parquet").to_pandas()
        cust = pq.read_table(f"{SF}/customer.parquet").to_pandas()
        orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
        li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
        o = orders[
            (orders.o_orderdate.astype("int64") >= lo)
            & (orders.o_orderdate.astype("int64") < hi)
        ]
        li = li.copy()
        li["rev"] = (
            np.rint(li.l_extendedprice.to_numpy() * 100).astype(np.int64)
            * (100 - np.rint(li.l_discount.to_numpy() * 100).astype(np.int64))
        )
        m = (
            li.merge(supp, left_on="l_suppkey", right_on="s_suppkey")
            .merge(o, left_on="l_orderkey", right_on="o_orderkey")
            .merge(cust, left_on="o_custkey", right_on="c_custkey")
        )
        m = m[
            (m.s_nationkey == m.c_nationkey)
            & (m.s_nationkey.isin(names))
        ]
        want = m.groupby("s_nationkey")["rev"].sum()
        got = _pdf(q5_local_supplier_volume(SF))
        assert len(got) == len(want)
        for nkid, rev in want.items():
            row = got[got.n_name == names[nkid]]
            assert len(row) == 1
            assert abs(row["revenue_r"].iloc[0] - rev / 10000.0) < 1e-9
        # revenue descending
        v = got["revenue_r"].to_numpy()
        assert (v[:-1] >= v[1:]).all()

    def test_q14_recompute(self):
        import pyarrow.parquet as pq

        from invertedindex_ray.pipelines.tpch import _ts_us, q14_promo_share

        lo, hi = _ts_us("1996-01-01"), _ts_us("1996-02-01")
        li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
        part = pq.read_table(f"{SF}/part.parquet").to_pandas()
        li = li[
            (li.l_shipdate.astype("int64") >= lo)
            & (li.l_shipdate.astype("int64") < hi)
        ].copy()
        li["rev"] = (
            np.rint(li.l_extendedprice.to_numpy() * 100).astype(np.int64)
            * (100 - np.rint(li.l_discount.to_numpy() * 100).astype(np.int64))
        )
        m = li.merge(part, left_on="l_partkey", right_on="p_partkey")
        promo = int(m[m.p_type.str.startswith("PROMO")]["rev"].sum())
        total = int(m["rev"].sum())
        got = _pdf(q14_promo_share(SF))
        assert got["n_rows"].iloc[0] == len(m)
        assert abs(got["total_revenue_r"].iloc[0] - total / 10000.0) < 1e-9
        assert abs(
            got["promo_share_r"].iloc[0] - 100.0 * promo / total
        ) < 1e-6
