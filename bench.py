"""Benchmark harness. Prints ONE JSON line:

  {"metric": "e2e_bench_sec", "value": <total sec>, "unit": "sec",
   "queries": {...per-component sec...}, "sf": <sf>, "num_cpus": N,
   "detail": {...throughputs...}}

Env:
  GRAFT_SF_DIR      input dir (default /root/testdata/sf0.1)
  RAY_GRAFT_CPUS    ray.init num_cpus (default 32)
  BENCH_COMPONENTS  comma list (default all): build,daat,serve,
                    topk_batch,dedup_minhash,ann

`--scaling` runs the headline index build twice in fresh processes
(num_cpus=8 then 32) on the same corpus and reports throughputs +
scaling efficiency (BASELINE.md criterion: >= 0.8 between N and 4N).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

DEFAULT_SF_DIR = "/root/testdata/sf0.1"
# bench corpus sizes (docs avg ~180 tokens, ~6x an MS MARCO passage)
CORPUS_DOCS = {"0.001": 2_000, "0.01": 20_000, "0.1": 200_000}


def _sf_of(sf_dir: str) -> str:
    base = os.path.basename(sf_dir.rstrip("/"))
    return base[2:] if base.startswith("sf") else base


def run_bench(sf_dir: str, num_cpus: int, components: list[str]) -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data as rd
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    # Known-benign Ray-internal noise, silenced HERE only (never in the
    # library): Ray's sort-based groupby emits schema-less EMPTY blocks
    # for barren output splits, and the streaming executor then logs one
    # "RefBundle with a different schema" warning per operator. This
    # reproduces with a 20-block/3-key vanilla ray.data groupby with no
    # library code involved (tests/test_scale_guards.py::
    # TestGroupbyEmptySplits documents the repro); results are
    # unaffected — the empty blocks carry zero rows. The actionable
    # schema warnings (unhashable pandas metadata) were fixed at the
    # read boundary in sources/io.py instead of being filtered.
    import logging

    class _DropEmptySplitSchemaWarning(logging.Filter):
        def filter(self, rec: logging.LogRecord) -> bool:
            return "RefBundle with a different schema" not in rec.getMessage()

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_DropEmptySplitSchemaWarning())

    from invertedindex_ray.build import build_index
    from invertedindex_ray.config import IndexConfig
    from invertedindex_ray.sources.bench_corpus import ensure_corpus

    sf = _sf_of(sf_dir)
    n_docs = int(os.environ.get("BENCH_CORPUS_DOCS", CORPUS_DOCS.get(sf, 20_000)))
    corpus = ensure_corpus(n_docs)

    queries: dict[str, float] = {}
    detail: dict[str, float] = {}

    # warm: page cache + worker pool (untimed)
    rd.read_parquet(corpus, columns=["url"]).map_batches(
        lambda t: t, batch_format="pyarrow"
    ).count()

    idx_dir = f"/tmp/iidx-bench-index-{sf}-{num_cpus}"
    cfg = IndexConfig(num_doc_partitions=4, num_buckets=max(32, num_cpus * 2))
    # fixed input block count INDEPENDENT of cpu count: per-block driver
    # overhead then stays constant across scaling levels, and blocks are
    # big enough that task overhead amortizes (at 100 TB blocks are
    # ~128 MB and this is moot; at bench scale it matters)
    n_blocks = int(os.environ.get("BENCH_NUM_BLOCKS", "64"))

    if "build" in components:
        # BENCH_REPEAT > 1: build N times, report the median — worker-pool
        # and page-cache warm-up dominates single-run variance on this box
        repeat = int(os.environ.get("BENCH_REPEAT", "1"))
        runs, stats = [], None
        for _ in range(repeat):
            shutil.rmtree(idx_dir, ignore_errors=True)
            t0 = time.time()
            # checkpoint=False: one-shot benchmark build, like the reference
            # (no tokenized resume copy; doc table/segments/lexicon still
            # written — the actual index artifacts)
            stats = build_index(
                rd.read_parquet(corpus, columns=["url", "text"],
                                override_num_blocks=n_blocks),
                idx_dir, cfg, checkpoint=False,
            )
            runs.append(time.time() - t0)
        # median: single runs swing +-30% on this box (VM demand paging);
        # min overstates, mean is outlier-dragged
        runs.sort()
        dt = runs[len(runs) // 2] if repeat % 2 else (runs[repeat // 2 - 1] + runs[repeat // 2]) / 2
        queries["build"] = round(dt, 3)
        detail["build_runs"] = [round(r, 3) for r in runs]
        detail["build_docs_per_s"] = round(stats.num_docs / dt, 1)
        detail["build_tokens_per_s"] = round(stats.total_tokens / dt, 1)
        detail["num_docs"] = stats.num_docs

    def ensure_index():
        """Build the index (untimed) when the build component didn't run."""
        import os as _os

        if not _os.path.exists(_os.path.join(idx_dir, "stats.json")):
            shutil.rmtree(idx_dir, ignore_errors=True)
            build_index(
                rd.read_parquet(corpus, columns=["url", "text"],
                                override_num_blocks=n_blocks),
                idx_dir, cfg,
            )

    if "daat" in components:
        import numpy as np

        from invertedindex_ray.engine import QueryEngine

        ensure_index()
        from invertedindex_ray.pipelines.query_sets import reference_query_set
        from invertedindex_ray.sources.bench_corpus import _WORDS

        e = QueryEngine(idx_dir, cfg)

        # (a) in-vocabulary queries over the FULL Zipf vocabulary (head +
        # tail terms — representative df mix); plus (a') a pure-head-term
        # worst case (every term matches 10-50% of the corpus)
        rng = np.random.default_rng(99)
        full_vocab = [w for w in _WORDS if len(w) > 2]
        head_vocab = [w for w in _WORDS[:60] if len(w) > 2]
        in_vocab = [
            ("v%d" % i, " ".join(rng.choice(full_vocab, size=int(rng.integers(2, 5)))))
            for i in range(2000)
        ]
        lat = []
        t0 = time.time()
        for qid, q in in_vocab:
            s = time.time()
            e.query("OR " + q, 100)
            lat.append(time.time() - s)
        dt = time.time() - t0
        queries["daat_invocab_2000q"] = round(dt, 3)
        lat.sort()
        detail["daat_qps"] = round(len(in_vocab) / dt, 1)
        detail["daat_p50_ms"] = round(lat[len(lat) // 2] * 1000, 2)
        detail["daat_p99_ms"] = round(lat[int(len(lat) * 0.99)] * 1000, 2)

        head_qs = [
            ("h%d" % i, " ".join(rng.choice(head_vocab, size=int(rng.integers(2, 5)))))
            for i in range(500)
        ]
        t0 = time.time()
        for qid, q in head_qs:
            e.query("OR " + q, 100)
        dt = time.time() - t0
        queries["daat_head_500q"] = round(dt, 3)
        detail["daat_head_p_ms"] = round(dt / len(head_qs) * 1000, 2)

        # (b) the reference repo's MS MARCO dev queries (tokenizer + lookup
        # path; most terms miss the synthetic vocabulary)
        qs = reference_query_set(limit=2000)
        t0 = time.time()
        for qid, q in qs:
            e.query("OR " + q, 100)
        queries["daat_msmarco_2000q"] = round(time.time() - t0, 3)

        # (c) WAND vs Block-Max WAND, 300 in-vocab queries at k=10 (a
        # tight threshold is where block skipping pays): the honest
        # baseline for BMW is classic WAND — both are the sequential
        # leapfrog traversal; the vectorized default above is a
        # different (array-kernel) engine and 10-20x faster than ANY
        # sequential DAAT on this head-heavy synthetic corpus.
        sub = in_vocab[:300]
        for trav, label in (("wand", "wand_300q_k10"), ("bmw", "bmw_300q_k10")):
            et = QueryEngine(idx_dir, cfg, traversal=trav)
            t0 = time.time()
            for qid, q in sub:
                et.query("OR " + q, 10)
            dt = time.time() - t0
            queries[label] = round(dt, 3)
            detail[label.split("_")[0] + "_qps"] = round(len(sub) / dt, 1)

    if "bmw_skewed" in components:
        # WAND vs BMW on the SKEWED corpus (doc-id runs alternate hot
        # short/tf-boosted docs and cold long docs), where per-block
        # score maxima genuinely vary along each posting list — the
        # regime Ding & Suel built BMW for. The uniform corpus above is
        # the honest null result (block max == list max, bmw == wand);
        # this slot is the existence proof plus skip counters.
        import numpy as np

        from invertedindex_ray.engine import QueryEngine
        from invertedindex_ray.sources.bench_corpus import _WORDS

        from invertedindex_ray.sources.bench_corpus import _SKEW_FOCUS_RANKS

        n_sk = min(n_docs, int(os.environ.get("BENCH_SKEW_DOCS", "120000")))
        corpus_sk = ensure_corpus(n_sk, variant="skewed")
        idx_sk = f"/tmp/iidx-bench-index-skewed-{n_sk}-" + os.path.basename(
            corpus_sk
        )
        if not os.path.exists(os.path.join(idx_sk, "stats.json")):
            shutil.rmtree(idx_sk, ignore_errors=True)
            build_index(
                rd.read_parquet(corpus_sk, columns=["url", "text"],
                                override_num_blocks=n_blocks),
                idx_sk, cfg,
            )
        rng = np.random.default_rng(17)
        # topical queries over the hot-doc focus band: hot docs set a
        # top-10 threshold ~2x above any cold block-max sum, so BMW can
        # skip the cold doc-id ranges wholesale while classic WAND's
        # list-level bounds cannot
        focus_vocab = [w for w in _WORDS[slice(*_SKEW_FOCUS_RANKS)] if len(w) > 2]
        # 2-3 focus terms: the top-10 threshold then needs every term to
        # co-score, putting the BMW pivot at the LAST cursor, where block
        # skips jump to block boundaries (see bench_corpus._SKEW_FOCUS_RANKS)
        qs = [
            " ".join(rng.choice(focus_vocab, size=int(rng.integers(2, 4)),
                                replace=False))
            for _ in range(300)
        ]
        # warm the OS page cache with the FULL query set once, untimed,
        # before either traversal is timed — wand runs first, and a
        # partial warm-up would let its cold parquet reads subsidize
        # bmw's fully-warm identical run (asymmetric-I/O bias)
        ew = QueryEngine(idx_sk, cfg, traversal="wand")
        for q in qs:
            ew.query("OR " + q, 10)
        del ew  # free the warm-up engine's caches before the timed loops
        for trav, label in (("wand", "wand_skewed_300q"), ("bmw", "bmw_skewed_300q")):
            et = QueryEngine(idx_sk, cfg, traversal=trav)
            scored = skips = 0
            t0 = time.time()
            for q in qs:
                et.query("OR " + q, 10)
                if trav == "bmw":
                    st = getattr(et, "last_bmw_stats", None) or {}
                    scored += st.get("scored", 0)
                    skips += st.get("block_skips", 0)
            dt = time.time() - t0
            queries[label] = round(dt, 3)
            detail[label.rsplit("_", 1)[0] + "_qps"] = round(len(qs) / dt, 1)
            if trav == "bmw":
                detail["bmw_skewed_docs_scored"] = int(scored)
                detail["bmw_skewed_block_skips"] = int(skips)

    if "serve" in components:
        from invertedindex_ray.pipelines.serving import (
            serve_queries,
            shared_index_state,
        )
        from invertedindex_ray.sources.bench_corpus import _WORDS
        import numpy as np

        ensure_index()
        rng = np.random.default_rng(7)
        vocab = [w for w in _WORDS if len(w) > 2]
        qs = [
            ("s%d" % i, " ".join(rng.choice(vocab, size=int(rng.integers(2, 5)))))
            for i in range(2000)
        ]
        conc = max(2, num_cpus // 4)
        t0 = time.time()
        n_rows = serve_queries(
            idx_dir, qs, config=cfg, k=100, concurrency=conc
        ).count()
        dt = time.time() - t0
        queries["serve_2000q"] = round(dt, 3)
        detail["serve_qps"] = round(len(qs) / dt, 1)
        detail["serve_concurrency"] = conc
        # warm second pass (VERDICT r3 #6): same session, fresh pool —
        # separates first-touch costs (page cache, import compile) from
        # steady serving throughput; the 2000-query/cold-pool shape makes
        # serve_2000q startup-dominated and drove the r3 "regression"
        t0 = time.time()
        serve_queries(idx_dir, qs, config=cfg, k=100, concurrency=conc).count()
        dtw = time.time() - t0
        queries["serve_warm_2000q"] = round(dtw, 3)
        detail["serve_warm_qps"] = round(len(qs) / dtw, 1)
        # shared decoded doc-table/lexicon (one plasma copy, zero-copy
        # mapped by every actor) — the web-scale pool shape
        ref = shared_index_state(idx_dir)
        t0 = time.time()
        serve_queries(
            idx_dir, qs, config=cfg, k=100, concurrency=conc, state_ref=ref
        ).count()
        dts = time.time() - t0
        queries["serve_shared_2000q"] = round(dts, 3)
        detail["serve_shared_qps"] = round(len(qs) / dts, 1)

    if "topk_batch" in components:
        from invertedindex_ray.pipelines.batch_query import batch_topk
        from invertedindex_ray.pipelines.query_sets import DRIVER_QUERY_SET

        t0 = time.time()
        batch_topk(sf_dir, DRIVER_QUERY_SET, k=20)
        queries["topk_batch"] = round(time.time() - t0, 3)

    if "dedup_minhash" in components:
        from invertedindex_ray.pipelines.dedup import minhash_lsh_pairs

        # .count() drives the FULL pipeline (bands, buckets, pair dedupe,
        # verification joins). Rounds 1-2 timed only the eager signature
        # prefix — the candidate stages were lazy and never executed — so
        # r3 numbers are not comparable to the (underscoped) r1/r2 ones.
        t0 = time.time()
        n_pairs = minhash_lsh_pairs(sf_dir).count()
        queries["dedup_minhash"] = round(time.time() - t0, 3)
        detail["dedup_minhash_pairs"] = int(n_pairs)

    if "ann" in components:
        from invertedindex_ray.pipelines.similarity import ann_topk

        t0 = time.time()
        ann_topk(sf_dir, n_queries=5, k=10)
        queries["ann_topk"] = round(time.time() - t0, 3)

    def ensure_docs_dir() -> str:
        # documents view of the FULL bench corpus (200 K docs at sf0.1;
        # the testdata documents table is tiny), derived once (untimed):
        # doc_id = row position, streamed row-group by row-group (never
        # a driver-side full read). Written as MANY files under a
        # documents.parquet/ directory: a single parquet file gives
        # read_parquet exactly ONE read task, whose serial block
        # production starves 32 consumers and capped measured scaling at
        # ~13x (ds.stats(): 1 read task, 164 cpu-s of map work in a
        # 12.5 s window) — the multi-file layout is also the only shape
        # that exists at 100 TB.
        docs_dir = f"/tmp/iidx-bench-docsd-{sf}-{n_docs}"
        marker = os.path.join(docs_dir, "documents.parquet")
        if not os.path.exists(marker):
            import pyarrow as pa
            import pyarrow.parquet as pq

            tmp = marker + ".tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            os.makedirs(tmp, exist_ok=True)
            next_id = 0
            part = 0
            for fname in sorted(os.listdir(corpus)):
                if not fname.endswith(".parquet"):
                    continue
                pf = pq.ParquetFile(os.path.join(corpus, fname))
                for rg in range(pf.metadata.num_row_groups):
                    t = pf.read_row_group(rg, columns=["text"])
                    t = pa.table(
                        {
                            "doc_id": pa.array(
                                range(next_id, next_id + t.num_rows),
                                type=pa.int64(),
                            ),
                            "text": t["text"],
                        }
                    )
                    next_id += t.num_rows
                    pq.write_table(
                        t, os.path.join(tmp, f"part-{part:05d}.parquet")
                    )
                    part += 1
            os.rename(tmp, marker)
        return docs_dir

    if "passages" in components:
        # passage-level exact dedup over the full bench corpus
        from invertedindex_ray.pipelines.dedup import passage_dedup

        docs_dir = ensure_docs_dir()
        t0 = time.time()
        n_out = passage_dedup(docs_dir).count()
        queries["dedup_passages"] = round(time.time() - t0, 3)
        detail["dedup_passages_docs"] = int(n_out)

    if "positional" in components:
        # positional-index build over the full bench corpus + phrase
        # queries served from the artifact (build timed cold: the dir is
        # wiped first)
        from invertedindex_ray.pipelines.positional import (
            build_positional_index,
            phrase_search_indexed,
        )

        docs_dir = ensure_docs_dir()
        pos_dir = f"/tmp/iidx-bench-posidx-{sf}-{num_cpus}"
        shutil.rmtree(pos_dir, ignore_errors=True)
        t0 = time.time()
        build_positional_index(docs_dir, pos_dir)
        queries["positional_build"] = round(time.time() - t0, 3)
        t0 = time.time()
        n = phrase_search_indexed(docs_dir, index_dir=pos_dir).count()
        queries["phrase_indexed"] = round(time.time() - t0, 3)
        detail["phrase_indexed_rows"] = int(n)

    if "curation" in components:
        # Gopher rule pass over the FULL bench corpus (200 K docs at
        # sf0.1) — representative of the zero-shuffle text-analysis
        # family (quality_score, lang_id, token counts share the shape)
        from invertedindex_ray.pipelines.textstats import gopher_quality

        docs_dir = ensure_docs_dir()
        t0 = time.time()
        n = gopher_quality(docs_dir).count()
        queries["gopher_quality"] = round(time.time() - t0, 3)
        detail["gopher_docs"] = int(n)

    if "events" in components:
        # event-analytics family over the sf events table: strict
        # funnel + first-order transitions (both user-hash keyed
        # reductions with bounded driver sums)
        from invertedindex_ray.pipelines.relational import (
            event_transitions,
            funnel_counts,
        )

        t0 = time.time()
        funnel_counts(sf_dir)
        queries["funnel"] = round(time.time() - t0, 3)
        t0 = time.time()
        tr = event_transitions(sf_dir)
        queries["transitions"] = round(time.time() - t0, 3)
        detail["transition_pairs"] = int(
            sum(tr["n"].to_pylist())
        )

    if "quality" in components:
        # retrieval-quality headline over the planted-relevance corpus
        # (graded qrels fixed at GENERATION time — non-circular): build
        # untimed, time the 50-query evaluation run; metrics land in
        # detail. Context: the reference reports mAP 0.1935 / RR 0.1974
        # / nDCG@10 0.2324 for BM25 over MS MARCO dev (different corpus
        # and qrels depth — context, not a target; on a corpus with
        # planted relevance BM25 should and does score near the top).
        from invertedindex_ray.engine import QueryEngine
        from invertedindex_ray.functions.evaluation import evaluate_run
        from invertedindex_ray.sources.quality_corpus import (
            corpus_fingerprint,
            synth_graded_corpus,
        )

        n_q = min(n_docs, 50_000)
        # cache key carries the full generator fingerprint: a stale
        # index must never be scored against freshly generated qrels
        idx_q = f"/tmp/iidx-bench-quality-{n_q}-{corpus_fingerprint(n_q)}"
        cached = os.path.exists(os.path.join(idx_q, "stats.json"))
        # texts are only needed for a fresh build; qrels/queries come
        # from an independent rng stream and regenerate bit-identically
        table, qset, qrels, grades = synth_graded_corpus(
            n_q, n_topics=50, include_texts=not cached
        )
        if not cached:
            shutil.rmtree(idx_q, ignore_errors=True)
            build_index(rd.from_arrow(table), idx_q, cfg)
        eq = QueryEngine(idx_q, cfg)
        t0 = time.time()
        run = {qid: [u for u, _ in eq.query("OR " + q, 1000)] for qid, q in qset}
        queries["quality_50q"] = round(time.time() - t0, 3)
        m = evaluate_run(run, qrels, ndcg_k=10, grades=grades)
        detail["quality_map"] = round(m["map"], 4)
        detail["quality_mrr"] = round(m["mrr"], 4)
        detail["quality_ndcg10"] = round(m["ndcg@10"], 4)
        detail["quality_n_queries"] = m["n_queries"]

    if "dedup_sigs" in components:
        # the signature stage of the minhash pipeline ALONE (pure-CPU
        # md5+mulmod map, no shuffle) — the scaling-forensics probe that
        # separates "the compute scales" from "the LSH exchange has a
        # fixed single-box latency" (BASELINE.md round-5 dedup section)
        from invertedindex_ray.pipelines.dedup import minhash_signatures

        docs_dir = ensure_docs_dir()
        t0 = time.time()
        n_sigs = minhash_signatures(docs_dir).count()
        queries["dedup_sigs"] = round(time.time() - t0, 3)
        detail["dedup_sigs_rows"] = int(n_sigs)

    if "dedup_minhash_big" in components:
        # the minhash pipeline at a size where the shuffle (not operator
        # startup) dominates — the scaling-evidence twin of dedup_minhash
        # (the sf0.1 documents table is 5k rows / 1.6 MB and finishes in
        # ~2 s, so cpu-count effects drown in fixed overhead there)
        from invertedindex_ray.pipelines.dedup import minhash_lsh_pairs

        docs_dir = ensure_docs_dir()
        t0 = time.time()
        n_pairs = minhash_lsh_pairs(docs_dir).count()
        queries["dedup_minhash_big"] = round(time.time() - t0, 3)
        detail["dedup_minhash_big_pairs"] = int(n_pairs)

    result = {
        "metric": "e2e_bench_sec",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "num_cpus": num_cpus,
        "detail": detail,
    }
    ray.shutdown()
    return result


def run_scaling(sf_dir: str) -> dict:
    """Same job at two parallelism levels (N and 4N cpus), alternated
    over BENCH_ROUNDS rounds of fresh processes.

    The sandbox VM's effective memory speed drifts over time (hypervisor
    demand paging / balloon reclaim), so the two levels are INTERLEAVED
    (lo, hi, lo, hi, ...) and efficiency is computed per adjacent pair,
    reporting the median pair — this controls for the ambient drift that
    a run-all-of-A-then-all-of-B design conflates with the cpu count.
    Levels via BENCH_SCALE_CPUS="8,32"; rounds via BENCH_ROUNDS (1);
    component via BENCH_SCALE_COMPONENT (default "build" — the headline;
    "dedup_minhash" / "dedup_passages" cover the two biggest non-build
    shuffles, VERDICT r3 #7)."""
    levels = tuple(
        int(x) for x in os.environ.get("BENCH_SCALE_CPUS", "8,32").split(",")
    )
    rounds = int(os.environ.get("BENCH_ROUNDS", "1"))
    component = os.environ.get("BENCH_SCALE_COMPONENT", "build")
    # component name -> the key its timing lands under in queries{}
    qkey = {"passages": "dedup_passages",
            "positional": "positional_build",
            "curation": "gopher_quality"}.get(component, component)
    lo, hi = levels

    def one(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_SF_DIR=sf_dir,
            BENCH_COMPONENTS=component,
            BENCH_REPEAT="1",
            # scaling uses the standard sf0.1 bench corpus (200k docs).
            # Larger corpora (800k+) push this VM's working set into
            # hypervisor demand paging, which caps ALL cpu counts at the
            # host's memory bandwidth and masks the real compute scaling;
            # the fused build's fixed overhead is now ~1s, so 200k no
            # longer needs a 4x corpus to amortize it.
            BENCH_CORPUS_DOCS=os.environ.get("BENCH_CORPUS_DOCS", "200000"),
        )
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        )
        return json.loads(r.stdout.strip().splitlines()[-1])

    pairs = []
    for _ in range(rounds):
        a, b = one(lo), one(hi)
        pair = {
            "sec_lo": a["queries"][qkey],
            "sec_hi": b["queries"][qkey],
            "efficiency": round(
                (a["queries"][qkey] / b["queries"][qkey]) / (hi / lo), 3
            ),
        }
        if component == "build":
            pair["docs_per_s_lo"] = a["detail"]["build_docs_per_s"]
            pair["docs_per_s_hi"] = b["detail"]["build_docs_per_s"]
        pairs.append(pair)
    best = sorted(pairs, key=lambda p: p["efficiency"])[len(pairs) // 2]
    out = {
        "metric": "scaling_efficiency",
        "component": component,
        "cpus_lo": lo,
        "cpus_hi": hi,
        "sec_lo": best["sec_lo"],
        "sec_hi": best["sec_hi"],
        "scaling_efficiency": best["efficiency"],
        "pairs": pairs,
    }
    if component == "build":
        # back-compat field names read by earlier rounds' tooling
        out["build_sec_lo"] = best["sec_lo"]
        out["build_sec_hi"] = best["sec_hi"]
        out["docs_per_s_lo"] = best["docs_per_s_lo"]
        out["docs_per_s_hi"] = best["docs_per_s_hi"]
    return out


if __name__ == "__main__":
    sf_dir = os.environ.get("GRAFT_SF_DIR", DEFAULT_SF_DIR)
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(sf_dir)))
    else:
        ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
        comps = os.environ.get(
            "BENCH_COMPONENTS",
            "build,daat,bmw_skewed,quality,serve,topk_batch,dedup_minhash,"
            "ann,passages,positional,curation,events",
        ).split(",")
        print(json.dumps(run_bench(sf_dir, ncpu, comps)))
