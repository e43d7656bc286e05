"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR (default
sf0.1), one JSON line on stdout.

    python bench.py              # single run at RAY_GRAFT_CPUS (default 32)
    python bench.py --scaling    # fresh processes at 8 and 32 CPUs →
                                 # throughput at both + scaling efficiency

Headline metric: end-to-end extraction seconds over a replicated
Common-Crawl-style pages corpus (REPL × documents rows; HTML+PDF+text
mix), read → dispatch+extract → partitioned parquet write.  Pages are
materialized to /tmp once (untimed, cached) so the timed section
measures the engine, not fixture synthesis; one untimed read warms the
page cache first.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPL = int(os.environ.get("BENCH_REPLICATION", "100"))
PAGES_CACHE = "/tmp/bench_pages"


def prepare_pages(sf_dir: str, repl: int) -> str:
    """Materialize the replicated pages table once (untimed, cached).

    Replica r of doc d gets doc_id' = d + r * 10_000_000 → unique urls,
    same text → exact-dup clusters of size `repl` (feeds the dedup bench).
    """
    import pyarrow as pa
    import ray.data as rd

    from llm_food_ray.schema import PAGES_SCHEMA
    from llm_food_ray.sources.pages import synth_page_record

    tag = os.path.basename(os.path.normpath(sf_dir))
    out = f"{PAGES_CACHE}_{tag}_x{repl}"
    if os.path.isdir(out) and os.listdir(out):
        return out

    def synth(batch: pa.Table) -> pa.Table:
        rows = []
        for d, t, l in zip(batch.column("doc_id").to_pylist(),
                           batch.column("text").to_pylist(),
                           batch.column("lang").to_pylist()):
            for r in range(repl):
                rows.append(synth_page_record(d + r * 10_000_000, t or "", l or ""))
        return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)

    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    # 128 shards: write runs one task per block (NO min_rows_per_file —
    # it coalesces the write into a handful of tasks and files, which
    # then caps read parallelism for every timed run).  Small row groups
    # (1000 rows) let override_num_blocks split WITHIN files, so timed
    # reads can balance blocks finely (row-group granularity is the read
    # split limit).
    (rd.read_parquet(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "text", "lang"])
       .repartition(128)
       .map_batches(synth, batch_format="pyarrow")
       .write_parquet(tmp, row_group_size=1000))
    os.rename(tmp, out)
    return out


def run_bench() -> dict:
    import ray

    ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import ray.data as rd

    from llm_food_ray.config import ChunkConfig, ExtractConfig
    from llm_food_ray.pipelines.extract import extract_dataset
    from llm_food_ray.stages.chunk import ChunkStage
    from llm_food_ray.stages.dedup import dedup_exact, minhash_candidate_pairs
    from llm_food_ray.stages.similarity import brute_topk

    pages_dir = prepare_pages(SF_DIR, REPL)
    # read parallelism: fine-grained fixed block count (independent of
    # NCPU so both scaling runs execute the same plan); many small waves
    # smooth per-task skew from uneven document lengths
    nblocks = 256

    def read_pages(columns=None):
        return rd.read_parquet(pages_dir, columns=columns,
                               override_num_blocks=nblocks)

    # untimed warm-up: count() is metadata-only for parquet, so the page
    # cache would stay cold and the first timed run would measure disk
    # state left by whatever ran before — read the actual bytes instead
    for name in os.listdir(pages_dir):
        if name.endswith(".parquet"):
            with open(os.path.join(pages_dir, name), "rb") as f:
                while f.read(1 << 24):
                    pass
    n_pages = read_pages().count()

    queries: dict[str, float] = {}
    out_dir = f"/tmp/bench_out_{NCPU}"

    if os.environ.get("BENCH_ONLY") == "neardup":
        # wide-op scaling leg: the fully-distributed near-dup kept-set
        # (semijoin verify + min-label clustering + anti-join keep — the
        # engine's heaviest exchange plan).  Extraction runs once UNTIMED
        # to produce the corpus; the timed section is all shuffle.
        from llm_food_ray.stages.dedup import (dedup_near_keep,
                                               minhash_candidate_pairs)

        shutil.rmtree(out_dir, ignore_errors=True)
        (extract_dataset(read_pages(), ExtractConfig(), whale_leg=False)
         .write_parquet(out_dir))
        neardup_sec = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            pairs = minhash_candidate_pairs(
                rd.read_parquet(out_dir, columns=["url", "markdown"],
                                override_num_blocks=nblocks),
                "url", "markdown", threshold=0.9, verify="estimate",
                num_perm=128, num_bands=16, pair_mode="star",
                verify_exec="semijoin",
            )
            n_near_kept = dedup_near_keep(
                rd.read_parquet(out_dir, columns=["url"],
                                override_num_blocks=nblocks),
                "url", pairs, cluster_exec="distributed").count()
            neardup_sec = min(neardup_sec, time.perf_counter() - t0)
        queries["neardup_keep_distributed"] = round(neardup_sec, 3)
        ray.shutdown()
        return {
            "metric": "fully-distributed near-dup kept-set seconds "
                      "(semijoin verify + min-label clustering + "
                      "anti-join keep) over extracted corpus",
            "value": round(neardup_sec, 3),
            "unit": "sec",
            "queries": queries,
            "sf": SF_DIR,
            "num_cpus": NCPU,
            "n_pages": n_pages,
            "n_near_kept": n_near_kept,
            "docs_per_sec": round(n_pages / neardup_sec, 1),
        }

    if os.environ.get("BENCH_ONLY") == "lm":
        # wide-op scaling leg #2: bigram-LM train+score — ONE
        # fingerprint-space model exchange + driver gather + broadcast,
        # then tokenize-heavy scoring (compute-dominated, unlike the
        # round-latency-bound neardup leg).  Extraction runs UNTIMED to
        # produce the corpus; timed = train + score.
        from llm_food_ray.stages.lm import lm_score as _lm_score

        shutil.rmtree(out_dir, ignore_errors=True)
        (extract_dataset(read_pages(), ExtractConfig(), whale_leg=False)
         .write_parquet(out_dir))
        lm_sec = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            n_lm_leg = _lm_score(
                rd.read_parquet(out_dir, columns=["url", "markdown"],
                                override_num_blocks=nblocks),
                key_column="url", text_column="markdown").count()
            lm_sec = min(lm_sec, time.perf_counter() - t0)
        queries["lm_score"] = round(lm_sec, 3)
        ray.shutdown()
        return {
            "metric": "bigram-LM train+score seconds (fingerprint model "
                      "exchange + broadcast scoring) over extracted corpus",
            "value": round(lm_sec, 3),
            "unit": "sec",
            "queries": queries,
            "sf": SF_DIR,
            "num_cpus": NCPU,
            "n_pages": n_pages,
            "n_lm": n_lm_leg,
            "docs_per_sec": round(n_pages / lm_sec, 1),
        }

    # --- headline: extraction end-to-end (best-of-2: single measurements
    # swing ~20% on this host from page-cache / hugepage state) ----------
    extract_sec = float("inf")
    for _ in range(2):
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.perf_counter()
        ds = read_pages()
        extracted = extract_dataset(ds, ExtractConfig(), whale_leg=False)
        extracted.write_parquet(out_dir)
        extract_sec = min(extract_sec, time.perf_counter() - t0)
    queries["extract"] = round(extract_sec, 3)

    if os.environ.get("BENCH_ONLY") == "extract":
        # scaling legs time only the headline pipeline
        ray.shutdown()
        return {
            "metric": "end-to-end extraction seconds over replicated pages "
                      "corpus (read -> dispatch+extract -> parquet write)",
            "value": round(extract_sec, 3),
            "unit": "sec",
            "queries": queries,
            "sf": SF_DIR,
            "num_cpus": NCPU,
            "n_pages": n_pages,
            "docs_per_sec": round(n_pages / extract_sec, 1),
        }

    # --- chunk: token chunker over the extracted markdown ---------------
    t0 = time.perf_counter()
    chunks = rd.read_parquet(out_dir, columns=["url", "markdown"],
                             override_num_blocks=nblocks).map_batches(
        ChunkStage(ChunkConfig(strategy="token", chunk_size=512, chunk_overlap=128)),
        batch_format="pyarrow",
    )
    n_chunks = chunks.count()
    queries["chunk"] = round(time.perf_counter() - t0, 3)

    # --- dedup: exact (replication → clusters of REPL) ------------------
    t0 = time.perf_counter()
    ext_txt = rd.read_parquet(out_dir, columns=["url", "markdown"],
                              override_num_blocks=nblocks)
    kept = dedup_exact(ext_txt, "url", "markdown")
    n_kept = kept.count()
    queries["dedup_exact"] = round(time.perf_counter() - t0, 3)

    # --- dedup: incremental (delta-crawl) — partitioned anti join vs the
    # Bloom-prefilter plan. The archive is every third url's markdown
    # (~33% dup rate in the "new" corpus); bloom routes the other ~67%
    # straight to the output and only candidates pay the join.
    from llm_food_ray.stages.dedup import dedup_against

    def _make_sides():
        new_side = rd.read_parquet(out_dir, columns=["url", "markdown"],
                                   override_num_blocks=nblocks)

        def third(b):
            import pyarrow as _p

            # archive every third UNDERLYING doc (url carries
            # doc + replica*1e7; replicas share content) → ~33% of the
            # new corpus is a content dup, ~67% is definitely new
            h = [(int(u.rsplit("/", 1)[1]) % 10_000_000) % 3 == 0
                 for u in b.column("url").to_pylist()]
            return b.filter(_p.array(h))

        seen_side = new_side.map_batches(third, batch_format="pyarrow")
        return new_side, seen_side

    n_incr = {}
    for plan in ("anti", "bloom"):
        new_side, seen_side = _make_sides()
        t0 = time.perf_counter()
        n_incr[plan] = dedup_against(
            new_side, seen_side, text_column="markdown", exec=plan).count()
        queries[f"dedup_incremental_{plan}"] = round(
            time.perf_counter() - t0, 3)
    assert n_incr["anti"] == n_incr["bloom"], n_incr

    # --- dedup: minhash-LSH estimate over extracted markdown ------------
    # measured in all three verify regimes: "broadcast" (the auto-picked
    # default at this corpus size — signature index ray.put once, pairs
    # scored in map_batches), "semijoin" (fp-space bucketed semi-join —
    # the plan that survives when the index outgrows one machine), and
    # "driver" (everything local — small-scale/debug twin).
    names = {"broadcast": "dedup_minhash", "semijoin": "dedup_minhash_semijoin",
             "driver": "dedup_minhash_driver"}
    for mode, name in names.items():
        # headline (broadcast) leg best-of-2: single runs swing ~2x with
        # this host's external load
        best = float("inf")
        for _ in range(2 if mode == "broadcast" else 1):
            t0 = time.perf_counter()
            pairs = minhash_candidate_pairs(
                rd.read_parquet(out_dir, columns=["url", "markdown"],
                                override_num_blocks=nblocks),
                "url", "markdown", threshold=0.9, verify="estimate",
                num_perm=128, num_bands=16, pair_mode="star", verify_exec=mode,
            )
            n_pairs = pairs.count()
            best = min(best, time.perf_counter() - t0)
        queries[name] = round(best, 3)
        if mode == "broadcast":
            # full kept-set tail on the confirmed pairs: clustering
            # (auto-gated union-find / min-label propagation) + keep
            from llm_food_ray.stages.dedup import dedup_near_keep

            t0 = time.perf_counter()
            corpus = rd.read_parquet(out_dir, columns=["url"],
                                     override_num_blocks=nblocks)
            n_near_kept = dedup_near_keep(corpus, "url", pairs).count()
            queries["dedup_minhash_keep"] = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            n_near_kept_dist = dedup_near_keep(
                corpus, "url", pairs, cluster_exec="distributed").count()
            assert n_near_kept_dist == n_near_kept
            queries["dedup_minhash_keep_distributed"] = round(
                time.perf_counter() - t0, 3)

    # --- curate: composed droppy pipeline over extracted markdown -------
    # repetition filter -> PII scrub -> exact dedup -> md5 split, one
    # streaming pass (plus dedup's partial-reduce exchange)
    from llm_food_ray.functions.pii import scrub_pii
    from llm_food_ray.functions.repetition import (
        passes_repetition_filter, repetition_features)
    from llm_food_ray.stages.textstats import hash_split

    import pyarrow as _pa

    def _filter_scrub(batch):
        texts = [t or "" for t in batch.column("markdown").to_pylist()]
        keep, clean = [], []
        for t in texts:
            keep.append(passes_repetition_filter(repetition_features(t)))
            clean.append(scrub_pii(t))
        t2 = _pa.table({"url": batch.column("url"),
                        "clean": _pa.array(clean, _pa.string())})
        return t2.filter(_pa.array(keep, _pa.bool_()))

    t0 = time.perf_counter()
    cur = rd.read_parquet(out_dir, columns=["url", "markdown"],
                          override_num_blocks=nblocks).map_batches(
        _filter_scrub, batch_format="pyarrow")
    cur = hash_split(dedup_exact(cur, "url", "clean"), "url", test_pct=10)
    n_curated = cur.count()
    queries["curate"] = round(time.perf_counter() - t0, 3)

    # --- textstats: lang-ID + quality over the extracted markdown -------
    from llm_food_ray.stages.textstats import TextStatsStage

    t0 = time.perf_counter()
    stats = rd.read_parquet(out_dir, columns=["url", "markdown"],
                            override_num_blocks=nblocks).map_batches(
        TextStatsStage(text_column="markdown", features=("lang_id", "quality")),
        batch_format="pyarrow",
    )
    n_stats = stats.count()
    queries["textstats"] = round(time.perf_counter() - t0, 3)

    # --- quality-tier extraction (r4 theme): score -> ONE histogram
    # exchange for the global quartile thresholds -> streaming filter
    # keeping the top tier ------------------------------------------------
    import pyarrow.compute as _pc_t

    from llm_food_ray.stages.textstats import tier_by_global_quantiles

    t0 = time.perf_counter()
    tiers = tier_by_global_quantiles(
        rd.read_parquet(out_dir, columns=["url", "markdown"],
                        override_num_blocks=nblocks).map_batches(
            TextStatsStage(text_column="markdown", features=("quality",)),
            batch_format="pyarrow",
        ).select_columns(["url", "quality"]),
        "quality")
    n_top_tier = tiers.map_batches(
        lambda b: b.filter(_pc_t.equal(b.column("tier"), 4)),
        batch_format="pyarrow").count()
    queries["tier_extract"] = round(time.perf_counter() - t0, 3)
    assert 0 < n_top_tier < n_pages

    # --- bigram-LM perplexity score over the extracted markdown ---------
    # r3: fingerprint-keyed model + searchsorted scoring (was a full
    # string-vocab driver broadcast + per-token dict loop)
    from llm_food_ray.stages.lm import lm_score

    t0 = time.perf_counter()
    n_lm = lm_score(rd.read_parquet(out_dir, columns=["url", "markdown"],
                                    override_num_blocks=nblocks),
                    key_column="url", text_column="markdown").count()
    queries["lm_score"] = round(time.perf_counter() - t0, 3)
    assert n_lm == n_pages

    # --- min_count posture: same pipeline with the pruned model — the
    # Zipf-bound evidence (model rows before/after prune) plus the
    # scoring wall-time with the smaller broadcast ----------------------
    from llm_food_ray.stages.lm import BigramNllScorer, train_bigram_model
    from llm_food_ray.stages.pools import scoring_pool

    t0 = time.perf_counter()
    lm_model2 = train_bigram_model(
        rd.read_parquet(out_dir, columns=["markdown"],
                        override_num_blocks=nblocks),
        "markdown", min_count=2)
    n_lm2 = (rd.read_parquet(out_dir, columns=["url", "markdown"],
                             override_num_blocks=nblocks)
             .map_batches(BigramNllScorer,
                          fn_constructor_kwargs={"key_column": "url",
                                                 "text_column": "markdown",
                                                 "model": lm_model2},
                          concurrency=scoring_pool(None),
                          batch_format="pyarrow").count())
    queries["lm_score_min2"] = round(time.perf_counter() - t0, 3)
    assert n_lm2 == n_pages
    lm_model_stats = lm_model2["stats"]

    # --- Naive Bayes train+classify over the extracted markdown (label
    # = doc_type): per-class fingerprint counts -> one (label, fp)
    # exchange -> broadcast-model actor-pool argmax scoring ------------
    from llm_food_ray.stages.classify import nb_classify

    t0 = time.perf_counter()
    n_nb = nb_classify(
        rd.read_parquet(out_dir, columns=["url", "markdown", "doc_type"],
                        override_num_blocks=nblocks),
        key_column="url", text_column="markdown",
        label_column="doc_type").count()
    queries["nb_classify"] = round(time.perf_counter() - t0, 3)
    assert n_nb == n_pages

    # --- BPE merge-step pair count over the extracted markdown: numpy
    # per-batch bincounts in packed codepoint space -> one pair-vocab
    # groupby -> deterministic top-k -----------------------------------
    from llm_food_ray.stages.vocab import top_char_pairs

    t0 = time.perf_counter()
    n_bpe = top_char_pairs(
        rd.read_parquet(out_dir, columns=["markdown"],
                        override_num_blocks=nblocks),
        "markdown", k=20).count()
    queries["bpe_pairs"] = round(time.perf_counter() - t0, 3)
    assert n_bpe == 20

    # --- iterative BPE training (8 merges) over the same markdown: one
    # corpus scan for the word table, then 8 vocab-sized merge rounds --
    from llm_food_ray.stages.vocab import bpe_train

    t0 = time.perf_counter()
    n_bpet = bpe_train(
        rd.read_parquet(out_dir, columns=["markdown"],
                        override_num_blocks=nblocks),
        "markdown", num_merges=8).count()
    queries["bpe_train"] = round(time.perf_counter() - t0, 3)
    assert n_bpet == 8

    # --- BPE apply: fit + fp-model broadcast + streaming encode pass,
    # per-doc token counts over all 500k docs ---------------------------
    from llm_food_ray.stages.vocab import bpe_token_counts

    t0 = time.perf_counter()
    n_enc = bpe_token_counts(
        rd.read_parquet(out_dir, columns=["url", "markdown"],
                        override_num_blocks=nblocks),
        "markdown", num_merges=8, id_column="url").count()
    queries["bpe_encode"] = round(time.perf_counter() - t0, 3)
    assert n_enc == n_pages

    # --- PMI collocations over the extracted markdown ------------------
    from llm_food_ray.stages.textstats import top_pmi_pairs

    t0 = time.perf_counter()
    n_pmi = top_pmi_pairs(
        rd.read_parquet(out_dir, columns=["markdown"],
                        override_num_blocks=nblocks),
        "markdown", window=2, k=20, min_count=5).count()
    queries["top_pmi"] = round(time.perf_counter() - t0, 3)
    assert n_pmi == 20

    # --- inverted-index build + pruned term lookup over the extracted
    # markdown (hive bucket layout; lookup reads only matching buckets)
    import tempfile as _tf

    from llm_food_ray.stages.index import build_term_index, term_lookup

    ix_dir = _tf.mkdtemp(prefix="bench_ix_")
    t0 = time.perf_counter()
    build_term_index(
        rd.read_parquet(out_dir, columns=["url", "markdown"],
                        override_num_blocks=nblocks),
        ix_dir, id_column="url", text_column="markdown")
    n_postings = term_lookup(ix_dir, ["the", "data", "stream"],
                             id_column="url").count()
    queries["term_index"] = round(time.perf_counter() - t0, 3)
    assert n_postings > 0
    shutil.rmtree(ix_dir, ignore_errors=True)

    # --- duplicate-window spans (ExactSubstr-style) over the extracted
    # markdown: two streaming crc32-window passes + one fp groupby; the
    # replicated corpus makes every in-text window a ~REPL-way dup, so
    # nearly every page emits a span --------------------------------------
    from llm_food_ray.stages.dupspans import duplicate_spans

    t0 = time.perf_counter()
    n_dup_spans = duplicate_spans(
        rd.read_parquet(out_dir, columns=["url", "markdown"],
                        override_num_blocks=nblocks),
        id_column="url", text_column="markdown").count()
    queries["dup_spans"] = round(time.perf_counter() - t0, 3)
    assert n_dup_spans > 0

    # --- cross-document per-host boilerplate strip over the extracted
    # markdown (hosts from the url scheme: 100 hosts × ~5k docs):
    # (host, line-md5) doc-count combiner exchange → auto-gated
    # broadcast second pass.  min_docs sits just above the replication
    # factor so only lines shared by DISTINCT source documents of a
    # host count as chrome, not the REPL-way exact copies ---------------
    import pyarrow as _pa3

    from llm_food_ray.functions.urltools import url_host
    from llm_food_ray.stages.dedup import strip_host_boilerplate

    def with_host(b):
        hosts = [url_host(u) for u in b.column("url").to_pylist()]
        return b.append_column("host", _pa3.array(hosts, _pa3.string()))

    t0 = time.perf_counter()
    n_clean = strip_host_boilerplate(
        rd.read_parquet(out_dir, columns=["url", "markdown"],
                        override_num_blocks=nblocks)
          .map_batches(with_host, batch_format="pyarrow"),
        "host", "url", "markdown", min_docs=REPL + 1).count()
    queries["strip_boilerplate"] = round(time.perf_counter() - t0, 3)
    assert n_clean == n_pages

    # --- heavy-hitters top-20 bigrams: the Misra–Gries sketch plan
    # (capacity×blocks exchange + exact candidate verify) timed against
    # the full-vocabulary exact groupby on the same corpus; results
    # asserted identical — a bench-time differential ---------------------
    from llm_food_ray.stages.textstats import top_ngrams, top_ngrams_sketch

    t0 = time.perf_counter()
    sk_rows = top_ngrams_sketch(
        rd.read_parquet(out_dir, columns=["markdown"],
                        override_num_blocks=nblocks),
        "markdown", n=2, k=20, capacity=4096).take_all()
    queries["top_bigrams_sketch"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    ex_rows = top_ngrams(
        rd.read_parquet(out_dir, columns=["markdown"],
                        override_num_blocks=nblocks),
        "markdown", n=2, k=20).take_all()
    queries["top_bigrams_exact"] = round(time.perf_counter() - t0, 3)
    assert sk_rows == ex_rows

    # --- cross-corpus n-gram window coverage: archive = every third
    # underlying doc's markdown, new = the other ~67% (333k docs); the
    # wide step is the distinct-window fp hash join + doc-keyed sum ----
    from llm_food_ray.stages.dupspans import window_coverage_against

    def _cov_side(keep_seen: bool):
        side = rd.read_parquet(out_dir, columns=["url", "markdown"],
                               override_num_blocks=nblocks)

        def f(b):
            import pyarrow as _p

            h = [((int(u.rsplit("/", 1)[1]) % 10_000_000) % 3 == 0)
                 == keep_seen for u in b.column("url").to_pylist()]
            return b.filter(_p.array(h))

        return side.map_batches(f, batch_format="pyarrow")

    t0 = time.perf_counter()
    n_cov = window_coverage_against(
        _cov_side(False), _cov_side(True),
        id_column="url", text_column="markdown").count()
    queries["ngram_coverage"] = round(time.perf_counter() - t0, 3)
    assert n_cov > 0

    # --- per-host c-TF-IDF distinctive terms (100 hosts × ~5k docs):
    # vocab×hosts pre-aggregated exchange, term-keyed df, vocab join,
    # coarse-bucketed top-10 resolve --------------------------------------
    from llm_food_ray.stages.search import distinctive_terms

    t0 = time.perf_counter()
    n_dterms = distinctive_terms(
        rd.read_parquet(out_dir, columns=["url", "markdown"],
                        override_num_blocks=nblocks)
          .map_batches(with_host, batch_format="pyarrow"),
        "host", "markdown", k=10).count()
    queries["distinctive_terms"] = round(time.perf_counter() - t0, 3)
    assert n_dterms > 0

    # --- web-graph: outlink extraction + host-graph rollup over the
    # 500k raw pages (regex anchor parse per page, hosts² groupby) -----
    import pyarrow as _pa2

    from ray.data.aggregate import Sum as _Sum

    from llm_food_ray.functions.html_md import extract_links, resolve_href
    from llm_food_ray.functions.urltools import url_host

    def _edges(batch):
        src, dst = [], []
        for u, payload in zip(batch.column("url").to_pylist(),
                              batch.column("html").to_pylist()):
            if not payload or not payload.startswith(b"<"):
                continue
            for href, _txt in extract_links(payload.decode("utf-8",
                                                           "ignore")):
                src.append(url_host(u))
                dst.append(url_host(resolve_href(u, href)))
        t = _pa2.table({"src_host": _pa2.array(src, _pa2.string()),
                        "dst_host": _pa2.array(dst, _pa2.string())})
        g = t.group_by(["src_host", "dst_host"]).aggregate(
            [("dst_host", "count")])
        return g.rename_columns(["src_host", "dst_host", "pn"])

    t0 = time.perf_counter()
    n_hosts = (rd.read_parquet(pages_dir, columns=["url", "html"],
                               override_num_blocks=nblocks)
                 .map_batches(_edges, batch_format="pyarrow")
                 .groupby(["src_host", "dst_host"])
                 .aggregate(_Sum("pn", alias_name="n_links"))).count()
    queries["host_graph"] = round(time.perf_counter() - t0, 3)

    # --- crawl snapshot diff: full-outer hash join of two 500k-key
    # (url, content_hash) projections derived from the extracted corpus
    # (drop 1/11 -> removed, rehash 1/7 -> changed, clone 1/13 under new
    # urls -> added); the engine's join-throughput leg ------------------
    from llm_food_ray.stages.dedup import _fingerprint128, crawl_diff

    t0 = time.perf_counter()

    def snap_new(b):
        import numpy as _np

        import pyarrow as _pa3
        import pyarrow.compute as _pc3

        h, _ = _fingerprint128(b.column("url"))
        keep = (h % _np.uint64(11)) != 0
        changed = (h % _np.uint64(7)) == 0
        hashes = _pc3.if_else(
            _pa3.array(changed),
            _pc3.binary_join_element_wise(
                b.column("content_hash").cast(_pa3.string()), "v2", ""),
            b.column("content_hash").cast(_pa3.string()))
        base = _pa3.table({"url": b.column("url"),
                           "h": hashes}).filter(_pa3.array(keep))
        added_mask = (h % _np.uint64(13)) == 0
        added = _pa3.table({
            "url": _pc3.binary_join_element_wise(
                b.column("url"), "?added=1", ""),
            "h": b.column("content_hash").cast(_pa3.string()),
        }).filter(_pa3.array(added_mask))
        return _pa3.concat_tables([base, added])

    def snap_old(b):
        import pyarrow as _pa3

        return _pa3.table({"url": b.column("url"),
                           "h": b.column("content_hash").cast(_pa3.string())})

    old_snap = rd.read_parquet(out_dir, columns=["url", "content_hash"],
                               override_num_blocks=nblocks).map_batches(
        snap_old, batch_format="pyarrow")
    new_snap = rd.read_parquet(out_dir, columns=["url", "content_hash"],
                               override_num_blocks=nblocks).map_batches(
        snap_new, batch_format="pyarrow")
    n_churn = crawl_diff(old_snap, new_snap, "url", "h").count()
    queries["crawl_diff"] = round(time.perf_counter() - t0, 3)
    assert 0 < n_churn < n_pages

    # --- windowed aggregate over the events table -----------------------
    import __ray_entry__ as _entry

    t0 = time.perf_counter()
    n_windows = _entry.q_events_window(SF_DIR).count()
    queries["events_window"] = round(time.perf_counter() - t0, 3)

    # --- ann: brute-force cosine top-10 ---------------------------------
    import pyarrow.dataset as pads

    qvec = pads.dataset(f"{SF_DIR}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"],
        filter=(pads.field("vec_id") == 0),
    ).column("embedding")[0].as_py()
    t0 = time.perf_counter()
    top = brute_topk(rd.read_parquet(f"{SF_DIR}/embeddings.parquet"), qvec, 10)
    top.to_pandas()
    queries["ann_topk"] = round(time.perf_counter() - t0, 3)

    # --- semdedup: k-means + within-cluster cosine pruning over a
    # 20x-replicated embedding corpus (replicas are scaled copies ->
    # cosine-1 near-dups; ~95% of the corpus should drop) --------------
    from llm_food_ray.stages.similarity import semdedup

    def _replicate_emb(b):
        import numpy as _np
        import pyarrow as _pa

        ids = b.column("vec_id").to_numpy()
        mat = _np.asarray(b.column("embedding").combine_chunks().flatten(),
                          _np.float64).reshape(len(ids), -1)
        out_ids, out_vecs = [], []
        for r in range(20):
            out_ids.append(ids + r * 10_000_000)
            out_vecs.append(mat * (1.0 + r * 1e-6))
        allv = _np.concatenate(out_vecs)
        return _pa.table({
            "vec_id": _pa.array(_np.concatenate(out_ids), _pa.int64()),
            "embedding": _pa.FixedSizeListArray.from_arrays(
                _pa.array(allv.ravel(), _pa.float64()), allv.shape[1]).cast(
                    _pa.list_(_pa.float64())),
        })

    emb20 = rd.read_parquet(f"{SF_DIR}/embeddings.parquet",
                            columns=["vec_id", "embedding"]) \
              .map_batches(_replicate_emb, batch_format="pyarrow")
    t0 = time.perf_counter()
    n_sem = semdedup(emb20, k=32, iters=2, modulus=7, tau=0.95).count()
    queries["semdedup"] = round(time.perf_counter() - t0, 3)
    assert 0 < n_sem < emb20.count()

    # --- graph analytics (r4-cont-4): per-node triangles via the
    # degree-oriented wedge join, then 3-round k-core peeling ---------
    t0 = time.perf_counter()
    n_tri = _entry.q_triangle_counts(SF_DIR).count()
    queries["triangle_counts"] = round(time.perf_counter() - t0, 3)
    assert n_tri > 0
    t0 = time.perf_counter()
    n_core = _entry.q_kcore(SF_DIR).count()
    queries["kcore"] = round(time.perf_counter() - t0, 3)
    assert n_core > 0

    # --- exact distance-1 fuzzy join over customer names --------------
    t0 = time.perf_counter()
    n_fz = _entry.q_editdist_pairs(SF_DIR).count()
    queries["editdist_pairs"] = round(time.perf_counter() - t0, 3)
    assert n_fz > 0

    # --- margin-based bitext mining across the embedding halves -------
    t0 = time.perf_counter()
    n_bt = _entry.q_bitext_mine(SF_DIR).count()
    queries["bitext_mine"] = round(time.perf_counter() - t0, 3)
    assert n_bt > 0

    # --- event-stream analytics: Markov transitions + ordered funnel --
    t0 = time.perf_counter()
    n_et = _entry.q_event_transitions(SF_DIR).count()
    n_fu = _entry.q_funnel(SF_DIR).count()
    queries["event_analytics"] = round(time.perf_counter() - t0, 3)
    assert n_et > 0 and n_fu == 3

    # --- trainable classifier: 6 exact fixed-point GD epochs + one
    # accuracy pass (8 scans of the documents table) ------------------
    t0 = time.perf_counter()
    n_lr = _entry.q_quality_logreg(SF_DIR).count()
    queries["quality_logreg"] = round(time.perf_counter() - t0, 3)
    assert n_lr > 0

    # --- seeded harmonic centrality: 3 per-seed BFS rounds over the
    # purchase graph (join + (node, seed) groupby.min per round) ------
    t0 = time.perf_counter()
    n_hc = _entry.q_harmonic(SF_DIR).count()
    queries["harmonic"] = round(time.perf_counter() - t0, 3)
    assert n_hc > 0

    # --- vocabulary-drift PSI: two tokenizing scans folding into 64
    # md5 term buckets ------------------------------------------------
    t0 = time.perf_counter()
    n_td = _entry.q_term_drift(SF_DIR).count()
    queries["term_drift"] = round(time.perf_counter() - t0, 3)
    assert n_td > 0

    ray.shutdown()
    return {
        "metric": "end-to-end extraction seconds over replicated pages corpus "
                  "(read -> dispatch+extract -> parquet write)",
        "value": round(extract_sec, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NCPU,
        "n_pages": n_pages,
        "docs_per_sec": round(n_pages / extract_sec, 1),
        "n_chunks": n_chunks,
        "n_kept": n_kept,
        "n_curated": n_curated,
        "n_dup_pairs": n_pairs,
        "n_stats": n_stats,
        "n_windows": n_windows,
        "lm_model_stats": lm_model_stats,
    }


def run_scaling() -> dict:
    """Same jobs in fresh processes at N and 4N cores → efficiency.

    Proxy for the north rule's N-vs-4N cluster-size criterion (no real
    cluster in this sandbox): efficiency = (t_N / t_4N) / 4.  Three legs:
    the zero-exchange extraction headline, the fully-distributed
    near-dup kept-set (the engine's heaviest shuffle plan — fixed
    per-round exchange latency dominates at this corpus size), and the
    bigram-LM train+score (a compute-dominated wide op: ONE model
    exchange + tokenize-heavy scoring), so the efficiency claim covers
    all three pipeline shapes.

    Default N=4 (pair 4→16): on this single box, 32 concurrent extract
    processes saturate the VM's memory bandwidth — a shared-resource
    ceiling that a real 4N-node cluster does not have (bandwidth scales
    with nodes, and the pipeline has no cross-node exchanges beyond read
    and write).  The 4→16 pair measures the ENGINE's scaling; the 8→32
    figure is reported in BASELINE.md alongside the bandwidth analysis.
    Override with BENCH_SCALE_BASE=8; BENCH_SCALE_LEGS=extract or
    neardup runs one leg only."""
    def one(ncpu: int, leg: str, repl: int, repeats: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   BENCH_ONLY=leg, BENCH_REPLICATION=str(repl))
        # pin the whole process tree to ncpu physical cores: ray's
        # num_cpus only caps concurrent TASKS, while pyarrow IO/compression
        # threadpools would otherwise spill onto all cores and flatter the
        # small run — taskset makes "N cpus" mean N cores, like a node count
        cmd = ["taskset", "-c", f"0-{ncpu - 1}", sys.executable,
               os.path.join(os.path.dirname(__file__) or ".", "bench.py")]
        # best-of-N: damps transient system noise (page-cache eviction,
        # hugepage compaction) that otherwise swings a single 10-second
        # measurement by 1.5x on this VM
        best = None
        for _ in range(repeats):
            out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                                 check=True).stdout
            r = json.loads(out.strip().splitlines()[-1])
            if best is None or r["value"] < best["value"]:
                best = r
        best["docs_per_sec"] = round(best["n_pages"] / best["value"], 1)
        return best

    base = int(os.environ.get("BENCH_SCALE_BASE", "4"))
    quad = base * 4
    user_repl = os.environ.get("BENCH_REPLICATION")
    legs_cfg = {
        # 2× corpus for the extract leg: amortizes the fixed pipeline-
        # launch cost so the efficiency number reflects steady-state
        # throughput (the regime that matters at 100 TB), not startup.
        "extract": (int(user_repl) if user_repl else REPL * 2, 2),
        # the near-dup leg already runs minutes per measurement (its
        # timed section is all shuffle + best-of-2 inside run_bench)
        "neardup": (int(user_repl) if user_repl else REPL, 1),
        # compute-dominated wide op (model exchange + tokenize scoring):
        # the shuffle-bearing shape whose efficiency is NOT hidden by
        # fixed per-round exchange latency
        "lm": (int(user_repl) if user_repl else REPL, 1),
    }
    which = os.environ.get("BENCH_SCALE_LEGS")
    if which:
        legs_cfg = {k: v for k, v in legs_cfg.items() if k in which.split(",")}
    result = {
        "metric": f"scaling efficiency {base}->{quad} cpus "
                  "(same input, fresh pinned processes, best-of-2)",
        "sf": SF_DIR,
    }
    for leg, (repl, repeats) in legs_cfg.items():
        lo = one(base, leg, repl, repeats)
        hi = one(quad, leg, repl, repeats)
        eff = (lo["value"] / hi["value"]) / 4
        result[leg] = {
            f"sec_{base}": lo["value"],
            f"sec_{quad}": hi["value"],
            f"docs_per_sec_{base}": lo["docs_per_sec"],
            f"docs_per_sec_{quad}": hi["docs_per_sec"],
            "scaling_efficiency": round(eff, 3),
        }
    # headline efficiency = the extract leg when present (backward-
    # compatible top-level key), else the single selected leg
    head = result.get("extract") or next(
        result[k] for k in legs_cfg if k in result)
    result["scaling_efficiency"] = head["scaling_efficiency"]
    return result


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
