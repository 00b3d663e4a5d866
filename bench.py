#!/usr/bin/env python
"""kgforge bench harness (SURVEY §4.4, §6).

Default mode: one fresh Ray session at $RAY_GRAFT_CPUS (default 32),
runs the headline flagship KG-construction pipeline on the deterministic
synthetic corpus (sized by $GRAFT_SF_DIR's scale factor) plus a
representative relational query set over the sf tables, then prints ONE
JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
   "docs_per_sec": ...}

--scaling: runs this same script in fresh processes at two parallelism
levels (default 4 and 16 cpus = N and 4N; GRAFT_SCALE_LO/HI override)
over the SAME cached corpus parquet (the sandbox substitute for N vs 4N
Ray nodes via `ray job submit` — no real cluster here), best-of
GRAFT_SCALE_REPS per leg, and prints both throughputs + scaling
efficiency = (docs_per_sec_hi / docs_per_sec_lo) / 4.

`ray job submit`-compatible: `ray job submit -- python bench.py` runs
unchanged on a real cluster (it only attaches to an existing session if
one exists; otherwise local).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")

# synthetic corpus pages per scale factor (the flagship's input scale)
_PAGES_BY_SF = {"sf0.001": 2_000, "sf0.01": 8_000, "sf0.1": 30_000}

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q_lineitem_orders_join",
    "q_revenue_by_segment",
    "q_events_hourly",
    "q_doc_exact_dedup_sha",
    "q_embed_topk_cosine",
]


def _sf_name(sf_dir: str) -> str:
    return os.path.basename(sf_dir.rstrip("/"))


def ensure_corpus_parquet(n_pages: int) -> str:
    """Materialize the deterministic synthetic corpus to parquet ONCE
    (cached across runs/processes) so the timed headline is the
    contract-shaped pipeline: Parquet pages → read_parquet → KG. Both
    scaling legs read the identical files."""
    from kgforge.corpus import CORPUS_VERSION

    path = f"/tmp/kgforge_bench_corpus_v{CORPUS_VERSION}_{n_pages}"
    marker = os.path.join(path, "_COMPLETE")
    if os.path.exists(marker):
        return path
    import shutil

    from kgforge.corpus import pages_dataset

    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    pages_dataset(n_pages, parallelism=64).write_parquet(tmp)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(tmp, path)
    with open(marker, "w") as f:
        f.write(str(n_pages))
    return path


#: the flagship's auto-switching stage thresholds; GRAFT_FORCE_DIST=1
#: zeroes them all — the 100-TB configuration, where every dedup/winner/
#: sort plan runs fully distributed regardless of corpus size
_FORCE_DIST_VARS = (
    "KGFORGE_DEDUP_JOIN_ROWS",
    "KGFORGE_NEARDUP_DIST_ROWS",
    "KGFORGE_DROP_APPLY_BROADCAST_ROWS",
    "KGFORGE_MATERIALIZE_SORT_ROWS",
    "KGFORGE_CONTENT_DEDUP_DIST_ROWS",
    "KGFORGE_INC_DEDUP_DIST_ROWS",
    "KGFORGE_SPAN_DEDUP_DIST_ROWS",
)


def run_bench(ncpu: int, sf_dir: str) -> dict:
    import ray

    forced = (
        os.environ.get("GRAFT_FORCE_DIST", "").strip().lower()
        in ("1", "true", "yes", "on")
    )
    if forced:
        for v in _FORCE_DIST_VARS:
            os.environ.setdefault(v, "0")

    ray.init(
        address="local",
        num_cpus=ncpu,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False

    from kgforge.corpus import pages_dataset
    from kgforge.pipelines.flagship import run_flagship
    from kgforge.relational import QUERY_FNS
    from kgforge.sources import read_pages

    n_pages = int(
        os.environ.get("GRAFT_BENCH_PAGES", _PAGES_BY_SF.get(_sf_name(sf_dir), 30_000))
    )
    timings: dict[str, float] = {}

    # untimed: corpus parquet (cached) + warm-up run (page cache, code
    # paths, actor images)
    corpus_path = ensure_corpus_parquet(n_pages)
    # warm-up mirrors the measured run's actor-pool size so worker-process
    # spawn + per-actor imports happen OUTSIDE the timed window (worker
    # processes persist across Dataset executions; actor pools do not)
    warm = run_flagship(
        pages_dataset(2000, parallelism=max(8, ncpu)),
        link_concurrency=(max(2, ncpu // 2), ncpu),
    )
    warm.triples.count()

    # ---- headline: Parquet pages → flagship KG construction --------------
    # best-of-N (default 3): this host shows ±30-40% hypervisor noise on
    # identical code (BASELINE.md log; one r3 epoch ran everything 2-4×
    # slower); min wall is the standard noise-controlled estimator
    reps = int(os.environ.get("GRAFT_BENCH_REPS", "3"))
    flagship_s = float("inf")
    n_triples = 0
    for _ in range(reps):
        t0 = time.perf_counter()
        res = run_flagship(
            read_pages(corpus_path),
            link_concurrency=(max(2, ncpu // 2), ncpu),
        )
        n_triples = res.triples.count()
        flagship_s = min(flagship_s, time.perf_counter() - t0)
    timings["kg_flagship"] = round(flagship_s, 3)
    docs_per_sec = round(n_pages / flagship_s, 1)

    # ---- relational query set -------------------------------------------
    # best-of-N per query too (r5, VERDICT #4): BENCH_r04 regressed ~20%
    # nominally while same-session reruns read 17% faster — single-shot
    # walls on this host measure the hypervisor epoch as much as the code
    bench_queries = [] if os.environ.get("GRAFT_SKIP_QUERIES") else BENCH_QUERIES
    for name in bench_queries:
        fn = QUERY_FNS[name]
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(sf_dir)
            if hasattr(out, "count") and not hasattr(out, "columns"):
                out.count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    # ---- extras: scale-path operator measurements --------------------------
    # NOT in the headline total (BASELINE.md documents them separately so
    # round-over-round totals stay comparable): the hashed
    # million-partition window kernel and the persisted cell-partitioned
    # IVF index (build + pruned search + recall@k vs nprobe)
    extras: dict = {}
    if not bench_queries:
        pass  # scaling mode: flagship only
    else:
        import shutil

        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data as rd

        from kgforge.analytic import window

        nw = 2_000_000
        rng = np.random.RandomState(0)
        wt = pa.table(
            {
                "k": pa.array(rng.permutation(nw) % 1_000_000, pa.int64()),
                "o": pa.array(np.arange(nw), pa.int64()),
                "v": pa.array(rng.randn(nw), pa.float64()),
            }
        )
        wds = rd.from_arrow(wt).repartition(ncpu).materialize()
        t0 = time.perf_counter()
        window(
            wds,
            "k",
            "o",
            [{"out": "rn", "fn": "row_number"}, {"out": "cs", "fn": "cumsum", "col": "v"}],
            # default strategy='auto': 2M rows sits AT the hashed
            # threshold, so this exercises the out-of-the-box plan a
            # caller gets (auto → hashed kernel, auto bucket count)
        ).materialize()
        w_sec = time.perf_counter() - t0
        extras["window_1m_parts_hashed_sec"] = round(w_sec, 3)
        extras["window_1m_parts_rows_per_sec"] = round(nw / w_sec, 1)

        # sessionization over the same 1M-key table (r5: converted off
        # per-user map_groups onto the hashed multi-group kernel; the
        # verdict bar is within ~2x of the window kernel's wall)
        from kgforge.analytic import sessionize

        t0 = time.perf_counter()
        sessionize(wds, "k", "o", 500_000).materialize()
        s_sec = time.perf_counter() - t0
        extras["sessionize_1m_users_sec"] = round(s_sec, 3)
        extras["sessionize_1m_users_rows_per_sec"] = round(nw / s_sec, 1)

        from kgforge.ann import ivf_build, ivf_recall_report, ivf_search_index
        from kgforge.relational import read

        emb = read(sf_dir, "embeddings", ["vec_id", "embedding"]).materialize()
        qv = np.asarray(
            pq.read_table(
                f"{sf_dir}/embeddings.parquet", columns=["embedding"]
            ).slice(0, 10)["embedding"].to_pylist(),
            dtype=np.float32,
        )
        ivf_path = "/tmp/kgforge_bench_ivf"
        shutil.rmtree(ivf_path, ignore_errors=True)
        t0 = time.perf_counter()
        cent = ivf_build(emb, ivf_path, n_centroids=None)
        extras["ivf_build_sec"] = round(time.perf_counter() - t0, 3)
        extras["ivf_n_centroids"] = len(cent)
        t0 = time.perf_counter()
        ivf_search_index(ivf_path, qv, k=10, nprobe=4)
        extras["ivf_search_nprobe4_sec"] = round(time.perf_counter() - t0, 3)
        # deployment config (r5): assign_top=3 replicates each row into
        # its 3 nearest cells — 3x index storage for boundary-row recall
        # at fixed nprobe; the assign_top=1 curve is reported next to it
        rep = ivf_recall_report(emb, qv, k=10, nprobes=(1, 2, 4, 8), assign_top=3)
        extras["ivf_recall_at_10"] = {
            str(int(r.nprobe)): round(float(r.recall_at_k), 3)
            for r in rep.itertuples()
        }
        extras["ivf_assign_top"] = 3
        rep1 = ivf_recall_report(emb, qv, k=10, nprobes=(4, 8))
        extras["ivf_recall_at_10_assign1"] = {
            str(int(r.nprobe)): round(float(r.recall_at_k), 3)
            for r in rep1.itertuples()
        }

        # end-to-end LLM-data curation over the driver documents table
        # (lang-ID → quality → exact dedup → near-dup → paragraph dedup
        # → packing)
        from kgforge.pipelines.curation import curate_corpus

        docs_ds = read(sf_dir, "documents", ["doc_id", "text"]).materialize()
        n_docs = docs_ds.count()
        t0 = time.perf_counter()
        cur = curate_corpus(docs_ds, min_quality=0.2, neardup_threshold=0.7)
        cur_sec = time.perf_counter() - t0
        extras["curation_sec"] = round(cur_sec, 3)
        extras["curation_docs_per_sec"] = round(n_docs / cur_sec, 1)
        extras["curation_kept_docs"] = cur.stats["after_neardup"]

        # streaming configuration (stats='none'): no per-stage
        # materializes — the result is lazy, so DRIVE it to parquet the
        # way a shard job would (write = the stream's consumer)
        import shutil as _sh

        out_dir = "/tmp/kgforge_bench_curation_stream"
        _sh.rmtree(out_dir, ignore_errors=True)
        t0 = time.perf_counter()
        cs = curate_corpus(
            docs_ds, min_quality=0.2, neardup_threshold=0.7, stats="none"
        )
        cs.docs.write_parquet(f"{out_dir}/docs")
        cs.packed.write_parquet(f"{out_dir}/packed")
        stream_sec = time.perf_counter() - t0
        extras["curation_stream_sec"] = round(stream_sec, 3)
        extras["curation_stream_docs_per_sec"] = round(n_docs / stream_sec, 1)

        # hygiene operators (round 4): Gopher repetition rules,
        # benchmark decontamination, deterministic shuffle-shard write
        from kgforge.decontam import benchmark_ngram_hashes, decontaminate
        from kgforge.repetition import gopher_repetition_filter
        from kgforge.shard import shuffle_shard

        t0 = time.perf_counter()
        n_rep = gopher_repetition_filter(docs_ds).count()
        rep_sec = time.perf_counter() - t0
        extras["repetition_filter_sec"] = round(rep_sec, 3)
        extras["repetition_docs_per_sec"] = round(n_docs / rep_sec, 1)
        extras["repetition_kept_docs"] = n_rep

        bench_texts = [r["text"] for r in docs_ds.take(50)]
        hashes = benchmark_ngram_hashes(bench_texts, n=13)
        t0 = time.perf_counter()
        n_clean = decontaminate(docs_ds, hashes, n=13).count()
        dec_sec = time.perf_counter() - t0
        extras["decontam_sec"] = round(dec_sec, 3)
        extras["decontam_docs_per_sec"] = round(n_docs / dec_sec, 1)
        extras["decontam_kept_docs"] = n_clean

        shard_dir = "/tmp/kgforge_bench_shards"
        _sh.rmtree(shard_dir, ignore_errors=True)
        t0 = time.perf_counter()
        shuffle_shard(docs_ds, shard_dir, 8, id_col="doc_id", seed=1)
        extras["shuffle_shard_sec"] = round(time.perf_counter() - t0, 3)

        # duplicated-span removal (Lee-et-al substring dedup); n=20 so
        # the synthetic corpus's shared sentence runs actually collide
        from kgforge.spandedup import substring_dedup
        from ray.data.aggregate import Sum as _Sum

        t0 = time.perf_counter()
        span_out = substring_dedup(docs_ds, "doc_id", "text", n=20)
        span_cut = span_out.aggregate(_Sum("n_dropped_chars", alias_name="s"))
        span_sec = time.perf_counter() - t0
        extras["substring_dedup_sec"] = round(span_sec, 3)
        extras["substring_dedup_docs_per_sec"] = round(n_docs / span_sec, 1)
        extras["substring_chars_dropped"] = int(span_cut["s"] or 0)

        # learned quality filter: train a tiny seed-vs-web model (cost
        # is all in the distributed scoring pass, which is what scales)
        from kgforge.qualityclf import score_quality, train_quality_classifier

        seed_texts = [r["text"] for r in docs_ds.take(100)]
        junk = [" ".join(reversed((t or "").split()))[:200] + " click free bonus"
                for t in seed_texts]
        qm = train_quality_classifier(seed_texts, junk, iters=100)
        t0 = time.perf_counter()
        n_scored = score_quality(docs_ds, qm).count()
        q_sec = time.perf_counter() - t0
        extras["qualityclf_score_sec"] = round(q_sec, 3)
        extras["qualityclf_docs_per_sec"] = round(n_scored / q_sec, 1)

        # n-gram LM: distributed hashed-count training over the docs
        # table, then the broadcast stupid-backoff scoring pass
        from kgforge.ngramlm import score_perplexity, train_ngram_lm

        t0 = time.perf_counter()
        lm = train_ngram_lm(docs_ds, n=3)
        lm_train_sec = time.perf_counter() - t0
        extras["ngramlm_train_sec"] = round(lm_train_sec, 3)
        extras["ngramlm_entries"] = int(len(lm.keys))
        t0 = time.perf_counter()
        n_scored = score_perplexity(docs_ds, lm).count()
        lm_sec = time.perf_counter() - t0
        extras["ngramlm_score_sec"] = round(lm_sec, 3)
        extras["ngramlm_docs_per_sec"] = round(n_scored / lm_sec, 1)

        # SemDeDup: encoder-protocol embedding → k-means clustering →
        # within-cluster cosine drop, over the documents table
        from kgforge.encoder import embed_texts
        from kgforge.semdedup import semantic_dedup_drops

        t0 = time.perf_counter()
        thin = embed_texts(docs_ds, "text").select_columns(
            ["doc_id", "embedding"]
        )
        n_sem = semantic_dedup_drops(thin, 0.9, id_col="doc_id").count()
        sem_sec = time.perf_counter() - t0
        extras["semdedup_sec"] = round(sem_sec, 3)
        extras["semdedup_docs_per_sec"] = round(n_docs / sem_sec, 1)
        extras["semdedup_dropped_docs"] = n_sem

    ray.shutdown()
    if bench_queries:
        # same-session host probes (headline mode; --scaling emits its
        # own): the driver artifact can then normalize walls by the VM's
        # pure-CPU and memory-bandwidth state at measurement time instead
        # of reading hypervisor drift as a code regression
        extras["cpu_probe_mops"] = cpu_probe(ncpu, reps=1)
        extras["mem_bw_gibs"] = bw_probe(ncpu, dur=2.0, reps=1)
    total = round(sum(timings.values()), 3)
    return {
        "metric": "kgforge bench: flagship KG pipeline + relational query set",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_name(sf_dir),
        "num_cpus": ncpu,
        "n_pages": n_pages,
        "n_triples": n_triples,
        "docs_per_sec": docs_per_sec,
        "forced_distributed": forced,
        "extras": extras,
    }


def _burn(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i % 7
    return x


def cpu_probe(workers: int, per: int = 6_000_000, reps: int = 2) -> float:
    """Pure-CPU host throughput at `workers` parallel processes (M ops/s):
    a tight integer loop under multiprocessing — the NO-pipeline upper
    bound for any parallel speedup on this machine at this moment. This
    sandbox's hypervisor over-commits cores and drifts by the hour
    (observed 0.73-0.97 ceiling for the 4→16 pair across one day), so a
    scaling report is only interpretable next to a SAME-SESSION ceiling."""
    import multiprocessing as mp

    best = 0.0
    for _ in range(reps):
        with mp.Pool(workers) as p:
            t0 = time.perf_counter()
            p.map(_burn, [per] * workers * 4)
            dt = time.perf_counter() - t0
        best = max(best, workers * 4 * per / dt / 1e6)
    return round(best, 1)


def _memcpy(args) -> float:
    import numpy as np

    dur, size = args
    # arange, not zeros: an all-zeros source is backed by the shared
    # copy-on-write zero page and reads artificially fast
    buf = np.arange(size, dtype=np.uint64).view(np.uint8)[:size].copy()
    dst = np.empty_like(buf)
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < dur:
        np.copyto(dst, buf)
        n += 1
    return n * size / (time.perf_counter() - t0)


def bw_probe(workers: int, dur: float = 4.0, reps: int = 2) -> float:
    """Aggregate memory-COPY bandwidth at `workers` parallel processes
    (GiB/s) — the second host ceiling a plasma-heavy pipeline contends
    on.  The pure-CPU probe scales near-linearly on this VM (0.78-0.92
    for 8→32), but the memory subsystem does NOT: measured ~38 GiB/s at
    8 workers vs ~48 GiB/s at 32 (a 0.3 bandwidth ceiling) — once
    per-doc CPU is optimized down, a single-box 8→32 run measures THIS
    wall, which a real 4× NODE cluster does not have (each node brings
    its own memory subsystem)."""
    import multiprocessing as mp

    best = 0.0
    for _ in range(reps):
        with mp.Pool(workers) as p:
            total = sum(p.map(_memcpy, [(dur, 64 << 20)] * workers))
        best = max(best, total / (1 << 30))
    return round(best, 1)


def run_scaling(sf_dir: str, lo: int = 8, hi: int = 32) -> dict:
    """Scaling needs enough WORK to amortize the pipeline's fixed
    latency (shuffle barriers + actor-pool spin-up, ~3-10 s): 1.2M pages
    ≈ 900 cpu-seconds, so the lo leg is compute-bound and the hi leg is
    still ≫ fixed cost. Overridable via GRAFT_SCALE_PAGES."""
    scale_pages = os.environ.get("GRAFT_SCALE_PAGES", "1200000")
    reps = int(os.environ.get("GRAFT_SCALE_REPS", "3"))

    def one(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_SF_DIR=sf_dir,
            GRAFT_BENCH_PAGES=scale_pages,
            GRAFT_SKIP_QUERIES="1",  # scaling grades the flagship only
            GRAFT_BENCH_REPS="1",  # outer best-of-N already controls noise
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # best-of-N per leg with the legs INTERLEAVED (lo,hi,lo,hi,...): this
    # host shows hypervisor-level run-to-run noise (±30% observed on
    # identical code) in multi-minute epochs — sequential per-leg blocks
    # let one slow epoch bias a whole leg, which swings the efficiency
    # ratio both ways; interleaving makes both legs sample the same
    # epochs, and min wall is the standard noise-controlled estimator
    runs_lo: list[dict] = []
    runs_hi: list[dict] = []
    for _ in range(reps):
        runs_lo.append(one(lo))
        runs_hi.append(one(hi))
    r_lo = min(runs_lo, key=lambda r: r["queries"]["kg_flagship"])
    r_hi = min(runs_hi, key=lambda r: r["queries"]["kg_flagship"])
    probe_lo, probe_hi = cpu_probe(lo), cpu_probe(hi)
    ceiling = (probe_hi / probe_lo) / (hi / lo)
    bw_lo, bw_hi = bw_probe(lo), bw_probe(hi)
    bw_ceiling = (bw_hi / bw_lo) / (hi / lo)
    tp_lo, tp_hi = r_lo["docs_per_sec"], r_hi["docs_per_sec"]
    eff = (tp_hi / tp_lo) / (hi / lo)
    return {
        "metric": "scaling efficiency (sandbox substitute for N vs 4N nodes)",
        "cpus_lo": lo,
        "cpus_hi": hi,
        "docs_per_sec_lo": tp_lo,
        "docs_per_sec_hi": tp_hi,
        "flagship_sec_lo": r_lo["queries"]["kg_flagship"],
        "flagship_sec_hi": r_hi["queries"]["kg_flagship"],
        # all interleaved rep walls, in run order — makes the host's
        # run-to-run noise visible next to the best-of estimate
        "rep_secs_lo": [r["queries"]["kg_flagship"] for r in runs_lo],
        "rep_secs_hi": [r["queries"]["kg_flagship"] for r in runs_hi],
        # same-session pure-CPU host ceiling (see cpu_probe): the max
        # efficiency ANY parallel job can measure on this VM right now,
        # and the pipeline's efficiency normalized by it
        "cpu_probe_mops_lo": probe_lo,
        "cpu_probe_mops_hi": probe_hi,
        "host_ceiling_efficiency": round(ceiling, 3),
        "ceiling_normalized_efficiency": round(eff / ceiling, 3) if ceiling else None,
        # SECOND host ceiling: aggregate memcpy bandwidth — the shared
        # resource a plasma-heavy pipeline saturates on one box; a real
        # N→4N NODE cluster scales it with node count
        "mem_bw_gibs_lo": bw_lo,
        "mem_bw_gibs_hi": bw_hi,
        "bw_ceiling_efficiency": round(bw_ceiling, 3),
        "scaling_efficiency": round(eff, 3),
        "sf": r_lo["sf"],
        "n_pages": r_lo["n_pages"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        lo = int(os.environ.get("GRAFT_SCALE_LO", "4"))
        hi = int(os.environ.get("GRAFT_SCALE_HI", str(4 * lo)))
        print(json.dumps(run_scaling(SF_DIR, lo, hi)))
    else:
        ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
        print(json.dumps(run_bench(ncpu, SF_DIR)))
