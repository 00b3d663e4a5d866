"""Flagship CLI with checkpointed, resumable execution (SURVEY §3.2).

    python -m kgforge.run --n-pages 4000 --partitions 8 --out /tmp/kgrun
    python -m kgforge.run --n-pages 4000 --partitions 8 --out /tmp/kgrun --resume

Stage 1 (per input partition, resumable): synthesize/read the partition's
pages → extract docs → atomic parquet + ledger row.
Stage 2 (global): exact dedup → minhash-LSH near-dup → link → canonical
map → materialize → sorted triples parquet + learned model histograms +
summary ledger row.

Owns its Ray session (guarded — never clobbers a driver-provided one).
`ray job submit -- python -m kgforge.run ...` works unchanged on a real
cluster.
"""

from __future__ import annotations

import argparse
import os
import time


def _partition_ranges(n_pages: int, partitions: int) -> list[tuple[int, int]]:
    if n_pages <= 0:
        return []  # range(0, 0, 0) would raise; empty corpus → no partitions
    step = (n_pages + partitions - 1) // partitions
    return [(i, min(i + step, n_pages)) for i in range(0, n_pages, step)]


def _input_partitions(input_dir: str | None, n_pages: int, partitions: int) -> list:
    """Checkpoint units: parquet-file groups for a real pages corpus
    (--input), synthetic id ranges otherwise."""
    if input_dir:
        import glob

        files = sorted(
            glob.glob(os.path.join(input_dir, "**", "*.parquet"), recursive=True)
        )
        if not files:
            raise SystemExit(f"no parquet files under {input_dir}")
        k = min(partitions, len(files))
        step = (len(files) + k - 1) // k
        return [("files", files[i : i + step]) for i in range(0, len(files), step)]
    return [("range", r) for r in _partition_ranges(n_pages, partitions)]


def _partition_pages(spec, seed: int):
    """spec → Dataset[pages] for one partition."""
    import pyarrow.compute as pc
    import ray.data as rd

    from .corpus import gen_pages_batch
    from .sources import read_pages

    kind, val = spec
    if kind == "files":
        return read_pages(val)
    lo, hi = val
    return rd.range(hi - lo).map_batches(
        lambda b, off=lo, s=seed: gen_pages_batch(
            b.set_column(b.schema.get_field_index("id"), "id", pc.add(b["id"], off)), s
        ),
        batch_format="pyarrow",
        batch_size=512,
    )


def _check_run_params(out: str, resume: bool, **params) -> None:
    """Record run parameters at out/ledger/params.json; on --resume,
    refuse to mix checkpoints from a run with different parameters
    (changed --n-pages/--partitions/--input silently skips or mixes
    stale partitions otherwise)."""
    import json

    ldir = os.path.join(out, "ledger")
    os.makedirs(ldir, exist_ok=True)
    path = os.path.join(ldir, "params.json")
    if resume and os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        if prev != params:
            raise SystemExit(
                f"--resume with changed run parameters: checkpoint was built "
                f"with {prev}, this run asks for {params}; use a fresh --out "
                "or matching parameters"
            )
        return
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(params, f)
    os.replace(tmp, path)


def _spec_fp(spec, seed: int) -> str:
    """Resume fingerprint for one partition spec: the exact file list
    for --input runs (new/removed files re-group partitions — a stale
    checkpoint must not be trusted), the id range + seed for synthetic
    runs."""
    from .steps.ledger import group_fingerprint

    kind, val = spec
    if kind == "files":
        return group_fingerprint(list(val), f"seed={seed}")
    lo, hi = val
    return group_fingerprint([f"range:{lo}-{hi}"], f"seed={seed}")


#: empty-partition fallback: extract_docs' output columns (pages minus
#: html/text, plus url_norm and the extraction fields)
def _docs_fallback_schema():
    import pyarrow as pa

    return pa.schema([
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("url_norm", pa.string()),
        ("extracted_text", pa.string()),
        ("text_sha256", pa.string()),
        ("n_chars", pa.int64()),
    ])


def run_stage1(out: str, n_pages: int, partitions: int, resume: bool, seed: int,
               input_dir: str | None = None, stop_after: int | None = None) -> None:
    """``stop_after=K`` processes at most K not-yet-done partitions then
    returns (crash simulation for the resume test) — the recorded run
    parameters stay those of the FULL run, so --resume validates."""
    from .steps.extract import add_url_norm, extract_docs, lang_filter
    from .steps.ledger import (
        atomic_write_parquet,
        completed_fingerprints,
        current_epoch,
        ledger_row,
        write_ledger_row,
        write_parquet_always,
    )

    _check_run_params(out, resume, n_pages=n_pages, partitions=partitions,
                      seed=seed, input=input_dir)
    parts = _input_partitions(input_dir, n_pages, partitions)
    import glob
    import shutil

    if resume:
        # trust a checkpoint only when its recorded input fingerprint
        # matches the CURRENT grouping (file lists drift; pre-upgrade
        # rows with an empty fp re-run — the safe direction)
        recorded = completed_fingerprints(out, "docs")
        done = {
            pid for pid, spec in enumerate(parts)
            if recorded.get(pid) == _spec_fp(spec, seed)
        }
    else:
        # fresh run into an existing --out: purge ALL old part dirs and
        # their ledger rows FIRST — a previous run with more partitions
        # would otherwise leave stale part-K dirs whose ledger rows
        # stage 2 still trusts, silently mixing old pages into the output
        done = set()
        for stale in glob.glob(os.path.join(out, "docs", "part-*")):
            shutil.rmtree(stale, ignore_errors=True)
        for row in glob.glob(os.path.join(out, "ledger", "part-*.parquet")):
            os.remove(row)
    epoch = current_epoch(out) + 1

    n_ran = 0
    for pid, spec in enumerate(parts):
        if stop_after is not None and n_ran >= stop_after:
            print(f"[crash-sim] stopping after {n_ran} partitions")
            return
        if pid in done:
            print(f"[stage1] partition {pid}: already complete — skipped (resume)")
            continue
        t0 = time.perf_counter()
        # materialize the source once: count() on a lazy read/generate
        # pipeline would execute it, then the extract chain would
        # re-execute it from scratch — double input-side cost
        pages = _partition_pages(spec, seed).materialize()
        n_pages_part = pages.count()
        ds = pages.map_batches(add_url_norm, batch_format="pyarrow")
        ds = lang_filter(ds)
        docs = extract_docs(ds).materialize()
        n_docs = docs.count()
        urls = docs.select_columns(["url_norm"])
        url_min = urls.min("url_norm") if n_docs else ""
        url_max = urls.max("url_norm") if n_docs else ""
        atomic_write_parquet(
            docs, os.path.join(out, "docs", f"part-{pid}"),
            writer=lambda d, tmp: write_parquet_always(
                d, tmp, _docs_fallback_schema()
            ),
        )
        write_ledger_row(
            out,
            ledger_row(pid, url_min, url_max, epoch, n_pages_part, n_docs, -1, "docs",
                       round(time.perf_counter() - t0, 3),
                       group_fp=_spec_fp(spec, seed)),
            f"part-{pid}",
        )
        n_ran += 1
        print(f"[stage1] partition {pid}: {n_pages_part} pages -> {n_docs} docs")


def run_stage2(out: str, seed: int) -> int:
    import ray
    import ray.data as rd

    from .model.learn import learn_model, write_model
    from .nlp_core import AliasResource
    from .ontology import get_ontology
    from .steps.dedup import apply_drop_ds, neardup_drop_ds
    from .steps.extract import exact_dedup
    from .steps.ledger import atomic_write_parquet, current_epoch, ledger_row, write_ledger_row
    from .steps.link import link_docs
    from .steps.materialize import materialize_triples

    from .steps.ledger import completed_partitions

    t0 = time.perf_counter()
    # read ONLY ledger-completed partition dirs — never staged .tmp debris
    # (read_parquet takes a list of FILES, not directories)
    import glob as _glob

    part_files: list[str] = []
    done = sorted(completed_partitions(out, "docs"))
    if not done:
        raise SystemExit(f"stage2: no ledger-completed partitions under {out}")
    for pid in done:
        d = os.path.join(out, "docs", f"part-{pid}")
        if not os.path.isdir(d):
            raise SystemExit(
                f"stage2: ledger marks partition {pid} complete but {d} is "
                "missing — the checkpoint dir was deleted or the ledger is "
                "stale; re-run stage 1 without --resume"
            )
        files = sorted(_glob.glob(os.path.join(d, "*.parquet")))
        if not files:
            raise SystemExit(f"stage2: completed partition dir {d} holds no parquet files")
        part_files.extend(files)
    docs = rd.read_parquet(part_files).materialize()
    docs = exact_dedup(docs)
    drop_ds = neardup_drop_ds(docs)
    kept = apply_drop_ds(docs, drop_ds)
    res = AliasResource.from_ontology(get_ontology(seed))
    # corpus-prior pass (unambiguous-mention counts over the kept docs) —
    # same disambiguation tie-break as run_flagship / reference emitter
    # step 3b; without it CLI triples diverge on cosine-tied mentions
    from .steps.link import entity_prior

    res = res.with_prior(entity_prior(kept, res))
    # SvoLinker emits canonical ids (sameAs applied in the actor) — no
    # separate apply_canonical_map pass, same as run_flagship
    linked = link_docs(kept, resource_ref=ray.put(res))
    triples = materialize_triples(linked).materialize()
    n_triples = triples.count()
    from .schemas import TRIPLES
    from .steps.ledger import write_parquet_always

    atomic_write_parquet(
        triples, os.path.join(out, "triples"),
        writer=lambda d, tmp: write_parquet_always(d, tmp, TRIPLES),
    )
    model = learn_model(triples, res.id_type)
    write_model(model, os.path.join(out, "model"))
    write_ledger_row(
        out,
        ledger_row(-1, "", "", current_epoch(out), 0, 0, n_triples, "materialized",
                   round(time.perf_counter() - t0, 3)),
        "summary",
    )
    print(f"[stage2] materialized {n_triples} triples -> {out}/triples")
    return n_triples


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description="kgforge flagship run (checkpointed)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--input", default=None,
                    help="parquet pages dir (default: deterministic synthetic corpus)")
    ap.add_argument("--n-pages", type=int, default=2000)
    ap.add_argument("--partitions", type=int, default=8)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "8")))
    ap.add_argument("--stop-after", type=int, default=-1,
                    help="crash simulation: stop after K stage-1 partitions")
    args = ap.parse_args(argv)
    if args.input is None and args.n_pages <= 0:
        ap.error("--n-pages must be >= 1 for a synthetic-corpus run")
    if args.partitions <= 0:
        ap.error("--partitions must be >= 1")

    import ray

    if not ray.is_initialized():
        # cluster-safe: connect via RAY_ADDRESS under `ray job submit`
        # (num_cpus is only legal when STARTING a local instance);
        # address="local" would force an isolated single-node Ray
        addr = os.environ.get("RAY_ADDRESS", "")
        if addr in ("", "local"):
            # address="local" FORCES a fresh local instance — without it,
            # ray.init(num_cpus=...) auto-detects any `ray start` cluster
            # on the machine and raises (num_cpus is illegal on connect)
            ray.init(address="local", num_cpus=args.cpus,
                     include_dashboard=False, logging_level="ERROR")
        else:
            ray.init(include_dashboard=False, logging_level="ERROR")
        ray.data.DataContext.get_current().enable_progress_bars = False

    if args.stop_after >= 0:
        # run only the first K not-yet-done partitions, then exit (crash
        # simulation for the resume test) — full-run parameters recorded
        run_stage1(args.out, args.n_pages, args.partitions, args.resume, args.seed,
                   input_dir=args.input, stop_after=args.stop_after)
        ray.shutdown()
        return

    run_stage1(args.out, args.n_pages, args.partitions, args.resume, args.seed,
               input_dir=args.input)
    run_stage2(args.out, args.seed)
    ray.shutdown()


if __name__ == "__main__":
    main()
