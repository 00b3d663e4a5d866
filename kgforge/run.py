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


def run_stage1(out: str, n_pages: int, partitions: int, resume: bool, seed: int,
               input_dir: str | None = None) -> None:
    from .steps.extract import add_url_norm, extract_docs, lang_filter
    from .steps.ledger import completed_partitions, current_epoch, ledger_row, write_ledger_row
    from .steps.ledger import atomic_write_parquet

    done = completed_partitions(out, "docs") if resume else set()
    epoch = current_epoch(out) + 1
    parts = _input_partitions(input_dir, n_pages, partitions)
    import glob
    import shutil

    for pid, spec in enumerate(parts):
        if pid in done:
            print(f"[stage1] partition {pid}: already complete — skipped (resume)")
            continue
        # sweep debris from a crashed previous attempt (staged .tmp dirs)
        for debris in glob.glob(os.path.join(out, "docs", f"part-{pid}.tmp-*")):
            shutil.rmtree(debris, ignore_errors=True)
        t0 = time.perf_counter()
        pages = _partition_pages(spec, seed)
        n_pages_part = pages.count()
        ds = pages.map_batches(add_url_norm, batch_format="pyarrow")
        ds = lang_filter(ds)
        docs = extract_docs(ds).materialize()
        n_docs = docs.count()
        urls = docs.select_columns(["url_norm"])
        url_min = urls.min("url_norm") if n_docs else ""
        url_max = urls.max("url_norm") if n_docs else ""
        atomic_write_parquet(docs, os.path.join(out, "docs", f"part-{pid}"))
        write_ledger_row(
            out,
            ledger_row(pid, url_min, url_max, epoch, n_pages_part, n_docs, -1, "docs",
                       round(time.perf_counter() - t0, 3)),
            f"part-{pid}",
        )
        print(f"[stage1] partition {pid}: {n_pages_part} pages -> {n_docs} docs")


def run_stage2(out: str, seed: int) -> int:
    import ray
    import ray.data as rd

    from .model.learn import learn_model, write_model
    from .nlp_core import AliasResource
    from .ontology import get_ontology
    from .steps.dedup import apply_drop_set, neardup_drop_set
    from .steps.extract import exact_dedup
    from .steps.ledger import atomic_write_parquet, current_epoch, ledger_row, write_ledger_row
    from .steps.link import link_docs
    from .steps.materialize import (
        apply_canonical_map,
        canonical_map_from_same_as,
        materialize_triples,
    )

    from .steps.ledger import completed_partitions

    t0 = time.perf_counter()
    # read ONLY ledger-completed partition dirs — never staged .tmp debris
    # (read_parquet takes a list of FILES, not directories)
    import glob as _glob

    part_files: list[str] = []
    for pid in sorted(completed_partitions(out, "docs")):
        d = os.path.join(out, "docs", f"part-{pid}")
        if os.path.isdir(d):
            part_files.extend(sorted(_glob.glob(os.path.join(d, "*.parquet"))))
    docs = rd.read_parquet(part_files).materialize()
    docs = exact_dedup(docs)
    drop = neardup_drop_set(docs)
    kept = apply_drop_set(docs, drop)
    res = AliasResource.from_ontology(get_ontology(seed))
    linked = link_docs(kept, resource_ref=ray.put(res))
    cmap = canonical_map_from_same_as(res.same_as, list(res.id_type))
    triples = materialize_triples(apply_canonical_map(linked, cmap)).materialize()
    n_triples = triples.count()
    atomic_write_parquet(triples, os.path.join(out, "triples"))
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

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
        ray.data.DataContext.get_current().enable_progress_bars = False

    if args.stop_after >= 0:
        # run only the first K partitions, then exit (for the resume test)
        from .steps.ledger import completed_partitions

        before = len(completed_partitions(args.out, "docs")) if args.resume else 0
        n_total = args.partitions
        k = min(args.stop_after, n_total)
        # emulate by trimming partitions: run stage1 with a trimmed page range
        ranges = _partition_ranges(args.n_pages, args.partitions)
        trimmed_pages = ranges[k - 1][1] if k > 0 else 0
        run_stage1(args.out, trimmed_pages, k, args.resume, args.seed)
        print(f"[crash-sim] stopped after {k} partitions (had {before} done)")
        ray.shutdown()
        return

    run_stage1(args.out, args.n_pages, args.partitions, args.resume, args.seed,
               input_dir=args.input)
    run_stage2(args.out, args.seed)
    ray.shutdown()


if __name__ == "__main__":
    main()
