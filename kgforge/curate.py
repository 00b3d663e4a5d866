"""Curation-pipeline CLI (the daily-shard ingest command):

    python -m kgforge.curate --input '/data/shardN/*.parquet' --out /data/curated/shardN
    python -m kgforge.curate --input ... --out ... --known-index /data/index/so-far

Runs ``kgforge.pipelines.curation.curate_corpus`` over a Parquet shard
and writes, under ``--out``:

    docs/      curated documents parquet (id, text, n_dropped_paragraphs)
    packed/    fixed-length token sequences (unless --no-pack)
    index/     this shard's (h1, h2) survivor index — union it with the
               corpus index and pass as --known-index on the next shard
    shards/    (with --n-shards K) deterministic globally-shuffled
               shard=J/ hive partitions of the curated docs
    stats.json per-stage row counts

Optional hygiene stages: --repetition-filter (Gopher Table A1),
--decontam-benchmark (eval-set n-gram overlap removal),
--max-per-domain (per-site quota; needs --url-col on the input).

``--partitions K`` turns on per-partition checkpointing (same ledger
design as the KG path, steps/ledger.py): the input parquet files are
split into K groups, and stage A (the per-doc lang-ID + quality
filters — the bulk of a shard's wall at 100 TB) writes each group's
survivors to ``filtered/part-<k>/`` atomically with a
``status='filtered'`` ledger row.  A killed run restarted with
``--resume`` skips finished partitions and re-runs only stage B (the
global dedup/pack stages over the checkpointed, already-shrunk
survivors) — instead of restarting the whole multi-hour shard from
zero.

Owns its Ray session (guarded — never clobbers a driver-provided one);
``ray job submit -- python -m kgforge.curate ...`` works unchanged on a
real cluster.
"""

from __future__ import annotations

import argparse
import json
import os


def _write_parquet_always(ds, path: str, fallback_schema) -> None:
    """Delegates to ``steps/ledger.write_parquet_always`` — ONE copy of
    the empty-dataset-safe physical write (run.py shares it)."""
    from kgforge.steps.ledger import write_parquet_always

    write_parquet_always(ds, path, fallback_schema)


def _atomic_write_always(ds, final_dir: str, fallback_schema) -> None:
    """_write_parquet_always staged through steps/ledger.py's atomic
    publish sequence — a killed stage-A partition leaves only a .tmp dir
    the resumed run deletes; the ledger row is written AFTER the rename,
    so a row existing implies the data is fully published."""
    from kgforge.steps.ledger import atomic_write_parquet

    atomic_write_parquet(
        ds, final_dir, writer=lambda d, tmp: _write_parquet_always(d, tmp, fallback_schema)
    )


def _group_fp(group: list[str], params: str = "") -> str:
    """Delegates to ``steps/ledger.group_fingerprint`` (shared with
    run.py's resume gate — see its docstring for the contract)."""
    from kgforge.steps.ledger import group_fingerprint

    return group_fingerprint(group, params)


def _fp_params(args) -> str:
    """The stage-A settings that change what a checkpoint contains."""
    langs = ",".join(sorted(s.strip() for s in args.langs.split(",") if s.strip()))
    return f"{args.id_col}|{args.text_col}|{langs}|{args.min_quality!r}"


def _id_type(files: list[str], id_col: str):
    """The id column's Arrow type from the input files' parquet schema —
    empty-partition fallback schemas must match the real dtype (a
    hardcoded int64 next to string-id parts fails schema unification
    when stage B reads the filtered directory)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    for f in files[:8]:
        try:
            return pq.ParquetFile(f).schema_arrow.field(id_col).type
        except Exception:
            continue
    return pa.int64()


def _input_files(pattern: str) -> list[str]:
    """Expand --input (a dir, a file, or a glob) to a sorted file list."""
    import glob as _glob

    if os.path.isdir(pattern):
        return sorted(
            _glob.glob(os.path.join(pattern, "**", "*.parquet"), recursive=True)
        )
    if os.path.isfile(pattern):
        return [pattern]
    return sorted(_glob.glob(pattern))


def _filter_partitions(args, files: list[str]) -> tuple[str, list[list[str]]]:
    """Stage A: per-partition lang+quality filter with ledger resume.
    Returns the directory the checkpointed survivors live under and the
    input-file groups (for the ledger roll-up in main)."""
    import time

    import pyarrow as pa
    import ray.data as rd

    from kgforge.pipelines.curation import lang_quality_filter
    from kgforge.steps.ledger import (
        current_epoch,
        ledger_row,
        read_ledger,
        write_ledger_row,
    )

    out = args.out
    k = min(args.partitions, len(files))
    step = (len(files) + k - 1) // k
    groups = [files[i : i + step] for i in range(0, len(files), step)]
    # resume trusts a pid ONLY if its recorded file-group fingerprint
    # matches the current grouping; a changed input file list (or a
    # different K) re-runs the remapped partitions instead of silently
    # substituting a checkpoint built from different files
    done: set[int] = set()
    fp_params = _fp_params(args)
    if args.resume:
        led = read_ledger(out)
        if led is not None:
            recorded: dict[int, str] = {}
            for r in led.sort_by("epoch").to_pylist():
                if r["status"] == "filtered" and r["partition_id"] >= 0:
                    recorded[int(r["partition_id"])] = r.get("group_fp") or ""
            done = {
                pid
                for pid, group in enumerate(groups)
                if recorded.get(pid) == _group_fp(group, fp_params)
            }
    epoch = (current_epoch(out) + 1) if args.resume else 1
    langs = tuple(s.strip() for s in args.langs.split(",") if s.strip())
    fdir = os.path.join(out, "filtered")
    schema = pa.schema(
        [(args.id_col, _id_type(files, args.id_col)), (args.text_col, pa.string())]
    )
    import shutil

    # sweep debris and stale checkpoints BEFORE the resume skip: crashed
    # .tmp dirs of now-done pids and part-K dirs from a previous run
    # with more partitions must not survive next to live data
    if os.path.isdir(fdir):
        for name in os.listdir(fdir):
            full = os.path.join(fdir, name)
            stale = False
            if ".tmp-" in name:
                stale = True
            elif name.startswith("part-"):
                try:
                    stale = int(name[5:]) >= len(groups)
                except ValueError:
                    stale = True
            if stale:
                shutil.rmtree(full, ignore_errors=True)
    for pid, group in enumerate(groups):
        part_dir = os.path.join(fdir, f"part-{pid}")
        if pid in done:
            continue
        t0 = time.monotonic()
        ds_p = rd.read_parquet(group)
        n_in = ds_p.count()
        filtered = lang_quality_filter(
            ds_p, args.text_col, langs=langs, min_quality=args.min_quality
        ).select_columns([args.id_col, args.text_col])
        _atomic_write_always(filtered, part_dir, schema)
        # survivor count from the published files' parquet metadata —
        # no second execution of the filter lineage
        import pyarrow.parquet as pq

        n_kept = sum(
            pq.ParquetFile(os.path.join(part_dir, f)).metadata.num_rows
            for f in os.listdir(part_dir)
            if f.endswith(".parquet")
        )
        # url_min/url_max carry the partition's input-file range (the
        # lineage a resume needs to map rows back to inputs)
        write_ledger_row(
            out,
            ledger_row(pid, group[0], group[-1], epoch, n_in, n_kept, -1,
                       "filtered", time.monotonic() - t0,
                       group_fp=_group_fp(group, fp_params)),
            f"part-{pid}",
        )
    return fdir, groups


def _stage_a_totals(
    out: str, groups: list[list[str]], fp_params: str
) -> tuple[int, int]:
    """(input_docs, survivors) for stage A, rolled up from the ledger
    rows of the CURRENT grouping — the true shard attrition even when
    stage B only saw the checkpointed survivors."""
    from kgforge.steps.ledger import read_ledger

    led = read_ledger(out)
    fps = {pid: _group_fp(g, fp_params) for pid, g in enumerate(groups)}
    if led is None:
        return 0, 0
    latest: dict[int, dict] = {}  # latest epoch wins per pid
    for r in led.to_pylist():
        pid = int(r["partition_id"])
        if r["status"] == "filtered" and fps.get(pid) == (r.get("group_fp") or ""):
            cur = latest.get(pid)
            if cur is None or r["epoch"] >= cur["epoch"]:
                latest[pid] = r
    n_in = sum(int(r["n_pages"]) for r in latest.values())
    n_kept = sum(int(r["n_docs"]) for r in latest.values())
    return n_in, n_kept


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="kgforge corpus curation")
    p.add_argument("--input", required=True, help="input parquet path/glob")
    p.add_argument("--input-format", default="parquet",
                   choices=("parquet", "jsonl"),
                   help="jsonl reads JSON-lines (.gz auto-detected) — the "
                        "interchange path; parquet is the scale path")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--langs", default="en", help="comma-separated allow-list")
    p.add_argument("--min-quality", type=float, default=0.35)
    p.add_argument("--neardup-threshold", type=float, default=0.7)
    p.add_argument("--known-index", default=None,
                   help="parquet dir of the (h1,h2) corpus index so far")
    p.add_argument("--seq-len", type=int, default=1024)
    p.add_argument("--no-pack", action="store_true")
    p.add_argument("--stats", default="auto", choices=("auto", "counts", "none"),
                   help="'counts' materializes per stage for audited row counts; "
                        "'none' streams stage-to-stage (the 100-TB configuration); "
                        "'auto' (default) counts only metadata-countable inputs "
                        "up to KGFORGE_CURATION_COUNTS_ROWS and streams otherwise")
    p.add_argument("--partitions", type=int, default=0,
                   help="checkpoint stage A (lang+quality filter) across this many "
                        "input-file partitions with a resume ledger (0 = off)")
    p.add_argument("--resume", action="store_true",
                   help="skip stage-A partitions whose ledger row exists")
    p.add_argument("--repetition-filter", action="store_true",
                   help="drop repetitious docs (Gopher Table A1 thresholds)")
    p.add_argument("--decontam-benchmark", default=None,
                   help="parquet path of eval-benchmark texts (column --text-col) "
                        "to decontaminate against, or a .txt file of one text "
                        "per line")
    p.add_argument("--decontam-ngram", type=int, default=13)
    p.add_argument("--max-per-domain", type=int, default=None,
                   help="keep at most this many docs per site (--url-col must "
                        "exist on the input; incompatible with --partitions, "
                        "whose checkpoints drop the url column)")
    p.add_argument("--url-col", default="url")
    p.add_argument("--redact-pii", action="store_true",
                   help="scrub emails/ips/phones to placeholder tokens "
                        "before dedup")
    p.add_argument("--quality-model", default=None,
                   help="path to a qualityclf .npz model; docs scoring below "
                        "--quality-model-threshold drop")
    p.add_argument("--quality-model-threshold", type=float, default=0.5)
    p.add_argument("--lm-model", default=None,
                   help="path to an ngramlm .npz; docs with pseudo-perplexity "
                        "above --max-perplexity drop")
    p.add_argument("--max-perplexity", type=float, default=None)
    p.add_argument("--semdedup-threshold", type=float, default=None,
                   help="enable the SemDeDup semantic near-dup stage at this "
                        "cosine threshold (embeds via --semdedup-encoder)")
    p.add_argument("--semdedup-clusters", type=int, default=None,
                   help="k-means cluster count for SemDeDup (default ~N/1024)")
    p.add_argument("--semdedup-encoder", default="hashed_bow",
                   help="registered encoder name for the SemDeDup embeddings")
    p.add_argument("--substring-dedup-ngram", type=int, default=None,
                   help="enable duplicated-span removal at this window size "
                        "(Lee-et-al substring dedup; 50 is the standard)")
    p.add_argument("--n-shards", type=int, default=0,
                   help="after curation, write <out>/shards/shard=K/ as a "
                        "deterministic global shuffle of the curated docs")
    p.add_argument("--shard-seed", type=int, default=0)
    args = p.parse_args(argv)
    if args.input_format != "parquet" and args.partitions > 0:
        raise SystemExit(
            "--input-format jsonl cannot be combined with --partitions (the "
            "checkpoint ledger tracks parquet file groups): convert once with "
            "read_jsonl(...).write_parquet(...) and partition the parquet"
        )
    if args.max_per_domain is not None and args.partitions > 0:
        raise SystemExit(
            "--max-per-domain cannot be combined with --partitions: stage-A "
            "checkpoints store only (id, text); run the quota in a "
            "non-checkpointed pass"
        )

    import ray

    if not ray.is_initialized():
        # plain init: connects to RAY_ADDRESS / an existing cluster under
        # `ray job submit`, falls back to a local instance standalone —
        # address="local" would force an isolated single-node Ray even
        # inside a real cluster job
        ray.init(include_dashboard=False, logging_level="ERROR")
    import ray.data as rd

    from kgforge.pipelines.curation import curate_corpus

    known = rd.read_parquet(args.known_index) if args.known_index else None
    skip_filters = False
    files = _input_files(args.input)
    groups: list[list[str]] = []
    if args.partitions > 0:
        if not files:
            raise SystemExit(f"no parquet files match {args.input}")
        os.makedirs(args.out, exist_ok=True)
        fdir, groups = _filter_partitions(args, files)
        # stage B consumes the checkpointed survivors of EXACTLY the
        # current grouping's part dirs — a recursive read of filtered/
        # would also ingest stale part-K checkpoints or crash debris.
        # Expanded to files: Ray 2.49 read_parquet rejects directories
        # inside an explicit path list
        part_files = []
        for pid in range(len(groups)):
            d = os.path.join(fdir, f"part-{pid}")
            part_files += sorted(
                os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
            )
    # column pushdown: curate_corpus projects to (id, text[, url]) right
    # after its filters, so shipping any other column out of the scan is
    # wasted read bandwidth.  JSONL can't prune (row-wise format — see
    # sources.read_jsonl).
    need = [args.id_col, args.text_col]
    if args.max_per_domain is not None:
        need.append(args.url_col)
    need = list(dict.fromkeys(need))
    if args.partitions > 0:
        in_ds = rd.read_parquet(part_files, columns=need)
        skip_filters = True
    elif args.input_format == "jsonl":
        from kgforge.sources import read_jsonl

        in_ds = read_jsonl(args.input)
    else:
        in_ds = rd.read_parquet(args.input, columns=need)
    bench = None
    if args.decontam_benchmark:
        if args.decontam_benchmark.endswith(".txt"):
            with open(args.decontam_benchmark) as f:
                bench = [ln.rstrip("\n") for ln in f if ln.strip()]
        else:
            import pyarrow.parquet as pq

            bench = pq.read_table(
                args.decontam_benchmark, columns=[args.text_col]
            )[args.text_col].to_pylist()
    qmodel = None
    if args.quality_model is not None:
        from kgforge.qualityclf import load_model

        qmodel = load_model(args.quality_model)
    lm = None
    if args.lm_model is not None:
        if args.max_perplexity is None:
            raise SystemExit("--lm-model requires --max-perplexity")
        from kgforge.ngramlm import load_lm

        lm = load_lm(args.lm_model)
    res = curate_corpus(
        in_ds,
        id_col=args.id_col,
        text_col=args.text_col,
        langs=tuple(s.strip() for s in args.langs.split(",") if s.strip()),
        min_quality=args.min_quality,
        neardup_threshold=args.neardup_threshold,
        known_hashes=known,
        seq_len=args.seq_len,
        pack=not args.no_pack,
        stats=args.stats,
        skip_filters=skip_filters,
        repetition=args.repetition_filter,
        decontam_benchmark=bench,
        decontam_ngram=args.decontam_ngram,
        max_per_domain=args.max_per_domain,
        url_col=args.url_col,
        redact_pii=args.redact_pii,
        semdedup_threshold=args.semdedup_threshold,
        semdedup_clusters=args.semdedup_clusters,
        semdedup_encoder=args.semdedup_encoder,
        quality_model=qmodel,
        quality_model_threshold=args.quality_model_threshold,
        perplexity_lm=lm,
        max_perplexity=args.max_perplexity,
        substring_dedup_ngram=args.substring_dedup_ngram,
    )
    import pyarrow as pa

    os.makedirs(args.out, exist_ok=True)
    # atomic REPLACE, not append: Ray's write_parquet never deletes, so
    # a rerun (or a --resume) into the same --out would otherwise leave
    # the previous run's docs next to the new ones
    # jsonl inputs never match _id_type's *.parquet glob — probe the
    # live dataset schema instead (a wrong int64 fallback on a
    # string-id corpus writes an empty docs parquet that fails schema
    # unification next to real outputs)
    id_type = _id_type(files, args.id_col)
    if args.input_format == "jsonl":
        in_schema = in_ds.schema()
        base = getattr(in_schema, "base_schema", None)
        if isinstance(base, pa.Schema) and args.id_col in base.names:
            id_type = base.field(args.id_col).type
    _atomic_write_always(
        res.docs, os.path.join(args.out, "docs"),
        pa.schema([(args.id_col, id_type),
                   (args.text_col, pa.string()),
                   ("n_dropped_paragraphs", pa.int64())]),
    )
    _atomic_write_always(
        res.new_index, os.path.join(args.out, "index"),
        pa.schema([("h1", pa.int64()), ("h2", pa.int64())]),
    )
    if res.packed is not None:
        _atomic_write_always(
            res.packed, os.path.join(args.out, "packed"),
            pa.schema([("seq", pa.list_(pa.int32())), ("n_tokens", pa.int64())]),
        )
    if args.partitions > 0:
        # global-stage summary row (mirrors the KG path's 'materialized'
        # row): pid -1, n_docs = survivors if counted
        from kgforge.steps.ledger import current_epoch, ledger_row, write_ledger_row

        write_ledger_row(
            args.out,
            ledger_row(-1, "", "", current_epoch(args.out), 0,
                       res.stats.get("after_neardup", -1), -1, "curated", 0.0),
            "summary-curated",
        )
        res.stats["checkpoint_partitions"] = args.partitions
        # stage B only saw the checkpointed survivors, so curate_corpus's
        # input_docs/after_lang_quality reflect the post-filter count;
        # the true shard attrition lives in the stage-A ledger rows
        n_in, n_kept = _stage_a_totals(args.out, groups, _fp_params(args))
        res.stats["input_docs"] = n_in
        res.stats["after_lang_quality"] = n_kept
    if args.n_shards > 0:
        from kgforge.shard import shuffle_shard

        n = shuffle_shard(
            res.docs, os.path.join(args.out, "shards"), args.n_shards,
            id_col=args.id_col, seed=args.shard_seed,
        )
        res.stats["shards"] = args.n_shards
        res.stats["sharded_docs"] = n
    with open(os.path.join(args.out, "stats.json"), "w") as f:
        json.dump(res.stats, f, indent=1, sort_keys=True)
    print(json.dumps(res.stats, sort_keys=True))


if __name__ == "__main__":
    main()
