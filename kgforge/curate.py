"""Curation-pipeline CLI (the daily-shard ingest command):

    python -m kgforge.curate --input '/data/shardN/*.parquet' --out /data/curated/shardN
    python -m kgforge.curate --input ... --out ... --known-index /data/index/so-far

Runs ``kgforge.pipelines.curation.curate_corpus`` over a Parquet shard
and writes, under ``--out``:

    docs/      curated documents parquet (id, text, n_dropped_paragraphs)
    packed/    fixed-length token sequences (unless --no-pack)
    index/     this shard's (h1, h2) survivor index — union it with the
               corpus index and pass as --known-index on the next shard
    stats.json per-stage row counts

Owns its Ray session (guarded — never clobbers a driver-provided one);
``ray job submit -- python -m kgforge.curate ...`` works unchanged on a
real cluster.
"""

from __future__ import annotations

import argparse
import json
import os


def _write_parquet_always(ds, path: str, fallback_schema) -> None:
    """write_parquet that always leaves a readable parquet directory:
    Ray writes ZERO files (and no directory) for an empty dataset, so a
    fully-deduplicated shard would otherwise break the documented
    --known-index round-trip with FileNotFoundError on the next day.
    ``fallback_schema`` (a ``pa.schema``) is used when even Ray's
    dataset-level schema is gone (schema-less empty datasets)."""
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    if ds.count() > 0:
        ds.write_parquet(path)
        return
    schema = None
    try:
        schema = ds.schema().base_schema
    except Exception:
        schema = None
    if schema is None:
        schema = fallback_schema
    pq.write_table(schema.empty_table(), os.path.join(path, "empty.parquet"))


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="kgforge corpus curation")
    p.add_argument("--input", required=True, help="input parquet path/glob")
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
    p.add_argument("--stats", default="counts", choices=("counts", "none"),
                   help="'counts' materializes per stage for audited row counts; "
                        "'none' streams stage-to-stage (the 100-TB configuration)")
    args = p.parse_args(argv)

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
    res = curate_corpus(
        rd.read_parquet(args.input),
        id_col=args.id_col,
        text_col=args.text_col,
        langs=tuple(s.strip() for s in args.langs.split(",") if s.strip()),
        min_quality=args.min_quality,
        neardup_threshold=args.neardup_threshold,
        known_hashes=known,
        seq_len=args.seq_len,
        pack=not args.no_pack,
        stats=args.stats,
    )
    import pyarrow as pa

    os.makedirs(args.out, exist_ok=True)
    _write_parquet_always(
        res.docs, os.path.join(args.out, "docs"),
        pa.schema([(args.id_col, pa.int64()), (args.text_col, pa.string()),
                   ("n_dropped_paragraphs", pa.int64())]),
    )
    _write_parquet_always(
        res.new_index, os.path.join(args.out, "index"),
        pa.schema([("h1", pa.int64()), ("h2", pa.int64())]),
    )
    if res.packed is not None:
        _write_parquet_always(
            res.packed, os.path.join(args.out, "packed"),
            pa.schema([("seq", pa.list_(pa.int32())), ("n_tokens", pa.int64())]),
        )
    with open(os.path.join(args.out, "stats.json"), "w") as f:
        json.dump(res.stats, f, indent=1, sort_keys=True)
    print(json.dumps(res.stats, sort_keys=True))


if __name__ == "__main__":
    main()
