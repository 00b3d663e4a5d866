"""CLI for the persisted IVF similarity index (SURVEY §2.Z4):

    # build a cell-partitioned index from a parquet embedding table
    python -m kgforge.ann_cli build --input /data/embeddings.parquet \
        --out /data/ivf_index [--n-centroids 0=auto √N] \
        [--id-col vec_id] [--vec-col embedding]

    # probe it (query vectors = rows of another parquet table)
    python -m kgforge.ann_cli search --index /data/ivf_index \
        --queries /data/queries.parquet --k 10 --nprobe 4 \
        [--out results.parquet]

    # recall@k vs nprobe tuning table against exact brute force
    python -m kgforge.ann_cli recall --input /data/embeddings.parquet \
        --queries /data/queries.parquet --k 10 --nprobes 1,2,4,8

Owns its Ray session (library code never calls ray.init — the repo's
session contract); guards with ``ray.is_initialized()`` so it also runs
inside an existing session (e.g. ``ray job submit``).
"""

from __future__ import annotations

import argparse
import json
import sys


def _session():
    import os

    import ray

    if not ray.is_initialized():
        kwargs = dict(include_dashboard=False, logging_level="ERROR")
        if os.environ.get("RAY_ADDRESS", "local") == "local":
            kwargs["address"] = "local"
        ray.init(**kwargs)
    ray.data.DataContext.get_current().enable_progress_bars = False


def _query_matrix(path: str, vec_col: str, limit: int | None):
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=[vec_col])
    if limit is not None:
        t = t.slice(0, limit)
    if t.num_rows == 0:
        raise SystemExit(f"no query rows in {path}")
    return np.asarray(t[vec_col].to_pylist(), dtype=np.float32)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="python -m kgforge.ann_cli")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build a persisted IVF index")
    b.add_argument("--input", required=True, help="parquet embedding table")
    b.add_argument("--out", required=True, help="index directory")
    b.add_argument("--n-centroids", type=int, default=0, help="0 = auto (~sqrt N)")
    b.add_argument("--id-col", default="vec_id")
    b.add_argument("--vec-col", default="embedding")
    b.add_argument("--overwrite", action="store_true",
                   help="delete an existing index at --out instead of failing fast")

    s = sub.add_parser("search", help="probe a persisted index")
    s.add_argument("--index", required=True)
    s.add_argument("--queries", required=True, help="parquet table of query vectors")
    s.add_argument("--k", type=int, default=10)
    s.add_argument("--nprobe", type=int, default=4)
    s.add_argument("--limit", type=int, default=None, help="use first N query rows")
    s.add_argument("--id-col", default="vec_id")
    s.add_argument("--vec-col", default="embedding")
    s.add_argument("--out", default=None, help="write results parquet here (else stdout)")

    r = sub.add_parser("recall", help="recall@k vs nprobe tuning table")
    r.add_argument("--input", required=True)
    r.add_argument("--queries", required=True)
    r.add_argument("--k", type=int, default=10)
    r.add_argument("--nprobes", default="1,2,4,8")
    r.add_argument("--n-centroids", type=int, default=0)
    r.add_argument(
        "--limit", type=int, default=10,
        help="measure recall over the FIRST N query rows (default 10 — each "
             "query costs one exact brute-force scan; raise deliberately)",
    )
    r.add_argument("--id-col", default="vec_id")
    r.add_argument("--vec-col", default="embedding")

    args = ap.parse_args(argv)
    _session()
    import ray.data as rd

    from .ann import ivf_build, ivf_recall_report, ivf_search_index

    if args.cmd == "build":
        ds = rd.read_parquet(args.input, columns=[args.id_col, args.vec_col])
        cent = ivf_build(
            ds,
            args.out,
            args.n_centroids or None,
            id_col=args.id_col,
            vec_col=args.vec_col,
            overwrite=args.overwrite,
        )
        n = ds.count()
        print(json.dumps({"index": args.out, "rows": n, "n_centroids": len(cent)}))
        return 0

    if args.cmd == "search":
        q = _query_matrix(args.queries, args.vec_col, args.limit)
        out = ivf_search_index(
            args.index, q, k=args.k, nprobe=args.nprobe,
            id_col=args.id_col, vec_col=args.vec_col,
        )
        if args.out:
            import pyarrow as pa
            import pyarrow.parquet as pq

            pq.write_table(pa.Table.from_pandas(out, preserve_index=False), args.out)
            print(json.dumps({"results": args.out, "rows": len(out)}))
        else:
            print(out.to_csv(index=False), end="")
        return 0

    # recall
    q = _query_matrix(args.queries, args.vec_col, args.limit)
    print(f"# recall measured over {len(q)} queries (--limit)", file=sys.stderr)
    ds = rd.read_parquet(args.input, columns=[args.id_col, args.vec_col])
    nprobes = tuple(int(x) for x in args.nprobes.split(","))
    rep = ivf_recall_report(
        ds, q, k=args.k, nprobes=nprobes,
        n_centroids=args.n_centroids or None,
        id_col=args.id_col, vec_col=args.vec_col,
    )
    print(rep.to_csv(index=False), end="")
    return 0


if __name__ == "__main__":
    sys.exit(main())
