"""Driver-style correctness self-check: run every registered query via
Ray Data AND via DuckDB oracle SQL on the same sf_dir, normalize
(column-name sort, row sort), and require EXACT value equality — a
stricter local mirror of the driver's order-insensitive value-hash
(`__ray_entry__.py` contract)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(obj) -> pd.DataFrame:
    if isinstance(obj, pd.DataFrame):
        return obj.copy()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def duckdb_conn(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def compare_one(name: str, sf_dir: str, con=None) -> tuple[bool, str]:
    from .relational import QUERY_FNS, QUERY_SQL

    con = con or duckdb_conn(sf_dir)
    eng = normalize(to_pandas(QUERY_FNS[name](sf_dir)))
    if name not in QUERY_SQL:
        return True, f"rows-only ({len(eng)} rows)"
    ora = normalize(con.execute(QUERY_SQL[name]).fetch_df())
    if list(eng.columns) != list(ora.columns):
        return False, f"schema mismatch: {list(eng.columns)} vs {list(ora.columns)}"
    if len(eng) != len(ora):
        return False, f"row count {len(eng)} vs {len(ora)}"
    for c in eng.columns:
        # The driver hashes RAW values, so int64 5 vs float64 5.0 is a
        # hash miss even when values compare equal — require the same
        # dtype kind per column before comparing values.
        if eng[c].dtype.kind != ora[c].dtype.kind:
            return False, f"dtype mismatch col={c}: {eng[c].dtype} vs {ora[c].dtype}"
    for c in eng.columns:
        a, b = eng[c], ora[c]
        if pd.api.types.is_float_dtype(a):
            bad = ~((a == b) | (a.isna() & b.isna()))
        else:
            bad = ~((a.astype(object) == b.astype(object)) | (a.isna() & b.isna()))
        if bad.any():
            i = bad.idxmax()
            return False, f"value mismatch col={c} row={i}: {a[i]!r} vs {b[i]!r}"
    return True, f"ok ({len(eng)} rows)"


def run_all(sf_dir: str, names: list[str] | None = None) -> dict[str, tuple[bool, str]]:
    from .relational import QUERY_FNS

    con = duckdb_conn(sf_dir)
    out = {}
    for name in names or sorted(QUERY_FNS):
        try:
            out[name] = compare_one(name, sf_dir, con)
        except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
            out[name] = (False, f"EXCEPTION {type(e).__name__}: {e}")
    return out


def main(argv: list[str] | None = None) -> int:
    import argparse
    import sys

    ap = argparse.ArgumentParser(
        prog="python -m kgforge.selfcheck",
        description="Compare every registered query against its DuckDB oracle.",
    )
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*", help="subset of query names (default: all)")
    args = ap.parse_args(argv)

    res = run_all(args.sf_dir, args.names or None)
    n_fail = 0
    for name, (ok, msg) in res.items():
        status = "PASS" if ok else "FAIL"
        n_fail += 0 if ok else 1
        print(f"{status} {name}: {msg}", file=sys.stdout)
    n_sql = sum(1 for _, (ok, m) in res.items() if ok and not m.startswith("rows-only"))
    print(f"-- {len(res) - n_fail}/{len(res)} pass ({n_sql} SQL-verified), {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
