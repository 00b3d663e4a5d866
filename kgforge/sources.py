"""Sources (SURVEY §2.S1): read Common-Crawl-style pages parquet with
column pruning and row-group predicate pushdown — only the needed
columns/row-groups leave storage."""

from __future__ import annotations

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def read_pages(path: str, langs: tuple[str, ...] | None = None, columns=None):
    """Dataset[pages] from parquet file(s)/dir. ``langs`` pushes the
    language filter into the parquet scan (row-group stats + dictionary
    filtering) instead of a post-read map."""
    import pyarrow.compute as pc
    import ray.data as rd

    kwargs = {}
    if langs:
        kwargs["filter"] = pc.field("lang").isin(list(langs))
    ds = rd.read_parquet(path, columns=columns or PAGES_COLUMNS, **kwargs)
    return ds.map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    )


def write_pages(pages_ds, out_dir: str) -> None:
    """Materialize a synthetic corpus to parquet (for reuse as a real
    read_pages input / ray job submit artifact)."""
    pages_ds.write_parquet(out_dir)
