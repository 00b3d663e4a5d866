"""Sources (SURVEY §2.S1): read Common-Crawl-style pages parquet with
column pruning and row-group predicate pushdown — only the needed
columns/row-groups leave storage.  JSONL(.gz) in/out rides along for
the web-corpus interchange format (most public crawls and curated
text dumps ship as gzipped JSON lines)."""

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


def read_jsonl(path, columns=None, *, compression: str = "auto"):
    """Dataset from JSON-lines file(s)/dir, transparently gunzipping
    ``.jsonl.gz``.  ``compression='auto'`` (default) passes no stream
    args, which makes the reader detect the codec PER FILE from its
    extension — mixed plain+gz directories read correctly; forcing one
    codec onto a directory would not.  ``'gzip'`` forces gunzip for
    extensionless gzipped paths.  There is NO raw override: the reader
    treats an absent/None compression as "detect from extension", so a
    PLAIN file mis-named ``.gz`` cannot be read — rename it.

    JSONL has NO column pruning at the scan — every byte is read and
    parsed before ``columns`` projects (done here right after the read
    so at least nothing wider crosses the pipeline).  It is the
    INTERCHANGE format: for the 100-TB path, land JSONL once, convert
    to parquet (`read_jsonl(...).write_parquet(...)`), and run the
    pipeline over the parquet."""
    import ray.data as rd

    kwargs = {}
    if compression == "gzip":
        # forcing a codec is for extensionless paths — also disable the
        # reader's default .json/.jsonl[.gz] extension filter, which
        # would silently drop exactly those files
        kwargs["arrow_open_stream_args"] = {"compression": "gzip"}
        kwargs["file_extensions"] = None
    elif compression != "auto":
        raise ValueError(
            f"unknown compression {compression!r} (auto|gzip)"
        )
    ds = rd.read_json(path, **kwargs)
    if columns:
        ds = ds.select_columns(list(columns))
    return ds


def write_jsonl(ds, out_dir: str) -> None:
    """Write JSON-lines files (one per block) — the interchange/export
    sink; parquet stays the engine-to-engine format."""
    ds.write_json(out_dir)
