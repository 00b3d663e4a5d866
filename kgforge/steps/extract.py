"""Extraction-side stages (SURVEY §2.B1-B3, B7, G2): url normalization,
exact dedup, language filter, HTML→text extraction."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..extract_core import extract_text, sha256_hex, url_normalize


def add_url_norm(batch: pa.Table) -> pa.Table:
    """Add the stable dedup/partition key. Per-row regex (C-level) — this
    is the cheapest stage in the pipeline."""
    urls = batch["url"].to_pylist()
    return batch.append_column("url_norm", pa.array([url_normalize(u) for u in urls], pa.string()))


def _keep_newest(group: pa.Table) -> pa.Table:
    """Exact-dedup reducer: keep the max (warc_ts, url) row of a url_norm
    group (re-crawl wins; deterministic tie-break on raw url)."""
    if group.num_rows == 1:
        return group
    idx = pc.sort_indices(
        group, sort_keys=[("warc_ts", "descending"), ("url", "descending")]
    )
    return group.take(idx[:1])


def exact_dedup(ds):
    """G2: hash-partition on url_norm, keep newest per group — the first
    shuffle of the flagship pipeline."""
    return ds.groupby("url_norm").map_groups(_keep_newest, batch_format="pyarrow")


def lang_filter(ds, langs: tuple[str, ...] = ("en",)):
    """B2: vectorized language filter inside map_batches (a row-UDF
    ``ds.filter`` would call Python per row)."""
    allowed = pa.array(list(langs), pa.string())
    return ds.map_batches(
        lambda t: t.filter(pc.is_in(t["lang"], value_set=allowed)),
        batch_format="pyarrow",
    )


def extract_docs_batch(batch: pa.Table) -> pa.Table:
    """B1: html → extracted_text (+sha256, n_chars); DROPS the wide html
    column immediately (SURVEY §7.5) and rows with empty extraction."""
    texts = [extract_text(h) for h in batch["html"].to_pylist()]
    out = batch.drop_columns(["html", "text"])
    out = out.append_column("extracted_text", pa.array(texts, pa.string()))
    out = out.append_column(
        "text_sha256", pa.array([sha256_hex(t) for t in texts], pa.string())
    )
    out = out.append_column(
        "n_chars", pa.array([len(t) for t in texts], pa.int64())
    )
    return out.filter(pc.greater(pc.utf8_length(out["extracted_text"]), 0))


def extract_docs(ds, batch_size: int = 256):
    """Stateless task stage; modest batch_size because the html column is
    wide (binary payloads) — blocks stay under the object-store target."""
    return ds.map_batches(extract_docs_batch, batch_format="pyarrow", batch_size=batch_size)
