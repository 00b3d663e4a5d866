"""exact_dedup tie semantics (ADVICE r1): byte-identical duplicate page
rows (same url AND warc_ts AND content) must collapse to exactly ONE row
per url_norm, matching the reference emitter's one-row-per-url semantics;
rows tying on (ts, url) but differing in content break the tie by sha."""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from kgforge.corpus import pages_table
from kgforge.steps.extract import add_url_norm, exact_dedup, extract_docs


def _docs_from(pages: pa.Table, n_blocks: int = 4):
    ds = rd.from_arrow(pages).repartition(n_blocks)
    ds = ds.map_batches(add_url_norm, batch_format="pyarrow")
    return extract_docs(ds).materialize()


def test_byte_identical_dups_keep_exactly_one():
    base = pages_table(40)
    # triplicate a handful of rows byte-identically
    dup = base.slice(5, 4)
    pages = pa.concat_tables([base, dup, dup])
    docs = _docs_from(pages)
    out = exact_dedup(docs).to_pandas()
    assert out["url_norm"].is_unique, "tied duplicate rows survived dedup"
    # and equals the dedup of the clean corpus
    clean = exact_dedup(_docs_from(base)).to_pandas()
    a = out.sort_values("url_norm").reset_index(drop=True)
    b = clean.sort_values("url_norm").reset_index(drop=True)
    assert a[["url_norm", "text_sha256"]].equals(b[["url_norm", "text_sha256"]])


def test_same_ts_url_different_content_breaks_tie_by_sha():
    base = pages_table(20)
    row = base.slice(3, 1)
    # same url + warc_ts, different html → different extracted sha
    variant = row.set_column(
        row.schema.get_field_index("html"),
        "html",
        pa.array([row["html"].to_pylist()[0] + b"<p>extra tail paragraph here</p>"],
                 row.schema.field("html").type),
    )
    pages = pa.concat_tables([base, variant])
    docs = _docs_from(pages)
    out = exact_dedup(docs).to_pandas()
    assert out["url_norm"].is_unique
    # winner must be the max-sha variant (deterministic, not block-order)
    url_norm = (
        _docs_from(row).to_pandas()["url_norm"].iloc[0]
    )
    shas = _docs_from(pages).to_pandas()
    cand = shas[shas["url_norm"] == url_norm]["text_sha256"]
    kept = out[out["url_norm"] == url_norm]["text_sha256"].iloc[0]
    assert kept == cand.max()


def test_shaless_content_ties_deterministic_across_paths():
    """Rows tying on (warc_ts, url) with DIFFERENT content and no
    text_sha256 column (dedup before extraction): both paths must keep
    the same, content-determined row regardless of row order."""
    import pyarrow as pa
    import ray.data as rd

    from kgforge.steps.extract import exact_dedup

    ts = [1000, 1000]
    rows = {
        "url": ["http://x.example/p", "http://x.example/p"],
        "url_norm": ["http://x.example/p", "http://x.example/p"],
        "warc_ts": pa.array(ts, pa.timestamp("us")),
        "text": ["A payload", "Z payload"],
    }
    t_fwd = pa.table(rows)
    t_rev = t_fwd.take([1, 0])
    outs = []
    for t in (t_fwd, t_rev):
        for path in ("gather", "join"):
            out = exact_dedup(rd.from_arrow(t), force_path=path).to_pandas()
            assert len(out) == 1, (path, out)
            outs.append(out["text"].iloc[0])
    assert len(set(outs)) == 1, f"content pick differs: {outs}"
