"""Parquet pages source (S1): pushdown filter equivalence + roundtrip."""

from __future__ import annotations

import pytest
import ray.data as rd

from kgforge.corpus import pages_table
from kgforge.sources import read_pages, write_pages


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pages"))
    write_pages(rd.from_arrow(pages_table(200)), out)
    return out


def test_roundtrip_preserves_rows(corpus_dir):
    ds = read_pages(corpus_dir)
    assert ds.count() == 200
    assert ds.schema().names == ["url", "warc_ts", "html", "text", "lang"]


def test_lang_pushdown_equals_post_filter(corpus_dir):
    pushed = read_pages(corpus_dir, langs=("en",))
    full = read_pages(corpus_dir)
    import pyarrow.compute as pc

    post = full.map_batches(
        lambda t: t.filter(pc.equal(t["lang"], "en")), batch_format="pyarrow"
    )
    a = sorted(r["url"] for r in pushed.select_columns(["url"]).take_all())
    b = sorted(r["url"] for r in post.select_columns(["url"]).take_all())
    assert a == b and len(a) > 0


def test_flagship_same_result_from_parquet(corpus_dir):
    """Parquet-sourced flagship must equal the in-memory-sourced one."""
    from kgforge.pipelines.flagship import run_flagship

    a = run_flagship(read_pages(corpus_dir)).triples.take_all()
    b = run_flagship(rd.from_arrow(pages_table(200))).triples.take_all()
    assert a == b


def test_documents_as_pages_adapter_feeds_extraction():
    """SURVEY §3.3 adapter: the driver documents table reshaped to the
    pages schema must flow through extract_docs via the raw-text fallback
    (html is empty) with the text preserved."""
    import pyarrow.compute as pc

    from kgforge.kgqueries import documents_as_pages
    from kgforge.steps.extract import extract_docs

    pages = documents_as_pages("/root/testdata/sf0.001")
    n_in = pages.count()
    assert n_in > 0
    assert set(pages.schema().names) == {"url", "warc_ts", "html", "text", "lang"}
    docs = extract_docs(pages)
    out = docs.take_all()
    assert 0 < len(out) <= n_in
    row = out[0]
    assert row["url"].startswith("testdata://doc/")
    assert len(row["extracted_text"]) > 0 and "html" not in row


def test_jsonl_round_trip_plain_gz_and_columns(ray_session, tmp_path):
    """JSONL(.gz) interchange: plain + gzipped reads, auto-detection,
    column projection, write→read round trip."""
    import gzip
    import json

    import pandas as pd
    import ray.data as rd

    from kgforge.sources import read_jsonl, write_jsonl

    rows = [{"doc_id": i, "text": f"document number {i}", "lang": "en"}
            for i in range(10)]
    plain = tmp_path / "plain"
    plain.mkdir()
    with open(plain / "a.jsonl", "w") as f:
        for r in rows[:6]:
            f.write(json.dumps(r) + "\n")
    with open(plain / "b.jsonl", "w") as f:
        for r in rows[6:]:
            f.write(json.dumps(r) + "\n")
    got = read_jsonl(str(plain)).to_pandas().sort_values("doc_id", ignore_index=True)
    assert got.to_dict("records") == rows

    gz = tmp_path / "gz"
    gz.mkdir()
    with gzip.open(gz / "a.jsonl.gz", "wt") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    got_gz = (read_jsonl(str(gz), columns=["doc_id", "text"])
              .to_pandas().sort_values("doc_id", ignore_index=True))
    assert list(got_gz.columns) == ["doc_id", "text"]
    assert got_gz["text"].tolist() == [r["text"] for r in rows]

    out = tmp_path / "out"
    write_jsonl(rd.from_pandas(pd.DataFrame(rows)), str(out))
    back = read_jsonl(str(out)).to_pandas().sort_values("doc_id", ignore_index=True)
    assert back.to_dict("records") == rows


def test_jsonl_mixed_dir_and_forced_modes(ray_session, tmp_path):
    """compression='auto' must read MIXED plain+gz directories (the
    reader detects per file); 'raw' forces no decompression for a
    mis-named plain file; bad mode raises."""
    import gzip
    import json

    import pytest

    from kgforge.sources import read_jsonl

    mixed = tmp_path / "mixed"
    mixed.mkdir()
    with open(mixed / "a.jsonl", "w") as f:
        f.write(json.dumps({"doc_id": 1, "text": "plain"}) + "\n")
    with gzip.open(mixed / "b.jsonl.gz", "wt") as f:
        f.write(json.dumps({"doc_id": 2, "text": "gzipped"}) + "\n")
    got = read_jsonl(str(mixed)).to_pandas().sort_values("doc_id")
    assert got["text"].tolist() == ["plain", "gzipped"]

    # forced gzip for an extensionless gzipped file
    noext = tmp_path / "gz_no_ext"
    with gzip.open(noext, "wt") as f:
        f.write(json.dumps({"doc_id": 3, "text": "hidden gz"}) + "\n")
    forced = read_jsonl(str(noext), compression="gzip").to_pandas()
    assert forced["text"].tolist() == ["hidden gz"]

    with pytest.raises(ValueError, match="compression"):
        read_jsonl(str(mixed), compression="zstd-typo")
