"""CCNet-style paragraph dedup: DuckDB gap-free oracle over the driver
documents table plus synthetic boilerplate behavior checks."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa

import ray.data as rd

from kgforge.dedup_ops import paragraph_dedup
from kgforge.relational import read

SF = "/root/testdata/sf0.001"

ORACLE_SQL = """
WITH paras AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10)||chr(10))) AS p,
         generate_subscripts(string_split(text, chr(10)||chr(10)), 1) AS pidx
  FROM documents
), marked AS (
  SELECT doc_id, pidx, p,
         (length(p) < 1)
           OR (row_number() OVER (PARTITION BY p ORDER BY doc_id, pidx) = 1) AS keep
  FROM paras
)
SELECT doc_id,
       coalesce(string_agg(CASE WHEN keep THEN p END, chr(10)||chr(10) ORDER BY pidx), '')
         AS text,
       CAST(count(*) FILTER (WHERE NOT keep) AS BIGINT) AS n_dropped_paragraphs
FROM marked GROUP BY doc_id
"""


def _oracle(df_docs: pd.DataFrame) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", df_docs)
    try:
        return con.execute(ORACLE_SQL).df()
    finally:
        con.close()


def _assert_matches_oracle(got: pd.DataFrame, docs: pd.DataFrame):
    want = _oracle(docs)
    got = got.sort_values("doc_id", ignore_index=True)
    want = want.sort_values("doc_id", ignore_index=True)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["text"].tolist() == want["text"].tolist()
    assert got["n_dropped_paragraphs"].astype(int).tolist() == want[
        "n_dropped_paragraphs"
    ].astype(int).tolist()


def _boilerplate_corpus() -> pd.DataFrame:
    header = "SITE NAVIGATION MENU"
    footer = "Copyright 2024 Example Corp. All rights reserved."
    rows = []
    for i in range(40):
        body = f"Unique article body number {i} with its own words."
        rows.append((i, f"{header}\n\n{body}\n\n{footer}"))
    rows.append((100, header))          # fully-boilerplate doc
    rows.append((101, ""))              # empty doc
    rows.append((102, "One of a kind paragraph.\n\n\n\nTrailing after empties."))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def test_paragraph_dedup_matches_oracle_on_boilerplate(ray_session):
    docs = _boilerplate_corpus()
    ds = rd.from_arrow(pa.Table.from_pandas(docs, preserve_index=False)).repartition(4)
    got = paragraph_dedup(ds).to_pandas()
    _assert_matches_oracle(got, docs)
    # spot semantics: doc 0 keeps everything, later docs lose both
    # boilerplate paragraphs, the all-boilerplate doc empties out
    by_id = got.set_index("doc_id")
    assert by_id.loc[0, "n_dropped_paragraphs"] == 0
    assert by_id.loc[5, "n_dropped_paragraphs"] == 2
    assert "SITE NAVIGATION" not in by_id.loc[5, "text"]
    assert "Unique article body number 5" in by_id.loc[5, "text"]
    assert by_id.loc[100, "text"] == ""   # header already seen in doc 0
    assert by_id.loc[101, "text"] == ""
    assert by_id.loc[102, "text"] == docs.set_index("doc_id").loc[102, "text"]


def test_paragraph_dedup_matches_oracle_on_documents_table(ray_session):
    ds = read(SF, "documents", ["doc_id", "text"])
    got = paragraph_dedup(ds).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    _assert_matches_oracle(got, docs)


def test_paragraph_dedup_idempotent(ray_session):
    docs = _boilerplate_corpus()
    ds = rd.from_arrow(pa.Table.from_pandas(docs, preserve_index=False))
    once = paragraph_dedup(ds).to_pandas().sort_values("doc_id", ignore_index=True)
    again_ds = rd.from_arrow(
        pa.Table.from_pandas(once[["doc_id", "text"]], preserve_index=False)
    )
    twice = paragraph_dedup(again_ds).to_pandas().sort_values("doc_id", ignore_index=True)
    assert twice["n_dropped_paragraphs"].sum() == 0
    assert twice["text"].tolist() == once["text"].tolist()


def test_paragraph_dedup_min_len_protects_short_paragraphs(ray_session):
    docs = pd.DataFrame(
        {"doc_id": [1, 2], "text": ["ok\n\nshared paragraph", "ok\n\nshared paragraph"]}
    )
    ds = rd.from_arrow(pa.Table.from_pandas(docs, preserve_index=False))
    got = (
        paragraph_dedup(ds, min_len=5)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    # 'ok' is under min_len → survives everywhere; the long paragraph dedups
    assert got.loc[0, "text"] == "ok\n\nshared paragraph"
    assert got.loc[1, "text"] == "ok"
    assert got["n_dropped_paragraphs"].tolist() == [0, 1]


def test_paragraph_dedup_distributed_strategy_equivalent(ray_session):
    from kgforge.dedup_ops import exact_dedup_filter

    docs = _boilerplate_corpus()
    # duplicate one whole doc so exact_dedup_filter has work too
    docs = pd.concat(
        [docs, pd.DataFrame({"doc_id": [500], "text": [docs["text"].iloc[2]]})],
        ignore_index=True,
    )
    ds = rd.from_arrow(pa.Table.from_pandas(docs, preserve_index=False)).repartition(4)
    drv = paragraph_dedup(ds, strategy="driver").to_pandas().sort_values(
        "doc_id", ignore_index=True
    )
    dist = paragraph_dedup(ds, strategy="distributed").to_pandas().sort_values(
        "doc_id", ignore_index=True
    )
    assert drv["text"].tolist() == dist["text"].tolist()
    assert drv["n_dropped_paragraphs"].tolist() == dist["n_dropped_paragraphs"].tolist()

    e_drv = exact_dedup_filter(ds, strategy="driver").to_pandas().sort_values(
        "doc_id", ignore_index=True
    )
    e_dist = exact_dedup_filter(ds, strategy="distributed").to_pandas().sort_values(
        "doc_id", ignore_index=True
    )
    assert e_drv["doc_id"].tolist() == e_dist["doc_id"].tolist()
    assert 500 not in set(e_drv["doc_id"])

    import pytest

    with pytest.raises(ValueError, match="unknown strategy"):
        paragraph_dedup(ds, strategy="nope").to_pandas()


def test_distributed_winners_dup_heavy_corpus(ray_session):
    """VERDICT r2 item 2 done-criterion: >=50% duplicate rate, BOTH
    operators forced distributed, checked against the DuckDB oracle /
    min-id contract (string ids exercise Min over non-numeric keys)."""
    from kgforge.dedup_ops import exact_dedup_filter

    base = [f"unique para {i}\n\nSHARED BOILERPLATE\n\nmore {i}" for i in range(20)]
    dups = [base[i % 20] for i in range(30)]  # 30 of 50 docs are copies
    docs = pd.DataFrame(
        {"doc_id": [f"d{i:03d}" for i in range(50)], "text": base + dups}
    )
    ds = rd.from_arrow(pa.Table.from_pandas(docs, preserve_index=False)).repartition(4)

    got = (
        exact_dedup_filter(ds, strategy="distributed")
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    want = (
        docs.loc[~docs["text"].duplicated(keep="first")]
        .sort_values("doc_id", ignore_index=True)
    )
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["text"].tolist() == want["text"].tolist()

    para = (
        paragraph_dedup(rd.from_arrow(pa.Table.from_pandas(
            want, preserve_index=False)).repartition(4), strategy="distributed")
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        para, _oracle(want).sort_values("doc_id", ignore_index=True)
    )


def test_paragraph_dedup_preserves_large_string_type(ray_session):
    """large_string text columns must come back large_string from BOTH
    strategies (mixed string/large_string block schemas break writes)."""
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(
                ["a\n\nSHARED\n\nb", "c\n\nSHARED\n\nd"], pa.large_string()
            ),
        }
    )
    for strat in ("driver", "distributed"):
        out = paragraph_dedup(rd.from_arrow(docs), strategy=strat)
        sch = out.materialize().schema().base_schema
        assert sch.field("text").type == pa.large_string(), strat
