"""Every SQL-backed query must match its DuckDB oracle exactly at
sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

from kgforge.selfcheck import run_all

SF = "/root/testdata/sf0.001"


def test_all_queries_match_oracle():
    res = run_all(SF)
    failures = {k: msg for k, (ok, msg) in res.items() if not ok}
    assert not failures, f"oracle mismatches: {failures}"
    assert len(res) >= 20


def test_text_queries_match_oracle_on_adversarial_documents(tmp_path):
    """The text-query oracles must stay equivalent on inputs the driver
    testdata never exercises: uppercase, consecutive/odd whitespace,
    empty and whitespace-only text, heavy punctuation, non-ASCII."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    sf = tmp_path / "sf_adv"
    sf.mkdir()
    for f in ("region nation customer supplier part orders lineitem "
              "events embeddings").split():
        shutil.copy(f"/root/testdata/sf0.001/{f}.parquet", sf / f"{f}.parquet")
    texts = [
        "The Quick  Brown\tFox JUMPS over\nthe lazy dog",
        "",
        "   ",
        "!!! ??? ... ;;; [brackets] {braces} (parens) ~tilde~ `tick`",
        "the the the the and and of of is is",
        "MiXeD CaSe TOKENS With THE AND OF stopwords",
        "unicode: café naïve 中文文本 —dash—",
        "a nbsp separated",  # non-breaking space: NOT a separator
        "tabs\tand\nnewlines\rand\fformfeeds\vvertical",
        "singleword",
        "\x0b x",          # vertical tab: RE2 \S matches it, Unicode trim ate it
        "\x0b",
        "\xa0 hello",      # NBSP-adjacent whitespace
        "İstanbul and İzmir are cities",  # Python lower() vs DuckDB lower()
        "STRASSE and ß",
    ]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["adv"] * len(texts), pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    pq.write_table(t, sf / "documents.parquet")
    res = run_all(str(sf), ["q_doc_token_counts", "q_doc_bpe_token_counts",
                            "text_quality_scores", "q_doc_lang_stats"])
    failures = {k: msg for k, (ok, msg) in res.items() if not ok}
    assert not failures, f"oracle mismatches on adversarial text: {failures}"


def test_count_semantics_match_oracle_with_null_columns(tmp_path):
    """The driver lineitem has no NULLs, so count(*) vs count(col)
    mistakes are invisible to it — inject NULL l_quantity / l_discount
    and require the three count-bearing aggregate queries to still match
    their oracles exactly."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    sf = tmp_path / "sf_nulls"
    sf.mkdir()
    for f in ("region nation customer supplier part orders "
              "events documents embeddings").split():
        shutil.copy(f"/root/testdata/sf0.001/{f}.parquet", sf / f"{f}.parquet")
    t = pq.read_table("/root/testdata/sf0.001/lineitem.parquet")
    n = t.num_rows
    qty = t["l_quantity"].to_pylist()
    disc = t["l_discount"].to_pylist()
    qty = [None if i % 7 == 0 else v for i, v in enumerate(qty)]
    disc = [None if i % 11 == 0 else v for i, v in enumerate(disc)]
    t = t.set_column(t.schema.get_field_index("l_quantity"), "l_quantity",
                     pa.array(qty, t.schema.field("l_quantity").type))
    t = t.set_column(t.schema.get_field_index("l_discount"), "l_discount",
                     pa.array(disc, t.schema.field("l_discount").type))
    pq.write_table(t, sf / "lineitem.parquet")
    assert n > 100
    res = run_all(str(sf), ["q1_pricing_summary", "q_lineitem_orders_join",
                            "q_revenue_by_segment", "q_topk_lineitems"])
    failures = {k: msg for k, (ok, msg) in res.items() if not ok}
    assert not failures, f"oracle mismatches with NULL columns: {failures}"


def test_partial_combine_distributed_fallback_matches_oracle(ray_session, monkeypatch):
    """KGFORGE_PARTIAL_COMBINE_CAP=0 forces every gated driver combine
    onto its distributed-groupby fallback; the five converted queries
    must stay oracle-identical (driver/distributed combine parity)."""
    monkeypatch.setenv("KGFORGE_PARTIAL_COMBINE_CAP", "0")
    from kgforge.selfcheck import run_all

    res = run_all(
        "/root/testdata/sf0.001",
        ["q1_pricing_summary", "q_lineitem_orders_join", "q_revenue_by_segment",
         "q_events_hourly", "q_doc_exact_dedup_sha"],
    )
    for name, (ok, msg) in res.items():
        assert ok, f"{name}: {msg}"
