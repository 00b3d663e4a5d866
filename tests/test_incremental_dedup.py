"""Incremental (cross-run) exact dedup: a new shard checked against a
persisted content-hash index — novel docs pass, already-ingested
content drops, bloom false positives never drop a novel doc."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data as rd

from kgforge.dedup_ops import content_hashes, incremental_dedup_filter


def _docs(ids, texts):
    return rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())})
    )


def test_incremental_dedup_drops_known_content(ray_session):
    known_texts = [f"already ingested article {i} body" for i in range(200)]
    known = content_hashes(_docs(list(range(200)), known_texts)).materialize()
    new_texts = [f"fresh article {i} body" for i in range(50)] + known_texts[::10]  # 20 re-posts
    new = _docs(list(range(1000, 1000 + len(new_texts))), new_texts).repartition(4)
    out = incremental_dedup_filter(new, known).to_pandas()
    assert len(out) == 50
    assert all(t.startswith("fresh") for t in out["text"])
    assert sorted(out.columns) == ["doc_id", "text"]  # helper cols removed


def test_incremental_dedup_index_roundtrips_through_parquet(ray_session, tmp_path):
    """Cross-run contract: an index written by one 'run' must verify
    hashes computed by another."""
    known = content_hashes(_docs([1, 2], ["persisted doc", "another persisted doc"]))
    known.write_parquet(str(tmp_path / "idx"))
    reloaded = rd.read_parquet(str(tmp_path / "idx"))
    new = _docs([9, 10], ["persisted doc", "entirely new doc"])
    out = incremental_dedup_filter(new, reloaded).to_pandas()
    assert out["text"].tolist() == ["entirely new doc"]


def test_incremental_dedup_bloom_false_positives_never_drop(ray_session):
    """A deliberately terrible bloom (fpp 0.5) floods the candidate set
    with false positives; the exact (h1, h2) verify must keep every
    novel doc anyway."""
    known = content_hashes(_docs(list(range(100)), [f"known {i}" for i in range(100)]))
    known = known.materialize()
    new = _docs(list(range(500, 900)), [f"novel {i}" for i in range(400)])
    out = incremental_dedup_filter(new, known, fpp=0.5).to_pandas()
    assert len(out) == 400  # nothing novel lost


def test_incremental_dedup_empty_index_passes_everything(ray_session):
    known = content_hashes(_docs([], [])).materialize()
    new = _docs([1, 2], ["a", "b"])
    out = incremental_dedup_filter(new, known).to_pandas()
    assert len(out) == 2


def test_incremental_dedup_distributed_equals_driver(ray_session):
    """Forced-distributed join verification (VERDICT r2 item 3) on an
    ALL-KNOWN backfill shard plus novel rows: both strategies keep the
    same docs; the all-known extreme gathers nothing on the driver."""
    known_texts = [f"ingested {i}" for i in range(300)]
    known = content_hashes(_docs(list(range(300)), known_texts)).materialize()
    # 90% known backfill shard
    new_texts = known_texts[:270] + [f"novel {i}" for i in range(30)]
    new = _docs(list(range(2000, 2000 + 300)), new_texts).repartition(4)
    drv = (
        incremental_dedup_filter(new, known, strategy="driver")
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    dist = (
        incremental_dedup_filter(new, known, strategy="distributed")
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(drv, dist)
    assert len(drv) == 30 and all(t.startswith("novel") for t in drv["text"])
    # fully-known shard: distributed plan must return an empty survivor set
    allk = _docs(list(range(5000, 5050)), known_texts[:50]).repartition(4)
    out = incremental_dedup_filter(allk, known, strategy="distributed")
    assert out.count() == 0


def test_incremental_dedup_distributed_all_bloom_false_positives(ray_session):
    """Every Bloom hit a false positive (tiny index, terrible fpp): the
    distributed plan's index-side groupby is all-empty and must short-
    circuit instead of feeding a schema-less stream into the join
    (review-verified crash)."""
    known = content_hashes(_docs([1, 2, 3], ["ka", "kb", "kc"])).materialize()
    new = _docs(list(range(100, 300)), [f"novel doc {i}" for i in range(200)]).repartition(4)
    out = incremental_dedup_filter(new, known, fpp=0.4, strategy="distributed")
    assert out.count() == 200  # nothing novel lost, no crash
