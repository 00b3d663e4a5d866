"""Equivalence of the driver-side and fully distributed plans for the
two dedup stages (VERDICT r1 #3/#4): at small scale both must produce
byte-identical results; the distributed plan is what runs above the
row-count thresholds at 10^12-doc scale."""

from __future__ import annotations

import pandas as pd
import pytest
import ray.data as rd

from kgforge.corpus import pages_table
from kgforge.steps.dedup import neardup_drop_set
from kgforge.steps.extract import add_url_norm, exact_dedup, extract_docs


@pytest.fixture(scope="module")
def docs():
    ds = rd.from_arrow(pages_table(500)).repartition(8)
    ds = ds.map_batches(add_url_norm, batch_format="pyarrow")
    return extract_docs(ds).materialize()


def _sorted_df(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_exact_dedup_join_equals_gather(docs):
    gather = _sorted_df(exact_dedup(docs, force_path="gather"))
    join = _sorted_df(exact_dedup(docs, force_path="join"))
    assert list(gather.columns) == list(join.columns)
    pd.testing.assert_frame_equal(gather, join)
    # sanity: the corpus actually contains url_norm duplicates
    raw = docs.to_pandas()
    assert raw["url_norm"].duplicated().any()
    assert gather["url_norm"].is_unique


def test_neardup_distributed_equals_driver(docs):
    deduped = exact_dedup(docs, force_path="gather").materialize()
    driver = neardup_drop_set(deduped, force_path="driver")
    dist = neardup_drop_set(deduped, force_path="distributed")
    assert driver, "corpus should contain near-duplicates"
    assert dist == driver


def test_neardup_paths_agree_without_exact_dedup(docs):
    """Public API allows neardup on a corpus that skipped exact dedup
    (duplicate url_norms → >2 rows per verify group in the distributed
    join): both plans must still agree."""
    driver = neardup_drop_set(docs, force_path="driver")
    dist = neardup_drop_set(docs, force_path="distributed")
    assert dist == driver


def test_exact_dedup_join_byte_identical_blocks(docs):
    """Re-ingested dump: the SAME blocks appear twice. A content-derived
    tie-break tag collides across byte-identical blocks and the join then
    keeps every copy; the block-index suffix must keep exactly one row
    per url_norm."""
    import pyarrow as pa

    blocks = [pa.concat_tables([b for b in
               docs.iter_batches(batch_size=4096, batch_format="pyarrow")])]
    doubled = rd.from_arrow(blocks + blocks)  # two byte-identical blocks
    out = exact_dedup(doubled, force_path="join").to_pandas()
    assert out["url_norm"].is_unique
    base = exact_dedup(docs, force_path="gather").to_pandas()
    assert sorted(out["url_norm"]) == sorted(base["url_norm"])


def test_neardup_drop_ds_matches_drop_set(docs):
    """Dataset-valued drop side (both plans) equals the set form."""
    from kgforge.steps.dedup import neardup_drop_ds

    deduped = exact_dedup(docs, force_path="gather").materialize()
    want = neardup_drop_set(deduped, force_path="driver")
    for path in ("driver", "distributed"):
        ds = neardup_drop_ds(deduped, force_path=path)
        got = set(ds.to_pandas()["url_norm"])
        assert got == want, path


def test_apply_drop_ds_distributed_equals_broadcast(docs):
    """Forced-distributed survivor application (bloom prefilter + exact
    left-outer anti-join) keeps exactly the same rows as the broadcast
    is_in plan (VERDICT r2 item 1 done-criterion)."""
    from kgforge.steps.dedup import apply_drop_ds, neardup_drop_ds

    deduped = exact_dedup(docs, force_path="gather").materialize()
    drop_ds = neardup_drop_ds(deduped, force_path="driver")
    assert drop_ds.count() > 0, "corpus should contain near-duplicates"
    a = _sorted_df(apply_drop_ds(deduped, drop_ds, strategy="broadcast"))
    b = _sorted_df(apply_drop_ds(deduped, drop_ds, strategy="distributed"))
    assert list(a.columns) == list(b.columns)
    pd.testing.assert_frame_equal(a, b)
    # drops actually happened
    assert len(a) == deduped.count() - drop_ds.count()


def test_apply_drop_ds_empty_and_renamed_key(docs):
    import pyarrow as pa

    from kgforge.steps.dedup import apply_drop_ds

    deduped = exact_dedup(docs, force_path="gather").materialize()
    empty = rd.from_arrow(pa.table({"url_norm": pa.array([], pa.string())}))
    assert apply_drop_ds(deduped, empty).count() == deduped.count()
    # drop side under a different column name, distributed strategy
    two = deduped.limit(2).to_pandas()["url_norm"].tolist()
    drop = rd.from_arrow(pa.table({"key": pa.array(two, pa.string())}))
    out = apply_drop_ds(
        deduped, drop, key_col="url_norm", drop_key="key", strategy="distributed"
    )
    assert out.count() == deduped.count() - 2


def test_apply_drop_set_integer_keys(docs):
    """apply_drop_set infers the key type (int ids crashed on the
    hard-coded pa.string() — review finding): broadcast and distributed
    strategies accept the same keys."""
    import pyarrow as pa

    from kgforge.steps.dedup import apply_drop_ds, apply_drop_set

    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(20), pa.int64()),
                  "v": pa.array([str(i) for i in range(20)], pa.string())})
    )
    out = apply_drop_set(ds, {3, 7}, key_col="doc_id")
    assert sorted(out.to_pandas()["doc_id"]) == [i for i in range(20) if i not in (3, 7)]
    drop = rd.from_arrow(pa.table({"doc_id": pa.array([3, 7], pa.int64())}))
    got = apply_drop_ds(ds, drop, key_col="doc_id", strategy="broadcast")
    assert sorted(got.to_pandas()["doc_id"]) == [i for i in range(20) if i not in (3, 7)]


def test_flagship_forced_distributed_neardup_matches_default(docs, monkeypatch):
    """run_flagship with the near-dup engine AND survivor application
    forced distributed (the 100-TB configuration) must produce the
    identical triple set."""
    import ray

    from kgforge.corpus import pages_table
    from kgforge.pipelines.flagship import run_flagship

    pages = rd.from_arrow(pages_table(500)).repartition(8)
    base = run_flagship(pages).triples.to_pandas()
    monkeypatch.setenv("KGFORGE_NEARDUP_DIST_ROWS", "0")
    monkeypatch.setenv("KGFORGE_DROP_APPLY_BROADCAST_ROWS", "0")
    dist = run_flagship(pages).triples.to_pandas()
    cols = ["subj", "pred", "obj", "n_sources"]
    pd.testing.assert_frame_equal(
        base[cols].sort_values(cols, ignore_index=True),
        dist[cols].sort_values(cols, ignore_index=True),
    )


def test_join_partitions_env_override_guards_nonpositive(monkeypatch):
    """'0' is the repo-wide force-the-other-plan convention on the
    KGFORGE_*_ROWS thresholds; join_partitions has no other plan, so a
    non-positive override must fall through to the computed count
    instead of handing Ray an invalid num_partitions."""
    from kgforge.rayutil import join_partitions

    monkeypatch.setenv("KGFORGE_JOIN_PARTITIONS", "0")
    assert join_partitions(10) >= 1
    monkeypatch.setenv("KGFORGE_JOIN_PARTITIONS", "-4")
    assert join_partitions(10) >= 1
    monkeypatch.setenv("KGFORGE_JOIN_PARTITIONS", "12")
    assert join_partitions(10) == 12
