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


def test_fused_band_column_matches_recompute(ray_session):
    """extract_docs(bands=True)'s band_h (the fused pass-1 by-product)
    must be bit-identical to minhash_band_ds' recompute from text, and
    neardup_drop_ds must consume the projection with identical results."""
    import pyarrow as pa

    from kgforge.steps.dedup import minhash_band_ds, neardup_drop_set

    pages = rd.from_arrow(pages_table(400)).repartition(4)
    pages = pages.map_batches(add_url_norm, batch_format="pyarrow")
    fused = exact_dedup(extract_docs(pages, bands=True).materialize())
    plain = exact_dedup(extract_docs(pages).materialize())

    def bands_df(ds):
        df = ds.to_pandas()
        df["band_h"] = df["band_h"].map(tuple)
        return df.sort_values("url_norm", ignore_index=True)

    got = bands_df(minhash_band_ds(fused))  # projection path
    want = bands_df(minhash_band_ds(plain))  # recompute path
    pd.testing.assert_frame_equal(got, want)
    for path in ("driver", "distributed"):
        assert neardup_drop_set(fused, force_path=path) == neardup_drop_set(
            plain, force_path=path
        )


def test_fsl_pack_unpack_round_trip():
    """fixed_size_list columns ride through acero joins as
    fixed_size_binary; the pack/unpack pair must round-trip exactly,
    including nulls and sliced (offset) arrays."""
    import numpy as np
    import pyarrow as pa

    from kgforge.rayutil import fsl_pack, fsl_pack_specs, fsl_unpack

    n, w = 7, 4
    flat = np.arange(n * w, dtype=np.int64)
    fsl = pa.FixedSizeListArray.from_arrays(pa.array(flat, pa.int64()), w)
    emb = pa.array(
        [[float(i)] * 3 if i != 2 else None for i in range(n)],
        pa.list_(pa.float32(), 3),
    )
    t = pa.table({"k": pa.array(range(n)), "band_h": fsl, "emb": emb})
    specs = fsl_pack_specs(t.schema)
    assert [s[0] for s in specs] == ["band_h", "emb"]
    packed = fsl_pack(t, specs)
    assert packed["band_h"].type == pa.binary(w * 8)
    # the packed table must be acero-joinable (the whole point)
    right = pa.table({"k": pa.array([1, 5]), "m": pa.array([1, 1], pa.int8())})
    packed.join(right, keys="k", join_type="left outer")
    out = fsl_unpack(packed, specs)
    assert out.schema == t.schema
    assert out.equals(t)
    # sliced input (non-zero offset buffers)
    sl = t.slice(2, 4)
    out2 = fsl_unpack(fsl_pack(sl, specs), specs)
    assert out2.equals(sl)


def test_apply_drop_ds_distributed_fixed_size_list_payload(ray_session):
    """The distributed anti-join must carry fixed_size_list payload
    columns (band keys, embeddings) through the acero join unchanged."""
    import pyarrow as pa

    from kgforge.steps.dedup import apply_drop_ds

    n = 30
    emb = pa.array([[float(i), -float(i)] for i in range(n)], pa.list_(pa.float64(), 2))
    t = pa.table({"doc_id": pa.array(range(n), pa.int64()), "embedding": emb})
    ds = rd.from_arrow(t).repartition(4)
    drop = rd.from_arrow(pa.table({"doc_id": pa.array([3, 7, 8], pa.int64())}))
    out = apply_drop_ds(ds, drop, key_col="doc_id", strategy="distributed").to_pandas()
    assert sorted(out["doc_id"]) == [i for i in range(n) if i not in (3, 7, 8)]
    by_id = {r.doc_id: list(r.embedding) for r in out.itertuples()}
    assert by_id[5] == [5.0, -5.0] and by_id[29] == [29.0, -29.0]


def test_fused_band_shortcut_requires_matching_text_col(ray_session):
    """minhash_band_ds must take the carried-band_h projection ONLY when
    asked to band extracted_text (the column the fused pass hashed);
    any other text_col gets an honest recompute, not stale keys."""
    import pyarrow as pa

    from kgforge.steps.dedup import minhash_band_ds

    pages = rd.from_arrow(pages_table(60)).repartition(2)
    pages = pages.map_batches(add_url_norm, batch_format="pyarrow")
    fused = exact_dedup(extract_docs(pages, bands=True).materialize())
    # band a DIFFERENT column on the same (band_h-carrying) docs
    other = fused.map_batches(
        lambda t: t.append_column(
            "alt_text", pa.array([s[::-1] for s in t["extracted_text"].to_pylist()])
        ),
        batch_format="pyarrow",
    )

    def bands_df(ds):
        df = ds.to_pandas()
        df["band_h"] = df["band_h"].map(tuple)
        return df.sort_values("url_norm", ignore_index=True)

    got = bands_df(minhash_band_ds(other, text_col="alt_text"))
    carried = bands_df(fused.select_columns(["url_norm", "band_h"]))
    assert not got["band_h"].equals(carried["band_h"])  # recomputed, not stale
    # and the recompute matches banding the alt column from scratch
    plain = other.drop_columns(["band_h"])
    want = bands_df(minhash_band_ds(plain, text_col="alt_text"))
    pd.testing.assert_frame_equal(got, want)
