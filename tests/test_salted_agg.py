"""Salted/two-level aggregation equality (SURVEY §4.3, §5.4.2): the
batch-partial + global-groupby materialize must equal a naive
single-pass aggregation on a Zipf-skewed input (one head triple in ~40%
of all rows)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from kgforge.steps.materialize import materialize_triples


def _skewed_linked(n=20_000, seed=3):
    rng = np.random.RandomState(seed)
    hot = rng.random(n) < 0.4
    subs = np.where(hot, "e_head", np.char.add("e", rng.randint(0, 500, n).astype(str)))
    objs = np.char.add("o", rng.randint(0, 50, n).astype(str))
    preds = np.where(rng.random(n) < 0.5, "works_for", "located_in")
    urls = np.char.add("https://u", np.arange(n).astype(str))
    return pa.table(
        {
            "url_norm": urls.astype(object),
            "subj_id": subs.astype(object),
            "pred": preds.astype(object),
            "obj_id": objs.astype(object),
        }
    )


def test_linker_dedups_repeated_triple_within_doc():
    """ADVICE r1: a doc repeating the same fact in many sentences must
    emit ONE (s,p,o) row — otherwise re-chunking can split the repeats
    across batch boundaries and _partial_agg double-counts its url."""
    from kgforge.nlp_core import AliasResource
    from kgforge.steps.link import SvoLinker

    linker = SvoLinker()
    # find a sentence the bank actually extracts from, then repeat it
    probe = linker(pa.table({
        "url_norm": pa.array(["u1"], pa.string()),
        "extracted_text": pa.array(
            ["Umar Tanaka works for Juniper Labs."], pa.string()),
    }))
    assert probe.num_rows == 1, "probe sentence should link to one triple"
    repeated = " ".join(["Umar Tanaka works for Juniper Labs."] * 7)
    out = linker(pa.table({
        "url_norm": pa.array(["u1"], pa.string()),
        "extracted_text": pa.array([repeated], pa.string()),
    }))
    assert out.num_rows == 1, "repeated fact within one doc must emit once"
    # two docs may still emit the same (s,p,o) — one row each
    two = linker(pa.table({
        "url_norm": pa.array(["u1", "u2"], pa.string()),
        "extracted_text": pa.array([repeated, repeated], pa.string()),
    }))
    assert two.num_rows == 2


def test_two_level_equals_naive():
    t = _skewed_linked()
    # naive single-pass (pandas): distinct (s,p,o,url) → counts + min url
    df = t.to_pandas().drop_duplicates()
    naive = (
        df.groupby(["subj_id", "pred", "obj_id"])
        .agg(n_sources=("url_norm", "nunique"), first_url=("url_norm", "min"))
        .reset_index()
        .rename(columns={"subj_id": "subj", "obj_id": "obj"})
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    # engine: many small blocks so partials genuinely combine across batches
    ds = rd.from_arrow(t).repartition(32)
    got = (
        materialize_triples(ds)
        .to_pandas()[["subj", "pred", "obj", "n_sources", "first_url"]]
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, naive[["subj", "pred", "obj", "n_sources", "first_url"]])


def test_driver_combine_equals_distributed_path():
    """materialize_triples has two final-combine paths (driver Arrow
    combine below small_sort_threshold, hash Aggregate + range Sort
    above); both must produce identical frames, including dtypes."""
    t = _skewed_linked(n=8_000, seed=7)
    ds = rd.from_arrow(t).repartition(16)
    small = materialize_triples(ds, small_sort_threshold=10**9).to_pandas()
    dist = materialize_triples(ds, small_sort_threshold=0).to_pandas()
    cols = ["subj", "pred", "obj", "n_sources", "first_url"]
    pd.testing.assert_frame_equal(
        small[cols].reset_index(drop=True), dist[cols].reset_index(drop=True)
    )


def test_materialize_distinct_quads_block_invariant():
    """A sameAs merge OUTSIDE the linker can produce the same
    (s,p,o,url) quad in two different blocks; quads_distinct=False must
    yield n_sources=1 regardless of block layout (Sum over partials
    would double-count the straddled url)."""
    import pyarrow as pa
    import ray.data as rd

    from kgforge.steps.materialize import apply_canonical_map, materialize_triples

    t = pa.table({
        "url_norm": ["u1", "u1"],
        "subj_id": ["eTWIN", "eBASE"],
        "pred": ["p", "p"],
        "obj_id": ["eX", "eX"],
    })
    for parts in (1, 2):
        ds = rd.from_arrow(t).repartition(parts)
        mapped = apply_canonical_map(ds, {"eTWIN": "eBASE"})
        out = materialize_triples(mapped, quads_distinct=False).to_pandas()
        assert out["n_sources"].tolist() == [1], f"parts={parts}: {out}"
        assert out["subj"].tolist() == ["eBASE"]
