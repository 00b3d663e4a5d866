"""End-to-end conformance: Ray flagship vs single-threaded reference
emitter (SURVEY §5.2, §5.4.3) — byte-identity, dedup decisions, triple
P/R, materialized counts."""

from __future__ import annotations

import pandas as pd
import pytest

import ray.data as rd

from kgforge.corpus import ground_truth_triples, pages_table
from kgforge.pipelines.flagship import run_flagship
from kgforge.reference import run_reference

N_PAGES = 300


@pytest.fixture(scope="module")
def corpus():
    return pages_table(N_PAGES)


@pytest.fixture(scope="module")
def oracle(corpus):
    return run_reference(corpus)


@pytest.fixture(scope="module")
def engine(corpus):
    pages_ds = rd.from_arrow(corpus)
    return run_flagship(pages_ds)


def test_byte_identical_extraction(engine, oracle):
    eng = {
        r["url_norm"]: r["extracted_text"]
        for r in engine.docs.select_columns(["url_norm", "extracted_text"]).take_all()
    }
    assert set(eng) == set(oracle.extracted)
    for u, text in oracle.extracted.items():
        assert eng[u] == text, f"extraction differs for {u}"


def test_neardup_decisions_match(engine, oracle):
    eng_kept = sorted(set(r["url_norm"] for r in engine.kept_docs.select_columns(["url_norm"]).take_all()))
    assert eng_kept == oracle.kept_urls


def test_triple_pr_vs_reference(engine, oracle):
    eng_rows = engine.triples.take_all()
    eng_set = {(r["subj"], r["pred"], r["obj"]) for r in eng_rows}
    ref_set = oracle.triple_set()
    tp = len(eng_set & ref_set)
    precision = tp / max(1, len(eng_set))
    recall = tp / max(1, len(ref_set))
    assert precision >= 0.95, f"precision {precision:.3f} vs reference"
    assert recall >= 0.95, f"recall {recall:.3f} vs reference"
    # in practice the sets should be identical
    assert eng_set == ref_set


def test_materialized_counts_match(engine, oracle):
    eng = pd.DataFrame(engine.triples.take_all())
    ref = oracle.triples_table().to_pandas()
    eng = eng.sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    ref = ref.sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(eng[["subj", "pred", "obj", "n_sources", "first_url"]], ref)


def test_output_sorted(engine):
    rows = engine.triples.take_all()
    keys = [(r["subj"], r["pred"], r["obj"]) for r in rows]
    assert keys == sorted(keys)


def test_gt_quality(oracle):
    gt = ground_truth_triples(N_PAGES)
    ref = oracle.triple_set()
    tp = len(ref & gt)
    assert tp / len(ref) > 0.85  # precision (ambiguous-alias links)
    assert tp / len(gt) > 0.95  # recall


def test_block_structure_invariance(corpus):
    """Flagship output must not depend on input block structure /
    parallelism (determinism under re-partitioning)."""
    import ray.data as rd

    from kgforge.pipelines.flagship import run_flagship

    a = run_flagship(rd.from_arrow(corpus).repartition(17)).triples.take_all()
    b = run_flagship(rd.from_arrow(corpus).repartition(3)).triples.take_all()
    assert a == b


def test_flagship_emits_literal_facts(engine, oracle):
    """RDF literal objects (VERDICT r1 missing #4): founded_in facts carry
    lit:<year> objects through extraction, linking and materialization —
    in BOTH the engine and the reference emitter."""
    eng_lits = {
        (r["subj"], r["pred"], r["obj"])
        for r in engine.triples.take_all()
        if r["obj"].startswith("lit:")
    }
    assert eng_lits, "no literal-valued triples materialized"
    assert all(p == "founded_in" for _, p, _ in eng_lits)
    ref_lits = {t for t in oracle.triple_set() if t[2].startswith("lit:")}
    assert eng_lits == ref_lits


def test_empty_corpus_flagship():
    """Edge probe (verify recipe): a 0-page corpus must flow through the
    whole pipeline — empty shuffle blocks are schema-less in Ray 2.49,
    so every stage needs its empty-input guard."""
    from kgforge.corpus import pages_dataset
    from kgforge.pipelines.flagship import run_flagship

    res = run_flagship(pages_dataset(0, parallelism=2))
    assert res.docs.count() == 0
    assert res.triples.count() == 0


def test_tiny_slice_flagship():
    """3-page slice starting mid-corpus (includes malformed-page rng)."""
    import ray.data as rd

    from kgforge.corpus import pages_table
    from kgforge.pipelines.flagship import run_flagship

    res = run_flagship(rd.from_arrow(pages_table(3, start=4)))
    assert res.docs.count() <= 3
    t = res.triples.to_pandas()
    assert list(t.columns) == ["subj", "pred", "obj", "n_sources", "first_url"]
