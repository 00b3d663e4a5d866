"""KBModel learn/synthesize tests (SURVEY §5.4.4): histogram correctness
vs a pandas recomputation and the learn→synth→learn distribution fit."""

from __future__ import annotations

import pandas as pd
import pytest
import ray.data as rd

from kgforge.corpus import pages_table
from kgforge.model.learn import degree_hist, learn_model, pred_freq, pred_stats
from kgforge.model.synth import synthesize
from kgforge.nlp_core import AliasResource
from kgforge.reference import run_reference


@pytest.fixture(scope="module")
def triples():
    res = run_reference(pages_table(300))
    return rd.from_arrow(res.triples_table()).materialize()


@pytest.fixture(scope="module")
def tdf(triples):
    return triples.to_pandas()


def test_pred_freq_matches_pandas(triples, tdf):
    got = pred_freq(triples).to_pandas().sort_values("pred").reset_index(drop=True)
    want = tdf.groupby("pred").size().reset_index(name="n_facts").sort_values("pred").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_degree_hist_matches_pandas(triples, tdf):
    got = (
        degree_hist(triples, "out").to_pandas()
        .sort_values(["pred", "degree"]).reset_index(drop=True)
    )
    deg = tdf.groupby(["pred", "subj"]).size().reset_index(name="degree")
    want = (
        deg.groupby(["pred", "degree"]).size().reset_index(name="n_entities")
        .assign(direction="out")[["pred", "direction", "degree", "n_entities"]]
        .sort_values(["pred", "degree"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_pred_stats_functionality(triples, tdf):
    st = pred_stats(triples).set_index("pred")
    for pred, grp in tdf.groupby("pred"):
        assert st.loc[pred, "n_facts"] == len(grp)
        assert st.loc[pred, "n_subj"] == grp["subj"].nunique()
        assert st.loc[pred, "n_reflexive"] == 0
        # AMIE functionality: #distinct subjects / #facts, in (0, 1]
        want_f = round(grp["subj"].nunique() / len(grp), 4)
        assert st.loc[pred, "functionality"] == want_f
        assert 0 < st.loc[pred, "functionality"] <= 1.0


def _tv(p: pd.Series, q: pd.Series) -> float:
    return 0.5 * (p / p.sum() - q / q.sum()).abs().sum()


def test_learn_synth_learn_roundtrip(triples):
    model = learn_model(triples, AliasResource.default().id_type)
    syn = synthesize(model, scale=1.0, seed=7)
    pf2 = pred_freq(syn).to_pandas()
    m = model["pred_freq"].merge(pf2, on="pred", how="outer", suffixes=("_o", "_s")).fillna(0)
    assert _tv(m["n_facts_o"], m["n_facts_s"]) < 0.05
    d1 = model["degree_out"]
    d2 = degree_hist(syn, "out").to_pandas()
    mm = d1.merge(d2, on=["pred", "degree"], how="outer", suffixes=("_o", "_s")).fillna(0)
    assert _tv(mm["n_entities_o"], mm["n_entities_s"]) < 0.2


def test_synth_is_deterministic(triples):
    model = learn_model(triples, AliasResource.default().id_type)
    a = synthesize(model, scale=1.0, seed=7).to_pandas().sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    b = synthesize(model, scale=1.0, seed=7).to_pandas().sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_synth_scales(triples):
    model = learn_model(triples, AliasResource.default().id_type)
    n1 = synthesize(model, scale=1.0, seed=7).count()
    n2 = synthesize(model, scale=2.0, seed=7).count()
    assert 1.5 * n1 < n2 < 2.5 * n1


def test_type_dist_multi_type_sets():
    """kbgen M1 is a distribution over type SETS (VERDICT r1): multi-typed
    entities must emit sorted 'a|b' keys, not collapse to one type."""
    import pyarrow as pa
    import ray.data as rd

    from kgforge.model.learn import type_dist

    t = pa.table({
        "subj": pa.array(["e1", "e2"], pa.string()),
        "pred": pa.array(["p", "p"], pa.string()),
        "obj": pa.array(["e3", "e3"], pa.string()),
    })
    id_type = {"e1": ["person", "employee"], "e2": "person", "e3": ("org", "company")}
    out = type_dist(rd.from_arrow(t), id_type).to_pandas()
    got = dict(zip(out["type_set"], out["n_entities"]))
    assert got == {"employee|person": 1, "person": 1, "company|org": 1}


def test_model_learner_protocol_tiers():
    """J3: the kbgen model tiers (M1/M2/M3) behind one pluggable
    ModelLearner protocol + registry."""
    import pyarrow as pa
    import ray.data as rd

    from kgforge.model.protocol import (
        M3Learner,
        ModelLearner,
        get_learner,
        register_learner,
        registered_learners,
    )

    assert registered_learners() == ["m1", "m2", "m3"]
    t = pa.table({
        "subj": pa.array([f"a{i%7}" for i in range(40)], pa.string()),
        "pred": pa.array(["p" if i % 2 else "q" for i in range(40)], pa.string()),
        "obj": pa.array([f"b{i%5}" for i in range(40)], pa.string()),
    })
    triples = rd.from_arrow(t)
    # distinct rows only (graph semantics)
    import pandas as pd
    triples = rd.from_arrow(pa.Table.from_pandas(
        t.to_pandas().drop_duplicates(), preserve_index=False))
    id_type = {f"a{i}": "ta" for i in range(7)} | {f"b{i}": "tb" for i in range(5)}

    for tier in ("m1", "m2", "m3"):
        learner = get_learner(tier)
        assert isinstance(learner, ModelLearner)
        model = learner.learn(triples, id_type)
        syn = learner.synthesize(model, scale=1.0, seed=7)
        assert syn.count() > 0, tier
    assert "rules" in get_learner("m3").learn(triples, id_type)

    # external AMIE rules slot into the same tier
    amie = "?a  <p>  ?b   => ?a  <q>  ?b\t0.9\t0.9\t0.95\t12\n"
    m3x = M3Learner(rules_source=amie)
    model = m3x.learn(triples, id_type)
    assert list(model["rules"]["body_pred"]) == ["p"]

    # custom learners can be registered (and shadow built-ins)
    class Custom:
        name = "custom"
        def learn(self, triples_ds, id_type):
            return get_learner("m2").learn(triples_ds, id_type)
        def synthesize(self, model, scale=1.0, seed=7):
            return get_learner("m2").synthesize(model, scale, seed)

    register_learner(Custom())
    assert "custom" in registered_learners()


def test_degree_hist_log2_bucketing():
    """SURVEY §7.8: bucketed degree histograms ready for reference
    reconciliation — log2 buckets partition the same entity mass."""
    import pyarrow as pa
    import ray.data as rd

    from kgforge.model.learn import degree_hist

    t = pa.table({
        "subj": pa.array(sum([[f"s{i}"] * (i + 1) for i in range(9)], []), pa.string()),
        "pred": pa.array(["p"] * 45, pa.string()),
        "obj": pa.array([f"o{j}" for j in range(45)], pa.string()),
    })
    ds = rd.from_arrow(t)
    exact = degree_hist(ds, "out").to_pandas()
    log2 = degree_hist(ds, "out", bucket="log2").to_pandas()
    assert exact["n_entities"].sum() == log2["n_entities"].sum() == 9
    assert set(log2["degree"]) <= {1, 2, 4, 8}
    # s8 has degree 9 → bucket 8
    assert 8 in set(log2["degree"])


def test_pred_stats_empty_graph():
    """All-filtered corpus → zero triples is a legal input; pred_stats
    must return an empty frame, not KeyError on Ray's schema-less empty
    aggregate output."""
    import pyarrow as pa
    import ray.data as rd

    from kgforge.model.learn import pred_stats

    empty = rd.from_arrow(pa.table({"subj": pa.array([], pa.string()),
                                    "pred": pa.array([], pa.string()),
                                    "obj": pa.array([], pa.string())}))
    out = pred_stats(empty)
    assert len(out) == 0
    assert set(out.columns) >= {"pred", "n_facts", "n_subj", "n_obj"}


def test_m1_learner_empty_graph():
    """M1's degenerate degree frame is built from the (empty) predicate
    list; an empty graph must yield an empty model, not KeyError on the
    zero-column DataFrame."""
    import pyarrow as pa
    import ray.data as rd

    from kgforge.model.protocol import get_learner

    empty = rd.from_arrow(pa.table({"subj": pa.array([], pa.string()),
                                    "pred": pa.array([], pa.string()),
                                    "obj": pa.array([], pa.string())}))
    model = get_learner("m1").learn(empty, {})
    assert len(model["pred_freq"]) == 0
    assert len(model["degree_out"]) == 0 and len(model["degree_in"]) == 0
    assert list(model["degree_out"].columns) == ["pred", "direction", "degree", "n_entities"]


def test_mine_rules_empty_graph():
    """All-filtered corpus → empty graph is a legal input everywhere in
    model/: mine_rules must return an empty frame, not KeyError (this is
    the default CLI tier: python -m kgforge.model learn --tier m3)."""
    import pyarrow as pa
    import ray.data as rd

    from kgforge.model.rules import mine_rules

    empty = rd.from_arrow(pa.table({"subj": pa.array([], pa.string()),
                                    "pred": pa.array([], pa.string()),
                                    "obj": pa.array([], pa.string())}))
    out = mine_rules(empty, min_support=3, min_confidence=0.3)
    assert len(out) == 0
    assert list(out.columns) == ["body_pred", "head_pred", "inverse",
                                 "support", "confidence"]
