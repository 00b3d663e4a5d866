"""Horn-rule mining + replay (K6 / reference M3)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

from kgforge.model.rules import mine_rules, replay_rules


def _graph_with_rule(n=100, conf=0.8):
    """p(x,y) for all i; q(x,y) for the first conf·n — embeds p ⇒ q."""
    subs, preds, objs = [], [], []
    for i in range(n):
        subs.append(f"a{i:03d}")
        preds.append("p")
        objs.append(f"b{i:03d}")
    for i in range(int(n * conf)):
        subs.append(f"a{i:03d}")
        preds.append("q")
        objs.append(f"b{i:03d}")
    # inverse rule: r(y,x) for half the p pairs
    for i in range(n // 2):
        subs.append(f"b{i:03d}")
        preds.append("r")
        objs.append(f"a{i:03d}")
    return pa.table({"subj": subs, "pred": preds, "obj": objs})


def test_mine_finds_embedded_rules():
    ds = rd.from_arrow(_graph_with_rule())
    rules = mine_rules(ds, min_support=5, min_confidence=0.4)
    as_dict = {
        (r.body_pred, r.head_pred, r.inverse): r.confidence
        for r in rules.itertuples(index=False)
    }
    assert as_dict[("p", "q", False)] == 0.8
    assert as_dict[("p", "r", True)] == 0.5
    # q ⇒ p holds with confidence 1.0 (q pairs are a subset of p)
    assert as_dict[("q", "p", False)] == 1.0


def test_replay_correlates_facts():
    base = pa.table(
        {
            "subj": [f"x{i}" for i in range(200)],
            "pred": ["p"] * 200,
            "obj": [f"y{i}" for i in range(200)],
        }
    )
    rules = pd.DataFrame(
        [{"body_pred": "p", "head_pred": "q", "inverse": False, "support": 10, "confidence": 0.7}]
    )
    out = replay_rules(rd.from_arrow(base), rules, seed=7).to_pandas()
    q = out[out["pred"] == "q"]
    assert 0.55 <= len(q) / 200 <= 0.85  # ≈ confidence
    # every derived q(x,y) has its body p(x,y)
    p_pairs = set(zip(base["subj"].to_pylist(), base["obj"].to_pylist()))
    assert all((s, o) in p_pairs for s, o in zip(q["subj"], q["obj"]))


def test_replay_deterministic():
    base = _graph_with_rule(50)
    rules = pd.DataFrame(
        [{"body_pred": "p", "head_pred": "z", "inverse": False, "support": 5, "confidence": 0.5}]
    )
    a = replay_rules(rd.from_arrow(base), rules).to_pandas().sort_values(
        ["subj", "pred", "obj"]
    ).reset_index(drop=True)
    b = replay_rules(rd.from_arrow(base), rules).to_pandas().sort_values(
        ["subj", "pred", "obj"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_parse_amie_rules_roundtrip(tmp_path):
    """K6/M3 parity (VERDICT r1): an externally-mined AMIE-format rule
    file parses into the same frame shape mine_rules emits and replays
    through the same engine."""
    from kgforge.model.rules import parse_amie_rules

    amie = (
        "Rule\tHead Coverage\tStd Confidence\tPCA Confidence\tPositive Examples\n"
        "?a  <works_for>  ?b   => ?a  <employed_by>  ?b\t0.8\t0.75\t0.9\t42\n"
        "?a  <has_child>  ?b   => ?b  <has_parent>  ?a\t0.7\t0.6\t0.85\t17\n"
        "?a  <p1>  ?b ?b <p2> ?c  => ?a  <p3>  ?c\t0.5\t0.5\t0.5\t5\n"  # multi-atom: skipped
        "# comment line\n"
    )
    path = tmp_path / "rules.tsv"
    path.write_text(amie)
    rules = parse_amie_rules(str(path))
    assert list(rules.columns) == ["body_pred", "head_pred", "inverse", "support", "confidence"]
    assert len(rules) == 2
    fwd = rules[rules.body_pred == "works_for"].iloc[0]
    assert fwd.head_pred == "employed_by" and not fwd.inverse
    assert fwd.confidence == 0.9 and fwd.support == 42
    inv = rules[rules.body_pred == "has_child"].iloc[0]
    assert inv.head_pred == "has_parent" and inv.inverse

    # replay: a works_for fact derives an employed_by fact (conf 0.9 → most coins hit)
    import pyarrow as pa
    import ray.data as rd

    from kgforge.model.rules import replay_rules

    base = pa.table({
        "subj": pa.array([f"e{i}" for i in range(30)], pa.string()),
        "pred": pa.array(["works_for"] * 30, pa.string()),
        "obj": pa.array([f"o{i}" for i in range(30)], pa.string()),
    })
    out = replay_rules(rd.from_arrow(base), rules).to_pandas()
    derived = out[out["pred"] == "employed_by"]
    assert 15 < len(derived) <= 30  # ~90% of 30, seeded-deterministic
    # deterministic under re-execution
    out2 = replay_rules(rd.from_arrow(base), rules).to_pandas()
    a = out.sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    b = out2.sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    assert a.equals(b)


def test_parse_amie_rules_missing_file_raises(tmp_path):
    import pytest

    from kgforge.model.rules import parse_amie_rules

    with pytest.raises(FileNotFoundError):
        parse_amie_rules(str(tmp_path / "nope.tsv"))
