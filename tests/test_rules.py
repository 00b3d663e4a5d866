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
