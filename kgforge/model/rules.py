"""Horn-rule mining + replay (SURVEY §2.K6 — the reference's M3 layer).

The reference consumes externally-mined AMIE rules; here we mine the
same *shape* of rule natively (AMIE-lite) and replay them during
synthesis so rule-correlated facts co-occur:

  mine:   rules  p(X,Y) ⇒ q(X,Y)   and   p(X,Y) ⇒ q(Y,X)
          support = |p ∧ q|, confidence = |p ∧ q| / |p|
  replay: for each synthesized fact p(x,y), add q(x,y) (or q(y,x))
          with probability = confidence (seeded, deterministic).

Mining runs on the driver over the (already-distinct, entity-bounded)
triples — the cluster-scale formulation is a self-join of the triple
table on (subj, obj) keyed by predicate pairs, which this reproduces
exactly on the collected pairs.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..extract_core import stable_u64


def mine_rules(
    triples_ds, min_support: int = 5, min_confidence: float = 0.5
) -> pd.DataFrame:
    """triples → rules(body_pred, head_pred, inverse, support, confidence)."""
    df = triples_ds.select_columns(["subj", "pred", "obj"]).to_pandas()
    by_pred: dict[str, set[tuple[str, str]]] = {
        p: set(zip(g["subj"], g["obj"])) for p, g in df.groupby("pred")
    }
    rows = []
    preds = sorted(by_pred)
    for p in preds:
        pairs = by_pred[p]
        inv_pairs = {(b, a) for a, b in pairs}
        for q in preds:
            if p == q:
                continue
            qp = by_pred[q]
            for inverse, body in ((False, pairs), (True, inv_pairs)):
                supp = len(body & qp)
                if supp >= min_support:
                    conf = supp / len(pairs)
                    if conf >= min_confidence:
                        rows.append(
                            {
                                "body_pred": p,
                                "head_pred": q,
                                "inverse": inverse,
                                "support": supp,
                                "confidence": round(conf, 4),
                            }
                        )
    return pd.DataFrame(
        rows, columns=["body_pred", "head_pred", "inverse", "support", "confidence"]
    )


def replay_rules(triples_ds, rules: pd.DataFrame, seed: int = 7):
    """Apply rules to a synthesized graph: a batch transform that emits,
    per input fact matching a rule body, the head fact with probability =
    confidence (per-fact seeded coin → deterministic under re-execution
    and independent of batching). Output = input ∪ derived, distinct."""
    if rules.empty:
        return triples_ds
    rule_list = list(rules.itertuples(index=False))

    def derive(t: pa.Table) -> pa.Table:
        subs = t["subj"].to_pylist()
        preds = t["pred"].to_pylist()
        objs = t["obj"].to_pylist()
        o_s, o_p, o_o = list(subs), list(preds), list(objs)
        for r in rule_list:
            for s, p, o in zip(subs, preds, objs):
                if p != r.body_pred:
                    continue
                coin = stable_u64(f"{s}|{p}|{o}|{r.head_pred}|{r.inverse}", f"rule{seed}")
                if (coin % 10_000) / 10_000.0 < r.confidence:
                    if r.inverse:
                        o_s.append(o)
                        o_o.append(s)
                    else:
                        o_s.append(s)
                        o_o.append(o)
                    o_p.append(r.head_pred)
        return pa.table(
            {
                "subj": pa.array(o_s, pa.string()),
                "pred": pa.array(o_p, pa.string()),
                "obj": pa.array(o_o, pa.string()),
            }
        )

    from ray.data.aggregate import Count

    out = triples_ds.map_batches(derive, batch_format="pyarrow")
    # distinct: within-batch arrow group_by first (combiner), then a small
    # global aggregate — vectorized, no per-group Python
    out = out.map_batches(
        lambda t: t.group_by(["subj", "pred", "obj"]).aggregate([]),
        batch_format="pyarrow",
    )
    dedup = out.groupby(["subj", "pred", "obj"]).aggregate(Count(alias_name="_n"))
    return dedup.drop_columns(["_n"])
