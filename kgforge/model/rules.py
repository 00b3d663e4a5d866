"""Horn-rule mining + replay (SURVEY §2.K6 — the reference's M3 layer).

The reference consumes externally-mined AMIE rules; here we mine the
same *shape* of rule natively (AMIE-lite) and replay them during
synthesis so rule-correlated facts co-occur:

  mine:   rules  p(X,Y) ⇒ q(X,Y)   and   p(X,Y) ⇒ q(Y,X)
          support = |p ∧ q|, confidence = |p ∧ q| / |p|
  replay: for each synthesized fact p(x,y), add q(x,y) (or q(y,x))
          with probability = confidence (seeded, deterministic).

Mining is the distributed self-join of the triple table on its entity
pair, expressed as a single groupby over the UNORDERED pair key (round
2 — was a driver collect): all predicates touching the same {x, y}
meet in one group, each group emits its (body, head, inverse)
co-occurrence rows, and a global aggregate sums support. Only the
|preds|²-bounded rule candidates reach the driver.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..extract_core import stable_u64


def mine_rules(
    triples_ds, min_support: int = 5, min_confidence: float = 0.5
) -> pd.DataFrame:
    """triples → rules(body_pred, head_pred, inverse, support, confidence).

    support(p⇒q, fwd) = |{(s,o): p(s,o) ∧ q(s,o)}|; the inverse form
    matches q(o,s). Group key = unordered {s,o} with per-row orientation
    tag; within a group, same-orientation pred pairs are forward
    co-occurrences, opposite-orientation pairs are inverse ones (a
    reflexive s==o row counts as both, matching set semantics)."""
    from ray.data.aggregate import Count, Sum

    SEP = "\x1f"

    def pair_rows(t: pa.Table) -> pa.Table:
        subs = t["subj"].to_pylist()
        preds = t["pred"].to_pylist()
        objs = t["obj"].to_pylist()
        keys, dirs = [], []
        for s, o in zip(subs, objs):
            if s <= o:
                keys.append(f"{s}{SEP}{o}")
                dirs.append(0)
            else:
                keys.append(f"{o}{SEP}{s}")
                dirs.append(1)
        return pa.table(
            {
                "pkey": pa.array(keys, pa.string()),
                "dir": pa.array(dirs, pa.int32()),
                "pred": pa.array(preds, pa.string()),
            }
        )

    def cooccur(g: pa.Table) -> pa.Table:
        preds = g["pred"].to_pylist()
        dirs = g["dir"].to_pylist()
        reflexive = g["pkey"].to_pylist()[0].split(SEP)[0] == g["pkey"].to_pylist()[0].split(SEP)[1]
        d0 = {p for p, d in zip(preds, dirs) if d == 0}
        d1 = {p for p, d in zip(preds, dirs) if d == 1}
        if reflexive:
            d1 = set(d0)
        b_out, h_out, i_out = [], [], []
        for body_set, head_set, inv in (
            (d0, d0, False), (d1, d1, False),   # same orientation → forward
            (d0, d1, True), (d1, d0, True),     # opposite → inverse
        ):
            for p in body_set:
                for q in head_set:
                    if p == q:
                        continue
                    b_out.append(p)
                    h_out.append(q)
                    i_out.append(inv)
        if reflexive:
            # forward and inverse coincide on (s,s): the two same-orientation
            # passes double-emitted forward pairs — dedup within the group
            seen = set()
            bb, hh, ii = [], [], []
            for b, h, i in zip(b_out, h_out, i_out):
                if (b, h, i) in seen:
                    continue
                seen.add((b, h, i))
                bb.append(b)
                hh.append(h)
                ii.append(i)
            b_out, h_out, i_out = bb, hh, ii
        return pa.table(
            {
                "body_pred": pa.array(b_out, pa.string()),
                "head_pred": pa.array(h_out, pa.string()),
                "inverse": pa.array(i_out, pa.bool_()),
                "n": pa.array([1] * len(b_out), pa.int64()),
            }
        )

    pairs = triples_ds.select_columns(["subj", "pred", "obj"]).map_batches(
        pair_rows, batch_format="pyarrow"
    )
    from .learn import _ensure_cols

    supp = _ensure_cols(
        pairs.groupby("pkey")
        .map_groups(cooccur, batch_format="pyarrow")
        .groupby(["body_pred", "head_pred", "inverse"])
        .aggregate(Sum("n", alias_name="support"))
        .to_pandas(),
        {"body_pred": "str", "head_pred": "str", "inverse": "bool",
         "support": "int64"},
    )
    n_facts = _ensure_cols(
        triples_ds.groupby("pred").aggregate(Count(alias_name="n_pairs")).to_pandas(),
        {"pred": "str", "n_pairs": "int64"},
    )
    body_n = dict(zip(n_facts["pred"], n_facts["n_pairs"]))
    rows = []
    for r in supp.itertuples(index=False):
        if r.support < min_support:
            continue
        conf = r.support / body_n[r.body_pred]
        if conf >= min_confidence:
            rows.append(
                {
                    "body_pred": r.body_pred,
                    "head_pred": r.head_pred,
                    "inverse": bool(r.inverse),
                    "support": int(r.support),
                    "confidence": round(conf, 4),
                }
            )
    rows.sort(key=lambda x: (x["body_pred"], x["head_pred"], x["inverse"]))
    return pd.DataFrame(
        rows, columns=["body_pred", "head_pred", "inverse", "support", "confidence"]
    )


def parse_amie_rules(source: str, min_confidence: float = 0.0) -> pd.DataFrame:
    """Parse an externally-mined AMIE rule file (kbgen M3 parity: the
    reference consumes AMIE output rather than mining its own rules).

    Accepts a path or the file text. AMIE's TSV format is
    ``Rule<TAB>Head Coverage<TAB>Std Confidence<TAB>PCA Confidence<TAB>
    Positive Examples<TAB>...`` with rules like

        ?a  <worksFor>  ?b   => ?a  <employedBy>  ?b
        ?a  <hasChild>  ?b   => ?b  <hasParent>  ?a

    Only single-body-atom rules map onto the replay engine's
    (body_pred, head_pred, inverse) shape; multi-atom bodies are skipped.
    Returns the same frame schema as :func:`mine_rules`, so
    :func:`replay_rules` consumes either source unchanged."""
    import os
    import re

    text = source
    if "\n" not in source:
        # single-line input is a PATH, not rule text: a mistyped
        # --rules-file must fail loudly, not yield a silently rule-less
        # M3 model (inline rule text always contains a newline or '=>')
        if os.path.exists(source):
            with open(source) as f:
                text = f.read()
        elif "=>" not in source:
            raise FileNotFoundError(f"AMIE rule file not found: {source!r}")

    atom_re = re.compile(r"\?(\w+)\s+<?([^\s<>]+)>?\s+\?(\w+)")
    rows = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#") or line.lower().startswith("rule"):
            continue
        cols = line.split("\t")
        rule = cols[0]
        if "=>" not in rule:
            continue
        body_s, head_s = rule.split("=>", 1)
        body_atoms = atom_re.findall(body_s)
        head_atoms = atom_re.findall(head_s)
        if len(body_atoms) != 1 or len(head_atoms) != 1:
            continue  # multi-atom bodies don't fit the replay shape
        (bv1, bp, bv2), (hv1, hp, hv2) = body_atoms[0], head_atoms[0]
        if (hv1, hv2) == (bv1, bv2):
            inverse = False
        elif (hv1, hv2) == (bv2, bv1):
            inverse = True
        else:
            continue  # unbound head variable
        conf = 1.0
        support = 0
        # PCA confidence (col 3) preferred, std confidence (col 2) else
        for idx in (3, 2, 1):
            if len(cols) > idx:
                try:
                    conf = float(cols[idx])
                    break
                except ValueError:
                    continue
        if len(cols) > 4:
            try:
                support = int(float(cols[4]))
            except ValueError:
                support = 0
        if conf >= min_confidence:
            rows.append(
                {
                    "body_pred": bp,
                    "head_pred": hp,
                    "inverse": inverse,
                    "support": support,
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
