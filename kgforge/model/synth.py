"""KB synthesis from a learned KBModel (SURVEY §2.K7) — the reference
tool's generate step, seeded + vectorized.

For each predicate: draw an out-degree sequence for fresh subjects and an
in-degree sequence for fresh objects from the learned histograms (scaled),
pair subject slots with a seeded permutation of object slots, drop
reflexive + duplicate pairs. Entity counts come from the scaled type
distribution; domain/range types from the learned domain_range table.

Per-predicate generation is independent → embarrassingly parallel (one
Ray task per predicate at real scale); the driver-side numpy here is the
small-model path, returned as a Dataset via ``from_arrow`` blocks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..extract_core import stable_u64


def _sample_degrees(rng: np.random.RandomState, hist: pd.DataFrame, n_slots_target: int) -> np.ndarray:
    """Draw degrees iid from the (degree, n_entities) histogram until the
    total fact count reaches the target; returns the degree sequence."""
    degrees = hist["degree"].to_numpy()
    weights = hist["n_entities"].to_numpy().astype(np.float64)
    probs = weights / weights.sum()
    mean_deg = float((degrees * probs).sum())
    n_draw = max(1, int(np.ceil(n_slots_target / max(mean_deg, 1e-9) * 1.3)) + 8)
    seq = rng.choice(degrees, size=n_draw, p=probs)
    cum = np.cumsum(seq)
    cut = int(np.searchsorted(cum, n_slots_target))
    seq = seq[: cut + 1]
    if len(seq) == 0:
        seq = np.array([n_slots_target], dtype=np.int64)
    # trim the last entity's degree so totals match exactly
    overshoot = int(seq.sum()) - n_slots_target
    if overshoot > 0:
        seq[-1] = max(1, seq[-1] - overshoot)
    return seq.astype(np.int64)


def synthesize(model: dict[str, pd.DataFrame], scale: float = 1.0, seed: int = 7):
    """model → synthetic triples Dataset (subj, pred, obj), distinct."""
    import ray.data as rd

    type_dist = model["type_dist"]
    domain_range = model["domain_range"]
    pred_freq = model["pred_freq"]
    degree_out = model["degree_out"]
    degree_in = model["degree_in"]

    # --- entities per type (K1 scaled) ---------------------------------
    ents_by_type: dict[str, np.ndarray] = {}
    for _, row in type_dist.iterrows():
        t = row["type_set"]
        n = max(1, int(round(row["n_entities"] * scale)))
        if t == "literal":
            # literal pool: synthetic lexical values (years), scaled
            ents_by_type[t] = np.array([f"lit:{1900 + (i % 199)}" for i in range(n)])
        else:
            ents_by_type[t] = np.array([f"syn_{t}_{i:07d}" for i in range(n)])

    tables: list[pa.Table] = []
    for _, prow in pred_freq.sort_values("pred").iterrows():
        pred = prow["pred"]
        n_target = max(1, int(round(prow["n_facts"] * scale)))
        dr = domain_range[domain_range["pred"] == pred]
        if dr.empty:
            continue
        h_out = degree_out[degree_out["pred"] == pred]
        h_in = degree_in[degree_in["pred"] == pred]
        if h_out.empty or h_in.empty:
            continue
        # sample the FULL domain/range distribution (round 2 — was the
        # dominant signature only): each (subj_type, obj_type) signature
        # receives its learned share of the predicate's fact budget
        dr = dr.sort_values(["subj_type", "obj_type"])
        dr_total = float(dr["n_facts"].sum())
        sig_frames: list[pd.DataFrame] = []
        for _, sig in dr.iterrows():
            share = sig["n_facts"] / dr_total
            n_sig = int(round(n_target * share))
            if n_sig < 1:
                continue
            s_pool = ents_by_type.get(sig["subj_type"])
            o_pool = ents_by_type.get(sig["obj_type"])
            if s_pool is None or o_pool is None:
                continue
            rng = np.random.RandomState(
                (seed + stable_u64(f"{pred}|{sig['subj_type']}|{sig['obj_type']}", "synth"))
                % (2**31)
            )
            out_seq = _sample_degrees(rng, h_out, n_sig)
            in_seq = _sample_degrees(rng, h_in, n_sig)
            subs = rng.choice(s_pool, size=len(out_seq), replace=len(out_seq) > len(s_pool))
            objs = rng.choice(o_pool, size=len(in_seq), replace=len(in_seq) > len(o_pool))
            s_slots = np.repeat(subs, out_seq)
            o_slots = np.repeat(objs, in_seq)
            n = min(len(s_slots), len(o_slots))
            s_slots, o_slots = s_slots[:n], o_slots[rng.permutation(len(o_slots))[:n]]
            keep = s_slots != o_slots  # non-reflexiveness (M2)
            sig_frames.append(pd.DataFrame({"subj": s_slots[keep], "obj": o_slots[keep]}))
        if not sig_frames:
            continue
        df = pd.concat(sig_frames, ignore_index=True).drop_duplicates()
        tables.append(
            pa.table(
                {
                    "subj": pa.array(df["subj"], pa.string()),
                    "pred": pa.array([pred] * len(df), pa.string()),
                    "obj": pa.array(df["obj"], pa.string()),
                }
            )
        )
    if not tables:
        empty = pa.table(
            {"subj": pa.array([], pa.string()), "pred": pa.array([], pa.string()), "obj": pa.array([], pa.string())}
        )
        return rd.from_arrow(empty)
    return rd.from_arrow(tables)


def synth_id_type(model: dict[str, pd.DataFrame], scale: float = 1.0) -> dict[str, str]:
    """Type lookup for synthesized entities (their type is embedded in the
    id: syn_{type}_{i}). ``scale`` must cover the scale the graph was
    synthesized at — ids beyond the enumerated range would silently type
    as 'unknown' in a learn→synth→learn loop."""
    out = {}
    mult = max(4.0, scale)  # ≥4× keeps small-scale lookups permissive
    for _, row in model["type_dist"].iterrows():
        t = row["type_set"]
        if t == "literal":
            continue  # lit:* ids are typed by prefix in _map_type_set
        n = max(1, int(round(row["n_entities"] * mult)))
        for i in range(n):
            out[f"syn_{t}_{i:07d}"] = t
    return out
