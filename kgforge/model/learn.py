"""KBModel learning (SURVEY §2.E1-E4, K1-K5): distribution histograms of a
triple graph, computed as Ray Data aggregates.

The reference KBModel's M1/M2 statistics map to:
  K1 type_dist     — entity-type frequency (types from the gazetteer)
  K2 pred_freq     — facts per predicate (relation distribution)
  K3 domain_range  — per-pred (subj_type, obj_type) fact counts
  K4 degree_hist   — per-pred out/in degree histograms + functionality /
                     inverse-functionality scalars (AMIE definition:
                     #distinct subjects / #facts)
  K5 pred_stats    — distinct-subject/object counts, reflexive fact count

All of these are groupby-aggregates over the (already-distinct) triples
Dataset; the first-level keys (pred, subj) / (pred, obj) are bounded by
the entity vocabulary, so the shuffles are small next to the corpus
stages. Entity→type lookups are broadcast maps, never joins.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count


def _ensure_cols(df: pd.DataFrame, cols: dict[str, str]) -> pd.DataFrame:
    """Ray groupbys of EMPTY datasets come back schema-less — pin the
    expected columns so downstream column access never KeyErrors on an
    empty graph (all-filtered corpus is a legal input)."""
    if all(c in df.columns for c in cols):
        return df
    return pd.DataFrame({c: pd.Series(dtype=d) for c, d in cols.items()})


def pred_freq(triples_ds):
    """K2: (pred, n_facts)."""
    out = triples_ds.groupby("pred").aggregate(Count(alias_name="n_facts"))
    return out.select_columns(["pred", "n_facts"])


def degree_hist(triples_ds, direction: str = "out", bucket: str = "exact"):
    """K4: (pred, direction, degree, n_entities). degree of an entity under
    pred = #distinct counterpart entities (triples are already distinct).

    ``bucket``: "exact" keeps per-degree counts (engine default);
    "log2" buckets degrees to powers of two (degree column = bucket
    floor) — SURVEY §7.8 reconciliation slot in case the reference's
    histograms turn out to be bucketed; flip here, not at call sites."""
    key = "subj" if direction == "out" else "obj"
    lvl1 = triples_ds.groupby(["pred", key]).aggregate(Count(alias_name="degree"))

    def finish(t: pa.Table) -> pa.Table:
        deg = pc.cast(t["degree"], pa.int64())
        if bucket == "log2":
            import numpy as np

            arr = deg.to_numpy(zero_copy_only=False)
            deg = pa.array(
                np.power(2, np.floor(np.log2(np.maximum(arr, 1)))).astype("int64")
            )
        return t.set_column(t.schema.get_field_index("degree"), "degree", deg)

    bucketed = lvl1.map_batches(finish, batch_format="pyarrow")
    out = bucketed.groupby(["pred", "degree"]).aggregate(Count(alias_name="n_entities"))
    return out.map_batches(
        lambda t, d=direction: pa.table(
            {
                "pred": t["pred"],
                "direction": pa.array([d] * t.num_rows, pa.string()),
                "degree": pc.cast(t["degree"], pa.int64()),
                "n_entities": t["n_entities"],
            }
        ),
        batch_format="pyarrow",
    )


def type_set_str(types) -> str:
    """Canonical kbgen-M1 type-SET string: sorted, '|'-joined. Accepts a
    single type name or an iterable of them."""
    if isinstance(types, str):
        return types
    return "|".join(sorted(set(types)))


def _map_type_set(col: pa.ChunkedArray, id_type: dict) -> pa.Array:
    """entity column → canonical type-set string (broadcast map). Values
    of ``id_type`` may be a single type or a list/tuple/set of types —
    kbgen's M1 is a distribution over type SETS, so multi-typed entities
    produce 'a|b' keys rather than being collapsed to one type."""
    keys = pa.array(list(id_type.keys()), pa.string())
    vals = pa.array([type_set_str(v) for v in id_type.values()], pa.string())
    idx = pc.index_in(col, value_set=keys)
    mapped = pc.take(vals, idx)
    out = pc.if_else(pc.is_valid(idx), mapped, pa.scalar("unknown", pa.string()))
    # literal-valued objects ("lit:<lexical>") form their own type bucket
    return pc.if_else(
        pc.starts_with(col, "lit:"), pa.scalar("literal", pa.string()), out
    )


def type_dist(triples_ds, id_type: dict):
    """K1: (type_set, n_entities) over entities appearing in the graph —
    fully distributed: distinct entities via a groupby (never a driver
    ``unique()`` — the entity vocabulary of a real KG exceeds driver
    memory), type lookup as a broadcast map, final count by type_set."""
    subj = triples_ds.select_columns(["subj"]).map_batches(
        lambda t: pa.table({"entity": t["subj"]}), batch_format="pyarrow"
    )
    obj = triples_ds.select_columns(["obj"]).map_batches(
        lambda t: pa.table({"entity": t["obj"]}), batch_format="pyarrow"
    )
    ents = subj.union(obj).groupby("entity").aggregate(Count(alias_name="_n"))
    typed = ents.map_batches(
        lambda t, m=id_type: pa.table({"type_set": _map_type_set(t["entity"], m)}),
        batch_format="pyarrow",
    )
    df = _ensure_cols(
        typed.groupby("type_set").aggregate(Count(alias_name="n_entities")).to_pandas(),
        {"type_set": "str", "n_entities": "int64"},
    ).sort_values("type_set").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def domain_range(triples_ds, id_type: dict):
    """K3: (pred, subj_type, obj_type, n_facts) via broadcast type map
    (type-SET strings — multi-typed entities keep their full signature)."""
    typed = triples_ds.map_batches(
        lambda t, m=id_type: pa.table(
            {
                "pred": t["pred"],
                "subj_type": _map_type_set(t["subj"], m),
                "obj_type": _map_type_set(t["obj"], m),
            }
        ),
        batch_format="pyarrow",
    )
    return typed.groupby(["pred", "subj_type", "obj_type"]).aggregate(
        Count(alias_name="n_facts")
    )


def pred_stats(triples_ds):
    """K4/K5 scalars per predicate: n_facts, distinct subj/obj counts,
    functionality = n_subj/n_facts (AMIE definition, ∈ (0,1]), inverse
    functionality = n_obj/n_facts, reflexive count.

    Fully distributed (round 2 — was a driver ``to_pandas()`` of the
    whole graph): n_facts and n_reflexive are single groupby counts;
    distinct-subject/object counts are two-level groupbys (E2 pattern);
    only the |preds|-sized result frames reach the driver."""
    _ensure = _ensure_cols

    nf = _ensure(
        triples_ds.groupby("pred").aggregate(Count(alias_name="n_facts")).to_pandas(),
        {"pred": "str", "n_facts": "int64"},
    )

    def distinct_count(col: str, alias: str) -> pd.DataFrame:
        lvl1 = (
            triples_ds.select_columns(["pred", col])
            .groupby(["pred", col])
            .aggregate(Count(alias_name="_n"))
        )
        return _ensure(
            lvl1.groupby("pred").aggregate(Count(alias_name=alias)).to_pandas(),
            {"pred": "str", alias: "int64"},
        )

    ns = distinct_count("subj", "n_subj")
    no = distinct_count("obj", "n_obj")
    refl = _ensure(
        triples_ds.map_batches(
            lambda t: t.select(["pred"]).filter(pc.equal(t["subj"], t["obj"])),
            batch_format="pyarrow",
        )
        .groupby("pred")
        .aggregate(Count(alias_name="n_reflexive"))
        .to_pandas(),
        {"pred": "str", "n_reflexive": "int64"},
    )
    out = nf.merge(ns, on="pred").merge(no, on="pred").merge(refl, on="pred", how="left")
    out["n_reflexive"] = out["n_reflexive"].fillna(0).astype("int64")
    out = out.sort_values("pred").reset_index(drop=True)
    # standard AMIE functionality: #distinct subjects / #facts ∈ (0, 1]
    # (1.0 = strictly functional predicate); NOT mean out-degree
    out["functionality"] = (out["n_subj"] / out["n_facts"]).round(4)
    out["inv_functionality"] = (out["n_obj"] / out["n_facts"]).round(4)
    return out


#: canonical column schemas per model table — the SINGLE source shared by
#: the full learner below and the tiered learners (protocol.M1Learner), so
#: an empty-input frame pins the same schema in every tier
MODEL_TABLE_COLS: dict[str, dict[str, str]] = {
    "pred_freq": {"pred": "str", "n_facts": "int64"},
    "type_dist": {"type_set": "str", "n_entities": "int64"},
    "domain_range": {"pred": "str", "subj_type": "str", "obj_type": "str",
                     "n_facts": "int64"},
    "degree": {"pred": "str", "direction": "str", "degree": "int64",
               "n_entities": "int64"},
}


def model_frame(x, table: str) -> pd.DataFrame:
    """Dataset/frame → pandas frame with the table's canonical schema."""
    df = x if isinstance(x, pd.DataFrame) else x.to_pandas()
    return _ensure_cols(df, MODEL_TABLE_COLS[table])


def learn_model(triples_ds, id_type: dict[str, str]) -> dict[str, pd.DataFrame]:
    """Full KBModel: all histograms as small pandas frames (each is
    bounded by |preds| × |degree buckets|, tiny next to the graph)."""
    return {
        "pred_freq": model_frame(pred_freq(triples_ds), "pred_freq"),
        "degree_out": model_frame(degree_hist(triples_ds, "out"), "degree"),
        "degree_in": model_frame(degree_hist(triples_ds, "in"), "degree"),
        "type_dist": model_frame(type_dist(triples_ds, id_type), "type_dist"),
        "domain_range": model_frame(domain_range(triples_ds, id_type),
                                    "domain_range"),
        "pred_stats": pred_stats(triples_ds),
    }


def write_model(model: dict[str, pd.DataFrame], out_dir: str) -> None:
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    for name, df in model.items():
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), f"{out_dir}/{name}.parquet")


def read_model(model_dir: str) -> dict[str, pd.DataFrame]:
    """Read every histogram table present (model tiers write different
    subsets — J3 protocol)."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = {}
    for path in sorted(glob.glob(os.path.join(model_dir, "*.parquet"))):
        name = os.path.splitext(os.path.basename(path))[0]
        out[name] = pq.read_table(path).to_pandas()
    return out
