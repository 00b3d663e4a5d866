"""Canonicalization + graph materialization (SURVEY §2.D2, E6-E7, F1,
§4.3).

Canonical-map application is a broadcast map join (the sameAs component
map is tiny next to the triple stream). Materialization is the headline
shuffle: a two-level aggregate — per-batch partial dedup/counts inside
``map_batches`` (the combiner), then a global ``groupby(subj, pred, obj)``
over the MUCH smaller partials, then the final deterministic sort. The
partial level is what keeps Zipf head triples from exploding any single
reducer: a head triple occurring in 10^5 docs arrives at the reducer as
one row per upstream batch, not one row per doc (SURVEY §4.3 — this is
salting by physical batch rather than by an explicit salt column; the
equality test vs the unsalted path is in tests/).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Min, Sum

from ..dedup_core import UnionFind


def canonical_map_from_same_as(same_as: list[tuple[str, str]], all_ids: list[str]) -> dict[str, str]:
    """Union-find over sameAs edges → entity_id → canon_id (min member)."""
    uf = UnionFind()
    for a, b in same_as:
        uf.union(a, b)
    return {eid: uf.find(eid) for eid in all_ids}


def apply_canonical_map(linked_ds, cmap: dict[str, str]):
    """D2 as a broadcast map join: dictionary-encode via pyarrow, no
    shuffle. cmap is small (only entities with a sameAs edge need entries —
    identity mappings can be omitted)."""
    non_identity = {k: v for k, v in cmap.items() if k != v}
    if not non_identity:
        return linked_ds
    keys = pa.array(list(non_identity.keys()), pa.string())
    vals = pa.array(list(non_identity.values()), pa.string())

    def _apply(t: pa.Table) -> pa.Table:
        out = {}
        for col, name in (("subj_id", "subj_id"), ("obj_id", "obj_id")):
            idx = pc.index_in(t[col], value_set=keys)
            mapped = pc.take(vals, idx)
            out[name] = pc.if_else(pc.is_valid(idx), mapped, t[col])
        t = t.set_column(t.schema.get_field_index("subj_id"), "subj_id", out["subj_id"])
        t = t.set_column(t.schema.get_field_index("obj_id"), "obj_id", out["obj_id"])
        return t

    return linked_ds.map_batches(_apply, batch_format="pyarrow")


def _partial_agg(t: pa.Table) -> pa.Table:
    """Combiner (E7): within-batch distinct (s,p,o,url) → one partial row
    per (s,p,o) with partial n_sources + min url.

    PRECONDITION: (s,p,o,url) is globally distinct in the input. The
    SvoLinker guarantees it by deduping CANONICAL (s,p,o) per doc at
    emission (canonicalization happens inside the linker, so a sameAs
    merge cannot re-create duplicate quads afterwards; a doc's url
    appears in exactly one upstream row, and downstream re-chunking can
    otherwise split a doc's repeated triples across batch boundaries,
    double-counting its url in n_sources). Callers whose input cannot
    guarantee this must pass ``quads_distinct=False`` to
    materialize_triples, which inserts a global distinct first."""
    if t.num_rows == 0:
        return pa.table(
            {
                "subj": pa.array([], pa.string()),
                "pred": pa.array([], pa.string()),
                "obj": pa.array([], pa.string()),
                "partial_sources": pa.array([], pa.int64()),
                "partial_first_url": pa.array([], pa.string()),
            }
        )
    quad = t.select(["subj_id", "pred", "obj_id", "url_norm"]).group_by(
        ["subj_id", "pred", "obj_id", "url_norm"]
    ).aggregate([])  # distinct quads
    out = quad.group_by(["subj_id", "pred", "obj_id"]).aggregate(
        [("url_norm", "count"), ("url_norm", "min")]
    )
    return pa.table(
        {
            "subj": out["subj_id"],
            "pred": out["pred"],
            "obj": out["obj_id"],
            "partial_sources": out["url_norm_count"],
            "partial_first_url": out["url_norm_min"],
        }
    )


def materialize_triples(linked_ds, small_sort_threshold: int | None = None,
                        quads_distinct: bool = True):
    """E6+E7+F1: linked triples → final distinct sorted graph
    (subj, pred, obj, n_sources, first_url).

    ``quads_distinct=False`` inserts a global (s,p,o,url) distinct (one
    extra shuffle of thin key rows) for inputs that cannot guarantee the
    combiner's precondition — e.g. raw linked rows canonicalized OUTSIDE
    the linker, where a sameAs merge can produce the same quad in two
    different blocks and Sum would double-count its url in n_sources.
    The flagship path guarantees the precondition (SvoLinker emits
    canonical per-doc-distinct triples) and keeps the default.

    The aggregate is materialized (it is the final product; the sort
    would materialize it anyway). When the distinct-triple count is
    small the global Sort operator is pure fixed all-to-all overhead
    (sampling + range exchange to order a few hundred rows), so sort
    the gathered Arrow table on the driver instead; above the
    threshold the distributed range sort runs as before. The 1M-row
    default bounds the driver gather at ~60 MB (5 short columns); a
    10^12-doc run has billions of partial rows and always takes the
    distributed branch.  ``small_sort_threshold=None`` reads
    KGFORGE_MATERIALIZE_SORT_ROWS (default 1M) so a deployment — or the
    forced-distributed bench configuration — can flip the plan without
    code changes."""
    import os

    import ray

    if small_sort_threshold is None:
        small_sort_threshold = int(
            os.environ.get("KGFORGE_MATERIALIZE_SORT_ROWS", 1_000_000)
        )

    if not quads_distinct:
        from ray.data.aggregate import Count

        from ..rayutil import ensure_schema

        quads = linked_ds.map_batches(
            # within-batch distinct first so the shuffle moves unique
            # quads per batch, not every raw row
            lambda t: t.select(["subj_id", "pred", "obj_id", "url_norm"]).group_by(
                ["subj_id", "pred", "obj_id", "url_norm"]
            ).aggregate([]),
            batch_format="pyarrow",
        ).groupby(["subj_id", "pred", "obj_id", "url_norm"]).aggregate(
            Count(alias_name="__n")  # distinct via groupby; count discarded
        )
        # ensure_schema also PROJECTS to the four quad columns (drops __n)
        linked_ds = ensure_schema(
            quads,
            pa.schema([("subj_id", pa.string()), ("pred", pa.string()),
                       ("obj_id", pa.string()), ("url_norm", pa.string())]),
        )

    partial = linked_ds.map_batches(_partial_agg, batch_format="pyarrow").materialize()
    if partial.count() <= small_sort_threshold:
        # Final combine on the driver: the partials ARE the two-level
        # aggregate's shuffle input (one row per (s,p,o) per batch —
        # counts, never documents), so when they are small the hash
        # Aggregate + range Sort operators are pure fixed all-to-all
        # overhead (~2-3 s in Ray 2.49 local mode, BASELINE.md log).
        # Gathering them is the blessed small-side pattern; semantics
        # are identical and equality-tested vs the distributed path.
        # drop 0-row blocks before concat: map_batches never calls the fn
        # for an empty block (the batch iterator yields nothing), so a
        # schema-less empty shuffle block sails through BOTH ensure_schema
        # and _partial_agg untouched and concat_tables then rejects the
        # 0-column schema
        tabs = [b for b in ray.get(partial.to_arrow_refs()) if b.num_rows > 0]
        t = pa.concat_tables(tabs) if tabs else _partial_agg(
            pa.table({"subj_id": pa.array([], pa.string()),
                      "pred": pa.array([], pa.string()),
                      "obj_id": pa.array([], pa.string()),
                      "url_norm": pa.array([], pa.string())})
        )
        out = t.group_by(["subj", "pred", "obj"]).aggregate(
            [("partial_sources", "sum"), ("partial_first_url", "min")]
        )
        out = out.select(
            ["subj", "pred", "obj", "partial_sources_sum", "partial_first_url_min"]
        ).rename_columns(["subj", "pred", "obj", "n_sources", "first_url"])
        out = out.sort_by(
            [("subj", "ascending"), ("pred", "ascending"), ("obj", "ascending")]
        )
        return ray.data.from_arrow(out)
    agg = partial.groupby(["subj", "pred", "obj"]).aggregate(
        Sum("partial_sources", alias_name="n_sources"),
        Min("partial_first_url", alias_name="first_url"),
    )
    return agg.sort(["subj", "pred", "obj"])
