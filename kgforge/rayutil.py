"""Small Ray Data utilities shared across stages."""

from __future__ import annotations

import pyarrow as pa


def ensure_schema(ds, schema: pa.Schema):
    """Pin the DATASET-LEVEL schema after a hash shuffle.

    Ray 2.49's hash-shuffle operators emit EMPTY blocks with no schema
    for empty partitions ("Operator produced a RefBundle with a different
    schema" warnings); a downstream pyarrow/acero join then fails with
    "No match ... for key field reference" when it plans against the
    resulting schema. Mapping through a schema-pinning identity fixes
    what the PLANNER sees at negligible cost.

    CAVEAT: map_batches never invokes the fn for a 0-row block (the batch
    iterator yields nothing), so the empty BLOCKS themselves stay
    schema-less on disk/in the object store. Code that concatenates raw
    block tables (driver combines via ``to_arrow_refs``) must drop
    0-row tables itself before ``pa.concat_tables``."""

    def f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return schema.empty_table()
        return t.select(schema.names).cast(schema)

    return ds.map_batches(f, batch_format="pyarrow")


def drop_empty_blocks(ds):
    """Physically remove 0-row blocks from a (materialized) Dataset.

    The schema-less empty blocks Ray 2.49 hash shuffles emit crash a
    downstream acero hash join even when ``ensure_schema`` has pinned the
    dataset-level schema, because the empty BLOCKS themselves still reach
    the join (map_batches never touches 0-row blocks). Filtering by BLOCK
    METADATA costs no data movement — num_rows is driver-side metadata;
    the block payloads are never fetched."""
    import ray.data as rd

    mat = ds.materialize()
    refs = [
        ref
        for bundle in mat.iter_internal_ref_bundles()
        for ref, md in bundle.blocks
        if md.num_rows != 0
    ]
    if refs:
        return rd.from_arrow_refs(refs)
    # ALL blocks are 0-row: returning mat would keep exactly the
    # schema-less empty blocks this helper exists to remove, so rebuild
    # one empty block from the dataset-level schema (falling back to mat
    # only when no Arrow schema is recoverable)
    sch = mat.schema(fetch_if_missing=False)
    base = getattr(sch, "base_schema", None) if sch is not None else None
    if isinstance(base, pa.Schema):
        return rd.from_arrow(base.empty_table())
    return mat


#: inputs below this row count keep the floor partition count — Ray
#: 2.49's hash join/aggregate operators carry a multi-second FIXED cost
#: per partition in local mode, so small inputs want few partitions
JOIN_SCALE_ROWS = 200_000


def join_partitions(n_rows: int | None = None, floor: int = 8) -> int:
    """Partition count for hash joins and hash shuffles.

    Two forces pull in opposite directions: per-partition fixed cost
    (Ray 2.49 joins/aggregates pay seconds of setup per partition, so
    sf0.01-scale inputs want the floor) and DOWNSTREAM parallelism — a
    join's output has exactly ``num_partitions`` blocks, and map stages
    reading it schedule at most one task per block. The round-3 bench
    showed the failure mode: an 8-partition exact-dedup join capped every
    later stage of a 1.2M-doc flagship run at 8 of 32 cpus (the SvoLinker
    stage alone went 17.6 s → 171 s). Above ``JOIN_SCALE_ROWS`` rows the
    count scales to the cluster CPU count (capped at 64 — partitions are
    parallelism, not data placement; at real cluster sizes the cap keeps
    per-partition fixed costs bounded while 64-way block parallelism
    saturates downstream map stages that split blocks into batches).

    Override with ``KGFORGE_JOIN_PARTITIONS``; ``n_rows=None`` means
    "unknown, assume large"."""
    import os

    env = os.environ.get("KGFORGE_JOIN_PARTITIONS")
    if env:
        # ``0`` is the repo-wide "force the other plan" convention on the
        # KGFORGE_*_ROWS thresholds; there is no other plan here, so a
        # non-positive override falls through to the computed count
        # instead of handing Ray an invalid num_partitions.
        v = int(env)
        if v > 0:
            return v
    if n_rows is not None and n_rows < JOIN_SCALE_ROWS:
        return floor
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", floor))
    except Exception:
        cpus = floor
    return max(floor, min(cpus, 64))


def sever_plan(ds):
    """Rebuild a (materialized) Dataset from its raw Arrow block refs,
    discarding the logical plan.

    Iterative pipelines (label propagation) that fold a dataset back
    into itself via union re-NEST the logical plan every round even
    through ``materialize()``; planning cost then grows ~2× per round
    (measured: 0.2 s → 8 s by round 11). ``from_arrow_refs`` keeps the
    blocks in the object store (zero copy) and gives the next round a
    flat, single-source plan."""
    import ray.data as rd

    return rd.from_arrow_refs(ds.to_arrow_refs())
