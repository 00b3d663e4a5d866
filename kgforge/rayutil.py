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


def fsl_pack_specs(schema: pa.Schema | None) -> list[tuple[str, pa.DataType, int]]:
    """(name, value_type, list_size) for every fixed-size-list column of
    primitive values — the columns acero hash joins REJECT as non-key
    payload ("Data type fixed_size_list<...> is not supported in join
    non-key field").  Paired with ``fsl_pack``/``fsl_unpack`` so such
    columns (minhash band keys, embeddings) ride through a join as
    fixed_size_binary, which acero accepts.  Accepts a pyarrow Schema or
    Ray's Schema wrapper (whose ``base_schema`` is the Arrow one)."""
    if schema is not None and not isinstance(schema, pa.Schema):
        schema = getattr(schema, "base_schema", None)
    if not isinstance(schema, pa.Schema):
        return []
    return [
        (f.name, f.type.value_type, f.type.list_size)
        for f in schema
        if pa.types.is_fixed_size_list(f.type)
        and pa.types.is_primitive(f.type.value_type)
        # bool children are bit-packed — the byte-width math below
        # doesn't apply (and no such column exists in this repo)
        and f.type.value_type.bit_width >= 8
    ]


def fsl_pack(t: pa.Table, specs) -> pa.Table:
    """fixed_size_list<v, k> columns → fixed_size_binary(k·itemsize),
    zero-copy over the child values buffer (null rows keep their
    validity; their value slots exist by FixedSizeList construction)."""
    import numpy as np

    for name, vtype, width in specs:
        if name not in t.column_names:
            continue
        col = t[name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        nbytes = width * vtype.bit_width // 8
        flat = (
            col.values.slice(col.offset * width, len(col) * width)
            .to_numpy(zero_copy_only=False)
        )
        bufs = [None, pa.py_buffer(flat.tobytes())]
        if col.null_count:
            # bool array data buffer IS a packed validity bitmap
            bufs[0] = pa.array(
                col.is_valid().to_numpy(zero_copy_only=False)
            ).buffers()[1]
        packed = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(nbytes), len(col), bufs, null_count=col.null_count
        )
        t = t.set_column(t.column_names.index(name), name, packed)
    return t


def fsl_unpack(t: pa.Table, specs) -> pa.Table:
    """Inverse of ``fsl_pack``: fixed_size_binary blobs back to their
    fixed_size_list<v, k> columns (same name, same position)."""
    import numpy as np

    for name, vtype, width in specs:
        if name not in t.column_names:
            continue
        col = t[name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        dtype = np.dtype(vtype.to_pandas_dtype())
        buf = col.buffers()[1]
        flat = np.frombuffer(buf, dtype=dtype)[
            col.offset * width : (col.offset + len(col)) * width
        ]
        values = pa.array(flat, vtype)
        fsl_type = pa.list_(vtype, width)
        bufs = [None]
        if col.null_count:
            bufs[0] = pa.array(
                col.is_valid().to_numpy(zero_copy_only=False)
            ).buffers()[1]
            unpacked = pa.Array.from_buffers(
                fsl_type, len(col), bufs, null_count=col.null_count,
                children=[values],
            )
        else:
            unpacked = pa.FixedSizeListArray.from_arrays(values, width)
        t = t.set_column(t.column_names.index(name), name, unpacked)
    return t


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
