"""End-to-end web-corpus curation pipeline (task brief: the
LLM-training-data path as a first-class composition):

    lang-ID filter → quality filter → exact dedup (content-keyed,
    keep min id) → MinHash-LSH near-dup drop (keep cluster min) →
    CCNet paragraph dedup → token packing

Every stage is the library operator it names (textops / dedup_ops), so
the pipeline inherits each operator's scale shape: filters are
vectorized ``map_batches``, dedup passes move hashes not text, the
near-dup drop set and paragraph winner map broadcast once, and packing
is batch-local.  Stages materialize between steps so the per-stage
row counts in ``stats`` are metadata reads, not re-executions.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Sum

from kgforge.dedup_ops import (
    content_hashes,
    exact_dedup_filter,
    incremental_dedup_filter,
    paragraph_dedup,
)
from kgforge.steps.dedup import apply_drop_ds, neardup_drop_ds
from kgforge.textops import add_lang_id, add_quality, pack_sequences


@dataclass
class CurationResult:
    docs: Dataset                 # curated (id, text, n_dropped_paragraphs)
    packed: Dataset | None        # fixed-length token sequences (if pack=True)
    new_index: Dataset | None = None  # (h1, h2) content index of this shard's
    # survivors — persist it and pass the union back as known_hashes on the
    # next shard to make the pipeline corpus-incremental
    stats: dict[str, Any] = field(default_factory=dict)


def curate_corpus(
    ds: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.35,
    neardup_threshold: float = 0.7,
    neardup_path: str | None = None,
    known_hashes: Dataset | None = None,
    seq_len: int = 1024,
    pack: bool = True,
) -> CurationResult:
    stats: dict[str, Any] = {"input_docs": ds.count()}

    # 1. language filter (n-gram heuristic lang-ID, vectorized filter)
    lang_arr = pa.array(list(langs), pa.string())
    cur = add_lang_id(ds, text_col).map_batches(
        lambda t: t.filter(pc.is_in(t["lang_pred"], value_set=lang_arr)),
        batch_format="pyarrow",
    )

    # 2. quality filter (length/punct/stopword/distinct composite score)
    cur = add_quality(cur, text_col).map_batches(
        lambda t: t.filter(pc.greater_equal(t["quality_score"], min_quality)),
        batch_format="pyarrow",
    )
    cur = cur.select_columns([id_col, text_col]).materialize()
    stats["after_lang_quality"] = cur.count()

    # 3. exact dedup: one survivor (min id) per distinct text
    cur = exact_dedup_filter(cur, id_col, text_col).materialize()
    stats["after_exact_dedup"] = cur.count()

    # 3b. cross-run dedup against the persisted corpus index (daily
    #     shard mode): content already ingested by a PRIOR run drops;
    #     the survivors' index is returned for the next shard
    if known_hashes is not None:
        cur = incremental_dedup_filter(cur, known_hashes, text_col=text_col).materialize()
        stats["after_incremental_dedup"] = cur.count()

    # 4. near-dup drop via the flagship's auto-switching LSH engine
    #    (steps/dedup.neardup_drop_set): driver collision scan at bench
    #    scale, fully distributed band-groupby → join-verify →
    #    cc_label_propagation above KGFORGE_NEARDUP_DIST_ROWS.  The
    #    engine keeps each cluster's min STRING member, so integer ids
    #    are zero-padded to 20 decimal digits first — string order then
    #    equals numeric order and the numerically-smallest id survives.
    id_is_int = (
        stats["after_exact_dedup"] > 0
        and pa.types.is_integer(cur.schema().base_schema.field(id_col).type)
    )

    def _key(t: pa.Table) -> pa.Array:
        if not id_is_int:
            return pc.cast(t[id_col], pa.string())
        # order-preserving int64→uint64 shift (+2^63, wrapping) THEN the
        # 20-digit zero pad: plain zero-padding breaks on negative ids
        # ('...-6' > '...-5' as strings, but -6 < -5)
        import numpy as np

        v = t[id_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        with np.errstate(over="ignore"):
            u = v.view(np.uint64) + np.uint64(1 << 63)
        return pa.array(np.char.zfill(u.astype("U20"), 20), pa.string())

    def to_engine(t: pa.Table) -> pa.Table:
        return pa.table({"url_norm": _key(t), "extracted_text": t[text_col]})

    # drop_empty_blocks: upstream filters can leave 0-row blocks whose
    # schema the LSH engine's verify join would choke on (rayutil note)
    from kgforge.rayutil import drop_empty_blocks

    engine_docs = drop_empty_blocks(
        cur.map_batches(to_engine, batch_format="pyarrow")
    )
    drop_ds = neardup_drop_ds(engine_docs, neardup_path, threshold=neardup_threshold)
    n_dropped = drop_ds.count()
    if n_dropped:
        # the drop side stays a Dataset: apply_drop_ds broadcasts small
        # drop sides and bloom+anti-joins big ones (never a driver set
        # above the threshold) — keyed on the same engine key column
        keyed = cur.map_batches(
            lambda t: t.append_column("__nd_key", _key(t)), batch_format="pyarrow"
        )
        cur = apply_drop_ds(
            keyed, drop_ds, key_col="__nd_key", drop_key="url_norm"
        ).map_batches(
            lambda t: t.drop_columns(["__nd_key"]), batch_format="pyarrow"
        )
    cur = cur.materialize()
    stats["after_neardup"] = cur.count()
    stats["neardup_dropped"] = n_dropped

    # the shard's contribution to the corpus index: survivors' ORIGINAL
    # text (stage 3b checks pre-paragraph-rewrite content)
    shard_index = content_hashes(cur, text_col).materialize()

    # 5. paragraph-level boilerplate dedup (text never leaves its block)
    cur = paragraph_dedup(cur, id_col, text_col).materialize()
    dropped = cur.aggregate(Sum("n_dropped_paragraphs", alias_name="s"))
    stats["paragraphs_dropped"] = int(dropped["s"] or 0)

    packed = None
    if pack:
        packed = pack_sequences(cur, text_col, seq_len=seq_len).materialize()
        stats["packed_sequences"] = packed.count()
        stats["packed_tokens"] = stats["packed_sequences"] * seq_len

    return CurationResult(docs=cur, packed=packed, new_index=shard_index, stats=stats)
