"""End-to-end web-corpus curation pipeline (task brief: the
LLM-training-data path as a first-class composition):

    lang-ID filter → quality filter → exact dedup (content-keyed,
    keep min id) → MinHash-LSH near-dup drop (keep cluster min) →
    CCNet paragraph dedup → token packing

Every stage is the library operator it names (textops / dedup_ops), so
the pipeline inherits each operator's scale shape: filters are
vectorized ``map_batches``, dedup passes move hashes not text, the
near-dup drop set and paragraph winner map broadcast once, and packing
is batch-local.

``stats`` picks the materialization policy:

- ``"auto"`` (default, round-5): ``"counts"`` when the input's row
  count is ALREADY known without execution (materialized / parquet
  metadata) and at most KGFORGE_CURATION_COUNTS_ROWS (default 2M) —
  auditing a bench-sized shard is nearly free; ``"none"`` otherwise,
  so a caller who doesn't pass ``stats`` gets the scale-safe plan by
  default instead of ~10 corpus-wide materialize pins.
- ``"counts"``: every stage materializes so the per-stage row counts in
  ``stats`` are metadata reads, not re-executions — right for bench
  scale and for operating a shard you want audited.
- ``"none"`` (the 100-TB streaming configuration): the corpus is pinned
  ONLY at genuine multi-consumer forks (before near-dup, whose engine
  consumes the docs more than once; after near-dup when the survivor
  index forks off; after paragraph dedup when ``pack=True`` forks
  docs/packed).  Everything else streams stage-to-stage with
  backpressure instead of pinning ~6 corpus-wide intermediates in the
  object store.  Counts that are FREE anyway still land in ``stats``:
  metadata reads of the fork pins, plus drop-count arithmetic
  (``after_neardup = before - neardup_dropped`` — ids are unique after
  exact dedup, so each drop key removes exactly one row).
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

#: stats='auto' runs counting mode only at or below this many input rows
#: (and only when the count is metadata-known); override via
#: KGFORGE_CURATION_COUNTS_ROWS
CURATION_COUNTS_ROWS = 2_000_000


@dataclass
class CurationResult:
    docs: Dataset                 # curated (id, text, n_dropped_paragraphs)
    packed: Dataset | None        # fixed-length token sequences (if pack=True)
    new_index: Dataset | None = None  # (h1, h2) content index of this shard's
    # survivors — persist it and pass the union back as known_hashes on the
    # next shard to make the pipeline corpus-incremental
    stats: dict[str, Any] = field(default_factory=dict)


def lang_quality_filter(
    ds: Dataset,
    text_col: str = "text",
    *,
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.35,
) -> Dataset:
    """Stages 1+2 of the curation pipeline as a standalone operator:
    n-gram lang-ID allow-list filter, then the composite quality-score
    threshold — both vectorized ``map_batches`` filters.  Exposed
    separately so the checkpointed shard CLI (``kgforge.curate
    --partitions``) can run it per input partition with a ledger row,
    then feed ``curate_corpus(..., skip_filters=True)``."""
    lang_arr = pa.array(list(langs), pa.string())
    cur = add_lang_id(ds, text_col).map_batches(
        lambda t: t.filter(pc.is_in(t["lang_pred"], value_set=lang_arr)),
        batch_format="pyarrow",
    )
    return add_quality(cur, text_col).map_batches(
        lambda t: t.filter(pc.greater_equal(t["quality_score"], min_quality)),
        batch_format="pyarrow",
    )


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
    stats: str = "auto",
    skip_filters: bool = False,
    repetition: "bool | dict" = False,
    decontam_benchmark=None,
    decontam_ngram: int = 13,
    max_per_domain: int | None = None,
    url_col: str = "url",
    redact_pii: bool = False,
    semdedup_threshold: float | None = None,
    semdedup_clusters: int | None = None,
    semdedup_encoder: str = "hashed_bow",
    quality_model=None,
    quality_model_threshold: float = 0.5,
    perplexity_lm=None,
    max_perplexity: float | None = None,
    substring_dedup_ngram: int | None = None,
) -> CurationResult:
    """Optional hygiene stages (all off by default, each the library
    operator it names): ``repetition`` (True = Gopher Table A1
    thresholds, or a thresholds dict) drops repetitious docs;
    ``decontam_benchmark`` (list[str] / Dataset / precomputed hash
    array) removes eval-set n-gram overlaps; ``max_per_domain`` caps
    docs per site (requires ``url_col`` on the input; ranked by
    quality_score when the filters ran here, else a seeded hash
    sample).  All three are per-doc / broadcast stages — no extra
    corpus shuffle.

    ``semdedup_threshold`` enables the SemDeDup semantic near-dup stage
    after the LSH drop: docs are embedded through the pluggable
    ``semdedup_encoder`` (encoder protocol; hashed BoW by default, a
    learned model on clusters that have one), clustered, and
    within-cluster cosine near-identicals above the threshold dropped
    (deterministic min-id keeper).  Only a THIN (id, embedding) table
    moves through the clustering; the drop ids come back through the
    same Bloom-gated ``apply_drop_ds`` the LSH stage uses, so the wide
    rows never shuffle and cost scales with the drop rate.

    ``quality_model`` (a ``qualityclf.QualityModel``) adds the
    CCNet/GPT-3-style learned seed-vs-web filter after the heuristic
    filters: docs scoring below ``quality_model_threshold`` drop.  One
    vectorized ``map_batches`` — the model is a broadcast-sized weight
    vector, no shuffle.

    ``perplexity_lm`` + ``max_perplexity`` (an ``ngramlm.NgramLM``
    trained on a trusted reference corpus) add the CCNet-style fluency
    filter: docs whose stupid-backoff pseudo-perplexity exceeds the
    threshold drop.  Also one ``map_batches``; the model's count
    arrays broadcast once via ``ray.put``."""
    if stats not in ("auto", "counts", "none"):
        raise ValueError(f"unknown stats mode {stats!r} (auto|counts|none)")
    if stats == "auto":
        import os

        # counts only when the input's row count is already known WITHOUT
        # executing its lineage (materialized / from_arrow / parquet
        # metadata) and small; a lazy or large input streams — the
        # scale-safe plan must be the default, not opt-in (VERDICT r4 #3)
        try:
            n_meta = ds._meta_count()
        except Exception:
            n_meta = None
        limit = int(
            os.environ.get("KGFORGE_CURATION_COUNTS_ROWS", CURATION_COUNTS_ROWS)
        )
        stats = "counts" if (n_meta is not None and n_meta <= limit) else "none"
    counting = stats == "counts"
    st: dict[str, Any] = {"stats_mode": stats}
    if counting:
        st["input_docs"] = ds.count()

    # id dtype probe from the INPUT schema (the id column passes through
    # every stage unchanged) — works in streaming mode and on corpora
    # the filters empty out, where the post-filter schema may be gone.
    # from_pandas datasets carry a PandasBlockSchema (numpy dtypes, no
    # .field) instead of an Arrow schema — probe both shapes
    in_schema = ds.schema()
    base = getattr(in_schema, "base_schema", None)
    if isinstance(base, pa.Schema):
        id_is_int = pa.types.is_integer(base.field(id_col).type)
    elif in_schema is not None and id_col in list(in_schema.names):
        import numpy as _np

        t = dict(zip(in_schema.names, in_schema.types))[id_col]
        id_is_int = (
            pa.types.is_integer(t)
            if isinstance(t, pa.DataType)
            else _np.issubdtype(_np.dtype(t), _np.integer)
        )
    else:
        id_is_int = False

    # 1+2. lang-ID + quality filters (skip_filters=True when the input
    # is already the checkpointed output of lang_quality_filter)
    cur = ds if skip_filters else lang_quality_filter(
        ds, text_col, langs=langs, min_quality=min_quality
    )
    # thin projection up front; url (and the rank column) ride along
    # only while the domain quota needs them
    cap_order = None if skip_filters else "quality_score"
    if max_per_domain is not None:
        keep_cols = [id_col, text_col, url_col]
        if cap_order is not None:
            keep_cols.append(cap_order)
        # dedupe: url_col may coincide with another kept column (e.g. a
        # corpus whose id IS its url) — a duplicate name crashes the
        # projection
        cur = cur.select_columns(list(dict.fromkeys(keep_cols)))
    else:
        cur = cur.select_columns([id_col, text_col])
    if counting:
        cur = cur.materialize()
        st["after_lang_quality"] = cur.count()

    # 2a'. learned quality filter (seed-vs-web logistic regression)
    if quality_model is not None:
        from kgforge.qualityclf import quality_classifier_filter

        cur = quality_classifier_filter(
            cur, quality_model, quality_model_threshold, text_col
        )
        if counting:
            cur = cur.materialize()
            st["after_quality_model"] = cur.count()

    # 2a''. LM fluency filter (stupid-backoff pseudo-perplexity)
    if perplexity_lm is not None:
        if max_perplexity is None:
            raise ValueError("perplexity_lm requires max_perplexity")
        from kgforge.ngramlm import perplexity_filter

        cur = perplexity_filter(cur, perplexity_lm, max_perplexity, text_col)
        if counting:
            cur = cur.materialize()
            st["after_perplexity"] = cur.count()

    # 2b. per-domain quota, ranked by the quality score the filters
    # just computed (seeded-hash sample on pre-filtered inputs)
    if max_per_domain is not None:
        from kgforge.domainops import domain_cap

        if not counting:
            # fork pin: domain_cap consumes its input twice (thin
            # candidate pass + loser anti-join) — streaming mode must
            # not re-execute the lang/quality filters per consumer
            cur = cur.materialize()
        cur = domain_cap(
            cur, max_per_domain,
            url_col=url_col, id_col=id_col, order_col=cap_order,
        ).select_columns([id_col, text_col])
        if counting:
            cur = cur.materialize()
            st["after_domain_cap"] = cur.count()

    # 2c. within-doc repetition rules (Gopher Table A1)
    if repetition:
        from kgforge.repetition import gopher_repetition_filter

        cur = gopher_repetition_filter(
            cur, text_col,
            thresholds=None if repetition is True else repetition,
        )
        if counting:
            cur = cur.materialize()
            st["after_repetition"] = cur.count()

    # 2c'. PII scrub (emails/ips/phones → placeholder tokens) BEFORE
    # any content hashing, so dedup keys see the redacted text and two
    # docs differing only in a scrubbed email dedupe together
    if redact_pii:
        from kgforge.pii import redact_pii as _redact

        cur = _redact(cur, text_col)

    # 2d. eval-benchmark decontamination (broadcast n-gram overlap)
    if decontam_benchmark is not None:
        from kgforge.decontam import decontaminate

        cur = decontaminate(
            cur, decontam_benchmark, text_col=text_col, n=decontam_ngram
        )
        if counting:
            cur = cur.materialize()
            st["after_decontam"] = cur.count()

    # 3. exact dedup: one survivor (min id) per distinct text
    cur = exact_dedup_filter(cur, id_col, text_col)
    if counting:
        cur = cur.materialize()
        st["after_exact_dedup"] = cur.count()

    # 3b. cross-run dedup against the persisted corpus index (daily
    #     shard mode): content already ingested by a PRIOR run drops;
    #     the survivors' index is returned for the next shard
    if known_hashes is not None:
        cur = incremental_dedup_filter(cur, known_hashes, text_col=text_col)
        if counting:
            cur = cur.materialize()
            st["after_incremental_dedup"] = cur.count()
    if not counting:
        # streaming mode's ONE pre-dedup pin: the near-dup engine
        # consumes the corpus more than once (band build + verify +
        # drop application) — without this the whole upstream lineage
        # re-executes per consumer.  The pin makes this stage's count a
        # FREE metadata read — record it even in streaming mode
        cur = cur.materialize()
        st[
            "after_incremental_dedup" if known_hashes is not None
            else "after_exact_dedup"
        ] = cur.count()

    # 4. near-dup drop via the flagship's auto-switching LSH engine
    #    (steps/dedup.neardup_drop_set): driver collision scan at bench
    #    scale, fully distributed band-groupby → join-verify →
    #    cc_label_propagation above KGFORGE_NEARDUP_DIST_ROWS.  The
    #    engine keeps each cluster's min STRING member, so integer ids
    #    are zero-padded to 20 decimal digits first — string order then
    #    equals numeric order and the numerically-smallest id survives.
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
    st["neardup_dropped"] = n_dropped
    if counting:
        cur = cur.materialize()
        st["after_neardup"] = cur.count()
    else:
        # free drop-count arithmetic: one row per drop key. Exact: ids
        # are unique at this point for any well-formed corpus (dedup
        # keeps one survivor per content key). A corpus that reuses one
        # id across DIFFERENT texts can keep both and this audit stat
        # overstates survivors by the collision count — counting mode
        # (stats='counts') measures the truth if that matters
        pre = st.get("after_incremental_dedup", st.get("after_exact_dedup"))
        if pre is not None:
            st["after_neardup"] = pre - n_dropped
        if n_dropped:
            # fork pin: the survivor index AND paragraph dedup both
            # consume the post-neardup corpus (apply_drop_ds pinned its
            # keyed input, but re-running the anti-join per consumer is
            # still a shuffle)
            cur = cur.materialize()

    # 4b. SemDeDup semantic near-dup drop: embed a THIN (id, text)
    #     projection via the encoder protocol, cluster + greedy-scan the
    #     (id, embedding) table (semantic_dedup_drops materializes its
    #     own input once), then anti-join the drop ids back — the wide
    #     rows never enter the clustering shuffle.  cur is materialized
    #     on every path reaching here, so the two consumers (embed pass
    #     + drop application) never re-execute upstream lineage.
    if semdedup_threshold is not None:
        from kgforge.encoder import embed_texts
        from kgforge.semdedup import semantic_dedup_drops

        thin = embed_texts(
            cur.select_columns([id_col, text_col]), text_col,
            encoder=semdedup_encoder,
        ).select_columns([id_col, "embedding"])
        # pin the drop side: count() here and apply_drop_ds's internal
        # materialize are two consumers — unpinned, the clustering
        # shuffle and greedy scan would execute twice
        sem_drops = semantic_dedup_drops(
            thin, semdedup_threshold,
            n_clusters=semdedup_clusters, id_col=id_col,
        ).materialize()
        n_sem = sem_drops.count()
        if n_sem:
            cur = apply_drop_ds(cur, sem_drops, key_col=id_col)
        st["semdedup_dropped"] = n_sem
        if counting:
            cur = cur.materialize()
            st["after_semdedup"] = cur.count()
        else:
            if st.get("after_neardup") is not None:
                st["after_semdedup"] = st["after_neardup"] - n_sem
            if n_sem:
                # fork pin: survivor index + paragraph dedup both consume
                # the post-semdedup corpus
                cur = cur.materialize()

    # the shard's contribution to the corpus index: survivors' ORIGINAL
    # text (stage 3b checks pre-paragraph-rewrite content)
    shard_index = content_hashes(cur, text_col)
    if counting:
        shard_index = shard_index.materialize()

    # 5. paragraph-level boilerplate dedup (text never leaves its block)
    cur = paragraph_dedup(cur, id_col, text_col)
    if counting:
        cur = cur.materialize()
        dropped = cur.aggregate(Sum("n_dropped_paragraphs", alias_name="s"))
        st["paragraphs_dropped"] = int(dropped["s"] or 0)

    # 5b. exact substring (duplicated-span) dedup: Lee-et-al-style first
    #     occurrence keeps, every other occurrence of a repeated n-token
    #     span is cut — catches boilerplate runs that are not
    #     paragraph-aligned.  Runs AFTER paragraph dedup (smaller input)
    #     and after the survivor index (3b identity is pre-rewrite text);
    #     substring_dedup pins its own input, so streaming mode is safe.
    if substring_dedup_ngram is not None:
        from kgforge.spandedup import substring_dedup

        cur = substring_dedup(cur, id_col, text_col, n=substring_dedup_ngram)
        if counting:
            cur = cur.materialize()
            cut = cur.aggregate(Sum("n_dropped_chars", alias_name="s"))
            st["substring_chars_dropped"] = int(cut["s"] or 0)

    packed = None
    if pack:
        if not counting:
            # fork pin: docs and packed both derive from the paragraph
            # output — the smallest corpus the pipeline ever holds
            cur = cur.materialize()
        packed = pack_sequences(cur, text_col, seq_len=seq_len)
        if counting:
            packed = packed.materialize()
            st["packed_sequences"] = packed.count()
            st["packed_tokens"] = st["packed_sequences"] * seq_len

    return CurationResult(docs=cur, packed=packed, new_index=shard_index, stats=st)
