"""SVO extraction + mention detection + entity linking as an actor-pool
stage (SURVEY §2.B4-B8, C1-C3).

``SvoLinker`` is a callable CLASS for ``map_batches(SvoLinker,
concurrency=N)``: the compiled pattern bank and the alias gazetteer
(automaton + prototype embeddings) are built ONCE per actor in
``__init__`` — never per batch. The gazetteer is the broadcast small side
of the linking join (SURVEY §2.D1): pass ``resource_ref = ray.put(res)``
via ``fn_constructor_kwargs`` so the object ships through the object store
once per node, not once per task.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..extract_core import split_sentences
from ..nlp_core import (
    AliasResource,
    build_pattern_bank,
    build_screen_regex,
    ctx_embedding,
    detect_mentions,
    extract_svo,
    link_triple,
)


class SvoLinker:
    """docs(url_norm, extracted_text) → linked triples
    (url_norm, sent_idx, subj_id, pred, obj_id, link_score)."""

    def __init__(self, resource_ref=None, seed: int = 42):
        self.res = (
            ray.get(resource_ref) if resource_ref is not None else AliasResource.default(seed)
        )
        self.bank = build_pattern_bank()
        self.screen = build_screen_regex()  # sound fast-path (nlp_core)
        # canonicalize AT EMISSION (reference emitter step 6 keys triples
        # by canonical ids): two raw ids that merge under sameAs would
        # otherwise slip past the per-doc dedup below as distinct rows,
        # and the materialize combiner's (s,p,o,url)-distinct precondition
        # would silently break when those rows straddle a batch boundary.
        # Derived from the broadcast resource, once per actor.
        from .materialize import canonical_map_from_same_as

        cmap = canonical_map_from_same_as(self.res.same_as, list(self.res.id_type))
        self.cmap = {k: v for k, v in cmap.items() if k != v}

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url_norm"].to_pylist()
        texts = batch["extracted_text"].to_pylist()
        o_url: list[str] = []
        o_sent: list[int] = []
        o_s: list[str] = []
        o_p: list[str] = []
        o_o: list[str] = []
        o_score: list[float] = []
        for u, text in zip(urls, texts):
            # per-doc (s,p,o) dedup at emission: the reference emitter
            # collapses a triple repeated within one doc into one source
            # url (set semantics, reference/emitter.py step 6), and the
            # materialize combiner's within-batch distinct relies on
            # (s,p,o,url) being globally unique — which only per-doc
            # dedup here can guarantee once blocks re-chunk downstream.
            seen_spo: set[tuple[str, str, str]] = set()
            for si, sent in enumerate(split_sentences(text)):
                svo = extract_svo(sent, self.bank, self.screen)
                if svo is None:
                    continue
                linked = link_triple(svo[0], svo[1], svo[2], sent, self.res)
                if linked is None:
                    continue
                s_id, pred, obj_id, score = linked
                s_id = self.cmap.get(s_id, s_id)
                obj_id = self.cmap.get(obj_id, obj_id)
                if (s_id, pred, obj_id) in seen_spo:
                    continue
                seen_spo.add((s_id, pred, obj_id))
                o_url.append(u)
                o_sent.append(si)
                o_s.append(s_id)
                o_p.append(pred)
                o_o.append(obj_id)
                o_score.append(score)
        return pa.table(
            {
                "url_norm": pa.array(o_url, pa.string()),
                "sent_idx": pa.array(o_sent, pa.int32()),
                "subj_id": pa.array(o_s, pa.string()),
                "pred": pa.array(o_p, pa.string()),
                "obj_id": pa.array(o_o, pa.string()),
                "link_score": pa.array(o_score, pa.float32()),
            }
        )


class MentionDetector:
    """Standalone batched mention detection (SURVEY §2.B6): docs → mentions
    (url_norm, sent_idx, surface, start, end, ctx_embedding[64])."""

    def __init__(self, resource_ref=None, seed: int = 42):
        self.res = (
            ray.get(resource_ref) if resource_ref is not None else AliasResource.default(seed)
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url_norm"].to_pylist()
        texts = batch["extracted_text"].to_pylist()
        o_url, o_sent, o_surf, o_start, o_end, o_emb = [], [], [], [], [], []
        for u, text in zip(urls, texts):
            for si, sent in enumerate(split_sentences(text)):
                ms = detect_mentions(sent, self.res)
                if not ms:
                    continue
                emb = ctx_embedding(sent)
                for surf, start, end in ms:
                    o_url.append(u)
                    o_sent.append(si)
                    o_surf.append(surf)
                    o_start.append(start)
                    o_end.append(end)
                    o_emb.append(emb)
        return pa.table(
            {
                "url_norm": pa.array(o_url, pa.string()),
                "sent_idx": pa.array(o_sent, pa.int32()),
                "surface": pa.array(o_surf, pa.string()),
                "start": pa.array(o_start, pa.int32()),
                "end": pa.array(o_end, pa.int32()),
                "ctx_embedding": pa.array(
                    [np.asarray(e, dtype=np.float32) for e in o_emb],
                    pa.list_(pa.float32(), 64),
                ),
            }
        )


def link_docs(docs_ds, resource_ref=None, concurrency=(2, 8), batch_size: int = 128,
              num_gpus: float = 0):
    """Actor-pool stage: stateful setup amortized across batches.
    ``num_gpus`` is the GPU-backed-pool slot (BASELINE.json north_star):
    pass num_gpus=1 and swap the linker's scorer for a GPU model — the
    actor signature and batching are already shaped for it (this sandbox
    has no GPU, so the default is CPU)."""
    kwargs = dict(
        fn_constructor_kwargs={"resource_ref": resource_ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    if num_gpus:
        kwargs["num_gpus"] = num_gpus
    else:
        kwargs["num_cpus"] = 1
    return docs_ds.select_columns(["url_norm", "extracted_text"]).map_batches(
        SvoLinker, **kwargs
    )


def entity_prior(docs_ds, res: AliasResource) -> dict[str, int]:
    """Distributed corpus prior: per-batch unambiguous-mention counts
    (vectorized partials, one (entity, n) row per entity per batch),
    combined on the driver (entity vocabulary is small — the broadcast
    side by construction)."""
    import pyarrow as _pa

    def partial(batch: _pa.Table) -> _pa.Table:
        from ..nlp_core import unambiguous_mention_counts

        acc: dict[str, int] = {}
        for text in batch["extracted_text"].to_pylist():
            for eid, n in unambiguous_mention_counts(text, res).items():
                acc[eid] = acc.get(eid, 0) + n
        items = sorted(acc.items())
        return _pa.table(
            {
                "entity_id": _pa.array([k for k, _ in items], _pa.string()),
                "n": _pa.array([v for _, v in items], _pa.int64()),
            }
        )

    prior: dict[str, int] = {}
    parts = docs_ds.select_columns(["extracted_text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    for b in parts.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for eid, n in zip(b["entity_id"].to_pylist(), b["n"].to_pylist()):
            prior[eid] = prior.get(eid, 0) + n
    return prior


def detect_mentions_ds(docs_ds, resource_ref=None, concurrency=(2, 8), batch_size: int = 128):
    return docs_ds.select_columns(["url_norm", "extracted_text"]).map_batches(
        MentionDetector,
        fn_constructor_kwargs={"resource_ref": resource_ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
