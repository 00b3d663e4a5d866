"""The flagship KG-construction pipeline (SURVEY §3.2):

pages → url_norm → exact dedup (shuffle: url_norm) → lang filter →
extract_text (stateless map_batches, html dropped) → minhash-LSH near-dup
(shuffle: band_key; union-find on driver) → SvoLinker actor pool
(broadcast gazetteer; emits CANONICAL ids — the sameAs map is applied
inside the actor, not as a separate pass) → two-level materialize
(shuffle: subj,pred,obj) → deterministic sort.

``run_flagship`` returns lazy Datasets; consume with write_parquet /
to_pandas / iter_batches. The extracted-docs Dataset is materialized once
at the branch point because it feeds two consumers (the LSH edge pass and
the linker); in the checkpointed CLI run (kgforge.run) the same role is
played by the per-partition docs parquet on disk.
"""

from __future__ import annotations

from dataclasses import dataclass

import ray

from ..nlp_core import AliasResource
from ..ontology import get_ontology
from ..steps.dedup import apply_drop_ds, neardup_drop_ds
from ..steps.extract import add_url_norm, exact_dedup, extract_docs, lang_filter
from ..steps.link import entity_prior, link_docs
from ..steps.materialize import canonical_map_from_same_as, materialize_triples


@dataclass
class FlagshipResult:
    docs: "ray.data.Dataset"  # extracted docs (post exact-dedup, lang filter)
    kept_docs: "ray.data.Dataset"  # post near-dup removal
    triples: "ray.data.Dataset"  # final sorted graph
    drop_ds: "ray.data.Dataset"  # near-dup url_norms dropped (one column)
    canonical_map: dict[str, str]


def build_docs(pages_ds, langs=("en",), bands: bool | None = None):
    """pages → extracted docs (B7 → B2 → B1 → G2).

    Extraction runs BEFORE exact dedup so the wide html column never
    crosses a shuffle (G2 only aggregates a thin key projection; the ~2%
    superseded re-crawls cost one redundant extraction each). The result
    is materialized: exact_dedup and every downstream consumer read the
    extracted docs more than once.

    ``bands=True`` (default — round-5 top ask) emits the minhash-LSH
    ``band_h`` keys in the SAME extraction kernel, so the near-dup
    engine's bands table is a zero-copy projection of pass 1 instead of
    a second full-corpus text read — one fewer corpus-wide pass on the
    memory-bandwidth-bound leg.  ``run_flagship`` drops the column from
    its result surfaces after the drop set is computed.

    ``bands=None`` reads KGFORGE_FUSED_BANDS (default on; ``0`` restores
    the separate band pass) — the same-session A/B lever for the
    scaling campaign."""
    import os

    if bands is None:
        bands = os.environ.get("KGFORGE_FUSED_BANDS", "1") != "0"
    ds = pages_ds.map_batches(add_url_norm, batch_format="pyarrow")
    ds = lang_filter(ds, langs)
    docs = extract_docs(ds, bands=bands).materialize()
    return exact_dedup(docs)


def run_flagship(
    pages_ds,
    seed: int = 42,
    resource: AliasResource | None = None,
    link_concurrency=(2, 8),
) -> FlagshipResult:
    res = resource or AliasResource.from_ontology(get_ontology(seed))
    # branch point (see module docstring); carries the fused band_h keys
    docs_b = build_docs(pages_ds).materialize()
    # drop side stays a Dataset end to end: below the corpus threshold
    # it is the (tiny) driver-plan result wrapped in one block, above it
    # the fully distributed labels — apply_drop_ds picks broadcast vs
    # bloom+anti-join by drop count (VERDICT r2 item 1)
    drop_ds = neardup_drop_ds(docs_b)
    # band_h served its purpose (the LSH bands table was its projection);
    # the result surfaces and the linker see the pre-fusion doc schema
    schema = docs_b.schema()
    fused = schema is not None and "band_h" in schema.names
    docs = docs_b.drop_columns(["band_h"]) if fused else docs_b
    # apply the drop set to the band-less projection: band_h would only
    # ride the bloom/anti-join shuffle (128 B/row + an fsl pack/unpack)
    # to be dropped right after
    kept = apply_drop_ds(docs, drop_ds)
    # corpus prior pass (unambiguous mention counts) → broadcast with the
    # gazetteer; breaks cosine ties toward the corpus-popular entity
    res = res.with_prior(entity_prior(kept, res))
    resource_ref = ray.put(res)  # broadcast once; actors ray.get in __init__
    linked = link_docs(kept, resource_ref=resource_ref, concurrency=link_concurrency)
    # SvoLinker canonicalizes ids AT EMISSION (from the same resource's
    # sameAs edges), so no apply_canonical_map pass runs here — linked
    # rows already carry canonical ids; cmap is exported for the result
    # surface (kg_canonical_map) only
    cmap = canonical_map_from_same_as(res.same_as, list(res.id_type))
    triples = materialize_triples(linked)
    return FlagshipResult(docs, kept, triples, drop_ds, cmap)
