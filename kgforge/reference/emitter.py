"""The reference emitter: a deliberately simple, single-threaded,
Ray-free implementation of the full KG-construction pipeline
(SURVEY §5.2). Plain Python loops + dicts/sets — the *orchestration* is
independent of the Ray engine (no shuffles, no batches, no actors), while
the per-row primitives (extract_text, SVO patterns, linking, minhash) are
the shared pure functions, which is exactly what makes "byte-identical
text / P-R ≥ 0.95" a test of the DISTRIBUTED execution rather than of two
divergent NLP stacks.

Semantics the Ray engine must reproduce:
  1. exact dedup by url_normalize(url), keep max (warc_ts, url)
  2. keep lang == 'en'; extract text; drop empty extractions
  3. minhash-LSH near-dup: jaccard ≥ 0.7 verified pairs → union-find over
     url_norm → keep the lexicographic-min url_norm per component
  4. sentence split → first-matching-pattern SVO → alias+embedding linking
  5. union-find over sameAs edges → canonical subj/obj ids
  6. materialize distinct (subj, pred, obj): n_sources = #distinct kept
     docs, first_url = min url; sorted output
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

from ..dedup_core import (
    UnionFind,
    bucket_pair_policy,
    lsh_band_keys,
    minhash_signature,
    shingles,
    sig_jaccard,
)
from ..extract_core import extract_page_text, split_sentences, url_normalize
from ..nlp_core import (
    AliasResource,
    build_pattern_bank,
    extract_svo,
    link_triple,
    unambiguous_mention_counts,
)

NEARDUP_JACCARD = 0.7


@dataclass
class ReferenceResult:
    extracted: dict[str, str]  # url -> extracted_text (post exact-dedup, en)
    kept_urls: list[str]  # after near-dup removal
    triples: dict[tuple[str, str, str], set[str]]  # (s,p,o) -> source urls
    canonical_map: dict[str, str]
    rows: list[dict] = field(default_factory=list)  # final sorted triple rows

    def triple_set(self) -> set[tuple[str, str, str]]:
        return set(self.triples)

    def triples_table(self) -> pa.Table:
        return pa.table(
            {
                "subj": [r["subj"] for r in self.rows],
                "pred": [r["pred"] for r in self.rows],
                "obj": [r["obj"] for r in self.rows],
                "n_sources": pa.array([r["n_sources"] for r in self.rows], pa.int64()),
                "first_url": [r["first_url"] for r in self.rows],
            }
        )


def run_reference(pages: pa.Table, res: AliasResource | None = None) -> ReferenceResult:
    res = res or AliasResource.default()
    bank = build_pattern_bank()

    # -- 1. exact dedup by normalized url: keep max (warc_ts, url) ----------
    best: dict[str, tuple] = {}
    for row in pages.to_pylist():
        key = url_normalize(row["url"])
        cur = best.get(key)
        mark = (row["warc_ts"], row["url"])
        if cur is None or mark > (cur["warc_ts"], cur["url"]):
            best[key] = row
            row["_url_norm"] = key

    # -- 2. language filter + extraction ------------------------------------
    extracted: dict[str, str] = {}
    for key in sorted(best):
        row = best[key]
        if row["lang"] != "en":
            continue
        text = extract_page_text(row["html"], row.get("text"))
        if not text:
            continue
        extracted[key] = text

    # -- 3. minhash-LSH near-dup removal ------------------------------------
    sigs = {u: minhash_signature(shingles(t)) for u, t in extracted.items()}
    buckets: dict[str, list[str]] = {}
    for u in sorted(extracted):
        for bk in lsh_band_keys(sigs[u]):
            buckets.setdefault(bk, []).append(u)
    # candidate pairs under the SHARED bucket_pair_policy, then verify —
    # mirrors the engine's candidate→verify split exactly
    pairs: set[tuple[str, str]] = set()
    for bk, urls in buckets.items():
        members = sorted(set(urls))
        for i, j in bucket_pair_policy(members):
            pairs.add((members[i], members[j]))
    uf_docs = UnionFind()
    for a, b in sorted(pairs):
        if sig_jaccard(sigs[a], sigs[b]) >= NEARDUP_JACCARD:
            uf_docs.union(a, b)
    drop: set[str] = set()
    comp: dict[str, list[str]] = {}
    for u in extracted:
        comp.setdefault(uf_docs.find(u), []).append(u)
    for root, members in comp.items():
        keep = min(members)
        drop.update(m for m in members if m != keep)
    kept_urls = sorted(u for u in extracted if u not in drop)

    # -- 3b. corpus prior (same pass as the engine's entity_prior) ----------
    prior: dict[str, int] = {}
    for u in kept_urls:
        for eid, n in unambiguous_mention_counts(extracted[u], res).items():
            prior[eid] = prior.get(eid, 0) + n
    res = res.with_prior(prior)

    # -- 4. SVO + linking ----------------------------------------------------
    # -- 5. canonicalization (sameAs union-find) -----------------------------
    uf_ent = UnionFind()
    for a, b in res.same_as:
        uf_ent.union(a, b)
    canonical_map = {eid: uf_ent.find(eid) for eid in res.id_type}

    triples: dict[tuple[str, str, str], set[str]] = {}
    for u in kept_urls:
        for si, sent in enumerate(split_sentences(extracted[u])):
            svo = extract_svo(sent, bank)
            if svo is None:
                continue
            s_surf, pred, o_surf, _conf = svo
            linked = link_triple(s_surf, pred, o_surf, sent, res)
            if linked is None:
                continue
            s_id, pred, o_id, _score = linked
            key = (canonical_map.get(s_id, s_id), pred, canonical_map.get(o_id, o_id))
            triples.setdefault(key, set()).add(u)

    # -- 6. materialize ------------------------------------------------------
    rows = [
        {
            "subj": s,
            "pred": p,
            "obj": o,
            "n_sources": len(urls),
            "first_url": min(urls),
        }
        for (s, p, o), urls in sorted(triples.items())
    ]
    return ReferenceResult(extracted, kept_urls, triples, canonical_map, rows)
