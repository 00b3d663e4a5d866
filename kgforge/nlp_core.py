"""Pure NLP core shared by the Ray engine and the reference emitter
(SURVEY §2.B5-B8, C1-C3): SVO pattern bank, alias-dictionary mention
detection, context-embedding entity linking.

All functions are deterministic and order-independent so the distributed
pipeline and the single-threaded oracle agree triple-for-triple. The alias
"gazetteer" (surface→ids, prototypes, same_as edges) is the broadcastable
resource an actor pool loads once in ``__init__`` (SURVEY §2.D1).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np

from .ntriples import make_literal
from .ontology import (
    EMB_DIM,
    PRED_BY_NAME,
    PREDICATES,
    Ontology,
    get_ontology,
    hashed_bow,
    prototype_embedding,
)

_TOKEN_RE = re.compile(r"\w+", re.UNICODE)


def tokenize(text: str) -> list[str]:
    return [t.lower() for t in _TOKEN_RE.findall(text)]


def ctx_embedding(sentence: str) -> np.ndarray:
    """64-dim hashed bag-of-words context embedding (SURVEY §2.B8)."""
    return hashed_bow(tokenize(sentence))


# --- SVO pattern bank (SURVEY §2.B5) ----------------------------------------


@dataclass(frozen=True)
class SvoPattern:
    pred: str
    regex: re.Pattern
    conf: float


def _template_to_regex(template: str) -> re.Pattern:
    """'{s} works for {o}.' → anchored regex with named groups s/o."""
    out = []
    pos = 0
    for m in re.finditer(r"\{[so]\}", template):
        out.append(re.escape(template[pos:m.start()]))
        out.append(f"(?P<{template[m.start()+1]}>.+?)")
        pos = m.end()
    out.append(re.escape(template[pos:]))
    return re.compile("^" + "".join(out) + "$")


def build_pattern_bank() -> list[SvoPattern]:
    """Deterministically-ordered pattern bank: first match wins, so every
    worker and the oracle must iterate in this exact order.

    Ordered by descending literal length (template text minus the {s}/{o}
    slots): a more specific template like '{o} was founded by {s}.' must
    be tried before '{s} founded {o}.', whose lazy captures would
    otherwise swallow the passive form ('Acme was' / 'by Alice')."""
    entries: list[tuple[int, str, int, SvoPattern]] = []
    for p in sorted(PREDICATES, key=lambda p: p.name):
        for ti, tmpl in enumerate(p.templates):
            literal_len = len(re.sub(r"\{[so]\}", "", tmpl))
            entries.append(
                (literal_len, p.name, ti, SvoPattern(p.name, _template_to_regex(tmpl), 1.0))
            )
    entries.sort(key=lambda e: (-e[0], e[1], e[2]))
    return [e[3] for e in entries]


def build_screen_regex() -> re.Pattern:
    """One combined 'could any pattern match?' screen: the longest constant
    segment of every template, alternated. A sentence that matches some
    anchored pattern necessarily CONTAINS that pattern's constant segments,
    so failing the screen proves no pattern matches — a sound fast-path
    that skips the full bank for distractor sentences (the majority)."""
    segs: set[str] = set()
    for p in PREDICATES:
        for tmpl in p.templates:
            parts = [s for s in re.split(r"\{[so]\}", tmpl) if s]
            segs.add(max(parts, key=len))
    return re.compile("|".join(re.escape(s) for s in sorted(segs, key=len, reverse=True)))


def extract_svo(
    sentence: str,
    bank: list[SvoPattern],
    screen: re.Pattern | None = None,
) -> tuple[str, str, str, float] | None:
    """First-matching-pattern SVO extraction: sentence →
    (subj_surface, pred, obj_surface, conf) or None. ``screen`` (from
    :func:`build_screen_regex`) is a pure fast-path — results are
    identical with or without it."""
    if screen is not None and screen.search(sentence) is None:
        return None
    for pat in bank:
        m = pat.regex.match(sentence)
        if m:
            return m.group("s"), pat.pred, m.group("o"), pat.conf
    return None


# --- alias gazetteer resource (SURVEY §2.C1-C2, D1) -------------------------


@dataclass
class AliasResource:
    """The broadcast lookup side: alias dictionary + entity prototypes +
    sameAs equivalence edges. Built once (driver or actor __init__), shipped
    via ray.put / fn_constructor_args — never reshuffled per batch."""

    alias_to_ids: dict[str, list[str]]
    id_type: dict[str, str]
    proto: dict[str, np.ndarray]
    same_as: list[tuple[str, str]]
    mention_re: re.Pattern
    # corpus-level entity prior: #unambiguous-surface mentions per entity,
    # computed by a first distributed pass and broadcast back (SURVEY
    # §2.C2) — used as the second tie-break after cosine
    prior: dict[str, int] | None = None

    @classmethod
    def from_ontology(cls, onto: Ontology) -> "AliasResource":
        alias_to_ids = {a: list(ids) for a, ids in onto.alias_to_ids.items()}
        id_type = {e.eid: e.etype for e in onto.entities}
        proto = {e.eid: prototype_embedding(e) for e in onto.entities}
        # longest-first alternation → leftmost-longest matching, deterministic
        surfaces = sorted(alias_to_ids, key=lambda s: (-len(s), s))
        pat = "|".join(re.escape(s) for s in surfaces)
        mention_re = re.compile(
            r"(?<![A-Za-z0-9])(?:" + pat + r")(?![A-Za-z0-9])"
        )
        return cls(alias_to_ids, id_type, proto, list(onto.same_as), mention_re, None)

    def with_prior(self, prior: dict[str, int]) -> "AliasResource":
        return AliasResource(
            self.alias_to_ids, self.id_type, self.proto, self.same_as,
            self.mention_re, dict(prior),
        )

    @classmethod
    def default(cls, seed: int = 42) -> "AliasResource":
        return cls.from_ontology(get_ontology(seed))


def detect_mentions(sentence: str, res: AliasResource) -> list[tuple[str, int, int]]:
    """Alias-dictionary scan: non-overlapping leftmost-longest surface
    matches → (surface, start, end) (SURVEY §2.B6)."""
    return [(m.group(0), m.start(), m.end()) for m in res.mention_re.finditer(sentence)]


def _cos(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.dot(a, b))  # both unit-norm float32


def link_surface(
    surface: str,
    want_type: str | None,
    ctx: np.ndarray,
    res: AliasResource,
) -> tuple[str | None, float]:
    """Alias-dictionary + context-embedding linking (SURVEY §2.C2):
    exact-surface candidates → type filter → max cosine(ctx, prototype) →
    deterministic lexicographic-min tie-break."""
    cands = res.alias_to_ids.get(surface)
    if not cands:
        return None, 0.0
    if want_type is not None:
        cands = [c for c in cands if res.id_type[c] == want_type]
    if not cands:
        return None, 0.0
    if len(cands) == 1:
        return cands[0], 1.0
    prior = res.prior or {}
    # rank: max cosine, then max corpus prior, then lexicographic-min id —
    # all three exact comparisons, so every worker and the oracle agree
    best = min(cands, key=lambda c: (-_cos(ctx, res.proto[c]), -prior.get(c, 0), c))
    return best, _cos(ctx, res.proto[best])


# lexical validators per literal range (kbgen KBs carry literal-valued
# facts): a literal object is NOT gazetteer-linked — it is validated
# against its datatype's lexical form and carried as "lit:<lexical>".
_LITERAL_RES: dict[str, re.Pattern] = {
    "literal:gYear": re.compile(r"^\d{4}$"),
}


def link_triple(
    subj_surface: str,
    pred: str,
    obj_surface: str,
    sentence: str,
    res: AliasResource,
) -> tuple[str, str, str, float] | None:
    """Link both ends of a raw SVO triple; drop if either end is unlinkable.
    Returns (subj_id, pred, obj_id, link_score). Predicates with a
    ``literal:*`` range validate the object lexically instead of linking."""
    p = PRED_BY_NAME[pred]
    ctx = ctx_embedding(sentence)
    s_id, s_score = link_surface(subj_surface, p.domain, ctx, res)
    if s_id is None:
        return None
    if p.range.startswith("literal:"):
        lit_re = _LITERAL_RES.get(p.range)
        if lit_re is None or not lit_re.match(obj_surface):
            return None
        dt = "gYear" if p.range == "literal:gYear" else None
        return s_id, pred, make_literal(obj_surface, dt), s_score
    o_id, o_score = link_surface(obj_surface, p.range, ctx, res)
    if o_id is None:
        return None
    return s_id, pred, o_id, min(s_score, o_score)


def unambiguous_mention_counts(text: str, res: AliasResource) -> dict[str, int]:
    """Per-document counts of mentions whose surface maps to exactly ONE
    entity — the corpus prior's building block (pure; shared by the Ray
    pass and the oracle)."""
    from .extract_core import split_sentences

    counts: dict[str, int] = {}
    for sent in split_sentences(text):
        for surf, _s, _e in detect_mentions(sent, res):
            ids = res.alias_to_ids.get(surf)
            if ids and len(ids) == 1:
                counts[ids[0]] = counts.get(ids[0], 0) + 1
    return counts
