"""Deterministic closed-world ontology for the synthetic web corpus
(SURVEY.md §5.3, FIXTURES.md §1-2).

~220 entities (people / organizations / cities / countries) with 1-4 alias
surface forms each, a few deliberately *ambiguous* aliases (same surface →
several entities, resolved by predicate type signature + context embedding),
and *split* entities (two ids for the same real-world thing, connected by an
explicit ``same_as`` edge — the union-find canonicalization target).

12 predicates with typed domain/range and sentence templates; a fixed fact
table whose page-render sampling weights follow Zipf(α=1.05) subject
skew so head-entity shuffle salting (SURVEY §4.3) is exercised at test
scale.

Everything is derived from ``random.Random(seed)`` (Mersenne twister —
stable across Python versions in use) and module-level word lists: no
external data, identical on every worker/process.
"""

from __future__ import annotations

import math
import random
from dataclasses import dataclass, field

import numpy as np

from .extract_core import stable_u64

EMB_DIM = 64

FIRST_NAMES = [
    "Alice", "Bruno", "Carla", "David", "Elena", "Farid", "Greta", "Hiro",
    "Ines", "Jonas", "Katya", "Liam", "Mara", "Nadia", "Omar", "Priya",
    "Quentin", "Rosa", "Stefan", "Tara", "Umar", "Vera", "Wendel", "Ximena",
    "Yusuf", "Zofia", "Anders", "Beatriz", "Cedric", "Dalia",
]
LAST_NAMES = [
    "Smith", "Johnson", "Weber", "Tanaka", "Garcia", "Mueller", "Rossi",
    "Kowalski", "Novak", "Silva", "Haddad", "Okafor", "Larsen", "Petrov",
    "Costa", "Nguyen", "Fischer", "Moreau", "Ricci", "Jansen", "Olsen",
    "Keller", "Marino", "Duarte", "Egger", "Fontaine", "Grimm", "Holm",
]
ORG_ROOTS = [
    "Acme", "Borealis", "Cobalt", "Datawise", "Everline", "Fathom", "Glacier",
    "Helix", "Ironwood", "Juniper", "Kestrel", "Lumen", "Meridian", "Northgate",
    "Opaline", "Pinnacle", "Quartz", "Riverton", "Solstice", "Trellis",
    "Umbra", "Vantage", "Westbrook", "Xenon", "Yellowpine", "Zephyr",
    "Bluecrest", "Cinder", "Dovetail", "Emberly",
]
ORG_KINDS = ["Systems", "Labs", "Industries", "Analytics", "Holdings", "Logistics"]
ORG_SUFFIX = ["Inc", "Ltd", "GmbH", "Corp"]
CITY_NAMES = [
    "Northfield", "Eastvale", "Westmere", "Southport", "Lakewood", "Hillcrest",
    "Stonebridge", "Fairhaven", "Maplewood", "Riverbend", "Ashford", "Brookline",
    "Cresthill", "Dunmore", "Elmswood", "Foxglove", "Greenvale", "Harborview",
    "Ivydale", "Junipero", "Kingsford", "Larkspur", "Mistral", "Newholm",
]
COUNTRY_NAMES = [
    "Avaria", "Borundia", "Caledon", "Drevia", "Elandor", "Fenwick",
    "Galtania", "Hesperia", "Istria", "Jorvia", "Kantara", "Luthia",
]

TYPE_PERSON = "person"
TYPE_ORG = "organization"
TYPE_CITY = "city"
TYPE_COUNTRY = "country"
# literal range marker (kbgen KBs contain literal-valued facts): predicates
# whose range starts with "literal:" take a lexical value, not an entity.
# Literal objects are carried as "lit:<lexical>" ids through the whole
# pipeline (linking, canonicalization no-op, model, N-Triples typed output).
TYPE_YEAR = "literal:gYear"
LITERAL_PREFIX = "lit:"


@dataclass(frozen=True)
class Predicate:
    name: str
    domain: str  # subject type
    range: str  # object type
    templates: tuple[str, ...]  # each has {s} and {o}


PREDICATES: tuple[Predicate, ...] = (
    Predicate("works_for", TYPE_PERSON, TYPE_ORG,
              ("{s} works for {o}.", "{s} is employed by {o}.")),
    Predicate("ceo_of", TYPE_PERSON, TYPE_ORG,
              ("{s} is the chief executive of {o}.", "{s} leads {o} as chief executive.")),
    Predicate("founded", TYPE_PERSON, TYPE_ORG,
              ("{s} founded {o}.", "{o} was founded by {s}.")),
    Predicate("born_in", TYPE_PERSON, TYPE_CITY,
              ("{s} was born in {o}.",)),
    Predicate("lives_in", TYPE_PERSON, TYPE_CITY,
              ("{s} lives in {o}.", "{s} resides in {o}.")),
    Predicate("citizen_of", TYPE_PERSON, TYPE_COUNTRY,
              ("{s} is a citizen of {o}.",)),
    Predicate("located_in", TYPE_ORG, TYPE_CITY,
              ("{s} is headquartered in {o}.", "{s} is based in {o}.")),
    Predicate("acquired", TYPE_ORG, TYPE_ORG,
              ("{s} acquired {o}.", "{o} was acquired by {s}.")),
    Predicate("partner_of", TYPE_ORG, TYPE_ORG,
              ("{s} announced a partnership with {o}.",)),
    Predicate("supplier_of", TYPE_ORG, TYPE_ORG,
              ("{s} is a supplier of {o}.",)),
    Predicate("city_in", TYPE_CITY, TYPE_COUNTRY,
              ("{s} is a city in {o}.",)),
    Predicate("capital_of", TYPE_CITY, TYPE_COUNTRY,
              ("{s} is the capital of {o}.",)),
    Predicate("founded_in", TYPE_ORG, TYPE_YEAR,
              ("{s} was founded in the year {o}.",)),
)

PRED_BY_NAME = {p.name: p for p in PREDICATES}


@dataclass(frozen=True)
class Entity:
    eid: str
    etype: str
    aliases: tuple[str, ...]  # aliases[0] is the canonical surface


@dataclass
class Ontology:
    seed: int
    entities: list[Entity] = field(default_factory=list)
    same_as: list[tuple[str, str]] = field(default_factory=list)  # split-entity edges
    facts: list[tuple[str, str, str]] = field(default_factory=list)  # (subj_id, pred, obj_id) CANONICAL ids
    fact_weights: list[float] = field(default_factory=list)  # Zipf over facts (by subject rank)

    # derived
    by_id: dict[str, Entity] = field(default_factory=dict)
    alias_to_ids: dict[str, list[str]] = field(default_factory=dict)
    canon_of: dict[str, str] = field(default_factory=dict)  # entity_id -> canonical id
    members_of: dict[str, list[str]] = field(default_factory=dict)  # canon id -> sorted member ids

    def finish(self) -> None:
        self.by_id = {e.eid: e for e in self.entities}
        self.alias_to_ids = {}
        for e in self.entities:
            for a in e.aliases:
                self.alias_to_ids.setdefault(a, []).append(e.eid)
        for ids in self.alias_to_ids.values():
            ids.sort()
        # canonical = min id of the same_as component (components here are pairs,
        # but compute transitively for correctness)
        parent: dict[str, str] = {e.eid: e.eid for e in self.entities}

        def find(x: str) -> str:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in self.same_as:
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        self.canon_of = {e.eid: find(e.eid) for e in self.entities}
        self.members_of = {}
        for eid, c in self.canon_of.items():
            self.members_of.setdefault(c, []).append(eid)
        for ids in self.members_of.values():
            ids.sort()


def prototype_embedding(entity: Entity) -> np.ndarray:
    """Deterministic 64-dim prototype for an entity: hashed bag-of-words of
    its aliases + type (float32; stands in for a learned encoder —
    SURVEY §2.B8, no torch in this environment)."""
    tokens: list[str] = [entity.etype]
    for a in entity.aliases:
        tokens.extend(a.lower().split())
    return hashed_bow(tokens)


#: token → (dim index, sign) memo: the linker calls hashed_bow once per
#: linked sentence and Zipf reuse makes the same tokens recur constantly
#: — the blake2b per token was the largest single term of the SvoLinker
#: stage.  Values are pure functions of the token, so caching cannot
#: change results; the size cap bounds worker memory on adversarial
#: vocabularies.
_BOW_MEMO: dict[str, tuple[int, np.float32]] = {}
_BOW_MEMO_CAP = 1 << 20


def hashed_bow(tokens: list[str]) -> np.ndarray:
    """Shared hashed bag-of-words embedding used for BOTH entity prototypes
    and mention contexts, so cosine(ctx, proto) is meaningful.  ±1
    accumulation over float32 is exact integer arithmetic (sentences are
    far below 2^24 tokens), so accumulation order cannot change the
    vector — bit-identical across workers and with/without the memo."""
    v = np.zeros(EMB_DIM, dtype=np.float32)
    memo = _BOW_MEMO
    for t in tokens:
        e = memo.get(t)
        if e is None:
            h = stable_u64(t, salt="emb")
            e = (h % EMB_DIM,
                 np.float32(1.0) if (h >> 7) & 1 else np.float32(-1.0))
            if len(memo) < _BOW_MEMO_CAP:
                memo[t] = e
        v[e[0]] += e[1]
    n = np.float32(np.sqrt(np.float32((v * v).sum())))
    if n > 0:
        v = v / n
    return v


def build_ontology(seed: int = 42) -> Ontology:
    rng = random.Random(seed)
    onto = Ontology(seed=seed)
    ents: list[Entity] = []
    i = 0

    def next_id() -> str:
        nonlocal i
        eid = f"e{i:04d}"
        i += 1
        return eid

    # --- people (some share last names → ambiguous last-name aliases) ------
    used_names: set[tuple[str, str]] = set()
    people: list[Entity] = []
    while len(people) < 100:
        fn = rng.choice(FIRST_NAMES)
        ln = rng.choice(LAST_NAMES)
        if (fn, ln) in used_names:
            continue
        used_names.add((fn, ln))
        full = f"{fn} {ln}"
        aliases = [full]
        r = rng.random()
        if r < 0.25:
            aliases.append(f"Dr. {full}")
        elif r < 0.45:
            # last-name-only alias — deliberately ambiguous across people
            aliases.append(ln)
        people.append(Entity(next_id(), TYPE_PERSON, tuple(aliases)))
    ents.extend(people)

    # --- organizations ------------------------------------------------------
    orgs: list[Entity] = []
    used_orgs: set[str] = set()
    while len(orgs) < 60:
        root = rng.choice(ORG_ROOTS)
        kind = rng.choice(ORG_KINDS)
        base = f"{root} {kind}"
        if base in used_orgs:
            continue
        used_orgs.add(base)
        aliases = [base]
        if rng.random() < 0.5:
            aliases.append(f"{base} {rng.choice(ORG_SUFFIX)}")
        if rng.random() < 0.3:
            aliases.append(root)  # short form — can collide across kinds
        orgs.append(Entity(next_id(), TYPE_ORG, tuple(aliases)))
    ents.extend(orgs)

    # --- places -------------------------------------------------------------
    cities = [Entity(next_id(), TYPE_CITY, (name,)) for name in CITY_NAMES]
    countries = [Entity(next_id(), TYPE_COUNTRY, (name,)) for name in COUNTRY_NAMES]
    ents.extend(cities)
    ents.extend(countries)

    # --- split entities (union-find canonicalization targets) ---------------
    # ~8% of people/orgs get a second id with DISJOINT aliases (an "also known
    # as" form). Linking emits either id; an explicit same_as edge (shipped
    # with the alias dictionary, like a sameAs gazetteer) lets union-find
    # merge them; canon id = lexicographic min = the base id.
    split_candidates = [e for e in people + orgs if len(e.aliases) == 1]
    rng.shuffle(split_candidates)
    n_split = max(4, len(split_candidates) // 8)
    for base in split_candidates[:n_split]:
        if base.etype == TYPE_PERSON:
            fn, ln = base.aliases[0].split(" ", 1)
            alt_surface = f"{fn[0]}. {ln}"
        else:
            alt_surface = f"The {base.aliases[0]} Group"
        twin = Entity(next_id(), base.etype, (alt_surface,))
        ents.append(twin)
        onto.same_as.append((base.eid, twin.eid))

    onto.entities = ents
    onto.finish()

    # --- facts with Zipf subject skew ---------------------------------------
    # Subjects ranked by a fixed shuffled order; weight ∝ 1/rank^1.05 so a few
    # head entities dominate page mentions (exercises salted shuffles §4.3).
    subjects = [e for e in ents if onto.canon_of[e.eid] == e.eid]
    rng.shuffle(subjects)
    facts: list[tuple[str, str, str]] = []
    seen: set[tuple[str, str, str]] = set()
    by_type: dict[str, list[Entity]] = {}
    for e in subjects:
        by_type.setdefault(e.etype, []).append(e)
    # per-subject fact COUNT is uniform (1-3); the head-entity skew
    # comes from fact_weights at page-render time (1/rank^1.05 below),
    # not from the fact table itself
    for rank, e in enumerate(subjects):
        preds = [p for p in PREDICATES if p.domain == e.etype]
        if not preds:
            continue
        n_facts = rng.randint(1, 4)
        for _ in range(n_facts):
            p = rng.choice(preds)
            if p.range.startswith("literal:"):
                # deterministic per-entity literal value (founding year)
                year = 1900 + stable_u64(e.eid, "founded_year") % 120
                f = (e.eid, p.name, f"{LITERAL_PREFIX}{year}")
                if f not in seen:
                    seen.add(f)
                    facts.append(f)
                continue
            objs = by_type.get(p.range, [])
            if not objs:
                continue
            o = rng.choice(objs)
            if o.eid == e.eid:
                continue
            f = (e.eid, p.name, o.eid)
            if f in seen:
                continue
            seen.add(f)
            facts.append(f)
    # correlated predicates (horn-rule structure for K6 mining): a capital
    # is a city of its country; a chief executive works for their org
    extra: list[tuple[str, str, str]] = []
    for s, p, o in facts:
        if p == "capital_of" and rng.random() < 0.9:
            extra.append((s, "city_in", o))
        elif p == "ceo_of" and rng.random() < 0.85:
            extra.append((s, "works_for", o))
    for f in extra:
        if f not in seen:
            seen.add(f)
            facts.append(f)

    onto.facts = facts
    # Zipf weight per fact, keyed by subject rank.
    rank_of = {e.eid: r for r, e in enumerate(subjects)}
    onto.fact_weights = [1.0 / math.pow(rank_of[f[0]] + 1, 1.05) for f in facts]
    onto.finish()
    return onto


_ONTO_CACHE: dict[int, Ontology] = {}


def get_ontology(seed: int = 42) -> Ontology:
    """Process-level cache — the ontology is ~1k small objects, cheap to
    rebuild but used by every batch; build once per worker."""
    if seed not in _ONTO_CACHE:
        _ONTO_CACHE[seed] = build_ontology(seed)
    return _ONTO_CACHE[seed]


def render_fact(onto: Ontology, fact: tuple[str, str, str], rng: random.Random) -> str:
    """Render a canonical fact as a sentence, choosing a template and alias
    surfaces (possibly of a split twin) with the page's rng."""
    s_id, pred, o_id = fact
    p = PRED_BY_NAME[pred]
    # surface may come from the base entity or any same_as twin
    s_ent = onto.by_id[rng.choice(onto.members_of[s_id])]
    tmpl = rng.choice(p.templates)

    def pick_surface(e: Entity) -> str:
        # prefer the unambiguous canonical surface; sometimes use an alias
        # (possibly ambiguous → exercises embedding/type disambiguation)
        if len(e.aliases) > 1 and rng.random() < 0.25:
            return rng.choice(e.aliases[1:])
        return e.aliases[0]

    if o_id.startswith(LITERAL_PREFIX):
        o_surface = o_id[len(LITERAL_PREFIX):]
    else:
        o_ent = onto.by_id[rng.choice(onto.members_of[o_id])]
        o_surface = pick_surface(o_ent)
    return tmpl.format(s=pick_surface(s_ent), o=o_surface)
