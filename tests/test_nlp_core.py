"""Unit tests for the SVO pattern bank, mention detection and linking
(SURVEY §2.B5-B8, C1-C2)."""

from __future__ import annotations

import numpy as np

from kgforge.nlp_core import (
    AliasResource,
    build_pattern_bank,
    ctx_embedding,
    detect_mentions,
    extract_svo,
    link_surface,
    link_triple,
)
from kgforge.ontology import get_ontology


def test_pattern_bank_extracts_all_predicates():
    bank = build_pattern_bank()
    cases = {
        "Alice Smith works for Acme Systems.": ("Alice Smith", "works_for", "Acme Systems"),
        "Acme Systems was founded by Alice Smith.": ("Alice Smith", "founded", "Acme Systems"),
        "Northfield is the capital of Avaria.": ("Northfield", "capital_of", "Avaria"),
        "Acme Systems acquired Borealis Labs.": ("Acme Systems", "acquired", "Borealis Labs"),
    }
    for sent, want in cases.items():
        got = extract_svo(sent, bank)
        assert got is not None, sent
        assert (got[0], got[1], got[2]) == want


def test_distractors_do_not_match():
    bank = build_pattern_bank()
    for sent in [
        "The committee reviewed the annual budget.",
        "A spokesperson discussed several open questions.",
        "This is just a plain sentence.",
    ]:
        assert extract_svo(sent, bank) is None, sent


def test_detect_mentions_leftmost_longest():
    res = AliasResource.default()
    onto = get_ontology()
    # pick an org with a short-form alias (root) and a long form
    ent = next(e for e in onto.entities if e.etype == "organization" and len(e.aliases) >= 2)
    long_alias = max(e for e in [a for a in ent.aliases] if True)
    long_alias = max(ent.aliases, key=len)
    sent = f"Yesterday {long_alias} announced something."
    ms = detect_mentions(sent, res)
    # the longest alias must be matched whole, not its shorter prefix
    assert any(m[0] == long_alias for m in ms), (long_alias, ms)


def test_link_type_filter_and_tiebreak():
    res = AliasResource.default()
    onto = get_ontology()
    # find an ambiguous surface (maps to >1 entity of the same type)
    surface, ids = next(
        (s, ids) for s, ids in sorted(onto.alias_to_ids.items())
        if len({onto.by_id[i].etype for i in ids}) == 1 and len(ids) > 1
    )
    etype = onto.by_id[ids[0]].etype
    ctx = ctx_embedding(f"{surface} did a thing.")
    linked, _score = link_surface(surface, etype, ctx, res)
    assert linked in ids
    # deterministic: same inputs → same link
    again, _ = link_surface(surface, etype, ctx, res)
    assert again == linked
    # wrong type → no candidates
    wrong = "country" if etype != "country" else "person"
    assert link_surface(surface, wrong, ctx, res) == (None, 0.0)


def test_link_triple_end_to_end():
    res = AliasResource.default()
    onto = get_ontology()
    person = next(e for e in onto.entities if e.etype == "person")
    org = next(e for e in onto.entities if e.etype == "organization")
    sent = f"{person.aliases[0]} works for {org.aliases[0]}."
    out = link_triple(person.aliases[0], "works_for", org.aliases[0], sent, res)
    assert out is not None
    s_id, pred, o_id, score = out
    assert pred == "works_for" and score > 0
    assert onto.by_id[s_id].etype == "person"
    assert onto.by_id[o_id].etype == "organization"
    # unknown surface → dropped
    assert link_triple("Nobody Known", "works_for", org.aliases[0], sent, res) is None


def test_ctx_embedding_unit_norm_and_deterministic():
    e1 = ctx_embedding("Alice Smith works for Acme Systems.")
    e2 = ctx_embedding("Alice Smith works for Acme Systems.")
    assert np.allclose(e1, e2)
    assert abs(float(np.linalg.norm(e1)) - 1.0) < 1e-5
