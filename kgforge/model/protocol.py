"""KBModel plugin protocol (SURVEY §2.J3 — kbgen's model-tier surface).

kbgen exposes a family of learnable KB models — M1 (entity/relation/
domain-range distributions), M2 (M1 + multiplicity/degree
distributions), M3 (M2 + externally-mined horn rules) [public knowledge;
/root/reference is empty, SURVEY §0]. This module gives the engine the
same pluggable surface: a ``ModelLearner`` protocol, a registry, and the
three built-in tiers — so a user can swap the model implementation (or
register their own) without touching pipeline code:

    from kgforge.model.protocol import get_learner
    learner = get_learner("m3")
    model = learner.learn(triples_ds, id_type)
    synth_ds = learner.synthesize(model, scale=2.0, seed=7)
"""

from __future__ import annotations

from typing import Any, Protocol, runtime_checkable

import pandas as pd


@runtime_checkable
class ModelLearner(Protocol):
    """A learnable+generative KB model tier. ``learn`` consumes the triple
    Dataset and returns a dict of SMALL pandas frames (the model);
    ``synthesize`` turns a model back into a triples Dataset."""

    name: str

    def learn(self, triples_ds, id_type: dict) -> dict[str, pd.DataFrame]: ...

    def synthesize(self, model: dict[str, pd.DataFrame], scale: float = 1.0,
                   seed: int = 7) -> Any: ...


class M1Learner:
    """Tier 1: entity-type, relation-frequency and domain/range
    distributions only — synthesis pairs subjects/objects uniformly
    (every entity degree-1 per drawn fact)."""

    name = "m1"

    def learn(self, triples_ds, id_type: dict) -> dict[str, pd.DataFrame]:
        # compute ONLY the M1 tables — learn_model would also run the
        # degree histograms and pred_stats (≈6 extra distributed
        # aggregation passes) just to throw them away; schemas come from
        # learn.MODEL_TABLE_COLS so the tiers can never drift
        from .learn import domain_range, model_frame, pred_freq, type_dist

        out = {
            "pred_freq": model_frame(pred_freq(triples_ds), "pred_freq"),
            "type_dist": model_frame(type_dist(triples_ds, id_type),
                                     "type_dist"),
            "domain_range": model_frame(domain_range(triples_ds, id_type),
                                        "domain_range"),
        }
        # degenerate degree histograms (all degree 1) so the shared
        # synthesizer can run on an M1 model
        import itertools

        preds = out["pred_freq"]["pred"].tolist()
        deg = pd.DataFrame(
            [
                {"pred": p, "direction": d, "degree": 1, "n_entities": 1}
                for p, d in itertools.product(preds, ("out", "in"))
            ],
            # empty graph → zero predicates; pin the columns so the
            # direction selection below still works on the empty frame
            columns=["pred", "direction", "degree", "n_entities"],
        )
        out["degree_out"] = deg[deg["direction"] == "out"].reset_index(drop=True)
        out["degree_in"] = deg[deg["direction"] == "in"].reset_index(drop=True)
        return out

    def synthesize(self, model, scale: float = 1.0, seed: int = 7):
        from .synth import synthesize

        return synthesize(model, scale=scale, seed=seed)


class M2Learner:
    """Tier 2: M1 + multiplicity (out/in degree histograms,
    functionality scalars) — the engine's default full model."""

    name = "m2"

    def learn(self, triples_ds, id_type: dict) -> dict[str, pd.DataFrame]:
        from .learn import learn_model

        return learn_model(triples_ds, id_type)

    def synthesize(self, model, scale: float = 1.0, seed: int = 7):
        from .synth import synthesize

        return synthesize(model, scale=scale, seed=seed)


class M3Learner:
    """Tier 3: M2 + horn rules. Rules are mined natively (AMIE-lite
    self-join) by default; pass ``rules_source`` — an AMIE-format rule
    file path or text — to consume externally-mined rules instead
    (kbgen's own M3 input)."""

    name = "m3"

    def __init__(self, rules_source: str | None = None,
                 min_support: int = 3, min_confidence: float = 0.3):
        self.rules_source = rules_source
        self.min_support = min_support
        self.min_confidence = min_confidence

    def learn(self, triples_ds, id_type: dict) -> dict[str, pd.DataFrame]:
        from .learn import learn_model
        from .rules import mine_rules, parse_amie_rules

        model = learn_model(triples_ds, id_type)
        if self.rules_source is not None:
            model["rules"] = parse_amie_rules(
                self.rules_source, min_confidence=self.min_confidence
            )
        else:
            model["rules"] = mine_rules(
                triples_ds, min_support=self.min_support,
                min_confidence=self.min_confidence,
            )
        return model

    def synthesize(self, model, scale: float = 1.0, seed: int = 7):
        from .rules import replay_rules
        from .synth import synthesize

        syn = synthesize(model, scale=scale, seed=seed)
        rules = model.get("rules")
        if rules is not None and len(rules):
            syn = replay_rules(syn, rules, seed=seed)
        return syn


_REGISTRY: dict[str, ModelLearner] = {}


def register_learner(learner: ModelLearner) -> None:
    """Register a custom model tier under ``learner.name`` (the J3 plugin
    hook — last registration wins, so users can shadow built-ins)."""
    _REGISTRY[learner.name] = learner


def get_learner(name: str) -> ModelLearner:
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown model tier {name!r}; registered: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]


def registered_learners() -> list[str]:
    return sorted(_REGISTRY)


for _l in (M1Learner(), M2Learner(), M3Learner()):
    register_learner(_l)
