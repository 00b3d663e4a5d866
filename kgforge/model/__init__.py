"""KBModel learn + synthesize (SURVEY §2.K) — the reference tool's own
capability (M1 entity/relation/domain-range distributions, M2
multiplicity/degree distributions) re-expressed as Ray Data aggregates,
plus a seeded synthesizer closing the learn→synth→learn loop."""

from .learn import (  # noqa: F401
    degree_hist,
    domain_range,
    learn_model,
    pred_freq,
    pred_stats,
    type_dist,
)
from .synth import synthesize  # noqa: F401
