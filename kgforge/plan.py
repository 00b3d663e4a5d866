"""Pipeline-step API (SURVEY §2.J1-J2): a pipeline is an ordered list of
named ``Step``s, each a pure ``Dataset -> Dataset`` function; a plan can
be built from a JSON-able config so users compose engine operators (and
their own batch UDFs) without touching pipeline internals.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass
from typing import Any


@dataclass
class Step:
    name: str
    fn: Callable[[Any], Any]  # Dataset -> Dataset

    def apply(self, ds):
        return self.fn(ds)

    @classmethod
    def from_batch_fn(cls, name: str, batch_fn, batch_format: str = "pyarrow", **kwargs):
        """J2: lift a user batch UDF into a Step (map_batches passthrough)."""
        return cls(name, lambda ds: ds.map_batches(batch_fn, batch_format=batch_format, **kwargs))


@dataclass
class Plan:
    steps: list[Step]

    def run(self, ds):
        for step in self.steps:
            ds = step.apply(ds)
        return ds

    def names(self) -> list[str]:
        return [s.name for s in self.steps]


def _langs_tuple(langs) -> tuple:
    """``tuple("en") == ('e','n')`` would filter EVERY row out with no
    error — the exact silent-misconfig class this registry exists to
    reject — so a bare string means the one language it names."""
    return (langs,) if isinstance(langs, str) else tuple(langs)


def _registry() -> dict[str, Callable[..., Step]]:
    """Built-in step factory registry (config `op` → Step)."""
    from .steps.extract import add_url_norm, exact_dedup, extract_docs, lang_filter
    from .textops import add_fingerprint, add_lang_id, add_quality, token_count_ds

    # NO **kw catch-alls: a typo'd config key ("lang" for "langs",
    # "count" for "n") must raise, not silently apply the default and run
    # a wrong pipeline — plan_from_config turns the TypeError into a
    # ValueError naming the accepted parameters
    return {
        "url_norm": lambda: Step(
            "url_norm", lambda ds: ds.map_batches(add_url_norm, batch_format="pyarrow")
        ),
        "lang_filter": lambda langs=("en",): Step(
            "lang_filter", lambda ds: lang_filter(ds, _langs_tuple(langs))
        ),
        "extract_text": lambda: Step("extract_text", extract_docs),
        "exact_dedup": lambda: Step("exact_dedup", exact_dedup),
        "neardup_dedup": lambda: Step(
            "neardup_dedup", lambda ds: __import__(
                "kgforge.steps.dedup", fromlist=["neardup_dedup"]
            ).neardup_dedup(ds)[0]
        ),
        "lang_id": lambda text_col="text": Step(
            "lang_id", lambda ds: add_lang_id(ds, text_col)
        ),
        "quality": lambda text_col="text": Step(
            "quality", lambda ds: add_quality(ds, text_col)
        ),
        "fingerprint": lambda text_col="text": Step(
            "fingerprint", lambda ds: add_fingerprint(ds, text_col)
        ),
        "token_count": lambda text_col="text": Step(
            "token_count", lambda ds: token_count_ds(ds, text_col)
        ),
        "limit": lambda n=10: Step("limit", lambda ds: ds.limit(n)),
        "select": lambda columns=(): Step(
            "select", lambda ds: ds.select_columns(list(columns))
        ),
    }


def plan_from_config(config: list[dict]) -> Plan:
    """[{"op": "lang_filter", "langs": ["en"]}, {"op": "extract_text"}] →
    Plan. Unknown ops AND unknown per-op parameters raise with the
    accepted names (a silently-ignored typo'd key builds a wrong
    pipeline)."""
    import inspect

    reg = _registry()
    steps = []
    for item in config:
        op = item.get("op")
        if op not in reg:
            raise ValueError(f"unknown op {op!r}; known: {sorted(reg)}")
        kwargs = {k: v for k, v in item.items() if k != "op"}
        accepted = set(inspect.signature(reg[op]).parameters)
        unknown = set(kwargs) - accepted
        if unknown:
            raise ValueError(
                f"op {op!r}: unknown parameter(s) {sorted(unknown)}; "
                f"accepted: {sorted(accepted) or '(none)'}"
            )
        steps.append(reg[op](**kwargs))
    return Plan(steps)
