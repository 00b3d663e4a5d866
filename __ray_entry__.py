"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json). Results may be a ``ray.data.Dataset``, a
``pandas.DataFrame`` or a ``pyarrow.Table``.

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init`` / ``ray.shutdown`` anywhere in kgforge library code.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship KG-construction pipeline smoke (SURVEY §3.2/§3.3): build a
    small deterministic synthetic page corpus, run the full extract →
    dedup → link → canonicalize → materialize pipeline, return the sorted
    triples Dataset."""
    from kgforge.corpus import pages_dataset
    from kgforge.pipelines.flagship import run_flagship

    res = run_flagship(pages_dataset(300, parallelism=8))
    return res.triples


def queries() -> dict[str, Callable[[str], Any]]:
    """SQL-verified relational/text/vector operators (kgforge.relational)
    plus rows-only KG / dedup / ANN / multimodal operators
    (kgforge.kgqueries). See SURVEY.md §2 for the inventory mapping."""
    from kgforge.kgqueries import KG_QUERY_FNS
    from kgforge.relational import QUERY_FNS

    out: dict[str, Callable[[str], Any]] = {}
    out.update(QUERY_FNS)
    out.update(KG_QUERY_FNS)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB equivalents for every SQL-expressible query (same column
    names). kg_*/dedup_*/ann_*/media_*/text_* entries are deliberately
    omitted → driver records the weaker rows-only check."""
    from kgforge.relational import QUERY_SQL

    return dict(QUERY_SQL)
