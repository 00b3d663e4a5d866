from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data as rd

from kgforge.corpus import pages_table
from kgforge.plan import Plan, Step, plan_from_config


def test_plan_from_config_runs_flagship_prefix():
    plan = plan_from_config(
        [
            {"op": "url_norm"},
            {"op": "lang_filter", "langs": ["en"]},
            {"op": "extract_text"},
            {"op": "exact_dedup"},
            {"op": "select", "columns": ["url_norm", "extracted_text", "n_chars"]},
        ]
    )
    assert plan.names() == ["url_norm", "lang_filter", "extract_text", "exact_dedup", "select"]
    out = plan.run(rd.from_arrow(pages_table(60)))
    rows = out.take_all()
    assert rows and set(rows[0]) == {"url_norm", "extracted_text", "n_chars"}


def test_user_udf_step():
    step = Step.from_batch_fn(
        "double", lambda t: t.append_column("y", pa.array([x * 2 for x in t["x"].to_pylist()]))
    )
    out = Plan([step]).run(rd.from_arrow(pa.table({"x": [1, 2, 3]})))
    assert [r["y"] for r in out.take_all()] == [2, 4, 6]


def test_unknown_op_raises():
    with pytest.raises(ValueError, match="unknown op"):
        plan_from_config([{"op": "nope"}])


def test_unknown_param_raises():
    """A typo'd config key must raise, not silently apply the default
    (e.g. 'lang' for 'langs' would silently filter to English)."""
    import pytest

    from kgforge.plan import plan_from_config

    with pytest.raises(ValueError, match="unknown parameter"):
        plan_from_config([{"op": "lang_filter", "lang": ["de"]}])
    with pytest.raises(ValueError, match="unknown parameter"):
        plan_from_config([{"op": "limit", "count": 5}])
    # correct keys still build
    plan_from_config([{"op": "lang_filter", "langs": ["de"]}, {"op": "limit", "n": 5}])


def test_lang_filter_accepts_bare_string(ray_session):
    """langs='en' must mean the language 'en' — tuple('en') == ('e','n')
    silently filtered every row out."""
    import pandas as pd
    import ray.data as rd

    from kgforge.plan import plan_from_config

    ds = rd.from_pandas(pd.DataFrame({
        "url": ["http://a/1", "http://a/2"],
        "lang": ["en", "de"],
        "html": ["<p>x</p>", "<p>y</p>"],
        "text": [None, None],
    }))
    plan = plan_from_config([{"op": "lang_filter", "langs": "en"}])
    out = plan.run(ds).to_pandas()
    assert out["lang"].tolist() == ["en"]
