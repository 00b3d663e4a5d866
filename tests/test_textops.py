from __future__ import annotations

import pyarrow as pa

from kgforge.textops import (
    fingerprint_text,
    lang_id_text,
    quality_batch,
)


def test_lang_id_heuristic():
    assert lang_id_text("the committee discussed the annual budget and the schedule") == "en"
    assert lang_id_text("der bericht über die stadt und das wetter ist nicht neu") == "de"
    assert lang_id_text("el informe de la ciudad sobre el tiempo") == "es"
    assert lang_id_text("le rapport sur la ville et le temps") == "fr"
    assert lang_id_text("委员会审查了年度预算报告") == "zh"
    assert lang_id_text("") == "und"
    assert lang_id_text("qqq zzz xxx") == "und"


def test_quality_batch_scores():
    t = pa.table(
        {
            "text": [
                "The committee reviewed the annual budget and published a long, careful report about the schedule.",
                "x",
                "!!! ??? !!! ???",
            ]
        }
    )
    out = quality_batch(t)
    scores = out["quality_score"].to_pylist()
    assert scores[0] > scores[1]
    assert scores[0] > scores[2]
    assert out["n_tokens"].to_pylist()[0] == 15
    assert out["punct_ratio"].to_pylist()[2] > 0.5


def test_fingerprint_deterministic_and_sensitive():
    a = "the quick brown fox jumps over the lazy dog again and again today"
    assert fingerprint_text(a) == fingerprint_text(a)
    assert fingerprint_text(a) != fingerprint_text(a + " extra trailing words here now")
    assert fingerprint_text("") == "0" * 16


def test_null_text_survives_all_text_ops(ray_session):
    """A corpus with null text cells must score/classify/fingerprint as
    empty, not AttributeError the whole stage."""
    import ray.data as rd

    from kgforge.textops import add_fingerprint, add_lang_id, add_quality

    t = pa.table({"doc_id": [1, 2], "text": ["the quick brown fox", None]})
    ds = rd.from_arrow(t)
    q = add_quality(ds).to_pandas()
    assert q.loc[1, "n_tokens"] == 0 and q.loc[1, "quality_score"] == 0.0
    l = add_lang_id(ds).to_pandas()
    assert l.loc[1, "lang_pred"] == "und"
    fp = add_fingerprint(ds).to_pandas()
    assert fp.loc[1, "fingerprint"] == "0" * 16


def test_quality_after_token_count_no_duplicate_column(ray_session):
    """Composing token_count then quality (both emit n_tokens) must yield
    ONE n_tokens field (last-wins), not a duplicated schema field that
    breaks t[name] downstream."""
    import ray.data as rd

    from kgforge.textops import add_quality, token_count_ds

    t = pa.table({"doc_id": [1], "text": ["alpha  beta gamma"]})
    out = add_quality(token_count_ds(rd.from_arrow(t))).to_pandas()
    assert list(out.columns).count("n_tokens") == 1
    assert out.loc[0, "n_tokens"] == 3
