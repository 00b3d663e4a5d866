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
