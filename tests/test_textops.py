from __future__ import annotations

import pyarrow as pa
import pytest

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


def _py_chunks(text, chunk, overlap, min_chunk):
    """Oracle: token spans via the same whitespace tokenizer."""
    import re

    spans = [m.span() for m in re.finditer(r"[^ \t\n\r\f\v]+", text or "")]
    out = []
    step = chunk - overlap
    ci = 0
    for start in range(0, len(spans), step):
        end = min(start + chunk, len(spans))
        if end - start < min_chunk and ci > 0:
            break
        out.append((ci, text[spans[start][0]:spans[end - 1][1]], end - start))
        ci += 1
        if end == len(spans):
            break
    return out


def test_chunk_documents_oracle_and_coverage(ray_session):
    import pandas as pd
    import pytest
    import ray.data as rd

    from kgforge.textops import chunk_documents

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            " ".join(f"w{i}" for i in range(25)),      # 25 tokens
            "one  two\tthree\nfour five",              # odd whitespace
            "short",                                   # 1 token
            None,                                      # no chunks
        ],
    })
    ds = rd.from_pandas(docs).repartition(2)
    got = (chunk_documents(ds, chunk_tokens=10, overlap_tokens=3)
           .to_pandas().sort_values(["doc_id", "chunk_idx"], ignore_index=True))
    for did, text in zip(docs["doc_id"], docs["text"]):
        want = _py_chunks(text, 10, 3, 1)
        sub = got[got["doc_id"] == did].reset_index(drop=True)
        assert len(sub) == len(want), did
        for i, (ci, txt, ntok) in enumerate(want):
            assert sub.loc[i, "chunk_idx"] == ci
            assert sub.loc[i, "text"] == txt
            assert sub.loc[i, "n_tokens"] == ntok
    # overlap structure: consecutive chunks share their boundary tokens
    d1 = got[got["doc_id"] == 1]
    assert d1["n_tokens"].tolist() == [10, 10, 10, 4]  # 25 tokens, step 7
    # total distinct coverage: last chunk ends at token 25
    assert d1["text"].iloc[-1].endswith("w24")
    # validation
    with pytest.raises(ValueError):
        chunk_documents(ds, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(ds, chunk_tokens=5, overlap_tokens=5)


def test_chunk_documents_no_overlap_conserves_tokens(ray_session):
    import pandas as pd
    import ray.data as rd

    from kgforge.textops import chunk_documents, token_count_ds

    docs = pd.DataFrame({
        "doc_id": list(range(8)),
        "text": [" ".join(f"t{i}x{j}" for j in range(5 + 7 * i))
                 for i in range(8)],
    })
    ds = rd.from_pandas(docs).repartition(3)
    chunks = chunk_documents(ds, chunk_tokens=16, overlap_tokens=0)
    total_chunk_tokens = int(chunks.to_pandas()["n_tokens"].sum())
    corpus_tokens = int(
        token_count_ds(ds).to_pandas()["n_tokens"].sum()
    )
    assert total_chunk_tokens == corpus_tokens
    # string ids keep their dtype
    docs2 = docs.assign(doc_id=[f"d{i}" for i in range(8)])
    out = chunk_documents(rd.from_pandas(docs2), chunk_tokens=16).to_pandas()
    assert out["doc_id"].map(type).eq(str).all()


def test_chunk_documents_rejects_bad_min_chunk_tokens(ray_session):
    import ray.data as rd

    from kgforge.textops import chunk_documents

    ds = rd.from_items([{"doc_id": 1, "text": "a b c d e f"}])
    with pytest.raises(ValueError, match="min_chunk_tokens"):
        chunk_documents(ds, chunk_tokens=4, min_chunk_tokens=5)
    with pytest.raises(ValueError, match="min_chunk_tokens"):
        chunk_documents(ds, chunk_tokens=4, min_chunk_tokens=0)
