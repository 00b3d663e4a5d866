"""Pluggable text-encoder protocol (kgforge.encoder): protocol shape,
registry, the hashed-BoW default, the actor-pool embed stage, and the
ANN handoff."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from kgforge.encoder import (
    HashedBoWEncoder,
    SentenceTransformerEncoder,
    TextEncoder,
    embed_texts,
    get_encoder,
    register_encoder,
)


def test_default_encoder_protocol_and_determinism():
    enc = get_encoder("hashed_bow")
    assert isinstance(enc, TextEncoder)
    v1 = enc.encode_batch(["the quick brown fox", "hello world"])
    v2 = enc.encode_batch(["the quick brown fox", "hello world"])
    assert v1.shape == (2, enc.dim) and v1.dtype == np.float32
    assert (v1 == v2).all()
    # L2-normalized rows (cosine == dot downstream)
    assert np.allclose(np.linalg.norm(v1, axis=1), 1.0, atol=1e-5)
    assert enc.encode_batch([]).shape == (0, enc.dim)


def test_learned_encoder_is_an_honest_gated_stub():
    with pytest.raises(NotImplementedError, match="sentence-transformers"):
        SentenceTransformerEncoder()
    with pytest.raises(ValueError, match="unknown encoder"):
        get_encoder("nope")


def test_embed_texts_actor_stage_and_ann_handoff(ray_session):
    texts = ["alpha beta gamma", "alpha beta gamma", "totally different words",
             None, ""]
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    )
    out = embed_texts(ds, "text", batch_size=2, concurrency=2)
    t = out.to_pandas().sort_values("doc_id", ignore_index=True)
    enc = HashedBoWEncoder()
    assert list(t.columns) == ["doc_id", "text", "embedding"]
    # identical text -> identical vector, matching the driver-side encoder
    assert t["embedding"][0] == pytest.approx(t["embedding"][1])
    assert t["embedding"][0] == pytest.approx(
        enc.encode_batch(["alpha beta gamma"])[0].tolist()
    )
    # the output column feeds ann.brute_topk directly
    from kgforge.ann import brute_force_topk as brute_topk

    q = enc.encode_batch(["alpha beta gamma"])
    res = brute_topk(out, q, k=2, id_col="doc_id", vec_col="embedding")
    assert set(res[res["rank"] <= 2]["doc_id"]) == {0, 1}


def test_register_encoder_factory_runs_inside_actor(ray_session):
    class TinyEncoder:
        name, dim = "tiny", 4

        def encode_batch(self, texts):
            out = np.zeros((len(texts), 4), dtype=np.float32)
            out[:, 0] = [len(t or "") for t in texts]
            n = np.linalg.norm(out, axis=1, keepdims=True)
            return np.where(n > 0, out / np.maximum(n, 1e-9), out)

    register_encoder("tiny", TinyEncoder)
    ds = rd.from_arrow(pa.table({"text": pa.array(["ab", "abcd"], pa.string())}))
    t = embed_texts(ds, "text", encoder="tiny", concurrency=1).to_pandas()
    assert [v[0] for v in t["embedding"]] == [1.0, 1.0]
