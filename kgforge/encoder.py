"""Pluggable text-embedding encoder protocol (SURVEY §2.B8 / §0.3).

The task brief's mention/document scorer is "GPU-backed"; this sandbox
has no torch or GPU, so the engine embeds with a deterministic hashed
bag-of-words.  This module writes the swap point down the way
``model/protocol.py`` does for ``ModelLearner``: a ``TextEncoder``
protocol, a registry, the CPU default, an honest gated stub for a
learned model, and the actor-pool ``map_batches`` stage that runs ANY
registered encoder at scale (state — model weights, tokenizer — loaded
once per actor in ``__init__``, never per batch).

    from kgforge.encoder import embed_texts
    ds = embed_texts(docs_ds, "text")                      # hashed BoW
    ds = embed_texts(docs_ds, "text", encoder="st-minilm") # learned (if torch)

Registering a custom encoder:

    from kgforge.encoder import register_encoder
    register_encoder("mine", lambda: MyEncoder())          # factory, not instance:
    # it is called INSIDE each actor, so weights load worker-side, once
"""

from __future__ import annotations

from typing import Callable, Protocol, Sequence, runtime_checkable

import numpy as np
import pyarrow as pa

from ray.data import Dataset


@runtime_checkable
class TextEncoder(Protocol):
    """A batched text → vector encoder.

    ``encode_batch`` returns a ``(len(texts), dim)`` float32 matrix,
    L2-normalized per row (cosine == dot downstream: ann.py assumes
    it).  Implementations must be deterministic per input for the
    engine's reproducibility contract, and PICKLABLE only via their
    registered factory (the factory runs inside each Ray actor)."""

    name: str
    dim: int

    def encode_batch(self, texts: Sequence[str]) -> np.ndarray: ...


class HashedBoWEncoder:
    """Default CPU encoder: the engine's shared 64-dim hashed
    bag-of-words (ontology.hashed_bow) — the same space EntityLinker
    scores mention contexts against, bit-identical across workers."""

    name = "hashed_bow"

    def __init__(self) -> None:
        from kgforge.ontology import EMB_DIM

        self.dim = EMB_DIM

    def encode_batch(self, texts: Sequence[str]) -> np.ndarray:
        from kgforge.nlp_core import tokenize
        from kgforge.ontology import hashed_bow

        if not texts:
            return np.zeros((0, self.dim), dtype=np.float32)
        return np.stack([hashed_bow(tokenize(t)) for t in texts])


class SentenceTransformerEncoder:
    """Learned-encoder slot: loads a sentence-transformers /torch model
    once per actor.  This sandbox ships neither, so construction raises
    with the exact dependency needed — the Ray-side plumbing (actor
    shape, batch contract, output layout) is what the engine owns; the
    weights are deployment-specific.  On a GPU cluster, run it via
    ``embed_texts(..., encoder='st-minilm', num_gpus=0.25)``."""

    name = "st-minilm"
    dim = 384

    def __init__(self, model_name: str = "all-MiniLM-L6-v2") -> None:
        try:
            from sentence_transformers import SentenceTransformer  # type: ignore
        except ImportError as e:  # pragma: no cover - no torch in sandbox
            raise NotImplementedError(
                "SentenceTransformerEncoder needs the 'sentence-transformers' "
                "package (not available in this environment); use the default "
                "'hashed_bow' encoder or register your own factory"
            ) from e
        self._model = SentenceTransformer(model_name)  # pragma: no cover

    def encode_batch(self, texts: Sequence[str]) -> np.ndarray:  # pragma: no cover
        v = self._model.encode(list(texts), normalize_embeddings=True)
        return np.asarray(v, dtype=np.float32)


_REGISTRY: dict[str, Callable[[], TextEncoder]] = {
    "hashed_bow": HashedBoWEncoder,
    "st-minilm": SentenceTransformerEncoder,
}


def register_encoder(name: str, factory: Callable[[], TextEncoder]) -> None:
    """Register a zero-arg encoder FACTORY (called once inside each
    actor, so model state loads worker-side)."""
    _REGISTRY[name] = factory


def get_encoder(name: str) -> TextEncoder:
    try:
        return _REGISTRY[name]()
    except KeyError:
        raise ValueError(
            f"unknown encoder {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None


def embed_texts(
    ds: Dataset,
    text_col: str = "text",
    *,
    encoder: str | Callable[[], TextEncoder] = "hashed_bow",
    out_col: str = "embedding",
    batch_size: int = 256,
    concurrency: int | tuple[int, int] = 4,
    num_cpus: float = 1,
    num_gpus: float = 0,
) -> Dataset:
    """Actor-pool embedding stage: append ``out_col`` (fixed-size-list
    ``float32[dim]``, L2-normalized — directly consumable by
    ``ann.brute_topk`` / ``ivf_build``) to every row.

    ``encoder`` is a registry name or a zero-arg factory; either way
    the FACTORY is resolved driver-side and CALLED inside each actor's
    ``__init__`` (one model load per actor, zero per batch; only the
    picklable factory crosses the wire — the registry itself is
    driver-process state that workers never see).  ``batch_size``
    bounds encoder peak memory — keep it small for large models;
    ``num_gpus`` reserves a GPU slice per actor on clusters that have
    them."""
    if isinstance(encoder, str):
        if encoder not in _REGISTRY:
            raise ValueError(
                f"unknown encoder {encoder!r}; registered: {sorted(_REGISTRY)}"
            )
        factory = _REGISTRY[encoder]
    else:
        factory = encoder

    class _Embed:
        def __init__(self) -> None:
            self.enc = factory()

        def __call__(self, t: pa.Table) -> pa.Table:
            texts = t[text_col].to_pylist()
            vecs = self.enc.encode_batch(["" if x is None else x for x in texts])
            col = pa.FixedSizeListArray.from_arrays(
                pa.array(np.ascontiguousarray(vecs, dtype=np.float32).ravel(),
                         pa.float32()),
                self.enc.dim,
            )
            return t.append_column(out_col, col)

    kwargs: dict = {"num_cpus": num_cpus}
    if num_gpus:
        kwargs["num_gpus"] = num_gpus
    return ds.map_batches(
        _Embed,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        **kwargs,
    )
