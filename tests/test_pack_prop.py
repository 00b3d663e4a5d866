"""Hypothesis fuzz for the token-packing kernel and the stratified-
sampling threshold math — each against a naive per-row reference
implementation (pure Python, no Ray session needed)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from kgforge.textops import _BPE_ISH, pack_sequences
from kgforge.relops import sample_hash_u64


def _pack_kernel(texts, seq_len, drop_remainder):
    """Capture pack_sequences' per-batch closure with a fake Dataset."""

    class FakeDS:
        def map_batches(self, fn, batch_format):
            self.fn = fn
            return self

    fake = FakeDS()
    pack_sequences(fake, seq_len=seq_len, drop_remainder=drop_remainder)
    t = pa.table({"text": pa.array(texts, pa.string())})
    return fake.fn(t)


def _naive_stream(texts, vocab_size=50000):
    """Reference: per-doc regex tokens → blake2b ids → EOS-joined stream."""
    from kgforge.extract_core import stable_u64

    stream = []
    for x in texts:
        for tok in _BPE_ISH.findall(x or ""):
            stream.append(1 + stable_u64(tok, "tokpack") % (vocab_size - 1))
        stream.append(0)
    return stream


@st.composite
def corpora(draw):
    n = draw(st.integers(min_value=0, max_value=15))
    texts = draw(
        st.lists(
            st.one_of(
                st.none(),
                st.text(
                    alphabet="ab1 .!\n\tZ-", min_size=0, max_size=40
                ),
            ),
            min_size=n,
            max_size=n,
        )
    )
    return texts


@settings(max_examples=80, deadline=None)
@given(corpora(), st.integers(min_value=1, max_value=9))
def test_pack_kernel_matches_naive_reference(texts, seq_len):
    out = _pack_kernel(texts, seq_len, drop_remainder=False)
    got = [tok for seq in out["seq"].to_pylist() for tok in seq]
    want = _naive_stream(texts)
    assert got == want  # exact stream equality incl. EOS placement
    lens = out["n_tokens"].to_pylist()
    assert all(l == seq_len for l in lens[:-1])
    if lens:
        assert 1 <= lens[-1] <= seq_len


@settings(max_examples=80, deadline=None)
@given(corpora(), st.integers(min_value=1, max_value=9))
def test_pack_kernel_drop_remainder_is_prefix(texts, seq_len):
    keep = _pack_kernel(texts, seq_len, drop_remainder=False)
    drop = _pack_kernel(texts, seq_len, drop_remainder=True)
    k = [tuple(s) for s in keep["seq"].to_pylist()]
    d = [tuple(s) for s in drop["seq"].to_pylist()]
    assert all(len(s) == seq_len for s in d)
    assert d == [s for s in k if len(s) == seq_len][: len(d)]
    assert k[: len(d)] == d


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=0, max_size=50),
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
    st.integers(min_value=0, max_value=2**31),
)
def test_sampling_threshold_math_matches_per_row_predicate(ids, fraction, seed):
    """The vectorized keep-mask must equal the scalar definition
    h <= int(f * 2^64) - 1 row by row, including f=0 and f=1 edges."""
    arr = pa.array(ids, pa.int64())
    h = sample_hash_u64(arr, seed)
    t_int = int(fraction * 2**64) - 1
    want = [int(x) <= t_int for x in h]
    thr = np.uint64(max(t_int, 0))
    got = (h <= thr) if t_int >= 0 else np.zeros(len(h), bool)
    assert list(got) == want
    if fraction == 1.0:
        assert all(got)
    if fraction == 0.0:
        assert not any(got)
