"""Hypothesis fuzz for the substring-dedup kernels (pure, no Ray):
interval-union cutting vs a character-mask reference, and the window
extractor's span/position/hash invariants."""

from __future__ import annotations

import re

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from kgforge.spandedup import _merge_cut, _pack_spans, _span_windows

_TOK = re.compile(r"\S+")

# texts over a tiny alphabet with several whitespace kinds so token
# boundaries, runs of separators and repeated tokens all occur
texts_st = st.text(alphabet="ab \t\n", max_size=120)


@settings(max_examples=200, deadline=None)
@given(
    st.text(alphabet="abcdef ", max_size=80),
    st.lists(st.tuples(st.integers(0, 80), st.integers(0, 80)), max_size=8),
)
def test_merge_cut_matches_char_mask(text, raw_spans):
    spans = [(min(a, b), max(a, b)) for a, b in raw_spans]
    spans = [(s, min(e, len(text))) for s, e in spans if s < len(text) and s < e]
    if not spans:
        return
    packed = _pack_spans(
        np.array([s for s, _ in spans]), np.array([e for _, e in spans])
    )
    got_text, got_drop = _merge_cut(text, packed)
    covered = np.zeros(len(text), dtype=bool)
    for s, e in spans:
        covered[s:e] = True
    want_text = "".join(ch for ch, c in zip(text, covered) if not c)
    assert got_text == want_text
    assert got_drop == int(covered.sum())


@settings(max_examples=150, deadline=None)
@given(st.lists(texts_st, max_size=6), st.integers(1, 4))
def test_span_windows_invariants(texts, n):
    h1, h2, doc_idx, cs, ce, pos = _span_windows(texts, n)
    toks_per = [[m for m in _TOK.finditer(x or "")] for x in texts]
    # exactly the windows that fit inside one doc, in order
    want = []
    for d, ms in enumerate(toks_per):
        for p in range(len(ms) - n + 1):
            want.append((d, p, ms[p].start(), ms[p + n - 1].end()))
    got = sorted(zip(doc_idx.tolist(), pos.tolist(), cs.tolist(), ce.tolist()))
    assert got == want
    # the span substring re-tokenizes to exactly the window's n tokens
    for d, p, s, e in want:
        sub_toks = _TOK.findall(texts[d][s:e])
        orig = [m.group() for m in toks_per[d][p : p + n]]
        assert sub_toks == orig
    # identical token tuples hash identically (both salts)
    by_tuple: dict[tuple, tuple] = {}
    for (d, p, _s, _e), a, b in zip(want, h1.tolist(), h2.tolist()):
        key = tuple(m.group() for m in toks_per[d][p : p + n])
        if key in by_tuple:
            assert by_tuple[key] == (a, b)
        else:
            by_tuple[key] = (a, b)
