"""Gopher repetition metrics (kgforge/repetition.py) vs an independent
loop-based oracle, plus batch-isolation and filter behavior."""

from __future__ import annotations

import random
import re

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from kgforge.repetition import (
    DUP_NS,
    TOP_NS,
    gopher_repetition_filter,
    repetition_batch,
    repetition_scores,
)

_TOK = re.compile(r"\S+")


def _oracle_one(text: str | None):
    """Loop-based reference for every metric on one doc."""
    text = text or ""
    n_chars = len(text)
    out = {}
    lines = [ln for ln in text.split("\n") if ln.strip()]
    paras = [p for p in re.split(r"\n\n+", text) if p.strip()]
    for name, units in (("line", lines), ("para", paras)):
        from collections import Counter

        c = Counter(units)
        dups = sum(k - 1 for k in c.values() if k > 1)
        dchars = sum((k - 1) * len(u) for u, k in c.items() if k > 1)
        out[f"dup_{name}_frac"] = dups / len(units) if units else 0.0
        out[f"dup_{name}_char_frac"] = dchars / n_chars if n_chars else 0.0

    ms = list(_TOK.finditer(text))
    toks = [m.group() for m in ms]

    def occurrences(n):
        occ = {}
        for i in range(len(toks) - n + 1):
            g = tuple(toks[i : i + n])
            occ.setdefault(g, []).append((ms[i].start(), ms[i + n - 1].end()))
        return occ

    for n in TOP_NS:
        best = 0
        for g, spans in occurrences(n).items():
            if len(spans) >= 2:
                first = min(spans)
                best = max(best, len(spans) * (first[1] - first[0]))
        out[f"top_{n}gram_char_frac"] = best / n_chars if n_chars else 0.0
    for n in DUP_NS:
        ivs = []
        for g, spans in occurrences(n).items():
            if len(spans) >= 2:
                ivs.extend(sorted(spans)[1:])  # beyond the first
        ivs.sort()
        covered, cur_end = 0, -1
        for s, e in ivs:
            s = max(s, cur_end)
            if e > s:
                covered += e - s
                cur_end = e
            cur_end = max(cur_end, e)
        out[f"dup_{n}gram_char_frac"] = covered / n_chars if n_chars else 0.0
    return out


_VOCAB = "aa bb cc dd ee ff gg hh".split()


def _rand_doc(rng: random.Random, n_tok: int) -> str:
    toks = [rng.choice(_VOCAB) for _ in range(n_tok)]
    # sprinkle newlines/paragraph breaks for the line/para metrics
    out = []
    for i, t in enumerate(toks):
        out.append(t)
        if rng.random() < 0.1:
            out.append("\n")
        if rng.random() < 0.04:
            out.append("\n\n")
    return " ".join(out).replace(" \n ", "\n").replace(" \n\n ", "\n\n")


def test_fuzz_matches_oracle():
    rng = random.Random(42)
    texts = [_rand_doc(rng, rng.randint(0, 80)) for _ in range(60)]
    texts += [None, "", "   \n\n  ", "single"]
    t = pa.table({"text": pa.array(texts, pa.string())})
    got = repetition_batch(t)
    for i, x in enumerate(texts):
        want = _oracle_one(x)
        for m, v in want.items():
            assert got[m][i].as_py() == pytest.approx(v, abs=1e-12), (i, m, x)


def test_crafted_values():
    text = "a b c a b c a b c"
    got = repetition_batch(pa.table({"text": [text]}))
    # (a,b) and (b,c) occur 3x with first-span length 3 → 9/17
    assert got["top_2gram_char_frac"][0].as_py() == pytest.approx(9 / 17)
    line_doc = "hello world\nhello world\nunique line"
    got2 = repetition_batch(pa.table({"text": [line_doc]}))
    assert got2["dup_line_frac"][0].as_py() == pytest.approx(1 / 3)
    assert got2["dup_line_char_frac"][0].as_py() == pytest.approx(
        11 / len(line_doc)
    )


def test_batch_isolation():
    """Metrics for a doc must not depend on its batch neighbors (the
    flat kernel masks windows crossing doc boundaries)."""
    rng = random.Random(1)
    docs = [_rand_doc(rng, 40) for _ in range(10)]
    solo = [repetition_batch(pa.table({"text": [d]})) for d in docs]
    batch = repetition_batch(pa.table({"text": docs}))
    for i in range(len(docs)):
        for m in batch.column_names:
            if m == "text":
                continue
            assert batch[m][i].as_py() == solo[i][m][0].as_py(), (i, m)


def test_scores_and_filter_on_dataset(ray_session):
    spam = ("buy now " * 50).strip()
    clean = (
        "The committee reviewed the annual budget today.\n\n"
        "A separate report describes harbor improvements planned for next "
        "winter, including new lighting and repaired walkways."
    )
    ds = rd.from_items(
        [{"doc_id": 0, "text": spam}, {"doc_id": 1, "text": clean}]
    ).repartition(2)
    scored = repetition_scores(ds).to_pandas().sort_values("doc_id")
    # "buy now "*50: (buy,now) 50× with span 7 → 350/399 ≈ 0.877
    assert scored["top_2gram_char_frac"].iloc[0] == pytest.approx(350 / 399)
    assert scored["dup_5gram_char_frac"].iloc[0] > 0.8
    assert scored["top_2gram_char_frac"].iloc[1] == 0.0
    kept = gopher_repetition_filter(ds).to_pandas()
    assert kept["doc_id"].tolist() == [1]
    assert list(kept.columns) == ["doc_id", "text"]
    ann = gopher_repetition_filter(ds, annotate=True).to_pandas()
    assert "dup_10gram_char_frac" in ann.columns


def test_filter_threshold_subset_and_validation(ray_session):
    ds = rd.from_items([{"doc_id": 0, "text": "x y " * 30}])
    # only one metric enforced → others not even computed, doc dropped
    out = gopher_repetition_filter(ds, thresholds={"top_2gram_char_frac": 0.2})
    assert out.count() == 0
    with pytest.raises(ValueError, match="unknown repetition metrics"):
        gopher_repetition_filter(ds, thresholds={"nope": 0.5})


def test_filter_subset_thresholds_restores_schema(ray_session):
    """annotate=False with a SUBSET thresholds dict must still drop the
    always-computed line/para metric columns (review fix)."""
    ds = rd.from_items([{"doc_id": 0, "text": "a perfectly ordinary line"}])
    out = gopher_repetition_filter(
        ds, thresholds={"top_2gram_char_frac": 0.5}
    ).to_pandas()
    assert list(out.columns) == ["doc_id", "text"]
