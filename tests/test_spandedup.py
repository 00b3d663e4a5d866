"""Exact substring (duplicated-span) dedup: pure-Python oracle parity,
edge cases, and driver==distributed plan equality."""

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from kgforge.spandedup import substring_dedup


def ref_substring_dedup(docs, n):
    """Independent reference: EXACT token tuples (no hashing), same
    semantics — winner per duplicated window = min (id, window pos),
    every other occurrence's char span cut (union of overlaps)."""
    occ = {}
    toks_per = []
    for row, (i, t) in enumerate(docs):
        ms = list(re.finditer(r"\S+", t or ""))
        toks_per.append(ms)
        for p in range(len(ms) - n + 1):
            key = tuple(m.group() for m in ms[p : p + n])
            occ.setdefault(key, []).append(
                (i, p, row, ms[p].start(), ms[p + n - 1].end())
            )
    cuts: dict[int, list] = {}
    for lst in occ.values():
        if len(lst) < 2:
            continue
        w = min((i, p) for i, p, _, _, _ in lst)
        for i, p, row, cs, ce in lst:
            if (i, p) != w:
                cuts.setdefault(row, []).append((cs, ce))
    out = []
    for row, (i, t) in enumerate(docs):
        t = t or ""
        spans = sorted(cuts.get(row, []))
        pieces, cursor, dropped = [], 0, 0
        for s, e in spans:
            if e <= cursor:
                continue
            s = max(s, cursor)
            pieces.append(t[cursor:s])
            dropped += e - s
            cursor = e
        pieces.append(t[cursor:])
        out.append((i, "".join(pieces), dropped))
    return out


def _run(docs, n, strategy, blocks: int = 1):
    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": [i for i, _ in docs], "text": [t for _, t in docs]})
    )
    if blocks > 1:  # multi-block layouts hit the empty-block join landmines
        ds = ds.repartition(blocks)
    got = (
        substring_dedup(ds, "doc_id", "text", n=n, strategy=strategy)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return got


def _assert_matches_ref(docs, n, strategy):
    got = _run(docs, n, strategy)
    ref = sorted(ref_substring_dedup(docs, n))
    assert got["doc_id"].tolist() == [i for i, _, _ in ref]
    assert got["text"].tolist() == [t for _, t, _ in ref]
    assert got["n_dropped_chars"].tolist() == [d for _, _, d in ref]


def test_cross_doc_duplicated_run(ray_session):
    body = " ".join(f"tok{i}" for i in range(8))
    docs = [
        (1, "intro one " + body + " tail alpha"),
        (2, "different start " + body + " other end"),
        (3, "clean doc with its own words entirely"),
    ]
    _assert_matches_ref(docs, 4, "driver")
    got = _run(docs, 4, "driver")
    # doc 1 (min id) keeps the span; doc 2 loses it
    assert got.loc[got.doc_id == 1, "n_dropped_chars"].iloc[0] == 0
    assert got.loc[got.doc_id == 2, "n_dropped_chars"].iloc[0] > 0
    assert "tok0" not in got.loc[got.doc_id == 2, "text"].iloc[0]
    assert got.loc[got.doc_id == 3, "n_dropped_chars"].iloc[0] == 0


def test_within_doc_repetition_cut(ray_session):
    run = "a b c d e"
    docs = [(7, f"{run} filler words here {run} trailing")]
    _assert_matches_ref(docs, 5, "driver")
    got = _run(docs, 5, "driver")
    assert got["text"].iloc[0].count("a b c d e") == 1


def test_short_null_and_clean_docs_pass_through(ray_session):
    docs = [(1, "only three tokens"), (2, None), (3, ""), (4, "x " * 2)]
    got = _run(docs, 50, "driver")
    assert got["n_dropped_chars"].tolist() == [0, 0, 0, 0]
    # null text normalizes to "" (the passthrough contract)
    assert got["text"].tolist() == ["only three tokens", "", "", "x x "]


def test_overlapping_losers_merge(ray_session):
    # doc 2 contains the duplicated run twice, overlapping windows —
    # the union cut must not double-count chars
    body = " ".join(f"w{i}" for i in range(6))
    docs = [(1, body), (2, body + " mid " + body)]
    _assert_matches_ref(docs, 3, "driver")


def test_driver_distributed_equality_and_string_ids(ray_session):
    rng = np.random.RandomState(5)
    vocab = [f"v{i}" for i in range(30)]
    shared = " ".join(rng.choice(vocab, 12))
    docs = []
    for i in range(40):
        words = " ".join(rng.choice(vocab, rng.randint(3, 40)))
        txt = words + (" " + shared if i % 4 == 0 else "")
        docs.append((f"doc{i:03d}", txt))
    a = _run(docs, 6, "driver", blocks=7)
    b = _run(docs, 6, "distributed", blocks=7)
    pd.testing.assert_frame_equal(a, b)
    ref = sorted(ref_substring_dedup(docs, 6))
    assert a["text"].tolist() == [t for _, t, _ in ref]


def test_fuzz_matches_reference(ray_session):
    rng = np.random.RandomState(11)
    vocab = [f"t{i}" for i in range(12)]  # tiny vocab → frequent collisions
    for trial in range(5):
        docs = [
            (int(i), " ".join(rng.choice(vocab, rng.randint(0, 25))))
            for i in range(25)
        ]
        _assert_matches_ref(docs, 4, "driver")


def test_int64_char_packing_roundtrip():
    from kgforge.spandedup import _merge_cut, _pack_spans

    text = "0123456789abcdef"
    spans = _pack_spans(np.array([2, 8, 4]), np.array([5, 12, 9]))
    new, dropped = _merge_cut(text, spans)
    # union of [2,5) [4,9) [8,12) = [2,12)
    assert new == "01cdef" and dropped == 10


def test_curation_substring_stage(ray_session):
    """substring_dedup composes inside curate_corpus after paragraph
    dedup: a non-paragraph-aligned duplicated run is cut from the
    higher-id doc, n_dropped_paragraphs survives the stage, and the
    stats line reports the cut chars."""
    from kgforge.pipelines.curation import curate_corpus

    run = " ".join(f"common{i}" for i in range(8))
    topics = [
        "the weather and the rain in spring gardens with many flowers blooming",
        "a history of the railway and the trains that crossed the mountains",
        "cooking the soup and the bread in a small kitchen with fresh herbs",
        "the library and the books about stars and planets in the night sky",
        "a journey on the river and the boats that carried goods to market",
        "the festival and the music played in the town square every summer",
    ]
    rows = []
    for i in range(6):
        body = f"this is article number {i} about {topics[i]} "
        rows.append((i, body + (run if i in (2, 4) else "")))
    ds = rd.from_pandas(pd.DataFrame(rows, columns=["doc_id", "text"]))
    res = curate_corpus(
        ds, min_quality=0.1, pack=False, substring_dedup_ngram=6
    )
    out = res.docs.to_pandas().set_index("doc_id")
    assert "n_dropped_paragraphs" in out.columns
    assert res.stats["substring_chars_dropped"] > 0
    assert "common0" in out.loc[2, "text"]      # first occurrence keeps
    assert "common0" not in out.loc[4, "text"]  # later occurrence cut
    assert out.loc[4, "n_dropped_chars"] > 0
