"""Deterministic Common-Crawl-style synthetic page corpus (SURVEY §2.S2,
§5.3; FIXTURES.md §1-2). No external data; per-row seeding by url hash so
any worker generates any page identically and independently.

Page mix (by index ``i``):
  - ``i % 53 == 2``  → exact re-crawl of page ``i-1`` (same html, url differs
    only by fragment + query order → same ``url_normalize`` key, later
    warc_ts) — exercises exact dedup (G2).
  - ``i % 37 == 1``  → near-duplicate of page ``i-1`` (same article body,
    different boilerplate + title) — exercises minhash-LSH (G3).
  - ~5%             → malformed html (unclosed script / bad entities /
    empty body); these carry NO facts (distractor text only).
  - ~20%            → non-English (de/es/fr/zh word-salad distractors).
  - rest            → well-formed English pages embedding 3-9 templated SVO
    fact sentences (Zipf-skewed subjects) among distractor sentences.
"""

from __future__ import annotations

import datetime as _dt
import random

import numpy as np
import pyarrow as pa

from .extract_core import stable_u64
from .ontology import Ontology, get_ontology, render_fact

BASE_TS = _dt.datetime(2024, 1, 1)

_DISTRACTOR_SUBJ = [
    "The committee", "A spokesperson", "The weather service", "This article",
    "The quarterly report", "A recent survey", "The editorial board",
    "The local council", "An anonymous reader", "The archive",
]
_DISTRACTOR_VERB = [
    "discussed", "reviewed", "summarized", "questioned", "highlighted",
    "postponed", "published", "archived", "examined", "noted",
]
_DISTRACTOR_OBJ = [
    "the seasonal schedule", "several open questions", "a minor correction",
    "the updated guidelines", "a long-standing tradition", "the road closures",
    "an upcoming exhibition", "the annual budget", "the ferry timetable",
    "a number of small changes",
]

LANG_WORDS = {
    "de": ["der", "die", "und", "nicht", "das", "ist", "ein", "zeit", "haus",
           "über", "straße", "wetter", "bericht", "stadt", "jahr", "immer"],
    "es": ["el", "la", "que", "de", "una", "tiempo", "ciudad", "informe",
           "siempre", "año", "calle", "casa", "sobre", "entre", "también"],
    "fr": ["le", "la", "et", "les", "une", "temps", "ville", "rapport",
           "toujours", "année", "rue", "maison", "sur", "entre", "aussi"],
    "zh": ["天气", "报告", "城市", "委员会", "时间", "年度", "预算", "街道",
           "档案", "展览", "问题", "更新", "传统", "变化", "小"],
}

# bump when the deterministic generator's output changes — cache keys
# (bench corpus parquet) include it so stale corpora are regenerated
# v2: re-crawls collide on url_norm; v3: literal-valued facts (founded_in)
CORPUS_VERSION = 3

_CATEGORIES = ["news", "business", "people", "places", "archive"]


def page_url(i: int) -> str:
    cat = _CATEGORIES[i % len(_CATEGORIES)]
    return f"https://site{i % 503}.example/{cat}/article-{i:08d}"


def _page_rng(i: int, seed: int) -> random.Random:
    return random.Random(stable_u64(page_url(i), salt=f"page{seed}"))


def _distractor(rng: random.Random) -> str:
    return (f"{rng.choice(_DISTRACTOR_SUBJ)} {rng.choice(_DISTRACTOR_VERB)} "
            f"{rng.choice(_DISTRACTOR_OBJ)}.")


def _salad(rng: random.Random, lang: str) -> str:
    words = LANG_WORDS[lang]
    n = rng.randint(6, 14)
    sent = " ".join(rng.choice(words) for _ in range(n))
    return sent + ("。" if lang == "zh" else ".")


def _page_kind(i: int, rng_probe: random.Random) -> str:
    """Classify page index → kind; precedence: recrawl > neardup > malformed
    > nonenglish > normal. Uses a probe rng stream independent of content."""
    if i % 53 == 2 and i > 0:
        return "recrawl"
    if i % 37 == 1 and i > 0:
        return "neardup"
    r = rng_probe.random()
    if r < 0.05:
        return "malformed"
    if r < 0.25:
        return "nonenglish"
    return "normal"


def _body_and_facts(
    i: int, seed: int, onto: Ontology
) -> tuple[list[str], list[tuple[str, str, str]], str]:
    """(body sentences, canonical facts used, lang) for page i — the
    *content* part, reused verbatim by the near-dup of page i+1."""
    rng = _page_rng(i, seed)
    kind = _page_kind(i, rng)
    if kind == "recrawl" or kind == "neardup":
        # content comes from the predecessor page
        return _body_and_facts(i - 1, seed, onto)
    if kind == "nonenglish":
        lang = ["de", "es", "fr", "zh"][i % 4]
        n = rng.randint(4, 9)
        return [_salad(rng, lang) for _ in range(n)], [], lang
    if kind == "malformed":
        n = rng.randint(2, 5)
        return [_distractor(rng) for _ in range(n)], [], "en"
    # normal english article
    n_facts = rng.randint(3, 9)
    idxs = rng.choices(range(len(onto.facts)), weights=onto.fact_weights, k=n_facts)
    facts = []
    seen = set()
    for ix in idxs:
        if ix not in seen:
            seen.add(ix)
            facts.append(onto.facts[ix])
    sents: list[str] = []
    for f in facts:
        sents.append(render_fact(onto, f, rng))
        if rng.random() < 0.5:
            sents.append(_distractor(rng))
    sents.insert(0, _distractor(rng))
    return sents, facts, "en"


_NAV = '<nav><a href="/">home</a> | <a href="/about">about</a> | <a href="/contact">contact</a></nav>'
_SCRIPT = "<script>var t=Date.now();console.log('tracker',t);</script>"
_STYLE = "<style>body{font-family:serif;margin:2em}.hero{color:#333}</style>"


def _render_html(i: int, title: str, sents: list[str], rng: random.Random,
                 malformed: bool) -> bytes:
    site = i % 503
    footer = f"<footer>&copy; 2024 site{site}.example — all rights reserved</footer>"
    aside = f"<aside>Related links for site{site}: <a href='/a{rng.randint(0, 99)}'>more</a></aside>"
    paras = []
    k = 0
    while k < len(sents):
        step = 1 + (rng.random() < 0.4)
        paras.append("<p>" + " ".join(sents[k:k + step]) + "</p>")
        k += step
    body = "\n".join(paras)
    if malformed:
        style = rng.random()
        if style < 0.34:
            # unclosed script mid-body: swallows the rest of the page
            body = body + "\n<script>var broken = {"
        elif style < 0.67:
            body = body.replace("<p>", "<p>&badent; ", 1) + "\n<div>unclosed"
        else:
            body = ""  # empty body
    html = (
        "<!DOCTYPE html>\n<html>\n<head>"
        f"<title>{title}</title>{_STYLE}{_SCRIPT}"
        '<meta charset="utf-8"></head>\n'
        f"<body>\n{_NAV}\n<h1>{title}</h1>\n<article>\n{body}\n</article>\n"
        f"{aside}\n{footer}\n</body></html>"
    )
    return html.encode("utf-8")


def gen_page_row(i: int, seed: int = 42, onto: Ontology | None = None) -> dict:
    """Generate page ``i`` of the corpus — a full ``pages``-schema row plus
    ground-truth sidecar fields (stripped before feeding the engine)."""
    onto = onto or get_ontology(seed)
    rng = _page_rng(i, seed)
    kind = _page_kind(i, rng)
    sents, facts, lang = _body_and_facts(i, seed, onto)

    url = page_url(i)
    ts_off = (i * 9973 + (stable_u64(url, "ts") % 3600)) % (365 * 24 * 3600)
    warc_ts = BASE_TS + _dt.timedelta(seconds=int(ts_off))

    if kind == "recrawl":
        # same logical url as predecessor — fragment appended, which
        # url_normalize strips, so BOTH rows share one url_norm and exact
        # dedup (G2) genuinely supersedes the first crawl (round 2 fix:
        # the old "?b=2&a=1" variant produced a DIFFERENT url_norm than
        # the query-less base, making flagship G2 a silent no-op)
        base = page_url(i - 1)
        url = base + "#reader"
        prev_rng = _page_rng(i - 1, seed)
        prev_kind = _page_kind(i - 1, prev_rng)
        suffix = "mirror" if prev_kind == "neardup" else "notes"
        title = f"Article {i - 1:08d} {suffix}"
        html = _render_html(i - 1, title, sents, prev_rng, prev_kind == "malformed")
        # recrawl of a malformed page stays malformed (identical html)
        warc_ts = warc_ts + _dt.timedelta(days=400)  # strictly later than any first crawl
    elif kind == "neardup":
        title = f"Article {i:08d} mirror"
        html = _render_html(i, title, sents, rng, False)
    else:
        title = f"Article {i:08d} notes"
        html = _render_html(i, title, sents, rng, kind == "malformed")

    raw_text = " ".join(sents) if rng.random() < 0.3 else ""
    return {
        "url": url,
        "warc_ts": warc_ts,
        "html": html,
        "text": raw_text,
        "lang": lang,
        # ground truth (sidecar; not part of the pages schema)
        "_kind": kind,
        "_facts": facts,
    }


# --- table / dataset builders ----------------------------------------------


def _rows_to_pages_table(rows: list[dict]) -> pa.Table:
    """The ONE place the pages schema (FIXTURES.md §1) is spelled out —
    both corpus sources build through it so they cannot drift."""
    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], pa.large_binary()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
        }
    )


def pages_table(n: int, seed: int = 42, start: int = 0) -> pa.Table:
    """Plain pyarrow table of pages [start, start+n) — for tests and the
    single-threaded reference emitter."""
    onto = get_ontology(seed)
    return _rows_to_pages_table([gen_page_row(i, seed, onto) for i in range(start, start + n)])


def gen_pages_batch(batch: pa.Table, seed: int = 42) -> pa.Table:
    """Ray `map_batches` source body: ids → pages rows (SURVEY §2.S2)."""
    ids = batch["id"].to_pylist()
    onto = get_ontology(seed)
    return _rows_to_pages_table([gen_page_row(i, seed, onto) for i in ids])


def pages_dataset(n: int, seed: int = 42, parallelism: int = -1):
    """Distributed corpus source: ``ray.data.range(n)`` → pages rows.
    Each block generates its own pages (no driver materialization)."""
    import ray.data as rd

    ds = rd.range(n, override_num_blocks=parallelism if parallelism > 0 else None)
    return ds.map_batches(
        lambda b, _seed=seed: gen_pages_batch(b, _seed),
        batch_format="pyarrow",
        batch_size=512,
    )


def ground_truth_triples(n: int, seed: int = 42) -> set[tuple[str, str, str]]:
    """Distinct canonical (subj, pred, obj) expected from pages [0, n) —
    facts on English well-formed pages (incl. their re-crawls/near-dups)."""
    onto = get_ontology(seed)
    out: set[tuple[str, str, str]] = set()
    for i in range(n):
        rng = _page_rng(i, seed)
        kind = _page_kind(i, rng)
        if kind in ("malformed", "nonenglish"):
            continue
        _, facts, lang = _body_and_facts(i, seed, onto)
        if lang == "en":
            out.update(facts)
    return out


def ground_truth_dupes(n: int, seed: int = 42) -> list[tuple[str, str]]:
    """(url_a, url_b) near-duplicate page pairs in [0, n) whose content is
    English and well-formed — i.e. the pairs that survive the lang filter
    and extraction and must be caught by minhash-LSH."""
    onto = get_ontology(seed)
    out = []
    for i in range(n):
        if i % 37 == 1 and i > 0 and not (i % 53 == 2):
            rng = _page_rng(i - 1, seed)
            if _page_kind(i - 1, rng) == "recrawl":
                continue
            _, facts, lang = _body_and_facts(i - 1, seed, onto)
            if lang != "en" or not facts:
                continue  # filtered out (non-English) or malformed (no facts)
            out.append((page_url(i - 1), page_url(i)))
    return out
