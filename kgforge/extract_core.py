"""Pure, deterministic text-processing core (SURVEY.md §2.B1-B4, B7).

Everything here is a pure function of its input bytes/strings — no I/O,
no randomness, no locale dependence — so that the Ray pipeline and the
single-threaded reference emitter (`kgforge.reference`) produce
byte-identical output per url regardless of batching, ordering or
parallelism (BASELINE.json `input_hint` per-row invariant).

The HTML→text extraction is "trafilatura-style": strip script / style /
head / comment / boilerplate-container content, honor block-level tag
boundaries as newlines, unescape entities, canonicalize whitespace and
unicode (NFC).  Implemented from scratch on stdlib `re` + `html` +
`unicodedata` (no HTML parser libraries exist in this environment,
SURVEY.md §0.3).
"""

from __future__ import annotations

import hashlib
import html as _htmlmod
import re
import unicodedata

# --- tag grammar ------------------------------------------------------------

# Containers whose entire content is dropped (scripts, styles, metadata and
# boilerplate navigation). Matched non-greedily; our corpus (and most real
# pages) do not nest the same container inside itself.
_DROP_CONTAINERS = (
    "script",
    "style",
    "noscript",
    "template",
    "svg",
    "head",
    "nav",
    "footer",
    "aside",
    "iframe",
)
_DROP_RE = re.compile(
    r"(?is)<(" + "|".join(_DROP_CONTAINERS) + r")(?:\s[^>]*)?>.*?</\1\s*>"
)
# Self-closing drop tags (<svg/>, <iframe src="x"/>) contain nothing —
# they must be rewritten BEFORE the unclosed-container check below, which
# would otherwise truncate a valid page at them.  The char before the
# "/" must be the tag name, whitespace, or a CLOSING QUOTE: in an
# UNQUOTED attribute value a "/" is part of the value per the HTML5
# tokenizer (<script src=https://cdn.x/ > is an OPEN tag), and treating
# it as self-closing would leak an unclosed script body into the text.
_DROP_SELF_RE = re.compile(
    r"(?is)<(" + "|".join(_DROP_CONTAINERS) + r")(?:\s[^>]*[\"'\s]|\s+)?/\s*>"
)
# HTML5 allows omitting </head>: the head ends where <body> starts.  Only
# fires when no </head> intervenes — a closed head was already dropped.
_HEAD_TO_BODY_RE = re.compile(
    r"(?is)<head(?:\s[^>]*)?>(?:(?!</head\b).)*?(?=<body\b)"
)
# Unclosed drop-container (malformed page): drop from the open tag to
# the end.  Deliberately PERMISSIVE about a trailing "/" (an unquoted
# attribute value ending in "/" still makes an OPEN tag per the HTML5
# tokenizer — <script src=https://x/ > must truncate, not leak its
# body): genuine self-closing forms were already rewritten to "\n" by
# _DROP_SELF_RE before this search runs, so they can never match here.
_DROP_OPEN_RE = re.compile(
    r"(?is)<(" + "|".join(_DROP_CONTAINERS) + r")(?:\s[^>]*)?>"
)
_COMMENT_RE = re.compile(r"(?s)<!--.*?-->")

# Tags that imply a line break before/after their content.
_BLOCK_TAGS = (
    "p",
    "div",
    "section",
    "article",
    "main",
    "header",
    "h1",
    "h2",
    "h3",
    "h4",
    "h5",
    "h6",
    "li",
    "ul",
    "ol",
    "dl",
    "dt",
    "dd",
    "table",
    "thead",
    "tbody",
    "tr",
    "td",
    "th",
    "blockquote",
    "pre",
    "figure",
    "figcaption",
    "title",
    "body",
    "html",
    "form",
    "fieldset",
    "address",
    "hr",
    "br",
)
_BLOCK_RE = re.compile(
    r"(?is)</?(" + "|".join(_BLOCK_TAGS) + r")(?:\s[^>]*)?/?\s*>"
)
_ANY_TAG_RE = re.compile(r"(?s)<[^>]*>")
_SPACES_RE = re.compile(r"[^\S\n]+")  # all whitespace except newline (incl. NBSP)


def decode_html(raw: bytes | str) -> str:
    """Decode page bytes as UTF-8 with deterministic replacement."""
    if isinstance(raw, str):
        return raw
    return raw.decode("utf-8", "replace")


def normalize_text(text: str) -> str:
    """NFC-normalize, canonicalize whitespace, drop control chars.

    Line structure is preserved: runs of horizontal whitespace collapse to
    a single space, lines are stripped, empty lines dropped, lines joined
    with a single ``\\n``. This is the ONE place whitespace policy lives so
    the byte-identity contract has a single definition (SURVEY §2.B3).
    """
    text = unicodedata.normalize("NFC", text)
    # Both substitutions run over the WHOLE text (2 C-level sub calls per
    # doc instead of 2 per line — the per-line form was ~90 sub calls per
    # doc): neither pattern can cross a line boundary, because the Cc/Cf
    # class explicitly excludes \n and _SPACES_RE is [^\S\n]+ — so this
    # is byte-identical to the per-line formulation (A/B-tested).
    text = _cc_cf_class().sub(" ", text)
    text = _SPACES_RE.sub(" ", text)
    return "\n".join(
        line for line in (ln.strip() for ln in text.split("\n")) if line
    )


_CC_CF_CLASS: "re.Pattern | None" = None


def _cc_cf_class() -> "re.Pattern":
    """Compiled character class of every Cc/Cf codepoint EXCEPT ``\\n``
    as contiguous RANGES — byte-identical to the per-char
    ``unicodedata.category`` test it replaces (the newline exclusion is
    what lets ``normalize_text`` substitute over the whole text instead
    of per line), ~5× faster on the corpus-wide extraction hot path.
    Built lazily once per process (~0.15 s — a full unicodedata
    sweep)."""
    global _CC_CF_CLASS
    if _CC_CF_CLASS is None:
        import sys

        cps = [
            cp for cp in range(sys.maxunicode + 1)
            if cp != 0x0A and unicodedata.category(chr(cp)) in ("Cc", "Cf")
        ]
        ranges: list[tuple[int, int]] = []
        start = prev = cps[0]
        for cp in cps[1:]:
            if cp == prev + 1:
                prev = cp
                continue
            ranges.append((start, prev))
            start = prev = cp
        ranges.append((start, prev))
        pat = "[" + "".join(
            re.escape(chr(a)) if a == b
            else f"{re.escape(chr(a))}-{re.escape(chr(b))}"
            for a, b in ranges
        ) + "]"
        _CC_CF_CLASS = re.compile(pat)
    return _CC_CF_CLASS


def extract_text(raw_html: bytes | str) -> str:
    """Deterministic trafilatura-style HTML → text (SURVEY §2.B1).

    Pure function; byte-identical output for identical input bytes on any
    worker. Robust to malformed HTML (unclosed tags, bad entities, empty
    body): every step is a regex rewrite that cannot fail.
    """
    text = decode_html(raw_html)
    text = _COMMENT_RE.sub(" ", text)
    # Drop matched boilerplate/script containers (repeat: dropping one
    # container can expose a newly-matched outer pair).
    prev = None
    while prev != text:
        prev = text
        text = _DROP_RE.sub("\n", text)
    # Valid-HTML5 shapes the unclosed check would mis-truncate at:
    # self-closing drop tags contain nothing, and an omitted </head>
    # legally ends where <body> starts.
    text = _DROP_SELF_RE.sub("\n", text)
    text = _HEAD_TO_BODY_RE.sub("\n", text)
    # Malformed leftovers: an unclosed <script>/<style>/... swallows the rest.
    m = _DROP_OPEN_RE.search(text)
    if m:
        text = text[: m.start()] + "\n"
    text = _BLOCK_RE.sub("\n", text)
    text = _ANY_TAG_RE.sub(" ", text)
    text = _htmlmod.unescape(text)
    return normalize_text(text)


def extract_page_text(
    raw_html: bytes | str | None, fallback_text: str | None = None
) -> str:
    """B1 page-level rule: extract from html; when a page carries no html
    (a NULL html column — e.g. a text-only corpus adapted to the pages
    schema) fall back to the normalized raw ``text`` column. One
    definition, shared by the Ray stage and the reference emitter."""
    out = "" if raw_html is None else extract_text(raw_html)
    if not out and fallback_text:
        return normalize_text(fallback_text)
    return out


def sha256_hex(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


# --- sentences --------------------------------------------------------------

_SENT_SPLIT_RE = re.compile(r"(?<=[.!?])\s+")


def split_sentences(extracted_text: str) -> list[str]:
    """Deterministic rule-based sentence splitting (SURVEY §2.B4).

    Each line is an independent block; within a line, split after
    sentence-final punctuation followed by whitespace.
    """
    sents: list[str] = []
    for line in extracted_text.split("\n"):
        for s in _SENT_SPLIT_RE.split(line):
            s = s.strip()
            if s:
                sents.append(s)
    return sents


# --- urls -------------------------------------------------------------------

_URL_RE = re.compile(
    r"^(?P<scheme>[a-zA-Z][a-zA-Z0-9+.-]*)://(?P<host>[^/?#]*)"
    r"(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?(?:#.*)?$"
)


def url_normalize(url: str) -> str:
    """Stable dedup/partition key (SURVEY §2.B7): lowercase scheme+host,
    strip fragment, sort query params, drop trailing slash (except root)."""
    m = _URL_RE.match(url.strip())
    if not m:
        return url.strip()
    scheme = m.group("scheme").lower()
    host = m.group("host").lower()
    path = m.group("path") or "/"
    if len(path) > 1 and path.endswith("/"):
        path = path.rstrip("/") or "/"
    query = m.group("query")
    if query:
        parts = sorted(p for p in query.split("&") if p)
        if parts:  # '?&' / '?' alone is no query — same key as without it
            return f"{scheme}://{host}{path}?" + "&".join(parts)
    return f"{scheme}://{host}{path}"


# --- stable hashing ---------------------------------------------------------


def stable_u64(s: str, salt: str = "") -> int:
    """Deterministic 64-bit hash (process/ordering independent — unlike
    builtin ``hash`` which is randomized per process).

    The salt is plain-concatenated, so ``(salt, s)`` pairs with shifted
    boundaries collide BY CONSTRUCTION (``('a','bc') == ('ab','c')``).
    Repo contract: salts are short fixed literals, none a prefix of
    another ("decontam", "tokpack", "ivfsample", "ngramlm", "qclf", …) —
    keep that when adding one.  (Length-prefixing would fix the class
    but change every persisted hash: minhash signatures, content
    indexes, pack ids.)"""
    h = hashlib.blake2b((salt + s).encode("utf-8"), digest_size=8)
    return int.from_bytes(h.digest(), "big")
