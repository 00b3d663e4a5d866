"""Unit + property tests for the pure extraction core (SURVEY §5.4.1-2)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from kgforge.extract_core import (
    extract_text,
    normalize_text,
    split_sentences,
    url_normalize,
)


def test_basic_extraction():
    h = (
        b"<html><head><title>T</title><script>var x=1;</script></head>"
        b"<body><nav>home | about</nav><h1>Hello &amp; world</h1>"
        b"<p>One  two.\tThree&nbsp;four.</p><div>Second block</div>"
        b"<footer>c 2024</footer></body></html>"
    )
    assert extract_text(h) == "Hello & world\nOne two. Three four.\nSecond block"


def test_boilerplate_dropped():
    h = b"<body><style>.x{}</style><aside>ads</aside><p>keep me</p><footer>no</footer></body>"
    assert extract_text(h) == "keep me"


def test_malformed_unclosed_script_swallows_rest():
    assert extract_text(b"<p>before</p><script>var broken = {<p>after</p>") == "before"


def test_malformed_bad_entity_kept_verbatim():
    assert extract_text(b"<p>&badent; text</p>") == "&badent; text"


def test_empty_and_garbage():
    assert extract_text(b"") == ""
    assert extract_text(b"<body></body>") == ""
    assert extract_text(b"\xff\xfe garbage <p>ok</p>") == "�� garbage\nok"


def test_extraction_deterministic():
    h = b"<p>same input</p>"
    assert extract_text(h) == extract_text(h) == extract_text(bytes(h))


@given(st.text(max_size=500))
@settings(max_examples=200, deadline=None)
def test_normalize_idempotent(s):
    once = normalize_text(s)
    assert normalize_text(once) == once


@given(st.binary(max_size=500))
@settings(max_examples=200, deadline=None)
def test_extract_never_raises_and_idempotent_on_text(b):
    out = extract_text(b)
    # extracting already-extracted text (no tags) is a fixpoint unless the
    # text itself contains tag-like or entity-like spans
    if "<" not in out and "&" not in out:
        assert extract_text(out.encode()) == out


def test_url_normalize():
    assert url_normalize("HTTPS://Site.Example/a/b/?z=1&a=2#frag") == "https://site.example/a/b?a=2&z=1"
    assert url_normalize("http://x.example/") == "http://x.example/"
    assert url_normalize("http://x.example") == "http://x.example/"
    assert url_normalize("not a url") == "not a url"


def test_split_sentences():
    assert split_sentences("A b. C d! E\nF g?") == ["A b.", "C d!", "E", "F g?"]
    assert split_sentences("") == []


def test_extract_valid_html5_shapes_not_truncated():
    """Omitted </head> (legal HTML5) and self-closing drop tags must not
    swallow the page — the unclosed-container truncation used to fire on
    both and silently empty valid documents."""
    from kgforge.extract_core import extract_text

    no_head_close = ("<html><head><meta charset=\"utf-8\"><title>T</title>"
                     "<body><p>Important article text</p></body></html>")
    assert extract_text(no_head_close) == "Important article text"

    self_closing = '<p>before</p><iframe src="x"/><p>after</p>'
    assert extract_text(self_closing) == "before\nafter"
    assert extract_text("<p>a</p><svg/><p>b</p>") == "a\nb"
    assert extract_text("<p>a</p><svg /><p>b</p>") == "a\nb"

    # genuinely unclosed script still truncates (rest is code)
    assert extract_text("<p>keep</p><script>var x=1;") == "keep"
    # HTML5: a "/" inside an UNQUOTED attribute value is part of the
    # value — the tag is OPEN, so an unclosed script with an unquoted
    # URL attr must still truncate, never leak its body as text
    leaky = "<p>keep</p><script src=https://cdn.x.com/lib/>var t=track();"
    assert extract_text(leaky) == "keep"


def test_extract_page_text_null_html_falls_back():
    from kgforge.extract_core import extract_page_text

    assert extract_page_text(None, "plain  text here") == "plain text here"
    assert extract_page_text(None, None) == ""
    assert extract_page_text(None, "") == ""


def test_url_normalize_empty_query_matches_bare():
    from kgforge.extract_core import url_normalize

    bare = url_normalize("http://x.com/a")
    assert url_normalize("http://X.com/a?&") == bare
    assert url_normalize("http://x.com/a?") == bare
    assert url_normalize("http://x.com/a?b=1&") == "http://x.com/a?b=1"
