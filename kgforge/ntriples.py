"""N-Triples I/O (SURVEY §2.S6-S7) — the reference tool's interchange
format, implemented from scratch (no rdflib in this environment): a
regex parser and a deterministic serializer, both as Ray Data stages.

Entity/predicate ids are mapped to URIs under a configurable base
namespace; string literals are escaped per the N-Triples grammar.
"""

from __future__ import annotations

import re

import pyarrow as pa

DEFAULT_BASE = "http://kgforge.example/"

_NT_LINE = re.compile(
    r"^\s*(?:<(?P<s>[^>]*)>|(?P<sb>_:\S+))\s+<(?P<p>[^>]*)>\s+"
    r"(?:<(?P<o>[^>]*)>|(?P<ob>_:\S+)|\"(?P<lit>(?:[^\"\\]|\\.)*)\""
    r"(?:\^\^<(?P<dt>[^>]*)>|@(?P<lang>[A-Za-z]+(?:-[A-Za-z0-9]+)*))?)"
    r"\s*\.\s*(?:#.*)?$"
)

_LANG_TAG = re.compile(r"^[A-Za-z]+(?:-[A-Za-z0-9]+)*$")
#: ids that are already absolute IRIs (scheme + IRIREF shape) — parse
#: keeps them verbatim, so the serializer must emit them verbatim too
#: instead of base-prefixing (which would double-prefix foreign IRIs)
_SCHEME = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")

_XSD_GYEAR = "http://www.w3.org/2001/XMLSchema#gYear"
# datatype-carriage sentinel inside a "lit:<lex>^^<dt>" token for literals
# that were PLAIN in the source but whose lexical form would otherwise be
# re-typed by the engine's year inference (keeps write∘parse faithful)
_PLAIN_DT = "plain"
# a carriage suffix is only honored when the candidate datatype is the
# sentinel or a syntactically valid absolute IRI (IRIREF forbids controls,
# space, <>"{}|^`\ — so a datatype segment can never contain "^^", making
# rsplit("^^", 1) unambiguous for every token parse_nt_batch produces)
_DT_IRI = re.compile(r'^[^\x00-\x20<>"{}|^`\\]+$')


def make_literal(lex: str, dt: str | None = None, lang: str | None = None) -> str:
    """Canonical ``lit:`` token for a literal object — the ONLY way engine
    code should construct one. Appends the plain-marker carriage whenever
    the bare form would be ambiguous on re-write (year-shaped lexical
    forms the serializer would re-type as gYear, and lexical forms
    containing ``^^`` that would otherwise be mis-read as a datatype
    carriage), so ``to_nt_lines ∘ parse_nt_batch`` is faithful for every
    token produced through this constructor. ``lang`` carries an RDF
    language tag (``"x"@en``) as a ``^^@<tag>`` carriage — a tag can
    never be a datatype IRI (no colon), so the two suffixes cannot
    collide."""
    is_year = lex.isdigit() and len(lex) == 4
    if lang is not None:
        if dt is not None:
            raise ValueError("make_literal: lang and dt are mutually exclusive")
        if not _LANG_TAG.match(lang):
            raise ValueError(f"make_literal: malformed language tag {lang!r}")
        return f"lit:{lex}^^@{lang}"
    if dt is None:
        if is_year or "^^" in lex:
            return f"lit:{lex}^^{_PLAIN_DT}"
        return f"lit:{lex}"
    if dt in (_XSD_GYEAR, "gYear"):
        if is_year:
            return f"lit:{lex}"  # engine-native gYear form (serializer re-types)
        raise ValueError(
            f"make_literal: gYear datatype requires a 4-digit lexical, got {lex!r}"
        )
    if ":" not in dt or not _DT_IRI.match(dt):
        # a short name like 'decimal' would fail obj_term's IRI-shape check
        # on write and end up INSIDE the literal's lexical form — reject
        # here instead of silently emitting a non-round-trippable token
        raise ValueError(
            f"make_literal: datatype must be an absolute IRI (got {dt!r})"
        )
    return f"lit:{lex}^^{dt}"


def _escape(s: str) -> str:
    return s.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n").replace("\r", "\\r")


_ESC_SEQ = re.compile(r"\\(u[0-9A-Fa-f]{4}|U[0-9A-Fa-f]{8}|.)")
_ESC_MAP = {"n": "\n", "r": "\r", "t": "\t", "b": "\b", "f": "\f"}


def _unescape(s: str) -> str:
    # single pass (sequential .replace corrupts a literal backslash
    # followed by 'n'/'r': "\\n" -> "\\\\n" -> backslash+newline);
    # \uXXXX/\UXXXXXXXX accepted from foreign N-Triples files
    def sub(m: re.Match) -> str:
        g = m.group(1)
        if g[0] in "uU" and len(g) > 1:
            return chr(int(g[1:], 16))
        return _ESC_MAP.get(g, g)

    return _ESC_SEQ.sub(sub, s)


def to_nt_lines(batch: pa.Table, base: str = DEFAULT_BASE) -> pa.Table:
    """triples(subj, pred, obj) → one N-Triples line per row. Objects with
    the ``lit:`` marker serialize as literals — typed ``^^xsd:gYear`` for
    4-digit values, plain string literals otherwise (kbgen KBs contain
    literal-valued facts)."""

    def iri_term(x: str, kind: str) -> str:
        # blank nodes and already-absolute IRIs (what parse_nt_batch keeps
        # verbatim for foreign files) serialize verbatim — base-prefixing
        # them would double-prefix every id outside the base namespace
        if x.startswith("_:"):
            return x
        if _SCHEME.match(x) and _DT_IRI.match(x):
            return f"<{x}>"
        return f"<{base}{kind}/{x}>"

    def obj_term(o: str) -> str:
        if o.startswith("lit:"):
            v = o[4:]
            if "^^" in v:
                # possibly a literal with explicit datatype carriage (see
                # parse_nt_batch) — honor the suffix only when it IS a
                # carriage (sentinel, @lang tag, or valid IRI with a scheme
                # colon); a plain lexical form that merely contains "^^"
                # falls through
                lex, dt = v.rsplit("^^", 1)
                if dt == _PLAIN_DT:
                    return f'"{_escape(lex)}"'
                if dt.startswith("@") and _LANG_TAG.match(dt[1:]):
                    return f'"{_escape(lex)}"@{dt[1:]}'
                if ":" in dt and _DT_IRI.match(dt):
                    return f'"{_escape(lex)}"^^<{dt}>'
            if v.isdigit() and len(v) == 4:
                return f'"{_escape(v)}"^^<{_XSD_GYEAR}>'
            return f'"{_escape(v)}"'
        return iri_term(o, "entity")

    lines = [
        f"{iri_term(s, 'entity')} {iri_term(p, 'pred')} {obj_term(o)} ."
        for s, p, o in zip(
            batch["subj"].to_pylist(), batch["pred"].to_pylist(), batch["obj"].to_pylist()
        )
    ]
    return pa.table({"line": pa.array(lines, pa.string())})


def parse_nt_batch(batch: pa.Table, base: str = DEFAULT_BASE) -> pa.Table:
    """text lines → triples(subj, pred, obj); malformed lines and literal
    objects parse deterministically (literals kept verbatim, prefix
    stripped when it matches the base namespace)."""
    col = "line" if "line" in batch.column_names else "text"
    subs, preds, objs = [], [], []

    def strip(uri: str, kind: str) -> str:
        pfx = f"{base}{kind}/"
        return uri[len(pfx):] if uri.startswith(pfx) else uri

    for line in batch[col].to_pylist():
        if not line or line.lstrip().startswith("#"):
            continue
        m = _NT_LINE.match(line)
        if not m:
            continue
        s = m.group("sb") or strip(m.group("s"), "entity")
        p = strip(m.group("p"), "pred")
        if m.group("ob") is not None:
            o = m.group("ob")
        elif m.group("o") is not None:
            o = strip(m.group("o"), "entity")
        else:
            # literal objects carry the engine's "lit:" marker in the
            # triples schema. Engine-native year literals (gYear, 4-digit
            # lexical) normalize to the bare "lit:<lex>" form the rest of
            # the engine produces; any OTHER explicit datatype — and plain
            # literals the year inference would mis-type on re-write — keep
            # the datatype inline ("lit:<lex>^^<dt>") so write∘parse is
            # faithful (no silently re-guessed datatypes)
            lex = _unescape(m.group("lit"))
            dt = m.group("dt")
            lang = m.group("lang")
            is_year = lex.isdigit() and len(lex) == 4
            if lang is not None:
                o = f"lit:{lex}^^@{lang}"
            elif dt is None:
                # the sentinel also guards plain lexical forms CONTAINING
                # "^^", which to_nt_lines would otherwise mis-read as a
                # datatype carriage (rsplit pairs with this marker)
                needs_marker = is_year or "^^" in lex
                o = f"lit:{lex}^^{_PLAIN_DT}" if needs_marker else f"lit:{lex}"
            elif dt == _XSD_GYEAR and is_year:
                o = f"lit:{lex}"
            else:
                o = f"lit:{lex}^^{dt}"
        subs.append(s)
        preds.append(p)
        objs.append(o)
    return pa.table(
        {
            "subj": pa.array(subs, pa.string()),
            "pred": pa.array(preds, pa.string()),
            "obj": pa.array(objs, pa.string()),
        }
    )


def write_ntriples(triples_ds, out_dir: str, base: str = DEFAULT_BASE) -> None:
    """triples Dataset → directory of .nt part files, written by the
    WORKERS (round 2 — was a driver-side iter_batches loop): each task
    serializes its batch and writes one uniquely-named part file, so the
    sink streams and scales with the cluster. ``out_dir`` must be on a
    filesystem all workers see (true single-node; a shared mount or
    object-store URI on a real cluster)."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table, b=base) -> pa.Table:
        import hashlib

        lines = to_nt_lines(t, b)
        payload = ("\n".join(lines["line"].to_pylist()) + "\n").encode("utf-8")
        # content-digest part names make the sink idempotent: a re-run or a
        # retried/lineage-reconstructed task rewrites the SAME file instead
        # of accumulating duplicates (byte-identical blocks coalesce, which
        # cannot occur for the engine's distinct-triples output)
        name = f"part-{hashlib.sha256(payload).hexdigest()[:20]}.nt"
        # tmp name stays unique per writer (two tasks may race on identical
        # content); only the FINAL rename target is deterministic
        import os as _os
        import uuid

        tmp = os.path.join(out_dir, f".tmp-{uuid.uuid4().hex}-{_os.getpid()}")
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table({"path": pa.array([name], pa.string()),
                         "n_lines": pa.array([t.num_rows], pa.int64())})

    # consume to drive the streaming write; the result is tiny (1 row/file)
    written = triples_ds.map_batches(
        write_block, batch_format="pyarrow", batch_size=65536
    ).materialize()
    # a manifest pins the CURRENT run's part set: re-running into the same
    # dir with changed data produces different digests, and without this the
    # old parts would survive and read_ntriples would union stale triples
    names = sorted({r["path"] for r in written.take_all()})
    manifest_path = os.path.join(out_dir, "_MANIFEST")
    # stale cleanup is scoped to the PREVIOUS manifest's parts: only files
    # this sink wrote in the superseded run are deleted — hand-placed or
    # foreign *.nt files in the same directory are never touched (they are
    # also never read: read_ntriples follows the manifest)
    prev: set[str] = set()
    if os.path.isfile(manifest_path):
        with open(manifest_path, encoding="utf-8") as fh:
            prev = {ln.strip() for ln in fh if ln.strip()}
    tmp = os.path.join(out_dir, f".tmp-manifest-{os.getpid()}")
    with open(tmp, "w", encoding="utf-8") as f:
        f.write("\n".join(names) + ("\n" if names else ""))
    os.replace(tmp, manifest_path)
    for f in prev - set(names):
        try:
            os.remove(os.path.join(out_dir, f))
        except FileNotFoundError:
            pass


def read_ntriples(path: str, base: str = DEFAULT_BASE):
    """N-Triples file(s) → Dataset[triples] via read_text + batch parser.
    Directories read the ``_MANIFEST`` part list when present (exactly the
    last completed write — never stale parts from a previous run or
    in-flight ``.tmp-`` files a crashed writer left behind), else all
    ``*.nt`` parts."""
    import os

    import ray.data as rd

    if os.path.isdir(path):
        manifest = os.path.join(path, "_MANIFEST")
        if os.path.isfile(manifest):
            with open(manifest, encoding="utf-8") as fh:
                names = [ln.strip() for ln in fh if ln.strip()]
            parts = [os.path.join(path, n) for n in names]
        else:
            parts = sorted(
                os.path.join(path, f) for f in os.listdir(path) if f.endswith(".nt")
            )
        if not parts:
            if os.path.isfile(manifest):
                # an empty _MANIFEST is POSITIVE evidence of an empty graph
                # (an empty-dataset write) — falling back to read_text(dir)
                # would slurp _MANIFEST itself plus any .tmp- debris a
                # crashed writer left, resurrecting stale triples
                return rd.from_arrow(
                    pa.table({"subj": pa.array([], pa.string()),
                              "pred": pa.array([], pa.string()),
                              "obj": pa.array([], pa.string())})
                )
            # no manifest AND no *.nt parts: this directory was not written
            # by write_ntriples — a silent empty graph here would turn a
            # mis-targeted path or foreign-named parts into data loss
            raise FileNotFoundError(
                f"read_ntriples: no _MANIFEST and no *.nt parts in {path!r}; "
                "pass explicit file paths for foreign-named N-Triples files"
            )
        ds = rd.read_text(parts)
    else:
        ds = rd.read_text(path)
    return ds.map_batches(lambda t, b=base: parse_nt_batch(t, b), batch_format="pyarrow")
