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
    r"^\s*<(?P<s>[^>]*)>\s+<(?P<p>[^>]*)>\s+"
    r"(?:<(?P<o>[^>]*)>|\"(?P<lit>(?:[^\"\\]|\\.)*)\"(?:\^\^<(?P<dt>[^>]*)>)?)\s*\.\s*$"
)

_XSD_GYEAR = "http://www.w3.org/2001/XMLSchema#gYear"
# datatype-carriage sentinel inside a "lit:<lex>^^<dt>" token for literals
# that were PLAIN in the source but whose lexical form would otherwise be
# re-typed by the engine's year inference (keeps write∘parse faithful)
_PLAIN_DT = "plain"


def _escape(s: str) -> str:
    return s.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n").replace("\r", "\\r")


def _unescape(s: str) -> str:
    return (
        s.replace("\\r", "\r").replace("\\n", "\n").replace('\\"', '"').replace("\\\\", "\\")
    )


def to_nt_lines(batch: pa.Table, base: str = DEFAULT_BASE) -> pa.Table:
    """triples(subj, pred, obj) → one N-Triples line per row. Objects with
    the ``lit:`` marker serialize as literals — typed ``^^xsd:gYear`` for
    4-digit values, plain string literals otherwise (kbgen KBs contain
    literal-valued facts)."""

    def obj_term(o: str) -> str:
        if o.startswith("lit:"):
            v = o[4:]
            if "^^" in v:
                # externally-parsed literal with explicit datatype carriage
                # (see parse_nt_batch) — re-emit exactly what was read
                lex, dt = v.split("^^", 1)
                if dt in ("", _PLAIN_DT):
                    return f'"{_escape(lex)}"'
                return f'"{_escape(lex)}"^^<{dt}>'
            if v.isdigit() and len(v) == 4:
                return f'"{_escape(v)}"^^<{_XSD_GYEAR}>'
            return f'"{_escape(v)}"'
        return f"<{base}entity/{o}>"

    lines = [
        f"<{base}entity/{s}> <{base}pred/{p}> {obj_term(o)} ."
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
        s = strip(m.group("s"), "entity")
        p = strip(m.group("p"), "pred")
        if m.group("o") is not None:
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
            is_year = lex.isdigit() and len(lex) == 4
            if dt is None:
                o = f"lit:{lex}^^{_PLAIN_DT}" if is_year else f"lit:{lex}"
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
    triples_ds.map_batches(
        write_block, batch_format="pyarrow", batch_size=65536
    ).materialize()


def read_ntriples(path: str, base: str = DEFAULT_BASE):
    """N-Triples file(s) → Dataset[triples] via read_text + batch parser.
    Directories read only ``*.nt`` parts (never in-flight ``.tmp-`` files
    a crashed writer may have left behind)."""
    import os

    import ray.data as rd

    if os.path.isdir(path):
        parts = sorted(
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(".nt")
        )
        ds = rd.read_text(parts if parts else path)
    else:
        ds = rd.read_text(path)
    return ds.map_batches(lambda t, b=base: parse_nt_batch(t, b), batch_format="pyarrow")
