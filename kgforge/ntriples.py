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
        o = (
            strip(m.group("o"), "entity")
            if m.group("o") is not None
            # literal objects carry the engine's "lit:" marker in the
            # triples schema (datatype is recoverable from the lexical form)
            else "lit:" + _unescape(m.group("lit"))
        )
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
        import uuid

        lines = to_nt_lines(t, b)
        name = f"part-{uuid.uuid4().hex}.nt"
        tmp = os.path.join(out_dir, f".tmp-{name}")
        with open(tmp, "w", encoding="utf-8") as f:
            f.write("\n".join(lines["line"].to_pylist()))
            f.write("\n")
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table({"path": pa.array([name], pa.string()),
                         "n_lines": pa.array([t.num_rows], pa.int64())})

    # consume to drive the streaming write; the result is tiny (1 row/file)
    triples_ds.map_batches(
        write_block, batch_format="pyarrow", batch_size=65536
    ).materialize()


def read_ntriples(path: str, base: str = DEFAULT_BASE):
    """N-Triples file(s) → Dataset[triples] via read_text + batch parser."""
    import ray.data as rd

    ds = rd.read_text(path)
    return ds.map_batches(lambda t, b=base: parse_nt_batch(t, b), batch_format="pyarrow")
