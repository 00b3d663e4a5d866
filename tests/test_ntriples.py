from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from kgforge.ntriples import (
    parse_nt_batch,
    read_ntriples,
    to_nt_lines,
    write_ntriples,
)


def _triples_table():
    return pa.table(
        {
            "subj": ["e0001", "e0002"],
            "pred": ["works_for", "located_in"],
            "obj": ["e0100", "e0200"],
        }
    )


def test_roundtrip_lines():
    t = _triples_table()
    lines = to_nt_lines(t)
    back = parse_nt_batch(lines)
    assert back.to_pylist() == t.to_pylist()


def test_literal_and_malformed_lines():
    lines = pa.table(
        {
            "line": [
                '<http://kgforge.example/entity/e1> <http://kgforge.example/pred/name> "Alice \\"A\\" Smith" .',
                "# comment",
                "",
                "garbage line without structure",
                "<http://other.example/x> <http://other.example/p> <http://other.example/y> .",
            ]
        }
    )
    out = parse_nt_batch(lines).to_pylist()
    # literal objects carry the engine's lit: marker in the triples schema
    assert out[0] == {"subj": "e1", "pred": "name", "obj": 'lit:Alice "A" Smith'}
    assert out[1]["subj"] == "http://other.example/x"  # foreign URIs kept verbatim
    assert len(out) == 2  # comment/blank/garbage dropped


def test_typed_literal_roundtrip():
    t = pa.table(
        {
            "subj": ["e0001", "e0002"],
            "pred": ["founded_in", "motto"],
            "obj": ["lit:1987", "lit:just words"],
        }
    )
    lines = to_nt_lines(t)
    txt = lines["line"].to_pylist()
    assert '"1987"^^<http://www.w3.org/2001/XMLSchema#gYear>' in txt[0]
    assert txt[1].endswith('"just words" .')
    back = parse_nt_batch(lines)
    assert back.to_pylist() == t.to_pylist()


def test_file_roundtrip(tmp_path):
    ds = rd.from_arrow(_triples_table())
    out = str(tmp_path / "nt")
    write_ntriples(ds, out)
    back = read_ntriples(out).to_pandas().sort_values("subj").reset_index(drop=True)
    assert back.to_dict("records") == _triples_table().to_pylist()
