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


def test_plain_year_literal_not_retyped():
    """A PLAIN 4-digit literal from an external file must stay plain on
    re-write (not silently re-typed as xsd:gYear) — write∘parse faithful."""
    src = pa.table({"line": ['<http://kgforge.example/entity/e1> '
                             '<http://kgforge.example/pred/motto> "2024" .']})
    parsed = parse_nt_batch(src)
    assert parsed["obj"].to_pylist() == ["lit:2024^^plain"]
    out = to_nt_lines(parsed)["line"].to_pylist()[0]
    assert '"2024" .' in out and "gYear" not in out
    # engine-native year literals still serialize typed
    eng = to_nt_lines(pa.table({"subj": ["e1"], "pred": ["founded_in"],
                                "obj": ["lit:1998"]}))["line"].to_pylist()[0]
    assert "gYear" in eng


def test_foreign_datatype_preserved():
    dt = "http://www.w3.org/2001/XMLSchema#integer"
    src = pa.table({"line": [f'<http://kgforge.example/entity/e1> '
                             f'<http://kgforge.example/pred/n_employees> '
                             f'"12345"^^<{dt}> .']})
    parsed = parse_nt_batch(src)
    assert parsed["obj"].to_pylist() == [f"lit:12345^^{dt}"]
    out = to_nt_lines(parsed)["line"].to_pylist()[0]
    assert f'"12345"^^<{dt}>' in out


def test_write_ntriples_rerun_idempotent(tmp_path):
    """Content-digest part names: re-running the sink into the same dir
    must not accumulate duplicate part files."""
    import os

    ds = rd.from_arrow(_triples_table())
    out = str(tmp_path / "nt")
    write_ntriples(ds, out)
    first = sorted(os.listdir(out))
    write_ntriples(rd.from_arrow(_triples_table()), out)
    assert sorted(os.listdir(out)) == first
    back = read_ntriples(out).to_pandas()
    assert len(back) == 2


def test_read_ntriples_skips_stale_tmp(tmp_path):
    ds = rd.from_arrow(_triples_table())
    out = str(tmp_path / "nt")
    write_ntriples(ds, out)
    # a crashed writer's leftover
    (tmp_path / "nt" / ".tmp-deadbeef-123").write_text(
        "<http://kgforge.example/entity/zz> "
        "<http://kgforge.example/pred/p> "
        "<http://kgforge.example/entity/yy> .\n")
    back = read_ntriples(out).to_pandas()
    assert len(back) == 2 and "zz" not in set(back["subj"])
