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


def test_plain_literal_containing_caret_caret_roundtrips():
    """A plain literal whose TEXT contains '^^' must not be mis-read as a
    datatype carriage on re-write (lexical truncation + invented IRI)."""
    for lex in ("a^^b", "x^^http://evil.example/t", "ends^^", "2024^^plain"):
        esc = lex.replace("\\", "\\\\").replace('"', '\\"')
        src = pa.table({"line": [f'<http://kgforge.example/entity/e1> '
                                 f'<http://kgforge.example/pred/motto> "{esc}" .']})
        parsed = parse_nt_batch(src)
        out = to_nt_lines(parsed)
        assert parse_nt_batch(out).to_pylist() == parsed.to_pylist()
        line = out["line"].to_pylist()[0]
        assert f'"{esc}" .' in line, (lex, line)  # still a PLAIN literal


def test_write_ntriples_changed_data_removes_stale_parts(tmp_path):
    """Re-running the sink with DIFFERENT data must not leave the previous
    run's digest-named parts behind (read would union stale triples)."""
    out = str(tmp_path / "nt")
    write_ntriples(rd.from_arrow(_triples_table()), out)
    t2 = pa.table({"subj": ["e9"], "pred": ["p"], "obj": ["e8"]})
    write_ntriples(rd.from_arrow(t2), out)
    back = read_ntriples(out).to_pandas()
    assert back.to_dict("records") == t2.to_pylist()


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


def test_escape_unescape_backslash_sequences():
    """Literal backslash followed by 'n'/'r' must survive the round trip
    (sequential .replace unescaping corrupted it)."""
    from kgforge.ntriples import _escape, _unescape

    for s in ["\\n", "\\r", "a\\\\nb", "back\\slash", 'q"uote', "nl\nx", "\\"]:
        assert _unescape(_escape(s)) == s, repr(s)


def test_unicode_escapes_from_foreign_files():
    src = pa.table({"line": ['<http://x.example/e> <http://x.example/p> '
                             '"\\u0041\\U00000042\\tc" .']})
    parsed = parse_nt_batch(src)
    assert parsed["obj"].to_pylist() == ["lit:AB\tc"]


def test_literal_lexical_roundtrip_property():
    """Property: any lexical form round-trips write -> parse -> write with
    an identical emitted line (fixed point), and parse recovers the exact
    lexical text."""
    from hypothesis import given, settings, strategies as st

    from kgforge.ntriples import _PLAIN_DT

    @settings(max_examples=200, deadline=None)
    @given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40))
    def prop(lex):
        t = pa.table({"subj": ["e1"], "pred": ["p"], "obj": [f"lit:{lex}"]})
        line1 = to_nt_lines(t)
        parsed = parse_nt_batch(line1)
        assert parsed.num_rows == 1
        got = parsed["obj"].to_pylist()[0]
        # parse may add the plain-marker carriage; the lexical part must match
        assert got == f"lit:{lex}" or got == f"lit:{lex}^^{_PLAIN_DT}", (lex, got)
        line2 = to_nt_lines(parsed)
        assert line2["line"].to_pylist() == line1["line"].to_pylist(), lex

    prop()


def test_read_ntriples_empty_manifest_yields_empty_graph(tmp_path):
    """Empty-dataset write → empty _MANIFEST: read must return an EMPTY
    triples dataset, never fall back to slurping the directory (which
    would read _MANIFEST itself and any stale .tmp debris)."""
    out = str(tmp_path / "nt")
    empty = rd.from_arrow(pa.table({"subj": pa.array([], pa.string()),
                                    "pred": pa.array([], pa.string()),
                                    "obj": pa.array([], pa.string())}))
    write_ntriples(empty, out)
    # stale debris from a hypothetical crashed previous writer
    (tmp_path / "nt" / ".tmp-deadbeef-1").write_text(
        "<http://kgforge.example/entity/zz> <http://kgforge.example/pred/p> "
        "<http://kgforge.example/entity/yy> .\n")
    back = read_ntriples(out)
    assert back.count() == 0
    # (to_pandas() of a 0-row Dataset drops columns — assert on the schema)
    assert back.schema().names == ["subj", "pred", "obj"]


def test_make_literal_injective_for_ambiguous_lexicals():
    """Engine-native literals built via make_literal must round-trip
    write -> parse even when the lexical form is year-shaped or contains
    the '^^' carriage separator."""
    from kgforge.ntriples import make_literal

    cases = [
        ("hello", None), ("1984", None), ("a^^b", None),
        ("x^^http://evil.example/t", None), ("1984", "gYear"),
        ("3.14", "http://www.w3.org/2001/XMLSchema#decimal"),
    ]
    objs = [make_literal(lex, dt) for lex, dt in cases]
    t = pa.table({"subj": ["e"] * len(objs), "pred": ["p"] * len(objs),
                  "obj": objs})
    parsed = parse_nt_batch(to_nt_lines(t))
    assert parsed["obj"].to_pylist() == objs
    # and the lexical forms survive a second serialization unchanged
    assert to_nt_lines(parsed)["line"].to_pylist() == to_nt_lines(t)["line"].to_pylist()


def test_make_literal_rejects_non_roundtrippable_datatypes():
    import pytest

    from kgforge.ntriples import make_literal

    with pytest.raises(ValueError, match="gYear"):
        make_literal("198", "gYear")
    with pytest.raises(ValueError, match="absolute IRI"):
        make_literal("3.14", "decimal")


def test_read_ntriples_raises_on_foreign_directory(tmp_path):
    """A directory not written by write_ntriples (no _MANIFEST, no *.nt)
    must raise, not silently return an empty graph (data loss on a
    mis-targeted path or foreign-named parts)."""
    import pytest

    d = tmp_path / "export"
    d.mkdir()
    (d / "graph.ntriples").write_text(
        "<http://kgforge.example/entity/a> <http://kgforge.example/pred/p> "
        "<http://kgforge.example/entity/b> .\n")
    with pytest.raises(FileNotFoundError, match="no _MANIFEST"):
        read_ntriples(str(d))


def test_parse_foreign_grammar_lang_bnode_comment():
    """Valid N-Triples the original grammar silently dropped: language-
    tagged literals, blank-node subjects/objects, trailing comments."""
    lines = pa.table({"line": [
        '<http://kgforge.example/entity/a> <http://kgforge.example/pred/p> "hello"@en .',
        '_:b0 <http://kgforge.example/pred/p> <http://kgforge.example/entity/b> .',
        '<http://kgforge.example/entity/a> <http://kgforge.example/pred/p> _:b1 .',
        '<http://kgforge.example/entity/a> <http://kgforge.example/pred/p> '
        '<http://kgforge.example/entity/b> . # trailing comment',
        '<http://kgforge.example/entity/a> <http://kgforge.example/pred/p> "plain" .',
    ]})
    out = parse_nt_batch(lines)
    assert out.num_rows == 5
    assert out["obj"].to_pylist()[0] == "lit:hello^^@en"
    assert out["subj"].to_pylist()[1] == "_:b0"
    assert out["obj"].to_pylist()[2] == "_:b1"
    assert out["obj"].to_pylist()[4] == "lit:plain"


def test_foreign_iri_and_lang_write_parse_roundtrip():
    """write∘parse is the identity for foreign files: absolute IRIs and
    blank nodes serialize VERBATIM (no double base-prefixing), lang tags
    survive the lit-token carriage."""
    src = pa.table({"line": [
        '<http://dbpedia.org/resource/X> <http://dbpedia.org/ontology/knows> '
        '<http://dbpedia.org/resource/Y> .',
        '_:b0 <http://dbpedia.org/ontology/label> "Zürich"@de-CH .',
    ]})
    triples = parse_nt_batch(src)
    assert triples["subj"].to_pylist()[0] == "http://dbpedia.org/resource/X"
    lines = to_nt_lines(triples)["line"].to_pylist()
    assert lines[0] == ('<http://dbpedia.org/resource/X> '
                        '<http://dbpedia.org/ontology/knows> '
                        '<http://dbpedia.org/resource/Y> .')
    assert lines[1] == '_:b0 <http://dbpedia.org/ontology/label> "Zürich"@de-CH .'
    # engine-native ids still get the base namespace
    native = to_nt_lines(_triples_table())["line"].to_pylist()
    assert native[0].startswith("<http://kgforge.example/entity/e0001>")


def test_write_ntriples_preserves_foreign_nt_files(ray_session, tmp_path):
    """Stale-part cleanup is scoped to the previous _MANIFEST: a hand-
    placed .nt file in the output dir survives BOTH an initial write and
    a changed-data re-write (which must still delete its own old part)."""
    import os

    d = str(tmp_path / "out")
    os.makedirs(d)
    foreign = os.path.join(d, "hand-placed.nt")
    with open(foreign, "w") as f:
        f.write('<http://x/> <http://p/> <http://y/> .\n')
    write_ntriples(rd.from_arrow(_triples_table()), d)
    assert os.path.exists(foreign)
    old_parts = {f for f in os.listdir(d) if f.startswith("part-")}
    t2 = pa.table({"subj": ["e9"], "pred": ["works_for"], "obj": ["e10"]})
    write_ntriples(rd.from_arrow(t2), d)
    assert os.path.exists(foreign)  # foreign file still untouched
    new_parts = {f for f in os.listdir(d) if f.startswith("part-")}
    assert not (old_parts & new_parts)  # own stale parts replaced
    got = read_ntriples(d).to_pandas()
    assert got["subj"].tolist() == ["e9"]  # manifest reads only the new run
