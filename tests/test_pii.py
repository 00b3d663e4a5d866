"""PII redaction (kgforge/pii.py) vs a DuckDB regexp_replace oracle
(same RE2 dialect) plus pattern-contract unit cases."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from kgforge.pii import PII_PATTERNS, pii_counts, redact_batch, redact_pii

_DOCS = [
    "Contact jane.doe+spam@example.co.uk or call +1 (555) 123-4567 today.",
    "server at 192.168.1.254 answered; backup at 10.0.0.999 did not",
    "no pii here, just words and the number 42",
    "mixed: bob@site.org then 8.8.8.8 then 0044 7911 123456 end",
    "",
    None,
    "edge email a@b.io touching punctuation: a@b.io, (a@b.io)",
    "build 1234.5.6.7890 done and v10.20.30.40 stays",  # NOT ips (\b guards)
]


def _tbl():
    return pa.table({"doc_id": list(range(len(_DOCS))),
                     "text": pa.array(_DOCS, pa.string())})


def test_redaction_matches_duckdb_oracle():
    """Byte-identical to DuckDB's RE2 regexp_replace applied in the
    same order — the SQL a user would write for the same scrub."""
    got = redact_batch(_tbl())["text"].to_pylist()
    df = pd.DataFrame({"text": _DOCS})
    e_pat, e_rep = PII_PATTERNS["email"]
    i_pat, i_rep = PII_PATTERNS["ip"]
    p_pat, p_rep = PII_PATTERNS["phone"]
    want = duckdb.sql(
        f"""
        SELECT regexp_replace(regexp_replace(regexp_replace(text,
            '{e_pat}', '{e_rep}', 'g'),
            '{i_pat}', '{i_rep}', 'g'),
            '{p_pat}', '{p_rep}', 'g') AS text
        FROM df
        """
    ).df()["text"]
    want = [None if pd.isna(x) else x for x in want]
    assert got == list(want)


def test_pattern_contracts():
    out = redact_batch(_tbl())["text"].to_pylist()
    assert out[0] == "Contact <EMAIL> or call <PHONE> today."
    assert out[1] == "server at <IP> answered; backup at <IP> did not"
    assert out[2] == _DOCS[2]  # untouched
    assert "<EMAIL>" in out[3] and "<IP>" in out[3] and "<PHONE>" in out[3]
    assert out[4] == "" and out[5] is None
    assert out[6] == "edge email <EMAIL> touching punctuation: <EMAIL>, (<EMAIL>)"
    # word-boundary guards: longer dotted numbers and version strings
    # are not chewed mid-token into partial <IP>s (review fix) — though
    # "1234.5.6.7890" IS phone-shaped (12 digits, dot separators) and
    # the phone pass redacts it whole, the documented FP direction
    assert out[7] == "build <PHONE> done and v10.20.30.40 stays"


def test_counts_and_dataset_stage(ray_session):
    ds = rd.from_arrow(_tbl()).repartition(3)
    counts = pii_counts(ds).to_pandas().sort_values("doc_id")
    assert counts["n_pii_email"].tolist() == [1, 0, 0, 1, 0, 0, 3, 0]
    assert counts["n_pii_ip"].tolist() == [0, 2, 0, 1, 0, 0, 0, 0]
    assert counts["n_pii_phone"].iloc[0] == 1
    # residue-based audit: the dotted IPs in doc 1 are NOT double-
    # counted as phones — counts equal actual <PHONE> emissions
    assert counts["n_pii_phone"].iloc[1] == 0
    red = redact_pii(ds).to_pandas().sort_values("doc_id")
    assert "<EMAIL>" in red["text"].iloc[0]
    assert list(red.columns) == ["doc_id", "text"]  # schema unchanged


def test_kinds_subset_and_validation(ray_session):
    ds = rd.from_arrow(_tbl())
    only_email = redact_pii(ds, kinds=("email",)).to_pandas().sort_values("doc_id")
    assert "<EMAIL>" in only_email["text"].iloc[0]
    assert "555" in only_email["text"].iloc[0]  # phone untouched
    with pytest.raises(ValueError, match="unknown pii kinds"):
        redact_pii(ds, kinds=("ssn",))


def test_pii_in_curation_pipeline(ray_session):
    """redact_pii=True scrubs BEFORE dedup: two docs differing only in
    an email dedupe together after redaction."""
    import pandas as pd

    from kgforge.pipelines.curation import curate_corpus

    body = ("the committee report discusses the annual harbor budget and "
            "the winter schedule for the market district today")
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                f"{body} contact alice@a.org",
                f"{body} contact bob@b.net",
                f"a different article about the north road closures and "
                f"the stone bridge repairs planned for the summer season",
            ],
        }
    )
    ds = rd.from_pandas(docs)
    res = curate_corpus(ds, min_quality=0.1, pack=False, redact_pii=True)
    out = res.docs.to_pandas().sort_values("doc_id")
    assert sorted(out["doc_id"]) == [1, 3]  # 2 deduped against redacted 1
    assert "<EMAIL>" in out["text"].iloc[0]
    # redaction makes the pair EXACT dups (caught by the hash stage);
    # unredacted they differ by one email and only the LSH stage drops
    assert res.stats["after_exact_dedup"] == 2
    res2 = curate_corpus(ds, min_quality=0.1, pack=False)
    assert res2.stats["after_exact_dedup"] == 3
    assert res2.stats["neardup_dropped"] == 1


def test_redact_batch_canonicalizes_caller_order():
    """Direct redact_batch callers get the declared-safe kind order no
    matter how they spell kinds — ('phone','ip','email') must not let
    the phone pattern chew dotted IPs / email digit runs first."""
    import pyarrow as pa

    from kgforge.pii import redact_batch

    t = pa.table({"text": ["mail 5551234567@example.com ip 10.0.0.1 tel 5551234567"]})
    want = redact_batch(t)["text"].to_pylist()
    got = redact_batch(t, kinds=("phone", "ip", "email"))["text"].to_pylist()
    assert got == want
    assert "<EMAIL>" in got[0] and "<IP>" in got[0] and "<PHONE>" in got[0]
    with pytest.raises(ValueError, match="unknown pii kinds"):
        redact_batch(t, kinds=("email", "ssn"))
