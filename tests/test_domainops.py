"""Per-domain caps (kgforge/domainops.py): extraction unit tests, a
DuckDB row_number oracle, and driver==distributed plan equivalence."""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from kgforge.domainops import add_domain, domain_cap, domain_histogram, domain_of

_DOMAINS = [
    "hot.example.com", "alpha.org", "beta.net", "gamma.io", "delta.dev",
    "epsilon.co", "zeta.app", "eta.site", "theta.info", "iota.biz",
]


def _corpus(n=300, seed=3):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        # skew: half the corpus on the hot domain
        dom = _DOMAINS[0] if i % 2 == 0 else rng.choice(_DOMAINS[1:])
        www = "www." if rng.random() < 0.5 else ""
        rows.append(
            {
                "doc_id": i,
                "url": f"https://{www}{dom}/p/{i}?x=1",
                "quality": round(rng.random(), 6),
            }
        )
    return pd.DataFrame(rows)


def test_domain_of_extraction():
    urls = pa.array(
        [
            "https://www.Example.COM/path?q=1",
            "http://user:pw@sub.site.org:8080/x",
            "example.com/no/scheme",
            "ftp://files.host.net",
            "https://www.www.double.org/",  # only ONE www. stripped
            None,
            "not a url at all",
        ]
    )
    assert domain_of(urls).to_pylist() == [
        "example.com",
        "sub.site.org",
        "example.com",
        "files.host.net",
        "www.double.org",
        None,
        "not a url at all",  # best-effort: first token up to /:?#
    ]


def test_domain_histogram(ray_session):
    df = _corpus()
    hist = (
        domain_histogram(rd.from_pandas(df).repartition(7))
        .to_pandas()
        .sort_values("domain", ignore_index=True)
    )
    expect = (
        domain_of(pa.array(df["url"])).to_pandas().value_counts().sort_index()
    )
    assert hist["domain"].tolist() == expect.index.tolist()
    assert hist["n_docs"].tolist() == expect.values.tolist()


def _oracle_cap(df: pd.DataFrame, k: int) -> list[int]:
    dom = domain_of(pa.array(df["url"])).to_pandas()
    t = df.assign(domain=dom)
    kept = duckdb.sql(
        f"""
        SELECT doc_id FROM t
        QUALIFY row_number() OVER (
            PARTITION BY domain ORDER BY quality DESC, doc_id
        ) <= {k}
        ORDER BY doc_id
        """
    ).df()
    return kept["doc_id"].tolist()


@pytest.mark.parametrize("strategy", ["driver", "distributed"])
def test_domain_cap_matches_duckdb_oracle(ray_session, strategy):
    df = _corpus()
    ds = rd.from_pandas(df).repartition(9)
    out = domain_cap(
        ds, 7, order_col="quality", strategy=strategy
    ).to_pandas().sort_values("doc_id", ignore_index=True)
    assert out["doc_id"].tolist() == _oracle_cap(df, 7)
    assert list(out.columns) == ["doc_id", "url", "quality"]  # schema preserved


def test_domain_cap_plan_equivalence_multiblock(ray_session):
    """Forced-distributed == driver row for row, across block layouts
    (exercises the sort-scan boundary resolution on the hot domain)."""
    df = _corpus(400, seed=11)
    for parts in (3, 17):
        ds = rd.from_pandas(df).repartition(parts)
        a = domain_cap(ds, 3, order_col="quality", strategy="driver")
        b = domain_cap(ds, 3, order_col="quality", strategy="distributed")
        assert sorted(a.to_pandas()["doc_id"]) == sorted(b.to_pandas()["doc_id"])


def test_domain_cap_hash_order_deterministic(ray_session):
    """order_col=None → seeded-hash sample: identical survivors under
    any partitioning and on repeat runs."""
    df = _corpus(200, seed=5)
    keep1 = sorted(
        domain_cap(rd.from_pandas(df).repartition(4), 5).to_pandas()["doc_id"]
    )
    keep2 = sorted(
        domain_cap(rd.from_pandas(df).repartition(13), 5).to_pandas()["doc_id"]
    )
    assert keep1 == keep2
    # the cap is actually enforced
    dom = domain_of(pa.array(df["url"])).to_pandas()
    kept_dom = dom[df["doc_id"].isin(keep1).values]
    assert kept_dom.value_counts().max() == 5


def test_domain_cap_loose_cap_keeps_everything(ray_session):
    df = _corpus(100, seed=9)
    out = domain_cap(rd.from_pandas(df), 10_000, order_col="quality")
    assert out.count() == len(df)


def test_domain_cap_null_and_schemeless_urls(ray_session):
    """Null/unparseable urls form their own quota group; string ids
    survive with their dtype."""
    df = pd.DataFrame(
        {
            "doc_id": [f"d{i}" for i in range(8)],
            "url": [None, None, None, "x.org/a", "x.org/b", "x.org/c",
                    "https://y.net/1", "https://y.net/2"],
            "quality": [0.9, 0.8, 0.7, 0.6, 0.5, 0.4, 0.3, 0.2],
        }
    )
    out = (
        domain_cap(rd.from_pandas(df), 2, order_col="quality")
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    # nulls capped to their 2 best; x.org capped to 2; y.net under cap
    assert out["doc_id"].tolist() == ["d0", "d1", "d3", "d4", "d6", "d7"]
    assert out["doc_id"].dtype == object


def test_add_domain_column(ray_session):
    df = _corpus(20)
    out = add_domain(rd.from_pandas(df)).to_pandas()
    assert "domain" in out.columns
    assert set(out["domain"]) <= set(_DOMAINS)


def test_domain_blocklist_filter(ray_session):
    from kgforge.domainops import domain_blocklist_filter

    df = pd.DataFrame(
        {
            "doc_id": range(8),
            "url": [
                "https://ads.example.com/x",      # subdomain of blocked
                "https://example.com/y",          # blocked exactly
                "https://www.example.com/z",      # www-stripped → blocked
                "https://notexample.com/a",       # different domain: kept
                "https://fine.org/b",             # kept
                "https://tracker.net/c",          # blocked exactly
                None,                             # null url: kept
                "https://deep.a.b.tracker.net/d", # deep subdomain of blocked
            ],
        }
    )
    blocked = ["example.com", "Tracker.NET", " www.ignored-empty.com "]
    kept = (
        domain_blocklist_filter(rd.from_pandas(df).repartition(3), blocked)
        .to_pandas()["doc_id"].tolist()
    )
    assert sorted(kept) == [3, 4, 6]
    # exact-match mode keeps subdomains
    kept2 = domain_blocklist_filter(
        rd.from_pandas(df), blocked, match_subdomains=False
    ).to_pandas()["doc_id"].tolist()
    assert sorted(kept2) == [0, 3, 4, 6, 7]


def test_domain_cap_empty_input(ray_session):
    """A fully-filtered (empty) corpus must pass through, not crash on
    the schema probe (review fix)."""
    df = _corpus(5).iloc[0:0]
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    assert domain_cap(ds, 3, order_col="quality").count() == 0
