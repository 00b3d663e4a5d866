"""Every SQL-backed query must match its DuckDB oracle exactly at
sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

from kgforge.selfcheck import run_all

SF = "/root/testdata/sf0.001"


def test_all_queries_match_oracle():
    res = run_all(SF)
    failures = {k: msg for k, (ok, msg) in res.items() if not ok}
    assert not failures, f"oracle mismatches: {failures}"
    assert len(res) >= 20
