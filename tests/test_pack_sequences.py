"""Token packing for LM training prep: conservation, shape,
determinism, EOS accounting, and a DuckDB total-token oracle."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa

import ray.data as rd

from kgforge.relational import read
from kgforge.textops import pack_sequences

SF = "/root/testdata/sf0.001"


def _docs_ds(texts, parallelism=1):
    t = pa.table({"text": pa.array(texts, pa.string())})
    ds = rd.from_arrow(t)
    return ds.repartition(parallelism) if parallelism > 1 else ds


def test_pack_shape_and_eos_accounting(ray_session):
    texts = [f"alpha beta {i} gamma!" for i in range(50)]
    out = pack_sequences(
        _docs_ds(texts), seq_len=16, drop_remainder=False
    ).to_pandas()
    # every sequence except possibly one short remainder per batch
    lens = out["n_tokens"].tolist()
    assert all(l == 16 for l in lens[:-1]) and lens[-1] <= 16
    flat = [tok for seq in out["seq"] for tok in seq]
    # 4 BPE-ish tokens per doc ('alpha','beta','<digits>','gamma','!') = 5
    assert len(flat) == 50 * 5 + 50  # tokens + one EOS per doc
    assert flat.count(0) == 50  # EOS id 0 appears exactly once per doc
    assert min(t for t in flat if t != 0) >= 1  # real tokens never collide


def test_pack_token_conserving_under_any_partitioning(ray_session):
    texts = [f"document number {i} with, some. punctuation -- {i*i}" for i in range(200)]
    a = pack_sequences(_docs_ds(texts, 1), seq_len=32, drop_remainder=False).to_pandas()
    b = pack_sequences(_docs_ds(texts, 8), seq_len=32, drop_remainder=False).to_pandas()
    flat_a = sorted(tok for seq in a["seq"] for tok in seq)
    flat_b = sorted(tok for seq in b["seq"] for tok in seq)
    assert flat_a == flat_b  # same token multiset regardless of layout


def test_pack_deterministic_ids(ray_session):
    ds = read(SF, "documents", ["text"])
    a = pack_sequences(ds, seq_len=64).to_pandas()
    b = pack_sequences(ds, seq_len=64).to_pandas()
    sa = sorted(tuple(s) for s in a["seq"])
    sb = sorted(tuple(s) for s in b["seq"])
    assert sa == sb
    assert all(len(s) == 64 for s in a["seq"])  # drop_remainder default


def test_pack_total_tokens_match_duckdb_oracle(ray_session):
    out = pack_sequences(
        read(SF, "documents", ["text"]), seq_len=128, drop_remainder=False
    ).to_pandas()
    total = int(out["n_tokens"].sum())
    con = duckdb.connect()
    want = con.execute(
        f"""
        SELECT sum(len(regexp_extract_all(text,
          '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r\\f\\v]+'))) AS n,
               count(*) AS docs
        FROM read_parquet('{SF}/documents.parquet')
        """
    ).fetchone()
    con.close()
    assert total == int(want[0]) + int(want[1])  # tokens + one EOS per doc


def test_pack_empty_and_validation(ray_session):
    out = pack_sequences(_docs_ds([]), seq_len=8).to_pandas()
    assert len(out) == 0
    out2 = pack_sequences(_docs_ds(["", None]), seq_len=4, drop_remainder=False).to_pandas()
    flat = [tok for seq in out2["seq"] for tok in seq]
    assert flat == [0, 0]  # two empty docs → two EOS only
    import pytest

    with pytest.raises(ValueError, match="seq_len"):
        pack_sequences(_docs_ds(["x"]), seq_len=0)


def test_pack_rejects_colliding_eos(ray_session):
    import pytest

    with pytest.raises(ValueError, match="eos_id"):
        pack_sequences(_docs_ds(["x"]), seq_len=4, eos_id=7)
    # 0 and >= vocab_size are fine
    pack_sequences(_docs_ds(["x y"]), seq_len=4, eos_id=0, drop_remainder=False).count()
