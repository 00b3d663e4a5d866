"""End-to-end corpus-curation pipeline: every stage must do its one
job on a corpus engineered to exercise all of them, and the composed
invariants (unique texts, no near-dups above threshold, packing
conservation) must hold on the final artifact."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from kgforge.dedup_ops import exact_dedup_filter
from kgforge.pipelines.curation import curate_corpus

HEADER = "SITE NAVIGATION MENU home about contact products and the full index"
FOOTER = "Copyright 2024 by the Example Corp with all of the rights reserved"


def _en_body(i: int) -> str:
    # a real English skeleton (for lang-ID) + a per-doc disjoint
    # vocabulary so distinct docs do NOT near-dup on each other: only
    # the shared header/footer boilerplate overlaps, well under any
    # sane Jaccard threshold
    uniq = " ".join(f"topic{i}word{j}{(i * 31 + j * 7) % 97}" for j in range(30))
    return f"the article number {i} is about the following things {uniq}"


def _corpus() -> pd.DataFrame:
    rows = []
    for i in range(30):  # good english docs with shared boilerplate
        rows.append((i, f"{HEADER}\n\n{_en_body(i)}\n\n{FOOTER}"))
    rows.append((100, rows[3][1]))      # exact dup of doc 3 (higher id → dropped)
    rows.append((101, f"{HEADER}\n\n{_en_body(7)} extra tail!\n\n{FOOTER}"))  # near-dup of 7
    rows.append((200, "der die und nicht das ist ein eine mit von der die und "
                      "nicht das ist ein eine mit von der die und nicht"))    # german
    rows.append((201, "!!! ??? ... !!! ??? ... !!! ???"))                     # junk quality
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def test_exact_dedup_filter_vs_duckdb(ray_session):
    import duckdb

    docs = _corpus()
    ds = rd.from_arrow(pa.Table.from_pandas(docs, preserve_index=False)).repartition(4)
    got = exact_dedup_filter(ds).to_pandas().sort_values("doc_id", ignore_index=True)
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.execute(
        """
        SELECT doc_id, text FROM documents
        WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
        ORDER BY doc_id
        """
    ).df()
    con.close()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["text"].tolist() == want["text"].tolist()


def test_curate_corpus_stage_by_stage(ray_session):
    docs = _corpus()
    ds = rd.from_arrow(pa.Table.from_pandas(docs, preserve_index=False)).repartition(4)
    res = curate_corpus(ds, min_quality=0.2, neardup_threshold=0.6, seq_len=64)
    s = res.stats
    assert s["input_docs"] == 34
    # german + junk-quality docs removed
    assert s["after_lang_quality"] == 32
    # exact dup of doc 3 removed
    assert s["after_exact_dedup"] == 31
    # near-dup 101 clusters with 7; min id 7 survives
    assert s["after_neardup"] == 30
    out = res.docs.to_pandas().sort_values("doc_id", ignore_index=True)
    assert set(out["doc_id"]) == set(range(30))
    # paragraph dedup stripped header+footer everywhere but the first doc
    assert s["paragraphs_dropped"] == 29 * 2
    texts = out.set_index("doc_id")["text"]
    assert HEADER in texts.loc[0] and FOOTER in texts.loc[0]
    assert HEADER not in texts.loc[12] and FOOTER not in texts.loc[12]
    assert f"article number 12" in texts.loc[12]
    # packing: fixed-length sequences, token count consistent with stats
    packed = res.packed.to_pandas()
    assert s["packed_sequences"] == len(packed)
    assert all(len(sq) == 64 for sq in packed["seq"])


def test_curate_corpus_no_pack_and_empty(ray_session):
    docs = pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                         "text": pd.array([], dtype="str")})
    ds = rd.from_arrow(pa.Table.from_pandas(docs, preserve_index=False))
    res = curate_corpus(ds, pack=False)
    assert res.packed is None
    assert res.stats["input_docs"] == 0
    assert res.docs.count() == 0


def test_curate_corpus_distributed_neardup_equivalent(ray_session):
    docs = _corpus()
    ds = rd.from_arrow(pa.Table.from_pandas(docs, preserve_index=False)).repartition(4)
    drv = curate_corpus(
        ds, min_quality=0.2, neardup_threshold=0.6, neardup_path="driver", pack=False
    )
    dist = curate_corpus(
        ds, min_quality=0.2, neardup_threshold=0.6, neardup_path="distributed", pack=False
    )
    a = drv.docs.to_pandas().sort_values("doc_id", ignore_index=True)
    b = dist.docs.to_pandas().sort_values("doc_id", ignore_index=True)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert a["text"].tolist() == b["text"].tolist()
    assert drv.stats["after_neardup"] == dist.stats["after_neardup"] == 30


def test_curation_neardup_keeper_handles_negative_ids(ray_session):
    base = ("the article is about " +
            " ".join(f"negword{j}" for j in range(30)))
    docs = pd.DataFrame(
        {"doc_id": [-5, -6, 3], "text": [base + " tail!", base, "the other article is about " +
                                          " ".join(f"otherword{j}" for j in range(30))]}
    )
    ds = rd.from_arrow(pa.Table.from_pandas(docs, preserve_index=False))
    res = curate_corpus(ds, min_quality=0.0, neardup_threshold=0.6, pack=False)
    kept = sorted(res.docs.to_pandas()["doc_id"])
    assert kept == [-6, 3]  # numeric min survives, not the string-min -5


def test_curate_corpus_incremental_shards(ray_session):
    """Daily-shard mode: shard 2 re-posts some of shard 1's content;
    passing shard 1's survivor index drops the re-posts."""
    import ray.data as rdm

    docs = _corpus()
    shard1 = rd.from_arrow(pa.Table.from_pandas(docs, preserve_index=False))
    r1 = curate_corpus(shard1, min_quality=0.2, neardup_threshold=0.6, pack=False)
    assert r1.new_index is not None and r1.new_index.count() == r1.stats["after_neardup"]

    # shard 2: 5 re-posts of shard-1 content (same text, new ids) + 3 new docs
    reposts = docs[docs["doc_id"] < 5].copy()
    reposts["doc_id"] = reposts["doc_id"] + 10_000
    fresh = pd.DataFrame(
        {
            "doc_id": [20_001, 20_002, 20_003],
            "text": [
                f"{HEADER}\n\n{_en_body(900 + i)}\n\n{FOOTER}" for i in range(3)
            ],
        }
    )
    shard2 = rd.from_arrow(
        pa.Table.from_pandas(pd.concat([reposts, fresh], ignore_index=True),
                             preserve_index=False)
    )
    r2 = curate_corpus(
        shard2, min_quality=0.2, neardup_threshold=0.6,
        known_hashes=r1.new_index, pack=False,
    )
    assert r2.stats["after_incremental_dedup"] == 3
    kept = sorted(r2.docs.to_pandas()["doc_id"])
    assert kept == [20_001, 20_002, 20_003]


def test_curate_cli_two_shards(ray_session, tmp_path):
    """CLI round-trip: shard 1 curated, its index fed to shard 2 via
    --known-index; re-posted content drops."""
    import json

    from kgforge.curate import main as curate_main

    docs = _corpus()
    shard1_in = tmp_path / "in1"
    import pyarrow.parquet as pq

    shard1_in.mkdir()
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False), str(shard1_in / "p.parquet")
    )
    out1 = tmp_path / "out1"
    curate_main([
        "--input", str(shard1_in), "--out", str(out1),
        "--min-quality", "0.2", "--neardup-threshold", "0.6", "--no-pack",
    ])
    stats1 = json.loads((out1 / "stats.json").read_text())
    assert stats1["after_neardup"] == 30
    assert (out1 / "index").exists() and (out1 / "docs").exists()

    reposts = docs[docs["doc_id"] < 4].copy()
    reposts["doc_id"] = reposts["doc_id"] + 10_000
    shard2_in = tmp_path / "in2"
    shard2_in.mkdir()
    pq.write_table(
        pa.Table.from_pandas(reposts, preserve_index=False), str(shard2_in / "p.parquet")
    )
    out2 = tmp_path / "out2"
    curate_main([
        "--input", str(shard2_in), "--out", str(out2),
        "--min-quality", "0.2", "--neardup-threshold", "0.6", "--no-pack",
        "--known-index", str(out1 / "index"),
    ])
    stats2 = json.loads((out2 / "stats.json").read_text())
    assert stats2["after_incremental_dedup"] == 0  # every doc was a re-post


def test_curate_cli_empty_shard_index_still_readable(ray_session, tmp_path):
    """A 100%-re-posted shard writes EMPTY docs/index that must still be
    readable parquet for day 3 (Ray writes zero files for an empty
    dataset — the CLI pads an explicit empty table)."""
    import json

    import pyarrow.parquet as pq
    import ray.data as rdm

    from kgforge.curate import main as curate_main

    docs = _corpus()
    in1 = tmp_path / "in1"; in1.mkdir()
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False), str(in1 / "p.parquet"))
    out1 = tmp_path / "out1"
    curate_main(["--input", str(in1), "--out", str(out1),
                 "--min-quality", "0.2", "--neardup-threshold", "0.6", "--no-pack"])

    reposts = docs[docs["doc_id"] < 4].copy()
    reposts["doc_id"] = reposts["doc_id"] + 10_000
    in2 = tmp_path / "in2"; in2.mkdir()
    pq.write_table(pa.Table.from_pandas(reposts, preserve_index=False), str(in2 / "p.parquet"))
    out2 = tmp_path / "out2"
    curate_main(["--input", str(in2), "--out", str(out2),
                 "--min-quality", "0.2", "--neardup-threshold", "0.6", "--no-pack",
                 "--known-index", str(out1 / "index")])
    stats2 = json.loads((out2 / "stats.json").read_text())
    assert stats2["after_incremental_dedup"] == 0
    # day 3: both day-2 artifact dirs must read back cleanly
    idx2 = rdm.read_parquet(str(out2 / "index"))
    assert idx2.count() == 0 and set(idx2.schema().names) == {"h1", "h2"}
    docs2 = rdm.read_parquet(str(out2 / "docs"))
    assert docs2.count() == 0


def test_curate_corpus_all_strategies_forced_distributed(ray_session, monkeypatch):
    """The 100-TB configuration end to end: EVERY auto-switching stage
    forced onto its distributed plan via the env thresholds (content
    dedup winners, near-dup pairing+labels, drop application,
    incremental verify) — output must equal the default driver-plan
    composition row for row."""
    monkeypatch.setenv("KGFORGE_CONTENT_DEDUP_DIST_ROWS", "0")
    monkeypatch.setenv("KGFORGE_NEARDUP_DIST_ROWS", "0")
    monkeypatch.setenv("KGFORGE_DROP_APPLY_BROADCAST_ROWS", "0")
    monkeypatch.setenv("KGFORGE_INC_DEDUP_DIST_ROWS", "0")
    monkeypatch.setenv("KGFORGE_SPAN_DEDUP_DIST_ROWS", "0")
    docs = _corpus()
    ds = rd.from_arrow(pa.Table.from_pandas(docs, preserve_index=False)).repartition(4)
    from kgforge.dedup_ops import content_hashes

    known = content_hashes(
        rd.from_arrow(
            pa.table({"doc_id": pa.array([900], pa.int64()),
                      "text": pa.array([_en_body(0)], pa.string())})
        )
    ).materialize()
    dist = curate_corpus(
        ds, min_quality=0.2, neardup_threshold=0.6, known_hashes=known, pack=True,
        substring_dedup_ngram=6,
    )
    for var in ("KGFORGE_CONTENT_DEDUP_DIST_ROWS", "KGFORGE_NEARDUP_DIST_ROWS",
                "KGFORGE_DROP_APPLY_BROADCAST_ROWS", "KGFORGE_INC_DEDUP_DIST_ROWS",
                "KGFORGE_SPAN_DEDUP_DIST_ROWS"):
        monkeypatch.delenv(var)
    base = curate_corpus(
        ds, min_quality=0.2, neardup_threshold=0.6, known_hashes=known, pack=True,
        substring_dedup_ngram=6,
    )
    a = dist.docs.to_pandas().sort_values("doc_id", ignore_index=True)
    b = base.docs.to_pandas().sort_values("doc_id", ignore_index=True)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert a["text"].tolist() == b["text"].tolist()
    assert (
        a["n_dropped_paragraphs"].tolist() == b["n_dropped_paragraphs"].tolist()
    )
    assert a["n_dropped_chars"].tolist() == b["n_dropped_chars"].tolist()
    assert dist.stats["after_neardup"] == base.stats["after_neardup"]
    assert (
        dist.stats["substring_chars_dropped"]
        == base.stats["substring_chars_dropped"]
    )
    # packing is BATCH-LOCAL by design (documented trade): the two plans
    # leave different block layouts, so sequence counts may differ —
    # only the schema contract is layout-independent
    assert dist.packed.schema().base_schema.names == ["seq", "n_tokens"]


def test_curate_model_stages_forced_distributed(ray_session, monkeypatch):
    """The new model-based stages under the 100-TB configuration:
    classifier drop + LM scoring + SemDeDup drop with every
    auto-switching threshold forced distributed must equal the auto
    plans doc for doc (the semdedup drops then apply via the Bloom
    anti-join instead of the broadcast is_in)."""
    import numpy as np

    from kgforge.ngramlm import train_ngram_lm
    from kgforge.qualityclf import train_quality_classifier

    docs = _corpus()
    hdr, body5, ftr = docs.loc[5, "text"].split("\n\n")
    docs.loc[len(docs)] = [  # semdedup victim (identical BoW to doc 5)
        102, f"{hdr}\n\n{' '.join(reversed(body5.split()))}\n\n{ftr}"]
    spam_words = ("click free winner casino bonus jackpot offer credit "
                  "loan prize claim deal").split()
    rng = np.random.RandomState(3)
    docs.loc[len(docs)] = [  # classifier victim
        400, f"{hdr}\n\n{' '.join(rng.choice(spam_words, size=40))}\n\n{ftr}"]
    ds = rd.from_arrow(pa.Table.from_pandas(docs, preserve_index=False)).repartition(4)

    qm = train_quality_classifier(
        [_en_body(500 + i) for i in range(40)],
        [" ".join(rng.choice(spam_words, size=40)) for _ in range(40)],
    )
    lm = train_ngram_lm(rd.from_pandas(docs[docs["doc_id"] < 30][["text"]]), n=2)
    kw = dict(min_quality=0.2, neardup_threshold=0.6, pack=False,
              quality_model=qm, perplexity_lm=lm, max_perplexity=1e18,
              semdedup_threshold=0.95)

    for var in ("KGFORGE_CONTENT_DEDUP_DIST_ROWS", "KGFORGE_NEARDUP_DIST_ROWS",
                "KGFORGE_DROP_APPLY_BROADCAST_ROWS"):
        monkeypatch.setenv(var, "0")
    dist = curate_corpus(ds, **kw)
    for var in ("KGFORGE_CONTENT_DEDUP_DIST_ROWS", "KGFORGE_NEARDUP_DIST_ROWS",
                "KGFORGE_DROP_APPLY_BROADCAST_ROWS"):
        monkeypatch.delenv(var)
    base = curate_corpus(ds, **kw)

    a = dist.docs.to_pandas().sort_values("doc_id", ignore_index=True)
    b = base.docs.to_pandas().sort_values("doc_id", ignore_index=True)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert a["text"].tolist() == b["text"].tolist()
    ids = set(a["doc_id"])
    assert 400 not in ids and 102 not in ids and 5 in ids
    assert dist.stats["semdedup_dropped"] == base.stats["semdedup_dropped"] == 1
    assert dist.stats["after_quality_model"] == base.stats["after_quality_model"]


def test_curate_corpus_streaming_mode_byte_identical(ray_session, monkeypatch):
    """stats='none' (the streaming configuration: no per-stage
    materializes, corpus pinned only at multi-consumer forks) must
    produce byte-identical survivors to the default counted run — both
    with every stage forced onto its distributed plan AND with the
    default auto plans."""
    docs = _corpus()
    ds = rd.from_arrow(pa.Table.from_pandas(docs, preserve_index=False)).repartition(4)

    def run(stats: str):
        return curate_corpus(
            ds, min_quality=0.2, neardup_threshold=0.6, pack=True, stats=stats
        )

    for forced in (False, True):
        if forced:
            for var in ("KGFORGE_CONTENT_DEDUP_DIST_ROWS", "KGFORGE_NEARDUP_DIST_ROWS",
                        "KGFORGE_DROP_APPLY_BROADCAST_ROWS", "KGFORGE_INC_DEDUP_DIST_ROWS"):
                monkeypatch.setenv(var, "0")
        counted, streamed = run("counts"), run("none")
        a = counted.docs.to_pandas().sort_values("doc_id", ignore_index=True)
        b = streamed.docs.to_pandas().sort_values("doc_id", ignore_index=True)
        assert a["doc_id"].tolist() == b["doc_id"].tolist()
        assert a["text"].tolist() == b["text"].tolist()
        assert a["n_dropped_paragraphs"].tolist() == b["n_dropped_paragraphs"].tolist()
        # survivor index identical as a set of (h1, h2)
        ia = sorted(map(tuple, counted.new_index.to_pandas().values.tolist()))
        ib = sorted(map(tuple, streamed.new_index.to_pandas().values.tolist()))
        assert ia == ib
        # streaming skips the EXTRA per-stage pins but still records the
        # free counts: the pre-neardup pin's metadata read and the
        # drop-count arithmetic — and they must agree with counted mode
        assert streamed.stats["after_exact_dedup"] == counted.stats["after_exact_dedup"]
        assert streamed.stats["after_neardup"] == counted.stats["after_neardup"]
        assert "after_lang_quality" not in streamed.stats
        assert "neardup_dropped" in streamed.stats
        assert streamed.packed is not None
        # consuming docs a second time must still work (no dangling lazy
        # double-execution surprises at the API surface)
        assert streamed.docs.count() == counted.stats["after_neardup"]


def test_curate_corpus_streaming_rejects_unknown_mode(ray_session):
    ds = rd.from_arrow(pa.table({"doc_id": pa.array([1], pa.int64()),
                                 "text": pa.array(["hello world"], pa.string())}))
    with pytest.raises(ValueError, match="stats mode"):
        curate_corpus(ds, stats="всё")


def test_curate_cli_checkpointed_partitions_and_resume(ray_session, tmp_path):
    """--partitions K checkpoints stage A (lang+quality) per input-file
    group with a ledger row; a --resume run SKIPS finished partitions
    (proven by tampering a published part: the resumed run must not
    rewrite it) and re-runs only the global stages."""
    import json

    import pyarrow.parquet as pq

    from kgforge.curate import main as curate_main
    from kgforge.steps.ledger import completed_partitions, read_ledger

    docs = _corpus()
    indir = tmp_path / "in"
    indir.mkdir()
    # 4 input files → 2 partitions of 2 files
    quarters = [docs.iloc[i::4] for i in range(4)]
    for i, q in enumerate(quarters):
        pq.write_table(
            pa.Table.from_pandas(q, preserve_index=False), str(indir / f"f{i}.parquet")
        )
    out = tmp_path / "out"
    base_out = tmp_path / "base"
    args = ["--min-quality", "0.2", "--neardup-threshold", "0.6", "--no-pack"]
    curate_main(["--input", str(indir), "--out", str(base_out), *args])
    curate_main(["--input", str(indir), "--out", str(out), *args,
                 "--partitions", "2"])

    # same survivors as the non-checkpointed run
    a = pq.read_table(str(out / "docs")).to_pandas().sort_values(
        "doc_id", ignore_index=True)
    b = pq.read_table(str(base_out / "docs")).to_pandas().sort_values(
        "doc_id", ignore_index=True)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert a["text"].tolist() == b["text"].tolist()

    # ledger: 2 filtered partitions + the global summary row
    assert completed_partitions(str(out), "filtered") == {0, 1}
    led = read_ledger(str(out)).to_pylist()
    assert any(r["status"] == "curated" and r["partition_id"] == -1 for r in led)
    frows = {r["partition_id"]: r for r in led if r["status"] == "filtered"}
    assert frows[0]["url_min"].endswith("f0.parquet")  # input lineage recorded
    assert sum(r["n_pages"] for r in frows.values()) == len(docs)

    # RESUME: tamper part-0's published file; the resumed run must skip
    # the partition (tamper survives) and still produce correct output
    part0 = out / "filtered" / "part-0"
    # the checkpoint may be split into several small parquet files; tamper
    # the LARGEST one down to zero rows so the shrink is always observable
    victim = max(
        (f for f in part0.iterdir() if f.suffix == ".parquet"),
        key=lambda f: pq.read_metadata(str(f)).num_rows,
    )
    t = pq.read_table(str(victim))
    assert t.num_rows >= 1
    pq.write_table(t.slice(0, 0), str(victim))  # empty file as tamper marker
    curate_main(["--input", str(indir), "--out", str(out), *args,
                 "--partitions", "2", "--resume"])
    assert pq.read_table(str(victim)).num_rows == 0  # partition NOT recomputed
    stats = json.loads((out / "stats.json").read_text())
    assert stats["checkpoint_partitions"] == 2
    # resumed global stage consumed the (tampered) checkpoint: docs shrink
    n_after = pq.read_table(str(out / "docs")).num_rows
    assert n_after < len(a)


def test_curate_cli_resume_revalidates_changed_file_groups(ray_session, tmp_path):
    """--resume must not trust a checkpoint whose input-file group
    changed: new parquet files landing in the input dir (the daily-shard
    case) remap every partition, so the ledger fingerprints mismatch and
    the remapped partitions re-run — the new docs are ingested instead
    of being silently dropped behind a stale checkpoint."""
    import json

    import pyarrow.parquet as pq

    from kgforge.curate import main as curate_main

    docs = _corpus()
    indir = tmp_path / "in"
    indir.mkdir()
    quarters = [docs.iloc[i::4] for i in range(4)]
    for i, q in enumerate(quarters):
        pq.write_table(
            pa.Table.from_pandas(q, preserve_index=False), str(indir / f"f{i}.parquet")
        )
    out = tmp_path / "out"
    args = ["--min-quality", "0.2", "--neardup-threshold", "0.6", "--no-pack"]
    curate_main(["--input", str(indir), "--out", str(out), *args,
                 "--partitions", "2"])
    n_first = pq.read_table(str(out / "docs")).num_rows

    # two NEW files of good english docs land in the input dir
    extra = pd.DataFrame(
        [(300 + i, f"{HEADER}\n\n{_en_body(50 + i)}\n\n{FOOTER}") for i in range(8)],
        columns=["doc_id", "text"],
    )
    pq.write_table(pa.Table.from_pandas(extra.iloc[:4], preserve_index=False),
                   str(indir / "g0.parquet"))
    pq.write_table(pa.Table.from_pandas(extra.iloc[4:], preserve_index=False),
                   str(indir / "g1.parquet"))
    curate_main(["--input", str(indir), "--out", str(out), *args,
                 "--partitions", "2", "--resume"])

    got = pq.read_table(str(out / "docs")).to_pandas()
    # every new doc survived into the curated output
    assert set(extra["doc_id"]) <= set(got["doc_id"])
    assert len(got) == n_first + len(extra)
    # stats reflect the TRUE shard input, rolled up from the stage-A
    # ledger rows of the current grouping (not the post-filter count)
    stats = json.loads((out / "stats.json").read_text())
    assert stats["input_docs"] == len(docs) + len(extra)
    assert stats["after_lang_quality"] < stats["input_docs"]


def test_curate_cli_shrunk_partition_count_prunes_stale_parts(ray_session, tmp_path):
    """Re-running into the same --out with FEWER partitions must not
    ingest the previous grouping's stale part-K checkpoints: stage B
    reads exactly the current groups' part dirs and the stale dirs are
    pruned — the curated output matches a clean run bit for bit."""
    import pyarrow.parquet as pq

    from kgforge.curate import main as curate_main

    docs = _corpus()
    indir = tmp_path / "in"
    indir.mkdir()
    quarters = [docs.iloc[i::4] for i in range(4)]
    for i, q in enumerate(quarters):
        pq.write_table(
            pa.Table.from_pandas(q, preserve_index=False), str(indir / f"f{i}.parquet")
        )
    out = tmp_path / "out"
    args = ["--min-quality", "0.2", "--neardup-threshold", "0.6", "--no-pack"]
    curate_main(["--input", str(indir), "--out", str(out), *args,
                 "--partitions", "4"])
    n_clean = pq.read_table(str(out / "docs")).num_rows
    assert (out / "filtered" / "part-3").is_dir()

    # shrink the grouping: 4 → 2 partitions, resumed into the same out
    curate_main(["--input", str(indir), "--out", str(out), *args,
                 "--partitions", "2", "--resume"])
    parts = sorted(p.name for p in (out / "filtered").iterdir())
    assert parts == ["part-0", "part-1"]  # stale part-2/3 pruned
    got = pq.read_table(str(out / "docs")).to_pandas()
    assert len(got) == n_clean  # no double-ingested survivors


def test_curate_cli_resume_revalidates_changed_filter_params(ray_session, tmp_path):
    """--resume must not trust a checkpoint built with different filter
    settings: the ledger fingerprint covers --min-quality/--langs, so a
    resumed run with a stricter threshold re-runs stage A instead of
    passing through survivors filtered at the old one."""
    import pyarrow.parquet as pq

    from kgforge.curate import main as curate_main

    docs = _corpus()
    indir = tmp_path / "in"
    indir.mkdir()
    halves = [docs.iloc[0::2], docs.iloc[1::2]]
    for i, h in enumerate(halves):
        pq.write_table(
            pa.Table.from_pandas(h, preserve_index=False), str(indir / f"f{i}.parquet")
        )
    out = tmp_path / "out"
    base = ["--neardup-threshold", "0.6", "--no-pack", "--partitions", "2"]
    curate_main(["--input", str(indir), "--out", str(out),
                 "--min-quality", "0.2", *base])
    assert pq.read_table(str(out / "docs")).num_rows > 0

    # resume with an impossible threshold: every doc must now be dropped
    # (a stale-checkpoint pass-through would leave the docs unchanged)
    curate_main(["--input", str(indir), "--out", str(out),
                 "--min-quality", "5.0", *base, "--resume"])
    assert pq.read_table(str(out / "docs")).num_rows == 0


def test_curate_cli_string_ids_with_all_dropped_partition(ray_session, tmp_path):
    """A string-id corpus where one partition filters to EMPTY: the
    empty part's fallback schema must carry the real id dtype (string),
    or stage B's read fails parquet schema unification against the
    non-empty string-id parts."""
    import pyarrow.parquet as pq

    from kgforge.curate import main as curate_main

    en = pd.DataFrame(
        [(f"doc-{i}", f"{HEADER}\n\n{_en_body(i)}\n\n{FOOTER}") for i in range(8)],
        columns=["doc_id", "text"],
    )
    de = pd.DataFrame(
        [(f"ger-{i}", "der die und nicht das ist ein eine mit von der die "
                      f"und nummer {i} nicht das ist ein eine mit von")
         for i in range(4)],
        columns=["doc_id", "text"],
    )
    indir = tmp_path / "in"
    indir.mkdir()
    pq.write_table(pa.Table.from_pandas(en, preserve_index=False),
                   str(indir / "f0.parquet"))
    pq.write_table(pa.Table.from_pandas(de, preserve_index=False),
                   str(indir / "f1.parquet"))
    out = tmp_path / "out"
    curate_main(["--input", str(indir), "--out", str(out),
                 "--min-quality", "0.2", "--neardup-threshold", "0.6",
                 "--no-pack", "--partitions", "2"])

    t = pq.read_table(str(out / "docs"))
    assert t.schema.field("doc_id").type == pa.string()
    assert set(t["doc_id"].to_pylist()) == set(en["doc_id"])
    # the empty checkpoint itself is schema-compatible
    empty = pq.read_table(str(out / "filtered" / "part-1"))
    assert empty.num_rows == 0
    assert empty.schema.field("doc_id").type == pa.string()


def test_curate_corpus_hygiene_stages(ray_session):
    """repetition + decontamination + domain quota as pipeline stages:
    each drops exactly its engineered victims and the stats ledger
    records the attrition in order."""
    docs = _corpus()
    docs["url"] = [
        f"https://site{i % 4}.example/p/{i}" for i in range(len(docs))
    ]
    # victim A: passes quality but is wildly repetitious
    spam_body = ("the offer " * 40).strip()
    # victim B: contains a benchmark span verbatim
    bench_span = ("the benchmark question asks about the annual committee "
                  "budget report for the harbor district schedule")
    docs.loc[len(docs)] = [300, f"{_en_body(60)} {bench_span} tail", 
                           "https://site0.example/p/300"]
    docs.loc[len(docs)] = [301, f"the spam article {spam_body}",
                           "https://site1.example/p/301"]
    ds = rd.from_arrow(pa.Table.from_pandas(docs, preserve_index=False)).repartition(4)
    res = curate_corpus(
        ds, min_quality=0.2, neardup_threshold=0.6, pack=False,
        repetition=True, decontam_benchmark=[bench_span], decontam_ngram=13,
        max_per_domain=100,
    )
    s = res.stats
    out_ids = set(res.docs.to_pandas()["doc_id"])
    assert 301 not in out_ids          # repetition filter
    assert 300 not in out_ids          # decontamination
    assert s["after_domain_cap"] == s["after_lang_quality"]  # loose cap
    assert s["after_repetition"] == s["after_domain_cap"] - 1
    assert s["after_decontam"] == s["after_repetition"] - 1
    assert set(range(30)) <= out_ids

    # tight quota: at most 2 per site, ranked by quality
    res2 = curate_corpus(
        ds, min_quality=0.2, neardup_threshold=0.6, pack=False,
        max_per_domain=2,
    )
    assert res2.stats["after_domain_cap"] == 8  # 4 sites × 2


def test_curate_corpus_semdedup_stage(ray_session):
    """SemDeDup catches what LSH structurally cannot: a word-scrambled
    copy shares almost no shingles with its source (low Jaccard → LSH
    keeps it) but has the IDENTICAL bag-of-words embedding (cosine 1.0
    → SemDeDup drops it, min-id keeper)."""
    docs = _corpus()
    hdr, body5, ftr = docs.loc[5, "text"].split("\n\n")
    scrambled = " ".join(reversed(body5.split()))
    docs.loc[len(docs)] = [102, f"{hdr}\n\n{scrambled}\n\n{ftr}"]
    ds = rd.from_arrow(pa.Table.from_pandas(docs, preserve_index=False)).repartition(4)

    base = curate_corpus(ds, min_quality=0.2, neardup_threshold=0.6, pack=False)
    assert 102 in set(base.docs.to_pandas()["doc_id"])  # LSH keeps it

    res = curate_corpus(
        ds, min_quality=0.2, neardup_threshold=0.6, pack=False,
        semdedup_threshold=0.95,
    )
    s = res.stats
    out_ids = set(res.docs.to_pandas()["doc_id"])
    assert 102 not in out_ids and 5 in out_ids
    assert s["semdedup_dropped"] == 1
    assert s["after_semdedup"] == s["after_neardup"] - 1

    # streaming mode: same survivors; the free drop-count arithmetic
    # still records after_semdedup and it agrees with counted mode
    res_s = curate_corpus(
        ds, min_quality=0.2, neardup_threshold=0.6, pack=False,
        semdedup_threshold=0.95, stats="none",
    )
    assert set(res_s.docs.to_pandas()["doc_id"]) == out_ids
    assert res_s.stats["after_semdedup"] == s["after_semdedup"]
    assert res_s.stats["semdedup_dropped"] == 1


def test_curate_corpus_quality_model_stage(ray_session):
    """The learned seed-vs-web filter drops spam the heuristic quality
    score passes (real English words, normal punctuation)."""
    import numpy as np

    from kgforge.qualityclf import train_quality_classifier

    docs = _corpus()
    spam_words = ("click free winner casino bonus jackpot offer credit "
                  "loan prize claim deal").split()
    rng = np.random.RandomState(7)
    spam = " ".join(rng.choice(spam_words, size=40))
    docs.loc[len(docs)] = [400, f"{HEADER}\n\n{spam}\n\n{FOOTER}"]
    ds = rd.from_arrow(pa.Table.from_pandas(docs, preserve_index=False)).repartition(4)

    pos = [_en_body(500 + i) for i in range(40)]
    neg = [" ".join(rng.choice(spam_words, size=40)) for _ in range(40)]
    model = train_quality_classifier(pos, neg)

    res = curate_corpus(ds, min_quality=0.2, neardup_threshold=0.6,
                        pack=False, quality_model=model)
    s = res.stats
    out_ids = set(res.docs.to_pandas()["doc_id"])
    assert 400 not in out_ids
    assert s["after_quality_model"] == s["after_lang_quality"] - 1
    assert set(range(30)) <= out_ids


def test_curate_corpus_perplexity_stage(ray_session):
    """The LM fluency filter drops a word-scrambled doc (loses the
    reference corpus's n-gram structure) that lang-ID, the heuristic
    quality score, and exact/near dedup all pass."""
    from kgforge.ngramlm import score_perplexity, train_ngram_lm

    docs = _corpus()
    hdr, body5, ftr = docs.loc[5, "text"].split("\n\n")
    scrambled = " ".join(reversed(body5.split()))
    docs.loc[len(docs)] = [500, f"{hdr}\n\n{scrambled}\n\n{ftr}"]
    ds = rd.from_arrow(pa.Table.from_pandas(docs, preserve_index=False)).repartition(4)

    # reference corpus: the clean docs themselves (the victim inverts
    # their shared phrase skeleton)
    lm = train_ngram_lm(
        rd.from_pandas(docs[docs["doc_id"] < 30][["text"]]), n=3, min_count=1
    )
    scored = (score_perplexity(rd.from_pandas(docs), lm).to_pandas()
              .set_index("doc_id")["lm_ppl"])
    good_max = scored.loc[range(30)].max()
    assert scored.loc[500] > good_max
    thr = float((scored.loc[500] + good_max) / 2)

    res = curate_corpus(ds, min_quality=0.2, neardup_threshold=0.6,
                        pack=False, perplexity_lm=lm, max_perplexity=thr)
    s = res.stats
    out_ids = set(res.docs.to_pandas()["doc_id"])
    assert 500 not in out_ids
    assert s["after_perplexity"] == s["after_lang_quality"] - 1
    assert set(range(30)) <= out_ids

    with pytest.raises(ValueError, match="max_perplexity"):
        curate_corpus(ds, pack=False, perplexity_lm=lm)


def test_curate_cli_quality_model(ray_session, tmp_path):
    """--quality-model loads a saved .npz and the stage runs in the CLI
    path (stats ledger shows the attrition)."""
    import json

    import numpy as np
    import pyarrow.parquet as pq

    from kgforge.curate import main as curate_main
    from kgforge.qualityclf import save_model, train_quality_classifier

    docs = _corpus()
    spam_words = ("click free winner casino bonus jackpot offer credit "
                  "loan prize claim deal").split()
    rng = np.random.RandomState(13)
    docs.loc[len(docs)] = [
        400, f"{HEADER}\n\n{' '.join(rng.choice(spam_words, size=40))}\n\n{FOOTER}"
    ]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False), str(in_dir / "p.parquet")
    )
    model = train_quality_classifier(
        [_en_body(500 + i) for i in range(40)],
        [" ".join(rng.choice(spam_words, size=40)) for _ in range(40)],
    )
    mpath = tmp_path / "qm.npz"
    save_model(model, str(mpath))
    # a permissive LM rides along to exercise the CLI load path
    from kgforge.ngramlm import save_lm, train_ngram_lm

    lm = train_ngram_lm(rd.from_pandas(docs[docs["doc_id"] < 30][["text"]]), n=2)
    lmpath = tmp_path / "lm.npz"
    save_lm(lm, str(lmpath))
    out = tmp_path / "out"
    curate_main([
        "--input", str(in_dir), "--out", str(out),
        "--min-quality", "0.2", "--neardup-threshold", "0.6", "--no-pack",
        "--quality-model", str(mpath),
        "--lm-model", str(lmpath), "--max-perplexity", "1e18",
    ])
    stats = json.loads((out / "stats.json").read_text())
    assert stats["after_quality_model"] == stats["after_lang_quality"] - 1
    assert stats["after_perplexity"] == stats["after_quality_model"]
    out_ids = set(
        pq.read_table(str(out / "docs"), columns=["doc_id"])["doc_id"].to_pylist()
    )
    assert 400 not in out_ids and set(range(30)) <= out_ids


def test_curate_cli_shards_and_hygiene(ray_session, tmp_path):
    """CLI: --repetition-filter, --decontam-benchmark (.txt), and
    --n-shards write deterministic shard dirs of the curated docs."""
    import json

    import pyarrow.parquet as pq

    from kgforge.curate import main as curate_main

    docs = _corpus()
    spam = ("the offer " * 40).strip()
    docs.loc[len(docs)] = [400, f"the spam article {spam}"]
    indir = tmp_path / "in"
    indir.mkdir()
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(indir / "f0.parquet"))
    bench_file = tmp_path / "bench.txt"
    bench_file.write_text(_en_body(5) + "\n")  # doc 5's body is "leaked"
    out = tmp_path / "out"
    curate_main(["--input", str(indir), "--out", str(out),
                 "--min-quality", "0.2", "--neardup-threshold", "0.6",
                 "--no-pack", "--repetition-filter",
                 "--decontam-benchmark", str(bench_file),
                 "--n-shards", "3", "--shard-seed", "9"])
    stats = json.loads((out / "stats.json").read_text())
    assert stats["after_repetition"] == stats["after_lang_quality"] - 1
    assert stats["after_decontam"] == stats["after_repetition"] - 1
    assert stats["shards"] == 3
    got = pq.read_table(str(out / "docs")).to_pandas()
    assert 400 not in set(got["doc_id"]) and 5 not in set(got["doc_id"])
    shard_dirs = sorted(p.name for p in (out / "shards").iterdir())
    assert shard_dirs == ["shard=0", "shard=1", "shard=2"]
    sharded = pq.read_table(str(out / "shards")).to_pandas()
    assert sorted(sharded["doc_id"]) == sorted(got["doc_id"])
    assert stats["sharded_docs"] == len(got)


def test_curate_cli_jsonl_input(ray_session, tmp_path):
    """--input-format jsonl: gzipped JSON-lines in, curated docs out;
    --partitions combination is rejected with guidance."""
    import gzip
    import json

    from kgforge.curate import main as curate_main

    docs = _corpus()
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    with gzip.open(in_dir / "docs.jsonl.gz", "wt") as f:
        for r in docs.to_dict("records"):
            f.write(json.dumps(r) + "\n")
    out = tmp_path / "out"
    curate_main([
        "--input", str(in_dir), "--input-format", "jsonl",
        "--out", str(out),
        "--min-quality", "0.2", "--neardup-threshold", "0.6", "--no-pack",
    ])
    stats = json.loads((out / "stats.json").read_text())
    assert stats["after_neardup"] == 30
    with pytest.raises(SystemExit, match="jsonl"):
        curate_main([
            "--input", str(in_dir), "--input-format", "jsonl",
            "--out", str(out), "--partitions", "2",
        ])


def test_curate_cli_jsonl_string_ids_all_dropped(ray_session, tmp_path):
    """jsonl input with STRING ids curating to zero survivors must
    write the empty docs parquet with the real id dtype (the parquet
    glob probe finds nothing for jsonl — the live schema is used)."""
    import gzip
    import json

    import pyarrow.parquet as pq

    from kgforge.curate import main as curate_main

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    with gzip.open(in_dir / "docs.jsonl.gz", "wt") as f:
        f.write(json.dumps({"doc_id": "doc-a", "text": "!!! ??? !!!"}) + "\n")
        f.write(json.dumps({"doc_id": "doc-b", "text": "der die und das"}) + "\n")
    out = tmp_path / "out"
    curate_main([
        "--input", str(in_dir), "--input-format", "jsonl",
        "--out", str(out), "--no-pack",
    ])
    t = pq.read_table(str(out / "docs"))
    assert t.num_rows == 0
    assert t.schema.field("doc_id").type == "string"


def test_curate_corpus_url_col_equals_id_col(ray_session):
    """A corpus whose id IS its url (the common crawl shape) must work
    with max_per_domain: the projection used to crash on the duplicate
    column name."""
    topics = [
        "rivers and the boats that carry goods to the market each day",
        "railways and the trains that crossed the high mountain passes",
        "gardens in the spring rain with many bright flowers blooming",
        "libraries and the books about stars and planets in the night",
        "kitchens where the soup and the bread are made with fresh herbs",
        "festivals where the music played in the town square all summer",
        "harbors and the ships that waited for the morning tide to turn",
        "forests where the old trees shaded the quiet walking trails",
        "villages where the bakers opened their doors before sunrise",
        "valleys where the shepherds watched the flocks in the evening",
        "islands where the fishers mended their nets beside the water",
        "meadows where the children flew their kites on windy days",
    ]
    rows = []
    for i in range(12):
        body = (f"this is a long enough english article number {i} about "
                f"the {topics[i]} with plenty of stopwords for the filters")
        rows.append((f"http://site{i % 3}.com/p{i}", body))
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([u for u, _ in rows], pa.string()),
        "text": pa.array([t for _, t in rows], pa.string()),
    }))
    res = curate_corpus(
        ds, min_quality=0.1, pack=False,
        max_per_domain=2, url_col="doc_id",
    )
    out = res.docs.to_pandas()
    assert res.stats["after_domain_cap"] == 6  # 3 domains × cap 2
    assert len(out) == 6


def test_curate_corpus_semdedup_survives_empty_survivor_set(ray_session):
    """If the heuristic filters drop EVERYTHING, the SemDeDup stage must
    skip gracefully (train_centroids has nothing to train on) like every
    other stage does on empty inputs."""
    docs = _corpus()
    ds = rd.from_arrow(pa.Table.from_pandas(docs, preserve_index=False)).repartition(4)
    res = curate_corpus(
        ds, min_quality=2.0, pack=False,
        semdedup_threshold=0.9, substring_dedup_ngram=20,
    )
    assert res.stats["after_lang_quality"] == 0
    assert res.stats["semdedup_dropped"] == 0
    assert res.docs.count() == 0


def test_curate_corpus_stats_auto_default(ray_session, monkeypatch):
    """stats='auto' (the new default): counts for small metadata-countable
    inputs, streaming for lazy lineages and above the row threshold —
    the scale-safe plan is opt-out, not opt-in (VERDICT r4 #3)."""
    docs = _corpus()
    ds = rd.from_arrow(pa.Table.from_pandas(docs, preserve_index=False))
    res = curate_corpus(ds, min_quality=0.2, pack=False)
    assert res.stats["stats_mode"] == "counts"
    assert "after_lang_quality" in res.stats
    # a lazy lineage has no metadata count — streams by default (an auto
    # count() would execute the whole lineage just to pick a plan)
    lazy = ds.map_batches(lambda t: t, batch_format="pyarrow")
    res2 = curate_corpus(lazy, min_quality=0.2, pack=False)
    assert res2.stats["stats_mode"] == "none"
    # row threshold: above it (here forced to 0) even known counts stream
    monkeypatch.setenv("KGFORGE_CURATION_COUNTS_ROWS", "0")
    res3 = curate_corpus(ds, min_quality=0.2, pack=False)
    assert res3.stats["stats_mode"] == "none"
    # streamed results still match the counted ones row for row
    a = res.docs.to_pandas().sort_values("doc_id", ignore_index=True)
    b = res3.docs.to_pandas().sort_values("doc_id", ignore_index=True)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
