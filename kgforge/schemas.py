"""Canonical pyarrow schemas for every logical table (SURVEY.md §1.2).

One fixed, declared schema per table; tests assert stage outputs against
these. The ``pages`` schema is contractual (BASELINE.json `input_hint`).
"""

from __future__ import annotations

import pyarrow as pa

# ---- input -----------------------------------------------------------------

PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.large_binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# ---- intermediate stages ---------------------------------------------------

DOCS = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("extracted_text", pa.string()),
        ("text_sha256", pa.string()),
        ("n_chars", pa.int64()),
        ("partition_id", pa.int32()),
    ]
)

RAW_TRIPLES = pa.schema(
    [
        ("url", pa.string()),
        ("sent_idx", pa.int32()),
        ("subj_surface", pa.string()),
        ("pred_surface", pa.string()),
        ("obj_surface", pa.string()),
        ("conf", pa.float32()),
    ]
)

LINKED_TRIPLES = pa.schema(
    [
        ("url", pa.string()),
        ("sent_idx", pa.int32()),
        ("subj_id", pa.string()),
        ("pred", pa.string()),
        ("obj_id", pa.string()),
        ("link_score", pa.float32()),
    ]
)

CANONICAL_MAP = pa.schema(
    [
        ("entity_id", pa.string()),
        ("canon_id", pa.string()),
    ]
)

# ---- final graph -----------------------------------------------------------

TRIPLES = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("n_sources", pa.int64()),
        ("first_url", pa.string()),
    ]
)

LEDGER = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("url_min", pa.string()),
        ("url_max", pa.string()),
        ("epoch", pa.int64()),
        ("n_pages", pa.int64()),
        ("n_docs", pa.int64()),
        ("n_triples", pa.int64()),
        ("status", pa.string()),
        ("wall_s", pa.float64()),
        ("engine_version", pa.string()),
        # fingerprint of the partition's exact input-file group; a resume
        # only trusts a ledger row whose fingerprint matches the current
        # grouping (file lists change between runs — see curate.py)
        ("group_fp", pa.string()),
    ]
)

# ---- learned model histograms (kbgen KBModel conformance surface) ----------

TYPE_DIST = pa.schema([("type_set", pa.string()), ("n_entities", pa.int64())])
PRED_FREQ = pa.schema([("pred", pa.string()), ("n_facts", pa.int64())])
DEGREE_HIST = pa.schema(
    [
        ("pred", pa.string()),
        ("direction", pa.string()),  # 'out' | 'in'
        ("degree", pa.int64()),
        ("n_entities", pa.int64()),
    ]
)
DOMAIN_RANGE = pa.schema(
    [
        ("pred", pa.string()),
        ("subj_type", pa.string()),
        ("obj_type", pa.string()),
        ("n_facts", pa.int64()),
    ]
)
