"""PII redaction for training corpora: emails, IPv4 addresses, phone
numbers → placeholder tokens (the standard pre-training scrub step;
public-knowledge pattern set, conservative by design).

Per-doc rewrite, no shuffle: one ``map_batches`` applying Arrow's RE2
``replace_substring_regex`` kernels — fully vectorized, and the same
RE2 dialect DuckDB uses, so the transform is SQL-oracle-testable
byte for byte (``regexp_replace(..., 'g')``).

Pattern notes (the contracts tests pin):

* email — local@domain.tld with the usual local-part charset; matched
  anywhere (RE2 has no lookbehind, and host-side over-matching is the
  safe direction for a scrubber).
* ipv4 — four 1-3 digit octets with ``\\b`` word-boundary guards (RE2
  has no lookaround), so "1234.5.6.7890" is NOT chewed mid-number;
  octet RANGE validation (>255) is deliberately not attempted
  in-regex: "10.0.0.999" redacts, which errs toward scrubbing.
* phone — international-ish: optional ``+``, then 9-14 digits
  interspersed with at most TWO separator chars (space ``-`` ``.``
  ``(`` ``)``) between digit groups — "+1 (555) 123-4567" needs two —
  ending in a digit.  Plain long numbers and dashed timestamps of 9+
  digits DO match — documented false-positive direction; tune with
  ``kinds=`` when such ids live in prose.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# ordered: emails first (an email contains digit runs a phone pattern
# could chew on), then ips (dotted digits would also phone-match), then
# phones over the residue
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (
        r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    "ip": (
        r"\b(\d{1,3}\.){3}\d{1,3}\b",
        "<IP>",
    ),
    "phone": (
        r"\+?\d([ .()\-]{0,2}\d){8,13}",
        "<PHONE>",
    ),
}


def pii_counts(ds, text_col: str = "text", kinds=("email", "ip", "phone")):
    """Annotate each doc with per-kind match counts (``n_pii_email``,
    …) — the audit pass.  Counts are taken over the RESIDUE of the
    preceding kinds' replacements (same canonical order the redactor
    uses), so each count equals the number of placeholder tokens that
    kind would actually emit — a raw-text count would double-report a
    dotted IP as a phone number the redactor never touches."""
    ordered = tuple(k for k in PII_PATTERNS if k in set(kinds))

    def f(t: pa.Table) -> pa.Table:
        col = pc.cast(t[text_col], pa.string())
        for k in ordered:
            pat, repl = PII_PATTERNS[k]
            name = f"n_pii_{k}"
            if name in t.column_names:
                t = t.drop_columns([name])
            n = pc.cast(pc.count_substring_regex(col, pat), pa.int64())
            t = t.append_column(name, pc.fill_null(n, 0))  # null text → 0
            col = pc.replace_substring_regex(col, pat, repl)
        return t

    return ds.map_batches(f, batch_format="pyarrow")


def _canonical_kinds(kinds) -> tuple[str, ...]:
    """Validate and reorder ``kinds`` into the declared-safe order
    (emails before ips before phones — see module docstring): a caller
    passing ('phone', 'ip', 'email') must not get the phone pattern
    chewing dotted IPs and email digit runs first, which would diverge
    from ``pii_counts``' accounting."""
    unknown = set(kinds) - set(PII_PATTERNS)
    if unknown:
        raise ValueError(f"unknown pii kinds: {sorted(unknown)}")
    return tuple(k for k in PII_PATTERNS if k in set(kinds))


def redact_batch(
    t: pa.Table, text_col: str = "text", kinds=("email", "ip", "phone")
) -> pa.Table:
    """Pure per-batch redaction (shared by the Ray stage and tests).
    Kinds are canonicalized and validated here too, so a direct caller
    gets the same order-independent semantics as ``redact_pii``."""
    col = pc.cast(t[text_col], pa.string())
    for k in _canonical_kinds(kinds):
        pat, repl = PII_PATTERNS[k]
        col = pc.replace_substring_regex(col, pat, repl)
    idx = t.column_names.index(text_col)
    return t.set_column(idx, text_col, col)


def redact_pii(ds, text_col: str = "text", kinds=("email", "ip", "phone")):
    """Rewrite the text column with placeholder tokens; schema
    unchanged.  Kinds apply in the declared order (see module
    docstring) regardless of the order given."""
    ordered = _canonical_kinds(kinds)
    return ds.map_batches(
        lambda t: redact_batch(t, text_col, ordered), batch_format="pyarrow"
    )
