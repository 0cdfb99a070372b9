"""PII detection and redaction — the scrub pass every public-web training
corpus runs before release (the C4 / Dolma-style regex family: emails,
IPv4 addresses, phone numbers).

Scale shape: pure JVM ``regexp_count`` / ``regexp_replace`` projections
riding the scan — no shuffle, no UDF, no explode — so a 100 TB corpus pays
exactly one pass.  Patterns are deliberately written in the common subset
of Java regex and RE2 (ASCII ``\\d``/``\\b``, non-capturing groups, greedy
quantifiers with unambiguous splits) so a DuckDB oracle reproduces counts
and redacted text byte-for-byte — the cross-engine-portability discipline
used by ``dedup.poly_hash``.

Reference parity note: brokercap/Bifrost has no PII stage (it is a CDC
bus); this operator belongs to the LLM-training-data pipeline family the
engine adds on top (see SURVEY.md §2's beyond-reference section).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Order matters for redaction: emails contain dots and digits but the
# patterns are disjoint on their anchors (@ / digit runs), so any order
# yields the same text; fixed here for determinism anyway.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    # local@domain.tld — TLD at least 2 alpha chars, no unicode classes
    "email": (r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    # dotted quad; \b keeps version strings like 1.2.3.4.5 from anchoring
    # mid-number (both engines treat \b as ASCII word boundary)
    "ipv4": (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    # +CC-XXX-XXXX international-ish form; fixed-width groups so greedy
    # (Java, leftmost-first) and longest-match (RE2) semantics coincide
    "phone": (r"\+\d{1,3}[-. ]\d{3}[-. ]\d{4}", "<PHONE>"),
}


def pii_signals(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Per-document PII hit counts: (doc_id, n_email, n_ipv4, n_phone,
    has_pii).  One JVM regex pass per pattern, all in the scan projection."""
    counts = [
        F.regexp_count(F.col(text_col), F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, (pat, _) in PII_PATTERNS.items()
    ]
    out = docs.select(F.col(id_col).alias("doc_id"), *counts)
    total = None
    for name in PII_PATTERNS:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return out.withColumn("has_pii", total > 0)


def scrub(docs: DataFrame, text_col: str = "text",
          id_col: str = "doc_id", keep: list[str] | None = None) -> DataFrame:
    """Signals AND redaction in ONE scan projection: (doc_id, n_email,
    n_ipv4, n_phone, has_pii, text_redacted, *keep).  The shape pipelines
    want — counting and replacing in the same pass costs one regex sweep
    per pattern either way, and fusing them avoids a doc_id join (a
    shuffle) between the two halves."""
    counts = []
    total = None
    for name, (pat, _) in PII_PATTERNS.items():
        c = F.regexp_count(F.col(text_col), F.lit(pat)).cast("long")
        counts.append(c.alias(f"n_{name}"))
        total = c if total is None else total + c
    red = F.col(text_col)
    for pat, token in PII_PATTERNS.values():
        red = F.regexp_replace(red, pat, token)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        *counts,
        (total > 0).alias("has_pii"),
        red.alias("text_redacted"),
        *[F.col(c) for c in (keep or [])],
    )


def redact_pii(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id",
               keep: list[str] | None = None) -> DataFrame:
    """Replace every PII match with its typed placeholder token.  Returns
    (doc_id, text_redacted, *keep).  Chained ``regexp_replace`` — still a
    single scan-stage projection."""
    red = F.col(text_col)
    for pat, token in PII_PATTERNS.values():
        red = F.regexp_replace(red, pat, token)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        red.alias("text_redacted"),
        *[F.col(c) for c in (keep or [])],
    )
