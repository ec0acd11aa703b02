"""PII redaction — regex scrubbing of emails / IPv4 / SSN / phone.

The standard pre-training scrub pass (the C4/Pile pipelines drop or mask
these).  Pure Catalyst: regexp_replace / regexp_count chains inside
whole-stage codegen — no UDFs, scales as a map-only pass (no shuffle).

Patterns are written in the common Java-regex ∩ RE2 subset (no
backreferences, no lookaround) so the DuckDB oracle replays them
verbatim.  Order matters and is fixed: SSN before phone (an SSN is a
valid match for the looser phone shape), IP before phone (dotted quads
share digit runs), email first (it may contain digit runs a later pass
would mangle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# (name, pattern, replacement) in application order
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (
        "ip",
        r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
        "[IP]",
    ),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    (
        "phone",
        # international (+cc ...) OR the two common domestic shapes —
        # (212) 555-0199 and 555-123-4567.  The domestic alternatives run
        # AFTER ssn in the chain: 123-45-6789 is already [SSN] by the
        # time this pattern scans (and \d{3}-\d{3}-\d{4} would not match
        # an SSN's 2-digit middle group anyway)
        r"(\+\d[\d\- ]{7,14}\d|\(\d{3}\) ?\d{3}-\d{4}|\b\d{3}-\d{3}-\d{4}\b)",
        "[PHONE]",
    ),
]


def redact_pii(df: DataFrame, text_col: str) -> DataFrame:
    """Append per-category match counts and the redacted text.

    Adds columns n_email, n_ip, n_ssn, n_phone (counts BEFORE redaction,
    each measured on the text as already redacted by the earlier
    categories — the same sequential semantics the replacement chain has)
    and `redacted` (all four categories masked, in order).
    """
    out = df
    redacted: Column = F.col(text_col)
    for name, pat, token in PII_PATTERNS:
        out = out.withColumn(f"n_{name}", F.regexp_count(redacted, F.lit(pat)))
        redacted = F.regexp_replace(redacted, pat, token)
        # rebind the running column through the frame so each count sees
        # the prior categories' replacements, exactly like the SQL oracle
        out = out.withColumn("__scrub", redacted)
        redacted = F.col("__scrub")
    return out.withColumnRenamed("__scrub", "redacted")
