"""PII detection/redaction for training-data pipelines.

Regex masking of common identifier shapes (emails, IPv4 addresses,
phone-like digit runs, long numeric ids) — the standard pre-training
scrub (public C4/Dolma-style pipelines). N/A in the reference (no
text layer).

Scale design: pure JVM ``regexp_replace`` / ``regexp_count`` column
expressions — whole-stage codegen, zero shuffle, linear per row.
Patterns deliberately stick to the regex subset with identical
semantics in Java (Spark) and RE2-ish engines (DuckDB oracle):
explicit classes like ``[0-9]``, no lookaround, no backreferences.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: the email pattern must run before the digit-run pattern so
# a numeric local-part is masked as an email, not as an id.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+",
    "ipv4": r"[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+",
    "phone": r"\+[0-9][0-9 -]+[0-9]",
    "id_digits": r"[0-9][0-9][0-9][0-9][0-9][0-9]+",
}


def pii_count(text: Column, kind: str) -> Column:
    """Occurrences of one PII pattern (0 for clean text)."""
    return F.regexp_count(text, F.lit(PII_PATTERNS[kind]))


def redact(
    text: Column,
    kinds: tuple[str, ...] = ("email", "ipv4", "phone", "id_digits"),
    token: str = "[PII]",
) -> Column:
    """Mask every match of the selected patterns with ``token``,
    applied in ``PII_PATTERNS`` order (email before digit runs)."""
    out = text
    for kind in PII_PATTERNS:
        if kind in kinds:
            out = F.regexp_replace(out, PII_PATTERNS[kind], token)
    return out


def with_pii_stats(
    df: DataFrame,
    text_col: str = "text",
    kinds: tuple[str, ...] = ("email", "ipv4", "phone", "id_digits"),
) -> DataFrame:
    """Add per-kind match counts (``n_<kind>``) and a ``redacted``
    column. The raw column is projected once; counts run on the raw
    text, the mask on the chained replaces."""
    out = df
    for kind in kinds:
        out = out.withColumn(f"n_{kind}", pii_count(F.col(text_col), kind))
    return out.withColumn("redacted", redact(F.col(text_col), kinds))
