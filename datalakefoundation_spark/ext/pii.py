"""PII detection and redaction for training-data pipelines.

Scrubbing personally-identifiable information (emails, IPs, phone numbers,
long account-number-like digit runs) is a standard pre-training step on
scraped corpora. Everything here is JVM-side ``regexp_extract_all`` /
``regexp_replace`` — one codegen'd projection per document, no shuffle, no
Python — so at 100 TB it runs at parquet-scan speed.

Pattern portability: every pattern below is written in the common subset of
Java regex (Spark) and RE2 (DuckDB) — character classes, bounded/unbounded
counted repetition, optional escapes; no backreferences, no lookaround —
so the DuckDB oracle executes the *identical* pattern strings and the
redaction pipeline is bit-reproducible across engines.

A production deployment would extend PATTERNS with locale-specific shapes
(IBANs, national-ID formats) and plug an NER model via mapInPandas for
name/address detection; the regex tier stays the cheap first pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: redaction applies these sequentially, so earlier patterns must
# not produce text that later patterns match (replacement tokens are
# letter-only on purpose). The phone pattern requires the leading '+' so it
# cannot also swallow bare digit runs — those are DIGIT_RUN's to count.
PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ipv4", r"[0-9]{1,3}(\.[0-9]{1,3}){3}", "<IP>"),
    ("phone", r"\+[0-9][0-9 ()\-]{5,}[0-9]", "<PHONE>"),
    ("digit_run", r"[0-9]{9,}", "<NUMBER>"),
)


def pii_counts(text_col: str | Column) -> dict[str, Column]:
    """Per-type match counts on the RAW text (each type counted
    independently — counts do not interact with redaction order)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return {
        f"n_{name}": F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0)))
        for name, pat, _ in PATTERNS
    }


def redact(text_col: str | Column) -> Column:
    """Replace every PII match with its type token, applying PATTERNS in
    order (emails before digit runs, so an address is one <EMAIL>, not an
    <EMAIL> with a mangled tail)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    for _, pat, token in PATTERNS:
        c = F.regexp_replace(c, pat, token)
    return c


def pii_scrub(
    df: DataFrame, text_col: str = "text", redacted_col: str = "redacted"
) -> DataFrame:
    """Append per-type PII counts and a fully redacted text column. One
    projection; downstream stages read ``redacted`` and drop the raw text."""
    out = df
    for name, col in pii_counts(text_col).items():
        out = out.withColumn(name, col)
    return out.withColumn(redacted_col, redact(text_col))
