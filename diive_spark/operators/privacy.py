"""PII detection and redaction for training-data pipelines (engine-new
surface — no diive counterpart; SURVEY.md scope note on LLM-corpus ops).

Public recipe: every large open corpus pipeline (C4, The Pile, Dolma,
RefinedWeb) runs a regex tier that masks emails / IP addresses / phone
numbers / long ID-like digit runs before training. This is that tier,
as pure column expressions:

- **row-local**: both the counts and the redaction ride the scan — no
  shuffle, no UDF, full whole-stage codegen at 100 TB;
- **engine-portable**: the patterns are written in the common subset of
  Java regex (Spark) and RE2 (DuckDB) — no lookarounds, no backrefs —
  so the SQL oracle replays detection AND redaction bit-for-bit;
- **order-pinned**: redaction applies category by category in the
  declared order (email, ip, phone, long id), so overlapping-adjacent
  text resolves deterministically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (category, pattern, replacement) in application order. Patterns stay in
#: the Java-regex ∩ RE2 common subset (no lookaround/backrefs) on purpose.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,3}[ -]\d{2,4}[ -]\d{3,4}[ -]\d{3,4}", "<PHONE>"),
    ("longid", r"\b\d{13,16}\b", "<ID>"),
)


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-category match counts on the ORIGINAL text (before redaction),
    each ``size(regexp_extract_all(...))`` — one regex scan per category,
    all riding the same projection."""
    return {
        cat: F.size(F.regexp_extract_all(text, F.lit(pat), 0)).cast("bigint")
        for cat, pat, _ in PII_PATTERNS
    }


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_redacted",
    count: bool = True,
) -> DataFrame:
    """Mask every PII category in ``text_col`` into ``out_col`` and (by
    default) add ``n_pii_<category>`` count columns measured pre-redaction.

    Counting happens on the original text so categories whose matches are
    destroyed by an earlier replacement (an email's domain never contains
    an IP, but the guarantee is structural, not lexical) still report the
    true occurrence count."""
    t = F.col(text_col)
    if count:
        for cat, c in pii_counts(t).items():
            df = df.withColumn(f"n_pii_{cat}", c)
    red = t
    for _, pat, repl in PII_PATTERNS:
        red = F.regexp_replace(red, pat, repl)
    return df.withColumn(out_col, red)


def pii_sql_exprs(text_expr: str) -> tuple[list[str], str]:
    """The DuckDB replay of :func:`redact_pii`: (count select-exprs,
    redacted-text expr) over ``text_expr``. Lives next to the patterns so
    a pattern edit cannot drift from its oracle."""
    counts = [
        f"CAST(len(regexp_extract_all({text_expr}, '{pat}')) AS BIGINT) AS n_pii_{cat}"
        for cat, pat, _ in PII_PATTERNS
    ]
    red = text_expr
    for _, pat, repl in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    return counts, red
