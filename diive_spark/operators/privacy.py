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


#: one alternation regex covering every category, in application order —
#: ONE scan of the document instead of one per category (r6 VERDICT item
#: 3: the four independent count scans were the regex-heavy residual in
#: the corpus-sized filter pass). Both Java regex and RE2 resolve
#: alternation leftmost-first in declaration order, so the fused match
#: stream is engine-portable like the per-category patterns.
PII_COMBINED: str = "|".join(f"({pat})" for _, pat, _ in PII_PATTERNS)


def pii_matches(text: Column) -> Column:
    """The fused single-scan match stream: every PII match in the
    document, one combined-alternation regex pass. MATERIALIZE this as
    its own projection column before classifying (see redact_pii):
    Catalyst does no common-subexpression elimination across duplicated
    regex/HOF subtrees (the documented sf1 HOF trap, textstats.py), so
    inlining it once per category re-ran the combined scan 4x per row —
    measured 0.6 s -> 51 s on the sf1 token_count gate before the r7
    materialization."""
    return F.regexp_extract_all(text, F.lit(PII_COMBINED), 0)


def pii_counts(matches: Column) -> dict[str, Column]:
    """Per-category match counts from the already-extracted fused match
    array (:func:`pii_matches`): matches are classified by shape (every
    email contains '@'; a phone starts with '+'; an IP contains '.';
    anything left is a long ID) — string tests on the tiny match
    substrings, never another pass over the document.

    Fused-scan semantics (matching the redaction): matches are
    NON-OVERLAPPING in priority order, so a digit run inside an already
    matched email is not additionally counted as a long ID — exactly the
    spans the redaction chain masks. (The pre-r7 independent scans could
    double-count text nested inside an earlier category's match.)"""
    n = F.size(matches).cast("bigint")
    email = F.size(F.filter(
        matches, lambda m: m.contains("@"))).cast("bigint")
    phone = F.size(F.filter(
        matches,
        lambda m: ~m.contains("@") & m.startswith("+"))).cast("bigint")
    ip = F.size(F.filter(
        matches,
        lambda m: ~m.contains("@") & ~m.startswith("+")
        & m.contains("."))).cast("bigint")
    return {"email": email, "ip": ip, "phone": phone,
            "longid": n - email - phone - ip}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_redacted",
    count: bool = True,
) -> DataFrame:
    """Mask every PII category in ``text_col`` into ``out_col`` and (by
    default) add ``n_pii_<category>`` count columns.

    Counts come from the fused single-scan match stream (see
    :func:`pii_matches`): non-overlapping matches in priority order — the
    same spans the redaction chain masks — so count and redaction
    semantics agree and the document is scanned ONCE for all four
    categories. The match array is materialized as an intermediate
    column on purpose: it is non-cheap and referenced once per category,
    so CollapseProject keeps the projection boundary and the combined
    regex runs once per row (the inline form re-ran it 4x — the sf1 HOF
    trap)."""
    t = F.col(text_col)
    if count:
        df = df.withColumn("_pii_m", pii_matches(t))
        for cat, c in pii_counts(F.col("_pii_m")).items():
            df = df.withColumn(f"n_pii_{cat}", c)
        df = df.drop("_pii_m")
    red = t
    for _, pat, repl in PII_PATTERNS:
        red = F.regexp_replace(red, pat, repl)
    return df.withColumn(out_col, red)


def pii_sql_exprs(text_expr: str) -> tuple[list[str], str]:
    """The DuckDB replay of :func:`redact_pii`: (count select-exprs,
    redacted-text expr) over ``text_expr``. Lives next to the patterns so
    a pattern edit cannot drift from its oracle. Counts replay the FUSED
    single-scan classification (RE2 resolves the alternation
    leftmost-first in the same declaration order as Java regex)."""
    am = f"regexp_extract_all({text_expr}, '{PII_COMBINED}')"
    email = f"len(list_filter({am}, m -> contains(m, '@')))"
    phone = (f"len(list_filter({am}, m -> NOT contains(m, '@')"
             f" AND starts_with(m, '+')))")
    ip = (f"len(list_filter({am}, m -> NOT contains(m, '@')"
          f" AND NOT starts_with(m, '+') AND contains(m, '.')))")
    counts = [
        f"CAST({email} AS BIGINT) AS n_pii_email",
        f"CAST({ip} AS BIGINT) AS n_pii_ip",
        f"CAST({phone} AS BIGINT) AS n_pii_phone",
        f"CAST(len({am}) - {email} - {phone} - {ip} AS BIGINT) AS n_pii_longid",
    ]
    red = text_expr
    for _, pat, repl in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    return counts, red
