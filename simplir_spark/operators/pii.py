"""PII detection and redaction over text columns.

A training-data pipeline scrubs personally identifiable information
before the corpus reaches a model.  Both operators are pure JVM regex
expressions (regexp_count / regexp_replace inside whole-stage codegen —
no Python, no shuffle; a single scan-and-project pass at any corpus
size), and the patterns deliberately restrict themselves to the regex
subset with identical semantics in Java's engine and RE2 (character
classes, bounded quantifiers, no backreferences/lookaround), so the
DuckDB driver oracle can run the very same patterns.

Reference parity note: the reference pipeline has no PII stage; this is
part of the LLM-data-pipeline brief (same family as dedup/quality/
decontamination).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Pattern dialect contract: Java regex AND RE2 compatible (ASCII classes,
# no lookaround).  Keys are stable public names; order matters for
# redaction (URLs first so their digit runs aren't half-eaten by the
# phone pattern; emails before hosts for the same reason).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # NOT [^\s]: Java's \s includes \x0B, RE2's does not — an explicit
    # class keeps the two engines matching the same spans (the same
    # divergence text.py works around for its token regex)
    "url": r"https?://[^ \t\r\n\f\x0B]+",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    # one digit per repeat with at most two separators between digits
    # (") " in formatted numbers), 9+ digits total: an ISO date (8
    # digits) can no longer redact to <PHONE>; the dialect has no
    # lookaround (RE2), so \b bounds both ends
    "phone": r"\+?\b[0-9](?:[()\[\]. -]{0,2}[0-9]){8,15}\b",
}


def pii_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_email, n_url, n_ipv4, n_phone, n_pii): match counts per PII
    class — the audit/reporting half.  Counts follow the same precedence
    as :func:`redact_pii`: each class is counted on text with
    earlier-listed classes already replaced by sentinels, so the digits
    inside a URL or an IPv4 are never double-counted as a phone number
    (class counts partition the matched spans)."""
    counts = []
    cur = F.col(text_col)
    for name, pat in PII_PATTERNS.items():
        counts.append(F.regexp_count(cur, F.lit(pat)).cast("long").alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, f"<{name.upper()}>")
    out = docs.select(F.col(id_col), *counts)
    total = None
    for name in PII_PATTERNS:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return out.withColumn("n_pii", total.cast("long"))


def redact_pii(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "redacted_text",
) -> DataFrame:
    """Replace each PII match with a typed sentinel (``<EMAIL>``,
    ``<URL>``, ``<IPV4>``, ``<PHONE>``) — the scrubbing half.  Patterns
    apply in PII_PATTERNS order, each over the previous result, so a URL
    containing digits is redacted as one URL, not a URL plus a phone."""
    expr = F.col(text_col)
    for name, pat in PII_PATTERNS.items():
        expr = F.regexp_replace(expr, pat, f"<{name.upper()}>")
    return docs.withColumn(out_col, expr)


def pii_oracle_sql_columns() -> str:
    """DuckDB SELECT-list fragment computing the same counts with the
    same patterns and the same redact-then-count precedence
    (len(regexp_extract_all(...)) counts non-overlapping matches exactly
    like regexp_count; nested regexp_replace('g') mirrors the sequential
    sentinel substitution)."""
    parts = []
    count_exprs = []
    cur = "text"
    for name, pat in PII_PATTERNS.items():
        esc = pat.replace("'", "''")
        cnt = f"len(regexp_extract_all({cur}, '{esc}'))"
        parts.append(f"CAST({cnt} AS BIGINT) AS n_{name}")
        count_exprs.append(cnt)
        cur = f"regexp_replace({cur}, '{esc}', '<{name.upper()}>', 'g')"
    parts.append(f"CAST({' + '.join(count_exprs)} AS BIGINT) AS n_pii")
    return ", ".join(parts)
