"""PII detection + redaction for training-data curation.

A 100 TB web corpus cannot ship raw emails/phones/IPs into a training
set; the standard pipeline step is regex scrubbing (the approach used
by public corpus-curation stacks — e.g. BigScience ROOTS / Dolma-style
regex PII filters). Everything here is pure JVM column expressions
(`regexp_extract_all` / `regexp_replace`, whole-stage codegen, no
Python in the hot path, no shuffle), so it scales as a narrow map over
however many partitions the corpus has.

Pattern language is the intersection of Java regex (Spark) and RE2
(DuckDB oracle): character classes, bounded repetition, non-capturing
groups, ``\\b`` word boundaries — no backreferences or lookaround, so
both engines match identically and the DuckDB oracle is exact.

Redaction replaces matches with typed placeholder tokens
(``<EMAIL>`` …) IN PATTERN ORDER — order matters when a later pattern
could match inside an earlier match's text, and both the Spark and
oracle implementations apply the same sequence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (name, pattern, placeholder) — applied in this order
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        # 3-2-4 SSN shape BEFORE phone (3-3-4) — disjoint shapes, but
        # keeping a fixed order makes the contract order-independent
        # of regex-engine tie-breaking
        "ssn",
        r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
        "<SSN>",
    ),
    (
        "phone",
        r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b",
        "<PHONE>",
    ),
    (
        "ipv4",
        r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
        "<IP>",
    ),
)


def with_pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add per-category PII match counts (on the ORIGINAL text) and a
    ``scrubbed`` column with all categories redacted in pattern order.

    Counts are computed before any replacement so they reflect the
    input, not the partially-redacted intermediate.
    """
    c = F.col(text_col)
    out = df
    scrubbed = c
    for name, pattern, placeholder in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}", F.size(F.regexp_extract_all(c, F.lit(pattern), 0))
        )
        scrubbed = F.regexp_replace(scrubbed, pattern, placeholder)
    total = None
    for name, _, _ in PII_PATTERNS:
        col = F.col(f"n_{name}")
        total = col if total is None else total + col
    return out.withColumn("n_pii", total).withColumn("scrubbed", scrubbed)


def pii_oracle_exprs(text_expr: str = "text") -> tuple[str, str]:
    """DuckDB SQL fragments mirroring :func:`with_pii_scrub` exactly:
    (count-columns select-list fragment, scrubbed expression)."""
    counts = []
    scrubbed = text_expr
    for name, pattern, placeholder in PII_PATTERNS:
        p = pattern.replace("'", "''")
        counts.append(
            f"len(regexp_extract_all({text_expr}, '{p}')) AS n_{name}"
        )
        scrubbed = f"regexp_replace({scrubbed}, '{p}', '{placeholder}', 'g')"
    total = " + ".join(
        f"len(regexp_extract_all({text_expr}, '{pat.replace(chr(39), chr(39) * 2)}'))"
        for _, pat, _ in PII_PATTERNS
    )
    counts.append(f"{total} AS n_pii")
    return ", ".join(counts), f"{scrubbed} AS scrubbed"
