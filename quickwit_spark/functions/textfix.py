"""Deterministic Unicode text fixing (ftfy-lite) for web corpora.

Crawled text carries control characters, zero-width code points,
NBSPs, "smart" punctuation and ragged whitespace; training pipelines
normalize these before tokenization (ftfy / RefinedWeb's cleaning
pass). This is the deterministic, oracle-checkable subset: a FIXED
pipeline of global regex rewrites, every pattern in the Java∩RE2
subset (the urlnorm.py portability contract) so DuckDB reproduces
the output byte-for-byte.

Pipeline (order is part of the contract):
1. drop C0/DEL control chars (keeping \\t and \\n);
2. drop zero-width chars (U+200B..U+200D, U+FEFF);
3. NBSP → space;
4. smart quotes → ASCII quotes, en/em dash → '-', ellipsis → '...';
5. runs of spaces/tabs → one space;
6. spaces hugging a newline removed;
7. 3+ newlines → exactly two;
8. outer trim.

Scale: ONE shuffle-free codegen projection per doc — the same plan
class as webclean.c4_clean (plan-asserted in tests). Counts are
integers and the cleaned text is verified via length+md5, the
transport-robust cell discipline from round 4.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_CTRL = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"
_ZW = "[\u200b-\u200d\ufeff]"
_SQUOTE = "[‘’‛]"
_DQUOTE = "[“”„]"
_DASH = "[–—]"


def fix_text_col(col: Column) -> Column:
    """The fixed rewrite pipeline as one nested codegen expression."""
    c = F.regexp_replace(col, _CTRL, "")
    c = F.regexp_replace(c, _ZW, "")
    c = F.regexp_replace(c, "\u00a0", " ")
    c = F.regexp_replace(c, _SQUOTE, "'")
    c = F.regexp_replace(c, _DQUOTE, '"')
    c = F.regexp_replace(c, _DASH, "-")
    c = F.regexp_replace(c, "…", "...")
    c = F.regexp_replace(c, r"[ \t]+", " ")
    c = F.regexp_replace(c, r" *\n *", "\n")
    c = F.regexp_replace(c, r"\n{3,}", "\n\n")
    return F.trim(c)


def fix_text(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, orig_len, clean_len, n_dropped, clean_text) where
    ``n_dropped`` counts control + zero-width code points removed by
    steps 1-2 (the "data loss" the fix introduces — quote/dash/space
    rewrites preserve information, drops don't)."""
    orig = F.col(text_col)
    after_drop = F.regexp_replace(
        F.regexp_replace(orig, _CTRL, ""), _ZW, ""
    )
    clean = fix_text_col(orig)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.length(orig).alias("orig_len"),
        F.length(clean).alias("clean_len"),
        (F.length(orig) - F.length(after_drop)).alias("n_dropped"),
        clean.alias("clean_text"),
    )
