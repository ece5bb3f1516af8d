"""Analyzer chain — the reference's scalar-function surface.

Quickwit 0.2.1 exposes exactly three tokenizers
(docs/reference/index-config.md:130-132, SURVEY.md §2.3):

- ``raw``     — whole value as a single token, no normalization
- ``default`` — split on non-alphanumeric, drop tokens of >= 40 bytes
  (tantivy ``SimpleTokenizer + RemoveLongFilter(40) + LowerCaser``),
  lowercase
- ``stem_en`` — ``default`` + English stemming

Two parallel implementations with identical outputs:

1. Spark-native column expressions (JVM-side, codegen'd — the hot
   path; no Python involved), via :func:`tokenize_col`.
2. Pure-Python :func:`tokenize` used by the golden oracle and by the
   stemming pandas UDF.

Unicode note: Spark's regex ``[^\\p{L}\\p{N}]`` and Rust's
``char::is_alphanumeric`` agree on all alphanumerics we target; the
token length limit is UTF-8 *bytes* (``octet_length``), matching
tantivy's ``RemoveLongFilter``.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_MAX_BYTES = 40
_SPLIT_RE = r"[^\p{L}\p{N}]+"
_PY_SPLIT_RE = re.compile(r"[^\w]+|_+", re.UNICODE)


def tokenize_col(col: Column, tokenizer: str = "default") -> Column:
    """Tokenize a string column into ``array<string>`` JVM-side."""
    if tokenizer == "raw":
        # raw: single token, no normalization (empty string -> no token)
        return F.when(F.length(col) > 0, F.array(col)).otherwise(
            F.array().cast("array<string>")
        )
    if tokenizer not in ("default", "stem_en"):
        raise ValueError(f"unknown tokenizer {tokenizer!r}")
    toks = F.split(F.lower(col), _SPLIT_RE)
    toks = F.filter(
        toks,
        lambda t: (F.length(t) > 0) & (F.octet_length(t) < TOKEN_MAX_BYTES),
    )
    if tokenizer == "stem_en":
        from pyspark.sql.pandas.functions import pandas_udf

        toks = _stem_tokens_udf()(toks)
    return toks


def tokenize(text: str, tokenizer: str = "default") -> list[str]:
    """Pure-Python mirror of :func:`tokenize_col` (oracle path)."""
    if text is None:
        return []
    if tokenizer == "raw":
        return [text] if text else []
    if tokenizer not in ("default", "stem_en"):
        raise ValueError(f"unknown tokenizer {tokenizer!r}")
    toks = [
        t
        for t in _PY_SPLIT_RE.split(text.lower())
        if t and len(t.encode("utf-8")) < TOKEN_MAX_BYTES
    ]
    if tokenizer == "stem_en":
        from quickwit_spark.operators.porter import stem

        toks = [stem(t) for t in toks]
    return toks


_STEM_UDF = None


def _stem_tokens_udf():
    """Arrow-batched stemmer over array<string> (only used when a
    field is configured ``stem_en`` — the default path stays JVM)."""
    global _STEM_UDF
    if _STEM_UDF is None:
        import pandas as pd
        from pyspark.sql.pandas.functions import pandas_udf

        from quickwit_spark.operators.porter import stem

        def _stem(arrs):
            return arrs.map(
                lambda toks: [stem(t) for t in toks] if toks is not None else None
            )

        _stem.__annotations__ = {"arrs": pd.Series, "return": pd.Series}
        _STEM_UDF = pandas_udf(_stem, "array<string>")
    return _STEM_UDF
