"""Deterministic HTML → text extraction.

The per-row invariant mandated by BASELINE.json input_hint: extracted
text is byte-identical per url to the stored ``text`` column. The
extractor is a pure function (same bytes in → same bytes out),
exposed both as a plain Python function (oracle/goldens) and as an
Arrow-batched pandas UDF for the distributed pipeline.

Extraction rule: concatenate the contents of all ``<p>…</p>`` blocks
in document order, joined by a single space, after stripping any
other markup. This is the exact inverse of
:func:`quickwit_spark.sources.corpus.text_to_html`.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

_P_RE = re.compile(rb"<p>(.*?)</p>", re.DOTALL)
_TAG_RE = re.compile(rb"<[^>]+>")


def extract_text(html: bytes | None) -> str | None:
    """Pure extraction: join <p> block contents with single spaces."""
    if html is None:
        return None
    paras = _P_RE.findall(html)
    cleaned = [_TAG_RE.sub(b"", p) for p in paras]
    return b" ".join(cleaned).decode("utf-8")


_EXTRACT_UDF = None


def extract_text_udf():
    """Arrow-batched extractor UDF (built lazily — needs a session)."""
    global _EXTRACT_UDF
    if _EXTRACT_UDF is None:
        import pandas as pd
        from pyspark.sql.pandas.functions import pandas_udf

        def _extract(html):
            return html.map(extract_text)

        _extract.__annotations__ = {"html": pd.Series, "return": pd.Series}
        _EXTRACT_UDF = pandas_udf(_extract, "string")
    return _EXTRACT_UDF


def extract_text_col(html_col):
    """JVM-side extraction expression — same function as
    :func:`extract_text`, expressed with built-in regex functions so
    the build's extract stage stays inside whole-stage codegen (no
    python workers, no Arrow round-trip of the raw html bytes).

    Semantics match the Python reference for any VALID-UTF-8 html
    (the input contract: ``html`` is the UTF-8 encoding of the page):
    both engines see the same code points, the patterns are pure
    ASCII, and the output re-encodes to identical bytes. (On invalid
    UTF-8 the Python reference raises while the JVM decode would
    substitute U+FFFD — that input violates the column contract.)
    """
    decoded = html_col.cast("string")
    paras = F.regexp_extract_all(
        decoded, F.lit(r"(?s)<p>(.*?)</p>"), F.lit(1)
    )
    cleaned = F.transform(paras, lambda p: F.regexp_replace(p, r"<[^>]+>", ""))
    return F.array_join(cleaned, " ")


def with_extracted_text(df, html_col: str = "html", out_col: str = "text",
                        jvm: bool = True):
    """Add/replace the text column from html.

    ``jvm=True`` (default) uses the codegen regex expression;
    ``jvm=False`` keeps the Arrow-batched python UDF (reference
    implementation, and escape hatch for non-UTF-8 inputs where the
    caller wants Python's strict decode to fail loudly)."""
    if jvm:
        return df.withColumn(out_col, extract_text_col(F.col(html_col)))
    return df.withColumn(out_col, extract_text_udf()(F.col(html_col)))
