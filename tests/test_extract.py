"""HTML → text extraction: byte-identical invariant (input_hint) and
JVM-expression / Python-reference equivalence."""

from __future__ import annotations

import numpy as np
import pandas as pd

from quickwit_spark.sources.corpus import gen_batch, text_to_html
from quickwit_spark.sources.extract import extract_text, with_extracted_text

EDGE_HTMLS = [
    None,
    b"",
    b"<html><body>no paragraphs</body></html>",
    b"<html><body><p></p></body></html>",
    b"<html><body><p>a <b>bold</b> c</p><p>x</p></body></html>",
    "<html><body><p>héllo wörld 中文</p></body></html>".encode(),
    b"<p>unclosed <i>nested <p>inner</p>",
]


def test_extract_is_inverse_of_wrapper():
    pdf = gen_batch(np.arange(200), seed=42)
    for _, row in pdf.iterrows():
        assert extract_text(row["html"]) == row["text"]
    # explicit round-trip through the wrapper
    for i, text in enumerate(["one two three", "a" * 500, "x " * 40]):
        assert extract_text(text_to_html(i, text)) == text


def test_jvm_extract_matches_python_reference(spark):
    pdf = gen_batch(np.arange(300), seed=7)[["url", "html", "text"]]
    edges = pd.DataFrame(
        {
            "url": [f"edge://{i}" for i in range(len(EDGE_HTMLS))],
            "html": EDGE_HTMLS,
            "text": [None] * len(EDGE_HTMLS),
        }
    )
    df = spark.createDataFrame(pd.concat([pdf, edges], ignore_index=True))
    got = {
        r["url"]: r["out"]
        for r in with_extracted_text(df, out_col="out", jvm=True).collect()
    }
    want_corpus = {r["url"]: r["text"] for _, r in pdf.iterrows()}
    for url, text in want_corpus.items():
        assert got[url] == text, url
    for i, html in enumerate(EDGE_HTMLS):
        assert got[f"edge://{i}"] == extract_text(html), html


def test_jvm_extract_is_codegen_only(spark):
    """The extract stage must not spawn python workers: no
    ArrowEvalPython / BatchEvalPython node in the physical plan."""
    pdf = gen_batch(np.arange(8), seed=42)[["url", "html"]]
    df = with_extracted_text(spark.createDataFrame(pdf))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
