"""C4-style web-text cleaning (T5 paper §2.2, public heuristics).

The classic webtext curation pass applied line-by-line to each page:

* keep only lines that end in a terminal punctuation mark
  (``.``, ``!``, ``?``, ``"``);
* drop lines with fewer than ``min_words`` words (C4: 5);
* drop lines containing the word ``javascript`` (case-insensitive);

and page-by-page:

* drop pages containing ``lorem ipsum`` (case-insensitive);
* drop pages containing a curly brace ``{`` (code);
* drop pages with fewer than ``min_kept_lines`` retained lines (C4: 3);
* optionally drop pages containing any of a caller-supplied bad-word
  list (C4 uses the public "dirty naughty" list; we take it as a
  parameter — no list is baked in).

Scale shape (the 100 TB argument): this is a PURE MAP — every rule is
a per-document JVM higher-order-function expression (split / filter /
transform / array_join), so the whole cleaner runs inside one
whole-stage-codegen project with ZERO shuffles, no Python, and perfect
linear scaling across executors. Filter composition happens inside the
lambda, so line text is never exploded into rows at all.

Reference anchor: the reference indexes raw web pages
(quickwit-index-config/src/default_index_config/mod.rs — body/text
field mapping); this operator is the curation stage a webtext corpus
runs before indexing, same tier as linededup.py / textstats.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: C4's terminal punctuation set (T5 paper: "terminal punctuation mark").
TERMINAL_PUNCT = (".", "!", "?", '"')


def _line_ok(line: Column, min_words: int) -> Column:
    """Line-keep predicate over an already-trimmed, non-empty line."""
    last = line.substr(-1, 1)
    terminal = last.isin(*TERMINAL_PUNCT)
    words = F.size(F.filter(F.split(line, " "), lambda w: w != ""))
    no_js = ~F.lower(line).contains("javascript")
    return terminal & (words >= min_words) & no_js


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 5,
    min_kept_lines: int = 3,
    badwords: list[str] | None = None,
) -> DataFrame:
    """Apply C4's line and page filters; one row per input doc.

    Output columns:

    * ``doc_id`` — the id column, passed through;
    * ``n_lines`` — trimmed non-empty input lines;
    * ``n_kept`` — lines surviving the line filters;
    * ``kept`` — int 0/1: page survives the page-level filters;
    * ``clean_text`` — kept lines re-joined with ``\\n`` in original
      order ('' when the page is dropped or nothing survived).

    Dropped pages still appear (``kept = 0``) so the caller can audit
    the rejection rate; filter on ``kept = 1`` to materialize a corpus.
    """
    text = F.col(text_col)
    arr = F.filter(
        F.transform(F.split(text, "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    kept_lines = F.filter(arr, lambda l: _line_ok(l, min_words))
    lowered = F.lower(text)
    page_ok = (
        ~lowered.contains("lorem ipsum")
        & ~text.contains("{")
        & (F.size(kept_lines) >= min_kept_lines)
    )
    for w in badwords or []:
        page_ok = page_ok & ~lowered.contains(w.lower())
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(arr).alias("n_lines"),
        F.size(kept_lines).alias("n_kept"),
        page_ok.cast("int").alias("kept"),
        F.when(page_ok, F.array_join(kept_lines, "\n"))
        .otherwise(F.lit(""))
        .alias("clean_text"),
    )
