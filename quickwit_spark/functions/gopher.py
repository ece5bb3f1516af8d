"""Gopher document-quality rules (Rae et al. 2021, Table A1 — public).

The MassiveText curation bundle: per-document counts plus the seven
keep/drop rules, every rule evaluated with INTEGER arithmetic only
(``3·words ≤ chars`` instead of ``chars/words ≥ 3``), so the verdicts
are bit-reproducible across engines — no float division appears
anywhere in a hash-compared cell.

Scale shape: like webclean.py this is a PURE MAP — split / filter /
aggregate higher-order expressions per row, zero shuffles, whole-stage
codegen, no Python. Filtering 10^12 docs costs one scan.

Rules (keep when ALL hold; thresholds are the paper's defaults):

1. ``r_word_count``   — 50 ≤ words ≤ 100 000;
2. ``r_mean_word_len``— mean word length in [3, 10];
3. ``r_symbol_ratio`` — (# '#' + '...' occurrences) / words ≤ 0.1;
4. ``r_bullet_lines`` — ≤ 90% of lines start with a bullet
   (``•``, ``- ``, ``* ``);
5. ``r_ellipsis_lines`` — ≤ 30% of lines end with ``...`` / ``…``;
6. ``r_alpha_words``  — ≥ 80% of words contain an alphabetic char;
7. ``r_required_stops`` — ≥ 2 distinct words from the paper's
   required-stopword list {the, be, to, of, and, that, have, with}.

Reference scope note: the reference engine indexes web pages but does
not curate them; this extends the corpus-curation tier alongside
textstats.py / webclean.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from quickwit_spark.functions.textstats import tokens_col

REQUIRED_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

BULLET_PREFIXES = ("•", "- ", "* ")


def _occurrences(text: Column, needle: str) -> Column:
    """Non-overlapping occurrence count via length difference."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """Per-doc Gopher counts, the seven rule flags (int 0/1), and the
    conjunction ``keep``. All cells are integers."""
    text = F.col(text_col)
    words = F.filter(F.split(text, r"\s+"), lambda w: w != "")
    n_words = F.size(words).cast("long")
    word_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda a, w: a + F.length(w)
    )
    n_symbols = _occurrences(text, "#") + _occurrences(text, "...")
    lines = F.filter(
        F.transform(F.split(text, "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    n_lines = F.size(lines).cast("long")

    def _starts_bullet(l: Column) -> Column:
        cond = F.lit(False)
        for p in BULLET_PREFIXES:
            cond = cond | l.startswith(p)
        return cond

    n_bullet = F.size(F.filter(lines, _starts_bullet)).cast("long")
    n_ellipsis = F.size(
        F.filter(lines, lambda l: l.endswith("...") | l.endswith("…"))
    ).cast("long")
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]"))).cast(
        "long"
    )
    req = F.array(*[F.lit(w) for w in REQUIRED_STOPWORDS])
    n_required = F.size(
        F.array_intersect(F.array_distinct(tokens_col(text)), req)
    ).cast("long")

    out = df.select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        word_chars.alias("word_chars"),
        n_symbols.alias("n_symbols"),
        n_lines.alias("n_lines"),
        n_bullet.alias("n_bullet"),
        n_ellipsis.alias("n_ellipsis"),
        n_alpha.alias("n_alpha"),
        n_required.alias("n_required"),
    )
    c = F.col
    rules = {
        # integer-exact rewrites of the paper's ratio thresholds
        "r_word_count": (c("n_words") >= min_words)
        & (c("n_words") <= max_words),
        "r_mean_word_len": (3 * c("n_words") <= c("word_chars"))
        & (c("word_chars") <= 10 * c("n_words")),
        "r_symbol_ratio": 10 * c("n_symbols") <= c("n_words"),
        "r_bullet_lines": 10 * c("n_bullet") <= 9 * c("n_lines"),
        "r_ellipsis_lines": 10 * c("n_ellipsis") <= 3 * c("n_lines"),
        "r_alpha_words": 5 * c("n_alpha") >= 4 * c("n_words"),
        "r_required_stops": c("n_required") >= 2,
    }
    keep = F.lit(True)
    for name, cond in rules.items():
        out = out.withColumn(name, cond.cast("int"))
        keep = keep & cond
    return out.withColumn("keep", keep.cast("int"))
