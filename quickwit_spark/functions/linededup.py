"""Line-level exact dedup across a web corpus (boilerplate removal).

Web pages share exact lines — cookie banners, navigation, "subscribe"
footers. The standard curation step (CCNet / RefinedWeb / MassiveText
style) removes every line whose exact text appears in at least
``min_docs`` DISTINCT documents, from ALL documents, and keeps the
per-doc remainder in original order.

Plan shape (scale analysis for 100 TB):
1. split → posexplode: narrow per-row flatMap, no shuffle;
2. duplicate-line detection groups on ``md5(line)`` — a 32-byte key,
   NOT the line text — with map-side partial distinct-doc counting
   (``count_distinct`` over a pre-deduped (hash, doc) projection), so
   the shuffle carries one row per (line-hash, doc), never the text;
3. membership join back on the hash: the duplicate set is normally
   tiny relative to the corpus (boilerplate lines), so AQE will
   broadcast it; a skewed hash key cannot exist (md5);
4. one groupBy(doc) re-assembly with ``sort_array`` on (pos, line) —
   the only full-text shuffle, size ≤ the input text itself.

Everything is built-in JVM expressions — no Python in any hot path —
and the DuckDB oracle in ``__spark_entry__`` replicates the exact
semantics (same trim/empty-line rules, same min_docs threshold).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _lines(
    df: DataFrame, text_col: str, id_col: str, sep: str = "\n"
) -> DataFrame:
    """(id, pos, line): trimmed non-empty units with original index.
    ``pos`` counts RETAINED units (post-filter), matching the oracle.
    ``sep`` picks the unit: ``"\\n"`` = lines, ``"\\n\\n"`` = paragraphs
    (the RefinedWeb-style paragraph-dedup granularity).
    """
    arr = F.transform(F.split(F.col(text_col), sep), lambda l: F.trim(l))
    kept = F.filter(arr, lambda l: l != "")
    return (
        df.select(F.col(id_col).alias("doc_id"), F.posexplode(kept).alias("pos", "line"))
    )


def dedup_lines_within(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Intra-document repetition removal (RefinedWeb §"repetition"
    flavor at line granularity): within each doc, keep only the FIRST
    occurrence of every exact (trimmed) line; later repeats are cut.

    Unlike :func:`dedup_lines` (cross-doc boilerplate), this needs no
    corpus-wide state at all — it is ONE per-row projection with zero
    shuffles and zero joins, so at 100 TB it is embarrassingly
    parallel and scan-bound. The running "seen" set is built with
    ``F.aggregate`` over the line array (O(lines²) per doc in the
    worst case, but real pages have tens of lines; everything stays
    inside whole-stage codegen).

    Output: (doc_id, n_lines, n_removed, new_text) with the same
    trim/empty-line rules as :func:`dedup_lines`.
    """
    arr = F.filter(
        F.transform(F.split(F.col(text_col), sep), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    kept = F.aggregate(
        arr,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(F.array_contains(acc, x), acc).otherwise(
            F.concat(acc, F.array(x))
        ),
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(arr).alias("n_lines"),
        (F.size(arr) - F.size(kept)).alias("n_removed"),
        F.array_join(kept, sep).alias("new_text"),
    )


def dedup_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    sep: str = "\n",
) -> DataFrame:
    """Per input doc: ``n_lines`` (trimmed non-empty), ``n_removed``
    (lines whose exact text occurs in ≥ ``min_docs`` distinct docs),
    and ``new_text`` — the kept lines re-joined with ``sep`` in
    original order ('' when everything was removed).

    ``sep="\\n\\n"`` turns this into exact PARAGRAPH dedup (CCNet /
    RefinedWeb's coarser granularity) with identical plan shape — the
    unit hash, not the unit text, is what shuffles.

    Docs whose text has no retained lines at all still appear, with
    ``n_lines = 0`` and ``new_text = ''``.
    """
    lines = _lines(df, text_col, id_col, sep).withColumn(
        "h", F.md5(F.col("line"))
    )
    dup = (
        lines.select("h", "doc_id")
        .distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("h")
    )
    marked = lines.join(dup.withColumn("is_dup", F.lit(True)), "h", "left")
    per_doc = marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.when(F.col("is_dup"), 1).otherwise(0)).alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.coalesce(F.col("is_dup"), F.lit(False)),
                            F.struct(F.col("pos"), F.col("line")),
                        )
                    )
                ),
                lambda s: s["line"],
            ),
            sep,
        ).alias("new_text"),
    )
    base = df.select(F.col(id_col).alias("doc_id"))
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
            F.coalesce("new_text", F.lit("")).alias("new_text"),
        )
    )
