"""Split pruning: time-range + tag filtering of split metadata.

Driver-side planning, the analogue of the reference's
``list_relevant_splits`` (quickwit-search/src/lib.rs:136-155) and
``TagFilterAst`` evaluation (tag_pruning.rs:28-51,91-116): before any
data is scanned, the split list is filtered by

- time-range overlap of the request window with each split's
  ``time_range`` (half-open ``[start, end)``, like
  quickwit-search/src/filters.rs:28-84), and
- a tag predicate derived from the query AST: a term on a tag field
  can only match inside splits whose tag set contains that value;
  negations and non-tag clauses are *uninformative* (never prune) —
  mirroring the conservative simplification of tag_pruning.rs.

The surviving split ids become partition predicates on the postings /
fastfields tables (Spark partition pruning does the rest).
"""

from __future__ import annotations

from quickwit_spark.plans.config import IndexConfig
from quickwit_spark.plans.metastore import SplitMetadata
from quickwit_spark.plans.parser import Bool, MatchNone, PhraseQ, TermQ


def time_range_overlaps(
    split_range: tuple[int, int] | None,
    start_micros: int | None,
    end_micros: int | None,
) -> bool:
    """Does the split's [min,max] intersect the half-open request
    window [start, end)?"""
    if split_range is None:
        return True
    lo, hi = split_range
    if start_micros is not None and hi < start_micros:
        return False
    if end_micros is not None and lo >= end_micros:
        return False
    return True


def split_fully_inside(
    split_range: tuple[int, int] | None,
    start_micros: int | None,
    end_micros: int | None,
) -> bool:
    """If [min,max] ⊆ [start,end) the per-doc timestamp filter can be
    skipped for the whole split (filters.rs:56-66 segment skip)."""
    if split_range is None:
        return start_micros is None and end_micros is None
    lo, hi = split_range
    if start_micros is not None and lo < start_micros:
        return False
    if end_micros is not None and hi >= end_micros:
        return False
    return True


def _tag_predicate(node, config: IndexConfig, tags: dict[str, list[str]]) -> bool:
    """Conservative: True unless the query PROVES the split can't
    match."""
    if isinstance(node, TermQ):
        if node.field in config.tag_fields and node.field in tags:
            return node.term in set(tags[node.field])
        return True
    if isinstance(node, PhraseQ):
        return True
    if isinstance(node, MatchNone):
        return True  # handled by evaluator; don't prune whole split sets
    if isinstance(node, Bool):
        ok = True
        for c in node.must:
            ok = ok and _tag_predicate(c, config, tags)
        if node.should:
            ok = ok and any(_tag_predicate(c, config, tags) for c in node.should)
        # must_not is uninformative for pruning
        return ok
    return True


def prune_splits(
    splits: list[SplitMetadata],
    config: IndexConfig,
    query_ast=None,
    start_micros: int | None = None,
    end_micros: int | None = None,
) -> list[SplitMetadata]:
    out = []
    for s in splits:
        if s.num_docs == 0:
            continue
        if not time_range_overlaps(s.time_range, start_micros, end_micros):
            continue
        if query_ast is not None and not _tag_predicate(query_ast, config, s.tags):
            continue
        out.append(s)
    return out
