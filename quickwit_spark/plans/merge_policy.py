"""Merge planning: stable log-scale level policy + GC.

Driver-side re-expression of the reference's
StableMultitenantWithTimestampMergePolicy
(quickwit-indexing/src/merge_policy.rs:108-176,290-330) and
GarbageCollector (actors/garbage_collector.rs:36-43):

- a split is MATURE (never merged again) once it holds
  ``split_num_docs_target`` docs or has been through enough merge
  ops (merge_policy.rs:241-250);
- young splits are sorted by reverse end-time and bucketed into
  log-scale levels: level 0 = [0, 3·min_level_num_docs), each next
  level 3× wider (merge_policy.rs:108-137);
- a level with ≥ ``merge_factor`` splits yields one merge operation
  of at most ``max_merge_factor`` inputs (index_config.rs:99-110);
- GC deletes Staged splits older than 24h and MarkedForDeletion
  splits older than 2min (grace periods of garbage_collector.rs).
"""

from __future__ import annotations

import os
import shutil
import time

from quickwit_spark.plans.config import IndexConfig
from quickwit_spark.plans.metastore import (
    MARKED_FOR_DELETION,
    STAGED,
    SplitMetadata,
    open_metastore,
)

GC_STAGED_GRACE_SECS = 24 * 3600
GC_DELETION_GRACE_SECS = 120


def is_mature(split: SplitMetadata, config: IndexConfig) -> bool:
    return split.num_docs >= config.split_num_docs_target


def _level(num_docs: int, config: IndexConfig) -> int:
    """Log-scale level: 0 for < 3·min_level, then ×3 per level."""
    size = 3 * config.min_level_num_docs
    level = 0
    while num_docs >= size:
        size *= 3
        level += 1
    return level


def plan_merges(
    splits: list[SplitMetadata], config: IndexConfig
) -> list[list[str]]:
    """Return merge operations, each a list of split_ids to merge."""
    young = [s for s in splits if not is_mature(s, config)]
    # stable order: reverse end-time, then split id (merge_policy.rs
    # sorts by reverse time_range end for multitenant stability)
    young.sort(
        key=lambda s: (
            -(s.time_range[1] if s.time_range else 0),
            s.split_id,
        )
    )
    levels: dict[int, list[SplitMetadata]] = {}
    for s in young:
        levels.setdefault(_level(s.num_docs, config), []).append(s)
    ops: list[list[str]] = []
    for _, members in sorted(levels.items()):
        while len(members) >= config.merge_factor:
            take = members[: config.max_merge_factor]
            members = members[len(take):]
            ops.append([s.split_id for s in take])
    return ops


def run_merge_pipeline(spark, index_dir: str, max_ops: int | None = None) -> int:
    """Plan + execute merges until a fixpoint (or ``max_ops``)."""
    from quickwit_spark.operators.merge import merge_splits

    ms = open_metastore(index_dir)
    config = ms.config()
    done = 0
    while True:
        ops = plan_merges(ms.list_published(), config)
        if not ops:
            return done
        for op in ops:
            merge_splits(spark, index_dir, op)
            done += 1
            if max_ops is not None and done >= max_ops:
                return done


def garbage_collect(index_dir: str, now: float | None = None, grace: bool = True) -> list[str]:
    """Delete data of retired splits past their grace period."""
    ms = open_metastore(index_dir)
    now = now if now is not None else time.time()
    victims = []
    for s in ms.splits():
        age = now - (s.update_timestamp or 0)
        if s.state == MARKED_FOR_DELETION and (
            not grace or age > GC_DELETION_GRACE_SECS
        ):
            victims.append(s.split_id)
        elif s.state == STAGED and (not grace or age > GC_STAGED_GRACE_SECS):
            victims.append(s.split_id)
    for sid in victims:
        for sub in ("postings", "docmap", "fastfields"):
            path = os.path.join(index_dir, sub, f"split_id={sid}")
            if os.path.isdir(path):
                shutil.rmtree(path)
    if victims:
        ms.mark_for_deletion(victims)
        ms.delete_splits(victims)
    return victims
