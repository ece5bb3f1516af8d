"""Merge planning: stable log-scale level policy + GC.

Driver-side re-expression of the reference's
StableMultitenantWithTimestampMergePolicy
(quickwit-indexing/src/merge_policy.rs:108-176,290-330) and
GarbageCollector (actors/garbage_collector.rs:36-43):

- a split is MATURE for merge (never merged again) once it holds
  ``split_num_docs_target`` docs or has been demuxed
  (merge_policy.rs:241-250); demux maturity follows rs:263-288;
- young splits sort most-recent-first (reverse end-time, stable) and
  group into ADAPTIVE levels: each level spans up to 3× its anchor
  split's size, floored at ``min_level_num_docs`` (rs:416-443);
- per level, ONE candidate grows from the oldest end until one more
  split would exceed ``max_merge_factor`` inputs or the doc target;
  over-target candidates are accepted — the merge yields a mature
  split (rs:446-494); batch callers iterate to fixpoint;
- demux planning bins never-demuxed splits of ≥ target docs, oldest
  first, into batches of ≥ demux_factor × target docs (rs:360-407);
- GC deletes Staged splits older than 24h and MarkedForDeletion
  splits older than 2min (grace periods of garbage_collector.rs).
"""

from __future__ import annotations

import os
import shutil
import time
from dataclasses import dataclass

from quickwit_spark.plans.config import IndexConfig
from quickwit_spark.plans.metastore import (
    MARKED_FOR_DELETION,
    STAGED,
    SplitMetadata,
    open_metastore,
)

GC_STAGED_GRACE_SECS = 24 * 3600
GC_DELETION_GRACE_SECS = 120


def _demux_ops(split: SplitMetadata) -> int:
    """How many demux operations produced this split (the demux
    executor records the counter in lineage, demux.py:208)."""
    return int((split.lineage or {}).get("demux_ops", 0))


# merge-candidate verdicts (MergeCandidateSize, merge_policy.rs:225-237)
_TOO_SMALL, _VALID, _TOO_BIG = 0, 1, 2


@dataclass(frozen=True)
class MergePolicy:
    """Exact port of the reference's
    StableMultitenantWithTimestampMergePolicy
    (quickwit-indexing/src/merge_policy.rs:139-546), algorithm and
    defaults: adaptive split levels anchored at 3× the first split's
    size, merge candidates taken from the OLDEST end of each level,
    over-target candidates accepted (they produce a mature split),
    demux-aware maturity, and demux bin building. Golden parity with
    the reference's own test suite lives in
    tests/test_merge_policy_parity.py."""

    min_level_num_docs: int = 100_000
    merge_enabled: bool = True
    merge_factor: int = 10
    max_merge_factor: int = 12
    split_num_docs_target: int = 10_000_000
    demux_enabled: bool = False
    demux_field_name: str | None = None
    demux_factor: int = 6

    @classmethod
    def from_config(cls, config: IndexConfig, **overrides) -> "MergePolicy":
        base = dict(
            min_level_num_docs=config.min_level_num_docs,
            merge_factor=config.merge_factor,
            max_merge_factor=config.max_merge_factor,
            split_num_docs_target=config.split_num_docs_target,
        )
        base.update(overrides)
        return cls(**base)

    # -------------------------------------------------- maturity
    def is_mature_for_merge(self, split: SplitMetadata) -> bool:
        """merge_policy.rs:241-250: disabled merge → everything is
        mature; demuxed splits are never merged again."""
        if not self.merge_enabled:
            return True
        return (
            split.num_docs >= self.split_num_docs_target
            or _demux_ops(split) > 0
        )

    def is_mature_for_demux(self, split: SplitMetadata) -> bool:
        """merge_policy.rs:263-288. Tag semantics: the reference's
        BTreeSet holds `field!` (presence marker, recorded only when
        the field's value cardinality fit the tag limit) plus
        `field:value` entries; our dict-of-lists equivalent is 'field
        key present → marker present, its list = the values'."""
        if not self.demux_enabled or self.demux_field_name is None:
            return True
        if split.num_docs >= self.demux_factor * self.split_num_docs_target:
            return True
        vals = (split.tags or {}).get(self.demux_field_name)
        if vals is not None and len(vals) < 2:
            return True
        return split.num_docs < self.split_num_docs_target or _demux_ops(split) > 0

    def is_mature(self, split: SplitMetadata) -> bool:
        return self.is_mature_for_merge(split) and self.is_mature_for_demux(split)

    # -------------------------------------------------- merge planning
    def build_split_levels(self, splits: list[SplitMetadata]) -> list[range]:
        """merge_policy.rs:416-443 — adaptive levels over a
        most-recent-first list assumed almost-sorted by size: a level
        closes when a split reaches the level's max (3× the level's
        anchor split, floored at min_level_num_docs)."""
        if any(s.num_docs >= self.split_num_docs_target for s in splits):
            raise ValueError(
                "All splits are expected to be smaller than `max_merge_docs`."
            )
        if not splits:
            return []
        levels: list[range] = []
        start = 0
        cur_max = max(splits[0].num_docs * 3, self.min_level_num_docs)
        for i, s in enumerate(splits):
            if s.num_docs >= cur_max:
                levels.append(range(start, i))
                start = i
                cur_max = 3 * s.num_docs
        levels.append(range(start, len(splits)))
        return levels

    def _merge_candidate_size(self, splits: list[SplitMetadata]) -> int:
        # merge_policy.rs:471-494
        if len(splits) <= 1:
            return _TOO_SMALL
        if len(splits) >= self.max_merge_factor:
            return _TOO_BIG
        if sum(s.num_docs for s in splits) >= self.split_num_docs_target:
            return _TOO_BIG
        if len(splits) < self.merge_factor:
            return _TOO_SMALL
        return _VALID

    def merge_candidate_from_level(
        self, splits: list[SplitMetadata], level: range
    ) -> range | None:
        """merge_policy.rs:446-467 — grow the candidate from the
        level's END (the oldest side of the recent-first order) until
        one more split would overshoot; over-target candidates are
        accepted (the merge yields a mature split)."""
        end = level.stop
        start = end
        for ord_ in reversed(range(level.start, level.stop)):
            if self._merge_candidate_size(splits[start:end]) == _TOO_BIG:
                break
            start = ord_
        if self._merge_candidate_size(splits[start:end]) == _TOO_SMALL:
            return None
        return range(start, end)

    def merge_operations(
        self, splits: list[SplitMetadata]
    ) -> tuple[list[list[SplitMetadata]], list[SplitMetadata]]:
        """One planning pass (merge_policy.rs:290-324): returns
        (operations, splits left untouched). The reference mutates the
        split vec and is re-invoked by its actor loop; callers wanting
        the fixpoint loop this (see plan_merges)."""
        if not self.merge_enabled or not splits:
            return [], list(splits)
        mature = [s for s in splits if self.is_mature_for_merge(s)]
        young = [s for s in splits if not self.is_mature_for_merge(s)]
        # stable sort, most recent first: ascending (has_time,
        # Reverse(end), num_docs) — None time ranges first, exactly the
        # Option<Reverse<_>> order of merge_policy.rs:300-306
        young.sort(
            key=lambda s: (
                (0, 0, int(s.num_docs))
                if s.time_range is None
                else (1, -int(s.time_range[1]), int(s.num_docs))
            )
        )
        ops: list[list[SplitMetadata]] = []
        taken: set[int] = set()
        for level in reversed(self.build_split_levels(young)):
            cand = self.merge_candidate_from_level(young, level)
            if cand is not None:
                ops.append(young[cand.start : cand.stop])
                taken.update(range(cand.start, cand.stop))
        remaining = [s for i, s in enumerate(young) if i not in taken] + mature
        return ops, remaining

    # -------------------------------------------------- demux planning
    def demux_operations(
        self, splits: list[SplitMetadata]
    ) -> tuple[list[list[SplitMetadata]], list[SplitMetadata]]:
        """merge_policy.rs:330-352: oldest splits demux first."""
        if not self.demux_enabled or self.demux_field_name is None or not splits:
            return [], list(splits)
        mature = [s for s in splits if self.is_mature_for_demux(s)]
        cands = [s for s in splits if not self.is_mature_for_demux(s)]
        cands.sort(
            key=lambda s: (
                (0, 0)
                if s.time_range is None
                else (1, int(s.time_range[1]))
            )
        )
        ops, left = self._build_first_demux_operation(cands)
        return ops, left + mature

    def _build_first_demux_operation(
        self, splits: list[SplitMetadata]
    ) -> tuple[list[list[SplitMetadata]], list[SplitMetadata]]:
        """merge_policy.rs:360-407: while ≥ demux_factor × target docs
        remain, take splits (≤ demux_factor of them) until the batch
        reaches that many docs."""
        if self.demux_factor <= 1:
            raise ValueError("Demux factor must be > 1")
        if any(_demux_ops(s) for s in splits):
            raise ValueError(
                "All splits are expected to have never been demuxed."
            )
        if any(
            s.num_docs >= self.split_num_docs_target * self.demux_factor
            for s in splits
        ):
            raise ValueError(
                "Each split size must satisfy "
                "`max_merge_docs <= size < demux_factor * max_merge_docs`"
            )
        threshold = self.demux_factor * self.split_num_docs_target
        total = sum(s.num_docs for s in splits)
        if not splits or total < threshold:
            return [], list(splits)
        ops: list[list[SplitMetadata]] = []
        work = list(splits)
        while work and total >= threshold:
            end_idx = 0
            acc = 0
            for i, s in enumerate(work[: self.demux_factor]):
                acc += s.num_docs
                if acc >= threshold:
                    end_idx = i
                    break
            if end_idx == 0:
                raise RuntimeError(
                    "impossible demux state: positive totals but no "
                    "batch reached the threshold"
                )
            ops.append(work[: end_idx + 1])
            work = work[end_idx + 1 :]
            total -= acc
        return ops, work

    # ------------------------------------- split-count envelope math
    def _case_levels(self, growth_factor: int) -> list[int]:
        # merge_policy.rs:496-509
        levels = [1]
        end = self.min_level_num_docs
        while end < self.split_num_docs_target:
            levels.append(end)
            end *= growth_factor
        levels.append(self.split_num_docs_target)
        return levels

    def max_num_splits_ideal_case(self, num_docs: int) -> int:
        """merge_policy.rs:511-514 — splits alive for a corpus of
        num_docs when ingestion arrives in perfect merge batches."""
        return self._max_num_splits(num_docs, self._case_levels(self.merge_factor), True)

    def max_num_splits_worst_case(self, num_docs: int) -> int:
        """merge_policy.rs:516-519 — adversarial arrival order."""
        return self._max_num_splits(num_docs, self._case_levels(3), False)

    def _max_num_splits(self, num_docs: int, levels: list[int], sorted_: bool) -> int:
        # merge_policy.rs:521-545
        if num_docs == 0:
            return 0
        head, tail = levels[0], levels[1:]
        if num_docs < head:
            return 0
        first_sat = (
            head * (self.merge_factor - 1)
            if sorted_
            else head + (self.merge_factor - 2)
        )
        if not tail or num_docs <= first_sat:
            return (num_docs + head - 1) // head
        return self.merge_factor - 1 + self._max_num_splits(
            num_docs - first_sat, tail, sorted_
        )


def is_mature(split: SplitMetadata, config: IndexConfig) -> bool:
    return MergePolicy.from_config(config).is_mature_for_merge(split)


def plan_merges(
    splits: list[SplitMetadata], config: IndexConfig
) -> list[list[str]]:
    """Merge operations to run NOW, each a list of split_ids — the
    reference policy iterated to fixpoint (its actor re-invokes
    merge_operations after every planning pass; batch callers want
    the closure)."""
    policy = MergePolicy.from_config(config)
    ops_ids: list[list[str]] = []
    remaining = list(splits)
    while True:
        ops, remaining = policy.merge_operations(remaining)
        if not ops:
            return ops_ids
        ops_ids.extend([s.split_id for s in op] for op in ops)


def plan_demux(
    splits: list[SplitMetadata],
    config: IndexConfig,
    field: str,
    demux_factor: int = 6,
) -> list[list[str]]:
    """Demux operations to run NOW (reference demux planning with
    demux enabled on ``field``), each a list of split_ids."""
    policy = MergePolicy.from_config(
        config,
        demux_enabled=True,
        demux_field_name=field,
        demux_factor=demux_factor,
    )
    ops, _ = policy.demux_operations(list(splits))
    return [[s.split_id for s in op] for op in ops]


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
