"""Golden parity with the reference merge-policy test suite
(quickwit-indexing/src/merge_policy.rs:553-1010): same fixtures, same
policy knobs, same expected level ranges / operations / maturity
verdicts / split-count envelopes. Pure driver-side math — no Spark.
"""

from __future__ import annotations

import pytest

from quickwit_spark.plans.merge_policy import MergePolicy
from quickwit_spark.plans.metastore import SplitMetadata

TS = (1_630_563_067, 1_630_564_067)


def create_splits(num_docs_vec, time_ranges=None):
    """merge_policy.rs:560-583 — same timestamp everywhere, stable
    order carried by the sort."""
    return [
        SplitMetadata(
            split_id=f"split_{i:02d}",
            num_docs=nd,
            time_range=TS if time_ranges is None else time_ranges[i],
        )
        for i, nd in enumerate(num_docs_vec)
    ]


def create_splits_with_tags(num_docs_vec, demux_field, tag_counts):
    """merge_policy.rs:585-604 — zip truncates, tags dict mirrors the
    reference's `field!` marker + `field:v` entries (count 0 → no
    marker at all); no time ranges."""
    return [
        SplitMetadata(
            split_id=f"split_{i:02d}",
            num_docs=nd,
            tags={demux_field: [str(v) for v in range(count)]} if count else {},
        )
        for i, (nd, count) in enumerate(zip(num_docs_vec, tag_counts))
    ]


def op_ids(op):
    return sorted(s.split_id for s in op)


# ------------------------------------------------------------- maturity
def test_split_is_mature_with_no_demux_field():
    # merge_policy.rs:606-629
    policy = MergePolicy()
    split = create_splits([9_000_000])[0]
    assert not policy.is_mature(split)
    # all splits mature when merge is disabled
    assert MergePolicy(merge_enabled=False).is_mature(split)
    # demuxed once → mature even under the doc target
    demuxed = SplitMetadata(
        split_id="d", num_docs=9_000_000, time_range=TS,
        lineage={"demux_ops": 1},
    )
    assert policy.is_mature(demuxed)
    # over the doc target → mature, demuxed or not
    big = SplitMetadata(split_id="b", num_docs=10_000_001, time_range=TS)
    assert policy.is_mature(big)
    big_demuxed = SplitMetadata(
        split_id="bd", num_docs=10_000_001, time_range=TS,
        lineage={"demux_ops": 1},
    )
    assert policy.is_mature(big_demuxed)


def test_split_is_mature_with_demux_field():
    # merge_policy.rs:631-710
    policy = MergePolicy(demux_enabled=True, demux_field_name="demux_field")
    # immature: under target, ≥2 demux values
    s = SplitMetadata(
        split_id="s", num_docs=9_000_000, time_range=TS,
        tags={"demux_field": ["1", "2"]},
    )
    assert not policy.is_mature(s)
    # over target with ≥2 demux values: still a demux candidate
    s2 = SplitMetadata(
        split_id="s2", num_docs=10_000_001, time_range=TS,
        tags={"demux_field": ["1", "2"]},
    )
    assert not policy.is_mature(s2)
    # mature: only one demux value
    one_val = SplitMetadata(
        split_id="o", num_docs=10_000_001, time_range=TS,
        tags={"demux_field": ["1"]},
    )
    assert policy.is_mature(one_val)
    # mature: ≥ demux_factor × target docs
    huge = SplitMetadata(
        split_id="h", num_docs=policy.demux_factor * policy.split_num_docs_target,
        time_range=TS, tags={"demux_field": ["1", "2"]},
    )
    assert policy.is_mature(huge)
    # mature: already demuxed (small split, demux_ops = 1)
    done = SplitMetadata(
        split_id="dd", num_docs=100, time_range=TS,
        tags={"demux_field": ["1", "2"]}, lineage={"demux_ops": 1},
    )
    assert policy.is_mature(done)
    # wrong-field tags over target: the reference fixture keeps the
    # `demux_field!` presence marker but only other_field values
    # (rs:679-689) — dict form: demux_field present with NO values
    wrong = SplitMetadata(
        split_id="w", num_docs=10_000_001, time_range=TS,
        tags={"demux_field": [], "other_field": ["1", "2"]},
    )
    assert policy.is_mature(wrong)
    # demux disabled on the policy → mature regardless of tags
    disabled = MergePolicy(demux_enabled=False, demux_field_name="demux_field")
    assert disabled.is_mature(s2)


# ------------------------------------------------------------- levels
def test_build_split_levels_empty():
    # merge_policy.rs:712-718
    assert MergePolicy().build_split_levels([]) == []


def test_build_split_levels_simple():
    # merge_policy.rs:720-726
    splits = create_splits([100_000, 100_000, 100_000, 800_000, 900_000])
    assert MergePolicy().build_split_levels(splits) == [range(0, 3), range(3, 5)]


def test_build_split_levels_perfect_world():
    # merge_policy.rs:728-737
    splits = create_splits(
        [100_000] * 8 + [800_000, 1_600_000]
    )
    assert MergePolicy().build_split_levels(splits) == [range(0, 8), range(8, 10)]


def test_build_split_levels_decreasing():
    # merge_policy.rs:739-748
    splits = create_splits(
        [100_000] * 8 + [800_000, 100_000, 1_600_000]
    )
    assert MergePolicy().build_split_levels(splits) == [range(0, 8), range(8, 11)]


def test_build_split_levels_rejects_over_target():
    # merge_policy.rs:750-756 (#[should_panic])
    with pytest.raises(ValueError, match="smaller than"):
        MergePolicy().build_split_levels(create_splits([11_000_000]))


# ---------------------------------------------------------- operations
def test_not_enough_splits():
    # merge_policy.rs:758-764
    ops, remaining = MergePolicy().merge_operations(create_splits([100] * 7))
    assert ops == [] and len(remaining) == 7


def test_just_enough_splits_for_a_merge():
    # merge_policy.rs:766-788
    ops, remaining = MergePolicy().merge_operations(create_splits([100] * 10))
    assert remaining == []
    assert len(ops) == 1
    assert op_ids(ops[0]) == [f"split_{i:02d}" for i in range(10)]


def test_many_splits_on_same_level():
    # merge_policy.rs:790-813 — candidate from the END: split_00 (the
    # most recent in the stable order) survives
    ops, remaining = MergePolicy().merge_operations(create_splits([100] * 13))
    assert [s.split_id for s in remaining] == ["split_00"]
    assert len(ops) == 1
    assert op_ids(ops[0]) == [f"split_{i:02d}" for i in range(1, 13)]


def test_splits_below_min_level():
    # merge_policy.rs:815-839 — everything under min_level_num_docs
    # shares level 0
    ops, remaining = MergePolicy().merge_operations(
        create_splits(
            [100, 1000, 10_000, 10_000, 10_000, 10_000, 10_000,
             40_000, 40_000, 40_000]
        )
    )
    assert remaining == []
    assert len(ops) == 1
    assert op_ids(ops[0]) == [f"split_{i:02d}" for i in range(10)]


def test_splits_above_min_level():
    # merge_policy.rs:841-850 — 7 × 1M in one level < merge_factor →
    # nothing to do
    ops, remaining = MergePolicy().merge_operations(
        create_splits([100_000] + [1_000_000] * 7)
    )
    assert ops == [] and len(remaining) == 8


def test_above_max_merge_docs_is_ignored():
    # merge_policy.rs:852-864
    ops, remaining = MergePolicy().merge_operations(
        create_splits(
            [100_000] * 5 + [10_000_000] + [100_000] * 5
        )
    )
    assert len(remaining) == 1 and remaining[0].num_docs == 10_000_000
    assert len(ops) == 1


def test_splits_too_large_are_ignored():
    # merge_policy.rs:866-875
    ops, remaining = MergePolicy().merge_operations(
        create_splits([9_999_999, 10_000_000])
    )
    assert ops == []
    assert sorted(s.num_docs for s in remaining) == [9_999_999, 10_000_000]


def test_entire_level_reaches_merge_max_doc():
    # merge_policy.rs:877-886 — over-target candidate ACCEPTED
    ops, remaining = MergePolicy().merge_operations(
        create_splits([5_000_000, 5_000_000])
    )
    assert remaining == []
    assert len(ops) == 1 and len(ops[0]) == 2


def test_last_merge_can_have_a_lower_merge_factor():
    # merge_policy.rs:888-898
    ops, remaining = MergePolicy().merge_operations(
        create_splits([9_999_997, 9_999_998, 9_999_999])
    )
    assert len(remaining) == 1 and remaining[0].num_docs == 9_999_997
    assert len(ops) == 1 and len(ops[0]) == 2


def test_no_merge_with_only_one_split():
    # merge_policy.rs:900-908
    ops, remaining = MergePolicy().merge_operations(create_splits([9_999_999]))
    assert ops == [] and len(remaining) == 1


# ----------------------------------------------------- envelope math
def test_max_num_splits_worst_case():
    # merge_policy.rs:910-924
    policy = MergePolicy()
    expected = {
        99: 9, 1_000_000: 27, 2_000_000: 36, 3_000_000: 36,
        4_000_000: 36, 5_000_000: 45, 7_000_000: 45, 10_000_000: 45,
        20_000_000: 54, 100_000_000: 63, 1_000_000_000: 153,
    }
    for docs, want in expected.items():
        assert policy.max_num_splits_worst_case(docs) == want, docs


def test_max_num_splits_ideal_case():
    # merge_policy.rs:926-939
    policy = MergePolicy()
    expected = {
        99: 9, 1_000_000: 18, 2_000_000: 20, 3_000_000: 21,
        4_000_000: 22, 5_000_000: 23, 7_000_000: 25, 10_000_000: 27,
        100_000_000: 37, 1_000_000_000: 127,
    }
    for docs, want in expected.items():
        assert policy.max_num_splits_ideal_case(docs) == want, docs


# ------------------------------------------------------------- demux
def test_demux_one_operation_and_filter_out_irrelevant_splits():
    # merge_policy.rs:941-970 (zip truncates the 10th size — 9 tagged
    # splits — plus one split tagged on another field)
    policy = MergePolicy(
        demux_enabled=True, demux_field_name="demux_field_name",
        demux_factor=6, min_level_num_docs=100_000, merge_enabled=True,
        merge_factor=10, max_merge_factor=12,
        split_num_docs_target=10_000_000,
    )
    candidates = create_splits_with_tags(
        [10_000_000, 10_000_000, 12_000_000, 14_000_000, 10_000_000,
         10_000_001, 10_000_002, 10_000_004, 10_000_005, 60_000_000],
        "demux_field_name",
        [0, 1, 2, 3, 3, 4, 5, 6, 10],
    )
    candidates += create_splits_with_tags(
        [10_000_000], "other_demux_field_name", [5]
    )
    ops, remaining = policy.demux_operations(candidates)
    assert len(remaining) == 4
    assert len(ops) == 1 and len(ops[0]) == 6


def test_demux_one_operation_with_1_normal_and_1_huge_split():
    # merge_policy.rs:972-991
    policy = MergePolicy(demux_enabled=True, demux_field_name="f")
    candidates = create_splits_with_tags(
        [50_000_000, 10_000_000, 12_000_000], "f", [2, 2, 2]
    )
    ops, remaining = policy.demux_operations(candidates)
    assert [s.split_id for s in remaining] == ["split_02"]
    assert len(ops) == 1 and len(ops[0]) == 2


def test_ignore_demux_operation_with_1_huge_split():
    # merge_policy.rs:993-1010 — demux_enabled defaults to False there,
    # and the split is ≥ demux_factor × target anyway
    policy = MergePolicy(demux_field_name="f")
    ops, remaining = policy.demux_operations(
        create_splits_with_tags([60_000_000], "f", [2])
    )
    assert ops == [] and len(remaining) == 1
