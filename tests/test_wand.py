"""Multi-term block-max WAND: bit-identical top-k vs full evaluation
while decoding strictly fewer blocks on a Zipf-ish corpus."""

from __future__ import annotations

import numpy as np
import pytest

from quickwit_spark.operators.codec import encode_posting_list
from quickwit_spark.operators.eval import (
    DECODE_COUNTERS,
    SplitContext,
    eval_node,
    evaluate_split,
    reset_decode_counters,
)
from quickwit_spark.plans.parser import Bool, TermQ

NUM_DOCS = 60_000


def _posting(seed: int, df: int, hot_tail: bool = False, doc_hi: int = NUM_DOCS):
    """One synthetic posting list over doc ids < ``doc_hi``;
    ``hot_tail`` plants the highest tfs (→ highest scores) in a few
    blocks so pruning has something to skip."""
    rng = np.random.default_rng(seed)
    docs = np.sort(rng.choice(doc_hi, size=df, replace=False)).astype(np.uint64)
    tfs = rng.integers(1, 4, size=df).astype(np.uint64)
    if hot_tail:
        hot = rng.choice(df, size=max(4, df // 200), replace=False)
        tfs[hot] = rng.integers(20, 40, size=hot.size)
    enc = encode_posting_list(docs, tfs)
    return {
        "doc_freq": df,
        "total_tf": int(tfs.sum()),
        "doc_bytes": enc["doc_bytes"],
        "tf_bytes": enc["tf_bytes"],
        "skip_bytes": enc["skip_bytes"],
        "pos_bytes": None,
    }


@pytest.fixture(scope="module")
def ctx():
    rng = np.random.default_rng(7)
    norms = rng.integers(100, 140, size=NUM_DOCS).astype(np.uint8)
    postings = {
        ("text", "hot"): _posting(1, 30_000, hot_tail=True),  # Zipf head
        ("text", "warm"): _posting(2, 6_000, hot_tail=True),
        # rare term clustered in a narrow doc range (e.g. old docs of
        # a time-sorted index) — a LIGHT term in the WAND hybrid
        ("text", "rare"): _posting(3, 400, doc_hi=3_000),
    }
    return SplitContext(
        num_docs=NUM_DOCS,
        total_tokens={"text": 3_000_000},
        postings=postings,
        norms={"text": norms},
    )


@pytest.mark.parametrize(
    "terms", [("hot", "warm"), ("hot", "rare"), ("hot", "warm", "rare")]
)
def test_or_wand_matches_full_eval(ctx, terms):
    ast = Bool(should=tuple(TermQ("text", t) for t in terms))
    k = 10
    full_docs, full_scores = eval_node(ctx, ast)
    order = np.lexsort((full_docs, -full_scores.astype(np.float64)))[:k]
    want_docs = full_docs[order]
    want_scores = full_scores[order].astype(np.float64)

    reset_decode_counters()
    got_docs, got_scores, num_hits = evaluate_split(
        ctx, ast, k, count_exact=False
    )
    assert (got_docs == want_docs).all()
    assert (got_scores == want_scores).all()  # bit-identical float32 sums
    assert num_hits == -1  # count not computed under WAND
    assert DECODE_COUNTERS["blocks_decoded"] < DECODE_COUNTERS["blocks_total"], (
        DECODE_COUNTERS
    )


def test_or_wand_prunes_most_blocks(ctx):
    """A clustered rare term OR a huge term: the rare term's actual
    docs bound the intervals, so most of the huge term's blocks are
    never decoded (the sparse-term case naive block-range bounds
    can't prune)."""
    ast = Bool(should=(TermQ("text", "hot"), TermQ("text", "rare")))
    reset_decode_counters()
    evaluate_split(ctx, ast, 10, count_exact=False)
    frac = DECODE_COUNTERS["blocks_decoded"] / DECODE_COUNTERS["blocks_total"]
    assert frac < 0.5, DECODE_COUNTERS


def test_count_exact_disables_wand(ctx):
    """count_exact=True must take the full path and report the exact
    union size."""
    ast = Bool(should=(TermQ("text", "hot"), TermQ("text", "rare")))
    docs, scores = eval_node(ctx, ast)
    _, _, num_hits = evaluate_split(ctx, ast, 10, count_exact=True)
    assert num_hits == docs.size


def test_single_term_topk_matches_full_eval(ctx):
    """Single-term block-max path: bit-identical to full decode on a
    hot-tail (prunable) list, while decoding < 50% of blocks and
    never one block per lexsort round (tantivy per-block skip,
    SURVEY.md §2.6)."""
    node = TermQ("text", "hot")
    k = 10
    full_docs, full_scores = eval_node(ctx, node)
    order = np.lexsort((full_docs, -full_scores.astype(np.float64)))[:k]

    reset_decode_counters()
    got_docs, got_scores, num_hits = evaluate_split(ctx, node, k, count_exact=False)
    assert (got_docs == full_docs[order]).all()
    assert (got_scores == full_scores[order].astype(np.float64)).all()
    assert num_hits == ctx.postings[("text", "hot")]["doc_freq"]
    frac = DECODE_COUNTERS["blocks_decoded"] / DECODE_COUNTERS["blocks_total"]
    assert frac < 0.5, DECODE_COUNTERS


def test_single_term_flat_list_bails_to_full_decode():
    """Uniform tf + uniform norms → the ub spread is zero and the
    bound cannot prune: the evaluator must take the one-pass full
    decode, not a per-chunk threshold loop (r2 q_term regression)."""
    df = 50_000
    docs = np.arange(df, dtype=np.uint64) * 2
    tfs = np.ones(df, dtype=np.uint64)
    enc = encode_posting_list(docs, tfs)
    row = {
        "doc_freq": df,
        "total_tf": df,
        "doc_bytes": enc["doc_bytes"],
        "tf_bytes": enc["tf_bytes"],
        "skip_bytes": enc["skip_bytes"],
        "pos_bytes": None,
    }
    ctx = SplitContext(
        num_docs=2 * df,
        total_tokens={"text": 10 * df},
        postings={("text", "flat"): row},
        norms={"text": np.full(2 * df, 100, dtype=np.uint8)},
    )
    node = TermQ("text", "flat")
    full_docs, full_scores = eval_node(ctx, node)
    order = np.lexsort((full_docs, -full_scores.astype(np.float64)))[:10]

    import time

    reset_decode_counters()
    t0 = time.perf_counter()
    got_docs, got_scores, num_hits = evaluate_split(ctx, node, 10, count_exact=False)
    elapsed = time.perf_counter() - t0
    assert (got_docs == full_docs[order]).all()
    assert (got_scores == full_scores[order].astype(np.float64)).all()
    assert num_hits == df
    # the one-pass path reports every block decoded exactly once
    assert DECODE_COUNTERS["blocks_decoded"] == DECODE_COUNTERS["blocks_total"]
    assert elapsed < 0.15, f"flat-list single-term eval took {elapsed:.3f}s"
