"""Property-based codec tests (hypothesis) — the reference fuzzes its
posting codecs with proptest (SURVEY.md §5); same idea here: any
sorted doc set with any tf/position shape must roundtrip exactly, and
every partial-decode path must agree with the full decode."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from quickwit_spark.operators.codec import (
    BLOCK_SIZE,
    decode_blocks,
    decode_posting_list,
    decode_positions,
    decode_positions_selected,
    decode_skip,
    encode_posting_list,
    varbyte_decode,
    varbyte_encode,
)


@st.composite
def posting_lists(draw, max_docs=700, with_positions=False):
    n = draw(st.integers(min_value=1, max_value=max_docs))
    universe = draw(st.integers(min_value=max_docs, max_value=1 << 30))
    rng = np.random.default_rng(draw(st.integers(0, 2**32 - 1)))
    docs = np.sort(rng.choice(universe, size=n, replace=False)).astype(np.uint64)
    tfs = rng.integers(1, draw(st.integers(2, 40)), size=n).astype(np.uint64)
    pos = None
    if with_positions:
        pos = [
            np.sort(
                rng.choice(1 << 20, size=int(t), replace=False)
            ).astype(np.uint64)
            for t in tfs
        ]
    return docs, tfs, pos


@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300)
)
@settings(max_examples=60, deadline=None)
def test_varbyte_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert (varbyte_decode(varbyte_encode(arr), arr.size) == arr).all()


@given(posting_lists())
@settings(max_examples=40, deadline=None)
def test_posting_list_roundtrip(pl):
    docs, tfs, _ = pl
    enc = encode_posting_list(docs, tfs)
    d, t = decode_posting_list(enc["doc_bytes"], enc["tf_bytes"], docs.size)
    assert (d == docs).all() and (t == tfs).all()


@given(posting_lists(), st.data())
@settings(max_examples=40, deadline=None)
def test_any_block_subset_decodes_consistently(pl, data):
    docs, tfs, _ = pl
    enc = encode_posting_list(docs, tfs)
    skip = decode_skip(enc["skip_bytes"])
    n_blocks = skip.shape[0]
    assert n_blocks == -(-docs.size // BLOCK_SIZE)
    mask = np.array(
        data.draw(
            st.lists(
                st.booleans(), min_size=n_blocks, max_size=n_blocks
            )
        )
    )
    d, t = decode_blocks(enc["doc_bytes"], enc["tf_bytes"], skip, mask)
    want_idx = np.concatenate(
        [
            np.arange(b * BLOCK_SIZE, min((b + 1) * BLOCK_SIZE, docs.size))
            for b in np.flatnonzero(mask)
        ]
    ) if mask.any() else np.empty(0, dtype=np.int64)
    assert (d == docs[want_idx]).all() and (t == tfs[want_idx]).all()


@given(posting_lists(max_docs=200, with_positions=True), st.data())
@settings(max_examples=25, deadline=None)
def test_selected_positions_agree_with_full(pl, data):
    docs, tfs, pos = pl
    enc = encode_posting_list(docs, tfs, pos)
    full = decode_positions(enc["pos_bytes"], tfs)
    n_sel = data.draw(st.integers(0, docs.size))
    rng = np.random.default_rng(data.draw(st.integers(0, 2**32 - 1)))
    idx = np.sort(rng.choice(docs.size, size=n_sel, replace=False)).astype(
        np.int64
    )
    flat, lens = decode_positions_selected(enc["pos_bytes"], tfs, idx)
    assert (lens == tfs[idx].astype(np.int64)).all()
    off = 0
    for i, ln in zip(idx, lens):
        assert (flat[off : off + ln] == full[i].astype(np.int64)).all()
        off += ln


@given(posting_lists())
@settings(max_examples=40, deadline=None)
def test_skip_table_invariants(pl):
    docs, tfs, _ = pl
    enc = encode_posting_list(docs, tfs)
    skip = decode_skip(enc["skip_bytes"])
    # last_doc per block is the true block max; counts sum to n;
    # max_tf bounds every tf in the block
    assert int(skip[:, 4].sum()) == docs.size
    for b in range(skip.shape[0]):
        lo, hi = b * BLOCK_SIZE, min((b + 1) * BLOCK_SIZE, docs.size)
        assert skip[b, 0] == docs[hi - 1]
        assert skip[b, 1] == tfs[lo:hi].max()


@given(st.data())
@settings(max_examples=20, deadline=None)
def test_wand_topk_equals_full_eval_property(data):
    """Any OR of random posting lists: WAND top-k must bit-match the
    full evaluation's top-k (docs, float32 scores, tie-breaks)."""
    from quickwit_spark.operators.eval import (
        SplitContext,
        eval_node,
        evaluate_split,
    )
    from quickwit_spark.plans.parser import Bool, TermQ

    rng = np.random.default_rng(data.draw(st.integers(0, 2**32 - 1)))
    num_docs = data.draw(st.integers(500, 5000))
    n_terms = data.draw(st.integers(2, 4))
    postings = {}
    terms = []
    for i in range(n_terms):
        df = data.draw(st.integers(1, num_docs))
        docs = np.sort(rng.choice(num_docs, size=df, replace=False)).astype(
            np.uint64
        )
        tfs = rng.integers(1, 30, size=df).astype(np.uint64)
        enc = encode_posting_list(docs, tfs)
        postings[("text", f"t{i}")] = {
            "doc_freq": df,
            "total_tf": int(tfs.sum()),
            "doc_bytes": enc["doc_bytes"],
            "tf_bytes": enc["tf_bytes"],
            "skip_bytes": enc["skip_bytes"],
            "pos_bytes": None,
        }
        terms.append(TermQ("text", f"t{i}"))
    norms = rng.integers(0, 256, size=num_docs).astype(np.uint8)
    ctx = SplitContext(
        num_docs=num_docs,
        total_tokens={"text": int(num_docs * rng.integers(5, 200))},
        postings=postings,
        norms={"text": norms},
    )
    ast = Bool(should=tuple(terms))
    k = data.draw(st.integers(1, 25))
    fd, fs = eval_node(ctx, ast)
    order = np.lexsort((fd, -fs.astype(np.float64)))[:k]
    gd, gs, _ = evaluate_split(ctx, ast, k, count_exact=False)
    assert (gd == fd[order]).all()
    assert (gs == fs[order].astype(np.float64)).all()
