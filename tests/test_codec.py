import numpy as np
import pytest

from quickwit_spark.operators.codec import (
    decode_blocks,
    decode_posting_list,
    decode_positions,
    decode_skip,
    encode_posting_list,
    varbyte_decode,
    varbyte_encode,
)


def test_varbyte_roundtrip_edges():
    for vals in ([], [0], [127], [128], [2**32], [2**56 + 5], list(range(1000))):
        arr = np.array(vals, dtype=np.uint64)
        assert (varbyte_decode(varbyte_encode(arr), len(vals)) == arr).all()


def test_posting_roundtrip_random():
    rng = np.random.default_rng(7)
    for _ in range(25):
        n = int(rng.integers(1, 900))
        docs = np.sort(rng.choice(10**7, size=n, replace=False)).astype(np.uint64)
        tfs = rng.integers(1, 60, size=n).astype(np.uint64)
        enc = encode_posting_list(docs, tfs)
        d, t = decode_posting_list(enc["doc_bytes"], enc["tf_bytes"], n)
        assert (d == docs).all() and (t == tfs).all()


def test_skip_table_contents():
    docs = np.arange(0, 300, dtype=np.uint64) * 3
    tfs = (np.arange(300, dtype=np.uint64) % 9) + 1
    enc = encode_posting_list(docs, tfs)
    skip = decode_skip(enc["skip_bytes"])
    assert skip.shape == (3, 5)
    assert skip[0, 0] == docs[127] and skip[1, 0] == docs[255] and skip[2, 0] == docs[-1]
    assert skip[0, 4] == 128 and skip[2, 4] == 300 - 256
    assert skip[0, 1] == tfs[:128].max()


def test_selective_block_decode():
    docs = np.sort(np.random.default_rng(1).choice(10**6, 1000, replace=False)).astype(np.uint64)
    tfs = np.ones(1000, dtype=np.uint64)
    enc = encode_posting_list(docs, tfs)
    skip = decode_skip(enc["skip_bytes"])
    mask = np.zeros(skip.shape[0], dtype=bool)
    mask[3] = True
    d, _ = decode_blocks(enc["doc_bytes"], enc["tf_bytes"], skip, mask)
    assert (d == docs[3 * 128 : 4 * 128]).all()


def test_positions_roundtrip():
    rng = np.random.default_rng(3)
    docs = np.arange(50, dtype=np.uint64)
    tfs = rng.integers(1, 8, size=50).astype(np.uint64)
    pos = [np.sort(rng.choice(200, size=int(t), replace=False)).astype(np.uint64) for t in tfs]
    enc = encode_posting_list(docs, tfs, pos)
    back = decode_positions(enc["pos_bytes"], tfs)
    for a, b in zip(pos, back):
        assert (a == b).all()


def test_decode_count_mismatch_raises():
    with pytest.raises(ValueError):
        varbyte_decode(b"\x01\x02", 5)


def test_positions_selected_matches_full():
    from quickwit_spark.operators.codec import decode_positions_selected

    rng = np.random.default_rng(9)
    n = 300
    docs = np.arange(n, dtype=np.uint64)
    tfs = rng.integers(1, 9, size=n).astype(np.uint64)
    pos = [
        np.sort(rng.choice(5000, size=int(t), replace=False)).astype(np.uint64)
        for t in tfs
    ]
    enc = encode_posting_list(docs, tfs, pos)
    idx = np.sort(rng.choice(n, size=40, replace=False)).astype(np.int64)
    flat, lens = decode_positions_selected(enc["pos_bytes"], tfs, idx)
    assert (lens == tfs[idx].astype(np.int64)).all()
    off = 0
    for i, ln in zip(idx, lens):
        assert (flat[off : off + ln] == pos[i].astype(np.int64)).all()
        off += ln


def test_positions_selected_empty_selection():
    from quickwit_spark.operators.codec import decode_positions_selected

    docs = np.arange(5, dtype=np.uint64)
    tfs = np.ones(5, dtype=np.uint64)
    pos = [np.array([i], dtype=np.uint64) for i in range(5)]
    enc = encode_posting_list(docs, tfs, pos)
    flat, lens = decode_positions_selected(
        enc["pos_bytes"], tfs, np.empty(0, dtype=np.int64)
    )
    assert flat.size == 0 and lens.size == 0
