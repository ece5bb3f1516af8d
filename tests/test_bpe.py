"""BPE trainer + encoder vs a naive reference implementation
(randomized corpora), plus the reconstruction/monotonicity
invariants every BPE must satisfy."""

from __future__ import annotations

import random
import re

from quickwit_spark.functions.bpe import (
    END,
    _merge_word,
    encode_bpe,
    train_bpe,
)

_TOK = re.compile(r"[a-z0-9]+")


def _naive_train(texts, num_merges, min_pair_count=2):
    vocab: dict = {}
    for t in texts:
        for w in _TOK.findall(t.lower()):
            k = tuple(w) + (END,)
            vocab[k] = vocab.get(k, 0) + 1
    merges = []
    for _ in range(num_merges):
        pairs: dict = {}
        for syms, c in vocab.items():
            for p in zip(syms, syms[1:]):
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        merges.append(best[0])
        vocab = {_merge_word(s, best[0]): c for s, c in vocab.items()}
    return merges


def _naive_encode(text, merges):
    ranks = {p: i for i, p in enumerate(merges)}
    out = []
    for w in _TOK.findall(text.lower()):
        syms = tuple(w) + (END,)
        while len(syms) > 1:
            present = [(ranks[p], p) for p in zip(syms, syms[1:]) if p in ranks]
            if not present:
                break
            _, pair = min(present)
            syms = _merge_word(syms, pair)
        out.extend(syms)
    return out


def _gen(seed):
    rng = random.Random(seed)
    stems = ["walk", "talk", "jump", "light", "night", "read"]
    suff = ["", "s", "ed", "ing", "er"]
    texts = []
    for _ in range(rng.randint(5, 15)):
        n = rng.randint(3, 25)
        texts.append(
            " ".join(
                rng.choice(stems) + rng.choice(suff) for _ in range(n)
            )
        )
    return texts


def test_train_matches_naive_model(spark):
    for seed in range(6):
        texts = _gen(seed)
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = train_bpe(df, num_merges=12)
        want = _naive_train(texts, 12)
        assert got == want, f"seed {seed}"


def test_encode_matches_naive_and_reconstructs(spark):
    texts = _gen(3)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = train_bpe(df, num_merges=15)
    assert merges
    rows = {r["doc_id"]: r for r in encode_bpe(df, merges).collect()}
    for i, t in enumerate(texts):
        want = _naive_encode(t, merges)
        assert rows[i]["pieces"] == want, i
        assert rows[i]["n_pieces"] == len(want)
        # pieces reconstruct the normalized words exactly
        rebuilt = "".join(rows[i]["pieces"]).replace(END, " ").strip()
        assert rebuilt == " ".join(_TOK.findall(t.lower()))
        assert rows[i]["n_words"] == len(_TOK.findall(t.lower()))


def test_more_merges_never_increase_pieces(spark):
    texts = _gen(5)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    m20 = train_bpe(df, num_merges=20)
    prev = None
    for k in (0, 5, 10, 20):
        total = (
            encode_bpe(df, m20[:k])
            .agg({"n_pieces": "sum"})
            .collect()[0][0]
        )
        if prev is not None:
            assert total <= prev
        prev = total
    # a frequent word eventually becomes one piece: force it
    dense = spark.createDataFrame(
        [(0, "zzyx " * 50)], "doc_id long, text string"
    )
    m = train_bpe(dense, num_merges=10, min_pair_count=2)
    enc = encode_bpe(dense, m).collect()[0]
    assert enc["pieces"][:1] == ["zzyx" + END]
