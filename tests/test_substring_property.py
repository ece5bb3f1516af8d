"""Randomized naive-model parity for the ExactSubstr span machinery:
duplicate_spans and remove_duplicate_spans vs a direct Python
implementation of the shingle→seed→island protocol, over seeded
corpora with planted shared runs."""

from __future__ import annotations

import random

from quickwit_spark.functions.substring_dedup import (
    duplicate_spans,
    remove_duplicate_spans,
)


def _toks(text):
    return [t for t in text.split() if t != ""]


def _naive_spans(rows, k, min_docs=2):
    grams: dict[str, set] = {}
    per_doc = {}
    for d, t in rows:
        ts = _toks(t)
        per_doc[d] = ts
        for i in range(len(ts) - k + 1):
            grams.setdefault(" ".join(ts[i:i + k]), set()).add(d)
    dup = {g for g, ds in grams.items() if len(ds) >= min_docs}
    spans = {}
    for d, ts in per_doc.items():
        hits = [
            i for i in range(len(ts) - k + 1)
            if " ".join(ts[i:i + k]) in dup
        ]
        out = []
        for p in hits:
            if out and p - out[-1][-1] <= k:
                out[-1].append(p)
            else:
                out.append([p])
        spans[d] = [(isl[0], isl[-1] + k) for isl in out]
    return spans


def _gen(seed):
    rng = random.Random(seed)
    shared = [
        [f"s{j}_{i}" for i in range(rng.randint(6, 14))] for j in range(3)
    ]
    rows = []
    for d in range(rng.randint(3, 8)):
        parts = []
        for _ in range(rng.randint(1, 4)):
            if rng.random() < 0.5:
                parts += rng.choice(shared)
            else:
                parts += [f"u{d}_{i}" for i in range(rng.randint(3, 10))]
        rows.append((d, " ".join(parts)))
    return rows


def test_duplicate_spans_match_naive(spark):
    k = 5
    for seed in range(8):
        rows = _gen(seed)
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {}
        for r in duplicate_spans(df, k=k, min_docs=2).collect():
            got.setdefault(r["doc_id"], []).append(
                (r["span_start"], r["span_end"])
            )
        got = {d: sorted(v) for d, v in got.items()}
        want = {
            d: v for d, v in _naive_spans(rows, k).items() if v
        }
        assert got == want, f"seed {seed}"


def test_remove_duplicate_spans_match_naive(spark):
    k = 5
    rows = _gen(3)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = _naive_spans(rows, k)
    want = {}
    for d, t in rows:
        ts = _toks(t)
        covered = set()
        for a, b in spans[d]:
            covered.update(range(a, b))
        kept = [t_ for i, t_ in enumerate(ts) if i not in covered]
        want[d] = (len(ts), len(ts) - len(kept), " ".join(kept))
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["new_text"])
        for r in remove_duplicate_spans(df, k=k, min_docs=2).collect()
    }
    assert got == want
    # at least one doc actually had a cut (non-trivial corpus)
    assert any(v[1] > 0 for v in want.values())
