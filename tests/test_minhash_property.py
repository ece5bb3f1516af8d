"""Randomized exact parity for the MinHash/LSH dedup path: the Spark
operators vs a direct Python replication of the md5 hash family —
signatures are DETERMINISTIC (min of md5('<i>|'+shingle) hex), so the
model matches byte-for-byte, and LSH candidate pairs follow exactly."""

from __future__ import annotations

import hashlib
import random
import re

from quickwit_spark.functions.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
)


def _shingles(text, k=3):
    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t != ""]
    if len(toks) < k:
        return set()
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


def _sig(text, num_hashes=12, k=3):
    sh = _shingles(text, k)
    if not sh:
        return None
    return tuple(
        min(hashlib.md5(f"{i}|{s}".encode()).hexdigest() for s in sh)
        for i in range(num_hashes)
    )


def _pairs(sigs, bands=4, rows_per_band=3):
    buckets: dict[tuple, set] = {}
    for key, sig in sigs.items():
        for b in range(bands):
            band = sig[b * rows_per_band:(b + 1) * rows_per_band]
            h = hashlib.md5("|".join(band).encode()).hexdigest()
            buckets.setdefault((b, h), set()).add(key)
    out = set()
    for ks in buckets.values():
        ks = sorted(ks)
        for i in range(len(ks)):
            for j in range(i + 1, len(ks)):
                out.add((ks[i], ks[j]))
    return out


def _gen(seed):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(40)]
    base = [
        " ".join(rng.choices(vocab, k=rng.randint(8, 25))) for _ in range(5)
    ]
    rows = []
    for d in range(rng.randint(5, 12)):
        if rng.random() < 0.5:
            # near-dup: mutate one base doc slightly
            words = rng.choice(base).split()
            if words and rng.random() < 0.7:
                words[rng.randrange(len(words))] = rng.choice(vocab)
            rows.append((d, " ".join(words)))
        else:
            rows.append(
                (d, " ".join(rng.choices(vocab, k=rng.randint(2, 20))))
            )
    return rows


def test_minhash_signatures_exact(spark):
    for seed in range(6):
        rows = _gen(seed)
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["key"]: tuple(r[f"mh_{i}"] for i in range(12))
            for r in minhash_signatures(df).collect()
        }
        want = {d: _sig(t) for d, t in rows if _sig(t) is not None}
        assert got == want, f"seed {seed}"


def test_lsh_candidate_pairs_exact(spark):
    for seed in range(4):
        rows = _gen(seed)
        df = spark.createDataFrame(rows, "doc_id long, text string")
        sigs = minhash_signatures(df)
        got = {
            (r["key_a"], r["key_b"])
            for r in lsh_candidate_pairs(sigs).collect()
        }
        want = _pairs(
            {d: _sig(t) for d, t in rows if _sig(t) is not None}
        )
        assert got == want, f"seed {seed}"
