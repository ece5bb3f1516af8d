"""Randomized property parity for cross-doc line dedup: the Spark
operator vs a 20-line naive Python model, over seeded corpora that
stress the semantics (shared boilerplate, whitespace-only lines,
duplicate lines WITHIN one doc, empty docs). The historical driver
red cell for this operator was transport formatting, not logic — this
pins the logic side for any corpus shape."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from quickwit_spark.functions.linededup import dedup_lines


def _naive(rows, min_docs=2):
    # the operator's unit semantic is SQL trim — SPACES only (Spark
    # F.trim == DuckDB trim), so a tab-only line is a retained line
    lines = {
        d: [l.strip(" ") for l in t.split("\n") if l.strip(" ") != ""]
        for d, t in rows
    }
    docs_per_line: dict[str, set] = {}
    for d, ls in lines.items():
        for l in set(ls):
            docs_per_line.setdefault(l, set()).add(d)
    dup = {l for l, ds in docs_per_line.items() if len(ds) >= min_docs}
    out = {}
    for d, ls in lines.items():
        kept = [l for l in ls if l not in dup]
        out[d] = (len(ls), len(ls) - len(kept), "\n".join(kept))
    return out


def _gen(seed: int):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(30)]
    boiler = [
        " ".join(rng.choices(vocab, k=rng.randint(1, 6)))
        for _ in range(4)
    ]
    rows = []
    for d in range(rng.randint(4, 12)):
        n = rng.randint(0, 8)
        parts = []
        for _ in range(n):
            r = rng.random()
            if r < 0.35:
                parts.append(rng.choice(boiler))
            elif r < 0.45:
                parts.append(rng.choice(["", "   ", "\t"]))  # blank-ish
            else:
                parts.append(
                    "  " * rng.randint(0, 1)
                    + " ".join(rng.choices(vocab, k=rng.randint(1, 7)))
                )
        # occasionally duplicate a line INSIDE the same doc
        if parts and rng.random() < 0.4:
            parts.append(parts[0])
        rows.append((d, "\n".join(parts)))
    return rows


def test_dedup_lines_matches_naive_model(spark):
    for seed in range(12):
        rows = _gen(seed)
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_lines"], r["n_removed"], r["new_text"])
            for r in dedup_lines(df).collect()
        }
        want = _naive(rows)
        assert got == want, f"seed {seed}: {got} != {want}"


def test_dedup_lines_min_docs_property(spark):
    rows = _gen(3)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for min_docs in (2, 3, 99):
        got = {
            r["doc_id"]: (r["n_lines"], r["n_removed"], r["new_text"])
            for r in dedup_lines(df, min_docs=min_docs).collect()
        }
        assert got == _naive(rows, min_docs=min_docs)
    # min_docs beyond corpus size removes nothing
    assert all(v[1] == 0 for v in got.values())


def _naive_within(rows):
    out = {}
    for d, t in rows:
        ls = [l.strip(" ") for l in t.split("\n") if l.strip(" ") != ""]
        seen, kept = set(), []
        for l in ls:
            if l not in seen:
                seen.add(l)
                kept.append(l)
        out[d] = (len(ls), len(ls) - len(kept), "\n".join(kept))
    return out


def test_dedup_lines_within_matches_naive_model(spark):
    from quickwit_spark.functions.linededup import dedup_lines_within

    for seed in range(12):
        rows = _gen(seed)
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_lines"], r["n_removed"], r["new_text"])
            for r in dedup_lines_within(df).collect()
        }
        want = _naive_within(rows)
        assert got == want, f"seed {seed}: {got} != {want}"


def test_dedup_lines_within_is_shuffle_free(spark):
    from quickwit_spark.functions.linededup import dedup_lines_within

    df = spark.createDataFrame([(1, "a\nb\na")], "doc_id long, text string")
    plan = dedup_lines_within(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_dedup_lines_within_idempotent(spark):
    from quickwit_spark.functions.linededup import dedup_lines_within

    rows = _gen(5)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    once = dedup_lines_within(df).select(
        "doc_id", F.col("new_text").alias("text")
    )
    twice = {
        r["doc_id"]: (r["n_removed"], r["new_text"])
        for r in dedup_lines_within(once).collect()
    }
    assert all(v[0] == 0 for v in twice.values())
