"""Randomized naive-model parity for the session-2 text operators:
fix_text, top_ngrams, significant_terms, tfidf_keywords — each Spark
operator vs a short pure-Python model over seeded corpora that stress
the semantics (mojibake, ties, empty docs, shared vocab)."""

from __future__ import annotations

import math
import random
import re

from pyspark.sql import functions as F

_TOK = re.compile(r"[a-z0-9]+")


def _gen_texts(seed, mojibake=False):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(18)]
    junk = ["​", " ", "“q”", "–", "\x07",
            "\t\t", "  ", "…", "‘s’"]
    rows = []
    for d in range(rng.randint(4, 10)):
        n = rng.randint(0, 30)
        words = [rng.choice(vocab) for _ in range(n)]
        if mojibake:
            for _ in range(rng.randint(0, 5)):
                words.insert(
                    rng.randint(0, max(0, len(words) - 1)), rng.choice(junk)
                )
        rows.append((d, " ".join(words)))
    return rows


# ------------------------------------------------------------ fix_text
def _naive_fix(t):
    t = re.sub(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", "", t)
    dropped = t
    t = re.sub("[​-‍﻿]", "", t)
    n_dropped0 = len(dropped)
    t2 = t
    t = t.replace(" ", " ")
    for pat, rep in (("[‘’‛]", "'"),
                     ('[“”„]', '"'),
                     ("[–—]", "-"), ("…", "...")):
        t = re.sub(pat, rep, t)
    t = re.sub(r"[ \t]+", " ", t)
    t = re.sub(r" *\n *", "\n", t)
    t = re.sub(r"\n{3,}", "\n\n", t)
    return t.strip(" "), len(t2)


def test_fix_text_matches_naive(spark):
    from quickwit_spark.functions.textfix import fix_text

    for seed in range(8):
        rows = _gen_texts(seed, mojibake=True)
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r for r in fix_text(df).collect()}
        for d, t in rows:
            want_clean, after_drop_len = _naive_fix(t)
            r = got[d]
            assert r["clean_text"] == want_clean, (seed, d, t)
            assert r["orig_len"] == len(t)
            # dropped = control chars + zero-width code points
            ctrl = len(t) - len(
                re.sub(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", "", t)
            )
            zw = len(re.findall("[​-‍﻿]", t))
            assert r["n_dropped"] == ctrl + zw


# ----------------------------------------------------------- top_ngrams
def _naive_top_ngrams(rows, n, k):
    counts: dict = {}
    for _, lang, t in rows:
        toks = _TOK.findall(t.lower())
        for i in range(len(toks) - n + 1):
            g = " ".join(toks[i:i + n])
            counts[(lang, g)] = counts.get((lang, g), 0) + 1
    out = []
    langs = {lang for lang, _ in counts}
    for lang in langs:
        items = sorted(
            ((c, g) for (l, g), c in counts.items() if l == lang),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        out.extend(
            (lang, g, c, r + 1) for r, (c, g) in enumerate(items)
        )
    return sorted(out)


def test_top_ngrams_matches_naive(spark):
    from quickwit_spark.functions.textstats import top_ngrams

    for seed in range(6):
        rng = random.Random(100 + seed)
        rows = [
            (d, rng.choice(["en", "de"]), t)
            for d, t in _gen_texts(seed)
        ]
        df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
        for n, k in ((1, 3), (2, 4)):
            got = sorted(
                (r["grp"], r["ngram"], r["n_occurrences"], r["rank"])
                for r in top_ngrams(df, n=n, k=k, group_col="lang").collect()
            )
            assert got == _naive_top_ngrams(rows, n, k), (seed, n)


# ---------------------------------------------------- significant_terms
def _naive_significant(rows, k):
    fg_docs = [t for fg, t in rows if fg]
    bg_docs = [t for fg, t in rows if not fg]
    counts: dict = {}
    for grp, docs in (("fg", fg_docs), ("bg", bg_docs)):
        for t in docs:
            for w in set(_TOK.findall(t.lower())):
                key = (w, grp)
                counts[key] = counts.get(key, 0) + 1
    terms = {w for (w, g) in counts if g == "fg"}
    scored = sorted(
        (
            (-(counts.get((w, "fg"), 0) / (counts.get((w, "bg"), 0) + 1)), w)
            for w in terms
        ),
    )[:k]
    return [
        (w, counts.get((w, "fg"), 0), counts.get((w, "bg"), 0), r + 1)
        for r, (_, w) in enumerate(scored)
    ]


def test_significant_terms_matches_naive(spark):
    from quickwit_spark.functions.significant import significant_terms

    for seed in range(6):
        rng = random.Random(200 + seed)
        rows = [(rng.random() < 0.4, t) for _, t in _gen_texts(seed)]
        if not any(fg for fg, _ in rows):
            rows[0] = (True, rows[0][1])
        df = spark.createDataFrame(rows, "fg boolean, text string")
        got = [
            (r["term"], r["fg_count"], r["bg_count"], r["rank"])
            for r in sorted(
                significant_terms(df, F.col("fg"), k=5).collect(),
                key=lambda r: r["rank"],
            )
        ]
        assert got == _naive_significant(rows, 5), seed


# ------------------------------------------------------ tfidf_keywords
def _naive_tfidf(rows, k):
    n = len(rows)
    tf: dict = {}
    dfreq: dict = {}
    for d, t in rows:
        toks = _TOK.findall(t.lower())
        for w in toks:
            tf[(d, w)] = tf.get((d, w), 0) + 1
        for w in set(toks):
            dfreq[w] = dfreq.get(w, 0) + 1
    out = []
    for d, _ in rows:
        items = sorted(
            (
                (-round(c * math.log(n / dfreq[w]), 3), w, c)
                for (dd, w), c in tf.items()
                if dd == d
            ),
        )[:k]
        out.extend(
            (d, w, c, dfreq[w], -s, r + 1)
            for r, (s, w, c) in enumerate(items)
        )
    return sorted(out)


def test_tfidf_keywords_matches_naive(spark):
    from quickwit_spark.functions.textstats import tfidf_keywords

    for seed in range(6):
        rows = _gen_texts(300 + seed)
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = sorted(
            (r["doc_id"], r["term"], r["tf"], r["df"],
             round(r["score"], 3), r["rank"])
            for r in tfidf_keywords(df, k=3).collect()
        )
        assert got == _naive_tfidf(rows, 3), seed
