"""Randomized naive-model parity for the round-5 curation operators:
c4_clean, gopher_rules, sessionize. Each Spark operator is compared
against a short reference implementation in plain Python over seeded
random inputs that hit every rule. (String semantics follow the
operator family's SQL-trim contract: trim strips SPACES only.)"""

from __future__ import annotations

import datetime as dt
import random

import pyspark.sql.functions as F


# ------------------------------------------------------------ c4_clean
def _c4_naive(text, min_words=5, min_kept_lines=3):
    lines = [l.strip(" ") for l in text.split("\n")]
    lines = [l for l in lines if l != ""]
    kept = [
        l for l in lines
        if l[-1:] in (".", "!", "?", '"')
        and len([w for w in l.split(" ") if w != ""]) >= min_words
        and "javascript" not in l.lower()
    ]
    ok = (
        "lorem ipsum" not in text.lower()
        and "{" not in text
        and len(kept) >= min_kept_lines
    )
    return (len(lines), len(kept), int(ok), "\n".join(kept) if ok else "")


def _gen_page(rng):
    words = [f"w{i}" for i in range(20)]
    lines = []
    for _ in range(rng.randint(0, 8)):
        n = rng.randint(1, 8)
        line = " ".join(rng.choices(words, k=n))
        r = rng.random()
        if r < 0.5:
            line += rng.choice([".", "!", "?", '"'])
        if rng.random() < 0.15:
            line += " javascript."
        if rng.random() < 0.08:
            line = "   " + line + "  "
        lines.append(line)
    text = "\n".join(lines)
    if rng.random() < 0.1:
        text += "\nLorem Ipsum dolor."
    if rng.random() < 0.1:
        text += "\ncode { x }"
    return text


def test_c4_clean_matches_naive(spark):
    from quickwit_spark.functions.webclean import c4_clean

    rng = random.Random(77)
    rows = [(i, _gen_page(rng)) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["kept"], r["clean_text"])
        for r in c4_clean(df).collect()
    }
    want = {d: _c4_naive(t) for d, t in rows}
    assert got == want
    # non-trivial corpus: both verdicts appear
    assert {v[2] for v in want.values()} == {0, 1}


# --------------------------------------------------------- gopher_rules
def _gopher_naive(text, min_words=50, max_words=100_000):
    words = [w for w in text.split() if w != ""]  # \s+ split
    n_words = len(words)
    chars = sum(len(w) for w in words)
    symbols = text.count("#") + text.count("...")
    lines = [l.strip(" ") for l in text.split("\n")]
    lines = [l for l in lines if l != ""]
    bullets = sum(
        1 for l in lines
        if l.startswith("•") or l.startswith("- ") or l.startswith("* ")
    )
    ells = sum(1 for l in lines if l.endswith("...") or l.endswith("…"))
    alpha = sum(1 for w in words if any(c.isascii() and c.isalpha() for c in w))
    toks = set()
    cur = []
    for c in text.lower():
        if c.isascii() and (c.isalnum()):
            cur.append(c)
        else:
            if cur:
                toks.add("".join(cur))
            cur = []
    if cur:
        toks.add("".join(cur))
    req = len(toks & {"the", "be", "to", "of", "and", "that", "have", "with"})
    rules = [
        min_words <= n_words <= max_words,
        3 * n_words <= chars <= 10 * n_words,
        10 * symbols <= n_words,
        10 * bullets <= 9 * len(lines),
        10 * ells <= 3 * len(lines),
        5 * alpha >= 4 * n_words,
        req >= 2,
    ]
    return tuple(int(r) for r in rules) + (int(all(rules)),)


def _gen_gopher_doc(rng):
    base = ["the", "of", "and", "rain", "falls", "gently", "12345", "x"]
    parts = []
    for _ in range(rng.randint(0, 3)):
        n = rng.randint(5, 80)
        line = " ".join(rng.choices(base, k=n))
        if rng.random() < 0.3:
            line = "• " + line
        if rng.random() < 0.3:
            line += " ..."
        if rng.random() < 0.3:
            line += " # #"
        parts.append(line)
    return "\n".join(parts)


def test_gopher_rules_match_naive(spark):
    from quickwit_spark.functions.gopher import gopher_rules

    rng = random.Random(11)
    rows = [(i, _gen_gopher_doc(rng)) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cols = (
        "r_word_count", "r_mean_word_len", "r_symbol_ratio",
        "r_bullet_lines", "r_ellipsis_lines", "r_alpha_words",
        "r_required_stops", "keep",
    )
    got = {
        r["doc_id"]: tuple(r[c] for c in cols)
        for r in gopher_rules(df).collect()
    }
    want = {d: _gopher_naive(t) for d, t in rows}
    assert got == want


# ------------------------------------------------------------ sessionize
def test_sessionize_matches_naive(spark):
    from quickwit_spark.functions.sessions import sessionize

    rng = random.Random(5)
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for user in range(8):
        t = 0
        for _ in range(rng.randint(0, 20)):
            t += rng.randint(0, 70)  # minutes; gaps straddle the 30-min cut
            rows.append((user, t0 + dt.timedelta(minutes=t)))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    gap = 30 * 60 * 1_000_000
    got = {
        (r["user_id"], r["session_seq"]):
            (r["n_events"], r["start_us"], r["end_us"], r["duration_us"])
        for r in sessionize(df, gap_us=gap).collect()
    }
    # naive: sort per user, split on gap
    want = {}
    by_user: dict[int, list] = {}
    for u, ts in rows:
        by_user.setdefault(u, []).append(
            int((ts - dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000)
        )
    for u, times in by_user.items():
        times.sort()
        seq, cur = 0, [times[0]]
        for t in times[1:]:
            if t - cur[-1] <= gap:
                cur.append(t)
            else:
                want[(u, seq)] = (
                    len(cur), cur[0], cur[-1], cur[-1] - cur[0]
                )
                seq, cur = seq + 1, [t]
        want[(u, seq)] = (len(cur), cur[0], cur[-1], cur[-1] - cur[0])
    assert got == want
