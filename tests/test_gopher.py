"""Gopher quality rules (functions/gopher.py) — hand-computed cases."""

from quickwit_spark.functions.gopher import gopher_rules

# 60 words, all alphabetic, mean length 4.0, required stops {the, of}
GOOD = " ".join(["the", "rain", "of", "falls", "gently", "over"] * 10)


def _rules(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in gopher_rules(df, **kw).collect()}


def test_good_doc_keeps(spark):
    got = _rules(spark, [(1, GOOD)])[1]
    assert got["n_words"] == 60
    assert got["n_alpha"] == 60
    assert got["n_required"] == 2  # 'the' and 'of'
    assert got["word_chars"] == 240  # mean word length exactly 4.0
    assert got["keep"] == 1


def test_each_rule_fires(spark):
    got = _rules(
        spark,
        [
            (1, GOOD),                                   # all pass
            (2, "too short to pass the word count."),    # r_word_count
            (3, " ".join(["a"] * 60) + " the be"),       # mean word len < 3
            (4, GOOD + " " + " ".join(["#"] * 10)),      # symbol ratio
            (5, "• " + GOOD),                            # 1/1 bullet lines
            (6, GOOD + " ..."),                          # 1/1 ellipsis lines
            (7, " ".join(["12345"] * 50) + " the be"),   # alpha ratio
            (8, " ".join(["word"] * 60)),                # no required stops
        ],
    )
    assert got[1]["r_word_count"] == 1
    assert got[2]["r_word_count"] == 0
    assert got[3]["r_mean_word_len"] == 0 and got[1]["r_mean_word_len"] == 1
    assert got[4]["r_symbol_ratio"] == 0 and got[1]["r_symbol_ratio"] == 1
    assert got[5]["r_bullet_lines"] == 0 and got[1]["r_bullet_lines"] == 1
    assert got[6]["r_ellipsis_lines"] == 0 and got[1]["r_ellipsis_lines"] == 1
    assert got[7]["r_alpha_words"] == 0 and got[1]["r_alpha_words"] == 1
    assert got[8]["r_required_stops"] == 0
    for i in range(2, 9):
        assert got[i]["keep"] == 0


def test_counts_hand_computed(spark):
    text = "• first bullet line\nplain middle line\nends with dots ...\n# tag"
    got = _rules(spark, [(1, text)])[1]
    assert got["n_lines"] == 4
    assert got["n_bullet"] == 1
    assert got["n_ellipsis"] == 1
    assert got["n_symbols"] == 2  # one '#', one '...'
    assert got["n_words"] == len(text.split())  # 13
    # word_chars: sum of per-word lengths (whitespace excluded)
    assert got["word_chars"] == sum(len(w) for w in text.split())


def test_knobs_and_empty(spark):
    got = _rules(spark, [(1, ""), (2, GOOD)], min_words=10, max_words=59)
    assert got[1]["n_words"] == 0 and got[1]["keep"] == 0
    assert got[2]["r_word_count"] == 0  # 60 > max_words=59


def test_pure_map_no_shuffle(spark):
    df = spark.createDataFrame([(1, GOOD)], "doc_id long, text string")
    plan = gopher_rules(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
