"""C4-style cleaning (functions/webclean.py) — hand-computed cases."""

from quickwit_spark.functions.webclean import c4_clean

GOOD = "the quick brown fox jumps over the lazy dog."


def _clean(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = c4_clean(df, **kw).collect()
    return {r["doc_id"]: r.asDict() for r in out}


def test_line_rules(spark):
    text = "\n".join(
        [
            GOOD,                                    # kept
            "no terminal punctuation here at all",   # dropped: no punct
            "too short.",                            # dropped: < 5 words
            "enable JavaScript to view this page.",  # dropped: javascript
            "  " + GOOD + "  ",                      # kept (trimmed)
            "is this a real question?",              # kept: '?' terminal
            "",                                      # not a line at all
        ]
    )
    got = _clean(spark, [(1, text)])[1]
    assert got["n_lines"] == 6  # empty line excluded
    assert got["n_kept"] == 3
    assert got["kept"] == 1
    assert got["clean_text"] == "\n".join(
        [GOOD, GOOD, "is this a real question?"]
    )


def test_page_rules(spark):
    three = "\n".join([GOOD] * 3)
    got = _clean(
        spark,
        [
            (1, three),                                   # kept
            (2, "\n".join([GOOD] * 2)),                   # < 3 kept lines
            (3, three + "\nLorem Ipsum dolor sit amet."), # lorem ipsum
            (4, three + "\nif (x) { return y; }."),       # curly brace
            (5, ""),                                      # empty page
        ],
    )
    assert [got[i]["kept"] for i in (1, 2, 3, 4, 5)] == [1, 0, 0, 0, 0]
    assert got[1]["clean_text"] == three
    # dropped pages keep their audit counts but emit empty text
    assert got[2]["n_kept"] == 2 and got[2]["clean_text"] == ""
    assert got[5]["n_lines"] == 0 and got[5]["n_kept"] == 0


def test_badwords_and_knobs(spark):
    three = "\n".join([GOOD] * 3)
    got = _clean(
        spark,
        [(1, three), (2, three + "\nthis page mentions GAMBLING now.")],
        badwords=["gambling"],
    )
    assert got[1]["kept"] == 1 and got[2]["kept"] == 0
    # min_words / min_kept_lines knobs
    got = _clean(spark, [(1, "one two.\nthree four.")], min_words=2,
                 min_kept_lines=2)
    assert got[1]["kept"] == 1 and got[1]["n_kept"] == 2


def test_pure_map_no_shuffle(spark):
    """The 100 TB contract: the cleaner is one shuffle-free project."""
    df = spark.createDataFrame([(1, GOOD)], "doc_id long, text string")
    plan = c4_clean(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
