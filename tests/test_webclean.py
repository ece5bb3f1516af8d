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


def test_clean_is_idempotent(spark):
    """clean(clean_text) is a fixpoint: kept pages keep every line and
    stay kept; dropped pages ('' text) stay dropped — over real docs
    reshaped with the same marker injection as the gate entry."""
    import pyspark.sql.functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    lines = F.transform(
        F.sequence(
            F.lit(0),
            F.greatest(F.lit(0), F.floor((F.size(toks) - 1) / 10).cast("int")),
        ),
        lambda i: F.concat(
            F.array_join(F.slice(toks, i * 10 + 1, 10), " "),
            F.when((F.col("doc_id") + i) % 5 == 0, F.lit("")).otherwise(
                F.when((F.col("doc_id") + i) % 5 == 3, F.lit(" javascript."))
                .otherwise(F.lit("."))
            ),
        ),
    )
    d = docs.select("doc_id", F.array_join(lines, "\n").alias("text"))
    first = c4_clean(d).select(
        "doc_id", F.col("clean_text").alias("text"), "kept", "n_kept"
    )
    second = c4_clean(first.select("doc_id", "text"))
    joined = first.select(
        "doc_id",
        F.col("kept").alias("k1"),
        F.col("n_kept").alias("n1"),
        F.col("text").alias("t1"),
    ).join(
        second.select(
            "doc_id",
            F.col("kept").alias("k2"),
            F.col("n_kept").alias("n2"),
            F.col("clean_text").alias("t2"),
        ),
        "doc_id",
    )
    assert joined.count() > 0
    bad = joined.filter(
        ((F.col("k1") == 1) & ((F.col("k2") != 1) | (F.col("t1") != F.col("t2"))
                               | (F.col("n1") != F.col("n2"))))
        | ((F.col("k1") == 0) & (F.col("k2") != 0))
    )
    assert bad.count() == 0
    # non-trivial on both sides
    assert first.filter("kept = 1").count() > 0
    assert first.filter("kept = 0").count() > 0


def test_pure_map_no_shuffle(spark):
    """The 100 TB contract: the cleaner is one shuffle-free project."""
    df = spark.createDataFrame([(1, GOOD)], "doc_id long, text string")
    plan = c4_clean(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
