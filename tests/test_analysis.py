import pandas as pd
from pyspark.sql import functions as F

from quickwit_spark.operators.analysis import tokenize, tokenize_col
from quickwit_spark.operators.porter import stem


SAMPLES = [
    "Hello, World!",
    "qw_marker_3 and  spaces\ttabs\nnewlines",
    "UPPER lower MiXeD 123 a1b2",
    "x" * 39 + " " + "y" * 40 + " ok",
    "",
    "   ",
    "trailing punct...",
    "unicode: über café 東京 ключ",
]


def test_spark_python_tokenizer_parity(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], "t string")
    for tok in ("raw", "default"):
        got = [
            r["toks"]
            for r in df.select(tokenize_col(F.col("t"), tok).alias("toks"))
            .collect()
        ]
        want = [tokenize(s, tok) for s in SAMPLES]
        assert got == want, tok


def test_default_tokenizer_rules():
    assert tokenize("Hello, World!") == ["hello", "world"]
    # >= 40 bytes dropped (tantivy RemoveLongFilter(40))
    assert tokenize("x" * 40) == []
    assert tokenize("x" * 39) == ["x" * 39]
    assert tokenize("a_b-c.d") == ["a", "b", "c", "d"]


def test_raw_tokenizer():
    assert tokenize("Hello World", "raw") == ["Hello World"]
    assert tokenize("", "raw") == []


def test_stem_en_golden():
    # canonical Porter test vectors (Porter 1980 examples)
    vectors = {
        "caresses": "caress", "ponies": "poni", "cats": "cat",
        "agreed": "agre", "plastered": "plaster", "motoring": "motor",
        "hopping": "hop", "relational": "relat", "rational": "ration",
        "digitizer": "digit", "operator": "oper", "happy": "happi",
    }
    for w, s in vectors.items():
        assert stem(w) == s, w
    assert tokenize("Motoring ponies!", "stem_en") == ["motor", "poni"]


def test_stem_udf_matches_python(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], "t string")
    got = [
        r["toks"]
        for r in df.select(tokenize_col(F.col("t"), "stem_en").alias("toks")).collect()
    ]
    want = [tokenize(s, "stem_en") for s in SAMPLES]
    assert got == want
