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


def test_duckdb_oracle_cte_tokenizer_parity(corpus_rows):
    """The driver-oracle tokenization CTE (__spark_entry__._TOKS_CTE)
    must agree with the engine tokenizer on a corpus containing a
    multibyte token that is >= 40 BYTES but < 40 CHARS (20x'é'):
    both sides drop it on octet length (tantivy RemoveLongFilter
    counts UTF-8 bytes, tokenizer/mod.rs)."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as se

    docs = pd.DataFrame(
        {
            "doc_id": [r["url"] for r in corpus_rows],
            "text": [r["text"] for r in corpus_rows],
        }
    )
    assert any("é" * 20 in t for t in docs["text"]), "fixture lost the multibyte doc"
    con = duckdb.connect()
    con.register("documents", docs)
    sql = se._with(se._TOKS_CTE) + """
SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
ORDER BY doc_id, term
"""
    got = con.execute(sql).fetchall()

    from collections import Counter

    from quickwit_spark.operators.analysis import tokenize

    want = []
    for r in corpus_rows:
        c = Counter(tokenize(r["text"], "default"))
        for term in sorted(c):
            want.append((r["url"], term, c[term]))
    want.sort()
    assert got == want
    kept = {t for (_, t, _) in got if t.startswith("é")}
    assert "é" * 19 in kept and "é" * 20 not in kept
