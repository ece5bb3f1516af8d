"""Hash-feature linear classifier (functions/quality_clf.py)."""

import hashlib

from quickwit_spark.functions.quality_clf import quality_classifier


def _w(tok, seed="qclf", scale=1000):
    h = int(hashlib.md5(f"{seed}|{tok}".encode()).hexdigest()[:8], 16)
    return h % (2 * scale + 1) - scale


def test_logit_matches_reference_weights(spark):
    text = "The quick brown fox, the lazy dog!"
    toks = ["the", "quick", "brown", "fox", "the", "lazy", "dog"]
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = quality_classifier(df).collect()[0]
    want_logit = sum(_w(t) for t in toks)
    assert got["n_tokens"] == 7
    assert got["logit"] == want_logit
    assert got["keep"] == (1 if want_logit >= 0 else 0)


def test_threshold_and_empty(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "")], "doc_id long, text string"
    )
    # impossible threshold: mean weight must be >= 2*scale
    out = {
        r["doc_id"]: r
        for r in quality_classifier(
            df, threshold_num=2000, threshold_den=1
        ).collect()
    }
    assert out[1]["keep"] == 0
    # always-keep threshold for non-empty docs
    out = {
        r["doc_id"]: r
        for r in quality_classifier(
            df, threshold_num=-2000, threshold_den=1
        ).collect()
    }
    assert out[1]["keep"] == 1
    assert out[2]["keep"] == 0  # empty doc never keeps
    assert out[2]["n_tokens"] == 0 and out[2]["logit"] == 0


def test_seed_changes_model(spark):
    df = spark.createDataFrame(
        [(1, "some stable words here")], "doc_id long, text string"
    )
    a = quality_classifier(df, seed="a").collect()[0]["logit"]
    b = quality_classifier(df, seed="b").collect()[0]["logit"]
    assert a != b  # different key, different hashed model


def test_pure_map_no_shuffle(spark):
    df = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    plan = (
        quality_classifier(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
