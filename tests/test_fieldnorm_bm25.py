import numpy as np

from quickwit_spark.operators import bm25
from quickwit_spark.operators.fieldnorm import (
    FIELD_NORMS_TABLE,
    fieldnorm_to_id,
    id_to_fieldnorm,
)


def test_table_shape_and_exact_range():
    assert FIELD_NORMS_TABLE.shape == (256,)
    assert (np.diff(FIELD_NORMS_TABLE.astype(np.int64)) > 0).all()
    # Lucene SmallFloat int4: exact for 0..=40
    assert (FIELD_NORMS_TABLE[:41] == np.arange(41)).all()
    assert FIELD_NORMS_TABLE[41] == 42 and FIELD_NORMS_TABLE[42] == 44


def test_quantize_floor_roundtrip():
    vals = np.array([0, 1, 39, 40, 41, 100, 1000, 10**6, 2**31 - 1])
    ids = fieldnorm_to_id(vals)
    dec = id_to_fieldnorm(ids)
    assert (dec <= vals).all()
    bigger = ids[ids < 255] + 1
    assert (id_to_fieldnorm(bigger) > vals[ids < 255]).all()


def test_idf_formula():
    # ln(1 + (N - df + 0.5)/(df + 0.5)) in f32
    n, df = 1000, 10
    expect = np.float32(np.log1p((np.float32(n) - 10 + 0.5) / (10 + 0.5)))
    assert bm25.idf(df, n) == expect


def test_score_monotonic_in_tf_and_len():
    cache = bm25.norm_cache(50.0)
    w = bm25.term_weight(5, 1000)
    tf = np.array([1, 2, 5, 50])
    s = bm25.score_tf(tf, np.zeros(4, dtype=np.int64), w, cache)
    assert (np.diff(s) > 0).all()
    # longer docs score lower at equal tf
    ids = fieldnorm_to_id(np.array([10, 100, 1000]))
    s2 = bm25.score_tf(np.array([3, 3, 3]), ids, w, cache)
    assert (np.diff(s2) < 0).all()
    assert s.dtype == np.float32


def test_jvm_fieldnorm_id_matches_numpy(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from quickwit_spark.operators.fieldnorm import fieldnorm_id_col

    vals = np.unique(
        np.concatenate(
            [
                np.arange(0, 5000),
                2 ** np.arange(3, 41),
                2 ** np.arange(3, 41) - 1,
                2 ** np.arange(3, 41) + 1,
                # past id 255: the JVM expression must saturate like
                # fieldnorm_to_id (table floor), not run off the table
                np.array([2**31 - 1, 2**31 + 24, 2**35 + 24, 2**52]),
            ]
        )
    ).astype(np.int64)
    df = spark.createDataFrame(pd.DataFrame({"n": vals}))
    got = (
        df.select("n", fieldnorm_id_col(F.col("n")).alias("id"))
        .orderBy("n")
        .toPandas()
    )
    want = fieldnorm_to_id(vals)
    assert (got["id"].to_numpy() == want.astype(np.int64)).all()
