from quickwit_spark.operators.xxhash import xxhash64_signed


def test_matches_spark_xxhash64(spark):
    keys = [
        "",
        "a",
        "hello world",
        "https://site1.example/1",
        "x" * 7,
        "y" * 8,
        "z" * 31,
        "w" * 32,
        "v" * 100,
        "üñïçödé-ключ-鍵",
    ]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    rows = df.selectExpr("k", "xxhash64(k) as h").collect()
    for r in rows:
        assert xxhash64_signed(r["k"]) == r["h"], r["k"]
