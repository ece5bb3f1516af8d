from __future__ import annotations

import numpy as np
import pytest

from quickwit_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("quickwit_spark_tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def corpus_rows():
    """Deterministic 400-doc corpus as plain dicts (oracle input),
    plus one multibyte doc whose tokens straddle the 40-BYTE limit
    (19×'é' = 38 bytes kept, 20×'é' = 40 bytes dropped) so the
    byte-vs-char token-length semantics are tested, not assumed."""
    import datetime as dt

    from quickwit_spark.sources.corpus import gen_batch, text_to_html

    pdf = gen_batch(np.arange(400), seed=42)
    rows = pdf.to_dict("records")
    mb_text = "héllo wörld " + "é" * 19 + " " + "é" * 20 + " qw_multibyte"
    rows.append(
        {
            "url": "https://site-mb.example/400",
            "warc_ts": rows[0]["warc_ts"].replace(month=3, day=15),
            "html": text_to_html(400, mb_text),
            "text": mb_text,
            "lang": "fr",
        }
    )
    return rows


@pytest.fixture(scope="session")
def built_index(spark, corpus_rows, tmp_path_factory):
    """One shared 3-split index over the 401-doc corpus."""
    import pandas as pd

    from quickwit_spark.operators.build import build_index
    from quickwit_spark.plans.config import webpages_config

    index_dir = str(tmp_path_factory.mktemp("index"))
    config = webpages_config()
    df = spark.createDataFrame(pd.DataFrame(corpus_rows))
    metas = build_index(spark, df, index_dir, config, num_splits=3)
    assert sum(m.num_docs for m in metas) == 401
    return index_dir


@pytest.fixture(scope="session")
def oracle_index(corpus_rows):
    from quickwit_spark.oracle import OracleIndex
    from quickwit_spark.plans.config import webpages_config

    return OracleIndex(corpus_rows, webpages_config(), num_splits=3)
