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
    """Deterministic 400-doc corpus as plain dicts (oracle input)."""
    from quickwit_spark.sources.corpus import gen_batch

    pdf = gen_batch(np.arange(400), seed=42)
    return pdf.to_dict("records")


@pytest.fixture(scope="session")
def built_index(spark, corpus_rows, tmp_path_factory):
    """One shared 3-split index over the 400-doc corpus."""
    import pandas as pd

    from quickwit_spark.operators.build import build_index
    from quickwit_spark.plans.config import webpages_config

    index_dir = str(tmp_path_factory.mktemp("index"))
    config = webpages_config()
    df = spark.createDataFrame(pd.DataFrame(corpus_rows))
    metas = build_index(spark, df, index_dir, config, num_splits=3)
    assert sum(m.num_docs for m in metas) == 400
    return index_dir


@pytest.fixture(scope="session")
def oracle_index(corpus_rows):
    from quickwit_spark.oracle import OracleIndex
    from quickwit_spark.plans.config import webpages_config

    return OracleIndex(corpus_rows, webpages_config(), num_splits=3)
