"""Web-corpus curation ops (round 4): URL normalization + dedup,
line-level dedup, exact duplicate-substring spans, domain stats,
bigram-LM quality, terms aggregation.

Semantics tests on hand-built corpora with hand-computed expectations
(the exact-oracle parity against DuckDB lives in __spark_entry__ /
scripts/check_correctness.py); plus plan assertions that the hot
paths stay JVM-side (no Python eval nodes).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from quickwit_spark.functions.domains import domain_stats
from quickwit_spark.functions.linededup import dedup_lines
from quickwit_spark.functions.lmquality import bigram_lm_score
from quickwit_spark.functions.substring_dedup import (
    duplicate_spans,
    duplicated_fraction,
)
from quickwit_spark.functions.urlnorm import dedup_urls, normalize_url


def _no_python_eval(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ------------------------------------------------------------ urlnorm
URL_CASES = [
    ("HTTP://WWW.Ex.COM:80//a//b/?utm_source=x&b=2&a=1#f", "http://ex.com/a/b?a=1&b=2"),
    ("https://Site.org:443/path/", "https://site.org/path"),
    ("site.org/p?x=1&x=0&ref=abc", "http://site.org/p?x=0&x=1"),
    ("http://h.com/?", "http://h.com"),
    ("ftp://Host:80/x", "ftp://host:80/x"),  # non-http port kept
    ("http://h.com:8080/a/", "http://h.com:8080/a"),  # non-default port kept
    ("www.h.com/#only-frag", "http://h.com"),
    ("http://h.com/a///?gclid=1&z", "http://h.com/a?z"),
    # protocol-relative hrefs (common in crawls) get the default scheme
    ("//Example.com/a/", "http://example.com/a"),
    ("//www.h.com:80/x?b=1&a=1", "http://h.com/x?a=1&b=1"),
]


def test_normalize_url_cases(spark):
    df = spark.createDataFrame([(u,) for u, _ in URL_CASES], "url string")
    out = df.select(normalize_url(F.col("url")).alias("n"))
    _no_python_eval(out)
    got = [r["n"] for r in out.collect()]
    assert got == [e for _, e in URL_CASES]


def test_dedup_urls_single_shuffle_min_id(spark):
    rows = [
        (1, "http://A.com/x?b=1&a=1"),
        (7, "HTTP://a.com:80/x/?a=1&b=1#frag"),
        (3, "http://www.a.com/x?utm_c=9&a=1&b=1"),
        (9, "https://a.com/x?a=1&b=1"),  # different scheme -> distinct
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = dedup_urls(df)
    got = {r["url_norm"]: (r["kept_doc_id"], r["n_dups"]) for r in out.collect()}
    assert got == {
        "http://a.com/x?a=1&b=1": (1, 2),
        "https://a.com/x?a=1&b=1": (9, 0),
    }
    # exactly ONE shuffle stage: the groupBy on the canonical key (AQE
    # prints the exchange twice — count materialized shuffle stages)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ShuffleQueryStage") == 1
    _no_python_eval(out)


# --------------------------------------------------------- line dedup
def test_dedup_lines_removes_cross_doc_boilerplate(spark):
    rows = [
        (0, "subscribe now\nalpha beta\ngamma delta"),
        (1, "subscribe now\nepsilon zeta"),
        (2, "  subscribe now  \nunique line here\n\n"),
        (3, "all original\ncontent kept"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup_lines(df).collect()}
    assert len(out) == 5
    # 'subscribe now' occurs (trimmed) in 3 docs -> removed everywhere
    assert out[0]["new_text"] == "alpha beta\ngamma delta"
    assert (out[0]["n_lines"], out[0]["n_removed"]) == (3, 1)
    assert out[1]["new_text"] == "epsilon zeta"
    assert out[2]["new_text"] == "unique line here"
    assert out[2]["n_lines"] == 2  # empty line dropped pre-count
    assert out[3] ["n_removed"] == 0
    assert (out[4]["n_lines"], out[4]["new_text"]) == (0, "")


def test_dedup_lines_min_docs_threshold(spark):
    rows = [(0, "dup line\na"), (1, "dup line\nb"), (2, "c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    strict = {r["doc_id"]: r for r in dedup_lines(df, min_docs=3).collect()}
    assert strict[0]["n_removed"] == 0  # only 2 docs share it
    loose = {r["doc_id"]: r for r in dedup_lines(df, min_docs=2).collect()}
    assert loose[0]["n_removed"] == 1 and loose[1]["n_removed"] == 1


# ------------------------------------------------- substring spans
def test_duplicate_spans_island_merge(spark):
    # docs 0 and 1 share tokens 10..19 (a 10-token run); with k=4 the
    # shared seed windows merge into ONE maximal span per doc
    shared = " ".join(f"s{i}" for i in range(10))
    rows = [
        (0, " ".join(f"a{i}" for i in range(10)) + " " + shared + " a-tail"),
        (1, " ".join(f"b{i}" for i in range(10)) + " " + shared + " b-tail"),
        (2, "totally unrelated words only here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = duplicate_spans(df, k=4, min_docs=2).collect()
    got = {(r["doc_id"], r["span_start"], r["span_end"]) for r in spans}
    # shared run occupies token positions 10..19 in both docs
    assert got == {(0, 10, 20), (1, 10, 20)}
    for r in spans:
        assert r["span_len"] == 10 and r["n_grams"] == 7  # 10-4+1 seeds
    _no_python_eval(duplicate_spans(df, k=4))


def test_duplicate_spans_adjacent_islands_split(spark):
    # two shared runs separated by a gap > k stay separate spans
    run1 = " ".join(f"x{i}" for i in range(5))
    run2 = " ".join(f"y{i}" for i in range(5))
    gap0 = " ".join(f"g{i}" for i in range(8))
    gap1 = " ".join(f"h{i}" for i in range(8))
    rows = [
        (0, run1 + " " + gap0 + " " + run2),
        (1, run1 + " " + gap1 + " " + run2),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = duplicate_spans(df, k=5, min_docs=2).collect()
    got = sorted((r["doc_id"], r["span_start"], r["span_end"]) for r in spans)
    assert got == [(0, 0, 5), (0, 13, 18), (1, 0, 5), (1, 13, 18)]


def test_duplicated_fraction(spark):
    shared = " ".join(f"s{i}" for i in range(6))
    rows = [
        (0, shared + " " + " ".join(f"a{i}" for i in range(6))),
        (1, shared + " " + " ".join(f"b{i}" for i in range(6))),
        (2, "nothing shared at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in duplicated_fraction(df, k=6, min_docs=2).collect()}
    assert out[0]["dup_tokens"] == 6 and out[0]["n_tokens"] == 12
    assert out[0]["dup_frac"] == 0.5
    assert out[2]["dup_tokens"] == 0 and out[2]["dup_frac"] == 0.0
    assert len(out) == 3  # docs with no spans still present


def test_dedup_paragraphs_sep(spark):
    boiler = "shared boilerplate para"
    rows = [
        (0, boiler + "\n\nunique a one\n\nunique a two"),
        (1, boiler + "\n\nunique b one"),
        (2, "line with\nan internal newline\n\n" + boiler),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in dedup_lines(df, min_docs=2, sep="\n\n").collect()
    }
    assert out[0]["n_removed"] == 1
    assert out[0]["new_text"] == "unique a one\n\nunique a two"
    assert out[1]["new_text"] == "unique b one"
    # single newlines stay INSIDE a paragraph at this granularity
    assert out[2]["n_lines"] == 2
    assert out[2]["new_text"] == "line with\nan internal newline"


def test_remove_duplicate_spans(spark):
    from quickwit_spark.functions.substring_dedup import (
        remove_duplicate_spans,
    )

    shared = " ".join(f"s{i}" for i in range(6))
    a_tail = " ".join(f"a{i}" for i in range(6))
    rows = [
        (0, shared + " " + a_tail),
        (1, shared + " " + " ".join(f"b{i}" for i in range(6))),
        (2, "nothing   shared\nat all"),  # messy whitespace normalizes
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(df, k=6, min_docs=2).collect()
    }
    # the shared 6-token prefix is cut from BOTH docs (all occurrences)
    assert out[0]["n_tokens"] == 12 and out[0]["n_removed"] == 6
    assert out[0]["new_text"] == a_tail
    assert out[1]["n_removed"] == 6
    # untouched doc passes through whitespace-normalized, nothing cut
    assert out[2]["n_removed"] == 0
    assert out[2]["new_text"] == "nothing shared at all"
    _no_python_eval(remove_duplicate_spans(df, k=6))


# ------------------------------------------------------ domain stats
def test_domain_stats_modal_lang_tiebreak(spark):
    rows = [
        (0, "one two", "en", "d1"),
        (1, "three four five", "de", "d1"),
        (2, "six", "en", "d1"),
        (3, "sept huit", "fr", "d2"),
        (4, "neuf", "de", "d2"),  # fr/de tie at 1 doc -> 'de' (lex min)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    out = {r["domain"]: r for r in domain_stats(df).collect()}
    assert out["d1"]["n_docs"] == 3 and out["d1"]["n_langs"] == 2
    assert out["d1"]["top_lang"] == "en"
    assert out["d1"]["total_tokens"] == 6
    assert out["d2"]["top_lang"] == "de"


# -------------------------------------------------------- LM quality
def test_bigram_lm_score_hand_computed(spark):
    # corpus: "a b a b", "a b", "x"; bigrams: (a,b)x3, (b,a)x1
    # V=3 (a, b, x); c(a,.)=3, c(b,.)=1
    rows = [(0, "a b a b"), (1, "a b"), (2, "x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in bigram_lm_score(df).collect()}
    lp_ab = math.log((3 + 1) / (3 + 3))
    lp_ba = math.log((1 + 1) / (1 + 3))
    assert out[0]["n_bigrams"] == 3
    assert out[0]["lm_score"] == pytest.approx(
        round((2 * lp_ab + lp_ba) / 3, 3), abs=1e-9
    )
    assert out[1]["lm_score"] == pytest.approx(round(lp_ab, 3), abs=1e-9)
    # single-token doc: no bigrams, NULL score
    assert out[2]["n_bigrams"] == 0 and out[2]["lm_score"] is None
    _no_python_eval(bigram_lm_score(df))


# ------------------------------------------------- terms aggregation
def test_terms_aggregation_over_index(spark, built_index):
    from quickwit_spark.operators.aggregations import run_aggregations
    from quickwit_spark.operators.search import SearchRequest

    out = run_aggregations(
        spark,
        built_index,
        SearchRequest(query="the"),
        {
            "langs": {
                "terms": {"field": "lang", "size": 2},
                "aggs": {"avg_len": {"avg": {"field": "len_text"}}},
            }
        },
    )
    buckets = out["langs"]["buckets"]
    assert 1 <= len(buckets) <= 2
    # ordered by doc_count desc
    counts = [b["doc_count"] for b in buckets]
    assert counts == sorted(counts, reverse=True)
    assert all(b["avg_len"]["value"] > 0 for b in buckets)
    total_matching = out["langs"]["sum_other_doc_count"] + sum(counts)
    assert total_matching >= sum(counts)
    assert out["langs"]["doc_count_error_upper_bound"] == 0


def test_terms_buckets_tie_break_key_asc(spark):
    df = spark.createDataFrame(
        [(i, l) for i, l in enumerate(["b", "b", "a", "a", "c"])],
        "doc_id long, lang string",
    )
    from quickwit_spark.operators.aggregations import terms_buckets

    rows = terms_buckets(df, "lang", size=2).collect()
    assert [(r["key"], r["doc_count"]) for r in rows] == [("a", 2), ("b", 2)]


# ------------------------------------------------- domain blocklist
def test_blocklist_filter_label_boundary_and_longest_match(spark):
    from quickwit_spark.functions.urlnorm import blocklist_filter

    rows = [
        (1, "http://WWW.Spam.com:80/x"),   # canon host == entry
        (2, "https://cdn.spam.com/y"),     # matches both entries
        (3, "http://notspam.com/z"),       # suffix but NOT on a label boundary
        (4, "http://a.cdn.spam.com/w"),    # deeper subdomain
        (5, "http://ok.org/"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = blocklist_filter(df, ["spam.com", "cdn.spam.com"])
    got = {
        r["doc_id"]: (r["host"], r["matched_domain"], r["blocked"])
        for r in out.collect()
    }
    assert got == {
        1: ("spam.com", "spam.com", True),
        # longest (most specific) entry wins when several match
        2: ("cdn.spam.com", "cdn.spam.com", True),
        3: ("notspam.com", None, False),
        4: ("a.cdn.spam.com", "cdn.spam.com", True),
        5: ("ok.org", None, False),
    }
    # the blocklist probe must be a broadcast HASH join (equi-join on
    # exploded label suffixes), never a nested-loop over the blocklist
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    _no_python_eval(out)


def test_blocklist_filter_accepts_dataframe_blocklist(spark):
    from quickwit_spark.functions.urlnorm import blocklist_filter

    df = spark.createDataFrame(
        [(1, "http://bad.net/a"), (2, "http://good.net/a")],
        "doc_id long, url string",
    )
    bdf = spark.createDataFrame([("bad.net",)], "domain string")
    got = {r["doc_id"]: r["blocked"] for r in blocklist_filter(df, bdf).collect()}
    assert got == {1: True, 2: False}


# ------------------------------------------------- cardinality agg
def test_cardinality_aggregation(spark, built_index):
    from quickwit_spark.operators.aggregations import run_aggregations
    from quickwit_spark.operators.search import SearchRequest

    out = run_aggregations(
        spark,
        built_index,
        SearchRequest(query="the"),
        {
            "n_langs": {"cardinality": {"field": "lang"}},
            "langs": {
                "terms": {"field": "lang", "size": 2},
                # per-bucket distinct count of the bucket key itself
                # must be exactly 1 — pins distinct-agg x groupingSets
                "aggs": {"nl": {"cardinality": {"field": "lang"}}},
            },
        },
    )
    assert out["n_langs"]["value"] >= 1
    for b in out["langs"]["buckets"]:
        assert b["nl"]["value"] == 1


def test_cardinality_exact_vs_approx(spark):
    from quickwit_spark.operators.aggregations import _metric_cols

    df = spark.createDataFrame(
        [(i, f"v{i % 37}") for i in range(1000)], "id long, val string"
    )
    exact = df.agg(
        *_metric_cols("c", {"cardinality": {"field": "val"}})
    ).collect()[0]["c::cardinality"]
    assert exact == 37
    approx = df.agg(
        *_metric_cols("c", {"cardinality": {"field": "val", "approx": True}})
    ).collect()[0]["c::cardinality"]
    # HLL++ at default rsd is exact-ish at this cardinality
    assert abs(approx - 37) <= 4


# ------------------------------------------------- date_histogram
def test_parse_fixed_interval():
    from quickwit_spark.operators.aggregations import _parse_fixed_interval

    assert _parse_fixed_interval("500ms") == 500_000
    assert _parse_fixed_interval("30s") == 30_000_000
    assert _parse_fixed_interval("5m") == 300_000_000
    assert _parse_fixed_interval("1h") == 3_600_000_000
    assert _parse_fixed_interval("7d") == 7 * 86_400_000_000
    assert _parse_fixed_interval(2) == 2_000_000
    with pytest.raises(ValueError):
        _parse_fixed_interval("1w")
    with pytest.raises(ValueError):
        _parse_fixed_interval("0s")


def test_date_histogram_buckets_hand_computed(spark):
    from datetime import datetime

    from quickwit_spark.operators.aggregations import date_histogram_buckets

    rows = [
        (1, datetime(2021, 3, 1, 10, 5)),
        (2, datetime(2021, 3, 1, 10, 59)),
        (3, datetime(2021, 3, 1, 11, 0)),
        (4, datetime(2021, 3, 1, 13, 30)),
        (5, None),  # null ts -> no bucket (ES semantics)
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    out = date_histogram_buckets(
        df, "ts", "1h", sub_cols=[F.min("id").alias("min_id")]
    ).orderBy("bucket_us").collect()
    h = 3_600_000_000

    def us(*a):
        from datetime import timezone
        return int(datetime(*a, tzinfo=timezone.utc).timestamp() * 1_000_000)

    assert [(r["bucket_us"], r["doc_count"], r["min_id"]) for r in out] == [
        (us(2021, 3, 1, 10), 2, 1),
        (us(2021, 3, 1, 11), 1, 3),
        (us(2021, 3, 1, 13), 1, 4),
    ]
    assert all(r["bucket_us"] % h == 0 for r in out)
    _no_python_eval(date_histogram_buckets(df, "ts", "1h"))


def test_date_histogram_via_run_aggregations(spark, built_index):
    from quickwit_spark.operators.aggregations import run_aggregations
    from quickwit_spark.operators.search import SearchRequest

    out = run_aggregations(
        spark,
        built_index,
        SearchRequest(query="the"),
        {
            "per_day": {
                "date_histogram": {
                    "field": "warc_ts", "fixed_interval": "1d",
                },
                "aggs": {"n_langs": {"cardinality": {"field": "lang"}}},
            }
        },
    )
    buckets = out["per_day"]["buckets"]
    assert buckets, "matching docs must land in at least one bucket"
    keys = [b["key"] for b in buckets]
    assert keys == sorted(keys)
    assert all(k % 86_400_000 == 0 for k in keys)  # epoch-millis, day-aligned
    assert all(b["key_as_string"].endswith("T00:00:00.000Z") for b in buckets)
    assert all(b["n_langs"]["value"] >= 1 for b in buckets)


# ------------------------------------------------- percentiles
def test_percentiles_metric_hand_computed(spark):
    from quickwit_spark.operators.aggregations import (
        _metric_cols,
        _metric_result,
    )

    df = spark.createDataFrame([(v,) for v in (10, 20, 30, 40, 50)], "x long")
    spec = {"percentiles": {"field": "x", "percents": [0, 25, 50, 75, 100]}}
    row = df.agg(*_metric_cols("p", spec)).collect()[0]
    assert _metric_result("p", spec, row) == {
        "values": {"0.0": 10.0, "25.0": 20.0, "50.0": 30.0,
                   "75.0": 40.0, "100.0": 50.0}
    }
    # linear interpolation between closest ranks: p10 -> rank 0.4
    spec = {"percentiles": {"field": "x", "percents": [10]}}
    row = df.agg(*_metric_cols("p", spec)).collect()[0]
    assert _metric_result("p", spec, row) == {"values": {"10.0": 14.0}}
    # approx path returns a value in range; bad percents raise
    spec = {"percentiles": {"field": "x", "approx": True}}
    vals = df.agg(*_metric_cols("p", spec)).collect()[0]["p::percentiles"]
    assert len(vals) == 7 and all(10 <= v <= 50 for v in vals)
    with pytest.raises(ValueError):
        _metric_cols("p", {"percentiles": {"field": "x", "percents": [101]}})


def test_percentiles_via_run_aggregations(spark, built_index):
    """percentiles composes with the fused grouping-sets pass, both
    globally and as a sub-metric of a bucket agg."""
    from quickwit_spark.operators.aggregations import run_aggregations
    from quickwit_spark.operators.search import SearchRequest

    out = run_aggregations(
        spark,
        built_index,
        SearchRequest(query="the"),
        {
            "len_pcts": {
                "percentiles": {"field": "len_text",
                                "percents": [0, 50, 100]},
            },
            "by_lang": {
                "terms": {"field": "lang", "size": 3},
                "aggs": {"p50": {"percentiles": {
                    "field": "len_text", "percents": [50]}}},
            },
        },
    )
    g = out["len_pcts"]["values"]
    assert g["0.0"] <= g["50.0"] <= g["100.0"]
    for b in out["by_lang"]["buckets"]:
        assert g["0.0"] <= b["p50"]["values"]["50.0"] <= g["100.0"]


# ------------------------------------------------- extended_stats / missing
def test_extended_stats_hand_computed(spark):
    from quickwit_spark.operators.aggregations import (
        _metric_cols,
        _metric_result,
    )

    # mean 5, population variance 4, std 2 (classic hand example)
    vals = [2, 4, 4, 4, 5, 5, 7, 9, None]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    spec = {"extended_stats": {"field": "x"}}
    row = df.agg(*_metric_cols("e", spec)).collect()[0]
    out = _metric_result("e", spec, row)
    assert out["count"] == 8
    assert out["min"] == 2 and out["max"] == 9
    assert out["sum"] == 40 and out["avg"] == 5.0
    assert out["sum_of_squares"] == 232  # integer-exact on a long field
    assert out["variance"] == 4.0 and out["std_deviation"] == 2.0
    assert out["std_deviation_bounds"] == {"upper": 9.0, "lower": 1.0}
    # sigma knob
    spec = {"extended_stats": {"field": "x", "sigma": 3}}
    out = _metric_result("e", spec, row)
    assert out["std_deviation_bounds"] == {"upper": 11.0, "lower": -1.0}


def test_missing_metric_hand_computed(spark):
    from quickwit_spark.operators.aggregations import (
        _metric_cols,
        _metric_result,
    )

    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, None), (4, 40)], "id long, x long"
    )
    spec = {"missing": {"field": "x"}}
    row = df.agg(*_metric_cols("m", spec)).collect()[0]
    assert _metric_result("m", spec, row) == {"doc_count": 2}


def test_extended_stats_missing_via_run_aggregations(spark, built_index):
    """extended_stats + missing compose with the fused grouping-sets
    pass, globally and as bucket sub-metrics, in ONE request."""
    from quickwit_spark.operators.aggregations import run_aggregations
    from quickwit_spark.operators.search import SearchRequest

    out = run_aggregations(
        spark,
        built_index,
        SearchRequest(query="the"),
        {
            "len_ext": {"extended_stats": {"field": "len_text"}},
            "no_len": {"missing": {"field": "len_text"}},
            "by_lang": {
                "terms": {"field": "lang", "size": 3},
                "aggs": {
                    "ext": {"extended_stats": {"field": "len_text"}},
                    "miss": {"missing": {"field": "len_text"}},
                },
            },
        },
    )
    g = out["len_ext"]
    assert g["count"] > 0
    assert g["min"] <= g["avg"] <= g["max"]
    assert g["variance"] >= 0 and g["std_deviation"] >= 0
    assert g["std_deviation_bounds"]["lower"] <= g["avg"]
    assert g["std_deviation_bounds"]["upper"] >= g["avg"]
    # len_text is always present in the corpus fixture
    assert out["no_len"] == {"doc_count": 0}
    total = 0
    for b in out["by_lang"]["buckets"]:
        e = b["ext"]
        assert e["count"] == b["doc_count"] - b["miss"]["doc_count"]
        assert e["min"] <= e["avg"] <= e["max"]
        total += b["doc_count"]
    assert total <= g["count"] + out["no_len"]["doc_count"] + out[
        "by_lang"]["sum_other_doc_count"]


def test_winnow_fingerprints_shared_run_guarantee(spark):
    """Winnowing guarantee: docs sharing a run of >= k+w-1 tokens share
    at least one fingerprint; disjoint docs share none (hash collisions
    aside); short docs fall back to all gram hashes."""
    from quickwit_spark.functions.textstats import winnow_fingerprints

    shared = " ".join(f"s{i}" for i in range(12))  # > k+w-1 = 8 tokens
    rows = [
        (0, "aa bb cc dd " + shared + " ee ff"),
        (1, shared + " gg hh ii jj kk"),
        (2, "totally different words here only now then"),
        (3, "tiny doc five words ok"),       # 5 toks -> 1 gram, < w
        (4, "four tokens only here"),        # < k -> no rows
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = winnow_fingerprints(df, k=5, w=4)
    fps = {}
    for r in out.collect():
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert fps[0] & fps[1]            # shared run -> shared fingerprint
    assert not (fps[0] & fps[2])
    assert len(fps.get(3, set())) == 1  # the single gram hash
    assert 4 not in fps
    # deterministic
    again = {}
    for r in winnow_fingerprints(df, k=5, w=4).collect():
        again.setdefault(r["doc_id"], set()).add(r["fp"])
    assert again == fps


def test_top_ngrams_counts_ties_and_group_limit_plan(spark):
    from quickwit_spark.functions.textstats import top_ngrams

    rows = [
        (0, "en", "the cat sat on the cat mat"),
        (1, "en", "the cat ran. The Cat!"),     # case/punct-folded
        (2, "de", "der hund der hund lief"),
        (3, "de", ""),                          # empty doc contributes nothing
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = top_ngrams(df, n=2, k=3, group_col="lang")
    got = {(r["grp"], r["ngram"]): (r["n_occurrences"], r["rank"])
           for r in out.collect()}
    # "the cat" appears 4x across en docs (case-folded); ties on count
    # break toward the lexicographically smaller ngram
    assert got[("en", "the cat")] == (4, 1)
    assert got[("de", "der hund")] == (2, 1)
    assert got[("de", "hund der")][0] == 1
    en = sorted((v[1], k[1]) for k, v in got.items() if k[0] == "en")
    assert [r for r, _ in en] == [1, 2, 3]       # exactly k=3 rows for en
    # the rank<=k filter must become a pre-shuffle group limit so map
    # tasks never exchange the full distinct-ngram tail
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
    # ungrouped mode: one global table with constant grp
    g = top_ngrams(df, n=1, k=2)
    rows1 = sorted(g.collect(), key=lambda r: r["rank"])
    assert all(r["grp"] == "" for r in rows1) and len(rows1) == 2
    # "cat" and "the" tie at 4 occurrences; "cat" wins lexicographically
    assert rows1[0]["ngram"] == "cat" and rows1[0]["n_occurrences"] == 4
    assert rows1[1]["ngram"] == "the" and rows1[1]["n_occurrences"] == 4


def test_perplexity_buckets_quartiles_and_plan(spark):
    from quickwit_spark.functions.lmquality import perplexity_buckets

    rng_words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    rows = []
    for d in range(24):
        # vary fluency: low-d docs repeat a common bigram (high score),
        # high-d docs use rarer transitions
        w = [rng_words[(d * (i + 1) + i * i) % len(rng_words)] for i in range(10)]
        rows.append((d, "en", " ".join(w)))
    rows.append((24, "en", "solo"))          # < 2 tokens -> NULL score
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = perplexity_buckets(df)
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[24]["bucket"] == "tail" and got[24]["n_bigrams"] == 0
    counts = {"head": 0, "middle": 0, "tail": 0}
    for r in got.values():
        counts[r["bucket"]] += 1
    # quartile cutoffs: every bucket is populated (ties can skew the
    # split, so only existence + ordering invariants are exact)
    assert counts["head"] >= 1 and counts["middle"] >= 1
    assert counts["tail"] >= 1
    # every scored doc in head has score >= every doc in middle/tail
    head_min = min(r["lm_score"] for r in got.values() if r["bucket"] == "head")
    rest_max = max(
        (r["lm_score"] for r in got.values()
         if r["bucket"] != "head" and r["lm_score"] is not None),
        default=float("-inf"),
    )
    assert head_min >= rest_max
    # scale contract: bucketing is cutoff-join + compare, never a
    # corpus-wide rank window
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowExec" not in plan and "RunningWindow" not in plan, plan


def test_fix_text_pipeline_semantics(spark):
    from quickwit_spark.functions.textfix import fix_text

    rows = [
        (0, "a​b c “q” – d…"),
        (1, "bell\x07 and\ttabs  here"),
        (2, "  lead \n  mid  \n\n\n\n trail  "),
        (3, "‘s’‍ ok"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in fix_text(df).collect()}
    assert out[0]["clean_text"] == 'ab c "q" - d...'
    assert out[0]["n_dropped"] == 1                       # the zwsp
    assert out[1]["clean_text"] == "bell and tabs here"
    assert out[1]["n_dropped"] == 1                       # the bell
    assert out[2]["clean_text"] == "lead\nmid\n\ntrail"
    assert out[3]["clean_text"] == "'s' ok"
    assert out[4]["clean_text"] == "" and out[4]["orig_len"] == 0
    for r in out.values():
        assert r["clean_len"] == len(r["clean_text"])

    # idempotence: fixing fixed text is a no-op
    again = fix_text(
        fix_text(df).select("doc_id", F.col("clean_text").alias("text"))
    )
    assert {r["doc_id"]: r["clean_text"] for r in again.collect()} == {
        k: v["clean_text"] for k, v in out.items()
    }

    # scale contract: one shuffle-free codegen projection, no Python
    plan = fix_text(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_significant_terms_ranking_and_plan(spark):
    from quickwit_spark.functions.significant import significant_terms

    rows = [
        (0, True,  "spam casino bonus click now"),
        (1, True,  "casino bonus free spins"),
        (2, True,  "casino night spam offer"),
        (3, False, "weather report for the city"),
        (4, False, "city council meeting report"),
        (5, False, "casino review in the news"),   # bg mention too
    ]
    df = spark.createDataFrame(rows, "doc_id long, fg boolean, text string")
    out = significant_terms(df, F.col("fg"), k=4)
    got = [(r["term"], r["fg_count"], r["bg_count"], r["rank"])
           for r in sorted(out.collect(), key=lambda r: r["rank"])]
    # fg-only terms with fg_count 2 (bonus, spam) outrank casino
    # (3 fg but 1 bg -> 3/2) and every 1-count term; ties break
    # lexicographically
    assert got[0] == ("bonus", 2, 0, 1)
    assert got[1] == ("spam", 2, 0, 2)
    assert got[2] == ("casino", 3, 1, 3)
    assert len(got) == 4 and got[3][1] == 1
    row = out.collect()[0]
    assert row["fg_total"] == 3 and row["bg_total"] == 3
    # background-only terms never appear
    terms = {t for t, *_ in got}
    assert "weather" not in terms
    # the rank filter must become a bounded pre-window rewrite: either
    # WindowGroupLimit, or (for this empty partition spec) a
    # LocalLimit/GlobalLimit top-k sort pushed beneath the window —
    # both cap what each map task contributes to the final sort
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "WindowGroupLimit" in plan or "LocalLimit" in plan, plan


def test_tfidf_keywords_ranking(spark):
    from quickwit_spark.functions.textstats import tfidf_keywords

    rows = [
        (0, "zebra zebra zebra common common word"),
        (1, "common word here also"),
        (2, "common word again today"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tfidf_keywords(df, k=2)
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], []).append(
            (r["rank"], r["term"], r["tf"], r["df"])
        )
    for v in got.values():
        v.sort()
    # doc 0: 'zebra' (tf=3, df=1) dominates; 'common' (df=3) scores 0
    # since ln(4/3) ~ 0.288 < zebra's 3*ln(4) — and rare beats common
    assert got[0][0][1] == "zebra"
    # 'common' appears in 3 of 4 docs: idf ln(4/3) > 0 so still ranked
    assert len(got[0]) == 2
    # empty doc contributes no rows but N counts it (df=3 not 4)
    assert 3 not in got
    assert all(t[3] <= 3 for v in got.values() for t in v)
    # k larger than vocabulary: every doc keeps all its terms
    allk = tfidf_keywords(df, k=100)
    assert allk.filter("doc_id = 1").count() == 4
    # group-limited rank: no full-vocab exchange
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "WindowGroupLimit" in plan or "LocalLimit" in plan, plan
