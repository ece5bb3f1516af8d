"""End-to-end parity with the REFERENCE'S OWN golden fixtures.

The reference validates its CLI/search stack against two tiny verbatim
corpora; this file runs the same docs, the same queries, and asserts
the same outputs through this engine:

- logs corpus: quickwit-cli/tests/helpers.rs:80-84 (LOGS_JSON_DOCS),
  search goldens quickwit-cli/tests/cli.rs:305-360 (numHits per
  query), aggregation golden quickwit-cli/tests/cli.rs:217-299
  (range buckets on ts + nested avg — exact response JSON).
- wiki corpus: quickwit-search/src/lib.rs:229-268
  (test_single_node_simple): query "anthropomorphic" over body →
  num_hits == 1 and the hit materializes the snoopy doc's fields.
"""

from __future__ import annotations

import json

import pytest

from quickwit_spark.operators.aggregations import run_aggregations
from quickwit_spark.operators.build import build_index
from quickwit_spark.operators.search import (
    SearchRequest,
    count_hits,
    fetch_docs,
    search_df,
)
from quickwit_spark.plans.config import FieldConfig, IndexConfig

# helpers.rs:80-84, verbatim
LOGS_DOCS = [
    {"event": "foo", "level": "info", "ts": 2, "device": "rpi", "city": "tokio"},
    {"event": "bar", "level": "error", "ts": 3, "device": "rpi", "city": "paris"},
    {"event": "baz", "level": "warning", "ts": 9, "device": "fbit", "city": "london"},
    {"event": "buz", "level": "debug", "ts": 12, "device": "rpi", "city": "paris"},
    {"event": "biz", "level": "info", "ts": 13, "device": "fbit", "city": "paris"},
]

LOGS_CONFIG = IndexConfig(
    fields=(
        FieldConfig("event", tokenizer="default", record="position"),
        FieldConfig("level", tokenizer="raw"),
        FieldConfig("city", tokenizer="raw"),
        FieldConfig("device", tokenizer="raw"),
    ),
    key_field="key",
    default_search_fields=("event",),
    tag_fields=("city", "device"),
    # reference: ts is i64 fast:true (index-config.md:23-65)
    fast_fields=("ts",),
)


@pytest.fixture(scope="module")
def logs_index(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("logs_golden"))
    rows = [
        {**d, "key": f"doc{d['ts']:02d}", "ts": int(d["ts"])}
        for d in LOGS_DOCS
    ]
    df = spark.createDataFrame(
        rows,
        "event string, level string, ts long, device string, "
        "city string, key string",
    )
    build_index(spark, df, idx, LOGS_CONFIG, num_splits=2)
    return idx


@pytest.mark.parametrize(
    "query,expected",
    [
        # cli.rs:312-326: `--query level:info` → numHits == 2
        ("level:info", 2),
        # cli.rs:328-344: `+level:info +city:paris` → numHits == 1
        ("+level:info +city:paris", 1),
        # cli.rs:346-360: `level:info AND city:conakry` → numHits == 0
        ("level:info AND city:conakry", 0),
    ],
)
def test_logs_num_hits_goldens(spark, logs_index, query, expected):
    assert count_hits(spark, logs_index, SearchRequest(query=query)) == expected


def test_logs_aggregation_golden(spark, logs_index):
    """cli.rs:217-299 verbatim: query `paris OR tokio OR london` scoped
    to `city`, range buckets on ts with a nested avg — the asserted
    response JSON is the reference's own expected value."""
    aggs = {
        "range_buckets": {
            "range": {
                "field": "ts",
                "ranges": [
                    {"to": 2.0},
                    {"from": 2.0, "to": 5.0},
                    {"from": 5.0, "to": 9.0},
                    {"from": 9.0},
                ],
            },
            "aggs": {"average_ts": {"avg": {"field": "ts"}}},
        }
    }
    req = SearchRequest(
        query="paris OR tokio OR london", search_fields=("city",)
    )
    out = run_aggregations(spark, logs_index, req, aggs)
    assert out == {
        "range_buckets": {
            "buckets": [
                {
                    "doc_count": 0,
                    "key": "*-2",
                    "average_ts": {"value": None},
                    "to": 2.0,
                },
                {
                    "doc_count": 2,
                    "from": 2.0,
                    "key": "2-5",
                    "average_ts": {"value": 2.5},
                    "to": 5.0,
                },
                {
                    "doc_count": 0,
                    "from": 5.0,
                    "key": "5-9",
                    "average_ts": {"value": None},
                    "to": 9.0,
                },
                {
                    "doc_count": 3,
                    "from": 9.0,
                    "key": "9-*",
                    "average_ts": {"value": 11.333333333333334},
                },
            ]
        }
    }


# lib.rs:241-245, verbatim
WIKI_DOCS = [
    {
        "title": "snoopy",
        "body": "Snoopy is an anthropomorphic beagle[5] in the comic strip...",
        "url": "http://snoopy",
    },
    {
        "title": "beagle",
        "body": "The beagle is a breed of small scent hound, similar in "
        "appearance to the much larger foxhound.",
        "url": "http://beagle",
    },
]

WIKI_CONFIG = IndexConfig(
    fields=(
        FieldConfig("title", tokenizer="default"),
        FieldConfig("body", tokenizer="default", record="position"),
    ),
    key_field="url",
    default_search_fields=("body",),
    # the reference materializes the hit from the stored doc
    store_source=True,
)


def test_wiki_single_node_simple_golden(spark, tmp_path_factory):
    """lib.rs:229-268: 'anthropomorphic' over body → exactly one hit,
    materializing the snoopy doc's fields."""
    idx = str(tmp_path_factory.mktemp("wiki_golden"))
    df = spark.createDataFrame(
        WIKI_DOCS, "title string, body string, url string"
    )
    build_index(spark, df, idx, WIKI_CONFIG, num_splits=1)

    req = SearchRequest(query="anthropomorphic", k=2)
    assert count_hits(spark, idx, req) == 1
    hits = search_df(spark, idx, req)
    rows = fetch_docs(spark, idx, hits, columns=["_source"]).collect()
    assert len(rows) == 1
    doc = json.loads(rows[0]["_source"])
    assert doc["title"] == "snoopy"
    assert doc["body"] == WIKI_DOCS[0]["body"]
    assert doc["url"] == "http://snoopy"
