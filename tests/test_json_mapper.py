"""doc_from_json on the reference's hdfs-logs-shaped corpus
(FIXTURES.md F2): nested paths flatten to dotted columns, undeclared
fields are ignored, bad JSON and missing required fields are counted
and dropped."""

from __future__ import annotations

import pytest

from quickwit_spark.sources.json_mapper import JsonField, doc_from_json

FIELDS = [
    JsonField("ts", type="i64", required=True),
    JsonField("severity_text", type="text"),
    JsonField("body", type="text"),
    JsonField("resource.service", type="text"),
    JsonField("attrs.code", type="u64"),
    JsonField("when", type="date"),
    JsonField("blob", type="bytes"),
    JsonField("tags", type="text", multi=True),
]

DOCS = [
    '{"ts": 2, "severity_text": "INFO", "body": "the turbo engine started",'
    ' "resource": {"service": "cloud_monitoring"}, "attrs": {"code": 200},'
    ' "when": "2021-03-01T00:00:02Z", "tags": ["a", "b"],'
    ' "blob": "aGVsbG8=", "undeclared_field": 42}',
    '{"ts": 3, "severity_text": "ERROR", "body": "the turbo engine failed",'
    ' "resource": {"service": "cloud_ingest"}, "attrs": {"code": -1}}',
    '{"ts": 9, "body": "nothing else"}',
    'this is not json at all {',
    '{"severity_text": "WARN", "body": "missing ts entirely"}',
]


@pytest.fixture(scope="module")
def parsed(spark):
    lines = spark.createDataFrame([(d,) for d in DOCS], "value string")
    docs, counters = doc_from_json(lines, FIELDS)
    return docs.collect(), counters


def test_counters(parsed):
    _, c = parsed
    assert c.valid == 3
    assert c.parse_errors == 1
    assert c.missing_required == 1


def test_flattened_columns_and_types(parsed):
    rows, _ = parsed
    by_ts = {r["ts"]: r for r in rows}
    assert set(by_ts) == {2, 3, 9}
    r2 = by_ts[2]
    assert r2["resource.service"] == "cloud_monitoring"
    assert r2["attrs.code"] == 200
    assert r2["blob"] == b"hello"
    assert r2["tags"] == ["a", "b"]
    assert r2["when"].year == 2021 and r2["when"].second == 2
    # undeclared fields are dropped by schema projection
    assert "undeclared_field" not in r2.asDict()


def test_null_and_guard_semantics(parsed):
    rows, _ = parsed
    by_ts = {r["ts"]: r for r in rows}
    # u64 guard: negative value → null (rejected, not erroring)
    assert by_ts[3]["attrs.code"] is None
    # missing optional nested leaf → null
    assert by_ts[9]["resource.service"] is None
    assert by_ts[9]["severity_text"] is None


def test_required_field_with_invalid_value_rejected(spark):
    """ADVICE r1: coercions apply before the required check — a
    required u64 with a negative value is a rejected doc, not a
    silently-nulled 'valid' one."""
    fields = [
        JsonField("uid", type="u64", required=True),
        JsonField("body", type="text"),
    ]
    lines = spark.createDataFrame(
        [('{"uid": 7, "body": "ok"}',), ('{"uid": -3, "body": "bad"}',)],
        "value string",
    )
    docs, c = doc_from_json(lines, fields)
    assert c.valid == 1 and c.missing_required == 1
    assert [r["uid"] for r in docs.collect()] == [7]


def test_keep_source_carries_raw_line(spark):
    """store_source parse side (default_mapper.rs:47,162-167): the
    valid docs carry the ORIGINAL json line verbatim as `_source`."""
    lines = spark.createDataFrame([(d,) for d in DOCS], "value string")
    docs, _ = doc_from_json(lines, FIELDS, keep_source=True)
    rows = docs.collect()
    assert "_source" in docs.columns
    by_ts = {r["ts"]: r for r in rows}
    assert by_ts[2]["_source"] == DOCS[0]  # byte-identical, not re-serialized
    assert by_ts[9]["_source"] == DOCS[2]
