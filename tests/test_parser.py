import pytest

from quickwit_spark.plans.config import webpages_config
from quickwit_spark.plans.parser import (
    Bool,
    MatchNone,
    PhraseQ,
    QueryParseError,
    TermQ,
    parse_query,
    query_terms,
    resolve_query,
)

CFG = webpages_config()


def rq(q, fields=None):
    return resolve_query(parse_query(q), CFG, fields)


def test_single_term_default_field():
    assert rq("Hello") == TermQ("text", "hello")


def test_conjunction_by_default():
    node = rq("hello world")
    assert isinstance(node, Bool)
    assert node.must == [TermQ("text", "hello"), TermQ("text", "world")]
    assert not node.should and not node.must_not


def test_explicit_and_or_precedence():
    node = rq("a OR b c")
    assert isinstance(node, Bool) and len(node.should) == 2
    right = node.should[1]
    assert isinstance(right, Bool) and right.must == [
        TermQ("text", "b"),
        TermQ("text", "c"),
    ]


def test_not_and_minus():
    for q in ("hello NOT world", "hello -world"):
        node = rq(q)
        assert node.must == [TermQ("text", "hello")]
        assert node.must_not == [TermQ("text", "world")]


def test_field_scoped_and_phrase():
    assert rq("lang:en") == TermQ("lang", "en")
    node = rq('"hello world"')
    assert node == PhraseQ("text", ("hello", "world"))
    node = rq('text:"big fast table"')
    assert node == PhraseQ("text", ("big", "fast", "table"))


def test_multi_token_word_becomes_phrase():
    # analyzer splits qw_marker_3 -> phrase (tantivy query-parser rule)
    node = rq("qw_marker_3")
    assert node == PhraseQ("text", ("qw", "marker", "3"))


def test_raw_tokenizer_keeps_value():
    assert rq("lang:EN") == TermQ("lang", "EN")


def test_range_rejected():
    for q in ("ts:[1 TO 5]", "foo [a TO b]", "x:{1 TO 2}"):
        with pytest.raises(QueryParseError, match="range"):
            rq(q)


def test_unknown_field_rejected():
    # a query error (ValueError → HTTP 400), not a bare KeyError —
    # query_builder.rs:73 maps FieldDoesNotExist into its parse error
    with pytest.raises(QueryParseError, match="nope"):
        rq("nope:foo")


def test_empty_and_unbalanced():
    with pytest.raises(QueryParseError):
        parse_query("")
    with pytest.raises(QueryParseError):
        rq("(a b")


def test_parens_grouping():
    node = rq("a (b OR c)")
    assert node.must[0] == TermQ("text", "a")
    assert isinstance(node.must[1], Bool) and len(node.must[1].should) == 2


def test_query_terms_collects_phrase_terms():
    terms = query_terms(rq('a "b c" -d'))
    assert terms == {
        TermQ("text", "a"),
        TermQ("text", "b"),
        TermQ("text", "c"),
        TermQ("text", "d"),
    }


def test_stopword_free_empty_token_matchnone():
    assert isinstance(rq("!!!"), MatchNone) or rq("!!!") == MatchNone()


# ------------------------------------------------------------------
# Golden parity table with the reference's query-builder test suite
# (quickwit-doc-mapper/src/query_builder.rs:154-204): same schema
# (title, desc, server.name, server.mem, _source — all TEXT, so
# positions recorded), same queries, same expected outcome class.
# ------------------------------------------------------------------
from quickwit_spark.plans.config import FieldConfig, IndexConfig

_QB_CFG = IndexConfig(
    fields=tuple(
        FieldConfig(name=n, tokenizer="default", record="position")
        for n in ("title", "desc", "server.name", "server.mem", "_source")
    ),
    key_field="title",
    default_search_fields=("title", "desc"),
)


def _qb_leaves(node):
    return {(t.field, t.term) for t in query_terms(node)}


@pytest.mark.parametrize(
    "query,fields,err_substr",
    [
        # query_builder.rs:168-172 — bracket range clause rejected
        ("title:[a TO b]", None, "range"),
        # query_builder.rs:173-177 — curly range anywhere in the query
        ("title:{a TO b} desc:foo", None, "range"),
        # query_builder.rs:178-182 — comparison-operator range form
        ("title:>foo", None, "range"),
        # query_builder.rs:188-192 — explicit search_fields resolved
        # upfront: unknown 'url' errors even though every clause is
        # field-scoped ("Field does not exists: 'url'")
        ("title:foo desc:bar", ("url",), "url"),
    ],
)
def test_query_builder_parity_errors(query, fields, err_substr):
    with pytest.raises(QueryParseError, match=err_substr):
        resolve_query(parse_query(query), _QB_CFG, fields)


@pytest.mark.parametrize(
    "query,fields,expected_leaves",
    [
        # query_builder.rs:183-187 — TermQuery over explicit fields,
        # including the reserved-looking `_source`
        (
            "title:foo desc:bar _source:baz",
            None,
            {("title", "foo"), ("desc", "bar"), ("_source", "baz")},
        ),
        # query_builder.rs:193-197 — quoted term that LOOKS like a
        # field-scoped clause stays one token of server.name
        (
            'server.name:".bar:" server.mem:4GB',
            ("server.name",),
            {("server.name", "bar"), ("server.mem", "4gb")},
        ),
        # query_builder.rs:198-202 — multi-token quoted value becomes
        # a phrase on the dotted field
        (
            'server.name:"for.bar:b" server.mem:4GB',
            None,
            {
                ("server.name", "for"),
                ("server.name", "bar"),
                ("server.name", "b"),
                ("server.mem", "4gb"),
            },
        ),
    ],
)
def test_query_builder_parity_ok(query, fields, expected_leaves):
    node = resolve_query(parse_query(query), _QB_CFG, fields)
    assert _qb_leaves(node) == expected_leaves


def test_query_builder_parity_phrase_shape():
    # the rs:198 case must resolve the quoted value to a PhraseQ (the
    # reference's parse debug contains "TermQuery" leaves of a phrase)
    node = resolve_query(
        parse_query('server.name:"for.bar:b" server.mem:4GB'), _QB_CFG, None
    )
    assert isinstance(node, Bool)
    kinds = {type(c) for c in node.must}
    assert PhraseQ in kinds and TermQ in kinds
