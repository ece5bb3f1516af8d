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
    with pytest.raises(KeyError):
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
