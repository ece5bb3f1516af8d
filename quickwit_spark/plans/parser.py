"""Query mini-language parser.

Re-implements (from the documented grammar, not the code) the query
surface the reference exposes (docs/reference/query-language.md:8-42,
quickwit-search/src/query_builder.rs:29-66):

- bare terms, ``"phrases"``, ``field:term``, ``field:"phrase"``
- ``AND`` / ``OR`` / ``NOT`` / ``+must`` / ``-mustnot`` / parens
- **conjunction by default** (query_builder.rs:48
  ``set_conjunction_by_default``): adjacent clauses are AND-ed
- **range clauses are rejected** (query_builder.rs:36-39) — parity
  means we reject them too
- a single word that the field's analyzer splits into multiple tokens
  becomes a phrase query (tantivy query-parser behavior); phrase
  queries require ``record: position`` on the field

Output is a small boolean AST (:class:`Bool` of must / must_not /
should over :class:`TermQ` / :class:`PhraseQ` leaves) that the
evaluator consumes; leaf terms are analyzed with the target field's
own tokenizer at resolve time.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field

from quickwit_spark.operators.analysis import tokenize
from quickwit_spark.plans.config import IndexConfig, RECORD_POSITION


class QueryParseError(ValueError):
    pass


# ---------------------------------------------------------------- AST
@dataclass(frozen=True)
class TermQ:
    field: str
    term: str


@dataclass(frozen=True)
class PhraseQ:
    field: str
    terms: tuple[str, ...]


@dataclass
class Bool:
    must: list = dc_field(default_factory=list)
    must_not: list = dc_field(default_factory=list)
    should: list = dc_field(default_factory=list)

    def is_empty(self) -> bool:
        return not (self.must or self.must_not or self.should)


@dataclass(frozen=True)
class MatchNone:
    """A clause whose analyzed token list is empty (tantivy
    EmptyQuery): matches no document."""


# -------------------------------------------------------------- lexer
_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<plus>\+)
  | (?P<minus>-)
  | (?P<quoted>"(?:\\.|[^"\\])*")
  | (?P<range_open>[\[{])
  | (?P<range_close>[\]}])
  | (?P<word>[^\s()"\[\]{}]+)
    """,
    re.VERBOSE,
)


def _lex(q: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    pos = 0
    while pos < len(q):
        m = _TOKEN_RE.match(q, pos)
        if not m:
            raise QueryParseError(f"cannot lex query at offset {pos}: {q[pos:]!r}")
        kind = m.lastgroup
        if kind in ("range_open", "range_close"):
            raise QueryParseError(
                "range queries are not supported"
            )  # parity: query_builder.rs:36-39
        if kind != "ws":
            out.append((kind, m.group()))
        pos = m.end()
    return out


# ------------------------------------------------------------- parser
@dataclass(frozen=True)
class _RawLeaf:
    field: str | None
    text: str
    is_phrase: bool


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.tokens = tokens
        self.i = 0

    def peek(self) -> tuple[str, str] | None:
        return self.tokens[self.i] if self.i < len(self.tokens) else None

    def next(self) -> tuple[str, str]:
        t = self.peek()
        if t is None:
            raise QueryParseError("unexpected end of query")
        self.i += 1
        return t

    def parse(self):
        node = self.parse_or()
        if self.peek() is not None:
            raise QueryParseError(f"trailing input: {self.peek()[1]!r}")
        return node

    def parse_or(self):
        clauses = [self.parse_and()]
        while self.peek() and self.peek()[0] == "word" and self.peek()[1] == "OR":
            self.next()
            clauses.append(self.parse_and())
        if len(clauses) == 1:
            return clauses[0]
        return Bool(should=clauses)

    def parse_and(self):
        out = Bool()
        first = True
        while True:
            t = self.peek()
            if t is None or t[0] == "rparen" or (t[0] == "word" and t[1] == "OR"):
                break
            if t[0] == "word" and t[1] == "AND":
                if first:
                    raise QueryParseError("AND without left operand")
                self.next()
                continue
            occur = "must"  # conjunction by default
            if t[0] == "plus":
                self.next()
                occur = "must"
            elif t[0] == "minus":
                self.next()
                occur = "must_not"
            elif t[0] == "word" and t[1] == "NOT":
                self.next()
                occur = "must_not"
            atom = self.parse_atom()
            getattr(out, occur).append(atom)
            first = False
        if out.is_empty():
            raise QueryParseError("empty clause")
        if not out.must and not out.should and out.must_not:
            # pure negation has no matching docs scope; reference
            # treats it as filter over all docs — we model as
            # must=[MatchAll] is unsupported; keep as-is, evaluator
            # handles must_not-only by matching nothing.
            pass
        if len(out.must) == 1 and not out.must_not and not out.should:
            return out.must[0]
        return out

    def parse_atom(self):
        kind, text = self.next()
        if kind == "lparen":
            inner = self.parse_or()
            if self.peek() is None or self.peek()[0] != "rparen":
                raise QueryParseError("unbalanced parenthesis")
            self.next()
            return inner
        if kind == "quoted":
            return _RawLeaf(None, _unquote(text), True)
        if kind == "word":
            if ":" in text:
                fld, rest = text.split(":", 1)
                if rest.startswith('"'):
                    raise QueryParseError("unterminated phrase")
                if not rest:
                    # field:"phrase" — the quoted part lexed separately
                    nxt = self.peek()
                    if nxt and nxt[0] == "quoted":
                        self.next()
                        return _RawLeaf(fld, _unquote(nxt[1]), True)
                    raise QueryParseError(f"missing term after {fld}:")
                if re.match(r"^[<>]=?", rest):
                    raise QueryParseError("range queries are not supported")
                return _RawLeaf(fld, rest, False)
            return _RawLeaf(None, text, False)
        raise QueryParseError(f"unexpected token {text!r}")


def _unquote(s: str) -> str:
    body = s[1:-1]
    return re.sub(r"\\(.)", r"\1", body)


def parse_query(q: str) -> Bool | _RawLeaf:
    """Parse the raw query string to the unresolved AST."""
    tokens = _lex(q)
    if not tokens:
        raise QueryParseError("empty query")
    return _Parser(tokens).parse()


# ------------------------------------------------------- resolution
def _field_or_parse_error(config: IndexConfig, name: str):
    """Schema lookup surfaced as a query error (the reference maps
    FieldDoesNotExist into its QueryParserError, query_builder.rs:73;
    QueryParseError is a ValueError so serve.py returns 400, not
    500)."""
    try:
        return config.field(name)
    except KeyError:
        raise QueryParseError(f"field does not exist: {name!r}") from None


def resolve_query(
    node,
    config: IndexConfig,
    search_fields: tuple[str, ...] | None = None,
):
    """Bind default fields and analyze leaf text with each target
    field's tokenizer → executable AST of TermQ/PhraseQ/Bool.

    Mirrors default-field resolution (query_builder.rs:41-45,
    default_mapper.rs:102-112).
    """
    defaults = tuple(search_fields or config.default_search_fields)
    if not defaults:
        raise QueryParseError("no default search fields configured")
    # parity with query_builder.rs:41-45/68-77: the (explicit or
    # default) search-field list is resolved against the schema UP
    # FRONT — `title:foo` with search_fields=["url"] is an error even
    # though every leaf is field-scoped and the defaults go unused
    for f in defaults:
        _field_or_parse_error(config, f)

    def leaf_for_field(fld: str, raw: _RawLeaf):
        fc = _field_or_parse_error(config, fld)
        toks = tokenize(raw.text, fc.tokenizer)
        if not toks:
            return MatchNone()
        if raw.is_phrase or len(toks) > 1:
            if len(toks) == 1:
                return TermQ(fld, toks[0])
            if fc.record != RECORD_POSITION:
                raise QueryParseError(
                    f"phrase query on field {fld!r} requires record: position"
                )
            return PhraseQ(fld, tuple(toks))
        return TermQ(fld, toks[0])

    def resolve(n):
        if isinstance(n, _RawLeaf):
            fields = (n.field,) if n.field else defaults
            for f in fields:
                _field_or_parse_error(config, f)
            leaves = [leaf_for_field(f, n) for f in fields]
            if len(leaves) == 1:
                return leaves[0]
            return Bool(should=leaves)
        if isinstance(n, Bool):
            return Bool(
                must=[resolve(c) for c in n.must],
                must_not=[resolve(c) for c in n.must_not],
                should=[resolve(c) for c in n.should],
            )
        return n

    return resolve(node)


def query_terms(node) -> set[TermQ]:
    """All (field, term) leaves — drives warmup-style posting
    pruning (the analogue of leaf.rs:125-195 exact prefetch)."""
    out: set[TermQ] = set()

    def walk(n):
        if isinstance(n, TermQ):
            out.add(n)
        elif isinstance(n, PhraseQ):
            for t in n.terms:
                out.add(TermQ(n.field, t))
        elif isinstance(n, Bool):
            for c in n.must + n.must_not + n.should:
                walk(c)

    walk(node)
    return out
