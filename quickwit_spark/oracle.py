"""Naive single-node oracle: the golden-truth implementation.

Independent of the Spark engine's index structures: plain dict/loop
inverted index per split, same declared semantics (tokenizers, BM25
constants/quantization from the shared spec modules, split
assignment, tie-breaks). The build path and this oracle must agree
bit-for-bit on doc ids and (float32) scores — the test strategy the
reference itself uses (golden corpora + expected hits,
quickwit-cli/tests/cli.rs; SURVEY.md §5).

Canonical accumulation order (documented engine contract):
- a pure conjunction of term leaves sums per-term float32 scores in
  ascending (doc_freq, field, term) order;
- every other boolean combination sums in user clause order.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np

from quickwit_spark.operators import bm25
from quickwit_spark.operators.analysis import tokenize
from quickwit_spark.operators.fieldnorm import fieldnorm_to_id
from quickwit_spark.operators.xxhash import pmod_split
from quickwit_spark.plans.config import IndexConfig
from quickwit_spark.plans.parser import (
    Bool,
    MatchNone,
    PhraseQ,
    TermQ,
    parse_query,
    resolve_query,
)


class OracleSplit:
    def __init__(self) -> None:
        self.doc_keys: list[str] = []
        self.doc_ts: list[int] = []
        self.postings: dict[tuple[str, str], dict[int, list[int]]] = defaultdict(dict)
        self.doc_lens: dict[str, list[int]] = defaultdict(list)
        self.total_tokens: Counter = Counter()

    @property
    def num_docs(self) -> int:
        return len(self.doc_keys)


class OracleIndex:
    """Build + search, all in plain Python."""

    def __init__(self, rows: list[dict], config: IndexConfig, num_splits: int):
        self.config = config
        self.num_splits = num_splits
        self.splits: dict[int, OracleSplit] = defaultdict(OracleSplit)
        by_split: dict[int, list[dict]] = defaultdict(list)
        for row in rows:
            sid = pmod_split(str(row[config.key_field]), num_splits)
            by_split[sid].append(row)
        for sid, docs in by_split.items():
            if config.sort_by_field:
                # index sorting: doc ids follow (sort field, key);
                # nulls first, matching the engine's Window.orderBy
                docs.sort(
                    key=lambda r: (
                        r[config.sort_by_field] is not None,
                        r[config.sort_by_field]
                        if r[config.sort_by_field] is not None
                        else 0,
                        str(r[config.key_field]),
                    )
                )
            else:
                docs.sort(key=lambda r: str(r[config.key_field]))
            sp = self.splits[sid]
            for doc_id, row in enumerate(docs):
                sp.doc_keys.append(str(row[config.key_field]))
                if config.timestamp_field:
                    ts = row[config.timestamp_field]
                    sp.doc_ts.append(int(np.datetime64(ts, "us").astype(np.int64)))
                for fc in config.indexed_fields:
                    toks = tokenize(row.get(fc.name) or "", fc.tokenizer)
                    sp.doc_lens[fc.name].append(len(toks))
                    sp.total_tokens[fc.name] += len(toks)
                    for pos, t in enumerate(toks):
                        sp.postings[(fc.name, t)].setdefault(doc_id, []).append(pos)

    # ------------------------------------------------------------- eval
    def _norm_id(self, sp: OracleSplit, field: str, doc_id: int) -> int:
        return int(fieldnorm_to_id(sp.doc_lens[field][doc_id]))

    def _term_score(self, sp: OracleSplit, node: TermQ, doc_id: int) -> np.float32:
        plist = sp.postings[(node.field, node.term)]
        tf = len(plist[doc_id])
        weight = bm25.term_weight(len(plist), sp.num_docs)
        cache = bm25.norm_cache(
            float(np.float32(sp.total_tokens[node.field]) / np.float32(sp.num_docs))
        )
        return np.float32(
            bm25.score_tf(
                np.array([tf]), np.array([self._norm_id(sp, node.field, doc_id)]),
                weight, cache,
            )[0]
        )

    def _eval(self, sp: OracleSplit, node) -> dict[int, np.float32]:
        if isinstance(node, MatchNone):
            return {}
        if isinstance(node, TermQ):
            plist = sp.postings.get((node.field, node.term))
            if not plist:
                return {}
            return {d: self._term_score(sp, node, d) for d in plist}
        if isinstance(node, PhraseQ):
            return self._eval_phrase(sp, node)
        if isinstance(node, Bool):
            return self._eval_bool(sp, node)
        raise TypeError(node)

    def _eval_phrase(self, sp: OracleSplit, node: PhraseQ) -> dict[int, np.float32]:
        plists = []
        for t in node.terms:
            p = sp.postings.get((node.field, t))
            if not p:
                return {}
            plists.append(p)
        common = set(plists[0])
        for p in plists[1:]:
            common &= set(p)
        idf_sum = np.float32(0.0)
        for t, p in zip(node.terms, plists):
            idf_sum = np.float32(idf_sum + bm25.idf(len(p), sp.num_docs))
        weight = np.float32(idf_sum * (bm25.K1 + np.float32(1.0)))
        cache = bm25.norm_cache(
            float(np.float32(sp.total_tokens[node.field]) / np.float32(sp.num_docs))
        )
        out = {}
        for d in common:
            starts = set(plists[0][d])
            for j in range(1, len(plists)):
                starts &= {p - j for p in plists[j][d]}
            tf = len(starts)
            if tf:
                out[d] = np.float32(
                    bm25.score_tf(
                        np.array([tf]),
                        np.array([self._norm_id(sp, node.field, d)]),
                        weight, cache,
                    )[0]
                )
        return out

    def _eval_bool(self, sp: OracleSplit, node: Bool) -> dict[int, np.float32]:
        if node.must:
            if all(isinstance(c, TermQ) for c in node.must):
                # canonical ascending-(df, field, term) order
                clauses = sorted(
                    node.must,
                    key=lambda c: (
                        len(sp.postings.get((c.field, c.term), {})),
                        c.field,
                        c.term,
                    ),
                )
            else:
                clauses = node.must
            results = [self._eval(sp, c) for c in clauses]
            docs = set(results[0])
            for r in results[1:]:
                docs &= set(r)
            out = {}
            for d in docs:
                s = np.float32(0.0)
                for r in results:
                    s = np.float32(s + r[d])
                out[d] = s
            for c in node.should:
                opt = self._eval(sp, c)
                for d in out:
                    if d in opt:
                        out[d] = np.float32(out[d] + opt[d])
        elif node.should:
            out = {}
            for c in node.should:
                for d, s in self._eval(sp, c).items():
                    out[d] = np.float32(out.get(d, np.float32(0.0)) + s)
        else:
            return {}
        for c in node.must_not:
            for d in self._eval(sp, c):
                out.pop(d, None)
        return out

    # ----------------------------------------------------------- search
    def search(
        self,
        query: str,
        k: int = 10,
        offset: int = 0,
        start_ts=None,
        end_ts=None,
        search_fields=None,
    ) -> list[tuple[int, int, float]]:
        """Global top-k: [(split_id, doc_id, score_f32)], ordered by
        (score desc, split_id asc, doc_id asc)."""
        ast = resolve_query(parse_query(query), self.config, search_fields)
        s_micros = None if start_ts is None else int(np.datetime64(start_ts, "us").astype(np.int64))
        e_micros = None if end_ts is None else int(np.datetime64(end_ts, "us").astype(np.int64))
        all_hits = []
        for sid in sorted(self.splits):
            sp = self.splits[sid]
            scored = self._eval(sp, ast)
            for d, s in scored.items():
                if s_micros is not None and sp.doc_ts[d] < s_micros:
                    continue
                if e_micros is not None and sp.doc_ts[d] >= e_micros:
                    continue
                all_hits.append((sid, d, float(np.float32(s))))
        all_hits.sort(key=lambda h: (-h[2], h[0], h[1]))
        return all_hits[offset : offset + k]

    def count(self, query: str, start_ts=None, end_ts=None, search_fields=None) -> int:
        ast = resolve_query(parse_query(query), self.config, search_fields)
        s_micros = None if start_ts is None else int(np.datetime64(start_ts, "us").astype(np.int64))
        e_micros = None if end_ts is None else int(np.datetime64(end_ts, "us").astype(np.int64))
        total = 0
        for sp in self.splits.values():
            for d in self._eval(sp, ast):
                if s_micros is not None and sp.doc_ts[d] < s_micros:
                    continue
                if e_micros is not None and sp.doc_ts[d] >= e_micros:
                    continue
                total += 1
        return total

    def doc_key(self, split_id: int, doc_id: int) -> str:
        return self.splits[split_id].doc_keys[doc_id]
