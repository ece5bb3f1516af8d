"""BPE tokenizer training + distributed encoding — the
tokenizer-construction step of a training-data pipeline (GPT-2 /
subword-nmt style byte/char-pair merges).

Design for 100 TB (what each stage costs):

- ``word_counts``: ONE corpus-wide hash aggregation (word, count) —
  the only corpus-sized job in training. Map-side partials; the key
  is a single lowercased alnum token, unskewable beyond natural Zipf
  (AQE handles the "the" partition).
- ``train_bpe``: classical BPE trains on the word-FREQUENCY table,
  not the corpus. The trainer caps it to the ``max_words`` most
  frequent words (TakeOrdered — bounded driver memory) and runs the
  merge loop locally: with Zipfian text the top 30-50 k words carry
  almost the whole token mass, which is why real tokenizer trainers
  (subword-nmt, HF tokenizers) train on a sample/cap too. Merge
  selection is DETERMINISTIC: highest pair count, ties toward the
  lexicographically smaller pair.
- ``encode_bpe``: distributed encode as an Arrow-batched pandas UDF
  (the sanctioned Python form — never per-row Python UDFs): the
  merge-rank dict is closed over (broadcast with the task), each
  batch encodes with a per-batch word→pieces memo, so the per-word
  cost is paid once per distinct word per batch — Zipf makes that
  amortization large.

No SQL oracle exists for the iterative trainer, so its gate entry is
rows-only; correctness rides a randomized naive-model parity suite
(tests/test_bpe.py) against a 25-line reference implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quickwit_spark.functions.textstats import tokens_col

END = "</w>"  # end-of-word marker (subword-nmt convention)


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) over the corpus — one hash aggregation."""
    from quickwit_spark.functions.dedup import _widen_narrow_input

    df = _widen_narrow_input(df)
    return (
        df.select(F.explode(tokens_col(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def _merge_word(symbols: tuple, pair: tuple) -> tuple:
    out = []
    i = 0
    while i < len(symbols):
        if (
            i + 1 < len(symbols)
            and symbols[i] == pair[0]
            and symbols[i + 1] == pair[1]
        ):
            out.append(symbols[i] + symbols[i + 1])
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def train_bpe(
    df: DataFrame,
    num_merges: int,
    text_col: str = "text",
    max_words: int = 50_000,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` merges from the corpus; returns the merge
    list in rank order. Stops early when no pair reaches
    ``min_pair_count``. Deterministic for a given corpus."""
    rows = (
        word_counts(df, text_col)
        .orderBy(F.col("count").desc(), F.col("word").asc())
        .limit(max_words)
        .collect()
    )
    vocab = {
        tuple(r["word"]) + (END,): int(r["count"]) for r in rows
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        pair = best[0]
        merges.append(pair)
        vocab = {
            _merge_word(syms, pair): c for syms, c in vocab.items()
        }
    return merges


def _encode_word(word: str, ranks: dict) -> list[str]:
    """Standard BPE encode: repeatedly apply the lowest-rank learned
    merge present in the word (everywhere it occurs)."""
    syms = tuple(word) + (END,)
    while len(syms) > 1:
        present = [
            (ranks[p], p) for p in zip(syms, syms[1:]) if p in ranks
        ]
        if not present:
            break
        _, pair = min(present)
        syms = _merge_word(syms, pair)
    return list(syms)


def encode_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_words, n_pieces, pieces): BPE-encode every doc's
    token stream with the learned merges — an Arrow-batched pandas
    UDF with a per-batch word memo (Zipf amortization)."""
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    ranks = {tuple(p): i for i, p in enumerate(merges)}

    def _enc(texts):
        from quickwit_spark.functions.bpe import _encode_word

        import re as _re

        tok_re = _re.compile(r"[a-z0-9]+")
        memo: dict = {}
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            pieces: list[str] = []
            for w in tok_re.findall(t.lower()):
                got = memo.get(w)
                if got is None:
                    got = _encode_word(w, ranks)
                    memo[w] = got
                pieces.extend(got)
            out.append(pieces)
        return pd.Series(out)

    _enc.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    enc_udf = pandas_udf(_enc, "array<string>")
    toks = tokens_col(F.col(text_col))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("n_words"),
        enc_udf(F.col(text_col)).alias("pieces"),
    ).withColumn("n_pieces", F.size("pieces")).select(
        "doc_id", "n_words", "n_pieces", "pieces"
    )
