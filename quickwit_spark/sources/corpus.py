"""Deterministic synthetic Common-Crawl-style web-page corpus.

Produces the mandated input table (BASELINE.json input_hint /
FIXTURES.md F1): ``(url string, warc_ts timestamp, html binary,
text string, lang string)``.

Fully deterministic and partition-independent: every random draw is a
pure function of ``(seed, row_id)`` via a SplitMix64 counter hash, so
the same ``(seed, n)`` yields byte-identical rows regardless of
parallelism — the property the resumable-build and golden tests rely
on. Generation is distributed (``spark.range(n).mapInPandas``) and
vectorized numpy inside each Arrow batch.

Corpus shape (FIXTURES.md F1):
- Zipf(~1.0) vocabulary of ~10k terms → a few very hot terms
  (df > 50%) to exercise skew salting and block-max skipping;
- rare marker terms ``qw_marker_{k}`` for exact-hit tests;
- ``html`` deterministically wrapped from ``text`` so the extractor
  has a known byte-exact inverse;
- ``lang`` categorical {en: 0.8, de: 0.1, fr: 0.05, und: 0.05};
- ``warc_ts`` spread over a 30-day window with jitter.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

import numpy as np
import pandas as pd

VOCAB_SIZE = 10_000
MARKER_EVERY = 97
MIN_WORDS, MAX_WORDS = 20, 200
PARA_WORDS = 30
BASE_TS = dt.datetime(2021, 3, 1, tzinfo=dt.timezone.utc)
WINDOW_SECONDS = 30 * 24 * 3600

_TOP_WORDS = (
    "the of and to a in is it you that he was for on are with as his they be "
    "at one have this from or had by hot word but what some we can out other "
    "were all there when up use your how said an each she"
).split()

_SYLLABLES = (
    "ba be bi bo bu da de di do du fa fe fi fo fu ka ke ki ko ku "
    "la le li lo lu ma me mi mo mu na ne ni no nu ra re ri ro ru "
    "sa se si so su ta te ti to tu"
).split()


def _splitmix64(x: np.ndarray) -> np.ndarray:
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z ^= z >> np.uint64(30)
    z = (z * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
    z ^= z >> np.uint64(27)
    z = (z * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
    z ^= z >> np.uint64(31)
    return z


def _hash(seed: int, stream: int, counters: np.ndarray) -> np.ndarray:
    base = np.uint64((seed * 0x9E3779B97F4A7C15 + stream) & 0xFFFFFFFFFFFFFFFF)
    return _splitmix64(counters.astype(np.uint64) ^ _splitmix64(np.asarray([base], dtype=np.uint64))[0])


def _uniform(seed: int, stream: int, counters: np.ndarray) -> np.ndarray:
    return _hash(seed, stream, counters).astype(np.float64) / np.float64(2**64)


def _build_vocab() -> list[str]:
    vocab = list(_TOP_WORDS)
    i = 0
    while len(vocab) < VOCAB_SIZE:
        n, w = i, ""
        for _ in range(4):
            w += _SYLLABLES[n % len(_SYLLABLES)]
            n //= len(_SYLLABLES)
        if w not in vocab[:60]:
            vocab.append(w)
        i += 1
    return vocab[:VOCAB_SIZE]


_VOCAB = np.array(_build_vocab())
_LANGS = np.array(["en", "de", "fr", "und"])
_LANG_CDF = np.array([0.8, 0.9, 0.95, 1.0])


def text_to_html(doc_ord: int, text: str) -> bytes:
    """Deterministic HTML wrapper; `extract_text` is its byte-exact
    inverse on the ``text`` payload."""
    words = text.split(" ")
    paras = [
        " ".join(words[i : i + PARA_WORDS]) for i in range(0, len(words), PARA_WORDS)
    ]
    body = "".join(f"<p>{p}</p>" for p in paras)
    html = (
        f"<html><head><title>doc {doc_ord}</title>"
        f'<meta charset="utf-8"></head><body>{body}</body></html>'
    )
    return html.encode("utf-8")


def gen_batch(ids: np.ndarray, seed: int = 42) -> pd.DataFrame:
    """Generate the rows for the given row ids (vectorized)."""
    ids = np.asarray(ids, dtype=np.uint64)
    n = ids.size
    lengths = MIN_WORDS + (
        _hash(seed, 1, ids) % np.uint64(MAX_WORDS - MIN_WORDS + 1)
    ).astype(np.int64)
    total = int(lengths.sum())
    flat_doc = np.repeat(np.arange(n), lengths)
    word_idx = np.arange(total, dtype=np.uint64) - np.repeat(
        np.cumsum(lengths) - lengths, lengths
    ).astype(np.uint64)
    counters = ids[flat_doc] * np.uint64(1_000_003) + word_idx
    u = _uniform(seed, 2, counters)
    # rank ∝ 1/r Zipf via inverse CDF of the log distribution
    ranks = np.minimum(
        (np.exp(u * np.log(VOCAB_SIZE))).astype(np.int64), VOCAB_SIZE
    ) - 1
    words = _VOCAB[ranks]

    starts = np.cumsum(lengths) - lengths
    texts: list[str] = []
    for i in range(n):
        toks = words[starts[i] : starts[i] + lengths[i]].tolist()
        if int(ids[i]) % MARKER_EVERY == 0:
            toks.append(f"qw_marker_{int(ids[i]) // MARKER_EVERY}")
        texts.append(" ".join(toks))

    lang_u = _uniform(seed, 3, ids)
    langs = _LANGS[np.searchsorted(_LANG_CDF, lang_u, side="right")]
    ts_jitter = (_hash(seed, 4, ids) % np.uint64(3600)).astype(np.int64)
    # monotone-ish: position in window by id, plus jitter
    ts_off = (ids.astype(np.int64) * 977) % (WINDOW_SECONDS - 3600) + ts_jitter
    warc_ts = pd.to_datetime(
        np.datetime64(BASE_TS.replace(tzinfo=None)) + ts_off.astype("timedelta64[s]")
    )
    urls = [f"https://site{int(i) % 1000}.example/{int(i)}" for i in ids]
    htmls = [text_to_html(int(i), t) for i, t in zip(ids, texts)]
    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": warc_ts,
            "html": htmls,
            "text": texts,
            "lang": langs,
        }
    )


WEBPAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def webpages_df(spark, n: int, seed: int = 42, num_partitions: int | None = None):
    """Distributed deterministic corpus as a Spark DataFrame."""
    if num_partitions is None:
        num_partitions = max(1, min(64, n // 2000 + 1))
    rng = spark.range(0, n, 1, num_partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield gen_batch(pdf["id"].to_numpy(), seed)

    return rng.mapInPandas(gen, WEBPAGES_SCHEMA)
