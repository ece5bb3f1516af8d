"""BM25 scoring with tantivy-0.17 semantics.

The reference's collector disables scoring at its version
(quickwit-search/src/collector.rs:299-304) but the scoring machinery
it sits on is tantivy 0.17 BM25, and our target (BASELINE.json
north_star) demands rank-identical BM25 top-k. Semantics replicated
here (public tantivy-0.17 knowledge, SURVEY.md §2.6):

- ``K1 = 1.2``, ``B = 0.75``
- ``idf = ln(1 + (N - df + 0.5) / (df + 0.5))``
- term weight = ``idf * (K1 + 1)``
- per-doc norm cache over the 256 quantized fieldnorm ids:
  ``cache[id] = K1 * (1 - B + B * decode(id) / avg_fieldnorm)``
- ``score(tf, id) = weight * tf / (tf + cache[id])``
- all arithmetic in float32; multi-term scores are the float32 sum of
  per-term scores in deterministic (sorted-term) order.

Everything is vectorized numpy so the same functions back both the
Spark UDF path and the pure-Python oracle.
"""

from __future__ import annotations

import numpy as np

from quickwit_spark.operators.fieldnorm import FIELD_NORMS_TABLE

K1 = np.float32(1.2)
B = np.float32(0.75)


def idf(doc_freq: int | np.ndarray, doc_count: int) -> np.float32 | np.ndarray:
    """Inverse document frequency, float32."""
    df = np.asarray(doc_freq, dtype=np.float32)
    n = np.float32(doc_count)
    x = (n - df + np.float32(0.5)) / (df + np.float32(0.5))
    return np.log1p(x).astype(np.float32)


def term_weight(doc_freq: int, doc_count: int) -> np.float32:
    """``idf * (K1 + 1)`` — the constant factor of a term's score."""
    return np.float32(idf(doc_freq, doc_count) * (K1 + np.float32(1.0)))


def norm_cache(avg_fieldnorm: float) -> np.ndarray:
    """Per-fieldnorm-id denominator cache (256 float32 values)."""
    decoded = FIELD_NORMS_TABLE.astype(np.float32)
    return (K1 * (np.float32(1.0) - B + B * decoded / np.float32(avg_fieldnorm))).astype(
        np.float32
    )


def score_tf(
    tf: np.ndarray, norm_ids: np.ndarray, weight: np.float32, cache: np.ndarray
) -> np.ndarray:
    """Vectorized per-doc BM25 term score (float32).

    ``tf`` and ``norm_ids`` are parallel arrays for the docs in a
    posting list.
    """
    tf32 = np.asarray(tf, dtype=np.float32)
    denom_add = cache[np.asarray(norm_ids, dtype=np.int64)]
    return (np.float32(weight) * tf32 / (tf32 + denom_add)).astype(np.float32)


def block_max_score(
    max_tf: np.ndarray, weight: np.float32, cache_min: np.float32
) -> np.ndarray:
    """Upper bound of a block's score given its max tf.

    score(tf) is increasing in tf and decreasing in the norm
    denominator, so ``weight * max_tf / (max_tf + min(cache))`` bounds
    every doc in the block. Used by the block-max WAND evaluator.
    """
    t = np.asarray(max_tf, dtype=np.float32)
    return (np.float32(weight) * t / (t + np.float32(cache_min))).astype(np.float32)
