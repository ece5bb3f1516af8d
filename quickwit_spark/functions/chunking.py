"""Document chunking: overlapping token windows for LLM training.

Long documents must be cut into model-context-sized pieces before
tokenization-for-training; the standard shape is a sliding window of
``chunk_size`` tokens advanced by ``stride`` (stride < chunk_size →
overlapping chunks). Implemented as pure array expressions —
``split`` → ``sequence`` of window starts → ``transform``/``slice`` →
``posexplode`` — all JVM codegen, no Python, no shuffle: the explode
is a narrow per-row flatMap, so the operator scales as a map over the
corpus partitions and the output inherits the input partitioning
(downstream shuffles, if any, belong to the consumer).

Determinism contract: whitespace tokenization (``\\s+`` split, empty
tokens dropped), chunk ``k`` covers tokens ``[k*stride,
k*stride+chunk_size)``, last chunk may be short, empty docs yield no
chunks. The DuckDB oracle reproduces this exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    chunk_size: int,
    stride: int | None = None,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """Explode each doc into overlapping token-window chunks.

    Returns ``(key_col, chunk_id, chunk_start, n_chunk_tokens,
    chunk_text)`` — one row per window, ``chunk_id`` dense from 0 per
    doc, ``chunk_start`` the 0-based token offset.
    """
    if stride is None:
        stride = chunk_size
    if chunk_size <= 0 or stride <= 0:
        raise ValueError("chunk_size and stride must be positive")
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != ""
    )
    n = F.size(toks)
    starts = F.sequence(F.lit(0), n - 1, F.lit(stride))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            s.cast("long").alias("chunk_start"),
            F.least(F.lit(chunk_size), n - s).cast("long").alias(
                "n_chunk_tokens"
            ),
            F.array_join(F.slice(toks, s + 1, F.lit(chunk_size)), " ").alias(
                "chunk_text"
            ),
        ),
    )
    return (
        df.filter(n > 0)
        .select(F.col(key_col), F.posexplode(chunks).alias("chunk_id", "c"))
        .select(
            key_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            "c.chunk_start",
            "c.n_chunk_tokens",
            "c.chunk_text",
        )
    )
