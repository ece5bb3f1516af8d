"""quickwit_spark — a PySpark-native inverted-index + BM25 search engine.

A from-scratch re-expression (NOT a port) of the capabilities of
Quickwit 0.2.1 (reference: trinity-1686a/quickwit, studied in SURVEY.md):

- segment/split inverted-index build over a table of web pages
  ``(url string, warc_ts timestamp, html binary, text string, lang string)``
- sorted term dictionaries with delta-gap + variable-byte compressed
  posting blocks carrying per-block max-tf/max-score skip data
- exact doc-frequency / collection statistics (no approximation)
- hierarchical split merge under a log-scale merge policy
- split pruning by timestamp range and tags
- BM25 (tantivy-0.17 semantics: k1=1.2, b=0.75, 1-byte quantized
  fieldnorms) top-k with block-max skipping, rank-identical results
- checkpointed, resumable builds with per-partition lineage + metrics

Beyond the reference's surface, a first-class training-data pipeline
tier (``functions/``): exact / MinHash-LSH / SimHash / substring /
line / URL / incremental / STREAMING dedup, C4 + Gopher cleaning,
CCNet LM quality bucketing, PII scrubbing, decontamination, link
graph + PageRank, BPE tokenizer training, sequence packing,
deterministic sampling/splits, sharded export with manifests, ANN
over embeddings — all with exact DuckDB oracles — plus an ES-style
aggregation surface (range/histogram/date_histogram/terms/filters/
composite/top_hits + metric aggs) fused into single grouping-sets
passes, search_after keyset pagination and highlighting on the
search path, and a ``curate`` CLI chaining the pipeline.

Everything is DataFrame ops + vectorized pandas/Arrow UDFs — no
per-row Python in the hot path.
"""

__version__ = "0.1.0"

from quickwit_spark.session import get_spark  # noqa: F401
