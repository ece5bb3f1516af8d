"""Large-scale training-data pipeline operators: text analysis,
deduplication, similarity search, sampling, multimodal plumbing.

These extend the reference's capabilities (SURVEY.md §2) with the
operations a web-scale corpus pipeline needs before indexing:
language ID, quality scoring, token counting, fingerprinting, exact
and near-duplicate detection (MinHash-LSH / SimHash / n-gram
Jaccard), embedding similarity search, deterministic stratified
sampling / top-N-per-stratum selection, and opaque-binary multimodal
column handling. All deterministic (md5-keyed hashing) so every
operator has an exact SQL oracle.
"""
